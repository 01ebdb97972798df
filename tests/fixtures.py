"""Reference-shaped test fixtures (FIXTURES.md §A): format-5 payload
builder and raw_adverts / readings / tags fixture DataFrames.

Payload layout per /root/reference/src/bluetooth/scanner.rs:17-28:
byte0 format(5) | 1-2 temp i16 BE | 3-4 humidity u16 BE | 5-6 pressure
u16 BE | 7-12 accel x/y/z i16 BE | 13-14 power (ignored) | 15 movement
counter u8 | 16-17 sequence (ignored) | 18-23 MAC bytes (ignored).
"""

from __future__ import annotations

import datetime as dt
import struct

UTC = dt.timezone.utc


def mk_payload(
    temp_raw: int = 4000,  # 20.0 C
    hum_raw: int = 20000,  # 50.0 %
    pres_raw: int = 50000,  # 1000.00 hPa
    ax_raw: int = 100,
    ay_raw: int = -200,
    az_raw: int = 1000,
    movement: int = 5,
    fmt: int = 5,
) -> bytes:
    return struct.pack(
        ">BhHHhhhHBH6s",
        fmt,
        temp_raw,
        hum_raw,
        pres_raw,
        ax_raw,
        ay_raw,
        az_raw,
        0xFFFF,  # power info, ignored by the decoder
        movement,
        0,  # sequence, ignored
        b"\xaa\xbb\xcc\xdd\xee\xff",
    )


def ts(minute: float, base: str = "2024-06-01T00:00:00") -> dt.datetime:
    t0 = dt.datetime.fromisoformat(base).replace(tzinfo=UTC)
    return t0 + dt.timedelta(minutes=minute)


def raw_adverts_rows() -> list[tuple]:
    """(scan_id, ts, sensor_mac, manufacturer_id, payload) incl. malformed."""
    return [
        (1, ts(0), "aa:bb:cc:dd:ee:01", 0x0499, mk_payload(temp_raw=4000)),
        (1, ts(0.1), "AA:BB:CC:DD:EE:02", 0x0499, mk_payload(temp_raw=-4000)),
        # humidity raw > 40000 → clamps to 100.0 (scanner.rs:53)
        (1, ts(0.2), "AA:BB:CC:DD:EE:03", 0x0499, mk_payload(hum_raw=41000)),
        # wrong manufacturer → dropped before decode (scanner.rs:179-181)
        (1, ts(0.3), "AA:BB:CC:DD:EE:04", 0x1234, mk_payload()),
        # wrong format byte → dropped (scanner.rs:40-44)
        (1, ts(0.4), "AA:BB:CC:DD:EE:05", 0x0499, mk_payload(fmt=3)),
        # wrong length → dropped (scanner.rs:36-39)
        (1, ts(0.5), "AA:BB:CC:DD:EE:06", 0x0499, b"\x05\x01\x02"),
        (2, ts(30.0), "AA:BB:CC:DD:EE:01", 0x0499, mk_payload(temp_raw=4100)),
    ]


def readings_rows() -> list[tuple]:
    """(sensor_mac, ts, temperature, humidity, pressure, ax, ay, az,
    movement_counter) across two 30-min windows; sensor EE:02 wraps
    255→1; EE:99 is unregistered (→ 'Unknown')."""
    rows = []
    for i in range(6):  # sensor 01, window 0: mc 10..15
        rows.append(
            ("AA:BB:CC:DD:EE:01", ts(i * 5), 20.0 + i, 50.0, 1000.0, 0.1, 0.2, 0.3, 10 + i)
        )
    for i in range(4):  # sensor 02, window 0: mc wraps 254,255,0,1 → delta 3
        rows.append(
            ("AA:BB:CC:DD:EE:02", ts(i * 5), 10.0, 40.0, 990.0, 0.0, 0.0, 1.0, (254 + i) % 256)
        )
    for i in range(3):  # sensor 01, window 1
        rows.append(
            ("AA:BB:CC:DD:EE:01", ts(30 + i * 5), 25.0, 55.0, 1005.0, 0.1, 0.2, 0.3, 100)
        )
    # unregistered sensor → name 'Unknown'
    rows.append(("AA:BB:CC:DD:EE:99", ts(1), 1.0, 2.0, 900.0, 0.0, 0.0, 0.0, 7))
    return rows


TAGS = [
    ("AA:BB:CC:DD:EE:01", "Living room"),
    ("AA:BB:CC:DD:EE:02", "Sauna"),
    ("AA:BB:CC:DD:EE:03", "Balcony"),
    # registered but never reports → no output row (utils.rs:45-47)
    ("AA:BB:CC:DD:EE:42", "Garage"),
]

RAW_SCHEMA = "scan_id long, ts timestamp, sensor_mac string, manufacturer_id int, payload binary"
READINGS_SCHEMA = (
    "sensor_mac string, ts timestamp, temperature double, humidity double, "
    "pressure double, acceleration_x double, acceleration_y double, "
    "acceleration_z double, movement_counter int"
)
TAGS_SCHEMA = "sensor_mac string, name string"
