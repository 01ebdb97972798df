"""Roundtrip/fuzz tests for the baseline TIFF decoder
(operators/multimodal.py:decode_tiff_array) against an INDEPENDENT
in-test encoder (both byte orders, configurable strip layout), plus
tampering and rejection paths. The registry-level differential
(test_registry) separately hash-checks multimodal_tiff_stats against
its arithmetic oracle.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_ruuvitag_etl_spark.operators.multimodal import decode_tiff_array


def encode_tiff(
    rgb,
    order="<",
    rows_per_strip=None,
    grayscale=False,
    compression=1,
    photometric=None,
    planar=1,
):
    """Independent encoder: ``rgb`` is (h, w, 3) uint8 (or (h, w) when
    grayscale). Lays out pixel strips first, then external value
    arrays, then the IFD — the reverse of the engine packer's layout,
    so offsets are computed, not copied."""
    h, w = rgb.shape[:2]
    spp = 1 if grayscale else 3
    rows_per_strip = rows_per_strip or h
    mark = b"II" if order == "<" else b"MM"
    data = rgb.astype(np.uint8).tobytes()
    row_bytes = w * spp
    strips = []
    pos = 8
    r = 0
    while r < h:
        rows = min(rows_per_strip, h - r)
        strips.append((pos, rows * row_bytes))
        pos += rows * row_bytes
        r += rows
    ext = pos  # external arrays start here
    blobs = []

    def ext_array(fmt, vals):
        nonlocal ext
        b = struct.pack(order + str(len(vals)) + fmt, *vals)
        blobs.append(b)
        off = ext
        ext += len(b)
        return off

    entries = []

    def entry(tag, typ, vals, fmt, size):
        if len(vals) * size <= 4:
            packed = struct.pack(order + str(len(vals)) + fmt, *vals)
            packed += b"\x00" * (4 - len(packed))
            entries.append(
                struct.pack(order + "HHI", tag, typ, len(vals)) + packed
            )
        else:
            off = ext_array(fmt, vals)
            entries.append(
                struct.pack(order + "HHII", tag, typ, len(vals), off)
            )

    entry(256, 3, [w], "H", 2)
    entry(257, 3, [h], "H", 2)
    entry(258, 3, [8] * spp, "H", 2)
    entry(259, 3, [compression], "H", 2)
    entry(
        262, 3, [photometric if photometric is not None
                 else (1 if grayscale else 2)], "H", 2,
    )
    entry(273, 4, [s[0] for s in strips], "I", 4)
    entry(277, 3, [spp], "H", 2)
    entry(278, 3, [rows_per_strip], "H", 2)
    entry(279, 4, [s[1] for s in strips], "I", 4)
    if planar != 1:
        entry(284, 3, [planar], "H", 2)
    ifd_off = ext
    ifd = (
        struct.pack(order + "H", len(entries))
        + b"".join(entries)
        + struct.pack(order + "I", 0)
    )
    head = mark + struct.pack(order + "HI", 42, ifd_off)
    return head + data + b"".join(blobs) + ifd


def _rand_rgb(rng, h, w):
    return (rng.rand(h, w, 3) * 255).round().astype(np.uint8)


class TestTiffRoundtrip:
    def test_little_endian_single_strip(self):
        rng = np.random.RandomState(1)
        rgb = _rand_rgb(rng, 2, 3)
        d = decode_tiff_array(encode_tiff(rgb))
        assert (d["width"], d["height"]) == (3, 2)
        assert (d["rgb"] == rgb).all()

    def test_big_endian(self):
        rng = np.random.RandomState(2)
        rgb = _rand_rgb(rng, 4, 5)
        d = decode_tiff_array(encode_tiff(rgb, order=">"))
        assert (d["rgb"] == rgb).all()

    def test_multi_strip_order(self):
        rng = np.random.RandomState(3)
        rgb = _rand_rgb(rng, 7, 4)
        d = decode_tiff_array(encode_tiff(rgb, rows_per_strip=2))
        assert (d["rgb"] == rgb).all()

    def test_grayscale_expands_to_rgb(self):
        rng = np.random.RandomState(4)
        grey = (rng.rand(3, 3) * 255).round().astype(np.uint8)
        d = decode_tiff_array(encode_tiff(grey, grayscale=True))
        assert (d["rgb"][:, :, 0] == grey).all()
        assert (d["rgb"][:, :, 1] == grey).all()
        assert (d["rgb"][:, :, 2] == grey).all()

    def test_one_row_strips_big_endian(self):
        rng = np.random.RandomState(5)
        rgb = _rand_rgb(rng, 5, 2)
        d = decode_tiff_array(encode_tiff(rgb, order=">", rows_per_strip=1))
        assert (d["rgb"] == rgb).all()


class TestTiffRejection:
    def _valid(self, **kw):
        rng = np.random.RandomState(9)
        return encode_tiff(_rand_rgb(rng, 3, 3), **kw)

    def test_not_tiff(self):
        with pytest.raises(ValueError):
            decode_tiff_array(b"BM" + b"\x00" * 60)
        with pytest.raises(ValueError):
            decode_tiff_array(b"II\x2b\x00" + b"\x00" * 8)  # BigTIFF 43

    def test_truncated(self):
        with pytest.raises(ValueError):
            decode_tiff_array(self._valid()[:20])

    def test_truncated_ifd(self):
        with pytest.raises(ValueError):
            decode_tiff_array(self._valid()[:-6])  # IFD loses its tail

    def test_compression_not_implemented(self):
        with pytest.raises(NotImplementedError, match="compression"):
            decode_tiff_array(self._valid(compression=5))  # LZW

    def test_palette_not_implemented(self):
        with pytest.raises(NotImplementedError, match="photometric"):
            decode_tiff_array(self._valid(photometric=3))

    def test_planar_not_implemented(self):
        with pytest.raises(NotImplementedError, match="planar"):
            decode_tiff_array(self._valid(planar=2))

    def test_missing_required_tag(self):
        data = bytearray(self._valid())
        i = data.rfind(struct.pack("<HH", 256, 3))
        struct.pack_into("<H", data, i, 700)  # rename width tag away
        with pytest.raises(ValueError, match="256"):
            decode_tiff_array(bytes(data))

    def test_fuzz_totality(self):
        import random

        rnd = random.Random(13)
        base = self._valid()
        for _ in range(300):
            data = bytearray(base)
            for _ in range(rnd.randrange(1, 6)):
                data[rnd.randrange(len(data))] = rnd.randrange(256)
            try:
                decode_tiff_array(bytes(data))
            except (ValueError, NotImplementedError):
                pass
        for _ in range(100):
            blob = bytes(
                rnd.randrange(256) for _ in range(rnd.randrange(0, 300))
            )
            try:
                decode_tiff_array(blob)
            except (ValueError, NotImplementedError):
                pass
