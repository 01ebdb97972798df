"""Roundtrip/fuzz tests for the AVI container parser
(operators/multimodal.py:decode_avi) against an INDEPENDENT in-test
encoder, plus idx1/header tampering and rejection paths. The
registry-level differential (test_registry) separately hash-checks
multimodal_avi_stats against its arithmetic oracle.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_ruuvitag_etl_spark.operators.multimodal import decode_avi


def _chunk(cc: bytes, body: bytes) -> bytes:
    out = cc + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        out += b"\x00"  # RIFF even padding
    return out


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(frames, fps=30, with_idx=True, handler=b"DIB "):
    """Independent encoder: ``frames`` is a list of (h, w, 3) uint8 RGB
    arrays (top-down); writes bottom-up BGR DIB bits with 4-byte row
    stride, full hdrl headers, and an idx1 index."""
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    dibs = []
    for fr in frames:
        bgr = fr[:, :, ::-1][::-1]  # flip rows, swap to BGR
        rows = []
        for y in range(h):
            row = bgr[y].tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        dibs.append(b"".join(rows))
    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1,
        max(len(d) for d in dibs), w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max(len(d) for d in dibs), 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(dibs[0]),
                       0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh)
                                      + _chunk(b"strf", strf)),
    )
    movi_children = b"".join(_chunk(b"00db", d) for d in dibs)
    movi = _list(b"movi", movi_children)
    idx_entries = []
    off = 4
    for d in dibs:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(d)))
        off += 8 + len(d) + (len(d) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries)) if with_idx else b""
    content = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(content)) + content


def _rand_frames(rng, n, h, w):
    return [
        (rng.rand(h, w, 3) * 255).round().astype(np.uint8) for _ in range(n)
    ]


class TestAviRoundtrip:
    def test_single_frame_exact(self):
        rng = np.random.RandomState(1)
        frames = _rand_frames(rng, 1, 2, 3)
        d = decode_avi(encode_avi(frames))
        assert (d["width"], d["height"], d["n_frames"]) == (3, 2, 1)
        assert (d["frames"][0] == frames[0]).all()

    def test_multi_frame_order_preserved(self):
        rng = np.random.RandomState(2)
        frames = _rand_frames(rng, 5, 4, 6)
        d = decode_avi(encode_avi(frames))
        assert d["n_frames"] == 5
        for got, want in zip(d["frames"], frames):
            assert (got == want).all()

    def test_no_idx1_is_legal(self):
        rng = np.random.RandomState(3)
        frames = _rand_frames(rng, 2, 2, 2)
        d = decode_avi(encode_avi(frames, with_idx=False))
        assert d["n_frames"] == 2

    def test_odd_width_stride_padding(self):
        # width 3 -> 9-byte pixel rows padded to 12: the un-pad must
        # drop exactly 3 bytes per row.
        rng = np.random.RandomState(4)
        frames = _rand_frames(rng, 2, 3, 3)
        d = decode_avi(encode_avi(frames))
        for got, want in zip(d["frames"], frames):
            assert (got == want).all()

    def test_null_handler_accepted(self):
        rng = np.random.RandomState(5)
        frames = _rand_frames(rng, 1, 2, 2)
        d = decode_avi(encode_avi(frames, handler=b"\x00\x00\x00\x00"))
        assert d["n_frames"] == 1


class TestAviRejection:
    def _valid(self):
        rng = np.random.RandomState(9)
        return encode_avi(_rand_frames(rng, 2, 2, 3))

    def test_not_avi(self):
        with pytest.raises(ValueError):
            decode_avi(b"RIFFxxxxWAVE" + b"\x00" * 40)
        with pytest.raises(ValueError):
            decode_avi(b"RIFF\x04\x00\x00\x00AVI ")

    def test_truncated(self):
        with pytest.raises(ValueError):
            decode_avi(self._valid()[:-10])

    def test_idx1_offset_tamper(self):
        data = bytearray(self._valid())
        i = data.rfind(b"00db")  # last idx1 entry's ckid
        data[i + 8] ^= 0xFF  # flip a byte of its dwChunkOffset
        with pytest.raises(ValueError):
            decode_avi(bytes(data))

    def test_frame_count_mismatch(self):
        data = bytearray(self._valid())
        i = data.find(b"avih")
        # dwTotalFrames is the 5th u32 of the avih body (offset 8 + 16)
        struct.pack_into("<I", data, i + 8 + 16, 7)
        with pytest.raises(ValueError):
            decode_avi(bytes(data))

    def test_compressed_codec_rejected(self):
        data = bytearray(self._valid())
        i = data.find(b"vids")
        data[i + 4 : i + 8] = b"MJPG"
        with pytest.raises(NotImplementedError):
            decode_avi(bytes(data))

    def test_audio_stream_rejected(self):
        data = bytearray(self._valid())
        i = data.find(b"vids")
        data[i : i + 4] = b"auds"
        with pytest.raises(NotImplementedError):
            decode_avi(bytes(data))

    def test_fuzz_totality(self):
        # No byte string may raise anything but ValueError /
        # NotImplementedError (same contract as the other six codecs).
        import random

        rnd = random.Random(42)
        base = self._valid()
        for trial in range(300):
            data = bytearray(base)
            for _ in range(rnd.randrange(1, 6)):
                data[rnd.randrange(len(data))] = rnd.randrange(256)
            try:
                decode_avi(bytes(data))
            except (ValueError, NotImplementedError):
                pass
        for trial in range(100):
            blob = bytes(
                rnd.randrange(256) for _ in range(rnd.randrange(0, 400))
            )
            try:
                decode_avi(blob)
            except (ValueError, NotImplementedError):
                pass
