"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` (the pattern the reference's
24-byte BLE payload decode B2 scales up to — SURVEY.md §2.1).

The Spark-side plumbing (schemas, batch iteration, partitioning) is
real and tested. TWO real codecs run on genuine byte formats via pure
stdlib ``struct``: WAV/PCM16 audio (:func:`decode_wav` — RIFF
chunk-tree walk, padding rule, sign-correct LE sample decode) and
uncompressed 24-bit BMP images (:func:`decode_bmp` — header parse,
4-byte row stride, BGR→RGB, bottom-up un-flip); each is oracle-checked
end-to-end by a registry query on payloads packed in-engine
(``multimodal_audio_stats``, ``multimodal_image_stats``). Compressed
codecs (png/jpeg/mp3/ogg) remain STUBBED because the container has no
media libraries: ``decode_image``/``decode_audio`` on such bytes raise
NotImplementedError unless ``fake=True``, in which case a deterministic
byte-statistics "decode" stands in so the dataflow can be exercised
end-to-end.

Scale posture: mapInPandas streams Arrow record batches — constant
memory per task regardless of corpus size; binary columns never pass
through Python row-at-a-time. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, content binary, media_type string, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, digest string, first_byte int, mean_byte double"
)


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Image decode: REAL for uncompressed 24-bit BMP payloads (stdlib
    parser, :func:`decode_bmp`); compressed formats (png/jpeg — need
    Pillow/opencv, absent in this container) remain stubbed behind
    ``fake=True``."""
    if content[:2] == b"BM":
        d = decode_bmp(content)
        return {"width": d["width"], "height": d["height"], "channels": 3}
    if not fake:
        raise NotImplementedError(
            "compressed image codecs unavailable; pass fake=True"
        )
    return {"width": len(content) % 640, "height": len(content) % 480, "channels": 3}


def decode_bmp(content: bytes) -> dict:
    """REAL Windows BMP decoder for uncompressed 24-bit BI_RGB bitmaps —
    pure stdlib ``struct``, no media libraries (the image analog of the
    reference's format-5 byte decoder,
    ``/root/reference/src/bluetooth/scanner.rs:35-83``, and of
    :func:`decode_wav` for audio). Parses the BITMAPFILEHEADER (pixel
    array offset), the BITMAPINFOHEADER (dimensions, planes, bpp,
    compression), honors the 4-byte row stride padding rule, converts
    per-pixel BGR storage order to (r, g, b), and un-flips the
    bottom-up row order (negative height = top-down, also handled).

    Returns ``{"width", "height", "pixels"}`` with ``pixels`` as rows
    (top to bottom) of (r, g, b) tuples. Raises ``ValueError`` on
    malformed payloads and ``NotImplementedError`` for palettized or
    compressed variants."""
    import struct

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _file_size, _reserved, offset = struct.unpack_from("<III", content, 2)
    hdr_size, width, height, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", content, 14
    )
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size}, planes={planes})")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BI_RGB supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    h, w = abs(height), width
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{height}")
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if offset + h * row_stride > len(content):
        raise ValueError("pixel array extends past end of payload")
    rows = []
    for y in range(h):
        file_row = y if top_down else h - 1 - y
        base = offset + file_row * row_stride
        row = []
        for x in range(w):
            b, g, r = content[base + 3 * x : base + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return {"width": w, "height": h, "pixels": rows}


def decode_wav(content: bytes) -> dict:
    """REAL RIFF/WAVE PCM16 decoder — pure stdlib ``struct``, no media
    libraries (the audio analog of the reference's format-5 byte decoder,
    ``/root/reference/src/bluetooth/scanner.rs:35-83``). Walks the RIFF
    chunk tree (never fixed offsets — real files carry LIST/fact chunks),
    honors the even-byte chunk padding rule, validates PCM (format tag 1,
    16-bit), and decodes the data chunk as little-endian signed 16-bit
    samples.

    Returns ``{"sample_rate", "n_channels", "bits", "samples"}``.
    Raises ``ValueError`` on malformed payloads and
    ``NotImplementedError`` for non-PCM16 encodings (compressed codecs
    need real media libraries)."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, csize = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _byte_rate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # RIFF chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only uncompressed PCM16 supported (fmt={audio_fmt}, bits={bits})"
        )
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": bits,
        "samples": samples,
    }


def decode_audio(content: bytes, fake: bool = False) -> dict:
    """Audio decode: REAL for RIFF/WAVE PCM16 payloads (stdlib parser,
    :func:`decode_wav`); compressed codecs (mp3/ogg/flac — need
    soundfile/librosa, absent in this container) remain stubbed behind
    ``fake=True``."""
    if content[:4] == b"RIFF":
        d = decode_wav(content)
        return {
            "sample_rate": d["sample_rate"],
            "n_samples": len(d["samples"]),
        }
    if not fake:
        raise NotImplementedError(
            "non-WAV audio codecs unavailable; pass fake=True"
        )
    return {"sample_rate": 16000, "n_samples": len(content) * 2}


WAV_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "sum_samples long, max_abs int, mean_sample double"
)


def wav_audio_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over REAL WAV payloads:
    each batch decodes its binary column with the stdlib RIFF/PCM16
    parser (:func:`decode_wav`) and emits integer-exact sample stats
    (sum, peak) plus the mean as ONE IEEE division of exact integers —
    engine-reproducible, so the registry query's DuckDB oracle can
    assert the whole pack→decode→aggregate chain arithmetically.

    Scale posture: mapInPandas streams record batches — constant memory
    per task; the payload bytes stay in Arrow buffers until the decode,
    which touches each blob exactly once."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_samples",
                "sum_samples", "max_abs", "mean_sample",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_wav(bytes(content))
                s = d["samples"]
                total = int(sum(s))
                out["media_id"].append(mid)
                out["sample_rate"].append(d["sample_rate"])
                out["n_channels"].append(d["n_channels"])
                out["n_samples"].append(len(s))
                out["sum_samples"].append(total)
                out["max_abs"].append(max((abs(x) for x in s), default=0))
                out["mean_sample"].append(total / len(s) if s else 0.0)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=WAV_STATS_SCHEMA)


BMP_STATS_SCHEMA = (
    "media_id long, width int, height int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long, max_channel int, "
    "topleft_r int, mean_luma double"
)


def bmp_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction over REAL BMP payloads:
    each batch decodes its binary column with the stdlib BI_RGB parser
    (:func:`decode_bmp`) and emits integer-exact channel stats plus the
    top-left pixel's red channel (order-SENSITIVE — proves the
    bottom-up row un-flip and BGR→RGB swap, which sums alone cannot)
    and the mean luma as ONE IEEE division of exact integers.

    Scale posture: mapInPandas streams record batches — constant memory
    per task; each blob is decoded exactly once."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "width", "height", "n_pixels", "sum_r",
                "sum_g", "sum_b", "max_channel", "topleft_r", "mean_luma",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_bmp(bytes(content))
                px = [p for row in d["pixels"] for p in row]
                sr = sum(p[0] for p in px)
                sg = sum(p[1] for p in px)
                sb = sum(p[2] for p in px)
                out["media_id"].append(mid)
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["n_pixels"].append(len(px))
                out["sum_r"].append(sr)
                out["sum_g"].append(sg)
                out["sum_b"].append(sb)
                out["max_channel"].append(max(max(p) for p in px))
                out["topleft_r"].append(d["pixels"][0][0][0])
                out["mean_luma"].append((sr + sg + sb) / (3 * len(px)))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=BMP_STATS_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload so
    the binary pipeline can be exercised on driver data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column:
    byte-level statistics + md5 digest (deterministic, codec-free — the
    md5 doubles as the oracle hook since DuckDB computes the same
    digest). Swap the body for a real decode when codecs exist; the
    dataflow shape stays identical."""
    import hashlib

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "digest": content.map(lambda b: hashlib.md5(b).hexdigest()),
                    "first_byte": content.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "mean_byte": content.map(
                        lambda b: round(sum(b) / len(b), 4) if len(b) else 0.0
                    ).astype("float64"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: chunk the binary into
    fixed-size pseudo-frames and keep every n-th — the partition/batch
    shape of real frame extraction, with a byte-slicing stand-in."""
    import pandas as pd

    frame_bytes = 256

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = max(1, len(content) // frame_bytes)
                for f in range(0, n, every_nth):
                    out["media_id"].append(mid)
                    out["frame_no"].append(f)
                    out["frame"].append(
                        bytes(content[f * frame_bytes : (f + 1) * frame_bytes])
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, schema="media_id long, frame_no int, frame binary"
    )


def resize_media(media: DataFrame, factor: int = 4) -> DataFrame:
    """Resize plumbing for image payloads: every real deployment swaps
    the body for a codec-backed resample (Pillow/opencv — absent here);
    the stand-in keeps every ``factor``-th byte so output size, schema,
    and Arrow batch shape match the real op. Runs as mapInPandas so the
    binary column stays in Arrow buffers end-to-end — never Python
    row-at-a-time."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].map(lambda b: bytes(b[::factor])),
                    "media_type": pdf["media_type"],
                    "scale_factor": factor,
                }
            )

    return media.mapInPandas(
        batches,
        schema="media_id long, content binary, media_type string, scale_factor int",
    )
