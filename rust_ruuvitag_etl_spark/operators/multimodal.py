"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` (the pattern the reference's
24-byte BLE payload decode B2 scales up to — SURVEY.md §2.1).

The Spark-side plumbing (schemas, batch iteration, partitioning) is
real and tested. SIX real codecs run on genuine byte formats via pure
stdlib (``struct``/``zlib``) + numpy: WAV/PCM16 audio
(:func:`decode_wav` — RIFF chunk-tree walk, padding rule, sign-correct
LE sample decode), uncompressed 24-bit BMP (:func:`decode_bmp` —
header parse, 4-byte row stride, BGR→RGB, bottom-up un-flip),
COMPRESSED PNG (:func:`decode_png` — chunk CRCs, zlib inflate, all
five scanline filters), COMPRESSED GIF (:func:`decode_gif` — a full
variable-width LZW engine), ENTROPY-CODED baseline JPEG
(:func:`decode_jpeg` — canonical Huffman from DHT, byte-unstuffing,
restart resync, dequantize/de-zigzag, matrix IDCT, JFIF YCbCr→RGB),
and COMPRESSED-AUDIO FLAC (:func:`decode_flac` — CRC-verified frames,
constant/verbatim/fixed-predictor subframes with partitioned-Rice
residuals, all three side-channel stereo modes). Each is
oracle-checked end-to-end by a registry query on payloads packed
in-engine (``multimodal_audio_stats``, ``multimodal_image_stats``,
``multimodal_png_stats``, ``multimodal_gif_stats``,
``multimodal_jpeg_stats``, ``multimodal_flac_stats``). Only the lossy
psychoacoustic audio codecs (mp3/ogg) remain STUBBED (they genuinely
need real media libraries): ``decode_image``/``decode_audio`` on
unknown bytes raise NotImplementedError unless ``fake=True``, in which
case a deterministic byte-statistics "decode" stands in so the
dataflow can be exercised end-to-end.

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


def _total_decoder(fn):
    """Totality guard for codec parsers: every malformed-payload failure
    must surface as the documented ``ValueError`` — a truncated buffer
    reaching ``struct.unpack`` (struct.error), a short index, or a
    missing table key must never leak a foreign exception type out of a
    decode (tests/test_jpeg.py::TestCodecTotalityFuzz pins this)."""
    import functools
    import struct as _struct

    @functools.wraps(fn)
    def wrapped(content, *a, **kw):
        try:
            return fn(content, *a, **kw)
        except (_struct.error, IndexError, KeyError, OverflowError) as exc:
            raise ValueError(f"malformed payload: {exc}") from exc

    return wrapped


def decode_image(content: bytes, fake: bool = False) -> dict:
    """Image decode: REAL for BMP (:func:`decode_bmp`), PNG
    (:func:`decode_png`), GIF (:func:`decode_gif`), baseline JPEG
    (:func:`decode_jpeg`), and baseline TIFF
    (:func:`decode_tiff_array`) payloads; every real image-codec stub
    is now closed. Fake mode stays TOTAL over arbitrary bytes (decode
    errors fall back to the deterministic byte-statistics stub)."""
    if content[:2] == b"\xff\xd8":
        try:
            d = decode_jpeg(content)
            return {"width": d["width"], "height": d["height"], "channels": 3}
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    elif content[:2] == b"BM":
        try:
            d = decode_bmp(content)
            return {"width": d["width"], "height": d["height"], "channels": 3}
        except (ValueError, NotImplementedError):
            # fake mode must stay TOTAL over arbitrary bytes: BM-prefixed
            # junk or unsupported BMP variants (32-bit, RLE) fall back to
            # the deterministic byte-statistics stub instead of raising.
            if not fake:
                raise
    elif content[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            d = decode_png(content)
            return {"width": d["width"], "height": d["height"], "channels": 3}
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    elif content[:6] in (b"GIF87a", b"GIF89a"):
        try:
            d = decode_gif(content)
            return {"width": d["width"], "height": d["height"], "channels": 3}
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    elif content[:4] in (b"II*\x00", b"MM\x00*"):
        try:
            d = decode_tiff_array(content)
            return {"width": d["width"], "height": d["height"], "channels": 3}
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    elif not fake:
        raise NotImplementedError(
            "unrecognized image format (bmp/png/gif/jpeg/tiff "
            "supported); pass fake=True"
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
    d = decode_bmp_array(content)
    return {
        "width": d["width"],
        "height": d["height"],
        "pixels": [
            [tuple(int(c) for c in px) for px in row] for row in d["rgb"]
        ],
    }


@_total_decoder
def decode_bmp_array(content: bytes) -> dict:
    """The vectorized core of :func:`decode_bmp`: identical parsing and
    validation, but returns ``{"width", "height", "rgb"}`` with ``rgb``
    a ``uint8`` numpy array of shape (height, width, 3), rows top to
    bottom. The whole pixel array unpacks as one ``np.frombuffer`` +
    stride reshape + axis reversals in C — no Python per-pixel loop
    (round-3 star-axis exponent +0.47 came from the old ``for y/for x``
    loops). Note the array is a VIEW for top-down files and a reversed
    view otherwise; callers must copy before mutating."""
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
    # View the pixel array as (h, stride) bytes in C, drop the pad
    # columns, reshape to (h, w, BGR), reverse the channel axis for RGB
    # and the row axis for the bottom-up un-flip.
    import numpy as np

    arr = np.frombuffer(
        content, dtype=np.uint8, count=h * row_stride, offset=offset
    ).reshape(h, row_stride)
    rgb = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return {"width": w, "height": h, "rgb": rgb}


def decode_png(content: bytes) -> dict:
    """REAL PNG decoder for non-interlaced 8-bit images — pure stdlib
    (``struct`` + ``zlib``), no media libraries (the compressed-format
    analog of :func:`decode_bmp`/:func:`decode_wav`, closing the
    round-3 "compressed codecs stubbed" gap for PNG). Parses the
    8-byte signature and the chunk stream (length / type / data /
    CRC-32, each CRC verified with ``zlib.crc32``), validates IHDR,
    inflates the concatenated IDAT zlib stream (Adler-32 verified by
    ``zlib.decompress``), and reconstructs all five scanline filters
    (None/Sub/Up/Average/Paeth) per the PNG spec §9.

    Supported: bit depth 8, interlace 0 (none), color types 0
    (greyscale — expanded to RGB), 2 (truecolor) and 6 (truecolor +
    alpha — alpha participates in unfiltering, then is dropped).
    Raises ``ValueError`` on malformed payloads (bad signature, CRC
    mismatch, truncated/corrupt IDAT, wrong inflated length, unknown
    filter type) and ``NotImplementedError`` for palette images,
    non-8 bit depths, and Adam7 interlacing.

    Returns ``{"width", "height", "pixels"}`` with ``pixels`` as rows
    (top to bottom) of (r, g, b) tuples."""
    d = decode_png_array(content)
    return {
        "width": d["width"],
        "height": d["height"],
        "pixels": [
            [tuple(int(c) for c in px) for px in row] for row in d["rgb"]
        ],
    }


@_total_decoder
def decode_png_array(content: bytes) -> dict:
    """The vectorized core of :func:`decode_png`: identical parsing and
    validation, returning ``{"width", "height", "rgb"}`` with ``rgb`` a
    ``uint8`` numpy array of shape (height, width, 3). The common
    scanline filters run as numpy array ops (None/Up element-wise, Sub
    as a per-lane cumulative sum mod 256); Average and Paeth carry a
    true left-to-right data dependency and reconstruct per byte."""
    import struct
    import zlib

    import numpy as np

    if len(content) < 8 or content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, seen_iend = 8, None, [], False
    while pos + 8 <= len(content):
        (clen,), ctype = struct.unpack_from(">I", content, pos), content[
            pos + 4 : pos + 8
        ]
        body = content[pos + 8 : pos + 8 + clen]
        if len(body) != clen or pos + 12 + clen > len(content):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            pass  # only reachable for palette images, rejected below
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + clen
    if ihdr is None or not seen_iend:
        raise ValueError("missing IHDR/IEND chunk")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if w <= 0 or h <= 0 or comp != 0 or filt_method != 0:
        raise ValueError(f"bad IHDR ({w}x{h}, comp={comp}, filter={filt_method})")
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            f"only non-interlaced 8-bit grey/truecolor[+alpha] supported "
            f"(depth={depth}, color={color}, interlace={interlace})"
        )
    bpp = {0: 1, 2: 3, 6: 4}[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT zlib stream: {exc}") from exc
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"inflated length {len(raw)} != {h} * (1 + {stride})"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters, data = lines[:, 0], lines[:, 1:].astype(np.int64)
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft, line = int(filters[y]), data[y]
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            cur = np.cumsum(line.reshape(w, bpp), axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 3:  # Average
            cur = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif ft == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown filter type {ft} on scanline {y}")
        out[y], prev = cur, cur
    px = out.astype(np.uint8).reshape(h, w, bpp)
    if color == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color == 6:
        rgb = px[:, :, :3]
    else:
        rgb = px
    return {"width": w, "height": h, "rgb": rgb}


@_total_decoder
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
    """Audio decode: REAL for RIFF/WAVE PCM16 (:func:`decode_wav`) and
    COMPRESSED FLAC (:func:`decode_flac`) payloads; lossy entropy
    codecs (mp3/ogg — need soundfile/librosa, absent in this
    container) remain stubbed behind ``fake=True``, which stays TOTAL
    over arbitrary bytes (decode errors fall back to the deterministic
    stub)."""
    if content[:4] == b"RIFF":
        try:
            d = decode_wav(content)
            return {
                "sample_rate": d["sample_rate"],
                "n_samples": len(d["samples"]),
            }
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    elif content[:4] == b"fLaC":
        try:
            d = decode_flac(content)
            return {
                "sample_rate": d["sample_rate"],
                "n_samples": len(d["samples"]),
            }
        except (ValueError, NotImplementedError):
            if not fake:
                raise
    elif content[:4] == b"OggS":
        # The CONTAINER parses for real (decode_ogg_pages: CRC-32,
        # sequencing, lacing); the psychoacoustic SAMPLE decode of the
        # Vorbis/Opus packets inside genuinely needs media libraries.
        if not fake:
            d = decode_ogg_pages(content)
            raise NotImplementedError(
                f"Ogg container parsed ({d['n_pages']} pages, "
                f"{d['n_packets']} packets) but Vorbis/Opus sample "
                "decode needs media libraries; pass fake=True"
            )
    elif content[:3] == b"ID3" or (
        len(content) >= 2
        and content[0] == 0xFF
        and (content[1] & 0xE0) == 0xE0
    ):
        # Same honest boundary for mp3: the FRAME walk is real
        # (decode_mp3_frames: sync, length arithmetic, CRC-16), the
        # Huffman/psychoacoustic sample decode is not.
        if not fake:
            d = decode_mp3_frames(content)
            raise NotImplementedError(
                f"MPEG audio stream parsed ({d['n_frames']} frames) "
                "but Layer III sample decode needs media libraries; "
                "pass fake=True"
            )
    elif not fake:
        raise NotImplementedError(
            "unrecognized audio format (wav/flac supported; Ogg and "
            "mp3 parse at container level only); pass fake=True"
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


def wav_pcm_samples(media: DataFrame) -> DataFrame:
    """REAL-decode sample extraction for the audio-dedup family: each
    RIFF/WAVE payload decodes with the stdlib PCM16 parser
    (:func:`decode_wav`) and emits its raw signed samples as
    ``array<int>`` — the representation the gain-invariant energy-
    envelope fingerprint consumes. Same Arrow mapInPandas scale posture
    as :func:`wav_audio_stats`: streaming record batches, one decode
    per blob, constant memory per task."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            mids, smp = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_wav(bytes(content))
                mids.append(mid)
                smp.append(list(d["samples"]))  # already Python ints
            yield pd.DataFrame({"media_id": mids, "samples": smp})

    return media.mapInPandas(
        batches, schema="media_id long, samples array<int>"
    )


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
    per task; each blob is decoded exactly once. The per-pixel work is
    vectorized at BATCH granularity, not per image: every image's pixel
    view (:func:`decode_bmp_array`) is concatenated into one
    (Σpixels, 3) array and the per-image channel sums / maxima come
    from single ``np.add.reduceat`` / ``np.maximum.reduceat`` sweeps.
    Per-image numpy reductions would be overhead-bound on small images
    (thumbnails are a handful of pixels, and a numpy reduction costs
    ~µs of setup regardless of size); reduceat amortizes that setup
    across the whole Arrow batch while still handling mixed image
    sizes, so throughput is flat from icons to photographs."""
    return media.mapInPandas(
        _image_stats_batches(decode_bmp_array), schema=BMP_STATS_SCHEMA
    )


def _image_stats_batches(decode_array):
    """Shared batch processor for the image-stat operators: decode each
    payload to an (h, w, 3) uint8 view with ``decode_array``, then
    compute all per-image reductions with batch-wide ``reduceat``
    sweeps over one concatenated (Σpixels, 3) array."""
    import numpy as np
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:
            if not len(pdf):
                continue
            mids, widths, heights, views = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_array(bytes(content))
                mids.append(mid)
                widths.append(d["width"])
                heights.append(d["height"])
                views.append(d["rgb"].reshape(-1, 3))
            counts = np.multiply(widths, heights)
            offsets = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=offsets[1:])
            flat = np.concatenate(views, axis=0).astype(np.int64)
            sums = np.add.reduceat(flat, offsets, axis=0)
            maxs = np.maximum.reduceat(flat.max(axis=1), offsets)
            luma = sums.sum(axis=1) / (3 * counts)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "width": widths,
                    "height": heights,
                    "n_pixels": counts,
                    "sum_r": sums[:, 0],
                    "sum_g": sums[:, 1],
                    "sum_b": sums[:, 2],
                    "max_channel": maxs,
                    "topleft_r": flat[offsets, 0],
                    "mean_luma": luma,
                }
            )

    return batches


PNG_STATS_SCHEMA = BMP_STATS_SCHEMA


def png_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction over REAL PNG payloads:
    each batch inflates and unfilters its binary column with the stdlib
    zlib decoder (:func:`decode_png_array`) and emits the same
    integer-exact stat vector as :func:`bmp_image_stats`. ``topleft_r``
    is order-SENSITIVE: with per-row Sub/Up/Average/Paeth filters it
    only matches the oracle if filter reconstruction walks scanlines
    top-to-bottom with the correct left/up/up-left neighbors.

    Scale posture: mapInPandas streams record batches — constant memory
    per task; inflation is C-side ``zlib``, per-pixel reductions are
    batch-amortized ``reduceat`` sweeps exactly as in
    :func:`bmp_image_stats`."""
    return media.mapInPandas(
        _image_stats_batches(decode_png_array), schema=PNG_STATS_SCHEMA
    )


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


def decode_gif(content: bytes) -> dict:
    """REAL GIF decoder — pure stdlib + numpy, no media libraries (the
    fourth real codec after WAV/BMP/PNG, and the second COMPRESSED one:
    a full variable-width LZW decompressor). Parses the GIF87a/89a
    header, logical screen descriptor, global/local color tables, skips
    89a extension blocks, walks the image-data sub-block chain, and
    LZW-decodes the pixel indices — growing code widths 3→12 bits,
    dictionary rebuilds on CLEAR, and the KwKwK self-referential case
    per the spec — then maps indices through the color table to RGB.

    Supported: single-image, non-interlaced GIFs with a color table.
    Raises ``ValueError`` on malformed payloads (bad signature,
    truncated blocks, out-of-range codes/indices, missing trailer
    data) and ``NotImplementedError`` for interlaced images.

    Returns ``{"width", "height", "pixels"}`` with ``pixels`` as rows
    (top to bottom) of (r, g, b) tuples."""
    d = decode_gif_array(content)
    return {
        "width": d["width"],
        "height": d["height"],
        "pixels": [
            [tuple(int(c) for c in px) for px in row] for row in d["rgb"]
        ],
    }


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> list[int]:
    """GIF-flavored LZW: codes packed LSB-first, widths grow from
    min_code_size+1 up to 12 bits, CLEAR resets the dictionary, EOI
    terminates. Returns exactly ``expected`` indices or raises."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    # bit cursor over data
    nbits = len(data) * 8
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("LZW stream truncated")
        v = 0
        for b in range(width):
            i = pos + b
            v |= ((data[i >> 3] >> (i & 7)) & 1) << b
        pos += width
        return v

    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError(f"bad initial LZW code {code}")
            entry = table[code]
        elif code < len(table) and table[code]:
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if len(out) > expected:
            raise ValueError("LZW produced more pixels than the image holds")
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) != expected:
        raise ValueError(f"LZW produced {len(out)} of {expected} pixels")
    return out


@_total_decoder
def decode_gif_array(content: bytes) -> dict:
    """Core of :func:`decode_gif`: returns ``{"width", "height",
    "rgb"}`` with ``rgb`` a uint8 numpy array of shape (h, w, 3)."""
    import struct

    import numpy as np

    if len(content) < 13 or content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = content[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(content):
        b = content[pos]
        if b == 0x21:  # 89a extension: label + sub-block chain
            pos += 2
            while pos < len(content) and content[pos]:
                pos += 1 + content[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(content):
                raise ValueError("truncated image descriptor")
            _lx, _ly, w, h, ipacked = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = content[pos : pos + 3 * n]
                if len(ct) < 3 * n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if ct is None:
                raise ValueError("no color table for image")
            if w <= 0 or h <= 0:
                raise ValueError(f"bad dimensions {w}x{h}")
            if pos >= len(content):
                raise ValueError("missing LZW minimum code size")
            mcs = content[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"bad LZW minimum code size {mcs}")
            chunks = []
            while pos < len(content) and content[pos]:
                size = content[pos]
                block = content[pos + 1 : pos + 1 + size]
                if len(block) < size:
                    raise ValueError("truncated image data sub-block")
                chunks.append(block)
                pos += 1 + size
            if pos >= len(content):
                raise ValueError("missing sub-block terminator")
            idx = _lzw_decode(b"".join(chunks), mcs, w * h)
            n_colors = len(ct) // 3
            if max(idx) >= n_colors:
                raise ValueError("pixel index outside color table")
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            rgb = pal[np.asarray(idx, dtype=np.int64)].reshape(h, w, 3)
            return {"width": w, "height": h, "rgb": rgb}
        elif b == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("no image data in GIF payload")


GIF_STATS_SCHEMA = BMP_STATS_SCHEMA


def gif_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction over REAL GIF payloads —
    LZW-decompressed by :func:`decode_gif_array`, reduced by the same
    batch-wide reduceat sweeps as the BMP/PNG stat operators."""
    return media.mapInPandas(
        _image_stats_batches(decode_gif_array), schema=GIF_STATS_SCHEMA
    )


def decode_jpeg(content: bytes) -> dict:
    """REAL baseline JPEG decoder — pure stdlib ``struct`` + numpy, no
    media libraries (the entropy-coded analog of :func:`decode_png`'s
    zlib path, closing the last declared image-codec stub). Parses the
    marker stream (SOI / DQT / SOF0 / DHT / DRI / SOS / EOI, APPn+COM
    skipped), builds the canonical Huffman decoders from DHT, entropy-
    decodes the byte-stuffed scan (DC category + extend, AC run/size
    with EOB and ZRL, restart-marker resync), dequantizes, inverse-
    zigzags, applies the 2-D IDCT as two orthonormal DCT-matrix
    multiplies, and converts JFIF YCbCr→RGB.

    Supported: baseline sequential DCT (SOF0), 8-bit samples, 1 or 3
    components with NO chroma subsampling (all sampling factors 1×1).
    Raises ``ValueError`` on malformed payloads and
    ``NotImplementedError`` for progressive (SOF2), 16-bit quant
    tables, arithmetic coding, or subsampled chroma.

    Returns ``{"width", "height", "pixels"}`` with ``pixels`` rows of
    (r, g, b) tuples."""
    d = decode_jpeg_array(content)
    return {
        "width": d["width"],
        "height": d["height"],
        "pixels": [
            [tuple(int(c) for c in px) for px in row] for row in d["rgb"]
        ],
    }


# zigzag index: _JPEG_ZIGZAG[k] = (row, col) of the k-th coefficient.
_JPEG_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    un-stuffing and restart-marker detection."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.real_bits = 0  # bits loaded from actual entropy data
        self.consumed = 0

    def _fill(self) -> None:
        # ONE byte per fill: keeps ``pos`` at the next unread byte, so
        # restart-marker alignment is just dropping the ≤7 buffered
        # bits of the current byte.
        while self.nbits <= 0:
            b = None
            if self.pos < len(self.data):
                b = self.data[self.pos]
                if b == 0xFF:
                    nxt = (
                        self.data[self.pos + 1]
                        if self.pos + 1 < len(self.data)
                        else None
                    )
                    if nxt == 0x00:
                        self.pos += 2  # stuffed literal 0xFF
                    else:
                        b = None  # a real marker: stop consuming bytes
                else:
                    self.pos += 1
            if b is None:
                # Spec F.1.2.3: the byte before a marker is 1-padded.
                # Feed 1-bits without advancing; consuming more than 7
                # of them means the scan was truly truncated (checked
                # in read_bit).
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
            else:
                self.bitbuf = (self.bitbuf << 8) | b
                self.nbits += 8
                self.real_bits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.consumed += 1
        if self.consumed > self.real_bits + 7:
            raise ValueError("truncated entropy-coded segment")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (n = 0..7)."""
        self.nbits = 0
        self.bitbuf = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + n
        ):
            raise ValueError(f"expected RST{n} marker")
        self.pos += 2


def _jpeg_build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman table per JPEG Annex C: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _jpeg_extend(v: int, size: int) -> int:
    """RECEIVE/EXTEND (spec F.2.2.1): map ``size`` magnitude bits to a
    signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


@_total_decoder
def decode_jpeg_array(content: bytes) -> dict:
    """The vectorized core of :func:`decode_jpeg`: identical parsing,
    returning ``{"width", "height", "rgb"}`` with ``rgb`` uint8 of
    shape (height, width, 3)."""
    import struct

    import numpy as np

    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    scan = None
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # Spec-legal 0xFF fill bytes may pad between segments (B.1.1.2):
        # skip repeats until the marker byte proper.
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        if marker == 0xD8:  # stray SOI
            raise ValueError("unexpected SOI marker")
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("EOI before any scan")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone length-less markers — skip.
            pos += 2
            continue
        if pos + 4 > len(content):
            raise ValueError("truncated marker segment header")
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        body = content[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                if b + 65 > len(body):
                    raise ValueError("truncated DQT")
                qtables[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int32)
                b += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential DCT (SOF0) supported, "
                f"got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xC0:  # SOF0
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError("1 or 3 components only")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling not supported (need 1x1)"
                    )
                comps.append({"id": cid, "tq": tq})
            sof = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                nsym = sum(counts)
                syms = body[b + 17 : b + 17 + nsym]
                if len(syms) != nsym:
                    raise ValueError("truncated DHT")
                tbl = _jpeg_build_huffman(counts, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                b += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            stables = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                stables.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            scan = {"comps": stables, "data_pos": pos + 2 + seglen}
            break
        # APPn / COM / others: skipped
        pos += 2 + seglen
    if sof is None or scan is None:
        raise ValueError("missing SOF0 or SOS")
    if len(scan["comps"]) != len(sof["comps"]):
        raise NotImplementedError("scan must cover all components")
    w, h = sof["w"], sof["h"]
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    bw, bh = (w + 7) // 8, (h + 7) // 8

    # Orthonormal 8x8 DCT-II basis; IDCT(B) = M.T @ B @ M with the
    # JPEG normalization folded into M.
    x = np.arange(8)
    mat = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    mat[0, :] = mat[0, :] / np.sqrt(2.0)

    reader = _JpegBitReader(content, scan["data_pos"])
    ncomp = len(sof["comps"])
    planes = [
        np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in range(ncomp)
    ]
    dc_pred = [0] * ncomp
    rst_n = 0
    mcu_index = 0
    for by in range(bh):
        for bx in range(bw):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                reader.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) % 8
                dc_pred = [0] * ncomp
            for ci in range(ncomp):
                st = scan["comps"][ci]
                if st["td"] not in huff_dc or st["ta"] not in huff_ac:
                    raise ValueError("scan references missing Huffman table")
                tq = sof["comps"][ci]["tq"]
                if tq not in qtables:
                    raise ValueError("scan references missing quant table")
                coefs = np.zeros(64, dtype=np.int64)
                size = _jpeg_huff_decode(reader, huff_dc[st["td"]])
                if size > 11:
                    raise ValueError(f"bad DC category {size}")
                diff = _jpeg_extend(reader.read_bits(size), size)
                dc_pred[ci] += diff
                coefs[0] = dc_pred[ci]
                k = 1
                while k < 64:
                    rs = _jpeg_huff_decode(reader, huff_ac[st["ta"]])
                    run, asize = rs >> 4, rs & 0x0F
                    if asize == 0:
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        raise ValueError(f"bad AC symbol 0x{rs:02X}")
                    k += run
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    coefs[k] = _jpeg_extend(reader.read_bits(asize), asize)
                    k += 1
                block = np.zeros((8, 8), dtype=np.float64)
                deq = coefs * qtables[tq].astype(np.int64)
                for kk in range(64):
                    r, c = _JPEG_ZIGZAG[kk]
                    block[r, c] = deq[kk]
                spatial = mat.T @ block @ mat + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial
            mcu_index += 1
    cropped = [p[:h, :w] for p in planes]
    if ncomp == 1:
        ych = np.clip(np.round(cropped[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([ych, ych, ych], axis=2)
    else:
        y, cb, cr = cropped
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack(
            [
                np.clip(np.round(ch), 0, 255).astype(np.uint8)
                for ch in (r, g, b)
            ],
            axis=2,
        )
    return {"width": w, "height": h, "rgb": rgb}


JPEG_STATS_SCHEMA = BMP_STATS_SCHEMA


def jpeg_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction over REAL JPEG payloads:
    each batch entropy-decodes its binary column with the baseline
    Huffman+IDCT decoder (:func:`decode_jpeg_array`) and emits the same
    integer-exact stat vector as :func:`bmp_image_stats` /
    :func:`png_image_stats`.

    Scale posture: mapInPandas streams record batches — constant memory
    per task; per-pixel reductions are batch-amortized ``reduceat``
    sweeps shared with the other image codecs."""
    return media.mapInPandas(
        _image_stats_batches(decode_jpeg_array), schema=JPEG_STATS_SCHEMA
    )


# --- FLAC codec -----------------------------------------------------------


class _FlacBitReader:
    """MSB-first bit reader with byte-position access (FLAC CRCs cover
    whole byte ranges)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos      # next byte index
        self.bitbuf = 0
        self.nbits = 0

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            self.bitbuf = (self.bitbuf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read_bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.nbits = 0
        self.bitbuf = 0


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes, crc: int = 0) -> int:
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_utf8_number(r: "_FlacBitReader") -> int:
    """FLAC's UTF-8-style frame/sample number coding."""
    first = r.read_bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 coded frame number")
    v = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.read_bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residual(r: "_FlacBitReader", blocksize: int, order: int) -> list[int]:
    method = r.read_bits(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = r.read_bits(4)
    if blocksize % (1 << po):
        raise ValueError("partition order does not divide blocksize")
    out: list[int] = []
    for p in range(1 << po):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        param = r.read_bits(plen)
        if param == escape:
            raw = r.read_bits(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                v = (q << param) | (r.read_bits(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _flac_subframe(r: "_FlacBitReader", blocksize: int, bits: int) -> list[int]:
    if r.read_bits(1):
        raise ValueError("subframe header padding bit set")
    stype = r.read_bits(6)
    wasted = 0
    if r.read_bits(1):
        wasted = 1 + r.read_unary()
    eff = bits - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = r.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [r.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _flac_residual(r, blocksize, order)
        coefs = _FLAC_FIXED_COEFS[order]
        samples = list(warm)
        for res in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(res + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read_bits(4)
        if prec == 15:
            raise ValueError("invalid LPC coefficient precision 15")
        prec += 1
        shift = r.read_bits(5)
        if shift >= 16:  # 5-bit signed; negative shifts are invalid
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _flac_residual(r, blocksize, order)
        samples = list(warm)
        for res in resid:
            pred = sum(
                c * samples[-i - 1] for i, c in enumerate(coefs)
            ) >> shift
            samples.append(res + pred)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


_FLAC_BLOCKSIZE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048,
    12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_FLAC_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FLAC_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


@_total_decoder
def decode_flac(content: bytes) -> dict:
    """REAL FLAC decoder — pure stdlib bit arithmetic, no media
    libraries (the compressed-audio analog of :func:`decode_jpeg`,
    closing the last codec-category stub with a real lossless codec).
    Parses the ``fLaC`` magic and metadata-block chain (STREAMINFO bit
    fields), then each frame: sync code, blocksize/sample-rate codes
    (inline and STREAMINFO-sourced), channel assignment, UTF-8-coded
    frame number, CRC-8-verified header, subframes (CONSTANT, VERBATIM,
    FIXED predictors order 0-4 with partitioned-Rice residuals —
    zigzag + escape partitions per the spec), wasted-bits shift, and
    the CRC-16-verified frame footer.

    Supported: mono, independent-channel stereo/multichannel, all
    three side-channel stereo decorrelation modes (left/side,
    side/right, mid/side — the side channel's extra precision bit
    included), and every subframe type real encoders emit — CONSTANT,
    VERBATIM, FIXED orders 0-4, and LPC orders 1-32 (quantized
    coefficients with precision/shift). 8-24 bit. Raises
    ``ValueError`` on malformed payloads.

    Returns ``{"sample_rate", "n_channels", "bits", "samples"}`` with
    ``samples`` channel-interleaved (same contract as
    :func:`decode_wav`)."""
    import struct

    if len(content) < 42 or content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated metadata block header")
        hdr = struct.unpack_from(">I", content, pos)[0]
        last, btype, blen = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = content[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            packed = int.from_bytes(body[10:18], "big")
            streaminfo = {
                "min_block": struct.unpack_from(">H", body, 0)[0],
                "max_block": struct.unpack_from(">H", body, 2)[0],
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits": ((packed >> 36) & 0x1F) + 1,
                "total": packed & ((1 << 36) - 1),
            }
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    total = streaminfo["total"]
    n_ch = streaminfo["channels"]
    # Default before the frame loop: a structurally valid stream with
    # total=0 and zero frames must return STREAMINFO's rate, not crash
    # with an unbound local (the fake-mode-is-TOTAL contract).
    rate = streaminfo["sample_rate"]
    channels: list[list[int]] = [[] for _ in range(n_ch)]
    while pos < len(content) and (total == 0 or len(channels[0]) < total):
        frame_start = pos
        r = _FlacBitReader(content, pos)
        sync = r.read_bits(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync 0x{sync:04X}")
        r.read_bits(1)  # reserved
        r.read_bits(1)  # blocking strategy
        bs_code = r.read_bits(4)
        sr_code = r.read_bits(4)
        ch_code = r.read_bits(4)
        sz_code = r.read_bits(3)
        r.read_bits(1)  # reserved
        _flac_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 6:
            blocksize = r.read_bits(8) + 1
        elif bs_code == 7:
            blocksize = r.read_bits(16) + 1
        else:
            blocksize = _FLAC_BLOCKSIZE[bs_code]
        if sr_code == 0:
            rate = streaminfo["sample_rate"]
        elif sr_code in _FLAC_RATES:
            rate = _FLAC_RATES[sr_code]
        elif sr_code == 12:
            rate = r.read_bits(8) * 1000
        elif sr_code == 13:
            rate = r.read_bits(16)
        elif sr_code == 14:
            rate = r.read_bits(16) * 10
        else:
            raise ValueError("invalid sample-rate code 15")
        if ch_code > 10:
            raise ValueError(f"reserved channel assignment {ch_code}")
        side_mode = None
        if ch_code >= 8:  # 8=left/side 9=right/side 10=mid/side
            side_mode = ch_code
            ch_code = 1  # two channels
        if ch_code + 1 != n_ch:
            raise ValueError("frame channel count differs from STREAMINFO")
        if sz_code == 0:
            bits = streaminfo["bits"]
        elif sz_code in _FLAC_BITS:
            bits = _FLAC_BITS[sz_code]
        else:
            raise ValueError(f"reserved sample-size code {sz_code}")
        # CRC-8 covers the header bytes consumed so far (reader is
        # byte-aligned here: 32 header bits + whole-byte number/tails).
        if r.nbits:
            raise ValueError("frame header not byte-aligned before CRC-8")
        if _crc8(content[frame_start : r.pos]) != r.read_bits(8):
            raise ValueError("frame header CRC-8 mismatch")
        if side_mode is None:
            for ci in range(n_ch):
                channels[ci].extend(_flac_subframe(r, blocksize, bits))
        else:
            # The SIDE channel carries one extra bit of precision
            # (spec 9.1.4): differences of b-bit samples span b+1 bits.
            b0 = bits + (1 if side_mode == 9 else 0)
            b1 = bits + (1 if side_mode in (8, 10) else 0)
            first = _flac_subframe(r, blocksize, b0)
            second = _flac_subframe(r, blocksize, b1)
            if side_mode == 8:  # left/side: right = left - side
                left, right = first, [l - s for l, s in zip(first, second)]
            elif side_mode == 9:  # side/right: left = right + side
                right = second
                left = [s + rg for s, rg in zip(first, second)]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(first, second):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
            channels[0].extend(left)
            channels[1].extend(right)
        r.align()
        if _crc16(content[frame_start : r.pos]) != r.read_bits(16):
            raise ValueError("frame CRC-16 mismatch")
        pos = r.pos
    if total and len(channels[0]) < total:
        raise ValueError("stream ended before total_samples")
    if total:
        channels = [ch[:total] for ch in channels]
    interleaved: list[int] = []
    for i in range(len(channels[0])):
        for ch in channels:
            interleaved.append(ch[i])
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": streaminfo["bits"],
        "samples": interleaved,
    }


@_total_decoder
def decode_avi(content: bytes) -> dict:
    """REAL AVI (RIFF) video-container parser — pure stdlib ``struct``,
    no media libraries (the video analog of :func:`decode_wav`'s RIFF
    walk, upgrading the pseudo-frame byte slicer the frame-sample query
    uses into a genuine container decode). Walks the RIFF chunk tree
    with even-byte chunk padding: ``LIST hdrl`` (the 56-byte
    ``avih`` main header, ``LIST strl`` with the ``strh`` stream header
    and ``strf`` BITMAPINFOHEADER), ``LIST movi`` (the ``##db``
    uncompressed DIB frame chunks), and the optional ``idx1`` index —
    every idx1 entry is verified against the actual chunk offsets and
    lengths, the frame count against ``avih.dwTotalFrames``, and the
    stream format against the declared dimensions.

    Supported: single-stream uncompressed 24-bit RGB ('DIB ' / BI_RGB)
    video, frames stored bottom-up BGR with 4-byte row stride exactly
    like BMP pixel arrays. Raises ``ValueError`` on malformed payloads
    and ``NotImplementedError`` for compressed codecs / non-24-bit
    frames.

    Returns ``{"width", "height", "n_frames", "frames"}`` with
    ``frames`` a list of uint8 numpy arrays of shape (height, width,
    3), rows top to bottom, channels RGB."""
    import struct

    import numpy as np

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", content, 4)
    if 8 + riff_size > len(content):
        raise ValueError("RIFF size extends past end of payload")

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            cc = content[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", content, pos + 4)
            if pos + 8 + clen > end:
                raise ValueError(f"truncated {cc!r} chunk")
            yield cc, pos + 8, clen
            pos += 8 + clen + (clen & 1)  # RIFF chunks pad to even sizes

    avih = strh = strf = None
    frames_raw: list[tuple[int, bytes]] = []
    idx = None
    for cc, b, ln in walk(12, 8 + riff_size):
        if cc == b"LIST":
            ltype = content[b : b + 4]
            if ltype == b"hdrl":
                for cc2, b2, l2 in walk(b + 4, b + ln):
                    if cc2 == b"avih":
                        if l2 != 56:
                            raise ValueError(f"bad avih length {l2}")
                        avih = struct.unpack_from("<14I", content, b2)
                    elif cc2 == b"LIST" and content[b2 : b2 + 4] == b"strl":
                        for cc3, b3, l3 in walk(b2 + 4, b2 + l2):
                            if cc3 == b"strh":
                                if l3 < 48:
                                    raise ValueError(f"bad strh length {l3}")
                                strh = (
                                    content[b3 : b3 + 4],
                                    content[b3 + 4 : b3 + 8],
                                )
                            elif cc3 == b"strf":
                                if l3 < 40:
                                    raise ValueError(f"bad strf length {l3}")
                                strf = struct.unpack_from(
                                    "<IiiHHI", content, b3
                                )
            elif ltype == b"movi":
                for cc2, b2, l2 in walk(b + 4, b + ln):
                    if cc2[2:4] in (b"db", b"dc"):
                        # offset convention: from the 'movi' fourcc to
                        # the chunk's ckid (first chunk = 4)
                        frames_raw.append((b2 - 8 - b, content[b2 : b2 + l2]))
        elif cc == b"idx1":
            if ln % 16:
                raise ValueError(f"idx1 length {ln} not a multiple of 16")
            idx = [
                struct.unpack_from("<4sIII", content, b + 16 * i)
                for i in range(ln // 16)
            ]
    if avih is None:
        raise ValueError("missing avih main header")
    if strh is None or strf is None:
        raise ValueError("missing strh/strf stream headers")
    n_frames, n_streams, w, h = avih[4], avih[6], avih[8], avih[9]
    if n_streams != 1:
        raise NotImplementedError(f"only single-stream AVI (got {n_streams})")
    if strh[0] != b"vids":
        raise NotImplementedError(f"only video streams (got {strh[0]!r})")
    if strh[1] not in (b"DIB ", b"\x00\x00\x00\x00"):
        raise NotImplementedError(f"compressed codec {strh[1]!r}")
    _bi_size, bw, bh, _planes, bpp, compression = strf
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit frames (bpp={bpp}, comp={compression})"
        )
    if (bw, abs(bh)) != (w, h) or w <= 0 or h <= 0:
        raise ValueError(f"strf {bw}x{bh} disagrees with avih {w}x{h}")
    if len(frames_raw) != n_frames:
        raise ValueError(
            f"movi holds {len(frames_raw)} frames, avih declares {n_frames}"
        )
    if idx is not None:
        if len(idx) != len(frames_raw):
            raise ValueError("idx1 entry count != frame count")
        for (ckid, _flags, off, ln2), (real_off, data) in zip(idx, frames_raw):
            if ckid[2:4] not in (b"db", b"dc"):
                raise ValueError(f"idx1 entry for non-frame chunk {ckid!r}")
            if off != real_off or ln2 != len(data):
                raise ValueError(
                    f"idx1 entry ({off}, {ln2}) != actual "
                    f"({real_off}, {len(data)})"
                )
    stride = (w * 3 + 3) & ~3
    frames = []
    for _off, data in frames_raw:
        if len(data) != h * stride:
            raise ValueError(
                f"frame length {len(data)} != {h} rows x {stride} stride"
            )
        arr = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)
        rgb = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        if bh > 0:  # bottom-up like BMP
            rgb = rgb[::-1]
        frames.append(rgb)
    return {"width": w, "height": h, "n_frames": n_frames, "frames": frames}


AVI_STATS_SCHEMA = (
    "media_id long, frame_no int, width int, height int, n_frames int, "
    "sum_r long, sum_g long, sum_b long, topleft_r int"
)


def avi_video_stats(media: DataFrame, every_nth: int = 1) -> DataFrame:
    """Arrow-batched per-frame feature extraction over REAL AVI
    payloads: decode the container (:func:`decode_avi`), keep every
    ``every_nth``-th frame, and emit per-frame channel sums plus the
    order-sensitive top-left red byte (which only matches the oracle if
    the bottom-up un-flip AND the BGR→RGB swap both happened). Same
    mapInPandas record-batch streaming as the other codecs: constant
    memory per task, per-frame reductions as numpy sums."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "frame_no", "width", "height", "n_frames",
                "sum_r", "sum_g", "sum_b", "topleft_r",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_avi(bytes(content))
                for fno in range(0, d["n_frames"], every_nth):
                    rgb = d["frames"][fno].astype("int64")
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["width"].append(d["width"])
                    out["height"].append(d["height"])
                    out["n_frames"].append(d["n_frames"])
                    out["sum_r"].append(int(rgb[:, :, 0].sum()))
                    out["sum_g"].append(int(rgb[:, :, 1].sum()))
                    out["sum_b"].append(int(rgb[:, :, 2].sum()))
                    out["topleft_r"].append(int(rgb[0, 0, 0]))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AVI_STATS_SCHEMA)


# --- TIFF (baseline, uncompressed) ------------------------------------------


@_total_decoder
def decode_tiff_array(content: bytes) -> dict:
    """REAL baseline TIFF decoder — pure stdlib ``struct``, no media
    libraries: the EIGHTH codec, and the first with a general tagged
    metadata directory (the IFD walk every TIFF reader starts from).
    Parses both byte orders (``II`` little / ``MM`` big), verifies the
    42 magic, walks the first IFD's 12-byte entries (tag / type /
    count / inline-or-offset value with the ≤4-byte inlining rule),
    and assembles the image from its strips: per-strip offsets and
    byte counts must agree exactly with rows-per-strip × row size, and
    the strips concatenate to (height, width, samples).

    Supported: uncompressed (Compression=1) chunky (PlanarConfig=1)
    8-bit RGB (Photometric=2, SamplesPerPixel=3) and grayscale
    BlackIsZero (Photometric=1, SamplesPerPixel=1 — expanded to RGB),
    any strip layout. Raises ``ValueError`` on malformed payloads and
    ``NotImplementedError`` for compressed / palette / WhiteIsZero /
    planar / non-8-bit variants.

    Returns ``{"width", "height", "rgb"}`` with ``rgb`` a uint8 numpy
    array of shape (height, width, 3), rows top to bottom."""
    import struct

    import numpy as np

    if len(content) < 8:
        raise ValueError("not a TIFF payload")
    order = content[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError(f"bad TIFF byte order {order!r}")
    (magic, ifd_off) = struct.unpack_from(bo + "HI", content, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(content):
        raise ValueError("IFD offset past end of payload")
    (n_entries,) = struct.unpack_from(bo + "H", content, ifd_off)
    if n_entries == 0:
        raise ValueError("empty IFD")
    if ifd_off + 2 + 12 * n_entries + 4 > len(content):
        raise ValueError("truncated IFD")

    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4}
    _FMT = {1: "B", 2: "B", 3: "H", 4: "I"}

    def values(pos: int) -> tuple[int, list[int]]:
        tag, typ, cnt = struct.unpack_from(bo + "HHI", content, pos)
        if typ not in _SIZES:
            raise NotImplementedError(f"TIFF value type {typ} (tag {tag})")
        total = _SIZES[typ] * cnt
        if total <= 4:
            off = pos + 8  # inline, left-justified in the value field
        else:
            (off,) = struct.unpack_from(bo + "I", content, pos + 8)
        if off + total > len(content):
            raise ValueError(f"tag {tag} values past end of payload")
        return tag, list(
            struct.unpack_from(bo + str(cnt) + _FMT[typ], content, off)
        )

    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        tag, vals = values(ifd_off + 2 + 12 * i)
        tags[tag] = vals

    def one(tag: int, default=None) -> int:
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return tags[tag][0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    compression = one(259, 1)
    if compression != 1:
        raise NotImplementedError(f"TIFF compression {compression}")
    photometric = one(262)
    spp = one(277, 1)
    if one(284, 1) != 1:
        raise NotImplementedError("planar (non-chunky) TIFF")
    if photometric == 2:
        if spp < 3:
            raise ValueError(f"RGB TIFF with {spp} samples/pixel")
        if spp > 3:
            raise NotImplementedError(f"extra samples ({spp}/pixel)")
    elif photometric == 1:
        if spp != 1:
            raise ValueError(f"grayscale TIFF with {spp} samples/pixel")
    else:
        raise NotImplementedError(f"TIFF photometric {photometric}")
    bits = tags.get(258, [1] if photometric == 1 else None)
    if bits is None:
        raise ValueError("RGB TIFF missing BitsPerSample")
    if any(b != 8 for b in bits) or len(bits) != spp:
        raise NotImplementedError(f"BitsPerSample {bits}")
    rows_per_strip = one(278, h)
    if rows_per_strip <= 0:
        raise ValueError("bad RowsPerStrip")
    offs = tags.get(273)
    cnts = tags.get(279)
    if offs is None or cnts is None:
        raise ValueError("missing StripOffsets/StripByteCounts")
    n_strips = (h + rows_per_strip - 1) // rows_per_strip
    if len(offs) != n_strips or len(cnts) != n_strips:
        raise ValueError(
            f"{len(offs)}/{len(cnts)} strips, expected {n_strips}"
        )
    row_bytes = w * spp
    data = bytearray()
    for i, (o, c) in enumerate(zip(offs, cnts)):
        rows = min(rows_per_strip, h - i * rows_per_strip)
        if c != rows * row_bytes:
            raise ValueError(
                f"strip {i} byte count {c} != {rows} rows x {row_bytes}"
            )
        if o + c > len(content):
            raise ValueError(f"strip {i} extends past end of payload")
        data += content[o : o + c]
    px = np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w, spp)
    rgb = np.repeat(px, 3, axis=2) if spp == 1 else px
    return {"width": w, "height": h, "rgb": rgb}


def tiff_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched image feature extraction over REAL TIFF payloads:
    identical stat vector and batch-wide reduceat sweeps as
    :func:`bmp_image_stats`, decoded by the stdlib IFD walker
    (:func:`decode_tiff_array`)."""
    return media.mapInPandas(
        _image_stats_batches(decode_tiff_array), schema=BMP_STATS_SCHEMA
    )


# --- MPEG audio (mp3) frame container --------------------------------------

_MP3_BITRATES_V1L3 = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_BITRATES_V2L3 = (
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
)
_MP3_RATES = {
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),   # MPEG2.5
}


def _mp3_crc16(data: bytes, crc: int = 0xFFFF) -> int:
    """MPEG audio protection CRC-16: poly 0x8005, init 0xFFFF, MSB
    first, no final XOR — covers header bytes 2-3 + the side info."""
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1)
            crc &= 0xFFFF
    return crc


def decode_mp3_frames(content: bytes) -> dict:
    """REAL MPEG audio (mp3) FRAME walker — pure stdlib, no media
    libraries: the mp3 analog of :func:`decode_ogg_pages`'s container
    walk. Skips a leading ID3v2 tag (synchsafe size), then walks every
    frame: 11-bit sync, version/layer fields, bitrate and sample-rate
    table lookups, the exact frame-length arithmetic
    (⌊coef·bitrate/rate⌋ + padding, coef 144 for MPEG1 Layer III / 72
    for MPEG2(.5)) that must land each frame boundary precisely on the
    next sync word, and — when the protection bit says so — the
    CRC-16 over header bytes 2-3 + side info. Headers must agree on
    version/layer/sample-rate/channel-mode across frames; bitrate and
    padding may vary per frame (VBR is legal). The walk must consume
    the payload exactly (no trailing bytes).

    This is a CONTAINER decode: per-frame main data comes back as
    opaque bytes; Huffman/psychoacoustic SAMPLE decode genuinely needs
    media libraries and stays behind :func:`decode_audio`'s
    ``NotImplementedError``. Raises ``ValueError`` on malformed frames
    and ``NotImplementedError`` for Layer I/II and free-format
    (bitrate index 0) streams.

    Returns ``{"version", "sample_rate", "channels", "n_frames",
    "protected", "bitrates_kbps", "frames_main"}``."""
    pos = 0
    if content[:3] == b"ID3":
        if len(content) < 10:
            raise ValueError("truncated ID3v2 tag")
        if any(b & 0x80 for b in content[6:10]):
            raise ValueError("ID3v2 size bytes must be synchsafe")
        size = (
            (content[6] << 21) | (content[7] << 14)
            | (content[8] << 7) | content[9]
        )
        pos = 10 + size
        if pos > len(content):
            raise ValueError("ID3v2 size extends past end of payload")
    if pos + 4 > len(content):
        raise ValueError("no MPEG audio frame")
    version = sample_rate = channels = None
    protected = False
    bitrates: list[int] = []
    frames_main: list[bytes] = []
    while pos < len(content):
        if pos + 4 > len(content):
            raise ValueError(f"truncated frame header at offset {pos}")
        b0, b1, b2, b3 = content[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at offset {pos}")
        ver_id = (b1 >> 3) & 0x3       # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer_id = (b1 >> 1) & 0x3     # 1 = Layer III
        prot = not (b1 & 0x1)          # protection_bit 0 -> CRC present
        if ver_id == 1:
            raise ValueError("reserved MPEG version id")
        if layer_id != 1:
            raise NotImplementedError(
                f"only Layer III supported (layer id {layer_id})"
            )
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        mode = (b3 >> 6) & 0x3         # 3 = mono
        if br_idx == 0:
            raise NotImplementedError("free-format bitrate not supported")
        if br_idx == 0xF:
            raise ValueError("invalid bitrate index 15")
        if sr_idx == 3:
            raise ValueError("reserved sample-rate index")
        rate = _MP3_RATES[ver_id][sr_idx]
        if ver_id == 3:
            kbps = _MP3_BITRATES_V1L3[br_idx]
            coef = 144
        else:
            kbps = _MP3_BITRATES_V2L3[br_idx]
            coef = 72
        ch = 1 if mode == 3 else 2
        if version is None:
            version, sample_rate, channels = ver_id, rate, ch
            protected = prot
        elif (ver_id, rate, ch) != (version, sample_rate, channels):
            raise ValueError(
                f"frame at offset {pos} changes stream parameters"
            )
        flen = coef * kbps * 1000 // rate + padding
        if pos + flen > len(content):
            raise ValueError(f"truncated frame at offset {pos}")
        body = pos + 4
        if prot:
            if ver_id == 3:
                side = 17 if ch == 1 else 32
            else:
                side = 9 if ch == 1 else 17
            if body + 2 + side > pos + flen:
                raise ValueError("frame too short for CRC + side info")
            (crc_stored,) = (
                (content[body] << 8) | content[body + 1],
            )
            calc = _mp3_crc16(
                content[pos + 2 : pos + 4]
                + content[body + 2 : body + 2 + side]
            )
            if crc_stored != calc:
                raise ValueError(f"frame CRC mismatch at offset {pos}")
            body += 2
        frames_main.append(content[body : pos + flen])
        bitrates.append(kbps)
        pos += flen
    if not frames_main:
        raise ValueError("no MPEG audio frame")
    return {
        "version": version,
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": len(frames_main),
        "protected": protected,
        "bitrates_kbps": bitrates,
        "frames_main": frames_main,
    }


MP3_FRAMES_SCHEMA = (
    "media_id long, n_frames int, sample_rate int, channels int, "
    "bitrate_kbps int, main_bytes long, tail_word long"
)


def mp3_frame_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched container-level feature extraction over REAL mp3
    payloads: walk every frame (:func:`decode_mp3_frames` — sync,
    table lookups, length arithmetic, side-info CRC-16 all verified)
    and emit the stream facts plus ``tail_word``, the final frame's
    last ≤4 main-data bytes folded little-endian — order-sensitive, so
    a hash match proves byte-exact frame segmentation."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "n_frames", "sample_rate", "channels",
                "bitrate_kbps", "main_bytes", "tail_word",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_mp3_frames(bytes(content))
                tail = d["frames_main"][-1][-4:]
                word = sum(b << (8 * i) for i, b in enumerate(tail))
                out["media_id"].append(mid)
                out["n_frames"].append(d["n_frames"])
                out["sample_rate"].append(d["sample_rate"])
                out["channels"].append(d["channels"])
                out["bitrate_kbps"].append(max(d["bitrates_kbps"]))
                out["main_bytes"].append(
                    sum(len(m) for m in d["frames_main"])
                )
                out["tail_word"].append(word)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=MP3_FRAMES_SCHEMA)


# --- Ogg container (RFC 3533) ---------------------------------------------


def _ogg_crc_table() -> tuple[int, ...]:
    """Direct (non-reflected) CRC-32 table, poly 0x04C11DB7 — the Ogg
    page checksum variant (init 0, no final XOR), NOT the reflected
    IEEE CRC-32 Spark's ``crc32()`` computes."""
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return tuple(table)


_OGG_CRC_TABLE = _ogg_crc_table()


def _ogg_crc(data: bytes, crc: int = 0) -> int:
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ b]
    return crc


def decode_ogg_pages(content: bytes) -> dict:
    """REAL Ogg (RFC 3533) container parser — pure stdlib, no media
    libraries: the container-level analog of :func:`decode_avi`'s RIFF
    walk for the remaining stubbed audio family. Walks every physical
    page and verifies the full page discipline: capture pattern,
    version 0, the page CRC-32 (direct 0x04C11DB7 variant, recomputed
    with the checksum field zeroed), single-logical-stream serial
    numbers, contiguous page sequence numbers, BOS on exactly the first
    page / EOS on exactly the last, and lacing-value packet assembly
    including the 255-continuation rule (a page ending on a 255 lace
    leaves a packet open; the next page must carry the continued flag,
    and only then).

    This is a CONTAINER decode: packets come back as opaque bytes.
    Psychoacoustic sample decode (Vorbis/Opus payloads) genuinely needs
    media libraries and stays behind :func:`decode_audio`'s
    ``NotImplementedError``. Raises ``ValueError`` on malformed pages
    and ``NotImplementedError`` for multiplexed (multi-serial) streams.

    Returns ``{"n_pages", "n_packets", "serial", "last_granule",
    "payload_bytes", "packets"}``."""
    import struct

    if len(content) < 27 or content[:4] != b"OggS":
        raise ValueError("not an Ogg payload")
    pos = 0
    serial = None
    expect_seq = 0
    n_pages = 0
    payload_bytes = 0
    last_granule = 0
    packets: list[bytes] = []
    cur = b""
    last_was_eos = False
    while pos < len(content):
        if pos + 27 > len(content):
            raise ValueError("truncated page header")
        if content[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad capture pattern at offset {pos}")
        version, htype = content[pos + 4], content[pos + 5]
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        (granule,) = struct.unpack_from("<q", content, pos + 6)
        (pserial, pseq, pcrc) = struct.unpack_from("<III", content, pos + 14)
        nsegs = content[pos + 26]
        seg_end = pos + 27 + nsegs
        if seg_end > len(content):
            raise ValueError("truncated segment table")
        laces = content[pos + 27 : seg_end]
        body_len = sum(laces)
        page_end = seg_end + body_len
        if page_end > len(content):
            raise ValueError("truncated page body")
        page = bytearray(content[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != pcrc:
            raise ValueError(f"page CRC mismatch at offset {pos}")
        if serial is None:
            serial = pserial
            if not htype & 0x02:
                raise ValueError("first page lacks BOS flag")
        elif pserial != serial:
            raise NotImplementedError(
                "multiplexed Ogg (multiple serials) not supported"
            )
        elif htype & 0x02:
            raise ValueError("BOS flag on a non-first page")
        if last_was_eos:
            raise ValueError("page after EOS")
        if pseq != expect_seq:
            raise ValueError(
                f"page sequence gap: expected {expect_seq}, got {pseq}"
            )
        if bool(htype & 0x01) != bool(cur):
            raise ValueError(
                "continuation flag disagrees with open packet state"
            )
        seg_pos = seg_end
        for lace in laces:
            cur += content[seg_pos : seg_pos + lace]
            seg_pos += lace
            if lace < 255:
                packets.append(cur)
                cur = b""
        payload_bytes += body_len
        last_granule = granule
        last_was_eos = bool(htype & 0x04)
        expect_seq += 1
        n_pages += 1
        pos = page_end
    if cur:
        raise ValueError("stream ends mid-packet")
    if not last_was_eos:
        raise ValueError("last page lacks EOS flag")
    return {
        "n_pages": n_pages,
        "n_packets": len(packets),
        "serial": serial,
        "last_granule": last_granule,
        "payload_bytes": payload_bytes,
        "packets": packets,
    }


OGG_PAGES_SCHEMA = (
    "media_id long, n_pages int, n_packets int, serial long, "
    "last_granule long, payload_bytes long, tail_word long"
)


def ogg_page_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched container-level feature extraction over REAL Ogg
    payloads: decode every page (:func:`decode_ogg_pages` — CRC-32,
    sequence, BOS/EOS, lacing assembly all verified) and emit the
    container facts plus ``tail_word``, the final packet's last ≤4
    bytes folded little-endian — order-sensitive, so a hash match
    proves byte-exact packet reassembly through the segment table."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "n_pages", "n_packets", "serial",
                "last_granule", "payload_bytes", "tail_word",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_ogg_pages(bytes(content))
                tail = d["packets"][-1][-4:] if d["packets"] else b""
                word = sum(b << (8 * i) for i, b in enumerate(tail))
                out["media_id"].append(mid)
                out["n_pages"].append(d["n_pages"])
                out["n_packets"].append(d["n_packets"])
                out["serial"].append(d["serial"])
                out["last_granule"].append(d["last_granule"])
                out["payload_bytes"].append(d["payload_bytes"])
                out["tail_word"].append(word)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=OGG_PAGES_SCHEMA)


FLAC_STATS_SCHEMA = WAV_STATS_SCHEMA


def flac_audio_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction over REAL FLAC payloads:
    identical stat vector to :func:`wav_audio_stats`, decoded by the
    pure-stdlib FLAC parser (:func:`decode_flac`)."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_samples",
                "sum_samples", "max_abs", "mean_sample",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_flac(bytes(content))
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

    return media.mapInPandas(batches, schema=FLAC_STATS_SCHEMA)


def bmp_pixel_channels(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction for the image-dedup family: each
    BMP payload decodes with the stdlib BI_RGB parser
    (:func:`decode_bmp_array`) and emits its flattened channel vector
    (row-major top-to-bottom, RGB per pixel) as ``array<int>`` — the
    raw representation the quantization-band blocker and the exact L1
    verifier consume. Same Arrow mapInPandas scale posture as
    :func:`bmp_image_stats`: streaming record batches, one decode per
    blob, constant memory per task."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            mids, chans = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_bmp_array(bytes(content))
                mids.append(mid)
                # .tolist() flattens at C speed (12x the per-element
                # comprehension) and yields Python ints as Arrow needs
                chans.append(d["rgb"].reshape(-1).tolist())
            yield pd.DataFrame({"media_id": mids, "channels": chans})

    return media.mapInPandas(
        batches, schema="media_id long, channels array<int>"
    )


def avi_frame_channels(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction for the VIDEO-dedup family: each
    AVI payload decodes with the stdlib RIFF container parser
    (:func:`decode_avi`) and emits one row PER FRAME carrying the
    frame's flattened channel vector (row-major top-to-bottom, RGB per
    pixel) as ``array<int>`` plus the clip's frame count — the raw
    representation the per-frame perceptual-hash blocker and the
    frame-sequence verifier consume. Same Arrow mapInPandas scale
    posture as :func:`bmp_pixel_channels`: streaming record batches,
    one container decode per blob, constant memory per task (frames
    stream out of the batch as plain int lists)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            mids, fnos, nfs, chans = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_avi(bytes(content))
                for fno, rgb in enumerate(d["frames"]):
                    mids.append(mid)
                    fnos.append(fno)
                    nfs.append(d["n_frames"])
                    chans.append(rgb.reshape(-1).tolist())
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_no": fnos,
                    "n_frames": nfs,
                    "channels": chans,
                }
            )

    return media.mapInPandas(
        batches,
        schema=(
            "media_id long, frame_no int, n_frames int,"
            " channels array<int>"
        ),
    )


def _ahash32(rgb) -> int:
    """32-bit aHash of one decoded frame, vectorized: bit p set iff
    pixel p's luminance (R+G+B) times n_pixels exceeds the frame's
    luminance total — EXACT int64 arithmetic, term-for-term the SQL
    predicate ``CAST(l AS BIGINT) * n > total`` the image/video dedup
    oracles replay, so fusing the hash into the decode pass cannot
    change a single bit."""
    import numpy as np

    lums = rgb.reshape(-1, 3).sum(axis=1, dtype=np.int64)
    bits = (lums * lums.size > int(lums.sum())).astype(np.int64)
    return int((bits << np.arange(lums.size, dtype=np.int64)).sum())


def bmp_ahash32(media: DataFrame) -> DataFrame:
    """REAL-decode + perceptual hash in ONE Arrow pass: decode each BMP
    with the stdlib BI_RGB parser (:func:`decode_bmp_array`) and emit
    the 32-bit aHash computed from the decoded pixels (:func:`_ahash32`)
    — the fused form of ``bmp_pixel_channels`` + the SQL
    transform/aggregate chain. The higher-order-function chain this
    replaces ran INTERPRETED per row (lambda expressions don't
    participate in whole-stage codegen) and measured 20 ↔ 280 s of
    executor CPU for the same 111k-image input across back-to-back
    runs (JIT/GC-sensitive); the numpy form is a few vector ops per
    image inside the worker that already holds the decoded array, and
    shrinks the Arrow return column from ``array<int>`` (96 ints) to
    one long. Streaming record batches, one decode per blob, constant
    memory per task."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            mids, hs = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                mids.append(mid)
                hs.append(_ahash32(decode_bmp_array(bytes(content))["rgb"]))
            yield pd.DataFrame({"media_id": mids, "fh": hs})

    return media.mapInPandas(batches, schema="media_id long, fh long")


def avi_frame_ahash32(media: DataFrame) -> DataFrame:
    """REAL container decode + per-frame perceptual hash in ONE Arrow
    pass: decode each AVI with the stdlib RIFF parser
    (:func:`decode_avi`) and emit one row per frame with its 32-bit
    aHash (:func:`_ahash32`) — the fused form of
    ``avi_frame_channels`` + the SQL transform/aggregate chain, for
    the same reasons as :func:`bmp_ahash32` (interpreted
    higher-order functions off the hot path, one long across Arrow
    instead of a 96-int array per frame)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            mids, fnos, hs = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = decode_avi(bytes(content))
                for fno, rgb in enumerate(d["frames"]):
                    mids.append(mid)
                    fnos.append(fno)
                    hs.append(_ahash32(rgb))
            yield pd.DataFrame(
                {"media_id": mids, "frame_no": fnos, "fh": hs}
            )

    return media.mapInPandas(
        batches, schema="media_id long, frame_no int, fh long"
    )
