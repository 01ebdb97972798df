"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` (the pattern the reference's
24-byte BLE payload decode B2 scales up to — SURVEY.md §2.1).

The Spark-side plumbing (schemas, batch iteration, partitioning) is
real and tested; the actual image/audio codecs are STUBBED because the
container has no media libraries: ``decode_image``/``decode_audio``
raise NotImplementedError unless ``fake=True``, in which case a
deterministic byte-statistics "decode" stands in so the dataflow can be
exercised end-to-end.

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
    """Image decode stub. Real implementation needs an image codec
    (Pillow/opencv — not in this container)."""
    if not fake:
        raise NotImplementedError("image codecs unavailable; pass fake=True")
    return {"width": len(content) % 640, "height": len(content) % 480, "channels": 3}


def decode_audio(content: bytes, fake: bool = False) -> dict:
    """Audio decode stub (soundfile/librosa not in this container)."""
    if not fake:
        raise NotImplementedError("audio codecs unavailable; pass fake=True")
    return {"sample_rate": 16000, "n_samples": len(content) * 2}


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
