"""Round-4 LLM-pipeline additions: exact segment-level dedup
(the RefinedWeb/CCNet "line dedup" mode), product-quantization ANN,
and the streaming near-dup twin.

All registered AFTER the earlier families so the driver's first-50
correctness sample keeps the reference-parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import spread
from ..sources import load
from .registry import query

# Segment width for "line"-level dedup. The driver corpus is
# single-line word soup (no newlines or sentence delimiters at any sf),
# so the line unit is a fixed window of 8 whitespace tokens — the same
# chunking rule text_chunk_documents uses, and the same pipeline shape
# RefinedWeb/CCNet line-dedup has: explode to segments, keep the
# corpus-first occurrence, reassemble.
_SEG = 8


@query(
    "dedup_exact_lines",
    oracle=f"""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
    FROM documents
),
c AS (
    SELECT doc_id,
           CAST(u.i AS INTEGER) AS chunk_no,
           CAST(ceil(len(toks) / {_SEG}.0) AS BIGINT) AS n_chunks,
           array_to_string(toks[(u.i * {_SEG} + 1):(u.i * {_SEG} + {_SEG})],
                           ' ') AS line
    FROM t, LATERAL unnest(
        range(0, CAST(ceil(len(toks) / {_SEG}.0) AS BIGINT))) u(i)
),
r AS (
    SELECT doc_id, chunk_no, n_chunks, line,
           row_number() OVER (
               PARTITION BY line ORDER BY doc_id, chunk_no) AS rn
    FROM c
)
SELECT doc_id,
       string_agg(line, ' ' ORDER BY chunk_no) AS dedup_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(n_chunks) - COUNT(*) AS BIGINT) AS n_dropped
FROM r WHERE rn = 1
GROUP BY doc_id
""",
)
def dedup_exact_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT segment-level dedup (RefinedWeb/CCNet line-dedup): explode
    every document into fixed 8-token segments, keep each distinct
    segment only at its FIRST corpus occurrence (smallest (doc_id,
    position)), and reassemble the surviving segments per document in
    original order. Documents whose every segment already appeared
    earlier vanish entirely — the aggressive end of the dedup family
    that doc-level exact/near-dup (operators/dedup.py) cannot express.

    Scale posture: all equi-join shapes. The keeper table is a
    groupBy-min over (64-bit segment hash, segment) — uniform keys, no
    corpus-wide sort-window (the oracle's row_number states the
    semantics; the Spark plan computes the same argmin as one partial
    aggregate). The kept-segment join shuffles on the same hash key,
    and reassembly is one groupBy(doc_id) with an in-group array_sort —
    bounded by segments-per-document, never corpus-wide."""
    docs = spread(load(spark, sf_dir, "documents"))
    toks = F.split(F.trim("text"), r"\s+")
    t = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.ceil(F.size(toks) / _SEG).alias("n_chunks"),
    )
    lines = t.select(
        "doc_id",
        "n_chunks",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int"))
        ).alias("chunk_no"),
        "toks",
    ).select(
        "doc_id",
        "n_chunks",
        "chunk_no",
        F.concat_ws(
            " ",
            F.slice(
                "toks", (F.col("chunk_no") * _SEG + 1).cast("int"), _SEG
            ),
        ).alias("line"),
    )
    # 64-bit prefix key keeps the shuffle narrow; the full segment rides
    # along only to break hash collisions exactly.
    lines = lines.withColumn("h", F.xxhash64("line"))
    keeper = lines.groupBy("h", "line").agg(
        F.min(F.struct("doc_id", "chunk_no")).alias("k")
    )
    kept = (
        lines.join(keeper, ["h", "line"])
        .filter(
            F.struct("doc_id", "chunk_no") == F.col("k")
        )
    )
    return kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_no", "line"))),
                lambda x: x["line"],
            ),
        ).alias("dedup_text"),
        F.count(F.lit(1)).alias("n_kept"),
        (F.max("n_chunks") - F.count(F.lit(1))).alias("n_dropped"),
    )
