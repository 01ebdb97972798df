"""Similarity search over embedding columns (LLM-pipeline surface).

- brute-force cosine top-k: the exact baseline. Query side is broadcast
  (k queries ≪ corpus), corpus side streams — no shuffle of the corpus
  at all; per-partition partial top-k then a tiny final top-k. That IS
  the 100 TB plan: broadcast-join + window-rank is how you avoid
  gathering 100 TB of scores.
- IVF-style bucketed ANN: assign each vector to its nearest of C
  centroids (precomputed or sampled), search only matching buckets —
  the LSH/IVF pre-filter pattern from the PAPERS.md top-k literature.
- embedding-cosine near-dup: exact (blocked self-join) and approximate
  (random-hyperplane LSH bucketing, the scale path — pair space shrinks
  from O(n²) to per-bucket).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as vf


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` is small → broadcast nested-loop join, then per-query
    window rank. Ties broken by corpus id for determinism.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(vf.cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine).

    Centroids are broadcast; assignment is a broadcast join + window
    min — the partitioning step of IVF ANN. At scale the output would be
    written bucketed by ``centroid_id`` so probe queries touch only
    matching buckets.
    """
    c = centroids.select(F.col(centroid_id_col), F.col(centroid_vec_col).alias("_cvec"))
    scored = corpus.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(centroid_id_col),
        vf.cosine(F.col(vec_col), F.col("_cvec")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc(centroid_id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, centroid_id_col)
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest centroids'
    buckets per query. Same output schema as :func:`cosine_topk`."""
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    c = centroids.select(F.col("centroid_id"), F.col("centroid").alias("_cvec"))
    qprobe = (
        queries.crossJoin(F.broadcast(c))
        .select(
            query_id_col,
            F.col(vec_col).alias("_qvec"),
            "centroid_id",
            vf.cosine(F.col(vec_col), F.col("_cvec")).alias("_sim"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.desc("_sim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "_qvec", "centroid_id")
    )
    scored = assigned.join(F.broadcast(qprobe), "centroid_id").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(vf.cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.3,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: self-join blocked on
    ``block_col`` (pair space bounded per block; the blocking-key
    pattern), keep pairs with cosine ≥ ``threshold``.

    At 100 TB the block key would come from :func:`rhp_lsh_near_dup_pairs`
    instead of a data column — this exact variant is the oracle-checkable
    baseline and the recall reference for the LSH path.
    """
    cols = [F.col(id_col), F.col(vec_col)]
    if block_col is not None:
        cols.append(F.col(block_col))
    sh = corpus.select(*cols)
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col is not None:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    cos = vf.cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, cond)
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("_cos", 6).alias("cosine"),
        )
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 1234) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes as plan-time literals."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def rhp_signature(
    vec: F.Column, planes: list[list[float]]
) -> F.Column:
    """Random-hyperplane (SimHash-for-vectors) signature: bit j is the
    sign of ``vec · plane_j``, packed into one long. Pure codegen'd
    expressions — the dot products run next to the parquet scan."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        d = vf.dot(vec, F.array(*[F.lit(x) for x in plane]))
        sig = sig.bitwiseOR(
            F.when(d >= 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def rhp_lsh_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.3,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int = 64,
    seed: int = 1234,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate embedding near-dup via random-hyperplane LSH.

    Pipeline: signature (n_bits hyperplane signs) → split into
    ``n_bands`` bands → equi-join per band (shuffle keyed by
    (band, band_bits) — never a cross join) → distinct candidate pairs →
    exact cosine verify ≥ threshold.

    Collision probability per bit is 1 − θ/π; true near-dups
    (cosine ≳ 0.9) collide in some band with ≥99% probability at
    16 bits × 4 bands. Output schema matches
    :func:`cosine_near_dup_pairs`; recall is pinned by tests on
    constructed duplicates.
    """
    planes = _hyperplanes(n_bits, dim, seed)
    bits_per_band = n_bits // n_bands
    mask = (1 << bits_per_band) - 1
    sigs = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        rhp_signature(F.col(vec_col), planes).alias("_sig"),
    )
    bands = sigs.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("_sig", i * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("bits"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, vec_col, F.col("b.band").alias("band"), F.col("b.bits").alias("bits"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"b.{vec_col}").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("_cos", vf.cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )
