"""Similarity search over embedding columns (LLM-pipeline surface).

- brute-force cosine top-k: the exact baseline. Query side is broadcast
  (k queries ≪ corpus), corpus side streams — no shuffle of the corpus
  at all; per-partition partial top-k then a tiny final top-k. That IS
  the 100 TB plan: broadcast-join + window-rank is how you avoid
  gathering 100 TB of scores.
- IVF-style bucketed ANN: assign each vector to its nearest of C
  centroids (precomputed or sampled), search only matching buckets —
  the LSH/IVF pre-filter pattern from the PAPERS.md top-k literature.
"""

from __future__ import annotations

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
