"""Deduplication operators for the LLM-data-pipeline surface
(BASELINE.json north star; generalizes reference op B8's last-wins
dedup, ``/root/reference/src/bluetooth/scanner.rs:99,185``).

Scale posture:
- exact dedup: hash-groupBy on a fingerprint — one shuffle keyed by the
  hash, near-perfectly balanced by construction (hashes are uniform);
- MinHash-LSH: band signatures → explode to (band, band_hash) buckets →
  self-join inside buckets only. The candidate join is equi-keyed on the
  bucket, so Spark shuffles by bucket id; no quadratic cross join ever
  materializes. This is the standard LSH pre-filter the PAPERS.md
  similarity-join literature (compressed-index/TopK joins) assumes.
- SimHash: 64-bit signature + banding on 4×16-bit chunks for candidate
  pairs within Hamming distance ≤3 (pigeonhole over 4 bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tf


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint; keeps the smallest id
    per duplicate group (deterministic winner)."""
    fp = tf.fingerprint(F.col(text_col))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_fp")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: for seed i, min over shingles of
    xxhash64(shingle, seed=i). Pure builtins (explode-free: array
    ``transform`` + ``array_min``)."""

    def hash_with_seed(i: int):
        # Factory, not a default-arg lambda: PySpark dispatches
        # higher-order lambdas on arity, and a (s, i=...) lambda would be
        # called as the 2-arg (element, index) form.
        return lambda s: F.xxhash64(s, F.lit(i))

    base = df.select(
        F.col(id_col), tf.shingles(F.col(text_col), n=shingle_n).alias("_sh")
    ).filter(F.size("_sh") > 0)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_sh"), hash_with_seed(i)))
            for i in range(n_hashes)
        ]
    )
    return base.select(F.col(id_col), sig.alias("minhash"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH.

    rows/band = n_hashes/bands; docs sharing any full band collide.
    Output: (id_a, id_b) with id_a < id_b, distinct.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    band_cols = [
        F.xxhash64(
            F.concat_ws(
                ",",
                *[
                    F.element_at("minhash", b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(id_col, *band_cols)
    buckets = banded.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bh")
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    Joins shingle sets back onto the (small) candidate set — the
    expensive set intersection runs only on LSH survivors.
    """
    sh = df.select(
        F.col(id_col), F.array_distinct(tf.shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    out = (
        candidate_pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.when(F.size("sh_a") + F.size("sh_b") - F.col("inter") == 0, F.lit(0.0)).otherwise(
                F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double")
            ),
        )
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def simhash_dedup_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup candidates: 64-bit signature, banded into 4
    16-bit chunks; pairs sharing any chunk are candidates (covers all
    pairs within Hamming distance 3 by pigeonhole)."""
    sig = df.select(
        F.col(id_col),
        tf.ws_tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).withColumn("simhash", _simhash_col("_toks")).drop("_toks")
    chunks = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.band", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            _hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
    )


def _simhash_col(tokens_col: str):
    from ..functions.vectors import simhash64

    return simhash64(F.col(tokens_col))


def _hamming64(a, b):
    x = a.bitwiseXOR(b)
    return F.bit_count(x)
