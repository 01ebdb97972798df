"""Tests for the round-6 llm9 additions: the prefix-filtered exact
set-similarity join (SSJoin) — its exactness claim is pinned against a
literal brute-force cross join — and binary-quantization ANN.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.functions import text as tf
from rust_ruuvitag_etl_spark.plans.llm9 import dedup_ssjoin_prefix
from rust_ruuvitag_etl_spark.sources import load

from .conftest import SF_SMALL


class TestSsjoinPrefix:
    def test_equals_brute_force(self, spark):
        """The prefix lemma's whole point: the equi-join-on-prefix
        result must EQUAL the blocking-free quadratic answer — same
        pairs, same intersection sizes, same Jaccard — at sf0.001
        where the cross join is affordable."""
        got = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"], r["n_b"])
            for r in dedup_ssjoin_prefix(spark, SF_SMALL).collect()
        }
        sh = (
            load(spark, SF_SMALL, "documents")
            .select(
                "doc_id",
                F.array_distinct(tf.shingles(F.col("text"), 3)).alias("s"),
            )
            .filter(F.size("s") > 0)
        )
        a = sh.select(
            F.col("doc_id").alias("id_a"),
            F.col("s").alias("sa"),
            F.size("s").alias("n_a"),
        )
        b = sh.select(
            F.col("doc_id").alias("id_b"),
            F.col("s").alias("sb"),
            F.size("s").alias("n_b"),
        )
        inter = F.size(F.array_intersect("sa", "sb"))
        brute = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"], r["n_b"])
            for r in (
                a.crossJoin(b)
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("n_inter", inter)
                .filter(3 * F.col("n_inter") >= F.col("n_a") + F.col("n_b"))
                .select("id_a", "id_b", "n_inter", "n_a", "n_b")
            ).collect()
        }
        assert got == brute
        assert len(got) > 0  # the corpus has planted near-dups — find them

    def test_prefix_is_rarest_shingles(self, spark):
        """Scale posture: the join keys (prefix shingles) must be drawn
        from the rare end of the df distribution — the rarest-first
        canonical order means a prefix shingle's df can't exceed the
        df of any non-prefix shingle of the same document."""
        sh = (
            load(spark, SF_SMALL, "documents")
            .select(
                "doc_id",
                F.array_distinct(tf.shingles(F.col("text"), 3)).alias("s"),
            )
            .filter(F.size("s") > 0)
            .select("doc_id", F.explode("s").alias("g"))
        )
        dfq = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        max_df = dfq.agg(F.max("df")).collect()[0][0]
        # the corpus must actually be prefix-friendly (rare shingles
        # exist); if this ever fails the SSJoin posture story is void
        med_df = dfq.agg(F.expr("percentile_approx(df, 0.5)")).collect()[0][0]
        assert med_df <= 3 < max_df + 1

    def test_threshold_boundary_integer_exact(self, spark, tmp_path):
        """J exactly at tau = 0.5 must be KEPT (>=, not >): two docs
        built to share exactly half their shingle union. With n_a =
        n_b = 9 and I = 6: J = 6/12 = 0.5 -> 3*I = 18 >= 18."""
        # 11 tokens -> 9 shingles; docs share the first 8 tokens
        # (6 shared shingles), diverge in the last 3.
        common = "t0 t1 t2 t3 t4 t5 t6 t7"
        da = common + " a8 a9 a10"
        db = common + " b8 b9 b10"
        spark.createDataFrame(
            [(1, da, "en", "t", len(da)), (2, db, "en", "t", len(db))],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        got = dedup_ssjoin_prefix(spark, str(tmp_path)).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert (r["n_inter"], r["n_a"], r["n_b"]) == (6, 9, 9)
        assert r["jaccard"] == 0.5
