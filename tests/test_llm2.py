"""Second LLM-wave tests: trigram language-ID invariants, bigram
frequency semantics, rolling-hash order sensitivity, LSH→verify
pipeline containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.functions import text as tf
from rust_ruuvitag_etl_spark.plans import REGISTRY

from .conftest import SF_SMALL


class TestLangId:
    def test_one_prediction_per_heldout_doc(self, spark):
        out = REGISTRY["text_langid_trigram"].fn(spark, SF_SMALL)
        rows = out.collect()
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids)), "multiple predictions for a doc"
        assert all(r["doc_id"] % 5 == 0 for r in rows), "train doc leaked"
        assert all(r["hits"] > 0 for r in rows)
        assert all(r["correct"] == (r["predicted_lang"] == r["lang"]) for r in rows)

    def test_deterministic(self, spark):
        a = sorted(map(tuple, REGISTRY["text_langid_trigram"].fn(spark, SF_SMALL).collect()))
        b = sorted(map(tuple, REGISTRY["text_langid_trigram"].fn(spark, SF_SMALL).collect()))
        assert a == b


class TestTopBigrams:
    def test_hand_computed_tiny_corpus(self, spark):
        df = spark.createDataFrame(
            [("a b a b",), ("a b c",)], ["text"]
        ).select(tf.ws_tokens(F.lower(F.col("text"))).alias("toks"))
        bigrams = F.expr(
            "CASE WHEN size(toks) >= 2 THEN transform(sequence(0, size(toks) - 2),"
            " i -> concat(toks[i], ' ', toks[i + 1])) ELSE array() END"
        )
        counts = {
            r["bigram"]: r["n"]
            for r in df.select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert counts == {"a b": 3, "b a": 1, "b c": 1}

    def test_sorted_desc_top20(self, spark):
        rows = REGISTRY["text_top_bigrams"].fn(spark, SF_SMALL).collect()
        assert len(rows) == 20
        ns = [r["n"] for r in rows]
        assert ns == sorted(ns, reverse=True)


class TestRollingHash:
    def test_order_sensitive_and_stable(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "beta alpha gamma")],
            ["doc_id", "text"],
        )
        tok_vals = F.transform(
            tf.ws_tokens(F.col("text")),
            lambda t: (F.length(t) * 7 + F.ascii(F.substring(t, 1, 1))).cast("bigint"),
        )
        rhash = F.aggregate(
            tok_vals, F.lit(7).cast("bigint"), lambda a, x: (a * 31 + x) % 1000000007
        )
        h = {r["doc_id"]: r["h"] for r in df.select("doc_id", rhash.alias("h")).collect()}
        assert h[1] == h[2], "identical text must hash identically"
        assert h[1] != h[3], "token order must change the hash"

    def test_registry_rows_cover_all_docs(self, spark):
        from rust_ruuvitag_etl_spark.sources import load

        out = REGISTRY["text_rolling_hash"].fn(spark, SF_SMALL)
        assert out.count() == load(spark, SF_SMALL, "documents").count()


class TestMinhashVerified:
    def test_verified_subset_of_candidates_above_threshold(self, spark):
        cands = {
            (r["id_a"], r["id_b"])
            for r in REGISTRY["dedup_minhash_lsh_pairs"].fn(spark, SF_SMALL).collect()
        }
        verified = REGISTRY["dedup_minhash_verified"].fn(spark, SF_SMALL).collect()
        assert all((r["id_a"], r["id_b"]) in cands for r in verified)
        assert all(r["jaccard"] >= 0.2 for r in verified)


class TestKeepBestDedup:
    def test_chain_collapses_to_best(self, spark):
        from rust_ruuvitag_etl_spark.operators import dedup as dd

        docs = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.7), (10, 0.1)], ["doc_id", "q"]
        )
        # chain 1-2, 2-3 → one cluster {1,2,3}; 10 is a singleton
        pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
        out = dd.keep_best_representative(docs, pairs, quality=F.col("q")).collect()
        by_id = {r["doc_id"]: r for r in out}
        assert set(by_id) == {2, 10}, by_id  # best-of-cluster + singleton
        assert by_id[2]["cluster"] == 1  # min-id component label
        assert by_id[10]["cluster"] is None

    def test_components_min_label(self, spark):
        from rust_ruuvitag_etl_spark.operators import dedup as dd

        pairs = spark.createDataFrame(
            [(5, 6), (6, 7), (8, 9)], ["id_a", "id_b"]
        )
        labels = {
            r["node"]: r["label"]
            for r in dd.connected_components(pairs).collect()
        }
        assert labels == {5: 5, 6: 5, 7: 5, 8: 8, 9: 8}

    def test_registry_corpus_shrinks_or_equal(self, spark):
        from rust_ruuvitag_etl_spark.sources import load

        out = REGISTRY["dedup_keep_best_canonical"].fn(spark, SF_SMALL)
        n_docs = load(spark, SF_SMALL, "documents").count()
        n_kept = out.count()
        assert 0 < n_kept <= n_docs
        # cluster representatives are unique
        assert out.select("doc_id").distinct().count() == n_kept


class TestConnectedComponentsConvergence:
    def test_long_chain_converges_with_enough_iters(self, spark):
        """A 25-hop chain needs ~25 label-propagation rounds: with a
        generous bound every node must collapse to label 0."""
        from rust_ruuvitag_etl_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(25)], "id_a long, id_b long"
        )
        labels = connected_components(pairs, max_iter=60)
        got = {r["node"]: r["label"] for r in labels.collect()}
        assert set(got.values()) == {0}, got

    def test_raises_instead_of_silently_splitting(self, spark):
        """Round-1 advice: hitting the iteration cap must raise, not
        return a silently split cluster."""
        import pytest

        from rust_ruuvitag_etl_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(25)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iter=5).collect()
