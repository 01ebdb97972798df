"""Round-12 wave 3: end-to-end incremental corpus refresh."""

from rust_ruuvitag_etl_spark.plans.llm26 import corpus_refresh_incremental

SF_SMALL = "/root/testdata/sf0.001"


class TestCorpusRefresh:
    def test_invariants_and_accounting(self, spark):
        r = corpus_refresh_incremental(spark, SF_SMALL).collect()[0]
        # every arrival is accounted for exactly once
        assert r["n_delta"] == (
            r["n_exact_dup"] + r["n_near_dup"] + r["n_new_docs"]
        )
        # the split partitions the admitted docs
        assert (
            r["n_train"] + r["n_validation"] + r["n_test"] == r["n_new_docs"]
        )
        # measured pipeline invariants hold
        assert r["split_stability_ok"] is True
        assert r["ivf_append_parity_ok"] is True
        # appended vectors are a subset of admitted docs
        assert 0 <= r["n_vectors_appended"] <= r["n_new_docs"]
        assert r["n_day1_survivors"] <= r["n_day1"]

    def test_rerun_is_identical(self, spark):
        a = corpus_refresh_incremental(spark, SF_SMALL).collect()[0]
        b = corpus_refresh_incremental(spark, SF_SMALL).collect()[0]
        assert a == b
