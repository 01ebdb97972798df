"""Round-12 wave 4: LR apply, pass@k estimator, sequence packing."""

from math import comb

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.llm27 import (
    _PACK_BUDGET,
    _PAK_GROUP,
    eval_pass_at_k,
    quality_lr_apply,
    training_pack_sequences,
)
from rust_ruuvitag_etl_spark.plans.llm25 import quality_lr_eval_holdout

SF_SMALL = "/root/testdata/sf0.001"


class TestLrApply:
    def test_apply_agrees_with_holdout_eval(self, spark):
        rows = quality_lr_apply(spark, SF_SMALL).collect()
        ev = quality_lr_eval_holdout(spark, SF_SMALL).collect()[0]
        held = [r for r in rows if not r["is_train"]]
        assert len(held) == ev["n_test"]
        tp = sum(1 for r in held if r["y"] == 1 and r["pred"] == 1)
        fn = sum(1 for r in held if r["y"] == 1 and r["pred"] == 0)
        assert (tp, fn) == (ev["tp"], ev["fn"])

    def test_pred_is_sign_of_margin(self, spark):
        for r in quality_lr_apply(spark, SF_SMALL).collect():
            assert r["pred"] == (1 if r["z"] >= 0 else 0)


class TestPassAtK:
    def test_matches_closed_form_comb(self, spark):
        for r in eval_pass_at_k(spark, SF_SMALL).collect():
            n, c = r["n"], r["c"]
            for k in (1, 5, 10):
                got = r[f"pass_at_{k}"]
                if n < k:
                    assert got is None
                else:
                    want = round(1.0 - comb(n - c, k) / comb(n, k), 6)
                    assert abs(got - want) < 1e-12

    def test_group_sizes(self, spark):
        rows = eval_pass_at_k(spark, SF_SMALL).collect()
        assert all(1 <= r["n"] <= _PAK_GROUP for r in rows)
        assert all(0 <= r["c"] <= r["n"] for r in rows)


class TestPackSequences:
    def test_packing_is_prefix_consistent(self, spark):
        rows = training_pack_sequences(spark, SF_SMALL).collect()
        by_stream = {}
        for r in rows:
            by_stream.setdefault((r["lang"], r["shard"]), []).append(r)
        for stream in by_stream.values():
            stream.sort(key=lambda r: r["doc_id"])
            cum = 0
            for r in stream:
                assert r["bin_id"] == cum // _PACK_BUDGET
                assert r["offset_in_bin"] == cum % _PACK_BUDGET
                spans = (cum // _PACK_BUDGET) != (
                    (cum + r["n_tokens"] - 1) // _PACK_BUDGET
                )
                assert r["spans_boundary"] == spans
                cum += r["n_tokens"]

    def test_every_doc_packed_once(self, spark):
        df = training_pack_sequences(spark, SF_SMALL)
        assert df.count() == df.select("doc_id").distinct().count()
