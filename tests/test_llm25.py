"""Round-12 wave 2: integer fixed-point logistic-regression trainer."""

from rust_ruuvitag_etl_spark.plans.llm25 import (
    _LR_S,
    quality_lr_eval_holdout,
    quality_lr_train,
)

SF_SMALL = "/root/testdata/sf0.001"


class TestQualityLrTrain:
    def test_trains_to_better_than_majority(self, spark):
        row = quality_lr_train(spark, SF_SMALL).collect()[0]
        # the gate label is ~50/50, so anything >> 5000 bp means the
        # two unrolled integer-GD steps actually learned the boundary
        # (measured 8816 bp at sf0.001; float-LR ceiling ~9400)
        assert row["train_acc_bp"] > 7500
        assert row["train_correct"] <= row["n_train"]
        # weights are BIGINT fixed-point, not floats
        for c in ("w0", "w1", "w2"):
            assert isinstance(row[c], int)

    def test_deterministic(self, spark):
        a = quality_lr_train(spark, SF_SMALL).collect()[0]
        b = quality_lr_train(spark, SF_SMALL).collect()[0]
        assert a == b

    def test_holdout_confusion_is_consistent(self, spark):
        r = quality_lr_eval_holdout(spark, SF_SMALL).collect()[0]
        assert r["tp"] + r["fp"] + r["tn"] + r["fn"] == r["n_test"]
        assert (
            (r["tp"] + r["tn"]) * 10000 // r["n_test"] == r["test_acc_bp"]
        )
        # generalization: held-out accuracy also clears the majority bar
        assert r["test_acc_bp"] > 7500

    def test_fold_sizes_partition_corpus(self, spark):
        tr = quality_lr_train(spark, SF_SMALL).collect()[0]["n_train"]
        te = quality_lr_eval_holdout(spark, SF_SMALL).collect()[0]["n_test"]
        from rust_ruuvitag_etl_spark.sources import load

        assert tr + te == load(spark, SF_SMALL, "documents").count()

    def test_fixed_point_scale_even(self):
        # the sigmoid midpoint S/2 must be exact for the z=0 tie rule
        assert _LR_S % 2 == 0
