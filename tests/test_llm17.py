"""Round-10 wave 2: readability, DP counts, vocab coverage,
truncation fidelity, Mann-Whitney U."""

import datetime

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.llm17 import (
    embedding_truncation_fidelity,
    governance_dp_group_counts,
    stat_mann_whitney_u,
    text_readability_flesch,
    tokenizer_vocab_coverage,
)

SF_SMALL = "/root/testdata/sf0.001"


class TestFlesch:
    def test_counts_and_bounds(self, spark):
        rows = text_readability_flesch(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert r["n_words"] >= 1
            assert r["n_sentences"] >= 1
            assert r["n_syllables"] >= 0
            # one-word one-syllable one-sentence doc scores the maximum
            assert r["flesch"] <= 206.835 - 1.015 - 0.0 + 1e-9

    def test_known_sentence(self, spark):
        df = spark.createDataFrame(
            [(1, "en", "The cat sat on the mat.")],
            "doc_id long, lang string, text string",
        )
        df.createOrReplaceTempView("_flesch_probe")
        # 6 words, 1 sentence, 6 single-vowel groups
        got = (
            df.select(
                F.expr(
                    "size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
                ).alias("y")
            ).first()["y"]
        )
        assert got == 6


class TestDPCounts:
    def test_noise_is_deterministic_and_bounded(self, spark):
        a = {r["lang"]: r for r in
             governance_dp_group_counts(spark, SF_SMALL).collect()}
        b = {r["lang"]: r for r in
             governance_dp_group_counts(spark, SF_SMALL).collect()}
        assert a.keys() == b.keys()
        for k in a:
            assert a[k]["noise"] == b[k]["noise"]  # no RNG anywhere
            assert a[k]["dp_count"] == a[k]["true_count"] + a[k]["noise"]
            assert abs(a[k]["noise"]) <= 60


class TestVocabCoverage:
    def test_rates_and_vocab_size(self, spark):
        rows = tokenizer_vocab_coverage(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert 0 <= r["n_oov"] <= r["n_tokens"]
            assert 0.0 <= r["oov_rate"] <= 1.0
            assert 0 < r["vocab_size"] <= 512


class TestTruncationFidelity:
    def test_fidelity_in_unit_interval(self, spark):
        rows = embedding_truncation_fidelity(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["min_fidelity"] <= r["max_fidelity"] <= 1.0
            assert r["min_fidelity"] <= r["mean_fidelity"]
            assert r["mean_fidelity"] <= r["max_fidelity"] + 1e-9


class TestMannWhitney:
    def test_u_range_and_flag(self, spark):
        rows = stat_mann_whitney_u(spark, SF_SMALL).collect()
        assert len(rows) == 20  # one per source
        for r in rows:
            # 0 <= U <= n_s * n_r, i.e. 0 <= U2 <= 2 n_s n_r
            assert 0 <= r["u2"] <= 2 * r["n_s"] * r["n_r"]
            assert r["significant"] == (abs(r["z"]) > 1.96)

    def test_identical_samples_z_zero(self, spark):
        # Construct two identical samples by symmetry: U2 of a source
        # against itself-shaped rest keeps |z| small on the uniform
        # synthetic corpus; the real assertion is exactness, covered by
        # the oracle. Here: sum of all 2U equals 2 * sum over pairs.
        rows = stat_mann_whitney_u(spark, SF_SMALL).collect()
        n = rows[0]["n_s"] + rows[0]["n_r"]
        assert all(r["n_s"] + r["n_r"] == n for r in rows)
