"""Round-10 wave 3: Bradley-Terry, permutation test, curriculum,
n-gram novelty."""

from rust_ruuvitag_etl_spark.plans.llm18 import (
    curriculum_difficulty_order,
    eval_bradley_terry_strength,
    stat_permutation_test,
    text_ngram_novelty,
)

SF_SMALL = "/root/testdata/sf0.001"


class TestBradleyTerry:
    def test_strengths_positive_mean_one(self, spark):
        rows = eval_bradley_terry_strength(spark, SF_SMALL).collect()
        assert rows
        assert all(r["strength"] > 0 for r in rows)
        mean = sum(r["strength"] for r in rows) / len(rows)
        assert abs(mean - 1.0) < 1e-9  # normalized to mean 1
        # more wins per match should broadly mean more strength:
        # the max-win-rate source must outrank the min-win-rate source
        by_rate = sorted(rows, key=lambda r: r["wins"] / r["n_matches"])
        assert by_rate[-1]["strength"] > by_rate[0]["strength"]

    def test_total_wins_equals_total_matches_half(self, spark):
        rows = eval_bradley_terry_strength(spark, SF_SMALL).collect()
        # every match has exactly one winner; n_matches double-counts
        # (both directions), so sum(wins) = sum(n_matches) / 2
        assert sum(r["wins"] for r in rows) * 2 == sum(
            r["n_matches"] for r in rows
        )


class TestPermutationTest:
    def test_split_is_exchangeable(self, spark):
        r = stat_permutation_test(spark, SF_SMALL).collect()[0]
        assert r["n_perms"] == 64
        assert 0 <= r["n_extreme"] <= 64
        assert 0.0 < r["p_value"] <= 1.0
        # the hash split satisfies the null by construction
        assert r["drifted"] is False


class TestCurriculum:
    def test_phases_within_lang(self, spark):
        rows = curriculum_difficulty_order(spark, SF_SMALL).collect()
        assert rows
        by_lang = {}
        for r in rows:
            assert 1 <= r["phase"] <= 4
            assert r["n_tokens"] >= 1
            assert r["rank_sum"] >= r["n_tokens"]  # ranks start at 1
            by_lang.setdefault(r["lang"], []).append(r)
        for rs in by_lang.values():
            # phases are ordered by difficulty within each language
            rs.sort(key=lambda r: (r["difficulty"], r["doc_id"]))
            phases = [r["phase"] for r in rs]
            assert phases == sorted(phases)


class TestNovelty:
    def test_first_doc_fully_novel_and_rates_bounded(self, spark):
        rows = text_ngram_novelty(spark, SF_SMALL).collect()
        assert rows
        first = min(rows, key=lambda r: r["doc_id"])
        assert first["n_novel"] == first["n_grams"]  # nothing before it
        for r in rows:
            assert 0 <= r["n_novel"] <= r["n_grams"]
            assert 0.0 <= r["novelty_rate"] <= 1.0
