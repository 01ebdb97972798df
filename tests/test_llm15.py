"""Tests for the round-9 llm15 additions: two-sample KS drift and
time-decayed user value."""

from __future__ import annotations

import datetime

from rust_ruuvitag_etl_spark.plans.llm15 import (
    _DECAY_E6,
    stat_ks_two_sample,
    user_time_decayed_value,
)

from .conftest import SF_SMALL
from .test_llm14 import _DOC_SCHEMA, _EV_SCHEMA, _write


class TestKSTwoSample:
    def test_identical_distributions_read_zero(self, spark, tmp_path):
        """Two sources with the same text mix -> every CDF cut agrees
        -> KS 0, not drifted."""
        hi, lo = "the the the the", "zzzzzzzzzzzzzzzz!!!"
        rows = []
        for i in range(8):
            rows.append((i, hi if i % 2 else lo, "en", "src_a", 0))
            rows.append((100 + i, hi if i % 2 else lo, "en", "src_b", 0))
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = {r["source"]: r for r in stat_ks_two_sample(spark, d).collect()}
        assert set(got) == {"src_a", "src_b"}
        for r in got.values():
            assert r["ks"] == 0.0
            assert r["drifted"] is False

    def test_disjoint_distributions_read_one(self, spark, tmp_path):
        """One source all high-quality, the other all low -> the CDFs
        separate completely at the low class -> KS = 1, drifted."""
        hi, lo = "the the the the", "zzzzzzzzzzzzzzzz!!!"
        rows = [(i, hi, "en", "src_a", 0) for i in range(20)] + [
            (100 + i, lo, "en", "src_b", 0) for i in range(20)
        ]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = {r["source"]: r for r in stat_ks_two_sample(spark, d).collect()}
        for r in got.values():
            assert r["ks"] == 1.0
            assert r["drifted"] is True
            assert (r["n_s"], r["n_r"]) == (20, 20)

    def test_real_corpus_bounds(self, spark):
        rows = stat_ks_two_sample(spark, SF_SMALL).collect()
        assert len(rows) == 20  # one row per source
        for r in rows:
            assert 0.0 <= r["ks"] <= 1.0
            assert r["ks_critical"] > 0.0
            assert r["drifted"] == (r["ks"] > r["ks_critical"])


class TestTimeDecayedValue:
    def test_decay_table_is_exact(self):
        assert _DECAY_E6[0] == 1_000_000
        assert _DECAY_E6[1] == 900_000
        assert len(_DECAY_E6) == 31
        assert all(b < a for a, b in zip(_DECAY_E6, _DECAY_E6[1:]))

    def test_constructed_series(self, spark, tmp_path):
        """Three events at ages 0/1/31 days with value 10: the anchor
        is the newest event; weights 1.0, 0.9, and the 30-day floor."""
        base = datetime.datetime(2024, 2, 1)
        rows = [
            (0, base, 7, "view", 10.0, "{}"),
            (1, base - datetime.timedelta(days=1), 7, "view", 10.0, "{}"),
            (2, base - datetime.timedelta(days=31), 7, "view", 10.0, "{}"),
        ]
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        got = user_time_decayed_value(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n_events"] == 3
        expected_num = 1000 * (_DECAY_E6[0] + _DECAY_E6[1] + _DECAY_E6[30])
        assert r["decayed_num"] == expected_num
        assert r["decayed_value"] == round(expected_num / 1e8, 6)

    def test_real_corpus_invariants(self, spark):
        rows = user_time_decayed_value(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            # decayed value can't exceed the undecayed sum and is
            # non-negative for non-negative event values
            assert r["decayed_value"] >= 0.0
            assert r["decayed_num"] == round(r["decayed_value"] * 1e8) or (
                abs(r["decayed_num"] - r["decayed_value"] * 1e8) < 1e2
            )


class TestCohensKappa:
    def test_identical_raters_read_one(self, spark, tmp_path):
        """A corpus whose trigram and word evidence point the same way
        for every held-out doc: distinctive repeated words per lang ->
        both raters learn and predict identically -> kappa 1.0."""
        from rust_ruuvitag_etl_spark.plans.llm15 import eval_cohens_kappa

        rows = []
        for i in range(20):
            # doc_id % 5 == 0 rows form the held-out split
            lang = "en" if i % 2 == 0 else "fr"
            text = ("england english engine " if lang == "en"
                    else "france francais fracas ")
            rows.append((i, text * 3, lang, "s", 0))
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = eval_cohens_kappa(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert r["n"] == 4  # doc_ids 0,5,10,15
        assert r["agree"] == r["n"]
        assert r["p_observed"] == 1.0
        if r["p_expected"] < 1.0:
            assert r["kappa"] == 1.0
        else:
            assert r["kappa"] is None  # constant raters: undefined

    def test_real_corpus_identities(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm15 import eval_cohens_kappa

        r = eval_cohens_kappa(spark, SF_SMALL).collect()[0]
        assert 0 < r["n"] <= 100  # held-out split of 500 docs
        assert 0 <= r["agree"] <= r["n"]
        assert abs(r["p_observed"] - r["agree"] / r["n"]) < 1e-6
        if r["kappa"] is not None:
            # kappa = (po - pe) / (1 - pe) up to the roundings
            recon = (r["p_observed"] - r["p_expected"]) / (
                1 - r["p_expected"]
            )
            assert abs(r["kappa"] - recon) < 1e-4
            assert -1.0 <= r["kappa"] <= 1.0


class TestABZTest:
    def test_constructed_split(self, spark, tmp_path):
        """Users 0..19: evens = variant A. High-value purchases planted
        so A converts 8/10 and B 2/10 -> z = 6/sqrt(.5*.5*.2) ~ 2.68,
        significant at 95%."""
        import datetime

        base = datetime.datetime(2024, 3, 1)
        rows = []
        eid = 0
        for uid in range(20):
            converted = (uid % 2 == 0 and uid < 16) or (
                uid % 2 == 1 and uid < 4
            )
            val = 460.0 if converted else 10.0
            rows.append(
                (eid, base + datetime.timedelta(seconds=eid), uid,
                 "purchase", val, "{}")
            )
            eid += 1
            rows.append(
                (eid, base + datetime.timedelta(seconds=eid), uid,
                 "view", 1.0, "{}")
            )
            eid += 1
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        from rust_ruuvitag_etl_spark.plans.llm15 import (
            stat_ab_conversion_ztest,
        )

        r = stat_ab_conversion_ztest(spark, d).collect()[0]
        assert (r["n_a"], r["n_b"]) == (10, 10)
        assert (r["conv_a"], r["conv_b"]) == (8, 2)
        assert abs(r["z"] - 0.6 / (0.5 * 0.5 * 0.2) ** 0.5) < 1e-6
        assert r["significant"] is True

    def test_degenerate_pool_yields_null(self, spark, tmp_path):
        """Nobody converts -> z undefined (NULL), not significant."""
        import datetime

        base = datetime.datetime(2024, 3, 1)
        rows = [
            (i, base + datetime.timedelta(seconds=i), i % 6, "view",
             1.0, "{}")
            for i in range(12)
        ]
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        from rust_ruuvitag_etl_spark.plans.llm15 import (
            stat_ab_conversion_ztest,
        )

        r = stat_ab_conversion_ztest(spark, d).collect()[0]
        assert r["z"] is None
        assert r["significant"] is False

    def test_real_corpus_is_aa_calibrated(self, spark):
        """The id-parity split is an A/A test on this corpus: the
        expected readout is NOT significant (null calibration)."""
        from rust_ruuvitag_etl_spark.plans.llm15 import (
            stat_ab_conversion_ztest,
        )

        from rust_ruuvitag_etl_spark.sources import load

        n_users = (
            load(spark, SF_SMALL, "events").select("user_id").distinct().count()
        )
        r = stat_ab_conversion_ztest(spark, SF_SMALL).collect()[0]
        assert r["n_a"] + r["n_b"] == n_users
        if r["z"] is not None:
            assert abs(r["z"]) < 4.0  # sanity: a genuine A/A split
