"""Tests for the round-9 llm14 additions: priority sampling, domain
mixture, t-closeness, calibration ECE, Fellegi-Sunter linkage,
chi-square independence, co-purchase connected components, and
mean-shift changepoint detection."""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.llm14 import (
    K_SAMPLE,
    corpus_domain_mixture,
    eval_calibration_ece,
    governance_t_closeness,
    graph_connected_components,
    linkage_fellegi_sunter,
    sample_priority_weighted,
    stat_chi_square_independence,
    timeseries_mean_shift_detect,
)

from .conftest import SF_SMALL

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
    " c_mktsegment string"
)
_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write(spark, tmp_path, table, schema, rows) -> str:
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), f"{table}.parquet"))
    return str(tmp_path)


# --- priority sampling -------------------------------------------------------


class TestPrioritySampling:
    def test_small_corpus_sampled_exhaustively(self, spark, tmp_path):
        """n <= k: every doc is in the sample, tau = 0, and the HT
        estimate degenerates to the exact weight."""
        rows = [(i, " ".join(["w"] * (i + 1)), "en", "s", 0) for i in range(5)]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = sample_priority_weighted(spark, d).collect()
        assert len(got) == 5
        assert all(r["tau"] == 0.0 for r in got)
        assert {(r["doc_id"], r["weight"]) for r in got} == {
            (i, i + 1) for i in range(5)
        }
        assert all(r["est_weight"] == float(r["weight"]) for r in got)

    def test_real_corpus_sample_properties(self, spark):
        rows = sample_priority_weighted(spark, SF_SMALL).collect()
        assert len(rows) == K_SAMPLE
        assert len({r["doc_id"] for r in rows}) == K_SAMPLE
        tau = rows[0]["tau"]
        assert all(r["tau"] == tau for r in rows)
        # sample members are exactly the k highest priorities: all >= tau
        assert all(r["priority"] >= tau for r in rows)
        assert all(r["est_weight"] == max(float(r["weight"]), tau) for r in rows)

    def test_ht_estimator_tracks_the_total(self, spark):
        """The Horvitz-Thompson sum estimates total corpus tokens;
        priority sampling's variance bound keeps a 64-of-500 sample
        within a loose band (deterministic draw -> stable assertion)."""
        rows = sample_priority_weighted(spark, SF_SMALL).collect()
        est = sum(r["est_weight"] for r in rows)
        from rust_ruuvitag_etl_spark.sources import load

        total = (
            load(spark, SF_SMALL, "documents")
            .filter(F.trim("text") != "")
            .select(F.sum(F.size(F.split(F.trim("text"), r"\s+"))))
            .collect()[0][0]
        )
        assert abs(est - total) / total < 0.5


# --- domain mixture ----------------------------------------------------------


class TestDomainMixture:
    def test_alpha_half_shares_on_constructed_corpus(self, spark, tmp_path):
        """100 vs 400 tokens -> natural shares .2/.8; sqrt-temperature
        shares 1/3 and 2/3; multipliers 5/3 and 5/6."""
        rows = [
            (0, " ".join(["a"] * 100), "xx", "s", 0),
            (1, " ".join(["b"] * 400), "en", "s", 0),
        ]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = {r["lang"]: r for r in corpus_domain_mixture(spark, d).collect()}
        assert got["xx"]["lang_tokens"] == 100
        assert got["en"]["lang_tokens"] == 400
        assert got["xx"]["share"] == 0.2
        assert got["en"]["share"] == 0.8
        assert abs(got["xx"]["temp_share"] - 1 / 3) < 1e-6
        assert abs(got["en"]["temp_share"] - 2 / 3) < 1e-6
        assert abs(got["xx"]["multiplier"] - 5 / 3) < 1e-5
        assert abs(got["en"]["multiplier"] - 5 / 6) < 1e-5

    def test_real_corpus_shares_sum_to_one(self, spark):
        rows = corpus_domain_mixture(spark, SF_SMALL).collect()
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
        assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
        # alpha=0.5 compresses: minority langs upsampled, majority down
        lo = min(rows, key=lambda r: r["lang_tokens"])
        hi = max(rows, key=lambda r: r["lang_tokens"])
        assert lo["multiplier"] > 1.0 > hi["multiplier"]


# --- t-closeness -------------------------------------------------------------


class TestTCloseness:
    def test_polarized_classes_read_half(self, spark, tmp_path):
        """Two equal classes at opposite ends of the balance range:
        each class's CDF differs from the 50/50 global CDF by exactly
        1/2 at every interior cut -> t = 0.5 for both."""
        rows = [
            (i, f"c{i}", 0, -500.0, "A") for i in range(8)
        ] + [
            (100 + i, f"d{i}", 1, 9900.0, "B") for i in range(8)
        ]
        d = _write(spark, tmp_path, "customer", _CUST_SCHEMA, rows)
        got = governance_t_closeness(spark, d).collect()
        assert len(got) == 2
        for r in got:
            assert r["n_class"] == 8
            assert r["t_closeness"] == 0.5

    def test_class_matching_global_reads_zero(self, spark, tmp_path):
        """A single class IS the global distribution -> EMD 0."""
        rows = [(i, f"c{i}", 0, float(i * 1000), "A") for i in range(10)]
        d = _write(spark, tmp_path, "customer", _CUST_SCHEMA, rows)
        got = governance_t_closeness(spark, d).collect()
        assert len(got) == 1
        assert got[0]["emd_num"] == 0
        assert got[0]["t_closeness"] == 0.0

    def test_real_corpus_bounds(self, spark):
        rows = governance_t_closeness(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["t_closeness"] <= 1.0


# --- calibration ECE ---------------------------------------------------------


class TestCalibrationECE:
    def test_bin_identities_on_real_corpus(self, spark):
        rows = eval_calibration_ece(spark, SF_SMALL).collect()
        assert 1 <= len(rows) <= 10
        ece = rows[0]["ece"]
        assert all(r["ece"] == ece for r in rows)
        assert 0.0 <= ece <= 1.0
        for r in rows:
            assert 0 <= r["bin"] <= 9
            assert 0.0 <= r["accuracy"] <= 1.0
            assert 0.0 <= r["avg_conf"] <= 1.0001
            # gap is |accuracy - avg_conf| up to the two 6-dp roundings
            assert abs(r["gap"] - abs(r["accuracy"] - r["avg_conf"])) < 3e-6

    def test_ece_is_bin_weighted_gap(self, spark):
        rows = eval_calibration_ece(spark, SF_SMALL).collect()
        n = sum(r["n_bin"] for r in rows)
        recon = sum(r["n_bin"] * r["gap"] for r in rows) / n
        assert abs(recon - rows[0]["ece"]) < 3e-6

    def test_perfectly_confident_correct_bins(self, spark, tmp_path):
        """All-stopword English docs with mean token length 3 score
        q=1.0 -> bin 9, accuracy 1, avg_conf 1 -> ECE 0."""
        text = "the the the the"
        rows = [(i, text, "en", "s", 0) for i in range(4)]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = eval_calibration_ece(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["bin"], r["n_bin"]) == (9, 4)
        assert r["avg_conf"] == 1.0
        assert r["accuracy"] == 1.0
        assert r["ece"] == 0.0


# --- Fellegi-Sunter linkage ---------------------------------------------------


class TestFellegiSunter:
    def test_exact_crosssource_copy_is_match(self, spark, tmp_path):
        text = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (0, text, "en", "src_a", len(text)),
            (1, text, "en", "src_b", len(text)),
        ]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = linkage_fellegi_sunter(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["id_a"], r["id_b"]) == (0, 1)
        assert (r["source_a"], r["source_b"]) == ("src_a", "src_b")
        assert r["pattern"] == "1111"
        assert r["score"] == 800 + 1200 + 4000 + 2500
        assert r["decision"] == "match"

    def test_same_source_pairs_are_not_linked(self, spark, tmp_path):
        text = "identical text in the same source should not pair up"
        rows = [
            (0, text, "en", "src_a", len(text)),
            (1, text, "en", "src_a", len(text)),
        ]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        assert linkage_fellegi_sunter(spark, d).count() == 0

    def test_shared_prefix_divergent_body_is_possible(self, spark, tmp_path):
        """Same 24-char prefix and token count, different content:
        gammas (lang=1, len=1, fp=0, tail=0) -> 800+1200-300-700=1000
        -> 'possible'."""
        a = "the shared prefix here and then something original first"
        b = "the shared prefix here and then different words entirely"
        assert a[:24] == b[:24] and len(a.split()) == len(b.split())
        rows = [
            (0, a, "en", "src_a", len(a)),
            (1, b, "en", "src_b", len(b)),
        ]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = linkage_fellegi_sunter(spark, d).collect()
        assert len(got) == 1
        assert got[0]["pattern"] == "1100"
        assert got[0]["score"] == 1000
        assert got[0]["decision"] == "possible"

    def test_real_corpus_scores_are_consistent(self, spark):
        rows = linkage_fellegi_sunter(spark, SF_SMALL).collect()
        assert rows  # the corpus plants cross-source near-dups
        for r in rows:
            assert r["source_a"] < r["source_b"]
            assert r["decision"] in ("match", "possible", "non_match")
            if r["pattern"] == "1111":
                assert r["decision"] == "match"


# --- chi-square independence --------------------------------------------------


class TestChiSquare:
    def test_perfect_dependence_2x2(self, spark, tmp_path):
        """lang fully determines the quality bucket -> chi2 = N and
        Cramer's V = 1 for a 2x2 table."""
        hi = "the a an and or of to in is it"  # q = 1.0 -> bucket 4
        lo = "zzzzzzzzzzzzzzzz!!!"  # long word, punct soup -> low bucket
        rows = [(i, hi, "en", "s", 0) for i in range(4)] + [
            (10 + i, lo, "xx", "s", 0) for i in range(4)
        ]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        got = stat_chi_square_independence(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["n"], r["n_langs"], r["n_bins"], r["dof"]) == (8, 2, 2, 1)
        assert r["chi2"] == 8.0
        assert r["cramers_v"] == 1.0

    def test_single_bucket_reads_zero(self, spark, tmp_path):
        """Identical text everywhere -> one bucket -> chi2 0, dof 0."""
        text = "the the the the"
        rows = [(i, text, ["en", "fr"][i % 2], "s", 0) for i in range(6)]
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA, rows)
        r = stat_chi_square_independence(spark, d).collect()[0]
        assert (r["n_bins"], r["dof"], r["chi2"]) == (1, 0, 0.0)

    def test_real_corpus_shape(self, spark):
        r = stat_chi_square_independence(spark, SF_SMALL).collect()[0]
        assert r["n"] == 500
        assert r["dof"] == (r["n_langs"] - 1) * (r["n_bins"] - 1)
        assert r["chi2"] >= 0.0
        assert 0.0 <= r["cramers_v"] <= 1.0


# --- connected components -----------------------------------------------------


def _li_row(orderkey, partkey, qty):
    return (
        orderkey,
        partkey,
        1,
        1,
        float(qty),
        100.0,
        0.0,
        0.0,
        "N",
        "O",
        datetime.datetime(2024, 1, 1),
    )


class TestConnectedComponents:
    def test_chain_and_island(self, spark, tmp_path):
        """Orders link parts 1-2 and 2-3 (one chain component) and
        10-11 (an island); a below-threshold order linking 3-10 must
        NOT merge them."""
        rows = [
            _li_row(100, 1, 50),
            _li_row(100, 2, 49),
            _li_row(101, 2, 48),
            _li_row(101, 3, 50),
            _li_row(102, 10, 48),
            _li_row(102, 11, 48),
            _li_row(103, 3, 47),  # below threshold: ignored
            _li_row(103, 10, 50),
        ]
        d = _write(spark, tmp_path, "lineitem", _LI_SCHEMA, rows)
        got = {
            r["part_key"]: (r["component"], r["n_members"])
            for r in graph_connected_components(spark, d).collect()
        }
        assert got == {
            1: (1, 3),
            2: (1, 3),
            3: (1, 3),
            10: (10, 2),
            11: (10, 2),
        }

    def test_real_corpus_component_invariants(self, spark):
        rows = graph_connected_components(spark, SF_SMALL).collect()
        by_comp: dict[int, list[int]] = {}
        for r in rows:
            by_comp.setdefault(r["component"], []).append(r["part_key"])
        for comp, members in by_comp.items():
            assert comp == min(members)  # label = component min
            assert len(members) >= 2  # every node has an edge
        sizes = {r["component"]: r["n_members"] for r in rows}
        for comp, members in by_comp.items():
            assert sizes[comp] == len(members)


# --- mean-shift changepoints ---------------------------------------------------


class TestMeanShift:
    def test_single_step_change_detected_once(self, spark, tmp_path):
        """32 samples at 10.0 then 32 at 100.0: exactly one changepoint
        at the first high sample, shift +90."""
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (
                i,
                base + datetime.timedelta(seconds=i),
                1,
                "view",
                10.0 if i < 32 else 100.0,
                "{}",
            )
            for i in range(64)
        ]
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        got = timeseries_mean_shift_detect(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert r["event_id"] == 32
        assert r["pre_mean"] == 10.0
        assert r["post_mean"] == 100.0
        assert r["shift"] == 90.0

    def test_constant_series_has_no_changepoints(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (
                i,
                base + datetime.timedelta(seconds=i),
                1,
                "click",
                42.0,
                "{}",
            )
            for i in range(64)
        ]
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        assert timeseries_mean_shift_detect(spark, d).count() == 0

    def test_series_are_isolated_by_event_type(self, spark, tmp_path):
        """A step in one type must not bleed into a constant other
        type interleaved at the same timestamps."""
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for i in range(64):
            rows.append(
                (
                    i,
                    base + datetime.timedelta(seconds=i),
                    1,
                    "view",
                    10.0 if i < 32 else 100.0,
                    "{}",
                )
            )
            rows.append(
                (
                    1000 + i,
                    base + datetime.timedelta(seconds=i),
                    1,
                    "click",
                    7.0,
                    "{}",
                )
            )
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        got = timeseries_mean_shift_detect(spark, d).collect()
        assert [r["event_type"] for r in got] == ["view"]

    def test_real_corpus_shifts_exceed_threshold(self, spark):
        rows = timeseries_mean_shift_detect(spark, SF_SMALL).collect()
        for r in rows:
            assert abs(r["shift"]) >= 30.0 - 1e-6
            assert math.isclose(
                r["shift"], r["post_mean"] - r["pre_mean"], abs_tol=3e-6
            )


# --- HyperLogLog sketch ---------------------------------------------------------


class TestHLLSketch:
    def test_registers_and_estimate_on_constructed_keys(self, spark, tmp_path):
        """1000 distinct order keys -> raw-HLL estimate within the
        ~1.04/sqrt(256) = 6.5% standard error band (deterministic
        draw -> stable assertion at 3 sigma), merge path consistent."""
        from rust_ruuvitag_etl_spark.plans.llm14 import sketch_hll_distinct

        rows = [_li_row(k, k % 7, 10) for k in range(1000) for _ in range(2)]
        d = _write(spark, tmp_path, "lineitem", _LI_SCHEMA, rows)
        got = sketch_hll_distinct(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        assert r["m"] == 256
        assert r["n_rows"] == 2000
        assert r["n_true"] == 1000
        assert r["merge_consistent"] is True
        assert abs(r["hll_estimate"] - 1000) / 1000 < 0.20
        assert r["rel_error"] == round(
            abs(r["hll_estimate"] - 1000) / 1000, 6
        ) or abs(
            r["rel_error"] - abs(r["hll_estimate"] - 1000) / 1000
        ) < 1e-4

    def test_duplicates_do_not_move_registers(self, spark, tmp_path):
        """The sketch is insensitive to multiplicity: 1x vs 5x copies
        of the same keys produce the identical estimate."""
        from rust_ruuvitag_etl_spark.plans.llm14 import sketch_hll_distinct

        rows1 = [_li_row(k, 1, 10) for k in range(500)]
        rows5 = [_li_row(k, 1, 10) for k in range(500) for _ in range(5)]
        d1 = _write(spark, os.path.join(str(tmp_path), "a"), "lineitem",
                    _LI_SCHEMA, rows1)
        d5 = _write(spark, os.path.join(str(tmp_path), "b"), "lineitem",
                    _LI_SCHEMA, rows5)
        e1 = sketch_hll_distinct(spark, d1).collect()[0]
        e5 = sketch_hll_distinct(spark, d5).collect()[0]
        assert e1["hll_estimate"] == e5["hll_estimate"]
        assert e1["n_rows"] == 500 and e5["n_rows"] == 2500

    def test_real_corpus_accuracy(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm14 import sketch_hll_distinct

        r = sketch_hll_distinct(spark, SF_SMALL).collect()[0]
        assert r["merge_consistent"] is True
        assert r["rel_error"] < 0.25  # raw HLL at m=256


# --- Count-Min sketch -----------------------------------------------------------


class TestCountMinSketch:
    def test_probe_identities_on_real_corpus(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm14 import sketch_count_min_tokens

        rows = sketch_count_min_tokens(spark, SF_SMALL).collect()
        assert len(rows) == 20
        for r in rows:
            assert r["guarantee_holds"] is True
            assert r["cm_estimate"] >= r["true_count"]
            assert r["overcount"] == r["cm_estimate"] - r["true_count"]

    def test_tiny_vocab_is_exact(self, spark, tmp_path):
        """With a vocabulary far below the width, collisions are
        (with this hash family and 3 words) absent -> estimates exact."""
        from rust_ruuvitag_etl_spark.plans.llm14 import sketch_count_min_tokens

        text = " ".join(["alpha"] * 5 + ["beta"] * 3 + ["gamma"] * 2)
        d = _write(spark, tmp_path, "documents", _DOC_SCHEMA,
                   [(0, text, "en", "s", len(text))])
        got = {r["word"]: r for r in sketch_count_min_tokens(spark, d).collect()}
        assert got["alpha"]["true_count"] == 5
        assert got["alpha"]["cm_estimate"] == 5
        assert got["beta"]["cm_estimate"] == 3
        assert got["gamma"]["overcount"] == 0
