"""Tests for the round-7 llm10 additions: substring-level dedup via
winnowing fingerprints (duplicated token spans >= L across documents).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.llm10 import (
    DF_CAP,
    K,
    L,
    W,
    _grams,
    dedup_substring_spans,
)
from rust_ruuvitag_etl_spark.sources import load

from .conftest import SF_SMALL


def _run(spark, rows):
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="subspan_")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return {
        (r["id_a"], r["id_b"]): (r["start_a"], r["start_b"], r["span_len"])
        for r in dedup_substring_spans(spark, d).collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestPlantedSpans:
    def test_planted_span_found_with_exact_offsets(self, spark):
        """A 30-token span shared at DIFFERENT offsets must come back
        with both 1-based start positions and its exact length."""
        span = _words("dup", 30)
        rows = [
            (1, "web", span + " " + _words("tailone", 40)),
            (2, "web", _words("headtwo", 25) + " " + span),
            (3, "web", _words("noise", 60)),
        ]
        got = _run(spark, rows)
        assert got == {(1, 2): (1, 26, 30)}

    def test_span_below_length_floor_not_reported(self, spark):
        """A shared span of L-1 = 10 tokens is below the winnowing
        guarantee and the spec floor — never reported."""
        span = _words("dup", L - 1)
        rows = [
            (1, "web", span + " " + _words("aaa", 40)),
            (2, "web", _words("bbb", 40) + " " + span),
        ]
        assert _run(spark, rows) == {}

    def test_two_spans_same_pair_two_rows(self, spark):
        """Two separate duplicated spans between the same pair (with a
        differing gap between them) are two maximal runs, two rows."""
        s1, s2 = _words("one", 15), _words("two", 20)
        rows = [
            (1, "web", s1 + " " + _words("ga", 12) + " " + s2),
            (2, "web", s1 + " " + _words("gb", 5) + " " + s2),
        ]
        import os
        import tempfile

        d = tempfile.mkdtemp(prefix="subspan2_")
        spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {
            (r["start_a"], r["start_b"], r["span_len"])
            for r in dedup_substring_spans(spark, d).collect()
        }
        # doc1: s1 at 1..15, 12-token gap, s2 at 28; doc2: s1 at 1..15,
        # 5-token gap, s2 at 21
        assert out == {(1, 1, 15), (28, 21, 20)}

    def test_identical_docs_one_full_span(self, spark):
        txt = _words("same", 25)
        got = _run(spark, [(1, "web", txt), (2, "books", txt)])
        assert got == {(1, 2): (1, 1, 25)}


class TestWinnowingPosture:
    def test_fingerprint_density(self, spark):
        """Winnowing selects ~2/(W+1) of gram positions — the
        candidate join input must be a strict sample of the gram
        table, not all of it (the whole point of fingerprinting)."""
        docs = load(spark, SF_SMALL, "documents")
        grams = _grams(docs)
        key = F.col("gh") * (1 << 20) + F.col("pos")
        from pyspark.sql import Window

        win = (
            Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, W - 1)
        )
        fp = (
            grams.select("doc_id", F.min(key).over(win).alias("mk"))
            .distinct()
            .count()
        )
        total = grams.count()
        assert 0 < fp < 0.7 * total, (fp, total)

    def test_gram_df_far_below_cap(self, spark):
        """The stop-gram cap must be slack on this corpus (it exists
        as the skew guard, not as a load-bearing filter): measured max
        gram df is single-digit."""
        docs = load(spark, SF_SMALL, "documents")
        mx = (
            _grams(docs)
            .groupBy("gh")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.max("df"))
            .collect()[0][0]
        )
        assert mx <= DF_CAP / 5, mx

    def test_spec_constants(self):
        assert L == K + W - 1


def _docs_dir(spark, rows):
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="llm10_")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


class TestGopherRepetition:
    def test_repetitious_doc_dropped_clean_doc_kept(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            text_gopher_repetition,
        )

        spam = " ".join(["buy now"] * 20)  # top 2-gram covers ~all chars
        clean = _words("w", 40)  # every gram unique
        d = _docs_dir(spark, [(1, "web", spam), (2, "web", clean)])
        got = {r["doc_id"]: r for r in text_gopher_repetition(spark, d).collect()}
        assert got[1]["keep"] is False
        # "buy now" occurs 20x, len 7 -> 140 of 159 chars
        assert got[1]["top2gram_frac"] == round(140 / 159, 6)
        assert got[2]["keep"] is True
        assert got[2]["dup5gram_frac"] == 0.0

    def test_exact_fraction_arithmetic(self, spark):
        """'a b a b a b' (11 chars): top 2-gram 'a b' occurs 3x, len 3
        -> 9/11; top 3-gram 'a b a' occurs 2x, len 5 -> 10/11; dup
        5-grams: none (len 6 tokens -> two 5-grams, distinct)."""
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            text_gopher_repetition,
        )

        d = _docs_dir(spark, [(1, "web", "a b a b a b")])
        r = text_gopher_repetition(spark, d).collect()[0]
        assert r["top2gram_frac"] == round(9 / 11, 6)
        assert r["top3gram_frac"] == round(10 / 11, 6)
        assert r["dup5gram_frac"] == 0.0
        assert r["keep"] is False  # 9/11 > 0.20


class TestBigramFamiliarity:
    def test_known_counts(self, spark):
        """Corpus bigrams: 'x y' occurs 3x total, 'y x' 1x, 'y z' 1x.
        doc1 = 'x y x y' -> bigrams [x y, y x, x y] -> (3+1+3)/3;
        doc2 = 'x y z' -> [x y, y z] -> (3+1)/2."""
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            text_bigram_familiarity,
        )

        d = _docs_dir(spark, [(1, "web", "x y x y"), (2, "web", "x y z")])
        got = {
            r["doc_id"]: (r["n_bigrams"], r["familiarity"])
            for r in text_bigram_familiarity(spark, d).collect()
        }
        assert got == {
            1: (3, round(7 / 3, 6)),
            2: (2, 2.0),
        }


class TestImportanceWeightedSample:
    def test_weight_boundaries(self, spark):
        """TTR = 1 (all tokens distinct) -> threshold 10^6 -> ALWAYS
        kept; TTR = 1/40 -> kept only if hash bucket < 25000 (2.5%)."""
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            sample_importance_weighted,
        )

        rows = [(i, "web", _words(f"u{i}_", 30)) for i in range(50)]
        rows += [(100 + i, "web", " ".join(["rep"] * 40)) for i in range(50)]
        d = _docs_dir(spark, rows)
        got = {r["doc_id"]: r for r in
               sample_importance_weighted(spark, d).collect()}
        kept_unique = [i for i in range(50) if i in got]
        kept_rep = [i for i in range(100, 150) if i in got]
        assert len(kept_unique) == 50  # weight 1.0: all survive
        assert len(kept_rep) <= 5      # weight 0.025: almost none
        assert got[0]["ttr"] == 1.0

    def test_deterministic_across_runs(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            sample_importance_weighted,
        )

        a = sorted(
            r["doc_id"]
            for r in sample_importance_weighted(spark, SF_SMALL).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in sample_importance_weighted(spark, SF_SMALL).collect()
        )
        assert a == b and len(a) > 0


class TestSubstringScrub:
    def test_partial_scrub_exact_text(self, spark):
        """The higher doc_id loses exactly the duplicated span; the
        lower keeps the canonical occurrence and is NOT emitted."""
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            dedup_substring_scrub,
        )

        span = _words("dup", 20)
        head = _words("head", 10)
        tail = _words("tail", 10)
        d = _docs_dir(
            spark,
            [(1, "web", span), (2, "web", head + " " + span + " " + tail)],
        )
        rows = dedup_substring_scrub(spark, d).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["doc_id"] == 2
        assert (r["n_tokens"], r["n_removed"]) == (40, 20)
        assert r["clean_text"] == head + " " + tail

    def test_identical_twin_fully_scrubbed_null_text(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            dedup_substring_scrub,
        )

        txt = _words("same", 25)
        d = _docs_dir(spark, [(1, "web", txt), (7, "books", txt)])
        rows = dedup_substring_scrub(spark, d).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["doc_id"] == 7
        assert (r["n_tokens"], r["n_removed"]) == (25, 25)
        assert r["clean_text"] is None

    def test_overlapping_spans_collapse(self, spark):
        """Doc 3 shares one span with doc 1 and an OVERLAPPING span
        with doc 2 — removal positions must union, not double-count."""
        from rust_ruuvitag_etl_spark.plans.llm10 import (
            dedup_substring_scrub,
        )

        w = [f"t{i}" for i in range(30)]
        doc3 = " ".join(w)
        doc1 = " ".join(w[0:15])   # shares positions 1..15
        doc2 = " ".join(w[10:30])  # shares positions 11..30
        d = _docs_dir(spark, [(1, "web", doc1), (2, "web", doc2), (3, "web", doc3)])
        got = {r["doc_id"]: r for r in dedup_substring_scrub(spark, d).collect()}
        # doc3 is id_b of both pairs: all 30 positions covered
        assert (got[3]["n_tokens"], got[3]["n_removed"]) == (30, 30)
        assert got[3]["clean_text"] is None
        # doc2 is id_b of (1,2)? docs 1 and 2 share positions 11..15 of
        # doc1 = positions 1..5 of doc2 — a 5-token span, below L: no row
        assert 2 not in got
