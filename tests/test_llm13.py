"""Tests for the round-9 llm13 additions: BPE application (encode +
vocab), token-budget selection, and the quality-score AUC eval."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.functions import text as tf
from rust_ruuvitag_etl_spark.plans.llm13 import (
    corpus_token_budget_select,
    eval_quality_auc,
    tokenizer_bpe_encode,
    tokenizer_bpe_vocab,
)
from rust_ruuvitag_etl_spark.sources import load

from .conftest import SF_SMALL

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(spark, tmp_path, rows) -> str:
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


class TestBPEEncode:
    def test_counts_on_constructed_corpus(self, spark, tmp_path):
        """Merges on this corpus: (a,b)->ab, (ab,ab)->abab (from the
        round-8 training test), then a third rule; 'abab' tokenizes to
        1 token, 'ab' to 1, 'xy' depends on rule 3 — invariants below
        avoid pinning rule 3 while still checking real fusion."""
        text = " ".join(["abab"] * 4 + ["ab"] * 3 + ["xy"] * 2)
        d = _write_docs(spark, tmp_path, [(0, text, "en", "s", len(text))])
        rows = tokenizer_bpe_encode(spark, d).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_words"] == 9
        assert r["n_word_chars"] == 4 * 4 + 3 * 2 + 2 * 2  # 26
        # (a,b) then (ab,ab): 'abab'->1 token, 'ab'->1 token; 'xy'
        # is 2 tokens unless rule 3 fused (x,y), then 1.
        assert r["n_tokens"] in (4 + 3 + 2 * 2, 4 + 3 + 2 * 1)

    def test_whitespace_only_docs_do_not_surface(self, spark, tmp_path):
        d = _write_docs(
            spark,
            tmp_path,
            [(0, "ab ab", "en", "s", 5), (1, "   ", "en", "s", 3)],
        )
        rows = tokenizer_bpe_encode(spark, d).collect()
        assert [r["doc_id"] for r in rows] == [0]

    def test_invariants_on_real_corpus(self, spark):
        df = tokenizer_bpe_encode(spark, SF_SMALL)
        bad = df.filter(
            (F.col("n_tokens") > F.col("n_word_chars"))
            | (F.col("n_tokens") < F.col("n_words"))
            | (F.col("chars_per_token") < 1.0)
        ).count()
        assert bad == 0
        # every doc with words appears exactly once
        docs = load(spark, SF_SMALL, "documents").filter(
            F.trim(F.col("text")) != ""
        )
        assert df.count() == docs.count()


class TestBPEVocab:
    def test_vocab_mass_conservation(self, spark):
        """Total weighted symbol occurrences == total tokens over the
        corpus (the encode query's n_tokens summed), because both count
        positions of the SAME final segmentation."""
        vocab_total = (
            tokenizer_bpe_vocab(spark, SF_SMALL)
            .agg(F.sum("n_occurrences").alias("s"))
            .collect()[0]["s"]
        )
        encode_total = (
            tokenizer_bpe_encode(spark, SF_SMALL)
            .agg(F.sum("n_tokens").alias("s"))
            .collect()[0]["s"]
        )
        assert vocab_total == encode_total

    def test_merged_symbols_present(self, spark, tmp_path):
        text = " ".join(["abab"] * 4 + ["ab"] * 3 + ["xy"] * 2)
        d = _write_docs(spark, tmp_path, [(0, text, "en", "s", len(text))])
        toks = {
            r["token"] for r in tokenizer_bpe_vocab(spark, d).collect()
        }
        # after (a,b) and (ab,ab), both fused symbols survive as tokens
        assert "ab" in toks and "abab" in toks
        # raw 'a'/'b' no longer appear anywhere unfused in this corpus
        assert "a" not in toks and "b" not in toks


class TestBudgetSelect:
    def test_semantics_match_brute_force(self, spark):
        """Replay the admission rule in plain Python over the per-doc
        (score, n_tokens) table and demand the exact same selection."""
        per_doc = (
            load(spark, SF_SMALL, "documents")
            .select(
                "doc_id",
                tf.quality_score(F.col("text")).alias("score"),
                tf.token_count(F.col("text")).alias("n_tokens"),
            )
            .collect()
        )
        budget = sum(r["n_tokens"] for r in per_doc) // 5
        by_score: dict[float, list] = {}
        for r in per_doc:
            by_score.setdefault(r["score"], []).append(r)
        expect = {}
        cum = 0
        for s in sorted(by_score, reverse=True):
            bucket = sorted(by_score[s], key=lambda r: r["doc_id"])
            btoks = sum(r["n_tokens"] for r in bucket)
            if cum + btoks <= budget:
                for r in bucket:
                    expect[r["doc_id"]] = "full"
            elif cum < budget:
                run = cum
                for r in bucket:
                    if run + r["n_tokens"] <= budget:
                        expect[r["doc_id"]] = "boundary"
                    run += r["n_tokens"]
            cum += btoks
        got = {
            r["doc_id"]: r["stage"]
            for r in corpus_token_budget_select(spark, SF_SMALL).collect()
        }
        assert got == expect
        # the selection actually fits the budget
        sel_tokens = sum(
            r["n_tokens"] for r in per_doc if r["doc_id"] in got
        )
        assert sel_tokens <= budget


class TestMinhashEstimate:
    def test_identity_and_error_bounds(self, spark):
        """MinHash identity pins: estimate and error stay in [0,1],
        matches is consistent with the displayed estimate, exact-equal
        signatures imply jaccard near 1, and the estimator is
        CALIBRATED on the planted near-dups (E[matches/k]=J — with 28
        pairs at j≈0.97 the mean |err| sits ~0.03; 0.15 is a collapse
        detector, not a tight bound)."""
        from rust_ruuvitag_etl_spark.plans.llm13 import eval_minhash_estimate

        rows = eval_minhash_estimate(spark, SF_SMALL).collect()
        assert rows, "LSH found no candidate pairs at sf0.001"
        for r in rows:
            assert 0 <= r["matches"] <= 16
            assert abs(r["minhash_estimate"] - round(r["matches"] / 16, 4)) < 1e-9
            assert 0.0 <= r["abs_error"] <= 1.0
        # the corpus plants shingle-level near-dups (j ~ 0.9+)
        assert any(r["jaccard"] >= 0.9 for r in rows)
        assert sum(r["abs_error"] for r in rows) / len(rows) < 0.15


class TestQualityAUC:
    def test_matches_brute_force_pairwise(self, spark):
        """Exact pairwise Mann-Whitney over the 500-doc corpus: every
        (pos, neg) pair contributes 2/1/0 to 2U for win/tie/loss."""
        per_doc = (
            load(spark, SF_SMALL, "documents")
            .select(
                tf.quality_score(F.col("text")).alias("score"),
                (F.col("lang") == "en").alias("pos"),
            )
            .collect()
        )
        pos = sorted(r["score"] for r in per_doc if r["pos"])
        neg = sorted(r["score"] for r in per_doc if not r["pos"])
        import bisect

        u2 = 0
        for p in pos:
            lo = bisect.bisect_left(neg, p)
            hi = bisect.bisect_right(neg, p)
            u2 += 2 * lo + (hi - lo)
        row = eval_quality_auc(spark, SF_SMALL).collect()[0]
        assert row["n_pos"] == len(pos)
        assert row["n_neg"] == len(neg)
        assert row["u2"] == u2
        assert 0.0 <= row["auc"] <= 1.0
