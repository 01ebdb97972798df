"""Tests for the round-8 llm12 additions: URL canonicalization + dedup
and the tracking-parameter audit."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.functions.urls import canonicalize_url
from rust_ruuvitag_etl_spark.plans.llm12 import (
    dedup_url_canonical,
    url_tracking_param_stats,
)

from .conftest import SF_SMALL


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


class TestCanonicalizeUrl:
    def test_case_port_www_fragment_tracking_all_collapse(self, spark):
        """Every rule fires at once: scheme/host case, www., default
        port, trailing slash, fragment, tracking params, param order."""
        variants = [
            "HTTPS://WWW.News.Example:443/a/b/?utm_source=x&page=2&gclid=g#top",
            "https://news.example/a/b?page=2",
            "https://www.news.example/a/b/?fbclid=f&page=2#s1",
        ]
        got = _canon(spark, variants)
        assert got == ["https://news.example/a/b?page=2"] * 3

    def test_non_default_port_kept(self, spark):
        assert _canon(spark, ["https://host.example:8080/x"]) == [
            "https://host.example:8080/x"
        ]
        # http default port 80 dropped; https' 443 is NOT http's default
        assert _canon(spark, ["HTTP://host.example:80/x"]) == [
            "http://host.example/x"
        ]
        assert _canon(spark, ["http://host.example:443/x"]) == [
            "http://host.example:443/x"
        ]

    def test_empty_path_and_query_give_root(self, spark):
        assert _canon(
            spark,
            ["https://Host.Example", "https://host.example/?utm_medium=m"],
        ) == ["https://host.example/", "https://host.example/"]

    def test_params_sorted_and_non_tracking_kept(self, spark):
        got = _canon(spark, ["https://h.example/p?z=1&a=2&ref=r&m=3"])
        assert got == ["https://h.example/p?a=2&m=3&z=1"]

    def test_www_stripped_only_as_prefix(self, spark):
        # a host that merely CONTAINS www is untouched
        assert _canon(spark, ["https://wwwx.example/p", "https://www.example/p"]) == [
            "https://wwwx.example/p",
            "https://example/p",
        ]


class TestDedupUrlCanonical:
    def test_groups_cover_corpus_and_keeper_is_min(self, spark):
        out = dedup_url_canonical(spark, SF_SMALL).collect()
        import duckdb

        n_docs_total = (
            duckdb.connect()
            .execute(
                f"SELECT COUNT(*) FROM '{SF_SMALL}/documents.parquet'"
            )
            .fetchone()[0]
        )
        assert sum(r["n_docs"] for r in out) == n_docs_total
        assert all(r["n_raw_variants"] <= r["n_docs"] for r in out)
        assert all(r["keeper_doc_id"] >= 0 for r in out)
        # the construction guarantees real duplicate groups
        assert any(r["n_docs"] > 1 for r in out)
        assert any(r["n_raw_variants"] > 1 for r in out)

    def test_canonical_urls_are_clean(self, spark):
        out = dedup_url_canonical(spark, SF_SMALL).collect()
        for r in out:
            c = r["canonical_url"]
            assert c.startswith("https://src")  # lowercased, www-stripped
            assert "#" not in c and "utm_" not in c and ":443" not in c
            assert not c.split("?")[0].endswith("//")

    def test_tracking_stats_match_construction(self, spark):
        rows = {r["param"]: r for r in url_tracking_param_stats(spark, SF_SMALL).collect()}
        # construction emits utm_source (even ids) and utm_campaign
        # (odd ids with doc_id%9<4); no other tracker
        assert set(rows) == {"utm_source", "utm_campaign"}
        assert rows["utm_source"]["n_occurrences"] == rows["utm_source"]["n_docs"]


class TestPII:
    def test_redaction_on_handcrafted_text(self, spark):
        from rust_ruuvitag_etl_spark.functions.pii import redact_pii

        rows = [
            ("Mail a.b+c%d@sub.example.co.uk today",
             "Mail [EMAIL] today"),
            ("Call +44 (020) 79460 or +1 (555) 0100.",
             "Call [PHONE] or [PHONE]."),
            ("Peer 192.168.0.1 and 10.0.0.255 up",
             "Peer [IP] and [IP] up"),
            # email digits must not leak into the later IP pass
            ("x user10.0.0.1name@h.example y",
             "x [EMAIL] y"),
            ("no pii here", "no pii here"),
        ]
        df = spark.createDataFrame(rows, "t string, want string")
        got = df.select("want", redact_pii(F.col("t")).alias("got")).collect()
        for r in got:
            assert r["got"] == r["want"]

    def test_scan_counts_match_construction(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm12 import governance_pii_scan

        out = {r["doc_id"]: r for r in governance_pii_scan(spark, SF_SMALL).collect()}
        for did, r in out.items():
            assert r["n_emails"] == (1 if did % 3 == 0 else 0)
            assert r["n_phones"] == (1 if did % 4 == 1 else 0)
            assert r["n_ipv4"] == (1 if did % 5 == 2 else 0)
            assert "[EMAIL]" in r["redacted"] or r["n_emails"] == 0
            assert "@" not in r["redacted"].replace("[EMAIL]", "")
        # only PII-bearing docs surface
        assert all(
            r["n_emails"] + r["n_phones"] + r["n_ipv4"] > 0 for r in out.values()
        )

    def test_summary_totals(self, spark):
        import duckdb

        from rust_ruuvitag_etl_spark.plans.llm12 import governance_pii_summary

        row = governance_pii_summary(spark, SF_SMALL).collect()[0]
        n = (
            duckdb.connect()
            .execute(f"SELECT COUNT(*) FROM '{SF_SMALL}/documents.parquet'")
            .fetchone()[0]
        )
        assert row["n_docs"] == n
        assert row["total_emails"] == sum(1 for d in range(n) if d % 3 == 0)
        assert row["total_phones"] == sum(1 for d in range(n) if d % 4 == 1)
        assert row["total_ipv4"] == sum(1 for d in range(n) if d % 5 == 2)


class TestCorpusSplit:
    def test_assignment_deterministic_and_complete(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm12 import corpus_split_assign

        a = {r["doc_id"]: r for r in corpus_split_assign(spark, SF_SMALL).collect()}
        b = {r["doc_id"]: r for r in corpus_split_assign(spark, SF_SMALL).collect()}
        assert len(a) == len(b) > 0
        for did in a:
            assert a[did]["split"] == b[did]["split"]
            assert a[did]["bucket"] == b[did]["bucket"]
            want = (
                "train" if a[did]["bucket"] < 80
                else "validation" if a[did]["bucket"] < 90
                else "test"
            )
            assert a[did]["split"] == want

    def test_split_shares_near_nominal(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm12 import corpus_split_assign

        rows = corpus_split_assign(spark, SF_SMALL).collect()
        n = len(rows)
        from collections import Counter

        c = Counter(r["split"] for r in rows)
        # md5 buckets: train ~80%, val ~10%, test ~10% (loose bounds)
        assert 0.7 < c["train"] / n < 0.9
        assert 0.04 < c["validation"] / n < 0.16
        assert 0.04 < c["test"] / n < 0.16

    def test_stats_fracs_sum_to_one_per_split(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm12 import corpus_split_stats

        rows = corpus_split_stats(spark, SF_SMALL).collect()
        from collections import defaultdict

        by_split = defaultdict(float)
        totals = {}
        for r in rows:
            by_split[r["split"]] += r["frac"]
            totals[r["split"]] = r["split_total"]
            assert r["n_docs"] <= r["split_total"]
        for s, tot in by_split.items():
            assert abs(tot - 1.0) < 1e-4, (s, tot)
        assert set(totals) == {"train", "validation", "test"}


class TestBPE:
    def test_learned_merges_on_constructed_corpus(self, spark, tmp_path):
        """Corpus engineered so the merge sequence is hand-computable:
        'abab' x4 and 'ab' x3 make (a,b) the top pair (11 occurrences),
        then (ab,ab) fuses the doubled word."""
        import os

        from rust_ruuvitag_etl_spark.plans.llm12 import tokenizer_bpe_merges

        text = " ".join(["abab"] * 4 + ["ab"] * 3 + ["xy"] * 2)
        d = str(tmp_path)
        spark.createDataFrame(
            [(0, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        rows = sorted(
            tokenizer_bpe_merges(spark, d).collect(),
            key=lambda r: r["merge_rank"],
        )
        # rank 1: (a,b) appears 2x in 'abab' (x4) + 1x in 'ab' (x3) = 11
        assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "b")
        assert rows[0]["pair_count"] == 11
        assert rows[0]["merged_sym"] == "ab"
        # rank 2: after fusing, 'abab' -> [ab, ab]: pair (ab, ab) x4
        # beats (x,y) x2
        assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("ab", "ab")
        assert rows[1]["pair_count"] == 4

    def test_greedy_left_to_right_on_runs(self, spark, tmp_path):
        """'aaa' under rule (a,a): greedy fold yields [aa, a], so the
        round-2 count for (aa, a) reflects non-overlapping merges."""
        import os

        from rust_ruuvitag_etl_spark.plans.llm12 import tokenizer_bpe_merges

        text = " ".join(["aaa"] * 5)
        d = str(tmp_path)
        spark.createDataFrame(
            [(0, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        rows = sorted(
            tokenizer_bpe_merges(spark, d).collect(),
            key=lambda r: r["merge_rank"],
        )
        assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "a")
        assert rows[0]["pair_count"] == 10  # 2 adjacent pairs x5 words
        # after greedy merge 'aaa' -> [aa, a]: (aa, a) x5
        assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("aa", "a")
        assert rows[1]["pair_count"] == 5
