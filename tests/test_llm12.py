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
