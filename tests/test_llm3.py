"""Property tests for the corpus-preparation queries (plans/llm3.py):
invariants the DuckDB differential can't express (it proves Spark ==
oracle; these prove both match the SPEC)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.llm3 import (
    pack_sequences_token_budget,
    sample_stratified_by_lang,
    text_chunk_documents,
)

from .conftest import SF_SMALL


class TestChunking:
    def test_chunk_sizes_and_overlap(self, spark):
        chunks = text_chunk_documents(spark, SF_SMALL)
        rows = chunks.orderBy("doc_id", "chunk_idx").collect()
        assert rows
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, rs in by_doc.items():
            # contiguous chunk indices from 0
            assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
            for r in rs:
                assert 1 <= r["chunk_tokens"] <= 50
            # stride 40 over 50-token windows → consecutive FULL chunks
            # share exactly 10 tokens
            for a, b in zip(rs, rs[1:]):
                ta, tb = a["chunk"].split(), b["chunk"].split()
                if len(ta) == 50:
                    assert ta[40:] == tb[: len(ta) - 40]

    def test_every_nonempty_doc_chunked(self, spark):
        docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        n_docs = docs.filter(F.trim("text") != "").count()
        chunked = text_chunk_documents(spark, SF_SMALL)
        assert chunked.select("doc_id").distinct().count() == n_docs


class TestPacking:
    def test_packs_respect_budget_greedily(self, spark):
        rows = pack_sequences_token_budget(spark, SF_SMALL).collect()
        assert rows
        groups: dict[tuple, list] = {}
        for r in rows:
            groups.setdefault((r["lang"], r["shard"]), []).append(r)
        for (_, shard), rs in groups.items():
            rs.sort(key=lambda r: r["doc_id"])
            cum = 0
            for r in rs:
                assert r["shard"] == shard == r["doc_id"] % 64
                # pack assignment is by PRECEDING cumulative tokens
                assert r["pack_id"] == cum // 512
                cum += r["n_tokens"]


class TestStratifiedSample:
    def test_fraction_and_determinism(self, spark):
        s1 = sample_stratified_by_lang(spark, SF_SMALL)
        s2 = sample_stratified_by_lang(spark, SF_SMALL)
        ids1 = {r["doc_id"] for r in s1.collect()}
        ids2 = {r["doc_id"] for r in s2.collect()}
        assert ids1 == ids2  # reproducible split
        total = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
        frac = len(ids1) / total
        assert 0.10 <= frac <= 0.30, frac  # ~20% of a 500-doc corpus
