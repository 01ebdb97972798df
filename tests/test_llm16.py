"""Deletion propagation (right-to-be-forgotten) audit."""

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.operators import dedup as dd
from rust_ruuvitag_etl_spark.plans.llm16 import (
    _TAKEDOWN_MOD,
    governance_deletion_propagate,
)
from rust_ruuvitag_etl_spark.sources import load

SF_SMALL = "/root/testdata/sf0.001"

ARTIFACTS = {
    "corpus",
    "fingerprints",
    "minhash_bands",
    "postings",
    "packed_sequences",
}


class TestDeletionPropagate:
    def test_residue_free_everywhere(self, spark):
        rows = {r["artifact"]: r for r in
                governance_deletion_propagate(spark, SF_SMALL).collect()}
        assert set(rows) == ARTIFACTS
        for r in rows.values():
            assert r["residue"] == 0
            assert r["residue_free"] is True
            assert r["rows_before"] == r["rows_purged"] + r["rows_after"]
            assert r["rows_purged"] > 0  # the manifest is non-empty

    def test_counts_are_consistent(self, spark):
        rows = {r["artifact"]: r for r in
                governance_deletion_propagate(spark, SF_SMALL).collect()}
        docs = load(spark, SF_SMALL, "documents")
        n = docs.count()
        n_del = docs.filter(F.col("doc_id") % _TAKEDOWN_MOD == 0).count()
        assert rows["corpus"]["rows_before"] == n
        assert rows["corpus"]["rows_purged"] == n_del
        # fingerprints are 1:1 with the corpus
        assert rows["fingerprints"]["rows_before"] == n
        # 4 band rows per doc with >=1 shingle (>=3 tokens)
        assert rows["minhash_bands"]["rows_before"] % 4 == 0
        # pack purge drops whole packs: at least the deleted docs' rows
        assert rows["packed_sequences"]["rows_purged"] >= n_del

    def test_band_buckets_shape(self, spark):
        docs = load(spark, SF_SMALL, "documents").limit(50)
        b = dd.minhash_band_buckets(docs, hash_family="fast")
        rows = b.collect()
        assert set(r["band"] for r in rows) <= {0, 1, 2, 3}
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], set()).add(r["band"])
        assert all(bands == {0, 1, 2, 3} for bands in per_doc.values())
        assert all(r["bh"] >= 0 for r in rows)
