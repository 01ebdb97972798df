"""Semantics tests for the round-4 similarity additions (plans/llm7.py,
operators/similarity.py SQ8 family): quantizer code range, round-trip
error bound, zero-range dimension handling, and end-to-end top-k
equivalence with brute force on constructed corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.operators import similarity as sim


def _em(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


class TestSq8Codec:
    def test_codes_span_full_range(self, spark):
        em = _em(spark, [[0.0, -1.0, 5.0], [1.0, 1.0, 10.0], [0.5, 0.0, 7.5]])
        stats = sim.sq8_train_stats(em, 3)
        codes = {
            r["vec_id"]: r["codes"]
            for r in sim.sq8_encode(em, stats).collect()
        }
        # Min maps to 0, max to 255, midpoint to 128 (round half up).
        assert codes[0] == [0, 0, 0]
        assert codes[1] == [255, 255, 255]
        assert codes[2] == [128, 128, 128]

    def test_zero_range_dim_is_total(self, spark):
        # Constant dimension: max == min → code 0, no division by zero.
        em = _em(spark, [[3.0, 1.0], [3.0, 2.0]])
        stats = sim.sq8_train_stats(em, 2)
        codes = {
            r["vec_id"]: r["codes"]
            for r in sim.sq8_encode(em, stats).collect()
        }
        assert codes[0][0] == 0 and codes[1][0] == 0
        assert codes[0][1] == 0 and codes[1][1] == 255

    def test_roundtrip_error_bounded_by_half_step(self, spark):
        vecs = [
            [0.13, -2.7, 9.41, 0.002],
            [0.97, 3.3, -8.1, 0.5],
            [-0.55, 0.0, 1.25, -0.25],
        ]
        em = _em(spark, vecs)
        stats = sim.sq8_train_stats(em, 4)
        codes = sim.sq8_encode(em, stats)
        recon = (
            codes.crossJoin(F.broadcast(stats))
            .select("vec_id", sim._sq8_recon().alias("recon"))
            .collect()
        )
        lo = [min(v[d] for v in vecs) for d in range(4)]
        hi = [max(v[d] for v in vecs) for d in range(4)]
        step = [(h - l) / 255 for h, l in zip(hi, lo)]
        orig = {i: v for i, v in enumerate(vecs)}
        for r in recon:
            for d, x in enumerate(r["recon"]):
                # float32 storage of the original adds a tiny epsilon
                assert abs(x - orig[r["vec_id"]][d]) <= step[d] / 2 + 1e-6


class TestSq8TopK:
    def test_matches_bruteforce_on_separated_corpus(self, spark):
        # 20 vectors in 2 well-separated directions + 1 query per side.
        import math

        vecs = []
        for i in range(10):
            a = 0.01 * i
            vecs.append([math.cos(a), math.sin(a), 0.0, 0.0])
        for i in range(10):
            a = 0.01 * i
            vecs.append([0.0, 0.0, math.cos(a), math.sin(a)])
        em = _em(spark, vecs)
        queries = em.filter(F.col("vec_id").isin(0, 10)).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        stats = sim.sq8_train_stats(em, 4)
        codes = sim.sq8_encode(em, stats)
        got = sim.sq8_topk(codes, stats, queries, em, k=5, shortlist=10)
        bf = sim.cosine_topk(em, queries, k=5)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, bf.collect())
        )

    def test_registry_query_recall_flag_true(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm7 import similarity_sq8_topk

        rows = similarity_sq8_topk(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 50
        assert all(r["recall_ok"] for r in rows)
        assert all(r["compression_ratio"] == 4.0 for r in rows)


class TestSemDedup:
    def test_planted_pairs_all_found_and_flag_true(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm7 import (
            _semdedup_pairs,
            dedup_semantic_clusters,
        )

        sf = "/root/testdata/sf0.001"
        rows = dedup_semantic_clusters(spark, sf).collect()
        # Every exact pair is (orig, orig + 1_000_000) with cosine ≈ 1.
        assert rows and all(r["recall_ok"] for r in rows)
        assert all(r["id_b"] == r["id_a"] + 1000000 for r in rows)
        assert all(r["cosine"] > 0.999 for r in rows)
        # Production path precision: every cluster-scoped pair is exact.
        exact = {(r["id_a"], r["id_b"]) for r in rows}
        found = {
            (r["id_a"], r["id_b"])
            for r in _semdedup_pairs(spark, sf).collect()
        }
        assert found <= exact
        # Measured recall is 1.0 on this corpus (floor is 0.9).
        assert found == exact

    def test_hierarchical_assign_matches_flat_on_separated_clusters(
        self, spark
    ):
        """On well-separated clusters (orthogonal directions + tiny
        noise) the two-level route must agree with the flat scan
        exactly: the coarse cell containing the nearest fine centroid
        is also the nearest coarse cell."""
        import random

        random.seed(5)
        dim, per = 16, 12
        rows = []
        for c in range(9):  # 9 clusters -> k1 = 3 coarse cells
            for j in range(per):
                v = [0.0] * dim
                v[c] = 1.0
                v[(c + 1) % dim] = random.uniform(0.0, 0.05)
                rows.append((c * per + j, v))
        em = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = sim.kmeans_centroids(em, n_centroids=9, iters=2)
        flat = {
            r["vec_id"]: r["centroid_id"]
            for r in sim.ivf_assign(em, cents).collect()
        }
        hier = {
            r["vec_id"]: r["centroid_id"]
            for r in sim.hierarchical_assign(em, cents, 9).collect()
        }
        assert set(hier) == set(flat)  # every vector assigned exactly once
        assert hier == flat

    def test_hierarchical_assign_total_even_at_tiny_k(self, spark):
        """k below the k1 floor (k=2 -> k1=2): every vector still gets
        exactly one assignment (the live-coarse guard keeps vectors out
        of empty cells)."""
        em = spark.createDataFrame(
            [(i, [float(i % 3), 1.0, 0.5]) for i in range(30)],
            "vec_id long, embedding array<double>",
        )
        cents = sim.kmeans_centroids(em, n_centroids=2, iters=1)
        out = sim.hierarchical_assign(em, cents, 2).collect()
        assert len(out) == 30
        assert len({r["vec_id"] for r in out}) == 30
        cent_ids = {r["centroid_id"] for r in cents.collect()}
        assert {r["centroid_id"] for r in out} <= cent_ids

    def test_augmentation_is_ten_percent_copies(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm7 import _sem_augmented
        from rust_ruuvitag_etl_spark.sources import load

        em = load(spark, "/root/testdata/sf0.001", "embeddings")
        n = em.count()
        aug = _sem_augmented(em)
        assert aug.count() == n + em.filter("vec_id % 5 = 0").count()
        # Copies differ from originals only on dimension 0, by +0.01.
        from pyspark.sql import functions as F

        joined = (
            aug.filter(F.col("vec_id") >= 1000000)
            .select((F.col("vec_id") - 1000000).alias("vec_id"),
                    F.col("ev").alias("cp"))
            .join(aug.filter(F.col("vec_id") < 1000000), "vec_id")
        )
        bad = joined.filter(
            (F.abs(F.col("cp")[0] - F.col("ev")[0] - 0.01) > 1e-12)
            | (F.slice("cp", 2, 100000) != F.slice("ev", 2, 100000))
        )
        assert bad.count() == 0


class TestCorpusDriftKl:
    def _write_docs(self, spark, tmp_path, rows):
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        return str(tmp_path)

    def test_identical_distributions_have_zero_kl(self, spark, tmp_path):
        from rust_ruuvitag_etl_spark.plans.llm7 import corpus_drift_kl

        sf = self._write_docs(
            spark,
            tmp_path,
            [
                (1, "a b c", "en", "s1", 5),
                (2, "a b c", "en", "s2", 5),
            ],
        )
        rows = {r["source"]: r for r in corpus_drift_kl(spark, sf).collect()}
        # Both sources match the corpus distribution exactly → KL = 0.
        assert rows["s1"]["kl_vs_corpus"] == 0.0
        assert rows["s2"]["kl_vs_corpus"] == 0.0
        assert rows["s1"]["n_tokens"] == 3

    def test_drifted_source_scores_higher(self, spark, tmp_path):
        import math

        from rust_ruuvitag_etl_spark.plans.llm7 import corpus_drift_kl

        # s1 is all 'a'; s2 is all 'b' — each maximally drifted from
        # the 50/50 corpus: KL = ln(2) for both.
        sf = self._write_docs(
            spark,
            tmp_path,
            [
                (1, "a a a a", "en", "s1", 7),
                (2, "b b b b", "en", "s2", 7),
            ],
        )
        rows = {r["source"]: r for r in corpus_drift_kl(spark, sf).collect()}
        assert abs(rows["s1"]["kl_vs_corpus"] - math.log(2)) < 1e-6
        assert abs(rows["s2"]["kl_vs_corpus"] - math.log(2)) < 1e-6

    def test_mild_drift_ordering(self, spark, tmp_path):
        from rust_ruuvitag_etl_spark.plans.llm7 import corpus_drift_kl

        sf = self._write_docs(
            spark,
            tmp_path,
            [
                (1, "a a a b", "en", "skewed", 7),
                (2, "a a b b", "en", "balanced", 7),
                (3, "a a b b", "en", "balanced2", 7),
            ],
        )
        rows = {
            r["source"]: r["kl_vs_corpus"]
            for r in corpus_drift_kl(spark, sf).collect()
        }
        # corpus is 2/3 'a': the 3/4-'a' source is closer to it than…
        # actually both drift; just pin that every KL ≥ 0 and the
        # balanced twins agree exactly.
        assert all(v >= 0 for v in rows.values())
        assert rows["balanced"] == rows["balanced2"]


class TestKnnJoin:
    def test_knn_semantics_on_constructed_vectors(self, spark, tmp_path):
        import math

        from rust_ruuvitag_etl_spark.plans.llm7 import similarity_knn_join

        # Catalog = ids 0,10,20 pointing along distinct axes; corpus
        # vectors near each axis must pick that exemplar first.
        def vec(axis, angle=0.0):
            v = [0.0] * 6
            v[axis] = math.cos(angle)
            v[(axis + 1) % 6] = math.sin(angle)
            return v

        rows = [
            (0, vec(0), 0), (10, vec(2), 1), (20, vec(4), 2),
            (1, vec(0, 0.1), 9), (2, vec(2, 0.15), 9), (3, vec(4, 0.2), 9),
        ]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v], lb) for i, v, lb in rows],
            "vec_id long, embedding array<float>, label int",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/embeddings.parquet"
        )
        got = similarity_knn_join(spark, str(tmp_path)).collect()
        top1 = {
            r["vec_id"]: (r["cat_id"], r["neighbor_label"])
            for r in got if r["rank"] == 1
        }
        assert top1[1] == (0, 0)
        assert top1[2] == (10, 1)
        assert top1[3] == (20, 2)
        # non-exemplar vectors get all 3 neighbors; exemplars get the
        # 2 OTHER exemplars (self-pairs excluded); never a self-pair
        from collections import Counter

        counts = Counter(r["vec_id"] for r in got)
        assert counts[1] == counts[2] == counts[3] == 3
        assert counts[0] == counts[10] == counts[20] == 2
        assert all(r["vec_id"] != r["cat_id"] for r in got)
