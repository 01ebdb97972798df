"""Tests for the round-7 llm11 additions: k-means Lloyd training, RRF
retrieval fusion, containment dedup, and k-anonymity suppression."""

from __future__ import annotations

import os
import tempfile

import numpy as np
from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.llm11 import (
    DIM,
    K_ANON,
    K_CLUSTERS,
    MMR_K,
    PCA_ITERS,
    Q_SCALE,
    RRF_K,
    cluster_kmeans_inertia,
    cluster_kmeans_lloyd,
    dedup_containment_pairs,
    embedding_pca_power_iteration,
    eval_langid_metrics,
    eval_mmr_ndcg,
    governance_k_anonymity,
    governance_l_diversity,
    retrieval_mmr_rerank,
    retrieval_rrf_fusion,
    streaming_kmeans_assign,
)
from .conftest import SF_SMALL


def _write_docs(spark, rows):
    d = tempfile.mkdtemp(prefix="llm11_docs_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def _write_embeddings(spark, rows):
    d = tempfile.mkdtemp(prefix="llm11_emb_")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def _q(x: float) -> int:
    """The plan's quantizer, reproduced: float32 -> double -> micro
    round (so expected centroids are computed from the same lattice)."""
    return int(round(float(np.float32(x)) * Q_SCALE))


class TestKMeansLloyd:
    def test_planted_pairs_converge_to_pair_means(self, spark):
        """16 vectors = 8 well-separated tight pairs; init picks the 8
        'left' points (lowest vec_ids), so after one update every
        centroid is its pair's floor-mean and iterations 2-3 are
        stable."""
        rows = []
        for j in range(K_CLUSTERS):
            center = 0.1 * j
            left = [np.float32(center - 0.001)] + [np.float32(0.0)] * 63
            right = [np.float32(center + 0.001)] + [np.float32(0.0)] * 63
            rows.append((j, [float(v) for v in left], j))
            rows.append((8 + j, [float(v) for v in right], j))
        d = _write_embeddings(spark, rows)
        out = cluster_kmeans_lloyd(spark, d).collect()
        assert len(out) == K_CLUSTERS * 64
        by_cd = {(r["cluster"], r["dim"]): r for r in out}
        for j in range(K_CLUSTERS):
            qa = _q(0.1 * j - 0.001)
            qb = _q(0.1 * j + 0.001)
            expect = int(np.floor((qa + qb) / 2.0))
            row = by_cd[(j, 1)]
            assert row["c"] == expect, (j, row["c"], expect)
            assert row["n"] == 2
            # all other dims are exactly zero
            assert by_cd[(j, 2)]["c"] == 0

    def test_fewer_vectors_than_k_still_trains(self, spark):
        """With 5 vectors, init takes all 5 as centroids; clusters 5-7
        never exist and the output has 5 clusters (empty clusters drop
        out of the GROUP BY — standard Lloyd)."""
        rows = [
            (i, [float(np.float32(0.2 * i))] + [0.0] * 63, i)
            for i in range(5)
        ]
        d = _write_embeddings(spark, rows)
        out = cluster_kmeans_lloyd(spark, d)
        clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
        assert clusters == {0, 1, 2, 3, 4}


class TestRRFFusion:
    def test_dominant_doc_fuses_first(self, spark):
        """A doc that tops BOTH retrievers gets rrf = 2/(60+1) and
        fused_rank 1; docs outside both top lists never appear."""
        rows = [
            # doc 1: short, stuffed with all three terms -> top of both
            (1, "data data data join join filter", "en", "web", 30),
            # docs 2-4: one weak term occurrence in longer filler
            (2, "data " + " ".join(f"x{i}" for i in range(50)), "en", "web", 300),
            (3, "join " + " ".join(f"y{i}" for i in range(50)), "en", "web", 300),
            # doc 5: no query terms at all -> in neither list
            (5, " ".join(f"z{i}" for i in range(40)), "en", "web", 240),
        ]
        d = _write_docs(spark, rows)
        out = {r["doc_id"]: r for r in retrieval_rrf_fusion(spark, d).collect()}
        assert 5 not in out
        top = out[1]
        assert top["rank_bm25"] == 1 and top["rank_tfidf"] == 1
        assert top["fused_rank"] == 1
        assert abs(top["rrf_score"] - round(2.0 / (RRF_K + 1), 6)) < 1e-9

    def test_single_list_docs_get_partial_score(self, spark):
        """Every emitted doc is in >= 1 list and its score equals the
        sum of the reciprocal ranks it actually holds."""
        rows = [
            (1, "data join filter", "en", "web", 20),
            (2, "data data " + " ".join(f"x{i}" for i in range(30)), "en", "web", 200),
        ]
        d = _write_docs(spark, rows)
        for r in retrieval_rrf_fusion(spark, d).collect():
            want = 0.0
            if r["rank_bm25"] is not None:
                want += 1.0 / (RRF_K + r["rank_bm25"])
            if r["rank_tfidf"] is not None:
                want += 1.0 / (RRF_K + r["rank_tfidf"])
            assert r["rank_bm25"] is not None or r["rank_tfidf"] is not None
            assert abs(r["rrf_score"] - round(want, 6)) < 1e-9


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestContainmentPairs:
    def test_embedded_doc_detected_one_direction(self, spark):
        """Doc 1's text is a prefix of doc 2's: containment(1→2) = 1.0,
        emitted once in the contained→container direction only."""
        small = _words("ca", 30)
        rows = [
            (1, small, "en", "web", 200),
            (2, small + " " + _words("pad", 100), "en", "web", 900),
            (3, _words("zz", 60), "en", "web", 400),
        ]
        d = _write_docs(spark, rows)
        got = {
            (r["contained_id"], r["container_id"]): r
            for r in dedup_containment_pairs(spark, d).collect()
        }
        assert set(got) == {(1, 2)}
        assert got[(1, 2)]["containment"] == 1.0
        assert got[(1, 2)]["n_contained"] == 28  # 30 tokens -> 28 shingles

    def test_partial_overlap_below_threshold_not_emitted(self, spark):
        """Sharing only a 10-token prefix of a 30-token doc is 8/28
        shingle containment — far below 0.8, no row."""
        a = _words("ca", 30)
        c = _words("ca", 10) + " " + _words("other", 30)
        d = _write_docs(
            spark, [(1, a, "en", "web", 200), (3, c, "en", "web", 260)]
        )
        assert dedup_containment_pairs(spark, d).count() == 0

    def test_identical_docs_emit_both_directions(self, spark):
        """Equal-size mutual containment (identical text) emits both
        ordered rows, each with containment 1.0."""
        t = _words("eq", 25)
        d = _write_docs(
            spark, [(4, t, "en", "web", 150), (5, t, "en", "web", 150)]
        )
        got = {
            (r["contained_id"], r["container_id"]): r["containment"]
            for r in dedup_containment_pairs(spark, d).collect()
        }
        assert got == {(4, 5): 1.0, (5, 4): 1.0}


class TestStreamingKMeansAssign:
    def test_streamed_vectors_land_in_pair_clusters(self, spark):
        """On the tight-pair corpus the stream must label BOTH members
        of pair j with cluster j (the trained centroid sits at the pair
        mean), with the left/right residual distances symmetric."""
        rows = []
        for j in range(K_CLUSTERS):
            center = 0.1 * j
            rows.append((j, [float(np.float32(center - 0.001))] + [0.0] * 63, j))
            rows.append((8 + j, [float(np.float32(center + 0.001))] + [0.0] * 63, j))
        d = _write_embeddings(spark, rows)
        got = {r["vec_id"]: r for r in streaming_kmeans_assign(spark, d).collect()}
        assert len(got) == 2 * K_CLUSTERS
        for j in range(K_CLUSTERS):
            assert got[j]["cluster"] == j
            assert got[8 + j]["cluster"] == j
            # centroid = floor-mean of the two quantized points, so the
            # two residuals differ by at most the floor's one-unit bias
            assert abs(got[j]["d"] - got[8 + j]["d"]) <= 2 * Q_SCALE

    def test_stream_matches_batch_assignment(self, spark):
        """The streaming result equals a batch recomputation of the
        same assignment on real sf0.001 data (stream-static join and
        keyed argmin introduce no divergence)."""
        from rust_ruuvitag_etl_spark.plans.llm11 import (
            _assign_int,
            _init_centroids,
            _quantized,
        )
        from rust_ruuvitag_etl_spark.plans.llm11 import LLOYD_ITERS
        from pyspark.sql import functions as F2

        got = {
            r["vec_id"]: (r["cluster"], r["d"])
            for r in streaming_kmeans_assign(spark, SF_SMALL).collect()
        }
        vecs = _quantized(spark, SF_SMALL)
        cents = _init_centroids(vecs)
        for _ in range(LLOYD_ITERS):
            assigned = _assign_int(vecs, cents)
            g = (
                assigned.select(
                    "cluster", F2.posexplode("qv").alias("dim0", "v")
                )
                .groupBy("cluster", "dim0")
                .agg(F2.sum("v").alias("s"), F2.count(F2.lit(1)).alias("n"))
                .select(
                    "cluster",
                    "dim0",
                    F2.floor(F2.col("s").cast("double") / F2.col("n")).alias("c"),
                )
            )
            cents = g.groupBy("cluster").agg(
                F2.transform(
                    F2.array_sort(F2.collect_list(F2.struct("dim0", "c"))),
                    lambda x: x["c"],
                ).alias("cv")
            )
        d = F2.aggregate(
            F2.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F2.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        batch = {
            r["vec_id"]: (r["cluster"], r["d"])
            for r in vecs.crossJoin(F2.broadcast(cents))
            .select("vec_id", "cluster", d.alias("d"))
            .groupBy("vec_id")
            .agg(F2.min(F2.struct("d", "cluster")).alias("m"))
            .select(
                "vec_id",
                F2.col("m.cluster").alias("cluster"),
                F2.col("m.d").alias("d"),
            )
            .collect()
        }
        assert got == batch


class TestKMeansInertia:
    def test_monotone_descent_on_real_corpus(self, spark):
        got = sorted(
            cluster_kmeans_inertia(spark, SF_SMALL).collect(),
            key=lambda r: r["iter"],
        )
        assert [r["iter"] for r in got] == [1, 2, 3]
        vals = [r["inertia"] for r in got]
        assert vals[0] >= vals[1] >= vals[2]
        assert all(r["monotone_ok"] for r in got)

    def test_planted_pairs_converge_after_first_update(self, spark):
        """Tight pairs: after the first centroid update every vector
        sits delta from its pair-mean centroid, so iterations 2 and 3
        have identical inertia (converged) and iteration 1's is
        strictly larger (each 'right' point started 2*delta from its
        init centroid)."""
        rows = []
        for j in range(K_CLUSTERS):
            center = 0.1 * j
            rows.append((j, [float(np.float32(center - 0.001))] + [0.0] * 63, j))
            rows.append((8 + j, [float(np.float32(center + 0.001))] + [0.0] * 63, j))
        d = _write_embeddings(spark, rows)
        got = sorted(
            cluster_kmeans_inertia(spark, d).collect(), key=lambda r: r["iter"]
        )
        vals = [r["inertia"] for r in got]
        assert vals[0] > vals[1] == vals[2]
        assert all(r["monotone_ok"] for r in got)


class TestLDiversity:
    def test_homogeneous_class_flagged(self, spark):
        """A class whose rows all belong to ONE user is k-anonymous at
        k=3 but l=1 — exactly the leak l-diversity exposes."""
        import datetime as dt

        def ts(day, h):
            return dt.datetime(2024, 3, day, h, 0, 0)

        rows = [
            # 3 events, one user -> l=1, not diverse
            (1, ts(1, 1), 7, "view", 1.0, "{}"),
            (2, ts(1, 2), 7, "view", 1.0, "{}"),
            (3, ts(1, 3), 7, "view", 1.0, "{}"),
            # 3 events, 3 users -> l=3, diverse
            (4, ts(2, 1), 1, "click", 1.0, "{}"),
            (5, ts(2, 2), 2, "click", 1.0, "{}"),
            (6, ts(2, 3), 3, "click", 1.0, "{}"),
        ]
        d = tempfile.mkdtemp(prefix="llm11_ev_")
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        got = {
            (r["event_type"], r["day"]): r
            for r in governance_l_diversity(spark, d).collect()
        }
        assert got[("view", "2024-03-01")]["l"] == 1
        assert not got[("view", "2024-03-01")]["diverse_ok"]
        assert got[("click", "2024-03-02")]["l"] == 3
        assert got[("click", "2024-03-02")]["diverse_ok"]


class TestMMRRerank:
    def test_near_duplicate_demoted_for_diversity(self, spark):
        """The second-most-relevant candidate is a near-copy of the
        first pick, so MMR's sim penalty pushes it BEHIND a less
        relevant but diverse candidate — the behavior plain top-k
        cannot produce."""

        def vec(*pairs):
            v = [0.0] * 64
            for i, x in pairs:
                v[i] = x
            return v

        rows = [
            (0, vec((0, 1.0)), 0),                      # the query
            (1, vec((0, 0.9), (1, 0.1)), 0),            # top relevance
            (2, vec((0, 0.89), (1, 0.11)), 0),          # near-dup of 1
            (3, vec((0, 0.5), (2, 0.8)), 0),            # diverse
        ]
        d = _write_embeddings(spark, rows)
        got = sorted(
            retrieval_mmr_rerank(spark, d).collect(), key=lambda r: r["step"]
        )
        assert [r["vec_id"] for r in got] == [1, 3, 2]

    def test_numpy_greedy_replay_picks_same_sequence(self, spark):
        """Independent replay of the whole pipeline in numpy (same
        6-dp rounding, same tie-breaks) selects the identical id
        sequence on real sf0.001 data — a third engine agreeing with
        Spark and the DuckDB oracle. (Note MMR scores need NOT be
        monotone: a NEGATIVE max-cosine to the selected set is a
        diversity BONUS, observed on this corpus.)"""
        import pandas as pd

        emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
        vecs = {
            int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()
        }
        q = vecs[0]

        def cos(a, b):
            return round(
                float(np.dot(a, b))
                / (float(np.sqrt(np.dot(a, a))) * float(np.sqrt(np.dot(b, b)))),
                6,
            )

        rel = {i: cos(q, v) for i, v in vecs.items() if i != 0}
        pool = sorted(rel, key=lambda i: (-rel[i], i))[:20]
        sel = []
        for _ in range(MMR_K):
            best = None
            for i in pool:
                if i in sel:
                    continue
                pen = max(cos(vecs[i], vecs[j]) for j in sel) if sel else 0.0
                sc = round(0.5 * rel[i], 6) if not sel else round(
                    0.5 * rel[i] - 0.5 * pen, 6
                )
                key = (-sc, i)
                if best is None or key < best[0]:
                    best = (key, i)
            sel.append(best[1])

        got = sorted(
            retrieval_mmr_rerank(spark, SF_SMALL).collect(),
            key=lambda r: r["step"],
        )
        assert [r["step"] for r in got] == list(range(1, MMR_K + 1))
        assert [r["vec_id"] for r in got] == sel


class TestPCAPowerIteration:
    def test_single_axis_corpus_recovers_that_axis(self, spark):
        """Vectors living entirely on axis 7 make the Gram matrix a
        single nonzero entry, so one iteration lands exactly on e_7:
        loading[7] = 1.0, every other loading exactly 0.0, and the
        scale factor equals the exact Gram entry Σ q²."""
        vals = [0.25, -0.5, 0.125, 0.3]
        rows = []
        for i, c in enumerate(vals):
            v = [0.0] * DIM
            v[6] = float(np.float32(c))  # dim 7, 1-based
            rows.append((i, v, 0))
        d = _write_embeddings(spark, rows)
        out = {r["dim"]: r for r in embedding_pca_power_iteration(spark, d).collect()}
        assert out[7]["loading"] == 1.0
        assert all(out[k]["loading"] == 0.0 for k in out if k != 7)
        expect_lambda = float(sum(_q(c) ** 2 for c in vals))
        assert out[7]["lambda_scaled"] == expect_lambda

    def test_bit_exact_against_pure_python_fold(self, spark):
        """The whole pipeline replicated as plain Python floats (same
        quantization, same left-fold order, same max-abs normalization)
        must match every emitted double BIT-FOR-BIT — the JL-projection
        exactness discipline."""
        rng = np.random.RandomState(7)
        mat = rng.uniform(-0.4, 0.4, size=(12, DIM)).astype(np.float32)
        rows = [
            (i, [float(x) for x in mat[i]], 0) for i in range(mat.shape[0])
        ]
        d = _write_embeddings(spark, rows)
        out = {r["dim"]: r for r in embedding_pca_power_iteration(spark, d).collect()}

        qvs = [[_q(float(x)) for x in mat[i]] for i in range(mat.shape[0])]
        m = [
            [float(sum(q[i] * q[j] for q in qvs)) for j in range(DIM)]
            for i in range(DIM)
        ]
        v = [1.0] * DIM
        for _ in range(PCA_ITERS):
            w = []
            for i in range(DIM):
                acc = 0.0
                for j in range(DIM):
                    acc = acc + m[i][j] * v[j]
                w.append(acc)
            s = max(abs(x) for x in w)
            v = [x / s for x in w]
        for i in range(DIM):
            assert out[i + 1]["loading"] == v[i], i
            assert out[i + 1]["lambda_scaled"] == s


class TestLangidEvalMetrics:
    def test_metric_identities_on_real_corpus(self, spark):
        """Per-class counts reconcile with the underlying predictions:
        Σ n_docs == Σ n_predicted == |held-out set|, accuracy equals
        Σ n_correct / Σ n_docs, and every F1 is the harmonic mean of
        its rounded precision/recall."""
        rows = eval_langid_metrics(spark, SF_SMALL).collect()
        n_docs = sum(r["n_docs"] for r in rows)
        n_pred = sum(r["n_predicted"] for r in rows)
        n_corr = sum(r["n_correct"] for r in rows)
        assert n_docs == n_pred > 0
        acc = rows[0]["accuracy"]
        assert acc == round(n_corr / n_docs, 6)
        for r in rows:
            assert 0 <= r["n_correct"] <= min(r["n_docs"], max(r["n_predicted"], r["n_correct"]))
            if r["f1"] is not None:
                p, q = r["prec"], r["rec"]
                assert r["f1"] == round(2 * p * q / (p + q), 6)


class TestMMRNdcg:
    def test_ndcg_bounds_and_identity_on_real_corpus(self, spark):
        """NDCG lies in (0, 1]; it equals dcg/idcg of the emitted
        components; and diversity_cost is its complement. A diversified
        list can only lose relevance vs the ideal ordering, never
        gain."""
        row = eval_mmr_ndcg(spark, SF_SMALL).collect()[0]
        assert row["k"] == 5
        assert 0 < row["ndcg"] <= 1.0
        assert row["dcg"] <= row["idcg"]
        assert abs(row["ndcg"] - round(row["dcg"] / row["idcg"], 6)) <= 1e-6
        assert abs(row["diversity_cost"] - round(1 - row["dcg"] / row["idcg"], 6)) <= 1e-6

    def test_ndcg_is_one_when_diversity_costs_nothing(self, spark):
        """Mutually near-orthogonal candidates: the sim penalty never
        reorders anything, MMR picks the pure-relevance top-5, and
        NDCG == 1.0 exactly."""

        def vec(i, x):
            v = [0.0] * 64
            v[i] = x
            return v

        rows = [(0, vec(0, 1.0), 0)]
        # candidates on distinct axes: relevance 0 to the query except a
        # small shared component; pairwise sims ~0
        for j in range(1, 10):
            v = [0.0] * 64
            v[0] = float(np.float32(0.5 - 0.02 * j))  # graded relevance
            v[j] = 1.0  # orthogonal identity component
            rows.append((j, v, 0))
        d = _write_embeddings(spark, rows)
        row = eval_mmr_ndcg(spark, d).collect()[0]
        assert row["ndcg"] == 1.0
        assert row["diversity_cost"] == 0.0


class TestKAnonymity:
    def test_small_classes_suppress_and_reaggregate(self, spark):
        """A class of 6 survives; two singleton classes collapse into
        the fully-generalized ('*','*',-1) row with their summed
        count."""
        rows = [(i, f"t{i}", "en", "web", 100) for i in range(6)]
        rows += [(10, "a", "fr", "web", 9_999), (11, "b", "de", "cc", 50)]
        d = _write_docs(spark, rows)
        got = {
            (r["lang_o"], r["source_o"], r["len_bucket_o"]): r
            for r in governance_k_anonymity(spark, d).collect()
        }
        assert got[("en", "web", 0)]["n"] == 6
        assert not got[("en", "web", 0)]["suppressed"]
        assert got[("*", "*", -1)]["n"] == 2
        assert got[("*", "*", -1)]["suppressed"]
        assert len(got) == 2

    def test_boundary_class_exactly_k_survives(self, spark):
        rows = [(i, f"t{i}", "en", "web", 100) for i in range(K_ANON)]
        d = _write_docs(spark, rows)
        got = governance_k_anonymity(spark, d).collect()
        assert len(got) == 1 and not got[0]["suppressed"]


class TestRound6Replica:
    def test_driver_round_matches_spark_round_on_adversarial_grid(self, spark):
        """_round6_like_spark must be BIT-identical to F.round(x, 6) —
        including shortest-repr ties (…5 at the 7th decimal), negatives,
        and values whose exact binary expansion disagrees with their
        shortest decimal repr (the 2.675-style cases)."""
        import numpy as np

        from rust_ruuvitag_etl_spark.plans.llm11 import _round6_like_spark

        rng = np.random.RandomState(7)
        vals = [float(x) for x in rng.uniform(-1, 1, 400)]
        vals += [float(x) * 0.5 for x in rng.uniform(-1, 1, 200)]
        # constructed half-way points at the 7th decimal, both signs
        vals += [i * 1e-7 + 5e-8 for i in range(-20, 20)]
        vals += [2.675e-1, -2.675e-1, 0.0, -0.0, 1.0, -1.0, 0.1234565, -0.1234565]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = {
            r["x"]: r["r"]
            for r in df.select("x", F.round("x", 6).alias("r")).collect()
        }
        for v in vals:
            assert _round6_like_spark(v) == got[v], (
                v, repr(v), _round6_like_spark(v), got[v]
            )
