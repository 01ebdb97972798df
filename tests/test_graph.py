"""Semantics tests for plans/graph.py on hand-built event graphs where
the expected PageRank fixed-point values and BFS distances are known by
construction. The registry-level differential (test_registry)
separately hash-checks both queries against DuckDB on driver testdata.
"""

from __future__ import annotations

import datetime as dt

from rust_ruuvitag_etl_spark.plans.graph import (
    _INF,
    _S,
    graph_bfs_hops,
    graph_pagerank_bipartite,
)


def _write_events(spark, tmp_path, interactions):
    """interactions: (user_id, event_type) pairs; duplicates allowed —
    the graph must collapse them to one edge."""
    rows = [
        (i + 1, dt.datetime(2024, 3, 4, 10, 0, i % 60), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(interactions)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


class TestPageRank:
    def test_star_hub_dominates_and_mass_is_conserved(self, spark, tmp_path):
        # 4 users all touching only 'purchase': a 5-node star. The hub
        # ('t:purchase') must out-rank every leaf; total rank mass stays
        # ~S (integer floors lose at most a few units per node).
        sf = _write_events(
            spark, tmp_path, [(u, "purchase") for u in (1, 2, 3, 4)]
        )
        got = {
            r["node"]: r["rank_scaled"]
            for r in graph_pagerank_bipartite(spark, sf).collect()
        }
        assert len(got) == 5
        hub = got["t:purchase"]
        leaves = [v for k, v in got.items() if k != "t:purchase"]
        assert all(hub > leaf for leaf in leaves)
        # Star symmetry: all leaves identical.
        assert len(set(leaves)) == 1
        assert abs(sum(got.values()) - _S) < 100
        # Closed form for the 3-iteration damped star with N=5:
        # leaves hold r_u = 0.03 + 0.85 * r_hub / 4 at each step.
        s = _S
        r_hub, r_leaf = s // 5, s // 5
        for _ in range(3):
            base = 15 * s // (100 * 5)
            new_hub = base + 85 * (4 * (r_leaf // 1)) // 100
            new_leaf = base + 85 * (r_hub // 4) // 100
            r_hub, r_leaf = new_hub, new_leaf
        assert got["t:purchase"] == r_hub
        assert leaves[0] == r_leaf

    def test_duplicate_interactions_collapse(self, spark, tmp_path):
        # user 1 firing 'view' 10× must weigh the same as firing once.
        sf_a = _write_events(
            spark, str(tmp_path) + "/a", [(1, "view")] * 10 + [(2, "view")]
        )
        sf_b = _write_events(
            spark, str(tmp_path) + "/b", [(1, "view"), (2, "view")]
        )
        a = sorted(
            (r["node"], r["rank_scaled"])
            for r in graph_pagerank_bipartite(spark, sf_a).collect()
        )
        b = sorted(
            (r["node"], r["rank_scaled"])
            for r in graph_pagerank_bipartite(spark, sf_b).collect()
        )
        assert a == b


class TestBfsHops:
    def test_hop_distances_and_unreachable_exclusion(self, spark, tmp_path):
        # Component A: users 1,2 touch purchase; user 2 also touches
        # view. Component B: user 9 touches only error (unreachable
        # from t:purchase).
        sf = _write_events(
            spark,
            tmp_path,
            [(1, "purchase"), (2, "purchase"), (2, "view"), (9, "error")],
        )
        got = {r["node"]: r["hops"] for r in graph_bfs_hops(spark, sf).collect()}
        assert got == {
            "t:purchase": 0,
            "u:1": 1,
            "u:2": 1,
            "t:view": 2,
        }
        assert "u:9" not in got and "t:error" not in got

    def test_iteration_horizon(self, spark, tmp_path):
        # A path longer than _BFS_ITERS hops stays unreached: chain
        # purchase -u1- view -u2- click -u3- signup -u4- error is
        # 8 hops to t:error > 4 iterations.
        sf = _write_events(
            spark,
            tmp_path,
            [
                (1, "purchase"),
                (1, "view"),
                (2, "view"),
                (2, "click"),
                (3, "click"),
                (3, "signup"),
                (4, "signup"),
                (4, "error"),
            ],
        )
        got = {r["node"]: r["hops"] for r in graph_bfs_hops(spark, sf).collect()}
        assert got["u:2"] == 3
        assert got["t:click"] == 4
        # 5+ hops away: beyond the fixed horizon.
        assert "u:3" not in got and "t:error" not in got
        assert all(h <= 4 for h in got.values())
        assert _INF not in got.values()


class TestTextRank:
    def test_cooccurrence_window_and_ranking(self, spark, tmp_path):
        from rust_ruuvitag_etl_spark.plans.graph import text_keyword_pagerank

        # 'hub' co-occurs with every other word; the others only ever
        # see 'hub' and one neighbor → hub must rank first.
        docs = spark.createDataFrame(
            [
                (1, "aa hub bb", "en", "t", 9),
                (2, "cc hub dd", "en", "t", 9),
                (3, "ee hub ff", "en", "t", 9),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        rows = text_keyword_pagerank(spark, str(tmp_path)).collect()
        assert rows[0]["keyword"] == "hub"
        assert all(rows[0]["rank_scaled"] > r["rank_scaled"] for r in rows[1:])
        # Window is 2: 'aa'-'bb' are linked (distance 2), so every
        # token appears in the graph; 7 nodes total.
        assert len(rows) == 7

    def test_window_excludes_distance_three(self, spark, tmp_path):
        from rust_ruuvitag_etl_spark.plans.graph import text_keyword_pagerank

        # 'xx' and 'yy' are 3 apart: no edge between them; with only
        # one doc of 4 tokens every token still enters via closer
        # neighbors.
        docs = spark.createDataFrame(
            [(1, "xx p q yy", "en", "t", 9)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        rows = {
            r["keyword"]: r["rank_scaled"]
            for r in text_keyword_pagerank(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {"xx", "p", "q", "yy"}
        # Symmetric layout: xx/yy have degree 2 each (p,q for xx? no:
        # xx links p (d1) and q (d2); yy links q (d1) and p (d2)) and
        # p/q have degree 3 — p and q must out-rank xx and yy equally.
        assert rows["p"] == rows["q"]
        assert rows["xx"] == rows["yy"]
        assert rows["p"] > rows["xx"]
