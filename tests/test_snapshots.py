"""Tests for the versioned-snapshot table layer
(sources/snapshots.py): atomic commits, time travel, rollback,
optimistic-concurrency conflicts, and vacuum reclamation.
"""

from __future__ import annotations

import os

import pytest

from rust_ruuvitag_etl_spark.sources import snapshots as sn


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


class TestCommitAndTimeTravel:
    def test_append_lineage(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        v0 = sn.commit(_df(spark, 0, 10), t)
        v1 = sn.commit(_df(spark, 10, 15), t)
        assert (v0, v1) == (0, 1)
        assert sn.read_snapshot(spark, t).count() == 15
        # time travel: version 0 still shows the pre-append world
        assert sn.read_snapshot(spark, t, version=0).count() == 10
        ids = {r["id"] for r in sn.read_snapshot(spark, t).collect()}
        assert ids == set(range(15))

    def test_overwrite_starts_fresh(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 10), t)
        sn.commit(_df(spark, 100, 103), t, mode="overwrite")
        assert sn.read_snapshot(spark, t).count() == 3
        assert sn.read_snapshot(spark, t, version=0).count() == 10

    def test_history_records_operations(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 5), t)
        sn.commit(_df(spark, 5, 9), t)
        sn.commit(_df(spark, 0, 2), t, mode="overwrite")
        h = sn.history(t)
        assert [x["version"] for x in h] == [0, 1, 2]
        assert [x["operation"] for x in h] == [
            "append", "append", "overwrite",
        ]
        assert [x["n_segments"] for x in h] == [1, 2, 1]
        assert [x["parent"] for x in h] == [None, 0, 1]

    def test_read_empty_table_raises(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no committed versions"):
            sn.read_snapshot(spark, str(tmp_path / "none"))


class TestConcurrencyAndAtomicity:
    def test_version_race_loser_conflicts(self, spark, tmp_path, monkeypatch):
        """Two writers based on the same parent: the loser's exclusive
        manifest create ('x' mode) must fail atomically, leaving the
        winner's data intact and the loser's segment invisible. The
        race window (winner publishes between the loser's parent read
        and its create) is simulated by freezing the loser's view of
        the current version."""
        import json

        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 5), t)
        # Winner publishes v1 ...
        winner = sn._load_manifest(t, 0)
        winner.update({"version": 1, "parent": 0})
        with open(sn._manifest_path(t, 1), "x") as f:
            json.dump(winner, f)
        # ... but the loser still believes the table is at v0.
        monkeypatch.setattr(sn, "current_version", lambda table: 0)
        with pytest.raises(sn.CommitConflict, match="concurrently"):
            sn.commit(_df(spark, 5, 9), t)
        monkeypatch.undo()
        # the loser's orphan segment exists on disk but is invisible
        assert sn.read_snapshot(spark, t).count() == 5
        assert len(os.listdir(os.path.join(t, "data"))) == 2

    def test_expected_version_pins_parent(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 5), t)
        with pytest.raises(sn.CommitConflict, match="expected"):
            sn.commit(_df(spark, 5, 9), t, expected_version=7)
        sn.commit(_df(spark, 5, 9), t, expected_version=0)
        assert sn.read_snapshot(spark, t).count() == 9

    def test_orphan_segment_reclaimed_by_vacuum(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 5), t)
        # orphan: a segment written by a commit that never published
        orphan = str(tmp_path / "tbl" / "data" / "deadbeef")
        _df(spark, 90, 95).write.parquet(orphan)
        deleted = sn.vacuum(t, keep_last=1)
        assert deleted == [os.path.join("data", "deadbeef")]
        assert sn.read_snapshot(spark, t).count() == 5


class TestRollbackAndVacuum:
    def test_rollback_restores_without_deleting(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 10), t)
        sn.commit(_df(spark, 10, 20), t)
        v2 = sn.rollback(t, 0)
        assert v2 == 2
        assert sn.read_snapshot(spark, t).count() == 10
        # the rolled-back-over version stays readable (audit trail)
        assert sn.read_snapshot(spark, t, version=1).count() == 20
        assert sn.history(t)[-1]["operation"] == "rollback_to_0"

    def test_vacuum_keeps_referenced_segments(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 10), t)     # seg A
        sn.commit(_df(spark, 10, 20), t)    # seg B (v1 = A+B)
        sn.commit(_df(spark, 50, 53), t, mode="overwrite")  # seg C
        deleted = sn.vacuum(t, keep_last=1)
        # v2 references only C: A and B reclaimed, older manifests gone
        assert len(deleted) == 2
        assert sn._versions(t) == [2]
        assert sn.read_snapshot(spark, t).count() == 3

    def test_vacuum_retains_time_travel_window(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        sn.commit(_df(spark, 0, 10), t)
        sn.commit(_df(spark, 10, 20), t)
        sn.commit(_df(spark, 50, 53), t, mode="overwrite")
        deleted = sn.vacuum(t, keep_last=2)
        # v1 (A+B) and v2 (C) retained -> nothing reclaimable
        assert deleted == []
        assert sn.read_snapshot(spark, t, version=1).count() == 20

    def test_vacuum_keep_last_validated(self, tmp_path):
        with pytest.raises(ValueError):
            sn.vacuum(str(tmp_path), keep_last=0)
