"""Tests for the round-6 llm8 additions: content-defined chunking
dedup semantics on constructed documents (the registry differential
separately hash-checks dedup_cdc_shifted against its SQL oracle on the
driver corpora).
"""

from __future__ import annotations

from rust_ruuvitag_etl_spark.plans.llm8 import (
    _CDC_OFFSET,
    dedup_cdc_shifted,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )


class TestCdcShifted:
    def test_shifted_copy_resynchronizes(self, spark, tmp_path):
        """The CDC core claim: a planted 3-token-shifted copy of a long
        document shares >= half its chunks with the original (the chunk
        stream re-synchronizes at the first content-defined boundary
        after the insertion), so the pair surfaces with planted=True —
        while an unrelated document of the same length pairs with
        nothing."""
        long_a = " ".join(f"alpha{i}tok{i * 3}" for i in range(120))
        long_b = " ".join(f"omega{i}val{i * 5}" for i in range(120))
        assert len(long_a) >= 200 and len(long_b) >= 200
        _write_docs(spark, tmp_path, [(0, long_a), (1, long_b)])
        got = dedup_cdc_shifted(spark, str(tmp_path)).collect()
        pairs = {(r["id_a"], r["id_b"]): r for r in got}
        assert (0, _CDC_OFFSET) in pairs
        assert pairs[(0, _CDC_OFFSET)]["planted"]
        # unrelated docs share no chunks
        assert (0, 1) not in pairs
        assert all(
            {r["id_a"], r["id_b"]} != {1} and (0, 1) != (r["id_a"], r["id_b"])
            for r in got
        )

    def test_short_docs_not_planted(self, spark, tmp_path):
        """Documents under the 200-char floor get no planted copy (a
        doc shorter than one chunk has no interior boundary to
        re-synchronize at), so no planted pair can appear."""
        short = "tiny doc with few tokens"
        _write_docs(spark, tmp_path, [(7, short)])
        got = dedup_cdc_shifted(spark, str(tmp_path)).collect()
        assert got == []

    def test_fixed_segments_would_miss_what_cdc_finds(self, spark, tmp_path):
        """Contrast pin: the planted pair's shared chunks all lie AFTER
        the insertion point, i.e. at shifted byte offsets — exactly the
        evidence fixed-offset segmentation loses. n_shared must be >= 2
        (several re-synchronized chunks), not just one lucky tail."""
        long_a = " ".join(f"w{i}x{i * 7}y{i * 11}" for i in range(200))
        _write_docs(spark, tmp_path, [(0, long_a)])
        got = dedup_cdc_shifted(spark, str(tmp_path)).collect()
        row = next(
            r for r in got if (r["id_a"], r["id_b"]) == (0, _CDC_OFFSET)
        )
        assert row["n_shared"] >= 2
