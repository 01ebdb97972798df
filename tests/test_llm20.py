"""Round-10 wave 5: lexical diversity, Spearman, assortativity."""

from rust_ruuvitag_etl_spark.plans.llm20 import (
    graph_degree_assortativity,
    stat_spearman_rank_corr,
    text_lexical_diversity,
)

SF_SMALL = "/root/testdata/sf0.001"


class TestLexicalDiversity:
    def test_bounds(self, spark):
        rows = text_lexical_diversity(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert 2 <= r["n_types"] or r["n_types"] >= 1
            assert r["n_types"] <= r["n_tokens"]
            assert 0.0 < r["ttr"] <= 1.0
            assert 0.0 <= r["simpson"] <= 1.0

    def test_all_distinct_doc_scores_one(self, spark):
        df = spark.createDataFrame(
            [(1, "en", "src", "alpha beta gamma delta")],
            "doc_id long, lang string, source string, text string",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
            got = text_lexical_diversity(spark, d).collect()[0]
        assert got["ttr"] == 1.0
        assert got["simpson"] == 1.0  # no repeated token pair


class TestSpearman:
    def test_rho_in_range(self, spark):
        r = stat_spearman_rank_corr(spark, SF_SMALL).collect()[0]
        assert r["n"] > 0
        assert -1.0 <= r["spearman_rho"] <= 1.0


class TestAssortativity:
    def test_r_in_range_and_counts(self, spark):
        r = graph_degree_assortativity(spark, SF_SMALL).collect()[0]
        assert r["n_nodes"] > 0
        assert r["n_edges"] > 0
        assert -1.0 <= r["assortativity"] <= 1.0


class TestHardNegatives:
    def test_negatives_exclude_query_label(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm20 import (
            similarity_hard_negatives,
        )

        rows = similarity_hard_negatives(spark, SF_SMALL).collect()
        assert len(rows) == 25  # 5 queries x top-5
        for r in rows:
            assert r["neg_label"] != r["query_label"]
            assert 1 <= r["rank"] <= 5
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for rs in by_q.values():
            rs.sort(key=lambda r: r["rank"])
            cosines = [r["cosine"] for r in rs]
            assert cosines == sorted(cosines, reverse=True)


class TestImageDedupBands:
    def test_planted_pairs_found_exactly(self, spark):
        from rust_ruuvitag_etl_spark.plans.llm22 import (
            _IMG_COPY_MOD,
            dedup_image_bands,
        )
        from rust_ruuvitag_etl_spark.sources import load
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        rows = dedup_image_bands(spark, sf).collect()
        planted = (
            load(spark, sf, "events")
            .filter(F.col("event_id") % _IMG_COPY_MOD == 0)
            .select("event_id")
            .distinct()
            .count()
        )
        # every planted copy pairs with its original (wrap case aside,
        # which would reduce the count; none at this sf)
        assert len(rows) == planted
        for r in rows:
            # copy ids live in the negative keyspace: -(base + 1), so
            # the copy always sorts first (id_a) and never collides
            # with a base event_id at any scale factor
            assert r["id_a"] == -(r["id_b"] + 1)
            assert 0 < r["l1"] <= 3
