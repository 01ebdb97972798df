"""Round-10 wave 5 — lexical diversity, rank correlation, and graph
mixing:

* lexical diversity (`text_lexical_diversity`): type-token ratio plus
  the unbiased Simpson diversity index per document — the vocabulary-
  richness quality signal (template spam scores near 0, natural prose
  near 1) computed as EXACT rationals;
* Spearman rank correlation (`stat_spearman_rank_corr`): does document
  length predict quality score? Tie-exact average ranks via the
  doubled-rank class trick (the stat_mann_whitney_u machinery), Pearson
  on the integer rank vectors with DECIMAL moment sums;
* degree assortativity (`graph_degree_assortativity`): Newman's r over
  the co-purchase graph — do high-degree parts co-occur with
  high-degree parts? One edge pass over exact integer degree moments.

Float discipline: same contract as waves 1-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from ._dedup_oracles import _QUALITY_SQL
from .registry import query

# --- lexical diversity ----------------------------------------------------------

_DIVERSITY_ORACLE = """
WITH toks AS (
    SELECT doc_id, lang,
           string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
ex AS (SELECT doc_id, lang, unnest(t) AS token FROM toks),
tc AS (
    SELECT doc_id, lang, token, CAST(COUNT(*) AS BIGINT) AS c
    FROM ex GROUP BY doc_id, lang, token
),
d AS (
    SELECT doc_id, lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c * (c - 1)) AS BIGINT) AS rep2
    FROM tc GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_tokens, n_types,
       CAST((n_types * 2000000 + n_tokens) // (2 * n_tokens) AS DOUBLE)
           / 1000000.0 AS ttr,
       CAST(((n_tokens * (n_tokens - 1) - rep2) * 2000000
             + n_tokens * (n_tokens - 1))
            // (2 * n_tokens * (n_tokens - 1)) AS DOUBLE)
           / 1000000.0 AS simpson
FROM d WHERE n_tokens >= 2
"""


@query("text_lexical_diversity", oracle=_DIVERSITY_ORACLE)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio and the
    UNBIASED Simpson index 1 - sum(c_i(c_i-1)) / (n(n-1)) — the
    probability two sampled token positions hold different words.
    Repetitive template text scores near 0, natural prose near 1; this
    is the cheap diversity signal quality classifiers consume (the
    Gopher repetition gates measure the complementary n-gram axis).

    Exactness: counts are exact integers; both ratios are exact
    rationals rounded HALF-UP in integer micro-units with one exact
    division each (n(n-1) stays int64 up to 3e9-token documents).
    Documents with fewer than 2 tokens are excluded (the index is
    undefined at n < 2).

    Scale posture: one scan-local explode into a map-side combinable
    groupBy((doc, token)), then a groupBy(doc) — both uniform-keyed;
    zero joins."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    ex = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "token"
        ),
    )
    tc = ex.groupBy("doc_id", "lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    d = tc.groupBy("doc_id", "lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("rep2"),
    )
    return d.filter(F.col("n_tokens") >= 2).select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_types",
        (
            F.expr(
                "CAST((n_types * 2000000 + n_tokens)"
                " DIV (2 * n_tokens) AS DOUBLE)"
            )
            / F.lit(1000000.0)
        ).alias("ttr"),
        (
            F.expr(
                "CAST(((n_tokens * (n_tokens - 1) - rep2) * 2000000"
                " + n_tokens * (n_tokens - 1))"
                " DIV (2 * n_tokens * (n_tokens - 1)) AS DOUBLE)"
            )
            / F.lit(1000000.0)
        ).alias("simpson"),
    )


# --- Spearman rank correlation ---------------------------------------------------

# Tie-exact average ranks via score classes: a class of g members whose
# predecessors total cum_before has average rank (2*cum_before + g +
# 1)/2 — kept as the INTEGER doubled rank r2 = 2*cum_before + g + 1.
# Spearman rho is then Pearson over the integer (rx2, ry2) vectors;
# every moment accumulates as DECIMAL(38,0) (N * (2N)^2-scale products
# wrap int64 past ~1M docs), and rho is one double expression over the
# exact moments, identical on both engines.
_SPEARMAN_ORACLE = f"""
WITH {_QUALITY_SQL},
d AS (
    SELECT doc_id, LENGTH(text) AS x,
           CAST(ROUND(q * 10000) AS BIGINT) AS y
    FROM qscore JOIN documents USING (doc_id)
),
xr AS (
    SELECT x, 2 * (CAST(SUM(g) OVER (ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - g) + g + 1 AS rx2
    FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS g FROM d GROUP BY x)
),
yr AS (
    SELECT y, 2 * (CAST(SUM(g) OVER (ORDER BY y
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - g) + g + 1 AS ry2
    FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS g FROM d GROUP BY y)
),
r AS (
    SELECT xr.rx2, yr.ry2 FROM d JOIN xr USING (x) JOIN yr USING (y)
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(rx2 AS DECIMAL(38,0))) AS sx,
           SUM(CAST(ry2 AS DECIMAL(38,0))) AS sy,
           SUM(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS sxx,
           SUM(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS syy,
           SUM(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS sxy
    FROM r
)
SELECT n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS spearman_rho
FROM m
"""


@query("stat_spearman_rank_corr", oracle=_SPEARMAN_ORACLE)
def stat_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document LENGTH and quality
    score over the whole corpus — the monotone-association audit run
    before using length as a cheap quality proxy (Pearson on raw
    values is hostage to outliers; Spearman is the robust standard).
    Tie-exact average ranks via doubled-rank integers (see the module
    constant's comment); rho is an UN-rounded double over exact
    DECIMAL moments.

    Scale posture: two map-side-combinable class-count groupBys, two
    |class|-row prefix windows (bounded by the value quantum, not the
    corpus), two uniform equi-joins back, and ONE moment-aggregate
    row. No corpus-sized window exists."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        F.length("text").cast("long").alias("x"),
        F.round(tf.quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("y"),
    ).localCheckpoint(eager=True)  # feeds both class counts + join back

    def rank2(col: str, out: str) -> DataFrame:
        g = d.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("g"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return g.select(
            col,
            (
                2 * (F.sum("g").over(w).cast("long") - F.col("g"))
                + F.col("g")
                + 1
            ).alias(out),
        )

    r = d.join(F.broadcast(rank2("x", "rx2")), "x").join(
        F.broadcast(rank2("y", "ry2")), "y"
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("rx2")).alias("sx"),
        F.sum(dec("ry2")).alias("sy"),
        F.sum(dec("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(dec("ry2") * F.col("ry2")).alias("syy"),
        F.sum(dec("rx2") * F.col("ry2")).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    dd_ = lambda c: F.col(c).cast("double")  # noqa: E731
    rho = (n_d * dd_("sxy") - dd_("sx") * dd_("sy")) / F.sqrt(
        (n_d * dd_("sxx") - dd_("sx") * dd_("sx"))
        * (n_d * dd_("syy") - dd_("sy") * dd_("sy"))
    )
    return m.select("n", rho.alias("spearman_rho"))


# --- degree assortativity ---------------------------------------------------------

_ASSORT_ORACLE = """
WITH pairs AS (
    SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                    GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
    SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS x FROM pairs UNION ALL SELECT v FROM pairs
    ) GROUP BY x
),
ends AS (
    SELECT du.d AS dx, dv.d AS dy
    FROM pairs JOIN deg du ON du.x = pairs.u JOIN deg dv ON dv.x = pairs.v
    UNION ALL
    SELECT dv.d AS dx, du.d AS dy
    FROM pairs JOIN deg du ON du.x = pairs.u JOIN deg dv ON dv.x = pairs.v
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m2,
           SUM(CAST(dx AS DECIMAL(38,0))) AS sx,
           SUM(CAST(dx AS DECIMAL(38,0)) * dx) AS sxx,
           SUM(CAST(dx AS DECIMAL(38,0)) * dy) AS sxy
    FROM ends
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       m2 // 2 AS n_edges,
       (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS assortativity
FROM m
"""


@query("graph_degree_assortativity", oracle=_ASSORT_ORACLE)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Newman's degree assortativity of the part co-purchase graph:
    the Pearson correlation of endpoint degrees over all directed edge
    ends — positive r means hubs link to hubs (assortative mixing),
    negative means hub-and-spoke. The one-number mixing summary read
    before trusting degree-based sampling or partitioning heuristics
    on a graph.

    Exactness: degrees are exact integer counts; by symmetry the
    directed-ends moments satisfy sum(dx)=sum(dy), sum(dx^2)=sum(dy^2),
    so three DECIMAL(38,0) moment sums (no int64 wrap at any graph
    size) determine r; the final expression is one identical-op double
    quotient.

    Scale posture: the edge build is the adjudicated triangle-count
    shape (one groupBy(order) + in-row pair explode, fan-out bounded
    by order size); degrees are one map-side-combinable groupBy; the
    degree join-back is two uniform equi-joins on node id; the moment
    aggregate is one row. The edge list localCheckpoints so the
    degree pass and the end-pair pass share one materialization."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    grp = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    edges = (
        grp.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ps, (x, i) -> transform("
                        "slice(ps, i + 2, size(ps) - i - 1),"
                        " y -> struct(x as u, y as v)))"
                    )
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=True)  # feeds n_nodes + both join sides
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    joined = edges.join(du, "u").join(dv, "v")
    ends = joined.select(
        F.col("du").alias("dx"), F.col("dv").alias("dy")
    ).unionAll(
        joined.select(F.col("dv").alias("dx"), F.col("du").alias("dy"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ends.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum(dec("dx")).alias("sx"),
        F.sum(dec("dx") * F.col("dx")).alias("sxx"),
        F.sum(dec("dx") * F.col("dy")).alias("sxy"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    m2_d = F.col("m2").cast("double")
    r = (
        m2_d * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) / (
        m2_d * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return m.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        F.expr("m2 DIV 2").alias("n_edges"),
        r.alias("assortativity"),
    )


# --- hard-negative mining (contrastive training data) ---------------------------

_HARDNEG_ORACLE = """
WITH q AS (
    SELECT vec_id AS query_id, label AS query_label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id < 5
),
c AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
    FROM embeddings
),
scored AS (
    SELECT q.query_id, q.query_label, c.vec_id, c.label AS neg_label,
           ROUND(list_sum(list_transform(range(1, len(qv) + 1),
                     i -> qv[i] * cv[i]))
                 / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                    * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6)
               AS cosine
    FROM q, c WHERE c.label <> q.query_label
),
ranked AS (
    SELECT query_id, query_label, vec_id, neg_label, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
    FROM scored
)
SELECT query_id, query_label, vec_id, neg_label, cosine, rank
FROM ranked WHERE rank <= 5
"""


@query("similarity_hard_negatives", oracle=_HARDNEG_ORACLE)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-5 MOST similar corpus vectors with a DIFFERENT
    label — the negatives that actually teach an embedding model,
    sampled by every retrieval/rerank training pipeline. Same
    brute-force shape as similarity_bruteforce_topk (queries
    broadcast, corpus streams, per-partition partial top-k) with the
    label-mismatch predicate applied BEFORE ranking so positives never
    occupy shortlist slots; the production scale path swaps the scan
    for the persisted IVF index probe with the same filter, exactly as
    the ANN family documents."""
    em = dd.spread(load(spark, sf_dir, "embeddings"))
    q = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("_qvec"),
    )
    from ..functions import vectors as vf

    scored = (
        em.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "vec_id",
            F.col("label").alias("neg_label"),
            F.round(
                vf.cosine(F.col("embedding"), F.col("_qvec")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "query_label", "vec_id", "neg_label", "cosine",
            "rank",
        )
    )
