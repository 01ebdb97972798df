"""Round-9 wave 4 — distribution-drift detection and decayed feature
engineering:

* two-sample Kolmogorov-Smirnov drift audit (`stat_ks_two_sample`):
  per SOURCE, the KS distance between that source's quality-score
  distribution and the rest of the corpus — the per-feed drift gate a
  pipeline owner runs before admitting a crawl batch (KL divergence is
  already covered corpus-wide by `corpus_drift_kl`; KS is the
  classical distribution-free two-sample test with a critical value);
* time-decayed user value (`user_time_decayed_value`): the classic
  feature-store aggregate sum(value * 0.9^age_days) — recency-weighted
  engagement — computed in EXACT integer arithmetic via a plan-time
  literal decay table (no pow() in either engine).

Float discipline (same contract as llm14): both statistics are
integer-exact up to one final division; the only doubles are embedded
literals and single correctly-rounded ops identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from ._dedup_oracles import _QUALITY_SQL
from .registry import query

# --- two-sample KS drift -----------------------------------------------------

# Asymptotic critical coefficient at alpha = 0.05 (Smirnov):
# D_crit = 1.358 * sqrt((n + m) / (n * m)).
_KS_C_ALPHA = "1.358"

_KS_ORACLE = f"""
WITH {_QUALITY_SQL},
d AS (SELECT source, CAST(ROUND(q * 10000) AS BIGINT) AS s4 FROM qscore),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM d GROUP BY source),
cls AS (SELECT DISTINCT s4 FROM d),
sc AS (
    SELECT source, s4, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1, 2
),
gc AS (SELECT s4, CAST(COUNT(*) AS BIGINT) AS g FROM d GROUP BY 1),
spine AS (SELECT src.source, src.n_s, cls.s4 FROM src CROSS JOIN cls),
cum AS (
    SELECT sp.source, sp.n_s, sp.s4,
           CAST(SUM(COALESCE(sc.c, 0)) OVER (
               PARTITION BY sp.source ORDER BY sp.s4) AS BIGINT) AS cum_s,
           CAST(SUM(COALESCE(gc.g, 0)) OVER (
               PARTITION BY sp.source ORDER BY sp.s4) AS BIGINT) AS cum_all
    FROM spine sp
    LEFT JOIN sc ON sc.source = sp.source AND sc.s4 = sp.s4
    LEFT JOIN gc ON gc.s4 = sp.s4
),
ks AS (
    SELECT cum.source, cum.n_s, tot.n - cum.n_s AS n_r,
           CAST(MAX(ABS((tot.n - cum.n_s) * cum_s
                        - cum.n_s * (cum_all - cum_s))) AS BIGINT) AS ks_num
    FROM cum, tot
    GROUP BY cum.source, cum.n_s, tot.n
)
SELECT source, n_s, n_r,
       ROUND(CAST(ks_num AS DOUBLE) / (n_s * n_r), 6) AS ks,
       ROUND(CAST({_KS_C_ALPHA} AS DOUBLE)
             * sqrt(CAST(n_s + n_r AS DOUBLE) / CAST(n_s * n_r AS DOUBLE)),
             6) AS ks_critical,
       (CAST(ks_num AS DOUBLE) / (n_s * n_r))
           > (CAST({_KS_C_ALPHA} AS DOUBLE)
              * sqrt(CAST(n_s + n_r AS DOUBLE)
                     / CAST(n_s * n_r AS DOUBLE))) AS drifted
FROM ks
"""


@query("stat_ks_two_sample", oracle=_KS_ORACLE)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift audit per SOURCE: the KS
    distance between each source's quality-score distribution and the
    REST of the corpus, with the alpha=0.05 Smirnov critical value
    1.358*sqrt((n+m)/nm) and a drifted flag — the distribution-free
    per-feed gate run before admitting a crawl batch into the mix
    (`corpus_drift_kl` is the corpus-wide KL complement).

    Exactness: scores become integer ten-thousandths; both empirical
    CDFs stay integer COUNTS on a shared score-class spine, and the KS
    numerator cross-multiplies to the exact integer
    max_j |n_rest*C_s(j) - n_s*C_rest(j)| (C_rest = C_all - C_s, so one
    global CDF serves every source). One final division per source;
    sqrt is a single correctly-rounded op on identical operands.

    Scale posture: one scan-local score projection into two map-side
    combinable groupBys ((source, score-class) and score-class); the
    spine, cumulative windows (PARTITIONED by source, |classes| rows
    each), and the max-fold all run at |sources| x |score classes|
    cardinality; the global CDF and 1-row total broadcast."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        "source",
        F.round(tf.quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("s4"),
    )
    sc = d.groupBy("source", "s4").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)  # class cardinality; feeds 4 consumers
    src = sc.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    gc = sc.groupBy("s4").agg(F.sum("c").cast("long").alias("g"))
    cls = sc.select("s4").distinct()
    tot = sc.agg(F.sum("c").cast("long").alias("n"))
    spine = src.crossJoin(F.broadcast(cls))
    w = Window.partitionBy("source").orderBy("s4")
    cum = (
        spine.join(sc, ["source", "s4"], "left")
        .join(F.broadcast(gc), "s4", "left")
        .select(
            "source",
            "n_s",
            "s4",
            F.sum(F.coalesce(F.col("c"), F.lit(0).cast("long")))
            .over(w)
            .cast("long")
            .alias("cum_s"),
            F.sum(F.coalesce(F.col("g"), F.lit(0).cast("long")))
            .over(w)
            .cast("long")
            .alias("cum_all"),
        )
    )
    gap = F.abs(
        (F.col("n") - F.col("n_s")) * F.col("cum_s")
        - F.col("n_s") * (F.col("cum_all") - F.col("cum_s"))
    )
    ks = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s", "n")
        .agg(F.max(gap).cast("long").alias("ks_num"))
        .select(
            "source",
            "n_s",
            (F.col("n") - F.col("n_s")).alias("n_r"),
            "ks_num",
        )
    )
    ks_val = F.col("ks_num").cast("double") / (F.col("n_s") * F.col("n_r"))
    crit = F.lit(float(_KS_C_ALPHA)) * F.sqrt(
        (F.col("n_s") + F.col("n_r")).cast("double")
        / (F.col("n_s") * F.col("n_r")).cast("double")
    )
    return ks.select(
        "source",
        "n_s",
        "n_r",
        F.round(ks_val, 6).alias("ks"),
        F.round(crit, 6).alias("ks_critical"),
        (ks_val > crit).alias("drifted"),
    )


# --- time-decayed user value ---------------------------------------------------

# 0.9^age for age 0..30 days as plan-time integer literals scaled by
# 1e6 (ages past the horizon decay to the age-30 weight): the decay
# product value_cents * decay_e6 and its per-user sum stay EXACT int64,
# with one final division back to value units. Headroom: at value <=
# $10k (v100 <= 1e6) each term is <= 1e12, so the per-user int64 sum is
# exact up to ~9e6 events per user — far past any real per-user event
# count; the previous 1e9 scale overflowed at ~9e4 events, tighter than
# the "EXACT int64" claim implied. Both engines share these integer
# weights, so the ~5e-7 relative quantization of 0.9^a is part of the
# operator's defined semantics, not an engine divergence.
_DECAY_HORIZON = 30
_DECAY_E6 = [round(0.9**a * 1_000_000) for a in range(_DECAY_HORIZON + 1)]

_DECAY_CASE_SQL = (
    "CASE LEAST(age, 30) "
    + " ".join(f"WHEN {a} THEN {w}" for a, w in enumerate(_DECAY_E6))
    + " END"
)

_DECAY_ORACLE = f"""
WITH anchor AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS mx FROM events),
e AS (
    SELECT user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS v100,
           datediff('day', CAST(ts AS DATE), CAST(anchor.mx AS DATE)) AS age
    FROM events, anchor
),
wgt AS (
    SELECT user_id, v100 * ({_DECAY_CASE_SQL}) AS wv FROM e
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(wv) AS BIGINT) AS decayed_num,
       CAST(CASE WHEN SUM(wv) < 0 THEN -((-SUM(wv) + 50) // 100)
                 ELSE (SUM(wv) + 50) // 100 END AS DOUBLE)
           / 1000000.0 AS decayed_value
FROM wgt GROUP BY user_id
"""


@query("user_time_decayed_value", oracle=_DECAY_ORACLE)
def user_time_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted user engagement — the feature-store classic
    sum(value * 0.9^age_days) per user, anchored at the corpus's max
    event time, with ages past 30 days pinned to the 30-day weight
    (a decay floor; beyond it the signal is noise anyway).

    No pow() anywhere: the 31 decay weights are PLAN-TIME integer
    literals (0.9^a scaled by 1e6, precomputed in Python and rendered
    identically into the oracle SQL), so every weighted value and each
    user's sum is EXACT int64 arithmetic; the report value rounds
    HALF-UP to 6 dp in integer micro-units before the single final
    division — float-summation order cannot matter and no double is
    ever ROUNDed (tie-safe on both engines).

    Scale posture: the anchor is a 1-row max broadcast; weighting is
    scan-local (a 31-arm integer CASE inside codegen); the single
    corpus-scale shuffle is the map-side-combinable groupBy(user_id)."""
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("timestamp")).alias("mx"))
    decay = F.element_at(
        F.array(*[F.lit(w).cast("long") for w in _DECAY_E6]),
        (F.least(F.col("age"), F.lit(_DECAY_HORIZON)) + 1).cast("int"),
    )
    e = (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("v100"),
            F.datediff(
                F.col("mx").cast("date"), F.col("ts").cast("date")
            ).alias("age"),
        )
        .select("user_id", (F.col("v100") * decay).alias("wv"))
    )
    agg = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("wv").cast("long").alias("decayed_num"),
    )
    # HALF-UP to 6 dp in integer arithmetic (micro-units), THEN one
    # correctly-rounded division: a double ROUND(sum/1e8, 6) diverges
    # between engines when the quotient lands on a 7th-digit tie (Spark
    # rounds the shortest decimal repr, DuckDB the raw binary).
    micro = F.when(
        F.col("decayed_num") < 0,
        -F.expr("(-decayed_num + 50) DIV 100"),
    ).otherwise(F.expr("(decayed_num + 50) DIV 100"))
    return agg.select(
        "user_id",
        "n_events",
        "decayed_num",
        (micro.cast("double") / F.lit(1000000.0)).alias("decayed_value"),
    )


# --- inter-rater agreement (Cohen's kappa) ---------------------------------------

# Two independent in-engine language classifiers over the SAME held-out
# split: rater A = the character-trigram model (text_langid_trigram's
# plan, lifted verbatim), rater B = a word-unigram twin (top-50 words
# per language from the same train split). kappa reduces to exact
# integers: with N rated docs, agree = #(A=B), and the chance-agreement
# numerator pe_num = sum_k a_k*b_k over label marginals,
# kappa = (N*agree - pe_num) / (N^2 - pe_num) — one final division.
_KAPPA_ORACLE = """
WITH d AS (
    SELECT doc_id, lang, lower(trim(text)) AS t FROM documents
),
tri AS (
    SELECT doc_id, lang,
           CASE WHEN length(t) >= 3
                THEN list_transform(range(1, length(t) - 1),
                                    i -> substr(t, i, 3))
                ELSE CAST([] AS VARCHAR[]) END AS tris,
           CASE WHEN trim(t) = '' THEN CAST([] AS VARCHAR[])
                ELSE string_split_regex(trim(t), '\\s+') END AS toks
    FROM d
),
train_a AS (
    SELECT lang, unnest(tris) AS f FROM tri WHERE doc_id % 5 <> 0
),
counts_a AS (SELECT lang, f, COUNT(*) AS n FROM train_a GROUP BY lang, f),
top_a AS (
    SELECT lang AS model_lang, f FROM (
        SELECT lang, f,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, f) AS rn
        FROM counts_a) WHERE rn <= 50
),
train_b AS (
    SELECT lang, unnest(toks) AS f FROM tri WHERE doc_id % 5 <> 0
),
counts_b AS (
    SELECT lang, f, COUNT(*) AS n FROM train_b WHERE f <> '' GROUP BY lang, f
),
top_b AS (
    SELECT lang AS model_lang, f FROM (
        SELECT lang, f,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, f) AS rn
        FROM counts_b) WHERE rn <= 50
),
test_a AS (
    SELECT doc_id, unnest(list_distinct(tris)) AS f
    FROM tri WHERE doc_id % 5 = 0
),
test_b AS (
    SELECT doc_id, unnest(list_distinct(toks)) AS f
    FROM tri WHERE doc_id % 5 = 0
),
pred_a AS (
    SELECT doc_id, model_lang AS pa FROM (
        SELECT te.doc_id, top_a.model_lang,
               row_number() OVER (PARTITION BY te.doc_id
                   ORDER BY COUNT(*) DESC, top_a.model_lang) AS rn
        FROM test_a te JOIN top_a ON te.f = top_a.f
        GROUP BY te.doc_id, top_a.model_lang) WHERE rn = 1
),
pred_b AS (
    SELECT doc_id, model_lang AS pb FROM (
        SELECT te.doc_id, top_b.model_lang,
               row_number() OVER (PARTITION BY te.doc_id
                   ORDER BY COUNT(*) DESC, top_b.model_lang) AS rn
        FROM test_b te JOIN top_b ON te.f = top_b.f
        GROUP BY te.doc_id, top_b.model_lang) WHERE rn = 1
),
j AS (
    SELECT a.doc_id, a.pa, b.pb FROM pred_a a JOIN pred_b b USING (doc_id)
),
tots AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN pa = pb THEN 1 ELSE 0 END) AS BIGINT) AS agree
    FROM j
),
ma AS (SELECT pa AS lab, CAST(COUNT(*) AS BIGINT) AS a_k FROM j GROUP BY pa),
mb AS (SELECT pb AS lab, CAST(COUNT(*) AS BIGINT) AS b_k FROM j GROUP BY pb),
pe AS (
    SELECT CAST(SUM(ma.a_k * mb.b_k) AS BIGINT) AS pe_num
    FROM ma JOIN mb ON ma.lab = mb.lab
)
SELECT tots.n, tots.agree,
       ROUND(CAST(tots.agree AS DOUBLE) / tots.n, 6) AS p_observed,
       ROUND(CAST(pe.pe_num AS DOUBLE) / (tots.n * tots.n), 6) AS p_expected,
       CASE WHEN tots.n * tots.n = pe.pe_num THEN NULL
            ELSE ROUND(CAST(tots.n * tots.agree - pe.pe_num AS DOUBLE)
                       / CAST(tots.n * tots.n - pe.pe_num AS DOUBLE), 6)
            END AS kappa
FROM tots, pe
"""


def _langid_predictions(
    feats: DataFrame, feat_col: str, out_col: str
) -> DataFrame:
    """Shared train->predict shape of text_langid_trigram over an
    arbitrary feature-array column: learn each language's top-50
    features from the 80% train split, predict held-out docs by
    distinct-feature hits, argmax with (hits DESC, lang ASC) ties."""
    train = feats.filter(F.col("doc_id") % 5 != 0).select(
        "lang", F.explode(feat_col).alias("f")
    ).filter(F.col("f") != "")
    counts = train.groupBy("lang", "f").agg(F.count(F.lit(1)).alias("n"))
    w_model = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("f"))
    top = (
        counts.withColumn("rn", F.row_number().over(w_model))
        .filter(F.col("rn") <= 50)
        .select(F.col("lang").alias("model_lang"), "f")
    )
    test = feats.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.explode(F.array_distinct(feat_col)).alias("f")
    )
    w_pred = Window.partitionBy("doc_id").orderBy(
        F.desc("hits"), F.asc("model_lang")
    )
    return (
        test.join(F.broadcast(top), "f")
        .groupBy("doc_id", "model_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
        .withColumn("rn", F.row_number().over(w_pred))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("model_lang").alias(out_col))
    )


_TRIGRAMS_EXPR = (
    "CASE WHEN length(t) >= 3 "
    "THEN transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) "
    "ELSE array() END"
)


@query("eval_cohens_kappa", oracle=_KAPPA_ORACLE)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement (Cohen, 1960) between TWO independent
    in-engine language classifiers on the same held-out split: rater A
    is the character-trigram model (text_langid_trigram's exact plan
    shape), rater B a word-unigram twin trained on the same 80% split.
    kappa = (p_o - p_e)/(1 - p_e) corrects raw agreement for chance —
    the audit run before treating two cheap classifiers as redundant
    signals in an ensemble gate (high kappa = the second model adds
    little; near zero = genuinely independent evidence).

    Exactness: with N co-rated docs, agreement and both label marginals
    stay integer counts, and kappa cross-multiplies to
    (N*agree - sum_k a_k*b_k) / (N^2 - sum_k a_k*b_k) — exact int64
    numerator/denominator, ONE final division (NULL when the
    denominator is zero, i.e. chance agreement is total). The oracle
    lifts the trigram plan verbatim and replays the unigram twin and
    the kappa algebra.

    Scale posture: both classifiers are the audited langid shape —
    corpus-scale work is explode -> map-side-combinable (lang, feature)
    groupBys; models are |langs| x 50 broadcasts; per-doc argmax
    windows are PARTITIONED by doc_id; everything after the doc-level
    join is label-cardinality arithmetic on 1-row broadcasts."""
    d = dd.spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "lang", F.lower(F.trim("text")).alias("t")
    )
    feats = d.select(
        "doc_id",
        "lang",
        F.expr(_TRIGRAMS_EXPR).alias("tris"),
        tf.ws_tokens(F.col("t")).alias("toks"),
    ).localCheckpoint(eager=True)  # feeds both raters' train AND test
    pa = _langid_predictions(feats, "tris", "pa")
    pb = _langid_predictions(feats, "toks", "pb")
    j = pa.join(pb, "doc_id").localCheckpoint(eager=True)
    tots = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pa") == F.col("pb"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    ma = j.groupBy(F.col("pa").alias("lab")).agg(
        F.count(F.lit(1)).cast("long").alias("a_k")
    )
    mb = j.groupBy(F.col("pb").alias("lab")).agg(
        F.count(F.lit(1)).cast("long").alias("b_k")
    )
    pe = ma.join(mb, "lab").agg(
        F.sum(F.col("a_k") * F.col("b_k")).cast("long").alias("pe_num")
    )
    return tots.crossJoin(F.broadcast(pe)).select(
        "n",
        "agree",
        F.round(F.col("agree").cast("double") / F.col("n"), 6).alias(
            "p_observed"
        ),
        F.round(
            F.col("pe_num").cast("double") / (F.col("n") * F.col("n")), 6
        ).alias("p_expected"),
        F.when(
            F.col("n") * F.col("n") == F.col("pe_num"), F.lit(None)
        )
        .otherwise(
            F.round(
                (F.col("n") * F.col("agree") - F.col("pe_num")).cast(
                    "double"
                )
                / (F.col("n") * F.col("n") - F.col("pe_num")).cast(
                    "double"
                ),
                6,
            )
        )
        .alias("kappa"),
    )


# --- two-proportion A/B z-test ---------------------------------------------------

# z_alpha/2 at 95% two-sided, embedded as the exact double literal.
_AB_Z_CRIT = "1.959963984540054"

_AB_ZTEST_ORACLE = f"""
WITH u AS (
    SELECT user_id,
           CAST(user_id % 2 AS INTEGER) AS variant,
           MAX(CASE WHEN event_type = 'purchase' AND value > 450.0
                    THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY user_id
),
g AS (
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(converted) AS BIGINT) AS conv
    FROM u GROUP BY variant
),
w AS (
    SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
    FROM g a, g b WHERE a.variant = 0 AND b.variant = 1
)
SELECT n_a, conv_a, n_b, conv_b,
       ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
       ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN NULL
            ELSE ROUND((CAST(conv_a AS DOUBLE) / n_a
                        - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (CAST(n_a + n_b AS DOUBLE)
                       / CAST(n_a * n_b AS DOUBLE))), 6) END AS z,
       CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
            THEN FALSE
            ELSE ABS((CAST(conv_a AS DOUBLE) / n_a
                      - CAST(conv_b AS DOUBLE) / n_b)
           / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (CAST(n_a + n_b AS DOUBLE)
                     / CAST(n_a * n_b AS DOUBLE))))
           > CAST({_AB_Z_CRIT} AS DOUBLE) END AS significant
FROM w
"""


@query("stat_ab_conversion_ztest", oracle=_AB_ZTEST_ORACLE)
def stat_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic A/B split: users are
    assigned by id parity (the hash-bucket assignment every experiment
    platform uses, reproducible across engines and reruns), conversion
    is "ever made a high-value (> 450) purchase", and the pooled-variance z statistic with the
    95% two-sided critical value flags significance — the readout of
    an experiment framework, here as one exact relational plan over the
    events stream (an A/A-shaped split on this corpus, so the expected
    verdict is NOT significant — the framework's null calibration).

    Exactness: per-variant user and conversion counts are exact
    integers; every ratio in z is a single division of identically
    derived doubles, the pooled term 1/n_a + 1/n_b is algebraically
    rewritten to (n_a+n_b)/(n_a*n_b) so it too is ONE division of exact
    int64 operands, and sqrt is one correctly-rounded op — z matches
    bit-for-bit before the final 6-dp round. The critical value is an
    embedded double literal, identical in both engines.

    Scale posture: one map-side-combinable groupBy(user_id) collapses
    the event stream to per-user conversion flags, one groupBy(variant)
    collapses users to TWO rows; the join of the two variant rows is
    trivially broadcast."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 450.0),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    g = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    ).localCheckpoint(eager=True)  # 2 rows; feeds both variant branches
    a = g.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = g.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    w = a.crossJoin(F.broadcast(b))
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_a - rate_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            (F.col("n_a") + F.col("n_b")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        )
    )
    degenerate = (
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b"))
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(z) > F.lit(float(_AB_Z_CRIT)))
        .alias("significant"),
    )
