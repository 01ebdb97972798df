"""Round-9 extension families — the data-governance / data-selection
surfaces a 100 TB training-data pipeline still lacked:

* weighted SAMPLING with an unbiased estimator
  (`sample_priority_weighted`): priority sampling (Duffield, Lund &
  Thorup, JACM 2007) — deterministic hash-derived uniforms so the draw
  is reproducible AND oracle-diffable, top-k by priority, and the
  Horvitz-Thompson `max(w, tau)` per-item weight estimate;
* domain MIXTURE rebalancing (`corpus_domain_mixture`): the
  temperature-resampling (alpha = 0.5) language-share computation every
  multilingual pretraining mix runs (cf. the sampling-exponent mixes in
  mC4/XLM-R training);
* t-CLOSENESS (`governance_t_closeness`): the third classic
  privacy-audit gate after round 7's k-anonymity / l-diversity — per
  quasi-identifier class, Earth Mover's Distance between the class's
  ordered sensitive-attribute distribution and the global one
  (Li, Li & Venkatasubramanian, ICDE 2007);
* calibration EVALUATION (`eval_calibration_ece`): 10-bin Expected
  Calibration Error of the heuristic quality score against the
  majority-language label — the audit run before a score's magnitude
  (not just its ranking, round-9 `eval_quality_auc` covers that) gates
  data selection.

Float discipline (the module's common trick): every statistic is
assembled in INTEGER or fixed-point arithmetic (4-dp score units,
account-balance cents, EMD numerators cross-multiplied to integers) or
in single IEEE-deterministic ops (one cast, one divide, one sqrt —
correctly rounded on both engines), with ONE final round — so the
DuckDB oracle matches bit-for-bit with no float-summation-order hazard.

Scale posture (100 TB): every corpus-scale stage is a scan-local
projection feeding a map-side-combinable hash groupBy; all joins after
the first aggregate are broadcast joins against class-cardinality
build sides (score bins, languages, QI classes, the 65-row sample
head); no per-document window functions anywhere in the module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from ._dedup_oracles import _QUALITY_SQL
from .registry import query

# DuckDB twin of functions.text.token_count for NON-empty-trim guards:
# string_split_regex('') returns [''] (len 1), Spark's ws_tokens('')
# returns [] — so every oracle below either filters trim(text) <> '' or
# wraps the count in this CASE.
_TOKC_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)

# --- priority sampling ---------------------------------------------------------

K_SAMPLE = 64

_PRIORITY_ORACLE = f"""
WITH d AS (
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS weight,
           {tf.h60_sql("CAST(doc_id AS VARCHAR)")} AS h
    FROM documents WHERE trim(text) <> ''
),
p AS (
    SELECT doc_id, weight,
           CAST(weight AS DOUBLE)
           / ((CAST(h AS DOUBLE) + 1.0) / 1152921504606846976.0) AS priority
    FROM d
),
top AS (
    SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT {K_SAMPLE + 1}
),
r AS (
    SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
    FROM top
),
tau AS (
    SELECT COALESCE(MAX(CASE WHEN rn = {K_SAMPLE + 1} THEN priority END),
                    0.0) AS tau
    FROM r
)
SELECT r.doc_id, r.weight, r.priority, tau.tau AS tau,
       GREATEST(CAST(r.weight AS DOUBLE), tau.tau) AS est_weight
FROM r, tau WHERE r.rn <= {K_SAMPLE}
"""


@query("sample_priority_weighted", oracle=_PRIORITY_ORACLE)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup, JACM 2007): draw a
    size-64 token-weighted document sample with per-item
    Horvitz-Thompson weight estimates `max(w, tau)` — the scheme that
    lets a pipeline estimate any token-weighted corpus statistic from a
    fixed-size sample with provably near-minimal variance. The uniform
    is hash-derived (portable md5-based h60 of doc_id), so the draw is
    reproducible across runs AND engines: priority = w / u with
    u = (h + 1) / 2^60 in (0, 1] is one int-to-double cast, one add,
    one EXACT power-of-two scaling, and one divide — all
    correctly-rounded IEEE ops, hence bit-identical in Spark and
    DuckDB with NO transcendentals (the exponential-key variant of
    weighted sampling needs ln/pow, which are not cross-engine
    deterministic; the priority form needs only division). The 2^60
    scaling puts the threshold tau in WEIGHT units, which is what
    makes max(w, tau) the Horvitz-Thompson per-item estimate.

    Scale posture: weights and priorities are scan-local projections;
    the only corpus-scale operation is a distributed top-(k+1) —
    TakeOrderedAndProject, per-partition heaps, never a global sort.
    The 65-row head is checkpointed once and everything downstream
    (rank, threshold tau, HT estimates) runs on it driver-free with a
    broadcast of the 1-row tau."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    p = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        tf.token_count(F.col("text")).alias("weight"),
        (
            tf.token_count(F.col("text")).cast("double")
            / (
                (
                    tf.h60(F.col("doc_id").cast("string")).cast("double")
                    + F.lit(1.0)
                )
                / F.lit(float(1 << 60))
            )
        ).alias("priority"),
    )
    top = (
        p.orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(K_SAMPLE + 1)
        .localCheckpoint(eager=True)  # 65 rows; feeds rank AND tau
    )
    w = Window.orderBy(F.desc("priority"), F.asc("doc_id"))
    r = top.withColumn("rn", F.row_number().over(w))
    tau = r.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == K_SAMPLE + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("tau")
    )
    return (
        r.filter(F.col("rn") <= K_SAMPLE)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id",
            "weight",
            "priority",
            "tau",
            F.greatest(F.col("weight").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )


# --- domain mixture rebalancing -------------------------------------------------

_MIXTURE_ORACLE = f"""
WITH d AS (SELECT lang, {_TOKC_SQL} AS n_tokens FROM documents),
g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
    FROM d GROUP BY lang
),
s AS (
    SELECT lang, n_docs, lang_tokens,
           CAST(ROUND(sqrt(CAST(lang_tokens AS DOUBLE)), 6)
                AS DECIMAL(28,6)) AS sq
    FROM g
),
tot AS (
    SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(sq) AS DECIMAL(38,6)) AS total_sq
    FROM s
)
SELECT s.lang, s.n_docs, s.lang_tokens,
       ROUND(CAST(s.lang_tokens AS DOUBLE)
             / CAST(tot.total_tokens AS DOUBLE), 6) AS share,
       ROUND(CAST(s.sq AS DOUBLE) / CAST(tot.total_sq AS DOUBLE), 6)
           AS temp_share,
       ROUND((CAST(s.sq AS DOUBLE) / CAST(tot.total_sq AS DOUBLE))
             / (CAST(s.lang_tokens AS DOUBLE)
                / CAST(tot.total_tokens AS DOUBLE)), 6) AS multiplier
FROM s, tot
"""


@query("corpus_domain_mixture", oracle=_MIXTURE_ORACLE)
def corpus_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled language-mixture weights (alpha = 0.5):
    per language, the natural token share p_d and the rebalanced target
    share q_d ∝ sqrt(tokens_d) — the upsampling exponent multilingual
    pretraining uses to keep low-resource languages from vanishing
    (the alpha-sampling mix of mC4/XLM-R) — plus the per-language
    sampling multiplier q_d / p_d a repetition-based sampler applies.

    Cross-engine float discipline: token totals are exact integers;
    sqrt is a single correctly-rounded IEEE op, rounded to 6 dp and
    summed as DECIMAL (exact on both engines); every share is then ONE
    double division of identically-derived operands, rounded once.

    Scale posture: one scan-local token-count projection into a
    map-side-combinable groupBy(lang); everything after runs on the
    |languages|-row table with a broadcast of the 1-row totals."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    g = (
        docs.select("lang", tf.token_count(F.col("text")).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("lang_tokens"),
        )
    )
    s = g.select(
        "lang",
        "n_docs",
        "lang_tokens",
        F.round(F.sqrt(F.col("lang_tokens").cast("double")), 6)
        .cast("decimal(28,6)")
        .alias("sq"),
    ).localCheckpoint(eager=True)  # |languages| rows; feeds totals AND shares
    tot = s.agg(
        F.sum("lang_tokens").cast("long").alias("total_tokens"),
        F.sum("sq").cast("decimal(38,6)").alias("total_sq"),
    )
    share = F.col("lang_tokens").cast("double") / F.col("total_tokens").cast(
        "double"
    )
    temp_share = F.col("sq").cast("double") / F.col("total_sq").cast("double")
    return s.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        F.round(share, 6).alias("share"),
        F.round(temp_share, 6).alias("temp_share"),
        F.round(temp_share / share, 6).alias("multiplier"),
    )


# --- t-closeness ----------------------------------------------------------------

# Ordered sensitive attribute: account balance in 10 fixed-width
# buckets over the generator's [-1000, 10000) range, from exact cents.
_N_BUCKETS = 10

_TCLOSE_ORACLE = f"""
WITH c AS (
    SELECT c_nationkey, c_mktsegment,
           LEAST({_N_BUCKETS - 1},
                 CAST(FLOOR((CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)
                            / 110000.0) AS BIGINT)) AS bucket
    FROM customer
),
cls AS (
    SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_class
    FROM c GROUP BY 1, 2
),
cb AS (
    SELECT c_nationkey, c_mktsegment, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_cb
    FROM c GROUP BY 1, 2, 3
),
gb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_gb FROM c GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
dense AS (
    SELECT cls.c_nationkey, cls.c_mktsegment, cls.n_class, r.bucket,
           COALESCE(cb.n_cb, 0) AS n_cb, COALESCE(gb.n_gb, 0) AS n_gb
    FROM cls
    CROSS JOIN range(0, {_N_BUCKETS}) r(bucket)
    LEFT JOIN cb ON cb.c_nationkey = cls.c_nationkey
               AND cb.c_mktsegment = cls.c_mktsegment
               AND cb.bucket = r.bucket
    LEFT JOIN gb ON gb.bucket = r.bucket
),
cum AS (
    SELECT c_nationkey, c_mktsegment, n_class, bucket,
           CAST(SUM(n_cb) OVER (PARTITION BY c_nationkey, c_mktsegment
                                ORDER BY bucket) AS BIGINT) AS cum_c,
           CAST(SUM(n_gb) OVER (PARTITION BY c_nationkey, c_mktsegment
                                ORDER BY bucket) AS BIGINT) AS cum_g
    FROM dense
)
SELECT cum.c_nationkey, cum.c_mktsegment, cum.n_class,
       CAST(SUM(ABS(tot.n * cum_c - n_class * cum_g)) AS BIGINT) AS emd_num,
       ROUND(CAST(SUM(ABS(tot.n * cum_c - n_class * cum_g)) AS DOUBLE)
             / (n_class * tot.n * {_N_BUCKETS - 1}.0), 6) AS t_closeness
FROM cum, tot WHERE bucket <= {_N_BUCKETS - 2}
GROUP BY cum.c_nationkey, cum.c_mktsegment, cum.n_class, tot.n
"""


@query("governance_t_closeness", oracle=_TCLOSE_ORACLE)
def governance_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the privacy gate k-anonymity and l-diversity (round 7) miss: a
    class can be k-anonymous and l-diverse yet still leak because its
    SENSITIVE-VALUE DISTRIBUTION diverges from the corpus's. Per
    quasi-identifier class (nation, market segment), the Earth Mover's
    Distance between the class's account-balance distribution (10
    ordered fixed-width buckets from exact cents) and the global one:
    EMD_ordered = (1/(m-1)) * sum_j |CumClass_j - CumGlobal_j|.

    Exactness: both CDFs stay as integer counts and the absolute
    cumulative gap is cross-multiplied to the common denominator —
    emd_num = sum_j |N*C_j - n_class*G_j| is EXACT integer arithmetic
    (max term ~ N * n_class, far inside int64), with one final double
    division. The oracle replays the identical buckets and algebra.

    Scale posture: one scan-local bucket projection into TWO map-side
    combinable groupBys ((class, bucket) and bucket); the dense
    10-bucket spine, cumulative windows, and the EMD fold all run at
    CLASS cardinality (|nations| x |segments| x 10 rows); the global
    CDF and the 1-row total join in by broadcast."""
    cust = load(spark, sf_dir, "customer")
    c = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.least(
            F.lit(_N_BUCKETS - 1).cast("long"),
            F.floor(
                (F.round(F.col("c_acctbal") * 100).cast("long") + 100000)
                / F.lit(110000.0)
            ),
        ).alias("bucket"),
    ).localCheckpoint(eager=True)  # feeds class, class-bucket, global CDFs
    cb = c.groupBy("c_nationkey", "c_mktsegment", "bucket").agg(
        F.count(F.lit(1)).alias("n_cb")
    )
    cls = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_cb").cast("long").alias("n_class")
    )
    gb = c.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_gb"))
    tot = c.agg(F.count(F.lit(1)).alias("n"))
    spine = cls.select(
        "c_nationkey",
        "c_mktsegment",
        "n_class",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BUCKETS - 1))).alias(
            "bucket"
        ),
    )
    dense = (
        spine.join(cb, ["c_nationkey", "c_mktsegment", "bucket"], "left")
        .join(F.broadcast(gb), "bucket", "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_class",
            "bucket",
            F.coalesce(F.col("n_cb"), F.lit(0)).alias("n_cb"),
            F.coalesce(F.col("n_gb"), F.lit(0)).alias("n_gb"),
        )
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("bucket")
    cum = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "n_class",
        "bucket",
        F.sum("n_cb").over(w).cast("long").alias("cum_c"),
        F.sum("n_gb").over(w).cast("long").alias("cum_g"),
    )
    gap = F.abs(
        F.col("n") * F.col("cum_c") - F.col("n_class") * F.col("cum_g")
    )
    return (
        cum.filter(F.col("bucket") <= _N_BUCKETS - 2)
        .crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_class", "n")
        .agg(
            F.sum(gap).cast("long").alias("emd_num"),
            F.round(
                F.sum(gap).cast("double")
                / (F.col("n_class") * F.col("n") * (_N_BUCKETS - 1.0)),
                6,
            ).alias("t_closeness"),
        )
        .drop("n")
    )


# --- expected calibration error -------------------------------------------------

_ECE_ORACLE = f"""
WITH {_QUALITY_SQL},
lab AS (
    SELECT CAST(ROUND(q * 10000) AS BIGINT) AS conf4,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM qscore
),
g AS (
    SELECT LEAST(9, conf4 // 1000) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_bin,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(conf4) AS BIGINT) AS sum_conf4
    FROM lab GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n_bin) AS BIGINT) AS n,
           CAST(SUM(ABS(n_pos * 10000 - sum_conf4)) AS BIGINT) AS gap_num
    FROM g
)
SELECT g.bin, g.n_bin,
       ROUND(CAST(g.sum_conf4 AS DOUBLE) / (g.n_bin * 10000.0), 6)
           AS avg_conf,
       ROUND(CAST(g.n_pos AS DOUBLE) / g.n_bin, 6) AS accuracy,
       ROUND(CAST(ABS(g.n_pos * 10000 - g.sum_conf4) AS DOUBLE)
             / (g.n_bin * 10000.0), 6) AS gap,
       ROUND(CAST(tot.gap_num AS DOUBLE) / (tot.n * 10000.0), 6) AS ece
FROM g, tot
"""


@query("eval_calibration_ece", oracle=_ECE_ORACLE)
def eval_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error of the heuristic quality score read
    as P(doc is majority-language): 10 equal-width confidence bins,
    per-bin mean confidence vs empirical accuracy, and the
    bin-weighted absolute gap ECE = sum_b (n_b/N)*|acc_b - conf_b| —
    the standard audit (Guo et al., ICML 2017) run before a score's
    MAGNITUDE (not just its ranking — `eval_quality_auc` covers that)
    gates data selection or weighting.

    Exactness: the 4-dp score becomes integer ten-thousandths (conf4),
    so per-bin confidence sums are exact integers and every bin's gap
    numerator |n_pos*10000 - sum_conf4| — and therefore the ECE
    numerator — is EXACT integer arithmetic with one final division.
    n_b cancels in the ECE sum, which is why the oracle's gap_num needs
    no per-bin division at all.

    Scale posture: one scan-local (conf4, label) projection into a
    map-side-combinable groupBy(bin); the 10-row bin table is
    checkpointed once and the 1-row total broadcasts back."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    lab = docs.select(
        F.round(tf.quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("conf4"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    g = (
        lab.select(
            F.least(F.lit(9).cast("long"), F.expr("conf4 div 1000")).alias(
                "bin"
            ),
            "pos",
            "conf4",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_bin"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("conf4").cast("long").alias("sum_conf4"),
        )
        .localCheckpoint(eager=True)  # 10 rows; feeds totals AND per-bin rows
    )
    gap_num = F.abs(F.col("n_pos") * 10000 - F.col("sum_conf4"))
    tot = g.agg(
        F.sum("n_bin").cast("long").alias("n"),
        F.sum(gap_num).cast("long").alias("gap_num"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_bin",
        F.round(
            F.col("sum_conf4").cast("double") / (F.col("n_bin") * 10000.0), 6
        ).alias("avg_conf"),
        F.round(F.col("n_pos").cast("double") / F.col("n_bin"), 6).alias(
            "accuracy"
        ),
        F.round(
            gap_num.cast("double") / (F.col("n_bin") * 10000.0), 6
        ).alias("gap"),
        F.round(
            F.col("gap_num").cast("double") / (F.col("n") * 10000.0), 6
        ).alias("ece"),
    )


# --- Fellegi-Sunter record linkage ----------------------------------------------

# Agreement / disagreement weights: fixed log2(m/u)-style constants in
# integer millibits (x1000) so scores sum exactly. fp (full-content
# fingerprint) dominates, tail and length are strong, language is weak
# (few languages -> high u-probability).
_FS_W = {
    "lang": (800, -1500),
    "len": (1200, -1000),
    "fp": (4000, -300),
    "tail": (2500, -700),
}
_FS_MATCH = 4000  # score >= -> 'match'; >= 0 -> 'possible'; else 'non_match'

_FS_NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

_FS_ORACLE = f"""
WITH n AS (
    SELECT doc_id, source, lang,
           {_FS_NORM_SQL} AS norm,
           {_TOKC_SQL} AS ntok
    FROM documents WHERE trim(text) <> ''
),
f AS (
    SELECT doc_id, source, lang, ntok,
           substr(norm, 1, 24) AS blk,
           md5(norm) AS fp,
           right(norm, 24) AS tail
    FROM n
),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.source AS source_a, b.source AS source_b,
           CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS g_lang,
           CASE WHEN ABS(a.ntok - b.ntok) * 10 <= LEAST(a.ntok, b.ntok)
                THEN 1 ELSE 0 END AS g_len,
           CASE WHEN a.fp = b.fp THEN 1 ELSE 0 END AS g_fp,
           CASE WHEN a.tail = b.tail THEN 1 ELSE 0 END AS g_tail
    FROM f a JOIN f b ON a.blk = b.blk AND a.source < b.source
),
scored AS (
    SELECT id_a, id_b, source_a, source_b,
           CAST(g_lang AS VARCHAR) || CAST(g_len AS VARCHAR)
               || CAST(g_fp AS VARCHAR) || CAST(g_tail AS VARCHAR)
               AS pattern,
           CAST(CASE WHEN g_lang = 1 THEN {_FS_W["lang"][0]}
                     ELSE {_FS_W["lang"][1]} END
              + CASE WHEN g_len = 1 THEN {_FS_W["len"][0]}
                     ELSE {_FS_W["len"][1]} END
              + CASE WHEN g_fp = 1 THEN {_FS_W["fp"][0]}
                     ELSE {_FS_W["fp"][1]} END
              + CASE WHEN g_tail = 1 THEN {_FS_W["tail"][0]}
                     ELSE {_FS_W["tail"][1]} END AS BIGINT) AS score
    FROM pairs
)
SELECT id_a, id_b, source_a, source_b, pattern, score,
       CASE WHEN score >= {_FS_MATCH} THEN 'match'
            WHEN score >= 0 THEN 'possible'
            ELSE 'non_match' END AS decision
FROM scored
"""


@query("linkage_fellegi_sunter", oracle=_FS_ORACLE)
def linkage_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter, JASA 1969) of
    documents ACROSS sources — the entity-resolution step a multi-crawl
    corpus runs before cross-source dedup decisions: block candidate
    pairs on a cheap key (24-char normalized-text prefix), compare four
    fields (language, token count within 10%, full-content
    fingerprint, 24-char tail), and sum fixed integer agreement /
    disagreement weights (millibit log-likelihoods) into a match score
    classified match / possible / non_match. The length test stays
    integer via cross-multiplication (10*|na-nb| <= min(na,nb)).

    Scale posture: ONE corpus-scale shuffle — the self-equi-join on the
    blocking key (never all-pairs; measured block-size max is
    single-digit on this corpus because the key is a high-entropy text
    prefix). Every comparison field is computed scan-local before the
    join, so the join moves (key, 4 small fields), not documents. At
    100 TB the standard escalation applies unchanged: hot blocks get a
    frequency cap exactly like the shingle df cap in
    operators/dedup._prefix_candidates."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    f = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        "source",
        "lang",
        tf.token_count(F.col("text")).alias("ntok"),
        F.substring(norm, 1, 24).alias("blk"),
        F.md5(norm).alias("fp"),
        F.expr(
            "right(lower(trim(regexp_replace(text, '\\\\s+', ' '))), 24)"
        ).alias("tail"),
    )
    a, b = f.alias("a"), f.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.when(F.col("a.lang") == F.col("b.lang"), 1).otherwise(0).alias(
            "g_lang"
        ),
        F.when(
            F.abs(F.col("a.ntok") - F.col("b.ntok")) * 10
            <= F.least(F.col("a.ntok"), F.col("b.ntok")),
            1,
        )
        .otherwise(0)
        .alias("g_len"),
        F.when(F.col("a.fp") == F.col("b.fp"), 1).otherwise(0).alias("g_fp"),
        F.when(F.col("a.tail") == F.col("b.tail"), 1)
        .otherwise(0)
        .alias("g_tail"),
    )
    score = (
        F.when(F.col("g_lang") == 1, _FS_W["lang"][0]).otherwise(
            _FS_W["lang"][1]
        )
        + F.when(F.col("g_len") == 1, _FS_W["len"][0]).otherwise(
            _FS_W["len"][1]
        )
        + F.when(F.col("g_fp") == 1, _FS_W["fp"][0]).otherwise(
            _FS_W["fp"][1]
        )
        + F.when(F.col("g_tail") == 1, _FS_W["tail"][0]).otherwise(
            _FS_W["tail"][1]
        )
    ).cast("long")
    return pairs.select(
        "id_a",
        "id_b",
        "source_a",
        "source_b",
        F.concat(
            F.col("g_lang").cast("string"),
            F.col("g_len").cast("string"),
            F.col("g_fp").cast("string"),
            F.col("g_tail").cast("string"),
        ).alias("pattern"),
        score.alias("score"),
        F.when(score >= _FS_MATCH, "match")
        .when(score >= 0, "possible")
        .otherwise("non_match")
        .alias("decision"),
    )


# --- chi-square independence test -----------------------------------------------

_CHI2_ORACLE = f"""
WITH {_QUALITY_SQL},
lab AS (
    SELECT lang,
           LEAST(4, CAST(ROUND(q * 10000) AS BIGINT) // 2000) AS qb
    FROM qscore
),
cells AS (
    SELECT lang, qb, CAST(COUNT(*) AS BIGINT) AS o FROM lab GROUP BY 1, 2
),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
ct AS (SELECT qb, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (
    SELECT CAST(SUM(o) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT qb) AS BIGINT) AS n_bins
    FROM cells
),
dense AS (
    SELECT rt.lang, ct.qb, rt.r, ct.c, COALESCE(cells.o, 0) AS o
    FROM rt CROSS JOIN ct
    LEFT JOIN cells ON cells.lang = rt.lang AND cells.qb = ct.qb
),
contrib AS (
    SELECT CAST(ROUND(
        (CAST(o AS DOUBLE) * CAST(tot.n AS DOUBLE)
         - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
        * (CAST(o AS DOUBLE) * CAST(tot.n AS DOUBLE)
           - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
        / (CAST(tot.n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)),
        6) AS DECIMAL(28,6)) AS cc
    FROM dense, tot
),
chi AS (SELECT CAST(SUM(cc) AS DOUBLE) AS chi2d FROM contrib)
SELECT tot.n, tot.n_langs, tot.n_bins,
       (tot.n_langs - 1) * (tot.n_bins - 1) AS dof,
       ROUND(chi.chi2d, 6) AS chi2,
       CASE WHEN LEAST(tot.n_langs - 1, tot.n_bins - 1) = 0 THEN 0.0
            ELSE ROUND(sqrt(chi.chi2d
                 / CAST(tot.n * LEAST(tot.n_langs - 1, tot.n_bins - 1)
                        AS DOUBLE)), 6) END AS cramers_v
FROM tot, chi
"""


@query("stat_chi_square_independence", oracle=_CHI2_ORACLE)
def stat_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between language and
    quality-score quintile bucket, plus Cramer's V effect size — the
    bias audit run before a quality filter gates a multilingual corpus
    (a large chi2 means the filter systematically prefers some
    languages; `corpus_domain_mixture` then quantifies the skew).

    Exactness: every cross-product (O*N, R*C, N*R*C) casts its int64
    operands to double BEFORE multiplying — n*r*c in int64 would
    overflow past n ~ 2M documents and o*n past ~3e9, where Spark
    wraps silently while DuckDB raises. The double products are
    correctly-rounded IEEE ops on identical exact-integer operands
    (counts are exact in double up to 2^53), so both engines compute
    bit-identical cell contributions at any corpus size; each rounds
    to 6 dp and sums as DECIMAL (exact, order-free). Zero-count cells
    of the dense lang x bucket spine contribute E exactly like the
    textbook statistic requires.

    Scale posture: one scan-local projection into a map-side
    combinable groupBy((lang, bucket)); marginals, the dense spine
    (|langs| x |buckets| rows), and the fold all run at class
    cardinality; one broadcast of the 1-row totals."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    lab = (
        docs.select("lang", tf.quality_score(F.col("text")).alias("qs"))
        .select(
            "lang",
            F.least(
                F.lit(4).cast("long"),
                F.expr("CAST(ROUND(qs * 10000) AS BIGINT) div 2000"),
            ).alias("qb"),
        )
    )
    cells = (
        lab.groupBy("lang", "qb")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=True)  # class cardinality; feeds 4 consumers
    )
    rt = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    ctc = cells.groupBy("qb").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("qb").alias("n_bins"),
    )
    dense = (
        rt.crossJoin(ctc)
        .join(cells, ["lang", "qb"], "left")
        .select(
            "r", "c", F.coalesce(F.col("o"), F.lit(0).cast("long")).alias("o")
        )
    )
    d = F.col("o").cast("double") * F.col("n").cast("double") - F.col(
        "r"
    ).cast("double") * F.col("c").cast("double")
    contrib = dense.crossJoin(F.broadcast(tot)).select(
        F.round(
            d
            * d
            / (
                F.col("n").cast("double")
                * F.col("r").cast("double")
                * F.col("c").cast("double")
            ),
            6,
        )
        .cast("decimal(28,6)")
        .alias("cc")
    )
    chi = contrib.agg(F.sum("cc").cast("double").alias("chi2d"))
    return tot.crossJoin(F.broadcast(chi)).select(
        "n",
        "n_langs",
        "n_bins",
        ((F.col("n_langs") - 1) * (F.col("n_bins") - 1)).alias("dof"),
        F.round(F.col("chi2d"), 6).alias("chi2"),
        F.when(
            F.least(F.col("n_langs") - 1, F.col("n_bins") - 1) == 0,
            F.lit(0.0),
        )
        .otherwise(
            F.round(
                F.sqrt(
                    F.col("chi2d")
                    / (
                        F.col("n")
                        * F.least(F.col("n_langs") - 1, F.col("n_bins") - 1)
                    ).cast("double")
                ),
                6,
            )
        )
        .alias("cramers_v"),
    )


# --- connected components over the co-purchase graph -----------------------------

_CC_MIN_QTY = 48  # sparse high-quantity subgraph: bounded degree, small comps

_CC_ORACLE = f"""
WITH RECURSIVE h AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    WHERE l_quantity >= {_CC_MIN_QTY}
),
p AS (
    SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
    FROM h a JOIN h b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e0 AS (SELECT DISTINCT id_a, id_b FROM p),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM e0
    UNION
    SELECT id_b, id_a FROM e0
),
reach AS (
    SELECT src AS node, src AS lab FROM edges
    UNION
    SELECT e.dst AS node, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
labels AS (SELECT node, MIN(lab) AS label FROM reach GROUP BY node),
sizes AS (
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM labels GROUP BY label
)
SELECT l.node AS part_key, l.label AS component, s.n_members
FROM labels l JOIN sizes s ON s.label = l.label
"""


@query("graph_connected_components", oracle=_CC_ORACLE)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the high-quantity co-purchase graph
    (parts linked when one order buys >= 48 units of both) — the
    product-affinity clustering behind "bought together" groupings,
    and the graph family's missing fourth surface next to PageRank /
    triangles / BFS. Components are labeled by their minimum part key
    and reported with their size.

    Spark-first: reuses operators/dedup.connected_components — min-
    label propagation, one shuffle-join + aggregate per round, lineage
    truncated per iteration by localCheckpoint, driver carries only a
    changed-row COUNT, and non-convergence RAISES rather than silently
    splitting clusters. The DuckDB oracle computes the exact transitive
    closure by recursive CTE, so every driver round re-proves the
    propagation against ground truth. Edge construction: the quantity
    filter pushes to the parquet scan, per-order fan-out is bounded by
    order size (<= 7 lineitems -> <= 21 pairs), and the pair join is an
    equi-join on l_orderkey — never all-pairs.

    Scale posture: the >= 48 threshold keeps the subgraph sparse
    (measured ~0.4k edges at sf0.01, forest-like small components ->
    few propagation rounds); label propagation's per-round cost is one
    |edges|-row equi-join keyed by node id."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= _CC_MIN_QTY)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("id_a"),
            F.col("b.l_partkey").alias("id_b"),
        )
        .distinct()
    )
    comps = dd.connected_components(pairs)
    sizes = comps.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return comps.join(sizes, "label").select(
        F.col("node").alias("part_key"),
        F.col("label").alias("component"),
        "n_members",
    )


# --- mean-shift changepoint detection --------------------------------------------

_MS_W = 16  # samples on each side of the candidate changepoint
_MS_MIN_GAP = 48000  # cents x window: mean shift >= 30 value units

_MEAN_SHIFT_ORACLE = f"""
WITH v AS (
    SELECT event_type, ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS v100
    FROM events
),
w AS (
    SELECT event_type, ts, event_id,
           SUM(v100) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_MS_W} PRECEDING AND 1 PRECEDING) AS sp,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_MS_W} PRECEDING AND 1 PRECEDING) AS cp,
           SUM(v100) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND {_MS_W - 1} FOLLOWING) AS sn,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND {_MS_W - 1} FOLLOWING) AS cn
    FROM v
),
c AS (
    SELECT event_type, ts, event_id, sp, sn, ABS(sn - sp) AS gap
    FROM w WHERE cp = {_MS_W} AND cn = {_MS_W}
),
m AS (
    SELECT *,
           MAX(gap) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 8 PRECEDING AND 8 FOLLOWING) AS lmax
    FROM c
)
SELECT event_type, ts, event_id,
       ROUND(sp / {_MS_W * 100}.0, 6) AS pre_mean,
       ROUND(sn / {_MS_W * 100}.0, 6) AS post_mean,
       ROUND((sn - sp) / {_MS_W * 100}.0, 6) AS shift
FROM m WHERE gap >= {_MS_MIN_GAP} AND gap = lmax
"""


@query("timeseries_mean_shift_detect", oracle=_MEAN_SHIFT_ORACLE)
def timeseries_mean_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift changepoint detection per event-type series: at each
    point, compare the mean of the 16 samples before against the 16
    starting at it; flag points where the shift exceeds 30
    value units AND the gap is the local maximum within +-8 samples
    (two-sample scan statistic — the non-recursive, window-expressible
    form of CUSUM-style monitoring; the sequential-reset CUSUM
    recurrence is not distributable without a sequential pass).

    Exactness: values become integer cents, window sums stay exact
    integers, the gap threshold and local-max test are integer
    comparisons, and the three means are single final divisions.

    Scale posture: all four windows are ROWS-frame running aggregates
    PARTITIONED by the series key (event_type) and sorted by (ts,
    event_id) — one shuffle on the series key, then every window in
    the same sort order (Catalyst fuses them into one Window node per
    frame set); no corpus-wide unpartitioned window anywhere."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v100"),
    )
    order = [F.col("ts"), F.col("event_id")]
    wp = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(-_MS_W, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(0, _MS_W - 1)
    )
    w = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("v100").over(wp).alias("sp"),
        F.count(F.lit(1)).over(wp).alias("cp"),
        F.sum("v100").over(wn).alias("sn"),
        F.count(F.lit(1)).over(wn).alias("cn"),
    )
    c = w.filter((F.col("cp") == _MS_W) & (F.col("cn") == _MS_W)).select(
        "event_type",
        "ts",
        "event_id",
        "sp",
        "sn",
        F.abs(F.col("sn") - F.col("sp")).alias("gap"),
    )
    wm = (
        Window.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(-8, 8)
    )
    m = c.withColumn("lmax", F.max("gap").over(wm))
    den = float(_MS_W * 100)
    return m.filter(
        (F.col("gap") >= _MS_MIN_GAP) & (F.col("gap") == F.col("lmax"))
    ).select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("sp") / den, 6).alias("pre_mean"),
        F.round(F.col("sn") / den, 6).alias("post_mean"),
        F.round((F.col("sn") - F.col("sp")) / den, 6).alias("shift"),
    )


# --- HyperLogLog distinct-count sketch --------------------------------------------

# m = 256 registers (b = 8); alpha_256 = 0.7213 / (1 + 1.079/256),
# embedded as the exact double literal so both engines start from the
# identical constant. The 60-bit portable hash splits into an 8-bit
# register index and a 52-bit pattern; rho = leading-zeros-within-52+1
# = 53 - bit_length(pattern) stays pure integer (binary-string length,
# no log2), and the indicator sum Z*2^53 = sum_i 2^(53-r_i) is an EXACT
# int64 (<= 256 * 2^53 = 2^61) via bit shifts — no float powers, no
# summation-order hazard. The estimate is then literal * 2^53 / S: one
# correctly-rounded multiply-by-power-of-two and one divide.
_HLL_M = 256
_HLL_ALPHA = "0.7182725932495458"

_HLL_ORACLE = f"""
WITH h AS (
    SELECT l_returnflag,
           {tf.h60_sql("CAST(l_orderkey AS VARCHAR)")} AS hv
    FROM lineitem
),
r AS (
    SELECT l_returnflag, hv % {_HLL_M} AS bucket,
           CASE WHEN hv // {_HLL_M} = 0 THEN 53
                ELSE 53 - length(ltrim(bin(hv // {_HLL_M}), '0')) END AS rho
    FROM h
),
shard AS (
    SELECT l_returnflag, bucket, MAX(rho) AS r FROM r GROUP BY 1, 2
),
merged AS (SELECT bucket, MAX(r) AS r FROM shard GROUP BY bucket),
direct AS (
    SELECT bucket, MAX(rho) AS r FROM r GROUP BY bucket
),
spine AS (SELECT g.bucket FROM range(0, {_HLL_M}) g(bucket)),
s_m AS (
    SELECT CAST(SUM(1::BIGINT << (53 - COALESCE(m.r, 0))) AS BIGINT) AS s
    FROM spine LEFT JOIN merged m ON m.bucket = spine.bucket
),
s_d AS (
    SELECT CAST(SUM(1::BIGINT << (53 - COALESCE(d.r, 0))) AS BIGINT) AS s
    FROM spine LEFT JOIN direct d ON d.bucket = spine.bucket
),
tru AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_true
    FROM lineitem
)
SELECT {_HLL_M}::BIGINT AS m, tru.n_rows, tru.n_true,
       ROUND(CAST({_HLL_ALPHA} AS DOUBLE) * 65536.0 * 9007199254740992.0
             / CAST(s_d.s AS DOUBLE), 4) AS hll_estimate,
       ROUND(ABS(CAST({_HLL_ALPHA} AS DOUBLE) * 65536.0 * 9007199254740992.0
                 / CAST(s_d.s AS DOUBLE) - tru.n_true) / tru.n_true, 6)
           AS rel_error,
       s_m.s = s_d.s AS merge_consistent
FROM tru, s_m, s_d
"""


@query("sketch_hll_distinct", oracle=_HLL_ORACLE)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch built IN-ENGINE (Flajolet et
    al., AofA 2007) over order keys, with the property that makes
    sketches the 100 TB answer to COUNT(DISTINCT): MERGEABILITY. The
    plan builds per-shard (returnflag) register sets, merges them by
    register-wise MAX, and proves in-query (`merge_consistent`) that
    the merged registers equal the registers of a direct single pass —
    the algebra that lets a 1000-executor cluster sketch partitions
    independently and combine 256-byte states instead of shuffling
    every key. The exact distinct count and the sketch's relative
    error ride along, so every driver round re-measures the estimator
    against ground truth (raw-HLL regime: n >> 2.5m at every sf, no
    small-range correction needed).

    Determinism: the portable 60-bit hash gives identical registers on
    both engines; rho is integer (binary-string length, no log2); the
    indicator sum is an exact int64 of bit shifts; the final estimate
    is one embedded-literal multiply and one divide. The DuckDB oracle
    replays registers bit-for-bit.

    Scale posture: rho/bucket are scan-local; the only corpus-scale
    shuffles are map-side-combinable MAX groupBys keyed by (shard,
    bucket) then bucket — partial aggregation makes each mapper emit
    at most m rows per shard regardless of input size. Everything
    after runs on 256-row register tables against the broadcast
    1-row exact-count."""
    li = load(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag",
        tf.h60(F.col("l_orderkey").cast("string")).alias("hv"),
    )
    w = F.expr(f"hv div {_HLL_M}")
    r = h.select(
        "l_returnflag",
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.when(w == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.conv(w.cast("string"), 10, 2)))
        .cast("int")
        .alias("rho"),
    ).localCheckpoint(eager=True)  # feeds the shard-merge AND direct paths
    shard = r.groupBy("l_returnflag", "bucket").agg(F.max("rho").alias("r"))
    merged = shard.groupBy("bucket").agg(F.max("r").alias("r"))
    direct = r.groupBy("bucket").agg(F.max("rho").alias("r"))
    spine = spark.range(_HLL_M).select(F.col("id").alias("bucket"))

    def _indicator_sum(regs: DataFrame) -> DataFrame:
        return (
            spine.join(F.broadcast(regs), "bucket", "left")
            .select(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(53 - coalesce(r, 0) AS INT))"
                ).alias("ind")
            )
            .agg(F.sum("ind").cast("long").alias("s"))
        )

    s_m = _indicator_sum(merged).select(F.col("s").alias("s_m"))
    s_d = _indicator_sum(direct).select(F.col("s").alias("s_d"))
    tru = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_true"),
    )
    est = (
        F.lit(float(_HLL_ALPHA))
        * F.lit(65536.0)
        * F.lit(9007199254740992.0)
        / F.col("s_d").cast("double")
    )
    return (
        tru.crossJoin(F.broadcast(s_m))
        .crossJoin(F.broadcast(s_d))
        .select(
            F.lit(_HLL_M).cast("long").alias("m"),
            "n_rows",
            "n_true",
            F.round(est, 4).alias("hll_estimate"),
            F.round(
                F.abs(est - F.col("n_true")) / F.col("n_true"), 6
            ).alias("rel_error"),
            (F.col("s_m") == F.col("s_d")).alias("merge_consistent"),
        )
    )


# --- Count-Min sketch ------------------------------------------------------------

# depth 4 x width 1024: each counter row uses one universal-hash
# permutation from the shared REHASH_AB family (identical constants
# rendered into the oracle), so the sketch is bit-identical on both
# engines, mergeable by cell-wise SUM, and carries the classic
# one-sided guarantee estimate >= true (asserted in-query per probe).
_CM_DEPTH = 4
_CM_WIDTH = 1024
_CM_PROBES = 20

_CM_CELLS_SQL = "\nUNION ALL\n".join(
    f"SELECT {i} AS row_i, {tf.rehash_sql('h', i)} % {_CM_WIDTH} AS bucket,"
    " wc FROM wh"
    for i in range(_CM_DEPTH)
)

_CM_ORACLE = f"""
WITH dw AS (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
    FROM documents WHERE trim(text) <> ''
),
w AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
    FROM dw WHERE word <> '' GROUP BY word
),
wh AS (SELECT word, wc, {tf.h60_sql("word")} AS h FROM w),
cells AS ({_CM_CELLS_SQL}),
cm AS (
    SELECT row_i, bucket, CAST(SUM(wc) AS BIGINT) AS cnt
    FROM cells GROUP BY row_i, bucket
),
probes AS (
    SELECT word, wc AS true_count, h
    FROM wh ORDER BY wc DESC, word LIMIT {_CM_PROBES}
),
pb AS (
    SELECT p.word, p.true_count, c.row_i, c.cnt
    FROM probes p
    JOIN cm c ON c.bucket = CASE c.row_i
        {" ".join(f"WHEN {i} THEN {tf.rehash_sql('p.h', i)} % {_CM_WIDTH}" for i in range(_CM_DEPTH))}
        END
)
SELECT word, true_count,
       CAST(MIN(cnt) AS BIGINT) AS cm_estimate,
       CAST(MIN(cnt) - true_count AS BIGINT) AS overcount,
       MIN(cnt) >= true_count AS guarantee_holds
FROM pb GROUP BY word, true_count
"""


@query("sketch_count_min_tokens", oracle=_CM_ORACLE)
def sketch_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) over the
    corpus word stream — the OTHER mergeable sketch a 100 TB pipeline
    needs next to HLL (`sketch_hll_distinct`): approximate per-item
    FREQUENCIES in depth x width = 4 x 1024 integer cells that combine
    across executors by cell-wise SUM. The query builds the sketch
    in-engine, probes it with the corpus's 20 most frequent words, and
    emits estimate vs true count with the classic one-sided guarantee
    (estimate >= true, never under) asserted per probe —
    `guarantee_holds` is oracle-pinned TRUE.

    Determinism: bucket indices come from the shared universal-hash
    permutations over the portable 60-bit word hash (identical
    constants rendered into the oracle SQL), all counters are exact
    integer sums — nothing floats anywhere in this query.

    Scale posture: one tokenize/explode pass into a map-side
    combinable word-count groupBy (the only corpus-cardinality
    shuffle); the 4-cells-per-word explode then collapses into the
    <= 4096-row sketch via a second map-side-combinable groupBy whose
    OUTPUT is constant-size regardless of corpus scale — that is the
    point of a sketch; probes are a TakeOrderedAndProject top-20
    joined against the broadcast-size sketch."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    dw = (
        docs.filter(F.trim(F.col("text")) != "")
        .select(
            F.explode(tf.ws_tokens(F.lower(F.col("text")))).alias("word")
        )
        .filter(F.col("word") != "")
    )
    w = dw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    wh = w.select(
        "word", "wc", tf.h60(F.col("word")).alias("h")
    ).localCheckpoint(eager=True)  # feeds the sketch AND the probe top-20
    cells = wh.select(
        "wc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        (tf.rehash(F.col("h"), i) % _CM_WIDTH).alias(
                            "bucket"
                        ),
                    )
                    for i in range(_CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select(F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"), "wc")
    cm = cells.groupBy("row_i", "bucket").agg(
        F.sum("wc").cast("long").alias("cnt")
    )
    probes = (
        wh.orderBy(F.desc("wc"), F.asc("word"))
        .limit(_CM_PROBES)
        .select(
            "word",
            F.col("wc").alias("true_count"),
            *[
                (tf.rehash(F.col("h"), i) % _CM_WIDTH).alias(f"b{i}")
                for i in range(_CM_DEPTH)
            ],
        )
    )
    pb = probes.select(
        "word",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.col(f"b{i}").alias("bucket"),
                    )
                    for i in range(_CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("word", "true_count", F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))
    joined = pb.join(F.broadcast(cm), ["row_i", "bucket"])
    return joined.groupBy("word", "true_count").agg(
        F.min("cnt").cast("long").alias("cm_estimate"),
        (F.min("cnt") - F.col("true_count")).cast("long").alias("overcount"),
        (F.min("cnt") >= F.col("true_count")).alias("guarantee_holds"),
    )
