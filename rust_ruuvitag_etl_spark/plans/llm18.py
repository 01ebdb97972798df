"""Round-10 wave 3 — preference ranking, exchangeability testing,
curriculum ordering, and incremental-novelty scanning:

* Bradley-Terry strengths (`eval_bradley_terry_strength`): pairwise
  preference outcomes → per-source ability scores via two unrolled
  minorization-maximization iterations — the RLHF/reward-model data
  op (rank annotators or sources from A/B preference pairs);
* deterministic permutation test (`stat_permutation_test`): is the
  train/test hash split exchangeable w.r.t. quality? B=64 label
  permutations drawn from the portable hash (no RNG), exact integer
  cross-multiplied mean-difference comparisons;
* curriculum ordering (`curriculum_difficulty_order`): mean
  token-rarity rank per document → ntile(4) curriculum phase within
  each language — the easy-to-hard data ordering for staged training;
* n-gram novelty (`text_ngram_novelty`): per document, how many of its
  distinct 4-grams appear for the FIRST time (by doc_id order) — the
  incremental-crawl "how much new content did this batch add" audit.

Float discipline: corpus-side values are exact integers; the only
doubles are (a) per-term quantities ROUNDed to fixed precision and
summed as DECIMAL (order-free), and (b) final scores produced by an
identical op sequence on those exact inputs — emitted UN-rounded so
no decimal-tie can split the engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from ._dedup_oracles import _QUALITY_SQL
from .llm12 import _SPLIT_EXPR_SQL, _TRAIN_LT, _bucket
from .registry import query

# --- Bradley-Terry preference strengths --------------------------------------

# Deterministic preference matches: adjacent doc pairs (2k, 2k+1) are
# judged by quality score (ten-thousandths, exact); ties go to the
# lexicographically smaller source. Same-source matches carry no
# between-source information and are dropped. Two MM iterations
# (Hunter 2004): s_i <- W_i / sum_j n_ij/(s_i+s_j), renormalized to
# mean 1 each round; each summand rounds to 12 dp and accumulates as
# DECIMAL so the fold is order-free on both engines.
_BT_ITERS = 2


def _bt_iter_sql(nd: str, wt: str) -> str:
    """CTE chain from the source-pair count relation ``nd(i, j, nij)``
    and the win-count relation ``wt(src, wins)`` to the final
    strengths — TEXT SHARED VERBATIM between the DuckDB oracle and the
    Spark engine plan (one JVM-side parse replaces the ~100 py4j Column
    round-trips the unrolled-iteration Column build cost: the
    dedup_bloom_delta expression-build lesson applied here). The engine
    binds {nd}/{wt} to localCheckpointed temp views so each of the
    text's four nd references reads a materialized ~|source-pairs|-row
    table instead of re-deriving from the match table (a round-11 plan
    audit caught the checkpoint-less variant at 128 exchanges).

    Accepted tie exposure (documented per round-10 advice): each MM
    summand ROUNDs a computed double quotient to 12 dp before the
    order-free DECIMAL sum. Spark rounds the quotient's shortest
    decimal repr, DuckDB the raw binary — they can split only when a
    quotient of these integer-derived abilities lands within ~1e-16 of
    an exact 12-dp tie, which no input at any tested scale factor
    produces; the alternative (quantizing s itself) just moves the
    same double→decimal cast divergence one step earlier."""
    core = f"""
items AS (SELECT DISTINCT i AS src FROM {nd}),
nm AS (SELECT i AS src, CAST(SUM(nij) AS BIGINT) AS n_matches
       FROM {nd} GROUP BY i),
ni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items FROM items),
s0 AS (SELECT src, CAST(1 AS DOUBLE) AS s FROM items)"""
    prev = "s0"
    for t in range(1, _BT_ITERS + 1):
        core += f""",
den{t} AS (
    SELECT {nd}.i AS src,
           SUM(CAST(ROUND(CAST({nd}.nij AS DOUBLE) / (si.s + sj.s), 12)
               AS DECIMAL(38,12))) AS den
    FROM {nd} JOIN {prev} si ON si.src = {nd}.i
            JOIN {prev} sj ON sj.src = {nd}.j
    GROUP BY {nd}.i
),
raw{t} AS (
    SELECT {wt}.src,
           CAST({wt}.wins AS DOUBLE) / CAST(den{t}.den AS DOUBLE) AS r
    FROM {wt} JOIN den{t} USING (src)
),
tot{t} AS (
    SELECT SUM(CAST(ROUND(r, 12) AS DECIMAL(38,12))) AS s_sum FROM raw{t}
),
s{t} AS (
    SELECT src,
           r * CAST(ni.n_items AS DOUBLE) / CAST(tot{t}.s_sum AS DOUBLE)
               AS s
    FROM raw{t}, tot{t}, ni
)"""
        prev = f"s{t}"
    core += f"""
SELECT {wt}.src AS source, {wt}.wins, nm.n_matches, {prev}.s AS strength
FROM {wt} JOIN nm USING (src) JOIN {prev} USING (src)
"""
    return core


def _bt_oracle() -> str:
    return f"""
WITH {_QUALITY_SQL},
d AS (
    SELECT doc_id, source, CAST(ROUND(q * 10000) AS BIGINT) AS s4
    FROM qscore
),
pr AS (
    SELECT doc_id // 2 AS pk,
           MAX(CASE WHEN doc_id % 2 = 0 THEN s4 END) AS qa,
           MAX(CASE WHEN doc_id % 2 = 1 THEN s4 END) AS qb,
           MAX(CASE WHEN doc_id % 2 = 0 THEN source END) AS sa,
           MAX(CASE WHEN doc_id % 2 = 1 THEN source END) AS sb,
           COUNT(*) AS c
    FROM d GROUP BY doc_id // 2
),
m AS (
    SELECT CASE WHEN qa > qb THEN sa WHEN qa < qb THEN sb
                ELSE LEAST(sa, sb) END AS w,
           CASE WHEN qa > qb THEN sb WHEN qa < qb THEN sa
                ELSE GREATEST(sa, sb) END AS l
    FROM pr WHERE c = 2 AND sa <> sb
),
nd AS (
    SELECT i, j, CAST(COUNT(*) AS BIGINT) AS nij FROM (
        SELECT w AS i, l AS j FROM m
        UNION ALL SELECT l AS i, w AS j FROM m
    ) t GROUP BY i, j
),
wt AS (
    SELECT items.src,
           CAST(COALESCE(wc.wins, 0) AS BIGINT) AS wins
    FROM (SELECT DISTINCT i AS src FROM nd) items LEFT JOIN (
        SELECT w AS src, COUNT(*) AS wins FROM m GROUP BY w
    ) wc USING (src)
),
{_bt_iter_sql("nd", "wt")}"""


@query("eval_bradley_terry_strength", oracle=_bt_oracle())
def eval_bradley_terry_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bradley-Terry ability scores per SOURCE from deterministic
    pairwise preference matches (adjacent doc pairs judged on quality
    score) — the preference-ranking op an RLHF data pipeline runs to
    score annotators/sources from A/B comparisons, here with two
    unrolled MM iterations and mean-1 normalization (see the module
    constant's comment for the exactness contract).

    Scale posture: ONE corpus-scale shuffle (groupBy(doc_id/2) builds
    matches pairwise in-group — no self-join); everything after the
    match aggregation runs at |sources| or |source-pairs| cardinality
    (20 / ~400 rows) with broadcast joins. Corpus growth adds matches,
    never iteration width."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        "source",
        F.round(tf.quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("s4"),
    )
    even, odd = F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1
    pr = (
        d.groupBy(F.expr("doc_id DIV 2").alias("pk"))
        .agg(
            F.max(F.when(even, F.col("s4"))).alias("qa"),
            F.max(F.when(odd, F.col("s4"))).alias("qb"),
            F.max(F.when(even, F.col("source"))).alias("sa"),
            F.max(F.when(odd, F.col("source"))).alias("sb"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter((F.col("c") == 2) & (F.col("sa") != F.col("sb")))
    )
    qa, qb = F.col("qa"), F.col("qb")
    m = pr.select(
        F.when(qa > qb, F.col("sa"))
        .when(qa < qb, F.col("sb"))
        .otherwise(F.least("sa", "sb"))
        .alias("w"),
        F.when(qa > qb, F.col("sb"))
        .when(qa < qb, F.col("sa"))
        .otherwise(F.greatest("sa", "sb"))
        .alias("l"),
    ).localCheckpoint(eager=True)  # |matches| rows; feeds nd + wins
    # Everything downstream runs at |sources| (~20 rows) / |source-
    # pairs| (~400 rows) cardinality: materialize those two tiny
    # tables once (checkpointed views), then hand the WHOLE iteration
    # chain to the JVM as one SQL parse of the SAME text the oracle
    # runs (see _bt_iter_sql) instead of composing ~100 Column objects
    # per MM iteration through py4j. Measured on dedup_bloom_delta:
    # the driver-side expression build, not execution, was ~seconds of
    # the suite reading; AQE broadcasts every join at these sizes.
    nd = (
        m.select(F.col("w").alias("i"), F.col("l").alias("j"))
        .unionAll(m.select(F.col("l").alias("i"), F.col("w").alias("j")))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
        .localCheckpoint(eager=True)  # read 4x by the iteration text
    )
    wt = (
        nd.select(F.col("i").alias("src"))
        .distinct()
        .join(
            F.broadcast(
                m.groupBy(F.col("w").alias("src")).agg(
                    F.count(F.lit(1)).alias("wins")
                )
            ),
            "src",
            "left",
        )
        .select(
            "src",
            F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
        )
        .localCheckpoint(eager=True)  # read 3x by the iteration text
    )
    nd.createOrReplaceTempView("bt_nd")
    wt.createOrReplaceTempView("bt_wt")
    return spark.sql("WITH " + _bt_iter_sql("bt_nd", "bt_wt"))


# --- deterministic permutation test -------------------------------------------

_PERM_B = 64

_PERM_ASSIGN_SQL = tf.h60_sql(
    "'perm' || CAST(b AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
)

_PERM_ORACLE = f"""
WITH {_QUALITY_SQL},
d AS (
    SELECT doc_id, CAST(ROUND(q * 10000) AS BIGINT) AS s4,
           CAST({_SPLIT_EXPR_SQL} AS INTEGER) < {_TRAIN_LT} AS in_a
    FROM qscore
),
obs AS (
    SELECT CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN in_a THEN s4 ELSE 0 END) AS BIGINT) AS sum_a,
           CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN in_a THEN 0 ELSE s4 END) AS BIGINT) AS sum_b
    FROM d
),
perm AS (
    SELECT b,
           CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN g = 0 THEN s4 ELSE 0 END) AS BIGINT) AS sa,
           CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN g = 1 THEN s4 ELSE 0 END) AS BIGINT) AS sb
    FROM (
        SELECT d.doc_id, d.s4, b.b,
               CAST(({_PERM_ASSIGN_SQL}) % 2 AS INTEGER) AS g
        FROM d CROSS JOIN (SELECT unnest(range(1, {_PERM_B} + 1)) AS b) b
    ) GROUP BY b
),
cmp AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_extreme
    FROM perm, obs
    WHERE ABS(CAST(perm.sa AS DECIMAL(38,0)) * perm.nb
              - CAST(perm.sb AS DECIMAL(38,0)) * perm.na)
          * (CAST(obs.n_a AS DECIMAL(38,0)) * obs.n_b)
          >= ABS(CAST(obs.sum_a AS DECIMAL(38,0)) * obs.n_b
                 - CAST(obs.sum_b AS DECIMAL(38,0)) * obs.n_a)
             * (CAST(perm.na AS DECIMAL(38,0)) * perm.nb)
)
SELECT obs.n_a, obs.n_b, CAST({_PERM_B} AS BIGINT) AS n_perms,
       cmp.n_extreme,
       CAST(((1 + cmp.n_extreme) * 2000000 + ({_PERM_B} + 1))
            // (2 * ({_PERM_B} + 1)) AS DOUBLE) / 1000000.0 AS p_value,
       (1 + cmp.n_extreme) * 20 < ({_PERM_B} + 1) AS drifted
FROM obs, cmp
"""


@query("stat_permutation_test", oracle=_PERM_ORACLE)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchangeability audit of the train/test hash split: a two-sample
    permutation test on mean quality score with B=64 label permutations
    drawn DETERMINISTICALLY from the portable hash (permutation b
    assigns doc_id to group h60('perm'||b||':'||doc_id) % 2). Because
    the real split is itself a hash split, the null is true by
    construction and the test doubles as a split-integrity check — a
    biased split assignment shows up as p < 0.05 ('drifted').

    Exactness: the mean-difference comparison cross-multiplies exact
    integer sums (|sa*nb - sb*na| scaled by the opposing group-size
    product) in DECIMAL(38,0) — no division until the final p-value,
    which rounds HALF-UP in integer micro-units; 'drifted' compares
    p < 0.05 as the exact integer inequality 20*(1+k) < B+1. Bound:
    DECIMAL(38) holds the products up to ~1e9 documents.

    Scale posture: the observed row is one scan-local aggregate; the
    permutation pass explodes each row x64 scan-locally and map-side
    combines straight to 64x2 partial sums — the shuffle carries ~128
    rows no matter the corpus size."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        F.round(tf.quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("s4"),
        (_bucket() < _TRAIN_LT).alias("in_a"),
    )
    in_a = F.col("in_a")
    obs = d.agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(in_a, F.col("s4")).otherwise(0))
        .cast("long")
        .alias("sum_a"),
        F.sum(F.when(in_a, 0).otherwise(1)).cast("long").alias("n_b"),
        F.sum(F.when(in_a, 0).otherwise(F.col("s4")))
        .cast("long")
        .alias("sum_b"),
    )
    g = (
        F.pmod(
            tf.h60(
                F.concat(
                    F.lit("perm"),
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            F.lit(2),
        )
    ).cast("int")
    perm = (
        d.select(
            "doc_id",
            "s4",
            F.explode(F.sequence(F.lit(1), F.lit(_PERM_B))).alias("b"),
        )
        .select("s4", "b", g.alias("g"))
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
            .cast("long")
            .alias("na"),
            F.sum(F.when(F.col("g") == 0, F.col("s4")).otherwise(0))
            .cast("long")
            .alias("sa"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
            .cast("long")
            .alias("nb"),
            F.sum(F.when(F.col("g") == 1, F.col("s4")).otherwise(0))
            .cast("long")
            .alias("sb"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    extreme = (
        F.abs(dec("sa") * F.col("nb") - dec("sb") * F.col("na"))
        * (dec("n_a") * F.col("n_b"))
        >= F.abs(dec("sum_a") * F.col("n_b") - dec("sum_b") * F.col("n_a"))
        * (dec("na") * F.col("nb"))
    )
    cmp = (
        perm.crossJoin(F.broadcast(obs))
        .select(F.when(extreme, 1).otherwise(0).alias("x"))
        .agg(F.sum("x").cast("long").alias("n_extreme"))
    )
    return (
        obs.crossJoin(F.broadcast(cmp))
        .select(
            "n_a",
            "n_b",
            F.lit(_PERM_B).cast("long").alias("n_perms"),
            "n_extreme",
            (
                F.expr(
                    f"CAST(((1 + n_extreme) * 2000000 + {_PERM_B + 1})"
                    f" DIV (2 * {_PERM_B + 1}) AS DOUBLE)"
                )
                / F.lit(1000000.0)
            ).alias("p_value"),
            ((1 + F.col("n_extreme")) * 20 < F.lit(_PERM_B + 1)).alias(
                "drifted"
            ),
        )
    )


# --- curriculum ordering by token rarity ---------------------------------------

_CURRICULUM_ORACLE = """
WITH toks AS (
    SELECT doc_id, lang,
           string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
ex AS (SELECT doc_id, lang, unnest(t) AS token FROM toks),
tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM ex GROUP BY token),
rk AS (
    SELECT token,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS r
    FROM tc
),
ds AS (
    SELECT ex.doc_id, ex.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(rk.r) AS BIGINT) AS rank_sum
    FROM ex JOIN rk USING (token) GROUP BY ex.doc_id, ex.lang
),
df AS (
    SELECT doc_id, lang, n_tokens, rank_sum,
           CAST((rank_sum * 2000000 + n_tokens) // (2 * n_tokens)
                AS BIGINT) AS diff_micro
    FROM ds
)
SELECT doc_id, lang, n_tokens, rank_sum,
       CAST(diff_micro AS DOUBLE) / 1000000.0 AS difficulty,
       CAST(NTILE(4) OVER (PARTITION BY lang
                           ORDER BY diff_micro, doc_id) AS BIGINT) AS phase
FROM df
"""


@query("curriculum_difficulty_order", oracle=_CURRICULUM_ORACLE)
def curriculum_difficulty_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Curriculum data ordering: score each document's difficulty as
    the mean frequency-RANK of its tokens (rank 1 = most common word;
    rare vocabulary ⇒ harder text), then assign an easy-to-hard
    ntile(4) curriculum phase within each language — the staged-
    training ordering (Bengio et al. 2009) a data loader consumes as a
    sort key.

    Exactness: token counts and ranks are exact integers with a total
    tie order (count DESC, token ASC); mean rank rounds HALF-UP in
    integer micro-units; ntile runs on the integer (diff_micro,
    doc_id) total order so bucket boundaries cannot float-drift.

    Scale posture: one groupBy(token) count, a |vocab|-row global rank
    (Heaps-law sublinear; shard-and-merge at true 100 TB), one
    token-keyed equi-join back (uniform keys), one groupBy(doc) — and
    the phase window partitions BY LANGUAGE, so no corpus-wide single
    partition exists."""
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
    tc = ex.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rk = tc.select(
        "token",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("token")))
        .cast("long")
        .alias("r"),
    )
    ds = (
        ex.join(rk, "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("r").cast("long").alias("rank_sum"),
        )
    )
    df = ds.select(
        "doc_id",
        "lang",
        "n_tokens",
        "rank_sum",
        F.expr(
            "CAST((rank_sum * 2000000 + n_tokens) DIV (2 * n_tokens)"
            " AS BIGINT)"
        ).alias("diff_micro"),
    )
    return df.select(
        "doc_id",
        "lang",
        "n_tokens",
        "rank_sum",
        (F.col("diff_micro").cast("double") / F.lit(1000000.0)).alias(
            "difficulty"
        ),
        F.ntile(4)
        .over(
            Window.partitionBy("lang").orderBy("diff_micro", "doc_id")
        )
        .cast("long")
        .alias("phase"),
    )


# --- n-gram novelty (incremental-crawl audit) ----------------------------------

_NOVELTY_N = 4

_NOVELTY_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang,
           string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
g AS (
    SELECT doc_id, lang,
           list_distinct(list_transform(
               range(1, greatest(len(t) - {_NOVELTY_N - 1}, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
           )) AS garr
    FROM toks
),
gd AS (
    SELECT doc_id, lang, CAST(len(garr) AS BIGINT) AS n_grams
    FROM g WHERE len(garr) > 0
),
ex AS (SELECT doc_id, unnest(garr) AS gram FROM g),
fst AS (SELECT gram, MIN(doc_id) AS first_doc FROM ex GROUP BY gram),
nov AS (
    SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
    FROM fst GROUP BY first_doc
)
SELECT gd.doc_id, gd.lang, gd.n_grams,
       COALESCE(nov.n_novel, 0) AS n_novel,
       CAST((COALESCE(nov.n_novel, 0) * 2000000 + gd.n_grams)
            // (2 * gd.n_grams) AS DOUBLE) / 1000000.0 AS novelty_rate
FROM gd LEFT JOIN nov USING (doc_id)
"""


@query("text_ngram_novelty", oracle=_NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental novelty scan: for each document, the fraction of its
    DISTINCT 4-grams that appear for the first time in doc_id order —
    the "how much genuinely new content did this crawl batch add"
    audit behind dedup-aware crawl scheduling (a batch of near-zero
    novelty isn't worth cleaning). First occurrence is attributed by
    MIN(doc_id) per 4-gram, so the measure is deterministic and
    order-free.

    Exactness: all counts exact integers; novelty_rate rounds HALF-UP
    in integer micro-units before one exact division.

    Scale posture: shingling is scan-local; the one corpus-scale
    shuffle is the map-side-combinable groupBy(gram) MIN — uniform
    hashed keys; per-doc novel counts come FROM that |grams|-row
    result (groupBy its first_doc — no join back to the exploded
    table), and the final doc-keyed left join runs at |docs|
    cardinality."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    garr = F.array_distinct(tf.shingles(F.col("text"), _NOVELTY_N))
    g = docs.select("doc_id", "lang", garr.alias("garr"))
    gd = g.filter(F.size("garr") > 0).select(
        "doc_id", "lang", F.size("garr").cast("long").alias("n_grams")
    )
    ex = g.select("doc_id", F.explode("garr").alias("gram"))
    fst = ex.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    nov = fst.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    return (
        gd.join(nov, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_grams",
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
            (
                F.expr(
                    "CAST((COALESCE(n_novel, 0) * 2000000 + n_grams)"
                    " DIV (2 * n_grams) AS DOUBLE)"
                )
                / F.lit(1000000.0)
            ).alias("novelty_rate"),
        )
    )
