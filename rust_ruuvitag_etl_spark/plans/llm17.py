"""Round-10 wave 2 — five commonly-hit pipeline families the registry
still lacked:

* Flesch readability scoring (`text_readability_flesch`): the classic
  rule-based difficulty proxy every curriculum/quality stack computes;
* differentially-private group counts (`governance_dp_group_counts`):
  the two-sided-geometric (discrete Laplace) mechanism with the noise
  drawn DETERMINISTICALLY from the portable hash, so both engines
  reproduce the released counts bit-identically;
* tokenizer vocabulary coverage (`tokenizer_vocab_coverage`): OOV rate
  of a train-split top-V vocabulary on the held-out test split — the
  fertility/coverage audit run before freezing a tokenizer;
* embedding truncation fidelity (`embedding_truncation_fidelity`): how
  much of each vector's norm the first half of its dimensions carries
  (the Matryoshka-truncation question asked before shipping shortened
  embeddings);
* Mann-Whitney U drift test (`stat_mann_whitney_u`): the rank-based
  two-sample complement to `stat_ks_two_sample` — location shifts with
  exact tie handling via integer 2x-rank arithmetic.

Float discipline: integer/fixed-point cross-multiplication everywhere;
final report values are either integer-half-up micro-units (one exact
division) or UN-rounded doubles produced by an identical operation
sequence on exact-integer operands (bit-identical on both engines —
never a ROUND of a quotient that can land on a decimal tie).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from ._dedup_oracles import _QUALITY_SQL
from .llm12 import _SPLIT_EXPR_SQL, _TRAIN_LT, _VAL_LT, _bucket
from .registry import query

# --- Flesch readability ----------------------------------------------------

_FLESCH_ORACLE = """
WITH d AS (
    SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
           GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                    1) AS n_sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
               AS n_syllables
    FROM documents WHERE trim(text) <> ''
)
SELECT doc_id, lang, n_words, n_sentences, n_syllables,
       CAST('206.835' AS DOUBLE)
           - CAST('1.015' AS DOUBLE)
             * (CAST(n_words AS DOUBLE) / n_sentences)
           - CAST('84.6' AS DOUBLE)
             * (CAST(n_syllables AS DOUBLE) / n_words) AS flesch,
       CAST('0.39' AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences)
           + CAST('11.8' AS DOUBLE)
             * (CAST(n_syllables AS DOUBLE) / n_words)
           - CAST('15.59' AS DOUBLE) AS fk_grade
FROM d
"""


@query("text_readability_flesch", oracle=_FLESCH_ORACLE)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document — the
    rule-based difficulty proxy curriculum ordering and quality gates
    compute before any model-based scorer exists. Syllables are
    approximated as vowel-group runs ([aeiouy]+, the standard
    dictionary-free heuristic), sentences as [.!?]+ runs (floored at 1
    so fragments don't divide by zero).

    Exactness: the three counts are exact integers; both scores are
    UN-rounded doubles from an identical literal/divide/multiply
    sequence on those integers — bit-identical across engines with no
    decimal-tie exposure. Scale posture: scan-local projection, zero
    shuffles, zero joins; the regexes run once per document inside
    codegen."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    n_words = tf.token_count(F.col("text"))
    n_sentences = F.greatest(
        F.expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"),
        F.lit(1).cast("long"),
    )
    n_syllables = F.expr(
        "size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
    ).cast("long")
    d = docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return d.select(
        "doc_id",
        "lang",
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
        ).alias("flesch"),
        (
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
        ).alias("fk_grade"),
    )


# --- differentially-private group counts ------------------------------------

# Two-sided geometric mechanism (Ghosh-Roughgarden-Sundararajan): noise
# = G1 - G2 with G ~ Geometric(1/2) gives the discrete Laplace
# distribution at epsilon = ln 2 for a count query (sensitivity 1).
# G is drawn WITHOUT an RNG: the trailing-zero count of a uniform
# 60-bit integer is exactly Geometric(1/2), and the portable md5-hash
# is uniform and engine-identical — so the released counts are
# deterministic, auditable, and bit-reproducible. ctz caps at 60 (the
# hash width); P(ctz >= 60) = 2^-60 is unreachable in any real run.
_DP_SALT_A, _DP_SALT_B = "dp-noise-a:", "dp-noise-b:"


def _ctz_sql(h: str) -> str:
    return (
        f"CASE WHEN ({h}) = 0 THEN 60 "
        f"ELSE length(bin({h})) - length(rtrim(bin({h}), '0')) END"
    )


_DP_ORACLE = f"""
WITH g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS true_count FROM documents
    GROUP BY lang
),
n AS (
    SELECT lang, true_count,
           CAST({_ctz_sql(tf.h60_sql(f"'{_DP_SALT_A}' || lang"))} AS BIGINT)
               - CAST({_ctz_sql(tf.h60_sql(f"'{_DP_SALT_B}' || lang"))}
                      AS BIGINT) AS noise
    FROM g
)
SELECT lang, true_count, noise, true_count + noise AS dp_count
FROM n
"""


@query("governance_dp_group_counts", oracle=_DP_ORACLE)
def governance_dp_group_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language document counts released under the two-sided
    geometric (discrete Laplace) mechanism at epsilon = ln 2 — the
    exact DP mechanism for integer counts, with one noise draw per
    released group. The geometric variates come from trailing-zero
    counts of the portable hash (see the module constant's comment),
    so the mechanism is deterministic and oracle-checkable; a
    PRODUCTION release would emit only (lang, dp_count) — true_count
    and noise are included here because this query is the mechanism's
    AUDIT twin, not the release itself.

    Scale posture: one map-side-combinable groupBy(lang); the noise is
    a per-group scalar expression over |langs| rows. Exactness: pure
    integer arithmetic end to end — counts, trailing zeros, and the
    noise difference never touch a float."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    ha = tf.h60(F.concat(F.lit(_DP_SALT_A), F.col("lang")))
    hb = tf.h60(F.concat(F.lit(_DP_SALT_B), F.col("lang")))

    def ctz(h):
        b = F.bin(h)
        return (
            F.when(h == 0, F.lit(60).cast("long"))
            .otherwise(
                (F.length(b) - F.length(F.rtrim(b, F.lit("0")))).cast(
                    "long"
                )
            )
        )

    n = g.select(
        "lang", "true_count", (ctz(ha) - ctz(hb)).alias("noise")
    )
    return n.select(
        "lang",
        "true_count",
        "noise",
        (F.col("true_count") + F.col("noise")).alias("dp_count"),
    )


# --- tokenizer vocabulary coverage -------------------------------------------

_VOCAB_V = 512

_VOCAB_COVERAGE_ORACLE = f"""
WITH tk AS (
    SELECT lang, CAST({_SPLIT_EXPR_SQL} AS INTEGER) AS bucket,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
    FROM documents WHERE trim(text) <> ''
),
tc AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tk
    WHERE bucket < {_TRAIN_LT} GROUP BY token
),
vocab AS (
    SELECT token FROM (
        SELECT token, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS r
        FROM tc
    ) WHERE r <= {_VOCAB_V}
),
vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size FROM vocab),
j AS (
    SELECT tk.lang, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
    FROM tk LEFT JOIN vocab v USING (token)
    WHERE tk.bucket >= {_VAL_LT}
),
g AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov
    FROM j GROUP BY lang
)
SELECT lang, n_tokens, n_oov,
       CAST((n_oov * 2000000 + n_tokens) // (2 * n_tokens) AS DOUBLE)
           / 1000000.0 AS oov_rate,
       vs.vocab_size
FROM g, vs
"""


@query("tokenizer_vocab_coverage", oracle=_VOCAB_COVERAGE_ORACLE)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: build a top-V word vocabulary from
    the TRAIN split (deterministic hash split shared with
    corpus_split_assign), then measure per-language OOV rate on the
    held-out TEST buckets — the fertility/coverage check
    run before freezing a tokenizer, and the first thing that breaks
    when a new language enters the mix.

    Exactness: counts are exact integers; oov_rate rounds HALF-UP to
    6 dp in integer micro-units before one exact division (the
    user_time_decayed_value tie-safe pattern). Ranking ties break on
    (count DESC, token ASC) so the vocabulary is total-order
    deterministic.

    Scale posture: tokenize once scan-locally; the train-token count
    is one map-side-combinable groupBy(token); the top-V selection is
    a single |train-vocab|-row rank (natural-language vocabularies
    grow ~O(N^0.5) by Heaps' law — at true 100 TB scale swap the
    global row_number for per-shard top-V + merge, same result set);
    the V-row vocabulary broadcasts into the eval-side left join, so
    nothing corpus-sized shuffles."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    tk = docs.select(
        "lang",
        _bucket().alias("bucket"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "token"
        ),
    )
    tc = (
        tk.filter(F.col("bucket") < _TRAIN_LT)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    vocab = (
        tc.withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("token"))
            ),
        )
        .filter(F.col("r") <= _VOCAB_V)
        .select("token")
        .localCheckpoint(eager=True)
    )
    vs = vocab.agg(F.count(F.lit(1)).alias("vocab_size"))
    j = (
        tk.filter(F.col("bucket") >= _VAL_LT)
        .join(
            F.broadcast(vocab.withColumn("_v", F.lit(1))), "token", "left"
        )
        .select(
            "lang",
            F.when(F.col("_v").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    g = j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
    )
    return g.crossJoin(F.broadcast(vs)).select(
        "lang",
        "n_tokens",
        "n_oov",
        (
            F.expr(
                "CAST((n_oov * 2000000 + n_tokens) DIV (2 * n_tokens)"
                " AS DOUBLE)"
            )
            / F.lit(1000000.0)
        ).alias("oov_rate"),
        "vocab_size",
    )


# --- embedding truncation fidelity -------------------------------------------

_TRUNC_FIDELITY_ORACLE = """
WITH v AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
    FROM embeddings
),
f AS (
    SELECT label,
           ROUND(sqrt(
               list_sum(list_transform(ev[1:len(ev)//2], x -> x * x))
               / list_sum(list_transform(ev, x -> x * x))), 6) AS fid
    FROM v
),
g AS (
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MIN(fid) AS min_fidelity, MAX(fid) AS max_fidelity,
           CAST(SUM(CAST(fid AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS sum_micro
    FROM f GROUP BY label
)
SELECT label, n_vecs, min_fidelity, max_fidelity,
       CAST((2 * sum_micro + n_vecs) // (2 * n_vecs) AS DOUBLE)
           / 1000000.0 AS mean_fidelity
FROM g
"""


@query("embedding_truncation_fidelity", oracle=_TRUNC_FIDELITY_ORACLE)
def embedding_truncation_fidelity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-truncation audit: per label, how much of each
    vector's L2 norm the FIRST HALF of its dimensions carries —
    fidelity = ||v[:d/2]|| / ||v||, which equals the cosine between
    the full vector and its zero-padded truncation. This is the
    measurement run before shipping shortened embeddings (MRL-style)
    to cut index cost 2x.

    Exactness: both norms fold the array left-to-right in doubles
    (identical order on both engines), one division + sqrt are single
    correctly-rounded ops, each row rounds to 6 dp, the per-label
    mean sums those 6-dp values as DECIMAL (exact, order-free) and
    rounds HALF-UP in integer micro-units. ACCEPTED tie exposure
    (documented per round-10 advice): the 6-dp ROUND acts on a
    computed sqrt-of-quotient double — Spark rounds its shortest
    decimal repr, DuckDB the raw binary, and the engines could split
    if a fidelity ever landed within ~1e-16 of an exact 6-dp tie. No
    input at any tested scale factor does, and the integer-half-up
    alternative would just move the identical double→decimal cast
    divergence one step earlier. Scale posture: scan-local
    per-row arithmetic + one map-side-combinable groupBy(label) —
    zero joins, zero corpus-sized shuffles."""
    em = dd.spread(load(spark, sf_dir, "embeddings"))
    ev = F.transform("embedding", lambda x: x.cast("double"))
    v = em.select("vec_id", "label", ev.alias("ev"))
    half = F.slice(
        F.col("ev"), 1, (F.size("ev") / 2).cast("int")
    )
    ssum = lambda c: F.aggregate(  # noqa: E731 - local fold helper
        c, F.lit(0.0), lambda acc, x: acc + x * x
    )
    fid = F.round(F.sqrt(ssum(half) / ssum(F.col("ev"))), 6)
    f = v.select("label", fid.alias("fid"))
    g = f.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.min("fid").alias("min_fidelity"),
        F.max("fid").alias("max_fidelity"),
        (F.sum(F.col("fid").cast("decimal(18,6)")) * 1000000)
        .cast("long")
        .alias("sum_micro"),
    )
    return g.select(
        "label",
        "n_vecs",
        "min_fidelity",
        "max_fidelity",
        (
            F.expr(
                "CAST((2 * sum_micro + n_vecs) DIV (2 * n_vecs) AS DOUBLE)"
            )
            / F.lit(1000000.0)
        ).alias("mean_fidelity"),
    )


# --- Mann-Whitney U (rank-sum) drift test -------------------------------------

_MWU_ORACLE = f"""
WITH {_QUALITY_SQL},
d AS (SELECT source, CAST(ROUND(q * 10000) AS BIGINT) AS s4 FROM qscore),
sc AS (
    SELECT source, s4, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1, 2
),
gc AS (SELECT s4, CAST(SUM(c) AS BIGINT) AS g FROM sc GROUP BY 1),
cb AS (
    SELECT s4, g,
           CAST(SUM(g) OVER (ORDER BY s4 ROWS UNBOUNDED PRECEDING) - g
                AS BIGINT) AS cum_before
    FROM gc
),
src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM sc GROUP BY 1),
tot AS (
    SELECT CAST(SUM(g) AS BIGINT) AS n,
           CAST(SUM(CAST(g AS DECIMAL(12,0)) * g * g - g) AS DOUBLE) AS t3
    FROM gc
),
r2 AS (
    SELECT sc.source,
           CAST(SUM(sc.c * (2 * cb.cum_before + cb.g + 1)) AS BIGINT)
               AS rank2_sum
    FROM sc JOIN cb USING (s4) GROUP BY sc.source
),
u AS (
    SELECT src.source, src.n_s, tot.n - src.n_s AS n_r,
           r2.rank2_sum - src.n_s * (src.n_s + 1) AS u2,
           tot.n, tot.t3
    FROM src JOIN r2 USING (source), tot
)
SELECT source, n_s, n_r, u2,
       (CAST(u2 AS DOUBLE) - CAST(n_s AS DOUBLE) * CAST(n_r AS DOUBLE))
       / sqrt((CAST(n_s AS DOUBLE) * CAST(n_r AS DOUBLE) / 3)
              * ((CAST(n AS DOUBLE) + 1)
                 - t3 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))))
           AS z,
       abs((CAST(u2 AS DOUBLE) - CAST(n_s AS DOUBLE) * CAST(n_r AS DOUBLE))
       / sqrt((CAST(n_s AS DOUBLE) * CAST(n_r AS DOUBLE) / 3)
              * ((CAST(n AS DOUBLE) + 1)
                 - t3 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))))
           > CAST('1.96' AS DOUBLE) AS significant
FROM u
"""


@query("stat_mann_whitney_u", oracle=_MWU_ORACLE)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) drift test per SOURCE: each
    source's quality-score sample against the rest of the corpus, with
    the tie-corrected normal approximation and a 5%-level significance
    flag — the rank-based location-shift complement to the
    distributional `stat_ks_two_sample` (U reacts to median shifts KS
    can under-weight, and vice versa).

    Exactness: scores become integer ten-thousandths (score classes);
    tied ranks are handled EXACTLY in doubled-rank integers — a class
    with g members starting after cum_before others has average rank
    (2*cum_before + g + 1)/2, so 2*R_s = sum(c_s * (2*cum_before + g
    + 1)) stays int64 and U2 = 2U = 2R_s - n_s(n_s+1) is exact. The
    tie-correction term sum(g^3 - g) accumulates as DECIMAL (exact,
    order-free, no int64 overflow past g ~ 2M). z is an UN-rounded
    double from an identical op sequence on those exact integers —
    bit-identical on both engines, no decimal-tie exposure.

    Scale posture: one scan-local score projection into a map-side
    combinable groupBy((source, class)); everything downstream runs at
    |classes| or |sources| cardinality (the global rank prefix-sum
    window spans |classes| rows — bounded by the 10^4 score quantum,
    not the corpus)."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        "source",
        F.round(tf.quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("s4"),
    )
    sc = (
        d.groupBy("source", "s4")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # class cardinality; 4 consumers
    )
    gc = sc.groupBy("s4").agg(F.sum("c").cast("long").alias("g"))
    w = Window.orderBy("s4").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cb = gc.select(
        "s4",
        "g",
        (F.sum("g").over(w) - F.col("g")).cast("long").alias("cum_before"),
    )
    src = sc.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    tot = gc.agg(
        F.sum("g").cast("long").alias("n"),
        F.sum(
            F.col("g").cast("decimal(12,0)") * F.col("g") * F.col("g")
            - F.col("g")
        )
        .cast("double")
        .alias("t3"),
    )
    r2 = (
        sc.join(F.broadcast(cb), "s4")
        .groupBy("source")
        .agg(
            F.sum(
                F.col("c") * (2 * F.col("cum_before") + F.col("g") + 1)
            )
            .cast("long")
            .alias("rank2_sum")
        )
    )
    u = (
        src.join(F.broadcast(r2), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            (F.col("n") - F.col("n_s")).alias("n_r"),
            (
                F.col("rank2_sum") - F.col("n_s") * (F.col("n_s") + 1)
            ).alias("u2"),
            "n",
            "t3",
        )
    )
    ns_d = F.col("n_s").cast("double")
    nr_d = F.col("n_r").cast("double")
    n_d = F.col("n").cast("double")
    z = (F.col("u2").cast("double") - ns_d * nr_d) / F.sqrt(
        (ns_d * nr_d / F.lit(3))
        * ((n_d + F.lit(1)) - F.col("t3") / (n_d * (n_d - F.lit(1))))
    )
    return u.select(
        "source",
        "n_s",
        "n_r",
        "u2",
        z.alias("z"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )
