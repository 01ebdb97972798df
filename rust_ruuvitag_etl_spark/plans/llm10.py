"""Round-7 additions: substring-level deduplication — exact duplicated
token spans ACROSS documents via winnowing fingerprints (Schleimer,
Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm; the span-level
dedup mode of Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better", re-expressed for Spark: the suffix-array
machinery of that paper needs shared memory, winnowing needs only
equi-joins and windows).

Registered AFTER the earlier families so the driver's first-50
correctness sample keeps the reference-parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators.dedup import spread
from ..sources import load
from .registry import query

# Parameters of the substring-dedup spec. K tokens per gram, winnow
# window W gram positions, so every duplicated span of at least
# L = K + W - 1 tokens fully contains some window of W consecutive
# gram positions — the winnowing guarantee. DF_CAP is the stop-gram
# discipline (mirrored in the oracle, so it is part of the spec, not a
# recall hole): grams whose corpus-wide occurrence count exceeds it are
# excluded from span reconstruction.
K = 8
W = 4
L = K + W - 1
DF_CAP = 50
_POS_BITS = 1 << 20  # packed-key position field; docs < 2^20 tokens
_GH_MOD = 1 << 40  # 40-bit gram hash (fits key = gh*2^20 + pos in 60)

_SUBSTRING_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
grams AS (
    SELECT doc_id, pg.pos AS pos,
           {tf.h60_sql('pg.g')} % {_GH_MOD} AS gh
    FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                   range(1, greatest(len(t) - {K - 1}, 0) + 1),
                   i -> {{'pos': i,
                          'g': array_to_string(t[i:i+{K - 1}], ' ')}})) AS pg
        FROM toks)
),
ok AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) <= {DF_CAP}),
m AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
    FROM grams a JOIN grams b USING (gh) JOIN ok USING (gh)
    WHERE a.doc_id < b.doc_id
),
runs AS (
    SELECT id_a, id_b, pa, pb, pa - pb AS diag,
           pa - row_number() OVER (
               PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS grp
    FROM m
)
SELECT id_a, id_b,
       MIN(pa) AS start_a,
       MIN(pb) AS start_b,
       CAST(COUNT(*) + {K - 1} AS BIGINT) AS span_len
FROM runs GROUP BY id_a, id_b, diag, grp
HAVING COUNT(*) + {K - 1} >= {L}
"""


def _grams(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, gh): 40-bit portable hash of the K-token gram at
    every 1-based position. Strings never leave this stage — every
    downstream consumer works on the hash (the MinHash discipline)."""
    toks = docs.select(
        "doc_id", tf.ws_tokens(F.lower(F.col("text"))).alias("t")
    ).filter(F.size("t") >= K)
    pg = F.transform(
        F.sequence(F.lit(1), F.size("t") - (K - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(F.col("t"), i, K)).alias("g"),
        ),
    )
    return toks.select("doc_id", F.explode(pg).alias("pg")).select(
        "doc_id",
        F.col("pg.pos").alias("pos"),
        F.pmod(
            tf.h60(F.col("pg.g"), family="portable"), F.lit(_GH_MOD)
        ).alias("gh"),
    )


@query("dedup_substring_spans", oracle=_SUBSTRING_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated token spans >= L=11 tokens across documents —
    the substring-level dedup mode (document-, line-, chunk(CDC)-, and
    semantic-level already exist): for every ordered doc pair, every
    maximal diagonal run of matching K=8-token grams, reported as
    (id_a, id_b, start_a, start_b, span_len).

    The ORACLE IS THE BRUTE-FORCE DEFINITION (all-pairs gram join, no
    winnowing), so the driver's hash-match re-proves the winnowing
    lemma on real data every round rather than trusting it:

    1. CANDIDATES — winnowing: per document, the K-gram hashes pack
       with their position into one BIGINT (gh*2^20 + pos; pos unique
       -> window minima are unambiguous without an argmin, which
       neither engine exposes as a window function), and each W=4-gram
       window's MINIMUM key is a fingerprint. Every duplicated span of
       >= K+W-1 tokens contains a full window of W gram positions with
       identical hash sequences in both documents, and the min 40-bit
       hash of that window is the same on both sides, so the
       fingerprint equi-join on gh finds EVERY qualifying pair — even a
       40-bit collision inside the window preserves the match, because
       the join key IS the colliding hash. Fingerprint density ~2/(W+1)
       of gram positions; the join keys are window-MINIMA of uniform
       hashes, and measured gram df over this corpus is <= 4 (a
       web-scale corpus would add a fingerprint-df cap mirrored into
       the oracle, the CDC stop-chunk discipline, trading boilerplate
       spans for boundedness).
    2. RECONSTRUCTION — candidate pairs join the full gram table twice
       (id equi-join, then (id, gh) equi-join), so the matched-position
       volume is Sigma_pairs(shared grams), never all-pairs; grams with
       corpus df > DF_CAP=50 are excluded identically on both engines.
       Maximal runs come from the classic gaps-and-islands grouping on
       each (pair, pa - pb) diagonal: pa - row_number() is constant
       exactly on consecutive-position runs.

    100 TB posture: gram/fingerprint extraction is scan-local behind
    one explode; the only corpus-wide shuffles are the fingerprint
    equi-join and the gram-df aggregate (map-side combinable); the
    diagonal window partitions by (pair, diag) — never partition-less.
    Reference analog: the dedup discipline of ``main.rs:118-126``
    (last-wins per key) generalized from whole readings to shared
    content spans."""
    docs = spread(load(spark, sf_dir, "documents"))
    grams = _grams(docs)

    # winnowing fingerprints: min packed key over each W-gram window
    key = F.col("gh") * _POS_BITS + F.col("pos")
    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, W - 1)
    )
    fp = (
        grams.select("doc_id", F.min(key).over(win).alias("mk"))
        # integer DIV, not / : mk reaches 2^60, beyond double's 53-bit
        # mantissa — float division would corrupt the unpacked hash
        .select("doc_id", F.expr(f"mk DIV {_POS_BITS}").alias("gh"))
        .distinct()
    )
    cand = (
        fp.select(F.col("doc_id").alias("id_a"), "gh")
        .join(fp.select(F.col("doc_id").alias("id_b"), "gh"), "gh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # span reconstruction over df-capped grams, scoped to candidates
    gok = grams.join(
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("gh"),
        "gh",
    )
    ga = gok.select(
        F.col("doc_id").alias("id_a"), F.col("pos").alias("pa"), "gh"
    )
    gb = gok.select(
        F.col("doc_id").alias("id_b"), F.col("pos").alias("pb"), "gh"
    )
    m = cand.join(ga, "id_a").join(gb, ["id_b", "gh"])
    diag_w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    return (
        m.withColumn("diag", F.col("pa") - F.col("pb"))
        .withColumn("grp", F.col("pa") - F.row_number().over(diag_w))
        .groupBy("id_a", "id_b", "diag", "grp")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count(F.lit(1)) + (K - 1)).alias("span_len"),
        )
        .filter(F.col("span_len") >= L)
        .select("id_a", "id_b", "start_a", "start_b", "span_len")
    )


# --- Gopher repetition filters ---------------------------------------------
# Rae et al. 2021 ("Scaling Language Models: ... Gopher"), table A1:
# repetitious documents are filtered by the fraction of CHARACTERS
# covered by the most frequent word n-gram (n=2,3,4) and by all
# duplicated word n-grams (n=5). The line-based Gopher rules are
# omitted: this corpus has no newlines (dedup_exact_lines handles the
# segment level). Thresholds are the paper's: 0.20 / 0.18 / 0.16 for
# top-2/3/4-gram, 0.15 for dup-5-gram.

_GOPHER_ORACLE = f"""
WITH base AS (
    SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t,
           length(trim(text)) AS n_chars
    FROM documents WHERE trim(text) <> ''
),
g2 AS (
    SELECT doc_id, n_chars, UNNEST(list_transform(
        range(1, greatest(len(t) - 1, 0) + 1),
        i -> array_to_string(t[i:i+1], ' '))) AS g FROM base
),
g3 AS (
    SELECT doc_id, n_chars, UNNEST(list_transform(
        range(1, greatest(len(t) - 2, 0) + 1),
        i -> array_to_string(t[i:i+2], ' '))) AS g FROM base
),
g4 AS (
    SELECT doc_id, n_chars, UNNEST(list_transform(
        range(1, greatest(len(t) - 3, 0) + 1),
        i -> array_to_string(t[i:i+3], ' '))) AS g FROM base
),
g5 AS (
    SELECT doc_id, n_chars, UNNEST(list_transform(
        range(1, greatest(len(t) - 4, 0) + 1),
        i -> array_to_string(t[i:i+4], ' '))) AS g FROM base
),
t2 AS (
    SELECT doc_id, cnt * length(g) AS num FROM (
        SELECT doc_id, g, COUNT(*) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY COUNT(*) DESC, length(g) DESC, g) AS rn
        FROM g2 GROUP BY doc_id, g) WHERE rn = 1
),
t3 AS (
    SELECT doc_id, cnt * length(g) AS num FROM (
        SELECT doc_id, g, COUNT(*) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY COUNT(*) DESC, length(g) DESC, g) AS rn
        FROM g3 GROUP BY doc_id, g) WHERE rn = 1
),
t4 AS (
    SELECT doc_id, cnt * length(g) AS num FROM (
        SELECT doc_id, g, COUNT(*) AS cnt,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY COUNT(*) DESC, length(g) DESC, g) AS rn
        FROM g4 GROUP BY doc_id, g) WHERE rn = 1
),
d5 AS (
    SELECT doc_id, CAST(SUM(cnt * length(g)) AS BIGINT) AS num FROM (
        SELECT doc_id, g, COUNT(*) AS cnt FROM g5 GROUP BY doc_id, g
        HAVING COUNT(*) >= 2) GROUP BY doc_id
)
SELECT b.doc_id,
       ROUND(COALESCE(t2.num, 0) / CAST(b.n_chars AS DOUBLE), 6)
           AS top2gram_frac,
       ROUND(COALESCE(t3.num, 0) / CAST(b.n_chars AS DOUBLE), 6)
           AS top3gram_frac,
       ROUND(COALESCE(t4.num, 0) / CAST(b.n_chars AS DOUBLE), 6)
           AS top4gram_frac,
       ROUND(COALESCE(d5.num, 0) / CAST(b.n_chars AS DOUBLE), 6)
           AS dup5gram_frac,
       (5 * COALESCE(t2.num, 0) <= 1 * b.n_chars
        AND 50 * COALESCE(t3.num, 0) <= 9 * b.n_chars
        AND 25 * COALESCE(t4.num, 0) <= 4 * b.n_chars
        AND 20 * COALESCE(d5.num, 0) <= 3 * b.n_chars) AS keep
FROM base b
LEFT JOIN t2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
LEFT JOIN t4 USING (doc_id)
LEFT JOIN d5 USING (doc_id)
"""


def _doc_grams(base: DataFrame, n: int) -> DataFrame:
    """Every word n-gram OCCURRENCE of every doc (duplicates kept)."""
    pg = F.transform(
        F.sequence(F.lit(1), F.size("t") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, n)),
    )
    return base.filter(F.size("t") >= n).select(
        "doc_id", "n_chars", F.explode(pg).alias("g")
    )


def _top_gram_cover(base: DataFrame, n: int) -> DataFrame:
    """(doc_id, num): characters covered by the doc's most frequent
    n-gram (count * gram length), ties broken (count desc, length
    desc, gram asc) identically on both engines."""
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("cnt"), F.desc(F.length("g")), F.asc("g")
    )
    return (
        _doc_grams(base, n)
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", (F.col("cnt") * F.length("g")).alias("num")
        )
    )


@query("text_gopher_repetition", oracle=_GOPHER_ORACLE)
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition-filter rules (Rae et al. 2021, table A1)
    — the canonical pre-training quality gate this corpus' 31-word
    vocabulary exercises hard: per document, the fraction of CHARACTERS
    covered by the most frequent 2/3/4-gram and by all duplicated
    5-grams, plus the keep/drop verdict at the paper's thresholds
    (0.20/0.18/0.16/0.15).

    Float discipline: every fraction is integer-count * gram-length
    over the doc's char total — ONE double division per emitted value,
    bit-identical across engines — and the keep verdict never touches
    a double at all: each threshold comparison is cross-multiplied
    into integer arithmetic (num/total <= 0.18 becomes
    50*num <= 9*total), so boundary documents cannot flip on an ulp.
    Ties for 'most frequent n-gram' break (count desc, length desc,
    gram asc) identically on both engines.

    100 TB posture: four scan-local explodes, each feeding a
    (doc_id, gram)-keyed map-side-combinable aggregate; the top-1
    selection windows partition by doc_id; everything joins back on
    doc_id. No corpus-wide key hotter than a single document's grams."""
    docs = spread(load(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        tf.ws_tokens(F.lower(F.col("text"))).alias("t"),
        F.length(F.trim("text")).alias("n_chars"),
    ).filter(F.size("t") > 0)
    t2 = _top_gram_cover(base, 2).withColumnRenamed("num", "num2")
    t3 = _top_gram_cover(base, 3).withColumnRenamed("num", "num3")
    t4 = _top_gram_cover(base, 4).withColumnRenamed("num", "num4")
    d5 = (
        _doc_grams(base, 5)
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.length("g")).alias("num5"))
    )
    out = (
        base.select("doc_id", "n_chars")
        .join(t2, "doc_id", "left")
        .join(t3, "doc_id", "left")
        .join(t4, "doc_id", "left")
        .join(d5, "doc_id", "left")
        .na.fill(0, ["num2", "num3", "num4", "num5"])
    )
    total = F.col("n_chars").cast("double")
    return out.select(
        "doc_id",
        F.round(F.col("num2") / total, 6).alias("top2gram_frac"),
        F.round(F.col("num3") / total, 6).alias("top3gram_frac"),
        F.round(F.col("num4") / total, 6).alias("top4gram_frac"),
        F.round(F.col("num5") / total, 6).alias("dup5gram_frac"),
        (
            (5 * F.col("num2") <= 1 * F.col("n_chars"))
            & (50 * F.col("num3") <= 9 * F.col("n_chars"))
            & (25 * F.col("num4") <= 4 * F.col("n_chars"))
            & (20 * F.col("num5") <= 3 * F.col("n_chars"))
        ).alias("keep"),
    )


# --- n-gram LM familiarity score --------------------------------------------

_FAMILIARITY_ORACLE = """
WITH base AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
bg AS (
    SELECT doc_id, UNNEST(list_transform(
        range(1, greatest(len(t) - 1, 0) + 1),
        i -> array_to_string(t[i:i+1], ' '))) AS g
    FROM base
),
cf AS (SELECT g, COUNT(*) AS c FROM bg GROUP BY g)
SELECT bg.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(cf.c) AS DOUBLE) / COUNT(*), 6) AS familiarity
FROM bg JOIN cf USING (g)
GROUP BY bg.doc_id
"""


@query("text_bigram_familiarity", oracle=_FAMILIARITY_ORACLE)
def text_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram LM quality proxy: each document scores the
    MEAN corpus frequency of its word bigrams (a doc of common,
    well-attested transitions scores high; gibberish scores ~1). The
    integer-exact stand-in for perplexity: a log-prob sum is a
    float fold whose rounding is order-dependent across engines,
    whereas a sum of integer corpus counts divided once is
    bit-identical — same quality ordering, oracle-exact.

    100 TB posture: the bigram 'model' is one map-side-combinable
    groupBy (count per distinct bigram); scoring joins occurrences to
    counts on the bigram key and aggregates per doc_id. The join's
    build side is the distinct-bigram count table — vocabulary-sized,
    not corpus-sized."""
    docs = spread(load(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", tf.ws_tokens(F.lower(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 2)
    bg = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, 2)),
            )
        ).alias("g"),
    )
    cf = bg.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    return (
        bg.join(cf, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("c").cast("double") / F.count(F.lit(1)), 6
            ).alias("familiarity"),
        )
    )


# --- quality-weighted importance sampling -----------------------------------

_IMPORTANCE_ORACLE = f"""
WITH base AS (
    SELECT doc_id,
           string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
q AS (
    SELECT doc_id,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_distinct
    FROM base
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 6) AS ttr,
       {tf.h60_sql("CAST(doc_id AS VARCHAR)")} % 1000000 AS bucket
FROM q
WHERE {tf.h60_sql("CAST(doc_id AS VARCHAR)")} % 1000000
      < (1000000 * n_distinct) // n_tokens
"""


@query("sample_importance_weighted", oracle=_IMPORTANCE_ORACLE)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling (the DSIR idea — Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling" — with a transparent quality weight): each document is
    kept with probability equal to its TYPE-TOKEN RATIO
    (distinct/total tokens — repetitious docs get down-weighted,
    linguistically diverse docs survive), decided by comparing a
    deterministic per-doc hash bucket against the weight.

    REPRODDUCIBLE SAMPLING, NO RNG: the accept test is
    ``h60(doc_id) % 10^6 < floor(10^6 * w)`` and the floor of the
    rational weight is computed as ``(10^6 * n_distinct) DIV n_tokens``
    — pure integer arithmetic on both engines, so the sample is a pure
    function of the corpus (re-runs, retries, and the DuckDB oracle
    all select the identical row set; the discipline of
    sample_hash_deterministic applied to non-uniform weights).

    100 TB posture: entirely scan-local — one projection computes
    tokens, distinct count, hash, and the accept predicate next to the
    parquet scan; no shuffle at all, and the filter prunes before
    anything wide happens downstream."""
    docs = spread(load(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", tf.ws_tokens(F.lower(F.col("text"))).alias("t")
    ).filter(F.size("t") > 0)
    q = base.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
    )
    bucket = F.pmod(
        tf.h60(F.col("doc_id").cast("string"), family="portable"),
        F.lit(1000000),
    )
    thresh = F.expr("(1000000 * n_distinct) DIV n_tokens")
    return (
        q.withColumn("bucket", bucket)
        .filter(F.col("bucket") < thresh)
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("n_distinct") / F.col("n_tokens").cast("double"), 6
            ).alias("ttr"),
            "bucket",
        )
    )


# --- substring dedup, remediation stage --------------------------------------

_SCRUB_ORACLE = f"""
WITH spans AS ({_SUBSTRING_ORACLE}),
toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
tok AS (
    SELECT doc_id, UNNEST(list_transform(range(1, len(t) + 1),
           i -> {{'pos': i, 'w': t[i]}})) AS pw
    FROM toks
),
removed AS (
    SELECT DISTINCT id_b AS doc_id, UNNEST(range(start_b,
           start_b + span_len)) AS pos
    FROM spans
)
SELECT tok.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(removed.pos) AS BIGINT) AS n_removed,
       string_agg(CASE WHEN removed.pos IS NULL THEN tok.pw.w END,
                  ' ' ORDER BY tok.pw.pos) AS clean_text
FROM tok
LEFT JOIN removed
  ON removed.doc_id = tok.doc_id AND removed.pos = tok.pw.pos
WHERE tok.doc_id IN (SELECT DISTINCT id_b FROM spans)
GROUP BY tok.doc_id
"""


@query("dedup_substring_scrub", oracle=_SCRUB_ORACLE)
def dedup_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMEDIATION stage of substring dedup (Lee et al. 2022
    actually DELETE the duplicated span, they don't just report it):
    for every document that appears as the HIGHER doc_id of a reported
    span (the lower id keeps the canonical occurrence — the
    min-doc_id-wins discipline of dedup_exact_documents applied at
    span granularity), excise the duplicated token positions and emit
    (doc_id, n_tokens, n_removed, clean_text).

    Overlapping spans need no interval-merge pass: removal positions
    explode per span and DISTINCT on (doc_id, pos) collapses overlaps
    exactly; the clean text reassembles from the surviving positions
    in order. Output restricted to affected documents (the scrubbed
    corpus is this result unioned with untouched docs — mirrored
    semantics on both engines).

    100 TB posture: spans come from the winnowing pipeline (see
    dedup_substring_spans); removal positions are span-length-bounded;
    the excision itself is one anti-join on (doc_id, pos) against a
    scan-local posexplode, and the reassembly groups by doc_id —
    everything keyed at document granularity, no corpus-wide hot key."""
    spans = dedup_substring_spans(spark, sf_dir)
    removed = spans.select(
        F.col("id_b").alias("doc_id"),
        F.explode(
            F.sequence(
                F.col("start_b"),
                F.col("start_b") + F.col("span_len") - 1,
            )
        ).alias("pos"),
    ).distinct()
    affected = removed.select("doc_id").distinct()
    docs = spread(load(spark, sf_dir, "documents"))
    tok = (
        docs.select(
            "doc_id", tf.ws_tokens(F.lower(F.col("text"))).alias("t")
        )
        .filter(F.size("t") > 0)
        .join(affected, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.posexplode("t").alias("pos0", "w"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    )
    kept = tok.join(removed, ["doc_id", "pos"], "left_anti")
    total = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    n_rm = removed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_removed")
    )
    kept_agg = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
        ).alias("clean_text")
    )
    # left join: a FULLY scrubbed doc (identical twin of a lower id)
    # has zero kept tokens and must still emit, clean_text NULL —
    # matching SQL string_agg-over-no-rows semantics
    return (
        total.join(n_rm, "doc_id")
        .join(kept_agg, "doc_id", "left")
        .select("doc_id", "n_tokens", "n_removed", "clean_text")
    )
