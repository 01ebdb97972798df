"""Round-8 extension families: the web-corpus front AND back doors of
an LLM data pipeline, re-expressed Spark-first —

* URL canonicalization + dedup (the FIRST stage of every web-corpus
  pipeline: normalize the fetch URL, collapse
  tracking-parameter/case/port/fragment variants, keep one document
  per canonical resource) plus the stripped-tracker audit;
* PII governance (email/phone/IPv4 detection and typed-placeholder
  REDACTION — the release gate before any corpus ships);
* deterministic train/validation/test SPLITS (portable-hash bucketing
  that never reassigns existing docs) plus the split-balance report;
* in-engine BPE TOKENIZER TRAINING (the first merge rules learned on
  the word-frequency table).

The synthetic corpus has no URL or PII content, so those queries
CONSTRUCT deterministic inputs per document from (doc_id, source,
lang) with the identical expression on both engines — then exercise
the GENERIC operators (``functions/urls.py``, ``functions/pii.py``),
which never see how the mess was made. URL canonical collisions are
real: residue classes (lower(source), lang, doc_id%10, doc_id%5)
share one canonical URL at every scale factor.

Scale posture (100 TB): construction, canonicalization, PII regexes,
and split bucketing are scan-local expressions (no UDF); the dedups
and reports are map-side-combinable hash groupBys whose shuffles move
pre-aggregated class/variant rows, never documents; BPE's corpus-scale
work is one tokenize+count pass, with merge rounds on the |vocab|-row
frequency table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import pii as pf
from ..functions import urls as uf
from ..operators import dedup as dd
from ..sources import load
from .registry import query

# --- the deterministic messy-URL construction (both engines) --------------


def _raw_url() -> Column:
    d = F.col("doc_id")
    page = (d % 5).cast("string")
    sortp = F.when(d % 5 < 2, F.lit("&sort=asc")).otherwise(F.lit(""))
    camp = F.when(
        d % 9 < 4, F.concat(F.lit("&utm_campaign=w"), (d % 9).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(
        F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS")),
        F.lit("://"),
        F.when(d % 5 == 0, F.lit("WWW."))
        .when(d % 5 == 1, F.lit("www."))
        .otherwise(F.lit("")),
        F.when(d % 3 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.org"),
        F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc/"),
        (d % 10).cast("string"),
        F.when(d % 3 == 1, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("utm_source=feed&page="), page, sortp),
        ).otherwise(F.concat(F.lit("page="), page, sortp, camp)),
        F.when(d % 4 > 0, F.concat(F.lit("#s"), (d % 4).cast("string")))
        .otherwise(F.lit("")),
    )


_RAW_URL_SQL = """
(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
|| '://'
|| (CASE WHEN doc_id % 5 = 0 THEN 'WWW.'
         WHEN doc_id % 5 = 1 THEN 'www.' ELSE '' END)
|| (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
|| '.example.org'
|| (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
|| '/' || lang || '/doc/' || CAST(doc_id % 10 AS VARCHAR)
|| (CASE WHEN doc_id % 3 = 1 THEN '/' ELSE '' END)
|| '?'
|| (CASE WHEN doc_id % 2 = 0
        THEN 'utm_source=feed&page=' || CAST(doc_id % 5 AS VARCHAR)
             || (CASE WHEN doc_id % 5 < 2 THEN '&sort=asc' ELSE '' END)
        ELSE 'page=' || CAST(doc_id % 5 AS VARCHAR)
             || (CASE WHEN doc_id % 5 < 2 THEN '&sort=asc' ELSE '' END)
             || (CASE WHEN doc_id % 9 < 4
                     THEN '&utm_campaign=w' || CAST(doc_id % 9 AS VARCHAR)
                     ELSE '' END)
    END)
|| (CASE WHEN doc_id % 4 > 0 THEN '#s' || CAST(doc_id % 4 AS VARCHAR)
        ELSE '' END)
""".strip()


_URL_CANONICAL_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, {_RAW_URL_SQL} AS url FROM documents
),
c AS (
    SELECT doc_id, url, {uf.canonicalize_url_sql('url')} AS canonical_url
    FROM raw
),
g1 AS (
    SELECT canonical_url, url,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(doc_id) AS mn
    FROM c GROUP BY canonical_url, url
)
SELECT canonical_url,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       MIN(mn) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_raw_variants
FROM g1 GROUP BY canonical_url
"""


@query("dedup_url_canonical", oracle=_URL_CANONICAL_ORACLE)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: canonicalize every document's (constructed)
    fetch URL — lowercase scheme/host, strip ``www.``, drop the
    scheme-default port, collapse trailing slashes, drop the fragment,
    strip tracking parameters, sort the survivors — and keep one
    document per canonical resource (min doc_id), reporting group size
    and how many raw variants collapsed.

    Spark-first shape: canonicalization is a scan-local built-in
    string expression (``functions/urls.py`` — no UDF); the dedup is
    two map-side-combinable hash groupBys ((canonical, variant)
    partials first, so the exact variant count never needs a
    count-distinct expand), shuffling pre-aggregated pairs bounded by
    the distinct-URL count — never documents."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    c = docs.select(
        "doc_id", _raw_url().alias("url")
    ).select("doc_id", "url", uf.canonicalize_url(F.col("url")).alias("canonical_url"))
    g1 = c.groupBy("canonical_url", "url").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("mn")
    )
    return g1.groupBy("canonical_url").agg(
        F.sum("n").alias("n_docs"),
        F.min("mn").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_raw_variants"),
    )


_URL_TRACKING_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, {_RAW_URL_SQL} AS url FROM documents
),
qs AS (
    SELECT doc_id,
           regexp_extract(split_part(url, '#', 1), '\\?(.*)$', 1) AS q
    FROM raw
),
px AS (
    SELECT doc_id, unnest(string_split(q, '&')) AS p FROM qs
),
trk AS (
    SELECT doc_id, split_part(p, '=', 1) AS param
    FROM px
    WHERE p <> '' AND regexp_matches(p, '{uf.TRACKING_RE}')
)
SELECT param,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM trk GROUP BY param
"""


@query("url_tracking_param_stats", oracle=_URL_TRACKING_ORACLE)
def url_tracking_param_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit twin of ``dedup_url_canonical``: which tracking
    parameters appear in the corpus's raw URLs, how often, and in how
    many documents — the report a pipeline owner reads before trusting
    the stripping rules. Scan-local split/filter/explode into one
    hash groupBy keyed by parameter name (|tracker vocabulary| keys);
    the doc count dedups inside the aggregate."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    qs = docs.select(
        "doc_id",
        F.regexp_extract(
            F.substring_index(_raw_url(), "#", 1), r"\?(.*)$", 1
        ).alias("q"),
    )
    px = qs.select("doc_id", F.explode(F.split("q", "&")).alias("p"))
    trk = px.filter(
        (F.col("p") != "") & F.col("p").rlike(uf.TRACKING_RE)
    ).select("doc_id", F.substring_index("p", "=", 1).alias("param"))
    return trk.groupBy("param").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# --- PII governance ---------------------------------------------------------
#
# The corpus text is synthetic word soup with no real PII, so — like the
# URL family above — each query APPENDS deterministic PII snippets to
# the text (residue-keyed: emails on doc_id%3==0, phones on %4==1, IPv4s
# on %5==2, identically in both engines) and then exercises the GENERIC
# detector/redactor (functions/pii.py), which never sees the
# construction. Detection, counting, and redaction are scan-local regex
# expressions; the only shuffle in the summary is a map-side-combinable
# 1-row aggregate.


def _pii_text() -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" Contact user"), d.cast("string"),
                F.lit("@mail.example.com."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 1,
            F.concat(
                F.lit(" Call +1 (555) "),
                F.lpad((d % 10000).cast("string"), 4, "0"),
                F.lit(" now."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 2,
            F.concat(
                F.lit(" Host 10."), (d % 256).cast("string"),
                F.lit(".0."), (d % 100).cast("string"),
                F.lit(" logged."),
            ),
        ).otherwise(F.lit("")),
    )


_PII_TEXT_SQL = """
text
|| (CASE WHEN doc_id % 3 = 0
        THEN ' Contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com.'
        ELSE '' END)
|| (CASE WHEN doc_id % 4 = 1
        THEN ' Call +1 (555) ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             || ' now.'
        ELSE '' END)
|| (CASE WHEN doc_id % 5 = 2
        THEN ' Host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
             || CAST(doc_id % 100 AS VARCHAR) || ' logged.'
        ELSE '' END)
""".strip().replace("\n", " ")


def _pii_counts_sql_cols() -> str:
    cols = pf.pii_counts_sql("aug")
    return ", ".join(
        f"CAST({sql} AS INTEGER) AS {name}" for name, sql in cols.items()
    )


_PII_SCAN_ORACLE = f"""
WITH aug_t AS (
    SELECT doc_id, {_PII_TEXT_SQL} AS aug FROM documents
)
SELECT doc_id, {_pii_counts_sql_cols()},
       {pf.redact_pii_sql('aug')} AS redacted
FROM aug_t
WHERE len(regexp_extract_all(aug, '{pf.EMAIL_RE}'))
      + len(regexp_extract_all(aug, '{pf.PHONE_RE}'))
      + len(regexp_extract_all(aug, '{pf.IPV4_RE}')) > 0
"""


@query("governance_pii_scan", oracle=_PII_SCAN_ORACLE)
def governance_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scan + redaction: count emails / phone numbers /
    IPv4 addresses in the (PII-augmented) text and emit the redacted
    text with typed placeholders — only documents that actually contain
    PII surface, which is what a remediation queue consumes. The full
    redacted STRING is in the output, so the correctness hash pins the
    exact replacement spans, not just the counts.

    Scale posture: detection and redaction are scan-local regex
    expressions (functions/pii.py — no UDF); the PII filter prunes
    the output to affected documents; no shuffle at all (the plan is
    scan → project → filter)."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    aug = docs.select("doc_id", _pii_text().alias("aug"))
    counts = pf.pii_counts(F.col("aug"))
    scanned = aug.select(
        "doc_id",
        *[c.cast("int").alias(name) for name, c in counts.items()],
        pf.redact_pii(F.col("aug")).alias("redacted"),
    )
    return scanned.filter(
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")) > 0
    )


_PII_SUMMARY_ORACLE = f"""
WITH aug_t AS (
    SELECT doc_id, {_PII_TEXT_SQL} AS aug FROM documents
),
per_doc AS (
    SELECT doc_id, {_pii_counts_sql_cols()} FROM aug_t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_emails + n_phones + n_ipv4 > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_with_pii,
       CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       CAST(SUM(n_ipv4) AS BIGINT) AS total_ipv4
FROM per_doc
"""


@query("governance_pii_summary", oracle=_PII_SUMMARY_ORACLE)
def governance_pii_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII exposure report: document counts and per-class
    totals — the release-gate number a pipeline owner signs off on.
    One map-side-combinable 1-row aggregate over the scan-local
    per-document counts; at 100 TB the shuffle moves one partial row
    per task."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    counts = pf.pii_counts(_pii_text())
    per_doc = docs.select(
        *[c.cast("int").alias(name) for name, c in counts.items()]
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(
                (F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")) > 0,
                1,
            ).otherwise(0)
        ).cast("long").alias("n_docs_with_pii"),
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_phones").cast("long").alias("total_phones"),
        F.sum("n_ipv4").cast("long").alias("total_ipv4"),
    )


# --- deterministic corpus splits --------------------------------------------

from ..functions import text as tf  # noqa: E402  (portable h60 + SQL twin)

_SPLIT_BUCKETS = 100
_TRAIN_LT, _VAL_LT = 80, 90  # train < 80 <= validation < 90 <= test

_SPLIT_EXPR_SQL = (
    f"({tf.h60_sql('CAST(doc_id AS VARCHAR)')}) % {_SPLIT_BUCKETS}"
)

_SPLIT_ASSIGN_ORACLE = f"""
WITH b AS (
    SELECT doc_id, lang, CAST({_SPLIT_EXPR_SQL} AS INTEGER) AS bucket
    FROM documents
)
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < {_TRAIN_LT} THEN 'train'
            WHEN bucket < {_VAL_LT} THEN 'validation'
            ELSE 'test' END AS split
FROM b
"""


def _bucket() -> Column:
    return F.pmod(
        tf.h60(F.col("doc_id").cast("string"), family="portable"),
        F.lit(_SPLIT_BUCKETS),
    ).cast("int")


@query("corpus_split_assign", oracle=_SPLIT_ASSIGN_ORACLE)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment: bucket =
    portable-hash(doc_id) mod 100, train < 80 <= validation < 90 <=
    test — the content-independent split every training pipeline runs
    last, reproducible across engines, languages, and reruns because
    it depends only on the stable id (the md5-derived 'portable' hash
    family both engines compute bit-identically). Scan-local: zero
    shuffles, zero joins; adding documents never reassigns existing
    ones."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    b = _bucket()
    return docs.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        F.when(b < _TRAIN_LT, F.lit("train"))
        .when(b < _VAL_LT, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_SPLIT_STATS_ORACLE = f"""
WITH b AS (
    SELECT doc_id, lang, {_SPLIT_EXPR_SQL} AS bucket FROM documents
),
s AS (
    SELECT lang,
           CASE WHEN bucket < {_TRAIN_LT} THEN 'train'
                WHEN bucket < {_VAL_LT} THEN 'validation'
                ELSE 'test' END AS split
    FROM b
),
g AS (
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM s GROUP BY split, lang
),
t AS (SELECT split, CAST(SUM(n_docs) AS BIGINT) AS split_total FROM g GROUP BY split)
SELECT g.split, g.lang, g.n_docs, t.split_total,
       ROUND(CAST(g.n_docs AS DOUBLE) / t.split_total, 6) AS frac
FROM g JOIN t ON t.split = g.split
"""


@query("corpus_split_stats", oracle=_SPLIT_STATS_ORACLE)
def corpus_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split-balance report a pipeline owner checks before
    training: per-(split, lang) document counts and each language's
    share WITHIN its split — imbalance here (a language drifting
    between train and test) invalidates evaluation. Two map-side
    combinable groupBys on (split, lang) / (split) partials plus one
    broadcast join of the 3-row totals table — class-cardinality
    shuffles only."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    b = _bucket()
    s = docs.select(
        "lang",
        F.when(b < _TRAIN_LT, F.lit("train"))
        .when(b < _VAL_LT, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    g = s.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
    t = g.groupBy("split").agg(F.sum("n_docs").alias("split_total"))
    return g.join(F.broadcast(t), "split").select(
        "split",
        "lang",
        "n_docs",
        "split_total",
        F.round(
            F.col("n_docs").cast("double") / F.col("split_total"), 6
        ).alias("frac"),
    )


# --- in-engine BPE tokenizer training ---------------------------------------

BPE_MERGES = 3
_SEP = chr(31)  # unit separator: joins a word's current symbols; never
#                 appears in corpus text, so symbol boundaries are exact


def bpe_seed_rep(word: Column) -> Column:
    """SEP-joined single-char symbol string for ``word``: SEP before
    every char, then drop the leading SEP (equivalent to the oracle's
    rtrim-trailing form; avoids PySpark's two-arg rtrim signature
    ambiguity)."""
    return F.substring(
        F.regexp_replace(word, "(.)", _SEP + "$1"), 2, 2_000_000_000
    )


def bpe_rounds(
    vocab: DataFrame, n_rounds: int = BPE_MERGES
) -> tuple[list[DataFrame], DataFrame]:
    """Run ``n_rounds`` BPE merge rounds over ``vocab`` — columns
    ``rep`` (SEP-joined symbol string) and ``wc`` (word frequency),
    plus any CARRIED columns (e.g. the original ``word``, which the
    encode/vocab queries in plans/llm13.py need to join the final
    segmentation back to documents; carried columns pass through every
    round untouched). Returns (one 1-row rule DataFrame per round with
    columns (a, b, cnt, merge_rank), the re-segmented vocab after the
    LAST round).

    Per round: one scan-local pair explode into a map-side-combinable
    (a, b) groupBy, a 1-row distributed argmax (count DESC, then
    lexicographic — engine-stable), and a scan-local aggregate-lambda
    fold re-segmenting each word (greedy left-to-right; merging appends
    WITHOUT the separator so the fused symbol can immediately be the
    LEFT side of later pairs, but never re-matches the just-consumed
    rule). The vocab is localCheckpointed once per round (|vocab| rows
    — it feeds both the pair count and the re-segmentation)."""
    sep = F.lit(_SEP)
    carry = [c for c in vocab.columns if c != "rep"]
    rules: list[DataFrame] = []
    for i in range(1, n_rounds + 1):
        vocab = vocab.localCheckpoint(eager=True)  # |vocab| rows
        syms = F.split(F.col("rep"), _SEP)
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
                        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("cnt"))
        )
        rule = (
            pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .withColumn("merge_rank", F.lit(i))
        )
        rules.append(rule)
        merged = F.aggregate(
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.element_at(syms, 1),
            lambda acc, x: F.when(
                ((acc == F.col("a")) | acc.endswith(F.concat(sep, F.col("a"))))
                & (x == F.col("b")),
                F.concat(acc, x),
            ).otherwise(F.concat(acc, sep, x)),
        )
        # LEFT join on TRUE, not crossJoin: when a round finds NO pairs
        # (every word already fused to one symbol — legal on tiny
        # vocabularies), the 1-row rule side is EMPTY; a cross join
        # would annihilate the vocab, while the left join keeps every
        # word and the fold's null a/b sends each symbol down the
        # no-merge branch, leaving rep unchanged. The oracle twin uses
        # the same LEFT JOIN ON TRUE.
        vocab = vocab.join(
            F.broadcast(rule.select("a", "b")), F.lit(True), "left"
        ).select(merged.alias("rep"), *carry)
    return rules, vocab


def bpe_round_ctes(carry: str = "") -> str:
    """The p{{i}}/r{{i}}/v{{i}} CTE chain for ``BPE_MERGES`` merge
    rounds, starting from a CALLER-supplied ``v0`` with columns
    (rep, wc, <carried>). ``carry`` is a comma-TERMINATED projection
    prefix (e.g. ``'v.word, '``) propagated through every ``v{{i}}`` —
    the encode/vocab queries (plans/llm13.py) carry the original word
    so the final segmentation can join back to documents; training
    carries nothing."""
    sep = "chr(31)"
    parts = []
    for i in range(1, BPE_MERGES + 1):
        parts.append(
            f""",
p{i} AS (
    SELECT s[i] AS a, s[i+1] AS b, CAST(SUM(wc) AS BIGINT) AS cnt
    FROM (SELECT string_split(rep, {sep}) AS s, wc FROM v{i - 1}),
         LATERAL (SELECT unnest(range(1, len(s))) AS i)
    GROUP BY a, b
),
r{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
v{i} AS (
    SELECT {carry}list_reduce(string_split(v.rep, {sep}),
             (acc, x) -> CASE
                 WHEN (acc = r.a OR ends_with(acc, {sep} || r.a))
                      AND x = r.b
                 THEN acc || x ELSE acc || {sep} || x END) AS rep,
           v.wc
    FROM v{i - 1} v LEFT JOIN r{i} r ON TRUE
)"""
        )
    return "".join(parts)


# Shared corpus-word CTEs: dw = (doc_id, word) exploded from the
# lowercased whitespace tokenization (exactly functions.text.ws_tokens);
# w = the distinct-word frequency table all BPE work runs on.
BPE_WORDS_CTES = """
dw AS (
    SELECT doc_id, t AS word
    FROM (SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
          FROM documents WHERE trim(text) <> '')
    WHERE t <> ''
),
w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc FROM dw GROUP BY word)
""".strip()


def _bpe_oracle() -> str:
    """Unrolled BPE training oracle: vocab_0 = per-word symbol strings
    (one char per symbol, SEP-joined) weighted by word frequency; each
    round counts adjacent symbol pairs, picks argmax (count DESC, then
    lexicographic — engine-stable), and applies the merge via a
    list_reduce fold whose greedy left-to-right semantics exactly match
    the Spark aggregate-lambda fold (merging appends WITHOUT the
    separator, so the fused symbol can immediately participate as the
    left side of later pairs in the same word, but never re-matches the
    just-consumed rule — classic BPE)."""
    sep = "chr(31)"
    parts = [
        f"""
WITH {BPE_WORDS_CTES},
v0 AS (
    SELECT rtrim(regexp_replace(word, '(.)', '\\1' || {sep}, 'g'), {sep})
               AS rep,
           wc
    FROM w
)"""
    ]
    parts.append(bpe_round_ctes())
    union = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, a AS left_sym, b AS right_sym,"
        f" a || b AS merged_sym, cnt AS pair_count FROM r{i}"
        for i in range(1, BPE_MERGES + 1)
    )
    parts.append(
        f"""
SELECT CAST(merge_rank AS INTEGER) AS merge_rank, left_sym, right_sym,
       merged_sym, pair_count
FROM ({union})
"""
    )
    return "".join(parts)


@query("tokenizer_bpe_merges", oracle=_bpe_oracle())
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding TOKENIZER TRAINING, in-engine: learn the
    first 3 (BPE_MERGES) merge rules of a BPE vocabulary (Sennrich et al.
    2016) over the corpus — per round, the most frequent adjacent
    symbol pair (weighted by word frequency, ties broken
    lexicographically so the selection is engine-stable) becomes a new
    symbol and every word re-segments. Output: (merge_rank, left_sym,
    right_sym, merged_sym, pair_count) — the artifact a tokenizer
    trainer persists.

    Scale posture (the real reason BPE fits an engine): corpus-scale
    work is ONE tokenize + word-count pass; every merge round runs on
    the distinct-WORD frequency table (|vocab| rows, ≪ corpus), with
    one map-side-combinable pair-count groupBy, a 1-row distributed
    argmax (TakeOrderedAndProject), and a scan-local fold re-segmenting
    each word — no corpus re-reads, no driver-side loops over data. The
    vocab table is localCheckpointed once per round (it feeds both the
    pair count and the re-segmentation; ~|vocab| rows).

    Exactness: greedy merge application is an aggregate-lambda fold
    over SEP-joined symbol strings — merging appends WITHOUT the
    separator — and the DuckDB oracle replays every round with the
    IDENTICAL list_reduce fold, so the learned rules match
    bit-for-bit."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    w = (
        docs.select(
            F.explode(tf.ws_tokens(F.lower(F.col("text")))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = w.select(bpe_seed_rep(F.col("word")).alias("rep"), "wc")
    rules, _ = bpe_rounds(vocab)
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.select(
        F.col("merge_rank").cast("int").alias("merge_rank"),
        F.col("a").alias("left_sym"),
        F.col("b").alias("right_sym"),
        F.concat("a", "b").alias("merged_sym"),
        F.col("cnt").alias("pair_count"),
    )
