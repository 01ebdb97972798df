"""Round-8 extension family: URL-level canonicalization + dedup — the
first stage of every web-corpus pipeline (normalize the fetch URL,
collapse tracking-parameter/case/port/fragment variants, keep one
document per canonical resource) — re-expressed Spark-first.

The synthetic corpus has no URL column, so each query CONSTRUCTS a
deterministic messy URL per document from (doc_id, source, lang) with
the identical expression on both engines — scheme/host case flips,
optional ``www.``, an explicit default port, a trailing slash, shuffled
tracking parameters, and a fragment, all keyed off doc_id residues so
every mess is reproducible — then exercises the GENERIC canonicalizer
(``functions.urls.canonicalize_url``), which never sees how the mess
was made. Canonical collisions are real: residue classes (lower(source), lang, doc_id%10, doc_id%5) share one canonical URL.

Scale posture (100 TB): URL construction and canonicalization are
scan-local string expressions (no UDF, no shuffle); the dedup is two
map-side-combinable hash groupBys — (canonical_url, url) partials, then
canonical_url — so the only corpus-wide shuffle moves pre-aggregated
(canonical, variant) pairs, bounded by the distinct-URL count, never
raw documents. No join, no window, no skew exposure beyond genuinely
hot URLs (which partial aggregation absorbs).
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
