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
