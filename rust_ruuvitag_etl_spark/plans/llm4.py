"""Fourth LLM-pipeline wave: text RETRIEVAL primitives — the inverted
index and TF-IDF scoring that turn a document corpus into a searchable /
rankable artifact (the retrieval side of RAG data preparation). Pure
DataFrame plans with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from .registry import query


@query(
    "text_inverted_index",
    oracle="""
WITH toks AS (
    SELECT doc_id, unnest(list_distinct(
               string_split_regex(lower(trim(text)), '\\s+'))) AS token
    FROM documents WHERE trim(text) <> ''
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       list_sort(list(doc_id)) AS postings
FROM toks
GROUP BY token
HAVING COUNT(*) >= 50
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: token → document frequency + sorted posting list
    (restricted to tokens appearing in ≥50 docs so the output is the
    index HEAD — at 100 TB postings for rare terms stay sharded, never
    collected into one row). One explode + one shuffle keyed by token;
    per-doc distinct happens in-row BEFORE the explode so the shuffle
    carries each (doc, token) once. The core retrieval artifact every
    search/RAG corpus build produces."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(tf.ws_tokens(F.lower(F.col("text"))))
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_sort(F.collect_list("doc_id")).alias("postings"),
        )
        .filter(F.col("df") >= 50)
    )


@query(
    "text_tfidf_scores",
    oracle="""
WITH d AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
    FROM documents WHERE trim(text) <> ''
),
n AS (SELECT COUNT(*) AS n_docs FROM d),
tf_t AS (
    SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf_raw
    FROM (SELECT doc_id, unnest(toks) AS token FROM d)
    GROUP BY doc_id, token
),
df_t AS (
    SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM tf_t GROUP BY token
)
SELECT t.doc_id, t.token, t.tf_raw,
       ROUND(t.tf_raw * ln(CAST(n.n_docs AS DOUBLE) / d2.df), 6) AS tfidf
FROM tf_t t JOIN df_t d2 ON d2.token = t.token CROSS JOIN n
WHERE d2.df >= 20 AND t.tf_raw >= 3
""",
)
def text_tfidf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term weighting: raw term frequency per (doc, token) ×
    ln(N/df). The document-frequency table is small (vocabulary-sized)
    and broadcasts into the tf table; N is a 1-row broadcast scalar —
    so the only wide shuffle is the (doc, token) count. Output bounded
    to meaningful cells (df ≥ 20, tf ≥ 3). Both engines compute the
    same exact-integer tf/df and one identical ln+multiply, rounded
    once."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    toks = docs.select(
        "doc_id", F.explode(tf.ws_tokens(F.lower(F.col("text")))).alias("token")
    )
    tf_t = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf_raw"))
    df_t = tf_t.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf_t.join(F.broadcast(df_t.filter(F.col("df") >= 20)), "token")
        .filter(F.col("tf_raw") >= 3)
        .crossJoin(F.broadcast(n_docs))  # 1-row broadcast scalar
        .select(
            "doc_id",
            "token",
            "tf_raw",
            F.round(
                F.col("tf_raw")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
