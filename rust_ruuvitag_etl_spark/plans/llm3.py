"""Third LLM-pipeline wave: the corpus-preparation operators a training
run needs between raw documents and the data loader — PII redaction,
token-window chunking, budgeted sequence packing, and stratified
sampling. All pure DataFrame plans with exact DuckDB oracles; the
deterministic-hash sampler reuses the portable md5 hash so both engines
pick the identical sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from .registry import query

# Conservative, dialect-portable patterns (same semantics in Java regex
# and DuckDB's RE2): emails and US-style phone numbers.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_redact",
    oracle=f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{_EMAIL}', '[EMAIL]', 'g'),
                      '{_PHONE}', '[PHONE]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE}')) AS BIGINT) AS n_phones
FROM documents
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails/phones → placeholder tokens) plus per-doc
    match counts — the compliance pass every training corpus runs before
    tokenization. Pure regexp expressions in WholeStageCodegen, zero
    shuffles; patterns restricted to the regex subset both engines parse
    identically."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
    )


@query(
    "text_chunk_documents",
    oracle="""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
    FROM documents WHERE trim(text) <> ''
),
c AS (
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS chunk_idx,
           array_to_string(toks[(i - 1) * 40 + 1 : (i - 1) * 40 + 50], ' ')
               AS chunk
    FROM t, LATERAL (
        SELECT unnest(range(1, greatest(CAST(ceil((len(toks) - 10)
                                        / 40.0) AS BIGINT), 1) + 1)) AS i)
)
SELECT doc_id, chunk_idx, chunk,
       CAST(len(string_split_regex(chunk, '\\s+')) AS BIGINT) AS chunk_tokens
FROM c
""",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking: 50-token chunks with 10-token overlap
    (stride 40) — the context-window preparation step for training and
    for embedding long documents. The chunk array is built in-row from
    the token array (sequence + transform + slice: one generator, no
    self-join), then exploded; everything stays in codegen and the only
    data movement is the explode itself."""
    docs = dd.spread(load(spark, sf_dir, "documents")).filter(
        F.trim(F.col("text")) != ""
    )
    toks = tf.ws_tokens(F.col("text"))
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(10)) / F.lit(40.0)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * 40 + 1, 50)),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "chunk",
            tf.token_count(F.col("chunk")).alias("chunk_tokens"),
        )
    )


@query(
    "pack_sequences_token_budget",
    oracle="""
WITH t AS (
    SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens
    FROM documents WHERE trim(text) <> ''
),
runs AS (
    SELECT doc_id, lang, doc_id % 64 AS shard, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY lang, doc_id % 64 ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens,
       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
FROM runs
""",
)
def pack_sequences_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to ~512-token training packs
    by running token total within each (lang, shard) — contiguous
    greedy packing, the deterministic shuffle-friendly variant of bin
    packing every data loader uses. The 64-way doc_id shard inside each
    language keeps the running-sum windows numerous and uniform (a
    lang-only partition would serialize a 100 TB corpus through ~10
    tasks); a pack is addressed by (lang, shard, pack_id). pack_id =
    floor(preceding cum / budget) is engine-exact integer math."""
    docs = load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    t = docs.select(
        "doc_id",
        "lang",
        F.pmod(F.col("doc_id"), F.lit(64)).alias("shard"),
        tf.token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "lang",
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(512)).alias("pack_id"),
    )


@query(
    "sample_stratified_by_lang",
    oracle=f"""
WITH h AS (
    SELECT doc_id, lang,
           {tf.h60_sql("lang || ':' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
    FROM documents
)
SELECT doc_id, lang FROM h WHERE bucket < 20
""",
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample per language via the portable deterministic
    hash — reproducible across engines, runs, and cluster sizes (no RNG
    state, no seed-per-partition drift), so train/eval splits are stable
    artifacts. Pure filter: pushes to the scan, zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    bucket = tf.h60(
        F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))
    ) % 100
    return docs.filter(bucket < 20).select("doc_id", "lang")


_QUALITY_EXPR_SQL = """
    ROUND((
      CASE WHEN (CASE WHEN len(ltoks) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_transform(ltoks, x -> LENGTH(x)))
                           AS DOUBLE) / len(ltoks) END) BETWEEN 3.0 AND 10.0
           THEN 1.0 ELSE 0.5 END
      + LEAST(GREATEST(
          (CASE WHEN len(ltoks) = 0 THEN 0.0
           ELSE CAST(len(list_filter(ltoks, x -> x IN
               ('the','a','an','and','or','of','to','in','is','it')))
               AS DOUBLE) / len(ltoks) END) * 4.0, 0.0), 1.0)
      + 1.0 - LEAST(GREATEST(
          (CASE WHEN LENGTH(text) = 0 THEN 0.0
           ELSE CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                     AS DOUBLE) / LENGTH(text) END) * 4.0, 0.0), 1.0)
    ) / 3.0, 4)
"""


@query(
    "corpus_prep_end_to_end",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang, text,
           {_QUALITY_EXPR_SQL} AS q
    FROM (SELECT doc_id, lang, text,
                 string_split_regex(lower(trim(text)), '\\s+') AS ltoks
          FROM documents)
),
kept AS (
    SELECT doc_id, lang,
           regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
               '[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '[PHONE]', 'g') AS rtext
    FROM scored WHERE q >= 0.5
),
fp AS (
    SELECT doc_id, lang, rtext,
           md5(lower(trim(regexp_replace(rtext, '\\s+', ' ', 'g')))) AS f
    FROM kept
),
winners AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
deduped AS (SELECT fp.* FROM fp JOIN winners USING (doc_id)),
sampled AS (
    SELECT doc_id, lang, rtext FROM deduped
    WHERE {tf.h60_sql("lang || ':' || CAST(doc_id AS VARCHAR)")} % 100 < 20
),
tok AS (
    SELECT doc_id, lang, doc_id % 64 AS shard,
           CAST(len(string_split_regex(trim(rtext), '\\s+')) AS BIGINT)
               AS n_tokens
    FROM sampled WHERE trim(rtext) <> ''
),
runs AS (
    SELECT doc_id, lang, shard, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM tok
)
SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard, n_tokens,
       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
FROM runs
""",
)
def corpus_prep_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-corpus preparation FLAGSHIP: the individual
    operators composed into one declarative plan — quality filter
    (≥0.5) → PII redaction → exact dedup on the redacted fingerprint
    (min doc_id wins) → deterministic 20% stratified sample → 512-token
    sequence packing per (lang, 64-way shard). One Catalyst plan,
    entirely JVM-side: filters/regex next to the scan, one dedup
    shuffle keyed by the fingerprint hash, sample as a pushable filter,
    one packing window — the whole pipeline a 100 TB pretraining run
    executes nightly, hash-verified end to end against the composed
    oracle."""
    docs = load(spark, sf_dir, "documents")
    kept = docs.filter(tf.quality_score(F.col("text")) >= 0.5).select(
        "doc_id",
        "lang",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"
        ).alias("rtext"),
    )
    fp = kept.withColumn("f", tf.fingerprint(F.col("rtext")))
    winners = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    deduped = fp.join(winners, "doc_id", "left_semi")
    bucket = tf.h60(
        F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))
    ) % 100
    sampled = deduped.filter(bucket < 20)
    tok = sampled.filter(F.trim(F.col("rtext")) != "").select(
        "doc_id",
        "lang",
        F.pmod(F.col("doc_id"), F.lit(64)).alias("shard"),
        tf.token_count(F.col("rtext")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return tok.select(
        "doc_id",
        "lang",
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(512)).alias("pack_id"),
    )
