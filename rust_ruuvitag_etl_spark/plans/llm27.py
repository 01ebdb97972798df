"""Round-12 wave 4 — three training-pipeline ops rounding out existing
families:

* `quality_lr_apply` — the APPLY side of the llm25 trainer (the
  tokenizer family's train→apply→vocab symmetry, here
  train→eval→apply): score EVERY document with the trained
  fixed-point weights and emit the per-doc decision — the projection
  a quality gate actually materializes before filtering. The oracle
  replays training and application verbatim.

* `eval_pass_at_k` — the unbiased pass@k estimator (Chen et al. 2021,
  "Evaluating Large Language Models Trained on Code", eq. 1):
  pass@k = 1 - C(n-c, k)/C(n, k) per problem. Samples are the events
  table grouped into problems of up to 16 attempts; an
  attempt "passes" by a deterministic portable-hash predicate. The
  combination ratio is computed as a quotient of EXACT BIGINT falling
  factorials (n <= 16, so no overflow), with the
  C(n-c,k) = 0 branch (c > n-k) yielding exactly 1.0 — one double
  division + ROUND(6) at the end per the house float discipline.

* `training_pack_sequences` — GPT-style concat-and-chunk sequence
  packing: per (lang, shard) stream, documents concatenate in doc_id
  order and split into fixed 256-token context windows;
  each doc gets its bin id, offset, and a spans-boundary flag. The
  prefix sum runs per (lang, shard) partition — shard =
  portable-hash(doc_id) mod 64, the shard-local packing a
  100 TB pipeline actually uses (a single global ordered window would
  serialize the corpus through one task; sharding keeps every
  partition bounded at N/(langs*shards) and fully parallel while
  preserving the in-shard packing semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from .llm25 import _LR_ITERS, _lr_bind_docs, _lr_feats_sql, _lr_iter_sql
from .registry import query

# --- quality_lr_apply -----------------------------------------------------


def _lr_apply_sql(dialect: str) -> str:
    W = f"wt{_LR_ITERS}"
    return f"""WITH {_lr_feats_sql(dialect)},
{_lr_iter_sql(dialect)}
SELECT f.doc_id,
       f.y,
       f.is_train,
       w.w0 + w.w1 * f.x1 + w.w2 * f.x2 AS z,
       CAST(CASE WHEN w.w0 + w.w1 * f.x1 + w.w2 * f.x2 >= 0
                 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM cf f CROSS JOIN {W} w
"""


@query("quality_lr_apply", oracle=_lr_apply_sql("duck"))
def quality_lr_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained quality classifier to the whole corpus: per-doc
    fixed-point margin ``z`` and the division-free decision
    ``pred = (z >= 0)`` alongside the gate label — the materialized
    projection a corpus filter consumes downstream. Re-derives the
    weights with the same unrolled integer chain (deterministic), so
    train/eval/apply agree exactly; the oracle replays everything."""
    _lr_bind_docs(spark, sf_dir)
    return spark.sql(_lr_apply_sql("spark"))


# --- eval_pass_at_k ---------------------------------------------------------

_PAK_GROUP = 16  # attempts per problem (last group may be smaller)
_PAK_PASS_MOD = 4  # attempt passes iff h60('pass:'||event_id) % 4 == 0
_PAK_KS = (1, 5, 10)


def _pak_ratio_sql(k: int) -> str:
    """ROUND(1 - C(n-c,k)/C(n,k), 6) as exact falling factorials: both
    products fit BIGINT (n <= 16). c > n-k => C(n-c,k)=0 => exactly 1.0.
    Dialect-neutral SQL (CASE/CAST/ROUND only)."""
    num = " * ".join(f"(n - c - {i})" for i in range(k))
    den = " * ".join(f"(n - {i})" for i in range(k))
    return (
        f"CASE WHEN n < {k} THEN NULL"
        f" WHEN c > n - {k} THEN CAST(1.0 AS DOUBLE)"
        f" ELSE ROUND(1.0 - CAST({num} AS DOUBLE)"
        f" / CAST({den} AS DOUBLE), 6) END"
    )


_PAK_ORACLE = f"""
WITH att AS (
    SELECT event_id // {_PAK_GROUP} AS problem_id,
           CASE WHEN ({tf.h60_sql("'pass:' || CAST(event_id AS VARCHAR)")})
                     % {_PAK_PASS_MOD} = 0
                THEN 1 ELSE 0 END AS ok
    FROM events
),
g AS (
    SELECT problem_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ok) AS BIGINT) AS c
    FROM att GROUP BY problem_id
)
SELECT problem_id, n, c,
       {_pak_ratio_sql(1)} AS pass_at_1,
       {_pak_ratio_sql(5)} AS pass_at_5,
       {_pak_ratio_sql(10)} AS pass_at_10
FROM g
"""


@query("eval_pass_at_k", oracle=_PAK_ORACLE)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k per problem (Chen et al. 2021 eq. 1):
    1 - C(n-c,k)/C(n,k) over n sampled attempts with c passes — THE
    metric a code-generation eval pipeline aggregates. The combination
    ratio is a quotient of exact BIGINT falling factorials (n <= 16),
    with the all-fail-complement branch emitting exactly 1.0 and
    n < k emitting NULL; one double division + ROUND(6) at the end.

    Scale posture: one scan-local pass/fail projection into a
    map-side-combinable groupBy(problem_id); the k-specific arithmetic
    runs on the |problems| aggregate. Corpus growth adds attempts,
    never widens the plan."""
    ev = dd.spread(load(spark, sf_dir, "events").select("event_id"))
    att = ev.select(
        F.expr(f"event_id div {_PAK_GROUP}").alias("problem_id"),
        F.when(
            F.pmod(
                tf.h60(
                    F.concat(
                        F.lit("pass:"), F.col("event_id").cast("string")
                    ),
                    family="portable",
                ),
                F.lit(_PAK_PASS_MOD),
            )
            == 0,
            1,
        )
        .otherwise(0)
        .alias("ok"),
    )
    g = att.groupBy("problem_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ok").cast("long").alias("c"),
    )
    return g.select(
        "problem_id",
        "n",
        "c",
        *[
            F.expr(_pak_ratio_sql(k)).alias(f"pass_at_{k}")
            for k in _PAK_KS
        ],
    )


# --- training_pack_sequences ------------------------------------------------

_PACK_BUDGET = 256  # tokens per context window
_PACK_SHARDS = 64  # shard-local packing streams per language


@query(
    "training_pack_sequences",
    oracle=f"""
WITH d AS (
    SELECT doc_id, lang,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
               AS BIGINT) AS n_tokens,
           CAST(({tf.h60_sql("'packshard:' || CAST(doc_id AS VARCHAR)")})
               % {_PACK_SHARDS} AS INTEGER) AS shard
    FROM documents
),
p AS (
    SELECT doc_id, lang, shard, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_prev
    FROM d
)
SELECT doc_id, lang, shard, n_tokens,
       cum_prev // {_PACK_BUDGET} AS bin_id,
       cum_prev % {_PACK_BUDGET} AS offset_in_bin,
       (cum_prev // {_PACK_BUDGET})
           <> ((cum_prev + n_tokens - 1) // {_PACK_BUDGET})
           AS spans_boundary
FROM p
""",
)
def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: per (lang, shard)
    stream, docs concatenate in doc_id order and split into fixed
    256-token context windows — each doc's bin id, offset,
    and whether it straddles a window boundary (the fraction a loader
    either truncates or attention-masks). Shard-local packing (shard =
    portable-hash(doc_id) mod 64) keeps the prefix-sum
    window partitioned and parallel — the posture a 100 TB packer
    needs; a single global ordered window would serialize the corpus
    through one task. Nonneg idiv/mod agree exactly across engines."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        "lang",
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), " ", ""))
            + 1
        )
        .cast("long")
        .alias("n_tokens"),
        F.pmod(
            tf.h60(
                F.concat(F.lit("packshard:"), F.col("doc_id").cast("string")),
                family="portable",
            ),
            F.lit(_PACK_SHARDS),
        )
        .cast("int")
        .alias("shard"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = d.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .cast("long")
        .alias("cum_prev"),
    )
    b = F.expr(f"cum_prev div {_PACK_BUDGET}")
    return p.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        b.alias("bin_id"),
        F.expr(f"cum_prev % {_PACK_BUDGET}").alias("offset_in_bin"),
        (
            b
            != F.expr(f"(cum_prev + n_tokens - 1) div {_PACK_BUDGET}")
        ).alias("spans_boundary"),
    )
