"""Round-9 extension families — closing the tokenizer loop and the
data-selection / model-eval gaps of an LLM training-data pipeline:

* BPE tokenizer APPLICATION (round 8 trained the merge rules in-engine;
  these queries tokenize the corpus WITH them): per-document token
  counts (`tokenizer_bpe_encode`) and the corpus token-frequency
  vocabulary (`tokenizer_bpe_vocab`);
* token-budget data SELECTION (`corpus_token_budget_select`): the
  quality-ranked greedy pick every "train on the best 20% of tokens"
  pipeline runs, expressed scale-safe (bucket-level cumulative sums,
  never a corpus-wide sorted window);
* ranking EVALUATION (`eval_quality_auc`): Mann-Whitney AUC of the
  heuristic quality score as a classifier, via the grouped rank-sum
  identity (one corpus groupBy, no per-row ranks).

Scale posture (100 TB): every corpus-scale stage is a scan-local
projection or one map-side-combinable hash groupBy; all window
functions run over CLASS-cardinality tables (distinct scores, distinct
words' merge rounds) — the one per-document window is confined to the
single boundary score-class of the budget pick and is documented at
the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from ._dedup_oracles import _JACCARD_CTES, _MINHASH_CAND_CTES, _QUALITY_SQL, N_HASHES
from .llm12 import (
    _SEP,
    BPE_MERGES,
    BPE_WORDS_CTES,
    bpe_round_ctes,
    bpe_rounds,
    bpe_seed_rep,
)
from .registry import query

# --- BPE application ---------------------------------------------------------


def _doc_words(docs: DataFrame) -> DataFrame:
    """(doc_id, word) pairs — the lowercased whitespace tokenization
    the BPE family trains on (identical to the oracle's ``dw`` CTE in
    llm12.BPE_WORDS_CTES)."""
    return (
        docs.filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.explode(tf.ws_tokens(F.lower(F.col("text")))).alias("word"),
        )
        .filter(F.col("word") != "")
    )


def _bpe_final_vocab(docs: DataFrame) -> DataFrame:
    """Train the BPE_MERGES merge rules on ``docs`` and return the final
    per-WORD segmentation: (word, rep, wc) with ``rep`` the SEP-joined
    symbol string after the last merge round."""
    dw = _doc_words(docs)
    w = dw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    vocab = w.select("word", bpe_seed_rep(F.col("word")).alias("rep"), "wc")
    _, final = bpe_rounds(vocab)
    return final


_BPE_ENCODE_ORACLE = f"""
WITH {BPE_WORDS_CTES},
v0 AS (
    SELECT word,
           rtrim(regexp_replace(word, '(.)', '\\1' || chr(31), 'g'), chr(31))
               AS rep,
           wc
    FROM w
){bpe_round_ctes(carry="v.word, ")},
tok AS (
    SELECT word, len(string_split(rep, chr(31))) AS n_toks
    FROM v{BPE_MERGES}
)
SELECT dw.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(tok.n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(LENGTH(dw.word)) AS BIGINT) AS n_word_chars,
       ROUND(CAST(SUM(LENGTH(dw.word)) AS DOUBLE) / SUM(tok.n_toks), 6)
           AS chars_per_token
FROM dw JOIN tok ON tok.word = dw.word
GROUP BY dw.doc_id
"""


@query("tokenizer_bpe_encode", oracle=_BPE_ENCODE_ORACLE)
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the in-engine-trained BPE rules — the
    APPLY side of round 8's ``tokenizer_bpe_merges`` — and report
    per-document token counts and compression (chars per token), the
    numbers every token-budgeted training plan starts from. Documents
    with no words (all-whitespace text) have nothing to tokenize and
    don't surface, on either engine.

    Spark-first shape, and why this is how production tokenizers count:
    the merge rounds run on the distinct-WORD frequency table (|vocab|
    rows ≪ corpus — llm12.bpe_rounds, word column carried through);
    the corpus-scale work is ONE tokenize/explode pass, and the final
    per-word token counts come back via a BROADCAST join on word (the
    vocab fits; documents never reshuffle). The doc-level rollup is one
    map-side-combinable groupBy(doc_id). The DuckDB oracle replays
    training AND application verbatim (llm12.bpe_round_ctes with the
    word carried), so per-doc counts match bit-for-bit."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    dw = _doc_words(docs)
    tok = _bpe_final_vocab(docs).select(
        "word", F.size(F.split("rep", _SEP)).alias("n_toks")
    )
    return (
        dw.join(F.broadcast(tok), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_word_chars"),
            F.round(
                F.sum(F.length("word")).cast("double") / F.sum("n_toks"),
                6,
            ).alias("chars_per_token"),
        )
    )


_BPE_VOCAB_ORACLE = f"""
WITH {BPE_WORDS_CTES},
v0 AS (
    SELECT word,
           rtrim(regexp_replace(word, '(.)', '\\1' || chr(31), 'g'), chr(31))
               AS rep,
           wc
    FROM w
){bpe_round_ctes(carry="v.word, ")},
occ AS (
    SELECT word, wc, unnest(string_split(rep, chr(31))) AS token
    FROM v{BPE_MERGES}
)
SELECT token,
       CAST(SUM(wc) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
FROM occ GROUP BY token
"""


@query("tokenizer_bpe_vocab", oracle=_BPE_VOCAB_ORACLE)
def tokenizer_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus token VOCABULARY under the trained BPE rules: every
    surviving symbol with its corpus occurrence count (each position in
    a word weighted by that word's frequency) and the number of
    distinct words containing it — the artifact a tokenizer ships and
    the table OOV/coverage audits read.

    All work after training happens on the |vocab|-row segmentation
    table: one scan-local symbol explode into a map-side-combinable
    groupBy(token); the corpus is touched exactly once (the word-count
    pass inside training). Oracle replays the same explode over the
    same final segmentation."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    final = _bpe_final_vocab(docs)
    occ = final.select(
        "word", "wc", F.explode(F.split("rep", _SEP)).alias("token")
    )
    return occ.groupBy("token").agg(
        F.sum("wc").cast("long").alias("n_occurrences"),
        F.countDistinct("word").alias("n_words"),
    )


# --- token-budget data selection ---------------------------------------------

_BUDGET_DEN = 5  # select ~1/5 of the corpus's tokens

_BUDGET_SELECT_ORACLE = f"""
WITH {_QUALITY_SQL},
d AS (
    SELECT q.doc_id, q.q AS score, CAST(len(q2.ltoks) AS BIGINT) AS n_tokens
    FROM qscore q JOIN qual q2 ON q2.doc_id = q.doc_id
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM d),
budget AS (SELECT total // {_BUDGET_DEN} AS b FROM tot),
g AS (
    SELECT score, CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
    FROM d GROUP BY score
),
c AS (
    SELECT score, bucket_tokens,
           CAST(COALESCE(SUM(bucket_tokens) OVER (
               ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
    FROM g
),
full_b AS (
    SELECT c.score FROM c, budget
    WHERE c.cum_before + c.bucket_tokens <= budget.b
),
boundary AS (
    SELECT c.score, c.cum_before FROM c, budget
    WHERE c.cum_before < budget.b AND c.cum_before + c.bucket_tokens > budget.b
),
bd AS (
    SELECT d.doc_id, d.score, d.n_tokens,
           boundary.cum_before
           + CAST(COALESCE(SUM(d.n_tokens) OVER (
                 PARTITION BY d.score ORDER BY d.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before_doc
    FROM d JOIN boundary ON boundary.score = d.score
)
SELECT d.doc_id, d.score, d.n_tokens, 'full' AS stage
FROM d JOIN full_b ON full_b.score = d.score
UNION ALL
SELECT bd.doc_id, bd.score, bd.n_tokens, 'boundary' AS stage
FROM bd, budget
WHERE bd.cum_before_doc + bd.n_tokens <= budget.b
"""


@query("corpus_token_budget_select", oracle=_BUDGET_SELECT_ORACLE)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked data selection under a token budget — "train on
    the best ~20% of tokens": rank documents by the heuristic quality
    score (functions.text.quality_score), admit whole score classes
    while they fit the budget (total_tokens // 5), then fill from the
    single BOUNDARY class in doc_id order under prefix-sum admission
    (a document is admitted iff the tokens of ALL earlier boundary-class
    documents plus its own still fit — deterministic and
    window-expressible on both engines, unlike a sequential first-fit).

    Scale posture — the reason this is NOT a corpus-wide sorted window:
    per-doc score/token-count are scan-local; the ranking runs on the
    distinct-SCORE table (class cardinality — one map-side-combinable
    groupBy, then a tiny unpartitioned cumulative window over score
    classes, the ``orders_open_backlog_curve`` audited pattern); the
    only per-document window is PARTITIONED to the one boundary score
    class. Admission decisions join back by score — broadcast-size
    (class-cardinality) build sides, so documents never reshuffle."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        tf.quality_score(F.col("text")).alias("score"),
        tf.token_count(F.col("text")).alias("n_tokens"),
    ).localCheckpoint(eager=True)  # feeds the class rollup AND both picks
    budget = d.agg(
        (F.sum("n_tokens").cast("long") / _BUDGET_DEN)
        .cast("long")
        .alias("b")
    )
    g = d.groupBy("score").agg(
        F.sum("n_tokens").cast("long").alias("bucket_tokens")
    )
    wc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = g.select(
        "score",
        "bucket_tokens",
        F.coalesce(F.sum("bucket_tokens").over(wc), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    ).crossJoin(F.broadcast(budget))
    full_b = c.filter(
        F.col("cum_before") + F.col("bucket_tokens") <= F.col("b")
    ).select("score")
    boundary = c.filter(
        (F.col("cum_before") < F.col("b"))
        & (F.col("cum_before") + F.col("bucket_tokens") > F.col("b"))
    ).select("score", "cum_before", "b")
    full_docs = d.join(F.broadcast(full_b), "score").select(
        "doc_id", "score", "n_tokens", F.lit("full").alias("stage")
    )
    wdoc = Window.partitionBy("score").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bd = (
        d.join(F.broadcast(boundary), "score")
        .select(
            "doc_id",
            "score",
            "n_tokens",
            "b",
            (
                F.col("cum_before")
                + F.coalesce(F.sum("n_tokens").over(wdoc), F.lit(0))
            ).alias("cum_before_doc"),
        )
        .filter(F.col("cum_before_doc") + F.col("n_tokens") <= F.col("b"))
        .select("doc_id", "score", "n_tokens", F.lit("boundary").alias("stage"))
    )
    return full_docs.unionByName(bd)


# --- MinHash estimator calibration --------------------------------------------

_MATCHES_SQL = " + ".join(
    f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(N_HASHES)
)

_MINHASH_ESTIMATE_ORACLE = f"""
WITH {_MINHASH_CAND_CTES},
{_JACCARD_CTES},
est AS (
    SELECT c.id_a, c.id_b, CAST({_MATCHES_SQL} AS INTEGER) AS matches
    FROM cand c
    JOIN sig a ON a.doc_id = c.id_a
    JOIN sig b ON b.doc_id = c.id_b
)
SELECT j.id_a, j.id_b, j.jaccard,
       e.matches,
       ROUND(e.matches / {N_HASHES}.0, 4) AS minhash_estimate,
       ROUND(ABS(j.jaccard - e.matches / {N_HASHES}.0), 4) AS abs_error
FROM jac j JOIN est e ON e.id_a = j.id_a AND e.id_b = j.id_b
"""


@query("eval_minhash_estimate", oracle=_MINHASH_ESTIMATE_ORACLE)
def eval_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR calibration — per LSH candidate pair, the
    signature-match estimate (matching positions / 16) next to the
    exact 3-gram Jaccard and the absolute error. This is the audit a
    pipeline owner runs before trusting banded MinHash at a new
    threshold: E[matches/k] = J is the MinHash identity (Broder 1997),
    and a systematic bias here means broken shingling or a bad hash
    family long before the dedup output looks wrong. Portable hash
    family so the DuckDB oracle replays signatures bit-for-bit.

    Scale posture: candidate pairs come from the banded equi-join
    (never all-pairs); the candidate set is checkpointed once and
    prunes BOTH expensive sides — the exact-verify shingle scan
    (operators/dedup.jaccard_pairs) and the signature table (semi-join
    before the per-pair match count) — so every per-pair stage runs at
    candidate scale, not corpus scale."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    cands = dd.minhash_lsh_candidates(
        docs, hash_family="portable"
    ).localCheckpoint(eager=True)
    jac = dd.jaccard_pairs(docs, cands)  # threshold 0: every candidate
    ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .union(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sigs = dd.minhash_signatures(
        docs.join(ids, "doc_id", "left_semi"), hash_family="portable"
    )
    est = (
        cands.join(
            sigs.select(
                F.col("doc_id").alias("id_a"), F.col("minhash").alias("mh_a")
            ),
            "id_a",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("id_b"), F.col("minhash").alias("mh_b")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with(
                    "mh_a",
                    "mh_b",
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            .cast("int")
            .alias("matches"),
        )
    )
    return jac.join(est, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "jaccard",
        "matches",
        F.round(F.col("matches") / N_HASHES, 4).alias("minhash_estimate"),
        F.round(
            F.abs(F.col("jaccard") - F.col("matches") / N_HASHES), 4
        ).alias("abs_error"),
    )


# --- quality-score AUC evaluation --------------------------------------------

_AUC_ORACLE = f"""
WITH {_QUALITY_SQL},
lab AS (SELECT q AS score, (lang = 'en') AS pos FROM qscore),
g AS (
    SELECT score,
           CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
    FROM lab GROUP BY score
),
c AS (
    SELECT n_pos, n_neg,
           CAST(COALESCE(SUM(n_neg) OVER (
               ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_neg_below
    FROM g
),
u AS (
    SELECT CAST(SUM(n_pos * (2 * cum_neg_below + n_neg)) AS BIGINT) AS u2
    FROM c
),
tot AS (
    SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
           CAST(SUM(n_neg) AS BIGINT) AS n_neg
    FROM g
)
SELECT tot.n_pos, tot.n_neg, u.u2,
       ROUND(CAST(u.u2 AS DOUBLE) / (2.0 * tot.n_pos * tot.n_neg), 6) AS auc
FROM tot, u
"""


@query("eval_quality_auc", oracle=_AUC_ORACLE)
def eval_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the heuristic quality score as a classifier for the
    corpus's majority language ('en' = positive) — the standard check
    before a score gates data selection: AUC ≈ 0.5 means the score is
    label-blind (no language bias), far from 0.5 means quality-gating
    skews the language mix. Exact Mann-Whitney with tie handling:
    2U = Σ_scores n_pos(s)·(2·|negatives below s| + n_neg(s)) stays in
    INTEGER arithmetic (``u2``), and AUC = u2 / (2·n_pos·n_neg) rounds
    once at the end — no per-document ranks, no half-integer floats.

    Scale posture: one scan-local score projection into a map-side
    combinable groupBy(score); the cumulative window runs over the
    distinct-SCORE table only (class cardinality — the
    ``orders_open_backlog_curve`` audited pattern). Corpus-scale data
    crosses the wire once, pre-aggregated to (score, n_pos, n_neg)."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    lab = docs.select(
        tf.quality_score(F.col("text")).alias("score"),
        (F.col("lang") == "en").alias("pos"),
    )
    g = lab.groupBy("score").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("n_neg"),
    ).localCheckpoint(eager=True)  # class-cardinality; feeds u AND tot
    wc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(wc), F.lit(0))
        .cast("long")
        .alias("cum_neg_below"),
    )
    u = c.agg(
        F.sum(
            F.col("n_pos") * (2 * F.col("cum_neg_below") + F.col("n_neg"))
        )
        .cast("long")
        .alias("u2")
    )
    tot = g.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
    )
    return tot.crossJoin(F.broadcast(u)).select(
        "n_pos",
        "n_neg",
        "u2",
        F.round(
            F.col("u2").cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )
