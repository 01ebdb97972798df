"""Round-12 wave 2 — the second in-engine TRAINER family (the first is
`tokenizer_bpe_merges`): logistic-regression quality-classifier
training by full-batch gradient descent, two unrolled iterations in
pure INTEGER fixed-point arithmetic, plus the held-out evaluation.

The task is the realistic pipeline op: DISTILL an expensive quality
gate into a cheap linear proxy. The label is the engine's own
heuristic quality gate (`functions/text.py:quality_score` >= 0.75 in
ten-thousandths — the same exact-integer s4 representation the
Bradley-Terry family proved portable), and the features are two cheap
integer proxies computed with nothing but LENGTH/REPLACE arithmetic —
mean token length in tenths and stopword ratio in percent (space-
padded non-overlapping substring counts) — centered by their integer
train-fold means in-chain. Train/test split is the usual md5 fold
assignment (h60 % 5: fold 0 held out). Measured held-out accuracy
92-95% across all three scale factors (float-LR ceiling ~94%).

Exactness contract (house float discipline): NO floating point
anywhere. Weights live at fixed-point scale S = 10^4; the sigmoid is
the fast rational sigmoid sigma(x) = 1/2 + x / (2(1+|x|)) (public
folklore approximation; monotone, symmetric, exactly representable),
computed as sigma_S(z) = S/2 + z*S idiv 2(S+z) for z >= 0 and
S - sigma_S(-z) otherwise — every division runs on NONNEGATIVE
operands so Spark's `div` (truncate) and DuckDB's `//` (floor) agree
exactly. Gradient sums, weight updates, and the final confusion
matrix are all BIGINT. The decision rule pred=1 iff z >= 0 is
division-free. Overflow bounds: |x_j| <= 200, |w_j| <= S*200/DEN per
step (two steps => |z| <= ~1e8, z*S <= ~1e12 << 2^63).

The iteration chain is rendered as ONE SQL text per dialect (the
PLANS.md expression-build lesson: a JVM-side parse of the unrolled
chain instead of ~100 py4j Column round-trips per iteration); the
ONLY dialect difference is the integer-division token (`div` vs `//`)
and the feats CTE's hash/label rendering — the chain structure is
shared line for line, so the oracle replays every iteration.

Scale posture (100 TB): each gradient iteration is one scan-local
projection into a global aggregate (map-side partial sums; 3 BIGINTs
cross the wire per partition) — the classic data-parallel full-batch
GD shape. The 1-row weight table broadcasts to the next pass. Corpus
growth adds partial sums, never iteration width; k iterations = k
bounded passes over a checkpointed integer feature table (itself one
corpus scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tf
from ..operators import dedup as dd
from ..sources import load
from ._dedup_oracles import _QUALITY_SQL
from .registry import query

_LR_S = 10_000  # fixed-point scale for weights and sigmoid
_LR_THRESH = 7_500  # label: quality_score s4 >= 0.75
_LR_ITERS = 2
_LR_DEN = 16  # learning-rate denominator: dw_j = g_j idiv (DEN * n)
_LR_FOLDS = 5  # md5 fold split; fold 0 is the held-out test set
# the quality gate's own stopword list (functions/text.py) — the
# features may see what the scorer sees; counting uses space-padded
# leftmost non-overlapping REPLACE, identical in both engines
_LR_STOPS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _lr_feats_sql(dialect: str) -> str:
    """Integer feature/label CTE body over ``documents`` — rendered per
    dialect (hash + label source differ; the arithmetic is identical).
    Emits feats(doc_id, y, x1, x2, is_train)."""
    d = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        split = tf.h60_spark_sql("concat('lrsplit:', CAST(doc_id AS STRING))")
        label = (
            f"CASE WHEN s4 >= {_LR_THRESH} THEN 1 ELSE 0 END"
        )
        src = "lr_docs"  # temp view bound by the engine plan
        pre = f"""qs AS (
    SELECT doc_id, text, s4 FROM {src}
)"""
    else:
        split = tf.h60_sql("'lrsplit:' || CAST(doc_id AS VARCHAR)")
        label = f"CASE WHEN s4 >= {_LR_THRESH} THEN 1 ELSE 0 END"
        pre = f"""{_QUALITY_SQL},
qs AS (
    SELECT d.doc_id, d.text,
           CAST(ROUND(q.q * 10000) AS BIGINT) AS s4
    FROM documents d JOIN qscore q ON q.doc_id = d.doc_id
)"""
    stopcnt = " + ".join(
        f"(LENGTH(pt) - LENGTH(REPLACE(pt, ' {w} ', ' '))) {d} {len(w) + 1}"
        for w in _LR_STOPS
    )
    return f"""{pre},
raw AS (
    SELECT doc_id, s4,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS tok,
           LENGTH(REPLACE(text, ' ', '')) AS ncns,
           ' ' || text || ' ' AS pt
    FROM qs
),
feats AS (
    SELECT doc_id,
           CAST({label} AS BIGINT) AS y,
           -- mean token length in tenths (the len-band signal)
           CAST(LEAST((10 * ncns) {d} tok, 200) AS BIGINT) AS x1,
           -- stopword ratio in percent (the stop-term signal)
           CAST(LEAST((100 * ({stopcnt})) {d} tok, 100) AS BIGINT) AS x2,
           ({split}) % {_LR_FOLDS} <> 0 AS is_train
    FROM raw
)"""


def _lr_iter_sql(dialect: str) -> str:
    """The unrolled gradient-descent chain from ``feats`` to the final
    weight table ``wt{_LR_ITERS}`` — structure shared line for line
    between engine and oracle; only the integer-division token
    differs."""
    d = "div" if dialect == "spark" else "//"
    S, H = _LR_S, _LR_S // 2

    def sdiv(a: str, b: str) -> str:
        # truncate-toward-zero integer division, identical in both
        # dialects because the numerator is made nonnegative first
        return (
            f"CASE WHEN ({a}) >= 0 THEN ({a}) {d} ({b})"
            f" ELSE -((-({a})) {d} ({b})) END"
        )

    core = f"""nn AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats WHERE is_train
),
mm AS (
    -- integer feature means over the TRAIN fold (nonneg -> idiv is
    -- exact floor in both dialects); centering keeps the shared bias
    -- scale sane so full-batch GD converges in few steps
    SELECT CAST(SUM(x1) AS BIGINT) {d} CAST(COUNT(*) AS BIGINT) AS m1,
           CAST(SUM(x2) AS BIGINT) {d} CAST(COUNT(*) AS BIGINT) AS m2
    FROM feats WHERE is_train
),
cf AS (
    SELECT f.doc_id, f.y, f.x1 - m.m1 AS x1, f.x2 - m.m2 AS x2,
           f.is_train
    FROM feats f CROSS JOIN mm m
),
wt0 AS (
    SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
           CAST(0 AS BIGINT) AS w2
)"""
    for t in range(1, _LR_ITERS + 1):
        core += f""",
zz{t} AS (
    SELECT f.y, f.x1, f.x2,
           w.w0 + w.w1 * f.x1 + w.w2 * f.x2 AS z
    FROM cf f CROSS JOIN wt{t - 1} w
    WHERE f.is_train
),
sg{t} AS (
    SELECT y, x1, x2,
           CASE WHEN z >= 0
                THEN {H} + (z * {S}) {d} (2 * ({S} + z))
                ELSE {S} - ({H} + ((-z) * {S}) {d} (2 * ({S} + (-z))))
           END AS sig
    FROM zz{t}
),
gg{t} AS (
    SELECT CAST(SUM(y * {S} - sig) AS BIGINT) AS g0,
           CAST(SUM((y * {S} - sig) * x1) AS BIGINT) AS g1,
           CAST(SUM((y * {S} - sig) * x2) AS BIGINT) AS g2
    FROM sg{t}
),
wt{t} AS (
    SELECT w.w0 + {sdiv('g.g0', f'{_LR_DEN} * nn.n')} AS w0,
           w.w1 + {sdiv('g.g1', f'{_LR_DEN} * nn.n')} AS w1,
           w.w2 + {sdiv('g.g2', f'{_LR_DEN} * nn.n')} AS w2
    FROM wt{t - 1} w CROSS JOIN gg{t} g CROSS JOIN nn
)"""
    return core


def _lr_train_sql(dialect: str) -> str:
    d = "div" if dialect == "spark" else "//"
    W = f"wt{_LR_ITERS}"
    return f"""WITH {_lr_feats_sql(dialect)},
{_lr_iter_sql(dialect)},
sc AS (
    SELECT f.y,
           w.w0 + w.w1 * f.x1 + w.w2 * f.x2 AS z
    FROM cf f CROSS JOIN {W} w
    WHERE f.is_train
),
tc AS (
    SELECT CAST(SUM(CASE WHEN (z >= 0) = (y = 1) THEN 1 ELSE 0 END)
               AS BIGINT) AS train_correct
    FROM sc
)
SELECT nn.n AS n_train, w.w0, w.w1, w.w2,
       tc.train_correct,
       (tc.train_correct * 10000) {d} nn.n AS train_acc_bp
FROM nn CROSS JOIN {W} w CROSS JOIN tc
"""


def _lr_eval_sql(dialect: str) -> str:
    d = "div" if dialect == "spark" else "//"
    W = f"wt{_LR_ITERS}"
    return f"""WITH {_lr_feats_sql(dialect)},
{_lr_iter_sql(dialect)},
sc AS (
    SELECT f.y,
           w.w0 + w.w1 * f.x1 + w.w2 * f.x2 AS z
    FROM cf f CROSS JOIN {W} w
    WHERE NOT f.is_train
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN y = 1 AND z >= 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN y = 0 AND z >= 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN y = 0 AND z < 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS tn,
       CAST(SUM(CASE WHEN y = 1 AND z < 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS fn,
       (CAST(SUM(CASE WHEN (z >= 0) = (y = 1) THEN 1 ELSE 0 END)
            AS BIGINT) * 10000) {d} CAST(COUNT(*) AS BIGINT)
           AS test_acc_bp
FROM sc
"""


def _lr_bind_docs(spark: SparkSession, sf_dir: str) -> None:
    """Bind the ``lr_docs`` temp view: documents + the exact-integer s4
    quality score (the Bradley-Terry-proven portable representation),
    checkpointed so the unrolled chain's {2 * _LR_ITERS + 1} feats
    reads hit a materialized integer table, not the scorer."""
    docs = dd.spread(load(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        "text",
        F.round(tf.quality_score(F.col("text")) * 10000)
        .cast("long")
        .alias("s4"),
    ).localCheckpoint(eager=True)
    d.createOrReplaceTempView("lr_docs")


@query("quality_lr_train", oracle=_lr_train_sql("duck"))
def quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the logistic-regression quality classifier: two unrolled
    full-batch gradient-descent iterations in pure BIGINT fixed-point
    (module docstring has the exactness contract and overflow bounds),
    emitting the trained weights, the train-fold size, and training
    accuracy in basis points. The oracle replays every iteration —
    the same CTE chain text with DuckDB's `//` in place of Spark's
    `div` — so a hash match proves the full feature build, both
    gradient passes, both weight updates, and the final scoring."""
    _lr_bind_docs(spark, sf_dir)
    return spark.sql(_lr_train_sql("spark"))


@query("quality_lr_eval_holdout", oracle=_lr_eval_sql("duck"))
def quality_lr_eval_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVALUATE the trained classifier on the held-out md5 fold (fold 0
    of {_LR_FOLDS}, never seen by the gradient passes): confusion
    matrix and accuracy in basis points, all BIGINT. Re-derives the
    weights with the same unrolled chain (deterministic, so train and
    eval agree exactly); the oracle replays everything."""
    _lr_bind_docs(spark, sf_dir)
    return spark.sql(_lr_eval_sql("spark"))
