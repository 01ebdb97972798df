"""Deduplication operators for the LLM-data-pipeline surface
(BASELINE.json north star; generalizes reference op B8's last-wins
dedup, ``/root/reference/src/bluetooth/scanner.rs:99,185``).

Scale posture:
- exact dedup: hash-groupBy on a fingerprint — one shuffle keyed by the
  hash, near-perfectly balanced by construction (hashes are uniform);
- MinHash: explode shingles → ONE 60-bit hash per shingle → k linear
  permutations ``(a_i*h + b_i) mod P`` → groupBy-min. The per-shingle
  hash is computed once (not k times), partial aggregation combines
  map-side, so the shuffle carries only |docs| × k longs regardless of
  corpus size. The hash family is pluggable: ``fast`` (xxhash64, the
  production default — the per-shingle hash is the dominant CPU term at
  100 TB) or ``portable`` (md5-derived, bit-identical in DuckDB — what
  the oracle-checked registry plans pin; signatures differ between
  families, the verified near-dup pairs do not).
- MinHash-LSH: band signatures → explode to (band, band_hash) buckets →
  self-join inside buckets only. The candidate join is equi-keyed on the
  bucket, so no quadratic cross join ever materializes (the pre-filter
  pattern from the PAPERS.md similarity-join literature).
- SimHash: explode tokens → 60 conditional-sum aggregates (codegen'd)
  → sign bits reassembled; banded on 4×15-bit chunks for candidate
  pairs within Hamming distance ≤3 (pigeonhole over 4 bands).

All heavy per-row work happens after :func:`spread`, which fans a
narrow input (single parquet split) out to the cluster's parallelism —
a no-op when the source already has enough splits, as a 100 TB input
would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tf

def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than
    the session's parallelism. A small/local parquet file arrives as one
    split and would pin CPU-heavy per-row operators to one core; a real
    large input already has enough splits and passes through untouched.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # Metadata-only check (no .rdd materialization at plan-build
        # time): a scan backed by fewer files than the parallelism
        # target is at risk of under-splitting; anything else — many
        # files, or a non-scan plan where inputFiles() is empty —
        # passes through untouched.
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint; keeps the smallest id
    per duplicate group (deterministic winner)."""
    fp = tf.fingerprint(F.col(text_col))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_fp")
    )


def _shingle_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    hash_family: str = "fast",
) -> DataFrame:
    """(id, h) rows: one 60-bit hash per shingle occurrence.

    ``hash_family='fast'`` (xxhash64, production default — the hash is
    the dominant per-shingle CPU term at 100 TB) or ``'portable'``
    (md5-derived, exactly replicable in DuckDB — what the oracle-checked
    registry plans pin)."""
    base = spread(df).select(
        F.col(id_col),
        F.explode(tf.shingles(F.col(text_col), n=shingle_n)).alias("_s"),
    )
    return base.select(
        F.col(id_col), tf.h60(F.col("_s"), family=hash_family).alias("_h")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_n: int = 3,
    hash_family: str = "fast",
) -> DataFrame:
    """MinHash signature per doc as an array<long> of length n_hashes.

    min_i over shingles of rehash_i(h60(shingle)): one STRING hash per
    shingle, then k linear permutations (a_i*h + b_i) mod P in
    overflow-free BIGINT arithmetic (ANSI-safe, and exactly replicable
    in the DuckDB oracle when ``hash_family='portable'``), one
    partial+final min-aggregate — the shuffle carries k longs per doc.
    ``hash_family='fast'`` (default) swaps the per-shingle md5 for
    xxhash64: same uniformity, severalfold cheaper, no oracle twin —
    signatures differ between families but the verified near-dup pairs
    they induce do not (pinned by tests/test_llm_ops.py).

    Design note (measured, sf0.1): an explode-free in-row variant
    (array_min over transform per permutation) returns identical
    signatures but runs ~11x SLOWER — Spark evaluates higher-order-
    function lambdas interpreted, outside WholeStageCodegen, while this
    explode + hash-aggregate path is fully codegen'd. Keep the explode.
    """
    hashed = _shingle_hashes(df, text_col, id_col, shingle_n, hash_family)
    mins = [
        F.min(tf.rehash(F.col("_h"), i)).alias(f"_m{i}")
        for i in range(n_hashes)
    ]
    agg = hashed.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col), F.array(*[f"_m{i}" for i in range(n_hashes)]).alias("minhash")
    )


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_family: str = "fast",
) -> DataFrame:
    """Banded LSH bucket rows (id, band, bh) — the persisted derived
    artifact both the candidate join and deletion-propagation audit
    consume. One row per (doc, band); bh is the hash of that band's
    signature slice."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, n_hashes, shingle_n, hash_family
    )
    return sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        tf.h60(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at(
                                        "minhash", b * rows_per_band + r + 1
                                    ).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            ),
                            family=hash_family,
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bh")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_family: str = "fast",
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH.

    rows/band = n_hashes/bands; docs sharing any full band collide.
    Output: (id_a, id_b) with id_a < id_b, distinct. The bucket
    self-join reuses the signature aggregation's shuffle (identical
    subplans → ReusedExchange under AQE). ``hash_family`` selects the
    per-shingle/bucket hash: 'fast' (xxhash64, production default) or
    'portable' (md5-derived, oracle-exact).
    """
    buckets = minhash_band_buckets(
        df, text_col, id_col, n_hashes, bands, shingle_n, hash_family
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
    prune_to_candidates: bool = True,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    The expensive part — building distinct shingle sets — runs ONLY for
    documents that appear in some candidate pair: the candidate set is
    ``localCheckpoint``-materialized (it is small by construction —
    that is the entire point of LSH), its distinct doc ids semi-join
    the corpus, and only the surviving docs are shingled. At 100 TB
    candidates are orders of magnitude smaller than the corpus, so this
    prune turns two full-corpus shingle scans into two candidate-sized
    ones; the checkpoint also guarantees the LSH plan executes once,
    not once per downstream reuse. ``prune_to_candidates=False`` keeps
    the fully-lazy unpruned plan.
    """
    if prune_to_candidates:
        candidate_pairs = candidate_pairs.localCheckpoint(eager=True)
        ids = (
            candidate_pairs.select(F.col("id_a").alias(id_col))
            .union(candidate_pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        df = df.join(ids, id_col, "left_semi")
    sh = spread(df).select(
        F.col(id_col),
        F.array_distinct(tf.shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    out = (
        candidate_pairs.join(
            sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.when(
                F.size("sh_a") + F.size("sh_b") - F.col("inter") == 0, F.lit(0.0)
            ).otherwise(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double")
            ),
        )
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


SIMHASH_BITS = 60  # matches the portable hash width (bits 60+ of h60 are 0)


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "fast",
) -> DataFrame:
    """60-bit SimHash per doc via explode + 60 conditional-sum aggregates.

    Each token hashes once (``hash_family='fast'`` xxhash64 production
    default; ``'portable'`` md5-derived so the DuckDB oracle reproduces
    the signature exactly); per bit position the vote is +1/-1 by hash
    bit; the signature reassembles from the 60 sums' signs. Fully
    codegen'd, map-side combined — no per-row Python, no 60-pass array
    traversal.
    """
    toks = spread(df).select(
        F.col(id_col),
        F.explode(tf.ws_tokens(F.lower(F.col(text_col)))).alias("_t"),
    )
    hashed = toks.select(
        F.col(id_col), tf.h60(F.col("_t"), family=hash_family).alias("_h")
    )
    votes = []
    for i in range(SIMHASH_BITS):
        bit = 1 << i
        votes.append(
            F.sum(
                F.when(F.col("_h").bitwiseAND(F.lit(bit)) != 0, 1).otherwise(-1)
            ).alias(f"_v{i}")
        )
    agg = hashed.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        bit = 1 << i
        sig = sig.bitwiseOR(
            F.when(F.col(f"_v{i}") > 0, F.lit(bit).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_dedup_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int | None = 3,
    hash_family: str = "fast",
) -> DataFrame:
    """SimHash near-dup pairs: candidates share one of the 4 15-bit
    chunks (pigeonhole: complete for Hamming distance ≤3), then the
    exact Hamming check keeps true near-dups. ``max_hamming=None``
    returns all banding candidates."""
    sig = simhash_signatures(df, text_col, id_col, hash_family)
    chunk_bits = SIMHASH_BITS // 4
    chunk_mask = (1 << chunk_bits) - 1
    chunks = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", chunk_bits * i)
                        .bitwiseAND(F.lit(chunk_mask))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.band", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    if max_hamming is not None:
        pairs = pairs.filter(F.col("hamming") <= max_hamming)
    return pairs


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected components over near-dup candidate pairs via min-label
    propagation: every node repeatedly adopts the smallest label among
    itself and its neighbors, converging in O(cluster diameter)
    iterations (near-dup clusters are shallow — a handful of rounds).

    Returns (node, label) with label = min doc id of the component.
    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds (a silent early exit would split long chain
    clusters and let duplicates survive undetected).

    Scale posture: each iteration is one shuffle-join keyed by node id +
    one aggregate; ``localCheckpoint`` truncates the growing lineage so
    iteration N doesn't replay iterations 1..N-1 (the classic iterative-
    algorithm trap); the driver-side loop carries only a changed-row
    COUNT, never data. Early-exits on convergence.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for i in range(max_iter):
        neigh = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # Round 12: the checkpointed round table carries the OLD label
        # alongside the new one, so the convergence count is a filter
        # over the just-materialized checkpoint instead of a second
        # full join-action per round (each round used to pay an extra
        # join cascade once checks started). With the check nearly
        # free, it runs from round 1 — changed == 0 is a fixpoint, so
        # breaking earlier cannot alter the labels.
        upd = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        new_labels = upd.select("node", "label")
        if i >= 1:
            changed = upd.filter(F.col("label") != F.col("_old")).count()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        else:
            labels = new_labels
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations (cluster diameter exceeds the bound); raise "
            "max_iter — an early exit would silently split clusters"
        )
    return labels


def keep_best_representative(
    docs: DataFrame,
    pairs: DataFrame,
    quality: F.Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """The dedup endgame: collapse each near-dup cluster to its single
    best document (highest ``quality``, smallest id on ties); documents
    in no cluster survive untouched. Returns the deduplicated corpus
    with a ``cluster`` column (null for singletons).

    Pipeline shape every 100 TB dedup runs: LSH candidates → verify →
    connected components → per-cluster argmax (one max_by aggregate —
    no sort, no window)."""
    comps = connected_components(pairs, id_a="id_a", id_b="id_b")
    scored = docs.withColumn("_q", quality)
    labeled = scored.join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    )
    clustered = (
        labeled.filter(F.col("label").isNotNull())
        .groupBy("label")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in scored.columns]),
                F.struct(F.col("_q"), (-F.col(id_col)).alias("_neg")),
            ).alias("_best")
        )
        .select(
            *[F.col(f"_best.{c}").alias(c) for c in scored.columns],
            F.col("label").alias("cluster"),
        )
    )
    singletons = labeled.filter(F.col("label").isNull()).select(
        *scored.columns, F.lit(None).cast("long").alias("cluster")
    )
    return clustered.unionByName(singletons).drop("_q")


_TWO31 = 2147483648


def _hashed_rarest_arrays(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    hash_family: str,
    block_col: str | None = None,
) -> DataFrame:
    """Per-document rarest-first hashed shingle arrays:
    (id_col[, block_col], skeys, n). Each distinct shingle collapses to
    ONE 60-bit hash (strings never leave the scan stage) and the sort
    key packs (global document frequency, hash) into a single BIGINT —
    any consistent total order satisfies the prefix lemma, so no global
    rank assignment and no global sort. ``df`` is one
    map-side-combinable groupBy."""
    cols = [id_col] + ([block_col] if block_col else [])
    ex = (
        df.select(
            *cols,
            F.explode(tf.shingles(F.col(text_col), shingle_n)).alias("_g"),
        )
        .select(*cols, tf.h60(F.col("_g"), family=hash_family).alias("h"))
        .distinct()
    )
    dfq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    keyed = ex.join(dfq, "h").select(
        *cols,
        (F.col("df") * _TWO31 + F.pmod(F.col("h"), F.lit(_TWO31))).alias(
            "key"
        ),
    )
    return keyed.groupBy(*cols).agg(
        F.array_sort(F.collect_list("key")).alias("skeys"),
        F.count(F.lit(1)).alias("n"),
    )


def _prefix_candidates(
    arr: DataFrame,
    id_col: str,
    tau_num: int,
    tau_den: int,
    block_col: str | None = None,
) -> DataFrame:
    """(id_a, id_b) candidates containing EVERY pair whose hashed-set
    Jaccard >= tau_num/tau_den — the prefix-filtering lemma (SSJoin,
    Chaudhuri et al. 2006; PPJoin, Xiao et al. 2008): a pair with
    J >= t must share an element of each side's first
    n - ceil(t*n) + 1 keys under ANY consistent total order, so the
    ONLY pair-generating shuffle is an equi-join on prefix keys —
    which, ordered rarest-first, are each document's globally RAREST
    shingles (prefix filtering is its own skew mitigation). The length
    filter q*min(n) >= p*max(n) is the integer-exact Jaccard length
    bound, and the PPJoin POSITIONAL filter (Xiao et al. 2008 §3.2)
    prunes further without losing recall: a pair joined at 0-based
    prefix positions (p_a, p_b) shares at most
    min(n_a − p_a, n_b − p_b) keys (no common key precedes the FIRST
    common prefix key — an earlier one would itself sit in both
    prefixes — and the bound is antitone in position, so if any join
    event for a true pair passes, the first-key event does); the gate
    (p+q)·ubound >= p·(n_a+n_b) is the overlap the Jaccard threshold
    requires. ``block_col`` adds an optional extra equi-key without
    changing recall."""
    # prefix length n - ceil(p*n/q) + 1, integer-exact via
    # ceil(p*n/q) = floor((p*n + q - 1) / q)
    plen = (
        F.col("n")
        - F.floor((F.lit(tau_num) * F.col("n") + (tau_den - 1)) / tau_den)
        + 1
    ).cast("int")
    cols = [id_col] + ([block_col] if block_col else [])
    pref = arr.select(
        *cols,
        "n",
        F.posexplode(F.slice(F.col("skeys"), F.lit(1), plen)).alias(
            "p", "pkey"
        ),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cond = (
        (F.col("a.pkey") == F.col("b.pkey"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (
            tau_den * F.least(F.col("a.n"), F.col("b.n"))
            >= tau_num * F.greatest(F.col("a.n"), F.col("b.n"))
        )
        & (
            (tau_den + tau_num)
            * F.least(
                F.col("a.n") - F.col("a.p"), F.col("b.n") - F.col("b.p")
            )
            >= tau_num * (F.col("a.n") + F.col("b.n"))
        )
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    tau_num: int = 1,
    tau_den: int = 5,
    block_col: str | None = None,
    hash_family: str = "fast",
) -> DataFrame:
    """EXACT n-gram Jaccard >= tau_num/tau_den pairs via prefix
    filtering — same output as the naive within-block theta join, but
    the only pair-generating shuffle is an equi-join on prefix keys.

    Three exact-recall stages, each strictly narrowing:

    1. CANDIDATES — the hashed signature table (rarest-first packed
       keys) is localCheckpoint'd ONCE (the signature-table
       materialization every real SSJoin system does; ~corpus-sized,
       linear), prefix keys posexplode WITHOUT the key arrays (light
       rows — carrying skeys per prefix row would ship O(n²) bytes per
       document), and pairs enumerate inside per-(block, prefix-key)
       groups via collect_list + a nested-transform expansion, each
       pair carrying BOTH sides' 0-based prefix-key positions. Group
       sizes are bounded in practice by prefix-key document frequency
       — rarest-first ordering is its own skew mitigation (measured
       max group 5 at sf0.1).

    1b. POSITIONAL FILTER (PPJoin, Xiao et al. 2008, §3.2) — a pair
       generated at positions (p_a, p_b) can share at most
       ubound = min(n_a − p_a, n_b − p_b) hashed keys (both arrays are
       sorted by the same global order, so common keys at or after the
       shared key number at most the shorter remaining suffix, and NO
       common key precedes the pair's FIRST common prefix key — an
       earlier common key would itself sit inside both prefixes). The
       integer gate (p+q)·ubound >= p·(n_a+n_b) therefore discards a
       candidate event only when even the optimistic overlap cannot
       reach τ. Exactness of per-event filtering: ubound is
       antitone in (p_a, p_b), so the first-common-key event has the
       LARGEST bound — if any event for a true pair survives, the
       first one does, and for a true pair the first event's bound
       exceeds the true overlap which meets τ. Filter + distinct ≡
       the classic first-occurrence PPJoin filter, with no min-agg.
    2. HASHED VERIFY — candidates join the checkpointed signatures
       twice (id equi-joins, volume Σ_pairs(n_a+n_b) longs — the
       inherent exact-verification term) and keep pairs with hashed
       Jaccard >= t via the integer-exact gate
       (q+p)*I >= p*(n_a+n_b). Exact recall survives the hash
       boundary: collapsing universe elements (a collision) can only
       RAISE Jaccard — merge two elements and in every membership case
       I/U gains intersection or loses union — so J_hash >= J_string
       and no true pair is lost.
    3. STRING VERIFY — the output-bound survivor set is checkpointed
       (≤ true-pair scale — the hashed gate is a Jaccard overestimate,
       so few false positives survive) and its ids broadcast-SEMI-join
       the corpus BEFORE any string shingling, so the expensive
       shingle+distinct string work runs over |survivor docs| rows,
       not two full corpus scans (measured: the unfiltered verify was
       the single largest cost at sf0.1 — ~2 corpus re-shingles to
       score a handful of pairs). The reported value is the true
       string Jaccard, independent of the hash family.

    Output: (id_a, id_b, jaccard) with jaccard = |A∩B|/|A∪B| rounded
    to 4dp, threshold applied to the raw value.
    """
    arr = _hashed_rarest_arrays(
        df, text_col, id_col, shingle_n, hash_family, block_col
    ).localCheckpoint(eager=True)
    plen = (
        F.col("n")
        - F.floor((F.lit(tau_num) * F.col("n") + (tau_den - 1)) / tau_den)
        + 1
    ).cast("int")
    pref = arr.select(
        *([block_col] if block_col else []),
        F.col(id_col),
        F.col("n"),
        F.posexplode(F.slice(F.col("skeys"), F.lit(1), plen)).alias(
            "p", "pkey"
        ),
    ).select(
        *([block_col] if block_col else []),
        F.struct(id_col, "n", "p").alias("d"),
        "pkey",
    )
    grp_keys = ([block_col] if block_col else []) + ["pkey"]
    pairs = (
        pref.groupBy(*grp_keys)
        .agg(F.array_sort(F.collect_list("d")).alias("g"))
        .filter(F.size("g") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(g, (x, i) -> transform("
                    " slice(g, i + 2, size(g) - i - 1),"
                    f" y -> struct(x.{id_col} AS id_a, y.{id_col} AS id_b,"
                    " x.n AS n_a, y.n AS n_b,"
                    " x.p AS p_a, y.p AS p_b))))"
                )
            ).alias("pr")
        )
        .select("pr.*")
        .filter(
            tau_den * F.least("n_a", "n_b")
            >= tau_num * F.greatest("n_a", "n_b")
        )
        .filter(
            (tau_den + tau_num)
            * F.least(
                F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")
            )
            >= tau_num * (F.col("n_a") + F.col("n_b"))
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )
    xa = arr.select(
        F.col(id_col).alias("id_a"), F.col("skeys").alias("k_a")
    )
    ya = arr.select(
        F.col(id_col).alias("id_b"), F.col("skeys").alias("k_b")
    )
    survivors = (
        pairs.join(xa, "id_a")
        .join(ya, "id_b")
        .withColumn("hi", F.size(F.array_intersect("k_a", "k_b")))
        .filter(
            (tau_den + tau_num) * F.col("hi")
            >= tau_num * (F.col("n_a") + F.col("n_b"))
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    ids = survivors.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    # No size(s)>0 filter here: survivor ids come from arr, whose rows
    # have n >= 1 hashed shingles, so their string shingle sets are
    # non-empty by construction — and such a filter references only
    # text_col, so Catalyst would push it below the semi-join and
    # re-shingle the ENTIRE corpus to verify a handful of pairs.
    sh = df.join(F.broadcast(ids), id_col, "left_semi").select(
        id_col,
        F.array_distinct(tf.shingles(F.col(text_col), shingle_n)).alias("s"),
    )
    x = sh.select(F.col(id_col).alias("id_a"), F.col("s").alias("s_a"))
    y = sh.select(F.col(id_col).alias("id_b"), F.col("s").alias("s_b"))
    inter = F.size(F.array_intersect("s_a", "s_b"))
    union = F.size("s_a") + F.size("s_b") - inter
    return (
        survivors.join(x, "id_a")
        .join(y, "id_b")
        .withColumn("jaccard_raw", inter.cast("double") / union)
        .filter(F.col("jaccard_raw") >= tau_num / tau_den)
        .select(
            "id_a",
            "id_b",
            F.round("jaccard_raw", 4).alias("jaccard"),
        )
    )


def ssjoin_prefix_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    hash_family: str = "fast",
) -> DataFrame:
    """EXACT Jaccard >= 0.5 self-join via prefix filtering (SSJoin,
    Chaudhuri et al. 2006; PPJoin, Xiao et al. 2008) — the exact-recall
    complement to :func:`minhash_lsh_candidates`.

    Every pair with J >= 1/2 must share a token of each side's
    (n - ceil(n/2) + 1)-length prefix under ANY global token order, so
    an equi-join on prefix tokens finds EVERY qualifying pair; ordering
    rarest-first makes those join keys the least frequent shingles (the
    anti-skew property). Shingles collapse to ONE 60-bit hash each
    (the MinHash discipline — strings never leave the scan stage), and
    the canonical sort key packs (global df, hash) into a single
    BIGINT: df * 2^31 + (h mod 2^31) — any consistent total order
    satisfies the prefix lemma, and numeric arrays keep the sort,
    equi-join, and intersect in cheap long comparisons.

    Output: (id_a, id_b, n_inter, n_a, n_b, jaccard) for J >= 1/2,
    integer-exact threshold (3*I >= na+nb). Result equals brute force
    (pinned in tests/test_llm9.py).
    """
    arr = _hashed_rarest_arrays(df, text_col, id_col, shingle_n, hash_family)
    cand = _prefix_candidates(arr, id_col, 1, 2)
    x = arr.select(
        F.col(id_col).alias("id_a"),
        F.col("skeys").alias("skeys_a"),
        F.col("n").alias("n_a"),
    )
    y = arr.select(
        F.col(id_col).alias("id_b"),
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
