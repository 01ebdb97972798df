"""Text-analysis column functions for the LLM-pipeline surface.

All JVM-side builtin expressions (tokenization, stats, fingerprints,
shingles) so they run inside WholeStageCodegen over 100 TB of documents.
Everything here is oracle-expressible in ANSI SQL so the DuckDB
differential harness can check it.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer — the baseline "token count" a data pipeline uses
# before a real BPE pass.
_WS = r"\s+"

# BPE-ish word/number/punct splitter (GPT-2-style coarse classes, regex
# only): runs of letters, runs of digits, single non-space punctuation.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny deterministic stopword set for quality scoring.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens; empty string → empty array (not [''])."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, _WS))


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text)).cast("long")


def bpeish_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (letters-run | digits-run | punct)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPEISH_PATTERN), 0)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        punct / F.length(text).cast("double")
    )


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords."""
    toks = ws_tokens(F.lower(text))
    stops = F.size(
        F.filter(toks, lambda t: t.isin([F.lit(s) for s in STOPWORDS]))
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        stops / F.size(toks).cast("double")
    )


def mean_token_len(text: Column) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total / F.size(toks).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] doc-quality score: rewards sane token length and
    stopword presence, penalizes punctuation soup. Deterministic and
    SQL-expressible (oracle in plans/llm.py)."""
    tl = mean_token_len(text)
    len_term = F.when((tl >= 3.0) & (tl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_term = clamp01(stopword_ratio(text) * 4.0)
    punct_term = F.lit(1.0) - clamp01(punct_ratio(text) * 4.0)
    return F.round((len_term + stop_term + punct_term) / 3.0, 4)


def clamp01(col: Column) -> Column:
    return F.least(F.greatest(col, F.lit(0.0)), F.lit(1.0))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of NFC-ish normalized text (lower, collapse
    whitespace). md5 (not xxhash64) so DuckDB computes the identical value."""
    norm = F.lower(F.trim(F.regexp_replace(text, _WS, " ")))
    return F.md5(norm)


# --- portable 60-bit hash (md5-derived) -----------------------------------
# Spark and DuckDB compute identical md5 digests; the first 15 hex chars
# (60 bits) parse to the same non-negative BIGINT on both engines, so the
# whole MinHash/SimHash/LSH dedup family becomes exactly oracle-diffable
# (unlike xxhash64, which has no DuckDB twin). 60 uniform bits is ample
# for near-dup hashing: collision odds at 10^9 docs are ~4e-3 per pair
# family, and every downstream consumer re-verifies candidates exactly.

P31 = 2147483647  # 2^31 - 1 (Mersenne): rehash modulus


def _rehash_constants(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k universal-hash permutations
    h_i = (a_i*(h mod P) + b_i) mod P. Fixed seed → identical constants
    in the Spark plan and the generated oracle SQL."""
    rng = random.Random(0x5EED)
    return [(rng.randrange(1, P31), rng.randrange(0, P31)) for _ in range(k)]


REHASH_AB = _rehash_constants(64)


H60_MASK = (1 << 60) - 1  # both families emit non-negative 60-bit longs

HASH_FAMILIES = ("portable", "fast")


def h60(col: Column, family: str = "portable") -> Column:
    """60-bit string hash, selectable family.

    ``portable``: first 15 hex chars of md5 as BIGINT — DuckDB computes
    the identical value, so every consumer (MinHash/SimHash/LSH) becomes
    exactly oracle-diffable. md5 is cryptographic and costs real CPU per
    call, so this is the *differential-testing* family.

    ``fast``: xxhash64 masked to the low 60 bits — several times cheaper
    per call and just as uniform, but engine-specific (no DuckDB twin).
    The *production* family: in the dedup operators the hash runs once
    per shingle occurrence, which at 100 TB is the dominant CPU term.

    Both emit non-negative longs with zero bits above 59, so every
    downstream consumer (rehash permutations, SimHash bit votes, band
    bucketing) works identically with either family.
    """
    if family == "portable":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    if family == "fast":
        return F.xxhash64(col).bitwiseAND(F.lit(H60_MASK))
    raise ValueError(f"unknown hash family {family!r}; expected one of {HASH_FAMILIES}")


def h60_sql(expr: str) -> str:
    """DuckDB twin of :func:`h60` over the SQL expression ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def h60_spark_sql(expr: str) -> str:
    """Spark-SQL-TEXT twin of :func:`h60` (portable family) — for plans
    that assemble O(100+) expression nodes and generate them as SQL text
    parsed JVM-side instead of paying the per-node py4j build tax (the
    dedup_bloom_delta lesson recorded in PLANS.md)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def rehash(col: Column, i: int) -> Column:
    """i-th universal-hash permutation: (a_i*(h mod P31) + b_i) mod P31.

    Pure BIGINT arithmetic that cannot overflow (h mod P31 < 2^31 and
    a_i < 2^31 → product < 2^62), so it is ANSI-safe without decimal
    widening, runs at long-multiply speed inside codegen, and DuckDB
    evaluates the identical expression for the oracle. 31-bit minhash
    values are ample: per-hash collision odds 2^-31, and every candidate
    pair is re-verified exactly downstream."""
    a, b = REHASH_AB[i]
    return (F.lit(a) * (col % F.lit(P31)) + F.lit(b)) % F.lit(P31)


def rehash_sql(expr: str, i: int) -> str:
    """DuckDB twin of :func:`rehash` (same non-overflowing BIGINT ops)."""
    a, b = REHASH_AB[i]
    return f"({a} * (({expr}) % {P31}) + {b}) % {P31}"


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (MinHash/Jaccard input).

    Built from sliding windows over the whitespace tokens via
    ``transform`` on index sequences — pure builtins, no UDF.

    The token array is BOUND ONCE per row as a lambda variable (the
    single-element-array ``transform`` trick): higher-order functions
    are CodegenFallback, so no subexpression elimination runs inside
    them — naming the tokenization expression directly in the inner
    lambda re-evaluated the regexp split for EVERY element_at (3 per
    shingle), a measured ~30x slowdown on the corpus-wide shingle scan
    (8.2 s -> 0.3 s for 260k shingles at sf0.1)."""

    def _build(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1)))
        return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.element_at(toks, (i + j + 1).cast("int"))
                        for j in range(n)
                    ],
                ),
            )
        )

    bound = F.transform(F.array(ws_tokens(F.lower(text))), _build)
    return F.element_at(bound, 1)
