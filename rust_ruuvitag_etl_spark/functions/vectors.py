"""Vector math over ``array<float|double>`` columns — similarity-search
primitives, all JVM-side higher-order functions (no UDF): at 100 TB the
dot products run inside codegen next to the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sq_l2(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (no sqrt — argmin-equivalent and one
    codegen node cheaper; the PQ assignment hot path)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over a token array using xxhash64 per token.

    For each of 64 bit positions, sum +1/-1 by token-hash bit, then take
    the sign. Bit positions are unrolled in Python (they are plan-time
    constants), producing one codegen'd expression tree. Bit 63 is the
    sign bit: ``1 << 63`` as a signed long is Long.MIN_VALUE.
    """
    def vote(bit: int):
        # Factory keeps the lambda at arity 2 (acc, element) — a
        # default-arg lambda would be dispatched as a 3-arg HOF form.
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(bit).cast("long")) != 0, 1
        ).otherwise(-1)

    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    out = F.lit(0).cast("long")
    for i in range(64):
        bit = (1 << i) if i < 63 else -(1 << 63)
        cnt = F.aggregate(hashes, F.lit(0), vote(bit))
        out = out.bitwiseOR(
            F.when(cnt > 0, F.lit(bit).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return out
