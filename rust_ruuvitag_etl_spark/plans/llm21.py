"""Round-10 wave 7 (batch half) — retention-policy audit and
tolerance-bounded as-of matching:

* retention TTL audit (`governance_retention_ttl`): per event type, how
  much data sits past the 90-day retention policy relative to the
  corpus anchor — the scheduled purge's pre-flight report (the
  companion to `governance_deletion_propagate`, which proves the purge
  itself);
* as-of join with tolerance (`join_asof_tolerance`): every purchase
  matched to the user's LAST view at most 24 h earlier, unmatched
  purchases retained with NULLs — the pandas `merge_asof(tolerance=)` /
  kdb `wj` semantics the plain as-of pair (`asof_purchase_last_view`,
  `asof_next_purchase_after_view`) doesn't cover.

The streaming half of this wave is `streaming_cusum_alarm`
(plans/streaming_batchck.py + streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

# --- retention TTL audit --------------------------------------------------------

_TTL_DAYS = 90

_RETENTION_ORACLE = f"""
WITH anchor AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS mx FROM events),
e AS (
    SELECT event_type,
           datediff('day', CAST(ts AS DATE), CAST(anchor.mx AS DATE))
               AS age_days
    FROM events, anchor
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN age_days > {_TTL_DAYS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_expired,
       CAST(SUM(CASE WHEN age_days > {_TTL_DAYS} THEN 0 ELSE 1 END)
            AS BIGINT) AS n_retained,
       CAST(MAX(age_days) AS BIGINT) AS oldest_age_days,
       CAST((SUM(CASE WHEN age_days > {_TTL_DAYS} THEN 1 ELSE 0 END)
             * 2000000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
           / 1000000.0 AS expired_frac,
       CAST({_TTL_DAYS} AS BIGINT) AS ttl_days
FROM e GROUP BY event_type
"""


@query("governance_retention_ttl", oracle=_RETENTION_ORACLE)
def governance_retention_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy audit: per event type, the rows past the 90-day
    TTL (aged against the corpus's max event time, so the audit is
    reproducible), the retained remainder, the oldest age on file, and
    the expired fraction — the pre-flight report a scheduled purge job
    publishes before deleting anything (the purge's own proof-of-
    removal is `governance_deletion_propagate`'s residue pattern).

    Exactness: ages and counts are exact integers; expired_frac rounds
    HALF-UP in integer micro-units. Scale posture: a 1-row max
    broadcast + one scan-local age projection + one map-side
    combinable groupBy(event_type) — at 100 TB the age predicate also
    prunes date-partitioned layouts at the scan."""
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("timestamp")).alias("mx"))
    e = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.datediff(F.col("mx").cast("date"), F.col("ts").cast("date")).alias(
            "age_days"
        ),
    )
    expired = F.when(F.col("age_days") > _TTL_DAYS, 1).otherwise(0)
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(expired).cast("long").alias("n_expired"),
        F.sum(1 - expired).cast("long").alias("n_retained"),
        F.max("age_days").cast("long").alias("oldest_age_days"),
    )
    return g.select(
        "event_type",
        "n_total",
        "n_expired",
        "n_retained",
        "oldest_age_days",
        (
            F.expr(
                "CAST((n_expired * 2000000 + n_total)"
                " DIV (2 * n_total) AS DOUBLE)"
            )
            / F.lit(1000000.0)
        ).alias("expired_frac"),
        F.lit(_TTL_DAYS).cast("long").alias("ttl_days"),
    )


# --- as-of join with tolerance ---------------------------------------------------

_ASOF_TOL_ORACLE = """
WITH purchases AS (
    SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS pts
    FROM events WHERE event_type = 'purchase'
),
views AS (
    SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS vts
    FROM events WHERE event_type = 'view'
),
best AS (
    SELECT purchase_id, view_id, vts FROM (
        SELECT p.purchase_id, v.view_id, v.vts,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                   ORDER BY v.vts DESC, v.view_id DESC) AS rn
        FROM purchases p JOIN views v
          ON v.user_id = p.user_id
         AND v.vts < p.pts
         AND v.vts >= p.pts - INTERVAL 24 HOUR
    ) WHERE rn = 1
)
SELECT p.purchase_id, p.user_id, b.view_id,
       (epoch_us(p.pts) - epoch_us(b.vts)) // 1000000 AS gap_seconds,
       (b.view_id IS NOT NULL) AS matched
FROM purchases p LEFT JOIN best b USING (purchase_id)
"""


@query("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas merge_asof(tolerance=24h) /
    kdb window-join semantics): every purchase keeps its row and gains
    the user's LAST view within the preceding 24 hours — or NULLs when
    no view qualifies, which the plain as-of pair in the registry
    cannot express (they emit matches only). Tie-break on (view ts,
    view id) keeps the winner deterministic.

    Scale posture: the pair space is EQUI on user_id with the 24-hour
    residual bounding per-purchase fan-out (the attribution-join
    argument); the per-purchase argmax is a map-side-combinable
    max_by aggregate, and the final enrich joins back at |purchases|
    cardinality."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("pts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").cast("timestamp").alias("vts"),
    )
    joined = purchases.join(
        views,
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("vts") < F.col("pts"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 24 HOUR")),
    )
    best = joined.groupBy("purchase_id").agg(
        F.max_by(
            F.col("view_id"), F.struct(F.col("vts"), F.col("view_id"))
        ).alias("view_id"),
        F.max("vts").alias("vts"),
    )
    return (
        purchases.join(best, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "view_id",
            F.expr(
                "(unix_micros(pts) - unix_micros(vts)) DIV 1000000"
            ).alias("gap_seconds"),
            F.col("view_id").isNotNull().alias("matched"),
        )
    )
