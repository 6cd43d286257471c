"""Window / as-of / sessionization / streaming-batch-equivalent operators
(SURVEY.md §2B B10, B14-B16, B29-B30).

The as-of join is implemented the scalable JVM-side way: union the tagged
event streams, one window pass with last(ignorenulls) — no cogrouped Python,
no per-key loop, one shuffle on (user_id). DuckDB's native ASOF JOIN is the
oracle.

Streaming operators B29/B30 are verified through their batch-equivalent
forms here (same expressions Structured Streaming runs over micro-batches;
kgpipe/streaming/ops.py wires the identical logic to readStream — verified
by pytest against these batch results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.queries.registry import load, register

# --------------------------------------------------------------------------
# B15/B16: analytic windows + frame aggregates


@register(
    "window_running_order_total",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_quantity
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_qty,
           round(lag(l_extendedprice) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_quantity), 4)
               AS prev_price
    FROM lineitem
    """,
)
def window_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_linenumber) is NOT unique in this synthetic lineitem;
    the ORDER BY covers every output-affecting column so residual ties are
    interchangeable and the output multiset is deterministic."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice", "l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_qty"),
        F.round(F.lag("l_extendedprice").over(w), 4).alias("prev_price"),
    )


@register(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           round(avg(gap_days), 4) AS avg_gap_days
    FROM (
      SELECT o_custkey,
             CAST(date_diff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS INT) AS gap_days
      FROM orders) t
    GROUP BY o_custkey
    """,
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )
    return gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
    )


# --------------------------------------------------------------------------
# B10: as-of join — JVM-side union + window trick (scales: one shuffle on
# user_id, no Python, no per-key quadratic work)


def _asof_clicks_before_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("is_p"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("event_id").alias("click_id"),
        F.lit(0).alias("is_p"),
    )
    # clicks sort before a purchase at the same ts (is_p ASC) => "at or
    # before" semantics match ASOF (c.ts <= p.ts)
    unioned = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(
            "last_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_click_ts",
            F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .filter(F.col("is_p") == 1)
    )


@register(
    "asof_click_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_sec
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _asof_clicks_before_purchases(spark, sf_dir)
    return j.filter(F.col("last_click_id").isNotNull()).select(
        F.col("purchase_id"),
        F.col("last_click_id").alias("click_id"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts")
        ).cast("long").alias("gap_sec"),
    )


# --------------------------------------------------------------------------
# B29: tumbling + sliding event-time windows (batch-equivalent of the
# streaming groupBy(window(...)) — window starts as epoch seconds so the
# oracle comparison is timezone-proof)


@register(
    "tumbling_window_counts",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "sliding_window_counts",
    oracle="""
    WITH offsets(off) AS (VALUES (0), (300))
    SELECT CAST(floor((epoch(ts) - off) / 600) * 600 + off AS BIGINT)
               AS window_start,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events CROSS JOIN offsets
    GROUP BY 1
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# B30: session windows (gap = 30 min) — batch emulation with lag + running
# sum; identical logic to F.session_window in streaming mode.


@register(
    "session_windows_per_user",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL THEN 1
                  WHEN date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) > 1800 THEN 1
                  ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps)
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           CAST(max(cnt) AS BIGINT) AS max_session_events
    FROM (SELECT user_id, session_id, count(*) AS cnt
          FROM sess GROUP BY user_id, session_id) t
    GROUP BY user_id
    """,
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800, 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(w2))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_session.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.max("cnt").cast("long").alias("max_session_events"),
    )
