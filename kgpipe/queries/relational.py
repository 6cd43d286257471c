"""Relational operator surface B1-B23 (SURVEY.md §2B) over the TPC-H-ish
testdata, exercised by pipeline-meaningful queries.

Scale notes (the plans these produce at 100 TB):
* dimension joins broadcast (nation/region/supplier are tiny);
  orders x lineitem is a shuffle join on the natural key — AQE handles
  runtime sizing/skew.
* filters and projections sit directly on the parquet scan so Catalyst
  pushes them into the reader (PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgpipe.queries.registry import load, register

# --------------------------------------------------------------------------
# B1/B3/B4: scan + projection + predicate pushdown


@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'N'
      AND l_quantity IN (1, 25, 50)
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
            & (F.col("l_returnflag") == "N")
            & F.col("l_quantity").isin(1, 25, 50)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .alias("disc_price"),
        )
    )


# --------------------------------------------------------------------------
# B11: hash aggregate (TPC-H Q1 shape)


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                   AS sum_qty,
           round(sum(l_extendedprice), 4)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B5: broadcast dimension join chain


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 4) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# B6: big x big shuffle join (sort-merge / AQE-chosen)


@register(
    "join_orders_lineitem_revenue",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           count(DISTINCT o.o_orderkey) AS n_orders,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderpriority
    """,
)
def join_orders_lineitem_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# B7: outer join


@register(
    "join_left_outer_orderless",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_customers,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orderless
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey, min(o_orderkey) AS o_orderkey
               FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_left_outer_orderless(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("o_orderkey"))
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_orderless"),
        )
    )


# --------------------------------------------------------------------------
# B8: semi / anti joins


@register(
    "join_semi_big_spenders",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    GROUP BY n.n_name
    """,
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_anti_no_orders",
    oracle="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    GROUP BY c.c_mktsegment
    """,
)
def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "no big orders" rather than "no orders": every synthetic customer has
    # at least one order, so the unfiltered anti set is empty (a vacuous
    # check). The >400k filter leaves a non-empty anti set at every SF.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# B9: theta/range join bounded by an equi blocking key (day) — the scalable
# pattern for range joins: equi-join on a coarse bucket, theta filter inside.


@register(
    "range_join_daily_pairs",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', p.ts) AS DATE) AS VARCHAR) AS day,
           count(*) AS n_pairs
    FROM events p JOIN events c
      ON date_trunc('day', p.ts) = date_trunc('day', c.ts)
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.value > c.value
    GROUP BY 1
    """,
)
def range_join_daily_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").alias("p_value"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").alias("c_value"),
    )
    return (
        p.join(c, "day")
        .filter(F.col("p_value") > F.col("c_value"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# B12: exact distinct


@register(
    "distinct_active_custkeys",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           count(DISTINCT o_custkey) AS n_active
    FROM orders GROUP BY 1
    """,
)
def distinct_active_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )


# approximate distinct — engines differ by design: rows-only check.
# Registered LAST (queries/__init__.py), so if the registry ever exceeds
# the driver's 50-row report window again, the one row with no value-hash
# oracle is the one that falls off.
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# --------------------------------------------------------------------------
# B13: rollup / cube with grouping ids


@register(
    "rollup_cube_summary",
    oracle="""
    SELECT 'rollup' AS variant,
           l_returnflag AS g1, l_linestatus AS g2,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
               AS gid,
           count(*) AS n,
           round(sum(l_quantity), 4) AS metric
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS variant,
           o_orderstatus AS g1, o_orderpriority AS g2,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
               AS gid,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS metric
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def rollup_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 multi-level aggregation, both forms in one driver-reported
    result (round 4: the harness reports the first 50 registered queries):
    ``variant='rollup'`` = ROLLUP(l_returnflag, l_linestatus) over
    lineitem, ``variant='cube'`` = CUBE(o_orderstatus, o_orderpriority)
    over orders, each with its grouping id. Both halves stay one hash
    aggregation with partial (map-side) combine — the expanded grouping
    sets multiply rows only inside the agg operator, never in a shuffle of
    the base table."""
    li = load(spark, sf_dir, "lineitem")
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("metric"),
        )
        .select(
            F.lit("rollup").alias("variant"),
            F.col("l_returnflag").alias("g1"),
            F.col("l_linestatus").alias("g2"),
            "gid", "n", "metric",
        )
    )
    o = load(spark, sf_dir, "orders")
    cube = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("metric"),
        )
        .select(
            F.lit("cube").alias("variant"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            "gid", "n", "metric",
        )
    )
    return rollup.unionByName(cube)


# --------------------------------------------------------------------------
# B17/B14: global sort-limit and per-group top-k


@register(
    "topk_orders_per_priority",
    oracle="""
    SELECT priority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_orderpriority").alias("priority"), "o_orderkey", "o_totalprice"
        )
    )


@register(
    "global_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global sort-limit (B17): orderBy().limit(k) compiles to
    # TakeOrderedAndProject — per-partition top-k then a k-row driver merge,
    # NOT a global sort shuffle; constant memory at any SF.
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# B18: set operations


@register(
    "setops_customer_years",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1996)
    SELECT
      (SELECT count(*) FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)) AS in_both,
      (SELECT count(*) FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96))    AS only_95,
      (SELECT count(*) FROM (SELECT * FROM y95 UNION SELECT * FROM y96))     AS in_either
    """,
)
def setops_customer_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    # INTERSECT/EXCEPT/UNION over the same two keysets collapse to ONE
    # full-outer join with presence flags + one agg: a single Spark job with
    # a single shuffle, vs. the naive 3-action form (3 jobs, duplicated
    # intersect subplan) this replaced.
    o = load(spark, sf_dir, "orders")
    y95 = (
        o.filter(F.year("o_orderdate") == 1995)
        .select("o_custkey").distinct().withColumn("a", F.lit(1))
    )
    y96 = (
        o.filter(F.year("o_orderdate") == 1996)
        .select("o_custkey").distinct().withColumn("b", F.lit(1))
    )
    j = y95.join(y96, "o_custkey", "full_outer")
    return j.agg(
        F.sum(
            F.when(F.col("a").isNotNull() & F.col("b").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("in_both"),
        F.sum(
            F.when(F.col("a").isNotNull() & F.col("b").isNull(), 1).otherwise(0)
        ).cast("long").alias("only_95"),
        F.count(F.lit(1)).alias("in_either"),
    )


# --------------------------------------------------------------------------
# B19: string functions


@register(
    "string_normalize_parts",
    oracle="""
    SELECT upper(split_part(p_name, ' ', 2))                        AS part_kind,
           CAST(regexp_extract(p_brand, '[0-9]+') AS INT)           AS brand_num,
           count(*)                                                 AS n,
           CAST(sum(length(p_name)) AS BIGINT)                      AS total_name_len,
           round(avg(p_retailprice), 4)                             AS avg_price
    FROM part
    WHERE p_type LIKE '%O%' AND p_name IS NOT NULL
    GROUP BY 1, 2
    """,
)
def string_normalize_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%O%") & F.col("p_name").isNotNull())
        .groupBy(
            F.upper(F.split(F.col("p_name"), " ").getItem(1)).alias("part_kind"),
            F.regexp_extract("p_brand", r"[0-9]+", 0).cast("int").alias("brand_num"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("p_name")).cast("long").alias("total_name_len"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# B20: date/time functions


@register(
    "datetime_orders_by_month",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def datetime_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# B21: math functions


@register(
    "math_price_stats",
    oracle="""
    SELECT l_linestatus,
           round(sum(abs(l_extendedprice - 1000.0)), 4)        AS sum_abs_dev,
           round(sum(ln(l_extendedprice + 1.0)), 4)            AS sum_log,
           round(sum(sqrt(l_quantity)), 4)                     AS sum_sqrt_qty,
           round(sum(pow(l_discount, 2)), 6)                   AS sum_disc_sq
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def math_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.sum(F.abs(F.col("l_extendedprice") - 1000.0)), 4).alias(
            "sum_abs_dev"
        ),
        F.round(F.sum(F.log(F.col("l_extendedprice") + 1.0)), 4).alias("sum_log"),
        F.round(F.sum(F.sqrt("l_quantity")), 4).alias("sum_sqrt_qty"),
        F.round(F.sum(F.pow("l_discount", F.lit(2))), 6).alias("sum_disc_sq"),
    )


# --------------------------------------------------------------------------
# B23: JSON extraction


@register(
    "json_event_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
               AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("int").alias("max_k"),
    )
