"""Aggregation queries — SURVEY.md §2.4 (A1-A10).

The reference's only "aggregation" is materializing all rows into one JSON
array (/root/reference/dags/etl_dags.py:58-60 → A8); everything else is the
declared engine surface. All aggregates are expressed with built-in
``pyspark.sql.functions`` so Catalyst plans partial (map-side) aggregation
before the shuffle — at 100 TB the shuffle carries only per-partition
partial states, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.workloads.money import (
    money,
    money_sum,
    one_minus,
    one_plus,
    rate,
)
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
                AS DOUBLE)                                      AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(8,2)))), 2)
                AS DOUBLE)                                      AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(8,2)))
                          * (1 + CAST(l_tax AS DECIMAL(8,2)))), 2)
                AS DOUBLE)                                      AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                   AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(l_extendedprice), 2)                          AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
                 / COUNT(l_discount), 4)                               AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 analog — filter + project + grouped hash-agg.

    Exercises P3/P4/A1/A2 in one plan. Catalyst pushes the shipdate filter
    into the parquet scan and plans a two-phase hash aggregate; at scale the
    group-key cardinality (3×2) makes the final shuffle trivial. Money sums
    are exact decimals (workloads/money.py); averages divide the exact
    decimal sum as a double so both engines see identical inputs (a raw
    AVG(double) is summation-order-dependent). avg_qty stays AVG: quantity
    is integer-valued, so its double sum is already exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum(money("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(disc_price * one_plus("l_tax"), "sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(
                F.sum(money("l_extendedprice")).cast("double") / F.count("l_extendedprice"), 2
            ).alias("avg_price"),
            F.round(F.sum(rate("l_discount")).cast("double") / F.count("l_discount"), 4).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "a2_global_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)            AS n_rows,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
                AS DOUBLE)              AS total_price,
           MIN(l_shipdate)                     AS first_ship,
           MAX(l_shipdate)                     AS last_ship,
           ROUND(AVG(l_quantity), 4)           AS avg_qty,
           MIN(l_quantity)                     AS min_qty,
           MAX(l_quantity)                     AS max_qty
    FROM lineitem
    """,
)
def a2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate — single-stage partial + final."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        money_sum(money("l_extendedprice"), "total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "a3_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS n_supps,
           CAST(COUNT(*) AS BIGINT)                   AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Catalyst plans expand + two-phase agg so
    multiple distinct columns still make a single pass over the data."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query(
    "a4_approx_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS parts_within_rsd,
           TRUE AS median_within_pct,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a4_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketch aggregates: HLL++ count-distinct and quantile
    sketch — the 100 TB substitutes for their exact cousins. Output is
    deterministic and oracle-checkable (VERDICT r1 #4): the sketch values
    are validated IN-QUERY against their exact cousins and emitted as
    booleans (HLL within 5×rsd, approx-median within 5% of exact), so the
    DuckDB oracle asserts TRUE alongside the exact counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    exact_parts = F.countDistinct("l_partkey")
    approx_parts = F.approx_count_distinct("l_partkey", 0.02)
    exact_median = F.expr("percentile(l_extendedprice, 0.5)")
    approx_median = F.percentile_approx("l_extendedprice", 0.5, 10000)
    return li.groupBy("l_returnflag").agg(
        exact_parts.alias("exact_parts"),
        (
            F.abs(approx_parts.cast("double") - exact_parts.cast("double"))
            <= 0.10 * exact_parts.cast("double")
        ).alias("parts_within_rsd"),
        (F.abs(approx_median - exact_median) <= 0.05 * F.abs(exact_median)).alias(
            "median_within_pct"
        ),
        F.count("*").alias("n_rows"),
    )


@query(
    "a5_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)            AS sum_qty,
           CAST(COUNT(*) AS BIGINT)   AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a5_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (flag,status) → (flag) → () with NULL fill.
    l_quantity is integer-valued → no float stabilization needed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "a5_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)            AS sum_qty,
           CAST(COUNT(*) AS BIGINT)   AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "a5_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)          AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INTEGER)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER)  AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() markers (via spark.sql —
    identical Catalyst plan to the DataFrame form)."""
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table as _lt

    _lt(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity)  AS sum_qty,
               CAST(GROUPING(l_returnflag) AS INT)  AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT)  AS g_status
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "a6_percentiles",
    oracle="""
    SELECT l_returnflag,
           PERCENTILE_CONT(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
           PERCENTILE_CONT(0.9)  WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
           PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_disc_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a6_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles: continuous (interpolated) and discrete.
    Integer-valued quantities → interpolation is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").alias("median_qty"),
        F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)").alias("p90_qty"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").alias(
            "p25_disc_qty"
        ),
    )


@query(
    "a7_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 2)               AS sd_price,
           ROUND(VAR_SAMP(l_extendedprice) / 1000000, 4)        AS var_price_m,
           ROUND(CORR(l_quantity, l_extendedprice), 6)          AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 6)         AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a7_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar. Variance is
    rescaled to millions before rounding so cross-engine summation-order
    noise (~1e-3 absolute at 1e9 magnitude) stays below the rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_extendedprice") / 1000000, 4).alias("var_price_m"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


@query(
    "a8_collect_list",
    oracle="""
    SELECT o_orderpriority,
           ARRAY_TO_STRING(LIST_SORT(LIST(o_orderkey)), ',') AS order_keys,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',') AS statuses
    FROM orders
    WHERE o_custkey < 50
    GROUP BY o_orderpriority
    """,
)
def a8_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list / collect_set) — parity with the
    reference's build-everything-into-one-JSON-array export
    (/root/reference/dags/etl_dags.py:58-60). Sorted + string-joined to be
    order-insensitive across engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey") < 50)
        .groupBy("o_orderpriority")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")), lambda x: x.cast("string")
                ),
            ).alias("order_keys"),
            F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses"),
        )
    )


@query(
    "a9_min_max_by",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey DESC) AS rmin
      FROM orders
    )
    SELECT o_orderpriority,
           MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
           MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def a9_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) with a composite ordering struct so
    ties on price resolve deterministically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("biggest_order"),
        F.min_by(
            "o_orderkey", F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("nk"))
        ).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "a10_pivot",
    oracle="""
    SELECT l_returnflag,
           SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS "O",
           SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a10_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (never inferred — inference is an
    extra job at scale and nondeterministic column order)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )

