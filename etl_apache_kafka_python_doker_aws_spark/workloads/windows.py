"""Window function queries — SURVEY.md §2.5 (W1-W5).

Determinism rules applied throughout: every ORDER BY inside a window ends
with a unique tiebreaker (else row_number/ntile are nondeterministic across
engines AND across Spark runs); running sums use integer-valued doubles
(l_quantity) so segment-tree vs sequential summation order can't produce
ulp drift.

r8 refinement of the tiebreaker rule, found by the synthetic-sf1 sweep:
"(l_orderkey, l_linenumber) is unique" is a TPC-H assumption the driver
fixture does not honor — sf0.1 has 118k duplicate (orderkey, linenumber)
pairs and exactly one fully-tied (suppkey, shipdate, orderkey,
linenumber) group with quantities [16, 13], so w4/w5's mid-tie running
values were order-ambiguous by ±3 (invisible at the driver's sf0.01
gate, where the tie doesn't occur). The order now ends with l_quantity
on both engines: two rows tied on ALL order keys then carry equal
values, which makes any evaluation order produce identical frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.operators.windows import moving_avg, running_agg
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "w1_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROW_NUMBER()  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
           RANK()        OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
           DENSE_RANK()  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
           NTILE(4)      OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC), 6) AS prk
    FROM customer
    """,
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number / rank / dense_rank / ntile /
    percent_rank. rank & percent_rank order by the non-unique value (tie
    semantics under test); row_number & ntile get a unique tiebreaker."""
    c = load_table(spark, sf_dir, "customer")
    w_tie = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_val = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w_tie).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
        F.ntile(4).over(w_tie).alias("quartile"),
        F.round(F.percent_rank().over(w_val), 6).alias("prk"),
    )


@query(
    "w2_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value)     OVER w AS prev_value,
           LEAD(value)    OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_or_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead with offsets and defaults over event time."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


@query(
    "w3_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                               RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS BIGINT)
             AS n_nearby
    FROM orders
    """,
)
def w3_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a value column: how many same-status orders fall
    within ±10000 of this order's price (count — exact under ties)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count("*").over(w).alias("n_nearby"),
    )


@query(
    "w4_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           SUM(l_quantity) OVER (PARTITION BY l_suppkey
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                          l_quantity
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_qty
    FROM lineitem
    """,
)
def w4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per supplier (engine operator `running_agg`).
    l_quantity is integer-valued → exact regardless of summation order."""
    li = load_table(spark, sf_dir, "lineitem")
    return running_agg(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
        group_cols=["l_suppkey"],
        order_cols=[F.col("l_shipdate"), F.col("l_orderkey"),
                    F.col("l_linenumber"), F.col("l_quantity")],
        value_col="l_quantity",
        out_col="running_qty",
    ).select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")


@query(
    "w5_moving_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           AVG(l_quantity) OVER (PARTITION BY l_suppkey
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                          l_quantity
                                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             AS mavg_qty
    FROM lineitem
    """,
)
def w5_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing moving average over the last 4 rows (engine operator
    `moving_avg`); integer-valued quantities keep it bit-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return moving_avg(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
        group_cols=["l_suppkey"],
        order_cols=[F.col("l_shipdate"), F.col("l_orderkey"),
                    F.col("l_linenumber"), F.col("l_quantity")],
        value_col="l_quantity",
        window_rows=3,
        out_col="mavg_qty",
    ).select("l_suppkey", "l_orderkey", "l_linenumber", "mavg_qty")


@query(
    "w2_first_last_frame",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id)  OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def w2_first_last_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with an explicit full-partition frame for
    last_value (the default frame stops at CURRENT ROW in both engines)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
    )


@query(
    "w1_cume_dist",
    oracle="""
    SELECT c_custkey,
           ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS cd,
           -- DOUBLE both sides: nth_value is NULL on partition-leading rows,
           -- and a nullable BIGINT comes back float64 from the driver's
           -- pandas oracle fetch ('126.0' vs Spark's '126')
           CAST(NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS second_richest
    FROM customer
    """,
)
def w1_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist (tie-safe cumulative fraction) + nth_value with an
    explicit frame."""
    c = load_table(spark, sf_dir, "customer")
    w_val = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    w_nth = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        F.round(F.cume_dist().over(w_val), 6).alias("cd"),
        F.nth_value("c_custkey", 2).over(w_nth).cast("double").alias("second_richest"),
    )


@query(
    "w7_windowed_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_types_so_far
    FROM events
    """,
)
def w7_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: running DISTINCT count over a window — per user, how many
    distinct event types seen so far. Spark forbids DISTINCT inside
    window aggregates (``count(DISTINCT x) OVER`` is an
    AnalysisException); the idiomatic engine form is
    ``size(collect_set(x) OVER w)`` — the set is bounded by the distinct
    types, not the frame length, so state stays small even over
    unbounded-preceding frames. DuckDB supports windowed DISTINCT
    natively, which makes it the perfect oracle for the rewrite."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_types_so_far"),
    )
