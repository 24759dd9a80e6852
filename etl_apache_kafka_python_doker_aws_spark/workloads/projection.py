"""Projection / filter / predicate queries — SURVEY.md §2.2 (P1-P6).

P1/P2 are the reference's own surface: the tuple→named-dict projection with
renames (/root/reference/dags/etl_dags.py:17-25) and the decimal→float cast
(/root/reference/dags/etl_dags.py:23-24). P3-P6 are declared engine surface.

All predicates are Catalyst Column expressions → pushed into the parquet
scan (PushedFilters) and pruned to the referenced columns only; at 100 TB
that is the difference between scanning 7 columns and scanning the ~3 the
query needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "p1_project_rename",
    oracle="""
    SELECT c_custkey AS id,
           c_name    AS full_name,
           c_mktsegment AS segment
    FROM customer
    """,
)
def p1_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename — parity with the reference's tuple→dict
    projection (/root/reference/dags/etl_dags.py:17-25)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("full_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "p2_cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS VARCHAR)  AS price_str,
           ROUND(o_totalprice, 0)         AS price_round,
           CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP) AS order_date,
           CAST(o_custkey AS INTEGER)     AS custkey_int
    FROM orders
    """,
)
def p2_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casts in projection — parity with the reference's
    decimal→float coercion (/root/reference/dags/etl_dags.py:23-24,58).
    The day-truncation result stays TIMESTAMP_NTZ (DateType outputs
    mismatch the driver's pandas-fetched oracle rendering)."""
    from etl_apache_kafka_python_doker_aws_spark.util import day_bucket

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("string").alias("price_str"),
        F.round(F.col("o_totalprice"), 0).alias("price_round"),
        day_bucket("o_orderdate").alias("order_date"),
        F.col("o_custkey").cast("int").alias("custkey_int"),
    )


@query(
    "p3_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_discount < 0.05
      AND NULLIF(l_linestatus, 'X') IS NOT NULL
    """,
)
def p3_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter with BETWEEN / IN / comparison / IS NOT NULL predicates —
    all pushed down to the parquet scan by Catalyst (fixtures have no
    nullable column, so NULLIF manufactures the null case)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") < 0.05)
        & F.nullif(F.col("l_linestatus"), F.lit("X")).isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "p4_computed_column",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def p4_computed_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived columns from arithmetic expressions (whole-stage codegen'd).

    Deliberately unrounded: per-row IEEE arithmetic is bitwise identical
    across engines, while round() is not (Spark rounds via decimal string
    HALF_UP, DuckDB on the binary double) — rounding is for aggregates only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charged"),
    )


@query(
    "p5_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE o_orderstatus WHEN 'F' THEN 'finished' ELSE 'open-ish' END AS status_desc
    FROM orders
    """,
)
def p5_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN conditionals (Catalyst folds/simplifies these)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("open-ish")
        .alias("status_desc"),
    )


@query(
    "p6_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    """,
)
def p6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection — planned as a hash aggregate with map-side
    partial dedup, so the shuffle carries only distinct pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "p_sample",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_base,
           TRUE AS uniform_in_bounds,
           TRUE AS strata_in_bounds
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def p_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling (seeded) + stratified sampleBy — the corpus
    down-sampling primitives for training-data pipelines. Driver
    contract: per stratum the query reports the exact base count
    (oracle-computed) and booleans asserting each sampled count sits in
    [0.5, 1.5] x its expectation (0.1 uniform; 0.2/0.05/0.2 per flag) —
    at fixture scale the binomial sd is under 5% of the expectation, so
    the band only fails on broken sampling, not on seed choice. The
    sampled SET itself is engine-specific (per-partition XORShift), so
    exact membership is asserted in tests, not the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    uniform = (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_uniform"))
    )
    strata_rates = {"A": 0.2, "N": 0.05, "R": 0.2}
    strata = (
        li.sampleBy("l_returnflag", strata_rates, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_strata"))
    )
    base = li.groupBy("l_returnflag").agg(F.count("*").alias("n_base"))
    rate = F.when(F.col("l_returnflag") == "N", F.lit(0.05)).otherwise(F.lit(0.2))
    return (
        base.join(uniform, "l_returnflag", "left")
        .join(strata, "l_returnflag", "left")
        .select(
            "l_returnflag",
            "n_base",
            (
                (F.coalesce("n_uniform", F.lit(0)) >= 0.05 * F.col("n_base"))
                & (F.coalesce("n_uniform", F.lit(0)) <= 0.15 * F.col("n_base"))
            ).alias("uniform_in_bounds"),
            (
                (F.coalesce("n_strata", F.lit(0)) >= 0.5 * rate * F.col("n_base"))
                & (F.coalesce("n_strata", F.lit(0)) <= 1.5 * rate * F.col("n_base"))
            ).alias("strata_in_bounds"),
        )
    )
