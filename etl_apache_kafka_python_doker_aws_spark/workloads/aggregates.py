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
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
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
    group-key cardinality (3×2) makes the final shuffle trivial.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
