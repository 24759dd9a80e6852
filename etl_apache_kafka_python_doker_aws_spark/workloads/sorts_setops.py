"""Sort / limit / top-k and set operations — SURVEY.md §2.6 (O1-O5).

Every ordering used with LIMIT includes a unique tiebreaker key so results
are total-ordered — without it, LIMIT across engines (or across Spark
partitions) is nondeterministic. Global sorts use range partitioning
(Spark's TakeOrderedAndProject for sort+limit avoids a full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.operators.windows import top_k_per_group
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "o1_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def o1_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort + limit. Spark plans TakeOrderedAndProject:
    per-partition top-100 heaps, then a single driver merge — no global
    shuffle, which is what makes top-k viable at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(100)
    )


@query(
    "o2_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 20
    """,
)
def o2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET over a total order."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(20).limit(50)


@query(
    "o3_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rk <= 5
    """,
)
def o3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — engine operator `top_k_per_group` (window
    row_number ≤ k; single shuffle on the group key)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group(
        joined,
        group_cols=["c_mktsegment"],
        order_cols=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=5,
        rank_col="rk",
    )


@query(
    "o4_union",
    oracle="""
    SELECT key, name FROM (
      SELECT c_custkey AS key, c_name AS name FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT s_suppkey AS key, s_name AS name FROM supplier
    )
    """,
)
def o4_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of schema-aligned projections (unionByName)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    b = s.select(F.col("s_suppkey").alias("key"), F.col("s_name").alias("name"))
    return a.unionByName(b)


@query(
    "o4_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def o4_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup (union + distinct → hash aggregate)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nk"))
        .union(s.select(F.col("s_nationkey").alias("nk")))
        .distinct()
    )


@query(
    "o5_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def o5_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations having both customers
    and suppliers."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nk")).intersect(
        s.select(F.col("s_nationkey").alias("nk"))
    )


@query(
    "o5_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def o5_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — nations with customers but no
    suppliers."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nk")).subtract(
        s.select(F.col("s_nationkey").alias("nk"))
    )


@query(
    "o1_nulls_ordering",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null
    FROM orders
    ORDER BY status_or_null NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)
def o1_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort with explicit NULLS FIRST placement (fixtures have no null
    column, so NULLIF manufactures one) + unique tiebreaker + limit."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        )
        .orderBy(F.col("status_or_null").asc_nulls_first(), F.col("o_orderkey"))
        .limit(50)
    )


@query(
    "o5_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def o5_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5b: INTERSECT ALL (bag semantics — multiplicity = min of the two
    sides, unlike the distinct INTERSECT in o5). Planned as a count-
    compare aggregate, one shuffle per side."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(op)


@query(
    "o5_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def o5_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5c: EXCEPT ALL (bag semantics — multiplicity = left minus right,
    floored at zero)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.exceptAll(p)


@query(
    "o3b_topk_prereduced",
    scale_form="bounded",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rk <= 5
    """,
)
def o3b_topk_prereduced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 scalable form: IDENTICAL semantics (and oracle) to
    o3_topk_per_group, but the plan pre-reduces each partition to ≤ k
    rows per group (narrow mapInPandas, state carried across Arrow
    batches) before the exact window — the window shuffle carries only
    partitions·groups·k candidates instead of the whole join output
    (operators/windows.top_k_per_group_prereduced). Same answer, two
    plans: the window form when group count is huge and rows/group
    small, the pre-reduced form when groups are few and rows/group is
    the problem."""
    from etl_apache_kafka_python_doker_aws_spark.operators.windows import (
        top_k_per_group_prereduced,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group_prereduced(
        joined,
        group_cols=["c_mktsegment"],
        order_col="o_totalprice",
        k=5,
        tiebreak_col="o_orderkey",
        rank_col="rk",
    )
