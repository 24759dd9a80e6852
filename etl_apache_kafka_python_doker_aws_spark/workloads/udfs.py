"""UDF/UDAF/UDTF surface — SURVEY.md §2.9 (U1-U4).

The reference's 'UDFs' are its ad-hoc serializer lambdas
(/root/reference/dags/etl_dags.py:15,32). Here each Spark UDF tier is
exercised with deterministic arithmetic so a plain-SQL oracle can verify
it: U1 row-at-a-time Python UDF (kept tiny — documented slow path), U2
Arrow-vectorized pandas UDF, U3 grouped-map applyInPandas, U4 Python UDTF.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "u1_scalar_udf",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'big' ELSE 'small' END AS size_tag
    FROM orders WHERE o_orderkey < 500
    """,
)
def u1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: row-at-a-time Python UDF (deliberately bounded input — this
    tier pays per-row serde and is the documented slow path; P5's
    when/otherwise is the JVM form of the same logic)."""

    @F.udf(T.StringType())
    def size_tag(price: float) -> str:
        return "big" if price >= 200000 else "small"

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select("o_orderkey", size_tag("o_totalprice").alias("size_tag"))


@query(
    "u2_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def u2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Arrow-vectorized pandas UDF — identical IEEE arithmetic to the
    JVM expression, ~10-100x the throughput of U1."""

    @F.pandas_udf(T.DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@query(
    "u3_grouped_map",
    oracle="""
    SELECT user_id, event_id,
           value - MIN(value) OVER (PARTITION BY user_id) AS value_rel
    FROM events
    """,
)
def u3_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-map applyInPandas — per-user rebasing against the group
    minimum, the canonical per-group pandas transform (one shuffle on the
    group key; each group materializes as a pandas DataFrame in an
    executor). Min (not mean) keeps the check bit-exact: the group min is
    an input double, so value-min is the same IEEE op in both engines,
    while a mean's last-ulp depends on summation order."""

    def rebase(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[["user_id", "event_id", "value"]].copy()
        pdf["value_rel"] = pdf["value"] - pdf["value"].min()
        return pdf.drop(columns=["value"])

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        rebase, schema="user_id long, event_id long, value_rel double"
    )


@query(
    "u4_udtf",
    oracle="""
    SELECT o_orderkey, UNNEST(GENERATE_SERIES(1, 3)) AS installment,
           o_totalprice / 3 AS amount
    FROM orders WHERE o_orderkey < 200
    """,
)
def u4_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: Python UDTF (Spark >=3.5) — 1→N row expansion (order split
    into 3 installments), the table-function form of explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, installment bigint, amount double")
    class Installments:
        def eval(self, orderkey: int, total: float):
            for i in range(1, 4):
                yield orderkey, i, total / 3

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    o.createOrReplaceTempView("u4_orders_src")
    spark.udtf.register("installments_udtf", Installments)
    return spark.sql(
        """
        SELECT t.o_orderkey, t.installment, t.amount
        FROM u4_orders_src,
             LATERAL installments_udtf(o_orderkey, o_totalprice) t
        """
    )


@query(
    "u5_apply_in_arrow",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    """,
)
def u5_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: grouped-map applyInArrow (Spark 4) — the zero-copy tier below
    applyInPandas: the group arrives as a pyarrow.Table, no pandas
    conversion. Sums integer cents (exact on the 2-dp fixture values) so
    the result is order-independent and oracle-comparable."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def totals(table: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(table.column("value"), 100)), pa.int64())
        return pa.table(
            {
                "user_id": [table.column("user_id")[0].as_py()],
                "n_events": [table.num_rows],
                "total_cents": [pc.sum(cents).as_py()],
            }
        )

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInArrow(
        totals, schema="user_id long, n_events long, total_cents long"
    )


@query(
    "u6_map_in_arrow",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events WHERE event_type = 'purchase'
    """,
)
def u6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: mapInArrow — partition-at-a-time Arrow batches with no pandas
    materialization; the right tier for wrapping native/vectorized
    libraries (the multimodal decoders in functions/multimodal.py use
    the same batch shape)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_cents(batches):
        for b in batches:
            cents = pc.cast(pc.round(pc.multiply(b.column("value"), 100)), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [b.column("event_id"), b.column("user_id"), cents],
                names=["event_id", "user_id", "value_cents"],
            )

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "value")
    return e.mapInArrow(to_cents, schema="event_id long, user_id long, value_cents long")


@query(
    "u7_grouped_agg_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS weighted_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def u7_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U7: grouped-AGGREGATE pandas UDF (series → scalar) — the
    user-defined aggregate tier: partial batches stream through Arrow and
    the custom reduction runs per group. Integer-cents weighting keeps
    the reduction exact and order-independent, so it oracle-compares.
    (Python UDAFs via Aggregator are JVM-only; this is the Python-native
    equivalent.)"""

    @F.pandas_udf(T.LongType())
    def weighted_cents(price: pd.Series, qty: pd.Series) -> int:
        return int(
            ((price * 100).round().astype("int64") * qty.astype("int64")).sum()
        )

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_cents("l_extendedprice", "l_quantity").alias("weighted_cents")
    )
