"""Time-series workload — resample/gap-fill over the events stream
(operators/timeseries.py). One query; the operator itself is reusable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.operators.timeseries import gapfill_locf
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH daily AS (
        SELECT user_id, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2)
                    AS DECIMAL(18,2)) AS v
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
    ), spine AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS d
        FROM spans
    )
    SELECT s.user_id,
           CAST(s.d AS DATE) AS day,
           last_value(daily.v IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS total_value,
           daily.v IS NULL AS is_gap
    FROM spine s
    LEFT JOIN daily ON daily.user_id = s.user_id AND daily.d = s.d
    """,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: daily resample of per-user event value with gap-fill — the
    spine guarantees one row per (user, day) between each user's first
    and last event; empty days carry the last observed daily total
    forward and are flagged ``is_gap``. Two shuffles total (both on
    user_id: the daily agg reuses its partitioning for the span agg,
    the spine join and LOCF window share the second)."""
    e = load_table(spark, sf_dir, "events")
    return gapfill_locf(e, "user_id", "ts", "value")
