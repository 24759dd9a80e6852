#!/usr/bin/env python
"""Event-analytics walkthrough: the time-series operator family as a
user-facing library — sessionization, funnel, retention, gap-fill, and
exact-integer anomaly flags over the events stream.

Run:  python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark import get_spark
from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.operators.timeseries import gapfill_locf
from etl_apache_kafka_python_doker_aws_spark.workloads.timeseries import (
    ts_anomaly,
    ts_funnel,
    ts_retention,
    ts_sessionize,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="analytics-example")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")
    print(f"events: {events.count()} rows")

    # 1. sessionize (>30-min silences split sessions)
    sessions = ts_sessionize(spark, sf_dir)
    sessions.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 2).alias("avg_events_per_session"),
    ).show()

    # 2. conversion funnel view -> click -> purchase
    ts_funnel(spark, sf_dir).show()

    # 3. day-0/1/7 retention cohorts (first three cohorts)
    ts_retention(spark, sf_dir).orderBy("cohort_day", "day_offset").show(9)

    # 4. daily per-user revenue with gap-fill (one user's trace)
    one_user = gapfill_locf(events, "user_id", "ts", "value").filter(
        F.col("user_id") == 1
    )
    one_user.orderBy("day").show(10)

    # 5. 3-sigma outliers, exact integer arithmetic
    anomalies = ts_anomaly(spark, sf_dir)
    anomalies.agg(
        F.sum("n_anomalies").alias("total_anomalies"),
        F.count("*").alias("n_users"),
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
