"""Time-series workload — resample/gap-fill over the events stream
(operators/timeseries.py). One query; the operator itself is reusable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.operators.timeseries import gapfill_locf
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH daily AS (
        SELECT user_id, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
    ), spine AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS d
        FROM spans
    )
    SELECT s.user_id,
           s.d AS day,
           last_value(daily.v IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS total_value,
           -- row-presence, not value-nullness: a day whose observed
           -- values were all NULL is an observed day, not a gap
           daily.d IS NULL AS is_gap
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


@query(
    "ts_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
               lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        FROM events
    ), flagged AS (
        SELECT user_id, t, event_id,
               CASE WHEN prev_t IS NULL
                         OR date_diff('microsecond', prev_t, t) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ), sessioned AS (
        SELECT user_id, t, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(t) AS session_start, MAX(t) AS session_end
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: batch sessionization — the gaps-and-islands pattern: a session
    break is a >30-min silence; the running sum of break flags numbers
    the sessions. One shuffle on user_id shared by the lag window, the
    cumsum window, and the final per-session aggregate. (Streaming
    equivalent: T4's native session_window.) Microsecond integer
    arithmetic (util.epoch_us — unix_micros rejects the fixtures'
    TIMESTAMP_NTZ) keeps the gap test exact on both engines; event_id
    breaks ordering ties deterministically."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_apache_kafka_python_doker_aws_spark.util import epoch_us

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id", F.col("ts").alias("t"), "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (epoch_us("ts") - epoch_us(F.lag("ts").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0).alias("new_session"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessioned = flagged.withColumn("session_id", F.sum("new_session").over(wc))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("t").alias("session_start"),
        F.max("t").alias("session_end"),
    )


@query(
    "ts_funnel",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view'     THEN CAST(ts AS TIMESTAMP) END) AS t_view,
               MIN(CASE WHEN event_type = 'click'    THEN CAST(ts AS TIMESTAMP) END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM stages
    """,
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: funnel analysis — ordered view → click → purchase progression
    per user, counted with first-occurrence timestamps (conditional MIN
    per stage, then ordering comparisons). One aggregate over user_id,
    one global rollup: no self-joins, no explode — the pattern that
    replaces the naive k-way self-join funnel at scale."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    reached_click = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    reached_full = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("int")).alias("n_view"),
        F.sum(reached_click.cast("int")).alias("n_view_click"),
        F.sum(reached_full.cast("int")).alias("n_full_funnel"),
    )


@query(
    "ts_retention",
    oracle="""
    WITH days AS (
        SELECT user_id,
               DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d
        FROM events
        GROUP BY 1, 2
    ), firsts AS (
        SELECT user_id, MIN(d) AS cohort_day FROM days GROUP BY user_id
    )
    SELECT CAST(firsts.cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(date_diff('day', firsts.cohort_day, days.d) AS INT) AS day_offset,
           CAST(COUNT(DISTINCT days.user_id) AS BIGINT) AS n_active
    FROM days JOIN firsts USING (user_id)
    WHERE date_diff('day', firsts.cohort_day, days.d) IN (0, 1, 7)
    GROUP BY 1, 2
    """,
)
def ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: retention cohorts — users grouped by first-activity day,
    counted again at day offsets 0/1/7. Two aggregates and one join, all
    hash-partitioned on user_id; day extraction is the TZ-independent
    NTZ truncation (util.day_bucket) so non-UTC driver sessions cannot
    shift cohort boundaries; cohort_day stays TIMESTAMP_NTZ (DateType
    outputs mismatch the driver's pandas-fetched oracle rendering)."""
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark.util import day_bucket

    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", day_bucket("ts").alias("d")).distinct()
    firsts = days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    joined = days.join(firsts, "user_id").withColumn(
        "day_offset", F.datediff(F.col("d"), F.col("cohort_day")).cast("int")
    )
    return (
        joined.filter(F.col("day_offset").isin(0, 1, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "ts_anomaly",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS v,
               SUM(CAST(ROUND(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id) AS s,
               SUM(CAST(ROUND(value * 100) AS BIGINT)
                   * CAST(ROUND(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id) AS q,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN (n * v - s) * (n * v - s) > 9 * (n * q - s * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM c
    GROUP BY user_id
    """,
)
def ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: per-user 3-sigma anomaly counts with EXACT integer algebra —
    the z-score test |v-μ| > 3σ multiplied through by n²:
    (n·v − s)² > 9(n·q − s²) over integer cents (s=Σv, q=Σv²), so the
    flag is bit-identical on every engine — no float variance drift (the
    oracle-alignment trap that makes naive stddev-based flags
    uncomparable). One window shuffle on user_id feeding the final
    aggregate in place. Bounds: cents ≤ 5.7e4, per-user n ≤ 1e4 keeps
    every product inside int64; at larger per-key cardinality switch s/q
    to DECIMAL(38,0) (documented, same algebra)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id")
    c = e.select(
        "user_id",
        v.alias("v"),
        F.sum(v).over(w).alias("s"),
        F.sum(v * v).over(w).alias("q"),
        F.count("*").over(w).alias("n"),
    )
    lhs = (F.col("n") * F.col("v") - F.col("s"))
    flag = (lhs * lhs) > (
        F.lit(9) * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    )
    return c.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.sum(flag.cast("int")).alias("n_anomalies"),
    )


@query(
    "ts_ewma",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(value AS DOUBLE) AS value,
           value / 2
           + COALESCE(LAG(value, 1) OVER w, 0) / 4
           + COALESCE(LAG(value, 2) OVER w, 0) / 8
           + COALESCE(LAG(value, 3) OVER w, 0) / 16
           + COALESCE(LAG(value, 4) OVER w, 0) / 32
           + COALESCE(LAG(value, 5) OVER w, 0) / 64
           + COALESCE(LAG(value, 6) OVER w, 0) / 128
           + COALESCE(LAG(value, 7) OVER w, 0) / 256 AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: truncated exponentially-weighted moving average (α=1/2,
    8-term horizon) per user over event time. EWMA's recursion
    y_t = αx_t + (1−α)y_{t−1} has no bounded window form, so the
    scalable version truncates: weights α(1−α)^k decay to 2^-8 ≈ 0.4%
    — one window shuffle, no recursion, no state.

    Cross-engine exactness by construction: α=1/2 makes every weight a
    power of two (division by 2^k is correctly rounded on any IEEE
    machine — unlike pow(1−α, k) for general α, which is libm-
    dependent), and both sides write the SAME left-associated addition
    chain, so every intermediate rounding is identical and the oracle
    match is bit-exact without any ROUND()."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ewma = F.col("value") / 2
    for k in range(1, 8):
        ewma = ewma + F.coalesce(F.lag("value", k).over(w), F.lit(0.0)) / (2 ** (k + 1))
    return e.select("user_id", "event_id", "ts", "value", ewma.alias("ewma"))
