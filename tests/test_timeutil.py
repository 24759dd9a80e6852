"""Unit tests for util.epoch_us / util.day_bucket — the NTZ-safe time
primitives every timestamp query routes through. These pin the properties
the round-4 migration relies on: microsecond exactness, session-timezone
independence (including DST-transition wall times), and NTZ-typed output.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.util import day_bucket, epoch_us


def _ntz_df(spark, *values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return df.select(F.col("s").cast("timestamp_ntz").alias("t"))


def test_epoch_us_exact_to_the_microsecond(spark):
    df = _ntz_df(spark, "2024-01-02 03:04:05.123456", "1970-01-01 00:00:00.000001")
    got = [r[0] for r in df.select(epoch_us("t")).collect()]
    expect0 = int(
        dt.datetime(2024, 1, 2, 3, 4, 5, 123456, tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )
    assert got == [expect0, 1]


def test_epoch_us_accepts_column_and_name(spark):
    df = _ntz_df(spark, "2000-06-01 12:00:00")
    a = df.select(epoch_us("t")).collect()[0][0]
    b = df.select(epoch_us(F.col("t"))).collect()[0][0]
    assert a == b == 959860800 * 1_000_000


def test_day_bucket_truncates_and_stays_ntz(spark):
    df = _ntz_df(spark, "2024-03-10 02:30:00", "2024-11-03 01:30:00")
    out = df.select(day_bucket("t").alias("d"))
    assert dict(out.dtypes)["d"] == "timestamp_ntz"
    got = sorted(r[0] for r in out.collect())
    assert got == [dt.datetime(2024, 3, 10), dt.datetime(2024, 11, 3)]


def test_helpers_are_session_timezone_independent(spark):
    """The exact hazard that broke round 3: these wall times fall inside
    US DST transitions (2024-03-10 02:30 does not exist in
    America/New_York; 2024-11-03 01:30 is ambiguous). Wall-time-only
    helpers must return identical results in a hostile session zone."""
    values = (
        "2024-03-10 02:30:00",
        "2024-11-03 01:30:00",
        "2024-01-01 00:00:00",
        "1999-12-31 23:59:59.999999",
    )
    df = _ntz_df(spark, *values)
    q = df.select("t", epoch_us("t").alias("e"), day_bucket("t").alias("d"))
    utc_rows = sorted(tuple(r) for r in q.collect())
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_rows = sorted(tuple(r) for r in q.collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc_rows == ny_rows
