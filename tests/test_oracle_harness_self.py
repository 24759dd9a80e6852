"""Self-tests for the driver-faithful oracle harness: each coercion class
that burned rounds 2-3 (DECIMAL trailing zeros, HUGEINT→float64,
DATE→midnight timestamp, nullable-int→float64) must be CAUGHT by
compare(), and the aligned forms must pass. The round-3 harness
normalized these away and reported false MATCHes — local red must
predict driver red."""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _df(spark, sql):
    return spark.sql(sql)


def test_decimal_trailing_zero_mismatches(spark, duck):
    # Spark decimal '1.20' vs oracle DECIMAL fetched as float64 '1.2'
    df = _df(spark, "SELECT CAST(1.20 AS DECIMAL(18,2)) AS v")
    ok, detail = compare(df, duck, "SELECT CAST(1.20 AS DECIMAL(18,2)) AS v")
    assert not ok and "1.20" in detail, detail


def test_double_both_sides_matches(spark, duck):
    df = _df(spark, "SELECT CAST(CAST(1.20 AS DECIMAL(18,2)) AS DOUBLE) AS v")
    ok, detail = compare(
        df, duck, "SELECT CAST(CAST(1.20 AS DECIMAL(18,2)) AS DOUBLE) AS v"
    )
    assert ok, detail


def test_hugeint_mismatches_and_bigint_matches(spark, duck):
    df = _df(spark, "SELECT CAST(3 AS BIGINT) AS v")
    # DuckDB SUM(int) is HUGEINT → pandas float64 '3.0' vs Spark '3'
    ok, _ = compare(df, duck, "SELECT SUM(x) AS v FROM (SELECT 3::BIGINT AS x)")
    assert not ok
    ok, detail = compare(
        df, duck, "SELECT CAST(SUM(x) AS BIGINT) AS v FROM (SELECT 3::BIGINT AS x)"
    )
    assert ok, detail


def test_spark_date_mismatches_timestamp_matches(spark, duck):
    # Spark DateType renders '2020-01-02'; a pandas-fetched DATE renders
    # the midnight Timestamp — DateType outputs are banned
    df = _df(spark, "SELECT CAST('2020-01-02' AS DATE) AS v")
    ok, _ = compare(df, duck, "SELECT CAST('2020-01-02' AS DATE) AS v")
    assert not ok
    df2 = _df(spark, "SELECT CAST('2020-01-02' AS TIMESTAMP_NTZ) AS v")
    ok, detail = compare(df2, duck, "SELECT CAST('2020-01-02' AS DATE) AS v")
    assert ok, detail  # NTZ midnight == pandas-coerced DATE rendering


def test_nullable_int_mismatches_double_matches(spark, duck):
    # a BIGINT column containing NULLs comes back float64 from pandas
    df = _df(spark, "SELECT * FROM VALUES (108L), (NULL) AS t(v)")
    oracle = "SELECT * FROM (VALUES (108::BIGINT), (NULL::BIGINT)) t(v)"
    ok, _ = compare(df, duck, oracle)
    assert not ok  # '108' vs '108.0'
    df2 = _df(spark, "SELECT CAST(v AS DOUBLE) AS v FROM VALUES (108L), (NULL) AS t(v)")
    oracle2 = "SELECT CAST(v AS DOUBLE) AS v FROM (VALUES (108::BIGINT), (NULL::BIGINT)) t(v)"
    ok, detail = compare(df2, duck, oracle2)
    assert ok, detail


def test_spark_nan_mismatches_oracle_null(spark, duck):
    # ADVICE r4: the driver's Spark side keeps NaN distinct from NULL
    # (only the pandas-fetched oracle side merges them), so a Spark NaN
    # where the oracle yields NULL must fail locally too — and a NaN
    # output is never safe even when the oracle also yields NaN, because
    # the oracle side cannot prove it wasn't NULL.
    df = _df(spark, "SELECT CAST('NaN' AS DOUBLE) AS v")
    ok, _ = compare(df, duck, "SELECT NULL::DOUBLE AS v")
    assert not ok
    df2 = _df(spark, "SELECT CAST(NULL AS DOUBLE) AS v")
    ok, detail = compare(df2, duck, "SELECT NULL::DOUBLE AS v")
    assert ok, detail


def test_full_precision_floats_detect_ulp_differences(spark, duck):
    # the round-1 lesson: %.6g hashing hid ulp-level drift
    df = _df(spark, "SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS v")
    ok, _ = compare(df, duck, "SELECT 0.30000000000000004::DOUBLE AS v")
    assert ok
    ok, _ = compare(df, duck, "SELECT 0.3::DOUBLE AS v")
    assert not ok
