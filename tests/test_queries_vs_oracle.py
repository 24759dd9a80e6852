"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB at sf0.001 (fast path; the driver re-runs at
sf0.01). Queries without an oracle must at least execute and return a
stable schema."""

from __future__ import annotations

import pytest

from etl_apache_kafka_python_doker_aws_spark.workloads import ORACLES, QUERIES
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck_smoke, build_query):
    df = build_query(name)
    if name in ORACLES:
        ok, detail = compare(df, duck_smoke, ORACLES[name])
        assert ok, f"{name}: {detail}"
    else:
        rows = df.count()
        assert rows >= 0
        assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
