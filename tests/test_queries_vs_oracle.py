"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB at sf0.001 (fast path; the driver re-runs at
sf0.01). Queries without an oracle must at least execute and return a
stable schema."""

from __future__ import annotations

import os

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


def test_coverage_scale_form_table():
    """COVERAGE.md's scale-form section is GENERATED from the registry —
    this pins the two against drift (re-run registry.scale_form_table()
    and paste on change)."""
    from etl_apache_kafka_python_doker_aws_spark.workloads import registry

    table = registry.scale_form_table()
    with open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")) as f:
        cov = f.read()
    assert table in cov, "COVERAGE.md scale-form table is stale — regenerate"


def test_scale_form_tags():
    """Every query is tagged; the dual-form families carry their
    non-default tags; ship forms exist for every parity twin."""
    from etl_apache_kafka_python_doker_aws_spark.workloads import QUERIES, registry

    assert set(registry.SCALE_FORMS) == set(QUERIES)
    assert registry.SCALE_FORMS["t2_tumbling_window"] == "parity"
    assert registry.SCALE_FORMS["t2b_tumbling_append"] == "ship"
    assert registry.SCALE_FORMS["o3b_topk_prereduced"] == "bounded"
    assert registry.SCALE_FORMS["a19_heavy_hitters"] == "bounded"
    # the callable itself carries the tag for queries() consumers
    assert QUERIES["t4_session_window"].scale_form == "parity"
    for name, form in registry.SCALE_FORMS.items():
        if form == "parity":
            base, _, _ = name.partition("_")
            ships = [n for n, f in registry.SCALE_FORMS.items()
                     if f == "ship" and n.startswith(base + "b_")]
            assert ships, f"parity query {name} has no ship twin"
