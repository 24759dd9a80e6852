"""Physical-plan assertions — the 100 TB scale contract, enforced in CI:
filters push into the parquet scan, dimensions broadcast, aggregates are
two-phase (map-side partial), sort+limit avoids a global sort, and columns
are pruned to what the query reads."""

from __future__ import annotations

import re

from etl_apache_kafka_python_doker_aws_spark.workloads import QUERIES
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    jdf = df._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "p3_filter_predicates")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no PushedFilters in plan"
    pushed = m.group(1)
    assert "GreaterThanOrEqual(l_quantity,10.0)" in pushed
    assert "In(l_returnflag" in pushed


def test_column_pruning(spark):
    plan = plan_of(spark, "p1_project_rename")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # only the three projected columns are read, not all five
    assert cols == {"c_custkey", "c_name", "c_mktsegment"}, cols


def test_dimension_joins_broadcast(spark):
    for name in ("j2_broadcast_join", "q5_local_supplier_volume"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join"
        assert "SortMergeJoin" not in plan, f"{name}: dim join fell back to SMJ"


def test_aggregate_is_two_phase(spark):
    plan = plan_of(spark, "a1_pricing_summary")
    # partial + final hash aggregate around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_sort_limit_is_topk(spark):
    plan = plan_of(spark, "o1_sort_limit")
    assert "TakeOrderedAndProject" in plan, "sort+limit should not be a global sort"


def test_wordcount_partial_aggregates_before_shuffle(spark):
    plan = plan_of(spark, "l4_word_topk")
    # the generate(explode) must be followed by a partial aggregate, then
    # the exchange — the shuffle carries (word, count) not raw tokens
    gen = plan.find("Generate")
    first_agg = plan.find("HashAggregate")
    assert gen != -1 and first_agg != -1
    assert plan.count("HashAggregate") >= 2


def test_aqe_active_on_shuffle_joins(spark):
    """AQE must wrap shuffle-join plans (runtime re-planning: coalesce,
    skew split, join demotion) — SURVEY.md §4.2."""
    plan = plan_of(spark, "j1_inner_join")
    assert "AdaptiveSparkPlan" in plan
