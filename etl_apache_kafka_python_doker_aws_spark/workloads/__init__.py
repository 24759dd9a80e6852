"""Workload registry — one named query per SURVEY.md §2 operator row.

Importing this package imports every workload module, which registers its
queries/oracles into ``registry.QUERIES`` / ``registry.ORACLES``.
"""

from etl_apache_kafka_python_doker_aws_spark.workloads import (  # noqa: F401
    aggregates,
    collections,
    composite,
    curation,
    etl,
    joins,
    llm,
    projection,
    scalars,
    scalars2,
    sorts_setops,
    sql_surface,
    streaming,
    timeseries,
    udfs,
    windows,
)
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
