"""Back-compat shim: the decimal money helpers moved to
``functions.money`` so the operators/ layer can use them without
depending on the query-registry layer (layering: functions < operators
< workloads). All existing ``workloads.money`` imports keep working."""

from etl_apache_kafka_python_doker_aws_spark.functions.money import (  # noqa: F401
    MONEY,
    OUT_PRECISION,
    RATE,
    money,
    money_sum,
    one_minus,
    one_plus,
    rate,
)
