#!/usr/bin/env python
"""End-to-end verification of the environment-gated connectors (S1-S4)
against REAL services — run outside the CI sandbox with
docker-compose.integration.yml up (see that file for the exact
spark-submit line; the Kafka and MySQL driver jars come from
--packages).

Drives the SAME functions the gated unit tests import — no special
code paths — through the reference deployment's topology
(MySQL -> Kafka -> MySQL, reference dags/etl_dags.py produce/consume
loop):

  1. generate 2,000 synthetic customers (S7 Python DataSource)
  2. write_jdbc into MySQL with key dedup (S4)
  3. read_jdbc back as 8 partitioned range slices (S1) — row count and
     per-column equality must round-trip
  4. write_kafka: one JSON message per row, the reference wire
     format (S3)
  5. read_kafka_stream + availableNow into memory (S2) — parsed rows
     must equal the JDBC table exactly
  6. write_json_export to a REAL s3a:// bucket (S5, MinIO from the
     compose file) and re-read — requires hadoop-aws on --packages;
     skipped with a notice when INTEGRATION_S3_ENDPOINT is unset

Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.sources.connectors import (
    read_jdbc,
    read_kafka_stream,
    write_jdbc,
    write_kafka,
)
from etl_apache_kafka_python_doker_aws_spark.sources.pysource import register

# No default: the S3 leg is opt-in (set to http://localhost:9000 for the
# compose file's MinIO) so a run without MinIO skips with a clear notice
# instead of folding a connection failure into a misleading jar hint.
S3_ENDPOINT = os.environ.get("INTEGRATION_S3_ENDPOINT", "")
MYSQL_URL = os.environ.get(
    "INTEGRATION_MYSQL_URL",
    "jdbc:mysql://localhost:3306/banco_clientes?user=etl&password=etl",
)
KAFKA_BOOTSTRAP = os.environ.get("INTEGRATION_KAFKA_BOOTSTRAP", "localhost:9092")
TOPIC = "clientes_integration"
TABLE = "clientes_integration"
N_ROWS = 2000


def main() -> int:
    spark = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[8]"))
        .appName("connector-integration")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    register(spark)

    gen = (
        spark.read.format("synthetic_customers")
        .option("rows", N_ROWS)
        .option("partitions", 8)
        .load()
    )

    # S4: batched keyed sink (duplicate the frame first — the dedup must
    # restore exactly-once counts, the reference's crash case)
    doubled = gen.unionByName(gen)
    write_jdbc(doubled, MYSQL_URL, TABLE, key_cols=["id"])

    # S1: partitioned range scan back
    back = read_jdbc(
        spark, MYSQL_URL, TABLE,
        partition_column="id", num_partitions=8,
        lower_bound=0, upper_bound=N_ROWS,
    )
    assert back.rdd.getNumPartitions() == 8, "JDBC read did not partition"
    n = back.count()
    assert n == N_ROWS, f"JDBC round-trip lost rows: {n} != {N_ROWS}"
    diff = gen.exceptAll(back.select(*gen.columns)).count()
    assert diff == 0, f"JDBC round-trip changed {diff} rows"

    # S3: produce the reference wire format
    write_kafka(back, KAFKA_BOOTSTRAP, TOPIC)

    # S2: consume to completion and parse the wire JSON
    stream = read_kafka_stream(spark, KAFKA_BOOTSTRAP, TOPIC)
    parsed = stream.select(
        F.from_json(F.col("value").cast("string"), gen.schema).alias("r")
    ).select("r.*")
    q = (
        parsed.writeStream.format("memory")
        .queryName("kafka_roundtrip")
        # fresh checkpoint per run: a fixed path would resume committed
        # offsets from a previous/crashed run and skew the row counts
        .option("checkpointLocation", tempfile.mkdtemp(prefix="integration_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM kafka_roundtrip")
    assert got.count() == N_ROWS, "Kafka round-trip row count mismatch"
    assert gen.exceptAll(got.select(*gen.columns)).count() == 0

    # S5: real s3a:// export against MinIO (needs hadoop-aws on the
    # classpath; the compose file provisions the endpoint + credentials)
    s3_ok = "skipped (no INTEGRATION_S3_ENDPOINT)"
    if S3_ENDPOINT:
        from etl_apache_kafka_python_doker_aws_spark.sources.connectors import write_json_export

        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        hconf.set("fs.s3a.endpoint", S3_ENDPOINT)
        hconf.set("fs.s3a.access.key", os.environ.get("INTEGRATION_S3_KEY", "etl"))
        hconf.set("fs.s3a.secret.key", os.environ.get("INTEGRATION_S3_SECRET", "etletletl"))
        hconf.set("fs.s3a.path.style.access", "true")
        hconf.set("fs.s3a.connection.ssl.enabled", "false")
        try:
            spark._jvm.org.apache.hadoop.fs.FileSystem.get(
                spark._jvm.java.net.URI("s3a://etl-output/"), hconf
            ).mkdirs(spark._jvm.org.apache.hadoop.fs.Path("s3a://etl-output/"))
            dest = "s3a://etl-output/etl_output_json"
            write_json_export(back, dest, single_file=True)
            re_read = spark.read.schema(gen.schema).json(dest)
            assert re_read.count() == N_ROWS, "s3a export row count mismatch"
            assert gen.exceptAll(re_read.select(*gen.columns)).count() == 0
            s3_ok = "verified"
        except Exception as exc:  # hadoop-aws jar absent → actionable notice
            s3_ok = f"skipped ({type(exc).__name__}: add hadoop-aws to --packages)"

    print(
        "integration round-trip OK: S1/S2/S3/S4 verified against live "
        f"services; S5 s3a export {s3_ok}"
    )
    return 0


if __name__ == "__main__":
    from etl_apache_kafka_python_doker_aws_spark.sources.connectors import ConnectorUnavailable

    try:
        raise SystemExit(main())
    except ConnectorUnavailable as exc:
        print(
            "integration round-trip NOT run: connector unavailable "
            f"({exc}).\nStart the services and include the driver jars:\n"
            "  docker compose -f docker-compose.integration.yml up -d\n"
            "  spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0,"
            "com.mysql:mysql-connector-j:8.4.0,org.apache.hadoop:hadoop-aws:3.4.0 "
            "examples/integration_roundtrip.py"
        )
        raise SystemExit(2)
