"""Reference-parity ETL queries — SURVEY.md §2.1/§2.10 (S*, D*). The
pipeline queries run the full produce→consume→upload dataflow (file-channel
wire) and return the final export; the oracle derives the same shape
directly — so the check covers projection, coercion, JSON round-trip,
dedup, and export fidelity in one go."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.plans.pipeline import (
    run_reference_pipeline,
    to_customers_shape,
)
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query

_CUSTOMERS_SHAPE_SQL = """
    SELECT c_custkey AS id,
           SPLIT_PART(c_name, '#', 1)           AS first_name,
           SPLIT_PART(c_name, '#', 2)           AS last_name,
           c_name || ' st.'                     AS address,
           '555-' || CAST(c_custkey AS VARCHAR) AS phone_number,
           c_acctbal                            AS savings_pesos,
           c_acctbal / 1000                     AS savings_dollars
    FROM customer
"""


@query("etl_reference_pipeline", oracle=_CUSTOMERS_SHAPE_SQL)
def etl_reference_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1-D4: the full reference dataflow (produce→JSON wire→consume with
    dedup→processed table→JSON export), file-channel wire. The returned
    DataFrame is the re-read EXPORT — matching the oracle proves roundtrip
    identity including the decimal→double coercion (SURVEY.md §5.2)."""
    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_etl_")
    customer = load_table(spark, sf_dir, "customer")
    result = run_reference_pipeline(spark, customer, wd)
    return result.exported


@query("etl_redelivery_dedup", oracle=_CUSTOMERS_SHAPE_SQL)
def etl_redelivery_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/T5: same pipeline under duplicate delivery (every wire message
    sent twice — the exact case that crashes the reference's consumer on
    its PRIMARY KEY, /root/reference/dags/etl_dags.py:37,47-48). The
    consume stage's dedup-by-key must restore exactly-once output."""
    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_etl_")
    customer = load_table(spark, sf_dir, "customer")
    result = run_reference_pipeline(spark, customer, wd, simulate_redelivery=True)
    return result.exported


@query(
    "s9_scan_roundtrip",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment, c_acctbal AS bal
    FROM customer
    """,
)
def s9_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/S9: parquet scan → CSV write/read → JSON write/read round-trip
    (explicit schemas, never inferred). Matching the oracle proves both
    text formats preserve longs, strings, and shortest-repr doubles."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_scan_")
    shaped = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("bal"),
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("segment", T.StringType()),
            T.StructField("bal", T.DoubleType()),
        ]
    )
    csv_path = os.path.join(wd, "csv")
    json_path = os.path.join(wd, "json")
    shaped.write.mode("overwrite").option("header", "true").csv(csv_path)
    via_csv = spark.read.schema(schema).option("header", "true").csv(csv_path)
    via_csv.write.mode("overwrite").json(json_path)
    return spark.read.schema(schema).json(json_path)


@query(
    "s7_synthetic_source",
    oracle="""
    SELECT CAST(2000 AS BIGINT) AS n_rows,
           TRUE AS id_range_exact,
           TRUE AS names_in_pool,
           TRUE AS balances_in_range,
           TRUE AS partition_invariant
    """,
)
def s7_synthetic_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: the reference's Faker generator (/root/reference/data_full.py:16-31)
    as a PARALLEL Spark Python DataSource — the row range splits into input
    partitions, each executor generates its slice, and per-row seeded RNG
    makes the dataset identical under any partitioning (sources/pysource.py).
    Driver contract: exact row count, ids forming exactly [0, rows), last
    names drawn from the declared pool, balances within the generator's
    [0, 100000] range, and — the property that matters at 100 TB — full
    PARTITION INVARIANCE: reading the same source with 8 vs 3 partitions
    yields row-for-row identical data (checked by a distributed join, no
    collect)."""
    from etl_apache_kafka_python_doker_aws_spark.sources.pysource import _LAST, register

    register(spark)

    def gen(partitions: int) -> DataFrame:
        return (
            spark.read.format("synthetic_customers")
            .option("rows", 2000)
            .option("partitions", partitions)
            .load()
        )

    g8, g3 = gen(8), gen(3)
    both = g8.alias("a").join(g3.alias("b"), F.col("a.id") == F.col("b.id"), "full")
    same_row = (
        (F.col("a.nombre") == F.col("b.nombre"))
        & (F.col("a.apellido") == F.col("b.apellido"))
        & (F.col("a.direccion") == F.col("b.direccion"))
        & (F.col("a.telefono") == F.col("b.telefono"))
        & (F.col("a.caja_ahorro_pesos") == F.col("b.caja_ahorro_pesos"))
        & (F.col("a.caja_ahorro_dolares") == F.col("b.caja_ahorro_dolares"))
    )
    return both.agg(
        F.count("*").alias("n_rows"),
        (
            (F.min("a.id") == 0)
            & (F.max("a.id") == 1999)
            & (F.countDistinct("a.id") == 2000)
        ).alias("id_range_exact"),
        (
            F.sum((~F.col("a.apellido").isin(list(_LAST))).cast("long")) == 0
        ).alias("names_in_pool"),
        (
            (F.min("a.caja_ahorro_pesos") >= 0)
            & (F.max("a.caja_ahorro_pesos") <= 100000)
            & (F.min("a.caja_ahorro_dolares") >= 0)
            & (F.max("a.caja_ahorro_dolares") <= 100000)
        ).alias("balances_in_range"),
        # a row missing on either side makes same_row NULL — count that as
        # a mismatch, not a skip (coalesce to FALSE before negating)
        (F.sum((~F.coalesce(same_row, F.lit(False))).cast("long")) == 0).alias(
            "partition_invariant"
        ),
    )


@query(
    "d5_scd2_asof_read",
    oracle="""
    SELECT c_custkey,
           CAST(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000
                     ELSE c_acctbal END AS DOUBLE) AS bal,
           CAST(CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '2024-06-01'
                     ELSE TIMESTAMP '2024-01-01' END AS TIMESTAMP) AS valid_from
    FROM customer
    """,
)
def d5_scd2_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: TIME-TRAVEL read over an SCD2-versioned dimension
    (plans/merge.scd2_apply) — "the table as of T". Three deterministic
    version waves build the history (initial load at 2024-01-01, +1000
    to every 10th key at 2024-06-01, +2000 to every 20th key at
    2024-09-01), then the as-of-2024-07-01 snapshot selects exactly one
    version per key via the interval predicate
    valid_from <= T < coalesce(valid_to, inf). The oracle reconstructs
    that snapshot from base data: 10th keys show the June value and
    June valid_from, everyone else the initial load — so both the SCD2
    close-out bookkeeping AND the as-of predicate are value-checked.
    At 100 TB this is the query pattern dimension history exists for
    (reproducing any past training snapshot without copying the table)."""
    from etl_apache_kafka_python_doker_aws_spark.plans.merge import scd2_apply

    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_scd2_")
    path = os.path.join(wd, "dim_customer")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal")
    )

    def wave(df: DataFrame, ts: str) -> None:
        # NTZ wall-times: version boundaries are calendar facts, not
        # instants — LTZ would store UTC-adjusted values and shift the
        # rendered history under a non-UTC driver session (TZ probe r5)
        scd2_apply(
            spark, path, df.withColumn("ts", F.lit(ts).cast("timestamp_ntz")),
            ["c_custkey"], "ts",
        )

    wave(c, "2024-01-01")
    wave(
        c.filter(F.pmod("c_custkey", F.lit(10)) == 0).withColumn(
            "bal", F.col("bal") + 1000
        ),
        "2024-06-01",
    )
    wave(
        c.filter(F.pmod("c_custkey", F.lit(20)) == 0).withColumn(
            "bal", F.col("bal") + 2000
        ),
        "2024-09-01",
    )
    dim = spark.read.parquet(path)
    t = F.lit("2024-07-01").cast("timestamp_ntz")
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("c_custkey", "bal", "valid_from")


@query(
    "s11_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS total_price
    FROM orders WHERE o_orderkey <= 500
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice AS total_price
    FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000
    """,
)
def s11_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: schema-evolution scan — two parquet batches written with
    DIFFERENT schemas (batch 1 lacks the later-added total_price column)
    read back as one table with ``mergeSchema=true``: old rows surface
    NULL for the new column, new rows keep their values, nothing is
    dropped or misaligned. This is the drift case every long-lived
    100 TB table hits (new columns land mid-stream; historical
    partitions never get rewritten); the oracle reconstructs the merged
    union exactly. mergeSchema is opt-in per read because it
    footer-scans every file — at scale you pin the merged schema in a
    catalog instead, but the scan semantics verified here are what the
    catalog encodes."""
    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_evo_")
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") <= 500).select("o_orderkey", "o_orderstatus")
    v2 = (
        o.filter((F.col("o_orderkey") > 500) & (F.col("o_orderkey") <= 1000))
        .select("o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("total_price"))
    )
    v1.write.mode("overwrite").parquet(os.path.join(wd, "evolving", "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(wd, "evolving", "batch=2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(wd, "evolving"))
    )
    return merged.select("o_orderkey", "o_orderstatus", "total_price")


@query(
    "s10_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def s10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: ORC format round-trip — the second columnar format Spark
    bundles natively (predicate pushdown + column pruning work the same
    as parquet; Avro would need the external spark-avro package, so ORC
    is the in-container cross-format check). Write a slice as ORC, read
    it back; the re-read must equal the source rows exactly."""
    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_orc_")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    path = os.path.join(wd, "orders_orc")
    o.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "d6_incremental_agg",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_spend
    FROM orders
    GROUP BY o_custkey
    """,
)
def d6_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: incremental materialized-aggregate maintenance. Yesterday's
    per-customer order aggregate (orders with o_orderkey % 4 != 0) is
    materialized to parquet as PARTIAL aggregates — count plus an EXACT
    decimal sum, the house money style (functions/money.py) so the state
    is mergeable without order-dependence — then today's delta batch
    (o_orderkey % 4 = 0) is partial-aggregated and MERGED with the state
    (union of partials → sum-of-sums), touching only state + delta, never
    rescanning history. The oracle is the full recompute over all orders:
    equality proves the maintenance is lossless. At 100 TB this is the
    difference between re-aggregating the corpus nightly and shuffling
    one day's delta against a keyed state table (both sides partial-agg
    map-side before the merge shuffle)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.money import money

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", money("o_totalprice").alias("_price_dec")
    )
    history = o.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) != 0)
    delta = o.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) == 0)

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("_n_partial"),
            F.sum("_price_dec").alias("_sum_partial"),
        )

    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_state_")
    state_path = os.path.join(wd, "agg_state")
    partials(history).write.mode("overwrite").parquet(state_path)
    state = spark.read.parquet(state_path)

    return (
        state.unionByName(partials(delta))
        .groupBy("o_custkey")
        .agg(
            F.sum("_n_partial").alias("n_orders"),
            F.round(F.sum("_sum_partial"), 2).cast("double").alias("total_spend"),
        )
    )


@query(
    "d7_data_quality",
    oracle="""
    SELECT 0 AS check_id, 'pk_nulls' AS check_name,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT)
               AS metric,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) = 0 AS ok
    UNION ALL
    SELECT 1, 'pk_duplicates',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT),
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) = 0
    UNION ALL
    SELECT 2, 'fk_orphans',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) = 0
    UNION ALL
    SELECT 3, 'price_negative',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) AS BIGINT),
           (SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) = 0
    UNION ALL
    SELECT 4, 'date_in_range',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderdate < TIMESTAMP '1990-01-01'
                    OR o_orderdate > TIMESTAMP '2000-01-01') AS BIGINT),
           (SELECT COUNT(*) FROM orders
            WHERE o_orderdate < TIMESTAMP '1990-01-01'
               OR o_orderdate > TIMESTAMP '2000-01-01') = 0
    """,
)
def d7_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: data-quality expectations suite — the validation gate a
    production pipeline runs before publishing a table (null/duplicate
    primary keys, referential integrity, range and freshness checks),
    emitted as one row per check with the violation count and a pass
    boolean. All five checks share ONE pass over orders (conditional
    aggregates) plus a single left-anti join for the FK check — not one
    job per rule; at 100 TB the whole suite costs one scan + one
    shuffle. The oracle recomputes every metric independently in SQL."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    orphans = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count("*").alias("m2")
    )
    lo, hi = F.lit("1990-01-01").cast("timestamp_ntz"), F.lit(
        "2000-01-01"
    ).cast("timestamp_ntz")
    base = o.agg(
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("m0"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("m1"),
        F.sum((F.col("o_totalprice") < 0).cast("long")).alias("m3"),
        F.sum(
            ((F.col("o_orderdate") < lo) | (F.col("o_orderdate") > hi)).cast("long")
        ).alias("m4"),
    )
    names = ["pk_nulls", "pk_duplicates", "fk_orphans", "price_negative", "date_in_range"]
    metrics = base.crossJoin(F.broadcast(orphans))
    checks = F.array(
        *[
            F.struct(
                F.lit(i).alias("check_id"),
                F.lit(names[i]).alias("check_name"),
                F.col(f"m{i}").cast("long").alias("metric"),
                (F.col(f"m{i}") == 0).alias("ok"),
            )
            for i in range(5)
        ]
    )
    return metrics.select(F.explode(checks).alias("_c")).select("_c.*")


@query(
    "d8_snapshot_read",
    oracle="""
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
    FROM orders
    """,
)
def d8_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: snapshot isolation / time travel over an append-only table,
    lakehouse-style: each commit appends immutable parquet files and
    writes a MANIFEST (the explicit file list) — reading a snapshot
    means scanning exactly the files its manifest names, so an old
    version stays readable (and bit-stable) after later appends without
    copying data. Here commit 1 writes ~2/3 of orders, commit 2 appends
    the rest into the SAME directory; the query reads snapshot 1 via
    its manifest (ignoring the newer files physically present) and
    snapshot 2 via its own, and returns per-version aggregate state.
    The oracle recomputes both versions from base data — matching
    proves the manifest isolates the snapshot. At 100 TB manifests are
    the only metadata read before pruning; file listing never walks the
    directory."""
    import json as _json

    from etl_apache_kafka_python_doker_aws_spark.functions.money import money

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_snap_")
    data_dir = os.path.join(wd, "data")

    def _commit(df: DataFrame, version: int, prev_files: list[str]) -> list[str]:
        df.write.mode("append").parquet(data_dir)
        files = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        new_snapshot = files  # append-only: superset of prev_files
        with open(os.path.join(wd, f"manifest-v{version}.json"), "w") as fh:
            _json.dump({"version": version, "files": new_snapshot}, fh)
        assert set(prev_files) <= set(new_snapshot)
        return new_snapshot

    v1_files = _commit(o.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) != 0), 1, [])
    _commit(o.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 0), 2, v1_files)

    def _read_snapshot(version: int) -> DataFrame:
        with open(os.path.join(wd, f"manifest-v{version}.json")) as fh:
            manifest = _json.load(fh)
        snap = spark.read.parquet(*manifest["files"])
        return snap.agg(
            F.lit(version).cast("long").alias("version"),
            F.count("*").alias("n_orders"),
            F.round(F.sum(money("o_totalprice")), 2)
            .cast("double")
            .alias("total_price"),
        )

    return _read_snapshot(1).unionByName(_read_snapshot(2))


@query(
    "d9_cdc_apply",
    oracle="""
    WITH final AS (
      SELECT * REPLACE (CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 100
                             ELSE c_acctbal END AS c_acctbal)
      FROM customer WHERE c_custkey % 10 <> 7
      UNION ALL
      SELECT * REPLACE (c_custkey + 1000000000 AS c_custkey)
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_bal
    FROM final GROUP BY c_nationkey
    """,
)
def d9_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9: CDC op-log replay (plans/merge.cdc_apply) — a deterministic
    Debezium-shaped change log against the customer snapshot: updates
    (+100 acctbal on custkey%10==3, seq 2), deletes (custkey%10==7,
    seq 3), inserts (keys shifted by 1e9 — far above any plausible TPC-H
    custkey, so an insert can never collide with an existing key and
    silently diverge from the closed-form oracle; review r6 — for
    custkey%10==0, seq 1) — and
    the ENTIRE log is delivered TWICE (at-least-once redelivery, the
    reference consumer's crash case) to prove replay idempotence:
    max-seq-wins absorbs duplicates. The oracle computes the equivalent
    closed-form final state; output is the per-nation aggregate of the
    applied snapshot (money discipline: decimal sum, DOUBLE out)."""
    from etl_apache_kafka_python_doker_aws_spark.plans.merge import cdc_apply
    from etl_apache_kafka_python_doker_aws_spark.workloads.money import money, money_sum

    c = load_table(spark, sf_dir, "customer")
    upd = (
        c.filter(F.col("c_custkey") % 10 == 3)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100)
        .withColumn("seq", F.lit(2).cast("long"))
        .withColumn("op", F.lit("U"))
    )
    dels = (
        c.filter(F.col("c_custkey") % 10 == 7)
        .withColumn("seq", F.lit(3).cast("long"))
        .withColumn("op", F.lit("D"))
    )
    ins = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 1_000_000_000)
        .withColumn("seq", F.lit(1).cast("long"))
        .withColumn("op", F.lit("I"))
    )
    log = upd.unionByName(dels).unionByName(ins)
    log = log.unionByName(log)  # at-least-once: full duplicate delivery
    final = cdc_apply(c, log, ["c_custkey"], "seq", "op")
    return final.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        money_sum(money("c_acctbal"), "total_bal"),
    )


@query(
    "s7b_synthetic_stream",
    oracle="""
    SELECT CAST(1000 AS BIGINT) AS n_rows,
           TRUE AS id_range_exact,
           TRUE AS multi_batch,
           TRUE AS replay_equals_batch
    """,
)
def s7b_synthetic_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7b: the synthetic generator as a STREAMING Python data source
    (Spark 4 SimpleDataSourceStreamReader, sources/pysource.py) — row-
    count offsets, 300-row micro-batches, checkpointed memory sink.
    Driver contract: exactly 1000 rows with ids forming [0,1000) (no
    batch lost, none duplicated across the offset/commit path), the run
    took MULTIPLE micro-batches (the availableNow wrapper would stop
    after one prefetched batch — run_until_rows drives the real
    multi-batch path), and every streamed row equals the BATCH reader's
    row for the same seed (per-row seeded RNG ⇒ stream/batch/replay all
    produce identical data — the exactly-once replay property)."""
    import tempfile
    import uuid

    from etl_apache_kafka_python_doker_aws_spark.sources.pysource import register
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import run_until_rows

    register(spark)
    stream = (
        spark.readStream.format("synthetic_customers")
        .option("rows", 1000).option("batchrows", 300).option("seed", 7)
        .load()
    )
    out, n_batches = run_until_rows(
        stream, tempfile.mkdtemp(prefix="s7b_"), f"s7b_{uuid.uuid4().hex[:8]}", 1000
    )
    batch = (
        spark.read.format("synthetic_customers")
        .option("rows", 1000).option("partitions", 4).option("seed", 7)
        .load()
    )
    payload = [c for c in batch.columns if c != "id"]
    same_row = None
    for c in payload:
        eq = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        same_row = eq if same_row is None else (same_row & eq)
    # ONE full-outer join yields both legs (review r6): pairing = no
    # orphan on either side; equality applies only to paired rows
    # (unpaired rows already fail the pairing leg).
    paired = F.col("a.id").isNotNull() & F.col("b.id").isNotNull()
    replay = (
        out.alias("a")
        .join(batch.alias("b"), F.col("a.id") == F.col("b.id"), "full")
        .agg(
            F.min(
                (paired & F.coalesce(same_row, F.lit(False))).cast("int")
            ).alias("_ok")
        )
        .select((F.col("_ok") == 1).alias("replay_equals_batch"))
    )
    checks = out.agg(
        F.count("*").alias("n_rows"),
        (
            (F.min("id") == 0)
            & (F.max("id") == 999)
            & (F.countDistinct("id") == 1000)
        ).alias("id_range_exact"),
    )
    return checks.crossJoin(F.broadcast(replay)).select(
        "n_rows",
        "id_range_exact",
        F.lit(bool(n_batches > 1)).alias("multi_batch"),
        "replay_equals_batch",
    )


@query(
    "s12_xml_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    """,
)
def s12_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: XML round-trip via the NATIVE Spark 4 XML source (built in
    since 4.0 — no spark-xml package needed): write the nation table as
    row-tagged XML, read it back with an EXPLICIT schema (inference
    would widen ints and reorder fields), re-emit the original columns.
    The re-read must equal the source rows exactly."""
    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_xml_")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = os.path.join(wd, "nation_xml")
    (
        n.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(path)
    )
    return (
        spark.read.format("xml")
        .schema(n.schema)
        .option("rowTag", "nation")
        .load(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "s13_binary_file_source",
    oracle="""
    SELECT CAST(f.i AS BIGINT) AS file_id,
           CAST(f.i % 50 + 10 AS BIGINT) AS length,
           TRUE AS content_ok
    FROM (SELECT UNNEST(GENERATE_SERIES(0, 99)) AS i) f
    """,
)
def s13_binary_file_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: the ``binaryFile`` source — how raw image/audio/document
    blobs enter a multimodal pipeline as (path, mtime, length, content)
    rows (the L5 decode tier consumes exactly this shape). 100 files
    are written EXECUTOR-SIDE (foreachPartition over a 100-row range —
    no driver loop; NB the target dir must live on storage every
    executor AND the driver can reach — true in local mode and for any
    real deployment's shared object store/NFS, which is where blob
    fixtures live anyway) with id-derived content: length = id%50+10, byte j
    = (id + j) % 256. The re-scan extracts the id from the filename and
    verifies length (exact, SQL-computable) and full content
    (engine-side byte check folded to a boolean)."""
    wd = tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_bin_")

    def write_files(rows):
        for r in rows:
            i = r.id
            payload = bytes((i + j) % 256 for j in range(i % 50 + 10))
            with open(os.path.join(wd, f"blob_{i:04d}.bin"), "wb") as fh:
                fh.write(payload)

    spark.range(100).repartition(8).foreachPartition(write_files)
    bf = spark.read.format("binaryFile").load(wd)
    fid = F.regexp_extract(F.col("path"), r"blob_(\d+)\.bin", 1).cast("long")
    # Byte-exact content check without any Python row path: rebuild the
    # expected payload's HEX rendering as a JVM expression (per-byte
    # conv+lpad over a sequence) and compare against hex(content) —
    # positional indexing into a BINARY column is not otherwise
    # expressible in pure SQL functions.
    hex_expr = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.col("length").cast("int") - 1),
            lambda j: F.lpad(
                F.conv(((fid + j) % 256).cast("string"), 10, 16), 2, "0"
            ),
        ),
    )
    content_matches = F.lower(F.hex(F.col("content"))) == F.lower(hex_expr)
    return bf.select(
        fid.alias("file_id"),
        F.col("length"),
        content_matches.alias("content_ok"),
    )
