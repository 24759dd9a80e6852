"""Reference-parity pipeline behavior tests: roundtrip identity, dedup
under redelivery, the streaming consume variant, and connector gating."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.plans.pipeline import (
    run_reference_pipeline,
    run_reference_pipeline_streaming,
    to_customers_shape,
)
from etl_apache_kafka_python_doker_aws_spark.sources.connectors import ConnectorUnavailable, read_kafka_stream
from tests.conftest import SF_SMOKE


def test_roundtrip_identity(spark):
    """SURVEY.md §5.1: the export must equal the source-derived shape
    exactly (including double coercion through the JSON wire)."""
    customer = load_table(spark, SF_SMOKE, "customer")
    wd = tempfile.mkdtemp()
    res = run_reference_pipeline(spark, customer, wd)
    src = {tuple(r) for r in to_customers_shape(customer).collect()}
    out = {tuple(r) for r in res.exported.collect()}
    assert src == out


def test_redelivery_dedup(spark):
    customer = load_table(spark, SF_SMOKE, "customer")
    wd = tempfile.mkdtemp()
    res = run_reference_pipeline(spark, customer, wd, simulate_redelivery=True)
    assert res.processed.count() == customer.count()
    assert res.processed.select("id").distinct().count() == customer.count()


def test_pipeline_observed_metrics(spark):
    """df.observe metrics ride the stage writes — no extra pass — and
    must agree with independently computed counts/totals."""
    from pyspark.sql import functions as F

    customer = load_table(spark, SF_SMOKE, "customer")
    wd = tempfile.mkdtemp()
    res = run_reference_pipeline(spark, customer, wd)
    n = customer.count()
    assert res.metrics["produce"]["n_rows"] == n
    assert res.metrics["consume"]["n_rows"] == n
    expect_total = (
        to_customers_shape(customer)
        .agg(
            F.round(F.sum(F.col("savings_pesos").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("t")
        )
        .first()[0]
    )
    assert res.metrics["produce"]["total_pesos"] == expect_total


def test_streaming_consume_matches_batch(spark):
    customer = load_table(spark, SF_SMOKE, "customer").limit(100)
    wd = tempfile.mkdtemp()
    out = run_reference_pipeline_streaming(spark, customer, wd)
    src = {tuple(r) for r in to_customers_shape(customer).collect()}
    got = {tuple(r) for r in out.collect()}
    assert src == got


def test_kafka_connector_gated(spark):
    """Without the Kafka jar the connector must raise ConnectorUnavailable,
    not an opaque classpath error."""
    with pytest.raises((ConnectorUnavailable, Exception)):
        read_kafka_stream(spark, "localhost:9092", "bank_customers")


def test_spanish_variant_roundtrip(spark):
    """The DAG's Spanish clientes schema (nombre/apellido/.../caja_ahorro_*)
    round-trips the wire identically to the English variant."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    customer = load_table(spark, SF_SMOKE, "customer").limit(50)
    es = to_customers_shape(customer, variant="es")
    assert es.columns == [
        "id", "nombre", "apellido", "direccion",
        "telefono", "caja_ahorro_pesos", "caja_ahorro_dolares",
    ]
    wire = es.select(F.to_json(F.struct(*es.columns)).alias("value"))
    schema = T.StructType(
        [T.StructField(c, f.dataType) for c, f in zip(es.columns, es.schema.fields)]
    )
    parsed = wire.select(F.from_json("value", schema).alias("m")).select("m.*")
    assert {tuple(r) for r in es.collect()} == {tuple(r) for r in parsed.collect()}
    # spot-check the wire is the reference's message format (flat JSON obj)
    sample = json.loads(wire.first().value)
    assert set(sample) == set(es.columns)


def test_kafka_shaped_wire_stream(spark):
    """The file wire channel exposed with the Kafka source's column shape
    (key/value binary, topic, partition, offset, timestamp): consume code
    parses value exactly as it would from a real broker."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark.plans.pipeline import CUSTOMERS_WIRE_SCHEMA
    from etl_apache_kafka_python_doker_aws_spark.sources.connectors import (
        read_wire_stream_kafka_shaped,
        write_wire_json,
    )

    customer = load_table(spark, SF_SMOKE, "customer").limit(30)
    wd = tempfile.mkdtemp()
    wire = os.path.join(wd, "wire")
    write_wire_json(to_customers_shape(customer), wire)

    stream = read_wire_stream_kafka_shaped(spark, wire)
    assert [f.name for f in stream.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
    ]
    parsed = stream.select(
        F.from_json(F.col("value").cast("string"), CUSTOMERS_WIRE_SCHEMA).alias("m")
    ).select("m.*")
    q = (
        parsed.writeStream.format("memory").queryName("kshape")
        .option("checkpointLocation", os.path.join(wd, "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.id for r in spark.sql("SELECT id FROM kshape").collect()}
    assert got == {r.c_custkey for r in customer.collect()}


def test_cdc_apply_semantics(spark):
    """cdc_apply unit semantics: max-seq wins per key, deletes remove,
    inserts add, untouched base rows survive, duplicate log delivery is
    a no-op, and NULL change keys are rejected loudly."""
    import pytest as _pytest

    from etl_apache_kafka_python_doker_aws_spark.plans.merge import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    log = spark.createDataFrame(
        [
            (1, "a2", 1, "U"),
            (1, "a3", 2, "U"),     # later seq wins
            (2, "b", 5, "D"),      # delete
            (4, "d", 1, "I"),      # insert new key
        ],
        "k long, v string, seq long, op string",
    )
    want = {(1, "a3"), (3, "c"), (4, "d")}
    got = {(r.k, r.v) for r in cdc_apply(base, log, ["k"], "seq").collect()}
    assert got == want
    # replaying the log twice changes nothing
    twice = log.unionByName(log)
    got2 = {(r.k, r.v) for r in cdc_apply(base, twice, ["k"], "seq").collect()}
    assert got2 == want
    # a delete then a later re-insert resurrects the key
    log2 = log.unionByName(
        spark.createDataFrame([(2, "b9", 6, "I")], "k long, v string, seq long, op string")
    )
    got3 = {(r.k, r.v) for r in cdc_apply(base, log2, ["k"], "seq").collect()}
    assert got3 == want | {(2, "b9")}

    bad = spark.createDataFrame([(None, "x", 1, "U")], "k long, v string, seq long, op string")
    with _pytest.raises(Exception, match="cdc_apply"):
        cdc_apply(base, bad, ["k"], "seq").collect()


def test_cdc_apply_rejects_bad_ops_and_null_base_keys(spark):
    """Review r6 + ADVICE r6: an op outside I/U/D (or NULL) would
    silently act as a delete via NULL-propagating comparison, and
    NULL-key BASE rows would silently collapse in the window dedup —
    both must raise. The guards are LAZY raise_error expressions inside
    the one window pass (no eager validation scans), so the failure
    surfaces at action time, not construction."""
    import pytest as _pytest

    from etl_apache_kafka_python_doker_aws_spark.plans.merge import cdc_apply

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    bad_op = spark.createDataFrame(
        [(1, "x", 1, None)], "k long, v string, seq long, op string"
    )
    with _pytest.raises(Exception, match="I.+U.+D"):
        cdc_apply(base, bad_op, ["k"], "seq").collect()
    unknown_op = spark.createDataFrame(
        [(1, "x", 1, "UPSERT")], "k long, v string, seq long, op string"
    )
    with _pytest.raises(Exception, match="I.+U.+D"):
        cdc_apply(base, unknown_op, ["k"], "seq").collect()

    null_base = spark.createDataFrame([(None, "a"), (None, "b")], "k long, v string")
    ok_log = spark.createDataFrame(
        [(1, "x", 1, "I")], "k long, v string, seq long, op string"
    )
    with _pytest.raises(Exception, match="NULL"):
        cdc_apply(null_base, ok_log, ["k"], "seq").collect()
    # validate=False drops the guards entirely: no raise, and the two
    # NULL-key base rows silently collapse in the NULL window partition
    # (the exact hazard validate=True exists to catch) → 1 survivor + 1
    # inserted key
    assert cdc_apply(null_base, ok_log, ["k"], "seq", validate=False).count() == 2


def test_cdc_apply_is_pure_transform(spark):
    """ADVICE r6 #1: cdc_apply must run ZERO Spark jobs at construction
    — the validation rides the window pass instead of three eager
    probe scans. Pinned by diffing the app-status job count across the
    call."""
    from etl_apache_kafka_python_doker_aws_spark.plans.merge import cdc_apply

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    log = spark.createDataFrame(
        [(1, "a2", 1, "U")], "k long, v string, seq long, op string"
    )
    store = spark._jsparkSession.sparkContext().statusStore()
    before = store.jobsList(None).size()
    out = cdc_apply(base, log, ["k"], "seq")
    after = store.jobsList(None).size()
    assert after == before, f"cdc_apply ran {after - before} eager job(s)"
    # and the guard really is in the plan (not pruned away)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan
