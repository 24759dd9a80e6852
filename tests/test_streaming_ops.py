"""Streaming semantics tests that need crafted inputs: T7 late-data
dropping under a tight watermark, and append-mode window emission."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
    EVENTS_STREAM_SCHEMA,
    run_available_now,
    tumbling_counts,
)


def _write_batch(spark, path, rows, n):
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
        stage_ordered_batches,
    )

    df = spark.createDataFrame(rows, schema=EVENTS_STREAM_SCHEMA)
    # pinned-mtime staging (no sleeps): each call appends one file that
    # sorts after every existing one in the source's mtime order
    stage_ordered_batches([df], path)
    return df


def test_late_data_dropped_past_watermark(spark):
    """T7: with a 10-minute watermark, a row arriving 2 hours behind the
    max seen event time (in a later micro-batch) must be dropped from the
    windowed aggregate; an on-time row must be counted."""
    wd = tempfile.mkdtemp(prefix="late_")
    src = os.path.join(wd, "src")

    def ev(i, ts, typ="click"):
        return (i, ts, 1, typ, 1.0, "{}")

    import datetime as dt

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    # batch 0: events up to 14:00 → watermark for batch 1 becomes 13:50
    _write_batch(
        spark, src,
        [ev(1, base), ev(2, base + dt.timedelta(hours=1)), ev(3, base + dt.timedelta(hours=2))],
        1,
    )
    # batch 1: on-time row; at its end the [12:00,13:00) window (end 13:00
    # <= wm 13:50) is emitted with n=1 and its state evicted
    _write_batch(spark, src, [ev(5, base + dt.timedelta(hours=2, minutes=5))], 2)
    # batch 2: LATE row at 12:05 — its window is already evicted and below
    # the watermark → must be dropped (Spark guarantees the drop only once
    # the state is gone; a late row into live state may still be merged)
    _write_batch(spark, src, [ev(4, base + dt.timedelta(minutes=5))], 3)
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = tumbling_counts(stream, watermark_delay="10 minutes", keys=())
    result = run_available_now(agg, wd, f"late_{uuid.uuid4().hex[:8]}", output_mode="append")
    counts = {r.wstart.hour: r.n for r in result.collect()}
    # the 12:00 window was emitted before the late row arrived → n=1, and
    # no second/amended emission for hour 12 may appear
    assert counts.get(12) == 1, f"late row was not dropped: {counts}"


def test_append_mode_emits_closed_windows_only(spark):
    """Append mode emits a window only once the watermark passes its end —
    the final still-open window is withheld at availableNow termination."""
    wd = tempfile.mkdtemp(prefix="append_")
    src = os.path.join(wd, "src")
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [(i, base + dt.timedelta(hours=i), 1, "click", 1.0, "{}") for i in range(3)]
    _write_batch(spark, src, rows, 1)
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = tumbling_counts(stream, watermark_delay="10 minutes", keys=())
    result = run_available_now(agg, wd, f"append_{uuid.uuid4().hex[:8]}", output_mode="append")
    hours = sorted(r.wstart.hour for r in result.collect())
    # watermark ends at 13:50 → only the [12:00,13:00) window has end <= wm;
    # [13,14) and [14,15) are withheld as still-open
    assert hours == [12], f"expected only closed windows, got {hours}"


def test_late_drop_watermark_trails_one_batch(spark):
    """Pins the emission/eviction timing t2b/t4b's staging depends on:
    the late-record drop uses the watermark as of the PREVIOUS batch's
    start, so (a) a late row arriving in the same batch that emits its
    window is still MERGED into the result, while (b) the same row one
    batch later is dropped — even into a never-before-seen window."""
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, ts):
        return (i, ts, 1, "click", 1.0, "{}")

    def run(tag, batches):
        wd = tempfile.mkdtemp(prefix=tag)
        src = os.path.join(wd, "src")
        for n, rows in enumerate(batches):
            _write_batch(spark, src, rows, n)
        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        agg = tumbling_counts(stream, watermark_delay="10 minutes", keys=())
        res = run_available_now(agg, wd, f"{tag}_{uuid.uuid4().hex[:6]}",
                                output_mode="append")
        return {r.wstart.hour: r.n for r in res.collect()}

    on_time = [ev(1, base), ev(2, base + dt.timedelta(hours=1)),
               ev(3, base + dt.timedelta(hours=2))]
    late = [ev(9, base + dt.timedelta(minutes=5))]
    flush = [ev(5, base + dt.timedelta(hours=2, minutes=5))]
    # (a) late row in the emission batch: merged (hour 12 counts 2)
    assert run("wm_lag_a", [on_time, late]).get(12) == 2
    # (b) one batch later (flush row in between): dropped (hour 12 stays 1)
    assert run("wm_lag_b", [on_time, flush, late]).get(12) == 1


def test_checkpoint_recovery_resumes_not_restarts(spark):
    """Kill a streaming query after it has consumed some files, add more
    data, restart on the same checkpoint: the sink must contain every row
    exactly once (resume from offset log, not from scratch)."""
    import datetime as dt

    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import run_to_parquet

    wd = tempfile.mkdtemp(prefix="recover_")
    src = os.path.join(wd, "src")
    base = dt.datetime(2024, 6, 1)

    def rows(lo, hi):
        return [(i, base + dt.timedelta(minutes=i), 1, "click", float(i), "{}")
                for i in range(lo, hi)]

    _write_batch(spark, src, rows(0, 50), 1)
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    proj = stream.select("event_id", "value")
    # phase 1: consume the first file to completion, then "crash" (stop)
    run_to_parquet(proj, wd, "rec")
    # phase 2: new data arrives while down
    _write_batch(spark, src, rows(50, 80), 2)
    # phase 3: restart on the SAME checkpoint
    stream2 = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = run_to_parquet(stream2.select("event_id", "value"), wd, "rec")
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == list(range(80)), f"lost or duplicated rows: {len(got)}"


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark):
    """Stream-stream LEFT OUTER join: an unmatched left row is emitted
    with NULL right columns only once the watermark passes its join
    window (crafted two-batch input forces the watermark advance)."""
    import datetime as dt

    wd = tempfile.mkdtemp(prefix="sslo_")
    lsrc = os.path.join(wd, "l")
    rsrc = os.path.join(wd, "r")
    base = dt.datetime(2024, 6, 1, 12, 0, 0)

    def ev(i, ts, typ):
        return (i, ts, 1, typ, 1.0, "{}")

    # batch 0: left row at 12:00 with a matching right row, plus a left
    # row at 12:05 — outside the 1-minute join bound of any right row
    _write_batch(spark, lsrc, [ev(1, base, "purchase"),
                               ev(2, base + dt.timedelta(minutes=5), "purchase")], 1)
    _write_batch(spark, rsrc, [ev(100, base, "click")], 1)
    # batch 1: much-later rows push the watermark far past 12:01+10min
    _write_batch(spark, lsrc, [ev(3, base + dt.timedelta(hours=3), "purchase")], 2)
    _write_batch(spark, rsrc, [ev(200, base + dt.timedelta(hours=3), "click")], 2)

    left = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(lsrc)
        .selectExpr("event_id AS l_id", "user_id AS l_user", "ts AS l_ts")
        .withWatermark("l_ts", "10 minutes")
    )
    right = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1").parquet(rsrc)
        .selectExpr("event_id AS r_id", "user_id AS r_user", "ts AS r_ts")
        .withWatermark("r_ts", "10 minutes")
    )
    from pyspark.sql import functions as F

    joined = left.join(
        right,
        F.expr("l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL 1 MINUTE AND l_ts"),
        "leftOuter",
    ).select("l_id", "r_id")
    result = run_available_now(joined, wd, f"sslo_{uuid.uuid4().hex[:8]}", output_mode="append")
    got = {r.l_id: r.r_id for r in result.collect()}
    assert got.get(1) == 100          # matched pair
    assert 2 in got and got[2] is None  # unmatched left emitted with NULL


def test_transform_with_state_gate(spark, tmp_path):
    """T11 is environment-gated on google.protobuf: with it, run the real
    streaming query and check batch parity; without it, the operator must
    fail loud and clear (never silently degrade)."""
    import os

    import pytest

    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
        run_available_now,
        stage_events_stream,
        transform_with_state_user_totals,
    )

    try:
        import google.protobuf  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    wd = str(tmp_path)
    stream = stage_events_stream(spark, "/root/testdata/sf0.001", wd)
    if not has_protobuf:
        with pytest.raises(RuntimeError, match="protobuf"):
            transform_with_state_user_totals(stream)
        return
    out = run_available_now(
        transform_with_state_user_totals(stream), wd, "t11_twstest", output_mode="update"
    )
    from pyspark.sql import functions as F
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    batch = (
        spark.read.parquet(os.path.join(wd, "events_staged"))
        .groupBy("user_id").count()
    )
    mismatched = final.join(batch, "user_id").filter(F.col("n_events") != F.col("count"))
    assert mismatched.count() == 0


def test_two_phase_staging_pins_order_without_sleeps(spark):
    """VERDICT r5 #2: the t2b/t3b/t4b three-batch staging pins
    consumption order via explicit utime mtimes (stage_ordered_batches)
    — exactly three single-file batches, strictly increasing mtimes,
    batch 0 = the recent slice, batch 2 = the hours-late slice. No
    wall-clock sleeps are involved; order is exact on any filesystem."""
    import datetime as dt
    import glob
    import tempfile

    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
    from etl_apache_kafka_python_doker_aws_spark.workloads.streaming import (
        _stage_two_phase_events,
    )
    from tests.conftest import SF_SMOKE

    wd = tempfile.mkdtemp(prefix="stage_det_")
    staged = _stage_two_phase_events(spark, SF_SMOKE, wd)
    files = sorted(glob.glob(os.path.join(staged, "batch*.parquet")))
    assert len(files) == 3, files
    mts = [os.path.getmtime(f) for f in files]
    assert mts == sorted(mts) and len(set(mts)) == 3, mts

    mx = load_table(spark, SF_SMOKE, "events").agg(F.max("ts")).first()[0]
    cut = mx - dt.timedelta(hours=4)
    b0 = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(files[0])
    b2 = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(files[2])
    assert b0.filter(F.col("ts") < cut).count() == 0   # batch0: recent only
    assert b2.filter(F.col("ts") >= cut).count() == 0  # batch2: old only
