"""Streaming queries — SURVEY.md §2.8 (T1-T10), each executed as a REAL
Structured Streaming query (file source → watermark/window/state →
checkpointed sink, availableNow trigger) and compared to a batch-SQL
oracle. This is the strongest available check for streaming ops: the
streaming result must equal the batch semantics on the same data.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
    EVENTS_STREAM_SCHEMA,
    run_available_now,
    session_counts,
    stream_state_partitions,
    sliding_counts,
    stage_events_stream,
    stateful_user_totals,
    stream_dedup,
    tumbling_counts,
)
from etl_apache_kafka_python_doker_aws_spark.functions.money import money, money_sum
from etl_apache_kafka_python_doker_aws_spark.workloads.registry import query


def _workdir() -> str:
    return tempfile.mkdtemp(prefix="etl_apache_kafka_python_doker_aws_spark_stream_")


def _qname(base: str) -> str:
    return f"{base}_{uuid.uuid4().hex[:8]}"


@query(
    "t2_tumbling_window",
    scale_form="parity",
    oracle="""
    SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS wstart,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2: watermarked tumbling-window agg, run as a real streaming
    query (file source, availableNow, checkpoint) — result must equal the
    batch date_trunc aggregation. Batch-parity runs use complete mode + a
    generous watermark (append mode withholds the final still-open window
    and the file source replays partitions in arbitrary ts order);
    tight-watermark late-data DROPPING (T7) is exercised in
    tests/test_streaming_ops.py with a crafted late row."""
    wd = _workdir()
    stream = stage_events_stream(spark, sf_dir, wd)
    return run_available_now(
        tumbling_counts(stream, watermark_delay="3650 days"),
        wd, _qname("t2"), output_mode="complete",
        state_partitions=stream_state_partitions(
            spark, [f"{sf_dir}/events.parquet"]
        ),
    )


#: One staged three-file layout per (app, sf_dir, late_hours) — shared by
#: the t2b/t3b/t4b append-mode queries (checkpoints stay per-query).
_STAGED_TWO_PHASE: dict[tuple[str, str, int], str] = {}


def _stage_two_phase_events(spark: SparkSession, sf_dir: str, wd: str,
                            late_hours: int = 4) -> str:
    """Stage the events fixture as THREE parquet files with controlled
    arrival order (older mtime = consumed first; mtimes are PINNED
    explicitly by stage_ordered_batches — zero sleeps, deterministic on
    any filesystem — and maxFilesPerTrigger=1 pins one file per
    micro-batch):

      batch 0 — the RECENT slice (ts >= max_ts - late_hours): advances
        the watermark to max_ts - delay at its commit.
      batch 1 — a FLUSH row: a duplicate of the max-ts row(s). It lands
        in the still-open final window (never emitted → invisible in the
        output) and exists only to push the batch schedule forward: at
        this batch's commit the closed recent windows are emitted and
        evicted.
      batch 2 — everything older. Empirically (pinned in
        tests/test_streaming_ops.py) Spark's late-record drop uses the
        watermark as of the PREVIOUS batch's start — it trails emission
        by one batch, so a late row arriving in the same batch that
        emits its window is still merged. By batch 2 the trailing
        watermark stands at max_ts - delay, hours past every old row's
        window end, so the whole slice is provably dropped.

    The cutoff is computed with a broadcast max join — no driver-side
    collect. The staged layout is cached per (session, sf_dir): t2b, t3b
    and t4b stage the IDENTICAL three files, so re-staging per query
    would triple the scan+agg jobs (review r5)."""
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
        stage_ordered_batches,
    )

    cache_key = (spark.sparkContext.applicationId, sf_dir, late_hours)
    cached = _STAGED_TWO_PHASE.get(cache_key)
    if cached is not None and os.path.exists(cached):
        return cached
    staged = os.path.join(wd, "events_two_phase")
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("_max_ts"))
    with_cut = ev.crossJoin(F.broadcast(mx)).withColumn(
        "_cut", F.col("_max_ts") - F.expr(f"INTERVAL {late_hours} HOURS")
    )
    recent = with_cut.filter(F.col("ts") >= F.col("_cut")).drop("_max_ts", "_cut")
    flush = with_cut.filter(F.col("ts") == F.col("_max_ts")).drop("_max_ts", "_cut")
    late = with_cut.filter(F.col("ts") < F.col("_cut")).drop("_max_ts", "_cut")
    stage_ordered_batches([recent, flush, late], staged)
    _STAGED_TWO_PHASE[cache_key] = staged
    return staged


def _two_phase_stream(spark: SparkSession, staged: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )


@query(
    "t2b_tumbling_append",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM events)
    SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS wstart,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events, mx
    WHERE CAST(ts AS TIMESTAMP) >= m - INTERVAL 4 HOUR
      AND DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
            <= m - INTERVAL 10 MINUTE
    GROUP BY 1, 2
    """,
)
def t2b_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2b (scale-safe form of t2, VERDICT r4 "What's wrong" #1): tumbling
    window aggregate in APPEND mode with a TIGHT 10-minute watermark —
    the shape you would actually ship at 100 TB, where complete mode's
    forever-retained state is not an option. The input arrives in three
    micro-batches (recent 4 hours → flush row → everything older; see
    _stage_two_phase_events for why the drop needs the trailing
    watermark to advance, i.e. one batch more than naive staging). Every
    old-slice row arrives hours past the trailing watermark and is
    DROPPED; append emits exactly the windows whose end <= final
    watermark. The oracle computes that surviving set exactly:
    recent-slice rows only, windows closed by max_ts - 10 min —
    late-data exclusion is provable, not fixture luck."""
    wd = _workdir()
    staged = _stage_two_phase_events(spark, sf_dir, wd)
    agg = tumbling_counts(_two_phase_stream(spark, staged), watermark_delay="10 minutes")
    # r15: state partitions derived from the staged bytes (guide §2.2 —
    # the state exchange is pinned at checkpoint creation, AQE cannot
    # coalesce it; see streaming.ops.stream_state_partitions)
    return run_available_now(
        agg, wd, _qname("t2b"), output_mode="append",
        state_partitions=stream_state_partitions(spark, [staged]),
    )


@query(
    "t3b_sliding_append",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM events),
    starts AS (
      SELECT UNNEST([DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)),
                     DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS wstart
      FROM events, mx WHERE CAST(ts AS TIMESTAMP) >= m - INTERVAL 4 HOUR
    )
    -- mx re-joined here: carrying m through the UNNEST select trips a
    -- DuckDB binder internal error
    SELECT wstart, CAST(COUNT(*) AS BIGINT) AS n
    FROM starts, mx
    WHERE wstart + INTERVAL 2 HOUR <= m - INTERVAL 10 MINUTE
    GROUP BY wstart
    """,
)
def t3b_sliding_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3b (scale-safe form of t3): 2h windows sliding by 1h in APPEND
    mode with a tight 10-minute watermark, same three-batch arrival as
    t2b. Each recent event lands in two windows; a window is emitted
    once the watermark passes its END (wstart + 2h), so the oracle
    unnests both window starts per recent-slice event and keeps windows
    closed by max_ts - 10 min; the hours-late batch is provably dropped
    against the trailing watermark."""
    wd = _workdir()
    staged = _stage_two_phase_events(spark, sf_dir, wd)
    agg = sliding_counts(_two_phase_stream(spark, staged), watermark_delay="10 minutes")
    # r15: state partitions derived from the staged bytes (guide §2.2 —
    # the state exchange is pinned at checkpoint creation, AQE cannot
    # coalesce it; see streaming.ops.stream_state_partitions)
    return run_available_now(
        agg, wd, _qname("t3b"), output_mode="append",
        state_partitions=stream_state_partitions(spark, [staged]),
    )


@query(
    "t4b_session_append",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM events),
    recent AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events, mx WHERE CAST(ts AS TIMESTAMP) >= m - INTERVAL 4 HOUR
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM recent
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT MIN(ts) AS session_start, user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered, mx
    GROUP BY user_id, sid, m
    HAVING MAX(ts) + INTERVAL 30 MINUTE <= m - INTERVAL 10 MINUTE
    """,
)
def t4b_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4b (scale-safe form of t4): 30-minute-gap session windows in
    APPEND mode with a tight 10-minute watermark, same three-batch
    arrival as t2b. A session is emitted once the watermark passes its
    end (last event + gap); the old-slice batch arrives hours behind the
    trailing watermark and is dropped. The flush row (duplicate max-ts
    event) only extends its user's final still-open session, which is
    withheld — invisible on both sides. The oracle sessionizes the
    recent slice with the classic lag+cumsum SQL and keeps exactly the
    sessions whose end <= max_ts - 10 min."""
    wd = _workdir()
    staged = _stage_two_phase_events(spark, sf_dir, wd)
    agg = session_counts(_two_phase_stream(spark, staged), watermark_delay="10 minutes")
    # r15: state partitions derived from the staged bytes (guide §2.2 —
    # the state exchange is pinned at checkpoint creation, AQE cannot
    # coalesce it; see streaming.ops.stream_state_partitions)
    return run_available_now(
        agg, wd, _qname("t4b"), output_mode="append",
        state_partitions=stream_state_partitions(spark, [staged]),
    )


@query(
    "t3_sliding_window",
    scale_form="parity",
    oracle="""
    WITH starts AS (
      SELECT UNNEST([DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)),
                     DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS wstart
      FROM events
    )
    SELECT wstart, CAST(COUNT(*) AS BIGINT) AS n
    FROM starts GROUP BY wstart
    """,
)
def t3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: 2h window sliding by 1h — every event lands in exactly two
    windows; oracle unnests both window starts per event."""
    wd = _workdir()
    stream = stage_events_stream(spark, sf_dir, wd)
    return run_available_now(
        sliding_counts(stream, watermark_delay="3650 days"),
        wd, _qname("t3"), output_mode="complete",
        state_partitions=stream_state_partitions(
            spark, [f"{sf_dir}/events.parquet"]
        ),
    )


@query(
    "t4_session_window",
    scale_form="parity",
    oracle="""
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT MIN(ts) AS session_start, user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def t4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: 30-minute-gap session windows per user (streaming
    session_window vs the classic lag+cumsum sessionization SQL)."""
    wd = _workdir()
    stream = stage_events_stream(spark, sf_dir, wd)
    return run_available_now(
        session_counts(stream, watermark_delay="3650 days"),
        wd, _qname("t4"), output_mode="complete",
        state_partitions=stream_state_partitions(
            spark, [f"{sf_dir}/events.parquet"]
        ),
    )


@query(
    "t5_stream_dedup",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids
    FROM events
    """,
)
def t5_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: streaming dedup under duplicate delivery — the input stream is
    read TWICE (two staged copies = simulated redelivery) and
    dropDuplicates(event_id) within the watermark must restore exactly-once
    counts. Fixes /root/reference/dags/etl_dags.py:47-48 crash semantics."""
    wd = _workdir()
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import EVENTS_STREAM_SCHEMA

    staged = os.path.join(wd, "events_doubled")
    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").parquet(staged)
    ev.write.mode("append").parquet(staged)  # redelivery: every event twice
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(staged)
    )
    deduped = run_available_now(
        stream_dedup(stream, ["event_id"], watermark_delay="3650 days"),
        wd, _qname("t5"),
        state_partitions=stream_state_partitions(spark, [staged]),
    )
    return deduped.agg(
        F.count("*").alias("n_rows"), F.countDistinct("event_id").alias("n_ids")
    )


@query(
    "t6_stateful_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def t6_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: arbitrary stateful op (applyInPandasWithState) — per-user
    running totals; the LAST update per user must equal the batch group-by.
    Update-mode emits one row per user per micro-batch; we keep each
    user's final state via max n_events."""
    wd = _workdir()
    stream = stage_events_stream(spark, sf_dir, wd)
    updates = run_available_now(
        stateful_user_totals(stream), wd, _qname("t6"), output_mode="update",
        state_partitions=stream_state_partitions(
            spark, [f"{sf_dir}/events.parquet"]
        ),
    )
    final = updates.groupBy("user_id").agg(
        F.max_by("total_value", "n_events").alias("total_value"),
        F.max("n_events").alias("n_events"),
    )
    return final.select("user_id", "n_events", "total_value")


@query(
    "t9_exactly_once_sink",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE event_type = 'purchase'
    """,
)
def t9_exactly_once_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8+T9+T10: checkpointed parquet file sink driven by availableNow,
    RESTARTED once on the same checkpoint (no new data → second run must
    write nothing). Re-read output must equal the batch filter exactly —
    duplicated rows would mean broken exactly-once."""
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import EVENTS_STREAM_SCHEMA, run_to_parquet

    wd = _workdir()
    stream_src = stage_events_stream(spark, sf_dir, wd)
    filtered = stream_src.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "event_type"
    )
    out = run_to_parquet(filtered, wd, "t9")
    # restart on same checkpoint — exactly-once means this is a no-op
    stream2 = stage_events_stream(spark, sf_dir, wd)
    filtered2 = stream2.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "event_type"
    )
    run_to_parquet(filtered2, wd, "t9")
    return spark.read.parquet(out)


@query(
    "j9_stream_static_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def j9_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: stream-static join — the streaming events enriched against the
    static customer dimension (broadcast per micro-batch), then aggregated.
    Run to completion with availableNow; must equal the batch join."""
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table

    wd = _workdir()
    stream = stage_events_stream(spark, sf_dir, wd)
    customer = load_table(spark, sf_dir, "customer")
    joined = stream.join(customer, stream.user_id == customer.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        money_sum(money("value"), "total_value"),
    )
    return run_available_now(
        agg, wd, _qname("j9"), output_mode="complete",
        state_partitions=stream_state_partitions(
            spark, [f"{sf_dir}/events.parquet"]
        ),
    )


@query(
    "j10_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
     AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
    """,
)
def j10_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: stream-stream inner join with watermarks on both sides and a
    time-bound condition (clicks within 30 min before each purchase) —
    state on both sides evicted by watermark + bound. Append mode."""
    wd = _workdir()
    purchases = (
        stage_events_stream(spark, sf_dir, wd)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "3650 days")
    )
    clicks = (
        stage_events_stream(spark, sf_dir, wd)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "3650 days")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            """
            user_id = c_user AND
            c_ts <= p_ts AND
            c_ts >= p_ts - INTERVAL 30 MINUTES
            """
        ),
    ).select("purchase_id", "click_id", "user_id")
    return run_available_now(
        joined, wd, _qname("j10"), output_mode="append",
        state_partitions=stream_state_partitions(
            spark, [f"{sf_dir}/events.parquet"]
        ),
    )


@query(
    "t13_stream_incremental_dedup",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n
      FROM documents
    )
    SELECT doc_id AS id_a,
           doc_id + 100000 AS id_b,
           TRUE AS found,
           TRUE AS cross_batch
    FROM t WHERE doc_id % 25 = 0 AND n >= 3
    """,
)
def t13_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13 (round 7): STREAMING ingest dedup — each micro-batch of a
    documents stream is deduplicated against the PERSISTED MinHash band
    index via foreachBatch, then appended to it
    (functions/dedup_index.py): the composition a 100 TB crawl pipeline
    actually deploys, where snapshots arrive continuously and the corpus
    index is the long-lived state. The index's duplicate-batch_id guard
    doubles as the exactly-once story: a replayed micro-batch is
    REJECTED loudly instead of silently double-indexed (foreachBatch is
    at-least-once; the guard makes redelivery explicit).

    Staging: two mtime-ordered files (maxFilesPerTrigger=1 → two
    micro-batches in pinned order) — batch 0 the corpus, batch 1 a
    verbatim copy of every 25th eligible doc under id+100000. Contract:
    each planted pair is found by the BATCH-1 sink pass (`found`), and
    the index's recorded provenance proves the pair really crossed
    micro-batches — id_a indexed by b0, id_b by b1 (`cross_batch`)."""
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
    from etl_apache_kafka_python_doker_aws_spark.functions import text as _tx
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_append,
        minhash_index_dedup_batch,
        minhash_index_meta,
        minhash_index_pairs_vs_batch,
    )
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
        run_to_parquet,
        stage_ordered_batches,
    )

    wd = _workdir()
    staged = os.path.join(wd, "docs_staged")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eligible = d.filter(
        (F.pmod(F.col("doc_id"), F.lit(25)) == 0)
        & (F.size(_tx.tokenize("text")) >= 3)
    )
    copies = eligible.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    stage_ordered_batches([d, copies], staged)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    idx = os.path.join(wd, "band_index")
    pairs_out = os.path.join(wd, "pairs_out")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"b{batch_id}"
        sess = batch_df.sparkSession
        if minhash_index_meta(sess, idx) is None:
            minhash_index_append(batch_df, "doc_id", "text", idx, batch_id=bid)
            pairs = minhash_index_pairs_vs_batch(sess, idx, bid)
        else:
            pairs = minhash_index_dedup_batch(
                batch_df, "doc_id", "text", idx, batch_id=bid
            )
        pairs.write.mode("append").parquet(pairs_out)

    run_to_parquet(stream, wd, _qname("t13"), batch_fn=_sink)
    pairs = spark.read.parquet(pairs_out)
    prov = spark.read.parquet(idx).select("_id", "_batch").distinct()
    expected = eligible.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 100000).alias("id_b"),
    )
    return (
        expected.join(pairs, ["id_a", "id_b"], "left")
        .join(
            prov.select(F.col("_id").alias("id_a"), F.col("_batch").alias("_ba")),
            "id_a",
            "left",
        )
        .join(
            prov.select(F.col("_id").alias("id_b"), F.col("_batch").alias("_bb")),
            "id_b",
            "left",
        )
        .select(
            "id_a",
            "id_b",
            F.col("est_jaccard").isNotNull().alias("found"),
            ((F.col("_ba") == "b0") & (F.col("_bb") == "b1")).alias("cross_batch"),
        )
    )


@query(
    "t14_stream_semantic_dedup",
    oracle="""
    SELECT vec_id AS id_a,
           vec_id + 100000 AS id_b,
           TRUE AS found,
           TRUE AS cross_batch
    FROM embeddings WHERE vec_id % 25 = 0
    """,
)
def t14_stream_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14 (round 9): STREAMING semantic-dedup ingest — the embedding
    twin of t13: micro-batches of an embeddings stream are deduplicated
    against the PERSISTED ANN index via foreachBatch (batch 0 builds
    the index and pins the models; every later batch is encoded with
    those pinned models, searched, and appended —
    functions/ann_index.ann_index_dedup_batch). Together with t13 this
    is the full continuous-crawl dedup deployment: lexical near-dups
    through the band index, semantic near-dups through the ANN index,
    both with long-lived on-disk state and the duplicate-batch_id guard
    making foreachBatch's at-least-once redelivery explicit.

    Staging: two mtime-ordered files (maxFilesPerTrigger=1 → pinned
    micro-batch order) — batch 0 the embeddings corpus, batch 1 a
    VERBATIM copy of every 25th vector under id+100000. Contract: each
    planted pair is caught by the batch-1 dedup pass at squared-L2
    threshold 0.25 (identical vector ⇒ same cell/codes under pinned
    models ⇒ exact re-rank dist 0; fixture's natural minimum distance
    is 0.80+, see l2_incremental_semdedup), and the index's recorded
    provenance proves the pair crossed micro-batches (id_a indexed by
    b0, id_b by b1)."""
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
        ann_index_dedup_batch,
        ann_index_meta,
    )
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
        run_to_parquet,
        stage_ordered_batches,
    )

    wd = _workdir()
    staged = os.path.join(wd, "vecs_staged")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    planted = e.filter(F.pmod(F.col("vec_id"), F.lit(25)) == 0)
    copies = planted.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    stage_ordered_batches([e, copies], staged)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    idx = os.path.join(wd, "ann_index")
    pairs_out = os.path.join(wd, "sem_pairs_out")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"b{batch_id}"
        sess = batch_df.sparkSession
        if ann_index_meta(sess, idx) is None:
            # first batch IS the corpus: build + pin the models (no
            # pairs — an index of one batch has nothing older to hit)
            ann_index_build(
                batch_df, "vec_id", "embedding", idx, dim=64, n_cells=16,
                n_subspaces=8, n_centroids=32, batch_id=bid,
            )
            return
        ann_index_dedup_batch(
            batch_df, "vec_id", "embedding", idx, batch_id=bid,
            threshold=0.25, k=5, n_probe=8,
        ).write.mode("append").parquet(pairs_out)

    run_to_parquet(stream, wd, _qname("t14"), batch_fn=_sink)
    pairs = spark.read.parquet(pairs_out).select(
        F.col("neighbor_id").alias("id_a"),
        F.col("query_id").alias("id_b"),
        "dist",
    )
    prov = spark.read.parquet(idx).select("_id", "_batch").distinct()
    expected = planted.select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + 100000).alias("id_b"),
    )
    return (
        expected.join(pairs, ["id_a", "id_b"], "left")
        .join(
            prov.select(F.col("_id").alias("id_a"), F.col("_batch").alias("_ba")),
            "id_a",
            "left",
        )
        .join(
            prov.select(F.col("_id").alias("id_b"), F.col("_batch").alias("_bb")),
            "id_b",
            "left",
        )
        .select(
            "id_a",
            "id_b",
            F.col("dist").isNotNull().alias("found"),
            ((F.col("_ba") == "b0") & (F.col("_bb") == "b1")).alias("cross_batch"),
        )
    )


@query(
    "t15_stream_grouped_dedup",
    oracle="""
    SELECT DISTINCT (vec_id % 100) + 100000 AS query_doc,
           vec_id % 100 AS neighbor_doc,
           TRUE AS found,
           TRUE AS dist_zero,
           TRUE AS replay_identical
    FROM embeddings WHERE vec_id % 100 < 5
    """,
)
def t15_stream_grouped_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15 (r15): STREAMING doc-level grouped semantic dedup — the
    grouped serving tier deployed as a continuous-ingest pipeline:
    micro-batches of multi-chunk documents are doc-level-deduplicated
    against the persisted ANN index via foreachBatch
    (``similarity.ann_grouped_dedup_batch``, payload-backed form —
    batch 0 builds the index with ``payload_cols=["doc_id"]`` and pins
    the models; every later snapshot pays encode + batch-sized search
    only). The at-least-once story upgrades t13/t14's loud-rejection
    guard to the r15 RESUME contract: the sink re-runs the SAME
    delivery with ``resume=True`` (what a foreachBatch replay after a
    crash-past-append does) and the contract proves the replay returns
    the IDENTICAL pair set instead of raising or double-indexing.

    Staging: two mtime-ordered files (maxFilesPerTrigger=1 → pinned
    micro-batch order) — batch 0 the chunk corpus (doc = vec_id % 100),
    batch 1 verbatim copies of docs 0-4's chunks under chunk id+100000
    / doc id+100000 (a re-crawled doc with ALL chunk ids renamed — the
    case chunk-level dedup cannot pair). Contract per planted doc:
    ``found`` (the new doc pairs its source doc), ``dist_zero``
    (verbatim chunks ⇒ best-chunk-pair dist exactly 0),
    ``replay_identical`` (the resume pass emitted exactly the same
    (query_doc, neighbor_doc, dist) set — engine-side set-equality
    audit)."""
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
        ann_index_meta,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        ann_grouped_dedup_batch,
    )
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import (
        run_to_parquet,
        stage_ordered_batches,
    )

    wd = _workdir()
    staged = os.path.join(wd, "gchunks_staged")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
        F.pmod(F.col("vec_id"), F.lit(100)).alias("doc_id"),
    )
    planted = e.filter(F.col("doc_id") < 5)
    copies = planted.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding",
        (F.col("doc_id") + 100000).alias("doc_id"),
    )
    stage_ordered_batches([e, copies], staged)
    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<double>, doc_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    idx = os.path.join(wd, "gann_index")
    pairs_out = os.path.join(wd, "gpairs_out")
    replay_out = os.path.join(wd, "gpairs_replay_out")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"b{batch_id}"
        sess = batch_df.sparkSession
        if ann_index_meta(sess, idx) is None:
            ann_index_build(
                batch_df, "vec_id", "embedding", idx, dim=64, n_cells=16,
                n_subspaces=8, n_centroids=32, batch_id=bid,
                payload_cols=["doc_id"],
            )
            return
        kw = dict(batch_id=bid, threshold=0.25, chunk_k=20, n_probe=8)
        ann_grouped_dedup_batch(
            batch_df, "vec_id", "embedding", idx, **kw
        ).write.mode("append").parquet(pairs_out)
        # the replayed delivery (foreachBatch is at-least-once): resume
        # skips the already-committed append, re-runs the search side
        ann_grouped_dedup_batch(
            batch_df, "vec_id", "embedding", idx, resume=True, **kw
        ).write.mode("append").parquet(replay_out)

    run_to_parquet(stream, wd, _qname("t15"), batch_fn=_sink)
    pairs = spark.read.parquet(pairs_out)
    replay = spark.read.parquet(replay_out)
    n_diff_g = (
        pairs.exceptAll(replay).unionByName(replay.exceptAll(pairs))
        .agg(F.count("*").alias("_nd"))
    )
    expected = planted.select(
        (F.col("doc_id") + 100000).alias("query_doc"),
        F.col("doc_id").alias("neighbor_doc"),
    ).distinct()
    return (
        expected.join(pairs, ["query_doc", "neighbor_doc"], "left")
        .crossJoin(F.broadcast(n_diff_g))
        .select(
            "query_doc",
            "neighbor_doc",
            F.col("dist").isNotNull().alias("found"),
            (F.col("dist") == 0.0).alias("dist_zero"),
            (F.col("_nd") == 0).alias("replay_identical"),
        )
    )


@query(
    "t12_stream_curation",
    oracle="""
    WITH quality AS (
        SELECT doc_id, source, text,
               len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               t -> t <> '')) AS n_tokens
        FROM documents
    ), kept AS (
        SELECT DISTINCT ON (sha256(text)) doc_id, source, n_tokens
        FROM quality
        WHERE n_tokens >= 30
        ORDER BY sha256(text), doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)       AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)  AS total_tokens
    FROM kept
    GROUP BY source
    """,
)
def t12_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: STREAMING curation — the L-family quality filter + exact
    content dedup running as a real checkpointed streaming query over a
    documents stream (file source, availableNow): watermark-scoped
    dropDuplicates on the content hash, Gopher length rule inline, then
    a per-source survivor rollup. This is the incremental form of the
    batch l11 pipeline: new corpus shards stream through the same
    lineage with exactly-once state.

    Dedup tie-break: streaming keeps the FIRST arrival per content hash;
    the staged stream is a single file read in order, so the lowest
    doc_id wins — mirrored by DISTINCT ON (hash) ORDER BY doc_id."""
    from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
    from etl_apache_kafka_python_doker_aws_spark.streaming.ops import run_available_now

    wd = _workdir()
    staged = os.path.join(wd, "docs_staged")
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("ts", F.timestamp_micros(F.col("doc_id")))
        # orderBy BEFORE the single-file coalesce: without it the file's
        # row order is whatever partition order the scan produced, and the
        # "first arrival per hash" tie-break would not be lowest-doc_id
        .orderBy("doc_id")
        .coalesce(1)  # one file → deterministic arrival order for dedup
        .write.mode("overwrite").parquet(staged)
    )
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    from etl_apache_kafka_python_doker_aws_spark.functions.curation import word_tokens

    toks = word_tokens("text")
    curated = (
        stream.withColumn("n_tokens", F.size(toks))
        .filter(F.col("n_tokens") >= 30)
        .withColumn("_h", F.sha2(F.col("text"), 256))
        .withWatermark("ts", "3650 days")
        .dropDuplicates(["_h"])
    )
    agg = curated.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return run_available_now(
        agg, wd, _qname("t12"), output_mode="complete",
        state_partitions=stream_state_partitions(
            spark, [f"{sf_dir}/events.parquet"]
        ),
    )
