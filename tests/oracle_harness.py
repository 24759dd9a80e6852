"""Local re-implementation of the driver's Spark-vs-DuckDB compare:
row-count + column names + order-insensitive value hash.

DRIVER-FAITHFUL since round 4 (VERDICT r3 "What's wrong" #3): the driver
fetches the DuckDB oracle through pandas (``con.execute(sql).df()``),
which coerces DECIMAL and HUGEINT columns to float64 and DATE columns to
datetime64 — so ``Decimal('363566.20')`` becomes the float rendering
``363566.2`` and an integer-valued HUGEINT becomes ``3.0``. The Spark
side is collected Rows whose values stay Decimal/int/date. The round-3
version of this harness fetched via ``fetchall()`` (native Decimals) and
stripped trailing zeros, which hid exactly that bug class and made six
driver hash-fails locally irreproducible for a whole round.

Rules now:
  * oracle side: fetched via ``.df()`` (same pandas coercions the driver
    sees), cells rendered from the pandas values;
  * Spark side: collected Rows, cells rendered UNNORMALIZED — a Decimal
    keeps its trailing zeros, an int stays ``3`` (never ``3.0``);
  * floats render at full shortest-round-trip ``repr`` precision (the r1
    lesson: a 6-sig-digit hash hid ulp mismatches);
  * oracle-side NaN renders "NULL" (pandas float64 genuinely cannot
    distinguish NaN from NULL after .df()), but SPARK-side NaN renders
    "NaN" — the driver sees collected Rows where NaN and None are
    distinct, so a query emitting NaN where the oracle yields NULL must
    fail here too (ADVICE r4: this was the one remaining deliberate
    divergence from the driver-faithful model).

Consequence for query authors: any output column that is DECIMAL or
HUGEINT on the oracle side, or DecimalType/DateType on the Spark side,
will (correctly) fail here. Emit BIGINT / DOUBLE / VARCHAR / BOOLEAN /
TIMESTAMP output columns only — compute money in exact decimal
internally, cast the final column to DOUBLE on both engines."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _render_spark_cell(v):
    """Render a collected-Row cell the way the driver's hasher sees it."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, Decimal):
        # UNNORMALIZED on purpose: Decimal('1.20') must render '1.20' so a
        # decimal output column mismatches the oracle's float64 '1.2'.
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            # Distinct from "NULL": the driver's Spark side keeps NaN and
            # None distinct (only the pandas-fetched ORACLE side merges
            # them), so local green must not paper over a NaN output.
            return "NaN"
        return repr(v)
    if isinstance(v, datetime):
        return str(v)
    if isinstance(v, date):
        # date renders WITHOUT midnight — intentionally mismatches the
        # oracle side, where pandas turns DATE into Timestamp 00:00:00.
        # House rule: don't emit DateType outputs; use timestamp or string.
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render_spark_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{" + ",".join(f"{k}:{_render_spark_cell(x)}" for k, x in sorted(v.items())) + "}"
        )
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _render_duck_cell(v):
    """Render a pandas-fetched oracle cell (post float64/datetime64 coercion)."""
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, np.bool_):
        return "True" if bool(v) else "False"
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NULL"
        return str(v)
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_render_duck_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render_duck_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{" + ",".join(f"{k}:{_render_duck_cell(x)}" for k, x in sorted(v.items())) + "}"
        )
    if isinstance(v, Decimal):
        # .df() leaves DECIMAL(>15 digits?) as object dtype in some duckdb
        # versions; render unnormalized so it still flags the bug class.
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    try:
        import pandas as _pd

        if _pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def _canon(rendered_rows):
    out = [tuple(r) for r in rendered_rows]
    out.sort()
    return out


def compare(spark_df, duck_con, oracle_sql: str):
    """Return (ok, detail) comparing a Spark DataFrame against DuckDB SQL,
    using the driver's pandas fetch path for the oracle side."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    pdf = duck_con.execute(oracle_sql).df()
    d_cols = [c.lower() for c in pdf.columns]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(pdf):
        return False, f"rowcount mismatch: spark={len(s_rows)} duck={len(pdf)}"

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    sc = _canon(
        tuple(_render_spark_cell(r[i]) for i in s_order) for r in s_rows
    )
    d_sorted = [d_cols.index(s_cols[i]) for i in s_order]
    # Fetch column-wise to keep per-column numpy scalar types (a whole-frame
    # .values would homogenize dtypes to object/float).
    cols_data = [pdf.iloc[:, j] for j in d_sorted]
    dc = _canon(
        tuple(_render_duck_cell(col.iloc[k]) for col in cols_data)
        for k in range(len(pdf))
    )
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
