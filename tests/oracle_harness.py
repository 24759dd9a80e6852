"""Local re-implementation of the driver's Spark-vs-DuckDB compare:
row-count + column names + order-insensitive value hash. Used by tests to
catch oracle misalignment before the driver does."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm_cell(v):
    """Normalize a cell so Spark and DuckDB renderings hash identically.

    Floats compare at FULL precision (shortest round-trip repr), not a
    truncated %.6g: round-1's driver flagged q7/q9 ulp-level mismatches
    that a 6-significant-digit hash hid locally (VERDICT r1 #1-2). A
    stricter-than-driver local harness means local green predicts driver
    green. Decimals normalize to trailing-zero-stripped fixed-point so a
    scale-2 Spark decimal equals a scale-4 DuckDB decimal of equal value.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s if s not in ("-0", "") else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _canon(rows, cols):
    """Sort columns by name, normalize cells, sort rows → canonical list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_norm_cell(vals[i]) for i in order))
    out.sort()
    return out


def compare(spark_df, duck_con, oracle_sql: str):
    """Return (ok, detail) comparing a Spark DataFrame against DuckDB SQL."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    res = duck_con.execute(oracle_sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    sc = _canon(s_rows, s_cols)
    dc = _canon(d_rows, d_cols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
