"""Decimal money arithmetic — the house style for money aggregates.

``round(sum(double), 2)`` is not reproducible across engines: double
summation is order-dependent, and Spark (decimal-string HALF_UP) and
DuckDB (binary-double) break rounding ties differently, so groups whose
sum lands on a half-cent/ULP boundary hash-mismatch (driver r1 failures
q7_nation_volume / q9_product_profit: 40 of 597 groups on boundaries).

Fix: fixture money columns are exact 2-dp values stored as doubles
(max |residual| ~1e-9 cents, verified against the parquet), so casting
to DECIMAL is lossless in both engines. Decimal sums are exact and
order-independent, so the rounded aggregate is bit-identical across
engines at any scale factor — and the final CAST pins the output scale
so hashing never sees scale drift.

DuckDB oracle mirror of ``money_sum(money(x) * one_minus(d), "revenue")``:

    CAST(ROUND(SUM(CAST(x AS DECIMAL(12,2)) * (1 - CAST(d AS DECIMAL(8,2)))), 2)
         AS DECIMAL(18,2)) AS revenue

Widths are chosen so three-factor products stay inside DuckDB's 38-digit
cap: (12,2)x(9,2) -> (21,4); x(9,2) again -> (30,6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2-dp amounts: prices, balances, per-event values (|x| < 10^10).
MONEY = "decimal(12,2)"
#: 2-dp rates: discount, tax (|x| < 10^6 after the 1±x shift).
RATE = "decimal(8,2)"
#: pinned output scale for rounded money aggregates.
OUT_PRECISION = 18


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def money(c: Column | str) -> Column:
    """Lossless cast of a 2-dp money column to exact decimal."""
    return _col(c).cast(MONEY)


def rate(c: Column | str) -> Column:
    """Lossless cast of a 2-dp rate column (discount/tax) to decimal."""
    return _col(c).cast(RATE)


def one_minus(c: Column | str) -> Column:
    """``1 - rate`` computed in decimal (exact), e.g. ``1 - l_discount``."""
    return F.lit(1).cast(RATE) - rate(c)


def one_plus(c: Column | str) -> Column:
    """``1 + rate`` computed in decimal (exact), e.g. ``1 + l_tax``."""
    return F.lit(1).cast(RATE) + rate(c)


def money_sum(expr: Column, alias: str, nd: int = 2) -> Column:
    """Exact decimal SUM rounded to ``nd`` digits with a pinned scale."""
    return F.round(F.sum(expr), nd).cast(f"decimal({OUT_PRECISION},{nd})").alias(alias)
