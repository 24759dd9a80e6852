"""Query registry: every SURVEY.md §2 operator row registers one named
query (a ``(spark, sf_dir) -> DataFrame`` callable) and, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string.

The driver contract (``__spark_entry__.py``) reads these dicts directly.
Column names/aliases MUST match between the Spark query and its oracle —
the harness hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Scale-form tag per query (VERDICT r5 #7) — lets a user or the driver
#: select ship shapes programmatically instead of reading docstrings:
#:   ship    — the form you would run at 100 TB (the default)
#:   parity  — batch-parity/oracle-friendly twin of a ship-form query
#:             (e.g. complete-mode t2 vs append-mode t2b)
#:   bounded — resource-bounded alternate kept for its memory/shuffle
#:             contract; the plain form wins locally (measured numbers
#:             in its docstring)
SCALE_FORMS: dict[str, str] = {}
_ALLOWED_SCALE_FORMS = ("ship", "parity", "bounded")


def query(
    name: str, oracle: str | None = None, scale_form: str = "ship"
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, (optionally) its DuckDB oracle SQL, and
    its scale-form tag (also set as ``fn.scale_form`` on the callable,
    so ``queries()`` consumers see it without importing this module)."""
    if scale_form not in _ALLOWED_SCALE_FORMS:
        raise ValueError(
            f"scale_form must be one of {_ALLOWED_SCALE_FORMS}, got {scale_form!r}"
        )

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        SCALE_FORMS[name] = scale_form
        fn.scale_form = scale_form  # type: ignore[attr-defined]
        return fn

    return deco


def scale_form_table() -> str:
    """Markdown table of every non-default scale_form tag — pasted into
    COVERAGE.md (drift-guarded by
    tests/test_queries_vs_oracle.py::test_coverage_scale_form_table)."""
    lines = [
        "| query | scale_form |",
        "|---|---|",
    ]
    for name in sorted(SCALE_FORMS):
        form = SCALE_FORMS[name]
        if form != "ship":
            lines.append(f"| `{name}` | {form} |")
    return "\n".join(lines)
