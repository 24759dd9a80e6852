#!/usr/bin/env python
"""Registry sweep at the synthetic sf1 fixture (VERDICT r6 #6 standing
rule: every NEW query is sf1-swept the round it lands): runs the named
queries (or every registered one with --all) against /tmp/sf1_synth via
the driver-faithful oracle harness and prints one MATCH/MISMATCH line
per query with wall time.

Mechanics (the r8 sweep lessons, baked in so future rounds don't
re-learn them):
  * session via the engine's `get_spark()` — a bare builder loses the
    Arrow local-relation conf and every tiny_rows_df write degrades to
    the Python-RDD path (r13: measured 17 s vs 1.1 s per ANN delete);
  * DuckDB `connect()` defaults to ONE thread → PRAGMA threads;
  * each oracle runs under a threading.Timer → con.interrupt() watchdog
    (some recursive-closure oracles are infeasible at sf1 — engine
    fine, oracle quadratic; a timeout records ORACLE_TIMEOUT, not a
    hang);
  * resume via a done-file (`/tmp/sf1_sweep_done.txt`): re-runs skip
    already-recorded queries, so a crash/timeout only re-times the rest.

Usage:
  python sweep_sf1.py l3_grouped_ann l2_filtered_pairs
  python sweep_sf1.py --all
  SF1_DIR=/tmp/sf1_synth SWEEP_DONE=/tmp/sf1_sweep_done.txt ...
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

SF1_DIR = os.environ.get("SF1_DIR", "/tmp/sf1_synth")
DONE_FILE = os.environ.get("SWEEP_DONE", "/tmp/sf1_sweep_done.txt")
ORACLE_TIMEOUT_S = int(os.environ.get("SWEEP_ORACLE_TIMEOUT", "900"))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    from etl_apache_kafka_python_doker_aws_spark.session import get_spark
    from etl_apache_kafka_python_doker_aws_spark.workloads import ORACLES, QUERIES
    from oracle_harness import compare

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = list(QUERIES) if "--all" in sys.argv else args
    if not names:
        print("usage: sweep_sf1.py <query> [query ...] | --all")
        sys.exit(2)
    done = set()
    if os.path.exists(DONE_FILE):
        done = {ln.split()[0] for ln in open(DONE_FILE) if ln.strip()}
    spark = get_spark("sf1-sweep")
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={max(os.cpu_count() - 4, 4)}")
    for t in TABLES:
        p = f"{SF1_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name in names:
        if name in done:
            print(f"{name} SKIP (done-file)")
            continue
        if name not in QUERIES:
            print(f"{name} UNKNOWN")
            continue
        t0 = time.time()
        sql = ORACLES.get(name)
        timed_out = {"hit": False}
        settled = {"done": False}

        def _interrupt():
            # ADVICE r14: a timer firing in the window between compare()
            # returning and timer.cancel() would interrupt an idle
            # connection and mislabel the NEXT oracle as interrupted —
            # the settled flag (set before cancel) makes the late fire
            # a no-op
            if settled["done"]:
                return
            timed_out["hit"] = True
            con.interrupt()

        # only settled results persist to the done-file: MATCH /
        # MISMATCH / ROWS_ONLY / ORACLE_TIMEOUT (deterministic — a
        # quadratic oracle stays quadratic; skipping avoids re-paying
        # the timeout). Generic ERR lines (OOM, contention, missing
        # fixture) are printed but NOT persisted, so the resume the
        # done-file exists for actually retries them (review r14).
        persist = True
        try:
            if sql is None:
                n = QUERIES[name](spark, SF1_DIR).count()
                line = f"{name} ROWS_ONLY n={n} {time.time() - t0:.1f}s"
            else:
                timer = threading.Timer(ORACLE_TIMEOUT_S, _interrupt)
                timer.start()
                try:
                    ok, detail = compare(QUERIES[name](spark, SF1_DIR), con, sql)
                    line = (
                        f"{name} {'MATCH' if ok else 'MISMATCH ' + str(detail)}"
                        f" {time.time() - t0:.1f}s"
                    )
                except Exception:
                    if not timed_out["hit"]:
                        raise
                    line = (
                        f"{name} ORACLE_TIMEOUT >{ORACLE_TIMEOUT_S}s "
                        "(engine side may be fine — oracle infeasible at sf1)"
                    )
                finally:
                    settled["done"] = True
                    timer.cancel()
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — sweep must keep going
            msg = str(e).replace("\n", " ")[:200]
            line = f"{name} ERR {msg} {time.time() - t0:.1f}s"
            persist = False
        print(line, flush=True)
        if persist:
            with open(DONE_FILE, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
