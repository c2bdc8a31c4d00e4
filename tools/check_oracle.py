#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares: row count, column names, dtypes, and
cell values (exact for non-floats, exact-after-read for floats since both
sides are deterministic by construction).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None or (isinstance(a, float) and math.isnan(a)) != (
                isinstance(b, float) and math.isnan(b)):
            return False
        if isinstance(a, float) and math.isnan(a):
            return True
        return float(a) == float(b)
    return a == b


def run_with_budget(con, sql: str, budget: float):
    """Run one oracle query under a wall budget. Returns (df, timed_out).

    Race hardening (advisor r14): a bare Timer(budget, con.interrupt)
    can fire in the window after con.sql() returns but before
    timer.cancel(), leaving a pending interrupt that aborts the NEXT
    query — which would then be misrecorded as SKIP (a feasible check
    silently dropped). Two guards: (1) the timer only interrupts while
    the query is still marked running (flag flipped under a lock in the
    finally, shrinking the window to the lock handoff); (2) an
    interrupt is classified as a timeout ONLY when the measured elapsed
    wall actually reached the budget — an early interrupt (a stray one
    from a prior query's timer) is re-run once instead of skipped.
    """
    import threading
    import time
    for attempt in range(2):
        lock = threading.Lock()
        running = [True]

        def _fire():
            with lock:
                if running[0]:
                    con.interrupt()

        timer = threading.Timer(budget, _fire)
        t0 = time.monotonic()
        timer.start()
        try:
            return con.sql(sql).df(), False
        except Exception as e:
            elapsed = time.monotonic() - t0
            is_intr = isinstance(e, getattr(duckdb, "InterruptException", ())) \
                or "INTERRUPT" in str(e)[:200].upper()
            if not is_intr:
                raise
            if elapsed >= budget * 0.95:
                return None, True
            if attempt == 0:
                continue  # stray interrupt before the budget: re-run once
            raise
        finally:
            with lock:
                running[0] = False
            timer.cancel()
    return None, True


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    # big-SF corpora: bound DuckDB's memory and let it spill to disk
    # instead of being OOM-killed mid-battery (sf1's containment oracle
    # is a quadratic shingle self-join); insertion order is irrelevant
    # to the compare (norm() sorts) and costs memory to preserve
    mem = os.environ.get("DUCKDB_MEMORY_LIMIT")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("DUCKDB_TEMP_DIR")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
    # high thread counts multiply DuckDB's per-operator buffers — the
    # sf1 bradley_terry oracle exhausts an 80 GB limit at 32 threads yet
    # finishes in 160 s / far under it at 8
    thr = os.environ.get("DUCKDB_THREADS")
    if thr:
        con.sql(f"SET threads={int(thr)}")
    con.sql("SET preserve_insertion_order=false")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue  # scale corpora may carry a table subset
        # driver testdata ships single files; ScaleUp corpora are
        # Spark-written directories of part files
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # DUCKDB_PY_ORACLES=1: replace the deliberately-naive quadratic SQL
    # formulations with the exact linear/near-linear Python references
    # in py_oracles.py (union-find CC, prefix-filtered Jaccard, blocked
    # BLAS cosine) — the scale gate that shrank the sf1 skip list from
    # 7 to 0 (round 15). Default stays SQL: the sf0.01 driver gate runs
    # the SQL formulations and local runs should mirror it.
    py_oracles = {}
    if os.environ.get("DUCKDB_PY_ORACLES") == "1":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from py_oracles import PY_ORACLES as py_oracles
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            # optional per-query wall budget (big-SF passes): several
            # oracle formulations are deliberately naive/quadratic
            # (containment shingle self-join, O(n^2) embedding cosine) —
            # exact and cheap at the sf0.01 gate, but 100x corpora make
            # DuckDB's state exceed RAM+disk. A timeout records the
            # query as SKIP (oracle-infeasible) rather than stalling or
            # OOM-killing the whole battery.
            budget = float(os.environ.get("DUCKDB_QUERY_TIMEOUT_S", "0"))
            if name in py_oracles:
                duck_df = py_oracles[name](con, sf_dir)
            elif budget > 0:
                duck_df, timed_out = run_with_budget(con, sql, budget)
                if timed_out:
                    print(f"SKIP {name}: oracle SQL exceeded {budget:.0f}s "
                          "budget (quadratic oracle formulation at this SF)")
                    continue
            else:
                duck_df = con.sql(sql).df()
        except Exception as e:
            # run_with_budget already classified genuine timeouts as SKIP;
            # an interrupt that reaches here fired twice BEFORE the budget
            # elapsed — not a timeout, and must not be silently skipped
            msg = str(e)[:200]
            print(f"FAIL {name}: oracle SQL error: {msg}")
            n_fail += 1
            continue
        problems = []
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            problems.append(f"columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            s, d = norm(spark_df), norm(duck_df)
            for c in s.columns:
                if str(s[c].dtype) != str(d[c].dtype):
                    problems.append(f"dtype[{c}] spark={s[c].dtype} duck={d[c].dtype}")
            sv, dv = s.to_numpy(), d.to_numpy()
            bad = 0
            for i in range(len(s)):
                for j in range(len(s.columns)):
                    a, b = sv[i][j], dv[i][j]
                    if (a is None or (isinstance(a, float) and math.isnan(a))) and \
                       (b is None or (isinstance(b, float) and math.isnan(b))):
                        continue
                    if not cmp_cell(a, b):
                        if bad < 3:
                            problems.append(f"cell[{i},{s.columns[j]}] spark={a!r} duck={b!r}")
                        bad += 1
            if bad:
                problems.append(f"{bad} mismatched cells")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:6]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracled queries")


if __name__ == "__main__":
    main()
