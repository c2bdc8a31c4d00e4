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
            if budget > 0:
                import threading
                timer = threading.Timer(budget, con.interrupt)
                timer.start()
                try:
                    duck_df = con.sql(sql).df()
                finally:
                    timer.cancel()
            else:
                duck_df = con.sql(sql).df()
        except getattr(duckdb, "InterruptException", ()) as _:
            print(f"SKIP {name}: oracle SQL exceeded {budget:.0f}s budget "
                  "(quadratic oracle formulation at this SF)")
            continue
        except Exception as e:
            msg = str(e)[:200]
            if "INTERRUPT" in msg.upper():
                print(f"SKIP {name}: oracle SQL exceeded {budget:.0f}s budget "
                      "(quadratic oracle formulation at this SF)")
                continue
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
