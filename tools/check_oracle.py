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
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
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
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
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
