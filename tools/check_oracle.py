#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle SQL vs Spark query output.

Mirrors what the driver's correctness gate does: run graft.Verify at a
scale factor, then run each oracle SQL in DuckDB over the same parquet
tables and compare row multisets (columns sorted by name).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def frame_key(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return [names[i] for i in order], canon_rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            g_names = [d[0] for d in got.description]
            g_cols, g_rows = frame_key(g_names, got.fetchall())
            # The driver's gate fetches DuckDB results via Arrow, where
            # HUGEINT (e.g. sum(INTEGER)) renders as decimal and hash-
            # mismatches Spark's int64 even when values agree (round 4:
            # q82/q84). Flag it here so the oracle SQL gets a BIGINT cast.
            rel = con.sql(sql)
            hug = [c for c, t in zip(rel.columns, map(str, rel.types))
                   if "HUGEINT" in t]
            if hug:
                print(f"FAIL {name}: oracle emits HUGEINT column(s) {hug}; "
                      f"CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1
                continue
            want = con.execute(sql)
            w_names = [d[0] for d in want.description]
            w_cols, w_rows = frame_key(w_names, want.fetchall())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} != {w_cols}")
            n_fail += 1
        elif g_rows != w_rows:
            n_fail += 1
            diff_g = [r for r in g_rows if r not in set(w_rows)][:3]
            diff_w = [r for r in w_rows if r not in set(g_rows)][:3]
            print(f"FAIL {name}: {len(g_rows)} spark rows vs {len(w_rows)} oracle rows")
            for r in diff_g:
                print(f"  spark-only: {r[:200]}")
            for r in diff_w:
                print(f"  oracle-only: {r[:200]}")
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
