#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run every
queries() entry at sf0.01 against its oracle_sql() DuckDB twin and
compare row count, column names, and an order-insensitive value
multiset (floats canonicalized through repr of float64).

Usage: python scripts/check_entry.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return repr(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    from log_project_spark.session import get_spark

    spark = get_spark(app_name="check_entry", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    wanted = sys.argv[1:] or list(queries)
    n_fail = 0
    for name in wanted:
        fn = queries[name]
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(s_rows)} rows (rows-only, {dt:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sset, dset = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            if sset != dset:
                diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows ({dt:.1f}s)")
    print(f"\n{len(wanted) - n_fail}/{len(wanted)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
