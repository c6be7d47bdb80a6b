#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run every
queries() entry at sf0.01 against its oracle_sql() DuckDB twin and
compare row count, column names, and an order-insensitive value
multiset (floats canonicalized through repr of float64).

Usage: python scripts/check_entry.py [--json PATH] [query ...]

--json PATH additionally writes the per-query results in the driver's
CORRECTNESS format (rows_match/schema_match/hash_match/spark_rows/
oracle_rows/err) — the full-sweep artifact committed each round as
CORRECTNESS_full_rNN.json, witnessing the queries past the driver
gate's 50-entry cap (VERDICT r4 "What's wrong #1").
"""

from __future__ import annotations

import json
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

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("-"):
            sys.exit("usage: check_entry.py [--json PATH] [QUERY ...]")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    wanted = args or list(queries)
    n_fail = 0
    report: dict[str, dict] = {}
    for name in wanted:
        fn = queries[name]
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            rec["err"] = f"spark: {exc}"
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        rec["spark_rows"] = len(s_rows)
        if name not in oracles:
            print(f"ROWS {name}: {len(s_rows)} rows (rows-only, {dt:.1f}s)")
            rec["err"] = "no_oracle"
            continue
        try:
            res = con.sql(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            rec["err"] = f"duckdb: {exc}"
            n_fail += 1
            continue
        rec["oracle_rows"] = len(d_rows)
        rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
        rec["rows_match"] = len(s_rows) == len(d_rows)
        problems = []
        if not rec["schema_match"]:
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not rec["rows_match"]:
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sset, dset = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            rec["hash_match"] = sset == dset
            if not rec["hash_match"]:
                diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        else:
            rec["hash_match"] = False
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows ({dt:.1f}s)")
    print(f"\n{len(wanted) - n_fail}/{len(wanted)} passed")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
