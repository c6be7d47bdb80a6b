#!/usr/bin/env python3
"""Regenerate tests/golden_hashes.json (VERDICT r2 #5).

Freezes the five no-oracle gate queries' sf0.01 results as value
hashes; see log_project_spark/golden.py for the canon and rationale.
Each query is computed twice in one session and must hash identically
before it is frozen (re-run stability check).

Run: python scripts/regen_golden_hashes.py   # rewrites the JSON
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from log_project_spark.golden import GOLDEN_SF, GOLDEN_TARGETS, value_hash  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(REPO, "tests", "golden_hashes.json")


def main() -> None:
    import __spark_entry__ as entry_mod
    from log_project_spark.session import get_spark

    spark = get_spark(app_name="golden_hashes", master="local[8]", shuffle_partitions=16)
    queries = entry_mod.queries()
    golden = {}
    for name, cols in GOLDEN_TARGETS.items():
        sf_dir = GOLDEN_SF.get(name, SF_DIR)
        h1, n1 = value_hash(queries[name](spark, sf_dir), cols)
        h2, n2 = value_hash(queries[name](spark, sf_dir), cols)
        if (h1, n1) != (h2, n2):
            raise AssertionError(
                f"{name}: not re-run-stable within one session ({h1} vs {h2}) — "
                "cannot freeze a golden hash"
            )
        golden[name] = {"sha256": h1, "rows": n1, "columns": cols, "sf_dir": sf_dir}
        print(f"[golden] {name}: rows={n1} sha256={h1}", file=sys.stderr)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
