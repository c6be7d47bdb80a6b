#!/usr/bin/env python3
"""Micro-benchmark for VERDICT r2 #2: SRP bucket assignment inside the
ANN probe (topk_cosine_lsh) — Arrow/BLAS matmul path vs the per-element
Catalyst fold — on 1M x 64 synthetic unit vectors.

Writes BENCH/ann_probe_micro.json (the committed capture every number
in BENCH/BASELINE.md must trace to). Protocol: shared parquet input,
warm-up pass per impl, then best-of-K (default 3, env
ANN_MICRO_PASSES) alternating impls A/B A/B ... so host drift hits
both sides equally.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("ANN_MICRO_ROWS", "1000000"))
DIM = 64
K = 10
N_PLANES = 6


def main() -> None:
    import numpy as np

    from log_project_spark.operators import similarity as sim
    from log_project_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="ann_probe_micro", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    path = os.path.join(REPO, ".cache", f"ann_micro_{N_ROWS}x{DIM}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F

        # deterministic synthetic vectors, generated distributed
        # (xxhash64-seeded uniforms per element, shifted to +-0.5)
        df = spark.range(N_ROWS).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {DIM}),"
                " i -> cast(xxhash64(id * 97 + i) % 100000 as double) / 100000.0)"
            ).alias("embedding"),
        )
        df.repartition(cpus * 4).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)

    rng = np.random.default_rng(20250819)
    q = [float(x) for x in rng.standard_normal(DIM)]

    def probe(impl: str) -> tuple[float, list]:
        t0 = time.perf_counter()
        rows = sim.topk_cosine_lsh(
            emb, q, k=K, n_planes=N_PLANES, bucket_impl=impl
        ).collect()
        return time.perf_counter() - t0, [(r["vec_id"], round(r["cos"], 6)) for r in rows]

    results = {"pandas": [], "expr": []}
    tops = {}
    for impl in ("pandas", "expr"):  # warm-up, untimed
        _, tops[impl] = probe(impl)
    assert tops["pandas"] == tops["expr"], "impl results diverge"
    n_passes = int(os.environ.get("ANN_MICRO_PASSES", "3"))
    for _ in range(n_passes):
        for impl in ("pandas", "expr"):
            wall, _ = probe(impl)
            results[impl].append(round(wall, 3))
            print(f"[ann-micro] {impl}: {wall:.3f}s", file=sys.stderr)

    best = {impl: min(w) for impl, w in results.items()}
    out = {
        "bench": "ann_probe_bucket_impl",
        "rows": N_ROWS,
        "dim": DIM,
        "n_planes": N_PLANES,
        "k": K,
        "cpus": cpus,
        "walls": results,
        "best": best,
        "speedup_pandas_over_expr": round(best["expr"] / best["pandas"], 2),
        "protocol": f"warm-up per impl, then {n_passes} interleaved timed passes, best-of",
        "top_k_equal_across_impls": True,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_probe_micro.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
