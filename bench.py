#!/usr/bin/env python3
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <sec>, "unit": "sec", "queries": {...},
   "sf": ..., "pipeline": {...}, "scaling": {...}, "routed": {...},
   "skew": {...}, "deltas_vs_prev": {...}}

Four parts:

1. Headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].
2. The north-rule scaling benchmark: the full transcripts pipeline
   (parse -> enrich -> score -> calibrate -> route counts) over a
   deterministic synthetic transcripts table, run at local[N] and
   local[4N] on IDENTICAL parquet input, reporting turns/sec at both
   plus scaling efficiency and per-sink aggregate-count equality.
3. The ROUTED variant (VERDICT r1 #8): 4096-turn conversations with a
   mid-conversation template shift (drift injection) and warmup=20, so
   the anomalous AND drifting sinks are non-empty; the timed pass
   WRITES the single-pass sink=.../dt=... fan-out and counts rows from
   the files it wrote.
4. The SKEW-STRESS leg (VERDICT r2 #7): 30% of all rows on ONE hot
   conv_id; the job is parse -> salted two-phase per-conv aggregate
   (the north-rule skew story), with per-stage task-time straggle
   ratios captured from the Spark UI REST API.

Interleaved scaling protocol (VERDICT r2 #1): both parallelism levels
run as PERSISTENT child processes (own JVM each, 2 warm-up passes
before any timing — walls keep dropping through pass 2-3 at the
8-core level), then the parent alternates timed passes big/small,
big/small, ... for K pairs, so slow host drift hits both levels
equally. scaling_efficiency = ratio of BEST walls (noise on this host
is strictly additive — a pass can never beat the true job time — so
each level's min wall across K passes converges to its true wall);
the median of per-pair efficiencies ships alongside as a load
indicator (it collapses when >= half the pairs are noise-hit, which
measured captures show on loaded nights). All raw walls are in the
JSON — BENCH/BASELINE.md quotes committed captures only.

Round-over-round: if BENCH_r*.json files exist at the repo root, the
latest one's per-query timings are diffed into "deltas_vs_prev"
(VERDICT r1 #10).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
BENCH_PIPELINE_ROWS (default 16_000_000), BENCH_ROUTED_ROWS (default
8_000_000), BENCH_SKEW_ROWS (default 8_000_000), BENCH_SCALE_N
(default 2), BENCH_PAIRS_MAIN (default 5), BENCH_PAIRS_ROUTED
(default 5), BENCH_PAIRS_SKEW (default 3), BENCH_SKIP_SCALING=1,
BENCH_SKIP_ROUTED=1, BENCH_SKIP_SKEW=1, BENCH_SKIP_HEADLINE=1
(legs-only capture, e.g. the sf1 scaling-evidence run),
BENCH_PASS_TIMEOUT (default 900s
per timed pass; a wedged pass truncates the leg, keeping finished
pairs), BENCH_READY_TIMEOUT (default 2700s for warm-up+generation),
BENCH_RESUME=1 (preload completed pairs from a killed incarnation's
scaling_progress_{tag}.json — same leg/rows/levels only; the new
incarnation still re-warms before its first timed pass).
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
    "sessionize_events",
    "tumbling_event_counts",
    "approx_percentiles_global",
    "stratified_sample_k",
    "token_budget_cap",
]
# corpus_curation and near_dup_components are iterative multi-action
# queries covered by the correctness gate; they would distort the
# sum-of-single-plan-walls headline metric.

# generation/pipeline profiles for the scaling variants
MAIN_PROFILE = dict(
    conv_len=50, warmup=200, window=5000, drift_convs_mod=0, drift_from=0,
    hot_frac=0.10, n_hot_convs=4, write_sinks=False,
    # One file = one task (see _write_input): open_cost_mb >=
    # split_mb makes every row-uniform generated file its own scan
    # split. Byte-balanced packing (the default) under-parallelizes
    # here because compression ratios differ 3x between the hot
    # conversation blobs (~30 B/row) and template files (~10 B/row),
    # so equal-byte splits carry wildly unequal ROW counts — and task
    # cost is per-row. split_mb stays above the largest file so no
    # split ever bisects a file (the clustered-kernel contract).
    split_mb=256, open_cost_mb=256,
)
ROUTED_PROFILE = dict(
    conv_len=4096, warmup=20, window=200, drift_convs_mod=4, drift_from=2048,
    hot_frac=0.0, n_hot_convs=1, write_sinks=True,
    split_mb=256, open_cost_mb=256,  # one file = one task, as in MAIN
)
# 30% of all rows on ONE conv_id; the job under test is parse ->
# salted two-phase per-conv aggregate. Two skew mechanisms are
# exercised: (a) reduce-side — a plain groupBy(conv_id) would send 30%
# of the table through one reducer; the salted two-phase agg splits
# the hot key across 32 buckets; (b) scan-side — the conv_id-clustered
# layout puts the hot conversation in ONE file (69 MB vs 1.2 MB
# siblings at 8M rows). Measured failure modes on the way here: at the
# default 128 MB maxPartitionBytes that file is a single split (one
# map task parses 2.4M rows, max task == the whole local[8] wall); and
# with split_mb alone the file is still ONE parquet row group, which
# splits cannot subdivide, so the straggler survives (ratio 28x).
# Hence BOTH knobs: row_group_mb bounds row groups at write time
# (every production table does — it is what keeps a hot partition
# divisible at 100 TB), and split_mb sizes the read splits so the
# 8M-row repro fans the hot file across tasks the way 128 MB splits
# would fan a multi-GB hot partition in production.
SKEW_PROFILE = dict(
    conv_len=50, warmup=200, window=5000, drift_convs_mod=0, drift_from=0,
    hot_frac=0.30, n_hot_convs=1, write_sinks=False,
    skew_agg=True, capture_stages=True, split_mb=4, row_group_mb=4,
)


def run_headline(sf_dir: str, cpus: int) -> tuple[dict, dict]:
    """Per-query single-plan walls. One untimed warm-up action first
    (JVM JIT, codegen, parquet footer cache) so the first query's wall
    measures its plan, not session startup; then best-of-K per query
    (K = BENCH_HEADLINE_PASSES, default 3 — CLAUDE.md K>=3 rule) with every wall recorded —
    the shared host varies up to 3x on identical passes, so
    round-over-round deltas on single-shot walls were pure noise."""
    import __spark_entry__ as entry_mod
    from log_project_spark.session import get_spark

    spark = get_spark(
        app_name="bench_headline", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16)
    )
    queries = entry_mod.queries()
    n_passes = int(os.environ.get("BENCH_HEADLINE_PASSES", "3"))
    # warm-up: scan+aggregate over the main input to exercise codegen,
    # shuffle machinery and the Python worker pool, untimed
    from pyspark.sql import functions as F

    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy(F.crc32(F.col("text").cast("binary")) % 7).count().collect()
    timings: dict[str, float] = {}
    all_walls: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = queries[name]
        walls = []
        for _ in range(n_passes):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            walls.append(round(time.perf_counter() - t0, 4))
        timings[name] = min(walls)
        all_walls[name] = walls
        print(f"[bench] {name}: {n} rows, walls {walls}", file=sys.stderr)
    spark.stop()
    return timings, all_walls


def _write_input(spark, rows: int, profile: dict, input_path: str) -> None:
    """Clustered layout: RANGE-distributed by conv_id, sorted by
    (conv_id, turn_idx) within files — the write-distribution a
    maintained Iceberg table would have. Files stay well under
    maxPartitionBytes so read splits never bisect a file.

    ROW-uniform files, range-placed over a HASHED key: the files are
    the scheduling quanta (open_cost_mb makes one file = one task), so
    they must be balanced in ROWS — task cost is per-row, and byte
    balance lies when compression ratios differ (a hot 4M-row
    conversation blob compresses at ~30 B/row vs ~10 B/row for
    template files, measured at 160M rows). ~2.5M rows per file keeps
    the widest bench level (8 slots) at >= 8 whole waves from 64
    files. Hashed-range placement because the alternatives both
    failed measurement: plain hash collided 2-3 hot conversations
    into single 89-126 MB files (birthday chance), and plain range on
    conv_id re-clustered them (synth assigns hot ids adjacently);
    ranging on xxhash64(conv_id) spreads them uniformly while the
    row-sampled boundaries give every hot conversation its own file.
    Each conversation stays contiguous in exactly one file — the
    clustered-kernel contract — and split_mb sits far above the
    largest file so a split never bisects one. Same discipline a
    100 TB table needs: work-uniform data files as the unit of both
    clustering and scheduling."""
    from pyspark.sql import functions as F

    from log_project_spark import synth

    n_files = max(64, -(-(rows // 2_500_000) // 16) * 16)
    writer = (
        synth.transcripts(
            spark, rows, n_convs=max(rows // profile["conv_len"], 1), anom_ratio=0.03,
            seed=20250819, hot_frac=profile["hot_frac"],
            n_hot_convs=profile["n_hot_convs"],
            drift_convs_mod=profile["drift_convs_mod"],
            drift_from=profile["drift_from"],
        )
        .withColumn("__place", F.xxhash64("conv_id"))
        .repartitionByRange(n_files, "__place")
        .sortWithinPartitions("conv_id", "turn_idx")
        .drop("__place")
        .write.mode("overwrite")
    )
    if profile.get("row_group_mb"):
        # bound parquet row-group size: scan splits can only divide a
        # file at row-group boundaries, so a hot clustered file written
        # as ONE huge row group defeats split-based parallelism no
        # matter how small maxPartitionBytes is (see SKEW_PROFILE)
        writer = writer.option(
            "parquet.block.size", int(profile["row_group_mb"]) * 1024 * 1024
        )
    writer.parquet(input_path)


def _ui_completed_stages(ui_url: str) -> dict[tuple[int, int], int]:
    """(stageId, attemptId) -> numCompleteTasks for completed stages,
    via the Spark UI REST API (localhost)."""
    import urllib.request

    with urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=10) as r:
        apps = json.loads(r.read())
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
    ) as r:
        stages = json.loads(r.read())
    return {
        (s["stageId"], s["attemptId"]): s.get("numCompleteTasks", 0) for s in stages
    }


def _ui_straggle(ui_url: str, new_stages: dict, min_tasks: int = 8) -> dict:
    """Worst max/median task-duration ratio among the given stages with
    >= min_tasks tasks (tiny stages make the ratio meaningless)."""
    import urllib.request

    with urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=10) as r:
        app_id = json.loads(r.read())[0]["id"]
    worst = {"ratio": 0.0, "stage": None, "median_ms": None, "max_ms": None}
    for (sid, att), n_tasks in new_stages.items():
        if n_tasks < min_tasks:
            continue
        url = (
            f"{ui_url}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
            "taskSummary?quantiles=0.0,0.5,1.0"
        )
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                summ = json.loads(r.read())
        except Exception:
            continue
        lo, med, hi = summ["duration"]
        if med > 0 and hi / med > worst["ratio"]:
            worst = {
                "ratio": round(hi / med, 2),
                "stage": sid,
                "median_ms": med,
                "max_ms": hi,
                "n_tasks": n_tasks,
            }
    return worst


def _resolve_warm_input(input_path: str) -> str:
    """Alternate input for the UNTIMED warm-up passes only, via
    BENCH_WARM_INPUT. Used by the sf1 legs: a full-size warm at
    local[2] over 160M rows exceeds the sandbox's process-kill
    windows, so each resumed incarnation would die mid-warm and the
    leg could never record a pair. Must point at an already-generated
    cached input (same writer, same layout) — silently ignored
    otherwise so a typo degrades to the safe full-size warm."""
    warm = os.environ.get("BENCH_WARM_INPUT", "")
    if warm and os.path.exists(os.path.join(warm, "_SUCCESS")):
        return warm
    return input_path


def pipeline_server(cpus: int, rows: int, input_path: str, profile: dict) -> None:
    """Persistent child: build the session, run one warm-up pass, then
    answer PASS commands on stdin with one timed pass each (protocol
    lines on stdout are prefixed @@; Spark chatter goes to stderr)."""
    from pyspark.sql import functions as F

    from log_project_spark import synth
    from log_project_spark.config import PipelineConfig
    from log_project_spark.operators import aggregate as agg_ops
    from log_project_spark.operators import enrich as enrich_ops
    from log_project_spark.operators import route as route_ops
    from log_project_spark.operators import scoring
    from log_project_spark.operators.calibrate import calibrate
    from log_project_spark.pipeline import parse_stage
    from log_project_spark.session import get_spark

    capture = bool(profile.get("capture_stages"))
    conf: dict[str, str] = {}
    if capture:
        conf["spark.ui.enabled"] = "true"
    if profile.get("split_mb"):
        # scan-side skew relief: cap split size so a hot clustered
        # FILE fans out across map tasks (see SKEW_PROFILE comment)
        conf["spark.sql.files.maxPartitionBytes"] = f"{int(profile['split_mb'])}m"
    if profile.get("open_cost_mb"):
        # one file = one task (MAIN/ROUTED): with openCostInBytes >=
        # maxPartitionBytes the packer closes every split after a
        # single file, so the generated row-uniform files are the
        # scheduling quanta; Spark builds file partitions largest-
        # first, so the heavy hot-conversation blobs launch in wave 1
        conf["spark.sql.files.openCostInBytes"] = f"{int(profile['open_cost_mb'])}m"
    spark = get_spark(
        app_name=f"bench_pipeline_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=conf or None,
    )
    ui_url = spark.sparkContext.uiWebUrl if capture else None

    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        _write_input(spark, rows, profile, input_path)

    cfg = PipelineConfig(
        mode="baseline", scope="conv_id",
        window=profile["window"], warmup=profile["warmup"],
    )

    def skew_pass(path: str = input_path) -> dict:
        """Skew leg: parse -> salted two-phase per-conv aggregate over
        the 30%-hot table; cross-level equality is checked on the full
        aggregate result via an order-independent checksum. The
        aggregate sums PARSED columns (token count, normalized-text
        length) so Catalyst cannot column-prune the parse out of the
        plan — aggregating only raw columns turned the leg into a thin
        scan that never exercised the CPU-bound stage it claims to
        measure (observed: local[2] within 1.5x of local[8])."""
        df = spark.read.parquet(path)
        pre_stages = _ui_completed_stages(ui_url) if capture else {}
        t0 = time.perf_counter()
        parsed = parse_stage(df).select(
            "conv_id",
            "turn_idx",
            F.size("tokens").alias("n_tokens"),
            F.length("norm_text").alias("norm_len"),
        )
        per_conv = agg_ops.salted_agg(
            parsed, ["conv_id"], ["turn_idx", "n_tokens", "norm_len"],
            salt_col="turn_idx", buckets=32,
        )
        summ = per_conv.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n").alias("rows"),
            # XOR, not sum: order-independent AND overflow-free under
            # ANSI mode (summing 8M xxhash64 values overflows long)
            F.bit_xor(
                F.xxhash64(
                    "conv_id", "n", "sum_turn_idx", "sum_n_tokens", "sum_norm_len"
                )
            ).alias("checksum"),
        ).first()
        wall = time.perf_counter() - t0
        out = {
            "cpus": cpus,
            "wall_sec": round(wall, 3),
            "rows": int(summ["rows"]),
            "turns_per_sec": round(int(summ["rows"]) / wall, 1),
            "sink_counts": {
                "n_groups": int(summ["n_groups"]),
                "rows": int(summ["rows"]),
                "checksum": int(summ["checksum"]),
            },
        }
        if capture:
            post = _ui_completed_stages(ui_url)
            new = {k: v for k, v in post.items() if k not in pre_stages}
            out["straggle"] = _ui_straggle(ui_url, new)
        return out

    def pipeline_pass(path: str = input_path) -> dict:
        sink_dir = f"{path}.sinks.{cpus}"
        if profile["write_sinks"]:
            # harness bookkeeping, untimed: clear the previous pass's
            # fan-out output so the timed overwrite never pays the
            # recursive delete of a prior benchmark iteration (a
            # production job writes to a fresh partition path)
            import shutil

            shutil.rmtree(sink_dir, ignore_errors=True)
        df = spark.read.parquet(path)
        t0 = time.perf_counter()
        parsed = parse_stage(df)
        enriched = enrich_ops.enrich_roles_tools(
            parsed, synth.role_dim(spark), synth.tool_dim(spark)
        )
        model = scoring.fit_baseline_model(
            enriched, cfg, cache_path=f"{path}.model.pkl"
        )
        scored = calibrate(
            enriched.drop("tokens"),
            cfg,
            num_partitions=cpus,
            batch_score_fn=scoring.make_broadcast_scorer(model),
            batch_score_input="norm_text",
            layout="clustered",  # input written conv_id-clustered above
            # Projection pushdown through the UDF boundary: the main
            # leg consumes only sink counts downstream, so dead
            # passthrough columns (text, ts, enrich attrs) must not
            # ride the Arrow socket both ways — Catalyst cannot prune
            # through mapInArrow, the operator does it declaratively.
            # The routed leg keeps full width: its fan-out sinks
            # persist whole rows, so every column is genuinely needed.
            needed_cols=None if profile["write_sinks"] else (),
        )
        if profile["write_sinks"]:
            # the timed pass INCLUDES the single-pass fan-out write;
            # per-sink counts ride the SAME action as observed metrics
            # (no read-back scan). Written files are verified against
            # the observed counts once, untimed, after warm-up.
            from pyspark.sql import Observation

            obs = Observation()
            # two write waves per core: the kernel+write pipeline runs
            # at 2*cpus tasks so one noise-hit task costs half a wave,
            # not a whole one (coalesce merges whole hash-disjoint
            # sorted files, so group contiguity for the clustered
            # kernel is intact), and the commit still handles only
            # 2*cpus*|sinks|*|dt| files
            scored = scored.coalesce(2 * cpus)
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

    one_pass = skew_pass if profile.get("skew_agg") else pipeline_pass

    # Warm-up (JIT, codegen, python daemons, model cache). Two passes
    # by default: measured walls kept dropping through the first 2-3
    # passes at the 8-core level (45.7 -> 43.7 -> 37.0 s on the main
    # leg) — one pass compiles, the second settles the JIT tiers.
    # BENCH_WARM_INPUT (sf1 resume protocol): warm on a smaller cached
    # input — everything the warm exists for (JIT tiers, codegen
    # caches, Python daemons, model/broadcast load) is row-count
    # independent, while a full-size warm pass at local[2]/160M rows
    # is ~30 min, longer than the sandbox's observed kill windows, so
    # an incarnation could die warming forever. Timed passes always
    # run on the full input; the first timed pair additionally pays
    # the (level-shared) page-cache fill, which the min-walls
    # selection rule absorbs.
    warm_path = _resolve_warm_input(input_path)
    for _ in range(int(os.environ.get("BENCH_WARMUP_PASSES", "2")) - 1):
        one_pass(warm_path)
    warm = one_pass(warm_path)
    if profile["write_sinks"]:
        # one untimed verification: files on disk == observed counts
        written = spark.read.parquet(f"{warm_path}.sinks.{cpus}")
        on_disk = {
            r["sink"]: r["n"]
            for r in written.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert on_disk == warm["sink_counts"], (on_disk, warm["sink_counts"])
    print("@@READY " + json.dumps(warm), flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "PASS":
            print("@@RESULT " + json.dumps(one_pass()), flush=True)
        elif cmd == "EXIT":
            break
    spark.stop()


def _generate_input(rows: int, profile: dict, input_path: str) -> None:
    from log_project_spark.session import get_spark

    spark = get_spark(app_name="bench_gen", master="local[24]", shuffle_partitions=64)
    _write_input(spark, rows, profile, input_path)
    spark.stop()


class PassTimeout(RuntimeError):
    """A server pass exceeded the watchdog (observed failure mode: a
    local-mode task wedges at (N-1)/N with the box idle — Spark has no
    default task timeout, so without a watchdog the whole bench hangs
    forever and the round records NO capture)."""


class _Server:
    """Handle on a persistent pipeline_server child. Lines are drained
    by a dedicated reader thread into a queue — select() on the raw fd
    would race the TextIOWrapper's buffer (a marker line already
    buffered behind a stray line is invisible to select and would fire
    a spurious watchdog timeout)."""

    def __init__(self, cpus: int, rows: int, input_path: str, profile: dict):
        import queue
        import threading

        self.cpus = cpus
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--pipeline-server",
             str(cpus), str(rows), input_path, json.dumps(profile)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, cwd=REPO,
        )
        self._lines: queue.Queue[str | None] = queue.Queue()

        def _drain(stdout, q):
            for line in stdout:
                q.put(line)
            q.put(None)  # EOF sentinel

        self._reader = threading.Thread(
            target=_drain, args=(self.proc.stdout, self._lines), daemon=True
        )
        self._reader.start()

    def _read(self, marker: str, timeout_s: float | None = None) -> dict:
        import queue

        deadline = time.monotonic() + timeout_s if timeout_s else None
        while True:
            remaining = deadline - time.monotonic() if deadline is not None else None
            if remaining is not None and remaining <= 0:
                raise PassTimeout(
                    f"local[{self.cpus}] pass exceeded {timeout_s:.0f}s watchdog"
                )
            try:
                line = self._lines.get(timeout=remaining)
            except queue.Empty:
                raise PassTimeout(
                    f"local[{self.cpus}] pass exceeded {timeout_s:.0f}s watchdog"
                ) from None
            if line is None:
                raise RuntimeError(
                    f"pipeline server local[{self.cpus}] exited "
                    f"(rc={self.proc.poll()})"
                )
            if line.startswith(marker):
                return json.loads(line[len(marker):])

    def wait_ready(self) -> dict:
        # warm-ups include possible input/model generation, so the
        # ready watchdog is generous — but not absent: the wedged-task
        # failure mode can strike a warm-up pass just as well as a
        # timed one, and an unguarded readline would hang the whole
        # capture forever
        timeout_s = float(os.environ.get("BENCH_READY_TIMEOUT", "2700"))
        return self._read("@@READY ", timeout_s=timeout_s)

    def timed_pass(self) -> dict:
        self.proc.stdin.write("PASS\n")
        self.proc.stdin.flush()
        timeout_s = float(os.environ.get("BENCH_PASS_TIMEOUT", "900"))
        return self._read("@@RESULT ", timeout_s=timeout_s)

    def close(self) -> None:
        try:
            self.proc.stdin.write("EXIT\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()


def run_scaling(rows: int, profile: dict, tag: str, pairs: int) -> dict:
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

    # Interleaved protocol (VERDICT r2 #1): both servers stay alive for
    # the whole leg and warm up CONCURRENTLY (warm-ups are untimed, so
    # contention between them is harmless; overlapping them also keeps
    # the big JVM from sitting idle for minutes — an idle JVM's first
    # task after the gap measured 26 s vs a 1.8 s median as pages /
    # JIT state cooled). Timed passes then alternate big,small |
    # big,small | ... so host drift lands on both levels. While one
    # level runs, the other's JVM is idle on a blocking stdin read.
    big = _Server(big_cpus, rows, input_path, profile)
    small = _Server(small_cpus, rows, input_path, profile)
    pair_results = []
    resumed = 0
    timed_out = False
    # Incremental evidence file: the sandbox host is restarted out from
    # under long runs (~50-min windows observed), and a killed parent
    # loses everything buffered in memory. Flush the leg state to disk
    # after EVERY completed step so a truncated run still leaves a
    # verifiable partial capture (warm walls + each finished pair).
    progress_path = os.path.join(REPO, "BENCH", f"scaling_progress_{tag}.json")

    # BENCH_RESUME=1: preload pairs a killed earlier incarnation of the
    # SAME leg (tag+rows+levels must match) already completed. The
    # sandbox kills long processes out from under us; each pair at sf1
    # is ~25 min of wall, so losing finished pairs to a kill would make
    # the 3-pair leg unfinishable. Resumed pairs ran the same code on
    # the same cached input under the same interleaved protocol — only
    # the JVM incarnation differs, and every incarnation re-warms
    # before its first timed pass. The output records pairs_resumed.
    if os.environ.get("BENCH_RESUME", "") == "1" and os.path.exists(progress_path):
        try:
            with open(progress_path) as f:
                prev = json.load(f)
            if (prev.get("tag") == tag and prev.get("rows") == rows
                    and prev.get("n_small") == small_cpus
                    and prev.get("n_big") == big_cpus):
                pair_results = list(prev.get("pair_results") or [])
                resumed = len(pair_results)
                if resumed:
                    print(f"[bench] {tag}: resuming with {resumed} pair(s) "
                          f"from a prior incarnation", file=sys.stderr)
        except Exception:
            pass

    def _flush_progress(stage: str, warm: dict | None = None) -> None:
        os.makedirs(os.path.dirname(progress_path), exist_ok=True)
        with open(progress_path, "w") as f:
            json.dump(
                {
                    "tag": tag,
                    "rows": rows,
                    "n_small": small_cpus,
                    "n_big": big_cpus,
                    "pairs_planned": pairs,
                    "stage": stage,
                    "warm": warm,
                    "pair_results": pair_results,
                },
                f,
                indent=1,
            )

    try:
        _flush_progress("warming")
        warm_big = big.wait_ready()
        warm_small = small.wait_ready()
        _flush_progress("warmed", {"big": warm_big, "small": warm_small})
        for i in range(resumed, pairs):
            b = big.timed_pass()
            s = small.timed_pass()
            eff_i = b["turns_per_sec"] / (4.0 * s["turns_per_sec"])
            pair_results.append({"big": b, "small": s, "eff": round(eff_i, 3)})
            _flush_progress(f"pair {i + 1}/{pairs} done",
                            {"big": warm_big, "small": warm_small})
            print(
                f"[bench] {tag} pair {i + 1}/{pairs}: big {b['wall_sec']}s, "
                f"small {s['wall_sec']}s, eff {eff_i:.3f}",
                file=sys.stderr,
            )
    except PassTimeout as e:
        # a wedged task would otherwise hang the whole bench forever;
        # keep the completed pairs, kill both servers, report honestly
        timed_out = True
        print(f"[bench] {tag}: {e} — leg truncated after "
              f"{len(pair_results)}/{pairs} pairs", file=sys.stderr)
        big.proc.kill()
        small.proc.kill()
        if not pair_results:
            raise
    finally:
        big.close()
        small.close()

    bigs = [p["big"] for p in pair_results]
    smalls = [p["small"] for p in pair_results]
    best_big = min(bigs, key=lambda p: p["wall_sec"])
    best_small = min(smalls, key=lambda p: p["wall_sec"])
    effs = sorted(p["eff"] for p in pair_results)
    eff_median = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    counts_equal = all(
        p["big"]["sink_counts"] == p["small"]["sink_counts"] for p in pair_results
    )
    out = {
        "rows": rows,
        "n_small": small_cpus,
        "n_big": big_cpus,
        "pairs": pairs,
        "turns_per_sec_small": best_small["turns_per_sec"],
        "turns_per_sec_big": best_big["turns_per_sec"],
        # Selection rule: ratio of BEST walls. Host noise is strictly
        # additive (a wall can never beat the true job time), so each
        # level's min wall across the K interleaved passes is its
        # converging estimate of the true wall, and their ratio
        # estimates the true efficiency. The median of per-pair
        # efficiencies is reported alongside: it degrades whenever
        # >= half the pairs are noise-hit (measured captures on loaded
        # nights: median 0.55-0.75 while min-walls held 0.88-0.99 and
        # one pair's big wall was 9x its neighbors), so it serves as
        # the load indicator, not the contract statistic.
        "scaling_efficiency": round(
            best_big["turns_per_sec"] / (4.0 * best_small["turns_per_sec"]), 3
        ),
        "eff_best_walls": round(
            best_big["turns_per_sec"] / (4.0 * best_small["turns_per_sec"]), 3
        ),
        "pair_efficiencies": [p["eff"] for p in pair_results],
        "eff_min": effs[0],
        "eff_median": eff_median,
        "eff_max": effs[-1],
        "sink_counts_equal": counts_equal,
        "sink_counts": best_big["sink_counts"],
        "walls_small": [p["wall_sec"] for p in smalls],
        "walls_big": [p["wall_sec"] for p in bigs],
        "timed_out": timed_out,
        "pairs_resumed": resumed,
        "protocol": "interleaved big/small pairs, persistent JVMs, 2 warm-up "
        "passes/level; eff = best_big/(4*best_small) (min wall per level = "
        "converging estimate under additive noise); median of per-pair "
        "efficiencies alongside as the load indicator",
    }
    if any("straggle" in p for p in bigs + smalls):
        out["straggle_big"] = max(
            (p.get("straggle", {}) for p in bigs),
            key=lambda s: s.get("ratio", 0.0),
        )
        out["straggle_small"] = max(
            (p.get("straggle", {}) for p in smalls),
            key=lambda s: s.get("ratio", 0.0),
        )
    return out


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


def _leg_summary(leg: dict) -> dict:
    if not leg:
        return {}
    if "error" in leg:
        return {"error": leg["error"][:200]}
    s = {
        "eff_best_walls": leg.get("eff_best_walls"),
        "eff_median": leg.get("eff_median"),
        "turns_per_sec_big": leg.get("turns_per_sec_big"),
        "sink_counts_equal": leg.get("sink_counts_equal"),
        "timed_out": leg.get("timed_out"),
    }
    if "all_sinks_nonzero" in leg:
        s["all_sinks_nonzero"] = leg["all_sinks_nonzero"]
    if "straggle_big" in leg:
        s["straggle_ratio_big"] = leg["straggle_big"].get("ratio")
    return s


def compact_summary(out: dict) -> dict:
    """The one-line stdout record: everything the driver's ~2 KB tail
    must carry (headline timings + per-leg eff) plus a pointer to the
    full JSON. Size-bounded by construction — tests assert a maximal
    instance stays under the tail budget."""
    return {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": {k: round(v, 3) for k, v in out["queries"].items()},
        "sf": out["sf"],
        "pipeline": out.get("pipeline", {}),
        "legs": {
            "main": _leg_summary(out.get("scaling", {})),
            "routed": _leg_summary(out.get("routed", {})),
            "skew": _leg_summary(out.get("skew", {})),
        },
        "full_result": "BENCH/latest_result.json",
    }


def _pairs(which: str, default: int) -> int:
    if os.environ.get("BENCH_PAIRS"):
        return int(os.environ["BENCH_PAIRS"])
    return int(os.environ.get(f"BENCH_PAIRS_{which}", str(default)))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-server":
        profile = json.loads(sys.argv[5]) if len(sys.argv) > 5 else MAIN_PROFILE
        pipeline_server(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], profile)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("BENCH_PIPELINE_ROWS", "16000000"))
    routed_rows = int(os.environ.get("BENCH_ROUTED_ROWS", "8000000"))
    skew_rows = int(os.environ.get("BENCH_SKEW_ROWS", "8000000"))

    if os.environ.get("BENCH_SKIP_HEADLINE", "") != "1":
        timings, headline_walls = run_headline(sf_dir, cpus)
    else:
        # legs-only capture (e.g. the sf1 scaling-evidence run): the
        # headline suite is covered by the standard per-round capture
        timings, headline_walls = {}, {}

    def _leg(tag: str, fn) -> dict:
        """A leg that dies (wedged warm-up, server crash) must not
        discard the headline timings and the other legs — record the
        error in the capture and move on."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — capture must survive
            print(f"[bench] {tag} leg failed: {e}", file=sys.stderr)
            return {"error": f"{type(e).__name__}: {e}"}

    scaling: dict = {}
    pipeline: dict = {}
    routed: dict = {}
    skew: dict = {}
    if os.environ.get("BENCH_SKIP_SCALING", "") != "1":
        scaling = _leg(
            "main", lambda: run_scaling(rows, MAIN_PROFILE, "main", _pairs("MAIN", 5))
        )
        if "error" not in scaling:
            pipeline = {
                "rows": scaling["rows"],
                "turns_per_sec": scaling["turns_per_sec_big"],
            }
    if os.environ.get("BENCH_SKIP_ROUTED", "") != "1":
        routed = _leg(
            "routed",
            lambda: run_scaling(routed_rows, ROUTED_PROFILE, "routed", _pairs("ROUTED", 5)),
        )
        if "error" not in routed:
            routed["all_sinks_nonzero"] = all(
                routed["sink_counts"].get(s, 0) > 0
                for s in ("anomalous", "drifting", "nominal")
            )
    if os.environ.get("BENCH_SKIP_SKEW", "") != "1":
        skew = _leg(
            "skew", lambda: run_scaling(skew_rows, SKEW_PROFILE, "skew", _pairs("SKEW", 3))
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
        "headline_walls": headline_walls,
        "headline_protocol": "untimed warm-up action, then best-of-"
        f"{os.environ.get('BENCH_HEADLINE_PASSES', '3')} per query (all walls above)",
        "sf": sf_val,
        "pipeline": pipeline,
        "scaling": scaling,
        "routed": routed,
        "skew": skew,
        "deltas_vs_prev": deltas,
    }
    # The full result object is written to a file as the LAST act
    # (VERDICT r3 #2: the driver's stdout capture keeps only a ~2000-char
    # tail, which truncated round 3's record mid-field); stdout gets one
    # COMPACT JSON line that fits the tail budget and points at the file.
    full_path = os.path.join(REPO, "BENCH", "latest_result.json")
    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(compact_summary(out)))


if __name__ == "__main__":
    main()
