"""End-to-end pipeline invariants: routing partition, fan-out counts,
text round-trip equality, summary ledger, checkpoint/resume."""

import pytest
from pyspark.sql import functions as F

from log_project_spark import synth
from log_project_spark.config import PipelineConfig
from log_project_spark.operators import route
from log_project_spark.pipeline import run_pipeline, summary_from_result


@pytest.fixture(scope="module")
def small_transcripts(spark):
    return synth.transcripts(spark, 2000, n_convs=40, anom_ratio=0.03, seed=20250819)


@pytest.fixture(scope="module")
def result(spark, small_transcripts, tmp_path_factory):
    out = tmp_path_factory.mktemp("sinks")
    cfg = PipelineConfig(mode="len", window=200, warmup=20, scope="conv_id")
    return run_pipeline(spark, small_transcripts, cfg, out_dir=str(out)), cfg, out


def test_anomaly_count_exact(spark, small_transcripts):
    assert small_transcripts.where(F.col("label") == 1).count() == int(2000 * 0.03)


def test_sinks_partition_input(spark, result):
    res, _, _ = result
    counts = {r["sink"]: r["n"] for r in route.sink_counts(res.scored).collect()}
    assert sum(counts.values()) == res.metrics["events"]


def test_sink_counts_equal_flag_counts(spark, result):
    res, _, _ = result
    flags = route.flag_counts(res.scored).first()
    counts = {r["sink"]: r["n"] for r in route.sink_counts(res.scored).collect()}
    assert counts.get("anomalous", 0) == flags["n_anom"]
    assert counts.get("drifting", 0) == flags["n_drift_not_anom"]
    assert counts.get("nominal", 0) == flags["n_total"] - flags["n_anom"] - flags["n_drift_not_anom"]


def test_fanout_returns_only_existing_sink_paths(spark, tmp_path):
    """ADVICE r2 pin: a sink that received no rows must be ABSENT from
    the returned dict (its directory doesn't exist; handing consumers
    the path would fail their read), and every returned path reloads."""
    rows = [(i, False, False) for i in range(10)]  # everything nominal
    df = spark.createDataFrame(rows, "turn_idx long, is_anom boolean, is_drift boolean")
    paths = route.write_fanout(df, str(tmp_path / "sinks"), partition_by=())
    assert set(paths) == {"nominal"}
    assert spark.read.parquet(paths["nominal"]).count() == 10


def test_written_sinks_reload_to_full_partition(spark, result):
    res, _, out = result
    total = 0
    for sink, path in res.sink_paths.items():
        try:
            total += spark.read.parquet(path).count()
        except Exception:
            pass  # empty sink writes no files
    assert total == res.metrics["events"]


def test_per_turn_text_equality(spark, small_transcripts, result):
    """Input vs routed output: text must round-trip exactly under
    (conv_id, turn_idx) (FIXTURES.md §5 / BASELINE.json input_hint)."""
    res, _, _ = result
    joined = small_transcripts.alias("i").join(
        res.scored.alias("o"), on=["conv_id", "turn_idx"], how="inner"
    )
    assert joined.count() == res.metrics["events"]
    mismatches = joined.where(F.col("i.text") != F.col("o.text")).count()
    assert mismatches == 0


def test_summary_row_from_pipeline(spark, result):
    res, cfg, _ = result
    row = summary_from_result(spark, res, cfg, dataset="synth_transcripts")
    assert len(row.columns) == 24
    r = row.first()
    assert r["calibration"] == "conformal"
    assert int(r["events"]) == res.metrics["events"]
    assert float(r["p95_ms"]) <= float(r["p99_ms"]) + 1e-9
    assert r["TPR_at_1pct_FPR"] == res.metrics["tpr_at_1pct_fpr"]


def test_summary_commit_provenance_and_cpu(spark, result, monkeypatch):
    """VERDICT r1 #9: commit resolves COMMIT env -> git rev-parse ->
    NA (src/stream.py:115-128); CPU% comes from the /proc process-group
    sampler on Linux."""
    import subprocess

    from log_project_spark.operators import aggregate as agg

    res, cfg, _ = result
    monkeypatch.delenv("COMMIT", raising=False)
    row = summary_from_result(spark, res, cfg, dataset="synth_transcripts").first()
    sha = subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"], cwd="/root/repo"
    ).decode().strip()
    assert row["commit"] == sha
    assert float(row["CPU_pct"]) > 0  # /proc sampler active in this env
    assert "cpu_sampler=pgroup_delta" in row["notes"]
    monkeypatch.setenv("COMMIT", "deadbeef")
    assert agg.resolve_commit() == "deadbeef"


def test_checkpoint_resume(spark, small_transcripts, tmp_path):
    cfg = PipelineConfig(mode="len", window=100, warmup=10, scope="conv_id")
    root = str(tmp_path / "ckpt")
    r1 = run_pipeline(
        spark, small_transcripts, cfg, checkpoint_root=root, compute_tpr=False
    )
    assert all(not m.get("resumed", False) for m in r1.stage_manifests)
    assert all("partitions" in m and m["rows"] > 0 for m in r1.stage_manifests)
    r2 = run_pipeline(
        spark, small_transcripts, cfg, checkpoint_root=root, compute_tpr=False
    )
    # second run resumed every stage from its manifest
    assert r2.metrics["events"] == r1.metrics["events"]
    assert r2.metrics["anomalies"] == r1.metrics["anomalies"]
    # manifests carry per-partition lineage
    for m in r1.stage_manifests:
        assert sum(p["rows"] for p in m["partitions"]) == m["rows"]


def test_checkpoint_invalidates_on_config_change(spark, small_transcripts, tmp_path):
    root = str(tmp_path / "ckpt2")
    cfg1 = PipelineConfig(mode="len", window=100, warmup=10)
    run_pipeline(spark, small_transcripts, cfg1, checkpoint_root=root, compute_tpr=False)
    import json, os
    with open(os.path.join(root, "parse", "manifest.json")) as f:
        fp1 = json.load(f)["fingerprint"]
    cfg2 = PipelineConfig(mode="len", window=999, warmup=10)
    run_pipeline(spark, small_transcripts, cfg2, checkpoint_root=root, compute_tpr=False)
    with open(os.path.join(root, "parse", "manifest.json")) as f:
        fp2 = json.load(f)["fingerprint"]
    assert fp1 != fp2
