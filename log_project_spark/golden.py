"""Golden value-hash canon (VERDICT r2 #5; sampling added r5).

Five gate queries have no DuckDB oracle because their kernels are not
SQL-expressible (isolation forest, hash-embedding transformer, ADWIN,
the integrated transformer kernel, the pipeline summary). They are all
deterministic under their fixed seeds, so their sf0.01 results are
frozen as value hashes in tests/golden_hashes.json; the pytest gate
recomputes and compares, catching kernel drift the SQL oracle cannot
see. scripts/regen_golden_hashes.py rewrites the JSON after an
intentional semantic change.

The sampling/data-mixing operators (stratified_sample_k,
token_budget_cap, token_budget_ranked) ARE oracle-checked at sf0.01,
but their bench-profile outputs at sf0.1 were previously unfrozen
(VERDICT r4 next-round #5) — they are pinned here at
/root/testdata/sf0.1 via GOLDEN_SF, so a selection drift at bench
scale fails pytest even though the sf0.01 oracle still passes. The
pytest gate runs at local[4]/shuffle=8 vs the freeze's
local[8]/shuffle=16, so every pin doubles as a partition-invariance
check.

Hash canon (shared by the regen script and the test so they cannot
disagree): sort columns by name, format floats %.10g, sort the
formatted rows, sha256. For pipeline_summary only the deterministic
columns are hashed — the row also carries wall-clock timings and the
git commit.
"""

from __future__ import annotations

import hashlib

# query -> columns to hash (None = all columns)
GOLDEN_TARGETS: dict[str, list[str] | None] = {
    "iforest_scores": None,
    "hash_embed_scores": None,
    "adwin_drift_per_user": None,
    "transformer_calibrate": None,
    "pipeline_summary": [
        "dataset", "mode", "calibration", "seed",
        "events", "anomalies", "drifts", "tpr_at_1pct_fpr",
    ],
    "stratified_sample_k": None,
    "token_budget_cap": None,
    "token_budget_ranked": None,
}

# per-target sf_dir override (default: the regen run's SPARK_GRAFT_SF_DIR,
# normally sf0.01); sampling pins freeze at bench scale
GOLDEN_SF: dict[str, str] = {
    "stratified_sample_k": "/root/testdata/sf0.1",
    "token_budget_cap": "/root/testdata/sf0.1",
    "token_budget_ranked": "/root/testdata/sf0.1",
}


def fmt_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def value_hash(df, cols: list[str] | None) -> tuple[str, int]:
    """Order/partitioning-independent content hash of a small result
    DataFrame (driver-side collect — gate results are <= a few
    thousand rows by construction)."""
    use = sorted(cols) if cols else sorted(df.columns)
    rows = df.select(use).collect()
    lines = sorted("|".join(fmt_value(v) for v in row) for row in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return digest, len(rows)
