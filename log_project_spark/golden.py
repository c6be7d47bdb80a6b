"""Golden value-hash canon (VERDICT r2 #5).

Five gate queries have no DuckDB oracle because their kernels are not
SQL-expressible (isolation forest, hash-embedding transformer, ADWIN,
the integrated transformer kernel, the pipeline summary). They are all
deterministic under their fixed seeds, so their sf0.01 results are
frozen as value hashes in tests/golden_hashes.json; the pytest gate
recomputes and compares, catching kernel drift the SQL oracle cannot
see. scripts/regen_golden_hashes.py rewrites the JSON after an
intentional semantic change.

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
