"""Golden value-hash gate for the five no-oracle queries (VERDICT r2
#5): iforest_scores, hash_embed_scores, adwin_drift_per_user,
transformer_calibrate, pipeline_summary. Their kernels are not
SQL-expressible, so the driver's DuckDB gate only checks row counts;
this test pins the full sf0.01 result values against frozen hashes
(tests/golden_hashes.json, regenerated via
scripts/regen_golden_hashes.py after intentional semantic changes).
r5 adds bench-scale (sf0.1) pins for the sampling/data-mixing
operators (stratified_sample_k, token_budget_cap,
token_budget_ranked) — oracle-checked at sf0.01, value-frozen at
sf0.1. The session here runs local[4]/shuffle=8 vs the freeze's
local[8]/shuffle=16, so each pin is also a partition-invariance
check. Canon shared with the regen script via
log_project_spark.golden."""

import json
import os

import pytest

from log_project_spark.golden import GOLDEN_TARGETS, value_hash

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_PATH = os.path.join(HERE, "golden_hashes.json")

with open(GOLDEN_PATH) as f:
    GOLDEN = json.load(f)


def test_golden_covers_all_targets():
    assert set(GOLDEN) == set(GOLDEN_TARGETS)


@pytest.mark.parametrize("name", sorted(GOLDEN_TARGETS))
def test_golden_hash(spark, name):
    import __spark_entry__ as entry_mod

    entry = GOLDEN[name]
    sf_dir = entry["sf_dir"]
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    df = entry_mod.queries()[name](spark, sf_dir)
    digest, n_rows = value_hash(df, GOLDEN_TARGETS[name])
    assert n_rows == entry["rows"], f"{name}: row count drifted"
    assert digest == entry["sha256"], (
        f"{name}: value hash drifted from golden — if the kernel change is "
        "intentional, rerun scripts/regen_golden_hashes.py"
    )
