"""Run-level aggregates, exact percentiles, salted group-bys, and the
24-column summary ledger (SURVEY.md A1-A8, S5, O2/O8).

The reference's percentile/TPR formulas are EXACT lower-index picks
over sorted samples — Spark's interpolating `percentile` and sketchy
`percentile_approx` do NOT match; both reference formulas are
reproduced index-for-index here. Three distinct quantile index
formulas coexist by contract (SURVEY.md §7 hard part c):

    conformal (C2):  k = max(1, int(round_half_even((1-a)*n))), pick k-th smallest
    fixed/no-calib (C6) and percentile/TPR (A1/A3):
                     k = int(q*(n-1)), pick (k+1)-th smallest
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact lower-index percentile (A1, /root/reference/src/stream.py:138-143)
# ---------------------------------------------------------------------------

def exact_percentile_col(values: Column, p: float) -> Column:
    """Aggregate expression: k = int((p/100)*(n-1)) over the sorted
    collected values. collect_list bounds memory by group size — fine
    for run-level metric samples; use exact_percentile_distributed for
    billion-row columns."""
    arr = F.sort_array(F.collect_list(values))
    n = F.size(arr)
    k = F.floor((F.lit(p) / F.lit(100.0)) * (n - F.lit(1)).cast("double")).cast("int")
    k = F.greatest(F.lit(0), F.least(k, n - F.lit(1)))
    return F.element_at(arr, k + F.lit(1))


def exact_percentile_distributed(df: DataFrame, col: str, ps: list[float]) -> dict[float, float]:
    """Exact lower-index percentiles without collecting the column:
    distributed sort + zipWithIndex, then pick the k-th rows. One job
    per call, any scale."""
    n = df.where(F.col(col).isNotNull()).count()
    if n == 0:
        return {p: float("nan") for p in ps}
    wanted = {p: min(max(int((p / 100.0) * (n - 1)), 0), n - 1) for p in ps}
    targets = set(wanted.values())
    rows = (
        df.where(F.col(col).isNotNull())
        .select(col)
        .orderBy(col)
        .rdd.zipWithIndex()
        .filter(lambda t: t[1] in targets)
        .collect()
    )
    by_idx = {idx: row[0] for row, idx in rows}
    return {p: float(by_idx[k]) for p, k in wanted.items()}


# ---------------------------------------------------------------------------
# TPR @ target FPR (A3, src/stream.py:146-158)
# ---------------------------------------------------------------------------

def tpr_at_fpr(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    target_fpr: float = 0.01,
) -> tuple[float, float]:
    """Threshold = exact (1-fpr) lower-index quantile of NEGATIVE
    scores; TPR = fraction of positives with score >= thr (note >=,
    vs the strict > of the streaming anomaly decision)."""
    neg = scored.where(F.col(label_col) == 0)
    pos = scored.where(F.col(label_col) == 1)
    n_neg = neg.count()
    n_pos = pos.count()
    if n_neg == 0 or n_pos == 0:
        return float("nan"), float("nan")
    q = exact_percentile_distributed(neg, score_col, [(1.0 - target_fpr) * 100.0])
    thr = q[(1.0 - target_fpr) * 100.0]
    tpr_row = pos.agg(F.avg((F.col(score_col) >= F.lit(thr)).cast("double")).alias("tpr")).first()
    return float(tpr_row["tpr"]), thr


def tpr_at_fpr_df(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    target_fpr: float = 0.01,
) -> DataFrame:
    """Single-plan DataFrame variant (SQL-expressible, oracle-checkable):
    aggregate the label-split score arrays, then pick the threshold and
    count positive hits in a post-projection (Spark forbids nested
    aggregates)."""
    arrays = scored.agg(
        F.sort_array(
            F.collect_list(F.when(F.col(label_col) == 0, F.col(score_col)))
        ).alias("neg"),
        F.collect_list(F.when(F.col(label_col) == 1, F.col(score_col))).alias("pos"),
    )
    n_neg = F.size(F.col("neg"))
    k = F.floor(F.lit(1.0 - target_fpr) * (n_neg - F.lit(1)).cast("double")).cast("int")
    k = F.greatest(F.lit(0), F.least(k, n_neg - F.lit(1)))
    with_thr = arrays.withColumn("thr", F.element_at(F.col("neg"), k + F.lit(1)).cast("double"))
    hits = F.size(F.filter(F.col("pos"), lambda x: x >= F.col("thr")))
    return with_thr.select(
        (hits.cast("double") / F.size(F.col("pos"))).alias("tpr"),
        F.col("thr"),
    )


# ---------------------------------------------------------------------------
# salted two-phase aggregation (north rule skew handling)
# ---------------------------------------------------------------------------

def salted_counts(
    df: DataFrame, keys: list[str], salt_col: str = "turn_idx", buckets: int = 16
) -> DataFrame:
    """groupBy(keys).count() as a two-phase aggregate with an explicit
    salt: phase 1 groups on (keys + salt) so a hot key fans out over
    `buckets` reducers, phase 2 sums the partials. Result provably
    equals the plain groupBy count."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("__salt__")
    partial = df.groupBy(*keys, salt).agg(F.count(F.lit(1)).alias("__n__"))
    return partial.groupBy(*keys).agg(F.sum("__n__").alias("n"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    salt_col: str = "turn_idx",
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted sum/count for arbitrary decomposable aggregates."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("__salt__")
    partial = df.groupBy(*keys, salt).agg(
        F.count(F.lit(1)).alias("__n__"),
        *[F.sum(c).alias(f"__sum_{c}__") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n__").alias("n"),
        *[F.sum(f"__sum_{c}__").alias(f"sum_{c}") for c in sum_cols],
    )


# ---------------------------------------------------------------------------
# report-shaping operators (A6/A7/O2/O8)
# ---------------------------------------------------------------------------

def keep_last(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Latest row per key (reference keep-last dedup,
    scripts/make_readme_table.py:86-90) — window row_number, not
    dropDuplicates, so "last" is well-defined."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def categorical_rank(col: Column, ordered_values: list[str]) -> Column:
    """Expression-based categorical sort key (O2): listed values rank
    first in order, unknowns last (sorted lexicographically via the
    secondary key the caller adds)."""
    expr = F.lit(len(ordered_values))
    for i, v in enumerate(reversed(ordered_values)):
        expr = F.when(col == v, F.lit(len(ordered_values) - 1 - i)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# 24-column summary ledger (S5, src/stream.py:79-104,194-254)
# ---------------------------------------------------------------------------

SUMMARY_COLUMNS = [
    "date", "commit", "dataset", "mode", "calibration", "drift_detector",
    "seed", "events", "anomalies", "drifts", "TPR_at_1pct_FPR", "p95_ms",
    "p99_ms", "eps", "CPU_pct", "energy_J", "calib_target_fpr",
    "calib_window", "warmup", "adwin_delta", "iso_n_estimators",
    "iso_max_samples", "iso_random_state", "notes",
]


def summary_row(
    spark: SparkSession,
    *,
    dataset: str,
    mode: str,
    calibration: str,
    seed: int,
    events: int,
    anomalies: int,
    drifts: int,
    tpr_str: str,
    p95_ms: float,
    p99_ms: float,
    eps: float,
    cpu_pct: str,
    calib_target_fpr: str,
    calib_window: str,
    warmup: int,
    adwin_delta: float,
    iso_n_estimators: str,
    iso_max_samples: str,
    iso_random_state: str,
    notes: str,
    commit: str = "NA",
    drift_detector: str = "ADWIN",
    energy_j: str = "NA",
) -> DataFrame:
    """One-row summary DataFrame with the exact 24-column header, all
    stringly-typed like the CSV ledger (NaN floats -> empty per
    src/stream.py:107-110)."""
    import math as _math

    def fmt(x) -> str:
        if isinstance(x, float):
            return "" if _math.isnan(x) else f"{x:.6g}"
        return str(x)

    date_s = datetime.now(timezone.utc).strftime("%Y-%m-%d")
    values = [
        date_s, commit, dataset, mode, calibration, drift_detector,
        fmt(seed), fmt(events), fmt(anomalies), fmt(drifts), tpr_str,
        fmt(p95_ms), fmt(p99_ms), fmt(eps), cpu_pct, energy_j,
        calib_target_fpr, calib_window, fmt(warmup), fmt(adwin_delta),
        iso_n_estimators, iso_max_samples, iso_random_state, notes,
    ]
    schema = ", ".join(f"`{c}` string" for c in SUMMARY_COLUMNS)
    return spark.createDataFrame([tuple(values)], schema)


def append_summary(row: DataFrame, path: str) -> None:
    row.coalesce(1).write.mode("append").option("header", True).csv(path)
