"""Routed fan-out to anomalous / drifting / nominal sinks.

North-rule contract (BASELINE.json): one scored DataFrame routed to
three partitioned sinks, disjoint and union-complete:

    anomalous = is_anom
    drifting  = is_drift AND NOT is_anom
    nominal   = everything else

Per-sink aggregate counts must equal the single-path flag sums, and
per-turn `text` must round-trip unchanged under (conv_id, turn_idx)
ordering (FIXTURES.md §5). The scored frame is persisted once and
filtered three times — Spark recomputes nothing, and the three writes
share the scan. Sinks are partitioned by event date (dt) so downstream
reads prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SINKS = ("anomalous", "drifting", "nominal")


def with_sink(df: DataFrame, out_col: str = "sink") -> DataFrame:
    """Routing rule as one Catalyst expression."""
    return df.withColumn(
        out_col,
        F.when(F.col("is_anom"), F.lit("anomalous"))
        .when(F.col("is_drift"), F.lit("drifting"))
        .otherwise(F.lit("nominal")),
    )


def write_fanout(
    scored: DataFrame,
    out_dir: str,
    file_format: str = "parquet",
    partition_by: tuple[str, ...] = ("dt",),
    mode: str = "overwrite",
) -> dict[str, str]:
    """Fan-out writes. Returns sink -> path. Caller is responsible for
    unpersisting `scored` afterwards if it persisted it."""
    routed = with_sink(scored)
    if "dt" not in routed.columns and "ts" in routed.columns:
        routed = routed.withColumn("dt", F.to_date("ts"))
    routed = routed.persist(StorageLevel.MEMORY_AND_DISK)
    paths = {}
    try:
        for sink in SINKS:
            path = f"{out_dir}/{sink}"
            (
                routed.where(F.col("sink") == sink)
                .drop("sink")
                .write.mode(mode)
                .partitionBy(*partition_by)
                .format(file_format)
                .save(path)
            )
            paths[sink] = path
    finally:
        routed.unpersist()
    return paths


def sink_counts(scored: DataFrame) -> DataFrame:
    """Per-sink row counts from the routing rule (no write needed) —
    the equality target for the fan-out invariant."""
    return with_sink(scored).groupBy("sink").agg(F.count(F.lit(1)).alias("n"))


def flag_counts(scored: DataFrame) -> DataFrame:
    """Single-path flag sums (SURVEY.md C8/C9): must reconcile with
    sink_counts: anomalous == n_anom, drifting == n_drift_not_anom,
    nominal == total - anomalous - drifting."""
    return scored.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("is_anom").cast("long")).alias("n_anom"),
        F.sum(F.col("is_drift").cast("long")).alias("n_drift"),
        F.sum((F.col("is_drift") & ~F.col("is_anom")).cast("long")).alias("n_drift_not_anom"),
    )
