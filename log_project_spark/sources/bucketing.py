"""Bucketed tables: shuffle-free co-located joins (north rule:
"bucketing for co-located joins").

A join between two large tables normally shuffles BOTH sides on the
join key — at 10^12 turns that's the dominant cost of, e.g., joining
the transcripts table to a per-conversation label/metadata table.
Writing both sides bucketed by the key (same bucket count) records the
hash-partitioning in the table metadata, so Spark plans a
SortMergeJoin with NO Exchange on either side: each task reads bucket
i of both tables and joins locally. The one-time bucketing cost is
paid at write; every subsequent join is shuffle-free.

Uses Spark's built-in DataSource bucketing (`bucketBy` +
`saveAsTable`, session catalog with a local warehouse — no Hive
needed). On Iceberg the same property comes from a `bucket(N, key)`
partition transform + storage-partitioned joins
(spark.sql.sources.v2.bucketing.enabled); the call sites are
identical, only the writer changes.

`assert_no_join_exchange` is the plan gate used by tests/PLANS.md:
bucketing that silently stops eliding the shuffle (e.g. mismatched
bucket counts after a refactor) is a perf regression correctness
tests can't see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) session-catalog
    table. Sorting within buckets lets the bucketed join skip its sort
    as well (full SortMergeJoin -> zip of pre-sorted buckets)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_key)
    if sort_key is not None:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketing tables; with matching bucket specs the
    physical plan carries no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def assert_no_join_exchange(df: DataFrame) -> str:
    """Raise if the plan shuffles either join side; returns the plan
    text for logging/PLANS.md."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join plan contains a hash Exchange — bucketing is "
            "not eliding the shuffle:\n" + plan
        )
    return plan
