"""Streaming deduplication over incremental document/turn arrival.

Batch dedup (operators/dedup.py) assumes the whole corpus is visible;
an ingest pipeline sees it arrive. Two stateful variants, both pure
Structured Streaming (state is schema'd, checkpointed, and recovered
by Spark — no custom state plumbing to get wrong):

- `dedup_stream_exact`: drop every re-occurrence of a key for the
  lifetime of the query (`dropDuplicates`). State grows with the
  number of DISTINCT keys ever seen — at 10^12-turn scale that is an
  unbounded hazard unless the key space is bounded (e.g. dedup within
  a bounded id vocabulary), so this variant is for bounded keys or
  bounded-lifetime queries only.
- `dedup_stream_within_watermark`: the 100 TB-correct variant. Keys
  expire once the event-time watermark passes `key event time +
  delay`, so state is bounded by (arrival rate x delay) regardless of
  corpus size. The trade-off is semantic and explicit: a duplicate
  arriving LATER than the delay re-emits (tested). This is exact
  dedup within the window a production ingest actually promises
  ("no duplicate delivered twice within N minutes"), not global
  history.

Both compose with the batch operators: run the watermarked stream
dedup at ingest, then the batch MinHash/SimHash near-dup passes over
the materialized table (corpus_curation) for global semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_exact(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Global exact dedup on a streaming DataFrame. Unbounded state —
    see module docstring for when that is acceptable."""
    return stream.dropDuplicates(keys)


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact dedup with watermark-bounded state: a duplicate of a key
    arriving within `delay` (event time) of its first occurrence is
    dropped; after the watermark passes, the key's state is evicted
    and a later re-occurrence is treated as new."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
