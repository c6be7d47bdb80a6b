"""Sequence packing manifest — the concat-then-chunk scheme used to
build LM pretraining examples (GPT-2/3 style: documents are
concatenated in a fixed order into one token stream per shard, then
the stream is cut into fixed-length training sequences; T5's "pack"
and most open pipelines inherit it). This operator emits the PACKING
MANIFEST — which token span of which document lands in which chunk —
rather than materialized token arrays: the manifest is pure integer
arithmetic (exact, engine-portable), and the actual token gather is a
trivially parallel map over it.

Documented contract (mirrored by the DuckDB oracle):

- shard: pmod(hash60(id, seed), n_shards) — documents are spread
  deterministically across independent token streams.
- order within a shard: (hash60(id, seed), id) ascending — a stable
  pseudo-random shuffle, the standard pretraining-order choice, and a
  pure function of the ids.
- stream offsets: doc start = running sum of n_tok over earlier docs
  in the shard's order; a doc with n_tok = 0 emits nothing.
- chunks: the shard stream is cut every `chunk_len` tokens; a doc
  spanning [start, end) overlaps chunks floor(start/L) ..
  floor((end-1)/L) and emits ONE ROW PER OVERLAPPED CHUNK:
  (shard, chunk, doc_id, doc_off, chunk_off, len) — `len` tokens,
  taken from the doc starting at `doc_off`, landing at `chunk_off`
  inside the chunk. Every chunk except a shard's last is exactly
  full; the tail is short (pad or drop downstream — manifest records
  it either way).

Scale design (100 TB corpus):

- ONE exchange: the shard-keyed window (running sum needs a per-shard
  sort by the 8-byte hash key — shuffle keys are (shard int, hash
  long), text never rides a key). `n_shards` sizes the sort: pick
  shards so a shard's (id, n_tok) rows fit an executor's sort spill
  comfortably — the window input is 3 small columns, NOT the text.
- chunk-row fan-out is explode(sequence(first_chunk, last_chunk)) —
  codegen, no lambdas; row count = n_docs + n_chunk_crossings
  (bounded by total_tokens/chunk_len extra rows).
- the token gather that consumes this manifest joins it back to the
  corpus on doc_id — co-locatable by bucketing, outside this
  operator's scope.

Reference parity note: no packing surface exists in the reference
(verified by reading every module under /root/reference/src/ --
only calibration/log_tokenize/stream/transformer exist); extension operator beside
sampling.token_budget_cap (which picks WHAT to train on; packing
decides WHERE each kept token lands)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log_project_spark.operators.sampling import hash60


def pack_sequences(
    df: DataFrame,
    ntok_col: str,
    id_col: str = "doc_id",
    chunk_len: int = 2048,
    n_shards: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Packing manifest: (shard int, chunk bigint, id, doc_off bigint,
    chunk_off bigint, len bigint), one row per (doc, overlapped
    chunk). Deterministic, partition-invariant, exact."""
    if chunk_len < 1:
        raise ValueError(f"chunk_len must be >= 1, got {chunk_len}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = hash60(F.col(id_col), seed)
    base = df.select(
        F.col(id_col),
        F.col(ntok_col).cast("long").alias("__n__"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("__h__"),
    ).where(F.col("__n__") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__h__").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = base.select(
        id_col,
        "shard",
        "__n__",
        (F.sum("__n__").over(w) - F.col("__n__")).alias("__start__"),
    )
    L = F.lit(int(chunk_len))
    first = F.floor(F.col("__start__") / L)
    last = F.floor((F.col("__start__") + F.col("__n__") - 1) / L)
    exploded = placed.select(
        id_col,
        "shard",
        "__n__",
        "__start__",
        F.explode(F.sequence(first, last)).alias("chunk"),
    )
    seg_start = F.greatest(F.col("__start__"), F.col("chunk") * L)
    seg_end = F.least(F.col("__start__") + F.col("__n__"), (F.col("chunk") + 1) * L)
    return exploded.select(
        "shard",
        F.col("chunk").cast("long").alias("chunk"),
        id_col,
        (seg_start - F.col("__start__")).cast("long").alias("doc_off"),
        (seg_start - F.col("chunk") * L).cast("long").alias("chunk_off"),
        (seg_end - seg_start).cast("long").alias("len"),
    )
