"""Sequence packing manifest: Python reference parity, token
conservation, exact chunk tiling, per-doc contiguity, partition
invariance, validation, and the single-exchange plan."""

import hashlib

import pytest
from pyspark.sql import functions as F

from log_project_spark.operators import packing

L, SHARDS, SEED = 64, 3, 11


def _h60(s, seed):
    return int(hashlib.md5(f"{s}|{seed}".encode()).hexdigest()[:15], 16)


def _py_pack(items, chunk_len, n_shards, seed):
    """items: [(id, n_tok)] -> set of manifest rows."""
    shards = {}
    for i, n in items:
        if n <= 0:
            continue
        h = _h60(str(i), seed)
        shards.setdefault(h % n_shards, []).append((h, i, n))
    out = set()
    for s, docs in shards.items():
        docs.sort()
        off = 0
        for h, i, n in docs:
            start, end = off, off + n
            for c in range(start // chunk_len, (end - 1) // chunk_len + 1):
                a = max(start, c * chunk_len)
                b = min(end, (c + 1) * chunk_len)
                out.add((s, c, i, a - start, a - c * chunk_len, b - a))
            off = end
    return out


@pytest.fixture(scope="module")
def docs_ntok(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    from log_project_spark.operators.parse import word_tokens_col

    return docs.select("doc_id", F.size(word_tokens_col(F.col("text"))).alias("n_tok"))


@pytest.fixture(scope="module")
def manifest(docs_ntok):
    return packing.pack_sequences(docs_ntok, "n_tok", chunk_len=L, n_shards=SHARDS, seed=SEED)


def test_reference_parity(docs_ntok, manifest):
    items = [(r["doc_id"], r["n_tok"]) for r in docs_ntok.collect()]
    want = _py_pack(items, L, SHARDS, SEED)
    got = {tuple(r) for r in manifest.collect()}
    assert got == want


def test_token_conservation(docs_ntok, manifest):
    per_doc = {
        r["doc_id"]: r["s"]
        for r in manifest.groupBy("doc_id").agg(F.sum("len").alias("s")).collect()
    }
    for r in docs_ntok.collect():
        assert per_doc.get(r["doc_id"], 0) == max(r["n_tok"], 0)


def test_chunks_tile_exactly(manifest):
    """Every chunk except each shard's last is exactly full, and its
    segments tile [0, L) with no gaps or overlaps."""
    rows = manifest.collect()
    chunks = {}
    for r in rows:
        chunks.setdefault((r["shard"], r["chunk"]), []).append((r["chunk_off"], r["len"]))
    last_chunk = {}
    for (s, c), _ in chunks.items():
        last_chunk[s] = max(last_chunk.get(s, -1), c)
    for (s, c), segs in chunks.items():
        segs.sort()
        pos = 0
        for off, ln in segs:
            assert off == pos and ln > 0
            pos += ln
        if c < last_chunk[s]:
            assert pos == L
        else:
            assert 0 < pos <= L


def test_doc_segments_contiguous(manifest):
    per_doc = {}
    for r in manifest.collect():
        per_doc.setdefault(r["doc_id"], []).append((r["doc_off"], r["len"]))
    for segs in per_doc.values():
        segs.sort()
        pos = 0
        for off, ln in segs:
            assert off == pos
            pos += ln


def test_partition_invariance(docs_ntok):
    a = {tuple(r) for r in packing.pack_sequences(docs_ntok, "n_tok", chunk_len=L, n_shards=SHARDS, seed=SEED).collect()}
    b = {tuple(r) for r in packing.pack_sequences(docs_ntok.repartition(7), "n_tok", chunk_len=L, n_shards=SHARDS, seed=SEED).collect()}
    assert a == b


def test_validation(docs_ntok):
    with pytest.raises(ValueError, match="chunk_len"):
        packing.pack_sequences(docs_ntok, "n_tok", chunk_len=0)
    with pytest.raises(ValueError, match="n_shards"):
        packing.pack_sequences(docs_ntok, "n_tok", n_shards=0)


def test_single_shard_keyed_exchange(docs_ntok):
    plan = (
        packing.pack_sequences(docs_ntok, "n_tok", chunk_len=L, n_shards=SHARDS, seed=SEED)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    ex = plan[plan.index("Exchange hashpartitioning"):]
    assert "shard" in ex[: ex.index(")")]
    assert "lambdafunction" not in plan.lower()
