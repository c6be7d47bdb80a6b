"""Dedup operators: exact, MinHash/LSH, SimHash, Jaccard — checked
against brute-force Python computations on small corpora."""

import itertools

import pytest
from pyspark.sql import functions as F

from log_project_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different content about spark engines"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (4, "spark engines about content different completely"),  # permutation of 2
    (5, "unrelated short text"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return df.withColumn("tokens", dedup.word_tokens(F.col("text")))


def _token_sets():
    return {i: set(t.lower().split()) for i, t in DOCS}


def test_exact_dup_groups(spark, docs_df):
    groups = dedup.exact_dup_groups(docs_df, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n"] == 2 and groups[0]["keep_id"] == 0


def test_dedup_exact_keeps_min_id(spark, docs_df):
    kept = dedup.dedup_exact(docs_df, "text", "doc_id").select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [0, 1, 2, 4, 5]


def test_jaccard_pairs_match_bruteforce(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    sets = _token_sets()
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if round(j, 6) >= 0.5:
            want[(a, b)] = round(j, 6)
    assert got == pytest.approx(want)


def test_minhash_identical_docs_same_signature(spark, docs_df):
    sh = dedup.with_shingles(docs_df, n=3)
    sig = dedup.minhash_signature(sh, num_hashes=4)
    rows = {r["doc_id"]: (r["m0"], r["m1"], r["m2"], r["m3"]) for r in sig.collect()}
    assert rows[0] == rows[3]  # exact dups -> identical signatures
    assert rows[0] != rows[2]


def test_lsh_candidates_include_exact_dups(spark, docs_df):
    sh = dedup.with_shingles(docs_df, n=3)
    sig = dedup.minhash_signature(sh, num_hashes=4)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(sig, num_hashes=4, band_size=2).collect()
    }
    assert (0, 3) in pairs  # identical docs always collide in every band


def test_simhash_properties(spark, docs_df):
    sig = dedup.simhash64(docs_df.select("doc_id", "tokens"), "tokens")
    rows = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert rows[0] == rows[3]  # identical token multisets
    assert rows[2] == rows[4]  # simhash is order-insensitive (bag of tokens)
    # near-dups differ in few bits; far docs in many
    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(rows[0], rows[1]) < ham(rows[0], rows[2])


def test_simhash_hamming_pairs(spark, docs_df):
    sig = dedup.simhash64(docs_df.select("doc_id", "tokens"), "tokens")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.hamming_near_pairs(sig, max_hamming=10).collect()
    }
    assert pairs.get((0, 3)) == 0
    assert pairs.get((2, 4)) == 0


def test_shingles_content(spark, docs_df):
    sh = dedup.with_shingles(docs_df.where(F.col("doc_id") == 5), n=2).first()
    assert list(sh["shingles"]) == ["unrelated short", "short text"]


def test_embedding_near_dups(spark):
    import numpy as np

    rng = np.random.default_rng(4)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # 3 near-duplicates of vector 0 (tiny perturbations)
    for j in range(3):
        pert = base[0] + rng.standard_normal(16).astype(np.float32) * 0.01
        rows.append((100 + j, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dups(df, threshold=0.99, exact=True).collect()
    }
    want = {(0, 100), (0, 101), (0, 102), (100, 101), (100, 102), (101, 102)}
    assert exact == want

    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dups(df, threshold=0.99, exact=False).collect()
    }
    # LSH candidates verify exactly -> subset of the exact pairs, and
    # near-identical vectors share all SRP bits -> full recall here
    assert lsh == want
