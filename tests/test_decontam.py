"""Benchmark decontamination: known-overlap flagging, hash parity,
broadcast-semi-join plan discipline, min_hits policy, short docs."""

import pytest
from pyspark.sql import functions as F

from log_project_spark.operators import decontam
from log_project_spark.operators.parse import word_tokens_col


def _toked(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn("tokens", word_tokens_col(F.col("text")))


@pytest.fixture(scope="module")
def corpus(spark):
    train = _toked(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),   # contains bench 5-gram
        (2, "a completely different sentence with no overlap at all"),
        (3, "short doc"),                                      # < 5 tokens: can't hit
        (4, "quick brown fox jumps over and quick brown fox jumps again"),  # 1 shared 5-gram
    ])
    bench = _toked(spark, [
        (100, "eval question the quick brown fox jumps over everything"),
    ])
    return train, bench


def test_contamination_hits_known_overlap(spark, corpus):
    train, bench = corpus
    hits = {
        r["doc_id"]: r["n_hit_grams"]
        for r in decontam.contamination_hits(train, bench, n=5).collect()
    }
    # bench 5-grams include "the quick brown fox jumps" and
    # "quick brown fox jumps over"; doc 1 contains both, doc 4 one
    assert hits == {1: 2, 4: 1}


def test_decontaminate_drops_flagged(spark, corpus):
    train, bench = corpus
    kept = {r["doc_id"] for r in decontam.decontaminate(train, bench, n=5).collect()}
    assert kept == {2, 3}
    # min_hits=2 keeps the single-hit doc
    kept2 = {
        r["doc_id"]
        for r in decontam.decontaminate(train, bench, n=5, min_hits=2).collect()
    }
    assert kept2 == {2, 3, 4}


def test_hash_grams_parity(spark, corpus):
    """The 8-byte hashed gram join returns the same hits as the
    byte-exact string join (no collisions at this scale)."""
    train, bench = corpus
    a = decontam.contamination_hits(train, bench, n=5, hash_grams=True).collect()
    b = decontam.contamination_hits(train, bench, n=5, hash_grams=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # and the non-broadcast (shuffle-join) path agrees too
    c = decontam.contamination_hits(train, bench, n=5, broadcast_bench=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, c))


def test_plan_broadcast_semi_no_payload_shuffle(spark, corpus):
    """Scale contract: the gram membership test is a broadcast LEFT
    SEMI join (map-side — the 100 TB train table never shuffles its
    grams for it). The only exchanges are the hit-count aggregate
    keyed on doc_id and the BENCH side's distinct over 8-byte gram
    hashes (eval-set sized); no shuffle key ever carries text or a
    raw gram string."""
    train, bench = corpus
    hits = decontam.contamination_hits(train, bench, n=5)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            inner = ln.split("hashpartitioning(", 1)[1]
            assert "text#" not in inner
            # exchange keys: doc_id (hit count) or hashed gram long
            # (bench distinct); a raw gram string would be gram#N
            # without the xxhash64 projection upstream — assert the
            # long type by the L suffix of the attribute
            assert "doc_id" in inner or "gram#" in inner


def test_short_bench_docs_emit_no_grams(spark):
    train = _toked(spark, [(1, "one two three four five six")])
    bench = _toked(spark, [(9, "one two")])  # < n tokens
    assert decontam.contamination_hits(train, bench, n=5).count() == 0


def test_oracle_parity_duckdb(spark):
    """Spark path == a DuckDB restatement on the sf0.01 documents
    (the gate query's split: bench = top 12.5% of the hash space)."""
    import duckdb

    from log_project_spark.operators import sampling

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").withColumn(
        "tokens", word_tokens_col(F.col("text"))
    )
    train, bench = sampling.hash_split(docs, 0.875, "doc_id", seed=7)
    got = {
        r["doc_id"]: r["n_hit_grams"]
        for r in decontam.contamination_hits(train, bench, n=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    word_toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')"
    h = "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 15)) AS BIGINT)"
    thr = sampling.fraction_threshold(0.875)
    want = dict(
        con.sql(f"""
        WITH toked AS (SELECT doc_id, {word_toks} AS toks FROM documents),
        tr AS (SELECT * FROM toked WHERE {h} < {thr}),
        be AS (SELECT * FROM toked WHERE NOT ({h} < {thr})),
        bg AS (SELECT DISTINCT array_to_string(toks[i:i+4], ' ') AS gram
               FROM be, unnest(range(1, len(toks) - 3)) AS t(i) WHERE len(toks) >= 5),
        tg AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS gram
               FROM tr, unnest(range(1, len(toks) - 3)) AS t(i) WHERE len(toks) >= 5)
        SELECT doc_id, count(*) FROM tg JOIN bg USING (gram) GROUP BY doc_id
        """).fetchall()
    )
    assert got == want and got  # non-trivial overlap in the fixture data
