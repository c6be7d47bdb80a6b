"""Bigram LM quality scoring: exact parity with a pure-Python reference
model, probability normalization, UNK semantics, partition invariance,
broadcast/shuffle model-join parity, and plan hygiene."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from log_project_spark.operators import lm_score
from log_project_spark.operators.lm_score import UNK, BigramLM


CORPUS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat on the log"),
    ("d3", "a cat and a dog"),
    ("d4", "the the the"),
    ("d5", "solo"),  # 1 token -> no bigrams -> no score row
    ("d6", ""),  # empty -> no score row
]


def _py_fit(texts, vocab_size):
    """Reference fit, mirroring the documented contract exactly."""
    uni = Counter()
    for t in texts:
        uni.update(t.lower().split())
    vocab = set(
        tok for tok, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    )
    big = Counter()
    for t in texts:
        toks = [w if w in vocab else UNK for w in t.lower().split()]
        for w1, w2 in zip(toks, toks[1:]):
            big[(w1, w2)] += 1
    ctx = Counter()
    for (w1, _), c in big.items():
        ctx[w1] += c
    return vocab, big, ctx


def _py_score(text, vocab, big, ctx, k, v_smooth, dp=6):
    toks = [w if w in vocab else UNK for w in text.lower().split()]
    if len(toks) < 2:
        return None
    logps = [
        math.log2((big.get((w1, w2), 0) + k) / (ctx.get(w1, 0) + k * v_smooth))
        for w1, w2 in zip(toks, toks[1:])
    ]
    return (len(logps), round(-sum(logps) / len(logps), dp))


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def lm(corpus_df) -> BigramLM:
    return lm_score.fit_bigram_lm(corpus_df, "text", vocab_size=5, id_col="doc_id")


def _scores(df):
    return {r["doc_id"]: (r["n_bigrams"], r["xent"]) for r in df.collect()}


def test_exact_parity_with_python_reference(corpus_df, lm):
    texts = [t for _, t in CORPUS]
    vocab, big, ctx = _py_fit(texts, 5)
    assert lm.v_smooth == len(vocab) + 1
    got = _scores(lm_score.score_bigram_lm(corpus_df, lm, "text", k=0.5))
    want = {
        did: _py_score(t, vocab, big, ctx, 0.5, lm.v_smooth)
        for did, t in CORPUS
        if _py_score(t, vocab, big, ctx, 0.5, lm.v_smooth) is not None
    }
    assert got == want
    assert "d5" not in got and "d6" not in got


def test_vocab_tiebreak_deterministic(spark):
    # four tokens, all count 1 -> vocab_size=2 must pick the two
    # lexicographically smallest ("a", "b"), not an arbitrary pair
    df = spark.createDataFrame([("x", "d c b a")], ["doc_id", "text"])
    m = lm_score.fit_bigram_lm(df, "text", vocab_size=2)
    assert {r["tok"] for r in m.vocab.collect()} == {"a", "b"}


def test_probabilities_sum_to_one(lm):
    """For every context v1 with c1>0, sum over the full smoothing space
    (vocab + UNK) of (c2+k)/(c1+k*V) must be exactly 1."""
    k = 0.5
    vocab = [r["tok"] for r in lm.vocab.collect()] + [UNK]
    big = {(r["v1"], r["v2"]): r["c2"] for r in lm.bigrams.collect()}
    ctx = {r["v1"]: r["c1"] for r in lm.contexts.collect()}
    assert len(vocab) == lm.v_smooth
    for v1, c1 in ctx.items():
        total = sum((big.get((v1, v2), 0) + k) / (c1 + k * lm.v_smooth) for v2 in vocab)
        assert total == pytest.approx(1.0, abs=1e-12)


def test_oov_docs_score_identically(spark, lm):
    """Two docs whose tokens differ only in WHICH out-of-vocab word they
    use collapse to the same UNK sequence, hence the same score."""
    probe = spark.createDataFrame(
        [("p1", "the zzz cat"), ("p2", "the qqq cat")], ["doc_id", "text"]
    )
    got = _scores(lm_score.score_bigram_lm(probe, lm, "text", k=0.5))
    assert got["p1"] == got["p2"]
    assert got["p1"][0] == 2


def test_partition_invariance(corpus_df, lm):
    a = _scores(lm_score.score_bigram_lm(corpus_df, lm, "text", k=0.5))
    b = _scores(lm_score.score_bigram_lm(corpus_df.repartition(7), lm, "text", k=0.5))
    c = _scores(lm_score.score_bigram_lm(corpus_df.coalesce(1), lm, "text", k=0.5))
    assert a == b == c


def test_shuffled_model_join_matches_broadcast(corpus_df, lm):
    a = _scores(lm_score.score_bigram_lm(corpus_df, lm, "text", broadcast_model=True))
    b = _scores(lm_score.score_bigram_lm(corpus_df, lm, "text", broadcast_model=False))
    assert a == b


def test_validation_errors(corpus_df, lm):
    with pytest.raises(ValueError, match="vocab_size"):
        lm_score.fit_bigram_lm(corpus_df, "text", vocab_size=0)
    with pytest.raises(ValueError, match="smoothing k"):
        lm_score.score_bigram_lm(corpus_df, lm, "text", k=0.0)


def test_plan_hygiene(corpus_df, lm):
    """Scoring plan: vocab/context joins broadcast, no interpreted
    higher-order lambdas, bigram construction stays in codegen."""
    plan = (
        lm_score.score_bigram_lm(corpus_df, lm, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "lambdafunction" not in plan.lower()


def test_vocab_selection_is_take_ordered(corpus_df):
    """Vocab pick must be per-partition top-V + driver merge, not a
    global sort shuffle."""
    m = lm_score.fit_bigram_lm(corpus_df, "text", vocab_size=3)
    plan = m.vocab._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
