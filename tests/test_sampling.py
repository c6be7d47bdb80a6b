"""Deterministic sampling: partition invariance, monotone fractions,
exact stratified counts, split disjointness, shuffle discipline."""

import pytest
from pyspark.sql import functions as F

from log_project_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_fraction_partition_invariant(spark, docs):
    a = _ids(sampling.sample_fraction(docs, 0.2, "doc_id"))
    b = _ids(sampling.sample_fraction(docs.repartition(7), 0.2, "doc_id"))
    c = _ids(sampling.sample_fraction(docs.coalesce(1), 0.2, "doc_id"))
    assert a == b == c and 0 < len(a) < docs.count()


def test_sample_fraction_monotone_in_p(spark, docs):
    s1 = _ids(sampling.sample_fraction(docs, 0.1, "doc_id"))
    s3 = _ids(sampling.sample_fraction(docs, 0.3, "doc_id"))
    assert s1 <= s3  # growing p only ADDS rows under a fixed seed
    assert len(s3) > len(s1)


def test_sample_fraction_seed_changes_selection(spark, docs):
    a = _ids(sampling.sample_fraction(docs, 0.2, "doc_id", seed=1))
    b = _ids(sampling.sample_fraction(docs, 0.2, "doc_id", seed=2))
    assert a != b


def test_sample_fraction_bounds(spark, docs):
    assert sampling.sample_fraction(docs, 0.0, "doc_id").count() == 0
    assert sampling.sample_fraction(docs, 1.0, "doc_id").count() == docs.count()
    with pytest.raises(ValueError, match="fraction"):
        sampling.sample_fraction(docs, 1.5, "doc_id")


def test_sample_fraction_no_shuffle(spark, docs):
    plan = (
        sampling.sample_fraction(docs, 0.2, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure scan-side filter


def test_hash_split_partitions_rows(spark, docs):
    train, hold = sampling.hash_split(docs, 0.8, "doc_id")
    t, h = _ids(train), _ids(hold)
    assert t.isdisjoint(h)
    assert t | h == _ids(docs)
    # and the train side IS the sample_fraction at the same threshold
    assert t == _ids(sampling.sample_fraction(docs, 0.8, "doc_id"))


def test_stratified_exact_counts_and_determinism(spark, docs):
    got = sampling.stratified_sample_exact(docs, ["lang"], 20, "doc_id")
    sizes = {r["lang"]: r["n"] for r in
             got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {lang: min(20, n) for lang, n in full.items()}
    again = sampling.stratified_sample_exact(docs.repartition(5), ["lang"], 20, "doc_id")
    assert _ids(got) == _ids(again)


def test_stratified_small_stratum_keeps_all(spark):
    rows = [(i, "big") for i in range(50)] + [(100 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sampling.stratified_sample_exact(df, ["lang"], 10, "doc_id")
    sizes = {r["lang"]: r["n"] for r in
             got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"big": 10, "tiny": 3}


def test_stratified_prefilter_preserves_selection(spark, docs):
    base = sampling.stratified_sample_exact(docs, ["lang"], 10, "doc_id")
    thinned = sampling.stratified_sample_exact(
        docs, ["lang"], 10, "doc_id", prefilter_fraction=0.6
    )
    # 0.6 * min-stratum(64) ~ 38 expected survivors >= k=10: winners intact
    assert _ids(base) == _ids(thinned)


def test_stratified_shuffles_on_strata_only(spark, docs):
    got = sampling.stratified_sample_exact(docs, ["lang"], 20, "doc_id")
    plan = got._jdf.queryExecution().executedPlan().toString()
    part_lines = [ln for ln in plan.splitlines() if "hashpartitioning" in ln]
    assert part_lines
    for ln in part_lines:
        inner = ln.split("hashpartitioning(", 1)[1]
        assert "lang" in inner and "text#" not in inner


def test_sample_by_stratum_rebalances(spark, docs):
    fr = {"en": 0.1, "zh": 1.0, "es": 0.5}
    got = sampling.sample_by_stratum(docs, fr, "lang", "doc_id")
    # zh kept whole; absent strata (de, fr) dropped by default
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes.get("zh") == full["zh"]
    assert set(sizes) == {"en", "zh", "es"}
    assert 0 < sizes["en"] < full["en"]
    # per-stratum selection == sample_fraction restricted to the stratum
    en_direct = _ids(sampling.sample_fraction(docs.where("lang='en'"), 0.1, "doc_id"))
    assert {r["doc_id"] for r in got.where("lang='en'").select("doc_id").collect()} == en_direct
    # default passthrough
    all_through = sampling.sample_by_stratum(
        docs, {}, "lang", "doc_id", default_fraction=1.0
    )
    assert all_through.count() == docs.count()
    # zero shuffle
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _py_hash60(key, seed):
    import hashlib

    return int(hashlib.md5(f"{key}|{seed}".encode()).hexdigest()[:15], 16)


def test_stratified_auto_prefilter_exact_and_verified(spark, docs):
    """prefilter_fraction='auto' (the 100 TB path: per-stratum
    thresholds from a counted pass, ~margin*k rows per stratum reach
    the sort) returns exactly the default mode's selection."""
    base = sampling.stratified_sample_exact(docs, ["lang"], 20, "doc_id")
    auto = sampling.stratified_sample_exact(
        docs, ["lang"], 20, "doc_id", prefilter_fraction="auto"
    )
    assert _ids(base) == _ids(auto)
    auto.unpersist()


def test_stratified_auto_keeps_undersized_strata_whole(spark):
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sampling.stratified_sample_exact(
        df, ["lang"], 10, "doc_id", prefilter_fraction="auto"
    )
    sizes = {r["lang"]: r["n"] for r in
             got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"big": 10, "tiny": 3}
    got.unpersist()


def test_stratified_auto_raises_when_margin_too_thin(spark):
    """The verification action must catch a prefilter that left a
    stratum short of k — margin chosen so the deterministic hash
    provably undershoots (computed with the same md5 in Python)."""
    n, seed = 500, 20250819
    rows = [(i, "s") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    hashes = sorted(_py_hash60(i, seed) for i in range(n))
    # find a (k, margin > 1) pair whose threshold provably admits
    # FEWER than k rows under the deterministic hash layout
    found = None
    for k in range(20, 200, 5):
        for margin in (1.01, 1.02, 1.05, 1.1):
            thr = int(min(1.0, margin * k / n) * float(1 << 60))
            if sum(1 for h in hashes if h < thr) < k:
                found = (k, margin)
                break
        if found:
            break
    assert found, "no shortfall combo in range — widen the search"
    k, margin = found
    with pytest.raises(RuntimeError, match="raise margin"):
        sampling.stratified_sample_exact(
            df, ["lang"], k, "doc_id", seed=seed,
            prefilter_fraction="auto", margin=margin,
        )
    with pytest.raises(ValueError, match="margin"):
        sampling.stratified_sample_exact(
            df, ["lang"], k, "doc_id", prefilter_fraction="auto", margin=1.0
        )


def test_token_budget_cap_is_greedy_prefix(spark, docs):
    """The selection equals a Python brute-force greedy prefix per
    stratum under the same hash order, and per-stratum sums respect
    the budget."""
    budget = 5000
    got = sampling.token_budget_cap(docs, budget, ["lang"], "n_chars", "doc_id", seed=42)
    sums = {r["lang"]: r["s"] for r in
            got.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()}
    assert sums and all(s <= budget for s in sums.values())

    rows = docs.select(
        "lang", "doc_id", "n_chars", sampling.hash60(F.col("doc_id"), 42).alias("h")
    ).collect()
    want = set()
    running: dict = {}  # lang -> cumulative weight; None = closed
    for r in sorted(rows, key=lambda r: (r["h"], r["doc_id"])):
        cum = running.get(r["lang"], 0)
        if cum is None:
            continue  # prefix semantics: first overflow closed the stratum
        cum += r["n_chars"]
        if cum <= budget:
            running[r["lang"]] = cum
            want.add(r["doc_id"])
        else:
            running[r["lang"]] = None
    assert _ids(got) == want


def test_token_budget_cap_ranked_filling(spark, docs):
    """order_col: best-first (longest-first here) greedy prefix — the
    selected set matches a Python brute force over the same ordering."""
    budget = 5000
    got = sampling.token_budget_cap(
        docs, budget, ["lang"], "n_chars", "doc_id", seed=42, order_col="n_chars"
    )
    rows = docs.select(
        "lang", "doc_id", "n_chars", sampling.hash60(F.col("doc_id"), 42).alias("h")
    ).collect()
    want = set()
    running: dict = {}
    for r in sorted(rows, key=lambda r: (-r["n_chars"], r["h"], r["doc_id"])):
        cum = running.get(r["lang"], 0)
        if cum is None:
            continue
        cum += r["n_chars"]
        if cum <= budget:
            running[r["lang"]] = cum
            want.add(r["doc_id"])
        else:
            running[r["lang"]] = None
    assert _ids(got) == want


def test_token_budget_ranked_auto_exact(spark, docs):
    """Ranked auto (r5 scale path: counted order_col histogram pre-cut)
    returns exactly the non-auto ranked selection. At budget=5000,
    margin=4 the en/es/fr/zh strata all exceed margin*budget and are
    genuinely cut; de falls through whole."""
    base = sampling.token_budget_cap(
        docs, 5000, ["lang"], "n_chars", "doc_id", seed=42, order_col="n_chars"
    )
    auto = sampling.token_budget_cap(
        docs, 5000, ["lang"], "n_chars", "doc_id", seed=42,
        order_col="n_chars", prefilter="auto",
    )
    assert auto.columns == docs.columns  # ADVICE r4: schema order preserved
    assert _ids(base) == _ids(auto)
    auto.unpersist()
    # ascending variant ("shortest-first") agrees with brute force too
    asc_auto = sampling.token_budget_cap(
        docs, 3000, ["lang"], "n_chars", "doc_id", seed=42,
        order_col="n_chars", descending=False, prefilter="auto",
    )
    asc_base = sampling.token_budget_cap(
        docs, 3000, ["lang"], "n_chars", "doc_id", seed=42,
        order_col="n_chars", descending=False,
    )
    assert _ids(asc_base) == _ids(asc_auto)
    asc_auto.unpersist()


def test_token_budget_ranked_auto_giant_stratum_precut(spark):
    """The pre-cut must actually thin a giant stratum: survivors reach
    the window at ~margin*budget weight, not |stratum|, and the bucket
    filter is visible in the survivors' plan."""
    n = 20_000
    rows = [(i, "s", 10 + (i * 7919) % 500) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, q long")
    budget, margin = 2_000, 4.0
    survivors, thr = sampling.ranked_budget_prefilter(
        df, budget, ["lang"], "q", "q", margin=margin
    )
    total_w = df.agg(F.sum("q")).collect()[0][0]
    surv_w = survivors.agg(F.sum("q")).collect()[0][0]
    # >= margin*budget by construction, and a tiny slice of the stratum
    assert surv_w >= margin * budget
    assert surv_w < total_w * 0.02
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "__tb__" in plan  # the bucket-threshold filter survived pruning
    # end-to-end: auto == non-auto on the same giant stratum
    base = sampling.token_budget_cap(df, budget, ["lang"], "q", "doc_id", order_col="q")
    auto = sampling.token_budget_cap(
        df, budget, ["lang"], "q", "doc_id", order_col="q", prefilter="auto"
    )
    assert _ids(base) == _ids(auto)
    auto.unpersist()


def test_token_budget_ranked_auto_constant_order_falls_through(spark):
    """A heavy stratum whose order_col is constant cannot be cut on it
    — it must fall through whole and still produce the exact ranked
    selection (ties broken by hash, then key)."""
    rows = [(i, "s", 5, 7) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long, q long")
    base = sampling.token_budget_cap(df, 100, ["lang"], "w", "doc_id", order_col="q")
    auto = sampling.token_budget_cap(
        df, 100, ["lang"], "w", "doc_id", order_col="q", prefilter="auto"
    )
    assert _ids(base) == _ids(auto) and len(_ids(auto)) == 20
    auto.unpersist()


def test_token_budget_ranked_auto_null_order_raises(spark):
    rows = [(i, "s", 10, None if i == 7 else i) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long, q long")
    with pytest.raises(ValueError, match="NULL"):
        sampling.token_budget_cap(
            df, 50, ["lang"], "w", "doc_id", order_col="q", prefilter="auto"
        )
    with pytest.raises(ValueError, match="margin"):
        sampling.token_budget_cap(
            df, 50, ["lang"], "w", "doc_id", order_col="q",
            prefilter="auto", margin=1.0,
        )
    with pytest.raises(ValueError, match="bins"):
        sampling.token_budget_cap(
            df, 50, ["lang"], "w", "doc_id", order_col="q",
            prefilter="auto", bins=1,
        )


def test_token_budget_cap_partition_invariant(spark, docs):
    a = _ids(sampling.token_budget_cap(docs, 5000, ["lang"], "n_chars", "doc_id"))
    b = _ids(sampling.token_budget_cap(docs.repartition(9), 5000, ["lang"], "n_chars", "doc_id"))
    assert a == b and a


def test_sample_by_stratum_join_path_matches_case_path(spark, docs):
    """Above 64 strata the operator switches to a broadcast-join; the
    selection must be identical to the CASE path on the same map."""
    fr = {"en": 0.1, "zh": 1.0, "es": 0.5}
    big = dict(fr)
    big.update({f"pad{i}": 0.25 for i in range(70)})  # force the join path
    case_ids = _ids(sampling.sample_by_stratum(docs, fr, "lang", "doc_id"))
    join_ids = _ids(sampling.sample_by_stratum(docs, big, "lang", "doc_id"))
    assert case_ids == join_ids  # pad strata don't exist in the data
    plan = (
        sampling.sample_by_stratum(docs, big, "lang", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "Exchange hashpartitioning" not in plan


def test_token_budget_cap_auto_prefilter_exact(spark, docs):
    """auto mode (counted per-stratum hash cut, survivors-overflow
    verification) returns exactly the default selection."""
    base = sampling.token_budget_cap(docs, 5000, ["lang"], "n_chars", "doc_id", seed=42)
    auto = sampling.token_budget_cap(
        docs, 5000, ["lang"], "n_chars", "doc_id", seed=42, prefilter="auto"
    )
    assert _ids(base) == _ids(auto)
    auto.unpersist()
    with pytest.raises(ValueError, match="margin"):
        sampling.token_budget_cap(
            docs, 5000, ["lang"], "n_chars", "doc_id", prefilter="auto", margin=0.5
        )
    with pytest.raises(ValueError, match="prefilter"):
        sampling.token_budget_cap(
            docs, 5000, ["lang"], "n_chars", "doc_id", prefilter="bogus"
        )


def test_token_budget_cap_auto_raises_on_underflow(spark):
    """If the cut survivors no longer overflow the budget the greedy
    prefix might extend past the cut — the verification must raise.
    Construct it deterministically: one huge-weight row near the top
    of the hash order inflates W_s (thin cut) while the surviving
    rows' weights stay tiny."""
    n, seed = 400, 20250819
    hashes = {i: _py_hash60(i, seed) for i in range(n)}
    top = max(hashes, key=lambda i: hashes[i])  # cut first, never kept
    rows = [(i, "s", 1_000_000 if i == top else 1) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    # W_s ~ 1e6; budget 300: threshold fraction ~ margin*300/1e6 ~ 0.12%
    # of hash space -> ~0 tiny-weight survivors, sum << budget
    with pytest.raises(RuntimeError, match="raise margin"):
        sampling.token_budget_cap(
            df, 300, ["lang"], "w", "doc_id", seed=seed, prefilter="auto", margin=4.0
        )


def test_hash60_matches_duckdb(spark, docs):
    """The portable hash really is portable: same longs in DuckDB."""
    import duckdb

    got = {
        r["doc_id"]: r["h"]
        for r in docs.limit(50)
        .select("doc_id", sampling.hash60(F.col("doc_id"), 42).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            "SELECT doc_id, CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|42'), 1, 15)) AS BIGINT) "
            "FROM '/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id LIMIT 50"
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# mixing_weights (temperature-scaled data mixing)
# ---------------------------------------------------------------------------


def test_mixing_weights_alpha1_is_natural(spark, docs):
    """alpha=1 keeps natural proportions: weight == share, epochs == 1."""
    out = sampling.mixing_weights(docs, ["lang"], weight_col="n_chars", alpha=1.0).collect()
    assert len(out) > 1
    for r in out:
        assert r["weight"] == r["share"]
        assert abs(r["epochs"] - 1.0) <= 1e-6


def test_mixing_weights_alpha0_is_uniform(spark, docs):
    """alpha=0 is uniform over strata regardless of mass."""
    out = sampling.mixing_weights(docs, ["lang"], weight_col="n_chars", alpha=0.0).collect()
    k = len(out)
    for r in out:
        assert abs(r["weight"] - 1.0 / k) <= 1e-6


def test_mixing_weights_upsamples_low_resource(spark, docs):
    """alpha in (0,1) moves weight from big to small strata: every
    below-average-share stratum gets weight > share (epochs > 1), every
    above-average one gets weight < share; weights sum to 1; tokens are
    the exact per-stratum char mass."""
    out = sampling.mixing_weights(docs, ["lang"], weight_col="n_chars", alpha=0.3).collect()
    assert abs(sum(r["weight"] for r in out) - 1.0) <= 1e-5
    assert abs(sum(r["share"] for r in out) - 1.0) <= 1e-5
    mean_share = 1.0 / len(out)
    for r in out:
        if r["share"] < mean_share - 1e-9:
            assert r["epochs"] > 1.0
        elif r["share"] > mean_share + 1e-9:
            assert r["epochs"] < 1.0
    want = {
        (r["lang"],): r["m"]
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("m")).collect()
    }
    got = {(r["lang"],): r["tokens"] for r in out}
    assert got == want


def test_mixing_weights_rowcount_mass(spark, docs):
    """weight_col=None weights by row count."""
    out = sampling.mixing_weights(docs, ["lang"], weight_col=None, alpha=1.0).collect()
    want = {r["lang"]: r["c"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "c").collect()}
    assert {r["lang"]: r["tokens"] for r in out} == want
