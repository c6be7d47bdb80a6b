"""Anomaly scorers (SURVEY.md P7, M1-M7).

Three scorers, same orientation (higher = more anomalous), selectable
like the reference's mode dispatch (/root/reference/src/stream.py:299-311):

- len: float(len(text)) — the reference's fallback/"transformer
  placeholder" scorer (src/stream.py:161-163). Pure Catalyst.
- baseline: TF-IDF + isolation forest (src/stream.py:166-191),
  reimplemented in NumPy (iforest.py), fit driver-side on a
  deterministic weighted sample of DISTINCT normalized texts, broadcast
  to executors, scored in an Arrow iterator pandas UDF that dedupes
  each batch before the matrix work (log corpora are template-heavy:
  scoring cost ~ O(unique texts), not O(rows)).
- transformer: hash-embedding decayed-context cosine scorer
  (src/transformer.py:65-137), as a grouped applyInPandas kernel per
  conv_id ordered by turn_idx (the reference keeps ONE context deque;
  a single group reproduces that exactly).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..iforest import TextAnomalyModel, fit_text_anomaly_model


def with_len_score(df: DataFrame, text_col: str = "norm_text", out_col: str = "score") -> DataFrame:
    """P7 length scorer: float(len(text)) (src/stream.py:161-163)."""
    return df.withColumn(out_col, F.length(F.col(text_col)).cast("double"))


# ---------------------------------------------------------------------------
# baseline scorer: hashed TF-IDF + isolation forest
# ---------------------------------------------------------------------------

def make_broadcast_scorer(model: TextAnomalyModel):
    """Picklable list[str] -> np.ndarray batch scorer backed by a
    broadcast of the model (for the fused calibrate kernel)."""
    spark = SparkSession.getActiveSession()
    assert spark is not None
    bc = spark.sparkContext.broadcast(model)

    def score_batch(texts: list[str]) -> np.ndarray:
        return bc.value.score_texts(texts)

    return score_batch


def fit_baseline_model(
    df: DataFrame, cfg: PipelineConfig, text_col: str = "norm_text",
    cache_path: str | None = None,
) -> TextAnomalyModel:
    """Driver-side fit on the distinct-text frequency profile.

    The reference fits on the whole corpus offline before streaming
    (src/stream.py:178-187). At 100 TB that is a second full pass; we
    instead aggregate DISTINCT normalized texts with their counts (a
    single distributed groupBy, tiny result for template-shaped logs),
    cap at cfg.fit_sample_rows most frequent (deterministic tie-break
    on text), and fit the weighted model driver-side.

    `cache_path`: persist/reuse the fitted model (offline-fit +
    broadcast is the deployment pattern at scale; the reference refits
    per run, src/stream.py:178-187, which a 100 TB job would not)."""
    import os
    import pickle

    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            return pickle.load(f)
    profile = (
        df.groupBy(text_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col(text_col))
        .limit(cfg.fit_sample_rows)
        .toPandas()
    )
    texts = profile[text_col].astype(str).tolist()
    weights = profile["n"].to_numpy(dtype=np.float64)
    model = _fit_and_maybe_cache(texts, weights, cfg, cache_path)
    return model


def _fit_and_maybe_cache(texts, weights, cfg, cache_path):
    import pickle

    model = fit_text_anomaly_model(
        texts,
        weights=weights,
        n_features=cfg.hash_features,
        n_estimators=cfg.iso_n_estimators,
        max_samples=cfg.iso_max_samples,
        seed=cfg.seed,
    )
    if cache_path:
        # atomic publish: concurrent fitters (e.g. two bench servers
        # warming up in parallel) must never expose a half-written
        # pickle to a reader's os.path.exists -> load window
        import os

        tmp = f"{cache_path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(model, f)
        os.replace(tmp, cache_path)
    return model


def with_iforest_score(
    df: DataFrame,
    model: TextAnomalyModel,
    text_col: str = "norm_text",
    out_col: str = "score",
) -> DataFrame:
    """Score every row with the broadcast model via an iterator pandas
    UDF (one model deserialize per task, Arrow batches, per-batch
    dedupe of identical texts)."""
    spark = SparkSession.getActiveSession()
    assert spark is not None
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.DoubleType())
    def score_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        mdl: TextAnomalyModel = bc.value
        for s in batches:
            texts = s.fillna("").astype(str)
            uniq, inverse = np.unique(texts.to_numpy(), return_inverse=True)
            scores = mdl.score_texts(list(uniq))
            yield pd.Series(scores[inverse], index=s.index)

    return df.withColumn(out_col, score_udf(F.col(text_col)))


# ---------------------------------------------------------------------------
# transformer scorer: hash-embedding decayed context (M4-M6)
# ---------------------------------------------------------------------------

def _token_embedding(token: str, seed: int, dim: int, cache: dict) -> np.ndarray:
    vec = cache.get(token)
    if vec is None:
        digest = hashlib.sha256(f"{token}::{seed}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
        raw = rng.standard_normal(dim, dtype=np.float32)
        norm = float(np.linalg.norm(raw))
        vec = (raw / norm).astype(np.float32) if norm > 0 and math.isfinite(norm) else np.zeros(dim, np.float32)
        cache[token] = vec
    return vec


def _hash_embed_group(
    token_rows: list[list[str]],
    seed: int,
    dim: int,
    window: int,
    decay: float,
) -> np.ndarray:
    """Vectorized-within-row port of TransformerScorer.score_and_update
    (src/transformer.py:65-119): context = decay-weighted unit mean of
    the last `window` token embeddings from PRIOR rows; score = mean
    of 1 - clamp(ctx . e) over the row's tokens, clamped to [0, 1];
    context updates AFTER scoring."""
    cache: dict[str, np.ndarray] = {}
    ctx_buf = np.zeros((window, dim), dtype=np.float32)
    ctx_len = 0  # number of valid rows in the ring (<= window)
    ctx_pos = 0  # next write slot
    out = np.zeros(len(token_rows), dtype=np.float64)
    for r, toks in enumerate(token_rows):
        if toks is None:
            toks = []
        if len(toks) and ctx_len:
            # assemble buffer in arrival order (oldest first)
            if ctx_len < window:
                ordered = ctx_buf[:ctx_len]
            else:
                ordered = np.vstack((ctx_buf[ctx_pos:], ctx_buf[:ctx_pos]))
            n = ctx_len
            # decay powers computed in float64 then cast, matching the
            # reference's [decay ** (n-i)] list -> float32 array
            # (transformer.py:111)
            w = np.power(decay, np.arange(n, 0, -1, dtype=np.float64)).astype(np.float32)
            total = float(w.sum())
            if total > 0 and math.isfinite(total):
                w = w / np.float32(total)
            else:
                w = np.full(n, 1.0 / n, dtype=np.float32)
            ctx = (w[:, None] * ordered).sum(axis=0)
            nrm = float(np.linalg.norm(ctx))
            ctx = (ctx / nrm).astype(np.float32) if nrm > 0 and math.isfinite(nrm) else np.zeros(dim, np.float32)
            E = np.stack([_token_embedding(t, seed, dim, cache) for t in toks])
            # per-token float32 dot, then clamp/subtract in float64 like
            # the reference's float(np.dot(...)) (transformer.py:89-94)
            sims = np.clip((E @ ctx).astype(np.float64), -1.0, 1.0)
            val = float(np.mean(1.0 - sims))
            if not math.isfinite(val):
                val = 0.0
            out[r] = min(1.0, max(0.0, val))
        # update context ring with this row's tokens
        for t in toks:
            ctx_buf[ctx_pos] = _token_embedding(t, seed, dim, cache)
            ctx_pos = (ctx_pos + 1) % window
            if ctx_len < window:
                ctx_len += 1
    return out


def with_hash_embed_score(
    df: DataFrame,
    cfg: PipelineConfig,
    tokens_col: str = "tokens",
    order_cols: tuple[str, ...] = ("turn_idx",),
    out_col: str = "score",
) -> DataFrame:
    """Grouped stateful scorer: one decayed-context stream per
    conv_id (scope='global' collapses to the reference's single
    stream). Weight arithmetic kept in float32 to match
    src/transformer.py:111-119 bit-for-bit."""
    seed, dim = cfg.seed, cfg.embed_dim
    window, decay = cfg.embed_window, cfg.embed_decay
    order = list(order_cols)
    scope_keys = cfg.scope_keys()

    work = df
    group_keys = scope_keys
    if not group_keys:
        work = work.withColumn("__scope__", F.lit(0))
        group_keys = ["__scope__"]

    fields = [f for f in work.schema.fields if f.name != out_col]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.DoubleType())])
    out_cols = [f.name for f in out_schema.fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        rows = [list(x) if x is not None else [] for x in pdf[tokens_col]]
        pdf = pdf.assign(**{out_col: _hash_embed_group(rows, seed, dim, window, decay)})
        return pdf[out_cols]

    result = work.groupBy(*group_keys).applyInPandas(kernel, schema=out_schema)
    if "__scope__" in result.columns:
        result = result.drop("__scope__")
    return result


# ---------------------------------------------------------------------------
# integrated transformer-mode kernel: score + conformal + drift + C10
# ---------------------------------------------------------------------------

def _transformer_stream_group(
    token_rows: list[list[str]],
    alpha: float,
    cal_window: int,
    warmup: int,
    drift_kind: str,
    adwin_delta: float,
    seed: int,
    dim: int,
    embed_window: int,
    decay: float,
):
    """Per-group sequential loop: hash-embedding context score feeding
    the conformal threshold and drift detector, with BOTH calibration
    buffer and context reset on drift — the C10 hook the reference
    documents (src/transformer.py:61-63) but never wires. Returns
    (score, thr, is_anom, is_drift) arrays."""
    import bisect
    from collections import deque

    from ..adwin import make_detector

    n = len(token_rows)
    score = np.zeros(n)
    thr = np.full(n, np.inf)
    anom = np.zeros(n, dtype=bool)
    drift = np.zeros(n, dtype=bool)
    detector = make_detector(drift_kind, adwin_delta) if drift_kind != "none" else None
    cache: dict[str, np.ndarray] = {}
    ctx_buf: deque[np.ndarray] = deque(maxlen=embed_window)
    cal_sorted: list[float] = []
    cal_arrivals: deque[float] = deque()
    for i, toks in enumerate(token_rows):
        toks = list(toks or [])
        # ---- score from prior context (transformer.py:78-101) ----
        if toks and ctx_buf:
            m = len(ctx_buf)
            w = np.power(decay, np.arange(m, 0, -1, dtype=np.float64)).astype(np.float32)
            total = float(w.sum())
            w = w / np.float32(total) if total > 0 and math.isfinite(total) else np.full(m, 1.0 / m, np.float32)
            ctx = (w[:, None] * np.stack(list(ctx_buf))).sum(axis=0)
            nrm = float(np.linalg.norm(ctx))
            ctx = (ctx / nrm).astype(np.float32) if nrm > 0 and math.isfinite(nrm) else np.zeros(dim, np.float32)
            E = np.stack([_token_embedding(t, seed, dim, cache) for t in toks])
            sims = np.clip((E @ ctx).astype(np.float64), -1.0, 1.0)
            val = float(np.mean(1.0 - sims))
            score[i] = min(1.0, max(0.0, val if math.isfinite(val) else 0.0))
        for t in toks:
            ctx_buf.append(_token_embedding(t, seed, dim, cache))
        s = float(score[i])
        # ---- conformal (calibration.py:28-53, stream.py:361-363) ----
        bisect.insort(cal_sorted, s)
        cal_arrivals.append(s)
        if len(cal_arrivals) > cal_window:
            oldest = cal_arrivals.popleft()
            del cal_sorted[bisect.bisect_left(cal_sorted, oldest)]
        k = max(1, int(round((1.0 - alpha) * len(cal_sorted))))
        thr[i] = cal_sorted[k - 1]
        anom[i] = (i + 1 >= warmup) and s > thr[i]
        # ---- drift + resets (stream.py:365-368 + C10) ----
        if detector is not None and detector.update(s):
            drift[i] = True
            cal_sorted.clear()
            cal_arrivals.clear()
            ctx_buf.clear()
    return score, thr, anom, drift


def with_transformer_calibrate(
    df: DataFrame,
    cfg: PipelineConfig,
    tokens_col: str = "tokens",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """Transformer mode, fully integrated: one grouped pass per
    conv_id doing scoring + calibration + drift with context reset."""
    alpha, cal_window, warmup = cfg.alpha, cfg.window, cfg.warmup
    drift_kind, delta = cfg.drift_detector, cfg.adwin_delta
    seed, dim = cfg.seed, cfg.embed_dim
    embed_window, decay = cfg.embed_window, cfg.embed_decay
    order = list(order_cols)
    group_keys = cfg.scope_keys()

    work = df
    if not group_keys:
        work = work.withColumn("__scope__", F.lit(0))
        group_keys = ["__scope__"]

    fields = [f for f in work.schema.fields if f.name not in ("score", "thr", "is_anom", "is_drift")]
    out_schema = T.StructType(
        fields
        + [
            T.StructField("score", T.DoubleType()),
            T.StructField("thr", T.DoubleType()),
            T.StructField("is_anom", T.BooleanType()),
            T.StructField("is_drift", T.BooleanType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        rows = [list(x) if x is not None else [] for x in pdf[tokens_col]]
        score, thr, anom, drift = _transformer_stream_group(
            rows, alpha, cal_window, warmup, drift_kind, delta,
            seed, dim, embed_window, decay,
        )
        pdf = pdf.assign(score=score, thr=thr, is_anom=anom, is_drift=drift)
        return pdf[out_cols]

    result = work.groupBy(*group_keys).applyInPandas(kernel, schema=out_schema)
    if "__scope__" in result.columns:
        result = result.drop("__scope__")
    return result
