"""Per-event pure-Python oracle of the reference pipeline semantics.

This module re-states, one event at a time, exactly what the reference
does (citations into /root/reference). It exists so pytest can check
the *vectorized* Spark kernels in `operators/` against an independent,
deliberately-naive implementation. It is not used by the Spark plans.

Covered semantics:
- mask/tokenize chain            src/log_tokenize.py:12-17
- sliding conformal threshold    src/calibration.py:46-53
- fixed-threshold warmup path    src/stream.py:351-359
- anomaly decision + warmup      src/stream.py:363 (strict >, 1-based count)
- drift update + calib reset     src/stream.py:365-368
- exact lower-index percentile   src/stream.py:138-143
- TPR at target FPR              src/stream.py:146-158
- hash-embedding context scorer  src/transformer.py:65-137
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass, field

import numpy as np

_HEX = re.compile(r"0x[0-9A-Fa-f]+")
_IP = re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")
_NUM = re.compile(r"\d+")


def mask_line(line: str) -> str:
    """normalize_text (src/log_tokenize.py:12-17): strip, lower, then
    hex -> ip -> num masking in that exact order."""
    s = line.rstrip("\n").strip().lower()
    s = _HEX.sub("<hex>", s)
    s = _IP.sub("<ip>", s)
    return _NUM.sub("<num>", s)


def tokenize_line(line: str) -> list[str]:
    return [t for t in mask_line(line).split() if t]


def exact_percentile(samples: list[float], p: float) -> float:
    """perc (src/stream.py:138-143): lower-index empirical percentile
    k = int((p/100)*(n-1)) over the sorted samples."""
    if not samples:
        return float("nan")
    ordered = sorted(samples)
    k = int((p / 100.0) * (len(ordered) - 1))
    return float(ordered[min(max(k, 0), len(ordered) - 1)])


def tpr_at_fpr(
    scores: list[float], labels: list[int] | None, target_fpr: float = 0.01
) -> tuple[float, float]:
    """src/stream.py:146-158: threshold at the (1-fpr) lower-index
    quantile of negative scores; TPR uses >= (vs strict > in the
    streaming anomaly decision — the divergence is intentional)."""
    if labels is None or len(scores) != len(labels):
        return float("nan"), float("nan")
    neg = sorted(s for s, y in zip(scores, labels) if int(y) == 0)
    pos = [s for s, y in zip(scores, labels) if int(y) == 1]
    if not neg or not pos:
        return float("nan"), float("nan")
    k = int((1.0 - target_fpr) * (len(neg) - 1))
    thr = float(neg[min(max(k, 0), len(neg) - 1)])
    return sum(1 for s in pos if s >= thr) / float(len(pos)), thr


def conformal_threshold(buffer: list[float], alpha: float) -> float:
    """SlidingConformal.threshold (src/calibration.py:46-53):
    k = max(1, int(round((1-alpha)*n))) over the sorted buffer, return
    the k-th smallest; empty buffer -> +inf. Python round() is
    half-even — preserved (matters when (1-alpha)*n hits .5)."""
    n = len(buffer)
    if n == 0:
        return float("inf")
    k = max(1, int(round((1.0 - alpha) * n)))
    return sorted(buffer)[k - 1]


def fixed_threshold(warm_scores: list[float], alpha: float) -> float:
    """no-calib freeze formula (src/stream.py:354-357):
    k = int((1-alpha)*(n-1)) — a *different* index formula from
    conformal_threshold; the divergence is part of the contract."""
    ordered = sorted(warm_scores)
    k = int((1.0 - alpha) * (len(ordered) - 1))
    return float(ordered[min(max(k, 0), len(ordered) - 1)])


@dataclass
class StreamResult:
    thresholds: list[float] = field(default_factory=list)
    is_anom: list[bool] = field(default_factory=list)
    is_drift: list[bool] = field(default_factory=list)
    n_anom: int = 0
    n_drift: int = 0


def run_stream(
    scores: list[float],
    alpha: float = 0.01,
    window: int = 5000,
    warmup: int = 200,
    no_calib: bool = False,
    detector=None,
) -> StreamResult:
    """The reference event loop (src/stream.py:335-374) over a given
    score sequence. Ordering invariants preserved exactly:
    calib.update BEFORE threshold read (row's own score is in its
    window); drift update AFTER the anomaly decision; calibrator reset
    applies from the NEXT event; warmup counts events 1-based and the
    current event counts toward its own warmup check."""
    out = StreamResult()
    buf: list[float] = []  # conformal window since last reset
    warm: list[float] = []
    frozen: float | None = None
    for i, s in enumerate(scores, start=1):
        if no_calib:
            warm.append(s)
            if frozen is None and len(warm) >= warmup:
                frozen = fixed_threshold(warm, alpha)
            thr = frozen if frozen is not None else float("inf")
            flag = frozen is not None and s > thr
        else:
            buf.append(s)
            if len(buf) > window:
                buf.pop(0)
            thr = conformal_threshold(buf, alpha)
            flag = i >= warmup and s > thr
        drifted = False
        if detector is not None:
            detector.update(s)
            drifted = bool(getattr(detector, "drift_detected", False)) or bool(
                getattr(detector, "change_detected", False)
            )
        if drifted:
            out.n_drift += 1
            buf.clear()
        if flag:
            out.n_anom += 1
        out.thresholds.append(thr)
        out.is_anom.append(flag)
        out.is_drift.append(drifted)
    return out


class HashEmbedContext:
    """Per-event hash-embedding context scorer, numerically faithful to
    TransformerScorer (src/transformer.py:40-137): sha256(token::seed)
    -> 8-byte subseed -> default_rng standard_normal(float32) -> L2
    unit; context = decay-weighted mean of the last `window` token
    embeddings (float32 arithmetic); score = mean over the line's
    tokens of 1 - clamp(ctx . e, -1, 1), clamped to [0,1]; context
    updated AFTER scoring; empty line or empty context -> 0.0."""

    def __init__(self, embed_dim: int = 32, window: int = 32, decay: float = 0.90, seed: int = 20250819):
        self.embed_dim = embed_dim
        self.window = window
        self.decay = decay
        self.seed = seed
        self._ctx_tokens: list[np.ndarray] = []
        self._cache: dict[str, np.ndarray] = {}

    def reset(self) -> None:
        self._ctx_tokens.clear()

    def embed(self, token: str) -> np.ndarray:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        digest = hashlib.sha256(f"{token}::{self.seed}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
        v = rng.standard_normal(self.embed_dim, dtype=np.float32)
        norm = float(np.linalg.norm(v))
        unit = (v / norm).astype(np.float32) if norm > 0 and math.isfinite(norm) else np.zeros_like(v)
        self._cache[token] = unit
        return unit

    def _context(self) -> np.ndarray:
        n = len(self._ctx_tokens)
        w = np.array([self.decay ** (n - i) for i in range(1, n + 1)], dtype=np.float32)
        total = float(w.sum())
        w = w / total if total > 0 and math.isfinite(total) else np.full(n, 1.0 / n, dtype=np.float32)
        ctx = (w[:, None] * np.stack(self._ctx_tokens)).sum(axis=0)
        norm = float(np.linalg.norm(ctx))
        return (ctx / norm).astype(np.float32) if norm > 0 and math.isfinite(norm) else np.zeros_like(ctx)

    def score_and_update(self, tokens: list[str]) -> float:
        toks = list(tokens or [])
        if not toks or not self._ctx_tokens:
            score = 0.0
        else:
            ctx = self._context()
            dists = [1.0 - min(1.0, max(-1.0, float(np.dot(ctx, self.embed(t))))) for t in toks]
            score = float(np.mean(dists))
            if not math.isfinite(score):
                score = 0.0
            score = min(1.0, max(0.0, score))
        for t in toks:
            self._ctx_tokens.append(self.embed(t))
            if len(self._ctx_tokens) > self.window:
                self._ctx_tokens.pop(0)
        return score


def run_transformer_stream(
    token_seqs: list[list[str]],
    alpha: float = 0.01,
    window: int = 5000,
    warmup: int = 200,
    embed_dim: int = 32,
    embed_window: int = 32,
    decay: float = 0.90,
    seed: int = 20250819,
    detector=None,
) -> tuple[list[float], StreamResult]:
    """The integrated transformer-mode stream: hash-embedding context
    scoring (src/transformer.py:65-101) feeding the conformal loop
    (src/stream.py:361-368), with BOTH the calibrator and the context
    buffer reset on drift — the C10 hook the reference documents
    (src/transformer.py:61-63) but never wires into main()."""
    ctx = HashEmbedContext(embed_dim, embed_window, decay, seed)
    scores: list[float] = []
    out = StreamResult()
    buf: list[float] = []
    for i, toks in enumerate(token_seqs, start=1):
        s = ctx.score_and_update(toks)
        scores.append(s)
        buf.append(s)
        if len(buf) > window:
            buf.pop(0)
        thr = conformal_threshold(buf, alpha)
        flag = i >= warmup and s > thr
        drifted = False
        if detector is not None:
            detector.update(s)
            drifted = bool(getattr(detector, "drift_detected", False))
        if drifted:
            out.n_drift += 1
            buf.clear()
            ctx.reset()  # C10
        if flag:
            out.n_anom += 1
        out.thresholds.append(thr)
        out.is_anom.append(flag)
        out.is_drift.append(drifted)
    return scores, out
