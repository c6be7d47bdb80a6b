"""Vectorized NumPy isolation forest + hashed TF-IDF featurizer.

The reference scores with sklearn's TfidfVectorizer + IsolationForest
(/root/reference/src/stream.py:166-191), one row at a time (~3.5 ms
per event — its dominant cost, see BASELINE.md). sklearn is not a
dependency of this engine, so both pieces are reimplemented here from
their public algorithm definitions:

- Hashed TF-IDF: the hashing trick (crc32 token -> bucket) with
  smooth idf ln((1+n)/(1+df)) + 1 and L2 row normalization (the
  TfidfVectorizer formula, over hashed buckets instead of a vocab).
- Isolation forest: Liu, Ting & Zhou, "Isolation Forest" (ICDM 2008):
  random sub-sampled binary trees, random feature + uniform split,
  height limit ceil(log2(psi)); anomaly score 2^(-E[h]/c(psi)),
  higher = more anomalous (same orientation as the reference's
  -score_samples).

Everything is batch-vectorized: transform() builds a dense float32
matrix per Arrow batch; score() walks all trees level-synchronously
over whole batches (no per-row Python). Models are small, picklable,
and meant to be fit driver-side then broadcast to executors.
"""

from __future__ import annotations

import math
import zlib
from dataclasses import dataclass, field

import numpy as np

_EULER = 0.5772156649015329


def _row_norms(X: np.ndarray) -> np.ndarray:
    """Row-wise L2 norms, bit-identical to
    np.linalg.norm(X, axis=1, keepdims=True) for real input, minus one
    full-matrix copy: linalg.norm computes
    sqrt(add.reduce((x.conj()*x).real, axis)) and np.conjugate
    materializes a copy even for real dtypes; x*x is the same IEEE
    multiply, and the same add.reduce performs the same pairwise
    summation, so every float matches."""
    return np.sqrt(np.add.reduce(X * X, axis=1, keepdims=True))


def _avg_path_length(n: np.ndarray | float) -> np.ndarray | float:
    """c(n): expected path length of unsuccessful BST search (iForest
    paper eq. 1); c(n<=1) = 0, c(2) = 1."""
    n_arr = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n_arr)
    big = n_arr > 2
    out[big] = 2.0 * (np.log(n_arr[big] - 1.0) + _EULER) - 2.0 * (n_arr[big] - 1.0) / n_arr[big]
    out[n_arr == 2] = 1.0
    return out if out.shape else float(out)


class HashedTfidf:
    """Hashing-trick TF-IDF over whitespace tokens (texts are already
    masked/normalized by the parse stage)."""

    def __init__(self, n_features: int = 1024, seed: int = 20250819):
        self.n_features = int(n_features)
        self.seed = int(seed)
        self.idf_: np.ndarray | None = None
        self._bucket_cache: dict[str, int] = {}

    def _bucket(self, token: str) -> int:
        b = self._bucket_cache.get(token)
        if b is None:
            b = zlib.crc32(f"{token}\x1f{self.seed}".encode()) % self.n_features
            self._bucket_cache[token] = b
        return b

    def _counts(self, texts: list[str]) -> np.ndarray:
        """Vectorized bucket-count: gather (row, bucket) index pairs in
        one Python pass, then a single np.add.at scatter — the
        per-token `X[r, b] += 1` loop was 2.1 s of a 4.7 s fit at 540k
        tokens. Tokens are deduplicated so crc32 + cache lookups run
        once per DISTINCT token, not per occurrence (template corpora
        repeat tokens heavily). Dedup uses pandas.factorize — a hash
        table, O(n), no sort — instead of np.unique, whose argsort over
        millions of OBJECT-dtype strings was 10+ s of the 50k-text fit
        (r6 driver-fit profile: 16 s in _counts, ~11 s of it that
        argsort). factorize yields the same bucket per token and the
        same (row, col) pair SEQUENCE, and np.add.at applies unbuffered
        in sequence order, so counts stay bit-identical to the
        per-token loop."""
        import pandas as pd

        n = len(texts)
        X = np.zeros((n, self.n_features), dtype=np.float32)
        bucket = self._bucket
        lengths = np.zeros(n, dtype=np.int64)
        all_toks: list[str] = []
        for r, text in enumerate(texts):
            toks = text.split()
            lengths[r] = len(toks)
            all_toks.extend(toks)
        if all_toks:
            codes, uniq = pd.factorize(np.asarray(all_toks, dtype=object), sort=False)
            buckets = np.fromiter(
                (bucket(t) for t in uniq), dtype=np.int64, count=len(uniq)
            )
            rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
            np.add.at(X, (rows, buckets[codes]), 1.0)
        return X

    def fit(self, texts: list[str], doc_weights: np.ndarray | None = None) -> "HashedTfidf":
        X = self._counts(texts)
        return self._fit_from_counts(X, len(texts), doc_weights)

    def fit_transform(
        self, texts: list[str], doc_weights: np.ndarray | None = None
    ) -> np.ndarray:
        """fit + transform computing the counts matrix ONCE (fit ->
        transform re-tokenizes the same texts; on the driver-side model
        fit that was a second full _counts pass). Bit-identical to
        fit(texts, w) followed by transform(texts): X is scaled
        IN PLACE (X is dead after _fit_from_counts, saving a 200 MB
        allocation at 50k x 1024) and the row norms use _row_norms,
        elementwise-identical to np.linalg.norm (see there)."""
        X = self._counts(texts)
        self._fit_from_counts(X, len(texts), doc_weights)
        X *= self.idf_[None, :]
        norms = _row_norms(X)
        norms[norms == 0.0] = 1.0
        return X / norms

    def _fit_from_counts(
        self, X: np.ndarray, n_texts: int, doc_weights: np.ndarray | None
    ) -> "HashedTfidf":
        # float32 mask matmul (BLAS sgemv) instead of a float64
        # conversion of the full matrix: document frequencies are sums
        # of integer-valued weights, exact in float32 only while every
        # partial sum stays below 2^24 — guarded, not assumed (the
        # 16M-row bench corpus already sits at 95% of the bound)
        if doc_weights is not None:
            w64 = np.asarray(doc_weights, dtype=np.float64)
            n_docs = float(w64.sum())
            # non-negativity is part of the exactness proof (ADVICE r3):
            # with signed weights the SUM can stay small while individual
            # partial sums exceed 2^24 in magnitude — send those to the
            # float64 fallback
            if (
                n_docs < float(1 << 24)
                and bool(np.all(w64 >= 0))
                and bool(np.all(w64 == np.rint(w64)))
            ):
                # np.sign == (X > 0).astype(float32) for count matrices
                # (entries >= 0), skipping the bool intermediate pass
                present = np.sign(X)
                df = (present.T @ w64.astype(np.float32)).astype(np.float64)
            else:
                df = (X > 0).astype(np.float64).T @ w64
        else:
            df = (X > 0).sum(axis=0, dtype=np.float64)
            n_docs = float(n_texts)
        self.idf_ = (np.log((1.0 + n_docs) / (1.0 + df)) + 1.0).astype(np.float32)
        return self

    def transform(self, texts: list[str]) -> np.ndarray:
        if self.idf_ is None:
            raise RuntimeError("HashedTfidf must be fit before transform")
        X = self._counts(texts)
        X *= self.idf_[None, :]
        norms = _row_norms(X)
        norms[norms == 0.0] = 1.0
        return X / norms


@dataclass
class _Tree:
    feature: np.ndarray  # int32 per node (-1 for leaf)
    threshold: np.ndarray  # float32 per node
    left: np.ndarray  # int32 child index
    right: np.ndarray
    depth: np.ndarray  # int32
    leaf_adjust: np.ndarray  # float32: c(node_size) at leaves, 0 inner


@dataclass
class IsolationForest:
    """Batch-scoring isolation forest. fit() on a (possibly weighted)
    sample matrix; score() returns anomaly scores in (0, 1)."""

    n_estimators: int = 200
    max_samples: int = 256
    seed: int = 20250819
    trees: list[_Tree] = field(default_factory=list)
    _c_psi: float = 1.0

    def fit(self, X: np.ndarray, sample_weight: np.ndarray | None = None) -> "IsolationForest":
        rng = np.random.default_rng(self.seed)
        n, d = X.shape
        p = None
        population = n
        if sample_weight is not None:
            w = np.asarray(sample_weight, dtype=np.float64)
            p = w / w.sum()
            # X rows are weighted representatives (e.g. distinct texts
            # with corpus counts): the effective population — and hence
            # the subsample size psi — is the weight total, and each
            # tree draws a weighted sample WITH replacement so frequent
            # rows dominate exactly as in an unweighted full-corpus fit.
            population = int(w.sum())
        psi = min(self.max_samples, max(population, 2))
        self._c_psi = max(float(np.asarray(_avg_path_length(float(psi)))), 1e-12)
        height_limit = int(math.ceil(math.log2(max(psi, 2))))
        self.trees = []
        for _ in range(self.n_estimators):
            if p is not None:
                idx = rng.choice(n, size=psi, replace=True, p=p)
            else:
                idx = rng.choice(n, size=psi, replace=psi > n)
            # collapse duplicate sample rows to (unique row, multiplicity):
            # duplicates always traverse together, so the tree is
            # identical but build cost is O(nodes * uniques), which is
            # what makes template-heavy (low-cardinality) corpora cheap
            uids, counts = np.unique(idx, return_counts=True)
            self.trees.append(self._build_tree(X[uids], counts, rng, height_limit))
        return self

    def _build_tree(
        self, S: np.ndarray, weights: np.ndarray, rng: np.random.Generator, height_limit: int
    ) -> _Tree:
        feature: list[int] = []
        threshold: list[float] = []
        left: list[int] = []
        right: list[int] = []
        depth: list[int] = []
        leaf_adjust: list[float] = []
        # stack of (row_indices, depth); build preorder with explicit ids
        stack: list[tuple[np.ndarray, int, int]] = []  # (rows, depth, node_id)

        def new_node(dep: int) -> int:
            feature.append(-1)
            threshold.append(0.0)
            left.append(-1)
            right.append(-1)
            depth.append(dep)
            leaf_adjust.append(0.0)
            return len(feature) - 1

        root_rows = np.arange(len(S))
        root = new_node(0)
        stack.append((root_rows, 0, root))
        d = S.shape[1]
        while stack:
            rows, dep, node = stack.pop()
            size = float(weights[rows].sum())
            if len(rows) <= 1 or dep >= height_limit:
                leaf_adjust[node] = float(np.asarray(_avg_path_length(size)))
                continue
            # try a few random features to find one with spread
            q = -1
            lo = hi = 0.0
            for _ in range(8):
                cand = int(rng.integers(0, d))
                col = S[rows, cand]
                lo, hi = float(col.min()), float(col.max())
                if hi > lo:
                    q = cand
                    break
            if q < 0:
                leaf_adjust[node] = float(np.asarray(_avg_path_length(size)))
                continue
            split = float(rng.uniform(lo, hi))
            mask = S[rows, q] < split
            feature[node] = q
            threshold[node] = split
            lnode = new_node(dep + 1)
            rnode = new_node(dep + 1)
            left[node] = lnode
            right[node] = rnode
            stack.append((rows[mask], dep + 1, lnode))
            stack.append((rows[~mask], dep + 1, rnode))
        return _Tree(
            feature=np.asarray(feature, dtype=np.int32),
            threshold=np.asarray(threshold, dtype=np.float32),
            left=np.asarray(left, dtype=np.int32),
            right=np.asarray(right, dtype=np.int32),
            depth=np.asarray(depth, dtype=np.int32),
            leaf_adjust=np.asarray(leaf_adjust, dtype=np.float32),
        )

    def _path_lengths(self, X: np.ndarray, tree: _Tree) -> np.ndarray:
        n = len(X)
        node = np.zeros(n, dtype=np.int32)
        active = tree.feature[node] >= 0
        while active.any():
            cur = node[active]
            feat = tree.feature[cur]
            go_left = X[active, feat] < tree.threshold[cur]
            nxt = np.where(go_left, tree.left[cur], tree.right[cur])
            node[active] = nxt
            active = tree.feature[node] >= 0
        return tree.depth[node].astype(np.float64) + tree.leaf_adjust[node]

    def score(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score 2^(-E[h]/c(psi)), higher = more anomalous."""
        if not self.trees:
            raise RuntimeError("IsolationForest must be fit before score")
        acc = np.zeros(len(X), dtype=np.float64)
        for tree in self.trees:
            acc += self._path_lengths(X, tree)
        mean_depth = acc / len(self.trees)
        return np.power(2.0, -mean_depth / self._c_psi)


@dataclass
class TextAnomalyModel:
    """Featurizer + forest bundle, fit driver-side and broadcast."""

    featurizer: HashedTfidf
    forest: IsolationForest

    def score_texts(self, texts: list[str]) -> np.ndarray:
        return self.forest.score(self.featurizer.transform(texts))


def fit_text_anomaly_model(
    texts: list[str],
    weights: np.ndarray | None = None,
    n_features: int = 1024,
    n_estimators: int = 200,
    max_samples: int = 256,
    seed: int = 20250819,
) -> TextAnomalyModel:
    feat = HashedTfidf(n_features=n_features, seed=seed)
    X = feat.fit_transform(texts, doc_weights=weights)
    forest = IsolationForest(n_estimators=n_estimators, max_samples=max_samples, seed=seed)
    forest.fit(X, sample_weight=weights)
    return TextAnomalyModel(featurizer=feat, forest=forest)
