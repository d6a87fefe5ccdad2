"""Isolation forest anomaly scoring over an embedding corpus.

Liu-Ting-Zhou (2008) semantics with the standard production scale
split: trees are built on a tiny subsample (n_trees × 256 vectors —
the paper's psi=256), so the BUILD is driver-side on a few KB, while
the SCORE — the part that touches every row — runs distributed with
the finished forest broadcast once and each batch traversing all
trees vectorized (one gather per depth level, no per-row Python).

Determinism contract (golden twin): the subsample is the corpus'
2048 smallest splitmix64(seed, vec_id) hashes (order-free selection,
ties impossible w.h.p.), tree t uses the t-th consecutive 256-chunk
in hash order, and every node's (feature, split) derives from
splitmix64(tree, node_id) plus the node's own data extent — a pure
function of the corpus, never of block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from sits_classification_ray.stages.als import _splitmix64

PSI = 256
MAX_DEPTH = 8


def _h2u(h: np.ndarray) -> np.ndarray:
    """uint64 hash → uniform [0, 1)."""
    return (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53


def sample_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    return _splitmix64(ids.astype(np.uint64) + salt)


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1.0:
        return 0.0
    return 2.0 * (np.log(n - 1.0) + 0.5772156649015329) \
        - 2.0 * (n - 1.0) / n


def build_tree_arrays(X: np.ndarray, tree_id: int) -> dict:
    """Deterministic array-form isolation tree (explicit worklist,
    parent links resolved as children are emitted)."""
    d = X.shape[1]
    feat = [-1]
    split = [0.0]
    left = [-1]
    right = [-1]
    size = [len(X)]
    work = [(np.arange(len(X)), 0, 0)]          # rows, depth, node id
    while work:
        rows, depth, nid = work.pop(0)          # BFS: stable node ids
        size[nid] = len(rows)
        if depth >= MAX_DEPTH or len(rows) <= 1:
            continue
        h = _splitmix64(np.array(
            [tree_id * 1_000_003 + nid * 2 + 1,
             tree_id * 1_000_003 + nid * 2 + 2], dtype=np.uint64))
        f = int(h[0] % np.uint64(d))
        col = X[rows, f]
        lo, hi = float(col.min()), float(col.max())
        if hi <= lo:
            continue
        s = lo + float(_h2u(h[1:2])[0]) * (hi - lo)
        go_l = col < s
        if not go_l.any() or go_l.all():
            continue
        feat[nid] = f
        split[nid] = s
        lid = len(feat)
        feat.extend([-1, -1])
        split.extend([0.0, 0.0])
        left.extend([-1, -1])
        right.extend([-1, -1])
        size.extend([0, 0])
        left[nid] = lid
        right[nid] = lid + 1
        work.append((rows[go_l], depth + 1, lid))
        work.append((rows[~go_l], depth + 1, lid + 1))
    return {"feat": np.array(feat, dtype=np.int64),
            "split": np.array(split, dtype=np.float64),
            "left": np.array(left, dtype=np.int64),
            "right": np.array(right, dtype=np.int64),
            "size": np.array(size, dtype=np.float64)}


def path_lengths(tree: dict, X: np.ndarray) -> np.ndarray:
    """Vectorized descent: one gather per level."""
    node = np.zeros(len(X), dtype=np.int64)
    depth = np.zeros(len(X), dtype=np.float64)
    for _ in range(MAX_DEPTH + 1):
        f = tree["feat"][node]
        inner = f >= 0
        if not inner.any():
            break
        rows = np.flatnonzero(inner)
        go_l = X[rows, f[rows]] < tree["split"][node[rows]]
        node[rows] = np.where(go_l, tree["left"][node[rows]],
                              tree["right"][node[rows]])
        depth[rows] += 1.0
    sz = tree["size"][node]
    adj = np.array([_c(s) for s in np.unique(sz)])
    lut = {s: a for s, a in zip(np.unique(sz), adj)}
    return depth + np.vectorize(lut.get)(sz)


def iforest_fit(ds: rd.Dataset, n_trees: int = 8, seed: int = 7,
                id_col: str = "vec_id", vec_col: str = "embedding"
                ) -> list[dict]:
    """Distributed subsample selection (per-batch partial smallest
    hashes, driver merge of n_trees·PSI rows), driver-side build."""
    budget = n_trees * PSI

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        h = sample_hash(ids, seed)
        keep = np.argsort(h, kind="mergesort")[:budget]
        return pd.DataFrame({
            id_col: ids[keep], "_h": h[keep].astype(np.uint64),
            vec_col: df[vec_col].to_numpy(object)[keep]})

    pool = ds.map_batches(partial, batch_format="pandas").to_pandas()
    pool = pool.sort_values("_h", kind="mergesort",
                            ignore_index=True).head(budget)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in pool[vec_col]])
    return [build_tree_arrays(X[t * PSI:(t + 1) * PSI], t)
            for t in range(n_trees)]


def iforest_score(ds: rd.Dataset, trees: list[dict], k: int = 20,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  round_to: int = 6) -> pd.DataFrame:
    """Broadcast-forest scoring + top-k outliers: per batch, mean
    path length over all trees → anomaly score 2^(−E[h]/c(PSI)),
    partial top-k per batch, (rounded score desc, id asc) final."""
    ref = ray.put(trees)
    cpsi = _c(float(PSI))

    class Score:
        def __init__(self):
            self.trees = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[vec_col]])
            acc = np.zeros(len(X))
            for t in self.trees:
                acc += path_lengths(t, X)
            score = np.exp2(-(acc / len(self.trees)) / cpsi)
            ids = df[id_col].to_numpy(np.int64)
            keep = np.lexsort((ids, -score))[:k]   # ties → smallest id
            return pd.DataFrame({id_col: ids[keep],
                                 "score": score[keep]})

    part = ds.map_batches(Score, batch_format="pandas",
                          concurrency=(1, 8), num_cpus=1).to_pandas()
    part["score"] = np.round(part["score"].to_numpy(np.float64),
                             round_to)
    part = part.sort_values(["score", id_col],
                            ascending=[False, True], kind="mergesort")
    return part.head(k).reset_index(drop=True).astype(
        {id_col: np.int64, "score": np.float64})
