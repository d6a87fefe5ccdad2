"""Histogram-based gradient-boosted stumps (LightGBM-style GBDT).

The canonical distributed tree-boosting shape (Ke et al., LightGBM,
NeurIPS 2017): features are pre-binned against global edges, every
round each block emits one bounded (features × bins) histogram of
residual statistics, the driver merges histograms and picks the best
split, and the chosen stump is broadcast back. No row ever leaves its
block; driver traffic per round is O(P · F · B) narrow rows.

Determinism contract (enables a golden-file oracle for an iterative
float algorithm): residuals are quantized to INTEGER micro-units
before the histogram sum, so cross-block accumulation is int64
addition — order-free under any block layout or cluster size. Every
driver-side float (gains, leaf values) is computed from those exact
integers, hence bit-identical everywhere. Reference lifecycle analog:
``pytorch/utils/trainer.py:145-199`` (fit loop producing a model
artifact per round).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

MICRO = 1_000_000


def _stack(df: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])


def _bin_matrix(X: np.ndarray, mins: np.ndarray, widths: np.ndarray,
                n_bins: int) -> np.ndarray:
    """Global-edge binning: bin = clip(floor((x - min)/width), 0, B-1);
    zero-width (constant) features land in bin 0."""
    w = np.where(widths > 0, widths, 1.0)
    b = np.floor((X - mins[None, :]) / w[None, :] * n_bins).astype(np.int64)
    b[:, widths <= 0] = 0
    return np.clip(b, 0, n_bins - 1)


def _apply_stumps(X: np.ndarray, stumps: list[dict],
                  base: float) -> np.ndarray:
    """Model application: F = base + Σ (x[feat] > thr ? right : left)."""
    F = np.full(len(X), base, dtype=np.float64)
    for s in stumps:
        right = X[:, s["feature"]] > s["threshold"]
        F += np.where(right, s["right_value"], s["left_value"])
    return F


def _feature_extents(ds: rd.Dataset, vec_col: str,
                     dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact distributed per-feature min/max (order-free reductions)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        X = _stack(df, vec_col)
        return pd.DataFrame({"feature": np.arange(dim, dtype=np.int64),
                             "lo": X.min(axis=0), "hi": X.max(axis=0)})

    ext = (ds.map_batches(partial, batch_format="pandas").to_pandas()
           .groupby("feature").agg(lo=("lo", "min"), hi=("hi", "max"))
           .sort_index())
    return ext["lo"].to_numpy(), ext["hi"].to_numpy()


def gbdt_fit(ds: rd.Dataset, n_rounds: int = 8, n_bins: int = 16,
             learning_rate: float = 0.5, vec_col: str = "embedding",
             target_col: str = "label", round_to: int = 6,
             min_leaf: int = 1) -> pd.DataFrame:
    """Fit ``n_rounds`` depth-1 regression trees to the squared loss
    and return the model as a table ``(round, feature, threshold,
    left_value, right_value, gain)``.

    Per round ONE ``map_batches`` pass re-applies the current (tiny,
    broadcast) model, quantizes residuals to int64 micro-units and
    emits the per-block (feature, bin) → (count, residual-sum)
    histogram; the driver merges the bounded histogram table, scans
    prefix sums for the variance-reduction-optimal split (ties break
    feature ASC, bin ASC) and appends the stump. The input is
    materialized once so each epoch pass re-reads cached blocks.
    """
    ds = ds.materialize()
    first = ds.take(1)[0]
    dim = len(first[vec_col])

    mins, maxs = _feature_extents(ds, vec_col, dim)
    widths = maxs - mins
    # y statistics: targets are quantized once (int labels are exact)
    def ysum(df: pd.DataFrame) -> pd.DataFrame:
        y = df[target_col].to_numpy(np.float64)
        ym = np.round(y * MICRO).astype(np.int64)
        return pd.DataFrame({"n": [np.int64(len(y))],
                             "s": [ym.sum(dtype=np.int64)]})

    tot = ds.map_batches(ysum, batch_format="pandas").to_pandas().sum()
    n_total = int(tot["n"])
    base = (int(tot["s"]) / MICRO) / n_total

    stumps: list[dict] = []
    for rnd in range(n_rounds):
        model_ref = ray.put((list(stumps), base, mins, widths))

        def hist(df: pd.DataFrame, _ref=model_ref) -> pd.DataFrame:
            st, b0, mn, wd = ray.get(_ref)
            X = _stack(df, vec_col)
            y = df[target_col].to_numpy(np.float64)
            r = np.round((y - _apply_stumps(X, st, b0))
                         * MICRO).astype(np.int64)
            bins = _bin_matrix(X, mn, wd, n_bins)
            feats, cnts, sums, bb = [], [], [], []
            for j in range(dim):
                c = np.bincount(bins[:, j], minlength=n_bins)
                # float64 accumulation is exact here: |r|·rows per
                # block stays far under 2^53
                s = np.bincount(bins[:, j], weights=r.astype(np.float64),
                                minlength=n_bins)
                feats.append(np.full(n_bins, j, dtype=np.int64))
                bb.append(np.arange(n_bins, dtype=np.int64))
                cnts.append(c.astype(np.int64))
                sums.append(np.round(s).astype(np.int64))
            return pd.DataFrame({
                "feature": np.concatenate(feats),
                "bin": np.concatenate(bb),
                "cnt": np.concatenate(cnts),
                "s": np.concatenate(sums)})

        h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
             .groupby(["feature", "bin"], as_index=False)[["cnt", "s"]]
             .sum().sort_values(["feature", "bin"]))
        C = h.pivot(index="feature", columns="bin",
                    values="cnt").to_numpy(np.int64)
        S = h.pivot(index="feature", columns="bin",
                    values="s").to_numpy(np.int64)
        cl = C.cumsum(axis=1)[:, :-1]           # left counts per split
        sl = S.cumsum(axis=1)[:, :-1]
        ct, st_ = C.sum(axis=1, keepdims=True), S.sum(axis=1, keepdims=True)
        cr, sr = ct - cl, st_ - sl
        valid = (cl >= min_leaf) & (cr >= min_leaf)
        with np.errstate(divide="ignore", invalid="ignore"):
            gain = (np.where(valid, sl.astype(np.float64) ** 2 / cl, 0.0)
                    + np.where(valid, sr.astype(np.float64) ** 2 / cr, 0.0)
                    - st_.astype(np.float64) ** 2 / ct) / (MICRO ** 2)
        gain = np.where(valid, gain, -np.inf)
        flat = np.argmax(gain)                   # first max = ties to
        j, b = divmod(int(flat), n_bins - 1)     # (feature ASC, bin ASC)
        if not np.isfinite(gain[j, b]) or gain[j, b] <= 0:
            break
        lv = learning_rate * (int(sl[j, b]) / MICRO) / int(cl[j, b])
        rv = learning_rate * (int(sr[j, b]) / MICRO) / int(cr[j, b])
        thr = float(mins[j] + widths[j] * (b + 1) / n_bins)
        stumps.append({"round": rnd, "feature": j, "threshold": thr,
                       "left_value": lv, "right_value": rv,
                       "gain": float(gain[j, b])})

    out = pd.DataFrame(stumps, columns=["round", "feature", "threshold",
                                        "left_value", "right_value",
                                        "gain"])
    for c in ["round", "feature"]:
        out[c] = out[c].astype(np.int64)
    for c in ["threshold", "left_value", "right_value", "gain"]:
        out[c] = np.round(out[c].to_numpy(np.float64), round_to)
    return out


def gbdt_predict(ds: rd.Dataset, model: pd.DataFrame, base: float,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_to: int = 6) -> rd.Dataset:
    """Score every row against a fitted stump table (model broadcast
    once, one vectorized pass)."""
    stumps = model.to_dict("records")
    ref = ray.put((stumps, float(base)))

    class Predict:
        def __init__(self):
            self.stumps, self.base = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            X = _stack(df, vec_col)
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(np.int64),
                "pred": np.round(_apply_stumps(X, self.stumps, self.base),
                                 round_to)})

    return ds.map_batches(Predict, batch_format="pandas",
                          concurrency=(1, 8), num_cpus=1)
