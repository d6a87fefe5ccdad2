"""Huber robust regression via IRLS (iteratively reweighted least
squares) — the outlier-tolerant fit a crawl-metrics model needs when a
few pages are pathological (boilerplate explosions, truncated
fetches).

Scale shape: the exact-integer OLS init is a plain combiner groupby
(x and y are integer metrics, so Σx, Σy, Σxx, Σxy, n merge exactly in
any order); each IRLS round broadcasts the 2-float coefficient pair
and reduces five weighted float sums under the engine's
fixed-partition determinism contract (the trainer/k-means shape):
rows are hash-assigned to P fixed partitions, each partition
accumulates its partials over rows sorted by the series key, and the
driver merges partial vectors in ascending-pid order — bit-identical
under any block layout or cluster size, which is what lets a flat
pandas oracle reproduce the fit exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def huber_wls_partials(df: pd.DataFrame, a: float, b: float,
                       delta: float, x_col: str, y_col: str,
                       sort_cols: list[str]) -> np.ndarray:
    """One partition's (Σw, Σwx, Σwy, Σwxx, Σwxy, n_outliers) in the
    contract order (rows sorted by ``sort_cols``)."""
    df = df.sort_values(sort_cols, kind="mergesort")
    x = df[x_col].to_numpy(np.float64)
    y = df[y_col].to_numpy(np.float64)
    r = y - a - b * x
    ar = np.abs(r)
    w = np.where(ar <= delta, 1.0,
                 delta / np.where(ar > 0, ar, 1.0))
    return np.array([w.sum(), (w * x).sum(), (w * y).sum(),
                     (w * x * x).sum(), (w * x * y).sum(),
                     float((ar > delta).sum())])


def huber_fit(ds: rd.Dataset, x_col: str, y_col: str,
              sort_cols: list[str], pid_col: str = "_pid",
              delta: float = 50.0, n_iters: int = 3,
              num_partitions: int = 64,
              round_to: int = 6) -> pd.DataFrame:
    """Fit ``y ≈ a + b·x`` with Huber weights. ``ds`` must carry an
    int64 ``pid_col`` in [0, num_partitions) (the fixed hash
    partition) plus ``sort_cols`` making rows totally ordered within a
    pid. Returns (param, value) rows: intercept, slope, n_outliers."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def int_partials(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(x))], "sx": [x.sum()], "sy": [y.sum()],
            "sxx": [(x * x).sum()], "sxy": [(x * y).sum()]})

    ds = ds.materialize()
    tot = (ds.map_batches(int_partials, batch_format="pandas")
           .groupby(None).aggregate(Sum("n", alias_name="n"),
                                    Sum("sx", alias_name="sx"),
                                    Sum("sy", alias_name="sy"),
                                    Sum("sxx", alias_name="sxx"),
                                    Sum("sxy", alias_name="sxy"))
           .to_pandas().iloc[0])
    n = float(tot["n"])
    sx, sy = float(tot["sx"]), float(tot["sy"])
    sxx, sxy = float(tot["sxx"]), float(tot["sxy"])
    den = n * sxx - sx * sx
    b = (n * sxy - sx * sy) / den
    a = (sy - b * sx) / n

    out_cols = ["w", "wx", "wy", "wxx", "wxy", "outl"]
    outliers = 0.0
    for _ in range(n_iters):
        a_now, b_now = a, b

        def kern(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for pid, sub in df.groupby(pid_col, sort=True):
                rows.append((int(pid), *huber_wls_partials(
                    sub, a_now, b_now, delta, x_col, y_col,
                    sort_cols)))
            return pd.DataFrame(rows, columns=[pid_col] + out_cols)

        part = (partitioned_map(ds, kern, keys=[pid_col],
                                num_partitions=num_partitions)
                .to_pandas().sort_values(pid_col, ignore_index=True))
        m = part[out_cols].to_numpy(np.float64)
        sw, swx, swy, swxx, swxy, outliers = (
            float(np.sum(m[:, j])) for j in range(6))
        den = sw * swxx - swx * swx
        b = (sw * swxy - swx * swy) / den
        a = (swy - b * swx) / sw

    return pd.DataFrame({
        "param": ["intercept", "slope", "n_outliers"],
        "value": [float(sql_round(np.float64(a), round_to)) + 0.0,
                  float(sql_round(np.float64(b), round_to)) + 0.0,
                  outliers]})
