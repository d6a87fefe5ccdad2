"""Train-time series augmentations (SURVEY §2.2 M20).

The reference's augmentation family (``pytorch/utils/augmentation.py``)
re-expressed over long-format series with seeded, per-series-
deterministic RNG (hash of the url seeds the generator, so results are
identical under any partitioning or execution order — the distributed
analog of the reference's per-sample ``np.random`` calls):

- :func:`time_shift` — ``year_shifting``-style bounded random
  timestamp shift (:93-158, clamped to the window);
- :func:`drop_observations` — ``remove_data_entries`` random fraction
  drop (:252-287);
- :func:`zero_out` — ``zero_out_data`` (:212-249);
- :func:`scale_gain` — ``apply_scaling`` Gaussian gain (:38-69);
- :func:`time_warp` — smooth monotone index warp (:71-90, without the
  SciPy cubic spline: a piecewise-linear warp of the same shape);
- :func:`apply_augmentations` — composition, mirroring
  ``apply_augmentation``'s single/double patterns (:289-396).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _series_rng(url: str, seed: int) -> np.random.Generator:
    h = np.uint64(pd.util.hash_array(np.array([url], dtype=object))[0])
    return np.random.default_rng(np.uint64(seed) ^ h)


def _per_series(ds_long: rd.Dataset, fn, seed: int) -> rd.Dataset:
    """Run fn(rng, ts_us, values) -> (ts_us, values) on every
    (url, metric) run inside hash-bucket partitions."""
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        ts = df["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = df["value"].to_numpy(np.float64)
        bucket = df["url_bucket"].to_numpy()
        starts, ends = _series_bounds(urls, mets)
        o_ts, o_vals, reps = [], [], []
        for s, e in zip(starts, ends):
            rng = _series_rng(str(urls[s]) + "\x1f" + str(mets[s]), seed)
            t_o, v_o = fn(rng, ts[s:e].copy(), vals[s:e].copy())
            o_ts.append(np.asarray(t_o, dtype=np.int64))
            o_vals.append(np.asarray(v_o, dtype=np.float64))
            reps.append(len(t_o))
        reps = np.asarray(reps, dtype=np.int64)
        if reps.sum() == 0:
            return df.iloc[0:0][["url", "url_bucket", "metric",
                                 "warc_ts", "value"]]
        return pd.DataFrame({
            "url": np.repeat(urls[starts], reps),
            "url_bucket": np.repeat(bucket[starts], reps),
            "metric": np.repeat(mets[starts], reps),
            "warc_ts": np.concatenate(o_ts).astype("datetime64[us]"),
            "value": np.concatenate(o_vals),
        })

    return partitioned_map(ds_long, kernel, url_col="url")


def time_shift(ds_long: rd.Dataset, max_shift_seconds: int = 16 * 86400,
               seed: int = 42) -> rd.Dataset:
    """Random per-series shift within ±max, clamped to the original
    window (reference year_shifting clamps to year bounds)."""

    def fn(rng, ts, vals):
        shift = int(rng.integers(-max_shift_seconds, max_shift_seconds + 1)
                    ) * 1_000_000
        lo, hi = ts[0], ts[-1]
        out = np.clip(ts + shift, lo, hi)
        return out, vals

    return _per_series(ds_long, fn, seed)


def drop_observations(ds_long: rd.Dataset, min_frac: float = 0.05,
                      max_frac: float = 0.8, seed: int = 42) -> rd.Dataset:
    """Drop a random fraction (uniform in [min, max]) per series."""

    def fn(rng, ts, vals):
        frac = rng.uniform(min_frac, max_frac)
        keep = rng.random(len(ts)) >= frac
        if not keep.any():
            keep[rng.integers(0, len(ts))] = True
        return ts[keep], vals[keep]

    return _per_series(ds_long, fn, seed)


def zero_out(ds_long: rd.Dataset, frac: float = 0.1,
             seed: int = 42) -> rd.Dataset:
    """Zero a random fraction of values (pad-value semantics)."""

    def fn(rng, ts, vals):
        mask = rng.random(len(vals)) < frac
        vals[mask] = 0.0
        return ts, vals

    return _per_series(ds_long, fn, seed)


def scale_gain(ds_long: rd.Dataset, sigma: float = 0.1,
               seed: int = 42) -> rd.Dataset:
    """Multiply each series by one Gaussian gain ~ N(1, sigma)."""

    def fn(rng, ts, vals):
        return ts, vals * rng.normal(1.0, sigma)

    return _per_series(ds_long, fn, seed)


def time_warp(ds_long: rd.Dataset, strength: float = 0.2,
              seed: int = 42) -> rd.Dataset:
    """Smooth monotone warp of the time axis: knots jittered, piecewise
    linear remap, endpoints fixed."""

    def fn(rng, ts, vals):
        n = len(ts)
        if n < 3:
            return ts, vals
        span = ts[-1] - ts[0]
        k = 4
        knots_x = np.linspace(0, 1, k)
        jitter = rng.normal(0, strength / k, size=k)
        jitter[0] = jitter[-1] = 0.0
        knots_y = np.clip(knots_x + jitter, 0, 1)
        knots_y = np.maximum.accumulate(knots_y)
        rel = (ts - ts[0]) / max(span, 1)
        warped = np.interp(rel, knots_x, knots_y)
        return (ts[0] + (warped * span)).astype(np.int64), vals

    return _per_series(ds_long, fn, seed)


def apply_augmentations(ds_long: rd.Dataset, names: list[str],
                        seed: int = 42) -> rd.Dataset:
    """Compose augmentations by name (reference apply_augmentation)."""
    fns = {
        "time_shift": time_shift,
        "drop_observations": drop_observations,
        "zero_out": zero_out,
        "scale_gain": scale_gain,
        "time_warp": time_warp,
    }
    out = ds_long
    for i, name in enumerate(names):
        out = fns[name](out, seed=seed + i)
    return out
