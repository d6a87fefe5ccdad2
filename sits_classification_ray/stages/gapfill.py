"""Gap-fill: irregular snapshots → equidistant grid per (url, metric).

Re-expression of the reference's equidistant-time-series preprocessing:
FORCE TSI interpolation onto an ``INT_DAY`` grid
(``force/skel/TSA_NoCom.prm:78``) and the pandas
``interpolate(method='linear', limit_direction='both')`` fallback
(``utils/class_run.py:190-194``). Edge semantics match exactly:
``fill_edges="both"`` extends the nearest valid observation to both
ends of the grid (which is what ``limit_direction='both'`` does for
linear interpolation of leading/trailing gaps).

The kernel runs over whole salted partitions (complete (url, metric)
series co-located by the bucket-major shuffle) as numpy slices — the
only state a series needs is its own rows, so the stage scales with
the number of series, not the table size. Input must be
the assembled (sorted, deduped) observation table from
``stages.series``; out-of-order input would silently mis-fill, exactly
as in the reference (SURVEY §2.9), so assembly is a hard precondition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.config import EngineConfig

_EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def gapfill_series(
    ts_us: np.ndarray,
    values: np.ndarray,
    grid_seconds: int,
    method: str = "linear",
    edges: str = "both",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One sorted series → (grid_ts_us, value, filled).

    Grid points are epoch-aligned multiples of ``grid_seconds`` covering
    ``[ceil(min_ts), floor(max_ts)]``. ``filled`` marks points that did
    not coincide exactly with an observation.
    """
    step = grid_seconds * 1_000_000
    lo = -(-int(ts_us[0]) // step) * step       # ceil to grid
    hi = (int(ts_us[-1]) // step) * step        # floor to grid
    if hi < lo:
        z = np.array([], dtype=np.int64)
        return z, z.astype(np.float64), z.astype(bool)
    grid = np.arange(lo, hi + step, step, dtype=np.int64)

    xp = ts_us.astype(np.float64)
    if method == "linear":
        # np.interp clamps to fp[0]/fp[-1] outside the observed span —
        # exactly the nearest-valid both-edges extension of the
        # reference's interpolate(limit_direction='both').
        out = np.interp(grid.astype(np.float64), xp, values)
        if edges != "both":
            out = out.copy()
            out[(grid < ts_us[0]) | (grid > ts_us[-1])] = np.nan
    elif method == "locf":
        idx = np.searchsorted(ts_us, grid, side="right") - 1
        lead = idx < 0
        out = values[np.clip(idx, 0, len(values) - 1)].astype(np.float64)
        if edges == "both":
            out[lead] = values[0]               # NOCB at the leading edge
        else:
            out = out.copy()
            out[lead] = np.nan
    elif method == "seasonal":
        # Seasonal-naive fill: grid cells that coincide exactly with
        # an observation carry its value; every other cell copies the
        # most recent REAL observation in the same weekly lane
        # (identical epoch-us offset modulo one week — same
        # hour-of-week for the hourly grid). Leading gaps backfill
        # from the next real observation in the lane when
        # ``edges="both"``; lanes with no real observation stay null.
        week = 604_800 * 1_000_000
        out = np.full(len(grid), np.nan)
        idx = np.searchsorted(ts_us, grid)
        ok = idx < len(ts_us)
        hit = np.zeros(len(grid), dtype=bool)
        hit[ok] = ts_us[idx[ok]] == grid[ok]
        out[hit] = values[idx[hit]]
        lane = grid % week
        order = np.lexsort((grid, lane))
        o = out[order]
        valid = ~np.isnan(o)
        pos = np.arange(len(o))
        lb = np.empty(len(o), dtype=bool)
        if len(o):
            lb[0] = True
            lb[1:] = lane[order][1:] != lane[order][:-1]
        seg = np.cumsum(lb) - 1
        seg_start = pos[lb][seg]
        last = np.maximum.accumulate(np.where(valid, pos, -1))
        has_prev = last >= seg_start
        res = np.where(has_prev, o[np.clip(last, 0, None)], np.nan)
        if edges == "both" and len(o):
            seg_end = (np.append(pos[lb][1:], len(o)) - 1)[seg]
            big = len(o)
            nxt = np.minimum.accumulate(
                np.where(valid, pos, big)[::-1])[::-1]
            has_next = nxt <= seg_end
            res = np.where(has_prev, res,
                           np.where(has_next,
                                    o[np.clip(nxt, 0, big - 1)], np.nan))
        out[order] = res
    elif method == "none":
        # M8 drop-empty / no-interpolation path (reference
        # utils/class_run.py:190-191: interpolation disabled keeps only
        # real observations): grid points that coincide exactly with an
        # observation carry its value; all others stay null.
        out = np.full(len(grid), np.nan)
        idx = np.searchsorted(ts_us, grid)
        ok = idx < len(ts_us)
        hit = np.zeros(len(grid), dtype=bool)
        hit[ok] = ts_us[idx[ok]] == grid[ok]
        out[hit] = values[idx[hit]]
    else:
        raise ValueError(f"unknown fill method: {method}")

    filled = ~np.isin(grid, ts_us)
    return grid, out, filled


def _series_bounds(urls: np.ndarray, metrics: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end offsets of each (url, metric) run in sorted arrays."""
    if len(urls) == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    change = np.flatnonzero((urls[1:] != urls[:-1])
                            | (metrics[1:] != metrics[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(urls)]))
    return starts, ends


def gapfill_bucket(df: pd.DataFrame, grid_seconds: int, method: str,
                   edges: str) -> pd.DataFrame:
    """One hash bucket of long rows → grid rows, one vectorized pass.

    Sorts the bucket once; per-(url, metric) runs are numpy slices fed
    to the C-speed :func:`gapfill_series` kernel — no per-group pandas
    dispatch.
    """
    df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
    urls = df["url"].to_numpy()
    mets = df["metric"].to_numpy()
    ts_us = df["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    vals = df["value"].to_numpy(np.float64)
    bucket = df["url_bucket"].to_numpy()

    starts, ends = _series_bounds(urls, mets)
    grids, outs, fills, reps = [], [], [], []
    for s, e in zip(starts, ends):
        grid, out, filled = gapfill_series(ts_us[s:e], vals[s:e],
                                           grid_seconds, method, edges)
        grids.append(grid)
        outs.append(out)
        fills.append(filled)
        reps.append(len(grid))
    reps = np.asarray(reps, dtype=np.int64)
    if reps.sum() == 0:
        return pd.DataFrame({
            "url": pd.Series([], dtype=object),
            "url_bucket": pd.Series([], dtype=np.uint32),
            "metric": pd.Series([], dtype=object),
            "grid_ts": pd.Series([], dtype="datetime64[us]"),
            "value": pd.Series([], dtype=np.float64),
            "filled": pd.Series([], dtype=bool),
        })
    return pd.DataFrame({
        "url": np.repeat(urls[starts], reps),
        "url_bucket": np.repeat(bucket[starts], reps),
        "metric": np.repeat(mets[starts], reps),
        "grid_ts": np.concatenate(grids).astype("datetime64[us]"),
        "value": np.concatenate(outs),
        "filled": np.concatenate(fills),
    })


def gapfill(ds_long: rd.Dataset, cfg: EngineConfig | None = None,
            approx_rows: int | None = None) -> rd.Dataset:
    """Long observation rows → hourly-grid rows per (url, metric).

    Input: assembled long rows ``(url, url_bucket, metric, warc_ts,
    value)``. Output: ``(url, url_bucket, metric, grid_ts, value,
    filled)``. Shuffle key is the salted (url, metric) series key —
    complete series per partition, partition count scaled by
    ``hot_key_threshold`` — and the kernel is one vectorized pass per
    partition block.
    """
    from sits_classification_ray.stages.shuffle import partitioned_map

    cfg = cfg or EngineConfig()
    step, method, edges = cfg.grid_seconds, cfg.fill_method, cfg.fill_edges

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return gapfill_bucket(df, step, method, edges)

    return partitioned_map(ds_long, kernel, url_col="url",
                           n_buckets=cfg.n_buckets,
                           approx_rows=approx_rows,
                           hot_key_threshold=cfg.hot_key_threshold)


def gapfill_colocated(ds_obs: rd.Dataset,
                      cfg: EngineConfig | None = None,
                      metrics: tuple[str, ...] = ("text_len",
                                                  "word_count")
                      ) -> rd.Dataset:
    """Exchange-free gap-fill over WIDE obs blocks that already hold
    complete urls (bucket-major stage files re-read whole, or
    partitioned_map outputs in memory — see shuffle.colocated_map):
    explode to long + fill inside one map task per block, reusing the
    url partitioning assemble_series already paid for."""
    from sits_classification_ray.stages.shuffle import colocated_map

    cfg = cfg or EngineConfig()
    step, method, edges = cfg.grid_seconds, cfg.fill_method, cfg.fill_edges

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return gapfill_bucket(df, step, method, edges)

    return colocated_map(ds_obs, kernel, explode_metrics=metrics)
