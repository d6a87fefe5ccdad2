"""Per-series visual downsampling: Largest-Triangle-Three-Buckets.

The tier rollups (stages/rollup.py) are the engine's AGGREGATE
downsample; LTTB (Steinarsson 2013) is the complementary
shape-preserving one — pick the ``n_out`` points per series that best
preserve the series' visual extremes, the standard choice for
dashboard/preview tiers over long metric histories.

Scale shape: a pure per-series kernel riding the same bucket-major
salted exchange as every series stage (``partitioned_map`` on url);
each series shrinks from n points to ``n_out`` inside its partition
block, so the operator's output is bounded by series_count × n_out
regardless of input length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def lttb_indices(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB selection for one series already sorted by
    x. First and last points are always kept; interior points are one
    per bucket, maximizing the triangle area with the previously
    selected point and the next bucket's mean."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n, dtype=np.int64)
    # bucket boundaries over the interior points (exclusive of ends)
    bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = (bounds[i + 1], bounds[i + 2]) if i < n_out - 3 \
            else (bounds[i + 1], n)
        avg_x = x[nlo:nhi].mean()
        avg_y = y[nlo:nhi].mean()
        area = np.abs((x[a] - avg_x) * (y[lo:hi] - y[a])
                      - (x[a] - x[lo:hi]) * (avg_y - y[a]))
        a = lo + int(np.argmax(area))
        out[i + 1] = a
    out[-1] = n - 1
    return out


def lttb_downsample(ds_long: rd.Dataset, n_out: int = 20) -> rd.Dataset:
    """LTTB per (url, metric) series over the long observation table;
    timestamps project to float64 epoch-µs for the area arithmetic
    (exact for the engine's µs range)."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        outs = []
        for _, g in df.groupby(["url", "metric"], sort=False):
            x = g["warc_ts"].astype("int64").to_numpy().astype(np.float64)
            y = g["value"].to_numpy(np.float64)
            idx = lttb_indices(x, y, n_out)
            outs.append(g.iloc[idx])
        if not outs:
            return df
        return pd.concat(outs, ignore_index=True)[
            ["url", "metric", "warc_ts", "value"]]

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(ds_long, kernel, url_col="url")


def m4_downsample(ds_long: rd.Dataset, unit: str = "day") -> rd.Dataset:
    """M4 downsampling (Jugel et al., VLDB 2014): per (url, metric,
    time bucket) keep only the first, last, min-value and max-value
    observations — the error-free aggregation for line-chart
    rendering, the standard preview tier alongside LTTB.

    Tie-breaks are pinned so the output is a deterministic set: the
    min point is the earliest observation attaining the bucket min
    (order by value asc, ts asc), the max point the earliest attaining
    the bucket max (value desc, ts asc). The four selections are
    union-ed and de-duplicated, so a bucket emits 1–4 rows.

    Scale shape: per-series kernel on the bucket-major salted
    exchange; output bounded by series × buckets × 4.
    """
    freq = {"hour": "h", "day": "D", "week": "W"}[unit]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if unit == "week":
            # ISO-week start (Monday), matching date_trunc('week')
            t = df["warc_ts"].dt.normalize()
            df["bucket_ts"] = t - pd.to_timedelta(
                t.dt.dayofweek, unit="D")
        else:
            df["bucket_ts"] = df["warc_ts"].dt.floor(freq)
        keys = ["url", "metric", "bucket_ts"]
        picks = []
        by_ts = df.sort_values(keys + ["warc_ts"], kind="mergesort")
        picks.append(by_ts.drop_duplicates(keys, keep="first"))
        picks.append(by_ts.drop_duplicates(keys, keep="last"))
        by_val = df.sort_values(keys + ["value", "warc_ts"],
                                kind="mergesort")
        picks.append(by_val.drop_duplicates(keys, keep="first"))
        by_val_desc = df.sort_values(
            keys + ["value", "warc_ts"], kind="mergesort",
            ascending=[True, True, True, False, True])
        picks.append(by_val_desc.drop_duplicates(keys, keep="first"))
        out = pd.concat(picks, ignore_index=True).drop_duplicates(
            keys + ["warc_ts"])
        return out.sort_values(keys + ["warc_ts"], kind="mergesort")[
            ["url", "metric", "bucket_ts", "warc_ts", "value"]]

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(ds_long, kernel, url_col="url")


def time_weighted_avg(ds_long: rd.Dataset, unit: str = "day",
                      round_to: int = 6) -> rd.Dataset:
    """Time-weighted average per (url, metric, time bucket) with
    last-observation-carried-forward weighting (TimescaleDB
    ``time_weight('LOCF')`` semantics): each observation is weighted
    by the µs interval until the NEXT observation in the same bucket,

        twa = Σᵢ₌₀ⁿ⁻² vᵢ·(tᵢ₊₁ − tᵢ) / (tₙ₋₁ − t₀)

    so irregular crawl snapshots stop biasing the plain mean toward
    burst periods — the correct "average page size this day" for a
    crawl archive. Buckets with a single observation (or zero span)
    carry that observation's value. SQL twin: ``lead()`` interval
    weights; rounded on both sides (summation order differs).

    Scale shape: per-series kernel on the bucket-major salted
    exchange; output bounded by series × buckets.
    """
    freq = {"hour": "h", "day": "D", "week": "W"}[unit]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        if unit == "week":
            t = df["warc_ts"].dt.normalize()
            df["bucket_ts"] = t - pd.to_timedelta(t.dt.dayofweek, unit="D")
        else:
            df["bucket_ts"] = df["warc_ts"].dt.floor(freq)
        keys = ["url", "metric", "bucket_ts"]
        ts_us = (df["warc_ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64).astype(np.float64))
        df["_ts"] = ts_us
        g = df.groupby(keys, sort=False)
        w = g["_ts"].shift(-1).to_numpy() - ts_us   # NaN at bucket end
        df["_vw"] = df["value"].to_numpy(np.float64) * w
        df["_w"] = w
        agg = g.agg(n_obs=("value", "size"), first_v=("value", "first"),
                    num=("_vw", "sum"), den=("_w", "sum")).reset_index()
        from sits_classification_ray.functions.transforms import sql_round
        twa = np.where(agg["den"].to_numpy() > 0.0,
                       agg["num"].to_numpy() / agg["den"].to_numpy(),
                       agg["first_v"].to_numpy(np.float64))
        agg["twa"] = sql_round(twa, round_to)
        agg["n_obs"] = agg["n_obs"].astype(np.int64)
        return agg[["url", "metric", "bucket_ts", "n_obs", "twa"]]

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(ds_long, kernel, url_col="url")


def sdt_indices(t: np.ndarray, v: np.ndarray,
                comp_dev: float) -> np.ndarray:
    """Swinging-Door-Trending selection for one series sorted by t:
    indices of the archived points. The classic process-historian
    compressor (Bristol 1990, as deployed in OSIsoft PI): a point is
    skipped while SOME line from the last ARCHIVED point can still
    pass within ``comp_dev`` of every skipped point — tracked as a
    pair of slope "doors" that only narrow; when they cross, the
    previous point is archived and the doors reset.

    Reconstruction guarantee: the archived chord is within
    ``2·comp_dev`` of every dropped point (the witness line is within
    ``comp_dev``, and the chord endpoint is within ``comp_dev`` of the
    witness — the classic factor-2 bound; pass ``comp_dev = tol/2``
    for a strict ``tol``). First and last points are always
    archived."""
    n = len(t)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    out = [0]
    a = 0                      # last archived index
    u = np.inf                 # running min upper-door slope
    lo = -np.inf               # running max lower-door slope
    for i in range(1, n):
        dt = float(t[i] - t[a])
        if dt <= 0:
            continue
        su = (v[i] - v[a] + comp_dev) / dt
        sl = (v[i] - v[a] - comp_dev) / dt
        u = min(u, su)
        lo = max(lo, sl)
        if lo > u:
            # doors crossed: archive the previous point, restart
            a = i - 1
            out.append(a)
            dt = float(t[i] - t[a])
            u = (v[i] - v[a] + comp_dev) / dt
            lo = (v[i] - v[a] - comp_dev) / dt
    if out[-1] != n - 1:
        out.append(n - 1)
    return np.asarray(out, dtype=np.int64)


def sdt_downsample(ds_long: rd.Dataset, comp_dev: float = 5.0
                   ) -> rd.Dataset:
    """Swinging-door compression per (url, metric) series: archive
    only the points needed to reconstruct the series within
    ``comp_dev`` by linear interpolation. Output: the archived points
    ``(url, metric, warc_ts, value, pos)`` where ``pos`` is the
    archived point's 0-based position in its source series (lossless
    provenance for the reconstruct/verify step).

    Scale shape: per-series kernel on the bucket-major salted url
    exchange (``partitioned_map``), identical to LTTB — output bounded
    by the series' information content, not its length."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort")
        parts = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            t = g["warc_ts"].to_numpy("datetime64[us]").astype(np.int64)
            v = g["value"].to_numpy(np.float64)
            idx = sdt_indices(t, v, comp_dev)
            parts.append(pd.DataFrame({
                "url": u, "metric": m,
                "warc_ts": g["warc_ts"].to_numpy()[idx],
                "value": v[idx], "pos": idx}))
        cols = ["url", "metric", "warc_ts", "value", "pos"]
        if not parts:
            return pd.DataFrame(columns=cols)
        return pd.concat(parts, ignore_index=True)[cols]

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
                        ("value", pa.float64()), ("pos", pa.int64())])
    return partitioned_map(ds_long, kernel, url_col="url",
                           out_schema=schema)
