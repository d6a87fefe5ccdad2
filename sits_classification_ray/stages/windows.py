"""Ordered-series window operators: running aggregates, rolling
windows, sessionization.

The engine's "streaming-shaped" surface (SURVEY §2.9): Ray Data has no
event-time machinery, so windows are computed per ordered series
inside hash-bucket partitions — the input contract is the assembled
(sorted, deduped) observation table, exactly as the reference assumes
time-ascending series everywhere after its sorted-glob load
(``utils/class_run.py:115-117``).

- :func:`running_sum` — cumulative per-series aggregate (the
  reference's accumulated thermal-time pattern,
  ``utils/class_run.py:39-61``).
- :func:`rolling_mean` — sliding window over the last k observations.
- :func:`sessionize` — session ids from inactivity gaps (tumbling
  sessions; closed-left).

All three are vectorized over whole buckets (one pandas groupby per
partition, no per-series Python dispatch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _bucketed(ds_long: rd.Dataset, kernel) -> rd.Dataset:
    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(ds_long, kernel, url_col="url")


def running_sum(ds_long: rd.Dataset, out_col: str = "running_sum"
                ) -> rd.Dataset:
    """Cumulative sum of ``value`` per (url, metric), time order."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        df = df.copy()
        df[out_col] = df.groupby(["url", "metric"], sort=False)[
            "value"].cumsum()
        return df

    return _bucketed(ds_long, kernel)


def running_extrema(ds_long: rd.Dataset, out_max: str = "running_max",
                    out_min: str = "running_min") -> rd.Dataset:
    """Cumulative max AND min of ``value`` per (url, metric) in time
    order — the monotone-envelope scan (high-/low-watermark tracking);
    same salted-partition shape as running_sum but with non-additive
    reductions."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        df = df.copy()
        g = df.groupby(["url", "metric"], sort=False)["value"]
        df[out_max] = g.cummax()
        df[out_min] = g.cummin()
        return df

    return _bucketed(ds_long, kernel)


def rolling_mean(ds_long: rd.Dataset, window: int = 4,
                 out_col: str = "rolling_mean") -> rd.Dataset:
    """Mean over the last ``window`` observations (incl. current),
    partial windows allowed at series start."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        df = df.copy()
        df[out_col] = (df.groupby(["url", "metric"], sort=False)["value"]
                       .transform(lambda s: s.rolling(window,
                                                      min_periods=1).mean()))
        return df

    return _bucketed(ds_long, kernel)


def rolling_median(ds_long: rd.Dataset, window: int = 4,
                   out_col: str = "rolling_median") -> rd.Dataset:
    """Median over the last ``window`` observations (incl. current),
    partial windows allowed at series start — the robust-smoothing
    twin of ``rolling_mean`` (SQL parity: ``median(value) OVER (…
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``)."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        df = df.copy()
        df[out_col] = (df.groupby(["url", "metric"], sort=False)["value"]
                       .transform(lambda s: s.rolling(window,
                                                      min_periods=1).median()))
        return df

    return _bucketed(ds_long, kernel)


def snapshot_deltas(ds_long: rd.Dataset, out_col: str = "delta"
                    ) -> rd.Dataset:
    """Change detection per series: value minus the previous
    observation's value (SQL ``lag`` semantics — the first row of each
    (url, metric) series gets null). The crawl-archive "what changed
    between snapshots" primitive."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        vals = df["value"].to_numpy(np.float64)
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        delta = np.empty(len(df))
        delta[0:1] = np.nan
        delta[1:] = vals[1:] - vals[:-1]
        series_start = np.zeros(len(df), dtype=bool)
        series_start[0:1] = True
        series_start[1:] = (urls[1:] != urls[:-1]) | (mets[1:] != mets[:-1])
        delta[series_start] = np.nan
        df[out_col] = delta
        return df

    return _bucketed(ds_long, kernel)


def sessionize(ds: rd.Dataset, gap_seconds: int = 86400,
               ts_col: str = "warc_ts", key_col: str = "url",
               out_col: str = "session_id") -> rd.Dataset:
    """Assign per-key session ids: a new session starts when the gap
    to the previous observation exceeds ``gap_seconds``. First session
    is 0."""
    gap_us = gap_seconds * 1_000_000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="mergesort").copy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys = df[key_col].to_numpy()
        new_key = np.empty(len(df), dtype=bool)
        new_key[0:1] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap = np.empty(len(df), dtype=bool)
        gap[0:1] = False
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = (gap & ~new_key).astype(np.int64)
        # cumulative session count per key: cumsum reset at key change
        sid = pd.Series(starts).groupby(pd.Series(keys), sort=False).cumsum()
        df[out_col] = sid.to_numpy()
        return df

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(ds, kernel, url_col=key_col)


def threshold_crossings(ds_long: rd.Dataset, threshold: float,
                        ) -> rd.Dataset:
    """Rows where a series crosses ``threshold`` between consecutive
    snapshots (the alerting/monitoring primitive): emitted row is the
    AFTER-crossing observation with ``direction`` +1 (rose to/above)
    or -1 (fell below). SQL parity: lag window + sign compare."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        g = df.groupby(["url", "metric"], sort=False)["value"]
        prev = g.shift(1)
        above = df["value"] >= threshold
        prev_above = prev >= threshold
        crossed = prev.notna() & (above != prev_above)
        out = df[crossed].copy()
        out["direction"] = np.where(above[crossed], np.int64(1),
                                    np.int64(-1))
        return out[["url", "metric", "warc_ts", "value", "direction"]]

    return _bucketed(ds_long, kernel)


def counter_rate(ds_long: rd.Dataset, out_col: str = "rate"
                 ) -> rd.Dataset:
    """Per-second rate of change between consecutive snapshots with
    counter-reset handling (PromQL ``rate()`` semantics applied
    pairwise): if the value dropped since the previous observation the
    counter is assumed to have reset, so the increase is the new value
    itself; otherwise it is the difference. The first observation of
    each (url, metric) series gets null.

    Float parity with the SQL oracle: dt is computed as
    ``int64 µs → float64 / 1_000_000.0`` and the division happens
    last, matching the oracle expression order exactly.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        vals = df["value"].to_numpy(np.float64)
        ts = df["warc_ts"].to_numpy().astype("datetime64[us]") \
                          .astype(np.int64)
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        n = len(df)
        increase = np.empty(n)
        dt_sec = np.empty(n)
        increase[0:1] = np.nan
        dt_sec[0:1] = np.nan
        if n > 1:
            dropped = vals[1:] < vals[:-1]
            increase[1:] = np.where(dropped, vals[1:],
                                    vals[1:] - vals[:-1])
            dt_sec[1:] = (ts[1:] - ts[:-1]).astype(np.float64) \
                / 1_000_000.0
        start = np.zeros(n, dtype=bool)
        start[0:1] = True
        start[1:] = (urls[1:] != urls[:-1]) | (mets[1:] != mets[:-1])
        rate = increase / dt_sec
        rate[start] = np.nan
        df[out_col] = rate
        return df

    return _bucketed(ds_long, kernel)


def zscore(ds_long: rd.Dataset, out_col: str = "z",
           ndigits: int = 6) -> rd.Dataset:
    """Per-series z-score of every observation against the series'
    own population mean/std (the anomaly-scoring primitive feeding
    alerting). z is rounded to ``ndigits`` on BOTH engine and oracle
    sides because numpy's two-pass variance and SQL's streaming
    ``stddev_pop`` differ in the last ulps; constant series
    (std == 0) get null."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        g = df.groupby(["url", "metric"], sort=False)["value"]
        mean = g.transform("mean").to_numpy(np.float64)
        n = g.transform("size").to_numpy(np.float64)
        dev = df["value"].to_numpy(np.float64) - mean
        var = pd.Series(dev * dev).groupby(
            [df["url"].to_numpy(), df["metric"].to_numpy()],
            sort=False).transform("sum").to_numpy() / n
        std = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(std > 0.0, dev / std, np.nan)
        df[out_col] = np.round(z, 6)
        return df

    return _bucketed(ds_long, kernel)


def ewma(ds_long: rd.Dataset, alpha: float = 0.3,
         out_col: str = "ewma", ndigits: int = 6) -> rd.Dataset:
    """Exponentially weighted moving average per (url, metric) series
    (``adjust=False`` recursion: s_t = (1-α)·s_{t-1} + α·x_t, s_0 =
    x_0) — the standard low-cost smoother for alerting baselines.

    Runs on pandas' grouped-EWM Cython kernel (one C pass per bucket
    block, no per-series Python dispatch). Rounded to ``ndigits`` on
    both engine and golden-oracle sides: the recursion is re-derived
    independently in the oracle and last-ulp order may differ.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        s = (df.groupby(["url", "metric"], sort=False)["value"]
               .ewm(alpha=alpha, adjust=False).mean()
               .reset_index(level=[0, 1], drop=True))
        df[out_col] = s.round(ndigits)
        return df

    return _bucketed(ds_long, kernel)


def _series_layout(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """CSR-ish layout of a block already sorted by (url, metric,
    warc_ts): returns ``(starts, lens)`` where ``starts[j]`` is the
    first row of the j-th series and series are ordered by
    **descending length** (stable).

    Sequential recursions (Holt, CUSUM) are then run as a loop over
    TIME STEPS, vectorized across all series active at that step —
    with descending-length order the active set at step t is always a
    prefix, so each step is one contiguous-state numpy op. Total work
    is Σ lenᵢ (one gather + O(1) flops per row); no per-row or
    per-series Python dispatch, and no dense (series × max_len) pivot
    that a single head-domain mega-series would blow up.
    """
    urls = df["url"].to_numpy()
    mets = df["metric"].to_numpy()
    n = len(df)
    new = np.empty(n, dtype=bool)
    new[0:1] = True
    new[1:] = (urls[1:] != urls[:-1]) | (mets[1:] != mets[:-1])
    starts = np.flatnonzero(new)
    lens = np.diff(starts, append=n)
    order = np.lexsort((np.arange(len(starts)), -lens))
    return starts[order], lens[order]


def holt_linear(ds_long: rd.Dataset, alpha: float = 0.5,
                beta: float = 0.3, ndigits: int = 6) -> rd.Dataset:
    """Holt double-exponential smoothing per (url, metric) series:
    level + linear trend state, the standard short-horizon forecaster
    one notch above :func:`ewma`.

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        l_0 = x_0,  b_0 = x_1 − x_0  (0 when the series has one point)

    Emits per-row ``level`` and ``trend``, rounded to ``ndigits`` on
    both engine and golden-oracle sides (the recursion is re-derived
    independently in the oracle; see ewma's rationale).

    Scale shape: step-vectorized recursion (see ``_series_layout``) —
    O(n) gathers, no per-row Python, smooth on a 10⁶-snapshot head
    url.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").reset_index(drop=True).copy()
        vals = df["value"].to_numpy(np.float64)
        starts, lens = _series_layout(df)
        n_series = len(starts)
        out_l = np.empty(len(df))
        out_b = np.empty(len(df))
        if n_series:
            level = vals[starts].copy()
            trend = np.zeros(n_series)
            k1 = int(np.searchsorted(-lens, -1, side="left"))  # len > 1
            trend[:k1] = vals[starts[:k1] + 1] - level[:k1]
            out_l[starts] = level
            out_b[starts] = trend
            max_len = int(lens[0]) if n_series else 0
            for t in range(1, max_len):
                k = int(np.searchsorted(-lens, -t, side="left"))  # len > t
                idx = starts[:k] + t
                x = vals[idx]
                lp = level[:k]
                lnew = alpha * x + (1.0 - alpha) * (lp + trend[:k])
                bnew = beta * (lnew - lp) + (1.0 - beta) * trend[:k]
                level[:k] = lnew
                trend[:k] = bnew
                out_l[idx] = lnew
                out_b[idx] = bnew
        df["level"] = np.round(out_l, ndigits)
        df["trend"] = np.round(out_b, ndigits)
        return df[["url", "metric", "warc_ts", "value", "level", "trend"]]

    return _bucketed(ds_long, kernel)


def cusum(ds_long: rd.Dataset, k: float = 0.5, h: float = 4.0,
          ndigits: int = 6) -> rd.Dataset:
    """Two-sided CUSUM changepoint detection per (url, metric) series
    (Page 1954): observations are standardized against the series' own
    population mean/std (as in :func:`zscore`), then

        s⁺_t = max(0, s⁺_{t−1} + z_t − k)
        s⁻_t = max(0, s⁻_{t−1} − z_t − k)     (s⁺_{−1} = s⁻_{−1} = 0)

    and ``alarm`` flags rows where either statistic exceeds ``h`` — the
    standard drift/level-shift detector for crawl-metric monitoring.
    Constant series (std == 0) carry null cusum and ``alarm = false``
    (NaN propagates through ``np.maximum`` by design). Rounded to
    ``ndigits`` on both engine and golden sides.

    Scale shape: same step-vectorized recursion as :func:`holt_linear`.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").reset_index(drop=True).copy()
        g = df.groupby(["url", "metric"], sort=False)["value"]
        mean = g.transform("mean").to_numpy(np.float64)
        nn = g.transform("size").to_numpy(np.float64)
        dev = df["value"].to_numpy(np.float64) - mean
        var = pd.Series(dev * dev).groupby(
            [df["url"].to_numpy(), df["metric"].to_numpy()],
            sort=False).transform("sum").to_numpy() / nn
        std = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(std > 0.0, dev / std, np.nan)
        starts, lens = _series_layout(df)
        n_series = len(starts)
        out_p = np.empty(len(df))
        out_m = np.empty(len(df))
        if n_series:
            sp = np.maximum(0.0, z[starts] - k)
            sm = np.maximum(0.0, -z[starts] - k)
            out_p[starts] = sp
            out_m[starts] = sm
            max_len = int(lens[0])
            for t in range(1, max_len):
                kk = int(np.searchsorted(-lens, -t, side="left"))
                idx = starts[:kk] + t
                zt = z[idx]
                sp_new = np.maximum(0.0, sp[:kk] + zt - k)
                sm_new = np.maximum(0.0, sm[:kk] - zt - k)
                sp[:kk] = sp_new
                sm[:kk] = sm_new
                out_p[idx] = sp_new
                out_m[idx] = sm_new
        df["cusum_pos"] = np.round(out_p, ndigits)
        df["cusum_neg"] = np.round(out_m, ndigits)
        alarm = (out_p > h) | (out_m > h)   # NaN compares False
        df["alarm"] = alarm
        return df[["url", "metric", "warc_ts", "value",
                   "cusum_pos", "cusum_neg", "alarm"]]

    return _bucketed(ds_long, kernel)


def seasonal_baseline(ds_long: rd.Dataset, ndigits: int = 6
                      ) -> rd.Dataset:
    """Hour-of-day seasonal profile per series: ``baseline`` is the
    mean of all the series' observations sharing the row's hour of
    day, ``anomaly`` the deviation from it — the seasonal-naive
    anomaly score (the de-seasonalization step of an STL-style
    decomposition, kept SQL-checkable). Rounded to ``ndigits`` on both
    sides: SQL's windowed AVG streams in a different order than the
    grouped-transform sum."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        hod = df["warc_ts"].dt.hour.to_numpy(np.int64)
        df["hod"] = hod
        from sits_classification_ray.functions.transforms import sql_round
        base = (df.groupby(["url", "metric", "hod"], sort=False)["value"]
                .transform("mean").to_numpy(np.float64))
        df["baseline"] = sql_round(base, ndigits)
        df["anomaly"] = sql_round(
            df["value"].to_numpy(np.float64) - base, ndigits)
        return df[["url", "metric", "warc_ts", "value", "hod",
                   "baseline", "anomaly"]]

    return _bucketed(ds_long, kernel)


def scd2_intervals(ds: rd.Dataset, key_col: str = "url",
                   ts_col: str = "warc_ts", value_col: str = "text_len"
                   ) -> rd.Dataset:
    """Slowly-changing-dimension type-2 intervalization: collapse each
    key's snapshot stream into validity intervals — one row per run of
    equal values, ``valid_from`` = first snapshot of the run,
    ``valid_to`` = start of the next run (null for the current value).
    The warehouse-history primitive over a snapshot archive.

    Kernel per salted key partition: one sort, run boundaries by
    vectorized compare-to-previous, ``valid_to`` by shifting the run
    starts — no per-key Python.
    """
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        vals = df[value_col].to_numpy()
        n = len(df)
        start = np.zeros(n, dtype=bool)
        start[0:1] = True
        start[1:] = (keys[1:] != keys[:-1]) | (vals[1:] != vals[:-1])
        runs = df[start]
        out = pd.DataFrame({
            key_col: runs[key_col].to_numpy(),
            value_col: runs[value_col].to_numpy(),
            "valid_from": runs[ts_col].to_numpy(),
        })
        nxt = out["valid_from"].shift(-1)
        # the last run of each KEY stays open (next row belongs to a
        # different key)
        same_key = np.zeros(len(out), dtype=bool)
        k = out[key_col].to_numpy()
        same_key[:-1] = k[:-1] == k[1:]
        out["valid_to"] = nxt.where(pd.Series(same_key, index=out.index))
        return out

    return partitioned_map(ds, kernel, url_col=key_col)


def rolling_mean_time(ds_long: rd.Dataset, window_seconds: int = 86400,
                      out_col: str = "rolling_mean_24h",
                      round_to: int = 6) -> rd.Dataset:
    """Time-RANGE rolling mean per series: for each observation, the
    mean of all values in ``[ts − window, ts]`` of the same series —
    SQL ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW``
    semantics (contrast :func:`rolling_mean`'s ROWS window).

    Vectorized per series run: prefix sums + one ``searchsorted`` for
    the window's left edge — O(n log n) per partition, no per-row
    Python.
    """
    from sits_classification_ray.functions.transforms import sql_round

    win_us = window_seconds * 1_000_000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        ts = df["warc_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        vals = df["value"].to_numpy(np.float64)
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        start = np.zeros(len(df), dtype=bool)
        start[0:1] = True
        start[1:] = (urls[1:] != urls[:-1]) | (mets[1:] != mets[:-1])
        out = np.empty(len(df), dtype=np.float64)
        run_starts = np.flatnonzero(start)
        run_ends = np.append(run_starts[1:], len(df))
        for s0, s1 in zip(run_starts, run_ends):
            t_run = ts[s0:s1]
            v_run = vals[s0:s1]
            csum = np.concatenate([[0.0], np.cumsum(v_run)])
            lo = np.searchsorted(t_run, t_run - win_us, side="left")
            hi = np.arange(1, len(t_run) + 1)
            out[s0:s1] = (csum[hi] - csum[lo]) / (hi - lo)
        df[out_col] = sql_round(out, round_to)
        return df

    return _bucketed(ds_long, kernel)


def merge_upsert(current: rd.Dataset, updates: rd.Dataset,
                 key_cols: list[str], version_col: str) -> rd.Dataset:
    """Warehouse ``MERGE`` (upsert): union the current table with an
    update batch and keep, per key, the row with the greatest
    ``version_col`` (ties broken toward the update side, matching SQL
    ``row_number() OVER (ORDER BY version DESC, is_update DESC)``).
    One salted exchange on the key; the kernel is a vectorized
    sort + drop_duplicates per partition."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy(deep=False)
            out["__upd"] = np.int64(side)
            return out
        return f

    unioned = current.map_batches(tag(0), batch_format="pandas").union(
        updates.map_batches(tag(1), batch_format="pandas"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(key_cols + [version_col, "__upd"],
                            ascending=[True] * len(key_cols)
                            + [False, False], kind="mergesort")
        return df.drop_duplicates(key_cols).drop(columns=["__upd"])

    return partitioned_map(unioned, kernel, keys=key_cols)


def freshness_coverage(ds_obs: rd.Dataset, ttl_seconds: int = 7 * 86400,
                       round_to: int = 6) -> rd.Dataset:
    """Interval-union freshness per url — the retention question "what
    fraction of a page's observed lifetime is our copy ≤ TTL old?".

    Each snapshot covers ``[warc_ts, warc_ts + ttl)``; overlapping
    covers merge into islands (gaps-and-islands), and
    ``coverage = union/span`` where span runs from the first snapshot
    to the last snapshot + ttl. Union/span are exact integer
    microseconds (hash-stable); only the coverage ratio is rounded.

    Shape: one salted per-url exchange, then a vectorized cummax/diff
    kernel — equal work per url regardless of snapshot count ordering.
    """
    import pyarrow as pa

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    ttl_us = int(ttl_seconds) * 1_000_000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="mergesort")
        urls = df["url"].to_numpy()
        ts = df["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # url run boundaries
        starts = np.flatnonzero(np.concatenate(
            [[True], urls[1:] != urls[:-1]]))
        ends = np.concatenate([starts[1:], [len(urls)]])
        # island starts: first snapshot of a url, or a gap > ttl since
        # the previous snapshot (same-length intervals: cummax(e) = prev e)
        prev = np.empty(len(ts), dtype=np.int64)
        prev[1:] = ts[:-1]
        prev[starts] = np.iinfo(np.int64).min // 2
        new_island = ts > prev + ttl_us
        isl_starts = np.flatnonzero(new_island)
        isl_ends = np.concatenate([isl_starts[1:], [len(ts)]])
        isl_len = ts[isl_ends - 1] + ttl_us - ts[isl_starts]
        isl_url_idx = np.searchsorted(starts, isl_starts, side="right") - 1
        union_us = np.zeros(len(starts), dtype=np.int64)
        np.add.at(union_us, isl_url_idx, isl_len)
        n_islands = np.zeros(len(starts), dtype=np.int64)
        np.add.at(n_islands, isl_url_idx, 1)
        span_us = ts[ends - 1] + ttl_us - ts[starts]
        cov = sql_round(union_us / span_us, round_to)
        return pd.DataFrame({
            "url": urls[starts],
            "n_snaps": (ends - starts).astype(np.int64),
            "n_islands": n_islands,
            "union_us": union_us,
            "span_us": span_us,
            "coverage": cov + 0.0,
        })

    schema = pa.schema([("url", pa.string()), ("n_snaps", pa.int64()),
                        ("n_islands", pa.int64()),
                        ("union_us", pa.int64()),
                        ("span_us", pa.int64()),
                        ("coverage", pa.float64())])
    pruned = ds_obs.select_columns(["url", "warc_ts"])
    return partitioned_map(pruned, kernel, url_col="url",
                           out_schema=schema)


def holt_winters(ds_long: rd.Dataset, season: int = 7,
                 alpha: float = 0.4, beta: float = 0.1,
                 gamma: float = 0.3, horizon: int = 7,
                 ndigits: int = 6) -> rd.Dataset:
    """Holt-Winters additive triple-exponential smoothing per daily
    series, emitting an ``horizon``-step forecast — the seasonal
    upgrade of :func:`holt_linear` (position-ordered daily means,
    season length ``season``).

        l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
        s_t = γ(x_t − l_t) + (1−γ)s_{t−m}

    Standard init over the first two seasons (requires n ≥ 2m):
    ``l = mean(x₀..x_{m−1})``, ``b = (mean(x_m..x_{2m−1}) −
    mean(x₀..x_{m−1}))/m``, ``s_i = x_i − l``. Forecast
    ``ŷ_{n+h} = l + h·b + s_{n−m+1+((h−1) mod m)}``.

    Scale shape: the recursion loops over TIME STEPS and vectorizes
    across every active series (descending-length prefix layout, see
    :func:`_series_layout`); seasonal state is one (series × m)
    matrix indexed by ``t mod m`` — no per-series Python dispatch,
    no dense pivot. Output: one row per (url, metric, h)."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map
    from sits_classification_ray.stages.stm import daily_means

    m = int(season)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"],
                            kind="mergesort").reset_index(drop=True)
        sizes = df.groupby(["url", "metric"], sort=False)["v"] \
            .transform("size").to_numpy()
        df = df[sizes >= 2 * m].reset_index(drop=True)
        cols = ["url", "metric", "n_days", "h", "forecast"]
        if not len(df):
            return pd.DataFrame(columns=cols)
        vals = df["v"].to_numpy(np.float64)
        starts, lens = _series_layout(df)
        ns = len(starts)
        level = np.empty(ns)
        trend = np.empty(ns)
        seas = np.empty((ns, m))
        for t in range(m):
            seas[:, t] = vals[starts + t]
        first = seas.mean(axis=1)
        level[:] = first
        second = np.zeros(ns)
        for t in range(m):
            second += vals[starts + m + t]
        trend[:] = (second / m - first) / m
        seas -= first[:, None]
        max_len = int(lens[0])
        for t in range(m, max_len):
            k = int(np.searchsorted(-lens, -t, side="left"))  # len > t
            x = vals[starts[:k] + t]
            sm = seas[:k, t % m]
            lp = level[:k]
            lnew = alpha * (x - sm) + (1.0 - alpha) * (lp + trend[:k])
            bnew = beta * (lnew - lp) + (1.0 - beta) * trend[:k]
            seas[:k, t % m] = gamma * (x - lnew) + (1.0 - gamma) * sm
            level[:k] = lnew
            trend[:k] = bnew
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        hs = np.arange(1, horizon + 1)
        # seasonal column for step n+h is (n + h - 1) mod m
        cols_idx = (lens[:, None] + hs[None, :] - 1) % m
        fc = (level[:, None] + hs[None, :] * trend[:, None]
              + seas[np.arange(ns)[:, None], cols_idx])
        out = pd.DataFrame({
            "url": np.repeat(urls[starts], horizon),
            "metric": np.repeat(mets[starts], horizon),
            "n_days": np.repeat(lens.astype(np.int64), horizon),
            "h": np.tile(hs.astype(np.int64), ns),
            "forecast": sql_round(fc.ravel(), ndigits) + 0.0,
        })
        return out

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("n_days", pa.int64()), ("h", pa.int64()),
                        ("forecast", pa.float64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def forecast_backtest(ds_long: rd.Dataset, alpha: float = 0.5,
                      beta: float = 0.3, ndigits: int = 6) -> rd.Dataset:
    """Rolling-origin one-step backtest of the :func:`holt_linear`
    forecaster per (url, metric) series — the evaluation layer the
    forecasting family was missing: "how good is the model on THIS
    page's history, against the naive no-change forecaster?".

    At every step ``t ≥ 2`` the pre-update state forecasts
    ``ŷ_t = l_{t−1} + b_{t−1}`` (t = 1 is excluded: the trend init
    ``b_0 = y_1 − y_0`` already saw ``y_1``). Reported per series:

    - ``mae``/``rmse`` of the one-step errors,
    - ``mase`` — MAE over the in-sample naive MAE
      ``mean|y_t − y_{t−1}|`` (Hyndman & Koehler 2006), the
      scale-free "beats-naive-below-1" score.

    Series need ≥ 3 points and a nonzero naive MAE (constant series
    are dropped: MASE is undefined, 0/0). Same step-vectorized
    recursion and bucket-major exchange as holt_linear; per-series
    error moments accumulate in O(1) arrays, so the output is one row
    per series regardless of history length. Golden twin re-derives
    the recursion per series independently.
    """

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["url", "metric", "n", "mae", "rmse", "mase"]
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").reset_index(drop=True)
        vals = df["value"].to_numpy(np.float64)
        starts, lens = _series_layout(df)
        n_series = len(starts)
        if not n_series:
            return pd.DataFrame({
                "url": pd.Series(dtype=object),
                "metric": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
                "mae": pd.Series(dtype=np.float64),
                "rmse": pd.Series(dtype=np.float64),
                "mase": pd.Series(dtype=np.float64)})
        level = vals[starts].copy()
        trend = np.zeros(n_series)
        k1 = int(np.searchsorted(-lens, -1, side="left"))
        trend[:k1] = vals[starts[:k1] + 1] - level[:k1]
        ae = np.zeros(n_series)
        se = np.zeros(n_series)
        nd = np.zeros(n_series)
        cnt = np.zeros(n_series, dtype=np.int64)
        max_len = int(lens[0])
        for t in range(1, max_len):
            k = int(np.searchsorted(-lens, -t, side="left"))
            idx = starts[:k] + t
            x = vals[idx]
            lp = level[:k]
            nd[:k] += np.abs(x - vals[idx - 1])
            if t >= 2:
                err = x - (lp + trend[:k])
                ae[:k] += np.abs(err)
                se[:k] += err * err
                cnt[:k] += 1
            lnew = alpha * x + (1.0 - alpha) * (lp + trend[:k])
            trend[:k] = beta * (lnew - lp) + (1.0 - beta) * trend[:k]
            level[:k] = lnew
        keep = (lens >= 3) & (nd > 0)
        naive_mae = np.where(lens > 1, nd / np.maximum(lens - 1, 1), 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            mae = ae / np.maximum(cnt, 1)
            rmse = np.sqrt(se / np.maximum(cnt, 1))
            mase = mae / np.where(naive_mae > 0, naive_mae, np.nan)
        out = pd.DataFrame({
            "url": df["url"].to_numpy()[starts],
            "metric": df["metric"].to_numpy()[starts],
            "n": lens.astype(np.int64),
            "mae": np.round(mae, ndigits),
            "rmse": np.round(rmse, ndigits),
            "mase": np.round(mase, ndigits)})
        return out[keep][cols]

    return _bucketed(ds_long, kernel)
