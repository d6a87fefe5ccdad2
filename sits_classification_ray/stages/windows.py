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
