"""Per-series temporal analytics: STM stats, harmonic fit, SeriesUDF.

- :func:`temporal_metrics` — the FORCE "spectral temporal metrics"
  (``STM Q25 Q50 Q75 AVG STD``, reference ``force/skel/TSA_NoCom.prm:90-91``)
  over each (url, metric) stream.
- :class:`HarmonicFit` — the reference's harmonic regression +
  equidistant resample UDF (``force/skel/dswi_harmonic_tsi.py:35-147``):
  fit ``a0 + Σₖ aₖ·cos(2πkt/T) + bₖ·sin(2πkt/T)`` on the series via
  least squares, predict on a fixed grid, append the residual std as an
  extra output (A9, ``dswi_harmonic_tsi.py:147``).
- :class:`SeriesUDF` — the user-extension surface mirroring FORCE's
  ``forcepy_pixel`` per-pixel UDF hook (``force/skel/udf_pixel.py:4-24``):
  implement ``apply(ts_us, values) -> (out_ts_us, out_values)`` and run
  it over every series with :func:`apply_series_udf`.
"""

from __future__ import annotations

from typing import Protocol

import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.config import EngineConfig


class BatchUDF(Protocol):
    """Per-batch user hook (FORCE ``forcepy_block`` analog,
    ``force/skel/udf_block.py:4-28``): an Arrow-table-in /
    Arrow-table-out callable run via ``map_batches``. Register with
    :func:`apply_batch_udf`."""

    def __call__(self, batch) -> object: ...


def apply_batch_udf(ds: rd.Dataset, udf: BatchUDF,
                    batch_size: int | None = None) -> rd.Dataset:
    """Run a BatchUDF over Arrow batches (zero-copy)."""
    return ds.map_batches(udf, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


class SeriesUDF(Protocol):
    """Per-series user hook (FORCE ``forcepy_pixel`` analog).

    ``apply`` receives one url's sorted timestamps (int64 µs) and
    values for one metric and returns output timestamps + values of
    any length. ``out_metric`` names the output stream.
    """

    out_metric: str

    def apply(self, ts_us: np.ndarray, values: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]: ...


def apply_series_udf(ds_long: rd.Dataset, udf: SeriesUDF,
                     cfg: EngineConfig | None = None) -> rd.Dataset:
    """Run a SeriesUDF over every (url, metric) stream.

    One hash-partitioned shuffle; inside each partition the kernel
    walks (url, metric) runs as numpy slices (same execution shape as
    gap-fill — SURVEY §2.10 target design)."""
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
        out_ts, out_vals, reps = [], [], []
        for s, e in zip(starts, ends):
            t_o, v_o = udf.apply(ts[s:e], vals[s:e])
            out_ts.append(np.asarray(t_o, dtype=np.int64))
            out_vals.append(np.asarray(v_o, dtype=np.float64))
            reps.append(len(t_o))
        reps = np.asarray(reps, dtype=np.int64)
        if reps.sum() == 0:
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "url_bucket": pd.Series([], dtype=np.uint32),
                "metric": pd.Series([], dtype=object),
                "warc_ts": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype=np.float64),
            })
        return pd.DataFrame({
            "url": np.repeat(urls[starts], reps),
            "url_bucket": np.repeat(bucket[starts], reps),
            "metric": udf.out_metric,
            "warc_ts": np.concatenate(out_ts).astype("datetime64[us]"),
            "value": np.concatenate(out_vals),
        })

    return partitioned_map(ds_long, kernel, url_col="url")


def temporal_metrics(ds_long: rd.Dataset, round_to: int | None = 6,
                     cfg: EngineConfig | None = None) -> rd.Dataset:
    """STM per (url, metric): count, mean, std, min, max, q25/q50/q75.

    Quantiles use linear interpolation (numpy default — same definition
    as SQL ``quantile_cont``); mean is the exact ``sum/count`` double
    division; std is the population std (ddof=0). Non-exact floats are
    rounded identically on both engines for the oracle compare.
    """
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        vals = df["value"].to_numpy(np.float64)
        starts, ends = _series_bounds(urls, mets)
        n = len(starts)
        out = {
            "url": urls[starts], "metric": mets[starts],
            "count": (ends - starts).astype(np.int64),
            "mean": np.empty(n), "std": np.empty(n),
            "min": np.empty(n), "max": np.empty(n),
            "q25": np.empty(n), "q50": np.empty(n), "q75": np.empty(n),
        }
        for i, (s, e) in enumerate(zip(starts, ends)):
            v = np.sort(vals[s:e])
            out["mean"][i] = v.sum() / len(v)
            out["std"][i] = np.sqrt(((v - v.mean()) ** 2).sum() / len(v))
            out["min"][i] = v[0]
            out["max"][i] = v[-1]
            q = np.quantile(v, [0.25, 0.5, 0.75])
            out["q25"][i], out["q50"][i], out["q75"][i] = q
        res = pd.DataFrame(out)
        if round_to is not None:
            for c in ["mean", "std", "q25", "q50", "q75"]:
                res[c] = res[c].round(round_to)
        return res

    return partitioned_map(ds_long, kernel, url_col="url")


class HarmonicFit:
    """Harmonic regression + equidistant resample (SeriesUDF).

    Least-squares fit of ``a0 + Σₖ aₖcos(2πk·t/period) +
    bₖsin(2πk·t/period)`` (reference ``dswi_harmonic_tsi.py:35-52``
    uses the same basis with k ≤ 3 over a 365-day period), predicted on
    an epoch-aligned grid spanning the observed range.
    """

    def __init__(self, period_seconds: float = 7 * 86400.0, k: int = 2,
                 grid_seconds: int = 86400, out_metric: str = "harmonic"):
        self.period_us = period_seconds * 1e6
        self.k = k
        self.grid_us = grid_seconds * 1_000_000
        self.out_metric = out_metric

    def _design(self, t: np.ndarray) -> np.ndarray:
        cols = [np.ones_like(t)]
        for k in range(1, self.k + 1):
            w = 2.0 * np.pi * k * t / self.period_us
            cols.append(np.cos(w))
            cols.append(np.sin(w))
        return np.stack(cols, axis=1)

    def apply(self, ts_us: np.ndarray, values: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
        n_params = 1 + 2 * self.k
        if len(ts_us) < n_params:
            return np.array([], dtype=np.int64), np.array([])
        t0 = ts_us[0]
        x = (ts_us - t0).astype(np.float64)
        coef, *_ = np.linalg.lstsq(self._design(x), values, rcond=None)
        lo = -(-int(ts_us[0]) // self.grid_us) * self.grid_us
        hi = (int(ts_us[-1]) // self.grid_us) * self.grid_us
        if hi < lo:
            return np.array([], dtype=np.int64), np.array([])
        grid = np.arange(lo, hi + self.grid_us, self.grid_us, dtype=np.int64)
        pred = self._design((grid - t0).astype(np.float64)) @ coef
        return grid, pred

    def residual_std(self, ts_us: np.ndarray, values: np.ndarray) -> float:
        """A9 analog: std of fit residuals (``dswi_harmonic_tsi.py:147``)."""
        n_params = 1 + 2 * self.k
        if len(ts_us) < n_params:
            return float("nan")
        x = (ts_us - ts_us[0]).astype(np.float64)
        design = self._design(x)
        coef, *_ = np.linalg.lstsq(design, values, rcond=None)
        return float(np.std(values - design @ coef))


def trend_slope(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Per-series linear trend: least-squares slope/intercept of value
    against time-in-days (the change-direction summary the reference's
    harmonic fit reduces to at k=0 trends; SURVEY A9 family). Slope is
    value units per day; x is epoch-µs / 86_400e6 so magnitudes stay
    in a range where round-6 parity with SQL ``regr_slope`` holds.
    The t=0 intercept is deliberately NOT emitted: extrapolating to
    epoch start inflates magnitudes to ~1e5 where the last-ulp gap
    between two-pass and streaming covariance crosses round-6
    boundaries.

    Single-observation series (var(x) == 0) get null slope, matching
    SQL regr_* semantics.
    """
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        vals = df["value"].to_numpy(np.float64)
        x = df["warc_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64).astype(np.float64) / 86_400e6
        starts, ends = _series_bounds(urls, mets)
        n = len(starts)
        out = {
            "url": urls[starts], "metric": mets[starts],
            "n_obs": (ends - starts).astype(np.int64),
            "slope": np.full(n, np.nan),
        }
        for i, (s, e) in enumerate(zip(starts, ends)):
            xv, yv = x[s:e], vals[s:e]
            mx, my = xv.mean(), yv.mean()
            dx = xv - mx
            varx = (dx * dx).sum()
            if varx > 0.0:
                out["slope"][i] = (dx * (yv - my)).sum() / varx
        res = pd.DataFrame(out)
        res["slope"] = res["slope"].round(round_to)
        return res

    return partitioned_map(ds_long, kernel, url_col="url")


def metric_correlation(ds_obs: rd.Dataset, col_a: str = "text_len",
                       col_b: str = "word_count", round_to: int = 6
                       ) -> rd.Dataset:
    """Per-url Pearson correlation between two metric columns of the
    wide observation table (e.g. does text length track word count) —
    the cross-metric analog of the reference's per-band STM stats.
    Two-pass covariance, rounded like SQL ``corr``; series where either
    metric is constant get null (SQL corr semantics).
    """
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="mergesort")
        urls = df["url"].to_numpy()
        a = df[col_a].to_numpy(np.float64)
        b = df[col_b].to_numpy(np.float64)
        starts, ends = _series_bounds(urls, np.zeros(len(urls)))
        n = len(starts)
        out = {"url": urls[starts],
               "n_obs": (ends - starts).astype(np.int64),
               "corr": np.full(n, np.nan)}
        for i, (s, e) in enumerate(zip(starts, ends)):
            av, bv = a[s:e], b[s:e]
            da, db = av - av.mean(), bv - bv.mean()
            denom = np.sqrt((da * da).sum() * (db * db).sum())
            if denom > 0.0:
                out["corr"][i] = (da * db).sum() / denom
        res = pd.DataFrame(out)
        res["corr"] = res["corr"].round(round_to)
        return res

    return partitioned_map(ds_obs, kernel, url_col="url")


def autocorr_lag1(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Per-series lag-1 autocorrelation: Pearson correlation between
    consecutive observation pairs (xₜ₋₁, xₜ) in time order — the
    self-similarity summary (near 1 = slowly drifting page, near 0 =
    noisy). Two-pass covariance; the n−1 factors cancel exactly as in
    :func:`metric_correlation`, so this is the SQL
    ``corr(value, lag(value))`` twin, rounded identically on both
    sides. Series with fewer than 2 pairs or a constant side get null
    (SQL corr semantics)."""
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        vals = df["value"].to_numpy(np.float64)
        starts, ends = _series_bounds(urls, mets)
        n = len(starts)
        out = {"url": urls[starts], "metric": mets[starts],
               "n_pairs": np.maximum(ends - starts - 1, 0).astype(np.int64),
               "autocorr": np.full(n, np.nan)}
        for i, (s, e) in enumerate(zip(starts, ends)):
            if e - s < 3:     # <2 pairs: sample corr undefined
                continue
            prev, cur = vals[s:e - 1], vals[s + 1:e]
            da, db = cur - cur.mean(), prev - prev.mean()
            denom = np.sqrt((da * da).sum() * (db * db).sum())
            if denom > 0.0:
                out["autocorr"][i] = (da * db).sum() / denom
        res = pd.DataFrame(out)
        from sits_classification_ray.functions.transforms import sql_round
        res["autocorr"] = sql_round(res["autocorr"].to_numpy(), round_to)
        return res

    return partitioned_map(ds_long, kernel, url_col="url")


def mad_anomaly(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Robust per-row anomaly score: median / median-absolute-deviation
    of the observation's own series, ``robust_z = (x − med) / MAD``
    (the outlier-resistant alternative to :func:`windows.zscore` —
    one wild snapshot cannot inflate its own threshold). Null where
    MAD == 0 (at least half the series is the median value).

    Medians are linear-interpolated (numpy/pandas default), matching
    SQL ``quantile_cont(0.5)`` exactly for this engine's
    integer-valued metrics; ``robust_z`` is rounded on both sides.
    Fully vectorized: two grouped-median transforms per block."""

    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        g = df.groupby(["url", "metric"], sort=False)["value"]
        med = g.transform("median").to_numpy(np.float64)
        absdev = np.abs(df["value"].to_numpy(np.float64) - med)
        mad = pd.Series(absdev).groupby(
            [df["url"].to_numpy(), df["metric"].to_numpy()],
            sort=False).transform("median").to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            rz = np.where(mad > 0.0,
                          (df["value"].to_numpy(np.float64) - med) / mad,
                          np.nan)
        from sits_classification_ray.functions.transforms import sql_round
        df["med"] = med
        df["mad"] = mad
        df["robust_z"] = sql_round(rz, round_to)
        return df[["url", "metric", "warc_ts", "value", "med", "mad",
                   "robust_z"]]

    return partitioned_map(ds_long, kernel, url_col="url")


def theil_sen(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Per-series Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes (value units per day) — up to ~29 % outlier contamination
    cannot move it, unlike :func:`trend_slope`'s least squares. Each
    slope is ``(v₂−v₁) / ((t₂−t₁ µs) / 86400e6)`` in exactly that IEEE
    order on both engine and SQL sides (self-join + ``quantile_cont``
    twin); the median interpolates identically (lerp at 0.5) and the
    result is SQL-rounded.

    Scale note: the estimator is inherently O(n²) pairs per series —
    exact here (the definition); a 10⁶-snapshot head url must be
    pre-bounded upstream (M4/LTTB tiers) before a quadratic estimator,
    as any engine would."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        vals = df["value"].to_numpy(np.float64)
        ts = (df["warc_ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        starts, ends = _series_bounds(urls, mets)
        n = len(starts)
        out = {"url": urls[starts], "metric": mets[starts],
               "n_obs": (ends - starts).astype(np.int64),
               "theil_sen_slope": np.full(n, np.nan)}
        for i, (s, e) in enumerate(zip(starts, ends)):
            m = e - s
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            dv = vals[s:e][ib] - vals[s:e][ia]
            dt = (ts[s:e][ib] - ts[s:e][ia]).astype(np.float64) / 86_400e6
            out["theil_sen_slope"][i] = np.median(dv / dt)
        res = pd.DataFrame(out)
        res["theil_sen_slope"] = sql_round(
            res["theil_sen_slope"].to_numpy(), round_to)
        return res

    return partitioned_map(ds_long, kernel, url_col="url")


def spearman(ds_obs: rd.Dataset, col_a: str = "text_len",
             col_b: str = "word_count", round_to: int = 6) -> rd.Dataset:
    """Per-url Spearman rank correlation between two metric columns —
    the monotonic-association summary robust to the outliers that
    distort :func:`metric_correlation`'s Pearson r. Ranks use average
    tie handling (pandas ``rank(method='average')``; SQL twin:
    ``rank() + (tie_count − 1)/2``), then the same cancelled two-pass
    Pearson over ranks. Urls where either rank vector is constant get
    null."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="mergesort").copy()
        g = df.groupby("url", sort=False)
        ra = g[col_a].rank(method="average").to_numpy(np.float64)
        rb = g[col_b].rank(method="average").to_numpy(np.float64)
        urls = df["url"].to_numpy()
        starts, ends = _series_bounds(urls, np.zeros(len(urls)))
        n = len(starts)
        out = {"url": urls[starts],
               "n_obs": (ends - starts).astype(np.int64),
               "spearman": np.full(n, np.nan)}
        for i, (s, e) in enumerate(zip(starts, ends)):
            da = ra[s:e] - ra[s:e].mean()
            db = rb[s:e] - rb[s:e].mean()
            denom = np.sqrt((da * da).sum() * (db * db).sum())
            if denom > 0.0:
                out["spearman"][i] = (da * db).sum() / denom
        res = pd.DataFrame(out)
        res["spearman"] = sql_round(res["spearman"].to_numpy(), round_to)
        return res

    return partitioned_map(ds_obs, kernel, url_col="url")


def series_gaps(ds_long: rd.Dataset, stale_seconds: float = 172_800.0,
                round_to: int = 6) -> rd.Dataset:
    """Per-series inter-arrival (gap) statistics — the staleness /
    coverage monitor for a crawl archive: how regularly is each url
    actually snapshotted, and where are the holes the gap-fill stage
    will have to interpolate across.

    Emits per (url, metric): ``n_obs``, ``span_s`` (first→last),
    ``max_gap_s``, ``mean_gap_s`` (rounded; SQL ``avg`` streams in a
    different order), and ``n_stale_gaps`` (gaps exceeding
    ``stale_seconds``). Gap values are each one identical IEEE
    division (µs → s) on engine and oracle sides. Fully vectorized:
    one diff + one grouped agg per block."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "warc_ts"],
                            kind="mergesort").copy()
        ts = (df["warc_ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        gap_us = np.empty(len(df), dtype=np.float64)
        gap_us[0:1] = np.nan
        gap_us[1:] = (ts[1:] - ts[:-1]).astype(np.float64)
        new = np.zeros(len(df), dtype=bool)
        new[0:1] = True
        new[1:] = (urls[1:] != urls[:-1]) | (mets[1:] != mets[:-1])
        gap_us[new] = np.nan
        df["_gap_s"] = gap_us / 1_000_000.0
        df["_stale"] = (df["_gap_s"] > stale_seconds).astype(np.int64)
        g = df.groupby(["url", "metric"], sort=False)
        agg = g.agg(n_obs=("value", "size"),
                    min_ts=("warc_ts", "min"), max_ts=("warc_ts", "max"),
                    max_gap_s=("_gap_s", "max"),
                    mean_gap_s=("_gap_s", "mean"),
                    n_stale_gaps=("_stale", "sum")).reset_index()
        span = ((agg["max_ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64)
                 - agg["min_ts"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64)).astype(np.float64) / 1_000_000.0)
        agg["span_s"] = span
        agg["mean_gap_s"] = sql_round(agg["mean_gap_s"].to_numpy(),
                                      round_to)
        agg["n_obs"] = agg["n_obs"].astype(np.int64)
        agg["n_stale_gaps"] = agg["n_stale_gaps"].astype(np.int64)
        return agg[["url", "metric", "n_obs", "span_s", "max_gap_s",
                    "mean_gap_s", "n_stale_gaps"]]

    return partitioned_map(ds_long, kernel, url_col="url")


def peak_time(ds_long: rd.Dataset) -> rd.Dataset:
    """When did each series peak: the earliest timestamp attaining the
    series max (deterministic argmax; SQL ``arg_min(warc_ts ORDER BY
    value DESC)`` twin via row_number)."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "value", "warc_ts"],
                            kind="mergesort",
                            ascending=[True, True, False, True])
        out = df.drop_duplicates(["url", "metric"], keep="first")
        return out[["url", "metric", "warc_ts", "value"]].rename(
            columns={"warc_ts": "peak_ts", "value": "peak_value"})

    return partitioned_map(ds_long, kernel, url_col="url")


def stl_decompose_daily(ds_long: rd.Dataset, trend_halfwin: int = 3,
                        round_to: int = 6) -> rd.Dataset:
    """STL-lite additive decomposition per daily series: for each
    (url, metric), daily mean → centered ``2·halfwin+1``-row moving
    average as TREND (window shrinks at the edges, SQL ``ROWS BETWEEN
    h PRECEDING AND h FOLLOWING`` semantics) → per day-of-week mean
    of the detrended values as SEASONAL → RESIDUAL. The cheap
    streaming decomposition behind seasonal anomaly detection
    (classic STL swaps the moving averages for loess).

    Shape: one distributed Mean groupby to the daily grain, then one
    salted exchange on the series key and a vectorized per-partition
    kernel (prefix-sum windowed mean, no per-row loop). Outputs are
    rounded: window/group summation order differs from any SQL twin.
    Partitioning assumption: one series' daily grain fits a
    partition (~years of days — trivially true)."""
    from ray.data.aggregate import Mean

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def to_day(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["url", "metric", "value"]].copy(deep=False)
        out["day"] = (df["warc_ts"].to_numpy()
                      .astype("datetime64[D]").astype("datetime64[us]"))
        return out

    daily = (ds_long.map_batches(to_day, batch_format="pandas")
             .groupby(["url", "metric", "day"])
             .aggregate(Mean("value", alias_name="v")))

    h = int(trend_halfwin)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        parts = []
        for _, g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            idx = np.arange(n)
            lo = np.maximum(idx - h, 0)
            hi = np.minimum(idx + h, n - 1)
            cs = np.concatenate([[0.0], np.cumsum(v)])
            trend = (cs[hi + 1] - cs[lo]) / (hi - lo + 1)
            det = v - trend
            dow = pd.DatetimeIndex(g["day"]).dayofweek.to_numpy()
            seas = np.zeros(n)
            for d in np.unique(dow):
                m = dow == d
                seas[m] = det[m].mean()
            parts.append(pd.DataFrame({
                "url": g["url"].to_numpy(),
                "metric": g["metric"].to_numpy(),
                "day": g["day"].to_numpy(),
                # + 0.0 normalizes IEEE -0.0 (a detrended mean that
                # rounds to zero can carry either sign depending on
                # summation order; the hash is bit-sensitive)
                "value": sql_round(v, round_to) + 0.0,
                "trend": sql_round(trend, round_to) + 0.0,
                "seasonal": sql_round(seas, round_to) + 0.0,
                "residual": sql_round(v - trend - seas, round_to) + 0.0,
            }))
        return pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame(columns=["url", "metric", "day", "value",
                                  "trend", "seasonal", "residual"])

    return partitioned_map(daily, kernel, url_col="url")


def _binseg_series(v: np.ndarray, min_size: int,
                   penalty: float) -> list[tuple[int, float]]:
    """Deterministic mean-shift binary segmentation over one series:
    repeatedly split the segment whose best split maximizes the SSE
    gain, while the gain exceeds ``penalty``; first index wins ties.
    Returns [(split_index, gain)] in detection order. O(n) per
    candidate scan via prefix sums."""
    cs = np.concatenate([[0.0], np.cumsum(v)])
    cs2 = np.concatenate([[0.0], np.cumsum(v * v)])

    def sse(a: int, b: int) -> float:          # [a, b)
        n = b - a
        if n == 0:
            return 0.0
        s = cs[b] - cs[a]
        return float(cs2[b] - cs2[a] - s * s / n)

    def best_split(a: int, b: int) -> tuple[int, float]:
        total = sse(a, b)
        best_t, best_gain = -1, 0.0
        for t in range(a + min_size, b - min_size + 1):
            gain = total - sse(a, t) - sse(t, b)
            if gain > best_gain + 1e-12:
                best_t, best_gain = t, gain
        return best_t, best_gain

    out: list[tuple[int, float]] = []
    segs = [(0, len(v))]
    while segs:
        a, b = segs.pop(0)
        if b - a < 2 * min_size:
            continue
        t, gain = best_split(a, b)
        if t < 0 or gain <= penalty:
            continue
        out.append((t, gain))
        segs.append((a, t))
        segs.append((t, b))
    return out


def binseg_changepoints(ds_long: rd.Dataset, min_size: int = 5,
                        penalty_mult: float = 2.0,
                        round_to: int = 6) -> rd.Dataset:
    """Mean-shift changepoint detection per daily series (binary
    segmentation, the classic level-shift detector): daily means →
    per-series deterministic binseg with penalty
    ``penalty_mult · median(|Δv|)² · ln n``. Emits one row per
    detected changepoint: ``(url, metric, cp_day, gain, mean_before,
    mean_after)`` where the means are over the adjacent detected
    span only.

    Shape: distributed Mean groupby to daily grain, then one salted
    series exchange + vectorized prefix-sum kernel (same partitioning
    contract as :func:`stl_decompose_daily`)."""
    from ray.data.aggregate import Mean

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def to_day(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["url", "metric", "value"]].copy(deep=False)
        out["day"] = (df["warc_ts"].to_numpy()
                      .astype("datetime64[D]").astype("datetime64[us]"))
        return out

    daily = (ds_long.map_batches(to_day, batch_format="pandas")
             .groupby(["url", "metric", "day"])
             .aggregate(Mean("value", alias_name="v")))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < 2 * min_size:
                continue
            dmed = float(np.median(np.abs(np.diff(v))))
            penalty = penalty_mult * dmed * dmed * np.log(n)
            found = _binseg_series(v, min_size, penalty)
            cps = sorted(t for t, _ in found)
            gains = dict(found)
            bounds = [0] + cps + [n]
            days = g["day"].to_numpy()
            for i, t in enumerate(cps):
                lo, hi = bounds[i], bounds[i + 2]
                rows.append({
                    "url": u, "metric": m, "cp_day": days[t],
                    "gain": float(gains[t]),
                    "mean_before": float(v[lo:t].mean()),
                    "mean_after": float(v[t:hi].mean()),
                })
        if not rows:
            return pd.DataFrame(columns=["url", "metric", "cp_day",
                                         "gain", "mean_before",
                                         "mean_after"])
        out = pd.DataFrame(rows)
        for c in ("gain", "mean_before", "mean_after"):
            out[c] = sql_round(out[c].to_numpy(np.float64),
                               round_to) + 0.0
        return out

    return partitioned_map(daily, kernel, url_col="url")


def daily_means(ds_long: rd.Dataset) -> rd.Dataset:
    """Collapse the irregular observation stream to the regular daily
    grain: ``(url, metric, day, v=mean(value))`` — the shared front
    end of the per-series statistics (ACF, Mann-Kendall, binseg, STL).
    One distributed Mean groupby; no materialization."""
    from ray.data.aggregate import Mean

    def to_day(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["url", "metric", "value"]].copy(deep=False)
        out["day"] = (df["warc_ts"].to_numpy()
                      .astype("datetime64[D]").astype("datetime64[us]"))
        return out

    return (ds_long.map_batches(to_day, batch_format="pandas")
            .groupby(["url", "metric", "day"])
            .aggregate(Mean("value", alias_name="v")))


def acf_ljungbox(ds_long: rd.Dataset, max_lag: int = 7,
                 round_to: int = 6) -> rd.Dataset:
    """Autocorrelation function at lags 1..``max_lag`` plus the
    Ljung-Box portmanteau statistic, per daily series — the classic
    "is this page's history white noise?" screen (reference analog:
    the per-pixel temporal statistics of SITS preprocessing).

    Estimator (the standard one, and the SQL twin's):
    ``r_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²`` over the
    position-ordered daily means, and
    ``Q = n(n+2) Σ_k r_k²/(n−k)``. Series shorter than
    ``max_lag + 1`` days are dropped (every lag must have ≥1 pair);
    constant series emit nulls (0/0, SQL CASE semantics).

    Shape: one Mean groupby to daily grain, then a salted per-series
    exchange + vectorized prefix-dot kernel — no driver collect, no
    second shuffle."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    K = int(max_lag)
    r_cols = [f"r{k}" for k in range(1, K + 1)]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows: list[dict] = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n <= K:
                continue
            d = v - v.mean()
            ss0 = float(d @ d)
            row = {"url": u, "metric": m, "n_days": np.int64(n)}
            if ss0 > 0.0:
                q = 0.0
                for k in range(1, K + 1):
                    rk = float(d[k:] @ d[:-k]) / ss0
                    row[f"r{k}"] = rk
                    q += rk * rk / (n - k)
                row["ljung_box"] = n * (n + 2.0) * q
            else:
                for k in range(1, K + 1):
                    row[f"r{k}"] = np.nan
                row["ljung_box"] = np.nan
            rows.append(row)
        cols = ["url", "metric", "n_days"] + r_cols + ["ljung_box"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        for c in r_cols + ["ljung_box"]:
            out[c] = sql_round(out[c].to_numpy(np.float64),
                               round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema(
        [("url", pa.string()), ("metric", pa.string()),
         ("n_days", pa.int64())]
        + [(c, pa.float64()) for c in r_cols + ["ljung_box"]])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def mann_kendall(ds_long: rd.Dataset, z_crit: float = 1.96,
                 round_to: int = 6) -> rd.Dataset:
    """Mann-Kendall monotonic-trend test per daily series — the
    non-parametric companion to the Theil-Sen slope (reference analog:
    per-pixel trend screening over a SITS stack).

    ``S = Σ_{i<j} sign(x_j − x_i)`` over the day-ordered daily means,
    tie-corrected variance
    ``Var S = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18`` (t = tie-group
    sizes), continuity-corrected ``z = (S∓1)/√VarS``, and a trend
    verdict at ``|z| > z_crit``. Series need ≥3 days; all-tied series
    (VarS = 0) emit a null z and ``no_trend``.

    The pair sum is computed in row blocks (O(n²) work, O(block·n)
    memory) so a 10-year daily series costs ~13M vectorized sign ops
    and bounded memory — no materialized n×n matrix. The verdict
    compares the ROUNDED z on both engine and SQL sides, so boundary
    values cannot flip between the twins."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def series_s(v: np.ndarray) -> int:
        s = 0
        for i in range(0, len(v) - 1, 256):
            blk = v[i:i + 256]
            rest = v[i + 1:]
            # sign(x_j - x_i) for all j > i within the block rows
            d = rest[None, :] - blk[:, None]
            # row r of blk pairs with rest[r:]: mask the lower part
            m = np.arange(len(rest))[None, :] >= np.arange(
                len(blk))[:, None]
            s += int(np.sign(d)[m].sum())
        return s

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows: list[dict] = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < 3:
                continue
            s = series_s(v)
            _, counts = np.unique(v, return_counts=True)
            t = counts.astype(np.float64)
            var_s = (n * (n - 1.0) * (2 * n + 5.0)
                     - float((t * (t - 1.0) * (2 * t + 5.0)).sum())) / 18.0
            if var_s > 0.0:
                if s > 0:
                    z = (s - 1.0) / np.sqrt(var_s)
                elif s < 0:
                    z = (s + 1.0) / np.sqrt(var_s)
                else:
                    z = 0.0
            else:
                z = np.nan
            zr = float(sql_round(np.array([z]), round_to)[0])
            trend = ("no_trend" if not np.isfinite(zr)
                     else "increasing" if zr > z_crit
                     else "decreasing" if zr < -z_crit else "no_trend")
            rows.append({"url": u, "metric": m, "n_days": np.int64(n),
                         "s_stat": np.int64(s), "var_s": var_s,
                         "z": z, "trend": trend})
        cols = ["url", "metric", "n_days", "s_stat", "var_s", "z",
                "trend"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        for c in ("var_s", "z"):
            out[c] = sql_round(out[c].to_numpy(np.float64),
                               round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("n_days", pa.int64()), ("s_stat", pa.int64()),
                        ("var_s", pa.float64()), ("z", pa.float64()),
                        ("trend", pa.string())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


#: N(0,1) quartile breakpoints — the SAX alphabet-4 cut points
#: (Lin et al. 2003, "A Symbolic Representation of Time Series").
SAX_BREAKPOINTS_4 = np.array([-0.6744897501960817, 0.0,
                              0.6744897501960817])


def sax_motifs(ds_long: rd.Dataset, window: int = 14, frames: int = 7,
               alphabet: str = "abcd") -> rd.Dataset:
    """SAX motif discovery per daily series: slide a ``window``-day
    view over the daily means, z-normalize each window, PAA-compress
    to ``frames`` symbols over the N(0,1) quartile breakpoints, and
    report the modal SAX word (count DESC, word ASC tie-break) — the
    "most repeated shape" screen from the SAX literature.

    Constant windows (std = 0) symbolize as the all-mid word, like
    the reference implementations. Series shorter than ``window``
    days are dropped.

    Shape: one Mean groupby to daily grain + one salted per-series
    exchange; inside the kernel the window matrix is a zero-copy
    ``sliding_window_view`` and PAA/digitize are single vectorized
    ops — per-window Python exists only to join the final letters."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    assert window % frames == 0
    seg = window // frames
    bp = SAX_BREAKPOINTS_4
    letters = np.frombuffer(alphabet.encode(), dtype=np.uint8)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows: list[dict] = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < window:
                continue
            w = np.lib.stride_tricks.sliding_window_view(v, window)
            mu = w.mean(axis=1)
            sd = np.sqrt(((w - mu[:, None]) ** 2).mean(axis=1))
            sd_safe = np.where(sd > 0.0, sd, 1.0)
            z = (w - mu[:, None]) / sd_safe[:, None]
            paa = z.reshape(len(w), frames, seg).mean(axis=2)
            sym = letters[np.searchsorted(bp, paa, side="right")]
            words = [b.tobytes().decode() for b in np.ascontiguousarray(sym)]
            vc = pd.Series(words).value_counts()
            top = vc[vc == vc.iloc[0]].index.min()
            rows.append({"url": u, "metric": m, "n_days": np.int64(n),
                         "n_windows": np.int64(len(w)),
                         "motif": top,
                         "motif_count": np.int64(vc.loc[top])})
        cols = ["url", "metric", "n_days", "n_windows", "motif",
                "motif_count"]
        if not rows:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(rows)[cols]

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("n_days", pa.int64()),
                        ("n_windows", pa.int64()),
                        ("motif", pa.string()),
                        ("motif_count", pa.int64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def matrix_profile_discord(ds_long: rd.Dataset, window: int = 14,
                           round_to: int = 6) -> rd.Dataset:
    """Top-1 discord per daily series via the matrix profile (the
    anomaly dual of :func:`sax_motifs`): z-normalize every
    ``window``-day sliding view, compute each window's
    nearest-neighbor Euclidean distance to every NON-overlapping
    window (exclusion zone ``window // 2``), and report the window
    whose NN distance is largest — the subsequence least like any
    other.

    Distances use the exact ``D² = |zᵢ|² + |zⱼ|² − 2·zᵢ·zⱼ`` identity
    (valid for constant windows too, where z = 0), computed as a
    row-chunked matmul — O(nw²) flops per series but never an
    nw × nw materialization beyond one 512-row stripe, so a 10-year
    daily series costs ~13 M BLAS flops and ~15 MB. Ties break to the
    earliest window on the ROUNDED profile (both twins compare the
    same rounded values). Requires n ≥ window + window//2 + 1 so
    every window has a non-excluded neighbor."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    L = int(window)
    excl = L // 2

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows: list[dict] = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < L + excl + 1:
                continue
            w = np.lib.stride_tricks.sliding_window_view(v, L)
            mu = w.mean(axis=1)
            sd = np.sqrt(((w - mu[:, None]) ** 2).mean(axis=1))
            z = np.where(sd[:, None] > 0.0,
                         (w - mu[:, None]) / np.where(sd[:, None] > 0.0,
                                                      sd[:, None], 1.0),
                         0.0)
            nw = len(z)
            r = (z * z).sum(axis=1)
            nn = np.empty(nw)
            idx = np.arange(nw)
            for s in range(0, nw, 512):
                e = min(s + 512, nw)
                d2 = r[s:e, None] + r[None, :] - 2.0 * (z[s:e] @ z.T)
                mask = np.abs(idx[None, :] - idx[s:e, None]) < excl
                d2[mask] = np.inf
                nn[s:e] = d2.min(axis=1)
            prof = sql_round(np.sqrt(np.maximum(nn, 0.0)), round_to)
            best = int(np.argmax(prof))
            days = g["day"].to_numpy()
            rows.append({"url": u, "metric": m,
                         "n_windows": np.int64(nw),
                         "discord_day": days[best],
                         "discord_dist": float(prof[best])})
        cols = ["url", "metric", "n_windows", "discord_day",
                "discord_dist"]
        if not rows:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(rows)[cols]

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("n_windows", pa.int64()),
                        ("discord_day", pa.timestamp("us")),
                        ("discord_dist", pa.float64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def ts_features(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """catch22-lite per-series feature catalog over the daily means —
    the feature-extraction front end for series clustering /
    classification (reference analog: per-pixel temporal features
    feeding the SITS classifier).

    Per (url, metric), n ≥ 3 days: mean, population std, moment
    skewness ``m₃/m₂^1.5``, excess kurtosis ``m₄/m₂² − 3``, lag-1
    autocorrelation, OLS slope over the day index, mean-crossing
    count, fraction above mean, and range. Constant series emit null
    skew/kurt/acf1 (0/0, SQL CASE semantics). Dimensionless ratios
    only — raw high moments are never emitted, so round-6 parity with
    the SQL twin is numerically safe."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows: list[dict] = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < 3:
                continue
            mu = v.mean()
            d = v - mu
            m2 = (d * d).mean()
            m3 = (d * d * d).mean()
            m4 = (d * d * d * d).mean()
            ss0 = (d * d).sum()
            s1 = float(d[1:] @ d[:-1])
            t = np.arange(n, dtype=np.float64)
            tb = t - t.mean()
            slope = float((tb * d).sum() / (tb * tb).sum())
            rows.append({
                "url": u, "metric": m, "n_days": np.int64(n),
                "mean_v": mu,
                "std_pop": np.sqrt(m2),
                "skew": m3 / (m2 * np.sqrt(m2)) if m2 > 0 else np.nan,
                "kurt_excess": m4 / (m2 * m2) - 3.0 if m2 > 0 else np.nan,
                "acf1": s1 / ss0 if ss0 > 0 else np.nan,
                "slope": slope,
                "crossings": np.int64(int(((d[1:] * d[:-1]) < 0).sum())),
                "frac_above": float((v > mu).sum()) / n,
                "vrange": v.max() - v.min(),
            })
        cols = ["url", "metric", "n_days", "mean_v", "std_pop", "skew",
                "kurt_excess", "acf1", "slope", "crossings",
                "frac_above", "vrange"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        for c in ("mean_v", "std_pop", "skew", "kurt_excess", "acf1",
                  "slope", "frac_above", "vrange"):
            out[c] = sql_round(out[c].to_numpy(np.float64),
                               round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema(
        [("url", pa.string()), ("metric", pa.string()),
         ("n_days", pa.int64()), ("mean_v", pa.float64()),
         ("std_pop", pa.float64()), ("skew", pa.float64()),
         ("kurt_excess", pa.float64()), ("acf1", pa.float64()),
         ("slope", pa.float64()), ("crossings", pa.int64()),
         ("frac_above", pa.float64()), ("vrange", pa.float64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def ts_feature_vectors(ds_long: rd.Dataset,
                       round_to: int = 6) -> rd.Dataset:
    """Dimensionless per-series feature vectors for clustering:
    ``[skew, kurt_excess, acf1, frac_above, crossing_rate]`` from
    :func:`ts_features` (degenerate constant/white series with null
    moments are dropped). ``vec_id`` is the 64-bit stable hash of
    ``url|metric`` (bit-reinterpreted to int64) — collision odds are
    birthday-bounded and a collision only merges two series into one
    clustering point."""
    from sits_classification_ray.functions.transforms import sql_round

    def to_vec(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["skew", "kurt_excess", "acf1"])
        if not len(df):
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "metric": pd.Series([], dtype=object),
                "vec_id": pd.Series([], dtype=np.int64),
                "features": pd.Series([], dtype=object),
            })
        key = (df["url"].astype(str) + "|"
               + df["metric"].astype(str)).to_numpy(object)
        vid = pd.util.hash_array(key, categorize=False).view(np.int64)
        rate = sql_round(
            df["crossings"].to_numpy(np.float64)
            / (df["n_days"].to_numpy(np.float64) - 1.0), round_to)
        vec = np.stack([df["skew"].to_numpy(np.float64),
                        df["kurt_excess"].to_numpy(np.float64),
                        df["acf1"].to_numpy(np.float64),
                        df["frac_above"].to_numpy(np.float64),
                        rate], axis=1)
        return pd.DataFrame({"url": df["url"].to_numpy(),
                             "metric": df["metric"].to_numpy(),
                             "vec_id": vid,
                             "features": list(vec)})

    return ts_features(ds_long, round_to=round_to).map_batches(
        to_vec, batch_format="pandas")


def ts_kmeans(ds_long: rd.Dataset, k: int = 5, iterations: int = 4,
              num_partitions: int = 64) -> rd.Dataset:
    """Temporal-archetype clustering: Lloyd's k-means over the
    per-series feature vectors (the "group pages by the SHAPE of
    their history" op — reference analog: clustering pixel time
    series into phenology classes).

    Seeds are the vectors with the k smallest hashed ids (one
    distributed sort+limit over the tiny per-series feature table);
    the fit inherits :func:`similarity.kmeans_fit`'s bit-exact
    determinism contract, so the golden twin reproduces the floats
    exactly. Output: ``(url, metric, cluster)``."""
    from sits_classification_ray.stages.similarity import kmeans_fit

    fds = ts_feature_vectors(ds_long).materialize()
    seed_df = fds.sort("vec_id").limit(k).to_pandas()
    seeds = np.stack([np.asarray(v, dtype=np.float64) for v in
                      seed_df.sort_values("vec_id")["features"]])
    C = kmeans_fit(fds, k=k, iterations=iterations,
                   num_partitions=num_partitions, id_col="vec_id",
                   vec_col="features", seeds=seeds)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "metric": pd.Series([], dtype=object),
                                 "cluster": pd.Series([], dtype=np.int64)})
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["features"]])
        d2 = (X ** 2).sum(1)[:, None] - 2.0 * (X @ C.T) \
            + (C ** 2).sum(1)[None, :]
        return pd.DataFrame({"url": df["url"].to_numpy(),
                             "metric": df["metric"].to_numpy(),
                             "cluster": np.argmin(d2, axis=1)
                             .astype(np.int64)})

    return fds.map_batches(assign, batch_format="pandas")


#: DTW template shapes, length 16, z-normalized at module import —
#: the canonical temporal archetypes (reference analog: phenology
#: reference profiles a SITS pixel series is matched against).
def _dtw_templates() -> "dict[str, np.ndarray]":
    L = 16
    t = np.arange(L, dtype=np.float64)
    raw = {
        "ramp_up": t.copy(),
        "ramp_down": -t,
        "peak": np.minimum(t, L - 1 - t),
        "step": np.where(t < L / 2, 0.0, 1.0),
        "wave": np.sin(2.0 * np.pi * t / 8.0),
    }
    out = {}
    for k, v in raw.items():
        mu = v.mean()
        sd = np.sqrt(((v - mu) ** 2).mean())
        out[k] = (v - mu) / sd
    return out


def dtw_distance(x: np.ndarray, tpl: np.ndarray) -> float:
    """Unconstrained DTW with absolute-difference local cost — the
    classic O(n·L) band-free DP. Row-vectorized: per input step the
    ``min(D[i-1,j], D[i-1,j-1])`` term is one numpy minimum over the
    (short, fixed-length) template axis; only the in-row running min
    is sequential."""
    L = len(tpl)
    prev = np.full(L, np.inf)
    # first row: cumulative cost along the template
    prev[0] = abs(x[0] - tpl[0])
    for j in range(1, L):
        prev[j] = prev[j - 1] + abs(x[0] - tpl[j])
    for i in range(1, len(x)):
        c = np.abs(x[i] - tpl)
        diag_up = np.empty(L)
        diag_up[0] = prev[0]
        np.minimum(prev[1:], prev[:-1], out=diag_up[1:])
        r = np.empty(L)
        r[0] = c[0] + prev[0]
        for j in range(1, L):
            r[j] = c[j] + min(diag_up[j], r[j - 1])
        prev = r
    return float(prev[-1])


def dtw_classify(ds_long: rd.Dataset, min_days: int = 8,
                 round_to: int = 6) -> rd.Dataset:
    """Nearest-template DTW classification of each daily series — the
    SITS-classification move itself (match a pixel/url history against
    reference temporal profiles; reference analog: the per-pixel
    classifier of ``pytorch/predict.py``, re-expressed as elastic
    template matching).

    Per (url, metric) with ≥ ``min_days`` daily means: z-normalize
    (population σ; constant series are dropped — no shape), DTW
    against the five canonical templates, emit distances and the
    argmin label (ties break by template-name ASC via the sorted
    iteration order). Output: ``(url, metric, n_days, best_template,
    dtw_dist)`` with the distance normalized by path-free series
    length ``n`` then rounded.

    Scale shape: templates are O(1) module constants shipped in the
    kernel closure; everything else is the standard bucket-major
    per-series kernel on the salted url exchange."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    tpls = sorted(_dtw_templates().items())

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < min_days:
                continue
            mu = v.mean()
            sd = np.sqrt(((v - mu) ** 2).mean())
            if sd <= 0:
                continue
            z = (v - mu) / sd
            best_name, best_d = None, np.inf
            for name, tpl in tpls:
                d = dtw_distance(z, tpl) / n
                if d < best_d:
                    best_name, best_d = name, d
            rows.append({"url": u, "metric": m, "n_days": np.int64(n),
                         "best_template": best_name,
                         "dtw_dist": best_d})
        cols = ["url", "metric", "n_days", "best_template", "dtw_dist"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        out["dtw_dist"] = sql_round(
            out["dtw_dist"].to_numpy(np.float64), round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("n_days", pa.int64()),
                        ("best_template", pa.string()),
                        ("dtw_dist", pa.float64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def shesd_anomalies(ds_long: rd.Dataset, alpha: float = 0.05,
                    max_frac: float = 0.1, min_days: int = 14,
                    round_to: int = 6) -> rd.Dataset:
    """Seasonal-Hybrid ESD anomaly detection per daily series
    (Twitter AnomalyDetection, Hochenbaum/Vallis/Kejariwal 2017):
    remove the day-of-week seasonal component and the series MEDIAN
    (the "hybrid" — robust location), then run a generalized-ESD
    outward test with median/MAD re-estimated after every removal, so
    masked multi-anomaly clusters are found where one-shot z/MAD
    screens saturate (:func:`mad_anomaly` is the one-shot variant).

    Critical values use the Gaussian quantile (Acklam Φ⁻¹) in place of
    the Student-t — the standard large-n approximation, documented and
    mirrored bit-exactly by the golden twin. Up to
    ``floor(max_frac·n)`` anomalies per series; the ESD rule flags the
    first k* candidates where k* is the LARGEST k with R_k > λ_k.
    Ties in the outward argmax break by earliest day.

    Output: flagged rows ``(url, metric, day, value, esd_stat,
    anom_rank)``. Scale shape: one Mean groupby to the daily grain +
    one salted series exchange; the per-series loop is bounded by
    ``max_frac·n`` iterations of O(n) numpy."""
    from sits_classification_ray.functions.transforms import (norm_ppf,
                                                              sql_round)
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < min_days:
                continue
            # STL-lite seasonal (same construction as stl_decompose)
            idx = np.arange(n)
            h = 3
            lo = np.maximum(idx - h, 0)
            hi = np.minimum(idx + h, n - 1)
            cs = np.concatenate([[0.0], np.cumsum(v)])
            trend = (cs[hi + 1] - cs[lo]) / (hi - lo + 1)
            det = v - trend
            dow = pd.DatetimeIndex(g["day"]).dayofweek.to_numpy()
            seas = np.zeros(n)
            for d in np.unique(dow):
                msk = dow == d
                seas[msk] = det[msk].mean()
            resid = v - seas
            resid = resid - np.median(resid)
            k_max = max(1, int(np.floor(max_frac * n)))
            remaining = np.ones(n, dtype=bool)
            cand = []
            for k in range(1, k_max + 1):
                r = resid[remaining]
                med = np.median(r)
                mad = 1.4826 * np.median(np.abs(r - med))
                if mad <= 0:
                    break
                stat = np.where(remaining,
                                np.abs(resid - med) / mad, -np.inf)
                i_star = int(np.argmax(stat))
                nk = int(remaining.sum())
                p = 1.0 - alpha / (2.0 * nk)
                z = float(norm_ppf(np.array([p]))[0])
                lam = ((nk - 1) * z
                       / np.sqrt((nk - 2 + z * z) * nk))
                cand.append((i_star, float(stat[i_star]), float(lam)))
                remaining[i_star] = False
            k_star = 0
            for k, (_, rk, lam) in enumerate(cand, start=1):
                if rk > lam:
                    k_star = k
            days = g["day"].to_numpy()
            for rank, (i, rk, _) in enumerate(cand[:k_star], start=1):
                rows.append({"url": u, "metric": m, "day": days[i],
                             "value": v[i], "esd_stat": rk,
                             "anom_rank": np.int64(rank)})
        cols = ["url", "metric", "day", "value", "esd_stat",
                "anom_rank"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        for c in ("value", "esd_stat"):
            out[c] = sql_round(out[c].to_numpy(np.float64),
                               round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("day", pa.timestamp("us")),
                        ("value", pa.float64()),
                        ("esd_stat", pa.float64()),
                        ("anom_rank", pa.int64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def periodogram_peak(ds_long: rd.Dataset, min_days: int = 16,
                     round_to: int = 6) -> rd.Dataset:
    """Dominant update cadence per daily series via the raw
    periodogram: mean-center the daily means, take the rFFT power
    spectrum, and report the non-DC peak as a period in days plus its
    share of total spectral power — the "does this page update on a
    weekly rhythm?" detector (reference analog: phenology periodicity
    of a pixel series).

    Determinism: numpy's rFFT on the same input bits is deterministic,
    and the golden twin runs the identical transform; outputs are
    rounded to 6. Ties in the peak (exactly equal power) break toward
    the LOWER frequency (longer period) via argmax-first semantics.
    Series with zero variance are dropped. Scale shape: standard
    daily-grain Mean groupby + salted series exchange; FFT is
    O(n log n) per series inside the partition kernel."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < min_days:
                continue
            d = v - v.mean()
            if not np.any(d):
                continue
            spec = np.abs(np.fft.rfft(d)) ** 2
            pw = spec[1:]               # drop DC
            total = pw.sum()
            if total <= 0:
                continue
            k = int(np.argmax(pw)) + 1  # frequency index
            rows.append({
                "url": u, "metric": m, "n_days": np.int64(n),
                "dom_period_days": float(n) / k,
                "power_frac": float(pw[k - 1]) / total})
        cols = ["url", "metric", "n_days", "dom_period_days",
                "power_frac"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        for c in ("dom_period_days", "power_frac"):
            out[c] = sql_round(out[c].to_numpy(np.float64),
                               round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("n_days", pa.int64()),
                        ("dom_period_days", pa.float64()),
                        ("power_frac", pa.float64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def kleinberg_bursts(ds: rd.Dataset, s: float = 2.0,
                     gamma: float = 1.0, url_col: str = "url",
                     ts_col: str = "warc_ts") -> rd.Dataset:
    """Burst detection over each url's snapshot-arrival stream
    (Kleinberg 2002, "Bursty and Hierarchical Structure in Streams",
    two-state variant): inter-arrival gaps are modeled as exponential
    with base rate ``n/T`` (state 0) or ``s×`` that rate (state 1);
    a Viterbi pass minimizes emission cost ``-ln λ + λ·x`` plus a
    ``γ·ln n`` entry toll for 0→1 (exit is free). Maximal state-1 runs
    are the bursts — "this page was suddenly being recrawled much
    faster than its norm".

    Determinism: ties in the DP argmin prefer state 0. Output one row
    per burst: ``(url, burst_start, burst_end, n_gaps)`` where the
    span covers the first through last timestamp of the run's gaps.
    Scale shape: timestamps deduped per (url, ts) before the salted
    url exchange; the per-url DP is O(n) with two states."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = (df[[url_col, ts_col]]
              .drop_duplicates([url_col, ts_col])
              .sort_values([url_col, ts_col], kind="mergesort"))
        rows = []
        for u, g in df.groupby(url_col, sort=False):
            ts = g[ts_col].to_numpy("datetime64[us]")
            t = ts.astype(np.int64) / 1000000.0
            x = np.diff(t)
            n = len(x)
            if n < 2:
                continue
            T = float(t[-1] - t[0])
            if T <= 0:
                continue
            lam0 = n / T
            lam1 = s * lam0
            toll = gamma * np.log(n)
            e0 = -np.log(lam0) + lam0 * x
            e1 = -np.log(lam1) + lam1 * x
            # Viterbi: cost[k][state], backpointers
            c0, c1 = e0[0], np.inf  # must start in state 0 (base)
            bp = np.zeros((n, 2), dtype=np.int8)
            for k in range(1, n):
                # into state 0: from 0 (free) or 1 (free); tie -> 0
                n0 = c0 if c0 <= c1 else c1
                bp[k, 0] = 0 if c0 <= c1 else 1
                # into state 1: from 0 pays toll, from 1 free
                from0 = c0 + toll
                n1 = from0 if from0 <= c1 else c1
                bp[k, 1] = 0 if from0 <= c1 else 1
                c0, c1 = n0 + e0[k], n1 + e1[k]
            states = np.zeros(n, dtype=np.int8)
            states[-1] = 0 if c0 <= c1 else 1
            for k in range(n - 1, 0, -1):
                states[k - 1] = bp[k, states[k]]
            # maximal state-1 runs -> bursts
            in_b = states == 1
            if not in_b.any():
                continue
            d = np.diff(in_b.astype(np.int8))
            starts = np.where(d == 1)[0] + 1
            ends = np.where(d == -1)[0]
            if in_b[0]:
                starts = np.concatenate([[0], starts])
            if in_b[-1]:
                ends = np.concatenate([ends, [n - 1]])
            for a, b in zip(starts, ends):
                rows.append({url_col: u, "burst_start": ts[a],
                             "burst_end": ts[b + 1],
                             "n_gaps": np.int64(b - a + 1)})
        cols = [url_col, "burst_start", "burst_end", "n_gaps"]
        if not rows:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(rows)[cols]

    import pyarrow as pa
    schema = pa.schema([(url_col, pa.string()),
                        ("burst_start", pa.timestamp("us")),
                        ("burst_end", pa.timestamp("us")),
                        ("n_gaps", pa.int64())])
    return partitioned_map(ds, kernel, url_col=url_col,
                           out_schema=schema)


def segment_trends(ds_long: rd.Dataset, min_size: int = 5,
                   penalty_mult: float = 2.0,
                   round_to: int = 6) -> rd.Dataset:
    """Piecewise trend profile per daily series: reuse the
    :func:`_binseg_series` breakpoints (mean-shift binary
    segmentation), then fit one OLS slope + mean per detected segment
    — "was this page growing before the redesign and flat after?".
    One row per segment: ``(url, metric, seg_id, seg_start, seg_end,
    n_days, seg_mean, seg_slope)`` (slope per day over the segment's
    0-based day index, the :func:`ts_features` convention).

    Same partitioning contract and breakpoint determinism as
    :func:`binseg_changepoints`; golden twin re-runs the identical
    recursion scalar-ly."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            v = g["v"].to_numpy(np.float64)
            n = len(v)
            if n < 2 * min_size:
                continue
            dmed = float(np.median(np.abs(np.diff(v))))
            penalty = penalty_mult * dmed * dmed * np.log(n)
            cps = sorted(t for t, _ in
                         _binseg_series(v, min_size, penalty))
            days = g["day"].to_numpy()
            bounds = [0] + cps + [n]
            for sid in range(len(bounds) - 1):
                a, b = bounds[sid], bounds[sid + 1]
                seg = v[a:b]
                k = b - a
                t = np.arange(k, dtype=np.float64)
                tb = t - t.mean()
                den = (tb * tb).sum()
                slope = float((tb * (seg - seg.mean())).sum() / den) \
                    if den > 0 else 0.0
                rows.append({
                    "url": u, "metric": m, "seg_id": np.int64(sid),
                    "seg_start": days[a], "seg_end": days[b - 1],
                    "n_days": np.int64(k),
                    "seg_mean": seg.mean(), "seg_slope": slope})
        cols = ["url", "metric", "seg_id", "seg_start", "seg_end",
                "n_days", "seg_mean", "seg_slope"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        for c in ("seg_mean", "seg_slope"):
            out[c] = sql_round(out[c].to_numpy(np.float64),
                               round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("metric", pa.string()),
                        ("seg_id", pa.int64()),
                        ("seg_start", pa.timestamp("us")),
                        ("seg_end", pa.timestamp("us")),
                        ("n_days", pa.int64()),
                        ("seg_mean", pa.float64()),
                        ("seg_slope", pa.float64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)


def xcorr_lag(ds_long: rd.Dataset, max_lag: int = 7,
              min_pairs: int = 8, round_to: int = 6) -> rd.Dataset:
    """Lead/lag detection between a url's two metric series: Pearson
    correlation of the daily means at every integer day shift in
    ``[-max_lag, max_lag]``; report the shift with the highest
    correlation (ties → smaller lag value). Positive ``best_lag``
    means the SECOND metric (name-descending, e.g. word_count) lags
    the first by that many days.

    Pairs are aligned on the integer day number (calendar-aware, not
    positional), so irregular gaps don't smear the shift. Series
    pairs with fewer than ``min_pairs`` overlapping days at a lag are
    skipped for that lag; urls with no valid lag are dropped."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"], kind="mergesort")
        rows = []
        for u, g in df.groupby("url", sort=False):
            mets = sorted(g["metric"].unique())
            if len(mets) < 2:
                continue
            ma, mb = mets[0], mets[1]
            ga = g[g["metric"] == ma]
            gb = g[g["metric"] == mb]
            da = (ga["day"].to_numpy("datetime64[D]")
                  .astype(np.int64))
            db = (gb["day"].to_numpy("datetime64[D]")
                  .astype(np.int64))
            va = ga["v"].to_numpy(np.float64)
            vb = gb["v"].to_numpy(np.float64)
            best_lag, best_corr, best_n = None, -np.inf, 0
            for lag in range(-max_lag, max_lag + 1):
                # pair a[day] with b[day + lag]
                shifted = db - lag
                ia = np.searchsorted(da, shifted)
                ia[ia == len(da)] = 0
                hit = da[ia] == shifted
                if hit.sum() < min_pairs:
                    continue
                x = va[ia[hit]]
                y = vb[hit]
                xd = x - x.mean()
                yd = y - y.mean()
                den = np.sqrt((xd * xd).sum() * (yd * yd).sum())
                if den <= 0:
                    continue
                c = float((xd * yd).sum() / den)
                if c > best_corr:
                    best_lag, best_corr, best_n = lag, c, int(hit.sum())
            if best_lag is None:
                continue
            rows.append({"url": u, "metric_a": ma, "metric_b": mb,
                         "best_lag": np.int64(best_lag),
                         "n_pairs": np.int64(best_n),
                         "best_corr": best_corr})
        cols = ["url", "metric_a", "metric_b", "best_lag", "n_pairs",
                "best_corr"]
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        out["best_corr"] = sql_round(
            out["best_corr"].to_numpy(np.float64), round_to) + 0.0
        return out

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()),
                        ("metric_a", pa.string()),
                        ("metric_b", pa.string()),
                        ("best_lag", pa.int64()),
                        ("n_pairs", pa.int64()),
                        ("best_corr", pa.float64())])
    return partitioned_map(daily_means(ds_long), kernel, url_col="url",
                           out_schema=schema)
