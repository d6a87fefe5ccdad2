"""Series assembly: per-url sort, first-wins dedup, singleton filter.

The one wide shuffle of the pipeline: co-locate each url's snapshots,
sort time-ascending and collapse duplicate timestamps first-wins — the
distributed re-expression of the reference's vectorized duplicate-date
dedup (``pytorch/predict.py:399-415``: int-encode dates,
``np.unique(..., return_index=True)``, keep first indices) and
singleton-series filter (``utils/class_run.py:154-156``).

Scale shape: the shuffle key is the bucket-major salted url partition
(stages/shuffle.py) — the FORCE-tile analog with explicit head-domain
salting — so the grouped UDF runs once per partition, a single
vectorized pandas kernel over many complete series, not once per url.
Python-level per-group dispatch over billions of urls would dominate
wall time; per-partition it is O(n_buckets·S) invocations of C-speed
sorts with the expected payload bounded by ``hot_key_threshold``.

"First" among exact-duplicate timestamps must be deterministic under
any physical row order, so the winner is the row that sorts first by
the metric columns (ties ⇒ identical rows). The DuckDB oracle mirrors
this with ``row_number() OVER (PARTITION BY url, warc_ts ORDER BY
text_len, word_count, lang)``.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from sits_classification_ray.config import EngineConfig

#: Deterministic tie-break order for duplicate (url, warc_ts) rows.
DEDUP_ORDER = ["text_len", "word_count", "lang"]


def dedup_bucket(df: pd.DataFrame, min_series_len: int = 2) -> pd.DataFrame:
    """Vectorized assembly of one hash bucket: sort all series, dedup
    first-wins per (url, warc_ts), drop short series."""
    order = ["url", "warc_ts"] + [c for c in DEDUP_ORDER if c in df.columns]
    df = df.sort_values(order, kind="mergesort")
    df = df[~df.duplicated(["url", "warc_ts"], keep="first")]
    sizes = df.groupby("url", sort=False)["url"].transform("size")
    return df[sizes >= min_series_len]


def dedup_group(df: pd.DataFrame, min_series_len: int = 2) -> pd.DataFrame:
    """Single-url variant (kept for unit tests / kernel reuse)."""
    order = ["warc_ts"] + [c for c in DEDUP_ORDER if c in df.columns]
    df = df.sort_values(order, kind="mergesort")
    df = df[~df["warc_ts"].duplicated(keep="first")]
    if len(df) < min_series_len:
        return df.iloc[0:0]
    return df


def assemble_series(ds: rd.Dataset, cfg: EngineConfig | None = None,
                    num_partitions: int | None = None,
                    approx_rows: int | None = None) -> rd.Dataset:
    """Salted hash-partition by url → sorted, deduped, filtered
    per-url snapshots (vectorized kernel per partition block).

    The shuffle key is the url itself (complete series per partition),
    salted into ``≥ approx_rows / hot_key_threshold`` partitions so a
    head domain never lands one fat block on one worker."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    cfg = cfg or EngineConfig()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return dedup_bucket(df, cfg.min_series_len)

    return partitioned_map(ds, kernel, url_col="url",
                           n_buckets=cfg.n_buckets,
                           num_partitions=num_partitions,
                           approx_rows=approx_rows,
                           hot_key_threshold=cfg.hot_key_threshold)


def change_rate(ds: rd.Dataset, url_col: str = "url",
                ts_col: str = "warc_ts", text_col: str = "text",
                round_to: int = 6) -> rd.Dataset:
    """Poisson page-change-rate estimation per url — the crawl
    scheduling primitive (Cho & Garcia-Molina, "Estimating Frequency
    of Change", ACM TOIT 3(3), 2003). Reference analog: deciding the
    revisit cadence of a pixel's time series from its observed change
    history.

    Per url over its warc_ts-ordered snapshots: ``n_intervals``
    consecutive pairs, ``n_changes`` of them with differing extracted
    text, and the bias-corrected rate estimator
    ``r̂ = -ln((n - X + 0.5) / (n + 0.5))`` changes per average
    inter-crawl interval, reported as ``lambda_per_day`` plus the
    derived ``recrawl_days = 1/λ_day`` (NULL when no change was ever
    observed — the estimator's r̂ = 0 fixed point).

    Scale shape: snapshots are fingerprinted BEFORE the url shuffle
    (16-byte BLAKE2b of the text — the exchange moves 16 bytes per
    row, not page payloads), then one ``partitioned_map`` on the
    salted url key computes every estimate vectorized via shifted
    compares + groupby aggregates. Float-op order mirrors the DuckDB
    oracle exactly (``-ln(a/b) / (span_s/n) * 86400``)."""
    import hashlib

    import numpy as np

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def fingerprint(df: pd.DataFrame) -> pd.DataFrame:
        fp = [hashlib.blake2b(t.encode("utf-8", "surrogatepass"),
                              digest_size=16).digest()
              for t in df[text_col].astype(str)]
        return pd.DataFrame({url_col: df[url_col].to_numpy(),
                             ts_col: df[ts_col].to_numpy(),
                             "fp": fp})

    hashed = ds.map_batches(fingerprint, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col], kind="mergesort")
        same = df[url_col].to_numpy() == df[url_col].shift().to_numpy()
        chg = (df["fp"].to_numpy(object)
               != df["fp"].shift().to_numpy(object)) & same
        ts_us = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        df = df.assign(_chg=chg.astype(np.int64),
                       _prev=same.astype(np.int64), _us=ts_us)
        g = df.groupby(url_col, sort=False)
        n = g["_prev"].sum().to_numpy(np.float64)
        x = g["_chg"].sum().to_numpy(np.float64)
        span_s = ((g["_us"].max() - g["_us"].min()).to_numpy(np.int64)
                  / 1000000.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_day = (-np.log((n - x + 0.5) / (n + 0.5))
                       / (span_s / n) * 86400.0)
            recrawl = np.where(x > 0, 1.0 / lam_day, np.nan)
        return pd.DataFrame({
            url_col: g.size().index.to_numpy(),
            "n_intervals": n.astype(np.int64),
            "n_changes": x.astype(np.int64),
            "span_seconds": sql_round(span_s, round_to) + 0.0,
            "lambda_per_day": sql_round(lam_day, round_to) + 0.0,
            "recrawl_days": sql_round(recrawl, round_to) + 0.0,
        })

    import pyarrow as pa
    schema = pa.schema([
        (url_col, pa.string()), ("n_intervals", pa.int64()),
        ("n_changes", pa.int64()), ("span_seconds", pa.float64()),
        ("lambda_per_day", pa.float64()),
        ("recrawl_days", pa.float64())])
    return partitioned_map(hashed, kernel, url_col=url_col,
                           out_schema=schema)


def crawl_budget(rates: rd.Dataset, domain_pattern: str,
                 budget: int = 10000) -> rd.Dataset:
    """Per-domain recrawl budget allocation from the
    :func:`change_rate` estimates — the scheduling step of the crawl
    loop: each domain's share of a fixed snapshot budget is
    proportional to its expected change volume Σλ, integerized by the
    largest-remainder (Hamilton) method so quotas sum exactly to
    ``budget``.

    Numeric contract: λ/day is converted to exact integer micro-units
    (``round(λ·1e6)``) BEFORE any aggregation, so every sum is
    order-free integer arithmetic; the only float op is the single
    shared division ``lam·B/total`` — bit-identical on the engine and
    the SQL twin. Ties in the fractional remainder break by domain
    ASC.

    Scale shape: url→domain rollup is one distributed groupby; the
    driver sees two O(1) scalars (total λ, floor-sum); the remainder
    ranking is the O(B)-driver ``global_rank`` construction over the
    domain table — nothing driver-side scales with domains."""
    import numpy as np

    from ray.data.aggregate import Count, Sum
    from sits_classification_ray.stages.scan_sorted import global_rank

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        lam = df["lambda_per_day"].to_numpy(np.float64)
        return pd.DataFrame({
            "domain": df["url"].str.extract(domain_pattern,
                                            expand=False),
            "lam_micro": np.floor(lam * 1000000.0 + 0.5)
            .astype(np.int64),
        })

    agg = (rates.map_batches(proj, batch_format="pandas")
           .groupby("domain")
           .aggregate(Count(alias_name="n_urls"),
                      Sum("lam_micro", alias_name="lam_micro")))
    total = agg.sum("lam_micro")
    if not total:
        return agg.map_batches(
            lambda df: df.assign(quota=np.int64(0)),
            batch_format="pandas")

    def ideal(df: pd.DataFrame) -> pd.DataFrame:
        lm = df["lam_micro"].to_numpy(np.int64)
        x = (lm * budget).astype(np.float64) / float(total)
        fl = np.floor(x)
        return df.assign(_fl=fl.astype(np.int64), _negfrac=-(x - fl))

    idl = agg.map_batches(ideal, batch_format="pandas").materialize()
    rem = budget - int(idl.sum("_fl"))
    ranked = global_rank(idl, ["_negfrac", "domain"], out_rn="_rn",
                         out_pct="_pct")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        quota = (df["_fl"].to_numpy(np.int64)
                 + (df["_rn"].to_numpy(np.int64) <= rem)
                 .astype(np.int64))
        return pd.DataFrame({
            "domain": df["domain"].to_numpy(),
            "n_urls": df["n_urls"].to_numpy(np.int64),
            "lam_micro": df["lam_micro"].to_numpy(np.int64),
            "quota": quota})

    return ranked.map_batches(fin, batch_format="pandas")


def km_staleness(ds: rd.Dataset, url_col: str = "url",
                 ts_col: str = "warc_ts", text_col: str = "text",
                 round_to: int = 6) -> rd.Dataset:
    """Kaplan-Meier survival curve of content staleness — "what is
    the probability a page is still UNCHANGED after t days?" — the
    survival-analysis complement to :func:`change_rate`'s parametric
    Poisson λ̂ (KM is non-parametric and censoring-correct, the
    standard estimator when many pages never change inside the
    observation window).

    Duration samples per url over its fingerprinted snapshot stream:
    from the first snapshot and from every observed change to the
    NEXT change (event) or to the last snapshot (right-censored).
    Durations are floored to whole days. The global KM table is then
    pure integer counting: per day-duration ``d_events`` /
    ``c_censored`` sums, risk set by exclusive prefix subtraction,
    and ``S(t) = Π_{t_j ≤ t} (1 − d_j/n_j)`` over event times in
    ascending order (one row per event time).

    Scale shape: 16-byte fingerprints before the url exchange, integer
    (duration, flag) rows out of the per-url kernel, one distributed
    Sum groupby; the final cumprod runs on the tiny distinct-duration
    table (bounded by the observation window in days)."""
    import hashlib

    import numpy as np

    from ray.data.aggregate import Sum
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def fingerprint(df: pd.DataFrame) -> pd.DataFrame:
        fp = [hashlib.blake2b(t.encode("utf-8", "surrogatepass"),
                              digest_size=16).digest()
              for t in df[text_col].astype(str)]
        return pd.DataFrame({url_col: df[url_col].to_numpy(),
                             ts_col: df[ts_col].to_numpy(),
                             "fp": fp})

    DAY_US = 86_400_000_000

    def durations(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col], kind="mergesort")
        urls = df[url_col].to_numpy()
        us = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        fps = df["fp"].to_numpy(object)
        out_d, out_e = [], []
        i = 0
        n = len(df)
        while i < n:
            j = i
            while j + 1 < n and urls[j + 1] == urls[i]:
                j += 1
            anchor = us[i]
            for k in range(i + 1, j + 1):
                if fps[k] != fps[k - 1]:
                    out_d.append((us[k] - anchor) // DAY_US)
                    out_e.append(1)
                    anchor = us[k]
            if anchor < us[j]:
                out_d.append((us[j] - anchor) // DAY_US)
                out_e.append(0)
            i = j + 1
        return pd.DataFrame({
            "t_days": np.asarray(out_d, dtype=np.int64),
            "d": np.asarray(out_e, dtype=np.int64),
            "c": 1 - np.asarray(out_e, dtype=np.int64)})

    counts = (partitioned_map(
        ds.map_batches(fingerprint, batch_format="pandas"),
        durations, url_col=url_col)
        .groupby("t_days")
        .aggregate(Sum("d", alias_name="d"),
                   Sum("c", alias_name="c")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("t_days", kind="mergesort")
        d = df["d"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        total = int((d + c).sum())
        removed = np.concatenate([[0], np.cumsum(d + c)[:-1]])
        n_risk = total - removed
        factors = 1.0 - d.astype(np.float64) / n_risk
        surv = np.cumprod(factors)
        ev = d > 0
        return pd.DataFrame({
            "t_days": df["t_days"].to_numpy(np.int64)[ev],
            "n_risk": n_risk[ev],
            "d_events": d[ev],
            "c_censored": c[ev],
            "survival": sql_round(surv[ev], round_to) + 0.0})

    return counts.repartition(1).map_batches(fin,
                                             batch_format="pandas")
