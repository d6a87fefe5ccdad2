"""Single-node reference implementation (plain pandas/numpy, no Ray).

The equivalence target for every distributed stage (SURVEY §5): the Ray
pipeline's rolled-up points at every tier, the gap-filled grid and the
deduped observation table must match these functions exactly. Gap-fill
edge semantics follow the reference's
``interpolate(limit_direction='both')`` (``utils/class_run.py:194``)
expressed time-based (``method='index'`` ≡ FORCE TSI time-proportional
interpolation, ``force/skel/TSA_NoCom.prm:78``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_BODY_RE = re.compile(rb"<body>(.*)</body>", re.S)


def extract_oracle(crawl: pd.DataFrame, n_buckets: int = 64) -> pd.DataFrame:
    """html → text + metrics; drops rows with no/empty body."""
    texts = []
    for h in crawl["html"]:
        m = _BODY_RE.search(h if isinstance(h, (bytes, bytearray)) else h.encode())
        texts.append(m.group(1).decode() if m else None)
    out = pd.DataFrame({
        "url": crawl["url"].to_numpy(),
        "warc_ts": crawl["warc_ts"].to_numpy(),
        "lang": crawl["lang"].to_numpy(),
        "text": texts,
    })
    out = out[out["text"].notna() & (out["text"].str.len() > 0)].copy()
    h = pd.util.hash_array(out["url"].to_numpy(dtype=object), categorize=False)
    out["url_bucket"] = (h % np.uint64(n_buckets)).astype(np.uint32)
    out["text_len"] = out["text"].str.len().astype(np.int64)
    out["word_count"] = (out["text"].str.count(" ") + 1).astype(np.int64)
    return out.reset_index(drop=True)


def dedup_oracle(obs: pd.DataFrame, min_series_len: int = 2) -> pd.DataFrame:
    """First-wins per (url, warc_ts) with deterministic tie-break, then
    drop series shorter than ``min_series_len``."""
    df = obs.sort_values(["url", "warc_ts", "text_len", "word_count", "lang"],
                         kind="mergesort")
    df = df[~df.duplicated(["url", "warc_ts"], keep="first")]
    sizes = df.groupby("url")["url"].transform("size")
    return df[sizes >= min_series_len].reset_index(drop=True)


def to_long_oracle(obs: pd.DataFrame, metrics=("text_len", "word_count")) -> pd.DataFrame:
    parts = []
    for m in metrics:
        parts.append(pd.DataFrame({
            "url": obs["url"],
            "url_bucket": obs["url_bucket"],
            "warc_ts": obs["warc_ts"],
            "metric": m,
            "value": obs[m].astype(np.float64),
        }))
    return pd.concat(parts, ignore_index=True)


def _floor_bucket(ts: pd.Series, tier_seconds: int) -> pd.Series:
    if tier_seconds == 7 * 86400:
        return ts.dt.to_period("W-SUN").dt.start_time  # Monday-start ISO week
    return ts.dt.floor(f"{tier_seconds}s")


def rollup_oracle(long_obs: pd.DataFrame, tier_seconds: int) -> pd.DataFrame:
    """count/sum/min/max/mean/last per (url, metric, bucket)."""
    df = long_obs.copy()
    df["bucket_ts"] = _floor_bucket(pd.to_datetime(df["warc_ts"]), tier_seconds)
    df = df.sort_values(["url", "metric", "bucket_ts", "warc_ts"],
                        kind="mergesort")
    g = df.groupby(["url_bucket", "url", "metric", "bucket_ts"],
                   sort=True, as_index=False)
    out = g.agg(
        count=("value", "size"),
        sum=("value", "sum"),
        min=("value", "min"),
        max=("value", "max"),
        last=("value", "last"),
    )
    out["mean"] = out["sum"] / out["count"]
    return out[["url_bucket", "url", "metric", "bucket_ts",
                "count", "sum", "min", "max", "mean", "last"]]


def gapfill_oracle(long_obs: pd.DataFrame, grid_seconds: int,
                   method: str = "linear", edges: str = "both") -> pd.DataFrame:
    """Per-(url, metric) equidistant grid via pandas time-based
    interpolation — the semantics yardstick for stages/gapfill.py."""
    step = pd.Timedelta(seconds=grid_seconds)
    outs = []
    for (url, metric), g in long_obs.groupby(["url", "metric"], sort=True):
        g = g.sort_values("warc_ts", kind="mergesort")
        s = pd.Series(g["value"].to_numpy(np.float64),
                      index=pd.to_datetime(g["warc_ts"]))
        lo = s.index[0].ceil(step)
        hi = s.index[-1].floor(step)
        if hi < lo:
            continue
        grid = pd.date_range(lo, hi, freq=step)
        union = s.reindex(s.index.union(grid))
        if method == "linear":
            union = union.interpolate(method="index", limit_direction="both")
        elif method == "locf":
            union = union.ffill()
            if edges == "both":
                union = union.bfill()
        vals = union.reindex(grid)
        outs.append(pd.DataFrame({
            "url": url,
            "url_bucket": g["url_bucket"].iloc[0],
            "metric": metric,
            "grid_ts": grid,
            "value": vals.to_numpy(np.float64),
            "filled": ~grid.isin(s.index),
        }))
    if not outs:
        return pd.DataFrame(columns=["url", "url_bucket", "metric",
                                     "grid_ts", "value", "filled"])
    return pd.concat(outs, ignore_index=True)
