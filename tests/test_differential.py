"""Differential property test: the Ray rollup chain vs an independent
single-process pandas model, over RANDOM inputs and configs.

The sweep (tools/check_correctness.py) proves per-tier equivalence on
the fixed synthetic tables; this test drives the same semantic chain —
extract (body split, screening, metrics) → assemble (first-wins dedup,
singleton filter) → tier rollup (count/sum/min/max/mean/last) — with
hypothesis-generated adversarial inputs: duplicate timestamps, missing
or repeated <body> tags, unicode payloads, head-url collisions, odd
n_buckets / min_series_len. Every rolled-up point must match the model
exactly (the north rule's per-tier equivalence, exercised off the happy
path).

Reference semantics being modeled: duplicate-date first-wins dedup
(`pytorch/predict.py:399-415`), singleton filter
(`utils/class_run.py:154-156`), FOLD temporal aggregation
(`force/skel/TSA_NoCom.prm:95-101`).
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.stages.extract import extract, to_long
from sits_classification_ray.stages.rollup import finalize, rollup
from sits_classification_ray.stages.series import assemble_series

_BODY_RE = re.compile(r"(?s)<body>(.*)</body>")
_TIERS = {"hourly": 3600, "daily": 86400, "weekly": 7 * 86400}

_payloads = st.sampled_from([
    "", "x", "hello world", "a b  c", "ü¶é §", "<body>", "</body>",
    "nested <body>inner</body> tail", "line\nbreak\ttab", "0" * 50,
])
_wrappers = st.sampled_from([
    "<html><body>{p}</body></html>",     # normal
    "<html>{p}</html>",                  # no body tags
    "<body>{p}</body><body>second</body>",   # repeated open/close
    "</body>{p}<body>",                  # close before open
    "<body>{p}",                         # unterminated
    "<body></body>",                     # empty body
])


@st.composite
def crawl_rows(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    urls = [f"https://site{draw(st.integers(0, 7))}.test/p{draw(st.integers(0, 3))}"
            for _ in range(n)]
    # seconds within a ~3-week span, coarse enough to force duplicate
    # timestamps per url and multi-row tier buckets
    ts = [draw(st.integers(0, 20 * 86400)) // 600 * 600 for _ in range(n)]
    html = [draw(_wrappers).format(p=draw(_payloads)) for _ in range(n)]
    lang = [draw(st.sampled_from(["en", "de", "fr"])) for _ in range(n)]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(
            pd.to_datetime(np.array(ts, np.int64), unit="s"),
            pa.timestamp("us")),
        "html": pa.array([h.encode() for h in html], pa.binary()),
        "lang": pa.array(lang, pa.string()),
    })


def _model_tier(crawl: pa.Table, n_buckets: int, min_series_len: int,
                tier_seconds: int) -> pd.DataFrame:
    """Independent pandas model of extract → dedup → one tier."""
    df = crawl.to_pandas()
    df["html"] = df["html"].map(lambda b: b.decode())

    def body(h: str) -> str | None:
        m = _BODY_RE.search(h)
        return m.group(1) if m else None

    df["text"] = df["html"].map(body)
    df = df[df["text"].notna() & (df["text"].str.len() > 0)].copy()
    df["text_len"] = df["text"].str.len().astype("int64")
    df["word_count"] = (df["text"].str.count(" ") + 1).astype("int64")
    h = pd.util.hash_array(df["url"].to_numpy(object), categorize=False)
    df["url_bucket"] = (h % np.uint64(n_buckets)).astype("uint32")

    # first-wins dedup with the deterministic tie-break, then the
    # singleton-series filter
    df = df.sort_values(["url", "warc_ts", "text_len", "word_count",
                         "lang"], kind="mergesort")
    df = df[~df.duplicated(["url", "warc_ts"], keep="first")]
    df = df[df.groupby("url")["url"].transform("size") >= min_series_len]

    long = df.melt(id_vars=["url", "url_bucket", "warc_ts"],
                   value_vars=["text_len", "word_count"],
                   var_name="metric", value_name="value")
    long["value"] = long["value"].astype("float64")
    ts = long["warc_ts"]
    if tier_seconds == 7 * 86400:
        day = ts.dt.normalize()
        long["bucket_ts"] = day - pd.to_timedelta(day.dt.weekday, unit="D")
    else:
        long["bucket_ts"] = ts.dt.floor(f"{tier_seconds}s")

    long = long.sort_values(["url", "metric", "warc_ts"], kind="mergesort")
    g = long.groupby(["url_bucket", "url", "metric", "bucket_ts"],
                     sort=True, as_index=False)
    out = g.agg(count=("value", "size"), sum=("value", "sum"),
                min=("value", "min"), max=("value", "max"),
                last=("value", "last"))
    out["mean"] = out["sum"] / out["count"]
    return out[["url_bucket", "url", "metric", "bucket_ts",
                "count", "sum", "min", "max", "mean", "last"]]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(crawl=crawl_rows(),
       n_buckets=st.sampled_from([1, 3, 8]),
       min_series_len=st.sampled_from([1, 2, 3]),
       tier=st.sampled_from(sorted(_TIERS)))
def test_rollup_matches_independent_model(crawl, n_buckets,
                                          min_series_len, tier):
    cfg = EngineConfig(n_buckets=n_buckets, min_series_len=min_series_len)
    ds = extract(rd.from_arrow(crawl), cfg)
    obs = assemble_series(ds, cfg, approx_rows=crawl.num_rows)
    got_ds = finalize(rollup(to_long(obs, cfg.metrics),
                             _TIERS[tier], cfg))
    got = got_ds.to_pandas()

    want = _model_tier(crawl, n_buckets, min_series_len, _TIERS[tier])

    if want.empty:
        # every row screened/filtered out — the Ray side must agree
        # (an empty Dataset may surface with no schema at all)
        assert len(got) == 0
        return

    key = ["url_bucket", "url", "metric", "bucket_ts"]
    got = (got.sort_values(key, kind="mergesort").reset_index(drop=True)
           [want.columns])
    want = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    got = got.astype(want.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want, check_exact=True)
