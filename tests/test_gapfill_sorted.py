"""Unbounded-series gap-fill (sort + halo exchange) must be
bit-identical to the salted-partition gap-fill, with series forced to
span multiple sorted blocks."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.stages.gapfill import gapfill
from sits_classification_ray.stages.gapfill_sorted import gapfill_unbounded

KEY = ["url", "metric", "grid_ts"]


@pytest.fixture(scope="module")
def long_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    parts = []
    # one huge series that MUST span many sorted blocks + small ones
    for url, n in [("https://huge.example.com/", 5000),
                   ("https://a.example.com/", 7),
                   ("https://b.example.com/", 2),
                   ("https://c.example.com/", 40)]:
        offs = np.sort(rng.choice(60 * 86400, size=n, replace=False))
        for metric in ("text_len", "word_count"):
            parts.append(pd.DataFrame({
                "url": url,
                "url_bucket": np.uint32(0),
                "metric": metric,
                "warc_ts": base + (offs * 1_000_000).astype("timedelta64[us]"),
                "value": rng.integers(1, 5000, n).astype(np.float64),
            }))
    return pd.concat(parts, ignore_index=True)


@pytest.mark.parametrize("method", ["linear", "locf", "none"])
def test_matches_partitioned_gapfill(long_pdf, method):
    cfg = EngineConfig(fill_method=method)
    ds = rd.from_pandas(long_pdf)
    want = (gapfill(ds, cfg).to_pandas()
            .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    got = (gapfill_unbounded(ds, cfg, num_blocks=16).to_pandas()
           .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[KEY + ["value", "filled"]],
                                  want[KEY + ["value", "filled"]],
                                  check_dtype=False)


def test_huge_series_really_spans_blocks(long_pdf):
    srt = (rd.from_pandas(long_pdf).repartition(16)
           .sort(["url", "metric", "warc_ts"]))
    refs = srt.to_arrow_refs()
    import ray

    blocks = ray.get(refs)
    with_huge = sum(1 for b in blocks
                    if "https://huge.example.com/" in
                    set(b["url"].to_pylist()))
    assert with_huge >= 3        # the premise: one series, many blocks
