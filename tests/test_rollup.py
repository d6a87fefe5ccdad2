import pandas as pd
import pytest

from sits_classification_ray.config import TIER_SECONDS, EngineConfig
from sits_classification_ray.oracle.reference import (
    dedup_oracle,
    extract_oracle,
    rollup_oracle,
    to_long_oracle,
)
from sits_classification_ray.stages.extract import extract, to_long
from sits_classification_ray.stages.rollup import finalize, reaggregate, rollup
from sits_classification_ray.stages.series import assemble_series

CFG = EngineConfig()
KEY = ["url", "metric", "bucket_ts"]
COLS = KEY + ["count", "sum", "min", "max", "mean", "last"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["bucket_ts"] = pd.to_datetime(df["bucket_ts"])
    return (df[COLS].sort_values(KEY, kind="mergesort")
            .reset_index(drop=True).astype({"count": "int64"}))


@pytest.fixture(scope="module")
def long_ds(crawl_table):
    import ray.data as rd
    ds = rd.from_arrow(crawl_table)
    return to_long(assemble_series(extract(ds, CFG), CFG), CFG.metrics)


@pytest.fixture(scope="module")
def long_pdf(crawl_pdf):
    obs = dedup_oracle(extract_oracle(crawl_pdf, CFG.n_buckets),
                       CFG.min_series_len)
    return to_long_oracle(obs, CFG.metrics)


@pytest.mark.parametrize("tier", ["hourly", "daily", "weekly"])
def test_rollup_matches_oracle(long_ds, long_pdf, tier):
    secs = TIER_SECONDS[tier]
    got = finalize(rollup(long_ds, secs, CFG)).to_pandas()
    want = rollup_oracle(long_pdf, secs)
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_tier_chain_equals_direct(long_ds):
    """daily-from-hourly-partials == daily-from-observations, exactly."""
    hourly = rollup(long_ds, TIER_SECONDS["hourly"], CFG)
    daily_chained = finalize(
        reaggregate(hourly, TIER_SECONDS["daily"], CFG)).to_pandas()
    daily_direct = finalize(
        rollup(long_ds, TIER_SECONDS["daily"], CFG)).to_pandas()
    pd.testing.assert_frame_equal(_norm(daily_chained), _norm(daily_direct))

    weekly_chained = finalize(reaggregate(
        reaggregate(hourly, TIER_SECONDS["daily"], CFG),
        TIER_SECONDS["weekly"], CFG)).to_pandas()
    weekly_direct = finalize(
        rollup(long_ds, TIER_SECONDS["weekly"], CFG)).to_pandas()
    pd.testing.assert_frame_equal(_norm(weekly_chained), _norm(weekly_direct))


def test_hopping_rollup_window_membership(crawl_ds, crawl_pdf):
    """Each observation lands in exactly window/hop windows, and the
    window == hop case equals the tumbling rollup."""
    import ray.data as rd

    from sits_classification_ray.config import EngineConfig
    from sits_classification_ray.oracle.reference import (dedup_oracle,
                                                          extract_oracle,
                                                          to_long_oracle)
    from sits_classification_ray.stages.rollup import (finalize,
                                                       hopping_rollup,
                                                       rollup)

    cfg = EngineConfig()
    long_pdf = to_long_oracle(
        dedup_oracle(extract_oracle(crawl_pdf)), cfg.metrics)
    ds_long = rd.from_pandas(long_pdf)

    hop = finalize(hopping_rollup(ds_long, 6 * 3600, 3600, cfg)).to_pandas()
    assert hop["count"].sum() == 6 * len(long_pdf)

    tumb = finalize(hopping_rollup(ds_long, 3600, 3600, cfg)).to_pandas()
    plain = finalize(rollup(ds_long, 3600, cfg)).to_pandas()
    key = ["url", "metric", "bucket_ts"]
    cols = key + ["count", "sum", "min", "max", "last"]
    pd.testing.assert_frame_equal(
        tumb[cols].sort_values(key).reset_index(drop=True),
        plain[cols].sort_values(key).reset_index(drop=True))

    # manual membership: every obs is inside each of its 6 windows
    w = hop.sample(50, random_state=0) if len(hop) > 50 else hop
    for r in w.itertuples(index=False):
        lo = pd.Timestamp(r.bucket_ts)
        sel = long_pdf[(long_pdf["url"] == r.url)
                       & (long_pdf["metric"] == r.metric)
                       & (long_pdf["warc_ts"] >= lo)
                       & (long_pdf["warc_ts"] < lo + pd.Timedelta(hours=6))]
        assert len(sel) == r.count
