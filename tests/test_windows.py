"""Tests for ordered-window operators and small completeness helpers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sits_classification_ray.stages.sampling import early_stop
from sits_classification_ray.stages.scoring import (MODEL_REGISTRY, get_model,
                                                    register_model)
from sits_classification_ray.stages.stm import apply_batch_udf
from sits_classification_ray.stages.windows import (rolling_mean, running_sum,
                                                    sessionize)

H = 3_600_000_000


@pytest.fixture()
def series_ds():
    return rd.from_arrow(pa.table({
        "url": pa.array(["a"] * 4 + ["b"] * 3),
        "url_bucket": pa.array([1] * 7, pa.uint32()),
        "metric": pa.array(["m"] * 7),
        "warc_ts": pa.array([H, 2 * H, 3 * H, 40 * H, H, 2 * H, 60 * H],
                            pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0]),
    }))


def test_running_sum(series_ds):
    out = running_sum(series_ds).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    assert out[out["url"] == "a"]["running_sum"].tolist() == [1, 3, 6, 10]
    assert out[out["url"] == "b"]["running_sum"].tolist() == [10, 30, 60]


def test_rolling_mean(series_ds):
    out = rolling_mean(series_ds, window=2).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    assert out[out["url"] == "a"]["rolling_mean"].tolist() == \
        [1.0, 1.5, 2.5, 3.5]


def test_sessionize(series_ds):
    out = sessionize(series_ds, gap_seconds=86400).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    # url a: gaps 1h,1h,37h → sessions 0,0,0,1; url b: 1h,58h → 0,0,1
    assert out[out["url"] == "a"]["session_id"].tolist() == [0, 0, 0, 1]
    assert out[out["url"] == "b"]["session_id"].tolist() == [0, 0, 1]


def test_batch_udf(series_ds):
    import pyarrow.compute as pc

    def double(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("value"), "value",
                            pc.multiply(t["value"], 2.0))

    out = apply_batch_udf(series_ds, double).to_pandas()
    assert out["value"].sum() == 2 * 70.0


def test_model_registry():
    m = get_model("linear", weights=np.eye(2), bias=np.zeros(2))
    assert (m(np.array([[1.0, 2.0]])) == np.array([[1.0, 2.0]])).all()
    with pytest.raises(KeyError):
        get_model("nope")

    @register_model("const7")
    class Const:
        def __call__(self, x):
            return np.full((len(x), 1), 7.0)

    assert get_model("const7")(np.zeros((3, 2)))[0, 0] == 7.0
    del MODEL_REGISTRY["const7"]


def test_early_stop():
    assert not early_stop([5, 4, 3, 2, 1, 0.5])          # improving
    assert early_stop([1, 1.1, 1.2, 1.3, 1.4, 1.5])      # worsening
    assert not early_stop([1, 2])                         # too short

def test_rolling_median(series_ds):
    from sits_classification_ray.stages.windows import rolling_median

    out = rolling_median(series_ds, window=3).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    # url a values 1,2,3,4 → medians 1, 1.5, 2, 3
    assert out[out["url"] == "a"]["rolling_median"].tolist() == \
        [1.0, 1.5, 2.0, 3.0]
    assert out[out["url"] == "b"]["rolling_median"].tolist() == \
        [10.0, 15.0, 20.0]


def test_threshold_crossings(series_ds):
    from sits_classification_ray.stages.windows import threshold_crossings

    out = (threshold_crossings(series_ds, threshold=15.0)
           .to_pandas().sort_values(["url", "warc_ts"])
           .reset_index(drop=True))
    # url a (1,2,3,4): never reaches 15 → no rows
    # url b (10,20,30): crosses up at the 2nd observation only
    assert out["url"].tolist() == ["b"]
    assert out["value"].tolist() == [20.0]
    assert out["direction"].tolist() == [1]


def test_counter_rate(series_ds):
    from sits_classification_ray.stages.windows import counter_rate

    out = counter_rate(series_ds).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    a = out[out["url"] == "a"]["rate"].tolist()
    assert np.isnan(a[0])
    # monotone counter: increase/dt = 1/3600 per step, then 1/(37*3600)
    assert a[1] == pytest.approx(1.0 / 3600)
    assert a[3] == pytest.approx(1.0 / (37 * 3600))


def test_counter_rate_reset():
    from sits_classification_ray.stages.windows import counter_rate

    ds = rd.from_arrow(pa.table({
        "url": pa.array(["a"] * 3),
        "url_bucket": pa.array([1] * 3, pa.uint32()),
        "metric": pa.array(["m"] * 3),
        "warc_ts": pa.array([H, 2 * H, 3 * H], pa.timestamp("us")),
        "value": pa.array([100.0, 5.0, 10.0]),
    }))
    out = counter_rate(ds).to_pandas().sort_values("warc_ts")
    r = out["rate"].tolist()
    # 100 → 5 is a reset: increase == new value (5), not -95
    assert r[1] == pytest.approx(5.0 / 3600)
    assert r[2] == pytest.approx(5.0 / 3600)


def test_zscore(series_ds):
    from sits_classification_ray.stages.windows import zscore

    out = zscore(series_ds).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    a = out[out["url"] == "a"]  # values 1..4: mean 2.5, std sqrt(1.25)
    exp = (np.arange(1.0, 5.0) - 2.5) / np.sqrt(1.25)
    assert a["z"].to_numpy() == pytest.approx(np.round(exp, 6))


def test_zscore_constant_series_null():
    from sits_classification_ray.stages.windows import zscore

    ds = rd.from_arrow(pa.table({
        "url": pa.array(["c"] * 2),
        "url_bucket": pa.array([0] * 2, pa.uint32()),
        "metric": pa.array(["m"] * 2),
        "warc_ts": pa.array([H, 2 * H], pa.timestamp("us")),
        "value": pa.array([7.0, 7.0]),
    }))
    out = zscore(ds).to_pandas()
    assert out["z"].isna().all()


def test_m4_downsample():
    from sits_classification_ray.stages.downsample import m4_downsample

    # one series, one day bucket, 6 points: first/last/min/max → 4 rows
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["a"] * 6),
        "url_bucket": pa.array([1] * 6, pa.uint32()),
        "metric": pa.array(["m"] * 6),
        "warc_ts": pa.array([H, 2 * H, 3 * H, 4 * H, 5 * H, 6 * H],
                            pa.timestamp("us")),
        "value": pa.array([5.0, 1.0, 9.0, 1.0, 9.0, 6.0]),
    }))
    out = m4_downsample(ds, unit="day").to_pandas().sort_values("warc_ts")
    # first(ts=1h,5), min earliest (ts=2h,1), max earliest (ts=3h,9),
    # last (ts=6h,6)
    assert out["value"].tolist() == [5.0, 1.0, 9.0, 6.0]
    assert len(out["bucket_ts"].unique()) == 1


def test_m4_bounded_output():
    from sits_classification_ray.stages.downsample import m4_downsample

    n = 200
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["a"] * n),
        "url_bucket": pa.array([1] * n, pa.uint32()),
        "metric": pa.array(["m"] * n),
        "warc_ts": pa.array([i * H for i in range(1, n + 1)],
                            pa.timestamp("us")),
        "value": pa.array(np.random.default_rng(0)
                          .normal(size=n).tolist()),
    }))
    out = m4_downsample(ds, unit="day").to_pandas()
    days = out["bucket_ts"].nunique()
    assert len(out) <= 4 * days
    assert (out.groupby("bucket_ts").size() >= 1).all()


def test_ewma(series_ds):
    from sits_classification_ray.stages.windows import ewma

    out = ewma(series_ds, alpha=0.5).to_pandas().sort_values(
        ["url", "warc_ts"]).reset_index(drop=True)
    # url a values 1,2,3,4 with α=0.5: 1, 1.5, 2.25, 3.125
    assert out[out["url"] == "a"]["ewma"].tolist() == \
        [1.0, 1.5, 2.25, 3.125]
    # series restart at url b: 10, 15, 22.5
    assert out[out["url"] == "b"]["ewma"].tolist() == [10.0, 15.0, 22.5]


def test_trend_slope(series_ds):
    from sits_classification_ray.stages.stm import trend_slope

    out = trend_slope(series_ds).to_pandas().sort_values(
        "url").reset_index(drop=True)
    # url b: values 10,20,30 at hours 1,2,60 → exact LSQ slope per day
    x = np.array([1.0, 2.0, 60.0]) / 24.0
    y = np.array([10.0, 20.0, 30.0])
    dx = x - x.mean()
    exp = round(float((dx * (y - y.mean())).sum() / (dx * dx).sum()), 6)
    b = out[out["url"] == "b"]
    assert b["slope"].iloc[0] == pytest.approx(exp)
    assert b["n_obs"].iloc[0] == 3


def test_trend_slope_single_obs_null():
    from sits_classification_ray.stages.stm import trend_slope

    ds = rd.from_arrow(pa.table({
        "url": pa.array(["c"]),
        "url_bucket": pa.array([0], pa.uint32()),
        "metric": pa.array(["m"]),
        "warc_ts": pa.array([H], pa.timestamp("us")),
        "value": pa.array([7.0]),
    }))
    out = trend_slope(ds).to_pandas()
    assert out["slope"].isna().all() and out["n_obs"].tolist() == [1]


def test_partition_extents_matches_pandas():
    from sits_classification_ray.pipelines.queries import \
        _partition_extents_crawl

    out = _partition_extents_crawl("/root/testdata/sf0.001")
    assert (out["n_rows"] >= out["n_urls"]).all()
    assert (out["min_ts"] <= out["max_ts"]).all()
    assert out["url_bucket"].is_unique


def test_metric_correlation():
    from sits_classification_ray.stages.stm import metric_correlation

    ds = rd.from_arrow(pa.table({
        "url": pa.array(["a"] * 4 + ["b"] * 3),
        "url_bucket": pa.array([1] * 7, pa.uint32()),
        "warc_ts": pa.array([H, 2 * H, 3 * H, 4 * H, H, 2 * H, 3 * H],
                            pa.timestamp("us")),
        "text_len": pa.array([10, 20, 30, 40, 5, 5, 5], pa.int64()),
        "word_count": pa.array([1, 2, 3, 4, 9, 1, 4], pa.int64()),
    }))
    out = metric_correlation(ds).to_pandas().sort_values("url")
    # url a: perfectly linear → corr 1; url b: text_len constant → null
    assert out[out["url"] == "a"]["corr"].iloc[0] == pytest.approx(1.0)
    assert np.isnan(out[out["url"] == "b"]["corr"].iloc[0])


def test_peak_time(series_ds):
    from sits_classification_ray.stages.stm import peak_time

    out = peak_time(series_ds).to_pandas().sort_values("url")
    # url a peaks at value 4 (ts 40h); url b at 30 (ts 60h)
    assert out[out["url"] == "a"]["peak_value"].iloc[0] == 4.0
    assert out[out["url"] == "a"]["peak_ts"].iloc[0] == \
        pd.Timestamp("1970-01-02 16:00:00")
    assert out[out["url"] == "b"]["peak_value"].iloc[0] == 30.0


def test_freshness_coverage_islands():
    import pyarrow as pa
    import ray.data as rd

    from sits_classification_ray.stages.windows import freshness_coverage
    H = 3_600_000_000
    # url "a": snaps at 0h and 5h with ttl 2h -> two islands of 2h each,
    # span 7h; url "b": snaps at 0h,1h -> one island 0..3h, span 3h
    ts = [0, 5 * H, 0, H]
    urls = ["a", "a", "b", "b"]
    ds = rd.from_arrow(pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
    }))
    out = (freshness_coverage(ds, ttl_seconds=7200).to_pandas()
           .set_index("url").sort_index())
    a, b = out.loc["a"], out.loc["b"]
    assert a["n_islands"] == 2 and a["union_us"] == 4 * H
    assert a["span_us"] == 7 * H
    assert a["coverage"] == round(4 / 7, 6)
    assert b["n_islands"] == 1 and b["union_us"] == 3 * H
    assert b["coverage"] == 1.0


def test_forecast_backtest_beats_naive_on_trend():
    """On a clean linear trend Holt's one-step error is ~0 while the
    naive forecaster errs by the slope -> MASE << 1."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sits_classification_ray.stages.windows import forecast_backtest

    base = np.datetime64("2024-01-01T00:00:00", "us")
    n = 40
    df = pd.DataFrame({
        "url": "https://t.example/",
        "url_bucket": np.uint32(1),
        "metric": "m",
        "warc_ts": base + np.arange(n) * 86_400_000_000,
        "value": 5.0 + 3.0 * np.arange(n)})
    out = forecast_backtest(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n"] == n
    assert row["mae"] < 1e-6 and row["mase"] < 1e-6


def test_forecast_backtest_matches_scalar_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sits_classification_ray.stages.windows import forecast_backtest

    rng = np.random.default_rng(9)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    y = rng.normal(10, 2, size=25)
    df = pd.DataFrame({
        "url": "https://r.example/",
        "url_bucket": np.uint32(1),
        "metric": "m",
        "warc_ts": base + np.arange(25) * 86_400_000_000,
        "value": y})
    out = forecast_backtest(rd.from_pandas(df)).to_pandas().iloc[0]
    lvl, b = y[0], y[1] - y[0]
    ae = se = nd = 0.0
    cnt = 0
    for t in range(1, 25):
        nd += abs(y[t] - y[t - 1])
        if t >= 2:
            e = y[t] - (lvl + b)
            ae += abs(e); se += e * e; cnt += 1
        ln = 0.5 * y[t] + 0.5 * (lvl + b)
        b = 0.3 * (ln - lvl) + 0.7 * b
        lvl = ln
    assert abs(out["mae"] - ae / cnt) < 1e-6
    assert abs(out["rmse"] - np.sqrt(se / cnt)) < 1e-6
    assert abs(out["mase"] - (ae / cnt) / (nd / 24)) < 1e-6


def test_forecast_backtest_drops_constant_and_short():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sits_classification_ray.stages.windows import forecast_backtest

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    for i in range(10):  # constant series: naive MAE 0 -> dropped
        rows.append(("https://c.example/", "m",
                     base + i * 86_400_000_000, 7.0))
    for i in range(2):   # too short -> dropped
        rows.append(("https://s.example/", "m",
                     base + i * 86_400_000_000, float(i)))
    df = pd.DataFrame(rows, columns=["url", "metric", "warc_ts",
                                     "value"])
    df["url_bucket"] = np.uint32(1)
    out = forecast_backtest(rd.from_pandas(df)).to_pandas()
    assert len(out) == 0
