"""Tests for join operators, model scoring, and augmentations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.stages.augment import (apply_augmentations,
                                                    drop_observations,
                                                    scale_gain, time_shift,
                                                    time_warp, zero_out)
from sits_classification_ray.stages.joins import (anti_join_filter, asof_join,
                                                  hash_join, semi_join_filter)
from sits_classification_ray.stages.scoring import (SENTINEL, LinearModel,
                                                    score)

CFG = EngineConfig()


def _h(n):
    return n * 3_600_000_000


@pytest.fixture()
def asof_frames():
    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b"]),
        "lt": pa.array([_h(1), _h(5), _h(10), _h(2)], pa.timestamp("us")),
        "payload": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b"]),
        "rt": pa.array([_h(2), _h(6), _h(3)], pa.timestamp("us")),
        "v": pa.array([20.0, 60.0, 30.0]),
    }))
    return left, right


def test_asof_join_backward(asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, by="k", left_ts="lt", right_ts="rt",
                    value_cols=["v"]).to_pandas()
    out = out.sort_values(["k", "lt"]).reset_index(drop=True)
    # a@1h: no earlier right → null; a@5h → 20 (rt=2h); a@10h → 60 (rt=6h)
    # b@2h: no earlier right (rt=3h) → null
    assert np.isnan(out["v"].iloc[0])
    assert out["v"].iloc[1] == 20.0
    assert out["v"].iloc[2] == 60.0
    assert np.isnan(out["v"].iloc[3])
    assert out["payload"].tolist() == [1, 2, 3, 4]


def test_hash_join_inner():
    l = rd.from_arrow(pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                                "x": pa.array(["a", "b", "c"])}))
    r = rd.from_arrow(pa.table({"rid": pa.array([2, 3, 4], pa.int64()),
                                "y": pa.array([20.0, 30.0, 40.0])}))
    out = hash_join(l, r, on="id", right_on="rid",
                    num_partitions=4).to_pandas().sort_values("id")
    assert out["id"].tolist() == [2, 3]
    assert out["y"].tolist() == [20.0, 30.0]


def test_semi_anti_join_filters():
    ds = rd.from_arrow(pa.table({"id": pa.array(range(6), pa.int64()),
                                 "tag": pa.array(list("aabbcc"))}))
    semi = semi_join_filter(ds, "tag", ["a", "c"]).to_pandas()
    anti = anti_join_filter(ds, "tag", ["a", "c"]).to_pandas()
    assert sorted(semi["id"]) == [0, 1, 4, 5]
    assert sorted(anti["id"]) == [2, 3]


def test_scoring_zero_mask_and_argmax():
    ds = rd.from_arrow(pa.table({
        "f1": pa.array([0.0, 1.0, 100.0]),
        "f2": pa.array([0.0, 1.0, 0.0]),
    }))
    model = LinearModel(weights=np.array([[1.0, 0.0], [0.0, 1.0]]),
                        bias=np.array([0.0, 0.0]))
    out = score(ds, model, ["f1", "f2"], mode="class").to_pandas()
    assert out["prediction"].iloc[0] == SENTINEL       # all-zero skipped
    assert out["prediction"].iloc[2] == 0.0            # argmax f1
    # regression mode with inverse norm
    out2 = score(ds, LinearModel(np.array([[1.0], [0.0]]), np.array([0.0])),
                 ["f1", "f2"], mode="regression",
                 inverse_norm=lambda p: p * 2).to_pandas()
    assert out2["prediction"].iloc[2] == 200.0
    assert out2["prediction"].iloc[0] == SENTINEL


@pytest.fixture()
def long_series():
    n = 200
    return rd.from_arrow(pa.table({
        "url": pa.array(["u1"] * (n // 2) + ["u2"] * (n // 2)),
        "url_bucket": pa.array([1] * n, pa.uint32()),
        "metric": pa.array(["m"] * n),
        "warc_ts": pa.array(np.arange(n) * 3_600_000_000, pa.timestamp("us")),
        "value": pa.array(np.arange(n, dtype=np.float64)),
    }))


def test_augmentations_deterministic(long_series):
    a = drop_observations(long_series, seed=5).to_pandas()
    b = drop_observations(long_series, seed=5).to_pandas()
    key = ["url", "warc_ts"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    assert 0 < len(a) < 200


def test_augmentations_semantics(long_series):
    shifted = time_shift(long_series, max_shift_seconds=3600,
                         seed=1).to_pandas()
    assert len(shifted) == 200
    zeroed = zero_out(long_series, frac=0.5, seed=1).to_pandas()
    assert (zeroed["value"] == 0).sum() > 20
    gained = scale_gain(long_series, sigma=0.1, seed=1).to_pandas()
    g = gained.sort_values(["url", "warc_ts"])
    src = long_series.to_pandas().sort_values(["url", "warc_ts"])
    ratio = g[g["url"] == "u1"]["value"].to_numpy()[1:] / \
        src[src["url"] == "u1"]["value"].to_numpy()[1:]
    assert np.allclose(ratio, ratio[0])                # one gain per series
    warped = time_warp(long_series, seed=1).to_pandas()
    w = warped[warped["url"] == "u1"].sort_values("warc_ts")
    assert w["warc_ts"].is_monotonic_increasing


def test_augmentation_composition(long_series):
    out = apply_augmentations(long_series, ["drop_observations", "zero_out"],
                              seed=3).to_pandas()
    assert 0 < len(out) <= 200


def test_csv_reader_roundtrip(tmp_path, crawl_table):
    from sits_classification_ray.sources.readers import (read_crawl_csv,
                                                         write_crawl_csv)

    p = str(tmp_path / "crawl.csv")
    write_crawl_csv(crawl_table.slice(0, 100), p)
    back = read_crawl_csv(p).to_pandas()
    src = crawl_table.slice(0, 100).to_pandas()
    key = ["url", "warc_ts"]
    b = back.sort_values(key + ["text"]).reset_index(drop=True)
    s = src.sort_values(key + ["text"]).reset_index(drop=True)
    assert (b["html"] == s["html"]).all()
    assert (b["text"] == s["text"]).all()


def test_regression_metrics_exact():
    from sits_classification_ray.stages.sampling import regression_metrics

    ds = rd.from_arrow(pa.table({
        "y": pa.array([1.0, 2.0, 3.0, 4.0]),
        "p": pa.array([1.0, 2.0, 5.0, 4.0]),
    }))
    out = regression_metrics(ds, "y", "p").set_index("metric_name")["value"]
    assert out["rmse"] == 1.0
    assert out["mae"] == 0.5
    assert out["n"] == 4.0
    # r2 = 1 - 4/5
    assert abs(out["r2"] - (1 - 4 / 5)) < 1e-12

def test_range_join_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.joins import range_join

    base = np.datetime64("2024-01-01T00:00:00", "us")
    left = pd.DataFrame({
        "url": ["u1"] * 5 + ["u2"] * 3,
        "warc_ts": [base + np.timedelta64(h, "h")
                    for h in [0, 1, 5, 10, 24, 0, 2, 9]],
        "x": np.arange(8, dtype=np.int64),
    })
    right = pd.DataFrame({
        "url": ["u1", "u1", "u2", "u3"],
        "s": [base, base + np.timedelta64(4, "h"),
              base + np.timedelta64(1, "h"), base],
        "e": [base + np.timedelta64(2, "h"), base + np.timedelta64(11, "h"),
              base + np.timedelta64(3, "h"), base + np.timedelta64(9, "h")],
        "v": [10.0, 20.0, 30.0, 40.0],
    })
    got = (range_join(rd.from_pandas(left), rd.from_pandas(right),
                      by="url", left_ts="warc_ts", right_start="s",
                      right_end="e", value_cols=["v"])
           .to_pandas().sort_values(["url", "warc_ts", "s"])
           .reset_index(drop=True))
    want = (left.merge(right, on="url")
            .query("warc_ts >= s and warc_ts < e")
            .sort_values(["url", "warc_ts", "s"]).reset_index(drop=True))
    assert len(got) == len(want) == 5
    pd.testing.assert_frame_equal(
        got[["url", "warc_ts", "s", "v"]].astype({"v": float}),
        want[["url", "warc_ts", "s", "v"]], check_dtype=False)


def test_bloom_semi_join_matches_exact():
    from sits_classification_ray.stages.joins import bloom_semi_join

    left = pd.DataFrame({"id": np.arange(2000, dtype=np.int64),
                         "v": np.arange(2000, dtype=np.int64) * 3})
    right = pd.DataFrame({"rid": np.arange(0, 900, 3, dtype=np.int64)})
    out = (bloom_semi_join(rd.from_pandas(left), "id",
                           rd.from_pandas(right), "rid")
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = set(right["rid"])
    # m=2^20 vs n=300 keys: FP probability ~ (1-e^{-7*300/2^20})^7 ≈ 1e-19
    assert set(out["id"]) == want
    assert (out["v"] == out["id"] * 3).all()


def test_bloom_semi_join_block_invariant():
    from sits_classification_ray.stages.joins import bloom_semi_join

    left = pd.DataFrame({"id": np.arange(500, dtype=np.int64)})
    right = pd.DataFrame({"rid": np.arange(0, 500, 7, dtype=np.int64)})
    a = (bloom_semi_join(rd.from_pandas(left), "id",
                         rd.from_pandas(right), "rid")
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (bloom_semi_join(rd.from_pandas(left).repartition(11), "id",
                         rd.from_pandas(right).repartition(5), "rid")
         .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --- split-conformal intervals ---------------------------------------------

def _conformal_df(seed=3, n=2000):
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(seed)
    pred = np.round(rng.normal(50, 5, size=n), 6)
    y = pred + rng.normal(0, 2, size=n)
    return pd.DataFrame({
        "pred": pred, "y": y,
        "fold": rng.integers(0, 5, size=n).astype(np.int64)})


def test_conformal_coverage_and_reference():
    import numpy as np
    import ray.data as rd
    from sits_classification_ray.stages.scoring import conformal_intervals

    df = _conformal_df()
    out = conformal_intervals(rd.from_pandas(df).repartition(8),
                              alpha=0.1).to_pandas()
    # reference qhat: ceil((n+1)*0.9)-th smallest calibration residual
    cal = df[df["fold"] == 0]
    r = np.sort(np.round(np.abs(cal["y"] - cal["pred"]) * 1e6)
                .astype(np.int64))
    rank = min(int(np.ceil((len(r) + 1) * 0.9)), len(r))
    qhat = r[rank - 1] / 1e6
    assert np.allclose(out["hi"] - out["pred"], qhat, atol=2e-6)
    assert np.allclose(out["pred"] - out["lo"], qhat, atol=2e-6)
    # distribution-free marginal coverage on exchangeable data
    test = df[df["fold"] != 0].reset_index(drop=True)
    o = out.reset_index(drop=True)
    cover = ((test["y"].to_numpy() >= o["lo"].to_numpy())
             & (test["y"].to_numpy() <= o["hi"].to_numpy())).mean()
    assert 0.86 <= cover <= 0.95
    assert len(out) == len(test)


def test_conformal_empty_calibration_raises():
    import pytest
    import ray.data as rd
    from sits_classification_ray.stages.scoring import conformal_intervals

    df = _conformal_df(n=50)
    df["fold"] = 1
    with pytest.raises(ValueError):
        conformal_intervals(rd.from_pandas(df))
