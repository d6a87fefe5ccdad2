"""Tests for the anomaly/forecast family: Holt smoothing, CUSUM,
seasonal baseline, MAD scores, lag-1 autocorrelation, time-weighted
averages, the unigram LM quality score, and SQL round semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sits_classification_ray.functions.transforms import sql_round
from sits_classification_ray.oracle import golden
from sits_classification_ray.stages.downsample import time_weighted_avg
from sits_classification_ray.stages.stm import autocorr_lag1, mad_anomaly
from sits_classification_ray.stages.textstats import unigram_logprob
from sits_classification_ray.stages.windows import (cusum, holt_linear,
                                                    seasonal_baseline)

H = 3_600_000_000  # 1h in µs


def _long_ds(urls, values, ts=None, metric="m"):
    n = len(urls)
    ts = ts if ts is not None else [(i + 1) * H for i in range(n)]
    return rd.from_arrow(pa.table({
        "url": pa.array(urls),
        "url_bucket": pa.array([1] * n, pa.uint32()),
        "metric": pa.array([metric] * n),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([float(v) for v in values]),
    }))


def _rand_long(n_series=17, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    t0 = 0
    for s in range(n_series):
        n = int(rng.integers(1, 40))
        ts = np.sort(rng.choice(np.arange(1, 2000), size=n, replace=False))
        for i in range(n):
            rows.append((f"u{s}", int(ts[i]) * H,
                         float(rng.integers(0, 50))))
        t0 += n
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "value"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    df["metric"] = np.where(np.arange(len(df)) % 3 == 0, "a", "b")
    df["url_bucket"] = np.uint32(1)
    return df


def test_sql_round_half_away():
    vals = np.array([-1.8515625, 136.2578125, 2.5, -2.5, np.nan, 0.1])
    out = sql_round(vals, 6)
    assert out[0] == -1.851563 and out[1] == 136.257813
    assert sql_round(np.array([2.5]), 0)[0] == 3.0
    assert sql_round(np.array([-2.5]), 0)[0] == -3.0
    assert np.isnan(out[4]) and out[5] == 0.1


def test_holt_matches_independent_recursion():
    df = _rand_long()
    out = (holt_linear(rd.from_pandas(df)).to_pandas()
           .sort_values(["url", "metric", "warc_ts"])
           .reset_index(drop=True))
    exp = (golden.holt_linear_crawl(df[["url", "metric", "warc_ts",
                                        "value"]])
           .sort_values(["url", "metric", "warc_ts"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["url", "metric", "level", "trend"]],
        exp[["url", "metric", "level", "trend"]])


def test_holt_singleton_series():
    out = holt_linear(_long_ds(["a"], [5.0])).to_pandas()
    assert out["level"].tolist() == [5.0]
    assert out["trend"].tolist() == [0.0]


def test_cusum_matches_independent_recursion():
    df = _rand_long(seed=11)
    out = (cusum(rd.from_pandas(df)).to_pandas()
           .sort_values(["url", "metric", "warc_ts"])
           .reset_index(drop=True))
    exp = (golden.cusum_crawl(df[["url", "metric", "warc_ts", "value"]])
           .sort_values(["url", "metric", "warc_ts"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["cusum_pos", "cusum_neg", "alarm"]],
        exp[["cusum_pos", "cusum_neg", "alarm"]])


def test_cusum_constant_series_null():
    out = cusum(_long_ds(["a"] * 4, [7, 7, 7, 7])).to_pandas()
    assert out["cusum_pos"].isna().all()
    assert not out["alarm"].any()


def test_cusum_detects_level_shift():
    # prefix z ≈ −0.707 → s⁻ grows 0.207/step (stays < 4 over 10);
    # tail z ≈ +1.414 → s⁺ grows 0.914/step (crosses 4 inside 5)
    vals = [10.0] * 10 + [30.0] * 5
    out = cusum(_long_ds(["a"] * 15, vals), k=0.5, h=4.0).to_pandas() \
        .sort_values("warc_ts").reset_index(drop=True)
    assert not out["alarm"][:10].any()      # in-control prefix
    assert out["alarm"].iloc[-1]            # shifted tail alarms


def test_autocorr_perfect_trend_is_one():
    out = autocorr_lag1(_long_ds(["a"] * 5, [1, 2, 3, 4, 5])).to_pandas()
    assert out["n_pairs"].tolist() == [4]
    assert out["autocorr"].tolist() == [1.0]


def test_autocorr_alternating_is_minus_one():
    out = autocorr_lag1(_long_ds(["a"] * 6, [1, -1, 1, -1, 1, -1])
                        ).to_pandas()
    assert out["autocorr"].tolist() == [-1.0]


def test_autocorr_short_or_constant_null():
    out = autocorr_lag1(_long_ds(["a", "a", "b", "b", "b"],
                                 [1, 2, 5, 5, 5])).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["autocorr"].isna().all()     # 1 pair / constant side


def test_mad_anomaly_known_values():
    # series 1..5: med=3, absdev=[2,1,0,1,2], mad=1
    out = mad_anomaly(_long_ds(["a"] * 5, [1, 2, 3, 4, 5])).to_pandas() \
        .sort_values("warc_ts").reset_index(drop=True)
    assert out["med"].tolist() == [3.0] * 5
    assert out["mad"].tolist() == [1.0] * 5
    assert out["robust_z"].tolist() == [-2.0, -1.0, 0.0, 1.0, 2.0]


def test_mad_zero_gives_null():
    out = mad_anomaly(_long_ds(["a"] * 4, [5, 5, 5, 9])).to_pandas()
    assert out["robust_z"].isna().all()     # mad == 0


def test_time_weighted_avg_locf():
    # one day: obs at 1h(v=10), 3h(v=20), 4h(v=40)
    # weights: 10·2h + 20·1h over span 3h → (20+20)/3
    out = time_weighted_avg(
        _long_ds(["a"] * 3, [10, 20, 40], ts=[H, 3 * H, 4 * H])
    ).to_pandas()
    assert len(out) == 1
    assert out["n_obs"].tolist() == [3]
    assert out["twa"].tolist() == [sql_round(np.array([40.0 / 3]))[0]]


def test_time_weighted_avg_single_obs_bucket():
    out = time_weighted_avg(
        _long_ds(["a", "a"], [10, 99], ts=[H, 30 * 24 * H])).to_pandas() \
        .sort_values("bucket_ts").reset_index(drop=True)
    assert out["twa"].tolist() == [10.0, 99.0]


def test_seasonal_baseline():
    # two days, same hours: hod 1 gets mean(10,30)=20, hod 2 mean(20,40)=30
    D = 24 * H
    out = seasonal_baseline(
        _long_ds(["a"] * 4, [10, 20, 30, 40],
                 ts=[H, 2 * H, D + H, D + 2 * H])).to_pandas() \
        .sort_values("warc_ts").reset_index(drop=True)
    assert out["hod"].tolist() == [1, 2, 1, 2]
    assert out["baseline"].tolist() == [20.0, 30.0, 20.0, 30.0]
    assert out["anomaly"].tolist() == [-10.0, -10.0, 10.0, 10.0]


def test_unigram_logprob_tiny_corpus():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the cat", "the the"]),
    }))
    out = unigram_logprob(docs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # counts: the=3, cat=1, total=4
    exp0 = (np.log(3 / 4) + np.log(1 / 4)) / 2
    exp1 = np.log(3 / 4)
    assert out["n_tokens"].tolist() == [2, 2]
    assert out["avg_logprob"].tolist() == [
        sql_round(np.array([exp0]))[0], sql_round(np.array([exp1]))[0]]


def test_series_gaps():
    from sits_classification_ray.stages.stm import series_gaps
    # gaps: 1h, 1h, 72h (stale at 48h threshold)
    out = series_gaps(
        _long_ds(["a"] * 4, [1, 2, 3, 4], ts=[H, 2 * H, 3 * H, 75 * H]),
        stale_seconds=172_800.0).to_pandas()
    assert out["n_obs"].tolist() == [4]
    assert out["span_s"].tolist() == [74 * 3600.0]
    assert out["max_gap_s"].tolist() == [72 * 3600.0]
    assert out["n_stale_gaps"].tolist() == [1]
    assert out["mean_gap_s"].tolist() == [
        sql_round(np.array([74 * 3600.0 / 3]))[0]]


def test_duplicate_ngrams():
    from sits_classification_ray.stages.textstats import duplicate_ngrams
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c d x", "z a b c d", "q r s t u"]),
    }))
    out = duplicate_ngrams(docs, k=4, min_docs=2).to_pandas()
    assert out["gram"].tolist() == ["a b c d"]
    assert out["n_docs"].tolist() == [2]
    assert out["n_occ"].tolist() == [2]


def test_duplicate_ngrams_within_doc_repeat_not_cross():
    from sits_classification_ray.stages.textstats import duplicate_ngrams
    # the repeated gram lives in ONE doc → n_docs=1 → filtered out
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b a b a b"]),
    }))
    assert duplicate_ngrams(docs, k=2, min_docs=2).count() == 0


def test_bigram_logprob_tiny_corpus():
    from sits_classification_ray.stages.textstats import bigram_logprob
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["the cat sat", "the cat ran", "the"]),
    }))
    out = bigram_logprob(docs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # unigrams: the=3 cat=2 sat=1 ran=1; bigrams: (the,cat)=2 (cat,sat)=1
    # (cat,ran)=1. doc0: ln(2/3), ln(1/2); doc1: ln(2/3), ln(1/2).
    # doc2 has no bigrams → omitted.
    exp = sql_round(np.array([(np.log(2 / 3) + np.log(1 / 2)) / 2]))[0]
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_bigrams"].tolist() == [2, 2]
    assert out["avg_logprob"].tolist() == [exp, exp]


def test_theil_sen_robust_to_outlier():
    from sits_classification_ray.stages.stm import theil_sen
    D = 24 * H
    # perfect unit-slope line + one wild outlier: median slope stays 1
    out = theil_sen(_long_ds(["a"] * 5, [0, 1, 2, 3, 100],
                             ts=[D, 2 * D, 3 * D, 4 * D, 5 * D])
                    ).to_pandas()
    assert out["n_obs"].tolist() == [5]
    assert out["theil_sen_slope"].tolist() == [1.0]


def test_theil_sen_singleton_null():
    from sits_classification_ray.stages.stm import theil_sen
    out = theil_sen(_long_ds(["a"], [5])).to_pandas()
    assert out["theil_sen_slope"].isna().all()


def test_spearman_monotonic_nonlinear_is_one():
    from sits_classification_ray.stages.stm import spearman
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["u"] * 4),
        "url_bucket": pa.array([1] * 4, pa.uint32()),
        "warc_ts": pa.array([H, 2 * H, 3 * H, 4 * H], pa.timestamp("us")),
        "text_len": pa.array([1, 2, 3, 4], pa.int64()),
        "word_count": pa.array([1, 8, 27, 64], pa.int64()),
    }))
    out = spearman(ds).to_pandas()
    assert out["spearman"].tolist() == [1.0]


def test_spearman_tied_ranks():
    from sits_classification_ray.stages.stm import spearman
    # text_len has a tie -> average ranks [1.5, 1.5, 3]
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["u"] * 3),
        "url_bucket": pa.array([1] * 3, pa.uint32()),
        "warc_ts": pa.array([H, 2 * H, 3 * H], pa.timestamp("us")),
        "text_len": pa.array([5, 5, 9], pa.int64()),
        "word_count": pa.array([1, 2, 3], pa.int64()),
    }))
    out = spearman(ds).to_pandas()
    ra = np.array([1.5, 1.5, 3.0]); rb = np.array([1.0, 2.0, 3.0])
    da, db = ra - ra.mean(), rb - rb.mean()
    exp = sql_round(np.array(
        [(da * db).sum() / np.sqrt((da * da).sum() * (db * db).sum())]))[0]
    assert out["spearman"].tolist() == [exp]


def test_length_histogram():
    from sits_classification_ray.stages.textstats import length_histogram
    docs = rd.from_arrow(pa.table({
        "n_chars": pa.array([10, 49, 50, 120], pa.int64())}))
    out = length_histogram(docs, bin_width=50).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    assert out["bin"].tolist() == [0, 1, 2]
    assert out["lo"].tolist() == [0, 50, 100]
    assert out["n_docs"].tolist() == [2, 1, 1]


def test_ddsketch_relative_error_bound():
    from sits_classification_ray.functions.sketches import ddsketch_quantile
    rng = np.random.default_rng(5)
    vals = rng.integers(1, 100_000, size=4000).astype(np.float64)
    ds = rd.from_arrow(pa.table({
        "bucket_ts": pa.array([1] * 4000, pa.int64()),
        "v": pa.array(vals)})).repartition(7)
    out = ddsketch_quantile(ds, value_col="v", bucket_col="bucket_ts",
                            alpha=0.01).to_pandas()
    assert out["n"].tolist() == [4000]
    for name, q in (("q50", 0.5), ("q90", 0.9), ("q99", 0.99)):
        true = np.sort(vals)[int(np.ceil(q * 4000)) - 1]
        assert abs(out[name][0] - true) / true <= 0.0201, (name, true)


def test_ddsketch_merge_order_independent():
    from sits_classification_ray.functions.sketches import ddsketch_quantile
    vals = [3.0, 17.0, 4.0, 1000.0, 250.0, 9.0, 77.0, 12.0]
    t = pa.table({"bucket_ts": pa.array([1] * 8, pa.int64()),
                  "v": pa.array(vals)})
    a = ddsketch_quantile(rd.from_arrow(t), "v", "bucket_ts").to_pandas()
    b = ddsketch_quantile(rd.from_arrow(t).repartition(8).random_shuffle(
        seed=3), "v", "bucket_ts").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_wow_change():
    from sits_classification_ray.pipelines.queries import build_queries
    # direct kernel check on a tiny weekly-shaped frame via the stage
    from sits_classification_ray.stages.shuffle import partitioned_map
    W = 7 * 24 * H
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["a"] * 3),
        "url_bucket": pa.array([1] * 3, pa.uint32()),
        "metric": pa.array(["m"] * 3),
        "bucket_ts": pa.array([W, 2 * W, 3 * W], pa.timestamp("us")),
        "sum": pa.array([100.0, 150.0, 75.0]),
    }))

    def kernel(df):
        df = df.sort_values(["url", "metric", "bucket_ts"]).copy()
        prev = df.groupby(["url", "metric"], sort=False)["sum"].shift(1)
        df["wow_pct"] = (df["sum"] - prev) / prev
        return df

    out = partitioned_map(ds, kernel, url_col="url").to_pandas() \
        .sort_values("bucket_ts").reset_index(drop=True)
    assert np.isnan(out["wow_pct"][0])
    assert out["wow_pct"].tolist()[1:] == [0.5, -0.5]


def test_rolling_mean_time_window():
    from sits_classification_ray.stages.windows import rolling_mean_time
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["u"] * 4),
        "url_bucket": pa.array([1] * 4, pa.uint32()),
        "metric": pa.array(["m"] * 4),
        "warc_ts": pa.array([0, 10 * H, 30 * H, 35 * H],
                            pa.timestamp("us")),
        "value": pa.array([10.0, 20.0, 40.0, 60.0]),
    }))
    out = rolling_mean_time(ds, window_seconds=86400).to_pandas() \
        .sort_values("warc_ts").reset_index(drop=True)
    # windows: [0] ; [0,10h] ; [10h,30h] (0 falls out, 10h is 20h old)
    # ; [30h,35h] (10h is 25h old → out)
    assert out["rolling_mean_24h"].tolist() == [10.0, 15.0, 30.0, 50.0]


def test_merge_upsert_latest_wins():
    from sits_classification_ray.stages.windows import merge_upsert
    cur = rd.from_arrow(pa.table({
        "url": pa.array(["a", "a", "b"]),
        "warc_ts": pa.array([0, H, 0], pa.timestamp("us")),
        "text_len": pa.array([1, 2, 3], pa.int64()),
    }))
    upd = rd.from_arrow(pa.table({
        "url": pa.array(["a", "c"]),
        "warc_ts": pa.array([H, 0], pa.timestamp("us")),  # tie on a@H
        "text_len": pa.array([99, 7], pa.int64()),
    }))
    out = merge_upsert(cur, upd, key_cols=["url"],
                       version_col="warc_ts").to_pandas() \
        .sort_values("url").reset_index(drop=True)
    # a: tie at H → update side wins (99); b: untouched; c: inserted
    assert out["text_len"].tolist() == [99, 3, 7]


D = 86_400_000_000  # 1 day in µs


def test_acf_matches_statsmodels_formula():
    # independent recomputation of r_k and Ljung-Box over one daily
    # series with one observation per day (daily mean == value)
    rng = np.random.default_rng(9)
    v = rng.normal(50.0, 4.0, 20)
    from sits_classification_ray.stages.stm import acf_ljungbox
    ds = _long_ds(["u"] * 20, v, ts=[(i + 1) * D for i in range(20)])
    out = acf_ljungbox(ds, max_lag=7).to_pandas()
    assert len(out) == 1
    d = v - v.mean()
    ss0 = d @ d
    q = 0.0
    for k in range(1, 8):
        rk = (d[k:] @ d[:-k]) / ss0
        assert out[f"r{k}"].iloc[0] == pytest.approx(rk, abs=1e-6)
        q += rk * rk / (20 - k)
    assert out["ljung_box"].iloc[0] == pytest.approx(
        20 * 22 * q, abs=1e-5)
    assert out["n_days"].iloc[0] == 20


def test_acf_short_series_dropped_constant_null():
    from sits_classification_ray.stages.stm import acf_ljungbox
    short = _long_ds(["a"] * 7, range(7),
                     ts=[(i + 1) * D for i in range(7)])
    assert acf_ljungbox(short, max_lag=7).count() == 0
    const = _long_ds(["b"] * 10, [5.0] * 10,
                     ts=[(i + 1) * D for i in range(10)])
    out = const and acf_ljungbox(const, max_lag=7).to_pandas()
    assert len(out) == 1 and np.isnan(out["r1"].iloc[0])
    assert np.isnan(out["ljung_box"].iloc[0])


def test_mann_kendall_known_series():
    # strictly increasing: S = n(n-1)/2, no ties
    from sits_classification_ray.stages.stm import mann_kendall
    n = 12
    ds = _long_ds(["u"] * n, range(n), ts=[(i + 1) * D for i in range(n)])
    out = mann_kendall(ds).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["s_stat"] == n * (n - 1) // 2 == 66
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    assert r["var_s"] == pytest.approx(var_s)
    assert r["z"] == pytest.approx((66 - 1) / np.sqrt(var_s), abs=1e-6)
    assert r["trend"] == "increasing"


def test_mann_kendall_ties_and_constant():
    from sits_classification_ray.stages.stm import mann_kendall
    # constant series: VarS = 0 -> null z, no_trend
    ds = _long_ds(["c"] * 5, [3.0] * 5, ts=[(i + 1) * D for i in range(5)])
    r = mann_kendall(ds).to_pandas().iloc[0]
    assert np.isnan(r["z"]) and r["trend"] == "no_trend"
    assert r["s_stat"] == 0 and r["var_s"] == 0.0
    # tie correction: [1,1,2] -> S=2, ties t=[2,1]: term 2*1*9=18
    ds2 = _long_ds(["t"] * 3, [1.0, 1.0, 2.0],
                   ts=[(i + 1) * D for i in range(3)])
    r2 = mann_kendall(ds2).to_pandas().iloc[0]
    assert r2["s_stat"] == 2
    assert r2["var_s"] == pytest.approx((3 * 2 * 11 - 18) / 18.0)


def test_mann_kendall_blockwise_pair_sum_matches_naive():
    # series longer than the 256 block: blockwise S == O(n^2) naive S
    from sits_classification_ray.stages.stm import mann_kendall
    rng = np.random.default_rng(4)
    v = rng.integers(0, 5, 600).astype(float)
    ds = _long_ds(["u"] * 600, v, ts=[(i + 1) * D for i in range(600)])
    out = mann_kendall(ds).to_pandas().iloc[0]
    naive = sum(np.sign(v[j] - v[i])
                for i in range(600) for j in range(i + 1, 600))
    assert out["s_stat"] == naive


def test_holt_winters_matches_scalar_twin():
    from sits_classification_ray.oracle.golden import holt_winters_crawl
    from sits_classification_ray.stages.windows import holt_winters
    rng = np.random.default_rng(12)
    rows = []
    for u in ("a", "b"):
        n = 21 if u == "a" else 16
        base = rng.normal(100, 5, n) + 10 * np.sin(
            np.arange(n) * 2 * np.pi / 7)
        for i, x in enumerate(base):
            rows.append((u, (i + 1) * D, float(x)))
    df = pd.DataFrame(rows, columns=["url", "ts", "value"])
    ds = _long_ds(df["url"].tolist(), df["value"].tolist(),
                  ts=df["ts"].tolist())
    eng = (holt_winters(ds).to_pandas()
           .sort_values(["url", "h"]).reset_index(drop=True))
    ora = obs = pd.DataFrame({
        "url": df["url"], "metric": "m",
        "warc_ts": df["ts"].to_numpy().astype("datetime64[us]"),
        "value": df["value"]})
    gold = (holt_winters_crawl(ora).sort_values(["url", "h"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        eng[["url", "n_days", "h", "forecast"]],
        gold[["url", "n_days", "h", "forecast"]])


def test_holt_winters_short_series_dropped():
    from sits_classification_ray.stages.windows import holt_winters
    ds = _long_ds(["s"] * 13, range(13),
                  ts=[(i + 1) * D for i in range(13)])
    assert holt_winters(ds).count() == 0


def test_matrix_profile_discord_finds_injected_anomaly():
    from sits_classification_ray.stages.stm import matrix_profile_discord
    # repeating weekly pattern with one corrupted week in the middle
    n = 70
    v = np.tile(np.array([1., 2., 3., 4., 3., 2., 1.]), 10)
    v[35:42] = [9., -5., 9., -5., 9., -5., 9.]
    ds = _long_ds(["u"] * n, v, ts=[(i + 1) * D for i in range(n)])
    out = matrix_profile_discord(ds, window=14).to_pandas()
    assert len(out) == 1
    day = out["discord_day"].iloc[0]
    # discord window must overlap the corrupted span (days 36..42)
    start = (day - np.datetime64(0, "us")) / np.timedelta64(1, "D")
    assert 22 <= start <= 42
    assert out["discord_dist"].iloc[0] > 1.0


def test_ts_kmeans_matches_golden_twin():
    from sits_classification_ray.stages.stm import ts_kmeans
    df = _rand_long(n_series=25, seed=11)
    eng = (ts_kmeans(rd.from_pandas(df), k=3, iterations=3,
                     num_partitions=8).to_pandas()
           .sort_values(["url", "metric"]).reset_index(drop=True))
    gold = (golden.ts_kmeans_crawl(
        df[["url", "metric", "warc_ts", "value"]], k=3, iterations=3,
        num_partitions=8)
        .sort_values(["url", "metric"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(eng[["url", "metric", "cluster"]],
                                  gold[["url", "metric", "cluster"]])
    assert eng["cluster"].nunique() > 1


def test_ts_kmeans_separates_shapes():
    from sits_classification_ray.stages.stm import ts_kmeans
    # two archetypes: rising ramps vs alternating noise
    rows = []
    for s in range(8):
        base = np.arange(30, dtype=float) * (1 + 0.1 * s) \
            if s % 2 == 0 else \
            np.where(np.arange(30) % 2 == 0, 10.0 + s, -10.0 - s)
        for i, v in enumerate(base):
            rows.append((f"u{s}", (i + 1) * D, float(v)))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "value"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    df["metric"] = "m"
    df["url_bucket"] = np.uint32(1)
    out = ts_kmeans(rd.from_pandas(df), k=2, iterations=4,
                    num_partitions=4).to_pandas()
    lbl = out.set_index("url")["cluster"]
    ramps = {lbl[f"u{s}"] for s in range(0, 8, 2)}
    alts = {lbl[f"u{s}"] for s in range(1, 8, 2)}
    assert len(ramps) == 1 and len(alts) == 1 and ramps != alts


def test_sdt_reconstruction_within_comp_dev():
    from sits_classification_ray.stages.downsample import sdt_indices
    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(3, 120))
        t = np.sort(rng.choice(np.arange(1, 5000), n, replace=False)
                    ).astype(np.int64)
        v = np.cumsum(rng.normal(0, 3, n))
        dev = 4.0
        idx = sdt_indices(t, v, dev)
        assert idx[0] == 0 and idx[-1] == n - 1
        recon = np.interp(t.astype(float), t[idx].astype(float), v[idx])
        # SDT factor-2 bound: every dropped point within 2*comp_dev
        # of the chord between its surrounding archived points
        assert np.max(np.abs(recon - v)) <= 2 * dev + 1e-9


def test_sdt_compresses_linear_series_to_endpoints():
    from sits_classification_ray.stages.downsample import sdt_indices
    t = np.arange(50, dtype=np.int64) * 100
    v = 2.5 * np.arange(50, dtype=np.float64)
    idx = sdt_indices(t, v, 0.5)
    assert list(idx) == [0, 49]


def test_dtw_distance_matches_full_matrix():
    from sits_classification_ray.oracle.golden import _dtw_full_matrix
    from sits_classification_ray.stages.stm import dtw_distance
    rng = np.random.default_rng(9)
    for _ in range(25):
        x = rng.normal(size=int(rng.integers(2, 60)))
        tpl = rng.normal(size=16)
        assert dtw_distance(x, tpl) == _dtw_full_matrix(x, tpl)
    # identical sequences: zero distance
    t = np.arange(16, dtype=np.float64)
    assert dtw_distance(t, t) == 0.0


def test_dtw_classify_labels_obvious_shapes():
    from sits_classification_ray.stages.stm import dtw_classify
    rows = []
    shapes = {"r_up": np.linspace(0, 100, 40),
              "r_down": np.linspace(100, 0, 40),
              "pk": np.concatenate([np.linspace(0, 50, 20),
                                    np.linspace(50, 0, 20)])}
    for u, v in shapes.items():
        for i, val in enumerate(v):
            rows.append((u, (i + 1) * D, float(val)))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "value"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    df["metric"] = "m"
    df["url_bucket"] = np.uint32(1)
    out = (dtw_classify(rd.from_pandas(df)).to_pandas()
           .set_index("url")["best_template"])
    assert out["r_up"] == "ramp_up"
    assert out["r_down"] == "ramp_down"
    assert out["pk"] == "peak"


def test_shesd_finds_masked_anomaly_cluster():
    from sits_classification_ray.stages.stm import shesd_anomalies
    # 60 flat days with a weekly pattern + 3 big spikes close together
    # (masking scenario: one-shot z-scores deflate when outliers
    # inflate the std; sequential ESD should flag all three)
    n = 60
    v = 100.0 + np.tile([0., 1., 2., 1., 0., -1., -2.], 9)[:n]
    v[20] += 60.0
    v[21] += 55.0
    v[40] += 70.0
    ds = _long_ds(["u"] * n, v, ts=[(i + 1) * D for i in range(n)])
    out = shesd_anomalies(ds).to_pandas()
    days = ((out["day"] - np.datetime64(0, "us"))
            / np.timedelta64(1, "D")).astype(int).tolist()
    assert {21, 22, 41} <= set(days)
    assert (out["anom_rank"] >= 1).all()


def test_shesd_clean_series_no_anomalies():
    from sits_classification_ray.stages.stm import shesd_anomalies
    n = 40
    v = 10.0 + np.tile([0., 0.5, 1.0, 0.5, 0., -0.5, -1.0], 6)[:n]
    ds = _long_ds(["u"] * n, v, ts=[(i + 1) * D for i in range(n)])
    assert shesd_anomalies(ds).count() == 0


def test_periodogram_detects_weekly_cadence():
    from sits_classification_ray.stages.stm import periodogram_peak
    n = 56  # 8 exact weeks
    v = 50.0 + 10.0 * np.sin(2 * np.pi * np.arange(n) / 7.0)
    ds = _long_ds(["u"] * n, v, ts=[(i + 1) * D for i in range(n)])
    out = periodogram_peak(ds).to_pandas()
    assert len(out) == 1
    assert out["dom_period_days"].iloc[0] == 7.0
    assert out["power_frac"].iloc[0] > 0.95


def test_periodogram_constant_series_dropped():
    from sits_classification_ray.stages.stm import periodogram_peak
    ds = _long_ds(["u"] * 20, [5.0] * 20,
                  ts=[(i + 1) * D for i in range(20)])
    assert periodogram_peak(ds).count() == 0


def test_kleinberg_detects_injected_burst():
    from sits_classification_ray.stages.stm import kleinberg_bursts
    # hourly cadence, with a 12-snapshot burst at minute cadence
    ts = [i * 3_600_000_000 for i in range(30)]
    burst_t0 = ts[-1] + 3_600_000_000
    ts += [burst_t0 + i * 60_000_000 for i in range(12)]
    ts += [ts[-1] + (i + 1) * 3_600_000_000 for i in range(20)]
    df = pd.DataFrame({"url": "u",
                       "warc_ts": pd.to_datetime(ts, unit="us")})
    df["url_bucket"] = np.uint32(1)
    out = kleinberg_bursts(rd.from_pandas(df)).to_pandas()
    assert len(out) >= 1
    b = out.iloc[0]
    lo = pd.Timestamp(burst_t0, unit="us")
    hi = pd.Timestamp(burst_t0 + 11 * 60_000_000, unit="us")
    assert b["burst_start"] >= lo - pd.Timedelta(hours=2)
    assert b["burst_end"] <= hi + pd.Timedelta(hours=2)
    assert b["n_gaps"] >= 8


def test_kleinberg_steady_stream_no_bursts():
    from sits_classification_ray.stages.stm import kleinberg_bursts
    ts = [i * 3_600_000_000 for i in range(50)]
    df = pd.DataFrame({"url": "u",
                       "warc_ts": pd.to_datetime(ts, unit="us")})
    df["url_bucket"] = np.uint32(1)
    assert kleinberg_bursts(rd.from_pandas(df)).count() == 0


def test_segment_trends_splits_level_shift():
    from sits_classification_ray.stages.stm import segment_trends
    # 20 flat days at 10, then 20 rising days from 100
    v = np.concatenate([np.full(20, 10.0),
                        100.0 + 3.0 * np.arange(20)])
    ds = _long_ds(["u"] * 40, v, ts=[(i + 1) * D for i in range(40)])
    out = (segment_trends(ds).to_pandas()
           .sort_values("seg_id").reset_index(drop=True))
    assert len(out) >= 2
    assert abs(out.loc[0, "seg_mean"] - 10.0) < 1.0
    assert abs(out.loc[0, "seg_slope"]) < 0.2
    last = out.iloc[-1]
    assert last["seg_slope"] > 2.0
    # segments tile the series
    assert out["n_days"].sum() == 40


def test_xcorr_lag_recovers_known_shift():
    from sits_classification_ray.stages.stm import xcorr_lag
    rng = np.random.default_rng(3)
    base = np.cumsum(rng.normal(0, 1, 60))
    rows = []
    for i in range(60):
        rows.append(("u", "a_metric", (i + 1) * D, float(base[i])))
    for i in range(60):
        # b lags a by 3 days
        j = i - 3
        val = float(base[j]) if 0 <= j < 60 else 0.0
        rows.append(("u", "b_metric", (i + 1) * D, val))
    df = pd.DataFrame(rows, columns=["url", "metric", "warc_ts",
                                     "value"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    df["url_bucket"] = np.uint32(1)
    out = xcorr_lag(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1
    assert out["best_lag"].iloc[0] == 3
    assert out["best_corr"].iloc[0] > 0.99
