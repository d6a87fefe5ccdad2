import numpy as np
import pandas as pd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.oracle.reference import dedup_oracle, extract_oracle
from sits_classification_ray.stages.extract import extract
from sits_classification_ray.stages.series import assemble_series

CFG = EngineConfig()
KEY = ["url", "warc_ts", "text_len", "word_count", "lang", "url_bucket"]


def test_assemble_matches_oracle(crawl_ds, crawl_pdf):
    got = assemble_series(extract(crawl_ds, CFG), CFG).to_pandas()
    want = dedup_oracle(extract_oracle(crawl_pdf, CFG.n_buckets),
                        CFG.min_series_len)
    g = got[KEY].sort_values(KEY, kind="mergesort").reset_index(drop=True)
    w = want[KEY].sort_values(KEY, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_dedup_removes_duplicate_ts(crawl_ds):
    got = assemble_series(extract(crawl_ds, CFG), CFG).to_pandas()
    assert not got.duplicated(["url", "warc_ts"]).any()


def test_singleton_series_dropped(crawl_ds, crawl_pdf):
    got = assemble_series(extract(crawl_ds, CFG), CFG).to_pandas()
    sizes = got.groupby("url").size()
    assert (sizes >= CFG.min_series_len).all()
    # the generator plants a singleton url — ensure it existed upstream
    raw_sizes = extract_oracle(crawl_pdf, CFG.n_buckets).groupby("url").size()
    assert (raw_sizes == 1).any()


def test_lttb_keeps_extremes_and_endpoints():
    from sits_classification_ray.stages.downsample import lttb_indices

    n = 200
    x = np.arange(n, dtype=np.float64)
    y = np.zeros(n)
    y[57] = 100.0          # a spike LTTB must keep
    y[150] = -80.0
    idx = lttb_indices(x, y, 20)
    assert idx[0] == 0 and idx[-1] == n - 1
    assert len(idx) == 20
    assert 57 in idx and 150 in idx
    # short series pass through whole
    short = lttb_indices(x[:5], y[:5], 20)
    assert list(short) == [0, 1, 2, 3, 4]


def test_change_rate_known_series():
    import math

    import ray.data as rd

    from sits_classification_ray.stages.series import change_rate

    H = 3_600_000_000
    # u1: 4 snapshots hourly, text changes on 2 of 3 intervals
    # u2: 3 snapshots, never changes
    rows = [
        ("u1", 1 * H, "aaa"), ("u1", 2 * H, "bbb"),
        ("u1", 3 * H, "bbb"), ("u1", 4 * H, "ccc"),
        ("u2", 1 * H, "zzz"), ("u2", 5 * H, "zzz"), ("u2", 9 * H, "zzz"),
    ]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    df["url_bucket"] = np.uint32(1)
    out = (change_rate(rd.from_pandas(df)).to_pandas()
           .set_index("url"))
    r1 = out.loc["u1"]
    assert r1["n_intervals"] == 3 and r1["n_changes"] == 2
    assert r1["span_seconds"] == 3 * 3600.0
    lam = -math.log((3 - 2 + 0.5) / 3.5) / (3 * 3600.0 / 3.0) * 86400.0
    assert abs(r1["lambda_per_day"] - round(lam, 6)) < 1e-9
    assert abs(r1["recrawl_days"] - round(1.0 / lam, 6)) < 1e-9
    r2 = out.loc["u2"]
    assert r2["n_changes"] == 0 and r2["lambda_per_day"] == 0.0
    assert np.isnan(r2["recrawl_days"])


def test_crawl_budget_quotas_sum_to_budget_and_follow_lambda():
    import ray.data as rd

    from sits_classification_ray.stages.series import crawl_budget

    # synthetic change_rate output: domains with known lambda shares
    rates = pd.DataFrame({
        "url": [f"http://d{i % 4}.ex/p{i}" for i in range(20)],
        "lambda_per_day": [float(i % 4) + 0.25 for i in range(20)],
    })
    out = (crawl_budget(rd.from_pandas(rates), r"^[a-z]+://([^/]+)",
                        budget=1000).to_pandas()
           .sort_values("domain").reset_index(drop=True))
    assert out["quota"].sum() == 1000
    assert out["n_urls"].sum() == 20
    # quotas ordered like the lambda sums
    assert (out.sort_values("lam_micro")["quota"].is_monotonic_increasing)
    # proportionality within 1 unit (largest remainder property)
    share = out["lam_micro"] / out["lam_micro"].sum() * 1000
    assert (np.abs(out["quota"] - share) <= 1.0 + 1e-9).all()


def test_crawl_budget_all_zero_lambda():
    import ray.data as rd

    from sits_classification_ray.stages.series import crawl_budget

    rates = pd.DataFrame({"url": ["http://a.ex/1", "http://b.ex/2"],
                          "lambda_per_day": [0.0, 0.0]})
    out = crawl_budget(rd.from_pandas(rates), r"^[a-z]+://([^/]+)",
                       budget=100).to_pandas()
    assert (out["quota"] == 0).all()


def test_km_staleness_textbook_example():
    import ray.data as rd

    from sits_classification_ray.stages.series import km_staleness

    D = 86_400_000_000
    rows = []
    # u1: changes at day 2 and day 5 (durations 2, 3), then censored
    # 1 day after the last change
    texts1 = ["a", "a", "b", "b", "b", "c", "c"]
    for i, t in enumerate(texts1):
        rows.append(("u1", i * D, t))
    # u2: never changes over 4 days -> one censored duration of 3
    for i in range(4):
        rows.append(("u2", i * D, "z"))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    df["url_bucket"] = np.uint32(1)
    out = (km_staleness(rd.from_pandas(df)).to_pandas()
           .sort_values("t_days").reset_index(drop=True))
    # durations: events {2, 3}, censored {1, 3}; N=4
    # t=1: censored only -> no row; t=2: n_risk=3, d=1 -> S=2/3
    # t=3: n_risk=2, d=1, c=1 -> S=2/3 * 1/2 = 1/3
    assert len(out) == 2
    assert out.loc[0, "t_days"] == 2 and out.loc[0, "n_risk"] == 3
    assert abs(out.loc[0, "survival"] - round(2 / 3, 6)) < 1e-9
    assert out.loc[1, "t_days"] == 3 and out.loc[1, "n_risk"] == 2
    assert abs(out.loc[1, "survival"] - round(1 / 3, 6)) < 1e-9
    assert out.loc[1, "c_censored"] == 1
