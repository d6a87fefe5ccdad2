"""Tests for the distribution-shift hypothesis tests: Welch t,
Mann-Whitney U (tie-aware rank decomposition), two-sample KS, and the
chi-square independence cells — each against an independent inline
pandas/numpy computation on randomized long-format data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from sits_classification_ray.functions.transforms import sql_round
from sits_classification_ray.stages.stats_tests import (
    chi2_independence, ks_two_sample, mann_whitney, welch_ttest)

US_DAY = 86_400_000_000


def _long_df(seed=7, n_urls=9, metrics=("a", "b")):
    """Irregular long-format observations across January 2024."""
    rng = np.random.default_rng(seed)
    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for u in range(n_urls):
        for m in metrics:
            days = rng.choice(np.arange(30), size=rng.integers(6, 28),
                              replace=False)
            for d in days:
                for _ in range(rng.integers(1, 3)):
                    ts = base + int(d) * US_DAY + int(
                        rng.integers(0, US_DAY))
                    rows.append((f"u{u}", m, ts,
                                 float(rng.integers(0, 12))))
    df = pd.DataFrame(rows, columns=["url", "metric", "warc_ts",
                                     "value"])
    df["url_bucket"] = np.uint32(1)
    return df


def _halves(df):
    """Reference daily means + month-half tags (independent pandas)."""
    d = df.copy()
    d["day"] = d["warc_ts"].to_numpy().astype("datetime64[D]")
    g = (d.groupby(["url", "metric", "day"])["value"].mean()
         .reset_index(name="v"))
    g["v"] = sql_round(g["v"].to_numpy(np.float64), 6) + 0.0
    g["half"] = np.where(pd.DatetimeIndex(g["day"]).day <= 15, "a", "b")
    return g


def _ds(df):
    return rd.from_pandas(df)


def test_welch_matches_reference():
    df = _long_df()
    out = welch_ttest(_ds(df)).to_pandas().set_index("metric")
    g = _halves(df)
    for m, gm in g.groupby("metric"):
        a = gm.loc[gm["half"] == "a", "v"].to_numpy()
        b = gm.loc[gm["half"] == "b", "v"].to_numpy()
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se2)
        dof = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                          + (vb / len(b)) ** 2 / (len(b) - 1))
        row = out.loc[m]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert abs(row["t_stat"] - t) < 1e-5
        assert abs(row["df"] - dof) < 1e-4


def _ref_mwu(a, b):
    """Average-rank U and tie-corrected z, straight from ranks."""
    both = np.concatenate([a, b])
    order = pd.Series(both).rank(method="average").to_numpy()
    r_a = order[:len(a)].sum()
    na, nb, n = len(a), len(b), len(both)
    u_a = r_a - na * (na + 1) / 2.0
    _, cnt = np.unique(both, return_counts=True)
    tie = float((cnt.astype(np.float64) ** 3 - cnt).sum())
    var = (na * nb / 12.0) * ((n + 1.0) - tie / (n * (n - 1.0)))
    return u_a, (u_a - na * nb / 2.0) / np.sqrt(var)


def test_mann_whitney_matches_reference():
    df = _long_df(seed=11)
    out = mann_whitney(_ds(df)).to_pandas().set_index("metric")
    g = _halves(df)
    for m, gm in g.groupby("metric"):
        a = gm.loc[gm["half"] == "a", "v"].to_numpy()
        b = gm.loc[gm["half"] == "b", "v"].to_numpy()
        u_a, z = _ref_mwu(a, b)
        row = out.loc[m]
        assert abs(row["u_a"] - u_a) < 1e-6
        assert abs(row["z"] - z) < 1e-5


def test_mann_whitney_many_blocks():
    """The prefix scan must be correct across many sorted blocks."""
    df = _long_df(seed=13, n_urls=40)
    ds = _ds(df).repartition(16)
    out = mann_whitney(ds).to_pandas().set_index("metric")
    g = _halves(df)
    a = g.loc[(g["metric"] == "a") & (g["half"] == "a"), "v"].to_numpy()
    b = g.loc[(g["metric"] == "a") & (g["half"] == "b"), "v"].to_numpy()
    u_a, z = _ref_mwu(a, b)
    assert abs(out.loc["a", "u_a"] - u_a) < 1e-6
    assert abs(out.loc["a", "z"] - z) < 1e-5


def test_ks_matches_reference():
    df = _long_df(seed=17)
    out = ks_two_sample(_ds(df)).to_pandas().set_index("metric")
    g = _halves(df)
    for m, gm in g.groupby("metric"):
        a = np.sort(gm.loc[gm["half"] == "a", "v"].to_numpy())
        b = np.sort(gm.loc[gm["half"] == "b", "v"].to_numpy())
        vals = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, vals, side="right") / len(a)
        fb = np.searchsorted(b, vals, side="right") / len(b)
        d = np.abs(fa - fb).max()
        row = out.loc[m]
        assert abs(row["d_stat"] - d) < 1e-6
        assert abs(row["ks_stat"]
                   - np.sqrt(len(a) * len(b) / (len(a) + len(b))) * d) \
            < 1e-5


def test_ks_identical_distributions_zero():
    """Identical samples in both halves → D = 0."""
    base = np.datetime64("2024-01-01T12:00:00", "us")
    rows = []
    for u in range(4):
        for d in range(30):
            rows.append((f"u{u}", "m", base + d * US_DAY,
                         float(u)))  # constant per url, same both halves
    df = pd.DataFrame(rows, columns=["url", "metric", "warc_ts",
                                     "value"])
    df["url_bucket"] = np.uint32(1)
    out = ks_two_sample(_ds(df)).to_pandas()
    assert (out["d_stat"] == 0.0).all()


def test_chi2_cells():
    rng = np.random.default_rng(5)
    n = 400
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr"], size=n),
        "warc_ts": base + rng.integers(0, 28 * US_DAY, size=n),
    })
    out = (chi2_independence(_ds(df)).to_pandas()
           .sort_values(["lang", "week"]).reset_index(drop=True))
    d = df.copy()
    di = d["warc_ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    d["week"] = ((di - (di + 3) % 7).astype("datetime64[D]")
                 .astype("datetime64[us]"))
    c = d.groupby(["lang", "week"]).size().reset_index(name="o")
    tot = c["o"].sum()
    c["e"] = (c.groupby("lang")["o"].transform("sum")
              .to_numpy(np.float64)
              * c.groupby("week")["o"].transform("sum")
              .to_numpy(np.float64) / tot)
    c = c.sort_values(["lang", "week"]).reset_index(drop=True)
    exp = c["e"].to_numpy()
    assert (out["observed"].to_numpy() == c["o"].to_numpy()).all()
    assert np.allclose(out["expected"], exp, atol=1e-5)
    assert np.allclose(out["contrib"],
                       (c["o"] - exp) ** 2 / exp, atol=1e-5)
    # weeks start on Monday (ISO), matching date_trunc('week')
    assert (pd.DatetimeIndex(out["week"]).dayofweek == 0).all()


def _domain_df(seed=23, n_domains=12, shift_every=3):
    """Crawl-like long data with real urls; every ``shift_every``-th
    domain gets a deliberate mean shift in the second month-half."""
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T06:00:00", "us")
    rows = []
    for i in range(n_domains):
        dom = f"site{i:02d}.example"
        bump = 40.0 if i % shift_every == 0 else 0.0
        for p in range(3):
            url = f"https://{dom}/p{p}"
            for d in range(30):
                v = float(rng.integers(50, 60)) + (bump if d >= 15 else 0)
                rows.append((url, "text_len", base + d * US_DAY, v))
                rows.append((url, "other", base + d * US_DAY, 1.0))
    df = pd.DataFrame(rows, columns=["url", "metric", "warc_ts",
                                     "value"])
    df["url_bucket"] = np.uint32(1)
    return df


def _ref_bh(p, m=None):
    """Naive textbook BH: sort, raw = p*m/rank, reverse cummin, clamp."""
    p = np.asarray(p, dtype=np.float64)
    m = m or len(p)
    order = np.argsort(p, kind="stable")
    raw = p[order] * m / np.arange(1, len(p) + 1)
    adj = np.minimum(np.minimum.accumulate(raw[::-1])[::-1], 1.0)
    out = np.empty_like(adj)
    out[order] = adj
    return out


def test_domain_drift_bh_matches_reference():
    from sits_classification_ray.stages.stats_tests import (
        _erfc_as, domain_drift_bh)

    df = _domain_df()
    out = (domain_drift_bh(_ds(df).repartition(8)).to_pandas()
           .sort_values("domain").reset_index(drop=True))
    # independent per-domain welch z over the daily means
    d = df[df["metric"] == "text_len"].copy()
    d["day"] = d["warc_ts"].to_numpy().astype("datetime64[D]")
    g = (d.groupby(["url", "day"])["value"].mean().reset_index(name="v"))
    g["v"] = sql_round(g["v"].to_numpy(np.float64), 6) + 0.0
    g["domain"] = g["url"].str.extract(r"^[a-z]+://([^/]+)",
                                       expand=False)
    g["half"] = np.where(pd.DatetimeIndex(g["day"]).day <= 15, "a", "b")
    rows = []
    for dom, gd in g.groupby("domain"):
        a = gd.loc[gd["half"] == "a", "v"].to_numpy()
        b = gd.loc[gd["half"] == "b", "v"].to_numpy()
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        if se2 <= 0:
            continue
        z = sql_round([(a.mean() - b.mean()) / np.sqrt(se2)], 6)[0]
        p = sql_round([_erfc_as(np.abs(np.array([z]))
                                / np.sqrt(2.0))[0]], 6)[0]
        rows.append((dom, z, p))
    ref = pd.DataFrame(rows, columns=["domain", "z", "p"]) \
        .sort_values("domain").reset_index(drop=True)
    ref["p_bh"] = _ref_bh(ref["p"].to_numpy())
    assert list(out["domain"]) == list(ref["domain"])
    assert np.allclose(out["z"], ref["z"], atol=1e-9)
    assert np.allclose(out["p_value"], ref["p"], atol=1e-9)
    assert np.allclose(out["p_bh"], ref["p_bh"], atol=1e-6)
    # the shifted domains are the FDR discoveries, the rest are not
    shifted = out["domain"].str.extract(r"site(\d+)", expand=False) \
        .astype(int) % 3 == 0
    assert (out.loc[shifted, "p_bh"] < 0.01).all()
    assert (out.loc[~shifted, "p_bh"] > 0.05).all()


def test_bh_clamps_and_collapses_ties():
    """p_bh never exceeds 1; tied p-values share one adjusted value."""
    from sits_classification_ray.stages.stats_tests import domain_drift_bh

    rng = np.random.default_rng(3)
    base = np.datetime64("2024-01-01T06:00:00", "us")
    rows = []
    for i in range(6):
        url = f"https://flat{i}.example/"
        for d in range(30):
            rows.append((url, "text_len",
                         base + d * US_DAY,
                         float(rng.integers(0, 2))))
    df = pd.DataFrame(rows, columns=["url", "metric", "warc_ts",
                                     "value"])
    df["url_bucket"] = np.uint32(1)
    out = domain_drift_bh(_ds(df)).to_pandas()
    assert (out["p_bh"] <= 1.0).all()
    same_p = out.groupby("p_value")["p_bh"].nunique()
    assert (same_p == 1).all()


def test_chi2_uniform_has_small_contrib():
    """A perfectly balanced table has contrib == 0 everywhere."""
    base = np.datetime64("2024-01-01T00:00:00", "us")  # a Monday
    rows = []
    for w in range(4):
        for lang in ("en", "de"):
            for _ in range(10):
                rows.append((lang, base + w * 7 * US_DAY))
    df = pd.DataFrame(rows, columns=["lang", "warc_ts"])
    out = chi2_independence(_ds(df)).to_pandas()
    assert (out["contrib"] == 0.0).all()
    assert (out["expected"] == 10.0).all()
