"""HyperLogLog sketch: accuracy and merge associativity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from sits_classification_ray.functions.sketches import (_hash_u64,
                                                        hist_quantile,
                                                        hll_distinct,
                                                        hll_estimate,
                                                        hll_update)


def test_hll_accuracy_10k_keys():
    p, m = 12, 4096
    reg = np.zeros(m, dtype=np.uint8)
    keys = [f"https://u/{i}" for i in range(10_000)]
    hll_update(reg, _hash_u64(keys), p)
    est = hll_estimate(reg)
    # standard error for m=4096 is 1.04/sqrt(m) ≈ 1.6%; allow 5%
    assert abs(est - 10_000) / 10_000 < 0.05


def test_hll_merge_equals_whole():
    p, m = 12, 4096
    keys = [f"k{i}" for i in range(5_000)]
    whole = np.zeros(m, dtype=np.uint8)
    hll_update(whole, _hash_u64(keys), p)
    parts = np.zeros((4, m), dtype=np.uint8)
    for j in range(4):
        hll_update(parts[j], _hash_u64(keys[j::4]), p)
    merged = parts.max(axis=0)
    np.testing.assert_array_equal(whole, merged)   # mergeable sketch
    # duplicates are free: re-adding keys changes nothing (idempotent)
    hll_update(whole, _hash_u64(keys[:1000]), p)
    np.testing.assert_array_equal(whole, merged)


def test_hll_distinct_dataset():
    df = pd.DataFrame({
        "k": [f"u{i % 500}" for i in range(5_000)],
        "b": ["x" if i % 2 else "y" for i in range(5_000)],
    })
    out = (hll_distinct(rd.from_pandas(df), "k", "b")
           .to_pandas().sort_values("b").reset_index(drop=True))
    assert len(out) == 2
    for est in out["hll_estimate"]:
        assert abs(est - 250) / 250 < 0.08   # 250 distinct urls per bucket


def test_hist_quantile_dataset_vs_exact():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 4000, size=20_000)
    df = pd.DataFrame({"v": vals,
                       "b": ["x" if i % 2 else "y" for i in range(20_000)]})
    out = (hist_quantile(rd.from_pandas(df), "v", "b")
           .to_pandas().sort_values("b").reset_index(drop=True))
    assert list(out["n"]) == [10_000, 10_000]
    for _, r in out.iterrows():
        g = df[df["b"] == r["b"]]["v"].to_numpy()
        for col, q in (("q50", 0.5), ("q90", 0.9), ("q99", 0.99)):
            exact = np.quantile(g, q)
            assert abs(r[col] - exact) <= 8 + 1e-9   # one bin width


def test_hist_quantile_partition_invariant():
    rng = np.random.default_rng(6)
    df = pd.DataFrame({"v": rng.integers(0, 1000, size=5_000), "b": "k"})
    a = hist_quantile(rd.from_pandas(df), "v", "b").to_pandas()
    b = hist_quantile(rd.from_pandas(df).repartition(13),
                      "v", "b").to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_kmv_exact_below_k_and_estimate_above_k():
    from sits_classification_ray.functions.sketches import kmv_distinct
    df = pd.DataFrame({
        "k": [f"u{i % 100}" for i in range(2_000)]
        + [f"v{i % 2000}" for i in range(8_000)],
        "b": ["small"] * 2_000 + ["big"] * 8_000,
    })
    out = (kmv_distinct(rd.from_pandas(df), "k", "b", k=256)
           .to_pandas().set_index("b"))
    # below k: exact count, sample is the whole distinct set
    assert out.loc["small", "n_sample"] == 100
    assert out.loc["small", "kmv_estimate"] == 100.0
    # above k: (k-1)/u_k estimate within ~3/sqrt(k) of truth
    assert out.loc["big", "n_sample"] == 256
    assert abs(out.loc["big", "kmv_estimate"] - 2000) / 2000 < 0.2


def test_kmv_partition_invariant():
    from sits_classification_ray.functions.sketches import kmv_distinct
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": rng.integers(0, 3000, size=6_000).astype(str),
                       "b": "x"})
    a = kmv_distinct(rd.from_pandas(df), "k", "b").to_pandas()
    b = kmv_distinct(rd.from_pandas(df).repartition(11),
                     "k", "b").to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_ddsketch_zero_values_use_zero_bucket():
    """value == 0 must land in DDSketch's dedicated zero bucket (est
    0.0) instead of ceil(ln(0)/ln γ) = int64 garbage; positive values
    keep α-relative accuracy alongside."""
    from sits_classification_ray.functions.sketches import ddsketch_quantile

    df = pd.DataFrame({
        "b": ["z"] * 10 + ["p"] * 100,
        "v": [0.0] * 10 + list(np.linspace(1.0, 100.0, 100)),
    })
    out = (ddsketch_quantile(rd.from_pandas(df), "v", "b")
           .to_pandas().set_index("b"))
    assert out.loc["z", "q50"] == 0.0 and out.loc["z", "q99"] == 0.0
    # relative error ≤ α (plus rounding slack) on the positive bucket
    assert abs(out.loc["p", "q50"] - 50.0) / 50.0 < 0.025
    # mixed bucket: zero rows below the median pull q-ranks down but
    # never corrupt the log bins
    dfm = pd.DataFrame({"b": ["m"] * 4, "v": [0.0, 0.0, 0.0, 8.0]})
    om = ddsketch_quantile(rd.from_pandas(dfm), "v", "b").to_pandas()
    assert om["q50"].iloc[0] == 0.0
    assert abs(om["q99"].iloc[0] - 8.0) / 8.0 < 0.025


def test_freq_sketch_cms_overestimates_and_batching_invariance(ray_session):
    from sits_classification_ray.functions.sketches import (
        _freq_sketch_query, _freq_sketch_update, freq_sketch_estimates)

    # synthetic zipf-ish key stream: key i appears 1000//(i+1) times
    keys = [f"dom{i}" for i in range(50) for _ in range(1000 // (i + 1))]
    depth, width = 4, 1024
    whole = (np.zeros((depth, width), np.int64),
             np.zeros((depth, width), np.int64))
    u, cnt = np.unique(np.asarray(keys, dtype=object), return_counts=True)
    _freq_sketch_update(*whole, _hash_u64(u), cnt.astype(np.int64),
                        depth, width)
    # merge of per-slice tables equals the whole (integer sums commute)
    parts = (np.zeros((depth, width), np.int64),
             np.zeros((depth, width), np.int64))
    for j in range(7):
        sl = np.asarray(keys[j::7], dtype=object)
        us, cs = np.unique(sl, return_counts=True)
        _freq_sketch_update(*parts, _hash_u64(us), cs.astype(np.int64),
                            depth, width)
    np.testing.assert_array_equal(whole[0], parts[0])
    np.testing.assert_array_equal(whole[1], parts[1])
    # CMS never underestimates; exact count of dom0 is 1000
    cms_est, csk_est = _freq_sketch_query(*whole, _hash_u64(["dom0"]),
                                          depth, width)
    assert cms_est[0] >= 1000
    assert abs(int(csk_est[0]) - 1000) <= 200   # unbiased median

    # end-to-end over a Dataset: heavy keys exact, cms_est >= n
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    out = freq_sketch_estimates(ds, "k", k=10, depth=depth, width=width)
    assert len(out) > 0
    assert (out["cms_est"] >= out["n"]).all()
    exact = pd.Series(keys).value_counts()
    for _, r in out.iterrows():
        assert int(exact[r["key"]]) == int(r["n"])


def test_kmv_overlap_estimates(ray_session):
    from sits_classification_ray.functions.sketches import kmv_overlap

    # bucket A: keys 0..999; bucket B: 500..1499 → jaccard = 1/3
    rows = ([("a", f"k{i}") for i in range(1000)]
            + [("b", f"k{i}") for i in range(500, 1500)])
    df = pd.DataFrame(rows, columns=["bucket", "key"])
    ds = rd.from_pandas(df).repartition(6)
    out = kmv_overlap(ds, key_col="key", bucket_col="bucket", k=256)
    assert list(out.columns) == ["bucket_a", "bucket_b", "jaccard_est",
                                 "intersection_est", "union_est"]
    assert len(out) == 1
    r = out.iloc[0]
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12
    assert abs(r["union_est"] - 1500) / 1500 < 0.15
    assert abs(r["intersection_est"] - 500) / 500 < 0.35


def test_tdigest_accuracy_vs_exact():
    from sits_classification_ray.functions.sketches import (
        tdigest_compress, tdigest_quantile_est)
    rng = np.random.default_rng(12)
    v = np.sort(rng.lognormal(3.0, 1.2, 20_000))
    m, w = tdigest_compress(v, np.ones(len(v)), delta=100.0)
    assert len(m) < 220          # compression actually happened
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = tdigest_quantile_est(m, w, q)
        # rank error: where does the estimate land in the true CDF?
        rank = np.searchsorted(v, est) / len(v)
        assert abs(rank - q) < 0.02, (q, rank)


def test_tdigest_merge_order_independent_after_canonical_sort():
    from sits_classification_ray.functions.sketches import (
        tdigest_compress, tdigest_quantile_est)
    rng = np.random.default_rng(7)
    v = rng.normal(0, 1, 5000)
    # two different partial-batch splits
    def two_level(splits):
        ms, ws = [], []
        for part in splits:
            pm, pw = tdigest_compress(np.sort(part),
                                      np.ones(len(part)))
            ms.append(pm)
            ws.append(pw)
        m = np.concatenate(ms)
        w = np.concatenate(ws)
        order = np.lexsort((w, m))
        return tdigest_compress(m[order], w[order])

    m1, w1 = two_level([v[:1000], v[1000:]])
    m2, w2 = two_level([v[1000:], v[:1000]])
    assert np.array_equal(m1, m2) and np.array_equal(w1, w2)
    # merged digest still accurate
    sv = np.sort(v)
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(sv, tdigest_quantile_est(m1, w1, q)) \
            / len(sv)
        assert abs(rank - q) < 0.03
