"""Property-based invariants (hypothesis) for the codec, gap-fill and
partitioning kernels — the SURVEY §5 fuzz layer."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sits_classification_ray.functions.gorilla import (decode_series,
                                                       encode_series)
from sits_classification_ray.functions.sketches import (_hash_u64,
                                                        hll_update)
from sits_classification_ray.stages.gapfill import gapfill_series
from sits_classification_ray.stages.shuffle import salted_part

#: seconds within a ~2-week span (keeps the hourly grid small); the
#: codec test scales them up to stress delta-of-delta widths
_ts_lists = st.lists(
    st.integers(min_value=0, max_value=1_200_000), min_size=1, max_size=60,
    unique=True).map(sorted)

_floats = st.floats(allow_nan=True, allow_infinity=True, width=64)


@settings(max_examples=60, deadline=None)
@given(ts=_ts_lists, data=st.data())
def test_gorilla_roundtrip_any_floats(ts, data):
    vals = data.draw(st.lists(_floats, min_size=len(ts),
                              max_size=len(ts)))
    # scale some series up to exercise wide delta-of-delta codes
    scale = data.draw(st.sampled_from([1, 1_000_000, 2**20]))
    ts_arr = np.asarray(ts, dtype=np.int64) * scale
    v_arr = np.asarray(vals, dtype=np.float64)
    tsc, vc = encode_series(ts_arr, v_arr)
    dts, dv = decode_series(tsc, vc, len(ts_arr))
    np.testing.assert_array_equal(dts, ts_arr)
    # bit-exact: NaN payloads included
    np.testing.assert_array_equal(dv.view(np.uint64), v_arr.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(ts=_ts_lists, data=st.data(),
       method=st.sampled_from(["linear", "locf", "none"]))
def test_gapfill_series_invariants(ts, data, method):
    vals = data.draw(st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
        min_size=len(ts), max_size=len(ts)))
    ts_arr = np.asarray(ts, dtype=np.int64) * 1_000_000
    v_arr = np.asarray(vals, dtype=np.float64)
    grid, out, filled = gapfill_series(ts_arr, v_arr, 3600, method, "both")
    # grid alignment + bounds
    step = 3_600_000_000
    assert (grid % step == 0).all()
    assert ((grid >= ts_arr[0] - step) & (grid <= ts_arr[-1])).all()
    # exact observation hits are never marked filled and carry the
    # observed value exactly, for every method
    hit = np.isin(grid, ts_arr)
    assert not filled[hit].any() and filled[~hit].all()
    obs_at = {t: v for t, v in zip(ts_arr, v_arr)}
    for g, o in zip(grid[hit], out[hit]):
        assert o == obs_at[int(g)]
    if method == "linear":
        assert (out >= v_arr.min() - 1e-6).all()
        assert (out <= v_arr.max() + 1e-6).all()
    elif method == "locf":
        assert np.isin(out, v_arr).all()
    else:
        assert np.isnan(out[~hit]).all()


@settings(max_examples=30, deadline=None)
@given(keys=st.lists(st.text(min_size=0, max_size=20), min_size=1,
                     max_size=200),
       p=st.integers(min_value=2, max_value=512))
def test_salted_partition_total_and_stable(keys, p):
    df = pd.DataFrame({"url": keys})
    a = salted_part(df, ["url"], p)
    b = salted_part(df.iloc[::-1].reset_index(drop=True), ["url"], p)
    assert ((0 <= a) & (a < p)).all()
    # permutation-invariant per key: same key → same partition
    m = dict(zip(df["url"], a))
    for k, part in zip(df.iloc[::-1]["url"], b):
        assert m[k] == part


@settings(max_examples=30, deadline=None)
@given(keys=st.lists(st.text(min_size=1, max_size=12), min_size=1,
                     max_size=300))
def test_hll_insert_order_invariant(keys):
    import random
    reg1 = np.zeros(4096, dtype=np.uint8)
    hll_update(reg1, _hash_u64(keys), 12)
    shuffled = list(keys)
    random.Random(7).shuffle(shuffled)
    reg2 = np.zeros(4096, dtype=np.uint8)
    hll_update(reg2, _hash_u64(shuffled), 12)
    np.testing.assert_array_equal(reg1, reg2)
