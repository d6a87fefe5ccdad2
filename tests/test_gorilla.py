import numpy as np
import pytest

from sits_classification_ray.functions.gorilla import (
    decode_series,
    decode_timestamps,
    decode_values,
    encode_series,
    encode_timestamps,
    encode_values,
)


def roundtrip_ts(ts):
    ts = np.asarray(ts, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(ts), len(ts))
    np.testing.assert_array_equal(out, ts)


def roundtrip_vals(vals):
    vals = np.asarray(vals, dtype=np.float64)
    out = decode_values(encode_values(vals), len(vals))
    # bit-exact, including NaN payloads
    np.testing.assert_array_equal(out.view(np.uint64), vals.view(np.uint64))


def test_timestamps_regular():
    roundtrip_ts(np.arange(0, 1000) * 3_600_000_000 + 17)


def test_timestamps_irregular():
    rng = np.random.default_rng(0)
    ts = np.cumsum(rng.integers(1, 10**9, size=500)) + 1_700_000_000_000_000
    roundtrip_ts(ts)


def test_timestamps_edge_cases():
    roundtrip_ts([])
    roundtrip_ts([42])
    roundtrip_ts([5, 5 + 60_000_000])
    # dods exercising every class boundary
    base = [0, 100]
    deltas = [100, 100 + 64, 100 + 64 - 63, 1000, 1000 + 256, 10, 5000, 1,
              10**12, 1]
    ts = np.cumsum([0] + deltas)
    roundtrip_ts(ts)


def test_values_constant():
    roundtrip_vals(np.full(100, 3.1415))


def test_values_random():
    rng = np.random.default_rng(1)
    roundtrip_vals(rng.normal(size=1000) * 1e6)


def test_values_integers_and_nan():
    v = np.array([1.0, 1.0, 2.0, np.nan, np.nan, -5.0, 0.0, 1e300, -1e-300])
    roundtrip_vals(v)


def test_values_empty_and_single():
    roundtrip_vals([])
    roundtrip_vals([7.5])


def test_series_roundtrip_and_compression():
    rng = np.random.default_rng(2)
    n = 2000
    ts = np.cumsum(rng.integers(1, 4, size=n)) * 3_600_000_000
    vals = np.round(rng.normal(100, 5, size=n))   # int-valued metric stream
    tsc, vc = encode_series(ts, vals)
    dts, dvals = decode_series(tsc, vc, n)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvals, vals)
    # hourly-ish int series must compress well below raw 16 bytes/point
    assert len(tsc) + len(vc) < 0.5 * 16 * n


def test_incremental_append_bit_identical():
    from sits_classification_ray.functions.gorilla import (append_series,
                                                           encode_series,
                                                           encode_series_state)

    rng = np.random.default_rng(3)
    n = 1000
    ts = np.cumsum(rng.integers(1, 10**7, size=n)) + 1_700_000_000_000_000
    vals = np.round(rng.normal(50, 3, size=n))
    full_t, full_v = encode_series(ts, vals)

    t1, v1, st = encode_series_state(ts[:600], vals[:600])
    t2, v2, st2 = append_series(t1, v1, st, ts[600:], vals[600:])
    assert t2 == full_t and v2 == full_v
    assert st2["n"] == n

    dts, dvals = decode_series(t2, v2, n)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvals, vals)

    # multiple small appends == one big encode
    t, v, s = encode_series_state(ts[:100], vals[:100])
    for i in range(100, n, 150):
        t, v, s = append_series(t, v, s, ts[i:i+150], vals[i:i+150])
    assert t == full_t and v == full_v


def test_append_rejects_late_data():
    from sits_classification_ray.functions.gorilla import (append_series,
                                                           encode_series_state)

    ts = np.array([100, 200, 300], dtype=np.int64)
    t, v, st = encode_series_state(ts, np.array([1.0, 2.0, 3.0]))
    with pytest.raises(ValueError):
        append_series(t, v, st, np.array([250], dtype=np.int64),
                      np.array([9.0]))


def test_append_from_empty():
    from sits_classification_ray.functions.gorilla import (append_series,
                                                           encode_series,
                                                           encode_series_state)

    t, v, st = encode_series_state(np.array([], dtype=np.int64), np.array([]))
    ts = np.array([10, 20], dtype=np.int64)
    vals = np.array([1.0, 2.0])
    t2, v2, st2 = append_series(t, v, st, ts, vals)
    ft, fv = encode_series(ts, vals)
    assert t2 == ft and v2 == fv
