"""Behavior analytics (cohort retention, funnel, DAU), exact integer
quantiles, and the deterministic reservoir sample."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

US_DAY = 86_400_000_000


def _ev(rows):
    uid, ts_day, typ = zip(*rows)
    return rd.from_arrow(pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array([d * US_DAY for d in ts_day], pa.timestamp("us")),
        "event_type": pa.array(typ),
    }))


def test_cohort_retention_matrix():
    from sits_classification_ray.stages.behavior import cohort_retention
    # user 1 first day0, active day0+day2; user 2 first day0 only;
    # user 3 first day2, active day2+day3 (two events same day dedup)
    ev = _ev([(1, 0, "x"), (1, 2, "x"), (2, 0, "x"),
              (3, 2, "x"), (3, 2, "x"), (3, 3, "x")]).repartition(3)
    out = cohort_retention(ev).to_pandas().sort_values(
        ["cohort_day", "offset_days"]).reset_index(drop=True)
    assert out["offset_days"].tolist() == [0, 2, 0, 1]
    assert out["n_users"].tolist() == [2, 1, 1, 1]
    assert out["cohort_day"].dt.day.tolist() == [1, 1, 3, 3]


def test_funnel_strict_ordering():
    from sits_classification_ray.stages.behavior import funnel
    # user 1 converts fully in order; user 2 has view BEFORE signup
    # (does not count) then click after signup but no qualifying view;
    # user 3 signup only
    ev = _ev([
        (1, 0, "signup"), (1, 1, "view"), (1, 2, "click"),
        (2, 0, "view"), (2, 1, "signup"), (2, 2, "click"),
        (3, 0, "signup"),
        (9, 0, "click"),  # never signed up
    ]).repartition(4)
    out = funnel(ev, ["signup", "view", "click"]).to_pandas() \
        .sort_values("stage_idx").reset_index(drop=True)
    assert out["stage"].tolist() == ["signup", "view", "click"]
    assert out["n_users"].tolist() == [3, 1, 1]


def test_funnel_same_timestamp_not_counted():
    from sits_classification_ray.stages.behavior import funnel
    # strict > : a view at the exact signup timestamp doesn't convert
    ev = _ev([(1, 0, "signup"), (1, 0, "view")])
    out = funnel(ev, ["signup", "view"]).to_pandas() \
        .sort_values("stage_idx")
    assert out["n_users"].tolist() == [1, 0]


def test_daily_active_exact_distinct():
    from sits_classification_ray.stages.behavior import daily_active
    ev = _ev([(1, 0, "x"), (1, 0, "x"), (2, 0, "x"), (1, 1, "x")]) \
        .repartition(4)
    out = daily_active(ev).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    assert out["dau"].tolist() == [2, 1]
    assert out["n_events"].tolist() == [3, 1]


def test_exact_int_quantile_is_exact():
    from sits_classification_ray.functions.sketches import exact_int_quantile
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 500, size=3000)
    ds = rd.from_arrow(pa.table({
        "b": pa.array([1] * 3000, pa.int64()),
        "v": pa.array(vals, pa.int64())})).repartition(5)
    out = exact_int_quantile(ds, "v", "b").to_pandas()
    s = np.sort(vals)
    for name, q in (("q50", 0.5), ("q90", 0.9), ("q99", 0.99)):
        assert out[name][0] == s[int(np.ceil(q * 3000)) - 1]


def test_reservoir_sample_deterministic_and_uniformish():
    from sits_classification_ray.stages.sampling import reservoir_sample
    n = 2000
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(["a" if i % 2 else "b" for i in range(n)]),
    })
    a = reservoir_sample(rd.from_arrow(t), ["event_type"], "event_id",
                         k=25).to_pandas() \
        .sort_values(["event_type", "event_id"]).reset_index(drop=True)
    b = reservoir_sample(
        rd.from_arrow(t).repartition(13).random_shuffle(seed=1),
        ["event_type"], "event_id", k=25).to_pandas() \
        .sort_values(["event_type", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partition-order-free
    assert (a.groupby("event_type").size() == 25).all()
    assert "_h" not in a.columns


def test_reservoir_sample_small_group():
    from sits_classification_ray.stages.sampling import reservoir_sample
    t = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()),
                  "event_type": pa.array(["a", "a", "b"])})
    out = reservoir_sample(rd.from_arrow(t), ["event_type"], "event_id",
                           k=10).to_pandas()
    assert len(out) == 3


def test_markov_transitions_probabilities():
    from sits_classification_ray.stages.behavior import markov_transitions
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([0, US_DAY, 2 * US_DAY, 0, US_DAY],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "c"]),
    })).repartition(2)
    out = markov_transitions(ev).to_pandas() \
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    # user1: a->b, b->a ; user2: a->c — no cross-user pair
    assert out[["from_type", "to_type"]].values.tolist() == \
        [["a", "b"], ["a", "c"], ["b", "a"]]
    assert out["p"].tolist() == [0.5, 0.5, 1.0]


def test_funnel_window_excludes_late_conversion():
    from sits_classification_ray.stages.behavior import funnel
    import pandas as pd
    ev = _ev([(1, 0, "signup"), (1, 1, "view"),    # converts (1 day)
              (2, 0, "signup"), (2, 5, "view")])   # too late (5 days)
    out = funnel(ev, ["signup", "view"],
                 within=pd.Timedelta(days=2)).to_pandas() \
        .sort_values("stage_idx")
    assert out["n_users"].tolist() == [2, 1]


def test_attribution_window():
    from sits_classification_ray.stages.joins import asof_join
    purchases = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10 * US_DAY, 30 * US_DAY], pa.timestamp("us")),
    }))
    clicks = rd.from_arrow(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([8 * US_DAY], pa.timestamp("us")),
        "click_ts": pa.array([8 * US_DAY], pa.timestamp("us")),
    }))
    out = asof_join(purchases, clicks, by="user_id", left_ts="ts",
                    right_ts="ts", value_cols=["click_ts"],
                    tolerance=pd.Timedelta(days=7)).to_pandas() \
        .sort_values("ts").reset_index(drop=True)
    # purchase day10: click day8 within 7d → attributed;
    # purchase day30: click 22d earlier → outside window → NaT
    assert not pd.isna(out["click_ts"][0])
    assert pd.isna(out["click_ts"][1])
