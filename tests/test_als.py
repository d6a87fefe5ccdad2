"""ALS matrix factorization: training objective decreases, the
distributed fit matches a flat single-array fit bit-for-bit, and
recommendations never repeat a seen item."""

import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.stages.als import (
    als_fit, als_recommend, init_factors, ratings_from_events,
    solve_side)

D, REG, SEED = 4, 0.1, 7


def _toy_ratings(n_users=40, n_items=12, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        for i in rng.choice(n_items, size=rng.integers(2, 8),
                            replace=False):
            rows.append((u, int(i),
                         float(np.log1p(rng.integers(1, 500) / 100.0))))
    return (pd.DataFrame(rows, columns=["user", "item", "r"])
            .sort_values(["user", "item"], kind="mergesort",
                         ignore_index=True))


def _flat_fit(rt: pd.DataFrame, n_iters: int) -> np.ndarray:
    users = rt["user"].to_numpy(np.int64)
    items = rt["item"].to_numpy(np.int64)
    r = rt["r"].to_numpy(np.float64)
    item_ids = np.unique(items)
    Y = init_factors(item_ids, D, SEED)
    pos = np.searchsorted(item_ids, items)
    order = np.lexsort((users, items))
    for _ in range(n_iters):
        uk, X = solve_side(users, Y[pos], r, D, REG)
        xrow = np.searchsorted(uk, users)
        _, Y = solve_side(items[order], X[xrow][order], r[order], D, REG)
    return Y


def _rmse(rt: pd.DataFrame, Y_df: pd.DataFrame) -> float:
    users = rt["user"].to_numpy(np.int64)
    items = rt["item"].to_numpy(np.int64)
    r = rt["r"].to_numpy(np.float64)
    item_ids = Y_df["item"].to_numpy(np.int64)
    Y = Y_df[[f"f{j}" for j in range(D)]].to_numpy(np.float64)
    pos = np.searchsorted(item_ids, items)
    uk, X = solve_side(users, Y[pos], r, D, REG)
    xrow = np.searchsorted(uk, users)
    pred = (X[xrow] * Y[pos]).sum(axis=1)
    return float(np.sqrt(((pred - r) ** 2).mean()))


def test_distributed_fit_matches_flat_fit_bitwise():
    rt = _toy_ratings()
    ds = rd.from_pandas(rt).repartition(7)
    got = als_fit(ds, d=D, n_iters=2, reg=REG, seed=SEED,
                  num_partitions=5)
    want = _flat_fit(rt, n_iters=2)
    np.testing.assert_array_equal(
        got[[f"f{j}" for j in range(D)]].to_numpy(np.float64), want)


def test_objective_improves_over_iterations():
    rt = _toy_ratings()
    ds = rd.from_pandas(rt).repartition(4)
    y1 = als_fit(ds, d=D, n_iters=1, reg=REG, seed=SEED)
    y3 = als_fit(ds, d=D, n_iters=3, reg=REG, seed=SEED)
    assert _rmse(rt, y3) < _rmse(rt, y1)


def test_recommendations_exclude_seen_items():
    rt = _toy_ratings()
    ds = rd.from_pandas(rt).repartition(4)
    Y = als_fit(ds, d=D, n_iters=2, reg=REG, seed=SEED)
    rec = als_recommend(ds, Y, d=D, reg=REG).to_pandas()
    assert len(rec) == rt["user"].nunique()
    seen = set(zip(rt["user"], rt["item"]))
    for u, i in zip(rec["user_id"], rec["rec_item"]):
        assert (u, i) not in seen


def test_ratings_from_events_exact_cents(tmp_path):
    ev = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "event_type": ["click", "view", "purchase", "error"],
        "value": [1.11, 2.22, 3.33, 9.99],
        "props": ['{"k": 5}', '{"k": 5}', '{"k": 6}', '{"k": 7}']})
    out = (ratings_from_events(rd.from_pandas(ev))
           .to_pandas().sort_values(["user", "item"],
                                    ignore_index=True))
    # error events dropped; exact cent sums
    assert out["user"].tolist() == [1, 2]
    assert out["item"].tolist() == [5, 6]
    np.testing.assert_allclose(
        out["r"].to_numpy(), np.log1p(np.array([3.33, 3.33])), rtol=0,
        atol=0)


def test_max_items_bounds_driver_table_and_prunes_tail():
    """The max_items catalog prune: (a) a loose bound is a no-op —
    factors bit-identical to the unbounded fit; (b) a tight bound
    collects exactly max_items item factors, keeping the items with
    the MOST ratings (count desc, item asc tie-break) and dropping
    their rating rows before any iteration."""
    rt = _toy_ratings()
    ds = rd.from_pandas(rt).repartition(5)

    loose = als_fit(ds, d=D, n_iters=2, reg=REG, seed=SEED,
                    max_items=1000)
    base = als_fit(ds, d=D, n_iters=2, reg=REG, seed=SEED)
    pd.testing.assert_frame_equal(loose, base)

    k = 5
    tight = als_fit(ds, d=D, n_iters=2, reg=REG, seed=SEED, max_items=k)
    assert len(tight) == k
    counts = rt.groupby("item").size().reset_index(name="n")
    counts = counts.sort_values(["n", "item"], ascending=[False, True],
                                kind="mergesort")
    want_items = sorted(counts["item"].head(k).tolist())
    assert tight["item"].tolist() == want_items

    # pruned fit == unbounded fit over the pre-filtered ratings
    sub = rt[rt["item"].isin(want_items)]
    want = als_fit(rd.from_pandas(sub).repartition(3), d=D, n_iters=2,
                   reg=REG, seed=SEED)
    pd.testing.assert_frame_equal(tight, want)
