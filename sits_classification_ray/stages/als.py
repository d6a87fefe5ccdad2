"""Distributed ALS matrix factorization (implicit-strength explicit
ALS) over a (user, item, rating) interaction table.

Reference parity: the reference trains per-pixel sequence models with
a ``Trainer.fit`` epoch loop (``pytorch/utils/trainer.py:145-199``);
this stage is the collaborative-filtering analog a training-data
pipeline needs — factorizing the user × item interaction matrix the
way Hu-Koren-Volinsky ALS / Spark MLlib's ``ALS`` do, but expressed as
Ray Data exchanges:

- **User step**: one ``partitioned_map`` keyed on ``user`` — each
  partition holds complete users; the item-factor matrix ``Y``
  (``n_items × d``) is the broadcast small side (``ray.put`` once per
  iteration, fetched zero-copy per task), the classic distributed-ALS
  assumption (item vocabulary ≪ interactions ≪ users).
- **Item step**: user factors are NEVER broadcast (they scale with
  users). Instead a tag-union exchange on ``user`` attaches each
  user's solved factor row to that user's rating rows, then a second
  ``partitioned_map`` keyed on ``item`` solves the item factors.
  Driver traffic per iteration is O(n_items · d) — the collected
  ``Y`` only.

Determinism contract (golden-file oracle, the k-means/PCA shape):
every kernel sorts its partition by ``(key, other)`` mergesort before
accumulating, normal equations are accumulated per group in that row
order via ``np.add.at`` (element-sequential), and the driver
re-assembles ``Y`` sorted by item id — bit-identical under any block
arrival order, partition count or cluster size. Initial item factors
are a pure function of (seed, item id, column) via splitmix64, so the
engine and the independent oracle twin start from the same matrix
without sharing RNG state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def init_factors(ids: np.ndarray, d: int, seed: int) -> np.ndarray:
    """Deterministic (n, d) init: uniform in [-0.5, 0.5) / sqrt(d),
    each cell a pure function of (seed, id, column)."""
    ids = np.asarray(ids, dtype=np.uint64)
    cols = np.arange(d, dtype=np.uint64)
    salt = np.uint64((seed * 0x5851F42D4C957F2D) % (1 << 64))
    key = ids[:, None] * np.uint64(d) + cols[None, :] + salt
    h = _splitmix64(key.ravel()).reshape(len(ids), d)
    u = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53  # [0, 1)
    return (u - 0.5) / np.sqrt(float(d))


def solve_side(keys: np.ndarray, frows: np.ndarray, r: np.ndarray,
               d: int, reg: float) -> tuple[np.ndarray, np.ndarray]:
    """Per-group ridge normal equations. ``keys`` MUST be sorted; rows
    within a group must already be in the contract order. Returns
    (sorted unique keys, solved (g, d) factors)."""
    uk, first = np.unique(keys, return_index=True)
    counts = np.diff(np.append(first, len(keys)))
    gidx = np.repeat(np.arange(len(uk)), counts)
    outer = frows[:, :, None] * frows[:, None, :]
    A = np.zeros((len(uk), d, d))
    np.add.at(A, gidx, outer)
    b = np.zeros((len(uk), d))
    np.add.at(b, gidx, frows * r[:, None])
    A += reg * np.eye(d)[None, :, :]
    return uk, np.linalg.solve(A, b[:, :, None])[:, :, 0]


def _factor_lookup(Y: pd.DataFrame, d: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted item ids, (n_items, d) matrix) from a factor frame."""
    Y = Y.sort_values("item", kind="mergesort")
    ids = Y["item"].to_numpy(np.int64)
    M = Y[[f"f{j}" for j in range(d)]].to_numpy(np.float64)
    return ids, M


def _user_solve_kernel(df: pd.DataFrame, y_ref, d: int, reg: float
                       ) -> pd.DataFrame:
    item_ids, Y = ray.get(y_ref)
    df = df.sort_values(["user", "item"], kind="mergesort")
    pos = np.searchsorted(item_ids, df["item"].to_numpy(np.int64))
    uk, X = solve_side(df["user"].to_numpy(np.int64), Y[pos],
                       df["r"].to_numpy(np.float64), d, reg)
    out = {"user": uk}
    out.update({f"f{j}": X[:, j] for j in range(d)})
    return pd.DataFrame(out)


def _als_schemas(d: int) -> tuple[pa.Schema, pa.Schema, pa.Schema]:
    fcols = [(f"f{j}", pa.float64()) for j in range(d)]
    user_schema = pa.schema([("user", pa.int64())] + fcols)
    attach_schema = pa.schema(
        [("item", pa.int64()), ("user", pa.int64()),
         ("r", pa.float64())] + fcols)
    item_schema = pa.schema([("item", pa.int64())] + fcols)
    return user_schema, attach_schema, item_schema


def als_fit(ratings: rd.Dataset, d: int = 8, n_iters: int = 3,
            reg: float = 0.1, seed: int = 7,
            num_partitions: int | None = None,
            max_items: int | None = None) -> pd.DataFrame:
    """Run ``n_iters`` alternations and return the final item-factor
    frame ``(item, f0..f{d-1})`` sorted by item. ``ratings`` needs
    columns ``user:int64, item:int64, r:float64`` with one row per
    (user, item).

    ``max_items`` BOUNDS everything that touches the driver: the item
    vocabulary is pruned to the top-N items by (rating count DESC,
    item ASC) via a distributed sort + limit BEFORE the collect (the
    ``bpe_merges`` ``max_vocab`` pattern, ``textstats.py``), and the
    rating rows of dropped items are filtered out up front, so both
    the per-iteration broadcast ``(item_ids, Y)`` and the collected
    item-factor frame are O(max_items · d) regardless of the true item
    cardinality. Web-scale catalogs (urls-as-items, ~10⁸ distinct)
    need this; tail items with the fewest interactions carry the least
    factor signal, the standard implicit-ALS prune."""
    from ray.data.aggregate import Count

    from sits_classification_ray.stages.shuffle import partitioned_map

    user_schema, attach_schema, item_schema = _als_schemas(d)
    ratings = ratings.materialize()          # reused every iteration
    counts = ratings.groupby("item").aggregate(Count(alias_name="_c"))
    if max_items is not None:
        # distributed top-N: only max_items rows ever reach the driver
        items = (counts.sort(["_c", "item"], descending=[True, False])
                 .limit(max_items).to_pandas())
        item_ids = np.sort(items["item"].to_numpy(np.int64))
        if len(item_ids) == max_items:       # a real prune happened
            keep_ref = ray.put(item_ids)

            def prune(b: pa.Table) -> pa.Table:
                keep = ray.get(keep_ref)
                mask = np.isin(b["item"].to_numpy(zero_copy_only=False),
                               keep)
                return b.filter(pa.array(mask))

            ratings = ratings.map_batches(
                prune, batch_format="pyarrow",
                zero_copy_batch=True).materialize()
    else:
        items = counts.to_pandas()           # bounded item vocabulary
        item_ids = np.sort(items["item"].to_numpy(np.int64))
    Y = init_factors(item_ids, d, seed)

    fcols = [f"f{j}" for j in range(d)]
    for _ in range(n_iters):
        y_ref = ray.put((item_ids, Y))
        xds = partitioned_map(
            ratings, lambda df, _r=y_ref: _user_solve_kernel(df, _r, d, reg),
            keys=["user"], num_partitions=num_partitions,
            out_schema=user_schema)

        # tag-union on user: rating rows carry item >= 0, factor rows
        # carry item = -1 (one shared schema, no null-padding)
        def tag_ratings(b: pd.DataFrame) -> pd.DataFrame:
            out = b[["user", "item", "r"]].copy()
            for c in fcols:
                out[c] = 0.0
            return out

        def tag_factors(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            out["item"] = np.int64(-1)
            out["r"] = 0.0
            return out[["user", "item", "r"] + fcols]

        unioned = ratings.map_batches(
            tag_ratings, batch_format="pandas").union(
            xds.map_batches(tag_factors, batch_format="pandas"))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            fac = df[df["item"] < 0].sort_values("user", kind="mergesort")
            rows = df[df["item"] >= 0]
            pos = np.searchsorted(fac["user"].to_numpy(np.int64),
                                  rows["user"].to_numpy(np.int64))
            out = {"item": rows["item"].to_numpy(np.int64),
                   "user": rows["user"].to_numpy(np.int64),
                   "r": rows["r"].to_numpy(np.float64)}
            for c in fcols:
                out[c] = fac[c].to_numpy(np.float64)[pos]
            return pd.DataFrame(out)

        attached = partitioned_map(unioned, attach, keys=["user"],
                                   num_partitions=num_partitions,
                                   out_schema=attach_schema)

        def item_solve(df: pd.DataFrame) -> pd.DataFrame:
            # contract order: (item, user) — value-determined, not
            # arrival-determined
            df = df.sort_values(["item", "user"], kind="mergesort")
            uk, F = solve_side(
                df["item"].to_numpy(np.int64),
                df[fcols].to_numpy(np.float64),
                df["r"].to_numpy(np.float64), d, reg)
            out = {"item": uk}
            out.update({f"f{j}": F[:, j] for j in range(d)})
            return pd.DataFrame(out)

        Yf = partitioned_map(attached, item_solve, keys=["item"],
                             num_partitions=num_partitions,
                             out_schema=item_schema).to_pandas()
        item_ids, Y = _factor_lookup(Yf, d)

    out = {"item": item_ids}
    out.update({f"f{j}": Y[:, j] for j in range(d)})
    return pd.DataFrame(out)


def als_recommend(ratings: rd.Dataset, item_factors: pd.DataFrame,
                  d: int = 8, reg: float = 0.1,
                  num_partitions: int | None = None,
                  round_to: int = 6) -> rd.Dataset:
    """Final user solve + top-1 unseen-item recommendation per user:
    one ``partitioned_map`` on user with the item factors broadcast.
    Ties break to the smallest item id (scores scanned in ascending
    item order). Returns ``(user_id, rec_item, score)``."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    ids, Y = _factor_lookup(item_factors, d)
    y_ref = ray.put((ids, Y))
    out_schema = pa.schema([("user_id", pa.int64()),
                            ("rec_item", pa.int64()),
                            ("score", pa.float64())])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        item_ids, Ym = ray.get(y_ref)
        df = df.sort_values(["user", "item"], kind="mergesort")
        users = df["user"].to_numpy(np.int64)
        pos = np.searchsorted(item_ids, df["item"].to_numpy(np.int64))
        uk, X = solve_side(users, Ym[pos],
                           df["r"].to_numpy(np.float64), d, reg)
        scores = X @ Ym.T                      # (n_users, n_items)
        first = np.searchsorted(users, uk)
        counts = np.diff(np.append(first, len(users)))
        urow = np.repeat(np.arange(len(uk)), counts)
        scores[urow, pos] = -np.inf            # mask seen items
        best = scores.argmax(axis=1)           # first max = min item id
        return pd.DataFrame({
            "user_id": uk,
            "rec_item": item_ids[best],
            "score": sql_round(scores[np.arange(len(uk)), best],
                               round_to) + 0.0})

    return partitioned_map(ratings, kernel, keys=["user"],
                           num_partitions=num_partitions,
                           out_schema=out_schema)


def ratings_from_events(ds: rd.Dataset,
                        kinds: tuple[str, ...] = ("click", "view",
                                                  "purchase")
                        ) -> rd.Dataset:
    """(user, item, r) from the events table: item is the integer
    ``k`` prop, strength r = ln(1 + Σvalue) per (user, item), with the
    value sum carried in exact int64 cents so the cross-partition
    reduction is order-free."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def proj(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(list(kinds)))
        t = batch.filter(keep)
        k = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        item = pc.cast(pc.struct_field(k, "k"), pa.int64())
        ok = pc.is_valid(item)          # drop rows with no "k" prop
        t, item = t.filter(ok), item.filter(ok)
        cents = pc.cast(pc.round(
            pc.multiply(pc.cast(t["value"], pa.float64()), 100.0)),
            pa.int64())
        return pa.table({"user": pc.cast(t["user_id"], pa.int64()),
                         "item": item, "cents": cents})

    agg = (ds.map_batches(proj, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["user", "item"])
           .aggregate(Sum("cents", alias_name="cents")))

    def strength(b: pa.Table) -> pa.Table:
        # numpy log1p (not pc.ln) so the oracle twin is bit-identical
        c = b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"user": b["user"], "item": b["item"],
                         "r": pa.array(np.log1p(c / 100.0))})

    return agg.map_batches(strength, batch_format="pyarrow",
                           zero_copy_batch=True)
