"""User-behavior analytics over the events stream: cohort retention,
ordered funnels, and daily active users.

These are the event-log counterparts of the crawl-side tier rollups —
the queries a production telemetry/product pipeline runs over the same
engine. All three follow the engine's standard scale shape: ONE salted
exchange that co-locates each user's complete history
(:func:`~sits_classification_ray.stages.shuffle.partitioned_map` on the
user key), a vectorized pandas kernel per partition emitting *partial
counts*, then a tiny native ``Sum`` merge — the shuffle payload after
the kernel is O(cohorts × offsets) / O(stages), never O(events).

Reference analog: the per-entity aggregation semantics mirror the
reference's per-pixel time-series folding (``force/force_class_utils.py``
block loop); the funnel's ordered-first-occurrence semantics follow the
standard event-analytics definition (each stage's timestamp must be
strictly after the previous stage's first hit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Sum

from sits_classification_ray.stages.shuffle import partitioned_map


def cohort_retention(events: rd.Dataset, user_col: str = "user_id",
                     ts_col: str = "ts") -> rd.Dataset:
    """Classic retention matrix: users are cohorted by their first
    active day; for each (cohort_day, offset_days) count how many of
    that cohort were active offset_days later.

    Scale shape: the only wide exchange is the salted partition on
    ``user_col``; each partition kernel deduplicates to (user, day),
    finds each user's min day and emits per-(cohort, offset) partial
    counts. Because (user, day) pairs are unique after the dedup and a
    user lives in exactly one partition, summing partials IS the
    distinct-user count — no count-distinct shuffle.
    """
    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            user_col: df[user_col],
            "day": df[ts_col].dt.floor("D"),
        })

    proj_ds = events.map_batches(proj, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        act = df.drop_duplicates([user_col, "day"])
        first = act.groupby(user_col, sort=False)["day"].transform("min")
        off = (act["day"] - first).dt.days.astype(np.int64)
        out = (pd.DataFrame({"cohort_day": first, "offset_days": off})
               .groupby(["cohort_day", "offset_days"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = partitioned_map(proj_ds, kernel, keys=[user_col])
    return (partials.groupby(["cohort_day", "offset_days"])
            .aggregate(Sum("n", alias_name="n_users")))


def funnel(events: rd.Dataset, stages: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within: pd.Timedelta | None = None) -> rd.Dataset:
    """Ordered conversion funnel: a user reaches stage *k* iff an event
    of type ``stages[k]`` occurs STRICTLY AFTER their first qualifying
    stage *k−1* event (first-occurrence chaining, the standard funnel
    definition) — and, when ``within`` is given, no later than
    ``within`` after it (the conversion-window variant). Returns one
    row per stage with the user count that reached it.

    Per-partition kernel is vectorized per *stage*, not per user:
    filter to the stage's events, inner-merge the previous stage's
    first-hit timestamps, mask ``ts > prev`` (and the window), group-min
    — four pandas kernels per stage regardless of user count.
    """
    def proj(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df[type_col].isin(stages)]
        return pd.DataFrame({user_col: keep[user_col],
                             ts_col: keep[ts_col],
                             type_col: keep[type_col]})

    proj_ds = events.map_batches(proj, batch_format="pandas")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cur = (df[df[type_col] == stages[0]]
               .groupby(user_col, sort=False)[ts_col].min())
        counts = [len(cur)]
        for st in stages[1:]:
            # column-merge (not right_index): an empty previous stage
            # would otherwise leave the group key as a named index and
            # make the next groupby ambiguous
            prev = cur.rename("__prev").reset_index()
            nxt = df[df[type_col] == st].merge(prev, on=user_col)
            mask = nxt[ts_col] > nxt["__prev"]
            if within is not None:
                mask &= nxt[ts_col] <= nxt["__prev"] + within
            nxt = nxt[mask]
            cur = nxt.groupby(user_col, sort=False)[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame({
            "stage_idx": np.arange(1, len(stages) + 1, dtype=np.int64),
            "stage": list(stages),
            "n": np.asarray(counts, dtype=np.int64),
        })

    partials = partitioned_map(proj_ds, kernel, keys=[user_col])
    return (partials.groupby(["stage_idx", "stage"])
            .aggregate(Sum("n", alias_name="n_users")))


def daily_active(events: rd.Dataset, user_col: str = "user_id",
                 ts_col: str = "ts") -> rd.Dataset:
    """DAU + event volume per day. Exact distinct users under any
    batching via the two-level groupby (per-(day, user) count, then
    per-day count of those rows)."""
    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": df[ts_col].dt.floor("D"),
                             user_col: df[user_col]})

    proj_ds = events.map_batches(proj, batch_format="pandas")
    per_user = (proj_ds.groupby(["day", user_col])
                .aggregate(Count(alias_name="n")))
    return (per_user.groupby("day")
            .aggregate(Count(alias_name="dau"),
                       Sum("n", alias_name="n_events")))


def markov_transitions(events: rd.Dataset, user_col: str = "user_id",
                       ts_col: str = "ts", type_col: str = "event_type",
                       id_col: str = "event_id", round_to: int = 6
                       ) -> rd.Dataset:
    """First-order Markov transition matrix of event types along each
    user's journey: count consecutive (from → to) pairs per user
    (ordered by ``(ts, id)`` — the id breaks equal-timestamp ties
    deterministically), then row-normalize to transition probabilities.

    One salted exchange co-locates each user's history; the kernel
    zips consecutive events vectorized; the count merge is a native
    Sum over O(|types|²) rows; normalization happens in a final
    single-pass kernel over that tiny matrix.
    """
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({user_col: df[user_col], ts_col: df[ts_col],
                             id_col: df[id_col],
                             type_col: df[type_col]})

    proj_ds = events.map_batches(proj, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, id_col],
                            kind="mergesort")
        u = df[user_col].to_numpy()
        t = df[type_col].to_numpy()
        same = u[1:] == u[:-1]
        out = (pd.DataFrame({"from_type": t[:-1][same],
                             "to_type": t[1:][same]})
               .groupby(["from_type", "to_type"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    from sits_classification_ray.stages.shuffle import partitioned_map

    partials = partitioned_map(proj_ds, pairs, keys=[user_col])
    counts = (partials.groupby(["from_type", "to_type"])
              .aggregate(Sum("n", alias_name="n")))

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("from_type", sort=False)["n"].transform("sum")
        out = df.copy(deep=False)
        out["p"] = sql_round(df["n"].to_numpy(np.float64)
                             / tot.to_numpy(np.float64), round_to)
        return out

    return partitioned_map(counts, normalize, keys=["from_type"])


def journey_transition_counts(events: rd.Dataset,
                              conv_type: str = "purchase",
                              user_col: str = "user_id",
                              ts_col: str = "ts",
                              type_col: str = "event_type",
                              id_col: str = "event_id") -> rd.Dataset:
    """Absorbing-chain journey transitions: each user's history
    (ordered by (ts, id)) becomes START → channel… → CONV (a
    ``conv_type`` event, which also restarts the journey) or → NULL
    (history ends unconverted). Exact integer counts per (from, to):
    one salted user exchange, vectorized zip, native Sum merge."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return df[[user_col, ts_col, id_col, type_col]]

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col, id_col],
                            kind="mergesort")
        u = df[user_col].to_numpy()
        t = df[type_col].to_numpy().astype(object)
        n = len(t)
        if n == 0:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        conv = t == conv_type
        to = np.where(conv, "CONV", t)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        prev_conv = np.concatenate(([False], conv[:-1]))
        prev_t = np.concatenate(([""], t[:-1]))
        frm = np.where(first | prev_conv, "START", prev_t)
        last = np.append(u[1:] != u[:-1], True)
        term = last & ~conv
        out = (pd.DataFrame({
            "from_type": np.concatenate((frm, t[term])),
            "to_type": np.concatenate((to, np.full(int(term.sum()),
                                                   "NULL",
                                                   dtype=object)))})
            .groupby(["from_type", "to_type"], sort=False).size()
            .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = partitioned_map(
        events.map_batches(proj, batch_format="pandas"), pairs,
        keys=[user_col])
    return (partials.groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n")))


def removal_effect_from_counts(cnt: pd.DataFrame,
                               round_to: int = 6) -> pd.DataFrame:
    """Driver-side absorbing-chain solve over the O(|types|²) count
    matrix: base conversion probability from START, then per-channel
    removal (transitions into the removed channel fall to NULL) and
    the normalized removal-effect attribution shares."""
    from sits_classification_ray.functions.transforms import sql_round

    states = sorted(set(cnt["from_type"]) - {"CONV", "NULL"})
    channels = [s for s in states if s != "START"]

    def absorb(skip: str | None) -> float:
        idx = {s: i for i, s in enumerate(states)}
        Q = np.zeros((len(states), len(states)))
        r = np.zeros(len(states))
        for s in states:
            if s == skip:
                continue
            rows = cnt[cnt["from_type"] == s]
            tot = float(rows["n"].sum())
            if tot == 0.0:
                continue
            for to, n in zip(rows["to_type"], rows["n"]):
                p = float(n) / tot
                if to == "CONV":
                    r[idx[s]] += p
                elif to == "NULL" or to == skip:
                    pass                      # falls to NULL
                elif to in idx:
                    Q[idx[s], idx[to]] += p
        t = np.linalg.solve(np.eye(len(states)) - Q, r)
        return float(t[idx["START"]])

    base = absorb(None)
    re = np.array([1.0 - absorb(c) / base for c in channels])
    tot = re.sum()
    share = re / tot if tot > 0 else np.zeros_like(re)
    return pd.DataFrame({
        "channel": channels,
        "removal_effect": sql_round(re, round_to) + 0.0,
        "attribution": sql_round(share, round_to) + 0.0})


def removal_effect_attribution(events: rd.Dataset,
                               conv_type: str = "purchase",
                               round_to: int = 6) -> pd.DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016 shape):
    distributed journey transition counts, tiny driver solve."""
    cnt = journey_transition_counts(events, conv_type).to_pandas()
    cnt = cnt.sort_values(["from_type", "to_type"],
                          kind="mergesort", ignore_index=True)
    return removal_effect_from_counts(cnt, round_to)
