"""Distribution-shift hypothesis tests over the crawl's daily series.

The reference validates its preprocessing by comparing per-pixel
statistic distributions across acquisition windows (the train/valid
metric stream of ``pytorch/utils/classmetric.py`` and the per-epoch
log); the engine-side analog is "did this metric's distribution shift
between the first and second half of the month?" — the standard
data-drift screen a crawl operator runs before trusting a rollup tier.

Samples: the daily means per ``(url, metric, day)`` (the same grain as
the other per-series statistics), split into sample **a** (day of
month ≤ 15) and sample **b** (rest) — a fixed, data-independent split,
so no driver-side scalar is needed to define the groups.

Scale shape (shared by the rank tests): one distributed Mean groupby
to the daily grain, one Sum groupby collapsing to *distinct value
counts* ``(metric, v, cnt_a, cnt_b)``, then a two-pass prefix scan
over the value-sorted blocks — per-block run-length summaries to the
driver (O(blocks × metrics) scalars, never rows), exclusive offsets
back to one Ray task per block, tiny per-metric partials combined at
the end. No stage ever holds a whole metric's sample in one worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from sits_classification_ray.functions.transforms import sql_round

__all__ = ["welch_ttest", "mann_whitney", "ks_two_sample",
           "chi2_independence", "domain_drift_bh"]


def _daily_halves(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Daily means tagged with the month-half sample id.

    ``v`` is rounded to ``round_to`` BEFORE any equality grouping:
    the rank tests group ties on value equality, and an unrounded
    distributed mean differs from the SQL twin's by summation-order
    ulps, which would split tie groups differently between the two
    engines. Rounding first makes the tie structure identical."""
    from sits_classification_ray.stages.stm import daily_means

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        dom = pd.DatetimeIndex(df["day"]).day
        out["half"] = np.where(dom <= 15, "a", "b")
        out["v"] = sql_round(df["v"].to_numpy(np.float64), round_to) + 0.0
        return out

    return daily_means(ds_long).map_batches(tag, batch_format="pandas")


def welch_ttest(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Welch's unequal-variance t-test per metric between the two
    month-halves: ``t = (m_a − m_b) / √(s²_a/n_a + s²_b/n_b)`` with
    the Welch–Satterthwaite degrees of freedom. Variances are sample
    variances computed moment-style (``(Σv² − n·m²)/(n−1)``) so the
    SQL twin can use the identical formula rather than DuckDB's
    ``var_samp`` accumulation. Metrics with fewer than two days in
    either half are dropped.

    Shape: pure combiner — Count/Sum/Sum-of-squares per
    ``(metric, half)``, then a per-metric finalize over the tiny
    (metrics × 2)-row table."""
    from ray.data.aggregate import Count, Sum

    def add_sq(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["metric", "half", "v"]].copy(deep=False)
        out["v2"] = df["v"].to_numpy(np.float64) ** 2
        return out

    grp = (_daily_halves(ds_long, round_to)
           .map_batches(add_sq, batch_format="pandas")
           .groupby(["metric", "half"])
           .aggregate(Count(alias_name="n"),
                      Sum("v", alias_name="s"),
                      Sum("v2", alias_name="s2")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["metric", "n_a", "n_b", "mean_a", "mean_b",
                "var_a", "var_b", "t_stat", "df"]
        rows = []
        for m, g in df.groupby("metric", sort=False):
            by = {h: r for h, r in zip(g["half"], g.itertuples())}
            if "a" not in by or "b" not in by:
                continue
            na, nb = int(by["a"].n), int(by["b"].n)
            if na < 2 or nb < 2:
                continue
            ma, mb = by["a"].s / na, by["b"].s / nb
            va = (by["a"].s2 - na * ma * ma) / (na - 1)
            vb = (by["b"].s2 - nb * mb * mb) / (nb - 1)
            se2 = va / na + vb / nb
            if se2 <= 0:
                continue
            t = (ma - mb) / np.sqrt(se2)
            dof = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                              + (vb / nb) ** 2 / (nb - 1))
            rows.append({"metric": m, "n_a": np.int64(na),
                         "n_b": np.int64(nb), "mean_a": ma, "mean_b": mb,
                         "var_a": va, "var_b": vb, "t_stat": t,
                         "df": dof})
        if not rows:
            return pd.DataFrame(columns=cols)
        out = pd.DataFrame(rows)[cols]
        for c in cols[3:]:
            out[c] = sql_round(out[c].to_numpy(np.float64), round_to) + 0.0
        return out

    # the grouped table is (metrics × 2) rows — single-block finalize
    return grp.repartition(1).map_batches(finalize, batch_size=None,
                                          batch_format="pandas")


def _value_counts(ds_long: rd.Dataset, round_to: int) -> rd.Dataset:
    """Distinct-value count table ``(metric, v, cnt_a, cnt_b)`` — the
    shared reduction of both rank tests. Its size is bounded by the
    number of distinct (rounded) daily-mean values, not by rows."""
    from ray.data.aggregate import Sum

    def ind(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["metric", "v"]].copy(deep=False)
        a = (df["half"] == "a").to_numpy()
        out["cnt_a"] = a.astype(np.int64)
        out["cnt_b"] = (~a).astype(np.int64)
        return out

    return (_daily_halves(ds_long, round_to)
            .map_batches(ind, batch_format="pandas")
            .groupby(["metric", "v"])
            .aggregate(Sum("cnt_a", alias_name="cnt_a"),
                       Sum("cnt_b", alias_name="cnt_b")))


def _scan_refs(counts: rd.Dataset):
    """Sort the value-count table and return (block refs, per-block
    exclusive offsets, per-metric totals). Offsets/totals are
    O(blocks × metrics) driver-side scalars (grouped_ntile's shape)."""
    srt = counts.sort(["metric", "v"])
    refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_sums(t: pa.Table) -> list:
        if len(t) == 0:
            return []
        df = t.select(["metric", "cnt_a", "cnt_b"]).to_pandas()
        g = df.groupby("metric", sort=False)[["cnt_a", "cnt_b"]].sum()
        # preserve in-block metric order (blocks are metric-sorted)
        order = df["metric"].drop_duplicates().tolist()
        return [(m, int(g.loc[m, "cnt_a"]), int(g.loc[m, "cnt_b"]))
                for m in order]

    per_block = ray.get([block_sums.remote(r) for r in refs])
    keep = [i for i, s in enumerate(per_block) if s]
    refs = [refs[i] for i in keep]
    per_block = [per_block[i] for i in keep]
    totals: dict[str, tuple[int, int]] = {}
    offsets: list[dict[str, tuple[int, int]]] = []
    for sums in per_block:
        offs = {}
        for m, ca, cb in sums:
            pa_, pb_ = totals.get(m, (0, 0))
            offs[m] = (pa_, pb_)
            totals[m] = (pa_ + ca, pb_ + cb)
        offsets.append(offs)
    return refs, offsets, totals


def mann_whitney(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Mann-Whitney U (Wilcoxon rank-sum) per metric between the two
    month-halves, with tie-corrected normal approximation and **no**
    continuity correction (the SQL twin computes the identical
    closed form from average ranks):

    ``U_a = R_a − n_a(n_a+1)/2``, ``z = (U_a − n_a·n_b/2) / σ`` with
    ``σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))`` over tie-group
    sizes ``t``.

    Rank sums decompose over *distinct values*: a tie group of size
    ``t`` starting after ``c`` smaller observations has average rank
    ``c + (t+1)/2``, so ``R_a = Σ cnt_a·(c + (t+1)/2)`` — an ordered
    prefix scan over the value-count table, done blockwise with
    driver-side offsets (never a whole metric in one worker)."""
    counts = _value_counts(ds_long, round_to)
    refs, offsets, totals = _scan_refs(counts)

    @ray.remote(num_cpus=0.25)
    def partials(t: pa.Table, offs: dict) -> list:
        df = t.select(["metric", "cnt_a", "cnt_b"]).to_pandas()
        out = []
        for m, g in df.groupby("metric", sort=False):
            ca = g["cnt_a"].to_numpy(np.float64)
            cb = g["cnt_b"].to_numpy(np.float64)
            cnt = ca + cb
            off_all = float(sum(offs[m]))
            before = off_all + np.concatenate(([0.0], np.cumsum(cnt)[:-1]))
            r_a = float((ca * (before + (cnt + 1.0) / 2.0)).sum())
            tie = float((cnt ** 3 - cnt).sum())
            out.append((m, r_a, tie))
        return out

    parts = ray.get([partials.remote(r, o)
                     for r, o in zip(refs, offsets)])
    acc: dict[str, list[float]] = {}
    for block in parts:
        for m, r_a, tie in block:
            c = acc.setdefault(m, [0.0, 0.0])
            c[0] += r_a
            c[1] += tie
    rows = []
    for m in sorted(acc):
        na, nb = totals[m]
        if na == 0 or nb == 0:
            continue
        n = na + nb
        r_a, tie = acc[m]
        u_a = r_a - na * (na + 1) / 2.0
        var = (na * nb / 12.0) * ((n + 1.0) - tie / (n * (n - 1.0)))
        if var <= 0:
            continue
        z = (u_a - na * nb / 2.0) / np.sqrt(var)
        rows.append({"metric": m, "n_a": np.int64(na),
                     "n_b": np.int64(nb), "u_a": u_a, "z": z})
    cols = ["metric", "n_a", "n_b", "u_a", "z"]
    out = pd.DataFrame(rows, columns=cols)
    for c in ("u_a", "z"):
        out[c] = sql_round(out[c].to_numpy(np.float64), round_to) + 0.0
    return rd.from_pandas(out)


def ks_two_sample(ds_long: rd.Dataset, round_to: int = 6) -> rd.Dataset:
    """Two-sample Kolmogorov-Smirnov per metric between the two
    month-halves: ``D = max_v |F_a(v) − F_b(v)|`` over the empirical
    CDFs evaluated at every observed value, plus the scaled statistic
    ``√(n_a·n_b/n)·D``. Same blockwise prefix-scan shape as
    :func:`mann_whitney` — per-block cumulative counts seeded by
    driver-computed exclusive offsets, block-local max, tiny combine."""
    counts = _value_counts(ds_long, round_to)
    refs, offsets, totals = _scan_refs(counts)

    @ray.remote(num_cpus=0.25)
    def partials(t: pa.Table, offs: dict, tots: dict) -> list:
        df = t.select(["metric", "cnt_a", "cnt_b"]).to_pandas()
        out = []
        for m, g in df.groupby("metric", sort=False):
            na, nb = tots[m]
            if na == 0 or nb == 0:
                continue
            off_a, off_b = offs[m]
            cum_a = off_a + np.cumsum(g["cnt_a"].to_numpy(np.float64))
            cum_b = off_b + np.cumsum(g["cnt_b"].to_numpy(np.float64))
            d = float(np.abs(cum_a / na - cum_b / nb).max())
            out.append((m, d))
        return out

    parts = ray.get([partials.remote(r, o, totals)
                     for r, o in zip(refs, offsets)])
    best: dict[str, float] = {}
    for block in parts:
        for m, d in block:
            best[m] = max(best.get(m, 0.0), d)
    rows = []
    for m in sorted(best):
        na, nb = totals[m]
        n = na + nb
        d = best[m]
        rows.append({"metric": m, "n_a": np.int64(na),
                     "n_b": np.int64(nb), "d_stat": d,
                     "ks_stat": np.sqrt(na * nb / float(n)) * d})
    cols = ["metric", "n_a", "n_b", "d_stat", "ks_stat"]
    out = pd.DataFrame(rows, columns=cols)
    for c in ("d_stat", "ks_stat"):
        out[c] = sql_round(out[c].to_numpy(np.float64), round_to) + 0.0
    return rd.from_pandas(out)


def _erfc_as(x: np.ndarray) -> np.ndarray:
    """Abramowitz & Stegun 7.1.26 complementary-error-function
    approximation (|error| < 1.5e-7) as explicit arithmetic, so the
    DuckDB twin (which has no erf/erfc) can evaluate the *identical*
    expression: both engines feed the same rounded input through the
    same +,*,/,exp chain."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * np.exp(-x * x)


def domain_drift_bh(ds_long: rd.Dataset, metric: str = "text_len",
                    round_to: int = 6) -> rd.Dataset:
    """Which domains' ``metric`` distribution shifted between the two
    month-halves, with Benjamini-Hochberg false-discovery-rate control
    across the whole domain family — the multiple-comparison screen a
    crawl operator actually needs (testing 10⁶ domains at α=0.05
    uncorrected would "detect" 50k drifts by chance).

    Per domain: Welch z over the daily means (normal approximation —
    documented: at the daily grain every tested domain has ≥2 obs per
    half and df is not adjusted), two-sided p from the A&S 7.1.26
    erfc expansion **evaluated on the rounded z** so the engine and
    the SQL twin feed bit-identical inputs through the same
    arithmetic. Then BH: with the m tested domains ordered by
    ``(p, domain)``, ``p_bh(i) = min(1, min_{j≥i} p_(j)·m/j)`` — ties
    in p collapse under the suffix-min, so the tie-break never changes
    the result, only makes the scan deterministic.

    Scale shape: moments are one Sum-combiner groupby (six columns per
    domain, masked by half — no pivot join); z/p are elementwise over
    the bounded per-domain table; the BH suffix-min runs blockwise
    over the p-sorted table with O(blocks) driver scalars (per-block
    counts → global ranks; per-block raw minima → exclusive suffix-min
    seeds), never a whole family in one worker."""
    from ray.data.aggregate import Sum

    _domain_re = r"^[a-z]+://([^/]+)"

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        dom = pd.DatetimeIndex(df["day"]).day.to_numpy()
        a = (dom <= 15).astype(np.float64)
        b = 1.0 - a
        v = sql_round(df["v"].to_numpy(np.float64), round_to) + 0.0
        return pd.DataFrame({
            "domain": df["url"].str.extract(_domain_re, expand=False),
            "n_a": a, "s_a": a * v, "s2_a": a * v * v,
            "n_b": b, "s_b": b * v, "s2_b": b * v * v})

    grp = (_daily_means_of(ds_long.filter(
               expr=f"metric == '{metric}'"))
           .map_batches(moments, batch_format="pandas")
           .groupby("domain")
           .aggregate(Sum("n_a", alias_name="n_a"),
                      Sum("s_a", alias_name="s_a"),
                      Sum("s2_a", alias_name="s2_a"),
                      Sum("n_b", alias_name="n_b"),
                      Sum("s_b", alias_name="s_b"),
                      Sum("s2_b", alias_name="s2_b")))

    def zp(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["domain", "n_a", "n_b", "z", "p"]
        if df.empty:
            return pd.DataFrame({c: pd.Series(
                dtype=np.int64 if c in ("n_a", "n_b") else
                (object if c == "domain" else np.float64))
                for c in cols})
        na = df["n_a"].to_numpy(np.float64)
        nb = df["n_b"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            ma = df["s_a"].to_numpy(np.float64) / na
            mb = df["s_b"].to_numpy(np.float64) / nb
            va = (df["s2_a"].to_numpy(np.float64) - na * ma * ma) \
                / (na - 1)
            vb = (df["s2_b"].to_numpy(np.float64) - nb * mb * mb) \
                / (nb - 1)
            se2 = va / na + vb / nb
            keep = (na >= 2) & (nb >= 2) & (se2 > 0)
            z = sql_round((ma - mb) / np.sqrt(se2), round_to) + 0.0
        p = sql_round(_erfc_as(np.abs(z[keep]) / np.sqrt(2.0)),
                      round_to) + 0.0
        return pd.DataFrame({
            "domain": df["domain"].to_numpy()[keep],
            "n_a": na[keep].astype(np.int64),
            "n_b": nb[keep].astype(np.int64),
            "z": z[keep], "p": p})[cols]

    tested = grp.map_batches(zp, batch_format="pandas") \
                .sort(["p", "domain"])
    refs = tested.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_len(t: pa.Table) -> int:
        return len(t)

    lens = ray.get([block_len.remote(r) for r in refs])
    keep_i = [i for i, n in enumerate(lens) if n]
    refs = [refs[i] for i in keep_i]
    lens = [lens[i] for i in keep_i]
    m = int(sum(lens))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if lens else []

    @ray.remote(num_cpus=0)
    def raw_min(t: pa.Table, start: int) -> float:
        p = t.column("p").to_numpy(zero_copy_only=False)
        rank = np.arange(start + 1, start + len(p) + 1, dtype=np.float64)
        return float((p * m / rank).min())

    mins = ray.get([raw_min.remote(r, s) for r, s in zip(refs, starts)])
    # exclusive suffix-min seed for each block (min over later blocks)
    seeds = np.full(len(mins), np.inf)
    acc = np.inf
    for i in range(len(mins) - 1, -1, -1):
        seeds[i] = acc
        acc = min(acc, mins[i])

    @ray.remote(num_cpus=0.25)
    def adjust(t: pa.Table, start: int, seed: float) -> pa.Table:
        df = t.to_pandas()
        p = df["p"].to_numpy(np.float64)
        rank = np.arange(start + 1, start + len(p) + 1, dtype=np.float64)
        raw = p * m / rank
        adj = np.minimum.accumulate(raw[::-1])[::-1]
        adj = np.minimum(np.minimum(adj, seed), 1.0)
        out = pd.DataFrame({
            "domain": df["domain"], "n_a": df["n_a"], "n_b": df["n_b"],
            "z": df["z"], "p_value": df["p"],
            "p_bh": sql_round(adj, round_to) + 0.0})
        return pa.Table.from_pandas(out, preserve_index=False)

    out_refs = [adjust.remote(r, s, sd)
                for r, s, sd in zip(refs, starts, seeds)]
    if not out_refs:
        empty = pa.table({
            "domain": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "z": pa.array([], pa.float64()),
            "p_value": pa.array([], pa.float64()),
            "p_bh": pa.array([], pa.float64())})
        return rd.from_arrow(empty)
    return rd.from_arrow_refs(out_refs)


def _daily_means_of(ds_long: rd.Dataset) -> rd.Dataset:
    from sits_classification_ray.stages.stm import daily_means

    return daily_means(ds_long)


def chi2_independence(ds: rd.Dataset, row_col: str = "lang",
                      ts_col: str = "warc_ts",
                      round_to: int = 6) -> rd.Dataset:
    """Chi-square independence screen over the ``lang × week``
    contingency of crawl snapshots: per observed cell, the count, the
    independence-expected count ``row_total × col_total / N``, and the
    cell's χ² contribution ``(o−e)²/e`` — "did the language mix change
    week-over-week?". Zero-observed cells are not emitted (they add 0
    to the marginals, and the SQL twin enumerates the same cells).

    Shape: one distributed count groupby; the contingency table is
    categorically bounded (languages × weeks), so the marginal/expected
    finalize runs on a single tiny block regardless of corpus size."""
    def to_week(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[row_col]].copy(deep=False)
        # Monday-start (ISO) weeks, matching DuckDB date_trunc('week'):
        # 1970-01-01 was a Thursday, so Monday-indexed weekday is
        # (days + 3) % 7.
        di = (df[ts_col].to_numpy().astype("datetime64[D]")
              .astype(np.int64))
        start = di - (di + 3) % 7
        out["week"] = start.astype("datetime64[D]").astype("datetime64[us]")
        return out

    cnt = (ds.map_batches(to_week, batch_format="pandas")
           .groupby([row_col, "week"]).count())

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = [row_col, "week", "observed", "expected", "contrib"]
        if df.empty:
            return pd.DataFrame(columns=cols)
        o = df["count()"].to_numpy(np.float64)
        n = o.sum()
        row_tot = df.groupby(row_col)["count()"].transform("sum")
        col_tot = df.groupby("week")["count()"].transform("sum")
        e = row_tot.to_numpy(np.float64) * col_tot.to_numpy(np.float64) / n
        out = pd.DataFrame({
            row_col: df[row_col], "week": df["week"],
            "observed": df["count()"].astype(np.int64),
            "expected": sql_round(e, round_to) + 0.0,
            "contrib": sql_round((o - e) ** 2 / e, round_to) + 0.0})
        return out[cols]

    return cnt.repartition(1).map_batches(finalize, batch_size=None,
                                          batch_format="pandas")
