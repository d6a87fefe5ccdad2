"""Unbounded-series ordered scans: distributed prefix-sum and lag.

Companions to :mod:`stages.gapfill_sorted` for the §2.9 window
operators whose salted-partition versions are bounded by the largest
single series. Same shape: ``Dataset.sort`` on (url, metric, warc_ts)
→ range-partitioned blocks, a TINY per-block boundary exchange, then
one Ray task per block.

- :func:`running_sum_unbounded` — the classic distributed prefix
  scan: each block reports, per boundary series, its local sum (≤ 2
  rows per block); the driver accumulates carry-ins in O(B); each
  block then adds its carry-in to the continuation series' local
  cumsum. Nothing driver-side scales with data — only with blocks.
- :func:`snapshot_deltas_unbounded` — lag across cuts: each block
  receives the previous block's last row (1-row halo, reusing the
  gap-fill boundary machinery) so the first row of a continuing
  series gets its true delta.

Partitioning assumption: one BLOCK fits a worker — nothing about any
series. Outputs are bit-identical to the salted-partition operators
for integer-valued metrics (every sum < 2^53 is exact in any order —
the engine's metrics are counts/lengths); for general floats the
carry-in is a re-associated sum, same as any distributed scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_KEY = ["url", "metric"]


def _sorted_refs(ds_long: rd.Dataset, num_blocks: int | None):
    srt = ds_long
    if num_blocks:
        srt = srt.repartition(num_blocks)
    srt = srt.sort(["url", "metric", "warc_ts"])
    return srt.to_arrow_refs()


def running_sum_unbounded(ds_long: rd.Dataset,
                          out_col: str = "running_sum",
                          num_blocks: int | None = None) -> rd.Dataset:
    block_refs = _sorted_refs(ds_long, num_blocks)

    @ray.remote(num_cpus=0.25)
    def series_totals(t: pa.Table) -> list:
        """(first_key, its sum, last_key, its sum) for one block —
        only boundary series can need carry across blocks."""
        if len(t) == 0:
            return []
        df = t.select(["url", "metric", "value"]).to_pandas()
        g = df.groupby(_KEY, sort=False)["value"].sum()
        first_key = (df["url"].iloc[0], df["metric"].iloc[0])
        last_key = (df["url"].iloc[-1], df["metric"].iloc[-1])
        out = [(first_key, float(g.loc[first_key]))]
        if last_key != first_key:
            out.append((last_key, float(g.loc[last_key])))
        return out

    totals = ray.get([series_totals.remote(r) for r in block_refs])
    # O(B) driver pass: carry-in per block for its continuing series
    carry: list[tuple | None] = []        # (key, carry_value) per block
    acc_key: tuple | None = None
    acc_val = 0.0
    for t in totals:
        if not t:
            carry.append(None)
            continue
        first_key = t[0][0]
        carry.append((first_key, acc_val) if first_key == acc_key else None)
        # fold this block's boundary sums into the accumulator
        for key, s in t:
            if key == acc_key:
                acc_val += s
            else:
                acc_key, acc_val = key, s

    @ray.remote(num_cpus=1)
    def scan(t: pa.Table, carry_in) -> pa.Table:
        if len(t) == 0:
            return t
        df = t.to_pandas()
        df[out_col] = df.groupby(_KEY, sort=False)["value"].cumsum()
        if carry_in is not None:
            (url, metric), c = carry_in
            m = (df["url"] == url) & (df["metric"] == metric)
            df.loc[m, out_col] += c
        return pa.Table.from_pandas(df, preserve_index=False)

    out_refs = [scan.remote(r, c) for r, c in zip(block_refs, carry)]
    return rd.from_arrow_refs(out_refs)


def sessionize_unbounded(ds: rd.Dataset, gap_seconds: int = 86400,
                         ts_col: str = "warc_ts", key_col: str = "url",
                         out_col: str = "session_id",
                         num_blocks: int | None = None) -> rd.Dataset:
    """Distributed sessionization: per-key session ids from inactivity
    gaps, with no per-key size bound.

    Boundary state per block: (last key, last timestamp, that key's
    session count so far) — O(B) driver accumulation, exactly the
    prefix-scan shape of :func:`running_sum_unbounded` plus the
    cross-cut gap check."""
    gap_us = gap_seconds * 1_000_000
    srt = ds
    if num_blocks:
        srt = srt.repartition(num_blocks)
    srt = srt.sort([key_col, ts_col])
    block_refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def boundary(t: pa.Table):
        """(first_key, first_ts, sessions_started_for_first_key,
        last_key, last_ts, sessions_started_for_last_key)."""
        if len(t) == 0:
            return None
        df = t.select([key_col, ts_col]).to_pandas()
        keys = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        brk = np.zeros(len(df), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = (brk & ~new_key)
        first_key, last_key = keys[0], keys[-1]
        first_n = int(starts[keys == first_key].sum())
        last_n = int(starts[keys == last_key].sum())
        return (first_key, int(ts[0]), first_n,
                last_key, int(ts[-1]), last_n)

    bounds = ray.get([boundary.remote(r) for r in block_refs])
    # O(B) driver pass: carry-in per block = (key, prev_last_ts,
    # session_id_offset) for the continuing key
    carry: list[tuple | None] = []
    acc_key = None
    acc_last_ts = 0
    acc_sessions = 0                   # sessions of acc_key so far
    for b in bounds:
        if b is None:
            carry.append(None)
            continue
        first_key, first_ts, first_n, last_key, last_ts, last_n = b
        if first_key == acc_key:
            extra = 1 if (first_ts - acc_last_ts) > gap_us else 0
            carry.append((first_key, acc_sessions + extra))
            base = acc_sessions + extra
        else:
            carry.append(None)
            base = 0
        if last_key == first_key:
            acc_sessions = base + last_n
        else:
            acc_sessions = last_n
        acc_key, acc_last_ts = last_key, last_ts

    @ray.remote(num_cpus=1)
    def assign(t: pa.Table, carry_in) -> pa.Table:
        if len(t) == 0:
            return t
        df = t.to_pandas().sort_values([key_col, ts_col], kind="mergesort")
        keys = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        brk = np.zeros(len(df), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = (brk & ~new_key).astype(np.int64)
        sid = pd.Series(starts).groupby(pd.Series(keys), sort=False).cumsum()
        sid = sid.to_numpy()
        if carry_in is not None:
            key, offset = carry_in
            sid = sid + np.where(keys == key, offset, 0)
        df[out_col] = sid
        return pa.Table.from_pandas(df, preserve_index=False)

    out_refs = [assign.remote(r, c) for r, c in zip(block_refs, carry)]
    return rd.from_arrow_refs(out_refs)


def rolling_mean_unbounded(ds_long: rd.Dataset, window: int = 4,
                           out_col: str = "rolling_mean",
                           num_blocks: int | None = None) -> rd.Dataset:
    """Sliding k-observation mean with no per-series bound: each block
    receives the previous (window − 1) rows of its first series as a
    halo (assembled by the driver from per-block tails — ≤ k−1 tiny
    rows per block, walking backwards across blocks when a thin block
    holds fewer)."""
    block_refs = _sorted_refs(ds_long, num_blocks)

    @ray.remote(num_cpus=0.25)
    def tail_rows(t: pa.Table) -> list:
        n = min(window - 1, len(t))
        return t.slice(len(t) - n, n).to_pylist() if n else []

    @ray.remote(num_cpus=0.25)
    def head_key(t: pa.Table):
        return ((t["url"][0].as_py(), t["metric"][0].as_py())
                if len(t) else None)

    tails = ray.get([tail_rows.remote(r) for r in block_refs])
    heads = ray.get([head_key.remote(r) for r in block_refs])

    def halo_for(i: int) -> list:
        """Last (window−1) rows of block i's first series from the
        preceding blocks (tiny rows, walked backwards)."""
        key = heads[i]
        if key is None:
            return []
        rows: list = []
        for j in range(i - 1, -1, -1):
            for r in reversed(tails[j]):
                if (r["url"], r["metric"]) != key:
                    return list(reversed(rows))
                rows.append(r)
                if len(rows) >= window - 1:
                    return list(reversed(rows))
            if len(tails[j]) < window - 1:
                # the whole previous block was thinner than the halo —
                # its own tail already crossed into earlier blocks;
                # keep walking only if every tail row matched
                continue
        return list(reversed(rows))

    @ray.remote(num_cpus=1)
    def roll(t: pa.Table, halo: list) -> pa.Table:
        if len(t) == 0:
            return t
        df = t.to_pandas()
        if halo:
            pre = pd.DataFrame(halo)[df.columns.tolist()]
            work = pd.concat([pre, df], ignore_index=True)
        else:
            work = df
        rm = (work.groupby(_KEY, sort=False)["value"]
              .transform(lambda s: s.rolling(window, min_periods=1).mean()))
        df[out_col] = rm.to_numpy()[len(halo):]
        return pa.Table.from_pandas(df, preserve_index=False)

    out_refs = [roll.remote(r, halo_for(i))
                for i, r in enumerate(block_refs)]
    return rd.from_arrow_refs(out_refs)


def snapshot_deltas_unbounded(ds_long: rd.Dataset,
                              out_col: str = "delta",
                              num_blocks: int | None = None) -> rd.Dataset:
    block_refs = _sorted_refs(ds_long, num_blocks)

    @ray.remote(num_cpus=0.25)
    def last_row(t: pa.Table):
        return t.slice(len(t) - 1, 1).to_pylist()[0] if len(t) else None

    lasts = ray.get([last_row.remote(r) for r in block_refs])

    @ray.remote(num_cpus=1)
    def lag(t: pa.Table, left) -> pa.Table:
        if len(t) == 0:
            return t
        df = t.to_pandas()
        vals = df["value"].to_numpy(np.float64)
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        delta = np.empty(len(df))
        delta[0] = np.nan
        delta[1:] = vals[1:] - vals[:-1]
        start = np.zeros(len(df), dtype=bool)
        start[0] = True
        start[1:] = (urls[1:] != urls[:-1]) | (mets[1:] != mets[:-1])
        delta[start] = np.nan
        if left is not None and (left["url"], left["metric"]) == \
                (urls[0], mets[0]):
            delta[0] = vals[0] - left["value"]     # true lag across cut
        df[out_col] = delta
        return pa.Table.from_pandas(df, preserve_index=False)

    out_refs = []
    n = len(block_refs)
    for i, r in enumerate(block_refs):
        left = next((lasts[j] for j in range(i - 1, -1, -1)
                     if lasts[j] is not None), None)
        out_refs.append(lag.remote(r, left))
    return rd.from_arrow_refs(out_refs)


def global_rank(ds: rd.Dataset, sort_cols: list[str],
                out_rn: str = "rn", out_pct: str = "percentile",
                num_blocks: int | None = None) -> rd.Dataset:
    """Corpus-wide total-order ranking: ``row_number`` and
    ``percent_rank`` over ``sort_cols`` (which must define a TOTAL
    order — include a unique tiebreak column).

    Shape: ``Dataset.sort`` range-partitions the corpus; each block
    reports only its LENGTH (one int per block); the driver computes
    exclusive-prefix offsets in O(B); one Ray task per block then adds
    its offset to a local ``arange``. Nothing driver-side scales with
    rows — the classic distributed-rank construction (quality-
    percentile cutoffs, curriculum ordering for training feeds).
    percent_rank is ``(rn-1)/(n-1)`` — identical to SQL's under a
    total order (no ties by construction).
    """
    srt = ds
    if num_blocks:
        srt = srt.repartition(num_blocks)
    srt = srt.sort(sort_cols)
    refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_len(t: pa.Table) -> int:
        return len(t)

    lens = ray.get([block_len.remote(r) for r in refs])
    refs = [ref for ref, ln in zip(refs, lens) if ln > 0]
    lens = [ln for ln in lens if ln > 0]
    if not refs:
        return srt
    n = int(sum(lens))
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0.5)
    def add_rank(t: pa.Table, off: int) -> pa.Table:
        rn = off + np.arange(1, len(t) + 1, dtype=np.int64)
        pct = ((rn - 1) / (n - 1) if n > 1
               else np.zeros(len(t), np.float64))
        return t.append_column(out_rn, pa.array(rn)).append_column(
            out_pct, pa.array(pct, pa.float64()))

    return rd.from_arrow_refs(
        [add_rank.remote(r, int(o)) for r, o in zip(refs, offsets)])


def ntile(ds: rd.Dataset, sort_cols: list[str], k: int,
          out_col: str = "tile") -> rd.Dataset:
    """Distributed ``NTILE(k)`` over a total order: the first
    ``n % k`` tiles get ``n // k + 1`` rows, the rest ``n // k`` —
    exactly SQL's semantics.

    Same O(B)-driver construction as ``global_rank``: blocks report
    lengths only, offsets are a prefix sum, each block maps its own
    rank range to tile ids locally."""
    srt = ds.sort(sort_cols)
    refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_len(t: pa.Table) -> int:
        return len(t)

    lens = ray.get([block_len.remote(r) for r in refs])
    # drop empty blocks: a 0-row arrow block carries no columns, and
    # appending the tile column to it would poison the unified schema
    refs = [ref for ref, ln in zip(refs, lens) if ln > 0]
    lens = [ln for ln in lens if ln > 0]
    if not refs:
        return srt
    n = int(sum(lens))
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    q, r = divmod(n, k) if n else (0, 0)

    @ray.remote(num_cpus=0.5)
    def add_tile(t: pa.Table, off: int) -> pa.Table:
        rn = off + np.arange(1, len(t) + 1, dtype=np.int64)
        cut = r * (q + 1)
        big = (rn - 1) // max(1, q + 1) + 1
        small = r + (rn - cut - 1) // max(1, q) + 1
        tile = np.where(rn <= cut, big, small).astype(np.int64)
        return t.append_column(out_col, pa.array(tile))

    return rd.from_arrow_refs(
        [add_tile.remote(ref, int(o)) for ref, o in zip(refs, offsets)])


def grouped_ntile(ds: rd.Dataset, group_cols: list[str],
                  sort_cols: list[str], k: int,
                  descending: list[bool] | None = None,
                  out_col: str = "tile") -> rd.Dataset:
    """Distributed ``NTILE(k) OVER (PARTITION BY group ORDER BY
    sort_cols)`` — the per-group form of :func:`ntile` (CCNet's
    per-language perplexity bucketing is this with k=3).

    Shape: ONE global sort on ``group_cols + sort_cols`` makes every
    group contiguous across range-partitioned blocks; each block
    reports its per-group counts IN ORDER (O(groups-spanning-block)
    ints, never rows); the driver accumulates per-group totals and
    per-(block, group) exclusive offsets in O(B + G); one Ray task
    per block then assigns SQL-exact tile ids locally. Nothing
    driver-side scales with rows, and — unlike a per-group
    ``map_groups`` — no single worker ever has to hold the largest
    group, so a head language that is 90 % of the corpus costs
    nothing extra."""
    keys = list(group_cols) + list(sort_cols)
    desc = ([False] * len(group_cols)
            + (descending or [False] * len(sort_cols)))
    srt = ds.sort(keys, descending=desc)
    refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_groups(t: pa.Table) -> list[tuple[tuple, int]]:
        if len(t) == 0:
            return []
        df = t.select(group_cols).to_pandas()
        codes = pd.MultiIndex.from_frame(df).to_numpy()
        # groups are contiguous post-sort: run-length encode
        change = np.ones(len(codes), dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(codes))
        return [(tuple(np.atleast_1d(codes[s])), int(e - s))
                for s, e in zip(starts, ends)]

    per_block = ray.get([block_groups.remote(r) for r in refs])
    # drop empty blocks (0-row arrow blocks lose their columns; the
    # appended tile column would poison the unified schema)
    keep = [i for i, g in enumerate(per_block) if g]
    if not keep:
        return srt
    refs = [refs[i] for i in keep]
    per_block = [per_block[i] for i in keep]
    totals: dict[tuple, int] = {}
    offsets: list[list[tuple[tuple, int]]] = []
    for groups in per_block:
        offs = []
        for key, cnt in groups:
            offs.append((key, totals.get(key, 0)))
            totals[key] = totals.get(key, 0) + cnt
        offsets.append(offs)

    @ray.remote(num_cpus=0.5)
    def add_tile(t: pa.Table, offs: list[tuple[tuple, int]],
                 tots: dict[tuple, int]) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col,
                                   pa.array([], pa.int64()))
        df = t.select(group_cols).to_pandas()
        codes = pd.MultiIndex.from_frame(df).to_numpy()
        change = np.ones(len(codes), dtype=bool)
        change[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(codes))
        tile = np.empty(len(codes), dtype=np.int64)
        for (key, off), s, e in zip(offs, starts, ends):
            n = tots[key]
            q, r = divmod(n, k)
            rn = off + np.arange(1, e - s + 1, dtype=np.int64)
            cut = r * (q + 1)
            big = (rn - 1) // max(1, q + 1) + 1
            small = r + (rn - cut - 1) // max(1, q) + 1
            tile[s:e] = np.where(rn <= cut, big, small)
        return t.append_column(out_col, pa.array(tile))

    return rd.from_arrow_refs(
        [add_tile.remote(ref, offs, totals)
         for ref, offs in zip(refs, offsets)])


def global_prefix_sum(ds: rd.Dataset, sort_cols: list[str],
                      val_col: str, out_col: str = "prior",
                      num_blocks: int | None = None) -> rd.Dataset:
    """Corpus-wide EXCLUSIVE prefix sum of ``val_col`` over the total
    order ``sort_cols`` — the :func:`global_rank` construction with a
    value sum instead of a row count: ``Dataset.sort``
    range-partitions, each block reports one int64 (its value total),
    the driver computes exclusive block offsets in O(B), and one task
    per block adds its offset to a local exclusive cumsum. Values must
    be integers (exact, order-free merge)."""
    srt = ds
    if num_blocks:
        srt = srt.repartition(num_blocks)
    srt = srt.sort(sort_cols)
    refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_sum(t: pa.Table) -> tuple:
        if len(t) == 0:
            return 0, 0
        return len(t), int(np.asarray(t[val_col])
                           .astype(np.int64).sum())

    stats = ray.get([block_sum.remote(r) for r in refs])
    keep = [(r, s) for r, (ln, s) in zip(refs, stats) if ln > 0]
    if not keep:
        return srt
    offsets = np.concatenate(
        ([0], np.cumsum([s for _, s in keep])[:-1])).astype(np.int64)

    @ray.remote(num_cpus=0.5)
    def add_prior(t: pa.Table, off: int) -> pa.Table:
        v = np.asarray(t[val_col]).astype(np.int64) if len(t) \
            else np.array([], dtype=np.int64)
        prior = off + np.concatenate(([0], np.cumsum(v)[:-1])) \
            .astype(np.int64) if len(t) else v
        return t.append_column(out_col, pa.array(prior))

    return rd.from_arrow_refs(
        [add_prior.remote(r, int(o))
         for (r, _), o in zip(keep, offsets)])


def lateness_histogram(ds: rd.Dataset, id_col: str = "event_id",
                       ts_col: str = "ts",
                       bucket_seconds: int = 3600,
                       num_blocks: int | None = None) -> rd.Dataset:
    """Event-time lateness audit over ARRIVAL order (the watermark-
    design input: how late does data really arrive?): lateness of an
    event = running max of event time over arrival order (inclusive)
    minus its own event time. Distributed as the standard two-pass
    prefix scan: per-block maxima → O(B) driver carry fold → per-block
    vectorized ``np.maximum.accumulate`` with carry-in, then per-block
    histogram partials reduced by one tiny groupby."""
    srt = ds
    if num_blocks:
        srt = srt.repartition(num_blocks)
    srt = srt.sort(id_col)
    block_refs = srt.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def block_max(t: pa.Table):
        if len(t) == 0:
            return None
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return int(ts.max())

    maxima = ray.get([block_max.remote(r) for r in block_refs])
    carry: list[int | None] = []
    acc: int | None = None
    for m in maxima:
        carry.append(acc)
        if m is not None:
            acc = m if acc is None else max(acc, m)

    @ray.remote(num_cpus=1)
    def hist(t: pa.Table, carry_in) -> pa.Table:
        if len(t) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ts = t[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        runmax = np.maximum.accumulate(ts)
        if carry_in is not None:
            runmax = np.maximum(runmax, carry_in)
        late = (runmax - ts) // (bucket_seconds * 1_000_000)
        vals, counts = np.unique(late, return_counts=True)
        return pa.table({"bucket": pa.array(vals.astype(np.int64)),
                         "n": pa.array(counts.astype(np.int64))})

    from ray.data.aggregate import Sum

    parts = rd.from_arrow_refs(
        [hist.remote(r, c) for r, c in zip(block_refs, carry)])
    return parts.groupby("bucket").aggregate(Sum("n", alias_name="n"))
