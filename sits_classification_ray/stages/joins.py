"""Join operators: as-of, hash, broadcast semi/anti.

Re-expressions of SURVEY §2.4:

- :func:`asof_join` — J1, the reference's thermal-raster "value at the
  latest date ≤ t" lookup (``utils/class_run.py:39-61,179-186``),
  generalized to two datasets: union-tag both sides, hash-partition by
  entity key, ``pd.merge_asof`` per partition.
- :func:`hash_join` — J2 (meta.csv lookup,
  ``pytorch/predict.py:621,641-645``) on Ray's hash-partitioned
  ``Dataset.join`` when both sides are large.
- :func:`semi_join_filter` / :func:`anti_join_filter` — J5/J6
  (aoi-keyword routing ``utils/reorder_csv.py:53-83``; sampling
  uniqueness rejection ``utils/sampling_run.py:100-115``): broadcast
  the key set once, filter vectorized per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def asof_join(left: rd.Dataset, right: rd.Dataset, by: str,
              left_ts: str, right_ts: str,
              value_cols: list[str]) -> rd.Dataset:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``by`` key.

    Both sides are tagged and unioned, hash-partitioned on ``by`` (one
    shuffle), and each partition runs one vectorized
    ``pd.merge_asof``. Left rows with no earlier right row get nulls
    (matching SQL ``ASOF LEFT JOIN``).
    """
    from sits_classification_ray.stages.shuffle import partitioned_map

    left_cols = left.columns()

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__side"] = 0
        df["__ts"] = df[left_ts]
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({by: df[by], "__ts": df[right_ts], "__side": 1})
        for c in value_cols:
            out[c] = df[c]
        return out

    l_t = left.map_batches(tag_left, batch_format="pandas")
    r_t = right.map_batches(tag_right, batch_format="pandas")
    unioned = l_t.union(r_t)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # an all-empty right side can vanish from the union schema —
        # restore its columns so the left-join semantics still hold
        for c in value_cols:
            if c not in df.columns:
                df = df.assign(**{c: np.nan})
        # the union schema carries both sides' columns — strip the
        # right-side value columns from the left frame so merge_asof
        # attaches the real ones instead of the union's nulls
        lf = (df[df["__side"] == 0]
              .drop(columns=value_cols, errors="ignore")
              .sort_values("__ts", kind="mergesort"))
        rf = (df[df["__side"] == 1][[by, "__ts"] + value_cols]
              .dropna(subset=["__ts"]).sort_values("__ts", kind="mergesort"))
        merged = pd.merge_asof(lf, rf, on="__ts", by=by,
                               direction="backward",
                               suffixes=("", "__r"))
        return merged[left_cols + value_cols]

    return partitioned_map(unioned, kernel, keys=[by])


def range_join(left: rd.Dataset, right: rd.Dataset, by: str,
               left_ts: str, right_start: str, right_end: str,
               value_cols: list[str]) -> rd.Dataset:
    """Interval (range) join: every pair (left row, right interval)
    with ``right_start <= left_ts < right_end`` within the same ``by``
    key — one output row per match (a left row inside k intervals
    appears k times, SQL inner-join semantics).

    Shape: union-tag both sides, ONE salted exchange on the key, then
    a per-key vectorized sweep — left timestamps sorted once, each
    interval resolved to a contiguous slice by two ``searchsorted``
    calls, matches emitted with ``np.repeat``/``arange`` (no per-pair
    Python). Partitioning assumption: one key's rows+intervals fit a
    block — the same series-co-location contract as every other kernel,
    bounded by the salted partitioner."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    left_cols = left.columns()
    out_cols = left_cols + [right_start] + value_cols

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__side"] = 0
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({by: df[by], right_start: df[right_start],
                            "__end": df[right_end], "__side": 1})
        for c in value_cols:
            out[c] = df[c]
        return out

    unioned = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        lf = df[df["__side"] == 0].reindex(columns=left_cols)
        rf = df[df["__side"] == 1].reindex(
            columns=[by, right_start, "__end"] + value_cols)
        outs = []
        for key, g in lf.groupby(by, sort=False):
            iv = rf[rf[by] == key]
            if not len(iv):
                continue
            ts = np.sort(g[left_ts].to_numpy().astype("datetime64[us]")
                         .astype(np.int64))
            order = np.argsort(g[left_ts].to_numpy(), kind="mergesort")
            gs = g.iloc[order]
            starts = iv[right_start].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            ends = iv["__end"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            lo = np.searchsorted(ts, starts, side="left")
            hi = np.searchsorted(ts, ends, side="left")
            counts = hi - lo
            if counts.sum() == 0:
                continue
            iv_idx = np.repeat(np.arange(len(iv)), counts)
            row_idx = (np.arange(counts.sum())
                       - np.repeat(counts.cumsum() - counts, counts)
                       + np.repeat(lo, counts))
            matched = gs.iloc[row_idx].reset_index(drop=True)
            ivm = iv.iloc[iv_idx].reset_index(drop=True)
            matched[right_start] = ivm[right_start].to_numpy()
            for c in value_cols:
                matched[c] = ivm[c].to_numpy()
            outs.append(matched[out_cols])
        if not outs:
            return lf.iloc[0:0].reindex(columns=out_cols)
        return pd.concat(outs, ignore_index=True)

    return partitioned_map(unioned, kernel, keys=[by])


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
              right_on: str | None = None, join_type: str = "inner",
              num_partitions: int = 32) -> rd.Dataset:
    """Hash-partitioned join for two large sides (Ray ``Dataset.join``)."""
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions,
                     on=(on,), right_on=(right_on or on,))


def _broadcast_key_filter(ds: rd.Dataset, col: str, keys, keep: bool
                          ) -> rd.Dataset:
    keys_ref = ray.put(np.asarray(sorted(keys)))

    class Filter:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = np.isin(np.asarray(batch[col]), self.keys)
            if not keep:
                mask = ~mask
            return batch.filter(pa.array(mask))

    return ds.map_batches(Filter, batch_format="pyarrow",
                          concurrency=(1, 8), num_cpus=1)


def semi_join_filter(ds: rd.Dataset, col: str, keys) -> rd.Dataset:
    """Keep rows whose ``col`` is in the broadcast key set (J5)."""
    return _broadcast_key_filter(ds, col, keys, keep=True)


def anti_join_filter(ds: rd.Dataset, col: str, keys) -> rd.Dataset:
    """Drop rows whose ``col`` is in the broadcast key set (J6)."""
    return _broadcast_key_filter(ds, col, keys, keep=False)
