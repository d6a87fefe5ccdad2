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
              value_cols: list[str],
              tolerance=None, direction: str = "backward") -> rd.Dataset:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``by`` key; with
    ``tolerance`` (a pd.Timedelta), only matches within
    ``left_ts - tolerance`` qualify (inclusive) — the attribution-
    window variant. ``direction="forward"`` flips the predicate to the
    smallest ``right_ts >= left_ts`` (next-event attach).

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
                               direction=direction,
                               tolerance=tolerance,
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


def _strip_meta(batch: pa.Table) -> pa.Table:
    """Metadata-only rewrite (zero-copy): pandas-conversion metadata on
    a block schema makes ``pa.Schema`` unhashable, so every hash-shuffle
    aggregator that sees such a block logs a schema-dedup warning."""
    return (batch.replace_schema_metadata(None)
            if batch.schema.metadata else batch)


#: Logical ops that provably emit only well-schemed blocks (reads and
#: per-block maps preserve the block schema; Union of safe children is
#: safe).  Everything else — Sort / Aggregate / Join / InputData (a
#: materialize() hides its producer) — may have gone through Ray's
#: sort shuffle, whose empty range partitions surface as ZERO-COLUMN
#: pandas blocks that no map UDF ever touches (Ray skips the UDF on
#: empty blocks), so they cannot be repaired in-stream.
_SCHEMA_SAFE_OPS = frozenset({
    "Read", "FromPandas", "FromArrow", "FromItems", "FromNumpy",
    "MapBatches", "MapRows", "Filter", "Project", "Union", "Limit",
    "RandomizeBlocks",
})


def may_carry_degraded_blocks(ds: rd.Dataset) -> bool:
    """True when ``ds``'s logical plan could contain schema-less empty
    blocks (the VERDICT-r4 flake class: Acero's hash-join finalize dies
    with ``No match or multiple matches for key field reference`` when
    a zero-column pandas block from an upstream sort shuffle reaches
    it).  Conservative: unknown or un-introspectable ops count as
    degraded."""
    try:
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            if type(op).__name__ not in _SCHEMA_SAFE_OPS:
                return True
            stack.extend(op.input_dependencies)
        return False
    except Exception:
        return True


def purge_empty_blocks(ds: rd.Dataset, num_blocks: int) -> rd.Dataset:
    """Physically rebuild the block stream so every block carries the
    real schema.  ``repartition`` (split/merge, no key shuffle) drops
    empty input blocks entirely — verified: a sort-shuffle output with
    five zero-column pandas blocks repartitions to uniform well-schemed
    blocks.  Only called on join inputs whose plan may contain such
    blocks (see :func:`may_carry_degraded_blocks`), so pure
    read→map→filter pipelines pay nothing."""
    return ds.repartition(max(1, num_blocks))


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
              right_on: str | None = None, join_type: str = "inner",
              num_partitions: int = 32) -> rd.Dataset:
    """Hash-partitioned join for two large sides (Ray ``Dataset.join``).

    ``num_partitions`` is clamped to the cluster's CPU count: the join's
    hash-shuffle aggregator actors reserve CPUs up front, and asking for
    more aggregators than cores deadlocks the streaming executor on a
    small cluster (upstream map tasks and aggregators starve each
    other). Partition count never changes results, only fan-out.

    Each input whose plan may carry schema-less empty blocks (sort /
    aggregate upstream) is purged via :func:`purge_empty_blocks` before
    Acero sees it — the systemic guard for the r4 intermittent
    ``FieldRef.Name`` join failures.
    """
    cpus = int(ray.cluster_resources().get("CPU", num_partitions))
    num_partitions = max(2, min(num_partitions, cpus))
    if may_carry_degraded_blocks(left):
        left = purge_empty_blocks(left, num_partitions)
    if may_carry_degraded_blocks(right):
        right = purge_empty_blocks(right, num_partitions)
    left = left.map_batches(_strip_meta, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = right.map_batches(_strip_meta, batch_format="pyarrow",
                              zero_copy_batch=True)
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions,
                     on=(on,), right_on=(right_on or on,))


def attach_by_key(base: rd.Dataset, side: rd.Dataset, key: str,
                  payload_col: str, out_schema: pa.Schema,
                  approx_rows: int | None = None) -> rd.Dataset:
    """Inner-attach one payload column from ``side`` onto every ``base``
    row sharing ``key`` — the engine's tag-union exchange instead of
    Acero (`Dataset.join`), which intermittently dies on schema-less
    empty blocks from upstream sort shuffles (VERDICT r4 #1b).

    Shape: tag both sides, union, ONE salted hash exchange on ``key``,
    then a vectorized per-partition ``Series.map``.  The payload may be
    opaque ``bytes`` (serialized float64 vectors): the exchange sorts
    blocks only on the int64 partition id, so binary payload columns
    ride along untouched — unlike Acero, which rejects them.

    Partitioning assumption: all side rows + base rows of one key fit a
    partition block (bounded by the salted partitioner, same contract
    as every other keyed kernel).

    ``out_schema`` (required) pins the output block schema: a partition
    holding only side rows yields a 0-row frame that would otherwise
    miss the base columns, and the union-concat upcasts int base
    columns to float (NaN fill) — the pin reindexes + casts every
    kernel output back."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    out_cols = list(out_schema.names)

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__side"] = 0
        return df

    def tag_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: df[key], payload_col: df[payload_col],
                             "__side": 1})

    unioned = base.map_batches(tag_base, batch_format="pandas").union(
        side.map_batches(tag_side, batch_format="pandas"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        vm = df[df["__side"] == 1].set_index(key)[payload_col]
        lf = (df[df["__side"] == 0]
              .drop(columns=[payload_col], errors="ignore")
              .copy(deep=False))
        if len(lf) == 0:
            return lf.reindex(columns=out_cols)
        lf[payload_col] = lf[key].map(vm)
        return lf[lf[payload_col].notna()].reindex(columns=out_cols)

    return partitioned_map(unioned, kernel, keys=[key],
                           approx_rows=approx_rows,
                           out_schema=out_schema)


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


# --- Bloom-filter semi-join (no driver-held key set) ---------------------

def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k probe positions per 64-bit key hash via double hashing:
    ``pos_i = (h1 + i·h2) mod m`` with h1 = low 32 bits, h2 = high 32
    bits forced odd. Returns shape (len(h), k)."""
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def _bloom_key_hash(keys: np.ndarray) -> np.ndarray:
    """sha1-prefix 64-bit hash per key (house content-hash standard —
    process-independent, replicated by the golden oracle)."""
    import hashlib

    out = np.empty(len(keys), dtype=np.uint64)
    for j, key in enumerate(keys):
        out[j] = int.from_bytes(
            hashlib.sha1(str(key).encode()).digest()[:8], "big")
    return out


def bloom_semi_join(left: rd.Dataset, col: str, right: rd.Dataset,
                    right_col: str, m_bits: int = 1 << 20,
                    k: int = 7, merge_partitions: int = 8) -> rd.Dataset:
    """Semi-join where the right side's KEY SET never lands anywhere:
    each right batch folds its keys into an m-bit Bloom filter, the
    filters merge by elementwise OR (associative/commutative — the
    sketch contract of functions/sketches.py), and only the final
    m/8-byte filter is broadcast to the left-side probe actors.

    vs :func:`semi_join_filter`: the broadcast payload is O(m) bits
    regardless of right-side cardinality (a 10^9-key set would be
    driver-fatal; the bloom stays 128 KiB at the default m=2^20).
    Cost: deterministic false positives at the classic
    (1 - e^{-kn/m})^k rate — callers pick m for their n. The golden
    oracle replicates the exact spec, so results are reproducible
    bit-for-bit, FPs included.

    The OR-merge is two-level: one bloom per batch, a small shuffle to
    ``merge_partitions`` partial ORs, and the driver ORs those few
    rows — driver payload is merge_partitions × m/8 bytes, not
    one row per input block.
    """
    nbytes = m_bits // 8

    def build(batch: pa.Table) -> pa.Table:
        h = _bloom_key_hash(np.asarray(batch[right_col]))
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = _bloom_positions(h, m_bits, k).ravel()
        np.bitwise_or.at(bits, pos >> 3,
                         np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    def or_merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in df["bloom"]:
            np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame({"bloom": [acc.tobytes()]})

    from sits_classification_ray.stages.shuffle import partitioned_map

    partials = (right.select_columns([right_col])
                .map_batches(build, batch_format="pyarrow",
                             zero_copy_batch=True))
    # salt each single-row bloom to a random-ish partition: hash the
    # byte payload is pointless — use repartition, payload is tiny
    merged_rows = partitioned_map(
        partials.map_batches(
            lambda df: df.assign(_salt=np.arange(len(df)) % merge_partitions),
            batch_format="pandas"),
        or_merge, keys=["_salt"],
        num_partitions=merge_partitions).take_all()
    final = np.zeros(nbytes, dtype=np.uint8)
    for row in merged_rows:
        np.bitwise_or(final, np.frombuffer(row["bloom"], dtype=np.uint8),
                      out=final)
    bloom_ref = ray.put(final.tobytes())

    class Probe:
        def __init__(self):
            self.bits = np.frombuffer(ray.get(bloom_ref), dtype=np.uint8)

        def __call__(self, batch: pa.Table) -> pa.Table:
            h = _bloom_key_hash(np.asarray(batch[col]))
            pos = _bloom_positions(h, m_bits, k)
            hit = np.ones(len(h), dtype=bool)
            for i in range(k):
                p = pos[:, i]
                hit &= (self.bits[p >> 3]
                        >> (p & 7).astype(np.uint8)) & 1 > 0
            return batch.filter(pa.array(hit))

    return left.map_batches(Probe, batch_format="pyarrow",
                            concurrency=(1, 8), num_cpus=1)
