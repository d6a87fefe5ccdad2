"""Hash-partitioned shuffle + whole-block grouped map, with explicit
salting for head-domain skew (the north_rule requirement).

``groupby(key).map_groups`` in Ray Data is sort-based: sample → sort →
range-partition, with a Python UDF dispatch per group. The engine's
bucket-level kernels only need *co-location by key* (every row of a
series in one block), not a global order, and they are vectorized over
whole blocks — so both the dispatch-per-group overhead and the
group-granularity are wrong for them.

:func:`partitioned_map` therefore shuffles on a **salted partition
id**: ``_part = hash(finest co-location key) % P``. Two consequences:

- **Skew (SURVEY §4, VERDICT r1 #1)**: the shuffle granularity is the
  *series* key (``url`` / ``(url, metric)``), never the coarse
  ``url_bucket``. A head domain that inflates one of 64 hash buckets
  into a multi-GB block under bucket-level shuffling is instead spread
  across partitions; the residual bound is the largest *single series*
  (irreducible for sequential per-series kernels — and vectorized, so
  a fat series degrades smoothly). ``P`` is sized from
  ``EngineConfig.hot_key_threshold``: with ``approx_rows`` known,
  ``P ≥ approx_rows / hot_key_threshold`` so the *expected* partition
  payload stays under the threshold at any scale.
- **Dispatch**: exactly ``P`` Python group calls (a controlled knob),
  each a single vectorized pandas kernel over several complete key
  groups — all engine kernels are correct for that shape (they
  sort/group within the block).

The partition hash is pandas' SipHash (fixed library key), identical
across workers/runs — required for deterministic resume.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import ray.data as rd


def default_num_partitions(approx_rows: int | None = None,
                           hot_key_threshold: int | None = None) -> int:
    """Partition count: ≥ 2× cluster CPUs for parallelism, scaled up so
    the average partition carries ≤ ``hot_key_threshold`` rows — and
    scaled DOWN when ``approx_rows`` says the input is small (iterative
    graph/state exchanges at test scale: 64 near-empty partitions cost
    ~50 ms of scheduling each, ×4 exchanges ×N iterations; a 500-row
    exchange wants P=1). The small-data clamp never binds once
    ``approx_rows ≥ 2000 × base``, so cluster-scale parallelism is
    untouched."""
    try:
        import ray
        base = max(64, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        base = 64
    if approx_rows:
        need = (-(-int(approx_rows) // int(hot_key_threshold))
                if hot_key_threshold else 1)
        small = max(1, -(-int(approx_rows) // 2000))
        return min(65536, max(need, min(base, small)))
    return base


def compact_state(ds: rd.Dataset, n_rows: int,
                  rows_per_block: int = 2000) -> rd.Dataset:
    """Re-block a MATERIALIZED state-sized dataset whose block count is
    pure scheduling overhead (iterative algorithms union these tables
    into every round's exchange, so tiny-block fan-in compounds per
    iteration). No-op at scale: only fires when the measured row count
    says blocks are near-empty, so a 100 TB table never repartitions."""
    target = max(1, -(-int(n_rows) // rows_per_block))
    if ds.num_blocks() > 2 * target:
        return ds.repartition(target).materialize()
    return ds


def salted_part(df: pd.DataFrame, keys: list[str], num_partitions: int
                ) -> np.ndarray:
    """Deterministic partition id per row from the co-location keys."""
    h = pd.util.hash_pandas_object(df[list(keys)], index=False,
                                   categorize=False).to_numpy()
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _salted_part_arrow(batch, keys: list[str], num_partitions: int):
    """Arrow-native variant: hash only the key column(s), append
    ``_part`` without converting the payload columns to pandas."""
    import pyarrow as pa

    if len(keys) == 1:
        col = batch[keys[0]]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        np_col = col.to_numpy(zero_copy_only=False)
        if np_col.dtype.kind in ("O", "U", "S"):
            np_col = np.asarray(np_col, dtype=object)
        h = pd.util.hash_array(np_col, categorize=False)
    else:
        h = pd.util.hash_pandas_object(
            batch.select(keys).to_pandas(), index=False,
            categorize=False).to_numpy()
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    # metadata inherited from pandas-block conversions makes pa.Schema
    # unhashable (pyarrow hashes metadata dicts) — strip before the
    # shuffle so reduce-side schema dedup/unify stays warning-free
    return batch.replace_schema_metadata(None).append_column(
        "_part", pa.array(part))


def salt_factor(approx_rows: int | None, hot_key_threshold: int | None,
                n_buckets: int) -> int:
    """Sub-buckets per url_bucket so the expected partition payload is
    ≤ hot_key_threshold rows: S = ⌈rows / (threshold · buckets)⌉."""
    if approx_rows and hot_key_threshold:
        return min(1024, max(1, -(-int(approx_rows)
                                  // (int(hot_key_threshold) * n_buckets))))
    return 1


def _bucket_major_part(batch, url_col: str, n_buckets: int, salts: int):
    """``_part = url_bucket·S + (independent bits of the same hash) % S``.

    Bucket-major layout: every partition block holds urls of exactly ONE
    url_bucket, so a partitioned parquet write emits S files per bucket
    directory instead of scattering every block across all directories
    (an S× file-count bound — the Ray-side analog of FORCE's fixed tile
    grid). The low bits reproduce ``extract.url_bucket_of`` exactly
    (same pandas SipHash), which is what keeps blocks and the hive
    layout aligned."""
    import pyarrow as pa

    col = batch[url_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    np_col = col.to_numpy(zero_copy_only=False)
    if np_col.dtype.kind in ("O", "U", "S"):
        np_col = np.asarray(np_col, dtype=object)
    h = pd.util.hash_array(np_col, categorize=False)
    part = (h % np.uint64(n_buckets)) * np.uint64(salts)
    if salts > 1:
        part = part + (h // np.uint64(n_buckets)) % np.uint64(salts)
    return batch.replace_schema_metadata(None).append_column(
        "_part", pa.array(part.astype(np.int64)))


def partitioned_map(
    ds: rd.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    keys: list[str] | None = None,
    num_partitions: int | None = None,
    approx_rows: int | None = None,
    hot_key_threshold: int | None = None,
    url_col: str | None = None,
    n_buckets: int = 64,
    out_schema: "pa.Schema | None" = None,
) -> rd.Dataset:
    """Co-locate complete key groups into salted partitions and map
    ``fn`` over each whole partition block (pandas in/out).

    Two partitioning modes:

    - ``url_col`` (the engine's series stages): bucket-major salted
      partitions — complete urls per partition, partition blocks
      aligned with the ``url_bucket`` hive layout, S sub-buckets per
      bucket scaled by ``hot_key_threshold``.
    - ``keys`` (generic): flat hash of the FINEST key whose groups the
      kernel needs complete (e.g. ``["id_a", "id_b"]`` for pair
      dedup). Partition count scaled by ``hot_key_threshold``.

    ``out_schema`` pins the Arrow schema of every output block. Ray's
    pandas→Arrow conversion infers types from VALUES, so a partition
    whose kernel output has an all-NaN float column becomes Arrow
    ``null`` type — unioned with double-typed blocks from other
    partitions that breaks schema unification. Pass the kernel's
    declared schema for any kernel that can emit all-null columns.
    """
    if url_col is not None:
        S = salt_factor(approx_rows, hot_key_threshold, n_buckets)

        def add_part(batch) -> "pa.Table":
            return _bucket_major_part(batch, url_col, n_buckets, S)
    else:
        keys = keys or ["url"]
        P = num_partitions or default_num_partitions(approx_rows,
                                                     hot_key_threshold)

        def add_part(batch) -> "pa.Table":
            return _salted_part_arrow(batch, keys, P)

    # Arrow in/out: only the key columns are hashed; the payload stays
    # zero-copy through this stage (the groupby sort converts once)
    salted = ds.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=["_part"]))

    ctx = rd.DataContext.get_current()
    if ctx.shuffle_strategy == rd.context.ShuffleStrategy.HASH_SHUFFLE:
        # fast path: direct hash exchange, kernel per whole partition
        nblocks = (n_buckets * salt_factor(approx_rows, hot_key_threshold,
                                           n_buckets)
                   if url_col is not None else
                   num_partitions or default_num_partitions(
                       approx_rows, hot_key_threshold))
        salted = salted.repartition(num_blocks=nblocks, keys=["_part"])
        out = salted.map_batches(kernel, batch_size=None,
                                 batch_format="pandas")
    else:
        # default path: sort-based groupby on the int64 partition id —
        # one group call per partition, each a vectorized kernel over
        # the block
        out = salted.groupby("_part").map_groups(kernel,
                                                 batch_format="pandas")
    if out_schema is None:
        return out.map_batches(_drop_empty_and_strip_meta,
                               batch_size=None, batch_format="pyarrow",
                               zero_copy_batch=True)

    def pin(batch):
        if batch.num_rows == 0:
            return
        batch = batch.replace_schema_metadata(None)
        if batch.schema != out_schema and set(batch.column_names) == set(
                out_schema.names):
            batch = batch.select(out_schema.names).cast(out_schema)
        yield batch

    return out.map_batches(pin, batch_size=None, batch_format="pyarrow",
                           zero_copy_batch=True)


def explode_long(batch, metrics) -> "pa.Table":
    """Wide per-snapshot metrics → long rows, inside one task (never as
    standalone blocks, whose 2× size could split past the block bound
    and break url-completeness mid-stream)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = []
    for m in metrics:
        parts.append(pa.table({
            "url": batch["url"],
            "url_bucket": batch["url_bucket"],
            "warc_ts": batch["warc_ts"],
            "metric": pa.array([m] * len(batch), pa.string()),
            "value": pc.cast(batch[m], pa.float64()),
        }))
    return pa.concat_tables(parts)


def colocated_map(
    ds: rd.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    explode_metrics: tuple[str, ...] | None = None,
) -> rd.Dataset:
    """Exchange-free sibling of :func:`partitioned_map` for inputs whose
    blocks ALREADY hold complete key groups: partitioned_map outputs
    still in memory, or bucket-major stage files re-read as whole files
    (``rollup_pipeline._read_stage(whole_files=True)`` — one read task
    per written partition file, unions of complete files stay
    complete). The engine partitions the hot path by url ONCE in
    assemble_series; every later per-series stage reuses that
    partitioning through this helper instead of re-shuffling.

    ``explode_metrics``: run :func:`explode_long` inside the task
    before the kernel (wide obs blocks in, long-format kernel)."""

    def kern(batch):
        import pyarrow as pa

        if batch.num_rows == 0:
            return
        if explode_metrics:
            batch = explode_long(batch, explode_metrics)
        out = fn(batch.to_pandas())
        if len(out):
            yield pa.Table.from_pandas(out, preserve_index=False) \
                .replace_schema_metadata(None)

    return ds.map_batches(kern, batch_size=None, batch_format="pyarrow",
                          zero_copy_batch=True)


def _drop_empty_and_strip_meta(batch):
    """Schema hygiene for the grouped-map output stream.

    Strips schema metadata from every output block: pandas-conversion
    metadata (attached when pandas blocks cross a shuffle boundary)
    makes ``pa.Schema`` unhashable, which breaks Ray's schema dedup and
    floods logs with 'Failed to hash the schemas' warnings whenever
    such blocks are written to parquet and read back.

    On empty blocks: Ray 2.49's sort shuffle emits SCHEMA-LESS empty
    blocks for key ranges that caught no rows, and every downstream map
    operator (including this one) passes them through WITHOUT calling
    the UDF — they cannot be dropped in-stream. They are benign:
    ``to_pandas()``, ``write_parquet`` and arrow collection all ignore
    them without dropping or null-padding columns (pinned by
    ``test_partitioned_map_schema_hygiene``); their only cost is a
    cosmetic 'RefBundle with a different schema' log line emitted by
    the executor at tiny data scales. The guard below also drops empty
    batches on the batch-coalescing path, where the UDF does run."""
    if batch.num_rows > 0:
        yield batch.replace_schema_metadata(None)
