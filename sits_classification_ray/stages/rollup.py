"""Continuous aggregates at hourly/daily/weekly retention tiers.

The core rollup — the Ray-Data-native re-expression of FORCE temporal
folding (``FOLD_TYPE = AVG`` and the FBY/FBQ/FBM/FBW/FBD outputs,
reference ``force/skel/TSA_NoCom.prm:95-101``), generalized to the full
aggregate set ``count/sum/min/max/mean/last`` per
``(url, metric, bucket_ts)``.

Scale design (SURVEY §4): a bare ``groupby().aggregate()`` would
shuffle every observation row. Instead:

1. **Partial aggregation inside ``map_batches``** — each Arrow batch is
   collapsed to one partial row per key via ``pyarrow``'s hash
   aggregation, so the shuffle moves partials, not observations
   (combiner pattern; the reference's `hist +=` confusion-matrix
   partials, ``pytorch/utils/classmetric.py:48-54``, are the same
   shape).
2. **Salted partition merge** — the bucket-major salted shuffle
   (stages/shuffle.py) co-locates each url's partials and merges every
   partition with one vectorized pandas groupby (one Python call per
   partition, not per key). ``last`` is merged by max contributing
   source timestamp (``last_src_ts``), which is unique per key after
   first-wins dedup, so the merge is deterministic and order-free —
   exactly what salting/re-aggregation requires.
3. **Tier chaining** — daily is re-aggregated from hourly partials and
   weekly from daily (sum of sums, min of mins, last by max
   ``last_src_ts``), never from raw observations. ``mean`` is
   finalized as ``sum/count`` only at output time, so cross-tier
   points are exactly re-aggregable.

All sums here are over integer-valued metrics (text_len, word_count),
so float summation order cannot perturb results — the cross-tier
exact-equality requirement (SURVEY §7.4) holds by construction; the
bucket merge additionally sums in sorted-key order for general floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from sits_classification_ray.config import EngineConfig

#: Internal partial-aggregate schema (what flows through shuffles).
PARTIAL_COLS = ["url_bucket", "url", "metric", "bucket_ts",
                "count", "sum", "min", "max", "last", "last_src_ts"]

#: Public tier-table schema (FIXTURES.md §3).
FINAL_COLS = ["url_bucket", "url", "metric", "bucket_ts",
              "count", "sum", "min", "max", "mean", "last"]


def floor_bucket(ts: pa.ChunkedArray | pa.Array, tier_seconds: int) -> pa.Array:
    """Epoch-aligned closed-left bucket floor.

    hourly/daily are plain epoch multiples; weekly floors to Monday
    (matching DuckDB/ISO ``date_trunc('week')``).
    """
    if tier_seconds == 7 * 86400:
        return pc.floor_temporal(ts, unit="week", week_starts_monday=True)
    if tier_seconds == 86400:
        return pc.floor_temporal(ts, unit="day")
    if tier_seconds % 3600 == 0:
        return pc.floor_temporal(ts, multiple=tier_seconds // 3600, unit="hour")
    return pc.floor_temporal(ts, multiple=tier_seconds, unit="second")


def partial_rollup_batch(batch: pa.Table, tier_seconds: int) -> pa.Table:
    """Collapse one long-format batch to per-key partial aggregates.

    Input: ``(url, url_bucket, metric, warc_ts, value)``.
    ``last`` within the batch is the value at max ``warc_ts`` per key —
    computed by sorting the batch once, then an ordered hash "last".
    """
    if len(batch) == 0:
        return _empty_partials()
    bucket_ts = pc.cast(floor_bucket(batch["warc_ts"], tier_seconds),
                        pa.timestamp("us"))
    t = pa.table({
        "url_bucket": batch["url_bucket"],
        "url": batch["url"],
        "metric": batch["metric"],
        "bucket_ts": bucket_ts,
        "warc_ts": batch["warc_ts"],
        "value": batch["value"],
    })
    t = t.sort_by([("url", "ascending"), ("metric", "ascending"),
                   ("warc_ts", "ascending")])
    g = t.group_by(["url_bucket", "url", "metric", "bucket_ts"],
                   use_threads=False)   # ordered aggregation for 'last'
    out = g.aggregate([
        ("value", "count"), ("value", "sum"), ("value", "min"),
        ("value", "max"), ("value", "last"), ("warc_ts", "max"),
    ])
    return out.rename_columns(PARTIAL_COLS)


def rebucket_partials_batch(batch: pa.Table, tier_seconds: int) -> pa.Table:
    """Re-aggregate finer-tier partials to a coarser bucket, per batch.

    ``last`` is carried from the partial with max ``last_src_ts``
    (unique per key after dedup), so chaining tiers loses nothing.
    """
    if len(batch) == 0:
        return _empty_partials()
    bucket_ts = pc.cast(floor_bucket(batch["bucket_ts"], tier_seconds),
                        pa.timestamp("us"))
    t = batch.set_column(batch.schema.get_field_index("bucket_ts"),
                         "bucket_ts", bucket_ts)
    t = t.sort_by([("url", "ascending"), ("metric", "ascending"),
                   ("last_src_ts", "ascending")])
    g = t.group_by(["url_bucket", "url", "metric", "bucket_ts"],
                   use_threads=False)
    out = g.aggregate([
        ("count", "sum"), ("sum", "sum"), ("min", "min"),
        ("max", "max"), ("last", "last"), ("last_src_ts", "max"),
    ])
    return out.rename_columns(PARTIAL_COLS)


def _empty_partials() -> pa.Table:
    return pa.table({
        "url_bucket": pa.array([], pa.uint32()),
        "url": pa.array([], pa.string()),
        "metric": pa.array([], pa.string()),
        "bucket_ts": pa.array([], pa.timestamp("us")),
        "count": pa.array([], pa.int64()),
        "sum": pa.array([], pa.float64()),
        "min": pa.array([], pa.float64()),
        "max": pa.array([], pa.float64()),
        "last": pa.array([], pa.float64()),
        "last_src_ts": pa.array([], pa.timestamp("us")),
    })


def merge_partials_pdf(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized merge of partial rows sharing keys (one hash bucket)."""
    df = df.sort_values(["url", "metric", "bucket_ts", "last_src_ts"],
                        kind="mergesort")
    g = df.groupby(["url_bucket", "url", "metric", "bucket_ts"],
                   sort=True, as_index=False)
    out = g.agg(
        count=("count", "sum"),
        sum=("sum", "sum"),
        min=("min", "min"),
        max=("max", "max"),
        last=("last", "last"),          # row with max last_src_ts (sorted)
        last_src_ts=("last_src_ts", "max"),
    )
    return out


def merge_partials(ds_partials: rd.Dataset) -> rd.Dataset:
    """Shuffle partials by the bucket-major salted url key and merge
    each partition vectorized. Skew is bounded twice over: upstream
    partial aggregation collapses a head url to one row per distinct
    (metric, bucket_ts) per batch, and the salted partitioning spreads
    buckets into sub-partitions when row counts demand it (the merge is
    re-aggregable — ``last`` merges by ``last_src_ts`` — so any
    partitioning is legal)."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(ds_partials, merge_partials_pdf, url_col="url")


def finalize(ds_partials: rd.Dataset) -> rd.Dataset:
    """Partial schema → public tier schema (adds mean, drops last_src_ts)."""

    def fin(batch: pa.Table) -> pa.Table:
        mean = pc.divide(pc.cast(batch["sum"], pa.float64()),
                         pc.cast(batch["count"], pa.float64()))
        t = batch.append_column("mean", mean)
        return t.select(FINAL_COLS)

    return ds_partials.map_batches(fin, batch_format="pyarrow")


def rollup(ds_long: rd.Dataset, tier_seconds: int,
           cfg: EngineConfig | None = None) -> rd.Dataset:
    """Observations (long) → merged partials at one tier (not finalized)."""
    cfg = cfg or EngineConfig()
    partials = ds_long.map_batches(
        partial_rollup_batch,
        fn_kwargs={"tier_seconds": tier_seconds},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    return merge_partials(partials)


def hopping_rollup(ds_long: rd.Dataset, window_seconds: int,
                   hop_seconds: int,
                   cfg: EngineConfig | None = None) -> rd.Dataset:
    """Sliding (hopping) window aggregate: one output row per
    (url, metric, window_start) for every hop-aligned window covering
    the observation.

    ``window_seconds`` must be a multiple of ``hop_seconds``; each
    observation then belongs to exactly ``window/hop`` windows.
    Scale shape: the m-fold duplication happens INSIDE the per-batch
    partial aggregation (each copy immediately collapses to one partial
    row per key), so the shuffle moves m partials per distinct key —
    never m copies of the observations. The tumbling rollup is the
    special case window == hop.
    """
    cfg = cfg or EngineConfig()
    if window_seconds % hop_seconds != 0:
        raise ValueError("window_seconds must be a multiple of hop_seconds")
    m = window_seconds // hop_seconds
    hop_us = hop_seconds * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_partials()
        ts = pc.cast(batch["warc_ts"], pa.int64())
        base = pc.multiply(pc.divide(ts, hop_us), hop_us)
        parts = []
        for i in range(m):
            ws = pc.cast(pc.subtract(base, i * hop_us),
                         pa.timestamp("us"))
            t = pa.table({
                "url_bucket": batch["url_bucket"],
                "url": batch["url"],
                "metric": batch["metric"],
                "bucket_ts": ws,
                "warc_ts": batch["warc_ts"],
                "value": batch["value"],
            })
            t = t.sort_by([("url", "ascending"), ("metric", "ascending"),
                           ("warc_ts", "ascending")])
            g = t.group_by(["url_bucket", "url", "metric", "bucket_ts"],
                           use_threads=False)
            parts.append(g.aggregate([
                ("value", "count"), ("value", "sum"), ("value", "min"),
                ("value", "max"), ("value", "last"), ("warc_ts", "max"),
            ]).rename_columns(PARTIAL_COLS))
        return pa.concat_tables(parts)

    partials = ds_long.map_batches(partial, batch_format="pyarrow",
                                   batch_size=cfg.batch_size,
                                   zero_copy_batch=True)
    return merge_partials(partials)


def reaggregate(ds_tier_partials: rd.Dataset, tier_seconds: int,
                cfg: EngineConfig | None = None) -> rd.Dataset:
    """Finer-tier merged partials → coarser-tier merged partials."""
    cfg = cfg or EngineConfig()
    rebucketed = ds_tier_partials.map_batches(
        rebucket_partials_batch,
        fn_kwargs={"tier_seconds": tier_seconds},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    return merge_partials(rebucketed)


# ---------------------------------------------------------------------------
# Co-located (exchange-free) tier chain
# ---------------------------------------------------------------------------
#
# The engine partitions the hot path by url ONCE — in assemble_series'
# salted exchange — and every artifact it writes afterwards PRESERVES
# that partitioning: partitioned_map emits whole-partition blocks, and
# the bucket-major writes put each block in one parquet file under its
# url_bucket directory. A tier input re-read as unions of COMPLETE
# files therefore already has every url's rows inside a single block,
# and the merge does not need a shuffle at all: partial-aggregate and
# merge inside ONE map task per block. This removes the all-to-all
# exchange from hourly, daily and weekly entirely (the classic
# "pick one partitioning key and reuse it across stages").
#
# Layout contract (enforced by the callers, documented here):
# - input blocks must be unions of complete bucket-major files —
#   `rollup_pipeline._read_stage(whole_files=True)` pins one read task
#   per file (`override_num_blocks = n_files`) so Ray never SPLITS a
#   file across blocks (merging several files into one task is safe);
# - written partition blocks stay under `hot_key_threshold` rows
#   (EngineConfig default 1e6 ≈ 60–80 MB), below Ray's 128 MB block
#   split threshold, so re-reads stay whole-file;
# - the merge math itself is re-aggregable (``last`` by max
#   ``last_src_ts``), so ANY url-complete blocking is legal.


def _merged_arrow(pdf: pd.DataFrame) -> pa.Table:
    """Merged-partials pandas → metadata-free Arrow (keeps downstream
    schema dedup warning-free and writes clean tier files)."""
    return pa.Table.from_pandas(pdf, preserve_index=False) \
        .replace_schema_metadata(None)


def rollup_colocated(ds_obs: rd.Dataset, tier_seconds: int,
                     metrics: tuple[str, ...],
                     cfg: EngineConfig | None = None) -> rd.Dataset:
    """Wide obs (url-complete blocks) → merged partials with NO
    exchange: one map task per block explodes to long format, partial-
    aggregates and merges — the wide→long doubling never materializes
    as standalone blocks (which could split past the 128 MB bound and
    break url-completeness mid-stream)."""

    def kern(batch: pa.Table):
        from sits_classification_ray.stages.shuffle import explode_long

        if len(batch) == 0:
            return
        partial = partial_rollup_batch(explode_long(batch, metrics),
                                       tier_seconds)
        if len(partial) == 0:
            return
        yield _merged_arrow(merge_partials_pdf(partial.to_pandas()))

    return ds_obs.map_batches(kern, batch_size=None,
                              batch_format="pyarrow", zero_copy_batch=True)


def reaggregate_colocated(ds_tier_partials: rd.Dataset, tier_seconds: int,
                          cfg: EngineConfig | None = None) -> rd.Dataset:
    """Finer-tier partials (url-complete blocks) → coarser tier with
    NO exchange (see layout contract above)."""

    def kern(batch: pa.Table):
        rebucketed = rebucket_partials_batch(batch, tier_seconds)
        if len(rebucketed) == 0:
            return
        yield _merged_arrow(merge_partials_pdf(rebucketed.to_pandas()))

    return ds_tier_partials.map_batches(kern, batch_size=None,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)
