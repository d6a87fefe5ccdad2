"""Unbounded-series gap-fill: sort + boundary-halo exchange.

The salted-partition gap-fill (stages/gapfill.py) co-locates complete
series, so its per-task payload is bounded below by the LARGEST SINGLE
series — fine up to ~10^7 snapshots per url, the documented "breaks
first" limit (docs/SCALE.md #1). This variant removes that bound:

1. ``Dataset.sort`` on (url, metric, warc_ts) → range-partitioned
   blocks; a huge series simply spans several consecutive blocks.
2. **Boundary exchange**: one tiny Ray task per block extracts its
   first/last observation rows (2 rows per block — the halo a linear
   interpolation needs across a cut). The driver assembles the
   neighbor map (2·B rows total, independent of data size).
3. One Ray task per block runs the numpy gap-fill kernel over the
   block plus its two halo rows, emitting only the grid points the
   block OWNS: those at or after the ceil-grid of the block's first
   observation of that series, and before the ceil-grid of the next
   block's first observation (so cuts never duplicate or drop points;
   the block containing a series' last observation owns through its
   floor-grid end).

Raw Ray tasks are justified here: the Dataset API cannot express a
per-partition halo exchange (this is the distributed-merge_asof shape;
prompt rule (c)). Partitioning assumption: ONE BLOCK fits a worker —
nothing about any series.

Semantics are bit-identical to :func:`stages.gapfill.gapfill` with
``method="linear"``/``"locf"``/``"none"`` and ``edges="both"``:
np.interp clamps to the nearest provided point, and every interior cut
provides the true previous/next observations via the halo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.stages.gapfill import gapfill_series

_KEY = ["url", "metric"]


def _block_boundaries(t: pa.Table) -> pa.Table:
    """First and last row of a sorted block (its halo contribution)."""
    if len(t) == 0:
        return t
    return pa.concat_tables([t.slice(0, 1), t.slice(len(t) - 1, 1)])


def _fill_block(t: pa.Table, left_halo: dict | None, right_halo: dict | None,
                grid_seconds: int, method: str) -> pa.Table:
    """Gap-fill one sorted block with neighbor halos; emit owned grid."""
    df = t.to_pandas()
    step_us = grid_seconds * 1_000_000

    def key_of(row) -> tuple:
        return (row["url"], row["metric"])

    out_frames = []
    for (url, metric), g in df.groupby(_KEY, sort=False):
        ts = g["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g["value"].to_numpy(np.float64)
        bucket = g["url_bucket"].iloc[0]

        # attach halos when the SAME series continues past the cut
        lo_own = ts[0]
        hi_own_excl = None                  # None = own through series end
        if left_halo is not None and key_of(left_halo) == (url, metric):
            ts = np.concatenate(([np.datetime64(left_halo["warc_ts"], "us")
                                  .astype(np.int64)], ts))
            vals = np.concatenate(([left_halo["value"]], vals))
        if right_halo is not None and key_of(right_halo) == (url, metric):
            nxt = np.datetime64(right_halo["warc_ts"], "us").astype(np.int64)
            ts = np.concatenate((ts, [nxt]))
            vals = np.concatenate((vals, [right_halo["value"]]))
            hi_own_excl = nxt               # next block owns from ceil(nxt)

        grid, out, filled = gapfill_series(ts, vals, grid_seconds,
                                           method, "both")
        own_lo = -(-int(lo_own) // step_us) * step_us       # ceil to grid
        mask = grid >= own_lo
        if hi_own_excl is not None:
            own_hi = -(-int(hi_own_excl) // step_us) * step_us
            mask &= grid < own_hi
        grid, out, filled = grid[mask], out[mask], filled[mask]
        out_frames.append(pd.DataFrame({
            "url": url,
            "url_bucket": np.uint32(bucket),
            "metric": metric,
            "grid_ts": grid.astype("datetime64[us]"),
            "value": out,
            "filled": filled,
        }))
    if not out_frames:
        return pa.table({
            "url": pa.array([], pa.string()),
            "url_bucket": pa.array([], pa.uint32()),
            "metric": pa.array([], pa.string()),
            "grid_ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
            "filled": pa.array([], pa.bool_()),
        })
    return pa.Table.from_pandas(pd.concat(out_frames, ignore_index=True),
                                preserve_index=False)


def gapfill_unbounded(ds_long: rd.Dataset, cfg: EngineConfig | None = None,
                      num_blocks: int | None = None) -> rd.Dataset:
    """Gap-fill with NO per-series size bound (sort + halo exchange)."""
    cfg = cfg or EngineConfig()
    srt = ds_long
    if num_blocks:
        srt = srt.repartition(num_blocks)
    srt = srt.sort(["url", "metric", "warc_ts"])
    block_refs = [r for r in srt.to_arrow_refs()]

    @ray.remote(num_cpus=0.25)
    def boundaries(t: pa.Table) -> pa.Table:
        return _block_boundaries(t)

    bounds = ray.get([boundaries.remote(r) for r in block_refs])
    # neighbor map from the tiny boundary rows (2 per block)
    first_rows: list[dict | None] = []
    last_rows: list[dict | None] = []
    for b in bounds:
        if len(b) == 0:
            first_rows.append(None)
            last_rows.append(None)
        else:
            rows = b.to_pylist()
            first_rows.append(rows[0])
            last_rows.append(rows[-1])

    @ray.remote(num_cpus=1)
    def fill(t: pa.Table, left, right, grid_seconds: int,
             method: str) -> pa.Table:
        return _fill_block(t, left, right, grid_seconds, method)

    out_refs = []
    n = len(block_refs)
    for i, r in enumerate(block_refs):
        # nearest non-empty neighbors
        left = next((last_rows[j] for j in range(i - 1, -1, -1)
                     if last_rows[j] is not None), None)
        right = next((first_rows[j] for j in range(i + 1, n)
                      if first_rows[j] is not None), None)
        out_refs.append(fill.remote(r, left, right, cfg.grid_seconds,
                                    cfg.fill_method))
    return rd.from_arrow_refs(out_refs)
