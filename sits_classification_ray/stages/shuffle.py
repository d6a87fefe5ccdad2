"""Hash-partitioned shuffle + whole-block grouped map.

``groupby(key).map_groups`` in Ray Data is sort-based: sample → sort →
range-partition, with a Python UDF dispatch per group. For the
engine's bucket-level kernels that is wasted work twice over — the
kernels only need *co-location by key* (every row of a url_bucket in
one block), not a global order, and they are already vectorized over
whole buckets.

:func:`partitioned_map` hash-partitions by key (``Dataset.repartition
(keys=...)``, a direct hash exchange with no sampling pass) and runs
the kernel once per partition block (``batch_size=None`` = whole
block). Kernels must therefore be correct for a block holding
*several* complete key groups — all engine kernels are (they
sort/group within the block).

Skew note (SURVEY §4): a head url inflates one hash partition. The
kernels stay vectorized so a fat partition degrades smoothly;
``num_partitions`` larger than n_buckets spreads distinct buckets,
and upstream partial aggregation (rollup.py) bounds partition payloads
by distinct-key counts, not raw row counts.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import ray.data as rd


def partitioned_map(
    ds: rd.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    keys: list[str] | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Hash-partition ``ds`` by ``keys`` and map ``fn`` over each
    whole partition block (pandas in/out)."""
    keys = keys or ["url_bucket"]
    ctx = rd.DataContext.get_current()
    if ctx.shuffle_strategy == rd.context.ShuffleStrategy.HASH_SHUFFLE:
        # fast path: direct hash exchange, kernel per whole partition
        if num_partitions is None:
            try:
                import ray
                num_partitions = max(
                    16, int(ray.cluster_resources().get("CPU", 8)) * 2)
            except Exception:
                num_partitions = 64
        ds = ds.repartition(num_blocks=num_partitions, keys=keys)
        return ds.map_batches(fn, batch_size=None, batch_format="pandas")
    # default path: sort-based groupby on the bucket key; the kernel
    # sees one whole bucket per call (64 calls — still vectorized)
    key = keys[0] if len(keys) == 1 else list(keys)
    return ds.groupby(key).map_groups(fn, batch_format="pandas")
