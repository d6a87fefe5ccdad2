"""sits_classification_ray — a Ray-Data-native time-series rollup,
downsample and retention engine over Common-Crawl-style web-page tables.

Built from scratch (NOT a port) with the query/data-processing
capabilities of LUP-LuftbildUmweltPlanung/SITS_classification, with the
domain transposed per SURVEY.md: pixel → url, acquisition date →
warc_ts, spectral bands → per-url metrics, FORCE interpolation →
gap-fill onto an equidistant grid, FORCE folding → hourly/daily/weekly
continuous aggregates, per-tile resume → per-partition lineage
checkpoints.

Everything is expressed as ``ray.data.Dataset`` pipelines:
``map_batches`` over zero-copy Arrow batches for extraction and
encoding, actor pools for stateful stages, and hash-partitioned
``groupby`` shuffles for series assembly and tier rollups.
"""

from sits_classification_ray.config import EngineConfig


import os


def tune_for_cluster() -> None:
    """Engine-level Ray Data defaults, sized to the current cluster.

    Default backend is the (battle-tested) sort-based shuffle. The
    hash-shuffle backend — a direct hash exchange with no sampling
    pass — is faster for the engine's key-partitioned stages but in
    Ray 2.49 deadlocks intermittently when a DAG chains several hash
    exchanges on a small cluster, so it is opt-in via
    ``SITS_HASH_SHUFFLE=1``. Contexts are captured at Dataset creation,
    so pipelines call this before building datasets (it also runs at
    import as a fallback).
    """
    try:
        import ray
        import ray.data as rd

        ctx = rd.DataContext.get_current()
        cpus = 8
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
        if os.environ.get("SITS_HASH_SHUFFLE") == "1":
            ctx.shuffle_strategy = rd.context.ShuffleStrategy.HASH_SHUFFLE
            # Ray's stock default of 200 shuffle partitions starves
            # small clusters (aggregator actors crowd out map tasks)
            ctx.default_hash_shuffle_parallelism = max(8, cpus)
            ctx.max_hash_shuffle_aggregators = 64
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
            ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
            ctx.min_hash_shuffle_aggregator_wait_time_in_s = 30
    except Exception:        # pragma: no cover - ray absent/too old
        pass


def _stub_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable even without
    aiohttp. Ray Data lazily does ``from fsspec.implementations.http
    import HTTPFileSystem`` on every path resolution; a failed import
    is not cached by Python, so two pipeline threads resolving paths
    concurrently race on the partially-initialized module and one gets
    an uncaught ImportError. A stub with a never-matching placeholder
    class makes the import succeed atomically and keeps Ray's
    ``isinstance`` check correctly False."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:          # placeholder; aiohttp is absent
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


tune_for_cluster()
_stub_fsspec_http()

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
