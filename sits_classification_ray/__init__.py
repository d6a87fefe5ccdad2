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

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
