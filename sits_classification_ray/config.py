"""Engine configuration — the carry-forward contract.

Analog of the reference's ``preprocess_settings.json`` (written once at
preprocessing time and re-loaded by every later stage so that semantics
can never drift between train and predict; see reference
``force/force_class_utils.py:107-114`` and ``pytorch/train.py:109-112``).
Here the same contract carries grid granularity, fill method, metric
list, tier definitions and partitioning constants from ingest to every
rollup/retention stage; it is serialized next to the outputs.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path

#: Grid/bucket granularities in seconds, keyed by tier name.
TIER_SECONDS = {
    "hourly": 3600,
    "daily": 86400,
    "weekly": 7 * 86400,
}

#: Re-aggregation chain: each tier is computed from the previous one's
#: partial aggregates (analog of FORCE folding FBD→FBW→FBM…,
#: reference force/skel/TSA_NoCom.prm:95-101).
TIER_CHAIN = ["hourly", "daily", "weekly"]


@dataclass
class EngineConfig:
    """All knobs a pipeline run depends on.

    Fields mirror the reference's settings surface (grid step = analog
    of ``INT_DAY``, reference ``class_main_2_train.py:21``; fill method
    = analog of ``Interpolation``/``INTERPOLATE``,
    ``class_main_2_train.py:20,31``; ``metrics`` = analog of
    ``feature_order``, ``class_main_2_train.py:45``).
    """

    # --- time grid -----------------------------------------------------
    grid_seconds: int = 3600          # equidistant grid step (hourly)
    fill_method: str = "linear"       # "linear" | "locf" | "none"
    # Edge behavior: "both" extends nearest-valid to both ends, exactly
    # pandas interpolate(limit_direction='both') as used by the
    # reference (utils/class_run.py:194). "none" leaves edges null.
    fill_edges: str = "both"

    # --- metrics -------------------------------------------------------
    metrics: tuple[str, ...] = ("text_len", "word_count")

    # --- partitioning --------------------------------------------------
    n_buckets: int = 64               # url hash buckets (analog of FORCE tiles)
    # Head-domain skew control (stages/shuffle.py): each url_bucket is
    # salted into S = ceil(rows / (n_buckets * hot_key_threshold))
    # sub-partitions during wide aggregations, so the expected shuffle
    # partition payload never exceeds this row count at any scale.
    hot_key_threshold: int = 1_000_000

    # --- rollup tiers --------------------------------------------------
    tiers: tuple[str, ...] = ("hourly", "daily", "weekly")

    # --- retention (downsample-and-expire) -----------------------------
    # max age in seconds per stored table (None = keep forever): raw
    # observations and the fine grid expire first, coarser aggregates
    # persist — the TimescaleDB-style retention ladder the north star
    # asks for. Applied by pipelines.rollup_pipeline.apply_retention.
    retention_seconds: dict | None = None

    # --- misc ----------------------------------------------------------
    seed: int = 42
    batch_size: int = 16384           # rows per map_batches batch
    min_series_len: int = 2           # singleton filter (utils/class_run.py:154-156)
    # zstd trades (well-scaling) CPU for (fixed-size) disk bandwidth —
    # the right trade for every tier/grid/segment sink
    parquet_compression: str = "zstd"

    def tier_seconds(self, tier: str) -> int:
        return TIER_SECONDS[tier]

    # --- (de)serialization — the carry-forward contract ---------------
    def save(self, path: str | Path) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(asdict(self), indent=2, default=list))

    @classmethod
    def load(cls, path: str | Path) -> "EngineConfig":
        raw = json.loads(Path(path).read_text())
        raw["metrics"] = tuple(raw.get("metrics", ()))
        raw["tiers"] = tuple(raw.get("tiers", ()))
        return cls(**raw)
