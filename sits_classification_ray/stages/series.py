"""Series assembly: per-url sort, first-wins dedup, singleton filter.

The one wide shuffle of the pipeline: co-locate each url's snapshots
(``groupby("url")``), then inside the group sort time-ascending and
collapse duplicate timestamps first-wins — the distributed
re-expression of the reference's vectorized duplicate-date dedup
(``pytorch/predict.py:399-415``: int-encode dates, ``np.unique(...,
return_index=True)``, keep first indices) and singleton-series filter
(``utils/class_run.py:154-156``).

"First" among exact-duplicate timestamps must be deterministic under
any physical row order, so the winner is the row that sorts first by
the metric columns (ties ⇒ identical rows). The DuckDB oracle mirrors
this with ``row_number() OVER (PARTITION BY url, warc_ts ORDER BY
text_len, word_count, lang)``.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from sits_classification_ray.config import EngineConfig

#: Deterministic tie-break order for duplicate (url, warc_ts) rows.
DEDUP_ORDER = ["text_len", "word_count", "lang"]


def dedup_group(df: pd.DataFrame, min_series_len: int = 2) -> pd.DataFrame:
    """Sort one url's snapshots, dedup first-wins, drop short series."""
    order = ["warc_ts"] + [c for c in DEDUP_ORDER if c in df.columns]
    df = df.sort_values(order, kind="mergesort")
    df = df[~df["warc_ts"].duplicated(keep="first")]
    if len(df) < min_series_len:
        return df.iloc[0:0]
    return df


def assemble_series(ds: rd.Dataset, cfg: EngineConfig | None = None) -> rd.Dataset:
    """groupby(url) → sorted, deduped, filtered per-url snapshots."""
    cfg = cfg or EngineConfig()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return dedup_group(df, cfg.min_series_len)

    return ds.groupby("url").map_groups(kernel, batch_format="pandas")
