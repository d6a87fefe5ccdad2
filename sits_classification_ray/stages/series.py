"""Series assembly: per-url sort, first-wins dedup, singleton filter.

The one wide shuffle of the pipeline: co-locate each url's snapshots,
sort time-ascending and collapse duplicate timestamps first-wins — the
distributed re-expression of the reference's vectorized duplicate-date
dedup (``pytorch/predict.py:399-415``: int-encode dates,
``np.unique(..., return_index=True)``, keep first indices) and
singleton-series filter (``utils/class_run.py:154-156``).

Scale shape: the shuffle key is the bucket-major salted url partition
(stages/shuffle.py) — the FORCE-tile analog with explicit head-domain
salting — so the grouped UDF runs once per partition, a single
vectorized pandas kernel over many complete series, not once per url.
Python-level per-group dispatch over billions of urls would dominate
wall time; per-partition it is O(n_buckets·S) invocations of C-speed
sorts with the expected payload bounded by ``hot_key_threshold``.

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


def dedup_bucket(df: pd.DataFrame, min_series_len: int = 2) -> pd.DataFrame:
    """Vectorized assembly of one hash bucket: sort all series, dedup
    first-wins per (url, warc_ts), drop short series."""
    order = ["url", "warc_ts"] + [c for c in DEDUP_ORDER if c in df.columns]
    df = df.sort_values(order, kind="mergesort")
    df = df[~df.duplicated(["url", "warc_ts"], keep="first")]
    sizes = df.groupby("url", sort=False)["url"].transform("size")
    return df[sizes >= min_series_len]


def dedup_group(df: pd.DataFrame, min_series_len: int = 2) -> pd.DataFrame:
    """Single-url variant (kept for unit tests / kernel reuse)."""
    order = ["warc_ts"] + [c for c in DEDUP_ORDER if c in df.columns]
    df = df.sort_values(order, kind="mergesort")
    df = df[~df["warc_ts"].duplicated(keep="first")]
    if len(df) < min_series_len:
        return df.iloc[0:0]
    return df


def assemble_series(ds: rd.Dataset, cfg: EngineConfig | None = None,
                    num_partitions: int | None = None,
                    approx_rows: int | None = None) -> rd.Dataset:
    """Salted hash-partition by url → sorted, deduped, filtered
    per-url snapshots (vectorized kernel per partition block).

    The shuffle key is the url itself (complete series per partition),
    salted into ``≥ approx_rows / hot_key_threshold`` partitions so a
    head domain never lands one fat block on one worker."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    cfg = cfg or EngineConfig()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return dedup_bucket(df, cfg.min_series_len)

    return partitioned_map(ds, kernel, url_col="url",
                           n_buckets=cfg.n_buckets,
                           num_partitions=num_partitions,
                           approx_rows=approx_rows,
                           hot_key_threshold=cfg.hot_key_threshold)
