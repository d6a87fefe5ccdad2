"""URL canonicalization — the crawl-pipeline normalization that makes
url-keyed dedup/rollup meaningful across syntactic variants.

Deterministic rules (the common-crawl-style canonical form):
lowercase scheme and host, drop default ports (80/http, 443/https),
empty path → "/", drop the fragment, sort query parameters
byte-lexicographically. Pure string work per row (inherent — URL
grammar is not vectorizable), wrapped in a stateless ``map_batches``
so it scales embarrassingly.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def canonicalize_url(url: str) -> str:
    try:
        p = urlsplit(url or "")
    except ValueError:
        return url
    scheme = p.scheme.lower()
    host = (p.hostname or "").lower()
    port = ""
    if p.port is not None and not (
            (scheme == "http" and p.port == 80)
            or (scheme == "https" and p.port == 443)):
        port = f":{p.port}"
    path = p.path or "/"
    query = ""
    if p.query:
        query = "?" + "&".join(sorted(p.query.split("&")))
    return f"{scheme}://{host}{port}{path}{query}"


def canonical_urls(ds: rd.Dataset, url_col: str = "url") -> rd.Dataset:
    """Attach the canonical form of ``url_col`` as ``canonical_url``."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["canonical_url"] = [canonicalize_url(u) for u in df[url_col]]
        return df

    return ds.map_batches(kernel, batch_format="pandas")


def url_filter(ds: rd.Dataset, blocked_domains: list[str],
               blocked_path_terms: list[str] | None = None,
               url_col: str = "url") -> rd.Dataset:
    """RefinedWeb/CCNet-style URL filtering — the curation stage that
    drops rows from blocklisted domains (spam/adult/SEO lists) and
    urls whose PATH contains a banned term, before any content-based
    processing spends compute on them.

    Scale shape: both lists are small and broadcast ONCE via
    ``ray.put``; membership is a vectorized Arrow regex extract +
    ``np.isin`` per batch — a pure map filter, no shuffle, run at the
    read so everything downstream sees only surviving rows.
    """
    import numpy as np
    import ray

    dom_ref = ray.put(np.unique(np.asarray(blocked_domains, dtype=str)))
    terms = tuple(blocked_path_terms or [])

    class Filt:
        def __init__(self):
            self.blocked = ray.get(dom_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = pc.extract_regex(batch[url_col],
                                 r"^[a-z]+://(?P<d>[^/]+)(?P<p>.*)")
            # malformed urls (no regex match) have no domain to block:
            # kept, like every public blocklist filter
            doms = pc.fill_null(pc.struct_field(m, "d"), "") \
                .to_numpy(zero_copy_only=False)
            keep = ~np.isin(doms.astype(str), self.blocked)
            if terms:
                paths = pc.fill_null(pc.struct_field(m, "p"), "")
                for t in terms:
                    keep &= ~pc.match_substring(paths, t).to_numpy(
                        zero_copy_only=False)
            return batch.filter(pa.array(keep))

    return ds.map_batches(Filt, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8),
                          num_cpus=1)


def regex_extract_rows(ds: rd.Dataset, col: str, pattern: str,
                       out_col: str, keep_cols: list[str]) -> rd.Dataset:
    """Flat-map regex extraction: one output row per match of
    ``pattern`` (group 1) in ``col`` — the link-graph / reference-
    mining shape. The regex compiles once per task invocation batch
    (module-level cache), matches vectorize via pandas ``str.findall``
    (C-backed), and the row expansion is one ``np.repeat`` — no
    per-match Python."""
    import re

    rx = re.compile(pattern)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        matches = df[col].str.findall(rx)
        counts = matches.str.len().fillna(0).astype(np.int64).to_numpy()
        idx = np.repeat(np.arange(len(df)), counts)
        flat = [m for row in matches for m in (row or [])]
        out = df.iloc[idx][keep_cols].reset_index(drop=True)
        out[out_col] = flat
        return out

    return ds.map_batches(extract, batch_format="pandas")
