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

import pandas as pd
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
