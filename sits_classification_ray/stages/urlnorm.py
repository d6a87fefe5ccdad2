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


def _within_lev1(a: str, b: str) -> bool:
    """Exact levenshtein(a,b) <= 1 in O(n) — equal length: at most one
    substitution; length diff 1: one deletion bridges them."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    skipped = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif not skipped:
            skipped = True
            j += 1
        else:
            return False
    return True


def typo_pairs(ds: rd.Dataset, col: str = "url",
               max_block: int = 64) -> rd.Dataset:
    """Edit-distance-1 pairs via FastSS deletion-neighborhood
    blocking: each distinct string emits itself plus its 1-deletion
    variants as block keys; two strings within levenshtein 1 ALWAYS
    share a key (identity, deletion, or the common deletion of a
    substitution), so recall is exact. ``max_block`` star-caps
    degenerate blocks the same way the LSH bucket cap does. Candidate
    pairs verify with an exact O(n) distance check.

    A fourth candidate-generation method next to LSH / inverted index
    / sorted neighborhood — the blocking is structural (edit
    operations), not similarity-hash based."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        keys, vals = [], []
        for s in df[col].drop_duplicates():
            keys.append(s)
            vals.append(s)
            for i in range(len(s)):
                keys.append(s[:i] + s[i + 1:])
                vals.append(s)
        return pd.DataFrame({"k": keys, col: vals}).drop_duplicates()

    postings = ds.map_batches(explode, batch_format="pandas")

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("k", sort=False):
            ss = np.sort(g[col].drop_duplicates().to_numpy())
            if len(ss) < 2:
                continue
            if len(ss) > max_block:
                outs.append(pd.DataFrame({"a": np.full(len(ss) - 1, ss[0]),
                                          "b": ss[1:]}))
                continue
            i, j = np.triu_indices(len(ss), k=1)
            outs.append(pd.DataFrame({"a": ss[i], "b": ss[j]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)})
        return pd.concat(outs, ignore_index=True)

    cand = partitioned_map(postings, block_pairs, keys=["k"])
    cand = partitioned_map(cand, lambda df: df.drop_duplicates(["a", "b"]),
                           keys=["a", "b"])

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        keep = [_within_lev1(a, b) for a, b in zip(df["a"], df["b"])]
        out = df[np.asarray(keep, bool)] if len(df) else df
        return out.rename(columns={"a": "url_a", "b": "url_b"})

    return cand.map_batches(verify, batch_format="pandas")


def regex_extract_pairs(ds: rd.Dataset, col: str, pattern: str,
                        out_cols: tuple[str, str],
                        keep_cols: list[str]) -> rd.Dataset:
    """Two-group flat-map regex extraction: one output row per match,
    both capture groups as columns (the anchor-mining shape:
    ``<a href="(G1)">(G2)</a>``). Same vectorized findall + np.repeat
    expansion as :func:`regex_extract_rows`."""
    import re

    rx = re.compile(pattern)
    a_col, b_col = out_cols

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        matches = df[col].str.findall(rx)
        counts = matches.str.len().fillna(0).astype(np.int64).to_numpy()
        idx = np.repeat(np.arange(len(df)), counts)
        flat_a = [m[0] for row in matches for m in (row or [])]
        flat_b = [m[1] for row in matches for m in (row or [])]
        out = df.iloc[idx][keep_cols].reset_index(drop=True)
        out[a_col] = pd.Series(flat_a, dtype=object)
        out[b_col] = pd.Series(flat_b, dtype=object)
        return out

    return ds.map_batches(extract, batch_format="pandas")
