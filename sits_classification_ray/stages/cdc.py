"""Content-defined chunking (gear-hash CDC, the FastCDC/LBFS family)
and snapshot-over-snapshot chunk dedup.

Web archives store near-identical page snapshots; fixed-size blocks
miss duplicates after any insertion shifts the byte offsets, while
content-defined boundaries (cut where a rolling hash hits a mask)
realign after edits — the storage dedup layer a crawl store needs
(reference analog: the reference's parse-once cache avoids re-storing
unchanged per-tile arrays, ``pytorch/utils/Dataset.py:96-115``; CDC is
the byte-level generalization).

Determinism contract: the gear table is splitmix64 of the byte value
(pure function), the rolling hash is ``h_i = 2·h_{i−1} + gear[b_i]``
mod 2⁶⁴ — vectorized here as 64 shifted adds (terms older than 64
positions vanish mod 2⁶⁴), while the independent golden twin runs the
scalar recurrence; both give identical boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: gear table — splitmix64 of the byte value (public-domain constants)
_GEAR = None


def _gear_table() -> np.ndarray:
    global _GEAR
    if _GEAR is None:
        from sits_classification_ray.stages.als import _splitmix64

        _GEAR = _splitmix64(np.arange(256, dtype=np.uint64))
    return _GEAR


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Rolling gear hash at every position, vectorized: h_i =
    Σ_{j≤i} gear[b_j]·2^(i−j) mod 2⁶⁴ — only the last 64 terms
    survive mod 2⁶⁴, so the recurrence collapses to 64 shifted adds
    over the whole buffer (no per-byte Python)."""
    g = _gear_table()[data]
    h = np.zeros(len(data), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(64):
            if k >= len(data):
                break
            h[k:] += g[:len(data) - k] << np.uint64(k)
    return h


def cdc_boundaries(data: np.ndarray, mask: int = 0x3F,
                   min_size: int = 16, max_size: int = 256
                   ) -> np.ndarray:
    """Chunk end positions (exclusive): cut after position i when the
    rolling hash has ``mask`` low zero bits and the chunk is ≥
    min_size; force a cut at max_size; final partial chunk kept."""
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    h = gear_hashes(data)
    cand = np.flatnonzero((h & np.uint64(mask)) == 0)
    ends = []
    start = 0
    ci = 0
    while start < n:
        # next eligible candidate ≥ start + min_size
        ci = int(np.searchsorted(cand, start + min_size - 1))
        if ci < len(cand) and cand[ci] < start + max_size:
            end = int(cand[ci]) + 1
        else:
            end = min(start + max_size, n)
        ends.append(end)
        start = end
    return np.asarray(ends, dtype=np.int64)


def chunk_hashes(data: bytes, mask: int = 0x3F, min_size: int = 16,
                 max_size: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """(chunk 61-bit polynomial hashes, chunk lengths) of a buffer."""
    arr = np.frombuffer(data, dtype=np.uint8)
    ends = cdc_boundaries(arr, mask, min_size, max_size)
    starts = np.concatenate(([0], ends[:-1])).astype(np.int64)
    hashes = np.empty(len(ends), dtype=np.uint64)
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for i, (s, e) in enumerate(zip(starts, ends)):
            hv = np.uint64(0)
            for b in arr[s:e]:
                hv = hv * base + np.uint64(b)
            hashes[i] = hv & np.uint64((1 << 61) - 1)
    return hashes, (ends - starts)


def cdc_dedup_ratio(ds: rd.Dataset, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    payload_col: str = "html") -> rd.Dataset:
    """Per-snapshot chunk-level dedup against the PREVIOUS snapshot of
    the same url: shared bytes = Σ min(multiset counts) of equal chunk
    hashes weighted by chunk length. One salted exchange on url; the
    per-url scan is sequential in snapshot order (inherent — dedup is
    against the predecessor). Output: one row per snapshot ≥ 2nd with
    ``(n_chunks, total_bytes, shared_bytes, dedup_ratio)``."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    out_schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("n_chunks", pa.int64()), ("total_bytes", pa.int64()),
        ("shared_bytes", pa.int64()), ("dedup_ratio", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col, payload_col],
                            kind="mergesort") \
            .drop_duplicates([url_col, ts_col], keep="first")
        urls, tss, ncs, tots, shs, ratios = [], [], [], [], [], []
        for url, g in df.groupby(url_col, sort=False):
            prev: dict | None = None
            for ts, payload in zip(g[ts_col], g[payload_col]):
                hs, lens = chunk_hashes(payload or b"")
                cur: dict = {}
                for hv, ln in zip(hs.tolist(), lens.tolist()):
                    c, tot = cur.get(hv, (0, 0))
                    cur[hv] = (c + 1, tot + ln)
                if prev is not None:
                    shared = 0
                    for hv, (c, tot) in cur.items():
                        if hv in prev:
                            pc, ptot = prev[hv]
                            # min multiset count × chunk byte length
                            shared += min(c, pc) * (tot // c)
                    total = int(lens.sum())
                    urls.append(url)
                    tss.append(ts)
                    ncs.append(len(hs))
                    tots.append(total)
                    shs.append(shared)
                    ratios.append(shared / total if total else 0.0)
                prev = cur
        return pd.DataFrame({
            "url": pd.Series(urls, dtype=object),
            "warc_ts": pd.Series(np.asarray(tss, "datetime64[us]")),
            "n_chunks": pd.Series(ncs, dtype=np.int64),
            "total_bytes": pd.Series(tots, dtype=np.int64),
            "shared_bytes": pd.Series(shs, dtype=np.int64),
            "dedup_ratio": sql_round(np.asarray(ratios, np.float64),
                                     6) + 0.0})

    return partitioned_map(ds, kern, url_col=url_col,
                           out_schema=out_schema)
