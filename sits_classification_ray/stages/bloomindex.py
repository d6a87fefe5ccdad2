"""Per-partition Bloom sidecar index for point-lookup pruning.

Storage-engineering companion to the zone-map manifest
(``state/manifest.py``, SURVEY S8/A8): zone maps prune RANGE reads,
but a point lookup on a high-cardinality key (url) still has to open
every partition whose [min, max] straddles the key. A tiny Bloom
filter per hive bucket (512 B at m=4096) answers "might this
partition contain the key?" with no false negatives, so a url lookup
opens ~1 bucket instead of 64.

Build shape: one streaming pass — each batch contributes a partial
Bloom per bucket it touches (bit-OR is commutative/associative/
idempotent, so batch-level dedup is unnecessary and merge order is
free), a (bucket) groupby OR-merges partials, and the driver holds
only n_buckets × m/8 bytes. Probing is driver-side bit tests.

Hashing reuses the house contracts: bucket = the engine's
``url_bucket_of`` SipHash mapping (what the hive layout actually uses)
and Bloom probes = sha1-prefix double hashing (``stages/joins.py``
``_bloom_positions``) — both process-independent, replicated by the
independent oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from sits_classification_ray.stages.joins import (_bloom_key_hash,
                                                  _bloom_positions)


def build_bucket_blooms(ds: rd.Dataset, url_col: str = "url",
                        n_buckets: int = 64, m_bits: int = 4096,
                        k: int = 4) -> pd.DataFrame:
    """(bucket, bloom bytes) frame — one Bloom sidecar per hive
    bucket over the dataset's distinct ``url_col`` values."""
    from sits_classification_ray.stages.extract import url_bucket_of

    def partial(batch: pa.Table) -> pd.DataFrame:
        urls = np.asarray(batch[url_col], dtype=object)
        buckets = np.asarray(url_bucket_of(batch[url_col], n_buckets),
                             dtype=np.int64)
        h = _bloom_key_hash(urls)
        pos = _bloom_positions(h, m_bits, k)
        out_b, out_blm = [], []
        for b in np.unique(buckets):
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            p = pos[buckets == b].ravel()
            np.bitwise_or.at(bits, p // 8,
                             (1 << (p % 8)).astype(np.uint8))
            out_b.append(int(b))
            out_blm.append(bits.tobytes())
        return pd.DataFrame({"bucket": np.array(out_b, dtype=np.int64),
                             "bloom": out_blm})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out_b, out_blm = [], []
        for b, sub in df.groupby("bucket", sort=True):
            acc = np.zeros(m_bits // 8, dtype=np.uint8)
            for blm in sub["bloom"]:
                acc |= np.frombuffer(blm, dtype=np.uint8)
            out_b.append(int(b))
            out_blm.append(acc.tobytes())
        return pd.DataFrame({"bucket": np.array(out_b, dtype=np.int64),
                             "bloom": out_blm})

    from sits_classification_ray.stages.shuffle import partitioned_map

    merged = partitioned_map(partials, merge, keys=["bucket"])
    return (merged.to_pandas()
            .sort_values("bucket", ignore_index=True))


def prune_lookup(blooms: pd.DataFrame, probe_urls: list[str],
                 n_buckets: int = 64, m_bits: int = 4096,
                 k: int = 4) -> pd.DataFrame:
    """Per probe url: its true hive bucket, how many buckets the Bloom
    sidecars admit as candidates, and whether the true bucket is among
    them (always 1 — Blooms have no false negatives)."""
    from sits_classification_ray.stages.extract import url_bucket_of

    urls = np.asarray(probe_urls, dtype=object)
    true_b = np.asarray(url_bucket_of(pa.array(urls), n_buckets),
                        dtype=np.int64)
    pos = _bloom_positions(_bloom_key_hash(urls), m_bits, k)
    mats = np.stack([np.unpackbits(
        np.frombuffer(blm, dtype=np.uint8), bitorder="little")
        for blm in blooms["bloom"]])          # (n_buckets, m_bits)
    bkt = blooms["bucket"].to_numpy(np.int64)
    n_cand = np.zeros(len(urls), dtype=np.int64)
    hit = np.zeros(len(urls), dtype=np.int64)
    for i in range(len(urls)):
        cand = mats[:, pos[i]].all(axis=1)
        n_cand[i] = int(cand.sum())
        hit[i] = int(bool(cand[bkt == true_b[i]].any()))
    return pd.DataFrame({"url": urls, "true_bucket": true_b,
                         "n_candidates": n_cand, "hit": hit})
