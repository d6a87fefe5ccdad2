"""Training-feed surface: fixed-length padded windows + batch iterator.

The reference's DataLoader stage (``pytorch/train.py:39,300-302``:
ragged series are zero-padded to the batch max length with
``Pad_Value = 0`` and consumed as ``[B, L, D]`` tensors) re-expressed
over the gap-filled grid: each (url, metric) series is chunked into
fixed ``seq_len`` windows, padded with the pad value, and emitted as
one row per window with a validity mask — the exact collate layout a
trainer consumes via ``iter_batches``.

Scale shape: one salted-partition pass (complete series co-located),
numpy reshape per series run — no per-window Python. The list columns
are Arrow ``list<float64>`` / ``list<bool>``, so windows stream
through the object store like any other rows and
``Dataset.iter_batches`` yields ready training batches with no
driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.config import EngineConfig

PAD_VALUE = 0.0          # reference Pad_Value = 0 (transformer/Models.py:9)


def make_windows(grid_ds: rd.Dataset, seq_len: int,
                 cfg: EngineConfig | None = None,
                 value_col: str = "value",
                 ts_col: str = "grid_ts") -> rd.Dataset:
    """Grid rows → one row per fixed-length training window.

    Output: ``(url, metric, win_idx, t0, n_valid, values, mask)`` —
    ``values`` padded to ``seq_len`` with :data:`PAD_VALUE`, ``mask``
    true for real grid points (the attention-mask analog).
    """
    from sits_classification_ray.stages.gapfill import _series_bounds
    from sits_classification_ray.stages.shuffle import partitioned_map

    cfg = cfg or EngineConfig()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", ts_col], kind="mergesort")
        urls = df["url"].to_numpy()
        mets = df["metric"].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]")
        vals = df[value_col].to_numpy(np.float64)
        starts, ends = _series_bounds(urls, mets)
        rows = {"url": [], "metric": [], "win_idx": [], "t0": [],
                "n_valid": [], "values": [], "mask": []}
        for s, e in zip(starts, ends):
            n = e - s
            n_win = -(-n // seq_len)
            padded = np.full(n_win * seq_len, PAD_VALUE, dtype=np.float64)
            padded[:n] = vals[s:e]
            mask = np.zeros(n_win * seq_len, dtype=bool)
            mask[:n] = True
            for w in range(n_win):
                lo = w * seq_len
                rows["url"].append(urls[s])
                rows["metric"].append(mets[s])
                rows["win_idx"].append(w)
                rows["t0"].append(ts[s + lo])
                rows["n_valid"].append(int(min(seq_len, n - lo)))
                rows["values"].append(padded[lo:lo + seq_len])
                rows["mask"].append(mask[lo:lo + seq_len])
        out = pd.DataFrame(rows)
        out["win_idx"] = out["win_idx"].astype(np.int64)
        out["n_valid"] = out["n_valid"].astype(np.int64)
        return out

    return partitioned_map(grid_ds, kernel, url_col="url",
                           n_buckets=cfg.n_buckets,
                           hot_key_threshold=cfg.hot_key_threshold)


def iter_training_batches(windows_ds: rd.Dataset, batch_size: int = 256):
    """Yield ``{"X": [B, L] float64, "mask": [B, L] bool, "url": …}``
    numpy batches — the DataLoader-collate analog, streaming with
    backpressure (no driver materialization)."""
    for batch in windows_ds.iter_batches(batch_size=batch_size,
                                         batch_format="pandas"):
        yield {
            "X": np.stack(batch["values"].to_numpy()),
            "mask": np.stack(batch["mask"].to_numpy()),
            "url": batch["url"].to_numpy(),
            "metric": batch["metric"].to_numpy(),
            "t0": batch["t0"].to_numpy(),
            "n_valid": batch["n_valid"].to_numpy(),
        }


def pack_sequences(ds: rd.Dataset, max_tokens: int = 1024,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_blocks: int | None = None) -> rd.Dataset:
    """GPT-style sequence-packing layout: documents are concatenated in
    id order into ONE global token stream and chopped into fixed
    ``max_tokens`` training windows — documents may span window
    boundaries (the standard pretraining packing; zero padding waste,
    unlike per-document truncation).

    Output is the packing LAYOUT TABLE, one row per document: its
    token count, global stream offset (``tok_start``), the first/last
    window it occupies (``win_first``/``win_last``) and its offset
    inside the first window (``win_offset``) — everything a feed stage
    needs to emit packed windows without materializing the stream.

    Scale shape (same construction as :func:`stages.scan_sorted.
    global_rank`): tokens are counted per batch BEFORE the sort so the
    sorted stream is two narrow columns; ``Dataset.sort`` on the id
    range-partitions it; each sorted block reports ONE integer (its
    token total); the driver computes exclusive prefix offsets in
    O(blocks); one Ray task per block assigns offsets vectorized.
    Nothing driver-side scales with rows. Tokens are the whitespace
    split with empty tokens preserved (SQL ``string_split`` parity:
    ``n = count(' ') + 1 ≥ 1``, so ``win_last`` is defined for every
    document, including empty text).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def count_tokens(b: pa.Table) -> pa.Table:
        text = pc.cast(b[text_col], pa.string())
        n = pc.add(pc.count_substring(text, " "), 1)
        return pa.table({id_col: b[id_col],
                         "n_tokens": pc.cast(n, pa.int64())})

    counted = ds.map_batches(count_tokens, batch_format="pyarrow",
                             zero_copy_batch=True)
    if num_blocks:
        counted = counted.repartition(num_blocks)
    refs = counted.sort([id_col]).to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_total(t: pa.Table) -> int:
        # empty sort ranges arrive as SCHEMA-LESS tables — no columns
        if t.num_rows == 0:
            return 0
        return int(pc.sum(t["n_tokens"]).as_py() or 0)

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0.5)
    def assign(t: pa.Table, off: int) -> pa.Table:
        if len(t) == 0:
            return t
        n = t["n_tokens"].to_numpy()
        tok_start = off + np.concatenate(
            [[0], np.cumsum(n)[:-1]]).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": t["n_tokens"],
            "tok_start": pa.array(tok_start),
            "win_first": pa.array(tok_start // max_tokens),
            "win_last": pa.array((tok_start + n - 1) // max_tokens),
            "win_offset": pa.array(tok_start % max_tokens),
        })

    return rd.from_arrow_refs(
        [assign.remote(r, int(o)) for r, o in zip(refs, offsets)])
