"""Multimodal (binary-payload) columns: schema, actor stages, stubs.

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata — the pattern a 100 TB training-data pipeline needs.
The decode step itself requires codec libraries that are not in this
container, so the *decoders* are stubbed (deterministic fake or
``NotImplementedError``, clearly marked) while the Ray-side plumbing —
schema, actor-pool signature, batch sizing for wide rows, output
layout — is real and tested. The crawl table's ``html`` binary column
doubles as the test payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: Typed metadata schema for a multimodal asset table.
ASSET_SCHEMA = pa.schema([
    ("asset_id", pa.string()),
    ("kind", pa.string()),             # "image" | "audio" | "video" | "html"
    ("payload", pa.binary()),
    ("content_type", pa.string()),
    ("byte_len", pa.int64()),
])


class BinaryFeatureExtract:
    """Actor-pool stage: binary payload → numeric feature vector.

    Real decode (PIL / libsndfile / ffmpeg) is STUBBED: by default the
    stage computes deterministic byte-level features (length, entropy,
    byte-class histogram) that stand in for decoded-content features;
    ``strict=True`` raises ``NotImplementedError`` at the decode step
    instead, marking exactly where a codec would plug in.

    Wide binary rows need small batches — pass ``batch_size`` sized so
    ``batch_size × payload × concurrency`` fits the worker heap.
    """

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict
        # state built once per actor: byte→class lookup (T1 pattern)
        classes = np.zeros(256, dtype=np.int64)
        classes[9:14] = 1                  # whitespace
        classes[48:58] = 2                 # digits
        classes[65:91] = 3                 # upper
        classes[97:123] = 4                # lower
        self.byte_class = classes

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "real media decode needs codec libs absent from this "
                "container; deterministic byte features are the default")
        return np.frombuffer(payload, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((len(batch), 8), dtype=np.float64)
        payloads = batch[self.payload_col].to_pylist()
        for i, p in enumerate(payloads):
            data = self._decode(p or b"")
            n = len(data)
            feats[i, 0] = n
            if n == 0:
                continue
            counts = np.bincount(data, minlength=256)
            probs = counts[counts > 0] / n
            feats[i, 1] = float(-(probs * np.log2(probs)).sum())  # entropy
            cls = np.bincount(self.byte_class[data], minlength=5)
            feats[i, 2:7] = cls[:5] / n
            feats[i, 7] = float(counts.argmax())
        cols = {name: batch[name] for name in batch.schema.names
                if name != self.payload_col}
        cols["byte_len"] = pa.array(feats[:, 0].astype(np.int64))
        cols["entropy"] = pa.array(np.round(feats[:, 1], 6))
        for j, name in enumerate(["frac_other", "frac_ws", "frac_digit",
                                  "frac_upper", "frac_lower"]):
            cols[name] = pa.array(np.round(feats[:, 2 + j], 6))
        cols["mode_byte"] = pa.array(feats[:, 7].astype(np.int64))
        return pa.table(cols)


def binary_features(ds: rd.Dataset, payload_col: str = "payload",
                    batch_size: int = 1024,
                    concurrency: tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Feature-extract a binary column with an actor pool (small
    batches — wide rows)."""
    return ds.map_batches(
        BinaryFeatureExtract,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


class FrameSampler:
    """Video-style frame sampling over a binary payload (STUB decode).

    Deterministically slices the payload into ``n_frames`` equal spans
    (the fake "frames"); a real implementation would demux with ffmpeg.
    Output: one row per sampled frame with frame index + span bytes —
    the exact explode layout a real frame sampler would produce.
    """

    def __init__(self, n_frames: int = 4, payload_col: str = "payload",
                 id_col: str = "asset_id"):
        self.n_frames = n_frames
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, frames = [], [], []
        for aid, p in zip(df[self.id_col], df[self.payload_col]):
            p = p or b""
            span = max(1, len(p) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(aid)
                idxs.append(f)
                frames.append(p[f * span:(f + 1) * span])
        return pd.DataFrame({self.id_col: ids,
                             "frame_idx": np.array(idxs, dtype=np.int32),
                             "frame": frames})


def sample_frames(ds: rd.Dataset, n_frames: int = 4,
                  payload_col: str = "payload", id_col: str = "asset_id",
                  batch_size: int = 256) -> rd.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames,
                               "payload_col": payload_col,
                               "id_col": id_col},
        batch_format="pandas", batch_size=batch_size,
        concurrency=(1, 8), num_cpus=1)
