"""Document deduplication suite: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shapes (SURVEY §4, ray_guide "Aggregation at scale"):

- **Exact**: content-hash per batch (vectorized) → partial
  (hash, min_id, count) per batch → tiny ``groupby(hash)`` merge. The
  shuffle moves 24-byte partials, never document bodies.
- **MinHash-LSH**: shingle → minhash signature per batch → explode to
  (band_id, band_hash, doc_id) rows → ``groupby(band)`` buckets →
  candidate pairs inside each bucket → exact Jaccard verify. Only
  bucket collisions are ever paired.
- **SimHash**: 64-bit hyperplane sketch per doc, stateless batch map.
- **Embedding cosine**: normalized vectors, per-batch matmul against a
  broadcast matrix (small side) or blockwise self-join (general).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def _sha1_u64(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(
            hashlib.sha1((t or "").encode()).digest()[:8], "big")
    return out


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """Group identical texts; keep min id as survivor + copy count.

    Returns ``(id_col, n_copies)`` — one row per distinct text.
    SQL-parity: ``SELECT min(doc_id), count(*) FROM docs GROUP BY text``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        h = _sha1_u64(batch[text_col].to_pylist())
        df = pd.DataFrame({"h": h, id_col: batch[id_col].to_numpy()})
        g = df.groupby("h", as_index=False).agg(
            **{id_col: (id_col, "min"), "n_copies": (id_col, "size")})
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: [df[id_col].min()],
            "n_copies": [df["n_copies"].sum()],
        })

    out = partials.groupby("h").map_groups(merge, batch_format="pandas")
    return out.select_columns([id_col, "n_copies"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Stateful signature stage: permutation parameters drawn once per
    actor from a fixed seed (identical across actors/runs)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 seed: int = 1, id_col: str = "doc_id",
                 text_col: str = "text"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        t = text or ""
        if len(t) < self.k:
            shingles = {t}
        else:
            shingles = {t[i:i + self.k] for i in range(len(t) - self.k + 1)}
        hs = np.fromiter(
            (int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")
             & ((1 << 61) - 1) for s in shingles),
            dtype=np.uint64, count=len(shingles))
        # (a*h + b) mod p for all permutations at once: [P, S] matrix min
        vals = (self.a[:, None] * hs[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col]])
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "signature": list(sigs),
        })


def minhash_signatures(ds: rd.Dataset, num_perm: int = 64, shingle_k: int = 5,
                       seed: int = 1, id_col: str = "doc_id",
                       text_col: str = "text",
                       concurrency=(1, 8)) -> rd.Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed, id_col=id_col,
                                   text_col=text_col),
        batch_format="pandas", concurrency=concurrency, num_cpus=1)


def lsh_candidate_pairs(sig_ds: rd.Dataset, bands: int = 16,
                        id_col: str = "doc_id") -> rd.Dataset:
    """Signatures → banded buckets → unique candidate pairs (a < b)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(df["signature"].to_numpy())
        n, p = sigs.shape
        rows_per = p // bands
        outs = []
        for b in range(bands):
            chunk = sigs[:, b * rows_per:(b + 1) * rows_per]
            # process-independent hash (Python hash() is salted per
            # process and would split buckets across workers)
            bh = np.array(
                [int.from_bytes(hashlib.sha1(c.tobytes()).digest()[:8],
                                "big") >> 1 for c in chunk],
                dtype=np.int64)
            outs.append(pd.DataFrame({
                "band": b, "band_hash": bh,
                id_col: df[id_col].to_numpy()}))
        return pd.concat(outs, ignore_index=True)

    exploded = sig_ds.map_batches(explode, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    cand = exploded.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    return cand.groupby(["id_a", "id_b"]).map_groups(
        dedup_pairs, batch_format="pandas")


def verify_jaccard(pairs_ds: rd.Dataset, docs_ref, shingle_k: int = 5,
                   threshold: float = 0.0) -> rd.Dataset:
    """Exact shingle-Jaccard for candidate pairs.

    ``docs_ref`` is a ``ray.put`` handle to a dict {id: text} — the
    text side is broadcast, looked up in actor state (small-side join;
    at scale this becomes a hash-join against the docs table keyed by
    candidate ids instead).
    """
    import ray

    class Verify:
        def __init__(self):
            self.docs: dict = ray.get(docs_ref)
            self.k = shingle_k

        def _sh(self, t: str) -> set:
            if len(t) < self.k:
                return {t}
            return {t[i:i + self.k] for i in range(len(t) - self.k + 1)}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            jac = np.empty(len(df))
            for i, (a, b) in enumerate(zip(df["id_a"], df["id_b"])):
                sa, sb = self._sh(self.docs.get(a, "")), self._sh(self.docs.get(b, ""))
                inter = len(sa & sb)
                jac[i] = inter / max(1, len(sa) + len(sb) - inter)
            df = df.copy()
            df["jaccard"] = jac
            return df[df["jaccard"] >= threshold]

    return pairs_ds.map_batches(Verify, batch_format="pandas",
                                concurrency=(1, 4), num_cpus=1)


def ngram_jaccard_pairs(ds: rd.Dataset, shingle_k: int = 5,
                        num_perm: int = 64, bands: int = 16,
                        threshold: float = 0.5, id_col: str = "doc_id",
                        text_col: str = "text") -> rd.Dataset:
    """Full near-dup pipeline: minhash → LSH buckets → exact verify."""
    import ray

    sig = minhash_signatures(ds, num_perm, shingle_k, id_col=id_col,
                             text_col=text_col)
    cand = lsh_candidate_pairs(sig, bands, id_col=id_col)
    docs = {r[id_col]: r[text_col]
            for r in ds.select_columns([id_col, text_col]).take_all()}
    return verify_jaccard(cand, ray.put(docs), shingle_k, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over \\w+ tokens (token hash = sha1 prefix)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re
        self.word_re = re.compile(r"\w+")
        self.id_col = id_col
        self.text_col = text_col
        self.bit_cols = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        toks = self.word_re.findall((text or "").lower())
        if not toks:
            return np.uint64(0)
        hs = _sha1_u64(toks)
        bits = ((hs[:, None] >> self.bit_cols[None, :]) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        return np.uint64(((votes > 0).astype(np.uint64)
                          << self.bit_cols).sum())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "simhash": np.array([self.simhash(t) for t in df[self.text_col]],
                                dtype=np.uint64).astype(np.int64),
        })


def simhash(ds: rd.Dataset, id_col: str = "doc_id",
            text_col: str = "text", concurrency=(1, 8)) -> rd.Dataset:
    return ds.map_batches(SimHasher,
                          fn_constructor_kwargs=dict(id_col=id_col,
                                                     text_col=text_col),
                          batch_format="pandas", concurrency=concurrency,
                          num_cpus=1)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(ds: rd.Dataset, threshold: float = 0.95,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> rd.Dataset:
    """All pairs (a < b) with cosine ≥ threshold.

    The comparison side is broadcast once (``ray.put`` of the
    normalized matrix) and each batch does one float32 matmul against
    it — works whenever one side fits a worker (IVF-bucketed variant
    in stages/similarity.py is the scale path for self-joins).
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in full], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in full])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    class Pairs:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            q = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[vec_col]])
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ self.mat.T
            qi = df[id_col].to_numpy()
            rows_a, rows_b, vals = [], [], []
            for i in range(len(qi)):
                mask = (sims[i] >= threshold) & (self.ids > qi[i])
                rows_a.extend([qi[i]] * int(mask.sum()))
                rows_b.extend(self.ids[mask].tolist())
                vals.extend(sims[i][mask].tolist())
            return pd.DataFrame({"id_a": np.array(rows_a, dtype=np.int64),
                                 "id_b": np.array(rows_b, dtype=np.int64),
                                 "cos_sim": np.array(vals, dtype=np.float64)})

    return ds.map_batches(Pairs, batch_format="pandas",
                          concurrency=(1, 4), num_cpus=1)
