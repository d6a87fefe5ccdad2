"""Product quantization (PQ) for billion-scale vector search
(Jégou, Douze & Schmid, TPAMI 2011 — the FAISS scale path).

The embedding space is split into ``m`` subspaces; each subspace gets
its own ``ks``-centroid codebook (Lloyd's k-means); every vector is
stored as ``m`` one-byte codes (64-float vector → 8 bytes), and a
query scans codes with an asymmetric-distance (ADC) lookup table —
``m`` table lookups + adds per candidate instead of a d-dim float op.

Ray-Data shape:

- codebook training is the same fixed-partition sorted-partial-sum
  Lloyd's loop as :func:`~sits_classification_ray.stages.similarity.kmeans_assign`,
  except ONE streaming pass per iteration updates ALL ``m`` codebooks
  (the kernel assigns every subvector of its partition against every
  codebook) — O(P·m·ks·d/m) = O(P·ks·d) partial rows to the driver;
- encoding is a stateless ``map_batches``;
- search broadcasts the per-query ADC tables (m·ks floats per query)
  and does a per-batch partial top-k → tiny merge, the
  :func:`brute_force_topk` combiner shape.

Determinism contract identical to ``kmeans_assign`` (fixed hash
partitions, id-sorted accumulation, (sub, cluster, dim, pid)-sorted
merge, argmin ties to the smaller code), so the golden oracle is
bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def train_pq_codebooks(ds: rd.Dataset, m: int = 8, ks: int = 16,
                       iterations: int = 3, num_partitions: int = 64,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> np.ndarray:
    """Train the ``(m, ks, d/m)`` codebook tensor with per-subspace
    Lloyd's k-means; seeds are the subvectors of the ``ks`` smallest
    ids. One streaming pass per iteration covers all subspaces."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    seed_df = ds.filter(expr=f"{id_col} < {ks}").to_pandas() \
        .sort_values(id_col)
    seeds = _stack(seed_df[vec_col])
    d = seeds.shape[1]
    sub_d = d // m
    C = np.stack([seeds[:, j * sub_d:(j + 1) * sub_d]
                  for j in range(m)])  # (m, ks, sub_d)
    P = num_partitions

    def make_partial(C_now: np.ndarray):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(id_col, kind="mergesort")
            X = _stack(df[vec_col])
            pid = int(pd.util.hash_array(
                df[id_col].to_numpy()[:1], categorize=False)[0]
                % np.uint64(P))
            frames = []
            for j in range(m):
                Xj = X[:, j * sub_d:(j + 1) * sub_d]
                Cj = C_now[j]
                d2 = (Xj ** 2).sum(1)[:, None] - 2.0 * (Xj @ Cj.T) \
                    + (Cj ** 2).sum(1)[None, :]
                a = np.argmin(d2, axis=1)
                acc = np.zeros((ks, sub_d), dtype=np.float64)
                np.add.at(acc, a, Xj)
                cnt = np.bincount(a, minlength=ks).astype(np.int64)
                f = pd.DataFrame({
                    "pid": np.repeat(np.int64(pid), ks * sub_d),
                    "sub": np.repeat(np.int64(j), ks * sub_d),
                    "cluster": np.repeat(np.arange(ks, dtype=np.int64),
                                         sub_d),
                    "dim": np.tile(np.arange(sub_d, dtype=np.int64),
                                   ks),
                    "s": acc.ravel(),
                    "n": np.repeat(cnt, sub_d),
                })
                frames.append(f[f["n"] > 0])
            return pd.concat(frames, ignore_index=True)

        return partial

    for _ in range(iterations):
        partials = partitioned_map(ds, make_partial(C), keys=[id_col],
                                   num_partitions=P).to_pandas()
        partials = partials.sort_values(["sub", "cluster", "dim", "pid"],
                                        kind="mergesort")
        g = partials.groupby(["sub", "cluster", "dim"], sort=True)
        s = g["s"].sum()
        n = g["n"].sum()
        C_new = C.copy()
        for (j, ci, di), sv in s.items():
            nv = n[(j, ci, di)]
            if nv > 0:
                C_new[j, ci, di] = sv / float(nv)
        C = C_new
    return C


def pq_encode(ds: rd.Dataset, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding",
              passthrough: list[str] | None = None) -> rd.Dataset:
    """Encode vectors to ``m`` int64 code columns (``code0..codeN``);
    ``passthrough`` columns (e.g. an IVF list id) are carried along."""
    m, ks, sub_d = codebooks.shape
    cb_ref = ray.put(codebooks)
    extra = list(passthrough or [])

    class Encode:
        def __init__(self):
            self.C = ray.get(cb_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            X = _stack(df[vec_col])
            out = {id_col: df[id_col].to_numpy()}
            for c in extra:
                out[c] = df[c].to_numpy()
            for j in range(m):
                Xj = X[:, j * sub_d:(j + 1) * sub_d]
                Cj = self.C[j]
                d2 = (Xj ** 2).sum(1)[:, None] - 2.0 * (Xj @ Cj.T) \
                    + (Cj ** 2).sum(1)[None, :]
                out[f"code{j}"] = np.argmin(d2, axis=1).astype(np.int64)
            return pd.DataFrame(out)

    return ds.map_batches(Encode, batch_format="pandas",
                          concurrency=(1, 8), num_cpus=1)


def pq_topk(codes: rd.Dataset, codebooks: np.ndarray,
            queries: dict[int, np.ndarray], k: int = 10,
            id_col: str = "vec_id", round_to: int = 6) -> rd.Dataset:
    """ADC top-k: per query, the (m·ks) distance table is broadcast;
    each batch sums table lookups over its code columns and keeps its
    local k smallest; the global merge moves ≤ k rows per batch."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.sampling import top_k_per_group

    m, ks, sub_d = codebooks.shape
    q_ids = sorted(queries)
    tables = np.stack([
        np.stack([((np.asarray(queries[q], dtype=np.float64)
                    [j * sub_d:(j + 1) * sub_d][None, :]
                    - codebooks[j]) ** 2).sum(1)
                  for j in range(m)])
        for q in q_ids])  # (nq, m, ks)
    ref = ray.put((np.asarray(q_ids, dtype=np.int64), tables))

    class Scan:
        def __init__(self):
            self.q_ids, self.tables = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            codes_np = np.stack([df[f"code{j}"].to_numpy()
                                 for j in range(m)], axis=1)  # (n, m)
            outs = []
            for qi, qid in enumerate(self.q_ids):
                tab = self.tables[qi]  # (m, ks)
                d2 = tab[np.arange(m)[None, :], codes_np].sum(1)
                kk = min(k, len(df))
                idx = np.argpartition(d2, kk - 1)[:kk]
                outs.append(pd.DataFrame({
                    "query_id": np.repeat(qid, kk),
                    id_col: df[id_col].to_numpy()[idx],
                    "adc_d2": sql_round(d2[idx], round_to),
                }))
            return pd.concat(outs, ignore_index=True)

    scored = codes.map_batches(Scan, batch_format="pandas",
                               concurrency=(1, 8), num_cpus=1)
    return top_k_per_group(scored, ["query_id"], "adc_d2", k=k,
                           ascending=True, tie_col=id_col)


def ivfpq_topk(ds: rd.Dataset, queries: dict[int, np.ndarray],
               n_lists: int = 8, n_probe: int = 3, m: int = 8,
               ks: int = 16, iterations: int = 3, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_to: int = 6) -> rd.Dataset:
    """IVF-PQ (the FAISS IVFADC index): coarse IVF centroids partition
    the vectors into lists; PQ codes quantize them; a query probes its
    ``n_probe`` nearest lists and ADC-scans only those codes — the
    composition that makes billion-vector search tractable (scan
    fraction ≈ n_probe/n_lists, memory m bytes/vector).

    Simplification (documented, shared with the golden oracle): PQ
    codebooks are trained on the RAW vectors, not per-list residuals.
    Coarse assignment/probing happens in the normalized (cosine)
    space, matching :func:`~sits_classification_ray.stages.similarity.ivf_topk`;
    the fine ADC distance is L2 on raw vectors.
    """
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.sampling import top_k_per_group
    from sits_classification_ray.stages.similarity import (_normalize,
                                                           ivf_assign,
                                                           train_centroids)

    cent = train_centroids(ds, n_lists=n_lists, iters=5,
                           id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(ds, cent, id_col=id_col, vec_col=vec_col)
    cb = train_pq_codebooks(ds, m=m, ks=ks, iterations=iterations,
                            id_col=id_col, vec_col=vec_col)
    codes = pq_encode(assigned, cb, id_col=id_col, vec_col=vec_col,
                      passthrough=["ivf_list"])

    sub_d = cb.shape[2]
    q_ids = sorted(queries)
    q_mat = np.stack([np.asarray(queries[q], dtype=np.float64)
                      for q in q_ids])
    probe = np.argsort(-(_normalize(q_mat) @ cent.T),
                       axis=1)[:, :n_probe]
    tables = np.stack([
        np.stack([((q_mat[qi][j * sub_d:(j + 1) * sub_d][None, :]
                    - cb[j]) ** 2).sum(1) for j in range(m)])
        for qi in range(len(q_ids))])
    ref = ray.put((np.asarray(q_ids, dtype=np.int64), probe, tables))

    class Scan:
        def __init__(self):
            self.q_ids, self.probe, self.tables = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            codes_np = np.stack([df[f"code{j}"].to_numpy()
                                 for j in range(m)], axis=1)
            lists_np = df["ivf_list"].to_numpy()
            outs = []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(lists_np, self.probe[qi])
                if not mask.any():
                    continue
                sub = codes_np[mask]
                d2 = self.tables[qi][np.arange(m)[None, :], sub].sum(1)
                kk = min(k, len(sub))
                idx = np.argpartition(d2, kk - 1)[:kk]
                outs.append(pd.DataFrame({
                    "query_id": np.repeat(qid, kk),
                    id_col: df[id_col].to_numpy()[mask][idx],
                    "adc_d2": sql_round(d2[idx], round_to),
                }))
            if not outs:
                return pd.DataFrame({
                    "query_id": pd.Series(dtype=np.int64),
                    id_col: pd.Series(dtype=np.int64),
                    "adc_d2": pd.Series(dtype=np.float64)})
            return pd.concat(outs, ignore_index=True)

    scored = codes.map_batches(Scan, batch_format="pandas",
                               concurrency=(1, 8), num_cpus=1)
    return top_k_per_group(scored, ["query_id"], "adc_d2", k=k,
                           ascending=True, tie_col=id_col)
