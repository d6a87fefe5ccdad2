"""Approximate/exact nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch float64 matmul against a
broadcast query matrix (``ray.put`` once, read in actor ``__init__``),
partial top-k per batch, tiny final merge. Scale path: IVF — k-means
coarse centroids assign each vector to a list; queries only scan the
``n_probe`` nearest lists, so each batch scans a fraction of the data.

Both stages follow the broadcast-small-side rule (ray_guide "Joins and
lookups"): the query matrix / centroid table never re-ships per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _partial_topk(sims: np.ndarray, ids: np.ndarray, query_ids: np.ndarray,
                  k: int) -> pd.DataFrame:
    """Per-batch top-k rows for each query: (query_id, vec_id, score)."""
    out_q, out_v, out_s = [], [], []
    kk = min(k, sims.shape[1])
    for qi in range(sims.shape[0]):
        idx = np.argpartition(-sims[qi], kk - 1)[:kk]
        out_q.extend([query_ids[qi]] * kk)
        out_v.extend(ids[idx].tolist())
        out_s.extend(sims[qi][idx].tolist())
    return pd.DataFrame({"query_id": np.array(out_q, dtype=np.int64),
                         "vec_id": np.array(out_v, dtype=np.int64),
                         "score": np.array(out_s, dtype=np.float64)})


def brute_force_topk(ds: rd.Dataset, queries: dict[int, np.ndarray],
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     round_to: int | None = 6) -> pd.DataFrame:
    """Exact cosine top-k for each query vector (deterministic order).

    Results ranked by (rounded score desc, vec_id asc) so ordering is
    stable under float-summation differences across engines.
    """
    q_ids = np.array(sorted(queries), dtype=np.int64)
    q_mat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64)
                                 for q in q_ids]))
    ref = ray.put((q_ids, q_mat))

    class Score:
        def __init__(self):
            self.q_ids, self.q_mat = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
            sims = self.q_mat @ mat.T
            return _partial_topk(sims, df[id_col].to_numpy(), self.q_ids, k)

    partials = ds.map_batches(Score, batch_format="pandas",
                              concurrency=(1, 8), num_cpus=1).to_pandas()
    if round_to is not None:
        partials["score"] = partials["score"].round(round_to)
    partials = partials.sort_values(
        ["query_id", "score", "vec_id"],
        ascending=[True, False, True], kind="mergesort")
    return (partials.groupby("query_id", sort=True, as_index=False)
            .head(k).reset_index(drop=True))


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the 100 TB scale path
# ---------------------------------------------------------------------------


def train_centroids(ds: rd.Dataset, n_lists: int = 16, iters: int = 10,
                    seed: int = 0, vec_col: str = "embedding",
                    sample_frac: float | None = None,
                    max_sample_rows: int = 100_000,
                    id_col: str | None = None) -> np.ndarray:
    """Mini k-means on a BOUNDED sample (driver-side Lloyd; assignment
    at scale stays distributed).

    The driver only ever holds ``max_sample_rows`` vectors: with no
    explicit ``sample_frac`` the fraction is derived from the dataset
    row count so the expected sample is capped (VERDICT r1 #10 — the
    old default materialized the whole dataset). Pass ``id_col`` to
    sort the sample by id before seeding — Ray block arrival order is
    not deterministic, and the seeded ``rng.choice`` must pick the
    same vectors on every run for resumable/verifiable centroids."""
    if sample_frac is None:
        n = ds.count()
        sample_frac = 1.0 if n <= max_sample_rows else max_sample_rows / n
    sample = ds if sample_frac >= 1.0 else ds.random_sample(sample_frac,
                                                            seed=seed)
    cols = [vec_col] if id_col is None else [id_col, vec_col]
    rows = sample.select_columns(cols).limit(max_sample_rows).take_all()
    if id_col is not None:
        rows.sort(key=lambda r: r[id_col])
    mat = _normalize(np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in rows]))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_lists, len(mat)),
                          replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = mat[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(ds: rd.Dataset, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """Attach the IVF list id to every vector (stateless matmul)."""
    ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.cent = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
            df = df.copy()
            df["ivf_list"] = np.argmax(mat @ self.cent.T, axis=1).astype(np.int32)
            return df

    return ds.map_batches(Assign, batch_format="pandas",
                          concurrency=(1, 8), num_cpus=1)


def ivf_topk(assigned: rd.Dataset, centroids: np.ndarray,
             queries: dict[int, np.ndarray], k: int = 10, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_to: int | None = 6) -> pd.DataFrame:
    """Top-k scanning only each query's ``n_probe`` nearest lists."""
    q_ids = np.array(sorted(queries), dtype=np.int64)
    q_mat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64)
                                 for q in q_ids]))
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe]
    wanted_lists = np.array(
        sorted({int(l) for row in probe for l in row}), dtype=np.int64)
    sub = assigned.map_batches(
        lambda df: df[np.isin(df["ivf_list"].to_numpy(), wanted_lists)],
        batch_format="pandas")
    probe_of = {int(q): set(map(int, probe[i])) for i, q in enumerate(q_ids)}
    ref = ray.put((q_ids, q_mat, probe_of))

    class Score:
        def __init__(self):
            self.q_ids, self.q_mat, self.probe_of = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
            sims = self.q_mat @ mat.T
            lists = df["ivf_list"].to_numpy()
            outs = []
            for qi, q in enumerate(self.q_ids):
                mask = np.isin(lists, list(self.probe_of[int(q)]))
                if not mask.any():
                    continue
                outs.append(_partial_topk(
                    sims[qi:qi + 1, mask], df[id_col].to_numpy()[mask],
                    np.array([q]), k))
            if not outs:
                return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                     "vec_id": pd.Series([], dtype=np.int64),
                                     "score": pd.Series([], dtype=np.float64)})
            return pd.concat(outs, ignore_index=True)

    partials = sub.map_batches(Score, batch_format="pandas",
                               concurrency=(1, 8), num_cpus=1).to_pandas()
    if round_to is not None:
        partials["score"] = partials["score"].round(round_to)
    partials = partials.sort_values(
        ["query_id", "score", "vec_id"],
        ascending=[True, False, True], kind="mergesort")
    return (partials.groupby("query_id", sort=True, as_index=False)
            .head(k).reset_index(drop=True))


def label_centroids(ds: rd.Dataset, vec_col: str = "embedding",
                    label_col: str = "label", ndigits: int = 6
                    ) -> rd.Dataset:
    """Per-label centroid of the embedding column, long format
    ``(label, dim, mean_val)`` — the class-prototype primitive
    (nearest-centroid classification, semantic cluster summaries).

    Scale shape: each batch folds its rows into one (labels_present ×
    D) partial-sum matrix via a single ``np.add.at`` scatter, emitting
    only L·D (label, dim, sum, n) rows per batch; the shuffle then
    moves sketch-sized partials, never vectors, and the merge is Ray's
    native Sum. Means are rounded to ``ndigits`` because distributed
    partial sums re-associate float addition (documented oracle-parity
    exception)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"label": pd.Series([], dtype=np.int64),
                                 "dim": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.float64),
                                 "n": pd.Series([], dtype=np.int64)})
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in df[vec_col]])
        labels = df[label_col].to_numpy(np.int64)
        u, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(u), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv).astype(np.int64)
        d = mat.shape[1]
        return pd.DataFrame({
            "label": np.repeat(u, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(u)),
            "s": sums.ravel(),
            "n": np.repeat(counts, d)})

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = partials.groupby(["label", "dim"]).aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "label": df["label"].to_numpy(np.int64),
            "dim": df["dim"].to_numpy(np.int64),
            "mean_val": (df["s"] / df["n"]).round(ndigits)})

    return merged.map_batches(finish, batch_format="pandas")


def nearest_centroid_predict(ds: rd.Dataset, centroids_long: rd.Dataset,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             ndigits: int = 6) -> rd.Dataset:
    """Classify each vector by its nearest label centroid (squared
    euclidean), ``(id_col, pred_label)`` — nearest-class-mean
    classification over the ``label_centroids`` output.

    The centroid table is tiny (L·D rows): collected once, pivoted to
    an (L, D) matrix, ``ray.put`` once and read by every map task —
    never re-shipped per batch. Distances are computed as one
    ``(B,L)`` matmul-expansion per batch. d² is rounded to ``ndigits``
    before the argmin and ties break toward the smaller label, which
    pins the same winner the SQL twin's ``ORDER BY round(d2,6),
    label`` picks despite re-associated float sums."""
    cent = centroids_long.to_pandas()
    labels = np.sort(cent["label"].unique()).astype(np.int64)
    d = int(cent["dim"].max()) + 1
    mat = np.zeros((len(labels), d), dtype=np.float64)
    pos = {int(l): i for i, l in enumerate(labels)}
    mat[[pos[int(l)] for l in cent["label"]],
        cent["dim"].to_numpy(np.int64)] = cent["mean_val"].to_numpy()
    ref = ray.put((labels, mat))

    class Predict:
        def __init__(self):
            self.labels, self.cent = ray.get(ref)
            self.c2 = (self.cent ** 2).sum(axis=1)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            x = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[vec_col]])
            d2 = ((x ** 2).sum(axis=1)[:, None]
                  - 2.0 * (x @ self.cent.T) + self.c2[None, :])
            # labels ascending → np.argmin's first-min rule IS the
            # smaller-label tie-break
            best = np.argmin(d2.round(ndigits), axis=1)
            return pd.DataFrame({
                id_col: df[id_col].to_numpy(np.int64),
                "pred_label": self.labels[best]})

    return ds.map_batches(Predict, batch_format="pandas",
                          concurrency=(1, 8), num_cpus=1)


# --- distributed Lloyd's k-means (full data, not a sample) ---------------

def kmeans_fit(ds: rd.Dataset, k: int = 8, iterations: int = 5,
               num_partitions: int = 64, id_col: str = "vec_id",
               vec_col: str = "embedding",
               seeds: "np.ndarray | None" = None) -> np.ndarray:
    """Full-dataset Lloyd's k-means centroid fit: every iteration
    streams ALL vectors through an assignment + partial-sum pass; only
    O(P·k·d) partial rows ever reach the driver (the standard scalable
    k-means shape — contrast :func:`train_centroids`, which clusters a
    bounded driver-side sample for IVF seeding).

    Returns the final ``(k, d)`` centroid matrix under the same
    determinism contract as :func:`kmeans_assign` (which delegates
    here).

    Determinism contract (bit-exact under any block order, enabling a
    golden-file oracle for an iterative float algorithm):

    - seeds = the vectors with the ``k`` smallest ids;
    - partials are computed per FIXED hash partition
      (``hash(id) % num_partitions`` — pinned, NOT CPU-derived), rows
      sorted by id inside the partition, per-cluster sums accumulated
      in that row order (``np.add.at``);
    - the tiny merge sums partition partials sorted by
      (cluster, dim, partition id);
    - argmin ties break to the smaller cluster index (np.argmin).

    Empty clusters keep their previous centroid.
    """
    from sits_classification_ray.stages.shuffle import partitioned_map

    if seeds is not None:
        # caller-provided (k, d) seed matrix — used when ids are not
        # dense 0..n-1 (e.g. hashed series keys: seeds = the vectors
        # with the k SMALLEST ids, fetched via sort+limit)
        C = np.asarray(seeds, dtype=np.float64).copy()
    else:
        seed_df = ds.filter(expr=f"{id_col} < {k}").to_pandas() \
            .sort_values(id_col)
        C = np.stack([np.asarray(v, dtype=np.float64)
                      for v in seed_df[vec_col]])
    d = C.shape[1]
    P = num_partitions

    def make_partial(C_now: np.ndarray):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(id_col, kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[vec_col]])
            d2 = (X ** 2).sum(1)[:, None] - 2.0 * (X @ C_now.T) \
                + (C_now ** 2).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            # partition id: same single-key hash the exchange used
            pid = int(pd.util.hash_array(
                df[id_col].to_numpy()[:1], categorize=False)[0]
                % np.uint64(P))
            acc = np.zeros((k, d), dtype=np.float64)
            np.add.at(acc, a, X)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            rows = {
                "pid": np.repeat(np.int64(pid), k * d),
                "cluster": np.repeat(np.arange(k, dtype=np.int64), d),
                "dim": np.tile(np.arange(d, dtype=np.int64), k),
                "s": acc.ravel(),
                "n": np.repeat(cnt, d),
            }
            out = pd.DataFrame(rows)
            return out[out["n"] > 0]

        return partial

    for _ in range(iterations):
        partials = partitioned_map(
            ds, make_partial(C), keys=[id_col],
            num_partitions=P).to_pandas()
        partials = partials.sort_values(["cluster", "dim", "pid"],
                                        kind="mergesort")
        g = partials.groupby(["cluster", "dim"], sort=True)
        s = g["s"].sum()
        n = g["n"].sum()
        C_new = C.copy()
        for (ci, di), sv in s.items():
            nv = n[(ci, di)]
            if nv > 0:
                C_new[ci, di] = sv / float(nv)
        C = C_new

    return C


def kmeans_assign(ds: rd.Dataset, k: int = 8, iterations: int = 5,
                  num_partitions: int = 64, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> rd.Dataset:
    """Final cluster assignment ``(id, cluster)`` of the
    :func:`kmeans_fit` centroids (argmin ties to the smaller cluster
    index)."""
    C_fin = kmeans_fit(ds, k=k, iterations=iterations,
                       num_partitions=num_partitions, id_col=id_col,
                       vec_col=vec_col)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df[vec_col]])
        d2 = (X ** 2).sum(1)[:, None] - 2.0 * (X @ C_fin.T) \
            + (C_fin ** 2).sum(1)[None, :]
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "cluster": np.argmin(d2, axis=1)
                             .astype(np.int64)})

    return ds.map_batches(assign, batch_format="pandas")


def semdedup(ds: rd.Dataset, k: int = 8, iterations: int = 5,
             tau: float = 0.45, num_partitions: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> rd.Dataset:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
    cluster the embedding space, then within each cluster greedily
    drop vectors whose cosine similarity to an already-kept vector is
    ≥ ``tau``. Returns ``(id, cluster, keep)`` with keep ∈ {0, 1}.

    Scale shape — the whole point of the paper's design: the O(n²)
    pairwise cosine never happens globally, only inside a cluster
    (``partitioned_map`` on the cluster id co-locates complete
    clusters; cluster count k scales with corpus size to bound the
    per-cluster quadratic term). Centroids are O(k·d), shipped in the
    kernel closure.

    Determinism contract (bit-exact, golden-file-oracle-able):
    :func:`kmeans_fit` centroids are deterministic; within a cluster,
    vectors are processed farthest-from-centroid first (ascending
    cosine to the L2-normalized centroid — the paper keeps
    low-centroid-similarity representatives), ties broken by ascending
    id; a candidate is kept iff its max cosine against the kept set is
    < ``tau``; every float op is fixed-order float64."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    C = kmeans_fit(ds, k=k, iterations=iterations,
                   num_partitions=num_partitions, id_col=id_col,
                   vec_col=vec_col)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df[vec_col]])
        d2 = (X ** 2).sum(1)[:, None] - 2.0 * (X @ C.T) \
            + (C ** 2).sum(1)[None, :]
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "cluster": np.argmin(d2, 1).astype(np.int64),
                             vec_col: df[vec_col]})

    assigned = ds.map_batches(assign, batch_format="pandas")

    def greedy(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c in np.unique(df["cluster"].to_numpy()):
            sub = df[df["cluster"] == c].sort_values(id_col,
                                                     kind="mergesort")
            ids = sub[id_col].to_numpy(np.int64)
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in sub[vec_col]])
            nrm = np.sqrt((X ** 2).sum(1))
            nrm[nrm == 0.0] = 1.0
            Xn = X / nrm[:, None]
            cc = C[int(c)]
            cn = np.sqrt((cc ** 2).sum())
            ccn = cc / (cn if cn > 0 else 1.0)
            cosc = Xn @ ccn
            order = np.lexsort((ids, cosc))
            keep = np.zeros(len(ids), dtype=bool)
            kept: list[int] = []
            for i in order:
                if kept and float((Xn[kept] @ Xn[i]).max()) >= tau:
                    continue
                keep[i] = True
                kept.append(i)
            outs.append(pd.DataFrame({
                id_col: ids,
                "cluster": np.full(len(ids), np.int64(c)),
                "keep": keep.astype(np.int64)}))
        if not outs:
            return pd.DataFrame({id_col: np.array([], np.int64),
                                 "cluster": np.array([], np.int64),
                                 "keep": np.array([], np.int64)})
        return pd.concat(outs, ignore_index=True)

    return partitioned_map(assigned, greedy, keys=["cluster"],
                           num_partitions=min(num_partitions, 4 * k))


# ---------------------------------------------------------------------------
# Signed-random-projection (SRP) LSH near-dup for cosine
# ---------------------------------------------------------------------------


def _srp_matrix(dim: int, bits: int, seed: int) -> np.ndarray:
    """The projection matrix is part of the operator SPEC: any
    implementation (including the independent golden oracle) draws the
    identical Gaussian matrix from this seed."""
    return np.random.default_rng(seed).standard_normal((dim, bits))


def srp_band_rows(ds: rd.Dataset, dim: int, bits: int = 128,
                  bands: int = 8, seed: int = 13,
                  id_col: str = "vec_id", vec_col: str = "embedding"
                  ) -> rd.Dataset:
    """(id, band, band_hash) rows: sign bits of a seeded Gaussian
    projection, packed per band — one batched matmul per block, the
    projection shipped once per actor via ``ray.put``.

    Band width = bits/bands sets the recall/candidate-volume
    trade-off: at 16-bit bands a cos≈0.99 pair collides in ≥1 of 8
    bands w.p. ≈0.99; bucket count 2^16 per band keeps candidate
    buckets small at corpus scale (wider bands for bigger corpora)."""
    width = bits // bands
    R_ref = ray.put(_srp_matrix(dim, bits, seed))
    weights = (1 << np.arange(width, dtype=np.int64))

    class Sig:
        def __init__(self):
            self.R = ray.get(R_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
            sign = (mat @ self.R) > 0                  # [n, bits]
            n = len(df)
            ids = np.repeat(df[id_col].to_numpy(), bands)
            band_id = np.tile(np.arange(bands, dtype=np.int64), n)
            bh = (sign.reshape(n * bands, width) @ weights).astype(np.int64)
            return pd.DataFrame({id_col: ids, "band": band_id, "bh": bh})

    return ds.map_batches(Sig, batch_format="pandas",
                          concurrency=(1, 8), num_cpus=1)


def srp_near_dup(ds: rd.Dataset, dim: int, threshold: float = 0.9,
                 bits: int = 128, bands: int = 8, seed: int = 13,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 max_bucket_size: int | None = None) -> rd.Dataset:
    """Approximate cosine near-dup: SRP-LSH bucketed candidates →
    EXACT cosine verify (vectors re-attached via two distributed
    joins, cosine recomputed in float64 and rounded to 6).

    The LSH sibling of the exact blockwise self-join
    (``dedup_docs.embedding_near_dup``) and the IVF-bucketed variant —
    candidate volume is driven by band collisions, never O(n²).
    Recall < 1 by construction (documented LSH miss probability);
    precision is exact thanks to the verify pass."""
    from sits_classification_ray.stages.joins import attach_by_key
    from sits_classification_ray.stages.shuffle import partitioned_map

    rows = srp_band_rows(ds, dim, bits, bands, seed, id_col, vec_col)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby(["band", "bh"], sort=False):
            ids = np.sort(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            if max_bucket_size is not None and len(ids) > max_bucket_size:
                outs.append(pd.DataFrame({
                    "id_a": np.full(len(ids) - 1, ids[0]), "id_b": ids[1:]}))
                continue
            a, b = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"id_a": ids[a], "id_b": ids[b]}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    cand = partitioned_map(rows, bucket_pairs, keys=["band", "bh"])
    cand = partitioned_map(cand,
                           lambda df: df.drop_duplicates(["id_a", "id_b"]),
                           keys=["id_a", "id_b"])

    # vector attach via the tag-union exchange (joins.attach_by_key),
    # vectors serialized to float64 bytes for the ride (the exchange
    # sorts only on the partition id, so binary payloads pass through;
    # Acero `Dataset.join` was the r4 flake site — schema-less empty
    # blocks from the candidate sort shuffle intermittently broke its
    # key-field resolution) — decoded zero-copy with np.frombuffer
    def as_side(new_id: str, new_vec: str):
        def prj(df: pd.DataFrame) -> pd.DataFrame:
            mat = np.stack(df[vec_col].to_numpy()).astype(np.float64)
            return pd.DataFrame({
                new_id: df[id_col].astype(np.int64).to_numpy(),
                new_vec: [r.tobytes() for r in mat]})
        return prj

    va = ds.map_batches(as_side("id_a", "__va"), batch_format="pandas")
    vb = ds.map_batches(as_side("id_b", "__vb"), batch_format="pandas")
    import pyarrow as pa
    sch_a = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("__va", pa.binary())])
    sch_b = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("__va", pa.binary()), ("__vb", pa.binary())])
    with_a = attach_by_key(cand, va, key="id_a", payload_col="__va",
                           out_schema=sch_a)
    with_b = attach_by_key(with_a, vb, key="id_b", payload_col="__vb",
                           out_schema=sch_b)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df):
            va = np.stack([np.frombuffer(b, np.float64)
                           for b in df["__va"]])
            vb = np.stack([np.frombuffer(b, np.float64)
                           for b in df["__vb"]])
            na = np.linalg.norm(va, axis=1)
            nb = np.linalg.norm(vb, axis=1)
            cos = (va * vb).sum(axis=1) / np.maximum(na * nb, 1e-30)
        else:
            cos = np.empty(0)
        out = df.drop(columns=["__va", "__vb"]).copy(deep=False)
        out["id_a"] = out["id_a"].astype(np.int64)
        out["id_b"] = out["id_b"].astype(np.int64)
        out["cos_sim"] = np.round(cos, 6)
        return out[out["cos_sim"] >= threshold]

    return with_b.map_batches(verify, batch_format="pandas")


# --- distributed PCA ------------------------------------------------------

#: fixed accumulation chunk — part of the PCA determinism contract
#: (per-partition moment sums chunk in this size, in id order)
_PCA_CHUNK = 256


def pca_basis(ds: rd.Dataset, id_col: str = "vec_id",
              vec_col: str = "embedding", n_components: int = 2,
              num_partitions: int = 64):
    """Principal-component basis from one distributed moment pass:
    per fixed hash partition, id-sorted chunked sums of x and x·xᵀ
    (O(d²) floats per partition — the only thing that ever reaches
    the driver); the d×d covariance eigendecomposition runs on the
    driver (d is the embedding width, never the row count).

    Determinism contract (bit-exact under any block order, enabling a
    golden-file oracle — same scheme as :func:`kmeans_fit`):

    - partials per FIXED hash partition (``pd.util.hash_array(id) %
      P``), rows id-sorted, accumulated with ``np.add.reduce`` in
      fixed ``_PCA_CHUNK`` chunks (ufunc pairwise reduction — shape-
      stable, thread-independent, unlike BLAS gemm);
    - the tiny merge sums partials sorted by (i, j, pid);
    - eigenvector signs fixed by forcing the largest-|loading|
      coordinate positive (ties → lowest index via argmax).

    Returns ``(mean, components(d, m), eigenvalues(m), n)``.
    """
    from sits_classification_ray.stages.shuffle import partitioned_map

    P = num_partitions

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df[vec_col]])
        d = X.shape[1]
        pid = int(pd.util.hash_array(
            df[id_col].to_numpy()[:1], categorize=False)[0]
            % np.uint64(P))
        ss = np.zeros((d, d), dtype=np.float64)
        s = np.zeros(d, dtype=np.float64)
        for i0 in range(0, len(X), _PCA_CHUNK):
            ch = X[i0:i0 + _PCA_CHUNK]
            ss += np.add.reduce(ch[:, :, None] * ch[:, None, :], axis=0)
            s += np.add.reduce(ch, axis=0)
        ii = np.repeat(np.arange(d, dtype=np.int64), d)
        jj = np.tile(np.arange(d, dtype=np.int64), d)
        return pd.DataFrame({
            "pid": np.int64(pid),
            "i": np.concatenate([ii, np.arange(d, dtype=np.int64),
                                 [np.int64(-1)]]),
            "j": np.concatenate([jj, np.full(d, -1, dtype=np.int64),
                                 [np.int64(-1)]]),
            "v": np.concatenate([ss.ravel(), s, [float(len(X))]])})

    parts = partitioned_map(ds, partial, keys=[id_col],
                            num_partitions=P).to_pandas()
    parts = parts.sort_values(["i", "j", "pid"], kind="mergesort")
    agg = parts.groupby(["i", "j"], sort=True)["v"].sum()
    n = float(agg[(-1, -1)])
    d = int(agg.index.get_level_values(0).max() + 1)
    s = np.array([agg[(i, -1)] for i in range(d)])
    ss = np.array([[agg[(i, j)] for j in range(d)] for i in range(d)])
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1.0)
    if n_components == 0:  # moment-only callers (mahalanobis_scores)
        return mean, cov, None, n
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w, kind="stable")[::-1][:n_components]
    comps = v[:, order].copy()
    for c in range(comps.shape[1]):
        jmax = int(np.argmax(np.abs(comps[:, c])))
        if comps[jmax, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean, comps, w[order], n


def pca_project(ds: rd.Dataset, id_col: str = "vec_id",
                vec_col: str = "embedding", n_components: int = 2,
                num_partitions: int = 64,
                round_to: int = 6) -> rd.Dataset:
    """Project every vector onto the top principal components:
    one moment pass (:func:`pca_basis`), then a broadcast map —
    ``pc_k = (x − mean)·comp_k`` — over the stream. The projection is
    an explicit ufunc contraction (not gemm) so the per-row result is
    bit-identical regardless of batch size, keeping the golden oracle
    exact. Returns ``(vec_id, pc1..pcm)`` rounded."""
    from sits_classification_ray.functions.transforms import sql_round

    mean, comps, _, _ = pca_basis(ds, id_col, vec_col, n_components,
                                  num_partitions)
    ref = ray.put((mean, comps))

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        mean, comps = ray.get(ref)
        out = {id_col: df[id_col].to_numpy(np.int64)}
        if len(df):
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[vec_col]]) - mean
            p = (X[:, :, None] * comps[None, :, :]).sum(axis=1)
        else:
            p = np.zeros((0, comps.shape[1]))
        for c in range(comps.shape[1]):
            out[f"pc{c + 1}"] = sql_round(p[:, c], round_to) + 0.0
        return pd.DataFrame(out)

    return ds.map_batches(proj, batch_format="pandas")


def mahalanobis_scores(ds: rd.Dataset, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       num_partitions: int = 64,
                       round_to: int = 6) -> rd.Dataset:
    """Squared Mahalanobis distance of every vector from the corpus
    distribution — the classic embedding-space outlier screen
    (off-manifold documents, encoder failures, polluted shards).

    One distributed moment pass (the :func:`pca_basis` determinism
    contract: fixed hash partitions, id-sorted chunked ufunc sums),
    driver-side d×d covariance inverse, then a broadcast map computing
    ``D² = (x−μ)ᵀ Σ⁻¹ (x−μ)`` per row as explicit ufunc contractions
    (bit-identical under any block layout → golden twin). Returns
    ``(vec_id, d2)`` rounded."""
    from sits_classification_ray.functions.transforms import sql_round

    mean, cov, _, _ = pca_basis(ds, id_col, vec_col, n_components=0,
                                num_partitions=num_partitions)
    inv = np.linalg.inv(cov)
    ref = ray.put((mean, inv))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        mean, inv = ray.get(ref)
        if len(df):
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[vec_col]]) - mean
            y = (X[:, :, None] * inv[None, :, :]).sum(axis=1)
            d2 = (y * X).sum(axis=1)
        else:
            d2 = np.zeros(0)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "d2": sql_round(d2, round_to) + 0.0})

    return ds.map_batches(score, batch_format="pandas")


def knn_classify(ds: rd.Dataset, k: int = 10, test_mod: int = 50,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label",
                 round_to: int = 6) -> pd.DataFrame:
    """k-NN majority-vote classification over a deterministic hash
    split: rows with ``id % test_mod == 0`` are the query (test) fold,
    everything else is the reference (train) corpus.

    Each query is labeled by the majority label among its ``k``
    nearest train neighbors by cosine; vote ties break to the larger
    summed similarity, then the smaller label. Neighborhoods rank by
    (rounded score desc, id asc) so the boundary is engine-stable.

    Distributed shape mirrors ``brute_force_topk``: the bounded query
    fold (1/test_mod of the corpus) is collected once, normalized and
    ``ray.put`` once; every train block computes one (Q,B) matmul and
    emits per-block partial top-k WITH the neighbor label attached, so
    the driver merge holds at most blocks×Q×k narrow rows and the vote
    itself is a bounded groupby. At 100 TB-scale query folds, route the
    queries through ``ivf_topk`` lists instead of broadcasting.

    Returns ``(query_id, true_label, pred_label, votes)``.
    """
    def take_test(df: pd.DataFrame) -> pd.DataFrame:
        m = (df[id_col] % test_mod) == 0
        return df.loc[m, [id_col, vec_col, label_col]]

    test = ds.map_batches(take_test, batch_format="pandas").to_pandas()
    test = test.sort_values(id_col).reset_index(drop=True)
    q_ids = test[id_col].to_numpy(np.int64)
    q_true = test[label_col].to_numpy(np.int64)
    q_mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in test[vec_col]]))
    ref = ray.put((q_ids, q_mat))

    class Score:
        def __init__(self):
            self.q_ids, self.q_mat = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df[id_col] % test_mod) != 0]
            if not len(df):
                return pd.DataFrame({
                    "query_id": pd.Series([], dtype=np.int64),
                    "vec_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                    "n_label": pd.Series([], dtype=np.int64)})
            mat = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
            sims = self.q_mat @ mat.T
            p = _partial_topk(sims, df[id_col].to_numpy(), self.q_ids, k)
            lab = df.set_index(df[id_col].to_numpy())[label_col]
            p["n_label"] = lab.loc[p["vec_id"]].to_numpy(np.int64)
            return p

    partials = ds.map_batches(Score, batch_format="pandas",
                              concurrency=(1, 8), num_cpus=1).to_pandas()
    partials["score"] = partials["score"].round(round_to)
    top = (partials.sort_values(["query_id", "score", "vec_id"],
                                ascending=[True, False, True],
                                kind="mergesort")
           .groupby("query_id", sort=True, as_index=False).head(k))
    votes = (top.groupby(["query_id", "n_label"], as_index=False)
             .agg(votes=("n_label", "size"),
                  sim_sum=("score", "sum")))
    votes["sim_sum"] = votes["sim_sum"].round(round_to)
    win = (votes.sort_values(
        ["query_id", "votes", "sim_sum", "n_label"],
        ascending=[True, False, False, True], kind="mergesort")
        .groupby("query_id", sort=True, as_index=False).head(1))
    out = pd.DataFrame({
        "query_id": q_ids, "true_label": q_true})
    out = out.merge(win.rename(columns={"n_label": "pred_label"})
                   [["query_id", "pred_label", "votes"]],
                   on="query_id", how="left")
    out["pred_label"] = out["pred_label"].astype(np.int64)
    out["votes"] = out["votes"].astype(np.int64)
    return out.sort_values("query_id").reset_index(drop=True)


def hard_negative_topk(ds: rd.Dataset, anchors: pd.DataFrame,
                       k: int = 1, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label",
                       round_to: int = 6) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the nearest corpus neighbors with a DIFFERENT label —
    the highest-cosine candidates the model must learn to push away.

    Same scale shape as :func:`brute_force_topk`: anchors (the small
    side) broadcast once, per-batch partial top-(k+1) under a
    same-label / self mask, final rank by (rounded score desc, vec_id
    asc) on the partial rows only. ``anchors`` needs columns
    (id_col, vec_col, label_col)."""
    a_ids = anchors[id_col].to_numpy(np.int64)
    order = np.argsort(a_ids, kind="mergesort")
    a_ids = a_ids[order]
    a_mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in anchors[vec_col]]))[order]
    a_lab = anchors[label_col].to_numpy(np.int64)[order]
    ref = ray.put((a_ids, a_mat, a_lab))

    class Mine:
        def __init__(self):
            self.a_ids, self.a_mat, self.a_lab = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = _normalize(np.stack(
                [np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
            sims = self.a_mat @ mat.T
            lab = df[label_col].to_numpy(np.int64)
            ids = df[id_col].to_numpy(np.int64)
            sims[self.a_lab[:, None] == lab[None, :]] = -np.inf
            sims[self.a_ids[:, None] == ids[None, :]] = -np.inf
            out = _partial_topk(sims, ids, self.a_ids, k + 1)
            return out[np.isfinite(out["score"])]

    partials = ds.map_batches(Mine, batch_format="pandas",
                              concurrency=(1, 8), num_cpus=1).to_pandas()
    partials["score"] = partials["score"].round(round_to)
    partials = partials.sort_values(
        ["query_id", "score", "vec_id"],
        ascending=[True, False, True], kind="mergesort")
    out = (partials.groupby("query_id", sort=True, as_index=False)
           .head(k).reset_index(drop=True))
    return out.rename(columns={"query_id": "anchor_id",
                               "vec_id": "negative_id"})
