"""Mergeable cardinality sketches: HyperLogLog distinct counting.

The engine's approximate-distinct operator for 10^12-row tables where
an exact ``COUNT(DISTINCT url)`` per time bucket would shuffle every
distinct key: each batch folds its rows into fixed-size (m = 2^p byte)
register arrays per bucket, the shuffle moves only those sketch rows,
and the merge is an elementwise byte-max — associative, commutative
and idempotent, so it composes with any partitioning/re-aggregation
(the same combine-then-merge contract as stages/rollup.py partials).

Hash: sha1-derived 64-bit per key (process-independent, like every
other content hash in the engine). Estimator: the classic
Flajolet–Durand bias-corrected HLL with the small-range linear
counting correction; 64-bit hashes need no large-range correction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _hash_u64(keys) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = int.from_bytes(
            hashlib.sha1(str(k).encode()).digest()[:8], "big")
    return out


def hll_update(registers: np.ndarray, hashes: np.ndarray, p: int) -> None:
    """Fold 64-bit hashes into a register array in place (byte max)."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes & np.uint64((1 << (64 - p)) - 1)
    # (64 - p) ≤ 52 bits → exact in float64, so log2 is safe
    rho = np.full(len(hashes), 64 - p + 1, dtype=np.uint8)
    nz = rest > 0
    rho[nz] = (64 - p) - np.floor(
        np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    np.maximum.at(registers, idx, rho)


def hll_estimate(registers: np.ndarray) -> float:
    """Bias-corrected estimate from one register array."""
    m = len(registers)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -registers.astype(np.float64)).sum()
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds: rd.Dataset, key_col: str, bucket_col: str,
                 p: int = 12) -> rd.Dataset:
    """Approximate distinct ``key_col`` per ``bucket_col`` group.

    Output: ``(bucket_col, hll_estimate: float64)`` — one row per
    bucket. Shuffle payload is one 2^p-byte sketch per (bucket, batch),
    never the keys themselves.
    """
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            reg = np.zeros(m, dtype=np.uint8)
            hll_update(reg, _hash_u64(g[key_col].tolist()), p)
            rows.append((bucket, reg.tobytes()))
        return pd.DataFrame(rows, columns=[bucket_col, "sketch"])

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            reg = np.zeros(m, dtype=np.uint8)
            for s in g["sketch"]:
                np.maximum(reg, np.frombuffer(s, dtype=np.uint8), out=reg)
            rows.append((bucket, round(hll_estimate(reg), 6)))
        return pd.DataFrame(rows, columns=[bucket_col, "hll_estimate"])

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(partials, merge, keys=[bucket_col])


def hll_sketches(ds: rd.Dataset, key_col: str, bucket_col: str,
                 p: int = 12) -> rd.Dataset:
    """Storable HLL representation: ``(bucket_col, sketch: bytes)`` —
    one merged 2^p-byte register set per bucket. This is what a tier
    table persists so coarser tiers can be derived WITHOUT rescanning
    keys (register max is commutative/idempotent)."""
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            reg = np.zeros(m, dtype=np.uint8)
            hll_update(reg, _hash_u64(g[key_col].tolist()), p)
            rows.append((bucket, reg.tobytes()))
        return pd.DataFrame(rows, columns=[bucket_col, "sketch"])

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            reg = np.zeros(m, dtype=np.uint8)
            for s in g["sketch"]:
                np.maximum(reg, np.frombuffer(s, dtype=np.uint8), out=reg)
            rows.append((bucket, reg.tobytes()))
        return pd.DataFrame(rows, columns=[bucket_col, "sketch"])

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(partials, merge, keys=[bucket_col])


def hll_rollup(sk_ds: rd.Dataset, bucket_col: str, coarse_fn,
               p: int = 12) -> rd.Dataset:
    """Re-aggregate stored HLL sketches to a coarser bucket and
    estimate — the continuous-aggregate sketch path (weekly distincts
    from daily sketches; exchange volume = one sketch per fine bucket,
    never the keys). ``coarse_fn`` maps a bucket Series to the coarser
    bucket Series."""
    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out[bucket_col] = coarse_fn(out[bucket_col])
        return out

    coarse = sk_ds.map_batches(rebucket, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            reg = None
            for s in g["sketch"]:
                r = np.frombuffer(s, dtype=np.uint8)
                reg = r.copy() if reg is None else np.maximum(reg, r)
            rows.append((bucket, round(hll_estimate(reg), 6)))
        return pd.DataFrame(rows, columns=[bucket_col, "hll_estimate"])

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(coarse, merge, keys=[bucket_col])


# --- mergeable histogram quantiles ---------------------------------------

def hist_quantile(ds: rd.Dataset, value_col: str, bucket_col: str,
                  quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                  n_bins: int = 1024, bin_width: int = 8) -> rd.Dataset:
    """Approximate per-bucket quantiles via a fixed-bin histogram
    sketch — the 10^12-row path where an exact quantile would sort
    every value per bucket. Like :func:`hll_distinct`, the shuffle
    moves one fixed-size count vector per (bucket, batch), never the
    values, and the merge (elementwise sum) is associative and
    commutative, so it composes with any partitioning.

    Bins are integer: ``bin = min(value // bin_width, n_bins - 1)``;
    the quantile estimate is the inclusive upper edge
    ``(bin + 1) * bin_width`` of the first bin whose cumulative count
    reaches ``ceil(q * total)`` — all-integer, so engine and oracle
    agree bit-for-bit under any merge order. Error is bounded by one
    bin width (plus saturation in the overflow bin).

    Output: one row per bucket — ``(bucket_col, n, q50, q90, q99, …)``
    with a ``q{int(100 q)}`` column per requested quantile.
    """
    qcols = [f"q{int(round(q * 100)):02d}" for q in quantiles]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        b = np.minimum(v // bin_width, n_bins - 1).astype(np.int64)
        rows = []
        for bucket, idx in df.groupby(bucket_col, sort=False).indices.items():
            counts = np.bincount(b[idx], minlength=n_bins).astype(np.int64)
            rows.append((bucket, counts.tobytes()))
        return pd.DataFrame(rows, columns=[bucket_col, "sketch"])

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            counts = np.zeros(n_bins, dtype=np.int64)
            for s in g["sketch"]:
                counts += np.frombuffer(s, dtype=np.int64)
            total = int(counts.sum())
            cum = np.cumsum(counts)
            ests = []
            for q in quantiles:
                # pure-integer ceil(q * total) with q in micro-units, so
                # engine and oracle can't diverge by a float ulp
                q_micro = int(round(q * 1_000_000))
                rank = max(-(-q_micro * total // 1_000_000), 1)
                bin_i = int(np.searchsorted(cum, rank, side="left"))
                ests.append((bin_i + 1) * bin_width)
            rows.append((bucket, total, *ests))
        return pd.DataFrame(rows, columns=[bucket_col, "n", *qcols])

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(partials, merge, keys=[bucket_col])


# --- KMV (k-minimum-values) distinct sketch ------------------------------

def kmv_distinct(ds: rd.Dataset, key_col: str, bucket_col: str,
                 k: int = 256) -> rd.Dataset:
    """Distinct-count estimate per bucket via the k smallest key
    hashes (Bar-Yossef et al. KMV estimator) — the third mergeable
    sketch alongside HLL and the histogram quantile, and unlike HLL it
    also yields a uniform without-replacement SAMPLE of the distinct
    keys (the k hash-minima are a coordination-free bottom-k sample).

    Merge is set-union-then-k-smallest: order-insensitive and
    idempotent, so any Ray block arrival order produces the same
    result — which is what lets a sequential golden oracle replicate
    it exactly. Estimate: with u_k = k-th smallest hash normalized to
    (0, 1], distinct ≈ (k-1)/u_k; exact |keys| when fewer than k
    distinct hashes were seen. Shuffle payload: ≤ k (hash, key) rows
    per (bucket, batch).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            h = np.unique(_hash_u64(g[key_col].tolist()))  # sorted asc
            # int64 VIEW (bit reinterpret) — uint64 keys > 2^63 must
            # not go through a value cast, and Ray aggregates keep
            # int64 arrow-typed where uint64 falls back to objects
            rows.append(pd.DataFrame({
                bucket_col: bucket,
                "h": np.ascontiguousarray(h[:k]).view(np.int64)}))
        if not rows:
            return pd.DataFrame({bucket_col: df[bucket_col].iloc[:0],
                                 "h": np.zeros(0, np.int64)})
        return pd.concat(rows, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            h = np.unique(g["h"].to_numpy(np.int64).view(np.uint64))
            n = len(h)
            if n < k:
                est = float(n)
            else:
                h = h[:k]
                u_k = (float(h[-1]) + 1.0) / 18446744073709551616.0
                est = (k - 1) / u_k
            rows.append((bucket, n if n < k else k, round(est, 6)))
        return pd.DataFrame(rows, columns=[bucket_col, "n_sample",
                                           "kmv_estimate"])

    from sits_classification_ray.stages.shuffle import partitioned_map

    out = partitioned_map(partials, merge, keys=[bucket_col])
    return out


# --- DDSketch (relative-error log-bucket quantiles) -----------------------

#: DDSketch zero-bucket sentinel bin: sorts below every real log bin
#: (the smallest finite ceil(ln(x)/ln γ) for float64 is ≈ -7.1e4 at
#: α=0.01), and stays safe in int64/SQL BIGINT arithmetic.
DD_ZERO_BIN = -(1 << 62)


def ddsketch_quantile(ds: rd.Dataset, value_col: str, bucket_col: str,
                      quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                      alpha: float = 0.01, round_to: int = 6
                      ) -> rd.Dataset:
    """Per-bucket quantiles via a DDSketch (Masson et al., VLDB 2019):
    log-spaced buckets ``i = ceil(ln(x) / ln(γ))`` with
    ``γ = (1+α)/(1−α)``, giving α-RELATIVE error at every quantile —
    the complement to :func:`hist_quantile`'s absolute-error fixed
    bins (small values keep fine resolution, the tail never
    saturates).

    Unlike classic streaming sketches, the bucket index is a pure
    function of the value, so the sketch is MERGE-ORDER-INDEPENDENT
    and the partials are just ``(bucket, bin, count)`` rows: per-batch
    group-count → native ``Sum`` merge → per-bucket rank selection.
    The shuffle moves one row per occupied log-bin per batch, never
    the values. Rank math is all-integer (micro-units, as in
    hist_quantile); the ``γ^i`` estimate is SQL-rounded (libm pow may
    differ in the last ulp). Zeros go to DDSketch's dedicated zero
    bucket (a sentinel bin sorting below every log bin, estimate 0.0);
    negative values are out of scope, as in the paper's positive-store
    variant.
    """
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    gamma = (1.0 + alpha) / (1.0 - alpha)
    log_gamma = np.log(gamma)
    qcols = [f"q{int(round(q * 100)):02d}" for q in quantiles]
    q_micro = [int(round(q * 1_000_000)) for q in quantiles]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        bi = np.full(v.shape, DD_ZERO_BIN, dtype=np.int64)
        pos = v > 0.0
        bi[pos] = np.ceil(np.log(v[pos]) / log_gamma).astype(np.int64)
        out = (pd.DataFrame({bucket_col: df[bucket_col], "bin": bi})
               .groupby([bucket_col, "bin"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    merged = (ds.map_batches(partial, batch_format="pandas")
              .groupby([bucket_col, "bin"])
              .aggregate(Sum("n", alias_name="n")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            g = g.sort_values("bin")
            counts = g["n"].to_numpy(np.int64)
            bins = g["bin"].to_numpy(np.int64)
            total = int(counts.sum())
            cum = np.cumsum(counts)
            ests = []
            for qm in q_micro:
                rank = max(-(-qm * total // 1_000_000), 1)
                i = int(np.searchsorted(cum, rank, side="left"))
                b = int(bins[i])
                ests.append(0.0 if b == DD_ZERO_BIN
                            else float(gamma) ** b)
            rows.append((bucket, total,
                         *sql_round(np.array(ests), round_to)))
        return pd.DataFrame(rows, columns=[bucket_col, "n", *qcols])

    return partitioned_map(merged, finalize, keys=[bucket_col])


# --- Exact quantiles for bounded integer domains --------------------------

def exact_int_quantile(ds: rd.Dataset, value_col: str, bucket_col: str,
                       quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)
                       ) -> rd.Dataset:
    """EXACT per-bucket quantiles when the value domain is bounded
    integers (lengths, counts, sizes — most operational metrics): the
    per-batch partial is a group-count by ``(bucket, value)``, merged
    with a native ``Sum``, and the quantile is plain rank selection
    over the merged value histogram. No sort of the raw data, no
    approximation — the shuffle moves one row per DISTINCT value per
    bucket per batch, which for bounded domains is O(domain), not
    O(rows).

    Completes the engine's quantile family: :func:`hist_quantile`
    (fixed-bin, absolute error), :func:`ddsketch_quantile` (log-bin,
    relative error), and this (exact, integer domains). Rank convention
    is shared across all three and with the SQL oracles:
    ``rank = ceil(q · total)`` computed in integer micro-units, value =
    first value whose cumulative count reaches the rank.
    """
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.shuffle import partitioned_map

    qcols = [f"q{int(round(q * 100)):02d}" for q in quantiles]
    q_micro = [int(round(q * 1_000_000)) for q in quantiles]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (pd.DataFrame({bucket_col: df[bucket_col],
                             "v": df[value_col].astype(np.int64)})
               .groupby([bucket_col, "v"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    merged = (ds.map_batches(partial, batch_format="pandas")
              .groupby([bucket_col, "v"])
              .aggregate(Sum("n", alias_name="n")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            g = g.sort_values("v")
            counts = g["n"].to_numpy(np.int64)
            vals = g["v"].to_numpy(np.int64)
            total = int(counts.sum())
            cum = np.cumsum(counts)
            ests = []
            for qm in q_micro:
                rank = max(-(-qm * total // 1_000_000), 1)
                i = int(np.searchsorted(cum, rank, side="left"))
                ests.append(int(vals[i]))
            rows.append((bucket, total, *ests))
        out = pd.DataFrame(rows, columns=[bucket_col, "n", *qcols])
        for c in qcols:
            out[c] = out[c].astype(np.int64)
        return out

    return partitioned_map(merged, finalize, keys=[bucket_col])


# --- AMS F2 (second frequency moment) linear sketch ----------------------

def _ams_params(keys: list, rows: int, buckets: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Per-(row, key) bucket index and ±1 sign, derived from sha1 —
    the deterministic hash spec shared with the golden oracle."""
    import hashlib

    bkt = np.empty((rows, len(keys)), dtype=np.int64)
    sgn = np.empty((rows, len(keys)), dtype=np.int64)
    for k, key in enumerate(keys):
        for j in range(rows):
            h = int.from_bytes(
                hashlib.sha1(f"{j}:{key}".encode()).digest()[:8], "big")
            bkt[j, k] = h % buckets
            sgn[j, k] = 1 - 2 * ((h >> 8) & 1)
    return bkt, sgn


def ams_f2(ds: rd.Dataset, key_col: str, rows: int = 5,
           buckets: int = 256) -> pd.DataFrame:
    """AMS second-moment estimate of ``key_col`` frequencies (the
    self-join size / skew signal) next to the exact value.

    The sketch is LINEAR: per-batch partial counter matrices merge by
    plain addition, so the exchange is a native (row, bucket) Sum over
    ≤ rows×buckets integers per batch — never the keys. The exact F2
    rides the same pass as a per-batch (key, count) combiner + one
    grouped Sum. All math is integer → bit-stable under any order.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        uniq, counts = np.unique(df[key_col].to_numpy(), return_counts=True)
        bkt, sgn = _ams_params(list(uniq), rows, buckets)
        C = np.zeros((rows, buckets), dtype=np.int64)
        for j in range(rows):
            np.add.at(C[j], bkt[j], sgn[j] * counts)
        jj, hh = np.nonzero(C)
        sk = pd.DataFrame({"j": jj, "h": hh, "c": C[jj, hh],
                           "key": "", "n": 0})
        ex = pd.DataFrame({"j": -1, "h": -1, "c": 0,
                           "key": uniq.astype(str), "n": counts})
        return pd.concat([sk, ex], ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    # sketch side: ≤ rows×buckets integers total reach the driver
    sk = (partials.map_batches(lambda d: d[d["j"] >= 0],
                               batch_format="pandas")
          .groupby(["j", "h"]).aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    # exact side stays distributed: per-key Sum, then a per-batch n²
    # partial and one global Sum — the key table never reaches the
    # driver
    exact = (partials.map_batches(lambda d: d[d["j"] < 0],
                                  batch_format="pandas")
             .groupby("key").aggregate(Sum("n", alias_name="n"))
             .map_batches(lambda d: pd.DataFrame(
                 {"sq": (d["n"].to_numpy(np.int64) ** 2)}),
                 batch_format="pandas")
             .sum("sq"))
    exact = int(exact)
    per_row = sk.groupby("j")["c"].apply(
        lambda s: int((s.to_numpy(np.int64) ** 2).sum()))
    per_row = per_row.reindex(range(rows), fill_value=0)
    est = int(np.median(per_row.to_numpy(np.int64)))
    rel = round(abs(est - exact) / max(1, exact), 6)
    return pd.DataFrame([{"f2_estimate": est, "exact_f2": exact,
                          "rel_error": rel}])


# --- Frequency sketches: Count-Min + CountSketch point estimates ----------

_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xBF58476D1CE4E5B9)
_MIX_C = np.uint64(0x94D049BB133111EB)


def _mix_u64(h: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer with a per-``seed`` offset — derives the
    d independent row hashes a Count-Min/CountSketch table needs from
    one sha1-based key hash (deterministic, process-independent)."""
    off = np.uint64(((seed + 1) * 0x9E3779B97F4A7C15) % (1 << 64))
    z = h + off
    z = (z ^ (z >> np.uint64(30))) * _MIX_B
    z = (z ^ (z >> np.uint64(27))) * _MIX_C
    return z ^ (z >> np.uint64(31))


def _freq_sketch_update(cms: np.ndarray, csk: np.ndarray,
                        h: np.ndarray, cnt: np.ndarray,
                        depth: int, width: int) -> None:
    """Fold (hash, count) pairs into both tables in place. Pure
    integer sums → commutative/associative, so ANY batching or merge
    order yields bit-identical tables (what lets a sequential golden
    replicate a distributed run exactly)."""
    for d in range(depth):
        idx = (_mix_u64(h, d) % np.uint64(width)).astype(np.int64)
        np.add.at(cms[d], idx, cnt)
        sgn = np.where(_mix_u64(h, depth + d) >> np.uint64(63),
                       np.int64(1), np.int64(-1))
        np.add.at(csk[d], idx, cnt * sgn)


def _freq_sketch_query(cms: np.ndarray, csk: np.ndarray,
                       h: np.ndarray, depth: int, width: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Point estimates: Count-Min = min over rows (upper-biased,
    never below the true count); CountSketch = median of signed row
    estimates (unbiased)."""
    n = len(h)
    ests = np.empty((depth, n), dtype=np.int64)
    cests = np.empty((depth, n), dtype=np.int64)
    for d in range(depth):
        idx = (_mix_u64(h, d) % np.uint64(width)).astype(np.int64)
        ests[d] = cms[d][idx]
        sgn = np.where(_mix_u64(h, depth + d) >> np.uint64(63),
                       np.int64(1), np.int64(-1))
        cests[d] = csk[d][idx] * sgn
    return ests.min(axis=0), np.median(cests, axis=0).astype(np.int64)


def heavy_keys_exact(ds: rd.Dataset, key_col: str, k: int = 20
                     ) -> pd.DataFrame:
    """EXACT φ-heavy hitters of a key column (φ = 1/(k+1)): every key
    whose global row count strictly exceeds N/(k+1), without shuffling
    the key space — the two-pass pigeonhole candidate algorithm of
    stages/textstats.py:heavy_hitters generalized from tokenized text
    to a plain column. Returns a driver DataFrame (≤ k rows by the
    φ-heavy definition)."""
    from ray.data.aggregate import Sum

    def candidates(batch: pa.Table) -> pa.Table:
        n_b = batch.num_rows
        g = pa.table({"key": batch[key_col]}).group_by(["key"]) \
            .aggregate([([], "count_all")]).rename_columns(["key", "n"])
        cnt = g["n"].to_numpy()
        heavy = g["key"].to_pandas()[cnt * (k + 1) > n_b]
        return pa.table({
            "key": pa.array(list(heavy) + [None], pa.string()),
            "n_rows": pa.array([0] * len(heavy) + [n_b], pa.int64()),
        })

    cand = ds.map_batches(candidates, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    n_total = int(cand.sum("n_rows") or 0)
    cand_tbl = (cand.map_batches(
        lambda t: t.filter(pc.is_valid(t["key"])),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key").count().to_pandas())
    if cand_tbl.empty:
        return pd.DataFrame({"key": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    import ray
    cand_ref = ray.put(np.sort(
        cand_tbl["key"].to_numpy(dtype=object).astype(str)))

    class CountCandidates:
        def __init__(self):
            self.cand = ray.get(cand_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch[key_col].to_numpy(zero_copy_only=False
                                           ).astype(str)
            hit = keys[np.isin(keys, self.cand)]
            w, n = np.unique(hit, return_counts=True)
            return pa.table({"key": pa.array(w.astype(object)),
                             "n": pa.array(n.astype(np.int64))})

    counts = (ds.map_batches(CountCandidates, batch_format="pyarrow",
                             zero_copy_batch=True, concurrency=(1, 8),
                             num_cpus=1)
              .groupby("key").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts = counts[counts["n"] * (k + 1) > n_total]
    return counts.sort_values(["n", "key"], ascending=[False, True]
                              ).reset_index(drop=True)


def freq_sketch_estimates(ds: rd.Dataset, key_col: str, k: int = 20,
                          depth: int = 4, width: int = 2048
                          ) -> pd.DataFrame:
    """Count-Min AND CountSketch point estimates for the exact φ-heavy
    keys of ``key_col`` — the bounded-memory frequency primitive for
    10^12-row streams, with its accuracy made inspectable against the
    exact counts in the same row.

    One pass builds both tables per batch (partial rows are the
    fixed-size ``depth × width`` int64 tables, 2 × 64 KiB at the
    defaults); a local map level pre-merges ~256 partials per task so
    the driver folds n_blocks/256 rows, never the data. The probe set
    is :func:`heavy_keys_exact` (deterministic under any batching by
    the pigeonhole guarantee). Output per key: exact ``n``,
    ``cms_est`` (≥ n always — the structural overestimate guarantee),
    ``csk_est`` (unbiased median).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cms = np.zeros((depth, width), dtype=np.int64)
        csk = np.zeros((depth, width), dtype=np.int64)
        u, cnt = np.unique(df[key_col].to_numpy(dtype=object
                                                ).astype(str),
                           return_counts=True)
        _freq_sketch_update(cms, csk, _hash_u64(u),
                            cnt.astype(np.int64), depth, width)
        return pd.DataFrame({"cms": [cms.tobytes()],
                             "csk": [csk.tobytes()]})

    def merge_local(df: pd.DataFrame) -> pd.DataFrame:
        cms = np.zeros(depth * width, dtype=np.int64)
        csk = np.zeros(depth * width, dtype=np.int64)
        for b in df["cms"]:
            cms += np.frombuffer(b, dtype=np.int64)
        for b in df["csk"]:
            csk += np.frombuffer(b, dtype=np.int64)
        return pd.DataFrame({"cms": [cms.tobytes()],
                             "csk": [csk.tobytes()]})

    merged = (ds.map_batches(partial, batch_format="pandas")
              .map_batches(merge_local, batch_format="pandas",
                           batch_size=256)
              .to_pandas())
    cms = np.zeros((depth, width), dtype=np.int64)
    csk = np.zeros((depth, width), dtype=np.int64)
    for b in merged["cms"]:
        cms += np.frombuffer(b, dtype=np.int64).reshape(depth, width)
    for b in merged["csk"]:
        csk += np.frombuffer(b, dtype=np.int64).reshape(depth, width)

    heavy = heavy_keys_exact(ds, key_col, k=k)
    if heavy.empty:
        return pd.DataFrame({"key": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "cms_est": pd.Series([], dtype=np.int64),
                             "csk_est": pd.Series([], dtype=np.int64)})
    h = _hash_u64(heavy["key"].tolist())
    cms_est, csk_est = _freq_sketch_query(cms, csk, h, depth, width)
    out = heavy.copy()
    out["cms_est"] = cms_est
    out["csk_est"] = csk_est
    return out


# --- KMV set operations: week-over-week url overlap ------------------------

def kmv_overlap(ds: rd.Dataset, key_col: str, bucket_col: str,
                k: int = 256) -> pd.DataFrame:
    """Jaccard / intersection / union estimates between CONSECUTIVE
    buckets from bottom-k (KMV) signatures — set operations on
    sketches, so comparing week N's url set with week N+1's never
    rescans or shuffles the keys (one ≤ k-hash signature per bucket).

    Union estimate: KMV estimator on the k smallest of the merged
    hash sets. Jaccard: fraction of the union's bottom-k present in
    BOTH signatures (the bottom-k of the union is a uniform sample of
    the union). Intersection: jaccard × union. Deterministic: hash
    sets are order-free, merges are set unions.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            h = np.unique(_hash_u64(g[key_col].tolist()))
            rows.append(pd.DataFrame({
                bucket_col: bucket,
                "h": np.ascontiguousarray(h[:k]).view(np.int64)}))
        if not rows:
            return pd.DataFrame({bucket_col: df[bucket_col].iloc[:0],
                                 "h": np.zeros(0, np.int64)})
        return pd.concat(rows, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            h = np.unique(g["h"].to_numpy(np.int64).view(np.uint64))[:k]
            rows.append((bucket, np.ascontiguousarray(h).view(np.int64)
                         .tobytes()))
        return pd.DataFrame(rows, columns=[bucket_col, "sig"])

    from sits_classification_ray.stages.shuffle import partitioned_map

    # one ≤ 2 KiB signature row per bucket — a bounded driver collect
    sigs = partitioned_map(partials, merge, keys=[bucket_col]
                           ).to_pandas().sort_values(bucket_col)

    def est_distinct(h: np.ndarray) -> float:
        if len(h) < k:
            return float(len(h))
        u_k = (float(h[k - 1]) + 1.0) / 18446744073709551616.0
        return (k - 1) / u_k

    rows = []
    buckets = sigs[bucket_col].tolist()
    hs = [np.frombuffer(s, dtype=np.int64).view(np.uint64)
          for s in sigs["sig"]]
    for i in range(len(buckets) - 1):
        a, b = hs[i], hs[i + 1]
        union = np.unique(np.concatenate([a, b]))[:k]
        in_both = np.isin(union, a) & np.isin(union, b)
        jac = float(in_both.sum()) / max(1, len(union))
        d_union = est_distinct(union)
        rows.append((buckets[i], buckets[i + 1],
                     round(jac, 6), round(jac * d_union, 6),
                     round(d_union, 6)))
    return pd.DataFrame(rows, columns=[
        "bucket_a", "bucket_b", "jaccard_est", "intersection_est",
        "union_est"])


# --- t-digest (Dunning & Ertl 2019) --------------------------------

def tdigest_compress(means: np.ndarray, weights: np.ndarray,
                     delta: float = 100.0
                     ) -> tuple[np.ndarray, np.ndarray]:
    """One merging-digest compression pass over centroids already
    sorted by (mean, weight): absorb neighbors while the k1 scale
    ``k(q) = δ/2π · asin(2q−1)`` allows (cluster spans ≤ 1 k-unit) —
    fine resolution at the tails, coarse in the middle. Input order is
    canonicalized by the caller, so the result is a pure function of
    the centroid MULTISET (merge-order-independent by construction,
    unlike the textbook streaming variant)."""
    W = float(weights.sum())
    if len(means) == 0 or W <= 0:
        return means[:0], weights[:0]

    def k(q: float) -> float:
        return delta / (2.0 * np.pi) * np.arcsin(
            min(1.0, max(-1.0, 2.0 * q - 1.0)))

    out_m, out_w = [], []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_done = 0.0
    for mi, wi in zip(means[1:], weights[1:]):
        if (k((w_done + cur_w + wi) / W) - k(w_done / W)) <= 1.0:
            cur_w += wi
            cur_m += (mi - cur_m) * (wi / cur_w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_done += cur_w
            cur_m, cur_w = float(mi), float(wi)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def tdigest_quantile_est(means: np.ndarray, weights: np.ndarray,
                         q: float) -> float:
    """Quantile estimate from a compressed digest: linear
    interpolation between successive centroid weight-midpoints,
    clamped to the extreme centroid means."""
    W = float(weights.sum())
    cum = np.cumsum(weights) - weights / 2.0
    t = q * W
    if t <= cum[0]:
        return float(means[0])
    if t >= cum[-1]:
        return float(means[-1])
    j = int(np.searchsorted(cum, t) - 1)
    frac = (t - cum[j]) / (cum[j + 1] - cum[j])
    return float(means[j] + frac * (means[j + 1] - means[j]))


def tdigest_quantile(ds: rd.Dataset, value_col: str, bucket_col: str,
                     quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                     delta: float = 100.0, round_to: int = 6
                     ) -> rd.Dataset:
    """Per-bucket t-digest quantiles (Dunning & Ertl 2019) — the
    rank-error member of the sketch family (DDSketch: relative value
    error; histogram: absolute value error; t-digest: bounded
    QUANTILE error, sharpest at the tails).

    Checked-query path: one salted exchange co-locates each bucket,
    the kernel sorts the bucket's values and runs ONE canonical
    compression — a pure function of the value multiset, so the
    golden twin reproduces it bit-exactly. The streaming two-level
    variant (per-batch partial digests → canonical sorted re-merge)
    is exposed via :func:`tdigest_compress` for pipelines that cannot
    co-locate buckets; its result depends on batch boundaries and is
    accuracy-tested, not golden-matched."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    qcols = [f"q{int(round(q * 100)):02d}" for q in quantiles]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            v = np.sort(g[value_col].to_numpy(np.float64))
            m, w = tdigest_compress(v, np.ones(len(v)), delta)
            row = {bucket_col: bucket,
                   "n": np.int64(len(v)),
                   "n_centroids": np.int64(len(m))}
            for q, c in zip(quantiles, qcols):
                row[c] = float(sql_round(np.array(
                    [tdigest_quantile_est(m, w, q)]), round_to)[0]) \
                    + 0.0
            rows.append(row)
        cols = [bucket_col, "n", "n_centroids"] + qcols
        if not rows:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(rows)[cols]

    import pyarrow as pa
    schema = pa.schema(
        [(bucket_col, pa.string()), ("n", pa.int64()),
         ("n_centroids", pa.int64())]
        + [(c, pa.float64()) for c in qcols])
    return partitioned_map(ds, kernel, url_col=bucket_col,
                           out_schema=schema)


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — simplified
# deterministic variant: fixed per-level capacity k, full-buffer
# compaction promoting the offset-parity half (offset alternates per
# level per compaction, the derandomized compactor), canonical bulk
# build feeding the SORTED multiset in chunks of k. Distinct from
# t-digest (centroid merging) and DDSketch (log buckets): KLL keeps
# raw VALUES at power-of-two weights across levels, is trivially
# mergeable (concatenate levels, re-compact) and gives additive rank
# error. The canonical build is a pure function of the value multiset,
# so the independent golden twin reproduces it bit-exactly.
# ---------------------------------------------------------------------------


def kll_build(sorted_vals: np.ndarray, k: int = 128) -> list:
    """Level buffers (index = level, weight 2^level) of the canonical
    bulk build."""
    levels: list[np.ndarray] = [np.empty(0, np.float64)]
    offsets: list[int] = [0]
    for start in range(0, len(sorted_vals), k):
        chunk = sorted_vals[start:start + k]
        levels[0] = np.sort(np.concatenate([levels[0], chunk]),
                            kind="mergesort")
        i = 0
        while i < len(levels) and len(levels[i]) > k:
            buf = levels[i]                       # already sorted
            promoted = buf[offsets[i]::2]
            offsets[i] ^= 1
            levels[i] = buf[:0]
            if i + 1 == len(levels):
                levels.append(promoted.copy())
                offsets.append(0)
            else:
                levels[i + 1] = np.sort(
                    np.concatenate([levels[i + 1], promoted]),
                    kind="mergesort")
            i += 1
    return levels


def kll_quantile_est(levels: list, q: float) -> float:
    """Rank query: smallest stored value whose cumulative weight
    reaches q·W (weights 2^level)."""
    items = np.concatenate(levels)
    wts = np.concatenate([np.full(len(lv), 1 << i, np.int64)
                          for i, lv in enumerate(levels)])
    o = np.argsort(items, kind="mergesort")
    items, wts = items[o], wts[o]
    cum = np.cumsum(wts)
    t = q * float(cum[-1])
    j = min(int(np.searchsorted(cum, t, side="left")), len(items) - 1)
    return float(items[j])


def kll_quantile(ds: "rd.Dataset", value_col: str, bucket_col: str,
                 quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                 k: int = 128, round_to: int = 6) -> "rd.Dataset":
    """Per-bucket KLL quantiles — same checked-query shape as
    :func:`tdigest_quantile`: one salted exchange co-locates each
    bucket, the kernel runs the canonical bulk build (pure function of
    the multiset → golden-matchable)."""
    import pyarrow as pa

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    qcols = [f"q{int(round(q * 100)):02d}" for q in quantiles]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby(bucket_col, sort=False):
            v = np.sort(g[value_col].to_numpy(np.float64))
            levels = kll_build(v, k)
            row = {bucket_col: bucket, "n": np.int64(len(v)),
                   "n_retained": np.int64(sum(len(lv)
                                              for lv in levels)),
                   "n_levels": np.int64(len(levels))}
            for q, c in zip(quantiles, qcols):
                row[c] = float(sql_round(np.array(
                    [kll_quantile_est(levels, q)]), round_to)[0]) + 0.0
            rows.append(row)
        cols = [bucket_col, "n", "n_retained", "n_levels"] + qcols
        if not rows:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(rows)[cols]

    schema = pa.schema(
        [(bucket_col, pa.string()), ("n", pa.int64()),
         ("n_retained", pa.int64()), ("n_levels", pa.int64())]
        + [(c, pa.float64()) for c in qcols])
    return partitioned_map(ds, kernel, url_col=bucket_col,
                           out_schema=schema)
