"""Sampling, splits, class statistics, metric accumulators.

Re-expressions of the reference's O6/O7/A3/A4/A5 operators:

- seeded stratified sampling (reference stratified raster sampling,
  ``utils/sampling_run.py:73-116``)
- seeded train/test split (``utils/class_run.py:215-229``,
  ``pytorch/train.py:132-145``)
- class histogram + inverse-frequency class weights
  (``pytorch/utils/Dataset.py:46``, ``pytorch/utils/trainer.py:95-123``)
- confusion matrix as a mergeable partial aggregate (the reference's
  ``hist +=`` pattern, ``pytorch/utils/classmetric.py:42-54``) with
  accuracy / kappa / per-class precision-recall-F1 finalization
  (``pytorch/utils/classmetric.py:4-34``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum


def stratified_sample(ds: rd.Dataset, strata_col: str,
                      frac: float | dict, seed: int = 42) -> rd.Dataset:
    """Deterministic stratified sample without a shuffle.

    ``frac`` is a global rate or a per-stratum dict (the reference's
    per-value-range proportions, ``utils/sampling_run.py:73-116``).
    Each row is kept iff a stable hash of its full content falls below
    its stratum's rate — deterministic under any partitioning or
    execution order, unlike per-group ``df.sample``.
    """

    def sample_batch(df: pd.DataFrame) -> pd.DataFrame:
        content = df.astype(str).agg("\x1f".join, axis=1)
        h = pd.util.hash_pandas_object(content, index=False,
                                       hash_key=f"{seed % 10**16:016d}")
        if isinstance(frac, dict):
            rates = df[strata_col].map(lambda s: frac.get(s, 0.0))
        else:
            rates = pd.Series(float(frac), index=df.index)
        thresh = (rates * 1_000_000).astype(np.uint64)
        keep = (h % np.uint64(1_000_000)) < thresh
        return df[keep.to_numpy()]

    return ds.map_batches(sample_batch, batch_format="pandas")


def train_test_split(ds: rd.Dataset, test_frac: float = 0.2,
                     seed: int = 42) -> tuple[rd.Dataset, rd.Dataset]:
    """Seeded random split (reference 0.8 ratio,
    ``utils/class_run.py:221``); returns (train, test)."""
    return ds.train_test_split(test_size=test_frac, shuffle=True, seed=seed)


def class_weights(ds: rd.Dataset, label_col: str = "label") -> pd.DataFrame:
    """Histogram + inverse-frequency weights normalized over present
    classes: ``w_c = total / (n_c * n_classes)`` — exact double
    arithmetic on integer counts, so it is oracle-comparable.

    The distributed part is the grouped count; the tiny histogram is
    finalized on the driver (totals must be global, not per block —
    the reference does the same driver-side arithmetic,
    ``pytorch/utils/trainer.py:95-123``)."""
    hist = (ds.groupby(label_col).aggregate(Count(alias_name="n"))
            .to_pandas().sort_values(label_col).reset_index(drop=True))
    total = float(hist["n"].sum())
    k = float(len(hist))
    hist["weight"] = total / (hist["n"].astype(np.float64) * k)
    return hist


def top_k_per_group(ds: rd.Dataset, group_cols: list[str], order_col: str,
                    k: int, ascending: bool = False,
                    tie_col: str | None = None) -> rd.Dataset:
    """Distributed top-k rows per group (O5 generalized to grouped
    limits).

    Combiner shape: each batch is reduced to its per-group top-k
    BEFORE the shuffle (the shuffle moves ≤ k rows per group per
    batch, never the full table), then one salted-partition pass takes
    the global top-k per group. ``tie_col`` breaks order ties
    deterministically (ascending), matching SQL
    ``row_number() OVER (ORDER BY order_col [DESC], tie_col)``."""
    sort_cols = list(group_cols) + [order_col] + \
        ([tie_col] if tie_col else [])
    asc = [True] * len(group_cols) + [ascending] + \
        ([True] if tie_col else [])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
        return s.groupby(list(group_cols), sort=False).head(k)

    from sits_classification_ray.stages.shuffle import partitioned_map

    pre = ds.map_batches(local_topk, batch_format="pandas")
    return partitioned_map(pre, local_topk, keys=list(group_cols))


def reservoir_sample(ds: rd.Dataset, group_cols: list[str], id_col: str,
                     k: int) -> rd.Dataset:
    """Deterministic distributed uniform k-sample per group: keep the k
    rows with the SMALLEST SipHash of ``id_col`` (bottom-k-by-hash, the
    merge-order-independent equivalent of reservoir sampling — every
    row has equal selection probability, yet any partitioning of the
    input yields the identical sample, which a stateful reservoir
    cannot guarantee under Ray's nondeterministic block order).

    Rides :func:`top_k_per_group`'s combiner: each batch is cut to its
    local bottom-k before the shuffle, so ≤ k·batches rows move per
    group. Hash ties (2⁻⁶⁴) break by ``id_col``.
    """
    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        # int64 view: uint64 keys > 2^63 kick Ray groupby into
        # pickled-object blocks
        df["_h"] = pd.util.hash_pandas_object(
            df[id_col], index=False, categorize=False).astype(np.int64)
        return df

    out = top_k_per_group(ds.map_batches(add_h, batch_format="pandas"),
                          group_cols, "_h", k, ascending=True,
                          tie_col=id_col)
    return out.drop_columns(["_h"])


def weighted_sample(ds: rd.Dataset, group_cols: list[str], id_col: str,
                    weight_col: str, k: int) -> rd.Dataset:
    """Deterministic weighted k-sample WITHOUT replacement per group
    (Efraimidis–Spirakis A-ES): each row draws u from the SipHash of
    its id (same fixed-key determinism contract as reservoir_sample)
    and keeps the k smallest exponential keys ``-ln(u)/w`` —
    selection probability proportional to ``weight_col``, identical
    sample under ANY partitioning/merge order.

    Rides the same combiner as reservoir_sample: per-batch bottom-k
    before the shuffle, ≤ k·batches rows move per group."""
    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df[id_col], index=False, categorize=False
        ).to_numpy().astype(np.uint64)
        u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
        w = df[weight_col].to_numpy(np.float64)
        df = df.copy(deep=False)
        df["_key"] = -np.log(u) / np.maximum(w, 1e-300)
        return df

    out = top_k_per_group(ds.map_batches(add_key, batch_format="pandas"),
                          group_cols, "_key", k, ascending=True,
                          tie_col=id_col)
    return out.drop_columns(["_key"])


def early_stop(losses: list[float], window: int = 5) -> bool:
    """Early-stopping rule (A11): mean of the last-``window`` loss
    diffs > 0 ⇒ not improving ⇒ stop
    (reference ``pytorch/utils/trainer.py:201-214``)."""
    if len(losses) < window + 1:
        return False
    diffs = np.diff(np.asarray(losses[-(window + 1):], dtype=np.float64))
    return bool(diffs.mean() > 0)


def regression_metrics(ds: rd.Dataset, truth_col: str, pred_col: str
                       ) -> pd.DataFrame:
    """Global RMSE / MAE / R² via proper partial+final aggregation.

    Unlike the reference's mean-of-batch-RMSEs
    (``pytorch/utils/classmetric.py:105-118`` — noted in SURVEY A6 as
    not a true global RMSE), partials carry (n, Σe², Σ|e|, Σy, Σy²)
    and the driver finalizes, so the result is the exact global metric
    independent of batching."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        y = df[truth_col].to_numpy(np.float64)
        p = df[pred_col].to_numpy(np.float64)
        e = p - y
        return pd.DataFrame({
            "n": [len(y)], "se": [float((e ** 2).sum())],
            "ae": [float(np.abs(e).sum())],
            "sy": [float(y.sum())], "syy": [float((y ** 2).sum())],
        })

    agg = ds.map_batches(partial, batch_format="pandas").to_pandas().sum()
    n = agg["n"]
    rmse = float(np.sqrt(agg["se"] / n))
    mae = float(agg["ae"] / n)
    ss_tot = agg["syy"] - agg["sy"] ** 2 / n
    r2 = float(1.0 - agg["se"] / ss_tot) if ss_tot > 0 else float("nan")
    return pd.DataFrame({"metric_name": ["rmse", "mae", "r2", "n"],
                         "value": [rmse, mae, r2, float(n)]})


def confusion_matrix(ds: rd.Dataset, truth_col: str, pred_col: str
                     ) -> pd.DataFrame:
    """Mergeable confusion counts: vectorized per-batch partials
    (crosstab), summed with one tiny groupby — the distributed form of
    the reference's ``hist +=`` accumulator."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([truth_col, pred_col], sort=False, observed=True)
             .size().reset_index(name="n"))
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = partials.groupby([truth_col, pred_col]).aggregate(
        Sum("n", alias_name="n"))
    return merged.to_pandas()


def classification_report(conf: pd.DataFrame, truth_col: str,
                          pred_col: str) -> dict:
    """Finalize accuracy / kappa / per-class P-R-F1 from confusion
    counts (reference ``classmetric.py:4-34``)."""
    labels = sorted(set(conf[truth_col]) | set(conf[pred_col]))
    idx = {l: i for i, l in enumerate(labels)}
    m = np.zeros((len(labels), len(labels)), dtype=np.int64)
    for _, r in conf.iterrows():
        m[idx[r[truth_col]], idx[r[pred_col]]] = r["n"]
    total = m.sum()
    acc = np.trace(m) / total if total else float("nan")
    pe = (m.sum(0) * m.sum(1)).sum() / total ** 2 if total else float("nan")
    kappa = (acc - pe) / (1 - pe) if pe != 1 else float("nan")
    per_class = {}
    for l, i in idx.items():
        tp = m[i, i]
        prec = tp / m[:, i].sum() if m[:, i].sum() else 0.0
        rec = tp / m[i, :].sum() if m[i, :].sum() else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        per_class[l] = {"precision": prec, "recall": rec, "f1": f1}
    return {"accuracy": float(acc), "kappa": float(kappa),
            "per_class": per_class, "n": int(total)}
