"""Distributed training driver — the reference's ``Trainer.fit``
lifecycle (``pytorch/utils/trainer.py:145-214``) re-expressed as Ray
Data epoch passes over a partition-blocked dataset.

What maps where:

- ``Trainer.fit`` epoch loop / logger / ``valid_every_n_epochs`` /
  ``checkpoint_every_n_epochs`` → :meth:`RayTrainer.fit`
  (``trainer.py:145-199``);
- early stopping (mean of last-``smooth_period`` valid-loss diffs > 0,
  patience counter) → :meth:`RayTrainer._check_early_stopping`
  (``trainer.py:201-214``);
- ``snapshot``/``resume`` (epoch + optimizer state + logged data) →
  :meth:`RayTrainer.snapshot` / :meth:`RayTrainer.resume`
  (``trainer.py:126-143``), stored as ``model_e{epoch}.npz`` +
  ``log.csv`` mirroring ``get_model_name``/``get_log_name``;
- ``_compute_class_weights`` (inverse-frequency over the TRAIN split,
  normalized over present classes, ``trainer.py:95-123``) →
  :meth:`RayTrainer._class_weights`, from a distributed label count;
- the model is the :class:`~sits_classification_ray.stages.scoring`
  ``LinearModel`` family (softmax regression head) fit by
  deterministic full-batch gradient descent — torch's per-minibatch
  Adam is not reproducible across cluster topologies, and the graft's
  correctness gate needs bit-stable learned weights.

Scale shape: the dataset is hash-partitioned ONCE
(``hash(id) % num_partitions``, complete partitions per block) and
materialized; each epoch is a ``map_batches`` pass emitting one
flattened partial-gradient vector per partition (O(P·k·d) rows to the
driver — the k-means partial-sum shape), plus a valid-split pass with
the post-update weights. No per-epoch reshuffle, no driver-side rows.

Determinism contract (enables a golden-file oracle for an iterative
float algorithm, same as ``kmeans_assign``): partials are accumulated
per FIXED hash partition in id-sorted row order, and the driver merges
partition vectors in ascending-pid order — bit-identical under any
block arrival order or cluster size.  Each partition's rows must sit
in one block: guaranteed by the one-time grouped materialization while
a partition stays under the target block size; size ``num_partitions``
accordingly (expected partition ≪ 128 MiB).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.functions.transforms import sql_round


def _softmax(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _pid_of(ids: np.ndarray, num_partitions: int) -> np.ndarray:
    h = pd.util.hash_array(np.ascontiguousarray(ids), categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _partial_vec(X: np.ndarray, y: np.ndarray, W: np.ndarray,
                 b: np.ndarray, cw: np.ndarray,
                 want_grad: bool) -> np.ndarray:
    """Flattened per-partition partial: [G.ravel(k·d) | gb(k) |
    wloss_sum, w_sum, n, correct]. Weighted-mean cross-entropy
    (torch ``F.cross_entropy(weight=...)`` semantics: Σwᵢlᵢ / Σwᵢ);
    ``cw`` is all-ones when class weights are off."""
    k, d = W.shape
    logits = X @ W.T + b
    p = _softmax(logits)
    n = len(y)
    rows = np.arange(n)
    w = cw[y]
    logp = np.log(p[rows, y])
    wloss = float((w * -logp).sum())
    wsum = float(w.sum())
    correct = float((p.argmax(axis=1) == y).sum())
    if want_grad:
        delta = p
        delta[rows, y] -= 1.0
        delta *= w[:, None]
        G = delta.T @ X
        gb = delta.sum(axis=0)
    else:
        G = np.zeros((k, d))
        gb = np.zeros(k)
    return np.concatenate([G.ravel(), gb,
                           [wloss, wsum, float(n), correct]])


def _epoch_kernel(df: pd.DataFrame, W: np.ndarray, b: np.ndarray,
                  cw: np.ndarray, id_col: str, feature_col: str,
                  label_col: str, want_grad: bool):
    """One partial vector per complete pid group inside the batch.
    Output is an Arrow table with a PINNED schema (int64 +
    list<float64>) so empty batches — e.g. blocks the valid-split
    filter emptied — carry the same schema as full ones (avoids the
    'RefBundle with a different schema' streaming-executor hazard)."""
    import pyarrow as pa

    out_pid, out_vec = [], []
    for pid, g in df.groupby("pid", sort=True):
        g = g.sort_values(id_col, kind="mergesort")
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g[feature_col]])
        y = g[label_col].to_numpy(np.int64)
        out_pid.append(int(pid))
        out_vec.append(_partial_vec(X, y, W, b, cw, want_grad))
    return pa.table({"pid": pa.array(out_pid, pa.int64()),
                     "g": pa.array(out_vec, pa.list_(pa.float64()))})


class RayTrainer:
    """Reference-lifecycle trainer over a Ray Dataset of
    (id, feature-vector, label) rows.  See module docstring for the
    reference mapping and the determinism contract."""

    def __init__(self, ds: rd.Dataset, feature_col: str = "embedding",
                 label_col: str = "label", id_col: str = "vec_id",
                 epochs: int = 20, learning_rate: float = 0.5,
                 weight_decay: float = 0.0, store: str | None = None,
                 valid_mod: int | None = 5,
                 valid_every_n_epochs: int = 1,
                 checkpoint_every_n_epochs: int = 5,
                 early_stopping_smooth_period: int = 5,
                 early_stopping_patience: int = 6,
                 use_class_weights: bool = False,
                 num_partitions: int = 16):
        from sits_classification_ray.stages.shuffle import partitioned_map

        self.feature_col, self.label_col, self.id_col = (
            feature_col, label_col, id_col)
        self.epochs = epochs
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.store = Path(store) if store else None
        self.valid_mod = valid_mod
        self.valid_every_n_epochs = valid_every_n_epochs
        self.checkpoint_every_n_epochs = checkpoint_every_n_epochs
        self.early_stopping_smooth_period = early_stopping_smooth_period
        self.early_stopping_patience = early_stopping_patience
        self.not_improved_epochs = 0
        self.P = num_partitions
        self.epoch = 0
        self.log_rows: list[dict] = []

        vm = valid_mod

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(id_col, kind="mergesort")
            ids = df[id_col].to_numpy(np.int64)
            out = pd.DataFrame({
                "pid": _pid_of(ids, num_partitions),
                id_col: ids,
                feature_col: df[feature_col].to_numpy(),
                label_col: df[label_col].to_numpy(np.int64),
            })
            out["is_valid"] = ((ids % vm) == 0) if vm else False
            return out

        self.blocks = partitioned_map(
            ds, prep, keys=[id_col], num_partitions=num_partitions
        ).materialize()

        # infer model shape from the data (reference reads nclasses /
        # ndims off the base dataset, trainer.py:58-60)
        first = self.blocks.take(1)[0]
        self.ndims = len(np.asarray(first[feature_col]))
        self.nclasses = int(self.blocks.max(label_col)) + 1
        self.W = np.zeros((self.nclasses, self.ndims))
        self.b = np.zeros(self.nclasses)
        self.class_weights = (self._class_weights() if use_class_weights
                              else np.ones(self.nclasses))

    # -- reference _compute_class_weights, from a distributed count --
    def _class_weights(self) -> np.ndarray:
        from ray.data.aggregate import Count

        train = self.blocks.filter(expr="is_valid == False")
        cnt = (train.groupby(self.label_col)
               .aggregate(Count(alias_name="n")).to_pandas())
        counts = np.zeros(self.nclasses)
        counts[cnt[self.label_col].to_numpy(np.int64)] = (
            cnt["n"].to_numpy(np.float64))
        w = np.zeros(self.nclasses)
        present = counts > 0
        w[present] = 1.0 / counts[present]
        w[present] = w[present] / w[present].sum() * present.sum()
        return w

    # -- one distributed pass → merged (grad, stats), pid-ordered ----
    def _pass(self, ds: rd.Dataset, want_grad: bool) -> np.ndarray:
        parts = ds.map_batches(
            _epoch_kernel, batch_size=None, batch_format="pandas",
            fn_kwargs=dict(W=self.W, b=self.b, cw=self.class_weights,
                           id_col=self.id_col,
                           feature_col=self.feature_col,
                           label_col=self.label_col,
                           want_grad=want_grad)).to_pandas()
        parts = parts.sort_values("pid", kind="mergesort")
        total = np.zeros(self.nclasses * self.ndims + self.nclasses + 4)
        for v in parts["g"]:
            total += np.asarray(v, dtype=np.float64)
        return total

    def _unpack(self, vec: np.ndarray):
        k, d = self.nclasses, self.ndims
        G = vec[:k * d].reshape(k, d)
        gb = vec[k * d:k * d + k]
        wloss, wsum, n, correct = vec[k * d + k:]
        return G, gb, wloss, wsum, n, correct

    def train_epoch(self) -> dict:
        """Full-batch GD step at the current weights; stats are the
        pre-update loss/accuracy (the loss the gradient descends)."""
        train = (self.blocks.filter(expr="is_valid == False")
                 if self.valid_mod else self.blocks)
        G, gb, wloss, wsum, n, correct = self._unpack(
            self._pass(train, want_grad=True))
        self.W -= self.learning_rate * (G / wsum
                                        + self.weight_decay * self.W)
        self.b -= self.learning_rate * (gb / wsum)
        return {"epoch": self.epoch, "mode": "train",
                "loss": wloss / wsum, "accuracy": correct / n}

    def valid_epoch(self) -> dict:
        valid = self.blocks.filter(expr="is_valid == True")
        _, _, wloss, wsum, n, correct = self._unpack(
            self._pass(valid, want_grad=False))
        return {"epoch": self.epoch, "mode": "valid",
                "loss": wloss / wsum, "accuracy": correct / n}

    # -- lifecycle (reference trainer.py:126-214) ---------------------
    def snapshot(self, filename: str | Path | None = None) -> Path:
        path = Path(filename) if filename else self.get_model_name()
        path.parent.mkdir(parents=True, exist_ok=True)
        log = self.get_log()
        np.savez(path, W=self.W, b=self.b, epoch=self.epoch,
                 class_weights=self.class_weights,
                 not_improved_epochs=self.not_improved_epochs,
                 log_epoch=log["epoch"].to_numpy(np.int64),
                 log_mode=log["mode"].to_numpy(object),
                 log_loss=log["loss"].to_numpy(np.float64),
                 log_accuracy=log["accuracy"].to_numpy(np.float64))
        if self.store:
            log.to_csv(self.get_log_name(), index=False)
        return path

    def resume(self, filename: str | Path) -> None:
        snap = np.load(filename, allow_pickle=True)
        self.W = snap["W"]
        self.b = snap["b"]
        self.epoch = int(snap["epoch"])
        self.class_weights = snap["class_weights"]
        self.not_improved_epochs = int(snap["not_improved_epochs"])
        self.log_rows = [
            {"epoch": int(e), "mode": str(m), "loss": float(l),
             "accuracy": float(a)}
            for e, m, l, a in zip(snap["log_epoch"], snap["log_mode"],
                                  snap["log_loss"],
                                  snap["log_accuracy"])]

    def get_model_name(self) -> Path:
        base = self.store or Path("/tmp")
        return base / f"model_e{self.epoch}.npz"

    def get_log_name(self) -> Path:
        return (self.store or Path("/tmp")) / "log.csv"

    def get_log(self) -> pd.DataFrame:
        if not self.log_rows:
            return pd.DataFrame(
                columns=["epoch", "mode", "loss", "accuracy"])
        return pd.DataFrame(self.log_rows)

    def _check_early_stopping(self) -> bool:
        """Reference rule: mean of the last-``smooth_period``
        valid-loss diffs > 0 → one strike; stop at ``patience``
        strikes (trainer.py:201-214)."""
        valid = [r["loss"] for r in self.log_rows
                 if r["mode"] == "valid"]
        sp = self.early_stopping_smooth_period
        diffs = np.diff(np.asarray(valid, dtype=np.float64))[-sp:]
        if len(diffs) and diffs.mean() > 0:
            self.not_improved_epochs += 1
            return self.not_improved_epochs >= self.early_stopping_patience
        self.not_improved_epochs = 0
        return False

    def fit(self) -> pd.DataFrame:
        """Epoch loop mirroring reference ``fit`` (trainer.py:145-199):
        train → log → valid every n epochs (+ epoch 1) → early-stop
        check → periodic snapshot. Returns the log."""
        while self.epoch < self.epochs:
            self.epoch += 1
            self.log_rows.append(self.train_epoch())
            if self.valid_mod:
                if (self.epoch % self.valid_every_n_epochs == 0
                        or self.epoch == 1):
                    self.log_rows.append(self.valid_epoch())
                if (self.epoch > self.early_stopping_smooth_period
                        and self._check_early_stopping()):
                    if self.store:
                        self.snapshot()
                    break
            if (self.store
                    and self.epoch % self.checkpoint_every_n_epochs == 0):
                self.snapshot()
        return self.get_log()

    def weights_table(self, round_to: int = 6) -> pd.DataFrame:
        """Learned parameters as a long table: one row per (class,
        dim) weight plus ``dim = -1`` bias rows — the hashable shape
        the golden oracle stores."""
        k, d = self.nclasses, self.ndims
        return pd.DataFrame({
            "class": np.concatenate([np.repeat(np.arange(k), d),
                                     np.arange(k)]).astype(np.int64),
            "dim": np.concatenate([np.tile(np.arange(d), k),
                                   np.full(k, -1)]).astype(np.int64),
            "weight": sql_round(
                np.concatenate([self.W.ravel(), self.b]), round_to),
        })

    def log_table(self, round_to: int = 6) -> pd.DataFrame:
        log = self.get_log().copy()
        log["epoch"] = log["epoch"].astype(np.int64)
        log["loss"] = sql_round(log["loss"].to_numpy(np.float64),
                                round_to)
        log["accuracy"] = sql_round(
            log["accuracy"].to_numpy(np.float64), round_to)
        return log


# --- second-order trainer: Newton/IRLS logistic regression ---------------
#
# The exact-Hessian sibling of RayTrainer's first-order GD (reference
# Trainer.fit epoch loop, pytorch/utils/trainer.py:145-199): each
# iteration is ONE distributed pass emitting a per-pid partial
# [H.ravel (d²) | g (d) | loss, n] — O(d²) floats per partition to the
# driver regardless of row count — merged in sorted-pid order
# (the repo's float-determinism contract) and solved exactly.


def _logreg_kernel(df: pd.DataFrame, w: np.ndarray, id_col: str,
                   feature_col: str, label_col: str, positive: int):
    """One [H|g|loss,n] partial per complete pid group (pinned Arrow
    schema, same empty-block contract as ``_epoch_kernel``)."""
    import pyarrow as pa

    d = len(w)
    out_pid, out_vec = [], []
    for pid, g_ in df.groupby("pid", sort=True):
        g_ = g_.sort_values(id_col, kind="mergesort")
        X = np.concatenate(
            [np.stack([np.asarray(v, dtype=np.float64)
                       for v in g_[feature_col]]),
             np.ones((len(g_), 1))], axis=1)          # bias column
        y = (g_[label_col].to_numpy(np.int64) == positive
             ).astype(np.float64)
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        s = p * (1.0 - p)
        H = (X * s[:, None]).T @ X
        grad = X.T @ (p - y)
        # stable NLL: Σ softplus(z) − y·z
        loss = float(np.logaddexp(0.0, z).sum() - (y * z).sum())
        out_pid.append(int(pid))
        out_vec.append(np.concatenate(
            [H.ravel(), grad, [loss, float(len(y))]]))
    return pa.table({"pid": pa.array(out_pid, pa.int64()),
                     "g": pa.array(out_vec, pa.list_(pa.float64()))})


def logreg_newton_fit(ds: rd.Dataset, feature_col: str = "embedding",
                      label_col: str = "label", id_col: str = "vec_id",
                      positive: int = 0, n_iters: int = 4,
                      reg: float = 1e-3, num_partitions: int = 16
                      ) -> tuple[np.ndarray, list[dict]]:
    """Binary logistic regression (y = label == ``positive``) by exact
    Newton steps: w ← w − (H + λI)⁻¹(g + λw). Returns (weights with
    bias last, per-iteration log). Deterministic under any block
    arrival order: one partial per pid, summed pid-sorted."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame({
            "pid": _pid_of(ids, num_partitions),
            id_col: ids,
            feature_col: df[feature_col].to_numpy(),
            label_col: df[label_col].to_numpy(np.int64)})

    blocks = partitioned_map(ds, prep, keys=[id_col],
                             num_partitions=num_partitions).materialize()
    first = blocks.take(1)[0]
    d = len(np.asarray(first[feature_col])) + 1
    w = np.zeros(d)
    log = []
    for it in range(n_iters):
        parts = blocks.map_batches(
            _logreg_kernel, batch_size=None, batch_format="pandas",
            fn_kwargs=dict(w=w, id_col=id_col, feature_col=feature_col,
                           label_col=label_col,
                           positive=positive)).to_pandas()
        parts = parts.sort_values("pid", kind="mergesort")
        total = np.zeros(d * d + d + 2)
        for v in parts["g"]:
            total += np.asarray(v, dtype=np.float64)
        H = total[:d * d].reshape(d, d) + reg * np.eye(d)
        grad = total[d * d:d * d + d] + reg * w
        loss, n = total[d * d + d:]
        w = w - np.linalg.solve(H, grad)
        log.append({"iter": it, "loss": loss / n, "n": int(n)})
    return w, log


# --- hyperparameter search (reference pytorch/train.py:58-71) ------------

#: (low, high) log-uniform ranges, mirroring ``hyperparameter_tune``'s
#: learning_rate / weight_decay suggestions (config_hyperparameter.py:73-74)
TUNE_SPACE = {
    "learning_rate": (0.05, 2.0),
    "weight_decay": (1e-5, 1e-3),
}


def sample_trial(rng: np.random.RandomState) -> dict:
    """One seeded draw from the log-uniform space — parameters are
    drawn in sorted-key order so the stream is reproducible."""
    out = {}
    for name in sorted(TUNE_SPACE):
        lo, hi = TUNE_SPACE[name]
        out[name] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    return out


def tune_search(ds: rd.Dataset, n_trials: int = 5, seed: int = 7,
                epochs: int = 6, round_to: int = 6,
                **trainer_kwargs) -> pd.DataFrame:
    """Seeded random search over the LinearModel hyperparameters —
    the optuna ``study.optimize(..., n_trials)`` analog
    (``pytorch/train.py:58-71``) with a deterministic sampler (TPE is
    not reproducible across library versions; the graft needs a
    golden-checkable trial table). Classification direction =
    maximize best valid accuracy (``train.py:66-67``), ties broken by
    (valid loss ASC, trial ASC). Each trial's fit is itself the
    distributed :class:`RayTrainer` pass."""
    rng = np.random.RandomState(seed)
    rows = []
    for t in range(n_trials):
        params = sample_trial(rng)
        tr = RayTrainer(ds, epochs=epochs, **params, **trainer_kwargs)
        log = tr.fit()
        valid = log[log["mode"] == "valid"]
        rows.append({
            "trial": np.int64(t),
            "learning_rate": sql_round(params["learning_rate"], round_to),
            "weight_decay": sql_round(params["weight_decay"], round_to),
            "best_valid_accuracy": sql_round(
                float(valid["accuracy"].max()), round_to),
            "final_valid_loss": sql_round(
                float(valid["loss"].iloc[-1]), round_to),
            "epochs_run": np.int64(log["epoch"].max()),
        })
    out = pd.DataFrame(rows)
    order = out.sort_values(
        ["best_valid_accuracy", "final_valid_loss", "trial"],
        ascending=[False, True, True], kind="mergesort")
    ranks = pd.Series(np.arange(1, len(out) + 1, dtype=np.int64),
                      index=order.index)
    out["rank"] = ranks
    return out


# --- composed pipeline: quality classifier (train → score corpus) --------

#: tiny fixed stopword list shared by the featurizer and its golden
#: twin — the feature is the fraction of tokens that are these.
QC_STOPWORDS = ("a", "and", "for", "in", "is", "of", "on", "the",
                "to", "with")


def quality_features(ds: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text", lang_col: str = "lang",
                     target_lang: str = "en") -> rd.Dataset:
    """Deterministic per-document feature vectors for the quality
    classifier — the GPT-3/CCNet "quality filter" pattern (train a
    small linear model on reference-vs-crawl labels, score the whole
    corpus). Features (float64, in order):

    0. ``n_tokens / 100``
    1. stopword fraction of tokens (``QC_STOPWORDS``, lowercased)
    2. ``n_chars / 1000``
    3. digit-character fraction of ``n_chars``

    Label: 1 if ``lang == target_lang`` (the deterministic stand-in
    for a "high-quality reference" flag) else 0. One vectorized pass,
    zero shuffle."""

    def featurize(batch: pa.Table) -> pa.Table:
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(batch)
        lists = pc.split_pattern(pc.utf8_lower(batch[text_col]), " ")
        n_tok = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy()
        stop = pc.is_in(flat, value_set=pa.array(list(QC_STOPWORDS))) \
            .to_numpy(zero_copy_only=False)
        hits = np.bincount(parent[stop], minlength=n).astype(np.int64)
        ndig = pc.count_substring_regex(batch[text_col], "[0-9]") \
            .to_numpy().astype(np.int64)
        nchars = pc.utf8_length(batch[text_col]).to_numpy() \
            .astype(np.int64)
        f = np.stack([
            n_tok / 100.0,
            hits / n_tok,
            nchars / 1000.0,
            ndig / np.maximum(nchars, 1),
        ], axis=1)
        off = (np.arange(n + 1, dtype=np.int32) * 4)
        feat = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()),
            pa.array(f.ravel(), pa.float64()))
        label = pc.cast(pc.equal(batch[lang_col],
                                 pa.scalar(target_lang)), pa.int64())
        return pa.table({id_col: batch[id_col], "f": feat,
                         "label": label})

    return ds.map_batches(featurize, batch_format="pyarrow",
                          zero_copy_batch=True)


def quality_classifier_scores(ds: rd.Dataset, id_col: str = "doc_id",
                              epochs: int = 8,
                              learning_rate: float = 0.5,
                              round_to: int = 6) -> rd.Dataset:
    """Train the quality classifier on the corpus' own deterministic
    labels with :class:`RayTrainer`, then score EVERY document with
    the learned weights: ``(doc_id, label, p_quality, pred)`` where
    ``p_quality`` is the softmax probability of the quality class.

    Scale shape: the fit is the trainer's partial-gradient lifecycle
    (O(P·k·d) driver rows per epoch); the learned (k×d) weights are
    closure-captured into one stateless vectorized scoring pass over
    the feature stream. Per-row dot products only — bit-stable under
    any batching."""
    feats = quality_features(ds, id_col=id_col)
    tr = RayTrainer(feats, feature_col="f", label_col="label",
                    id_col=id_col, epochs=epochs,
                    learning_rate=learning_rate,
                    use_class_weights=True)
    tr.fit()
    W, b = tr.W.copy(), tr.b.copy()

    def score(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["f"]])
        p = _softmax(X @ W.T + b)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "label": df["label"].to_numpy(np.int64),
            "p_quality": sql_round(p[:, 1], round_to),
            "pred": p.argmax(axis=1).astype(np.int64),
        })

    return feats.map_batches(score, batch_format="pandas")


# --- Ledoit-Wolf covariance shrinkage (Ledoit & Wolf 2004) ---------------


def ledoit_wolf_stats(ds: rd.Dataset, feature_col: str = "embedding",
                      id_col: str = "vec_id",
                      num_partitions: int = 16) -> dict:
    """Shrinkage intensity λ* toward the scaled identity — the
    covariance regularizer every downstream Mahalanobis / GMM / LDA
    wants at d ≈ n. Two distributed passes of per-pid partials merged
    in sorted-pid order (the repo's float-determinism contract):
    pass 1 collects [Σx | Σxxᵀ | n] (O(d²) per partition), pass 2 —
    with the mean and sample covariance broadcast — collects
    [Σ‖x_c‖⁴ | Σ x_cᵀ S x_c]. Driver math is O(d²)."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame({
            "pid": _pid_of(ids, num_partitions), id_col: ids,
            feature_col: df[feature_col].to_numpy()})

    blocks = partitioned_map(ds, prep, keys=[id_col],
                             num_partitions=num_partitions).materialize()
    first = blocks.take(1)[0]
    d = len(np.asarray(first[feature_col]))

    def pass1(df: pd.DataFrame):
        import pyarrow as pa

        out_pid, out_vec = [], []
        for pid, g in df.groupby("pid", sort=True):
            g = g.sort_values(id_col, kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in g[feature_col]])
            out_pid.append(int(pid))
            out_vec.append(np.concatenate(
                [X.sum(axis=0), (X.T @ X).ravel(),
                 [float(len(X))]]))
        return pa.table({"pid": pa.array(out_pid, pa.int64()),
                         "g": pa.array(out_vec, pa.list_(pa.float64()))})

    parts = blocks.map_batches(pass1, batch_size=None,
                               batch_format="pandas").to_pandas() \
        .sort_values("pid", kind="mergesort")
    tot = np.zeros(d + d * d + 1)
    for v in parts["g"]:
        tot += np.asarray(v, np.float64)
    n = tot[-1]
    mean = tot[:d] / n
    S = tot[d:d + d * d].reshape(d, d) / n - np.outer(mean, mean)

    import ray as _ray
    ms_ref = _ray.put((mean, S))

    def pass2(df: pd.DataFrame):
        import pyarrow as pa

        mu, Sm = _ray.get(ms_ref)
        out_pid, out_vec = [], []
        for pid, g in df.groupby("pid", sort=True):
            g = g.sort_values(id_col, kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in g[feature_col]]) - mu
            sq = (X * X).sum(axis=1)
            out_pid.append(int(pid))
            out_vec.append(np.array(
                [float((sq * sq).sum()),
                 float((X * (X @ Sm)).sum())]))
        return pa.table({"pid": pa.array(out_pid, pa.int64()),
                         "g": pa.array(out_vec, pa.list_(pa.float64()))})

    parts2 = blocks.map_batches(pass2, batch_size=None,
                                batch_format="pandas").to_pandas() \
        .sort_values("pid", kind="mergesort")
    tot2 = np.zeros(2)
    for v in parts2["g"]:
        tot2 += np.asarray(v, np.float64)
    sum_norm4, sum_xSx = tot2
    m = float(np.trace(S)) / d
    d2 = float(((S - m * np.eye(d)) ** 2).sum()) / d
    s2 = float((S * S).sum())
    # (1/n²)Σ‖x_cx_cᵀ − S‖²_F / d  =  (Σ‖x_c‖⁴ − 2Σx_cᵀSx_c + nΣS²)/(n²d)
    b2 = (sum_norm4 - 2.0 * sum_xSx + n * s2) / (n * n * d)
    b2 = min(b2, d2)
    lam = b2 / d2 if d2 > 0 else 0.0
    return {"n": int(n), "dim": d, "mu": m, "d2": d2, "b2": b2,
            "shrinkage": lam}


# --- Cox proportional hazards (distributed prefix-scan Newton) -----------


def cox_fit(subjects: rd.Dataset, t_col: str = "t", d_col: str = "d",
            x_col: str = "x", id_col: str = "uid", n_iters: int = 3,
            num_blocks: int = 8) -> dict:
    """Cox proportional-hazards fit for one covariate by Newton on the
    partial likelihood — the survival-REGRESSION member next to the
    registry's Kaplan-Meier staleness curves.

    Risk sets are resolved by the total order (T desc, x, id): subject
    i's risk set = everyone ordered at-or-before i — the
    order-resolved tie convention (documented; Breslow/Efron differ
    only at exact ties). Every Newton iteration is then a prefix scan.

    DETERMINISM: Ray's sort range-partitions at SAMPLED boundaries, so
    raw sorted blocks are not reproducible and float prefix sums would
    drift in the last ulp across runs. Blocking is therefore derived
    from the data itself: a distributed global rank (scan_sorted.
    global_rank — O(blocks) driver state) assigns each subject
    ``block = (rank−1)·B // n``; each Newton pass is two schema-pinned
    ``partitioned_map``s over those fixed blocks (per-block exp-sums →
    O(B) driver carry fold → per-block score/information
    contributions), bit-identical under any cluster shape."""
    import pyarrow as pa

    from sits_classification_ray.stages.scan_sorted import global_rank
    from sits_classification_ray.stages.shuffle import partitioned_map

    def negt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["_tneg"] = -out[t_col].to_numpy(np.float64)
        return out

    ranked = global_rank(subjects.map_batches(negt,
                                              batch_format="pandas"),
                         ["_tneg", x_col, id_col]).materialize()
    n = ranked.count()

    def blk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["_blk"] = ((out["rn"].to_numpy(np.int64) - 1)
                       * num_blocks) // max(1, n)
        return out

    blocks = ranked.map_batches(blk, batch_format="pandas") \
        .materialize()

    tot_schema = pa.schema([("blk", pa.int64()), ("s0", pa.float64()),
                            ("s1", pa.float64()), ("s2", pa.float64())])
    con_schema = pa.schema([("blk", pa.int64()), ("U", pa.float64()),
                            ("I", pa.float64()), ("L", pa.float64()),
                            ("ne", pa.float64())])

    beta = 0.0
    out: dict = {}
    for _ in range(n_iters):
        b = beta

        def totals(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for blk_id, g in df.sort_values("rn", kind="mergesort") \
                    .groupby("_blk", sort=True):
                x = g[x_col].to_numpy(np.float64)
                e = np.exp(x * b)
                rows.append((int(blk_id), float(e.sum()),
                             float((x * e).sum()),
                             float((x * x * e).sum())))
            return pd.DataFrame(rows, columns=["blk", "s0", "s1",
                                               "s2"])

        tt = partitioned_map(blocks, totals, keys=["_blk"],
                             out_schema=tot_schema).to_pandas() \
            .sort_values("blk", ignore_index=True)
        carry = {}
        acc = (0.0, 0.0, 0.0)
        for r in tt.itertuples(index=False):
            carry[int(r.blk)] = acc
            acc = (acc[0] + r.s0, acc[1] + r.s1, acc[2] + r.s2)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for blk_id, g in df.sort_values("rn", kind="mergesort") \
                    .groupby("_blk", sort=True):
                c = carry.get(int(blk_id), (0.0, 0.0, 0.0))
                x = g[x_col].to_numpy(np.float64)
                d = g[d_col].to_numpy(np.float64)
                e = np.exp(x * b)
                S0 = c[0] + np.cumsum(e)
                S1 = c[1] + np.cumsum(x * e)
                S2 = c[2] + np.cumsum(x * x * e)
                r1 = S1 / S0
                rows.append((int(blk_id),
                             float((d * (x - r1)).sum()),
                             float((d * (S2 / S0 - r1 * r1)).sum()),
                             float((d * (x * b - np.log(S0))).sum()),
                             float(d.sum())))
            return pd.DataFrame(rows, columns=["blk", "U", "I", "L",
                                               "ne"])

        cc = partitioned_map(blocks, contrib, keys=["_blk"],
                             out_schema=con_schema).to_pandas() \
            .sort_values("blk", ignore_index=True)
        # sequential block-order accumulation (matches the golden
        # twin's += loop — pairwise summation would regroup floats)
        U = info = L = 0.0
        for r in cc.itertuples(index=False):
            U += float(r.U)
            info += float(r.I)
            L += float(r.L)
        out = {"beta": beta, "score": U, "information": info,
               "loglik": L, "n_events": int(cc["ne"].sum()),
               "n_subjects": int(n)}
        beta = beta + U / info
    out["beta_next"] = beta
    return out


# --- Frequent Directions matrix sketch (Liberty, KDD 2013) ---------------


def _fd_shrink(B: np.ndarray, ell: int) -> np.ndarray:
    """One FD compaction: SVD, subtract the ell-th squared singular
    value, keep the top ell directions."""
    _, s, Vt = np.linalg.svd(B, full_matrices=False)
    if len(s) <= ell:
        return (s[:, None] * Vt)
    delta = s[ell - 1] ** 2
    s2 = np.sqrt(np.maximum(s[:ell] ** 2 - delta, 0.0))
    return s2[:, None] * Vt[:ell]


def frequent_directions(ds: rd.Dataset, ell: int = 8,
                        feature_col: str = "embedding",
                        id_col: str = "vec_id",
                        num_partitions: int = 16) -> np.ndarray:
    """Distributed Frequent Directions: the deterministic streaming
    sketch whose Gram error is bounded by ‖A‖²_F / ell — the
    matrix-sketching member next to PCA (exact) and JL (oblivious
    random projection). FD sketches are MERGEABLE (concat + shrink),
    so each hash partition builds its own ell-row sketch over
    id-sorted rows and the driver folds the O(P·ell·d) partials in
    ascending-pid order — never an O(rows) driver table. Returns the
    final ell×d sketch."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame({
            "pid": _pid_of(ids, num_partitions), id_col: ids,
            feature_col: df[feature_col].to_numpy()})

    blocks = partitioned_map(ds, prep, keys=[id_col],
                             num_partitions=num_partitions).materialize()

    def sketch(df: pd.DataFrame):
        import pyarrow as pa

        out_pid, out_vec, out_d = [], [], []
        for pid, g in df.groupby("pid", sort=True):
            g = g.sort_values(id_col, kind="mergesort")
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in g[feature_col]])
            d = X.shape[1]
            B = np.zeros((0, d))
            for start in range(0, len(X), ell):
                B = np.concatenate([B, X[start:start + ell]])
                if len(B) > ell:
                    B = _fd_shrink(B, ell)
            # pad to exactly ell rows for a fixed-size partial
            if len(B) < ell:
                B = np.concatenate(
                    [B, np.zeros((ell - len(B), d))])
            out_pid.append(int(pid))
            # append the partition's exact squared Frobenius mass so
            # the caller gets a DETERMINISTIC ||A||_F^2 (pid-sorted
            # fold, not batch-boundary-dependent partials)
            out_vec.append(np.concatenate([B.ravel(),
                                           [float((X * X).sum())]]))
            out_d.append(d)
        return pa.table({"pid": pa.array(out_pid, pa.int64()),
                         "d": pa.array(out_d, pa.int64()),
                         "g": pa.array([v for v in out_vec],
                                       pa.list_(pa.float64()))})

    parts = blocks.map_batches(sketch, batch_size=None,
                               batch_format="pandas").to_pandas() \
        .sort_values("pid", kind="mergesort")
    B = None
    f2 = 0.0
    for r in parts.itertuples(index=False):
        d = int(r.d)
        vec = np.asarray(r.g, np.float64)
        Bp = vec[:ell * d].reshape(ell, d)
        f2 += float(vec[ell * d])
        B = Bp if B is None else _fd_shrink(
            np.concatenate([B, Bp]), ell)
    return (B if B is not None else np.zeros((0, 0))), f2
