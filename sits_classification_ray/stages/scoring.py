"""Batched model scoring: the reference's inference stage re-expressed.

Mirrors the reference inference loop semantics (SURVEY §2.3 T1, §2.2
M12/M15) without torch:

- weights loaded ONCE per actor from a broadcast handle
  (``pytorch/predict.py:256-272`` loads the model once and reuses it
  across tiles/chunks);
- zero-mask skip + sentinel re-insert: rows whose features are all
  zero are not scored and receive the nodata sentinel −9999
  (``pytorch/predict.py:498-531``);
- argmax decode for classification, raw vector for probability mode
  (``pytorch/predict.py:527-528,675-677``);
- inverse response normalization for regression heads
  (``pytorch/predict.py:521-525``).

The stand-in model is a deterministic linear scorer — the actor-pool
plumbing (broadcast weights, batch sizing, masking, decode) is the
real, tested part; swap ``LinearModel`` for any callable returning
logits to score with a real model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

SENTINEL = -9999.0


#: String → constructor registry (the reference's ``getModel``,
#: ``pytorch/train.py:237-262``). Register custom models here.
MODEL_REGISTRY: dict = {}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls

    return deco


def get_model(name: str, **kwargs):
    """Instantiate a registered model by name (raises KeyError with
    the available names, like the reference's ValueError)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: "
                       f"{sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)


@register_model("linear")
class LinearModel:
    """Deterministic stand-in model: logits = b + Σᵢ xᵢ·wᵢ.

    Accumulated feature-by-feature in a FIXED order (not BLAS matmul,
    whose blocking/FMA may reorder the IEEE sequence) so the logits are
    bit-identical to the left-associated SQL expression
    ``b + x0*w0 + x1*w1`` — the float-parity rule the oracle compare
    depends on."""

    def __init__(self, weights: np.ndarray, bias: np.ndarray):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = np.asarray(bias, dtype=np.float64)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        out = np.broadcast_to(self.bias, (len(x), len(self.bias))).copy()
        for i in range(self.weights.shape[0]):
            out += x[:, i:i + 1] * self.weights[i]
        return out


def make_scorer(model_ref, feature_cols: list[str], mode: str = "class",
                inverse_norm=None):
    """Build the actor class for ``map_batches`` (T1 pattern)."""

    class Scorer:
        def __init__(self):
            self.model = ray.get(model_ref)       # once per actor
            self.feature_cols = feature_cols

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            x = df[self.feature_cols].to_numpy(np.float64)
            live = ~(x == 0).all(axis=1)          # zero-mask skip (M12)
            df = df.copy()
            if mode == "proba":
                # probability mode keeps the raw logit vector, one
                # column per class (reference pytorch/predict.py:527-528
                # stores the un-argmaxed vector); masked rows carry the
                # sentinel in every class column
                logits = self.model(x[live]) if live.any() else None
                k = logits.shape[1] if logits is not None else \
                    len(self.model.bias)
                for c in range(k):
                    col = np.full(len(df), SENTINEL, dtype=np.float64)
                    if logits is not None:
                        col[live] = logits[:, c]
                    df[f"score_{c}"] = col
                return df
            out = np.full(len(df), SENTINEL, dtype=np.float64)
            if live.any():
                logits = self.model(x[live])
                if mode == "class":
                    pred = np.argmax(logits, axis=1).astype(np.float64)
                else:
                    pred = logits[:, 0]
                    if inverse_norm is not None:
                        pred = inverse_norm(pred)
                out[live] = pred                  # scatter back (M12)
            df["prediction"] = out
            return df

    return Scorer


def score(ds: rd.Dataset, model: LinearModel, feature_cols: list[str],
          mode: str = "class", inverse_norm=None, batch_size: int = 8192,
          concurrency=(1, 8)) -> rd.Dataset:
    """Score a dataset with an actor pool holding broadcast weights."""
    model_ref = ray.put(model)
    cls = make_scorer(model_ref, feature_cols, mode, inverse_norm)
    return ds.map_batches(cls, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def conformal_intervals(ds: rd.Dataset, pred_col: str = "pred",
                        y_col: str = "y", fold_col: str = "fold",
                        cal_fold: int = 0, alpha: float = 0.1,
                        round_to: int = 6) -> rd.Dataset:
    """Split-conformal prediction intervals (Vovk; Lei et al. 2018)
    around ANY scorer: the calibration fold's absolute residuals give
    the finite-sample ``1−α`` half-width ``q̂`` = the
    ``⌈(n+1)(1−α)⌉``-th smallest calibration residual, and every
    non-calibration row gets ``[pred − q̂, pred + q̂]`` — distribution-
    free coverage, the missing uncertainty layer over the scoring
    actors (reference analog: the prediction-only path of
    ``pytorch/predict.py:521-531`` ships point estimates with no
    interval).

    Exactness: ``pred`` must arrive pre-rounded to ``round_to``;
    residuals convert to integer micro-units, so the distributed
    rank selection (value-histogram combiner + Sum merge, the
    exact_int_quantile pattern — shuffle bounded by DISTINCT residual
    values, not rows) is bit-exact against the SQL order-statistic
    twin. Returns test rows with ``(…, lo, hi)``.
    """
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round

    cal = ds.filter(expr=f"{fold_col} == {cal_fold}")

    def resid(df: pd.DataFrame) -> pd.DataFrame:
        r = np.abs(df[y_col].to_numpy(np.float64)
                   - df[pred_col].to_numpy(np.float64))
        r_u = sql_round(r * 1e6, 0).astype(np.int64)
        out = (pd.DataFrame({"r_u": r_u}).groupby("r_u", sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    hist = (cal.map_batches(resid, batch_format="pandas")
            .groupby("r_u").aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # bounded by distinct residual values
    if hist.empty:
        raise ValueError("conformal_intervals: empty calibration fold")
    hist = hist.sort_values("r_u")
    n = int(hist["n"].sum())
    rank = min(int(np.ceil((n + 1) * (1.0 - alpha))), n)
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    qhat = float(hist["r_u"].to_numpy(np.int64)[
        int(np.searchsorted(cum, rank))]) / 1e6

    test = ds.filter(expr=f"{fold_col} != {cal_fold}")

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        p = df[pred_col].to_numpy(np.float64)
        out = df.copy(deep=False)
        out["lo"] = sql_round(p - qhat, round_to) + 0.0
        out["hi"] = sql_round(p + qhat, round_to) + 0.0
        return out

    return test.map_batches(attach, batch_format="pandas")
