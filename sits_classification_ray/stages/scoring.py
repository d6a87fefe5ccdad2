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
