"""Histogram-GBDT stump boosting: determinism + learning properties."""

import numpy as np
import pandas as pd
import ray.data as rd


def _blob_df(n=400, d=6, seed=5):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    # target depends on two features → stumps must find them
    y = (X[:, 0] > 0.3).astype(np.int32) + 2 * (X[:, 2] > -0.5)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(X),
                         "label": y.astype(np.int32)})


def test_gbdt_fit_partition_invariant_and_learns():
    from sits_classification_ray.stages.gbdt import gbdt_fit
    df = _blob_df()
    a = gbdt_fit(rd.from_pandas(df), n_rounds=6, n_bins=16)
    b = gbdt_fit(rd.from_pandas(df).repartition(9), n_rounds=6, n_bins=16)
    pd.testing.assert_frame_equal(a, b)   # int-histogram determinism
    assert len(a) == 6
    # the first two splits must pick the two informative features
    assert set(a.head(2)["feature"]) == {0, 2}
    # boosting gains are found at every round on this signal
    assert (a["gain"] > 0).all()


def test_gbdt_predict_reduces_error_vs_base():
    from sits_classification_ray.stages.gbdt import gbdt_fit, gbdt_predict
    df = _blob_df(seed=11)
    ds = rd.from_pandas(df)
    model = gbdt_fit(ds, n_rounds=8, n_bins=16)
    base = float(df["label"].mean())
    pred = (gbdt_predict(ds, model, base).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    y = df["label"].to_numpy(np.float64)
    rmse_model = float(np.sqrt(((pred["pred"] - y) ** 2).mean()))
    rmse_base = float(np.sqrt(((base - y) ** 2).mean()))
    assert rmse_model < 0.6 * rmse_base
    assert len(pred) == len(df)
