"""Training driver: reference Trainer.fit lifecycle (epoch loop, valid
cadence, early stopping, snapshot/resume) + determinism contract."""

import numpy as np
import pandas as pd
import ray.data as rd


def _toy(n=120, d=6, k=3, seed=3):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, k, n)
    centers = rng.randn(k, d) * 2.0
    X = centers[y] + rng.randn(n, d) * 0.5
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
        "label": y.astype(np.int64),
    })


def test_fit_learns_and_matches_golden_twin():
    from sits_classification_ray.oracle.golden import _fit_linear_golden
    from sits_classification_ray.pipelines.trainer import RayTrainer

    df = _toy()
    ds = rd.from_pandas(df).repartition(4)
    tr = RayTrainer(ds, epochs=10, learning_rate=0.5,
                    use_class_weights=True)
    log = tr.fit()

    glog, gW, gb = _fit_linear_golden(df, epochs=10, learning_rate=0.5,
                                      use_class_weights=True)
    pd.testing.assert_frame_equal(log.reset_index(drop=True),
                                  glog.reset_index(drop=True))
    assert np.array_equal(tr.W, gW) and np.array_equal(tr.b, gb)

    # separable toy data: the fit actually learns
    train = log[log["mode"] == "train"]
    assert train["loss"].iloc[-1] < train["loss"].iloc[0]
    assert train["accuracy"].iloc[-1] > 0.8


def test_snapshot_resume_is_bit_identical(tmp_path):
    from sits_classification_ray.pipelines.trainer import RayTrainer

    df = _toy()
    ds = rd.from_pandas(df).repartition(3)

    straight = RayTrainer(ds, epochs=8, learning_rate=0.3,
                          store=str(tmp_path / "a"),
                          checkpoint_every_n_epochs=4)
    straight.fit()
    # checkpoints at the reference cadence (model_e{N}.npz + log.csv)
    assert (tmp_path / "a" / "model_e4.npz").exists()
    assert (tmp_path / "a" / "model_e8.npz").exists()
    assert (tmp_path / "a" / "log.csv").exists()

    resumed = RayTrainer(ds, epochs=8, learning_rate=0.3,
                         store=str(tmp_path / "b"))
    resumed.resume(tmp_path / "a" / "model_e4.npz")
    assert resumed.epoch == 4
    resumed.fit()

    assert np.array_equal(straight.W, resumed.W)
    assert np.array_equal(straight.b, resumed.b)
    pd.testing.assert_frame_equal(straight.get_log(), resumed.get_log())


def test_early_stopping_stops_on_diverging_valid_loss(tmp_path):
    from sits_classification_ray.pipelines.trainer import RayTrainer

    # flip the labels of the valid split (vec_id % 5 == 0): as the
    # model fits the train labels its confidence on the mislabeled
    # valid rows grows, so valid loss rises monotonically → the
    # reference rule (mean of last-N valid diffs > 0, patience
    # strikes) must fire before the epoch budget
    df = _toy()
    flip = (df["vec_id"] % 5 == 0).to_numpy()
    k = int(df["label"].max()) + 1
    df.loc[flip, "label"] = (df.loc[flip, "label"] + 1) % k
    ds = rd.from_pandas(df).repartition(2)
    tr = RayTrainer(ds, epochs=60, learning_rate=0.5,
                    early_stopping_smooth_period=3,
                    early_stopping_patience=2,
                    store=str(tmp_path))
    log = tr.fit()
    assert tr.epoch < 60
    # early stop snapshots the model like the reference does
    assert (tmp_path / f"model_e{tr.epoch}.npz").exists()
    assert (log["mode"] == "valid").any()


def test_no_valid_split_runs_all_epochs():
    from sits_classification_ray.pipelines.trainer import RayTrainer

    ds = rd.from_pandas(_toy(n=60)).repartition(2)
    tr = RayTrainer(ds, epochs=4, valid_mod=None, learning_rate=0.3)
    log = tr.fit()
    assert tr.epoch == 4
    assert set(log["mode"]) == {"train"}


def test_tune_search_ranks_trials():
    from sits_classification_ray.pipelines.trainer import tune_search

    ds = rd.from_pandas(_toy()).repartition(2)
    out = tune_search(ds, n_trials=3, seed=11, epochs=3)
    assert len(out) == 3
    assert sorted(out["rank"].tolist()) == [1, 2, 3]
    best = out[out["rank"] == 1].iloc[0]
    assert best["best_valid_accuracy"] == out["best_valid_accuracy"].max()


def test_quality_classifier_separates_planted_classes(ray_session):
    """Long stopword-free digit-heavy docs labeled 'de' vs short
    stopword-rich 'en' docs: the learned classifier must beat the
    majority-class baseline and rank en docs above de docs."""
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.pipelines.trainer import \
        quality_classifier_scores

    en = ["the cat is on the mat and it is warm",
          "a dog in the park is with the kids",
          "the sun is up and the day is fine",
          "a cup of tea on the table for me"]
    de = ["123456 987654 111222 333444 555666 777888",
          "000111 222333 444555 666777 888999 101010",
          "999888 777666 555444 333222 111000 121212",
          "135791 246802 112358 132134 155897 183141"]
    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": en + de,
        "lang": ["en"] * 4 + ["de"] * 4,
    })
    out = (quality_classifier_scores(rd.from_pandas(docs), epochs=20)
           .to_pandas().set_index("doc_id").sort_index())
    assert len(out) == 8
    assert out.loc[:3, "p_quality"].min() > out.loc[4:, "p_quality"].max()
    acc = (out["pred"] == out["label"]).mean()
    assert acc >= 0.75
