"""Corpus curation: mixture sampling + decontamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_weighted_mixture_proportions_and_determinism():
    from sits_classification_ray.stages.curation import weighted_mixture
    n = 6000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["a", "b", "c"][i % 3] for i in range(n)),
    })
    w = {"a": 1.0, "b": 0.5}   # c dropped
    a = weighted_mixture(rd.from_arrow(t), w).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = weighted_mixture(rd.from_arrow(t).repartition(9), w).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partition invariant
    by = a.groupby("source").size()
    assert by["a"] == 2000                       # weight 1.0 keeps all
    assert abs(by["b"] / 2000 - 0.5) < 0.05      # ≈ half
    assert "c" not in by.index                   # weight 0 drops


def test_decontaminate_flags_overlap():
    from sits_classification_ray.stages.curation import decontaminate
    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            # contains an 8-token window of the benchmark
            "x quick brown fox jumps over the lazy dog y z",
            "completely different words with no overlap at all here ok",
            "short doc",                         # < 8 tokens, no window
        ]),
    })).repartition(2)
    out = decontaminate(docs, bench, k=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, False, False]
    assert out["n_hits"][0] >= 1
    assert out["n_windows"][2] == 0


def test_paragraph_dedup_first_wins_and_reassembly():
    from sits_classification_ray.stages.curation import paragraph_dedup
    # span_tokens=3; doc 0 owns spans A,B; doc 1 repeats A then adds C;
    # doc 2 is entirely doc 0's spans -> dropped
    A, B, C = "a b c", "d e f", "g h i"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([f"{A} {B}", f"{A} {C}", f"{B} {A}"]),
    })
    out = paragraph_dedup(rd.from_arrow(t), span_tokens=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [0, 1]          # doc 2 emptied
    assert out.loc[0, "text_kept"] == f"{A} {B}"
    assert out.loc[1, "text_kept"] == C           # A deduped away
    assert list(out["n_spans"]) == [2, 2]
    assert list(out["n_kept"]) == [2, 1]
    # partition-invariant
    out2 = paragraph_dedup(rd.from_arrow(t).repartition(3),
                           span_tokens=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_kcenter_select_gonzalez_properties():
    """Greedy k-center: partition-invariant, matches a hand single-
    process Gonzalez run, and radii are non-increasing."""
    from sits_classification_ray.stages.curation import kcenter_select
    rng = np.random.default_rng(7)
    n, d, k = 200, 8, 6
    X = rng.normal(size=(n, d))
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(X.tolist(),
                              pa.list_(pa.float64())),
    })
    a = kcenter_select(rd.from_arrow(t), k=k)
    b = kcenter_select(rd.from_arrow(t).repartition(7), k=k)
    pd.testing.assert_frame_equal(a, b)  # partition invariant

    # hand Gonzalez twin
    ids = np.arange(n)
    start = 0
    d2 = np.add.reduce((X - X[start]) ** 2, axis=1)
    sel = [start]
    radii = [-1.0]
    for _ in range(1, k):
        i = int(np.lexsort((ids, -d2))[0])
        sel.append(i)
        radii.append(float(np.sqrt(d2[i])))
        d2 = np.minimum(d2, np.add.reduce((X - X[i]) ** 2, axis=1))
    assert a["vec_id"].tolist() == sel
    np.testing.assert_allclose(a["radius"].to_numpy()[1:],
                               np.round(radii[1:], 6))
    # coverage radius shrinks (weakly) as centers are added
    r = a["radius"].to_numpy()[1:]
    assert (np.diff(r) <= 1e-12).all()
