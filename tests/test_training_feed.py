"""Training-feed windows: padding, masking, collate shapes."""

import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.pipelines.training_feed import (
    PAD_VALUE, iter_training_batches, make_windows)


def _grid_pdf():
    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for url, n in [("https://a/", 10), ("https://b/", 4), ("https://c/", 3)]:
        for i in range(n):
            rows.append((url, np.uint32(0), "text_len",
                         base + np.timedelta64(i, "h"), float(i + 1)))
    return pd.DataFrame(rows, columns=["url", "url_bucket", "metric",
                                       "grid_ts", "value"])


def test_window_padding_and_mask():
    wins = (make_windows(rd.from_pandas(_grid_pdf()), seq_len=4)
            .to_pandas().sort_values(["url", "win_idx"])
            .reset_index(drop=True))
    # a: 10 pts -> 3 windows (4, 4, 2); b: 1 window (4); c: 1 window (3)
    assert wins.groupby("url")["win_idx"].count().to_dict() == {
        "https://a/": 3, "https://b/": 1, "https://c/": 1}
    last_a = wins[(wins["url"] == "https://a/") & (wins["win_idx"] == 2)]
    v = np.asarray(last_a["values"].iloc[0])
    m = np.asarray(last_a["mask"].iloc[0])
    assert last_a["n_valid"].iloc[0] == 2
    np.testing.assert_array_equal(v, [9.0, 10.0, PAD_VALUE, PAD_VALUE])
    np.testing.assert_array_equal(m, [True, True, False, False])
    # window starts align to sequence positions
    assert str(last_a["t0"].iloc[0]).startswith("2024-01-01 08")


def test_iter_training_batches_shapes():
    wins = make_windows(rd.from_pandas(_grid_pdf()), seq_len=4)
    batches = list(iter_training_batches(wins, batch_size=3))
    total = sum(len(b["url"]) for b in batches)
    assert total == 5
    for b in batches:
        assert b["X"].shape[1] == 4 and b["mask"].shape == b["X"].shape
        # padded positions are exactly the masked-out ones
        assert ((b["X"] == PAD_VALUE) | b["mask"]).all()


def test_pack_sequences_layout_and_partition_invariance():
    """The packing layout is a pure function of (doc_id order, token
    counts): windows tile the concatenated stream exactly, documents
    span boundaries when they must, and the result is identical at any
    block count (the prefix offsets are exchanged, not recomputed
    locally)."""
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.pipelines.training_feed import (
        pack_sequences)

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b c",            # 3 tokens  → [0,3)
                 "d e f g h",        # 5 tokens  → [3,8)   spans w0/w1
                 "",                 # 1 token   → [8,9)
                 "i j",              # 2 tokens  → [9,11)
                 "k l m n"],         # 4 tokens  → [11,15) spans w2/w3
    })
    out = (pack_sequences(rd.from_pandas(docs), max_tokens=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [3, 5, 1, 2, 4]
    assert out["tok_start"].tolist() == [0, 3, 8, 9, 11]
    assert out["win_first"].tolist() == [0, 0, 2, 2, 2]
    assert out["win_last"].tolist() == [0, 1, 2, 2, 3]
    assert out["win_offset"].tolist() == [0, 3, 0, 1, 3]

    out8 = (pack_sequences(rd.from_pandas(docs).repartition(8),
                           max_tokens=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out8)
