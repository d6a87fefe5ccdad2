"""Unbounded ordered scans must equal the salted-partition operators
with series spanning multiple sorted blocks."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from sits_classification_ray.stages.scan_sorted import (
    running_sum_unbounded,
    snapshot_deltas_unbounded,
)
from sits_classification_ray.stages.windows import (running_sum,
                                                    snapshot_deltas)

KEY = ["url", "metric", "warc_ts"]


@pytest.fixture(scope="module")
def long_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(4)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    parts = []
    for url, n in [("https://huge.example.com/", 4000),
                   ("https://a.example.com/", 5),
                   ("https://b.example.com/", 60)]:
        offs = np.sort(rng.choice(50 * 86400, size=n, replace=False))
        for metric in ("text_len", "word_count"):
            parts.append(pd.DataFrame({
                "url": url,
                "url_bucket": np.uint32(0),
                "metric": metric,
                "warc_ts": base + (offs * 1_000_000).astype("timedelta64[us]"),
                "value": rng.integers(1, 5000, n).astype(np.float64),
            }))
    return pd.concat(parts, ignore_index=True)


def test_running_sum_unbounded_matches(long_pdf):
    ds = rd.from_pandas(long_pdf)
    want = (running_sum(ds).to_pandas()
            .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    got = (running_sum_unbounded(ds, num_blocks=12).to_pandas()
           .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[KEY + ["value", "running_sum"]],
                                  want[KEY + ["value", "running_sum"]],
                                  check_dtype=False)


def test_snapshot_deltas_unbounded_matches(long_pdf):
    ds = rd.from_pandas(long_pdf)
    want = (snapshot_deltas(ds).to_pandas()
            .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    got = (snapshot_deltas_unbounded(ds, num_blocks=12).to_pandas()
           .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[KEY + ["value", "delta"]],
                                  want[KEY + ["value", "delta"]],
                                  check_dtype=False)


def test_sessionize_unbounded_matches(long_pdf):
    from sits_classification_ray.stages.scan_sorted import (
        sessionize_unbounded)
    from sits_classification_ray.stages.windows import sessionize

    obs = (long_pdf[long_pdf["metric"] == "text_len"]
           [["url", "url_bucket", "warc_ts", "value"]])
    ds = rd.from_pandas(obs)
    k = ["url", "warc_ts"]
    want = (sessionize(ds, gap_seconds=3 * 3600).to_pandas()
            .sort_values(k, kind="mergesort").reset_index(drop=True))
    got = (sessionize_unbounded(ds, gap_seconds=3 * 3600,
                                num_blocks=12).to_pandas()
           .sort_values(k, kind="mergesort").reset_index(drop=True))
    assert want["session_id"].max() > 3      # gaps actually split
    pd.testing.assert_frame_equal(got[k + ["session_id"]],
                                  want[k + ["session_id"]],
                                  check_dtype=False)


def test_rolling_mean_unbounded_matches(long_pdf):
    from sits_classification_ray.stages.scan_sorted import (
        rolling_mean_unbounded)
    from sits_classification_ray.stages.windows import rolling_mean

    ds = rd.from_pandas(long_pdf)
    want = (rolling_mean(ds, window=4).to_pandas()
            .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    got = (rolling_mean_unbounded(ds, window=4, num_blocks=12).to_pandas()
           .sort_values(KEY, kind="mergesort").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[KEY + ["value", "rolling_mean"]],
                                  want[KEY + ["value", "rolling_mean"]],
                                  check_dtype=False)


def test_global_rank_multi_block_matches_sequential():
    from sits_classification_ray.stages.scan_sorted import global_rank

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "v": rng.integers(0, 40, size=500)})
    out = (global_rank(rd.from_pandas(df).repartition(7), ["v", "id"],
                       num_blocks=7)
           .to_pandas().sort_values("rn").reset_index(drop=True))
    exp = df.sort_values(["v", "id"]).reset_index(drop=True)
    assert out["id"].tolist() == exp["id"].tolist()
    assert out["rn"].tolist() == list(range(1, 501))
    np.testing.assert_allclose(out["percentile"].to_numpy(),
                               np.arange(500) / 499.0)


def test_ntile_sql_semantics(ray_session):
    """First n%k tiles get one extra row — exact SQL NTILE sizes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sits_classification_ray.stages.scan_sorted import ntile

    t = pa.table({"id": pa.array(range(10), pa.int64()),
                  "v": pa.array(np.arange(10)[::-1], pa.int64())})
    out = ntile(rd.from_arrow(t).repartition(3), ["v", "id"],
                k=4).to_pandas().sort_values("v")
    # 10 rows, 4 tiles -> sizes 3,3,2,2 in v-order
    assert out["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # total order: smallest v in tile 1
    assert out.iloc[0]["v"] == 0 and out.iloc[0]["tile"] == 1


def test_global_prefix_sum_exclusive():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sits_classification_ray.stages.scan_sorted import (
        global_prefix_sum)

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"k": np.arange(500),
                       "v": rng.integers(1, 50, size=500)})
    out = (global_prefix_sum(rd.from_pandas(df).repartition(7),
                             ["k"], "v")
           .to_pandas().sort_values("k", ignore_index=True))
    want = np.concatenate(([0], np.cumsum(df["v"].to_numpy())[:-1]))
    np.testing.assert_array_equal(out["prior"].to_numpy(), want)
