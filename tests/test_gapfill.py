import numpy as np
import pandas as pd
import pytest

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.oracle.reference import (
    dedup_oracle,
    extract_oracle,
    gapfill_oracle,
    to_long_oracle,
)
from sits_classification_ray.stages.extract import extract, to_long
from sits_classification_ray.stages.gapfill import gapfill, gapfill_series
from sits_classification_ray.stages.series import assemble_series

KEY = ["url", "metric", "grid_ts"]


def _assembled(crawl_ds, cfg):
    return to_long(assemble_series(extract(crawl_ds, cfg), cfg), cfg.metrics)


def _oracle_long(crawl_pdf, cfg):
    obs = dedup_oracle(extract_oracle(crawl_pdf, cfg.n_buckets),
                       cfg.min_series_len)
    return to_long_oracle(obs, cfg.metrics)


@pytest.mark.parametrize("method,edges", [("linear", "both"),
                                          ("locf", "both"),
                                          ("linear", "none")])
def test_gapfill_matches_oracle(crawl_ds, crawl_pdf, method, edges):
    cfg = EngineConfig(fill_method=method, fill_edges=edges)
    got = gapfill(_assembled(crawl_ds, cfg), cfg).to_pandas()
    want = gapfill_oracle(_oracle_long(crawl_pdf, cfg), cfg.grid_seconds,
                          method, edges)
    g = got.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    w = want.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(
        g[KEY + ["value", "filled"]], w[KEY + ["value", "filled"]],
        check_dtype=False)


def test_kernel_edge_semantics():
    # obs at 00:30 and 02:30 with values 10, 20: hourly grid 01:00, 02:00
    h = 3_600_000_000
    ts = np.array([h // 2, 2 * h + h // 2], dtype=np.int64)
    vals = np.array([10.0, 20.0])
    grid, out, filled = gapfill_series(ts, vals, 3600, "linear", "both")
    np.testing.assert_array_equal(grid, [h, 2 * h])
    np.testing.assert_allclose(out, [12.5, 17.5])
    assert filled.all()

    # leading/trailing extension: obs inside a long grid span
    ts2 = np.array([5 * h, 6 * h], dtype=np.int64)
    vals2 = np.array([1.0, 3.0])
    grid2, out2, _ = gapfill_series(ts2, vals2, 3600, "linear", "both")
    np.testing.assert_array_equal(out2, [1.0, 3.0])

    # locf: grid point before first obs backfills under edges='both'
    ts3 = np.array([h + 1, 3 * h], dtype=np.int64)
    vals3 = np.array([7.0, 9.0])
    grid3, out3, _ = gapfill_series(ts3, vals3, 3600, "locf", "both")
    np.testing.assert_array_equal(grid3, [2 * h, 3 * h])
    np.testing.assert_array_equal(out3, [7.0, 9.0])


def test_fill_method_none():
    # "none": only exact grid hits carry values, everything else null
    h = 3_600_000_000
    ts = np.array([h, 2 * h + 5, 4 * h], dtype=np.int64)
    vals = np.array([1.0, 2.0, 4.0])
    grid, out, filled = gapfill_series(ts, vals, 3600, "none", "both")
    np.testing.assert_array_equal(grid, [h, 2 * h, 3 * h, 4 * h])
    np.testing.assert_array_equal(out[[0, 3]], [1.0, 4.0])
    assert np.isnan(out[[1, 2]]).all()
    np.testing.assert_array_equal(filled, [False, True, True, False])


def test_exact_grid_points_not_filled():
    h = 3_600_000_000
    ts = np.array([h, 2 * h, 4 * h], dtype=np.int64)
    vals = np.array([1.0, 2.0, 4.0])
    grid, out, filled = gapfill_series(ts, vals, 3600, "linear", "both")
    np.testing.assert_array_equal(grid, [h, 2 * h, 3 * h, 4 * h])
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(filled, [False, False, True, False])


def test_fill_method_seasonal():
    # seasonal: gaps copy the latest real value in the same weekly
    # lane; leading lane gaps backfill; laneless cells stay null
    h = 3_600_000_000
    w = 168 * h
    # obs at hour 1 of week0 and week1, and hour 2 of week1 only
    ts = np.array([h, w + h, w + 2 * h], dtype=np.int64)
    vals = np.array([10.0, 11.0, 22.0])
    grid, out, filled = gapfill_series(ts, vals, 3600, "seasonal",
                                       "both")
    gi = {int(g): i for i, g in enumerate(grid)}
    assert out[gi[h]] == 10.0                    # exact hit week0
    assert out[gi[w + h]] == 11.0                # exact hit week1
    assert out[gi[2 * h]] == 22.0                # leading backfill
    assert out[gi[w + 2 * h]] == 22.0            # exact hit
    # hour-3 lane has no observation in either week -> null
    assert np.isnan(out[gi[3 * h]]) and np.isnan(out[gi[w]])
    assert not filled[gi[h]] and filled[gi[2 * h]]

    # edges="none": no leading backfill within lanes
    _, out2, _ = gapfill_series(ts, vals, 3600, "seasonal", "none")
    assert np.isnan(out2[gi[2 * h]])
    assert out2[gi[w + 2 * h]] == 22.0
