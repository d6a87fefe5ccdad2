import json
import shutil
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.functions.gorilla import decode_series
from sits_classification_ray.pipelines.rollup_pipeline import run_pipeline
from sits_classification_ray.sources.synth import generate_crawl_parquet


@pytest.fixture(scope="module")
def pipe_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    crawl = generate_crawl_parquet(str(root / "crawl.parquet"),
                                   n_urls=60, mean_snaps=25, seed=3)
    out = root / "out"
    cfg = EngineConfig(n_buckets=8)
    metrics = run_pipeline(crawl, str(out), cfg)
    return crawl, out, cfg, metrics


def test_pipeline_outputs_exist(pipe_env):
    _, out, cfg, metrics = pipe_env
    for stage in ["obs", "grid", "segments", "hourly", "daily", "weekly"]:
        assert (out / stage).exists(), stage
        assert metrics["stages"][stage]["rows_out"] > 0
    assert (out / "engine_config.json").exists()
    assert (out / "run_metrics.json").exists()
    assert metrics["docs_per_sec"] > 0


def test_pipeline_manifest_complete(pipe_env):
    _, out, cfg, _ = pipe_env
    rows = [json.loads(p.read_text())
            for p in (out / "_manifest").glob("*.json")]
    assert len(rows) == 6 * cfg.n_buckets
    assert all(r["state"] == "done" for r in rows)


def test_segments_roundtrip_from_disk(pipe_env):
    _, out, cfg, _ = pipe_env
    import pyarrow.dataset as pads
    seg = pads.dataset(str(out / "segments")).to_table().to_pandas()
    obs = pads.dataset(str(out / "obs")).to_table().to_pandas()
    assert len(seg) > 0
    row = seg.iloc[0]
    ts, vals = decode_series(row["ts_codes"], row["val_codes"], row["n"])
    src = obs[obs["url"] == row["url"]].sort_values("warc_ts")
    np.testing.assert_array_equal(
        ts, src["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
    np.testing.assert_array_equal(vals, src[row["metric"]].to_numpy(np.float64))
    # compression must beat raw 16 B/point on these integer streams
    assert (seg["ts_codes"].str.len() + seg["val_codes"].str.len()).sum() \
        < 16 * seg["n"].sum()


def test_resume_skips_complete_and_recomputes_deleted(pipe_env):
    crawl, out, cfg, _ = pipe_env
    import pyarrow.dataset as pads

    daily_before = pads.dataset(str(out / "daily"), partitioning="hive").to_table().to_pandas()
    victim = int(daily_before["url_bucket"].iloc[0])

    # full rerun with everything complete → no stage recomputes
    m2 = run_pipeline(crawl, str(out), cfg)
    assert all(s["partitions_computed"] == 0 for s in m2["stages"].values()
               if "partitions_computed" in s) or m2["stages"] == {}

    # delete one partition's outputs + manifest rows → only it recomputes
    from sits_classification_ray.state.manifest import Manifest
    man = Manifest(out)
    for stage in ["obs", "grid", "segments", "hourly", "daily", "weekly"]:
        shutil.rmtree(out / stage / f"url_bucket={victim}",
                      ignore_errors=True)
        man.invalidate(stage, victim)
    m3 = run_pipeline(crawl, str(out), cfg)
    for stage in ["obs", "grid", "segments", "hourly", "daily", "weekly"]:
        assert m3["stages"][stage]["partitions_computed"] == 1, stage

    daily_after = pads.dataset(str(out / "daily"), partitioning="hive").to_table().to_pandas()
    key = ["url", "metric", "bucket_ts"]
    a = daily_before.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = daily_after.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[key + ["count", "sum", "min", "max", "mean", "last"]],
        b[key + ["count", "sum", "min", "max", "mean", "last"]])


def test_stale_lineage_triggers_recompute(pipe_env, tmp_path):
    crawl, out, cfg, _ = pipe_env
    # config change ⇒ new lineage ⇒ full recompute of a fresh out dir
    out2 = tmp_path / "out2"
    cfg2 = EngineConfig(n_buckets=8, fill_method="locf")
    m = run_pipeline(crawl, str(out2), cfg2,
                     stages=("obs", "grid"))
    assert m["stages"]["obs"]["partitions_computed"] == 8
    assert m["stages"]["grid"]["partitions_computed"] == 8


def test_crawl_schema_validation(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from sits_classification_ray.sources.readers import (
        read_crawl, validate_crawl_schema)
    from sits_classification_ray.sources.synth import CRAWL_SCHEMA

    validate_crawl_schema(CRAWL_SCHEMA)                  # canonical: ok
    bad = pa.table({"url": pa.array(["a"]),
                    "warc_ts": pa.array(["not-a-ts"])})  # wrong type
    p = tmp_path / "bad.parquet"
    pq.write_table(bad, str(p))
    with pytest.raises(ValueError, match="warc_ts"):
        read_crawl(str(p), columns=["url", "warc_ts"])
    with pytest.raises(ValueError, match="missing column"):
        read_crawl(str(p), columns=["url", "html"])
