"""Tests for the ingest / retention / segment-decode lifecycle."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.pipelines.rollup_pipeline import (apply_retention,
                                                               ingest,
                                                               init_managed,
                                                               read_segments)
from sits_classification_ray.sources.synth import synth_crawl_arrays


@pytest.fixture(scope="module")
def managed_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("managed")
    base = synth_crawl_arrays(n_urls=40, mean_snaps=20, seed=11)
    pq.write_table(base, str(root / "base.parquet"))
    out = root / "out"
    cfg = EngineConfig(n_buckets=8)
    m0 = init_managed(str(root / "base.parquet"), str(out), cfg)
    return root, out, cfg, m0


def test_segment_decode_roundtrip(managed_env):
    root, out, cfg, _ = managed_env
    obs = pads.dataset(str(out / "obs"),
                       partitioning="hive").to_table().to_pandas()
    decoded = read_segments(str(out / "segments")).to_pandas()
    key = ["url", "metric", "warc_ts"]
    d = decoded.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(d) == 2 * len(obs)          # two metrics per snapshot
    # spot-check one series value-for-value
    u = d["url"].iloc[0]
    got = d[(d["url"] == u) & (d["metric"] == "text_len")]
    want = obs[obs["url"] == u].sort_values("warc_ts")
    np.testing.assert_array_equal(got["value"].to_numpy(),
                                  want["text_len"].to_numpy(np.float64))


def test_ingest_recomputes_only_affected(managed_env):
    root, out, cfg, _ = managed_env
    daily_before = pads.dataset(str(out / "daily"),
                                partitioning="hive").to_table().to_pandas()

    # increment: a few new urls plus later snapshots (different seed)
    inc = synth_crawl_arrays(n_urls=6, mean_snaps=10, seed=99)
    pq.write_table(inc, str(root / "inc.parquet"))
    m = ingest(str(out), str(root / "inc.parquet"), cfg)
    affected = set(m["affected_partitions"])
    assert 0 < len(affected) <= cfg.n_buckets
    for stage, info in m["stages"].items():
        assert info["partitions_computed"] == len(affected), stage

    daily_after = pads.dataset(str(out / "daily"),
                               partitioning="hive").to_table().to_pandas()
    # untouched buckets unchanged
    key = ["url", "metric", "bucket_ts"]
    cols = key + ["count", "sum", "last"]
    untouched = sorted(set(range(cfg.n_buckets)) - affected)
    a = (daily_before[daily_before["url_bucket"].isin(untouched)][cols]
         .sort_values(key).reset_index(drop=True))
    b = (daily_after[daily_after["url_bucket"].isin(untouched)][cols]
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # new urls present
    assert len(daily_after) > len(daily_before)

    # rerunning the same ingest is a no-op (registry already has it,
    # partitions recompute but results are idempotent)
    m2 = ingest(str(out), str(root / "inc.parquet"), cfg)
    daily_again = pads.dataset(str(out / "daily"),
                               partitioning="hive").to_table().to_pandas()
    x = daily_after[cols].sort_values(key).reset_index(drop=True)
    y = daily_again[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(x, y)


def test_retention_expires_old_rows(managed_env):
    root, out, _ = managed_env[0], managed_env[1], managed_env[2]
    cfg = EngineConfig(
        n_buckets=8,
        retention_seconds={"obs": 20 * 86400, "grid": 20 * 86400,
                           "hourly": 40 * 86400, "daily": None})
    obs_before = pads.dataset(str(out / "obs"),
                              partitioning="hive").to_table().to_pandas()
    now = obs_before["warc_ts"].max() + pd.Timedelta(days=1)
    dropped = apply_retention(str(out), cfg, now)
    assert dropped["obs"] > 0
    obs_after = pads.dataset(str(out / "obs"),
                             partitioning="hive").to_table().to_pandas()
    cutoff = pd.Timestamp(now) - pd.Timedelta(days=20)
    assert (obs_after["warc_ts"] >= cutoff).all()
    assert len(obs_after) == len(obs_before) - dropped["obs"]
    # daily untouched (None policy)
    assert "daily" not in dropped or dropped.get("daily", 0) == 0
    assert (Path(out) / "retention_log.json").exists()
    log = json.loads((Path(out) / "retention_log.json").read_text())
    assert log["dropped"]["obs"] == dropped["obs"]

def test_retention_metadata_skip(managed_env):
    """A second pass with the same cutoff must rewrite nothing: every
    file's footer min-timestamp now clears the cutoff, so the sweep is
    metadata-only (mtimes untouched)."""
    root, out, _ = managed_env[0], managed_env[1], managed_env[2]
    cfg = EngineConfig(n_buckets=8,
                       retention_seconds={"obs": 15 * 86400})
    obs = pads.dataset(str(out / "obs"),
                       partitioning="hive").to_table().to_pandas()
    now = obs["warc_ts"].max() + pd.Timedelta(days=1)
    apply_retention(str(out), cfg, now)
    mtimes = {f: f.stat().st_mtime_ns
              for f in (Path(out) / "obs").rglob("*.parquet")}
    dropped2 = apply_retention(str(out), cfg, now)
    assert dropped2["obs"] == 0
    log = json.loads((Path(out) / "retention_log.json").read_text())
    assert log["files_rewritten"]["obs"] == 0
    assert log["files_skipped_by_metadata"]["obs"] == len(mtimes)
    after = {f: f.stat().st_mtime_ns
             for f in (Path(out) / "obs").rglob("*.parquet")}
    assert after == mtimes


def test_compaction_preserves_rows(managed_env):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sits_classification_ray.pipelines.rollup_pipeline import (
        compact_partitions)

    root, out, cfg, _ = managed_env
    obs_root = Path(out) / "obs"
    before = pads.dataset(str(obs_root),
                          partitioning="hive").to_table().to_pandas()
    # fragment one partition artificially (what repeated ingests do)
    part = sorted(obs_root.glob("url_bucket=*"))[0]
    src = sorted(part.glob("*.parquet"))[0]
    t = pq.read_table(str(src))
    for i in range(3):
        pq.write_table(t.slice(i, 1), str(part / f"frag{i}.parquet"))
    extra = 3
    stats = compact_partitions(str(out), "obs", max_files_per_partition=1,
                               cfg=cfg)
    assert stats["files_merged"] >= 4        # src + 3 fragments merged
    assert len(list(part.glob("*.parquet"))) == 1
    after = pads.dataset(str(obs_root),
                         partitioning="hive").to_table().to_pandas()
    assert len(after) == len(before) + extra
    # rerun is a no-op on already-compacted dirs with threshold >= 1
    stats2 = compact_partitions(str(out), "obs", max_files_per_partition=1)
    assert stats2["files_merged"] == 0


def test_chunked_segments_roundtrip(managed_env):
    """Time-chunked encoding (several segments per series) must decode
    to exactly the same observation rows as whole-series segments."""
    import ray.data as rd

    from sits_classification_ray.pipelines.rollup_pipeline import (
        read_segments, segments_stage)
    from sits_classification_ray.stages.extract import to_long

    root, out, cfg, _ = managed_env
    obs = pads.dataset(str(out / "obs"), partitioning="hive") \
        .to_table().to_pandas()
    obs["url_bucket"] = obs["url_bucket"].astype("uint32")
    long_ds = to_long(rd.from_pandas(obs), cfg.metrics)

    seg_dir = root / "chunked_segments"
    segments_stage(long_ds, cfg, max_points_per_segment=7).write_parquet(
        str(seg_dir), partition_cols=["url_bucket"])
    seg_pdf = pads.dataset(str(seg_dir), partitioning="hive") \
        .to_table().to_pandas()
    assert (seg_pdf["n"] <= 7).all()
    # some series really did split
    assert (seg_pdf.groupby(["url", "metric"]).size() > 1).any()

    key = ["url", "metric", "warc_ts"]
    decoded = (read_segments(str(seg_dir)).to_pandas()
               .sort_values(key, kind="mergesort").reset_index(drop=True))
    want = (to_long(rd.from_pandas(obs), cfg.metrics).to_pandas()
            .sort_values(key, kind="mergesort").reset_index(drop=True))
    assert len(decoded) == len(want)
    pd.testing.assert_frame_equal(decoded[key + ["value"]],
                                  want[key + ["value"]],
                                  check_dtype=False)
