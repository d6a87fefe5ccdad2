"""CLI entry points drive the pipeline end-to-end in a subprocess
(its own Ray session — the `ray job submit`-shaped usage)."""

import json
import subprocess
import sys
from pathlib import Path

import pyarrow.parquet as pq

from sits_classification_ray.sources.synth import synth_crawl_arrays

REPO = str(Path(__file__).resolve().parent.parent)


def _cli(*args):
    env = {"PYTHONPATH": REPO, "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    out = subprocess.run(
        [sys.executable, "-m", "sits_classification_ray",
         "--num-cpus", "4", *args],
        capture_output=True, text=True, env=env, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]

def test_cli_run_then_retention(tmp_path):
    crawl = tmp_path / "crawl.parquet"
    pq.write_table(synth_crawl_arrays(n_urls=30, mean_snaps=10, seed=5),
                   str(crawl))
    out_dir = tmp_path / "out"
    res = json.loads(_cli("run", str(crawl), str(out_dir),
                          "--stages", "obs,hourly,daily"))
    assert set(res["stages"]) == {"obs", "hourly", "daily"}
    assert res["input_docs"] > 0
    assert (out_dir / "hourly").exists()
    assert "hw_telemetry" in res

    ret = json.loads(_cli("retention", str(out_dir),
                          "--now", "2024-02-20",
                          "--policy", '{"obs": 1728000}'))
    assert "obs" in ret


def test_cli_query_dataset_and_dataframe():
    # one Dataset-returning and one DataFrame-returning query — the
    # dispatch must not duck-type on .columns (Dataset has it too).
    out = subprocess.run(
        [sys.executable, "-m", "sits_classification_ray",
         "--num-cpus", "4", "query", "/root/testdata/sf0.001",
         "train_test_split_sizes", "distinct_lang_source"],
        capture_output=True, text=True, timeout=240,
        env={"PYTHONPATH": REPO, "PATH": "/usr/bin:/bin",
             "HOME": "/root", "RAY_ADDRESS": "local"})
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if " rows" in l]
    assert any(l.startswith("train_test_split_sizes:") for l in lines)
    assert any(l.startswith("distinct_lang_source:") for l in lines)


def test_driver_window_is_valid():
    """The 50-query correctness window must reference real queries,
    have no duplicates, and come first in ordered_queries()."""
    from sits_classification_ray.pipelines.queries import (DRIVER_WINDOW,
                                                           build_queries,
                                                           ordered_queries)
    qs = build_queries()
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    missing = [n for n in DRIVER_WINDOW if n not in qs]
    assert not missing, missing
    assert list(ordered_queries())[:50] == DRIVER_WINDOW
