"""Object-store pressure: the pipeline must stream-and-spill, not OOM.

At 100 TB the data in flight always exceeds the object store; Ray
keeps the pipeline alive by spilling blocks to disk under
backpressure. This test runs the full rollup pipeline in a subprocess
whose object store is deliberately tiny relative to the shuffled
payload and asserts (a) it completes, (b) the tier output is identical
to the same pipeline under an unconstrained store.

Subprocess because the store size is fixed at ray.init and the test
session owns a normally-sized instance.
"""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import json, sys
import ray
import pyarrow.dataset as pads

store_bytes, crawl, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
kw = {"object_store_memory": store_bytes} if store_bytes else {}
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR", **kw)
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
from sits_classification_ray.config import EngineConfig
from sits_classification_ray.pipelines.rollup_pipeline import run_pipeline

run_pipeline(crawl, out, EngineConfig(n_buckets=16), telemetry=False,
             stages=("obs", "hourly", "daily", "weekly"))
daily = (pads.dataset(out + "/daily", partitioning="hive")
         .to_table().to_pandas())
key = sorted(daily.columns)
daily = daily[key].sort_values(key, kind="mergesort")
import pandas as pd
h = pd.util.hash_pandas_object(daily.astype(str), index=False).sum()
print(json.dumps({"rows": len(daily), "hash": int(h)}))
ray.shutdown()
"""


def _run(store_bytes: int, crawl: str, out: str) -> dict:
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "RAY_ADDRESS": "local", "HOME": "/root"}
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(store_bytes), crawl, out],
        capture_output=True, text=True, timeout=600, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_pipeline_completes_and_matches_under_tiny_object_store(tmp_path):
    from sits_classification_ray.sources.synth import generate_crawl_parquet

    crawl = generate_crawl_parquet(str(tmp_path / "crawl.parquet"),
                                   n_urls=4000, mean_snaps=50, seed=5,
                                   num_files=8)
    free = _run(0, crawl, str(tmp_path / "free"))
    # ~200 MB of html payload + shuffle traffic through a 150 MB store:
    # blocks MUST spill for this to finish
    tight = _run(150 * 2 ** 20, crawl, str(tmp_path / "tight"))
    assert tight == free and free["rows"] > 0
