"""1 Hz telemetry sampler (reference HWMonitor analog)."""

import time

import numpy as np

from sits_classification_ray.state.telemetry import HWSampler


def test_sampler_collects_and_summarizes(tmp_path):
    csv_path = tmp_path / "hw.csv"
    s = HWSampler(csv_path, interval=0.1).start()
    # burn a little CPU so utilization is non-trivial
    x = np.random.default_rng(0).random((400, 400))
    for _ in range(20):
        x = x @ x.T / 400
        time.sleep(0.02)
    time.sleep(0.3)
    s.stop()
    stats = s.summary()
    assert stats["n_samples"] >= 3
    assert 0.0 <= stats["cpu_util"]["mean"] <= 1.0
    assert 0.0 < stats["mem_used_frac"]["mean"] < 1.0
    for m in ["cpu_util", "mem_used_frac", "disk_read_mb_s",
              "disk_write_mb_s"]:
        assert stats[m]["p10"] <= stats[m]["p90"]
    lines = csv_path.read_text().splitlines()
    assert lines[0].startswith("ts,cpu_util")
    assert len(lines) == stats["n_samples"] + 1
