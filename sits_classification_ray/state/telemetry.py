"""1 Hz hardware telemetry sampler — the reference ``HWMonitor``
re-expressed without psutil (reads /proc directly; psutil is absent
from the runtime image).

Mirrors ``pytorch/utils/hw_monitor.py:12-100``: a daemon thread samples
CPU utilization, memory, and disk I/O once per ``interval`` seconds
into a CSV; ``summary()`` finalizes mean/p10/p90 per metric exactly as
``hwmon_stats`` does (``hw_monitor.py:137-177``). Start/stop wraps a
pipeline run the way the reference wraps training
(``pytorch/train.py:52-56``); ``run_pipeline(telemetry=...)`` plugs it
in and stores the summary in ``run_metrics.json``.
"""

from __future__ import annotations

import csv
import re
import threading
import time
from pathlib import Path

import numpy as np

_PROC = Path("/proc")


def _cpu_times() -> tuple[int, int]:
    """(busy, total) jiffies aggregated over all CPUs."""
    parts = (_PROC / "stat").read_text().splitlines()[0].split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)   # idle + iowait
    total = sum(vals)
    return total - idle, total


def _mem_used_frac() -> float:
    info = {}
    for line in (_PROC / "meminfo").read_text().splitlines():
        k, v = line.split(":", 1)
        info[k] = int(v.strip().split()[0])
    total = info.get("MemTotal", 1)
    avail = info.get("MemAvailable", info.get("MemFree", 0))
    return 1.0 - avail / total


#: partition names to exclude from /proc/diskstats sums.  Whole devices
#: like ``nvme0n1`` / ``md0`` / ``dm-0`` end in digits too, so a simple
#: "ends in a digit" test would zero out disk stats on NVMe-only hosts;
#: match the actual partition-naming schemes instead.
_PARTITION_RE = re.compile(
    r"^(?:[hsv]d[a-z]+\d+|nvme\d+n\d+p\d+|mmcblk\d+p\d+|md\d+p\d+)$")


def _disk_sectors() -> tuple[int, int]:
    """(read, written) sectors summed over physical block devices."""
    rd = wr = 0
    try:
        for line in (_PROC / "diskstats").read_text().splitlines():
            f = line.split()
            if len(f) < 10 or _PARTITION_RE.match(f[2]):
                continue                       # skip partitions (sda1…)
            rd += int(f[5])
            wr += int(f[9])
    except OSError:
        pass
    return rd, wr


class HWSampler:
    """Daemon-thread sampler (default 1 Hz, like the reference's
    ``HWMonitor(1, dir, …)``). Usage::

        s = HWSampler(out_csv); s.start(); ...; s.stop()
        stats = s.summary()     # {metric: {mean, p10, p90}}
    """

    COLUMNS = ["ts", "cpu_util", "mem_used_frac",
               "disk_read_mb_s", "disk_write_mb_s"]

    def __init__(self, out_csv: str | Path | None = None,
                 interval: float = 1.0):
        self.out_csv = Path(out_csv) if out_csv else None
        self.interval = interval
        self.rows: list[list[float]] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _loop(self) -> None:
        busy0, total0 = _cpu_times()
        rd0, wr0 = _disk_sectors()
        t_prev = time.monotonic()
        while not self._stop.wait(self.interval):
            busy1, total1 = _cpu_times()
            rd1, wr1 = _disk_sectors()
            t_now = time.monotonic()
            dt = max(t_now - t_prev, 1e-9)
            d_total = max(total1 - total0, 1)
            self.rows.append([
                time.time(),
                (busy1 - busy0) / d_total,
                _mem_used_frac(),
                (rd1 - rd0) * 512 / dt / 2**20,
                (wr1 - wr0) * 512 / dt / 2**20,
            ])
            busy0, total0, rd0, wr0, t_prev = busy1, total1, rd1, wr1, t_now

    def start(self) -> "HWSampler":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval * 3)
        if self.out_csv is not None:
            self.out_csv.parent.mkdir(parents=True, exist_ok=True)
            with self.out_csv.open("w", newline="") as fh:
                w = csv.writer(fh)
                w.writerow(self.COLUMNS)
                w.writerows(self.rows)

    def summary(self) -> dict:
        """mean / p10 / p90 per metric (reference ``hwmon_stats``)."""
        if not self.rows:
            return {}
        arr = np.asarray(self.rows, dtype=np.float64)
        out = {}
        for i, name in enumerate(self.COLUMNS[1:], start=1):
            col = arr[:, i]
            out[name] = {
                "mean": round(float(col.mean()), 4),
                "p10": round(float(np.percentile(col, 10)), 4),
                "p90": round(float(np.percentile(col, 90)), 4),
            }
        out["n_samples"] = len(self.rows)
        return out
