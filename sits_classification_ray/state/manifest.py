"""Per-partition lineage checkpoints — resumable pipeline state.

Generalizes the reference's three resume patterns (SURVEY §4): per-tile
skip-if-exists (``pytorch/predict.py:108-109``), the parse-once dataset
cache (``pytorch/utils/Dataset.py:39-44``) and epoch snapshot/resume
(``pytorch/utils/trainer.py:126-143``) into one mechanism: every
pipeline stage writes its output partitioned by ``url_bucket``; a
manifest row ``(stage, partition_id, lineage_hash, row_count, state)``
is committed only after the partition's files are fully written; a
rerun recomputes exactly the partitions whose manifest row is missing
or whose lineage hash changed (input files or config changed), and
overwrites them idempotently.

The manifest is a directory of one JSON file per (stage, partition) so
concurrent writers never contend on a shared file — commit is an
atomic rename.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path


def lineage_hash(input_files: list[str], config_json: str) -> str:
    """Hash of the inputs a partition's output depends on: the sorted
    input fragment list (path, size, mtime) + the engine config."""
    h = hashlib.sha256()
    for f in sorted(input_files):
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    h.update(config_json.encode())
    return h.hexdigest()[:16]


class Manifest:
    def __init__(self, root: str | Path):
        self.dir = Path(root) / "_manifest"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, stage: str, partition_id: int) -> Path:
        return self.dir / f"{stage}__{partition_id:05d}.json"

    def complete(self, stage: str, partition_id: int, lineage: str) -> bool:
        p = self._path(stage, partition_id)
        if not p.exists():
            return False
        try:
            row = json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return False
        return row.get("state") == "done" and row.get("lineage_hash") == lineage

    def incomplete_partitions(self, stage: str, partition_ids: list[int],
                              lineage: str) -> list[int]:
        return [p for p in partition_ids if not self.complete(stage, p, lineage)]

    def commit(self, stage: str, partition_id: int, lineage: str,
               row_count: int) -> None:
        p = self._path(stage, partition_id)
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps({
            "stage": stage,
            "partition_id": partition_id,
            "lineage_hash": lineage,
            "row_count": int(row_count),
            "state": "done",
        }))
        tmp.rename(p)          # atomic commit

    def rows(self) -> list[dict]:
        out = []
        for f in sorted(self.dir.glob("*.json")):
            try:
                out.append(json.loads(f.read_text()))
            except (json.JSONDecodeError, OSError):
                continue
        return out

    def invalidate(self, stage: str, partition_id: int) -> None:
        self._path(stage, partition_id).unlink(missing_ok=True)
