"""CLI entry points — the analog of the reference's ``class_main_*``
driver scripts (sampling / train / predict →
run / ingest / retention / decode / query here).

The CLI owns the Ray session (guarded init + shutdown); library code
never does.

    python -m sits_classification_ray run INPUT OUT [--stages s1,s2]
    python -m sits_classification_ray ingest OUT NEW_INPUT
    python -m sits_classification_ray retention OUT --now TS \
        --policy '{"obs": 2592000, "grid": 2592000}'
    python -m sits_classification_ray decode-segments OUT [--limit N]
    python -m sits_classification_ray query SF_DIR NAME [NAME...]
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None, address: str = "local"):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": address, "include_dashboard": False,
                  "logging_level": "ERROR"}
        if address == "local" and num_cpus:
            # num_cpus only applies when starting a local session;
            # under `ray job submit` (--address auto) the cluster's
            # resources are fixed and the job attaches to them
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sits_classification_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--address", default="local",
                    help='"local" starts a session; "auto" attaches to '
                         "an existing cluster (ray job submit)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="full pipeline (resumable)")
    p_run.add_argument("input")
    p_run.add_argument("out")
    p_run.add_argument("--stages", default="obs,grid,segments,hourly,"
                                           "daily,weekly")
    p_run.add_argument("--no-resume", action="store_true")

    p_ing = sub.add_parser("ingest", help="register + process new input")
    p_ing.add_argument("out")
    p_ing.add_argument("new_input")

    p_ret = sub.add_parser("retention", help="apply retention windows")
    p_ret.add_argument("out")
    p_ret.add_argument("--now", required=True)
    p_ret.add_argument("--policy", required=True,
                       help='JSON {"table": max_age_seconds}')

    p_dec = sub.add_parser("decode-segments",
                           help="decode Gorilla segments to rows")
    p_dec.add_argument("out")
    p_dec.add_argument("--limit", type=int, default=10)

    p_q = sub.add_parser("query", help="run registered queries")
    p_q.add_argument("sf_dir")
    p_q.add_argument("names", nargs="+")

    args = ap.parse_args(argv)
    ray = _ray_session(args.num_cpus, args.address)
    try:
        if args.cmd == "run":
            from sits_classification_ray.pipelines.rollup_pipeline import \
                run_pipeline

            metrics = run_pipeline(
                args.input, args.out, resume=not args.no_resume,
                stages=tuple(args.stages.split(",")))
            print(json.dumps(metrics))
        elif args.cmd == "ingest":
            from sits_classification_ray.pipelines.rollup_pipeline import \
                ingest

            print(json.dumps(ingest(args.out, args.new_input)))
        elif args.cmd == "retention":
            from sits_classification_ray.config import EngineConfig
            from sits_classification_ray.pipelines.rollup_pipeline import \
                apply_retention

            cfg = EngineConfig(
                retention_seconds=json.loads(args.policy))
            print(json.dumps(apply_retention(args.out, cfg, args.now)))
        elif args.cmd == "decode-segments":
            from sits_classification_ray.pipelines.rollup_pipeline import \
                read_segments

            ds = read_segments(f"{args.out}/segments")
            rows = ds.take(args.limit)
            print(json.dumps({"rows": ds.count(),
                              "head": [{k: str(v) for k, v in r.items()}
                                       for r in rows]}))
        elif args.cmd == "query":
            from sits_classification_ray.pipelines.queries import \
                build_queries

            qs = build_queries()
            for name in args.names:
                res = qs[name](args.sf_dir)
                # ray.data.Dataset also has .columns()/.count(); dispatch
                # on concrete type, not duck-typing.
                import pandas as pd
                import pyarrow as pa
                if isinstance(res, pd.DataFrame):
                    n = len(res)
                elif isinstance(res, pa.Table):
                    n = res.num_rows
                else:
                    n = res.count()
                print(f"{name}: {n} rows")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
