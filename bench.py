"""Benchmark harness: end-to-end rollup throughput (docs/sec) + query timings.

Headline: the full checkpointed pipeline (extract → assemble → gap-fill
→ Gorilla segments → hourly/daily/weekly tiers, all written to Parquet)
over a deterministic synthetic crawl table derived from the scale
factor in ``$GRAFT_SF_DIR``. Prints ONE JSON line.

``--scaling`` runs the same job in fresh processes at num_cpus=8 and
num_cpus=32 on the same input and reports both throughputs plus the
scaling efficiency (the sandbox substitution for the N-vs-4N-node
cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
#: crawl rows scale with the sf dir's events table (deterministic).
#: default ×80 ≈ 8M docs at sf0.1 — small enough to generate in ~1 min,
#: large enough that per-stage scheduling latency stops dominating.
DOCS_MULT = int(os.environ.get("GRAFT_BENCH_MULT", "80"))
#: GRAFT_BENCH_TMPFS=1 puts input + output on /dev/shm — removes the
#: single VM disk from the measurement so --scaling exercises the
#: CPU-bound regime (the N-vs-4N *node* cluster analog, where each
#: node brings its own disk bandwidth).
TMPFS = os.environ.get("GRAFT_BENCH_TMPFS", "0") == "1"
_BASE = Path("/dev/shm" if TMPFS else "/tmp")
_CACHE = _BASE / "sits_bench_cache"
#: --skew plants a head url with this many snapshots (~12% of all
#: docs at the default input size) to prove salting absorbs it.
HEAD_SNAPS = int(os.environ.get("GRAFT_BENCH_HEAD", "1000000"))


def bench_input(sf_dir: str, head_snaps: int | None = None) -> str:
    """Deterministic crawl parquet sized from the sf dir's events table
    (rows ≈ DOCS_MULT × |events|). Cached across runs so --scaling's
    two sessions read the identical file."""
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    tag = f"{Path(sf_dir).name}_x{DOCS_MULT}"
    if head_snaps:
        tag += f"_head{head_snaps}"
    path = _CACHE / f"crawl_{tag}"
    if path.exists():
        return str(path)
    _CACHE.mkdir(parents=True, exist_ok=True)
    from sits_classification_ray.sources.synth import generate_crawl_parquet

    target_rows = n_events * DOCS_MULT
    tmp = Path(str(path) + ".tmp")
    generate_crawl_parquet(str(tmp), n_urls=max(100, target_rows // 50),
                           mean_snaps=40, seed=42, span_days=60,
                           row_group_size=200_000, target_rows=target_rows,
                           num_files=32, head_snaps=head_snaps)
    tmp.rename(path)
    return str(path)


def _mute_known_benign_warnings() -> None:
    """Same documented mute as tools/check_correctness.py: Ray 2.49's
    sort shuffle emits schema-less EMPTY blocks for key ranges that
    caught no rows and the executor logs a 'RefBundle with a different
    schema' line for each — verified harmless (tests/
    test_shuffle_salting.py::test_empty_blocks_are_benign_at_consumption)
    and pure noise in the bench stderr tail. Nothing else is filtered."""
    import logging

    class _Mute(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return ("RefBundle with a different schema"
                    not in record.getMessage())

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_Mute())


def _probe_task(n_iter: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(n_iter):
        x += (i * i) % 7
    return time.perf_counter() - t0


def machine_probe(n_procs: int | None = None) -> dict:
    """Machine-ceiling probe: a raw ``multiprocessing`` busy-loop — no
    Ray, no I/O, no engine code — measuring how many effective cores
    this host delivers for ``n_procs`` spinners RIGHT NOW.  This shared
    VM's deliverable parallelism drifts with neighbor load (round-2
    control experiment: 11.6–26 effective cores for 32 procs on the
    same box, same code); embedding the probe next to every headline
    number makes the bench JSON self-interpreting:
    ``probe_efficiency`` ≈ 1.0 → the engine number reflects the engine;
    « 1.0 → the host was oversubscribed when measured."""
    import multiprocessing as mp

    n_procs = n_procs or NUM_CPUS
    n_iter = int(os.environ.get("GRAFT_PROBE_ITERS", "6000000"))
    t1 = min(_probe_task(n_iter) for _ in range(2))      # serial, best-of-2
    with mp.get_context("fork").Pool(n_procs) as pool:
        pool.map(_probe_task, [1000] * n_procs)          # warm the pool
        t0 = time.perf_counter()
        pool.map(_probe_task, [n_iter] * n_procs)
        tn = time.perf_counter() - t0
    return {"n_procs": n_procs,
            "serial_sec": round(t1, 3),
            "parallel_sec": round(tn, 3),
            "effective_cores": round(n_procs * t1 / tn, 1),
            "probe_efficiency": round(t1 / tn, 3)}


def _init_ray():
    """Start Ray for a bench leg. With ``GRAFT_NODES`` set, build a
    SIMULATED MULTI-NODE cluster (``ray.cluster_utils.Cluster``):
    separate raylets and per-node object stores on this host, so
    scheduling, locality and inter-node object transfer are all real —
    the closest this sandbox gets to the north rule's N-vs-4N-node
    criterion. Returns the cluster handle (None in local mode)."""
    import ray

    n_nodes = int(os.environ.get("GRAFT_NODES", "0"))
    if n_nodes:
        from ray.cluster_utils import Cluster

        node_cpus = int(os.environ.get("GRAFT_NODE_CPUS", "8"))
        store = int(os.environ.get("GRAFT_NODE_STORE_GB", "4")) * 2 ** 30
        cluster = Cluster()
        for i in range(n_nodes):
            kw = {"include_dashboard": False} if i == 0 else {}
            cluster.add_node(num_cpus=node_cpus,
                             object_store_memory=store, **kw)
        ray.init(address=cluster.address, logging_level="ERROR")
        return cluster
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    return None


def run_bench(skew: bool = False) -> dict:
    import ray
    import ray.data as rd

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from sits_classification_ray import EngineConfig
    from sits_classification_ray.pipelines.rollup_pipeline import run_pipeline

    crawl = bench_input(SF_DIR, head_snaps=HEAD_SNAPS if skew else None)
    # GRAFT_SHARD="i/n" restricts this leg to every n-th input file —
    # the zero-transfer control for --scaling-nodes-control, where n
    # independent Ray sessions each process a disjoint shard so no
    # object can ever cross between them.
    shard = os.environ.get("GRAFT_SHARD")
    shard_files: list | None = None
    if shard:
        i, n = (int(x) for x in shard.split("/"))
        shard_files = sorted(str(f) for f in Path(crawl).glob("*.parquet")
                             )[i::n]
    # shard legs run concurrently — a per-leg spin probe would perturb
    # its siblings' timed sections, so the control caller probes once
    probe = machine_probe() if shard is None else {"probe_efficiency": None}

    cluster = _init_ray()
    _mute_known_benign_warnings()
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    # warm OS page cache (untimed) so both scaling runs measure compute
    rd.read_parquet(crawl).count()

    out = _BASE / ("sits_bench_out" if shard is None
                   else f"sits_bench_out_shard{shard.replace('/', '_')}")
    shutil.rmtree(out, ignore_errors=True)
    # flush pending writeback (input generation / previous outputs) so
    # the timed section isn't competing with stale dirty pages
    os.sync()
    cfg = EngineConfig(n_buckets=64)

    # headline: the continuous-aggregate maintenance path — extract →
    # assemble (checkpointed obs) → hourly → daily → weekly tiers
    t0 = time.perf_counter()
    metrics = run_pipeline(shard_files if shard_files is not None else crawl,
                           str(out), cfg, resume=False,
                           stages=("obs", "hourly", "daily", "weekly"))
    elapsed = time.perf_counter() - t0

    queries = {f"pipeline_{k}": v["seconds"]
               for k, v in metrics["stages"].items()}

    if shard is None:
        # secondary pipelines, timed separately (I/O-heavy grid write
        # would otherwise hide the rollup path's CPU scaling on one
        # shared disk); skipped in shard mode (control legs compare
        # the headline only)
        t1 = time.perf_counter()
        m2 = run_pipeline(crawl, str(out), cfg, resume=True,
                          stages=("grid",))
        queries["gapfill_grid"] = round(time.perf_counter() - t1, 3)
        t2 = time.perf_counter()
        m3 = run_pipeline(crawl, str(out), cfg, resume=True,
                          stages=("segments",))
        queries["gorilla_segments"] = round(time.perf_counter() - t2, 3)

    result = {
        "metric": ("skewed_rollup_tiers_seconds" if skew
                   else "e2e_rollup_tiers_seconds"),
        "value": round(elapsed, 3),
        "unit": "sec",
        "queries": queries,
        "sf": Path(SF_DIR).name,
        "num_cpus": (int(os.environ["GRAFT_NODES"])
                     * int(os.environ.get("GRAFT_NODE_CPUS", "8"))
                     if os.environ.get("GRAFT_NODES") else NUM_CPUS),
        "input_docs": metrics.get("input_docs"),
        "docs_per_sec": round(metrics.get("input_docs", 0) / elapsed, 1),
        "tmpfs": TMPFS,
        "probe_efficiency": probe["probe_efficiency"],
        "probe": probe,
        **({"head_snaps": HEAD_SNAPS} if skew else {}),
        **({"nodes": int(os.environ["GRAFT_NODES"]),
            "node_cpus": int(os.environ.get("GRAFT_NODE_CPUS", "8"))}
           if os.environ.get("GRAFT_NODES") else {}),
    }
    ray.shutdown()
    if cluster is not None:
        cluster.shutdown()
    # second probe AFTER the timed section (post-shutdown, so the fork
    # pool never coexists with Ray workers): neighbor load on this
    # shared VM drifts within minutes, so bracketing the run makes the
    # headline interpretable even when the host changes mid-measurement
    if shard is None:
        result["probe_end"] = machine_probe()
    return result


def run_compute_bench() -> dict:
    """CPU-bound leg for the scaling criterion: sha1-dominated operator
    stages (minhash signatures, simhash, language id) over document
    texts. Map-only actor pools — no shuffle, negligible I/O — so the
    measured scaling is the engine's compute scaling, the regime a
    multi-node cluster actually adds (each node brings its own memory
    bus; this VM's single bus caps the streaming pipeline instead)."""
    import numpy as np
    import ray
    import ray.data as rd

    sys.path.insert(0, str(Path(__file__).resolve().parent))

    n_docs = int(os.environ.get("GRAFT_COMPUTE_DOCS", "1200000"))
    crawl = bench_input(SF_DIR)
    probe = machine_probe()

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    _mute_known_benign_warnings()
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from sits_classification_ray.stages.dedup_docs import (minhash_signatures,
                                                           simhash)
    from sits_classification_ray.stages.textstats import lang_id

    files = sorted(Path(crawl).glob("*.parquet"))
    # limit() leaves a handful of blocks — repartition to a FIXED
    # block count so both scaling legs process identical block sizes
    # (block-size-dependent kernel costs would otherwise leak into the
    # efficiency ratio); 256 blocks ≥ 8 tasks per CPU at 32 CPUs
    ds = (rd.read_parquet([str(f) for f in files], columns=["url", "text"])
          .limit(n_docs)
          .map_batches(lambda df: df.assign(
              doc_id=np.arange(len(df), dtype=np.int64)),
              batch_format="pandas")
          .repartition(256)
          .materialize())
    pool = (NUM_CPUS, NUM_CPUS)

    t0 = time.perf_counter()
    n1 = minhash_signatures(ds, num_perm=64, shingle_k=5,
                            concurrency=pool).count()
    t_minhash = time.perf_counter() - t0
    t0 = time.perf_counter()
    n2 = simhash(ds, concurrency=pool).count()
    t_simhash = time.perf_counter() - t0
    t0 = time.perf_counter()
    n3 = lang_id(ds.map_batches(
        lambda df: df.assign(lang="en"), batch_format="pandas"),
        concurrency=pool).count()
    t_langid = time.perf_counter() - t0
    assert n1 == n2 == n3 == n_docs
    total = t_minhash + t_simhash + t_langid
    result = {
        "metric": "compute_ops_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"minhash_signatures": round(t_minhash, 3),
                    "simhash": round(t_simhash, 3),
                    "langid": round(t_langid, 3)},
        "sf": Path(SF_DIR).name,
        "num_cpus": NUM_CPUS,
        "input_docs": n_docs,
        "docs_per_sec": round(n_docs / total, 1),
        "probe_efficiency": probe["probe_efficiency"],
        "probe": probe,
    }
    ray.shutdown()
    return result


def run_scaling(compute: bool = False) -> dict:
    # generate + cache the input up front so both timed subprocesses
    # read the identical, already-materialized file
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    bench_input(SF_DIR)

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        args = [sys.executable, __file__] + (["--compute"] if compute else [])
        out = subprocess.run(args, env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N parallelism levels. Default 4/16: on this single VM the
    # 32-cpu level saturates shared memory/disk bandwidth (~250k
    # docs/s ceiling regardless of CPU count), so 4→16 is the pair
    # that actually measures the pipeline's parallel scalability; see
    # BASELINE.md for both measurements.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    r_lo, r_hi = run(lo), run(hi)
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    return {
        "metric": ("compute_scaling_efficiency" if compute
                   else "scaling_efficiency"),
        "cpus": [lo, hi],
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        f"probe_efficiency_{lo}": r_lo.get("probe_efficiency"),
        f"probe_efficiency_{hi}": r_hi.get("probe_efficiency"),
        "input_docs": r_hi["input_docs"],
        "sf": r_hi["sf"],
        f"stages_{lo}": r_lo["queries"],
        f"stages_{hi}": r_hi["queries"],
    }


def run_scaling_nodes() -> dict:
    """The north rule's two-cluster-size criterion, by simulation: the
    FULL headline pipeline on a 1-node vs a 4-node cluster (8 CPUs and
    a private object store per node — separate raylets, real inter-node
    object transfer), same input, fresh process per leg."""
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    bench_input(SF_DIR)
    node_cpus = int(os.environ.get("GRAFT_NODE_CPUS", "8"))

    def run(n_nodes: int) -> dict:
        env = dict(os.environ, GRAFT_NODES=str(n_nodes),
                   GRAFT_NODE_CPUS=str(node_cpus))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_NODES_LO", "1"))
    hi = int(os.environ.get("GRAFT_SCALE_NODES_HI", "4"))
    r_lo, r_hi = run(lo), run(hi)
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    return {
        "metric": "node_scaling_efficiency",
        "nodes": [lo, hi],
        "node_cpus": node_cpus,
        f"sec_{lo}node": r_lo["value"],
        f"sec_{hi}node": r_hi["value"],
        f"docs_per_sec_{lo}node": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}node": r_hi["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        f"probe_efficiency_{lo}node": r_lo.get("probe_efficiency"),
        f"probe_efficiency_{hi}node": r_hi.get("probe_efficiency"),
        "input_docs": r_hi["input_docs"],
        "sf": r_hi["sf"],
    }


def run_scaling_nodes_control() -> dict:
    """ZERO-TRANSFER control for --scaling-nodes (VERDICT r3 #4): the
    same 8-CPU × 1-vs-4 comparison, but the 4-way leg runs FOUR
    INDEPENDENT Ray sessions, each on a disjoint quarter of the input
    files (GRAFT_SHARD) — no object can cross between them, so any
    efficiency shortfall below 1.0 here is pure host contention
    (shared memory bus / disk / page cache), not engine object
    transfer. Comparing this control's efficiency with the node-sim's
    isolates how much of the sim's shortfall is plasma copies the
    single-host sim double-counts (inter-node copies consume the same
    memory-bus bandwidth the compute needs; a real cluster pays them
    on private buses + a NIC)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    bench_input(SF_DIR)
    node_cpus = int(os.environ.get("GRAFT_NODE_CPUS", "8"))
    n_shards = int(os.environ.get("GRAFT_SCALE_NODES_HI", "4"))
    probe = machine_probe()

    def leg(env_extra: dict) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(node_cpus), **env_extra)
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # leg A: ONE shard alone — the uncontended per-"node" baseline at
    # exactly the work size each concurrent session will run (fixed
    # pipeline overhead cancels out of the comparison)
    r_alone = leg({"GRAFT_SHARD": f"0/{n_shards}"})

    # leg B: all shards concurrently (zero transfer between them).
    # stdout/stderr go to TEMP FILES, not pipes: a child that fills a
    # 64 KB pipe with Ray log chatter would block mid-write inside its
    # TIMED section until the parent drains it — inflating
    # shard_concurrent_sec, the very quantity this control isolates.
    import tempfile

    procs, files = [], []
    for i in range(n_shards):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(node_cpus),
                   GRAFT_SHARD=f"{i}/{n_shards}")
        fo = tempfile.TemporaryFile(mode="w+t")
        fe = tempfile.TemporaryFile(mode="w+t")
        files.append((fo, fe))
        procs.append(subprocess.Popen(
            [sys.executable, __file__], env=env, stdout=fo, stderr=fe,
            text=True))
    for p in procs:
        p.wait()
    outs = []
    for fo, fe in files:
        fo.seek(0)
        fe.seek(0)
        outs.append((fo.read(), fe.read()))
        fo.close()
        fe.close()
    assert all(p.returncode == 0 for p in procs), \
        [o[1][-2000:] for p, o in zip(procs, outs) if p.returncode]
    shard_res = [json.loads(o[0].strip().splitlines()[-1]) for o in outs]
    total_docs = sum(r["input_docs"] for r in shard_res)
    t_conc = max(r["value"] for r in shard_res)   # headline sec only —
    # session startup/warmup excluded on BOTH legs, same as every
    # other scaling figure in this file
    contention = r_alone["value"] / t_conc
    return {
        "metric": "node_scaling_control_zero_transfer",
        "legs": [1, n_shards],
        "node_cpus": node_cpus,
        "shard_alone_sec": r_alone["value"],
        "shard_concurrent_sec": [r["value"] for r in shard_res],
        "host_contention_factor": round(contention, 3),
        "probe_efficiency": probe["probe_efficiency"],
        "input_docs": total_docs,
        "sf": Path(SF_DIR).name,
        "note": ("same shard, same work: alone vs with 3 sibling "
                 "sessions; zero inter-session object transfer by "
                 "construction, so host_contention_factor < 1.0 is "
                 "pure shared-bus/disk contention — the ceiling ANY "
                 "4-way parallelism on this host faces, including the "
                 "--scaling-nodes sim"),
    }


def run_decode_bench() -> dict:
    """Gorilla segment-decode throughput (VERDICT r3 #6): time
    ``read_segments`` (inflate + bit-decode + batched Arrow assembly)
    over the bench run's segments/ directory, reported as points/sec.
    Reuses the existing bench output if present; otherwise builds the
    obs+segments stages first (untimed)."""
    import ray
    import ray.data as rd

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from sits_classification_ray import EngineConfig
    from sits_classification_ray.pipelines.rollup_pipeline import (
        read_segments, run_pipeline)

    crawl = bench_input(SF_DIR)
    probe = machine_probe()
    _init_ray()
    _mute_known_benign_warnings()
    rd.DataContext.get_current().enable_progress_bars = False

    out = _BASE / "sits_bench_out"
    seg = out / "segments"
    cfg = EngineConfig(n_buckets=64)
    if not seg.exists():
        run_pipeline(crawl, str(out), cfg, resume=True,
                     stages=("obs", "segments"))
    t0 = time.perf_counter()
    n_points = read_segments(str(seg)).count()
    elapsed = time.perf_counter() - t0
    result = {
        "metric": "segment_decode_points_per_sec",
        "value": round(n_points / elapsed, 1),
        "unit": "points/sec",
        "decode_seconds": round(elapsed, 3),
        "n_points": n_points,
        "sf": Path(SF_DIR).name,
        "num_cpus": NUM_CPUS,
        "probe_efficiency": probe["probe_efficiency"],
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling-nodes-control" in sys.argv:
        print(json.dumps(run_scaling_nodes_control()))
    elif "--decode" in sys.argv:
        print(json.dumps(run_decode_bench()))
    elif "--scaling-nodes" in sys.argv:
        print(json.dumps(run_scaling_nodes()))
    elif "--scaling-compute" in sys.argv:
        print(json.dumps(run_scaling(compute=True)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--compute" in sys.argv:
        print(json.dumps(run_compute_bench()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_bench(skew=True)))
    else:
        print(json.dumps(run_bench()))
