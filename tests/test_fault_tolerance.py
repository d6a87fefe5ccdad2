"""Fault-injection: the engine's recovery contract under worker loss.

The north-star requirement is production resilience on a multi-node
cluster — tasks die, workers OOM, nodes vanish. Ray Data recovers map
tasks from lineage (re-execute the failed task from its input blocks);
these tests inject real failures into `map_batches` stages shaped
exactly like the engine's hot-path kernels and assert the recovered
output is IDENTICAL to a clean run — no lost rows, no duplicated rows.

Reference analog: SITS_classification restarts at tile granularity via
skip-if-exists (`pytorch/predict.py:108-109`); the in-flight-task
equivalent here is Ray lineage re-execution, and the cross-run
equivalent is the manifest resume covered in test_pipeline.py.
"""
import os

import pyarrow as pa
import ray.data as rd

# NOTE: each kernel inlines its own flag/fault logic (and imports) rather
# than referencing module-level helpers: a retried task may land on a
# freshly started worker that cannot import this test module, so the
# pickled kernel must be fully self-contained (closures serialize by
# value; module-level names serialize by reference). The flag file is
# created with O_CREAT|O_EXCL, so exactly the first task to reach it
# injects the fault.


def test_worker_crash_recovered_by_lineage(tmp_path):
    """A task whose worker process dies mid-batch (simulating an OOM
    kill / lost node) is re-executed from lineage; the output matches a
    clean run row-for-row with no duplicates."""
    flag = str(tmp_path / "crashed.flag")

    def kernel(batch: pa.Table, _flag=flag) -> pa.Table:
        import os as _os
        try:
            _os.close(_os.open(_flag, _os.O_CREAT | _os.O_EXCL))
            _os._exit(1)  # hard worker death — not a Python exception
        except FileExistsError:
            pass
        import pyarrow.compute as _pc
        return batch.append_column(
            "doubled", _pc.multiply(batch.column("id"), 2))

    ds = rd.range(4000, override_num_blocks=8).map_batches(
        kernel, batch_format="pyarrow")
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)

    assert os.path.exists(flag), "fault was never injected"
    assert len(got) == 4000
    assert got["id"].is_unique
    assert (got["doubled"] == got["id"] * 2).all()


def test_transient_exception_retried(tmp_path):
    """An application-level transient failure (flaky downstream store,
    torn read) is retried when the stage opts in via retry_exceptions —
    the pattern the pipeline's writer stages rely on."""
    flag = str(tmp_path / "raised.flag")

    def kernel(batch: pa.Table, _flag=flag) -> pa.Table:
        import os as _os
        try:
            _os.close(_os.open(_flag, _os.O_CREAT | _os.O_EXCL))
            raise RuntimeError("transient: simulated torn read")
        except FileExistsError:
            pass
        import pyarrow.compute as _pc
        return batch.append_column(
            "neg", _pc.negate(batch.column("id")))

    ds = rd.range(2000, override_num_blocks=4).map_batches(
        kernel, batch_format="pyarrow",
        retry_exceptions=[RuntimeError])
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)

    assert os.path.exists(flag)
    assert len(got) == 2000
    assert got["id"].is_unique
    assert (got["neg"] == -got["id"]).all()


def test_actor_pool_crash_recovered(tmp_path):
    """A stateful actor-pool stage (the scoring/encoding shape: state
    built once in __init__, batches through __call__) survives one of
    its actors dying mid-batch: Ray restarts the actor and re-runs the
    failed task; results match a clean run exactly."""
    flag = str(tmp_path / "actor.flag")

    class Scorer:
        def __init__(self):
            self.offset = 7  # stands in for model load

        def __call__(self, batch: pa.Table, _flag=flag) -> pa.Table:
            import os as _os
            try:
                _os.close(_os.open(_flag, _os.O_CREAT | _os.O_EXCL))
                _os._exit(1)
            except FileExistsError:
                pass
            import pyarrow.compute as _pc
            return batch.append_column(
                "scored", _pc.add(batch.column("id"), self.offset))

    ds = rd.range(3000, override_num_blocks=6).map_batches(
        Scorer, batch_format="pyarrow", concurrency=2,
        max_restarts=4, max_task_retries=4)
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)

    assert os.path.exists(flag)
    assert len(got) == 3000
    assert got["id"].is_unique
    assert (got["scored"] == got["id"] + 7).all()


def test_pipeline_crash_then_resume_matches_clean_run(tmp_path):
    """Cross-run recovery: kill the whole job between stages, resume
    from the per-partition manifest, and the final tier output is
    byte-identical to an uninterrupted run (north-rule resumability)."""
    import pyarrow.dataset as pads

    from sits_classification_ray.config import EngineConfig
    from sits_classification_ray.pipelines.rollup_pipeline import run_pipeline
    from sits_classification_ray.sources.synth import generate_crawl_parquet

    crawl = generate_crawl_parquet(str(tmp_path / "crawl.parquet"),
                                   n_urls=40, mean_snaps=20, seed=11)
    cfg = EngineConfig(n_buckets=4)

    clean_out = tmp_path / "clean"
    run_pipeline(crawl, str(clean_out), cfg)

    # interrupted run: execute only the first stages, then "crash"
    # (stop driving), then resume the full pipeline over the same dir
    broken_out = tmp_path / "broken"
    run_pipeline(crawl, str(broken_out), cfg, stages=("obs", "grid"))
    assert not (broken_out / "daily").exists()
    run_pipeline(crawl, str(broken_out), cfg)

    for stage in ["hourly", "daily", "weekly"]:
        a = (pads.dataset(str(clean_out / stage), partitioning="hive")
             .to_table().to_pandas())
        b = (pads.dataset(str(broken_out / stage), partitioning="hive")
             .to_table().to_pandas())
        key = [c for c in a.columns]
        a = a.sort_values(key, kind="mergesort").reset_index(drop=True)
        b = b.sort_values(key, kind="mergesort").reset_index(drop=True)
        b = b[a.columns].astype(a.dtypes.to_dict())
        assert a.equals(b), f"tier {stage} differs after crash+resume"
