"""Head-domain skew: salted partitioning must (a) keep every kernel's
output identical to the pandas oracle and (b) bound partition payloads
by hot_key_threshold instead of shipping one fat url_bucket block."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.oracle.reference import (
    dedup_oracle,
    gapfill_oracle,
    rollup_oracle,
)
from sits_classification_ray.stages.gapfill import gapfill
from sits_classification_ray.stages.rollup import finalize, rollup
from sits_classification_ray.stages.series import assemble_series
from sits_classification_ray.stages.shuffle import (
    default_num_partitions,
    partitioned_map,
)

HEAD_SNAPS = 20_000
N_SMALL = 200


@pytest.fixture(scope="module")
def skewed_obs() -> pd.DataFrame:
    """One head url with 20k snapshots + 200 urls with ~6 each."""
    rng = np.random.default_rng(3)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    parts = []
    ts = base + (np.cumsum(rng.integers(60, 900, HEAD_SNAPS))
                 * 1_000_000).astype("timedelta64[us]")
    parts.append(pd.DataFrame({
        "url": "https://head.example.com/",
        "warc_ts": ts,
        "lang": "en",
        "text_len": rng.integers(100, 5000, HEAD_SNAPS),
        "word_count": rng.integers(10, 900, HEAD_SNAPS),
    }))
    for i in range(N_SMALL):
        n = int(rng.integers(2, 10))
        ts = base + (np.cumsum(rng.integers(3600, 86400, n))
                     * 1_000_000).astype("timedelta64[us]")
        parts.append(pd.DataFrame({
            "url": f"https://tail-{i}.example.com/",
            "warc_ts": ts,
            "lang": "en",
            "text_len": rng.integers(100, 5000, n),
            "word_count": rng.integers(10, 900, n),
        }))
    df = pd.concat(parts, ignore_index=True)
    h = pd.util.hash_array(df["url"].to_numpy(dtype=object), categorize=True)
    df["url_bucket"] = (h % np.uint64(64)).astype(np.uint32)
    df["text_len"] = df["text_len"].astype(np.int64)
    df["word_count"] = df["word_count"].astype(np.int64)
    return df


def _to_long(obs: pd.DataFrame) -> pd.DataFrame:
    parts = [obs.assign(metric=m, value=obs[m].astype(np.float64))
             [["url", "url_bucket", "warc_ts", "metric", "value"]]
             for m in ("text_len", "word_count")]
    return pd.concat(parts, ignore_index=True)


def test_skewed_assemble_matches_oracle(skewed_obs):
    cfg = EngineConfig(hot_key_threshold=5_000)
    got = assemble_series(rd.from_pandas(skewed_obs), cfg,
                          approx_rows=len(skewed_obs)).to_pandas()
    want = dedup_oracle(skewed_obs)
    key = ["url", "warc_ts"]
    g = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    w = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[key + ["text_len", "word_count"]],
        w[key + ["text_len", "word_count"]], check_dtype=False)


def test_skewed_gapfill_and_rollup_match_oracle(skewed_obs):
    cfg = EngineConfig(hot_key_threshold=5_000, grid_seconds=86400)
    obs = dedup_oracle(skewed_obs)
    long_pdf = _to_long(obs)
    ds_long = rd.from_pandas(long_pdf)

    got = gapfill(ds_long, cfg, approx_rows=len(long_pdf)).to_pandas()
    want = gapfill_oracle(long_pdf, cfg.grid_seconds, "linear", "both")
    key = ["url", "metric", "grid_ts"]
    g = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    w = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g[key + ["value", "filled"]],
                                  w[key + ["value", "filled"]],
                                  check_dtype=False)

    got_r = finalize(rollup(ds_long, 86400, cfg)).to_pandas()
    want_r = rollup_oracle(long_pdf, 86400)
    key = ["url", "metric", "bucket_ts"]
    g = got_r.sort_values(key, kind="mergesort").reset_index(drop=True)
    w = want_r.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[key + ["count", "sum", "min", "max", "mean", "last"]],
        w[key + ["count", "sum", "min", "max", "mean", "last"]],
        check_dtype=False)


def test_salting_bounds_partition_payload(skewed_obs):
    """With a low hot_key_threshold, no partition block may carry more
    than the head series itself plus a few thresholds of tail rows —
    the multi-GB single-bucket block of round 1 is impossible."""
    threshold = 1_000
    sizes = partitioned_map(
        rd.from_pandas(skewed_obs),
        lambda df: pd.DataFrame({"rows": [len(df)]}),
        keys=["url"], approx_rows=len(skewed_obs),
        hot_key_threshold=threshold).to_pandas()

    P = default_num_partitions(len(skewed_obs), threshold)
    assert P >= len(skewed_obs) // threshold
    assert len(sizes) <= P
    assert sizes["rows"].sum() == len(skewed_obs)
    # every partition is either the head url's (irreducible series) or
    # a small tail partition — never head + a fat share of the rest
    assert int(sizes["rows"].max()) <= HEAD_SNAPS + 10 * threshold
    assert int(sizes["rows"].sort_values().iloc[-2]) <= 10 * threshold


def test_bucket_major_salting_aligns_and_bounds(skewed_obs):
    """url_col mode: every partition holds exactly one url_bucket (so
    partitioned parquet writes stay one-directory-per-block) while the
    salt splits fat buckets into sub-partitions."""
    from sits_classification_ray.stages.shuffle import salt_factor

    threshold, n_buckets = 200, 8
    S = salt_factor(len(skewed_obs), threshold, n_buckets)
    assert S > 1                       # the skew case really salts

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        # re-derive the bucket the hive layout would use
        h = pd.util.hash_array(df["url"].to_numpy(dtype=object),
                               categorize=True)
        return pd.DataFrame({"rows": [len(df)],
                             "n_buckets_seen":
                                 [int(pd.unique(h % np.uint64(n_buckets))
                                      .size)]})

    out = partitioned_map(rd.from_pandas(skewed_obs), probe,
                          url_col="url", n_buckets=n_buckets,
                          approx_rows=len(skewed_obs),
                          hot_key_threshold=threshold).to_pandas()
    assert (out["n_buckets_seen"] <= 1).all()      # bucket-aligned
    assert len(out) <= n_buckets * S
    assert out["rows"].sum() == len(skewed_obs)
    # the head url's partition is irreducible; all others stay small
    assert int(out["rows"].sort_values().iloc[-2]) <= HEAD_SNAPS // 2


def test_salting_deterministic_across_runs(skewed_obs):
    out1 = partitioned_map(rd.from_pandas(skewed_obs),
                           lambda df: df.head(1), keys=["url"],
                           num_partitions=97).to_pandas()
    out2 = partitioned_map(rd.from_pandas(skewed_obs),
                           lambda df: df.head(1), keys=["url"],
                           num_partitions=97).to_pandas()
    k = ["url", "warc_ts"]
    pd.testing.assert_frame_equal(
        out1.sort_values(k).reset_index(drop=True),
        out2.sort_values(k).reset_index(drop=True))


def test_pipeline_with_active_salting_matches_oracle(tmp_path_factory,
                                                     skewed_obs):
    """End-to-end run_pipeline with hot_key_threshold low enough that
    S > 1 sub-bucketing actually engages — the daily tier must equal
    the single-node oracle exactly."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from sits_classification_ray.oracle.reference import (rollup_oracle,
                                                          to_long_oracle)
    from sits_classification_ray.pipelines.rollup_pipeline import run_pipeline
    from sits_classification_ray.stages.shuffle import salt_factor

    root = tmp_path_factory.mktemp("salted_e2e")
    # crawl-shaped input derived from the skewed obs fixture
    crawl = pd.DataFrame({
        "url": skewed_obs["url"],
        "warc_ts": skewed_obs["warc_ts"],
        "html": ("<html><head><title>x</title></head><body>"
                 + pd.Series(["w " * int(n) for n in
                              skewed_obs["word_count"] % 7 + 1])
                 + "</body></html>").str.encode("utf-8"),
        "text": "",
        "lang": skewed_obs["lang"],
    })
    pq.write_table(pa.Table.from_pandas(crawl, preserve_index=False),
                   str(root / "crawl.parquet"))
    cfg = EngineConfig(n_buckets=8, hot_key_threshold=1_000)
    assert salt_factor(len(crawl), cfg.hot_key_threshold,
                       cfg.n_buckets) > 1        # salting really engages
    run_pipeline(str(root / "crawl.parquet"), str(root / "out"), cfg,
                 stages=("obs", "hourly", "daily"), telemetry=False)

    got = (pads.dataset(str(root / "out" / "daily"), partitioning="hive")
           .to_table().to_pandas())
    obs = (pads.dataset(str(root / "out" / "obs"), partitioning="hive")
           .to_table().to_pandas())
    want = rollup_oracle(to_long_oracle(obs), 86400)
    key = ["url", "metric", "bucket_ts"]
    cols = key + ["count", "sum", "min", "max", "last"]
    g = got[cols].sort_values(key).reset_index(drop=True)
    w = want[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_partitioned_map_schema_hygiene():
    """Blocks coming out of partitioned_map must carry NO schema
    metadata (pandas-conversion metadata makes pa.Schema unhashable,
    breaking Ray's schema dedup and flooding logs on every read-back),
    and every non-empty block must hash cleanly."""
    df = pd.DataFrame({"url": [f"u{i}" for i in range(5)],
                       "v": np.arange(5.0)})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("url", as_index=False)["v"].sum()

    out = partitioned_map(rd.from_pandas(df), kernel, keys=["url"],
                          num_partitions=64)
    got = out.to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, df.sort_values("url").reset_index(drop=True),
        check_dtype=False)
    # every materialized non-empty block: metadata-free, hashable
    bundle = out.materialize()
    import ray as _ray
    n_rows = 0
    for blk in bundle.to_arrow_refs():
        t = _ray.get(blk)
        n_rows += t.num_rows
        if t.num_rows > 0:
            assert t.schema.metadata is None
            hash(t.schema)  # raises if metadata survived
    assert n_rows == len(df)


def test_empty_blocks_are_benign_at_consumption():
    """Ray's shuffle emits schema-less empty blocks that pass through
    map stages without invoking the UDF — they cannot be dropped
    in-stream. Pin the property that makes them harmless: to_pandas(),
    write_parquet and arrow collection ignore them without dropping or
    null-padding the real columns."""
    import ray as _ray

    ds = rd.from_pandas([pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}),
                         pd.DataFrame()])          # column-less empty
    df = ds.to_pandas()
    assert list(df.columns) == ["a", "b"] and len(df) == 2

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        ds.write_parquet(d)
        import pyarrow.parquet as pq
        t = pq.read_table(d)
        assert t.num_rows == 2 and set(t.schema.names) == {"a", "b"}

    total = sum(_ray.get(r).num_rows
                for r in ds.materialize().to_arrow_refs())
    assert total == 2
