import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.oracle.reference import extract_oracle
from sits_classification_ray.stages.extract import extract, to_long

CFG = EngineConfig()


def test_extract_matches_oracle(crawl_ds, crawl_pdf):
    got = extract(crawl_ds, CFG, keep_text=True).to_pandas()
    want = extract_oracle(crawl_pdf, CFG.n_buckets)
    key = ["url", "warc_ts", "text_len", "word_count", "lang", "text",
           "url_bucket"]
    g = got[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    w = want[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_extract_text_byte_identity(crawl_ds, crawl_pdf):
    # per-row invariant: extracted text == source text byte-for-byte.
    # (url, warc_ts) is not unique pre-dedup, so compare the full row
    # multiset rather than joining.
    got = extract(crawl_ds, CFG, keep_text=True).to_pandas()
    src = crawl_pdf[crawl_pdf["text"].str.len() > 0]
    key = ["url", "warc_ts", "text"]
    g = got[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    w = (src[key].sort_values(key, kind="mergesort")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(g, w)


def test_extract_drops_degenerate_html(crawl_ds, crawl_pdf):
    got = extract(crawl_ds, CFG).to_pandas()
    n_bad = (crawl_pdf["text"].str.len() == 0).sum()
    assert n_bad > 0
    assert len(got) == len(crawl_pdf) - n_bad


def test_to_long(crawl_ds):
    wide = extract(crawl_ds, CFG)
    long = to_long(wide, CFG.metrics).to_pandas()
    n = wide.count()
    assert len(long) == n * len(CFG.metrics)
    assert set(long["metric"]) == set(CFG.metrics)
    assert long["value"].dtype == np.float64


def test_jsonl_roundtrip(tmp_path, crawl_table):
    from sits_classification_ray.sources.readers import (read_crawl_jsonl,
                                                         write_crawl_jsonl)

    sub = crawl_table.slice(0, 50)
    p = tmp_path / "crawl.jsonl"
    write_crawl_jsonl(sub, str(p))
    back = (read_crawl_jsonl(str(p)).to_pandas()
            .sort_values(["url", "warc_ts"]).reset_index(drop=True))
    want = (sub.to_pandas().sort_values(["url", "warc_ts"])
            .reset_index(drop=True))
    assert back["url"].tolist() == want["url"].tolist()
    assert back["html"].tolist() == want["html"].tolist()   # byte-exact
    assert (back["warc_ts"] == want["warc_ts"]).all()


def test_read_tier_range_filter(tmp_path, crawl_ds):
    import pandas as pd

    from sits_classification_ray.config import EngineConfig
    from sits_classification_ray.pipelines.rollup_pipeline import run_pipeline
    from sits_classification_ray.sources.readers import read_tier

    out = tmp_path / "out"
    src = tmp_path / "in.parquet"
    crawl_ds.write_parquet(str(src))
    run_pipeline(str(src), str(out), EngineConfig(n_buckets=8),
                 stages=("obs", "daily"), telemetry=False)
    full = read_tier(str(out), "daily").to_pandas()
    lo = full["bucket_ts"].sort_values().iloc[len(full) // 2]
    part = read_tier(str(out), "daily", start=lo,
                     columns=["url", "bucket_ts", "count"]).to_pandas()
    assert set(part.columns) >= {"url", "bucket_ts", "count"}
    assert (part["bucket_ts"] >= pd.Timestamp(lo)).all()
    assert len(part) == (full["bucket_ts"] >= pd.Timestamp(lo)).sum()


def test_jsonl_reads_fractional_and_zoned_timestamps(tmp_path):
    """Real crawl exports carry .%f fractions and Z/offset suffixes —
    the reader must accept the full ISO-8601 family, not just the
    minute-resolution shape the synthesizer happens to emit."""
    import base64
    import json as _json

    import pandas as pd

    from sits_classification_ray.sources.readers import read_crawl_jsonl

    p = tmp_path / "crawl.jsonl"
    rows = [
        ("http://a.example/x", "2024-01-02T03:04:05.123456"),
        ("http://a.example/y", "2024-01-02T03:04:05Z"),
        ("http://b.example/z", "2024-01-02T04:04:05.5+01:00"),
    ]
    with p.open("w") as fh:
        for url, ts in rows:
            fh.write(_json.dumps({
                "url": url, "warc_ts": ts,
                "html_b64": base64.b64encode(b"<html>").decode(),
                "text": "hi", "lang": "en"}) + "\n")
    got = (read_crawl_jsonl(str(p)).to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert got["warc_ts"].tolist() == [
        pd.Timestamp("2024-01-02 03:04:05.123456"),
        pd.Timestamp("2024-01-02 03:04:05"),
        pd.Timestamp("2024-01-02 03:04:05.5"),
    ]


def test_extract_body_fast_path_matches_regex_on_edge_cases():
    """extract_body's substring fast path must be byte-identical to the
    greedy regex (= the DuckDB oracle's regexp_extract) on every tag
    arrangement: the split handles only the one-open-one-close-ordered
    majority; everything else must reroute to the actual regex."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from sits_classification_ray.stages.extract import BODY_RE, extract_body

    cases = [
        "<html><body>hello</body></html>",
        "<html>nobody</html>",
        "<body>a</body><body>b</body>",      # greedy spans both
        "</body>reversed<body>",             # close before open → None
        "<body>unclosed",
        "closed</body> only",
        "<body></body>",
        "<body>a</body> trailing </body>",   # greedy to LAST close
        "<body>multi\nline\n</body>",        # (?s) dotall
        "",
        None,
        "<body>nested <body>x</body>",
    ]
    arr = pa.array(cases, pa.string())
    ref = pc.struct_field(pc.extract_regex(arr, BODY_RE), "t")
    assert extract_body(arr).to_pylist() == ref.to_pylist()


def test_extract_rejects_reasons():
    """Quarantine kernel: screened rows come back with the right
    reason; valid rows never appear; union with extract() covers every
    input row exactly once."""
    import pandas as pd
    import pyarrow as pa

    from sits_classification_ray.stages.extract import (extract,
                                                        extract_rejects)

    rows = [
        ("u1", "<html><body>keep me</body></html>", None),
        ("u2", "<html>no tags at all</html>", "no_body"),
        ("u3", "<body></body>", "empty_body"),
        ("u4", "</body>reversed<body>", "no_body"),
        ("u5", "<body>unclosed", "no_body"),
        ("u6", "<body>a</body><body>b</body>", None),  # greedy: non-empty
    ]
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array(
            pd.to_datetime(["2024-01-01"] * len(rows)), pa.timestamp("us")),
        "html": pa.array([r[1].encode() for r in rows], pa.binary()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    ds = rd.from_arrow(t)
    rejects = extract_rejects(ds).to_pandas().set_index("url")["reason"]
    kept = set(extract(ds).to_pandas()["url"])

    want = {r[0]: r[2] for r in rows}
    for url, reason in want.items():
        if reason is None:
            assert url in kept and url not in rejects.index
        else:
            assert rejects[url] == reason and url not in kept
    assert len(rejects) + len(kept) == len(rows)
