"""Deterministic synthesis of the Common-Crawl-style crawl table.

The engine's primary input is a Parquet table with columns
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — exactly ``BASELINE.json.input_hint``. No such table
ships with the test data, so it is synthesized deterministically:

1. :func:`crawl_from_tables` derives a crawl table from the
   driver-provided ``events`` + ``documents`` parquet tables via a pure
   expression. The identical derivation is expressed in ANSI SQL as
   :data:`CRAWL_CTE` so the DuckDB oracle can reconstruct the same rows
   bit-for-bit (correctness gate).
2. :func:`generate_crawl_parquet` is a standalone seeded Zipf generator
   (per FIXTURES.md §1) used by unit tests and the benchmark: head-domain
   skew, duplicate timestamps, singleton series, out-of-order rows and
   degenerate html rows are all injected on purpose.

The ``documents`` table is a fixed 500-row dimension at every scale
factor, so each actor of the attach pool loads it once in ``__init__``
and looks it up per batch (the reference's thermal-raster load-once
pattern, ``utils/class_run.py:85-89``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

CRAWL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

#: SQL CTE reproducing :func:`crawl_from_tables` exactly. Every oracle
#: query over the crawl table starts with ``WITH crawl AS (...)``.
CRAWL_CTE = """
crawl AS MATERIALIZED (
  SELECT
    'https://site-' || CAST(e.user_id % 40 AS VARCHAR)
        || '.example.com/u/' || CAST(e.user_id AS VARCHAR) AS url,
    date_trunc('minute', e.ts) AS warc_ts,
    CAST('<html><head><title>u' || CAST(e.user_id AS VARCHAR)
        || '</title></head><body>' || d.text
        || '</body></html>' AS BLOB) AS html,
    d.text AS text,
    d.lang AS lang
  FROM events e
  JOIN documents d
    ON d.doc_id = e.event_id % (SELECT count(*) FROM documents)
)
""".strip()


class _AttachDocuments:
    """Actor-pool stage: join each event row to its document payload.

    The documents side is tiny and fixed-size, so it is loaded ONCE per
    actor in ``__init__`` (from shared storage — the parquet file every
    node can read) — never re-shipped per batch. Mirrors the
    reference's load-once thermal raster (utils/class_run.py:85-89).
    Loading by path rather than a driver ``ray.put`` ref keeps the
    actor restartable: constructor object refs can be lost while the
    actor outlives them (ray#53727), and a path never expires.
    """

    def __init__(self, docs_path: str):
        docs = pq.read_table(docs_path, columns=["doc_id", "text", "lang"])
        order = pc.sort_indices(docs["doc_id"])
        docs = docs.take(order)
        self.text = docs["text"].combine_chunks()
        self.lang = docs["lang"].combine_chunks()
        self.n_docs = len(docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.string())
        site = pc.cast(pc.subtract(batch["user_id"],
                                   pc.multiply(pc.divide(batch["user_id"], 40),
                                               40)),
                       pa.string())
        url = pc.binary_join_element_wise(
            "https://site-", site, ".example.com/u/", uid, "")
        warc_ts = pc.floor_temporal(batch["ts"], unit="minute")
        doc_idx = pc.subtract(
            batch["event_id"],
            pc.multiply(pc.divide(batch["event_id"], self.n_docs), self.n_docs),
        )
        text = pc.take(self.text, doc_idx)
        lang = pc.take(self.lang, doc_idx)
        html = pc.cast(
            pc.binary_join_element_wise(
                "<html><head><title>u", uid, "</title></head><body>",
                text, "</body></html>", ""),
            pa.binary(),
        )
        return pa.table(
            {
                "url": url,
                "warc_ts": pc.cast(warc_ts, pa.timestamp("us")),
                "html": html,
                "text": text,
                "lang": lang,
            }
        )


def crawl_from_tables(sf_dir: str) -> rd.Dataset:
    """Crawl table as a Ray Dataset, derived from events × documents.

    One crawl snapshot per event: url keyed on ``user_id`` (so each url
    has an irregular ~30-day history of snapshots), payload from the
    broadcast ``documents`` dimension. Deterministic; mirrored by
    :data:`CRAWL_CTE` for the DuckDB oracle.
    """
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id"])
    return events.map_batches(
        _AttachDocuments,
        fn_constructor_args=(f"{sf_dir}/documents.parquet",),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Standalone seeded generator (FIXTURES.md §1) — tests and benchmark.
# ---------------------------------------------------------------------------

_WORDS = np.array(
    "the of and to a in for is on that by this with you it not or be are "
    "from at as your all have new more an was we will home can us about if "
    "page my has search free but our one other do no information time they "
    "site he up may what which their news out use any there see only so his "
    "when contact here business who web also now help get view online first "
    "am been would how were me services some these click its like service".split()
)

_LANGS = np.array(["en", "de", "fr", "es", "zh", "pt", "it"])


def synth_crawl_arrays(
    n_urls: int = 100,
    mean_snaps: int = 40,
    seed: int = 42,
    span_days: int = 60,
    zipf_a: float = 1.4,
    target_rows: int | None = None,
    head_snaps: int | None = None,
) -> pa.Table:
    """Build a crawl table in memory (deterministic, seeded).

    Injects every edge case FIXTURES.md §1 calls for: Zipf head urls,
    duplicate ``warc_ts`` (first-wins dedup), a singleton-series url
    (cf. reference singleton filter utils/class_run.py:154-156), rows
    written out of time order (sort requirement), and a few
    empty/degenerate html rows (all-invalid filter,
    utils/class_run.py:150-152).

    ``target_rows`` (optional) caps the total row count by truncating
    the url list once the Zipf snapshot counts reach the target —
    used by the benchmark generator for predictable input sizes.
    """
    rng = np.random.default_rng(seed)
    # Zipf-ish snapshot counts, clipped; url 0 is the head domain.
    counts = np.clip(
        (rng.zipf(zipf_a, size=n_urls) * mean_snaps / 3).astype(np.int64),
        2, mean_snaps * 50,
    )
    # head domain; ``head_snaps`` lets the skew benchmark plant a
    # 10^6-snapshot head url (the straggler case salting must absorb)
    counts[0] = int(head_snaps) if head_snaps else int(mean_snaps * 30)
    counts[1] = 1                          # singleton series
    if target_rows is not None:
        keep = int(np.searchsorted(np.cumsum(counts), target_rows)) + 1
        counts = counts[:min(keep, n_urls)]
        n_urls = len(counts)
    url_ids = np.repeat(np.arange(n_urls), counts)
    n = len(url_ids)

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = span_days * 86400 * 1_000_000
    # Irregular per-row offsets; minute resolution so duplicates occur.
    offs = rng.integers(0, span_us // 60_000_000, size=n) * 60_000_000
    warc_ts = t0 + offs.astype("timedelta64[us]")
    # Force some exact-duplicate (url, warc_ts) pairs on the head url.
    dup = min(20, counts[0] // 2)
    warc_ts[dup:2 * dup] = warc_ts[:dup]

    # Deterministic text per row: a random-length slice of a seeded
    # word corpus (vectorized slicing — no per-row string join).
    corpus_words = _WORDS[rng.integers(0, len(_WORDS), size=20_000)]
    corpus = " ".join(corpus_words)
    tlen = rng.integers(30, 240, size=n)
    tstart = rng.integers(0, len(corpus) - 256, size=n)
    texts = np.fromiter((corpus[s:s + L] for s, L in zip(tstart, tlen)),
                        dtype=object, count=n)
    langs = _LANGS[rng.integers(0, len(_LANGS), size=n)]

    # Per-url strings built once for the distinct ids, then gathered.
    uniq_urls = np.fromiter(
        (f"https://site-{u % 17}.example.com/u/{u}" for u in range(n_urls)),
        dtype=object, count=n_urls)
    uniq_pre = np.fromiter(
        (f"<html><head><title>u{u}</title></head><body>" for u in range(n_urls)),
        dtype=object, count=n_urls)
    urls = uniq_urls[url_ids]
    pres = uniq_pre[url_ids]
    htmls = np.fromiter((p + t + "</body></html>"
                         for p, t in zip(pres, texts)), dtype=object, count=n)
    # Degenerate html rows (extraction must yield null → filtered).
    bad = rng.choice(n, size=max(1, n // 500), replace=False)
    for i in bad:
        htmls[i] = "<html></html>"
        texts[i] = ""

    # Shuffle row order so series arrive out of time order.
    perm = rng.permutation(n)
    return pa.table(
        {
            "url": pa.array(urls[perm], pa.string()),
            "warc_ts": pa.array(warc_ts[perm], pa.timestamp("us")),
            "html": pa.array(htmls[perm], pa.string()).cast(pa.binary()),
            "text": pa.array(texts[perm], pa.string()),
            "lang": pa.array(langs[perm], pa.string()),
        }
    )


def generate_crawl_parquet(
    out_path: str,
    n_urls: int = 100,
    mean_snaps: int = 40,
    seed: int = 42,
    span_days: int = 60,
    row_group_size: int = 200_000,
    target_rows: int | None = None,
    num_files: int = 1,
    head_snaps: int | None = None,
) -> str:
    """Write the synthetic crawl table to Parquet; returns path.

    ``num_files > 1`` writes a directory of that many files (row-range
    sharded) — one file caps Ray's read parallelism, a directory scales
    it with the cluster.
    """
    table = synth_crawl_arrays(n_urls, mean_snaps, seed, span_days,
                               target_rows=target_rows,
                               head_snaps=head_snaps)
    if num_files <= 1:
        pq.write_table(table, out_path, row_group_size=row_group_size)
        return out_path
    import os

    os.makedirs(out_path, exist_ok=True)
    n = len(table)
    step = -(-n // num_files)
    for i in range(num_files):
        shard = table.slice(i * step, step)
        if len(shard) == 0:
            break
        pq.write_table(shard, f"{out_path}/part-{i:04d}.parquet",
                       row_group_size=row_group_size)
    return out_path
