"""Extraction stage: html → text + per-snapshot metrics.

Stateless ``map_batches`` tasks over zero-copy Arrow batches — the
analog of the reference's tile→sample extraction
(``utils/class_run.py:123-201``): decode the raw payload, screen
invalid rows (reference nodata −9999 → NaN, ``utils/class_run.py:140``;
all-invalid drop, ``utils/class_run.py:150-152``), derive per-snapshot
metrics (band-math analog, ``force/skel/dswi_harmonic_tss.py:60-88``)
and attach the hash partition key (FORCE tile analog,
``force/force_class_utils.py:253-255``).

Everything here is vectorized pyarrow.compute; the html column is
dropped as soon as text is extracted so wide binary payloads never
enter a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from sits_classification_ray.config import EngineConfig

#: Extracts the body payload; (?s) so the payload may span lines. RE2
#: syntax — identical semantics in pyarrow (extract_regex) and DuckDB
#: (regexp_extract), which the oracle SQL relies on.
BODY_RE = r"(?s)<body>(?P<t>.*)</body>"


def url_bucket_of(urls: pa.Array | pa.ChunkedArray, n_buckets: int) -> pa.Array:
    """Stable hash bucket per url (uint32).

    Uses pandas' SipHash-based ``hash_array`` with the library-default
    fixed key, so the mapping is deterministic across runs, workers and
    sessions (required for resumable per-partition checkpoints).
    ``categorize=False``: per-value hashing. The categorize path runs
    values through ``factorize``, whose C-string hash table truncates at
    embedded NULs — distinct keys collide and the winning hash depends
    on row order, i.e. nondeterministic partitioning. For NUL-free
    strings both paths produce identical hashes (and per-value hashing
    measures ~2.5× faster at crawl-like cardinalities).
    """
    arr = np.asarray(urls, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return pa.array((h % np.uint64(n_buckets)).astype(np.uint32))


def extract_body(html_str: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Body payload per row, byte-identical to ``extract_regex(html,
    BODY_RE)`` but ~2× faster on the common case.

    Fast path (plain substring split, no regex): rows with EXACTLY ONE
    ``<body>`` and one ``</body>`` in that order — the overwhelming
    majority of real pages. Greedy-regex semantics (first open to LAST
    close) coincide with the split there. Every other row — zero tags,
    repeated tags, close-before-open, null — is re-extracted with the
    actual regex on the filtered minority, so outputs are identical by
    construction to the DuckDB oracle's ``regexp_extract``.
    """
    if isinstance(html_str, pa.ChunkedArray):
        html_str = html_str.combine_chunks()
    one_each = pc.and_(
        pc.equal(pc.count_substring(html_str, "<body>"), 1),
        pc.equal(pc.count_substring(html_str, "</body>"), 1))
    # force the split tokens to exist on every row so the list elements
    # below are always present; flagged-slow rows are overwritten after
    safe = pc.if_else(one_each, html_str,
                      pa.scalar("<body></body>", pa.string()))
    tail = pc.list_element(
        pc.split_pattern(safe, pattern="<body>", max_splits=1), 1)
    p2 = pc.split_pattern(tail, pattern="</body>", max_splits=1)
    body = pc.list_element(p2, 0)
    # close-before-open sneaks past the counts: its tail has no close
    # token, leaving a 1-element split — reroute those to the regex too
    fast = pc.and_(one_each, pc.equal(pc.list_value_length(p2), 2))
    fast_np = fast.fill_null(False).to_numpy(zero_copy_only=False)
    n_slow = int(len(html_str) - fast_np.sum())
    if n_slow == 0:
        return body
    idx = np.flatnonzero(~fast_np)
    slow = pc.struct_field(
        pc.extract_regex(html_str.take(pa.array(idx)), BODY_RE), "t")
    out = body.to_numpy(zero_copy_only=False).astype(object)
    out[idx] = slow.to_numpy(zero_copy_only=False)
    return pa.array(out, pa.string())


def extract_batch(batch: pa.Table, n_buckets: int, keep_text: bool) -> pa.Table:
    """html → text, metric derivation, invalid-row screening, bucketing."""
    html_str = pc.cast(batch["html"], pa.string())
    text = extract_body(html_str) if len(batch) else pa.array([], pa.string())
    # Invalid-row screen: no body, or empty body (reference drops
    # samples whose features are entirely missing).
    valid = pc.and_(pc.is_valid(text), pc.greater(pc.utf8_length(text), 0))

    text_len = pc.cast(pc.utf8_length(text), pa.int64())
    # fields(split on " ") == spaces + 1, without materializing the
    # split lists (identical to DuckDB len(string_split(text, ' ')))
    word_count = pc.cast(pc.add(pc.count_substring(text, " "), 1),
                         pa.int64())

    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "url": batch["url"],
        "url_bucket": url_bucket_of(batch["url"], n_buckets),
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "text_len": text_len,
        "word_count": word_count,
    }
    if keep_text:
        cols["text"] = text
    out = pa.table(cols)
    return out.filter(valid)


def rejects_batch(batch: pa.Table) -> pa.Table:
    """Quarantine rows the extraction screen drops, with the reason.

    The inverse of :func:`extract_batch`'s invalid-row screen
    (reference nodata screening, ``utils/class_run.py:140,150-152``):
    at production scale silently-dropped rows are an operational blind
    spot, so this kernel emits ``(url, warc_ts, reason)`` for every
    screened row — ``no_body`` (payload never matched) vs
    ``empty_body`` (matched but empty). Run as its own resumable pass
    over the raw input; it shares :func:`extract_body` so the verdict
    is by construction the same one the pipeline applied.
    """
    if len(batch) == 0:
        return pa.table({"url": pa.array([], pa.string()),
                         "warc_ts": pa.array([], pa.timestamp("us")),
                         "reason": pa.array([], pa.string())})
    text = extract_body(pc.cast(batch["html"], pa.string()))
    no_body = pc.is_null(text)
    empty = pc.and_(pc.is_valid(text),
                    pc.equal(pc.utf8_length(text), 0))
    reason = pc.if_else(
        no_body, pa.scalar("no_body", pa.string()),
        pc.if_else(empty, pa.scalar("empty_body", pa.string()),
                   pa.scalar(None, pa.string())))
    out = pa.table({"url": batch["url"],
                    "warc_ts": batch["warc_ts"],
                    "reason": reason})
    return out.filter(pc.is_valid(reason))


def extract_rejects(ds: rd.Dataset, cfg: EngineConfig | None = None
                    ) -> rd.Dataset:
    """Quarantine stage: screened-out rows with reasons (no shuffle)."""
    cfg = cfg or EngineConfig()
    return ds.map_batches(rejects_batch, batch_format="pyarrow",
                          batch_size=cfg.batch_size, zero_copy_batch=True)


def extract(
    ds: rd.Dataset,
    cfg: EngineConfig | None = None,
    keep_text: bool = False,
) -> rd.Dataset:
    """Extraction pipeline stage (stateless tasks; no shuffle)."""
    cfg = cfg or EngineConfig()
    return ds.map_batches(
        extract_batch,
        fn_kwargs={"n_buckets": cfg.n_buckets, "keep_text": keep_text},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )


def to_long(ds: rd.Dataset, metrics: tuple[str, ...]) -> rd.Dataset:
    """Wide per-snapshot metrics → long ``(…, metric, value)`` rows.

    The long format is what the rollup tiers and the Gorilla encoder
    consume (one float stream per (url, metric)); mirrors the
    reference's band-major layout (one series per band per pixel).
    """

    def explode(batch: pa.Table) -> pa.Table:
        parts = []
        base = ["url", "url_bucket", "warc_ts"]
        for m in metrics:
            parts.append(
                pa.table(
                    {
                        "url": batch["url"],
                        "url_bucket": batch["url_bucket"],
                        "warc_ts": batch["warc_ts"],
                        "metric": pa.array([m] * len(batch), pa.string()),
                        "value": pc.cast(batch[m], pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else batch.select(base)

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
