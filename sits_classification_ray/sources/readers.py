"""Sources and sinks (SURVEY §2.1).

- :func:`read_crawl` — the primary source: Parquet with column pruning
  (a stage that needs 2 columns must not move 5; reference analog: the
  band-TIFF reader only loads requested bands).
- :func:`read_crawl_csv` — S1/S2 analog: CSV with an explicit schema
  (the reference's per-sample CSVs are positional,
  ``pytorch/utils/Dataset.py:165-193``; here the schema is declared,
  a deliberate improvement).
- :func:`write_partitioned` — the standard resumable sink: Parquet
  partitioned by ``url_bucket``, zstd.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from sits_classification_ray.config import EngineConfig
from sits_classification_ray.sources.synth import CRAWL_SCHEMA

_CSV_TYPES = {f.name: f.type for f in CRAWL_SCHEMA}


def validate_crawl_schema(schema: pa.Schema,
                          columns: list[str] | None = None) -> None:
    """Validate a file schema against the canonical crawl contract.

    The reference trusts positional column order and fails deep inside
    numpy when an input drifts; here drift fails fast at the read
    boundary with a named diff (SURVEY §1.2: declared schema is a
    deliberate improvement)."""
    want = {f.name: f.type for f in CRAWL_SCHEMA}
    for name in (columns or want):
        if name not in schema.names:
            raise ValueError(
                f"crawl input missing column {name!r}; found "
                f"{schema.names}")
        got = schema.field(name).type
        exp = want.get(name)
        if exp is not None and got != exp and not (
                pa.types.is_string(exp) and pa.types.is_large_string(got)):
            raise ValueError(
                f"crawl column {name!r} has type {got}, expected {exp}")


def read_crawl(path: str, columns: list[str] | None = None,
               validate: bool = True) -> rd.Dataset:
    """Read the crawl table, pruning to the requested columns; the
    file schema is validated against the canonical contract first
    (one footer read — no data pages)."""
    if validate:
        import pyarrow.parquet as pq
        from pathlib import Path

        p = Path(path)
        first = next(p.rglob("*.parquet")) if p.is_dir() else p
        validate_crawl_schema(pq.read_schema(str(first)), columns)
    return rd.read_parquet(path, columns=columns)


def read_crawl_csv(path: str) -> rd.Dataset:
    """Read a CSV-format crawl table with the canonical schema.

    ``html`` is carried as base64 text in CSV (binary is not a CSV
    type) and decoded to binary here; ``warc_ts`` parsed as ISO.
    """
    import base64

    import pyarrow.compute as pc
    from pyarrow import csv as pacsv

    convert = pacsv.ConvertOptions(column_types={
        "url": pa.string(),
        "warc_ts": pa.timestamp("us"),
        "html_b64": pa.string(),
        "text": pa.string(),
        "lang": pa.string(),
    })
    ds = rd.read_csv(path, convert_options=convert)

    def decode(batch: pa.Table) -> pa.Table:
        html = pa.array(
            [base64.b64decode(s) if s is not None else None
             for s in batch["html_b64"].to_pylist()], pa.binary())
        return pa.table({
            "url": batch["url"],
            "warc_ts": pc.cast(batch["warc_ts"], pa.timestamp("us")),
            "html": html,
            "text": batch["text"],
            "lang": batch["lang"],
        })

    return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def write_crawl_csv(table: pa.Table, path: str) -> str:
    """Write a crawl table as CSV (html base64-encoded)."""
    import base64

    from pyarrow import csv as pacsv

    html_b64 = pa.array(
        [base64.b64encode(b).decode() if b is not None else None
         for b in table["html"].to_pylist()], pa.string())
    out = pa.table({
        "url": table["url"],
        "warc_ts": table["warc_ts"],
        "html_b64": html_b64,
        "text": table["text"],
        "lang": table["lang"],
    })
    pacsv.write_csv(out, path)
    return path


def read_crawl_jsonl(path: str) -> rd.Dataset:
    """Read a JSONL-format crawl dump (the shape raw crawl exports
    ship in): one object per line, ``html`` carried base64 (binary is
    not a JSON type), ``warc_ts`` ISO-8601."""
    import base64

    import pyarrow.compute as pc

    ds = rd.read_json(path)

    def decode(batch: pa.Table) -> pa.Table:
        html = pa.array(
            [base64.b64decode(s) if s is not None else None
             for s in batch["html_b64"].to_pylist()], pa.binary())
        ts = batch["warc_ts"]
        if not pa.types.is_timestamp(ts.type):
            # Arrow's cast handles fractional seconds; zone-suffixed
            # strings ('Z' / '+00:00', common in real exports) need a
            # tz-aware intermediate before dropping to naive UTC.
            s = pc.cast(ts, pa.string())
            try:
                ts = pc.cast(s, pa.timestamp("us"))
            except pa.ArrowInvalid:
                ts = pc.cast(pc.cast(s, pa.timestamp("us", tz="UTC")),
                             pa.timestamp("us"))
        elif ts.type.tz is not None:
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({
            "url": pc.cast(batch["url"], pa.string()),
            "warc_ts": pc.cast(ts, pa.timestamp("us")),
            "html": html,
            "text": pc.cast(batch["text"], pa.string()),
            "lang": pc.cast(batch["lang"], pa.string()),
        })

    return ds.map_batches(decode, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_crawl_jsonl(table: pa.Table, path: str) -> str:
    """Write a crawl table as JSONL (html base64-encoded)."""
    import base64
    import json

    with open(path, "w") as fh:
        for row in table.to_pylist():
            fh.write(json.dumps({
                "url": row["url"],
                "warc_ts": row["warc_ts"].isoformat(),
                "html_b64": base64.b64encode(row["html"]).decode()
                if row["html"] is not None else None,
                "text": row["text"],
                "lang": row["lang"],
            }) + "\n")
    return path


def read_tier(out_dir: str, tier: str,
              start=None, end=None,
              columns: list[str] | None = None) -> rd.Dataset:
    """Read a stored tier table with column pruning and a bucket_ts
    range filter pushed into the parquet scan (row groups outside the
    range never leave storage)."""
    import pyarrow.dataset as pads

    expr = None
    if start is not None:
        expr = pads.field("bucket_ts") >= pa.scalar(
            __import__("pandas").Timestamp(start).to_datetime64())
    if end is not None:
        e = pads.field("bucket_ts") < pa.scalar(
            __import__("pandas").Timestamp(end).to_datetime64())
        expr = e if expr is None else expr & e
    return rd.read_parquet(f"{out_dir}/{tier}", columns=columns,
                           filter=expr)


def write_partitioned(ds: rd.Dataset, path: str,
                      cfg: EngineConfig | None = None) -> None:
    cfg = cfg or EngineConfig()
    ds.write_parquet(path, partition_cols=["url_bucket"],
                     compression=cfg.parquet_compression)
