"""The engine's query surface + matching DuckDB oracle SQL.

``build_queries()`` returns one callable per implemented operator from
SURVEY.md §2 (each takes ``sf_dir``); ``build_oracle_sql()`` returns
the ANSI-SQL equivalent for every SQL-expressible one. Column names
match exactly between the two — computed columns are aliased
identically on both sides, and float columns are either exact
(integer-valued metrics, scaled-cents sums, identical IEEE expression
order) or rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from sits_classification_ray.config import TIER_SECONDS, EngineConfig
from sits_classification_ray.sources.synth import CRAWL_CTE, crawl_from_tables
from sits_classification_ray.stages.extract import extract, to_long
from sits_classification_ray.stages.gapfill import gapfill
from sits_classification_ray.stages.rollup import finalize, reaggregate, rollup
from sits_classification_ray.stages.series import assemble_series

CFG = EngineConfig()

OBS_COLS = ["url", "warc_ts", "lang", "text_len", "word_count"]
ROLLUP_COLS = ["url", "metric", "bucket_ts",
               "count", "sum", "min", "max", "mean", "last"]

# ---------------------------------------------------------------------------
# Shared SQL prefix: crawl synthesis → extraction → dedup → long format.
# Mirrors sources/synth.crawl_from_tables + stages/extract + stages/series.
# ---------------------------------------------------------------------------

# Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference,
# so an oracle touching obs_long three times would otherwise re-run
# the whole crawl synthesis + regex extraction up to 12× (measured
# 123 s → 0.9 s for the gap-fill oracle at sf0.01).
#
# The chain is kept as an ordered dict of stage → SELECT so a checker
# session can materialize each stage ONCE as a temp table and then
# strip the prefix from every oracle (tools/check_correctness.py);
# without that, a full sweep re-runs the regex pass per crawl query.
CRAWL_STAGES: dict[str, str] = {
    "ext": """SELECT url, warc_ts, lang,
         regexp_extract(CAST(html AS VARCHAR),
                        '(?s)<body>(.*)</body>', 1) AS text
  FROM crawl""",
    "scr": """SELECT url, warc_ts, lang, text,
         length(text) AS text_len,
         len(string_split(text, ' ')) AS word_count
  FROM ext WHERE text IS NOT NULL AND length(text) > 0""",
    "dd": """SELECT url, warc_ts, lang, text, text_len, word_count FROM (
    SELECT *, row_number() OVER (PARTITION BY url, warc_ts
              ORDER BY text_len, word_count, lang) AS rn FROM scr)
  WHERE rn = 1""",
    "obs": """SELECT * FROM dd
  WHERE url IN (SELECT url FROM dd GROUP BY url HAVING count(*) >= 2)""",
    "obs_long": """SELECT url, warc_ts, 'text_len' AS metric,
         CAST(text_len AS DOUBLE) AS value FROM obs
  UNION ALL
  SELECT url, warc_ts, 'word_count' AS metric,
         CAST(word_count AS DOUBLE) AS value FROM obs""",
}

CRAWL_PREFIX = f"WITH {CRAWL_CTE},\n" + ",\n".join(
    f"{name} AS MATERIALIZED (\n  {body})"
    for name, body in CRAWL_STAGES.items())


def _rollup_sql(unit: str) -> str:
    return f"""{CRAWL_PREFIX}
SELECT url, metric,
       CAST(date_trunc('{unit}', warc_ts) AS TIMESTAMP) AS bucket_ts,
       count(*) AS "count", sum(value) AS "sum", min(value) AS "min",
       max(value) AS "max", sum(value) / count(*) AS "mean",
       arg_max(value, warc_ts) AS "last"
FROM obs_long GROUP BY 1, 2, 3"""


_GAPFILL_GRID_SQL = """
bounds AS MATERIALIZED (
  SELECT url, metric, min(warc_ts) t0, max(warc_ts) t1
  FROM obs_long GROUP BY 1, 2),
grid AS MATERIALIZED (
  SELECT b.url, b.metric, make_timestamp(t.g) AS grid_ts
  FROM bounds b, unnest(generate_series(
      CAST(ceil(epoch_us(b.t0) / 3600000000.0) AS BIGINT) * 3600000000,
      CAST(floor(epoch_us(b.t1) / 3600000000.0) AS BIGINT) * 3600000000,
      3600000000)) AS t(g)),
prevs AS MATERIALIZED (
  SELECT g.url, g.metric, g.grid_ts, o.warc_ts AS pts, o.value AS pval
  FROM grid g ASOF LEFT JOIN obs_long o
    ON g.url = o.url AND g.metric = o.metric AND g.grid_ts >= o.warc_ts),
nexts AS MATERIALIZED (
  SELECT g.url, g.metric, g.grid_ts, o.warc_ts AS nts, o.value AS nval
  FROM grid g ASOF LEFT JOIN obs_long o
    ON g.url = o.url AND g.metric = o.metric AND g.grid_ts <= o.warc_ts),
joined AS (
  SELECT p.url, p.metric, p.grid_ts, p.pts, p.pval, n.nts, n.nval
  FROM prevs p JOIN nexts n
    ON p.url = n.url AND p.metric = n.metric AND p.grid_ts = n.grid_ts)"""

# value expression ordered exactly like np.interp: slope first, then
# slope * (x - x_lo) + y_lo — bitwise-identical IEEE sequence.
_GAPFILL_LINEAR_SQL = f"""{CRAWL_PREFIX},
{_GAPFILL_GRID_SQL}
SELECT url, metric, grid_ts,
  CASE
    WHEN pts IS NULL THEN nval
    WHEN nts IS NULL THEN pval
    WHEN nts = pts THEN pval
    ELSE ((nval - pval) / (epoch_us(nts) - epoch_us(pts)))
         * (epoch_us(grid_ts) - epoch_us(pts)) + pval
  END AS value,
  (pts IS NULL OR grid_ts <> pts) AS filled
FROM joined"""

_GAPFILL_LOCF_SQL = f"""{CRAWL_PREFIX},
{_GAPFILL_GRID_SQL}
SELECT url, metric, grid_ts,
  CASE WHEN pts IS NULL THEN nval ELSE pval END AS value,
  (pts IS NULL OR grid_ts <> pts) AS filled
FROM joined"""

# fill_method="none" (M8 drop-empty, reference utils/class_run.py:190-191):
# only exact observation hits carry values; everything else is NULL.
_GAPFILL_NONE_SQL = f"""{CRAWL_PREFIX},
{_GAPFILL_GRID_SQL}
SELECT url, metric, grid_ts,
  CASE WHEN pts = grid_ts THEN pval ELSE NULL END AS value,
  (pts IS NULL OR grid_ts <> pts) AS filled
FROM joined"""

# fill_method="seasonal": exact grid hits carry values; other cells
# copy the latest real observation in the same weekly lane (same
# epoch-us offset mod 7 days), backfilling leading lane gaps.
_GAPFILL_SEASONAL_SQL = f"""{CRAWL_PREFIX},
{_GAPFILL_GRID_SQL},
lanes AS (
  SELECT url, metric, grid_ts,
         epoch_us(grid_ts) % 604800000000 AS lane,
         CASE WHEN pts = grid_ts THEN pval ELSE NULL END AS hit,
         (pts IS NULL OR grid_ts <> pts) AS filled
  FROM joined)
SELECT url, metric, grid_ts,
  COALESCE(
    last_value(hit IGNORE NULLS) OVER (
      PARTITION BY url, metric, lane ORDER BY grid_ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    first_value(hit IGNORE NULLS) OVER (
      PARTITION BY url, metric, lane ORDER BY grid_ts
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
  ) AS value,
  filled
FROM lanes"""


# ---------------------------------------------------------------------------
# Ray-side helpers
# ---------------------------------------------------------------------------


_OBS_CACHE: dict[tuple[str, str], rd.Dataset] = {}


def _obs_cache_key(sf_dir: str) -> tuple[str, str]:
    """Cache key folding input-file identity (path, size, mtime) into
    the sf_dir path, so regenerated fixtures are never served stale."""
    from pathlib import Path

    from sits_classification_ray.state.manifest import lineage_hash

    files = sorted(str(p) for p in Path(sf_dir).glob("*.parquet"))
    return sf_dir, lineage_hash(files, "obs_prefix")


def _obs(sf_dir: str) -> rd.Dataset:
    """Assembled observation table, materialized once per sf_dir.

    A dozen queries start from the same synth→extract→assemble prefix;
    materializing it once (it is small — the deduped obs, not the
    crawl payload) keeps the driver's sequential query sweep from
    re-running the prefix every time."""
    key = _obs_cache_key(sf_dir)
    ds = _OBS_CACHE.get(key)
    if ds is None:
        ds = assemble_series(extract(crawl_from_tables(sf_dir), CFG),
                             CFG).materialize()
        _OBS_CACHE[key] = ds
    return ds


def _obs_long(sf_dir: str) -> rd.Dataset:
    return to_long(_obs(sf_dir), CFG.metrics)


def _rejects_crawl(sf_dir: str) -> rd.Dataset:
    """Quarantine report: rows the extraction screen drops, with the
    reason (``no_body`` / ``empty_body``). The synth corpus has no
    degenerate payloads, so the input is deterministically mangled
    first (by ``length(text) % 7``) — the SQL oracle applies the
    identical mangle, so the screen verdicts are fully exercised."""
    from sits_classification_ray.stages.extract import extract_rejects

    def mangle(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n = pc.utf8_length(text)
        m = pc.subtract(n, pc.multiply(pc.divide(n, 7), 7))
        html = pc.if_else(
            pc.equal(m, 0),
            pc.binary_join_element_wise("<html>", text, "</html>", ""),
            pc.if_else(pc.equal(m, 1),
                       pa.scalar("<html><body></body></html>", pa.string()),
                       pc.cast(batch["html"], pa.string())))
        i = batch.schema.get_field_index("html")
        return batch.set_column(i, "html", pc.cast(html, pa.binary()))

    ds = crawl_from_tables(sf_dir).map_batches(
        mangle, batch_format="pyarrow", zero_copy_batch=True)
    return extract_rejects(ds, CFG)


def _tier(sf_dir: str, tier: str) -> rd.Dataset:
    """Tier tables built through the re-aggregation chain (daily from
    hourly partials, weekly from daily) — the production path, so the
    oracle compare also certifies cross-tier exactness."""
    partials = rollup(_obs_long(sf_dir), TIER_SECONDS["hourly"], CFG)
    if tier in ("daily", "weekly"):
        partials = reaggregate(partials, TIER_SECONDS["daily"], CFG)
    if tier == "weekly":
        partials = reaggregate(partials, TIER_SECONDS["weekly"], CFG)
    return finalize(partials).select_columns(ROLLUP_COLS)


def _training_windows(sf_dir: str) -> rd.Dataset:
    """Fixed-length padded training windows over the gap-filled grid
    (the reference DataLoader collate, M13/M14); the SQL oracle checks
    the window partitioning summary (padding payloads are list columns
    the hash compare cannot carry)."""
    from sits_classification_ray.pipelines.training_feed import make_windows

    grid = gapfill(_obs_long(sf_dir), CFG)
    wins = make_windows(grid, seq_len=96, cfg=CFG)
    return wins.map_batches(
        lambda df: df[["url", "metric", "win_idx", "t0", "n_valid"]],
        batch_format="pandas")


def _hll_distinct_urls_daily(sf_dir: str) -> rd.Dataset:
    """Approximate distinct urls per day via a mergeable HyperLogLog
    sketch (the 10^12-row path where exact COUNT(DISTINCT) would
    shuffle every key; golden-checked against an independent HLL)."""
    from sits_classification_ray.functions.sketches import hll_distinct

    def day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="day"),
                                 pa.timestamp("us")),
        })

    obs_days = _obs(sf_dir).map_batches(day, batch_format="pyarrow",
                                        zero_copy_batch=True)
    return hll_distinct(obs_days, key_col="url", bucket_col="bucket_ts")


def _ams_f2_urls(sf_dir: str) -> pd.DataFrame:
    """AMS second-moment (self-join size / skew) sketch next to the
    exact F2 — a LINEAR sketch whose partials merge by plain addition
    (native Sum over ≤ rows×buckets integers); the exact side reduces
    fully distributed."""
    from sits_classification_ray.functions.sketches import ams_f2

    return ams_f2(_obs(sf_dir).select_columns(["url"]), "url")


def _hll_weekly_from_daily(sf_dir: str) -> rd.Dataset:
    """Weekly distinct-url estimates derived by MERGING the stored
    daily HLL sketches (register max) — the continuous-aggregate
    sketch path: the weekly tier never rescans keys, it exchanges one
    4 KiB sketch per day."""
    from sits_classification_ray.functions.sketches import (hll_rollup,
                                                            hll_sketches)

    def day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="day"),
                                 pa.timestamp("us")),
        })

    obs_days = _obs(sf_dir).map_batches(day, batch_format="pyarrow",
                                        zero_copy_batch=True)
    daily = hll_sketches(obs_days, key_col="url", bucket_col="bucket_ts")

    def week_of(s: pd.Series) -> pd.Series:
        return pd.to_datetime(s).dt.to_period("W-SUN").dt.start_time

    return hll_rollup(daily, "bucket_ts", week_of)


def _hopping_rollup_6h_1h(sf_dir: str) -> rd.Dataset:
    """Sliding 6-hour windows hopping hourly (streaming-shaped window
    aggregate; tumbling rollup is the window == hop special case)."""
    from sits_classification_ray.stages.rollup import hopping_rollup

    out = finalize(hopping_rollup(_obs_long(sf_dir), 6 * 3600, 3600, CFG))
    return out.select_columns(ROLLUP_COLS)


def _lang_daily(sf_dir: str) -> rd.Dataset:
    """Per-url daily lang-distribution counts (post-dedup)."""
    obs = _obs(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["warc_ts"], unit="day"),
                      pa.timestamp("us"))
        t = pa.table({"url": batch["url"], "bucket_ts": day,
                      "lang": batch["lang"]})
        return (t.group_by(["url", "bucket_ts", "lang"])
                .aggregate([([], "count_all")])
                .rename_columns(["url", "bucket_ts", "lang", "n"]))

    from ray.data.aggregate import Sum
    partials = obs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    return (partials.groupby(["url", "bucket_ts", "lang"])
            .aggregate(Sum("n", alias_name="n")))


_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def _pivot_lang_weekly(sf_dir: str) -> rd.Dataset:
    """Long→wide pivot as conditional aggregation: weekly crawl volume
    with one count column per language.

    The pivot column set is a declared config (like any SQL PIVOT —
    output schema must be static); each batch emits ONE partial row
    per week with per-lang conditional counts, so the exchange carries
    O(weeks × langs) cells, never the observations. Zero extra shuffle
    beyond the tiny final groupby."""
    from ray.data.aggregate import Sum

    obs = _obs(sf_dir).select_columns(["warc_ts", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        week = pc.cast(pc.floor_temporal(batch["warc_ts"], unit="week",
                                         week_starts_monday=True),
                       pa.timestamp("us"))
        t = pa.table({"bucket_ts": week, "lang": batch["lang"]})
        g = (t.group_by(["bucket_ts", "lang"])
             .aggregate([([], "count_all")])
             .rename_columns(["bucket_ts", "lang", "n"]))
        df = g.to_pandas()
        wide = df.pivot_table(index="bucket_ts", columns="lang",
                              values="n", aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=_PIVOT_LANGS, fill_value=0)
        wide.columns = [f"n_{c}" for c in wide.columns]
        wide = wide.astype(np.int64).reset_index()
        wide["n_total"] = wide[[f"n_{c}" for c in _PIVOT_LANGS]].sum(axis=1)
        return pa.Table.from_pandas(wide, preserve_index=False)

    partials = obs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    aggs = [Sum(f"n_{c}", alias_name=f"n_{c}") for c in _PIVOT_LANGS]
    aggs.append(Sum("n_total", alias_name="n_total"))
    return partials.groupby("bucket_ts").aggregate(*aggs)


def _events_rollup_hourly(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.pipelines.relational import events_long

    out = finalize(rollup(events_long(sf_dir, CFG.n_buckets),
                          TIER_SECONDS["hourly"], CFG))
    out = out.select_columns(["url", "bucket_ts", "count", "min", "max",
                              "last"])
    return out.rename_columns({"url": "entity"})


def _gapfill(sf_dir: str, method: str) -> rd.Dataset:
    # the assembled obs table is independent of the fill method —
    # reuse the materialized prefix and vary only the fill stage
    cfg = EngineConfig(fill_method=method)
    out = gapfill(_obs_long(sf_dir), cfg)
    return out.select_columns(["url", "metric", "grid_ts", "value", "filled"])


def _gorilla_segments(sf_dir: str) -> rd.Dataset:
    """Encode every (url, metric) stream; report sizes + roundtrip check."""
    from sits_classification_ray.functions.gorilla import decode_series
    from sits_classification_ray.pipelines.rollup_pipeline import segments_stage

    seg = segments_stage(_obs_long(sf_dir))

    def check(df: pd.DataFrame) -> pd.DataFrame:
        ok = np.empty(len(df), dtype=bool)
        for i, row in enumerate(df.itertuples(index=False)):
            dts, dvals = decode_series(row.ts_codes, row.val_codes, row.n)
            ok[i] = bool(
                (dts[0] == np.datetime64(row.t_start, "us").astype(np.int64))
                and (dts[-1] == np.datetime64(row.t_end, "us").astype(np.int64)))
        return pd.DataFrame({
            "url": df["url"], "metric": df["metric"], "n": df["n"],
            "ts_bytes": df["ts_codes"].str.len(),
            "val_bytes": df["val_codes"].str.len(),
            "raw_bytes": 16 * df["n"].astype(np.int64),
            "roundtrip_ok": ok,
        })

    return seg.map_batches(check, batch_format="pandas")


def _gapfill_unbounded(sf_dir: str) -> rd.Dataset:
    """Sort+halo-exchange gap-fill (no per-series size bound) — same
    oracle as gapfill_linear, so the driver certifies the halo
    algebra, not just the kernel."""
    from sits_classification_ray.stages.gapfill_sorted import \
        gapfill_unbounded

    out = gapfill_unbounded(_obs_long(sf_dir), EngineConfig(),
                            num_blocks=16)
    return out.select_columns(["url", "metric", "grid_ts", "value",
                               "filled"])


def _gorilla_roundtrip(sf_dir: str) -> rd.Dataset:
    """Driver-checkable codec proof: every (url, metric) stream is
    Gorilla-encoded, decoded back, and summarized from the DECODED
    arrays — the SQL oracle computes the same summaries from the raw
    observations, so a hash match certifies bit-exact roundtrip."""
    from sits_classification_ray.functions.gorilla import decode_series
    from sits_classification_ray.pipelines.rollup_pipeline import segments_stage

    seg = segments_stage(_obs_long(sf_dir))

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        out = {
            "url": df["url"].to_numpy(), "metric": df["metric"].to_numpy(),
            "n": np.empty(n, np.int64),
            "t_start": np.empty(n, "datetime64[us]"),
            "t_end": np.empty(n, "datetime64[us]"),
            "ts_sum_ms": np.empty(n, np.int64),
            "val_sum": np.empty(n, np.float64),
            "val_min": np.empty(n, np.float64),
            "val_max": np.empty(n, np.float64),
        }
        for i, row in enumerate(df.itertuples(index=False)):
            ts, vals = decode_series(row.ts_codes, row.val_codes, int(row.n))
            out["n"][i] = len(ts)
            out["t_start"][i] = ts[0]
            out["t_end"][i] = ts[-1]
            out["ts_sum_ms"][i] = (ts // 1000).sum()
            out["val_sum"][i] = vals.sum()
            out["val_min"][i] = vals.min()
            out["val_max"][i] = vals.max()
        return pd.DataFrame(out)

    return seg.map_batches(summarize, batch_format="pandas")


def _similarity_topk(sf_dir: str) -> pd.DataFrame:
    from sits_classification_ray.stages.similarity import brute_force_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # push the query-vector selection down — never take_all the corpus
    qrows = emb.filter(expr="vec_id <= 4").take_all()
    queries = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
               for r in qrows}
    return brute_force_topk(emb, queries, k=10)


def _ivf_topk(sf_dir: str) -> pd.DataFrame:
    from sits_classification_ray.stages.similarity import (ivf_assign,
                                                           ivf_topk,
                                                           train_centroids)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    cent = train_centroids(emb, n_lists=8, iters=5, seed=0,
                           id_col="vec_id")
    assigned = ivf_assign(emb, cent)
    qrows = emb.filter(expr="vec_id <= 2").take_all()
    queries = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
               for r in qrows}
    return ivf_topk(assigned, cent, queries, k=10, n_probe=3)


def _embedding_near_dup(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.dedup_docs import embedding_near_dup

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_near_dup(emb, threshold=0.4)
    return out.map_batches(
        lambda df: df.assign(cos_sim=df["cos_sim"].round(6)),
        batch_format="pandas")


def _embedding_near_dup_ivf(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.dedup_docs import embedding_near_dup_ivf

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_near_dup_ivf(emb, threshold=0.4, n_lists=8)
    return out.map_batches(
        lambda df: df.assign(cos_sim=df["cos_sim"].round(6)),
        batch_format="pandas")


def _srp_near_dup_embeddings(sf_dir: str) -> rd.Dataset:
    """SRP-LSH (signed-random-projection) cosine near-dup — the
    LSH-bucketed ANN variant next to exact blockwise and IVF. Input is
    the embeddings table plus deterministic planted near-copies (every
    vec_id % 10 == 0, even coordinates × 1.05, id + 10⁶) so the
    high-similarity regime LSH targets actually exists in the synth
    data; golden-checked against an independent numpy model."""
    from sits_classification_ray.stages.similarity import srp_near_dup

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def aug(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy().astype(np.int64)
        sel = ids % 10 == 0
        Xp = X[sel].copy()
        Xp[:, ::2] *= 1.05
        return pd.DataFrame({
            "vec_id": np.concatenate([ids, ids[sel] + 1_000_000]),
            "embedding": list(np.concatenate([X, Xp])),
        })

    aug_ds = emb.map_batches(aug, batch_format="pandas")
    return srp_near_dup(aug_ds, dim=64, threshold=0.98)


def _exact_dedup_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.dedup_docs import exact_dedup

    return exact_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                       columns=["doc_id", "text"]))


def _text_stats_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import text_stats

    return text_stats(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"]))


def _vocab_top100_documents(sf_dir: str) -> pd.DataFrame:
    from sits_classification_ray.stages.textstats import top_vocabulary

    return top_vocabulary(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                          columns=["text"]), n=100)


def _top3_docs_per_lang(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.sampling import top_k_per_group

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    return top_k_per_group(docs, ["lang"], "n_chars", k=3,
                           ascending=False, tie_col="doc_id")


def _quality_score_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import quality_score

    return quality_score(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                         columns=["doc_id", "text"]))


def _langid_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import lang_id

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return lang_id(ds).select_columns(["doc_id", "lang", "pred_lang"])


def _simhash_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.dedup_docs import simhash

    return simhash(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"]))


def _fingerprint_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import fingerprint

    return fingerprint(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                       columns=["doc_id", "text"]))


def _minhash_near_dup_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.dedup_docs import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, shingle_k=5, num_perm=64, bands=16,
                               threshold=0.5)


def _jaccard_near_dup_documents(sf_dir: str) -> rd.Dataset:
    """Exact (non-probabilistic) n-gram Jaccard near-dup: df-capped
    shingle inverted-index candidates + exact verify — the
    deterministic sibling of the MinHash path, SQL-checkable because
    word shingles are expressible in DuckDB."""
    from sits_classification_ray.stages.dedup_docs import jaccard_near_dup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return jaccard_near_dup(ds, w=3, df_cap=32, threshold=0.5)


def _winnowing_near_dup_documents(sf_dir: str) -> rd.Dataset:
    """Winnowing/MOSS near-dup (Schleimer et al. 2003): positional
    k-gram fingerprints with per-window rightmost-minimum selection
    (the LOCAL guarantee — any shared substring of length ≥ w+k−1 is
    caught, which LSH cannot promise), df-capped fingerprint buckets,
    distributed shared-fingerprint count per pair (golden oracle:
    independent window-loop implementation)."""
    from sits_classification_ray.stages.dedup_docs import winnowing_near_dup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return winnowing_near_dup(ds, k=12, w=8, min_shared=8, df_cap=32)


def _dup_spans_documents(sf_dir: str) -> rd.Dataset:
    """Suffix-array-style repeated-span detection (Lee et al. 2021):
    maximal token spans covered by word-4-grams that occur in ≥ 2
    distinct documents — the span-level (sub-document) sibling of the
    document-level dedup family, SQL-checkable because word grams and
    interval islands are expressible in DuckDB windows."""
    from sits_classification_ray.stages.dedup_docs import dup_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return dup_spans(ds, k=4)


def _trim_dup_spans_documents(sf_dir: str) -> rd.Dataset:
    """Duplicate-span REMOVAL (the Lee et al. 2021 trim step): every
    document with its cross-document duplicated 4-gram token spans
    deleted — composes dup_spans with a tag-union re-attach so the
    span table never reaches the driver."""
    from sits_classification_ray.stages.dedup_docs import trim_dup_spans

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return trim_dup_spans(ds, k=4)


def _snm_near_dup_documents(sf_dir: str) -> rd.Dataset:
    """Sorted-neighborhood near-dup (Hernández–Stolfo merge/purge):
    global sort by a text prefix key, pairs within a 3-position
    window, exact word-shingle Jaccard verify — the sort-based third
    member of the candidate-generation triad (LSH / inverted index /
    sorted neighborhood)."""
    from sits_classification_ray.stages.dedup_docs import snm_near_dup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return snm_near_dup(ds, window=3, w=3, threshold=0.5)


def _near_dup_clusters_documents(sf_dir: str) -> rd.Dataset:
    """MinHash pairs → connected components: one (doc_id, cluster_id)
    row per doc in any near-dup component, cluster id = smallest
    member id (golden-checked vs an independent union-find)."""
    from sits_classification_ray.stages.dedup_docs import (
        connected_components, ngram_jaccard_pairs)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, shingle_k=5, num_perm=64, bands=16,
                                threshold=0.5)
    return connected_components(pairs)


def _label_centroids_embeddings(sf_dir: str) -> rd.Dataset:
    """Per-label embedding centroids (class prototypes), long format;
    partial-sum sketches per batch, vectors never shuffle."""
    from sits_classification_ray.stages.similarity import label_centroids

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"])
    return label_centroids(ds)


def _nearest_centroid_embeddings(sf_dir: str) -> rd.Dataset:
    """Nearest-class-mean prediction per vector: centroids (tiny L·D
    table) broadcast once via ray.put, one (B,L) matmul per batch."""
    from sits_classification_ray.stages.similarity import (
        label_centroids, nearest_centroid_predict)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    cents = label_centroids(ds.select_columns(["embedding", "label"]))
    return nearest_centroid_predict(ds, cents)


def _knn_classify_embeddings(sf_dir: str) -> pd.DataFrame:
    """k-NN majority-vote classification over a deterministic hash
    split (vec_id % 50 == 0 → query fold): bounded query matrix
    broadcast once, per-block partial top-k with neighbor labels,
    driver-side bounded vote."""
    from sits_classification_ray.stages.similarity import knn_classify

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    return knn_classify(ds, k=10, test_mod=50)


def _global_rank_documents(sf_dir: str) -> rd.Dataset:
    """Corpus-wide length percentile per doc (quality-cutoff /
    curriculum ordering primitive) via the distributed-rank
    construction — per-block lengths + O(B) offset prefix, never a
    driver-side row pass."""
    from sits_classification_ray.stages.scan_sorted import global_rank

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    return global_rank(ds, ["n_chars", "doc_id"])


def _ntile_documents(sf_dir: str) -> rd.Dataset:
    """NTILE(4) quartile assignment by document length — the SQL
    window-bucketing operator via the O(B)-driver rank construction."""
    from sits_classification_ray.stages.scan_sorted import ntile

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    return ntile(ds, ["n_chars", "doc_id"], k=4)


def _regex_token_stats_documents(sf_dir: str) -> rd.Dataset:
    """Regex-class token counting (the BPE-ish pre-tokenizer split:
    letter runs / digit runs / single punctuation, whitespace
    discarded) next to the whitespace word count — per-batch vectorized
    pyarrow regex kernels, zero shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        n_alpha = pc.count_substring_regex(txt, r"[A-Za-z]+")
        n_digit = pc.count_substring_regex(txt, r"[0-9]+")
        n_punct = pc.count_substring_regex(txt, r"[^A-Za-z0-9\s]")
        total = pc.add(pc.add(n_alpha, n_digit), n_punct)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_alpha": pc.cast(n_alpha, pa.int64()),
            "n_digit": pc.cast(n_digit, pa.int64()),
            "n_punct": pc.cast(n_punct, pa.int64()),
            "n_tokens": pc.cast(total, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True)


def _chunk_documents(sf_dir: str) -> rd.Dataset:
    """Overlapping 64-token training chunks (stride 48) per doc —
    flat-map row expansion, no shuffle."""
    from sits_classification_ray.stages.textstats import chunk_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return chunk_documents(ds, chunk_tokens=64, stride=48)


def _pack_sequences_documents(sf_dir: str) -> rd.Dataset:
    """GPT-style sequence-packing layout table: documents concatenated
    in id order into one token stream, chopped at fixed 128-token
    training-window boundaries (global prefix sum over token counts —
    O(blocks) driver traffic, nothing row-scaled)."""
    from sits_classification_ray.pipelines.training_feed import (
        pack_sequences)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return pack_sequences(ds, max_tokens=128)


def _scrub_pii_documents(sf_dir: str) -> rd.Dataset:
    """PII redaction over a deterministically composed PII-bearing
    column (the synthetic corpus carries no emails/IPs/phones, so both
    sides append 'contact: user<id>@… ip 10.… tel: …' to the text and
    the SCRUB is what the oracle checks — nested RE2-compatible
    regexp_replace twins in SQL)."""
    from sits_classification_ray.stages.textstats import scrub_pii

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def compose(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        did = df["doc_id"].to_numpy(np.int64)
        s = pd.Series(did).astype(str)
        comp = (df["text"].str.slice(0, 80)
                + " contact: user" + s + "@mail.example.org ip 10."
                + pd.Series(did % 200).astype(str)
                + ".0.7 tel: +1 555 0100 "
                + pd.Series(did % 90 + 10).astype(str))
        return pd.DataFrame({"doc_id": did, "text": comp})

    return scrub_pii(ds.map_batches(compose, batch_format="pandas"))


def _incremental_near_dup_documents(sf_dir: str) -> rd.Dataset:
    """Ingest-time delta dedup: docs with id ≥ 400 arrive 'new' and
    are deduped against the existing corpus's band index only — no
    old×old pairs are ever generated (golden-checked: equals the
    full-corpus pair set filtered to pairs touching a new doc)."""
    from sits_classification_ray.stages.dedup_docs import \
        incremental_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    old = docs.filter(expr="doc_id < 400")
    new = docs.filter(expr="doc_id >= 400")
    return incremental_jaccard_pairs(old, new, shingle_k=5, num_perm=64,
                                     bands=16, threshold=0.5)


def _simhash_near_dup_documents(sf_dir: str) -> rd.Dataset:
    """SimHash banded-hamming pair detection (lossless at radius 3;
    golden-checked vs brute-force all-pairs hamming)."""
    from sits_classification_ray.stages.dedup_docs import simhash_near_dup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return simhash_near_dup(ds, max_hamming=3)


def _near_dup_keep_one_documents(sf_dir: str) -> rd.Dataset:
    """Corpus-level keep-one dedup: MinHash pairs → connected
    components → distributed anti-join of non-canonical members
    (golden-checked vs an independent union-find drop set)."""
    from sits_classification_ray.stages.dedup_docs import (
        near_dup_keep_one, ngram_jaccard_pairs)

    text_ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(text_ds, shingle_k=5, num_perm=64,
                                bands=16, threshold=0.5)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    return near_dup_keep_one(docs, pairs)


def _stm_per_series(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.stm import temporal_metrics

    return temporal_metrics(_obs_long(sf_dir))


def _class_weights_embeddings(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.sampling import class_weights

    return class_weights(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label"]), "label")


def _distinct_lang_source(sf_dir: str) -> rd.Dataset:
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source"])
    return (ds.groupby(["lang", "source"]).aggregate(Count(alias_name="_n"))
            .select_columns(["lang", "source"]))


def _normalized_metrics(sf_dir: str) -> rd.Dataset:
    def norm(t: pa.Table) -> pa.Table:
        # no rounding: the raw IEEE product/log of identical inputs is
        # bit-identical across engines, while round() itself is not
        x = pc.cast(t["text_len"], pa.float64())
        return pa.table({
            "url": t["url"],
            "warc_ts": t["warc_ts"],
            "text_len_scaled": pc.multiply(x, 0.0001),
            "text_len_log": pc.log10(pc.add(x, 1.0)),
        })

    return _obs(sf_dir).map_batches(norm, batch_format="pyarrow",
                                    zero_copy_batch=True)


def _harmonic_daily(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.stm import HarmonicFit, apply_series_udf

    udf = HarmonicFit(period_seconds=7 * 86400.0, k=2, grid_seconds=86400)
    out = apply_series_udf(_obs_long(sf_dir), udf)
    return out.map_batches(
        lambda df: df.assign(value=df["value"].round(6)),
        batch_format="pandas")


def _langid_confusion(sf_dir: str) -> pd.DataFrame:
    from sits_classification_ray.stages.sampling import confusion_matrix
    from sits_classification_ray.stages.textstats import lang_id

    ds = lang_id(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"]))
    return confusion_matrix(ds, "lang", "pred_lang")


def _stratified_sample_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.sampling import stratified_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return stratified_sample(ds, "lang", 0.25, seed=7)


def _train_test_split_sizes(sf_dir: str) -> pd.DataFrame:
    from sits_classification_ray.stages.sampling import train_test_split

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    train, test = train_test_split(ds, test_frac=0.2, seed=42)
    return pd.DataFrame({"split": ["train", "test"],
                         "n": [train.count(), test.count()]})


def _html_byte_features(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.multimodal import binary_features

    crawl = crawl_from_tables(sf_dir)
    feats = binary_features(crawl, payload_col="html", batch_size=1024)
    return feats.select_columns(["url", "warc_ts", "byte_len", "entropy",
                                 "frac_lower", "mode_byte",
                                 "content_type"])


def _sniffed_assets_crawl(sf_dir: str) -> rd.Dataset:
    """Mixed-media decode: wrap each crawl payload in a REAL image
    container (kind/dims derived from the payload length), then
    magic-byte sniff + header-parse dimensions back out — the
    codec-free half of media decode, exercised on genuine PNG/GIF/BMP/
    JPEG structures (golden oracle: independent struct parser)."""
    from sits_classification_ray.stages.multimodal import (
        make_image_container, sniff_assets)

    KINDS = ["png", "gif", "bmp", "jpeg", None]

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b""
            n = len(h)
            kind = KINDS[n % 5]
            payloads.append(h if kind is None else make_image_container(
                h, kind, 1 + n % 317, 1 + n % 211))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    out = sniff_assets(assets, payload_col="payload")
    return out.select_columns(["url", "warc_ts", "content_type",
                               "width", "height", "byte_len"])


def _resized_thumbnails_crawl(sf_dir: str) -> rd.Dataset:
    """REAL image resize, codec-free: crawl payloads become genuine
    binary PGM (P5) rasters (pixels = html bytes tiled to w×h), an
    actor-pool stage decodes the raster and nearest-neighbor-resamples
    it to 16×16 — full pixel-level decode+transform, not a stub. The
    crc32 of each resized raster makes the check bit-strong."""
    from sits_classification_ray.stages.multimodal import (make_pgm,
                                                           resize_pgm)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b"\x00"
            n = len(h)
            w, ht = 8 + n % 40, 8 + n % 30
            need = w * ht
            px = (h * (need // n + 1))[:need]
            payloads.append(make_pgm(px, w, ht))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    out = resize_pgm(assets, out_w=16, out_h=16)
    return out.select_columns(["url", "warc_ts", "thumb_crc32",
                               "pixel_sum", "n_dark"])


def _png_thumbnails_crawl(sf_dir: str) -> rd.Dataset:
    """REAL compressed-image decode via stdlib zlib: crawl payloads
    become genuine deflate-compressed PNGs (8-bit gray, RGB, or
    indexed-color PLTE on every fifth payload, all five scanline
    filters cycling by row, and every third payload a REAL Adam7
    interlaced stream — r5), an actor-pool stage inflates IDAT,
    unfilters (+ deinterlaces, + palette-expands) per the PNG spec,
    collapses RGB to exact
    integer luma and nearest-neighbor-resamples to 16×16. The golden
    oracle computes the expected thumbnail straight from the raw html
    bytes WITHOUT any PNG code, so a hash match proves the
    encode→inflate→unfilter chain is an exact identity (reference
    analog: compressed-raster read, pytorch/predict.py:346-455)."""
    import numpy as np

    from sits_classification_ray.stages.multimodal import (make_png,
                                                           png_thumbnails)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b"\x00"
            n = len(h)
            w, ht = 8 + n % 40, 8 + n % 30
            if n % 5 == 0:
                # indexed-color (PLTE) payload: byte raster as indices,
                # palette tiled from the same bytes — r5
                need = w * ht
                idx = np.frombuffer((h * (need // n + 1))[:need],
                                    np.uint8).reshape(ht, w)
                pal = np.frombuffer((h * (768 // n + 2))[:768],
                                    np.uint8).reshape(256, 3)
                payloads.append(make_png(idx, interlace=(n % 3 == 0),
                                         palette=pal))
                continue
            rgb = n % 2 == 1
            need = w * ht * (3 if rgb else 1)
            px = np.frombuffer((h * (need // n + 1))[:need], np.uint8)
            px = px.reshape(ht, w, 3) if rgb else px.reshape(ht, w)
            payloads.append(make_png(px, interlace=(n % 3 == 0)))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    out = png_thumbnails(assets, out_w=16, out_h=16)
    return out.select_columns(["url", "warc_ts", "width", "height",
                               "thumb_crc32", "pixel_sum", "n_dark"])


def _gif_thumbnails_crawl(sf_dir: str) -> rd.Dataset:
    """REAL GIF LZW decode (r5): crawl payloads become genuine GIF89a
    files — a 256-entry palette and index raster tiled from the html
    bytes, compressed with a real dictionary-building LZW encoder
    (variable 9–12-bit codes, CLEAR resets at the 4096 cap), every
    third payload 4-pass interlaced — and an actor-pool stage decodes
    the LZW stream, deinterlaces, palette-expands and thumbnails to
    16×16 integer luma. The golden twin derives the expected pixels
    straight from the raw bytes with no GIF code, so a hash match
    proves the LZW layer is an exact identity (reference analog:
    compressed-raster read, pytorch/predict.py:346-455)."""
    import numpy as np

    from sits_classification_ray.stages.multimodal import (gif_thumbnails,
                                                           make_gif)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b"\x00"
            n = len(h)
            w, ht = 8 + n % 37, 8 + n % 23
            need = w * ht
            idx = np.frombuffer((h * (need // n + 1))[:need],
                                np.uint8).reshape(ht, w)
            pal = np.frombuffer((h * (768 // n + 2))[:768],
                                np.uint8).reshape(256, 3)
            payloads.append(make_gif(idx, pal, interlace=(n % 3 == 0)))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    out = gif_thumbnails(assets, out_w=16, out_h=16)
    return out.select_columns(["url", "warc_ts", "width", "height",
                               "thumb_crc32", "pixel_sum", "n_dark"])


def _jpeg_thumbnails_crawl(sf_dir: str) -> rd.Dataset:
    """REAL baseline-JPEG decode: crawl payloads become genuine
    entropy-coded JPEGs (Annex-K tables, differential DC, ZRL/EOB
    run-length AC, byte stuffing), an actor-pool stage Huffman-decodes
    the scan, dequantizes, runs the IDCT and thumbnails to 16×16. The
    golden oracle computes the expected pixels through the SAME lossy
    DCT core but WITHOUT any bitstream code, so a hash match proves
    the marker + Huffman layer is exactly lossless around the
    quantization (reference analog: compressed-raster read,
    pytorch/predict.py:346-455)."""
    import numpy as np

    from sits_classification_ray.stages.jpeg import make_jpeg
    from sits_classification_ray.stages.multimodal import jpeg_thumbnails

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b"\x00"
            n = len(h)
            w, ht = 8 + n % 40, 8 + n % 30
            need = w * ht
            px = np.frombuffer((h * (need // n + 1))[:need],
                               np.uint8).reshape(ht, w)
            payloads.append(make_jpeg(px))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    out = jpeg_thumbnails(assets, out_w=16, out_h=16)
    return out.select_columns(["url", "warc_ts", "width", "height",
                               "thumb_crc32", "pixel_sum", "n_dark"])


def _jpeg_color_thumbnails_crawl(sf_dir: str) -> rd.Dataset:
    """REAL 3-component color-JPEG decode (VERDICT r4 #4): crawl
    payloads become genuine YCbCr baseline JPEGs — alternating 4:2:0
    (even-length html) and 4:4:4 (odd) so BOTH subsampling paths are
    oracle-checked, with DRI/RSTn restart markers every n%4 MCUs on
    most payloads and every seventh payload a PROGRESSIVE (SOF2)
    spectral-selection stream (DC scan + per-component AC band scans
    with EOBn coding) — and an actor-pool stage Huffman-decodes the
    scans (multi-scan marker walk, restart resync, EOBRUN),
    dequantizes luma+chroma against the stream's own tables, IDCTs,
    upsamples chroma and converts to RGB. The
    golden twin derives the expected pixels from the raw bytes through
    the same lossy core WITHOUT any bitstream code, so a hash match
    proves the color marker/entropy layer is exactly lossless around
    the quantization (reference analog: compressed-raster read,
    pytorch/predict.py:346-455)."""
    import numpy as np

    from sits_classification_ray.stages.jpeg import make_jpeg_color
    from sits_classification_ray.stages.multimodal import (
        jpeg_color_thumbnails)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b"\x00"
            n = len(h)
            w, ht = 8 + n % 25, 8 + n % 17
            need = w * ht * 3
            px = np.frombuffer((h * (need // n + 1))[:need],
                               np.uint8).reshape(ht, w, 3)
            payloads.append(make_jpeg_color(
                px, subsample=(n % 2 == 0),
                restart_interval=0 if n % 7 == 0 else n % 4,
                progressive=(n % 7 == 0)))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    out = jpeg_color_thumbnails(assets, out_w=16, out_h=16)
    return out.select_columns(["url", "warc_ts", "width", "height",
                               "thumb_crc32", "pixel_sum", "n_dark"])


def _wav_features_crawl(sf_dir: str) -> rd.Dataset:
    """REAL audio decode, codec-free: crawl payloads become genuine
    RIFF/WAVE PCM files (samples = html byte pairs as int16), an
    actor-pool stage walks the RIFF chunks, decodes the raster and
    emits exact integer features (energy Σs², zero crossings, peak
    256-sample frame) — the audio sibling of the PGM resize."""
    from sits_classification_ray.stages.multimodal import (make_wav,
                                                           wav_features)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b"\x00\x00"
            payloads.append(make_wav(h[:len(h) - len(h) % 2]))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    out = wav_features(assets)
    return out.select_columns(["url", "warc_ts", "n_samples", "energy",
                               "zero_crossings", "peak_frame"])


def _set_op_urls_weeks(sf_dir: str, op: str) -> rd.Dataset:
    """Formal set ops over distinct url sets (first vs last ISO week):
    INTERSECT / EXCEPT as a per-batch membership combiner + one tiny
    Sum-merge — no distinct-building shuffle per side, the exchange
    carries (url, in_a, in_b) partial flags."""
    from ray.data.aggregate import Sum

    obs = _obs(sf_dir).select_columns(["url", "warc_ts"])
    lo = pd.Timestamp(obs.min("warc_ts")).to_period("W-SUN").start_time
    hi = pd.Timestamp(obs.max("warc_ts")).to_period("W-SUN").start_time

    def partial(batch: pa.Table) -> pa.Table:
        week = pc.floor_temporal(batch["warc_ts"], unit="week",
                                 week_starts_monday=True)
        wk = pc.cast(week, pa.timestamp("us")).to_pandas()
        df = pd.DataFrame({"url": batch["url"].to_pandas(),
                           "in_a": (wk == lo).astype(np.int64),
                           "in_b": (wk == hi).astype(np.int64)})
        g = df.groupby("url", as_index=False)[["in_a", "in_b"]].sum()
        return pa.Table.from_pandas(g[(g["in_a"] > 0) | (g["in_b"] > 0)],
                                    preserve_index=False)

    partials = obs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    merged = partials.groupby("url").aggregate(
        Sum("in_a", alias_name="in_a"), Sum("in_b", alias_name="in_b"))

    def finish(t: pa.Table) -> pa.Table:
        a = pc.greater(t["in_a"], 0)
        b = pc.greater(t["in_b"], 0)
        keep = pc.and_(a, b) if op == "intersect" else \
            pc.and_(a, pc.invert(b))
        return t.filter(keep).select(["url"])

    return merged.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def _typo_pairs_urls(sf_dir: str) -> rd.Dataset:
    """Edit-distance-1 url pairs (typo/mirror detection) via FastSS
    deletion-neighborhood blocking + exact verify — recall is
    structural (not probabilistic), SQL-checked against DuckDB's
    levenshtein over the same blocking. The synth urls are all ≥2
    edits apart, so every 20th user id plants a one-char-deleted
    variant (deterministic, mirrored in the oracle)."""
    from ray.data.aggregate import Count

    from sits_classification_ray.stages.urlnorm import typo_pairs

    urls = _obs(sf_dir).select_columns(["url"])
    distinct = urls.groupby("url").aggregate(
        Count(alias_name="_n")).drop_columns(["_n"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        import re

        us = df["url"].tolist()
        extra = []
        for u in us:
            m = re.search(r"/u/(\d+)$", u)
            if m and int(m.group(1)) % 20 == 0:
                p = 9 + int(m.group(1)) % 10
                extra.append(u[:p] + u[p + 1:])
        return pd.DataFrame({"url": us + extra})

    planted = distinct.map_batches(plant, batch_format="pandas")
    return typo_pairs(planted, col="url")


def _rank_in_domain_crawl(sf_dir: str) -> rd.Dataset:
    """Windowed rank within a partition key: urls dense-ranked by
    snapshot count inside their domain (PARTITION BY domain ORDER BY
    n DESC) — per-url counts reduce first, then one salted exchange
    on domain ranks each group with a vectorized kernel."""
    from ray.data.aggregate import Count

    from sits_classification_ray.stages.shuffle import partitioned_map

    obs = _obs(sf_dir).select_columns(["url"])

    def with_domain(batch: pa.Table) -> pa.Table:
        dom = pc.replace_substring_regex(batch["url"],
                                         r"^https?://([^/]+)/.*$", r"\1")
        return pa.table({"domain": dom, "url": batch["url"]})

    counts = (obs.map_batches(with_domain, batch_format="pyarrow",
                              zero_copy_batch=True)
              .groupby(["domain", "url"])
              .aggregate(Count(alias_name="n")))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("domain", sort=False):
            g = g.sort_values(["n", "url"], ascending=[False, True])
            r = g["n"].rank(method="dense", ascending=False)
            g = g.assign(rnk=r.astype(np.int64))
            outs.append(g)
        if not outs:
            return df.assign(rnk=pd.Series([], dtype=np.int64))
        return pd.concat(outs, ignore_index=True)

    return partitioned_map(counts, rank, keys=["domain"])


def _extract_links_crawl(sf_dir: str) -> rd.Dataset:
    """Link-graph extraction (the canonical web-corpus flat-map):
    deterministic anchors are injected into each page (text_len % 4
    links, hrefs derived from the text length), then the engine
    regex-extracts every href — one output row per link."""
    from sits_classification_ray.stages.urlnorm import regex_extract_rows

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        pages = []
        for h in df["html"]:
            s = (h or b"").decode("utf-8", "replace")
            n = len(s)
            k = n % 4
            anchors = "".join(
                f'<a href="https://site-{(n + j) % 40}.example.com/p/{j}">'
                f'x</a>' for j in range(k))
            pages.append(s.replace("</body>", anchors + "</body>"))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "page": pages})

    pages = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    return regex_extract_rows(pages, "page", r'href="([^"]+)"', "href",
                              keep_cols=["url", "warc_ts"])


def _anchor_text_rollup_crawl(sf_dir: str) -> rd.Dataset:
    """Anchor-text aggregation per link target — the web-corpus
    signal used for retrieval/labeling (anchor text describes the
    TARGET page): per href, total in-links, distinct source pages,
    and the modal anchor text (count DESC, text ASC tie-break).

    Scale shape: regex pair flat-map → two distributed pre-aggregated
    groupbys (pair counts, distinct sources) → per-href kernel over
    the SMALL count table → hash join. The raw link table is never
    collected; a hot href meets the kernel only as its per-anchor
    count rows."""
    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.shuffle import partitioned_map
    from sits_classification_ray.stages.urlnorm import regex_extract_pairs

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        pages = []
        for h in df["html"]:
            s = (h or b"").decode("utf-8", "replace")
            n = len(s)
            anchors = "".join(
                f'<a href="https://site-{(n + j) % 40}.example.com/p/{j}">'
                f'w{(n + 3 * j) % 11}</a>' for j in range(n % 4))
            pages.append(s.replace("</body>", anchors + "</body>"))
        return pd.DataFrame({"url": df["url"], "page": pages})

    pages = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    links = regex_extract_pairs(
        pages, "page", r'<a href="([^"]+)">([^<]*)</a>',
        ("href", "anchor"), keep_cols=["url"])

    pair_counts = links.groupby(["href", "anchor"]).count()
    src_counts = (links.groupby(["href", "url"]).count()
                  .groupby("href").count()
                  .map_batches(lambda df: df.rename(
                      columns={"count()": "n_sources"}),
                      batch_format="pandas"))

    def top_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"count()": "c"}).sort_values(
            ["href", "c", "anchor"], ascending=[True, False, True],
            kind="mergesort")
        g = df.groupby("href", sort=False)
        head = g.head(1).reset_index(drop=True)
        sums = g["c"].sum().reset_index(drop=True)
        return pd.DataFrame({
            "href": head["href"],
            "n_links": sums.to_numpy(np.int64),
            "top_anchor": head["anchor"],
            "top_count": head["c"].to_numpy(np.int64),
        })

    top = partitioned_map(pair_counts, top_kernel, keys=["href"])
    out = hash_join(top, src_counts, on="href")
    return out.select_columns(["href", "n_links", "n_sources",
                               "top_anchor", "top_count"])


def _y4m_scene_stats_crawl(sf_dir: str) -> rd.Dataset:
    """REAL video decode, codec-free: crawl payloads become genuine
    YUV4MPEG2 streams (4 frames of 16×16 luma tiled from the html
    bytes, the last frame inverted to force a scene cut); an
    actor-pool stage decodes every frame and emits exact per-frame
    luma sums + L1 scene-cut distances — flat-map output, one row per
    frame."""
    from sits_classification_ray.stages.multimodal import (make_y4m,
                                                           y4m_scene_stats)

    W = H = 16

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for h in df["html"]:
            h = h or b"\x00"
            need = W * H
            px = (h * (need // len(h) + 1))[:need]
            arr = np.frombuffer(px, np.uint8)
            frames = [arr.tobytes(),
                      np.roll(arr, 7).tobytes(),
                      np.roll(arr, 14).tobytes(),
                      (255 - arr).tobytes()]
            payloads.append(make_y4m(frames, W, H))
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "payload": payloads})

    assets = crawl_from_tables(sf_dir).map_batches(
        synth, batch_format="pandas")
    return y4m_scene_stats(assets)


def _frame_samples(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.multimodal import sample_frames

    crawl = crawl_from_tables(sf_dir).rename_columns({"url": "asset_id"})
    frames = sample_frames(crawl, n_frames=4, payload_col="html",
                           id_col="asset_id")
    return frames.map_batches(
        lambda df: pd.DataFrame({"asset_id": df["asset_id"],
                                 "frame_idx": df["frame_idx"],
                                 "frame_bytes": df["frame"].str.len()}),
        batch_format="pandas")


def _running_extrema_crawl(sf_dir: str) -> rd.Dataset:
    """Per-series cumulative max/min (high-/low-watermark envelope)."""
    from sits_classification_ray.stages.windows import running_extrema

    out = running_extrema(_obs_long(sf_dir))
    return out.map_batches(
        lambda df: df[["url", "warc_ts", "metric", "value",
                       "running_max", "running_min"]],
        batch_format="pandas")


def _running_sum_crawl(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.windows import running_sum

    out = running_sum(_obs_long(sf_dir))
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value", "running_sum"]],
        batch_format="pandas")


def _rolling_mean_crawl(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.windows import rolling_mean

    out = rolling_mean(_obs_long(sf_dir), window=4)
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value", "rolling_mean"]],
        batch_format="pandas")


def _threshold_crossings_crawl(sf_dir: str) -> rd.Dataset:
    """Alerting primitive: snapshots where a metric crossed 250
    (either direction) since the previous observation."""
    from sits_classification_ray.stages.windows import threshold_crossings

    return threshold_crossings(_obs_long(sf_dir), threshold=250.0)


def _partition_extents_crawl(sf_dir: str):
    """Per-partition extents (the manifest's A8 min/max contract):
    rows, distinct urls, min/max timestamp per url_bucket. Two tiny
    aggregates (≤ n_buckets rows each) merged on the driver."""
    from ray.data.aggregate import Count, Max, Min

    obs = _obs(sf_dir)
    ext = (obs.groupby("url_bucket")
           .aggregate(Count(alias_name="n_rows"),
                      Min("warc_ts", alias_name="min_ts"),
                      Max("warc_ts", alias_name="max_ts"))).to_pandas()
    nu = (obs.groupby(["url_bucket", "url"])
          .aggregate(Count(alias_name="_c"))
          .groupby("url_bucket")
          .aggregate(Count(alias_name="n_urls"))).to_pandas()
    out = ext.merge(nu, on="url_bucket")
    out["url_bucket"] = out["url_bucket"].astype("int64")
    return out[["url_bucket", "n_rows", "n_urls", "min_ts", "max_ts"]]


def _metric_correlation_crawl(sf_dir: str) -> rd.Dataset:
    """Per-url Pearson correlation between text_len and word_count."""
    from sits_classification_ray.stages.stm import metric_correlation

    return metric_correlation(_obs(sf_dir))


def _peak_time_crawl(sf_dir: str) -> rd.Dataset:
    """Earliest timestamp attaining each series' maximum value."""
    from sits_classification_ray.stages.stm import peak_time

    return peak_time(_obs_long(sf_dir))


def _ewma_crawl(sf_dir: str) -> rd.Dataset:
    """Exponentially weighted moving average per series (α=0.3)."""
    from sits_classification_ray.stages.windows import ewma

    out = ewma(_obs_long(sf_dir), alpha=0.3)
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value", "ewma"]],
        batch_format="pandas")


def _trend_slope_crawl(sf_dir: str) -> rd.Dataset:
    """Per-series least-squares trend (slope in value units per day)."""
    from sits_classification_ray.stages.stm import trend_slope

    return trend_slope(_obs_long(sf_dir))


def _counter_rate_crawl(sf_dir: str) -> rd.Dataset:
    """PromQL-style per-second rate() with counter-reset handling."""
    from sits_classification_ray.stages.windows import counter_rate

    out = counter_rate(_obs_long(sf_dir))
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value", "rate"]],
        batch_format="pandas")


def _zscore_crawl(sf_dir: str) -> rd.Dataset:
    """Per-series z-score anomaly scoring (population mean/std)."""
    from sits_classification_ray.stages.windows import zscore

    out = zscore(_obs_long(sf_dir))
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value", "z"]],
        batch_format="pandas")


def _m4_downsample_crawl(sf_dir: str) -> rd.Dataset:
    """M4 error-free line-chart downsample: first/last/min/max per
    (url, metric, day)."""
    from sits_classification_ray.stages.downsample import m4_downsample

    return m4_downsample(_obs_long(sf_dir), unit="day")


def _lttb_downsample_crawl(sf_dir: str) -> rd.Dataset:
    """Shape-preserving per-series downsample to 20 points (LTTB) —
    the visual/preview tier alongside the aggregate rollup tiers."""
    from sits_classification_ray.stages.downsample import lttb_downsample

    return lttb_downsample(_obs_long(sf_dir), n_out=20)


def _rolling_median_crawl(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.windows import rolling_median

    out = rolling_median(_obs_long(sf_dir), window=4)
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value",
                       "rolling_median"]],
        batch_format="pandas")


def _canonical_urls_crawl(sf_dir: str) -> rd.Dataset:
    """Distinct url → canonical form (crawl-dedup prerequisite)."""
    from ray.data.aggregate import Count

    from sits_classification_ray.stages.urlnorm import canonical_urls

    distinct = (_obs(sf_dir).groupby("url")
                .aggregate(Count(alias_name="_n"))
                .select_columns(["url"]))
    return canonical_urls(distinct)


def _head_domains_crawl(sf_dir: str) -> rd.Dataset:
    """Heavy hitters: the 10 most-snapshotted urls — the detection
    primitive whose output would feed hot_key_threshold tuning."""
    from ray.data.aggregate import Count

    counts = _obs(sf_dir).groupby("url").aggregate(Count(alias_name="n"))
    return counts.sort(["n", "url"], descending=[True, False]).limit(10)


def _holt_linear_crawl(sf_dir: str) -> rd.Dataset:
    """Holt double-exponential level+trend smoothing per series."""
    from sits_classification_ray.stages.windows import holt_linear

    return holt_linear(_obs_long(sf_dir), alpha=0.5, beta=0.3)


def _wasserstein_weekly_crawl(sf_dir: str) -> rd.Dataset:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between
    consecutive epoch-weeks' value distributions per metric — the
    metric-space drift signal next to PSI (which bins and loses
    geometry): W₁ = ∫|F_a − F_b| dx over the merged integer support.
    Distributed shape: one combiner groupby to (metric, week, value)
    counts (the only thing that shuffles — O(distinct values), never
    rows), then an exact CDF walk per metric. Golden twin re-derives
    the same walk."""
    from ray.data.aggregate import Count

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["warc_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        week = (ts // (7 * 86_400_000_000)) * (7 * 86_400_000_000)
        return pd.DataFrame({
            "metric": df["metric"],
            "week": week.astype("datetime64[us]"),
            "value": df["value"].to_numpy(np.int64)})

    counts = (_obs_long(sf_dir).map_batches(proj,
                                            batch_format="pandas")
              .groupby(["metric", "week", "value"])
              .aggregate(Count(alias_name="n")))

    out_schema = pa.schema([("metric", pa.string()),
                            ("week", pa.timestamp("us")),
                            ("w1", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for metric, g in df.groupby("metric", sort=True):
            weeks = np.sort(g["week"].unique())
            for i in range(1, len(weeks)):
                a = g[g["week"] == weeks[i - 1]]
                b = g[g["week"] == weeks[i]]
                va = a["value"].to_numpy(np.int64)
                na = a["n"].to_numpy(np.int64)
                vb = b["value"].to_numpy(np.int64)
                nb = b["n"].to_numpy(np.int64)
                support = np.union1d(va, vb)
                ca = np.zeros(len(support), np.int64)
                cb = np.zeros(len(support), np.int64)
                ca[np.searchsorted(support, va)] = na
                cb[np.searchsorted(support, vb)] = nb
                Fa = np.cumsum(ca) / float(na.sum())
                Fb = np.cumsum(cb) / float(nb.sum())
                gaps = np.diff(support).astype(np.float64)
                w1 = float((np.abs(Fa - Fb)[:-1] * gaps).sum())
                rows.append((metric, weeks[i], w1))
        out = pd.DataFrame(rows, columns=["metric", "week", "w1"])
        out["w1"] = sql_round(out["w1"].to_numpy(np.float64), 6) + 0.0
        out["week"] = out["week"].astype("datetime64[us]")
        return out

    return partitioned_map(counts, kern, keys=["metric"],
                           out_schema=out_schema)


def _pelt_changepoints_crawl(sf_dir: str, beta: float = 50.0
                             ) -> rd.Dataset:
    """PELT optimal changepoint detection (Killick et al., JASA 2012)
    per (url, metric) daily series with the L2 piecewise-constant
    cost — EXACT minimization of Σ SSE + β·#segments, where the
    registry's binseg is the greedy approximation. O(n) expected per
    series via the pruning inequality; runs on the bounded daily
    series after one salted exchange (golden twin re-derives the
    identical DP from the same prefix sums)."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["warc_ts"].to_numpy().astype("datetime64[D]")
               .astype("datetime64[us]"))
        return pd.DataFrame({"url": df["url"], "metric": df["metric"],
                             "day": day,
                             "v": df["value"].to_numpy(np.float64)})

    daily = (_obs_long(sf_dir).map_batches(proj, batch_format="pandas")
             .groupby(["url", "metric", "day"])
             .aggregate(Sum("v", alias_name="s"),
                        Count(alias_name="c")))

    out_schema = pa.schema([("url", pa.string()),
                            ("metric", pa.string()),
                            ("n_days", pa.int64()),
                            ("n_changepoints", pa.int64()),
                            ("total_cost", pa.float64())])

    def pelt(y: np.ndarray) -> tuple[int, float]:
        n = len(y)
        cs = np.concatenate(([0.0], np.cumsum(y)))
        cs2 = np.concatenate(([0.0], np.cumsum(y * y)))

        def C(a: int, b: int) -> float:          # cost of y[a:b]
            m = b - a
            s = cs[b] - cs[a]
            return (cs2[b] - cs2[a]) - s * s / m

        F = np.empty(n + 1)
        F[0] = -beta
        n_cp = np.zeros(n + 1, np.int64)
        cands = [0]
        for t in range(1, n + 1):
            vals = [F[s] + C(s, t) + beta for s in cands]
            j = int(np.argmin(vals))             # first min = smallest s
            F[t] = vals[j]
            best_s = cands[j]
            n_cp[t] = n_cp[best_s] + 1
            cands = [s for s, v in zip(cands, vals)
                     if v - beta <= F[t]] + [t]
        return int(n_cp[n] - 1), float(F[n])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"],
                            kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            y = (g["s"].to_numpy(np.float64)
                 / g["c"].to_numpy(np.float64))
            ncp, cost = pelt(y)
            rows.append((u, m, len(y), ncp, cost))
        out = pd.DataFrame(rows, columns=["url", "metric", "n_days",
                                          "n_changepoints",
                                          "total_cost"])
        out["total_cost"] = sql_round(
            out["total_cost"].to_numpy(np.float64), 6) + 0.0
        out["n_days"] = out["n_days"].astype(np.int64)
        out["n_changepoints"] = out["n_changepoints"].astype(np.int64)
        return out

    return partitioned_map(daily, kern, url_col="url",
                           out_schema=out_schema)


def _croston_rate_crawl(sf_dir: str, alpha: float = 0.3
                        ) -> rd.Dataset:
    """Croston's method (1972) — THE forecaster for intermittent
    series, which crawl activity is (most urls have zero snapshots
    most days; SES/Holt smear zeros into meaningless levels): SES the
    non-zero daily snapshot counts and the inter-arrival gaps
    separately; expected rate = size-level / interval-level. Per-url
    daily counts come from one distributed groupby; the bounded
    recursion runs after one salted exchange. Golden twin re-derives
    the recursion."""
    from ray.data.aggregate import Count

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["warc_ts"].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        return pd.DataFrame({"url": df["url"], "day": day})

    daily = (_obs(sf_dir).map_batches(proj, batch_format="pandas")
             .groupby(["url", "day"]).aggregate(Count(alias_name="c")))

    out_schema = pa.schema([("url", pa.string()),
                            ("n_days", pa.int64()),
                            ("n_active", pa.int64()),
                            ("size_level", pa.float64()),
                            ("interval_level", pa.float64()),
                            ("rate", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "day"], kind="mergesort")
        rows = []
        for url, g in df.groupby("url", sort=False):
            days = g["day"].to_numpy(np.int64)
            c = g["c"].to_numpy(np.float64)
            span = int(days[-1] - days[0]) + 1
            # demands = the non-zero days (rows exist only for those);
            # gaps = day deltas between consecutive active days
            z = c[0]
            q = 1.0                      # first interval convention
            for i in range(1, len(c)):
                z = alpha * c[i] + (1.0 - alpha) * z
                gap = float(days[i] - days[i - 1])
                q = alpha * gap + (1.0 - alpha) * q
            rows.append((url, span, len(c), z, q, z / q))
        out = pd.DataFrame(rows, columns=["url", "n_days", "n_active",
                                          "size_level",
                                          "interval_level", "rate"])
        for col in ("size_level", "interval_level", "rate"):
            out[col] = sql_round(out[col].to_numpy(np.float64), 6) + 0.0
        out["n_days"] = out["n_days"].astype(np.int64)
        out["n_active"] = out["n_active"].astype(np.int64)
        return out

    return partitioned_map(daily, kern, url_col="url",
                           out_schema=out_schema)


def _theta_forecast_crawl(sf_dir: str, alpha: float = 0.5
                          ) -> rd.Dataset:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 —
    the M3/M4 competition benchmark winner) per (url, metric) DAILY
    series: Theta(0,2) = ½·SES(2y − trendline) + ½·(trend extrapolated
    one step). Daily means come from exact integer sums (one
    distributed groupby combiner); the per-series OLS + SES recursion
    runs on the bounded daily series (≤ span days) after one salted
    exchange. Golden twin re-derives the identical recursion."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["warc_ts"].to_numpy().astype("datetime64[D]")
               .astype("datetime64[us]"))
        return pd.DataFrame({"url": df["url"], "metric": df["metric"],
                             "day": day,
                             "v": df["value"].to_numpy(np.float64)})

    daily = (_obs_long(sf_dir).map_batches(proj, batch_format="pandas")
             .groupby(["url", "metric", "day"])
             .aggregate(Sum("v", alias_name="s"),
                        Count(alias_name="c")))

    out_schema = pa.schema([("url", pa.string()),
                            ("metric", pa.string()),
                            ("n_days", pa.int64()),
                            ("slope", pa.float64()),
                            ("ses_level", pa.float64()),
                            ("forecast", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"],
                            kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            y = (g["s"].to_numpy(np.float64)
                 / g["c"].to_numpy(np.float64))
            n = len(y)
            t = np.arange(n, dtype=np.float64)
            if n > 1:
                tb, yb = t.mean(), y.mean()
                b = float(((t - tb) * (y - yb)).sum()
                          / ((t - tb) ** 2).sum())
            else:
                b = 0.0
            a = float(y.mean() - b * (n - 1) / 2.0)
            z = 2.0 * y - (a + b * t)
            s = z[0]
            for i in range(1, n):
                s = alpha * z[i] + (1.0 - alpha) * s
            fc = 0.5 * s + 0.5 * (a + b * n)
            rows.append((u, m, n, b, s, fc))
        out = pd.DataFrame(rows, columns=["url", "metric", "n_days",
                                          "slope", "ses_level",
                                          "forecast"])
        for c in ("slope", "ses_level", "forecast"):
            out[c] = sql_round(out[c].to_numpy(np.float64), 6) + 0.0
        out["n_days"] = out["n_days"].astype(np.int64)
        return out

    return partitioned_map(daily, kern, url_col="url",
                           out_schema=out_schema)


def _spectral_residual_crawl(sf_dir: str, q: int = 3) -> rd.Dataset:
    """Spectral-residual saliency anomaly detection (Ren et al., KDD
    2019 — the production detector behind Azure Anomaly Detector) per
    (url, metric) daily series: log-amplitude spectrum minus its
    moving average → inverse transform → saliency map; emits each
    series' most salient day and its normalized score. The frequency-
    domain member of the anomaly family next to MAD / CUSUM / S-H-ESD
    / iforest. Same daily-mean scaffold as theta; FFT on identical
    float inputs is bit-deterministic, so a golden twin works."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["warc_ts"].to_numpy().astype("datetime64[D]")
               .astype("datetime64[us]"))
        return pd.DataFrame({"url": df["url"], "metric": df["metric"],
                             "day": day,
                             "v": df["value"].to_numpy(np.float64)})

    daily = (_obs_long(sf_dir).map_batches(proj, batch_format="pandas")
             .groupby(["url", "metric", "day"])
             .aggregate(Sum("v", alias_name="s"),
                        Count(alias_name="c")))

    out_schema = pa.schema([("url", pa.string()),
                            ("metric", pa.string()),
                            ("n_days", pa.int64()),
                            ("peak_day", pa.timestamp("us")),
                            ("saliency", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "day"],
                            kind="mergesort")
        rows = []
        for (u, m), g in df.groupby(["url", "metric"], sort=False):
            y = (g["s"].to_numpy(np.float64)
                 / g["c"].to_numpy(np.float64))
            days = g["day"].to_numpy()
            n = len(y)
            if n < 2:
                rows.append((u, m, n, days[0], 0.0))
                continue
            F = np.fft.fft(y)
            amp = np.abs(F) + 1e-8
            L = np.log(amp)
            kern_w = np.ones(q) / q
            avg = np.convolve(L, kern_w, mode="same")
            R = L - avg
            S = np.abs(np.fft.ifft(np.exp(R + 1j * np.angle(F))))
            mu = S.mean()
            score = (S - mu) / (mu + 1e-8)
            j = int(np.argmax(score))
            rows.append((u, m, n, days[j], float(score[j])))
        out = pd.DataFrame(rows, columns=["url", "metric", "n_days",
                                          "peak_day", "saliency"])
        out["saliency"] = sql_round(
            out["saliency"].to_numpy(np.float64), 6) + 0.0
        out["n_days"] = out["n_days"].astype(np.int64)
        out["peak_day"] = out["peak_day"].astype("datetime64[us]")
        return out

    return partitioned_map(daily, kern, url_col="url",
                           out_schema=out_schema)


def _cusum_crawl(sf_dir: str) -> rd.Dataset:
    """Two-sided CUSUM changepoint statistics + alarms per series."""
    from sits_classification_ray.stages.windows import cusum

    return cusum(_obs_long(sf_dir), k=0.5, h=4.0)


def _seasonal_baseline_crawl(sf_dir: str) -> rd.Dataset:
    """Hour-of-day seasonal baseline + per-row anomaly deviation."""
    from sits_classification_ray.stages.windows import seasonal_baseline

    return seasonal_baseline(_obs_long(sf_dir))


def _autocorr_lag1_crawl(sf_dir: str) -> rd.Dataset:
    """Per-series lag-1 autocorrelation (SQL corr-with-lag twin)."""
    from sits_classification_ray.stages.stm import autocorr_lag1

    return autocorr_lag1(_obs_long(sf_dir))


def _ts_features_crawl(sf_dir: str) -> rd.Dataset:
    """catch22-lite feature catalog per daily series (SQL moments/
    lag/regr_slope twin)."""
    from sits_classification_ray.stages.stm import ts_features

    return ts_features(_obs_long(sf_dir))


def _recrawl_list_crawl(sf_dir: str) -> rd.Dataset:
    """The complete scheduling loop composed end-to-end: change-rate
    estimation → largest-remainder domain quotas → per-domain top-λ
    url recrawl list (rank ≤ quota). SQL window twin."""
    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.series import (change_rate,
                                                       crawl_budget)
    from sits_classification_ray.stages.shuffle import partitioned_map

    ds = assemble_series(
        extract(crawl_from_tables(sf_dir), CFG, keep_text=True), CFG)
    rates = change_rate(ds).materialize()
    budget = crawl_budget(rates, _DOMAIN_RE, budget=10000) \
        .select_columns(["domain", "quota"])

    def with_domain(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "domain": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "url": df["url"].to_numpy(),
            "lambda_per_day": df["lambda_per_day"]
            .to_numpy(np.float64)})

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["domain", "lambda_per_day", "url"],
                            ascending=[True, False, True],
                            kind="mergesort")
        rn = df.groupby("domain", sort=False).cumcount() + 1
        return df.assign(rank_in_domain=rn.to_numpy(np.int64))

    ranked = partitioned_map(
        rates.map_batches(with_domain, batch_format="pandas"),
        rank, url_col="domain")
    joined = hash_join(ranked, budget, on="domain")
    return joined.filter(
        expr="rank_in_domain <= quota").select_columns(
        ["domain", "url", "lambda_per_day", "rank_in_domain",
         "quota"])


def _km_staleness_crawl(sf_dir: str) -> rd.Dataset:
    """Kaplan-Meier survival of content staleness (censoring-correct
    time-to-change curve — golden twin)."""
    from sits_classification_ray.stages.series import km_staleness

    ds = assemble_series(
        extract(crawl_from_tables(sf_dir), CFG, keep_text=True), CFG)
    return km_staleness(ds)


def _rfm_segments_events(sf_dir: str) -> rd.Dataset:
    """RFM (recency / frequency / monetary) customer segmentation
    over the events stream: per-user aggregates → three distributed
    NTILE(3) passes (total order via user_id tiebreak) → composed
    RFM code. Monetary stays integer cents end-to-end (SQL window
    twin)."""
    from ray.data.aggregate import Count, Max, Sum

    from sits_classification_ray.stages.scan_sorted import ntile

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts_us": df["ts"].to_numpy("datetime64[us]")
            .astype(np.int64),
            "cents": np.round(df["value"].to_numpy(np.float64)
                              * 100.0).astype(np.int64)})

    per_user = (ev.map_batches(proj, batch_format="pandas")
                .groupby("user_id")
                .aggregate(Max("ts_us", alias_name="recency_us"),
                           Count(alias_name="frequency"),
                           Sum("cents", alias_name="mon_cents")))
    t1 = ntile(per_user, ["recency_us", "user_id"], 3,
               out_col="r_score")
    t2 = ntile(t1, ["frequency", "user_id"], 3, out_col="f_score")
    t3 = ntile(t2, ["mon_cents", "user_id"], 3, out_col="m_score")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        r = df["r_score"].to_numpy(np.int64)
        f = df["f_score"].to_numpy(np.int64)
        m = df["m_score"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "recency_ts": df["recency_us"].to_numpy(np.int64)
            .astype("datetime64[us]"),
            "frequency": df["frequency"].to_numpy(np.int64),
            "mon_cents": df["mon_cents"].to_numpy(np.int64),
            "r_score": r, "f_score": f, "m_score": m,
            "rfm": r * 100 + f * 10 + m})

    return t3.map_batches(fin, batch_format="pandas")


def _tdigest_quantile_daily(sf_dir: str) -> rd.Dataset:
    """Per-(metric, day) t-digest quantiles (rank-error sketch —
    canonical bucket-complete compression, golden twin)."""
    from sits_classification_ray.functions.sketches import \
        tdigest_quantile

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["warc_ts"].to_numpy().astype("datetime64[D]")
               .astype("datetime64[us]"))
        return pd.DataFrame({
            "bucket": df["metric"].astype(str) + "|"
            + pd.Series(day).dt.strftime("%Y-%m-%d"),
            "value": df["value"].to_numpy(np.float64)})

    ds = _obs_long(sf_dir).map_batches(proj, batch_format="pandas")
    return tdigest_quantile(ds, "value", "bucket")


def _kll_quantile_daily(sf_dir: str) -> rd.Dataset:
    """Per-(metric, day) KLL quantiles (Karnin-Lang-Liberty 2016,
    derandomized compactor) — the additive-rank-error member of the
    quantile-sketch family next to t-digest (quantile error), DDSketch
    (relative value error) and the fixed histogram (absolute value
    error). Canonical bulk build per co-located bucket; golden twin."""
    from sits_classification_ray.functions.sketches import kll_quantile

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["warc_ts"].to_numpy().astype("datetime64[D]")
               .astype("datetime64[us]"))
        return pd.DataFrame({
            "bucket": df["metric"].astype(str) + "|"
            + pd.Series(day).dt.strftime("%Y-%m-%d"),
            "value": df["value"].to_numpy(np.float64)})

    ds = _obs_long(sf_dir).map_batches(proj, batch_format="pandas")
    return kll_quantile(ds, "value", "bucket")


def _segment_trends_crawl(sf_dir: str) -> rd.Dataset:
    """Piecewise trend profile per daily series: binseg breakpoints +
    per-segment OLS slope/mean (golden twin)."""
    from sits_classification_ray.stages.stm import segment_trends

    return segment_trends(_obs_long(sf_dir))


def _xcorr_lag_crawl(sf_dir: str) -> rd.Dataset:
    """Cross-metric lead/lag detection per url (calendar-aligned
    Pearson across day shifts — golden twin)."""
    from sits_classification_ray.stages.stm import xcorr_lag

    return xcorr_lag(_obs_long(sf_dir))


def _update_hour_modal_crawl(sf_dir: str) -> rd.Dataset:
    """Modal update hour per url (does this page change at a fixed
    hour?) — integer counts + one division, SQL window twin."""
    from ray.data.aggregate import Count

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": df["url"].to_numpy(),
            "h": df["warc_ts"].dt.hour.to_numpy(np.int64)})

    hr = (_obs(sf_dir).map_batches(proj, batch_format="pandas")
          .groupby(["url", "h"]).aggregate(Count(alias_name="n")))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "n", "h"],
                            ascending=[True, False, True],
                            kind="mergesort")
        tot = df.groupby("url", sort=False)["n"].transform("sum")
        df = df.assign(_tot=tot)
        top = df.drop_duplicates("url", keep="first")
        return pd.DataFrame({
            "url": top["url"].to_numpy(),
            "n_snaps": top["_tot"].to_numpy(np.int64),
            "modal_hour": top["h"].to_numpy(np.int64),
            "modal_share": sql_round(
                top["n"].to_numpy(np.float64) * 1.0
                / top["_tot"].to_numpy(np.float64), 6) + 0.0})

    import pyarrow as pa
    schema = pa.schema([("url", pa.string()), ("n_snaps", pa.int64()),
                        ("modal_hour", pa.int64()),
                        ("modal_share", pa.float64())])
    return partitioned_map(hr, pick, url_col="url", out_schema=schema)


def _kleinberg_bursts_crawl(sf_dir: str) -> rd.Dataset:
    """Kleinberg two-state burst detection over each url's snapshot
    arrivals (Viterbi over exponential gap costs — golden twin)."""
    from sits_classification_ray.stages.stm import kleinberg_bursts

    return kleinberg_bursts(_obs(sf_dir).select_columns(
        ["url", "warc_ts"]))


def _periodogram_peak_crawl(sf_dir: str) -> rd.Dataset:
    """Dominant update cadence per daily series via the rFFT
    periodogram peak (golden twin)."""
    from sits_classification_ray.stages.stm import periodogram_peak

    return periodogram_peak(_obs_long(sf_dir))


def _shesd_anomalies_crawl(sf_dir: str) -> rd.Dataset:
    """Seasonal-Hybrid ESD anomalies per daily series (sequential
    robust ESD — golden twin)."""
    from sits_classification_ray.stages.stm import shesd_anomalies

    return shesd_anomalies(_obs_long(sf_dir))


def _snapshot_novelty_crawl(sf_dir: str) -> rd.Dataset:
    """Exact shingle novelty between consecutive snapshots per url
    (golden twin via Python-set membership)."""
    from sits_classification_ray.stages.dedup_docs import snapshot_novelty

    ds = assemble_series(
        extract(crawl_from_tables(sf_dir), CFG, keep_text=True), CFG)
    return snapshot_novelty(ds, shingle_k=8)


def _crawl_budget_domains(sf_dir: str) -> rd.Dataset:
    """Largest-remainder recrawl-budget allocation per domain from the
    Poisson change-rate estimates (integer micro-unit λ sums; SQL
    window twin)."""
    from sits_classification_ray.stages.series import (change_rate,
                                                       crawl_budget)

    ds = assemble_series(
        extract(crawl_from_tables(sf_dir), CFG, keep_text=True), CFG)
    return crawl_budget(change_rate(ds), _DOMAIN_RE, budget=10000)


def _dtw_classify_crawl(sf_dir: str) -> rd.Dataset:
    """Nearest-template DTW classification of each daily series
    (elastic matching — golden twin via independent full-matrix DP)."""
    from sits_classification_ray.stages.stm import dtw_classify

    return dtw_classify(_obs_long(sf_dir))


def _sdt_downsample_crawl(sf_dir: str) -> rd.Dataset:
    """Swinging-door compression per series (historian compressor;
    golden scalar twin — sequential doors, not SQL-expressible)."""
    from sits_classification_ray.stages.downsample import sdt_downsample

    return sdt_downsample(_obs_long(sf_dir), comp_dev=5.0)


def _change_rate_crawl(sf_dir: str) -> rd.Dataset:
    """Poisson page-change-rate + recrawl-interval estimation per url
    (Cho & Garcia-Molina estimator; SQL lag/aggregate twin)."""
    from sits_classification_ray.stages.series import change_rate

    ds = assemble_series(
        extract(crawl_from_tables(sf_dir), CFG, keep_text=True), CFG)
    return change_rate(ds)


def _ts_kmeans_crawl(sf_dir: str) -> rd.Dataset:
    """Temporal-archetype clustering: k-means over dimensionless
    per-series shape features (golden twin — iterative float
    algorithm under the kmeans_fit determinism contract)."""
    from sits_classification_ray.stages.stm import ts_kmeans

    return ts_kmeans(_obs_long(sf_dir), k=5, iterations=4)


def _boilerplate_page(doc_id: int, text: str) -> str:
    """Deterministic page synth shared by the engine query and the
    golden twin: nav + 12-word paragraphs with a link-spam div after
    every 2nd paragraph + footer."""
    words = (text or "").split()
    paras = [" ".join(words[j:j + 12]) for j in range(0, len(words), 12)]
    parts = ['<nav><a href="/">home</a> <a href="/c">cat</a></nav>']
    for k, ptxt in enumerate(paras):
        parts.append(f"<p>{ptxt}</p>")
        if k % 2 == 1:
            parts.append(f'<div><a href="/x{(doc_id + k) % 9}">'
                         f'ad {(doc_id + k) % 9}</a></div>')
    parts.append('<footer><a href="/about">about</a> © corp</footer>')
    return "".join(parts)


def _boilerplate_extract_documents(sf_dir: str) -> rd.Dataset:
    """Boilerplate removal over synthesized nav/content/ad/footer
    pages (golden oracle: independent twin; kept content must equal
    the original ≥5-word paragraphs exactly)."""
    from sits_classification_ray.stages.textstats import boilerplate_extract

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "page": [_boilerplate_page(i, t) for i, t in
                     zip(df["doc_id"], df["text"])],
        })

    pages = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]).map_batches(
        synth, batch_format="pandas")
    return boilerplate_extract(pages)


def _matrix_profile_discord_crawl(sf_dir: str) -> rd.Dataset:
    """Matrix-profile top-1 discord per daily series (golden oracle:
    independent scalar twin)."""
    from sits_classification_ray.stages.stm import matrix_profile_discord

    return matrix_profile_discord(_obs_long(sf_dir))


def _sax_motifs_crawl(sf_dir: str) -> rd.Dataset:
    """SAX motif per daily series (golden oracle: independent twin)."""
    from sits_classification_ray.stages.stm import sax_motifs

    return sax_motifs(_obs_long(sf_dir))


def _holt_winters_crawl(sf_dir: str) -> rd.Dataset:
    """Holt-Winters additive seasonal forecast per daily series
    (golden oracle: independent scalar twin)."""
    from sits_classification_ray.stages.windows import holt_winters

    return holt_winters(_obs_long(sf_dir))


def _freshness_coverage_crawl(sf_dir: str) -> rd.Dataset:
    """Interval-union freshness per url (7-day TTL; SQL
    gaps-and-islands twin)."""
    from sits_classification_ray.stages.windows import freshness_coverage

    return freshness_coverage(_obs(sf_dir), ttl_seconds=7 * 86400)


def _mann_kendall_crawl(sf_dir: str) -> rd.Dataset:
    """Mann-Kendall trend test per daily series (SQL pair-join twin)."""
    from sits_classification_ray.stages.stm import mann_kendall

    return mann_kendall(_obs_long(sf_dir))


def _acf_ljungbox_crawl(sf_dir: str) -> rd.Dataset:
    """ACF at lags 1..7 + Ljung-Box Q per daily series (SQL
    lag-join twin)."""
    from sits_classification_ray.stages.stm import acf_ljungbox

    return acf_ljungbox(_obs_long(sf_dir), max_lag=7)


def _mad_anomaly_crawl(sf_dir: str) -> rd.Dataset:
    """Robust median/MAD anomaly score per observation."""
    from sits_classification_ray.stages.stm import mad_anomaly

    return mad_anomaly(_obs_long(sf_dir))


def _time_weighted_avg_crawl(sf_dir: str) -> rd.Dataset:
    """LOCF time-weighted daily average per series (TimescaleDB
    time_weight semantics)."""
    from sits_classification_ray.stages.downsample import time_weighted_avg

    return time_weighted_avg(_obs_long(sf_dir), unit="day")


def _unigram_logprob_documents(sf_dir: str) -> rd.Dataset:
    """Corpus-unigram LM score per document (quality/perplexity
    proxy). broadcast_max_vocab=0 forces the tag-union JOIN path —
    the one that holds at unbounded vocabulary — so the driver's hash
    check covers the scale path, not just the broadcast fast path."""
    from sits_classification_ray.stages.textstats import unigram_logprob

    return unigram_logprob(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        broadcast_max_vocab=0)


def _binseg_changepoints_crawl(sf_dir: str) -> rd.Dataset:
    """Level-shift changepoints per daily series via deterministic
    binary segmentation (golden oracle: independent numpy twin)."""
    from sits_classification_ray.stages.stm import binseg_changepoints

    return binseg_changepoints(_obs_long(sf_dir), min_size=5,
                               penalty_mult=2.0)


def _stl_decompose_daily(sf_dir: str) -> rd.Dataset:
    """STL-lite additive decomposition (trend / day-of-week seasonal
    / residual) of every daily series — the streaming seasonal-
    anomaly primitive."""
    from sits_classification_ray.stages.stm import stl_decompose_daily

    return stl_decompose_daily(_obs_long(sf_dir), trend_halfwin=3)


def _series_gaps_crawl(sf_dir: str) -> rd.Dataset:
    """Per-series inter-arrival gap stats (staleness monitor)."""
    from sits_classification_ray.stages.stm import series_gaps

    return series_gaps(_obs_long(sf_dir), stale_seconds=172_800.0)


def _duplicate_ngrams_documents(sf_dir: str) -> rd.Dataset:
    """Cross-document duplicated 8-token windows (boilerplate
    detection below whole-document dedup granularity)."""
    from sits_classification_ray.stages.textstats import duplicate_ngrams

    return duplicate_ngrams(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        k=8, min_docs=2)


def _bigram_logprob_documents(sf_dir: str) -> rd.Dataset:
    """Conditional-bigram LM fluency score per document.
    broadcast_max_vocab=0 forces the two-exchange JOIN path (the
    bigram table is super-linear in corpus size) so the driver's hash
    check covers the scale path."""
    from sits_classification_ray.stages.textstats import bigram_logprob

    return bigram_logprob(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        broadcast_max_vocab=0)


def _theil_sen_crawl(sf_dir: str) -> rd.Dataset:
    """Robust per-series trend (median of pairwise slopes)."""
    from sits_classification_ray.stages.stm import theil_sen

    return theil_sen(_obs_long(sf_dir))


def _spearman_crawl(sf_dir: str) -> rd.Dataset:
    """Per-url Spearman rank correlation text_len vs word_count."""
    from sits_classification_ray.stages.stm import spearman

    return spearman(_obs(sf_dir))


def _length_histogram_documents(sf_dir: str) -> rd.Dataset:
    """Corpus n_chars histogram, 50-char bins (combiner + Sum)."""
    from sits_classification_ray.stages.textstats import length_histogram

    return length_histogram(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]), bin_width=50)


def _left_join_documents_embeddings(sf_dir: str) -> rd.Dataset:
    """Left-outer hash join: every document, label where an embedding
    with label <= 2 exists, null otherwise (J2 family, outer variant)."""
    from sits_classification_ray.stages.joins import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    emb = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "label"])
           .filter(expr="label <= 2"))
    out = hash_join(docs, emb, on="doc_id", right_on="vec_id",
                    join_type="left_outer", num_partitions=16)
    return out.select_columns(["doc_id", "lang", "n_chars", "label"])


def _ddsketch_quantile_daily(sf_dir: str) -> rd.Dataset:
    """Relative-error (DDSketch) global text_len quantiles per day —
    the log-bucket complement to hist_quantile_daily."""
    from sits_classification_ray.functions.sketches import ddsketch_quantile

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="day"),
                                 pa.timestamp("us")),
            "text_len": batch["text_len"],
        })

    proj_ds = _obs(sf_dir).map_batches(proj, batch_format="pyarrow",
                                       zero_copy_batch=True)
    return ddsketch_quantile(proj_ds, value_col="text_len",
                             bucket_col="bucket_ts")


_DOMAIN_RE = r"^[a-z]+://([^/]+)"


def _domain_daily_crawl(sf_dir: str) -> rd.Dataset:
    """Domain-level daily rollup: snapshots + distinct urls per
    (host, day) — the aggregation dimension above url. Two-level
    groupby so the distinct-url count is exact under any batching."""
    from ray.data.aggregate import Count, Sum

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "domain": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "bucket_ts": df["warc_ts"].dt.floor("D"),
            "url": df["url"],
        })

    obs = _obs(sf_dir).map_batches(proj, batch_format="pandas")
    per_url = (obs.groupby(["domain", "bucket_ts", "url"])
               .aggregate(Count(alias_name="n")))
    return (per_url.groupby(["domain", "bucket_ts"])
            .aggregate(Count(alias_name="n_urls"),
                       Sum("n", alias_name="n_snaps")))


def _wow_change_crawl(sf_dir: str) -> rd.Dataset:
    """Week-over-week percent change of each series' weekly sum —
    computed FROM the weekly tier (the production dashboard query:
    read the continuous aggregate, never the raw observations)."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    weekly = _tier(sf_dir, "weekly").select_columns(
        ["url", "metric", "bucket_ts", "sum"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "metric", "bucket_ts"],
                            kind="mergesort").copy()
        prev = df.groupby(["url", "metric"], sort=False)["sum"].shift(1)
        pv = prev.to_numpy(np.float64)
        cv = df["sum"].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = np.where(pv > 0.0, (cv - pv) / pv, np.nan)
        df["prev_sum"] = pv
        df["wow_pct"] = sql_round(pct, 6)
        return df[["url", "metric", "bucket_ts", "sum", "prev_sum",
                   "wow_pct"]]

    return partitioned_map(weekly, kernel, url_col="url")


def _scd2_intervals_crawl(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.windows import scd2_intervals

    return scd2_intervals(
        _obs(sf_dir).select_columns(["url", "warc_ts", "text_len"]))


def _domain_share_daily(sf_dir: str) -> rd.Dataset:
    """Share of each day's snapshot volume per domain. Day totals are a
    tiny aggregate (one row per day) broadcast into the share map —
    never a shuffle join on the low-cardinality day key."""
    from sits_classification_ray.functions.transforms import sql_round

    dd = _domain_daily_crawl(sf_dir).materialize()
    totals = dict(dd.groupby("bucket_ts")
                  .sum("n_snaps").to_pandas()
                  .itertuples(index=False, name=None))

    def share(df: pd.DataFrame) -> pd.DataFrame:
        tot = df["bucket_ts"].map(totals).to_numpy(np.float64)
        out = df[["domain", "bucket_ts", "n_snaps"]].copy(deep=False)
        out["share"] = sql_round(
            df["n_snaps"].to_numpy(np.float64) / tot, 6)
        return out

    return dd.map_batches(share, batch_format="pandas")


def _pagerank_words_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.graph import pagerank
    from sits_classification_ray.stages.textstats import bigram_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return pagerank(bigram_counts(docs))


def _triangle_count_words(sf_dir: str) -> rd.Dataset:
    """Triangle count of the word-adjacency graph (same edge table
    PageRank runs on) — oriented wedge enumeration + closing join."""
    from sits_classification_ray.stages.graph import triangle_count
    from sits_classification_ray.stages.textstats import bigram_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return triangle_count(bigram_counts(docs))


def _markov_transitions_events(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.behavior import markov_transitions

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    return markov_transitions(ev)


def _funnel_windowed_events(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.behavior import funnel

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel(ev, _FUNNEL_STAGES, within=pd.Timedelta(days=2))


def _cube_documents(sf_dir: str) -> rd.Dataset:
    """OLAP cube over (lang, source): counts at every grouping-set
    level, absent dimensions filled with 'ALL'. One tiny projected
    table feeds all four groupbys."""
    from ray.data.aggregate import Count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source"]).materialize()

    def fill(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
        def k(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "lang": df["lang"] if "lang" in cols else "ALL",
                "source": df["source"] if "source" in cols else "ALL",
                "n_docs": df["n_docs"].astype(np.int64),
            })
            return out
        return ds.map_batches(k, batch_format="pandas")

    both = fill(docs.groupby(["lang", "source"])
                .aggregate(Count(alias_name="n_docs")),
                ["lang", "source"])
    by_lang = fill(docs.groupby("lang")
                   .aggregate(Count(alias_name="n_docs")), ["lang"])
    by_src = fill(docs.groupby("source")
                  .aggregate(Count(alias_name="n_docs")), ["source"])

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lang": ["ALL"], "source": ["ALL"],
                             "n_docs": np.int64(len(df))})

    from ray.data.aggregate import Sum
    grand = (docs.map_batches(total, batch_format="pandas")
             .groupby(["lang", "source"])
             .aggregate(Sum("n_docs", alias_name="n_docs")))
    return both.union(by_lang).union(by_src).union(grand)


def _funnel_latency_events(sf_dir: str) -> rd.Dataset:
    """Conversion-latency distribution: for users completing the full
    strict funnel, whole days from first signup to the qualifying
    purchase — exact p50/p90 via the integer-day value histogram
    (the funnel chain composed with exact_int_quantile)."""
    from sits_classification_ray.functions.sketches import exact_int_quantile
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    stages = _FUNNEL_STAGES

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["event_type"].isin(stages)]
        return pd.DataFrame({"user_id": keep["user_id"],
                             "ts": keep["ts"],
                             "event_type": keep["event_type"]})

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        first = (df[df["event_type"] == stages[0]]
                 .groupby("user_id", sort=False)["ts"].min())
        cur = first
        for st in stages[1:]:
            prev = cur.rename("__prev").reset_index()
            nxt = df[df["event_type"] == st].merge(prev, on="user_id")
            nxt = nxt[nxt["ts"] > nxt["__prev"]]
            cur = nxt.groupby("user_id", sort=False)["ts"].min()
        done = cur.rename("t_end").reset_index() \
            .merge(first.rename("t_start").reset_index(), on="user_id")
        delay = (done["t_end"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64)
                 - done["t_start"].to_numpy().astype("datetime64[us]")
                 .astype(np.int64)) // 86_400_000_000
        return pd.DataFrame({"grp": np.int64(1),
                             "delay_days": delay.astype(np.int64)})

    delays = partitioned_map(ev.map_batches(proj,
                                            batch_format="pandas"),
                             kernel, keys=["user_id"])
    out = exact_int_quantile(delays, "delay_days", "grp",
                             quantiles=(0.5, 0.9))
    return out.map_batches(
        lambda df: df.rename(columns={"grp": "funnel"}),
        batch_format="pandas")


def _wau_events(sf_dir: str) -> rd.Dataset:
    """Rolling 7-day active users per day (WAU) — the sliding-window
    COUNT DISTINCT: each distinct (user, day) activity pair is
    expanded to the ≤7 window days it contributes to (bounded
    flat-map, no self-join of the events table), re-deduplicated per
    (user, window-day) by a groupby, and counted exactly with the
    two-level pattern. Days without any direct activity are dropped
    to match the SQL twin's day universe."""
    from ray.data.aggregate import Count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "day": df["ts"].dt.floor("D")})

    act = (ev.map_batches(proj, batch_format="pandas")
           .groupby(["user_id", "day"])
           .aggregate(Count(alias_name="_c"))
           .drop_columns(["_c"]).materialize())
    days = set(act.groupby("day").aggregate(Count(alias_name="_c"))
               .to_pandas()["day"])
    days_ref = ray.put(days)

    class Expand:
        def __init__(self):
            self.days = ray.get(days_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            u = np.repeat(df["user_id"].to_numpy(np.int64), 7)
            d = np.repeat(df["day"].to_numpy(), 7) \
                + np.tile(pd.to_timedelta(np.arange(7), unit="D"), n)
            out = pd.DataFrame({"user_id": u, "day": d})
            return out[out["day"].isin(self.days)]

    expanded = act.map_batches(Expand, batch_format="pandas",
                               concurrency=(1, 8), num_cpus=1)
    per_user = (expanded.groupby(["day", "user_id"])
                .aggregate(Count(alias_name="_c")))
    return (per_user.groupby("day")
            .aggregate(Count(alias_name="wau")))


def _calibration_bins_nchars(sf_dir: str) -> pd.DataFrame:
    """Reliability/calibration table for the same predictor the AUC
    query scores: positive rate per fixed n_chars band (width 200).
    Fixed bands, not ntile — deterministic under any partitioning and
    identical in SQL, the distribution-free calibration view."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.joins import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"])
    j = hash_join(docs, emb, on="doc_id", right_on="vec_id")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "band": (df["n_chars"].astype(np.int64) // 200) * 200,
            "np_": (df["label"] == 0).astype(np.int64),
            "n": np.int64(1),
        })
        return (out.groupby("band", sort=False)
                .agg(np_=("np_", "sum"), n=("n", "sum")).reset_index())

    c = (j.map_batches(partial, batch_format="pandas")
         .groupby("band")
         .aggregate(Sum("np_", alias_name="n_pos"),
                    Sum("n", alias_name="n")).to_pandas())
    c = c.sort_values("band").reset_index(drop=True)
    c["pos_rate"] = sql_round(c["n_pos"].to_numpy(np.float64)
                              / c["n"].to_numpy(np.float64), 6)
    c["band"] = c["band"].astype(np.int64)
    c["n_pos"] = c["n_pos"].astype(np.int64)
    c["n"] = c["n"].astype(np.int64)
    return c[["band", "n", "n_pos", "pos_rate"]]


def _auc_nchars_label(sf_dir: str) -> pd.DataFrame:
    """Exact ROC-AUC of n_chars as a predictor of (label == 0), via
    the Mann-Whitney rank statistic computed from the VALUE HISTOGRAM
    (per-(x, label) counts — the integer-domain trick again): with
    doubled ranks every intermediate is an exact integer, so engine
    and SQL agree bit-for-bit; the only float op is the final
    division. The histogram combiner is the distributed part; the
    AUC folds over the tiny distinct-value table."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.joins import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"])
    j = hash_join(docs, emb, on="doc_id", right_on="vec_id")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "x": df["n_chars"].astype(np.int64),
            "np_": (df["label"] == 0).astype(np.int64),
            "n": np.int64(1),
        })
        return (out.groupby("x", sort=False)
                .agg(np_=("np_", "sum"), n=("n", "sum")).reset_index())

    c = (j.map_batches(partial, batch_format="pandas")
         .groupby("x")
         .aggregate(Sum("np_", alias_name="np_"),
                    Sum("n", alias_name="n")).to_pandas())
    c = c.sort_values("x").reset_index(drop=True)
    n = c["n"].to_numpy(np.int64)
    np_pos = c["np_"].to_numpy(np.int64)
    below = np.concatenate([[0], np.cumsum(n)[:-1]])
    s2 = int((np_pos * (2 * below + n + 1)).sum())
    n_pos = int(np_pos.sum())
    n_neg = int(n.sum()) - n_pos
    auc = (s2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg)
    return pd.DataFrame({
        "n_pos": np.array([n_pos], np.int64),
        "n_neg": np.array([n_neg], np.int64),
        "auc": sql_round(np.array([auc]), 6),
    })


def _uncertainty_sample_crawl(sf_dir: str) -> rd.Dataset:
    """Active-learning batch selection: the 20 rows with the smallest
    classification margin (top-1 minus top-2 logit) from the
    probability-mode scorer — the standard uncertainty-sampling rule
    for labeling budgets. Masked rows excluded; local-topk combiner."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.sampling import top_k_per_group

    scored = _scored_proba_crawl(sf_dir)

    def margin(df: pd.DataFrame) -> pd.DataFrame:
        s = df[["score_0", "score_1", "score_2"]].to_numpy(np.float64)
        keep = s[:, 0] > -9999.0
        s2 = np.partition(s[keep], -2, axis=1)
        out = df[keep][["url", "warc_ts"]].copy(deep=False)
        out["margin"] = sql_round(s2[:, -1] - s2[:, -2], 6)
        out["_g"] = np.int64(0)
        out["_tie"] = out["url"] + " " + out["warc_ts"].astype(str)
        return out

    m = scored.map_batches(margin, batch_format="pandas")
    top = top_k_per_group(m, ["_g"], "margin", k=20, ascending=True,
                          tie_col="_tie")
    return top.drop_columns(["_g", "_tie"])


def _basket_rules_events(sf_dir: str) -> pd.DataFrame:
    """Association-rule mining over (user, hour) baskets: for every
    unordered event-type pair, support, confidence and lift. The
    distributed parts are the distinct-triple combiner, the basket
    count, and an in-partition self-merge pair expansion (baskets hold
    ≤ |types| items, so the blow-up is bounded); the rule table itself
    is O(|types|²) and finalizes driver-side."""
    from ray.data.aggregate import Count

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "hour": df["ts"].dt.floor("h"),
                             "event_type": df["event_type"]})

    triples = (ev.map_batches(proj, batch_format="pandas")
               .groupby(["user_id", "hour", "event_type"])
               .aggregate(Count(alias_name="_c"))
               .drop_columns(["_c"]).materialize())
    baskets = (triples.groupby(["user_id", "hour"])
               .aggregate(Count(alias_name="_c")))
    n_baskets = float(baskets.count())
    item = triples.groupby("event_type") \
        .aggregate(Count(alias_name="n")).to_pandas()
    n_item = dict(zip(item["event_type"], item["n"]))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on=["user_id", "hour"])
        m = m[m["event_type_x"] < m["event_type_y"]]
        out = (m.groupby(["event_type_x", "event_type_y"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    from ray.data.aggregate import Sum
    pair_counts = (partitioned_map(triples, pairs, keys=["user_id"])
                   .groupby(["event_type_x", "event_type_y"])
                   .aggregate(Sum("n", alias_name="n")).to_pandas())
    pair_counts = pair_counts.sort_values(
        ["event_type_x", "event_type_y"]).reset_index(drop=True)
    na = pair_counts["event_type_x"].map(n_item).to_numpy(np.float64)
    nb = pair_counts["event_type_y"].map(n_item).to_numpy(np.float64)
    nab = pair_counts["n"].to_numpy(np.float64)
    pair_counts["support"] = sql_round(nab / n_baskets, 6)
    pair_counts["confidence"] = sql_round(nab / na, 6)
    pair_counts["lift"] = sql_round((nab * n_baskets) / (na * nb), 6)
    pair_counts["n"] = pair_counts["n"].astype(np.int64)
    return pair_counts


def _inverted_index_documents(sf_dir: str) -> rd.Dataset:
    """Search-index construction artifact: per token, document
    frequency plus the first 50 posting doc-ids (sorted,
    comma-joined). The (token, doc) pair stream is the distinct-pairs
    combiner; postings assemble inside one salted exchange on token —
    the text never moves, and each posting list is bounded."""
    from sits_classification_ray.stages.shuffle import partitioned_map
    from sits_classification_ray.stages.textstats import \
        term_frequencies_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = docs.map_batches(term_frequencies_batch,
                             batch_format="pyarrow",
                             zero_copy_batch=True) \
        .select_columns(["token", "doc_id"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["token", "doc_id"], kind="mergesort")
        g = df.groupby("token", sort=False)["doc_id"]
        out = pd.DataFrame({
            "token": g.count().index.to_numpy(),
            "df": g.nunique().to_numpy(np.int64),
            "postings": g.apply(
                lambda s: ",".join(map(str, s.head(50)))).to_numpy(),
        })
        return out

    return partitioned_map(pairs, kernel, keys=["token"])


def _dow_hour_matrix_events(sf_dir: str) -> rd.Dataset:
    """Calendar activity matrix: event counts by (ISO day-of-week,
    hour) — the standard ops heatmap feed, one combiner groupby."""
    from ray.data.aggregate import Sum

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dow": df["ts"].dt.isocalendar().day.astype(np.int64),
            "hour": df["ts"].dt.hour.astype(np.int64),
            "one": np.int64(1),
        })

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    return (ev.map_batches(proj, batch_format="pandas")
            .groupby(["dow", "hour"])
            .aggregate(Sum("one", alias_name="n_events")))


def _journey_trigrams_events(sf_dir: str) -> rd.Dataset:
    """Sequence-pattern mining: the 10 most frequent event-type
    TRIGRAMS along user journeys (ordered by ts, event_id) — the
    3-gram extension of the Markov transition matrix."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.sampling import top_k_per_group
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        t = df["event_type"].to_numpy()
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        out = (pd.DataFrame({"t1": t[:-2][same], "t2": t[1:-1][same],
                             "t3": t[2:][same]})
               .groupby(["t1", "t2", "t3"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = (partitioned_map(ev, kernel, keys=["user_id"])
              .groupby(["t1", "t2", "t3"])
              .aggregate(Sum("n", alias_name="n")))

    def add_tie(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_g"] = np.int64(0)
        df["_tie"] = df["t1"] + " " + df["t2"] + " " + df["t3"]
        return df

    top = top_k_per_group(counts.map_batches(add_tie,
                                             batch_format="pandas"),
                          ["_g"], "n", k=10, ascending=False,
                          tie_col="_tie")
    return top.drop_columns(["_g", "_tie"])


def _benford_value_events(sf_dir: str) -> rd.Dataset:
    """Benford's-law forensics on the value column: observed
    first-significant-digit distribution vs the Benford expectation,
    with the chi-square statistic as one extra row-free aggregate.
    Digit extraction is all-integer after one log10."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round

    def digits(df: pd.DataFrame) -> pd.DataFrame:
        # exact path: 2-decimal values → integer cents → first digit
        # of the decimal string (no float log10, no ULP hazard)
        v = df["value"].to_numpy(np.float64)
        c = np.round(v[v > 0] * 100.0).astype(np.int64)
        d = pd.Series(c).astype(str).str[0].astype(np.int64)
        out = (pd.DataFrame({"digit": d})
               .groupby("digit", sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value"])
    counts = (ev.map_batches(digits, batch_format="pandas")
              .groupby("digit")
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    counts = counts.sort_values("digit").reset_index(drop=True)
    total = float(counts["n"].sum())
    dig = counts["digit"].to_numpy(np.int64).astype(np.float64)
    expected = np.log10(1.0 + 1.0 / dig)
    obs_p = counts["n"].to_numpy(np.float64) / total
    counts["observed_p"] = sql_round(obs_p, 6)
    counts["benford_p"] = sql_round(expected, 6)
    counts["n"] = counts["n"].astype(np.int64)
    return counts[["digit", "n", "observed_p", "benford_p"]]


def _readability_documents(sf_dir: str) -> rd.Dataset:
    """Flesch reading-ease per document from three vectorized regex
    counts (words, sentence-punctuation runs, vowel-group syllable
    proxy) — a named readability quality signal; the formula is
    evaluated in the same literal order as the SQL twin."""
    from sits_classification_ray.functions.transforms import sql_round

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        words = pc.cast(pc.add(pc.count_substring(text, " "), 1),
                        pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sents = np.maximum(
            pc.cast(pc.count_substring_regex(text, r"[.!?]+"),
                    pa.int64()).to_numpy(zero_copy_only=False), 1) \
            .astype(np.float64)
        syl = pc.cast(pc.count_substring_regex(pc.utf8_lower(text),
                                               r"[aeiouy]+"),
                      pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        flesch = 206.835 - 1.015 * (words / sents) \
            - 84.6 * (syl / words)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(words.astype(np.int64)),
            "n_sentences": pa.array(sents.astype(np.int64)),
            "n_syllables": pa.array(syl.astype(np.int64)),
            "flesch": pa.array(sql_round(flesch, 6)),
        })

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return docs.map_batches(kernel, batch_format="pyarrow",
                            zero_copy_batch=True)


def _winsorized_value_by_type(sf_dir: str) -> rd.Dataset:
    """Outlier treatment: per event_type, winsorize the value at the
    exact p01/p99 (computed on integer cents — the 2-decimal domain
    makes :func:`exact_int_quantile` EXACT) and report the clipped
    mean. Quantile bounds are a tiny per-type table broadcast into the
    clipping pass; all moments stay integer until the final division."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.sketches import exact_int_quantile
    from sits_classification_ray.functions.transforms import sql_round

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "c": np.round(df["value"].to_numpy(np.float64) * 100.0)
            .astype(np.int64),
        })

    cents_ds = ev.map_batches(cents, batch_format="pandas") \
        .materialize()
    q = exact_int_quantile(cents_ds, "c", "event_type",
                           quantiles=(0.01, 0.99)).to_pandas()
    lo = dict(zip(q["event_type"], q["q01"]))
    hi = dict(zip(q["event_type"], q["q99"]))

    def clip_partial(df: pd.DataFrame) -> pd.DataFrame:
        l = df["event_type"].map(lo).to_numpy(np.int64)
        h = df["event_type"].map(hi).to_numpy(np.int64)
        c = np.minimum(np.maximum(df["c"].to_numpy(np.int64), l), h)
        out = pd.DataFrame({"event_type": df["event_type"], "c": c,
                            "one": np.int64(1)})
        return (out.groupby("event_type", sort=False)
                .agg(s=("c", "sum"), n=("one", "sum")).reset_index())

    agg = (cents_ds.map_batches(clip_partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("s", alias_name="s"),
                      Sum("n", alias_name="n")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["n"] = out["n"].astype(np.int64)
        out["q01"] = out["event_type"].map(lo).astype(np.int64)
        out["q99"] = out["event_type"].map(hi).astype(np.int64)
        out["mean_clipped"] = sql_round(
            out["s"].to_numpy(np.float64)
            / out["n"].to_numpy(np.float64) / 100.0, 6)
        return out[["event_type", "n", "q01", "q99", "mean_clipped"]]

    return agg.map_batches(fin, batch_format="pandas")


def _quota_events(sf_dir: str) -> rd.Dataset:
    """Quota / rate-limit enforcement: keep at most the first 3
    events per (user, day), ordered by (ts, event_id) — the ingest
    throttling primitive. One salted exchange on user; vectorized
    cumcount per partition."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_day"] = df["ts"].dt.floor("D")
        df = df.sort_values(["user_id", "_day", "ts", "event_id"],
                            kind="mergesort")
        rank = df.groupby(["user_id", "_day"], sort=False).cumcount()
        return df[rank < 3].drop(columns=["_day"])

    return partitioned_map(ev, kernel, keys=["user_id"])


def _events_with_user_stats(sf_dir: str) -> rd.Dataset:
    """Denormalization: every purchase event annotated with its user's
    total purchase volume and count (the window-aggregate-join). The
    per-user aggregate is a combiner groupby; the attach is the
    tag-union exchange on user — no driver-held user table."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value",
                                  "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["event_id", "user_id", "ts", "value"])
    stats = (purchases.groupby("user_id")
             .aggregate(Sum("value", alias_name="user_total"),
                        Count(alias_name="user_purchases")))

    def tag_p(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["user_total"] = np.float64(-1.0)
        out["user_purchases"] = np.int64(-1)
        return out

    def tag_s(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": np.int64(-1), "user_id": df["user_id"],
            "ts": pd.NaT, "value": np.nan,
            "user_total": df["user_total"].astype(np.float64),
            "user_purchases": df["user_purchases"].astype(np.int64),
        })

    unioned = purchases.map_batches(tag_p, batch_format="pandas") \
        .union(stats.map_batches(tag_s, batch_format="pandas"))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        side_s = df[df["user_purchases"] >= 0]
        side_p = df[df["user_purchases"] < 0]
        tmap = pd.Series(side_s["user_total"].to_numpy(),
                         index=side_s["user_id"])
        cmap = pd.Series(side_s["user_purchases"].to_numpy(),
                         index=side_s["user_id"])
        out = side_p[["event_id", "user_id", "ts", "value"]] \
            .copy(deep=False)
        out["event_id"] = out["event_id"].astype(np.int64)
        out["user_total"] = sql_round(
            out["user_id"].map(tmap).to_numpy(np.float64), 6)
        out["user_purchases"] = out["user_id"].map(cmap) \
            .astype(np.int64)
        return out

    return partitioned_map(unioned, kernel, keys=["user_id"])


def _profile_events(sf_dir: str) -> rd.Dataset:
    """TFDV-style numeric column profiler: one row per numeric column
    with count, nulls, min, max and mean — per-batch single-row
    partials (count/null/min/max/sum), native merge, exact integer
    moments finalized to a rounded mean."""
    from ray.data.aggregate import Max, Min, Sum

    from sits_classification_ray.functions.transforms import sql_round

    cols = ["event_id", "user_id", "value"]
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = df[c]
            rows.append((c, np.int64(v.notna().sum()),
                         np.int64(v.isna().sum()),
                         float(v.min()), float(v.max()),
                         float(v.astype(np.float64).sum())))
        return pd.DataFrame(rows, columns=["column", "n", "n_null",
                                           "min_v", "max_v", "s"])

    agg = (ev.map_batches(partial, batch_format="pandas")
           .groupby("column")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_null", alias_name="n_null"),
                      Min("min_v", alias_name="min_v"),
                      Max("max_v", alias_name="max_v"),
                      Sum("s", alias_name="s")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["n"] = out["n"].astype(np.int64)
        out["n_null"] = out["n_null"].astype(np.int64)
        out["mean_v"] = sql_round(out["s"].to_numpy(np.float64)
                                  / out["n"].to_numpy(np.float64), 6)
        return out[["column", "n", "n_null", "min_v", "max_v",
                    "mean_v"]]

    return agg.map_batches(fin, batch_format="pandas")


def _value_ddsketch_by_type(sf_dir: str) -> rd.Dataset:
    """DDSketch relative-error quantiles of the (continuous, positive)
    event value per event_type — the sketch family applied to the
    float-domain case where the exact integer histogram can't."""
    from sits_classification_ray.functions.sketches import ddsketch_quantile

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return ddsketch_quantile(ev, value_col="value",
                             bucket_col="event_type")


def _error_rate_hourly(sf_dir: str) -> rd.Dataset:
    """Operational SLO metric: error-event share per hour (exact
    integer counts, one rounded division)."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "hour": df["ts"].dt.floor("h"),
            "is_err": (df["event_type"] == "error").astype(np.int64),
            "one": np.int64(1),
        })

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    agg = (ev.map_batches(proj, batch_format="pandas")
           .groupby("hour")
           .aggregate(Sum("is_err", alias_name="n_errors"),
                      Sum("one", alias_name="n_events")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["error_rate"] = sql_round(
            df["n_errors"].to_numpy(np.float64)
            / df["n_events"].to_numpy(np.float64), 6)
        return df

    return agg.map_batches(fin, batch_format="pandas")


def _ttl_dedup_crawl(sf_dir: str) -> rd.Dataset:
    """Windowed (TTL) dedup: keep the first snapshot per
    (url, content value, 7-day window) — "don't re-store unchanged
    content within the TTL", the streaming-dedup-with-expiry
    discretization. One salted exchange on url; vectorized
    sort + drop_duplicates per partition."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    win_us = 7 * 86400 * 1_000_000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="mergesort").copy()
        ts = df["warc_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        df["_win"] = ts // win_us
        out = df.drop_duplicates(["url", "text_len", "_win"])
        return out.drop(columns=["_win"])

    obs = _obs(sf_dir).select_columns(["url", "warc_ts", "text_len"])
    return partitioned_map(obs, kernel, url_col="url")


def _validate_events(sf_dir: str) -> rd.Dataset:
    """Deequ/TFDV-style data-quality constraint checks over events,
    one row per constraint with its violation count: completeness
    (ts / user_id non-null), key uniqueness (event_id), range
    (value ≥ 0), enum membership (event_type in the known set). Each
    check is a per-batch vectorized partial count + native Sum —
    one streaming pass for the row-local checks plus one
    (key, count) combiner for uniqueness."""
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet")
    types = ["click", "purchase", "error", "signup", "view"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "constraint": ["ts_not_null", "user_id_not_null",
                           "value_non_negative", "event_type_enum"],
            "n_violations": np.array([
                int(df["ts"].isna().sum()),
                int(df["user_id"].isna().sum()),
                int((df["value"] < 0).sum()),
                int((~df["event_type"].isin(types)).sum()),
            ], dtype=np.int64),
        })

    rowchecks = (ev.map_batches(partial, batch_format="pandas")
                 .groupby("constraint")
                 .aggregate(Sum("n_violations",
                                alias_name="n_violations")))

    # uniqueness: rows whose event_id appears more than once
    per_key = (ev.groupby("event_id").aggregate(Count(alias_name="n")))

    def dup_partial(df: pd.DataFrame) -> pd.DataFrame:
        extra = int((df["n"][df["n"] > 1]).sum() -
                    (df["n"] > 1).sum())
        return pd.DataFrame({"constraint": ["event_id_unique"],
                             "n_violations": np.array([extra],
                                                      np.int64)})

    dupes = (per_key.map_batches(dup_partial, batch_format="pandas")
             .groupby("constraint")
             .aggregate(Sum("n_violations",
                            alias_name="n_violations")))

    out = rowchecks.union(dupes)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["n_violations"] = df["n_violations"].astype(np.int64)
        df["passed"] = df["n_violations"] == 0
        return df

    return out.map_batches(fin, batch_format="pandas")


def _cluster_top_terms(sf_dir: str) -> rd.Dataset:
    """Cluster labeling: top-3 tokens per k-means cluster — the
    embeddings clustering joined back to the documents' text
    (vec_id = doc_id), a per-(cluster, token) count combiner, and the
    grouped top-k. Certifies the kmeans → join → text composition."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.sampling import top_k_per_group
    from sits_classification_ray.stages.similarity import kmeans_assign

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    assign = kmeans_assign(emb, k=8, iterations=5)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    joined = hash_join(docs, assign, on="doc_id", right_on="vec_id")

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        cl = np.repeat(np.asarray(batch["cluster"], dtype=np.int64),
                       lens)
        t = pa.table({"cluster": pa.array(cl), "token": flat})
        g = t.group_by(["cluster", "token"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cluster", "token", "n"])

    merged = (joined.map_batches(counts, batch_format="pyarrow",
                                zero_copy_batch=True)
              .groupby(["cluster", "token"])
              .aggregate(Sum("n", alias_name="n")))
    return top_k_per_group(merged, ["cluster"], "n", k=3,
                           ascending=False, tie_col="token")


def _psi_drift_weekly(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitoring: population stability index of
    the text_len distribution, week over week. The distributed part is
    the binned-count combiner (one row per (week, bin) per batch,
    native Sum merge); the PSI itself runs over the tiny
    weeks × 256-bin table. Bins present in only one week are skipped
    (the zero-count convention shared with the SQL twin).
    """
    from ray.data.aggregate import Sum

    def binned(batch: pa.Table) -> pa.Table:
        week = pc.cast(pc.floor_temporal(batch["warc_ts"], unit="week"),
                       pa.timestamp("us"))
        b = np.minimum(np.asarray(batch["text_len"], dtype=np.int64)
                       // 64, 255)
        t = pa.table({"w": week, "bin": pa.array(b, pa.int64())})
        g = t.group_by(["w", "bin"]).aggregate([([], "count_all")])
        return g.rename_columns(["w", "bin", "n"])

    counts = (_obs(sf_dir).map_batches(binned, batch_format="pyarrow",
                                       zero_copy_batch=True)
              .groupby(["w", "bin"])
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    tot = counts.groupby("w")["n"].sum()
    weeks = sorted(tot.index)
    rows = []
    from sits_classification_ray.functions.transforms import sql_round
    for prev_w, w in zip(weeks[:-1], weeks[1:]):
        cur = counts[counts["w"] == w].set_index("bin")["n"]
        prv = counts[counts["w"] == prev_w].set_index("bin")["n"]
        shared = sorted(set(cur.index) & set(prv.index))
        p = cur.loc[shared].to_numpy(np.float64) / float(tot[w])
        q = prv.loc[shared].to_numpy(np.float64) / float(tot[prev_w])
        psi = float(np.sum((p - q) * np.log(p / q)))
        rows.append((w, sql_round(np.array([psi]), 6)[0],
                     np.int64(len(shared))))
    out = pd.DataFrame(rows, columns=["w", "psi", "n_bins"])
    out["n_bins"] = out["n_bins"].astype(np.int64)
    return out


def _attribution_events(sf_dir: str) -> rd.Dataset:
    """Last-touch attribution: each purchase attributed to the user's
    latest click within the 7-day lookback — the windowed as-of join."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type", "value"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["event_id", "user_id", "ts", "value"])

    def clicks_proj(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["event_type"] == "click"]
        return pd.DataFrame({"user_id": c["user_id"], "ts": c["ts"],
                             "click_ts": c["ts"]})

    clicks = ev.map_batches(clicks_proj, batch_format="pandas")
    from sits_classification_ray.stages.joins import asof_join

    out = asof_join(purchases, clicks, by="user_id", left_ts="ts",
                    right_ts="ts", value_cols=["click_ts"],
                    tolerance=pd.Timedelta(days=7))

    # the tag-union exchange null-pads the left side → int ids upcast
    # to float; cast back to the input schema
    def recast(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["event_id"] = df["event_id"].astype(np.int64)
        return df

    return out.map_batches(recast, batch_format="pandas")


def _corpus_prep_documents(sf_dir: str) -> rd.Dataset:
    """The composed end-to-end training-corpus preparation pipeline:
    quality filter + exact dedup (clean_corpus) → distributed inner
    join back to the full rows → weighted source-mixture sampling →
    fixed-window chunking. One queries() entry certifying the STAGE
    COMPOSITION (each stage is also individually oracled)."""
    from sits_classification_ray.stages.curation import weighted_mixture
    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.textstats import (chunk_documents,
                                                          clean_corpus)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    survivors = clean_corpus(docs).select_columns(["doc_id"])
    kept = hash_join(docs, survivors, on="doc_id")
    mixed = weighted_mixture(kept, _MIXTURE_WEIGHTS)
    chunks = chunk_documents(mixed.drop_columns(["source"]))
    return chunks.select_columns(["doc_id", "chunk_id", "chunk_text",
                                  "n_tokens"])


def _topk_urls_daily(sf_dir: str) -> rd.Dataset:
    """Continuous top-k monitoring: top-5 urls by snapshot count per
    day, computed FROM the daily tier (the continuous-aggregate
    consumption path), ties broken by url — the combiner-style
    top_k_per_group, never a global sort."""
    from sits_classification_ray.stages.sampling import top_k_per_group

    daily = (_tier(sf_dir, "daily")
             .filter(expr="metric == 'text_len'")
             .select_columns(["url", "bucket_ts", "count"]))
    return top_k_per_group(daily, ["bucket_ts"], "count", k=5,
                           ascending=False, tie_col="url")


def _skew_report_crawl(sf_dir: str) -> rd.Dataset:
    """Partition-skew introspection (the north_rule's own diagnostic):
    per url_bucket — row count, distinct urls, and the head url's row
    share. Two-level groupby keeps the distinct count and the per-url
    max exact under any batching."""
    from ray.data.aggregate import Count, Max, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.extract import url_bucket_of

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url_bucket": pc.cast(url_bucket_of(batch["url"],
                                                CFG.n_buckets),
                                  pa.int64()),
            "url": batch["url"],
        })

    per_url = (_obs(sf_dir).map_batches(proj, batch_format="pyarrow",
                                        zero_copy_batch=True)
               .groupby(["url_bucket", "url"])
               .aggregate(Count(alias_name="n")))
    per_bucket = (per_url.groupby("url_bucket")
                  .aggregate(Sum("n", alias_name="n_rows"),
                             Count(alias_name="n_urls"),
                             Max("n", alias_name="head_rows")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["head_share"] = sql_round(
            df["head_rows"].to_numpy(np.float64)
            / df["n_rows"].to_numpy(np.float64), 6)
        return out

    return per_bucket.map_batches(fin, batch_format="pandas")


def _path_rollup_crawl(sf_dir: str) -> rd.Dataset:
    """Hierarchical URL-path rollup: snapshots + distinct urls per
    (domain, first path segment) — the level between domain and url."""
    from ray.data.aggregate import Count, Sum

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["url"].str.extract(r"^[a-z]+://([^/]+)(/[^/]*)?",
                                   expand=True)
        return pd.DataFrame({"domain": ex[0],
                             "path1": ex[1].fillna(""),
                             "url": df["url"]})

    per_url = (_obs(sf_dir).map_batches(proj, batch_format="pandas")
               .groupby(["domain", "path1", "url"])
               .aggregate(Count(alias_name="n")))
    return (per_url.groupby(["domain", "path1"])
            .aggregate(Count(alias_name="n_urls"),
                       Sum("n", alias_name="n_snaps")))


def _rolling_mean_time_crawl(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.windows import rolling_mean_time

    out = rolling_mean_time(_obs_long(sf_dir), window_seconds=86400)
    return out.select_columns(["url", "metric", "warc_ts", "value",
                               "rolling_mean_24h"])


_UPSERT_CUTOFF = "2024-01-25"


def _merge_upsert_crawl(sf_dir: str) -> rd.Dataset:
    """Warehouse MERGE: latest snapshot per url after applying an
    update batch (late-window snapshots with corrected text_len)."""
    from sits_classification_ray.stages.windows import merge_upsert

    cur = _obs(sf_dir).select_columns(["url", "warc_ts", "text_len"])

    cutoff = np.datetime64(_UPSERT_CUTOFF, "us")

    def mk_updates(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df["warc_ts"].to_numpy().astype("datetime64[us]")
                 >= cutoff]
        out = sel[["url", "warc_ts"]].copy(deep=False)
        out["text_len"] = sel["text_len"].astype(np.int64) + 1000
        return out

    upd = _obs(sf_dir).map_batches(mk_updates, batch_format="pandas")
    return merge_upsert(cur, upd, key_cols=["url"],
                        version_col="warc_ts")


def _train_linear_fit(sf_dir: str) -> pd.DataFrame:
    """Distributed deterministic softmax-regression fit over the
    embeddings table — the reference Trainer.fit lifecycle (epoch
    loop, valid cadence, early stopping, checkpoints); returns the
    training log (golden oracle: independent numpy twin)."""
    from sits_classification_ray.pipelines.trainer import RayTrainer

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    tr = RayTrainer(ds, epochs=12, learning_rate=0.5,
                    use_class_weights=True)
    tr.fit()
    return tr.log_table()


def _logreg_fit_embeddings(sf_dir: str) -> pd.DataFrame:
    """Binary logistic regression (label==0 vs rest) over the
    embeddings table by EXACT distributed Newton/IRLS: each iteration
    one pass emitting per-pid [Hessian|gradient|loss] partials (O(d²)
    to the driver regardless of rows), merged pid-sorted and solved.
    The second-order sibling of train_linear_fit (reference
    Trainer.fit, pytorch/utils/trainer.py:145-199). Output: learned
    weights as a (dim, weight) long table (dim=-1 is the bias) plus
    the final train NLL as dim=-2."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.pipelines.trainer import logreg_newton_fit

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    w, log = logreg_newton_fit(ds, n_iters=4, reg=1e-3)
    d = len(w) - 1
    dims = np.concatenate([np.arange(d), [-1, -2]]).astype(np.int64)
    vals = np.concatenate([w[:d], [w[d], log[-1]["loss"]]])
    return pd.DataFrame({"dim": dims,
                         "weight": sql_round(vals, 6) + 0.0})


def _rff_kernel_embeddings(sf_dir: str, D: int = 64,
                           gamma: float = 0.5) -> pd.DataFrame:
    """Random Fourier Features (Rahimi & Recht, NIPS 2007): the
    kernel-machine scaling trick — approximate the RBF kernel
    k(x,y)=exp(−γ‖x−y‖²) by z(x)ᵀz(y) with z = √(2/D)·cos(Wx+b),
    W ~ N(0, 2γ) drawn DETERMINISTICALLY (Box-Muller over splitmix64
    streams, pure function of (row, col)). Engine: broadcast (W, b)
    once, per-batch featurize, then report the approximation quality
    the method is used for — mean squared error between z(x)ᵀz(y) and
    the exact kernel over the 32 lexicographically-first probe pairs
    (a combiner-free O(1) result). Golden twin re-derives W, b and
    the probe pairs identically."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.als import _splitmix64

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    probe = emb.filter(expr="vec_id <= 15") \
        .select_columns(["vec_id", "embedding"]).take_all()
    probe = sorted(probe, key=lambda r: int(r["vec_id"]))
    X = np.stack([np.asarray(r["embedding"], np.float64)
                  for r in probe])
    d = X.shape[1]

    # deterministic N(0, 2γ) via Box-Muller on splitmix64 uniforms
    idx = np.arange(d * D, dtype=np.uint64)
    u1 = (_splitmix64(idx) >> np.uint64(11)).astype(np.float64) \
        * 2.0 ** -53
    u2 = (_splitmix64(idx + np.uint64(10_000_019))
          >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
    u1 = np.maximum(u1, 1e-300)
    W = (np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
         * np.sqrt(2.0 * gamma)).reshape(d, D)
    b = 2.0 * np.pi * (_splitmix64(
        np.arange(D, dtype=np.uint64) + np.uint64(77_003))
        >> np.uint64(11)).astype(np.float64) * 2.0 ** -53

    Z = np.sqrt(2.0 / D) * np.cos(X @ W + b)
    approx = Z @ Z.T
    sq = (X * X).sum(axis=1)
    exact = np.exp(-gamma * (sq[:, None] + sq[None, :]
                             - 2.0 * (X @ X.T)))
    iu = np.triu_indices(len(X), 1)
    err = approx[iu] - exact[iu]
    return pd.DataFrame({
        "n_pairs": [np.int64(len(err))],
        "mse": sql_round(np.array([float((err * err).mean())]), 6)
        + 0.0,
        "max_abs_err": sql_round(
            np.array([float(np.abs(err).max())]), 6) + 0.0,
        "mean_exact": sql_round(
            np.array([float(exact[iu].mean())]), 6) + 0.0})


def _fd_sketch_embeddings(sf_dir: str, ell: int = 8) -> pd.DataFrame:
    """Frequent-Directions matrix sketch of the embedding matrix
    (Liberty 2013): per-partition ell-row sketches over id-sorted
    rows merged pid-ascending on the driver (concat + SVD shrink —
    FD's mergeability is the point: O(P·ell·d) ever reaches the
    driver). Output: the sketch's singular values plus the covered
    Frobenius mass fraction — the streaming answer to "how low-rank
    is this corpus?" next to exact PCA. Golden twin replicates the
    partition structure and merge order."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.pipelines.trainer import \
        frequent_directions

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    B, f2 = frequent_directions(ds, ell=ell)
    s = np.linalg.svd(B, compute_uv=False)
    return pd.DataFrame({
        "rank_idx": np.arange(len(s), dtype=np.int64),
        "sigma": sql_round(s, 4) + 0.0,
        "fro_mass_frac": sql_round(
            np.full(len(s), float((s * s).sum()) / f2), 4) + 0.0})


def _ledoit_wolf_embeddings(sf_dir: str) -> pd.DataFrame:
    """Ledoit-Wolf covariance shrinkage intensity λ* toward the
    scaled identity (the d ≈ n regularizer Mahalanobis/LDA/GMM
    downstreams need): two distributed passes of pid-sorted partials
    — [Σx|Σxxᵀ] then, with mean+S broadcast, [Σ‖x_c‖⁴|Σx_cᵀSx_c] —
    O(d²) per partition to the driver regardless of rows. Golden twin
    replicates the pid partial structure."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.pipelines.trainer import ledoit_wolf_stats

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    st = ledoit_wolf_stats(ds)
    return pd.DataFrame({
        "n": [np.int64(st["n"])], "dim": [np.int64(st["dim"])],
        "mu": sql_round(np.array([st["mu"]]), 6) + 0.0,
        "d2": sql_round(np.array([st["d2"]]), 6) + 0.0,
        "b2": sql_round(np.array([st["b2"]]), 6) + 0.0,
        "shrinkage": sql_round(np.array([st["shrinkage"]]), 6) + 0.0})


def _margin_prune_embeddings(sf_dir: str, keep_frac: float = 0.2
                             ) -> rd.Dataset:
    """Margin-based data pruning (the EL2N/forgetting-score family by
    proxy): fit the Newton logistic model, then keep the HARDEST
    ``keep_frac`` of examples — smallest |decision margin| — the
    classic active-learning/data-diet selection. Composed pipeline:
    distributed fit (O(d²) partials) → broadcast weights → per-batch
    margins → distributed sort+limit (only the kept rows move).
    Golden twin reuses the independent logreg twin."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.pipelines.trainer import logreg_newton_fit

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    w, _ = logreg_newton_fit(ds, n_iters=4, reg=1e-3)
    n = ds.count()
    k = max(1, int(n * keep_frac))
    w_ref = ray.put(w)

    def margins(df: pd.DataFrame) -> pd.DataFrame:
        wv = ray.get(w_ref)
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["embedding"]])
        z = X @ wv[:-1] + wv[-1]
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "margin": sql_round(z, 6) + 0.0,
            "absm": np.abs(sql_round(z, 6))})

    out = (ds.map_batches(margins, batch_format="pandas")
           .sort(["absm", "vec_id"]).limit(k)
           .drop_columns(["absm"]))
    return out


def _priority_sample_documents(sf_dir: str, k: int = 100) -> rd.Dataset:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): the
    weighted-sampling scheme with unbiased subset-sum estimates.
    Priority qᵢ = wᵢ/uᵢ (w = n_chars, u = a splitmix64 uniform keyed
    by doc_id); keep the k largest priorities; τ = (k+1)-th priority;
    estimator ŵᵢ = max(wᵢ, τ). Distributed top-(k+1) via sort+limit —
    only k+1 rows reach the driver. Golden twin re-derives the same
    uniforms from the published splitmix64 constants."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.als import _splitmix64

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def prio(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        w = df["n_chars"].to_numpy(np.float64)
        h = _splitmix64(ids.astype(np.uint64))
        u = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
        u = np.maximum(u, 2.0 ** -53)            # avoid div by zero
        return pd.DataFrame({"doc_id": ids, "w": w,
                             "priority": w / u})

    top = (docs.map_batches(prio, batch_format="pandas")
           .sort([("priority"), ("doc_id")], descending=[True, False])
           .limit(k + 1).to_pandas())
    tau = float(top["priority"].iloc[k]) if len(top) > k else 0.0
    kept = top.iloc[:k]
    return pd.DataFrame({
        "doc_id": kept["doc_id"].to_numpy(np.int64),
        "w": kept["w"].to_numpy(np.float64),
        "w_hat": sql_round(np.maximum(kept["w"].to_numpy(np.float64),
                                      tau), 6) + 0.0})


def _train_linear_weights(sf_dir: str) -> pd.DataFrame:
    """Learned weights of the same fit as a (class, dim, weight) long
    table (dim = -1 rows are biases); bit-stable across block order /
    cluster size by the trainer's pid-ordered merge contract."""
    from sits_classification_ray.pipelines.trainer import RayTrainer

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    tr = RayTrainer(ds, epochs=12, learning_rate=0.5,
                    use_class_weights=True)
    tr.fit()
    return tr.weights_table()


def _tune_trials(sf_dir: str) -> pd.DataFrame:
    """Seeded random hyperparameter search (the optuna hook analog,
    reference pytorch/train.py:58-71): 5 trials over log-uniform
    (learning_rate, weight_decay), best-trial table ranked by valid
    accuracy."""
    from sits_classification_ray.pipelines.trainer import tune_search

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return tune_search(ds, n_trials=5, seed=7, epochs=6)


def _quality_classifier_documents(sf_dir: str) -> rd.Dataset:
    """Composed quality-filter pipeline (GPT-3/CCNet pattern): train
    a linear classifier on deterministic reference labels over 4
    text features via the RayTrainer lifecycle, then score every
    document with the learned weights (golden oracle: independent
    numpy twin of featurize → fit → softmax score)."""
    from sits_classification_ray.pipelines.trainer import \
        quality_classifier_scores

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    return quality_classifier_scores(docs)


def _bpe_merges_documents(sf_dir: str) -> pd.DataFrame:
    from sits_classification_ray.stages.textstats import bpe_merges

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    # the prune BINDS here (31 distinct synth tokens → top 24), so the
    # golden-checked result covers the bounded-collect path, not just
    # the trivial all-words case
    return bpe_merges(docs, n_merges=30, min_count=2, max_vocab=24)


def _pq_topk_embeddings(sf_dir: str) -> rd.Dataset:
    """PQ/ADC approximate top-10: train 8×16 codebooks, encode to
    8-byte codes, asymmetric-distance scan for query ids 0-2."""
    from sits_classification_ray.stages.pq import (pq_encode, pq_topk,
                                                   train_pq_codebooks)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    cb = train_pq_codebooks(emb, m=8, ks=16, iterations=3)
    q_df = emb.filter(expr="vec_id < 3").to_pandas() \
        .sort_values("vec_id")
    queries = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
               for r in q_df.itertuples(index=False)}
    codes = pq_encode(emb, cb)
    return pq_topk(codes, cb, queries, k=10)


def _ivfpq_topk_embeddings(sf_dir: str) -> rd.Dataset:
    """IVF-PQ (FAISS IVFADC) top-10 for query ids 0-2 — coarse list
    probing composed with PQ/ADC code scanning."""
    from sits_classification_ray.stages.pq import ivfpq_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    q_df = emb.filter(expr="vec_id < 3").to_pandas() \
        .sort_values("vec_id")
    queries = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
               for r in q_df.itertuples(index=False)}
    return ivfpq_topk(emb, queries, k=10)


def _kmeans_embeddings(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.similarity import kmeans_assign

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return kmeans_assign(emb, k=8, iterations=5)


def _semdedup_embeddings(sf_dir: str) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): k-means-bucketed semantic dedup —
    within each cluster, greedily drop vectors with cosine ≥ 0.45 to
    an already-kept vector, farthest-from-centroid kept first."""
    from sits_classification_ray.stages.similarity import semdedup

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return semdedup(emb, k=8, iterations=5, tau=0.45)


def _user_sessions_events(sf_dir: str) -> rd.Dataset:
    """Sessionize the events stream per user (1 h inactivity gap) and
    coalesce to per-session intervals — the sessionize stage reused on
    the user/event axis."""
    from ray.data.aggregate import Count, Max, Min

    from sits_classification_ray.stages.windows import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    s = sessionize(ev, gap_seconds=3600, ts_col="ts",
                   key_col="user_id")
    return (s.groupby(["user_id", "session_id"])
            .aggregate(Count(alias_name="n_events"),
                       Min("ts", alias_name="session_start"),
                       Max("ts", alias_name="session_end")))


def _churned_users_weekly(sf_dir: str) -> rd.Dataset:
    """Weekly churn: users active in week w with NO activity in week
    w+1 — the retention complement of cohort_retention_events. Shape:
    distinct (user, week) pairs, then a shifted tag-union self-compare
    (each pair also emits itself at week−7d as a "next-week witness"),
    one groupby — no self-join of the events table. The last week has
    no next-week data, so churn is undefined there and excluded (SQL
    twin identical)."""
    from ray.data.aggregate import Count, Max, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"],
            "week": df["ts"].dt.to_period("W").dt.start_time})

    pairs = (ev.map_batches(proj, batch_format="pandas")
             .groupby(["user_id", "week"])
             .aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    max_week = pairs.max("week")

    def tag_cur(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "week": df["week"],
                             "cur": np.int64(1), "nxt": np.int64(0)})

    def tag_next(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "week": df["week"] - pd.Timedelta(days=7),
                             "cur": np.int64(0), "nxt": np.int64(1)})

    merged = (pairs.map_batches(tag_cur, batch_format="pandas")
              .union(pairs.map_batches(tag_next, batch_format="pandas"))
              .groupby(["user_id", "week"])
              .aggregate(Sum("cur", alias_name="cur"),
                         Sum("nxt", alias_name="nxt")))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["cur"] > 0) & (df["week"] < max_week)]
        return pd.DataFrame({
            "week": df["week"],
            "one": np.ones(len(df), np.int64),
            "churned": (df["nxt"] == 0).to_numpy(np.int64)})

    out = (merged.map_batches(flag, batch_format="pandas")
           .groupby("week")
           .aggregate(Sum("one", alias_name="n_active"),
                      Sum("churned", alias_name="n_churned")))
    return out.sort("week")


def _session_entry_exit_events(sf_dir: str) -> rd.Dataset:
    """Entry→exit page-flow table: per user session (1 h gap, same
    sessionize stage as user_sessions_events), the first and last
    event_type — then session counts per (entry, exit) pair. The
    behavioral funnel diagnostic ("where do sessions start and
    abandon"). Ties at the same timestamp break by event_id on both
    sides."""
    from ray.data.aggregate import Count

    from sits_classification_ray.stages.shuffle import partitioned_map
    from sits_classification_ray.stages.windows import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    s = sessionize(ev, gap_seconds=3600, ts_col="ts",
                   key_col="user_id")

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "session_id", "ts", "event_id"],
                            kind="mergesort")
        g = df.groupby(["user_id", "session_id"], sort=False)
        first = g["event_type"].first()
        last = g["event_type"].last()
        return pd.DataFrame({"entry_type": first.to_numpy(),
                             "exit_type": last.to_numpy()})

    flows = partitioned_map(s, ends, url_col="user_id")
    out = flows.groupby(["entry_type", "exit_type"]).aggregate(
        Count(alias_name="n_sessions"))
    return out.sort(["entry_type", "exit_type"])


def _cumulative_users_daily(sf_dir: str) -> pd.DataFrame:
    """Growth curve: cumulative distinct users by day. First-seen day
    per user is one distributed Min groupby; the running total runs
    over the tiny per-day table."""
    from ray.data.aggregate import Count, Min

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "day": df["ts"].dt.floor("D")})

    first = (ev.map_batches(proj, batch_format="pandas")
             .groupby("user_id").aggregate(Min("day", alias_name="day")))
    per_day = (first.groupby("day")
               .aggregate(Count(alias_name="new_users")).to_pandas())
    per_day = per_day.sort_values("day").reset_index(drop=True)
    per_day["cumulative_users"] = per_day["new_users"].cumsum() \
        .astype(np.int64)
    per_day["new_users"] = per_day["new_users"].astype(np.int64)
    return per_day


def _full_join_documents_embeddings(sf_dir: str) -> rd.Dataset:
    """Full-outer hash join: English docs ⟗ label≤2 embeddings — rows
    survive from both unmatched sides (J2 completed across all join
    types; left-outer covered by left_join_documents_embeddings)."""
    from sits_classification_ray.stages.joins import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"]) \
        .filter(expr="lang == 'en'")
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"]) \
        .filter(expr="label <= 2")
    # Ray's full_outer join coalesces the two key columns into the
    # left key name — output carries one doc_id for both sides
    out = hash_join(docs, emb, on="doc_id", right_on="vec_id",
                    join_type="full_outer")
    return out.select_columns(["doc_id", "lang", "n_chars", "label"])


#: mixture weights: full src0-4, half src5-9, tenth src10-14, drop rest
_MIXTURE_WEIGHTS = {**{f"src{i}": 1.0 for i in range(5)},
                    **{f"src{i}": 0.5 for i in range(5, 10)},
                    **{f"src{i}": 0.1 for i in range(10, 15)}}


def _source_mixture_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.curation import weighted_mixture

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "lang"])
    return weighted_mixture(docs, _MIXTURE_WEIGHTS)


def _gopher_rules_documents(sf_dir: str) -> rd.Dataset:
    """Gopher quality-rule filter (Rae et al. 2021) with per-rule
    provenance flags; thresholds tuned so every rule discriminates
    on the synth corpus (tokens 10-99, mean word len 3.7-5.3)."""
    from sits_classification_ray.stages.textstats import gopher_rules

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return gopher_rules(docs, min_words=30, min_mean_len=4.0,
                        max_mean_len=10.0, min_alpha_frac=0.80,
                        min_stopwords=3,
                        stopwords=("data", "row", "join", "hash",
                                   "batch", "scan"))


def _dsir_weights_documents(sf_dir: str) -> rd.Dataset:
    """DSIR importance weights (Xie et al. 2023) against the 'en'
    subset as the target domain, top-1000-word feature vocabulary."""
    from sits_classification_ray.stages.curation import dsir_logweights

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    return dsir_logweights(docs, target_col="lang", target_value="en",
                           vocab_k=1000)


def _lang_temperature_weights(sf_dir: str) -> pd.DataFrame:
    """mT5/XLM-R temperature-based multilingual sampling weights
    (α = 0.3) over the documents table."""
    from sits_classification_ray.stages.curation import \
        lang_temperature_weights

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    return lang_temperature_weights(docs, alpha=0.3)


def _ppl_buckets_documents(sf_dir: str) -> rd.Dataset:
    """CCNet-style per-language perplexity bucketing: unigram-LM
    score each document, then NTILE(3) within its language ordered
    best-first (bucket 1 = head / 2 = middle / 3 = tail). Composes
    the scale-path LM scorer with the O(B)-driver grouped rank."""
    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.scan_sorted import grouped_ntile
    from sits_classification_ray.stages.textstats import unigram_logprob

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    lp = unigram_logprob(docs, broadcast_max_vocab=0)
    langs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
    joined = hash_join(langs, lp, on="doc_id").select_columns(
        ["doc_id", "lang", "avg_logprob"])
    return grouped_ntile(joined, ["lang"], ["avg_logprob", "doc_id"],
                         k=3, descending=[True, False],
                         out_col="bucket")


def _decontaminate_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.curation import decontaminate

    import pyarrow.parquet as pq
    bench = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "<", 5)]).sort_by("doc_id")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return decontaminate(docs, bench["text"].to_pylist(), k=8)


_BLOCKED_DOMAINS = ["site-3.example.com", "site-7.example.com",
                    "site-11.example.com"]


def _url_filter_crawl(sf_dir: str) -> rd.Dataset:
    """RefinedWeb-style URL filtering at the read: drop blocklisted
    domains and banned path terms before any content processing."""
    from sits_classification_ray.sources.synth import crawl_from_tables
    from sits_classification_ray.stages.urlnorm import url_filter

    crawl = crawl_from_tables(sf_dir).select_columns(["url", "warc_ts"])
    return url_filter(crawl, _BLOCKED_DOMAINS,
                      blocked_path_terms=["/u/14"])


def _bpe_encode_documents(sf_dir: str) -> rd.Dataset:
    """Tokenizer application: train 30 BPE merges on the corpus, then
    encode every document with them (broadcast merges, per-actor word
    memo) — per-doc whitespace-word and BPE-unit counts."""
    from sits_classification_ray.stages.textstats import (bpe_encode,
                                                          bpe_merges)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    merges = bpe_merges(docs, n_merges=30, min_count=2,
                        max_vocab=24)
    return bpe_encode(docs, merges)


def _heavy_hitters_documents(sf_dir: str) -> rd.Dataset:
    """Exact frequent words (count > N/36) via the two-pass candidate
    algorithm — bounded memory, candidate-only shuffle."""
    from sits_classification_ray.stages.textstats import heavy_hitters

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return heavy_hitters(docs, k=35)


def _paragraph_dedup_documents(sf_dir: str) -> rd.Dataset:
    """CCNet-style sub-document dedup: globally first-wins over
    disjoint 12-token spans, docs reassembled from surviving spans."""
    from sits_classification_ray.stages.curation import paragraph_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return paragraph_dedup(docs, span_tokens=12)


_BM25_TERMS = ["hash", "join", "stream"]


def _bm25_topk_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return bm25_topk(docs, _BM25_TERMS, k=20)


def _zipf_slope_documents(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Zipf law fit over the corpus vocabulary: OLS slope of
    ``ln(freq)`` against ``ln(rank)`` over the top-k tokens — the
    corpus-health diagnostic (natural text sits near −1; templated or
    boilerplate-heavy corpora flatten). Distributed shape: the
    vocabulary combiner (token_counts) plus a local-top-k prune per
    block, so the global sort sees k × n_blocks rows, never the
    vocabulary; the regression itself runs on k rows on the driver.
    Round-6 parity with SQL ``regr_slope`` via the same two-pass
    covariance as trend_slope (stages/stm.py:196)."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.textstats import token_counts

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    counts = token_counts(ds)

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"],
                              ascending=[False, True]).head(k)

    top = (counts.map_batches(local_top, batch_format="pandas")
           .sort(["n", "token"], descending=[True, False])
           .limit(k).to_pandas())
    r = np.arange(1, len(top) + 1, dtype=np.float64)
    x = np.log(r)
    y = np.log(top["n"].to_numpy(np.float64))
    dx = x - x.mean()
    slope = float((dx * (y - y.mean())).sum() / (dx * dx).sum())
    return pd.DataFrame({
        "n_top": np.array([len(top)], np.int64),
        "zipf_slope": sql_round(np.array([slope]), 6)})


def _lang_entropy_domains(sf_dir: str) -> rd.Dataset:
    """Per-domain Shannon entropy of the language distribution — the
    multilingual-site detector (entropy 0 = monolingual domain).
    Combiner pattern: per-batch (domain, lang) partial counts, one
    exact Sum groupby, then a per-domain entropy kernel over the tiny
    (domains × langs) table. Entropy from integer counts:
    ``log2(N) − Σ c·log2(c) / N`` — same formula family as
    token_entropy_documents for SQL round-6 parity."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    obs = _obs(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
            "domain": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "lang": df["lang"]})
            .groupby(["domain", "lang"], sort=False).size()
            .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    counts = (obs.map_batches(partial, batch_format="pandas")
              .groupby(["domain", "lang"])
              .aggregate(Sum("n", alias_name="n")))

    def ent(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["domain", "lang"], kind="mergesort")
        rows = []
        for dom, g in df.groupby("domain", sort=False):
            c = g["n"].to_numpy(np.float64)
            n = c.sum()
            h = np.log2(n) - float((c * np.log2(c)).sum()) / n
            rows.append((dom, np.int64(n), np.int64(len(g)), h))
        out = pd.DataFrame(rows, columns=["domain", "n_obs", "n_langs",
                                          "entropy"])
        out["entropy"] = sql_round(out["entropy"].to_numpy(np.float64),
                                   6)
        return out

    return partitioned_map(counts, ent, keys=["domain"])


def _token_entropy_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import token_entropy

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return token_entropy(docs)


def _compression_signal_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import compression_signal

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return compression_signal(docs)


def _pmi_bigrams_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import pmi_bigrams

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return pmi_bigrams(docs, k=50, min_count=5)


_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def _cohort_retention_events(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.behavior import cohort_retention

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return cohort_retention(ev)


def _funnel_events(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.behavior import funnel

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel(ev, _FUNNEL_STAGES)


def _cuped_events(sf_dir: str) -> pd.DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM
    2013): per-user pre-period covariate x (spend in hours < 12) and
    outcome y (spend in hours ≥ 12) in EXACT integer cents, pooled
    θ = cov(x,y)/var(x) from int64-exact global sums, and the
    algebraically-collapsed adjusted mean per variant
    ``ȳᵥ − θ·(x̄ᵥ − x̄)`` — so the whole statistic needs only
    per-variant integer partials + four global sums (no second pass
    over users). Variant = user_id % 2. SQL twin mirrors the exact
    expression tree so IEEE float ops agree bit-for-bit."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def proj(b: pa.Table) -> pa.Table:
        # half_towards_infinity matches DuckDB round() (half away from
        # zero); pyarrow's default half_to_even would disagree with the
        # SQL twin on any value*100 landing exactly on .5
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(b["value"], pa.float64()), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        pre = pc.less(pc.hour(b["ts"]), 12)
        return pa.table({
            "user_id": b["user_id"],
            "xc": pc.if_else(pre, cents, pa.scalar(0, pa.int64())),
            "yc": pc.if_else(pre, pa.scalar(0, pa.int64()), cents)})

    peru = (ev.map_batches(proj, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("user_id")
            .aggregate(Sum("xc", alias_name="xc"),
                       Sum("yc", alias_name="yc")))

    def tag(b: pa.Table) -> pa.Table:
        var = pc.cast(pc.bit_wise_and(b["user_id"], 1), pa.int64())
        xc = b["xc"].to_numpy(zero_copy_only=False)
        yc = b["yc"].to_numpy(zero_copy_only=False)
        return pa.table({"variant": var, "xc": b["xc"], "yc": b["yc"],
                         "xy": pa.array(xc * yc),
                         "xx": pa.array(xc * xc)})

    g = (peru.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True)
         .groupby("variant")
         .aggregate(Count(alias_name="n"),
                    Sum("xc", alias_name="sx"),
                    Sum("yc", alias_name="sy"),
                    Sum("xy", alias_name="sxy"),
                    Sum("xx", alias_name="sxx"))
         .to_pandas().sort_values("variant", ignore_index=True))

    n = g["n"].to_numpy(np.float64)
    sx = g["sx"].to_numpy(np.float64)
    sy = g["sy"].to_numpy(np.float64)
    ng = float(n.sum())
    sxg, syg = float(sx.sum()), float(sy.sum())
    sxyg = float(g["sxy"].to_numpy(np.float64).sum())
    sxxg = float(g["sxx"].to_numpy(np.float64).sum())
    theta = (ng * sxyg - sxg * syg) / (ng * sxxg - sxg * sxg)
    mean_raw = sy / n / 100.0
    mean_cuped = (sy / n - theta * (sx / n - sxg / ng)) / 100.0
    return pd.DataFrame({
        "variant": g["variant"].to_numpy(np.int64),
        "n_users": g["n"].to_numpy(np.int64),
        "theta": sql_round(np.full(len(g), theta), 6) + 0.0,
        "mean_raw": sql_round(mean_raw, 6) + 0.0,
        "mean_cuped": sql_round(mean_cuped, 6) + 0.0})


def _seq_patterns_events(sf_dir: str, min_support: int = 5
                         ) -> rd.Dataset:
    """Sequential-pattern mining (the PrefixSpan/GSP family,
    gap-tolerant): support counts of ordered event-type pairs a→b
    (some event a strictly before some b in the same user's stream) —
    the journey-motif signal `journey_trigrams`' contiguous n-grams
    miss. Per-user kernels mark each ordered pair ONCE via a
    first-occurrence index scan (O(k·types) per user, never the
    self-join SQL needs), then a |types|²-row groupby. SQL twin:
    EXISTS self-join."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    out_schema = pa.schema([("first_type", pa.string()),
                            ("then_type", pa.string()),
                            ("n", pa.int64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_type"],
                            kind="mergesort")
        counts: dict = {}
        for _, g in df.groupby("user_id", sort=False):
            types = g["event_type"].to_numpy()
            ts = g["ts"].to_numpy()
            seen_first: dict = {}       # type → first ts
            last_ts: dict = {}          # type → last ts
            for t, ty in zip(ts, types):
                if ty not in seen_first:
                    seen_first[ty] = t
                last_ts[ty] = t
            for a, ta in seen_first.items():
                for b, tb in last_ts.items():
                    if ta < tb:         # strict: some a before some b
                        counts[(a, b)] = counts.get((a, b), 0) + 1
        ks = sorted(counts)
        return pd.DataFrame({
            "first_type": pd.Series([k[0] for k in ks], dtype=object),
            "then_type": pd.Series([k[1] for k in ks], dtype=object),
            "n": np.asarray([counts[k] for k in ks], np.int64)})

    pairs = partitioned_map(ev, kern, keys=["user_id"],
                            out_schema=out_schema)
    return (pairs.groupby(["first_type", "then_type"])
            .aggregate(Sum("n", alias_name="support"))
            .filter(expr=f"support >= {min_support}"))


#: channel universe for Shapley attribution (non-conversion types)
_SHAPLEY_CHANNELS = ("click", "error", "signup", "view")


def _cox_hazard_events(sf_dir: str) -> pd.DataFrame:
    """Cox proportional-hazards regression of time-to-first-purchase
    on engagement (x = ln(1 + event count)) — the survival-REGRESSION
    member next to the Kaplan-Meier staleness curves. Subjects built
    by one per-user reduction (T = hours from first event to first
    purchase, censored at the last event); the Newton iterations are
    deterministic distributed prefix scans over rank-derived blocks
    (pipelines/trainer.py:cox_fit). Golden twin replicates subjects,
    blocking and float order exactly."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.pipelines.trainer import cox_fit
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    subj_schema = pa.schema([("uid", pa.int64()), ("t", pa.float64()),
                             ("d", pa.int64()), ("x", pa.float64())])

    def subjects(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in df.groupby("user_id", sort=True):
            ts = g["ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            t0 = int(ts.min())
            purch = ts[(g["event_type"] == "purchase").to_numpy()]
            if len(purch):
                t_end, d = int(purch.min()), 1
            else:
                t_end, d = int(ts.max()), 0
            rows.append((int(uid), (t_end - t0) / 3_600_000_000.0, d,
                         float(np.log1p(float(len(g))))))
        return pd.DataFrame(rows, columns=["uid", "t", "d", "x"]) \
            .astype({"uid": np.int64, "d": np.int64})

    subj = partitioned_map(ev, subjects, keys=["user_id"],
                           out_schema=subj_schema)
    st = cox_fit(subj)
    return pd.DataFrame({
        "n_subjects": [np.int64(st["n_subjects"])],
        "n_events": [np.int64(st["n_events"])],
        "beta": sql_round(np.array([st["beta_next"]]), 6) + 0.0,
        "loglik": sql_round(np.array([st["loglik"]]), 6) + 0.0})


def _shapley_attribution_events(sf_dir: str) -> pd.DataFrame:
    """Exact Shapley-value channel attribution (the game-theoretic
    sibling of the Markov removal-effect already in the registry):
    coalition value v(T) = share of users converted (≥1 purchase)
    whose pre-conversion channel set ⊆ T, Shapley weights over the
    2⁴ lattice. Distributed shape: per-user channel-bitmask reduction
    (one exchange), then a ≤16-row coalition table to the driver —
    the lattice math is O(2^channels), never O(users). Golden twin
    replicates the lattice exactly."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    chan_idx = {c: i for i, c in enumerate(_SHAPLEY_CHANNELS)}

    out_schema = pa.schema([("mask", pa.int64()),
                            ("n_users", pa.int64()),
                            ("n_conv", pa.int64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_type"],
                            kind="mergesort")
        agg: dict = {}
        for _, g in df.groupby("user_id", sort=False):
            types = g["event_type"].to_numpy()
            conv = "purchase" in types
            mask = 0
            for ty in types:
                if ty == "purchase":
                    break               # channels BEFORE first purchase
                i = chan_idx.get(ty)
                if i is not None:
                    mask |= 1 << i
            n, c = agg.get(mask, (0, 0))
            agg[mask] = (n + 1, c + (1 if conv else 0))
        ks = sorted(agg)
        return pd.DataFrame({
            "mask": np.asarray(ks, np.int64),
            "n_users": np.asarray([agg[k][0] for k in ks], np.int64),
            "n_conv": np.asarray([agg[k][1] for k in ks], np.int64)})

    sets = (partitioned_map(ev, kern, keys=["user_id"],
                            out_schema=out_schema)
            .groupby("mask")
            .aggregate(Sum("n_users", alias_name="n_users"),
                       Sum("n_conv", alias_name="n_conv"))
            .to_pandas().sort_values("mask", ignore_index=True))

    k = len(_SHAPLEY_CHANNELS)
    total = float(sets["n_users"].sum())
    conv_by_mask = np.zeros(1 << k, np.int64)
    conv_by_mask[sets["mask"].to_numpy(np.int64)] = \
        sets["n_conv"].to_numpy(np.int64)

    def v(T: int) -> float:
        # converted users whose channel set ⊆ T
        c = 0
        for m in range(1 << k):
            if (m & ~T) == 0:
                c += int(conv_by_mask[m])
        return c / total

    import math
    phi = np.zeros(k)
    for c in range(k):
        for T in range(1 << k):
            if T & (1 << c):
                continue
            t = bin(T).count("1")
            wgt = (math.factorial(t) * math.factorial(k - t - 1)
                   / math.factorial(k))
            phi[c] += wgt * (v(T | (1 << c)) - v(T))
    return pd.DataFrame({
        "channel": list(_SHAPLEY_CHANNELS),
        "shapley": sql_round(phi, 6) + 0.0})


def _lateness_histogram_events(sf_dir: str) -> rd.Dataset:
    """Event-time lateness audit (the watermark-design input): how far
    behind the running event-time high-water mark does each event
    arrive, histogrammed in hours. Two-pass distributed prefix scan
    over arrival order (stages/scan_sorted.py) — per-block maxima,
    O(blocks) carry fold, vectorized running max + histogram partials.
    SQL twin: window running max over event_id."""
    from sits_classification_ray.stages.scan_sorted import \
        lateness_histogram

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts"])

    # synth event_ids are already ts-ordered (lateness would be
    # identically 0); a deterministic residue shuffle of the arrival
    # order makes the audit non-trivial while staying SQL-expressible
    def arr(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"arrival": pa.array((eid % 97) * (1 << 40)
                                             + eid),
                         "ts": b["ts"]})

    ev = ev.map_batches(arr, batch_format="pyarrow",
                        zero_copy_batch=True)
    return lateness_histogram(ev, id_col="arrival", num_blocks=16)


def _dau_events(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.behavior import daily_active

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return daily_active(ev)


def _exact_quantile_daily(sf_dir: str) -> rd.Dataset:
    """Exact (value-histogram) text_len quantiles per day — the
    integer-domain member of the quantile family (vs hist_quantile's
    fixed bins and ddsketch's log bins)."""
    from sits_classification_ray.functions.sketches import exact_int_quantile

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="day"),
                                 pa.timestamp("us")),
            "text_len": batch["text_len"],
        })

    proj_ds = _obs(sf_dir).map_batches(proj, batch_format="pyarrow",
                                       zero_copy_batch=True)
    return exact_int_quantile(proj_ds, value_col="text_len",
                              bucket_col="bucket_ts")


def _reservoir_sample_events(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.sampling import reservoir_sample

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "user_id",
                                  "ts"])
    return reservoir_sample(ev, ["event_type"], "event_id", k=20)


def _snapshot_deltas_crawl(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.windows import snapshot_deltas

    out = snapshot_deltas(_obs_long(sf_dir))
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value", "delta"]],
        batch_format="pandas")


def _rolling_mean_unbounded(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.scan_sorted import \
        rolling_mean_unbounded

    out = rolling_mean_unbounded(_obs_long(sf_dir), window=4,
                                 num_blocks=16)
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value",
                       "rolling_mean"]],
        batch_format="pandas")


def _crawl_sessions_unbounded(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.scan_sorted import \
        sessionize_unbounded

    out = sessionize_unbounded(_obs(sf_dir), gap_seconds=86400,
                               num_blocks=16)
    return out.map_batches(
        lambda df: df[["url", "warc_ts", "session_id"]],
        batch_format="pandas")


def _running_sum_unbounded(sf_dir: str) -> rd.Dataset:
    """Distributed prefix-scan running sum (no per-series bound) —
    same SQL oracle as running_sum_crawl, certifying the carry-in
    algebra."""
    from sits_classification_ray.stages.scan_sorted import \
        running_sum_unbounded

    out = running_sum_unbounded(_obs_long(sf_dir), num_blocks=16)
    return out.map_batches(
        lambda df: df[["url", "metric", "warc_ts", "value", "running_sum"]],
        batch_format="pandas")


def _crawl_sessions(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.windows import sessionize

    out = sessionize(_obs(sf_dir), gap_seconds=86400)
    return out.map_batches(
        lambda df: df[["url", "warc_ts", "session_id"]],
        batch_format="pandas")


def _session_intervals_crawl(sf_dir: str) -> rd.Dataset:
    """Coalesced session intervals: [start, end] + snapshot count per
    (url, session) — sessionize composed with a tiny groupby."""
    from ray.data.aggregate import Count, Max, Min

    from sits_classification_ray.stages.windows import sessionize

    sess = sessionize(_obs(sf_dir), gap_seconds=86400)
    return (sess.groupby(["url", "session_id"])
            .aggregate(Min("warc_ts", alias_name="start_ts"),
                       Max("warc_ts", alias_name="end_ts"),
                       Count(alias_name="n_snapshots")))


def _snapshot_asof_crawl(sf_dir: str) -> rd.Dataset:
    """Time-travel read: the latest observation per url at a fixed
    cutoff (AS OF queries over the crawl history). The cutoff is the
    corpus midpoint so both kept and dropped snapshots exist."""
    cutoff = pd.Timestamp("2024-01-16")

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["warc_ts"] < cutoff]
        df = df.sort_values(["url", "warc_ts"], kind="mergesort")
        out = df.drop_duplicates("url", keep="last")[
            ["url", "warc_ts", "text_len", "word_count"]]
        if out.empty:
            # pin dtypes: an empty pandas block would otherwise lose
            # its schema in the Arrow union
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "warc_ts": pd.Series([], dtype="datetime64[us]"),
                "text_len": pd.Series([], dtype="int64"),
                "word_count": pd.Series([], dtype="int64"),
            })
        return out

    from sits_classification_ray.stages.shuffle import partitioned_map

    return partitioned_map(_obs(sf_dir), latest, url_col="url")


def _james_stein_domains(sf_dir: str) -> pd.DataFrame:
    """James-Stein empirical-Bayes shrinkage of per-domain mean text
    lengths toward the grand mean — the estimator that dominates the
    per-domain MLE whenever ≥4 domains are estimated at once (small
    domains borrow strength from the ensemble; the third member of
    the uncertainty family next to the bootstrap CI and Ledoit-Wolf).
    Distributed shape: per-url means (exact int sums), one co-located
    domain kernel emitting url-sorted partials (n, Σμ, Σμ²) — ≤
    |domains| rows to the driver — then the k-domain shrinkage
    arithmetic. Golden twin replicates the sort and float order."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    per_url = (_obs(sf_dir)
               .groupby("url")
               .aggregate(Sum("text_len", alias_name="s"),
                          Count(alias_name="c")))

    part_schema = pa.schema([("domain", pa.string()),
                             ("n", pa.int64()),
                             ("sm", pa.float64()),
                             ("sm2", pa.float64())])

    def dom(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "domain": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "url": df["url"],
            "mu": df["s"].to_numpy(np.float64)
            / df["c"].to_numpy(np.float64)})

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, sub in df.sort_values(["domain", "url"],
                                     kind="mergesort").groupby(
                                         "domain", sort=False):
            mu = sub["mu"].to_numpy(np.float64)
            rows.append((d, len(mu), float(mu.sum()),
                         float((mu * mu).sum())))
        return pd.DataFrame(rows, columns=["domain", "n", "sm",
                                           "sm2"]) \
            .astype({"n": np.int64})

    parts = partitioned_map(
        per_url.map_batches(dom, batch_format="pandas"),
        kern, keys=["domain"], out_schema=part_schema).to_pandas() \
        .sort_values("domain", ignore_index=True)

    n = parts["n"].to_numpy(np.float64)
    xbar = parts["sm"].to_numpy(np.float64) / n
    # within-domain variance of url means → SE² of each domain mean
    var_w = (parts["sm2"].to_numpy(np.float64) / n - xbar * xbar)
    se2 = var_w / np.maximum(n - 1.0, 1.0)
    k = len(parts)
    mu_g = float(xbar.mean())
    S = float(((xbar - mu_g) ** 2).sum())
    # degenerate cases (k<=3 domains, or zero between-domain spread):
    # JS only dominates for k>=4, so the correct fallback is NO
    # shrinkage (lam=1, raw means) — not collapsing to the grand mean
    lam = max(0.0, 1.0 - (k - 3.0) * float(se2.mean()) / S) \
        if S > 0 and k > 3 else 1.0
    js = mu_g + lam * (xbar - mu_g)
    return pd.DataFrame({
        "domain": parts["domain"],
        "n_urls": parts["n"].to_numpy(np.int64),
        "mean_raw": sql_round(xbar, 6) + 0.0,
        "mean_js": sql_round(js, 6) + 0.0,
        "shrink_factor": sql_round(np.full(k, lam), 6) + 0.0})


def _bootstrap_ci_crawl(sf_dir: str, B: int = 200, m: int = 200
                        ) -> rd.Dataset:
    """Seeded bootstrap confidence interval for each domain's mean
    per-url text length: per-url means first (exact int sums — one
    row per url, bounding partition payloads at any snapshot volume),
    then an m-out-of-n bootstrap per domain (B=200 replicates of
    min(n, 200) draws, RandomState seeded from the pandas SipHash of
    the domain string — identical in the golden twin), percentile CI
    at 2.5/97.5. The distribution-free uncertainty a crawl-quality
    dashboard needs next to every mean."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    per_url = (_obs(sf_dir)
               .groupby("url")
               .aggregate(Sum("text_len", alias_name="s"),
                          Count(alias_name="c")))

    out_schema = pa.schema([("domain", pa.string()),
                            ("n_urls", pa.int64()),
                            ("mean_len", pa.float64()),
                            ("ci_lo", pa.float64()),
                            ("ci_hi", pa.float64())])

    def dom(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "domain": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "url": df["url"],
            "mu": df["s"].to_numpy(np.float64)
            / df["c"].to_numpy(np.float64)})

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d, sub in df.sort_values(["domain", "url"],
                                     kind="mergesort").groupby(
                                         "domain", sort=False):
            x = sub["mu"].to_numpy(np.float64)
            n = len(x)
            seed = int(pd.util.hash_array(
                np.asarray([d], dtype=object))[0]) & 0xFFFFFFFF
            rng = np.random.RandomState(seed)
            take = min(n, m)
            idx = rng.randint(0, n, size=(B, take))
            means = x[idx].mean(axis=1)
            lo, hi = np.quantile(means, [0.025, 0.975])
            rows.append((d, n, float(x.mean()), float(lo), float(hi)))
        out = pd.DataFrame(rows, columns=["domain", "n_urls",
                                          "mean_len", "ci_lo", "ci_hi"])
        for c in ("mean_len", "ci_lo", "ci_hi"):
            out[c] = sql_round(out[c].to_numpy(np.float64), 6) + 0.0
        out["n_urls"] = out["n_urls"].astype(np.int64)
        return out

    return partitioned_map(per_url.map_batches(dom,
                                               batch_format="pandas"),
                           kern, keys=["domain"],
                           out_schema=out_schema)


def _dgim_change_count_crawl(sf_dir: str, window: int = 64
                             ) -> rd.Dataset:
    """DGIM sliding-window bit counting (Datar–Gionis–Indyk–Motwani,
    SODA 2002) per url stream: bit_i = "text_len changed at snapshot
    i", buckets of power-of-two sizes with the ≤2-per-size merge rule,
    O(log²N) memory per stream vs O(N) for an exact window — the
    streaming-window sketch a recrawl monitor would keep per url.
    Output per url: exact change count in the last ``window``
    snapshots, the DGIM estimate (all-integer, deterministic) and the
    bucket count. Golden oracle: independent bucket-list twin."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="mergesort")
        urls_out, exact_out, est_out, nb_out = [], [], [], []
        for url, g in df.groupby("url", sort=False):
            v = g["text_len"].to_numpy(np.int64)
            bits = np.zeros(len(v), dtype=np.int64)
            bits[1:] = (v[1:] != v[:-1]).astype(np.int64)
            n = len(bits)
            buckets: list[list[int]] = []   # [timestamp, size] newest-first
            for t in range(n):
                # expire buckets fully outside the window ending at t
                while buckets and buckets[-1][0] <= t - window:
                    buckets.pop()
                if not bits[t]:
                    continue
                buckets.insert(0, [t, 1])
                # canonical cascade: three buckets of one size →
                # merge the two OLDEST (keep the newer timestamp),
                # which may create a triple at the next size up
                size = 1
                while True:
                    same = [j for j in range(len(buckets))
                            if buckets[j][1] == size]
                    if len(same) <= 2:
                        break
                    a, b = same[-2], same[-1]       # two oldest
                    buckets[a] = [buckets[a][0], size * 2]
                    del buckets[b]
                    size *= 2
            exact = int(bits[max(0, n - window):].sum())
            if buckets:
                total = sum(b[1] for b in buckets)
                est = total - buckets[-1][1] + buckets[-1][1] // 2
            else:
                est = 0
            urls_out.append(url)
            exact_out.append(exact)
            est_out.append(int(est))
            nb_out.append(len(buckets))
        return pd.DataFrame({
            "url": pd.Series(urls_out, dtype=object),
            "exact_changes": pd.Series(exact_out, dtype=np.int64),
            "dgim_estimate": pd.Series(est_out, dtype=np.int64),
            "n_buckets": pd.Series(nb_out, dtype=np.int64)})

    schema = pa.schema([("url", pa.string()),
                        ("exact_changes", pa.int64()),
                        ("dgim_estimate", pa.int64()),
                        ("n_buckets", pa.int64())])
    return partitioned_map(_obs(sf_dir), kernel, url_col="url",
                           out_schema=schema)


def _asof_latest_event(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.joins import asof_join

    left = _obs(sf_dir).select_columns(["url", "warc_ts", "text_len"])
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "value"])

    def to_url(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.string())
        site = pc.cast(pc.subtract(batch["user_id"],
                                   pc.multiply(pc.divide(batch["user_id"], 40),
                                               40)), pa.string())
        url = pc.binary_join_element_wise(
            "https://site-", site, ".example.com/u/", uid, "")
        return pa.table({"url": url, "ts": batch["ts"],
                         "value": batch["value"]})

    right = events.map_batches(to_url, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = asof_join(left, right, by="url", left_ts="warc_ts",
                    right_ts="ts", value_cols=["value"])
    # rename via map_batches: Dataset.rename_columns' Project operator
    # assumes Arrow blocks and breaks on pandas-format upstream output
    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"value": "last_event_value"})
        # the union pass upcasts int columns to float (null padding);
        # restore the declared dtype
        df["text_len"] = df["text_len"].astype(np.int64)
        return df

    return out.map_batches(fin, batch_format="pandas")


def _asof_next_event(sf_dir: str) -> rd.Dataset:
    """Forward as-of: attach the EARLIEST event at-or-after each
    snapshot (the scheduling/next-touch direction, mirror of
    asof_latest_event)."""
    from sits_classification_ray.stages.joins import asof_join

    left = _obs(sf_dir).select_columns(["url", "warc_ts", "text_len"])
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "value"])

    def to_url(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.string())
        site = pc.cast(pc.subtract(batch["user_id"],
                                   pc.multiply(pc.divide(batch["user_id"], 40),
                                               40)), pa.string())
        url = pc.binary_join_element_wise(
            "https://site-", site, ".example.com/u/", uid, "")
        return pa.table({"url": url, "ts": batch["ts"],
                         "value": batch["value"]})

    right = events.map_batches(to_url, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = asof_join(left, right, by="url", left_ts="warc_ts",
                    right_ts="ts", value_cols=["value"],
                    direction="forward")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"value": "next_event_value"})
        df["text_len"] = df["text_len"].astype(np.int64)
        return df

    return out.map_batches(fin, batch_format="pandas")


def _weighted_sample_documents(sf_dir: str) -> rd.Dataset:
    """Length-weighted 5-per-lang sample without replacement
    (Efraimidis–Spirakis exponential keys over the SipHash-derived u —
    deterministic under any partitioning; golden-checked)."""
    from sits_classification_ray.stages.sampling import weighted_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    return weighted_sample(ds, ["lang"], "doc_id", "n_chars", k=5)


def _kfold_split_documents(sf_dir: str) -> rd.Dataset:
    """Deterministic k-fold CV assignment via a Knuth multiplicative
    hash of the id — partition-invariant, seed-free, SQL-expressible
    (so the driver hash-checks it instead of a golden)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        fold = (ids * 2654435761) % 4294967296 % 5
        return pa.table({"doc_id": batch["doc_id"],
                         "fold": pa.array(fold, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def _decayed_topk_urls(sf_dir: str) -> rd.Dataset:
    """Trending urls: exponentially time-decayed snapshot counts with a
    ONE-DAY HALF-LIFE — weight 0.5^days_old is a dyadic rational, so
    per-url sums are EXACT in float64 under any partitioning/order
    (the same order-free trick as the integer cents). Per-batch
    partial decayed counts → Sum merge → combiner top-k."""
    from ray.data.aggregate import Sum

    obs = _obs(sf_dir).select_columns(["url", "warc_ts"])
    anchor = pd.Timestamp(obs.max("warc_ts")).floor("D")

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch["warc_ts"], unit="day"),
                      pa.timestamp("us"))
        days_old = ((anchor.value // 1000 - np.asarray(
            pc.cast(day, pa.int64()))) // 86_400_000_000)
        w = np.ldexp(1.0, -days_old.astype(np.int64))
        df = pd.DataFrame({"url": batch["url"].to_pandas(), "w": w})
        g = df.groupby("url", as_index=False)["w"].sum()
        return pa.Table.from_pandas(
            g.rename(columns={"w": "decayed_count"}), preserve_index=False)

    partials = obs.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    scores = partials.groupby("url").aggregate(
        Sum("decayed_count", alias_name="decayed_count"))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["decayed_count", "url"],
                              ascending=[False, True]).head(10)

    pruned = scores.map_batches(local, batch_format="pandas")
    return pruned.sort(["decayed_count", "url"],
                       descending=[True, False]).limit(10)


def _range_join_events(sf_dir: str) -> rd.Dataset:
    """Interval join: obs snapshots falling inside any [event, +6h)
    window of the same url (J1's range-join sibling)."""
    from sits_classification_ray.stages.joins import range_join

    left = _obs(sf_dir).select_columns(["url", "warc_ts", "text_len"])
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "value"])

    def to_intervals(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.string())
        site = pc.cast(pc.subtract(batch["user_id"],
                                   pc.multiply(pc.divide(batch["user_id"],
                                                         40), 40)),
                       pa.string())
        url = pc.binary_join_element_wise(
            "https://site-", site, ".example.com/u/", uid, "")
        end = pc.add(batch["ts"], pa.scalar(21_600_000_000,
                                            pa.duration("us")))
        return pa.table({"url": url, "ev_ts": batch["ts"],
                         "ev_end": pc.cast(end, pa.timestamp("us")),
                         "ev_value": batch["value"]})

    right = events.map_batches(to_intervals, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = range_join(left, right, by="url", left_ts="warc_ts",
                     right_start="ev_ts", right_end="ev_end",
                     value_cols=["ev_value"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["text_len"] = df["text_len"].astype(np.int64)  # union upcast
        return df

    return out.map_batches(fin, batch_format="pandas")


def _join_documents_embeddings(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.joins import hash_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"])
    out = hash_join(docs, emb, on="doc_id", right_on="vec_id",
                    join_type="inner", num_partitions=16)
    return out.select_columns(["doc_id", "lang", "n_chars", "label"])


def _semi_join_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.joins import semi_join_filter

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    return semi_join_filter(docs, "source", ["src1", "src3", "src5"])


def _anti_join_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.joins import anti_join_filter

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    return anti_join_filter(docs, "lang", ["en", "de"])


def _regression_metrics_embeddings(sf_dir: str) -> pd.DataFrame:
    from sits_classification_ray.stages.sampling import regression_metrics

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"])

    def pred(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pred"] = (df["vec_id"] % 10).astype(np.float64)
        df["y"] = df["label"].astype(np.float64)
        return df

    return regression_metrics(emb.map_batches(pred, batch_format="pandas"),
                              "y", "pred")


#: Stand-in classifier weights shared by the scored_* queries and
#: their SQL oracles (the affine forms are spelled out in the SQL).
_CLS_W = np.array([[0.01, -0.02, 0.0], [0.0, 0.05, -0.01]])
_CLS_B = np.array([0.0, -1.0, 0.5])


def _scored_crawl(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.scoring import LinearModel, score

    obs = _obs(sf_dir)
    model = LinearModel(weights=_CLS_W, bias=_CLS_B)
    out = score(obs, model, ["text_len", "word_count"], mode="class")
    return out.select_columns(["url", "warc_ts", "prediction"])


def _scored_proba_crawl(sf_dir: str) -> rd.Dataset:
    """Probability-mode output: the raw logit vector per row
    (reference pytorch/predict.py:527-528)."""
    from sits_classification_ray.stages.scoring import LinearModel, score

    obs = _obs(sf_dir)
    model = LinearModel(weights=_CLS_W, bias=_CLS_B)
    out = score(obs, model, ["text_len", "word_count"], mode="proba")
    return out.select_columns(["url", "warc_ts",
                               "score_0", "score_1", "score_2"])


def _scored_regression_crawl(sf_dir: str) -> rd.Dataset:
    """Regression head + inverse response normalization
    (reference pytorch/predict.py:521-525)."""
    from sits_classification_ray.stages.scoring import LinearModel, score

    obs = _obs(sf_dir)
    model = LinearModel(weights=np.array([[0.001], [0.002]]),
                        bias=np.array([0.1]))
    out = score(obs, model, ["text_len", "word_count"], mode="regression",
                inverse_norm=lambda p: p * 2.5 + 10.0)
    return out.select_columns(["url", "warc_ts", "prediction"])


def _augmented_rollup(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.augment import apply_augmentations

    aug = apply_augmentations(_obs_long(sf_dir),
                              ["drop_observations", "scale_gain"], seed=7)
    return finalize(rollup(aug, TIER_SECONDS["daily"], CFG)).select_columns(
        ["url", "metric", "bucket_ts", "count"])


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def _repetition_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import repetition

    return repetition(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"]))


def _bloom_semi_join_documents(sf_dir: str) -> rd.Dataset:
    """Semi-join via a 128 KiB mergeable Bloom filter instead of a
    driver-held key set (the 10^9-key right-side path; deterministic
    spec, golden-checked FPs included)."""
    from sits_classification_ray.stages.joins import bloom_semi_join

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"])
    keys = emb.filter(expr="label <= 3").select_columns(["vec_id"])
    return bloom_semi_join(docs, "doc_id", keys, "vec_id")


def _clean_corpus_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import clean_corpus

    return clean_corpus(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                        columns=["doc_id", "text"]))


def _simhash_drift_crawl(sf_dir: str) -> rd.Dataset:
    """Per-url content drift between consecutive snapshots (crawl
    change detection): simhash per snapshot in an actor pool, then only
    (url, ts, len, sim) rows shuffle to the per-url hamming kernel."""
    from sits_classification_ray.stages.dedup_docs import simhash_drift

    ext = extract(crawl_from_tables(sf_dir), CFG, keep_text=True)
    return simhash_drift(
        ext.select_columns(["url", "warc_ts", "text_len", "text"]))


def _cdc_dedup_ratio_crawl(sf_dir: str) -> rd.Dataset:
    """Content-defined-chunking storage dedup (gear-hash CDC, the
    FastCDC/LBFS family): chunk every snapshot at rolling-hash
    boundaries (which REALIGN after insertions, unlike fixed blocks)
    and measure each snapshot's byte overlap with its predecessor —
    the archive-storage dedup ratio a crawl store plans capacity
    with. Rolling hash vectorized as 64 shifted adds (exactly the
    scalar recurrence mod 2^64); one salted exchange on url
    (stages/cdc.py; golden twin runs the scalar recurrence)."""
    from sits_classification_ray.stages.cdc import cdc_dedup_ratio

    ds = crawl_from_tables(sf_dir).select_columns(
        ["url", "warc_ts", "html"])
    return cdc_dedup_ratio(ds)


def _rouge_overlap_crawl(sf_dir: str) -> rd.Dataset:
    """ROUGE-1 unigram precision/recall between consecutive snapshots
    of each url — the summarization-metric view of content drift
    (multiset token overlap), complementing simhash_drift's bitwise
    view. Token = string_split(text, ' ') with empties kept (the SQL
    twin's semantics); per-url kernel after one salted exchange;
    dedup per (url, warc_ts) is first-wins with text as the final
    tie-break so both sides pick the identical snapshot."""
    from collections import Counter

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    ext = extract(crawl_from_tables(sf_dir), CFG, keep_text=True) \
        .select_columns(["url", "warc_ts", "lang", "text", "text_len",
                         "word_count"])

    out_schema = pa.schema([("url", pa.string()),
                            ("warc_ts", pa.timestamp("us")),
                            ("rouge1_p", pa.float64()),
                            ("rouge1_r", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts", "text_len",
                             "word_count", "lang", "text"],
                            kind="mergesort") \
            .drop_duplicates(["url", "warc_ts"], keep="first")
        urls, tss, ps, rs = [], [], [], []
        for url, g in df.groupby("url", sort=False):
            toks = [t.split(" ") for t in g["text"]]
            tsv = g["warc_ts"].to_numpy()
            prev_cnt = None
            for i, cur in enumerate(toks):
                cnt = Counter(cur)
                if prev_cnt is not None:
                    inter = sum(min(c, prev_cnt[t])
                                for t, c in cnt.items()
                                if t in prev_cnt)
                    urls.append(url)
                    tss.append(tsv[i])
                    ps.append(inter / float(len(cur)))
                    rs.append(inter / float(len(toks[i - 1])))
                prev_cnt = cnt
        return pd.DataFrame({
            "url": pd.Series(urls, dtype=object),
            "warc_ts": pd.Series(np.asarray(tss,
                                            dtype="datetime64[us]")),
            "rouge1_p": sql_round(np.asarray(ps, np.float64), 6) + 0.0,
            "rouge1_r": sql_round(np.asarray(rs, np.float64), 6) + 0.0})

    return partitioned_map(ext, kern, url_col="url",
                           out_schema=out_schema)


#: dictionary for the Aho-Corasick scan — all patterns are
#: border-free (no proper prefix == suffix), so overlapping and
#: non-overlapping occurrence counts coincide and the SQL
#: replace-length twin is exact.
_AC_PATTERNS = ("the", "with", "from", "your", "search", "data",
                "online", "home", "page", "free")


def _word_dispersion_documents(sf_dir: str, n_parts: int = 10,
                               topk: int = 50) -> rd.Dataset:
    """Gries' deviation-of-proportions (DP) lexical dispersion for the
    top-50 corpus words: is a word spread evenly across corpus parts
    or clumped in a few (burstiness — the signal raw frequency
    hides)? Exact integer arithmetic: DP = ½·Σ|cᵢ·T − sᵢ·F| / (F·T)
    over doc_id%10 parts, one float division at the end. Distributed:
    token-count combiner groupby, distributed top-k (sort+limit) for
    the word list, broadcast membership filter — only top-word count
    rows shuffle. SQL twin mirrors the integer formula."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def tok(df: pd.DataFrame) -> pd.DataFrame:
        parts, words = [], []
        for did, t in zip(df["doc_id"], df["text"]):
            p = int(did) % n_parts
            for w in (t or "").split(" "):
                if w:
                    parts.append(p)
                    words.append(w)
        return (pd.DataFrame({"part": np.asarray(parts, np.int64),
                              "word": pd.Series(words, dtype=object)})
                .groupby(["word", "part"]).size().rename("c")
                .reset_index())

    cnt = (docs.map_batches(tok, batch_format="pandas")
           .groupby(["word", "part"])
           .aggregate(Sum("c", alias_name="c"))).materialize()

    totw = cnt.groupby("word").aggregate(Sum("c", alias_name="F"))
    top = totw.sort(["F", "word"], descending=[True, False]) \
        .limit(topk).to_pandas()
    fmap = dict(zip(top["word"], top["F"].astype(np.int64)))
    parts_tot = (cnt.groupby("part")
                 .aggregate(Sum("c", alias_name="s")).to_pandas()
                 .sort_values("part", ignore_index=True))
    s_by_part = parts_tot["s"].to_numpy(np.int64)
    T = int(s_by_part.sum())
    keep = ray.put(fmap)

    def flt(b: pa.Table) -> pa.Table:
        fm = ray.get(keep)
        mask = np.asarray([w in fm
                           for w in b["word"].to_pylist()])
        return b.filter(pa.array(mask))

    out_schema = pa.schema([("word", pa.string()),
                            ("dp", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        fm = ray.get(keep)
        rows = []
        for w, g in df.groupby("word", sort=True):
            F = int(fm[w])
            c = np.zeros(n_parts, np.int64)
            c[g["part"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
            num = int(np.abs(c * T - s_by_part * F).sum())
            rows.append((w, 0.5 * num / (float(F) * float(T))))
        out = pd.DataFrame(rows, columns=["word", "dp"])
        out["dp"] = sql_round(out["dp"].to_numpy(np.float64), 6) + 0.0
        return out

    return partitioned_map(
        cnt.map_batches(flt, batch_format="pyarrow",
                        zero_copy_batch=True),
        kern, keys=["word"], out_schema=out_schema)


def _dictionary_scan_documents(sf_dir: str) -> rd.Dataset:
    """Aho-Corasick multi-pattern dictionary scan (CACM 1975): the
    automaton compiles once per actor and every document streams
    through in ONE pass regardless of dictionary size — vs per-pattern
    regex scans that cost O(patterns × text). Corpus-wide totals via
    per-batch partial count vectors + a |patterns|-row groupby (the
    corpus never shuffles). SQL twin: replace-length occurrence
    counting per pattern."""
    from sits_classification_ray.stages.textstats import dictionary_scan

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return dictionary_scan(ds, _AC_PATTERNS)


def _tfidf_top3_documents(sf_dir: str) -> rd.Dataset:
    from sits_classification_ray.stages.textstats import tfidf_topk

    return tfidf_topk(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "text"]), k=3)


def _quantiles_daily_crawl(sf_dir: str) -> rd.Dataset:
    """Exact per-(url, day) quantiles of text_len: co-locate complete
    urls via the salted shuffle, one vectorized pandas groupby-quantile
    per partition block. Group payloads are bounded by a url's
    snapshots per day, so exactness is affordable here — the
    unbounded-bucket path is hist_quantile_daily."""
    from sits_classification_ray.stages.shuffle import partitioned_map

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="day"),
                                 pa.timestamp("us")),
            "text_len": batch["text_len"],
        })

    proj_ds = _obs(sf_dir).map_batches(proj, batch_format="pyarrow",
                                       zero_copy_batch=True)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["url", "bucket_ts"], sort=False)["text_len"]
        out = g.size().rename("n").reset_index()
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            out[name] = g.quantile(q).round(6).to_numpy()
        out["n"] = out["n"].astype(np.int64)
        return out

    return partitioned_map(proj_ds, kernel, keys=["url"])


def _kmv_distinct_urls_daily(sf_dir: str) -> rd.Dataset:
    """Distinct urls per day via the KMV bottom-k hash sketch (the
    sample-bearing alternative to HLL; golden-checked — KMV's
    union-then-k-smallest merge is order-insensitive)."""
    from sits_classification_ray.functions.sketches import kmv_distinct

    def day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="day"),
                                 pa.timestamp("us")),
        })

    obs_days = _obs(sf_dir).map_batches(day, batch_format="pyarrow",
                                        zero_copy_batch=True)
    return kmv_distinct(obs_days, key_col="url", bucket_col="bucket_ts")


def _hist_quantile_daily(sf_dir: str) -> rd.Dataset:
    """Approximate global text_len quantiles per day via the mergeable
    fixed-bin histogram sketch (the 10^12-row path; golden-checked
    against an independent sequential implementation)."""
    from sits_classification_ray.functions.sketches import hist_quantile

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="day"),
                                 pa.timestamp("us")),
            "text_len": batch["text_len"],
        })

    proj_ds = _obs(sf_dir).map_batches(proj, batch_format="pyarrow",
                                       zero_copy_batch=True)
    return hist_quantile(proj_ds, value_col="text_len",
                         bucket_col="bucket_ts")


def _tuned(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    """Apply cluster-sized shuffle settings before building datasets
    (DataContext is captured at Dataset creation time)."""

    def wrapper(sf_dir: str):
        import sits_classification_ray as scr

        scr.tune_for_cluster()
        return fn(sf_dir)

    return wrapper


def _domain_edges_crawl(sf_dir: str) -> rd.Dataset:
    """Weighted domain link graph from the regex-extracted anchors:
    (src_domain, dst_domain, n) after an exact global groupby.
    Materialized because every iterative graph consumer (PageRank,
    HITS, components) re-reads the edge table per round — concurrent
    actor-pool re-executions of the upstream extraction deadlock small
    clusters (see stages/joins.py hash_join clamp for the same
    failure mode)."""
    from ray.data.aggregate import Sum

    links = _extract_links_crawl(sf_dir)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({
            "w1": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "w2": df["href"].str.extract(_DOMAIN_RE, expand=False)})
            .groupby(["w1", "w2"], sort=False).size()
            .rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g

    return (links.map_batches(edges, batch_format="pandas")
            .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
            .materialize())


def _pagerank_domains_crawl(sf_dir: str) -> rd.Dataset:
    """PageRank over the domain link graph: the web-corpus authority
    signal (domain-level curation weight). Edges are aggregated with
    an exact global groupby BEFORE the power iteration — the golden
    twin aggregates identically, which keeps every float sum
    order-identical under the graph.pagerank determinism contract."""
    from sits_classification_ray.stages.graph import pagerank

    return pagerank(_domain_edges_crawl(sf_dir))


def _ppr_domains_crawl(sf_dir: str) -> rd.Dataset:
    """Personalized PageRank (Haveliwala 2002 topic-sensitive
    variant): restart mass concentrated on a deterministic seed set —
    the 3 lexicographically smallest domains — so rank measures
    proximity to the seeds rather than global authority (the
    crawl-frontier expansion signal: which domains are reachable-
    important FROM the seeds). Same distributed power iteration and
    determinism contract as pagerank_domains_crawl; golden twin
    mirrors the restart vector."""
    from sits_classification_ray.stages.graph import pagerank

    from ray.data.aggregate import Count

    edges = _domain_edges_crawl(sf_dir).materialize()

    def nodes_of(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": pd.concat([df["w1"], df["w2"]], ignore_index=True)})

    # distributed min-3: dedup + sort + limit — only 3 rows reach the
    # driver no matter the domain cardinality
    nodes = (edges.map_batches(nodes_of, batch_format="pandas")
             .groupby("node").aggregate(Count(alias_name="_c")))
    seeds = frozenset(r["node"]
                      for r in nodes.sort("node").limit(3).take(3))
    return pagerank(edges, personalization=seeds)


def _wl_colors_crawl(sf_dir: str) -> rd.Dataset:
    """Weisfeiler-Lehman (1-WL) color refinement over the domain
    graph: 3 rounds of rehashing (own color, sorted out-neighbor
    color multiset) — structural-role fingerprints that separate
    nodes degree and PageRank cannot (the graph-kernel primitive).
    Each round is one tag-union attach of the color vector onto the
    edges + one keyed reduce (stages/graph.py:wl_refinement); golden
    twin replicates the signature hashing exactly."""
    from sits_classification_ray.stages.graph import wl_refinement

    return wl_refinement(_domain_edges_crawl(sf_dir))


def _deepwalk_visits_crawl(sf_dir: str) -> rd.Dataset:
    """Derandomized DeepWalk sampling over the domain graph: 4 walks
    × 8 steps per start node, neighbor picks keyed by
    splitmix64(siphash(start|walk)·φ + step) over sorted adjacency —
    the node-frequency profile skip-gram embedding training consumes,
    fully deterministic for the golden twin (stages/graph.py)."""
    from sits_classification_ray.stages.graph import deepwalk_visits

    return deepwalk_visits(_domain_edges_crawl(sf_dir))


def _betweenness_domains_crawl(sf_dir: str) -> rd.Dataset:
    """Brandes betweenness centrality over the domain link graph —
    the broker/chokepoint signal PageRank and HITS both miss (a
    domain can have middling rank yet sit on every shortest path
    between communities). One BFS + dependency pass per source node
    fanned out as Ray tasks with the adjacency broadcast once;
    per-(node, source) dependencies reduce in one keyed exchange
    under the sorted-sum contract (golden twin: independent Brandes
    loop with the same canonical neighbor order)."""
    from sits_classification_ray.stages.graph import betweenness

    return betweenness(_domain_edges_crawl(sf_dir))


def _hits_domains_crawl(sf_dir: str) -> rd.Dataset:
    """HITS hubs/authorities over the domain link graph — the
    complementary authority signal to PageRank (a domain can be a pure
    hub: many outgoing anchors, no incoming). Max-normalized variant
    (see stages/graph.py:hits) so every iteration is an order-free
    distributed reduction; golden twin mirrors it bit-exactly."""
    from sits_classification_ray.stages.graph import hits

    return hits(_domain_edges_crawl(sf_dir))


def _domain_components_crawl(sf_dir: str) -> rd.Dataset:
    """Weakly-connected components of the domain link graph: each
    domain labeled with the lexicographically smallest domain in its
    component — the crawl-frontier partitioning signal (components can
    be sharded independently). SQL twin: recursive CTE label
    propagation over the symmetrized edge set."""
    from sits_classification_ray.stages.graph import components

    return components(_domain_edges_crawl(sf_dir)).sort("node")


def _link_degree_crawl(sf_dir: str) -> rd.Dataset:
    """Link-graph degree table per domain: total + distinct out-links
    and in-links — the fan-out/fan-in profile that sizes the
    link-graph shuffles. Two two-level groupbys (exact distinct under
    any batching) + one full outer hash join on the domain key."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.stages.joins import hash_join

    links = _extract_links_crawl(sf_dir)

    def doms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "dst": df["href"].str.extract(_DOMAIN_RE, expand=False)})

    pairs = links.map_batches(doms, batch_format="pandas")
    per_pair = (pairs.groupby(["src", "dst"])
                .aggregate(Count(alias_name="n")))

    # tagged union instead of a full-outer join: each (src,dst,n)
    # pair contributes one out-row and one in-row, a single groupby
    # sums all four degree columns — no join, no null-fill
    def both_sides(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        one = np.ones(len(df), np.int64)
        zero = np.zeros(len(df), np.int64)
        out_rows = pd.DataFrame({
            "domain": df["src"], "out_links": n, "out_domains": one,
            "in_links": zero, "in_domains": zero})
        in_rows = pd.DataFrame({
            "domain": df["dst"], "out_links": zero, "out_domains": zero,
            "in_links": n, "in_domains": one})
        return pd.concat([out_rows, in_rows], ignore_index=True)

    return (per_pair.map_batches(both_sides, batch_format="pandas")
            .groupby("domain")
            .aggregate(Sum("out_links", alias_name="out_links"),
                       Sum("out_domains", alias_name="out_domains"),
                       Sum("in_links", alias_name="in_links"),
                       Sum("in_domains", alias_name="in_domains")))


def _hybrid_rrf_documents(sf_dir: str, k_fused: int = 20,
                          k_each: int = 50, c: int = 60) -> pd.DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    2009): fuse the BM25 lexical ranking with the dense cosine
    ranking (query = vec 0's embedding), score = Σ 1/(c + rank).

    Both underlying rankers are the engine's existing distributed
    top-k operators (each ships ≤ k rows to the driver); the fusion
    itself is driver-side over 2×k rows. Ranks derive from the
    ROUNDED scores with (score desc, id asc) tie-break in both the
    engine and the SQL oracle, so the fused ordering is
    deterministic and hash-comparable."""
    from sits_classification_ray.stages.similarity import brute_force_topk
    from sits_classification_ray.stages.textstats import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    lex = bm25_topk(docs, _BM25_TERMS, k=k_each).to_pandas()
    lex = lex.sort_values(["score", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    lex["rank_lex"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id == 0").take_all()
    qvec = np.asarray(qrows[0]["embedding"], dtype=np.float64)
    dense = brute_force_topk(emb, {0: qvec}, k=k_each)
    dense = dense.sort_values(["score", "vec_id"],
                              ascending=[False, True]
                              ).reset_index(drop=True)
    dense["rank_dense"] = np.arange(1, len(dense) + 1, dtype=np.int64)

    fused = pd.merge(lex[["doc_id", "rank_lex"]],
                     dense[["vec_id", "rank_dense"]].rename(
                         columns={"vec_id": "doc_id"}),
                     on="doc_id", how="outer")
    fused["rank_lex"] = fused["rank_lex"].fillna(0).astype(np.int64)
    fused["rank_dense"] = fused["rank_dense"].fillna(0).astype(np.int64)
    r1 = fused["rank_lex"].to_numpy(np.float64)
    r2 = fused["rank_dense"].to_numpy(np.float64)
    # lexical term first, then dense — same association as the oracle
    fused["rrf_score"] = np.round(
        np.where(r1 > 0, 1.0 / (c + r1), 0.0)
        + np.where(r2 > 0, 1.0 / (c + r2), 0.0), 6)
    fused = fused.sort_values(["rrf_score", "doc_id"],
                              ascending=[False, True]
                              ).head(k_fused).reset_index(drop=True)
    return fused[["doc_id", "rank_lex", "rank_dense", "rrf_score"]]


def _cms_heavy_domains_crawl(sf_dir: str) -> pd.DataFrame:
    """Count-Min + CountSketch point estimates for the exact φ-heavy
    domains — the bounded-memory frequency primitive (tables are
    fixed 4×2048 int64 arrays regardless of key cardinality), with
    the exact count beside each estimate so the CMS ≥ exact guarantee
    is oracle-checked (golden: independent sequential twin)."""
    from sits_classification_ray.functions.sketches import (
        freq_sketch_estimates)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dom": df["url"].str.extract(_DOMAIN_RE, expand=False)})

    doms = _obs(sf_dir).map_batches(proj, batch_format="pandas")
    out = freq_sketch_estimates(doms, "dom", k=60)
    return out


def _kmv_overlap_weeks(sf_dir: str) -> pd.DataFrame:
    """Week-over-week url-set overlap (jaccard / intersection / union
    estimates) from per-week bottom-k signatures — set operations on
    KMV sketches, exchanging one ≤ 2 KiB signature per week instead
    of rescanning keys (golden: independent sequential KMV)."""
    from sits_classification_ray.functions.sketches import kmv_overlap

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "bucket_ts": pc.cast(pc.floor_temporal(batch["warc_ts"],
                                                   unit="week"),
                                 pa.timestamp("us")),
        })

    obs_weeks = _obs(sf_dir).map_batches(proj, batch_format="pyarrow",
                                         zero_copy_batch=True)
    return kmv_overlap(obs_weeks, key_col="url", bucket_col="bucket_ts")


def _welch_ttest_crawl(sf_dir: str) -> rd.Dataset:
    """Welch's t-test per metric between month-halves of the daily
    means (SQL conditional-aggregation twin)."""
    from sits_classification_ray.stages.stats_tests import welch_ttest

    return welch_ttest(_obs_long(sf_dir))


def _mannwhitney_crawl(sf_dir: str) -> rd.Dataset:
    """Mann-Whitney U per metric between month-halves — distributed
    tie-aware rank-sum via the value-count prefix scan (SQL
    average-rank window twin)."""
    from sits_classification_ray.stages.stats_tests import mann_whitney

    return mann_whitney(_obs_long(sf_dir))


def _ks_test_crawl(sf_dir: str) -> rd.Dataset:
    """Two-sample Kolmogorov-Smirnov per metric between month-halves
    — blockwise CDF scan (SQL cumulative-window twin)."""
    from sits_classification_ray.stages.stats_tests import ks_two_sample

    return ks_two_sample(_obs_long(sf_dir))


def _chi2_lang_weekly(sf_dir: str) -> rd.Dataset:
    """Chi-square independence cells for lang × ISO-week over crawl
    snapshots (SQL marginal-window twin)."""
    from sits_classification_ray.stages.stats_tests import (
        chi2_independence)

    return chi2_independence(
        _obs(sf_dir).select_columns(["lang", "warc_ts"]))


def _kcenter_select_embeddings(sf_dir: str) -> pd.DataFrame:
    """Greedy k-center coreset selection over the embedding corpus —
    k maximally diverse exemplars + the coverage-radius curve
    (golden twin)."""
    from sits_classification_ray.stages.curation import kcenter_select

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return kcenter_select(emb, k=16)


def _gbdt_fit_embeddings(sf_dir: str) -> pd.DataFrame:
    """Histogram-based gradient-boosted stumps over the embedding
    corpus (LightGBM shape): global-edge binning, one bounded
    (feature × bin) int64 micro-unit histogram per block per round,
    driver-side split scan. Bit-deterministic under any block layout
    (golden twin)."""
    from sits_classification_ray.stages.gbdt import gbdt_fit

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"])
    return gbdt_fit(ds, n_rounds=8, n_bins=16, learning_rate=0.5)


def _conformal_intervals_crawl(sf_dir: str) -> rd.Dataset:
    """Split-conformal 90% intervals around the regression scorer:
    calibration fold by Knuth hash of epoch seconds, exact
    order-statistic half-width in integer micro-units (SQL twin)."""
    from sits_classification_ray.stages.scoring import conformal_intervals

    from sits_classification_ray.functions.transforms import sql_round

    def prep(batch: pa.Table) -> pa.Table:
        tl = batch["text_len"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        wc = batch["word_count"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = ~((tl == 0) & (wc == 0))
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[s]").astype(np.int64)
        fold = (ts * 2654435761) % 4294967296 % 5
        pred = sql_round((0.1 + wc * 0.002) * 2.5 + 10.0, 6) + 0.0
        return pa.table({
            "url": batch["url"], "warc_ts": batch["warc_ts"],
            "y": pa.array(tl.astype(np.float64)),
            "pred": pa.array(pred),
            "fold": pa.array(fold, pa.int64())}).filter(pa.array(keep))

    prepped = _obs(sf_dir).map_batches(prep, batch_format="pyarrow",
                                       zero_copy_batch=True)
    out = conformal_intervals(prepped, pred_col="pred", y_col="y",
                              fold_col="fold")
    return out.select_columns(["url", "warc_ts", "pred", "lo", "hi"])


def _forecast_backtest_crawl(sf_dir: str) -> rd.Dataset:
    """Rolling-origin one-step Holt backtest per series: MAE/RMSE and
    Hyndman-Koehler MASE vs the naive forecaster (golden twin)."""
    from sits_classification_ray.stages.windows import forecast_backtest

    return forecast_backtest(_obs_long(sf_dir))


def _mahalanobis_embeddings(sf_dir: str) -> rd.Dataset:
    """Mahalanobis outlier scores over the embedding corpus: moment
    pass + driver d×d inverse + broadcast quadratic form (golden
    twin on the shared determinism contract)."""
    from sits_classification_ray.stages.similarity import (
        mahalanobis_scores)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return mahalanobis_scores(emb)


def _adamic_adar_crawl(sf_dir: str) -> rd.Dataset:
    """Adamic-Adar link prediction over the domain graph: top
    non-adjacent pairs by common-neighbour weight (integer micro-nats;
    SQL wedge self-join twin)."""
    from sits_classification_ray.stages.graph import adamic_adar

    return adamic_adar(_domain_edges_crawl(sf_dir), k=100)


def _kneser_ney_bigrams_documents(sf_dir: str) -> rd.Dataset:
    """Interpolated Kneser-Ney bigram probabilities for the top-100
    corpus bigrams: distinct-continuation stats attached via tag-union
    exchanges (no driver-held vocabulary)."""
    from sits_classification_ray.stages.textstats import \
        kneser_ney_bigrams

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return kneser_ney_bigrams(docs, k=100)


def _item_lift_events(sf_dir: str, min_co: int = 3,
                      k: int = 20) -> rd.Dataset:
    """Item–item lift over user engagement sets (the market-basket
    complement of user_jaccard_events, on the item side): pairs
    expand inside one user-keyed exchange (a user's item set is
    bounded), co-occurrence counts merge as exact integers, and
    lift = c_ab·N / (c_a·c_b) divides exact ints. Top-k by
    (lift DESC, i1, i2) (SQL-checked)."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.als import ratings_from_events
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value",
                                  "props"])
    ui = (ratings_from_events(ev)
          .map_batches(lambda df: df[["user", "item"]],
                       batch_format="pandas").materialize())
    n_users = int(ui.groupby("user")
                  .aggregate(Count(alias_name="_c")).count())
    # item marginals: bounded vocabulary (the ALS assumption)
    ic = ui.groupby("item").aggregate(Count(alias_name="c")) \
        .to_pandas().sort_values("item", ignore_index=True)
    keys = ray.put((ic["item"].to_numpy(np.int64),
                    ic["c"].to_numpy(np.int64)))

    pair_schema = pa.schema([("i1", pa.int64()), ("i2", pa.int64()),
                             ("co", pa.int64())])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user", "item"], kind="mergesort")
        a, b = [], []
        for _, sub in df.groupby("user", sort=False):
            it = sub["item"].to_numpy(np.int64)
            if len(it) < 2:
                continue
            iu, ju = np.triu_indices(len(it), k=1)
            a.append(it[iu])
            b.append(it[ju])
        if not a:
            return pd.DataFrame({
                "i1": pd.Series([], dtype=np.int64),
                "i2": pd.Series([], dtype=np.int64),
                "co": pd.Series([], dtype=np.int64)})
        out = pd.DataFrame({"i1": np.concatenate(a),
                            "i2": np.concatenate(b)})
        out["co"] = np.int64(1)
        return out.groupby(["i1", "i2"], sort=False,
                           as_index=False).sum()

    pairs = (partitioned_map(ui, expand, keys=["user"],
                             out_schema=pair_schema)
             .groupby(["i1", "i2"]).aggregate(Sum("co",
                                                  alias_name="co"))
             .filter(expr=f"co >= {min_co}"))

    class Lift:
        def __init__(self):
            self.items, self.c = ray.get(keys)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            p1 = np.searchsorted(self.items,
                                 df["i1"].to_numpy(np.int64))
            p2 = np.searchsorted(self.items,
                                 df["i2"].to_numpy(np.int64))
            co = df["co"].to_numpy(np.int64)
            lift = (co * n_users).astype(np.float64) \
                / (self.c[p1] * self.c[p2]).astype(np.float64)
            out = df[["i1", "i2", "co"]].copy(deep=False)
            out["lift"] = sql_round(lift, 6) + 0.0
            out["_g"] = np.int64(0)
            out["_tie"] = (df["i1"].to_numpy(np.int64) * (2 ** 31)
                           + df["i2"].to_numpy(np.int64))
            return out

    from sits_classification_ray.stages.sampling import top_k_per_group

    top = top_k_per_group(
        pairs.map_batches(Lift, batch_format="pandas",
                          concurrency=(1, 4), num_cpus=1),
        ["_g"], "lift", k=k, ascending=False, tie_col="_tie")
    out = top.to_pandas().sort_values(
        ["lift", "i1", "i2"], ascending=[False, True, True],
        kind="mergesort", ignore_index=True).head(k)
    return rd.from_pandas(out[["i1", "i2", "co", "lift"]])


def _haar_energy_crawl(sf_dir: str, T: int = 32) -> rd.Dataset:
    """Haar wavelet energy signature per url: the 32-day daily
    text-volume window from each url's first crawl day decomposes
    into 5 detail levels; per-level energy separates fast-churning
    pages (level-1 heavy) from slow drifters (coarse-level heavy).
    Every coefficient is a dyadic rational of integer daily sums, so
    the whole transform is EXACT in float64 — no ordering contract
    needed (golden)."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.shuffle import partitioned_map

    day_us = 86_400_000_000

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        us = df["warc_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({"url": df["url"],
                             "day": us // day_us,
                             "x": df["text_len"].astype(np.int64)})

    daily = (_obs(sf_dir).map_batches(proj, batch_format="pandas")
             .groupby(["url", "day"]).aggregate(Sum("x",
                                                    alias_name="x")))

    out_schema = pa.schema([("url", pa.string()),
                            ("level", pa.int64()),
                            ("energy", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "day"], kind="mergesort")
        urls, lvls, ens = [], [], []
        for u, sub in df.groupby("url", sort=False):
            d = sub["day"].to_numpy(np.int64)
            x = sub["x"].to_numpy(np.float64)
            series = np.zeros(T)
            off = d - d[0]
            m = off < T
            series[off[m]] = x[m]
            cur = series
            for lvl in range(1, 6):
                detail = (cur[0::2] - cur[1::2]) / 2.0
                cur = (cur[0::2] + cur[1::2]) / 2.0
                urls.append(u)
                lvls.append(lvl)
                ens.append(float((detail * detail).sum()))
        return pd.DataFrame({
            "url": np.array(urls, dtype=object),
            "level": np.array(lvls, dtype=np.int64),
            "energy": np.array(ens, dtype=np.float64)})

    return partitioned_map(daily, kern, keys=["url"],
                           out_schema=out_schema)


def _ar1_halflife_crawl(sf_dir: str, min_pairs: int = 8) -> rd.Dataset:
    """AR(1) mean-reversion fit per url over its daily text-volume
    series: phi from the consecutive-day lag regression and the
    implied mean-reversion half-life ln(.5)/ln(phi) — the recrawl-
    scheduling signal for how fast a page's churn decays. All
    regression sums are exact integers (daily sums of an integer
    metric), so the cross-partition merge is order-free and only the
    final two divisions are float (SQL-checked)."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    day_us = 86_400_000_000

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        us = df["warc_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({"url": df["url"],
                             "day": (us // day_us) * day_us,
                             "x": df["text_len"].astype(np.int64)})

    daily = (_obs(sf_dir).map_batches(proj, batch_format="pandas")
             .groupby(["url", "day"]).aggregate(Sum("x",
                                                    alias_name="x")))

    out_schema = pa.schema([("url", pa.string()),
                            ("n_pairs", pa.int64()),
                            ("phi", pa.float64()),
                            ("halflife_days", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "day"], kind="mergesort")
        urls, ns, phis, hls = [], [], [], []
        for u, sub in df.groupby("url", sort=False):
            d = sub["day"].to_numpy(np.int64)
            x = sub["x"].to_numpy(np.int64)
            consec = (d[1:] - d[:-1]) == day_us
            px, cx = x[:-1][consec], x[1:][consec]
            n = len(px)
            if n < min_pairs:
                continue
            sx, sy = int(px.sum()), int(cx.sum())
            sxy, sxx = int((px * cx).sum()), int((px * px).sum())
            den = n * sxx - sx * sx
            if den == 0:
                continue
            phi = float(n * sxy - sx * sy) / float(den)
            hl = np.log(0.5) / np.log(phi) \
                if 0.0 < phi < 1.0 else np.nan
            urls.append(u)
            ns.append(n)
            phis.append(float(sql_round(np.float64(phi), 6)) + 0.0)
            hls.append(float(sql_round(np.float64(hl), 6)) + 0.0
                       if np.isfinite(hl) else np.nan)
        return pd.DataFrame({
            "url": np.array(urls, dtype=object),
            "n_pairs": np.array(ns, dtype=np.int64),
            "phi": np.array(phis, dtype=np.float64),
            "halflife_days": np.array(hls, dtype=np.float64)})

    return partitioned_map(daily, kern, keys=["url"],
                           out_schema=out_schema)


def _user_jaccard_events(sf_dir: str, cap: int = 512,
                         min_shared: int = 2, k: int = 50) -> rd.Dataset:
    """User–user Jaccard co-engagement (the neighborhood-CF
    complement of als_recommend_events): candidate pairs come only
    from items with ≤ cap engaged users — the df-capped blocking
    every all-pairs similarity uses at scale — then exact distinct
    counts. One item-keyed exchange expands bounded pairs, integer
    combiners merge them, and user set sizes attach by tag-union
    exchanges on each side of the pair (SQL-checked)."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.als import ratings_from_events
    from sits_classification_ray.stages.sampling import top_k_per_group
    from sits_classification_ray.stages.shuffle import partitioned_map

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value",
                                  "props"])
    ui = (ratings_from_events(ev)
          .map_batches(lambda df: df[["user", "item"]],
                       batch_format="pandas").materialize())
    icnt = ui.groupby("item").aggregate(Count(alias_name="c")) \
        .to_pandas()                      # bounded item vocabulary
    capped = set(icnt.loc[icnt["c"] <= cap, "item"].tolist())
    cap_ref = ray.put(np.array(sorted(capped), dtype=np.int64))

    class InCap:
        def __init__(self):
            self.keys = ray.get(cap_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            item = b["item"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, item)
            ok = (pos < len(self.keys)) & \
                (self.keys[np.clip(pos, 0, len(self.keys) - 1)] == item)
            return b.filter(pa.array(ok))

    cui = ui.map_batches(InCap, batch_format="pyarrow",
                         concurrency=(1, 8), num_cpus=1).materialize()

    sizes = cui.groupby("user").aggregate(Count(alias_name="nu"))

    pair_schema = pa.schema([("u1", pa.int64()), ("u2", pa.int64()),
                             ("shared", pa.int64())])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["item", "user"], kind="mergesort")
        u1s, u2s = [], []
        for _, sub in df.groupby("item", sort=False):
            u = sub["user"].to_numpy(np.int64)
            if len(u) < 2:
                continue
            iu, ju = np.triu_indices(len(u), k=1)
            u1s.append(u[iu])
            u2s.append(u[ju])
        if not u1s:
            return pd.DataFrame({
                "u1": pd.Series([], dtype=np.int64),
                "u2": pd.Series([], dtype=np.int64),
                "shared": pd.Series([], dtype=np.int64)})
        out = pd.DataFrame({"u1": np.concatenate(u1s),
                            "u2": np.concatenate(u2s)})
        out["shared"] = np.int64(1)
        return (out.groupby(["u1", "u2"], sort=False, as_index=False)
                .sum())

    pairs = (partitioned_map(cui, expand, keys=["item"],
                             out_schema=pair_schema)
             .groupby(["u1", "u2"])
             .aggregate(Sum("shared", alias_name="shared"))
             .filter(expr=f"shared >= {min_shared}"))

    def attach_size(pds: rd.Dataset, side: str, out_col: str
                    ) -> rd.Dataset:
        def tag_p(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy(deep=False)
            out["__n"] = np.int64(-1)
            return out

        cols = pds.columns()

        def tag_s(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: np.full(len(df), -1, dtype=np.int64)
                                for c in cols})
            out[side] = df["user"].to_numpy(np.int64)
            out["__n"] = df["nu"].to_numpy(np.int64)
            return out

        un = pds.map_batches(tag_p, batch_format="pandas").union(
            sizes.map_batches(tag_s, batch_format="pandas"))

        def kern(df: pd.DataFrame) -> pd.DataFrame:
            s = df[df["__n"] >= 0].sort_values(side, kind="mergesort")
            rows = df[df["__n"] < 0]
            pos = np.searchsorted(s[side].to_numpy(np.int64),
                                  rows[side].to_numpy(np.int64))
            out = rows.drop(columns=["__n"]).copy(deep=False)
            out[out_col] = s["__n"].to_numpy(np.int64)[pos]
            return out

        return partitioned_map(un, kern, keys=[side])

    enriched = attach_size(attach_size(pairs, "u1", "na"), "u2", "nb")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        sh = df["shared"].to_numpy(np.float64)
        na = df["na"].to_numpy(np.float64)
        nb = df["nb"].to_numpy(np.float64)
        out = df[["u1", "u2", "shared"]].copy(deep=False)
        out["jaccard"] = sql_round(sh / (na + nb - sh), 6) + 0.0
        out["_g"] = np.int64(0)
        # composite tie: (u1, u2) as one int64 — reproduces SQL
        # ORDER BY jaccard DESC, u1, u2 through the single tie col
        out["_tie"] = (df["u1"].to_numpy(np.int64) * (2 ** 31)
                       + df["u2"].to_numpy(np.int64))
        return out

    top = top_k_per_group(
        enriched.map_batches(score, batch_format="pandas"),
        ["_g"], "jaccard", k=k, ascending=False, tie_col="_tie")
    out = top.to_pandas().sort_values(
        ["jaccard", "u1", "u2"], ascending=[False, True, True],
        kind="mergesort", ignore_index=True).head(k)
    return rd.from_pandas(out[["u1", "u2", "shared", "jaccard"]])


def _rake_keywords_documents(sf_dir: str) -> pd.DataFrame:
    """RAKE keyword extraction: stopword-delimited candidate phrases,
    degree/frequency word scores, phrase-sum ranking (golden)."""
    from sits_classification_ray.stages.textstats import rake_keywords

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return rake_keywords(docs, k=20)


def _llr_bigrams_documents(sf_dir: str) -> rd.Dataset:
    """Dunning log-likelihood-ratio collocations — the significance-
    tested sibling of pmi_bigrams_documents (SQL-checked)."""
    from sits_classification_ray.stages.textstats import llr_bigrams

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return llr_bigrams(docs, k=50, min_count=5)


def _xlx_sql(e: str) -> str:
    return f"(CASE WHEN {e} > 0 THEN ({e}) * ln({e}) ELSE 0.0 END)"


#: llr expression mirroring stages/textstats.llr_bigrams' exact float
#: chain: every xlx argument is an exact integer-valued double, so the
#: engine's k11+k12 equals ca bitwise and the simpler marginal forms
#: below are bit-identical to the kernel's.
_LLR_EXPR = ("2.0 * (" + " + ".join([
    _xlx_sql("k11"), _xlx_sql("ca - k11"), _xlx_sql("cb - k11"),
    _xlx_sql("b - ca - cb + k11")])
    + " - " + _xlx_sql("ca") + " - " + _xlx_sql("b - ca")
    + " - " + _xlx_sql("cb") + " - " + _xlx_sql("b - cb")
    + " + " + _xlx_sql("b") + ")")


def _mi_feature_rank_embeddings(sf_dir: str, n_bins: int = 8) -> rd.Dataset:
    """Mutual-information feature ranking: MI(binned dim value; label)
    per embedding dimension — the filter-method feature-selection pass
    before training. Two exact passes: per-dim global min/max (order-
    free), then integer (dim, bin, label) counts through a combiner
    groupby; the per-dim MI finalizes in one keyed exchange with terms
    summed in (bin, label) sorted order (golden)."""
    from ray.data.aggregate import Max, Min, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding", "label"]).materialize()

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["embedding"]])
        d = X.shape[1]
        return pd.DataFrame({"dim": np.arange(d, dtype=np.int64),
                             "lo": X.min(axis=0), "hi": X.max(axis=0)})

    mm = (emb.map_batches(minmax, batch_format="pandas")
          .groupby("dim").aggregate(Min("lo", alias_name="lo"),
                                    Max("hi", alias_name="hi"))
          .to_pandas().sort_values("dim", ignore_index=True))
    lo = ray.put(mm["lo"].to_numpy(np.float64))
    hi = ray.put(mm["hi"].to_numpy(np.float64))

    class Binner:
        def __init__(self):
            self.lo = ray.get(lo)
            self.hi = ray.get(hi)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df["embedding"]])
            span = np.where(self.hi > self.lo, self.hi - self.lo, 1.0)
            b = np.clip(((X - self.lo) / span * n_bins)
                        .astype(np.int64), 0, n_bins - 1)
            d = X.shape[1]
            n = len(X)
            lab = df["label"].to_numpy(np.int64)
            out = pd.DataFrame({
                "dim": np.tile(np.arange(d, dtype=np.int64), n),
                "bin": b.ravel(),
                "label": np.repeat(lab, d)})
            g = (out.groupby(["dim", "bin", "label"], sort=False)
                 .size().rename("n").reset_index())
            g["n"] = g["n"].astype(np.int64)
            return g

    counts = (emb.map_batches(Binner, batch_format="pandas",
                              concurrency=(1, 8), num_cpus=1)
              .groupby(["dim", "bin", "label"])
              .aggregate(Sum("n", alias_name="n")))

    out_schema = pa.schema([("dim", pa.int64()), ("mi", pa.float64())])

    def mi_kern(df: pd.DataFrame) -> pd.DataFrame:
        dims, vals = [], []
        for dim, sub in df.groupby("dim", sort=True):
            sub = sub.sort_values(["bin", "label"], kind="mergesort")
            n = sub["n"].to_numpy(np.int64)
            N = int(n.sum())
            nb = sub.groupby("bin")["n"].transform("sum") \
                .to_numpy(np.int64)
            nl = sub.groupby("label")["n"].transform("sum") \
                .to_numpy(np.int64)
            terms = (n.astype(np.float64) / float(N)) * np.log(
                (n.astype(np.float64) * float(N))
                / (nb.astype(np.float64) * nl.astype(np.float64)))
            dims.append(int(dim))
            vals.append(float(terms.sum()))
        return pd.DataFrame({
            "dim": np.array(dims, dtype=np.int64),
            "mi": sql_round(np.array(vals), 6) + 0.0})

    return partitioned_map(counts, mi_kern, keys=["dim"],
                           out_schema=out_schema)


def _lsa_top_terms_documents(sf_dir: str) -> pd.DataFrame:
    """First LSA component of the term–document matrix by distributed
    power iteration: every half-product is a tag-union keyed exchange
    (no driver-held vocabulary, no broadcast vector — the unbounded-
    vocab contract), reductions over value-sorted segments, norm under
    the fixed-partition ascending-pid merge. Top-20 terms by
    |loading| (golden)."""
    from sits_classification_ray.stages.lsa import lsa_top_component

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return lsa_top_component(docs)


def _jl_distortion_embeddings(sf_dir: str, k: int = 8,
                              seed: int = 11) -> rd.Dataset:
    """Johnson–Lindenstrauss audit: project every embedding through a
    seeded Achlioptas sparse ±1 matrix (splitmix-derived, exact
    integers) and histogram the per-pair squared-distance distortion
    ratio over the disjoint (2m, 2m+1) vec_id pairs — the check run
    before committing a cheaper index dimensionality. One pair-keyed
    exchange, bucketed integer counts merge natively (golden)."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.als import _splitmix64
    from sits_classification_ray.stages.shuffle import partitioned_map

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    d_in = 64

    def jl_matrix() -> np.ndarray:
        idx = np.arange(k * d_in, dtype=np.uint64) \
            + np.uint64((seed * 0xD1B54A32D192ED03) % (1 << 64))
        u = (_splitmix64(idx) >> np.uint64(11)).astype(np.float64) \
            * 2.0 ** -53
        flat = np.where(u < 1 / 6, 1.0, np.where(u > 5 / 6, -1.0, 0.0))
        return flat.reshape(k, d_in)

    R = jl_matrix()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        vid = df["vec_id"].to_numpy(np.int64)
        return pd.DataFrame({"pid": vid // 2, "vec_id": vid,
                             "embedding": df["embedding"]
                             .to_numpy(object)})

    out_schema = pa.schema([("bucket", pa.int64()),
                            ("n_pairs", pa.int64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pid", "vec_id"], kind="mergesort")
        pid = df["pid"].to_numpy(np.int64)
        full = pd.Series(pid).groupby(pid).transform("size") \
            .to_numpy() == 2
        df = df[full]
        if len(df) == 0:
            return pd.DataFrame({
                "bucket": pd.Series([], dtype=np.int64),
                "n_pairs": pd.Series([], dtype=np.int64)})
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["embedding"]])
        diff = X[0::2] - X[1::2]
        den = (diff * diff).sum(axis=1)
        proj = diff @ R.T
        num = (proj * proj).sum(axis=1) * (3.0 / k)
        ok = den > 0
        ratio = num[ok] / den[ok]
        bucket = np.clip((ratio * 10.0).astype(np.int64), 0, 29)
        g = pd.Series(bucket).value_counts().sort_index()
        return pd.DataFrame({"bucket": g.index.to_numpy(np.int64),
                             "n_pairs": g.to_numpy(np.int64)})

    pairs = partitioned_map(emb.map_batches(tag, batch_format="pandas"),
                            kern, keys=["pid"], out_schema=out_schema)
    return pairs.groupby("bucket").aggregate(
        Sum("n_pairs", alias_name="n_pairs"))


def _rendezvous_reshard_crawl(sf_dir: str, n_old: int = 8) -> rd.Dataset:
    """Reshard-cost audit for growing the cluster from 8 to 9 shards:
    per current shard, how many urls move under naive mod-N hashing
    (≈ 8/9 of them) vs rendezvous/HRW hashing (≈ 1/9) — the
    consistent-hashing argument made measurable. All hashes are exact
    32-bit integer arithmetic shared with the SQL twin; the per-url
    argmax is vectorized over the url × shard matrix (SQL-checked)."""
    from ray.data.aggregate import Count, Sum

    def kern(b: pa.Table) -> pa.Table:
        uid = pd.Series(b["url"].to_pandas()) \
            .str.extract(r"u/(\d+)$", expand=False) \
            .astype(np.int64).to_numpy()
        M32 = np.int64(4294967296)

        def hrw(n: int) -> np.ndarray:
            s = np.arange(n, dtype=np.int64)
            # mix the COMBINED (uid, shard) key multiplicatively — a
            # hash linear in s degenerates HRW to "always last shard"
            hv = ((uid[:, None] * 31 + s[None, :]) * 2654435761) % M32
            # argmax, ties → smallest shard id (argmax picks first)
            return hv.argmax(axis=1).astype(np.int64)

        old = hrw(n_old)
        new = hrw(n_old + 1)
        return pa.table({
            "old_shard": pa.array(old),
            "moved_mod": pa.array(
                ((uid % n_old) != (uid % (n_old + 1)))
                .astype(np.int64)),
            "moved_hrw": pa.array((old != new).astype(np.int64))})

    urls = (_obs(sf_dir).groupby("url")
            .aggregate(Count(alias_name="_c")))
    return (urls.map_batches(kern, batch_format="pyarrow")
            .groupby("old_shard")
            .aggregate(Count(alias_name="n_urls"),
                       Sum("moved_mod", alias_name="moved_mod"),
                       Sum("moved_hrw", alias_name="moved_hrw")))


def _iforest_outliers_embeddings(sf_dir: str) -> pd.DataFrame:
    """Isolation-forest top-20 outliers: trees built driver-side on a
    hash-selected 2048-vector subsample (the paper's psi=256 × 8
    trees), scoring distributed with the forest broadcast once and a
    vectorized one-gather-per-level descent per batch (golden)."""
    from sits_classification_ray.stages.iforest import (iforest_fit,
                                                        iforest_score)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]).materialize()
    trees = iforest_fit(emb)
    return iforest_score(emb, trees, k=20)


def _graph_stats_crawl(sf_dir: str) -> pd.DataFrame:
    """Whole-graph health metrics over the distinct domain edge set:
    node/edge counts, reciprocity (share of directed edges whose
    reverse exists — a distributed self-join on the reversed key) and
    out→in degree assortativity (Pearson over edge endpoints from
    exact integer sums; only the final scalar math is float). SQL
    twin mirrors the identical expression (SQL-checked)."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.joins import hash_join

    e = (_domain_edges_crawl(sf_dir)
         .map_batches(lambda df: df[["w1", "w2"]],
                      batch_format="pandas").materialize())
    m = int(e.count())
    nodes = (e.map_batches(lambda df: pd.DataFrame(
        {"v": np.concatenate((df["w1"].to_numpy(object),
                              df["w2"].to_numpy(object)))}),
        batch_format="pandas")
        .groupby("v").aggregate(Count(alias_name="_c")).count())

    fwd = e.map_batches(lambda df: pd.DataFrame(
        {"key": df["w1"].astype(str) + "\x00" + df["w2"].astype(str)}),
        batch_format="pandas")
    rev = e.map_batches(lambda df: pd.DataFrame(
        {"key": df["w2"].astype(str) + "\x00" + df["w1"].astype(str)}),
        batch_format="pandas")
    nrec = int(hash_join(fwd, rev, on="key").count())

    # degree attach via tag-union exchanges (schema-pinned — groupby
    # outputs can carry Ray 2.49's schema-less empty blocks, which
    # Dataset.join's acero key resolution rejects)
    from sits_classification_ray.stages.shuffle import partitioned_map

    dout = e.groupby("w1").aggregate(Count(alias_name="x"))
    din = e.groupby("w2").aggregate(Count(alias_name="y"))

    def attach(un: rd.Dataset, deg_col: str,
               carry: str | None) -> rd.Dataset:
        cols = [("key", pa.string()), ("other", pa.string()),
                (deg_col, pa.int64())]
        if carry:
            cols.append((carry, pa.int64()))
        schema = pa.schema(cols)

        def kern(df: pd.DataFrame) -> pd.DataFrame:
            deg = df[df[deg_col] >= 0].sort_values("key",
                                                   kind="mergesort")
            rows = df[df[deg_col] < 0]
            pos = np.searchsorted(deg["key"].to_numpy(object),
                                  rows["key"].to_numpy(object))
            out = {"key": rows["other"].to_numpy(object),
                   "other": rows["key"].to_numpy(object),
                   deg_col: deg[deg_col].to_numpy(np.int64)[pos]}
            if carry:
                out[carry] = rows[carry].to_numpy(np.int64)
            return pd.DataFrame(out)

        return partitioned_map(un, kern, keys=["key"],
                               out_schema=schema)

    def tag_e1(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["w1"].to_numpy(object),
                             "other": df["w2"].to_numpy(object),
                             "x": np.int64(-1)})

    def tag_dx(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["w1"].to_numpy(object),
                             "other": "",
                             "x": df["x"].to_numpy(np.int64)})

    un1 = e.map_batches(tag_e1, batch_format="pandas").union(
        dout.map_batches(tag_dx, batch_format="pandas"))
    # after attach: key=w2, other=w1, x carried
    with_x = attach(un1, "x", None)

    def tag_e2(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["key"].to_numpy(object),
                             "other": df["other"].to_numpy(object),
                             "y": np.int64(-1),
                             "x": df["x"].to_numpy(np.int64)})

    def tag_dy(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["w2"].to_numpy(object),
                             "other": "", "y": df["y"]
                             .to_numpy(np.int64),
                             "x": np.int64(-1)})

    un2 = with_x.map_batches(tag_e2, batch_format="pandas").union(
        din.map_batches(tag_dy, batch_format="pandas"))
    j = attach(un2, "y", "x")

    def prods(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        return pd.DataFrame({"sx": [x.sum()], "sy": [y.sum()],
                             "sxy": [(x * y).sum()],
                             "sxx": [(x * x).sum()],
                             "syy": [(y * y).sum()]})

    s = (j.map_batches(prods, batch_format="pandas")
         .groupby(None).aggregate(Sum("sx", alias_name="sx"),
                                  Sum("sy", alias_name="sy"),
                                  Sum("sxy", alias_name="sxy"),
                                  Sum("sxx", alias_name="sxx"),
                                  Sum("syy", alias_name="syy"))
         .to_pandas().iloc[0])
    md = float(m)
    sx, sy = float(s["sx"]), float(s["sy"])
    num = float(s["sxy"]) / md - (sx / md) * (sy / md)
    den = np.sqrt((float(s["sxx"]) / md - (sx / md) * (sx / md))
                  * (float(s["syy"]) / md - (sy / md) * (sy / md)))
    # zero degree variance (e.g. a complete regular graph at large
    # scale) makes Pearson 0/0 — define it as 0, NaN breaks the
    # driver's NaN-unequal value hash (seen at sf0.1)
    assort = num / den if den > 0.0 else 0.0
    vals = np.array([float(nodes), float(m), nrec / md, assort])
    return pd.DataFrame({
        "metric": ["n_nodes", "n_edges", "reciprocity",
                   "assortativity"],
        "value": sql_round(vals, 6) + 0.0})


def _huber_fit_crawl(sf_dir: str) -> pd.DataFrame:
    """Huber robust regression text_len ~ word_count over the
    observation table: exact-integer OLS init, three IRLS rounds whose
    weighted float sums reduce under the fixed-partition sorted-order
    contract (bit-stable at any block layout — golden twin)."""
    from sits_classification_ray.stages.robust import huber_fit

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        pid = (pd.util.hash_array(df["url"].to_numpy(object),
                                  categorize=False)
               % np.uint64(64)).astype(np.int64)
        return pd.DataFrame({"url": df["url"], "warc_ts": df["warc_ts"],
                             "word_count": df["word_count"]
                             .astype(np.int64),
                             "text_len": df["text_len"]
                             .astype(np.int64),
                             "_pid": pid})

    ds = _obs(sf_dir).map_batches(prep, batch_format="pandas")
    return huber_fit(ds, "word_count", "text_len",
                     ["url", "warc_ts"])


def _curriculum_shards_documents(sf_dir: str,
                                 shard_tokens: int = 5000) -> rd.Dataset:
    """Curriculum sharding for a training feed: order the corpus
    easiest-proxy-first (n_chars desc, doc_id tiebreak), cut into
    fixed-token-budget shards via a distributed EXCLUSIVE prefix sum
    of per-doc token counts (the global_rank construction with value
    sums — one int64 per block to the driver), and report each
    shard's doc/token totals (SQL twin via a window sum)."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.stages.scan_sorted import (
        global_prefix_sum)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "n_chars"])

    def toks(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(b["text"], " ")
        return pa.table({
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "neg": pc.multiply(pc.cast(b["n_chars"], pa.int64()),
                               pa.scalar(-1, pa.int64())),
            "toks": pc.cast(pc.list_value_length(lists), pa.int64())})

    t = docs.map_batches(toks, batch_format="pyarrow",
                         zero_copy_batch=True)
    pref = global_prefix_sum(t, ["neg", "doc_id"], "toks")

    def shard(b: pa.Table) -> pa.Table:
        s = b["prior"].to_numpy(zero_copy_only=False) // shard_tokens
        return pa.table({"shard_id": pa.array(s.astype(np.int64)),
                         "toks": b["toks"]})

    return (pref.map_batches(shard, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("shard_id")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("toks", alias_name="tokens")))


_BLOOM_PROBES = [f"https://site-{u % 40}.example.com/u/{u}"
                 for u in range(5)] + ["https://site-9.example.com/u/99999"]


def _bloom_prune_crawl(sf_dir: str) -> pd.DataFrame:
    """Bloom sidecar index per hive bucket + point-lookup pruning:
    one streaming OR-merge pass builds a 512 B Bloom per url_bucket;
    six probe lookups (five present urls + one absent) report how many
    of the 64 buckets each lookup must open (golden)."""
    from sits_classification_ray.stages.bloomindex import (
        build_bucket_blooms, prune_lookup)

    blooms = build_bucket_blooms(_obs(sf_dir))
    return prune_lookup(blooms, _BLOOM_PROBES)


def _zorder_layout_crawl(sf_dir: str,
                         rows_per_file: int = 1000) -> rd.Dataset:
    """Z-order (Morton-curve) data-layout optimization — the
    Delta/Iceberg OPTIMIZE ZORDER BY shape: interleave the bits of the
    two pruning dimensions (crawl day, url id), total-order the table
    along the curve with the distributed rank construction, cut into
    fixed-size files, and report each file's per-dimension min/max
    zone map. Files end up tight in BOTH dimensions, so point/range
    reads on either column prune to a few files (SQL twin computes
    the identical interleave with bit arithmetic)."""
    from ray.data.aggregate import Count, Max, Min

    from sits_classification_ray.stages.scan_sorted import global_rank

    def zf(batch: pa.Table) -> pa.Table:
        us = batch["warc_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = us // 86_400_000_000
        uid = pd.Series(batch["url"].to_pandas()) \
            .str.extract(r"u/(\d+)$", expand=False) \
            .astype(np.int64).to_numpy() % 65536
        d16 = day % 65536
        z = np.zeros(len(us), dtype=np.int64)
        for b in range(16):
            z |= ((d16 >> b) & 1) << (2 * b)
            z |= ((uid >> b) & 1) << (2 * b + 1)
        return pa.table({"url": batch["url"], "warc_ts": batch["warc_ts"],
                         "day": pa.array(day), "uid": pa.array(uid),
                         "z": pa.array(z)})

    zds = _obs(sf_dir).map_batches(zf, batch_format="pyarrow",
                                   zero_copy_batch=True)
    ranked = global_rank(zds, ["z", "url", "warc_ts"])

    def fid(batch: pa.Table) -> pa.Table:
        f = (batch["rn"].to_numpy(zero_copy_only=False) - 1) \
            // rows_per_file
        return pa.table({"file_id": pa.array(f.astype(np.int64)),
                         "day": batch["day"], "uid": batch["uid"]})

    return (ranked.map_batches(fid, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("file_id")
            .aggregate(Count(alias_name="n"),
                       Min("day", alias_name="min_day"),
                       Max("day", alias_name="max_day"),
                       Min("uid", alias_name="min_uid"),
                       Max("uid", alias_name="max_uid")))


_ZORDER_EXPR = " + ".join(
    f"((((day % 65536) >> {b}) & 1) << {2 * b})"
    f" + (((uid >> {b}) & 1) << {2 * b + 1})"
    for b in range(16))


def _hilbert_index_vec(x: np.ndarray, y: np.ndarray,
                       order: int = 16) -> np.ndarray:
    """Vectorized Hilbert-curve index (the canonical xy→d algorithm:
    per-level quadrant digit ``(3rx)^ry`` + conditional
    reflect/swap rotation), all levels as numpy ops over the whole
    column — no per-point Python."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros(len(x), np.int64)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotation: when ry==0, optionally reflect (rx==1), then swap
        refl = (ry == 0) & (rx == 1)
        x = np.where(refl, s - 1 - x, x)
        y = np.where(refl, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= 1
    return d


def _hilbert_layout_crawl(sf_dir: str,
                          rows_per_file: int = 200) -> rd.Dataset:
    """Hilbert-curve data layout — the locality-better sibling of
    _zorder_layout_crawl (Hilbert keeps EVERY curve-adjacent pair of
    cells grid-adjacent; Morton has long jumps at power-of-two
    boundaries, so Hilbert zone maps are tighter for range pruning).
    Same construction: curve index over (crawl day, url id), global
    rank along the curve, fixed-size file cuts, per-file min/max zone
    maps. Golden oracle: independent scalar-loop Hilbert twin (the
    rotation steps are not SQL-expressible)."""
    from ray.data.aggregate import Count, Max, Min

    from sits_classification_ray.stages.scan_sorted import global_rank

    def hf(batch: pa.Table) -> pa.Table:
        us = batch["warc_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = us // 86_400_000_000
        uid = pd.Series(batch["url"].to_pandas()) \
            .str.extract(r"u/(\d+)$", expand=False) \
            .astype(np.int64).to_numpy() % 65536
        h = _hilbert_index_vec(day % 65536, uid)
        return pa.table({"url": batch["url"], "warc_ts": batch["warc_ts"],
                         "day": pa.array(day), "uid": pa.array(uid),
                         "h": pa.array(h)})

    hds = _obs(sf_dir).map_batches(hf, batch_format="pyarrow",
                                   zero_copy_batch=True)
    ranked = global_rank(hds, ["h", "url", "warc_ts"])

    def fid(batch: pa.Table) -> pa.Table:
        f = (batch["rn"].to_numpy(zero_copy_only=False) - 1) \
            // rows_per_file
        return pa.table({"file_id": pa.array(f.astype(np.int64)),
                         "day": batch["day"], "uid": batch["uid"]})

    return (ranked.map_batches(fid, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("file_id")
            .aggregate(Count(alias_name="n"),
                       Min("day", alias_name="min_day"),
                       Max("day", alias_name="max_day"),
                       Min("uid", alias_name="min_uid"),
                       Max("uid", alias_name="max_uid")))


def _dp_counts_domains(sf_dir: str, epsilon: float = 1.0
                       ) -> rd.Dataset:
    """ε-differentially-private per-domain snapshot counts via the
    Laplace mechanism (sensitivity 1 ⇒ scale 1/ε): the release shape
    a privacy-constrained crawl-stats API would publish. Noise is
    DERANDOMIZED for the oracle: u ∈ (−½, ½) from
    splitmix64(siphash(domain)), noise = −sign(u)·ln(1−2|u|)/ε — the
    exact inverse-CDF Laplace draw, a pure function of the domain
    string (a real deployment would draw fresh randomness; the
    mechanism and calibration are identical). Counts combine
    per-batch before one |domains|-row groupby."""
    from ray.data.aggregate import Count

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.als import _splitmix64

    cnt = (_obs(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            "domain": df["url"].str.extract(_DOMAIN_RE, expand=False)}),
        batch_format="pandas")
        .groupby("domain").aggregate(Count(alias_name="n")))

    def noise(df: pd.DataFrame) -> pd.DataFrame:
        h = _splitmix64(pd.util.hash_array(
            np.asarray(df["domain"], dtype=object)))
        u = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53 - 0.5
        u = np.clip(u, -0.5 + 1e-12, 0.5 - 1e-12)
        lap = -np.sign(u) * np.log(1.0 - 2.0 * np.abs(u)) / epsilon
        return pd.DataFrame({
            "domain": df["domain"],
            "noisy_n": sql_round(
                df["n"].to_numpy(np.float64) + lap, 6) + 0.0})

    return cnt.map_batches(noise, batch_format="pandas")


def _gini_domains_crawl(sf_dir: str) -> rd.Dataset:
    """Gini concentration of snapshot counts across a domain's urls —
    the crawl-equity signal a recrawl scheduler watches (0 = every
    url crawled equally, →1 = one url hoards the budget). Exact
    integer rank-weighted sums per domain partition (SQL twin)."""
    from ray.data.aggregate import Count

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    cnt = _obs(sf_dir).groupby("url").aggregate(Count(alias_name="x"))

    def dom(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "domain": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "url": df["url"], "x": df["x"].astype(np.int64)})

    out_schema = pa.schema([("domain", pa.string()),
                            ("n_urls", pa.int64()),
                            ("gini", pa.float64())])

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["domain", "x", "url"], kind="mergesort")
        doms, rows = [], []
        for d, sub in df.groupby("domain", sort=False):
            x = sub["x"].to_numpy(np.int64)
            n = len(x)
            i = np.arange(1, n + 1, dtype=np.int64)
            six = int((i * x).sum())
            s = int(x.sum())
            g = float(2 * six) / float(n * s) \
                - float(n + 1) / float(n)
            doms.append(d)
            rows.append((n, float(sql_round(np.float64(g), 6)) + 0.0))
        return pd.DataFrame({
            "domain": doms,
            "n_urls": np.array([r[0] for r in rows], dtype=np.int64),
            "gini": np.array([r[1] for r in rows], dtype=np.float64)})

    return partitioned_map(cnt.map_batches(dom, batch_format="pandas"),
                           kern, keys=["domain"],
                           out_schema=out_schema)


def _twohop_domains_crawl(sf_dir: str) -> rd.Dataset:
    """Distinct 2-hop out-neighborhood size per source domain (the
    crawl-frontier expansion estimate): a distributed self-join of the
    aggregated edge table on the middle node, then a distinct pair
    count — the raw link table never self-joins (SQL twin)."""
    from ray.data.aggregate import Count

    from sits_classification_ray.stages.joins import hash_join

    edges = _domain_edges_crawl(sf_dir)

    # pin empty-block schemas: the upstream groupby can emit
    # schema-less empty blocks (Ray 2.49) that would KeyError the
    # rename and break the join's acero key resolution
    def mk_side(c1: str, c2: str):
        def side(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty or "w1" not in df.columns:
                return pd.DataFrame({c1: pd.Series([], dtype=object),
                                     c2: pd.Series([], dtype=object)})
            out = df.rename(columns={"w1": c1, "w2": c2})
            return out[[c1, c2]]
        return side

    left = edges.map_batches(mk_side("a", "mid"),
                             batch_format="pandas")
    right = edges.map_batches(mk_side("mid", "c"),
                              batch_format="pandas")
    pairs = hash_join(left, right, on="mid")
    return (pairs.groupby(["a", "c"]).aggregate(Count(alias_name="_n"))
            .groupby("a").aggregate(Count(alias_name="twohop"))
            .map_batches(lambda df: pd.DataFrame(
                {"node": df["a"],
                 "twohop": df["twohop"].astype(np.int64)}),
                batch_format="pandas"))


def _link_churn_weekly_crawl(sf_dir: str) -> rd.Dataset:
    """Link-graph edge churn per epoch-aligned week: how many distinct
    (src domain, dst domain) edges appeared (absent the week before)
    and ended (absent the week after) — the graph-freshness signal for
    incremental re-extraction. One exchange keyed on the edge pair
    computes both flags from week gaps; weekly totals merge with a
    native Sum (SQL twin)."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.stages.shuffle import partitioned_map

    week_us = 604_800 * 1_000_000
    links = _extract_links_crawl(sf_dir)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        us = df["warc_ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        return pd.DataFrame({
            "wk": (us // week_us) * week_us,
            "w1": df["url"].str.extract(_DOMAIN_RE, expand=False),
            "w2": df["href"].str.extract(_DOMAIN_RE, expand=False)})

    distinct = (links.map_batches(proj, batch_format="pandas")
                .groupby(["w1", "w2", "wk"])
                .aggregate(Count(alias_name="_n")))

    out_schema = pa.schema([("wk", pa.int64()),
                            ("appeared", pa.int64()),
                            ("ended", pa.int64())])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["w1", "w2", "wk"], kind="mergesort")
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                "wk": pd.Series([], dtype=np.int64),
                "appeared": pd.Series([], dtype=np.int64),
                "ended": pd.Series([], dtype=np.int64)})
        w1 = df["w1"].to_numpy(object)
        w2 = df["w2"].to_numpy(object)
        wk = df["wk"].to_numpy(np.int64)
        same_prev = np.empty(n, dtype=bool)
        same_prev[0] = False
        same_prev[1:] = (w1[1:] == w1[:-1]) & (w2[1:] == w2[:-1])
        gap_prev = np.empty(n, dtype=bool)
        gap_prev[0] = True
        gap_prev[1:] = (wk[1:] - wk[:-1]) != week_us
        appeared = ~same_prev | gap_prev
        ended = ~np.append(same_prev[1:], False) \
            | np.append(gap_prev[1:], True)
        return pd.DataFrame({"wk": wk,
                             "appeared": appeared.astype(np.int64),
                             "ended": ended.astype(np.int64)})

    per_pair = partitioned_map(distinct, flags, keys=["w1", "w2"],
                               out_schema=out_schema)
    agg = (per_pair.groupby("wk")
           .aggregate(Sum("appeared", alias_name="appeared"),
                      Sum("ended", alias_name="ended")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "wk": df["wk"].astype(np.int64).to_numpy()
            .astype("datetime64[us]"),
            "appeared": df["appeared"].astype(np.int64),
            "ended": df["ended"].astype(np.int64)})

    return agg.map_batches(fin, batch_format="pandas")


def _lpa_communities_crawl(sf_dir: str) -> rd.Dataset:
    """Synchronous weighted label-propagation communities over the
    undirected domain graph: fixed 4 rounds, integer votes, smallest-
    label tie-break — per round one tag-union label exchange plus a
    (node, label) groupby-sum; the edge table never moves (golden)."""
    from sits_classification_ray.stages.graph import label_propagation

    return label_propagation(_domain_edges_crawl(sf_dir)).sort("node")


def _hard_negatives_embeddings(sf_dir: str) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: nearest
    different-label neighbor per anchor (vec_id < 32), anchors
    broadcast once, per-batch masked partial top-k (golden)."""
    from sits_classification_ray.stages.similarity import (
        hard_negative_topk)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    anchors = pd.DataFrame(emb.filter(expr="vec_id < 32").take_all())
    return hard_negative_topk(emb, anchors, k=1)


def _removal_attribution_events(sf_dir: str) -> pd.DataFrame:
    """Markov removal-effect attribution over user journeys: the
    multi-touch upgrade of the last-touch `attribution_events` query.
    Distributed absorbing-chain transition counts (START/CONV/NULL
    states, conversion restarts the journey); the per-channel removal
    re-solve runs on the O(|types|²) driver-side matrix (golden)."""
    from sits_classification_ray.stages.behavior import (
        removal_effect_attribution)

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    return removal_effect_attribution(ev)


def _k_anonymity_documents(sf_dir: str, k: int = 5) -> rd.Dataset:
    """k-anonymity audit over the quasi-identifier (lang, source,
    n_chars-century bucket): every group smaller than k is a
    re-identification risk surfaced for suppression/generalization.
    Per-batch Arrow combiner before the global groupby (SQL twin)."""
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        bucket = pc.divide(pc.cast(b["n_chars"], pa.int64()),
                           pa.scalar(100, pa.int64()))
        t = pa.table({"lang": b["lang"], "source": b["source"],
                      "size_bucket": bucket})
        g = (t.group_by(["lang", "source", "size_bucket"])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["lang", "source", "size_bucket", "n"])

    return (docs.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby(["lang", "source", "size_bucket"])
            .aggregate(Sum("n", alias_name="n"))
            .filter(expr=f"n < {k}"))


def _mondrian_partitions_documents(sf_dir: str, k: int = 25
                                   ) -> pd.DataFrame:
    """Mondrian multidimensional k-anonymization (LeFevre et al.,
    ICDE 2006) over the numeric quasi-identifiers (n_chars, word
    count): recursively split on the widest-range dimension at the
    weighted lower median while both sides keep ≥ k records — the
    ALGORITHM that achieves the k-anonymity the registry's audit
    measures. Distributed part: one combiner groupby to the
    (x1, x2) → count table (bounded by the value-domain product,
    never rows); the recursion runs on that summary. Output: one row
    per leaf with its generalization box and size (every leaf ≥ k by
    construction). Golden twin replicates the recursion."""
    from ray.data.aggregate import Count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["n_chars", "text"])

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "x1": df["n_chars"].to_numpy(np.int64),
            "x2": df["text"].str.split(" ").str.len()
            .to_numpy(np.int64)})

    cells = (docs.map_batches(proj, batch_format="pandas")
             .groupby(["x1", "x2"]).aggregate(Count(alias_name="n"))
             .to_pandas())
    pts = cells[["x1", "x2"]].to_numpy(np.int64)
    wts = cells["n"].to_numpy(np.int64)

    leaves: list[tuple] = []

    def recurse(idx: np.ndarray) -> None:
        n = int(wts[idx].sum())
        sub = pts[idx]
        lo = sub.min(axis=0)
        hi = sub.max(axis=0)
        dim = int(np.argmax(hi - lo))            # tie → dim 0
        if hi[dim] == lo[dim]:
            leaves.append((lo[0], hi[0], lo[1], hi[1], n))
            return
        order = np.argsort(sub[:, dim], kind="mergesort")
        cum = np.cumsum(wts[idx][order])
        target = (n + 1) // 2
        j = int(np.searchsorted(cum, target))
        split = int(sub[order[j], dim])
        if split == hi[dim]:                     # avoid empty right
            split = int(np.max(sub[sub[:, dim] < hi[dim], dim])) \
                if (sub[:, dim] < hi[dim]).any() else split
        left = idx[sub[:, dim] <= split]
        right = idx[sub[:, dim] > split]
        if (len(right) == 0 or wts[left].sum() < k
                or wts[right].sum() < k):
            leaves.append((lo[0], hi[0], lo[1], hi[1], n))
            return
        recurse(left)
        recurse(right)

    recurse(np.arange(len(pts)))
    out = pd.DataFrame(leaves, columns=["x1_min", "x1_max", "x2_min",
                                        "x2_max", "n"])
    return out.sort_values(["x1_min", "x2_min"],
                           kind="mergesort", ignore_index=True) \
        .astype(np.int64)


def _l_diversity_documents(sf_dir: str, l: int = 3) -> rd.Dataset:
    """l-diversity audit (Machanavajjhala et al. 2007) — the
    k-anonymity sibling: a quasi-identifier group is risky not only
    when SMALL but when its sensitive attribute is UNIFORM. Over the
    (lang, size-century) quasi-identifier, count distinct ``source``
    values (the sensitive attribute); groups with fewer than ``l``
    distinct sources leak membership→source inference. Exact distinct
    via a two-level groupby (dedup then count — order-free under any
    batching); SQL twin."""
    from ray.data.aggregate import Count, Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "source", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        bucket = pc.divide(pc.cast(b["n_chars"], pa.int64()),
                           pa.scalar(100, pa.int64()))
        t = pa.table({"lang": b["lang"], "size_bucket": bucket,
                      "source": b["source"]})
        # per-batch combiner: dedup triples + partial row count
        g = (t.group_by(["lang", "size_bucket", "source"])
             .aggregate([([], "count_all")]))
        return g.rename_columns(["lang", "size_bucket", "source", "n"])

    triples = (docs.map_batches(part, batch_format="pyarrow",
                                zero_copy_batch=True)
               .groupby(["lang", "size_bucket", "source"])
               .aggregate(Sum("n", alias_name="n")))
    return (triples.groupby(["lang", "size_bucket"])
            .aggregate(Count(alias_name="distinct_sources"),
                       Sum("n", alias_name="group_size"))
            .filter(expr=f"distinct_sources < {l}"))


def _isotonic_calibration_nchars(sf_dir: str) -> pd.DataFrame:
    """Isotonic regression (pool-adjacent-violators) calibrating
    P(lang = 'en') against document length: per-size-bucket empirical
    rates from one distributed groupby, then the exact PAV merge on
    the driver over the BOUNDED bucket table (≤ max(n_chars)/100
    rows — driver work is O(bins), never O(docs)). The monotone
    calibration standard for classifier-score → probability mapping
    (golden twin: independent stack-based PAV)."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        bucket = pc.divide(pc.cast(b["n_chars"], pa.int64()),
                           pa.scalar(100, pa.int64()))
        pos = pc.cast(pc.equal(b["lang"], "en"), pa.int64())
        t = pa.table({"size_bucket": bucket, "pos": pos})
        g = t.group_by("size_bucket").aggregate(
            [("pos", "sum"), ([], "count_all")])
        return g.rename_columns(["size_bucket", "pos", "n"])

    bins = (docs.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("size_bucket")
            .aggregate(Sum("pos", alias_name="pos"),
                       Sum("n", alias_name="n"))
            .sort("size_bucket").to_pandas())

    n = bins["n"].to_numpy(np.int64)
    pos = bins["pos"].to_numpy(np.int64)
    # PAV (increasing): merge adjacent blocks while rates decrease
    blocks = []                               # [bucket_count, n, pos]
    for i in range(len(bins)):
        blocks.append([1, int(n[i]), int(pos[i])])
        while (len(blocks) > 1
               and blocks[-2][2] * blocks[-1][1]
               > blocks[-1][2] * blocks[-2][1]):   # exact int compare
            c2, n2, p2 = blocks.pop()
            blocks[-1][0] += c2
            blocks[-1][1] += n2
            blocks[-1][2] += p2
    iso = np.empty(len(bins), np.float64)
    j = 0
    for c, bn, bp in blocks:
        iso[j:j + c] = bp / float(bn)
        j += c
    return pd.DataFrame({
        "size_bucket": bins["size_bucket"].to_numpy(np.int64),
        "n": n,
        "rate_raw": sql_round(pos / n.astype(np.float64), 6) + 0.0,
        "rate_iso": sql_round(iso, 6) + 0.0})


def _ann_recall_embeddings(sf_dir: str) -> pd.DataFrame:
    """Recall@10 of the IVF index (n_probe=2 of 8 lists) against the
    exact brute-force cosine top-10 for the five probe queries — the
    quality gauge any production ANN deployment tracks next to its
    speedup. Both sides run distributed; the comparison is a
    driver-side set intersection over two k-row frames (golden)."""
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.similarity import (
        brute_force_topk, ivf_assign, ivf_topk, train_centroids)

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(expr="vec_id <= 4").take_all()
    queries = {int(r["vec_id"]): np.asarray(r["embedding"],
                                            dtype=np.float64)
               for r in qrows}
    exact = brute_force_topk(emb, queries, k=10)
    cent = train_centroids(emb, n_lists=8, iters=5, seed=0,
                           id_col="vec_id")
    approx = ivf_topk(ivf_assign(emb, cent), cent, queries, k=10,
                      n_probe=2)
    rows = []
    for q in sorted(queries):
        e = set(exact.loc[exact["query_id"] == q, "vec_id"])
        a = set(approx.loc[approx["query_id"] == q, "vec_id"])
        hits = len(e & a)
        rows.append((q, hits, float(sql_round(hits / 10.0, 6)) + 0.0))
    return pd.DataFrame(rows, columns=["query_id", "n_hits", "recall"]) \
        .astype({"query_id": np.int64, "n_hits": np.int64,
                 "recall": np.float64})


def _neighbor_agg_crawl(sf_dir: str) -> rd.Dataset:
    """GraphSAGE-style 1-hop feature aggregation over the domain link
    graph: each source domain's own in-link weight plus the
    edge-weighted mean in-link weight of its out-neighbors. Scale
    shape: edge-weight groupby → two TAG-UNION keyed attaches
    (schema-pinned partitioned_map — NOT Dataset.join: Ray 2.49
    groupby outputs can emit schema-less empty blocks that
    intermittently break acero key resolution, observed in this exact
    query) → integer partial products → one small groupby (SQL
    twin)."""
    from ray.data.aggregate import Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    edges = _domain_edges_crawl(sf_dir)            # (w1, w2, n)
    indeg = edges.groupby("w2").aggregate(Sum("n", alias_name="indeg"))

    def tag_e(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"w2": df["w2"], "w1": df["w1"],
                             "n": df["n"].astype(np.int64),
                             "indeg": np.int64(-1)})

    def tag_i(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"w2": df["w2"], "w1": "",
                             "n": np.int64(-1),
                             "indeg": df["indeg"].astype(np.int64)})

    prod_schema = pa.schema([("w1", pa.string()), ("wn", pa.int64()),
                             ("n", pa.int64())])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        side_i = df[df["indeg"] >= 0]
        side_e = df[df["indeg"] < 0]
        imap = pd.Series(side_i["indeg"].to_numpy(),
                         index=side_i["w2"])
        ind = side_e["w2"].map(imap).to_numpy(np.int64)
        n = side_e["n"].to_numpy(np.int64)
        return pd.DataFrame({"w1": side_e["w1"], "wn": n * ind,
                             "n": n})

    prods = partitioned_map(
        edges.map_batches(tag_e, batch_format="pandas").union(
            indeg.map_batches(tag_i, batch_format="pandas")),
        attach, keys=["w2"], out_schema=prod_schema)

    agg = prods.groupby("w1").aggregate(Sum("wn", alias_name="wn"),
                                        Sum("n", alias_name="n"))

    def tag_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"w1": df["w1"],
                             "wn": df["wn"].astype(np.int64),
                             "n": df["n"].astype(np.int64),
                             "own": np.int64(-1)})

    def tag_o(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"w1": df["w2"], "wn": np.int64(-1),
                             "n": np.int64(-1),
                             "own": df["indeg"].astype(np.int64)})

    out_schema = pa.schema([("node", pa.string()),
                            ("indeg", pa.int64()),
                            ("nbr_mean_indeg", pa.float64())])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        side_o = df[df["own"] >= 0]
        side_a = df[df["own"] < 0]
        omap = pd.Series(side_o["own"].to_numpy(),
                         index=side_o["w1"])
        own = side_a["w1"].map(omap).fillna(0).to_numpy(np.int64)
        return pd.DataFrame({
            "node": side_a["w1"], "indeg": own,
            "nbr_mean_indeg": sql_round(
                side_a["wn"].to_numpy(np.float64)
                / side_a["n"].to_numpy(np.float64), 6) + 0.0})

    return partitioned_map(
        agg.map_batches(tag_a, batch_format="pandas").union(
            indeg.map_batches(tag_o, batch_format="pandas")),
        final, keys=["w1"], out_schema=out_schema)


def _als_recommend_events(sf_dir: str) -> rd.Dataset:
    """ALS matrix factorization over the user × item ("k" prop)
    interaction matrix built from click/view/purchase events, then a
    top-1 unseen-item recommendation per user. Distributed shape
    (stages/als.py): broadcast item factors, tag-union user-factor
    exchange for the item step (user factors never broadcast), golden
    twin on the shared solve_side/init_factors contract. max_items
    engages the distributed top-N catalog prune (a no-op bound here —
    events carry ≤100 distinct items — but the collected table is
    O(max_items·d) by construction at any scale)."""
    from sits_classification_ray.stages.als import (
        als_fit, als_recommend, ratings_from_events)

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value",
                                  "props"])
    ratings = ratings_from_events(ev).materialize()
    Y = als_fit(ratings, d=8, n_iters=3, reg=0.1, seed=7,
                max_items=10_000)
    return als_recommend(ratings, Y, d=8, reg=0.1)


def _kcore_domains_crawl(sf_dir: str) -> rd.Dataset:
    """k-core decomposition of the domain link graph via the h-index
    fixpoint (Lü et al. 2016) — integer monotone contraction, exact
    scalar convergence detection; checked against an independent
    Batagelj-Zaversnik peeling oracle."""
    from sits_classification_ray.stages.graph import coreness

    return coreness(_domain_edges_crawl(sf_dir)).sort("node")


def _naive_bayes_lang_documents(sf_dir: str) -> rd.Dataset:
    """Multinomial Naive Bayes language classifier trained and scored
    over the corpus — integer micro-nat scores, inner-join smoothing
    decomposition (SQL twin: unnest + joins + window argmax)."""
    from sits_classification_ray.stages.textstats import naive_bayes_lang

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    return naive_bayes_lang(docs)


def _crawl_depth_bfs(sf_dir: str) -> rd.Dataset:
    """Multi-source BFS crawl depth over the domain link graph: hop
    distance from the ``site-1*`` seed domains (recursive-CTE SQL
    twin). The crawl-scheduling prior: frontier distance from the
    seed list."""
    from sits_classification_ray.stages.graph import bfs_depth

    return bfs_depth(_domain_edges_crawl(sf_dir),
                     seed_prefix="site-1").sort("node")


def _pca_projection_embeddings(sf_dir: str) -> rd.Dataset:
    """Distributed PCA: one O(d²)-to-driver moment pass under the
    kmeans determinism contract, eigh on the d×d covariance, broadcast
    projection onto the top-2 components (golden twin)."""
    from sits_classification_ray.stages.similarity import pca_project

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return pca_project(emb)


def _domain_drift_bh_crawl(sf_dir: str) -> rd.Dataset:
    """Per-domain month-half drift z-tests with Benjamini-Hochberg
    FDR adjustment across the whole domain family (SQL window twin:
    row_number rank + reverse-cummin over p·m/rank)."""
    from sits_classification_ray.stages.stats_tests import domain_drift_bh

    return domain_drift_bh(_obs_long(sf_dir))


def build_queries() -> dict[str, Callable[[str], Any]]:
    from sits_classification_ray.pipelines.relational import (
        orders_per_nation, q1_pricing_summary, q3_shipping_priority,
        q5_local_supplier_volume, q6_revenue_forecast,
        q10_returned_items, q14_promo_revenue,
        q17_small_quantity_revenue, q18_large_volume_orders,
        q4_priority_semi, q16_supplier_variety,
        q19_disjunctive_revenue, q7_nation_volume,
        q12_priority_by_status, q13_customer_distribution,
        q15_top_supplier, q22_idle_customers,
        q2_min_cost_supplier, q8_market_share, q9_product_profit,
        q11_important_parts, q20_promotion_suppliers,
        q21_suppliers_waiting)

    return {k: _tuned(v) for k, v in {
        # crawl pipeline (SQL-checked)
        "crawl_extract": lambda sf: extract(
            crawl_from_tables(sf), CFG, keep_text=True
        ).select_columns(["url", "warc_ts", "lang", "text",
                          "text_len", "word_count"]),
        "crawl_dedup": lambda sf: _obs(sf).select_columns(OBS_COLS),
        "rejects_crawl": _rejects_crawl,
        "rollup_hourly": lambda sf: _tier(sf, "hourly"),
        "rollup_daily": lambda sf: _tier(sf, "daily"),
        "rollup_weekly": lambda sf: _tier(sf, "weekly"),
        "hopping_rollup_6h_1h": _hopping_rollup_6h_1h,
        "hll_distinct_urls_daily": _hll_distinct_urls_daily,
        "hll_weekly_from_daily": _hll_weekly_from_daily,
        "ams_f2_urls": _ams_f2_urls,
        "hist_quantile_daily": _hist_quantile_daily,
        "kmv_distinct_urls_daily": _kmv_distinct_urls_daily,
        "cms_heavy_domains_crawl": _cms_heavy_domains_crawl,
        "kmv_overlap_weeks": _kmv_overlap_weeks,
        "quantiles_daily_crawl": _quantiles_daily_crawl,
        "lang_daily": _lang_daily,
        "pivot_lang_weekly": _pivot_lang_weekly,
        "gapfill_linear": lambda sf: _gapfill(sf, "linear"),
        "gapfill_locf": lambda sf: _gapfill(sf, "locf"),
        "gapfill_none": lambda sf: _gapfill(sf, "none"),
        "gapfill_seasonal": lambda sf: _gapfill(sf, "seasonal"),
        "gapfill_unbounded": _gapfill_unbounded,
        "training_windows": _training_windows,
        # generic stream rollup over the events table (SQL-checked)
        "events_rollup_hourly": _events_rollup_hourly,
        # relational coverage (SQL-checked)
        "q1_pricing_summary": q1_pricing_summary,
        "orders_per_nation": orders_per_nation,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q6_revenue_forecast": q6_revenue_forecast,
        "q10_returned_items": q10_returned_items,
        "q14_promo_revenue": q14_promo_revenue,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q18_large_volume_orders": q18_large_volume_orders,
        "q4_priority_semi": q4_priority_semi,
        "q16_supplier_variety": q16_supplier_variety,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "q7_nation_volume": q7_nation_volume,
        "q12_priority_by_status": q12_priority_by_status,
        "q13_customer_distribution": q13_customer_distribution,
        "q15_top_supplier": q15_top_supplier,
        "q22_idle_customers": q22_idle_customers,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q8_market_share": q8_market_share,
        "q9_product_profit": q9_product_profit,
        "q11_important_parts": q11_important_parts,
        "q20_promotion_suppliers": q20_promotion_suppliers,
        "q21_suppliers_waiting": q21_suppliers_waiting,
        # documents / training-data ops
        "exact_dedup_documents": _exact_dedup_documents,
        "text_stats_documents": _text_stats_documents,
        "repetition_documents": _repetition_documents,
        "tfidf_top3_documents": _tfidf_top3_documents,
        "clean_corpus_documents": _clean_corpus_documents,
        "quality_score_documents": _quality_score_documents,
        "top3_docs_per_lang": _top3_docs_per_lang,
        "vocab_top100_documents": _vocab_top100_documents,
        "similarity_topk": _similarity_topk,
        "embedding_near_dup": _embedding_near_dup,
        "embedding_near_dup_ivf": _embedding_near_dup_ivf,
        "srp_near_dup_embeddings": _srp_near_dup_embeddings,
        # codec roundtrip, SQL-checked via decoded-side summaries
        "gorilla_roundtrip": _gorilla_roundtrip,
        # non-SQL-expressible (driver records rows-only)
        "gorilla_segments": _gorilla_segments,
        "langid_documents": _langid_documents,
        "simhash_documents": _simhash_documents,
        "simhash_drift_crawl": _simhash_drift_crawl,
        # ROUGE-1 consecutive-snapshot overlap (SQL-checked)
        "rouge_overlap_crawl": _rouge_overlap_crawl,
        # content-defined-chunking dedup ratio (golden)
        "cdc_dedup_ratio_crawl": _cdc_dedup_ratio_crawl,
        # Aho-Corasick dictionary scan (SQL-checked)
        "dictionary_scan_documents": _dictionary_scan_documents,
        # Gries DP lexical dispersion (SQL-checked, exact ints)
        "word_dispersion_documents": _word_dispersion_documents,
        "fingerprint_documents": _fingerprint_documents,
        "minhash_near_dup_documents": _minhash_near_dup_documents,
        "jaccard_near_dup_documents": _jaccard_near_dup_documents,
        # winnowing/MOSS local fingerprint near-dup (golden)
        "winnowing_near_dup_documents": _winnowing_near_dup_documents,
        "dup_spans_documents": _dup_spans_documents,
        "trim_dup_spans_documents": _trim_dup_spans_documents,
        "snm_near_dup_documents": _snm_near_dup_documents,
        "near_dup_clusters_documents": _near_dup_clusters_documents,
        "near_dup_keep_one_documents": _near_dup_keep_one_documents,
        "simhash_near_dup_documents": _simhash_near_dup_documents,
        "incremental_near_dup_documents": _incremental_near_dup_documents,
        "scrub_pii_documents": _scrub_pii_documents,
        "chunk_documents": _chunk_documents,
        "pack_sequences_documents": _pack_sequences_documents,
        "global_rank_documents": _global_rank_documents,
        "ntile_documents": _ntile_documents,
        "regex_token_stats_documents": _regex_token_stats_documents,
        "label_centroids_embeddings": _label_centroids_embeddings,
        "nearest_centroid_embeddings": _nearest_centroid_embeddings,
        "knn_classify_embeddings": _knn_classify_embeddings,
        "ivf_topk": _ivf_topk,
        # temporal analytics + normalization (SQL-checked)
        "stm_per_series": _stm_per_series,
        "normalized_metrics": _normalized_metrics,
        "class_weights_embeddings": _class_weights_embeddings,
        "distinct_lang_source": _distinct_lang_source,
        # ordered-window operators (SQL-checked)
        "running_sum_crawl": _running_sum_crawl,
        "running_extrema_crawl": _running_extrema_crawl,
        "running_sum_unbounded": _running_sum_unbounded,
        "rolling_mean_crawl": _rolling_mean_crawl,
        "rolling_median_crawl": _rolling_median_crawl,
        "lttb_downsample_crawl": _lttb_downsample_crawl,
        "m4_downsample_crawl": _m4_downsample_crawl,
        "threshold_crossings_crawl": _threshold_crossings_crawl,
        "counter_rate_crawl": _counter_rate_crawl,
        "zscore_crawl": _zscore_crawl,
        "ewma_crawl": _ewma_crawl,
        "trend_slope_crawl": _trend_slope_crawl,
        "holt_linear_crawl": _holt_linear_crawl,
        # Theta-method forecast (golden)
        "theta_forecast_crawl": _theta_forecast_crawl,
        # Croston intermittent-demand rate (golden)
        "croston_rate_crawl": _croston_rate_crawl,
        # PELT exact-optimal changepoints (golden)
        "pelt_changepoints_crawl": _pelt_changepoints_crawl,
        # exact 1-D Wasserstein weekly drift (golden)
        "wasserstein_weekly_crawl": _wasserstein_weekly_crawl,
        # spectral-residual saliency anomaly (golden)
        "spectral_residual_crawl": _spectral_residual_crawl,
        "cusum_crawl": _cusum_crawl,
        "seasonal_baseline_crawl": _seasonal_baseline_crawl,
        "autocorr_lag1_crawl": _autocorr_lag1_crawl,
        "acf_ljungbox_crawl": _acf_ljungbox_crawl,
        "mann_kendall_crawl": _mann_kendall_crawl,
        "freshness_coverage_crawl": _freshness_coverage_crawl,
        "anchor_text_rollup_crawl": _anchor_text_rollup_crawl,
        "holt_winters_crawl": _holt_winters_crawl,
        "sax_motifs_crawl": _sax_motifs_crawl,
        "matrix_profile_discord_crawl": _matrix_profile_discord_crawl,
        "boilerplate_extract_documents": _boilerplate_extract_documents,
        "ts_features_crawl": _ts_features_crawl,
        "ts_kmeans_crawl": _ts_kmeans_crawl,
        "change_rate_crawl": _change_rate_crawl,
        "sdt_downsample_crawl": _sdt_downsample_crawl,
        "dtw_classify_crawl": _dtw_classify_crawl,
        "crawl_budget_domains": _crawl_budget_domains,
        "snapshot_novelty_crawl": _snapshot_novelty_crawl,
        "shesd_anomalies_crawl": _shesd_anomalies_crawl,
        "periodogram_peak_crawl": _periodogram_peak_crawl,
        "kleinberg_bursts_crawl": _kleinberg_bursts_crawl,
        "update_hour_modal_crawl": _update_hour_modal_crawl,
        "segment_trends_crawl": _segment_trends_crawl,
        "xcorr_lag_crawl": _xcorr_lag_crawl,
        "tdigest_quantile_daily": _tdigest_quantile_daily,
        # KLL quantile sketch (golden)
        "kll_quantile_daily": _kll_quantile_daily,
        "rfm_segments_events": _rfm_segments_events,
        "km_staleness_crawl": _km_staleness_crawl,
        "recrawl_list_crawl": _recrawl_list_crawl,
        "mad_anomaly_crawl": _mad_anomaly_crawl,
        "time_weighted_avg_crawl": _time_weighted_avg_crawl,
        "unigram_logprob_documents": _unigram_logprob_documents,
        "bigram_logprob_documents": _bigram_logprob_documents,
        "duplicate_ngrams_documents": _duplicate_ngrams_documents,
        "series_gaps_crawl": _series_gaps_crawl,
        "stl_decompose_daily": _stl_decompose_daily,
        "binseg_changepoints_crawl": _binseg_changepoints_crawl,
        "theil_sen_crawl": _theil_sen_crawl,
        "spearman_crawl": _spearman_crawl,
        "ddsketch_quantile_daily": _ddsketch_quantile_daily,
        "domain_daily_crawl": _domain_daily_crawl,
        "wow_change_crawl": _wow_change_crawl,
        "cohort_retention_events": _cohort_retention_events,
        "funnel_events": _funnel_events,
        "dau_events": _dau_events,
        # CUPED variance-reduced experiment readout (SQL-checked)
        "cuped_events": _cuped_events,
        # sequential-pattern (a then b) support mining (SQL-checked)
        "seq_patterns_events": _seq_patterns_events,
        # event-time lateness histogram (SQL-checked)
        "lateness_histogram_events": _lateness_histogram_events,
        # exact Shapley channel attribution (golden)
        "shapley_attribution_events": _shapley_attribution_events,
        # Cox proportional hazards (golden)
        "cox_hazard_events": _cox_hazard_events,
        "exact_quantile_daily": _exact_quantile_daily,
        "reservoir_sample_events": _reservoir_sample_events,
        "bm25_topk_documents": _bm25_topk_documents,
        "hybrid_rrf_documents": _hybrid_rrf_documents,
        "pagerank_domains_crawl": _pagerank_domains_crawl,
        # personalized PageRank from a deterministic seed set (golden)
        "ppr_domains_crawl": _ppr_domains_crawl,
        # Brandes betweenness centrality (golden)
        "betweenness_domains_crawl": _betweenness_domains_crawl,
        # derandomized DeepWalk sampling (golden)
        "deepwalk_visits_crawl": _deepwalk_visits_crawl,
        # Weisfeiler-Lehman color refinement (golden)
        "wl_colors_crawl": _wl_colors_crawl,
        "hits_domains_crawl": _hits_domains_crawl,
        "domain_components_crawl": _domain_components_crawl,
        "link_degree_crawl": _link_degree_crawl,
        "token_entropy_documents": _token_entropy_documents,
        "zipf_slope_documents": _zipf_slope_documents,
        "lang_entropy_domains": _lang_entropy_domains,
        "compression_signal_documents": _compression_signal_documents,
        "pmi_bigrams_documents": _pmi_bigrams_documents,
        "scd2_intervals_crawl": _scd2_intervals_crawl,
        "domain_share_daily": _domain_share_daily,
        "pagerank_words_documents": _pagerank_words_documents,
        "markov_transitions_events": _markov_transitions_events,
        "triangle_count_words": _triangle_count_words,
        "funnel_windowed_events": _funnel_windowed_events,
        "cube_documents": _cube_documents,
        "source_mixture_documents": _source_mixture_documents,
        "decontaminate_documents": _decontaminate_documents,
        "dsir_weights_documents": _dsir_weights_documents,
        "gopher_rules_documents": _gopher_rules_documents,
        "lang_temperature_weights": _lang_temperature_weights,
        "ppl_buckets_documents": _ppl_buckets_documents,
        "user_sessions_events": _user_sessions_events,
        "churned_users_weekly": _churned_users_weekly,
        "session_entry_exit_events": _session_entry_exit_events,
        "cumulative_users_daily": _cumulative_users_daily,
        "full_join_documents_embeddings": _full_join_documents_embeddings,
        "kmeans_embeddings": _kmeans_embeddings,
        "semdedup_embeddings": _semdedup_embeddings,
        "pq_topk_embeddings": _pq_topk_embeddings,
        "ivfpq_topk_embeddings": _ivfpq_topk_embeddings,
        "rolling_mean_time_crawl": _rolling_mean_time_crawl,
        "merge_upsert_crawl": _merge_upsert_crawl,
        "bpe_merges_documents": _bpe_merges_documents,
        "skew_report_crawl": _skew_report_crawl,
        "path_rollup_crawl": _path_rollup_crawl,
        "topk_urls_daily": _topk_urls_daily,
        "corpus_prep_documents": _corpus_prep_documents,
        "attribution_events": _attribution_events,
        "psi_drift_weekly": _psi_drift_weekly,
        "cluster_top_terms": _cluster_top_terms,
        "validate_events": _validate_events,
        "ttl_dedup_crawl": _ttl_dedup_crawl,
        "value_ddsketch_by_type": _value_ddsketch_by_type,
        "error_rate_hourly": _error_rate_hourly,
        "profile_events": _profile_events,
        "quota_events": _quota_events,
        "events_with_user_stats": _events_with_user_stats,
        "winsorized_value_by_type": _winsorized_value_by_type,
        "readability_documents": _readability_documents,
        "journey_trigrams_events": _journey_trigrams_events,
        "benford_value_events": _benford_value_events,
        "inverted_index_documents": _inverted_index_documents,
        "dow_hour_matrix_events": _dow_hour_matrix_events,
        "basket_rules_events": _basket_rules_events,
        "uncertainty_sample_crawl": _uncertainty_sample_crawl,
        "auc_nchars_label": _auc_nchars_label,
        "calibration_bins_nchars": _calibration_bins_nchars,
        "wau_events": _wau_events,
        "funnel_latency_events": _funnel_latency_events,
        "length_histogram_documents": _length_histogram_documents,
        "left_join_documents_embeddings": _left_join_documents_embeddings,
        "partition_extents_crawl": _partition_extents_crawl,
        "metric_correlation_crawl": _metric_correlation_crawl,
        "peak_time_crawl": _peak_time_crawl,
        "session_intervals_crawl": _session_intervals_crawl,
        "snapshot_asof_crawl": _snapshot_asof_crawl,
        "rolling_mean_unbounded": _rolling_mean_unbounded,
        "crawl_sessions": _crawl_sessions,
        "crawl_sessions_unbounded": _crawl_sessions_unbounded,
        "snapshot_deltas_crawl": _snapshot_deltas_crawl,
        "head_domains_crawl": _head_domains_crawl,
        "canonical_urls_crawl": _canonical_urls_crawl,
        # joins (SQL-checked)
        "asof_latest_event": _asof_latest_event,
        "asof_next_event": _asof_next_event,
        "kfold_split_documents": _kfold_split_documents,
        "weighted_sample_documents": _weighted_sample_documents,
        "decayed_topk_urls": _decayed_topk_urls,
        "range_join_events": _range_join_events,
        "join_documents_embeddings": _join_documents_embeddings,
        "semi_join_documents": _semi_join_documents,
        "bloom_semi_join_documents": _bloom_semi_join_documents,
        "anti_join_documents": _anti_join_documents,
        "regression_metrics_embeddings": _regression_metrics_embeddings,
        # scoring (SQL-checked: affine logits spelled out in the oracle)
        "scored_crawl": _scored_crawl,
        "scored_proba_crawl": _scored_proba_crawl,
        "scored_regression_crawl": _scored_regression_crawl,
        "augmented_rollup": _augmented_rollup,
        # extension surface / samplers / multimodal (rows-only)
        "harmonic_daily": _harmonic_daily,
        "langid_confusion": _langid_confusion,
        "stratified_sample_documents": _stratified_sample_documents,
        "train_test_split_sizes": _train_test_split_sizes,
        "html_byte_features": _html_byte_features,
        "resized_thumbnails_crawl": _resized_thumbnails_crawl,
        # compressed PNG decode (zlib inflate + unfilter; golden from raw)
        "png_thumbnails_crawl": _png_thumbnails_crawl,
        # baseline JPEG entropy decode (golden from the lossy core)
        "jpeg_thumbnails_crawl": _jpeg_thumbnails_crawl,
        # GIF LZW decode (golden)
        "gif_thumbnails_crawl": _gif_thumbnails_crawl,
        # 3-component YCbCr color JPEG (4:2:0 + 4:4:4), golden-checked
        "jpeg_color_thumbnails_crawl": _jpeg_color_thumbnails_crawl,
        "wav_features_crawl": _wav_features_crawl,
        "y4m_scene_stats_crawl": _y4m_scene_stats_crawl,
        "extract_links_crawl": _extract_links_crawl,
        "rank_in_domain_crawl": _rank_in_domain_crawl,
        "typo_pairs_urls": _typo_pairs_urls,
        "intersect_urls_weeks": lambda sf: _set_op_urls_weeks(
            sf, "intersect"),
        "except_urls_weeks": lambda sf: _set_op_urls_weeks(sf, "except"),
        "frame_samples": _frame_samples,
        # training driver + tune hook (golden-checked)
        "sniffed_assets_crawl": _sniffed_assets_crawl,
        "train_linear_fit": _train_linear_fit,
        "quality_classifier_documents": _quality_classifier_documents,
        "train_linear_weights": _train_linear_weights,
        "tune_trials": _tune_trials,
        # sub-document dedup + frequent items (SQL-checked)
        "paragraph_dedup_documents": _paragraph_dedup_documents,
        "heavy_hitters_documents": _heavy_hitters_documents,
        # tokenizer application (golden-checked)
        "bpe_encode_documents": _bpe_encode_documents,
        # URL blocklist filtering (SQL-checked)
        "url_filter_crawl": _url_filter_crawl,
        # distribution-shift hypothesis tests (SQL-checked)
        "welch_ttest_crawl": _welch_ttest_crawl,
        "mannwhitney_crawl": _mannwhitney_crawl,
        "ks_test_crawl": _ks_test_crawl,
        "chi2_lang_weekly": _chi2_lang_weekly,
        # FDR-controlled per-domain drift screen (SQL-checked)
        "domain_drift_bh_crawl": _domain_drift_bh_crawl,
        # distributed PCA (golden-checked)
        "pca_projection_embeddings": _pca_projection_embeddings,
        # Newton/IRLS logistic regression (exact distributed Hessian)
        "logreg_fit_embeddings": _logreg_fit_embeddings,
        # margin-based data pruning (composed fit -> select, golden)
        "margin_prune_embeddings": _margin_prune_embeddings,
        # Ledoit-Wolf covariance shrinkage (golden)
        "ledoit_wolf_embeddings": _ledoit_wolf_embeddings,
        # Frequent-Directions matrix sketch (golden)
        "fd_sketch_embeddings": _fd_sketch_embeddings,
        # Random Fourier Features kernel approximation (golden)
        "rff_kernel_embeddings": _rff_kernel_embeddings,
        # Duffield priority sampling (golden)
        "priority_sample_documents": _priority_sample_documents,
        # multi-source BFS crawl depth (SQL recursive-CTE twin)
        "crawl_depth_bfs": _crawl_depth_bfs,
        # Naive Bayes language classifier (SQL-checked)
        "naive_bayes_lang_documents": _naive_bayes_lang_documents,
        # Adamic-Adar link prediction (SQL-checked)
        "adamic_adar_crawl": _adamic_adar_crawl,
        # Mahalanobis outlier scores (golden-checked)
        "mahalanobis_embeddings": _mahalanobis_embeddings,
        # rolling-origin forecast backtest + MASE (golden-checked)
        "forecast_backtest_crawl": _forecast_backtest_crawl,
        # split-conformal prediction intervals (SQL-checked)
        "conformal_intervals_crawl": _conformal_intervals_crawl,
        # k-center coreset selection (golden-checked)
        "kcenter_select_embeddings": _kcenter_select_embeddings,
        # histogram-GBDT stump boosting (golden-checked)
        "gbdt_fit_embeddings": _gbdt_fit_embeddings,
        # k-core decomposition (golden: exact peeling oracle)
        "kcore_domains_crawl": _kcore_domains_crawl,
        # Kneser-Ney smoothed bigram LM (SQL-checked)
        "kneser_ney_bigrams_documents": _kneser_ney_bigrams_documents,
        # ALS matrix factorization + top-1 recommendation (golden)
        "als_recommend_events": _als_recommend_events,
        # 1-hop neighbor feature aggregation (SQL-checked)
        "neighbor_agg_crawl": _neighbor_agg_crawl,
        # k-anonymity audit (SQL-checked)
        "k_anonymity_documents": _k_anonymity_documents,
        # l-diversity audit (SQL-checked)
        "l_diversity_documents": _l_diversity_documents,
        # Mondrian k-anonymization partitions (golden)
        "mondrian_partitions_documents": _mondrian_partitions_documents,
        # isotonic (PAV) calibration (golden)
        "isotonic_calibration_nchars": _isotonic_calibration_nchars,
        # ANN recall@k vs exact top-k (golden)
        "ann_recall_embeddings": _ann_recall_embeddings,
        # Markov removal-effect multi-touch attribution (golden)
        "removal_attribution_events": _removal_attribution_events,
        # hard-negative mining for contrastive training (golden)
        "hard_negatives_embeddings": _hard_negatives_embeddings,
        # label-propagation communities (golden)
        "lpa_communities_crawl": _lpa_communities_crawl,
        # Gini crawl-budget concentration per domain (SQL-checked)
        "gini_domains_crawl": _gini_domains_crawl,
        # eps-DP Laplace-noised domain counts (golden)
        "dp_counts_domains": _dp_counts_domains,
        # Z-order layout optimization + zone maps (SQL-checked)
        "zorder_layout_crawl": _zorder_layout_crawl,
        # Hilbert-curve layout (golden — rotations not SQL-expressible)
        "hilbert_layout_crawl": _hilbert_layout_crawl,
        # DGIM sliding-window change counting per url (golden)
        "dgim_change_count_crawl": _dgim_change_count_crawl,
        # seeded per-domain bootstrap CI (golden)
        "bootstrap_ci_crawl": _bootstrap_ci_crawl,
        # James-Stein empirical-Bayes domain means (golden)
        "james_stein_domains": _james_stein_domains,
        # Bloom sidecar partition pruning (golden)
        "bloom_prune_crawl": _bloom_prune_crawl,
        # curriculum fixed-token-budget sharding (SQL-checked)
        "curriculum_shards_documents": _curriculum_shards_documents,
        # Huber robust regression via IRLS (golden)
        "huber_fit_crawl": _huber_fit_crawl,
        # reciprocity + assortativity graph stats (SQL-checked)
        "graph_stats_crawl": _graph_stats_crawl,
        # isolation-forest outliers (golden)
        "iforest_outliers_embeddings": _iforest_outliers_embeddings,
        # rendezvous-hash reshard cost vs mod-N (SQL-checked)
        "rendezvous_reshard_crawl": _rendezvous_reshard_crawl,
        # JL projection distortion histogram (golden)
        "jl_distortion_embeddings": _jl_distortion_embeddings,
        # LSA top component via distributed power iteration (golden)
        "lsa_top_terms_documents": _lsa_top_terms_documents,
        # mutual-information feature ranking (golden)
        "mi_feature_rank_embeddings": _mi_feature_rank_embeddings,
        # Dunning LLR collocations (SQL-checked)
        "llr_bigrams_documents": _llr_bigrams_documents,
        # RAKE keyword extraction (golden)
        "rake_keywords_documents": _rake_keywords_documents,
        # user-user Jaccard co-engagement (SQL-checked)
        "user_jaccard_events": _user_jaccard_events,
        # AR(1) mean-reversion half-life per url (SQL-checked)
        "ar1_halflife_crawl": _ar1_halflife_crawl,
        # Haar wavelet energy signature per url (golden)
        "haar_energy_crawl": _haar_energy_crawl,
        # item-item lift market basket (SQL-checked)
        "item_lift_events": _item_lift_events,
        # 2-hop frontier size per domain (SQL-checked)
        "twohop_domains_crawl": _twohop_domains_crawl,
        # weekly link-graph edge churn (SQL-checked)
        "link_churn_weekly_crawl": _link_churn_weekly_crawl,
    }.items()}


#: The external correctness driver checks the FIRST 50 queries() entries
#: only, so dict order is the coverage window.  Rounds 1-4 collected
#: green driver rows for 144 unique queries; this round the window
#: ROTATES again (VERDICT r4 #2) to 48 entries that have never had an
#: external CORRECTNESS_rN row — the full TPC-H batch (20 queries,
#: which also exercise the new hash_join empty-block purge guard end
#: to end), multimodal decode (PNG/JPEG/WAV/Y4M), graph (PageRank,
#: HITS, betweenness, graph stats), time-series analytics (Holt,
#: CUSUM, Theil-Sen, BinSeg, Theta, spectral residual, PELT),
#: sketches (AMS F2, CMS, KMV, DDSketch, KLL), text curation
#: (dup-span trim, sorted-neighborhood dedup, paragraph dedup, Gopher
#: rules, perplexity buckets) and behavior (funnel, sessions, Markov
#: transitions) — PLUS the two r4 flaky rows pinned in so the round
#: produces deterministic-green driver evidence for the schema-guard
#: fix (VERDICT r4 #1): ``adamic_adar_crawl``,
#: ``srp_near_dup_embeddings``.  Everything else follows after.
DRIVER_WINDOW = [
    "adamic_adar_crawl", "srp_near_dup_embeddings",
    "q2_min_cost_supplier", "q4_priority_semi",
    "q5_local_supplier_volume", "q6_revenue_forecast",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts",
    "q12_priority_by_status", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_variety",
    "q17_small_quantity_revenue", "q18_large_volume_orders",
    "q19_disjunctive_revenue", "q20_promotion_suppliers",
    "q21_suppliers_waiting", "q22_idle_customers",
    "png_thumbnails_crawl", "jpeg_thumbnails_crawl",
    "wav_features_crawl", "y4m_scene_stats_crawl",
    "pagerank_domains_crawl", "hits_domains_crawl",
    "betweenness_domains_crawl", "graph_stats_crawl",
    "holt_linear_crawl", "cusum_crawl", "theil_sen_crawl",
    "binseg_changepoints_crawl", "theta_forecast_crawl",
    "spectral_residual_crawl", "pelt_changepoints_crawl",
    "ams_f2_urls", "cms_heavy_domains_crawl", "kmv_overlap_weeks",
    "ddsketch_quantile_daily", "kll_quantile_daily",
    "trim_dup_spans_documents", "snm_near_dup_documents",
    "paragraph_dedup_documents", "gopher_rules_documents",
    "ppl_buckets_documents", "funnel_events", "user_sessions_events",
    "markov_transitions_events",
]


def ordered_queries() -> dict[str, Callable[[str], Any]]:
    """build_queries() reordered so DRIVER_WINDOW comes first."""
    qs = build_queries()
    out = {k: qs[k] for k in DRIVER_WINDOW if k in qs}
    out.update({k: v for k, v in qs.items() if k not in out})
    return out


def _golden_sql(name: str) -> str:
    """Golden-file oracle: read the stored expected output (produced by
    the INDEPENDENT pandas implementation in oracle/golden.py via
    tools/make_golden.py), dispatching on the events row count, which
    uniquely identifies the scale factor (1000/10000/100000)."""
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent.parent / "golden"
    parts = []
    for n, tag in [(1000, "sf0001"), (10000, "sf001"), (100000, "sf01")]:
        p = root / f"{name}_{tag}.parquet"
        if p.exists():
            parts.append(
                f"SELECT g.* FROM read_parquet('{p}') g "
                f"WHERE (SELECT count(*) FROM events) = {n}")
    return "\nUNION ALL\n".join(parts)


#: queries whose oracle is a golden parquet (deterministic / seeded
#: operators that ANSI SQL cannot express).
GOLDEN_QUERIES = [
    "pca_projection_embeddings", "mahalanobis_embeddings",
    "forecast_backtest_crawl", "kcenter_select_embeddings",
    "gbdt_fit_embeddings", "kcore_domains_crawl",
    "embedding_near_dup_ivf", "hll_distinct_urls_daily",
    "hll_weekly_from_daily", "ams_f2_urls", "canonical_urls_crawl",
    "langid_documents", "langid_confusion", "simhash_documents",
    "fingerprint_documents", "minhash_near_dup_documents", "ivf_topk",
    "stratified_sample_documents", "train_test_split_sizes",
    "harmonic_daily", "augmented_rollup", "html_byte_features",
    "frame_samples", "hist_quantile_daily", "gorilla_segments",
    "simhash_drift_crawl", "bloom_semi_join_documents",
    "kmv_distinct_urls_daily", "near_dup_clusters_documents",
    "near_dup_keep_one_documents", "simhash_near_dup_documents",
    "incremental_near_dup_documents", "lttb_downsample_crawl",
    "ewma_crawl", "partition_extents_crawl",
    "holt_linear_crawl", "cusum_crawl", "reservoir_sample_events",
    "compression_signal_documents", "pagerank_words_documents",
    "source_mixture_documents", "kmeans_embeddings",
    "pq_topk_embeddings", "bpe_merges_documents", "skew_report_crawl",
    "corpus_prep_documents", "cluster_top_terms",
    "semdedup_embeddings",
    "ivfpq_topk_embeddings", "train_linear_fit", "train_linear_weights",
    "logreg_fit_embeddings", "winnowing_near_dup_documents",
    "margin_prune_embeddings", "priority_sample_documents",
    "ledoit_wolf_embeddings", "fd_sketch_embeddings",
    "mondrian_partitions_documents", "rff_kernel_embeddings",
    "betweenness_domains_crawl", "isotonic_calibration_nchars",
    "deepwalk_visits_crawl", "wl_colors_crawl", "theta_forecast_crawl",
    "spectral_residual_crawl", "dp_counts_domains",
    "croston_rate_crawl", "pelt_changepoints_crawl",
    "wasserstein_weekly_crawl",
    "cdc_dedup_ratio_crawl", "shapley_attribution_events",
    "cox_hazard_events",
    "hilbert_layout_crawl", "dgim_change_count_crawl",
    "ppr_domains_crawl", "bootstrap_ci_crawl", "kll_quantile_daily",
    "james_stein_domains",
    "quality_classifier_documents", "binseg_changepoints_crawl",
    "holt_winters_crawl", "sax_motifs_crawl",
    "matrix_profile_discord_crawl", "boilerplate_extract_documents",
    "tune_trials", "sniffed_assets_crawl", "resized_thumbnails_crawl",
    "png_thumbnails_crawl", "jpeg_thumbnails_crawl",
    "jpeg_color_thumbnails_crawl", "gif_thumbnails_crawl",
    "wav_features_crawl", "y4m_scene_stats_crawl",
    "bpe_encode_documents",
    "srp_near_dup_embeddings", "weighted_sample_documents",
    "cms_heavy_domains_crawl", "kmv_overlap_weeks",
    "pagerank_domains_crawl", "hits_domains_crawl",
    "ts_kmeans_crawl", "sdt_downsample_crawl", "dtw_classify_crawl",
    "snapshot_novelty_crawl", "shesd_anomalies_crawl",
    "periodogram_peak_crawl", "kleinberg_bursts_crawl",
    "segment_trends_crawl", "xcorr_lag_crawl",
    "tdigest_quantile_daily", "km_staleness_crawl",
    "als_recommend_events", "ann_recall_embeddings",
    "removal_attribution_events", "hard_negatives_embeddings",
    "lpa_communities_crawl", "bloom_prune_crawl", "huber_fit_crawl",
    "iforest_outliers_embeddings", "jl_distortion_embeddings",
    "lsa_top_terms_documents", "mi_feature_rank_embeddings",
    "rake_keywords_documents", "haar_energy_crawl",
]


def build_oracle_sql() -> dict[str, str]:
    golden = {name: _golden_sql(name) for name in GOLDEN_QUERIES}
    golden = {k: v for k, v in golden.items() if v}
    out = {**golden,
        "label_centroids_embeddings": """
SELECT CAST(label AS BIGINT) AS label, d.dim AS dim,
       round(sum(CAST(embedding[d.dim + 1] AS DOUBLE)) / count(*), 6)
           AS mean_val
FROM embeddings
CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
GROUP BY 1, 2""",
        "pack_sequences_documents": """
WITH tok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
  FROM tok)
SELECT doc_id, n_tokens, tok_start,
       tok_start // 128 AS win_first,
       (tok_start + n_tokens - 1) // 128 AS win_last,
       tok_start % 128 AS win_offset
FROM cum""",
        "chunk_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS ts,
         len(string_split(text, ' ')) AS n
  FROM documents)
SELECT doc_id, s.s // 48 AS chunk_id,
       array_to_string(ts[s.s + 1 : s.s + 64], ' ') AS chunk_text,
       least(64, n - s.s) AS n_tokens
FROM toks CROSS JOIN LATERAL
  (SELECT unnest(generate_series(0, n - 1, 48)) AS s) s""",
        "nearest_centroid_embeddings": """
WITH cent AS MATERIALIZED (
  SELECT CAST(label AS BIGINT) AS label, d.dim AS dim,
         round(sum(CAST(embedding[d.dim + 1] AS DOUBLE)) / count(*), 6)
             AS mean_val
  FROM embeddings
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
  GROUP BY 1, 2),
dist AS MATERIALIZED (
  SELECT e.vec_id, c.label,
         sum((CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.mean_val)
             * (CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.mean_val)) AS d2
  FROM embeddings e CROSS JOIN cent c
  GROUP BY 1, 2)
SELECT vec_id, label AS pred_label
FROM (SELECT vec_id, label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY round(d2, 6), label) AS rn
      FROM dist)
WHERE rn = 1""",
        "knn_classify_embeddings": """
WITH test AS MATERIALIZED (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
         CAST(label AS BIGINT) AS true_label
  FROM embeddings WHERE vec_id % 50 = 0),
train AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tv,
         CAST(label AS BIGINT) AS l
  FROM embeddings WHERE vec_id % 50 <> 0),
s AS (SELECT t.query_id, t.true_label, r.vec_id, r.l,
             round(list_cosine_similarity(t.qv, r.tv), 6) AS score
      FROM test t CROSS JOIN train r),
rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, vec_id) AS rn FROM s),
kn AS (SELECT query_id, true_label, l, score FROM rk WHERE rn <= 10),
v AS (SELECT query_id, true_label, l, count(*) AS votes,
             round(sum(score), 6) AS sim_sum
      FROM kn GROUP BY 1, 2, 3),
w AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY votes DESC, sim_sum DESC, l) AS r FROM v)
SELECT query_id, true_label, l AS pred_label, votes FROM w WHERE r = 1""",
        "global_rank_documents": """
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
       percent_rank() OVER (ORDER BY n_chars, doc_id) AS percentile
FROM documents""",
        "ntile_documents": """
SELECT doc_id, n_chars,
       ntile(4) OVER (ORDER BY n_chars, doc_id) AS tile
FROM documents""",
        "regex_token_stats_documents": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha,
       len(regexp_extract_all(text, '[0-9]+')) AS n_digit,
       len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
       len(regexp_extract_all(text, '[A-Za-z]+'))
       + len(regexp_extract_all(text, '[0-9]+'))
       + len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_tokens
FROM documents""",
        "scrub_pii_documents": r"""
WITH comp AS MATERIALIZED (
  SELECT doc_id,
         substr(text, 1, 80) || ' contact: user' || CAST(doc_id AS VARCHAR)
         || '@mail.example.org ip 10.' || CAST(doc_id % 200 AS VARCHAR)
         || '.0.7 tel: +1 555 0100 ' || CAST(doc_id % 90 + 10 AS VARCHAR)
         AS t
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      AS n_email,
  len(regexp_extract_all(t, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ipv4,
  len(regexp_extract_all(t, '\+?\d[\d -]{7,}\d')) AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g'),
      '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS scrubbed
FROM comp""",
        "crawl_extract": f"""{CRAWL_PREFIX}
SELECT url, warc_ts, lang, text, text_len, word_count FROM scr""",
        "crawl_dedup": f"""{CRAWL_PREFIX}
SELECT url, warc_ts, lang, text_len, word_count FROM obs""",
        "rouge_overlap_crawl": f"""{CRAWL_PREFIX},
ddr AS MATERIALIZED (
  SELECT url, warc_ts, text FROM (
    SELECT url, warc_ts, text, row_number() OVER (
      PARTITION BY url, warc_ts
      ORDER BY text_len, word_count, lang, text) AS rn FROM scr)
  WHERE rn = 1),
rk AS MATERIALIZED (
  SELECT url, warc_ts, text,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts) AS rk
  FROM ddr),
cnt AS MATERIALIZED (
  SELECT url, rk, tok, count(*) AS c FROM (
    SELECT url, rk, unnest(string_split(text, ' ')) AS tok FROM rk)
  GROUP BY 1, 2, 3),
tot AS MATERIALIZED (
  SELECT url, rk, CAST(sum(c) AS DOUBLE) AS n FROM cnt GROUP BY 1, 2),
ovl AS MATERIALIZED (
  SELECT a.url, b.rk AS rk, CAST(sum(least(a.c, b.c)) AS DOUBLE) AS i
  FROM cnt a JOIN cnt b ON a.url = b.url AND b.rk = a.rk + 1
                        AND a.tok = b.tok
  GROUP BY 1, 2)
SELECT r.url, r.warc_ts,
       round(COALESCE(o.i, 0) / tb.n, 6) AS rouge1_p,
       round(COALESCE(o.i, 0) / ta.n, 6) AS rouge1_r
FROM rk r
JOIN tot tb ON tb.url = r.url AND tb.rk = r.rk
JOIN tot ta ON ta.url = r.url AND ta.rk = r.rk - 1
LEFT JOIN ovl o ON o.url = r.url AND o.rk = r.rk""",
        "rejects_crawl": f"""WITH {CRAWL_CTE},
mangled AS MATERIALIZED (
  SELECT url, warc_ts,
    CASE WHEN length(text) % 7 = 0 THEN '<html>' || text || '</html>'
         WHEN length(text) % 7 = 1 THEN '<html><body></body></html>'
         ELSE CAST(html AS VARCHAR) END AS h
  FROM crawl)
SELECT url, warc_ts,
  CASE WHEN NOT regexp_matches(h, '(?s)<body>(.*)</body>')
       THEN 'no_body' ELSE 'empty_body' END AS reason
FROM mangled
WHERE regexp_extract(h, '(?s)<body>(.*)</body>', 1) = ''""",
        "rollup_hourly": _rollup_sql("hour"),
        "rollup_daily": _rollup_sql("day"),
        "rollup_weekly": _rollup_sql("week"),
        "hopping_rollup_6h_1h": f"""{CRAWL_PREFIX}
SELECT url, metric,
       make_timestamp(CAST(epoch_us(warc_ts) AS BIGINT) // 3600000000
                      * 3600000000 - i.i * 3600000000) AS bucket_ts,
       count(*) AS "count", sum(value) AS "sum", min(value) AS "min",
       max(value) AS "max", sum(value) / count(*) AS "mean",
       arg_max(value, warc_ts) AS "last"
FROM obs_long CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS i) i
GROUP BY 1, 2, 3""",
        "lang_daily": f"""{CRAWL_PREFIX}
SELECT url, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
       lang, count(*) AS n
FROM obs GROUP BY 1, 2, 3""",
        "gapfill_linear": _GAPFILL_LINEAR_SQL,
        "gapfill_locf": _GAPFILL_LOCF_SQL,
        "gapfill_none": _GAPFILL_NONE_SQL,
        "gapfill_seasonal": _GAPFILL_SEASONAL_SQL,
        "gapfill_unbounded": _GAPFILL_LINEAR_SQL,
        "training_windows": f"""{CRAWL_PREFIX},
{_GAPFILL_GRID_SQL},
w AS (
  SELECT url, metric, grid_ts,
         (row_number() OVER (PARTITION BY url, metric
                             ORDER BY grid_ts) - 1) // 96 AS win_idx
  FROM grid)
SELECT url, metric, CAST(win_idx AS BIGINT) AS win_idx,
       min(grid_ts) AS t0, count(*) AS n_valid
FROM w GROUP BY 1, 2, 3""",
        "events_rollup_hourly": """
SELECT CAST(user_id AS VARCHAR) AS entity,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
       count(*) AS "count", min(value) AS "min", max(value) AS "max",
       arg_max(value, ts) AS "last"
FROM events GROUP BY 1, 2""",
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_base_price_cents,
       min(CAST(l_quantity AS BIGINT)) AS min_qty,
       max(CAST(l_quantity AS BIGINT)) AS max_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2 ORDER BY 1, 2""",
        "orders_per_nation": """
SELECT n.n_name AS nation, count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1 ORDER BY 1""",
        "snm_near_dup_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(lower(text), ' ') AS ts,
         len(string_split(lower(text), ' ')) AS n
  FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(ts[g.i + 1 : g.i + 3], ' ') AS s
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(0, n - 3)) AS i) g
  WHERE n >= 3),
sz AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
ranked AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY substr(lower(text), 1, 24), doc_id)
             AS rn
  FROM documents),
cand AS MATERIALIZED (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
                  greatest(a.doc_id, b.doc_id) AS id_b
  FROM ranked a JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + 3),
inter AS MATERIALIZED (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
       round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM cand c JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sz sa ON sa.doc_id = c.id_a JOIN sz sb ON sb.doc_id = c.id_b
WHERE round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) >= 0.5""",
        "pivot_lang_weekly": f"""{CRAWL_PREFIX}
SELECT CAST(date_trunc('week', warc_ts) AS TIMESTAMP) AS bucket_ts,
       count(*) FILTER (lang = 'de') AS n_de,
       count(*) FILTER (lang = 'en') AS n_en,
       count(*) FILTER (lang = 'es') AS n_es,
       count(*) FILTER (lang = 'fr') AS n_fr,
       count(*) FILTER (lang = 'zh') AS n_zh,
       count(*) AS n_total
FROM obs GROUP BY 1""",
        "dup_spans_documents": """
WITH tok AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS MATERIALIZED (
  SELECT t.doc_id, i.i - 1 AS pos,
         array_to_string(t.w[i.i : i.i + 3], ' ') AS gram
  FROM tok t, LATERAL (
    SELECT unnest(generate_series(1, len(t.w) - 3)) AS i) i),
dup AS (SELECT gram FROM grams GROUP BY gram
        HAVING min(doc_id) <> max(doc_id)),
hits AS (SELECT g.doc_id, g.pos FROM grams g
         JOIN dup d ON g.gram = d.gram),
brk AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
             ORDER BY pos) <= 4 THEN 0 ELSE 1 END AS b FROM hits),
isl AS (SELECT doc_id, pos, sum(b) OVER (PARTITION BY doc_id
        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS grp FROM brk)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 3 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, grp""",
        "trim_dup_spans_documents": """
WITH tok AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS MATERIALIZED (
  SELECT t.doc_id, i.i - 1 AS pos,
         array_to_string(t.w[i.i : i.i + 3], ' ') AS gram
  FROM tok t, LATERAL (
    SELECT unnest(generate_series(1, len(t.w) - 3)) AS i) i),
dup AS (SELECT gram FROM grams GROUP BY gram
        HAVING min(doc_id) <> max(doc_id)),
hits AS (SELECT g.doc_id, g.pos FROM grams g
         JOIN dup d ON g.gram = d.gram),
brk AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
             ORDER BY pos) <= 4 THEN 0 ELSE 1 END AS b FROM hits),
isl AS (SELECT doc_id, pos, sum(b) OVER (PARTITION BY doc_id
        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS grp FROM brk),
spans AS MATERIALIZED (
  SELECT doc_id, min(pos) AS s, max(pos) + 3 AS e
  FROM isl GROUP BY doc_id, grp),
pos AS MATERIALIZED (
  SELECT t.doc_id, i.i - 1 AS pos, t.w[i.i] AS word
  FROM tok t, LATERAL (
    SELECT unnest(generate_series(1, len(t.w))) AS i) i),
kept AS MATERIALIZED (
  SELECT p.doc_id, p.pos, p.word FROM pos p
  LEFT JOIN spans sp ON sp.doc_id = p.doc_id
       AND p.pos BETWEEN sp.s AND sp.e
  WHERE sp.doc_id IS NULL),
agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos)
             AS text_trimmed,
        count(*) AS n_kept FROM kept GROUP BY doc_id)
SELECT t.doc_id, coalesce(a.text_trimmed, '') AS text_trimmed,
       CAST(len(t.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM tok t LEFT JOIN agg a USING (doc_id)""",
        "jaccard_near_dup_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(lower(text), ' ') AS ts,
         len(string_split(lower(text), ' ')) AS n
  FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(ts[g.i + 1 : g.i + 3], ' ') AS s
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(0, n - 3)) AS i) g
  WHERE n >= 3),
df AS MATERIALIZED (SELECT s, count(*) AS c FROM sh GROUP BY 1),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN df USING (s) JOIN sh b USING (s)
  WHERE df.c BETWEEN 2 AND 32 AND a.doc_id < b.doc_id),
sz AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS MATERIALIZED (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
       round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM cand c JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sz sa ON sa.doc_id = c.id_a JOIN sz sb ON sb.doc_id = c.id_b
WHERE round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) >= 0.5""",
        "q6_revenue_forecast": """
SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_u,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24""",
        "q3_shipping_priority": """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_u
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY 1, 2, 3
ORDER BY revenue_u DESC, l.l_orderkey LIMIT 10""",
        "q5_local_supplier_volume": """
SELECT n.n_name AS nation,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_u
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1""",
        "q14_promo_revenue": """
WITH r AS (
  SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS rev,
         p.p_type = 'PROMO' AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
    AND l.l_shipdate < TIMESTAMP '1997-04-01')
SELECT CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT)
           AS promo_u,
       CAST(sum(rev) AS BIGINT) AS total_u,
       round(100.0 * CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END)
                          AS BIGINT)
             / greatest(1, CAST(sum(rev) AS BIGINT)), 6)
           AS promo_share_pct
FROM r""",
        "q17_small_quantity_revenue": """
WITH pp AS MATERIALIZED (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
             AS sum_q,
         5 * count(*) AS n5
  FROM lineitem GROUP BY 1)
SELECT CAST(sum(CASE WHEN pp.n5 * CAST(l.l_quantity AS BIGINT) < pp.sum_q
                     THEN CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS rev_cents,
       CAST(sum(CASE WHEN pp.n5 * CAST(l.l_quantity AS BIGINT) < pp.sum_q
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_small
FROM lineitem l JOIN pp ON l.l_partkey = pp.l_partkey""",
        "q18_large_volume_orders": """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS BIGINT)) > 200)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY b.total_qty DESC, o.o_orderkey""",
        "q4_priority_semi": """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    WHERE CAST(round(l_discount * 100, 0) AS BIGINT) >= 6)
GROUP BY 1 ORDER BY 1""",
        "q16_supplier_variety": """
SELECT p.p_brand, p.p_type,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 25
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 5000.0)
GROUP BY 1, 2 ORDER BY 1, 2""",
        "q19_disjunctive_revenue": """
WITH flagged AS (
  SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS rev,
         CAST(replace(p.p_brand, 'Brand#', '') AS BIGINT) AS b,
         p.p_size AS sz, CAST(l.l_quantity AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
SELECT CAST(sum(CASE WHEN keep THEN rev ELSE 0 END) AS BIGINT)
           AS revenue_u,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_items
FROM (SELECT rev,
             ((b = 1 AND sz BETWEEN 1 AND 5 AND q BETWEEN 1 AND 11)
              OR (b = 2 AND sz BETWEEN 1 AND 10 AND q BETWEEN 10 AND 20)
              OR (b = 3 AND sz BETWEEN 1 AND 15 AND q BETWEEN 20 AND 30))
                 AS keep
      FROM flagged)""",
        "q7_nation_volume": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_u
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        "q2_min_cost_supplier": """
WITH cost AS MATERIALIZED (
  SELECT l_partkey AS p_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cost_u
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY 1, 2)
SELECT s_acctbal, s_name, n_name, c.p_partkey, p_retailprice, cost_u
FROM cost c
JOIN part p ON c.p_partkey = p.p_partkey
JOIN supplier ON c.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p.p_size <= 15 AND p.p_type = 'PROMO'
  AND cost_u = (SELECT min(c2.cost_u) FROM cost c2
                WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, c.p_partkey LIMIT 100""",
        "q8_market_share": """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN l.rev
                ELSE 0 END) AS BIGINT) AS nation_rev_u,
       CAST(sum(l.rev) AS BIGINT) AS total_rev_u,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN l.rev
                      ELSE 0 END) AS DOUBLE)
             / CAST(sum(l.rev) AS DOUBLE), 6) AS mkt_share
FROM (SELECT l_orderkey, l_suppkey,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev
      FROM lineitem) l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r ON n2.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1""",
        "q9_product_profit": """
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                - CAST(l_quantity AS BIGINT)
                  * CAST(round(p_retailprice * 100, 0) AS BIGINT)
                  * 50) AS BIGINT) AS profit_u
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC""",
        "q11_important_parts": """
WITH val AS MATERIALIZED (
  SELECT l_partkey AS p_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS value_u
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_12'
  GROUP BY 1)
SELECT p_partkey, value_u FROM val
WHERE value_u * 1000000 > (SELECT sum(value_u) * 1000 FROM val)
ORDER BY value_u DESC, p_partkey""",
        "q20_promotion_suppliers": """
WITH sq AS MATERIALIZED (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'large%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2)
SELECT DISTINCT s_name, n_name
FROM sq
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty * 2 > (SELECT sum(qty) FROM sq s2
                 WHERE s2.l_partkey = sq.l_partkey)
ORDER BY s_name""",
        "q21_suppliers_waiting": """
WITH lf AS MATERIALIZED (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lf JOIN supplier ON l_suppkey = s_suppkey
WHERE has_r = 1
  AND (SELECT count(*) FROM lf l2
       WHERE l2.l_orderkey = lf.l_orderkey) > 1
  AND (SELECT sum(has_r) FROM lf l2
       WHERE l2.l_orderkey = lf.l_orderkey) = 1
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""",
        "q12_priority_by_status": """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1""",
        "q13_customer_distribution": """
WITH per AS (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
        "q15_top_supplier": """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
              AS BIGINT) AS total_revenue_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue_u
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_u = (SELECT max(total_revenue_u) FROM revenue)
ORDER BY s.s_suppkey""",
        "q22_idle_customers": """
WITH segcust AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_u
  FROM customer
  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE')),
th AS (
  SELECT CAST(sum(bal_u) AS BIGINT) AS s, count(*) AS n
  FROM segcust WHERE bal_u > 0)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_u) AS BIGINT) AS totacctbal_u
FROM segcust, th
WHERE bal_u * th.n > th.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = segcust.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1 ORDER BY 1""",
        "q10_returned_items": """
WITH per AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
              AS BIGINT) AS revenue_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1998-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-07-01'
  GROUP BY 1
  ORDER BY revenue_u DESC, o.o_custkey LIMIT 20)
SELECT c.c_custkey, c.c_name, n.n_name AS nation, per.revenue_u
FROM per
JOIN customer c ON per.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey""",
        "exact_dedup_documents": """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text""",
        "repetition_documents": """
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
g AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(1, len(l)),
                        i -> l[i] || ' ' || l[i + 1]) AS bg,
         list_transform(range(1, len(l) - 1),
                        i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])
             AS tg
  FROM t)
SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_2grams,
       CASE WHEN len(bg) = 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
       END AS dup_2gram_frac,
       CASE WHEN len(tg) = 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
       END AS dup_3gram_frac
FROM g""",
        "clean_corpus_documents": r"""
WITH sig AS MATERIALIZED (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_filter(string_split(lower(text), ' '),
              w -> w IN ('the','and','of','to','in','is','that','it',
                         'was','for','on','are','with','as'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio,
         list_transform(range(1, len(string_split(text, ' '))),
             i -> string_split(text, ' ')[i] || ' '
                  || string_split(text, ' ')[i + 1]) AS bg
  FROM documents),
f AS MATERIALIZED (
  SELECT doc_id, text, CAST(n_tokens AS BIGINT) AS n_tokens,
         stopword_ratio,
         CASE WHEN len(bg) = 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
         END AS dup_2gram_frac
  FROM sig)
SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
       min(stopword_ratio) AS stopword_ratio,
       min(dup_2gram_frac) AS dup_2gram_frac
FROM f
WHERE n_tokens >= 25 AND stopword_ratio <= 0.08
  AND dup_2gram_frac <= 0.05
GROUP BY text""",
        "tfidf_top3_documents": """
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents),
tf AS MATERIALIZED (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
ntok AS MATERIALIZED (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
df AS MATERIALIZED (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
nd AS (SELECT count(*) AS nd FROM documents),
s AS MATERIALIZED (
  SELECT t.doc_id, t.token,
         round((CAST(t.tf AS DOUBLE) / n.n)
               * ln(CAST(nd.nd AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf t JOIN ntok n USING (doc_id) JOIN df d USING (token)
  CROSS JOIN nd)
SELECT doc_id, token, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, token) AS rn FROM s)
WHERE rn <= 3""",
        "quantiles_daily_crawl": f"""{CRAWL_PREFIX}
SELECT url, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
       count(*) AS n,
       round(quantile_cont(text_len, 0.5), 6) AS p50,
       round(quantile_cont(text_len, 0.9), 6) AS p90,
       round(quantile_cont(text_len, 0.99), 6) AS p99
FROM obs GROUP BY 1, 2""",
        "text_stats_documents": r"""
SELECT doc_id, length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '\w+')) AS n_words,
       len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+'))
           AS n_bpe_tokens,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
           AS chars_per_token
FROM documents""",
        "vocab_top100_documents": """
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
GROUP BY 1 ORDER BY n DESC, token LIMIT 100""",
        "top3_docs_per_lang": """
SELECT doc_id, lang, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
            ORDER BY n_chars DESC, doc_id) AS rn FROM documents)
WHERE rn <= 3""",
        "quality_score_documents": r"""
SELECT doc_id,
  CAST(len(list_filter(string_split(lower(text), ' '),
       w -> w IN ('the','and','of','to','in','is','that','it','was',
                  'for','on','are','with','as'))) AS DOUBLE)
      / len(string_split(text, ' ')) AS stopword_ratio,
  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      / length(text) AS punct_ratio,
  CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
      / length(text) AS upper_ratio,
  CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
      AS mean_word_len
FROM documents""",
        "similarity_topk": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
s AS (SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(q.qv,
                   CAST(e.embedding AS DOUBLE[])), 6) AS score
      FROM q CROSS JOIN embeddings e),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, vec_id) AS rn FROM s)
SELECT query_id, vec_id, score FROM r WHERE rn <= 10""",
        "embedding_near_dup": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      CAST(b.embedding AS DOUBLE[])) >= 0.4""",
        # summaries of the DECODED Gorilla streams must equal summaries
        # of the raw observations — integer-valued metrics make the
        # float sums order-free, ms timestamp sums stay inside int64
        "gorilla_roundtrip": f"""{CRAWL_PREFIX}
SELECT url, metric, count(*) AS n,
       min(warc_ts) AS t_start, max(warc_ts) AS t_end,
       CAST(sum(CAST(epoch_ms(warc_ts) AS BIGINT)) AS BIGINT) AS ts_sum_ms,
       sum(value) AS val_sum, min(value) AS val_min, max(value) AS val_max
FROM obs_long GROUP BY 1, 2""",
        "stm_per_series": f"""{CRAWL_PREFIX}
SELECT url, metric, count(*) AS "count",
       round(sum(value) / count(*), 6) AS "mean",
       round(stddev_pop(value), 6) AS "std",
       min(value) AS "min", max(value) AS "max",
       round(quantile_cont(value, 0.25), 6) AS q25,
       round(quantile_cont(value, 0.50), 6) AS q50,
       round(quantile_cont(value, 0.75), 6) AS q75
FROM obs_long GROUP BY 1, 2""",
        "normalized_metrics": f"""{CRAWL_PREFIX}
SELECT url, warc_ts,
       CAST(text_len AS DOUBLE) * 0.0001 AS text_len_scaled,
       log10(CAST(text_len AS DOUBLE) + 1) AS text_len_log
FROM obs""",
        "class_weights_embeddings": """
WITH h AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS k
      FROM h)
SELECT h.label, h.n, t.total / (CAST(h.n AS DOUBLE) * t.k) AS weight
FROM h, t ORDER BY h.label""",
        "distinct_lang_source": """
SELECT lang, source FROM documents GROUP BY 1, 2""",
        "running_sum_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       sum(value) OVER (PARTITION BY url, metric ORDER BY warc_ts
                        ROWS UNBOUNDED PRECEDING) AS running_sum
FROM obs_long""",
        "running_extrema_crawl": f"""{CRAWL_PREFIX}
SELECT url, warc_ts, metric, value,
       max(value) OVER (PARTITION BY url, metric ORDER BY warc_ts
                        ROWS UNBOUNDED PRECEDING) AS running_max,
       min(value) OVER (PARTITION BY url, metric ORDER BY warc_ts
                        ROWS UNBOUNDED PRECEDING) AS running_min
FROM obs_long""",
        "running_sum_unbounded": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       sum(value) OVER (PARTITION BY url, metric ORDER BY warc_ts
                        ROWS UNBOUNDED PRECEDING) AS running_sum
FROM obs_long""",
        "rolling_mean_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       avg(value) OVER (PARTITION BY url, metric ORDER BY warc_ts
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
           AS rolling_mean
FROM obs_long""",
        "session_intervals_crawl": f"""{CRAWL_PREFIX},
sgaps AS (
  SELECT url, warc_ts,
         CASE WHEN warc_ts - lag(warc_ts) OVER
                   (PARTITION BY url ORDER BY warc_ts)
                   > INTERVAL 24 HOUR THEN 1 ELSE 0 END AS brk
  FROM obs),
sids AS (
  SELECT url, warc_ts,
         CAST(sum(brk) OVER (PARTITION BY url ORDER BY warc_ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_id
  FROM sgaps)
SELECT url, session_id, min(warc_ts) AS start_ts,
       max(warc_ts) AS end_ts, count(*) AS n_snapshots
FROM sids GROUP BY url, session_id""",
        "snapshot_asof_crawl": f"""{CRAWL_PREFIX}
SELECT url, warc_ts, text_len, word_count FROM (
  SELECT url, warc_ts, text_len, word_count,
         row_number() OVER (PARTITION BY url
                            ORDER BY warc_ts DESC) AS rn
  FROM obs WHERE warc_ts < TIMESTAMP '2024-01-16')
WHERE rn = 1""",
        "metric_correlation_crawl": f"""{CRAWL_PREFIX}
SELECT url, count(*) AS n_obs,
       round(corr(CAST(text_len AS DOUBLE),
                  CAST(word_count AS DOUBLE)), 6) AS corr
FROM obs GROUP BY url""",
        "peak_time_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts AS peak_ts, value AS peak_value FROM (
  SELECT url, metric, warc_ts, value,
         row_number() OVER (PARTITION BY url, metric
                            ORDER BY value DESC, warc_ts) AS rn
  FROM obs_long)
WHERE rn = 1""",
        "trend_slope_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, count(*) AS n_obs,
       round(regr_slope(value,
             CAST(epoch_us(warc_ts) AS DOUBLE) / 86400000000.0), 6)
           AS slope
FROM obs_long GROUP BY url, metric""",
        "counter_rate_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       (CASE WHEN value < prev THEN value ELSE value - prev END)
       / (CAST(epoch_us(warc_ts) - epoch_us(prev_ts) AS DOUBLE)
          / 1000000.0) AS rate
FROM (
  SELECT url, metric, warc_ts, value,
         lag(value) OVER w AS prev,
         lag(warc_ts) OVER w AS prev_ts
  FROM obs_long
  WINDOW w AS (PARTITION BY url, metric ORDER BY warc_ts))""",
        "zscore_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       CASE WHEN stddev_pop(value) OVER w > 0
            THEN round((value - avg(value) OVER w)
                       / stddev_pop(value) OVER w, 6)
            ELSE NULL END AS z
FROM obs_long
WINDOW w AS (PARTITION BY url, metric)""",
        "seasonal_baseline_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       CAST(hour(warc_ts) AS BIGINT) AS hod,
       round(avg(value) OVER w, 6) AS baseline,
       round(value - avg(value) OVER w, 6) AS anomaly
FROM obs_long
WINDOW w AS (PARTITION BY url, metric, hour(warc_ts))""",
        "autocorr_lag1_crawl": f"""{CRAWL_PREFIX},
lagged AS (
  SELECT url, metric, value,
         lag(value) OVER (PARTITION BY url, metric
                          ORDER BY warc_ts) AS prev
  FROM obs_long)
SELECT url, metric, count(prev) AS n_pairs,
       round(corr(value, prev), 6) AS autocorr
FROM lagged GROUP BY 1, 2""",
        "acf_ljungbox_crawl": f"""{CRAWL_PREFIX},
daily AS MATERIALIZED (
  SELECT url, metric, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         avg(value) AS v
  FROM obs_long GROUP BY 1, 2, 3),
st AS MATERIALIZED (
  SELECT url, metric, avg(v) AS mu, count(*) AS n_days
  FROM daily GROUP BY 1, 2 HAVING count(*) > 7),
lagged AS (
  SELECT d.url, d.metric, v, mu, n_days,
         {", ".join(f"lag(v, {k}) OVER w AS p{k}" for k in range(1, 8))}
  FROM daily d JOIN st USING (url, metric)
  WINDOW w AS (PARTITION BY d.url, d.metric ORDER BY day)),
acc AS (
  SELECT url, metric, any_value(n_days) AS n_days,
         sum((v - mu) * (v - mu)) AS ss0,
         {", ".join(f"sum((v - mu) * (p{k} - mu)) AS s{k}"
                    for k in range(1, 8))}
  FROM lagged GROUP BY 1, 2)
SELECT url, metric, n_days,
       {", ".join(f"round(CASE WHEN ss0 > 0 THEN s{k} / ss0 END, 6) AS r{k}"
                  for k in range(1, 8))},
       round(CASE WHEN ss0 > 0 THEN n_days * (n_days + 2.0) * (
             {" + ".join(f"(s{k} / ss0) * (s{k} / ss0) / (n_days - {k})"
                         for k in range(1, 8))}) END, 6) AS ljung_box
FROM acc""",
        "mann_kendall_crawl": f"""{CRAWL_PREFIX},
daily AS MATERIALIZED (
  SELECT url, metric, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         avg(value) AS v
  FROM obs_long GROUP BY 1, 2, 3),
nn AS MATERIALIZED (
  SELECT url, metric, count(*) AS n_days
  FROM daily GROUP BY 1, 2 HAVING count(*) >= 3),
s AS MATERIALIZED (
  SELECT a.url, a.metric,
         sum(CASE WHEN b.v > a.v THEN 1
                  WHEN b.v < a.v THEN -1 ELSE 0 END) AS s_stat
  FROM daily a JOIN daily b
    ON a.url = b.url AND a.metric = b.metric AND a.day < b.day
  GROUP BY 1, 2),
ties AS MATERIALIZED (
  SELECT url, metric,
         sum(c * (c - 1.0) * (2 * c + 5.0)) AS tie_term
  FROM (SELECT url, metric, v, count(*) AS c
        FROM daily GROUP BY 1, 2, 3)
  GROUP BY 1, 2),
fin AS (
  SELECT n.url, n.metric, n.n_days,
         CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat,
         (n.n_days * (n.n_days - 1.0) * (2 * n.n_days + 5.0)
          - t.tie_term) / 18.0 AS var_s
  FROM nn n
  LEFT JOIN s ON n.url = s.url AND n.metric = s.metric
  JOIN ties t ON n.url = t.url AND n.metric = t.metric),
zed AS (
  SELECT url, metric, n_days, s_stat, round(var_s, 6) AS var_s,
         round(CASE WHEN var_s > 0 THEN
               CASE WHEN s_stat > 0 THEN (s_stat - 1.0) / sqrt(var_s)
                    WHEN s_stat < 0 THEN (s_stat + 1.0) / sqrt(var_s)
                    ELSE 0.0 END END, 6) AS z
  FROM fin)
SELECT url, metric, n_days, s_stat, var_s, z,
       CASE WHEN z IS NULL THEN 'no_trend'
            WHEN z > 1.96 THEN 'increasing'
            WHEN z < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM zed""",
        "freshness_coverage_crawl": f"""{CRAWL_PREFIX},
iv AS (
  SELECT url, warc_ts AS s, warc_ts + INTERVAL 7 DAY AS e FROM obs),
mk AS (
  SELECT url, s, e,
         CASE WHEN s > coalesce(
               max(e) OVER (PARTITION BY url ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING),
               TIMESTAMP '1677-01-01')
              THEN 1 ELSE 0 END AS new_island
  FROM iv),
isl AS (
  SELECT url, s, e,
         sum(new_island) OVER (PARTITION BY url ORDER BY s) AS island_id
  FROM mk),
agg AS (
  SELECT url, island_id, min(s) AS i_s, max(e) AS i_e, count(*) AS c
  FROM isl GROUP BY 1, 2)
SELECT url, CAST(sum(c) AS BIGINT) AS n_snaps,
       count(*) AS n_islands,
       CAST(sum(epoch_us(i_e) - epoch_us(i_s)) AS BIGINT) AS union_us,
       CAST(epoch_us(max(i_e)) - epoch_us(min(i_s)) AS BIGINT) AS span_us,
       round(sum(epoch_us(i_e) - epoch_us(i_s))
             / (epoch_us(max(i_e)) - epoch_us(min(i_s))), 6) AS coverage
FROM agg GROUP BY 1""",
        "ts_features_crawl": f"""{CRAWL_PREFIX},
daily AS MATERIALIZED (
  SELECT url, metric, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         avg(value) AS v
  FROM obs_long GROUP BY 1, 2, 3),
st AS MATERIALIZED (
  SELECT url, metric, count(*) AS n_days, avg(v) AS mu,
         min(v) AS vmin, max(v) AS vmax
  FROM daily GROUP BY 1, 2 HAVING count(*) >= 3),
mom AS MATERIALIZED (
  SELECT d.url, d.metric,
         avg((v - mu) * (v - mu)) AS m2,
         avg((v - mu) * (v - mu) * (v - mu)) AS m3,
         avg((v - mu) * (v - mu) * (v - mu) * (v - mu)) AS m4
  FROM daily d JOIN st USING (url, metric) GROUP BY 1, 2),
lagged AS (
  SELECT d.url, d.metric, v, mu,
         lag(v) OVER w AS prev,
         row_number() OVER w - 1 AS t
  FROM daily d JOIN st USING (url, metric)
  WINDOW w AS (PARTITION BY d.url, d.metric ORDER BY day)),
acf AS (
  SELECT url, metric,
         sum((v - mu) * (prev - mu)) AS s1,
         sum((v - mu) * (v - mu)) AS ss0,
         sum(CASE WHEN (v - mu) * (prev - mu) < 0
                  THEN 1 ELSE 0 END) AS crossings,
         sum(CASE WHEN v > mu THEN 1 ELSE 0 END) AS n_above,
         regr_slope(v, t) AS slope
  FROM lagged GROUP BY 1, 2)
SELECT st.url, st.metric, st.n_days,
       round(st.mu, 6) AS mean_v,
       round(sqrt(m2), 6) AS std_pop,
       round(CASE WHEN m2 > 0 THEN m3 / (m2 * sqrt(m2)) END, 6) AS skew,
       round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3.0 END, 6)
           AS kurt_excess,
       round(CASE WHEN ss0 > 0 THEN s1 / ss0 END, 6) AS acf1,
       round(slope, 6) AS slope,
       CAST(crossings AS BIGINT) AS crossings,
       round(n_above * 1.0 / st.n_days, 6) AS frac_above,
       round(st.vmax - st.vmin, 6) AS vrange
FROM st
JOIN mom ON st.url = mom.url AND st.metric = mom.metric
JOIN acf ON st.url = acf.url AND st.metric = acf.metric""",
        "rfm_segments_events": """
WITH pu AS MATERIALIZED (
  SELECT user_id, max(ts) AS recency_ts,
         count(*) AS frequency,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
             AS mon_cents
  FROM events GROUP BY 1)
SELECT user_id, recency_ts, frequency, mon_cents,
       ntile(3) OVER (ORDER BY recency_ts, user_id) AS r_score,
       ntile(3) OVER (ORDER BY frequency, user_id) AS f_score,
       ntile(3) OVER (ORDER BY mon_cents, user_id) AS m_score,
       ntile(3) OVER (ORDER BY recency_ts, user_id) * 100
       + ntile(3) OVER (ORDER BY frequency, user_id) * 10
       + ntile(3) OVER (ORDER BY mon_cents, user_id) AS rfm
FROM pu""",
        "update_hour_modal_crawl": f"""{CRAWL_PREFIX},
hr AS MATERIALIZED (
  SELECT url, CAST(extract('hour' FROM warc_ts) AS BIGINT) AS h,
         count(*) AS n
  FROM obs GROUP BY 1, 2),
tot AS (SELECT url, CAST(sum(n) AS BIGINT) AS total FROM hr GROUP BY 1),
pick AS (SELECT url, h, n,
                row_number() OVER (PARTITION BY url
                                   ORDER BY n DESC, h) AS rn
         FROM hr)
SELECT p.url, t.total AS n_snaps, p.h AS modal_hour,
       round(p.n * 1.0 / t.total, 6) + 0.0 AS modal_share
FROM pick p JOIN tot t USING (url) WHERE rn = 1""",
        "change_rate_crawl": f"""{CRAWL_PREFIX},
ch AS MATERIALIZED (
  SELECT url, warc_ts,
         CASE WHEN text <> lag(text) OVER w THEN 1 ELSE 0 END AS chg,
         CASE WHEN lag(text) OVER w IS NULL THEN 0 ELSE 1 END AS hasprev
  FROM obs WINDOW w AS (PARTITION BY url ORDER BY warc_ts)),
agg AS (
  SELECT url,
         CAST(sum(hasprev) AS BIGINT) AS n_intervals,
         CAST(sum(chg) AS BIGINT) AS n_changes,
         (epoch_us(max(warc_ts)) - epoch_us(min(warc_ts))) / 1000000.0
             AS span_s,
         -ln((sum(hasprev) - sum(chg) + 0.5) / (sum(hasprev) + 0.5))
             / (((epoch_us(max(warc_ts)) - epoch_us(min(warc_ts)))
                 / 1000000.0) / sum(hasprev)) * 86400.0 AS lam_day
  FROM ch GROUP BY url)
SELECT url, n_intervals, n_changes,
       round(span_s, 6) + 0.0 AS span_seconds,
       round(lam_day, 6) + 0.0 AS lambda_per_day,
       CASE WHEN n_changes > 0 THEN round(1.0 / lam_day, 6) + 0.0
            END AS recrawl_days
FROM agg""",
        "crawl_budget_domains": f"""{CRAWL_PREFIX},
ch AS MATERIALIZED (
  SELECT url, warc_ts,
         CASE WHEN text <> lag(text) OVER w THEN 1 ELSE 0 END AS chg,
         CASE WHEN lag(text) OVER w IS NULL THEN 0 ELSE 1 END AS hasprev
  FROM obs WINDOW w AS (PARTITION BY url ORDER BY warc_ts)),
rates AS MATERIALIZED (
  SELECT url,
         -ln((sum(hasprev) - sum(chg) + 0.5) / (sum(hasprev) + 0.5))
             / (((epoch_us(max(warc_ts)) - epoch_us(min(warc_ts)))
                 / 1000000.0) / sum(hasprev)) * 86400.0 AS lam_day
  FROM ch GROUP BY url),
agg AS MATERIALIZED (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
         count(*) AS n_urls,
         CAST(sum(CAST(round(round(lam_day, 6) * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS lam_micro
  FROM rates GROUP BY 1),
tot AS (SELECT sum(lam_micro) AS t FROM agg),
ideal AS MATERIALIZED (
  SELECT domain, n_urls, lam_micro,
         floor(CAST(lam_micro * 10000 AS DOUBLE) / t) AS fl,
         CAST(lam_micro * 10000 AS DOUBLE) / t
             - floor(CAST(lam_micro * 10000 AS DOUBLE) / t) AS frac
  FROM agg, tot),
rem AS (SELECT 10000 - CAST(sum(fl) AS BIGINT) AS r FROM ideal)
SELECT domain, n_urls, lam_micro,
       CAST(fl AS BIGINT)
       + CASE WHEN row_number() OVER (ORDER BY frac DESC, domain) <= r
              THEN 1 ELSE 0 END AS quota
FROM ideal, rem""",
        "recrawl_list_crawl": f"""{CRAWL_PREFIX},
ch AS MATERIALIZED (
  SELECT url, warc_ts,
         CASE WHEN text <> lag(text) OVER w THEN 1 ELSE 0 END AS chg,
         CASE WHEN lag(text) OVER w IS NULL THEN 0 ELSE 1 END AS hasprev
  FROM obs WINDOW w AS (PARTITION BY url ORDER BY warc_ts)),
rates AS MATERIALIZED (
  SELECT url,
         round(-ln((sum(hasprev) - sum(chg) + 0.5)
                   / (sum(hasprev) + 0.5))
               / (((epoch_us(max(warc_ts)) - epoch_us(min(warc_ts)))
                   / 1000000.0) / sum(hasprev)) * 86400.0, 6) + 0.0
             AS lambda_per_day
  FROM ch GROUP BY url),
agg AS MATERIALIZED (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
         CAST(sum(CAST(round(lambda_per_day * 1000000.0) AS BIGINT))
              AS BIGINT) AS lam_micro
  FROM rates GROUP BY 1),
tot AS (SELECT sum(lam_micro) AS t FROM agg),
ideal AS MATERIALIZED (
  SELECT domain, lam_micro,
         floor(CAST(lam_micro * 10000 AS DOUBLE) / t) AS fl,
         CAST(lam_micro * 10000 AS DOUBLE) / t
             - floor(CAST(lam_micro * 10000 AS DOUBLE) / t) AS frac
  FROM agg, tot),
rem AS (SELECT 10000 - CAST(sum(fl) AS BIGINT) AS r FROM ideal),
quota AS MATERIALIZED (
  SELECT domain,
         CAST(fl AS BIGINT)
         + CASE WHEN row_number() OVER (ORDER BY frac DESC, domain)
                     <= r THEN 1 ELSE 0 END AS quota
  FROM ideal, rem),
ranked AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
         url, lambda_per_day,
         row_number() OVER (
             PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)
             ORDER BY lambda_per_day DESC, url) AS rank_in_domain
  FROM rates)
SELECT rk.domain, rk.url, rk.lambda_per_day, rk.rank_in_domain,
       q.quota
FROM ranked rk JOIN quota q USING (domain)
WHERE rk.rank_in_domain <= q.quota""",
        "anchor_text_rollup_crawl": f"""WITH {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT c.url,
         'https://site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com/p/' || CAST(j.j AS VARCHAR) AS href,
         'w' || CAST((length(CAST(c.html AS VARCHAR)) + 3 * j.j) % 11
                     AS VARCHAR) AS anchor
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
pc AS MATERIALIZED (
  SELECT href, anchor, count(*) AS c FROM links GROUP BY 1, 2),
top AS (
  SELECT href, anchor AS top_anchor, c AS top_count,
         row_number() OVER (PARTITION BY href
                            ORDER BY c DESC, anchor ASC) AS rn
  FROM pc),
agg AS (SELECT href, CAST(sum(c) AS BIGINT) AS n_links
        FROM pc GROUP BY 1),
src AS (SELECT href, count(DISTINCT url) AS n_sources
        FROM links GROUP BY 1)
SELECT a.href, a.n_links, s.n_sources, t.top_anchor, t.top_count
FROM agg a
JOIN top t ON a.href = t.href AND t.rn = 1
JOIN src s ON a.href = s.href""",
        "mad_anomaly_crawl": f"""{CRAWL_PREFIX},
med AS MATERIALIZED (
  SELECT url, metric, quantile_cont(value, 0.5) AS med
  FROM obs_long GROUP BY 1, 2),
mad AS MATERIALIZED (
  SELECT o.url, o.metric,
         quantile_cont(abs(o.value - m.med), 0.5) AS mad
  FROM obs_long o JOIN med m USING (url, metric) GROUP BY 1, 2)
SELECT o.url, o.metric, o.warc_ts, o.value, m.med, d.mad,
       round(CASE WHEN d.mad > 0 THEN (o.value - m.med) / d.mad
             END, 6) AS robust_z
FROM obs_long o
JOIN med m ON o.url = m.url AND o.metric = m.metric
JOIN mad d ON o.url = d.url AND o.metric = d.metric""",
        "time_weighted_avg_crawl": f"""{CRAWL_PREFIX},
twb AS (
  SELECT url, metric,
         CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
         warc_ts, value
  FROM obs_long),
tww AS (
  SELECT *,
         CAST(lead(epoch_us(warc_ts)) OVER (
             PARTITION BY url, metric, bucket_ts ORDER BY warc_ts)
           - epoch_us(warc_ts) AS DOUBLE) AS w
  FROM twb)
SELECT url, metric, bucket_ts, count(*) AS n_obs,
       round(CASE WHEN coalesce(sum(w), 0.0) > 0.0
                  THEN sum(value * w) / sum(w)
                  ELSE arg_min(value, warc_ts) END, 6) AS twa
FROM tww GROUP BY 1, 2, 3""",
        "stl_decompose_daily": f"""{CRAWL_PREFIX},
stl_daily AS MATERIALIZED (
  SELECT url, metric,
         CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         avg(value) AS v
  FROM obs_long GROUP BY 1, 2, 3),
stl_tr AS MATERIALIZED (
  SELECT *, avg(v) OVER (PARTITION BY url, metric ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            AS trend
  FROM stl_daily),
stl_se AS MATERIALIZED (
  SELECT *, avg(v - trend) OVER (PARTITION BY url, metric,
                                 dayofweek(day)) AS seasonal
  FROM stl_tr)
SELECT url, metric, day, round(v, 6) + 0.0 AS value,
       round(trend, 6) + 0.0 AS trend,
       round(seasonal, 6) + 0.0 AS seasonal,
       round(v - trend - seasonal, 6) + 0.0 AS residual
FROM stl_se""",
        "series_gaps_crawl": f"""{CRAWL_PREFIX},
gapsrc AS (
  SELECT url, metric, warc_ts,
         CAST(epoch_us(warc_ts) - epoch_us(lag(warc_ts) OVER w)
              AS DOUBLE) / 1000000.0 AS gap_s
  FROM obs_long
  WINDOW w AS (PARTITION BY url, metric ORDER BY warc_ts))
SELECT url, metric, count(*) AS n_obs,
       CAST(epoch_us(max(warc_ts)) - epoch_us(min(warc_ts)) AS DOUBLE)
           / 1000000.0 AS span_s,
       max(gap_s) AS max_gap_s,
       round(avg(gap_s), 6) AS mean_gap_s,
       CAST(coalesce(sum(CASE WHEN gap_s > 172800.0 THEN 1 END), 0)
            AS BIGINT) AS n_stale_gaps
FROM gapsrc GROUP BY 1, 2""",
        "theil_sen_crawl": f"""{CRAWL_PREFIX},
prs AS (
  SELECT a.url, a.metric,
         (b.value - a.value)
         / (CAST(epoch_us(b.warc_ts) - epoch_us(a.warc_ts) AS DOUBLE)
            / 86400000000.0) AS s
  FROM obs_long a JOIN obs_long b
    ON a.url = b.url AND a.metric = b.metric
   AND a.warc_ts < b.warc_ts),
cnt AS (
  SELECT url, metric, count(*) AS n_obs FROM obs_long GROUP BY 1, 2)
SELECT c.url, c.metric, c.n_obs,
       round(quantile_cont(p.s, 0.5), 6) AS theil_sen_slope
FROM cnt c JOIN prs p ON c.url = p.url AND c.metric = p.metric
GROUP BY 1, 2, 3""",
        "spearman_crawl": f"""{CRAWL_PREFIX},
rk AS (
  SELECT url,
         rank() OVER (PARTITION BY url ORDER BY text_len)
           + (count(*) OVER (PARTITION BY url, text_len) - 1) / 2.0 AS ra,
         rank() OVER (PARTITION BY url ORDER BY word_count)
           + (count(*) OVER (PARTITION BY url, word_count) - 1) / 2.0 AS rb
  FROM obs)
SELECT url, count(*) AS n_obs,
       CASE WHEN stddev_pop(ra) > 0 AND stddev_pop(rb) > 0
            THEN round(corr(ra, rb), 6) END AS spearman
FROM rk GROUP BY 1""",
        "length_histogram_documents": """
SELECT n_chars // 50 AS bin, (n_chars // 50) * 50 AS lo,
       count(*) AS n_docs
FROM documents GROUP BY 1, 2""",
        "left_join_documents_embeddings": """
SELECT d.doc_id, d.lang, d.n_chars, e.label
FROM documents d LEFT JOIN (SELECT vec_id, label FROM embeddings
                            WHERE label <= 2) e
  ON e.vec_id = d.doc_id""",
        "ddsketch_quantile_daily": f"""{CRAWL_PREFIX},
ddv AS (
  SELECT CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
         CAST(ceil(ln(CAST(text_len AS DOUBLE))
                   / ln(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE)))
              AS BIGINT) AS bin
  FROM obs),
ddc AS MATERIALIZED (
  SELECT bucket_ts, bin, count(*) AS n FROM ddv GROUP BY 1, 2),
ddt AS (SELECT bucket_ts, CAST(sum(n) AS BIGINT) AS total
        FROM ddc GROUP BY 1),
ddm AS MATERIALIZED (
  SELECT bucket_ts, bin,
         sum(n) OVER (PARTITION BY bucket_ts ORDER BY bin) AS cum
  FROM ddc)
SELECT t.bucket_ts, t.total AS n,
  round(power(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE),
    (SELECT min(bin) FROM ddm c WHERE c.bucket_ts = t.bucket_ts
      AND c.cum >= greatest((500000 * t.total + 999999) // 1000000, 1))),
    6) AS q50,
  round(power(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE),
    (SELECT min(bin) FROM ddm c WHERE c.bucket_ts = t.bucket_ts
      AND c.cum >= greatest((900000 * t.total + 999999) // 1000000, 1))),
    6) AS q90,
  round(power(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE),
    (SELECT min(bin) FROM ddm c WHERE c.bucket_ts = t.bucket_ts
      AND c.cum >= greatest((990000 * t.total + 999999) // 1000000, 1))),
    6) AS q99
FROM ddt t""",
        "domain_daily_crawl": f"""{CRAWL_PREFIX}
SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
       CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
       count(DISTINCT url) AS n_urls, count(*) AS n_snaps
FROM obs GROUP BY 1, 2""",
        "wow_change_crawl": f"""{CRAWL_PREFIX},
wk AS (
  SELECT url, metric,
         CAST(date_trunc('week', warc_ts) AS TIMESTAMP) AS bucket_ts,
         sum(value) AS s
  FROM obs_long GROUP BY 1, 2, 3),
lg AS (
  SELECT url, metric, bucket_ts, s,
         lag(s) OVER (PARTITION BY url, metric ORDER BY bucket_ts) AS prev
  FROM wk)
SELECT url, metric, bucket_ts, s AS "sum", prev AS prev_sum,
       round(CASE WHEN prev > 0 THEN (s - prev) / prev END, 6) AS wow_pct
FROM lg""",
        "hybrid_rrf_documents": """
WITH dt AS MATERIALIZED (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
         CAST(len(list_filter(ts, x -> x = 'hash')) AS BIGINT) AS tf0,
         CAST(len(list_filter(ts, x -> x = 'join')) AS BIGINT) AS tf1,
         CAST(len(list_filter(ts, x -> x = 'stream')) AS BIGINT) AS tf2
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ts
        FROM documents)),
st AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM dt),
sc AS (
  SELECT doc_id,
    round(
      0.0
      + ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
        * (tf0 * (1.2 + 1.0))
        / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
        * (tf1 * (1.2 + 1.0))
        / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
        * (tf2 * (1.2 + 1.0))
        / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS score
  FROM dt, st WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0),
lex AS (
  SELECT doc_id, rn AS rank_lex FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
               AS rn
    FROM sc) WHERE rn <= 50),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id = 0),
ds AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(q.qv,
               CAST(e.embedding AS DOUBLE[])), 6) AS score
  FROM q CROSS JOIN embeddings e),
den AS (
  SELECT doc_id, rn AS rank_dense FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
               AS rn
    FROM ds) WHERE rn <= 50),
fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         CAST(COALESCE(l.rank_lex, 0) AS BIGINT) AS rank_lex,
         CAST(COALESCE(d.rank_dense, 0) AS BIGINT) AS rank_dense,
         round(
           (CASE WHEN l.rank_lex IS NOT NULL
                 THEN 1.0 / (60 + CAST(l.rank_lex AS DOUBLE))
                 ELSE 0.0 END)
           + (CASE WHEN d.rank_dense IS NOT NULL
                   THEN 1.0 / (60 + CAST(d.rank_dense AS DOUBLE))
                   ELSE 0.0 END), 6) AS rrf_score
  FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id)
SELECT doc_id, rank_lex, rank_dense, rrf_score FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id)
             AS rn
  FROM fused) WHERE rn <= 20""",
        "bm25_topk_documents": """
WITH dt AS MATERIALIZED (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
         CAST(len(list_filter(ts, x -> x = 'hash')) AS BIGINT) AS tf0,
         CAST(len(list_filter(ts, x -> x = 'join')) AS BIGINT) AS tf1,
         CAST(len(list_filter(ts, x -> x = 'stream')) AS BIGINT) AS tf2
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ts
        FROM documents)),
st AS MATERIALIZED (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM dt),
sc AS (
  SELECT doc_id,
    round(
      0.0
      + ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
        * (tf0 * (1.2 + 1.0))
        / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
        * (tf1 * (1.2 + 1.0))
        / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
        * (tf2 * (1.2 + 1.0))
        / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS score
  FROM dt, st WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0)
SELECT doc_id, score FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rn
  FROM sc) WHERE rn <= 20""",
        "zipf_slope_documents": """
WITH toks AS MATERIALIZED (
  SELECT unnest(string_split(lower(text), ' ')) AS token
  FROM documents),
cnt AS MATERIALIZED (
  SELECT token, count(*) AS n FROM toks GROUP BY 1),
rk AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r FROM cnt),
top AS (SELECT * FROM rk WHERE r <= 100)
SELECT CAST(count(*) AS BIGINT) AS n_top,
       round(regr_slope(ln(CAST(n AS DOUBLE)),
                        ln(CAST(r AS DOUBLE))), 6) AS zipf_slope
FROM top""",
        "lang_entropy_domains": f"""{CRAWL_PREFIX},
cnt AS (
  SELECT split_part(url, '/', 3) AS domain, lang, count(*) AS n
  FROM obs GROUP BY 1, 2)
SELECT domain, CAST(sum(n) AS BIGINT) AS n_obs,
       CAST(count(*) AS BIGINT) AS n_langs,
       round(log2(CAST(sum(n) AS DOUBLE))
             - sum(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))
               / CAST(sum(n) AS DOUBLE), 6) AS entropy
FROM cnt GROUP BY 1""",
        "token_entropy_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
cnt AS MATERIALIZED (
  SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct,
         round(log2(CAST(sum(c) AS DOUBLE))
               - sum(CAST(c AS DOUBLE)
                     * log2(CAST(c AS DOUBLE)))
                 / CAST(sum(c) AS DOUBLE), 6) AS entropy,
         round(CAST(count(*) AS DOUBLE)
               / CAST(sum(c) AS DOUBLE), 6) AS ttr
  FROM cnt GROUP BY doc_id)
SELECT doc_id, n_tokens, n_distinct, entropy, ttr FROM tot""",
        "kneser_ney_bigrams_documents": """
WITH toks AS MATERIALIZED (
  SELECT string_split(lower(text), ' ') AS ts FROM documents),
bi AS MATERIALIZED (
  SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*) AS n
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) s
  GROUP BY 1, 2),
ctx AS MATERIALIZED (
  SELECT w1, sum(n) AS c_ctx, count(*) AS n1p_ctx FROM bi GROUP BY 1),
suc AS MATERIALIZED (
  SELECT w2, count(*) AS n1p_suc FROM bi GROUP BY 1),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS bd FROM bi),
top AS (SELECT w1, w2, n FROM (
  SELECT w1, w2, n,
         row_number() OVER (ORDER BY n DESC, w1, w2) AS rn FROM bi)
  WHERE rn <= 100)
SELECT t.w1, t.w2, t.n,
       round(greatest(CAST(t.n AS DOUBLE) - 0.75, 0)
                 / CAST(c.c_ctx AS DOUBLE)
             + 0.75 * CAST(c.n1p_ctx AS DOUBLE)
                 / CAST(c.c_ctx AS DOUBLE)
                 * (CAST(s.n1p_suc AS DOUBLE) / tot.bd), 6) AS p_kn
FROM top t
JOIN ctx c ON c.w1 = t.w1
JOIN suc s ON s.w2 = t.w2, tot""",
        "item_lift_events": """
WITH ui AS MATERIALIZED (
  SELECT DISTINCT user_id AS u,
         CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)
             AS item
  FROM events WHERE event_type IN ('click', 'view', 'purchase')),
nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM ui),
ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c
       FROM ui GROUP BY 1),
pairs AS (
  SELECT a.item AS i1, b.item AS i2, CAST(count(*) AS BIGINT) AS co
  FROM ui a JOIN ui b ON b.u = a.u AND b.item > a.item
  GROUP BY 1, 2 HAVING count(*) >= 3),
sc AS (
  SELECT p.i1, p.i2, p.co,
         round(CAST(p.co * t.n AS DOUBLE)
               / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
  FROM pairs p, nu t
  JOIN ic ca ON ca.item = p.i1
  JOIN ic cb ON cb.item = p.i2)
SELECT i1, i2, co, lift FROM (
  SELECT i1, i2, co, lift,
         row_number() OVER (ORDER BY lift DESC, i1, i2) AS rn
  FROM sc) WHERE rn <= 20""",
        "ar1_halflife_crawl": f"""{CRAWL_PREFIX},
d AS MATERIALIZED (
  SELECT url,
         make_timestamp((epoch_us(warc_ts) // 86400000000)
                        * 86400000000) AS day,
         CAST(sum(text_len) AS BIGINT) AS x
  FROM obs GROUP BY 1, 2),
p AS (
  SELECT url, x,
         lag(x) OVER w AS px, lag(day) OVER w AS pd, day
  FROM d WINDOW w AS (PARTITION BY url ORDER BY day)),
q AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(px) AS BIGINT) AS sx,
         CAST(sum(x) AS BIGINT) AS sy,
         CAST(sum(px * x) AS BIGINT) AS sxy,
         CAST(sum(px * px) AS BIGINT) AS sxx
  FROM p WHERE pd = day - INTERVAL 1 DAY
  GROUP BY 1 HAVING count(*) >= 8),
f AS (
  SELECT url, n AS n_pairs,
         CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS phi_raw
  FROM q WHERE n * sxx - sx * sx <> 0)
SELECT url, n_pairs, round(phi_raw, 6) AS phi,
       CASE WHEN phi_raw > 0 AND phi_raw < 1
            THEN round(ln(0.5) / ln(phi_raw), 6)
            ELSE NULL END AS halflife_days
FROM f""",
        "user_jaccard_events": """
WITH ui AS MATERIALIZED (
  SELECT DISTINCT user_id AS u,
         CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT)
             AS item
  FROM events WHERE event_type IN ('click', 'view', 'purchase')),
capped AS MATERIALIZED (
  SELECT item FROM ui GROUP BY 1 HAVING count(*) <= 512),
cui AS MATERIALIZED (
  SELECT u, ui.item FROM ui JOIN capped USING (item)),
sizes AS (SELECT u, CAST(count(*) AS BIGINT) AS nu
          FROM cui GROUP BY 1),
pairs AS (
  SELECT a.u AS u1, b.u AS u2, CAST(count(*) AS BIGINT) AS shared
  FROM cui a JOIN cui b ON b.item = a.item AND b.u > a.u
  GROUP BY 1, 2 HAVING count(*) >= 2),
sc AS (
  SELECT p.u1, p.u2, p.shared,
         round(CAST(p.shared AS DOUBLE)
               / (CAST(sa.nu AS DOUBLE) + CAST(sb.nu AS DOUBLE)
                  - CAST(p.shared AS DOUBLE)), 6) AS jaccard
  FROM pairs p JOIN sizes sa ON sa.u = p.u1
               JOIN sizes sb ON sb.u = p.u2)
SELECT u1, u2, shared, jaccard FROM (
  SELECT u1, u2, shared, jaccard,
         row_number() OVER (ORDER BY jaccard DESC, u1, u2) AS rn
  FROM sc) WHERE rn <= 50""",
        "llr_bigrams_documents": f"""
WITH toks AS MATERIALIZED (
  SELECT string_split(lower(text), ' ') AS ts FROM documents),
bi AS MATERIALIZED (
  SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*) AS n
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) s
  GROUP BY 1, 2),
uni AS MATERIALIZED (
  SELECT w, count(*) AS c FROM
    (SELECT unnest(ts) AS w FROM toks) GROUP BY 1),
tot AS (SELECT CAST((SELECT sum(n) FROM bi) AS DOUBLE) AS b),
en AS (
  SELECT bi.w1, bi.w2, bi.n, CAST(bi.n AS DOUBLE) AS k11,
         CAST(ua.c AS DOUBLE) AS ca, CAST(ub.c AS DOUBLE) AS cb, t.b
  FROM bi, tot t
  JOIN uni ua ON ua.w = bi.w1
  JOIN uni ub ON ub.w = bi.w2
  WHERE bi.n >= 5),
sc AS (SELECT w1, w2, n, round({_LLR_EXPR}, 6) AS llr FROM en)
SELECT w1, w2, n, llr FROM (
  SELECT w1, w2, n, llr,
         row_number() OVER (ORDER BY llr DESC, w1, w2) AS rn
  FROM sc) WHERE rn <= 50""",
        "pmi_bigrams_documents": """
WITH toks AS MATERIALIZED (
  SELECT string_split(lower(text), ' ') AS ts FROM documents),
bi AS MATERIALIZED (
  SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*) AS n
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) s
  GROUP BY 1, 2),
uni AS MATERIALIZED (
  SELECT w, count(*) AS c FROM
    (SELECT unnest(ts) AS w FROM toks) GROUP BY 1),
tot AS (SELECT CAST((SELECT sum(c) FROM uni) AS DOUBLE) AS u,
               CAST((SELECT sum(n) FROM bi) AS DOUBLE) AS b),
sc AS (
  SELECT bi.w1, bi.w2, bi.n,
         round(log2((bi.n / t.b)
                    / ((ua.c / t.u) * (ub.c / t.u))), 6) AS pmi
  FROM bi, tot t
  JOIN uni ua ON ua.w = bi.w1
  JOIN uni ub ON ub.w = bi.w2
  WHERE bi.n >= 5)
SELECT w1, w2, n, pmi FROM (
  SELECT w1, w2, n, pmi,
         row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn
  FROM sc) WHERE rn <= 50""",
        "scd2_intervals_crawl": f"""{CRAWL_PREFIX},
lg2 AS (
  SELECT url, warc_ts, text_len,
         lag(text_len) OVER (PARTITION BY url ORDER BY warc_ts)
             AS prev
  FROM obs),
st2 AS MATERIALIZED (
  SELECT url, text_len, warc_ts AS valid_from FROM lg2
  WHERE prev IS NULL OR text_len <> prev)
SELECT url, text_len, valid_from,
       lead(valid_from) OVER (PARTITION BY url ORDER BY valid_from)
           AS valid_to
FROM st2""",
        "domain_share_daily": f"""{CRAWL_PREFIX},
ddom AS MATERIALIZED (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
         CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
         count(*) AS n_snaps
  FROM obs GROUP BY 1, 2)
SELECT domain, bucket_ts, n_snaps,
       round(CAST(n_snaps AS DOUBLE)
             / CAST(sum(n_snaps) OVER (PARTITION BY bucket_ts)
                    AS DOUBLE), 6) AS share
FROM ddom""",
        "url_filter_crawl": f"""WITH {CRAWL_CTE}
SELECT url, warc_ts FROM crawl
WHERE regexp_extract(url, '^[a-z]+://([^/]+)', 1) NOT IN
      ('site-3.example.com', 'site-7.example.com',
       'site-11.example.com')
  AND NOT contains(regexp_extract(url, '^[a-z]+://[^/]+(.*)$', 1),
                   '/u/14')""",
        "heavy_hitters_documents": """
WITH tok AS MATERIALIZED (
  SELECT unnest(string_split(lower(text), ' ')) AS word
  FROM documents)
SELECT word, count(*) AS n
FROM tok GROUP BY word
HAVING count(*) * 36 > (SELECT count(*) FROM tok)""",
        "paragraph_dedup_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS ts,
         len(string_split(text, ' ')) AS n
  FROM documents),
spans AS MATERIALIZED (
  SELECT doc_id, s.s // 12 AS span_idx,
         array_to_string(ts[s.s + 1 : s.s + 12], ' ') AS span_text
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(0, n - 1, 12)) AS s) s),
kept AS MATERIALIZED (
  SELECT doc_id, span_idx, span_text,
         row_number() OVER (PARTITION BY span_text
                            ORDER BY doc_id, span_idx) AS rn
  FROM spans)
SELECT k.doc_id,
       string_agg(k.span_text, ' ' ORDER BY k.span_idx) AS text_kept,
       n.n_spans, count(*) AS n_kept
FROM kept k
JOIN (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1) n
  USING (doc_id)
WHERE k.rn = 1
GROUP BY k.doc_id, n.n_spans""",
        "funnel_latency_events": """
WITH s1 AS MATERIALIZED (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1),
s2 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
s4 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
dl AS MATERIALIZED (
  SELECT (epoch_us(s4.t) - epoch_us(s1.t)) // 86400000000 AS d
  FROM s4 JOIN s1 ON s1.user_id = s4.user_id),
vc AS (SELECT d, count(*) AS n FROM dl GROUP BY 1),
vt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM vc),
vm AS MATERIALIZED (
  SELECT d, sum(n) OVER (ORDER BY d) AS cum FROM vc)
SELECT CAST(1 AS BIGINT) AS funnel, t.total AS n,
  (SELECT min(d) FROM vm
    WHERE cum >= greatest((500000 * t.total + 999999) // 1000000, 1))
    AS q50,
  (SELECT min(d) FROM vm
    WHERE cum >= greatest((900000 * t.total + 999999) // 1000000, 1))
    AS q90
FROM vt t""",
        "wau_events": """
WITH act AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events),
days AS (SELECT DISTINCT day FROM act)
SELECT d.day, count(DISTINCT a.user_id) AS wau
FROM days d JOIN act a
  ON a.day <= d.day AND a.day >= d.day - INTERVAL 6 DAY
GROUP BY 1""",
        "calibration_bins_nchars": """
SELECT (d.n_chars // 200) * 200 AS band,
       count(*) AS n,
       CAST(sum(CASE WHEN e.label = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
       round(CAST(sum(CASE WHEN e.label = 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS pos_rate
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
GROUP BY 1""",
        "auc_nchars_label": """
WITH j AS MATERIALIZED (
  SELECT d.n_chars AS x,
         CASE WHEN e.label = 0 THEN 1 ELSE 0 END AS pos
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
c AS MATERIALIZED (
  SELECT x, CAST(sum(pos) AS BIGINT) AS np_,
         count(*) AS n
  FROM j GROUP BY 1),
r AS (
  SELECT x, np_, n,
         CAST(sum(n) OVER (ORDER BY x) - n AS BIGINT) AS below
  FROM c),
t AS (SELECT CAST(sum(np_) AS BIGINT) AS n_pos,
             CAST(sum(n) - sum(np_) AS BIGINT) AS n_neg FROM c),
s AS (SELECT CAST(sum(np_ * (2 * below + n + 1)) AS BIGINT) AS s2
      FROM r)
SELECT t.n_pos, t.n_neg,
       round(CAST(s.s2 - t.n_pos * (t.n_pos + 1) AS DOUBLE)
             / (2.0 * t.n_pos * t.n_neg), 6) AS auc
FROM t, s""",
        "uncertainty_sample_crawl": f"""{CRAWL_PREFIX},
sc AS (
  SELECT url, warc_ts,
    (0.0 + CAST(text_len AS DOUBLE) * 0.01)
        + CAST(word_count AS DOUBLE) * 0.0 AS s0,
    (-1.0 + CAST(text_len AS DOUBLE) * -0.02)
        + CAST(word_count AS DOUBLE) * 0.05 AS s1,
    (0.5 + CAST(text_len AS DOUBLE) * 0.0)
        + CAST(word_count AS DOUBLE) * -0.01 AS s2
  FROM obs WHERE NOT (text_len = 0 AND word_count = 0)),
mg AS (
  SELECT url, warc_ts,
         round(greatest(s0, s1, s2)
               - CASE
                   WHEN s0 >= s1 AND s0 >= s2
                     THEN greatest(s1, s2)
                   WHEN s1 >= s0 AND s1 >= s2
                     THEN greatest(s0, s2)
                   ELSE greatest(s0, s1)
                 END, 6) AS margin
  FROM sc)
SELECT url, warc_ts, margin FROM (
  SELECT url, warc_ts, margin,
         row_number() OVER (
             ORDER BY margin,
                      url || ' ' || CAST(warc_ts AS VARCHAR)) AS rn
  FROM mg) WHERE rn <= 20""",
        "basket_rules_events": """
WITH tri AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         event_type
  FROM events),
nb AS (SELECT CAST(count(*) AS DOUBLE) AS n_baskets FROM
        (SELECT DISTINCT user_id, hour FROM tri)),
it AS MATERIALIZED (
  SELECT event_type, count(*) AS n FROM tri GROUP BY 1),
pr AS MATERIALIZED (
  SELECT a.event_type AS event_type_x, b.event_type AS event_type_y,
         count(*) AS n
  FROM tri a JOIN tri b
    ON a.user_id = b.user_id AND a.hour = b.hour
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.event_type_x, p.event_type_y, p.n,
       round(CAST(p.n AS DOUBLE) / nb.n_baskets, 6) AS support,
       round(CAST(p.n AS DOUBLE) / CAST(ia.n AS DOUBLE), 6)
           AS confidence,
       round((CAST(p.n AS DOUBLE) * nb.n_baskets)
             / (CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)), 6)
           AS lift
FROM pr p, nb
JOIN it ia ON ia.event_type = p.event_type_x
JOIN it ib ON ib.event_type = p.event_type_y""",
        "inverted_index_documents": """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT token, doc_id FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
    FROM documents))
SELECT token, count(*) AS df,
       array_to_string(list(doc_id ORDER BY doc_id)[1:50], ',')
           AS postings
FROM pairs GROUP BY token""",
        "dow_hour_matrix_events": """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       count(*) AS n_events
FROM events GROUP BY 1, 2""",
        "journey_trigrams_events": """
WITH seq AS MATERIALIZED (
  SELECT user_id, event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
cnt AS (
  SELECT t1, t2, t3, count(*) AS n FROM seq
  WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
SELECT t1, t2, t3, n FROM (
  SELECT t1, t2, t3, n,
         row_number() OVER (ORDER BY n DESC,
                            t1 || ' ' || t2 || ' ' || t3) AS rn
  FROM cnt) WHERE rn <= 10""",
        "benford_value_events": """
WITH d AS MATERIALIZED (
  SELECT CAST(substr(CAST(CAST(round(value * 100.0, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM events WHERE value > 0),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / t.total, 6) AS observed_p,
       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
           AS benford_p
FROM c, t""",
        "readability_documents": """
WITH f AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS n_syllables
  FROM documents)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE)
                       / CAST(n_words AS DOUBLE)), 6) AS flesch
FROM f""",
        "winsorized_value_by_type": """
WITH cts AS MATERIALIZED (
  SELECT event_type,
         CAST(round(value * 100.0, 0) AS BIGINT) AS c
  FROM events),
vc AS MATERIALIZED (
  SELECT event_type, c, count(*) AS n FROM cts GROUP BY 1, 2),
vt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
       FROM vc GROUP BY 1),
vm AS MATERIALIZED (
  SELECT event_type, c,
         sum(n) OVER (PARTITION BY event_type ORDER BY c) AS cum
  FROM vc),
qb AS (
  SELECT t.event_type, t.total,
    (SELECT min(c) FROM vm m WHERE m.event_type = t.event_type
       AND m.cum >= greatest((10000 * t.total + 999999) // 1000000, 1))
      AS q01,
    (SELECT min(c) FROM vm m WHERE m.event_type = t.event_type
       AND m.cum >= greatest((990000 * t.total + 999999) // 1000000, 1))
      AS q99
  FROM vt t)
SELECT c.event_type, q.total AS n, q.q01, q.q99,
       round(CAST(sum(least(greatest(c.c, q.q01), q.q99)) AS DOUBLE)
             / q.total / 100.0, 6) AS mean_clipped
FROM cts c JOIN qb q ON q.event_type = c.event_type
GROUP BY 1, 2, 3, 4""",
        "quota_events": """
SELECT event_id, user_id, ts, event_type FROM (
  SELECT event_id, user_id, ts, event_type,
         row_number() OVER (
             PARTITION BY user_id,
                          CAST(date_trunc('day', ts) AS TIMESTAMP)
             ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn <= 3""",
        "events_with_user_stats": """
SELECT event_id, user_id, ts, value,
       round(sum(value) OVER (PARTITION BY user_id), 6) AS user_total,
       count(*) OVER (PARTITION BY user_id) AS user_purchases
FROM events WHERE event_type = 'purchase'""",
        "profile_events": """
SELECT 'event_id' AS "column", count(event_id) AS n,
       count(*) - count(event_id) AS n_null,
       CAST(min(event_id) AS DOUBLE) AS min_v,
       CAST(max(event_id) AS DOUBLE) AS max_v,
       round(sum(CAST(event_id AS DOUBLE)) / count(event_id), 6)
           AS mean_v
FROM events
UNION ALL
SELECT 'user_id', count(user_id), count(*) - count(user_id),
       CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE),
       round(sum(CAST(user_id AS DOUBLE)) / count(user_id), 6)
FROM events
UNION ALL
SELECT 'value', count(value), count(*) - count(value),
       min(value), max(value),
       round(sum(value) / count(value), 6)
FROM events""",
        "value_ddsketch_by_type": """
WITH ddv AS (
  -- value = 0 → DDSketch zero bucket (sentinel bin below every log
  -- bin, estimate 0.0); CASE short-circuits so ln(0) never evaluates
  SELECT event_type,
         CASE WHEN value = 0
              THEN CAST(-4611686018427387904 AS BIGINT)
              ELSE CAST(ceil(ln(value)
                   / ln(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE)))
              AS BIGINT) END AS bin
  FROM events),
ddc AS MATERIALIZED (
  SELECT event_type, bin, count(*) AS n FROM ddv GROUP BY 1, 2),
ddt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
        FROM ddc GROUP BY 1),
ddm AS MATERIALIZED (
  SELECT event_type, bin,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM ddc),
sel AS (
  SELECT t.event_type, t.total,
    (SELECT min(bin) FROM ddm c WHERE c.event_type = t.event_type
      AND c.cum >= greatest((500000 * t.total + 999999) // 1000000, 1))
      AS b50,
    (SELECT min(bin) FROM ddm c WHERE c.event_type = t.event_type
      AND c.cum >= greatest((900000 * t.total + 999999) // 1000000, 1))
      AS b90,
    (SELECT min(bin) FROM ddm c WHERE c.event_type = t.event_type
      AND c.cum >= greatest((990000 * t.total + 999999) // 1000000, 1))
      AS b99
  FROM ddt t)
SELECT event_type, total AS n,
  round(CASE WHEN b50 = -4611686018427387904 THEN 0.0
        ELSE power(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE), b50)
        END, 6) AS q50,
  round(CASE WHEN b90 = -4611686018427387904 THEN 0.0
        ELSE power(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE), b90)
        END, 6) AS q90,
  round(CASE WHEN b99 = -4611686018427387904 THEN 0.0
        ELSE power(CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE), b99)
        END, 6) AS q99
FROM sel""",
        "error_rate_hourly": """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_errors,
       count(*) AS n_events,
       round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                      END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS error_rate
FROM events GROUP BY 1""",
        "ttl_dedup_crawl": f"""{CRAWL_PREFIX}
SELECT url, warc_ts, text_len FROM (
  SELECT url, warc_ts, text_len,
         row_number() OVER (
             PARTITION BY url, text_len,
                          CAST(epoch(warc_ts) AS BIGINT) // 604800
             ORDER BY warc_ts) AS rn
  FROM obs) WHERE rn = 1""",
        "validate_events": """
WITH checks AS (
  SELECT 'ts_not_null' AS "constraint",
         CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations FROM events
  UNION ALL
  SELECT 'user_id_not_null',
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM events
  UNION ALL
  SELECT 'value_non_negative',
         CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
  UNION ALL
  SELECT 'event_type_enum',
         CAST(sum(CASE WHEN event_type NOT IN
                  ('click','purchase','error','signup','view')
              THEN 1 ELSE 0 END) AS BIGINT) FROM events
  UNION ALL
  SELECT 'event_id_unique',
         CAST(COALESCE(sum(n - 1), 0) AS BIGINT) FROM
           (SELECT count(*) AS n FROM events GROUP BY event_id
            HAVING count(*) > 1))
SELECT "constraint", n_violations, n_violations = 0 AS passed
FROM checks""",
        "psi_drift_weekly": f"""{CRAWL_PREFIX},
wb AS MATERIALIZED (
  SELECT CAST(date_trunc('week', warc_ts) AS TIMESTAMP) AS w,
         least(text_len // 64, 255) AS bin, count(*) AS n
  FROM obs GROUP BY 1, 2),
wt AS (SELECT w, CAST(sum(n) AS DOUBLE) AS tot FROM wb GROUP BY 1),
ps AS (
  SELECT c.w,
         CAST(c.n AS DOUBLE) / ct.tot AS p,
         CAST(pr.n AS DOUBLE) / pt.tot AS q
  FROM wb c
  JOIN wt ct ON ct.w = c.w
  JOIN wb pr ON pr.bin = c.bin AND pr.w = c.w - INTERVAL 7 DAY
  JOIN wt pt ON pt.w = pr.w)
SELECT w, round(sum((p - q) * ln(p / q)), 6) AS psi,
       count(*) AS n_bins
FROM ps GROUP BY w""",
        "attribution_events": """
SELECT p.event_id, p.user_id, p.ts, p.value,
       (SELECT max(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 7 DAY)
           AS click_ts
FROM events p WHERE p.event_type = 'purchase'""",
        "topk_urls_daily": f"""{CRAWL_PREFIX},
dcount AS (
  SELECT url, CAST(date_trunc('day', warc_ts) AS TIMESTAMP)
            AS bucket_ts,
         count(*) AS "count"
  FROM obs GROUP BY 1, 2)
SELECT url, bucket_ts, "count" FROM (
  SELECT url, bucket_ts, "count",
         row_number() OVER (PARTITION BY bucket_ts
                            ORDER BY "count" DESC, url) AS rn
  FROM dcount) WHERE rn <= 5""",
        "path_rollup_crawl": f"""{CRAWL_PREFIX}
SELECT regexp_extract(url, '^[a-z]+://([^/]+)(/[^/]*)?', 1) AS domain,
       regexp_extract(url, '^[a-z]+://([^/]+)(/[^/]*)?', 2) AS path1,
       count(DISTINCT url) AS n_urls, count(*) AS n_snaps
FROM obs GROUP BY 1, 2""",
        "rolling_mean_time_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       round(avg(value) OVER (
           PARTITION BY url, metric ORDER BY warc_ts
           RANGE BETWEEN INTERVAL 24 HOUR PRECEDING AND CURRENT ROW),
         6) AS rolling_mean_24h
FROM obs_long""",
        "merge_upsert_crawl": f"""{CRAWL_PREFIX},
cur AS (SELECT url, warc_ts, text_len, 0 AS upd FROM obs),
updv AS (SELECT url, warc_ts, text_len + 1000 AS text_len, 1 AS upd
         FROM obs WHERE warc_ts >= TIMESTAMP '2024-01-25'),
uni AS (SELECT * FROM cur UNION ALL SELECT * FROM updv),
rk AS (SELECT url, warc_ts, text_len,
              row_number() OVER (PARTITION BY url
                                 ORDER BY warc_ts DESC, upd DESC) AS rn
       FROM uni)
SELECT url, warc_ts, CAST(text_len AS BIGINT) AS text_len
FROM rk WHERE rn = 1""",
        "churned_users_weekly": """
WITH wk AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events),
mx AS (SELECT max(week) AS m FROM wk)
SELECT week, CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN NOT EXISTS (
            SELECT 1 FROM wk n
            WHERE n.user_id = wk.user_id
              AND n.week = wk.week + INTERVAL 7 DAY)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
FROM wk, mx WHERE week < m GROUP BY 1 ORDER BY 1""",
        "session_entry_exit_events": """
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
  FROM events),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps),
ends AS (
  SELECT user_id, session_id,
         first(event_type ORDER BY ts, event_id) AS entry_type,
         last(event_type ORDER BY ts, event_id) AS exit_type
  FROM sess GROUP BY 1, 2)
SELECT entry_type, exit_type, count(*) AS n_sessions
FROM ends GROUP BY 1, 2 ORDER BY 1, 2""",
        "user_sessions_events": """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
  FROM events),
sess AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_id
  FROM gaps)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY 1, 2""",
        "cumulative_users_daily": """
WITH first_day AS (
  SELECT user_id,
         min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day
  FROM events GROUP BY 1),
per_day AS (
  SELECT day, count(*) AS new_users FROM first_day GROUP BY 1)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cumulative_users
FROM per_day""",
        "full_join_documents_embeddings": """
SELECT COALESCE(d.doc_id, e.vec_id) AS doc_id, d.lang, d.n_chars,
       e.label
FROM (SELECT doc_id, lang, n_chars FROM documents
      WHERE lang = 'en') d
FULL JOIN (SELECT vec_id, label FROM embeddings WHERE label <= 2) e
  ON e.vec_id = d.doc_id""",
        "decontaminate_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
sh AS MATERIALIZED (
  SELECT doc_id, array_to_string(ts[s.i : s.i + 7], ' ') AS s
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(1, len(ts) - 7)) AS i) s),
bench AS MATERIALIZED (SELECT DISTINCT s FROM sh WHERE doc_id < 5),
hits AS (
  SELECT sh.doc_id, count(*) AS n_hits
  FROM sh JOIN bench USING (s) GROUP BY 1),
nw AS (SELECT doc_id, greatest(len(ts) - 7, 0) AS n_windows FROM toks)
SELECT nw.doc_id, CAST(n_windows AS BIGINT) AS n_windows,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM nw LEFT JOIN hits h ON h.doc_id = nw.doc_id""",
        "markov_transitions_events": """
WITH seq AS MATERIALIZED (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
cnt AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
             6) AS p
FROM cnt""",
        "funnel_windowed_events": """
WITH s1 AS MATERIALIZED (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1),
s2 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t
    AND e.ts <= s1.t + INTERVAL 2 DAY GROUP BY 1),
s3 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t
    AND e.ts <= s2.t + INTERVAL 2 DAY GROUP BY 1),
s4 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t
    AND e.ts <= s3.t + INTERVAL 2 DAY GROUP BY 1)
SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage,
       (SELECT count(*) FROM s1) AS n_users
UNION ALL SELECT CAST(2 AS BIGINT), 'view', (SELECT count(*) FROM s2)
UNION ALL SELECT CAST(3 AS BIGINT), 'click', (SELECT count(*) FROM s3)
UNION ALL SELECT CAST(4 AS BIGINT), 'purchase',
  (SELECT count(*) FROM s4)""",
        "cube_documents": """
SELECT COALESCE(lang, 'ALL') AS lang,
       COALESCE(source, 'ALL') AS source,
       count(*) AS n_docs
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())""",
        "cohort_retention_events": """
WITH act AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events),
coh AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
SELECT c.cohort_day, date_diff('day', c.cohort_day, a.day) AS offset_days,
       count(*) AS n_users
FROM act a JOIN coh c ON a.user_id = c.user_id
GROUP BY 1, 2""",
        "funnel_events": """
WITH s1 AS MATERIALIZED (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1),
s2 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
s4 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1)
SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage,
       (SELECT count(*) FROM s1) AS n_users
UNION ALL SELECT CAST(2 AS BIGINT), 'view', (SELECT count(*) FROM s2)
UNION ALL SELECT CAST(3 AS BIGINT), 'click', (SELECT count(*) FROM s3)
UNION ALL SELECT CAST(4 AS BIGINT), 'purchase',
  (SELECT count(*) FROM s4)""",
        "dau_events": """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(DISTINCT user_id) AS dau, count(*) AS n_events
FROM events GROUP BY 1""",
        "exact_quantile_daily": f"""{CRAWL_PREFIX},
vc AS MATERIALIZED (
  SELECT CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
         CAST(text_len AS BIGINT) AS v, count(*) AS n
  FROM obs GROUP BY 1, 2),
vt AS (SELECT bucket_ts, CAST(sum(n) AS BIGINT) AS total
       FROM vc GROUP BY 1),
vm AS MATERIALIZED (
  SELECT bucket_ts, v,
         sum(n) OVER (PARTITION BY bucket_ts ORDER BY v) AS cum
  FROM vc)
SELECT t.bucket_ts, t.total AS n,
  (SELECT min(v) FROM vm c WHERE c.bucket_ts = t.bucket_ts
     AND c.cum >= greatest((500000 * t.total + 999999) // 1000000, 1))
    AS q50,
  (SELECT min(v) FROM vm c WHERE c.bucket_ts = t.bucket_ts
     AND c.cum >= greatest((900000 * t.total + 999999) // 1000000, 1))
    AS q90,
  (SELECT min(v) FROM vm c WHERE c.bucket_ts = t.bucket_ts
     AND c.cum >= greatest((990000 * t.total + 999999) // 1000000, 1))
    AS q99
FROM vt t""",
        "duplicate_ngrams_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS ts,
         len(string_split(text, ' ')) AS n
  FROM documents),
grams AS MATERIALIZED (
  SELECT doc_id, array_to_string(ts[s.s + 1 : s.s + 8], ' ') AS gram
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(0, n - 8)) AS s) s)
SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""",
        "bigram_logprob_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split(lower(text), ' ') AS ts,
         len(string_split(lower(text), ' ')) AS n
  FROM documents),
bg AS MATERIALIZED (
  SELECT doc_id, ts[s.s] AS w1, ts[s.s + 1] AS w2
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(1, n - 1)) AS s) s),
uc AS MATERIALIZED (
  SELECT t.tok AS tok, count(*) AS c1
  FROM toks, unnest(ts) AS t(tok) GROUP BY 1),
bc AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2)
SELECT b.doc_id, count(*) AS n_bigrams,
       round(avg(ln(CAST(c.c2 AS DOUBLE) / CAST(u.c1 AS DOUBLE))), 6)
           AS avg_logprob
FROM bg b JOIN bc c ON b.w1 = c.w1 AND b.w2 = c.w2
          JOIN uc u ON b.w1 = u.tok
GROUP BY 1""",
        "unigram_logprob_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, t.tok AS tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)),
counts AS MATERIALIZED (
  SELECT tok, count(*) AS c FROM toks GROUP BY 1),
total AS MATERIALIZED (
  SELECT CAST(sum(c) AS DOUBLE) AS tot FROM counts)
SELECT t.doc_id, count(*) AS n_tokens,
       round(avg(ln(CAST(c.c AS DOUBLE) / (SELECT tot FROM total))), 6)
           AS avg_logprob
FROM toks t JOIN counts c USING (tok)
GROUP BY 1""",
        "gopher_rules_documents": """
WITH s AS MATERIALIZED (
  SELECT doc_id, text,
         CAST(length(text) AS BIGINT) AS nc,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt
  FROM documents),
toks AS MATERIALIZED (
  SELECT doc_id, t.tok AS tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)),
per_doc AS MATERIALIZED (
  SELECT doc_id,
         count(*) FILTER (WHERE regexp_matches(tok, '[a-zA-Z]'))
             AS n_alpha,
         count(DISTINCT tok) FILTER (WHERE tok IN
             ('data','row','join','hash','batch','scan')) AS n_stop
  FROM toks GROUP BY 1),
flags AS (
  SELECT s.doc_id, s.nt AS n_words,
         CASE WHEN s.nt >= 30 AND s.nt <= 100000
              THEN 1 ELSE 0 END AS r_wordcount,
         CASE WHEN (s.nc - (s.nt - 1.0)) / s.nt >= 4.0
               AND (s.nc - (s.nt - 1.0)) / s.nt <= 10.0
              THEN 1 ELSE 0 END AS r_meanlen,
         CASE WHEN CAST(p.n_alpha AS DOUBLE) / s.nt >= 0.80
              THEN 1 ELSE 0 END AS r_alpha,
         CASE WHEN p.n_stop >= 3 THEN 1 ELSE 0 END AS r_stop
  FROM s JOIN per_doc p USING (doc_id))
SELECT doc_id, n_words,
       CAST(r_wordcount AS BIGINT) AS r_wordcount,
       CAST(r_meanlen AS BIGINT) AS r_meanlen,
       CAST(r_alpha AS BIGINT) AS r_alpha,
       CAST(r_stop AS BIGINT) AS r_stop,
       CAST(r_wordcount * r_meanlen * r_alpha * r_stop AS BIGINT)
           AS passes
FROM flags""",
        "dsir_weights_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, t.tok AS tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)),
raw AS MATERIALIZED (SELECT tok, count(*) AS nr FROM toks GROUP BY 1),
vocab AS MATERIALIZED (
  SELECT tok, nr FROM raw ORDER BY nr DESC, tok ASC LIMIT 1000),
tgt AS MATERIALIZED (
  SELECT t.tok, count(*) AS nt
  FROM toks t JOIN documents d USING (doc_id) JOIN vocab v USING (tok)
  WHERE d.lang = 'en' GROUP BY 1),
tot AS MATERIALIZED (
  SELECT (SELECT CAST(sum(nr) AS DOUBLE) FROM vocab) AS tr,
         (SELECT CAST(coalesce(sum(nt), 0) AS DOUBLE) FROM tgt) AS tt,
         (SELECT CAST(count(*) AS DOUBLE) FROM vocab) AS k),
lr AS MATERIALIZED (
  SELECT v.tok,
         ln((coalesce(g.nt, 0) + 1.0) / ((SELECT tt FROM tot)
                                         + (SELECT k FROM tot)))
       - ln((v.nr + 1.0) / ((SELECT tr FROM tot)
                            + (SELECT k FROM tot))) AS lw
  FROM vocab v LEFT JOIN tgt g USING (tok)),
hits AS (
  SELECT t.doc_id, count(*) AS n, sum(l.lw) AS s
  FROM toks t JOIN lr l USING (tok) GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_vocab_tokens,
       round(coalesce(h.s, 0.0), 6) AS log_weight
FROM documents d LEFT JOIN hits h USING (doc_id)""",
        "lang_temperature_weights": """
WITH c AS MATERIALIZED (
  SELECT lang, count(*) AS n FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c),
p AS (SELECT lang, n,
             CAST(n AS DOUBLE) / (SELECT tot FROM t) AS pl FROM c),
z AS (SELECT sum(pow(pl, 0.3)) AS s FROM p)
SELECT lang, CAST(n AS BIGINT) AS n_docs, round(pl, 6) AS p_raw,
       round(pow(pl, 0.3) / (SELECT s FROM z), 6) AS p_temp
FROM p""",
        "ppl_buckets_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, t.tok AS tok
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(tok)),
counts AS MATERIALIZED (
  SELECT tok, count(*) AS c FROM toks GROUP BY 1),
total AS MATERIALIZED (
  SELECT CAST(sum(c) AS DOUBLE) AS tot FROM counts),
lp AS MATERIALIZED (
  SELECT t.doc_id,
         round(avg(ln(CAST(c.c AS DOUBLE) / (SELECT tot FROM total))),
               6) AS avg_logprob
  FROM toks t JOIN counts c USING (tok) GROUP BY 1)
SELECT d.doc_id, d.lang, lp.avg_logprob,
       CAST(ntile(3) OVER (PARTITION BY d.lang
                           ORDER BY lp.avg_logprob DESC, d.doc_id)
            AS BIGINT) AS bucket
FROM documents d JOIN lp USING (doc_id)""",
        "m4_downsample_crawl": f"""{CRAWL_PREFIX},
m4b AS (
  SELECT url, metric,
         CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS bucket_ts,
         warc_ts, value
  FROM obs_long),
m4r AS (
  SELECT *,
         row_number() OVER (PARTITION BY url, metric, bucket_ts
                            ORDER BY warc_ts) AS rn_first,
         row_number() OVER (PARTITION BY url, metric, bucket_ts
                            ORDER BY warc_ts DESC) AS rn_last,
         row_number() OVER (PARTITION BY url, metric, bucket_ts
                            ORDER BY value, warc_ts) AS rn_min,
         row_number() OVER (PARTITION BY url, metric, bucket_ts
                            ORDER BY value DESC, warc_ts) AS rn_max
  FROM m4b)
SELECT DISTINCT url, metric, bucket_ts, warc_ts, value
FROM m4r
WHERE 1 IN (rn_first, rn_last, rn_min, rn_max)""",
        "threshold_crossings_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value, direction FROM (
  SELECT url, metric, warc_ts, value,
         lag(value) OVER (PARTITION BY url, metric
                          ORDER BY warc_ts) AS prev,
         CAST(CASE WHEN value >= 250 THEN 1 ELSE -1 END AS BIGINT)
             AS direction
  FROM obs_long)
WHERE prev IS NOT NULL AND ((value >= 250) != (prev >= 250))""",
        "rolling_median_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       median(value) OVER (PARTITION BY url, metric ORDER BY warc_ts
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
           AS rolling_median
FROM obs_long""",
        "head_domains_crawl": f"""{CRAWL_PREFIX}
SELECT url, count(*) AS n FROM obs
GROUP BY url ORDER BY n DESC, url LIMIT 10""",
        "snapshot_deltas_crawl": f"""{CRAWL_PREFIX}
SELECT url, metric, warc_ts, value,
       value - lag(value) OVER (PARTITION BY url, metric
                                ORDER BY warc_ts) AS delta
FROM obs_long""",
        "crawl_sessions": f"""{CRAWL_PREFIX},
gaps AS (
  SELECT url, warc_ts,
         CASE WHEN warc_ts - lag(warc_ts) OVER
                   (PARTITION BY url ORDER BY warc_ts)
                   > INTERVAL 24 HOUR THEN 1 ELSE 0 END AS brk
  FROM obs)
SELECT url, warc_ts,
       CAST(sum(brk) OVER (PARTITION BY url ORDER BY warc_ts
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
FROM gaps""",
        "asof_latest_event": f"""{CRAWL_PREFIX},
ev AS (
  SELECT 'https://site-' || CAST(user_id % 40 AS VARCHAR)
         || '.example.com/u/' || CAST(user_id AS VARCHAR) AS url,
         ts, value
  FROM events)
SELECT o.url, o.warc_ts, o.text_len, e.value AS last_event_value
FROM obs o ASOF LEFT JOIN ev e
  ON o.url = e.url AND o.warc_ts >= e.ts""",
        "asof_next_event": f"""{CRAWL_PREFIX},
ev AS (
  SELECT 'https://site-' || CAST(user_id % 40 AS VARCHAR)
         || '.example.com/u/' || CAST(user_id AS VARCHAR) AS url,
         ts, value
  FROM events)
SELECT o.url, o.warc_ts, o.text_len, e.value AS next_event_value
FROM obs o ASOF LEFT JOIN ev e
  ON o.url = e.url AND o.warc_ts <= e.ts""",
        "typo_pairs_urls": f"""{CRAWL_PREFIX},
u0 AS MATERIALIZED (SELECT DISTINCT url FROM obs),
u AS MATERIALIZED (
  SELECT url FROM u0
  UNION
  SELECT substr(url, 1, 9 + CAST(regexp_extract(url, '/u/(\\d+)$', 1)
                               AS BIGINT) % 10)
         || substr(url, 11 + CAST(regexp_extract(url, '/u/(\\d+)$', 1)
                                  AS BIGINT) % 10) AS url
  FROM u0
  WHERE CAST(regexp_extract(url, '/u/(\\d+)$', 1) AS BIGINT) % 20 = 0),
v AS MATERIALIZED (
  SELECT url, url AS k FROM u
  UNION ALL
  SELECT url, substr(url, 1, i.i - 1) || substr(url, i.i + 1) AS k
  FROM u CROSS JOIN LATERAL
    (SELECT unnest(generate_series(1, length(url))) AS i) i),
cand AS MATERIALIZED (
  SELECT DISTINCT a.url AS url_a, b.url AS url_b
  FROM v a JOIN v b ON a.k = b.k AND a.url < b.url)
SELECT url_a, url_b FROM cand
WHERE levenshtein(url_a, url_b) <= 1""",
        "rank_in_domain_crawl": f"""{CRAWL_PREFIX},
cnt AS (
  SELECT regexp_replace(url, '^https?://([^/]+)/.*$', '\\1') AS domain,
         url, count(*) AS n
  FROM obs GROUP BY 1, 2)
SELECT domain, url, n,
       dense_rank() OVER (PARTITION BY domain ORDER BY n DESC) AS rnk
FROM cnt""",
        "intersect_urls_weeks": f"""{CRAWL_PREFIX},
wk AS (SELECT min(CAST(date_trunc('week', warc_ts) AS TIMESTAMP)) AS lo,
              max(CAST(date_trunc('week', warc_ts) AS TIMESTAMP)) AS hi
       FROM obs)
SELECT DISTINCT url FROM obs
WHERE CAST(date_trunc('week', warc_ts) AS TIMESTAMP) = (SELECT lo FROM wk)
INTERSECT
SELECT DISTINCT url FROM obs
WHERE CAST(date_trunc('week', warc_ts) AS TIMESTAMP) = (SELECT hi FROM wk)""",
        "except_urls_weeks": f"""{CRAWL_PREFIX},
wk AS (SELECT min(CAST(date_trunc('week', warc_ts) AS TIMESTAMP)) AS lo,
              max(CAST(date_trunc('week', warc_ts) AS TIMESTAMP)) AS hi
       FROM obs)
SELECT DISTINCT url FROM obs
WHERE CAST(date_trunc('week', warc_ts) AS TIMESTAMP) = (SELECT lo FROM wk)
EXCEPT
SELECT DISTINCT url FROM obs
WHERE CAST(date_trunc('week', warc_ts) AS TIMESTAMP) = (SELECT hi FROM wk)""",
        "domain_components_crawl": f"""WITH RECURSIVE {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT split_part(c.url, '/', 3) AS src,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS dst
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM links
    UNION ALL SELECT dst AS src, src AS dst FROM links)),
reach(node, lbl) AS (
  SELECT src AS node, src AS lbl FROM edges
  UNION
  SELECT e.dst AS node, r.lbl AS lbl
  FROM reach r JOIN edges e ON e.src = r.node)
SELECT node, min(lbl) AS component FROM reach GROUP BY node
ORDER BY node""",
        "link_degree_crawl": f"""WITH {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT split_part(c.url, '/', 3) AS src,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS dst
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
outs AS (
  SELECT src AS domain, CAST(count(*) AS BIGINT) AS out_links,
         CAST(count(DISTINCT dst) AS BIGINT) AS out_domains
  FROM links GROUP BY 1),
ins AS (
  SELECT dst AS domain, CAST(count(*) AS BIGINT) AS in_links,
         CAST(count(DISTINCT src) AS BIGINT) AS in_domains
  FROM links GROUP BY 1)
SELECT COALESCE(o.domain, i.domain) AS domain,
       COALESCE(o.out_links, 0) AS out_links,
       COALESCE(o.out_domains, 0) AS out_domains,
       COALESCE(i.in_links, 0) AS in_links,
       COALESCE(i.in_domains, 0) AS in_domains
FROM outs o FULL OUTER JOIN ins i ON o.domain = i.domain""",
        "rendezvous_reshard_crawl": f"""{CRAWL_PREFIX},
u AS MATERIALIZED (
  SELECT DISTINCT CAST(regexp_extract(url, 'u/(\\d+)$', 1) AS BIGINT)
      AS uid
  FROM obs),
hv AS (
  SELECT uid, s.s,
         ((uid * 31 + s.s) * 2654435761) % 4294967296 AS h
  FROM u CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS s) s),
pick8 AS (
  SELECT uid, s AS old_shard FROM (
    SELECT uid, s, row_number() OVER (
        PARTITION BY uid ORDER BY h DESC, s) AS rn
    FROM hv WHERE s < 8) WHERE rn = 1),
pick9 AS (
  SELECT uid, s AS new_shard FROM (
    SELECT uid, s, row_number() OVER (
        PARTITION BY uid ORDER BY h DESC, s) AS rn
    FROM hv) WHERE rn = 1)
SELECT p8.old_shard, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN p8.uid % 8 <> p8.uid % 9
                THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod,
       CAST(sum(CASE WHEN p9.new_shard <> p8.old_shard
                THEN 1 ELSE 0 END) AS BIGINT) AS moved_hrw
FROM pick8 p8 JOIN pick9 p9 ON p9.uid = p8.uid
GROUP BY 1""",
        "graph_stats_crawl": f"""WITH {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT split_part(c.url, '/', 3) AS w1,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS w2
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
e AS MATERIALIZED (SELECT DISTINCT w1, w2 FROM links),
counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM
            (SELECT w1 AS v FROM e UNION SELECT w2 FROM e)) AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT) FROM e) AS m,
         (SELECT CAST(count(*) AS BIGINT) FROM e
          JOIN e r ON r.w1 = e.w2 AND r.w2 = e.w1) AS nrec),
dout AS (SELECT w1 AS v, CAST(count(*) AS BIGINT) AS x
         FROM e GROUP BY 1),
din AS (SELECT w2 AS v, CAST(count(*) AS BIGINT) AS y
        FROM e GROUP BY 1),
s AS (
  SELECT CAST(sum(o.x) AS BIGINT) sx, CAST(sum(i.y) AS BIGINT) sy,
         CAST(sum(o.x * i.y) AS BIGINT) sxy,
         CAST(sum(o.x * o.x) AS BIGINT) sxx,
         CAST(sum(i.y * i.y) AS BIGINT) syy
  FROM e JOIN dout o ON o.v = e.w1 JOIN din i ON i.v = e.w2)
SELECT 'n_nodes' AS metric,
       round(CAST(n_nodes AS DOUBLE), 6) AS value FROM counts
UNION ALL
SELECT 'n_edges', round(CAST(m AS DOUBLE), 6) FROM counts
UNION ALL
SELECT 'reciprocity',
       round(CAST(nrec AS DOUBLE) / CAST(m AS DOUBLE), 6) FROM counts
UNION ALL
SELECT 'assortativity',
  CASE WHEN sqrt((CAST(sxx AS DOUBLE) / CAST(m AS DOUBLE)
                - (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))
                  * (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)))
               * (CAST(syy AS DOUBLE) / CAST(m AS DOUBLE)
                  - (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)))) > 0
  THEN
  round((CAST(sxy AS DOUBLE) / CAST(m AS DOUBLE)
         - (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))
           * (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)))
        / sqrt((CAST(sxx AS DOUBLE) / CAST(m AS DOUBLE)
                - (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))
                  * (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)))
               * (CAST(syy AS DOUBLE) / CAST(m AS DOUBLE)
                  - (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)))),
        6)
  ELSE 0.0 END
FROM counts, s""",
        "curriculum_shards_documents": """
WITH t AS MATERIALIZED (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
o AS (
  SELECT doc_id, toks,
         COALESCE(sum(toks) OVER (
             ORDER BY n_chars DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS prior
  FROM t)
SELECT CAST(prior // 5000 AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS tokens
FROM o GROUP BY 1""",
        "zorder_layout_crawl": f"""{CRAWL_PREFIX},
zz AS MATERIALIZED (
  SELECT url, warc_ts,
         epoch_us(warc_ts) // 86400000000 AS day,
         CAST(regexp_extract(url, 'u/(\\d+)$', 1) AS BIGINT) % 65536
             AS uid
  FROM obs),
z2 AS (SELECT url, warc_ts, day, uid, {_ZORDER_EXPR} AS z FROM zz),
r AS (SELECT day, uid,
             row_number() OVER (ORDER BY z, url, warc_ts) AS rn
      FROM z2)
SELECT (rn - 1) // 1000 AS file_id, CAST(count(*) AS BIGINT) AS n,
       min(day) AS min_day, max(day) AS max_day,
       min(uid) AS min_uid, max(uid) AS max_uid
FROM r GROUP BY 1""",
        "gini_domains_crawl": f"""{CRAWL_PREFIX},
c AS MATERIALIZED (
  SELECT split_part(url, '/', 3) AS domain, url,
         CAST(count(*) AS BIGINT) AS x
  FROM obs GROUP BY 1, 2),
r AS (
  SELECT domain, x,
         row_number() OVER (PARTITION BY domain ORDER BY x, url) AS i,
         count(*) OVER (PARTITION BY domain) AS n,
         sum(x) OVER (PARTITION BY domain) AS s
  FROM c)
SELECT domain, CAST(n AS BIGINT) AS n_urls,
       round(CAST(2 * sum(i * x) AS DOUBLE) / CAST(n * s AS DOUBLE)
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
FROM r GROUP BY domain, n, s""",
        "twohop_domains_crawl": f"""WITH {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT split_part(c.url, '/', 3) AS w1,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS w2
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
e AS MATERIALIZED (SELECT DISTINCT w1, w2 FROM links)
SELECT e1.w1 AS node, CAST(count(DISTINCT e2.w2) AS BIGINT) AS twohop
FROM e e1 JOIN e e2 ON e2.w1 = e1.w2
GROUP BY 1""",
        "link_churn_weekly_crawl": f"""WITH {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT make_timestamp((epoch_us(c.warc_ts) // 604800000000)
                        * 604800000000) AS wk,
         split_part(c.url, '/', 3) AS w1,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS w2
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
wkp AS MATERIALIZED (SELECT DISTINCT wk, w1, w2 FROM links),
p AS (SELECT wk, w1, w2,
        lag(wk) OVER (PARTITION BY w1, w2 ORDER BY wk) pw,
        lead(wk) OVER (PARTITION BY w1, w2 ORDER BY wk) nw
      FROM wkp)
SELECT wk,
  CAST(sum(CASE WHEN pw IS NULL OR pw <> wk - INTERVAL 7 DAY
           THEN 1 ELSE 0 END) AS BIGINT) AS appeared,
  CAST(sum(CASE WHEN nw IS NULL OR nw <> wk + INTERVAL 7 DAY
           THEN 1 ELSE 0 END) AS BIGINT) AS ended
FROM p GROUP BY 1""",
        "k_anonymity_documents": """
SELECT lang, source, n_chars // 100 AS size_bucket,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 5""",
        "word_dispersion_documents": """
WITH tok AS MATERIALIZED (
  SELECT doc_id % 10 AS part, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
  WHERE w <> ''),
cnt AS MATERIALIZED (
  SELECT w, part, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2),
tot AS MATERIALIZED (
  SELECT w, CAST(sum(c) AS BIGINT) AS F FROM cnt GROUP BY 1),
topw AS MATERIALIZED (
  SELECT w, F FROM tot ORDER BY F DESC, w LIMIT 50),
pt AS MATERIALIZED (
  SELECT part, CAST(sum(c) AS BIGINT) AS s FROM cnt GROUP BY 1),
big AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM cnt)
SELECT t.w AS word,
       round(0.5 * CAST(sum(abs(COALESCE(c.c, 0) * big.T
                                - p.s * t.F)) AS DOUBLE)
             / (CAST(t.F AS DOUBLE) * CAST(big.T AS DOUBLE)), 6)
           AS dp
FROM topw t
CROSS JOIN pt p
LEFT JOIN cnt c ON c.w = t.w AND c.part = p.part
CROSS JOIN big
GROUP BY t.w, t.F, big.T""",
        "dictionary_scan_documents": """
WITH pats(pattern) AS (VALUES ('the'), ('with'), ('from'), ('your'), ('search'), ('data'), ('online'), ('home'), ('page'), ('free')),
per AS MATERIALIZED (
  SELECT p.pattern,
         CAST((length(d.text) - length(replace(d.text, p.pattern, '')))
              // length(p.pattern) AS BIGINT) AS c
  FROM documents d CROSS JOIN pats p)
SELECT pattern,
       CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(sum(c) AS BIGINT) AS n_occurrences
FROM per GROUP BY 1""",
        "lateness_histogram_events": """
WITH lat AS MATERIALIZED (
  SELECT CAST((epoch_us(max(ts) OVER (ORDER BY event_id % 97,
                                      event_id
                                      ROWS UNBOUNDED PRECEDING))
               - epoch_us(ts)) // 3600000000 AS BIGINT) AS bucket
  FROM events)
SELECT bucket, CAST(count(*) AS BIGINT) AS n
FROM lat GROUP BY 1""",
        "seq_patterns_events": """
SELECT first_type, then_type, support FROM (
  SELECT x.event_type AS first_type, y.event_type AS then_type,
         CAST(count(DISTINCT x.user_id) AS BIGINT) AS support
  FROM events x JOIN events y
    ON x.user_id = y.user_id AND x.ts < y.ts
  GROUP BY 1, 2) t
WHERE support >= 5""",
        "cuped_events": """
WITH peru AS MATERIALIZED (
  SELECT user_id,
    CAST(sum(CASE WHEN EXTRACT(hour FROM ts) < 12
         THEN CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)
         ELSE 0 END) AS BIGINT) AS xc,
    CAST(sum(CASE WHEN EXTRACT(hour FROM ts) < 12 THEN 0
         ELSE CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)
         END) AS BIGINT) AS yc
  FROM events GROUP BY 1),
v AS MATERIALIZED (
  SELECT CAST(user_id % 2 AS BIGINT) AS variant,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xc) AS BIGINT) AS sx,
         CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(xc * yc) AS BIGINT) AS sxy,
         CAST(sum(xc * xc) AS BIGINT) AS sxx
  FROM peru GROUP BY 1),
gl AS MATERIALIZED (
  SELECT CAST(sum(n) AS DOUBLE) AS ng,
         CAST(sum(sx) AS DOUBLE) AS sxg,
         CAST(sum(sy) AS DOUBLE) AS syg,
         CAST(sum(sxy) AS DOUBLE) AS sxyg,
         CAST(sum(sxx) AS DOUBLE) AS sxxg
  FROM v)
SELECT variant, n AS n_users,
  round((gl.ng * gl.sxyg - gl.sxg * gl.syg)
        / (gl.ng * gl.sxxg - gl.sxg * gl.sxg), 6) AS theta,
  round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
      AS mean_raw,
  round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
         - ((gl.ng * gl.sxyg - gl.sxg * gl.syg)
            / (gl.ng * gl.sxxg - gl.sxg * gl.sxg))
           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
              - gl.sxg / gl.ng)) / 100.0, 6) AS mean_cuped
FROM v, gl""",
        "l_diversity_documents": """
SELECT lang, n_chars // 100 AS size_bucket,
       CAST(count(DISTINCT source) AS BIGINT) AS distinct_sources,
       CAST(count(*) AS BIGINT) AS group_size
FROM documents GROUP BY 1, 2
HAVING count(DISTINCT source) < 3""",
        "neighbor_agg_crawl": f"""WITH {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT split_part(c.url, '/', 3) AS w1,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS w2
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
e AS MATERIALIZED (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM links GROUP BY 1, 2),
indeg AS MATERIALIZED (
  SELECT w2 AS node, CAST(sum(n) AS BIGINT) AS indeg FROM e GROUP BY 1)
SELECT e.w1 AS node,
       CAST(COALESCE(i1.indeg, 0) AS BIGINT) AS indeg,
       round(CAST(sum(e.n * i2.indeg) AS DOUBLE)
             / CAST(sum(e.n) AS DOUBLE), 6) AS nbr_mean_indeg
FROM e
JOIN indeg i2 ON i2.node = e.w2
LEFT JOIN indeg i1 ON i1.node = e.w1
GROUP BY e.w1, i1.indeg""",
        "extract_links_crawl": f"""WITH {CRAWL_CTE}
SELECT c.url, c.warc_ts,
       'https://site-'
       || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
       || '.example.com/p/' || CAST(j.j AS VARCHAR) AS href
FROM crawl c CROSS JOIN LATERAL
  (SELECT unnest(generate_series(
       0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j""",
        "triangle_count_words": """
WITH toks AS MATERIALIZED (
  SELECT string_split(lower(text), ' ') AS ts,
         len(string_split(lower(text), ' ')) AS n
  FROM documents),
bi AS MATERIALIZED (
  SELECT ts[g.i + 1] AS w1, ts[g.i + 2] AS w2
  FROM toks CROSS JOIN LATERAL
    (SELECT unnest(generate_series(0, n - 2)) AS i) g
  WHERE n >= 2),
e AS MATERIALIZED (
  SELECT DISTINCT least(w1, w2) AS a, greatest(w1, w2) AS b
  FROM bi WHERE w1 <> w2)
SELECT count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b""",
        "kfold_split_documents": """
SELECT doc_id,
       (doc_id * 2654435761) % 4294967296 % 5 AS fold
FROM documents""",
        "decayed_topk_urls": f"""{CRAWL_PREFIX},
anchor AS (
  SELECT max(CAST(date_trunc('day', warc_ts) AS TIMESTAMP)) AS a
  FROM obs)
SELECT url,
       sum(pow(0.5, date_diff('day',
               CAST(date_trunc('day', warc_ts) AS TIMESTAMP),
               (SELECT a FROM anchor)))) AS decayed_count
FROM obs GROUP BY 1
ORDER BY decayed_count DESC, url LIMIT 10""",
        "range_join_events": f"""{CRAWL_PREFIX},
ev AS MATERIALIZED (
  SELECT 'https://site-' || CAST(user_id % 40 AS VARCHAR)
         || '.example.com/u/' || CAST(user_id AS VARCHAR) AS url,
         ts AS ev_ts, ts + INTERVAL 6 HOUR AS ev_end, value AS ev_value
  FROM events)
SELECT o.url, o.warc_ts, o.text_len, e.ev_ts, e.ev_value
FROM obs o JOIN ev e ON o.url = e.url
  AND o.warc_ts >= e.ev_ts AND o.warc_ts < e.ev_end""",
        "join_documents_embeddings": """
SELECT d.doc_id, d.lang, d.n_chars, e.label
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id""",
        "semi_join_documents": """
SELECT doc_id, source FROM documents
WHERE source IN ('src1', 'src3', 'src5')""",
        "anti_join_documents": """
SELECT doc_id, lang FROM documents WHERE lang NOT IN ('en', 'de')""",
        # scored_*: the linear model's affine logits spelled out with
        # the same left-associated IEEE order the scorer accumulates in
        # (b + x0*w0 + x1*w1); argmax is first-max-wins like np.argmax.
        "scored_crawl": f"""{CRAWL_PREFIX},
sc AS (
  SELECT url, warc_ts,
    (0.0 + CAST(text_len AS DOUBLE) * 0.01) + CAST(word_count AS DOUBLE) * 0.0 AS s0,
    (-1.0 + CAST(text_len AS DOUBLE) * -0.02) + CAST(word_count AS DOUBLE) * 0.05 AS s1,
    (0.5 + CAST(text_len AS DOUBLE) * 0.0) + CAST(word_count AS DOUBLE) * -0.01 AS s2,
    (text_len = 0 AND word_count = 0) AS masked
  FROM obs)
SELECT url, warc_ts,
  CASE WHEN masked THEN -9999.0
       WHEN s0 >= s1 AND s0 >= s2 THEN 0.0
       WHEN s1 >= s2 THEN 1.0 ELSE 2.0 END AS prediction
FROM sc""",
        "scored_proba_crawl": f"""{CRAWL_PREFIX},
sc AS (
  SELECT url, warc_ts,
    (0.0 + CAST(text_len AS DOUBLE) * 0.01) + CAST(word_count AS DOUBLE) * 0.0 AS s0,
    (-1.0 + CAST(text_len AS DOUBLE) * -0.02) + CAST(word_count AS DOUBLE) * 0.05 AS s1,
    (0.5 + CAST(text_len AS DOUBLE) * 0.0) + CAST(word_count AS DOUBLE) * -0.01 AS s2,
    (text_len = 0 AND word_count = 0) AS masked
  FROM obs)
SELECT url, warc_ts,
  CASE WHEN masked THEN -9999.0 ELSE s0 END AS score_0,
  CASE WHEN masked THEN -9999.0 ELSE s1 END AS score_1,
  CASE WHEN masked THEN -9999.0 ELSE s2 END AS score_2
FROM sc""",
        "scored_regression_crawl": f"""{CRAWL_PREFIX}
SELECT url, warc_ts,
  CASE WHEN text_len = 0 AND word_count = 0 THEN -9999.0
       ELSE ((0.1 + CAST(text_len AS DOUBLE) * 0.001)
             + CAST(word_count AS DOUBLE) * 0.002) * 2.5 + 10.0
  END AS prediction
FROM obs""",
        "regression_metrics_embeddings": """
WITH p AS (SELECT CAST(vec_id % 10 AS DOUBLE) AS pred,
                  CAST(label AS DOUBLE) AS y FROM embeddings),
a AS (SELECT count(*) AS n,
             sum((pred - y) * (pred - y)) AS se,
             sum(abs(pred - y)) AS ae,
             sum(y) AS sy, sum(y * y) AS syy FROM p)
SELECT 'rmse' AS metric_name, sqrt(se / n) AS value FROM a
UNION ALL SELECT 'mae', ae / n FROM a
UNION ALL SELECT 'r2', 1 - se / (syy - sy * sy / n) FROM a
UNION ALL SELECT 'n', CAST(n AS DOUBLE) FROM a""",
        "welch_ttest_crawl": f"""{CRAWL_PREFIX},
daily AS MATERIALIZED (
  SELECT url, metric, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         round(avg(value), 6) AS v
  FROM obs_long GROUP BY 1, 2, 3),
hv AS (SELECT metric,
              CASE WHEN day(day) <= 15 THEN 'a' ELSE 'b' END AS half, v
       FROM daily),
agg AS (SELECT metric, half, count(*) AS n, sum(v) AS s,
               sum(v * v) AS s2
        FROM hv GROUP BY 1, 2),
ab AS (SELECT a.metric, a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
              a.s2 AS s2a, b.s2 AS s2b
       FROM agg a JOIN agg b ON a.metric = b.metric
       WHERE a.half = 'a' AND b.half = 'b' AND a.n >= 2 AND b.n >= 2),
fin AS (SELECT metric, na, nb, sa / na AS ma, sb / nb AS mb,
               (s2a - na * (sa / na) * (sa / na)) / (na - 1) AS va,
               (s2b - nb * (sb / nb) * (sb / nb)) / (nb - 1) AS vb
        FROM ab)
SELECT metric, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round(va, 6) AS var_a, round(vb, 6) AS var_b,
       round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
       round(pow(va / na + vb / nb, 2)
             / (pow(va / na, 2) / (na - 1)
                + pow(vb / nb, 2) / (nb - 1)), 6) AS df
FROM fin WHERE va / na + vb / nb > 0""",
        "mannwhitney_crawl": f"""{CRAWL_PREFIX},
daily AS MATERIALIZED (
  SELECT url, metric, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         round(avg(value), 6) AS v
  FROM obs_long GROUP BY 1, 2, 3),
hv AS MATERIALIZED (
  SELECT metric,
         CASE WHEN day(day) <= 15 THEN 'a' ELSE 'b' END AS half, v
  FROM daily),
tot AS (SELECT metric,
               count(*) FILTER (WHERE half = 'a') AS na,
               count(*) FILTER (WHERE half = 'b') AS nb,
               count(*) AS n
        FROM hv GROUP BY 1),
rk AS (SELECT metric, half,
              rank() OVER (PARTITION BY metric ORDER BY v)
              + (count(*) OVER (PARTITION BY metric, v) - 1) / 2.0
                  AS avg_rank
       FROM hv),
rs AS (SELECT metric,
              sum(avg_rank) FILTER (WHERE half = 'a') AS r_a
       FROM rk GROUP BY 1),
ties AS (SELECT metric, sum(pow(c, 3) - c) AS tie
         FROM (SELECT metric, v, CAST(count(*) AS DOUBLE) AS c
               FROM hv GROUP BY 1, 2)
         GROUP BY 1),
fin AS (SELECT t.metric, t.na, t.nb, t.n,
               r.r_a - t.na * (t.na + 1) / 2.0 AS u_a,
               (t.na * t.nb / 12.0)
               * ((t.n + 1.0) - x.tie / (t.n * (t.n - 1.0))) AS var
        FROM tot t JOIN rs r ON t.metric = r.metric
        JOIN ties x ON t.metric = x.metric
        WHERE t.na > 0 AND t.nb > 0)
SELECT metric, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(u_a, 6) AS u_a,
       round((u_a - na * nb / 2.0) / sqrt(var), 6) AS z
FROM fin WHERE var > 0""",
        "ks_test_crawl": f"""{CRAWL_PREFIX},
daily AS MATERIALIZED (
  SELECT url, metric, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         round(avg(value), 6) AS v
  FROM obs_long GROUP BY 1, 2, 3),
hv AS MATERIALIZED (
  SELECT metric,
         CASE WHEN day(day) <= 15 THEN 'a' ELSE 'b' END AS half, v
  FROM daily),
cnts AS (SELECT metric, v,
                count(*) FILTER (WHERE half = 'a') AS ca,
                count(*) FILTER (WHERE half = 'b') AS cb
         FROM hv GROUP BY 1, 2),
tot AS (SELECT metric, sum(ca) AS na, sum(cb) AS nb
        FROM cnts GROUP BY 1),
cum AS (SELECT metric,
               sum(ca) OVER (PARTITION BY metric ORDER BY v) AS cum_a,
               sum(cb) OVER (PARTITION BY metric ORDER BY v) AS cum_b
        FROM cnts),
d AS (SELECT c.metric, t.na, t.nb,
             max(abs(c.cum_a / t.na - c.cum_b / t.nb)) AS d_stat
      FROM cum c JOIN tot t ON c.metric = t.metric
      WHERE t.na > 0 AND t.nb > 0
      GROUP BY 1, 2, 3)
SELECT metric, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(d_stat, 6) AS d_stat,
       round(sqrt(na * nb / (na + nb)) * d_stat, 6) AS ks_stat
FROM d""",
        "conformal_intervals_crawl": f"""{CRAWL_PREFIX},
p AS MATERIALIZED (
  SELECT url, warc_ts, CAST(text_len AS DOUBLE) AS y,
         round((0.1 + CAST(word_count AS DOUBLE) * 0.002) * 2.5
               + 10.0, 6) AS pred,
         (CAST(epoch(warc_ts) AS BIGINT) * 2654435761)
             % 4294967296 % 5 AS fold
  FROM obs WHERE NOT (text_len = 0 AND word_count = 0)),
cal AS (SELECT CAST(round(abs(y - pred) * 1000000, 0) AS BIGINT)
               AS r_u
        FROM p WHERE fold = 0),
nn AS (SELECT count(*) AS n FROM cal),
rk AS (SELECT r_u, row_number() OVER (ORDER BY r_u) AS rn FROM cal),
qq AS (SELECT min(r_u) / 1000000.0 AS qhat FROM rk, nn
       WHERE rn >= least(CAST(ceil((n + 1) * 0.9) AS BIGINT), n))
SELECT url, warc_ts, pred,
       round(pred - qq.qhat, 6) AS lo,
       round(pred + qq.qhat, 6) AS hi
FROM p, qq WHERE fold <> 0""",
        "adamic_adar_crawl": f"""WITH {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT split_part(c.url, '/', 3) AS src,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS dst
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
sym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM links WHERE src <> dst
    UNION ALL SELECT dst AS src, src AS dst FROM links
    WHERE src <> dst)),
deg AS (SELECT src AS w, count(DISTINCT dst) AS d FROM sym GROUP BY 1),
wu AS (SELECT w, CAST(round(1000000 / ln(d + 0.0), 0) AS BIGINT) AS w_u
       FROM deg WHERE d >= 2),
wedge AS (SELECT e1.dst AS a, e2.dst AS b, wu.w_u
          FROM sym e1
          JOIN sym e2 ON e1.src = e2.src AND e1.dst < e2.dst
          JOIN wu ON wu.w = e1.src),
aa AS (SELECT a, b, CAST(sum(w_u) AS BIGINT) AS aa_u
       FROM wedge GROUP BY 1, 2),
nonedge AS (SELECT aa.* FROM aa WHERE NOT EXISTS
            (SELECT 1 FROM sym
             WHERE sym.src = aa.a AND sym.dst = aa.b))
SELECT a AS node_a, b AS node_b, aa_u FROM nonedge
ORDER BY aa_u DESC, node_a, node_b LIMIT 100""",
        "naive_bayes_lang_documents": """
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, t.tok AS word
  FROM documents CROSS JOIN LATERAL
    unnest(string_split(lower(text), ' ')) AS t(tok)),
dw AS MATERIALIZED (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2),
dt AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS t_d
       FROM dw GROUP BY 1),
cw AS MATERIALIZED (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2),
lt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_l FROM cw GROUP BY 1),
ld AS (SELECT lang, CAST(count(*) AS BIGINT) AS d_l
       FROM documents GROUP BY 1),
vv AS (SELECT count(DISTINCT word) AS v FROM cw),
dd AS (SELECT count(*) AS d FROM documents),
wu AS (SELECT lang, word,
              CAST(round(ln(c + 1.0) * 1000000, 0) AS BIGINT) AS w_u
       FROM cw),
consts AS (SELECT lt.lang,
       CAST(round(ln(ld.d_l * 1.0 / dd.d) * 1000000, 0) AS BIGINT)
           AS prior_u,
       CAST(round(ln(lt.n_l + vv.v + 0.0) * 1000000, 0) AS BIGINT)
           AS len_u
       FROM lt JOIN ld ON lt.lang = ld.lang, vv, dd),
s AS (SELECT dw.doc_id, wu.lang,
             CAST(sum(dw.cnt * wu.w_u) AS BIGINT) AS s
      FROM dw JOIN wu ON dw.word = wu.word GROUP BY 1, 2),
grid AS (SELECT dt.doc_id, k.lang,
                k.prior_u + COALESCE(s.s, 0) - dt.t_d * k.len_u
                    AS score_u
         FROM dt CROSS JOIN consts k
         LEFT JOIN s ON s.doc_id = dt.doc_id AND s.lang = k.lang),
best AS (SELECT doc_id, lang AS pred_lang, score_u,
                row_number() OVER (PARTITION BY doc_id
                    ORDER BY score_u DESC, lang) AS rn
         FROM grid)
SELECT doc_id, pred_lang, CAST(score_u AS BIGINT) AS score_u
FROM best WHERE rn = 1 ORDER BY doc_id""",
        "crawl_depth_bfs": f"""WITH RECURSIVE {CRAWL_CTE},
links AS MATERIALIZED (
  SELECT split_part(c.url, '/', 3) AS src,
         'site-'
         || CAST((length(CAST(c.html AS VARCHAR)) + j.j) % 40 AS VARCHAR)
         || '.example.com' AS dst
  FROM crawl c CROSS JOIN LATERAL
    (SELECT unnest(generate_series(
         0, length(CAST(c.html AS VARCHAR)) % 4 - 1)) AS j) j),
edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM links),
nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst AS node FROM edges),
reach(node, d) AS (
  SELECT node, 0 AS d FROM nodes WHERE node LIKE 'site-1%'
  UNION
  SELECT e.dst AS node, r.d + 1 AS d
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.d < 20)
SELECT node, CAST(min(d) AS BIGINT) AS depth
FROM reach GROUP BY 1 ORDER BY 1""",
        "domain_drift_bh_crawl": f"""{CRAWL_PREFIX},
daily AS MATERIALIZED (
  SELECT url, CAST(date_trunc('day', warc_ts) AS TIMESTAMP) AS day,
         round(avg(value), 6) AS v
  FROM obs_long WHERE metric = 'text_len' GROUP BY 1, 2),
hv AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
              CASE WHEN day(day) <= 15 THEN 1.0 ELSE 0.0 END AS a, v
       FROM daily),
agg AS (SELECT domain,
               sum(a) AS na, sum(a * v) AS sa, sum(a * v * v) AS s2a,
               sum(1 - a) AS nb, sum((1 - a) * v) AS sb,
               sum((1 - a) * v * v) AS s2b
        FROM hv GROUP BY 1),
var AS (SELECT domain, na, nb,
               sa / na AS ma, sb / nb AS mb,
               ((s2a - na * (sa / na) * (sa / na)) / (na - 1)) / na
               + ((s2b - nb * (sb / nb) * (sb / nb)) / (nb - 1)) / nb
                   AS se2
        FROM agg WHERE na >= 2 AND nb >= 2),
fin AS (SELECT domain, na, nb,
               round((ma - mb) / sqrt(se2), 6) AS z
        FROM var WHERE se2 > 0),
px AS (SELECT domain, na, nb, z, abs(z) / sqrt(2.0) AS x,
              1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
       FROM fin),
pv AS (SELECT domain, na, nb, z,
              round(t * (0.254829592 + t * (-0.284496736
                    + t * (1.421413741 + t * (-1.453152027
                    + t * 1.061405429)))) * exp(-x * x), 6) AS p
       FROM px),
mm AS (SELECT count(*) AS m FROM pv),
rk AS (SELECT pv.*, mm.m,
              row_number() OVER (ORDER BY p, domain) AS rn
       FROM pv, mm),
adj AS (SELECT *, min(p * m / rn) OVER (
                ORDER BY rn DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS padj
        FROM rk)
SELECT domain, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       z, p AS p_value, round(least(padj, 1.0), 6) AS p_bh
FROM adj""",
        "chi2_lang_weekly": f"""{CRAWL_PREFIX},
c AS (SELECT lang, CAST(date_trunc('week', warc_ts) AS TIMESTAMP) AS week,
             count(*) AS observed
      FROM obs GROUP BY 1, 2),
e AS (SELECT lang, week, observed,
             sum(observed) OVER (PARTITION BY lang) * 1.0
             * sum(observed) OVER (PARTITION BY week)
             / sum(observed) OVER () AS exp
      FROM c)
SELECT lang, week, CAST(observed AS BIGINT) AS observed,
       round(exp, 6) AS expected,
       round(pow(observed - exp, 2) / exp, 6) AS contrib
FROM e""",
    }
    # unbounded variants share their bounded twins' oracles — the
    # driver certifies the halo/prefix-scan algebra, not new semantics
    out["crawl_sessions_unbounded"] = out["crawl_sessions"]
    out["rolling_mean_unbounded"] = out["rolling_mean_crawl"]
    return out
