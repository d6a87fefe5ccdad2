"""Corpus-curation operators: data-mixture sampling and benchmark
decontamination — the two remaining named stages of a public
LLM-training-data pipeline (Dolma/Pile-style source mixing; eval-set
n-gram decontamination) not covered by the dedup/quality families.

Both are zero- or one-pass streaming ops: mixture sampling needs NO
shuffle at all (membership is a pure hash predicate per row), and
decontamination broadcasts the small benchmark shingle set once via
``ray.put`` and scans the corpus in one vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def weighted_mixture(ds: rd.Dataset, weights: dict[str, float],
                     group_col: str = "source", id_col: str = "doc_id"
                     ) -> rd.Dataset:
    """Deterministic source-mixture sampling: keep each row of group
    *g* iff ``SipHash(id) / 2⁶⁴ < weights[g]`` — an exact Bernoulli
    thinning per source that is reproducible under ANY partitioning
    and needs no shuffle, no counts pass, and no coordination (the
    standard way public pipelines hit target mixture proportions).
    Groups absent from ``weights`` are dropped (weight 0).
    """
    thresholds = {g: float(min(max(w, 0.0), 1.0))
                  for g, w in weights.items()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[id_col], index=False,
                                       categorize=False).to_numpy()
        frac = h.astype(np.float64) / float(2**64)
        thr = (df[group_col].map(thresholds)
               .fillna(0.0).to_numpy(dtype=np.float64))
        return df[frac < thr]

    return ds.map_batches(keep, batch_format="pandas")


def _shingle_windows(texts, k: int):
    """All k-token space-joined windows per text, vectorized: one
    flat token array, one shifted-concat per window slot (k string
    concats total per batch, not per row)."""
    toks = pc.split_pattern(texts, " ")
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    n_win = np.maximum(lens - (k - 1), 0)
    # window start indices into flat: per-row base offset + within-row
    # position, both by vectorized repeat (no per-row Python)
    total = int(n_win.sum())
    row_base = np.repeat(offsets[:-1], n_win)
    win_cum = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(win_cum, n_win)
    starts = row_base + within
    if len(starts) == 0:
        return np.array([], dtype=object), n_win
    win = flat[starts].astype(object)
    for j in range(1, k):
        win = win + " "
        win = win + flat[starts + j].astype(object)
    return win, n_win


def decontaminate(ds: rd.Dataset, benchmark_texts: list[str],
                  k: int = 8, id_col: str = "doc_id",
                  text_col: str = "text") -> rd.Dataset:
    """Benchmark decontamination: per document, count how many of its
    k-token windows appear verbatim in the benchmark set's shingle
    vocabulary (the n-gram-overlap rule public pipelines apply before
    training). Output: ``(id, n_windows, n_hits, contaminated)`` for
    every input document.

    The benchmark shingle set is built driver-side from the (small)
    benchmark texts and broadcast ONCE via ``ray.put``; the corpus
    passes through a single vectorized ``np.isin`` scan — exact string
    comparison, no hashing, so there is no collision caveat.
    """
    bench_win, _ = _shingle_windows(pa.array(benchmark_texts), k)
    bench_ref = ray.put(np.unique(bench_win.astype(str)))

    class Scan:
        def __init__(self):
            self.bench = ray.get(bench_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            win, n_win = _shingle_windows(batch[text_col], k)
            hit = np.isin(win.astype(str), self.bench) \
                if len(win) else np.array([], dtype=bool)
            bounds = np.zeros(len(batch) + 1, dtype=np.int64)
            np.cumsum(n_win, out=bounds[1:])
            hits = (np.add.reduceat(
                np.concatenate([hit.astype(np.int64), [0]]),
                bounds[:-1]) if len(batch) else
                np.array([], dtype=np.int64))
            hits[bounds[:-1] == bounds[1:]] = 0
            return pa.table({
                id_col: batch[id_col],
                "n_windows": pa.array(n_win, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(hits > 0),
            })

    return ds.map_batches(Scan, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8),
                          num_cpus=1)


def paragraph_dedup(ds: rd.Dataset, span_tokens: int = 12,
                    id_col: str = "doc_id", text_col: str = "text"
                    ) -> rd.Dataset:
    """CCNet-style sub-document dedup: split each document into
    consecutive disjoint ``span_tokens``-token spans (the "paragraph"
    unit of a newline-free corpus; CCNet's unit is the newline
    paragraph), keep only the globally FIRST occurrence of each
    distinct span — ordered by ``(doc_id, span_idx)`` — and reassemble
    each document from its surviving spans. Documents whose every span
    is a duplicate of an earlier document drop out entirely (CCNet
    likewise discards emptied docs). Output:
    ``(doc_id, text_kept, n_spans, n_kept)``.

    Distributed shape — two narrow exchanges, never an all-pairs
    comparison:

    1. flat-map docs → span rows ``(doc_id, span_idx, span_text,
       n_spans)`` (pure row expansion, no shuffle);
    2. exchange ON THE SPAN key (`partitioned_map` salted string
       hash): each partition holds every occurrence of its spans, a
       vectorized first-wins ``drop_duplicates`` keeps the minimum
       ``(doc_id, span_idx)`` per span text — duplicate occurrences
       die here, so only surviving spans travel further;
    3. exchange back on ``doc_id`` and join each doc's survivors in
       span order.

    The span-key exchange moves each distinct span's text once per
    occurrence (inherent: first-wins needs occurrences co-located);
    the doc-key exchange moves only survivors. Matches the DuckDB
    twin ``row_number() OVER (PARTITION BY span_text ORDER BY doc_id,
    span_idx) = 1``.
    """
    from sits_classification_ray.stages.shuffle import partitioned_map

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids, sidx, texts, nsp = [], [], [], []
        for did, t in zip(df[id_col].to_numpy(np.int64), df[text_col]):
            toks = (t or "").split(" ")
            n = len(toks)
            starts = range(0, n, span_tokens)
            for si, s in enumerate(starts):
                ids.append(did)
                sidx.append(si)
                texts.append(" ".join(toks[s:s + span_tokens]))
            nsp.extend([len(starts)] * len(starts))
        return pd.DataFrame({id_col: np.array(ids, np.int64),
                             "span_idx": np.array(sidx, np.int64),
                             "span_text": texts,
                             "n_spans": np.array(nsp, np.int64)})

    spans = ds.map_batches(expand, batch_format="pandas")

    def first_wins(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "span_idx"], kind="mergesort")
        return df[~df.duplicated("span_text", keep="first")]

    kept = partitioned_map(spans, first_wins, keys=["span_text"])

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "span_idx"], kind="mergesort")
        g = df.groupby(id_col, sort=False)
        out = pd.DataFrame({
            "text_kept": g["span_text"].agg(" ".join),
            "n_spans": g["n_spans"].first(),
            "n_kept": g["span_idx"].size().astype(np.int64),
        }).reset_index()
        return out[[id_col, "text_kept", "n_spans", "n_kept"]]

    return partitioned_map(kept, reassemble, keys=[id_col])


def dsir_logweights(ds: rd.Dataset, target_col: str = "lang",
                    target_value: str = "en", vocab_k: int = 1000,
                    id_col: str = "doc_id", text_col: str = "text",
                    smoothing: float = 1.0,
                    round_to: int = 6) -> rd.Dataset:
    """DSIR-style log importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its bag of words is under
    the TARGET domain's unigram distribution than under the raw
    corpus's —

        log w(doc) = Σ_w c_w(doc) · [ln p̂_tgt(w) − ln p̂_raw(w)]

    with add-``smoothing`` estimates over a FIXED feature vocabulary.
    DSIR bounds its feature space by hashing n-grams into buckets;
    this implementation bounds it by the top-``vocab_k`` corpus words
    (count desc, token asc — deterministic), which keeps the operator
    ANSI-SQL-checkable while preserving the estimator's shape.
    Out-of-vocabulary tokens contribute nothing to either estimate
    (their hashed-bucket mass is what DSIR's variant would spread).

    Output: one row per input document —
    ``(doc_id, n_vocab_tokens, log_weight)``; documents containing no
    vocabulary token get ``(0, 0.0)``.

    Scale shape: two distributed count combiners (raw corpus + target
    subset), a sort+limit bounded by ``vocab_k``, then ONE broadcast
    of the ``vocab_k``-row log-ratio table via ``ray.put`` and a
    single vectorized scoring pass — no shuffle touches document
    rows, and nothing unbounded ever reaches the driver (the collect
    is capped at ``vocab_k`` rows by construction).
    """
    from sits_classification_ray.stages.textstats import token_counts

    raw = token_counts(ds, text_col)
    vocab = (raw.sort(["n", "token"], descending=[True, False])
             .limit(vocab_k).to_pandas())

    def only_target(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch[target_col],
                                     pa.scalar(target_value)))

    tgt_counts = token_counts(
        ds.map_batches(only_target, batch_format="pyarrow",
                       zero_copy_batch=True), text_col)
    vocab_set = set(vocab["token"])

    def in_vocab(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["token"].isin(vocab_set)]

    tgt = (tgt_counts.map_batches(in_vocab, batch_format="pandas")
           .to_pandas())                     # ≤ vocab_k rows

    k = len(vocab)
    nr = vocab.set_index("token")["n"].astype(np.float64)
    nt = (tgt.set_index("token")["n"].reindex(nr.index)
          .fillna(0.0).astype(np.float64))
    tr = float(nr.sum())
    tt = float(nt.sum())
    s = float(smoothing)
    lw = (np.log((nt + s) / (tt + s * k))
          - np.log((nr + s) / (tr + s * k)))
    ratio_ref = ray.put(pd.DataFrame({"token": nr.index,
                                      "lw": lw.to_numpy()}))

    return ds.map_batches(
        _DsirScorer, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), num_cpus=1,
        fn_constructor_args=(ratio_ref, id_col, text_col, round_to))


class _DsirScorer:
    """Actor-pool scoring stage for :func:`dsir_logweights`: the
    broadcast log-ratio table is fetched and indexed ONCE per actor
    in ``__init__``; each ``__call__`` is a vectorized split → map →
    segment-sum over the batch."""

    def __init__(self, ratio_ref, id_col: str, text_col: str,
                 round_to: int):
        ratios = ray.get(ratio_ref)
        self.lmap = pd.Series(ratios["lw"].to_numpy(),
                              index=ratios["token"])
        self.id_col = id_col
        self.text_col = text_col
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(
            pc.utf8_lower(batch[self.text_col]), " ")
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(lists).to_numpy()
        vals = pd.Series(flat).map(self.lmap).to_numpy(np.float64)
        hit = ~np.isnan(vals)
        n_rows = len(batch)
        n_hits = np.bincount(parent[hit], minlength=n_rows)
        sums = np.bincount(parent[hit], weights=vals[hit],
                           minlength=n_rows)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_vocab_tokens": pa.array(n_hits.astype(np.int64)),
            "log_weight": pa.array(np.round(sums, self.round_to)),
        })


def lang_temperature_weights(ds: rd.Dataset, group_col: str = "lang",
                             alpha: float = 0.3,
                             round_to: int = 6) -> pd.DataFrame:
    """Temperature-based mixture reweighting (the mT5 / XLM-R
    multilingual sampling rule): sampling probability for group *l*
    is ``p_l^α / Σ_m p_m^α`` with ``p_l`` the group's raw share of
    documents — α < 1 up-samples tail languages. Returns the bounded
    per-group table ``(lang, n_docs, p_raw, p_temp)``.

    Scale shape: one distributed count aggregate; the finalize runs
    on the collected per-GROUP table, whose size is the number of
    languages — bounded, never corpus-scale."""
    counts = (ds.groupby(group_col).count()
              .to_pandas().rename(columns={"count()": "n_docs"}))
    n = counts["n_docs"].to_numpy(np.float64)
    p = n / n.sum()
    pt = p ** alpha
    pt = pt / pt.sum()
    out = pd.DataFrame({
        group_col: counts[group_col],
        "n_docs": counts["n_docs"].astype(np.int64),
        "p_raw": np.round(p, round_to),
        "p_temp": np.round(pt, round_to),
    }).sort_values(group_col, kind="mergesort").reset_index(drop=True)
    return out


def kcenter_select(ds: rd.Dataset, k: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_to: int = 6) -> pd.DataFrame:
    """Greedy k-center coreset selection (Gonzalez farthest-point
    traversal) over the embedding corpus — the "pick k maximally
    diverse exemplars" primitive of training-data subset selection
    (each selection is the point worst-covered by the current set, so
    the result 2-approximates the optimal k-center cover).

    Distributed shape: the min-distance-to-selected column is carried
    IN the dataset and updated against only the newest center per
    round (one broadcast scalar vector, one map, one materialize), so
    the total work is O(n·k) — never O(n·k²), never a driver-side
    vector matrix. Per round the global farthest point reduces via
    per-block candidates (max is order-free; ties break to the
    smaller id). Every distance is an elementwise ufunc on float64,
    so selections are bit-deterministic under any block layout
    (golden twin replicates single-process).

    Returns the k-row ``(sel_rank, vec_id, radius)`` table — radius is
    the max-min distance at selection time, i.e. the coverage radius
    achieved by the PREVIOUS set.
    """
    import ray

    first = ds.min(id_col)

    def seed_vec(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df[id_col] == first]
        return m[[id_col, vec_col]]

    seed = ds.map_batches(seed_vec, batch_format="pandas").take_all()
    c_vec = np.asarray(seed[0][vec_col], dtype=np.float64)
    c_id = int(seed[0][id_col])

    def init(df: pd.DataFrame) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df[vec_col]])
        d2 = np.add.reduce((X - c_vec) ** 2, axis=1)
        return pd.DataFrame({id_col: df[id_col].astype(np.int64),
                             vec_col: df[vec_col],
                             "_d2": d2})

    state = ds.map_batches(init, batch_format="pandas").materialize()
    out = [{"sel_rank": np.int64(0), "vec_id": np.int64(c_id),
            "radius": np.inf}]

    for r in range(1, k):
        def cand(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df[[id_col, vec_col, "_d2"]]
            i = int(np.lexsort((df[id_col].to_numpy(),
                                -df["_d2"].to_numpy()))[0])
            return df.iloc[i:i + 1][[id_col, vec_col, "_d2"]]

        cands = state.map_batches(cand,
                                  batch_format="pandas").take_all()
        best = max(cands, key=lambda row: (row["_d2"], -row[id_col]))
        c_vec = np.asarray(best[vec_col], dtype=np.float64)
        c_id = int(best[id_col])
        out.append({"sel_rank": np.int64(r), "vec_id": np.int64(c_id),
                    "radius": float(np.sqrt(best["_d2"]))})
        vec_ref = ray.put(c_vec)

        def update(df: pd.DataFrame, _ref=vec_ref) -> pd.DataFrame:
            c = ray.get(_ref)
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[vec_col]]) if len(df) else \
                np.zeros((0, len(c)))
            d2 = np.add.reduce((X - c) ** 2, axis=1)
            out = df.copy(deep=False)
            out["_d2"] = np.minimum(df["_d2"].to_numpy(np.float64), d2)
            return out

        state = state.map_batches(update,
                                  batch_format="pandas").materialize()

    from sits_classification_ray.functions.transforms import sql_round

    res = pd.DataFrame(out)
    # the seed has no previous cover: report radius -1 (distances are
    # nonnegative, so the sentinel is unambiguous)
    r = res["radius"].to_numpy(np.float64)
    res["radius"] = np.where(np.isinf(r), -1.0, sql_round(r, round_to))
    return res
