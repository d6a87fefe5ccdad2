"""LSA-lite: top right-singular vector of the term–document count
matrix by distributed power iteration — v ← normalize(Aᵀ(A v)).

The web-corpus shape this is built for: the vocabulary is UNBOUNDED
(no driver-held term table, no broadcast v). Each half-product is a
tag-union keyed exchange — the same one-shuffle join the engine's
tf-idf/PMI/Kneser-Ney stages use:

- ``y = A v``: v rows ride the token key to meet the tf rows, the
  products re-exchange on doc, and per-doc sums reduce in
  token-sorted order;
- ``w = Aᵀ y``: symmetric, keyed on doc then token, per-token sums
  in doc-sorted order;
- ``‖w‖``: per-partition partial squared sums under the
  fixed-partition contract (token-hash pid, token-sorted rows,
  ascending-pid driver merge — the trainer/Huber shape).

Determinism: every float reduction happens over a value-sorted
segment via ``segment_sums`` (numpy pairwise reduce per segment —
depends only on the segment's content, never on block layout), so a
flat oracle importing the same leaf kernel reproduces the iteration
bit-for-bit. Init v₀ is a pure function of the token string (sha1
prefix), so both sides start identically without sharing state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from sits_classification_ray.stages.joins import _bloom_key_hash


def segment_sums(sorted_keys: np.ndarray, values: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(unique keys, per-segment sums) over a key-sorted pair of
    arrays. np.add.reduceat's per-segment pairwise reduction depends
    only on the segment content — the shared leaf kernel that makes
    engine partitions and the flat oracle bit-identical."""
    uk, starts = np.unique(sorted_keys, return_index=True)
    if len(uk) == 0:
        return uk, np.array([], dtype=np.float64)
    return uk, np.add.reduceat(values, starts)


def token_init(tokens: np.ndarray) -> np.ndarray:
    """v₀ per token: sha1-prefix hash → uniform [-0.5, 0.5)."""
    h = _bloom_key_hash(tokens)
    return (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53 - 0.5


def _tf_table(ds: rd.Dataset, id_col: str, text_col: str) -> rd.Dataset:
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def tf(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(pc.utf8_lower(b[text_col]), " ")
        parent = pc.list_parent_indices(lists)
        return pa.table({
            "doc": pc.take(pc.cast(b[id_col], pa.int64()), parent),
            "token": pc.list_flatten(lists),
            "tf": pa.array(np.ones(len(pc.list_flatten(lists)),
                                   dtype=np.int64))})

    return (ds.map_batches(tf, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["doc", "token"])
            .aggregate(Sum("tf", alias_name="tf")))


def lsa_top_component(ds: rd.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", n_iters: int = 4,
                      k: int = 20, num_partitions: int = 32,
                      round_to: int = 6) -> pd.DataFrame:
    """Top-k terms by |loading| on the corpus' first LSA component.
    Returns (token, loading) with (|loading| desc, token asc) order.
    """
    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.sampling import top_k_per_group
    from sits_classification_ray.stages.shuffle import partitioned_map

    tf = _tf_table(ds, id_col, text_col).materialize()

    def init_v(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates("token").sort_values("token",
                                                    kind="mergesort")
        toks = g["token"].to_numpy(object)
        return pd.DataFrame({"token": toks, "v": token_init(toks)})

    v = partitioned_map(tf, init_v, keys=["token"],
                        num_partitions=num_partitions).materialize()

    tf_schema = pa.schema([("doc", pa.int64()), ("token", pa.string()),
                           ("tf", pa.int64()), ("val", pa.float64())])
    doc_schema = pa.schema([("doc", pa.int64()), ("y", pa.float64())])
    tok_schema = pa.schema([("token", pa.string()),
                            ("v", pa.float64())])

    def tag_tf(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc", "token", "tf"]].copy()
        out["val"] = np.nan
        return out

    for it in range(n_iters):
        # ---- y = A v : exchange on token, product, reduce on doc
        def tag_v(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"doc": np.int64(-1),
                                 "token": df["token"].to_numpy(object),
                                 "tf": np.int64(-1),
                                 "val": df["v"].to_numpy(np.float64)})

        un = tf.map_batches(tag_tf, batch_format="pandas").union(
            v.map_batches(tag_v, batch_format="pandas"))

        def mul_v(df: pd.DataFrame) -> pd.DataFrame:
            side_v = df[df["tf"] < 0].sort_values("token",
                                                  kind="mergesort")
            rows = df[df["tf"] >= 0]
            pos = np.searchsorted(side_v["token"].to_numpy(object),
                                  rows["token"].to_numpy(object))
            return pd.DataFrame({
                "doc": rows["doc"].to_numpy(np.int64),
                "token": rows["token"].to_numpy(object),
                "tf": rows["tf"].to_numpy(np.int64),
                "val": rows["tf"].to_numpy(np.float64)
                * side_v["val"].to_numpy(np.float64)[pos]})

        prod = partitioned_map(un, mul_v, keys=["token"],
                               num_partitions=num_partitions,
                               out_schema=tf_schema)

        def reduce_doc(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["doc", "token"], kind="mergesort")
            uk, s = segment_sums(df["doc"].to_numpy(np.int64),
                                 df["val"].to_numpy(np.float64))
            return pd.DataFrame({"doc": uk, "y": s})

        y = partitioned_map(prod, reduce_doc, keys=["doc"],
                            num_partitions=num_partitions,
                            out_schema=doc_schema)

        # ---- w = Aᵀ y : exchange on doc, product, reduce on token
        def tag_y(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"doc": df["doc"].to_numpy(np.int64),
                                 "token": "",
                                 "tf": np.int64(-1),
                                 "val": df["y"].to_numpy(np.float64)})

        un2 = tf.map_batches(tag_tf, batch_format="pandas").union(
            y.map_batches(tag_y, batch_format="pandas"))

        def mul_y(df: pd.DataFrame) -> pd.DataFrame:
            side_y = df[df["tf"] < 0].sort_values("doc",
                                                  kind="mergesort")
            rows = df[df["tf"] >= 0]
            pos = np.searchsorted(side_y["doc"].to_numpy(np.int64),
                                  rows["doc"].to_numpy(np.int64))
            return pd.DataFrame({
                "doc": rows["doc"].to_numpy(np.int64),
                "token": rows["token"].to_numpy(object),
                "tf": rows["tf"].to_numpy(np.int64),
                "val": rows["tf"].to_numpy(np.float64)
                * side_y["val"].to_numpy(np.float64)[pos]})

        prod2 = partitioned_map(un2, mul_y, keys=["doc"],
                                num_partitions=num_partitions,
                                out_schema=tf_schema)

        def reduce_tok(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["token", "doc"], kind="mergesort")
            uk, s = segment_sums(df["token"].to_numpy(object),
                                 df["val"].to_numpy(np.float64))
            return pd.DataFrame({"token": uk, "v": s})

        w = partitioned_map(prod2, reduce_tok, keys=["token"],
                            num_partitions=num_partitions,
                            out_schema=tok_schema).materialize()

        # ---- ‖w‖ under the fixed-partition contract
        def norm_part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values("token", kind="mergesort")
            toks = df["token"].to_numpy(object)
            pid = (pd.util.hash_array(toks, categorize=False)
                   % np.uint64(num_partitions)).astype(np.int64)
            order = np.argsort(pid, kind="mergesort")
            uk, ss = segment_sums(
                pid[order],
                (df["v"].to_numpy(np.float64) ** 2)[order])
            return pd.DataFrame({"pid": uk, "ss": ss})

        parts = partitioned_map(
            w.map_batches(lambda df: df.assign(
                pid=(pd.util.hash_array(
                    df["token"].to_numpy(object), categorize=False)
                    % np.uint64(num_partitions)).astype(np.int64)),
                batch_format="pandas"),
            norm_part, keys=["pid"]).to_pandas() \
            .sort_values("pid", ignore_index=True)
        norm = float(np.sqrt(np.sum(parts["ss"].to_numpy(np.float64))))

        def scale(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "token": df["token"].to_numpy(object),
                "v": df["v"].to_numpy(np.float64) / norm})

        v = w.map_batches(scale, batch_format="pandas").materialize()

    def absload(df: pd.DataFrame) -> pd.DataFrame:
        lv = df["v"].to_numpy(np.float64)
        return pd.DataFrame({"token": df["token"].to_numpy(object),
                             "loading": np.round(lv, round_to) + 0.0,
                             "absl": np.round(np.abs(lv), round_to)})

    scored = v.map_batches(absload, batch_format="pandas")
    top = top_k_per_group(
        scored.map_batches(lambda df: df.assign(_g=np.int64(0)),
                           batch_format="pandas"),
        ["_g"], "absl", k=k, ascending=False, tie_col="token")
    out = top.to_pandas().sort_values(
        ["absl", "token"], ascending=[False, True], kind="mergesort",
        ignore_index=True)
    return out[["token", "loading"]]
