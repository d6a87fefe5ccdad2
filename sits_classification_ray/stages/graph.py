"""Graph analytics over edge tables (weighted PageRank).

Complements :func:`~sits_classification_ray.stages.dedup_docs.connected_components`
(min-label propagation) with the other canonical iterative graph
computation. Both follow the same Ray-Data shape: the per-iteration
state is a vocabulary-sized (node, value) Dataset, each iteration is
one tag-union salted exchange joining state onto the edge table plus a
deterministic per-partition reduce — the edge table itself never moves
after its first partition, and no driver-side collection of nodes or
edges ever happens.

Determinism contract (what makes a golden-file oracle possible for an
iterative float algorithm): every per-node sum is computed by the SAME
pandas groupby-sum over rows pre-sorted by (dst, src), so summation
order — and therefore every last bit of every iteration — is a pure
function of the graph, not of block arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from sits_classification_ray.stages.shuffle import partitioned_map


def pagerank(edges: rd.Dataset, src_col: str = "w1",
             dst_col: str = "w2", weight_col: str = "n",
             damping: float = 0.85, iterations: int = 10,
             round_to: int = 6) -> rd.Dataset:
    """Weighted PageRank over a directed edge table, ``iterations``
    synchronous power steps of
    ``r(v) = (1-d)/N + d · Σ_{u→v} r(u) · w(u,v) / outw(u)``.

    Simplification (documented, standard for the simple variant):
    dangling-node mass is not redistributed — nodes with no outgoing
    edges absorb rank. The independent golden oracle implements the
    identical variant.

    Scale shape: edges are augmented ONCE with their source's total
    outgoing weight (one salted exchange on src). Each iteration then
    joins the current rank vector onto the edges by src (tag-union
    exchange — ranks are O(nodes), edges stay put logically), emits
    per-edge contributions, and reduces them per dst inside a second
    salted exchange with the sorted-sum determinism contract above.
    The rank vector is materialized per iteration (it is node-sized,
    tiny next to the corpus).
    """
    # node universe = every src or dst (each exactly once)
    def srcs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[src_col]})

    def dsts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[dst_col]})

    from ray.data.aggregate import Count, Sum

    nodes = (edges.map_batches(srcs, batch_format="pandas")
             .union(edges.map_batches(dsts, batch_format="pandas"))
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    n_nodes = nodes.count()
    teleport = (1.0 - damping) / float(n_nodes)

    # out-weight per src, attached to every edge (one exchange on src)
    outw = (edges.groupby(src_col)
            .aggregate(Sum(weight_col, alias_name="outw")))

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[src_col, dst_col, weight_col]].copy(deep=False)
        out["outw"] = np.int64(-1)
        return out

    def tag_outw(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({src_col: df[src_col], dst_col: "",
                             weight_col: np.int64(-1),
                             "outw": df["outw"].astype(np.int64)})

    def attach_outw(df: pd.DataFrame) -> pd.DataFrame:
        side_o = df[df["outw"] >= 0]
        side_e = df[df["outw"] < 0]
        omap = pd.Series(side_o["outw"].to_numpy(),
                         index=side_o[src_col])
        out = side_e[[src_col, dst_col, weight_col]].copy(deep=False)
        out["outw"] = out[src_col].map(omap).astype(np.int64)
        return out

    edges_o = partitioned_map(
        edges.map_batches(tag_edge, batch_format="pandas").union(
            outw.map_batches(tag_outw, batch_format="pandas")),
        attach_outw, keys=[src_col]).materialize()

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "rank": 1.0 / float(n_nodes)})

    ranks = nodes.map_batches(init_rank, batch_format="pandas") \
        .materialize()

    for _ in range(iterations):
        # join ranks onto edges by src → per-edge contributions
        def tag_e(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy(deep=False)
            out["rank"] = np.float64(-1.0)
            return out

        def tag_r(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({src_col: df["node"], dst_col: "",
                                 weight_col: np.int64(-1),
                                 "outw": np.int64(-1),
                                 "rank": df["rank"].astype(np.float64)})

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            side_r = df[df["rank"] >= 0.0]
            side_e = df[df["rank"] < 0.0]
            rmap = pd.Series(side_r["rank"].to_numpy(),
                             index=side_r[src_col])
            r = side_e[src_col].map(rmap).to_numpy(np.float64)
            w = side_e[weight_col].to_numpy(np.float64)
            ow = side_e["outw"].to_numpy(np.float64)
            return pd.DataFrame({
                "node": side_e[dst_col].to_numpy(),
                "_src": side_e[src_col].to_numpy(),
                "c": (r * w) / ow,
            })

        contribs = partitioned_map(
            edges_o.map_batches(tag_e, batch_format="pandas").union(
                ranks.map_batches(tag_r, batch_format="pandas")),
            contrib, keys=[src_col])

        # zero row per node so rank-less nodes keep the teleport term
        def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"], "_src": "",
                                 "c": 0.0})

        def reduce_rank(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["node", "_src"], kind="mergesort")
            s = df.groupby("node", sort=False)["c"].sum()
            return pd.DataFrame({"node": s.index.to_numpy(),
                                 "rank": teleport + damping
                                 * s.to_numpy(np.float64)})

        ranks = partitioned_map(
            contribs.union(nodes.map_batches(zero_rows,
                                             batch_format="pandas")),
            reduce_rank, keys=["node"]).materialize()

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        from sits_classification_ray.functions.transforms import sql_round
        out = df.copy(deep=False)
        out["rank"] = sql_round(out["rank"].to_numpy(np.float64),
                                round_to)
        return out

    return ranks.map_batches(fin, batch_format="pandas")


def triangle_count(edges: rd.Dataset, src_col: str = "w1",
                   dst_col: str = "w2") -> rd.Dataset:
    """Distributed triangle counting over an undirected graph given as
    a (possibly directed, possibly duplicated) edge table.

    Classic oriented enumeration: edges normalize to a < b
    (lexicographic orientation — the SQL-parity choice; production
    graphs orient at the lower-DEGREE endpoint to bound the wedge
    blow-up on hubs), wedges (a,b)-(a,c) with b < c are generated per
    pivot vertex inside one salted exchange, and each wedge is closed
    by an inner hash join against the edge set on the (b,c) key. Two
    exchanges + one join; nothing is ever collected to the driver.

    Returns a single-row Dataset ``(n_triangles)``."""
    import pyarrow as pa

    from sits_classification_ray.stages.joins import hash_join

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        a = np.minimum(df[src_col], df[dst_col])
        b = np.maximum(df[src_col], df[dst_col])
        out = pd.DataFrame({"a": a, "b": b})
        return out[out["a"] != out["b"]].drop_duplicates()

    e = partitioned_map(edges.map_batches(norm, batch_format="pandas"),
                        lambda df: df.drop_duplicates(["a", "b"]),
                        keys=["a", "b"])

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("a", sort=False):
            nb = np.sort(g["b"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"wb": nb[i], "wc": nb[j]}))
        if not outs:
            return pd.DataFrame({"wb": pd.Series([], dtype=object),
                                 "wc": pd.Series([], dtype=object)})
        return pd.concat(outs, ignore_index=True)

    w = partitioned_map(e, wedges, keys=["a"])

    def wkey(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bc": df["wb"].astype(str) + "\x1f" + df["wc"].astype(str)})

    def ekey(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bc": df["a"].astype(str) + "\x1f" + df["b"].astype(str)})

    closed = hash_join(w.map_batches(wkey, batch_format="pandas"),
                       e.map_batches(ekey, batch_format="pandas"),
                       on="bc")
    n = closed.count()
    return rd.from_arrow(pa.table({"n_triangles": pa.array([n],
                                                           pa.int64())}))
