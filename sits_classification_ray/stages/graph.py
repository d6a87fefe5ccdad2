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
import pyarrow as pa
import ray.data as rd

from sits_classification_ray.stages.shuffle import partitioned_map


def pagerank(edges: rd.Dataset, src_col: str = "w1",
             dst_col: str = "w2", weight_col: str = "n",
             damping: float = 0.85, iterations: int = 10,
             round_to: int = 6,
             personalization: frozenset | None = None) -> rd.Dataset:
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

    from sits_classification_ray.stages.shuffle import compact_state

    edges = edges.materialize()
    n_edges = edges.count()
    edges = compact_state(edges, n_edges)
    nodes = (edges.map_batches(srcs, batch_format="pandas")
             .union(edges.map_batches(dsts, batch_format="pandas"))
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    n_nodes = nodes.count()
    nodes = compact_state(nodes, n_nodes)
    # every exchange below moves ≤ edges+nodes rows; sizing P from the
    # measured counts keeps test-scale graphs at P=1 while a web-scale
    # edge table still gets rows/hot_key partitions
    xrows = n_edges + n_nodes
    # personalization: restart mass goes only to the seed set (the
    #   topic-sensitive / personalized-PageRank variant, Haveliwala
    #   2002); the seed set is tiny and ships inside the kernel
    #   closures (broadcast once per task set, never per row)
    seeds = frozenset(personalization) if personalization else None
    teleport = (1.0 - damping) / float(len(seeds) if seeds else n_nodes)

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
        attach_outw, keys=[src_col], approx_rows=xrows,
        hot_key_threshold=100_000).materialize()

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        if seeds is None:
            return pd.DataFrame({"node": df["node"],
                                 "rank": 1.0 / float(n_nodes)})
        # personalized: start AT the restart distribution
        inS = df["node"].isin(seeds).to_numpy()
        return pd.DataFrame({
            "node": df["node"],
            "rank": np.where(inS, 1.0 / float(len(seeds)), 0.0)})

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
            contrib, keys=[src_col], approx_rows=xrows,
            hot_key_threshold=100_000)

        # zero row per node so rank-less nodes keep the teleport term
        def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"], "_src": "",
                                 "c": 0.0})

        def reduce_rank(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["node", "_src"], kind="mergesort")
            s = df.groupby("node", sort=False)["c"].sum()
            if seeds is None:
                tel = teleport
            else:
                tel = np.where(s.index.isin(seeds), teleport, 0.0)
            return pd.DataFrame({"node": s.index.to_numpy(),
                                 "rank": tel + damping
                                 * s.to_numpy(np.float64)})

        ranks = partitioned_map(
            contribs.union(nodes.map_batches(zero_rows,
                                             batch_format="pandas")),
            reduce_rank, keys=["node"], approx_rows=xrows,
            hot_key_threshold=100_000).materialize()

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        from sits_classification_ray.functions.transforms import sql_round
        out = df.copy(deep=False)
        out["rank"] = sql_round(out["rank"].to_numpy(np.float64),
                                round_to)
        return out

    return ranks.map_batches(fin, batch_format="pandas")


def betweenness(edges: rd.Dataset, src_col: str = "w1",
                dst_col: str = "w2", max_sources: int = 64,
                round_to: int = 6) -> rd.Dataset:
    """Betweenness centrality by Brandes' algorithm (2001): one
    single-source BFS + dependency accumulation per source, sources
    fanned out as a Ray map (edge list broadcast ONCE via ``ray.put``
    — the small-side pattern; betweenness needs the whole adjacency
    per source, which is exactly when broadcast beats shuffling).
    Exact when the graph has ≤ ``max_sources`` nodes; otherwise the
    standard k-source approximation from the top-out-degree sources
    (deterministic pick: degree DESC, node ASC). Per-(node, source)
    dependency rows reduce in one exchange keyed on node with the
    sorted-sum contract (sum over sources in source order)."""
    import ray

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    ep = edges.select_columns([src_col, dst_col]).to_pandas() \
        .drop_duplicates()
    # canonical adjacency: sorted neighbor lists (BFS order and the
    # dependency accumulation order are part of the determinism
    # contract with the golden twin)
    adj: dict[str, list[str]] = {}
    nodes = sorted(set(ep[src_col]) | set(ep[dst_col]))
    for s, t in ep.sort_values([src_col, dst_col],
                               kind="mergesort").itertuples(index=False):
        adj.setdefault(s, []).append(t)
    deg = {n: len(adj.get(n, ())) for n in nodes}
    sources = sorted(nodes, key=lambda n: (-deg[n], n))[:max_sources]
    adj_ref = ray.put(adj)

    def brandes(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import deque

        a = ray.get(adj_ref)
        out_node, out_src, out_dep = [], [], []
        for s in batch["source"]:
            sigma = {s: 1.0}
            dist = {s: 0}
            preds: dict[str, list[str]] = {}
            order = []
            q = deque([s])
            while q:
                v = q.popleft()
                order.append(v)
                for w in a.get(v, ()):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        sigma[w] = 0.0
                        q.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
                        preds.setdefault(w, []).append(v)
            delta = {v: 0.0 for v in order}
            for w in reversed(order):
                for v in preds.get(w, ()):
                    delta[v] += (sigma[v] / sigma[w]) * (1.0 + delta[w])
                if w != s and delta[w] != 0.0:
                    out_node.append(w)
                    out_src.append(s)
                    out_dep.append(delta[w])
        return pd.DataFrame({"node": pd.Series(out_node, dtype=object),
                             "source": pd.Series(out_src, dtype=object),
                             "dep": np.asarray(out_dep, np.float64)})

    deps = rd.from_items([{"source": s} for s in sources],
                         override_num_blocks=len(sources)) \
        .map_batches(brandes, batch_format="pandas", batch_size=None)

    out_schema = pa.schema([("node", pa.string()),
                            ("betweenness", pa.float64())])

    def reduce_node(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["node", "source"], kind="mergesort")
        s = df.groupby("node", sort=False)["dep"].sum()
        return pd.DataFrame({
            "node": s.index.to_numpy(),
            "betweenness": sql_round(s.to_numpy(np.float64),
                                     round_to) + 0.0})

    # union an empty schema-seed table: when NO node has positive
    # betweenness (complete graphs — every path is direct) the result
    # has zero blocks and would otherwise lose its schema entirely
    return partitioned_map(deps, reduce_node, keys=["node"],
                           out_schema=out_schema).union(
        rd.from_arrow(out_schema.empty_table()))


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


def hits(edges: rd.Dataset, src_col: str = "w1", dst_col: str = "w2",
         weight_col: str = "n", iterations: int = 8,
         round_to: int = 6) -> rd.Dataset:
    """HITS hubs-and-authorities over a weighted directed edge table.

    Variant (documented, mirrored bit-exactly by the golden oracle):
    scores are normalized by the MAX per iteration instead of the L2
    norm — max is an order-free distributed reduction, so the whole
    iteration keeps the sorted-sum determinism contract (an L2 norm
    would need a global float sum whose value depends on block
    arrival order). Max-normalized power iteration converges to the
    same principal-eigenvector direction, just scaled so the top
    hub/authority is exactly 1.0.

    Per iteration: authority(v) = Σ_{u→v} w·hub(u) then
    hub(u) = Σ_{u→v} w·authority(v) — two tag-union salted exchanges;
    the edge table never moves after its initial partition. All
    per-node sums run over rows pre-sorted by (node, neighbor).
    Returns ``(node, hub, authority)`` for every node in the graph.
    """
    from ray.data.aggregate import Count

    def srcs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[src_col]})

    def dsts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[dst_col]})

    from sits_classification_ray.stages.shuffle import compact_state

    edges = edges.materialize()
    n_edges = edges.count()
    edges = compact_state(edges, n_edges)
    nodes = (edges.map_batches(srcs, batch_format="pandas")
             .union(edges.map_batches(dsts, batch_format="pandas"))
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())
    nodes = compact_state(nodes, nodes.count())
    xrows = n_edges + nodes.count()

    def init_score(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"],
                             "score": np.float64(1.0)})

    hubs = nodes.map_batches(init_score, batch_format="pandas") \
        .materialize()

    def _push(scores: rd.Dataset, key_col: str, out_col: str
              ) -> rd.Dataset:
        """One HITS half-step: join `scores` onto the edges by
        `key_col` (src for authority, dst for hub), emit weighted
        contributions to the opposite endpoint, reduce per node with
        the sorted-sum contract, then max-normalize."""
        other = dst_col if key_col == src_col else src_col

        def tag_e(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[src_col, dst_col, weight_col]].copy(deep=False)
            out["score"] = np.float64(-1.0)
            return out

        def tag_s(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                src_col: df["node"] if key_col == src_col else "",
                dst_col: df["node"] if key_col == dst_col else "",
                weight_col: np.int64(-1),
                "score": df["score"].astype(np.float64)})

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            side_s = df[df["score"] >= 0.0]
            side_e = df[df["score"] < 0.0]
            smap = pd.Series(side_s["score"].to_numpy(),
                             index=side_s[key_col])
            sc = side_e[key_col].map(smap).to_numpy(np.float64)
            w = side_e[weight_col].to_numpy(np.float64)
            return pd.DataFrame({
                "node": side_e[other].to_numpy(),
                "_nb": side_e[key_col].to_numpy(),
                "c": sc * w,
            })

        contribs = partitioned_map(
            edges.map_batches(tag_e, batch_format="pandas").union(
                scores.map_batches(tag_s, batch_format="pandas")),
            contrib, keys=[key_col], approx_rows=xrows,
            hot_key_threshold=100_000)

        def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"], "_nb": "",
                                 "c": 0.0})

        def reduce_score(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["node", "_nb"], kind="mergesort")
            s = df.groupby("node", sort=False)["c"].sum()
            return pd.DataFrame({"node": s.index.to_numpy(),
                                 "score": s.to_numpy(np.float64)})

        raw = partitioned_map(
            contribs.union(nodes.map_batches(zero_rows,
                                             batch_format="pandas")),
            reduce_score, keys=["node"], approx_rows=xrows,
            hot_key_threshold=100_000).materialize()
        m = raw.max("score")
        if not m or m <= 0.0:
            return raw

        def norm(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy(deep=False)
            out["score"] = out["score"].to_numpy(np.float64) / m
            return out

        # no materialize: `raw` is already materialized, so the
        # norm map re-runs only the cheap division when consumed
        return raw.map_batches(norm, batch_format="pandas")

    auths = None
    for _ in range(iterations):
        auths = _push(hubs, src_col, "authority")
        hubs = _push(auths, dst_col, "hub")

    def tag_h(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "_w": np.int64(0),
                             "score": df["score"].astype(np.float64)})

    def tag_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "_w": np.int64(1),
                             "score": df["score"].astype(np.float64)})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        from sits_classification_ray.functions.transforms import \
            sql_round
        h = df[df["_w"] == 0].set_index("node")["score"]
        a = df[df["_w"] == 1].set_index("node")["score"]
        nodes_ = np.sort(np.unique(df["node"].to_numpy()))
        return pd.DataFrame({
            "node": nodes_,
            "hub": sql_round(
                pd.Series(nodes_).map(h).fillna(0.0)
                .to_numpy(np.float64), round_to),
            "authority": sql_round(
                pd.Series(nodes_).map(a).fillna(0.0)
                .to_numpy(np.float64), round_to)})

    return partitioned_map(
        hubs.map_batches(tag_h, batch_format="pandas").union(
            auths.map_batches(tag_a, batch_format="pandas")),
        merge, keys=["node"], approx_rows=xrows,
        hot_key_threshold=100_000)


def components(edges: rd.Dataset, src_col: str = "w1",
               dst_col: str = "w2", max_iters: int = 50) -> rd.Dataset:
    """Weakly-connected components over a string-keyed edge table:
    every node is labeled with the lexicographically SMALLEST node
    reachable through the (symmetrized) graph.

    Same distributed min-label propagation as
    :func:`~sits_classification_ray.stages.dedup_docs.connected_components`
    but over string vertex ids (Ray's native ``Min`` aggregation is
    type-generic), so domain graphs join without an id-assignment
    pass. Per round: one salted exchange + one native Min aggregation;
    rounds = O(component diameter). Raises after ``max_iters``
    non-converged rounds rather than returning partial labels.
    Returns ``(node, component)``.
    """
    import pyarrow as pa
    from ray.data.aggregate import Count, Min

    from sits_classification_ray.stages.shuffle import partitioned_map

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].astype(str).to_numpy()
        b = df[dst_col].astype(str).to_numpy()
        out = pd.DataFrame({"src": np.concatenate([a, b]),
                            "dst": np.concatenate([b, a])})
        return out.drop_duplicates()

    from sits_classification_ray.stages.shuffle import compact_state

    edges_s = edges.map_batches(sym, batch_format="pandas") \
        .materialize()
    n_edges = edges_s.count()
    edges_s = compact_state(edges_s, n_edges)
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "component": pa.array([], pa.string())}))

    def init_lbl(df: pd.DataFrame) -> pd.DataFrame:
        v = df["src"].to_numpy()
        nb = df["lbl"].to_numpy()
        return pd.DataFrame({"v": v, "lbl": np.minimum(v, nb)})

    labels = (edges_s.groupby("src")
              .aggregate(Min("dst", alias_name="lbl"))
              .map_batches(init_lbl, batch_format="pandas")
              .materialize())
    n_nodes = labels.count()
    labels = compact_state(labels, n_nodes)
    xrows = n_edges + n_nodes

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__k": df["v"], "__o": "",
                             "lbl": df["lbl"]})

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__k": df["src"], "__o": df["dst"],
                             "lbl": ""})

    edges_tagged = edges_s.map_batches(
        tag_edges, batch_format="pandas").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["__o"] == ""]
        edg = df[df["__o"] != ""]
        m = edg[["__k", "__o"]].merge(
            lab[["__k", "lbl"]], on="__k", how="inner")
        return pd.concat([
            pd.DataFrame({"v": m["__o"].to_numpy(), "lbl": m["lbl"]}),
            pd.DataFrame({"v": lab["__k"].to_numpy(),
                          "lbl": lab["lbl"]}),
        ], ignore_index=True)

    # convergence check: labels only ever shrink lexicographically, so
    # the count of (v, lbl) pairs that changed is computed by an
    # anti-equality probe per round; strings have no cheap monotone
    # sum, so track a stable fingerprint instead
    def fingerprint(lbls: rd.Dataset) -> int:
        def h(df: pd.DataFrame) -> pd.DataFrame:
            hv = pd.util.hash_pandas_object(
                df["v"].astype(str) + "\x1f" + df["lbl"].astype(str),
                index=False).to_numpy(np.uint64)
            # 31-bit folds keep the int64 total exact up to 2^32 nodes
            return pd.DataFrame(
                {"x": (hv % np.uint64(2**31)).astype(np.int64)})
        return int(lbls.map_batches(h, batch_format="pandas").sum("x"))

    prev_fp = fingerprint(labels)
    for _ in range(max_iters):
        unioned = labels.map_batches(
            tag_labels, batch_format="pandas").union(edges_tagged)
        msgs = partitioned_map(unioned, propagate, keys=["__k"],
                               approx_rows=xrows,
                               hot_key_threshold=100_000)
        labels = compact_state(
            msgs.groupby("v").aggregate(
                Min("lbl", alias_name="lbl")).materialize(), n_nodes)
        fp = fingerprint(labels)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"components() did not converge in {max_iters} rounds — "
            f"component diameter exceeds max_iters; raise it.")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["v"], "component": df["lbl"]})

    return labels.map_batches(fin, batch_format="pandas")


def bfs_depth(edges: rd.Dataset, seed_prefix: str,
              src_col: str = "w1", dst_col: str = "w2",
              max_iters: int = 20) -> rd.Dataset:
    """Multi-source BFS over the directed edge table: every reachable
    node labeled with its shortest hop distance from the seed set
    (nodes whose id starts with ``seed_prefix``) — the crawl-depth /
    frontier-distance signal ("how many hops is this domain from the
    seed list?", the classic crawl-scheduling prior).

    Bellman-Ford-style min-distance propagation (the components()
    machinery with integer labels): per round one tag-union salted
    exchange joins the current distance table onto the edges by source
    and emits ``d+1`` to each destination, then a native Min groupby
    re-minimizes. Rounds = O(max reached depth); convergence is exact
    — integer (count, sum) of the distance table is monotone, so a
    fixed point is detected by two driver scalars, not a fingerprint.
    Unreached nodes are not emitted (matching the recursive-CTE SQL
    twin). Raises after ``max_iters`` non-converged rounds.

    Returns ``(node, depth)``.
    """
    from ray.data.aggregate import Min

    from sits_classification_ray.stages.shuffle import (compact_state,
                                                        partitioned_map)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({"src": df[src_col].astype(str),
                              "dst": df[dst_col].astype(str)})
                .drop_duplicates())

    edges_d = edges.map_batches(dedup, batch_format="pandas") \
        .materialize()
    n_edges = edges_d.count()
    empty = pa.table({"node": pa.array([], pa.string()),
                      "depth": pa.array([], pa.int64())})
    if n_edges == 0:
        return rd.from_arrow(empty)
    edges_d = compact_state(edges_d, n_edges)

    def seed_rows(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.unique(np.concatenate([df["src"].to_numpy(),
                                      df["dst"].to_numpy()]))
        v = v[pd.Series(v).str.startswith(seed_prefix).to_numpy()]
        return pd.DataFrame({"v": v,
                             "d": np.zeros(len(v), dtype=np.int64)})

    labels = (edges_d.map_batches(seed_rows, batch_format="pandas")
              .groupby("v").aggregate(Min("d", alias_name="d"))
              .materialize())
    if labels.count() == 0:
        return rd.from_arrow(empty)

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__k": df["v"], "__o": "",
                             "d": df["d"].astype(np.int64)})

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__k": df["src"], "__o": df["dst"],
                             "d": np.int64(-1)})

    edges_tagged = edges_d.map_batches(
        tag_edges, batch_format="pandas").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["__o"] == ""]
        edg = df[df["__o"] != ""]
        m = edg[["__k", "__o"]].merge(
            lab[["__k", "d"]], on="__k", how="inner")
        return pd.concat([
            pd.DataFrame({"v": m["__o"].to_numpy(),
                          "d": m["d"].to_numpy(np.int64) + 1}),
            pd.DataFrame({"v": lab["__k"].to_numpy(),
                          "d": lab["d"].to_numpy(np.int64)}),
        ], ignore_index=True)

    def state_of(lbls: rd.Dataset) -> tuple[int, int]:
        return int(lbls.count()), int(lbls.sum("d"))

    prev = state_of(labels)
    for _ in range(max_iters):
        unioned = labels.map_batches(
            tag_labels, batch_format="pandas").union(edges_tagged)
        msgs = partitioned_map(unioned, propagate, keys=["__k"],
                               approx_rows=n_edges + prev[0],
                               hot_key_threshold=100_000)
        labels = compact_state(
            msgs.groupby("v").aggregate(
                Min("d", alias_name="d")).materialize(), prev[0])
        cur = state_of(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"bfs_depth() did not converge in {max_iters} rounds — "
            f"reached depth exceeds max_iters; raise it.")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["v"],
                             "depth": df["d"].astype(np.int64)})

    return labels.map_batches(fin, batch_format="pandas")


def adamic_adar(edges: rd.Dataset, src_col: str = "w1",
                dst_col: str = "w2", k: int = 100,
                num_partitions: int = 64) -> rd.Dataset:
    """Adamic-Adar link prediction over the (symmetrized, self-loop-
    free) graph: for each non-adjacent pair, ``AA(u,v) = Σ_{w ∈
    N(u)∩N(v)} 1/ln(deg w)`` — "which domains SHOULD be linking?", the
    classic common-neighbours crawl-discovery signal.

    Shape (the triangle_count wedge pattern): pivot neighbourhoods
    co-locate via one src-keyed salted exchange; each pivot emits its
    ``C(deg, 2)`` wedge pairs with the integer micro-weight
    ``round(10⁶/ln(deg))`` (int64 — pair sums are order-free and
    bit-exact vs the SQL twin); one pair-keyed Sum groupby merges
    wedges, existing edges are removed with a tagged Max flag in the
    same exchange, and the top-k prunes per block before the final
    sort (combiner top-k). Pairs are undirected: ``a < b``.

    Returns the k best ``(node_a, node_b, aa_u)`` by
    ``(aa_u DESC, a, b)``.
    """
    from ray.data.aggregate import Max, Sum

    from sits_classification_ray.functions.transforms import sql_round
    from sits_classification_ray.stages.shuffle import partitioned_map

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].astype(str).to_numpy()
        b = df[dst_col].astype(str).to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        return (pd.DataFrame({"src": np.concatenate([a, b]),
                              "dst": np.concatenate([b, a])})
                .drop_duplicates())

    edges_s = edges.map_batches(sym, batch_format="pandas") \
        .groupby(["src", "dst"]).count().drop_columns(["count()"]) \
        .materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("src", sort=False):
            nb = np.unique(g["dst"].to_numpy())
            d = len(nb)
            if d < 2:
                continue
            w_u = np.int64(sql_round(
                np.array([1e6 / np.log(float(d))]), 0)[0])
            iu, ju = np.triu_indices(d, 1)
            outs.append(pd.DataFrame({
                "a": nb[iu], "b": nb[ju],
                "aa_u": np.full(len(iu), w_u, dtype=np.int64),
                "is_edge": np.int64(0)}))
        cols = {"a": pd.Series(dtype=object),
                "b": pd.Series(dtype=object),
                "aa_u": pd.Series(dtype=np.int64),
                "is_edge": pd.Series(dtype=np.int64)}
        if not outs:
            return pd.DataFrame(cols)
        return pd.concat(outs, ignore_index=True)

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("aa_u", pa.int64()),
                             ("is_edge", pa.int64())])
    wedge_rows = partitioned_map(edges_s, wedges, keys=["src"],
                                 num_partitions=num_partitions,
                                 out_schema=pair_schema)

    def edge_tags(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("src").to_pandas(), dtype=object)
        b = np.asarray(t.column("dst").to_pandas(), dtype=object)
        keep = a < b  # symmetrized: each pair appears once per order
        n = int(keep.sum())
        return pa.Table.from_arrays(
            [pa.array(a[keep], pa.string()),
             pa.array(b[keep], pa.string()),
             pa.array(np.zeros(n, dtype=np.int64)),
             pa.array(np.ones(n, dtype=np.int64))],
            schema=pair_schema)

    tagged = edges_s.map_batches(edge_tags, batch_format="pyarrow",
                                 zero_copy_batch=True)

    merged = (wedge_rows.union(tagged)
              .groupby(["a", "b"])
              .aggregate(Sum("aa_u", alias_name="aa_u"),
                         Max("is_edge", alias_name="is_edge")))

    out_schema = pa.schema([("node_a", pa.string()),
                            ("node_b", pa.string()),
                            ("aa_u", pa.int64())])

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[(df["is_edge"] == 0) & (df["aa_u"] > 0)]
        df = df.sort_values(["aa_u", "a", "b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k)
        return pa.Table.from_arrays(
            [pa.array(df["a"].to_numpy(dtype=object), pa.string()),
             pa.array(df["b"].to_numpy(dtype=object), pa.string()),
             pa.array(df["aa_u"].to_numpy(np.int64))],
            schema=out_schema)

    out = merged.map_batches(prune, batch_format="pyarrow",
                             zero_copy_batch=True)
    rows = out.sort(["aa_u", "node_a", "node_b"],
                    descending=[True, False, False]).limit(k) \
        .take_all()  # tiny: <= k rows after the per-block prune
    # rebuild the result on the driver with the schema pinned: the
    # distributed sort+limit can emit schema-degraded empty blocks (a
    # complete graph has zero non-adjacent pairs), which intermittently
    # failed the driver's schema check in r4 even with an empty-table
    # union pin — a from_pylist table has exactly one well-schemed block
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=out_schema))


def coreness(edges: rd.Dataset, src_col: str = "w1",
             dst_col: str = "w2", max_iters: int = 100) -> rd.Dataset:
    """k-core decomposition of the (symmetrized, self-loop-free)
    graph: every node labeled with its core number — the densest k
    such that the node survives iterated deletion of all degree-<k
    nodes. The crawl-frontier "link-farm vs organic neighborhood"
    density signal.

    Distributed via the h-index fixpoint (Lü et al. 2016, "The
    H-index of a network node and its relation to degree and
    coreness"): c(v) starts at degree(v) and each round contracts to
    ``min(c(v), H({c(u) : u ∼ v}))``; the unique fixpoint IS the core
    number. Two salted exchanges per round — one src-keyed tag-union
    join attaches c to each edge, one dst-keyed reduce computes the
    per-node H-index with a rank-prefix trick (no per-row Python).
    Estimates are integers and monotone non-increasing, so the exact
    fixpoint is detected from two driver scalars (count, sum) like
    ``bfs_depth``. Returns ``(node, core)``.
    """
    from ray.data.aggregate import Min

    from sits_classification_ray.stages.shuffle import compact_state

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].astype(str).to_numpy()
        b = df[dst_col].astype(str).to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        return (pd.DataFrame({"src": np.concatenate([a, b]),
                              "dst": np.concatenate([b, a])})
                .drop_duplicates())

    edges_s = edges.map_batches(sym, batch_format="pandas") \
        .groupby(["src", "dst"]).count().drop_columns(["count()"]) \
        .materialize()
    n_edges = edges_s.count()
    empty = pa.table({"node": pa.array([], pa.string()),
                      "core": pa.array([], pa.int64())})
    if n_edges == 0:
        return rd.from_arrow(empty)
    edges_s = compact_state(edges_s, n_edges)

    # c(v) init = degree(v) (symmetrized → one row per neighbor)
    labels = edges_s.groupby("src").count().materialize()

    def as_label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": df["src"].astype(str),
                             "c": df["count()"].astype(np.int64)})

    labels = labels.map_batches(as_label, batch_format="pandas") \
        .materialize()
    n_nodes = labels.count()

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__k": df["v"], "__o": "",
                             "c": df["c"].astype(np.int64)})

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__k": df["src"], "__o": df["dst"],
                             "c": np.int64(-1)})

    edges_tagged = edges_s.map_batches(
        tag_edges, batch_format="pandas").materialize()

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["__o"] == ""]
        edg = df[df["__o"] != ""]
        m = edg[["__k", "__o"]].merge(
            lab[["__k", "c"]], on="__k", how="inner")
        return pd.DataFrame({"v": m["__o"].to_numpy(),
                             "val": m["c"].to_numpy(np.int64),
                             "own": np.int64(0)})

    def own_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": df["v"],
                             "val": df["c"].astype(np.int64),
                             "own": np.int64(1)})

    msg_schema = pa.schema([("v", pa.string()), ("val", pa.int64()),
                            ("own", pa.int64())])
    out_schema = pa.schema([("v", pa.string()), ("c", pa.int64())])

    def hstep(df: pd.DataFrame) -> pd.DataFrame:
        own = df[df["own"] == 1]
        msg = df[df["own"] == 0]
        if len(msg):
            m = msg.sort_values(["v", "val"], ascending=[True, False],
                                kind="mergesort")
            v = m["v"].to_numpy()
            val = m["val"].to_numpy(np.int64)
            # rank within each v-run; h = #{i : val[i] >= rank i}
            new_run = np.r_[True, v[1:] != v[:-1]]
            starts = np.flatnonzero(new_run)
            lens = np.diff(np.r_[starts, len(v)])
            rank = np.arange(len(v)) - np.repeat(starts, lens) + 1
            ok = (val >= rank).astype(np.int64)
            h = (pd.DataFrame({"v": v, "ok": ok})
                 .groupby("v", sort=False)["ok"].sum().reset_index()
                 .rename(columns={"ok": "h"}))
        else:
            h = pd.DataFrame({"v": pd.Series(dtype=object),
                              "h": pd.Series(dtype=np.int64)})
        out = own[["v", "val"]].merge(h, on="v", how="left")
        out["h"] = out["h"].fillna(0).astype(np.int64)
        return pd.DataFrame({
            "v": out["v"],
            "c": np.minimum(out["val"].to_numpy(np.int64),
                            out["h"].to_numpy(np.int64))})

    prev = (int(n_nodes), int(labels.sum("c")))
    for _ in range(max_iters):
        unioned = labels.map_batches(
            tag_labels, batch_format="pandas").union(edges_tagged)
        msgs = partitioned_map(unioned, attach, keys=["__k"],
                               approx_rows=n_edges + prev[0],
                               hot_key_threshold=100_000,
                               out_schema=msg_schema)
        own = labels.map_batches(own_rows, batch_format="pandas")
        labels = compact_state(
            partitioned_map(msgs.union(own), hstep, keys=["v"],
                            approx_rows=n_edges + prev[0],
                            hot_key_threshold=100_000,
                            out_schema=out_schema).materialize(),
            prev[0])
        cur = (int(labels.count()), int(labels.sum("c")))
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"coreness() did not converge in {max_iters} rounds")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["v"],
                             "core": df["c"].astype(np.int64)})

    return labels.map_batches(fin, batch_format="pandas")


def label_propagation(edges: rd.Dataset, src_col: str = "w1",
                      dst_col: str = "w2", weight_col: str = "n",
                      iterations: int = 4) -> rd.Dataset:
    """Synchronous weighted label-propagation community detection
    (Raghavan et al. 2007, synchronous variant): every node starts as
    its own community, then for ``iterations`` rounds simultaneously
    adopts the label with the greatest total incident edge weight
    among its neighbors (ties → lexicographically smallest label).

    The edge table is made undirected first (both orientations,
    weights summed per unordered pair — exact integers). Per round:
    one tag-union exchange joins the label table onto edges by source,
    votes flow to the target, a (node, label) groupby-sum merges them,
    and a per-node kernel picks the argmax; isolated nodes keep their
    label. Synchronous updates on bipartite-ish graphs can oscillate —
    the fixed iteration count makes the result well-defined, and the
    independent oracle replicates it exactly (integer votes, total
    tie-order — no float hazard).

    Returns ``(node, community)``.
    """
    from ray.data.aggregate import Sum

    def both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": np.concatenate((df[src_col].to_numpy(object),
                                 df[dst_col].to_numpy(object))),
            "b": np.concatenate((df[dst_col].to_numpy(object),
                                 df[src_col].to_numpy(object))),
            "w": np.concatenate((df[weight_col].to_numpy(np.int64),
                                 df[weight_col].to_numpy(np.int64)))})

    und = (edges.map_batches(both, batch_format="pandas")
           .groupby(["a", "b"]).aggregate(Sum("w", alias_name="w"))
           .materialize())

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates("a")
        return pd.DataFrame({"node": g["a"], "label": g["a"]})

    labels = partitioned_map(und, init_labels, keys=["a"]).materialize()

    lbl_schema = pa.schema([("node", pa.string()),
                            ("label", pa.string())])
    for _ in range(iterations):
        def tag_e(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["a"], "b": df["b"],
                                 "w": df["w"].astype(np.int64),
                                 "label": ""})

        def tag_l(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["node"], "b": "",
                                 "w": np.int64(-1),
                                 "label": df["label"]})

        unioned = und.map_batches(tag_e, batch_format="pandas").union(
            labels.map_batches(tag_l, batch_format="pandas"))

        def votes(df: pd.DataFrame) -> pd.DataFrame:
            lab = df[df["w"] < 0].sort_values("key", kind="mergesort")
            e = df[df["w"] >= 0]
            pos = np.searchsorted(lab["key"].to_numpy(object),
                                  e["key"].to_numpy(object))
            return pd.DataFrame({
                "node": e["b"].to_numpy(object),
                "label": lab["label"].to_numpy(object)[pos],
                "w": e["w"].to_numpy(np.int64)})

        voted = (partitioned_map(unioned, votes, keys=["key"])
                 .groupby(["node", "label"])
                 .aggregate(Sum("w", alias_name="w")))

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["node", "w", "label"],
                                ascending=[True, False, True],
                                kind="mergesort")
            g = df.drop_duplicates("node")
            return pd.DataFrame({"node": g["node"].to_numpy(object),
                                 "label": g["label"].to_numpy(object)})

        labels = partitioned_map(voted, pick, keys=["node"],
                                 out_schema=lbl_schema).materialize()

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"label": "community"})

    return labels.map_batches(fin, batch_format="pandas")


def deepwalk_visits(edges: rd.Dataset, src_col: str = "w1",
                    dst_col: str = "w2", walks_per_node: int = 4,
                    walk_len: int = 8) -> rd.Dataset:
    """DeepWalk-style graph sampling (Perozzi et al., KDD 2014) with
    DERANDOMIZED walks: the step-j neighbor of walk w from node v is
    ``splitmix64(siphash(start|w)·PHI + j) mod out_degree(v)`` over
    the SORTED neighbor list — a pure function of the graph, so the
    visit profile is golden-checkable. Walks fan out per start node
    as Ray tasks with the adjacency broadcast once (the same
    small-side shape as betweenness); output is the corpus-wide
    (node, visits) profile — the node-frequency table skip-gram
    training would consume. Walks stop early at dangling nodes."""
    import ray

    from sits_classification_ray.stages.shuffle import partitioned_map

    ep = edges.select_columns([src_col, dst_col]).to_pandas() \
        .drop_duplicates().sort_values([src_col, dst_col],
                                       kind="mergesort")
    adj: dict = {}
    for a, b in ep.itertuples(index=False):
        adj.setdefault(a, []).append(b)
    nodes = sorted(set(ep[src_col]) | set(ep[dst_col]))
    adj_ref = ray.put(adj)

    def walk_task(batch: pd.DataFrame) -> pd.DataFrame:
        from sits_classification_ray.stages.als import _splitmix64

        a = ray.get(adj_ref)
        visits: dict = {}
        for start in batch["start"]:
            for w in range(walks_per_node):
                seed = pd.util.hash_array(
                    np.asarray([f"{start}|{w}"], dtype=object))[0]
                v = start
                visits[v] = visits.get(v, 0) + 1
                for j in range(walk_len - 1):
                    nbrs = a.get(v)
                    if not nbrs:
                        break
                    h = _splitmix64(np.asarray(
                        [seed * np.uint64(0x9E3779B97F4A7C15)
                         + np.uint64(j)], dtype=np.uint64))[0]
                    v = nbrs[int(h % np.uint64(len(nbrs)))]
                    visits[v] = visits.get(v, 0) + 1
        ks = sorted(visits)
        return pd.DataFrame({
            "node": pd.Series(ks, dtype=object),
            "visits": np.asarray([visits[k] for k in ks], np.int64)})

    parts = rd.from_items([{"start": n} for n in nodes],
                          override_num_blocks=max(1, len(nodes))) \
        .map_batches(walk_task, batch_format="pandas", batch_size=None)

    out_schema = pa.schema([("node", pa.string()),
                            ("visits", pa.int64())])

    def reduce_node(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("node", sort=True)["visits"].sum()
        return pd.DataFrame({"node": s.index.to_numpy(),
                             "visits": s.to_numpy(np.int64)})

    return partitioned_map(parts, reduce_node, keys=["node"],
                           out_schema=out_schema)


def wl_refinement(edges: rd.Dataset, src_col: str = "w1",
                  dst_col: str = "w2", iterations: int = 3
                  ) -> rd.Dataset:
    """Weisfeiler-Lehman color refinement (the 1-WL graph-isomorphism
    test / graph-kernel primitive): every node's color is iteratively
    rehashed from (own color, sorted multiset of OUT-neighbor colors)
    — structural-role fingerprints degree and PageRank cannot
    separate. Same exchange shape as pagerank: per iteration ONE
    tag-union attach of the node-color vector onto the edge table by
    dst (colors are O(nodes)) then a keyed reduce per src; signature
    hashing is splitmix64 over the pandas SipHash of the sorted
    signature string — a pure function of the graph, so the golden
    twin reproduces it bit-for-bit."""
    from ray.data.aggregate import Count

    from sits_classification_ray.stages.als import _splitmix64

    def srcs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[src_col]})

    def dsts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[dst_col]})

    ep = edges.select_columns([src_col, dst_col])
    nodes = (ep.map_batches(srcs, batch_format="pandas")
             .union(ep.map_batches(dsts, batch_format="pandas"))
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]).materialize())

    colors = nodes.map_batches(
        lambda df: pd.DataFrame({"node": df["node"],
                                 "color": np.int64(0)}),
        batch_format="pandas").materialize()

    col_schema = pa.schema([("node", pa.string()),
                            ("color", pa.int64())])
    e1_schema = pa.schema([("node", pa.string()),
                           ("nbr_color", pa.int64())])

    for _ in range(iterations):
        # step 1: edge rows keyed by DST pick up the dst's color
        def wl_tag_edge_dst(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df[dst_col],
                                 "node": df[src_col],
                                 "color": np.int64(-1)})

        def wl_tag_color_key(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": df["node"], "node": "",
                                 "color": df["color"]
                                 .astype(np.int64)})

        def wl_attach_dst(df: pd.DataFrame) -> pd.DataFrame:
            side_c = df[df["color"] >= 0]
            side_e = df[df["color"] < 0]
            cmap = pd.Series(side_c["color"].to_numpy(),
                             index=side_c["key"])
            return pd.DataFrame({
                "node": side_e["node"].to_numpy(),
                "nbr_color": side_e["key"].map(cmap)
                .fillna(0).to_numpy(np.int64)})

        nbrcols = partitioned_map(
            ep.map_batches(wl_tag_edge_dst,
                           batch_format="pandas").union(
                colors.map_batches(wl_tag_color_key,
                                   batch_format="pandas")),
            wl_attach_dst, keys=["key"], out_schema=e1_schema)

        # step 2: per src node — rehash (own color, sorted nbr colors)
        def wl_tag_nc(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"],
                                 "nbr_color": df["nbr_color"]
                                 .astype(np.int64),
                                 "own": np.int64(-1)})

        def wl_tag_own(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"],
                                 "nbr_color": np.int64(-1),
                                 "own": df["color"].astype(np.int64)})

        def wl_rehash(df: pd.DataFrame) -> pd.DataFrame:
            side_o = df[df["own"] >= 0]
            side_n = df[df["own"] < 0]
            nmap: dict = {}
            for node, nc in zip(side_n["node"], side_n["nbr_color"]):
                nmap.setdefault(node, []).append(int(nc))
            rows = []
            for node, own in zip(side_o["node"], side_o["own"]):
                sig = str(int(own)) + "|" + ",".join(
                    str(c) for c in sorted(nmap.get(node, [])))
                h = int(_splitmix64(pd.util.hash_array(
                    np.asarray([sig], dtype=object)))[0])
                rows.append((node, h & ((1 << 62) - 1)))
            out = pd.DataFrame(rows, columns=["node", "color"])
            out["color"] = out["color"].astype(np.int64)
            return out

        colors = partitioned_map(
            nbrcols.map_batches(wl_tag_nc,
                                batch_format="pandas").union(
                colors.map_batches(wl_tag_own,
                                   batch_format="pandas")),
            wl_rehash, keys=["node"],
            out_schema=col_schema).materialize()

    return colors.map_batches(
        lambda df: df[["node", "color"]], batch_format="pandas")
