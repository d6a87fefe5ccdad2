"""Relational operator coverage: filter + multi-aggregate, broadcast
joins, grouped counts — the J*/A*/O*-class operators of SURVEY §2
exercised over the driver-provided TPC-H-ish tables.

Money sums are carried as scaled int64 cents so distributed summation
is exact and order-free (same trick as the integer metric streams in
the rollup tiers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """Pricing summary: filter by ship date, group, multi-aggregate, sort.

    The reference's grouped-metric shape (class histogram + per-class
    stats, ``pytorch/utils/Dataset.py:46``, ``trainer.py:95-123``) over
    lineitem. Predicate pushed into the parquet read.
    """
    cutoff = pd.Timestamp("1998-09-02")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pc.scalar(cutoff)),
    )

    def prep(batch: pa.Table) -> pa.Table:
        # belt-and-braces row filter (the read filter prunes row groups)
        batch = batch.filter(pc.less_equal(batch["l_shipdate"],
                                           pa.scalar(cutoff, pa.timestamp("us"))))
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0)),
                        pa.int64())
        qty = pc.cast(batch["l_quantity"], pa.int64())
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": qty,
            "price_cents": cents,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = prepped.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("price_cents", alias_name="sum_base_price_cents"),
        Min("qty", alias_name="min_qty"),
        Max("qty", alias_name="max_qty"),
        Count(alias_name="count_order"),
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def orders_per_nation(sf_dir: str) -> rd.Dataset:
    """Orders joined to customer → nation via broadcast lookup.

    customer/nation are the small sides: shipped once with ``ray.put``,
    mapped per batch with vectorized take — no shuffle join (reference
    meta.csv hash-index lookup, ``pytorch/predict.py:621,641-645``).
    """
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    ckeys = cust["c_custkey"].to_numpy()
    order = np.argsort(ckeys)
    cust_sorted = (ckeys[order], cust["c_nationkey"].to_numpy()[order])
    nnames = nation["n_name"].to_pylist()
    nkeys = nation["n_nationkey"].to_numpy()
    name_of = np.empty(int(nkeys.max()) + 1, dtype=object)
    name_of[nkeys] = nnames
    side_ref = ray.put((cust_sorted, name_of))

    class Attach:
        def __init__(self):
            (self.ck, self.cn), self.name_of = ray.get(side_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["o_custkey"].to_numpy()
            pos = np.searchsorted(self.ck, keys)
            nk = self.cn[pos]
            cents = pc.cast(pc.round(pc.multiply(batch["o_totalprice"], 100.0)),
                            pa.int64())
            return pa.table({
                "nation": pa.array(self.name_of[nk], pa.string()),
                "total_cents": cents,
            })

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    joined = ds.map_batches(Attach, batch_format="pyarrow",
                            concurrency=(1, 4), num_cpus=1)
    out = joined.groupby("nation").aggregate(
        Count(alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"),
    )
    return out.sort("nation")


def events_long(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """events table → the engine's long observation format.

    Demonstrates that the rollup tiers are generic over any
    (entity, ts, value) stream, not just the crawl table.
    """
    from sits_classification_ray.stages.extract import url_bucket_of

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def adapt(batch: pa.Table) -> pa.Table:
        entity = pc.cast(batch["user_id"], pa.string())
        return pa.table({
            "url": entity,
            "url_bucket": url_bucket_of(entity, n_buckets),
            "warc_ts": batch["ts"],
            "metric": pa.array(["value"] * len(batch), pa.string()),
            "value": pc.cast(batch["value"], pa.float64()),
        })

    return ds.map_batches(adapt, batch_format="pyarrow", zero_copy_batch=True)

# ---------------------------------------------------------------------------
# Multi-table analytical queries (TPC-H Q3/Q5/Q6/Q10 shapes)
#
# All money math is exact integer arithmetic: prices are carried as
# int64 cents and discounts as int64 percent, so revenue units
# (cents × pct) sum order-free and bit-identically to the DuckDB
# oracle — no float summation anywhere.
# ---------------------------------------------------------------------------


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _pct(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _global_top_k(ds: rd.Dataset, sort_cols: list[str],
                  descending: list[bool], k: int) -> rd.Dataset:
    """Top-k without a full global sort: each block is pruned to its
    local top-k first, so the final sort sees at most k × n_blocks
    rows (the combiner top-k pattern, same as topk_urls_daily)."""
    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols,
                              ascending=[not d for d in descending]).head(k)

    pruned = ds.map_batches(local, batch_format="pandas")
    return pruned.sort(sort_cols, descending=descending).limit(k)


def q6_revenue_forecast(sf_dir: str) -> pd.DataFrame:
    """Q6 shape: tight filter + single global aggregate, zero shuffle.

    Predicates push into the parquet read (row-group pruning at
    scale); the aggregate is a per-block partial + tiny final merge.
    Reference analog: the global nan_idx/dropped-sample counters
    (`utils/class_run.py:150-156,244`)."""
    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                & (pc.field("l_shipdate") < pc.scalar(hi))),
    )

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(batch["l_shipdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(batch["l_shipdate"], pa.scalar(hi, pa.timestamp("us")))),
            pc.less(batch["l_quantity"], 24.0))
        batch = batch.filter(m)
        pct = _pct(batch["l_discount"])
        keep = pc.and_(pc.greater_equal(pct, 5), pc.less_equal(pct, 7))
        batch = batch.filter(keep)
        pct = _pct(batch["l_discount"])
        return pa.table({
            "rev_u": pc.multiply(_cents(batch["l_extendedprice"]), pct),
        })

    agg = ds.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("rev_u", alias_name="revenue_u"), Count(alias_name="n_items"))
    return pd.DataFrame([{"revenue_u": int(agg["revenue_u"]),
                          "n_items": int(agg["n_items"])}])


def q3_shipping_priority(sf_dir: str) -> rd.Dataset:
    """Q3 shape: broadcast semi-join (small dim key set) → big×big
    hash join → grouped sum → combiner top-k.

    customer is the small side: its qualifying key set ships once via
    ``ray.put`` (J5 pattern); orders×lineitem is the only real
    exchange. Revenue is exact integer units (cents × (100−pct))."""
    import pyarrow.parquet as pq
    from sits_classification_ray.stages.joins import hash_join

    cutoff = pd.Timestamp("1998-06-01")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))
    # broadcast once; tasks ray.get the plasma-local copy per batch.
    # NOTE: task-based (not actor-pool) on purpose — actor-pool stages
    # feeding the join's hash-shuffle aggregator actors can deadlock on
    # CPU reservations at small cluster sizes.
    keys_ref = ray.put(np.sort(keys["c_custkey"].to_numpy()))

    def orders_prep(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        t = t.filter(pc.less(t["o_orderdate"],
                             pa.scalar(cutoff, pa.timestamp("us"))))
        mask = np.isin(t["o_custkey"].to_numpy(), ks)
        return t.filter(pa.array(mask)).drop_columns(["o_custkey"])

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=(pc.field("o_orderdate") < pc.scalar(cutoff)),
    ).map_batches(orders_prep, batch_format="pyarrow", zero_copy_batch=True)

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") > pc.scalar(cutoff)),
    )

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(
            batch["l_shipdate"], pa.scalar(cutoff, pa.timestamp("us"))))
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"])))
        return pa.table({"l_orderkey": batch["l_orderkey"], "rev_u": rev})

    line = line.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    joined = hash_join(line, orders, on="l_orderkey", right_on="o_orderkey")
    out = joined.groupby(["l_orderkey", "o_orderdate",
                          "o_orderpriority"]).aggregate(
        Sum("rev_u", alias_name="revenue_u"))
    return _global_top_k(out, ["revenue_u", "l_orderkey"],
                         [True, False], 10)


def q5_local_supplier_volume(sf_dir: str) -> rd.Dataset:
    """Q5 shape: five dimension hops collapsed into two broadcast
    lookups + ONE big×big hash join.

    supplier→nation→region folds into a suppkey→(asian nation) map and
    customer→nation into custkey→nationkey, both shipped once via
    ``ray.put`` and applied vectorized per batch (J1/T2 pattern) — the
    only exchange is lineitem×orders on orderkey."""
    import pyarrow.parquet as pq
    from sits_classification_ray.stages.joins import hash_join

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])

    asia = region.filter(pc.equal(region["r_name"], "ASIA"))
    asia_keys = set(asia["r_regionkey"].to_pylist())
    nk = nation["n_nationkey"].to_numpy()
    name_of = np.empty(int(nk.max()) + 1, dtype=object)
    name_of[nk] = nation["n_name"].to_pylist()
    in_asia = np.zeros(int(nk.max()) + 1, dtype=bool)
    in_asia[nk] = [k in asia_keys for k in
                   nation["n_regionkey"].to_pylist()]

    sk = supp["s_suppkey"].to_numpy()
    s_order = np.argsort(sk)
    supp_map = (sk[s_order], supp["s_nationkey"].to_numpy()[s_order])
    ck = cust["c_custkey"].to_numpy()
    c_order = np.argsort(ck)
    cust_map = (ck[c_order], cust["c_nationkey"].to_numpy()[c_order])
    side_ref = ray.put((supp_map, cust_map, name_of, in_asia))

    # task-based broadcast attaches (ray.get = plasma-local per batch):
    # actor pools feeding the join's aggregator actors can deadlock on
    # CPU reservations at small cluster sizes.
    def attach_supplier(batch: pa.Table) -> pa.Table:
        (sk, sn), _, _, asia_mask = ray.get(side_ref)
        keys = batch["l_suppkey"].to_numpy()
        snat = sn[np.searchsorted(sk, keys)]
        keep = asia_mask[snat]
        batch = batch.filter(pa.array(keep))
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"])))
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "s_nationkey": pa.array(snat[keep], pa.int64()),
            "rev_u": rev,
        })

    def attach_customer(batch: pa.Table) -> pa.Table:
        _, (ck, cn), _, _ = ray.get(side_ref)
        cnat = cn[np.searchsorted(ck, batch["o_custkey"].to_numpy())]
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "c_nationkey": pa.array(cnat, pa.int64()),
        })

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(attach_supplier, batch_format="pyarrow",
                  zero_copy_batch=True)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= pc.scalar(lo))
                & (pc.field("o_orderdate") < pc.scalar(hi))),
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(t["o_orderdate"], pa.scalar(hi, pa.timestamp("us"))))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(attach_customer, batch_format="pyarrow",
                  zero_copy_batch=True)

    joined = hash_join(line, orders, on="l_orderkey", right_on="o_orderkey")

    def finish(batch: pa.Table) -> pa.Table:
        _, _, name_of, _ = ray.get(side_ref)
        keep = pc.equal(batch["s_nationkey"], batch["c_nationkey"])
        batch = batch.filter(keep)
        names = name_of[batch["s_nationkey"].to_numpy()]
        return pa.table({
            "nation": pa.array(names, pa.string()),
            "rev_u": batch["rev_u"],
        })

    out = joined.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = out.groupby("nation").aggregate(
        Sum("rev_u", alias_name="revenue_u"))
    return out.sort("nation")


def q10_returned_items(sf_dir: str) -> rd.Dataset:
    """Q10 shape: returned lineitems × quarter of orders → per-customer
    revenue → combiner top-20 → broadcast attach of customer attrs.

    The customer dimension joins AFTER the top-k prune, so only 20
    rows ever see the wide attributes (classic late-materialization)."""
    import pyarrow.parquet as pq
    from sits_classification_ray.stages.joins import hash_join

    lo, hi = pd.Timestamp("1998-01-01"), pd.Timestamp("1998-07-01")
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=(pc.field("l_returnflag") == pc.scalar("R")),
    )

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"])))
        return pa.table({"l_orderkey": batch["l_orderkey"], "rev_u": rev})

    line = line.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= pc.scalar(lo))
                & (pc.field("o_orderdate") < pc.scalar(hi))),
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(t["o_orderdate"],
                    pa.scalar(hi, pa.timestamp("us")))))
        .drop_columns(["o_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(line, orders, on="l_orderkey", right_on="o_orderkey")
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_u", alias_name="revenue_u"))
    top = _global_top_k(per_cust, ["revenue_u", "o_custkey"],
                        [True, False], 20)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy()
    order = np.argsort(ck)
    names = np.asarray(cust["c_name"].to_pylist(), dtype=object)[order]
    cnat = cust["c_nationkey"].to_numpy()[order]
    nk = nation["n_nationkey"].to_numpy()
    nname = np.empty(int(nk.max()) + 1, dtype=object)
    nname[nk] = nation["n_name"].to_pylist()
    ck = ck[order]
    side_ref = ray.put((ck, names, cnat, nname))

    def attach_attrs(batch: pa.Table) -> pa.Table:
        ck2, names, cnat, nname = ray.get(side_ref)
        pos = np.searchsorted(ck2, batch["o_custkey"].to_numpy())
        return pa.table({
            "c_custkey": batch["o_custkey"],
            "c_name": pa.array(names[pos], pa.string()),
            "nation": pa.array(nname[cnat[pos]], pa.string()),
            "revenue_u": batch["revenue_u"],
        })

    out = top.map_batches(attach_attrs, batch_format="pyarrow",
                          zero_copy_batch=True)
    return out.sort(["revenue_u", "c_custkey"], descending=[True, False])


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """Q14 shape: conditional share over a broadcast dimension.

    part is tiny relative to lineitem, so the partkey→is_promo flag
    ships once via ``ray.put``; the month's revenue splits into
    promo/total per batch and merges as two exact integer sums —
    zero shuffle."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    lo, hi = pd.Timestamp("1997-03-01"), pd.Timestamp("1997-04-01")
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy()
    promo = np.zeros(int(pk.max()) + 1, dtype=bool)
    promo[pk] = np.asarray(
        [t == "PROMO" for t in part["p_type"].to_pylist()])
    promo_ref = ray.put(promo)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                & (pc.field("l_shipdate") < pc.scalar(hi))),
    )

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.greater_equal(batch["l_shipdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(batch["l_shipdate"],
                    pa.scalar(hi, pa.timestamp("us")))))
        is_promo = ray.get(promo_ref)[batch["l_partkey"].to_numpy()]
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"]))).to_numpy()
        return pa.table({
            "promo_u": pa.array(np.where(is_promo, rev, 0), pa.int64()),
            "total_u": pa.array(rev, pa.int64()),
        })

    agg = ds.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("promo_u", alias_name="promo_u"),
        Sum("total_u", alias_name="total_u"))
    promo_u, total_u = int(agg["promo_u"]), int(agg["total_u"])
    share = round(100.0 * promo_u / max(1, total_u), 6)
    return pd.DataFrame([{"promo_u": promo_u, "total_u": total_u,
                          "promo_share_pct": share}])


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """Q17 shape: correlated per-group aggregate — lineitems below
    20% of their part's average quantity.

    Two passes over lineitem, no join of big sides: pass 1 reduces
    (partkey → sum_qty, n) with a per-batch combiner (the per-part
    table is dimension-sized and becomes the broadcast threshold
    lookup); pass 2 filters against the broadcast thresholds and sums
    price cents exactly. The classic decorrelation of a correlated
    scalar subquery."""
    from ray.data.aggregate import Count, Sum

    qsrc = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity"])

    def qpartial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": batch["l_partkey"].to_numpy(),
            "q": pc.cast(batch["l_quantity"], pa.int64()).to_numpy(),
        })
        g = df.groupby("l_partkey", as_index=False).agg(
            sum_q=("q", "sum"), n=("q", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = (qsrc.map_batches(qpartial, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .groupby("l_partkey").aggregate(
                    Sum("sum_q", alias_name="sum_q"),
                    Sum("n", alias_name="n"))
                .to_pandas())
    # threshold as an EXACT rational: keep 0.2·avg as (sum_q, 5·n) and
    # compare 5·n·qty < sum_q in integers — no float avg anywhere
    kmax = int(per_part["l_partkey"].max())
    sum_q = np.zeros(kmax + 1, dtype=np.int64)
    n5 = np.zeros(kmax + 1, dtype=np.int64)
    sum_q[per_part["l_partkey"].to_numpy()] = per_part["sum_q"].to_numpy()
    n5[per_part["l_partkey"].to_numpy()] = 5 * per_part["n"].to_numpy()
    thr_ref = ray.put((sum_q, n5))

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        sq, n5v = ray.get(thr_ref)
        k = batch["l_partkey"].to_numpy()
        q = pc.cast(batch["l_quantity"], pa.int64()).to_numpy()
        keep = n5v[k] * q < sq[k]
        cents = _cents(batch["l_extendedprice"]).to_numpy()
        return pa.table({
            "rev_cents": pa.array(np.where(keep, cents, 0), pa.int64()),
            "n_small": pa.array(keep.astype(np.int64)),
        })

    from ray.data.aggregate import Sum as _S
    agg = ds.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        _S("rev_cents", alias_name="rev_cents"),
        _S("n_small", alias_name="n_small"))
    return pd.DataFrame([{"rev_cents": int(agg["rev_cents"]),
                          "n_small": int(agg["n_small"])}])


def q18_large_volume_orders(sf_dir: str, min_qty: int = 200) -> rd.Dataset:
    """Q18 shape: HAVING over a grouped join — orders whose total
    quantity exceeds the threshold, with customer attrs attached
    late.

    The HAVING filter applies right after the per-order Sum (the
    grouped table is orders-sized, the filter shrinks it to the
    qualifying tail BEFORE any join), then one hash join to orders and
    a broadcast attach of the tiny customer dim."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from sits_classification_ray.stages.joins import hash_join

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "qty": pc.cast(batch["l_quantity"], pa.int64()),
        })

    per_order = (line.map_batches(prep, batch_format="pyarrow",
                                  zero_copy_batch=True)
                 .groupby("l_orderkey")
                 .aggregate(Sum("qty", alias_name="total_qty")))
    big = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"], min_qty)),
        batch_format="pyarrow", zero_copy_batch=True)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    joined = hash_join(big, orders, on="l_orderkey",
                       right_on="o_orderkey")

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    ck = cust["c_custkey"].to_numpy()
    order = np.argsort(ck)
    names = np.asarray(cust["c_name"].to_pylist(), dtype=object)[order]
    side_ref = ray.put((ck[order], names))

    def attach(batch: pa.Table) -> pa.Table:
        ck2, nm = ray.get(side_ref)
        pos = np.searchsorted(ck2, batch["o_custkey"].to_numpy())
        return pa.table({
            "c_name": pa.array(nm[pos], pa.string()),
            "o_orderkey": batch["l_orderkey"],
            "o_orderdate": batch["o_orderdate"],
            "total_qty": batch["total_qty"],
        })

    out = joined.map_batches(attach, batch_format="pyarrow",
                             zero_copy_batch=True)
    return out.sort(["total_qty", "o_orderkey"],
                    descending=[True, False])


def q4_priority_semi(sf_dir: str) -> rd.Dataset:
    """Q4 shape: EXISTS semi-join + grouped count — orders per
    priority that have at least one deeply-discounted lineitem.

    Fully distributed semi join (no driver collect of the key set,
    which is order-cardinality and therefore NOT broadcastable at
    10^12 rows): qualifying orderkeys are deduped with a per-batch
    combiner before the groupby, then hash-joined to orders; the
    grouped count runs on the priority key (5 values) after a
    per-batch partial count. Mirrors the reference's existence-gated
    per-class counting (``pytorch/utils/Dataset.py:46``)."""
    from ray.data.aggregate import Count, Sum

    from sits_classification_ray.stages.joins import hash_join

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_discount"])

    def qual_keys(batch: pa.Table) -> pa.Table:
        pct = _pct(batch["l_discount"])
        keep = batch.filter(pc.greater_equal(pct, 6))
        # per-batch dedup: the combiner that keeps the shuffle small
        return pa.table({
            "l_orderkey": pc.unique(keep["l_orderkey"]),
        })

    qual = (line.map_batches(qual_keys, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("l_orderkey").aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"]))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(qual, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderpriority": batch["o_orderpriority"].to_pandas()})
        g = df.groupby("o_orderpriority", as_index=False).size()
        g = g.rename(columns={"size": "n_orders"})
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (joined.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_orderpriority")
           .aggregate(Sum("n_orders", alias_name="n_orders")))
    return out.sort("o_orderpriority")


def q16_supplier_variety(sf_dir: str, max_size: int = 25,
                         min_acctbal: float = 5000.0) -> rd.Dataset:
    """Q16 shape: grouped DISTINCT count + anti-join — how many
    distinct suppliers ship each (brand, type) of small parts,
    excluding low-balance suppliers.

    part and supplier are dimensions: their attributes broadcast once
    (``ray.put``) and attach per batch; the DISTINCT runs as the
    two-level groupby (dedup on (brand, type, suppkey) with a
    per-batch combiner, then count per (brand, type)) so no stage ever
    holds more than the dedup key space."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    pk = part["p_partkey"].to_numpy()
    kmax = int(pk.max())
    brand = np.empty(kmax + 1, dtype=object)
    ptype = np.empty(kmax + 1, dtype=object)
    size = np.zeros(kmax + 1, dtype=np.int64)
    brand[pk] = part["p_brand"].to_pylist()
    ptype[pk] = part["p_type"].to_pylist()
    size[pk] = part["p_size"].to_numpy()

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(sup["s_suppkey"].to_numpy()[
        sup["s_acctbal"].to_numpy() < min_acctbal])
    side_ref = ray.put((brand, ptype, size, bad))

    class Attach:
        def __init__(self):
            self.brand, self.ptype, self.size, self.bad = ray.get(side_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch["l_partkey"].to_numpy()
            s = batch["l_suppkey"].to_numpy()
            keep = self.size[k] <= max_size
            # anti-join against the broadcast excluded-supplier keys
            pos = np.searchsorted(self.bad, s)
            pos[pos >= len(self.bad)] = max(0, len(self.bad) - 1)
            if len(self.bad):
                keep &= self.bad[pos] != s
            k, s = k[keep], s[keep]
            df = pd.DataFrame({
                "p_brand": self.brand[k],
                "p_type": self.ptype[k],
                "l_suppkey": s,
            }).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_suppkey"])
    triples = (line.map_batches(Attach, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=(1, 8), num_cpus=1)
               .groupby(["p_brand", "p_type", "l_suppkey"])
               .aggregate(Count(alias_name="_n")))

    def one(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p_brand": batch["p_brand"].to_pandas(),
            "p_type": batch["p_type"].to_pandas()})
        g = df.groupby(["p_brand", "p_type"], as_index=False).size()
        g = g.rename(columns={"size": "supplier_cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (triples.map_batches(one, batch_format="pyarrow",
                               zero_copy_batch=True)
           .groupby(["p_brand", "p_type"])
           .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt")))
    return out.sort(["p_brand", "p_type"])


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """Q19 shape: disjunctive multi-predicate join — revenue from
    three OR'd (brand, size-range, quantity-range) branches.

    part attrs broadcast once; the three-branch disjunction evaluates
    as one vectorized boolean expression per batch; the result is two
    exact integer sums merged with zero shuffle."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy()
    kmax = int(pk.max())
    bid = np.zeros(kmax + 1, dtype=np.int64)  # brand number
    size = np.zeros(kmax + 1, dtype=np.int64)
    bid[pk] = np.asarray([int(b.split("#")[1])
                          for b in part["p_brand"].to_pylist()])
    size[pk] = part["p_size"].to_numpy()
    side_ref = ray.put((bid, size))

    def prep(batch: pa.Table) -> pa.Table:
        bidv, sizev = ray.get(side_ref)
        k = batch["l_partkey"].to_numpy()
        b, sz = bidv[k], sizev[k]
        q = pc.cast(batch["l_quantity"], pa.int64()).to_numpy()
        keep = (((b == 1) & (sz >= 1) & (sz <= 5) & (q >= 1) & (q <= 11))
                | ((b == 2) & (sz >= 1) & (sz <= 10) & (q >= 10) & (q <= 20))
                | ((b == 3) & (sz >= 1) & (sz <= 15) & (q >= 20) & (q <= 30)))
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"]))).to_numpy()
        return pa.table({
            "revenue_u": pa.array(np.where(keep, rev, 0), pa.int64()),
            "n_items": pa.array(keep.astype(np.int64)),
        })

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    agg = ds.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("revenue_u", alias_name="revenue_u"),
        Sum("n_items", alias_name="n_items"))
    return pd.DataFrame([{"revenue_u": int(agg["revenue_u"]),
                          "n_items": int(agg["n_items"])}])


def q7_nation_volume(sf_dir: str) -> rd.Dataset:
    """Q7 shape: cross-nation shipping volume — two dimension
    attachments on opposite sides of ONE big×big join.

    Supplier-nation is attached to lineitem and customer-nation to
    orders via broadcast lookups (both dimension tables are the small
    sides by construction), so the only exchange is the
    lineitem×orders hash join on orderkey; the cross-nation filter
    (``supp_nation <> cust_nation``) runs post-join per batch. Mirrors
    the reference's per-class × per-tile grouped evaluation
    (``pytorch/utils/trainer.py:95-123``) with two independent group
    dimensions."""
    import pyarrow.parquet as pq
    from sits_classification_ray.stages.joins import hash_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])

    nk = nation["n_nationkey"].to_numpy()
    name_of = np.empty(int(nk.max()) + 1, dtype=object)
    name_of[nk] = nation["n_name"].to_pylist()
    sk = supp["s_suppkey"].to_numpy()
    so = np.argsort(sk)
    ck = cust["c_custkey"].to_numpy()
    co = np.argsort(ck)
    side_ref = ray.put((
        (sk[so], supp["s_nationkey"].to_numpy()[so]),
        (ck[co], cust["c_nationkey"].to_numpy()[co]), name_of))

    def attach_supp_nation(batch: pa.Table) -> pa.Table:
        (sks, sns), _, name_of = ray.get(side_ref)
        snat = sns[np.searchsorted(sks, batch["l_suppkey"].to_numpy())]
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"])))
        year = pc.cast(pc.year(batch["l_shipdate"]), pa.int64())
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "supp_nation": pa.array(name_of[snat], pa.string()),
            "l_year": year,
            "rev_u": rev,
        })

    def attach_cust_nation(batch: pa.Table) -> pa.Table:
        _, (cks, cns), name_of = ray.get(side_ref)
        cnat = cns[np.searchsorted(cks, batch["o_custkey"].to_numpy())]
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "cust_nation": pa.array(name_of[cnat], pa.string()),
        })

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                & (pc.field("l_shipdate") < pc.scalar(hi))),
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(t["l_shipdate"], pa.scalar(hi, pa.timestamp("us"))))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(attach_supp_nation, batch_format="pyarrow",
                  zero_copy_batch=True)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
    ).map_batches(attach_cust_nation, batch_format="pyarrow",
                  zero_copy_batch=True)

    joined = hash_join(line, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def cross_only(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(batch["supp_nation"],
                                  batch["cust_nation"]))
        batch = batch.filter(keep)
        return batch.select(["supp_nation", "cust_nation", "l_year",
                             "rev_u"])

    out = joined.map_batches(cross_only, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = out.groupby(["supp_nation", "cust_nation", "l_year"]).aggregate(
        Sum("rev_u", alias_name="revenue_u"))
    return out.sort(["supp_nation", "cust_nation", "l_year"])


def q12_priority_by_status(sf_dir: str) -> rd.Dataset:
    """Q12 shape: conditional aggregation across a big×big join — the
    CASE-WHEN-inside-SUM pattern. Orders collapse to (orderkey,
    is-high-priority) before the exchange so the join payload is one
    int column; counts split per line status after."""
    from sits_classification_ray.stages.joins import hash_join

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")

    def flag(batch: pa.Table) -> pa.Table:
        pri = batch["o_orderpriority"]
        high = pc.or_(pc.equal(pri, "1-URGENT"), pc.equal(pri, "2-HIGH"))
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "is_high": pc.cast(high, pa.int64()),
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                & (pc.field("l_shipdate") < pc.scalar(hi))),
    ).map_batches(
        lambda t: pa.table({
            "l_orderkey": t.filter(pc.and_(
                pc.greater_equal(t["l_shipdate"],
                                 pa.scalar(lo, pa.timestamp("us"))),
                pc.less(t["l_shipdate"],
                        pa.scalar(hi, pa.timestamp("us")))))["l_orderkey"],
            "l_linestatus": t.filter(pc.and_(
                pc.greater_equal(t["l_shipdate"],
                                 pa.scalar(lo, pa.timestamp("us"))),
                pc.less(t["l_shipdate"],
                        pa.scalar(hi, pa.timestamp("us")))))["l_linestatus"],
        }),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(line, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def split(batch: pa.Table) -> pa.Table:
        high = batch["is_high"].to_numpy()
        return pa.table({
            "l_linestatus": batch["l_linestatus"],
            "high_line_count": pa.array(high, pa.int64()),
            "low_line_count": pa.array(1 - high, pa.int64()),
        })

    out = joined.map_batches(split, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = out.groupby("l_linestatus").aggregate(
        Sum("high_line_count", alias_name="high_line_count"),
        Sum("low_line_count", alias_name="low_line_count"))
    return out.sort("l_linestatus")


def q13_customer_distribution(sf_dir: str) -> rd.Dataset:
    """Q13 shape: LEFT OUTER join + double aggregation — the
    distribution-of-counts pattern where customers with zero matching
    orders must survive into the c_count=0 bucket.

    Per-customer counts pre-aggregate on the orders side BEFORE the
    outer join (combiner pattern), so the exchange carries one row per
    customer, not one per order; the final distribution groupby is
    tiny (distinct count values)."""
    from ray.data.aggregate import Count as CountAgg
    from sits_classification_ray.stages.joins import hash_join

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(
        lambda t: t.filter(pc.invert(pc.equal(
            t["o_orderpriority"], "4-NOT SPECIFIED"))),
        batch_format="pyarrow", zero_copy_batch=True)
    per_cust = orders.groupby("o_custkey").aggregate(
        CountAgg(alias_name="n_orders"))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    joined = hash_join(cust, per_cust, on="c_custkey",
                       right_on="o_custkey", join_type="left_outer")

    def bucket(batch: pa.Table) -> pa.Table:
        n = batch["n_orders"].to_numpy(zero_copy_only=False)
        n = np.where(np.isnan(n.astype(np.float64)), 0,
                     n.astype(np.float64)).astype(np.int64)
        return pa.table({"c_count": pa.array(n, pa.int64()),
                         "one": pa.array(np.ones(len(n), np.int64))})

    out = joined.map_batches(bucket, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = out.groupby("c_count").aggregate(
        Sum("one", alias_name="custdist"))
    return out.sort(["custdist", "c_count"], descending=[True, True])


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """Q15 shape: grouped revenue + scalar-subquery max — ties kept.

    Supplier revenue is an exact int-cents groupby; the global max is
    one tiny driver-side aggregate over the per-supplier table (rows =
    #suppliers, never raw lineitem), and the winner lookup is a
    broadcast dimension attach."""
    import pyarrow.parquet as pq

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["l_shipdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(batch["l_shipdate"], pa.scalar(hi, pa.timestamp("us"))))
        batch = batch.filter(keep)
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"])))
        return pa.table({"l_suppkey": batch["l_suppkey"], "rev_u": rev})

    per_supp = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
        filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                & (pc.field("l_shipdate") < pc.scalar(hi))),
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True
                  ).groupby("l_suppkey").aggregate(
        Sum("rev_u", alias_name="total_revenue_u"))

    rev = per_supp.to_pandas()          # rows = #suppliers (small)
    best = rev[rev["total_revenue_u"] == rev["total_revenue_u"].max()]
    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "total_revenue_u"]]
    out["total_revenue_u"] = out["total_revenue_u"].astype(np.int64)
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q22_idle_customers(sf_dir: str) -> rd.Dataset:
    """Q22 shape: scalar AVG subquery + anti-join — rich customers in
    selected market segments with no RECENT order (the recency window
    keeps the result non-degenerate: in the driver tables every
    customer has ordered at least once overall).

    The above-average predicate is evaluated in exact integers
    (``acctbal_cents * n > total_cents`` avoids a float average), and
    the anti-join is the hash-partitioned LEFT OUTER + null-probe
    pattern so neither side is ever collected."""
    from ray.data.aggregate import Count as CountAgg
    from sits_classification_ray.stages.joins import hash_join

    segs = ("AUTOMOBILE", "BUILDING", "FURNITURE")

    def in_segs(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["c_mktsegment"],
                        value_set=pa.array(segs))
        batch = batch.filter(keep)
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "c_mktsegment": batch["c_mktsegment"],
            "bal_u": _cents(batch["c_acctbal"]),
        })

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    ).map_batches(in_segs, batch_format="pyarrow", zero_copy_batch=True)
    cust = cust.materialize()   # consumed twice: threshold + probe

    pos = cust.filter(expr="bal_u > 0")
    th = pos.aggregate(Sum("bal_u", alias_name="s"),
                       CountAgg(alias_name="n"))
    total_u, n_pos = int(th["s"]), int(th["n"])

    # exact integer above-average predicate (Ray's expr mini-language
    # has no arithmetic on the left operand, so filter per batch)
    rich = cust.map_batches(
        lambda t, n=n_pos, s=total_u: t.filter(pc.greater(
            pc.multiply(t["bal_u"], pa.scalar(n, pa.int64())),
            pa.scalar(s, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True)

    recent = pd.Timestamp("2000-01-01")
    ordered = (rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= pc.scalar(recent)),
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["o_orderdate"], pa.scalar(recent, pa.timestamp("us")))),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(CountAgg(alias_name="n_orders")))
    joined = hash_join(rich, ordered, on="c_custkey",
                       right_on="o_custkey", join_type="left_outer")

    def never_ordered(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_null(batch["n_orders"]))
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "bal_u": pc.cast(batch["bal_u"], pa.int64()),
            "one": pa.array(np.ones(len(batch), np.int64)),
        })

    out = joined.map_batches(never_ordered, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = out.groupby("c_mktsegment").aggregate(
        Sum("one", alias_name="numcust"),
        Sum("bal_u", alias_name="totacctbal_u"))
    return out.sort("c_mktsegment")


def _dim_maps(sf_dir: str):
    """Broadcast-side supplier→nation→region lookup arrays (the three
    dimension tables are small by TPC-H construction: |supplier| ≪
    |lineitem| by 4 orders of magnitude, |nation|=25, |region|=5)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    supp = pq.read_table(f"{sf_dir}/supplier.parquet")

    nk = nation["n_nationkey"].to_numpy()
    n_name = np.empty(int(nk.max()) + 1, dtype=object)
    n_name[nk] = nation["n_name"].to_pylist()
    n_region = np.zeros(int(nk.max()) + 1, np.int64)
    n_region[nk] = nation["n_regionkey"].to_numpy()
    rk = region["r_regionkey"].to_numpy()
    r_name = np.empty(int(rk.max()) + 1, dtype=object)
    r_name[rk] = region["r_name"].to_pylist()

    sk = supp["s_suppkey"].to_numpy()
    so = np.argsort(sk)
    return {
        "s_suppkey": sk[so],
        "s_nationkey": supp["s_nationkey"].to_numpy()[so],
        "s_name": np.asarray(supp["s_name"].to_pylist(),
                             dtype=object)[so],
        "s_acctbal": supp["s_acctbal"].to_numpy()[so],
        "n_name": n_name,
        "n_regionkey": n_region,
        "r_name": r_name,
    }


def q2_min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                         max_size: int = 15, ptype: str = "PROMO",
                         k: int = 100) -> rd.Dataset:
    """Q2 shape: correlated-min subquery over a part×supplier cost
    table + a 4-dimension join chain, top-k output.

    Adaptation (documented): the driver tables carry no ``partsupp``
    relation, so the (part, supplier) cost is DERIVED from lineitem —
    ``cost_u = min`` observed line price in cents per (partkey,
    suppkey), restricted to suppliers in ``region``. The shape is
    preserved exactly: per-part minimum across suppliers (correlated
    min), then part/supplier/nation attribute attachment and the
    Q2 ordering ``s_acctbal DESC, n_name, s_name, p_partkey`` with a
    deterministic top-k (the sort key is a total order: (s_name,
    p_partkey) is unique after the per-pair min).

    Scale: the min-cost table is built with a per-batch combiner min
    before one groupby (narrow int rows); the per-part min filter is
    one salted exchange on partkey; part attributes come in via a
    hash join against the size/type-pruned part table (NOT broadcast —
    |part| scales with the corpus)."""
    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.shuffle import partitioned_map

    dims = _dim_maps(sf_dir)
    eur = dims["n_regionkey"][dims["s_nationkey"]]
    eur_mask = np.asarray(
        [dims["r_name"][r] == region for r in eur])
    side_ref = ray.put({
        "keys": dims["s_suppkey"][eur_mask],
        "s_name": dims["s_name"][eur_mask],
        "s_acctbal": dims["s_acctbal"][eur_mask],
        "n_name": dims["n_name"][dims["s_nationkey"][eur_mask]],
    })

    def pair_min(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        sup = batch["l_suppkey"].to_numpy()
        pos = np.searchsorted(side["keys"], sup)
        pos = np.clip(pos, 0, len(side["keys"]) - 1)
        keep = side["keys"][pos] == sup
        df = pd.DataFrame({
            "p_partkey": batch["l_partkey"].to_numpy()[keep],
            "l_suppkey": sup[keep],
            "cost_u": _cents(batch["l_extendedprice"]).to_numpy()[keep],
        })
        g = df.groupby(["p_partkey", "l_suppkey"], as_index=False)
        return pa.Table.from_pandas(g["cost_u"].min(),
                                    preserve_index=False)

    cost = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(pair_min, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["p_partkey", "l_suppkey"])
        .aggregate(Min("cost_u", alias_name="cost_u")))

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("p_partkey")["cost_u"].transform("min")
        return df[df["cost_u"] == m]

    best = partitioned_map(cost, keep_min, keys=["p_partkey"])

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_type", "p_retailprice"],
        filter=(pc.field("p_size") <= max_size)
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.less_equal(t["p_size"], max_size),
            pc.equal(t["p_type"], ptype))).select(
                ["p_partkey", "p_retailprice"]),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(best, part, on="p_partkey")

    def attach(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        pos = np.searchsorted(side["keys"],
                              batch["l_suppkey"].to_numpy())
        return pa.table({
            "s_acctbal": pa.array(side["s_acctbal"][pos],
                                  pa.float64()),
            "s_name": pa.array(side["s_name"][pos], pa.string()),
            "n_name": pa.array(side["n_name"][pos], pa.string()),
            "p_partkey": batch["p_partkey"],
            "p_retailprice": batch["p_retailprice"],
            "cost_u": batch["cost_u"],
        })

    out = joined.map_batches(attach, batch_format="pyarrow",
                             zero_copy_batch=True)
    return _global_top_k(
        out, ["s_acctbal", "n_name", "s_name", "p_partkey"],
        [True, False, False, False], k)


def q8_market_share(sf_dir: str, nation: str = "NATION_3",
                    region: str = "AMERICA") -> rd.Dataset:
    """Q8 shape: national market share — one big×big join with
    dimension attachments on both sides, then a conditional share per
    group. ``mkt_share(year) = revenue by suppliers of ``nation`` /
    all revenue``, over orders placed 1996–1997 by customers in
    ``region``. Revenue sums are exact cents×pct int64; the share is
    one double division at finalize (mirrored digit-for-digit by the
    SQL twin's CAST-to-DOUBLE division + round 6). Deviation from
    stock TPC-H: no p_type filter (the adapted part table carries the
    type on lineitem only through a join we exercise in q9/q17/q19
    instead — q8's distinctive shape is the two-sided dimension
    attachment + share, which is fully preserved)."""
    import pyarrow.parquet as pq
    from sits_classification_ray.stages.joins import hash_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    dims = _dim_maps(sf_dir)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy()
    co = np.argsort(ck)
    cust_region = np.asarray(
        [dims["r_name"][r] for r in
         dims["n_regionkey"][cust["c_nationkey"].to_numpy()[co]]],
        dtype=object)
    is_target = np.asarray(
        [dims["n_name"][n] == nation for n in dims["s_nationkey"]])
    side_ref = ray.put({
        "s_keys": dims["s_suppkey"], "s_is_target": is_target,
        "c_keys": ck[co], "c_region": cust_region,
    })

    def line_side(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        pos = np.searchsorted(side["s_keys"],
                              batch["l_suppkey"].to_numpy())
        rev = pc.multiply(_cents(batch["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()),
                                      _pct(batch["l_discount"])))
        flag = side["s_is_target"][pos]
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "rev_u": rev,
            "nation_rev_u": pc.multiply(
                rev, pa.array(flag.astype(np.int64))),
        })

    def order_side(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        pos = np.searchsorted(side["c_keys"],
                              batch["o_custkey"].to_numpy())
        keep = side["c_region"][pos] == region
        batch = batch.filter(pa.array(keep))
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_year": pc.cast(pc.year(batch["o_orderdate"]),
                              pa.int64()),
        })

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow",
                  zero_copy_batch=True)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= pc.scalar(lo))
                & (pc.field("o_orderdate") < pc.scalar(hi))),
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(t["o_orderdate"],
                    pa.scalar(hi, pa.timestamp("us"))))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(order_side, batch_format="pyarrow",
                  zero_copy_batch=True)

    joined = hash_join(line, orders, on="l_orderkey",
                       right_on="o_orderkey")
    agg = joined.groupby("o_year").aggregate(
        Sum("nation_rev_u", alias_name="nation_rev_u"),
        Sum("rev_u", alias_name="total_rev_u"))

    def share(df: pd.DataFrame) -> pd.DataFrame:
        from sits_classification_ray.functions.transforms import \
            sql_round
        out = df.copy(deep=False)
        out["mkt_share"] = sql_round(
            df["nation_rev_u"].to_numpy(np.float64)
            / df["total_rev_u"].to_numpy(np.float64), 6)
        return out

    return agg.map_batches(share, batch_format="pandas").sort("o_year")


def q9_product_profit(sf_dir: str, name_like: str = "widget"
                      ) -> rd.Dataset:
    """Q9 shape: product-type profit by nation and year — the
    lineitem×part big×big hash join with supplier-nation attachment
    and a name-substring part filter.

    Adaptation (documented): no ``partsupp.ps_supplycost`` in the
    driver tables, so unit cost is defined as 50 % of
    ``p_retailprice`` — profit stays an exact int:
    ``profit_u = ext_cents·(100−disc_pct) − qty·retail_cents·50``
    (l_quantity is integral in the driver data; the SQL twin casts
    identically). Group year comes from ``l_shipdate`` (the driver
    lineitem carries no order date linkage needed — Q9's shape is the
    join topology + signed profit aggregation, preserved)."""
    from sits_classification_ray.stages.joins import hash_join

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"],
    ).map_batches(
        lambda t: t.filter(pc.match_substring(t["p_name"], name_like))
        .select(["p_partkey", "p_retailprice"]),
        batch_format="pyarrow", zero_copy_batch=True)

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    joined = hash_join(line, part, on="l_partkey",
                       right_on="p_partkey")

    dims = _dim_maps(sf_dir)
    side_ref = ray.put({
        "s_keys": dims["s_suppkey"],
        "s_nation": dims["n_name"][dims["s_nationkey"]],
    })

    def profit(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        pos = np.searchsorted(side["s_keys"],
                              batch["l_suppkey"].to_numpy())
        gross = pc.multiply(_cents(batch["l_extendedprice"]),
                            pc.subtract(pa.scalar(100, pa.int64()),
                                        _pct(batch["l_discount"])))
        cost = pc.multiply(
            pc.multiply(pc.cast(batch["l_quantity"], pa.int64()),
                        _cents(batch["p_retailprice"])),
            pa.scalar(50, pa.int64()))
        return pa.table({
            "nation": pa.array(side["s_nation"][pos], pa.string()),
            "o_year": pc.cast(pc.year(batch["l_shipdate"]), pa.int64()),
            "profit_u": pc.subtract(gross, cost),
        })

    out = joined.map_batches(profit, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = out.groupby(["nation", "o_year"]).aggregate(
        Sum("profit_u", alias_name="profit_u"))
    return out.sort(["nation", "o_year"], descending=[False, True])


def q11_important_parts(sf_dir: str, nation: str = "NATION_12",
                        fraction_ppm: int = 1000) -> rd.Dataset:
    """Q11 shape: grouped value share vs a scalar-total subquery —
    parts whose lineitem revenue through ``nation``'s suppliers
    exceeds ``fraction_ppm`` parts-per-million of the total.

    Adaptation (documented): ``value`` is lineitem revenue cents per
    part through the nation's suppliers (no partsupp availqty/cost in
    the driver tables); the HAVING-over-scalar-subquery shape is
    preserved, and the threshold compare is pure int64
    (``value_u · 1_000_000 > total_u · fraction_ppm``) so it is exact
    and order-free at any scale."""
    from ray.data.aggregate import Sum as SumAgg

    dims = _dim_maps(sf_dir)
    in_nation = np.asarray(
        [dims["n_name"][n] == nation for n in dims["s_nationkey"]])
    keys_ref = ray.put(dims["s_suppkey"][in_nation])

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        sup = batch["l_suppkey"].to_numpy()
        pos = np.clip(np.searchsorted(keys, sup), 0,
                      max(len(keys) - 1, 0))
        keep = (keys[pos] == sup) if len(keys) else \
            np.zeros(len(sup), bool)
        df = pd.DataFrame({
            "p_partkey": batch["l_partkey"].to_numpy()[keep],
            "value_u": _cents(batch["l_extendedprice"])
            .to_numpy()[keep]})
        g = df.groupby("p_partkey", as_index=False)["value_u"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    val = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("p_partkey")
        .aggregate(SumAgg("value_u", alias_name="value_u"))
        .materialize())    # consumed twice: scalar total + filter
    total_u = int(val.sum("value_u") or 0)

    thresh = total_u * fraction_ppm
    out = val.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["value_u"], pa.scalar(1_000_000, pa.int64())),
            pa.scalar(thresh, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True)
    out = out.sort(["value_u", "p_partkey"], descending=[True, False])
    # schema seed: at large scale the ppm threshold can exclude every
    # part, and a zero-block result would lose its schema entirely
    empty = pa.schema([("p_partkey", pa.int64()),
                       ("value_u", pa.int64())]).empty_table()
    return out.union(rd.from_arrow(empty))


def q20_promotion_suppliers(sf_dir: str, name_prefix: str = "large",
                            year: int = 1997) -> rd.Dataset:
    """Q20 shape: nested correlated-aggregate semi-join chain —
    suppliers who DOMINATED shipment of some promotion-class part
    (shipped > 50 % of that part's total shipped quantity in
    ``year``), with name/nation attached.

    Adaptation (documented): stock Q20 compares ps_availqty against
    half the shipped quantity; with no partsupp relation the same
    correlated half-total predicate runs supplier-vs-part-total over
    the shipped quantities themselves (``qty·2 > part_total``). The
    chain part-filter → per-(part,supp) aggregate → correlated
    threshold → distinct supplier → dimension attach is preserved.
    The quantity compare is exact int64."""
    from ray.data.aggregate import Sum as SumAgg
    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.shuffle import partitioned_map

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"],
    ).map_batches(
        lambda t: t.filter(pc.starts_with(t["p_name"], name_prefix))
        .select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=((pc.field("l_shipdate") >= pc.scalar(lo))
                & (pc.field("l_shipdate") < pc.scalar(hi))),
    ).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"],
                             pa.scalar(lo, pa.timestamp("us"))),
            pc.less(t["l_shipdate"], pa.scalar(hi, pa.timestamp("us"))))
        ).select(["l_partkey", "l_suppkey", "l_quantity"]),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(line, part, on="l_partkey",
                       right_on="p_partkey")

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p_partkey": batch["l_partkey"].to_numpy(),
            "l_suppkey": batch["l_suppkey"].to_numpy(),
            "qty": batch["l_quantity"].to_numpy().astype(np.int64)})
        g = df.groupby(["p_partkey", "l_suppkey"],
                       as_index=False)["qty"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    pair = (joined.map_batches(pair_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["p_partkey", "l_suppkey"])
            .aggregate(SumAgg("qty", alias_name="qty")))

    def dominant(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("p_partkey")["qty"].transform("sum")
        return df[df["qty"] * 2 > tot][["l_suppkey"]]

    supp_keys = (partitioned_map(pair, dominant, keys=["p_partkey"])
                 .groupby("l_suppkey")
                 .aggregate(Count(alias_name="_n"))
                 .drop_columns(["_n"]))

    dims = _dim_maps(sf_dir)
    side_ref = ray.put({
        "s_keys": dims["s_suppkey"], "s_name": dims["s_name"],
        "s_nation": dims["n_name"][dims["s_nationkey"]]})

    def attach(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        pos = np.searchsorted(side["s_keys"],
                              batch["l_suppkey"].to_numpy())
        return pa.table({
            "s_name": pa.array(side["s_name"][pos], pa.string()),
            "n_name": pa.array(side["s_nation"][pos], pa.string())})

    return supp_keys.map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    ).sort("s_name")


def q21_suppliers_waiting(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Q21 shape: double-correlated EXISTS / NOT-EXISTS over the
    lineitem self-relation — suppliers who were the SOLE flagged
    supplier on a multi-supplier finalized order, counted and
    top-k'd.

    Adaptation (documented): the driver lineitem has no
    commit/receipt dates, so "kept the order waiting" is re-expressed
    with ``l_returnflag = 'R'`` as the fault flag: count per supplier
    of 'F'-status orders where ≥2 distinct suppliers shipped, this
    supplier had a flagged line, and NO other supplier did — the
    exact EXISTS(other supplier) AND NOT EXISTS(other flagged
    supplier) correlation of stock Q21.

    Scale: per-(order, supplier) flags are combined per batch before
    one groupby; the per-order correlation is one salted exchange on
    orderkey (bounded by suppliers-per-order, never the table)."""
    from ray.data.aggregate import Max as MaxAgg
    from sits_classification_ray.stages.joins import hash_join
    from sits_classification_ray.stages.shuffle import partitioned_map

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].to_numpy(),
            "l_suppkey": batch["l_suppkey"].to_numpy(),
            "has_r": pc.equal(batch["l_returnflag"], "R")
            .to_numpy(zero_copy_only=False).astype(np.int64)})
        g = df.groupby(["l_orderkey", "l_suppkey"],
                       as_index=False)["has_r"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (line.map_batches(pair_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby(["l_orderkey", "l_suppkey"])
             .aggregate(MaxAgg("has_r", alias_name="has_r")))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == pc.scalar("F")),
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F"))
        .select(["o_orderkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(pairs, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def sole_fault(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey")
        n_supp = g["l_suppkey"].transform("size")
        n_fault = g["has_r"].transform("sum")
        keep = (df["has_r"] == 1) & (n_supp > 1) & (n_fault == 1)
        return df[keep][["l_suppkey"]]

    faults = partitioned_map(joined, sole_fault, keys=["l_orderkey"])
    counts = faults.groupby("l_suppkey").aggregate(
        Count(alias_name="numwait"))

    dims = _dim_maps(sf_dir)
    side_ref = ray.put({"s_keys": dims["s_suppkey"],
                        "s_name": dims["s_name"]})

    def attach(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        pos = np.searchsorted(side["s_keys"],
                              batch["l_suppkey"].to_numpy())
        return pa.table({
            "s_name": pa.array(side["s_name"][pos], pa.string()),
            "numwait": pc.cast(batch["numwait"], pa.int64())})

    named = counts.map_batches(attach, batch_format="pyarrow",
                               zero_copy_batch=True)
    return _global_top_k(named, ["numwait", "s_name"],
                         [True, False], k)
