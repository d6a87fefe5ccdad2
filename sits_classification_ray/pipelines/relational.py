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
