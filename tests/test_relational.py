"""Multi-table analytical queries (TPC-H Q3/Q5/Q6/Q10 shapes) vs an
independent DuckDB computation over the same sf0.001 tables.

The integer revenue-unit convention (cents × pct) is what makes the
distributed sums exactly comparable — these tests assert values, not
just shapes.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders",
              "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def test_q6_exact_integer_revenue(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q6_revenue_forecast)

    got = q6_revenue_forecast(SF)
    exp = _duck("""
        SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * CAST(round(l_discount * 100, 0) AS BIGINT))
                    AS BIGINT) AS revenue_u, count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
          AND l_quantity < 24""")
    assert int(got["revenue_u"].iloc[0]) == int(exp["revenue_u"].iloc[0])
    assert int(got["n_items"].iloc[0]) == int(exp["n_items"].iloc[0])


def test_q3_top10_revenue_and_ties(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q3_shipping_priority)

    got = q3_shipping_priority(SF).to_pandas()
    exp = _duck("""
        SELECT l.l_orderkey,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS revenue_u
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1 ORDER BY revenue_u DESC, l.l_orderkey LIMIT 10""")
    assert len(got) == len(exp)
    assert got["l_orderkey"].tolist() == exp["l_orderkey"].tolist()
    assert got["revenue_u"].tolist() == exp["revenue_u"].tolist()


def test_q5_nation_revenue(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q5_local_supplier_volume)

    got = q5_local_supplier_volume(SF).to_pandas()
    exp = _duck("""
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
        GROUP BY 1 ORDER BY 1""")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_q10_late_materialization_attrs(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q10_returned_items)

    got = q10_returned_items(SF).to_pandas()
    exp = _duck("""
        WITH per AS (
          SELECT o.o_custkey,
                 CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                      * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
                      AS BIGINT) AS revenue_u
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R'
            AND o.o_orderdate >= TIMESTAMP '1998-01-01'
            AND o.o_orderdate < TIMESTAMP '1998-07-01'
          GROUP BY 1 ORDER BY revenue_u DESC, o.o_custkey LIMIT 20)
        SELECT c.c_custkey, c.c_name, n.n_name AS nation, per.revenue_u
        FROM per JOIN customer c ON per.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY per.revenue_u DESC, c.c_custkey""")
    assert got["c_custkey"].tolist() == exp["c_custkey"].tolist()
    assert got["c_name"].tolist() == exp["c_name"].tolist()
    assert got["nation"].tolist() == exp["nation"].tolist()
    assert got["revenue_u"].tolist() == exp["revenue_u"].tolist()


def test_q14_promo_share(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q14_promo_revenue)

    got = q14_promo_revenue(SF)
    exp = _duck("""
        WITH p2 AS (SELECT * FROM '/root/testdata/sf0.001/part.parquet'),
        r AS (
          SELECT CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
                     AS rev,
                 p.p_type = 'PROMO' AS is_promo
          FROM lineitem l JOIN p2 p ON l.l_partkey = p.p_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
            AND l.l_shipdate < TIMESTAMP '1997-04-01')
        SELECT CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT)
                   AS promo_u,
               CAST(sum(rev) AS BIGINT) AS total_u
        FROM r""")
    assert int(got["promo_u"].iloc[0]) == int(exp["promo_u"].iloc[0])
    assert int(got["total_u"].iloc[0]) == int(exp["total_u"].iloc[0])


def test_q17_exact_rational_threshold(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q17_small_quantity_revenue)

    got = q17_small_quantity_revenue(SF)
    exp = _duck("""
        WITH pp AS (
          SELECT l_partkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
                 5 * count(*) AS n5
          FROM lineitem GROUP BY 1)
        SELECT CAST(sum(CASE WHEN pp.n5 * CAST(l.l_quantity AS BIGINT)
                                  < pp.sum_q THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_small
        FROM lineitem l JOIN pp ON l.l_partkey = pp.l_partkey""")
    assert int(got["n_small"].iloc[0]) == int(exp["n_small"].iloc[0])


def test_q4_exists_semi_join(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q4_priority_semi)

    got = q4_priority_semi(SF).to_pandas()
    exp = _duck("""
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            WHERE CAST(round(l_discount * 100, 0) AS BIGINT) >= 6)
        GROUP BY 1 ORDER BY 1""")
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["n_orders"].tolist() == exp["n_orders"].tolist()


def test_q16_distinct_suppliers_anti_join(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q16_supplier_variety)

    got = q16_supplier_variety(SF).to_pandas()
    exp = _duck(f"""
        WITH p2 AS (SELECT * FROM '{SF}/part.parquet')
        SELECT p.p_brand, p.p_type,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN p2 p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 25
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 5000.0)
        GROUP BY 1, 2 ORDER BY 1, 2""")
    assert got["p_brand"].tolist() == exp["p_brand"].tolist()
    assert got["p_type"].tolist() == exp["p_type"].tolist()
    assert got["supplier_cnt"].tolist() == exp["supplier_cnt"].tolist()


def test_q19_disjunctive_predicates(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q19_disjunctive_revenue)

    got = q19_disjunctive_revenue(SF)
    exp = _duck(f"""
        WITH p2 AS (SELECT * FROM '{SF}/part.parquet')
        SELECT CAST(sum(CASE WHEN
                 ((CAST(replace(p.p_brand, 'Brand#', '') AS BIGINT) = 1
                   AND p.p_size BETWEEN 1 AND 5
                   AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 11)
               OR (CAST(replace(p.p_brand, 'Brand#', '') AS BIGINT) = 2
                   AND p.p_size BETWEEN 1 AND 10
                   AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 20)
               OR (CAST(replace(p.p_brand, 'Brand#', '') AS BIGINT) = 3
                   AND p.p_size BETWEEN 1 AND 15
                   AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 30))
               THEN CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
               ELSE 0 END) AS BIGINT) AS revenue_u
        FROM lineitem l JOIN p2 p ON l.l_partkey = p.p_partkey""")
    assert int(got["revenue_u"].iloc[0]) == int(exp["revenue_u"].iloc[0])
    assert int(got["n_items"].iloc[0]) > 0


def test_q21_sole_fault_supplier(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q21_suppliers_waiting)

    got = q21_suppliers_waiting(SF).to_pandas()
    exp = _duck("""
        WITH lf AS MATERIALIZED (
          SELECT l_orderkey, l_suppkey,
                 max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                     AS has_r
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F' GROUP BY 1, 2)
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM lf JOIN supplier ON l_suppkey = s_suppkey
        WHERE has_r = 1
          AND (SELECT count(*) FROM lf l2
               WHERE l2.l_orderkey = lf.l_orderkey) > 1
          AND (SELECT sum(has_r) FROM lf l2
               WHERE l2.l_orderkey = lf.l_orderkey) = 1
        GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""")
    assert got["s_name"].tolist() == exp["s_name"].tolist()
    assert got["numwait"].tolist() == exp["numwait"].tolist()


def test_q2_per_part_min_cost(ray_session):
    from sits_classification_ray.pipelines.relational import (
        q2_min_cost_supplier)

    got = q2_min_cost_supplier(SF).to_pandas()
    # every returned (part, supplier) pair carries that part's global
    # minimum observed EUROPE-supplier line price
    exp_min = _duck("""
        SELECT l_partkey AS p_partkey,
               min(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS min_u
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' GROUP BY 1""")
    mins = dict(zip(exp_min["p_partkey"], exp_min["min_u"]))
    assert len(got) > 0
    assert all(int(r.cost_u) == int(mins[r.p_partkey])
               for r in got.itertuples())
    # Q2 ordering contract
    key = list(zip(-got["s_acctbal"], got["n_name"], got["s_name"],
                   got["p_partkey"]))
    assert key == sorted(key)
