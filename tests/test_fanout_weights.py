"""Fanout counts, fanout attach, bottom-up weights vs DuckDB exact oracle."""

from pyspark.sql import functions as F

from scardina_spark.catalog import build_tpch_schema
from scardina_spark.operators.fanout import adj_fanout_col, attach_adj_fanouts, fk_counts
from scardina_spark.operators.weights import WEIGHT, compute_weights, join_size


def test_fk_counts_matches_group_by(tables, duck):
    got = {
        r["l_partkey"]: r["count"]
        for r in fk_counts(tables["lineitem"], "l_partkey").collect()
    }
    want = {
        k: c for k, c in duck.sql(
            "select l_partkey, count(*) from lineitem group by 1").fetchall()
    }
    assert got == want


def test_attach_adj_fanout_orders_side(tables, duck):
    sg = build_tpch_schema()
    out = attach_adj_fanouts(sg, tables)
    col = adj_fanout_col("o_orderkey", "lineitem", "l_orderkey")
    got = {
        r["o_orderkey"]: r[col]
        for r in out["orders"].select("o_orderkey", f"`{col}`").collect()
    }
    want = {
        k: c for k, c in duck.sql("""
            select o_orderkey, coalesce(c, 1) from orders
            left join (select l_orderkey, count(*) c from lineitem group by 1)
            on o_orderkey = l_orderkey""").fetchall()
    }
    assert got == want
    # row count unchanged (left-outer, no fabricated rows)
    assert out["orders"].count() == tables["orders"].count()
    # FK side gets constant 1
    fk_col = adj_fanout_col("l_orderkey", "orders", "o_orderkey")
    assert out["lineitem"].where(F.col(f"`{fk_col}`") != 1).count() == 0


def test_bottom_up_weights_give_exact_join_size(tables, duck):
    sg = build_tpch_schema()
    subs = sg.cin_subschemas()
    li = [ss for ss in subs.values() if ss.center == "lineitem"][0]
    # weight of each root (lineitem) row in a pure PK-join is 1; join size =
    # |lineitem| because every FK matches exactly one PK row
    n = join_size(li, tables, "lineitem")
    want = duck.sql("""
        select count(*) from lineitem l
        join orders o on l.l_orderkey = o.o_orderkey
        join part p on l.l_partkey = p.p_partkey
        join supplier s on l.l_suppkey = s.s_suppkey""").fetchone()[0]
    assert n == want


def test_weights_from_dimension_root(tables, duck):
    """Root at orders in the orders-CIN (orders + customer): weight of an
    orders row = 1 (customer is PK side); root at customer in a
    customer-centered tree customer<-orders: weight = #orders per customer."""
    sg = build_tpch_schema()
    subs = sg.cin_subschemas()
    oc = [ss for ss in subs.values() if ss.center == "orders"][0]
    assert oc.tables == {"orders", "customer"}
    w = compute_weights(oc, tables, "customer")
    got = {
        r["c_custkey"]: int(r[WEIGHT])
        for r in w["customer"].select("c_custkey", WEIGHT).collect()
    }
    want = {
        k: c for k, c in duck.sql("""
            select c_custkey, coalesce(c, 1) from customer
            left join (select o_custkey, count(*) c from orders group by 1)
            on c_custkey = o_custkey""").fetchall()
    }
    assert got == want
