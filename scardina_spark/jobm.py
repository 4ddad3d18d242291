"""Job-m-shape benchmark: multi-fact chains and parallel FK edges.

The reference ships ``benchmarks/imdb/job-m.csv`` (113 queries) whose
distinguishing shapes are (a) several fact tables joined through shared
dimensions and (b) tables reaching the same parent through different FK
columns — the parallel-edge case its subschema derivation expands with a
cartesian product (reference scardina/schema.py:117, benchmark load
run.py:791-794).  The driver's testdata has one fact table, so this
module *derives* a second one deterministically and generates the same
shape of suite with exact DuckDB truths:

``shipments`` — 2 rows per order, FK ``sh_orderkey`` → orders plus TWO
parallel FKs ``sh_from_suppkey`` / ``sh_carrier_suppkey`` → supplier.
Every column is a pure hash of the row id (xxhash64 with distinct
salts), so the table is byte-deterministic given (sf, rows_per_order)
and never needs to ship: any environment regenerates the identical
parquet, and the committed job-m CSV truths stay valid.

Scale note: derivation is a single ``spark.range`` projection — no
shuffle, no driver data; the only cluster metadata needed is the three
referenced tables' key counts (keys are contiguous 0..n-1 in the
testdata, asserted here).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import PKS, TPCH_RELATIONSHIPS, load_tables
from .schema import SchemaGraph

SHIPMENTS_RELATIONSHIPS = [
    ("orders", "o_orderkey", "shipments", "sh_orderkey"),
    ("supplier", "s_suppkey", "shipments", "sh_from_suppkey"),
    ("supplier", "s_suppkey", "shipments", "sh_carrier_suppkey"),
]

_MODES = ["AIR", "RAIL", "SHIP", "TRUCK", "PIPELINE"]

# jm HT sample clamp.  The jm suite has small-truth chain queries
# (multi-fact l-o-h-u shapes, truths in the hundreds at sf0.1) whose HT
# tail is pure small-count variance: at 100k the r04 bench recorded
# max q-error 1.30 on jm_l_o_h_u_1; doubling the clamp brought the
# measured sf0.1 tail to <=1.06 (error ~ 1/sqrt(n)) at +3ms/q estimate
# latency.  Still constant-size wrt data scale (the sample, not the
# data, bounds estimator memory).
JM_HT_N_MAX = 200_000


def variant_schema(drop_fk_cols: str | list[str],
                   sizes: dict[str, int] | None = None,
                   name: str | None = None) -> SchemaGraph:
    """The job-m schema minus the named FK edges — the per-alternative
    graph a UR spanning tree is taken over.  A tree keeps at most one
    edge between the same table pair, and BFS breaks the
    lineitem-supplier-shipments-orders cycle arbitrarily, so the jm
    variants drop (a) one parallel supplier edge and (b) the
    ``l_suppkey`` edge, forcing lineitem to attach through orders (the
    multi-fact chain the suite queries use)."""
    if isinstance(drop_fk_cols, str):
        drop_fk_cols = [drop_fk_cols]
    sg = SchemaGraph(name or f"jobm_no_{'_'.join(drop_fk_cols)}")
    pks = dict(PKS, shipments="sh_shipkey")
    from .catalog import RELATIONAL_TABLES
    for t in [*RELATIONAL_TABLES, "shipments"]:
        sg.add_table(t, size=(sizes or {}).get(t), pk=pks.get(t))
    for pk_t, pk_c, fk_t, fk_c in [*TPCH_RELATIONSHIPS,
                                   *SHIPMENTS_RELATIONSHIPS]:
        if fk_c not in drop_fk_cols:
            sg.add_relationship(pk_t, pk_c, fk_t, fk_c)
    return sg


def build_jobm_schema(sizes: dict[str, int] | None = None) -> SchemaGraph:
    """TPC-H star schema + the shipments fact table (two parallel edges
    into supplier) — the full graph (nothing dropped)."""
    return variant_schema([], sizes, name="jobm")


def jm_sample_trees():
    """The two UR spanning trees (one per parallel-edge alternative) that
    together cover every job_m_suite query: rooted at shipments so BOTH
    its join edges stay in the tree, lineitem attached through orders."""
    from .estimators.sample import spanning_tree

    t_from = spanning_tree(
        variant_schema(["sh_carrier_suppkey", "l_suppkey"]), "shipments")
    t_carrier = spanning_tree(
        variant_schema(["sh_from_suppkey", "l_suppkey"]), "shipments")
    return t_from, t_carrier


def shipments_dir(sf_dir: str) -> str:
    """Deterministic per-sf cache location for the derived table (the
    testdata dir itself is read-only)."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"scardina_jobm_{tag}")


def derive_shipments(spark: SparkSession, sf_dir: str,
                     out_dir: str | None = None,
                     rows_per_order: int = 2) -> str:
    """Materialize the derived shipments parquet for ``sf_dir``; returns
    the path.  The cache file name carries ``rows_per_order`` so a
    non-default derivation never aliases the default one; the cache is
    keyed by the sf_dir PATH, so regenerating the testdata in place
    requires clearing the tmp cache dir (the derivation is otherwise
    deterministic, so a cached copy is always valid).

    Requires contiguous 0..n-1 keys in orders/supplier (asserted) —
    the hashed FKs index into [0, n) directly."""
    out_dir = out_dir or shipments_dir(sf_dir)
    fname = ("shipments.parquet" if rows_per_order == 2
             else f"shipments_rpo{rows_per_order}.parquet")
    path = os.path.join(out_dir, fname)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from .catalog import load_table

    orders_keys = load_table(spark, sf_dir, "orders").agg(
        F.count("*").alias("n"), F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi")).first()
    supp_keys = load_table(spark, sf_dir, "supplier").agg(
        F.count("*").alias("n"), F.min("s_suppkey").alias("lo"),
        F.max("s_suppkey").alias("hi")).first()
    for label, r in [("orders.o_orderkey", orders_keys),
                     ("supplier.s_suppkey", supp_keys)]:
        if r["n"] == 0 or r["lo"] != 0 or r["hi"] != r["n"] - 1:
            raise ValueError(
                f"derive_shipments needs contiguous 0..n-1 keys in "
                f"{label}; got min={r['lo']} max={r['hi']} n={r['n']} — "
                f"sparse keys would create dangling FKs")
    n_orders = int(orders_keys["n"])
    n_supp = int(supp_keys["n"])
    n = rows_per_order * n_orders

    def h(salt: int) -> F.Column:
        return F.abs(F.xxhash64(F.col("id"), F.lit(salt)))

    df = spark.range(n).select(
        F.col("id").alias("sh_shipkey"),
        F.pmod(h(1), F.lit(n_orders)).cast("long").alias("sh_orderkey"),
        F.pmod(h(2), F.lit(n_supp)).cast("long").alias("sh_from_suppkey"),
        F.pmod(h(3), F.lit(n_supp)).cast("long").alias("sh_carrier_suppkey"),
        F.element_at(F.array(*[F.lit(m) for m in _MODES]),
                     (F.pmod(h(4), F.lit(len(_MODES))) + 1).cast("int"))
        .alias("sh_mode"),
        (F.pmod(h(5), F.lit(99000)) / 100.0 + 10.0).alias("sh_cost"),
        F.to_timestamp(F.date_add(
            F.to_date(F.lit("1995-01-01")),
            F.pmod(h(6), F.lit(2400)).cast("int"))).alias("sh_shipdate"),
    )
    df.write.mode("overwrite").parquet(path)
    return path


def load_jobm_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All relational testdata tables plus the derived shipments table."""
    tables = load_tables(spark, sf_dir)
    path = derive_shipments(spark, sf_dir)
    tables["shipments"] = spark.read.parquet(path)
    return tables


def jobm_duckdb_connection(sf_dir: str):
    """DuckDB oracle with the base views plus shipments."""
    from .benchmarks import duckdb_connection

    con = duckdb_connection(sf_dir)
    path = os.path.join(shipments_dir(sf_dir), "shipments.parquet")
    con.execute(
        f"CREATE VIEW shipments AS SELECT * FROM '{path}/*.parquet'")
    return con


# --- suite generation -----------------------------------------------------

# alias -> table; u and v are the two supplier ROLES (never in the same
# query: the sample estimators reject relational self-joins, matching the
# reference's single-alias-per-table queries)
_TABLE = {"h": "shipments", "l": "lineitem", "o": "orders", "c": "customer",
          "u": "supplier", "v": "supplier", "n": "nation", "r": "region"}

_JOIN = {
    ("h", "o"): "h.sh_orderkey = o.o_orderkey",
    ("h", "u"): "h.sh_from_suppkey = u.s_suppkey",
    ("h", "v"): "h.sh_carrier_suppkey = v.s_suppkey",
    ("l", "o"): "l.l_orderkey = o.o_orderkey",
    ("o", "c"): "o.o_custkey = c.c_custkey",
    ("u", "n"): "u.s_nationkey = n.n_nationkey",
    ("v", "n"): "v.s_nationkey = n.n_nationkey",
    ("n", "r"): "n.n_regionkey = r.r_regionkey",
}

# job-m shapes: shipments chains, parallel-edge alternatives (u vs v),
# and multi-fact chains (lineitem + shipments through orders)
TEMPLATES: list[tuple[str, ...]] = [
    ("h",),
    ("h", "o"),
    ("h", "u"),
    ("h", "v"),
    ("h", "o", "c"),
    ("h", "u", "n"),
    ("h", "v", "n"),
    ("h", "u", "n", "r"),
    ("l", "o", "h"),
    ("l", "o", "h", "c"),
    ("l", "o", "h", "u"),
]


def _pred(alias: str, rng: random.Random) -> str:
    a = alias
    t = _TABLE[alias]
    if t == "shipments":
        return rng.choice([
            lambda: f"{a}.sh_mode = '{rng.choice(_MODES)}'",
            lambda: f"{a}.sh_mode IN ({', '.join(repr(m) for m in rng.sample(_MODES, 2))})",
            lambda: f"{a}.sh_cost {rng.choice(['<', '>', '<=', '>='])} {rng.choice([100, 250, 500, 750, 900])}",
            lambda: (f"{a}.sh_shipdate {rng.choice(['<', '>', '>=', '<='])} "
                     f"'{rng.randint(1995, 2001)}-{rng.randint(1, 12):02d}-"
                     f"{rng.randint(1, 28):02d}'"),
        ])()
    if t == "supplier":
        return rng.choice([
            lambda: f"{a}.s_acctbal {rng.choice(['<', '<=', '>', '>='])} {rng.choice([0, 2500, 5000, 7500])}",
            lambda: f"{a}.s_nationkey {rng.choice(['=', '<', '>='])} {rng.randint(0, 24)}",
        ])()
    from .benchmarks import _pool

    # _pool resolves the table through its own single-letter alias map,
    # which agrees with ours for l/o/c/n/r
    return _pool(a, rng)


def job_m_suite(n_per_template: int = 5, seed: int = 4113) -> dict[str, str]:
    """Deterministic ~50-query COUNT(*) suite in the job-m shape."""
    rng = random.Random(seed)
    out: dict[str, str] = {}
    seen: set[str] = set()
    for tpl in TEMPLATES:
        joins = [sql for pair, sql in _JOIN.items()
                 if pair[0] in tpl and pair[1] in tpl]
        frm = ", ".join(f"{_TABLE[a]} {a}" for a in tpl)
        for k in range(n_per_template):
            lo = 1 if len(tpl) == 1 else 0
            n_preds = rng.randint(lo, 3)
            preds, used = [], set()
            for _ in range(n_preds):
                a = rng.choice(tpl)
                p = _pred(a, rng)
                col = p.split()[0]
                if col in used:
                    continue
                used.add(col)
                preds.append(p)
            where = " AND ".join(joins + preds)
            sql = f"SELECT COUNT(*) FROM {frm}"
            if where:
                sql += f" WHERE {where}"
            if sql in seen:
                continue
            seen.add(sql)
            out[f"jm_{'_'.join(tpl)}_{k}"] = sql
    return out


def jobm_duckdb_truths(sf_dir: str, suite: dict[str, str]
                       ) -> dict[str, float]:
    con = jobm_duckdb_connection(sf_dir)
    return {name: float(con.sql(sql).fetchone()[0])
            for name, sql in suite.items()}


# the shipments CIN subschema's model columns (both parallel-edge
# alternatives share them; the supplier columns bind to whichever FK the
# subschema materializes)
JM_CIN_SH_COLUMNS = [
    "shipments.sh_mode", "shipments.sh_cost", "shipments.sh_shipdate",
    "orders.o_orderstatus", "orders.o_orderpriority",
    "orders.o_orderdate", "orders.o_totalprice",
    "supplier.s_nationkey", "supplier.s_acctbal",
]


# model column sets for the jm estimators (same convention as
# benchmarks.UR_MODEL_COLUMNS / CIN_MODEL_COLUMNS)
JM_UR_MODEL_COLUMNS = [
    "shipments.sh_mode", "shipments.sh_cost", "shipments.sh_shipdate",
    "lineitem.l_quantity", "lineitem.l_discount", "lineitem.l_returnflag",
    "lineitem.l_linestatus", "lineitem.l_shipdate",
    "lineitem.l_extendedprice", "lineitem.l_tax",
    "orders.o_orderstatus", "orders.o_orderpriority",
    "orders.o_orderdate", "orders.o_totalprice",
    "customer.c_mktsegment", "customer.c_nationkey",
    "customer.c_name", "customer.c_acctbal",
    "supplier.s_nationkey", "supplier.s_acctbal",
    "nation.n_name", "region.r_name",
]
