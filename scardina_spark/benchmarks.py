"""JOB-light-style benchmark suite over the synthetic star schema.

The reference ships fixed golden query sets (benchmarks/imdb/job-light.csv,
70 queries; job-m.csv, 113 — scardina/run.py:791-794, README.md:86-91) of
``SELECT COUNT(*)`` over PK-FK join chains with 0-4 simple predicates.
There is no IMDB here, so this module *generates* the same shape of suite
over the driver's TPC-H-ish star schema, deterministically (fixed seed →
byte-identical suite every run), and computes exact truths with DuckDB on
the same parquet files instead of shipping golden numbers.

Join templates are connected subtrees of the UR spanning tree rooted at
``lineitem`` (the fact table), mirroring job-light's star chains around
``title``.  Predicates draw from per-table pools covering every operator
class the front-end supports: ``= != < <= > >= IN BETWEEN LIKE IS NOT
NULL`` over numeric, string, and datetime columns.
"""

from __future__ import annotations

import random

# alias -> table, plus the join edges (all UR-tree edges) used by each
# template.  Aliases are stable single letters.
_JOIN = {
    ("l", "o"): "l.l_orderkey = o.o_orderkey",
    ("o", "c"): "o.o_custkey = c.c_custkey",
    ("l", "s"): "l.l_suppkey = s.s_suppkey",
    ("l", "p"): "l.l_partkey = p.p_partkey",
    ("s", "n"): "s.s_nationkey = n.n_nationkey",
    ("n", "r"): "n.n_regionkey = r.r_regionkey",
}
_TABLE = {"l": "lineitem", "o": "orders", "c": "customer", "s": "supplier",
          "p": "part", "n": "nation", "r": "region"}

TEMPLATES: list[tuple[str, ...]] = [
    ("l",), ("o",), ("c",), ("p",),
    ("l", "o"), ("o", "c"), ("l", "s"), ("l", "p"),
    ("l", "o", "c"), ("l", "s", "n"), ("l", "o", "p"),
    ("l", "o", "c", "p"), ("l", "s", "n", "r"),
    ("l", "o", "c", "s", "p"),
]

_SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_CMP = ["<", "<=", ">", ">="]


def _dt(rng: random.Random) -> str:
    return f"{rng.randint(1995, 2001)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"


def _pool(alias: str, rng: random.Random) -> str:
    """One random predicate (SQL text) for the aliased table."""
    a = alias
    t = _TABLE[alias]
    if t == "lineitem":
        return rng.choice([
            lambda: f"{a}.l_quantity {rng.choice(_CMP + ['=', '!='])} {rng.randint(2, 49)}",
            lambda: f"{a}.l_quantity BETWEEN {rng.randint(1, 20)} AND {rng.randint(25, 50)}",
            lambda: f"{a}.l_discount {rng.choice(['<', '>'])} 0.0{rng.randint(1, 9)}",
            lambda: f"{a}.l_returnflag = '{rng.choice('ANR')}'",
            lambda: f"{a}.l_returnflag IN ({', '.join(repr(v) for v in rng.sample(['A', 'N', 'R'], 2))})",
            lambda: f"{a}.l_linestatus = '{rng.choice('OF')}'",
            lambda: f"{a}.l_tax {rng.choice(['<', '>='])} 0.0{rng.randint(1, 7)}",
            lambda: f"{a}.l_extendedprice {rng.choice(['<', '>'])} {rng.choice([5000, 20000, 40000, 60000])}",
            lambda: f"{a}.l_shipdate {rng.choice(['<', '>', '>=', '<='])} '{_dt(rng)}'",
        ])()
    if t == "orders":
        return rng.choice([
            lambda: f"{a}.o_orderstatus = '{rng.choice('POF')}'",
            lambda: f"{a}.o_orderpriority = '{rng.choice(_PRIOS)}'",
            lambda: f"{a}.o_orderpriority LIKE '%{rng.choice(['URGENT', 'HIGH', 'LOW', 'MEDIUM'])}'",
            lambda: f"{a}.o_orderpriority IN ({', '.join(repr(v) for v in rng.sample(_PRIOS, 2))})",
            lambda: f"{a}.o_totalprice {rng.choice(['<', '>'])} {rng.choice([50000, 100000, 200000, 300000])}",
            lambda: f"{a}.o_orderdate {rng.choice(['<', '>', '>='])} '{_dt(rng)}'",
        ])()
    if t == "customer":
        return rng.choice([
            lambda: f"{a}.c_mktsegment = '{rng.choice(_SEGMENTS)}'",
            lambda: f"{a}.c_mktsegment IN ({', '.join(repr(v) for v in rng.sample(_SEGMENTS, 2))})",
            lambda: f"{a}.c_acctbal {rng.choice(_CMP)} {rng.choice([0, 2500, 5000, 7500])}",
            lambda: f"{a}.c_nationkey = {rng.randint(0, 24)}",
            lambda: f"{a}.c_name IS NOT NULL",
        ])()
    if t == "supplier":
        return rng.choice([
            lambda: f"{a}.s_acctbal {rng.choice(_CMP)} {rng.choice([0, 2500, 5000, 7500])}",
            lambda: f"{a}.s_nationkey {rng.choice(['=', '<', '>='])} {rng.randint(0, 24)}",
        ])()
    if t == "part":
        return rng.choice([
            lambda: f"{a}.p_brand = 'Brand#{rng.randint(1, 25)}'",
            lambda: f"{a}.p_size {rng.choice(_CMP)} {rng.randint(1, 50)}",
            lambda: f"{a}.p_size BETWEEN {rng.randint(1, 20)} AND {rng.randint(25, 50)}",
            lambda: f"{a}.p_retailprice {rng.choice(['<', '>'])} {rng.randint(920, 990)}",
        ])()
    if t == "nation":
        return f"{a}.n_name = 'NATION_{rng.randint(0, 24)}'"
    return f"{a}.r_name = '{rng.choice(_REGIONS)}'"


def _gen_suite(templates: list[tuple[str, ...]], seed: int,
               n_per_template: int, key_fn, pred_range_fn
               ) -> dict[str, str]:
    """Shared deterministic COUNT(*) suite generator.  ``key_fn(tpl, k)``
    names each query; ``pred_range_fn(tpl)`` gives the (lo, hi) predicate
    count range.  Duplicate-column predicate draws are dropped (not
    redrawn) and duplicate whole queries skipped — both keep the RNG call
    sequence, and therefore every generated suite, byte-stable."""
    rng = random.Random(seed)
    out: dict[str, str] = {}
    seen: set[str] = set()
    for tpl in templates:
        joins = [sql for pair, sql in _JOIN.items()
                 if pair[0] in tpl and pair[1] in tpl]
        frm = ", ".join(f"{_TABLE[a]} {a}" for a in tpl)
        for k in range(n_per_template):
            lo, hi = pred_range_fn(tpl)
            n_preds = rng.randint(lo, hi)
            preds: list[str] = []
            used: set[str] = set()
            for _ in range(n_preds):
                a = rng.choice(tpl)
                p = _pool(a, rng)
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
            out[key_fn(tpl, k)] = sql
    return out


def job_light_suite(n_per_template: int = 6, seed: int = 2026
                    ) -> dict[str, str]:
    """Deterministic suite of ~70-84 COUNT(*) queries (job-light shape).

    1-3 predicates for single tables; 0-3 for joins (a 0-predicate join
    query measures pure join-size estimation)."""
    return _gen_suite(
        TEMPLATES, seed, n_per_template,
        key_fn=lambda tpl, k: f"jl_{'_'.join(tpl)}_{k}",
        pred_range_fn=lambda tpl: (1 if len(tpl) == 1 else 0, 3))


EXT_TEMPLATES: list[tuple[str, ...]] = [
    ("l", "o", "c", "s", "p"), ("l", "o", "s", "n", "r"),
    ("l", "o", "c", "s", "n"), ("l", "o", "c", "s", "p", "n"),
    ("l", "o", "s", "p", "n", "r"), ("l", "o", "c", "s", "p", "n", "r"),
]


def perror_suite(n_per_template: int = 6, seed: int = 416
                 ) -> dict[str, str]:
    """Deterministic suite of 5-7-table queries over the full join tree —
    the plan-quality (p-error) benchmark.  The jl suite's <=5-table star
    queries have a plan space too forgiving to discriminate (measured:
    even the textbook System-R heuristic baseline never flips a plan on
    them); at 6-7 tables the left-deep space is large enough that
    mis-estimates change the chosen join order.  Same predicate pools as
    job_light_suite, so the learned estimators' model columns cover
    every query."""
    return _gen_suite(
        EXT_TEMPLATES, seed, n_per_template,
        key_fn=lambda tpl, k: f"px_{len(tpl)}t_{'_'.join(tpl)}_{k}",
        pred_range_fn=lambda tpl: (1, 4))


def or_suite(n_per_template: int = 4, seed: int = 922) -> dict[str, str]:
    """Deterministic suite of disjunctive COUNT(*) queries — the OR
    extension of the query language (beyond the reference's AND-only
    grammar).  Each query carries one parenthesized OR group (two pool
    predicates of the same template, same- or cross-table) plus an
    optional plain conjunct."""
    rng = random.Random(seed)
    out: dict[str, str] = {}
    templates = [("l",), ("o",), ("l", "o"), ("l", "o", "c"),
                 ("l", "s", "n")]
    for tpl in templates:
        joins = [sql for pair, sql in _JOIN.items()
                 if pair[0] in tpl and pair[1] in tpl]
        frm = ", ".join(f"{_TABLE[a]} {a}" for a in tpl)
        for k in range(n_per_template):
            b1 = _pool(rng.choice(tpl), rng)
            b2 = _pool(rng.choice(tpl), rng)
            conds = list(joins) + [f"({b1} OR {b2})"]
            if rng.random() < 0.5:
                conds.append(_pool(rng.choice(tpl), rng))
            sql = (f"SELECT COUNT(*) FROM {frm} "
                   f"WHERE {' AND '.join(conds)}")
            out[f"or_{'_'.join(tpl)}_{k}"] = sql
    return out


def duckdb_connection(sf_dir: str):
    """One DuckDB connection with every testdata table as a view — the
    exact-count oracle used for truths and plan-cost evaluation."""
    import duckdb

    con = duckdb.connect()
    for t in sorted(set(_TABLE.values())):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    return con


def duckdb_truths(sf_dir: str, suite: dict[str, str]) -> dict[str, float]:
    """Exact truth per query via DuckDB over the same parquet files (the
    same oracle the driver's correctness gate uses)."""
    con = duckdb_connection(sf_dir)
    return {name: float(con.sql(sql).fetchone()[0])
            for name, sql in suite.items()}


# Canonical model column sets for the learned estimators: every predicate
# column the suite generator can emit, per mode.  bench.py and the CLI
# share these so "the benchmark config" is one definition.

UR_MODEL_COLUMNS = [
    "lineitem.l_quantity", "lineitem.l_discount", "lineitem.l_tax",
    "lineitem.l_returnflag", "lineitem.l_linestatus",
    "lineitem.l_shipdate", "lineitem.l_extendedprice",
    "orders.o_orderstatus", "orders.o_orderpriority",
    "orders.o_orderdate", "orders.o_totalprice",
    "customer.c_mktsegment", "customer.c_nationkey",
    "customer.c_name", "customer.c_acctbal",
    "supplier.s_nationkey", "supplier.s_acctbal",
    "part.p_brand", "part.p_size", "part.p_retailprice",
    "nation.n_name", "region.r_name",
]

CIN_MODEL_COLUMNS = {
    "lineitem": ["lineitem.l_quantity", "lineitem.l_discount",
                 "lineitem.l_tax", "lineitem.l_returnflag",
                 "lineitem.l_linestatus", "lineitem.l_shipdate",
                 "lineitem.l_extendedprice",
                 "orders.o_orderstatus", "orders.o_orderpriority",
                 "orders.o_orderdate", "orders.o_totalprice",
                 "part.p_brand", "part.p_size", "part.p_retailprice",
                 "supplier.s_nationkey", "supplier.s_acctbal"],
    "orders": ["orders.o_orderstatus", "orders.o_orderpriority",
               "orders.o_orderdate", "orders.o_totalprice",
               "customer.c_mktsegment", "customer.c_nationkey",
               "customer.c_name", "customer.c_acctbal"],
    "customer": ["customer.c_mktsegment", "customer.c_nationkey",
                 "customer.c_name", "customer.c_acctbal", "nation.n_name"],
    "supplier": ["supplier.s_nationkey", "supplier.s_acctbal",
                 "nation.n_name"],
    "nation": ["nation.n_name", "region.r_name"],
}
