"""Predicate model, normalization, and lowering to Spark Columns.

Reference semantics (NOT code): scardina/common.py:635-645 (frozen predicate
tuple), scardina/estimators.py:94-116 (op table: > < >= <= = != <> IN
BETWEEN IS IS_NOT LIKE NOT_LIKE ALL_TRUE ALL_FALSE) and
scardina/estimators.py:476-549 (normalization: BETWEEN → >= AND <=,
``<>`` → ``!=``, ``= NULL`` → IS NULL, LIKE kept for dictionary
compilation).

Two consumers:
* execution on base data — ``predicates_to_column`` lowers a conjunction
  to one ``pyspark.sql.Column``, which Catalyst pushes into the parquet
  scan (predicate pushdown is the free win the reference's numpy loop
  cannot have);
* the estimator — predicates evaluated over a column's *dictionary* to
  produce valid masks (see estimators/masks.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Any

from pyspark.sql import Column, functions as F

COMPARISON_OPS = {">", "<", ">=", "<=", "=", "!=", "<>"}
ALL_OPS = COMPARISON_OPS | {
    "IN", "BETWEEN", "IS", "IS NOT", "LIKE", "NOT LIKE",
    "ALL_TRUE", "ALL_FALSE", "OR",
}


@dataclass(frozen=True)
class Predicate:
    """``c`` is ``table.column`` (or a bare column name), ``o`` an op from
    ALL_OPS, ``v`` the literal (tuple for IN/BETWEEN, None for IS [NOT]).

    ``o == "OR"`` is a disjunction group (beyond the reference's AND-only
    language, scardina/run.py:796-917): ``v`` is a tuple of simple
    Predicates (the branches) and ``c`` is the first branch's column —
    table routing must consult :func:`pred_tables`, not ``.table``."""

    c: str
    o: str
    v: Any = None

    @property
    def table(self) -> str | None:
        return self.c.split(".", 1)[0] if "." in self.c else None

    @property
    def column(self) -> str:
        return self.c.split(".", 1)[1] if "." in self.c else self.c

    @property
    def branches(self) -> tuple["Predicate", ...]:
        """The disjuncts of an OR group (``()`` for simple predicates)."""
        return tuple(self.v) if self.o.upper() == "OR" else ()


def or_predicate(branches: list["Predicate"]) -> "Predicate":
    if not branches:
        raise ValueError("OR group needs at least one branch")
    if len(branches) == 1:
        return branches[0]
    return Predicate(branches[0].c, "OR", tuple(branches))


def pred_tables(p: Predicate) -> set:
    """Table qualifiers referenced by a predicate (OR-aware)."""
    if p.o.upper() == "OR":
        return {b.table for b in p.branches}
    return {p.table}


def normalize_predicates(preds: list[Predicate]) -> list[Predicate]:
    """Driver-side rewrite mirroring the reference's estimation-domain
    normalization (scardina/estimators.py:476-549): BETWEEN splits into a
    >=/<= pair, ``<>`` becomes ``!=``, equality/inequality with NULL
    becomes IS / IS NOT NULL."""
    out: list[Predicate] = []
    for p in preds:
        o = p.o.upper()
        if o == "OR":
            # branch-local rewrites only: BETWEEN must stay a single
            # predicate inside a disjunct (splitting it would turn one
            # branch into two independently-OR'd conjuncts)
            branches = []
            for b in p.branches:
                bo = b.o.upper()
                if bo == "<>":
                    branches.append(Predicate(b.c, "!=", b.v))
                elif bo in ("=", "==") and b.v is None:
                    branches.append(Predicate(b.c, "IS", None))
                elif bo == "!=" and b.v is None:
                    branches.append(Predicate(b.c, "IS NOT", None))
                elif bo == "OR":
                    raise ValueError("nested OR groups are not supported")
                else:
                    branches.append(Predicate(b.c, bo, b.v))
            out.append(Predicate(p.c, "OR", tuple(branches)))
            continue
        if o == "BETWEEN":
            lo, hi = p.v
            out.append(Predicate(p.c, ">=", lo))
            out.append(Predicate(p.c, "<=", hi))
        elif o == "<>":
            out.append(Predicate(p.c, "!=", p.v))
        elif o in ("=", "==") and p.v is None:
            out.append(Predicate(p.c, "IS", None))
        elif o == "!=" and p.v is None:
            out.append(Predicate(p.c, "IS NOT", None))
        else:
            out.append(Predicate(p.c, o, p.v))
    return out


def _like_to_rlike(pattern: str) -> str:
    """SQL LIKE wildcards to an anchored regex (reference analog:
    scardina/estimators.py:29-40 — but lowered to Spark's native ``rlike``
    instead of a numpy fullmatch loop)."""
    import re

    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def predicate_to_column(p: Predicate, qualify: bool = False) -> Column:
    """Lower one predicate to a Spark Column over base data.  With
    ``qualify`` the prefixed sample layout (``table.column``) is used."""
    o = p.o.upper()
    if o == "OR":
        col = predicate_to_column(p.branches[0], qualify)
        for b in p.branches[1:]:
            col = col | predicate_to_column(b, qualify)
        return col
    name = p.c if qualify else p.column
    c = F.col(f"`{name}`")
    if o in (">", "<", ">=", "<="):
        return {">" : c > F.lit(p.v), "<": c < F.lit(p.v),
                ">=": c >= F.lit(p.v), "<=": c <= F.lit(p.v)}[o]
    if o in ("=", "=="):
        return c == F.lit(p.v)
    if o in ("!=", "<>"):
        return c != F.lit(p.v)
    if o == "IN":
        return c.isin(list(p.v))
    if o == "BETWEEN":
        lo, hi = p.v
        return c.between(F.lit(lo), F.lit(hi))
    if o == "IS":
        return c.isNull() if p.v is None else (c == F.lit(p.v))
    if o == "IS NOT":
        return c.isNotNull() if p.v is None else (c != F.lit(p.v))
    if o == "LIKE":
        return c.rlike(_like_to_rlike(p.v))
    if o == "NOT LIKE":
        return ~c.rlike(_like_to_rlike(p.v))
    if o == "ALL_TRUE":
        return F.lit(True)
    if o == "ALL_FALSE":
        return F.lit(False)
    raise ValueError(f"unsupported op: {p.o}")


def predicates_to_column(preds: list[Predicate], qualify: bool = False) -> Column:
    """AND-conjunction (the only connective the reference's query language
    has, scardina/run.py:796-917)."""
    if not preds:
        return F.lit(True)
    col = predicate_to_column(preds[0], qualify)
    for p in preds[1:]:
        col = col & predicate_to_column(p, qualify)
    return col


# --- SQL-string lowering -----------------------------------------------------
#
# Building a Column expression tree costs one py4j round-trip per node;
# a batched estimator aggregate over ~80 queries spent ~6 s of pure
# driver time in those round-trips while the cluster idled (guide §4 —
# the same pathology similarity._lit_vec fixed for vector literals).
# Rendering the predicate as ONE SQL string hands the whole tree to
# Catalyst's parser in a single call.  The parsed tree is
# node-for-node the tree the Column API builds (typed literals: bare
# integers, 'D'-suffixed doubles, TIMESTAMP '...' — so no
# decimal-vs-double coercion drift), pinned by
# test_predicates_sql_matches_column.


def sql_literal(v: Any) -> str:
    """Render a predicate literal so Catalyst parses it to the SAME
    typed literal ``F.lit`` would build."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        # bare integral literals parse as INT when they fit, else
        # BIGINT — the same rule F.lit applies
        return str(v)
    if isinstance(v, float):
        # shortest-repr round-trips the double exactly; the D suffix
        # pins DoubleType (a bare decimal would parse as DECIMAL)
        return repr(v) + "D"
    if isinstance(v, datetime):
        return "TIMESTAMP '" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def predicate_to_sql(p: Predicate, qualify: bool = False) -> str:
    """SQL form of :func:`predicate_to_column` — identical parsed tree."""
    o = p.o.upper()
    if o == "OR":
        return "(" + " OR ".join(
            predicate_to_sql(b, qualify) for b in p.branches) + ")"
    name = p.c if qualify else p.column
    c = f"`{name}`"
    if o in (">", "<", ">=", "<="):
        return f"({c} {o} {sql_literal(p.v)})"
    if o in ("=", "=="):
        return f"({c} = {sql_literal(p.v)})"
    if o in ("!=", "<>"):
        return f"({c} != {sql_literal(p.v)})"
    if o == "IN":
        return f"({c} IN (" + ", ".join(
            sql_literal(x) for x in p.v) + "))"
    if o == "BETWEEN":
        lo, hi = p.v
        return (f"({c} BETWEEN {sql_literal(lo)}"
                f" AND {sql_literal(hi)})")
    if o == "IS":
        return (f"({c} IS NULL)" if p.v is None
                else f"({c} = {sql_literal(p.v)})")
    if o == "IS NOT":
        return (f"({c} IS NOT NULL)" if p.v is None
                else f"({c} != {sql_literal(p.v)})")
    if o == "LIKE":
        return f"({c} RLIKE {sql_literal(_like_to_rlike(p.v))})"
    if o == "NOT LIKE":
        return f"(NOT ({c} RLIKE {sql_literal(_like_to_rlike(p.v))}))"
    if o == "ALL_TRUE":
        return "TRUE"
    if o == "ALL_FALSE":
        return "FALSE"
    raise ValueError(f"unsupported op: {p.o}")


def predicates_to_sql(preds: list[Predicate], qualify: bool = False) -> str:
    """SQL form of :func:`predicates_to_column` (left-associated AND,
    matching the Column API's fold order)."""
    if not preds:
        return "TRUE"
    return " AND ".join(predicate_to_sql(p, qualify) for p in preds)


def parse_datetime(s: str) -> datetime | None:
    """``datetime`` from an ISO date(time) string, or ``None`` — the ONE
    format list shared by bare literals and the explicit
    ``TIMESTAMP '...'`` / ``::timestamp`` grammar in plans/parse.py, so
    the two forms can never diverge on what parses."""
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            pass
    return None


def literal_value(tok: str) -> Any:
    """Type a SQL literal token: int, float, ISO date(time), NULL, or
    string.  Datetime literals follow the reference's convention of parsing
    date-looking strings (scardina/run.py:863-867) but detect by value, not
    by column name."""
    t = tok.strip()
    if t.upper() == "NULL":
        return None
    if (t.startswith("'") and t.endswith("'")) or (
            t.startswith('"') and t.endswith('"')):
        s = t[1:-1]
        dt = parse_datetime(s)
        if dt is not None:
            return dt
        return s
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        pass
    return t
