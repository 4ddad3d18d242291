"""SQL front-end for the reference's query language: conjunctive
``SELECT COUNT(*)`` with equi-joins and AND-only predicates.

Reference semantics (NOT code): scardina/parse.py:72-166 + run.py:796-917 —
alias resolution, conjunct splitting on AND, join-vs-filter detection,
BETWEEN pairing, IS NOT NULL rewriting, literal typing.  The reference
drives sqlparse token surgery; no sqlparse here, a small scanner is enough
for the grammar (and hand-rolling it removes the dependency).

Grammar accepted::

    SELECT COUNT(*) FROM t1 [AS] a [, t2 [AS] b ...]
    [WHERE conj [AND conj ...]] [;]

    conj := col op literal | col IN (lit, ...) | col BETWEEN lit AND lit
          | col IS [NOT] NULL | col [NOT] LIKE 'pat' | col = col (join)
          | ( conj OR conj [OR conj ...] )     -- beyond the reference

    literal := bare | TIMESTAMP 'v' | DATE 'v' | 'v'::timestamp | 'v'::date
               -- explicit datetime forms per the reference's grammar
               -- (scardina/parse.py:120-124); bare date-looking strings
               -- are also typed by value

Parenthesized OR groups (no joins inside, no nesting) extend the
reference's AND-only language; every estimator either supports them or
rejects with UnsupportedQueryError (see each estimator's scope).

Output is the 6-tuple-equivalent ``ParsedQuery`` (cols/ops/vals live in
``filters``; equi-join pairs in ``joins``; alias->table in ``tables``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from .predicates import Predicate, literal_value

_TOKEN = re.compile(
    r"""
    \s*(
        '(?:[^']|'')*'            # single-quoted string
      | "(?:[^"]|"")*"            # double-quoted string
      | [A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)*   # identifier / dotted ref
      | -?\d+\.\d+ | -?\.\d+ | -?\d+   # no arithmetic in the grammar, so a
                                       # leading '-' is always a sign    # numbers
      | >= | <= | != | <> | = | > | <
      | :: | \( | \) | , | \*
      | ;
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL", "LIKE",
             "SELECT", "FROM", "WHERE", "AS", "COUNT", "TIMESTAMP",
             "DATE"}


def _tokenize(s: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos].isspace():
                pos += 1
                continue
            raise ValueError(f"cannot tokenize at: {s[pos:pos+20]!r}")
        toks.append(m.group(1))
        pos = m.end()
    return toks


def _is_kw(tok: str, kw: str) -> bool:
    return tok.upper() == kw


def _is_column_ref(tok: str) -> bool:
    return bool(re.fullmatch(r"[A-Za-z_][\w$]*(\.[A-Za-z_][\w$]*)?", tok)) \
        and tok.upper() not in _KEYWORDS


@dataclass
class ParsedQuery:
    tables: dict[str, str]            # alias -> table name
    joins: list[tuple[str, str]]      # (a.col, b.col) both alias-qualified
    filters: list[Predicate]          # alias-qualified predicates
    sql: str = ""
    extras: dict[str, Any] = field(default_factory=dict)

    @property
    def table_names(self) -> set[str]:
        return set(self.tables.values())


def parse_query(sql: str) -> ParsedQuery:
    toks = _tokenize(sql)
    up = [t.upper() for t in toks]
    try:
        i_from = up.index("FROM")
    except ValueError:
        raise ValueError("query must have FROM") from None
    i_where = up.index("WHERE") if "WHERE" in up else len(toks)

    # FROM list
    tables: dict[str, str] = {}
    i = i_from + 1
    while i < i_where:
        t = toks[i]
        if t == ",":
            i += 1
            continue
        if t == ";":
            break
        name = t
        alias = t
        j = i + 1
        if j < i_where and _is_kw(toks[j], "AS"):
            j += 1
        if j < i_where and toks[j] not in (",", ";") and _is_column_ref(toks[j]):
            alias = toks[j]
            j += 1
        tables[alias] = name
        i = j

    joins: list[tuple[str, str]] = []
    filters: list[Predicate] = []

    def qualify(col: str) -> str:
        if "." in col:
            alias = col.split(".", 1)[0]
            if alias not in tables:
                raise ValueError(f"unknown alias in {col!r}")
            return col
        if len(tables) == 1:
            return f"{next(iter(tables))}.{col}"
        return col  # bare column in multi-table query: left unqualified

    i = i_where + 1
    n = len(toks)
    try:
        return _parse_where(toks, i, n, tables, joins, filters, qualify, sql)
    except IndexError:
        raise ValueError(f"truncated WHERE clause in: {sql!r}") from None


_CAST_TYPES = {"TIMESTAMP", "DATE"}


def _coerce_datetime(tok: str) -> Any:
    from .predicates import parse_datetime
    dt = parse_datetime(tok.strip().strip("'\""))
    if dt is None:
        raise ValueError(f"cannot parse datetime literal {tok!r}")
    return dt


def _literal_at(toks, i, n):
    """Type the literal starting at ``toks[i]``, consuming explicit
    datetime syntax around it; returns ``(value, next_i)``.  Two forms
    beyond the bare literal, both from the reference's grammar
    (scardina/parse.py:120-124: ``'...'::timestamp`` cast identifiers;
    run.py:863-867: typed date values):

    * ANSI prefix —  ``TIMESTAMP '2000-01-01 00:00:00'`` / ``DATE '...'``
    * Postgres cast — ``'2000-01-01 00:00:00'::timestamp``
    """
    tok = toks[i]
    if tok.upper() in _CAST_TYPES and i + 1 < n \
            and toks[i + 1].startswith("'"):
        return _coerce_datetime(toks[i + 1]), i + 2
    v = literal_value(tok)
    i += 1
    if i < n and toks[i] == "::":
        if i + 1 >= n or toks[i + 1].upper() not in _CAST_TYPES:
            raise ValueError(
                "only ::timestamp / ::date casts are supported")
        v = v if hasattr(v, "year") else _coerce_datetime(tok)
        i += 2
    return v, i


def _parse_conjunct(toks, i, n, qualify):
    """Parse one simple predicate or join condition starting at ``toks[i]``.
    Returns ``(kind, payload, i)`` where kind is ``"join"`` (payload =
    (lhs, rhs)) or ``"pred"`` (payload = Predicate)."""
    col = toks[i]
    if not _is_column_ref(col):
        raise ValueError(f"expected column ref, got {col!r}")
    i += 1
    op = toks[i].upper() if i < n else None

    if op in (">", "<", ">=", "<=", "=", "!=", "<>"):
        i += 1
        rhs = toks[i]
        if op == "=" and _is_column_ref(rhs) and "." in rhs and "." in col:
            return "join", (qualify(col), qualify(rhs)), i + 1
        v, i = _literal_at(toks, i, n)
        return "pred", Predicate(qualify(col), op, v), i
    if op == "IN":
        i += 1
        if toks[i] != "(":
            raise ValueError("IN requires a parenthesized list")
        i += 1
        vals = []
        while toks[i] != ")":
            if toks[i] == ",":
                i += 1
                continue
            v, i = _literal_at(toks, i, n)
            vals.append(v)
        i += 1
        return "pred", Predicate(qualify(col), "IN", tuple(vals)), i
    if op == "BETWEEN":
        i += 1
        lo, i = _literal_at(toks, i, n)
        if not _is_kw(toks[i], "AND"):
            raise ValueError("BETWEEN requires AND")
        i += 1
        hi, i = _literal_at(toks, i, n)
        return "pred", Predicate(qualify(col), "BETWEEN", (lo, hi)), i
    if op == "IS":
        i += 1
        neg = False
        if _is_kw(toks[i], "NOT"):
            neg = True
            i += 1
        if not _is_kw(toks[i], "NULL"):
            raise ValueError("IS [NOT] requires NULL")
        i += 1
        return "pred", Predicate(qualify(col), "IS NOT" if neg else "IS",
                                 None), i
    if op == "NOT":
        i += 1
        if not _is_kw(toks[i], "LIKE"):
            raise ValueError("NOT must be followed by LIKE")
        i += 1
        p = Predicate(qualify(col), "NOT LIKE", literal_value(toks[i]))
        return "pred", p, i + 1
    if op == "LIKE":
        i += 1
        p = Predicate(qualify(col), "LIKE", literal_value(toks[i]))
        return "pred", p, i + 1
    raise ValueError(f"unsupported op {op!r} after {col!r}")


def _parse_where(toks, i, n, tables, joins, filters, qualify, sql):
    from .predicates import or_predicate

    while i < n and toks[i] != ";":
        if _is_kw(toks[i], "AND"):
            i += 1
            continue
        if _is_kw(toks[i], "OR"):
            raise ValueError(
                "top-level OR is not supported; parenthesize the "
                "disjunction: (a = 1 OR a = 2)")
        if toks[i] == "(":
            # disjunction group: ( pred OR pred [OR pred ...] )  — beyond
            # the reference's AND-only grammar (scardina/run.py:796-917)
            i += 1
            branches = []
            while True:
                kind, payload, i = _parse_conjunct(toks, i, n, qualify)
                if kind == "join":
                    raise ValueError(
                        "join conditions are not allowed inside an OR group")
                branches.append(payload)
                if i < n and _is_kw(toks[i], "OR"):
                    i += 1
                    continue
                if i < n and toks[i] == ")":
                    i += 1
                    break
                if i < n and _is_kw(toks[i], "AND"):
                    raise ValueError(
                        "parenthesized groups support OR only")
                raise ValueError("unterminated parenthesized group")
            filters.append(or_predicate(branches))
            continue
        kind, payload, i = _parse_conjunct(toks, i, n, qualify)
        if kind == "join":
            joins.append(payload)
        else:
            filters.append(payload)

    return ParsedQuery(tables=tables, joins=joins, filters=filters, sql=sql)
