"""Gopher quality-filter rule battery (Rae et al., "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", 2021 —
Appendix A1.1): the standard doc-level heuristic gate most LLM data
pipelines run before any learned filtering.  Beyond the reference
engine, first-class here like the other curation operators.

Every rule is a pure JVM column expression over one whitespace
tokenization and one line split — no shuffle, no Python, row-parallel at
any scale; the keep decision composes with `textstats`/`curate` filters.
Thresholds are the paper's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import words

# Gopher's "stop words": a document must contain at least 2
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

BULLETS = ("•", "‣", "▪", "-", "*")
ELLIPSES = ("...", "…")


def _lines(col: str) -> Column:
    return F.filter(F.split(F.coalesce(F.col(col), F.lit("")), "\n"),
                    lambda x: F.trim(x) != "")


def gopher_flags(col: str = "text") -> dict[str, Column]:
    """One boolean column per Gopher rule (True = passes).  NULL text
    normalizes to the empty document (the curation-wide convention), so
    every flag is a real boolean, never NULL."""
    txt0 = F.coalesce(F.col(col), F.lit(""))
    ws = F.filter(F.split(txt0, "\\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(ws)
    lines = _lines(col)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_len = (F.aggregate(ws, F.lit(0).cast("long"),
                            lambda acc, w: acc + F.length(w))
                / F.greatest(n_words, F.lit(1)))
    # '#' characters and ellipses per word
    txt = F.coalesce(F.col(col), F.lit(""))
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ell = sum(((F.length(txt)
                  - F.length(F.replace(txt, F.lit(e), F.lit(""))))
                 / F.lit(len(e)) for e in ELLIPSES), F.lit(0))
    bullet_starts = F.size(F.filter(
        lines, lambda ln: F.trim(ln).substr(1, 1).isin(*BULLETS)))
    ell_ends = F.size(F.filter(
        lines,
        lambda ln: F.trim(ln).endswith("...")
        | F.trim(ln).endswith("…")))
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    lw = F.transform(ws, lambda w: F.lower(w))
    n_stop = F.size(F.array_intersect(
        F.array_distinct(lw), F.array(*[F.lit(s) for s in STOP_WORDS])))
    return {
        "g_word_count": (n_words >= 50) & (n_words <= 100_000),
        "g_mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "g_symbol_ratio": ((n_hash + n_ell)
                           / F.greatest(n_words, F.lit(1))) <= 0.1,
        "g_bullet_lines": (bullet_starts / n_lines) <= 0.10,
        "g_ellipsis_lines": (ell_ends / n_lines) <= 0.30,
        "g_alpha_words": (alpha_words
                          / F.greatest(n_words, F.lit(1))) >= 0.80,
        "g_stop_words": n_stop >= 2,
    }


def with_gopher_flags(df: DataFrame, col: str = "text") -> DataFrame:
    """Input rows + the seven rule booleans + ``gopher_keep`` (AND of
    all rules — the paper applies them conjunctively)."""
    flags = gopher_flags(col)
    out = df
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def gopher_filter(df: DataFrame, col: str = "text") -> DataFrame:
    """Keep only documents passing every rule; input schema restored."""
    flagged = with_gopher_flags(df, col)
    return flagged.where("gopher_keep").drop(
        *gopher_flags(col).keys(), "gopher_keep")
