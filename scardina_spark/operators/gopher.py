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

# Gopher's "stop words": a document must contain at least 2.  The
# paper's set is the default; callers curating a corpus whose function
# words differ (another language, synthetic vocabularies) pass their
# own via the ``stop_words`` parameter — the rule is "contains >=2
# distinct function words of ITS language", not these 8 literals.
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

BULLETS = ("•", "‣", "▪", "-", "*")
ELLIPSES = ("...", "…")


def _lines(col: str) -> Column:
    return F.filter(F.split(F.coalesce(F.col(col), F.lit("")), "\n"),
                    lambda x: F.trim(x) != "")


def gopher_flags(col: str = "text",
                 stop_words: tuple[str, ...] = STOP_WORDS
                 ) -> dict[str, Column]:
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
        F.array_distinct(lw), F.array(*[F.lit(s) for s in stop_words])))
    return {
        "g_word_count": (n_words >= 50) & (n_words <= 100_000),
        "g_mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "g_symbol_ratio": ((n_hash + n_ell)
                           / F.greatest(n_words, F.lit(1))) <= 0.1,
        # the paper drops docs with MORE than 90% bullet lines
        # (list-bearing pages are normal; near-total bullets are not)
        "g_bullet_lines": (bullet_starts / n_lines) <= 0.90,
        "g_ellipsis_lines": (ell_ends / n_lines) <= 0.30,
        "g_alpha_words": (alpha_words
                          / F.greatest(n_words, F.lit(1))) >= 0.80,
        "g_stop_words": n_stop >= 2,
    }


def with_gopher_flags(df: DataFrame, col: str = "text",
                      stop_words: tuple[str, ...] = STOP_WORDS
                      ) -> DataFrame:
    """Input rows + the seven rule booleans + ``gopher_keep`` (AND of
    all rules — the paper applies them conjunctively)."""
    flags = gopher_flags(col, stop_words)
    out = df
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def gopher_filter(df: DataFrame, col: str = "text",
                  stop_words: tuple[str, ...] = STOP_WORDS) -> DataFrame:
    """Keep only documents passing every rule; input schema restored."""
    flagged = with_gopher_flags(df, col, stop_words)
    return flagged.where("gopher_keep").drop(
        *gopher_flags(col).keys(), "gopher_keep")


# --- repetition battery (Rae et al. 2021, Appendix A1.2) -------------------

# drop thresholds: fraction of characters covered by the single most
# frequent n-gram (n = 2..4) ...
TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
# ... and by ALL n-grams occurring more than once (n = 5..10)
DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
DUP_LINE_MAX = 0.30       # duplicate line / paragraph fraction
DUP_PARA_MAX = 0.30
DUP_LINE_CHAR_MAX = 0.20  # characters in duplicate lines / paragraphs
DUP_PARA_CHAR_MAX = 0.20


def _ngrams(toks: Column, n: int) -> Column:
    """All n-token grams as space-joined strings — n SHIFTED slices
    zipped (each zip argument is evaluated once; a
    transform(sequence(...)) lambda would re-evaluate the token split
    per element, the measured O(len^2) trap)."""
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, width).alias(f"t{i}")
                       for i in range(n)])
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]))


def unit_relation(df: DataFrame, col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """The battery's exploded ``(id, doc_chars, kind, unit)`` relation —
    one row per line / paragraph / {2..10}-gram occurrence, the single
    corpus-token-scale intermediate every repetition signal is computed
    from.  Exposed so the scale smoke can price the RAW-gram shuffle
    against the fixed-width hashed one `repetition_signals` ships."""
    txt = F.coalesce(F.col(col), F.lit(""))
    toks = F.filter(F.split(txt, r"\s+"), lambda w: F.length(w) > 0)
    lines = F.filter(F.transform(F.split(txt, "\n"),
                                 lambda x: F.trim(x)),
                     lambda x: F.length(x) > 0)
    paras = F.filter(F.transform(F.split(txt, "\n\n+"),
                                 lambda x: F.trim(x)),
                     lambda x: F.length(x) > 0)
    kinds = [F.struct(F.lit("line").alias("kind"), lines.alias("units"))]
    kinds.append(F.struct(F.lit("para").alias("kind"),
                          paras.alias("units")))
    for n in (*TOP_NGRAM_MAX, *DUP_NGRAM_MAX):
        kinds.append(F.struct(F.lit(f"{n}gram").alias("kind"),
                              _ngrams(toks, n).alias("units")))
    base = df.select(F.col(id_col), F.length(txt).alias("doc_chars"),
                     F.explode(F.array(*kinds)).alias("k"))
    return base.select(id_col, "doc_chars",
                       F.col("k.kind").alias("kind"),
                       F.explode("k.units").alias("unit"))


def repetition_signals(df: DataFrame, col: str = "text",
                       id_col: str = "doc_id",
                       _hash_units: bool = True) -> DataFrame:
    """Per-document Gopher repetition battery: duplicate line /
    paragraph fractions (count and character), the top-{2,3,4}-gram
    character fractions, and the duplicate-{5..10}-gram character
    fractions, plus ``rep_keep`` (all thresholds respected).

    Formulas (documented because implementations vary): unit counts
    come from ONE exploded (id, kind, unit) relation serving every
    signal together — the only corpus-token-scale shuffle is that
    count groupBy (map-side combinable); the downstream regroupings
    shrink to distinct units and then 13 rows per document.  For lines /
    paragraphs: dup fraction = (occurrences − distinct) / occurrences;
    char fraction = characters of occurrences beyond the first of each
    distinct unit / total characters of the kind.  For n-grams: top
    fraction = (count × chars of the most frequent gram) / document
    characters; dup fraction = Σ over grams with count ≥ 2 of
    (count × chars) / document characters, capped at 1 (overlapping
    occurrences can over-count).  Documents shorter than n tokens (or
    with zero characters) score 0 everywhere.

    Scale: the exploded relation is ~Σn ≈ 9× the corpus token count —
    the x43 digest-relation shape; everything after the single groupBy
    is per-document-sized."""
    # Hash each unit to 64 bits + its length BEFORE the count shuffle
    # (_unit_relation): every downstream formula consumes only
    # (count, length), so the raw gram string never crosses the wire —
    # shuffle rows are fixed-width (~40 B) instead of carrying long
    # grams.  A count merge would need an xxhash64 collision AT EQUAL
    # LENGTH within one (doc, kind) group — ~n²/2⁶⁴ per document,
    # negligible.  The shuffle-byte win over raw grams is MEASURED by
    # the opt-in scale smoke (tests/test_scale_smoke.py): ~1.5x on the
    # short-gram synthetic sf corpus, >=2x (measured 4.3x uncompressed)
    # once units are long — the web-text shape the hashing targets.
    # ``_hash_units=False`` keeps the RAW unit string as the grouping/
    # tie-break key (the pre-round-6 representation) through the SAME
    # formulas — test-only, so the hashed path's value-invariance is
    # pinned against it property-style (tests/test_gopher.py).
    unit_key = (F.xxhash64("unit") if _hash_units
                else F.col("unit")).alias("uhash")
    # Hash-partition the DOCUMENTS by id before exploding: every
    # aggregation below groups by a superset of ``id_col``, so a
    # partitioning established on the raw docs satisfies all of them
    # (guide §2.4 — one exchange serves every downstream grouping) and
    # the ~9×-token-count unit relation aggregates IN PLACE instead of
    # being shuffled.  Bytes moved: the corpus text once (~6 B/token)
    # versus the hashed unit rows (~9 rows × 40 B per token) — and the
    # explode's CPU also spreads across the session's full parallelism
    # (the minhash_signatures rationale).  Values are unchanged: the
    # aggregates are exact integer counts/sums, indifferent to grouping
    # placement.
    sc = df.sparkSession.sparkContext
    docs = df.select(F.col(id_col), F.col(col))
    docs = docs.repartition(
        max(docs.rdd.getNumPartitions(), sc.defaultParallelism),
        F.col(id_col))
    exploded = unit_relation(docs, col, id_col).select(
        id_col, "doc_chars", "kind", unit_key,
        F.length("unit").alias("ulen"))
    per_unit = (exploded
                .groupBy(id_col, "doc_chars", "kind", "uhash", "ulen")
                .agg(F.count(F.lit(1)).alias("c")))
    per_kind = (per_unit.groupBy(id_col, "doc_chars", "kind").agg(
        F.sum("c").alias("occ"),
        F.count(F.lit(1)).alias("distinct_u"),
        F.sum(F.col("c") * F.col("ulen")).alias("occ_chars"),
        F.sum((F.col("c") - 1) * F.col("ulen")).alias("extra_chars"),
        # coverage of the MOST FREQUENT gram (the paper's rule), not
        # the max-coverage gram — a long once-occurring gram must not
        # trip the repetition filter.  Ties broken deterministically by
        # (count, chars, hash); any candidates still tied on
        # (count, chars) have the SAME c*len product, so the winner's
        # top_cover — the only value consumed — is order-independent
        # and bit-identical to the former (count, chars, gram text)
        # tie-break.
        F.max_by(F.col("c") * F.col("ulen"),
                 F.struct(F.col("c"), F.col("ulen"), F.col("uhash")))
        .alias("top_cover"),
        F.sum(F.when(F.col("c") >= 2, F.col("c") * F.col("ulen"))
              .otherwise(F.lit(0))).alias("dup_cover")))

    def frac(num: Column, den: Column) -> Column:
        return F.round(num / F.greatest(den, F.lit(1)), 4)

    sig = per_kind.select(
        id_col, "kind",
        frac(F.col("occ") - F.col("distinct_u"), F.col("occ"))
        .alias("dup_frac"),
        frac(F.col("extra_chars"), F.col("occ_chars"))
        .alias("dup_char_frac"),
        # overlapping occurrences can over-count chars: cap at 1
        F.least(frac(F.col("top_cover"), F.col("doc_chars")),
                F.lit(1.0)).alias("top_frac"),
        F.least(frac(F.col("dup_cover"), F.col("doc_chars")),
                F.lit(1.0)).alias("dup_cover_frac"))
    wide = sig.groupBy(id_col).pivot(
        "kind", ["line", "para"]
        + [f"{n}gram" for n in (*TOP_NGRAM_MAX, *DUP_NGRAM_MAX)]).agg(
        F.first("dup_frac").alias("dup_frac"),
        F.first("dup_char_frac").alias("dup_char_frac"),
        F.first("top_frac").alias("top_frac"),
        F.first("dup_cover_frac").alias("dup_cover_frac"))
    exprs: dict[str, Column] = {
        "dup_line_frac": F.coalesce("line_dup_frac", F.lit(0.0)),
        "dup_line_char_frac": F.coalesce("line_dup_char_frac",
                                         F.lit(0.0)),
        "dup_para_frac": F.coalesce("para_dup_frac", F.lit(0.0)),
        "dup_para_char_frac": F.coalesce("para_dup_char_frac",
                                         F.lit(0.0)),
    }
    limits = {"dup_line_frac": DUP_LINE_MAX,
              "dup_line_char_frac": DUP_LINE_CHAR_MAX,
              "dup_para_frac": DUP_PARA_MAX,
              "dup_para_char_frac": DUP_PARA_CHAR_MAX}
    for n, thr in TOP_NGRAM_MAX.items():
        name = f"top_{n}gram_char_frac"
        exprs[name] = F.coalesce(f"{n}gram_top_frac", F.lit(0.0))
        limits[name] = thr
    for n, thr in DUP_NGRAM_MAX.items():
        name = f"dup_{n}gram_char_frac"
        exprs[name] = F.coalesce(f"{n}gram_dup_cover_frac", F.lit(0.0))
        limits[name] = thr
    keep = None
    for name, e in exprs.items():
        cond = e <= limits[name]
        keep = cond if keep is None else keep & cond
    signals = wide.select(
        id_col, *[e.alias(name) for name, e in exprs.items()],
        keep.alias("rep_keep"))
    # docs whose text produced NO units at all (empty) never reach the
    # exploded relation: restore them with all-zero signals
    restored = df.select(id_col).join(signals, id_col, "left")
    return (restored
            .fillna({name: 0.0 for name in exprs})
            .fillna({"rep_keep": True}))
