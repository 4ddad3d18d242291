"""End-to-end training-corpus curation: the composed pipeline a
large-scale LLM-data run executes as ONE lazy Spark plan.

Stages (every one an existing, individually-oracled operator):

1. benchmark decontamination (``operators/decontam.decontaminate``) —
   word n-gram collisions against a held-out benchmark slice; the
   benchmark gram set broadcasts, the train side never shuffles grams;
2. repetition gate (``operators/textstats.filter_repetitive``) —
   Gopher-style dup-token / top-bigram thresholds, shuffle-free
   projections;
3. quality + language gate, exact fingerprint dedup and optional greedy
   token-budget fill (``textstats.select_training_corpus``) — one
   shuffle on the fingerprint, budget via the distributed prefix sum;
4. sequence packing (``operators/packing.pack_sequences``) — the
   surviving corpus laid on one global token line in doc-id order and
   cut into fixed-length training rows (distributed prefix sum, no
   single-partition window).

Composition is deterministic end to end, so the WHOLE pipeline has an
exact SQL oracle (``queries.sql_curate_corpus``) — the property that
makes a 100 TB curation run auditable stage by stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .decontam import decontaminate
from .packing import pack_sequences
from .textstats import filter_repetitive, select_training_corpus


def curate_corpus(docs: DataFrame, seq_len: int = 128,
                  bench_source: str = "src0", ngram: int = 4,
                  max_contamination: float = 0.02,
                  max_dup_token_fraction: float = 0.5,
                  max_top_bigram_fraction: float = 0.2,
                  min_quality: float = 0.7,
                  langs: tuple[str, ...] = ("en",),
                  token_budget: float | None = None,
                  gopher_rules: bool = False,
                  gopher_stop_words: tuple[str, ...] | None = None,
                  repetition_battery: bool = False,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """The curated, packed training corpus: one row per surviving
    document with its quality/language verdicts and its position in the
    fixed-``seq_len`` packed layout.

    ``bench_source`` names the held-out benchmark slice (rows with
    ``source == bench_source`` contribute contamination grams and are
    themselves excluded from the corpus).

    ``gopher_rules`` / ``repetition_battery`` insert the Rae et al.
    2021 gates (App. A1.1 rule battery / A1.2 repetition thresholds —
    `operators/gopher.py`) after decontamination.  Both default OFF so
    the oracled x40 composition is unchanged; each is individually
    oracled (x54/x56) and composes as a pure filter.
    ``gopher_stop_words`` overrides the rule battery's function-word
    set (default: the paper's English set) — the knob a corpus whose
    vocabulary lacks those literals needs for the gate to
    discriminate."""
    bench = docs.where(F.col("source") == bench_source)
    train = docs.where(F.col("source") != bench_source)
    clean = decontaminate(train, bench, id_col=id_col, text_col=text_col,
                          n=ngram, max_contamination=max_contamination)
    if gopher_rules:
        from .gopher import STOP_WORDS, gopher_filter
        clean = gopher_filter(clean, col=text_col,
                              stop_words=gopher_stop_words or STOP_WORDS)
    if repetition_battery:
        from .gopher import repetition_signals
        rep_ok = (repetition_signals(clean, col=text_col, id_col=id_col)
                  .where("rep_keep").select(id_col))
        clean = clean.join(rep_ok, id_col, "left_semi")
    kept = filter_repetitive(clean, max_dup_token_fraction,
                             max_top_bigram_fraction, col=text_col)
    sel = select_training_corpus(kept, min_quality=min_quality,
                                 langs=langs, token_budget=token_budget,
                                 col=text_col)
    # sel already carries the token counts — packing the selection frame
    # (n_tokens_col) avoids a second scan + re-tokenization of the
    # corpus-sized docs table
    packed = pack_sequences(sel, seq_len, id_col=id_col,
                            n_tokens_col="n_tokens")
    return (packed
            .join(sel.select(id_col, "lang_pred", "quality"), id_col)
            .select(id_col, "lang_pred", "quality", "n_tokens",
                    "pack_id", "pack_offset", "n_packs"))
