"""Learned text classification: hashing trick + multinomial logistic
regression — the fastText-style supervised pipeline (Joulin et al.,
"Bag of Tricks for Efficient Text Classification", EACL 2017) that
LLM-curation stacks use to turn per-document heuristics into one
broadcastable linear model (CCNet's fastText lang-ID; GPT-3's
quality classifier, Brown et al. 2020 appendix A).

Scale story (100 TB): the hashing trick fixes the feature dimension
regardless of corpus vocabulary (no vocab build, no OOV path), LBFGS
training is one `treeAggregate` gradient pass per iteration over the
cached feature relation (MLlib's distributed design — no driver-side
data), and scoring broadcasts the O(n_features x n_classes) coefficient
matrix to a pure map-side transform.  Everything JVM-side; no Python in
the hot path.

The repo's primary use is DISTILLATION: train on labels produced by an
existing deterministic heuristic (e.g. :func:`textstats.lang_id`), so
ground truth is recomputable by the DuckDB oracle and the learned model
can replace N per-doc regex passes with one vector product.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import lower_words as _tokens


@dataclass
class TextClassifier:
    """A trained hashed-BoW multinomial LR model.

    ``labels`` is the alphabetically-sorted class list (deterministic
    index <-> string mapping, independent of data order); ``model`` the
    fitted :class:`~pyspark.ml.classification.LogisticRegressionModel`;
    ``n_features`` the hash dimension."""

    labels: list[str]
    model: object
    n_features: int
    text_col: str

    def score(self, df: DataFrame, out_col: str = "pred_label"
              ) -> DataFrame:
        """Input rows + ``out_col`` with the predicted class string.
        Map-side only: the coefficient matrix ships as a broadcast
        task binary; no shuffle, no collect."""
        from pyspark.ml.feature import HashingTF
        tf = HashingTF(inputCol="__toks__", outputCol="__feat__",
                       numFeatures=self.n_features)
        feat = tf.transform(
            df.withColumn("__toks__", _tokens(self.text_col)))
        pred = self.model.transform(feat)
        label_arr = F.array(*[F.lit(s) for s in self.labels])
        return (pred
                .withColumn(out_col, F.element_at(
                    label_arr, F.col(self.model.getPredictionCol())
                    .cast("int") + 1))
                .drop("__toks__", "__feat__",
                      self.model.getPredictionCol(),
                      self.model.getRawPredictionCol(),
                      self.model.getProbabilityCol()))


def train_text_classifier(df: DataFrame, label_col: str,
                          text_col: str = "text",
                          n_features: int = 4096,
                          max_iter: int = 60,
                          reg_param: float = 1e-3) -> TextClassifier:
    """Fit hashed-BoW multinomial LR on ``df[label_col]``.

    The label index mapping is pinned to the SORTED distinct label set
    (not MLlib's default frequency order, which varies with data
    layout), so the model's class indices are deterministic across
    partitionings — the same discipline the seeded samplers follow
    (derive nothing from row or partition order)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    labels = [r[0] for r in
              df.select(label_col).distinct().collect()]  # k rows
    labels.sort()
    idx = F.array(*[F.lit(s) for s in labels])
    tf = HashingTF(inputCol="__toks__", outputCol="__feat__",
                   numFeatures=n_features)
    feat = tf.transform(df.withColumn("__toks__", _tokens(text_col)))
    feat = feat.withColumn(
        "__label__",
        (F.array_position(idx, F.col(label_col)) - 1).cast("double"))
    lr = LogisticRegression(
        featuresCol="__feat__", labelCol="__label__",
        maxIter=max_iter, regParam=reg_param, family="multinomial",
        tol=1e-7)
    model = lr.fit(feat)
    return TextClassifier(labels=labels, model=model,
                          n_features=n_features, text_col=text_col)


def distill_heuristic(df: DataFrame, label_expr: Column,
                      text_col: str = "text",
                      split_col: str = "doc_id", holdout_mod: int = 5,
                      **train_kw) -> tuple[TextClassifier, DataFrame]:
    """Train a classifier on a heuristic's own labels and report holdout
    agreement — the CCNet/GPT-3 pattern of replacing a rule stack with a
    learned scorer, with the rule stack as free supervision.

    Returns ``(classifier, report)`` where ``report`` has one row per
    label over the holdout split (``split_col % holdout_mod == 0`` — a
    plain modulo so the split is recomputable in ANSI SQL):
    ``(label, n_test, n_agree)``.  The holdout rows never reach the
    optimizer.  The report covers only labels PRESENT IN THE TRAINING
    SPLIT: a label occurring solely in the holdout can never be
    predicted (the model has no such class index), so including it
    would make agreement assertions data-dependent in a way no learner
    can satisfy — callers wanting those rows can anti-join the holdout
    against ``classifier.labels`` themselves."""
    labeled = df.withColumn("__hlabel__", label_expr)
    is_test = F.col(split_col) % holdout_mod == 0
    clf = train_text_classifier(labeled.filter(~is_test), "__hlabel__",
                                text_col=text_col, **train_kw)
    scored = clf.score(
        labeled.filter(is_test)
        .filter(F.col("__hlabel__").isin(clf.labels)))
    report = (scored.groupBy(F.col("__hlabel__").alias("label"))
              .agg(F.count("*").alias("n_test"),
                   F.sum((F.col("pred_label") == F.col("__hlabel__"))
                         .cast("long")).alias("n_agree"))
              .orderBy("label"))
    return clf, report


# --- synthetic topic corpus (the non-degenerate validation task) ----------

# 3 topic classes over ONE shared 6-word vocabulary: class c favors the
# pair {TOPIC_VOCAB[2c], TOPIC_VOCAB[2c+1]} but every class emits every
# word, so the task has genuine Bayes error — a learner must actually
# separate the distributions (a majority-class baseline scores ~1/3),
# yet cannot reach 1.0.  This is the validation-task shape the fastText
# paper's supervised benchmarks have, reduced to a deterministic
# generator both engines can account for.
TOPIC_VOCAB = ["ember", "flame", "tide", "wave", "stone", "cliff"]
TOPIC_LABELS = ["alpha", "beta", "gamma"]


def topic_corpus(ids: DataFrame, id_col: str = "doc_id",
                 n_tokens: int = 4, favored_pct: int = 50,
                 tag: str = "x45") -> DataFrame:
    """Deterministic 3-class mixture corpus keyed by ``id_col``:
    ``(id, label, text)`` where label = id % 3 and each of ``n_tokens``
    token slots draws from the class's favored word pair with
    probability ``favored_pct``/100, else uniformly from the shared
    vocabulary.  All randomness is xxhash64 of (id, slot, purpose) —
    content-derived, layout-independent, identical across sessions."""
    vocab = F.array(*[F.lit(w) for w in TOPIC_VOCAB])
    cls = F.pmod(F.col(id_col), F.lit(3))

    def h(j: int, purpose: str) -> Column:
        return F.xxhash64(F.col(id_col), F.lit(j), F.lit(f"{tag}-{purpose}"))

    words = []
    for j in range(n_tokens):
        u = F.pmod(h(j, "mix"), F.lit(100))
        favored = cls * 2 + F.pmod(h(j, "pair"), F.lit(2))
        uniform = F.pmod(h(j, "any"), F.lit(len(TOPIC_VOCAB)))
        idx = F.when(u < favored_pct, favored).otherwise(uniform)
        words.append(F.element_at(vocab, idx.cast("int") + 1))
    label = F.element_at(F.array(*[F.lit(s) for s in TOPIC_LABELS]),
                         cls.cast("int") + 1)
    return ids.select(F.col(id_col), label.alias("label"),
                      F.concat_ws(" ", *words).alias("text"))
