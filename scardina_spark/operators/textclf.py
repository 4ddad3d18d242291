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
    optimizer."""
    labeled = df.withColumn("__hlabel__", label_expr)
    is_test = F.col(split_col) % holdout_mod == 0
    clf = train_text_classifier(labeled.filter(~is_test), "__hlabel__",
                                text_col=text_col, **train_kw)
    scored = clf.score(labeled.filter(is_test))
    report = (scored.groupBy(F.col("__hlabel__").alias("label"))
              .agg(F.count("*").alias("n_test"),
                   F.sum((F.col("pred_label") == F.col("__hlabel__"))
                         .cast("long")).alias("n_agree"))
              .orderBy("label"))
    return clf, report
