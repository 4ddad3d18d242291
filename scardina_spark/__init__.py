"""scardina_spark — a PySpark-native rebuild of Scardina's capabilities.

Scardina (OnizukaLab/Scardina, arXiv:2303.18042) is a learned join
cardinality estimator.  Its data-shaped work — schema-graph stats, fanout
counts, bottom-up join weights, unbiased weighted join sampling, dictionary
encoding — is re-expressed here as declarative Spark DataFrame plans so it
scales to cluster-sized inputs; the density model is a small NumPy
masked-autoencoder fed by Spark-produced training matrices.

Layout:
  session.py     SparkSession factory with scale-tuned configs
  schema.py      schema graph + CIN/UR subschema derivation (metadata-scale)
  catalog.py     testdata (TPC-H-ish) schema registration and loading
  operators/     fanout/weight/sampler/pipeline + LLM-data-pipeline ops
                 (dedup, similarity, textstats, multimodal, ...)
  functions/     dictionary encoding + bit-slice factorization
  plans/         SQL front-end, predicate normalization, join planning
  estimators/    exact / sample-HT / stitched / CIN / hybrid / p-error
  model/         NumPy NAR masked autoencoder (MLP + Transformer),
                 Spark->model bridges, checkpointing, grid search
  streaming/     Structured Streaming ops over the events table
  queries.py     driver-contract registry (operator -> Spark fn + oracle)
  benchmarks.py  JOB-light-shape suite, DuckDB truths, model column sets

Common entry points re-export lazily from here::

    from scardina_spark import get_spark, load_tables, build_tpch_schema
    from scardina_spark import prepare_tree_sample, SampleEstimator
    from scardina_spark import train_join_estimator
"""

__version__ = "0.1.0"

_EXPORTS = {
    "get_spark": ("scardina_spark.session", "get_spark"),
    "build_tpch_schema": ("scardina_spark.catalog", "build_tpch_schema"),
    "load_table": ("scardina_spark.catalog", "load_table"),
    "load_tables": ("scardina_spark.catalog", "load_tables"),
    "prepare_tree_sample": ("scardina_spark.estimators",
                            "prepare_tree_sample"),
    "ExactEstimator": ("scardina_spark.estimators", "ExactEstimator"),
    "SampleEstimator": ("scardina_spark.estimators", "SampleEstimator"),
    "StitchedEstimator": ("scardina_spark.estimators", "StitchedEstimator"),
    "HybridEstimator": ("scardina_spark.estimators", "HybridEstimator"),
    "NarCinEstimator": ("scardina_spark.estimators.cin", "NarCinEstimator"),
    "TrainConfig": ("scardina_spark.model", "TrainConfig"),
    "train_single_table": ("scardina_spark.model.bridge",
                           "train_single_table"),
    "train_join_estimator": ("scardina_spark.model.join_bridge",
                             "train_join_estimator"),
    "save_join_estimator": ("scardina_spark.model.join_bridge",
                            "save_join_estimator"),
    "load_join_estimator": ("scardina_spark.model.join_bridge",
                            "load_join_estimator"),
    "parse_query": ("scardina_spark.plans.parse", "parse_query"),
    "p_error": ("scardina_spark.estimators.perror", "p_error"),
    "build_cin_estimator": ("scardina_spark.estimators.cin",
                            "build_cin_estimator"),
    "bm25_topk": ("scardina_spark.operators.bm25", "bm25_topk"),
    "rrf_fuse": ("scardina_spark.operators.fusion", "rrf_fuse"),
    "funnel_counts": ("scardina_spark.operators.funnel", "funnel_counts"),
    "keep_latest": ("scardina_spark.operators.dedup", "keep_latest"),
    "write_sorted": ("scardina_spark.operators.layout", "write_sorted"),
    "write_zordered": ("scardina_spark.operators.layout",
                       "write_zordered"),
    "quantile_sketch": ("scardina_spark.operators.sketches",
                        "quantile_sketch"),
    "approx_distinct": ("scardina_spark.operators.sketches",
                        "approx_distinct"),
}


def __getattr__(name: str):
    """Lazy re-exports: importing scardina_spark stays free of pyspark
    until an entry point is actually touched."""
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}") from None
    import importlib
    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
