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
  sources/       scans and sinks (parquet/csv, stage checkpointing)
  operators/     fanout/weight/dictionary/sampler + LLM-data-pipeline ops
  functions/     scalar/predicate → pyspark Column compilation
  ml/            NumPy NAR masked autoencoder (train + inference)
  plans/         SQL front-end, predicate normalization, estimator
  streaming/     Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
