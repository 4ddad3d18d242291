"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (sample-backed cardinality estimation
benchmarked against exact truth) on sf0.001; ``queries``/``oracle_sql``
register every implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions, each with a DuckDB-equivalent oracle
where the operator is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from scardina_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: estimate join-cardinality queries from a materialized
    unbiased join sample and report q-error vs exact truth."""
    return Q.q_estimate_qerror(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
