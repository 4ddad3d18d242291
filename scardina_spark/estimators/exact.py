"""Exact COUNT(*) estimator — the ground-truth oracle.

The reference has no execution engine and gets truth from golden CSV files
(benchmarks/imdb/*.csv); here truth is computed live: the parsed query is
planned and executed as a declarative Spark multi-join + filter, which
Catalyst optimizes (join reordering, broadcast, pushdown).  Also serves as
the fallback estimator when no prepared sample covers a query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..plans.parse import ParsedQuery, parse_query
from ..plans.planner import execute_count, plan_query
from ..schema import SchemaGraph


@dataclass
class ExactEstimator:
    sg: SchemaGraph
    tables: dict[str, DataFrame]

    name: str = "exact"

    def estimate(self, query: ParsedQuery | str) -> int:
        pq = parse_query(query) if isinstance(query, str) else query
        plan = plan_query(self.sg, pq)
        return execute_count(plan, self.tables)
