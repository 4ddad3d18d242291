"""One-pass table profiling: per-column null counts, distinct counts
and numeric ranges — the first step of any ingest/curation pipeline and
the statistics a cardinality estimator's dictionaries are built from
(reference: Scardina materializes exactly these per-column distincts at
prep, scardina/datasets.py:224-253).

Shape: ONE aggregation row carrying every column's statistics (Spark
expands the multi-distinct into one Expand + aggregate pass), then a
constant-size unpivot into (column, stat...) rows.  ``exact=False``
swaps the distinct counts for ``approx_count_distinct`` (HLL++) — the
100 TB path, one pass, no Expand blow-up; the exact mode exists for
oracle verification and small tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal", "long"}


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  exact: bool = True) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_num, max_num) per
    profiled column; min/max are null for non-numeric columns."""
    dtypes = dict(df.dtypes)
    cols = list(df.columns) if cols is None else list(cols)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, c in enumerate(cols):
        col = F.col(f"`{c}`")
        aggs.append(F.coalesce(F.sum(col.isNull().cast("long")),
                               F.lit(0)).alias(f"__nn{i}__"))
        if exact:
            aggs.append(F.countDistinct(col).alias(f"__nd{i}__"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd{i}__"))
        is_num = dtypes.get(c, "").split("(")[0] in _NUMERIC
        if is_num:
            aggs.append(F.min(col).cast("double").alias(f"__mn{i}__"))
            aggs.append(F.max(col).cast("double").alias(f"__mx{i}__"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mn{i}__"))
            aggs.append(F.lit(None).cast("double").alias(f"__mx{i}__"))
    one = df.agg(*aggs)
    stacked = one.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("__n__").alias("n_rows"),
                 F.col(f"__nn{i}__").alias("n_nulls"),
                 F.col(f"__nd{i}__").alias("n_distinct"),
                 F.col(f"__mn{i}__").alias("min_num"),
                 F.col(f"__mx{i}__").alias("max_num"))
        for i, c in enumerate(cols)])).alias("s"))
    return stacked.select("s.*").orderBy("column")
