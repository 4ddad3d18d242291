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

from ..localrel import local_df

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


def ks_drift(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the ``col``
    distributions of two relations — the standard distribution-drift
    alarm a data pipeline runs between an incoming shard and the
    standing corpus (or between two sources) before mixing them.

    Returns one row ``(n_a, n_b, d_stat, at_value)``: the max ECDF gap
    and the smallest value where it is attained.

    Scale shape: one union + one groupBy(value) count (map-side
    combinable, distinct-value-sized output), then BOTH cumulative
    counts via ONE range-partitioned prefix-sum pass
    (`prefix.with_prefix_sums` — per-partition totals + broadcast
    offsets + an Arrow cumsum, the same machinery `shard_plan` uses for
    global rank).  No single-partition window anywhere: continuous
    columns at 100 TB have corpus-sized distinct-value relations, and
    the ECDF sort parallelism matches the cluster.  Determinism: counts
    are integers (exact in float64 to 2^53), the ECDF gap is one IEEE
    expression per distinct value — no summation-order dust.
    """
    cached: list = []
    gaps, n_a, n_b = ks_ecdf_gaps(df_a, df_b, col, cache_out=cached)
    gaps = gaps.persist()
    try:
        best = gaps.agg(F.max("g").alias("d")).first()["d"]
        at = gaps.where(F.col("g") == best).agg(F.min("v")).first()[0]
    finally:
        gaps.unpersist()
        for c in cached:
            c.unpersist()
    spark = df_a.sparkSession
    return local_df(spark,
        [(n_a, n_b, float(best), at)],
        f"n_a long, n_b long, d_stat double, at_value {_sql_type(df_a, col)}")


def ks_ecdf_gaps(df_a: DataFrame, df_b: DataFrame, col: str,
                 cache_out: list | None = None
                 ) -> tuple[DataFrame, int, int]:
    """The lazy per-distinct-value ECDF-gap relation ``(v, g)`` behind
    :func:`ks_drift`, plus the two sample sizes — exposed so plan-pin
    tests can assert the distributed shape (no Window, no
    single-partition Exchange) before any action runs."""
    from .prefix import cum_col, with_prefix_sums

    a = df_a.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    b = df_b.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    n_a, n_b = a.count(), b.count()
    if n_a == 0 or n_b == 0:
        raise ValueError("both samples must be non-empty")
    tagged = (a.withColumn("ca", F.lit(1)).withColumn("cb", F.lit(0))
              .unionByName(
                  b.withColumn("ca", F.lit(0)).withColumn("cb", F.lit(1))))
    per_v = (tagged.groupBy("v")
             .agg(F.sum("ca").alias("ka"), F.sum("cb").alias("kb")))
    cum = with_prefix_sums(per_v, ["ka", "kb"], ["v"], cache_out=cache_out)
    # inclusive ECDF = exclusive prefix + the value's own count
    gap = F.abs((F.col(cum_col(0)) + F.col("ka")) / F.lit(float(n_a))
                - (F.col(cum_col(1)) + F.col("kb")) / F.lit(float(n_b)))
    return cum.select("v", F.round(gap, 6).alias("g")), n_a, n_b


def _sql_type(df: DataFrame, col: str) -> str:
    return dict((f.name, f.dataType.simpleString())
                for f in df.schema.fields)[col]


def chisq_drift(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    """Pearson chi-square homogeneity statistic between two relations'
    CATEGORICAL ``col`` distributions — the categorical sibling of
    :func:`ks_drift` (continuous/ordinal).  Returns one row
    ``(n_a, n_b, n_categories, dof, chi2)`` over the classic two-sample
    contingency form: expected count of category c in sample s =
    row_total(s) · col_total(c) / N.

    Scale shape: one union + one groupBy(category) with two conditional
    counts — map-side combinable, category-sized output; the statistic
    folds category-sized rows.  Integer counts in, one IEEE expression
    per category out (summed over the category relation — dust absorbed
    by the 4-dp rounding, same as every aggregate oracle here).
    Categories must number ≥ 2 (dof ≥ 1) — raises otherwise."""
    a = df_a.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    b = df_b.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    n_a, n_b = a.count(), b.count()
    if n_a == 0 or n_b == 0:
        raise ValueError("both samples must be non-empty")
    per = (a.withColumn("ca", F.lit(1)).withColumn("cb", F.lit(0))
           .unionByName(
               b.withColumn("ca", F.lit(0)).withColumn("cb", F.lit(1)))
           .groupBy("v")
           .agg(F.sum("ca").alias("ka"), F.sum("cb").alias("kb")))
    n = float(n_a + n_b)
    ea = (F.col("ka") + F.col("kb")) * F.lit(n_a / n)
    eb = (F.col("ka") + F.col("kb")) * F.lit(n_b / n)
    term = ((F.col("ka") - ea) * (F.col("ka") - ea) / ea
            + (F.col("kb") - eb) * (F.col("kb") - eb) / eb)
    row = per.agg(F.count(F.lit(1)).alias("k"),
                  F.sum(term).alias("chi2")).first()
    if row["k"] < 2:
        raise ValueError("need >= 2 categories for a chi-square test")
    spark = df_a.sparkSession
    return local_df(spark,
        [(n_a, n_b, int(row["k"]), int(row["k"] - 1),
          round(float(row["chi2"]), 4))],
        "n_a long, n_b long, n_categories int, dof int, chi2 double")


def robust_outliers(df: DataFrame, key: str, value: str,
                    id_cols: list[str] | None = None,
                    z_cut: float = 3.5,
                    winsor: tuple[float, float] = (0.05, 0.95)
                    ) -> DataFrame:
    """Per-group ROBUST outlier scoring — median/MAD z-scores (Iglewicz
    & Hoaglin's modified z, the 0.6745 normal-consistency constant) plus
    winsorized clipping: the data-quality pass run over heavy-tailed
    columns (document lengths, event values) where mean/std flags
    (x80's battery) are themselves dragged by the outliers they hunt.

    Returns every input row with ``(med, mad, robust_z, is_outlier,
    clipped)``.  A zero-MAD group (over half its values identical)
    yields NULL z and no flags — the standard degenerate-scale rule.

    Scale shape: two grouped EXACT ``percentile`` aggregations (the
    second needs the group's median first) + two broadcast joins of the
    group-domain-sized stat relations back onto the rows.  Exact
    percentiles hold per-group value histograms — fine for group
    domains (users, sources); swap ``percentile_approx`` in for the
    100 TB path exactly as ``profile_table`` documents for distincts.
    """
    lo, hi = winsor
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("winsor bounds must satisfy 0 <= lo < hi <= 1")
    v = F.col(value).cast("double")
    med = (df.groupBy(key)
           .agg(F.expr(f"percentile({value}, 0.5)").alias("med"),
                F.expr(f"percentile({value}, {lo!r})").alias("__lo__"),
                F.expr(f"percentile({value}, {hi!r})").alias("__hi__")))
    with_med = df.join(F.broadcast(med), key)
    mad = (with_med
           .groupBy(key)
           .agg(F.expr(f"percentile(abs({value} - med), 0.5)")
                .alias("mad")))
    out = with_med.join(F.broadcast(mad), key)
    z = F.lit(0.6745) * (v - F.col("med")) / F.col("mad")
    z = F.when(F.col("mad") > 0, z)
    return (out
            .withColumn("robust_z", z)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(z) > F.lit(float(z_cut)),
                                   F.lit(False)))
            .withColumn("clipped",
                        F.greatest(F.least(v, F.col("__hi__")),
                                   F.col("__lo__")))
            .select(F.col(key), *[F.col(c) for c in (id_cols or [])],
                    v.alias(value), "med", "mad", "robust_z",
                    "is_outlier", "clipped"))
