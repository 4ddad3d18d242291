"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these operators are for the cases AQE can't fix:

* ``salted_group_agg`` — a single hot group key overwhelms one reducer.
  Two-phase: aggregate on (key, salt) first (spreads the hot key over
  ``n_salts`` reducers), then combine partials.  Only works for
  algebraic aggregates (sum/count/min/max) — exactly the ones the prep
  pipeline uses.
* ``salted_broadcast_left`` — joining a huge skewed fact against a small
  dimension: replicate the dimension ``n_salts`` times with a salt column
  and salt the fact side randomly, so one hot FK value spreads across
  ``n_salts`` tasks while staying an equi-join.

Both rewrite to pure DataFrame ops; results are exactly equal to the
unsalted plan (tests assert equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT = "__salt__"


def salted_group_agg(df: DataFrame, key_cols: list[str],
                     sum_cols: dict[str, str] | None = None,
                     count_alias: str | None = "cnt",
                     n_salts: int = 16, seed: int = 42) -> DataFrame:
    """Two-phase groupBy: partial agg on (keys, salt), final agg on keys.

    ``sum_cols``: {input_col: output_alias} summed columns.
    ``count_alias``: alias for COUNT(*) (None to omit).
    """
    sum_cols = sum_cols or {}
    salted = df.withColumn(
        SALT, (F.rand(seed) * n_salts).cast("int"))
    partial_aggs = [F.sum(F.col(f"`{c}`")).alias(f"__ps_{a}__")
                    for c, a in sum_cols.items()]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__pc__"))
    partial = salted.groupBy(*[F.col(f"`{k}`") for k in key_cols], F.col(SALT)) \
        .agg(*partial_aggs)
    final_aggs = [F.sum(F.col(f"__ps_{a}__")).alias(a)
                  for a in sum_cols.values()]
    if count_alias:
        final_aggs.append(F.sum("__pc__").alias(count_alias))
    return partial.groupBy(*[F.col(f"`{k}`") for k in key_cols]).agg(*final_aggs)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame,
                          fact_key: str, dim_key: str,
                          n_salts: int = 8, seed: int = 42,
                          how: str = "inner") -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with the dim side replicated per salt and
    the fact side salted randomly — a hot ``fact_key`` value spreads over
    ``n_salts`` tasks.  The dim side must be broadcast-sized (it is
    replicated ``n_salts``×)."""
    salted_fact = fact.withColumn(
        SALT, (F.rand(seed) * n_salts).cast("int"))
    replicated_dim = dim.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    cond = (F.col(f"`{fact_key}`") == F.col(f"`{dim_key}`")) & \
        (salted_fact[SALT] == replicated_dim[SALT])
    out = salted_fact.join(F.broadcast(replicated_dim), cond, how)
    return out.drop(SALT)
