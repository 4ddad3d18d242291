"""Banded range join correctness vs a cartesian filter; time rollup
level consistency."""

from pyspark.sql import functions as F

from scardina_spark.operators.rangejoin import range_join
from scardina_spark.operators.rollup import time_rollup


def _points(spark):
    return spark.createDataFrame(
        [(i, float(i * 3 % 97)) for i in range(60)], ["pid", "p"])


def _intervals(spark):
    rows = [(j, float(j * 7 % 80), float(j * 7 % 80 + (j % 5) * 10 + 1))
            for j in range(25)]
    return spark.createDataFrame(rows, ["iid", "lo", "hi"])


def test_range_join_matches_cartesian(spark):
    pts, ivs = _points(spark), _intervals(spark)
    got = {(r["pid"], r["iid"])
           for r in range_join(pts, ivs, "p", "lo", "hi", 10.0).collect()}
    want = {(r["pid"], r["iid"])
            for r in pts.crossJoin(ivs)
            .where((F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
            .collect()}
    assert got == want and got


def test_range_join_no_duplicate_pairs(spark):
    pts, ivs = _points(spark), _intervals(spark)
    out = range_join(pts, ivs, "p", "lo", "hi", 3.0)  # spans many buckets
    n = out.count()
    assert n == out.select("pid", "iid").distinct().count()


def test_range_join_bucket_width_invariance(spark):
    pts, ivs = _points(spark), _intervals(spark)
    a = {(r["pid"], r["iid"])
         for r in range_join(pts, ivs, "p", "lo", "hi", 1.0).collect()}
    b = {(r["pid"], r["iid"])
         for r in range_join(pts, ivs, "p", "lo", "hi", 50.0).collect()}
    assert a == b


def test_range_join_plan_is_equi_join(spark):
    """The banded rewrite must execute as a hash equi-join on the bucket
    id — a naive interval predicate would fall back to
    BroadcastNestedLoopJoin (cartesian × filter), which is the plan
    that dies at scale."""
    pts, ivs = _points(spark), _intervals(spark)
    plan = (range_join(pts, ivs, "p", "lo", "hi", 10.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_rollup_levels_consistent(tables):
    ev = tables["events"]
    out = time_rollup(ev, "ts", "value").cache()
    tot = ev.count()
    sums = {r["level"]: (r["n"], round(r["sv"], 2)) for r in
            out.groupBy("level")
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_value").alias("sv")).collect()}
    base_sum = round(ev.select(F.sum("value")).first()[0], 2)
    for lvl in ("hour", "day", "week"):
        assert sums[lvl][0] == tot
        assert abs(sums[lvl][1] - base_sum) < 0.05
    # coarser levels have (weakly) fewer buckets
    n_buckets = {r["level"]: r["b"] for r in
                 out.groupBy("level").agg(F.count(F.lit(1)).alias("b"))
                 .collect()}
    assert n_buckets["week"] <= n_buckets["day"] <= n_buckets["hour"]
    out.unpersist()


def test_rollup_day_matches_direct(tables):
    ev = tables["events"]
    got = {r["bucket_start"]: (r["n"], r["sum_value"])
           for r in time_rollup(ev, "ts", "value")
           .where(F.col("level") == "day").collect()}
    want = {r["d"]: (r["n"], round(r["sv"], 4))
            for r in ev.groupBy(F.date_trunc("day", "ts").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("sv")).collect()}
    assert got == want
