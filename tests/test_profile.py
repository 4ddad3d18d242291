"""One-pass table profiling: stats match hand counts; the approx mode
keeps one scan and no Expand blow-up."""

from pyspark.sql import functions as F

from scardina_spark.operators.profile import profile_table


def test_profile_hand_fixture(spark):
    rows = [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (3, "b", 2.5)]
    df = spark.createDataFrame(rows, ["k", "s", "x"])
    got = {r["column"]: r.asDict()
           for r in profile_table(df, exact=True).collect()}
    assert got["k"]["n_rows"] == 4
    assert got["k"]["n_distinct"] == 3
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 3.0
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_num"] is None  # non-numeric: no range
    assert got["x"]["n_nulls"] == 1
    assert got["x"]["min_num"] == 1.5 and got["x"]["max_num"] == 2.5


def test_profile_approx_mode_single_scan(spark, tables):
    df = tables["orders"]
    prof = profile_table(df, ["o_orderkey", "o_orderstatus"], exact=False)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "Expand" not in plan  # approx distinct avoids the expansion
    got = {r["column"]: r["n_distinct"] for r in prof.collect()}
    exact = {c: df.select(c).distinct().count()
             for c in ["o_orderkey", "o_orderstatus"]}
    for c in exact:
        assert abs(got[c] - exact[c]) <= max(0.1 * exact[c], 2), (c, got)


def test_profile_empty_frame_and_empty_cols(spark):
    import pytest

    from pyspark.sql.types import (LongType, StructField, StructType)

    schema = StructType([StructField("x", LongType())])
    empty = spark.createDataFrame([], schema)
    r = profile_table(empty).first()
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
    with pytest.raises(ValueError):
        profile_table(empty, cols=[])
