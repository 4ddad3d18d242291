"""Clustered parquet writes: the footer statistics must actually become
prunable — disjoint (or near-disjoint) per-row-group ranges — and the
round-tripped data must be unchanged."""

from pyspark.sql import functions as F

from scardina_spark.operators.layout import (
    overlap_fraction, row_group_ranges, write_sorted)


def test_sorted_write_clusters_row_groups(spark, tables, tmp_path):
    li = tables["lineitem"]
    clustered = str(tmp_path / "clustered")
    baseline = str(tmp_path / "baseline")
    write_sorted(li, clustered, ["l_shipdate"], n_files=8)
    # baseline: same data, arrival order
    li.repartition(8).write.mode("overwrite").parquet(baseline)

    r_clustered = row_group_ranges(clustered, "l_shipdate")
    r_baseline = row_group_ranges(baseline, "l_shipdate")
    assert len(r_clustered) >= 8
    f_clustered = overlap_fraction(r_clustered)
    f_baseline = overlap_fraction(r_baseline)
    # arrival order leaves nearly every pair overlapping; clustering
    # must make row groups (near-)disjoint
    assert f_baseline > 0.9, f_baseline
    assert f_clustered < 0.1, f_clustered

    # round trip: same rows
    back = spark.read.parquet(clustered)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_quantity"), F.sum("l_orderkey")).collect()
    b = back.agg(F.sum("l_quantity"), F.sum("l_orderkey")).collect()
    assert a == b


def test_filtered_scan_on_clustered_data_pushes_range(spark, tables,
                                                      tmp_path):
    out = str(tmp_path / "c2")
    write_sorted(tables["lineitem"], out, ["l_shipdate"], n_files=8)
    df = spark.read.parquet(out).where(
        F.col("l_shipdate") >= "1998-06-01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual" \
        in plan


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"])
    from scardina_spark.operators.layout import zorder_value
    got = df.select(zorder_value(["x", "y"], bits=3).alias("z")) \
        .first()["z"]
    # x bits at even positions, y bits at odd: x=101, y=011
    # -> z bits (pos 5..0) = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1
    assert got == 0b011011


def test_zordered_write_clusters_both_columns(spark, tmp_path):
    """Z-order clustering must reduce row-group range overlap on BOTH
    key columns simultaneously (a linear sort can only do one).  Uses
    comparable-width key domains — with a tiny domain (e.g. 10
    suppliers) every row group necessarily spans it and no layout can
    prune."""
    df = (spark.range(100_000)
          .selectExpr("id",
                      "cast(hash(id) & 1023 as long) as x",
                      "cast(hash(id + 7) & 1023 as long) as y"))
    zpath = str(tmp_path / "z")
    base = str(tmp_path / "b")
    from scardina_spark.operators.layout import write_zordered
    write_zordered(df, zpath, ["x", "y"], bits=10, n_files=64)
    df.repartition(64).write.mode("overwrite").parquet(base)

    for col in ["x", "y"]:
        fz = overlap_fraction(row_group_ranges(zpath, col))
        fb = overlap_fraction(row_group_ranges(base, col))
        assert fb > 0.9, (col, fb)
        # 64 z-chunks over a 1024x1024 space ≈ an 8x8 quadrant grid:
        # most chunk pairs sit in different bands of BOTH dimensions
        assert fz < 0.5 * fb, (col, fz, fb)

    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    assert back.agg({"x": "sum"}).first()[0] == \
        df.agg({"x": "sum"}).first()[0]
