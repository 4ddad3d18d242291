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
