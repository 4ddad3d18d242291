"""Distributed prefix sum / global index vs exact expectation."""

from pyspark.sql import functions as F

from scardina_spark.operators.prefix import CUM, IDX, with_global_index, with_prefix_sum


def test_global_index_is_dense_and_ordered(spark):
    df = spark.range(10_000).withColumn("k", (F.col("id") * 37) % 1000)
    out = with_global_index(df, ["k", "id"], n_partitions=7)
    rows = out.select("k", "id", IDX).collect()
    rows.sort(key=lambda r: (r["k"], r["id"]))
    assert [r[IDX] for r in rows] == list(range(10_000))


def test_prefix_sum_exclusive_and_global(spark):
    df = spark.range(5_000).withColumn("w", (F.col("id") % 7 + 1).cast("double"))
    out = with_prefix_sum(df, "w", ["id"], n_partitions=5)
    rows = sorted(out.select("id", "w", CUM).collect(), key=lambda r: r["id"])
    run = 0.0
    for r in rows:
        assert abs(r[CUM] - run) < 1e-6 * max(1.0, run)
        run += r["w"]
