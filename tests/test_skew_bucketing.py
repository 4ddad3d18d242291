"""Salted aggregation/join equality + bucketed co-located joins."""

from pyspark.sql import functions as F

from scardina_spark.operators.skew import salted_broadcast_left, salted_group_agg


def _skewed_df(spark):
    # 90% of rows share one hot key
    base = spark.range(20_000).withColumn(
        "k", F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100))
    return base.withColumn("v", (F.col("id") % 7).cast("double"))


def test_salted_group_agg_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {(r["k"]): (r["s"], r["c"]) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count(F.lit(1)).alias("c")).collect()}
    salted = {(r["k"]): (r["s"], r["c"]) for r in
              salted_group_agg(df, ["k"], {"v": "s"}, "c").collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.range(100).select(
        F.col("id").alias("dk"), (F.col("id") * 10).alias("dv"))
    plain = sorted((r["id"], r["dv"]) for r in
                   fact.join(dim, fact["k"] == dim["dk"]).collect())
    salted = sorted((r["id"], r["dv"]) for r in
                    salted_broadcast_left(fact, dim, "k", "dk").collect())
    assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    fact = _skewed_df(spark)
    from scardina_spark.operators.skew import SALT
    salted = fact.withColumn(SALT, (F.rand(42) * 8).cast("int"))
    per_salt = salted.where(F.col("k") == 1).groupBy(SALT).count().collect()
    assert len(per_salt) == 8  # hot key occupies every salt partition


def test_bucketed_join_has_no_shuffle(spark, tables, tmp_path):
    """Bucketed tables on the join key co-locate: the sort-merge join plan
    reads both sides without an Exchange."""
    import shutil
    spark.sql("drop table if exists b_orders")
    spark.sql("drop table if exists b_lineitem")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist; clear them or saveAsTable refuses
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    tables["orders"].write.bucketBy(8, "o_orderkey") \
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    tables["lineitem"].write.bucketBy(8, "l_orderkey") \
        .sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    joined = a.join(b, a["o_orderkey"] == b["l_orderkey"]) \
        .where(~F.col("o_orderkey").isNull())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # and the result is right
    assert joined.count() == tables["lineitem"].count()


def test_salted_fk_counts_and_edge_fanout_equal_unsalted(spark, tables):
    from pyspark.sql import functions as F
    from scardina_spark.operators.fanout import edge_fanout, fk_counts

    li = tables["lineitem"]
    a = fk_counts(li, "l_orderkey").orderBy("l_orderkey").collect()
    b = fk_counts(li, "l_orderkey", salted=True).orderBy("l_orderkey").collect()
    assert [(r["l_orderkey"], r["count"]) for r in a] == \
        [(r["l_orderkey"], r["count"]) for r in b]

    w = li.withColumn("__weight__", F.lit(2.0))
    x = edge_fanout(w, "l_partkey").orderBy("l_partkey").collect()
    y = edge_fanout(w, "l_partkey", salted=True).orderBy("l_partkey").collect()
    assert [(r["l_partkey"], r["__fsum__"]) for r in x] == \
        [(r["l_partkey"], r["__fsum__"]) for r in y]
