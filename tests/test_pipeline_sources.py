"""Checkpointed prep pipeline + CSV source."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType)

from scardina_spark.catalog import build_tpch_schema, load_csv_table
from scardina_spark.estimators.sample import cin_tree
from scardina_spark.operators.pipeline import PrepPipeline


def test_pipeline_checkpoints_and_resumes(spark, tables, tmp_path):
    cache = str(tmp_path / "prep")
    pipe = PrepPipeline(spark, cache)
    sg = build_tpch_schema()

    out = pipe.tables_with_fanouts(sg, tables)
    assert os.path.exists(
        os.path.join(cache, "base_tables_with_fanouts", "orders", "_SUCCESS"))
    assert out["orders"].count() == tables["orders"].count()

    d = pipe.dictionary(tables["lineitem"], "lineitem", "l_returnflag")
    assert d.count() == tables["lineitem"].select(
        "l_returnflag").distinct().count()

    tree = cin_tree(sg, "orders")
    s1 = pipe.weighted_sample(tree, out, "customer", 500, seed=9)
    assert s1.count() == 500
    # resume path: same call returns the checkpointed parquet (same rows)
    s2 = pipe.weighted_sample(tree, out, "customer", 500, seed=9)
    a = sorted(r["__sample_id__"] for r in s1.select("`__sample_id__`").collect())
    b = sorted(r["__sample_id__"] for r in s2.select("`__sample_id__`").collect())
    assert a == b
    # prefixed + marker columns round-trip through parquet
    assert any(c.startswith("__in__:") for c in s2.columns)


def test_csv_source_with_schema_and_projection(spark, tmp_path, duck):
    p = str(tmp_path / "li.csv")
    duck.sql(f"""
        copy (select l_orderkey, l_quantity, l_returnflag from lineitem)
        to '{p}' (header, delimiter ',')""")
    schema = StructType([
        StructField("l_orderkey", LongType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_returnflag", StringType()),
    ])
    df = load_csv_table(spark, p, columns=["l_orderkey", "l_quantity"],
                        schema=schema)
    assert df.columns == ["l_orderkey", "l_quantity"]
    want = duck.sql("select count(*), sum(l_quantity) from lineitem").fetchone()
    got = df.agg(F.count(F.lit(1)), F.sum("l_quantity")).collect()[0]
    assert (got[0], round(got[1], 2)) == (want[0], round(want[1], 2))


def test_csv_escape_handling(spark, tmp_path):
    p = str(tmp_path / "esc.csv")
    with open(p, "w") as f:
        f.write('id,txt\n1,"say \\"hi\\""\n2,plain\n')
    df = load_csv_table(spark, p)
    rows = {r["id"]: r["txt"] for r in df.collect()}
    assert rows[1] == 'say "hi"'
    assert rows[2] == "plain"


def test_jdbc_source_reads_embedded_derby(spark):
    """S5 (JDBC source): read back a table from the Derby embedded
    database Spark already bundles — both the single-connection shape
    and the partitioned range read (4 executor-side range queries)."""
    from scardina_spark.catalog import load_jdbc_table

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:jdbctest;create=true")
    st = conn.createStatement()
    try:
        st.executeUpdate(
            "CREATE TABLE t_jdbc (id INT PRIMARY KEY, name VARCHAR(20))")
    except Exception:
        st.executeUpdate("DELETE FROM t_jdbc")  # re-run in same JVM
    for i in range(20):
        st.executeUpdate(f"INSERT INTO t_jdbc VALUES ({i}, 'n{i}')")
    st.close()
    conn.close()

    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = load_jdbc_table(spark, "jdbc:derby:memory:jdbctest", "t_jdbc",
                         properties=props)
    assert sorted(r["ID"] for r in df.collect()) == list(range(20))

    dfp = load_jdbc_table(spark, "jdbc:derby:memory:jdbctest", "t_jdbc",
                          properties=props, partition_column="id",
                          num_partitions=4, lower_bound=0, upper_bound=20)
    assert dfp.rdd.getNumPartitions() == 4
    assert sorted(r["ID"] for r in dfp.collect()) == list(range(20))
