"""Small driver-side relations without the Python-RDD tax.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the rows
into a PythonRDD: EVERY downstream action on the result (a ``first()``,
a metadata ``write.json``, an oracle ``collect()``) then launches a
Python worker just to unpickle a handful of rows — measured ~4 s per
action on a large driver, which dominated index-metadata writes and the
small metric relations the bench collects.  Routing the same rows
through pandas takes Spark's Arrow conversion path instead: the data is
converted on the driver and shipped as ready JVM batches, so actions
never touch a Python worker.  With an explicit schema the resulting
rows are identical — values are staged with ``dtype=object`` so ``None``
stays a SQL NULL (a typed pandas column would coerce it to NaN).
"""

from __future__ import annotations


def local_df(spark, rows, schema):
    """Drop-in for ``spark.createDataFrame(rows, schema)`` on small
    driver-side row lists (tuples or Rows).  ``schema`` is a DDL string
    or a StructType and is REQUIRED — it is what pins the arrow-path
    result to the plain-list result bit for bit."""
    import pandas as pd
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        st = schema
    else:
        st = StructType.fromDDL(schema)
    data = [tuple(r) for r in rows]
    pdf = pd.DataFrame(data if data else None, columns=st.names,
                       dtype=object)
    return spark.createDataFrame(pdf, st)
