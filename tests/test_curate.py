"""Composed curation pipeline: stage semantics on a hand fixture, plus
the sf-table run against DuckDB (the contract mirror re-checks the same
oracle; here we pin WHICH stage dropped each hand-crafted document)."""

from pyspark.sql import functions as F

from scardina_spark.operators.curate import curate_corpus

GOOD = ("the quick brown fox jumps over the lazy dog and then the "
        "fox runs far away to find some other good food today")


def _fixture(spark):
    rows = [
        # benchmark slice (source = src0): excluded AND contaminating
        (0, "held out benchmark question about spark engines", "src0"),
        # clean survivor
        (1, GOOD, "web"),
        # contaminated: contains a benchmark 4-gram verbatim
        (2, GOOD + " held out benchmark question indeed", "web"),
        # repetitive: one token repeated (dup_token_fraction ~ 1)
        (3, " ".join(["spam"] * 40), "web"),
        # exact duplicate of 1 (dedup keeps the lower id)
        (4, GOOD, "web"),
        # good but different content — second survivor
        (5, "a completely different clean document with many various "
            "plain common words that score well on every quality rule "
            "and the text keeps going for a while longer", "web"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_each_stage_drops_its_document(spark):
    out = {r["doc_id"]: r for r in
           curate_corpus(_fixture(spark), seq_len=16).collect()}
    assert sorted(out) == [1, 5]          # 0=bench, 2=contam, 3=rep, 4=dup
    # packing: doc 1 first on the line, doc 5 follows contiguously
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (0, 0)
    n1 = out[1]["n_tokens"]
    assert out[5]["pack_id"] == n1 // 16
    assert out[5]["pack_offset"] == n1 % 16


def test_matches_duckdb_composition(tables, duck):
    from scardina_spark.queries import sql_curate_corpus

    got = [(r["doc_id"], r["n_tokens"], r["pack_id"], r["pack_offset"],
            r["n_packs"])
           for r in curate_corpus(tables["documents"], seq_len=128)
           .orderBy("doc_id").collect()]
    want = [(r[0], r[3], r[4], r[5], r[6])
            for r in duck.sql(sql_curate_corpus()).fetchall()]
    assert got == want
    assert len(got) > 50  # discriminating, not vacuous


def test_pipeline_is_one_lazy_jvm_plan(spark, tables):
    """The composition must stay JVM-side: no Python row UDF (BatchEval)
    anywhere; the only Python boundary allowed is the packing prefix
    sum's Arrow batches."""
    plan = (curate_corpus(tables["documents"], seq_len=128)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan


def test_stream_curate_revises_and_suppresses(spark, tmp_path):
    """Stateful fingerprint dedup across micro-batches: a later batch
    with a LOWER doc id revises the key (update emitted); a replay of an
    already-beaten id emits nothing."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scardina_spark.streaming.curate import curate_doc_stream
    from scardina_spark.streaming.events import run_to_memory_sink

    other = ("a completely different clean document with many various "
             "plain common words that score well on every quality rule "
             "and the text keeps going for a while longer")
    d = str(tmp_path)

    def write(name, rows, mtime):
        t = pa.table({"doc_id": pa.array([r[0] for r in rows],
                                         type=pa.int64()),
                      "text": [r[1] for r in rows],
                      "source": [r[2] for r in rows]})
        p = os.path.join(d, name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    now = time.time()
    write("documents.parquet", [(5, GOOD, "web")], now - 30)
    write("documents-2.parquet", [(3, GOOD, "web"), (9, other, "web")],
          now - 20)
    write("documents-3.parquet", [(5, GOOD, "web")], now - 10)

    schema = spark.read.parquet(os.path.join(d, "documents.parquet")).schema
    st = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "documents*.parquet").parquet(d))
    out = run_to_memory_sink(curate_doc_stream(st),
                             "t_stream_curate_rev", output_mode="update")
    rows = out.collect()
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fingerprint"], []).append(r["doc_id"])
    assert len(by_fp) == 2
    good_fp = [fp for fp, ids in by_fp.items() if 5 in ids or 3 in ids][0]
    # batch 1 admitted 5, batch 2 revised to 3, batch 3's replay of 5
    # was suppressed — exactly two updates for the duplicated content
    assert by_fp[good_fp] == [5, 3]
    assert sum(len(v) for v in by_fp.values()) == 3


def test_optional_gopher_gates_compose(spark, tables):
    """The opt-in Gopher gates subset the default selection exactly as
    the standalone operators would; default-off keeps x40 unchanged."""
    from scardina_spark.operators.curate import curate_corpus
    from scardina_spark.operators.gopher import repetition_signals

    docs = tables["documents"]
    base = curate_corpus(docs)
    ids_base = {r["doc_id"] for r in base.select("doc_id").collect()}
    rep = curate_corpus(docs, repetition_battery=True)
    ids_rep = {r["doc_id"] for r in rep.select("doc_id").collect()}
    assert ids_rep <= ids_base
    # the gate's own verdict reproduces the subset
    keep = {r["doc_id"] for r in repetition_signals(docs)
            .where("rep_keep").select("doc_id").collect()}
    assert ids_rep == ids_base & keep
    # gopher_rules on this corpus rejects everything (no 2 distinct
    # stop words) -> empty but well-formed result
    gop = curate_corpus(docs, gopher_rules=True)
    assert gop.count() == 0
