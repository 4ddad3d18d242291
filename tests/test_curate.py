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
