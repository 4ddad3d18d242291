"""Shipped IMDB / JOB-light schema declarations (reference
datasets.py:585-782, :812-890): graph shape, subschema names matching
the reference's recorded sub-join size keys, and an end-to-end smoke on
a tiny synthetic IMDB slice (CSV -> load -> fanout/weights ->
join-size parity with pandas)."""

from __future__ import annotations

import pytest

from scardina_spark.datasets_imdb import (
    IMDB_SUBSCHEMA_SIZES, IMDB_TABLES, JOB_LIGHT_SUBSCHEMA_SIZES,
    JOB_LIGHT_TABLES, build_imdb_schema, build_job_light_schema,
    load_imdb_tables, stage_imdb_parquet)


def test_imdb_schema_matches_reference_shape():
    sg = build_imdb_schema()
    assert len(sg.table_names) == 16  # 15 + link_type
    assert len(sg.relationships()) == 15
    # every reference sub-join size key IS one of our CIN subschema
    # names — the naming protocol round-trips
    names = set(sg.cin_subschemas())
    missing = set(IMDB_SUBSCHEMA_SIZES) - names
    assert not missing, missing
    # keep-lists carried into metadata
    assert sg.meta("cast_info").col_names == IMDB_TABLES["cast_info"][1]
    assert sg.meta("title").size == 2_528_313


def test_job_light_schema_matches_reference_shape():
    sg = build_job_light_schema()
    assert sorted(sg.table_names) == sorted(JOB_LIGHT_TABLES)
    assert len(sg.relationships()) == 5
    names = set(sg.cin_subschemas())
    assert set(JOB_LIGHT_SUBSCHEMA_SIZES) <= names
    # job-light keep-lists are the tight ones
    assert sg.meta("cast_info").col_names == ["movie_id", "role_id"]


def _write_slice_csvs(tmp_path):
    """A deterministic 3-table IMDB slice in the JOB CSV export shape
    (headered, backslash-escaped)."""
    (tmp_path / "title.csv").write_text(
        "id,kind_id,production_year\n"
        + "".join(f"{i},{i % 3 + 1},{1990 + i % 20}\n" for i in range(40)))
    (tmp_path / "movie_keyword.csv").write_text(
        "movie_id,keyword_id\n"
        + "".join(f"{i % 40},{i % 7}\n" for i in range(200)))
    (tmp_path / "movie_companies.csv").write_text(
        "movie_id,company_id,company_type_id\n"
        + "".join(f"{i % 25},{i % 5},{i % 2}\n" for i in range(60)))
    return str(tmp_path)


@pytest.fixture()
def slice_dir(tmp_path):
    return _write_slice_csvs(tmp_path)


def test_load_imdb_tables_projects_keep_lists(spark, slice_dir):
    sg = build_job_light_schema()
    # restrict to the three tables the slice provides
    import scardina_spark.datasets_imdb as M
    sub = {t: M.JOB_LIGHT_TABLES[t]
           for t in ("title", "movie_keyword", "movie_companies")}
    tables = {}
    for t, (_, cols) in sub.items():
        from scardina_spark.catalog import load_csv_table
        import os
        tables[t] = load_csv_table(
            spark, os.path.join(slice_dir, f"{t}.csv"), columns=cols)
    assert tables["title"].columns == ["id", "kind_id", "production_year"]
    assert tables["movie_keyword"].count() == 200
    assert tables["movie_companies"].columns == [
        "movie_id", "company_id", "company_type_id"]
    del sg


def test_slice_join_size_parity_with_pandas(spark, slice_dir):
    """The engine's fanout/weights machinery on the IMDB slice computes
    the same outer-join size pandas does — the j9-style check on the
    shipped schema instead of tpch."""
    import pandas as pd

    from scardina_spark.catalog import load_csv_table
    from scardina_spark.operators.fanout import fk_counts
    import os

    title = load_csv_table(spark, os.path.join(slice_dir, "title.csv"),
                           columns=["id", "kind_id", "production_year"])
    mk = load_csv_table(spark, os.path.join(slice_dir, "movie_keyword.csv"),
                        columns=["movie_id", "keyword_id"])
    # join size of title LEFT JOIN movie_keyword == sum of per-title
    # fanouts with dangling titles contributing 1 (the reference's
    # outer-join-size convention)
    fc = {r["movie_id"]: r["count"]
          for r in fk_counts(mk, "movie_id").collect()}
    pt = pd.DataFrame({"id": range(40)})
    pmk = pd.DataFrame({"movie_id": [i % 40 for i in range(200)]})
    want = len(pt.merge(pmk, left_on="id", right_on="movie_id",
                        how="left"))
    got = sum(fc.get(i, 1) or 1 for i in range(40))
    assert got == want


def test_stage_parquet_roundtrip(spark, tmp_path, slice_dir):
    """CSV -> parquet staging preserves rows and keep-lists; the loader
    then prefers the staged parquet."""
    import scardina_spark.datasets_imdb as M

    sub = {t: M.JOB_LIGHT_TABLES[t]
           for t in ("title", "movie_keyword", "movie_companies")}
    sg = build_job_light_schema()
    # monkeypatch-free: stage only the slice's tables via a pruned map
    orig = M.JOB_LIGHT_TABLES
    M.JOB_LIGHT_TABLES = sub
    try:
        out = str(tmp_path / "staged")
        counts = stage_imdb_parquet(spark, slice_dir, out, schema=sg)
        assert counts == {"title": 40, "movie_keyword": 200,
                          "movie_companies": 60}
        tables = load_imdb_tables(spark, out, schema=sg)
        assert tables["title"].columns == [
            "id", "kind_id", "production_year"]
        assert tables["movie_keyword"].count() == 200
    finally:
        M.JOB_LIGHT_TABLES = orig


def test_loader_raises_on_missing_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="title"):
        load_imdb_tables(spark, str(tmp_path),
                         schema=build_job_light_schema())


def _write_full_slice(tmp_path):
    """All six JOB-light tables as a tiny deterministic slice."""
    d = tmp_path / "imdb"
    d.mkdir()
    (d / "title.csv").write_text(
        "id,kind_id,production_year\n"
        + "".join(f"{i},{i % 3 + 1},{1990 + i % 20}\n" for i in range(40)))
    (d / "movie_companies.csv").write_text(
        "movie_id,company_id,company_type_id\n"
        + "".join(f"{i % 25},{i % 5},{i % 2}\n" for i in range(60)))
    (d / "cast_info.csv").write_text(
        "movie_id,role_id\n"
        + "".join(f"{i % 40},{i % 11 + 1}\n" for i in range(300)))
    (d / "movie_info.csv").write_text(
        "movie_id,info_type_id\n"
        + "".join(f"{i % 40},{i % 6 + 1}\n" for i in range(120)))
    (d / "movie_info_idx.csv").write_text(
        "movie_id,info_type_id\n"
        + "".join(f"{i % 40},{99 + i % 3}\n" for i in range(80)))
    (d / "movie_keyword.csv").write_text(
        "movie_id,keyword_id\n"
        + "".join(f"{i % 40},{i % 7}\n" for i in range(200)))
    return str(d)


def test_cli_estimate_and_bench_on_imdb_slice(capsys, spark, tmp_path):
    """`estimate --schema imdb` and `bench --schema imdb
    --benchmark-csv job-light.csv` run the reference's own benchmark
    format end-to-end on a synthetic slice: exact truths match DuckDB
    and the HT-sample q-errors are finite."""
    import json as _json

    import duckdb

    from scardina_spark.__main__ import main

    d = _write_full_slice(tmp_path)
    sqls = [
        "SELECT COUNT(*) FROM movie_keyword mk,title t WHERE "
        "t.id=mk.movie_id AND t.production_year>2000",
        "SELECT COUNT(*) FROM movie_companies mc,title t,movie_info_idx"
        " mi_idx WHERE t.id=mc.movie_id AND t.id=mi_idx.movie_id AND "
        "mi_idx.info_type_id=100 AND mc.company_type_id=1",
    ]
    con = duckdb.connect()
    for t in ("title", "movie_keyword", "movie_companies",
              "movie_info_idx"):
        con.sql(f"create view {t} as select * from "
                f"read_csv_auto('{d}/{t}.csv', header=true)")
    truths = [con.sql(s).fetchone()[0] for s in sqls]
    assert all(t > 0 for t in truths)

    # exact estimator through the CLI == DuckDB truth
    for s, want in zip(sqls, truths):
        rc = main(["estimate", "--sf-dir", d, "--schema", "imdb",
                   "--sql", s, "--estimator", "exact"])
        assert rc == 0
        out = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert out["estimate"] == want, (s, out, want)

    # the reference's benchmark CSV format, end-to-end via bench
    bench_csv = tmp_path / "job-light-slice.csv"
    with open(bench_csv, "w") as f:
        f.write("true_cardinality,sql\n")
        for s, t in zip(sqls, truths):
            f.write(f'{t},"{s};"\n')
    rc = main(["bench", "--sf-dir", d, "--schema", "imdb",
               "--benchmark-csv", str(bench_csv)])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_queries"] == 2
    assert out["q_p100"] >= 1.0 and out["q_p100"] < float("inf")
