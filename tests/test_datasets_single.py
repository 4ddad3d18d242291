"""Shipped dmv / flight-delays one-table declarations
(datasets_single.py — reference datasets.py:425-571): variant
keep-lists match the reference's commented-out column subsets, the
loaders project + cast at the source from CSV or staged parquet, and
the edgeless UR tree drives the sampler fallback."""

import pytest

from scardina_spark.datasets_single import (
    DMV_COLUMNS, DMV_VARIANTS, FLIGHT_DELAYS_COLUMNS, build_dmv_schema,
    build_flight_delays_schema, load_dmv, load_flight_delays)

DMV_ROWS = [
    ("PAS", "CL1", "NY", "1", "SUV", "GAS", "2020-01-05 00:00:00",
     "RED", "N", "N", "N"),
    ("COM", "CL2", "NJ", "2", "VAN", "DIESEL", "2021-06-09 00:00:00",
     "BLUE", "Y", "N", "N"),
    ("PAS", "CL1", "NY", "3", "SDN", "ELECTRIC",
     "2022-11-30 00:00:00", "RED", "N", "Y", "N"),
]


def _write_dmv_csv(tmp_path):
    p = tmp_path / "dmv.csv"
    lines = [",".join(f'"{c}"' for c in DMV_COLUMNS)]
    lines += [",".join(f'"{v}"' for v in r) for r in DMV_ROWS]
    p.write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def test_variant_keep_lists_match_reference():
    """datasets.py:425 keeps all 11; :457 comments out Record Type;
    :486 also County; :515 keeps only the last 6."""
    assert len(DMV_COLUMNS) == 11
    assert DMV_VARIANTS["dmv"] == DMV_COLUMNS
    assert DMV_VARIANTS["dmv-1"] == DMV_COLUMNS[1:]
    assert "County" not in DMV_VARIANTS["dmv-2"]
    assert "Record Type" not in DMV_VARIANTS["dmv-2"]
    assert len(DMV_VARIANTS["dmv-2"]) == 9
    assert DMV_VARIANTS["dmv-5"] == [
        "Fuel Type", "Reg Valid Date", "Color", "Scofflaw Indicator",
        "Suspension Indicator", "Revocation Indicator"]
    assert len(FLIGHT_DELAYS_COLUMNS) == 12


def test_schemas_are_one_table_edgeless():
    from scardina_spark.estimators.sample import spanning_tree
    for v in DMV_VARIANTS:
        sg = build_dmv_schema(v)
        assert sg.table_names == ["dmv"]
        assert spanning_tree(sg, "dmv").rels == ()
    sg = build_flight_delays_schema()
    assert sg.table_names == ["flight_delays"]
    with pytest.raises(ValueError, match="variant"):
        build_dmv_schema("dmv-9")


def test_load_dmv_csv_projects_and_casts(spark, tmp_path):
    d = _write_dmv_csv(tmp_path)
    full = load_dmv(spark, d)
    assert full.columns == DMV_COLUMNS
    assert dict(full.dtypes)["Reg Valid Date"] == "timestamp"
    assert full.count() == 3
    v5 = load_dmv(spark, d, variant="dmv-5")
    assert v5.columns == DMV_VARIANTS["dmv-5"]
    with pytest.raises(ValueError, match="variant"):
        load_dmv(spark, d, variant="nope")
    with pytest.raises(FileNotFoundError):
        load_dmv(spark, str(tmp_path / "missing"))


def test_load_dmv_prefers_staged_parquet(spark, tmp_path):
    d = _write_dmv_csv(tmp_path)
    load_dmv(spark, d).write.parquet(str(tmp_path / "dmv.parquet"))
    again = load_dmv(spark, d, variant="dmv-2")
    assert again.columns == DMV_VARIANTS["dmv-2"]
    assert again.count() == 3


def test_load_flight_delays_csv(spark, tmp_path):
    p = tmp_path / "flight-delays.csv"
    header = ",".join(FLIGHT_DELAYS_COLUMNS)
    p.write_text(header + "\n"
                 + "2015,AA,JFK,NY,LAX,CA,5.0,10,8,2.5,330,2475\n"
                 + "2015,DL,ATL,GA,ORD,IL,-3.0,12,6,-8.0,95,606\n")
    fl = load_flight_delays(spark, str(tmp_path))
    assert fl.columns == FLIGHT_DELAYS_COLUMNS
    assert dict(fl.dtypes)["YEAR_DATE"] == "float"
    assert fl.count() == 2


def test_single_table_ur_sampler_fallback(spark, tmp_path):
    """The edgeless tree through prepare_tree_sample: join size is the
    row count, every weight 1, and a full-coverage estimate of a
    predicate lands near exact."""
    from scardina_spark.estimators import ExactEstimator, SampleEstimator
    from scardina_spark.estimators.sample import (prepare_tree_sample,
                                                  spanning_tree)
    d = _write_dmv_csv(tmp_path)
    dmv = load_dmv(spark, d, variant="dmv-1")
    sg = build_dmv_schema("dmv-1")
    ts = prepare_tree_sample(spanning_tree(sg, "dmv"), {"dmv": dmv},
                             "dmv", n_min=3000, n_max=3000, seed=7)
    assert ts.join_size == 3
    se = SampleEstimator()
    se.add(ts)
    ex = ExactEstimator(sg, {"dmv": dmv})
    sql = "SELECT COUNT(*) FROM dmv WHERE Color = 'RED'"
    assert ex.estimate(sql) == 2
    assert abs(se.estimate(sql) - 2) < 0.2
    ts.sample.unpersist()
