"""One-pass table profiling: stats match hand counts; the approx mode
keeps one scan and no Expand blow-up."""

from pyspark.sql import functions as F

from scardina_spark.operators.profile import profile_table


def test_profile_hand_fixture(spark):
    rows = [(1, "a", 1.5), (2, "a", None), (3, None, 2.5), (3, "b", 2.5)]
    df = spark.createDataFrame(rows, ["k", "s", "x"])
    got = {r["column"]: r.asDict()
           for r in profile_table(df, exact=True).collect()}
    assert got["k"]["n_rows"] == 4
    assert got["k"]["n_distinct"] == 3
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 3.0
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_num"] is None  # non-numeric: no range
    assert got["x"]["n_nulls"] == 1
    assert got["x"]["min_num"] == 1.5 and got["x"]["max_num"] == 2.5


def test_profile_approx_mode_single_scan(spark, tables):
    df = tables["orders"]
    prof = profile_table(df, ["o_orderkey", "o_orderstatus"], exact=False)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "Expand" not in plan  # approx distinct avoids the expansion
    got = {r["column"]: r["n_distinct"] for r in prof.collect()}
    exact = {c: df.select(c).distinct().count()
             for c in ["o_orderkey", "o_orderstatus"]}
    for c in exact:
        assert abs(got[c] - exact[c]) <= max(0.1 * exact[c], 2), (c, got)


def test_profile_empty_frame_and_empty_cols(spark):
    import pytest

    from pyspark.sql.types import (LongType, StructField, StructType)

    schema = StructType([StructField("x", LongType())])
    empty = spark.createDataFrame([], schema)
    r = profile_table(empty).first()
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
    with pytest.raises(ValueError):
        profile_table(empty, cols=[])


def test_ks_drift_matches_reference(spark, tables):
    from scardina_spark.operators.profile import ks_drift

    docs = tables["documents"]
    a = [r["n_chars"] for r in
         docs.where("source = 'src0'").select("n_chars").collect()]
    b = [r["n_chars"] for r in
         docs.where("source <> 'src0'").select("n_chars").collect()]

    def ecdf_gap(a, b):
        import bisect
        sa, sb = sorted(a), sorted(b)
        best, at = -1.0, None
        for v in sorted(set(sa) | set(sb)):
            g = round(abs(bisect.bisect_right(sa, v) / len(sa)
                          - bisect.bisect_right(sb, v) / len(sb)), 6)
            if g > best:
                best, at = g, v
        return best, at

    want_d, want_at = ecdf_gap(a, b)
    r = ks_drift(docs.where("source = 'src0'"),
                 docs.where("source <> 'src0'"), "n_chars").first()
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert r["d_stat"] == want_d
    assert r["at_value"] == want_at


def test_ks_drift_degenerate_cases(spark):
    import pytest

    from scardina_spark.operators.profile import ks_drift

    same = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], "x: long")
    r = ks_drift(same, same, "x").first()
    assert r["d_stat"] == 0.0
    lo = spark.createDataFrame([(v,) for v in [1, 2]], "x: long")
    hi = spark.createDataFrame([(v,) for v in [10, 11]], "x: long")
    assert ks_drift(lo, hi, "x").first()["d_stat"] == 1.0
    empty = spark.createDataFrame([], "x: long")
    with pytest.raises(ValueError):
        ks_drift(empty, lo, "x")


def test_ks_gaps_plan_is_distributed(spark, tables):
    """Scale pin: the ECDF relation is built with the prefix-sum
    machinery over a range-partitioned sort — NO Window operator and NO
    single-partition Exchange anywhere (continuous columns at 100 TB
    have corpus-sized distinct-value relations; an
    ``Window.orderBy(v)`` ECDF would funnel the corpus through one
    task)."""
    from scardina_spark.operators.profile import ks_ecdf_gaps

    docs = tables["documents"]
    gaps, n_a, n_b = ks_ecdf_gaps(docs.where("source = 'src0'"),
                                  docs.where("source <> 'src0'"),
                                  "n_chars")
    plan = gaps._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan, plan  # the distributed sort
    assert n_a > 0 and n_b > 0


def test_chisq_drift_matches_reference(spark, tables):
    from collections import Counter

    from scardina_spark.operators.profile import chisq_drift

    ev = tables["events"]
    a = [r["event_type"] for r in
         ev.where("user_id % 2 = 0").select("event_type").collect()]
    b = [r["event_type"] for r in
         ev.where("user_id % 2 = 1").select("event_type").collect()]
    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    n = float(na + nb)
    chi2 = 0.0
    for v in set(ca) | set(cb):
        ka, kb = ca.get(v, 0), cb.get(v, 0)
        ea = (ka + kb) * (na / n)
        eb = (ka + kb) * (nb / n)
        chi2 += (ka - ea) ** 2 / ea + (kb - eb) ** 2 / eb
    r = chisq_drift(ev.where("user_id % 2 = 0"),
                    ev.where("user_id % 2 = 1"), "event_type").first()
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["n_categories"] == len(set(ca) | set(cb))
    assert r["chi2"] == round(chi2, 4)


def test_chisq_drift_degenerate(spark):
    import pytest

    from scardina_spark.operators.profile import chisq_drift

    same = spark.createDataFrame(
        [("x",), ("y",), ("x",), ("y",)], "c: string")
    assert chisq_drift(same, same, "c").first()["chi2"] == 0.0
    one_cat = spark.createDataFrame([("x",), ("x",)], "c: string")
    with pytest.raises(ValueError, match="categories"):
        chisq_drift(one_cat, one_cat, "c")
    empty = spark.createDataFrame([], "c: string")
    with pytest.raises(ValueError):
        chisq_drift(empty, same, "c")


def test_robust_outliers_crafted(spark):
    """Median/MAD semantics: a planted spike is flagged, the spike
    cannot drag the scale (unlike mean/std), zero-MAD groups yield
    NULL z and no flags, winsorizing clips to the in-group quantiles."""
    from scardina_spark.operators.profile import robust_outliers
    rows = ([(1, i, 10.0 + (i % 5)) for i in range(20)]  # values 10..14
            + [(1, 99, 1000.0)]                          # the spike
            + [(2, i, 7.0) for i in range(10)])          # constant group
    df = spark.createDataFrame(rows, "g: long, i: long, v: double")
    out = {(r["g"], r["i"]): r for r in
           robust_outliers(df, "g", "v", id_cols=["i"]).collect()}
    assert out[(1, 99)]["is_outlier"]
    flagged = [k for k, r in out.items() if r["is_outlier"]]
    assert flagged == [(1, 99)]
    # constant group: mad == 0 -> NULL z, no flags
    assert out[(2, 0)]["robust_z"] is None
    assert not out[(2, 0)]["is_outlier"]
    # the spike is clipped to the group's 95th percentile
    assert out[(1, 99)]["clipped"] < 1000.0
    assert out[(1, 0)]["clipped"] >= 10.0


def test_robust_outliers_broadcasts_stats(spark, tables):
    """Scale pin: both stat relations join back via broadcast — no
    sort-merge on the fact rows."""
    from scardina_spark.operators.profile import robust_outliers
    plan = (robust_outliers(tables["events"], "user_id", "value",
                            id_cols=["event_id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_robust_outliers_validates(spark, tables):
    import pytest
    from scardina_spark.operators.profile import robust_outliers
    with pytest.raises(ValueError, match="winsor"):
        robust_outliers(tables["events"], "user_id", "value",
                        winsor=(0.9, 0.1))
