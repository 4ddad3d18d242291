"""CIN learned mode: per-subschema NAR models, chained estimation."""

import pytest

from scardina_spark.catalog import build_tpch_schema
from scardina_spark.estimators import ExactEstimator, prepare_tree_sample
from scardina_spark.estimators.cin import NarCinEstimator
from scardina_spark.estimators.sample import cin_tree
from scardina_spark.model import TrainConfig
from scardina_spark.model.join_bridge import train_join_estimator

SUBSCHEMAS = {
    # center -> (root, data columns)
    "customer": ("customer", ["customer.c_mktsegment", "customer.c_acctbal",
                              "nation.n_name"]),
    "nation": ("nation", ["nation.n_name", "region.r_name"]),
}


@pytest.fixture(scope="module")
def nar_cin(tables):
    sg = build_tpch_schema()
    est = NarCinEstimator()
    cfg = TrainConfig(epochs=15, d_word=12, d_ff=48, batch_size=512, seed=11)
    for center, (root, cols) in SUBSCHEMAS.items():
        ts = prepare_tree_sample(cin_tree(sg, center), tables, root,
                                 n_min=30_000, seed=11)
        est.add(train_join_estimator(ts, cols, cfg, sample_size=800))
    return est


@pytest.fixture(scope="module")
def exact(tables):
    return ExactEstimator(build_tpch_schema(), tables)


def qerr(e, t):
    return max(e / t, t / e) if e > 0 and t > 0 else float("inf")


def test_single_model_path(nar_cin, exact):
    sql = ("SELECT COUNT(*) FROM customer c, nation n "
           "WHERE c.c_nationkey = n.n_nationkey "
           "AND n.n_name LIKE 'NATION_1%'")  # 11 of 25 nations
    assert qerr(nar_cin.estimate(sql), exact.estimate(sql)) < 2.0


def test_chained_models(nar_cin, exact):
    sql = ("SELECT COUNT(*) FROM customer c, nation n, region r "
           "WHERE c.c_nationkey = n.n_nationkey "
           "AND n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'")
    got = nar_cin.estimate(sql)
    want = exact.estimate(sql)
    assert qerr(got, want) < 2.5, (got, want)


def test_uncovered_raises(nar_cin):
    from scardina_spark.estimators.sample import UnsupportedQueryError
    with pytest.raises(UnsupportedQueryError):
        nar_cin.estimate("SELECT COUNT(*) FROM lineitem WHERE l_quantity > 5")
