"""O4 column-ordering heuristics: all orders produce consistent estimates."""

import pytest

from scardina_spark.model import TrainConfig
from scardina_spark.model.bridge import train_single_table


@pytest.fixture(scope="module")
def est(tables):
    cols = ["l_returnflag", "l_linestatus", "l_quantity"]
    cfg = TrainConfig(epochs=12, d_word=10, d_ff=40, batch_size=512, seed=3)
    return train_single_table(tables["lineitem"], cols, cfg, sample_size=800)


SQL = ("SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'R' "
       "AND l_quantity > 25")


@pytest.mark.parametrize("order", ["prop-ratio", "prop", "domain-size",
                                   "nat", "inv", "prop-ratio-inv"])
def test_all_orderings_estimate(est, duck, order):
    est.order_by = order
    got = est.estimate(SQL)
    true = duck.sql(SQL).fetchone()[0]
    assert got > 0
    assert max(got / true, true / got) < 3.0, (order, got, true)


def test_unknown_ordering_raises(est):
    est.order_by = "bogus"
    with pytest.raises(ValueError):
        est.estimate(SQL)
    est.order_by = "prop-ratio"
