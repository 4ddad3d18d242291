"""Plan-cost injection through an external database (the PPC loop).

Reference protocol (scardina/run.py:980-1008 + the CEB eval_ppc hand-off
— protocol, NOT code): export ONE cardinality prediction per connected
subquery node, store the predictions in an external database, and have a
planner consume the injected cards, comparing the plan it chooses
against the truth-optimal plan.  The reference needs a live Postgres for
this; here the bundled Derby embedded database plays the card store —
written through Spark's JDBC writer and read back through the SAME
partitioned JDBC source used for table reads (catalog.load_jdbc_table)
— and the self-contained C_out/C_smj planner (estimators/perror.py)
plays the Postgres planner.  The loop is therefore closed end to end
without any environment-bound service.
"""

from __future__ import annotations

import os

from ..localrel import local_df

from .perror import p_error, parse_query


def inject_cards(spark, rows: list[dict], url: str | None = None,
                 table: str = "ppc_cards",
                 driver: str = "org.apache.derby.jdbc.EmbeddedDriver"
                 ) -> dict[str, int]:
    """Write per-node cards into the external DB and read them back
    through the partitioned JDBC source.  ``rows`` are artifact rows
    (``{node, card, ...}``) for ONE query.  Returns node -> card as the
    PLANNER will see them — i.e., after the external round trip, so any
    store/read corruption surfaces in the planner's input, exactly as it
    would against a real card store."""
    from ..catalog import load_jdbc_table

    url = url or f"jdbc:derby:memory:scardina_ppc_{os.getpid()};create=true"
    df = local_df(spark, 
        [(i, r["node"], int(r["card"])) for i, r in enumerate(rows)],
        "card_id int, node string, card long")
    (df.write.format("jdbc").option("url", url).option("dbtable", table)
     .option("driver", driver).mode("overwrite").save())
    back = load_jdbc_table(
        spark, url, table, {"driver": driver},
        partition_column="card_id", num_partitions=4,
        lower_bound=0, upper_bound=max(len(rows), 1))
    return {r["node"]: int(r["card"]) for r in back.collect()}


def plan_with_injected(sql: str, cards: dict[str, int],
                       truths: dict[str, int]) -> dict[str, float]:
    """p-error of the injected cards on ``sql`` under both cost models,
    with truths from the recorded artifact (node -> exact card).  A
    missing node raises KeyError — a silently absent injection would
    fake a perfect score."""
    pq = parse_query(sql)

    def by_node(table: dict[str, int]):
        def fn(frag):
            return float(table[" ".join(sorted(frag.tables))])
        return fn

    return {
        "pe_out": p_error(pq, by_node(cards), by_node(truths)),
        "pe_smj": p_error(pq, by_node(cards), by_node(truths),
                          cost_model="smj"),
    }
