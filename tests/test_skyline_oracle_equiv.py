"""The scalable (window-sweep) skyline oracle must return the exact
row set of the definitional NOT-EXISTS dominance oracle.

The definitional form (oracles.py `skyline_orders`) encodes the
2D dominance predicate directly and stays the driver's sf0.01
correctness-gate oracle; the scalable form (`skyline_orders_scalable`)
replaces the quadratic self-join with two prefix-max window sweeps so
the sf0.1 baseline comparison measures the engine, not the oracle
(r11 verdict item 2). This test pins their equivalence — on the real
fixtures and on adversarial tie-heavy data where dominance edge cases
(equal price, equal ts, both equal) live.
"""

import random

import duckdb
import pytest

from distributedqueryengine_spark.inventory import BASELINE_ORACLE_OVERRIDES
from distributedqueryengine_spark.oracles import ORACLES

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_equivalent_on_fixtures(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    a = sorted(con.execute(ORACLES["skyline_orders"]).fetchall())
    b = sorted(con.execute(ORACLES["skyline_orders_scalable"]).fetchall())
    assert a == b
    assert len(a) > 0


def test_equivalent_on_tie_heavy_random():
    # Small value domains force heavy ties on BOTH skyline dimensions:
    # rows sharing ts (the RANGE CURRENT ROW vs 1 PRECEDING boundary)
    # and fully identical points (mutually non-dominating, both kept).
    rng = random.Random(0xD0D0)
    rows = [
        (
            i,                                # o_orderkey
            rng.randrange(50),                # o_custkey
            rng.choice("OFP"),                # o_orderstatus
            float(rng.randrange(8)),          # o_totalprice: 8 values
            "1997-01-0%d" % rng.randrange(1, 8),  # o_orderdate: 7 values
        )
        for i in range(600)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO orders VALUES (?,?,?,?,?)", rows)
    a = sorted(con.execute(ORACLES["skyline_orders"]).fetchall())
    b = sorted(con.execute(ORACLES["skyline_orders_scalable"]).fetchall())
    assert a == b
    assert len(a) > 0


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_override_composite_matches_driver_oracle(sf_dir):
    """The full order_limit_suite override (all five branches) returns
    the same rows as the driver-facing composite oracle."""
    from distributedqueryengine_spark.inventory import COMPOSITE_ORACLES

    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    a = sorted(con.execute(COMPOSITE_ORACLES["order_limit_suite"]).fetchall())
    b = sorted(
        con.execute(BASELINE_ORACLE_OVERRIDES["order_limit_suite"]).fetchall()
    )
    assert a == b
