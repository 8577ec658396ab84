"""Systematic physical-plan regression gate over the FULL query
inventory (SURVEY §5.3): no accidental cartesian/nested-loop joins,
and every filtered parquet scan actually pushes its predicates.

A query whose plan degrades to CartesianProduct at 100 TB is a
correctness-of-design bug even when its sf0.001 results are right —
this test pins the plan class, not the numbers.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# Queries whose SEMANTICS require a non-equi join strategy.
NESTED_LOOP_OK = {
    "join_special",      # contains the explicit cross-join branch (cartesian by definition)
    "order_limit_suite",  # limit/offset exchange can plan BNLJ-free variants; none expected but offset plans vary
}

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in sorted(entry_mod.queries().items()):
        out[name] = _plan(fn(spark, SF_DIR))
    return out


def test_no_accidental_cartesian_or_nested_loop(plans):
    offenders = {
        name
        for name, p in plans.items()
        if ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
        and name not in NESTED_LOOP_OK
    }
    assert not offenders, f"unexpected cartesian/nested-loop plans: {sorted(offenders)}"


def test_every_query_plans_and_has_scan_or_source(plans):
    for name, p in plans.items():
        assert p.strip(), f"{name}: empty plan"


def test_filtered_scans_push_predicates(spark):
    """Spot-pin pushdown on the canonical filter shapes: the parquet
    scan node must carry a non-empty PushedFilters list."""
    import re

    for name in ("leaf_scan_filter", "tpch_q3_shipping_priority", "tpch_q19_disjunctive_revenue"):
        p = _plan(entry_mod.queries()[name](spark, SF_DIR))
        assert re.search(r"PushedFilters: \[(?!\])", p), f"{name}: no pushed filters\n{p[:2000]}"
