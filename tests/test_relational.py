"""Unit tests for the relational operator core (SURVEY §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators import relational


@pytest.fixture(scope="module")
def ab(spark):
    a = spark.createDataFrame([Row(k=1, x="a"), Row(k=2, x="b"), Row(k=2, x="b2"), Row(k=3, x="c")])
    b = spark.createDataFrame([Row(k=2, y="B"), Row(k=3, y="C"), Row(k=4, y="D")])
    return a, b


def test_select_where(spark):
    df = spark.createDataFrame([Row(i=i, s=str(i)) for i in range(10)])
    out = relational.select_where(df, columns=["i"], predicate=F.col("i") > 7)
    assert out.columns == ["i"]
    assert sorted(r.i for r in out.collect()) == [8, 9]


def test_join_types(ab):
    a, b = ab
    on = a["k"] == b["k"]
    assert relational.join_tables(a, b, on, "inner").count() == 3
    assert relational.join_tables(a, b, on, "left").count() == 4
    assert relational.join_tables(a, b, on, "right").count() == 4
    assert relational.join_tables(a, b, on, "full").count() == 5
    assert relational.join_tables(a, b, on, "left_semi").count() == 3
    semi = relational.join_tables(a, b, on, "left_semi")
    assert semi.columns == ["k", "x"]
    anti = relational.join_tables(a, b, on, "left_anti")
    assert sorted(r.k for r in anti.collect()) == [1]
    assert relational.join_tables(a, b, on, "cross").count() == 12


def test_join_bad_type(ab):
    a, b = ab
    with pytest.raises(ValueError):
        relational.join_tables(a, b, a["k"] == b["k"], "sideways")


def test_union_all_bag_semantics(spark):
    df = spark.createDataFrame([Row(v=1), Row(v=2)])
    out = relational.union_all([df, df, df])
    assert out.count() == 6  # duplicates preserved (reference RPC.cs:330-342)


def test_set_ops(spark):
    l = spark.createDataFrame([Row(v=1), Row(v=1), Row(v=2), Row(v=3)])
    r = spark.createDataFrame([Row(v=1), Row(v=3), Row(v=4)])
    assert sorted(x.v for x in relational.set_op(l, r, "union").collect()) == [1, 2, 3, 4]
    assert relational.set_op(l, r, "union_all").count() == 7
    assert sorted(x.v for x in relational.set_op(l, r, "intersect").collect()) == [1, 3]
    assert sorted(x.v for x in relational.set_op(l, r, "except").collect()) == [2]
    # except_all keeps multiplicity: {1,1,2,3} - {1,3,4} = {1,2}
    assert sorted(x.v for x in relational.set_op(l, r, "except_all").collect()) == [1, 2]
