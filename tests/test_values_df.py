"""catalog.values_df: the VALUES-LocalRelation twin of
createDataFrame(list) for config tables (OPTIMIZATION_r13 wave 9).

The contract under test: identical column names, dataTypes and rows
to the createDataFrame call it replaces (both DDL-string and
inferred column-name modes), exact float round-tripping through the
SQL parser, safe string escaping, and — the point of the helper — a
plan that is a LocalTableScan, not a parallelized Python RDD. The
ONE deliberate schema difference is pinned here too: all-non-null
columns analyze as nullable=false (strictly more precise; invisible
to the driver contract, which compares column names + value hashes).
"""

import math

import pytest

from powersql_spark.catalog import values_df


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _names_types(df):
    return [(f.name, f.dataType) for f in df.schema.fields]


def test_ddl_mode_matches_createdataframe(spark):
    data = [("a", 1, 0.5), ("b'; --", -2, 1e-17), ("c\\d", 3, float("nan"))]
    ddl = "name string, k int, x double"
    a = spark.createDataFrame(data, ddl)
    b = values_df(spark, data, ddl)
    assert _names_types(a) == _names_types(b)
    ra, rb = _rows(a), _rows(b)
    for ta, tb in zip(ra, rb):
        assert ta[:2] == tb[:2]
        assert (
            math.isnan(ta[2]) and math.isnan(tb[2])
        ) or ta[2] == tb[2]


def test_inferred_mode_matches_createdataframe(spark):
    # Python int -> LongType, float -> DoubleType, str -> StringType,
    # bool -> BooleanType: the createDataFrame inference rules.
    data = [(1, 0.1, "x", True), (2, 2.5, "y", False)]
    a = spark.createDataFrame(data, ["i", "f", "s", "b"])
    b = values_df(spark, data, ["i", "f", "s", "b"])
    assert _names_types(a) == _names_types(b)
    assert _rows(a) == _rows(b)


def test_nullability_is_the_one_difference(spark):
    # All-non-null literal columns analyze as nullable=false (the
    # deliberate, documented tightening); mixed-null columns stay
    # nullable=true like the inferring call.
    b = values_df(spark, [(1, "x"), (2, None)], ["k", "s"])
    flags = {f.name: f.nullable for f in b.schema.fields}
    assert flags == {"k": False, "s": True}


def test_float_literals_roundtrip_exactly(spark):
    # repr() is shortest-roundtrip: the parsed double must carry the
    # identical IEEE-754 bits for awkward values.
    vals = [0.1, 1 / 3, 2.5758, 1e300, 5e-324, -0.0]
    out = values_df(spark, [(v,) for v in vals], ["x"]).collect()
    assert sorted(r["x"] for r in out) == sorted(vals)


def test_nulls_and_empty(spark):
    df = values_df(spark, [(None, 1), ("z", None)], "s string, k int")
    assert _rows(df) == sorted([(None, 1), ("z", None)], key=repr)
    with pytest.raises(ValueError):
        values_df(spark, [], "s string")


def test_plan_is_local_relation_not_python_rdd(spark):
    df = values_df(spark, [(1, "a"), (2, "b")], ["k", "v"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    bplan = base._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in bplan  # what the helper removes
