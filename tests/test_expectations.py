"""Data-expectations tests: one-scan rule evaluation, NULL = violation,
referential orphan counting."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_spark.operators.expectations import (
    Expectation,
    check_expectations,
    referential_violations,
)


def test_rules_evaluate_in_one_pass_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [Row(x=1, s="ok"), Row(x=-1, s="ok"), Row(x=None, s=None)],
        "x int, s string",
    )
    out = {
        r.rule: (r.n_rows, r.n_violations, r.pass_rate)
        for r in check_expectations(
            df,
            [
                Expectation("x_positive", F.col("x") > 0),   # NULL -> violation
                Expectation("s_not_null", F.col("s").isNotNull()),
            ],
        ).collect()
    }
    assert out == {
        "x_positive": (3, 2, 0.333333),
        "s_not_null": (3, 1, 0.666667),
    }
    # one aggregate scan: plan has exactly one Aggregate over the relation
    plan = check_expectations(
        df, [Expectation(f"r{i}", F.col("x") > i) for i in range(10)]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2  # partial+final, never 10 scans


def test_referential_orphans(spark):
    child = spark.createDataFrame([Row(fk=1), Row(fk=2), Row(fk=99)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    r = referential_violations(child, parent, "fk", "pk").collect()[0]
    assert (r.rule, r.n_rows, r.n_violations, r.pass_rate) == (
        "fk_references_pk", 3, 1, 0.666667,
    )


def test_empty_input_reports_zero_violations(spark):
    df = spark.createDataFrame([], "x int")
    r = check_expectations(df, [Expectation("x_pos", F.col("x") > 0)]).collect()[0]
    assert (r.n_rows, r.n_violations, r.pass_rate) == (0, 0, 1.0)


def test_referential_is_lazy_and_rounds_half_up(spark):
    # 128 rows, 127 orphans: 1/128 = 0.0078125 must round HALF_UP to
    # 0.007813 like F.round / SQL ROUND (Python round() gives 0.007812)
    child = spark.createDataFrame([Row(fk=i) for i in range(128)])
    parent = spark.createDataFrame([Row(pk=0)])
    rep = referential_violations(child, parent, "fk", "pk")
    r = rep.collect()[0]
    assert (r.n_rows, r.n_violations, r.pass_rate) == (128, 127, 0.007813)


def test_zero_rules_is_trivially_clean(spark):
    # an empty rule list must yield an empty report, not an analysis error
    # (F.array() of zero structs has VOID element type)
    df = spark.createDataFrame([Row(x=1)])
    rep = check_expectations(df, [])
    assert rep.count() == 0
    assert rep.columns == ["rule", "n_rows", "n_violations", "pass_rate"]
