"""Declarative data-quality expectations, evaluated in ONE pass.

The reference validates ad hoc: Pydantic per-row at scrape time
(``product_models.py:64-91``), then a post-load SQL rollup
(``staging_schema.py:75-91``) — each rule its own query.  Here a rule set
over a table compiles into a single aggregate scan (`sum(violation)` per
rule + one total count), the Delta-Live-Tables-expectations shape:

- row-level rules are plain boolean Columns — arbitrarily composable,
  pushed into the same whole-stage-codegen'd pass;
- referential rules (child key must exist in a parent table) are
  broadcast anti-join counts — the parent's key set is typically the
  small side, so the child table is scanned once and never shuffled;
- output is one tidy row per rule: (rule, n_rows, n_violations,
  pass_rate) — the report a pipeline gate thresholds on.

At 100 TB: k row-level rules cost ONE table scan regardless of k (the
naive one-query-per-rule form costs k scans).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    """A named row-level rule; ``predicate`` is True for PASSING rows.
    NULL predicate results count as violations (unknown is not a pass)."""

    name: str
    predicate: Column


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all row-level rules in one aggregate scan.

    Returns (rule, n_rows, n_violations, pass_rate) — one row per rule,
    ``pass_rate`` rounded to 6 so reports hash-compare across engines.
    An empty rule list yields an empty report (a zero-rule audit is
    trivially clean; ``F.array()`` of zero structs would otherwise fail
    analysis with a VOID element type).
    """
    if not expectations:
        return df.sparkSession.createDataFrame(
            [], "rule string, n_rows long, n_violations long, pass_rate double"
        )
    viol = [
        # coalesce the SUM too: over zero rows it is NULL, and an empty
        # input must still report (n_violations=0, pass_rate defined)
        F.coalesce(
            F.sum(F.when(F.coalesce(e.predicate, F.lit(False)), 0).otherwise(1)),
            F.lit(0),
        ).alias(f"_v{i}")
        for i, e in enumerate(expectations)
    ]
    agg = df.agg(F.count(F.lit(1)).alias("_n"), *viol)
    # unpivot the single wide row into one row per rule
    pairs = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("rule"), F.col(f"_v{i}").cast("long").alias("n_violations")
            )
            for i, e in enumerate(expectations)
        ]
    )
    return (
        agg.select(F.col("_n").cast("long").alias("n_rows"), F.explode(pairs).alias("_p"))
        .select(
            F.col("_p.rule").alias("rule"),
            "n_rows",
            F.col("_p.n_violations").alias("n_violations"),
            F.when(F.col("n_rows") == 0, F.lit(1.0))
            .otherwise(
                F.round(
                    (F.col("n_rows") - F.col("_p.n_violations")) / F.col("n_rows"), 6
                )
            )
            .alias("pass_rate"),
        )
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule: str | None = None,
) -> DataFrame:
    """Referential-integrity rule: child rows whose key has no parent.

    Same report shape as :func:`check_expectations` (one row), built as a
    LAZY plan (constructing the report runs no jobs): one aggregate for
    the total count crossJoined with the anti-join violation count — the
    parent key set joins broadcast/AQE anti, and the child never shuffles.
    Rounding uses the same F.round (HALF_UP) regime as the row-level
    rules, so mixed reports hash-compare consistently against SQL oracles.
    NULL child keys are orphans by definition here (use a row-level
    not-null rule to report them separately)."""
    name = rule or f"{child_key}_references_{parent_key}"
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        child.join(
            parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return total.crossJoin(orphans).select(
        F.lit(name).alias("rule"),
        "n_rows",
        "n_violations",
        F.when(F.col("n_rows") == 0, F.lit(1.0))
        .otherwise(
            F.round((F.col("n_rows") - F.col("n_violations")) / F.col("n_rows"), 6)
        )
        .alias("pass_rate"),
    )
