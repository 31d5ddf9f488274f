"""Hierarchical category dimension: path arrays → parent/child edges +
subtree rollups.

The reference stores categories as a self-referencing hierarchy
(``bigquery_schemas/DimCategory.sql:4-8`` — ``parent_category_id``) while
scrapers emit root-to-leaf ``category_path`` arrays
(``scrapers/simplytek/models/product_models.py:59``).  Materializing the
reference star schema therefore needs exactly these two operators:

- ``path_edges``: every distinct path prefix becomes a node; (node, parent,
  level, category) is the edge dimension a ``parent_category_id`` column
  encodes.  Node identity is the '/'-joined prefix — two 'Phones' categories
  under different roots stay distinct, the property a bare-label key loses.
- ``subtree_rollup``: per-node SUBTREE fact counts (a doc under a/b/c counts
  toward a, a/b, and a/b/c) — the recursive-CTE rollup a self-referencing
  dimension needs, done here in ONE pass with no recursion.

Scale shape: one explode (|path| ≈ 3-6 rows per input row, no shuffle) then
one hash aggregate on the node key with map-side partial combine.  No
iteration, no driver-side tree walk — at 100 TB the cost is a single
shuffle whose key space is the (small) category dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _prefix_cols(path_col: str, sep: str) -> tuple[Column, Column, Column, Column]:
    """(node, parent, level, category) for a posexploded path row."""
    node = F.array_join(F.slice(F.col("_p"), 1, F.col("_pos") + 1), sep)
    parent = F.when(
        F.col("_pos") > 0, F.array_join(F.slice(F.col("_p"), 1, F.col("_pos")), sep)
    )
    level = (F.col("_pos") + 1).cast("int")
    return node, parent, level, F.col("_cat")


def path_edges(df: DataFrame, path_col: str, sep: str = "/") -> DataFrame:
    """Distinct hierarchy edges from root-to-leaf path arrays.

    Output: (node, parent, level, category) — one row per distinct path
    prefix; ``parent`` is NULL at level 1.  ``category`` is the node's own
    label (last path element of the prefix).
    """
    e = df.select(
        F.col(path_col).alias("_p"),
        F.posexplode(path_col).alias("_pos", "_cat"),
    )
    node, parent, level, cat = _prefix_cols(path_col, sep)
    return e.select(
        node.alias("node"), parent.alias("parent"), level.alias("level"), cat.alias("category")
    ).distinct()


def subtree_rollup(
    df: DataFrame,
    path_col: str,
    sep: str = "/",
    agg: dict[str, Column] | None = None,
) -> DataFrame:
    """Hierarchical dimension with SUBTREE fact counts.

    Output: (node, parent, level, category, n_rows, <extra aggs>) — each
    input row contributes to every prefix of its path, so ``n_rows`` at an
    inner node counts the whole subtree (what a recursive rollup over a
    parent-child dimension computes).  ``agg`` adds extra aggregate columns
    evaluated over the same subtree grouping.
    """
    e = df.select(
        "*",
        F.posexplode(path_col).alias("_pos", "_cat"),
    ).withColumnRenamed(path_col, "_p")
    node, parent, level, cat = _prefix_cols(path_col, sep)
    keyed = e.select(
        node.alias("node"), parent.alias("parent"), level.alias("level"), cat.alias("category"),
        *[c for c in e.columns if c not in ("_p", "_pos", "_cat")],
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        c.alias(name) for name, c in (agg or {}).items()
    ]
    return keyed.groupBy("node", "parent", "level", "category").agg(*aggs)
