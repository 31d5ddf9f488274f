"""Slowly-changing-dimension Type 2 history from a change stream.

The reference keeps only latest-state dimensions plus a separate
price-history fact (``bigquery_schemas/FactProductPrice.sql``,
``dim_shop_product.py`` upserts overwrite in place) — answering "what did
this row look like on date D?" needs the full SCD2 form: one row per
version with ``[valid_from, valid_to)`` bounds and an ``is_current`` flag.

``scd2_history`` builds that table in one pass from an ordered change
stream (the same I/U/D shape ``cdc.apply`` consumes):

- every surviving I/U change OPENS a version at its ``order_col``;
- the version CLOSES at the key's next change of any kind (U supersedes,
  D terminates) — ``valid_to = lead(order_col)``, NULL while open;
- D changes emit no version row themselves;
- ``skip_unchanged=True`` drops U changes whose tracked attributes equal
  the key's previous surviving version (classic SCD2: a new version only
  when something tracked actually changed) — those no-op changes neither
  open nor close anything.

Plan: one shuffle on the key (window lag for the no-op filter + window
lead for the close bound share the same partitioning, so Catalyst plans a
single Exchange).  No self-joins, no driver loops — at 10^10 changes this
is exactly the LWW-replay shape with a lead instead of a max_by.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    order_col: str,
    op_col: str = "op",
    skip_unchanged: bool = True,
) -> DataFrame:
    """(key…, attr…, valid_from, valid_to, is_current) version rows.

    ``changes`` must be unique per (key…, order_col); ``op_col`` holds
    I/U/D.  ``valid_from``/``valid_to`` carry ``order_col``'s type
    (timestamp or LSN alike); ``is_current`` marks the open version of
    keys whose last change was not a delete.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(order_col)

    df = changes
    if skip_unchanged:
        # compare against the previous SURVIVING change: a no-op U neither
        # opens nor closes, so it must vanish before the lead() pass.  A
        # change after a D always survives (re-insert opens a new version).
        prev_op = F.lag(op_col).over(w)
        # struct equality with eqNullSafe — collision-free (a string
        # encoding with separator/NULL sentinels can be forged by attr
        # values containing the sentinel bytes) and NULL-exact.  Map-typed
        # attrs are unorderable (eqNullSafe rejects them at analysis time):
        # compare their JSON serialization instead — conservative in the
        # safe direction (a spurious representation difference opens an
        # extra version; it never silently DROPS one).
        field_types = dict(df.dtypes)
        cmp_attrs = [
            F.to_json(F.col(a)).alias(a) if field_types.get(a, "").startswith("map") else F.col(a).alias(a)
            for a in attrs
        ]
        prev_attrs = F.lag(F.struct(*cmp_attrs)).over(w)
        df = df.select(
            "*", prev_op.alias("_prev_op"), prev_attrs.alias("_prev_attrs")
        )
        unchanged = (F.col("_prev_op") != F.lit("D")) & F.struct(*cmp_attrs).eqNullSafe(
            F.col("_prev_attrs")
        )
        # NOTE the propagation subtlety: lag() sees the RAW previous row,
        # so a run of identical no-op U's collapses to its first row —
        # each later row compares equal to its immediate predecessor.
        df = df.where((F.col(op_col) == "D") | F.col("_prev_op").isNull() | ~unchanged)
        df = df.drop("_prev_op", "_prev_attrs")

    closed = df.select(
        *keys,
        *attrs,
        F.col(op_col).alias("_op"),
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
    )
    return closed.where(F.col("_op") != "D").select(
        *keys,
        *attrs,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
