"""Merge / upsert / set-membership operators (DataFrame level).

These are the batch-relational faces of the CDC engine's table-level MERGE
(``table.icehouse`` + ``cdc.apply``).  Reference parity:
- S10 insert-if-not-exists: ``transformations/warehouse/sql/dim_date_update.sql:4-23``,
  ``sql/dim_shop_upsert.sql:36-39``.
- S9 stage+MERGE update: ``product_categorization/big_query/data_store.py:42-86``.
- J3 anti-join work queue: ``product_matching/big_query/data_loading.py:36-49``.
- J7 set-membership anti-join (the reference collects keys into driver-side
  Python sets — ``dim_shop_product.py:499-531`` — which this engine replaces
  with a distributed left_anti join).
- U1-U3 union patterns: ``sql/dim_shop_upsert.sql:11-27``.

Scale notes: anti/semi joins against a small "existing keys" side are
broadcast by AQE automatically; when both sides are huge they fall back to
shuffled hash join on the key — the correct plan either way, chosen at
runtime, not hand-scheduled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def insert_if_absent(existing: DataFrame, incoming: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows of ``incoming`` whose key is not already in ``existing``
    (deduplicated within ``incoming`` by key, deterministically: min of each
    payload column per key would be arbitrary, so callers pre-dedup with
    ``latest_per_key`` when order matters; here we keep distinct full rows
    then one per key via a stable sort on all columns)."""
    new_rows = incoming.join(existing.select(*key_cols), key_cols, "left_anti")
    w_cols = [c for c in new_rows.columns if c not in key_cols]
    if not w_cols:
        return new_rows.distinct()
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc_nulls_last() for c in w_cols])
    return (
        new_rows.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    )


def merge_update(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    update_cols: list[str],
    insert_unmatched: bool = False,
) -> DataFrame:
    """Relational MERGE: for matched keys take ``update_cols`` from
    ``updates`` (WHEN MATCHED THEN UPDATE); optionally append unmatched
    update rows (WHEN NOT MATCHED THEN INSERT).

    ``updates`` must be unique per key (assert upstream / pre-dedup).
    Implemented as a left join + coalesce — one shuffle, broadcastable when
    updates is small.
    """
    upd = updates.select(
        *key_cols, *[F.col(c).alias(f"_u_{c}") for c in update_cols]
    )
    merged = target.join(upd, key_cols, "left").select(
        *key_cols,
        *[
            F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
            if c in update_cols
            else F.col(c)
            for c in target.columns
            if c not in key_cols
        ],
    )
    if insert_unmatched:
        new_rows = updates.join(target.select(*key_cols), key_cols, "left_anti")
        new_conformed = new_rows.select(
            *[
                F.col(c) if c in new_rows.columns else F.lit(None).alias(c)
                for c in merged.columns
            ]
        )
        merged = merged.unionByName(new_conformed)
    return merged


def work_queue(candidates: DataFrame, done: DataFrame, key_cols: list[str]) -> DataFrame:
    """Unprocessed backlog: candidates minus already-processed keys
    (left_anti) — the reference's 'unmatched products' / 'NULL category' queue."""
    return candidates.join(done.select(*key_cols), key_cols, "left_anti")


def distinct_union(*dfs: DataFrame) -> DataFrame:
    """UNION DISTINCT across n sources (by name, filling missing cols NULL)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out.distinct()
