"""Changed-data feed: reconstruct the row-level I/U/D delta between any two
committed table versions from their time-travelable snapshots.

The reference has no history surface at all — consumers that want "what
changed since yesterday?" re-diff full BigQuery extracts client-side
(the anomaly/notification services re-query whole fact slices every run,
``notification_service/bigquery_queries.py``, ``anomaly_detection/big_query/
extraction.py``).  Lakehouse engines expose this as a changed-data feed;
here it falls out of snapshot isolation: every version is retained and
readable (``IcehouseTable.load(root, version=…)``), so the delta is one
key-wise full-outer join of two snapshots.

Scale: both snapshot scans prune to the SAME bucket layout (the key hash
spec is immutable per table), so Spark co-partitions the join on the key
with no residual skew surprises; unchanged rows are dropped by a struct
``eqNullSafe`` — at typical epoch deltas the output is a small fraction of
the table.  Cost is two table scans — the trade for not persisting
per-commit change files (the write path stays one pass; see
``BENCH.md`` on why the write path refuses extra materializations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table.icehouse import IcehouseTable


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
) -> DataFrame:
    """Row-level delta from version ``v_from`` to ``v_to`` of the table at
    ``root``: one row per changed key with ``op`` ∈ I/U/D and the value
    columns of the AFTER image (BEFORE image for deletes, so consumers see
    what disappeared — the Debezium convention).

    Replaying the emitted delta onto the ``v_from`` snapshot with
    ``cdc.apply`` reproduces ``v_to`` exactly (asserted in tests) — the
    feed is a faithful change log, not just a report.
    """
    old_t = IcehouseTable.load(root, version=v_from)
    new_t = IcehouseTable.load(root, version=v_to)
    key = old_t.key_col
    # value columns come from the UNION of both schemas: additive schema
    # evolution between the versions must surface in the feed (a column
    # added after v_from reads as NULL from the old snapshot — exactly how
    # the table itself reads pre-evolution files).  Union also keeps a
    # reversed diff (v_from newer) working.
    fields: dict[str, object] = {}
    for f in list(old_t.schema.fields) + list(new_t.schema.fields):
        if f.name != key and f.name not in fields:
            fields[f.name] = f.dataType
    value_cols = list(fields)

    def _image(t: IcehouseTable, alias: str):
        df = t.read(spark)
        have = set(df.columns)
        cols = [
            F.col(c) if c in have else F.lit(None).cast(fields[c]).alias(c)
            for c in value_cols
        ]
        return df.select(F.col(key).alias("_k"), F.struct(*cols).alias(alias))

    old = _image(old_t, "_before")
    new = _image(new_t, "_after")
    j = old.join(new, "_k", "full_outer")
    op = (
        F.when(F.col("_before").isNull(), "I")
        .when(F.col("_after").isNull(), "D")
        .when(~F.col("_before").eqNullSafe(F.col("_after")), "U")
    )
    image = F.coalesce("_after", "_before")
    return (
        j.select(F.col("_k").alias(key), op.alias("op"), image.alias("_img"))
        .where(F.col("op").isNotNull())
        .select(key, "op", *[F.col("_img")[c].alias(c) for c in value_cols])
    )


def diff_between_refs(
    spark: SparkSession,
    root: str,
    ref_from: "int | str",
    ref_to: "int | str",
) -> DataFrame:
    """:func:`snapshot_diff` with tag names accepted for either endpoint —
    the WAP consumer's incremental feed: ``diff_between_refs(spark, root,
    "published-prev", "published")`` yields exactly the I/U/D rows between
    the last two AUDITED states, regardless of how many raw ingest commits
    (including bad ones that failed their audit) landed in between."""

    def resolve(ref) -> int:
        if isinstance(ref, str):
            tags = IcehouseTable.load(root).meta.get("tags", {})
            if ref not in tags:
                raise KeyError(f"no tag {ref!r} on table {root}")
            return int(tags[ref])
        return int(ref)

    return snapshot_diff(spark, root, resolve(ref_from), resolve(ref_to))
