"""External row-store access (S15) — JDBC source with a static stand-in.

Reference parity: the notification service does per-variant point reads
against Postgres (``notification_service/postgres_queries.py:29-41`` — a
3-table join ``profiles × userfavorites × usernotificationsettings``
filtered by variant, notify flag, active flag), executed in a LOOP, one
round-trip per changed variant.  The Spark-first form is ONE set-oriented
join of the whole price-change relation against the subscriber tables —
N+1 queries collapse into a single broadcast join.

``read_external_table`` is the swap-in point: with a JDBC url it reads via
``spark.read.jdbc`` (driver jar required on the cluster — pass
``predicates=`` for partitioned parallel reads); without one it resolves a
registered temp view of the same name, which is how the sandbox (no driver
jar, no network) and unit tests exercise the identical downstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_external_table(
    spark: SparkSession,
    table: str,
    url: str | None = None,
    properties: dict[str, str] | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """Read an external row-store table.

    - ``url`` set → ``spark.read.jdbc`` (production path; ``predicates``
      splits the read into one partition per predicate for parallel pull).
    - ``url`` None → ``spark.table(table)`` (registered stand-in view; the
      join/filter plan downstream is identical, which is the point).
    """
    if url is not None:
        if predicates:
            return spark.read.jdbc(url, table, predicates=predicates, properties=properties or {})
        return spark.read.jdbc(url, table, properties=properties or {})
    return spark.table(table)


def subscribed_users(
    changed_variants: DataFrame,
    profiles: DataFrame,
    favorites: DataFrame,
    settings: DataFrame,
    variant_col: str = "variant_id",
) -> DataFrame:
    """Set-oriented subscriber lookup (reference loop → one join).

    Semantics of ``postgres_queries.py:29-41``: a user is notified for a
    changed variant iff they favorited it, have price-drop notifications
    on, and are active.  Output: (variant_id, email) distinct.

    Plan shape: subscriber tables are dimension-sized → broadcast; the
    price-change relation (left) never shuffles.
    """
    subs = (
        favorites.join(settings.where(F.col("notify_on_price_drop")), "user_id")
        .join(profiles.where(F.col("is_active")), "user_id")
        .select(variant_col, "email")
    )
    return (
        changed_variants.select(variant_col)
        .distinct()
        .join(F.broadcast(subs), variant_col)
        .select(variant_col, "email")
        .distinct()
    )
