"""Hot-key detection and salted-key splitting.

Why it exists: a Zipf-skewed change stream concentrates ~30% of events on ~1%
of doc_ids (see changelog.py).  Operators that must co-locate ALL events of a
key in one task — window functions partitioned by key, grouped-map
``applyInPandas``, sort-merge joins against a skewed build side — stall on the
hot key's straggler task.  The fix is the classic two-phase split:

    phase 1: group by (key, salt) where salt = hash(lsn) % S  →  S partial
             results per hot key, spread over S tasks
    phase 2: group by key over the S partials  →  final result

For LWW itself the engine prefers ``max_by`` aggregation (map-side combine —
see apply.py), which makes salting unnecessary; this module provides

- ``detect_hot_keys``   — sample-based heavy-hitter sketch (one cheap pass on a
                          fraction of the data; at 10^10 events sampling 0.1%
                          is still 10^7 events — plenty for 1% heavy hitters),
- ``salted_lww_latest`` — the explicit two-phase LWW for engines/operators
                          that must keep the window form,
- ``salted_join``       — skew-join via salt-replication (AQE's skew-join is
                          preferred when applicable; this is the manual form
                          for non-AQE paths like cartesian-prone theta joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame,
    key: str = "doc_id",
    sample_fraction: float = 0.01,
    hot_share_threshold: float = 0.001,
    seed: int = 7,
) -> DataFrame:
    """Heavy-hitter detection: sample, count per key, keep keys whose sampled
    share exceeds ``hot_share_threshold``.  Returns (key, approx_share)."""
    sampled = df.sample(fraction=sample_fraction, seed=seed)
    total = sampled.count()
    if total == 0:
        return df.sparkSession.createDataFrame([], f"{key} string, approx_share double")
    return (
        sampled.groupBy(key)
        .agg((F.count(F.lit(1)) / F.lit(float(total))).alias("approx_share"))
        .where(F.col("approx_share") >= hot_share_threshold)
    )


def salted_lww_latest(
    changes: DataFrame, key: str = "doc_id", order: str = "lsn", n_salts: int = 16
) -> DataFrame:
    """Two-phase last-writer-wins with explicit salting.

    Deterministic salt = hash(order-col) % n_salts, so replay produces an
    identical plan and result at any parallelism level.
    """
    payload_cols = [c for c in changes.columns if c != key]
    salted = changes.withColumn("_salt", F.pmod(F.xxhash64(F.col(order)), F.lit(n_salts)))
    phase1 = salted.groupBy(key, "_salt").agg(
        F.max_by(F.struct(*payload_cols), F.col(order)).alias("_p")
    )
    phase2 = phase1.groupBy(key).agg(
        F.max_by(F.col("_p"), F.col(f"_p.{order}")).alias("_latest")
    )
    return phase2.select(key, *[F.col(f"_latest.{c}").alias(c) for c in payload_cols])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-join: salt the big side, replicate the small side n_salts times.

    Only correct for equi-joins where ``small`` has unique keys (dimension
    enrichment — reference analog: J1/J2 star joins,
    ``notification_service/bigquery_queries.py:73-78``).
    """
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    small_s = small.crossJoin(
        big.sparkSession.range(n_salts).select(F.col("id").cast("long").alias("_salt"))
    )
    joined = big_s.join(small_s, on=[key, "_salt"], how=how)
    return joined.drop("_salt")
