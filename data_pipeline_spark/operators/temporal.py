"""Temporal join operators: as-of (point-in-time) join and interval/range
join — the two time-series joins Spark's DataFrame API has no native node
for, re-expressed as single-shuffle compositions.

Reference parity: the reference answers "what was the price when X
happened?" by re-querying its price-history fact per lookup
(``notification_service/bigquery_queries.py`` latest-price probes;
``priceforecasting/data_processor.py:81-96`` aligns price points to a
calendar before modeling).  At engine scale those become as-of / range
joins.

Scale shapes (both avoid the naive O(|L|·|R|) range cross-join):

- ``asof_join``: tag + union both sides, ONE shuffle on the equality keys,
  one window sort, forward-fill the last right payload.  The canonical
  distributed as-of (kdb ``aj``, pandas ``merge_asof``, Flink temporal
  join) — cost is a single sort-shuffle of |L|+|R| rows.
- ``interval_point_join``: explode each interval into fixed-width time
  bins, equi-join points on (keys…, bin), re-check exact bounds.  A point
  falls in exactly one bin, so each (interval, point) match is produced
  once — no dedup pass.  Bin width trades explode factor against join
  fan-in; pick it near the median interval length (the same binned
  range-join strategy Databricks' optimizer applies under the hood).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tie_col: str | None = None,
    strict: bool = False,
    segment_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) on the same equality
    keys; left rows with no preceding right row keep NULL payload
    (left-outer as-of semantics).

    ``right_cols`` are the payload columns carried over, suffixed
    ``_asof``; ``<right_ts>_asof`` is always included.  When several right
    rows share (keys, right_ts), the one with the maximum ``tie_col``
    (default: first of ``right_cols``) wins — without an explicit
    tie-break a distributed sort would be nondeterministic.

    Plan: dedup right with a partial-aggregable ``max_by`` → union tagged
    sides → one window over keys ordered by (ts, side) with a running
    ``last(payload, ignorenulls)`` → keep left rows.  Two exchanges total:
    the tie-dedup shuffles right on (keys, ts) WITH map-side combine (hot
    (key, ts) pairs pre-reduce per task), then the union shuffles once on
    keys for the window sort.  Zero range explosion.

    **Skewed keys** (one key holding a large share of all rows) straggle
    the plain form — the window sorts a whole key's history in ONE task.
    ``segment_seconds`` switches to the segmented two-pass prefix-fill:
    rows partition on (keys, time-segment) so a hot key parallelizes
    across its time range; per-segment local fills are patched with a
    carry-in computed on the tiny (keys, segment) summary frame.  Exactly
    equal output (asserted in tests), cost = the big data shuffles on the
    finer (keys, segment) grain + one summary-sized shuffle on keys.
    """
    keys = list(keys)
    right_cols = list(right_cols)
    # timestamp-only payload (right_cols=[]) is legal: tie on the ts itself
    tie = tie_col or (right_cols[0] if right_cols else right_ts)
    payload_t = F.struct(
        F.col(right_ts).cast("timestamp").alias(right_ts + "_asof"),
        *[F.col(c).alias(c + "_asof") for c in right_cols],
    )
    # right rows sort BEFORE a left row at the same ts so an equal-ts row
    # is visible (inclusive); strict flips the order so it is not
    r_side, l_side = (1, 0) if strict else (0, 1)
    r = (
        right.groupBy(*keys, F.col(right_ts).cast("timestamp").alias("_ts"))
        .agg(F.max_by(payload_t, F.col(tie)).alias("_payload"))
        .select(*keys, "_ts", "_payload", F.lit(r_side).alias("_side"), F.lit(False).alias("_is_left"))
    )
    l = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(l_side).alias("_side"),
        F.lit(True).alias("_is_left"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    out_fields = [right_ts + "_asof"] + [c + "_asof" for c in right_cols]

    if segment_seconds is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        return filled.where("_is_left").select(
            *[F.col(c) for c in left.columns],
            *[F.col("_match")[f].alias(f) for f in out_fields],
        )

    # segmented two-pass prefix fill ---------------------------------------
    width = segment_seconds * 1_000_000
    u = u.withColumn("_seg", F.floor(F.unix_micros(F.col("_ts").cast("timestamp")) / width))
    # pass 1: local fill inside each (keys, segment) slice — parallel
    # across a hot key's time range
    w_local = (
        Window.partitionBy(*keys, "_seg")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("_local", F.last("_payload", ignorenulls=True).over(w_local))
    # pass 2: carry-in per (keys, segment) = last right payload of any
    # EARLIER segment.  Built on the summary frame (one row per (keys,
    # segment) present on either side) — tiny relative to the data.
    seg_last = (
        u.where(~F.col("_is_left"))
        .groupBy(*keys, "_seg")
        .agg(F.max_by("_payload", F.col("_ts")).alias("_seg_last"))
    )
    segs = u.select(*keys, "_seg").distinct()
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        segs.join(seg_last, keys + ["_seg"], "left")
        .withColumn("_carry", F.last("_seg_last", ignorenulls=True).over(w_carry))
        .select(*keys, "_seg", "_carry")
    )
    patched = local.where("_is_left").join(carry, keys + ["_seg"], "left")
    match = F.coalesce("_local", "_carry")
    return patched.select(
        *[F.col(c) for c in left.columns],
        *[match[f].alias(f) for f in out_fields],
    )


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join point rows to interval rows where
    ``start <= point_ts < end`` (half-open), optionally also matching on
    equality ``keys`` (shared column names).  Output: all interval columns
    + the point's non-key columns.  Callers wanting per-interval
    aggregates with zero-match intervals included aggregate this output
    and left-join it back onto ``intervals``.

    Plan: intervals explode into ``ceil(len/bin_seconds)`` bins, points
    map to exactly one bin, equi-join on (keys…, bin) + residual bound
    check — one shuffle, no range cross-join.
    """
    keys = list(keys)
    overlap = (set(points.columns) - set(keys)) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points and intervals share non-key column names {sorted(overlap)}; "
            "rename one side — the joined output would be ambiguous"
        )
    # an inverted/empty interval (end <= start) can match nothing, but fed
    # to sequence() its default step becomes -1 and it explodes a huge
    # DESCENDING bin list — drop such rows before exploding
    intervals = intervals.where(F.col(end_col) > F.col(start_col))
    # exact integer microsecond arithmetic — unix_timestamp() truncates to
    # seconds, which mis-bins sub-second interval bounds.  The cast accepts
    # TIMESTAMP_NTZ (what parquet scans produce) — both sides cast the same
    # way, so bin assignment is consistent regardless of session timezone.
    width = bin_seconds * 1_000_000
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    # disjoint column namespaces: points and intervals routinely derive
    # from the SAME source frame (two filters of one event scan), which
    # trips Spark's ambiguous-self-join detection on shared lineage
    iv = intervals.select(
        *[F.col(c).alias(f"_iv_{c}") for c in intervals.columns]
    ).withColumn(
        "_iv_bin",
        F.explode(
            F.sequence(
                F.floor(micros(f"_iv_{start_col}") / width),
                # end is exclusive: last covered bin holds end - 1µs
                F.floor((micros(f"_iv_{end_col}") - 1) / width),
            )
        ),
    )
    pt = points.select(
        *[F.col(c).alias(f"_pt_{c}") for c in points.columns]
    ).withColumn("_pt_bin", F.floor(micros(f"_pt_{point_ts}") / width))
    cond = F.col("_iv_bin") == F.col("_pt_bin")
    for k in keys:
        cond = cond & (F.col(f"_iv_{k}") == F.col(f"_pt_{k}"))
    in_range = (F.col(f"_pt_{point_ts}") >= F.col(f"_iv_{start_col}")) & (
        F.col(f"_pt_{point_ts}") < F.col(f"_iv_{end_col}")
    )
    out = iv.join(pt, cond & in_range, "inner")
    point_out = [c for c in points.columns if c not in keys]
    return out.select(
        *[F.col(f"_iv_{c}").alias(c) for c in intervals.columns],
        *[F.col(f"_pt_{c}").alias(c) for c in point_out],
    )
