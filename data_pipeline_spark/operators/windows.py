"""Windowed / per-key analytical operators.

Reference parity (semantics studied at, not copied from):
- W1 price-change LAG: ``notification_service/bigquery_queries.py:63-94``.
- W2/A10 latest-row-per-key LWW: ``anomaly_detection/big_query/extraction.py:74-87``.
- W3 trailing moving average: ``anomaly_detection/models/statistical.py:106-114``.
- A7/W4 robust z-score (median/MAD): ``statistical.py:26-74``.
- W5 sliding LSTM sequence windows: ``priceforecasting/data_processor.py:81-96``.
- O3 top-k per group: ``product_matcher.py:56-59``.

Scale notes: window functions shuffle once on their partition key.  Keys here
are entity ids (variant/user/doc) — millions of small groups, so skew is from
hot entities only; the salted variants in ``cdc.skew`` cover that case.  The
grouped median/MAD uses a two-pass aggregate (percentile is an exact builtin
aggregate with partial combine) rather than collecting groups to Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_col: str, desc: bool = True
) -> DataFrame:
    """Deterministic keep-one-row-per-key: row_number over explicit ordering.

    Unlike ``dropDuplicates`` (arrival-order-dependent) this is replay-stable:
    the kept row is defined by ``order_col``, ties broken by all remaining
    columns so the result is unique even for exact-duplicate orderings.
    """
    oc = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*key_cols).orderBy(oc)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def price_changes(
    df: DataFrame,
    key: str,
    order_col: str,
    value_col: str,
    min_abs_change: float = 0.01,
) -> DataFrame:
    """LAG-based change detection: per key ordered by ``order_col``, emit rows
    where the value moved by more than ``min_abs_change`` vs the previous row.

    Output adds ``prev_<value>``, ``change``, ``pct_change``.
    """
    w = Window.partitionBy(key).orderBy(order_col)
    prev = F.lag(value_col, 1).over(w)
    out = (
        df.withColumn(f"prev_{value_col}", prev)
        .withColumn("change", F.col(value_col) - F.col(f"prev_{value_col}"))
        .withColumn(
            "pct_change",
            F.when(
                F.col(f"prev_{value_col}") != 0,
                (F.col(value_col) - F.col(f"prev_{value_col}")) / F.abs(F.col(f"prev_{value_col}")),
            ),
        )
    )
    return out.where(
        F.col(f"prev_{value_col}").isNotNull()
        & F.col(value_col).isNotNull()
        & (F.abs(F.col("change")) > min_abs_change)
    )


def trailing_mean(
    df: DataFrame, key: str, order_col: str, value_col: str, window_size: int
) -> DataFrame:
    """Trailing moving average over the previous ``window_size`` rows,
    EXCLUDING the current row (the reference's anomaly baseline), plus the
    count of rows actually in the frame (for min-history gates)."""
    w = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(-window_size, -1)
    )
    return df.withColumn("trailing_mean", F.avg(value_col).over(w)).withColumn(
        "trailing_n", F.count(value_col).over(w)
    )


def robust_zscore_anomalies(
    df: DataFrame,
    key: str,
    value_col: str,
    threshold: float = 3.5,
    min_history: int = 5,
) -> DataFrame:
    """Per-key robust (modified) z-score: |0.6745·(x − median)| / MAD.

    Two-phase: exact per-key median via the ``percentile`` aggregate (partial
    combine — no group materialization), then MAD the same way, then a
    broadcast-friendly join back.  Rows with MAD=0 or short history are not
    anomalies (matches the reference's guard clauses).
    """
    med = df.groupBy(key).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med"),
        F.count(value_col).alias("_n"),
    )
    with_med = df.join(med, key)
    mad = (
        with_med.withColumn("_absdev", F.abs(F.col(value_col) - F.col("_med")))
        .groupBy(key)
        .agg(F.percentile("_absdev", F.lit(0.5)).alias("_mad"))
    )
    scored = with_med.join(mad, key).withColumn(
        "robust_z",
        F.when(
            (F.col("_mad") > 0) & (F.col("_n") >= min_history),
            F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad"),
        ),
    )
    return (
        scored.withColumn("is_anomaly", F.coalesce(F.abs(F.col("robust_z")) > threshold, F.lit(False)))
        .withColumnRenamed("_med", "median_value")
        .withColumnRenamed("_mad", "mad_value")
        .drop("_n", "_absdev")
    )


def topk_per_group(
    df: DataFrame, key_cols: list[str], order_col: Column | str, k: int, desc: bool = True
) -> DataFrame:
    """Top-k rows per group with a deterministic rank column ``rank_in_group``."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*key_cols).orderBy(oc.desc() if desc else oc.asc())
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .where(F.col("rank_in_group") <= k)
    )


def sequence_windows(
    df: DataFrame,
    key: str,
    order_col: str,
    value_col: str,
    seq_len: int,
    min_count: int | None = None,
) -> DataFrame:
    """Sliding fixed-length sequences (step 1) per key — training-sample
    windowing for sequence models.  Emits one row per complete window:
    (key, window_end, sequence array of length seq_len).

    collect_list over a bounded row frame — no applyInPandas, no shuffle
    beyond the single window partition-by.
    """
    w = Window.partitionBy(key).orderBy(order_col).rowsBetween(-(seq_len - 1), 0)
    out = (
        df.withColumn("sequence", F.collect_list(value_col).over(w))
        .where(F.size("sequence") == seq_len)
        .select(key, F.col(order_col).alias("window_end"), "sequence")
    )
    if min_count:
        counts = df.groupBy(key).agg(F.count(value_col).alias("_cnt"))
        out = out.join(counts.where(F.col("_cnt") >= min_count).select(key), key)
    return out
