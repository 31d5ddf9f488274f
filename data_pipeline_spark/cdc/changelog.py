"""Deterministic, distributed change-log generation (the replay input).

The change log is the engine's north-rule input: keyed mutations
``(lsn, epoch, op[I/U/D], doc_id, tokens, n_tok, source)`` applied to the
tokenized-sequence table.  It is synthesized **entirely inside Spark** from
``spark.range(n)`` + bit-stable hash functions (xxhash64), so:

- no driver-side loops, no external data — scales to 10^10 events by just
  raising ``n_events`` (generation itself is embarrassingly parallel),
- fully deterministic given the seed: a pandas/DuckDB oracle can recompute the
  exact final state (tokens are a pure function of (doc_id, lsn)),
- realistic CDC pathologies are built in: hot-key skew (a small prefix-group
  of doc_ids receives ~30% of all events — reference analog: one scraper
  source dominating a day's load), duplicate delivery (same lsn re-emitted),
  deletes and delete-then-reinsert sequences, out-of-order arrival within an
  epoch (row order in the DataFrame is never relied upon).

Reference parity: the reference's change capture is a daily full snapshot per
source with last-writer-wins at (source, day) file granularity
(``scrapers/simplytek/main.py:59,82-84``); this generator produces the
row-level generalization of that log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 50257  # GPT-2-ish vocab size for the synthetic token ids
MAX_TOKENS = 96
MIN_TOKENS = 4

CHANGE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _h(*cols) -> F.Column:
    """Bit-stable 64-bit mix (Spark builtin xxhash64, non-negative)."""
    return F.abs(F.xxhash64(*cols))


def generate_change_log(
    spark: SparkSession,
    n_events: int,
    n_docs: int | None = None,
    events_per_epoch: int = 100_000,
    seed: int = 42,
    hot_fraction: float = 0.30,
    delete_pct: int = 5,
    dup_pct: int = 2,
    n_sources: int = 5,
    n_partitions: int | None = None,
) -> DataFrame:
    """Build the synthetic change log as a lazy DataFrame.

    ``hot_fraction`` of events hit the hot 1% of doc_ids (prefix group
    ``doc_00000xxx``) — the skew the salted splitter / map-side combine must
    absorb.  ``dup_pct`` percent of events are re-delivered verbatim
    (same lsn, same payload), exercising dedup-under-at-least-once delivery.
    """
    n_docs = n_docs or max(n_events // 10, 10)
    n_hot = max(n_docs // 100, 1)
    rng = spark.range(0, n_events, numPartitions=n_partitions or spark.sparkContext.defaultParallelism)
    s = F.lit(seed)

    is_hot = (_h(s, F.lit("hot"), "id") % 1000) < int(hot_fraction * 1000)
    doc_num = F.when(is_hot, _h(s, F.lit("hd"), "id") % n_hot).otherwise(
        _h(s, F.lit("ud"), "id") % n_docs
    )
    doc_id = F.concat(F.lit("doc_"), F.lpad(doc_num.cast("string"), 8, "0"))

    op_roll = _h(s, F.lit("op"), "id") % 100
    op = (
        F.when(op_roll < delete_pct, F.lit("D"))
        .when(op_roll < delete_pct + 40, F.lit("I"))
        .otherwise(F.lit("U"))
    )

    n_tok = (MIN_TOKENS + (_h(s, F.lit("nt"), doc_id, "id") % (MAX_TOKENS - MIN_TOKENS))).cast("int")
    # tokens = pure function of (doc_id, lsn, position) — the oracle recomputes this
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: (_h(s, doc_id, F.col("id"), i) % VOCAB_SIZE).cast("int"),
    )
    source = F.concat(F.lit("src"), (_h(s, F.lit("sw"), doc_id) % n_sources).cast("string"))

    log = rng.select(
        F.col("id").alias("lsn"),
        (F.col("id") / events_per_epoch).cast("int").alias("epoch"),
        op.alias("op"),
        doc_id.alias("doc_id"),
        F.when(op == "D", F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(op == "D", F.lit(None).cast("int")).otherwise(n_tok).alias("n_tok"),
        source.alias("source"),
    )

    if dup_pct > 0:
        dupes = log.where((_h(s, F.lit("dup"), "lsn") % 100) < dup_pct)
        log = log.unionAll(dupes)
    return log


def _u(seed: int, tag: int, a, b=None) -> F.Column:
    """Portable integer LCG hash (exact BIGINT arithmetic — reproducible
    verbatim in DuckDB/Trino SQL, unlike xxhash64).  Used by the portable
    generator so a SQL oracle can recompute the whole change log."""
    k = (
        F.lit(seed * 1_000_003 + tag * 10_007).cast("long")
        + _c_long(a) * F.lit(257)
        + (_c_long(b) * F.lit(65_537) if b is not None else F.lit(0))
    )
    return F.pmod(k * F.lit(1103515245) + F.lit(12345), F.lit(2147483647))


def _c_long(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("long")


def generate_change_log_portable(
    spark: SparkSession,
    n_events: int,
    n_docs: int | None = None,
    events_per_epoch: int = 100_000,
    seed: int = 42,
    hot_fraction: float = 0.30,
    delete_pct: int = 5,
    dup_pct: int = 2,
    n_sources: int = 5,
) -> DataFrame:
    """Same shape/pathologies as :func:`generate_change_log`, but every
    derived value comes from the portable LCG hash, so an ANSI-SQL oracle
    recomputes the log — and therefore the post-replay FINAL STATE — from
    scratch (the value-hash check for the flagship ``cdc_replay_icehouse``
    path).  The xxhash64 generator remains the bench/production default.
    """
    n_docs = n_docs or max(n_events // 10, 10)
    # The LCG constants are pinned by every SQL oracle, so the domain where
    # k*1103515245 stays inside int64 is a hard contract: the largest k is
    # tag-7's  seed-term + lsn*257 + (doc_num*128 + i)*65537.  Outside it,
    # ANSI-mode Spark (correctly) raises arithmetic overflow mid-job — fail
    # fast here instead.  The xxhash64 generator has no such bound.
    k_max = (
        abs(seed) * 1_000_003 + 8 * 10_007
        + n_events * 257
        + ((n_docs - 1) * 128 + MAX_TOKENS) * 65_537
    )
    if k_max > (2**63 - 1) // 1_103_515_245:
        raise ValueError(
            f"portable-LCG domain exceeded (n_events={n_events}, n_docs={n_docs}): "
            "the oracle-pinned constants would overflow int64; use "
            "generate_change_log (xxhash64) for large inputs"
        )
    n_hot = max(n_docs // 100, 1)
    rng = spark.range(0, n_events)
    rid = F.col("id")

    is_hot = (_u(seed, 1, rid) % 1000) < int(hot_fraction * 1000)
    doc_num = F.when(is_hot, _u(seed, 2, rid) % n_hot).otherwise(_u(seed, 3, rid) % n_docs)
    doc_id = F.concat(F.lit("doc_"), F.lpad(doc_num.cast("string"), 8, "0"))
    op_roll = _u(seed, 4, rid) % 100
    op = (
        F.when(op_roll < delete_pct, F.lit("D"))
        .when(op_roll < delete_pct + 40, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    n_tok = (MIN_TOKENS + (_u(seed, 5, rid, doc_num) % (MAX_TOKENS - MIN_TOKENS))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: (_u(seed, 7, rid, doc_num * F.lit(128) + i) % VOCAB_SIZE).cast("int"),
    )
    source = F.concat(F.lit("src"), (_u(seed, 6, doc_num) % n_sources).cast("string"))

    log = rng.select(
        F.col("id").alias("lsn"),
        (F.col("id") / events_per_epoch).cast("int").alias("epoch"),
        op.alias("op"),
        doc_id.alias("doc_id"),
        F.when(op == "D", F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(op == "D", F.lit(None).cast("int")).otherwise(n_tok).alias("n_tok"),
        source.alias("source"),
    )
    if dup_pct > 0:
        dupes = log.where((_u(seed, 8, F.col("lsn")) % 100) < dup_pct)
        log = log.unionAll(dupes)
    return log


def materialize_change_log(spark: SparkSession, path: str, **kwargs) -> str:
    """Write the log epoch-partitioned (reads of 'epoch >= checkpoint' prune
    at the directory level — the tail-the-log access pattern)."""
    generate_change_log(spark, **kwargs).write.mode("overwrite").partitionBy("epoch").parquet(path)
    return path


def read_change_log(spark: SparkSession, path: str, from_epoch: int | None = None) -> DataFrame:
    df = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(path)
    if from_epoch is not None:
        df = df.where(F.col("epoch") >= from_epoch)  # partition-pruned
    return df
