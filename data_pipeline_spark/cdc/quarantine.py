"""Dead-letter routing for malformed change events (ingest quarantine).

A CDC tail at 10^10-event scale WILL see garbage: producer bugs emit unknown
op codes, null keys, payloads whose declared stats contradict the data
(``n_tok != size(tokens)``), or values that no longer cast to the table
schema.  Failing the whole batch on one bad row stalls the pipeline; silently
dropping rows loses data.  The engine's contract instead:

1. **classify** every event with a deterministic, column-expression-only rule
   chain (first failing rule names the ``reject_reason`` — no Python row
   loop, the whole classifier is one Catalyst projection),
2. **split** the batch: valid events proceed to the normal exactly-once
   LWW merge (`cdc.apply.apply_changes`), rejects are routed to a
   **dead-letter sink** partitioned by epoch,
3. the DLQ write is **idempotent per epoch** (same overwrite-the-epoch-dir
   discipline as the lake layout the reference uses for its daily files —
   ``scrapers/simplytek/main.py:82-84`` upload with overwrite=True), so a
   replayed epoch produces byte-identical quarantine output, never
   duplicates.

Reference parity: the reference validates at the edge with Pydantic and
*drops* invalid products inside each scraper (``scrapers/simplytek/models/
product_models.py:64-91`` raises ``ValueError`` per record, caught and
skipped per item).  The engine generalizes that to an auditable quarantine
table instead of a log line.

Scale notes: the classifier is a single whole-stage-codegen projection over
the batch; the split is two filters over the same scan (Spark reads the
parquet batch twice — columnar, pushed, and cheaper than persisting the
classified frame for the typical <<1% reject rate).  Nothing collects to the
driver; the DLQ write shuffles only the rejects.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REASON_COL = "reject_reason"

#: stable DLQ schema — any malformed payload fits (the original row rides
#: along as one JSON string, so even rows whose columns cannot conform to
#: the table schema are representable).
DLQ_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("key_raw", T.StringType(), True),
        T.StructField(REASON_COL, T.StringType(), False),
        T.StructField("payload_json", T.StringType(), True),
    ]
)


def classify_events(
    changes: DataFrame,
    schema: T.StructType | None = None,
    key: str = "doc_id",
    valid_ops: tuple[str, ...] = ("I", "U", "D"),
    invariants: list[tuple[str, F.Column]] | None = None,
) -> DataFrame:
    """Append ``reject_reason`` (NULL = valid) to a change batch.

    Rule chain, first match wins (deterministic — the DLQ is replayable):

    1. ``null_key``      — key NULL or whitespace-empty,
    2. ``bad_op``        — op not in ``valid_ops``,
    3. ``null_lsn``      — ordering column missing,
    4. ``uncastable:F``  — column F is non-NULL in the batch but its cast to
       the table schema's type is NULL (per-field, only where the batch type
       differs from the table type — equal types never fail),
    5. ``violates:NAME`` — caller invariants, each ``(NAME, bool Column)``;
       a row is rejected when the condition is *false* (NULL passes — guard
       op-dependent rules yourself, e.g. ``(op=='D') | (size(tokens)==n_tok)``).
    """
    # coalesce(..., False): `op isin (...)` is NULL (not false) for a NULL op,
    # so without it a null-op row would skip the bad_op rule and pass as valid
    reason = F.when(
        F.col(key).isNull() | (F.trim(F.col(key).cast("string")) == ""), F.lit("null_key")
    ).when(
        ~F.coalesce(F.col("op").isin(*valid_ops), F.lit(False)), F.lit("bad_op")
    ).when(
        F.col("lsn").isNull(), F.lit("null_lsn")
    )
    if schema is not None:
        batch_types = dict(changes.dtypes)
        for f in schema.fields:
            if f.name in changes.columns and batch_types[f.name] != f.dataType.simpleString():
                # try_cast, not cast: under ANSI mode a plain cast THROWS on
                # malformed input — the classifier's whole job is to keep the
                # batch alive, so the probe must be null-on-failure.
                reason = reason.when(
                    F.col(f.name).isNotNull() & F.col(f.name).try_cast(f.dataType).isNull(),
                    F.lit(f"uncastable:{f.name}"),
                )
    for name, cond in invariants or []:
        reason = reason.when(~F.coalesce(cond, F.lit(True)), F.lit(f"violates:{name}"))
    return changes.withColumn(REASON_COL, reason)


def split_valid(
    changes: DataFrame,
    schema: T.StructType | None = None,
    key: str = "doc_id",
    valid_ops: tuple[str, ...] = ("I", "U", "D"),
    invariants: list[tuple[str, F.Column]] | None = None,
    passthrough: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects): valid keeps the original batch schema; rejects are
    projected to :data:`DLQ_SCHEMA` (original row serialized into
    ``payload_json``).  ``passthrough`` names extra batch columns to carry on
    the rejects frame (e.g. the change-log ``epoch``, so a multi-epoch batch
    can be quarantined with per-epoch fencing — see
    :meth:`DeadLetterSink.append_epochs`)."""
    classified = classify_events(changes, schema, key, valid_ops, invariants)
    valid = classified.where(F.col(REASON_COL).isNull()).drop(REASON_COL)
    rejects = classified.where(F.col(REASON_COL).isNotNull()).select(
        F.col("lsn").try_cast("long").alias("lsn"),
        F.col("op").try_cast("string").alias("op"),
        F.col(key).try_cast("string").alias("key_raw"),
        F.col(REASON_COL),
        F.to_json(F.struct(*[c for c in changes.columns])).alias("payload_json"),
        *[F.col(c) for c in passthrough],
    )
    return valid, rejects


class DeadLetterSink:
    """Epoch-partitioned parquet quarantine with exactly-once epoch writes.

    Layout ``root/epoch=N/``; a committed epoch (``_SUCCESS`` present) is
    never rewritten — replaying an epoch skips the DLQ write entirely, the
    same fence discipline as the icehouse ``committed_epochs`` registry.

    ``owner`` guards the epoch namespace: the DLQ fence keys on a bare
    integer, so a batch replay (source epochs) and a streaming checkpoint
    (batchIds, restarting from 0) sharing one root would collide and
    silently drop rejects.  The first writer claims the root
    (``_owner.json``); a later writer with a different owner string fails
    LOUDLY instead.
    """

    def __init__(self, root: str, owner: str | None = None):
        self.root = root
        self.owner = owner
        os.makedirs(root, exist_ok=True)

    def _claim_owner(self) -> None:
        if self.owner is None:
            return
        marker = os.path.join(self.root, "_owner.json")
        if os.path.exists(marker):
            with open(marker) as fh:
                recorded = json.load(fh)["owner"]
            if recorded != self.owner:
                raise ValueError(
                    f"DLQ root {self.root} is owned by {recorded!r}; writer "
                    f"{self.owner!r} would collide in its integer epoch "
                    "namespace — use a separate DLQ root per producer"
                )
            return
        tmp = f"{marker}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"owner": self.owner}, fh)
        os.replace(tmp, marker)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.root, f"epoch={epoch}")

    def epoch_committed(self, epoch: int) -> bool:
        return os.path.exists(os.path.join(self._epoch_dir(epoch), "_SUCCESS"))

    def append(self, rejects: DataFrame, epoch: int) -> bool:
        """Write one epoch's rejects; no-op (False) if already committed."""
        self._claim_owner()
        if self.epoch_committed(epoch):
            return False
        # coalesce(1): reject volume is <<1% of the batch by contract; one
        # file per epoch keeps the quarantine browsable.  If an upstream
        # incident floods the DLQ, raise this — correctness is unaffected.
        rejects.coalesce(1).write.mode("overwrite").parquet(self._epoch_dir(epoch))
        return True

    def append_epochs(self, rejects: DataFrame, epoch_col: str = "epoch") -> list[int]:
        """Quarantine a multi-epoch rejects frame with PER-EPOCH fencing.

        This is the batch-replay entry point: fencing the whole run under one
        synthetic epoch would make every later run over the same root a
        silent no-op (new epochs' rejects discarded).  Fencing per source
        epoch makes resumed/extended replays (``--from-epoch N``) quarantine
        exactly the not-yet-committed epochs.  Epochs with zero rejects write
        nothing — re-running them re-finds zero rejects, so nothing is lost.
        Returns the epochs actually written.
        """
        epochs = sorted(
            r[0] for r in rejects.select(epoch_col).distinct().collect()
        )  # few epochs by construction — the collect is a handful of ints
        written = []
        for ep in epochs:
            one = rejects.where(F.col(epoch_col) == ep).drop(epoch_col)
            if self.append(one, int(ep)):
                written.append(int(ep))
        return written

    def read(self, spark: SparkSession) -> DataFrame:
        epochs = [d for d in os.listdir(self.root) if d.startswith("epoch=")]
        if not epochs:
            return spark.createDataFrame(
                [], T.StructType(DLQ_SCHEMA.fields + [T.StructField("epoch", T.IntegerType())])
            )
        return spark.read.option("basePath", self.root).parquet(
            *[os.path.join(self.root, d) for d in epochs]
        )

    def read_epoch(self, spark: SparkSession, epoch: int) -> DataFrame:
        """One epoch's rejects only — scans a single epoch directory instead
        of the whole quarantine (the whole-DLQ read would make a per-epoch
        replay loop O(N²) in parquet opens)."""
        if not self.epoch_committed(epoch):
            return spark.createDataFrame([], DLQ_SCHEMA)
        return spark.read.schema(DLQ_SCHEMA).parquet(self._epoch_dir(epoch))


def apply_changes_with_dlq(
    table,
    dlq: DeadLetterSink,
    changes: DataFrame,
    epoch: int | None = None,
    invariants: list[tuple[str, F.Column]] | None = None,
    mode: str = "cow",
    **apply_kwargs,
):
    """Split a batch, quarantine the rejects, merge the valid events.

    Both sides are idempotent under replay: the merge via the table's
    committed-epochs fence, the DLQ via its per-epoch ``_SUCCESS`` fence —
    so a crash between the two writes is safe to re-run in either order.
    ``mode``: ``"cow"`` or ``"mor"`` (merge-on-read delta append).
    Returns ``(ApplyStats, n_rejected)``.
    """
    from .apply import apply_changes, apply_changes_mor

    if epoch is None:
        raise ValueError("apply_changes_with_dlq needs an epoch (both fences key on it)")
    valid, rejects = split_valid(
        changes, schema=table.schema, key=table.key_col, invariants=invariants
    )
    dlq.append(rejects, epoch)
    fn = apply_changes_mor if mode == "mor" else apply_changes
    stats = fn(table, valid, epoch=epoch, **apply_kwargs)
    n_rejected = dlq.read_epoch(valid.sparkSession, epoch).count()
    return stats, n_rejected


def _drained_marker(sink: DeadLetterSink, epoch: int) -> str:
    return os.path.join(sink._epoch_dir(epoch), "_DRAINED")


#: reject reasons emitted by the WIRE layer (``sources.debezium.debezium_split``)
#: — their payload_json is a raw envelope line, not a canonical-event JSON, so
#: only ``payload_parser`` can re-validate them.  Every other reason's
#: payload_json is the canonical row serialized by :func:`split_valid`.
WIRE_REASONS = ("malformed_envelope", "incomplete_envelope")


def drain_dlq(
    sink: DeadLetterSink,
    table,
    spark: SparkSession,
    invariants: list | None = None,
    payload_parser=None,
    wire_reasons: tuple[str, ...] = WIRE_REASONS,
) -> dict:
    """Close the quarantine loop: re-validate each DLQ epoch against the
    table's CURRENT schema (the usual fix is additive evolution or an
    upstream correction that makes old rejects valid) and apply the ones
    that now pass, exactly-once.

    Policy — all-or-nothing PER DLQ EPOCH, which keeps every guarantee
    simple and strong:

    - an epoch drains only if EVERY quarantined row re-validates — counted
      against the ORIGINAL DLQ row count, so a payload parser that silently
      drops rows (or a mixed wire+semantic epoch where only one route
      succeeds) can never mark an epoch drained with rows left behind (a
      partial drain would need to rewrite the committed epoch dir, breaking
      its immutability and the producer's fence);
    - drained epochs are fenced twice: the table commit runs under epoch
      namespace ``dlq-drain:<root sha>`` with the DLQ epoch id (re-running a
      crashed drain is a no-op), and the epoch dir gains a ``_DRAINED``
      marker so later drains and audits skip it;
    - rows are re-parsed from the quarantined ``payload_json`` (the original
      event serialized at reject time) — the DLQ is the source of truth, no
      upstream re-read.

    Routing — rows are routed by ``reject_reason``, NOT whole epochs: rows
    whose reason is in ``wire_reasons`` carry a raw envelope line in
    ``payload_json`` and go through ``payload_parser``; every other row goes
    through the default canonical re-parse.  A single epoch mixing wire and
    semantic rejects (exactly what the streaming Debezium tail produces —
    both reject kinds union into one epoch append) re-validates both routes
    and drains only when their valid rows together cover the epoch.

    ``payload_parser``: optional ``DataFrame -> DataFrame`` hook for the
    wire-reason rows — it receives one epoch's wire rows (DLQ schema) and
    must return canonical change events, e.g.
    ``lambda df: debezium_to_change_events(df.select(F.col("payload_json")
    .alias("value")), payload_schema).drop("epoch")``.  Wire rows with no
    parser simply keep their epoch quarantined (counted in the shortfall).

    Scale shape: re-validation is BATCHED — one scan over all undrained
    epochs, one classify pass with the epoch riding along, and two small
    aggregations, regardless of epoch count.  Only the payload_parser hook
    (per epoch holding wire rows) and the fenced applies (per drainable
    epoch, required by the per-epoch fence) issue per-epoch jobs.

    Returns ``{"drained": [...], "still_invalid": {epoch: n_shortfall},
    "applied_rows": n}`` where ``n_shortfall`` counts the epoch's rows that
    did NOT re-validate (bad rows + parser-dropped rows + unparseable wire
    rows).
    """
    import hashlib

    from .apply import apply_changes

    ns = "dlq-drain:" + hashlib.sha256(os.path.abspath(sink.root).encode()).hexdigest()[:12]
    payload = T.StructType(
        [
            T.StructField("lsn", T.LongType(), True),
            T.StructField("op", T.StringType(), True),
        ]
        + [f for f in table.schema.fields]
    )
    empty: dict = {"drained": [], "still_invalid": {}, "applied_rows": 0}
    undrained = sorted(
        ep
        for d in os.listdir(sink.root)
        if d.startswith("epoch=")
        for ep in [int(d.split("=", 1)[1])]
        if sink.epoch_committed(ep) and not os.path.exists(_drained_marker(sink, ep))
    )
    if not undrained:
        return empty

    # ONE scan over every undrained epoch; the partition dir supplies `epoch`
    # (appended to the pinned schema).  Pinning DLQ_SCHEMA keeps the scan
    # robust to per-epoch extras (append_epochs passthrough columns) that
    # single-file inference would otherwise project inconsistently.
    rows = (
        spark.read.schema(DLQ_SCHEMA)
        .option("basePath", sink.root)
        .parquet(*[sink._epoch_dir(ep) for ep in undrained])
    )
    is_wire = F.col(REASON_COL).isin(*wire_reasons)
    counts = {
        int(r["epoch"]): (int(r["n"]), int(r["n_wire"]))
        for r in rows.groupBy("epoch")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(is_wire.cast("long")).alias("n_wire"))
        .collect()  # one small row per epoch
    }

    # default route (semantic rejects): batched re-parse + classify, epoch
    # rides along as a passthrough column
    reparsed_sem = (
        rows.where(~is_wire)
        .select("epoch", F.from_json("payload_json", payload).alias("_r"))
        .select("epoch", "_r.*")
    )
    valid_sem, _ = split_valid(
        reparsed_sem, schema=table.schema, key=table.key_col, invariants=invariants
    )
    valid_sem = valid_sem.persist()
    sem_valid = {
        int(r["epoch"]): int(r["n"])
        for r in valid_sem.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # wire route: per epoch that actually holds wire rows (parser contract is
    # one-epoch frames; epochs without wire rows never touch it)
    wire_valid_frames: dict[int, DataFrame] = {}
    wire_valid_counts: dict[int, int] = {}
    if payload_parser is not None:
        for ep, (_, n_wire) in counts.items():
            if not n_wire:
                continue
            parsed = payload_parser(rows.where((F.col("epoch") == ep) & is_wire).drop("epoch"))
            valid_w, _ = split_valid(
                parsed, schema=table.schema, key=table.key_col, invariants=invariants
            )
            valid_w = valid_w.persist()
            wire_valid_counts[ep] = valid_w.count()
            wire_valid_frames[ep] = valid_w

    drained: list[int] = []
    still: dict[int, int] = {}
    applied_rows = 0
    try:
        for ep in undrained:
            n_total, _ = counts.get(ep, (0, 0))
            if n_total == 0:
                continue  # empty committed epoch: nothing to drain, keep as-is
            n_valid = sem_valid.get(ep, 0) + wire_valid_counts.get(ep, 0)
            if n_valid != n_total:
                still[ep] = n_total - n_valid
                continue
            events = valid_sem.where(F.col("epoch") == ep).drop("epoch")
            if ep in wire_valid_frames:
                events = events.unionByName(wire_valid_frames[ep], allowMissingColumns=True)
            stats = apply_changes(table, events, epoch=ep, epoch_source=ns)
            applied_rows += 0 if stats.result.skipped else n_total
            with open(_drained_marker(sink, ep), "w") as fh:
                fh.write("drained\n")
            drained.append(ep)
    finally:
        valid_sem.unpersist()
        for df in wire_valid_frames.values():
            df.unpersist()
    return {"drained": drained, "still_invalid": still, "applied_rows": applied_rows}
