"""Multi-writer chaos: concurrent COW and MOR writers over OVERLAPPING keys,
racing a maintenance thread (targeted compaction + tagging), must converge
to exactly the serial replay's final state — LWW-by-LSN is order-insensitive
and every commit path is CAS-serialized, so no interleaving may lose, dupe,
or resurrect a row."""

import random
import threading
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes, apply_changes_mor
from data_pipeline_spark.cdc.changelog import generate_change_log_portable
from data_pipeline_spark.cdc.replay import ReplayRunner
from data_pipeline_spark.table.icehouse import (
    CommitConflictError,
    ConcurrentCommitError,
    IcehouseTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

GEN = dict(n_events=4000, n_docs=250, events_per_epoch=500, seed=13)


def _apply_with_retry(root, batch, epoch, mode):
    """Caller-side contract: CommitConflictError means re-plan against the
    refreshed table (e.g. a compaction or spec change won the race)."""
    fn = apply_changes_mor if mode == "mor" else apply_changes
    for attempt in range(20):
        try:
            handle = IcehouseTable.load(root)
            return fn(handle, batch, epoch=epoch)
        except (CommitConflictError, ConcurrentCommitError):
            # jittered backoff: under a compaction storm a COW plan can be
            # invalidated repeatedly; backing off lets a quiet window open
            time.sleep(random.uniform(0.05, 0.3) * min(attempt + 1, 6))
    raise AssertionError(f"epoch {epoch} never committed after retries")


def test_hammer_mixed_writers_vs_maintenance(spark, tmp_path):
    root = str(tmp_path / "t")
    IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=4)
    log = generate_change_log_portable(spark, **GEN).cache()
    batches = {
        ep: log.where(F.col("epoch") == ep).drop("epoch") for ep in range(8)
    }

    errors: list[Exception] = []
    stop = threading.Event()

    def writer(epochs, mode):
        try:
            for ep in epochs:
                _apply_with_retry(root, batches[ep], ep, mode)
        except Exception as e:
            errors.append(e)

    def maintenance():
        try:
            i = 0
            while not stop.is_set():
                handle = IcehouseTable.load(root)
                try:
                    handle.compact_partitions(spark, partitions="deltas")
                    handle.create_tag(f"chaos-{i}")
                except (CommitConflictError, ConcurrentCommitError):
                    pass
                i += 1
                # schedulers run compaction periodically, not in a hot loop
                # (a zero-sleep loop starves every in-flight COW plan)
                time.sleep(1.0)
        except Exception as e:
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=([0, 2], "cow")),
        threading.Thread(target=writer, args=([1, 3], "mor")),
        threading.Thread(target=writer, args=([4, 6], "mor")),
        threading.Thread(target=writer, args=([5, 7], "cow")),
    ]
    maint = threading.Thread(target=maintenance)
    maint.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    stop.set()
    maint.join(timeout=120)
    assert not errors, f"hammer failed: {errors[:3]}"

    # serial ground truth on a fresh table
    serial_root = str(tmp_path / "serial")
    serial = IcehouseTable.create(serial_root, SCHEMA, key_col="doc_id", n_buckets=4)
    ReplayRunner(serial, str(tmp_path / "ck.json")).run(
        generate_change_log_portable(spark, **GEN)
    )

    chaos = IcehouseTable.load(root)
    # every epoch must be fenced now (exactly-once across all those retries)
    for ep in range(8):
        assert chaos.epoch_committed(ep), f"epoch {ep} missing"
    a = chaos.read(spark).select("doc_id", "tokens", "n_tok", "source")
    b = serial.read(spark).select("doc_id", "tokens", "n_tok", "source")
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    log.unpersist()
