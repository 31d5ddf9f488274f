"""Property test: stats-based file pruning is invisible to results.

For ANY mix of COW rewrites, MOR delta appends (updates moving the stat
column across range boundaries), deletes, and compactions — and ANY range
filter — ``read(stats_filters=...)`` must equal the unpruned
``read().where(...)``, and the filtered changed-since feed must deliver
exactly the in-range upserts plus every tombstone.  Pruning that drops one
wrong file shows up as a missing row here.
"""

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes, apply_changes_mor
from data_pipeline_spark.table.icehouse import IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("val", T.IntegerType(), True),
    ]
)

KEYS = [f"k{i:02d}" for i in range(12)]

OPS = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["cow", "mor"]),
            st.lists(
                st.tuples(
                    st.integers(0, len(KEYS) - 1),
                    st.one_of(st.none(), st.integers(0, 99)),  # None = delete
                ),
                min_size=1,
                max_size=4,
            ),
        ),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=3,
    max_size=8,
)

RANGE = st.tuples(
    st.one_of(st.none(), st.integers(0, 99)), st.one_of(st.none(), st.integers(0, 99))
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=OPS, rng=RANGE)
def test_pruned_reads_equal_unpruned(spark, ops, rng):
    lo, hi = rng
    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo
    root = tempfile.mkdtemp(prefix="prop_stats_")
    t = IcehouseTable.create(
        f"{root}/t",
        SCHEMA,
        key_col="doc_id",
        n_buckets=2,
        properties={
            "write.stats-columns": "val",
            "write.sort-order": "val",
            "write.max-file-rows": 3,
        },
    )
    model: dict[str, int] = {}
    last_lsn: dict[str, int] = {}
    lsn = [0]
    epoch = [0]
    watermark_lsn = 0
    watermark_model: dict[str, int] = {}

    for kind, payload in ops:
        t.refresh()
        if kind == "compact":
            t.compact_partitions(spark)
            continue
        events = []
        for ki, val in payload:
            lsn[0] += 1
            key = KEYS[ki]
            events.append((lsn[0], "D" if val is None else "U", key, val))
            last_lsn[key] = lsn[0]
            if val is None:
                model.pop(key, None)
            else:
                model[key] = val
        epoch[0] += 1
        batch = spark.createDataFrame(
            events, "lsn long, op string, doc_id string, val int"
        )
        (apply_changes if kind == "cow" else apply_changes_mor)(
            t, batch, epoch=epoch[0]
        )
        if epoch[0] == 1:
            # fix the feed watermark after the first batch
            watermark_lsn = lsn[0]
            watermark_model = dict(model)

    t.refresh()

    def in_range(v):
        return (lo is None or v >= lo) and (hi is None or v <= hi)

    got = {r["doc_id"]: r["val"] for r in t.read(spark, stats_filters={"val": (lo, hi)}).collect()}
    want = {k: v for k, v in model.items() if in_range(v)}
    assert got == want, (got, want, lo, hi)

    # filtered feed: in-range upserts whose winner is newer than the
    # watermark, plus EVERY newer tombstone
    feed = t.read_changed_since(spark, watermark_lsn, stats_filters={"val": (lo, hi)})
    feed_rows = {r["doc_id"]: (r["val"], bool(r["_deleted"])) for r in feed.collect()}
    for k, (v, deleted) in feed_rows.items():
        if deleted:
            # a tombstone in the feed means the key's WINNER is a delete
            assert k not in model, k
        else:
            assert model.get(k) == v and in_range(v), (k, v)
    # completeness 1: every in-range live row that changed after the
    # watermark appears
    changed_keys = {
        k for k, v in model.items() if watermark_model.get(k) != v
    }
    for k in changed_keys:
        if in_range(model[k]):
            assert k in feed_rows and feed_rows[k] == (model[k], False), k
    # completeness 2: every key whose winner is a delete newer than the
    # watermark surfaces as a tombstone — the pruning property the
    # per-file has_deletes flag exists to protect
    for k, last in last_lsn.items():
        if last > watermark_lsn and k not in model:
            assert k in feed_rows and feed_rows[k][1] is True, f"lost tombstone {k}"
