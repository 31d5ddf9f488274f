"""Property-based replay correctness (hypothesis): for ARBITRARY event
sequences — any mix of I/U/D, duplicate LSNs, interleaved keys, any epoch
split — the engine's final state equals the sequential oracle under
token-array equality, applied in order AND in reverse epoch order."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from data_pipeline_spark.cdc.apply import apply_changes
from data_pipeline_spark.table import IcehouseTable

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# an event: (key 0..3, op, payload token)
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=16,
)


def oracle(rows):
    state = {}
    for lsn, (k, op, tok) in enumerate(rows):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = tok
    return state


@pytest.mark.parametrize("mode", ["cow", "mor", "mixed"])
@pytest.mark.parametrize("order", ["forward", "reverse"])
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_strategy, split=st.integers(min_value=1, max_value=15))
def test_replay_matches_oracle_any_order(
    spark, tmp_path_factory, events, split, order, mode
):
    rows = [
        (lsn, op, f"k{k}", None if op == "D" else [tok, tok + 1], None if op == "D" else 2, "s")
        for lsn, (k, op, tok) in enumerate(events)
    ]
    log = spark.createDataFrame(
        rows, "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string"
    )
    root = tmp_path_factory.mktemp("prop")
    table = IcehouseTable.create(str(root / "t"), TABLE_SCHEMA, n_buckets=2)
    cut = min(split, len(rows))
    batches = [log.where(f"lsn < {cut}"), log.where(f"lsn >= {cut}")]
    epochs = [0, 1]
    if order == "reverse":
        batches, epochs = batches[::-1], epochs[::-1]
    from data_pipeline_spark.cdc.apply import apply_changes_mor

    fns = {
        "cow": [apply_changes, apply_changes],
        "mor": [apply_changes_mor, apply_changes_mor],
        # mixed exercises the COW-over-deltas fold path with arbitrary data
        "mixed": [apply_changes_mor, apply_changes],
    }[mode]
    for fn, (ep, batch) in zip(fns, zip(epochs, batches)):
        if batch.isEmpty():
            continue
        fn(table, batch, epoch=ep)
    want = {
        f"k{k}": (tok, tok + 1) for k, tok in oracle(events).items()
    }
    got = {r["doc_id"]: tuple(r["tokens"]) for r in table.read(spark).collect()}
    assert got == want


# maintenance op codes the interleaving strategy can inject between epochs
_MAINT = ["compact_deltas", "compact_ratio", "tag_untag", "epoch_gc", "expire", "reload"]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=events_strategy,
    splits=st.lists(st.integers(min_value=1, max_value=15), min_size=1, max_size=3),
    maint=st.lists(st.sampled_from(_MAINT), min_size=1, max_size=4),
    modes=st.lists(st.sampled_from(["cow", "mor"]), min_size=4, max_size=4),
)
def test_maintenance_interleavings_preserve_state(
    spark, tmp_path_factory, events, splits, maint, modes
):
    """Arbitrary maintenance operations (targeted compaction, ratio-policy
    compaction, tag create/delete, epoch-registry compaction, snapshot
    expiry, handle reload) injected between arbitrary COW/MOR epoch applies
    must never change the resolved table state, break the exactly-once
    fence, or corrupt the sharded-manifest metadata."""
    from data_pipeline_spark.cdc.apply import apply_changes_mor
    from data_pipeline_spark.table import open_table

    rows = [
        (lsn, op, f"k{k}", None if op == "D" else [tok, tok + 1],
         None if op == "D" else 2, "s")
        for lsn, (k, op, tok) in enumerate(events)
    ]
    log = spark.createDataFrame(
        rows,
        "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    root = tmp_path_factory.mktemp("prop_maint")
    table = IcehouseTable.create(str(root / "t"), TABLE_SCHEMA, n_buckets=2)
    cuts = sorted({min(s, len(rows)) for s in splits})
    bounds = [0] + cuts + [len(rows) + 1]
    batches = [
        log.where(f"lsn >= {lo} and lsn < {hi}")
        for lo, hi in zip(bounds, bounds[1:])
    ]
    mq = list(maint)
    for ep, batch in enumerate(batches):
        if not batch.isEmpty():
            fn = apply_changes_mor if modes[ep % len(modes)] == "mor" else apply_changes
            fn(table, batch, epoch=ep)
        if mq:
            op = mq.pop(0)
            if op == "compact_deltas" and table.meta.get("deltas"):
                table.compact_partitions(spark, partitions="deltas")
            elif op == "compact_ratio":
                hot = table.buckets_needing_compaction(0.2, 1)
                if hot:
                    table.compact_partitions(spark, partitions=hot)
            elif op == "tag_untag":
                table.create_tag("pin")
                table.delete_tag("pin")
            elif op == "epoch_gc":
                table.compact_epoch_registry(keep_recent=1)
            elif op == "expire":
                table.expire_snapshots(keep_last=1)
            elif op == "reload":
                table = open_table(table.root)
    want = {f"k{k}": (tok, tok + 1) for k, tok in oracle(events).items()}
    got = {
        r["doc_id"]: tuple(r["tokens"]) for r in table.read(spark).collect()
    }
    assert got == want
    # every applied epoch stays fenced after any maintenance interleaving
    for ep, batch in enumerate(batches):
        if not batch.isEmpty():
            assert table.epoch_committed(ep), f"epoch {ep} lost its fence"
    # and a fresh handle reconstructs the identical state from disk
    fresh = open_table(table.root)
    assert {
        r["doc_id"]: tuple(r["tokens"]) for r in fresh.read(spark).collect()
    } == want
