"""TableFormat backend seam: the built-in icehouse backend must satisfy the
full structural contract, the factory must route by backend name, and the
engine layers must touch tables only through contract members (so a real
Iceberg backend is a config flag, not a refactor)."""

import inspect

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from data_pipeline_spark.table import (
    IcehouseTable,
    TableFormat,
    create_table,
    open_table,
)

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

CONTRACT_MEMBERS = [
    "schema", "key_col", "n_buckets", "version", "refresh", "row_count",
    "epoch_committed", "bucket_expr", "read", "read_changed_since",
    "read_for_keys", "overwrite_partitions", "append_deltas", "delete_where",
    "truncate", "compact_partitions", "buckets_needing_compaction",
    "vacuum_tombstones", "expire_snapshots", "rollback", "history",
    "create_tag", "delete_tag", "update_properties",
    "ensure_key_type_unchanged", "migrate_key_type",
    "check_no_stale_renamed_columns",
]


def test_icehouse_satisfies_contract(tmp_path):
    t = create_table(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    assert isinstance(t, IcehouseTable)
    assert isinstance(t, TableFormat)  # runtime_checkable structural check
    for m in CONTRACT_MEMBERS:
        assert hasattr(t, m), f"contract member missing: {m}"


def test_factory_roundtrip_and_unknown_backend(tmp_path, spark):
    t = create_table(str(tmp_path / "t"), TABLE_SCHEMA, n_buckets=4)
    t.overwrite_partitions(
        spark.createDataFrame(
            [Row(doc_id="a", tokens=[1], n_tok=1, source="s")]
        ),
        epoch=0,
    )
    again = open_table(str(tmp_path / "t"))
    assert again.version == t.version and again.row_count() == 1
    with pytest.raises(KeyError):
        open_table(str(tmp_path / "t"), backend="nope")
    with pytest.raises(NotImplementedError):
        open_table(str(tmp_path / "t"), backend="iceberg")


def test_engine_layers_use_only_contract_members():
    """Static sweep: every attribute the CDC/streaming/jobs layers access on
    a table object must be a contract member — the seam's actual guarantee.
    Heuristic: scan source for ``table.<attr>`` / ``self.table.<attr>``."""
    import re

    import data_pipeline_spark.cdc.apply as apply_mod
    import data_pipeline_spark.cdc.replay as replay_mod
    import data_pipeline_spark.operators.ann_index as ann_mod
    import data_pipeline_spark.streaming.ingest as ingest_mod

    allowed = set(CONTRACT_MEMBERS) | {"root", "meta"}
    pat = re.compile(r"\b(?:self\.)?table\.([a-zA-Z_][a-zA-Z0-9_]*)")
    offenders = {}
    for mod in (apply_mod, replay_mod, ingest_mod, ann_mod):
        src = "\n".join(
            ln
            for ln in inspect.getsource(mod).splitlines()
            if not ln.lstrip().startswith(("from ", "import "))  # module paths
        )
        used = set(pat.findall(src))
        extra = used - allowed
        if extra:
            offenders[mod.__name__] = sorted(extra)
    assert not offenders, f"non-contract table members used: {offenders}"
