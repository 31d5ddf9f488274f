"""TableFormat — the backend seam between the CDC engine and its table store.

Everything above this layer (``cdc.apply``, ``cdc.replay``, streaming ingest,
the maintenance/replay job CLIs, ``operators.ann_index``) talks to a table
through THIS contract only.  ``IcehouseTable`` is the built-in implementation
(plain Parquet + sharded-manifest JSON metadata, exclusive-create CAS); a
real Apache Iceberg backend becomes a config flag when an Iceberg runtime
jar is present in the Spark session (none ships in this sandbox — the
catalog/REST dependency is environment-blocked, which is why the seam is a
Protocol + factory rather than a second live backend).

Contract summary (see IcehouseTable for full docstrings):

- identity/state: ``root``, ``meta``, ``schema``, ``key_col``, ``n_buckets``,
  ``version``, ``refresh()``, ``row_count()``
- exactly-once fencing: ``epoch_committed(epoch, source)`` — every mutator
  takes ``epoch``/``epoch_source`` and must no-op (skipped=True) on a replay
- read path: ``read(spark, partitions=..., with_meta=...)`` resolving
  merge-on-read deltas last-writer-wins; ``read_changed_since(spark, lsn)``
  (changed-data feed with file skipping); ``read_for_keys(spark, keys)``
  (bucket-pruned point lookup)
- write path: ``overwrite_partitions(df, ...)`` (copy-on-write, partition-
  scoped, serializable via read_version validation),
  ``append_deltas(df, ...)`` (merge-on-read, O(batch)), ``delete_where``,
  ``truncate``
- maintenance: ``compact_partitions``, ``buckets_needing_compaction``,
  ``vacuum_tombstones``, ``expire_snapshots``, ``rebucket``
- time travel: ``load(root, version=...|tag=...)``, ``rollback``,
  ``history``, ``create_tag``/``delete_tag``

The conformance test (tests/test_table_format_seam.py) asserts the built-in
backend satisfies every member, so a drift in either side fails fast.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Protocol, runtime_checkable

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

    from .icehouse import CommitResult


@runtime_checkable
class TableFormat(Protocol):
    """Structural contract every table backend must satisfy."""

    root: str
    meta: dict[str, Any]

    # -- identity / state ---------------------------------------------------
    @property
    def schema(self): ...
    @property
    def key_col(self) -> str: ...
    @property
    def n_buckets(self) -> int: ...
    @property
    def version(self) -> int: ...
    def refresh(self): ...
    def row_count(self) -> int: ...
    def epoch_committed(self, epoch: int, source: str | None = None) -> bool: ...
    def bucket_expr(self, col=None, n_buckets=None): ...

    # -- read path ------------------------------------------------------------
    def read(self, spark, partitions=None, with_part_col=False, with_meta=False): ...
    def read_changed_since(self, spark, lsn_watermark: int): ...
    def read_for_keys(self, spark, keys): ...

    # -- write path -----------------------------------------------------------
    def overwrite_partitions(self, df, epoch=None, **kw) -> "CommitResult": ...
    def append_deltas(self, df, epoch=None, **kw) -> "CommitResult": ...
    def delete_where(self, spark, condition, lsn: int, epoch=None) -> "CommitResult": ...
    def truncate(self, epoch=None, **kw) -> "CommitResult": ...

    # -- maintenance ----------------------------------------------------------
    def compact_partitions(self, spark, partitions=None) -> "CommitResult": ...
    def buckets_needing_compaction(
        self, max_delta_ratio: float = 0.3, min_delta_files: int = 2
    ) -> list[int]: ...
    def vacuum_tombstones(self, spark, lsn_watermark: int) -> "CommitResult": ...
    def expire_snapshots(self, keep_last: int = 3) -> list[str]: ...

    def remove_orphan_files(self, grace_seconds: float = 3600.0) -> list[str]: ...

    def files(self, spark, version: int | None = None) -> "DataFrame": ...

    def update_properties(self, updates, max_retries: int = 5) -> "CommitResult": ...
    def ensure_key_type_unchanged(self, new_schema) -> None: ...
    def check_no_stale_renamed_columns(self, batch_columns) -> None:
        """Refuse batches written under renamed-away column names (their
        values would silently conform to NULL).  Backends that SUBCLASS
        TableFormat inherit this default no-op; purely structural
        implementations may omit the method entirely — engine call sites
        go through ``getattr(..., None)`` and treat absence as
        no-rename-support."""
        return None
    def migrate_key_type(self, spark, new_root: str, new_key_type, n_buckets=None): ...

    # -- time travel / refs -----------------------------------------------------
    def rollback(self, to_version, max_retries: int = 5) -> "CommitResult": ...
    def history(self, spark): ...
    def create_tag(self, name: str, version=None, max_retries: int = 5) -> "CommitResult": ...
    def delete_tag(self, name: str, max_retries: int = 5) -> "CommitResult": ...


_BACKENDS: dict[str, Any] = {}


def register_backend(name: str, cls: Any) -> None:
    """Register a TableFormat implementation under a backend name."""
    _BACKENDS[name] = cls


def _resolve(backend: str) -> Any:
    if backend not in _BACKENDS:
        if backend == "iceberg":
            raise NotImplementedError(
                "the Apache Iceberg backend requires an Iceberg runtime jar + "
                "catalog on the Spark session (not available in this sandbox); "
                "register it via register_backend('iceberg', cls) when present"
            )
        raise KeyError(f"unknown table backend {backend!r}; have {sorted(_BACKENDS)}")
    return _BACKENDS[backend]


def create_table(
    root: str,
    schema,
    key_col: str = "doc_id",
    n_buckets: int = 16,
    backend: str = "icehouse",
    **kw,
) -> TableFormat:
    """Factory: create a table with the selected backend (config-flag seam)."""
    return _resolve(backend).create(root, schema, key_col=key_col, n_buckets=n_buckets, **kw)


def open_table(
    root: str, version: int | None = None, tag: str | None = None,
    backend: str = "icehouse",
) -> TableFormat:
    """Factory: open an existing table with the selected backend."""
    return _resolve(backend).load(root, version=version, tag=tag)
