"""Write-audit-publish (WAP) over icehouse snapshots — tag-based publishing.

Ingest commits freely to the table head; CONSUMERS read a named tag
(``IcehouseTable.load(root, tag="published")`` / ``read``), and the tag only
advances to a new snapshot after a declarative audit passes on exactly that
snapshot.  This is the tag/branch publishing pattern Iceberg documents for
WAP, adapted to this engine's linear CAS metadata log:

- **Pin first, then audit.**  The audited version is captured before the
  scan, and the tag is moved to THAT version — concurrent ingest commits
  landing mid-audit can neither be published accidentally nor invalidate
  the audit (snapshots are immutable).
- **Audit = one scan.**  Rules are ``operators.expectations.Expectation``
  row-level predicates, compiled into a single aggregate pass
  (``check_expectations``) over the pinned snapshot.
- **Publish = one CAS commit.**  ``create_tag`` re-points the tag
  atomically; a failed audit leaves it exactly where it was, so downstream
  readers never observe the bad snapshot.  Published-over snapshots stay
  time-travelable; the superseded tag target becomes expirable again.
- **Failure is data, not control flow.**  The returned report carries every
  rule's (n_rows, n_violations, pass_rate), whether published or not — the
  gate a pipeline scheduler thresholds and alerts on.

At 100 TB the audit cost is one whole-stage-codegen'd scan of the snapshot
(k rules ≠ k scans), and publishing is pure metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..operators.expectations import Expectation, check_expectations
from .icehouse import IcehouseTable

PUBLISHED_TAG = "published"


@dataclass
class WapResult:
    """Outcome of one audit-and-publish attempt."""

    version: int                      #: snapshot the audit ran against
    published: bool                   #: did the tag move to `version`?
    tag: str
    report: list[dict[str, Any]] = field(default_factory=list)
    failed_rules: list[str] = field(default_factory=list)


def audit_snapshot(
    table: IcehouseTable,
    spark: SparkSession,
    expectations: list[Expectation],
    version: int | None = None,
    min_pass_rate: float = 1.0,
) -> tuple[list[dict[str, Any]], list[str], int]:
    """Run the rule set against one pinned snapshot (default: the handle's
    current version).  Returns (report rows, failed rule names, version).

    ``min_pass_rate=1.0`` demands zero violations; a lower threshold
    tolerates a violation budget (e.g. 0.999 = publish unless >0.1% of rows
    fail a rule)."""
    version = table.version if version is None else version
    snap = IcehouseTable.load(table.root, version=version)
    report_df = check_expectations(snap.read(spark), expectations)
    report = [r.asDict() for r in report_df.collect()]
    failed = [r["rule"] for r in report if r["pass_rate"] < min_pass_rate]
    return report, failed, version


def audit_and_publish(
    table: IcehouseTable,
    spark: SparkSession,
    expectations: list[Expectation],
    tag: str = PUBLISHED_TAG,
    min_pass_rate: float = 1.0,
    version: int | None = None,
) -> WapResult:
    """The WAP gate: audit a pinned snapshot; on a clean report, atomically
    re-point ``tag`` at it.  On failure the tag does not move and the
    failing rules are reported.  Idempotent: re-running on an already-
    published version is a harmless re-tag of the same pin.

    Before re-pointing, the OUTGOING pin is recorded under ``{tag}-prev`` —
    that keeps the consumer's incremental feed
    (``cdc.cdf.diff_between_refs(spark, root, f"{tag}-prev", tag)``) working
    out of the box, and pins the previous published snapshot against GC for
    as long as the feed may need it.  A re-publish of the same version does
    NOT move ``-prev`` (idempotency)."""
    report, failed, version = audit_snapshot(
        table, spark, expectations, version=version, min_pass_rate=min_pass_rate
    )
    if failed:
        return WapResult(version, False, tag, report, failed)
    # fresh load: the handle's meta may predate a concurrent publish
    prev = IcehouseTable.load(table.root).meta.get("tags", {}).get(tag)
    if prev is not None and int(prev) != int(version):
        table.create_tag(f"{tag}-prev", version=int(prev))
    table.create_tag(tag, version=version)
    return WapResult(version, True, tag, report, [])


def read_published(
    spark: SparkSession, root: str, tag: str = PUBLISHED_TAG
) -> DataFrame:
    """Consumer entry point: read the last snapshot that passed its audit.
    Raises KeyError if nothing was ever published."""
    return IcehouseTable.load(root, tag=tag).read(spark)
