"""spark-submit entry point for icehouse table maintenance.

At 10^10-event scale a CDC table needs periodic upkeep that is separate from
the ingest path (Iceberg analog: rewrite_data_files / expire_snapshots /
partition-spec evolution, run as scheduled maintenance jobs):

    spark-submit --py-files data_pipeline_spark.zip jobs/maintenance_job.py \
      --table /shared/tables/token_sequences \
      [--compact]                  # bin small files into one sorted file/bucket
      [--compact-deltas]           # fold ONLY merge-on-read delta buckets
                                   # (cost ∝ pending deltas, clean buckets untouched)
      [--vacuum-lsn N]             # reclaim tombstones with _lsn <= N
      [--rebucket N]               # partition-spec evolution to N buckets
      [--expire-keep N             # drop all but the last N snapshots' files
       [--expire-older-than SEC]]   # ... but keep anything younger than SEC
      [--remove-orphans GRACE_SEC] # delete crash-stranded files no retained
                                   # snapshot references (older than the grace
                                   # window; safe alongside live ingest)
      [--rollback V]               # restore snapshot V (or tag name) as a NEW
                                   # commit (pure metadata; later epochs re-open)
      [--tag NAME]                 # pin the current snapshot under a tag
                                   # (exempt from expiry until --delete-tag)
      [--delete-tag NAME]
      [--publish-tag NAME          # write-audit-publish: audit the CURRENT
       --expect RULE:SQL_EXPR ...  # snapshot with the given row-level rules
       [--min-pass-rate R]]        # (one aggregate scan) and atomically
                                   # re-point NAME at it only if every rule's
                                   # pass_rate >= R (default 1.0). Consumers
                                   # reading the tag never see a bad snapshot.
      [--drain-dlq ROOT]           # re-validate + apply quarantined epochs
                                   # that now pass (exactly-once per epoch)
      [--set-property K=V ...]     # pure-metadata property commit, e.g.
                                   # write.fanout=8 (bucket-write fan-out) or
                                   # write.max-file-rows=5000000; V empty
                                   # deletes the key
      [--branch NAME]              # run every action against branch NAME's
                                   # head instead of main (compact a staging
                                   # branch, tag it, roll it back, ...)
      [--create-branch NAME[@V]]   # fork a branch at the current head (or
                                   # at pinned version V) — pure metadata
      [--delete-branch NAME]
      [--fast-forward NAME]        # publish branch NAME's head onto this
                                   # handle's branch (refused unless a true
                                   # fast-forward; see IcehouseTable.fast_forward)
      [--list-branches]            # print the ref map (always safe)
      [--stats]                    # print table health (always safe)

Every action is one atomic, lineage-recorded commit through the same
optimistic-concurrency path as ingest — a maintenance job racing a live
ingest loses the CAS and retries against the fresh snapshot, never corrupts.
Order when combined: compact → vacuum → rebucket → expire (expire last so
it reclaims the files the other actions superseded).

The vacuum watermark is the CALLER's promise: pass an LSN only when every
upstream source is provably past it (an older event for a vacuumed key would
otherwise resurrect the row).  The job never derives it implicitly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def table_stats(table) -> dict:
    parts = table.meta["partitions"]
    rows = [p["rows"] for p in parts.values()]
    return {
        "version": table.version,
        "snapshot_id": table.meta["snapshot_id"],
        "n_buckets": table.n_buckets,
        "populated_partitions": len(parts),
        "rows_total": sum(rows),
        "rows_max_partition": max(rows, default=0),
        "skew_ratio": round(max(rows, default=0) / (sum(rows) / len(rows)), 2)
        if rows
        else None,
        "committed_epochs": len(table.meta["committed_epochs"]),
        "lineage_records": len(table.meta["lineage"]),
        "delta_buckets": sum(1 for ds in table.meta.get("deltas", {}).values() if ds),
        "delta_files": sum(len(ds) for ds in table.meta.get("deltas", {}).values()),
        "delta_rows": sum(
            d["rows"] for ds in table.meta.get("deltas", {}).values() for d in ds
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--compact-deltas", action="store_true")
    ap.add_argument("--zorder", default=None, metavar="COLS",
                    help="with --compact/--compact-deltas: cluster rewritten "
                    "files on an interleaved-bit z-value over these "
                    "comma-separated numeric columns (multi-dimension file "
                    "skipping with write.stats-columns)")
    ap.add_argument("--compact-ratio", type=float, default=None,
                    help="fold only buckets whose pending delta rows exceed "
                         "RATIO x base rows (read-amplification policy)")
    ap.add_argument("--compact-min-files", type=int, default=2,
                    help="ratio policy's pending-delta-file floor (matches "
                         "ReplayRunner's compact_min_files; default 2)")
    ap.add_argument("--compact-epochs", type=int, default=None, metavar="KEEP",
                    help="compress the exactly-once epoch registry, keeping "
                         "KEEP recent full entries per namespace (older "
                         "epochs fold into exact [lo,hi] ranges)")
    ap.add_argument("--create-index", default=None, metavar="COLUMN",
                    help="build a secondary index on COLUMN (requires "
                    "--index-root); slim value-sorted (key, value) table "
                    "kept fresh from the base's changed-data feed")
    ap.add_argument("--refresh-index", default=None, metavar="INDEX_ROOT",
                    help="bring a secondary index up to the base's current "
                    "snapshot (exactly-once; cron-safe)")
    ap.add_argument("--index-root", default=None)
    ap.add_argument("--rename-column", default=None, metavar="OLD:NEW",
                    help="pure-metadata column rename (no rewrite); readers "
                    "alias old files per era, writers must switch to NEW")
    ap.add_argument("--drop-column", default=None, metavar="NAME",
                    help="pure-metadata column drop (no rewrite; old "
                    "snapshots keep the column for time travel)")
    ap.add_argument("--vacuum-lsn", type=int, default=None)
    ap.add_argument("--rebucket", type=int, default=None)
    ap.add_argument("--expire-keep", type=int, default=None)
    ap.add_argument("--expire-older-than", type=float, default=None,
                    metavar="SEC", help="with --expire-keep: additionally "
                    "keep every snapshot younger than SEC seconds")
    ap.add_argument("--remove-orphans", type=float, default=None, metavar="GRACE_SEC",
                    help="delete files referenced by NO retained snapshot and "
                         "older than GRACE_SEC seconds (crash leftovers; safe "
                         "concurrently with ingest — in-flight commits' files "
                         "are younger than the grace window)")
    ap.add_argument("--rollback", default=None,
                    help="version number or tag name")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--delete-tag", default=None)
    ap.add_argument("--publish-tag", default=None, metavar="NAME",
                    help="audit the current snapshot with --expect rules and "
                         "atomically re-point NAME at it iff all pass")
    ap.add_argument("--expect", action="append", default=None,
                    metavar="RULE:SQL_EXPR",
                    help="row-level rule for --publish-tag (repeatable), e.g. "
                         "tokens_intact:'n_tok = size(tokens)'")
    ap.add_argument("--min-pass-rate", type=float, default=1.0)
    ap.add_argument("--set-property", action="append", default=None,
                    metavar="K=V", help="update a table property (repeatable; "
                    "empty value deletes the key); ints auto-coerced")
    ap.add_argument("--branch", default=None,
                    help="operate on this branch's head instead of main")
    ap.add_argument("--create-branch", default=None, metavar="NAME[@VERSION]")
    ap.add_argument("--delete-branch", default=None)
    ap.add_argument("--fast-forward", default=None, metavar="NAME",
                    help="publish branch NAME onto this handle's branch")
    ap.add_argument("--cherry-pick", default=None, metavar="NAME",
                    help="merge branch NAME's net delta onto this handle's "
                         "branch (the diverged-target escape hatch; branch "
                         "wins overlapping keys, fenced on the branch head)")
    ap.add_argument("--cherry-pick-lsn", default="picker",
                    choices=["picker", "preserve"],
                    help="picker: fresh LSN, pick wins everything incl. "
                         "future events; preserve: carry true branch LSNs "
                         "(live-ingest-safe)")
    ap.add_argument("--list-branches", action="store_true")
    ap.add_argument("--drain-dlq", default=None, metavar="DLQ_ROOT",
                    help="re-validate quarantined epochs against the CURRENT "
                         "table schema and apply the ones that now fully "
                         "pass, exactly-once (all-or-nothing per epoch)")
    ap.add_argument("--stats", action="store_true")
    args = ap.parse_args()
    # pure argument validation BEFORE any action commits: a refusal after a
    # branch-mutating action would leave partial work behind a nonzero exit
    if args.zorder and not (args.compact or args.compact_deltas):
        raise SystemExit("--zorder only acts together with --compact/"
                         "--compact-deltas; add one (refusing to no-op)")

    from data_pipeline_spark.table.icehouse import IcehouseTable

    spark = SparkSession.builder.appName("icehouse_maintenance").getOrCreate()
    table = IcehouseTable.load(args.table, branch=args.branch)
    out: dict = {"table": args.table, "branch": table.branch,
                 "before": table_stats(table), "actions": []}

    if args.create_branch is not None:
        name, at, ver = args.create_branch.partition("@")
        res = table.create_branch(name, version=int(ver) if at else None)
        out["actions"].append(
            {"action": "create_branch", "name": name,
             "fork_version": table.list_branches()[name], "version": res.version}
        )
    if args.fast_forward is not None:
        res = table.fast_forward(args.fast_forward)
        out["actions"].append(
            {"action": "fast_forward", "from_branch": args.fast_forward,
             "onto": table.branch, "version": res.version, "skipped": res.skipped}
        )
    if args.cherry_pick is not None:
        from data_pipeline_spark.cdc.cherry import cherry_pick

        res = cherry_pick(spark, table, args.cherry_pick, lsn=args.cherry_pick_lsn)
        out["actions"].append(
            {"action": "cherry_pick", "from_branch": args.cherry_pick,
             "onto": table.branch, "delta_versions": [res.from_version, res.to_version],
             "rows_applied": res.stats.events_applied, "skipped": res.skipped}
        )
    if args.delete_branch is not None:
        res = table.delete_branch(args.delete_branch)
        out["actions"].append(
            {"action": "delete_branch", "name": args.delete_branch,
             "skipped": res.skipped}
        )
    if args.list_branches:
        out["actions"].append(
            {"action": "list_branches", "branches": table.list_branches()}
        )

    if args.compact or args.compact_deltas:
        zcols = [c.strip() for c in (args.zorder or "").split(",") if c.strip()]
        res = table.compact_partitions(
            spark,
            partitions="deltas" if args.compact_deltas else None,
            zorder=zcols or None,
        )
        out["actions"].append(
            {"action": "compact_deltas" if args.compact_deltas else "compact",
             **({"zorder": zcols} if zcols else {}),
             "version": res.version,
             "partitions": len(res.partitions_rewritten or []),
             "skipped": res.skipped}
        )
    if args.compact_ratio is not None:
        hot = table.buckets_needing_compaction(
            args.compact_ratio, min_delta_files=args.compact_min_files
        )
        if hot:
            res = table.compact_partitions(spark, partitions=hot)
            out["actions"].append(
                {"action": "compact_ratio", "ratio": args.compact_ratio,
                 "version": res.version, "partitions": len(hot),
                 "skipped": res.skipped}
            )
        else:
            out["actions"].append(
                {"action": "compact_ratio", "ratio": args.compact_ratio,
                 "partitions": 0, "skipped": True}
            )
    if args.compact_epochs is not None:
        pruned = table.compact_epoch_registry(keep_recent=args.compact_epochs)
        out["actions"].append(
            {"action": "compact_epochs", "keep_recent": args.compact_epochs,
             "entries_pruned": pruned}
        )
    if args.create_index is not None:
        from data_pipeline_spark.table.index import SecondaryIndex

        if not args.index_root:
            raise SystemExit("--create-index requires --index-root")
        idx = SecondaryIndex.create(spark, table, args.index_root, args.create_index)
        out["actions"].append(
            {"action": "create_index", "column": args.create_index,
             "index_root": args.index_root,
             "rows": idx.index.refresh().row_count()}
        )
    if args.refresh_index is not None:
        from data_pipeline_spark.table.index import open_index

        idx = open_index(args.refresh_index)
        res = idx.refresh(spark)
        out["actions"].append({"action": "refresh_index", **res})
    if args.rename_column is not None:
        old, _, new = args.rename_column.partition(":")
        if not old or not new:
            raise SystemExit("--rename-column wants OLD:NEW")
        res = table.rename_column(old, new)
        table.refresh()
        out["actions"].append(
            {"action": "rename_column", "old": old, "new": new, "version": res.version}
        )
    if args.drop_column is not None:
        res = table.drop_column(args.drop_column)
        table.refresh()
        out["actions"].append(
            {"action": "drop_column", "name": args.drop_column, "version": res.version}
        )
    if args.vacuum_lsn is not None:
        res = table.vacuum_tombstones(spark, args.vacuum_lsn)
        out["actions"].append(
            {"action": "vacuum", "lsn_watermark": args.vacuum_lsn, "version": res.version}
        )
    if args.rebucket is not None:
        res = table.rebucket(spark, args.rebucket)
        out["actions"].append(
            {"action": "rebucket", "n_buckets": args.rebucket,
             "version": res.version, "skipped": res.skipped}
        )
    if args.tag is not None:
        res = table.create_tag(args.tag)
        out["actions"].append(
            {"action": "tag", "name": args.tag,
             "pinned_version": table.meta["tags"][args.tag], "version": res.version}
        )
    if args.rollback is not None:
        # Tag namespace wins over version parsing so an all-digit tag name
        # (e.g. a release tag "123") rolls back to the tagged snapshot, not
        # to literal version 123.
        if args.rollback in table.meta.get("tags", {}):
            target = args.rollback
        else:
            target = int(args.rollback) if args.rollback.isdigit() else args.rollback
        res = table.rollback(target)
        out["actions"].append(
            {"action": "rollback", "restored_version": args.rollback,
             "version": res.version, "skipped": res.skipped}
        )
    if args.publish_tag is not None:
        from pyspark.sql import functions as F

        from data_pipeline_spark.operators.expectations import Expectation
        from data_pipeline_spark.table.wap import audit_and_publish

        rules = []
        for spec in args.expect or []:
            name, sep, expr = spec.partition(":")
            if not sep or not name or not expr:
                raise SystemExit(f"--expect expects RULE:SQL_EXPR, got {spec!r}")
            rules.append(Expectation(name, F.expr(expr)))
        if not rules:
            raise SystemExit("--publish-tag requires at least one --expect rule")
        wap = audit_and_publish(
            table, spark, rules, tag=args.publish_tag,
            min_pass_rate=args.min_pass_rate,
        )
        out["actions"].append(
            {"action": "publish", "tag": args.publish_tag,
             "audited_version": wap.version, "published": wap.published,
             "failed_rules": wap.failed_rules, "report": wap.report}
        )
    if args.delete_tag is not None:
        res = table.delete_tag(args.delete_tag)
        out["actions"].append(
            {"action": "delete_tag", "name": args.delete_tag, "skipped": res.skipped}
        )
    if args.drain_dlq is not None:
        from data_pipeline_spark.cdc.quarantine import DeadLetterSink, drain_dlq

        report = drain_dlq(DeadLetterSink(args.drain_dlq), table, spark)
        out["actions"].append({"action": "drain_dlq", **report})
    if args.set_property:
        updates: dict = {}
        for kv in args.set_property:
            k, _, v = kv.partition("=")
            if not k or "=" not in kv:
                raise SystemExit(f"--set-property expects K=V, got {kv!r}")
            updates[k] = None if v == "" else (int(v) if v.lstrip("-").isdigit() else v)
        res = table.update_properties(updates)
        out["actions"].append(
            {"action": "set_property", "updates": updates, "version": res.version}
        )
    if args.expire_keep is not None:
        removed = table.expire_snapshots(
            keep_last=args.expire_keep,
            older_than_seconds=args.expire_older_than,
        )
        out["actions"].append({"action": "expire", "snapshots_removed": len(removed)})

    if args.remove_orphans is not None:
        removed = table.remove_orphan_files(grace_seconds=args.remove_orphans)
        out["actions"].append(
            {"action": "remove_orphans", "grace_seconds": args.remove_orphans,
             "files_removed": len(removed)}
        )

    out["after"] = table_stats(table)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
