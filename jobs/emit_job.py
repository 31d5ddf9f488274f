"""spark-submit entry point for the outbound-CDC publisher.

Cluster deployment (the downstream half of the replication story —
``jobs/replay_job.py`` ingests a wire feed, this job PRODUCES one):

    spark-submit \
      --master <cluster-master> \
      --py-files data_pipeline_spark.zip \
      jobs/emit_job.py \
      --table      /shared/tables/token_sequences \
      --out        /shared/feeds/token_sequences \
      --checkpoint /shared/checkpoints/token_sequences.emit.json \
      [--to-ref published] [--connector icehouse] [--table-name token_sequences]

Each run emits everything committed since the previous run (the checkpoint
stores the last emitted version) as Debezium JSON-lines files in ``--out``
— the exact wire any Kafka-Connect-style consumer reads, and the exact
directory a downstream ``jobs/replay_job.py --source-format debezium
--streaming`` tails into a mirror table (the table→table live-replication
loop is asserted end-to-end in tests/test_emit.py).

``--to-ref published`` pins emission to the WAP-audited tag instead of the
raw head, so consumers only ever see deltas between audited snapshots.

Delivery: at-least-once with idempotent effect — envelopes carry the TRUE
per-row LSNs, so a re-emitted delta converges under any LWW consumer (the
engine's own tail additionally fences per micro-batch).  Schedule it from
cron/Airflow at whatever cadence the consumers need; an empty delta writes
nothing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--to-ref", default=None,
                    help="emit up to this version or tag (e.g. 'published' "
                         "to trail the WAP-audited state); default = head")
    ap.add_argument("--connector", default="icehouse")
    ap.add_argument("--table-name", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from data_pipeline_spark.cdc.emit import emit_to_files
    from data_pipeline_spark.session import get_spark

    spark = get_spark("emit_job", master=args.master)
    to_ref: "int | str | None" = args.to_ref
    if to_ref is not None and to_ref.isdigit():
        to_ref = int(to_ref)
    report = emit_to_files(
        spark,
        args.table,
        args.out,
        args.checkpoint,
        ref_to=to_ref,
        connector=args.connector,
        table_name=args.table_name,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
