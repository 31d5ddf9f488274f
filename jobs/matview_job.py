"""spark-submit entry point for materialized-view lifecycle.

    spark-submit --py-files data_pipeline_spark.zip jobs/matview_job.py \
      --view /tables/ts_by_source \
      [--create --base /tables/token_sequences \
       --group-cols source,split --value-cols n_tok \
       [--scale 1000000] [--n-buckets 8]]   # create at the base's snapshot
      [--refresh [--full]]                  # bring the view up to the base
                                            # head (incremental unless the
                                            # engine must recompute; --full
                                            # forces the re-aggregate path)
      [--show [N]]                          # print the first N logical rows

Refreshes are exactly-once (fenced on the base snapshot version), so a
crashed or double-submitted job re-runs as a no-op — schedule it as dumbly
as you like.  For per-micro-batch freshness run the view under
``StreamingIngest(matviews=[...])`` instead; this job is the batch/cron
form (the replacement for the reference's scheduled full-table GROUP BY
re-runs, ``notification_service/bigquery_queries.py``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--view", required=True)
    ap.add_argument("--create", action="store_true")
    ap.add_argument("--base", default=None)
    ap.add_argument("--group-cols", default=None, help="comma-separated")
    ap.add_argument("--value-cols", default=None, help="comma-separated")
    ap.add_argument("--scale", type=int, default=1_000_000)
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--refresh", action="store_true")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--show", type=int, nargs="?", const=20, default=None)
    args = ap.parse_args()

    from data_pipeline_spark.table.icehouse import IcehouseTable
    from data_pipeline_spark.table.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    spark = SparkSession.builder.appName("matview_maintenance").getOrCreate()
    out: dict = {"view": args.view, "actions": []}

    if args.create:
        if not (args.base and args.group_cols and args.value_cols):
            raise SystemExit("--create requires --base, --group-cols, --value-cols")
        base = IcehouseTable.load(args.base)
        mv = create_matview(
            spark,
            args.view,
            base,
            [c for c in args.group_cols.split(",") if c],
            [c for c in args.value_cols.split(",") if c],
            scale=args.scale,
            n_buckets=args.n_buckets,
        )
        out["actions"].append(
            {"action": "create", "base": args.base,
             "base_version": base.version, "view_version": mv.version}
        )
    mv = IcehouseTable.load(args.view)
    if args.refresh:
        st = refresh_matview(spark, mv, full=args.full)
        out["actions"].append(
            {"action": "refresh", "mode": st.mode,
             "base_version_from": st.base_version_from,
             "base_version_to": st.base_version_to}
        )
    if args.show is not None:
        rows = read_matview(spark, mv.refresh()).limit(args.show).collect()
        out["actions"].append(
            {"action": "show", "rows": [r.asDict() for r in rows]}
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
