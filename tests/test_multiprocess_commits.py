"""Cross-PROCESS commit chaos: two independent spark processes committing
into the same table while this process hammers metadata loads.  Threads
share a GIL and an open-file table; only separate processes prove the
exclusive-link CAS and the never-see-a-partial-root guarantee in the regime
spark-submit deployments actually run in."""

import os
import subprocess
import sys
import time

from pyspark.sql import types as T

from data_pipeline_spark.table.icehouse import IcehouseTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
    ]
)

WRITER = '\nimport sys\nrepo, root, tag, base_epoch = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])\nsys.path.insert(0, repo)\nfrom data_pipeline_spark.session import get_spark\nfrom data_pipeline_spark.cdc.apply import apply_changes\nfrom data_pipeline_spark.table.icehouse import (\n    CommitConflictError, ConcurrentCommitError, IcehouseTable,\n)\n\nspark = get_spark("w" + tag, master="local[2]", shuffle_partitions=4)\nfor e in range(3):\n    rows = spark.createDataFrame(\n        [(base_epoch * 100 + e * 10 + i, "I", tag + "_" + str(e) + "_" + str(i), 1)\n         for i in range(20)],\n        "lsn long, op string, doc_id string, n_tok int",\n    )\n    for _ in range(30):\n        try:\n            apply_changes(IcehouseTable.load(root), rows, epoch=base_epoch + e)\n            break\n        except (CommitConflictError, ConcurrentCommitError):\n            continue\n    else:\n        raise SystemExit("epoch never committed: " + str(base_epoch + e))\nprint("WRITER_DONE", tag)\n'


def test_two_processes_commit_with_reader_hammer(spark, tmp_path):
    root = str(tmp_path / "t")
    IcehouseTable.create(root, SCHEMA, key_col="doc_id", n_buckets=2)
    script = str(tmp_path / "writer.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(script, "w") as fh:
        fh.write(WRITER)

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, script, repo, root, tag, str(base)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for tag, base in (("a", 0), ("b", 100))
    ]
    # reader hammer: metadata loads must NEVER observe a partial root
    # (pre-fix this raised JSONDecodeError under commit races)
    loads = 0
    deadline = time.time() + 480
    while any(p.poll() is None for p in procs) and time.time() < deadline:
        t = IcehouseTable.load(root)  # raises on any partial/corrupt root
        assert isinstance(t.version, int)
        loads += 1
        time.sleep(0.01)
    outs = [p.communicate(timeout=120) for p in procs]
    assert all(p.returncode == 0 for p in procs), [o[1][-1500:] for o in outs]
    assert loads > 50, f"reader barely ran ({loads} loads) — not a real hammer"

    final = IcehouseTable.load(root)
    for e in (0, 1, 2, 100, 101, 102):
        assert final.epoch_committed(e), f"epoch {e} missing"
    assert final.read(spark).count() == 120  # 2 writers x 3 epochs x 20 rows
