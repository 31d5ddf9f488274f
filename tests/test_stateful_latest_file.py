"""Tests: applyInPandasWithState streaming dedup and the latest-file-per-
partition metadata scan.

The stateful-dedup test runs in a SUBPROCESS with its own SparkSession:
applyInPandasWithState python workers crash when run inside this suite's
long-lived shared session (pyspark 4.1 worker-reuse interaction), while the
identical query is stable in a fresh session — which is also the shape real
streaming jobs have (dedicated driver per query).
"""

import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.sources.json_lake import latest_file_per_partition

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEDUP_DRIVER = """
import sys, json
sys.path.insert(0, {repo!r})
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.streaming.stateful import streaming_dedup_first_seen

spark = get_spark("stateful_drive", master="local[4]", shuffle_partitions=4)
src, out, ck = {src!r}, {out!r}, {ck!r}
spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "doc_id string, lsn long") \\
    .coalesce(1).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema

def drain(expect_rows):
    stream = spark.readStream.schema(schema).parquet(src)
    q = (streaming_dedup_first_seen(stream, "doc_id")
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck).outputMode("append")
         .trigger(availableNow=True).start())
    # a stateful query with ProcessingTimeTimeout neither self-terminates
    # under availableNow nor quiesces for processAllAvailable (pending state
    # timeouts keep scheduling batches): poll the SINK until the expected
    # rows landed, then stop explicitly
    import time as _t
    deadline = _t.time() + 150
    while _t.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= expect_rows:
                break
        except Exception:
            pass
        _t.sleep(1)
    q.stop()

drain(2)
r1 = sorted((r["key"], int(r["first_lsn"])) for r in spark.read.parquet(out).collect())
spark.createDataFrame([("a", 10), ("c", 11), ("c", 12)], "doc_id string, lsn long") \\
    .coalesce(1).write.mode("append").parquet(src)
drain(3)
r2 = sorted((r["key"], int(r["first_lsn"])) for r in spark.read.parquet(out).collect())
print("RESULT_JSON " + json.dumps({{"r1": r1, "r2": r2}}))
"""


def test_streaming_dedup_first_seen_subprocess(tmp_path):
    script = DEDUP_DRIVER.format(
        repo=REPO,
        src=str(tmp_path / "src"),
        out=str(tmp_path / "out"),
        ck=str(tmp_path / "ck"),
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("RESULT_JSON ")]
    assert marker, f"driver failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    res = json.loads(marker[0][len("RESULT_JSON "):])
    assert res["r1"] == [["a", 1], ["b", 2]]
    # redelivered keys suppressed across restart; new key c emitted once
    assert res["r2"] == [["a", 1], ["b", 2], ["c", 11]]


TTL_DRIVER = """
import sys, json, time
sys.path.insert(0, {repo!r})
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.streaming.stateful import streaming_dedup_first_seen

spark = get_spark("stateful_ttl", master="local[4]", shuffle_partitions=4)
src, out, ck = {src!r}, {out!r}, {ck!r}
spark.createDataFrame([("a", 1)], "doc_id string, lsn long") \\
    .coalesce(1).write.mode("overwrite").parquet(src)
schema = spark.read.parquet(src).schema

def drain(expect_rows):
    stream = spark.readStream.schema(schema).parquet(src)
    q = (streaming_dedup_first_seen(stream, "doc_id", ttl_ms=3000)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck).outputMode("append")
         .trigger(availableNow=True).start())
    deadline = time.time() + 150
    while time.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= expect_rows:
                break
        except Exception:
            pass
        time.sleep(1)
    time.sleep(3)  # let the emitting batch's checkpoint commit finish
    q.stop()

drain(1)                       # key a emitted, state TTL armed (3s)
time.sleep(5)                  # wall-clock passes the TTL
spark.createDataFrame([("b", 2)], "doc_id string, lsn long") \\
    .coalesce(1).write.mode("append").parquet(src)
drain(2)                       # batch with b runs -> a's timeout fires -> state removed
spark.createDataFrame([("a", 30)], "doc_id string, lsn long") \\
    .coalesce(1).write.mode("append").parquet(src)
drain(3)                       # a's state expired, so a is re-emitted
rows = sorted((r["key"], int(r["first_lsn"])) for r in spark.read.parquet(out).collect())
print("RESULT_JSON " + json.dumps({{"rows": rows}}))
"""


def test_streaming_dedup_state_expires_after_ttl(tmp_path):
    """Regression: hasTimedOut must remove state (not re-register the
    timeout forever) — an expired key is eligible for re-emission."""
    script = TTL_DRIVER.format(
        repo=REPO,
        src=str(tmp_path / "src"),
        out=str(tmp_path / "out"),
        ck=str(tmp_path / "ck"),
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=420
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("RESULT_JSON ")]
    assert marker, f"driver failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    res = json.loads(marker[0][len("RESULT_JSON "):])
    assert res["rows"] == [["a", 1], ["a", 30], ["b", 2]]


def test_latest_file_per_partition(spark, tmp_path):
    base = tmp_path / "lake"
    d = base / "source=sa"
    d.mkdir(parents=True)
    (d / "old.json").write_text(json.dumps({"v": 1}))
    time.sleep(1.1)  # distinct mtimes at 1s filesystem granularity
    (d / "new.json").write_text(json.dumps({"v": 2}))
    d2 = base / "source=sb"
    d2.mkdir()
    (d2 / "only.json").write_text(json.dumps({"v": 3}))
    df = (
        spark.read.option("basePath", str(base))
        .json(str(base) + "/source=*/")
        .select("*", "_metadata")
    )
    latest = latest_file_per_partition(df, ["source"])
    got = {(r["source"], r["v"]) for r in latest.select("source", "v").collect()}
    assert got == {("sa", 2), ("sb", 3)}
