"""Build the --py-files artifact for spark-submit deployment.

    python tools/make_pyfiles.py [out.zip]

then:

    spark-submit --master <cluster> --py-files data_pipeline_spark.zip \
        jobs/replay_job.py --log-path ... --table ... --checkpoint ...

Verified in-sandbox (see BENCH.md deployment note): batch replay, fenced
re-submit (0 events applied, version unchanged), and streaming mode all run
under spark-submit with only the zip on the executors' PYTHONPATH, and the
batch-mode and streaming-mode tables converge to the identical final state.
"""

import shutil
import sys
import os

if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "data_pipeline_spark.zip")
    base = out[:-4] if out.endswith(".zip") else out
    shutil.make_archive(base, "zip", repo, "data_pipeline_spark")
    print(f"{base}.zip")
