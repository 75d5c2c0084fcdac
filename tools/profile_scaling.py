"""Stage-decomposed scaling profile: find which stage of cdc_replay
anti-scales from local[8] to local[32]. Dev tool, not part of the bench."""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, tempfile, shutil, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); n_events = int(sys.argv[2])
os.sched_setaffinity(0, range(cores))
os.environ["SPARK_GRAFT_CPUS"] = str(cores)
from cds_spark.session import get_spark
from cds_spark.sources.feed import REPO_SCHEMA, change_feed
from cds_spark.operators.decode import decode_feed, events_to_rows
from cds_spark.operators.dedup import lww_collapse
from cds_spark.lake.table import LakeTable
from pyspark.sql import functions as F

ramdir = tempfile.mkdtemp(prefix="cds_prof_", dir="/dev/shm")
spark = get_spark(
    "prof", cores=cores, shuffle_partitions=cores * 2,
    extra_conf={{
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={{cores}}",
        "spark.local.dir": os.path.join(ramdir, "spark-local"),
    }},
)
spark.sparkContext.setLogLevel("ERROR")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def feed_rows():
    feed = change_feed(spark, n_events, n_repos=2000, paths_per_repo=500,
                       seed=42, n_partitions=cores)
    events = decode_feed(feed, inject={{"commit": "commit"}})
    rows, _ = events_to_rows(events, REPO_SCHEMA, ["repo", "path"])
    return rows

stages = {{}}
def timed(name, fn, warm=True):
    if warm:
        fn()
    t0 = time.time(); fn(); stages[name] = round(time.time() - t0, 2)

# A: generate+decode+project, no shuffle
timed("A_gen_decode", lambda: noop(feed_rows()))

# B: + LWW collapse (shuffle + window)
timed("B_plus_lww", lambda: noop(lww_collapse(feed_rows(), ["repo","path"], ["commit","_offset"])))

# C: + bucket repartition + sort + parquet write (append-mode txn write)
def stage_c():
    root = os.path.join(ramdir, f"t_{{time.time_ns()}}")
    t = LakeTable.create(spark, root, REPO_SCHEMA, pk=["repo","path"],
                         version_cols=["commit","_offset"], n_buckets=64,
                         properties={{"merge_mode": "append"}})
    t.merge(feed_rows(), fence=("p", 0))
    shutil.rmtree(root, ignore_errors=True)
timed("C_append_merge", stage_c)

# D: compact after 4 append batches
def stage_d_setup():
    root = os.path.join(ramdir, f"d_{{time.time_ns()}}")
    t = LakeTable.create(spark, root, REPO_SCHEMA, pk=["repo","path"],
                         version_cols=["commit","_offset"], n_buckets=64,
                         properties={{"merge_mode": "append"}})
    per = n_events // 4
    for i in range(4):
        feed = change_feed(spark, per, n_repos=2000, paths_per_repo=500,
                           seed=42, n_partitions=cores, start_offset=i*per)
        ev = decode_feed(feed, inject={{"commit": "commit"}})
        rows, _ = events_to_rows(ev, REPO_SCHEMA, ["repo","path"])
        t.merge(rows, fence=("p", i))
    return root, t
root, t = stage_d_setup()
t0 = time.time(); t.compact(purge_tombstones=True); stages["D_compact"] = round(time.time()-t0, 2)
shutil.rmtree(ramdir, ignore_errors=True)
print("RESULT " + json.dumps(stages))
"""


def run_at(cores: int, n_events: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = CHILD.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_events)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result local[{cores}]:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}")


if __name__ == "__main__":
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    for cores in (8, 32):
        r = run_at(cores, n_events)
        print(f"local[{cores}]: {json.dumps(r)}")
