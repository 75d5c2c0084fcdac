"""Scaling-efficiency evidence (north rule: throughput scaling >= 0.8 from
N to 4N executors).

No real cluster exists in this sandbox, so per the driver's instruction the
same replay job runs at two parallelism levels — local[8] (N) and local[32]
(4N) — on identical input (same seed/size, generated on the fly), each in a
fresh subprocess/JVM. Reports events/sec at both and

    efficiency = (throughput_4N / throughput_N) / 4

Usage: python tools/bench_scaling.py [n_events] [--update-bench-md]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

CHILD = r"""
import json, os, sys, tempfile, shutil, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1]); n_events = int(sys.argv[2])
# make local[N] a TRUE N-core machine: pin this process (and the JVM it
# spawns, which inherits the affinity mask) to N physical cores, and tell
# the JVM so GC/JIT/common-pool threads size accordingly. Without this the
# "N-core" baseline borrows all 32 physical cores for JVM service threads
# and the scaling comparison is meaningless.
os.sched_setaffinity(0, range(cores))
os.environ["SPARK_GRAFT_CPUS"] = str(cores)
import bench
from cds_spark.session import get_spark
# tmpfs for table data AND shuffle: disk writeback stalls on /tmp add
# multi-second noise that swamps the scaling signal
ramdir = tempfile.mkdtemp(prefix="cds_scale_ram_", dir="/dev/shm")
spark = get_spark(
    "scaling-bench", cores=cores, shuffle_partitions=cores * 2,
    extra_conf={{
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={{cores}}",
        "spark.local.dir": os.path.join(ramdir, "spark-local"),
    }},
)
spark.sparkContext.setLogLevel("ERROR")
# warmup: JIT + codegen caches, so the measured run is steady-state
work = os.path.join(ramdir, "warm")
bench.CPUS = cores
bench.cdc_replay(spark, max(100_000, n_events // 20), work, n_batches=2)
shutil.rmtree(work, ignore_errors=True)
n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
work = os.path.join(ramdir, "tables")
try:
    r = bench.cdc_replay(spark, n_events, work, n_batches=n_batches, mode="append")
finally:
    shutil.rmtree(ramdir, ignore_errors=True)
print("RESULT " + json.dumps(r))
"""


def run_at(cores: int, n_events: int, n_batches: int = 4) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = CHILD.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_events), str(n_batches)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result from local[{cores}] run:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if a.isdigit()]
    n_events = int(args[0]) if args else 8_000_000
    n_batches = int(args[1]) if len(args) > 1 else max(4, n_events // 500_000)
    n, four_n = 8, 32
    r_n = run_at(n, n_events, n_batches)
    r_4n = run_at(four_n, n_events, n_batches)
    eff = (r_4n["events_per_sec"] / r_n["events_per_sec"]) / (four_n / n)
    report = {
        "job": "cdc_replay append-mode, 8 micro-batches + final compact",
        "n_events": n_events,
        f"local[{n}]": r_n,
        f"local[{four_n}]": r_4n,
        "throughput_n": r_n["events_per_sec"],
        "throughput_4n": r_4n["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
