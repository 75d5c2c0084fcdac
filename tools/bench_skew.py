"""Hot-key skew evidence (north rule: "partitioning / shuffle / skew handled
explicitly").

The classic CDC skew case is a SINGLE hot key — one row updated in a large
fraction of all events (a lock row, a counter document, one file rewritten
by a bot on every commit). Under key-partitioned writes that key's entire
volume lands in ONE shuffle partition: one straggler task serializes the
micro-batch no matter how many executors exist, and scaling efficiency
collapses exactly at the cluster sizes the north rule measures.

This harness builds a feed where the hottest (repo, path) key carries >10%
of ALL events (skew=12 power law over 2000 repos x 4 paths) and replays the
IDENTICAL bytes under the three `write.salt` table modes:

- ``row``  (engine default): salt = hash(offset, pk) — the hot key spreads
  across salt_n partitions; LWW merge-on-read absorbs the extra files.
- ``key``: salt = hash(pk) — what a naive "repartition by key" engine does;
  buckets spread but the hot key still serializes into one task.
- ``none``: shuffle on bare bucket ids (balls-into-bins double whammy).

All three converge to the SAME final state (digest equality asserted in the
artifact and in tests/test_lake.py); only task balance — and therefore
wall-clock under skew — differs. Writes BENCH_SKEW_r5.json.

Reference parity: cds shards by siphash(pk) % N with no row salt
(pkg/ckgroup/dml.go) — the ``key`` mode is its behavior under this workload.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("CDS_SKEW_EVENTS", "4000000"))
N_BATCHES = 4

# 2000 repos x 4 paths under a skew=12 power law: repo 0 absorbs
# (1/2000)^(1/12) ~ 53% of events over just 4 keys -> hottest key ~13%
FEED_KW = dict(n_repos=2000, paths_per_repo=4, skew=12.0, seed=42)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import cdc_replay
    from cds_spark.session import get_spark
    from cds_spark.sources.feed import change_feed, materialize_feed

    spark = get_spark("cds-bench-skew", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    ram_ok = (
        os.path.isdir("/dev/shm")
        and shutil.disk_usage("/dev/shm").free > 8 * 1024**3
    )
    work = tempfile.mkdtemp(prefix="cds_skew_", dir="/dev/shm" if ram_ok else None)
    try:
        feed_paths = materialize_feed(
            spark, N_EVENTS, os.path.join(work, "feed"), N_BATCHES,
            n_partitions=CPUS, **FEED_KW
        )
        # measure the actual key skew in the materialized feed
        feed = spark.read.parquet(*feed_paths)
        top = (
            feed.groupBy("repo", "path").count()
            .orderBy(F.desc("count")).limit(1).collect()[0]
        )
        n_total = feed.count()  # includes duplicate deliveries
        top_share = round(top["count"] / n_total, 4)

        results: dict[str, dict] = {}
        for i, mode in enumerate(["row", "key", "none"]):
            runs = [
                cdc_replay(
                    spark, N_EVENTS, work, mode="append",
                    feed_paths=feed_paths, warmup=(i == 0 and j == 0),
                    table_properties={"write.salt": mode},
                )
                for j in range(2)
            ]
            best = max(runs, key=lambda r: r["events_per_sec"])
            best["all_runs_events_per_sec"] = [r["events_per_sec"] for r in runs]
            results[mode] = best

        digests = {m: r["digest"] for m, r in results.items()}
        out = {
            "job": (
                "cdc_replay append-mode on a single-hot-key feed "
                f"({N_EVENTS} events, {N_BATCHES} batches, best of 2 per mode)"
            ),
            "cpus": CPUS,
            "feed": {**FEED_KW, "n_events": N_EVENTS,
                     "hot_key": f"{top['repo']}/{top['path']}",
                     "hot_key_share_of_events": top_share},
            "modes": results,
            "digest_equal_across_modes": len(set(digests.values())) == 1,
            "row_vs_key_speedup": round(
                results["row"]["events_per_sec"]
                / results["key"]["events_per_sec"], 2
            ),
            "row_vs_none_speedup": round(
                results["row"]["events_per_sec"]
                / results["none"]["events_per_sec"], 2
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(out)
    print(line)
    with open(os.path.join(HERE, "BENCH_SKEW_r5.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
