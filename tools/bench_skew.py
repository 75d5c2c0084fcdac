"""Hot-key skew evidence (north rule: "partitioning / shuffle / skew handled
explicitly").

The classic CDC skew case is a SINGLE hot key — one row updated in a large
fraction of all events (a lock row, a counter document, one file rewritten
by a bot on every commit). In append mode each micro-batch writes its rows
through ONE shuffle on (bucket, salt); with a pk-determined shuffle key the
hot key's entire batch volume lands in one task, and that straggler
serializes the micro-batch no matter how many executors exist — exactly the
failure the north rule's N→4N scaling criterion would expose.

This harness builds a feed where the hottest (repo, path) key carries ~13%
of ALL events (skew=12 power law over 2000 repos x 4 paths) and replays the
IDENTICAL bytes under four write configurations:

- ``none``: shuffle on bare bucket ids — hot bucket = hot task, plus
  balls-into-bins leaves ~1/e of partitions empty.
- ``key``: salt = hash(pk) — what a naive "repartition by key" engine does
  (and the reference's siphash%N sharding, pkg/ckgroup/dml.go): buckets
  spread, but the hot KEY still serializes into one task.
- ``row``: engine default — salt = hash(offset, pk) with the file-count-
  bounded default spread (salt_n ~ 4*cores/n_buckets).
- ``row_wide``: row salt with ``write.salt_n=32`` — the knob a known-skewed
  workload turns: the hot key spreads across 32 partitions at the cost of
  more (smaller) files per write, which compact absorbs.

Methodology notes baked into the numbers:
- ingest-only (no compact in the timed region): the bucket LAYOUT is
  identical across modes — salt never changes which bucket a key lives in —
  so compaction skew is mode-independent by construction and would only add
  noise to the comparison.
- modes run INTERLEAVED (full round-robin, 2 reps, keep-best per mode) so
  JIT warmup or a host window can't bias whichever mode runs first.
- all four final states are digest-equal (salting is write-task balance,
  never semantics) — also asserted in tests/test_e2e_replay.py.

Writes BENCH_SKEW_r5.json.
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
N_EVENTS = int(os.environ.get("CDS_SKEW_EVENTS", "12000000"))
N_BATCHES = 2
REPS = 2

# 2000 repos x 4 paths under a skew=12 power law: repo 0 absorbs
# (1/2000)^(1/12) ~ 53% of events over just 4 keys -> hottest key ~13%
FEED_KW = dict(n_repos=2000, paths_per_repo=4, skew=12.0, seed=42)

MODES: list[tuple[str, dict]] = [
    ("none", {"write.salt": "none"}),
    ("key", {"write.salt": "key"}),
    ("row", {"write.salt": "row"}),
    ("row_wide", {"write.salt": "row", "write.salt_n": "32"}),
]


def straggler_analysis(spark, feed_paths: list[str], n_buckets: int = 64) -> dict:
    """EXACT, noise-free task-balance analysis of the write shuffle.

    Emulates Spark's HashPartitioning task assignment for each salt mode —
    ``task = pmod(murmur3_hash(_bucket, salt), n_tasks)`` with the identical
    bucket/salt expressions the writer uses (`F.hash` IS Murmur3Hash, the
    same function HashPartitioning evaluates) — and reports the straggler
    factor (max task rows / mean task rows) per micro-batch, worst batch
    kept. Computed at 32 tasks (this sandbox) AND 1024 tasks (the
    1000-executor shape): the hot key's volume is constant while the mean
    shrinks with the task count, so the un-salted straggler factor GROWS
    linearly with cluster size — this number, not a wall-clock on a noisy
    32-core VM, is what the salt buys at scale."""
    from pyspark.sql import functions as F

    bucket = F.pmod(F.xxhash64("repo", "path"), F.lit(n_buckets))

    def salts(n_tasks: int) -> dict:
        default_n = max(1, (4 * n_tasks + n_buckets - 1) // n_buckets)
        return {
            "none": F.lit(0),
            "key": F.pmod(F.xxhash64(F.lit(1), F.col("repo"), F.col("path")),
                          F.lit(default_n)),
            "row": F.pmod(
                F.xxhash64(F.lit(1), F.col("offset"), F.col("repo"), F.col("path")),
                F.lit(default_n)),
            "row_wide": F.pmod(
                F.xxhash64(F.lit(1), F.col("offset"), F.col("repo"), F.col("path")),
                F.lit(32)),
        }

    out: dict = {}
    for n_tasks in (32, 1024):
        per_mode: dict = {}
        for mode, salt in salts(n_tasks).items():
            worst = 0.0
            for p in feed_paths:
                batch = spark.read.parquet(p)
                tasks = (
                    batch.select(
                        F.pmod(F.hash(bucket, salt), F.lit(n_tasks)).alias("task")
                    )
                    .groupBy("task").count()
                )
                row = tasks.agg(
                    F.max("count").alias("mx"), F.sum("count").alias("total")
                ).collect()[0]
                # mean over ALL n_tasks (empty tasks are idle cores)
                factor = row["mx"] / (row["total"] / n_tasks)
                worst = max(worst, factor)
            per_mode[mode] = round(worst, 2)
        out[f"straggler_factor_{n_tasks}_tasks"] = per_mode
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from bench import cdc_replay
    from cds_spark.session import get_spark
    from cds_spark.sources.feed import materialize_feed

    spark = get_spark("cds-bench-skew", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    ram_ok = (
        os.path.isdir("/dev/shm")
        and shutil.disk_usage("/dev/shm").free > 16 * 1024**3
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
        first = True
        for rep in range(REPS):
            for name, props in MODES:
                run = cdc_replay(
                    spark, N_EVENTS, work, mode="append",
                    feed_paths=feed_paths, warmup=first, compact=False,
                    table_properties=props,
                )
                first = False
                prev = results.get(name)
                run["all_runs_events_per_sec"] = (
                    prev["all_runs_events_per_sec"] if prev else []
                ) + [run["events_per_sec"]]
                if prev is None or run["events_per_sec"] > prev["events_per_sec"]:
                    run["all_runs_events_per_sec"] = sorted(
                        run["all_runs_events_per_sec"], reverse=True
                    )
                    results[name] = run
                else:
                    prev["all_runs_events_per_sec"] = sorted(
                        run["all_runs_events_per_sec"], reverse=True
                    )

        balance = straggler_analysis(spark, feed_paths)

        digests = {m: r["digest"] for m, r in results.items()}
        eps = {m: r["events_per_sec"] for m, r in results.items()}
        out = {
            "job": (
                "cdc_replay append-mode INGEST ONLY (no compact) on a "
                f"single-hot-key feed ({N_EVENTS} events, {N_BATCHES} "
                f"batches, interleaved best-of-{REPS} per mode)"
            ),
            "cpus": CPUS,
            "feed": {**FEED_KW, "n_events": N_EVENTS,
                     "hot_key": f"{top['repo']}/{top['path']}",
                     "hot_key_share_of_events": top_share},
            # deterministic evidence: exact HashPartitioning emulation —
            # max/mean rows per write task, worst micro-batch. At 1024
            # tasks the un-salted hot key's task still carries its whole
            # volume while the mean shrinks 32x: the straggler factor is
            # the scaling killer, and row-salting is what removes it.
            **balance,
            # wall-clock is secondary on this host (single-VM, noisy
            # neighbors — per-rep swings up to 4x, see all_runs): the
            # deterministic straggler factors above are the artifact's
            # load-bearing numbers.
            "modes": results,
            "digest_equal_across_modes": len(set(digests.values())) == 1,
            "speedup_vs_key": {
                m: round(eps[m] / eps["key"], 2) for m in eps
            },
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(out)
    print(line)
    with open(os.path.join(HERE, "BENCH_SKEW_r5.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
