"""Sustained-ingest evidence: per-batch cost must NOT grow with table size.

The north rule targets a 10^10-event replay. What makes that feasible is not
the 4-batch sprint bench.py measures but the *shape* of the per-batch cost
curve: in append mode a micro-batch is O(batch) — decode, bucket-shuffle,
write, manifest delta commit — with the collapse amortized into incremental
compaction that touches only buckets dirtied since the last tick. If any
per-batch term secretly scales with accumulated table size (a target scan, a
manifest rewrite, a growing file list), a 10^10 replay hits a wall long
before the last event no matter what the short bench says.

This harness replays 4x bench.py's event count across 4x the micro-batches
(default 32M events / 16 batches) twice over the same materialized feed:

- one-shot: no in-loop maintenance, single final compact (the upper bound a
  naive engine pays);
- maintained: ``maintenance_every=4`` — the production JobSpec shape, where
  compaction cost is paid in O(dirty-window) ticks as the stream lands.

and reports the flatness ratio (mean of the last quarter of batch times over
the first quarter — ~1.0 = no size-dependence), per-tick maintenance times
(bounded by the window, not the table), and digest equality between the two
runs. Writes BENCH_SUSTAINED_r5.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("CDS_SUSTAINED_EVENTS", "32000000"))
N_BATCHES = int(os.environ.get("CDS_SUSTAINED_BATCHES", "16"))


def _flatness(batch_secs: list[float]) -> float:
    """mean(last quarter) / median(all batches) of per-batch wall times.

    ~1.0 = the last batches (written into the LARGEST table state) cost the
    same as a typical batch — no table-size term in the per-batch cost.
    The median denominator is deliberate: the first batches carry JIT
    warm-in and this VM throws multi-second noise spikes at arbitrary
    batches (observed: batch 2 at 10.5s between 2.3s neighbors), and a
    mean-of-head denominator would let that noise masquerade as (inverse)
    growth. A table-size term would still show: it inflates the TAIL mean
    against the median of the whole run."""
    import statistics

    q = max(1, len(batch_secs) // 4)
    med = statistics.median(batch_secs)
    tail = sum(batch_secs[-q:]) / q
    return round(tail / med, 3) if med > 0 else float("nan")


def main() -> None:
    from bench import FEED_KW, cdc_replay
    from cds_spark.session import get_spark
    from cds_spark.sources.feed import materialize_feed

    spark = get_spark("cds-bench-sustained", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # the 32M-event feed + two table generations is ~12-15 GB; tmpfs only
    # with real headroom, else fall back to disk (slower, same shape)
    ram_ok = (
        os.path.isdir("/dev/shm")
        and shutil.disk_usage("/dev/shm").free > 28 * 1024**3
    )
    work = tempfile.mkdtemp(prefix="cds_sust_", dir="/dev/shm" if ram_ok else None)
    try:
        feed_paths = materialize_feed(
            spark, N_EVENTS, os.path.join(work, "feed"), N_BATCHES,
            n_partitions=CPUS, **FEED_KW
        )
        one_shot = cdc_replay(
            spark, N_EVENTS, work, mode="append",
            feed_paths=feed_paths, warmup=True,
        )
        maintained = cdc_replay(
            spark, N_EVENTS, work, mode="append",
            feed_paths=feed_paths, warmup=False, maintenance_every=4,
        )
        out = {
            "job": (
                f"cdc_replay append-mode, {N_EVENTS} events / {N_BATCHES} "
                "micro-batches over one materialized feed; one-shot final "
                "compact vs maintenance_every=4"
            ),
            "cpus": CPUS,
            "tmpfs": ram_ok,
            "one_shot": one_shot,
            "maintained": maintained,
            "batch_flatness_one_shot": _flatness(one_shot["batch_secs"]),
            "batch_flatness_maintained": _flatness(maintained["batch_secs"]),
            "max_maint_tick_sec": max(maintained.get("maint_secs") or [0.0]),
            "digest_equal": one_shot["digest"] == maintained["digest"],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(out)
    print(line)
    with open(os.path.join(HERE, "BENCH_SUSTAINED_r5.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
