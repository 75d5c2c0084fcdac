"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB design point, scaled down by env for the
local[32] sandbox:

- AQE on (runtime coalesce + skew-join splitting) — the reference handles
  skew implicitly via client-side siphash sharding (pkg/ckgroup/common.go:153-162);
  we let AQE split skewed partitions and add explicit salting in merge.
- Arrow enabled for the (rare) pandas-UDF paths.
- UTC session timezone: the reference pins Asia/Shanghai at insert
  (cmd/dm/choperator/ckgroupoperator.go:36-43); we pin UTC so replay is
  deterministic across machines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # map_concat last-wins: payload values override injected envelope values
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
    # local mode = ONE JVM hosting all task slots: size the heap for 32
    # concurrent tasks over wide string rows or GC becomes the bottleneck
    # (a real cluster sizes per-executor memory instead)
    "spark.driver.memory": os.environ.get("CDS_SPARK_DRIVER_MEM", "48g"),
    # parquet writer defaults: zstd is the right call at 100TB (ratio ~ snappy speed)
    "spark.sql.parquet.compression.codec": "zstd",
}


def get_spark(
    app_name: str = "cds-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` pins ``local[N]`` — used by the scaling bench to run the same
    job at two parallelism levels (the in-sandbox stand-in for N vs 4N
    executors). Otherwise ``CDS_SPARK_MASTER`` / ``local[*]``.
    """
    if cores:
        master = f"local[{cores}]"
    else:
        master = os.environ.get("CDS_SPARK_MASTER", "local[*]")
    builder = SparkSession.builder.appName(app_name).master(master)
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_CPUS", os.environ.get("CDS_SHUFFLE_PARTITIONS", "32"))
    )
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(n_shuffle)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
