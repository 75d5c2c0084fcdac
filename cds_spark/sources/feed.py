"""Deterministic synthetic CDC change feed (FIXTURES.md F2).

Everything is derived from ``spark.range(n)`` with JVM hash expressions —
no Python, no materialized data — so the 10^10-event benchmark generates
events on the fly at full codegen speed and the same (seed, n) always
produces byte-identical events on any cluster size.

Workload properties mirror the reference's sit workload
(script/init/init_db.py:35-49 re-run for incremental, README.md:110-116):
interleaved c/u/d per key, multiple updates to one key inside a micro-batch,
deletes, duplicate delivery (at-least-once), and hot-key skew on a few repos
(power-law mapping) to exercise salting/AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the F1 target state table (BASELINE.json input_hint)
REPO_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

#: the F2 change-event envelope
FEED_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("partition", T.IntegerType()),
    ]
)

LANGS = ["py", "go", "rs", "md", "js", "c", "java"]


def _h(seed: int, *cols) -> F.Column:
    return F.xxhash64(F.lit(seed), *cols)


def change_feed(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    seed: int = 42,
    events_per_commit: int = 1000,
    skew: float = 3.0,
    dup_pct: int = 5,
    n_partitions: int = 8,
    start_offset: int = 0,
) -> DataFrame:
    """Generate ``n_events`` change events with offsets
    ``[start_offset, start_offset + n_events)``.

    - PK = (repo, path); repo drawn with power-law skew (repo 0 hottest).
    - version = (commit, offset): commit is a zero-padded monotone counter
      (the deterministic replacement for cds's wall-clock ``insert_id``,
      cmd/rtu/handle/insert.go:156-158 — documented deviation, SURVEY §7.4).
    - op mix: ~20% c / 70% u / 10% d.
    - ``dup_pct``% of events are delivered twice (same offset) — replay
      convergence must absorb them.
    - ``partition`` = hash(repo) % n_partitions, like Kafka keyed produce.
    - content is a pure function of (repo, path, commit, offset) — the
      repeat count derives from the offset hash — so any replay that
      resolves the SAME winning event per key (the (commit, offset) LWW
      rule) reproduces identical sha256(content) per live row. Two events
      sharing a commit window for one key carry different content; only
      the full version tuple identifies the bytes.
    """
    df = spark.range(start_offset, start_offset + n_events).withColumnRenamed("id", "offset")
    o = F.col("offset")
    u = (F.pmod(_h(seed, o), F.lit(1_000_000)).cast("double") / 1_000_000.0)
    repo_id = F.floor(F.lit(n_repos) * F.pow(u, F.lit(skew))).cast("int")
    path_id = F.pmod(_h(seed + 1, o), F.lit(paths_per_repo))
    op_u = F.pmod(_h(seed + 2, o), F.lit(100))
    op = (
        F.when(op_u < 20, F.lit("c")).when(op_u < 90, F.lit("u")).otherwise(F.lit("d"))
    )
    commit = F.lpad((o / F.lit(events_per_commit)).cast("long").cast("string"), 12, "0")
    repo = F.concat(F.lit("org/repo-"), repo_id.cast("string"))
    path = F.concat(
        F.lit("src/dir-"),
        F.pmod(path_id, F.lit(20)).cast("string"),
        F.lit("/file-"),
        path_id.cast("string"),
        F.lit(".txt"),
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (F.pmod(_h(seed + 3, o), F.lit(len(LANGS))) + 1).cast("int")
    )
    # variable-length deterministic content: repeat a hash chunk 1..8 times
    chunk = F.sha2(F.concat_ws("|", repo, path, commit, F.lit(str(seed))), 256)
    content = F.concat_ws(
        " ", repo, path, commit, F.repeat(chunk, (F.pmod(_h(seed + 4, o), F.lit(8)) + 1).cast("int"))
    )
    base = df.select(
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        o.alias("offset"),
        F.when(
            op != "d",
            F.to_json(
                F.struct(
                    repo.alias("repo"),
                    path.alias("path"),
                    commit.alias("commit"),
                    lang.alias("lang"),
                    content.alias("content"),
                )
            ),
        )
        .otherwise(F.to_json(F.struct(repo.alias("repo"), path.alias("path"))))
        .alias("payload"),
        F.pmod(F.xxhash64(repo), F.lit(n_partitions)).cast("int").alias("partition"),
    )
    if dup_pct > 0:
        # single-pass duplicate delivery: explode each row into 1 or 2 copies
        # (a union of base + base.filter would re-run the whole generation
        # expression tree for the duplicate branch — 2x the codegen work)
        n_copies = F.when(
            F.pmod(F.xxhash64(F.lit(seed + 5), F.col("offset")), F.lit(100)) < dup_pct,
            F.lit(2),
        ).otherwise(F.lit(1))
        base = base.withColumn("__copy", F.explode(F.sequence(F.lit(1), n_copies))).drop(
            "__copy"
        )
    return base


def materialize_feed(
    spark: SparkSession,
    n_events: int,
    out_dir: str,
    n_batches: int,
    fmt: str = "parquet",
    **feed_kwargs,
) -> list[str]:
    """Write the change feed as ``n_batches`` sequential parquet batch dirs —
    the benchmark's Kafka-topic stand-in. Generation happens ONCE, outside
    any timed region: a CDC engine's work starts at *reading* the log
    (pkg/tube/kfks.go:37-95), producing it is the harness's job. Both
    parallelism levels of the scaling bench then replay identical bytes."""
    per = n_events // n_batches
    paths = []
    for i in range(n_batches):
        # last batch takes the n_events % n_batches remainder so exactly
        # n_events offsets are materialized
        n = per if i < n_batches - 1 else n_events - per * (n_batches - 1)
        p = os.path.join(out_dir, f"batch-{i:05d}")
        change_feed(spark, n, start_offset=i * per, **feed_kwargs).write.mode(
            "overwrite"
        ).format(fmt).save(p)
        paths.append(p)
    return paths


def write_feed_files(
    feed: DataFrame, out_dir: str, n_slices: int, fmt: str = "json"
) -> list[tuple[int, int]]:
    """Materialize the feed as ``n_slices`` sequential file batches in one
    directory (the sandbox stand-in for a Kafka topic: Spark's file stream
    source picks files up in arrival order). Returns slice offset ranges."""
    os.makedirs(out_dir, exist_ok=True)
    bounds = feed.agg(F.min("offset"), F.max("offset")).collect()[0]
    if bounds[0] is None:
        return []  # empty feed (e.g. a pre-filtered offset window)
    lo, hi = bounds[0], bounds[1] + 1
    step = max(1, (hi - lo + n_slices - 1) // n_slices)
    ranges = []
    for i in range(n_slices):
        a, b = lo + i * step, min(hi, lo + (i + 1) * step)
        if a >= b:
            break
        sl = feed.filter((F.col("offset") >= a) & (F.col("offset") < b)).coalesce(1)
        sl.write.mode("append").format(fmt).save(out_dir)
        ranges.append((a, b))
    return ranges


def reference_replay_pandas(feed_rows: list) -> dict:
    """Driver-side oracle: replay events one by one in (commit, offset)
    order into a dict — the independent implementation the engine's final
    state is compared against (the reference's dbtesttool round-trip oracle,
    pkg/ckgroup/dbtesttool/dbtool/select.go:113-160). Test-only; O(n) python.
    """
    import json as _json

    state: dict = {}
    seen = set()
    for r in sorted(feed_rows, key=lambda r: (r["commit"], r["offset"])):
        key = (r["repo"], r["path"])
        ver = (r["commit"], r["offset"])
        if (key, ver) in seen:
            continue  # duplicate delivery
        seen.add((key, ver))
        cur = state.get(key)
        if cur is not None and cur["_ver"] >= ver:
            continue
        if r["op"] == "d":
            state[key] = {"_ver": ver, "_deleted": True}
        else:
            doc = _json.loads(r["payload"])
            doc["_ver"] = ver
            doc["_deleted"] = False
            state[key] = doc
    return {k: v for k, v in state.items() if not v["_deleted"]}
