"""Streaming metrics (watermark + tumbling window) and lake-format
robustness: partial-write invisibility and single-writer CAS."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cds_spark.lake.table import LakeTable
from cds_spark.sources.feed import REPO_SCHEMA, change_feed
from cds_spark.operators.decode import decode_feed, events_to_rows
from cds_spark.streaming.metrics import EVENTS_SCHEMA, change_rate_stream


def test_change_rate_stream_emits_finalized_windows(spark, tmp_path):
    src_dir = str(tmp_path / "events_stream")
    out_dir = str(tmp_path / "metrics_out")
    ckpt = str(tmp_path / "ckpt")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # slice by time into sequential files so the watermark advances between
    # micro-batches (maxFilesPerTrigger=1)
    os.makedirs(src_dir, exist_ok=True)
    days = [r[0] for r in events.select(F.date_trunc("day", "ts").alias("d")).distinct()
            .orderBy("d").collect()]
    for i, d in enumerate(days[:6]):
        (events.filter(F.date_trunc("day", "ts") == d)
         .coalesce(1).write.parquet(os.path.join(src_dir, f"slice-{i:03d}")))
    paths = [os.path.join(src_dir, p) for p in sorted(os.listdir(src_dir))]
    # flatten: file-stream source wants files, not dirs of dirs
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for p in paths:
        for f in sorted(os.listdir(p)):
            if f.endswith(".parquet"):
                os.link(os.path.join(p, f), os.path.join(flat, f"{n:03d}.parquet"))
                n += 1
    q = change_rate_stream(spark, flat, ckpt, out_dir, window="6 hours",
                           watermark="1 hour")
    q.awaitTermination()
    got = spark.read.schema(
        T.StructType([
            T.StructField("window_start", T.TimestampType()),
            T.StructField("window_end", T.TimestampType()),
            T.StructField("op", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("approx_users", T.LongType()),
        ])
    ).parquet(out_dir)
    emitted = {(r["window_start"], r["op"]): r["n_events"] for r in got.collect()}
    assert emitted, "watermark never finalized any window"
    # every emitted window must exactly match the batch computation
    sliced = spark.read.parquet(flat)
    batch = (
        sliced.withColumn(
            "op",
            F.when(F.col("event_type") == "signup", "c")
            .when(F.col("event_type") == "error", "d").otherwise("u"),
        )
        .groupBy(F.window("ts", "6 hours").alias("w"), "op")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("s"), "op", "n")
    )
    truth = {(r["s"], r["op"]): r["n"] for r in batch.collect()}
    for k, v in emitted.items():
        assert truth[k] == v, k
    # no duplicate window emissions (append-mode exactly-once)
    assert got.count() == got.dropDuplicates(["window_start", "op"]).count()


def _mk_table(spark, root, n=300):
    t = LakeTable.create(spark, root, REPO_SCHEMA, pk=["repo", "path"],
                         version_cols=["commit", "_offset"], n_buckets=8)
    feed = change_feed(spark, n, n_repos=4, paths_per_repo=8, seed=7)
    rows, _ = events_to_rows(decode_feed(feed, inject={"commit": "commit"}),
                             t.schema, t.pk)
    t.merge(rows, fence=("j", 0))
    return t


def test_partial_txn_dir_is_invisible(spark, tmp_path):
    """A crashed writer leaves orphan files; readers only trust the
    manifest, so state is unchanged and later merges still work."""
    root = str(tmp_path / "t")
    t = _mk_table(spark, root)
    before = t.current().count()
    orphan = os.path.join(root, "data", "txn-99999999", "_bucket=0")
    os.makedirs(orphan)
    # a syntactically valid parquet file that is NOT in the manifest
    spark.createDataFrame([("x/y", "p", "c", "py", "junk", False, 1)],
                          schema=t.schema.add("_is_delete", "boolean").add("_offset", "long")) \
        .coalesce(1).write.mode("overwrite").parquet(orphan)
    t2 = LakeTable.load(spark, root)
    assert t2.current().count() == before
    feed = change_feed(spark, 100, n_repos=4, paths_per_repo=8, seed=8,
                       start_offset=1000)
    rows, _ = events_to_rows(decode_feed(feed, inject={"commit": "commit"}),
                             t2.schema, t2.pk)
    stats = t2.merge(rows, fence=("j", 1))
    assert not stats.skipped


def test_concurrent_commit_cas_rejected(spark, tmp_path):
    """Optimistic concurrency: merges REBASE through a lost CAS (both
    writers' rows land; LWW absorbs the duplicate delivery), while
    overwrite — replace semantics, which cannot absorb concurrent
    additions — still strictly rejects."""
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    a = LakeTable.load(spark, root)
    b = LakeTable.load(spark, root)
    feed = change_feed(spark, 50, n_repos=4, paths_per_repo=8, seed=9,
                       start_offset=2000)
    rows, _ = events_to_rows(decode_feed(feed, inject={"commit": "commit"}),
                             a.schema, a.pk)
    a.merge(rows, fence=("wa", 0))
    s = b.merge(rows, fence=("wb", 0))  # stale handle: rebases, not crashes
    assert not s.skipped
    final = LakeTable.load(spark, root)
    # duplicate delivery through two writers converges (same versions)
    assert sorted(map(tuple, final.current().collect())) == \
           sorted(map(tuple, a.read().collect()))
    # overwrite keeps the strict single-writer contract
    c = LakeTable.load(spark, root)
    a2 = LakeTable.load(spark, root)
    a2.set_properties({"touch": "1"})
    with pytest.raises(RuntimeError, match="concurrent commit"):
        c.overwrite(final.current())


def test_hot_key_rows_spread_across_salted_files(spark, tmp_path):
    """One PK receiving most of the traffic must not serialize the write:
    the row-salt spreads its rows across multiple files in its bucket
    (merge-on-read collapses them at read time)."""
    root = str(tmp_path / "hot")
    t = LakeTable.create(spark, root, REPO_SCHEMA, pk=["repo", "path"],
                         version_cols=["commit", "_offset"], n_buckets=4,
                         properties={"merge_mode": "append"})
    # 2000 events, ~all on a single (repo, path)
    hot = spark.range(2000).select(
        F.lit("u").alias("op"),
        F.lit("org/hot").alias("repo"),
        F.lit("src/file.txt").alias("path"),
        F.lpad(F.col("id").cast("string"), 12, "0").alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("content"),
        F.lit(False).alias("_is_delete"),
        F.col("id").alias("_offset"),
        F.lit(0).alias("_partition"),
        F.lit("u").alias("_op"),
    )
    t.merge(hot, fence=("hot", 0))
    t2 = LakeTable.load(spark, root)
    hot_bucket_files = {}
    for f in t2.manifest["files"]:
        hot_bucket_files.setdefault(f["bucket"], []).append(f["path"])
    # all rows share one pk -> one bucket; the salt must have split it
    assert len(hot_bucket_files) == 1
    (files,) = hot_bucket_files.values()
    assert len(files) > 1, "hot key was written by a single task"
    # and the read still collapses to exactly one live row, newest version
    rows = t2.current().collect()
    assert len(rows) == 1
    assert rows[0]["content"] == "v1999"


def test_bootstrap_then_incremental_overlap_converges(spark, tmp_path):
    """dm bootstrap + rtu incremental with overlapping versions converge by
    the same LWW rule (doc/CDS中ClickHouse使用的建表方案.md:87): replayed
    OLDER versions cannot regress rows the snapshot already covers."""
    from cds_spark.sources.feed import reference_replay_pandas
    from cds_spark.streaming.pipeline import bootstrap

    feed = change_feed(spark, 600, n_repos=5, paths_per_repo=10, seed=13).persist()
    oracle = reference_replay_pandas([r.asDict() for r in feed.collect()])

    # snapshot = the oracle state after the first 400 events
    first = feed.filter(F.col("offset") < 400)
    snap_state = reference_replay_pandas([r.asDict() for r in first.collect()])
    snap_rows = [
        (k[0], k[1], v["commit"], v["lang"], v["content"], False, int(v["_ver"][1]))
        for k, v in snap_state.items()
    ]
    phys = T.StructType(
        list(REPO_SCHEMA.fields)
        + [T.StructField("_is_delete", T.BooleanType()),
           T.StructField("_offset", T.LongType())]
    )
    snap = spark.createDataFrame(snap_rows, phys)
    root = str(tmp_path / "t")
    table = bootstrap(spark, snap, root, pk=["repo", "path"],
                      version_cols=["commit", "_offset"], n_buckets=8)

    # incremental replays an OVERLAPPING window (from offset 300 — 100 events
    # older than the snapshot bound) plus the new tail
    overlap = feed.filter(F.col("offset") >= 300)
    rows, _ = events_to_rows(decode_feed(overlap, inject={"commit": "commit"}),
                             table.schema, table.pk)
    table.merge(rows, fence=("inc", 0))

    got = {(r["repo"], r["path"]): r["content"] for r in table.current().collect()}
    want = {k: v["content"] for k, v in oracle.items()}
    assert got == want


def test_stateful_staleness_monitor(spark, tmp_path):
    """applyInPandasWithState: per-key max-version state persists across
    micro-batches; stale (version <= state max) events are counted exactly
    as a python replay of the same files in the same batch order."""
    from cds_spark.sources.feed import write_feed_files
    from cds_spark.streaming.stateful import OUTPUT_SCHEMA, staleness_stream

    topic = str(tmp_path / "topic")
    out = str(tmp_path / "stale_out")
    ckpt = str(tmp_path / "ckpt")
    feed = change_feed(spark, 800, n_repos=3, paths_per_repo=5, seed=31,
                       dup_pct=20).persist()
    ranges = write_feed_files(feed, topic, 4)
    assert len(ranges) == 4

    q = staleness_stream(spark, topic, ckpt, out, max_files_per_trigger=1)
    q.awaitTermination()

    got = spark.read.schema(OUTPUT_SCHEMA).parquet(out).collect()
    # python oracle matching the operator's deterministic semantics: within
    # each micro-batch a key's rows are processed in VERSION order (shuffle
    # order is not meaningful), state carries across batches
    rows = [r.asDict() for r in feed.collect()]
    state: dict = {}
    stale_total = 0
    for a, b in ranges:
        batch = sorted(
            (r for r in rows if a <= r["offset"] < b),
            key=lambda r: (r["commit"], r["offset"]),
        )
        for r in batch:
            k = (r["repo"], r["path"])
            ver = (r["commit"], r["offset"])
            if k in state and ver <= state[k]:
                stale_total += 1
            else:
                state[k] = ver
    assert sum(r["n_stale"] for r in got) == stale_total
    assert sum(r["n_events"] for r in got) == len(rows)
    # final state max per key matches the oracle (state is monotone, so the
    # max over a key's per-batch emissions IS its final state)
    final = {}
    for r in got:
        k = (r["repo"], r["path"])
        v = (r["max_commit"], r["max_offset"])
        final[k] = max(final.get(k, v), v)
    for k, v in state.items():
        assert final[k] == v


def test_current_pointer_is_advisory(spark, tmp_path):
    """A crash between the exclusive version-file create and the _current
    pointer write must not hide the committed snapshot: the version files
    are the source of truth."""
    root = str(tmp_path / "ptr")
    t = _mk_table(spark, root)
    feed = change_feed(spark, 100, n_repos=3, paths_per_repo=5, seed=21)
    rows, _ = events_to_rows(decode_feed(feed, inject={"commit": "commit"}),
                             t.schema, t.pk)
    t.merge(rows, fence=("p", 0))
    v = t.version
    assert v > 1
    # simulate the crash: pointer lags at the create version
    with open(os.path.join(root, "_meta", "_current"), "w") as f:
        f.write("1")
    t2 = LakeTable.load(spark, root)
    assert t2.version == v
    assert t2.current().count() > 0
