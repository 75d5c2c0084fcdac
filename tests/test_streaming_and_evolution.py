"""Streaming resume, schema evolution, type coercion, and lake maintenance."""

import json
import os

import pytest
from pyspark.sql import functions as F

from cds_spark.lake.table import LakeTable
from cds_spark.operators.decode import decode_feed, events_to_rows
from cds_spark.sources.feed import REPO_SCHEMA, change_feed, reference_replay_pandas, write_feed_files
from cds_spark.streaming.pipeline import IncrementalSync, JobSpec


def _mk_table(spark, tmp_path, name="t", n_buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / name), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=n_buckets,
    )


def test_streaming_kill_resume_exactly_once(spark, tmp_path):
    feed = change_feed(spark, 2000, n_repos=10, paths_per_repo=20, seed=3).persist()
    oracle = reference_replay_pandas([r.asDict() for r in feed.collect()])
    topic = str(tmp_path / "topic")
    write_feed_files(feed.filter("offset < 1200"), topic, 4)
    _mk_table(spark, tmp_path, "repos")
    spec = JobSpec(job_id="j1", table_root=str(tmp_path / "repos"), source_dir=topic,
                   checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=2)
    IncrementalSync(spark, spec).run_available()
    # "crash" then more data arrives; new driver instance resumes
    write_feed_files(feed.filter("offset >= 1200"), topic, 2)
    IncrementalSync(spark, spec).run_available()
    t = LakeTable.load(spark, str(tmp_path / "repos"))
    live = {(r.repo, r.path): r.content for r in t.current().collect()}
    assert len(live) == len(oracle)
    assert all(live[k] == v["content"] for k, v in oracle.items())
    # lineage recorded per batch with per-partition offsets
    lines = [json.loads(l) for l in open(t.root + "/_lineage/j1.jsonl")]
    batch_lines = [l for l in lines if not l.get("skipped") and not l.get("job_start")]
    assert len(lines) >= 3 and all("partitions" in l for l in batch_lines)
    feed.unpersist()


def test_schema_evolution_new_column(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    base = change_feed(spark, 200, n_repos=5, paths_per_repo=10, seed=9)
    spec = JobSpec(job_id="evo", table_root=table.root, source_dir="unused",
                   checkpoint_dir="unused")
    sync = IncrementalSync(spark, spec)
    sync.process_batch(base, 0)
    # events arrive with a brand-new column `stars` (long-typed JSON value)
    evolved = base.filter("op != 'd'").withColumn(
        "payload",
        F.to_json(
            F.struct(
                F.col("repo"), F.col("path"), F.col("commit"), F.lit("py").alias("lang"),
                F.lit("new-content").alias("content"),
                (F.col("offset") % 100).alias("stars"),
            )
        ),
    ).withColumn("offset", F.col("offset") + 10_000)
    sync.process_batch(evolved, 1)
    t2 = LakeTable.load(spark, table.root)
    assert "stars" in [f.name for f in t2.schema.fields]
    assert dict((f.name, f.dataType.typeName()) for f in t2.schema.fields)["stars"] == "long"
    rows = t2.current().filter(F.col("stars").isNotNull()).count()
    assert rows > 0
    # old rows (deleted keys' tombstones etc.) read back with NULL stars
    assert t2.read(live_only=False).count() >= rows


def test_schema_evolution_missing_columns_null(spark, tmp_path):
    """Events omitting known columns leave NULL (parse.go:150-157 analog)."""
    table = _mk_table(spark, tmp_path)
    ev = spark.createDataFrame(
        [("c", "r1", "p1", "000001", 0, '{"repo":"r1","path":"p1","commit":"000001"}', 0)],
        "op string, repo string, path string, commit string, offset long, payload string, partition int",
    )
    events = decode_feed(ev, inject={"commit": "commit"})
    rows, dlq = events_to_rows(events, table.schema, table.pk)
    table.merge(rows)
    out = table.current().collect()[0]
    assert out.lang is None and out.content is None


def test_dlq_missing_pk(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    ev = spark.createDataFrame(
        [
            ("c", "000001", 0, '{"repo":"r1","commit":"000001","lang":"py","content":"x"}', 0),
            ("c", "000001", 1, '{"repo":"r1","path":"p","commit":"000001","lang":"py","content":"y"}', 0),
            ("u", "000002", 2, "not-json{{", 0),
        ],
        "op string, commit string, offset long, payload string, partition int",
    )
    events = decode_feed(ev, inject={"commit": "commit"})
    rows, dlq = events_to_rows(events, table.schema, table.pk)
    assert rows.count() == 1
    assert dlq.count() == 2  # missing path + unparseable payload


def test_type_widening_alter(spark, tmp_path):
    import pyspark.sql.types as T

    table = _mk_table(spark, tmp_path)
    table.alter_add_columns([T.StructField("stars", T.IntegerType(), True)])
    table.alter_widen_column("stars", T.LongType())
    assert [f.dataType.typeName() for f in table.schema.fields if f.name == "stars"] == ["long"]
    with pytest.raises(ValueError):
        table.alter_widen_column("stars", T.IntegerType())  # narrowing refused


def test_lenient_coercion_matrix(spark):
    """cds's never-fail coercions (canalsyncmodel.go:100-146,
    debeziumsyncdatatype.go:156-170): bad int -> 0, bad time -> epoch,
    epoch-ms ints -> timestamps."""
    from cds_spark.schema import coerce
    import pyspark.sql.types as T

    df = spark.createDataFrame(
        [("abc", "2024-01-02 03:04:05", "1700000000000", "xyz")],
        "bad_int string, good_ts string, ms_ts string, bad_ts string",
    )
    out = df.select(
        coerce(F.col("bad_int"), T.LongType()).alias("i"),
        coerce(F.col("good_ts"), T.TimestampType()).alias("t1"),
        coerce(F.col("ms_ts"), T.TimestampType()).alias("t2"),
        coerce(F.col("bad_ts"), T.TimestampType()).alias("t3"),
    ).collect()[0]
    assert out.i == 0
    assert str(out.t1) == "2024-01-02 03:04:05"
    assert out.t2.year == 2023
    assert str(out.t3) == "1970-01-01 00:00:00"


def test_mongo_extended_json_coercion(spark):
    """Mongo extended-JSON value unwrapping during coercion
    (connectormongomodel.go:127-167): {"$date": ms} (always epoch-MS,
    numeric or $numberLong-wrapped), {"$numberLong"/"$numberInt": "n"},
    {"$oid": hex} for strings. Without this, a $date object would coerce
    to the epoch default — silently wrong timestamps for Mongo sources."""
    import pyspark.sql.types as T

    from cds_spark.schema import coerce

    df = spark.createDataFrame(
        [
            (
                '{"$date": 1592906230494}',
                '{"$date": {"$numberLong": "1592906230494"}}',
                '{"$date": "2020-06-23T09:57:10"}',
                '{"$numberLong": "1594655999000"}',
                '{"$numberInt": "42"}',
                '{"$oid": "5f0e4ecbcaf9e53e0c9d5a42"}',
                '{"$numberDouble": "1.5"}',
            )
        ],
        "d1 string, d2 string, d3 string, nl string, ni string, oid string, nd string",
    )
    out = df.select(
        coerce(F.col("d1"), T.TimestampType()).alias("t1"),
        coerce(F.col("d2"), T.TimestampType()).alias("t2"),
        coerce(F.col("d3"), T.TimestampType()).alias("t3"),
        coerce(F.col("nl"), T.LongType()).alias("l1"),
        coerce(F.col("nl"), T.TimestampType()).alias("lt"),
        coerce(F.col("ni"), T.LongType()).alias("l2"),
        coerce(F.col("oid"), T.StringType()).alias("s1"),
        coerce(F.col("nl"), T.StringType()).alias("s2"),
        coerce(F.col("nd"), T.DoubleType()).alias("f1"),
        coerce(F.col("nd"), T.LongType()).alias("l3"),
    ).collect()[0]
    assert str(out.t1) == "2020-06-23 09:57:10.494000"  # $date is epoch-MS
    assert str(out.t2) == "2020-06-23 09:57:10.494000"
    assert str(out.t3) == "2020-06-23 09:57:10"
    assert out.l1 == 1594655999000
    assert out.lt.year == 2020  # $numberLong into a time column: epoch-ms
    assert out.l2 == 42
    assert out.s1 == "5f0e4ecbcaf9e53e0c9d5a42"
    assert out.s2 == "1594655999000"
    assert out.f1 == 1.5
    assert out.l3 == 1  # atoi fails -> float path truncates


def test_compact_purges_tombstones(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    feed = change_feed(spark, 500, n_repos=5, paths_per_repo=10, seed=4)
    events = decode_feed(feed, inject={"commit": "commit"})
    rows, _ = events_to_rows(events, table.schema, table.pk)
    table.merge(rows)
    with_tomb = table.read(live_only=False).count()
    live = table.current().count()
    assert with_tomb > live  # some deletes happened
    table.compact(purge_tombstones=True)
    assert table.read(live_only=False).count() == live
    assert table.current().count() == live


def test_jdbc_bootstrap_contract(spark, tmp_path, monkeypatch):
    """JDBC full sync without a driver jar: fake DataFrameReader.jdbc
    records the calls — the bounds probe must run first, then the data
    read must be range-partitioned on the PK with the probed bounds
    (exclusive upper), and the rows must land in the lake table."""
    from pyspark.sql.readwriter import DataFrameReader

    from cds_spark.streaming.pipeline import bootstrap_jdbc

    snapshot = spark.createDataFrame(
        [(i, f"name-{i}", float(i)) for i in range(1, 51)],
        "id long, name string, val double",
    )
    bounds = spark.createDataFrame([(1, 50)], "lo long, hi long")
    calls = []

    def fake_jdbc(self, url, table, column=None, lowerBound=None,
                  upperBound=None, numPartitions=None, properties=None):
        calls.append({"url": url, "table": table, "column": column,
                      "lowerBound": lowerBound, "upperBound": upperBound,
                      "numPartitions": numPartitions})
        return bounds if "cds_bounds" in table else snapshot

    monkeypatch.setattr(DataFrameReader, "jdbc", fake_jdbc)
    table = bootstrap_jdbc(
        spark, "jdbc:mysql://db:3306/sit", "example_mysql",
        str(tmp_path / "jt"), pk=["id"], version_cols=["_offset"],
        n_buckets=8, num_partitions=4,
    )
    assert len(calls) == 2
    assert "SELECT MIN(id) AS lo, MAX(id) AS hi FROM example_mysql" in calls[0]["table"]
    assert calls[1] == {"url": "jdbc:mysql://db:3306/sit", "table": "example_mysql",
                        "column": "id", "lowerBound": 1, "upperBound": 51,
                        "numPartitions": 4}
    assert table.current().count() == 50


def test_jdbc_introspect_contract(spark, tmp_path, monkeypatch):
    """Live source introspection without a driver jar: the DESC-equivalent
    information_schema probe (mysqltypeconv.go:44-72) must map the
    reference's type lattice (int->long, decimal/double/float->double,
    date/time->timestamp, else string), order fields by source ordinal,
    pick PRI columns as PK, and feed bootstrap_jdbc(pk=None)."""
    from pyspark.sql import types as T
    from pyspark.sql.readwriter import DataFrameReader

    from cds_spark.streaming.pipeline import bootstrap_jdbc, introspect_jdbc

    # deliberately out of ordinal order, composite PRI, vendor type variants
    desc = spark.createDataFrame(
        [
            ("val", "decimal(10,2)", "", 4),
            ("id", "bigint unsigned", "PRI", 1),
            ("note", "tinytext", "", 5),
            ("seen_at", "datetime(6)", "", 3),
            ("shard", "int", "PRI", 2),
        ],
        "col string, typ string, pri string, pos int",
    )
    snapshot = spark.createDataFrame(
        [(i, i % 3, f"n-{i}") for i in range(1, 21)], "id long, shard long, note string"
    )
    bounds = spark.createDataFrame([(1, 20)], "lo long, hi long")
    calls = []

    def fake_jdbc(self, url, table, column=None, lowerBound=None,
                  upperBound=None, numPartitions=None, properties=None):
        calls.append(table)
        if "information_schema.columns" in table:
            return desc
        return bounds if "cds_bounds" in table else snapshot

    monkeypatch.setattr(DataFrameReader, "jdbc", fake_jdbc)
    schema, pk = introspect_jdbc(spark, "jdbc:mysql://db:3306/sit", "example_mysql")
    assert pk == ["id", "shard"]  # PRI columns in source ordinal order
    assert [(f.name, f.dataType) for f in schema.fields] == [
        ("id", T.LongType()),
        ("shard", T.LongType()),
        ("seen_at", T.TimestampType()),
        ("val", T.DoubleType()),
        ("note", T.StringType()),
    ]
    assert "table_name = 'example_mysql'" in calls[0]

    # pk=None end-to-end: introspect -> keyset scan on first PRI -> lake
    table = bootstrap_jdbc(
        spark, "jdbc:mysql://db:3306/sit", "example_mysql",
        str(tmp_path / "jt2"), pk=None, version_cols=["_offset"],
        n_buckets=4, num_partitions=2,
    )
    assert any("MIN(id)" in c for c in calls)  # first PRI drives the stride
    assert table.current().count() == 20
    assert table.pk == ["id", "shard"]


def test_kafka_envelope_contract(spark):
    """Recorded wire records through the kafka->feed mapping (no broker):
    Kafka's OWN partition/offset must become the lineage/LWW coordinates
    (pkg/tube/kfks.go:97-181) — the envelope's are producer-side and may
    repeat — and the mapped feed must flow through decode_feed unchanged."""

    from cds_spark.streaming.pipeline import parse_kafka_envelope

    def wire(op, path, commit, kafka_part, kafka_off, payload):
        env = {"op": op, "repo": "org/a", "path": path, "commit": commit,
               "offset": 999_999, "partition": 77,  # envelope coords: must LOSE
               "payload": json.dumps(payload)}
        return (b"k", json.dumps(env).encode(), "t", kafka_part, kafka_off)

    rows = [
        wire("c", "f.py", "000001", 2, 1000,
             {"repo": "org/a", "path": "f.py", "lang": "py", "content": "x"}),
        wire("d", "g.py", "000002", 0, 17, {"repo": "org/a", "path": "g.py"}),
    ]
    raw = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )
    feed = {r.offset: r for r in parse_kafka_envelope(raw).collect()}
    assert sorted(feed) == [17, 1000]  # kafka offsets, not 999999
    assert feed[1000].partition == 2 and feed[17].partition == 0
    assert feed[1000].op == "c" and feed[1000].commit == "000001"
    # and the mapped feed is a valid decode_feed input end-to-end
    events = {e._offset: e for e in decode_feed(
        parse_kafka_envelope(raw), inject={"commit": "commit"}
    ).collect()}
    assert events[1000].data["content"] == "x" and events[1000].data["commit"] == "000001"
    assert events[17].op == "d" and events[17]._partition == 0


def test_incremental_compact_rewrites_only_touched_buckets(spark, tmp_path):
    """compact(max_generations=N) must rewrite ONLY multi-generation
    buckets: a batch touching one bucket leads to a one-bucket compact —
    at 100TB a whole-table rewrite is not runnable."""
    table = _mk_table(spark, tmp_path, n_buckets=8)
    # in-batch collapse on: batch-1 buckets land collapsed (clean), so the
    # incremental selector has a meaningful clean/dirty split to preserve
    table.set_properties({"merge_mode": "append", "append_inbatch_collapse": True})
    feed = change_feed(spark, 400, n_repos=5, paths_per_repo=10, seed=13)
    events = decode_feed(feed, inject={"commit": "commit"})
    rows, _ = events_to_rows(events, table.schema, table.pk)
    table.merge(rows)
    assert set(table.bucket_generations().values()) == {1}
    # a second tiny batch touching ONE key -> exactly one bucket gains a gen
    one = rows.orderBy("_offset").limit(1).withColumn(
        "_offset", F.col("_offset") + 100_000
    )
    table.merge(one)
    gens = table.bucket_generations()
    multi = [b for b, g in gens.items() if g > 1]
    assert len(multi) == 1
    before = sorted(
        (r.repo, r.path, r.content or "") for r in table.read(live_only=False).collect()
    )
    untouched_paths = {
        f["path"] for f in table.manifest["files"] if f["bucket"] not in multi
    }
    done = table.compact(max_generations=1)
    assert done == multi
    assert table.manifest["summary"]["buckets"] == 1
    # untouched buckets carried forward by reference, not rewritten
    assert {
        f["path"] for f in table.manifest["files"] if f["bucket"] not in multi
    } == untouched_paths
    assert set(table.bucket_generations().values()) == {1}
    assert not table.properties["needs_collapse"]
    after = sorted(
        (r.repo, r.path, r.content or "") for r in table.read(live_only=False).collect()
    )
    assert after == before
    assert table.compact(max_generations=1) == []  # steady state: no-op


def test_time_travel_and_history(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    f1 = change_feed(spark, 300, n_repos=5, paths_per_repo=10, seed=5)
    f2 = change_feed(spark, 300, n_repos=5, paths_per_repo=10, seed=5, start_offset=300)
    for i, f in enumerate([f1, f2]):
        ev = decode_feed(f, inject={"commit": "commit"})
        rows, _ = events_to_rows(ev, table.schema, table.pk)
        table.merge(rows, fence=("tt", i))
    v2 = LakeTable.load(spark, table.root, version=2)
    v3 = LakeTable.load(spark, table.root, version=3)
    assert v2.current().count() <= v3.read(live_only=False).count()
    ops = [h["summary"].get("operation") for h in table.history()]
    assert ops == ["create", "merge", "merge"]


def test_kafka_source_config_surface(spark, tmp_path):
    """Kafka source: config validation + a clear error when the connector
    jar is absent (this sandbox). The file source remains the tested path;
    the kafka branch maps Kafka partition/offset into the envelope."""
    import pytest

    from cds_spark.lake.table import LakeTable
    from cds_spark.sources.feed import REPO_SCHEMA
    from cds_spark.streaming.pipeline import IncrementalSync, JobSpec

    root = str(tmp_path / "t")
    LakeTable.create(spark, root, REPO_SCHEMA, pk=["repo", "path"],
                     version_cols=["commit", "_offset"], n_buckets=4)
    spec = JobSpec(job_id="k", table_root=root, source_dir="",
                   checkpoint_dir=str(tmp_path / "ck"), source_format="kafka")
    with pytest.raises(ValueError, match="kafka_bootstrap_servers"):
        IncrementalSync(spark, spec)._reader()
    spec.kafka_bootstrap_servers = "localhost:9092"
    spec.kafka_topic = "repos"
    with pytest.raises((RuntimeError, Exception)):
        # no connector jar in the sandbox: either our helpful RuntimeError
        # or Spark's DATA_SOURCE_NOT_FOUND — both must mention kafka
        try:
            IncrementalSync(spark, spec)._reader()
        except Exception as e:
            assert "kafka" in str(e).lower() or "KAFKA" in str(e)
            raise


def test_compact_skip_count_gate_is_taken_and_equivalent(spark, tmp_path):
    """The manifest-row-stats gate must (a) actually SKIP the winners
    count job when the bound fits (asserted by poisoning count on the
    winners plan path via a tiny threshold comparison), and (b) produce
    output identical to the counted path."""
    from cds_spark.operators.decode import decode_feed_rows
    from cds_spark.sources.feed import REPO_SCHEMA, change_feed

    feed = change_feed(spark, 2000, n_repos=8, paths_per_repo=12, seed=33)
    root = str(tmp_path / "skipcnt")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
    )
    rows, _ = decode_feed_rows(feed, t.schema, t.pk, inject={"commit": "commit"})
    t.merge(rows, fence=("sc", 0))
    raw = t.read(live_only=False, with_meta=True, collapse=False)
    df_skip, w_skip = t._collapse_via_winners(raw, 4_000_000, skip_count=True)
    df_cnt, w_cnt = t._collapse_via_winners(raw, 4_000_000, skip_count=False)
    a = sorted(tuple(r) for r in df_skip.collect())
    b = sorted(tuple(r) for r in df_cnt.collect())
    assert a == b and len(a) > 0
    w_cnt.unpersist()
    # manifest row stats exist for every file (the gate's precondition)
    assert all(int(f.get("rows") or 0) > 0 for f in t.manifest["files"])


def test_compact_winners_strategy_matches_classic(spark, tmp_path):
    """compact()'s broadcast-winners collapse must produce the same final
    state as the classic full-shuffle collapse, including tombstone purge
    and duplicate-delivery absorption; a tiny winner threshold falls back
    to classic."""
    from cds_spark.operators.decode import decode_feed_rows
    from cds_spark.sources.feed import REPO_SCHEMA, change_feed

    feed = change_feed(spark, 3000, n_repos=10, paths_per_repo=15, seed=31)
    states = {}
    for label, kw in (
        ("classic", dict(strategy="classic")),
        ("winners", dict(strategy="winners")),
        ("fallback", dict(strategy="winners", winner_broadcast_rows=1)),
        ("local", dict(strategy="local")),
        ("auto", dict()),
    ):
        root = str(tmp_path / f"ct_{label}")
        t = LakeTable.create(
            spark, root, REPO_SCHEMA, pk=["repo", "path"],
            version_cols=["commit", "_offset"], n_buckets=8,
        )
        for i in range(2):
            batch = feed.filter(
                (F.col("offset") >= i * 1500) & (F.col("offset") < (i + 1) * 1500)
            )
            rows, _ = decode_feed_rows(batch, t.schema, t.pk, inject={"commit": "commit"})
            t.merge(rows, fence=("w", i))
        t.compact(purge_tombstones=True, **kw)
        t2 = LakeTable.load(spark, root)
        assert not t2.properties.get("needs_collapse")
        states[label] = sorted(tuple(r) for r in t2.current().collect())
        assert t2.read(live_only=False).count() == len(states[label])  # purged
    assert (
        states["classic"] == states["winners"] == states["fallback"]
        == states["local"] == states["auto"]
    )


def test_manifest_records_file_rows(spark, tmp_path):
    """_write_txn records per-file parquet row counts (Iceberg-style
    stats) and they sum to the written row count."""
    from cds_spark.sources.feed import REPO_SCHEMA

    root = str(tmp_path / "rows_meta")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
    )
    df = spark.createDataFrame(
        [(f"r{i%3}", f"p{i}", f"{i:06d}", "py", "x") for i in range(50)],
        "repo string, path string, commit string, lang string, content string",
    )
    t.overwrite(df)
    t2 = LakeTable.load(spark, root)
    rows = [f.get("rows") for f in t2.manifest["files"]]
    assert all(isinstance(r, int) for r in rows)
    assert sum(rows) == 50


def test_expire_snapshots_and_orphans(spark, tmp_path):
    """expire_snapshots deletes ONLY files no retained snapshot references:
    after a subset compact, the new manifest carries untouched buckets
    forward by reference to files written in now-expired versions — those
    must survive; the compacted buckets' superseded generations must go."""
    import time as _time

    import pytest

    table = _mk_table(spark, tmp_path)
    for i in range(3):
        f = change_feed(spark, 300, n_repos=5, paths_per_repo=10,
                        seed=6 + i, start_offset=300 * i)
        ev = decode_feed(f, inject={"commit": "commit"})
        rows, _ = events_to_rows(ev, table.schema, table.pk)
        table.merge(rows, fence=("ex", i))
    dirty = sorted(table.bucket_generations())
    table.compact(buckets=dirty[: len(dirty) // 2])
    before = sorted(
        (r.repo, r.path, r.content or "") for r in table.current().collect()
    )
    stats = table.expire_snapshots(keep_last=1)
    assert stats["expired_snapshots"] == 4
    assert stats["deleted_files"] > 0
    t = LakeTable.load(spark, table.root)
    # every retained-manifest file still on disk; current state unchanged
    for e in t.manifest["files"]:
        assert os.path.exists(os.path.join(t.root, e["path"]))
    after = sorted(
        (r.repo, r.path, r.content or "") for r in t.current().collect()
    )
    assert after == before
    with pytest.raises(FileNotFoundError):
        LakeTable.load(spark, table.root, version=2)
    assert [h["version"] for h in t.history()] == [t.version]
    # second call: nothing left to expire
    assert t.expire_snapshots(keep_last=1) == {
        "expired_snapshots": 0, "deleted_files": 0}

    # orphan sweep: old unreferenced txn dir goes, fresh one stays
    old = os.path.join(t.root, "data", "txn-99999999-aborted")
    fresh = os.path.join(t.root, "data", "txn-99999999-inflight")
    os.makedirs(old)
    os.makedirs(fresh)
    os.utime(old, (_time.time() - 100_000,) * 2)
    assert t.remove_orphans(older_than_s=3600) == 1
    assert not os.path.exists(old)
    assert os.path.exists(fresh)


def test_pipeline_auto_maintenance(spark, tmp_path):
    """Background-merge analog: the sync loop itself compacts dirty buckets
    (and optionally expires old snapshots) every N batches — generations
    stay bounded under continuous ingest and the state is untouched."""
    feed = change_feed(spark, 2000, n_repos=10, paths_per_repo=20, seed=21).persist()
    oracle = reference_replay_pandas([r.asDict() for r in feed.collect()])
    topic = str(tmp_path / "topic")
    write_feed_files(feed, topic, 6)
    _mk_table(spark, tmp_path, "repos")
    spec = JobSpec(job_id="m", table_root=str(tmp_path / "repos"),
                   source_dir=topic, checkpoint_dir=str(tmp_path / "ckpt"),
                   max_files_per_trigger=1, merge_mode="append",
                   maintenance_every_batches=2, compact_max_generations=1,
                   expire_keep_last=2)
    IncrementalSync(spark, spec).run_available()
    t = LakeTable.load(spark, str(tmp_path / "repos"))
    assert t.current().count() == len(oracle)
    recs = [json.loads(l) for l in open(
        str(tmp_path / "repos" / "_lineage" / "m.jsonl"))]
    ticks = [r["maintenance"] for r in recs if r.get("maintenance")]
    assert ticks and any(m["compacted_buckets"] > 0 for m in ticks)
    assert any(m.get("expired_snapshots", 0) > 0 for m in ticks)
    # generations bounded: after the last tick no bucket is deeper than
    # the threshold + batches since that tick
    assert max(t.bucket_generations().values()) <= 1 + 2


def test_pipeline_auto_rebucket(spark, tmp_path):
    """Layout self-heal: the sync loop detects over-cap buckets mid-stream
    (stats() rebucket hint) and re-shards the table ONLINE, replayed state
    untouched and no legacy-modulus file left behind at the end."""
    feed = change_feed(spark, 2000, n_repos=10, paths_per_repo=20, seed=22).persist()
    oracle = reference_replay_pandas([r.asDict() for r in feed.collect()])
    topic = str(tmp_path / "topic")
    write_feed_files(feed, topic, 6)
    LakeTable.create(
        spark, str(tmp_path / "repos"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=2,
        properties={"local_compact_max_bucket_bytes": 8_000},
    )
    spec = JobSpec(job_id="ar", table_root=str(tmp_path / "repos"),
                   source_dir=topic, checkpoint_dir=str(tmp_path / "ckpt"),
                   max_files_per_trigger=1, merge_mode="append",
                   maintenance_every_batches=2, compact_max_generations=1,
                   auto_rebucket=True)
    IncrementalSync(spark, spec).run_available()
    t = LakeTable.load(spark, str(tmp_path / "repos"))
    assert t.n_buckets > 2
    # the migration ran to completion inside the tick: every live file sits
    # under the current modulus
    assert {t._file_mod(f) for f in t.manifest["files"]} <= {t.n_buckets}
    live = {(r.repo, r.path): r.content for r in t.current().collect()}
    assert len(live) == len(oracle)
    assert all(live[k] == v["content"] for k, v in oracle.items())
    recs = [json.loads(l) for l in open(
        str(tmp_path / "repos" / "_lineage" / "ar.jsonl"))]
    rbs = [r["maintenance"]["rebucket"] for r in recs
           if r.get("maintenance") and r["maintenance"].get("rebucket")]
    assert rbs and rbs[-1]["to"] == t.n_buckets
    assert rbs[-1]["rewritten_files"] > 0
    feed.unpersist()


def test_cascade_sync_lake_to_lake(spark, tmp_path):
    """Downstream table tails the upstream via changes(): bootstrap, O(delta)
    increments, idempotent re-run, schema-evolution propagation, and the
    full-refresh fallback when the cursor falls off the retained window."""
    from cds_spark.streaming.pipeline import cascade_sync

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    src = LakeTable.create(
        spark, src_root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=8,
        properties={"merge_mode": "append"},
    )

    def push(lo, hi, fence_n):
        feed = change_feed(spark, hi - lo, n_repos=6, paths_per_repo=8, seed=5,
                           start_offset=lo)
        events = decode_feed(feed, inject={"commit": "commit"})
        rows, _ = events_to_rows(events, src.schema, src.pk)
        src.merge(rows, fence=("up", fence_n))

    def states_equal():
        cols = ["repo", "path", "commit", "lang", "content"]
        s = sorted(tuple(r) for r in src.current().select(*cols).collect())
        d = sorted(tuple(r) for r in LakeTable.load(spark, dst_root)
                   .current().select(*cols).collect())
        assert s == d and len(s) > 0

    push(0, 800, 0)
    r = cascade_sync(spark, src_root, dst_root, "cas")
    assert r["applied"] == "bootstrap"
    states_equal()

    push(800, 1400, 1)
    push(1400, 1800, 2)
    r = cascade_sync(spark, src_root, dst_root, "cas")
    assert isinstance(r["applied"], int) and r["applied"] > 0 and not r["skipped"]
    states_equal()

    r = cascade_sync(spark, src_root, dst_root, "cas")
    assert r["skipped"]
    states_equal()

    # upstream schema evolution propagates
    import pyspark.sql.types as T
    src.alter_add_columns([T.StructField("stars", T.LongType(), True)])
    push(1800, 2000, 3)
    r = cascade_sync(spark, src_root, dst_root, "cas")
    assert not r["skipped"]
    dst = LakeTable.load(spark, dst_root)
    assert "stars" in [f.name for f in dst.schema.fields]
    states_equal()

    # retained window lost -> full refresh
    push(2000, 2300, 4)
    push(2300, 2600, 5)
    src.expire_snapshots(keep_last=1)
    r = cascade_sync(spark, src_root, dst_root, "cas")
    assert r["applied"] == "full-refresh"
    states_equal()


def test_compact_bounds_output_file_size(spark, tmp_path):
    """Size-aware compact: output width scales with selected bytes /
    target_file_bytes, so a big bucket is rewritten as several
    target-sized files, not one unbounded file."""
    root = str(tmp_path / "szc")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=2,
        properties={"merge_mode": "append", "target_file_bytes": 65_536},
    )
    for i in range(3):
        feed = change_feed(spark, 1500, n_repos=4, paths_per_repo=50, seed=31 + i,
                           start_offset=1500 * i)
        rows, _ = events_to_rows(
            decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
        )
        t.merge(rows, fence=("szc", i))
    before = sorted(tuple(r) for r in t.current().collect())
    # the premise: EVERY bucket's selected input exceeds one target file
    # (the local compact chunks per bucket by that bucket's input bytes —
    # a tiny collapsed bucket must NOT be split just because the table
    # total is large)
    per_in = {}
    for f in t.manifest["files"]:
        per_in[f["bucket"]] = per_in.get(f["bucket"], 0) + int(f["bytes"])
    assert all(b > 65_536 for b in per_in.values()), per_in
    t.compact()
    per_bucket = {}
    for f in t.manifest["files"]:
        per_bucket.setdefault(f["bucket"], []).append(f)
    assert all(len(fs) > 1 for fs in per_bucket.values()), per_bucket
    assert all(int(f["bytes"]) > 0 for fs in per_bucket.values() for f in fs)
    after = sorted(tuple(r) for r in t.current().collect())
    assert before == after


def test_table_stats_manifest_only(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "st"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    feed = change_feed(spark, 400, n_repos=4, paths_per_repo=10, seed=41)
    rows, _ = events_to_rows(
        decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
    )
    t.merge(rows, fence=("st", 0))
    s = t.stats()
    assert s["rows"] == t.read(live_only=False, with_meta=True, collapse=False).count()
    assert s["bytes"] > 0 and s["n_files"] > 0
    assert s["needs_collapse"] and s["dirty_buckets"] >= 0
    t.compact()
    s2 = t.stats()
    assert not s2["needs_collapse"] and s2["max_generations"] == 1


def test_compact_survives_concurrent_ingest_commit(spark, tmp_path):
    """Background-merge contract: a compact that loses the manifest CAS to
    a concurrent ingest commit rebases and retries — the final table keeps
    BOTH the compacted rewrite and the concurrently-landed batch, and LWW
    still resolves the true winners."""
    root = str(tmp_path / "ccomp")
    t_ing = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )

    def rows_for(lo, hi, seed):
        feed = change_feed(spark, hi - lo, n_repos=4, paths_per_repo=8,
                           seed=seed, start_offset=lo)
        r, _ = events_to_rows(
            decode_feed(feed, inject={"commit": "commit"}), t_ing.schema, t_ing.pk
        )
        return r

    t_ing.merge(rows_for(0, 600, 13), fence=("ing", 0))
    t_ing.merge(rows_for(600, 1200, 13), fence=("ing", 1))

    # compactor handle loads the v3 manifest...
    t_cmp = LakeTable.load(spark, root)
    # ...then the ingest writer lands another batch, advancing the manifest
    t_ing = LakeTable.load(spark, root)
    t_ing.merge(rows_for(1200, 1800, 13), fence=("ing", 2))

    done = t_cmp.compact()  # CAS conflict -> rebase-retry
    assert done  # did not abort

    final = LakeTable.load(spark, root)
    # the concurrent batch's files survived the compact commit
    assert final.stats()["needs_collapse"]
    # state equality vs a straight-line replay of all 1800 events
    ref_root = str(tmp_path / "ref")
    t_ref = LakeTable.create(
        spark, ref_root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    t_ref.merge(rows_for(0, 1800, 13), fence=("ref", 0))
    cols = ["repo", "path", "commit", "lang", "content"]
    got = sorted(tuple(r) for r in final.current().select(*cols).collect())
    exp = sorted(tuple(r) for r in t_ref.current().select(*cols).collect())
    assert got == exp and len(got) > 0


def test_cascade_writes_lineage(spark, tmp_path):
    from cds_spark.streaming.pipeline import cascade_sync

    src_root, dst_root = str(tmp_path / "ls"), str(tmp_path / "ld")
    t = LakeTable.create(
        spark, src_root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    feed = change_feed(spark, 300, n_repos=3, paths_per_repo=6, seed=61)
    rows, _ = events_to_rows(
        decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
    )
    t.merge(rows, fence=("u", 0))
    cascade_sync(spark, src_root, dst_root, "casl")
    feed = change_feed(spark, 200, n_repos=3, paths_per_repo=6, seed=61, start_offset=300)
    rows, _ = events_to_rows(
        decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
    )
    t.merge(rows, fence=("u", 1))
    cascade_sync(spark, src_root, dst_root, "casl")
    path = os.path.join(dst_root, "_lineage", "casl.jsonl")
    recs = [json.loads(x) for x in open(path)]
    assert len(recs) == 2
    assert recs[0]["applied"] == "bootstrap" and isinstance(recs[1]["applied"], int)
    assert all("duration_s" in r and r["job_id"] == "casl" for r in recs)


def test_run_many_syncs_two_tables_one_session(spark, tmp_path):
    """Two sync jobs (distinct topics, tables, checkpoints) hosted in one
    Spark app: both final states match their own pandas oracles, fences and
    lineage stay per-job."""
    from cds_spark.sources.feed import reference_replay_pandas, write_feed_files
    from cds_spark.streaming.pipeline import IncrementalSync, JobSpec, run_many

    specs, oracles = [], {}
    for i, seed in enumerate((101, 202)):
        feed = change_feed(spark, 1200, n_repos=6, paths_per_repo=10, seed=seed)
        oracles[i] = reference_replay_pandas([r.asDict() for r in feed.collect()])
        topic = str(tmp_path / f"topic{i}")
        write_feed_files(feed, topic, 3)
        root = str(tmp_path / f"tbl{i}")
        LakeTable.create(
            spark, root, REPO_SCHEMA, pk=["repo", "path"],
            version_cols=["commit", "_offset"], n_buckets=8,
            properties={"merge_mode": "append"},
        )
        specs.append(JobSpec(job_id=f"m{i}", table_root=root, source_dir=topic,
                             checkpoint_dir=str(tmp_path / f"ck{i}"),
                             max_files_per_trigger=2))
    run_many(spark, specs)
    for i in range(2):
        t = LakeTable.load(spark, str(tmp_path / f"tbl{i}"))
        live = {(r["repo"], r["path"]): r["content"] for r in t.current().collect()}
        assert live == {k: v["content"] for k, v in oracles[i].items()}
        assert f"fence.m{i}" in t.properties
        assert os.path.exists(os.path.join(str(tmp_path / f"tbl{i}"), "_lineage", f"m{i}.jsonl"))
    # distinct-target guard
    import pytest as _pytest
    with _pytest.raises(ValueError):
        run_many(spark, [specs[0], specs[0]])


def test_validate_invariants(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "val"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    feed = change_feed(spark, 600, n_repos=4, paths_per_repo=8, seed=91)
    rows, _ = events_to_rows(
        decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
    )
    t.merge(rows, fence=("val", 0))
    v = t.validate()
    assert v["ok"] and v["misplaced_rows"] == 0 and v["null_pk_rows"] == 0
    assert v["dirty_buckets"] > 0          # uncollapsed append batch
    t.compact(purge_tombstones=True)
    v = t.validate()
    assert v["ok"] and v["dirty_buckets"] == 0 and v["dup_collapsed_keys"] == 0
    # bucket-subset audit works
    b = t.manifest["files"][0]["bucket"]
    assert t.validate(buckets=[b])["ok"]


def test_merge_survives_concurrent_compact_commit(spark, tmp_path):
    """The other half of the non-blocking-maintenance contract: an ingest
    merge that loses the manifest CAS to a concurrent compact rebases and
    commits; no event is lost and LWW absorbs the duplicated rewrite."""
    root = str(tmp_path / "mrace")
    t_ing = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )

    def rows_for(lo, hi):
        feed = change_feed(spark, hi - lo, n_repos=4, paths_per_repo=8,
                           seed=17, start_offset=lo)
        r, _ = events_to_rows(
            decode_feed(feed, inject={"commit": "commit"}), t_ing.schema, t_ing.pk
        )
        return r

    t_ing.merge(rows_for(0, 600), fence=("mr", 0))
    t_ing.merge(rows_for(600, 1200), fence=("mr", 1))
    # ingest handle goes "stale": a maintenance process compacts first
    t_mnt = LakeTable.load(spark, root)
    t_mnt.compact()
    # the stale ingest writer commits its next batch -> CAS loss -> rebase
    s = t_ing.merge(rows_for(1200, 1800), fence=("mr", 2))
    assert not s.skipped

    final = LakeTable.load(spark, root)
    ref_root = str(tmp_path / "mref")
    t_ref = LakeTable.create(
        spark, ref_root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    t_ref.merge(rows_for(0, 1800), fence=("ref", 0))
    cols = ["repo", "path", "commit", "lang", "content"]
    got = sorted(tuple(r) for r in final.current().select(*cols).collect())
    exp = sorted(tuple(r) for r in t_ref.current().select(*cols).collect())
    assert got == exp and len(got) > 0
    # the compacted rewrite survived alongside the rebased batch
    assert final.stats()["needs_collapse"]


def test_pipeline_arrow_decoder_matches_jvm(spark, tmp_path):
    """decoder='arrow' (the input_hint's vectorized pandas path) drives the
    full sync loop to the same final state as the JVM decoder."""
    from cds_spark.sources.feed import write_feed_files
    from cds_spark.streaming.pipeline import IncrementalSync, JobSpec

    feed = change_feed(spark, 900, n_repos=6, paths_per_repo=10, seed=77)
    topic = str(tmp_path / "atopic")
    write_feed_files(feed, topic, 3)
    states = {}
    for dec in ("jvm", "arrow"):
        root = str(tmp_path / f"adec_{dec}")
        LakeTable.create(
            spark, root, REPO_SCHEMA, pk=["repo", "path"],
            version_cols=["commit", "_offset"], n_buckets=8,
        )
        spec = JobSpec(job_id=f"ad-{dec}", table_root=root, source_dir=topic,
                       checkpoint_dir=str(tmp_path / f"ack_{dec}"),
                       evolve_schema=False, decoder=dec)
        IncrementalSync(spark, spec).run_available()
        t = LakeTable.load(spark, root)
        states[dec] = sorted(tuple(r) for r in t.current().collect())
    assert states["jvm"] == states["arrow"] and len(states["jvm"]) > 0


def test_arrow_decoder_with_schema_evolution(spark, tmp_path):
    """decoder='arrow' composes with evolve_schema since round 3: the Arrow
    decode passes the raw payload through (keep_cols) so the evolution
    probe samples types for unknown keys; a new column discovered mid-batch
    lands with the same values the JVM decode path produces."""
    import json as _json

    from cds_spark.operators.decode import decode_feed

    base = change_feed(spark, 300, n_repos=5, paths_per_repo=10, seed=21)
    # append a new key 'stars' (numeric) to half the payloads
    evolved = base.withColumn(
        "payload",
        F.when(
            F.col("offset") % 2 == 0,
            F.expr(
                "concat(substring(payload, 1, length(payload)-1), "
                "',\"stars\":', cast(offset % 50 as string), '}')"
            ),
        ).otherwise(F.col("payload")),
    )
    states = {}
    for dec in ("jvm", "arrow"):
        topic = str(tmp_path / f"evo_topic_{dec}")
        write_feed_files(evolved, topic, 2)
        root = str(tmp_path / f"evo_{dec}")
        LakeTable.create(
            spark, root, REPO_SCHEMA, pk=["repo", "path"],
            version_cols=["commit", "_offset"], n_buckets=8,
        )
        spec = JobSpec(job_id=f"evo-{dec}", table_root=root, source_dir=topic,
                       checkpoint_dir=str(tmp_path / f"evo_ck_{dec}"),
                       evolve_schema=True, decoder=dec)
        IncrementalSync(spark, spec).run_available()
        t = LakeTable.load(spark, root)
        assert "stars" in [f.name for f in t.schema.fields]
        # numeric type inferred (not stuck string), values landed
        stars_f = [f for f in t.schema.fields if f.name == "stars"][0]
        assert stars_f.dataType.typeName() in ("long", "double")
        states[dec] = sorted(tuple(r) for r in t.current().collect())
    assert states["jvm"] == states["arrow"]
    assert any(r[-1] is not None for r in states["arrow"])  # some stars set


def test_purge_where_removes_keys_all_generations(spark, tmp_path):
    """ALTER TABLE ... DELETE analog: keys whose current row matches the
    predicate vanish from every generation (no resurrection at the next
    collapse); untouched buckets' files are carried by reference."""
    root = str(tmp_path / "purge")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=8,
        properties={"merge_mode": "append"},
    )
    for i in range(3):  # several generations so resurrection is possible
        feed = change_feed(spark, 500, n_repos=5, paths_per_repo=8,
                           seed=33, start_offset=500 * i)
        rows, _ = events_to_rows(
            decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
        )
        t.merge(rows, fence=("pg", i))
    before = {(r["repo"], r["path"]): r for r in t.current().collect()}
    victims = {k for k in before if k[0] == "org/repo-0"}
    assert victims and len(victims) < len(before)

    pre_files = {f["path"] for f in t.manifest["files"]}
    res = t.purge_where("repo = 'org/repo-0'")
    assert res["keys_purged"] == len(victims)
    assert 0 < res["buckets_rewritten"] <= 8

    after = {(r["repo"], r["path"]): r for r in t.current().collect()}
    assert set(after) == set(before) - victims
    for k in after:  # survivors untouched
        assert after[k]["content"] == before[k]["content"]
    # no generation of a purged key remains anywhere
    raw = t.read(live_only=False, with_meta=True, collapse=False)
    assert raw.filter(F.col("repo") == "org/repo-0").count() == 0
    # untouched buckets carried by reference (same file paths)
    touched_b = {f["bucket"] for f in t.manifest["files"]
                 if f["path"] not in pre_files}
    untouched_kept = [f["path"] for f in t.manifest["files"]
                      if f["bucket"] not in touched_b]
    assert all(p in pre_files for p in untouched_kept)
    assert t.validate()["ok"]
    # no-match predicate is a no-op commit-free
    v = t.version
    assert t.purge_where("repo = 'nope'")["keys_purged"] == 0
    assert t.version == v


def test_update_where_mutates_matching_rows(spark, tmp_path):
    """ALTER TABLE ... UPDATE analog: RHS sees OLD values, versions are
    untouched, non-matching rows and other buckets are byte-identical."""
    root = str(tmp_path / "upd")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=8,
        properties={"merge_mode": "append"},
    )
    for i in range(2):
        feed = change_feed(spark, 500, n_repos=5, paths_per_repo=8,
                           seed=55, start_offset=500 * i)
        rows, _ = events_to_rows(
            decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
        )
        t.merge(rows, fence=("up", i))
    before = {(r["repo"], r["path"]): r for r in t.current().collect()}
    n_match = sum(1 for k in before if k[0] == "org/repo-0")
    assert n_match > 0

    res = t.update_where(
        "repo = 'org/repo-0'",
        # lang references OLD content; content references OLD lang —
        # both must see pre-update values
        {"lang": "concat('x-', lang)", "content": "concat(lang, ':', content)"},
    )
    assert res["rows_updated"] == n_match
    after = {(r["repo"], r["path"]): r for r in t.current().collect()}
    assert set(after) == set(before)
    for k, r in after.items():
        b = before[k]
        if k[0] == "org/repo-0":
            assert r["lang"] == f"x-{b['lang']}"
            assert r["content"] == f"{b['lang']}:{b['content']}"  # OLD lang
            assert r["commit"] == b["commit"]  # version untouched
        else:
            assert tuple(r) == tuple(b)
    assert t.validate()["ok"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="PK"):
        t.update_where("true", {"repo": "'nope'"})
    with _pytest.raises(ValueError, match="unknown"):
        t.update_where("true", {"bogus": "'x'"})


def test_mutations_are_race_safe(spark, tmp_path):
    """Mutations never rebase: a purge losing the CAS to an ingest commit
    re-runs against fresh state (new matching rows also purged); a stale
    MERGE racing a committed purge aborts instead of resurrecting keys;
    changes() refuses mutation windows; cascade full-refreshes through
    an upstream purge."""
    import pytest as _pytest

    from cds_spark.streaming.pipeline import cascade_sync

    root = str(tmp_path / "msafe")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )

    def rows_for(lo, hi):
        feed = change_feed(spark, hi - lo, n_repos=4, paths_per_repo=6,
                           seed=7, start_offset=lo)
        r, _ = events_to_rows(
            decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
        )
        return r

    t.merge(rows_for(0, 600), fence=("ms", 0))
    dst = str(tmp_path / "msafe_dst")
    cascade_sync(spark, root, dst, "msc")  # bootstrap cursor pre-purge
    v_pre = t.version

    # (1) purge loses CAS to a concurrent ingest commit -> whole-op retry
    t_stale = LakeTable.load(spark, root)
    t.merge(rows_for(600, 1200), fence=("ms", 1))  # advances the manifest
    res = t_stale.purge_where("repo = 'org/repo-0'")
    final = LakeTable.load(spark, root)
    # recomputed on fresh state: batch-2 rows for repo-0 purged too
    assert final.current().filter("repo = 'org/repo-0'").count() == 0
    assert res["keys_purged"] > 0

    # (2) stale merge racing the committed purge ABORTS (no resurrection)
    t_stale2 = LakeTable.load(spark, root)
    LakeTable.load(spark, root).purge_where("repo = 'org/repo-1'")
    from cds_spark.lake.table import CommitConflict
    with _pytest.raises(CommitConflict, match="mutation"):
        t_stale2.merge(rows_for(1200, 1400), fence=("ms", 2))
    assert LakeTable.load(spark, root).current() \
        .filter("repo = 'org/repo-1'").count() == 0

    # (3) changes() refuses a window containing the purge
    with _pytest.raises(ValueError, match="mutation"):
        LakeTable.load(spark, root).changes(v_pre)

    # (4) cascade crosses the purge via full refresh; downstream loses keys
    r = cascade_sync(spark, root, dst, "msc")
    assert r["applied"] == "full-refresh"
    d = LakeTable.load(spark, dst)
    assert d.current().filter("repo = 'org/repo-0'").count() == 0
    cols = ["repo", "path", "commit", "content"]
    assert sorted(map(tuple, d.current().select(*cols).collect())) == \
           sorted(map(tuple, LakeTable.load(spark, root).current().select(*cols).collect()))


def test_update_where_refuses_uncastable_assignment(spark, tmp_path):
    """A typo'd RHS that would silently NULL a column must fail the
    mutation, and the table must be unchanged."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("v", T.StringType(), True),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "updguard"), schema, pk=["id"],
        version_cols=["_offset"], n_buckets=4,
    )
    src = spark.createDataFrame(
        [(i, i * 10, f"v{i}", False, i) for i in range(30)],
        "id long, n long, v string, _is_delete boolean, _offset long",
    )
    t.merge(src, fence=("ug", 0))
    before = sorted(map(tuple, t.current().collect()))
    v = t.version
    with pytest.raises(ValueError, match="cast"):
        # long column assigned a non-numeric string: try_cast -> NULL,
        # which the guard must refuse before any rewrite
        t.update_where("true", {"n": "'abc'"})
    t2 = LakeTable.load(spark, t.root)
    assert t2.version == v
    assert sorted(map(tuple, t2.current().collect())) == before
    # a legitimate update through the same path still works
    t2.update_where("id = 3", {"n": "n + 1"})
    assert t2.lookup([(3,)]).first()["n"] == 31


def test_fence_never_regresses_through_rebase(spark, tmp_path):
    """A zombie driver of the SAME job whose batch was already applied by
    its replacement must come back 'skipped' — not re-commit old rows and
    roll the fence backwards."""
    root = str(tmp_path / "zombie")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )

    def rows_for(lo, hi):
        feed = change_feed(spark, hi - lo, n_repos=3, paths_per_repo=5,
                           seed=11, start_offset=lo)
        r, _ = events_to_rows(
            decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
        )
        return r

    t.merge(rows_for(0, 300), fence=("J", 0))
    zombie = LakeTable.load(spark, root)      # stalls holding this snapshot
    fresh = LakeTable.load(spark, root)       # restarted driver races ahead
    fresh.merge(rows_for(300, 600), fence=("J", 1))
    fresh.merge(rows_for(600, 900), fence=("J", 2))
    s = zombie.merge(rows_for(300, 600), fence=("J", 1))  # duplicate batch 1
    assert s.skipped, "zombie's already-applied batch must be dropped"
    final = LakeTable.load(spark, root)
    assert int(final.properties["fence.J"]) == 2          # never regressed
    # state equals the straight-line replay
    ref = LakeTable.create(
        spark, str(tmp_path / "zref"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    ref.merge(rows_for(0, 900), fence=("r", 0))
    cols = ["repo", "path", "commit", "content"]
    assert sorted(map(tuple, final.current().select(*cols).collect())) == \
           sorted(map(tuple, ref.current().select(*cols).collect()))


def test_jdbc_keyset_scan_nonnumeric_pk_falls_back(spark, monkeypatch):
    """String/UUID keyset columns can't range-partition: fall back to a
    single-reader snapshot instead of crashing on int()."""
    from pyspark.sql.readwriter import DataFrameReader

    from cds_spark.streaming.pipeline import jdbc_keyset_scan

    bounds = spark.createDataFrame([("000a-1", "fff9-2")], "lo string, hi string")
    snapshot = spark.createDataFrame([(f"{i:04x}-x", i) for i in range(10)],
                                     "id string, v long")
    calls = []

    def fake_jdbc(self, url, table, column=None, lowerBound=None,
                  upperBound=None, numPartitions=None, properties=None):
        calls.append({"table": table, "column": column})
        return bounds if "cds_bounds" in table else snapshot

    monkeypatch.setattr(DataFrameReader, "jdbc", fake_jdbc)
    out = jdbc_keyset_scan(spark, "jdbc:mysql://db/x", "t", "id")
    assert out.count() == 10
    # second call must be the UNPARTITIONED read (no column/bounds)
    assert calls[-1]["column"] is None


def test_cascade_recovers_half_created_destination(spark, tmp_path):
    """First cascade run crashed between create() and the bootstrap merge:
    the empty destination is re-bootstrapped, not wedged."""
    from cds_spark.streaming.pipeline import cascade_sync

    src_root, dst_root = str(tmp_path / "hcs"), str(tmp_path / "hcd")
    t = LakeTable.create(
        spark, src_root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
    )
    feed = change_feed(spark, 300, n_repos=3, paths_per_repo=5, seed=83)
    rows, _ = events_to_rows(
        decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
    )
    t.merge(rows, fence=("h", 0))
    # simulate the crash: destination created, bootstrap merge never ran
    LakeTable.create(
        spark, dst_root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
    )
    r = cascade_sync(spark, src_root, dst_root, "hc")
    assert r["applied"] == "bootstrap"
    d = LakeTable.load(spark, dst_root)
    assert d.current().count() == t.current().count()
    # but a NON-empty foreign table still refuses
    import pytest as _pytest
    foreign = str(tmp_path / "hcf")
    f = LakeTable.create(
        spark, foreign, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
    )
    f.merge(rows, fence=("other", 0))
    with _pytest.raises(ValueError, match="refusing"):
        cascade_sync(spark, src_root, foreign, "hc")


def test_schema_evolution_null_first_occurrence_infers_value_type(spark, tmp_path):
    """The first event carrying a new key may hold JSON null; the sampler
    must infer from an event with a non-null VALUE (ALTER ADD is sticky)."""
    table = _mk_table(spark, tmp_path, "nullsample")
    ev = spark.createDataFrame(
        [
            ("c", "r1", "p1", "000001", 0,
             '{"repo":"r1","path":"p1","commit":"000001","stars":null}', 0),
            ("c", "r1", "p2", "000001", 1,
             '{"repo":"r1","path":"p2","commit":"000001","stars":7}', 0),
        ],
        "op string, repo string, path string, commit string, offset long, payload string, partition int",
    )
    spec = JobSpec(job_id="ns", table_root=table.root, source_dir="unused",
                   checkpoint_dir="unused")
    IncrementalSync(spark, spec).process_batch(ev, 0)
    t2 = LakeTable.load(spark, table.root)
    types = {f.name: f.dataType.typeName() for f in t2.schema.fields}
    assert types["stars"] == "long", types


def test_compact_statless_file_disables_skip_count_gate(spark, tmp_path):
    """ADVICE r3 (medium): a legacy manifest entry with no 'rows' stat must
    disable the precounted gate (counting it as 0 rows would under-bound
    the winner set and allow an uncapped broadcast); compact must fall back
    to the persist+count path and still produce the right state."""
    from cds_spark.operators.decode import decode_feed_rows
    from cds_spark.sources.feed import REPO_SCHEMA, change_feed

    feed = change_feed(spark, 1500, n_repos=6, paths_per_repo=10, seed=44)
    root = str(tmp_path / "statless")
    t = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    for i in range(2):
        batch = feed.filter(
            (F.col("offset") >= i * 750) & (F.col("offset") < (i + 1) * 750)
        )
        rows, _ = decode_feed_rows(batch, t.schema, t.pk, inject={"commit": "commit"})
        t.merge(rows, fence=("sl", i))
    assert t.properties.get("needs_collapse")
    expected = sorted(tuple(r) for r in t.current().collect())

    # simulate a legacy (pre-row-stats) manifest entry
    t.manifest["files"][0].pop("rows", None)

    seen = {}
    orig = t._collapse_via_winners

    def spy(raw, cap, skip_count=False):
        seen["skip_count"] = skip_count
        return orig(raw, cap, skip_count=skip_count)

    t._collapse_via_winners = spy
    t.compact(purge_tombstones=True, strategy="winners")
    assert seen.get("skip_count") is False
    t2 = LakeTable.load(spark, root)
    assert sorted(tuple(r) for r in t2.current().collect()) == expected


def test_upsert_local_merge_matches_plan_merge(spark, tmp_path):
    """The per-bucket Arrow upsert merge must produce byte-identical state
    (including tombstones and meta columns) to the plan-based merge across
    multiple batches, and must actually take the local path when the cost
    floor is disabled."""
    from cds_spark.operators.decode import decode_feed_rows
    from cds_spark.sources.feed import REPO_SCHEMA, change_feed

    feed = change_feed(spark, 3000, n_repos=10, paths_per_repo=15, seed=55)
    states = {}
    for label, props, strat in (
        ("plan", {}, "plan"),
        ("local", {"local_merge_min_rows": 0, "local_merge_min_bytes": 0}, "auto"),
    ):
        root = str(tmp_path / f"um_{label}")
        t = LakeTable.create(
            spark, root, REPO_SCHEMA, pk=["repo", "path"],
            version_cols=["commit", "_offset"], n_buckets=8,
            properties={"merge_mode": "upsert", **props},
        )
        for i in range(3):
            batch = feed.filter(
                (F.col("offset") >= i * 1000) & (F.col("offset") < (i + 1) * 1000)
            )
            rows, _ = decode_feed_rows(batch, t.schema, t.pk, inject={"commit": "commit"})
            t.merge(rows, fence=("um", i), strategy=strat)
        t2 = LakeTable.load(spark, root)
        states[label] = sorted(
            tuple(r) for r in t2.read(live_only=False, with_meta=True).collect()
        )
        if label == "local":
            assert any("-merge" in f["path"] for f in t2.manifest["files"]), \
                "local merge path was not taken"
    assert states["plan"] == states["local"]


def _mk_drop_table(spark, tmp_path):
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "drops"), schema, pk=["repo", "path"],
        version_cols=["ver"], n_buckets=4, properties={"merge_mode": "upsert"},
    )
    df = spark.createDataFrame(
        [("r1", "a", "go", "x", 1), ("r1", "b", "py", "y", 1)], schema)
    t.merge(df, fence=("j", 0))
    return t, schema


def test_alter_drop_column_projects_away_immediately(spark, tmp_path):
    """DROP COLUMN is metadata-only (ClickHouse lazy-drop analog): reads
    lose the column at once, data files are untouched until compact, PK /
    version columns are protected, and time travel to a pre-drop snapshot
    still shows the values."""
    t, _ = _mk_drop_table(spark, tmp_path)
    pre_drop_version = t.version
    t.alter_drop_column("lang")
    assert "lang" not in t.current().columns
    assert t.current().count() == 2
    with pytest.raises(ValueError):
        t.alter_drop_column("repo")     # PK
    with pytest.raises(ValueError):
        t.alter_drop_column("ver")      # version col
    with pytest.raises(KeyError):
        t.alter_drop_column("nope")
    old = LakeTable.load(spark, t.root, version=pre_drop_version)
    assert {r.lang for r in old.current().collect()} == {"go", "py"}
    # the drop commit touched zero files: O(1) metadata, eligible as a delta
    assert t.manifest["files"] == old.manifest["files"]


def test_drop_then_readd_reads_null_not_old_values(spark, tmp_path):
    """Re-adding a dropped column must yield NULL for rows written before
    the re-add (ClickHouse drop-then-add semantics), never resurrect the
    old bytes still sitting in pre-drop parquet files; rows written after
    the re-add carry their values; compact makes the NULLs physical."""
    import pyspark.sql.types as T
    t, schema = _mk_drop_table(spark, tmp_path)
    t.alter_drop_column("lang")
    t.alter_add_columns([T.StructField("lang", T.StringType(), True)])
    cur = {(r.repo, r.path): r.lang for r in t.current().collect()}
    assert cur == {("r1", "a"): None, ("r1", "b"): None}
    # post-re-add write: a new key and an LWW update of an old key
    df2 = spark.createDataFrame(
        [("r2", "a", "rust", "z", 2), ("r1", "a", "zig", "x2", 2)], schema)
    t.merge(df2, fence=("j", 1))
    want = {("r1", "a"): "zig", ("r1", "b"): None, ("r2", "a"): "rust"}
    got = {(r.repo, r.path): r.lang for r in t.current().collect()}
    assert got == want
    # compact rewrites every bucket to the current schema generation;
    # results identical and the old-generation bytes are gone
    t.compact()
    got2 = {(r.repo, r.path): r.lang for r in t.current().collect()}
    assert got2 == want
    sid = str(t.manifest["schema_id"])
    assert all(str(f["schema_id"]) == sid for f in t.manifest["files"])
    # physically re-read one rewritten file without the manifest: the
    # column exists (current schema) and old values did not leak back
    got3 = {(r.repo, r.path): r.lang
            for r in LakeTable.load(spark, t.root).current().collect()}
    assert got3 == want


def test_cascade_sync_transform_derived_view(spark, tmp_path):
    """cascade_sync(transform=...): a derived VIEW (here: token counts +
    content projection) maintained incrementally — bootstrap, O(delta)
    increments, update/delete propagation, full-refresh fallback — always
    equal to recomputing the transform over the upstream's current state."""
    from cds_spark.streaming.pipeline import cascade_sync

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    src = LakeTable.create(
        spark, src_root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=8,
        properties={"merge_mode": "append"},
    )

    def push(lo, hi, fence_n):
        feed = change_feed(spark, hi - lo, n_repos=6, paths_per_repo=8, seed=7,
                           start_offset=lo)
        events = decode_feed(feed, inject={"commit": "commit"})
        rows, _ = events_to_rows(events, src.schema, src.pk)
        src.merge(rows, fence=("up", fence_n))

    def tf(df):
        # row-wise derived view: drop content, add a token count + a
        # language flag; preserves pk/version/meta columns
        return df.select(
            "repo", "path", "commit", "_offset", "_is_delete",
            F.size(F.split(F.coalesce(F.col("content"), F.lit("")), " "))
             .cast("long").alias("n_tokens"),
            (F.col("lang") == "python").alias("is_python"),
        )

    def states_equal():
        want = sorted(
            tuple(r) for r in
            tf(src.current()
               .withColumn("_is_delete", F.lit(False))
               .withColumn("_offset", F.lit(0).cast("long")))
            .drop("_is_delete", "_offset").collect())
        got = sorted(
            tuple(r) for r in LakeTable.load(spark, dst_root).current()
            .select("repo", "path", "commit", "n_tokens", "is_python")
            .collect())
        assert got == want and len(got) > 0

    push(0, 700, 0)
    r = cascade_sync(spark, src_root, dst_root, "tv", transform=tf)
    assert r["applied"] == "bootstrap"
    dst = LakeTable.load(spark, dst_root)
    assert [f.name for f in dst.schema.fields] == [
        "repo", "path", "commit", "n_tokens", "is_python"]
    states_equal()

    # increments with updates + deletes flow through the transform
    push(700, 1500, 1)
    r = cascade_sync(spark, src_root, dst_root, "tv", transform=tf)
    assert isinstance(r["applied"], int) and r["applied"] > 0
    states_equal()

    # full-refresh fallback keeps the transform
    push(1500, 1900, 2)
    push(1900, 2200, 3)
    src.expire_snapshots(keep_last=1)
    r = cascade_sync(spark, src_root, dst_root, "tv", transform=tf)
    assert r["applied"] == "full-refresh"
    states_equal()

    # a transform dropping a PK column is refused
    import pytest
    with pytest.raises(ValueError):
        cascade_sync(spark, src_root, str(tmp_path / "bad"), "tv2",
                     transform=lambda df: df.drop("path"))
