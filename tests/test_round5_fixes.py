"""Round-5 fixes: verdict items #4/#6/#7 and the ADVICE_r4 list.

- validate() under a single legacy modulus (post rebucket-begin)
- timestamp/date tables on the Arrow-local merge path (applyInArrow,
  no pandas round-trip) with plan-path equivalence
- float NaN preservation in data columns; float VERSION columns fall back
- local-merge output chunking includes the batch's own bytes
- stats() flags over-cap buckets with a rebucket hint
- full_sync_windowed bounds recovery from table properties / loud failure
- rebucket() vs concurrent schema evolution
"""
import datetime
import json
import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from cds_spark.lake.table import LakeTable


TS_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("updated_at", T.TimestampType()),
    T.StructField("day", T.DateType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("ver", T.LongType()),
])


def _ts_batch(spark, lo, hi, ver_base):
    """Deterministic batch over keys k-(lo..hi) with timestamp/date/double
    columns; ver encodes recency."""
    return spark.range(lo, hi).selectExpr(
        "concat('k-', id % 40) AS k",
        "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS updated_at",
        "date_add(date'2024-03-01', cast(id % 11 AS int)) AS day",
        "CASE WHEN id % 7 = 3 THEN double('NaN') ELSE id * 0.5 END AS score",
        f"id + {ver_base} AS ver",
    )


def test_local_merge_timestamp_date_matches_plan(spark, tmp_path):
    """Verdict #4: tables with timestamp/date columns must take the
    Arrow-local merge path and produce state identical to the plan merge."""
    states = {}
    took_local = {}
    for label, props, strat in (
        ("plan", {}, "plan"),
        ("local", {"local_merge_min_rows": 0, "local_merge_min_bytes": 0}, "auto"),
    ):
        root = str(tmp_path / f"ts_{label}")
        t = LakeTable.create(
            spark, root, TS_SCHEMA, pk=["k"], version_cols=["ver"],
            n_buckets=4, properties={"merge_mode": "upsert", **props},
        )
        for i in range(3):
            t.merge(_ts_batch(spark, i * 200, (i + 1) * 200, 0), fence=("ts", i),
                    strategy=strat)
        t2 = LakeTable.load(spark, root)
        states[label] = sorted(
            str(tuple(r)) for r in t2.read(live_only=False, with_meta=True).collect()
        )
        took_local[label] = any("-merge" in f["path"] for f in t2.manifest["files"])
    assert took_local["local"], "timestamp/date table did not take the local merge"
    assert states["plan"] == states["local"]


def test_local_merge_preserves_nan_in_data_column(spark, tmp_path):
    """ADVICE r4: the old pandas round-trip silently converted NaN to NULL
    in float/double data columns; applyInArrow must preserve it."""
    root = str(tmp_path / "nan")
    t = LakeTable.create(
        spark, root, TS_SCHEMA, pk=["k"], version_cols=["ver"], n_buckets=2,
        properties={"merge_mode": "upsert",
                    "local_merge_min_rows": 0, "local_merge_min_bytes": 0},
    )
    t.merge(_ts_batch(spark, 0, 100, 0), fence=("n", 0))
    t.merge(_ts_batch(spark, 100, 200, 0), fence=("n", 1))
    t2 = LakeTable.load(spark, root)
    assert any("-merge" in f["path"] for f in t2.manifest["files"])
    cur = t2.current()
    n_nan = cur.filter(F.isnan("score")).count()
    n_null = cur.filter(F.col("score").isNull()).count()
    # winners are ids 160..199 -> k-(0..39); NaN at id%7==3
    assert n_nan == cur.filter(F.expr("(ver % 7) = 3")).count() and n_nan > 0
    assert n_null == 0


def test_float_version_col_falls_back_but_stays_correct(spark, tmp_path):
    """Float/double VERSION columns order NaN differently in Arrow vs Spark:
    both local paths must decline (fall back to plan) and results stay
    correct."""
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.StringType()),
        T.StructField("fver", T.DoubleType()),
    ])
    root = str(tmp_path / "fv")
    t = LakeTable.create(
        spark, root, schema, pk=["k"], version_cols=["fver"], n_buckets=2,
        properties={"merge_mode": "upsert",
                    "local_merge_min_rows": 0, "local_merge_min_bytes": 0},
    )
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "concat('k-', id % 20) AS k", "concat('v', id) AS v",
        "cast(id AS double) AS fver",
    )
    t.merge(mk(0, 100), fence=("f", 0))
    t.merge(mk(100, 200), fence=("f", 1))
    t2 = LakeTable.load(spark, root)
    assert not any("-merge" in f["path"] for f in t2.manifest["files"]), \
        "float version col must not take the Arrow-local merge"
    rows = {r["k"]: r["v"] for r in t2.current().collect()}
    assert rows == {f"k-{i}": f"v{180 + i}" for i in range(20)}
    # local compact must decline too (plan path still compacts correctly)
    t2.compact()
    t3 = LakeTable.load(spark, root)
    assert {r["k"]: r["v"] for r in t3.current().collect()} == rows


def test_local_merge_chunking_counts_batch_bytes(spark, tmp_path):
    """ADVICE r4: a large batch merged into an EMPTY bucket must still be
    chunked near target_file_bytes, not written as one oversized file."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / "chunk")
    t = LakeTable.create(
        spark, root, schema, pk=["k"], version_cols=["ver"], n_buckets=1,
        properties={"merge_mode": "upsert", "local_merge_min_rows": 0,
                    "local_merge_min_bytes": 0, "target_file_bytes": 64 * 1024},
    )
    # seed one tiny file so the bucket exists, then merge a much larger batch
    t.merge(spark.range(0, 10).selectExpr(
        "id AS k", "repeat('x', 10) AS payload", "id AS ver"))
    big = spark.range(0, 20000).selectExpr(
        "id AS k", "concat(uuid(), uuid(), uuid()) AS payload", "id AS ver")
    t.merge(big, fence=("c", 1))
    t2 = LakeTable.load(spark, root)
    merged = [f for f in t2.manifest["files"] if "-merge" in f["path"]]
    assert merged, "local merge path was not taken"
    assert len(merged) > 1, "oversized batch written as a single file"
    # and no file grossly past the target (4x slack for estimate error)
    assert max(f["bytes"] for f in merged) < 4 * 64 * 1024


def test_stats_flags_over_cap_bucket(spark, tmp_path):
    """Verdict #6: an over-cap bucket must surface in stats() with a
    rebucket hint (power-of-two suggestion)."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / "cap")
    t = LakeTable.create(
        spark, root, schema, pk=["k"], version_cols=["ver"], n_buckets=2,
        properties={"merge_mode": "append",
                    "local_compact_max_bucket_bytes": 1024},
    )
    t.merge(spark.range(0, 5000).selectExpr(
        "id AS k", "concat(uuid(), uuid()) AS v", "id AS ver"))
    st = LakeTable.load(spark, root).stats()
    assert st["n_over_cap_buckets"] >= 1
    assert st["over_cap_buckets"]
    assert "rebucket(" in st["rebucket_hint"]
    n = st["rebucket_suggested_n"]
    assert n > 2 and n % 2 == 0 and (n // 2 & (n // 2 - 1)) == 0


def test_validate_ok_right_after_rebucket_begin(spark, tmp_path):
    """ADVICE r4 (medium): after rebucket-begin every file carries ONE
    legacy modulus != n_buckets; validate() must judge placement under the
    per-file modulus, not the new one."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / "vb")
    t = LakeTable.create(
        spark, root, schema, pk=["k"], version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "append"},
    )
    t.merge(spark.range(0, 800).selectExpr(
        "id AS k", "concat('v', id) AS v", "id AS ver"))
    assert t.validate()["ok"]
    # replicate exactly phase 1 of rebucket(): stamp mods, flip n_buckets
    m = t._next_manifest({"operation": "rebucket-begin",
                          "from_buckets": 4, "to_buckets": 8})
    for f in m["files"]:
        f.setdefault("mod", 4)
    m["n_buckets"] = 8
    t._commit(m)
    t2 = LakeTable.load(spark, root)
    res = t2.validate()
    assert res["misplaced_rows"] == 0 and res["ok"], res


def test_fullsync_lost_sidecar_recovers_frozen_grid_from_table(spark, tmp_path):
    """The frozen bounds now also live in the table's properties: a lost
    sidecar plus a GROWN source must resume on the original grid (no
    silent row loss) and pick up growth via the tail chunk."""
    from cds_spark.streaming.pipeline import full_sync_windowed

    class FakeClock:
        def __init__(self, hours):
            self.h = list(hours)

        def __call__(self):
            h = self.h.pop(0) if len(self.h) > 1 else self.h[0]
            return datetime.datetime(2024, 1, 1, h, 0, 0)

    src1 = spark.range(0, 300).selectExpr(
        "id AS doc_id", "concat('x-', id) AS val", "id AS ver")
    root = str(tmp_path / "fs")
    sp = str(tmp_path / "fs.json")
    st = full_sync_windowed(
        spark, src1, root, pk=["doc_id"], version_cols=["ver"],
        n_chunks=3, n_buckets=4, window_hours=(2, 4), status_path=sp,
        job_id="g1", clock=FakeClock([2, 9]),
    )
    assert st["status"] == "PAUSE" and st["next_chunk"] == 1
    os.unlink(sp)  # sidecar wiped
    t = LakeTable.load(spark, root)
    assert "fullsync.g1.bounds" in t.properties
    # source GROWS during the pause (monotonic ids — canonical scenario)
    src2 = spark.range(0, 450).selectExpr(
        "id AS doc_id", "concat('x-', id) AS val", "id AS ver")
    st2 = full_sync_windowed(
        spark, src2, root, pk=["doc_id"], version_cols=["ver"],
        n_chunks=3, n_buckets=4, window_hours=(2, 4), status_path=sp,
        job_id="g1", clock=FakeClock([3]),
    )
    assert st2["status"] == "FINISHED"
    assert LakeTable.load(spark, root).current().count() == 450


def test_fullsync_resume_without_any_bounds_fails_loudly(spark, tmp_path):
    """ADVICE r4: a pre-upgrade sidecar (next_chunk>0, no bounds) on a table
    without recoverable bounds must raise, not recompute a shifted grid."""
    from cds_spark.streaming.pipeline import full_sync_windowed

    class Clock3:
        def __call__(self):
            return datetime.datetime(2024, 1, 1, 3, 0, 0)

    src = spark.range(0, 300).selectExpr(
        "id AS doc_id", "concat('x-', id) AS val", "id AS ver")
    root = str(tmp_path / "old")
    sp = str(tmp_path / "old.json")
    # build a table state with advanced fences, then strip the bounds
    # property from the manifest on disk (simulating a pre-upgrade table)
    st = full_sync_windowed(
        spark, src, root, pk=["doc_id"], version_cols=["ver"],
        n_chunks=3, n_buckets=4, window_hours=(2, 4), status_path=sp,
        job_id="o1", clock=Clock3(),
    )
    assert st["status"] == "FINISHED"
    t = LakeTable.load(spark, root)
    mpath = LakeTable._meta_path(root, t.version)
    m = json.load(open(mpath))
    m["properties"].pop("fullsync.o1.bounds", None)
    with open(mpath, "w") as f:
        json.dump(m, f)
    # old-format sidecar: mid-run, no bounds
    with open(sp, "w") as f:
        json.dump({"job_id": "o1", "status": "RUNNING", "next_chunk": 2}, f)
    with pytest.raises(RuntimeError, match="frozen chunk grid"):
        full_sync_windowed(
            spark, src, root, pk=["doc_id"], version_cols=["ver"],
            n_chunks=3, n_buckets=4, window_hours=(2, 4), status_path=sp,
            job_id="o1", clock=Clock3(),
        )


def test_rebucket_survives_concurrent_schema_evolution(spark, tmp_path):
    """ADVICE r4: an ALTER landing mid-rebucket must not stamp new-schema
    ids over old-column files — phys/schema_id are recomputed per
    iteration from the reloaded manifest."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / "rse")
    t = LakeTable.create(
        spark, root, schema, pk=["k"], version_cols=["ver"], n_buckets=8,
        properties={"merge_mode": "append"},
    )
    t.merge(spark.range(0, 2000).selectExpr(
        "id AS k", "concat('v', id) AS v", "id AS ver"))

    calls = {"n": 0}
    orig_reload = t._reload_latest

    def reload_with_race():
        calls["n"] += 1
        if calls["n"] == 2:  # between rewrite groups
            other = LakeTable.load(spark, root)
            other.alter_add_columns([T.StructField("extra", T.StringType())])
        orig_reload()

    t._reload_latest = reload_with_race
    out = t.rebucket(16, group=3)
    assert out["n_buckets"] == 16
    t2 = LakeTable.load(spark, root)
    # every entry's stamped schema must contain the columns its file holds
    for f in t2.manifest["files"]:
        sid = str(f["schema_id"])
        assert sid in t2.manifest["schemas"]
    df = t2.current()
    assert df.count() == 2000
    assert "extra" in df.columns
    assert t2.validate()["ok"]


def test_stats_over_cap_is_per_modulus_mid_rebucket(spark, tmp_path):
    """Round-5 review: mid-rebucket the manifest holds files under TWO
    moduli; summing bucket bytes by bare bucket id would add bucket b
    (mod old) to bucket b (mod new) — two healthy buckets reading as one
    over-cap bucket, plus a rebucket_suggested_n fighting the rebucket
    already in progress. Accounting must key on (mod, bucket) and the
    hint must stand down while moduli are mixed."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / "capmix")
    t = LakeTable.create(
        spark, root, schema, pk=["k"], version_cols=["ver"], n_buckets=2,
        properties={"merge_mode": "append"},
    )
    t.merge(spark.range(0, 3000).selectExpr(
        "id AS k", "concat(uuid(), uuid()) AS v", "id AS ver"))
    per_bucket = {}
    for f in t.manifest["files"]:
        per_bucket[f["bucket"]] = (
            per_bucket.get(f["bucket"], 0) + int(f["bytes"])
        )
    # cap chosen so every bucket is healthy under its own modulus but the
    # cross-modulus sum of a shared bucket id would breach it
    cap = max(per_bucket.values()) + 1
    # enter rebucket-begin (phase 1): stamp legacy mods, flip n_buckets
    m = t._next_manifest({"operation": "rebucket-begin",
                          "from_buckets": 2, "to_buckets": 4})
    for f in m["files"]:
        f.setdefault("mod", 2)
    m["n_buckets"] = 4
    m["properties"]["local_compact_max_bucket_bytes"] = str(cap)
    t._commit(m)
    t2 = LakeTable.load(spark, root)
    # new-modulus ingest lands alongside the legacy files
    t2.merge(spark.range(3000, 6000).selectExpr(
        "id AS k", "concat(uuid(), uuid()) AS v", "id AS ver"))
    t3 = LakeTable.load(spark, root)
    mods = {t3._file_mod(f) for f in t3.manifest["files"]}
    assert mods == {2, 4}, "test precondition: mixed moduli present"
    st = t3.stats()
    assert st["n_over_cap_buckets"] == 0, st
    assert "rebucket_suggested_n" not in st, st
