"""Non-PK zone maps (``stats_cols`` property), ``scan_where`` and
``changed_since`` (cds_spark/lake/table.py).

The ClickHouse ``minmax`` skip-index analog plus the CDC-specific read it
enables: ``changed_since(T)`` serves "current state of keys changed since
T" by pruning every file whose leading-version zone-max < T — sound across
merge generations because the LWW winner carries the key's maximum
version. Batch files span narrow version slices, so the read is O(recent
batches) at any table size. Reference analog: consumers tail the Kafka
topic for recency (cmd/rtu/handle/insert.go); here the table itself
answers."""

import datetime
import sys
from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cds_spark.lake.table import LakeTable, _stat_encode  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("val", T.StringType()),
    ]
)

DAY0 = datetime.datetime(2024, 1, 1)


def _day(n, off_hours=0):
    return DAY0 + datetime.timedelta(days=n, hours=off_hours)


def _mk(spark, root, n_batches=4, keys=200):
    """One merge per 'day': every batch rewrites ALL keys with that day's
    ts (multi-generation buckets, no compact) — the natural CDC shape
    where each batch file spans one narrow time slice."""
    table = LakeTable.create(
        spark, root, SCHEMA, pk=["id"], version_cols=["ts", "_offset"],
        n_buckets=4,
        properties={"merge_mode": "append", "stats_cols": ["ts"]},
    )
    for d in range(n_batches):
        batch = spark.range(keys).select(
            F.col("id"),
            (F.lit(_day(d)) + F.make_interval(mins=F.col("id") % 60)).alias("ts"),
            F.concat(F.lit(f"d{d}-"), F.col("id")).alias("val"),
        )
        table.merge(batch, fence=("sw", d))
    return table


def test_stats_cols_stamped_and_encoded(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t"))
    for f in table.manifest["files"]:
        st = f.get("stats") or {}
        assert "id" in st and "ts" in st, f
        lo, hi = st["ts"]
        assert isinstance(lo, int) and isinstance(hi, int)  # UTC micros
    # encoding round-trip: the earliest batch's min is day 0
    lo_all = min(f["stats"]["ts"][0] for f in table.manifest["files"])
    assert lo_all == _stat_encode(_day(0))


def test_changed_since_prunes_history_and_stays_exact(spark, tmp_path):
    table = _mk(spark, str(tmp_path / "t2"))
    since = _day(3)  # only the last batch qualifies
    got = table.changed_since(since)
    rows = {r["id"]: (r["ts"], r["val"]) for r in got.collect()}
    # every key's winner is the day-3 rewrite -> ALL keys, day-3 values
    assert len(rows) == 200
    assert all(v.startswith("d3-") for _, v in rows.values())
    # pruning: batches 0-2 (zone max < since) are never opened, even
    # though every bucket is dirty (4 generations)
    read = set(got.inputFiles())
    root = str(tmp_path / "t2")
    enc = _stat_encode(since)
    for p in read:
        rel = p.split(root + "/", 1)[1]
        ent = next(f for f in table.manifest["files"] if f["path"] == rel)
        assert not (ent["stats"]["ts"][1] < enc), ent
    assert 0 < len(read) < len(table.manifest["files"])

    # mid-range cutoff: keys NOT changed since stay out; changed keys show
    # their CURRENT row even though their old generations were pruned
    upd = spark.createDataFrame(
        [(7, _day(10), "fresh-7"), (9, _day(10), "fresh-9")], SCHEMA
    )
    table.merge(upd, fence=("sw", 10))
    got2 = table.changed_since(_day(5))
    assert {(r["id"], r["val"]) for r in got2.collect()} == {
        (7, "fresh-7"), (9, "fresh-9")
    }


def test_changed_since_tombstones_and_oracle_parity(spark, tmp_path):
    """Winner-is-a-tombstone keys disappear from the live read; the whole
    result equals the unpruned oracle (full read + filter)."""
    table = _mk(spark, str(tmp_path / "t3"), n_batches=3)
    dels = spark.range(0, 50).select(
        F.col("id"), F.lit(_day(6)).cast("timestamp").alias("ts"),
        F.lit(None).cast("string").alias("val"),
        F.lit(True).alias("_is_delete"),
    )
    table.merge(dels, fence=("sw", 20))
    since = _day(2)
    got = sorted(
        (r["id"], r["val"]) for r in table.changed_since(since).collect()
    )
    oracle = sorted(
        (r["id"], r["val"])
        for r in table.read().filter(F.col("ts") >= F.lit(since)).collect()
    )
    assert got == oracle
    assert all(i >= 50 for i, _ in got)  # deleted keys gone


def test_changed_since_tied_leading_version_uses_tiebreak(spark, tmp_path):
    """Two generations share the winner's leading version (same ts) and
    differ only in the tiebreaker — both are at-or-after the cutoff so
    both files are kept, and the tiebreak still picks the later one."""
    root = str(tmp_path / "t4")
    table = LakeTable.create(
        spark, root, SCHEMA, pk=["id"], version_cols=["ts", "_offset"],
        n_buckets=2,
        properties={"merge_mode": "append", "stats_cols": ["ts"]},
    )
    a = spark.createDataFrame([(1, _day(1), "first")], SCHEMA).withColumn(
        "_offset", F.lit(10).cast("long"))
    b = spark.createDataFrame([(1, _day(1), "second")], SCHEMA).withColumn(
        "_offset", F.lit(20).cast("long"))
    table.merge(a, fence=("tb", 0))
    table.merge(b, fence=("tb", 1))
    got = table.changed_since(_day(1)).collect()
    assert [(r["id"], r["val"]) for r in got] == [(1, "second")]


def test_scan_where_conservative_on_dirty_buckets(spark, tmp_path):
    """scan_where (general non-PK range) must NOT resurrect stale rows:
    a key whose CURRENT ts is outside the window but whose OLD generation
    is inside must stay out — dirty buckets read everything."""
    table = _mk(spark, str(tmp_path / "t5"), n_batches=2)  # gen d0, d1
    # window covers day 0 only; every key's winner is day 1 -> empty
    got = table.scan_where("ts", _day(0), _day(0, 23))
    assert got.count() == 0
    # after compact (single generation) the same window is empty too,
    # and a window over day 1 returns all current rows with pruning legal
    table.compact(strategy="local")
    t2 = LakeTable.load(spark, str(tmp_path / "t5"))
    assert t2.scan_where("ts", _day(0), _day(0, 23)).count() == 0
    got2 = t2.scan_where("ts", _day(1), _day(1, 23))
    assert got2.count() == 200
    rows = sorted((r["id"], r["val"]) for r in got2.collect())
    assert rows == [(i, f"d1-{i}") for i in range(200)]


def test_cluster_by_compact_tightens_scan_where_pruning(spark, tmp_path):
    """cluster_by: the per-bucket Arrow compact re-sorts each collapsed
    bucket by the named column before chunking, so chunk files carry
    DISJOINT value ranges and scan_where reads strictly fewer files than
    on the same data compacted un-clustered — with identical results.
    (The Iceberg sort-order / ClickHouse ORDER BY analog.)"""
    VSCHEMA = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("ver", T.LongType()),
        T.StructField("c", T.LongType()),
        T.StructField("val", T.StringType()),
    ])

    def mk(root, extra_props):
        t = LakeTable.create(
            spark, root, VSCHEMA, pk=["id"], version_cols=["ver"],
            n_buckets=2,
            properties={"merge_mode": "append", "stats_cols": ["c"],
                        # tiny target files -> many chunks per bucket, so
                        # per-chunk zone maps have something to prune
                        "target_file_bytes": str(16 * 1024), **extra_props},
        )
        # c is hash-scattered: un-clustered chunks all span ~the full c
        # range; clustered chunks become disjoint slices
        data = spark.range(20_000).select(
            F.col("id"), F.lit(1).cast("long").alias("ver"),
            F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("c"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
        )
        t.merge(data, fence=("cl", 0))
        t.compact(purge_tombstones=True)
        return t

    plain = mk(str(tmp_path / "plain"), {})
    clustered = mk(str(tmp_path / "clustered"), {"cluster_by": "c"})

    lo, hi = 10_000, 20_000  # ~10% of the c domain
    got_p = plain.scan_where("c", lo, hi)
    got_c = clustered.scan_where("c", lo, hi)
    rows_p = sorted((r["id"], r["c"]) for r in got_p.collect())
    rows_c = sorted((r["id"], r["c"]) for r in got_c.collect())
    assert rows_c == rows_p and len(rows_c) > 100
    n_files_p = len(got_p.inputFiles())
    n_files_c = len(got_c.inputFiles())
    total_c = len(clustered.manifest["files"])
    assert total_c >= 8, f"need multi-chunk buckets, got {total_c}"
    assert n_files_c < n_files_p, (n_files_c, n_files_p)
    # disjoint slices: ~10% of the domain should touch a small minority
    # of the clustered chunks
    assert n_files_c <= max(2, total_c // 3), (n_files_c, total_c)
