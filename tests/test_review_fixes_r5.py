"""Round-5 review fixes.

- stats() withholds the rebucket suggestion in the ALL-legacy state right
  after rebucket-begin (previously only when two moduli coexisted), so
  auto_rebucket resumes the in-flight migration instead of escalating.
- keyset_page on a temporal leading PK: the stats-derived cutoff decodes
  back into the column domain before the row filter (encoded int vs
  timestamp column would not resolve), and the served page is not left
  cached (no persist leak per page).
- auto_rebucket clamps by halving so the target stays a power-of-two
  multiple of the current modulus (min() could land on a modulus sharing
  no factor with n_buckets, degrading every mid-migration read).
- dedup_sync / ann_index_sync bootstrap is create-if-missing per table: a
  crash between the two creates no longer bricks every later tick.
"""
import datetime
import json
import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from cds_spark.lake.table import LakeTable, _stat_decode_lit, _stat_encode


def test_stats_withholds_hint_right_after_rebucket_begin(spark, tmp_path):
    """After rebucket-begin (or a crash before the first rewrite) EVERY
    file carries one legacy modulus != n_buckets; stats() must treat that
    as an in-flight rebucket and withhold rebucket_suggested_n — emitting
    it would make auto_rebucket escalate the modulus on every resume."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / "mb")
    t = LakeTable.create(
        spark, root, schema, pk=["k"], version_cols=["ver"], n_buckets=2,
        properties={"merge_mode": "append",
                    "local_compact_max_bucket_bytes": 1_000},
    )
    t.merge(spark.range(0, 2000).selectExpr(
        "id AS k", "concat('v', id) AS v", "id AS ver"))
    st = t.stats()
    assert st["n_over_cap_buckets"] > 0 and st.get("rebucket_suggested_n")
    # replicate exactly phase 1 of rebucket(): stamp mods, flip n_buckets
    m = t._next_manifest({"operation": "rebucket-begin",
                          "from_buckets": 2, "to_buckets": 8})
    for f in m["files"]:
        f.setdefault("mod", 2)
    m["n_buckets"] = 8
    t._commit(m)
    st2 = LakeTable.load(spark, root).stats()
    assert "rebucket_suggested_n" not in st2, st2
    assert "in progress" in (st2.get("rebucket_hint") or "")


def test_keyset_page_timestamp_pk_bounded_slice(spark, tmp_path):
    """A timestamp leading PK must survive the bounded-slice page path:
    the cutoff comes from the encoded stats domain (UTC microseconds) and
    must be decoded back before the row filter. Also: the served page
    must not be left cached."""
    schema = T.StructType([
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("payload", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / "tspage")
    t = LakeTable.create(
        spark, root, schema, pk=["ts"], version_cols=["ver"], n_buckets=2,
        properties={"merge_mode": "upsert", "target_file_bytes": 4_000},
    )
    rows = spark.range(0, 4000).selectExpr(
        "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts",
        "repeat(concat('p', id), 5) AS payload",
        "id AS ver",
    )
    t.merge(rows)
    t.compact()
    t = LakeTable.load(spark, root)
    after = datetime.datetime(2024, 3, 1, 0, 10, 0)
    # the bounded-slice path must actually engage for this layout
    sl = t._page_file_slice(t.manifest["files"], "ts", after, 150)
    assert sl is not None, "layout did not produce a bounded slice; test is vacuous"
    page = t.keyset_page(after, 50)
    got = [(r.ts, r.payload) for r in page.collect()]
    exp = [(r.ts, r.payload) for r in
           t.current().filter(F.col("ts") > F.lit(after))
            .orderBy("ts").limit(50).collect()]
    assert got == exp and len(got) == 50
    assert not page.storageLevel.useMemory, "served page left cached"


def test_stat_decode_lit_roundtrips_temporal(spark):
    d = datetime.date(2024, 1, 5)
    ts = datetime.datetime(2024, 1, 5, 6, 7, 8, 123456,
                           tzinfo=datetime.timezone.utc)
    row = spark.range(1).select(
        _stat_decode_lit(T.DateType(), _stat_encode(d)).alias("d"),
        _stat_decode_lit(T.TimestampType(), _stat_encode(ts)).alias("ts"),
        _stat_decode_lit(T.LongType(), _stat_encode(7)).alias("i"),
    ).first()
    assert row.d == d
    assert row.ts.replace(tzinfo=datetime.timezone.utc) == ts
    assert row.i == 7


def test_cli_cursor_parser_temporal():
    from cds_spark.cli import _parse_into_column_domain

    assert _parse_into_column_domain("timestamp", "2024-03-01T00:10:00") == \
        datetime.datetime(2024, 3, 1, 0, 10, 0)
    assert _parse_into_column_domain("date", "2024-03-01") == \
        datetime.date(2024, 3, 1)
    assert _parse_into_column_domain("long", "42") == 42
    assert _parse_into_column_domain("string", "abc") == "abc"


def test_auto_rebucket_clamp_stays_power_of_two_multiple(spark, tmp_path):
    """When the suggested modulus exceeds auto_rebucket_max_n, the clamp
    must HALVE (staying n_buckets * 2^k) rather than min() to the cap —
    with n_buckets=3 and max_n=8 the target must land on 6, never 8."""
    from cds_spark.streaming.pipeline import IncrementalSync, JobSpec
    from cds_spark.sources.feed import (REPO_SCHEMA, change_feed,
                                        write_feed_files)

    feed = change_feed(spark, 1500, n_repos=10, paths_per_repo=20, seed=7)
    topic = str(tmp_path / "topic")
    write_feed_files(feed, topic, 2)
    LakeTable.create(
        spark, str(tmp_path / "repos"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=3,
        properties={"local_compact_max_bucket_bytes": 2_000},
    )
    spec = JobSpec(job_id="cl", table_root=str(tmp_path / "repos"),
                   source_dir=topic, checkpoint_dir=str(tmp_path / "ckpt"),
                   max_files_per_trigger=1, merge_mode="append",
                   maintenance_every_batches=1, compact_max_generations=1,
                   auto_rebucket=True, auto_rebucket_max_n=8)
    IncrementalSync(spark, spec).run_available()
    t = LakeTable.load(spark, str(tmp_path / "repos"))
    assert t.n_buckets == 6, t.n_buckets
    assert t.n_buckets % 3 == 0


def _doc_table(spark, tmp_path, name="docs"):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    root = str(tmp_path / name)
    t = LakeTable.create(spark, root, schema, pk=["doc_id"],
                         version_cols=["ver"], n_buckets=4)
    docs = spark.range(0, 60).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(0, 30), "
        "  j -> concat('w', pmod(id, 5), '-', j))) AS text",
        "id AS ver",
    )
    t.merge(docs)
    return root


def test_dedup_sync_half_created_dst_recovers(spark, tmp_path):
    """Crash between the sigs and pairs creates: sigs exists (empty, no
    fence), pairs missing. The next tick must create pairs and complete —
    and produce the same result as an unbroken bootstrap."""
    from cds_spark.operators.incdedup import (_sig_schema, dedup_sync,
                                              live_pairs)

    src_root = _doc_table(spark, tmp_path)
    src = LakeTable.load(spark, src_root)
    pk_fields = [f for f in src.schema.fields if f.name == "doc_id"]
    # simulate the half-created destination
    half = str(tmp_path / "half")
    LakeTable.create(
        spark, os.path.join(half, "sigs"),
        _sig_schema(T.LongType(), pk_fields), pk=["doc_id"],
        version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "append"})
    res = dedup_sync(spark, src_root, half, "j1", text_col="text")
    assert not res["skipped"] and res["applied"] > 0

    clean = str(tmp_path / "clean")
    dedup_sync(spark, src_root, clean, "j1", text_col="text")

    def pairs_of(root):
        s = LakeTable.load(spark, os.path.join(root, "sigs"))
        p = LakeTable.load(spark, os.path.join(root, "pairs"))
        return sorted((r.doc_a, r.doc_b, r.jaccard)
                      for r in live_pairs(s, p).collect())

    assert pairs_of(half) == pairs_of(clean) and pairs_of(half)


def test_ann_index_sync_half_created_dst_recovers(spark, tmp_path):
    """Same crash shape for the ANN index: vecs exists, index missing."""
    from cds_spark.operators.annindex import (_vecs_schema, ann_index_sync,
                                              ann_topk)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("ver", T.LongType()),
    ])
    src_root = str(tmp_path / "vecsrc")
    t = LakeTable.create(spark, src_root, schema, pk=["vec_id"],
                         version_cols=["ver"], n_buckets=4)
    vecs = spark.range(0, 50).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 7), j -> cast(sin(id * 0.7 + j) AS float))"
        " AS embedding",
        "id AS ver",
    )
    t.merge(vecs)

    half = str(tmp_path / "annhalf")
    LakeTable.create(
        spark, os.path.join(half, "vecs"), _vecs_schema(T.LongType()),
        pk=["vec_id"], version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "append"})
    res = ann_index_sync(spark, src_root, half, "j1", dim=8)
    assert not res["skipped"] and res["applied"] > 0

    clean = str(tmp_path / "annclean")
    ann_index_sync(spark, src_root, clean, "j1", dim=8)
    q = spark.range(3, 6).selectExpr(
        "id AS query_id",
        "transform(sequence(0, 7), j -> cast(sin(id * 0.7 + j) AS float))"
        " AS qv")

    def topk(root):
        return sorted(
            (r.query_id, r.neighbor_id, r.cos_sim)
            for r in ann_topk(spark, root, q, k=3, dim=8).collect())

    assert topk(half) == topk(clean) and topk(half)
