"""Incremental near-dup maintenance (operators/incdedup.py): discovery via
O(delta) increments must equal a batch MinHash-LSH run over the final live
corpus — through adds, text updates (pair invalidation + re-discovery) and
deletes — and the cursor/fence discipline must make re-runs no-ops.
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from cds_spark.lake.table import LakeTable
from cds_spark.operators.incdedup import dedup_sync, live_pairs
from cds_spark.operators.textdedup import minhash_lsh_pairs

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("ver", T.LongType()),
])

BASE_A = ("the quick brown fox jumps over the lazy dog while reading spark "
          "plans and tuning shuffle partitions for a copy on write merge ")
BASE_B = ("iceberg manifests carry zone maps and bloom filter sidecars so "
          "point lookups skip every unrelated data file in the bucket ")


def _mk_src(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "docs"), DOC_SCHEMA, pk=["doc_id"],
        version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "upsert"},
    )


def _rows(spark, rows, deletes=()):
    df = spark.createDataFrame(rows, DOC_SCHEMA).withColumn(
        "_is_delete", F.lit(False))
    if deletes:
        dels = spark.createDataFrame(
            [(d, None, v) for d, v in deletes], DOC_SCHEMA
        ).withColumn("_is_delete", F.lit(True))
        df = df.unionByName(dels)
    return df


def _batch(src):
    docs = src.current().select("doc_id", "text")
    return {(r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(docs).collect()}


def _live(spark, dst):
    s = LakeTable.load(spark, str(dst / "sigs"))
    p = LakeTable.load(spark, str(dst / "pairs"))
    return {(r.doc_a, r.doc_b): r.jaccard
            for r in live_pairs(s, p).collect()}


def test_incremental_dedup_equals_batch_through_add_update_delete(
    spark, tmp_path
):
    src = _mk_src(spark, tmp_path)
    dst = tmp_path / "dd"

    # ---- tick 1: bootstrap. d1~d2 near-dup; d3, d5 singles
    src.merge(_rows(spark, [
        ("d1", BASE_A + "alpha", 1),
        ("d2", BASE_A + "beta", 1),
        ("d3", BASE_B + "gamma", 1),
        ("d5", "totally unrelated tiny text about nothing in particular", 1),
    ]), fence=("ing", 1))
    res = dedup_sync(spark, src.root, str(dst), "dd-job")
    assert not res["skipped"]
    want = _batch(src)
    assert ("d1", "d2") in want          # the corpus really has a near-dup
    assert _live(spark, dst) == want

    # ---- tick 2: add d4 (near-dup of d3), update d2 away from d1
    # (invalidates the d1-d2 pair), delete d5
    src = LakeTable.load(spark, src.root)
    src.merge(_rows(spark, [
        ("d4", BASE_B + "delta tail", 2),
        ("d2", "rewritten completely: this text no longer resembles d1 at "
               "all and talks about watermarks in structured streaming", 2),
    ], deletes=[("d5", 2)]), fence=("ing", 2))
    res = dedup_sync(spark, src.root, str(dst), "dd-job")
    assert not res["skipped"] and res["from"] > 0
    want = _batch(src)
    assert ("d3", "d4") in want          # discovered incrementally
    assert ("d1", "d2") not in want      # broken by the update
    assert _live(spark, dst) == want

    # ---- tick 3: nothing changed -> fence-skipped no-op
    res = dedup_sync(spark, src.root, str(dst), "dd-job")
    assert res["skipped"]
    assert _live(spark, dst) == want


def test_incremental_rediscovery_after_update_back(spark, tmp_path):
    """An update that breaks a pair then an update that re-forms it: the
    pair must disappear and come back with fresh signature digests."""
    src = _mk_src(spark, tmp_path)
    dst = tmp_path / "dd"
    src.merge(_rows(spark, [
        ("a", BASE_A + "one", 1), ("b", BASE_A + "two", 1)]), fence=("i", 1))
    dedup_sync(spark, src.root, str(dst), "j")
    assert ("a", "b") in _live(spark, dst)

    src = LakeTable.load(spark, src.root)
    src.merge(_rows(spark, [("b", "entirely different words now", 2)]),
              fence=("i", 2))
    dedup_sync(spark, src.root, str(dst), "j")
    assert _live(spark, dst) == _batch(src) and ("a", "b") not in _live(spark, dst)

    src = LakeTable.load(spark, src.root)
    src.merge(_rows(spark, [("b", BASE_A + "three", 3)]), fence=("i", 3))
    dedup_sync(spark, src.root, str(dst), "j")
    live = _live(spark, dst)
    assert ("a", "b") in live
    assert live == _batch(src)


def test_dedup_sync_composite_pk(spark, tmp_path):
    """A (repo, path)-keyed table — the flagship CDC schema — dedups with
    a concat identity; partner texts are fetched through src.lookup using
    the PK tuples carried in the signature rows."""
    from cds_spark.operators.incdedup import UNIT_SEP

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ver", T.LongType()),
    ])
    src = LakeTable.create(
        spark, str(tmp_path / "multi"), schema, pk=["repo", "path"],
        version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "upsert"})
    src.merge(spark.createDataFrame([
        ("r1", "a.py", BASE_A + "one", 1),
        ("r2", "b.py", BASE_A + "two", 1),
        ("r1", "c.py", "nothing like the others at all", 1),
    ], schema), fence=("i", 1))
    dst = tmp_path / "dd"
    dedup_sync(spark, src.root, str(dst), "j")
    # second increment: the near-dup partner arrives later, found via the
    # delta-vs-corpus band join + lookup fetch of the r1/a.py text
    src = LakeTable.load(spark, src.root)
    src.merge(spark.createDataFrame(
        [("r3", "d.py", BASE_A + "three", 2)], schema), fence=("i", 2))
    dedup_sync(spark, src.root, str(dst), "j")
    live = _live(spark, dst)
    docs = src.current().select(
        F.concat_ws(UNIT_SEP, "repo", "path").alias("doc_id"), "text")
    want = {(r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(docs).collect()}
    assert live == want
    assert any("r3" in a or "r3" in b for a, b in live)


def test_cli_dedup_sync(spark, tmp_path, capsys):
    import json

    from cds_spark.cli import main

    src = _mk_src(spark, tmp_path)
    src.merge(_rows(spark, [
        ("x", BASE_A + "one", 1), ("y", BASE_A + "two", 1)]), fence=("i", 1))
    dd = str(tmp_path / "dd")
    rc = main(["dedup-sync", "--root", dd, "--src-root", src.root,
               "--job-id", "c"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and not out["skipped"] and out["pairs_written"] >= 1
    rc = main(["dedup-sync", "--root", dd, "--src-root", src.root,
               "--job-id", "c"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["skipped"]
    assert ("x", "y") in _live(spark, tmp_path / "dd")


def test_prune_stale_pairs_keeps_live_view(spark, tmp_path):
    """The discovery log accumulates rows invalidated by updates; pruning
    rewrites it to the live-valid rows with live_pairs() unchanged."""
    from cds_spark.operators.incdedup import prune_stale_pairs

    src = _mk_src(spark, tmp_path)
    dst = tmp_path / "dd"
    src.merge(_rows(spark, [
        ("a", BASE_A + "one", 1), ("b", BASE_A + "two", 1)]), fence=("i", 1))
    dedup_sync(spark, src.root, str(dst), "j")
    src = LakeTable.load(spark, src.root)
    src.merge(_rows(spark, [("b", "no resemblance anymore at all", 2)]),
              fence=("i", 2))
    dedup_sync(spark, src.root, str(dst), "j")
    before = _live(spark, dst)
    assert ("a", "b") not in before
    pairs_t = LakeTable.load(spark, str(dst / "pairs"))
    assert pairs_t.current().count() > len(before)   # the stale a-b row
    res = prune_stale_pairs(spark, str(dst))
    assert res["pruned"] >= 1
    assert _live(spark, dst) == before
    assert LakeTable.load(spark, str(dst / "pairs")).current().count() == len(before)


def test_pipeline_inloop_dedup(spark, tmp_path):
    """JobSpec.dedup_every_batches: the sync loop itself keeps the near-dup
    index current — after the stream drains, the index equals a batch
    MinHash run over the synced table and the lineage records the ticks."""
    import json as _json

    from cds_spark.operators.incdedup import UNIT_SEP, live_pairs
    from cds_spark.sources.feed import REPO_SCHEMA, change_feed, write_feed_files
    from cds_spark.streaming.pipeline import IncrementalSync, JobSpec

    feed = change_feed(spark, 1200, n_repos=8, paths_per_repo=12, seed=5)
    topic = str(tmp_path / "topic")
    write_feed_files(feed, topic, 4)
    LakeTable.create(
        spark, str(tmp_path / "repos"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=8)
    spec = JobSpec(
        job_id="j", table_root=str(tmp_path / "repos"), source_dir=topic,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=2,
        dedup_dst=str(tmp_path / "dd"), dedup_every_batches=1,
        dedup_text_col="content")
    IncrementalSync(spark, spec).run_available()
    t = LakeTable.load(spark, str(tmp_path / "repos"))
    sigs = LakeTable.load(spark, str(tmp_path / "dd" / "sigs"))
    pairs = LakeTable.load(spark, str(tmp_path / "dd" / "pairs"))
    # every live doc is signed, deleted docs are not
    assert sigs.current().count() == t.current().count()
    live = {(r.doc_a, r.doc_b): r.jaccard
            for r in live_pairs(sigs, pairs).collect()}
    docs = t.current().select(
        F.concat_ws(UNIT_SEP, "repo", "path").alias("doc_id"),
        F.col("content").alias("text"))
    want = {(r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(docs).collect()}
    assert live == want
    recs = [_json.loads(l) for l in open(t.root + "/_lineage/j.jsonl")]
    ticks = [r["dedup"] for r in recs if r.get("dedup")]
    assert ticks and all(not d["skipped"] for d in ticks)
