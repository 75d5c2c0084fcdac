"""Round-5 incremental-maintenance review fixes (incdedup / annindex).

- dedup_sync: an unreadable change window (mutation snapshot from
  purge/update, or expired retention) falls back to a FULL REFRESH —
  previously every later tick re-raised ValueError forever, wedging the
  in-loop pipeline maintenance.
- dedup_sync: an upserted doc whose new text yields no shingles (shorter
  than SHINGLE_K) tombstones its old signature; leaving the stale digest
  live would keep its old pairs valid forever and diverge from a batch
  run on the final corpus.
- ann_index_sync: same full-refresh fallback, whose index anti-join also
  retires every posting the rebuild does not reassert.
- ann_index_sync: a crash between the index merge and the vecs merge
  (fence asymmetry), with the source advancing before the retry, used to
  leave GHOST postings at the crashed tick's buckets; the retry now
  reconciles them exactly from the same changes() window.
- ann_index_sync bootstrap: no vecs.lookup over the whole corpus (the
  old-bucket fetch is skipped when the index is known empty).
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from cds_spark.lake.table import LakeTable
from cds_spark.operators.annindex import ann_index_sync, ann_topk
from cds_spark.operators.incdedup import dedup_sync, live_pairs
from cds_spark.operators.similarity import _bucket_expr, lsh_bucketed_topk
from cds_spark.operators.textdedup import minhash_lsh_pairs

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("ver", T.LongType()),
])

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("ver", T.LongType()),
])

BASE = ("the quick brown fox jumps over the lazy dog while reading spark "
        "plans and tuning shuffle partitions for a copy on write merge ")


def _docs_src(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "docs"), DOC_SCHEMA, pk=["doc_id"],
        version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "upsert"})


def _doc_rows(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA).withColumn(
        "_is_delete", F.lit(False))


def _batch_pairs(src):
    docs = src.current().select("doc_id", "text")
    return {(r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(docs).collect()}


def _live_pairs(spark, dst):
    s = LakeTable.load(spark, str(dst / "sigs"))
    p = LakeTable.load(spark, str(dst / "pairs"))
    return {(r.doc_a, r.doc_b): r.jaccard
            for r in live_pairs(s, p).collect()}


def test_dedup_sync_full_refresh_after_purge(spark, tmp_path):
    """purge_where makes changes() raise across the mutation snapshot;
    the tick must full-refresh (refreshed=True), converge to the batch
    result on the final corpus, and retire the purged doc's signature."""
    src = _docs_src(spark, tmp_path)
    dst = tmp_path / "dd"
    src.merge(_doc_rows(spark, [
        ("a", BASE + "alpha", 1), ("b", BASE + "bravo", 1),
        ("c", "an entirely different document about iceberg manifests "
              "and zone map pruning strategies for bucketed tables", 1),
    ]), fence=("i", 1))
    r1 = dedup_sync(spark, src.root, str(dst), "dj")
    assert not r1["skipped"] and not r1["refreshed"]
    assert _live_pairs(spark, dst) == _batch_pairs(src)
    assert ("a", "b") in _live_pairs(spark, dst)

    src = LakeTable.load(spark, src.root)
    src.purge_where("doc_id = 'b'")
    src = LakeTable.load(spark, src.root)
    with pytest.raises(ValueError):
        src.changes(1, src.version)
    r2 = dedup_sync(spark, src.root, str(dst), "dj")
    assert r2["refreshed"] and not r2["skipped"]
    assert _live_pairs(spark, dst) == _batch_pairs(src) == {}
    sigs = LakeTable.load(spark, str(dst / "sigs"))
    live_ids = {r.doc_id for r in sigs.current().select("doc_id").collect()}
    assert live_ids == {"a", "c"}, live_ids

    # the loop keeps ticking incrementally after the refresh
    src.merge(_doc_rows(spark, [("d", BASE + "delta", 3)]), fence=("i", 3))
    src = LakeTable.load(spark, src.root)
    r3 = dedup_sync(spark, src.root, str(dst), "dj")
    assert not r3["refreshed"] and not r3["skipped"]
    assert _live_pairs(spark, dst) == _batch_pairs(src)


def test_dedup_sync_no_shingle_update_retires_signature(spark, tmp_path):
    """Updating a doc's text to something shorter than SHINGLE_K must
    tombstone its signature and invalidate its pairs — a batch run on the
    final corpus never sees the doc, so neither may the increment."""
    src = _docs_src(spark, tmp_path)
    dst = tmp_path / "dd"
    src.merge(_doc_rows(spark, [
        ("a", BASE + "alpha", 1), ("b", BASE + "bravo", 1),
    ]), fence=("i", 1))
    dedup_sync(spark, src.root, str(dst), "dj")
    assert ("a", "b") in _live_pairs(spark, dst)

    src = LakeTable.load(spark, src.root)
    src.merge(_doc_rows(spark, [("b", "x", 2)]), fence=("i", 2))
    src = LakeTable.load(spark, src.root)
    dedup_sync(spark, src.root, str(dst), "dj")
    assert _live_pairs(spark, dst) == _batch_pairs(src) == {}
    sigs = LakeTable.load(spark, str(dst / "sigs"))
    live_ids = {r.doc_id for r in sigs.current().select("doc_id").collect()}
    assert live_ids == {"a"}, live_ids


SF = "/root/testdata/sf0.001"


def _emb_src(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "emb"), EMB_SCHEMA, pk=["vec_id"],
        version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "upsert"})


def _corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding")


def _distinct_bucket_embeddings(spark, n=3):
    """n corpus embeddings whose LSH buckets are pairwise distinct."""
    rows = (_corpus(spark)
            .withColumn("b", _bucket_expr(F.col("embedding"), 64))
            .dropDuplicates(["b"]).limit(n).collect())
    assert len(rows) == n
    return [(list(r.embedding), int(r.b)) for r in rows]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ann_ghost_postings_reconciled_after_crash_between_merges(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER index.merge (fenced at v2) but BEFORE vecs.merge, then
    the vector moves again before the retry: the crashed tick's posting
    sits at a bucket neither the old-bucket lookup (vecs still at v1
    state) nor the new upsert touches. The retry must detect the fence
    asymmetry and tombstone the interim bucket — serving afterwards
    equals a batch run on the final corpus."""
    (e1, b1), (e2, b2), (e3, b3) = _distinct_bucket_embeddings(spark)
    src = _emb_src(spark, tmp_path)
    dst = str(tmp_path / "ann")
    bg = (_corpus(spark).filter(F.col("vec_id") < 40)
          .withColumn("ver", F.lit(1).cast("long")))
    src.merge(bg.unionByName(spark.createDataFrame(
        [(-1, e1, 1)], EMB_SCHEMA)), fence=("i", 1))
    assert not ann_index_sync(spark, src.root, dst, "aj")["skipped"]

    src = LakeTable.load(spark, src.root)
    src.merge(spark.createDataFrame([(-1, e2, 2)], EMB_SCHEMA),
              fence=("i", 2))
    src = LakeTable.load(spark, src.root)

    orig = LakeTable.merge
    state = {"armed": True}

    def crashing(self, df, fence=None, **kw):
        if state["armed"] and self.root.rstrip("/").endswith("/vecs"):
            state["armed"] = False
            raise RuntimeError("injected crash between index and vecs merge")
        return orig(self, df, fence=fence, **kw)

    monkeypatch.setattr(LakeTable, "merge", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        ann_index_sync(spark, src.root, dst, "aj")
    monkeypatch.setattr(LakeTable, "merge", orig)

    # fence asymmetry on disk: index advanced, vecs (the cursor) did not
    index_t = LakeTable.load(spark, f"{dst}/index")
    vecs_t = LakeTable.load(spark, f"{dst}/vecs")
    assert (int(index_t.properties["fence.aj"])
            > int(vecs_t.properties["fence.aj"]))

    # source advances again before the retry -> the v2 posting is a ghost
    src.merge(spark.createDataFrame([(-1, e3, 3)], EMB_SCHEMA),
              fence=("i", 3))
    src = LakeTable.load(spark, src.root)
    r = ann_index_sync(spark, src.root, dst, "aj")
    assert r["reconciled"] and not r["refreshed"]

    index_t = LakeTable.load(spark, f"{dst}/index")
    mine = [(int(x.bucket),) for x in index_t.current()
            .filter(F.col("vec_id") == -1).select("bucket").collect()]
    assert mine == [(b3,)], f"expected only bucket {b3}, got {mine} " \
                            f"(ghost at {b2}? old at {b1}?)"

    q = (src.current().filter(F.col("vec_id").isin(5, 6, 7))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv")))
    got = ann_topk(spark, dst, q, k=10)
    want = (lsh_bucketed_topk(src.current().select("vec_id", "embedding"),
                              n_queries=8)
            .filter(F.col("query_id").isin(5, 6, 7)))
    assert _rows(got) == _rows(want)


def test_ann_full_refresh_after_purge(spark, tmp_path):
    """An unreadable change window (purge mutation) must full-refresh the
    index instead of wedging, retiring postings of purged vectors."""
    src = _emb_src(spark, tmp_path)
    dst = str(tmp_path / "ann")
    src.merge(_corpus(spark).filter(F.col("vec_id") < 40)
              .withColumn("ver", F.lit(1).cast("long")), fence=("i", 1))
    ann_index_sync(spark, src.root, dst, "aj")

    src = LakeTable.load(spark, src.root)
    src.purge_where("vec_id < 5")
    src = LakeTable.load(spark, src.root)
    r = ann_index_sync(spark, src.root, dst, "aj")
    assert r["refreshed"] and not r["skipped"]

    index_t = LakeTable.load(spark, f"{dst}/index")
    live = {int(x.vec_id) for x in
            index_t.current().select("vec_id").collect()}
    assert live == {int(x.vec_id) for x in
                    src.current().select("vec_id").collect()}
    q = (src.current().filter(F.col("vec_id").isin(5, 6, 7))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qv")))
    got = ann_topk(spark, dst, q, k=10)
    want = (lsh_bucketed_topk(src.current().select("vec_id", "embedding"),
                              n_queries=8)
            .filter(F.col("query_id").isin(5, 6, 7)))
    assert _rows(got) == _rows(want)


def test_ann_bootstrap_never_lookups_empty_vecs(spark, tmp_path,
                                                monkeypatch):
    """The bootstrap tick must not route the whole corpus through
    vecs.lookup (a driver-side key collect against a table known to be
    empty)."""
    src = _emb_src(spark, tmp_path)
    src.merge(_corpus(spark).filter(F.col("vec_id") < 40)
              .withColumn("ver", F.lit(1).cast("long")), fence=("i", 1))

    orig = LakeTable.lookup

    def guarded(self, *a, **kw):
        if self.root.rstrip("/").endswith("/vecs"):
            raise AssertionError("bootstrap must not call vecs.lookup")
        return orig(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "lookup", guarded)
    r = ann_index_sync(spark, src.root, str(tmp_path / "ann"), "aj")
    assert not r["skipped"]
