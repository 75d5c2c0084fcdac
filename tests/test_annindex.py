"""Incremental ANN index (operators/annindex.py): maintaining the
hyperplane-LSH index as vectors arrive / move buckets / vanish must serve
answers equal to a batch lsh_bucketed_topk over the final corpus, and the
serving scan must be file-pruned to the probe buckets.
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from cds_spark.lake.table import LakeTable
from cds_spark.operators.annindex import ann_index_sync, ann_topk
from cds_spark.operators.similarity import (
    LSH_BITS, lsh_bucketed_topk, lsh_bucketed_topk_multiprobe,
)

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("ver", T.LongType()),
])

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding")


def _mk_src(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "emb"), EMB_SCHEMA, pk=["vec_id"],
        version_cols=["ver"], n_buckets=4,
        properties={"merge_mode": "upsert"})


def _queries(src):
    return src.current().filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ann_index_incremental_equals_batch(spark, tmp_path):
    """Two increments: 60% of vectors first — a slice NEGATED (negation
    flips every hyperplane sign, forcing a bucket move on correction) plus
    a synthetic vector; then the rest, the corrected slice, and the
    synthetic delete. Serving off the maintained index == batch LSH top-k
    over the final corpus, single-bucket AND multi-probe."""
    emb = _emb(spark)
    src = _mk_src(spark, tmp_path)
    dst = str(tmp_path / "ann")
    part = F.pmod(F.xxhash64("vec_id"), F.lit(10))
    neg = F.transform("embedding", lambda x: -x).cast("array<float>")
    b1 = (emb.filter(part < 6)
          .select("vec_id",
                  F.when(part == 0, neg).otherwise(F.col("embedding"))
                   .alias("embedding"))
          .withColumn("ver", F.lit(1).cast("long"))
          .unionByName(spark.createDataFrame(
              [(-1, [0.5] * 64, 1)], EMB_SCHEMA)))
    src.merge(b1, fence=("i", 1))
    res = ann_index_sync(spark, src.root, dst, "aj")
    assert not res["skipped"]

    src = LakeTable.load(spark, src.root)
    b2 = (emb.filter((part >= 6) | (part == 0))
          .withColumn("ver", F.lit(2).cast("long"))
          .withColumn("_is_delete", F.lit(False))
          .unionByName(
              spark.createDataFrame([(-1, None, 2)], EMB_SCHEMA)
              .withColumn("_is_delete", F.lit(True))))
    src.merge(b2, fence=("i", 2))
    res = ann_index_sync(spark, src.root, dst, "aj")
    assert res["index_rows_written"] > 0

    # the index holds exactly one live posting per live vector
    index_t = LakeTable.load(spark, f"{dst}/index")
    assert index_t.current().count() == src.current().count()

    q = _queries(src)
    got = ann_topk(spark, dst, q, k=10, probes=0)
    want = lsh_bucketed_topk(src.current().select("vec_id", "embedding"))
    assert _rows(got) == _rows(want)

    got_mp = ann_topk(spark, dst, q, k=10, probes=LSH_BITS)
    want_mp = lsh_bucketed_topk_multiprobe(
        src.current().select("vec_id", "embedding"))
    assert _rows(got_mp) == _rows(want_mp)

    # idempotence: nothing new -> skipped, answers unchanged
    assert ann_index_sync(spark, src.root, dst, "aj")["skipped"]
    assert _rows(ann_topk(spark, dst, q, k=10)) == _rows(want)


def test_ann_serving_scan_is_file_pruned(spark, tmp_path):
    """After compact (PK-sorted files -> tight leading-PK bucket ranges),
    a single-bucket query's manifest predicate must skip files."""
    emb = _emb(spark)
    src = _mk_src(spark, tmp_path)
    dst = str(tmp_path / "ann")
    src.merge(emb.withColumn("ver", F.lit(1).cast("long")), fence=("i", 1))
    ann_index_sync(spark, src.root, dst, "aj")
    index_t = LakeTable.load(spark, f"{dst}/index")
    # several pk-sorted files per lake bucket
    index_t.set_properties({"target_file_bytes": 16 << 10})
    index_t.compact()
    index_t = LakeTable.load(spark, f"{dst}/index")
    files = index_t.manifest["files"]
    assert len(files) > 4
    q = _queries(src).limit(1)
    from cds_spark.operators.similarity import _bucket_expr
    b = int(q.select(_bucket_expr(F.col("qv"), 64).alias("b")).collect()[0].b)
    kept = [
        f for f in files
        if not (f.get("stats") or {}).get("bucket")
        or (f["stats"]["bucket"][0] <= b <= f["stats"]["bucket"][1])
    ]
    assert len(kept) < len(files), "no file was prunable for one bucket"
    # and the pruned serve still answers correctly
    got = ann_topk(spark, dst, q, k=10)
    want = lsh_bucketed_topk(
        src.current().select("vec_id", "embedding")).filter(
        F.col("query_id") == q.collect()[0].query_id)
    assert _rows(got) == _rows(want)
