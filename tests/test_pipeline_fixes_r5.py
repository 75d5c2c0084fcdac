"""Round-5 pipeline/CLI/bench-harness review fixes.

- cascade_sync rejects a transform that drops the _is_delete/_offset meta
  columns (previously they were default-filled downstream and upstream
  deletes silently resurrected as mostly-NULL "live" rows).
- run_many(trigger_once=True) drains EVERY job and returns the failures
  instead of dying on the first one; the distinct-table guard compares
  expanded/normalized roots (trailing slash, ${ENV}).
- _hour_in_window wraps midnight: (22, 5) is the canonical off-peak
  window, not an always-false predicate.
"""

import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from cds_spark.lake.table import LakeTable
from cds_spark.sources.feed import REPO_SCHEMA, change_feed, write_feed_files
from cds_spark.streaming.pipeline import (
    JobSpec,
    _hour_in_window,
    cascade_sync,
    run_many,
)

KV_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ver", T.LongType()),
])


def test_hour_window_wraps_midnight():
    assert _hour_in_window(23, 22, 5) and _hour_in_window(3, 22, 5)
    assert _hour_in_window(22, 22, 5) and _hour_in_window(5, 22, 5)
    assert not _hour_in_window(12, 22, 5)
    # in-day window unchanged
    assert _hour_in_window(10, 9, 17) and not _hour_in_window(8, 9, 17)
    # (0, 0) = no window
    assert _hour_in_window(0, 0, 0) and _hour_in_window(13, 0, 0)


def test_cascade_rejects_transform_dropping_meta_columns(spark, tmp_path):
    """A --select list that forgets _is_delete must fail LOUDLY at
    validation, not silently turn upstream deletes into resurrected
    rows via the meta-default fill."""
    src_root = str(tmp_path / "src")
    src = LakeTable.create(spark, src_root, KV_SCHEMA, pk=["k"],
                           version_cols=["ver"], n_buckets=2,
                           properties={"merge_mode": "upsert"})
    src.merge(spark.createDataFrame([(1, "a", 1), (2, "b", 1)], KV_SCHEMA)
              .withColumn("_is_delete", F.lit(False)))

    def bad_tf(df):
        keep = [c for c in df.columns if c not in ("_is_delete", "_offset")]
        return df.select(*keep)

    with pytest.raises(ValueError, match="_is_delete"):
        cascade_sync(spark, src_root, str(tmp_path / "dst"), "cj",
                     transform=bad_tf)


def test_run_many_once_isolates_failures_and_reports(spark, tmp_path):
    """One job's mid-batch failure (unknown merge_mode raises inside
    foreachBatch) must not kill the sibling's drain: run_many returns
    {failed_job_id: error} and the healthy table is fully synced."""
    specs = []
    for i, mode in enumerate(("append", "bogus-mode")):
        feed = change_feed(spark, 300, n_repos=4, paths_per_repo=6,
                           seed=40 + i)
        topic = str(tmp_path / f"topic{i}")
        write_feed_files(feed, topic, 2)
        root = str(tmp_path / f"tbl{i}")
        LakeTable.create(spark, root, REPO_SCHEMA, pk=["repo", "path"],
                         version_cols=["commit", "_offset"], n_buckets=4,
                         properties={"merge_mode": "append"})
        specs.append(JobSpec(job_id=f"f{i}", table_root=root,
                             source_dir=topic,
                             checkpoint_dir=str(tmp_path / f"ck{i}"),
                             merge_mode=mode, max_files_per_trigger=1))
    failures = run_many(spark, specs)
    assert set(failures) == {"f1"}, failures
    assert "bogus-mode" in failures["f1"]
    healthy = LakeTable.load(spark, str(tmp_path / "tbl0"))
    assert healthy.current().count() > 0
    assert "fence.f0" in healthy.properties


def test_run_many_guard_normalizes_roots(spark, tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, REPO_SCHEMA, pk=["repo", "path"],
                     version_cols=["commit", "_offset"], n_buckets=2)
    mk = lambda r, j: JobSpec(job_id=j, table_root=r,
                              source_dir=str(tmp_path / "topic"),
                              checkpoint_dir=str(tmp_path / f"ck-{j}"))
    # trailing slash
    with pytest.raises(ValueError, match="distinct table_root"):
        run_many(spark, [mk(root, "a"), mk(root + "/", "b")])
    # ${ENV} expansion
    os.environ["CDS_TEST_ROOT_R5"] = str(tmp_path)
    try:
        with pytest.raises(ValueError, match="distinct table_root"):
            run_many(spark, [mk(root, "a"),
                             mk("${CDS_TEST_ROOT_R5}/t", "b")])
    finally:
        del os.environ["CDS_TEST_ROOT_R5"]
