"""Online re-bucketing: modulus change as a sequence of CAS commits with
readers and concurrent ingest consistent throughout — the operation a
sharded ClickHouse cluster cannot do online (resharding
pkg/ckgroup/ckgroup.go:12-47 is manual copy + cutover)."""

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cds_spark.lake.table import LakeTable  # noqa: E402
from cds_spark.operators.decode import decode_feed_rows  # noqa: E402
from cds_spark.sources.feed import (  # noqa: E402
    REPO_SCHEMA,
    change_feed,
    reference_replay_pandas,
)


def _digest(t: LakeTable) -> list[tuple]:
    return sorted(tuple(r) for r in t.current().collect())


def _mk(spark, root, n_buckets, feed, lo, hi, fence_from=0):
    if LakeTable.exists(root):
        t = LakeTable.load(spark, root)
    else:
        t = LakeTable.create(
            spark, root, REPO_SCHEMA, pk=["repo", "path"],
            version_cols=["commit", "_offset"], n_buckets=n_buckets,
            properties={"merge_mode": "append"},
        )
    batch = feed.filter((F.col("offset") >= lo) & (F.col("offset") < hi))
    rows, _ = decode_feed_rows(batch, t.schema, t.pk, inject={"commit": "commit"})
    t.merge(rows, fence=("rb", fence_from))
    return t


def test_rebucket_grow_preserves_state_and_pruning(spark, tmp_path):
    feed = change_feed(spark, 2400, n_repos=8, paths_per_repo=12, seed=71)
    root = str(tmp_path / "grow")
    t = _mk(spark, root, 16, feed, 0, 2400)
    before = _digest(t)
    assert t.n_buckets == 16

    out = t.rebucket(64, group=5)
    assert out["n_buckets"] == 64 and out["rewritten_files"] > 0
    t2 = LakeTable.load(spark, root)
    assert t2.n_buckets == 64
    # every file now carries the new modulus
    assert all(t2._file_mod(f) == 64 for f in t2.manifest["files"])
    assert _digest(t2) == before
    # lookup routes through the NEW modulus and still prunes: the scan
    # must touch a strict subset of the table's files
    key = before[0][:2]
    got = t2.lookup([key]).collect()
    assert len(got) == 1 and (got[0].repo, got[0].path) == key
    touched = t2.lookup([key]).inputFiles()
    assert 0 < len(touched) < len(t2.manifest["files"])
    v = t2.validate()
    assert v["misplaced_rows"] == 0 and v["null_pk_rows"] == 0


def test_rebucket_shrink(spark, tmp_path):
    feed = change_feed(spark, 1200, n_repos=6, paths_per_repo=10, seed=72)
    root = str(tmp_path / "shrink")
    t = _mk(spark, root, 16, feed, 0, 1200)
    before = _digest(t)
    t.rebucket(4, group=7)
    t2 = LakeTable.load(spark, root)
    assert t2.n_buckets == 4
    assert all(t2._file_mod(f) == 4 for f in t2.manifest["files"])
    assert _digest(t2) == before


def test_rebucket_mixed_state_reads_are_correct(spark, tmp_path):
    """Mid-rebucket (modulus flipped, legacy files not yet rewritten) every
    read path must stay correct: current(), lookup(), compact."""
    feed = change_feed(spark, 1600, n_repos=8, paths_per_repo=10, seed=73)
    root = str(tmp_path / "mixed")
    t = _mk(spark, root, 16, feed, 0, 1600)
    before = _digest(t)

    # phase-1 flip only (reproduce rebucket-begin without the rewrite loop)
    m = t._next_manifest({"operation": "rebucket-begin",
                          "from_buckets": 16, "to_buckets": 64})
    for f in m["files"]:
        f.setdefault("mod", 16)
    m["n_buckets"] = 64
    t._commit(m)
    t2 = LakeTable.load(spark, root)
    assert t2.n_buckets == 64
    assert _digest(t2) == before
    key = before[3][:2]
    got = t2.lookup([key]).collect()
    assert len(got) == 1 and (got[0].repo, got[0].path) == key
    # compact in the mixed state absorbs legacy files (local path refuses
    # mixed moduli and falls back to the plan-based collapse)
    t2.compact(purge_tombstones=True)
    t3 = LakeTable.load(spark, root)
    assert _digest(t3) == [r for r in before]
    # after a full compact everything has been rewritten under 64
    assert all(t3._file_mod(f) == 64 for f in t3.manifest["files"])


def test_rebucket_under_concurrent_ingest(spark, tmp_path):
    """An ingest merge committed BETWEEN rebucket commits must neither be
    lost nor block; the final state equals the pandas reference replay of
    the full event log."""
    feed = change_feed(spark, 2400, n_repos=8, paths_per_repo=12, seed=74).persist()
    oracle = reference_replay_pandas([r.asDict() for r in feed.collect()])
    root = str(tmp_path / "conc")
    t = _mk(spark, root, 16, feed, 0, 1600)

    writer = LakeTable.load(spark, root)  # separate handle = separate "job"
    orig = type(t)._commit_with_rebase
    fired = {"n": 0}

    def inject(self, *a, **kw):
        # land a concurrent ingest commit right before the FIRST rewrite
        # commit: the rewrite must rebase over it
        if fired["n"] == 0 and a[0].get("operation") == "rebucket":
            fired["n"] = 1
            batch = feed.filter((F.col("offset") >= 1600) & (F.col("offset") < 2400))
            rows, _ = decode_feed_rows(
                batch, writer.schema, writer.pk, inject={"commit": "commit"}
            )
            writer.merge(rows, fence=("rb", 1))
        return orig(self, *a, **kw)

    type(t)._commit_with_rebase = inject
    try:
        t.rebucket(64, group=4)
    finally:
        type(t)._commit_with_rebase = orig
    assert fired["n"] == 1

    t2 = LakeTable.load(spark, root)
    t2.compact(purge_tombstones=True)
    t2 = LakeTable.load(spark, root)
    live = {(r.repo, r.path): r.content for r in t2.current().collect()}
    assert len(live) == len(oracle)
    assert all(live[k] == v["content"] for k, v in oracle.items())
    v = t2.validate()
    assert v["misplaced_rows"] == 0 and v["null_pk_rows"] == 0
    feed.unpersist()
