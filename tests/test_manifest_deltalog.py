"""Delta-log manifests: per-commit metadata cost must be O(changed files),
not O(total files).

A 10^10-event replay commits ~10^5 micro-batches; rewriting the full file
list (with per-file zone maps / bloom refs, ~500B JSON each) per commit is
the classic streaming-table metadata bottleneck (Delta solves it with its
JSON action log + parquet checkpoints, Iceberg with manifest lists).
Here version-N.json is either a FULL snapshot or a DELTA
{"delta_of": N-1, "files_add": [...], "files_remove": [...]}; materialization
walks back to the nearest full snapshot (chain bounded by the checkpoint
interval). The exclusive-create CAS commit is unchanged.

Reference parity note: cds relies on ClickHouse's own part metadata
(pkg/ckgroup/common.go insert path); this layer replaces that engine-side
bookkeeping, so its write amplification is our own to bound.
"""
import json
import os

import pyspark.sql.types as T

from cds_spark.lake.table import LakeTable, META_DIR

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("ver", T.LongType()),
])


def _batch(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "concat('r-', id % 7) AS repo",
        "concat('f/', id % 300) AS path",
        "concat('c', id) AS commit",
        "concat('body-', id) AS content",
        "id AS ver",
    )


def _mk(spark, root, **props):
    return LakeTable.create(
        spark, str(root), SCHEMA, pk=["repo", "path"], version_cols=["ver"],
        n_buckets=8, properties={"merge_mode": "upsert", **props},
    )


def _raw(root, v):
    with open(os.path.join(str(root), META_DIR, f"version-{v:08d}.json")) as f:
        return json.load(f)


def _state(t):
    return sorted(str(tuple(r)) for r in t.read(live_only=False, with_meta=True).collect())


def test_steady_state_commits_are_deltas_and_state_is_exact(spark, tmp_path):
    """The 10^10-replay hot path — append-mode micro-batches (pure file
    adds, no removes) — serializes as deltas once the table outgrows the
    batch; a fresh load materializes the identical state as the in-memory
    writer; the delta bytes are a small fraction of the full snapshot."""
    root = tmp_path / "t"
    t = _mk(spark, root, merge_mode="append")
    for i in range(6):
        t.merge(_batch(spark, i * 500, (i + 1) * 500), fence=("j", i))
    forms = [(_raw(root, v)) for v in range(2, t.version + 1)]
    deltas = [m for m in forms if "delta_of" in m]
    assert deltas, "no commit serialized as a delta"
    # later commits (table warm, batch touches a minority of files) are deltas
    assert "delta_of" in forms[-1]
    # chain bookkeeping matches the on-disk forms
    assert forms[-1]["delta_chain"] > 0
    # a delta is materially smaller than the full snapshot it stands in for
    full_bytes = len(json.dumps(LakeTable._read_manifest(str(root), t.version)))
    delta_bytes = os.path.getsize(
        os.path.join(str(root), META_DIR, f"version-{t.version:08d}.json")
    )
    assert delta_bytes < full_bytes / 2
    # correctness: reader materialization == writer's in-memory manifest
    t2 = LakeTable.load(spark, str(root))
    assert t2.manifest["files"] == t.manifest["files"]
    assert _state(t2) == _state(t)


def test_checkpoint_interval_bounds_the_chain(spark, tmp_path):
    root = tmp_path / "t"
    t = _mk(spark, root, merge_mode="append", **{"manifest.checkpoint_every": 4})
    for i in range(12):
        t.merge(_batch(spark, i * 200, (i + 1) * 200), fence=("j", i))
    chains = []
    for v in range(1, t.version + 1):
        m = _raw(root, v)
        chains.append(int(m.get("delta_chain", 0)))
        assert int(m.get("delta_chain", 0)) < 4
    assert any(c > 0 for c in chains), "interval 4 produced no deltas at all"
    # full snapshots appear at least every 4 versions
    run = 0
    for c in chains:
        run = run + 1 if c > 0 else 0
        assert run < 4


def test_time_travel_materializes_mid_chain_versions(spark, tmp_path):
    root = tmp_path / "t"
    t = _mk(spark, root, merge_mode="append")
    states = {}
    for i in range(5):
        t.merge(_batch(spark, i * 300, (i + 1) * 300), fence=("j", i))
        states[t.version] = _state(t)
    for v, want in states.items():
        tv = LakeTable.load(spark, str(root), version=v)
        assert _state(tv) == want, f"time travel to v{v} diverged"


def test_full_rewrites_checkpoint_not_delta(spark, tmp_path):
    """Operations that replace most of the file list (overwrite, compact of
    a fully dirty table, rebucket-begin's all-entry modulus stamp) must
    serialize as full snapshots — a delta would be larger than the thing
    it replaces."""
    root = tmp_path / "t"
    t = _mk(spark, root)
    for i in range(3):
        t.merge(_batch(spark, i * 400, (i + 1) * 400), fence=("j", i))
    t.compact()
    assert "delta_of" not in _raw(root, t.version)
    t.rebucket(16)
    # the begin-commit: entries written by compact already carry "mod", so
    # begin is a metadata-only (zero-file) delta; entries WITHOUT a stamp
    # would be rewritten as new dicts and force a full snapshot. Either way
    # the materialized view must flip n_buckets while keeping per-file mods.
    begins = [
        v for v in range(2, t.version + 1)
        if os.path.exists(os.path.join(str(root), META_DIR, f"version-{v:08d}.json"))
        and _raw(root, v).get("summary", {}).get("operation") == "rebucket-begin"
    ]
    assert begins
    for v in begins:
        raw = _raw(root, v)
        if "delta_of" in raw:
            assert raw["files_add"] == [] and raw["files_remove"] == []
        mat = LakeTable._read_manifest(str(root), v)
        assert mat["n_buckets"] == 16
        assert all("mod" in f for f in mat["files"])
    t.overwrite(_batch(spark, 0, 100))
    assert "delta_of" not in _raw(root, t.version)
    t2 = LakeTable.load(spark, str(root))
    assert _state(t2) == _state(t)


def test_expire_rewrites_oldest_retained_as_full(spark, tmp_path):
    """expire_snapshots must leave the retained window self-contained:
    the oldest retained delta is rewritten as its (content-identical) full
    form BEFORE its base versions are deleted."""
    root = tmp_path / "t"
    t = _mk(spark, root, merge_mode="append")
    for i in range(8):
        t.merge(_batch(spark, i * 250, (i + 1) * 250), fence=("j", i))
    before = _state(t)
    # ensure the window boundary lands inside a delta chain
    assert "delta_of" in _raw(root, t.version - 2)
    res = t.expire_snapshots(keep_last=3)
    assert res["expired_snapshots"] > 0
    oldest = t.version - 2
    assert "delta_of" not in _raw(root, oldest), "oldest retained still a delta"
    assert _state(LakeTable.load(spark, str(root), version=oldest)) != []
    assert _state(LakeTable.load(spark, str(root))) == before
    # changes() still serves the retained window
    assert t.changes(oldest, t.version).count() >= 0
    # orphan sweep still sees every referenced txn dir (nothing live removed)
    removed = t.remove_orphans(older_than_s=0.0)
    assert removed == 0
    assert _state(LakeTable.load(spark, str(root))) == before


def test_changes_and_cas_are_unchanged_by_delta_serialization(spark, tmp_path):
    """changes(v1, v2) reads per-version materialized manifests; the delta
    log must not alter its output. Also: two writers racing the same
    version still resolve by the exclusive-create CAS."""
    root = tmp_path / "t"
    t = _mk(spark, root, merge_mode="append")
    for i in range(4):
        t.merge(_batch(spark, i * 150, (i + 1) * 150), fence=("j", i))
    v_mid = t.version
    t.merge(_batch(spark, 600, 900), fence=("j", 9))
    delta_rows = t.changes(v_mid, t.version).count()
    assert delta_rows > 0
    # CAS: a stale handle must fail to commit
    stale = LakeTable.load(spark, str(root), version=v_mid)
    stale.manifest["version"] = v_mid  # loaded at v_mid
    import pytest as _pytest
    from cds_spark.lake.table import CommitConflict
    with _pytest.raises(CommitConflict):
        stale._commit(stale._next_manifest({"operation": "set_properties"}))


def test_stats_and_validate_audit_the_delta_log(spark, tmp_path):
    """stats() surfaces manifest-log health; validate() flags a broken
    delta chain (missing base version file) and passes on a healthy one."""
    root = tmp_path / "t"
    t = _mk(spark, root, merge_mode="append")
    for i in range(5):
        t.merge(_batch(spark, i * 200, (i + 1) * 200), fence=("j", i))
    st = t.stats()
    ml = st["manifest_log"]
    assert ml["snapshots"] == t.version
    assert ml["meta_bytes"] > 0
    assert ml["delta_chain"] == int(t.manifest.get("delta_chain", 0))
    v = t.validate()
    assert v["ok"] and v["manifest_unmaterializable"] == []
    # break the chain: remove a mid-chain base that a later delta points at
    victim = next(
        v_ for v_ in range(2, t.version)
        if "delta_of" in _raw(root, v_ + 1) and _raw(root, v_ + 1)["delta_of"] == v_
    )
    os.remove(os.path.join(str(root), META_DIR, f"version-{victim:08d}.json"))
    v2 = t.validate()
    assert not v2["ok"]
    assert victim + 1 in v2["manifest_unmaterializable"]


def _form(root, v):
    """(is_gzip, parsed) for the on-disk bytes of version v."""
    p = os.path.join(str(root), META_DIR, f"version-{v:08d}.json")
    with open(p, "rb") as f:
        head = f.read(2)
    return head == b"\x1f\x8b", LakeTable._load_json(p)


def test_gzip_full_checkpoints_transparent(spark, tmp_path):
    """Full checkpoints >= manifest.gzip_min_bytes are gzipped on disk
    (same filename — the os.link CAS is untouched); deltas stay plain;
    every reader (load, history, time travel, validate, changes, expire,
    remove_orphans) sniffs the magic and decompresses transparently.

    Scale rationale: at 10^6 files the periodic full checkpoint is
    ~500 MB of highly repetitive JSON — gzip level 1 cuts it ~10×, the
    Delta-parquet-checkpoint analog for this format."""
    root = tmp_path / "t"
    t = _mk(
        spark, root, merge_mode="append",
        **{"manifest.gzip_min_bytes": 1, "manifest.checkpoint_every": 3},
    )
    for i in range(7):
        t.merge(_batch(spark, i * 300, (i + 1) * 300), fence=("j", i))
    before = _state(t)
    forms = [_form(root, v) for v in range(1, t.version + 1)]
    fulls = [(z, m) for z, m in forms if "delta_of" not in m]
    deltas = [(z, m) for z, m in forms if "delta_of" in m]
    assert fulls and deltas
    # with min_bytes=1 every full gzips; deltas NEVER do
    assert all(z for z, _ in fulls), "a full checkpoint was left plain"
    assert not any(z for z, _ in deltas), "a delta was gzipped"
    # readers are transparent
    t2 = LakeTable.load(spark, str(root))
    assert _state(t2) == before
    assert t2.manifest["files"] == t.manifest["files"]
    assert len(t.history()) == t.version
    mid = t.version - 2
    assert _state(LakeTable.load(spark, str(root), version=mid)) != []
    assert t.changes(mid, t.version).count() > 0
    v = t.validate()
    assert v["ok"] and v["manifest_unmaterializable"] == []
    # expire's oldest-retained rewrite goes through the same writer:
    # the rewritten full must also be gzipped and readable
    t.expire_snapshots(keep_last=3)
    oldest = t.version - 2
    z, m = _form(root, oldest)
    assert "delta_of" not in m and z
    assert t.remove_orphans(older_than_s=0.0) == 0
    assert _state(LakeTable.load(spark, str(root))) == before
    # size sanity: gzip actually shrinks a real materialized checkpoint
    full = LakeTable._read_manifest(str(root), t.version)
    full["properties"] = {**full["properties"], "manifest.gzip_min_bytes": 1}
    assert len(LakeTable._dump_manifest_bytes(full)) < len(json.dumps(full))
