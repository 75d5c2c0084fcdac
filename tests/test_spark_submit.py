"""Deployment-mode contract: the engine runs under real ``spark-submit
--py-files dist/cds_spark.zip`` (the north rule's launch shape) and its
final table state matches an in-process replay of the same feed bit-for-bit
under the order-independent content digest.

The submit subprocess gets a CLEAN environment (no PYTHONPATH, cwd outside
the repo), so ``import cds_spark`` succeeding proves the zip artifact is
self-sufficient — the same property that ships the package to every
executor on a real cluster.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    import pyspark

    cand = os.path.join(os.path.dirname(os.path.abspath(pyspark.__file__)),
                        "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_spark_submit_pyfiles_replay_matches_inprocess(spark, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit launcher not available")

    from cds_spark.functions import state_digest
    from cds_spark.lake.table import LakeTable
    from cds_spark.operators.decode import decode_feed_rows
    from cds_spark.sources.feed import FEED_SCHEMA, REPO_SCHEMA, materialize_feed

    feed_dir = str(tmp_path / "feed")
    kw = dict(n_repos=120, paths_per_repo=40, seed=7)
    paths = materialize_feed(spark, 20_000, feed_dir, 2, n_partitions=4, **kw)

    # expected state: the ordinary in-process path over the same bytes
    table = LakeTable.create(
        spark, str(tmp_path / "t_local"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=16,
        properties={"merge_mode": "append"},
    )
    for i, p in enumerate(paths):
        feed = spark.read.schema(FEED_SCHEMA).parquet(p)
        rows, _ = decode_feed_rows(feed, table.schema, table.pk,
                                   inject={"commit": "commit"})
        table.merge(rows, fence=("local", i))
    table.compact(purge_tombstones=True)
    cur = table.current()
    cols = ["repo", "path", "commit", "lang", "content"]
    expected_digest = state_digest(cur, cols)
    expected_live = cur.count()

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         str(tmp_path / "cds_spark.zip")],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert os.path.getsize(zip_path) > 10_000

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--driver-memory", "3g",
            "--py-files", zip_path,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "tools", "submit_replay.py"),
            "--feed-dir", feed_dir,
            "--table-dir", str(tmp_path / "t_submit"),
            "--n-buckets", "16",
        ],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420,
    )
    result = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    assert result is not None, (
        f"no RESULT line\nstdout:\n{out.stdout[-3000:]}\nstderr:\n{out.stderr[-3000:]}"
    )
    assert result["live_rows"] == expected_live
    assert result["state_digest"] == expected_digest
    # the generator injects duplicate deliveries on top of n_events
    assert result["rows_merged"] >= 20_000
