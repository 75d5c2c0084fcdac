"""LIVE JDBC end-to-end against an embedded Apache Derby database.

Derby ships on Spark's own classpath (hive metastore dependency), so this
is a real `spark.read.jdbc` source — no recorded calls: the bounds probe,
range partitioning, DatabaseMetaData introspection (schema + PK), the type
lattice, and the full `bootstrap_jdbc` -> LakeTable path all execute against
a real database. The reference's equivalent is its sit-suite MySQL full sync
(cmd/dm/data/mysql2clickhouse.go:31-119, sit/docker/deps.yml:1-60).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cds_spark.streaming.pipeline import (  # noqa: E402
    bootstrap_jdbc,
    introspect_jdbc,
    introspect_jdbc_metadata,
    jdbc_keyset_scan,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
PROPS = {"driver": DRIVER}
N_ROWS = 1000


def _derby_available(spark) -> bool:
    try:
        spark._sc._jvm.java.lang.Class.forName(DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("no embedded JDBC driver jar on the Spark classpath")
    root = tmp_path_factory.mktemp("derby")
    url = f"jdbc:derby:{root}/db;create=true"
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE repos (id BIGINT NOT NULL PRIMARY KEY, "
        "repo VARCHAR(64), score DOUBLE, updated TIMESTAMP)"
    )
    ps = conn.prepareStatement("INSERT INTO repos VALUES (?, ?, ?, ?)")
    for i in range(N_ROWS):
        ps.setLong(1, i)
        ps.setString(2, f"repo-{i % 7}")
        ps.setDouble(3, i * 0.5)
        ps.setTimestamp(4, jvm.java.sql.Timestamp(1700000000000 + i * 1000))
        ps.addBatch()
        if i % 200 == 199:
            ps.executeBatch()
    ps.executeBatch()
    # a string-PK table for the non-numeric keyset fallback
    st.executeUpdate(
        "CREATE TABLE tags (tag VARCHAR(32) NOT NULL PRIMARY KEY, n INT)"
    )
    for t, n in [("alpha", 1), ("beta", 2), ("gamma", 3)]:
        st.executeUpdate(f"INSERT INTO tags VALUES ('{t}', {n})")
    conn.commit()
    conn.close()
    return url


def test_live_introspection_recovers_schema_and_pk(spark, derby_url):
    schema, pk = introspect_jdbc(spark, derby_url, "repos", PROPS)
    by_name = {f.name.lower(): f.dataType.simpleString() for f in schema.fields}
    # reference type lattice: int->long, double->double, timestamp->timestamp,
    # varchar->string (cmd/dm/util/mysqltypeconv.go:128-141)
    assert by_name == {
        "id": "bigint", "repo": "string", "score": "double", "updated": "timestamp",
    }
    assert [c.lower() for c in pk] == ["id"]
    # the metadata probe directly (what the fallback chain lands on)
    schema2, pk2 = introspect_jdbc_metadata(spark, derby_url, "repos", PROPS)
    assert schema2 == schema and pk2 == pk


def test_live_keyset_scan_is_range_partitioned(spark, derby_url):
    df = jdbc_keyset_scan(spark, derby_url, "repos", "id",
                          num_partitions=4, properties=PROPS)
    assert df.rdd.getNumPartitions() == 4  # bounds probe -> 4 stride readers
    rows = {r[0]: (r[1], r[2]) for r in df.select("id", "repo", "score").collect()}
    assert len(rows) == N_ROWS
    assert rows[17] == ("repo-3", 8.5)
    assert rows[N_ROWS - 1] == (f"repo-{(N_ROWS - 1) % 7}", (N_ROWS - 1) * 0.5)


def test_live_keyset_scan_string_pk_falls_back_single_reader(spark, derby_url):
    df = jdbc_keyset_scan(spark, derby_url, "tags", "tag", properties=PROPS)
    got = sorted((r[0], r[1]) for r in df.collect())
    assert got == [("alpha", 1), ("beta", 2), ("gamma", 3)]


def test_live_generate_create_sql_dry_run(spark, derby_url, capsys):
    """generate-create-sql against the LIVE source: introspects schema+PK
    and emits DDL without creating anything."""
    import json

    from cds_spark.cli import main

    rc = main([
        "generate-create-sql", "--jdbc-url", derby_url,
        "--jdbc-table", "repos", "--jdbc-driver", DRIVER, "--name", "repos",
    ])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and out["executed"] is False
    assert [c.lower() for c in out["pk"]] == ["id"]
    types = {c["name"].lower(): c["type"] for c in out["schema"]}
    assert types == {"id": "long", "repo": "string",
                     "score": "double", "updated": "timestamp"}
    assert "CREATE TABLE repos" in out["ansi_sql"]


def test_live_bootstrap_jdbc_full_sync(spark, derby_url, tmp_path):
    from cds_spark.lake.table import LakeTable

    root = str(tmp_path / "repos_lake")
    # pk=None: the PK must come from live introspection
    table = bootstrap_jdbc(
        spark, derby_url, "repos", root,
        pk=None, version_cols=["UPDATED"], n_buckets=8,
        num_partitions=4, properties=PROPS,
    )
    cur = table.current()
    assert cur.count() == N_ROWS
    got = {r["ID"]: r["SCORE"] for r in cur.collect()}
    assert got[123] == 61.5
    reread = LakeTable.load(spark, root).current()
    assert reread.count() == N_ROWS
