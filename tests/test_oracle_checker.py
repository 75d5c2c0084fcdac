"""The local correctness gate must share the driver's fetch path.

Round-2 postmortem: three driver hash-fails were caused by DuckDB promoting
`sum(BIGINT)` to HUGEINT, which exports through Arrow as decimal128(38,0) —
a different scalar than Spark's int64 — while the local checker's
`fetchall()` silently converted it to a Python int and passed. These tests
pin the checker's Arrow fetch + hard decimal rejection so that class of
oracle bug can never pass locally again.
"""

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.check_oracles import canon, fetch_duckdb_arrow  # noqa: E402


def test_uncast_integer_sum_is_flagged_as_decimal():
    con = duckdb.connect()
    cur = con.execute("SELECT sum(x) AS sum_x FROM (VALUES (1), (2)) t(x)")
    cols, rows, bad = fetch_duckdb_arrow(cur)
    assert bad == ["sum_x"], (
        "DuckDB sum(BIGINT) -> HUGEINT must be flagged; if this fails the "
        "local gate has regressed to hiding driver hash mismatches"
    )


def test_cast_sum_passes_and_roundtrips_as_int():
    con = duckdb.connect()
    cur = con.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS sum_x FROM (VALUES (1), (2)) t(x)"
    )
    cols, rows, bad = fetch_duckdb_arrow(cur)
    assert bad == []
    assert cols == ["sum_x"]
    assert rows == [(3,)]
    assert canon(rows[0][0]) == "3"


def test_avg_double_is_not_flagged():
    con = duckdb.connect()
    cur = con.execute("SELECT avg(x) AS a FROM (VALUES (1), (2)) t(x)")
    _, rows, bad = fetch_duckdb_arrow(cur)
    assert bad == []
    assert canon(rows[0][0]) == "1.5"


def test_no_registered_oracle_emits_decimal_output():
    """Static sweep: every oracle_sql() entry, run against a 0-row view set,
    must not have a DECIMAL/HUGEINT column in its OUTPUT schema. Runs on
    empty tables so it is fast and purely schema-level."""
    import __spark_entry__ as entrymod

    schemas = {
        "region": "r_regionkey BIGINT, r_name VARCHAR, r_comment VARCHAR",
        "nation": "n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT, n_comment VARCHAR",
        "customer": "c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR, c_nationkey BIGINT, c_phone VARCHAR, c_acctbal DOUBLE, c_mktsegment VARCHAR, c_comment VARCHAR",
        "supplier": "s_suppkey BIGINT, s_name VARCHAR, s_address VARCHAR, s_nationkey BIGINT, s_phone VARCHAR, s_acctbal DOUBLE, s_comment VARCHAR",
        "part": "p_partkey BIGINT, p_name VARCHAR, p_mfgr VARCHAR, p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, p_container VARCHAR, p_retailprice DOUBLE, p_comment VARCHAR",
        "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority VARCHAR, o_clerk VARCHAR, o_shippriority INTEGER, o_comment VARCHAR",
        "lineitem": "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate DATE, l_commitdate DATE, l_receiptdate DATE, l_shipinstruct VARCHAR, l_shipmode VARCHAR, l_comment VARCHAR",
        "events": "event_id BIGINT, user_id BIGINT, event_type VARCHAR, ts TIMESTAMP, value DOUBLE, props VARCHAR",
        "documents": "doc_id BIGINT, url VARCHAR, lang VARCHAR, text VARCHAR, fetch_ts TIMESTAMP",
        "embeddings": "doc_id BIGINT, embedding DOUBLE[], norm DOUBLE",
    }
    con = duckdb.connect()
    for t, cols in schemas.items():
        colnames = ", ".join(c.split()[0] for c in cols.split(", "))
        casts = ", ".join(
            f"CAST(NULL AS {c.split(maxsplit=1)[1]}) AS {c.split()[0]}"
            for c in cols.split(", ")
        )
        con.execute(f"CREATE VIEW {t} ({colnames}) AS SELECT {casts} WHERE 1=0")
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            cur = con.execute(sql)
        except duckdb.Error:
            # schema drift vs driver views — not this test's concern
            continue
        _, _, bad = fetch_duckdb_arrow(cur)
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles emitting DECIMAL/HUGEINT output: {offenders}"
