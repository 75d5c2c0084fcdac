"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() in
DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
canonical string). Floats hash EXACTLY (repr round-trips every double
bit-for-bit): the round-1 driver gate failed a query the old 1e-9
canonicalization passed locally, so the local gate is now at least as
strict as any driver tolerance — queries must round in BOTH engines from
identical inputs.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def fetch_duckdb_arrow(cur) -> tuple[list[str], list[tuple], list[str]]:
    """Fetch a DuckDB result the way the driver does — through Arrow.

    `fetchall()` converts HUGEINT to a lossless Python int, which HID a class
    of driver failures in rounds 1-2: DuckDB promotes `sum(BIGINT)` to
    HUGEINT, whose Arrow export is `decimal128(38,0)` — a different scalar
    type than Spark's int64 under the driver's canonicalization. Fetching via
    Arrow here makes the local gate share the driver's fetch path, and we
    additionally HARD-FAIL any oracle whose output schema contains a
    decimal/hugeint column so the whole class can never pass locally again
    (fix: CAST the aggregate to BIGINT/DOUBLE in the oracle SQL).
    """
    tbl = cur.fetch_arrow_table()
    bad = [
        f.name for f in tbl.schema
        if pa.types.is_decimal(f.type)
    ]
    cols = tbl.schema.names
    pyl = tbl.to_pylist()
    rows = [tuple(d[c] for c in cols) for d in pyl]
    return cols, rows, bad


def canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            # int(inf) raises OverflowError — an inf in either engine must
            # surface as a hash MISMATCH on that query, not a gate crash
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))  # collapse integral float vs int column typing
        return repr(v)  # exact: repr distinguishes any two different doubles
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_lines(cols: list[str], rows: list[tuple]) -> list[str]:
    """THE canonical row rendering (column-name order, \\x1f join, sorted)
    — shared by the hash and the first-differing-row debug output so the
    two can never disagree."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    lines = canon_lines(cols, rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from cds_spark.session import get_spark

    spark = get_spark("check-oracles", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        if not os.path.exists(f"{sf_dir}/{t}.parquet"):
            # DuckDB binds read_parquet at CREATE VIEW: registering a view
            # over a missing file would abort the gate before ANY query
            # runs; only the queries that need this table should fail
            print(f"# {t}.parquet missing in {sf_dir} — view not registered")
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            # a typo'd or renamed name must not produce a green gate that
            # checked nothing
            raise SystemExit(
                f"unknown query name(s) {sorted(unknown)}; "
                f"known: {sorted(queries)}")
    failed = []
    n_checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        status = []
        if name in oracles:
            cur = con.execute(oracles[name])
            ocols, orows, decimal_cols = fetch_duckdb_arrow(cur)
            if decimal_cols:
                failed.append(name)
                print(f"FAIL {name:32s} {time.time()-t0:6.1f}s  "
                      f"oracle emits DECIMAL/HUGEINT column(s) {decimal_cols} "
                      f"— CAST the aggregate in the oracle SQL")
                continue
            ok_count = len(srows) == len(orows)
            ok_schema = sorted(scols) == sorted(ocols)
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            ok_hash = sh == oh
            ok = ok_count and ok_schema and ok_hash
            status = [
                f"rows {len(srows)}{'==' if ok_count else '!='}{len(orows)}",
                f"schema {'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'}",
                f"hash {'ok' if ok_hash else 'MISMATCH'}",
            ]
            if not ok:
                failed.append(name)
                if not ok_hash and ok_count and ok_schema:
                    # show first differing row for debugging
                    sset = canon_lines(scols, srows)
                    oset = canon_lines(ocols, orows)
                    for a, b in zip(sset, oset):
                        if a != b:
                            print(f"    spark : {a[:200]}")
                            print(f"    duckdb: {b[:200]}")
                            break
        else:
            status = [f"rows {len(srows)} (no oracle — rows-only check)"]
            if len(srows) == 0:
                failed.append(name)
        print(f"{'PASS' if name not in failed else 'FAIL'} {name:32s} "
              f"{time.time()-t0:6.1f}s  {'  '.join(status)}")
    print(f"\n{n_checked - len(failed)}/{n_checked} queries match"
          + ("" if n_checked == len(queries)
             else f" ({len(queries) - n_checked} not selected)"))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
