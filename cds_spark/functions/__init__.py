"""Scalar function surface (engine parity with SURVEY.md §2.7).

All JVM expressions — the reference's Go helpers re-expressed as Spark
column functions so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# hashing / sharding
# ---------------------------------------------------------------------------


def shard_hash(*cols: Column | str, buckets: int) -> Column:
    """Stable key -> bucket assignment.

    The reference uses siphash(0,0,pk) % shards client-side
    (pkg/ckgroup/common.go:153-162). Siphash is not a Spark builtin; any
    stable 64-bit hash works because shard assignment is internal — we use
    xxhash64 (JVM, codegen'd). pmod keeps it non-negative.
    """
    return F.pmod(F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols]), F.lit(buckets))


def salted_key(
    key: Column, salt_buckets: int, salt_on: Column, hot_pred: Column | None = None
) -> Column:
    """Append a salt suffix for hot keys (explicit skew handling per north rule).

    ``salt_on`` must be row content that is stable across retries/replays
    (e.g. the event offset, or offset+pk as in LakeTable._write_txn) —
    NEVER monotonically_increasing_id(), whose value depends on partition
    layout and would re-salt the same row differently under task retry.

    If ``hot_pred`` is given, only rows matching it are salted; others get
    salt 0 so small keys stay in one partition (no extra merge cost).
    """
    salt = F.pmod(F.xxhash64(salt_on), F.lit(salt_buckets))
    if hot_pred is not None:
        salt = F.when(hot_pred, salt).otherwise(F.lit(0))
    return F.concat_ws("#", key, salt.cast("string"))


def content_sha256(c: Column | str) -> Column:
    """Per-row content invariant (BASELINE.json input_hint: sha256 equality)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sha2(col.cast("string"), 256)


def state_digest(df, cols: list[str] | None = None) -> int:
    """Order-independent digest of a DataFrame's content: SUM (not xor —
    xor cancels rows of even multiplicity, so two different states could
    collide) of a per-row ``xxhash64`` over ``cols`` (all columns by
    default), taken in decimal(38,0) to dodge ANSI long overflow, folded
    mod 2^64 with the row count mixed in. One JVM aggregate, no collect
    of rows — used to compare final table state across independently-
    launched engines (e.g. the in-process replay vs the ``spark-submit
    --py-files`` replay) without shipping the data. Deterministic and
    multiplicity-sensitive for a given row multiset; partitioning and row
    order never matter. Returns 0 for an empty frame."""
    cols = cols or df.columns
    row = df.select(
        F.sum(
            F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
        ).alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not int(row["n"]):
        return 0
    return (int(row["d"]) % (1 << 64)) ^ int(row["n"])


def stable_long_hash(c: Column | str, bits: int = 61) -> Column:
    """Cross-engine-reproducible non-negative hash: first 15 hex chars of
    md5 as a long (DuckDB: md5(x) gives the same hex). Used by operators
    whose oracle must replicate the hash in ANSI SQL (minhash, simhash)."""
    col = F.col(c) if isinstance(c, str) else c
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(2**bits))


# ---------------------------------------------------------------------------
# string helpers (pkg/strx parity)
# ---------------------------------------------------------------------------


def camel_to_snake(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1_$2"))


def snake_to_camel(c: Column | str) -> Column:
    """snake_case -> CamelCase (pkg/strx/case.go parity)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.initcap(F.regexp_replace(col, "_", " ")), " ", "")


def substring_before(c: Column | str, sep: str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.substring_index(col, sep, 1)


def substring_after(c: Column | str, sep: str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.substring_index(col, sep, -1)


# ---------------------------------------------------------------------------
# vector math (similarity search support)
# ---------------------------------------------------------------------------


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns, JVM-side
    (zip_with + aggregate — no Python)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    # try_divide: an all-zero vector (failed upstream embedding, padding)
    # makes the denominator exactly 0.0, and ANSI mode (Spark 4 default)
    # would throw DIVIDE_BY_ZERO and kill the whole job — yield NULL for
    # that pair instead (sorts last under desc ranking, fails thresholds)
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))
