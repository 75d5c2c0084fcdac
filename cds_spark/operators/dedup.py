"""Last-writer-wins collapse per primary key — the heart of the semantics.

Reference: ClickHouse ReplacingMergeTree keeps the max-version row per
ORDER BY key at merge time (pkg/table/table.go:123-139, design doc
doc/CDS中ClickHouse使用的建表方案.md:36-48); in-batch merge collapses a
micro-batch to one row per PK before insert (cmd/rtu/handle/parse.go:268-306).

Spark-first realizations, all single-shuffle:

- ``lww_collapse`` (default, ``max_by``): groupBy(pk).agg(max_by(struct(*),
  version)) — gets map-side partial aggregation, so at 100TB the shuffle
  carries one row per (key, map-partition), not one per event. Preferred.
- ``method="row_number"``: window variant; same shuffle but no partial agg
  (every event crosses the wire). Kept because it preserves multiple rows
  when ``keep > 1`` is ever needed and because it is the SQL-oracle shape.
- ``lww_collapse_columnwise``: per-column LWW honoring partial updates
  (Mongo $set existsKeys semantics, parse.go:268-306) — last non-null value
  per column by version.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _version_struct(version_cols: Sequence[str]):
    return F.struct(*[F.col(c) for c in version_cols])


def lww_collapse(
    df: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
    method: str = "max_by",
) -> DataFrame:
    """One row per ``keys``: the row with the max ``version_cols`` tuple.

    Ties broken by the full version tuple; callers must include a unique
    tiebreaker (e.g. event offset) as the last version column — the
    reference guarantees this via insert_id monotonicity (insert.go:156-158),
    we guarantee it via (commit, offset).
    """
    if method == "max_by":
        other = [c for c in df.columns if c not in keys]
        agg = df.groupBy(*keys).agg(
            F.max_by(F.struct(*[F.col(c) for c in other]), _version_struct(version_cols)).alias(
                "__r"
            )
        )
        return agg.select(*keys, *[F.col(f"__r.{c}").alias(c) for c in other])
    if method == "row_number":
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in version_cols])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    raise ValueError(f"unknown method {method!r}")


def lww_collapse_columnwise(
    df: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Column-wise LWW: per column, last non-null value by version.

    Implements the reference's existsKeys partial-update merge
    (cmd/rtu/model/common.go:49-56, parse.go:268-306): an event that did not
    carry a column (NULL here) must not clobber an older value. max_by skips
    rows whose ordering expression is NULL, so gating the version on
    non-nullness gives exactly "last non-null wins". Version columns
    themselves collapse row-wise (max)."""
    value_cols = value_cols or [c for c in df.columns if c not in keys and c not in version_cols]
    v = _version_struct(version_cols)
    aggs = [
        F.max_by(F.col(c), F.when(F.col(c).isNotNull(), v)).alias(c) for c in value_cols
    ] + [F.max(v).alias("__v")]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        *keys, *value_cols, *[F.col(f"__v.{c}").alias(c) for c in version_cols]
    )


def dedup_exact(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal (reference: map-based distinct in
    dbtesttool/dbtool/generate.go:43-55). Spark: dropDuplicates — a
    hash-aggregate with map-side combine."""
    return df.dropDuplicates(list(cols) if cols else None)
