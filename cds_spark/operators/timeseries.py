"""Time-series operators: as-of join and gap sessionization.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); the naive encoding —
a range join ``l.ts >= r.ts`` + latest-per-key — explodes to O(|l|·|r|)
pairs per key before the window prunes them. Both operators here are the
scalable one-shuffle union/window form instead:

- ``asof_join``: tag left/right, union on the key, one window pass ordered
  by (ts, side) carrying the last-seen right row forward — each row is
  touched once, the only shuffle is the key partition, and skew follows the
  key distribution exactly like any groupBy (salt upstream if a single key
  dominates).
- ``sessionize``: classic lag/gap/cumsum per key — the batch analog of
  Structured Streaming's ``session_window`` (which remains the streaming
  path; this operator exists for deterministic batch/backfill parity).

Both are driver-gate oracle'd against DuckDB (native ``ASOF LEFT JOIN``
and the window-emulation SQL respectively) — see ``queries.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward as-of join: every left row gets the columns of the LATEST
    right row with the same key and ``right_ts <= left_ts`` (NULLs when no
    such row). Ties at equal (key, ts): rights sort before lefts (a right
    row exactly at the left ts matches), and among equal-ts rights the
    greatest ``(right_cols...)`` tuple wins — pre-aggregate the right side
    if a different tie rule is needed.

    Output: all left columns + ``{right_ts}{suffix}`` + each of
    ``right_cols`` (defaulting to all non-key, non-ts right columns).

    ``tolerance_s`` bounds the lookback: a match older than this many
    seconds is discarded (row kept, right columns NULL).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]
    # A NULL right timestamp must never match (DuckDB/pandas ASOF semantics:
    # the ts comparison is NULL -> false). Without this filter, ASC ordering
    # puts NULL-_ats rights FIRST in the window and they'd become
    # carry-forward matches for every left row. NULL-ts LEFT rows also sort
    # first and therefore see no right row — kept, right columns NULL.
    right = right.filter(F.col(right_ts).isNotNull())
    # A NULL JOIN KEY must never match either: SQL's l.k = r.k is false on
    # NULLs, but Window.partitionBy GROUPS them — a NULL-keyed right row
    # would enrich every NULL-keyed left row. Drop NULL-keyed rights;
    # NULL-keyed lefts stay, unenriched, like the SQL LEFT JOIN.
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    rv = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    lv = F.struct(*[F.col(c) for c in left.columns])
    r_side = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("_ats"),
        F.lit(0).alias("_side"),
        rv.alias("_rv"),
        F.lit(None).cast(StructType(list(left.schema.fields))).alias("_lv"),
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).cast("timestamp").alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_side.schema["_rv"].dataType).alias("_rv"),
        lv.alias("_lv"),
    )
    u = r_side.unionByName(l_side)
    w = (
        Window.partitionBy(*keys)
        # _rv ascending: among equal-ts right rows, last() sees the
        # greatest (ts, right_cols...) struct last — the documented tie rule
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rv", ignorenulls=True).over(w)
    out = u.withColumn("_m", matched).filter(F.col("_side") == 1)
    if tolerance_s is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_ats").cast("double")
                - F.col("_m._rts").cast("timestamp").cast("double")
                <= float(tolerance_s),
                F.col("_m"),
            ),
        )
    sel = [F.col(f"_lv.`{c}`").alias(c) for c in left.columns]
    sel.append(F.col("_m._rts").alias(f"{right_ts}{suffix}"))
    sel.extend(F.col(f"_m.`{c}`").alias(c) for c in right_cols)
    return out.select(*sel)


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str = "ts",
    gap_s: float = 1800.0,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: per key, a new session starts when the
    time since the previous event exceeds ``gap_s`` seconds. Adds
    ``session_seq`` (1-based long, per key). One key-partition shuffle,
    one ordered pass — lag → gap flag → running sum.

    ``order_cols`` breaks ordering ties at equal timestamps (pass a unique
    id for determinism). Timestamps compare as fractional epoch seconds
    (``cast double``), so sub-second gaps are exact."""
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    # NTZ timestamps don't cast to double directly; via timestamp is exact
    # (session tz pinned UTC by get_spark)
    sec = F.col(ts).cast("timestamp").cast("double")
    prev = F.lag(sec).over(w)
    new_sess = F.when(
        prev.isNull() | ((sec - prev) > float(gap_s)), F.lit(1)
    ).otherwise(F.lit(0))
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_seq", seq.cast("long"))
