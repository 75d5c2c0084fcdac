"""Custom stateful streaming operator: per-key out-of-order/staleness monitor.

The reference tolerates out-of-order delivery purely through version-ordered
LWW (max version wins regardless of arrival — doc/CDS中ClickHouse使用的建表方案.md:77)
and exposes no visibility into HOW out-of-order the feed actually is. This
operator adds that observability as a Structured Streaming stateful map:

    groupBy(pk).applyInPandasWithState(...)

state per key = the max (commit, offset) version seen so far; each
micro-batch emits, per touched key, how many of its events arrived with a
version at-or-below the watermark-free state max ("stale" — they lose LWW)
vs advancing it. Feeds a dashboards/alerting path: a spike in stale events
means an upstream producer is replaying or a partition is lagging.

State size: one (commit, offset) pair per DISTINCT key ever seen — bounded
by key cardinality, NOT event volume; at 10^10 events over ~10^6 keys the
state store holds ~10^6 tiny rows, hash-partitioned across executors by the
same groupBy key. (The LWW *data* path deliberately keeps its state in the
lake table instead — SURVEY.md §2.6; this operator is observability only.)

Arrow-batched per the input_hint: the callable receives pandas DataFrames
per key group — no per-row Python UDF calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_stale", T.LongType()),
        T.StructField("n_advanced", T.LongType()),
        T.StructField("max_commit", T.StringType()),
        T.StructField("max_offset", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_commit", T.StringType()),
        T.StructField("max_offset", T.LongType()),
    ]
)


def _monitor(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    repo, path = key
    if state.exists:
        max_commit, max_offset = state.get
    else:
        max_commit, max_offset = "", -1
    # Order within a micro-batch group is NOT guaranteed after the groupBy
    # shuffle, so counting against a running max in arrival order would be
    # nondeterministic. Deterministic semantics instead: sort the batch by
    # version, then a row is stale iff it does not advance the max — i.e.
    # it is <= the pre-batch state, or duplicates a version already seen
    # in this batch.
    n_events = n_stale = n_advanced = 0
    rows = []
    for pdf in pdfs:
        n_events += len(pdf)
        # belt-and-braces: a corrupt feed line can surface as null commit/
        # offset even past the source-side filter; sorting None against str
        # (or int(NaN)) would kill the whole streaming query
        rows.extend(
            (c, int(o))
            for c, o in zip(pdf["commit"], pdf["offset"])
            if c is not None and pd.notna(o)
        )
    for commit, offset in sorted(rows):
        if (commit, offset) <= (max_commit, max_offset):
            n_stale += 1
        else:
            max_commit, max_offset = commit, offset
            n_advanced += 1
    state.update((max_commit, max_offset))
    yield pd.DataFrame(
        [
            {
                "repo": repo,
                "path": path,
                "n_events": n_events,
                "n_stale": n_stale,
                "n_advanced": n_advanced,
                "max_commit": max_commit,
                "max_offset": max_offset,
            }
        ]
    )


def staleness_monitor(events: DataFrame) -> DataFrame:
    """Attach the stateful monitor to a *streaming* feed DataFrame (the F2
    envelope: repo, path, commit, offset). Returns the per-key per-batch
    staleness stream (append mode)."""
    return (
        events.select("repo", "path", "commit", "offset")
        # a corrupt JSON line yields an all-null row from the file source;
        # null keys/versions have no meaningful staleness and would crash
        # the version sort inside the state fn — drop them at the source
        .filter(
            F.col("repo").isNotNull()
            & F.col("path").isNotNull()
            & F.col("commit").isNotNull()
            & F.col("offset").isNotNull()
        )
        .groupBy("repo", "path")
        .applyInPandasWithState(
            _monitor,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def staleness_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
):
    """File-feed driver: readStream the topic dir -> monitor -> parquet."""
    from cds_spark.sources.feed import FEED_SCHEMA

    src = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    return (
        staleness_monitor(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
