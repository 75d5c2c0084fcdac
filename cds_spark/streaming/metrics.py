"""Streaming change-rate metrics: watermarked tumbling-window aggregation.

The reference exposes ingest metrics as Prometheus histograms sampled by the
insert path (pkg/ckgroup/monitor.go:36-50) and job status via etcd leases
(cmd/rtu/handle/rtujob.go:207-232). The Spark-native shape is a metrics
*stream*: readStream over the change feed -> event-time tumbling window with
a watermark bounding state -> append-mode sink. Late events beyond the
watermark are dropped from the aggregation (the reference has no event-time
notion at all — ordering is by version only, SURVEY.md §2.6 — so this is
additive observability, not a semantics change).

State-size rationale at 10^10 events/day: the window aggregation keeps only
(windows within watermark horizon) x (op cardinality 3) rows of state —
independent of key cardinality, because metrics group by time+op, never by
PK. Per-PK state lives in the lake table itself, not the state store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: change-feed slice schema for the metrics stream (events fixture shape)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _op():
    # the one op-normalization rule, shared with the batch query surface
    from cds_spark.queries import _op_expr

    return _op_expr()


def change_rate_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Start the metrics stream; returns the StreamingQuery.

    Append output mode: a window row is emitted exactly once, when the
    watermark passes its end — the exactly-once metrics feed counterpart of
    the offset-fenced data path."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    agg = (
        src.withColumn("op", _op())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "approx_users",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
