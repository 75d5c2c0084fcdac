"""cds_spark — a from-scratch, PySpark-native CDC / incremental-ingest engine.

Re-expresses the query and data-processing capabilities of zeromicro/cds
(ClickHouse Data Synchromesh) Spark-first:

- change-event decode (4 wire dialects) -> normalized c/u/d events
  (reference: cmd/rtu/model/*.go, cmd/rtu/handle/parse.go)
- last-writer-wins collapse per primary key on a (commit, offset) version
  (reference: ReplacingMergeTree DDL, pkg/table/table.go:123-139)
- key-bucketed MERGE upserts into a snapshot-committed lake table with
  schema evolution, offset-fenced exactly-once commits, time travel
  (reference: pkg/ckgroup sharded writer + ALTER flow, cmd/rtu/handle/parse.go:180-265)
- bootstrap (full-sync) + resumable streaming incremental sync
  (reference: cmd/dm full sync, cmd/rtu incremental sync)
- large-scale training-data operators (dedup families, ANN similarity,
  text quality, multimodal plumbing) on top of the same engine.

Everything here is built on the public PySpark DataFrame API; no code is
copied from the reference (which is a Go service suite).
"""

__version__ = "0.1.0"

from cds_spark.session import get_spark  # noqa: F401
