"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC query (LWW current state) at sf0.001.
``queries()`` / ``oracle_sql()`` — the operator coverage surface, one entry
per implemented operator from SURVEY.md §2; implementations live in
``cds_spark.queries`` (with DuckDB oracles side-by-side).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    # confs the engine relies on that a driver-created session may lack
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the events change feed into current state (LWW +
    tombstone filter) at sf0.001."""
    from cds_spark.queries import q_cdc_lww_current_state

    return q_cdc_lww_current_state(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cds_spark.queries import QUERIES

    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_configure(spark), sf_dir))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from cds_spark.queries import ORACLES

    return dict(ORACLES)
