"""Physical-plan regression guards: the properties PLANS.md records must
survive refactors — filters reach the parquet scan, scans are
column-pruned, small dims broadcast, LWW queries don't drag unused wide
columns through the collapse shuffle."""

import io
import contextlib

from cds_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(spark, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    assert "l_comment" not in plan  # untouched wide column pruned


def test_snapshot_asof_bound_pushed(spark):
    plan = _plan(spark, "cdc_snapshot_asof")
    assert "LessThan(ts" in plan


def test_revenue_by_nation_broadcasts_dim(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # scans read only the join/agg columns
    assert "o_comment" not in plan and "c_comment" not in plan


def test_lww_current_state_prunes_props(spark):
    # the collapse struct must not carry the wide unused props JSON column
    plan = _plan(spark, "cdc_lww_current_state")
    assert "props" not in plan


def test_dedup_exact_reads_two_columns(spark):
    plan = _plan(spark, "dedup_exact")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_pipeline_decodes_feed_once_per_batch(spark):
    """process_batch persists the decoded events; every downstream job
    (evolution probe, lineage agg, DLQ, merge) must plan against the cache
    (InMemoryTableScan), never re-scan + re-decode the feed."""
    from cds_spark.operators.decode import decode_feed, events_to_rows
    from cds_spark.sources.feed import REPO_SCHEMA, change_feed

    feed = change_feed(spark, 60, n_repos=2, paths_per_repo=3, seed=1)
    events = decode_feed(
        feed, inject={"commit": "commit"}, keep_cols=("payload",)
    ).persist()
    try:
        events.count()  # materialize the cache
        rows, dlq = events_to_rows(events, REPO_SCHEMA, ["repo", "path"])
        for df in (rows, dlq):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            # the leaf is the materialized cache: Spark serves rows from it
            # and never re-runs the decode child plan (which explain still
            # PRINTS as the cache's definition — that text is not execution)
            assert "InMemoryTableScan" in plan
    finally:
        events.unpersist()


def test_lsh_near_dup_has_no_allpairs_join(spark):
    """The embedding near-dup SCALE path must generate candidates by
    equi-join on band keys — never a cartesian / nested-loop all-pairs
    join (which the exact baseline near_dup_pairs deliberately is)."""
    plan = _plan(spark, "dedup_embedding_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the exact baseline IS all-pairs (vec_a < vec_b non-equi condition)
    baseline = _plan(spark, "dedup_embedding_cosine")
    assert "BroadcastNestedLoopJoin" in baseline or "CartesianProduct" in baseline


def test_dialect_decoders_parse_each_payload_once(spark):
    """from_json is CodegenFallback: without the Generate barrier,
    CollapseProject inlines it into every downstream reference and one
    envelope gets parsed N times (measured 13x on the feed path). Each
    decoder's physical plan must contain exactly as many from_json nodes
    as there are distinct things to parse — one evaluation each — and at
    least one Generate barrier."""
    from pyspark.sql import functions as F

    from cds_spark.operators import decode as D

    feed = spark.range(10).select(
        F.lit('{"x":1}').alias("value"),
        F.col("id").alias("off"),
        F.lit(0).alias("part"),
    )
    # decoder -> expected from_json count: envelope + (debezium-mongo only)
    # 3 member maps + 3x2 nested $set/_id parses (+1 constant empty_map
    # foldable literal that Catalyst keeps as a from_json of '{}')
    cases = {
        "decode_canal": (D.decode_canal, 1),
        "decode_debezium_mysql": (D.decode_debezium_mysql, 1),
        "decode_connector_mongo": (D.decode_connector_mongo, 2),  # +empty_map literal
        "decode_debezium_mongo": (D.decode_debezium_mongo, 11),  # 1+3+6+empty_map
    }
    for name, (fn, max_parses) in cases.items():
        df = fn(feed, value_col="value", partition_col="part", offset_col="off")
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_parse = plan.count("from_json")
        assert n_parse <= max_parses, f"{name}: {n_parse} from_json nodes (cap {max_parses})"
        assert "Generate" in plan, f"{name}: missing the Generate barrier"


def test_decontaminate_broadcasts_benchmark(spark):
    # benchmark shingle set is broadcast; the corpus side must stay a
    # linear scan (no sort-merge / cartesian join at 100 TB)
    plan = _plan(spark, "dedup_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lookup_plan_broadcast_semi_no_wide_shuffle(spark, tmp_path):
    """lookup(): the key set must broadcast (semi join) and the plan must
    not contain a sort-merge join or an exchange of the table side."""
    from cds_spark.lake.table import LakeTable
    from cds_spark.operators.decode import decode_feed, events_to_rows
    from cds_spark.sources.feed import REPO_SCHEMA, change_feed

    t = LakeTable.create(
        spark, str(tmp_path / "lkp"), REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=8,
    )
    feed = change_feed(spark, 300, n_repos=4, paths_per_repo=6, seed=2)
    rows, _ = events_to_rows(
        decode_feed(feed, inject={"commit": "commit"}), t.schema, t.pk
    )
    t.merge(rows, fence=("p", 0))
    k = t.current().select("repo", "path").first()
    df = t.lookup([{"repo": k["repo"], "path": k["path"]}])
    import io as _io, contextlib as _ctx
    buf = _io.StringIO()
    with _ctx.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
