"""Incremental near-duplicate maintenance over a CDC-maintained corpus.

At 10^10-document scale you cannot re-MinHash the corpus on every sync
tick: signatures must be maintained O(changed docs). This module extends
the reference's incremental-sync discipline (the cursor-fenced tail loop
of cmd/rtu, mirrored here by ``pipeline.cascade_sync``) to the LLM-data
dedup operators in :mod:`cds_spark.operators.textdedup`: it tails a source
``LakeTable``'s snapshot history via ``changes()`` and keeps two derived
lake tables under one root —

- ``<root>/sigs``  pk=doc_id: the doc's MinHash band keys + a signature
  digest, LWW-versioned by the source snapshot; deletes tombstone.
- ``<root>/pairs`` pk=(doc_a, doc_b): the near-dup discovery log — each
  row carries the Jaccard and the two signature digests it was verified
  at, so :func:`live_pairs` can invalidate pairs whose endpoint has since
  changed or vanished WITHOUT any re-verification scan.

Per increment (``dedup_sync``):

1. delta = ``src.changes(cursor, v2)`` collapsed to the latest row per
   key — O(changed docs), never O(corpus).
2. MinHash signatures for the upserted docs only (same hash family,
   band count and threshold as the batch operators, so incremental
   discovery equals the batch result by construction).
3. Candidates = delta band keys equi-joined against the post-state
   signature view (current sigs minus delta keys, plus the new sigs).
   The delta side is broadcast; the corpus side is a single scan of the
   sigs table with NO shuffle — at 10^10 docs the sigs projection is
   ~200 B/doc, a dimension-table scan, which prices this as a periodic
   maintenance tick (minutes cadence), not a per-micro-batch stage.
4. Exact-Jaccard verification fetches ONLY the candidate partners'
   texts through ``src.lookup`` — bucket-pruned point reads, O(candidates).
5. ``pairs.merge(..., fence=(job_id, v2))`` then
   ``sigs.merge(..., fence=(job_id, v2))``: the cursor is the sigs
   table's fence property, advanced atomically with the signature
   upsert. A crash at ANY point replays idempotently: the pairs merge
   is fence-skipped, the candidate set recomputes identically because
   the sigs table is still pre-update.

Stale pair rows (an endpoint re-signed since discovery) stay in the
append-only log and are filtered by :func:`live_pairs`; they are bounded
by the corpus update rate and can be physically dropped by re-creating
the pairs table from live_pairs() during scheduled maintenance.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cds_spark.lake.table import IS_DELETE, LakeTable, OFFSET
from cds_spark.operators.dedup import lww_collapse
from cds_spark.operators.textdedup import (
    JACCARD_THRESHOLD,
    N_BANDS,
    N_HASHES,
    _band_key,
    jaccard_expr,
    minhash_signatures,
    shingle_sets,
)

#: composite-PK identity separator (ASCII unit separator — cannot occur in
#: the reference corpus's path/repo strings; collisions would only merge
#: two docs' signatures, never corrupt the source table)
UNIT_SEP = "\x1f"


def _sig_schema(id_type: T.DataType, pk_fields) -> T.StructType:
    """Doc identity inherits a single source PK's type; composite PKs use
    a string concat identity. The source PK columns ride along (prefixed
    ``k_``) so candidate partners can be point-fetched through the source
    table's bucket-pruned lookup() without re-deriving keys from the
    identity string."""
    return T.StructType([
        T.StructField("doc_id", id_type, False),
        *[T.StructField(f"k_{f.name}", f.dataType, True) for f in pk_fields],
        T.StructField("sig_md5", T.StringType(), True),
        T.StructField("bands", T.ArrayType(T.StringType()), True),
        T.StructField("ver", T.LongType(), True),
    ])


def _pair_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType([
        T.StructField("doc_a", id_type, False),
        T.StructField("doc_b", id_type, False),
        T.StructField("jaccard", T.DoubleType(), True),
        T.StructField("sig_a", T.StringType(), True),
        T.StructField("sig_b", T.StringType(), True),
        T.StructField("ver", T.LongType(), True),
    ])


def _sig_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, sig_md5, bands): the same MinHash family / banding as the
    batch operators — incremental and batch discovery MUST agree key-for-key
    (the equivalence the tests pin)."""
    sig = minhash_signatures(docs)
    bands = F.array(*[_band_key(j) for j in range(N_BANDS)])
    digest = F.md5(F.concat_ws(
        ",", *[F.col(f"mh_{j}").cast("string") for j in range(N_HASHES)]))
    return sig.select("doc_id", digest.alias("sig_md5"), bands.alias("bands"))


# exact-Jaccard verify inputs: textdedup.shingle_sets / jaccard_expr — the
# SAME functions the batch operator uses, so incremental==batch holds by
# construction (no parallel-maintained hashing/scoring copies here)
_ssets = shingle_sets


def _validated_pairs(sigs: LakeTable, pairs: LakeTable) -> DataFrame:
    """Discovery rows whose BOTH endpoint signature digests still match the
    live signature table — the single definition of pair validity, shared
    by serving (:func:`live_pairs`) and maintenance
    (:func:`prune_stale_pairs`) so the rule can never diverge between what
    serving considers live and what maintenance physically keeps. Carries
    every pairs column; callers project."""
    s = sigs.current().select("doc_id", "sig_md5")
    return (
        pairs.current()
        .join(s.select(F.col("doc_id").alias("doc_a"),
                       F.col("sig_md5").alias("_cur_a")), "doc_a")
        .join(s.select(F.col("doc_id").alias("doc_b"),
                       F.col("sig_md5").alias("_cur_b")), "doc_b")
        .filter((F.col("sig_a") == F.col("_cur_a"))
                & (F.col("sig_b") == F.col("_cur_b")))
    )


def live_pairs(sigs: LakeTable, pairs: LakeTable) -> DataFrame:
    """Currently-valid near-dup pairs: discovery rows whose BOTH endpoint
    signature digests still match the live signature table. An updated doc
    changes its digest (invalidating old pairs until re-discovery at the
    update increment); a deleted doc's tombstone drops out of current()
    and takes its pairs with it. No text is re-read."""
    return _validated_pairs(sigs, pairs).select("doc_a", "doc_b", "jaccard")


def prune_stale_pairs(spark: SparkSession, dst_root: str) -> dict:
    """Physically drop discovery rows invalidated by later updates or
    deletes: rewrite the pairs table to exactly the live-valid rows (their
    stored digests intact). The discovery-log analog of compact() — stale
    rows are bounded by the corpus update rate between prunes, and
    :func:`live_pairs` output is identical before and after (test-pinned).
    O(pairs table) scan; a scheduled maintenance call, never required for
    correctness. Safe against concurrent ticks via the manifest CAS."""
    sigs = LakeTable.load(spark, os.path.join(dst_root, "sigs"))
    pairs = LakeTable.load(spark, os.path.join(dst_root, "pairs"))
    before = pairs.current().count()
    live = _validated_pairs(sigs, pairs).select(
        *[f.name for f in pairs.schema.fields])
    pairs.overwrite(live)
    after = LakeTable.load(spark, pairs.root).current().count()
    return {"pairs_before": before, "pairs_after": after,
            "pruned": before - after}


def dedup_sync(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    job_id: str,
    text_col: str = "text",
    n_buckets: int | None = None,
) -> dict:
    """One incremental dedup tick. Creates ``<dst_root>/sigs`` and
    ``<dst_root>/pairs`` on first run (bootstrapping from the source's
    full live state); afterwards applies O(delta) work per call. Returns
    counts. See module docstring for the crash/idempotence argument."""
    t0 = time.time()
    src = LakeTable.load(spark, src_root)
    pk = list(src.pk)
    pk_fields = [next(f for f in src.schema.fields if f.name == c) for c in pk]
    if len(pk) == 1:
        id_type = pk_fields[0].dataType
        identity = F.col(pk[0])
    else:
        # composite identity: deterministic string concat (repo::path shape)
        id_type = T.StringType()
        identity = F.concat_ws(
            UNIT_SEP, *[F.col(c).cast("string") for c in pk])
    kcols = [f"k_{c}" for c in pk]
    sigs_root = os.path.join(dst_root, "sigs")
    pairs_root = os.path.join(dst_root, "pairs")

    nb = n_buckets or src.n_buckets
    # create-if-missing PER TABLE (not all-or-nothing on sigs existing):
    # a crash between the two creates must not leave a half-bootstrapped
    # destination that every later tick crashes loading. merge-on-read
    # append, like the main CDC ingest: a tick APPENDS O(batch) rows
    # instead of copy-on-write-rewriting every touched bucket of the
    # (growing) derived tables; reads apply the LWW window and the
    # generation-bounded compact below amortizes it
    if not LakeTable.exists(sigs_root):
        sigs = LakeTable.create(
            spark, sigs_root, _sig_schema(id_type, pk_fields), pk=["doc_id"],
            version_cols=["ver"], n_buckets=nb,
            properties={"merge_mode": "append"})
    else:
        sigs = LakeTable.load(spark, sigs_root)
    if not LakeTable.exists(pairs_root):
        pairs = LakeTable.create(
            spark, pairs_root, _pair_schema(id_type), pk=["doc_a", "doc_b"],
            version_cols=["ver"], n_buckets=nb,
            properties={"merge_mode": "append"})
    else:
        pairs = LakeTable.load(spark, pairs_root)

    last = sigs.properties.get(f"fence.{job_id}")
    if last is None and sigs.manifest["files"]:
        raise ValueError(
            f"{sigs_root} exists with data but no fence.{job_id} — it was "
            f"not built by this job; refusing to guess a cursor")
    from_v = int(last) if last is not None else 0
    v2 = src.version
    if from_v >= v2:
        return {"applied": 0, "from": from_v, "to": v2, "skipped": True}

    key_sel = [F.col(c).alias(f"k_{c}") for c in pk]
    refreshed = False
    ch = None
    if from_v > 0:
        try:
            ch = src.changes(from_v, v2)
        except ValueError:
            # mutation snapshot (purge/update/overwrite) or expired window
            # in (from_v, v2]: incremental reads are impossible — fall back
            # to a full refresh, the same rule cascade_sync applies.
            # Without this, every later tick re-raises forever and the
            # in-loop pipeline call kills the ingest stream.
            refreshed = True
    if from_v == 0 or refreshed:
        # bootstrap / full refresh: the live corpus is the upsert delta;
        # a refresh additionally tombstones every signed doc no longer in
        # the corpus (a bootstrap has no prior signatures to retire)
        live = (src.current()
                .select(identity.alias("doc_id"), *key_sel,
                        F.col(text_col).alias("text"))
                .withColumn(IS_DELETE, F.lit(False)))
        if refreshed:
            gone = (sigs.current().select("doc_id", *kcols)
                    .join(live.select("doc_id"), "doc_id", "left_anti")
                    .withColumn("text", F.lit(None).cast("string"))
                    .withColumn(IS_DELETE, F.lit(True))
                    .select("doc_id", *kcols, "text", IS_DELETE))
            delta = live.unionByName(gone)
        else:
            delta = live
    else:
        vcols = ["_change_version"] + [
            c for c in list(src.version_cols) + [OFFSET] if c in ch.columns]
        ch = lww_collapse(ch, pk, vcols)
        delta = ch.select(identity.alias("doc_id"), *key_sel,
                          F.col(text_col).alias("text"),
                          F.coalesce(F.col(IS_DELETE), F.lit(False))
                           .alias(IS_DELETE))

    delta = delta.persist()
    ups = delta.filter(~F.col(IS_DELETE)).select(
        "doc_id", *kcols, "text").persist()
    new_sigs = (_sig_rows(ups.select("doc_id", "text"))
                .join(ups.select("doc_id", *kcols), "doc_id")
                .select("doc_id", *kcols, "sig_md5", "bands")
                .persist())

    # an upserted doc whose new text yields NO shingles (shorter than the
    # shingle width, or NULL) must TOMBSTONE its old signature: leaving
    # the stale digest live would keep its old pairs valid forever and
    # diverge from a batch run on the v2 corpus (which drops the doc)
    no_sig = (ups.select("doc_id", *kcols)
              .join(new_sigs.select("doc_id"), "doc_id", "left_anti"))

    # post-state signature view: current sigs minus every delta key, plus
    # the new signatures — exactly what the sigs table will hold after the
    # merge below, so candidate generation matches a batch run on v2 state.
    # Persisted: four downstream consumers (band explode, partner-key
    # fetch, both digest joins) would otherwise each re-run the sigs scan
    # + LWW collapse + anti-join — the dominant per-tick corpus term.
    delta_keys = delta.select("doc_id").distinct()
    post = (sigs.current().select("doc_id", *kcols, "sig_md5", "bands")
            .join(delta_keys, "doc_id", "left_anti")
            .unionByName(new_sigs)
            .persist())

    nb_ = new_sigs.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_key"))
    pb = post.select(
        F.col("doc_id").alias("p_id"),
        F.posexplode("bands").alias("band_id", "band_key"))
    # incremental tick: the delta side is small — broadcast it so the
    # corpus side is a single scan with no shuffle. Bootstrap / refresh:
    # the "delta" IS the corpus — a broadcast would ship the whole band
    # set to every executor; let the planner shuffle-join instead.
    if not (from_v == 0 or refreshed):
        nb_ = F.broadcast(nb_)
    cand = (
        nb_
        .join(pb, ["band_id", "band_key"])
        .filter(F.col("doc_id") != F.col("p_id"))
        .select(F.least("doc_id", "p_id").alias("doc_a"),
                F.greatest("doc_id", "p_id").alias("doc_b"))
        .distinct()
        .persist()
    )

    # exact verify on current texts: delta docs carry theirs; candidate
    # partners outside the delta are point-fetched bucket-pruned (their
    # source PK tuples ride in the signature rows, so no key parsing)
    cand_ids = (cand.select(F.col("doc_a").alias("doc_id"))
                .union(cand.select("doc_b")).distinct())
    need = cand_ids.join(ups.select("doc_id"), "doc_id", "left_anti")
    need_keys = need.join(post, "doc_id").select(
        *[F.col(f"k_{c}").alias(c) for c in pk])
    fetched = (src.lookup(need_keys)
               .select(identity.alias("doc_id"),
                       F.col(text_col).alias("text")))
    ss = _ssets(ups.select("doc_id", "text").unionByName(fetched))
    new_pairs = (
        cand
        .join(ss.select(F.col("doc_id").alias("doc_a"),
                        F.col("sset").alias("sa")), "doc_a")
        .join(ss.select(F.col("doc_id").alias("doc_b"),
                        F.col("sset").alias("sb")), "doc_b")
        .withColumn("jaccard", jaccard_expr("sa", "sb"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .join(post.select(F.col("doc_id").alias("doc_a"),
                          F.col("sig_md5").alias("sig_a")), "doc_a")
        .join(post.select(F.col("doc_id").alias("doc_b"),
                          F.col("sig_md5").alias("sig_b")), "doc_b")
        .select("doc_a", "doc_b", "jaccard", "sig_a", "sig_b")
        .withColumn("ver", F.lit(v2).cast("long"))
    )
    pstats = pairs.merge(new_pairs, fence=(job_id, v2))

    tomb_sel = [
        F.lit(None).cast("string").alias("sig_md5"),
        F.lit(None).cast(T.ArrayType(T.StringType())).alias("bands"),
        F.lit(v2).cast("long").alias("ver"),
        F.lit(True).alias(IS_DELETE),
    ]
    sig_rows = (
        new_sigs.withColumn("ver", F.lit(v2).cast("long"))
        .withColumn(IS_DELETE, F.lit(False))
        .unionByName(
            delta.filter(F.col(IS_DELETE))
            .select("doc_id", *kcols, *tomb_sel))
        # no-shingle upserts retire their old signature (see no_sig above);
        # disjoint from the delete tombstones (delete rows are not in ups)
        .unionByName(no_sig.select("doc_id", *kcols, *tomb_sel))
    )
    # the cursor advance: fence.{job_id}=v2 commits atomically with this merge
    sstats = sigs.merge(sig_rows, fence=(job_id, v2))
    # bound read amplification: rewrite only buckets that accumulated
    # generations (O(dirty buckets), a no-op manifest scan otherwise)
    sigs.compact(max_generations=8)
    pairs.compact(max_generations=8)

    for df in (cand, post, new_sigs, ups, delta):
        df.unpersist()
    return {
        "applied": int(sstats.rows_written), "pairs_written": int(pstats.rows_written),
        "from": from_v, "to": v2, "skipped": False, "refreshed": refreshed,
        "duration_s": round(time.time() - t0, 3),
    }
