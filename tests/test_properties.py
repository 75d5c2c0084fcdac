"""Property-based checks (hypothesis): the widening lattice's algebraic
laws, and randomized replay convergence — any batch split + duplication +
reordering of a change feed must produce the identical final table state
(the reference's dbtesttool generates random workloads for the same reason,
pkg/ckgroup/dbtesttool/dbtool/generate.go:8-89)."""

import random

import pyspark.sql.types as T
from pyspark.sql import functions as F
from hypothesis import given, settings, strategies as st

from cds_spark.schema import is_widening, widen

SCALARS = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(),
    T.DateType(), T.TimestampType(), T.BooleanType(),
]
scalar = st.sampled_from(SCALARS)


@given(scalar, scalar)
def test_widen_commutative(a, b):
    assert widen(a, b) == widen(b, a)


@given(scalar)
def test_widen_idempotent(a):
    assert widen(a, a) == a


@given(scalar, scalar)
def test_widen_result_absorbs_both(a, b):
    w = widen(a, b)
    assert is_widening(a, w) and is_widening(b, w)


@given(scalar, scalar, scalar)
def test_widen_associative(a, b, c):
    assert widen(widen(a, b), c) == widen(a, widen(b, c))


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_replay_converges_under_random_batching(spark, tmp_path_factory, seed):
    """Same multiset of events, random batch boundaries, random extra
    duplication, shuffled arrival order within the whole feed -> identical
    live state (LWW idempotence + commutativity across batches)."""
    from cds_spark.lake.table import LakeTable
    from cds_spark.operators.decode import decode_feed, events_to_rows
    from cds_spark.sources.feed import (
        REPO_SCHEMA, change_feed, reference_replay_pandas,
    )

    rng = random.Random(seed)
    feed = change_feed(spark, 400, n_repos=3, paths_per_repo=6,
                       seed=seed % 1000, dup_pct=10).persist()
    rows_py = [r.asDict() for r in feed.collect()]
    oracle = reference_replay_pandas(rows_py)

    # random re-delivery: duplicate a random subset once more, shuffle, and
    # split into 1..5 batches at random boundaries
    extra = rng.sample(rows_py, k=rng.randint(0, len(rows_py) // 3))
    delivered = rows_py + extra
    rng.shuffle(delivered)
    n_batches = rng.randint(1, 5)
    cuts = sorted(rng.sample(range(1, len(delivered)), k=n_batches - 1)) if n_batches > 1 else []
    batches, prev = [], 0
    for c in cuts + [len(delivered)]:
        batches.append(delivered[prev:c])
        prev = c

    root = str(tmp_path_factory.mktemp("prop") / f"t{seed % 97}")
    table = LakeTable.create(
        spark, root, REPO_SCHEMA, pk=["repo", "path"],
        version_cols=["commit", "_offset"], n_buckets=8,
        properties={"merge_mode": rng.choice(["append", "upsert"])},
    )
    from cds_spark.sources.feed import FEED_SCHEMA

    for i, b in enumerate(batches):
        if not b:
            continue
        bdf = spark.createDataFrame(b, FEED_SCHEMA)
        rows, _ = events_to_rows(
            decode_feed(bdf, inject={"commit": "commit"}), table.schema, table.pk
        )
        table.merge(rows, fence=("p", i))

    got = {(r["repo"], r["path"]): (r["commit"], r["content"])
           for r in table.current().collect()}
    want = {k: (v["commit"], v["content"]) for k, v in oracle.items()}
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    """Randomized backward as-of joins agree with pandas.merge_asof —
    an oracle independent of both Spark and DuckDB. Unique (key, ts)
    pairs per side (the documented tie rule differs from pandas's
    positional pick, so ties are excluded from the property)."""
    import pandas as pd

    from cds_spark.operators.timeseries import asof_join

    rng = random.Random(seed)
    keys = ["a", "b", "c"]
    def side(n, idbase):
        rows, seen = [], set()
        while len(rows) < n:
            k = rng.choice(keys)
            t = rng.randint(0, 50)
            if (k, t) in seen:
                continue
            seen.add((k, t))
            rows.append((k, float(t), idbase + len(rows)))
        return rows

    lrows, rrows = side(25, 1000), side(15, 2000)
    left = spark.createDataFrame(lrows, "k string, t double, lid long") \
        .select("k", F.timestamp_seconds("t").alias("ts"), "lid")
    right = spark.createDataFrame(rrows, "k string, t double, rid long") \
        .select("k", F.timestamp_seconds("t").alias("ts"), "rid")
    got = {r["lid"]: r["rid"] for r in asof_join(left, right, on="k").collect()}

    lp = pd.DataFrame(lrows, columns=["k", "t", "lid"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["k", "t", "rid"]).sort_values("t")
    exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    exp_map = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in exp.itertuples()
    }
    assert got == exp_map


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_sessionize_matches_python_replay(spark, seed):
    from cds_spark.operators.timeseries import sessionize

    rng = random.Random(seed)
    rows = [
        (rng.choice(["u", "v"]), float(rng.randint(0, 400)), i)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k string, t double, eid long") \
        .select("k", F.timestamp_seconds("t").alias("ts"), "eid")
    got = {r["eid"]: r["session_seq"]
           for r in sessionize(df, key="k", ts="ts", gap_s=60.0,
                               order_cols=["eid"]).collect()}
    exp = {}
    for k in ("u", "v"):
        evs = sorted([(t, e) for kk, t, e in rows if kk == k])
        seq, prev = 0, None
        for t, e in evs:
            if prev is None or t - prev > 60.0:
                seq += 1
            exp[e] = seq
            prev = t
    assert got == exp


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_star_cc_matches_minlabel_on_random_graphs(spark, seed):
    """VERDICT r3 #7: the two connected-components variants (min-label
    propagation with pointer jumping; alternating large-star/small-star)
    must produce identical cluster assignments on arbitrary random edge
    sets, not just the chain fixture. cluster_id = component-min doc_id is
    canonical, so equality is exact (no up-to-relabeling slack)."""
    from cds_spark.operators.textdedup import near_dup_clusters

    rng = random.Random(seed)
    n = rng.randint(2, 30)
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    n_edges = rng.randint(0, 40)
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b] or [(0, 1 % n)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")

    out_ml = {r.doc_id: r.cluster_id
              for r in near_dup_clusters(nodes, pairs,
                                         algorithm="minlabel").collect()}
    out_st = {r.doc_id: r.cluster_id
              for r in near_dup_clusters(nodes, pairs,
                                         algorithm="star").collect()}
    assert out_ml == out_st

    # python union-find oracle: both must equal the true components
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a < n and b < n:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    exp = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}
    assert out_ml == exp


@settings(max_examples=300, deadline=None)
@given(
    st.integers(1, 64), st.integers(1, 64),
    st.sets(st.integers(0, 2**31 - 1), min_size=1, max_size=8),
)
def test_bucket_overlap_sound_and_exact_on_divisible_moduli(
    entry_mod, want_mod, hashes
):
    """Verdict r4 #8: _bucket_overlap must NEVER skip a candidate file
    (soundness, any modulus pair), and must be EXACT when one modulus
    divides the other (no false keeps beyond the divisibility relation)."""
    from cds_spark.lake.table import _bucket_overlap

    # keys -> their buckets under each modulus (xxhash64 stand-in: any
    # deterministic int works, the rule only sees residues)
    want = {h % want_mod for h in hashes}
    for h in hashes:
        eb = h % entry_mod
        # soundness: the file that HOLDS h must match a lookup for h
        assert _bucket_overlap(eb, entry_mod, {h % want_mod}, want_mod)
        assert _bucket_overlap(eb, entry_mod, want, want_mod)
    if want_mod % entry_mod == 0 or entry_mod % want_mod == 0:
        # exactness: an entry bucket matches iff SOME residue class in
        # `want` is reachable from it under the divisibility relation
        for eb in range(entry_mod):
            reachable = any(
                (x % entry_mod == eb) and (x % want_mod in want)
                for x in range(max(entry_mod, want_mod) * 2)
            )
            assert _bucket_overlap(eb, entry_mod, want, want_mod) == reachable


# ------------------------------------------------------------------ blooms
@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(
        st.tuples(
            st.text(min_size=0, max_size=60),  # arbitrary unicode incl. \x1f
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
        min_size=1, max_size=300, unique=True,
    ),
    probes=st.lists(
        st.tuples(st.text(max_size=60),
                  st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        max_size=50,
    ),
)
def test_bloom_never_false_negative(keys, probes):
    """Soundness under adversarial keys (unicode, empty strings, the
    canonical separator INSIDE a key, int64 extremes): every inserted key
    probes present. Separator-in-key canonical collisions are allowed —
    they are false POSITIVES (one extra file read), never negatives."""
    import pyarrow as pa

    from cds_spark.lake import bloom

    tbl = pa.table({
        "k": pa.array([k for k, _ in keys], pa.string()),
        "v": pa.array([v for _, v in keys], pa.int64()),
    })
    built = bloom.build_bloom(tbl, ["k", "v"], ["string", "long"])
    assert built is not None
    meta, data = built
    inside = [bloom.canonical_key(k) for k in keys]
    assert bloom.probe(data, meta["m"], meta["k"], inside).all()
    if probes:
        # probing arbitrary keys never raises; result is a bool per key
        out = bloom.probe(
            data, meta["m"], meta["k"],
            [bloom.canonical_key(p) for p in probes],
        )
        assert out.dtype == bool and len(out) == len(probes)


# --------------------------------------------------------- keyset page slice
@settings(max_examples=200, deadline=None)
@given(
    spans=st.lists(
        st.tuples(
            st.integers(0, 500),       # file min
            st.integers(0, 500),       # extent (max = min + extent)
            st.integers(1, 1000),      # footer row count
            st.booleans(),             # stats present?
        ),
        min_size=1, max_size=40,
    ),
    after=st.one_of(st.none(), st.integers(-10, 510)),
    target=st.integers(1, 2000),
)
def test_page_file_slice_is_sound(spans, after, target):
    """LakeTable._page_file_slice must pick a file set that is COMPLETE for
    its returned cutoff U: every file that could hold ANY key in
    (after, U] — i.e. whose [min, max] intersects that interval, or whose
    stats are unknown — is in keep_paths. Missing one would silently drop
    a row (or a generation, changing an LWW winner) from the page."""
    from cds_spark.lake.table import LakeTable

    files = []
    for i, (lo, ext, rows, has_stats) in enumerate(spans):
        files.append({
            "path": f"f{i}",
            "rows": rows,
            "stats": {"id": [lo, lo + ext]} if has_stats else None,
        })
    sl = LakeTable._page_file_slice(files, "id", after, target)
    if sl is None:
        return  # caller takes the plain pruned scan — trivially complete
    keep, upper = sl
    for f in files:
        st_ = (f.get("stats") or {}).get("id")
        if st_ is None:
            assert f["path"] in keep  # conservative keep
            continue
        lo, hi = st_
        intersects = lo <= upper and (after is None or hi > after)
        if intersects:
            assert f["path"] in keep, (f, after, upper, sorted(keep))
    # and the slice must actually skip something, else it returned None
    assert len(keep) < len(files)


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_deltalog_random_commit_sequences_materialize_exactly(
    tmp_path_factory, seed
):
    """Model-based check of the delta-log manifest (table.py delta/full
    serialization): drive a random sequence of commits (arbitrary add /
    remove / replace of file entries), snapshot expiry, gzip-vs-plain
    checkpoints and random checkpoint intervals against a trivial model
    (the exact file list handed to each commit). Every retained version
    must materialize to byte-equal file lists through any mix of full
    snapshots, delta chains and expire's oldest-retained rewrite.

    Pure metadata — no SparkSession touched — so this runs hundreds of
    commits in milliseconds."""
    from cds_spark.lake.table import LakeTable

    rng = random.Random(seed)
    root = tmp_path_factory.mktemp("dlog") / "t"
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(
        None, str(root), schema, pk=["k"], version_cols=["v"], n_buckets=4,
        properties={
            "manifest.checkpoint_every": rng.choice([2, 3, 5, 25]),
            "manifest.gzip_min_bytes": rng.choice([1, 1 << 20]),
        },
    )
    expected: dict[int, list] = {t.version: []}
    fresh = 0

    def entry():
        nonlocal fresh
        fresh += 1
        return {
            "path": f"data/txn-{fresh:06d}/_bucket={fresh % 4}/part-0.parquet",
            "rows": rng.randint(1, 10_000),
            "bucket": fresh % 4,
            "mod": 4,
        }

    for _ in range(rng.randint(8, 40)):
        op = rng.random()
        if op < 0.70 or len(expected) < 2:
            cur = expected[t.version]
            kept = [e for e in cur if rng.random() > 0.25]
            # replacements: same path, new stats dict (rebucket/compact shape)
            kept = [
                ({**e, "rows": rng.randint(1, 10_000)}
                 if rng.random() < 0.2 else e)
                for e in kept
            ]
            # a replaced entry must move to the add-side of a delta; the
            # writer verifies its own apply rule and checkpoints if the
            # rebuilt order would diverge — either form must read back equal
            new = kept + [entry() for _ in range(rng.randint(0, 4))]
            m = t._next_manifest({"operation": "prop-test"})
            m["files"] = new
            t._commit(m)
            expected[t.version] = new
        elif op < 0.85:
            k = rng.randint(1, 3)
            t.expire_snapshots(keep_last=k)
            cutoff = t.version - k
            expected = {v: fl for v, fl in expected.items() if v > cutoff}
        else:
            t = LakeTable.load(None, str(root))
        # the live view must always match the model
        got = LakeTable._read_manifest(str(root), t.version)["files"]
        assert got == expected[t.version], f"seed={seed} live view diverged"

    for v, files in expected.items():
        m = LakeTable._read_manifest(str(root), v)
        assert m["files"] == files, f"seed={seed} v{v} diverged"
        assert m["version"] == v
        assert m["pk"] == ["k"] and m["n_buckets"] == 4


@settings(max_examples=3, deadline=None)
@given(st.lists(
    st.one_of(
        st.text(max_size=40),
        st.from_regex(r"-?[0-9]{1,25}(\.[0-9]{1,10})?([eE][-+]?[0-9]{1,3})?",
                      fullmatch=True),
        st.sampled_from(["NaN", "Infinity", "-Infinity", "null", "",
                         '{"$numberLong": "99999999999999999999"}',
                         '{"$date": 999999999999999999}',
                         '{"$date": {"$numberLong": "-99999999999999999"}}']),
    ),
    min_size=1, max_size=60))
def test_coerce_never_raises_on_arbitrary_strings(spark, values):
    """The never-fail contract, fuzzed: coercing ARBITRARY strings to every
    numeric/temporal/bool target must never throw (Spark 4 ANSI mode made
    plain casts throw on NaN/Inf/overflow — every narrowing step must be
    try_cast, every epoch multiply guarded)."""
    from cds_spark.schema import coerce

    df = spark.createDataFrame([(v,) for v in values], "s string")
    out = df.select(*[
        coerce(F.col("s"), dt).alias(f"c{i}")
        for i, dt in enumerate([
            T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
            T.FloatType(), T.DoubleType(), T.TimestampType(), T.DateType(),
            T.BooleanType(), T.StringType(),
        ])
    ]).collect()  # must not raise
    assert len(out) == len(values)
