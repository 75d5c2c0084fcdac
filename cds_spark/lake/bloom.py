"""Per-file PK bloom-filter sidecars for point-lookup file skipping.

Zone maps (per-file PK min/max, built by :func:`_arrow_write_bucket`) prune
RANGE scans well because data files are pk-sorted — but a point lookup
inside a bucket still opens every merge GENERATION: each upsert batch
writes files whose keys are hash-random across the full PK range, so their
zone maps all overlap and exclude nothing. A small bloom filter per data
file answers "could this key be in this file" and prunes the generations
that cannot hold it. ClickHouse ships the same structure as the
``bloom_filter`` skip index and Parquet/Iceberg as column bloom metadata;
reference analog: PK queries route to one shard and then rely on CK's
primary index within it (pkg/ckgroup/dml.go).

Design constraints, in priority order:

- **Sound by construction.** A missing, unsupported, or corrupt bloom
  keeps the file (conservative, same contract as the zone-map
  ``file_pred``). False positives cost one extra file read; false
  negatives are impossible for keys canonicalized the same way.
- **Zero added driver-serial cost.** Blooms are built ONLY inside the
  distributed Arrow tasks that already hold the file's rows in memory
  (local compact / local merge, :func:`_arrow_write_bucket`). The
  plan-based write paths simply produce entries without blooms. This is
  deliberate: rounds 3–5 spent their effort removing driver-serial terms
  from the ingest path; a footer-style driver pass here would re-add one.
- **Self-contained, version-stable hash.** A vectorized segmented
  polynomial hash over the UTF-8 canonical key string (numpy uint64
  wraparound arithmetic) — NOT ``pd.util.hash_pandas_object`` or
  ``hash()``, whose values may drift across library/Python versions. A
  drifting hash would silently become false negatives, i.e. wrong query
  results. The algorithm id is stamped into each manifest entry
  (``bloom.algo``); readers ignore blooms with an unknown id.

Canonical key form (must agree between build and probe, across schema
widening): each PK column rendered as its decimal/UTF-8 string
(``pyarrow.compute.cast(col, large_string)`` at build == ``str(value)``
at probe for the supported types), columns joined with ``\\x1f``. Integer
widening (int -> long) therefore cannot desync the hash: "5" is "5" at
any width. Only string and integer PK types participate; any other PK
type disables blooms for the file (kept conservatively at read).

Sizing: ~10 bits/key with k=7 probes -> ~0.9% false-positive rate, ~1.25
bytes/key sidecar (0.5–2% of a zstd parquet data file), capped at 8 MiB
per file (past the cap the filter stays sound, the fpr just degrades).
"""

from __future__ import annotations

import numpy as np

#: algorithm id stamped into manifest entries; bump on ANY change to the
#: canonicalization or hash so old sidecars are ignored, never misread
BLOOM_ALGO = "poly64v1"

BITS_PER_KEY = 10
N_HASHES = 7
MIN_BITS = 1024
MAX_BITS = 1 << 26  # 8 MiB sidecar cap

#: PK column Spark type names the canonicalization covers. Floats are
#: excluded on purpose (repr drift), timestamps/dates excluded because
#: Arrow's cast-to-string rendering is not pinned to str(py_value).
SUPPORTED_PK_TYPES = {"string", "byte", "short", "integer", "long"}

_SEP = "\x1f"
_P1 = np.uint64(1099511628211)  # FNV-1a 64 prime
_P2 = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio, odd


def canonical_key(values) -> str:
    """Probe-side canonical form of one PK tuple — must equal the
    build-side Arrow ``cast(.., large_string)`` rendering per column."""
    return _SEP.join(str(v) for v in values)


def _canonical_array(tbl, pk: list):
    """Build-side canonical strings for every row of ``tbl`` (pa.Table),
    or None when any PK value is null (shouldn't happen on a PK; keep
    conservative rather than hash a null rendering)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = [pc.cast(tbl.column(c), pa.large_string()) for c in pk]
    arr = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(
        *cols, pa.scalar(_SEP, pa.large_string())
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        return None
    return arr


#: per-slab key-byte bound for the segmented hash. The vectorized form
#: materializes ~6 int64 temporaries per padded key byte (~48x); slabbing
#: caps the transient at ~50 MB per invocation regardless of how many key
#: bytes a near-cap bucket's chunk carries — vs an unbounded flat pass
#: that could transiently need GBs inside every pinned 1-CPU write task.
_SLAB_BYTES = 1 << 20


def _poly_hashes_slab(offs: np.ndarray, data: np.ndarray):
    """Segmented polynomial hash over rows [offs[0], offs[-1]) of the
    value buffer ``data``; ``offs`` is the (n+1)-long offset window for
    this slab. Returns raw (h1, h2) — the caller applies the |1."""
    n = len(offs) - 1
    lengths = np.diff(offs)
    flat = data[offs[0]:offs[-1]].astype(np.uint64)
    # one sentinel slot per row so every reduceat segment is non-empty
    # (np.add.reduceat returns the ELEMENT, not 0, for an empty segment)
    plen = lengths + 1
    pstarts = np.zeros(n, np.int64)
    np.cumsum(plen[:-1], out=pstarts[1:])
    total = int(plen.sum())
    rowid = np.repeat(np.arange(n), plen)
    poswithin = np.arange(total, dtype=np.int64) - pstarts[rowid]
    exp = (plen[rowid] - 1 - poswithin).astype(np.int64)
    vals = np.zeros(total, np.uint64)
    vals[poswithin < lengths[rowid]] = flat + np.uint64(1)
    maxlen = int(plen.max())
    out = []
    for p in (_P1, _P2):
        pows = np.full(maxlen, p, np.uint64)
        pows[0] = np.uint64(1)
        np.multiply.accumulate(pows, out=pows)  # pows[j] = P^j mod 2^64
        h = np.add.reduceat(vals * pows[exp], pstarts).astype(np.uint64)
        h += lengths.astype(np.uint64) * p
        out.append(h)
    return out[0], out[1]


def _poly_hashes(arr) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per string of a pa.LargeStringArray,
    fully vectorized (no per-row Python): a segmented polynomial over the
    UTF-8 bytes, h(s) = sum_i((b_i + 1) * P^(L-i)) + len(s)*P (i = 0-based
    byte position, so the exponent runs L..1) in uint64 wraparound
    arithmetic. The +1 keeps 0x00 bytes contributing; the length term
    separates prefix strings from their padded forms. This formula IS the
    ``poly64v1`` spec — any second implementation must match it exactly.

    Processed in byte-bounded row slabs; each row's hash depends only on
    its own bytes, so slabbing is value-identical to a single flat pass
    (same ``poly64v1`` stamp — no algo bump needed)."""
    import pyarrow as pa

    n = len(arr)
    if n == 0:
        e = np.zeros(0, np.uint64)
        return e, e.copy()
    if arr.offset != 0:
        # normalize slices so buffer math below starts at offset 0
        arr = pa.concat_arrays([arr])
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    h1 = np.empty(n, np.uint64)
    h2 = np.empty(n, np.uint64)
    r0 = 0
    while r0 < n:
        # furthest row end keeping this slab under the byte cap; always
        # advance at least one row (a single over-cap key still hashes)
        r1 = int(np.searchsorted(
            offs, offs[r0] + _SLAB_BYTES, side="right"
        )) - 1
        r1 = min(max(r1, r0 + 1), n)
        a, b = _poly_hashes_slab(offs[r0:r1 + 1], data)
        h1[r0:r1] = a
        h2[r0:r1] = b
        r0 = r1
    return h1, h2 | np.uint64(1)  # odd h2: full-period stepping


def _bit_positions(h1: np.ndarray, h2: np.ndarray, i: int, m: int):
    g = (h1 + np.uint64(i) * h2) % np.uint64(m)
    return (g >> np.uint64(6)).astype(np.int64), (
        np.uint64(1) << (g & np.uint64(63))
    )


def build_bloom(tbl, pk: list, pk_types: list) -> tuple[dict, bytes] | None:
    """Bloom over ``tbl``'s PK tuples -> (manifest stamp, sidecar bytes),
    or None when the PK types are unsupported / table empty / any PK null.
    Runs inside write tasks; must never raise for data-shaped reasons."""
    if any(t not in SUPPORTED_PK_TYPES for t in pk_types):
        return None
    n = int(tbl.num_rows)
    if n == 0:
        return None
    arr = _canonical_array(tbl, pk)
    if arr is None:
        return None
    m = min(MAX_BITS, max(MIN_BITS, -(-BITS_PER_KEY * n // 64) * 64))
    h1, h2 = _poly_hashes(arr)
    words = np.zeros(m // 64, np.uint64)
    for i in range(N_HASHES):
        idx, bit = _bit_positions(h1, h2, i, m)
        np.bitwise_or.at(words, idx, bit)
    return {"algo": BLOOM_ALGO, "m": int(m), "k": N_HASHES}, words.tobytes()


def hash_keys(canon_keys: list) -> tuple[np.ndarray, np.ndarray]:
    """Hash a canonical key list ONCE per lookup. The hashes are
    independent of any sidecar's (m, k), so probing G merge generations
    across B buckets costs one hash pass total — not B*G passes — and
    each file probe is pure bit arithmetic."""
    import pyarrow as pa

    return _poly_hashes(pa.array(canon_keys, type=pa.large_string()))


def probe_hashes(
    data: bytes, m: int, k: int, h1: np.ndarray, h2: np.ndarray
) -> np.ndarray:
    """Per-key possibly-present mask against one sidecar's bytes, given
    precomputed :func:`hash_keys` output. Raises ValueError on a size
    mismatch (truncated/corrupt sidecar) — callers treat that as "keep
    the file"."""
    words = np.frombuffer(data, np.uint64)
    if int(m) <= 0:
        # a zero/negative m passes the size check on an empty sidecar and
        # then mods by zero in _bit_positions — reject it up front
        raise ValueError(f"bloom stamp m={m} is not positive")
    if len(words) * 64 != int(m):
        raise ValueError(f"bloom sidecar holds {len(words) * 64} bits, "
                         f"manifest says {m}")
    ok = np.ones(len(h1), bool)
    for i in range(int(k)):
        idx, bit = _bit_positions(h1, h2, i, int(m))
        ok &= (words[idx] & bit) != 0
    return ok


def probe(data: bytes, m: int, k: int, canon_keys: list) -> np.ndarray:
    """One-shot convenience: :func:`hash_keys` + :func:`probe_hashes`."""
    h1, h2 = hash_keys(canon_keys)
    return probe_hashes(data, m, k, h1, h2)


def probe_sidecar(root: str, entry: dict, hashes) -> np.ndarray | None:
    """THE open/validate/probe contract for one manifest entry's sidecar —
    the single implementation both ``LakeTable.lookup`` (file skipping)
    and ``LakeTable.validate`` (soundness audit) execute, so the audit
    always exercises exactly what the read path does.

    Returns the per-key mask, or None meaning "cannot probe — keep the
    file": no bloom stamp, unknown algo id, ``hashes`` is None
    (unsupported PK types), or an unreadable/truncated/corrupt sidecar.
    ``hashes`` is a :func:`hash_keys` result shared across every file of
    the lookup."""
    import os

    bl = entry.get("bloom")
    if not bl or bl.get("algo") != BLOOM_ALGO or hashes is None:
        return None
    try:
        with open(os.path.join(root, entry["path"] + ".bloom"), "rb") as bf:
            data = bf.read()
        return probe_hashes(data, bl["m"], bl["k"], hashes[0], hashes[1])
    except (OSError, ValueError, KeyError, TypeError, IndexError,
            ZeroDivisionError):
        # the contract is "never raise, keep the file": a corrupt stamp
        # (m=null -> TypeError, m=0 + empty sidecar -> IndexError/ZeroDiv)
        # must degrade to a full-file read, not abort the whole lookup
        return None
