"""Distributed Bloom filter build + bloom-pruned semi / anti joins.

Why this exists: the broadcast anti-join in
``pipelines/relational.customers_without_urgent_orders`` ships the
EXACT distinct key set of the build side to every task. That is the
right call while the key set fits a worker's heap; at 10^9+ distinct
keys it does not. The classic fix (Bloom join) broadcasts a fixed-size
bit array instead — 10–20× smaller than the exact set at 1% false
positives — and uses it as a map-side PRE-filter, with a co-partitioned
exact join only over the rows the filter could not decide. Results are
EXACT (false positives are re-checked; Bloom has no false negatives),
so both driver entries carry full SQL oracles.

Shape:
  1. build side → per-batch partial bitmaps (vectorized double
     hashing, ``np.bitwise_or.at``) → one small OR-merge groupby
     (fan_in groups) → driver folds ≤ fan_in blobs. OR is associative /
     commutative / idempotent, so partials merge in any order — the
     same mergeability contract as the HLL registers in
     ``stages/sketch.py``.
  2. probe side → ONE streamed scan; each batch tests membership
     against the broadcast bitmap (``ray.put`` once, read per task).
  3. exact verify → ``pipelines.joins.hash_semi_join`` over the
     pruned survivors only.

Partitioning assumptions (per the brief): the bitmap must fit a
worker's heap — sized ``m = -n ln(fpp) / ln(2)^2`` bits, i.e. ~1.2 GB
at n=10^9, fpp=1%. Beyond that, shard the key space and build one
bloom per shard (probe routes by the same hash) — not built here
because a sharded bloom is just this operator applied per shard.

ANTI mode reads the probe twice (definite-keeps stream straight from
scan 1; scan 2 re-reads to route the bloom-positive rows into the
exact join). Two column-pruned parquet scans beat shipping every
probe row through the exchange whenever the filter rejects most rows —
the regime Bloom joins are for. SEMI mode is a single scan.

Reference parity: the reference's only membership check is the MySQL
`indexed_sites` URL probe (database/src/database.ts:107-133), a
row-at-a-time exact lookup; this operator is the beyond-reference
scale path for the same "already seen?" question.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from zensearch_ray.stages.sketch import _splitmix64

_BLOB = "__bloom_words"
_GRP = "__bloom_grp"
# second hash seed for Kirsch–Mitzenmacher double hashing
_SEED2 = np.uint64(0xC2B2AE3D27D4EB4F)


def bloom_params(n_keys: int, fpp: float) -> tuple[int, int]:
    """(m_bits rounded up to a multiple of 64, k hash probes) for the
    standard optimum m = -n·ln(p)/ln(2)^2, k = (m/n)·ln(2)."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(int(n_keys), 1)
    m = int(np.ceil(-n * np.log(fpp) / (np.log(2.0) ** 2)))
    m = (m + 63) & ~63
    k = max(1, int(round(m / n * np.log(2.0))))
    return m, k


def _keys_u64(keys: np.ndarray) -> np.ndarray:
    """Keys → stable uint64: numeric dtypes cast; strings hash through
    blake2b per UNIQUE value (process-stable — python ``hash`` is
    salted), fanned back out by the inverse index. Hashing strings
    narrows the bloom to a filter on hash64(key); exactness is
    unaffected because the verify join compares the original keys."""
    if keys.dtype.kind in "iuf":
        return keys.astype(np.uint64)
    from zensearch_ray.functions.ids import hash64

    uniq, inv = np.unique(keys.astype(object), return_inverse=True)
    hu = np.fromiter((hash64(str(s)) for s in uniq), dtype=np.uint64,
                     count=len(uniq))
    return hu[inv]


def _probe_indices(keys: np.ndarray, m: int, k: int):
    """Yield k vectorized bit indices per key (double hashing: the
    k-probe family from two independent 64-bit hashes)."""
    ku = _keys_u64(keys)
    h1 = _splitmix64(ku)
    h2 = _splitmix64(ku ^ _SEED2) | np.uint64(1)
    mm = np.uint64(m)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % mm).astype(np.int64)


def bloom_partial(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """One uint64 word array (m/64 words) with the k bits of every key
    set. Mergeable via elementwise OR."""
    words = np.zeros(m >> 6, dtype=np.uint64)
    if keys.size:
        for idx in _probe_indices(keys, m, k):
            np.bitwise_or.at(words, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
    return words


def bloom_contains(words: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Vectorized membership mask: True = maybe present, False =
    definitely absent."""
    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    m = int(words.size) << 6
    mask = np.ones(keys.size, dtype=bool)
    for idx in _probe_indices(keys, m, k):
        bit = (words[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


def build_bloom(ds, key_col: str, n_hint: int | None = None,
                fpp: float = 0.01, fan_in: int = 32) -> tuple[np.ndarray, int]:
    """Build one Bloom bitmap over ``ds[key_col]`` (int keys).

    Returns (words, k). ``n_hint`` sizes the filter; defaults to
    ``ds.count()`` (parquet metadata — cheap; pass an estimate when the
    input is not a metadata-countable source). Partial bitmaps OR-merge
    through one ``fan_in``-group exchange, so the driver folds at most
    ``fan_in`` blobs regardless of input block count.
    """
    if n_hint is None:
        n_hint = ds.count()
    m, k = bloom_params(n_hint, fpp)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        words = bloom_partial(keys, m, k)
        # deterministic merge-group from the data (OR is commutative,
        # so ANY assignment is correct; hashing the first key spreads
        # blobs across reducers)
        grp = int(_splitmix64(_keys_u64(keys[:1]))[0] % np.uint64(fan_in)) if keys.size else 0
        return pa.table({_GRP: pa.array([grp], type=pa.int32()),
                         _BLOB: pa.array([words.tobytes()], type=pa.large_binary())})

    def or_merge(group: pa.Table) -> pa.Table:
        acc = np.zeros(m >> 6, dtype=np.uint64)
        for blob in group[_BLOB].to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({_GRP: group[_GRP][:1],
                         _BLOB: pa.array([acc.tobytes()], type=pa.large_binary())})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(_GRP)
        .map_groups(or_merge, batch_format="pyarrow")
    )
    words = np.zeros(m >> 6, dtype=np.uint64)
    for row in merged.take_all():  # ≤ fan_in rows
        words |= np.frombuffer(row[_BLOB], dtype=np.uint64)
    return words, k


def bloom_semi_join(probe, on: str, build, build_on: str | None = None,
                    *, anti: bool = False, fpp: float = 0.01,
                    n_hint: int | None = None, n_buckets: int = 64):
    """EXACT semi (``anti=False``) or anti (``anti=True``) join of
    ``probe`` against the key set of ``build``, with a broadcast Bloom
    filter pruning the probe stream before the co-partitioned exact
    join. Output: probe rows, probe schema, each row at most once.
    """
    import ray
    from zensearch_ray.pipelines.joins import hash_semi_join

    build_on = build_on or on
    keys_ds = build.select_columns([build_on])
    words, k = build_bloom(keys_ds, build_on, n_hint=n_hint, fpp=fpp)
    ref = ray.put(words)

    def keep_maybe(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        mask = bloom_contains(w, batch[on].to_numpy(zero_copy_only=False), k)
        return batch.filter(pa.array(mask))

    def keep_definite_absent(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        mask = bloom_contains(w, batch[on].to_numpy(zero_copy_only=False), k)
        return batch.filter(pa.array(~mask))

    candidates = probe.map_batches(keep_maybe, batch_format="pyarrow")
    if not anti:
        return hash_semi_join(candidates, on, keys_ds, build_on,
                              anti=False, n_buckets=n_buckets)
    # anti: bloom-negative rows are provably non-matching (no false
    # negatives) and bypass the exchange entirely; only the maybe-rows
    # enter the exact join, which keeps the false positives.
    definite = probe.map_batches(keep_definite_absent, batch_format="pyarrow")
    false_pos = hash_semi_join(candidates, on, keys_ds, build_on,
                               anti=True, n_buckets=n_buckets)
    return definite.union(false_pos)


def parts_ordered_heavy(sf_dir: str, *, anti: bool = False, qty: float = 45.0):
    """Driver entries: parts that DO (semi) / do NOT (anti) appear in
    any lineitem with l_quantity > qty. The lineitem side is read
    key-column-only with the quantity predicate pushed into the scan."""
    import ray.data as rd
    import pyarrow.compute as pc

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )
    heavy = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey"],
        filter=(pc.field("l_quantity") > qty),
    )
    return bloom_semi_join(part, "p_partkey", heavy, "l_partkey", anti=anti)
