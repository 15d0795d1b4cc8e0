"""Exact deduplication operators (A7 + D1).

Reference semantics: dedup is a side effect of ``UNIQUE`` constraints +
duplicate-key-error swallowing on insert (``db.init.sql:10,24,33``;
``database/src/database.ts:59-91``) — i.e. keep the FIRST row per key.

Rebuild: an explicit, scale-aware operator. A naive
``groupby(key).map_groups(head(1))`` makes one Python call per group —
one per DOCUMENT — which is wrong at 10^12 rows. Since duplicates are
rare, we split the work:

  1. map-side partial counts per key → tiny ``groupby(key).sum`` →
     the set of keys that actually have duplicates (small);
  2. broadcast that set; rows with non-duplicated keys stream through
     untouched; only rows with duplicated keys go through the
     keep-first reduction.

The only data that shuffles is the duplicated sliver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _key_count_partials(key_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        vc = batch[key_col].value_counts()
        return pa.table(
            {
                key_col: vc.field("values"),
                "cnt_partial": vc.field("counts").cast(pa.int64()),
            }
        )

    return fn


def find_duplicate_keys(ds, key_col: str):
    """Dataset → python set of key values that occur more than once."""
    from zensearch_ray.functions.agg import bucketed_groupby_sum

    counts = bucketed_groupby_sum(
        ds.map_batches(_key_count_partials(key_col), batch_format="pyarrow"),
        keys=[key_col],
        sum_cols=["cnt_partial"],
    )
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater(t["cnt_partial"], 1)), batch_format="pyarrow"
    ).to_pandas()
    if dup.empty:
        return set()
    return set(dup[key_col].tolist())


def dedup_by_key(ds, key_col: str, order_col: str | None = None):
    """Exact dedup: keep the first row per key (first = min order_col,
    or arbitrary-but-deterministic min of all columns when None).

    Returns a Dataset with unique ``key_col``. Streaming-friendly: only
    rows whose key is duplicated are shuffled.
    """
    import ray

    dup_keys = find_duplicate_keys(ds, key_col)
    if not dup_keys:
        return ds
    # broadcast once; ray.get inside the task resolves from the local
    # object store (zero-copy after first fetch on a node)
    dup_ref = ray.put(frozenset(dup_keys))

    def split_clean(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = pa.array([k not in dups for k in batch[key_col].to_pylist()])
        return batch.filter(mask)

    def split_dup(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = pa.array([k in dups for k in batch[key_col].to_pylist()])
        return batch.filter(mask)

    clean = ds.map_batches(split_clean, batch_format="pyarrow")
    dups = ds.map_batches(split_dup, batch_format="pyarrow")

    sort_cols = [order_col] if order_col else []

    def keep_first(group: pa.Table) -> pa.Table:
        if sort_cols:
            idx = pc.sort_indices(group, sort_keys=[(c, "ascending") for c in sort_cols])
            group = group.take(idx[:1])
            return group
        return group.slice(0, 1)

    first = dups.groupby(key_col).map_groups(keep_first, batch_format="pyarrow")
    return clean.union(first)


def content_hash_batch(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    """Vectorized-ish content hash column for exact-content dedup
    (blake2b 63-bit, process-stable)."""
    from zensearch_ray.functions.ids import hash64

    h = np.fromiter(
        (hash64(t) for t in batch[text_col].to_pylist()),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column(out_col, pa.array(h, type=pa.int64()))
