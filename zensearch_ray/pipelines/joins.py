"""Co-partitioned (shuffle) hash join — the fact×fact join the
broadcast joins in ``pipelines/relational.py`` cannot do.

Every other join in this repo broadcasts the small side
(`relational.orders_per_nation` ships a dim lookup via ``ray.put``;
`customers_without_urgent_orders` broadcasts an anti-set). That is the
right call whenever one side fits a worker's heap — but a 100 TB
orders×lineitem join has no small side. The only cluster shape that
works is the classic partitioned hash join:

  1. ONE hash exchange: both inputs are tagged with a side bit and
     bucketed by ``hash(key) % n_buckets`` map-side, then a single
     ``groupby(bucket).map_groups`` co-locates each key-slice of BOTH
     tables. Rows cross the wire exactly once, already pruned to the
     join's column set.
  2. Inside a bucket the join is a vectorized ``pandas.merge`` —
     hash-build over the bucket-local slice, no per-row Python.

Partitioning assumptions (document per the brief): each bucket's slice
of both sides must fit one worker's heap — size ``n_buckets`` so
(|L|+|R|) / n_buckets ≈ a block; heavily-skewed keys (one key = half
the rows) get the same salting treatment the index build applies to
heavy terms: ``salt_heavy=True`` detects frequent keys with a cheap
per-batch frequency pass, SPLITS the left side's heavy rows across
``salt_subs`` sub-buckets and REPLICATES the right side's matching
rows into each — every (l, r) pair still meets exactly once, so
inner/left semantics are unchanged while no bucket holds more than
~|heavy|/salt_subs of a hot key. Detect-side rule: salt the side with
many rows per hot key (the fact side, here: left) and replicate the
other; replicating a side that is itself heavy multiplies rows —
swap the operands instead. Off by default (the test tables' fact
keys are near-uniform).

When the downstream is an AGGREGATE over the joined rows, prefer
pre-aggregating the fact side per key BEFORE this join (the partials
pattern of `analytics.py`) — the exchange then moves one row per key,
not one per fact row.

Reference parity note: the reference has no join engine at all (its
only lookup is the MySQL FK between `indexed_sites` and `webpages`,
``database/src/database.ts:16-91``); this operator is part of the
beyond-reference analytics family the brief requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.functions.agg import union_ready
import pyarrow.compute as pc

from zensearch_ray.functions.agg import _bucket_of

_KEY = "__key"
_SIDE = "__side"
_BUCKET = "__bucket"
_SALT = "__salt"


def _arrow_type(t) -> pa.DataType:
    """`Dataset.schema().types` yields arrow types for arrow-block
    datasets (any parquet read) but numpy/Python types for pandas-block
    ones (`from_pandas`); normalize to arrow."""
    if isinstance(t, pa.DataType):
        return t
    if t is object or t is str:
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


def _detect_heavy_keys(ds, key_col: str, frac: float) -> set:
    """Keys likely ≥ ``frac`` of all rows: per-batch value_counts at
    frac/2 (a globally hot key is hot in nearly every batch), union on
    the driver. False positives only cost pointless salting; the scan
    reads the key column alone at block granularity."""
    import pyarrow.compute as _pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col) == 0:
            return pa.table({"k": pa.array([], col.type)})
        vc = _pc.value_counts(col)
        thr = max(2, int(len(col) * frac / 2))
        mask = _pc.greater_equal(vc.field("counts"), thr)
        return pa.table({"k": vc.field("values").filter(mask)})

    out = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return set(out["k"]) if len(out) else set()


def _tag_side(key_col: str, side: int, own_cols, other_fields):
    """map_batches fn: rename key → __key, add the side bit, pad the
    other side's columns with typed nulls so the two inputs union into
    one schema."""

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {_KEY: batch[key_col], _SIDE: pa.nulls(n, pa.int8()).fill_null(side)}
        for name in own_cols:
            cols[name] = batch[name]
        for name, typ in other_fields:
            cols[name] = pa.nulls(n, typ)
        return pa.table(cols)

    return tag


def hash_join(
    left,
    right,
    on: str,
    *,
    right_on: str | None = None,
    how: str = "inner",
    n_buckets: int = 64,
    salt_heavy: bool = False,
    salt_subs: int = 8,
    heavy_frac: float = 0.01,
):
    """Join two Datasets on a key column via one co-partitioning
    exchange. ``how`` ∈ {"inner", "left"}. The output key column keeps
    the LEFT side's name; non-key column names must be disjoint
    (select/rename before joining — explicit beats suffix magic in a
    pipeline you'll re-run at 100 TB).

    ``salt_heavy=True`` bounds skew: keys ≥ ``heavy_frac`` of the LEFT
    side (detected by one cheap key-column pass) are salt-split across
    ``salt_subs`` sub-buckets on the left and replicated to each on the
    right — see the module docstring for the sidedness rule.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    right_on = right_on or on

    lschema = left.schema()
    rschema = right.schema()
    lcols = [n for n in lschema.names if n != on]
    rcols = [n for n in rschema.names if n != right_on]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"non-key column collision: {sorted(clash)}")
    ltypes = {n: _arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(rschema.names, rschema.types)}
    if ltypes[on] != rtypes[right_on]:
        raise ValueError(
            f"join key types differ: {on}={ltypes[on]} vs {right_on}={rtypes[right_on]}"
        )

    lfields = [(n, ltypes[n]) for n in lcols]
    rfields = [(n, rtypes[n]) for n in rcols]
    # ints that can acquire nulls (unmatched outer rows / pandas NaN
    # round-trip) come back as pandas nullable Int64 → arrow int64+nulls
    int_cols = {n for n, t in lfields + rfields if pa.types.is_integer(t)}
    out_schema = pa.schema(
        [pa.field(on, ltypes[on])]
        + [pa.field(n, t) for n, t in lfields]
        + [pa.field(n, t) for n, t in rfields]
    )

    n_salts = salt_subs if salt_heavy else 1
    if salt_heavy:
        import ray

        heavy_ref = ray.put(_detect_heavy_keys(left, on, heavy_frac))

        def tag_left(batch: pa.Table) -> pa.Table:
            base = _tag_side(on, 0, lcols, rfields)(batch)
            hv = ray.get(heavy_ref)
            isin = base[_KEY].to_pandas().isin(hv).to_numpy()
            salt = np.zeros(base.num_rows, dtype=np.int32)
            salt[isin] = np.arange(int(isin.sum()), dtype=np.int32) % n_salts
            return base.append_column(_SALT, pa.array(salt))

        def tag_right(batch: pa.Table) -> pa.Table:
            base = _tag_side(right_on, 1, rcols, lfields)(batch)
            hv = ray.get(heavy_ref)
            isin = base[_KEY].to_pandas().isin(hv).to_numpy()
            cold = base.filter(pa.array(~isin)).append_column(
                _SALT, pa.nulls(int((~isin).sum()), pa.int32()).fill_null(0)
            )
            hot = base.filter(pa.array(isin))
            if hot.num_rows == 0:
                return cold
            reps = [
                hot.append_column(
                    _SALT, pa.nulls(hot.num_rows, pa.int32()).fill_null(s)
                )
                for s in range(n_salts)
            ]
            return pa.concat_tables([cold] + reps)

        tagged = union_ready(  # feeds a shuffle — see union_ready
            left.map_batches(tag_left, batch_format="pyarrow"),
            right.map_batches(tag_right, batch_format="pyarrow"),
        )
    else:
        tagged = union_ready(
            left.map_batches(
                _tag_side(on, 0, lcols, rfields), batch_format="pyarrow"
            ),
            right.map_batches(
                _tag_side(right_on, 1, rcols, lfields),
                batch_format="pyarrow",
            ),
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch[_KEY], n_buckets).astype(np.int32)
        if salt_heavy:
            b = b * np.int32(n_salts) + batch[_SALT].to_numpy(
                zero_copy_only=False
            ).astype(np.int32)
        return batch.append_column(_BUCKET, pa.array(b))

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group[_SIDE]
        lt = group.filter(pc.equal(side, 0)).select([_KEY] + lcols)
        rt = group.filter(pc.equal(side, 1)).select([_KEY] + rcols)
        if lt.num_rows == 0 or (how == "inner" and rt.num_rows == 0):
            return out_schema.empty_table()
        merged = lt.to_pandas().merge(
            rt.to_pandas(), on=_KEY, how=how, sort=False, copy=False
        )
        if merged.empty:
            return out_schema.empty_table()
        for c in int_cols:
            if merged[c].dtype != np.int64:
                merged[c] = merged[c].astype("Int64")
        merged = merged.rename(columns={_KEY: on})
        return pa.Table.from_pandas(
            merged, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def order_lineitem_join(sf_dir: str):
    """Row-level fact×fact join: every lineitem row with its order's
    priority — 4 lineitem rows per order on average, both sides far too
    large to broadcast at target scale. Column-pruned reads; the
    exchange carries exactly the output column set.

    Output: (o_orderkey, o_orderpriority, l_linenumber, price)."""
    import ray.data as rd

    from zensearch_ray.functions.rounding import round6

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    joined = hash_join(
        orders, lineitem, on="o_orderkey", right_on="l_orderkey", how="inner"
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "l_linenumber": pc.cast(batch["l_linenumber"], pa.int64()),
                "price": pa.array(
                    round6(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def hash_semi_join(
    left,
    on: str,
    right,
    right_on: str | None = None,
    *,
    anti: bool = False,
    n_buckets: int = 64,
):
    """Co-partitioned SEMI (``anti=False``) / ANTI (``anti=True``)
    join: left rows with (without) at least one matching key on the
    right. Output = left rows, left schema, each row at most once —
    duplicate right keys never duplicate output (unlike an inner join
    against a non-distinct right side).

    Same one-exchange shape as ``hash_join``, but the right side ships
    ONLY its key column, pre-deduplicated per batch map-side, so the
    exchange carries left rows + (at most) one key row per (batch,
    distinct key) — the slimmest exact form of "x IN (SELECT ...)".
    Serves as the exact-verify stage of ``stages/bloom.bloom_semi_join``.
    """
    right_on = right_on or on
    lschema = left.schema()
    ltypes = {n: _arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(right.schema().names, right.schema().types)}
    if ltypes[on] != rtypes[right_on]:
        raise ValueError(
            f"join key types differ: {on}={ltypes[on]} vs {right_on}={rtypes[right_on]}"
        )
    lcols = [n for n in lschema.names if n != on]
    out_schema = pa.schema(
        [pa.field(on, ltypes[on])] + [pa.field(n, ltypes[n]) for n in lcols]
    )

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch[right_on])
        n = len(keys)
        cols = {_KEY: keys, _SIDE: pa.nulls(n, pa.int8()).fill_null(1)}
        for name in lcols:
            cols[name] = pa.nulls(n, ltypes[name])
        return pa.table(cols)

    tagged = left.map_batches(
        _tag_side(on, 0, lcols, []), batch_format="pyarrow"
    ).union(right.map_batches(tag_right, batch_format="pyarrow"))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _BUCKET, pa.array(_bucket_of(batch[_KEY], n_buckets))
        )

    def filter_bucket(group: pa.Table) -> pa.Table:
        side = group[_SIDE]
        lt = group.filter(pc.equal(side, 0)).select([_KEY] + lcols)
        if lt.num_rows == 0:
            return out_schema.empty_table()
        rkeys = pc.unique(group.filter(pc.equal(side, 1))[_KEY])
        mask = pc.is_in(lt[_KEY], value_set=rkeys)
        if anti:
            mask = pc.invert(mask)
        return lt.filter(mask).rename_columns([on] + lcols)

    return (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(filter_bucket, batch_format="pyarrow")
    )
