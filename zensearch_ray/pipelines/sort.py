"""Range-partitioned distributed sort — globally ordered partitioned
output (the TeraSort shape).

``Dataset.sort`` gives Ray Data's built-in global sort; this module is
the engine-owned variant whose partition boundaries are EXACT
quantiles, so output partitions are provably balanced and the
partition→key-range map is known (and SQL-reproducible) before any row
moves:

  1. pivots: ``stages.quantiles.exact_quantiles`` at i/P — the
     selection-based quantile pass (no sort, no full materialization)
     already proven DuckDB-``quantile_disc``-exact;
  2. ONE range exchange: every batch assigns ``part_id = #(pivots <
     value)`` with a vectorized ``searchsorted`` and rows ride a single
     ``groupby(part).map_groups``;
  3. each partition sorts locally (``pyarrow`` sort, no Python rows)
     and is emitted — or written straight to ``part_{id:05d}.parquet``
     so readers that concatenate files in name order see one globally
     sorted stream.

Scale notes (the 100-TB contract):
  * balance is exact up to boundary-tie mass: quantile pivots split
    row count evenly, but every row EQUAL to a pivot lands left of it.
    A column where one value carries a large fraction of the rows
    therefore concentrates in one partition; ``spread_ties=True``
    round-robins boundary-tie rows across the partitions sharing that
    pivot value (legal — equal keys have no required order), bounding
    every partition at ~N/P + distinct-interior mass. The oracle-
    checked entry keeps deterministic left-assignment so SQL can
    reproduce the partition map.
  * nulls sort LAST (SQL default): they skip the pivot pass entirely
    and go to the highest partition.
  * the input is consumed twice (quantile passes + the exchange) —
    hand this a re-readable source (a parquet read), not a consumed
    in-memory pipeline.

Reference parity note: the reference never sorts more than one
resultset in memory (``search-engine/main.go:149-169`` ranks one
query's hits); ordered export at corpus scale is part of the
beyond-reference analytics family.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from zensearch_ray.stages.quantiles import exact_quantiles

_PART = "__part"


def _range_pivots(ds, col: str, n_parts: int) -> np.ndarray:
    """Exact quantile pivots at i/n_parts (i = 1..n_parts-1), cast back
    to the column's integer dtype when applicable so boundary
    comparisons stay exact."""
    if n_parts < 2:
        return np.array([], dtype=np.float64)
    qs = [i / n_parts for i in range(1, n_parts)]
    piv = exact_quantiles(ds, col, qs)["value"].to_numpy()
    typ = dict(zip(ds.schema().names, ds.schema().types))[col]
    if isinstance(typ, pa.DataType) and pa.types.is_integer(typ):
        piv = piv.astype(np.int64)
    return piv


def range_partitioned(ds, col: str, n_parts: int = 32,
                      spread_ties: bool = False):
    """Add ``__part`` (int32, 0..n_parts-1) such that every value in
    partition i ≤ every value in partition i+1; nulls land in the last
    partition. Returns the Dataset ready for the range exchange."""
    pivots = _range_pivots(ds, col, n_parts)

    def assign(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        null_mask = pd.isna(vals)
        part = np.full(len(vals), n_parts - 1, dtype=np.int32)
        ok = ~null_mask
        v = vals[ok]
        lo = np.searchsorted(pivots, v, side="left").astype(np.int32)
        if spread_ties:
            hi = np.searchsorted(pivots, v, side="right").astype(np.int32)
            width = hi - lo + 1
            ties = width > 1
            if ties.any():
                # deterministic round-robin over the eligible range —
                # equal keys are order-equivalent, so any of these
                # partitions preserves the global order
                offs = np.arange(int(ties.sum()), dtype=np.int32)
                lo[ties] = lo[ties] + offs % width[ties]
        part[ok] = lo
        return batch.append_column(_PART, pa.array(part))

    return ds.map_batches(assign, batch_format="pyarrow")


def range_sorted_stats(ds, col: str, n_parts: int = 32) -> pd.DataFrame:
    """Range-sort ``ds`` by ``col`` and return the per-partition
    manifest (part_id, n_rows, min/max) — the partition→key-range map a
    downstream consumer (or the SQL oracle) needs, WITHOUT moving the
    sorted rows to the driver."""

    def stats(group: pa.Table) -> pa.Table:
        vals = group[col].drop_null()
        pid = group[_PART][0].as_py()
        return pa.table(
            {
                "part_id": pa.array([pid], pa.int64()),
                "n_rows": pa.array([group.num_rows], pa.int64()),
                "min_v": pa.array([pc.min(vals).as_py()]),
                "max_v": pa.array([pc.max(vals).as_py()]),
            }
        )

    out = (
        range_partitioned(ds, col, n_parts)
        .groupby(_PART)
        .map_groups(stats, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("part_id", ignore_index=True)


def sorted_export(ds, col: str, out_dir: str, n_parts: int = 32,
                  spread_ties: bool = False,
                  skip_existing: bool = True,
                  tiebreak_cols: tuple[str, ...] = ()) -> pd.DataFrame:
    """Range-sort ``ds`` by ``col`` and write one sorted parquet file
    per partition (``part_{id:05d}.parquet``); reading the files in
    name order yields one globally sorted stream. Returns the
    per-partition manifest (part_id, n_rows, path).

    Same commit/resume protocol as ``state/sink.write_partitioned``
    (the north-rule's "resumable output"): data tmp+renamed FIRST,
    marker last, and — because the quantile pivots are deterministic —
    a rerun drops completed partitions' rows MAP-SIDE, before the
    range exchange, so a crashed export only moves and rewrites the
    missing partitions.

    Resume safety requires the partition assignment to be a pure
    function of row CONTENT. ``spread_ties`` round-robins boundary-tie
    rows by batch position, which a rerun (different batch composition)
    can assign differently — duplicating rows into uncommitted
    partitions or dropping rows map-side. A resume over any committed
    partition therefore REJECTS ``spread_ties=True``; a spread-ties
    export that crashed must restart into a clean directory (or pass
    ``skip_existing=False`` to overwrite from scratch).

    ``tiebreak_cols`` extends the within-partition sort to a full
    lexicographic order ``(col, *tiebreak_cols)``. This yields a
    GLOBAL lexicographic order because deterministic left-assignment
    puts every row of one ``col`` value in the same partition — which
    is exactly why it is mutually exclusive with ``spread_ties``
    (spreading a tie-run across partitions would interleave the
    tiebreak order)."""
    if tiebreak_cols and spread_ties:
        raise ValueError("tiebreak_cols requires spread_ties=False "
                         "(a spread tie-run breaks lexicographic order)")
    from zensearch_ray.state.sink import _MARKER_DIR, completed_partitions

    os.makedirs(os.path.join(out_dir, _MARKER_DIR), exist_ok=True)
    done = completed_partitions(out_dir) if skip_existing else set()
    if done and spread_ties:
        raise ValueError(
            "spread_ties=True cannot resume over committed partitions: "
            "tie assignment is positional (batch-dependent), so a rerun "
            "could duplicate or drop boundary-tie rows. Restart into a "
            "clean directory or pass skip_existing=False."
        )
    done_arr = np.zeros(n_parts, dtype=bool)
    for p in done:
        if p < n_parts:
            done_arr[p] = True

    src = range_partitioned(ds, col, n_parts, spread_ties=spread_ties)
    if done_arr.any():
        def drop_done(batch: pa.Table) -> pa.Table:
            parts = batch[_PART].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~done_arr[parts]))

        src = src.map_batches(drop_done, batch_format="pyarrow")

    def sort_and_write(group: pa.Table) -> pa.Table:
        import json as _json

        pid = group[_PART][0].as_py()
        keys = [(c, "ascending") for c in (col, *tiebreak_cols)]
        idx = pc.sort_indices(group, sort_keys=keys,
                              null_placement="at_end")
        path = os.path.join(out_dir, f"part_{pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(group.take(idx).drop_columns([_PART]), tmp)
        os.replace(tmp, path)  # data first, marker last (commit point)
        marker = os.path.join(out_dir, _MARKER_DIR, f"part-{pid:05d}.json")
        with open(marker + ".tmp", "w") as f:
            _json.dump({"part": pid, "rows": group.num_rows}, f)
        os.replace(marker + ".tmp", marker)
        return pa.table(
            {
                "part_id": pa.array([pid], pa.int64()),
                "n_rows": pa.array([group.num_rows], pa.int64()),
                "path": pa.array([path], pa.string()),
            }
        )

    out = (
        src.groupby(_PART)
        .map_groups(sort_and_write, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:  # everything already committed (all-empty to_pandas
        # loses columns) — report zero new work with the right schema
        return pd.DataFrame({"part_id": pd.Series(dtype=np.int64),
                             "n_rows": pd.Series(dtype=np.int64),
                             "path": pd.Series(dtype=object)})
    return out.sort_values("part_id", ignore_index=True)


def lineitem_range_sorted(sf_dir: str, n_parts: int = 8) -> pd.DataFrame:
    """Oracle-checked entry: range-sort lineitem by extended price (as
    exact integer cents) into ``n_parts`` balanced partitions and
    return the partition manifest. Deterministic left-assignment of
    boundary ties so DuckDB reproduces the same map from the same
    ``quantile_disc`` pivots."""
    import ray.data as rd

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"cents": pa.array(c)})

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    ).map_batches(cents, batch_format="pyarrow")

    out = range_sorted_stats(ds, "cents", n_parts)
    return out.rename(
        columns={"min_v": "min_cents", "max_v": "max_cents"}
    ).astype({"part_id": np.int64, "n_rows": np.int64,
              "min_cents": np.int64, "max_cents": np.int64})
