"""Exact distributed quantiles without sorting the dataset.

The naive exact plan (`ds.sort(col)` then index by row position) moves
the ENTIRE column through an all-to-all exchange — at 100 TB the sort
IS the job. This operator computes percentile_disc-exact quantiles with
four cheap streaming passes whose exchanges are all vocabulary-sized:

  1. count     — rows per group (map-side-combined groupby sum);
  2. sample    — deterministic hash-sample of values (rate chosen from
                 pass 1 so ~``pivot_target`` candidates per group reach
                 the driver), merged into sorted pivot arrays;
  3. bracket   — per block, ``np.searchsorted`` of the column against
                 the broadcast pivots gives #(< pivot) and #(<= pivot)
                 histograms emitted as ONE count-vector row per
                 (block, group); the driver streams and sums them in
                 O(groups × pivots) memory (sufficient statistics — a
                 per-pivot keyed aggregate would push blocks × pivots
                 tiny rows through an all-to-all; measured 13× slower);
  4. sliver    — a target rank falling INSIDE a pivot's own mass
                 (LT[i] <= r < LE[i]) resolves exactly to that pivot
                 with no data movement — this also absorbs arbitrarily
                 heavy duplicate skew; only ranks strictly between
                 pivots fetch the (pivot_i, pivot_{i+1}) open-interval
                 sliver, whose size is known from pass 3 BEFORE
                 fetching. If the bound exceeds ``max_sliver`` the
                 pivots are refined inside the offending intervals
                 (restricted re-sample at a boosted rate) and pass 3
                 repeats — each round shrinks intervals by ~the
                 oversample factor, so convergence is geometric.

Selection semantics are SQL ``percentile_disc`` / DuckDB
``quantile_disc``: 0-based rank ``max(ceil(q*N), 1) - 1`` over the
null-dropped, ascending column — the result is always an actual data
value, so oracle comparison is exact float equality, no rounding.

Determinism: sampling hashes the VALUE BITS (splitmix64), so reruns and
partitionings produce identical pivots; ties inside a sliver are between
equal values and cannot affect a disc quantile.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.stages.sketch import _splitmix64

_NOGROUP = "__all"


def _rank_of(q: float, n: int) -> int:
    """0-based percentile_disc rank of quantile ``q`` among ``n`` rows."""
    return max(math.ceil(q * n), 1) - 1


def _hash_rate_mask(vals: np.ndarray, rate: float) -> np.ndarray:
    """Deterministic Bernoulli(rate) over value bits (rerun-stable)."""
    if rate >= 1.0:
        return np.ones(len(vals), dtype=bool)
    bits = _splitmix64(vals.astype(np.float64).view(np.uint64))
    return bits < np.uint64(int(rate * 2**64))


def _resolve(pivots, lt, le, ranks, n):
    """Resolve each target rank against pivot cumulative counts.

    Returns (values, intervals): ``values[j]`` is the answer when rank j
    landed on a pivot's mass, else None and ``intervals[j]`` is the open
    interval ``(lo, hi, offset, width)`` the rank falls in — ``offset``
    is the rank's position within the interval's ascending values and
    ``width`` its known row count (the pre-fetch size bound).
    """
    values: list[float | None] = []
    intervals: list[tuple[float, float, int, int] | None] = []
    for r in ranks:
        i = int(np.searchsorted(lt, r, side="right")) - 1
        if i >= 0 and r < le[i]:
            values.append(float(pivots[i]))
            intervals.append(None)
            continue
        lo = float(pivots[i]) if i >= 0 else -np.inf
        hi = float(pivots[i + 1]) if i + 1 < len(pivots) else np.inf
        base = int(le[i]) if i >= 0 else 0
        upper = int(lt[i + 1]) if i + 1 < len(pivots) else n
        values.append(None)
        intervals.append((lo, hi, r - base, upper - base))
    return values, intervals


def exact_quantiles(
    ds,
    col: str,
    qs,
    by: str | None = None,
    pivot_target: int = 4096,
    max_sliver: int = 2_000_000,
    max_rounds: int = 6,
):
    """percentile_disc-exact quantiles of ``ds[col]`` (optionally per
    ``by`` group) as a pandas frame ``(by?, q, value)`` sorted by
    (group, q). Nulls are dropped (SQL aggregate semantics). Empty
    input (or an all-null group) yields no rows for it.
    """
    import ray
    import pyarrow.compute as pc

    qs = [float(q) for q in qs]
    cols = [col] if by is None else [by, col]
    src = ds.select_columns(cols)

    def clean(batch: pa.Table) -> pa.Table:
        return batch.drop_null()

    src = src.map_batches(clean, batch_format="pyarrow")

    # -- pass 1: rows per group -------------------------------------
    def count_partial(batch: pa.Table) -> pa.Table:
        if by is None:
            return pa.table({"g": pa.array([_NOGROUP]),
                             "n": pa.array([batch.num_rows], pa.int64())})
        d = batch.group_by(by).aggregate([(col, "count")])
        return pa.table({"g": d[by].cast(pa.string()),
                         "n": d[f"{col}_count"].cast(pa.int64())})

    counts = src.map_batches(
        count_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if len(counts) == 0:  # empty .to_pandas() loses columns
        counts = pd.DataFrame({"g": [], "n": []})
    else:
        # block-count × |groups| rows — combine on the driver; a keyed
        # Dataset aggregate here costs a full exchange for tiny data
        counts = counts.groupby("g", as_index=False)["n"].sum()
    counts = counts[counts["n"] > 0]
    n_of = dict(zip(counts["g"], counts["n"].astype(np.int64)))
    if not n_of:
        out = pd.DataFrame({"q": [], "value": []})
        if by is not None:
            out.insert(0, by, [])
        return out

    ranks_of = {g: [_rank_of(q, n) for q in qs] for g, n in n_of.items()}

    def groups_of(batch: pa.Table):
        """(group_key, float64 values) slices of one batch —
        vectorized: arrow string-cast + dictionary-encode (the SAME
        key coercion as pass 1), int-code argsort, boundary split. No
        per-row Python; this runs once per batch in EVERY pass, so it
        is the grouped path's hot loop."""
        vals = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if by is None:
            yield _NOGROUP, vals
            return
        if not len(vals):
            return
        keys = batch[by].cast(pa.string())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        # nulls must coerce to the string 'None' (the pass-1 str(k)
        # coercion) — a null dictionary index becomes INT64_MIN garbage
        # after to_numpy().astype(int64)
        keys = keys.fill_null("None")
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        scodes = codes[order]
        svals = vals[order]
        bounds = np.flatnonzero(np.r_[True, scodes[1:] != scodes[:-1], True])
        dict_vals = enc.dictionary.to_pylist()
        for a, b in zip(bounds[:-1], bounds[1:]):
            yield dict_vals[scodes[a]], svals[a:b]

    # -- pass 2: hash-sampled pivot candidates ----------------------
    def sample_pass(rate_of_ref, windows_ref):
        """windows_ref: optional {g: (lo[], hi[])} open intervals to
        restrict the sample to (refinement rounds)."""
        def partial(batch: pa.Table) -> pa.Table:
            rate_of = ray.get(rate_of_ref)
            windows = ray.get(windows_ref)
            gs, vs = [], []
            for g, vals in groups_of(batch):
                if g not in rate_of:
                    continue
                if windows is not None:
                    lo, hi = windows[g]
                    idx = np.searchsorted(lo, vals, side="right") - 1
                    ok = idx >= 0
                    ok[ok] &= vals[ok] < hi[idx[ok]]
                    vals = vals[ok]
                sel = vals[_hash_rate_mask(vals, rate_of[g])]
                if len(sel):
                    gs.extend([g] * len(sel))
                    vs.append(sel)
            if not vs:
                return pa.table({"g": pa.array([], pa.string()),
                                 "v": pa.array([], pa.float64())})
            return pa.table({"g": pa.array(gs, pa.string()),
                             "v": pa.array(np.concatenate(vs))})

        samp = src.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        out: dict[str, np.ndarray] = {}
        if len(samp) == 0:
            return out
        for g, sub in samp.groupby("g"):
            out[g] = np.unique(sub["v"].to_numpy())
        return out

    rate_of = {g: min(1.0, pivot_target / max(int(n), 1)) for g, n in n_of.items()}
    pivots = sample_pass(ray.put(rate_of), ray.put(None))
    for g in n_of:
        pivots.setdefault(g, np.array([], dtype=np.float64))

    results: dict[str, list[float | None]] = {g: [None] * len(qs) for g in n_of}

    for _round in range(max_rounds + 1):
        # -- pass 3: bracket counts vs broadcast pivots --------------
        piv_ref = ray.put(pivots)
        n_piv = {g: len(p) for g, p in pivots.items()}

        def bracket_partial(batch: pa.Table) -> pa.Table:
            """Additive bucket counts per pivot. With sorted pivots p,
            ``searchsorted(p, v, 'right') == b`` means exactly b pivots
            are <= v, so #(v < p[i]) = sum of buckets 0..i; the 'left'
            variant gives #(v <= p[i]) the same way. ONE row per
            (block, group) carrying the whole count VECTOR — the
            sufficient-statistics shape: the driver sums in
            O(groups × pivots) memory and no keyed exchange runs (a
            per-pivot-key groupby here costs blocks × pivots tiny rows
            through an all-to-all — measured 9.4 s vs 0.7 s on 600k
            rows × 12k pivots). At extreme block counts insert a
            repartition+combine stage before the driver."""
            pv = ray.get(piv_ref)
            gs, ltb, leb = [], [], []
            for g, vals in groups_of(batch):
                p = pv.get(g)
                if p is None or not len(p):
                    continue
                m = len(p)
                br = np.bincount(
                    np.searchsorted(p, vals, side="right"), minlength=m + 1
                )[:m]
                bl = np.bincount(
                    np.searchsorted(p, vals, side="left"), minlength=m + 1
                )[:m]
                gs.append(g)
                ltb.append(br.astype(np.int64))
                leb.append(bl.astype(np.int64))
            if not gs:
                return pa.table({"g": pa.array([], pa.string()),
                                 "lt": pa.array([], pa.list_(pa.int64())),
                                 "le": pa.array([], pa.list_(pa.int64()))})
            return pa.table({"g": pa.array(gs, pa.string()),
                             "lt": pa.array(ltb),
                             "le": pa.array(leb)})

        acc_lt = {g: np.zeros(m, dtype=np.int64) for g, m in n_piv.items()}
        acc_le = {g: np.zeros(m, dtype=np.int64) for g, m in n_piv.items()}
        stats = src.map_batches(
            bracket_partial, batch_format="pyarrow", batch_size=None
        )
        for b in stats.iter_batches(batch_format="pyarrow"):
            for g, lt_l, le_l in zip(
                b["g"].to_pylist(), b["lt"].to_pylist(), b["le"].to_pylist()
            ):
                acc_lt[g] += np.asarray(lt_l, dtype=np.int64)
                acc_le[g] += np.asarray(le_l, dtype=np.int64)

        need_refine: dict[str, tuple[list, list]] = {}
        fetch: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        plan: dict[str, list[tuple[int, tuple]]] = {}
        for g in sorted(n_of):
            LT = np.cumsum(acc_lt[g])  # LT[i] = #(x < pivots[i])
            LE = np.cumsum(acc_le[g])  # LE[i] = #(x <= pivots[i])
            vals, ivals = _resolve(pivots[g], LT, LE, ranks_of[g], int(n_of[g]))
            todo = []
            for j, (v, iv) in enumerate(zip(vals, ivals)):
                if results[g][j] is not None:
                    continue
                if v is not None:
                    results[g][j] = v
                else:
                    todo.append((j, iv))
            if not todo:
                continue
            total = sum(iv[3] for _, iv in todo)
            if total <= max_sliver or _round == max_rounds:
                los = np.array(sorted({iv[0] for _, iv in todo}))
                his = np.array([
                    min(iv[1] for _, iv in todo if iv[0] == lo) for lo in los
                ])
                fetch[g] = (los, his)
                plan[g] = todo
            else:
                los = sorted({iv[0] for _, iv in todo})
                his = [min(iv[1] for _, iv in todo if iv[0] == lo) for lo in los]
                need_refine[g] = (los, his)
                # boost rate so ~pivot_target new pivots land inside
                rate_of[g] = min(1.0, pivot_target / max(total, 1))
                plan[g] = todo

        if fetch:
            fref = ray.put(fetch)

            def sliver_partial(batch: pa.Table) -> pa.Table:
                fw = ray.get(fref)
                gs, vs = [], []
                for g, vals in groups_of(batch):
                    w = fw.get(g)
                    if w is None:
                        continue
                    lo, hi = w
                    idx = np.searchsorted(lo, vals, side="right") - 1
                    ok = idx >= 0
                    ok[ok] &= vals[ok] < hi[idx[ok]]
                    ok[ok] &= vals[ok] > lo[idx[ok]]
                    sel = vals[ok]
                    if len(sel):
                        gs.extend([g] * len(sel))
                        vs.append(sel)
                if not vs:
                    return pa.table({"g": pa.array([], pa.string()),
                                     "v": pa.array([], pa.float64())})
                return pa.table({"g": pa.array(gs, pa.string()),
                                 "v": pa.array(np.concatenate(vs))})

            sl = src.map_batches(
                sliver_partial, batch_format="pyarrow", batch_size=None
            ).to_pandas()
            for g, todo in plan.items():
                if g not in fetch:
                    continue
                gv = np.sort(sl[sl["g"] == g]["v"].to_numpy()) if len(sl) else np.array([])
                for j, (lo, hi, off, _w) in todo:
                    seg = gv[(gv > lo) & (gv < hi)]
                    results[g][j] = float(seg[off])

        if not need_refine:
            break
        extra = sample_pass(
            ray.put({g: rate_of[g] for g in need_refine}),
            ray.put({g: (np.array(lo), np.array(hi))
                     for g, (lo, hi) in need_refine.items()}),
        )
        for g, newp in extra.items():
            pivots[g] = np.unique(np.concatenate([pivots[g], newp]))

    rows = []
    for g in sorted(n_of):
        for q, v in zip(qs, results[g]):
            rows.append((g, q, v))
    out = pd.DataFrame(rows, columns=["g", "q", "value"])
    out["q"] = out["q"].astype(np.float64)
    out["value"] = out["value"].astype(np.float64)
    if by is None:
        return out[["q", "value"]].reset_index(drop=True)
    return out.rename(columns={"g": by}).reset_index(drop=True)


def approx_quantiles(ds, col: str, qs, by: str | None = None,
                     k_per_block: int = 4096) -> pd.DataFrame:
    """ONE-pass approximate quantiles: each block sorts locally and
    keeps ``k_per_block`` evenly-spaced order statistics, each weighted
    ``n_block / k``; the driver computes weighted quantiles over the
    concatenated summaries. Deterministic (no sampling), mergeable
    (summaries are just weighted values), and rank error is bounded by
    ``Σ n_b / (2·k)`` — with the default k and Ray's ~64 MB blocks
    that is ≲0.02% of N regardless of scale. The EXACT multi-pass
    sibling is ``exact_quantiles``; this is the single-scan option for
    pipelines that touch the data once (e.g. a quality-cut threshold
    during ingest). Nulls dropped; returns (q, value) like the exact
    path."""
    import ray  # noqa: F401  (parity with the module's other entry points)

    qs = [float(q) for q in qs]
    cols = [col] if by is None else [by, col]

    def _order_stats(vals: np.ndarray):
        vals = np.sort(vals)
        n = len(vals)
        k = min(k_per_block, n)
        # evenly spaced order statistics, endpoints included
        idx = np.unique(np.round(np.linspace(0, n - 1, k)).astype(np.int64))
        w = np.full(len(idx), n / len(idx), dtype=np.float64)
        return vals[idx], w

    def summarize(batch: pa.Table) -> pa.Table:
        gs, vs, ws = [], [], []
        if by is None:
            vals = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            vals = vals[~pd.isna(vals)]
            if len(vals):
                v, w = _order_stats(vals)
                gs.append(np.full(len(v), _NOGROUP, dtype=object))
                vs.append(v)
                ws.append(w)
        else:
            df = pd.DataFrame(
                {"g": batch[by].cast(pa.string()).to_pandas(),
                 "v": batch[col].to_numpy(zero_copy_only=False)}
            ).dropna()
            for g, sub in df.groupby("g", sort=False):
                v, w = _order_stats(sub["v"].to_numpy(np.float64))
                gs.append(np.full(len(v), g, dtype=object))
                vs.append(v)
                ws.append(w)
        if not gs:
            return pa.table({"g": pa.array([], pa.string()),
                             "v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        return pa.table({"g": pa.array(np.concatenate(gs), pa.string()),
                         "v": pa.array(np.concatenate(vs)),
                         "w": pa.array(np.concatenate(ws))})

    summ = (
        ds.select_columns(cols)
        .map_batches(summarize, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    if len(summ) == 0:
        out = pd.DataFrame({"q": [], "value": []})
        if by is not None:
            out.insert(0, by, [])
        return out
    rows = []
    for g, sub in summ.groupby("g"):
        order = np.argsort(sub["v"].to_numpy(), kind="stable")
        v = sub["v"].to_numpy()[order]
        w = sub["w"].to_numpy()[order]
        cum = np.cumsum(w)
        total = cum[-1]
        for q in qs:
            r = max(math.ceil(q * total), 1)  # percentile_disc-style rank
            # clamp: per-block weights n/len(idx) need not sum to exactly
            # n in float64, so at q=1.0 r can exceed cum[-1] by ulps and
            # searchsorted would index past the end
            j = min(np.searchsorted(cum, r, side="left"), len(v) - 1)
            rows.append((g, q, float(v[j])))
    out = pd.DataFrame(rows, columns=["g", "q", "value"])
    out["q"] = out["q"].astype(np.float64)
    out["value"] = out["value"].astype(np.float64)
    if by is None:
        return out[["q", "value"]].reset_index(drop=True)
    return (out.rename(columns={"g": by})
            .sort_values([by, "q"], ignore_index=True))
