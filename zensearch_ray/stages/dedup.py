"""Exact deduplication operators (A7 + D1).

Reference semantics: dedup is a side effect of ``UNIQUE`` constraints +
duplicate-key-error swallowing on insert (``db.init.sql:10,24,33``;
``database/src/database.ts:59-91``) — i.e. keep the FIRST row per key.

Rebuild: an explicit, scale-aware operator. A naive
``groupby(key).map_groups(head(1))`` makes one Python call per group —
one per DOCUMENT — which is wrong at 10^12 rows. With an order column
the plan is two passes and NO row shuffle at all:

  1. pruned pass over (key, order) only → bucketed groupby computing
     per-key (count, min order); keys with count > 1 and their winning
     order value form a SMALL broadcast map (duplicates are rare);
  2. one full pass: a row streams through iff its key is not
     duplicated, or its order value equals the key's winner.

Only per-key partial rows ever shuffle (the metadata aggregate); row
payloads never do. Membership tests are vectorized ``pc.is_in``
(VERDICT r1 item 2). Without an order column the keep-first reduction
falls back to shuffling just the duplicated sliver through a groupby.

Caveat (documented contract): the order column must not repeat within a
duplicated key (true for ingest timestamps and unique ids); ties would
keep multiple rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _key_count_partials(key_col: str, order_col: str | None = None):
    def fn(batch: pa.Table) -> pa.Table:
        if order_col is None:
            vc = batch[key_col].value_counts()
            return pa.table(
                {
                    key_col: vc.field("values"),
                    "cnt_partial": vc.field("counts").cast(pa.int64()),
                }
            )
        df = batch.select([key_col, order_col]).to_pandas()
        agg = df.groupby(key_col, as_index=False).agg(
            cnt_partial=(order_col, "size"), min_order=(order_col, "min")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

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
    or arbitrary-but-deterministic one row when None). Returns a
    Dataset with unique ``key_col``. See module docstring for the
    two-pass, shuffle-free plan.
    """
    import ray

    if order_col is None:
        return _dedup_sliver_shuffle(ds, key_col)

    from zensearch_ray.functions.agg import bucketed_groupby_agg

    agg = bucketed_groupby_agg(
        ds.map_batches(_key_count_partials(key_col, order_col), batch_format="pyarrow"),
        keys=[key_col],
        aggs={"cnt_partial": "sum", "min_order": "min"},
    )
    winners = agg.map_batches(
        lambda t: t.filter(pc.greater(t["cnt_partial"], 1)), batch_format="pyarrow"
    ).to_pandas()
    if winners.empty:
        return ds
    # small by the rare-duplicates assumption; broadcast once
    winner_map = dict(zip(winners[key_col], winners["min_order"]))
    ref = ray.put(winner_map)
    dup_key_arr = pa.array(list(winner_map.keys()))

    def keep(batch: pa.Table) -> pa.Table:
        wm = ray.get(ref)
        is_dup = pc.is_in(
            batch[key_col], value_set=dup_key_arr.cast(batch[key_col].type)
        )
        dup_mask = is_dup.to_numpy(zero_copy_only=False)
        if not dup_mask.any():
            return batch
        keep_mask = ~dup_mask
        idx = np.flatnonzero(dup_mask)
        sliver = batch.take(pa.array(idx)).select([key_col, order_col]).to_pandas()
        won = (
            sliver[key_col].map(wm).to_numpy() == sliver[order_col].to_numpy()
        )
        keep_mask[idx[won]] = True
        return batch.filter(pa.array(keep_mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def _dedup_sliver_shuffle(ds, key_col: str):
    """No order column: shuffle only the duplicated sliver through a
    keep-one groupby; clean rows stream through a vectorized filter."""
    import ray

    dup_keys = find_duplicate_keys(ds, key_col)
    if not dup_keys:
        return ds
    dup_arr = pa.array(list(dup_keys))
    dup_ref = ray.put(dup_arr)

    def split(batch: pa.Table, invert: bool) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = pc.is_in(batch[key_col], value_set=dups.cast(batch[key_col].type))
        return batch.filter(pc.invert(mask) if invert else mask)

    clean = ds.map_batches(split, fn_kwargs={"invert": True}, batch_format="pyarrow")
    dups = ds.map_batches(split, fn_kwargs={"invert": False}, batch_format="pyarrow")

    def keep_first(group: pa.Table) -> pa.Table:
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


# worker-global token-hash memo for the n-gram stage (Zipf vocab →
# amortized O(1) per occurrence)
_HASHERS: dict = {}

_NGRAM_C = np.uint64(0x100000001B3)  # FNV-ish odd multiplier, invertible mod 2^64


def _window_hash_stream(texts, doc_ids, n: int, hasher):
    """Shared n-gram window hashing: tokenize each text, hash tokens
    (memoized), then compute every length-``n`` window's rolling hash
    g(i) = Σ_j th[i+j]·C^j over the BATCH-concatenated token-hash
    stream — one numpy pass per window offset, windows crossing doc
    boundaries masked out by construction of the gather index.

    Returns ``(dids, w_counts, hashes)``: docs with ≥ n tokens, their
    per-doc window counts, and all window hashes (uint64) concatenated
    in doc order — or ``None`` if no doc qualifies."""
    from zensearch_ray.functions.text import tokenize

    tok_arrays, doc_rep = [], []
    for did, text in zip(doc_ids, texts):
        toks = tokenize(text)
        if len(toks) < n:
            continue
        tok_arrays.append(hasher(toks))
        doc_rep.append((did, len(toks)))
    if not tok_arrays:
        return None
    th = np.concatenate(tok_arrays)
    lens = np.array([l for _, l in doc_rep], dtype=np.int64)
    dids = np.array([d for d, _ in doc_rep], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(lens.sum())
    n_windows = total - n + 1
    acc = np.zeros(n_windows, dtype=np.uint64)
    mult = np.uint64(1)
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is the hash
        for j in range(n):
            acc += th[j : j + n_windows] * mult
            mult *= _NGRAM_C
    w_counts = lens - n + 1
    out_base = np.concatenate(([0], np.cumsum(w_counts)[:-1]))
    idx = np.repeat(starts - out_base, w_counts) + np.arange(int(w_counts.sum()))
    return dids, w_counts, acc[idx]


def decontaminate(ds, benchmark_texts: list[str], n: int = 8):
    """Benchmark decontamination — the GPT-3/C4/Llama training-data
    step: flag every corpus document sharing ANY token ``n``-gram with
    a benchmark/eval text. ``n_overlap`` counts the doc's window
    OCCURRENCES whose n-gram appears in the benchmark set (multiplicity
    kept, matching the SQL oracle's join-count); ``contaminated`` is
    ``n_overlap > 0``. Docs shorter than ``n`` tokens pass clean with
    ``n_ngrams = 0``. Columns: (doc_id, n_ngrams, n_overlap,
    contaminated).

    100-TB shape: the benchmark's n-gram hashes are a SMALL broadcast
    side (``ray.put`` once, read per actor) — one streaming map pass
    over the corpus, NO shuffle at all. Hash-collision stance identical
    to ``dup_ngram_rate`` (documented ~0 at realistic gram counts).
    """
    import ray

    from zensearch_ray.stages.minhash import _TokenHasher

    bench = _window_hash_stream(
        benchmark_texts, range(len(benchmark_texts)), n, _TokenHasher()
    )
    bench_sorted = (
        np.unique(bench[2]) if bench is not None else np.empty(0, dtype=np.uint64)
    )
    bench_ref = ray.put(bench_sorted)

    def flag(batch: pa.Table) -> pa.Table:
        # zero-copy plasma read of the broadcast benchmark hash array
        bset = ray.get(bench_ref)
        dids_all = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        n_ngrams = np.zeros(len(texts), dtype=np.int64)
        n_overlap = np.zeros(len(texts), dtype=np.int64)
        hasher = _HASHERS.setdefault("h", _TokenHasher())
        stream = _window_hash_stream(texts, np.arange(len(texts)), n, hasher)
        if stream is not None:
            rows, w_counts, hashes = stream
            hit = np.isin(hashes, bset).astype(np.int64)
            bounds = np.concatenate(([0], np.cumsum(w_counts)))
            per_doc = np.add.reduceat(hit, bounds[:-1]) if len(hit) else []
            n_ngrams[rows] = w_counts
            n_overlap[rows] = per_doc
        return pa.table(
            {
                "doc_id": pa.array(dids_all, type=pa.int64()),
                "n_ngrams": pa.array(n_ngrams, type=pa.int64()),
                "n_overlap": pa.array(n_overlap, type=pa.int64()),
                "contaminated": pa.array(n_overlap > 0, type=pa.bool_()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def dup_ngram_rate(ds, n: int = 8, n_buckets: int = 64):
    """Per-document duplicated-n-gram rate — the C4/RefinedWeb-style
    contamination signal: for each doc, the fraction of its token
    n-gram OCCURRENCES whose exact n-gram appears more than once in
    the whole corpus (within-doc repeats count). Docs with fewer than
    ``n`` tokens are excluded. Columns:
    (doc_id, n_ngrams, n_dup, dup_rate).

    100-TB shape (no driver-side state, no corpus broadcast; r2s6:
    single tokenize pass and NO join — a doc's total window count is
    the sum of its per-gram counts, so totals ride the same exchange):

    1. map: per (doc, n-gram) pre-aggregated occurrence counts, the
       n-gram shipped as its 8-byte hash64 (not the string);
    2. one hash-bucket exchange on the n-gram hash: inside a bucket,
       global counts per hash; each bucket emits per-doc PARTIALS
       (n_dup = occurrences of duplicated grams, n_win = all
       occurrences) — gram hashes never leave the bucket;
    3. one per-doc bucketed sum of those two columns → finish.

    Hash note: 64-bit collisions would over-count a pair of distinct
    n-grams as duplicated; at 10^9 distinct n-grams the expected
    collision count is ~0.03 — the standard engineering trade for an
    8-byte exchange key (same stance as the minhash family).
    """
    from zensearch_ray.functions.agg import bucketed_groupby_sum
    from zensearch_ray.functions.rounding import round6
    from zensearch_ray.stages.minhash import _TokenHasher

    def gram_partials(batch: pa.Table) -> pa.Table:
        # vectorized window hashing (shared `_window_hash_stream`);
        # per-(doc, gram) counts from one pandas groupby (C path) —
        # no per-window Python strings.
        hasher = _HASHERS.setdefault("h", _TokenHasher())
        stream = _window_hash_stream(
            batch["text"].to_pylist(), batch["doc_id"].to_pylist(), n, hasher
        )
        if stream is None:
            return pa.table(
                {
                    "h": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        dids, w_counts, hashes = stream
        import pandas as _pd

        df = _pd.DataFrame(
            {
                "h": hashes.view(np.int64),
                "doc_id": np.repeat(dids, w_counts),
            }
        )
        g = df.groupby(["h", "doc_id"], sort=False).size().reset_index(name="c")
        return pa.table(
            {
                "h": pa.array(g["h"].to_numpy(np.int64)),
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "c": pa.array(g["c"].to_numpy(np.int64)),
            }
        )

    grams = ds.map_batches(gram_partials, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (
            batch["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def bucket_stats(group: pa.Table) -> pa.Table:
        # per-doc partials within the bucket: n_win = all occurrences,
        # n_dup = occurrences whose gram's GLOBAL count (exact here —
        # the gram's every row is in this bucket) exceeds 1. Pure
        # numpy bincount grouping — no Arrow→pandas copy of the bucket
        c = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, hinv = np.unique(
            group["h"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        gsum = np.bincount(hinv, weights=c)
        dup_c = np.where(gsum[hinv] > 1, c, 0)
        docs, dinv = np.unique(
            group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_inverse=True,
        )
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "n_dup": pa.array(
                    np.bincount(dinv, weights=dup_c).astype(np.int64)
                ),
                "n_win": pa.array(
                    np.bincount(dinv, weights=c).astype(np.int64)
                ),
            }
        )

    partials = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_stats, batch_format="pyarrow")
    )
    per_doc = bucketed_groupby_sum(partials, ["doc_id"], ["n_dup", "n_win"])
    if per_doc.schema() is None:
        # no doc had >= n tokens → typed empty result
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_ngrams": pa.array([], type=pa.int64()),
                    "n_dup": pa.array([], type=pa.int64()),
                    "dup_rate": pa.array([], type=pa.float64()),
                }
            )
        )

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["n_dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = batch["n_win"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_ngrams": pa.array(nn),
                "n_dup": pa.array(nd),
                "dup_rate": pa.array(round6(nd / nn), type=pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def _span_rows(batch: pa.Table, w: int, hasher) -> pa.Table:
    """(h, doc_id, span_idx) for every non-overlapping ``w``-token span
    in the batch — one vectorized pass over the batch-concatenated
    token-hash stream (shared idiom with ``_window_hash_stream``). The
    span hash is a positional polynomial over the span's token hashes
    plus a length salt, so a short tail span never collides with a full
    span's prefix. Docs with zero tokens emit nothing."""
    from zensearch_ray.functions.text import tokenize

    tok_arrays, doc_rep = [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = tokenize(text)
        if toks:
            tok_arrays.append(hasher(toks))
            doc_rep.append((did, len(toks)))
    empty = pa.table(
        {
            "h": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
            "span_idx": pa.array([], type=pa.int64()),
        }
    )
    if not tok_arrays:
        return empty
    th = np.concatenate(tok_arrays)
    lens = np.array([l for _, l in doc_rep], dtype=np.int64)
    dids = np.array([d for d, _ in doc_rep], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
    span_pos = pos % w
    cpow = np.empty(w, dtype=np.uint64)
    cpow[0] = 1
    with np.errstate(over="ignore"):
        for j in range(1, w):
            cpow[j] = cpow[j - 1] * _NGRAM_C
        weighted = th * cpow[span_pos]
        span_starts = np.flatnonzero(span_pos == 0)
        acc = np.add.reduceat(weighted, span_starts)
        span_len = np.diff(np.append(span_starts, len(pos))).astype(np.uint64)
        h = acc * _NGRAM_C + span_len
    n_spans = (lens + w - 1) // w
    return pa.table(
        {
            "h": pa.array(h.view(np.int64)),
            "doc_id": pa.array(np.repeat(dids, n_spans)),
            "span_idx": pa.array(pos[span_starts] // w),
        }
    )


def _rebuild_doc(toks, loser_idxs, w: int):
    """Drop the loser spans from one doc's token list; returns
    (clean_text, n_spans, n_removed)."""
    ns = (len(toks) + w - 1) // w
    if len(loser_idxs) == 0:
        return " ".join(toks), ns, 0
    keep = ~np.isin(np.arange(len(toks)) // w, loser_idxs)
    kept = [t for t, k in zip(toks, keep) if k]
    return " ".join(kept), ns, int(len(loser_idxs))


def span_dedup(ds, w: int = 8, n_buckets: int = 64, via: str = "broadcast"):
    """C4/RefinedWeb-style duplicate-SPAN removal. Each doc's tokens
    split into consecutive non-overlapping ``w``-token spans (short
    tail kept); a span whose exact token sequence occurs more than once
    in the corpus keeps ONLY its globally-first occurrence (min
    ``(doc_id, span_idx)``) — every other occurrence is cut from its
    doc. Output ``(doc_id, text, n_spans, n_removed)`` for every input
    doc; ``text`` is the kept spans' tokens re-joined with single
    spaces (possibly ``''``).

    100-TB shape — the corpus text NEVER rides the duplicate-detection
    exchange (C4's own implementation shuffles the full text twice):

    1. map: (span_hash, doc_id, span_idx) rows, 24 B/span — the
       vectorized polynomial hash above;
    2. ONE bucket exchange on the span hash; inside a bucket each
       duplicated hash's occurrences (global by construction) are
       ordered and every non-winner emits a LOSER row (doc_id,
       span_idx) — the duplicated sliver only;
    3. join losers back to docs:
       - ``via="broadcast"`` (default): the sliver is ``ray.put`` once
         as two sorted arrays and a second streaming map pass rebuilds
         each doc — zero text movement (the ``dedup_by_key`` winner-map
         pattern; right while losers ≪ corpus, the common case);
       - ``via="shuffle"``: docs and losers co-bucket on
         ``doc_id % n_buckets`` — text moves through exactly ONE
         exchange, unbounded loser sets; pick this when the measured
         dup rate makes the sliver too big to broadcast.

    Hash note: 64-bit span-hash collisions would merge two distinct
    spans; expected collisions ~0 at realistic span counts (same
    stance as ``dup_ngram_rate``). Cost note: the rebuild re-tokenizes
    (two tokenize passes total) — carrying tokens instead would move
    the full text.
    """
    import ray

    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.stages.minhash import _TokenHasher

    def partials(batch: pa.Table) -> pa.Table:
        hasher = _HASHERS.setdefault("h", _TokenHasher())
        return _span_rows(batch, w, hasher)

    spans = ds.map_batches(partials, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (
            batch["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def bucket_losers(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = group["span_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, d, h))
        h_s = h[order]
        # sorted by (h, doc_id, span_idx): a loser is every row AFTER the
        # first of its h-run (same-h predecessor) — ≡ dup-group & ~first
        loser = order[np.r_[False, h_s[1:] == h_s[:-1]]]
        return pa.table({"doc_id": pa.array(d[loser]),
                         "span_idx": pa.array(s[loser])})

    losers = (
        spans.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_losers, batch_format="pyarrow")
    )

    if via == "broadcast":
        # the duplicated sliver comes to the driver ONCE, sorted, and is
        # broadcast via the object store (zero-copy reads per actor)
        ldf = losers.to_pandas()
        if len(ldf):
            ldf = ldf.sort_values(["doc_id", "span_idx"])
            ld = np.ascontiguousarray(ldf["doc_id"].to_numpy(np.int64))
            li = np.ascontiguousarray(ldf["span_idx"].to_numpy(np.int64))
        else:
            ld = np.empty(0, dtype=np.int64)
            li = np.empty(0, dtype=np.int64)
        loser_ref = ray.put((ld, li))

        def rebuild(batch: pa.Table) -> pa.Table:
            ld, li = ray.get(loser_ref)
            texts, nsp, nrm = [], [], []
            dids = batch["doc_id"].to_numpy(zero_copy_only=False)
            for did, text in zip(dids, batch["text"].to_pylist()):
                toks = tokenize(text)
                lo = np.searchsorted(ld, did, "left")
                hi = np.searchsorted(ld, did, "right")
                t, ns, nr = _rebuild_doc(toks, li[lo:hi], w)
                texts.append(t)
                nsp.append(ns)
                nrm.append(nr)
            return pa.table(
                {
                    "doc_id": pa.array(dids, type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                    "n_spans": pa.array(nsp, type=pa.int64()),
                    "n_removed": pa.array(nrm, type=pa.int64()),
                }
            )

        return ds.map_batches(rebuild, batch_format="pyarrow")

    if via != "shuffle":
        raise ValueError(f"unknown via={via!r} (broadcast|shuffle)")

    def doc_side(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(dids),
                "span_idx": pa.array(
                    np.full(len(dids), -1, dtype=np.int64)
                ),
                "text": batch["text"].cast(pa.string()),
                "__bucket": pa.array(
                    (dids % n_buckets).astype(np.int32)
                ),
            }
        )

    def loser_side(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(dids),
                "span_idx": batch["span_idx"].cast(pa.int64()),
                "text": pa.nulls(len(dids), type=pa.string()),
                "__bucket": pa.array(
                    (dids % n_buckets).astype(np.int32)
                ),
            }
        )

    from zensearch_ray.functions.agg import union_ready

    tagged = union_ready(  # feeds a shuffle — see union_ready
        ds.map_batches(doc_side, batch_format="pyarrow"),
        losers.map_batches(loser_side, batch_format="pyarrow"),
    )

    def rebuild_group(group: pa.Table) -> pa.Table:
        span_idx = (
            group["span_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        dids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_mask = span_idx < 0
        # loser spans sorted by (doc_id, span_idx): per-doc slices fall
        # out of two searchsorteds instead of a pandas groupby
        l_d, l_s = dids[~doc_mask], span_idx[~doc_mask]
        lorder = np.lexsort((l_s, l_d))
        l_d, l_s = l_d[lorder], l_s[lorder]
        texts = group["text"]
        out = {"doc_id": [], "text": [], "n_spans": [], "n_removed": []}
        for i in np.flatnonzero(doc_mask):
            did = dids[i]
            lo = np.searchsorted(l_d, did, "left")
            hi = np.searchsorted(l_d, did, "right")
            t, ns, nr = _rebuild_doc(
                tokenize(texts[i].as_py()), l_s[lo:hi], w
            )
            out["doc_id"].append(int(did))
            out["text"].append(t)
            out["n_spans"].append(ns)
            out["n_removed"].append(nr)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "text": pa.array(out["text"], type=pa.string()),
                "n_spans": pa.array(out["n_spans"], type=pa.int64()),
                "n_removed": pa.array(out["n_removed"], type=pa.int64()),
            }
        )

    return (
        tagged.groupby("__bucket")
        .map_groups(rebuild_group, batch_format="pyarrow")
    )


def exact_substr_dedup(ds, l: int = 20, n_buckets: int = 64):
    """ExactSubstr duplicate-substring removal — the sliding-window
    generalization of ``span_dedup`` (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    ExactSubstr operator, re-expressed over token windows): any token
    substring of length ≥ ``l`` that occurs more than once in the
    corpus keeps ONLY its globally-first occurrence (minimal
    ``(doc_id, pos)``); every other occurrence's token interval
    ``[pos, pos+l)`` is CUT from its document, with overlapping cuts
    merging naturally (the removed set is the UNION of loser
    intervals, so a long duplicated passage — which contributes one
    loser window per position — is removed exactly once, not
    re-counted per window). Output ``(doc_id, text, n_tokens,
    n_removed)`` for every input doc; docs shorter than ``l`` tokens
    pass through unchanged.

    100-TB shape (text never rides the duplicate-detection exchange):

    1. map: ``(window_hash, doc_id, pos)`` rows — 24 B per sliding
       window via the shared vectorized rolling hash
       (``_window_hash_stream``), ~24 B/token of corpus;
    2. ONE bucket exchange on the hash; inside a bucket every
       duplicated hash's occurrences order by ``(doc_id, pos)`` and
       all but the first emit LOSER rows ``(doc_id, pos)`` — bounded
       by the duplicated-token volume, not the corpus;
    3. the loser sliver broadcasts once as two sorted arrays
       (``ray.put``) and one streaming rebuild pass masks each doc's
       loser intervals with a difference-array cumsum (O(tokens) per
       doc, no per-window Python) — the ``span_dedup``
       ``via="broadcast"`` pattern; for loser sets too big to
       broadcast, co-bucket text and losers on ``doc_id`` exactly as
       ``span_dedup(via="shuffle")`` does (same two-sided union
       machinery applies verbatim).

    Hash note: 64-bit window-hash collisions would cut a false
    duplicate; expected collisions ~0 at realistic window counts
    (the ``dup_ngram_rate`` stance).
    """
    import ray

    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.stages.minhash import _TokenHasher

    def window_rows(batch: pa.Table) -> pa.Table:
        hasher = _HASHERS.setdefault("h", _TokenHasher())
        stream = _window_hash_stream(
            batch["text"].to_pylist(), batch["doc_id"].to_pylist(), l, hasher
        )
        if stream is None:
            return pa.table(
                {
                    "h": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                }
            )
        dids, w_counts, hashes = stream
        pos = np.arange(int(w_counts.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(w_counts)[:-1])), w_counts
        )
        return pa.table(
            {
                "h": pa.array(hashes.view(np.int64)),
                "doc_id": pa.array(np.repeat(dids, w_counts)),
                "pos": pa.array(pos),
            }
        )

    windows = ds.map_batches(window_rows, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (
            batch["h"].to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def bucket_losers(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = group["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((p, d, h))
        h_s = h[order]
        # loser = every row after the first of its h-run (see span_dedup)
        loser = order[np.r_[False, h_s[1:] == h_s[:-1]]]
        return pa.table({"doc_id": pa.array(d[loser]),
                         "pos": pa.array(p[loser])})

    losers = (
        windows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_losers, batch_format="pyarrow")
    )

    ldf = losers.to_pandas()
    if len(ldf):
        ldf = ldf.sort_values(["doc_id", "pos"])
        ld = np.ascontiguousarray(ldf["doc_id"].to_numpy(np.int64))
        lp = np.ascontiguousarray(ldf["pos"].to_numpy(np.int64))
    else:
        ld = np.empty(0, dtype=np.int64)
        lp = np.empty(0, dtype=np.int64)
    loser_ref = ray.put((ld, lp))

    def rebuild(batch: pa.Table) -> pa.Table:
        ld, lp = ray.get(loser_ref)
        texts, ntok, nrm = [], [], []
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        for did, text in zip(dids, batch["text"].to_pylist()):
            toks = tokenize(text)
            n = len(toks)
            lo = np.searchsorted(ld, did, "left")
            hi = np.searchsorted(ld, did, "right")
            if lo == hi or n == 0:
                texts.append(" ".join(toks))
                ntok.append(n)
                nrm.append(0)
                continue
            # union of [p, p+l) via difference array + cumsum
            diff = np.zeros(n + 1, dtype=np.int64)
            starts = lp[lo:hi]
            ends = np.minimum(starts + l, n)
            np.add.at(diff, starts, 1)
            np.add.at(diff, ends, -1)
            covered = np.cumsum(diff[:-1]) > 0
            kept = [t for t, c in zip(toks, covered) if not c]
            texts.append(" ".join(kept))
            ntok.append(n)
            nrm.append(int(covered.sum()))
        # pass-through columns survive (prep integration): replace
        # text, append the two stat columns
        out = batch.set_column(
            batch.column_names.index("text"),
            "text",
            pa.array(texts, type=pa.string()),
        )
        return out.append_column(
            "n_tokens", pa.array(ntok, type=pa.int64())
        ).append_column("n_removed", pa.array(nrm, type=pa.int64()))

    return ds.map_batches(rebuild, batch_format="pyarrow")
