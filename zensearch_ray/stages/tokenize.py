"""Tokenization stages (operators E5/E7/E8 + A3 under the pinned spec).

Two ``map_batches`` bodies over zero-copy Arrow batches:

  * ``TokenizeStage``: corpus rows → per-doc rows with ``doc_id``,
    ``url``, ``doc_len`` and the per-doc ``(terms, tfs)`` histogram as
    Arrow list columns. Emitting per-doc (term, tf) AGGREGATES — not
    per-token rows — cuts shuffle volume by the in-document repetition
    factor (SURVEY.md §4.2 "exploding tokens").
  * ``ExplodeStage``: tokenized rows → exploded posting-fragment rows
    ``(part, term, doc_id, tf, dl)`` where ``part`` encodes the
    term-shard plus a salt sub-partition for df-heavy terms (stopword
    skew, north_rule): heavy terms are split into ``salt_subs``
    sub-partitions keyed by ``doc_id % salt_subs`` so no single shuffle
    group holds a whole stopword posting list.

Reference analogs: doc length ``search-engine/utilities/doc_length.go:5-16``,
term frequency ``search-engine/internal/bm25/tf.go:21`` (substring
counting, replaced by token equality per SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from zensearch_ray.functions.ids import hash64, url_doc_id
from zensearch_ray.functions.text import s_stem, term_frequencies, tokenize


def part_key(shard: int, sub: int, salt_subs: int) -> int:
    """Combined partition key for the one wide shuffle."""
    return shard * salt_subs + sub


class TokenizeStage:
    """Stateless-by-content but run as an actor pool so the (cheap here,
    model-scale in general) tokenizer setup happens once per actor."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str | None = None,
        positions: bool = False,
        attrs: tuple = (),
        title_boost: int = 0,
        stopwords: tuple = (),
        stem: bool = False,
        synonyms: tuple = (),
    ):
        self.text_col = text_col
        # analyzer config: index-time synonym FOLDING (the contraction
        # form of Lucene's SynonymFilter): each (variant, canonical)
        # pair rewrites the variant token onto the canonical term, so
        # tf/df mass merges and one posting list serves the whole
        # synonym group. Applied BEFORE stem (pinned order: surface
        # variants fold first, then plural stemming). Compatible with
        # positions — no token is dropped, occurrences keep offsets.
        norm_pairs = []
        for a, b in synonyms:
            ta, tb = tokenize(a), tokenize(b)
            if len(ta) != 1 or len(tb) != 1:
                raise ValueError(
                    f"synonym pair {(a, b)!r} must be single tokens of "
                    "the pinned tokenizer (multi-token and empty forms "
                    "can never match a token stream)"
                )
            norm_pairs.append((ta[0], tb[0]))
        self.syn = dict(norm_pairs)
        self.id_col = id_col  # None → derive doc_id = hash64(url)
        # index-time plural stemming (the pinned S-stemmer,
        # functions/text.s_stem): applied per UNIQUE term AFTER the
        # stopword filter — tf mass merges onto the stem, doc_len is
        # invariant (no token is dropped). COMPATIBLE with positions,
        # unlike stopwords: no token is removed, so every occurrence
        # keeps its offset — the positional branch stems the token
        # stream before factorizing, and surface variants' occurrence
        # lists merge under one stem key with adjacency intact.
        self.stem = stem
        # index-time stopword removal (analyzer config): stop terms are
        # dropped from tf AND doc_len (Lucene StopFilter semantics), so
        # df/idf/avgdl all reflect the filtered token stream and the
        # query path needs no change at all — a stop term simply has no
        # postings. Incompatible with positions (dropping tokens would
        # silently change phrase adjacency; Lucene leaves position gaps
        # — a different, deliberate semantic this index doesn't carry).
        self.stopwords = frozenset(stopwords)
        if self.stopwords and positions:
            raise ValueError(
                "stopwords are incompatible with a positional build: "
                "removing tokens changes phrase adjacency semantics"
            )
        # positional build: also emit per-(doc, term) token positions
        # (``poss`` list<list<int32>> aligned with ``terms``) so phrase
        # queries resolve from the index alone — no corpus re-scan
        self.positions = positions
        # attribute columns passed through into docmeta (facet sidecar)
        self.attrs = tuple(attrs)
        # BM25F field weighting folded into the index at tokenize time:
        # tf' = tf_body + boost·tf_title, dl' = dl_body + boost·dl_title
        # (integer "token repetition" field boost — Lucene-era BM25F
        # simplification). Everything downstream — explode, shuffle,
        # codec, block-max pruning, deletes, facets — is unchanged.
        self.title_boost = int(title_boost)
        if self.title_boost and positions:
            raise ValueError(
                "title_boost is incompatible with a positional build: "
                "positions index BODY token offsets, and boosted tfs "
                "would disagree with position-list lengths"
            )

    def _attr_cols(self, batch: pa.Table) -> dict:
        missing = [a for a in self.attrs if a not in batch.column_names]
        if missing:
            raise ValueError(
                f"attr column(s) {missing} not in corpus batch "
                f"(columns: {batch.column_names})"
            )
        return {a: batch[a] for a in self.attrs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.id_col is not None:
            doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            doc_ids = np.fromiter(
                (url_doc_id(u) for u in batch["url"].to_pylist()),
                dtype=np.int64,
                count=len(texts),
            )
        urls = (
            batch["url"]
            if "url" in batch.column_names
            else pa.array([""] * len(texts), type=pa.string())
        )
        titles = (
            batch["title"]
            if "title" in batch.column_names
            else pa.array([""] * len(texts), type=pa.string())
        )
        doc_lens = np.empty(len(texts), dtype=np.int64)
        if self.positions:
            # vectorized positional tokenize: factorize the token stream
            # (C path) → term codes; a stable argsort of the codes IS
            # the per-term position lists, grouped — no Python append
            # per token. Nested list columns are assembled from offset
            # buffers directly.
            import pandas as _pd

            all_terms: list[str] = []
            tf_vals: list[np.ndarray] = []
            pos_vals: list[np.ndarray] = []
            outer_counts = np.empty(len(texts), dtype=np.int64)
            for i, text in enumerate(texts):
                toks = tokenize(text)
                if self.syn:
                    syn = self.syn
                    toks = [syn.get(t, t) for t in toks]
                if self.stem:
                    toks = [s_stem(t) for t in toks]
                doc_lens[i] = len(toks)
                if not toks:
                    outer_counts[i] = 0
                    continue
                # np object array: list input to factorize is deprecated
                codes, uniques = _pd.factorize(
                    np.asarray(toks, dtype=object)
                )  # appearance order
                counts = np.bincount(codes, minlength=len(uniques))
                order = np.argsort(codes, kind="stable")
                all_terms.extend(uniques)
                tf_vals.append(counts)
                pos_vals.append(order)
                outer_counts[i] = len(uniques)
            tfs_flat = (
                np.concatenate(tf_vals) if tf_vals else np.empty(0, np.int64)
            )
            inner_offs = np.zeros(len(tfs_flat) + 1, dtype=np.int32)
            np.cumsum(tfs_flat, out=inner_offs[1:])
            outer_offs = np.zeros(len(texts) + 1, dtype=np.int32)
            np.cumsum(outer_counts, out=outer_offs[1:])
            pos_flat = (
                np.concatenate(pos_vals) if pos_vals else np.empty(0, np.int64)
            )
            inner = pa.ListArray.from_arrays(
                pa.array(inner_offs, type=pa.int32()),
                pa.array(pos_flat.astype(np.int32)),
            )
            terms_arr = pa.ListArray.from_arrays(
                pa.array(outer_offs, type=pa.int32()),
                pa.array(all_terms, type=pa.string()),
            )
            tfs_arr = pa.ListArray.from_arrays(
                pa.array(outer_offs, type=pa.int32()),
                pa.array(tfs_flat.astype(np.int32)),
            )
            poss_arr = pa.ListArray.from_arrays(
                pa.array(outer_offs, type=pa.int32()), inner
            )
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, type=pa.int64()),
                    "url": urls,
                    "title": titles,
                    **self._attr_cols(batch),
                    "doc_len": pa.array(doc_lens, type=pa.int64()),
                    "terms": terms_arr,
                    "tfs": tfs_arr,
                    "poss": poss_arr,
                }
            )
        all_terms: list[str] = []
        tf_arrays: list[np.ndarray] = []
        counts = np.empty(len(texts), dtype=np.int64)
        boost = self.title_boost
        stop = self.stopwords
        title_texts = titles.to_pylist() if boost else None
        for i, text in enumerate(texts):
            tf = term_frequencies(text)
            if boost:
                for tok in tokenize(title_texts[i]):
                    tf[tok] = tf.get(tok, 0) + boost
            if stop:
                for s in stop:
                    tf.pop(s, None)
            if self.syn:
                syn = self.syn
                if any(t in syn for t in tf):
                    fold: dict = {}
                    for t, v in tf.items():
                        k2 = syn.get(t, t)
                        fold[k2] = fold.get(k2, 0) + v
                    tf = fold
            if self.stem:
                st: dict = {}
                for t, v in tf.items():
                    k2 = s_stem(t)
                    st[k2] = st.get(k2, 0) + v
                tf = st
            all_terms.extend(tf.keys())
            v = np.fromiter(tf.values(), dtype=np.int32, count=len(tf))
            tf_arrays.append(v)
            counts[i] = len(tf)
            doc_lens[i] = int(v.sum())
        offs = np.zeros(len(texts) + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        flat_tfs = (
            np.concatenate(tf_arrays) if tf_arrays else np.empty(0, np.int32)
        )
        # the tokenized table is MATERIALIZED into the object store and
        # then re-read by pass 1 and pass 2 — its bytes are the build's
        # biggest single memory mover. The term child ships
        # dictionary-encoded (int32 codes + per-block vocab, ~2.5x
        # smaller than repeated strings on web text); every consumer
        # (df_partials value_counts, explode's dictionary_encode — a
        # no-op on an already-dict array, docmeta's column projection)
        # reads it natively.
        flat_terms = pa.array(all_terms, type=pa.string()).dictionary_encode()
        off_arr = pa.array(offs, type=pa.int32())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "url": urls,
                "title": titles,
                **self._attr_cols(batch),
                "doc_len": pa.array(doc_lens, type=pa.int64()),
                "terms": pa.ListArray.from_arrays(off_arr, flat_terms),
                "tfs": pa.ListArray.from_arrays(
                    off_arr, pa.array(flat_tfs, type=pa.int32())
                ),
            }
        )


class ExplodeStage:
    """Tokenized rows → (part, term, doc_id, tf, dl) posting fragments.

    ``heavy_terms``: either a frozenset or a ``ray.ObjectRef`` to one —
    broadcast once via ``ray.put`` on the driver and resolved once per
    actor here (never re-shipped per batch).
    ``skip_parts``: optional set of committed part keys (resume path) —
    fragments destined for already-committed partitions are dropped at
    the map side, BEFORE the shuffle.
    """

    def __init__(
        self,
        num_shards: int,
        salt_subs: int,
        heavy_terms=None,
        skip_parts=None,
        docid32: bool = False,
        emit_dl: bool = True,
        emit_pos: bool = False,
    ):
        import ray

        if heavy_terms is not None and isinstance(heavy_terms, ray.ObjectRef):
            heavy_terms = ray.get(heavy_terms)
        self.heavy = frozenset(heavy_terms or ())
        self.num_shards = num_shards
        self.salt_subs = salt_subs
        self.skip_parts = frozenset(skip_parts or ())
        self.docid32 = docid32
        self.emit_dl = emit_dl
        self.emit_pos = emit_pos
        # per-actor memo: term → shard (vocab is Zipfian; memoization makes
        # shard hashing amortized O(1) per term occurrence)
        self._shard_memo: dict[str, int] = {}

    def _shard(self, term: str) -> int:
        s = self._shard_memo.get(term)
        if s is None:
            s = hash64(term) % self.num_shards
            self._shard_memo[term] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized explode: Arrow list-flatten (zero-copy) + per-batch
        dictionary encoding so shard/heavy lookups run once per UNIQUE
        term, then numpy gathers — no Python loop over postings."""
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_lens = batch["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms_col = batch["terms"].combine_chunks()
        tfs_col = batch["tfs"].combine_chunks()
        if isinstance(terms_col, pa.ChunkedArray):
            terms_col = terms_col.combine_chunks()
        if isinstance(tfs_col, pa.ChunkedArray):
            tfs_col = tfs_col.combine_chunks()

        lens = np.asarray(
            pa.compute.list_value_length(terms_col), dtype=np.int64
        )
        flat_terms = terms_col.flatten()  # zero-copy string array
        flat_tfs = np.asarray(tfs_col.flatten(), dtype=np.int32)
        rep_doc = np.repeat(doc_ids, lens)

        dic = flat_terms.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        vocab = dic.dictionary.to_pylist()
        shard_by_code = np.fromiter(
            (self._shard(t) for t in vocab), dtype=np.int64, count=len(vocab)
        )
        heavy_by_code = np.fromiter(
            (t in self.heavy for t in vocab), dtype=bool, count=len(vocab)
        )
        shard = shard_by_code[codes]
        sub = np.where(heavy_by_code[codes], rep_doc % self.salt_subs, 0)
        part = shard * self.salt_subs + sub

        # shuffle-volume discipline: the exploded stream is THE exchange,
        # so every byte matters at scale. term ships dictionary-encoded
        # (int32 codes + per-block vocab, ~2-3x smaller than repeated
        # strings); part is int32; doc_id drops to int32 when the BUILD
        # guarantees ids fit (dense id_ceiling < 2^31 — the decision is
        # per build, not per batch, so every block shares one schema);
        # dl is DROPPED entirely when the build broadcasts the dense
        # doc_id→dl array instead (emit_dl=False — see build_index).
        cols = {
            "part": pa.array(part.astype(np.int32)),
            "term": dic,
            "doc_id": pa.array(
                rep_doc.astype(np.int32) if self.docid32 else rep_doc
            ),
            "tf": pa.array(flat_tfs, type=pa.int32()),
        }
        if self.emit_dl:
            cols["dl"] = pa.array(np.repeat(doc_lens, lens).astype(np.int32))
        if self.emit_pos:
            # one outer flatten: list<list<int32>> → list<int32> rows
            # aligned with flat_terms (zero-copy offset arithmetic).
            # This is THE positional-index shuffle cost: ~4 B/token
            # occurrence rides the exchange — inherent to positions,
            # opt-in via BuildConfig.positions.
            poss_col = batch["poss"].combine_chunks()
            if isinstance(poss_col, pa.ChunkedArray):
                poss_col = poss_col.combine_chunks()
            cols["pos"] = poss_col.flatten()
        out = pa.table(cols)
        if self.skip_parts:
            keep = ~np.isin(part, np.fromiter(self.skip_parts, dtype=np.int64))
            out = out.filter(pa.array(keep))
        return out


def tokenize_batch(
    batch: pa.Table,
    id_col: str | None = None,
    positions: bool = False,
    attrs: tuple = (),
    title_boost: int = 0,
    stopwords: tuple = (),
    stem: bool = False,
    synonyms: tuple = (),
) -> pa.Table:
    """Function form of TokenizeStage for STATELESS task pools.

    The tokenizer holds no model state, so running it as plain tasks
    (warm-worker reuse, elastic) beats an actor pool whose per-actor
    cold start scales with CPU count — measured: actor pools cost ~5s
    of startup at 32 CPUs for a ~45 CPU-second corpus, destroying N→4N
    scaling. Keep the class for genuinely stateful tokenizers (models).
    """
    return TokenizeStage(
        id_col=id_col, positions=positions, attrs=attrs,
        title_boost=title_boost, stopwords=stopwords, stem=stem,
        synonyms=synonyms,
    )(batch)


_HEAVY_CACHE: dict = {}
# term→shard memos are worker-global BUT keyed by num_shards: Ray reuses
# worker processes across builds, and a memo computed under a different
# shard count would silently route postings to wrong partitions
_SHARD_MEMOS: dict[int, dict[str, int]] = {}


def explode_batch(
    batch: pa.Table,
    num_shards: int,
    salt_subs: int,
    heavy_ref=None,
    skip_parts: frozenset | None = None,
    docid32: bool = False,
    emit_dl: bool = True,
    emit_pos: bool = False,
) -> pa.Table:
    """Function form of ExplodeStage (stateless task pool). The heavy-term
    set is broadcast as an ObjectRef and resolved once per worker via a
    module-level cache; the term→shard memo is worker-global."""
    import ray

    if heavy_ref is None:
        heavy = frozenset()
    elif isinstance(heavy_ref, ray.ObjectRef):
        key = heavy_ref.hex()
        if key not in _HEAVY_CACHE:
            _HEAVY_CACHE.clear()  # only one build's set needed at a time
            _HEAVY_CACHE[key] = frozenset(ray.get(heavy_ref))
        heavy = _HEAVY_CACHE[key]
    else:
        heavy = frozenset(heavy_ref)
    stage = ExplodeStage.__new__(ExplodeStage)
    stage.heavy = heavy
    stage.num_shards = num_shards
    stage.salt_subs = salt_subs
    stage.skip_parts = frozenset(skip_parts or ())
    stage.docid32 = docid32
    stage.emit_dl = emit_dl
    stage.emit_pos = emit_pos
    stage._shard_memo = _SHARD_MEMOS.setdefault(num_shards, {})
    return stage(batch)


def doc_stat_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate for (N, Σ doc_len) — combined on the
    driver into avgdl (operator A1; reference doc_length.go:18-26).
    One output row per input batch → the final combine is tiny."""
    dl = batch["doc_len"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "n_docs": pa.array([len(dl)], type=pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], type=pa.int64()),
        }
    )


def df_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequency (term → #docs in batch).

    Pre-aggregation before the global df groupby (operator A2): the
    groupby then runs over |vocab|-sized partials, not corpus-sized
    rows. Used to detect df-heavy terms for salted splitting.

    Fully vectorized: per-doc ``terms`` lists are already unique (they
    are tf-histogram keys), so flatten + value_counts IS the per-batch
    document frequency — no Python loop over tokens."""
    import pyarrow.compute as pc

    terms_col = batch["terms"]
    if isinstance(terms_col, pa.ChunkedArray):
        terms_col = terms_col.combine_chunks()
    vc = pc.value_counts(terms_col.flatten())
    return pa.table(
        {
            "term": vc.field("values").cast(pa.string()),
            "df_partial": vc.field("counts").cast(pa.int64()),
        }
    )


