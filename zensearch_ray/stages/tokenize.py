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
from zensearch_ray.functions.text import term_frequencies


def part_key(shard: int, sub: int, salt_subs: int) -> int:
    """Combined partition key for the one wide shuffle."""
    return shard * salt_subs + sub


class TokenizeStage:
    """Stateless-by-content but run as an actor pool so the (cheap here,
    model-scale in general) tokenizer setup happens once per actor."""

    def __init__(self, text_col: str = "text", id_col: str | None = None):
        self.text_col = text_col
        self.id_col = id_col  # None → derive doc_id = hash64(url)

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
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        doc_lens = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            tf = term_frequencies(text)
            terms_col.append(list(tf.keys()))
            tfs_col.append(list(tf.values()))
            doc_lens[i] = sum(tf.values())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "url": urls,
                "doc_len": pa.array(doc_lens, type=pa.int64()),
                "terms": pa.array(terms_col, type=pa.list_(pa.string())),
                "tfs": pa.array(tfs_col, type=pa.list_(pa.int32())),
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
    ):
        import ray

        if heavy_terms is not None and isinstance(heavy_terms, ray.ObjectRef):
            heavy_terms = ray.get(heavy_terms)
        self.heavy = frozenset(heavy_terms or ())
        self.num_shards = num_shards
        self.salt_subs = salt_subs
        self.skip_parts = frozenset(skip_parts or ())
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
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        doc_lens = batch["doc_len"].to_numpy(zero_copy_only=False)
        terms_lists = batch["terms"].to_pylist()
        tfs_lists = batch["tfs"].to_pylist()

        out_part: list[int] = []
        out_term: list[str] = []
        out_doc: list[int] = []
        out_tf: list[int] = []
        out_dl: list[int] = []
        for i in range(len(terms_lists)):
            did = int(doc_ids[i])
            dl = int(doc_lens[i])
            sub_salt = did % self.salt_subs
            for term, tf in zip(terms_lists[i], tfs_lists[i]):
                sub = sub_salt if term in self.heavy else 0
                part = part_key(self._shard(term), sub, self.salt_subs)
                if part in self.skip_parts:
                    continue
                out_part.append(part)
                out_term.append(term)
                out_doc.append(did)
                out_tf.append(tf)
                out_dl.append(dl)
        return pa.table(
            {
                "part": pa.array(out_part, type=pa.int64()),
                "term": pa.array(out_term, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "tf": pa.array(out_tf, type=pa.int32()),
                "dl": pa.array(out_dl, type=pa.int32()),
            }
        )


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
    """
    counts: dict[str, int] = {}
    for terms in batch["terms"].to_pylist():
        for t in terms:
            counts[t] = counts.get(t, 0) + 1
    return pa.table(
        {
            "term": pa.array(list(counts.keys()), type=pa.string()),
            "df_partial": pa.array(list(counts.values()), type=pa.int64()),
        }
    )
