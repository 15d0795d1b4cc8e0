"""BPE training referee: merges learned from the distributed word
histogram must equal merges recomputed from the raw token-instance
stream (no histogram), and greedy rank-ordered encoding must reproduce
the training-time segmentation of every word."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest

import ray.data as rd

from zensearch_ray.functions.text import tokenize
from zensearch_ray.stages.bpe import (
    EOW,
    bpe_encode_counts,
    bpe_train,
    encode_word,
    train_merges,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cats sat on the mats"),
    (2, "that hat is the best hat"),
    (3, "matter scatters in the chat"),
    (4, "a bat and a rat chat"),
    (5, ""),
    (6, "the the the the"),
]


def _referee_merges(texts, n_merges):
    """Instance-level BPE (every token occurrence carried separately)."""
    insts = [list(w) + [EOW] for t in texts for w in tokenize(t)]
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym in insts:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += 1
        if not pairs:
            break
        mx = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append(best)
        for sym in insts:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == best[0] and sym[i + 1] == best[1]:
                    sym[i : i + 2] = [sym[i] + sym[i + 1]]
                else:
                    i += 1
    return merges, insts


def _table():
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )


def test_train_matches_instance_referee(ray_session):
    ds = rd.from_arrow(_table()).repartition(3)
    got = bpe_train(ds, n_merges=25)
    want, _ = _referee_merges([t for _, t in DOCS], 25)
    assert list(zip(got["left"], got["right"])) == want
    assert list(got["merged"]) == [a + b for a, b in want]
    assert list(got["rank"]) == list(range(len(want)))


def test_encode_reproduces_training_segmentation():
    texts = [t for _, t in DOCS]
    merges, insts = _referee_merges(texts, 25)
    rank_of = {p: i for i, p in enumerate(merges)}
    # re-derive final segmentation per unique word from the referee
    seg_of = {}
    i = 0
    for t in texts:
        for w in tokenize(t):
            seg_of.setdefault(w, insts[i])
            i += 1
    for w, seg in seg_of.items():
        assert encode_word(w, rank_of) == seg, w


def test_encode_counts_stage(ray_session):
    ds = rd.from_arrow(_table()).repartition(3)
    merges, insts = _referee_merges([t for _, t in DOCS], 25)
    got = (
        bpe_encode_counts(ds, merges, concurrency=2, batch_size=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rank_of = {p: i for i, p in enumerate(merges)}
    for did, text in DOCS:
        want = sum(len(encode_word(w, rank_of)) for w in tokenize(text))
        assert got.loc[got["doc_id"] == did, "n_bpe_pieces"].iloc[0] == want


def test_fewer_pairs_than_requested_merges():
    merges = train_merges({"ab": 3}, n_merges=50)
    # 'a b </w>' only ever has 2 distinct pair slots -> training drains
    assert 0 < len(merges) <= 2
