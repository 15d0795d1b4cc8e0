"""Unigram-LM tokenizer (stages/unigram.py): the distributed
histogram + EM pipeline must reproduce a NO-HISTOGRAM local referee
EXACTLY (the BPE conformance contract), Viterbi obeys its pinned tie
rule, and every word stays segmentable."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from zensearch_ray.functions.text import tokenize
from zensearch_ray.stages.unigram import (
    unigram_encode_counts,
    unigram_train,
    viterbi_segment,
)

DOCS = [
    "the streaming engine streams the stream of streams",
    "stream processing beats batch processing for streaming data",
    "the batch engine batches batches of data",
    "data streams and data batches share the engine",
    "processing data is the engine of the engine",
]


def _local_train(docs, vocab_size, seed_size, iters, max_piece_len):
    """Referee: same pinned algorithm, straight from the raw docs —
    no Ray, no histogram dataset, plain dict arithmetic."""
    hist: Counter = Counter()
    for d in docs:
        hist.update(tokenize(d))
    chars = sorted({ch for w in hist for ch in w})
    seeds: Counter = Counter()
    for w, n in hist.items():
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                seeds[w[i:j]] += n
    order = sorted(seeds.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = {p for p, _ in order[:seed_size]} | set(chars)
    counts = {p: seeds.get(p, 0) for p in keep}

    def logp_of(c):
        total = sum(max(v, 0.5) for v in c.values())
        return {p: float(np.log(max(v, 0.5) / total)) for p, v in c.items()}

    logp = logp_of(counts)
    for _ in range(iters):
        used: Counter = Counter()
        for w, n in hist.items():
            for piece in viterbi_segment(w, logp, max_piece_len):
                used[piece] += n
        counts = {
            p: used.get(p, 0)
            for p in set(used) | set(chars)
            if used.get(p, 0) > 0 or len(p) == 1
        }
        logp = logp_of(counts)
    final = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in final[:vocab_size]} | set(chars)
    counts = {p: c for p, c in counts.items() if p in kept}
    logp = logp_of(counts)
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])), logp


def _ds_of(docs, blocks=4):
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(
        blocks
    )


def test_train_matches_no_histogram_referee(ray_session):
    args = dict(vocab_size=40, seed_size=300, iters=3, max_piece_len=6)
    got = unigram_train(_ds_of(DOCS), **args)
    want_rows, want_logp = _local_train(DOCS, **args)
    assert list(zip(got["piece"], got["count"])) == want_rows
    for p, lp in zip(got["piece"], got["logp"]):
        assert lp == want_logp[p], p


def test_every_char_kept_and_segmentable(ray_session):
    model = unigram_train(_ds_of(DOCS), vocab_size=20, seed_size=100,
                          iters=2, max_piece_len=6)
    pieces = set(model["piece"])
    chars = {ch for d in DOCS for ch in tokenize(d) for ch in ch}
    assert chars <= pieces
    logp = dict(zip(model["piece"], model["logp"]))
    for d in DOCS:
        for w in tokenize(d):
            seg = viterbi_segment(w, logp, 6)
            assert "".join(seg) == w


def test_viterbi_tie_rule():
    # "ab" with p(ab) == p(a)+p(b) would tie only through floats; craft
    # an exact tie instead: logp values chosen so a+b == ab exactly
    logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    # one piece ("ab", score -2.0) ties the two-piece path (-2.0); the
    # pinned rule keeps the LONGEST last piece → ["ab"]
    assert viterbi_segment("ab", logp, 2) == ["ab"]
    # unsegmentable raises
    with pytest.raises(ValueError, match="unsegmentable"):
        viterbi_segment("xyz", {"x": -1.0}, 2)


def test_encode_counts_match_referee(ray_session):
    args = dict(vocab_size=40, seed_size=300, iters=3, max_piece_len=6)
    ds = _ds_of(DOCS)
    model = unigram_train(ds, **args)
    got = unigram_encode_counts(ds, model, max_piece_len=6)
    logp = dict(zip(model["piece"], model["logp"]))
    hist: Counter = Counter()
    for d in DOCS:
        hist.update(tokenize(d))
    want: Counter = Counter()
    for w, n in hist.items():
        for piece in viterbi_segment(w, logp, 6):
            want[piece] += n
    assert list(zip(got["piece"], got["n"])) == sorted(
        want.items(), key=lambda kv: (-kv[1], kv[0])
    )
    # total encoded piece mass covers every token occurrence
    assert sum(want.values()) >= sum(hist.values())


def test_empty_corpus_raises(ray_session):
    with pytest.raises(ValueError, match="empty"):
        unigram_train(_ds_of([""]), vocab_size=10)
