"""BPE tokenizer training over the corpus — the way production
tokenizers are actually trained at scale (HF tokenizers, SentencePiece):
the 100-TB part of the job is the WORD HISTOGRAM (one distributed
count), and merge learning runs on that histogram, whose size is the
unique-word vocabulary (millions of rows, not terabytes). The corpus
text is scanned exactly once for training.

Algorithm is classic Sennrich et al. 2016: words split to characters
plus an end-of-word marker; each round merges the most frequent
adjacent symbol pair (ties broken by lexicographically smallest pair,
so training is fully deterministic). The per-round pair recount here is
the naive O(vocab) pass — histogram-sized, so it is NOT the scale
bottleneck; incremental pair-index updates are the constant-factor
production refinement.

Encoding with the learned merges is a map-only distributed pass; each
actor memoizes word → piece-count (web text repeats words heavily, so
the cache hit rate dominates).

Not SQL-expressible (iterative argmax) — conformance is the pytest
referee in ``tests/test_bpe.py``, which recomputes merges from the raw
token stream (instance-weighted, no histogram) and must agree exactly.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.functions.text import tokenize

EOW = "</w>"


def word_histogram(ds, text_col: str = "text") -> pd.DataFrame:
    """Distributed (word, count) histogram under the pinned tokenizer.
    Map-side Counter partials, ONE vocabulary-sized groupby sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_col].to_pylist():
            c.update(tokenize(text))
        if not c:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"word": [], "n": []})
    return out


def train_merges(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a word histogram.
    Deterministic: best pair = max count, ties to the lexicographically
    smallest (left, right)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        if w:
            vocab[tuple(w) + (EOW,)] = vocab.get(tuple(w) + (EOW,), 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        mx = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, rank_of: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (lowest-rank pair first — the
    standard BPE inference order, which reproduces training exactly)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = rank_of.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_train(ds, n_merges: int = 30, text_col: str = "text") -> pd.DataFrame:
    """Distributed-histogram BPE training. Returns the merge table
    ``(rank, left, right, merged)`` in learning order."""
    hist = word_histogram(ds, text_col)
    counts = dict(zip(hist["word"], hist["n"].astype(int)))
    merges = train_merges(counts, n_merges)
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
            "merged": [a + b for a, b in merges],
        }
    )


class BPEEncoder:
    """Actor-pool encode stage: merges table broadcast once per actor
    (``__init__``), per-word piece counts memoized across batches."""

    def __init__(self, merges: list[tuple[str, str]], id_col: str = "doc_id",
                 text_col: str = "text"):
        self.rank_of = {p: i for i, p in enumerate(merges)}
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cache = self._cache
        rank_of = self.rank_of
        out = np.empty(batch.num_rows, dtype=np.int64)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            n = 0
            for w in tokenize(text):
                k = cache.get(w)
                if k is None:
                    k = len(encode_word(w, rank_of))
                    cache[w] = k
                n += k
            out[i] = n
        return pa.table({self.id_col: batch[self.id_col],
                         "n_bpe_pieces": pa.array(out)})


def bpe_encode_counts(ds, merges: list[tuple[str, str]],
                      concurrency: int | tuple[int, int] = (1, 4),
                      batch_size: int = 256):
    """Per-doc learned-BPE piece counts, as an actor-pool map stage.

    ``concurrency`` defaults to an AUTOSCALING pool (1, 4): a fixed
    pool of 4 would reserve 4 CPUs up front and starve the upstream
    read tasks on a small cluster (observed livelock at num_cpus=4 —
    the test fixture size); the autoscaling pool starts at 1 actor and
    grows only when CPUs are actually free."""
    return ds.map_batches(
        BPEEncoder,
        fn_constructor_args=(merges,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
