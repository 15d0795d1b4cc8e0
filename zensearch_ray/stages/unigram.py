"""Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
model) — the second production tokenizer family beside BPE
(``stages/bpe.py``), trained the way it actually scales: the 100-TB
part is the distributed WORD HISTOGRAM (corpus text scanned exactly
once); seeding and every EM iteration are then distributed passes over
the HISTOGRAM dataset (vocabulary-scale blocks) with the current piece
model broadcast once per iteration — the kmeans parameter-server shape.
The driver only ever holds vocabulary-scale piece tables.

Pinned, fully deterministic variant (so a no-histogram referee must
reproduce training EXACTLY — ``tests/test_unigram.py``):

  * seed vocabulary: every substring of every distinct word up to
    ``max_piece_len`` chars, weighted by (occurrences in word) × (word
    count); top ``seed_size`` by (count DESC, piece ASC), plus ALL
    single characters (keeps every word segmentable).
  * EM is hard (Viterbi) EM: the E-step assigns each word its single
    best segmentation under the current log-probs — ties resolve to
    the segmentation whose LAST piece is longest (the DP replaces only
    on strictly-greater score, scanning start positions ascending),
    recursively down the word. Counts are integers (piece-use ×
    word-count), so partial sums are order-exact.
  * M-step: logp(p) = ln(max(c(p), 0.5) / Σ max(c, 0.5)) over pieces
    with c > 0 or len(p) == 1 — the 0.5 floor keeps never-used single
    chars usable for OOV segmentation at encode time.
  * final vocabulary: top ``vocab_size`` by (count DESC, piece ASC)
    plus all single characters.

Not SQL-expressible (iterative argmax) — conformance is the exact
referee identity, the BPE contract.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.stages.bpe import word_histogram


def viterbi_segment(word: str, logp: dict[str, float],
                    max_piece_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs (pinned tie
    rule: strictly-greater replacement over ascending start positions
    → equal-score ties keep the EARLIEST start, i.e. the longest last
    piece). Raises if the word is unsegmentable (cannot happen when
    every character is in the model)."""
    n = len(word)
    neg_inf = float("-inf")
    best = [neg_inf] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for end in range(1, n + 1):
        for start in range(max(0, end - max_piece_len), end):
            if best[start] == neg_inf:
                continue
            lp = logp.get(word[start:end])
            if lp is None:
                continue
            sc = best[start] + lp
            if sc > best[end]:
                best[end] = sc
                back[end] = start
    if best[n] == neg_inf:
        raise ValueError(f"unsegmentable word {word!r}")
    pieces = []
    end = n
    while end > 0:
        start = back[end]
        pieces.append(word[start:end])
        end = start
    return pieces[::-1]


def _seed_counts(hist_ds, max_piece_len: int):
    """Distributed substring counting over the histogram dataset:
    (piece, weighted count) via Counter partials + one vocabulary-scale
    groupby sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for word, n in zip(batch["word"].to_pylist(), batch["n"].to_pylist()):
            L = len(word)
            for i in range(L):
                for j in range(i + 1, min(i + max_piece_len, L) + 1):
                    c[word[i:j]] += n
        return pa.table(
            {
                "piece": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        hist_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("piece")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )


def _logp_of(counts: dict[str, int]) -> dict[str, float]:
    """M-step (pinned): floor-0.5 smoothing over kept pieces."""
    total = sum(max(c, 0.5) for c in counts.values())
    return {p: float(np.log(max(c, 0.5) / total)) for p, c in counts.items()}


def _estep(hist_ds, logp: dict[str, float], max_piece_len: int):
    """One distributed Viterbi E-step over the histogram: model
    broadcast once, per-word best segmentation, integer piece-count
    partials summed through one vocabulary-scale groupby."""
    import ray
    from ray.data.aggregate import Sum

    ref = ray.put(logp)

    def partial(batch: pa.Table) -> pa.Table:
        lp = ray.get(ref)
        c: Counter = Counter()
        for word, n in zip(batch["word"].to_pylist(), batch["n"].to_pylist()):
            for piece in viterbi_segment(word, lp, max_piece_len):
                c[piece] += n
        return pa.table(
            {
                "piece": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    out = (
        hist_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("piece")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    return dict(zip(out["piece"], out["c"].astype(int)))


def unigram_train(ds, vocab_size: int = 200, seed_size: int = 2000,
                  iters: int = 4, max_piece_len: int = 8,
                  text_col: str = "text") -> pd.DataFrame:
    """Train the unigram-LM piece vocabulary. Returns a DataFrame
    (piece, count, logp) sorted (count DESC, piece ASC) — the final
    model after the vocab_size cut (single characters always kept)."""
    import ray.data as rd

    hist = word_histogram(ds, text_col=text_col)
    if len(hist) == 0:
        raise ValueError("empty corpus")
    chars = sorted({ch for w in hist["word"] for ch in w})
    hist_ds = rd.from_pandas(hist)

    seeds = _seed_counts(hist_ds, max_piece_len)
    seeds = seeds.sort_values(
        ["c", "piece"], ascending=[False, True], kind="mergesort"
    )
    keep = list(seeds["piece"].head(seed_size))
    kept = set(keep) | set(chars)
    counts = dict(zip(seeds["piece"], seeds["c"].astype(int)))
    counts = {p: counts.get(p, 0) for p in kept}

    logp = _logp_of(counts)
    for _ in range(iters):
        used = _estep(hist_ds, logp, max_piece_len)
        counts = {
            p: used.get(p, 0)
            for p in set(used) | set(chars)
            if used.get(p, 0) > 0 or len(p) == 1
        }
        logp = _logp_of(counts)

    final = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept_final = {p for p, _ in final[:vocab_size]} | set(chars)
    counts = {p: c for p, c in counts.items() if p in kept_final}
    logp = _logp_of(counts)
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(
        {
            "piece": [p for p, _ in rows],
            "count": np.array([c for _, c in rows], dtype=np.int64),
            "logp": np.array([logp[p] for p, _ in rows], dtype=np.float64),
        }
    )


def unigram_encode_counts(ds, model: pd.DataFrame,
                          max_piece_len: int = 8,
                          text_col: str = "text") -> pd.DataFrame:
    """Encode the corpus with a trained model: global (piece, n) counts
    — one histogram pass + one broadcast-model Viterbi pass over the
    histogram (per-actor memoization is implicit: each distinct word
    segments once). Columns (piece, n), sorted (n DESC, piece ASC)."""
    import ray.data as rd

    hist = word_histogram(ds, text_col=text_col)
    logp = dict(zip(model["piece"], model["logp"]))
    used = _estep(rd.from_pandas(hist), logp, max_piece_len)
    rows = sorted(used.items(), key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame(
        {
            "piece": [p for p, _ in rows],
            "n": np.array([c for _, c in rows], dtype=np.int64),
        }
    )


def unigram_vocab_for(sf_dir: str, vocab_size: int = 120):
    """Driver entry: train on documents.text. (piece, count, logp)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return unigram_train(ds, vocab_size=vocab_size)


def unigram_pieces_for(sf_dir: str, vocab_size: int = 120):
    """Driver entry: encode the corpus with the trained model.
    (piece, n)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    model = unigram_train(ds, vocab_size=vocab_size)
    return unigram_encode_counts(ds, model)
