"""BM25 scoring kernels + brute-force oracle (pinned spec, SURVEY.md §2.8).

Reference semantics (cited for parity; the Go scorer itself is racy —
``search-engine/internal/bm25/score.go:56-67`` — so the deterministic
sequential variant ``score_test.go:97-111`` is the pinned intent):

  - IDF(t) = ln(N / df(t)), 0 if df == 0 (no smoothing):
    ``search-engine/internal/bm25/idf.go:10-18``.
  - TF-norm(t, d) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with
    k1=1.2, b=0.75 (standard form documented in reference README.md:26-35;
    as-implemented tf.go:15-29 has a (1-b+b) degeneracy superseded by the
    north_star constants).
  - score(q, d) = Σ_{t ∈ tokens(q)} IDF(t) · TF-norm(t, d):
    ``score.go:129-131`` + accumulation ``score.go:77-82``.
  - top-k ordered by (score DESC, doc_id ASC):
    ``score.go:86-95`` made deterministic.

The vectorized kernels here are shared by the oracle (brute force) and
the query engine (posting-list path); both must produce bit-identical
float64 per-term contributions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from zensearch_ray.functions.text import term_frequencies, tokenize


# LM-Dirichlet smoothing parameter (Zhai & Lafferty 2004's recommended
# range is 500–10000; Lucene's LMDirichletSimilarity defaults to 2000)
LMD_MU = 2000.0
# Jelinek-Mercer interpolation weight — the short-query setting from
# Zhai & Lafferty 2004 ("A study of smoothing methods for language
# models applied to ad hoc information retrieval", §5: λ≈0.1 for
# title/short queries)
LMJM_LAMBDA = 0.1


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75
    k: int = 10  # top-k size


def idf(n_docs: int, df: int) -> float:
    """ln(N/df); 0.0 when df == 0 (reference idf.go:14-17 exactly)."""
    if df == 0:
        return 0.0
    return math.log(n_docs / df)


def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float, params: BM25Params) -> np.ndarray:
    """Vectorized BM25 TF normalization, float64.

    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    """
    tf = tf.astype(np.float64, copy=False)
    dl = dl.astype(np.float64, copy=False)
    denom = tf + params.k1 * (1.0 - params.b + params.b * (dl / avgdl))
    return tf * (params.k1 + 1.0) / denom


def topk_order(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score DESC, doc_id ASC). Returns (doc_ids, scores).

    O(n) selection instead of a full lexsort — at web scale a common
    term accumulates millions of candidates and the sort dominated
    warm-query latency (346 ms of a ~950 ms query at 9.9M docs). An
    argpartition finds the k-th score; every candidate STRICTLY above
    it is in, and exact (score, doc_id) ordering — including doc_id
    ties AT the boundary score — is resolved on the boundary sliver
    only."""
    n = len(doc_ids)
    if n == 0 or k <= 0:
        return doc_ids[:0], scores[:0]
    if n <= max(k, 1024):  # small: the sort is cheaper than two passes
        order = np.lexsort((doc_ids, -scores))[:k]
        return doc_ids[order], scores[order]
    part = np.argpartition(-scores, k - 1)[:k]
    s_k = scores[part].min()  # k-th largest score
    cand = np.flatnonzero(scores >= s_k)
    if len(cand) > 4 * k + 64:
        # mass ties at the boundary: keep all strictly-above rows plus
        # the smallest-doc_id boundary rows (argpartition on doc_id)
        above = cand[scores[cand] > s_k]
        at = cand[scores[cand] == s_k]
        need = k - len(above)
        if 0 < need < len(at):
            at = at[np.argpartition(doc_ids[at], need - 1)[:need]]
        cand = np.concatenate([above, at])
    order = cand[np.lexsort((doc_ids[cand], -scores[cand]))][:k]
    return doc_ids[order], scores[order]


class BM25Oracle:
    """Brute-force in-memory BM25 scorer: the conformance referee.

    Mirrors the reference's sequential scorer
    (``score_test.go:97-111``) under the pinned spec — every doc scored
    for every query term (union semantics, zero contributions included),
    no index. Used in tests to verify the posting-list engine is
    rank-identical.
    """

    def __init__(self, doc_ids: list[int], texts: list[str], params: BM25Params | None = None):
        self.params = params or BM25Params()
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        self.n_docs = len(texts)
        self.tfs: list[dict[str, int]] = [term_frequencies(t) for t in texts]
        self.dls = np.array([sum(tf.values()) for tf in self.tfs], dtype=np.int64)
        self.avgdl = float(self.dls.mean()) if self.n_docs else 0.0
        self.df: dict[str, int] = {}
        for tf in self.tfs:
            for term in tf:
                self.df[term] = self.df.get(term, 0) + 1

    def score(self, query: str) -> np.ndarray:
        """float64 score per doc (aligned with self.doc_ids)."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        for term in tokenize(query):
            term_idf = idf(self.n_docs, self.df.get(term, 0))
            if term_idf == 0.0:
                continue
            tf = np.array([d.get(term, 0) for d in self.tfs], dtype=np.float64)
            scores += term_idf * tf_norm(tf, self.dls, self.avgdl, self.params)
        return scores

    def topk(self, query: str, k: int | None = None) -> list[tuple[int, float]]:
        """Top-k over docs with score > 0.

        Zero-score docs are excluded — the pinned equivalent of the
        reference's zero-score filter (``score.go:118-127``) and the
        natural semantics of posting-list retrieval (docs matching no
        query term are never materialized). Since IDF = ln(N/df) ≥ 0
        always (df ≤ N), contributions are non-negative and "score > 0"
        ≡ "matched at least one term with df < N".
        """
        k = k if k is not None else self.params.k
        scores = self.score(query)
        mask = scores > 0.0
        ids, sc = topk_order(self.doc_ids[mask], scores[mask], k)
        return list(zip(ids.tolist(), sc.tolist()))
