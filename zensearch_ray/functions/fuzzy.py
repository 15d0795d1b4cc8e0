"""Vectorized edit-distance-1 term matching for fuzzy query expansion.

Distance is Levenshtein over UTF-8 BYTES — deliberately matching
DuckDB/PostgreSQL ``levenshtein()`` semantics (so the oracle SQL and
the engine agree on multi-byte characters: ``cafe`` vs ``café`` is
distance 2, not 1). Reference parity note: the reference engine has no
fuzzy matching; this extends the query surface the same way prefix
search does (zensearch `search-engine/internal/` scores exact terms
only).

The test uses the classic lcp/lcs characterization instead of a DP
matrix, so a whole candidate dictionary is screened with a handful of
numpy passes per byte-length group:

- ``len(c) == len(q)``: distance ≤ 1  ⇔  lcp(c,q) + lcs(c,q) ≥ len−1
  (first mismatch at/after last mismatch ⇒ at most one substitution).
- ``|len(c) − len(q)| == 1``: distance ≤ 1 (one insert/delete)
  ⇔  lcp + lcs ≥ min(len) (the shorter string splits into a prefix
  and suffix of the longer around the inserted byte).
"""

from __future__ import annotations

import numpy as np


def _lcp_lcs(mat: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row longest-common-prefix / -suffix lengths between each row
    of byte matrix ``mat`` (N×L) and query bytes ``q`` (length m),
    compared over the first/last ``min(L, m)`` bytes."""
    w = min(mat.shape[1], len(q))
    if w == 0:
        z = np.zeros(mat.shape[0], dtype=np.int64)
        return z, z.copy()
    neq_p = mat[:, :w] != q[:w]
    # argmax finds the FIRST mismatch; all-match rows need the full w
    lcp = np.where(neq_p.any(axis=1), neq_p.argmax(axis=1), w)
    neq_s = mat[:, -w:][:, ::-1] != q[-w:][::-1]
    lcs = np.where(neq_s.any(axis=1), neq_s.argmax(axis=1), w)
    return lcp.astype(np.int64), lcs.astype(np.int64)


def edit1_mask(terms: list[str], query_term: str) -> np.ndarray:
    """Boolean mask: ``levenshtein_bytes(terms[i], query_term) <= 1``.

    One numpy pass per distinct candidate byte length (at most three
    lengths qualify), no per-term Python comparison work.
    """
    qb = np.frombuffer(query_term.encode("utf-8"), dtype=np.uint8)
    m = len(qb)
    encoded = [t.encode("utf-8") for t in terms]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=len(encoded))
    out = np.zeros(len(terms), dtype=bool)
    for L in range(max(m - 1, 0), m + 2):
        idx = np.nonzero(lens == L)[0]
        if idx.size == 0:
            continue
        if L == 0:  # empty candidate: distance == m
            out[idx] = m <= 1
            continue
        mat = np.frombuffer(
            b"".join(encoded[i] for i in idx), dtype=np.uint8
        ).reshape(idx.size, L)
        lcp, lcs = _lcp_lcs(mat, qb)
        need = min(L, m) - (1 if L == m else 0)
        out[idx] = (lcp + lcs) >= need
    return out


def expand_edit1(terms: list[str], query_terms: list[str]) -> list[str]:
    """Distinct dictionary terms within byte-Levenshtein distance 1 of
    ANY query term, sorted — the fuzzy analog of prefix expansion."""
    if not terms:
        return []
    mask = np.zeros(len(terms), dtype=bool)
    for q in dict.fromkeys(query_terms):
        mask |= edit1_mask(terms, q)
    return sorted({terms[i] for i in np.nonzero(mask)[0]})
