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


def levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Exact byte-Levenshtein — the scalar referee (DuckDB
    ``levenshtein`` semantics: unit-cost insert/delete/substitute over
    BYTES). Used to verify SymSpell candidates; candidate sets are
    bucket-sized, so the per-pair DP never touches the whole vocab."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(
                prev[j] + 1,  # delete from a
                cur[j - 1] + 1,  # insert into a
                prev[j - 1] + (ca != cb),  # substitute / match
            ))
        prev = cur
    return prev[-1]


def deletes_upto(word: bytes, d: int) -> set[bytes]:
    """All byte strings reachable from ``word`` by deleting at most
    ``d`` single bytes (the word itself included) — the SymSpell key
    neighborhood. |result| ≤ 1 + L + L·(L−1)/2 for d=2."""
    out = {word}
    frontier = {word}
    for _ in range(d):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def symspell_pairs_table(terms: list[str], max_dist: int = 2):
    """(dkey, term) pairs for a segment's term dictionary — every
    delete-neighborhood key (``deletes_upto``, the term itself
    included) paired with its source term, sorted by (dkey, term) —
    the PERSISTED form of ``SymSpellIndex._buckets``: written once at
    segment commit as a parquet sidecar (small row groups), probed at
    query time with a ``dkey IN (query's own delete keys)`` predicate
    so distance-2 fuzzy expansion never materializes the vocabulary.
    Keys are BYTES (deleting inside a multi-byte character yields
    invalid UTF-8; byte semantics also match the byte-Levenshtein
    verify step and the DuckDB oracle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    keys: list[bytes] = []
    ts: list[str] = []
    for t in terms:
        ks = deletes_upto(t.encode("utf-8"), max_dist)
        keys.extend(ks)
        ts.extend([t] * len(ks))
    tbl = pa.table({
        "dkey": pa.array(keys, pa.binary()),
        "term": pa.array(ts, pa.string()),
    })
    return tbl.take(pc.sort_indices(
        tbl, sort_keys=[("dkey", "ascending"), ("term", "ascending")]
    ))


def edit2_verify(candidates: list[str], query_terms: list[str]) -> list[str]:
    """Exact-DP filter: the sorted subset of ``candidates`` within
    byte-Levenshtein distance 2 of ANY query term — the verify step
    shared by the in-memory SymSpell path and the sidecar probe path
    (candidate sets are bucket-sized, never the vocabulary)."""
    qbs = [q.encode("utf-8") for q in dict.fromkeys(query_terms)]
    out = []
    for c in candidates:
        cb = c.encode("utf-8")
        if any(
            abs(len(cb) - len(qb)) <= 2 and levenshtein_bytes(cb, qb) <= 2
            for qb in qbs
        ):
            out.append(c)
    return sorted(out)


class SymSpellIndex:
    """SymSpell deletion-neighborhood index over a term dictionary for
    edit-distance ≤ ``max_dist`` expansion (Garbe's algorithm; public
    domain technique). Soundness: if lev(a, b) ≤ d then some string is
    reachable from BOTH by ≤ d deletions (align an optimal edit script:
    dropping the ≤ d bytes each side contributes beyond the common
    subsequence yields a shared string), so bucket lookup over delete
    keys yields a candidate SUPERSET — every candidate is then verified
    with the exact byte-DP. Build cost is one pass over the vocab
    (vocab-scale memory, same class as the engine's ``_all_terms``
    cache); at cluster scale the same (delete_key → term) pairs are a
    per-segment parquet sidecar, bucket lookups becoming predicate-
    pushdown reads exactly like the trigram sidecar."""

    def __init__(self, terms: list[str], max_dist: int = 2):
        self.terms = terms
        self.max_dist = max_dist
        self._buckets: dict[bytes, list[int]] = {}
        for i, t in enumerate(terms):
            for key in deletes_upto(t.encode("utf-8"), max_dist):
                self._buckets.setdefault(key, []).append(i)

    def candidate_ids(self, query_term: str) -> np.ndarray:
        """Indices of terms whose delete neighborhood intersects the
        query's (superset of the true ≤ max_dist matches)."""
        ids: set[int] = set()
        for key in deletes_upto(query_term.encode("utf-8"), self.max_dist):
            ids.update(self._buckets.get(key, ()))
        return np.fromiter(ids, dtype=np.int64, count=len(ids))

    def lookup(self, query_term: str, max_dist: int | None = None) -> list[str]:
        """Dictionary terms within byte-Levenshtein ``max_dist``
        (default: the index's build distance) of ``query_term``,
        sorted — candidates from the delete buckets, each verified by
        the exact DP."""
        d = self.max_dist if max_dist is None else max_dist
        if d > self.max_dist:
            raise ValueError(
                f"index built for max_dist={self.max_dist}, asked {d}"
            )
        qb = query_term.encode("utf-8")
        out = []
        for i in self.candidate_ids(query_term):
            t = self.terms[int(i)]
            tb = t.encode("utf-8")
            if abs(len(tb) - len(qb)) <= d and levenshtein_bytes(tb, qb) <= d:
                out.append(t)
        return sorted(out)


def expand_edit2(index: "SymSpellIndex", query_terms: list[str]) -> list[str]:
    """Distinct dictionary terms within byte-Levenshtein distance 2 of
    ANY query term, sorted — the SymSpell-pruned distance-2 analog of
    ``expand_edit1``."""
    out: set[str] = set()
    for q in dict.fromkeys(query_terms):
        out.update(index.lookup(q, 2))
    return sorted(out)
