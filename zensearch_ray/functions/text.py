"""Unicode tokenizer + doc-length semantics (the pinned spec, SURVEY.md §2.8-1/2).

Reference semantics being replaced (cited for parity):
  - query tokenizer splits on ' ' with a leading-space quirk
    (reference ``search-engine/internal/bm25/score.go:97-116``);
  - lowercase normalization ``strings.ToLower``
    (``search-engine/internal/bm25/tf.go:21``, ``idf.go:24``);
  - doc length = space count + 1
    (``search-engine/utilities/doc_length.go:5-16``).

The pinned rebuild spec (per BASELINE.json north_star "Unicode
tokenization"): NFC-normalize, casefold, split on runs of
non-alphanumeric code points (underscore excluded), drop empties.
Applied IDENTICALLY to documents and queries.
"""

from __future__ import annotations

import re
import unicodedata

# One token = a run of Unicode word characters, underscore excluded.
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def normalize(text: str) -> str:
    """NFC normalization + casefold (the doc/query-symmetric normalizer)."""
    return unicodedata.normalize("NFC", text).casefold()


def tokenize(text: str) -> list[str]:
    """Tokenize one string under the pinned spec. Deterministic, pure."""
    return _TOKEN_RE.findall(normalize(text))


def doc_length(text: str) -> int:
    """doc_len = token count (reference analog doc_length.go:5-16)."""
    return len(tokenize(text))


def s_stem(tok: str) -> str:
    """Plural S-stemmer (Harman 1991 family), PINNED exactly so the
    whole analyzer is SQL-expressible (Porter is not):

      1. ``*sses``             → drop ``es``   (dresses → dress)
      2. ``*ies`` and len > 4  → ``*y``        (studies → study)
      3. ``*ss`` | ``*us`` | ``*is`` → unchanged (dress, bonus, basis)
      4. ``*s``  and len > 3   → drop ``s``    (tables → table)

    Rules apply first-match-wins on the already-normalized token.
    Deterministic, pure — doc and query sides share it."""
    if tok.endswith("sses"):
        return tok[:-2]
    if tok.endswith("ies") and len(tok) > 4:
        return tok[:-3] + "y"
    if tok.endswith(("ss", "us", "is")):
        return tok
    if tok.endswith("s") and len(tok) > 3:
        return tok[:-1]
    return tok


def term_frequencies(text: str) -> dict[str, int]:
    """Per-document term → tf histogram (token-equality counting,
    replacing the reference's substring ``strings.Count`` at tf.go:21).
    Counter counts in C (_count_elements); key order is still first
    occurrence, identical to a manual dict loop."""
    from collections import Counter

    return Counter(tokenize(text))


def term_positions(text: str) -> dict[str, list[int]]:
    """Per-document term → sorted token positions (0-based offsets in
    the token sequence). Superset of ``term_frequencies`` — ``tf ==
    len(positions)`` and key order is first occurrence — used by the
    positional-index build (phrase queries). Positions, not byte
    offsets: adjacency in the TOKEN stream is what a phrase match is."""
    d: dict[str, list[int]] = {}
    for i, tok in enumerate(tokenize(text)):
        lst = d.get(tok)
        if lst is None:
            d[tok] = [i]
        else:
            lst.append(i)
    return d
