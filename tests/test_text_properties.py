"""Property tests (hypothesis) for the pinned tokenizer spec and the
byte-Levenshtein fuzzy kernel — invariants that must hold for ANY
input, complementing the example-based referees."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from zensearch_ray.functions.fuzzy import edit1_mask
from zensearch_ray.functions.text import doc_length, normalize, tokenize


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_idempotent_over_rejoin(s):
    """Tokens rejoined by spaces re-tokenize to the same stream —
    tokenization is a projection (applying it twice = once). This is
    the property that lets oracles tokenize with string_split(' ')
    on pre-tokenized text."""
    toks = tokenize(s)
    assert tokenize(" ".join(toks)) == toks


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_normalize_fixpoint(s):
    """Tokens are already NFC+casefolded: normalizing a token changes
    nothing (doc/query symmetry — a query term equals its indexed
    form)."""
    for t in tokenize(s):
        assert normalize(t) == t


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokens_nonempty_no_separators(s):
    toks = tokenize(s)
    assert all(toks)  # no empty tokens
    for t in toks:
        assert tokenize(t) == [t]  # a token contains no separators


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_tokenize_ascii_case_invariant(s):
    """ASCII casefold invariance: tokenizing the uppercased string
    yields the same stream (full Unicode excluded by design: casefold
    of upper() legitimately differs for ß → SS etc.)."""
    assert tokenize(s.upper()) == tokenize(s)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_doc_length_is_token_count(s):
    assert doc_length(s) == len(tokenize(s))


def _lev_bytes(a: str, b: str) -> int:
    a, b = a.encode(), b.encode()
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.text(min_size=0, max_size=8), min_size=1, max_size=20),
    st.text(min_size=0, max_size=8),
)
def test_edit1_mask_property_vs_dp(pool, q):
    """The vectorized lcp+lcs edit-distance≤1 characterization agrees
    with the full DP for arbitrary Unicode pools and probes."""
    want = np.array([_lev_bytes(t, q) <= 1 for t in pool])
    got = edit1_mask(pool, q)
    assert (want == got).all()
