"""exact_substr_dedup: the sliding-window ExactSubstr operator must
equal a brute-force exact-string referee (no hash shortcuts), keep the
globally-first occurrence, merge overlapping loser windows into one
cut, and pass short docs through untouched."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from zensearch_ray.functions.text import tokenize
from zensearch_ray.stages.dedup import exact_substr_dedup

L = 5


def _referee(texts: list[str], l: int = L) -> pd.DataFrame:
    toks = [tokenize(t) for t in texts]
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, tk in enumerate(toks):
        for p in range(len(tk) - l + 1):
            occ.setdefault(tuple(tk[p : p + l]), []).append((d, p))
    covered = [np.zeros(len(tk), dtype=bool) for tk in toks]
    for places in occ.values():
        if len(places) > 1:
            for d, p in sorted(places)[1:]:
                covered[d][p : p + l] = True
    rows = []
    for d, tk in enumerate(toks):
        kept = [t for t, c in zip(tk, covered[d]) if not c]
        rows.append((d, " ".join(kept), len(tk), int(covered[d].sum())))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "n_tokens", "n_removed"]
    ).astype({"doc_id": np.int64, "n_tokens": np.int64, "n_removed": np.int64})


def _run(texts: list[str], l: int = L) -> pd.DataFrame:
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    ).repartition(4)
    out = (
        exact_substr_dedup(ds, l=l, n_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype(
        {"doc_id": np.int64, "n_tokens": np.int64, "n_removed": np.int64}
    )


def test_matches_bruteforce_referee(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    passage = " ".join(f"dup{i}" for i in range(12))  # 12-token passage
    texts = []
    for i in range(60):
        body = " ".join(rng.choice(vocab, size=25))
        if i % 7 == 0:
            body = body + " " + passage  # planted cross-doc duplicate
        texts.append(body)
    pd.testing.assert_frame_equal(_run(texts), _referee(texts))


def test_first_occurrence_kept_and_union_cut(ray_session):
    # a 12-token duplicated passage = 8 overlapping 5-windows in the
    # loser doc; the union cut removes exactly 12 tokens, once
    passage = " ".join(f"p{i}" for i in range(12))
    texts = [
        "alpha beta " + passage + " gamma delta",
        "one two three " + passage + " four five",
    ]
    got = _run(texts)
    assert got.loc[0, "n_removed"] == 0  # first occurrence keeps
    assert got.loc[0, "text"] == texts[0]
    assert got.loc[1, "n_removed"] == 12
    assert got.loc[1, "text"] == "one two three four five"


def test_within_doc_repeat_removed(ray_session):
    passage = " ".join(f"r{i}" for i in range(6))
    texts = [f"{passage} middle filler words {passage}"]
    got = _run(texts)
    assert got.loc[0, "n_removed"] == 6
    assert got.loc[0, "text"] == f"{passage} middle filler words"


def test_short_docs_pass_through(ray_session):
    texts = ["tiny doc", "same same same", ""]
    got = _run(texts)
    assert (got["n_removed"] == 0).all()
    assert list(got["text"]) == ["tiny doc", "same same same", ""]
    assert list(got["n_tokens"]) == [2, 3, 0]
