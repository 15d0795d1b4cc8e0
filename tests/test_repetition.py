"""MassiveText n-gram repetition metrics: hand-built docs exercise the
top-n-gram char fraction, the duplicate-n-gram union coverage, the tie
order, and the keep verdict (the SQL-oracle value check over the real
corpus runs in test_oracle_parity.py — this pins the semantics the
corpus can't reach, e.g. nonzero dup5/dup10)."""

import numpy as np
import pyarrow as pa

from zensearch_ray.stages.textstats import (
    REP_DUP_MAX,
    REP_TOP_MAX,
    repetition_batch,
)


def _row(text: str) -> dict:
    t = repetition_batch(pa.table({"doc_id": [0], "text": [text]}))
    return {c: t[c][0].as_py() for c in t.column_names}


def test_no_repetition_all_zero_dup():
    v = _row(" ".join(f"w{i:03d}" for i in range(40)))
    for n in REP_DUP_MAX:
        assert v[f"dup{n}_frac"] == 0.0
    # every 2-gram unique -> top2 = one occurrence's chars / total
    assert v["top2_frac"] == round(8 / (4 * 40), 6)
    assert v["keep"] == 1


def test_top2_counts_most_frequent_gram():
    # "aa bb" occurs 3 times (chars 4 each), filler is unique
    text = "aa bb x1 aa bb x2 aa bb x3 y1 y2"
    v = _row(text)
    total = sum(len(t) for t in text.split())
    assert v["top2_frac"] == round(3 * 4 / total, 6)


def test_top_tie_breaks_to_lexicographically_smallest():
    # "zz zz" and "aa aa" both occur twice; winner must be "aa aa"
    # (2 grams x 4 chars) regardless of emission order
    text = "zz zz zz q1 aa aa aa q2"
    v = _row(text)
    total = sum(len(t) for t in text.split())
    assert v["top2_frac"] == round(2 * 4 / total, 6)


def test_dup5_union_coverage_counts_overlap_once():
    # tokens: the 6-token run [a b c d e f] appears twice -> the two
    # 5-grams (a..e, b..f) are each duplicated; coverage is the UNION
    # of their spans (all 12 positions of both runs), counted once
    run = "va vb vc vd ve vf"
    text = f"{run} x1 x2 x3 x4 {run} y1 y2 y3 y4"
    v = _row(text)
    toks = text.split()
    total = sum(len(t) for t in toks)
    covered = 12 * 2  # 12 run tokens x 2 chars, fillers uncovered
    assert v["dup5_frac"] == round(covered / total, 6)
    assert v["dup10_frac"] == 0.0


def test_repetitive_doc_dropped():
    text = " ".join(["spam spam spam spam spam"] * 8)
    v = _row(text)
    # 39 overlapping occurrences x 8 gram chars / 160 total chars —
    # the count x gram-chars definition exceeds 1 on overlap (the
    # union semantics belong to dup{n}_frac, which saturates at 1)
    assert v["top2_frac"] == round(39 * 8 / 160, 6)
    assert v["dup5_frac"] == 1.0
    assert v["keep"] == 0


def test_short_and_empty_docs():
    t = repetition_batch(pa.table({"doc_id": [0, 1], "text": ["", "one"]}))
    df = t.to_pandas()
    for n in list(REP_TOP_MAX) + list(REP_DUP_MAX):
        col = f"top{n}_frac" if n in REP_TOP_MAX else f"dup{n}_frac"
        assert (df[col].to_numpy() == 0.0).all()
    assert (df["keep"].to_numpy() == 1).all()


def test_batch_matches_per_row():
    rng = np.random.default_rng(3)
    texts = [
        " ".join(rng.choice(["aa", "bb", "cc", "dd"], size=30).tolist())
        for _ in range(16)
    ]
    batch = repetition_batch(
        pa.table({"doc_id": list(range(16)), "text": texts})
    ).to_pandas()
    for i, text in enumerate(texts):
        single = _row(text)
        for c in batch.columns:
            if c != "doc_id":
                assert batch.loc[i, c] == single[c], (i, c)
