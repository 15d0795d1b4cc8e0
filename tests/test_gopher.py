"""Gopher-rule quality filter: each rule exercised at its boundary on
hand-built docs (the oracle-parity SQL check runs in
test_oracle_parity.py; this pins the per-rule semantics)."""

import pyarrow as pa

from zensearch_ray.stages.textstats import (
    GOPHER_MAX_TOP_FRAC,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    gopher_batch,
)


def _verdict(text: str) -> dict:
    t = gopher_batch(pa.table({"doc_id": [0], "text": [text]}))
    return {c: t[c][0].as_py() for c in t.column_names}


# 30 distinct-ish words incl. 2 stopwords, mwl in range, no repetition
GOOD = "the of " + " ".join(f"word{i:02d}x" for i in range(28))


def test_good_doc_kept():
    v = _verdict(GOOD)
    assert v["keep"] == 1 and v["n_words"] == GOPHER_MIN_WORDS
    assert v["stopword_count"] == GOPHER_MIN_STOPWORDS


def test_too_short_dropped():
    # 29 words — one below the minimum
    v = _verdict(" ".join(GOOD.split()[:-1]))
    assert v["n_words"] == GOPHER_MIN_WORDS - 1 and v["keep"] == 0


def test_stopword_rule():
    # replace one of the two stopwords → below the >=2 requirement
    v = _verdict(GOOD.replace("of ", "offx ", 1))
    assert v["stopword_count"] == 1 and v["keep"] == 0


def test_repetition_rule_boundary():
    # 4/32 = 0.125 == the threshold → kept (rule is <=);
    # 5/33 > 0.125 → dropped
    base = GOOD.split() + ["dup", "dup", "dup", "dup"]
    at = " ".join(base[:28] + ["dup"] * 4)  # 32 words, top_frac exactly .125
    assert _verdict(at)["top_word_frac"] == GOPHER_MAX_TOP_FRAC
    assert _verdict(at)["keep"] == 1
    over = " ".join(base[:28] + ["dup"] * 5)
    assert _verdict(over)["keep"] == 0


def test_mean_word_len_rule():
    # 30 single-char words → mwl = 1 < 3 → dropped despite stopwords
    v = _verdict("a a " + " ".join(["b"] * 28))
    assert v["mean_word_len"] < 3 and v["keep"] == 0


def test_empty_doc():
    v = _verdict("")
    assert v["n_words"] == 0 and v["keep"] == 0
