"""Bigram collocation operators vs a pure-Python referee."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.rounding import round6
from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.corpus import pmi_bigrams, top_bigrams

DOCS = [
    "fast hash join fast hash join fast hash join",
    "hash join is a fast join",
    "sort merge join beats hash join sometimes",
    "fast sort fast sort fast sort fast sort",
    "a b a b a b a b a b",
]


@pytest.fixture(scope="module")
def coll_sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("coll_sf")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
            "text": pa.array(DOCS, type=pa.string()),
            "lang": pa.array(["en"] * len(DOCS)),
            "source": pa.array(["t"] * len(DOCS)),
            "n_chars": pa.array([len(s) for s in DOCS], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _referee_counts():
    bc: Counter = Counter()
    uc: Counter = Counter()
    for text in DOCS:
        toks = tokenize(text)
        uc.update(toks)
        bc.update(map(" ".join, zip(toks, toks[1:])))
    return bc, uc


def test_top_bigrams_referee(coll_sf_dir):
    bc, _ = _referee_counts()
    want = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = top_bigrams(coll_sf_dir, n=5)
    assert list(zip(got["bigram"], got["cnt"])) == want
    assert list(got["rank"]) == [1, 2, 3, 4, 5]


def test_pmi_bigrams_referee(coll_sf_dir):
    bc, uc = _referee_counts()
    u_total = float(sum(uc.values()))
    b_total = float(sum(bc.values()))
    want = sorted(
        (
            (bg, c, round6(math.log(c * u_total * u_total / (b_total * uc[w1] * uc[w2]))))
            for (bg, c) in bc.items()
            if c >= 3
            for w1, w2 in [bg.split()]
        ),
        key=lambda r: (-r[2], r[0]),
    )[:10]
    got = pmi_bigrams(coll_sf_dir, n=10, min_count=3)
    assert [tuple(r) for r in got[["bigram", "cnt", "pmi"]].itertuples(index=False)] == want


def test_pmi_min_count_filters(coll_sf_dir):
    bc, _ = _referee_counts()
    got = pmi_bigrams(coll_sf_dir, n=50, min_count=4)
    assert set(got["bigram"]) == {b for b, c in bc.items() if c >= 4}


def test_dup_ngram_rate_referee(ray_session, coll_sf_dir):
    """C4-style duplicated-n-gram rate vs brute force at n=2 on the
    handcrafted corpus (within-doc repeats must count)."""
    import ray.data as rd

    from zensearch_ray.stages.dedup import dup_ngram_rate

    n = 2
    gc: Counter = Counter()
    per_doc = {}
    for did, text in enumerate(DOCS):
        toks = tokenize(text)
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        per_doc[did] = grams
        gc.update(grams)
    want = {
        did: (
            len(grams),
            sum(1 for g in grams if gc[g] > 1),
        )
        for did, grams in per_doc.items()
    }

    ds = rd.read_parquet(
        f"{coll_sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    got = dup_ngram_rate(ds, n=n).to_pandas().set_index("doc_id")
    assert len(got) == len(want)
    for did, (t, d) in want.items():
        row = got.loc[did]
        assert (row["n_ngrams"], row["n_dup"]) == (t, d), did
        assert row["dup_rate"] == round6(d / t)


def test_dup_ngram_rate_short_docs_excluded(ray_session, tmp_path_factory):
    import ray.data as rd

    from zensearch_ray.stages.dedup import dup_ngram_rate

    d = tmp_path_factory.mktemp("short_sf")
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["one two three", "a b c d e f g h i j"]),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    ds = rd.read_parquet(str(d / "documents.parquet"))
    out = dup_ngram_rate(ds, n=8).to_pandas()
    # doc 0 has 3 tokens < n → excluded; doc 1 has 3 unique 8-grams
    assert list(out["doc_id"]) == [1]
    assert list(out["n_ngrams"]) == [3] and list(out["n_dup"]) == [0]


def test_pmi_join_modes_identical(coll_sf_dir):
    a = pmi_bigrams(coll_sf_dir, n=10, min_count=3, join="broadcast")
    b = pmi_bigrams(coll_sf_dir, n=10, min_count=3, join="hash")
    pd.testing.assert_frame_equal(a, b)


def test_decontaminate_referee(ray_session):
    """Brute-force referee: planted benchmark overlaps (full copy,
    partial window, shifted window), a short doc, and clean docs."""
    import ray.data as rd

    from zensearch_ray.stages.dedup import decontaminate

    bench = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight",
    ]
    docs = {
        10: bench[0],                                   # exact copy: all windows hit
        11: "x " + bench[1] + " y",                     # embedded: inner windows hit
        12: "alpha beta gamma delta epsilon zeta eta XX iota kappa",  # broken window
        13: "totally different words with no overlap at all here now",
        14: "short doc only",                           # < n tokens
        15: bench[0] + " " + bench[0],                  # repeated: multiplicity counts
    }
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs.items()])
    got = (
        decontaminate(ds, bench, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def windows(text, n=8):
        toks = tokenize(text)
        return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    bench_set = {w for b in bench for w in windows(b)}
    for _, row in got.iterrows():
        ws = windows(docs[row["doc_id"]])
        assert row["n_ngrams"] == len(ws)
        want_overlap = sum(w in bench_set for w in ws)
        assert row["n_overlap"] == want_overlap, row["doc_id"]
        assert row["contaminated"] == (want_overlap > 0)
    by_id = got.set_index("doc_id")
    assert by_id.loc[10, "contaminated"] and by_id.loc[10, "n_overlap"] == 3
    assert by_id.loc[11, "contaminated"] and by_id.loc[11, "n_overlap"] == 1
    assert not by_id.loc[12, "contaminated"]
    assert not by_id.loc[13, "contaminated"]
    assert by_id.loc[14, "n_ngrams"] == 0 and not by_id.loc[14, "contaminated"]
    assert by_id.loc[15, "n_overlap"] > by_id.loc[10, "n_overlap"]


def test_cooc_window_referee(coll_sf_dir):
    from zensearch_ray.pipelines.corpus import cooc_window

    w = 3
    cc: Counter = Counter()
    for text in DOCS:
        toks = tokenize(text)
        for d in range(1, w + 1):
            cc.update(zip(toks, toks[d:]))
    want = sorted(cc.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    got = cooc_window(coll_sf_dir, n=8, window=w)
    assert list(zip(zip(got["a"], got["b"]), got["cnt"])) == want
    assert list(got["rank"]) == list(range(1, 9))


def test_cooc_window_1_equals_bigrams(coll_sf_dir):
    from zensearch_ray.pipelines.corpus import cooc_window

    got = cooc_window(coll_sf_dir, n=5, window=1)
    big = top_bigrams(coll_sf_dir, n=5)
    pairs = [f"{a} {b}" for a, b in zip(got["a"], got["b"])]
    assert pairs == list(big["bigram"])
    assert list(got["cnt"]) == list(big["cnt"])
