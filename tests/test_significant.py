"""significant_terms: the index-backed foreground/background term-lift
aggregation must equal a brute-force tokenize-everything referee
(exact df counts + the same JLH float expression), exclude the query's
own terms, honour the noise floor, surface a planted co-occurring
marker at rank 1, and return an empty typed frame when the query
matches nothing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.rounding import round6
from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.corpus import significant_terms

N_DOCS = 240
PROBE = "alpha beta"


@pytest.fixture(scope="module")
def sig_sf_dir(ray_session, tmp_path_factory):
    """Deterministic corpus: ~1/4 of docs contain a probe term; the
    token 'marker' appears ONLY alongside a probe term (maximal lift);
    'common' appears everywhere (no lift); a zipfy filler vocabulary
    supplies mid-lift candidates."""
    d = tmp_path_factory.mktemp("sig_sf")
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(N_DOCS):
        toks = ["common"] + list(
            rng.choice(vocab, size=12, p=_zipf_p(len(vocab)))
        )
        if i % 4 == 0:
            toks.append("alpha" if i % 8 == 0 else "beta")
            if i % 8 == 0:
                toks.append("marker")
        texts.append(" ".join(toks))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * N_DOCS),
                "source": pa.array(["t"] * N_DOCS),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _zipf_p(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def _referee(sf_dir: str, query: str, k: int, min_fg_df: int) -> pd.DataFrame:
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    toksets = [set(tokenize(t)) for t in texts]
    qset = set(tokenize(query))
    fg = [s for s in toksets if s & qset]
    n_fg, n_docs = len(fg), len(toksets)
    vocab = set().union(*toksets)
    rows = []
    for term in vocab:
        if term in qset:
            continue
        df_fg = sum(term in s for s in fg)
        if df_fg < min_fg_df:
            continue
        df_bg = sum(term in s for s in toksets)
        fr, br = df_fg / n_fg, df_bg / n_docs
        rows.append((term, df_fg, df_bg, round6((fr - br) * (fr / br))))
    out = pd.DataFrame(rows, columns=["term", "df_fg", "df_bg", "score"])
    out = out.sort_values(
        ["score", "term"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return out.reset_index(drop=True).astype(
        {"df_fg": np.int64, "df_bg": np.int64}
    )


def test_matches_bruteforce_referee(sig_sf_dir):
    got = significant_terms(sig_sf_dir, PROBE, k=15, min_fg_df=2)
    want = _referee(sig_sf_dir, PROBE, k=15, min_fg_df=2)
    pd.testing.assert_frame_equal(got, want)


def test_probe_terms_excluded_and_noise_floor(sig_sf_dir):
    got = significant_terms(sig_sf_dir, PROBE, k=50, min_fg_df=4)
    assert not set(got["term"]) & {"alpha", "beta"}
    assert (got["df_fg"] >= 4).all()
    # df_fg can never exceed df_bg (foreground is a corpus subset)
    assert (got["df_fg"] <= got["df_bg"]).all()


def test_planted_marker_ranks_first(sig_sf_dir):
    got = significant_terms(sig_sf_dir, PROBE, k=5, min_fg_df=2)
    # 'marker' exists ONLY in foreground docs -> maximal fg/bg lift
    assert got.loc[0, "term"] == "marker"
    assert got.loc[0, "df_fg"] == got.loc[0, "df_bg"]
    # 'common' is in every doc: fg_rate == bg_rate -> zero lift, never
    # ahead of any genuinely enriched term
    common = got[got["term"] == "common"]
    assert common.empty or common["score"].iloc[0] == 0.0


def test_unmatched_query_returns_empty_typed_frame(sig_sf_dir):
    got = significant_terms(sig_sf_dir, "nosuchtermanywhere", k=10)
    assert len(got) == 0
    assert list(got.columns) == ["term", "df_fg", "df_bg", "score"]
    assert got["df_fg"].dtype == np.int64
    assert got["score"].dtype == np.float64
