"""search_snippets: deterministic snippet rule on a handcrafted corpus
(the sf-dir oracle checks the same rule in SQL; these pin the edges)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import search_snippets

DOCS = [
    # rare ("quux") at position 0 → left-clamped window
    "quux common common common common common common common",
    # rare term mid-doc
    "common common common quux common common common common common",
    # only the frequent term
    "common common words here",
    # rare at the very end → right-clamped window
    "common common common common common common common quux",
]


@pytest.fixture(scope="module")
def snip_sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("snip_sf")
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


def test_snippet_rarest_term_and_windows(snip_sf_dir):
    out = search_snippets(snip_sf_dir, "common quux", k=10, radius=2)
    by_doc = {r.doc_id: r for r in out.itertuples()}
    # docs with quux choose it (df 3 < df 4 of common)
    assert by_doc[0].term == "quux" and by_doc[0].pos == 0
    assert by_doc[0].snippet == "quux common common"          # left clamp
    assert by_doc[1].term == "quux" and by_doc[1].pos == 3
    assert by_doc[1].snippet == "common quux common common".replace(
        "common quux", "common common quux"
    )  # full 2+1+2 window
    assert by_doc[3].term == "quux" and by_doc[3].pos == 7
    assert by_doc[3].snippet == "common common quux"          # right clamp
    # doc 2 contains only "common", which appears in every doc →
    # idf 0 → score 0 → correctly excluded from the result set
    assert 2 not in by_doc


def test_snippet_empty_on_no_hits(snip_sf_dir):
    out = search_snippets(snip_sf_dir, "zzz qqq", k=10)
    assert len(out) == 0
    assert list(out.columns) == [
        "rank", "doc_id", "term", "pos", "snippet", "score",
    ]


def test_snippet_tie_break_lexicographic(snip_sf_dir):
    # "quux" and "words": df('words')=1 < df('quux')=3 → words wins on
    # its doc; elsewhere quux
    out = search_snippets(snip_sf_dir, "quux words", k=10, radius=1)
    by_doc = {r.doc_id: r for r in out.itertuples()}
    assert by_doc[2].term == "words" and by_doc[2].snippet == "common words here"
    assert by_doc[0].term == "quux"


def test_more_like_this_excludes_source_and_ranks(snip_sf_dir):
    from zensearch_ray.pipelines.corpus import more_like_this

    out = more_like_this(snip_sf_dir, doc_id=0, m=3, k=10)
    assert 0 not in set(out["doc_id"])
    # docs 1 and 3 share the rare "quux" with doc 0 → both retrieved,
    # ranked above any doc without it
    assert set(out["doc_id"]) >= {1, 3}
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_more_like_this_idf_zero_source_terms(snip_sf_dir):
    from zensearch_ray.pipelines.corpus import more_like_this

    # doc 2's vocabulary: common (idf 0) + words (unique to it, no
    # OTHER doc contains it) → only "words"/"here" qualify but no other
    # doc matches → empty result
    out = more_like_this(snip_sf_dir, doc_id=2, m=5, k=10)
    assert len(out) == 0
