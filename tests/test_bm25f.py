"""BM25F fielded (title-boosted) search: BuildConfig.title_boost folds
boost·tf_title into tf and boost·dl_title into doc_len at tokenize time.

Referee: integer field boost is EXACTLY equivalent to token repetition,
so the oracle is the already-trusted ``BM25Oracle`` over
``text + boost × (" " + title)`` — no new scoring code on the referee
side (the test only trusts kernels the engine does not share).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import BM25Oracle
from zensearch_ray.functions.rounding import round6
from zensearch_ray.pipelines.build_index import (
    BuildConfig,
    build_index,
    config_fingerprint,
)
from zensearch_ray.pipelines.query import QueryEngine

BOOST = 2

# titles deliberately NOT substrings of their bodies: a title-only term
# must be retrievable (df comes from the boosted tf dict, not the body)
_DOCS = [
    ("alpha beta gamma delta beta", "zebra quark"),
    ("beta gamma delta epsilon", "alpha prime"),
    ("gamma delta epsilon zeta gamma gamma", "beta minor"),
    ("delta epsilon zeta eta", "quark lepton"),
    ("epsilon zeta eta theta epsilon", "gamma ray"),
    ("zeta eta theta iota", "zebra stripe"),
    ("eta theta iota kappa eta", "delta wing"),
    ("theta iota kappa lambda", "prime mover"),
]


@pytest.fixture(scope="module")
def titled_corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25f") / "docs.parquet")
    n = len(_DOCS)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "url": pa.array([f"https://x.test/{i}" for i in range(n)]),
                "warc_ts": pa.array(
                    np.arange(n, dtype=np.int64), type=pa.timestamp("us")
                ),
                "text": pa.array([t for t, _ in _DOCS]),
                "title": pa.array([ti for _, ti in _DOCS]),
                "lang": pa.array(["en"] * n),
            }
        ),
        path,
    )
    return path


@pytest.fixture(scope="module")
def fielded_index(ray_session, titled_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bm25f_idx"))
    cfg = BuildConfig(
        num_shards=4, salt_subs=2, lang=None, id_col="doc_id", title_boost=BOOST
    )
    build_index(titled_corpus, d, cfg)
    return d


QUERIES = [
    "zebra",            # title-only term
    "gamma",            # body-heavy term, also one title
    "alpha prime",      # split across fields
    "beta gamma delta",
    "quark lepton zebra",
    "nosuchterm",
]


def test_bm25f_rank_identical_to_token_repetition_oracle(fielded_index):
    # the fielded engine must equal plain BM25 over title-repeated text
    oracle = BM25Oracle(
        list(range(len(_DOCS))),
        [t + BOOST * (" " + ti) for t, ti in _DOCS],
    )
    engine = QueryEngine(fielded_index)
    for q in QUERIES:
        got = [(d, round6(s)) for d, s in engine.topk(q, k=8)]
        want = [(d, round6(s)) for d, s in oracle.topk(q, k=8)]
        assert got == want, f"query {q!r}: {got} != {want}"


def test_title_only_term_is_retrievable(fielded_index):
    hits = QueryEngine(fielded_index).topk("zebra", k=8)
    assert {d for d, _ in hits} == {0, 5}  # the two zebra-titled docs


def test_boost_changes_ranking(ray_session, titled_corpus, fielded_index, tmp_path_factory):
    # non-vacuity: the same corpus indexed WITHOUT boost must differ —
    # title-only terms are absent, and fielded ranks shift
    d = str(tmp_path_factory.mktemp("plain_idx"))
    build_index(
        titled_corpus, d, BuildConfig(num_shards=4, salt_subs=2, lang=None, id_col="doc_id")
    )
    assert QueryEngine(d).topk("zebra", k=8) == []
    q = "gamma beta"
    plain = [doc for doc, _ in QueryEngine(d).topk(q, k=8)]
    fielded = [doc for doc, _ in QueryEngine(fielded_index).topk(q, k=8)]
    assert plain and fielded and plain != fielded


def test_title_boost_incompatible_with_positions(titled_corpus, tmp_path_factory):
    with pytest.raises(ValueError, match="positional"):
        build_index(
            titled_corpus,
            str(tmp_path_factory.mktemp("bad_idx")),
            BuildConfig(
                num_shards=4, salt_subs=2, lang=None, id_col="doc_id",
                title_boost=1, positions=True,
            ),
        )


def test_fingerprint_separates_fielded_indexes():
    base = BuildConfig(num_shards=4, salt_subs=2, lang=None, id_col="doc_id")
    boosted = BuildConfig(
        num_shards=4, salt_subs=2, lang=None, id_col="doc_id", title_boost=2
    )
    assert config_fingerprint(base, "col") != config_fingerprint(boosted, "col")
