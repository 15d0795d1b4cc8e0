"""Phrase suggester: whole-query correction reranked by the corpus
bigram LM — must beat token-level df ranking when bigram evidence
disagrees (the reason the operator exists)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import did_you_mean, suggest_phrase

# df(row) > df(slow)  — token-level "did you mean" must pick "row" —
# but "slow data" is a frequent bigram while "row data" never occurs,
# so the PHRASE suggester must rank "slow data" first.
DOCS = (
    ["row merge", "row merge", "row filter", "row scan", "row join"]
    + ["slow data stream"] * 4
)


@pytest.fixture(scope="module")
def sp_sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("sp_sf")
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


def test_lm_overrides_df_rank(sp_sf_dir):
    dym = did_you_mean(sp_sf_dir, "sow")
    assert list(dym["suggestion"]) == ["row"]  # df winner at token level
    got = suggest_phrase(sp_sf_dir, "sow dat", k=2)
    assert list(got["phrase"]) == ["slow data", "row data"]
    assert got["logp"][0] > got["logp"][1]


def test_identity_phrase_scores_and_referee(sp_sf_dir):
    # exact tokens: the identity phrase is a candidate; referee the
    # pinned chain by hand (uni/bigram counts of the planted corpus)
    got = suggest_phrase(sp_sf_dir, "slow data", k=1)
    assert got["phrase"][0] == "slow data"
    total = sum(len(d.split()) for d in DOCS)
    c_slow, c_sd = 4, 4  # unigram 'slow', bigram 'slow data'
    want = np.log(c_slow / total) + np.log(c_sd / c_slow)
    assert got["logp"][0] == pytest.approx(round(want, 6), abs=1e-9)


def test_no_neighbor_token_kept(sp_sf_dir):
    # an OOV token with no dictionary neighbor survives as itself,
    # scored with the floored backoff — phrase arity never changes
    got = suggest_phrase(sp_sf_dir, "zzzqqq dat", k=1)
    assert got["phrase"][0] == "zzzqqq data"


def test_empty_query_empty_frame(sp_sf_dir):
    got = suggest_phrase(sp_sf_dir, "...", k=3)
    assert len(got) == 0
    assert list(got.columns) == ["rank", "phrase", "logp"]


def test_all_oov_query_backoff_no_crash(sp_sf_dir):
    # ALL candidate grams absent from the corpus: the counts aggregate
    # comes back as an all-empty frame (which loses its columns in
    # to_pandas) — must fall through to backoff scoring, not KeyError.
    got = suggest_phrase(sp_sf_dir, "zzzqqq wwwyyy", k=2)
    assert got["phrase"][0] == "zzzqqq wwwyyy"
    assert np.isfinite(got["logp"][0])
