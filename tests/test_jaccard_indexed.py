"""Index-backed jaccard_topk: posting-union candidates + pruned text
fetch must equal the full-scan referee, fill with zero-overlap docs in
doc_id order, and provably NOT scan the corpus (diagnosed row yields)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.corpus import jaccard_topk_indexed
from zensearch_ray.stages.minhash import jaccard_topk

N_DOCS = 200
SHARED = 5  # docs 1..5 share tokens with doc 0; everyone else disjoint


@pytest.fixture(scope="module")
def sparse_sf_dir(ray_session, tmp_path_factory):
    """Corpus with mostly DISJOINT vocabularies: probe doc 0 overlaps
    only docs 1..5, so the posting-union candidate set is tiny."""
    d = tmp_path_factory.mktemp("jacc_sf")
    texts = []
    for i in range(N_DOCS):
        own = " ".join(f"w{i}x{j}" for j in range(20))
        if i == 0:
            own += " shareda sharedb sharedc"
        elif i <= SHARED:
            # deeper overlap for closer ranks
            own += " shareda" + (" sharedb" if i <= 2 else "")
        texts.append(own)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * N_DOCS),
            "source": pa.array(["t"] * N_DOCS),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


def _referee(sf_dir: str, k: int = 10) -> pd.DataFrame:
    probe_text = pq.read_table(
        f"{sf_dir}/documents.parquet",
        filters=[("doc_id", "==", 0)], columns=["text"],
    )["text"][0].as_py()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = jaccard_topk(ds, set(tokenize(probe_text)), k=k, exclude_id=0)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out.astype({"rank": np.int64, "doc_id": np.int64})


def test_matches_fullscan_referee_with_zero_fill(sparse_sf_dir):
    diag = {}
    got = jaccard_topk_indexed(sparse_sf_dir, probe_doc_id=0, k=10,
                               _diag=diag)
    want = _referee(sparse_sf_dir, k=10)
    pd.testing.assert_frame_equal(got, want)
    # only 5 docs overlap → ranks 6..10 are the zero fill in id order
    assert (got["jaccard"].to_numpy()[SHARED:] == 0.0).all()
    assert list(got["doc_id"][SHARED:]) == [6, 7, 8, 9, 10]


def test_no_full_scan(sparse_sf_dir):
    diag = {}
    jaccard_topk_indexed(sparse_sf_dir, probe_doc_id=0, k=10, _diag=diag)
    assert diag["n_candidates"] == SHARED
    # the pruned read yields candidate-scale rows, not the corpus
    assert diag["n_text_rows_fetched"] <= SHARED * 4
    assert diag["n_text_rows_fetched"] < N_DOCS / 4


def test_vocabulary_miss_is_instant_zero_fill(sparse_sf_dir, tmp_path):
    # a probe whose tokens exist in NO other doc: no candidates, no
    # text fetch at all; result is the k smallest other ids at 0.0
    d = str(tmp_path)
    texts = ["uniqueprobe tokenonly"] + [
        f"v{i}a v{i}b" for i in range(1, 40)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(40, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(["t"] * 40),
        }),
        f"{d}/documents.parquet",
    )
    diag = {}
    got = jaccard_topk_indexed(d, probe_doc_id=0, k=10, _diag=diag)
    assert diag["n_candidates"] == 0
    assert diag["n_text_rows_fetched"] == 0
    assert list(got["doc_id"]) == list(range(1, 11))
    assert (got["jaccard"] == 0.0).all()


def test_entry_scale_parity(ray_session):
    # the real corpus: index-backed path == full-scan referee
    sf = "/root/testdata/sf0.001"
    got = jaccard_topk_indexed(sf, probe_doc_id=0, k=10)
    want = _referee(sf, k=10)
    pd.testing.assert_frame_equal(got, want)
