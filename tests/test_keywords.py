"""doc_keywords: per-doc top-m tf·idf terms vs a brute-force referee
on a handcrafted corpus (idf-0 exclusion, tf weighting, tie→term ASC,
m truncation)."""

import math
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import doc_keywords

DOCS = [
    "apple apple apple banana common",      # tf dominates: apple first
    "banana cherry cherry common common",   # tie shapes: cherry > banana
    "date elderberry common apple",         # singletons tie → term ASC
]


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("kw_sf")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
                "text": pa.array(DOCS, type=pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _referee(m: int):
    n = len(DOCS)
    df = Counter(t for doc in DOCS for t in set(doc.split()))
    out = []
    for i, doc in enumerate(DOCS):
        tf = Counter(doc.split())
        ws = [
            (t, c * math.log(n / df[t]))
            for t, c in tf.items()
            if df[t] < n  # idf == 0 excluded ("common" is in every doc)
        ]
        ws.sort(key=lambda tw: (-tw[1], tw[0]))
        out.extend(
            (i, r + 1, t, round(w, 6)) for r, (t, w) in enumerate(ws[:m])
        )
    return sorted(out)


@pytest.mark.parametrize("m", [2, 5])
def test_doc_keywords_matches_referee(sf_dir, m):
    got = doc_keywords(sf_dir, m=m).to_pandas()
    rows = sorted(
        (int(r.doc_id), int(r.rank), r.term, round(float(r.weight), 6))
        for r in got.itertuples()
    )
    assert rows == _referee(m)
    # "common" (df == N → idf 0) never appears
    assert "common" not in set(got["term"])
