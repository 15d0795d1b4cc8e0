"""DSIR importance weights (pipelines/selection.py): must equal an
independent brute-force referee (pure-Python Counters, no Ray
aggregation), and carry the signal the method promises — target-slice
documents receive higher weights on average than off-target ones."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.selection import _features, dsir_weights_for

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def weights(ray_session):
    return (
        dsir_weights_for(SF).to_pandas().set_index("doc_id")["log_weight"]
    )


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return list(
        zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
            t["lang"].to_pylist())
    )


def test_matches_brute_force_referee(weights, docs):
    c_raw: Counter = Counter()
    c_tgt: Counter = Counter()
    for _, text, lang in docs:
        fs = _features(tokenize(text))
        c_raw.update(fs)
        if lang == "en":
            c_tgt.update(fs)
    n_r, n_t, v = sum(c_raw.values()), sum(c_tgt.values()), len(c_raw)
    model = {
        f: math.log((c_tgt[f] + 1.0) / (n_t + v))
        - math.log((c + 1.0) / (n_r + v))
        for f, c in c_raw.items()
    }
    assert len(weights) == len(docs)
    for did, text, _ in docs:
        want = sum(model[f] for f in _features(tokenize(text)))
        assert abs(weights[did] - want) < 1e-5, did


def test_target_slice_scores_higher(weights, docs):
    en = [weights[d] for d, _, lang in docs if lang == "en"]
    other = [weights[d] for d, _, lang in docs if lang != "en"]
    assert en and other
    assert np.mean(en) > np.mean(other) + 1.0  # clear separation


def test_features_shape():
    assert _features(["a", "b", "c"]) == ["a", "b", "c", "a b", "b c"]
    assert _features(["x"]) == ["x"]
    assert _features([]) == []
