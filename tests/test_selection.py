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


# ---------------------------------------------------------------------------
# hashed-ngram logistic quality classifier (the discriminative twin)
# ---------------------------------------------------------------------------

# two disjoint vocabularies → a perfectly separable planted task
_POS_DOCS = [
    "wiki article encyclopedia reference cited source",
    "encyclopedia reference wiki cited article",
    "reference article wiki encyclopedia cited cited",
    "cited reference encyclopedia wiki article source",
]
_NEG_DOCS = [
    "spam click buy now cheap deal",
    "cheap deal spam buy click click",
    "buy cheap now spam deal click",
    "deal now buy spam cheap click now",
]


@pytest.fixture(scope="module")
def planted_quality_dir(ray_session, tmp_path_factory):
    import pyarrow as pa

    d = tmp_path_factory.mktemp("quality_clf")
    docs = _POS_DOCS + _NEG_DOCS
    labs = ["en"] * len(_POS_DOCS) + ["de"] * len(_NEG_DOCS)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(labs),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _local_gd(docs, labels, n_buckets, iters, lr, l2):
    """Reference implementation of the SAME full-batch GD, pure local —
    one flat loop over all docs per iteration (order-free math: the
    gradient is a sum; fp64 grouping differences are below the 1e-9
    assert tolerance)."""
    from zensearch_ray.pipelines.selection import _hashed

    feats = [_hashed(tokenize(t), n_buckets) for t in docs]
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        grad = np.zeros(n_buckets, dtype=np.float64)
        gb = 0.0
        for (bk, vv), yi in zip(feats, y):
            z = float(w[bk] @ vv) + b
            err = 1.0 / (1.0 + np.exp(-z)) - yi
            np.add.at(grad, bk, err * vv)
            gb += err
        n = len(docs)
        w = w - lr * (grad / n + l2 * w)
        b = b - lr * (gb / n)
    return w, b


def test_quality_classifier_matches_local_referee(planted_quality_dir):
    import ray.data as rd

    from zensearch_ray.pipelines.selection import (
        featurize_quality,
        score_quality_classifier,
        train_quality_classifier,
    )

    nb, iters, lr, l2 = 1 << 12, 20, 2.0, 1e-6
    ds = rd.read_parquet(f"{planted_quality_dir}/documents.parquet")
    feat = featurize_quality(ds, n_buckets=nb).materialize()
    model = train_quality_classifier(feat, n_buckets=nb, iters=iters,
                                     lr=lr, l2=l2)
    docs = _POS_DOCS + _NEG_DOCS
    labels = [1] * len(_POS_DOCS) + [0] * len(_NEG_DOCS)
    w_ref, b_ref = _local_gd(docs, labels, nb, iters, lr, l2)
    assert np.allclose(model["w"], w_ref, atol=1e-9)
    assert abs(model["b"] - b_ref) < 1e-9
    # training loss decreases monotonically on the separable task
    assert all(a >= b for a, b in zip(model["loss"], model["loss"][1:]))

    # scoring pass == manual sigma(w·x + b), round6'd
    from zensearch_ray.functions.rounding import round6
    from zensearch_ray.pipelines.selection import _hashed

    got = (
        score_quality_classifier(ds, model)
        .to_pandas().set_index("doc_id")["prob"]
    )
    for did, text in enumerate(docs):
        bk, vv = _hashed(tokenize(text), nb)
        want = round6(
            1.0 / (1.0 + np.exp(-(float(model["w"][bk] @ vv) + model["b"])))
        )
        assert got[did] == want, did


def test_quality_classifier_separates_planted_task(planted_quality_dir):
    from zensearch_ray.pipelines.selection import quality_classifier_for

    probs = (
        quality_classifier_for(planted_quality_dir, iters=60)
        .to_pandas().set_index("doc_id")["prob"]
    )
    pos = [probs[i] for i in range(len(_POS_DOCS))]
    neg = [probs[len(_POS_DOCS) + i] for i in range(len(_NEG_DOCS))]
    assert min(pos) > max(neg)  # perfect ranking on disjoint vocab
    assert min(pos) > 0.5 > max(neg)


def test_hashed_features_pins():
    from zensearch_ray.pipelines.selection import _hashed

    bk, vv = _hashed(["a", "b", "a"], 1 << 16)
    # features: a b a + bigrams "a b" "b a" → 5 features, values sum to 1
    assert vv.sum() == pytest.approx(1.0)
    assert len(bk) == len(set(bk.tolist()))  # deduped buckets
    b2, v2 = _hashed([], 16)
    assert len(b2) == 0 and len(v2) == 0
    # crc32 hashing is process-stable: same call, same buckets
    bk2, _ = _hashed(["a", "b", "a"], 1 << 16)
    assert (bk == bk2).all()


def test_quality_classifier_empty_raises(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from zensearch_ray.pipelines.selection import (
        featurize_quality,
        train_quality_classifier,
    )

    t = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
    feat = featurize_quality(ds, n_buckets=64).materialize()
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(feat, n_buckets=64, iters=1)
