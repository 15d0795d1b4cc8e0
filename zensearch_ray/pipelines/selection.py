"""DSIR-style data selection: importance weights for every document
against a target distribution (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" — public method). The
reference engine has no data-selection surface (it indexes whatever
the crawler stored); this is the training-data-pipeline step that
decides WHICH crawled documents are worth keeping, upstream of the
index build.

Method, pinned exactly (so the whole computation is value-checkable
against DuckDB):

  - features(d): the unigrams AND adjacent bigrams ("a b") of
    tokenize(text), occurrences with multiplicity (the paper's hashed
    n-gram features with the hashing replaced by the raw n-gram
    identity — hashing is a memory optimization that changes values,
    so the exact variant is the checkable one; at web scale swap the
    feature key for hash(f) % B and the model table shrinks to B
    buckets with identical plumbing).
  - two bag-of-features multinomials, Laplace α=1 smoothing over the
    RAW feature vocabulary V (raw ⊇ target, so no doc feature is OOV):
        p_t(f) = (C_t(f)+1) / (N_t+|V|)    target = docs with lang='en'
        p_r(f) = (C_r(f)+1) / (N_r+|V|)    raw    = the whole corpus
  - log importance weight
        log w(d) = Σ_{f ∈ features(d)} [ln p_t(f) − ln p_r(f)]
    (un-normalized by length, per the paper — resampling operates on
    totals). The paper then samples ∝ w via Gumbel-top-k; that step is
    randomized, so the engine exposes the weights and leaves the k
    draw to the caller (a deterministic top-m cut is `nlargest`).

Scale shape: one Counter-partial pass over the corpus → ONE
vocab-scale `groupby(feature).sum` exchange (the `doc_lm_score` /
`top_bigrams` shape — at web scale this is the hashed-bucket combine),
log-ratio model broadcast once via `ray.put`, then a map-only scoring
pass. Text crosses the cluster exactly once in each pass and never
rides the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Sum

from zensearch_ray.functions.rounding import round6
from zensearch_ray.functions.text import tokenize

TARGET_LANG = "en"  # the pinned target predicate for the driver entry


def _features(toks: list[str]) -> list[str]:
    """Unigrams + adjacent bigrams, multiplicity preserved."""
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def dsir_weights(ds, target_col: str = "lang",
                 target_value: str = TARGET_LANG):
    """(doc_id, log_weight) for every input doc; ``ds`` must carry
    (doc_id, text, <target_col>). log_weight round6'd."""
    import ray

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c_raw: Counter = Counter()
        c_tgt: Counter = Counter()
        tgt_mask = [v == target_value for v in batch[target_col].to_pylist()]
        for is_tgt, text in zip(tgt_mask, batch["text"].to_pylist()):
            fs = _features(tokenize(text))
            c_raw.update(fs)
            if is_tgt:
                c_tgt.update(fs)
        keys = list(c_raw.keys())
        return pa.table(
            {
                "f": pa.array(keys, type=pa.string()),
                "c_raw": pa.array([c_raw[k] for k in keys], type=pa.int64()),
                "c_tgt": pa.array([c_tgt[k] for k in keys], type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=None)
        .groupby("f")
        .aggregate(Sum("c_raw", alias_name="c_raw"),
                   Sum("c_tgt", alias_name="c_tgt"))
        .to_pandas()
    )
    n_raw = float(counts["c_raw"].sum())
    n_tgt = float(counts["c_tgt"].sum())
    v = float(len(counts))
    ratio = np.log((counts["c_tgt"].to_numpy() + 1.0) / (n_tgt + v)) - np.log(
        (counts["c_raw"].to_numpy() + 1.0) / (n_raw + v)
    )
    model = dict(zip(counts["f"], ratio.tolist()))
    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        out = np.zeros(batch.num_rows, dtype=np.float64)
        for i, text in enumerate(batch["text"].to_pylist()):
            fs = _features(tokenize(text))
            if fs:
                out[i] = sum(m[f] for f in fs)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "log_weight": pa.array(round6(out), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").select_columns(
        ["doc_id", "log_weight"]
    )


def dsir_weights_for(sf_dir: str):
    """Driver entry: DSIR log importance weights of every document
    against the lang='en' target slice. Columns (doc_id, log_weight)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return dsir_weights(ds)


# ---------------------------------------------------------------------------
# fastText-style quality classifier (DCLM / FineWeb-Edu genre): a linear
# model over hashed bag-of-ngram features, trained distributed, then a
# map-only scoring pass. Complements dsir_weights: DSIR is generative
# (two multinomials, a fixed formula), this is DISCRIMINATIVE (logistic
# regression fit by full-batch gradient descent), the shape used by the
# public quality-filter pipelines (CCNet's fastText lang/quality models,
# DCLM's fastText classifier, FineWeb-Edu's regressor).
# ---------------------------------------------------------------------------

N_BUCKETS = 1 << 16  # hashed feature space (D); the driver-entry default


def _hashed(toks: list[str], n_buckets: int):
    """Hashed unigram+bigram mean-bag: (bucket ids, values) with values
    = multiplicity / n_features (mean bag keeps z = w·x bounded, the
    fastText normalization). crc32 is the pinned hash — process- and
    platform-stable (PYTHONHASHSEED-proof), matching the hashing-trick
    swap point ``dsir_weights`` documents."""
    from zlib import crc32

    fs = _features(toks)
    if not fs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    b = np.fromiter(
        (crc32(f.encode("utf-8")) % n_buckets for f in fs),
        dtype=np.int64, count=len(fs),
    )
    uniq, counts = np.unique(b, return_counts=True)
    return uniq, counts.astype(np.float64) / len(fs)


def featurize_quality(ds, label_col: str = "lang",
                      label_value: str = TARGET_LANG,
                      n_buckets: int = N_BUCKETS):
    """ONE tokenize+hash pass: (doc_id, y, buckets, vals) — the compact
    training representation the gradient loop iterates (the text never
    re-tokenizes per iteration and never rides the loop). Materialized
    by the caller; at web scale this is the standard featurized-cache
    step every distributed-LR pipeline persists."""

    def feat(batch: pa.Table) -> pa.Table:
        ys, bks, vls = [], [], []
        for text, lab in zip(batch["text"].to_pylist(),
                             batch[label_col].to_pylist()):
            b, v = _hashed(tokenize(text), n_buckets)
            ys.append(1.0 if lab == label_value else 0.0)
            bks.append(b)
            vls.append(v)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "y": pa.array(ys, type=pa.float64()),
                "buckets": pa.array(bks, type=pa.list_(pa.int64())),
                "vals": pa.array(vls, type=pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(feat, batch_format="pyarrow")


def _flat(batch: pa.Table):
    """(row-repeat index, bucket, value) flat arrays for one featurized
    batch — everything after this is pure vectorized numpy."""
    bk = batch["buckets"]
    counts = np.asarray(
        [len(bk[i]) for i in range(len(bk))], dtype=np.int64
    )
    rep = np.repeat(np.arange(batch.num_rows, dtype=np.int64), counts)
    flat_b = np.asarray(bk.combine_chunks().flatten(), dtype=np.int64)
    flat_v = np.asarray(
        batch["vals"].combine_chunks().flatten(), dtype=np.float64
    )
    return rep, flat_b, flat_v


def train_quality_classifier(feat_ds, n_buckets: int = N_BUCKETS,
                             iters: int = 30, lr: float = 2.0,
                             l2: float = 1e-6):
    """Full-batch logistic regression by gradient descent, the kmeans
    parameter-server shape: weights broadcast once per iteration
    (``ray.put``), every batch emits an O(D) dense gradient partial
    (σ(w·x)−y outer the sparse features, one np.add.at), the driver
    streams partials in O(D) memory and takes the step. Deterministic
    given the block partitioning (fp64 partial order); fixed lr — the
    mean-bag features are bounded so the loss is well-conditioned.
    Returns {"w": (D,) float64, "b": float, "loss": per-iter list}."""
    import ray

    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    losses = []
    for _ in range(iters):
        ref = ray.put((w, bias))

        def partial(batch: pa.Table) -> pa.Table:
            ww, bb = ray.get(ref)
            rep, fb, fv = _flat(batch)
            z = np.full(batch.num_rows, bb, dtype=np.float64)
            np.add.at(z, rep, ww[fb] * fv)
            p = 1.0 / (1.0 + np.exp(-z))
            y = batch["y"].to_numpy(zero_copy_only=False)
            err = p - y
            grad = np.zeros(len(ww), dtype=np.float64)
            np.add.at(grad, fb, err[rep] * fv)
            # clipped log-loss (p can saturate to 0/1 in fp64)
            eps = 1e-12
            loss = -np.sum(
                y * np.log(np.maximum(p, eps))
                + (1.0 - y) * np.log(np.maximum(1.0 - p, eps))
            )
            return pa.table(
                {
                    "grad": pa.array([grad]),
                    "gbias": pa.array([float(err.sum())], type=pa.float64()),
                    "loss": pa.array([float(loss)], type=pa.float64()),
                    "n": pa.array([batch.num_rows], type=pa.int64()),
                }
            )

        g = np.zeros(n_buckets, dtype=np.float64)
        gb, lo, n = 0.0, 0.0, 0
        for b in feat_ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for gr, gbi, li, ni in zip(
                b["grad"].to_pylist(), b["gbias"].to_pylist(),
                b["loss"].to_pylist(), b["n"].to_pylist(),
            ):
                g += np.asarray(gr, dtype=np.float64)
                gb += gbi
                lo += li
                n += ni
        if n == 0:
            raise ValueError("empty training set")
        w = w - lr * (g / n + l2 * w)
        bias = bias - lr * (gb / n)
        losses.append(lo / n)
    return {"w": w, "b": bias, "loss": losses, "n_buckets": n_buckets}


def score_quality_classifier(ds, model):
    """Map-only scoring pass over (doc_id, text): σ(w·x+b) per doc —
    the model broadcast once, text read once. Columns (doc_id, prob)."""
    import ray

    ref = ray.put((model["w"], model["b"], model["n_buckets"]))

    def score(batch: pa.Table) -> pa.Table:
        w, b, nb = ray.get(ref)
        out = np.empty(batch.num_rows, dtype=np.float64)
        for i, text in enumerate(batch["text"].to_pylist()):
            bk, vv = _hashed(tokenize(text), nb)
            out[i] = 1.0 / (1.0 + np.exp(-(float(w[bk] @ vv) + b)))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "prob": pa.array(round6(out), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").select_columns(
        ["doc_id", "prob"]
    )


def quality_classifier_for(sf_dir: str, iters: int = 30):
    """Driver entry: train the hashed-ngram logistic quality classifier
    with lang='en' as the positive slice (the discriminative twin of
    ``dsir_weights_for``'s target), then score every document.
    Columns (doc_id, prob). Rows-only by contract: iterative GD is not
    SQL-expressible; exactness is pinned by the local-referee identity
    test instead (``tests/test_selection.py``)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    feat = featurize_quality(ds).materialize()
    model = train_quality_classifier(feat, iters=iters)
    return score_quality_classifier(ds, model)
