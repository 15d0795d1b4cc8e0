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
