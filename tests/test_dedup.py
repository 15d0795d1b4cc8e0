"""Exact dedup operator (A7): keep first row per key by order column."""

import ray.data as rd

from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.stages.dedup import dedup_by_key, find_duplicate_keys


def test_find_duplicate_keys(ray_session):
    t = generate_pages_table(n_rows=80, seed=42, dup_fraction=0.25)
    ds = rd.from_arrow(t)
    dups = find_duplicate_keys(ds, "url")
    urls = t["url"].to_pylist()
    expected = {u for u in urls if urls.count(u) > 1}
    assert dups == expected


def test_dedup_keeps_first_by_warc_ts(ray_session):
    t = generate_pages_table(n_rows=80, seed=42, dup_fraction=0.25)
    ds = rd.from_arrow(t)
    out = dedup_by_key(ds, "url", order_col="warc_ts").to_pandas()
    assert len(out) == 80
    assert out["url"].is_unique
    # kept row per duplicated url is the earliest warc_ts occurrence
    pdf = t.to_pandas()
    first = pdf.sort_values("warc_ts").groupby("url", as_index=False).first()
    merged = out.merge(first, on="url", suffixes=("", "_want"))
    assert (merged["warc_ts"] == merged["warc_ts_want"]).all()


def test_dedup_no_duplicates_passthrough(ray_session):
    t = generate_pages_table(n_rows=50, seed=42, dup_fraction=0.0)
    ds = rd.from_arrow(t)
    out = dedup_by_key(ds, "url", order_col="warc_ts")
    assert out.count() == 50


def test_simhash_near_pairs_exact_recall(ray_session):
    """Banded simhash pair detection must find exactly the pairs a
    brute-force hamming scan finds (pigeonhole: n_bands > max_hamming)."""
    import numpy as np
    import ray.data as rd

    from zensearch_ray.stages.minhash import SimHashStage, simhash_near_pairs

    SF = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    # brute-force oracle over all fingerprints
    fp = ds.map_batches(SimHashStage, batch_format="pyarrow", concurrency=2).to_pandas()
    ids = fp["doc_id"].to_numpy()
    h = fp["simhash"].to_numpy().astype(np.uint64)
    want = set()
    for i in range(len(ids)):
        x = h[i] ^ h[i + 1 :]
        for j in np.flatnonzero(np.array([bin(int(v)).count("1") for v in x]) <= 6):
            a, b = int(ids[i]), int(ids[i + 1 + j])
            want.add((min(a, b), max(a, b)))
    got_df = simhash_near_pairs(ds, max_hamming=6, n_bands=7)
    got = set(zip(got_df["a"].tolist(), got_df["b"].tolist()))
    assert got == want


def _span_dedup_referee(docs, w):
    """Brute-force span dedup: dict of span-string -> first (doc_id,
    span_idx); rebuild each doc keeping winners only."""
    from zensearch_ray.functions.text import tokenize

    first = {}
    counts = {}
    spans_of = {}
    for did, text in sorted(docs):
        toks = tokenize(text)
        spans = [
            " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
        ]
        spans_of[did] = (toks, spans)
        for idx, s in enumerate(spans):
            counts[s] = counts.get(s, 0) + 1
            first.setdefault(s, (did, idx))
    out = {}
    for did, (toks, spans) in spans_of.items():
        kept = [
            s
            for idx, s in enumerate(spans)
            if counts[s] == 1 or first[s] == (did, idx)
        ]
        nrm = len(spans) - len(kept)
        out[did] = (" ".join(kept), len(spans), nrm)
    return out


def test_span_dedup_matches_referee_both_vias(ray_session):
    import pyarrow as pa

    from zensearch_ray.stages.dedup import span_dedup

    w = 3
    base = "aa bb cc dd ee ff"          # two full spans at w=3
    docs = [
        (0, base + " gg hh"),           # winner of both spans + tail
        (1, base),                      # loses both spans -> empty text
        (2, "dd ee ff xx yy zz aa bb cc"),  # loses span0 ('dd ee ff') and span2
        (3, "aa bb cc aa bb cc"),       # within-doc repeat: 2nd loses
        (4, ""),                        # empty doc
        (5, "gg hh"),                   # short tail span, equals doc0's
                                        # TAIL? no - doc0 tail is 'gg hh'
                                        # (len 2) -> duplicate short span
        (6, "unique words only here"),
    ]
    exp = _span_dedup_referee(docs, w)
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([x for _, x in docs], type=pa.string()),
        }
    )
    for via in ("broadcast", "shuffle"):
        got = (
            span_dedup(rd.from_arrow(t), w=w, n_buckets=4, via=via)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert len(got) == len(docs), via
        for _, r in got.iterrows():
            e_text, e_ns, e_nrm = exp[r["doc_id"]]
            assert r["text"] == e_text, (via, r["doc_id"])
            assert r["n_spans"] == e_ns, (via, r["doc_id"])
            assert r["n_removed"] == e_nrm, (via, r["doc_id"])


def test_span_dedup_no_duplicates_is_identity(ray_session):
    import pyarrow as pa

    from zensearch_ray.stages.dedup import span_dedup

    docs = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(20)]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([x for _, x in docs], type=pa.string()),
        }
    )
    got = (
        span_dedup(rd.from_arrow(t), w=2, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (got["n_removed"] == 0).all()
    assert list(got["text"]) == [x for _, x in docs]
