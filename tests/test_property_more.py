"""More hypothesis property coverage: the positional codec over
arbitrary generated structure, and exact_quantiles vs the
percentile_disc referee over arbitrary value/group distributions."""

import math

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zensearch_ray.functions.bm25 import BM25Params


@st.composite
def _posting_rows(draw):
    """(term_idx, doc_id, positions) rows: 1-4 terms, each with 1-20
    sorted-unique docs, each doc with 1-6 strictly-increasing
    positions."""
    rows = []
    n_terms = draw(st.integers(1, 4))
    for ti in range(n_terms):
        n_docs = draw(st.integers(1, 20))
        docs = sorted(
            draw(
                st.sets(st.integers(0, 3000), min_size=n_docs, max_size=n_docs)
            )
        )
        for d in docs:
            tf = draw(st.integers(1, 6))
            pos = sorted(
                draw(st.sets(st.integers(0, 500), min_size=tf, max_size=tf))
            )
            rows.append((ti, d, np.asarray(pos, dtype=np.int64)))
    return rows


@settings(max_examples=60, deadline=None)
@given(_posting_rows())
def test_positional_codec_roundtrip_property(rows):
    from zensearch_ray.functions.codec import decode_positions, encode_partition

    doc_ids = np.array([r[1] for r in rows], dtype=np.int64)
    tfs = np.array([len(r[2]) for r in rows], dtype=np.int64)
    dls = np.full(len(rows), 40, dtype=np.int64)
    term_idx = np.array([r[0] for r in rows])
    starts = np.flatnonzero(np.concatenate(([1], np.diff(term_idx))))
    ends = np.concatenate((starts[1:], [len(rows)]))
    flat_pos = np.concatenate([r[2] for r in rows])
    cols = encode_partition(
        doc_ids, tfs, dls, starts, ends, 40.0, BM25Params(),
        flat_positions=flat_pos,
    )
    for ti, (s, e) in enumerate(zip(starts, ends)):
        flat = decode_positions(cols["pos"][ti].as_py(), tfs[s:e])
        np.testing.assert_array_equal(
            flat, np.concatenate([rows[j][2] for j in range(s, e)])
        )


def _disc(sorted_vals, q):
    return float(sorted_vals[max(math.ceil(q * len(sorted_vals)), 1) - 1])


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=400,
    ),
    st.integers(1, 4),
)
def test_exact_quantiles_property_vs_disc(vals, n_parts):
    """percentile_disc identity for ARBITRARY value multisets
    (duplicates, negatives, single element) at every block split."""
    import ray.data as rd

    from zensearch_ray.stages.quantiles import exact_quantiles

    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    ds = rd.from_arrow(pa.table({"x": np.asarray(vals)})).repartition(n_parts)
    got = exact_quantiles(ds, "x", qs)
    ref = np.sort(np.asarray(vals))
    assert list(got["value"]) == [_disc(ref, q) for q in qs]
