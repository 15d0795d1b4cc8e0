"""Posting codec round-trip + block-max soundness (FIXTURES.md §4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zensearch_ray.functions.bm25 import BM25Params, tf_norm
from zensearch_ray.functions.codec import (
    block_metadata,
    decode_posting,
    delta_decode_docids,
    delta_encode_docids,
    encode_posting,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    buf = varint_encode(vals)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    np.testing.assert_array_equal(varint_decode(buf), vals)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=500))
def test_varint_roundtrip_hypothesis(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=2000))
def test_delta_docids_roundtrip(gaps):
    ids = np.cumsum(np.array(gaps, dtype=np.int64))
    np.testing.assert_array_equal(delta_decode_docids(delta_encode_docids(ids)), ids)


def test_delta_rejects_nonincreasing():
    with pytest.raises(ValueError):
        delta_encode_docids(np.array([3, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        delta_encode_docids(np.array([5, 2], dtype=np.int64))


def test_posting_roundtrip_and_blockmax():
    rng = np.random.default_rng(42)
    params = BM25Params()
    avgdl = 120.0
    n = 10_000
    doc_ids = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.int64)
    tfs = rng.integers(1, 255, size=n).astype(np.int64)
    dls = rng.integers(20, 2000, size=n).astype(np.int64)

    row = encode_posting(doc_ids, tfs, dls, avgdl, params)
    assert row["df"] == n
    d, t, l = decode_posting(row)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(l, dls)
    # compression actually compresses vs 8-byte ints
    assert len(row["docs"]) < 8 * n

    # block-max soundness: bound >= true tf-norm for every posting in block
    block_last, block_max = block_metadata(doc_ids, tfs, dls, avgdl, params, block_size=128)
    norms = tf_norm(tfs, dls, avgdl, params)
    n_blocks = len(block_last)
    assert n_blocks == (n + 127) // 128
    for bi in range(n_blocks):
        lo, hi = bi * 128, min((bi + 1) * 128, n)
        assert float(block_max[bi]) >= norms[lo:hi].max()
        assert block_last[bi] == doc_ids[hi - 1]


def test_positions_partition_roundtrip():
    """encode_partition(flat_positions=...) → decode_positions: exact
    per-(term, doc) position recovery, incl. single-token docs and
    restart boundaries at every posting."""
    from zensearch_ray.functions.codec import decode_positions, encode_partition

    rng = np.random.default_rng(7)
    params = BM25Params()
    rows = []  # (term_idx, doc_id, positions)
    for ti in range(5):
        docs = np.sort(rng.choice(5000, size=int(rng.integers(1, 400)), replace=False))
        for d in docs:
            tf = int(rng.integers(1, 8))
            rows.append((ti, int(d), np.sort(rng.choice(2000, size=tf, replace=False))))
    doc_ids = np.array([r[1] for r in rows], dtype=np.int64)
    tfs = np.array([len(r[2]) for r in rows], dtype=np.int64)
    dls = np.full(len(rows), 50, dtype=np.int64)
    term_idx = np.array([r[0] for r in rows])
    starts = np.flatnonzero(np.concatenate(([1], np.diff(term_idx))))
    ends = np.concatenate((starts[1:], [len(rows)]))
    flat_pos = np.concatenate([r[2] for r in rows])

    cols = encode_partition(
        doc_ids, tfs, dls, starts, ends, 50.0, params, flat_positions=flat_pos
    )
    for ti, (s, e) in enumerate(zip(starts, ends)):
        flat = decode_positions(cols["pos"][ti].as_py(), tfs[s:e])
        np.testing.assert_array_equal(
            flat, np.concatenate([rows[j][2] for j in range(s, e)])
        )


def test_positions_validation():
    from zensearch_ray.functions.codec import encode_partition

    params = BM25Params()
    one = np.array([0], dtype=np.int64)
    with pytest.raises(ValueError, match="positions length"):
        encode_partition(
            np.array([1], dtype=np.int64), np.array([2], dtype=np.int64),
            np.array([5], dtype=np.int64), one, np.array([1]), 5.0, params,
            flat_positions=np.array([3], dtype=np.int64),
        )
    with pytest.raises(ValueError, match="strictly increasing within a doc"):
        encode_partition(
            np.array([1], dtype=np.int64), np.array([2], dtype=np.int64),
            np.array([5], dtype=np.int64), one, np.array([1]), 5.0, params,
            flat_positions=np.array([4, 4], dtype=np.int64),
        )
