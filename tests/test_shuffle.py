"""Seeded deterministic shuffle (corpus.seeded_shuffle): the
training-loader shuffle must be reproducible, seed-sensitive,
exactly-once, and equal to a brute-force referee."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import seeded_shuffle

N = 200


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("shuffle_sf")
    t = pa.table(
        {
            "doc_id": pa.array(range(N), type=pa.int64()),
            "text": pa.array([f"doc number {i}" for i in range(N)]),
            "lang": pa.array(["en"] * N),
            "source": pa.array(["t"] * N),
            "n_chars": pa.array([10] * N, type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _frame(sf_dir, seed="s1", n_shards=8):
    return (
        seeded_shuffle(sf_dir, seed=seed, n_shards=n_shards)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )


def test_matches_referee(sf_dir):
    got = _frame(sf_dir)
    keys = {i: hashlib.md5(f"s1:{i}".encode()).hexdigest() for i in range(N)}
    ref = pd.DataFrame(
        {
            "doc_id": list(range(N)),
            "shuffle_key": [keys[i] for i in range(N)],
            "shard": [int(keys[i][-1], 16) % 8 for i in range(N)],
        }
    )
    ref["pos"] = (
        ref.sort_values(["shuffle_key", "doc_id"])
        .groupby("shard")
        .cumcount()
        .add(1)
    )
    ref = ref.sort_values(["shard", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[ref.columns], ref)


def test_deterministic_and_seed_sensitive(sf_dir):
    a = _frame(sf_dir, seed="s1")
    b = _frame(sf_dir, seed="s1")
    pd.testing.assert_frame_equal(a, b)
    c = _frame(sf_dir, seed="s2")
    # a different seed re-deals the layout (keys all differ)
    assert not a["shuffle_key"].equals(c["shuffle_key"])
    assert set(a["doc_id"]) == set(c["doc_id"])  # same coverage


def test_exactly_once_and_contiguous_pos(sf_dir):
    got = _frame(sf_dir)
    assert sorted(got["doc_id"]) == list(range(N))
    for _, g in got.groupby("shard"):
        assert list(g["pos"]) == list(range(1, len(g) + 1))
        # in-shard order is (key, doc_id)
        assert list(g["shuffle_key"]) == sorted(g["shuffle_key"])
    # every doc_id's shard is a pure function of its key nibble
    assert (
        got["shard"]
        == got["shuffle_key"].str[-1].apply(lambda c: int(c, 16) % 8)
    ).all()


def test_rejects_biased_shard_count(sf_dir):
    with pytest.raises(ValueError, match="divide 16"):
        seeded_shuffle(sf_dir, n_shards=5)
    with pytest.raises(ValueError, match="divide 16"):
        seeded_shuffle(sf_dir, n_shards=32)
    assert len(_frame(sf_dir, n_shards=16)) == N  # 16 itself is fine


def test_shards_are_reasonably_balanced(sf_dir):
    got = _frame(sf_dir)
    sizes = got.groupby("shard").size()
    assert len(sizes) == 8
    assert sizes.max() < 3 * sizes.min()
