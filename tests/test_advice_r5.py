"""Round-5 ADVICE regression tests.

1. ``topk_order`` with k=0 on a large candidate set must return empty,
   not raise (argpartition k-1 = -1 → zero-size reduction ValueError).
2. The export decode's per-worker tombstone cache must observe an
   in-place rewrite of ``deletes.parquet`` (delete_docs mutates a fixed
   path; a long-lived worker must not serve a stale tombstone array).
3. ``vector_index_dir_for`` must key its build-once cache on the build
   params and the embeddings fingerprint, so a cache hit can never
   silently serve an index built under different ``n_lists``/
   ``n_partitions`` or over a regenerated embeddings.parquet.
"""

from __future__ import annotations

import os

import numpy as np

from zensearch_ray.functions.bm25 import topk_order
from zensearch_ray.pipelines.export import _DELETES_CACHE, _deletes_for
from zensearch_ray.state.manifest import IndexLayout


def test_topk_order_k0_large_n():
    rng = np.random.default_rng(7)
    n = 5000  # > the 1024 small-path cutoff
    ids = np.arange(n, dtype=np.int64)
    scores = rng.random(n)
    out_ids, out_scores = topk_order(ids, scores, 0)
    assert len(out_ids) == 0 and len(out_scores) == 0
    out_ids, out_scores = topk_order(ids, scores, -3)
    assert len(out_ids) == 0 and len(out_scores) == 0


def test_topk_order_k0_small_n():
    ids = np.array([3, 1, 2], dtype=np.int64)
    scores = np.array([0.5, 0.9, 0.1])
    out_ids, _ = topk_order(ids, scores, 0)
    assert len(out_ids) == 0


def test_export_deletes_cache_sees_rewrite(tmp_path):
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    layout = IndexLayout(idx)

    _DELETES_CACHE.clear()
    first = _deletes_for(idx)
    assert first is None or len(first) == 0  # no deletes yet

    layout.write_deletes(np.array([5, 9], dtype=np.int64))
    second = _deletes_for(idx)
    assert second is not None and list(second) == [5, 9]

    # rewrite in place (the delete_docs path) — cache must refresh
    layout.write_deletes(np.array([1, 5, 9, 42], dtype=np.int64))
    third = _deletes_for(idx)
    assert list(third) == [1, 5, 9, 42]
    # stale generations are evicted, not accumulated
    assert len(_DELETES_CACHE) == 1


def test_vector_index_cache_key_covers_params_and_input(
    tmp_path, monkeypatch
):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines import vector as vmod

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    emb = os.path.join(sf, "embeddings.parquet")
    pq.write_table(pa.table({"vec_id": [1], "embedding": [[0.1, 0.2]]}), emb)

    built: list[str] = []
    monkeypatch.setattr(
        vmod, "build_vector_index",
        lambda source, out_dir, **kw: built.append(out_dir),
    )

    d16 = vmod.vector_index_dir_for(sf, n_lists=16)
    d8 = vmod.vector_index_dir_for(sf, n_lists=8)
    dp4 = vmod.vector_index_dir_for(sf, n_lists=16, n_partitions=4)
    assert len({d16, d8, dp4}) == 3  # params are part of the key

    # regenerated embeddings under the same path → new cache dir
    st = os.stat(emb)
    os.utime(emb, ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    d16b = vmod.vector_index_dir_for(sf, n_lists=16)
    assert d16b != d16

    # same inputs → stable dir (build-once cache still works)
    assert vmod.vector_index_dir_for(sf, n_lists=16) == d16b
