"""Hybrid RRF serving path: the dense leg must run through the
PERSISTED IVF index (build-once / query-many), staying value-identical
to the brute-scan referee at full probe, and reading only probed-list
partitions at partial probe."""

from unittest import mock

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import hybrid_rrf
from zensearch_ray.pipelines import vector as vector_mod
from zensearch_ray.pipelines.vector import VectorIndex, vector_index_dir_for

N, DIM = 120, 16
WORDS = ["ray", "data", "engine", "postings", "crawler", "queue",
         "shard", "delta", "varint", "fusion"]


@pytest.fixture(scope="module")
def hy_sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("hy_sf")
    rng = np.random.default_rng(5)
    texts = [
        " ".join(rng.choice(WORDS, size=12).tolist()) + f" doc{i}"
        for i in range(N)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * N),
                "source": pa.array(["t"] * N),
                "n_chars": pa.array([len(t) for t in texts],
                                    type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    vecs = rng.normal(size=(N, DIM)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array([i % 3 for i in range(N)],
                                  type=pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_ivf_leg_matches_scan_referee(hy_sf_dir):
    # full-probe IVF is exact cosine → the fused frame is bit-identical
    # to the streaming brute-scan referee (the old oracle-green form)
    got = hybrid_rrf(hy_sf_dir, "ray data fusion", k=10, dense="ivf")
    ref = hybrid_rrf(hy_sf_dir, "ray data fusion", k=10, dense="scan")
    pd.testing.assert_frame_equal(got, ref)


def test_partial_probe_reads_only_probed_partitions(hy_sf_dir):
    """At serving nprobe < n_lists the dense leg must read a strict
    subset of the index partition files — never the raw embeddings
    table, never every partition."""
    d = vector_index_dir_for(hy_sf_dir)
    vi = VectorIndex(d)
    n_parts = int(vi.manifest["n_partitions"])
    real = vector_mod.pq.read_table
    calls = []

    def spy(files, *a, **kw):
        calls.append(files)
        return real(files, *a, **kw)

    with mock.patch.object(vector_mod.pq, "read_table", side_effect=spy):
        out = hybrid_rrf(hy_sf_dir, "ray data fusion", k=10,
                         dense="ivf", nprobe=1)
    assert len(out) == 10
    part_reads = [c for c in calls if isinstance(c, list)]
    assert part_reads, "dense leg never hit the index partitions"
    for files in part_reads:
        assert 0 < len(files) < n_parts
        assert all("part-" in f for f in files)


def test_unknown_dense_leg_raises(hy_sf_dir):
    with pytest.raises(ValueError, match="dense leg"):
        hybrid_rrf(hy_sf_dir, "ray data", dense="bm42")
