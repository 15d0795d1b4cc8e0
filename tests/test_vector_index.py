"""Persisted IVF vector index (pipelines/vector.py): result identity
with the ad-hoc distributed IVF path, exactness at full probe, partial
I/O at low probe, and build idempotence/resume."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.vector import VectorIndex, build_vector_index
from zensearch_ray.stages.ann import IvfIndex, ivf_topk_dist, normalize_rows

SF = "/root/testdata/sf0.001"
SRC = f"{SF}/embeddings.parquet"


@pytest.fixture(scope="module")
def vindex(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vidx"))
    manifest = build_vector_index(SRC, d, n_lists=8, n_partitions=4)
    return d, manifest


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(SRC, columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, vecs


def test_build_writes_all_rows_and_manifest(vindex, emb):
    d, manifest = vindex
    ids, _ = emb
    assert manifest["n_vectors"] == len(ids)
    assert manifest["n_lists"] == 8
    parts = [f for f in os.listdir(d) if f.startswith("part-")]
    got = pq.read_table([os.path.join(d, f) for f in parts])
    assert sorted(got["vec_id"].to_pylist()) == sorted(ids.tolist())
    assert "list_id" in got.column_names


def test_search_matches_adhoc_ivf(ray_session, vindex, emb):
    """Same training sample + seed → the persisted index answers
    IDENTICALLY to ivf_topk_dist re-scanning the raw table."""
    import ray.data as rd

    d, _ = vindex
    ids, vecs = emb
    vi = VectorIndex(d)
    ds = rd.read_parquet(SRC, columns=["vec_id", "embedding"])
    for probe_row in (0, 7, 33):
        q = vecs[probe_row]
        got_ids, got_sims = vi.search(q, k=10, nprobe=4)
        want = ivf_topk_dist(ds, q, k=10, n_lists=8, nprobe=4)
        assert got_ids.tolist() == want["vec_id"].tolist(), probe_row
        np.testing.assert_allclose(got_sims, want["sim"].to_numpy())


def test_full_probe_is_exact(vindex, emb):
    d, _ = vindex
    ids, vecs = emb
    vi = VectorIndex(d)
    m = normalize_rows(vecs)
    for probe_row in (3, 11):
        q = vecs[probe_row]
        qn = q / np.linalg.norm(q)
        sims = np.round(m @ qn, 6)
        want = ids[np.lexsort((ids, -sims))[:10]].tolist()
        got_ids, _ = vi.search(q, k=10, nprobe=8)
        assert got_ids.tolist() == want, probe_row


def test_low_probe_reads_subset(vindex, emb):
    """nprobe=1 must touch at most the partition files that can hold
    one list — the I/O-proportionality contract."""
    d, _ = vindex
    _, vecs = emb
    vi = VectorIndex(d)
    q = vecs[0]
    qn = q / np.linalg.norm(q)
    probe = np.argsort(-(vi.centroids @ qn))[:1]
    files = vi._probe_files(probe)
    assert len(files) == 1  # one list → exactly one partition file
    got_ids, _ = vi.search(q, k=5, nprobe=1)
    assert len(got_ids) <= 5
    # every hit genuinely lives in the probed list
    t = pq.read_table(files)
    in_probed = set(
        t.filter(
            np.isin(t["list_id"].to_numpy(zero_copy_only=False), probe)
        )["vec_id"].to_pylist()
    )
    assert set(got_ids.tolist()) <= in_probed


def test_rebuild_is_idempotent(ray_session, vindex):
    d, manifest = vindex
    mtimes = {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }
    again = build_vector_index(SRC, d, n_lists=8, n_partitions=4)
    assert again == manifest
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(d, f)) == m, f


def test_vector_service_matches_local(ray_session, vindex, emb):
    from zensearch_ray.pipelines.vector import VectorService

    d, _ = vindex
    ids, vecs = emb
    vi = VectorIndex(d)
    probes = [vecs[i] for i in (0, 5, 21, 40)]
    with VectorService(d, replicas=2, k=10, nprobe=4) as svc:
        pids = set(svc.replica_pids())
        assert len(pids) == 2
        for q in probes:
            want_ids, want_sims = vi.search(q, k=10, nprobe=4)
            got_ids, got_sims = svc.search(q)
            assert got_ids == want_ids.tolist()
            assert got_sims == want_sims.tolist()
        batch = svc.search_batch(probes * 2, k=5)
        assert len(batch) == 8
        for q, (gi, _) in zip(probes * 2, batch):
            assert gi == vi.search(q, k=5, nprobe=4)[0].tolist()
        assert set(svc.replica_pids()) == pids  # still the same warm actors


def test_vector_append_generation(ray_session, tmp_path, emb):
    """Append under FROZEN centroids: full-probe search over the grown
    index is exact over the union; generation files are additive (the
    base partitions are untouched)."""
    import pyarrow as pa

    ids, vecs = emb
    half = 250
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    t = pq.read_table(SRC, columns=["vec_id", "embedding"])
    pq.write_table(t.slice(0, half), a)
    pq.write_table(t.slice(half), b)
    d = str(tmp_path / "vidx")
    m0 = build_vector_index(a, d, n_lists=8, n_partitions=4)
    base_mtimes = {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }
    m1 = build_vector_index(b, d, n_lists=8, n_partitions=4, append=True)
    assert m1["n_generations"] == 2
    assert m1["n_vectors"] == len(ids)
    for f, mt in base_mtimes.items():  # base generation untouched
        assert os.path.getmtime(os.path.join(d, f)) == mt, f
    vi = VectorIndex(d)
    m = normalize_rows(vecs)
    for probe_row in (0, 300, 77):
        q = vecs[probe_row]
        qn = q / np.linalg.norm(q)
        sims = np.round(m @ qn, 6)
        want = ids[np.lexsort((ids, -sims))[:10]].tolist()
        got_ids, _ = vi.search(q, k=10, nprobe=8)  # full probe = exact
        assert got_ids.tolist() == want, probe_row


def test_vector_append_refuses_mixed_source(ray_session, tmp_path):
    import json

    t = pq.read_table(SRC, columns=["vec_id", "embedding"])
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, 100), a)
    pq.write_table(t.slice(100, 100), b)
    d = str(tmp_path / "vidx")
    build_vector_index(a, d, n_lists=4, n_partitions=2)
    # simulate a crashed append from source b: spec written, no manifest bump
    gen_dir = os.path.join(d, "gen-1")
    os.makedirs(gen_dir)
    with open(os.path.join(gen_dir, "_source.json"), "w") as f:
        json.dump({"source": b}, f)
    with pytest.raises(ValueError, match="in-progress append"):
        build_vector_index(a, d, n_lists=4, n_partitions=2, append=True)
    # same source resumes fine
    m = build_vector_index(b, d, n_lists=4, n_partitions=2, append=True)
    assert m["n_generations"] == 2


@pytest.fixture(scope="module")
def sq8_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vsq8"))
    manifest = build_vector_index(SRC, d, n_lists=8, n_partitions=4,
                                  quant="sq8")
    return d, manifest


def test_sq8_manifest_codes_and_size(sq8_index, vindex, emb):
    d, manifest = sq8_index
    ids, _ = emb
    assert manifest["quant"] == "sq8"
    assert len(manifest["qmins"]) == manifest["dim"]
    parts = [f for f in os.listdir(d) if f.startswith("part-")]
    got = pq.read_table([os.path.join(d, f) for f in parts])
    assert sorted(got["vec_id"].to_pylist()) == sorted(ids.tolist())
    assert "code" in got.column_names and "embedding" not in got.column_names
    # at-rest reduction: uint8 codes vs float32 lists
    sq8_bytes = sum(
        os.path.getsize(os.path.join(d, f)) for f in parts)
    dflt, _ = vindex
    flt_bytes = sum(
        os.path.getsize(os.path.join(dflt, f))
        for f in os.listdir(dflt) if f.startswith("part-"))
    assert sq8_bytes < flt_bytes / 2, (sq8_bytes, flt_bytes)


def test_sq8_recall_vs_exact(sq8_index, emb):
    """Asymmetric SQ8 search at full probe: self-probe is always the
    top hit and recall@10 vs the exact float ranking stays high (the
    quantization error bound is ~1e-2 on unit vectors at dim 64)."""
    d, _ = sq8_index
    ids, vecs = emb
    vi = VectorIndex(d)
    m = normalize_rows(vecs)
    hits = total = 0
    for probe_row in (0, 7, 33, 120, 311):
        q = vecs[probe_row]
        qn = q / np.linalg.norm(q)
        want = set(ids[np.lexsort((ids, -np.round(m @ qn, 6)))[:10]].tolist())
        got_ids, got_sims = vi.search(q, k=10, nprobe=8)
        assert got_ids[0] == ids[probe_row]  # self-sim ≈ 1, gap >> error
        assert got_sims[0] > 0.99
        hits += len(set(got_ids.tolist()) & want)
        total += 10
    assert hits / total >= 0.8, hits / total


def test_sq8_planted_margin_membership_exact(ray_session, tmp_path):
    """Where the gap exceeds the quantization error bound, SQ8 answers
    EQUAL the exact float answer: with 4 tight, well-separated
    clusters the top-50 of any probe is exactly its own cluster
    (inter-cluster margin >> error; intra-cluster ORDER may differ —
    those gaps are below the error bound by construction)."""
    import pyarrow as pa

    rng = np.random.default_rng(5)
    hubs = normalize_rows(rng.normal(size=(4, 32)))
    vecs = np.concatenate([
        normalize_rows(h + 0.02 * rng.normal(size=(50, 32))) for h in hubs])
    ids = np.arange(200, dtype=np.int64)
    src = str(tmp_path / "planted.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(vecs.astype(np.float32))),
    }), src)
    d = str(tmp_path / "vidx")
    build_vector_index(src, d, n_lists=4, n_partitions=2, quant="sq8")
    vi = VectorIndex(d)
    for probe_row in (0, 60, 199):
        got_ids, _ = vi.search(vecs[probe_row], k=50, nprobe=4)
        cluster = probe_row // 50
        assert got_ids[0] == probe_row  # self-probe top-1 survives
        assert set(got_ids.tolist()) == set(
            range(cluster * 50, cluster * 50 + 50)), probe_row


def test_sq8_append_frozen_grid(ray_session, tmp_path, emb):
    """Appends encode under the FROZEN quantization grid: manifest
    keeps quant params, search spans both generations, self-probe of
    an appended vector still lands on itself."""
    ids, vecs = emb
    t = pq.read_table(SRC, columns=["vec_id", "embedding"])
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, 250), a)
    pq.write_table(t.slice(250), b)
    d = str(tmp_path / "vidx")
    m0 = build_vector_index(a, d, n_lists=8, n_partitions=4, quant="sq8")
    m1 = build_vector_index(b, d, n_lists=8, n_partitions=4, append=True)
    assert m1["quant"] == "sq8" and m1["qmins"] == m0["qmins"]
    assert m1["n_vectors"] == len(ids)
    vi = VectorIndex(d)
    for probe_row in (10, 300, 499):  # spans both generations
        got_ids, got_sims = vi.search(vecs[probe_row], k=5, nprobe=8)
        assert got_ids[0] == ids[probe_row]
        assert got_sims[0] > 0.99


def test_sq8_rejects_unknown_quant(ray_session, tmp_path):
    with pytest.raises(ValueError, match="unknown quantization"):
        build_vector_index(SRC, str(tmp_path / "x"), quant="pq4")


def test_vcompact_merges_generations(ray_session, tmp_path, emb):
    """Compaction folds generations into one artifact with IDENTICAL
    answers (assignments/codes reused verbatim) and no gen dirs."""
    from zensearch_ray.pipelines.vector import compact_vector_index

    ids, vecs = emb
    t = pq.read_table(SRC, columns=["vec_id", "embedding"])
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, 250), a)
    pq.write_table(t.slice(250), b)
    d = str(tmp_path / "vidx")
    build_vector_index(a, d, n_lists=8, n_partitions=4, quant="sq8")
    build_vector_index(b, d, n_lists=8, n_partitions=4, append=True)
    out = str(tmp_path / "vidx_c")
    m = compact_vector_index(d, out)
    assert "n_generations" not in m
    assert m["n_vectors"] == len(ids) and m["quant"] == "sq8"
    assert not any(f.startswith("gen-") for f in os.listdir(out))
    vi_old, vi_new = VectorIndex(d), VectorIndex(out)
    for probe_row in (0, 123, 400):
        got_o = vi_old.search(vecs[probe_row], k=10, nprobe=8)
        got_n = vi_new.search(vecs[probe_row], k=10, nprobe=8)
        assert got_o[0].tolist() == got_n[0].tolist()
        np.testing.assert_array_equal(got_o[1], got_n[1])
    with pytest.raises(ValueError, match="NEW directory"):
        compact_vector_index(d, d)
