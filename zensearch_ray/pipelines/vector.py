"""Persisted IVF vector index: the build-once / query-many lifecycle
for similarity search, mirroring the text index's shape (immutable
partitioned artifact + manifest + resumable commit).

``stages/ann.ivf_topk_dist`` re-trains centroids and re-scans the full
embedding table on EVERY query — right for one-off batch jobs, wrong
for a serving corpus. This module splits the lifecycle:

- **build** (once): train deterministic spherical-k-means centroids on
  a sample, assign every vector to its nearest list in ONE streaming
  ``map_batches`` pass, and write the rows hash-partitioned BY LIST
  through the same resumable partition sink the prep pipeline uses
  (markers commit per partition; rerun skips completed ones). The
  centroids (n_lists × dim — metadata-scale) and a manifest land last.
- **query** (many): load centroids once, pick the ``nprobe`` nearest
  lists, and read ONLY the partitions holding those lists (parquet
  row-group predicate on ``list_id`` inside them) — I/O proportional
  to nprobe/n_lists of the corpus instead of a full scan, the entire
  point of IVF at rest.

Same deterministic kernels as the ad-hoc path (``_kmeans_centroids``,
cosine ordering, round6), so a persisted query with the same training
sample is RESULT-IDENTICAL to ``ivf_topk_dist`` — asserted in
``tests/test_vector_index.py``.

**SQ8 scalar quantization** (``quant="sq8"``, the Faiss
IVF-ScalarQuantizer shape): per-dimension min/max bounds trained on
the same sample as the centroids; every NORMALIZED vector is stored
as one uint8 per dimension (``code`` fixed-size-list column) instead
of a float64 list — an 8× at-rest and in-flight reduction, which at
10⁹×1024-dim is the difference between 8 TB and 1 TB of vector
payload crossing the cluster. Queries run asymmetric distance: the
float query against reconstructed (mid-rise dequantized) vectors —
approximate by construction, with per-component error ≤ scale/510;
the planted-margin and recall tests pin how that error may surface.
The quantization bounds freeze with the centroids, so appends encode
under the same grid and generations stay comparable.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from zensearch_ray.functions.rounding import round6
from zensearch_ray.stages.ann import _kmeans_centroids, _matrix, normalize_rows
from zensearch_ray.state.sink import _part_of, write_partitioned

_MANIFEST = "vector_manifest.json"
_CENTROIDS = "centroids.parquet"


def vector_index_dir_for(sf_dir: str, n_lists: int = 16,
                         n_partitions: int = 8,
                         quant: str | None = None) -> str:
    """Build-once cache of the persisted IVF index for a test-table
    directory's ``embeddings.parquet`` — the vector-side twin of
    ``corpus.index_dir_for``. Every serving-path entry (persisted ANN,
    hybrid fusion) shares ONE artifact per (sf_dir, quant) instead of
    re-scanning the raw table per query; ``build_vector_index`` no-ops
    when the manifest already exists."""
    import tempfile

    from zensearch_ray.functions.ids import hash64

    # Cache key covers the build params AND an input fingerprint:
    # build_vector_index no-ops when the manifest exists, so a key that
    # ignored n_lists/n_partitions would silently serve an index built
    # under different params, and a regenerated embeddings.parquet
    # under the same path would serve a stale index across runs.
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(emb_path)
        fp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        fp = "missing"
    key = hash64(
        f"{os.path.realpath(sf_dir)}|{n_lists}|{n_partitions}|{fp}"
    ) % 10**12
    tag = "vsq8" if quant == "sq8" else "vidx"
    d = os.path.join(tempfile.gettempdir(), f"zensearch_{tag}_v2_{key}")
    build_vector_index(
        f"{sf_dir}/embeddings.parquet", d,
        n_lists=n_lists, n_partitions=n_partitions, quant=quant,
    )
    return d


def _sq8_train(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (mins, scales) over a NORMALIZED sample. A zero
    span (constant dimension) gets scale 1 so encode/decode stay
    well-defined."""
    mins = m.min(axis=0)
    scales = m.max(axis=0) - mins
    scales[scales == 0.0] = 1.0
    return mins, scales


def _sq8_encode(m: np.ndarray, mins: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Normalized float rows → uint8 codes (values outside the trained
    bounds clip — by construction rare and small for unit vectors)."""
    return np.clip(
        np.round((m - mins[None, :]) / scales[None, :] * 255.0), 0, 255
    ).astype(np.uint8)


def _sq8_decode(codes: np.ndarray, mins: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return mins[None, :] + codes.astype(np.float64) * (scales[None, :] / 255.0)


def build_vector_index(
    source,
    out_dir: str,
    n_lists: int = 16,
    n_partitions: int = 8,
    train_sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    append: bool = False,
    quant: str | None = None,
) -> dict:
    """Build (or resume) the persisted IVF index. ``source``: parquet
    path(s) or a Dataset of (id, embedding). Returns the manifest.
    ``append=True`` adds NEW vectors as a new generation under the
    FROZEN centroids (standard IVF growth — retraining would
    invalidate every existing assignment; compact by rebuilding when
    drift warrants it), exactly the text index's generation scheme.
    ``quant="sq8"`` stores int8 scalar-quantized codes instead of the
    float embeddings (8× smaller partitions; approximate search)."""
    import ray.data as rd

    if quant not in (None, "sq8"):
        raise ValueError(f"unknown quantization {quant!r}")
    if append:
        return _append_vector_index(source, out_dir, id_col, emb_col)
    mpath = os.path.join(out_dir, _MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    ds = (
        rd.read_parquet(source, columns=[id_col, emb_col])
        if isinstance(source, (str, list))
        else ds_select(source, id_col, emb_col)
    )
    sample = ds.limit(train_sample).to_pandas()
    m_s = normalize_rows(np.array(sample[emb_col].tolist(), dtype=np.float64))
    centroids = _kmeans_centroids(m_s, n_lists, seed, iters=10)
    n_lists = len(centroids)  # clamped when the sample is tiny
    qmins, qscales = _sq8_train(m_s) if quant == "sq8" else (None, None)

    import ray

    cref = ray.put(centroids)
    qref = ray.put((qmins, qscales))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        m = normalize_rows(_matrix(batch[emb_col]))
        lists = np.argmax(m @ cents.T, axis=1).astype(np.int64)
        out = batch.append_column("list_id", pa.array(lists))
        if quant == "sq8":
            mins, scales = ray.get(qref)
            codes = _sq8_encode(m, mins, scales)
            code_col = pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), codes.shape[1])
            out = out.drop_columns([emb_col]).append_column("code", code_col)
        return out

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    stats = write_partitioned(
        tagged, out_dir, key_col="list_id", n_partitions=n_partitions
    )

    # metadata lands LAST (same data-then-manifest commit order as the
    # text index): a crashed build resumes the partition sink, a
    # complete manifest marks the artifact servable
    cent_tmp = os.path.join(out_dir, _CENTROIDS + ".tmp")
    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(np.arange(n_lists, dtype=np.int64)),
                "centroid": pa.array(centroids.tolist(), type=pa.list_(pa.float64())),
            }
        ),
        cent_tmp,
    )
    os.replace(cent_tmp, os.path.join(out_dir, _CENTROIDS))
    manifest = {
        "version": 1,
        "metric": "cosine",
        "n_lists": int(n_lists),
        "n_partitions": int(n_partitions),
        "train_sample": int(train_sample),
        "seed": int(seed),
        "dim": int(centroids.shape[1]),
        "n_vectors": int(stats["rows"]) if not stats["skipped"] else None,
        "id_col": id_col,
        "emb_col": emb_col,
        "quant": quant,
        "qmins": qmins.tolist() if qmins is not None else None,
        "qscales": qscales.tolist() if qscales is not None else None,
    }
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def ds_select(ds, id_col: str, emb_col: str):
    return ds.select_columns([id_col, emb_col])


def _append_vector_index(source, out_dir: str, id_col: str, emb_col: str) -> dict:
    """Append ``source`` as generation g+1: assign under the frozen
    centroids, one streaming pass, resumable partition sink inside the
    generation dir (a crashed append reruns; a DIFFERENT source into an
    unfinished generation is refused). Manifest update lands last."""
    import ray
    import ray.data as rd

    mpath = os.path.join(out_dir, _MANIFEST)
    with open(mpath) as f:
        manifest = json.load(f)
    if manifest.get("id_col") != id_col or manifest.get("emb_col") != emb_col:
        raise ValueError("append column names differ from the index manifest")
    t = pq.read_table(os.path.join(out_dir, _CENTROIDS))
    centroids = np.array(t["centroid"].to_pylist(), dtype=np.float64)

    gen = int(manifest.get("n_generations", 1))
    gen_dir = os.path.join(out_dir, f"gen-{gen}")
    os.makedirs(gen_dir, exist_ok=True)
    spec_path = os.path.join(gen_dir, "_source.json")
    spec = str(source)
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            prior = json.load(f)["source"]
        if prior != spec:
            raise ValueError(
                f"generation {gen} has an in-progress append from {prior!r}; "
                "finish it with the same source or remove the gen dir"
            )
    else:
        with open(spec_path + ".tmp", "w") as f:
            json.dump({"source": spec}, f)
        os.replace(spec_path + ".tmp", spec_path)

    ds = (
        rd.read_parquet(source, columns=[id_col, emb_col])
        if isinstance(source, (str, list))
        else ds_select(source, id_col, emb_col)
    )
    cref = ray.put(centroids)
    quant = manifest.get("quant")
    qref = ray.put(
        (np.asarray(manifest["qmins"]), np.asarray(manifest["qscales"]))
        if quant == "sq8" else (None, None)
    )

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        m = normalize_rows(_matrix(batch[emb_col]))
        lists = np.argmax(m @ cents.T, axis=1).astype(np.int64)
        out = batch.append_column("list_id", pa.array(lists))
        if quant == "sq8":  # the grid froze with the centroids
            mins, scales = ray.get(qref)
            codes = _sq8_encode(m, mins, scales)
            code_col = pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1)), codes.shape[1])
            out = out.drop_columns([emb_col]).append_column("code", code_col)
        return out

    stats = write_partitioned(
        ds.map_batches(assign, batch_format="pyarrow"),
        gen_dir,
        key_col="list_id",
        n_partitions=int(manifest["n_partitions"]),
    )
    manifest["n_generations"] = gen + 1
    if manifest.get("n_vectors") is not None and not stats["skipped"]:
        manifest["n_vectors"] = int(manifest["n_vectors"]) + int(stats["rows"])
    else:
        manifest["n_vectors"] = None  # a resumed append loses the exact count
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    return manifest


def compact_vector_index(index_dir: str, out_dir: str) -> dict:
    """Rewrite a multi-generation vector index as a single-generation
    artifact at ``out_dir`` — the vector twin of the text index's
    ``compact_index``. Assignments and (for SQ8) codes are REUSED
    verbatim (centroids/grid are frozen across generations by
    construction, so compaction is a pure partition-wise merge: one
    streaming read per partition id across generations, one write —
    no re-assignment, no re-quantization, no full-table shuffle).
    Refuses a same-dir compact (the artifact is immutable)."""
    import ray.data as rd

    if os.path.realpath(index_dir) == os.path.realpath(out_dir):
        raise ValueError("compact into a NEW directory, then swap")
    with open(os.path.join(index_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    n_parts = int(manifest["n_partitions"])
    gens = [index_dir] + [
        os.path.join(index_dir, f"gen-{g}")
        for g in range(1, int(manifest.get("n_generations", 1)))
    ]
    files = [
        os.path.join(d, f"part-{p:05d}.parquet")
        for p in range(n_parts)
        for d in gens
    ]
    files = [p for p in files if os.path.exists(p)]
    # list_id is preserved row-wise, so the resumable partition sink
    # re-derives the same partition for every row (pure merge)
    stats = write_partitioned(
        rd.read_parquet(files), out_dir, key_col="list_id",
        n_partitions=n_parts,
    )
    import shutil

    shutil.copyfile(os.path.join(index_dir, _CENTROIDS),
                    os.path.join(out_dir, _CENTROIDS))
    new_manifest = dict(manifest)
    new_manifest.pop("n_generations", None)
    if not stats["skipped"]:
        new_manifest["n_vectors"] = int(stats["rows"])
    mpath = os.path.join(out_dir, _MANIFEST)
    with open(mpath + ".tmp", "w") as f:
        json.dump(new_manifest, f)
    os.replace(mpath + ".tmp", mpath)
    return new_manifest


class VectorIndex:
    """Query side: centroids load once (metadata-scale); each search
    reads only the partitions that can hold the probed lists."""

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        t = pq.read_table(os.path.join(index_dir, _CENTROIDS))
        self.centroids = np.array(t["centroid"].to_pylist(), dtype=np.float64)
        self.root = index_dir
        self.id_col = self.manifest["id_col"]
        self.emb_col = self.manifest["emb_col"]

    def _probe_files(self, probe_lists: np.ndarray) -> list[str]:
        parts = np.unique(
            _part_of(pa.array(probe_lists, type=pa.int64()),
                     self.manifest["n_partitions"])
        )
        dirs = [self.root] + [
            os.path.join(self.root, f"gen-{g}")
            for g in range(1, int(self.manifest.get("n_generations", 1)))
        ]
        out = [
            os.path.join(d, f"part-{p:05d}.parquet")
            for d in dirs
            for p in parts
        ]
        return [p for p in out if os.path.exists(p)]

    def search(self, q: np.ndarray, k: int = 10, nprobe: int = 4):
        """(ids, sims) of the top-k by cosine among the probed lists —
        ordering and rounding identical to ``ivf_topk_dist``. On an
        SQ8 index this is asymmetric distance (float query against
        dequantized codes): approximate, error ≤ Σ|q_d|·scale_d/510."""
        q = np.asarray(q, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        probe = np.argsort(-(self.centroids @ q))[:nprobe]
        files = self._probe_files(probe)
        if not files:
            return np.empty(0, dtype=np.int64), np.empty(0)
        quant = self.manifest.get("quant")
        vec_col = "code" if quant == "sq8" else self.emb_col
        t = pq.read_table(
            files,
            columns=[self.id_col, vec_col],
            filters=[("list_id", "in", probe.tolist())],
        )
        if t.num_rows == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if quant == "sq8":
            col = t[vec_col].combine_chunks()
            # flatten() (not .values) so any slice offset is honored
            codes = col.flatten().to_numpy(zero_copy_only=False).reshape(
                len(ids), -1)
            m = _sq8_decode(codes, np.asarray(self.manifest["qmins"]),
                            np.asarray(self.manifest["qscales"]))
            sims = m @ q  # stored rows were normalized pre-quantization
        else:
            sims = normalize_rows(_matrix(t[self.emb_col])) @ q
        sims = round6(sims)
        order = np.lexsort((ids, -sims))[:k]
        return ids[order], sims[order]


class _VectorReplica:
    """One warm ANN replica (actor body): centroids + manifest load
    once; probed-partition reads hit the OS page cache across calls."""

    def __init__(self, index_dir: str):
        self.vi = VectorIndex(index_dir)

    def search(self, q, k: int, nprobe: int):
        ids, sims = self.vi.search(np.asarray(q, dtype=np.float64), k, nprobe)
        return ids.tolist(), sims.tolist()

    def search_many(self, qs, k: int, nprobe: int):
        return [self.search(q, k, nprobe) for q in qs]

    def pid(self) -> int:
        import os as _os

        return _os.getpid()


class VectorService:
    """Warm actor-pool ANN serving over a persisted vector index — the
    similarity-search face of ``QueryService`` (same round-robin
    replica shape; answers identical to a local ``VectorIndex``)."""

    def __init__(self, index_dir: str, replicas: int = 2, k: int = 10,
                 nprobe: int = 4):
        import ray

        self._k, self._nprobe = k, nprobe
        actor_cls = ray.remote(num_cpus=1)(_VectorReplica)
        self._replicas = [actor_cls.remote(index_dir) for _ in range(replicas)]
        self._rr = 0

    def _next(self):
        a = self._replicas[self._rr % len(self._replicas)]
        self._rr += 1
        return a

    def search(self, q, k: int | None = None, nprobe: int | None = None):
        import ray

        return ray.get(
            self._next().search.remote(q, k or self._k, nprobe or self._nprobe)
        )

    def search_batch(self, qs, k: int | None = None, nprobe: int | None = None):
        import ray

        n = len(self._replicas)
        shards = [[] for _ in range(n)]
        for i in range(len(qs)):
            shards[i % n].append(i)
        futs = [
            self._replicas[r].search_many.remote(
                [qs[i] for i in shards[r]], k or self._k, nprobe or self._nprobe
            )
            for r in range(n)
            if shards[r]
        ]
        out = [None] * len(qs)
        for r, res in zip([r for r in range(n) if shards[r]], ray.get(futs)):
            for i, item in zip(shards[r], res):
                out[i] = item
        return out

    def replica_pids(self) -> list[int]:
        import ray

        return ray.get([a.pid.remote() for a in self._replicas])

    def shutdown(self) -> None:
        import ray

        for a in self._replicas:
            ray.kill(a)
        self._replicas = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False
