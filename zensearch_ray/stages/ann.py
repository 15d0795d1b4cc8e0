"""Similarity search over embedding columns (list<float>).

Scale pattern: the probe/query side is SMALL and broadcast once via
``ray.put``; the embedding table STREAMS through ``map_batches`` as
Arrow batches converted zero-copy-ish to numpy matrices; each batch
does one matmul against the broadcast matrix. No shuffle.

  * ``cosine_topk``      — brute-force exact top-k (the baseline / oracle path)
  * ``near_dup_pairs``   — all pairs with cosine ≥ threshold (exact)
  * ``IvfIndex``         — IVF-flat approximate variant (the 100 TB scale
    path: k-means-style centroids from a sample, probe only ``nprobe``
    inverted lists; recall measured against the brute-force baseline in
    tests, never used as its own oracle)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.functions.rounding import round6


def _matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def cosine_topk(ds, probe_vec: np.ndarray, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact cosine top-k of one probe vector against the dataset.

    Per-batch partial top-k (heap-free: argpartition) → tiny driver
    merge. Only (k × n_batches) candidate rows ever leave the workers.
    """
    import ray

    q = np.asarray(probe_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = normalize_rows(_matrix(batch[emb_col]))
        sims = m @ qv
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = min(k, len(sims))
        part = np.argpartition(-sims, take - 1)[:take] if take else np.empty(0, int)
        return pa.table(
            {
                id_col: pa.array(ids[part], type=pa.int64()),
                "sim": pa.array(sims[part], type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    # round BEFORE ordering so ties at 6 decimals break by id, matching
    # an oracle that orders by the rounded value
    cand["sim"] = round6(cand["sim"].to_numpy())
    cand = cand.sort_values(["sim", id_col], ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


def cosine_topk_multi(ds, probe_mat: np.ndarray, probe_ids: np.ndarray, k: int = 10,
                      id_col: str = "vec_id", emb_col: str = "embedding"):
    """Batched similarity search: exact cosine top-k for EVERY row of a
    broadcast query matrix in one streaming pass — the shape real
    retrieval workloads use (score a query batch, not one probe).

    One matmul per (data batch × all queries); per-query per-batch
    argpartition partials, so only (n_queries × k × n_batches) rows
    reach the driver merge. The query matrix is ``ray.put`` once.
    """
    import ray

    qm = normalize_rows(np.asarray(probe_mat, dtype=np.float64))
    qids = np.asarray(probe_ids, dtype=np.int64)
    ref = ray.put((qm, qids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qmat, ids_q = ray.get(ref)
        m = normalize_rows(_matrix(batch[emb_col]))
        sims = m @ qmat.T  # (batch, n_queries)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = min(k, sims.shape[0])
        if not take:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        part = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, n_q)
        n_q = sims.shape[1]
        qcol = np.repeat(ids_q, take)
        rows = part.T.ravel()  # per query, its top-take row indices
        return pa.table(
            {
                "query_id": pa.array(qcol, type=pa.int64()),
                id_col: pa.array(ids[rows], type=pa.int64()),
                "sim": pa.array(sims[rows, np.repeat(np.arange(n_q), take)],
                                 type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    cand["sim"] = round6(cand["sim"].to_numpy())
    cand = (
        cand.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    cand.insert(1, "rank", (cand.groupby("query_id").cumcount() + 1).astype(np.int64))
    return cand


def hard_negatives(ds, probe_mat: np.ndarray, probe_ids: np.ndarray,
                   probe_labels: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   label_col: str = "label"):
    """Hard-negative mining for contrastive training data: for every
    probe, the ``k`` corpus vectors MOST similar to it whose label
    differs from the probe's — the near-misses a bi-encoder trains
    against (dense-retrieval practice per Karpukhin et al. 2020, DPR).
    The probe row itself is excluded by id regardless of label.

    Same streaming shape as :func:`cosine_topk_multi` — the probe
    matrix + labels broadcast once via ``ray.put``, one matmul per
    (data batch x all probes), the same-label/self mask applied on the
    (batch, n_probes) score grid BEFORE the per-probe partial
    argpartition — so only (n_probes x k x n_batches) candidate rows
    ever reach the driver merge, and the corpus is touched exactly
    once no matter how many probes ride the broadcast.
    """
    import ray

    qm = normalize_rows(np.asarray(probe_mat, dtype=np.float64))
    qids = np.asarray(probe_ids, dtype=np.int64)
    qlabels = np.asarray(probe_labels, dtype=np.int64)
    ref = ray.put((qm, qids, qlabels))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qmat, ids_q, labels_q = ray.get(ref)
        m = normalize_rows(_matrix(batch[emb_col]))
        sims = m @ qmat.T  # (batch, n_probes)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labels = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # mask: same label as the probe, or the probe row itself
        sims[(labels[:, None] == labels_q[None, :])
             | (ids[:, None] == ids_q[None, :])] = -np.inf
        take = min(k, sims.shape[0])
        if not take:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        part = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, n_q)
        n_q = sims.shape[1]
        qcol = np.repeat(ids_q, take)
        rows = part.T.ravel()
        vals = sims[rows, np.repeat(np.arange(n_q), take)]
        keep = np.isfinite(vals)  # a batch can be all-masked for a probe
        return pa.table(
            {
                "query_id": pa.array(qcol[keep], type=pa.int64()),
                id_col: pa.array(ids[rows][keep], type=pa.int64()),
                "sim": pa.array(vals[keep], type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    cand["sim"] = round6(cand["sim"].to_numpy())
    cand = (
        cand.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    cand.insert(1, "rank", (cand.groupby("query_id").cumcount() + 1).astype(np.int64))
    return cand


def contrastive_triplets(ds, probe_mat: np.ndarray, probe_ids: np.ndarray,
                         probe_labels: np.ndarray, k_pos: int = 5,
                         k_neg: int = 10, id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         label_col: str = "label"):
    """Triplet-mining for contrastive training: for every anchor probe,
    its ``k_pos`` most-similar SAME-label rows (the positives) and its
    ``k_neg`` most-similar DIFFERENT-label rows (the hard negatives),
    self always excluded — the (anchor, positive, negative) material a
    triplet/InfoNCE loss consumes.

    ONE streaming pass over the corpus: the (batch x n_probes) score
    grid is computed once per batch, then masked twice (same-label /
    different-label) for the two per-probe partial top-ks, so the
    embedding table is read exactly once for both roles.

    Output: (query_id, role 'pos'|'neg', rank, vec_id, sim).
    """
    import ray

    qm = normalize_rows(np.asarray(probe_mat, dtype=np.float64))
    qids = np.asarray(probe_ids, dtype=np.int64)
    qlabels = np.asarray(probe_labels, dtype=np.int64)
    ref = ray.put((qm, qids, qlabels))

    def partial(batch: pa.Table) -> pa.Table:
        qmat, ids_q, labels_q = ray.get(ref)
        m = normalize_rows(_matrix(batch[emb_col]))
        sims = m @ qmat.T  # (batch, n_probes)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labels = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        same = labels[:, None] == labels_q[None, :]
        is_self = ids[:, None] == ids_q[None, :]
        n_q = sims.shape[1]
        out_q, out_id, out_sim, out_role = [], [], [], []
        for role, mask, k in (("pos", same & ~is_self, k_pos),
                              ("neg", ~same & ~is_self, k_neg)):
            s = np.where(mask, sims, -np.inf)
            take = min(k, s.shape[0])
            if not take:
                continue
            part = np.argpartition(-s, take - 1, axis=0)[:take]
            rows = part.T.ravel()
            vals = s[rows, np.repeat(np.arange(n_q), take)]
            keep = np.isfinite(vals)
            out_q.append(np.repeat(ids_q, take)[keep])
            out_id.append(ids[rows][keep])
            out_sim.append(vals[keep])
            out_role.append(np.full(int(keep.sum()), role, dtype=object))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "role": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "role": pa.array(np.concatenate(out_role), type=pa.string()),
                id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand["sim"] = round6(cand["sim"].to_numpy())
    cand = cand.sort_values(["query_id", "role", "sim", id_col],
                            ascending=[True, True, False, True])
    parts = []
    for role, k in (("neg", k_neg), ("pos", k_pos)):
        sub = cand[cand["role"] == role]
        parts.append(sub.groupby("query_id", as_index=False).head(k))
    out = (pd.concat(parts)
           .sort_values(["query_id", "role", "sim", id_col],
                        ascending=[True, True, False, True])
           .reset_index(drop=True))
    out.insert(2, "rank",
               (out.groupby(["query_id", "role"]).cumcount() + 1)
               .astype(np.int64))
    return out[["query_id", "role", "rank", id_col, "sim"]]


def mmr_topk(ds, probe_vec: np.ndarray, k: int = 10, fetch_n: int = 50,
             lam: float = 0.7, id_col: str = "vec_id",
             emb_col: str = "embedding"):
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein 1998) — the result-diversification rerank retrieval
    stacks run after ANN: fetch the ``fetch_n`` most-relevant
    candidates, then greedily select ``k`` of them by::

        argmax_c  lam * rel(c) - (1 - lam) * max_{s in S} sim(c, s)

    (diversity term 0 for the first pick, so it is the plain top-1;
    ties break by id ASC). lam=1 reduces to the undiversified top-k,
    lam→0 maximizes spread.

    Scale shape: phase 1 is the ``cosine_topk`` distributed partial
    scan, extended to carry each candidate's VECTOR alongside its
    score — (k×n_batches) rows × d floats reach the driver, never the
    corpus; phase 2 is the O(fetch_n²·d) greedy on the driver, the
    same k-sized post-processing tier as every top-k merge. rel and
    pairwise sims are cosine; rel is round6'd before selection so the
    greedy's tie behavior is reproducible.

    Columns: (rank, id_col, rel, marginal) — ``marginal`` is the
    round6'd objective value at selection time (rank 1 row reports
    lam·rel)."""
    import ray

    q = np.asarray(probe_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = normalize_rows(_matrix(batch[emb_col]))
        sims = m @ qv
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = min(fetch_n, len(sims))
        part = (
            np.argpartition(-sims, take - 1)[:take]
            if take else np.empty(0, int)
        )
        return pa.table(
            {
                id_col: pa.array(ids[part], type=pa.int64()),
                "sim": pa.array(sims[part], type=pa.float64()),
                emb_col: pa.array(
                    [m[i].tolist() for i in part],
                    type=pa.list_(pa.float64()),
                ),
            }
        )

    cand = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    cand["sim"] = round6(cand["sim"].to_numpy())
    cand = (
        cand.sort_values(["sim", id_col], ascending=[False, True])
        .head(fetch_n)
        .reset_index(drop=True)
    )
    ids = cand[id_col].to_numpy()
    rel = cand["sim"].to_numpy()
    mat = (
        np.asarray(cand[emb_col].tolist(), dtype=np.float64)  # normalized
        if len(cand)
        else np.zeros((0, 1))
    )
    pair = mat @ mat.T  # candidate-candidate cosine
    n = len(ids)
    selected: list[int] = []
    marginals: list[float] = []
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if selected:
            div = pair[:, selected].max(axis=1)
        else:
            div = np.zeros(n)
        obj = lam * rel - (1.0 - lam) * div
        obj_r = round6(obj)
        # argmax with (obj DESC, id ASC) ties among remaining
        best, best_key = -1, None
        idxs = np.nonzero(remaining)[0]
        for i in idxs:
            key = (-obj_r[i], ids[i])
            if best_key is None or key < best_key:
                best, best_key = i, key
        selected.append(best)
        marginals.append(float(obj_r[best]))
        remaining[best] = False
    import pandas as pd

    return pd.DataFrame(
        {
            "rank": np.arange(1, len(selected) + 1, dtype=np.int64),
            id_col: ids[selected].astype(np.int64),
            "rel": rel[selected],
            "marginal": np.array(marginals, dtype=np.float64),
        }
    )


def near_dup_pairs(ds, threshold: float, id_col: str = "vec_id",
                   emb_col: str = "embedding", target_block_rows: int = 8192):
    """All (a, b) pairs, a < b, with cosine ≥ threshold — exact,
    distributed as a block-pair self-join.

    The table is snapshotted into object-store blocks of
    ``target_block_rows`` (never materialized on the driver — the
    round-1 scale-killer), each block is normalized once by a Ray task,
    and one task per unordered block pair (i ≤ j) matmuls the two
    blocks and emits its qualifying pairs. The dot-product count is
    inherently O(N²) — that is the exactness contract; what scales is
    the decomposition: B(B+1)/2 bounded-memory tasks, results returned
    as a Dataset via ``from_arrow_refs``. For approximate-at-scale use
    the IVF/LSH paths instead.

    Raw ``@ray.remote`` is justified here: the Dataset API cannot
    express a blockwise self-join (every block must meet every other
    block exactly once).
    """
    import ray
    import ray.data as rd

    packed = ds.select_columns([id_col, emb_col]).materialize()
    n_rows = packed.count()
    n_blocks = max(1, -(-n_rows // target_block_rows))
    if packed.num_blocks() != n_blocks:
        packed = packed.repartition(n_blocks).materialize()
    block_refs = packed.to_arrow_refs()

    @ray.remote
    def norm_block(tbl: pa.Table):
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return ids, normalize_rows(_matrix(tbl[emb_col]))

    @ray.remote
    def pair_block(blk_a, blk_b, same: bool):
        ids_a, m_a = blk_a
        ids_b, m_b = blk_b
        sims = m_a @ m_b.T
        rows, cols = np.nonzero(sims >= threshold)
        # orient every pair a < b; self-block keeps the upper triangle
        lo = np.minimum(ids_a[rows], ids_b[cols])
        hi = np.maximum(ids_a[rows], ids_b[cols])
        keep = lo < hi if same else np.ones(len(rows), dtype=bool)
        if same:  # drop the mirrored duplicate of each cross pair
            keep &= ids_a[rows] < ids_b[cols]
        return pa.table(
            {
                "a": pa.array(lo[keep], type=pa.int64()),
                "b": pa.array(hi[keep], type=pa.int64()),
                "sim": pa.array(round6(sims[rows[keep], cols[keep]]), type=pa.float64()),
            }
        )

    norm_refs = [norm_block.remote(r) for r in block_refs]
    out_refs = [
        pair_block.remote(norm_refs[i], norm_refs[j], i == j)
        for i in range(len(norm_refs))
        for j in range(i, len(norm_refs))
    ]
    return rd.from_arrow_refs(out_refs)


def lsh_near_dup_params(threshold: float, target_miss: float = 1e-6,
                        max_bands: int = 128, max_r: int = 16) -> tuple[int, int]:
    """Auto-tune (rows_per_band, n_bands) for sign-random-projection LSH
    so a pair at cosine exactly ``threshold`` is missed with probability
    ≤ ``target_miss``: a sign bit agrees with probability
    p = 1 − arccos(s)/π (Goemans–Williamson / Charikar SimHash), a band
    of r bits matches with p^r, and the miss probability over b bands is
    (1 − p^r)^b. Among feasible (r, b) the tuner minimizes the expected
    number of matching bands for an ORTHOGONAL pair, b·2^−r — the
    candidate-volume proxy — so higher thresholds get longer, more
    selective bands automatically. Deterministic: no sampling, no data
    dependence."""
    import math

    s = max(-1.0, min(1.0, float(threshold)))
    p = 1.0 - math.acos(s) / math.pi
    if p >= 1.0:
        return 16, 4
    best = None
    for r in range(1, max_r + 1):
        pr = p ** r
        if pr <= 0.0:
            break
        b = 1 if pr >= 1.0 else math.ceil(
            math.log(target_miss) / math.log(1.0 - pr)
        )
        if b > max_bands:
            continue
        score = b * 0.5 ** r
        if best is None or score < best[0]:
            best = (score, r, b)
    if best is None:  # threshold too low for the band budget — take the
        # most selective feasible r=1 configuration
        return 1, max_bands
    return best[1], best[2]


class EmbeddingLSHStage:
    """map_batches actor: embeddings → sign-random-projection band rows
    (band, band_hash, vec_id) — the embedding twin of ``MinHashStage``.

    The projection matrix (d × n_bands·r, seeded standard normal) is
    built ONCE per actor in ``__init__`` and each batch is one matmul +
    bit-pack; sign bits are invariant to vector norm, so no
    normalization is needed here (the verify step normalizes)."""

    def __init__(self, dim: int, n_bands: int, rows_per_band: int,
                 seed: int = 42, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bands * rows_per_band))
        self.n_bands = n_bands
        self.r = rows_per_band
        self.id_col = id_col
        self.emb_col = emb_col
        self._weights = (np.uint64(1) << np.arange(rows_per_band,
                                                   dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        m = _matrix(batch[self.emb_col])
        bits = (m @ self.planes) >= 0.0  # (n, b·r)
        codes = bits.reshape(n, self.n_bands, self.r).astype(np.uint64) @ self._weights
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(self.n_bands,
                                                   dtype=np.int32), n)),
                "band_hash": pa.array(codes.reshape(-1).astype(np.int64)),
                "vec_id": pa.array(np.repeat(ids, self.n_bands),
                                   type=pa.int64()),
            }
        )


def _embedding_rows(ds, involved_ids: frozenset, id_col: str, emb_col: str):
    """(vec_id, emb binary) rows for the involved vectors only — the
    embedding twin of ``minhash._shingle_rows``: the involved-id set is
    pair-scale (bucket-cap bounded) and broadcast once; the table
    streams through a vectorized filter. Vectors ride the hash join as
    float64-LE binary blobs (Arrow's join rejects list payloads)."""
    import ray
    import pyarrow.compute as pc

    ids_ref = ray.put(
        np.fromiter(involved_ids, dtype=np.int64, count=len(involved_ids))
    )

    def rows(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        mask = pc.is_in(
            batch[id_col], value_set=pa.array(wanted, type=batch[id_col].type)
        )
        hit = batch.filter(mask)
        m = normalize_rows(_matrix(hit[emb_col]))
        blobs = [m[i].tobytes() for i in range(len(m))]
        return pa.table(
            {
                "vid": hit[id_col].cast(pa.int64()),
                "emb": pa.array(blobs, type=pa.binary()),
            }
        )

    return ds.map_batches(rows, batch_format="pyarrow")


def lsh_near_dup_pairs(ds, threshold: float, id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       n_bands: int | None = None,
                       rows_per_band: int | None = None,
                       seed: int = 42, target_miss: float = 1e-6,
                       max_bucket: int = 2000, num_partitions: int = 8):
    """Bucketed embedding near-duplicate pairs — the SCALE default.

    Random-hyperplane (sign-projection) LSH generates candidates:
    vectors sharing any band of sign bits meet in a bucket (tiny band
    rows are the only corpus-wide exchange — reuses
    ``minhash.band_rows_to_pairs`` banding, caps, and pair dedup), then
    every candidate pair is verified with the EXACT cosine, so
    precision is 1.0 and the output schema/rounding match the exact
    ``near_dup_pairs`` referee: (a, b, sim), a < b, sim ≥ threshold.

    Recall is 1 − (1 − p^r)^b per pair (p = 1 − arccos(sim)/π),
    auto-tuned by ``lsh_near_dup_params`` to miss a pair AT the
    threshold with probability ≤ ``target_miss`` (default 1e-6); pairs
    above the threshold are exponentially safer. The projection is
    seeded, so a given corpus/threshold/seed gives ONE deterministic
    answer. Work scales with band-bucket occupancy instead of N²/2
    block pairs; at very low thresholds (≲0.5) band selectivity
    degrades toward all-pairs — intrinsic to LSH, documented, and the
    exact referee (``near_dup_pairs``) remains available.
    """
    import ray.data as rd

    if n_bands is None or rows_per_band is None:
        auto_r, auto_b = lsh_near_dup_params(threshold, target_miss)
        rows_per_band = rows_per_band or auto_r
        n_bands = n_bands or auto_b

    head = ds.limit(1).to_pandas()
    if head.empty:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }))
    dim = len(head[emb_col].iloc[0])

    from zensearch_ray.stages.minhash import band_rows_to_pairs

    band_rows = ds.select_columns([id_col, emb_col]).map_batches(
        EmbeddingLSHStage,
        fn_constructor_kwargs=dict(
            dim=dim, n_bands=n_bands, rows_per_band=rows_per_band,
            seed=seed, id_col=id_col, emb_col=emb_col,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    # the stage emits its id column as "vec_id" regardless of id_col
    pairs = band_rows_to_pairs(band_rows, max_bucket,
                               id_col="vec_id").materialize()
    pair_ids = pairs.to_pandas()  # pair-SCALE (bucket-capped), not corpus
    if pair_ids.empty:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }))
    involved = frozenset(pair_ids["a"].tolist()) | frozenset(pair_ids["b"].tolist())
    emb_rows = _embedding_rows(ds, involved, id_col, emb_col).materialize()

    joined = (
        pairs.join(emb_rows, "inner", num_partitions,
                   on=("a",), right_on=("vid",))
        .rename_columns({"emb": "emb_a"})
        .join(emb_rows, "inner", num_partitions,
              on=("b",), right_on=("vid",), right_suffix="_b")
        .rename_columns({"emb": "emb_b"})
    )

    def cosine_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ma = np.frombuffer(
            b"".join(batch["emb_a"].to_pylist()), dtype=np.float64
        ).reshape(batch.num_rows, -1)
        mb = np.frombuffer(
            b"".join(batch["emb_b"].to_pylist()), dtype=np.float64
        ).reshape(batch.num_rows, -1)
        sims = np.einsum("ij,ij->i", ma, mb)
        keep = sims >= threshold
        return pa.table(
            {
                "a": batch["a"].filter(pa.array(keep)).cast(pa.int64()),
                "b": batch["b"].filter(pa.array(keep)).cast(pa.int64()),
                "sim": pa.array(round6(sims[keep]), type=pa.float64()),
            }
        )

    return joined.map_batches(cosine_filter, batch_format="pyarrow")


def lsh_prune_rate(threshold: float, target_miss: float = 1e-6) -> float:
    """Expected fraction of ORTHOGONAL pairs that still become LSH
    candidates under the auto-tuned bands: ≈ min(1, b·2^−r). The
    decision statistic for ``near_dup_pairs_auto``: when it approaches
    1, banding cannot prune at this threshold — every pair meets in
    some bucket and the bucket-pair emission does MORE work than the
    exact block-pair matmul (which does N²/2 fused dot products with
    BLAS, no row materialization)."""
    r, b = lsh_near_dup_params(threshold, target_miss)
    return min(1.0, b * 0.5 ** r)


def near_dup_pairs_auto(ds, threshold: float, id_col: str = "vec_id",
                        emb_col: str = "embedding", seed: int = 42,
                        target_miss: float = 1e-6, max_rate: float = 0.25,
                        **kw):
    """Threshold-adaptive near-dup pairs — the recommended default.

    High thresholds (the actual near-DUPLICATE regime, ≳0.7) route to
    the bucketed LSH path: candidate volume tracks true duplicate
    density, not N². Low thresholds make sign-banding non-selective —
    ``lsh_prune_rate`` ≥ ``max_rate`` means most orthogonal pairs
    would still collide in some band, so emitting bucket pairs costs
    MORE than the exact block-pair matmul; those route to the exact
    decomposition (whose N²/2 dot-product count is then intrinsic to
    the question being asked, not an implementation shortfall).
    Both paths produce identical (a, b, sim) output."""
    if lsh_prune_rate(threshold, target_miss) < max_rate:
        return lsh_near_dup_pairs(ds, threshold, id_col, emb_col,
                                  seed=seed, target_miss=target_miss, **kw)
    return near_dup_pairs(ds, threshold, id_col, emb_col)


def _kmeans_centroids(m: np.ndarray, n_lists: int, seed: int, iters: int) -> np.ndarray:
    """Deterministic spherical k-means (seeded init, fixed iterations).
    Shared by the driver-side IvfIndex and the distributed path so both
    produce identical assignments."""
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(m))
    centroids = m[rng.choice(len(m), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(n_lists):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / (np.linalg.norm(v) or 1.0)
    return centroids


def ivf_topk_dist(
    ds,
    probe_vec: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Distributed IVF-flat top-k — the 100 TB scale path.

    Train centroids on a driver-side SAMPLE (first ``train_sample``
    rows here for determinism; production would seed-sample), broadcast
    (centroids, probe-list ids, query) once via ``ray.put``, then ONE
    streaming ``map_batches`` pass: each batch assigns its rows to
    lists (argmax against broadcast centroids), keeps only rows whose
    list is probed (~nprobe/n_lists of the data), scores the survivors
    and emits a per-batch partial top-k. Tiny driver merge; no shuffle,
    nothing materialized. Results identical to ``IvfIndex.search`` with
    the same training sample = full data (verified in tests).
    """
    import ray

    sample = ds.limit(train_sample).to_pandas()
    m_s = normalize_rows(np.array(sample[emb_col].tolist(), dtype=np.float64))
    centroids = _kmeans_centroids(m_s, n_lists, seed, iters=10)

    q = np.asarray(probe_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe_lists = np.argsort(-(centroids @ q))[:nprobe]
    ref = ray.put((centroids, frozenset(probe_lists.tolist()), q))

    def partial(batch: pa.Table) -> pa.Table:
        cents, probed, qv = ray.get(ref)
        m = normalize_rows(_matrix(batch[emb_col]))
        assign = np.argmax(m @ cents.T, axis=1)
        keep = np.isin(assign, list(probed))
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        sims = m[keep] @ qv
        take = min(k, len(sims))
        part = np.argpartition(-sims, take - 1)[:take] if take else np.empty(0, int)
        return pa.table(
            {
                id_col: pa.array(ids[part], type=pa.int64()),
                "sim": pa.array(sims[part], type=pa.float64()),
            }
        )

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand["sim"] = round6(cand["sim"].to_numpy())
    cand = cand.sort_values(["sim", id_col], ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


class IvfIndex:
    """IVF-flat ANN: deterministic centroid init (seeded k-means, few
    iters) on a driver-side sample, then per-batch assignment; queries
    probe the ``nprobe`` nearest lists. Approximate — tests measure
    recall vs ``cosine_topk`` (data-dependent; exact at nprobe=n_lists)."""

    def __init__(self, vectors: np.ndarray, ids: np.ndarray, n_lists: int = 16, seed: int = 42, iters: int = 10):
        m = normalize_rows(np.asarray(vectors, dtype=np.float64))
        centroids = _kmeans_centroids(m, n_lists, seed, iters)
        self.centroids = centroids
        self.assign = np.argmax(m @ centroids.T, axis=1)
        self.m = m
        self.ids = np.asarray(ids, dtype=np.int64)
        self.lists = [np.flatnonzero(self.assign == c) for c in range(n_lists)]

    def search(self, q: np.ndarray, k: int = 10, nprobe: int = 4):
        q = np.asarray(q, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        probe = np.argsort(-(self.centroids @ q))[:nprobe]
        cand = np.concatenate([self.lists[c] for c in probe]) if len(probe) else np.empty(0, int)
        if not len(cand):
            return np.empty(0, dtype=np.int64), np.empty(0)
        sims = self.m[cand] @ q
        order = np.lexsort((self.ids[cand], -sims))[:k]
        return self.ids[cand][order], round6(sims[order])


def dup_components(ds, threshold: float, id_col: str = "vec_id",
                   emb_col: str = "embedding", num_partitions: int = 8,
                   method: str = "auto"):
    """Connected components of the embedding near-duplicate graph:
    every vector labeled with the min vec_id of its cosine-≥threshold
    component (singletons label themselves) — the grouping step that
    turns pairwise near-dup evidence into keep-one-per-group
    deduplication decisions.

    Composition of two already-distributed operators: the near-dup pair
    generator (``method='auto'`` — the threshold-adaptive default,
    ``near_dup_pairs_auto``; ``'lsh'`` forces the bucketed path;
    ``'exact'`` the N² block-pair referee) →
    ``stages/minhash.py:connected_components`` (min-label propagation,
    edge-scale joins). The final label attach broadcasts the PAIR-scale
    label map and streams the id column — the same shape as
    ``minhash.dup_groups``.

    Output Dataset: (vec_id, component_id), one row per input vector.
    """
    import ray

    from zensearch_ray.stages.minhash import connected_components

    if method == "auto":
        pair_src = near_dup_pairs_auto(ds, threshold, id_col, emb_col,
                                       num_partitions=num_partitions)
    elif method == "lsh":
        pair_src = lsh_near_dup_pairs(ds, threshold, id_col, emb_col,
                                      num_partitions=num_partitions)
    elif method == "exact":
        pair_src = near_dup_pairs(ds, threshold, id_col, emb_col)
    else:
        raise ValueError(f"unknown near-dup method {method!r}")
    pairs = pair_src.select_columns(["a", "b"])
    labels = connected_components(pairs, num_partitions).to_pandas()
    label_map = dict(
        zip(labels["node"].astype("int64"), labels["label"].astype("int64"))
    )
    map_ref = ray.put(label_map)

    def attach(batch: pa.Table) -> pa.Table:
        lm = ray.get(map_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = (
            pd.Series(ids).map(lm).fillna(pd.Series(ids)).astype(np.int64).to_numpy()
            if lm
            else ids
        )
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "component_id": pa.array(comp, type=pa.int64()),
            }
        )

    return ds.select_columns([id_col]).map_batches(attach, batch_format="pyarrow")


def kmeans_init(m0: np.ndarray, k: int, seed: int = 42) -> np.ndarray:
    """Deterministic farthest-first (k-center greedy) init over a
    sample: seeded first pick, then each next centroid is the sample
    point maximizing its distance to the nearest chosen one — immune
    to the two-picks-in-one-blob local optimum of random init."""
    if len(m0) < k:
        raise ValueError(f"need >= k={k} rows to init, got {len(m0)}")
    rng = np.random.default_rng(seed)
    chosen = [int(rng.integers(len(m0)))]
    d2 = ((m0 - m0[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((m0 - m0[nxt]) ** 2).sum(axis=1))
    return m0[chosen].copy()


def kmeans_fit(
    ds,
    k: int,
    emb_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
    init_sample: int = 4096,
) -> np.ndarray:
    """Distributed full-corpus Lloyd's k-means (Euclidean): the
    iterative-refinement pattern ``IvfIndex`` (sample-only training)
    deliberately skips.

    Per iteration: centroids broadcast once (``ray.put``); every batch
    assigns rows with one matmul and emits the SUFFICIENT STATISTICS
    (k per-cluster sums + counts — O(k·d) per batch, independent of
    batch size); the driver streams the partials and updates in O(k·d)
    memory (the parameter-server-on-driver shape — nothing about the
    corpus is ever materialized). Deterministic: farthest-first init
    (``kmeans_init``) from the first ``init_sample`` rows, ties in
    assignment break to the lowest cluster id (numpy argmax on the
    dot form), empty clusters keep their previous centroid. Returns
    the (k, d) centroid matrix."""
    import ray

    head = ds.limit(init_sample).to_pandas()
    m0 = _matrix(pa.array(head[emb_col].tolist()))
    centroids = kmeans_init(m0, k, seed)
    d = centroids.shape[1]

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _matrix(batch[emb_col])
            # argmin ||x-c||² == argmax (x·c - ||c||²/2); one matmul
            dots = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
            assign = np.argmax(dots, axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "sums": pa.array([sums.ravel()]),
                    "counts": pa.array([counts]),
                }
            )

        tot_sums = np.zeros((k, d), dtype=np.float64)
        tot_counts = np.zeros(k, dtype=np.int64)
        stats = ds.map_batches(partial, batch_format="pyarrow")
        for b in stats.iter_batches(batch_format="pyarrow"):
            for s, c in zip(b["sums"].to_pylist(), b["counts"].to_pylist()):
                tot_sums += np.asarray(s, dtype=np.float64).reshape(k, d)
                tot_counts += np.asarray(c, dtype=np.int64)
        nonempty = tot_counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = tot_sums[nonempty] / tot_counts[nonempty, None]
    return centroids


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id",
                  emb_col: str = "embedding"):
    """Map-only cluster assignment against broadcast centroids.
    Output: (id_col, cluster int64)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix(batch[emb_col])
        dots = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(np.argmax(dots, axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_inertia(ds, centroids: np.ndarray, emb_col: str = "embedding") -> float:
    """Total within-cluster squared distance (the Lloyd objective),
    streamed — one scalar partial per batch."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix(batch[emb_col])
        d2 = (
            (m * m).sum(axis=1)[:, None]
            - 2.0 * (m @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pa.table({"inertia": pa.array([float(d2.min(axis=1).sum())])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return float(parts["inertia"].sum())


def semantic_dedup(
    ds,
    k_clusters: int = 8,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: np.ndarray | None = None,
    iters: int = 10,
):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embeddings with k-means, then deduplicate WITHIN each cluster —
    pairs at cosine ≥ ``threshold`` merge into a duplicate group and
    only one representative survives. Clustering first turns the
    global O(N²) pair problem into k independent O((N/k)²) problems —
    the paper's entire scaling argument — at the documented cost of
    missing near-dup pairs that straddle a cluster boundary (use
    ``dup_components`` for the exact global answer).

    Deviation from the paper, pinned for determinism: the survivor is
    the MIN ``id_col`` of its within-cluster duplicate component (the
    repo-wide keep-first convention; the paper keeps the point with the
    lowest similarity to the centroid — swap the representative choice
    in ``dedup_cluster`` if training-data diversity matters more than
    reproducibility).

    Distributed shape: one ``kmeans_fit`` (broadcast centroids,
    O(k·d) sufficient-stats partials), ONE cluster-keyed exchange of
    (id, embedding) rows, then per-cluster vectorized work inside
    ``map_groups`` — normalized matmul, threshold mask, union-find
    over the group's pairs (group-local by construction: SemDeDup
    never merges across clusters, so no global component pass).
    ``k_clusters`` is the knob that bounds per-group memory:
    (N/k)² · 8 bytes must fit a worker — at 10^9 vectors pick
    k ≈ 10^4-10^5 exactly as the paper does.

    Output Dataset: (id_col, cluster, rep, keep) — one row per input
    vector; ``rep`` = its component's surviving id (its own id for
    uniques), ``keep`` = 1 iff the row survives.
    """
    import ray

    if centroids is None:
        centroids = kmeans_fit(
            ds, k_clusters, emb_col=emb_col, iters=iters
        )
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _matrix(batch[emb_col])
        dots = m @ c.T - 0.5 * (c * c).sum(axis=1)[None, :]
        return pa.table(
            {
                id_col: batch[id_col],
                emb_col: batch[emb_col],
                "cluster": pa.array(np.argmax(dots, axis=1).astype(np.int64)),
            }
        )

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = normalize_rows(_matrix(group[emb_col]))[order]
        n = len(ids)
        cluster = group["cluster"][0].as_py() if n else -1
        sim = m @ m.T
        # union-find over threshold pairs (ids ascending -> path to min)
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ai, bi = np.nonzero(np.triu(sim >= threshold, k=1))
        for a, b in zip(ai, bi):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rep = np.array([ids[find(i)] for i in range(n)], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(np.full(n, cluster, dtype=np.int64)),
                "rep": pa.array(rep),
                "keep": pa.array((rep == ids).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )


def pca_fit(ds, emb_col: str = "embedding", n_components: int = 16):
    """Distributed PCA over an embedding column in ONE streaming pass of
    exact sufficient statistics: every batch emits (n, Σx, X^T X) —
    O(d²) per batch regardless of batch size — the driver combines in
    O(d²) memory, forms the covariance Σ = (ΣXᵀX − n·μμᵀ)/(n−1), and
    eigendecomposes locally (d × d — embedding dims are hundreds, not
    millions; for d where d² breaks the driver, randomized sketching is
    the documented swap). Deterministic sign convention: each component
    is flipped so its largest-|coordinate| entry is positive (numpy
    eigenvector sign is otherwise arbitrary). Returns
    {"mean": (d,), "components": (k, d) rows = top components,
    "explained_variance": (k,)}."""
    import ray

    tot_n = 0
    tot_sum = None
    tot_outer = None

    def partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch[emb_col])
        return pa.table(
            {
                "n": pa.array([m.shape[0]], type=pa.int64()),
                "s": pa.array([m.sum(axis=0)]),
                "o": pa.array([(m.T @ m).ravel()]),
            }
        )

    for b in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for n, s, o in zip(b["n"].to_pylist(), b["s"].to_pylist(),
                           b["o"].to_pylist()):
            s = np.asarray(s, dtype=np.float64)
            o = np.asarray(o, dtype=np.float64)
            if tot_sum is None:
                tot_sum = np.zeros_like(s)
                tot_outer = np.zeros_like(o)
            tot_n += n
            tot_sum += s
            tot_outer += o
    if tot_n < 2:
        raise ValueError("PCA needs at least 2 rows")
    d = len(tot_sum)
    mean = tot_sum / tot_n
    cov = (tot_outer.reshape(d, d) - tot_n * np.outer(mean, mean)) / (
        tot_n - 1
    )
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    # pinned sign: largest-|coordinate| entry of each component positive
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
    }


def pca_transform(ds, model, emb_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Map-only projection pass: (id, projected list<float>) — the
    model broadcast once via ``ray.put``, one matmul per batch."""
    import ray

    ref = ray.put((model["mean"], model["components"]))

    def project(batch: pa.Table) -> pa.Table:
        mean, comps = ray.get(ref)
        m = _matrix(batch[emb_col])
        p = (m - mean[None, :]) @ comps.T
        return pa.table(
            {
                id_col: batch[id_col],
                "projected": pa.array(list(p)),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow").select_columns(
        [id_col, "projected"]
    )


def embedding_pca(sf_dir: str, n_components: int = 16):
    """Driver entry: fit PCA on the embeddings table, project every
    vector. Columns (vec_id, projected). Rows-only by contract
    (eigendecomposition isn't SQL); exactness pinned by the local-
    referee identity test."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    model = pca_fit(ds, n_components=n_components)
    return pca_transform(ds, model)
