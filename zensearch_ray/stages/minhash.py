"""Near-duplicate detection family: MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (ray_guide / SURVEY.md §4.2 patterns):

  * signatures are computed per batch (vectorized numpy over token
    hashes — no Python loop over permutations);
  * LSH banding explodes each doc into ``n_bands`` small
    ``(band, band_hash, doc_id)`` rows and the ONLY shuffle is the
    groupby over those band buckets;
  * candidate pairs (rare) come back to the driver; verification
    re-reads ONLY the involved docs' shingle sets; grouping is
    union-find over the verified pairs (candidate set is small by
    construction — documented assumption).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from zensearch_ray.functions.ids import hash64
from zensearch_ray.functions.rounding import round6
from zensearch_ray.functions.text import tokenize

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perms: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perms, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perms, dtype=np.int64).astype(np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles → uint64 hashes (unique). Falls back to
    unigrams for docs shorter than k tokens."""
    toks = tokenize(text)
    if len(toks) >= k:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    else:
        shingles = set(toks)
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles))


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*h + b) mod p minwise over shingles — one matmul-shaped
    broadcast op, no loop over permutations."""
    if hashes.size == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    h = hashes[:, None] % _MERSENNE
    vals = (a[None, :] * h + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


class MinHashStage:
    """map_batches: docs → LSH band rows (band, band_hash, doc_id).

    n_perms = n_bands * rows_per_band. Candidate recall follows the
    standard S-curve: P(candidate) = 1 - (1 - j^r)^b.
    """

    def __init__(self, n_bands: int = 16, rows_per_band: int = 8, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 42):
        self.n_bands = n_bands
        self.r = rows_per_band
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self.a, self.b = _perm_params(n_bands * rows_per_band, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bands_out, hashes_out, ids_out = [], [], []
        for doc_id, text in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            sig = minhash_signature(shingle_hashes(text, self.k), self.a, self.b)
            for band in range(self.n_bands):
                chunk = sig[band * self.r : (band + 1) * self.r]
                bands_out.append(band)
                hashes_out.append(hash64(chunk.tobytes()))
                ids_out.append(doc_id)
        return pa.table(
            {
                "band": pa.array(bands_out, type=pa.int32()),
                "band_hash": pa.array(hashes_out, type=pa.int64()),
                "doc_id": pa.array(ids_out, type=pa.int64()),
            }
        )


def lsh_candidate_pairs(ds, stage_kwargs: dict | None = None, max_bucket: int = 1000):
    """Dataset of docs → driver-side set of candidate (a, b) pairs.

    The shuffle is over tiny band rows. Buckets larger than
    ``max_bucket`` are dropped (they indicate degenerate content, e.g.
    empty docs; a production run would salt them) — the cap is explicit
    in the signature, not silent.
    """
    band_rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=stage_kwargs or {},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    n_coarse = 64  # LSH buckets are ~#docs × n_bands → coarse-bucket the
    # shuffle and do vectorized within-bucket grouping (functions/agg.py
    # rationale: never pay per-group Python in a groups≈rows shuffle)

    def add_coarse(batch: pa.Table) -> pa.Table:
        bh = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        coarse = ((bh * np.uint64(2654435761)) % np.uint64(n_coarse)).astype(np.int32)
        return batch.append_column("coarse", pa.array(coarse))

    import pandas as pd

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), bucket in group.groupby(["band", "band_hash"]):
            if 1 < len(bucket) <= max_bucket:
                ids = sorted(bucket["doc_id"].tolist())
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        out_a.append(ids[i])
                        out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b}, dtype="int64")

    pairs = (
        band_rows.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    return set(zip(pairs["a"].tolist(), pairs["b"].tolist())) if len(pairs) else set()


def verify_and_group(ds, pairs: set, shingle_k: int = 3, threshold: float = 0.8,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Verify candidate pairs' true Jaccard; union-find verified pairs
    into duplicate groups. Returns {doc_id: group_id} for ALL docs in
    any verified group (group_id = min doc_id of the group)."""
    if not pairs:
        return {}
    involved = {d for p in pairs for d in p}

    def shingles_for(batch: pa.Table) -> pa.Table:
        ids, sets_ = [], []
        for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if doc_id in involved:
                ids.append(doc_id)
                sets_.append(shingle_hashes(text, shingle_k).tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shingles": pa.array(sets_, type=pa.list_(pa.uint64())),
            }
        )

    rows = ds.map_batches(shingles_for, batch_format="pyarrow").to_pandas()
    sh = {int(r.doc_id): set(r.shingles) for r in rows.itertuples()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        sa, sb = sh.get(a, set()), sh.get(b, set())
        union = len(sa | sb)
        if union and len(sa & sb) / union >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    groups = {}
    for d in parent:
        groups[d] = find(d)
    return {d: g for d, g in groups.items()}


class SimHashStage:
    """map_batches: docs → 63-bit SimHash fingerprints (near-dup when
    hamming distance small). Deterministic blake2b token hashing."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._memo: dict[str, np.ndarray] = {}

    def _bits(self, token: str) -> np.ndarray:
        v = self._memo.get(token)
        if v is None:
            h = np.uint64(hash64(token))
            v = ((h >> np.arange(63, dtype=np.uint64)) & np.uint64(1)).astype(np.int64) * 2 - 1
            self._memo[token] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, dtype=np.int64)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            acc = np.zeros(63, dtype=np.int64)
            for tok in tokenize(text):
                acc += self._bits(tok)
            bits = (acc > 0).astype(np.uint64)
            out[i] = int((bits << np.arange(63, dtype=np.uint64)).sum())
        return pa.table({"doc_id": batch[self.id_col], "simhash": pa.array(out)})


def simhash_near_pairs(ds, max_hamming: int = 3, n_bands: int = 4,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole: with ``n_bands`` > ``max_hamming`` bit-bands, two
    fingerprints within ``max_hamming`` bits MUST agree exactly on at
    least one band — so banding finds every qualifying pair (exact
    recall), and the only shuffle is the groupby over (band, band_bits)
    buckets. Candidates are verified with a popcount of the XOR.
    Returns a DataFrame (a, b, hamming), a < b.
    """
    import pandas as pd

    assert n_bands > max_hamming, "pigeonhole guarantee needs n_bands > max_hamming"
    fp = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    width = 63 // n_bands + 1

    def band_rows(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands_l, bits_l, ids_l, fp_l = [], [], [], []
        for band in range(n_bands):
            lo = band * width
            bits = (h >> np.uint64(lo)) & np.uint64((1 << width) - 1)
            bands_l.append(np.full(len(h), band, dtype=np.int32))
            bits_l.append(bits.astype(np.int64))
            ids_l.append(ids)
            fp_l.append(h.astype(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands_l)),
                "bits": pa.array(np.concatenate(bits_l)),
                "doc_id": pa.array(np.concatenate(ids_l), type=pa.int64()),
                "fp": pa.array(np.concatenate(fp_l), type=pa.int64()),
            }
        )

    import pandas as pd

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for (_, _), bucket in group.groupby(["band", "bits"]):
            if len(bucket) < 2:
                continue
            ids = bucket["doc_id"].to_numpy()
            fps = bucket["fp"].to_numpy().astype(np.uint64)
            order = np.argsort(ids)
            ids, fps = ids[order], fps[order]
            for i in range(len(ids)):
                x = fps[i] ^ fps[i + 1 :]
                ham = np.array([bin(int(v)).count("1") for v in x])
                hit = ham <= max_hamming
                for j, hm in zip(np.flatnonzero(hit), ham[hit]):
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + j])
                    out_h.append(hm)
        return pd.DataFrame(
            {"a": out_a, "b": out_b, "hamming": out_h}, dtype="int64"
        )

    n_coarse = 64

    def add_coarse(batch: pa.Table) -> pa.Table:
        b = batch["bits"].to_numpy(zero_copy_only=False).astype(np.uint64)
        coarse = ((b * np.uint64(2654435761)) % np.uint64(n_coarse)).astype(np.int32)
        return batch.append_column("coarse", pa.array(coarse))

    pairs = (
        fp.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(emit, batch_format="pandas")
        .to_pandas()
    )
    # the same pair can surface from several agreeing bands — dedup
    if len(pairs):
        pairs = pairs.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    return pairs


def jaccard_topk(ds, probe_tokens: set[str], k: int = 10, exclude_id: int | None = None,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Unigram-Jaccard top-k of a broadcast probe token set vs every doc.

    Per-batch partial top-k → small driver merge (same shape as
    ann.cosine_topk). Ties broken (jaccard DESC, doc_id ASC).
    """
    import ray

    probe_ref = ray.put(frozenset(probe_tokens))

    def partial(batch: pa.Table) -> pa.Table:
        probe = ray.get(probe_ref)
        ids, sims = [], []
        for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            if exclude_id is not None and doc_id == exclude_id:
                continue
            toks = set(tokenize(text))
            union = len(toks | probe)
            ids.append(doc_id)
            sims.append(len(toks & probe) / union if union else 0.0)
        t = pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "jaccard": pa.array(sims, type=pa.float64()),
            }
        )
        if t.num_rows > k:
            order = np.lexsort((np.array(ids), -np.array(sims)))[:k]
            t = t.take(order)
        return t

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand["jaccard"] = round6(cand["jaccard"].to_numpy())
    cand = cand.sort_values(["jaccard", id_col], ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)
