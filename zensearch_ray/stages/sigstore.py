"""Persisted MinHash signature store → near-dup-aware incremental append.

Round 1 answered "dedup WITHIN one corpus" (``stages/minhash.py``); a
growing index (VERDICT.md missing item 1 — the reference's whole loop is
crawl more → corpus grows, ``crawler/main.go:84-112``) also needs "is
this NEW page a near-duplicate of anything already indexed?" WITHOUT
re-reading old text. The store keeps, per indexed doc:

  * its LSH **band hashes** — ``(band, band_hash, key)`` rows
    hash-partitioned by ``band_hash`` — for candidate lookup, and
  * its full **MinHash signature** — ``(key, url, sig)`` rows
    hash-partitioned by ``key`` — for Jaccard-ESTIMATE verification
    (fraction of agreeing signature slots; std ≈ sqrt(j(1-j)/n_perms),
    ~0.04 at the 128-perm default),

both as immutable per-generation Parquet partitions under
``<index_dir>/sigstore/{bands,sigs}/gen-K/part-NNNNN.parquet`` with the
same commit protocol as postings (marker last, resume by skip — the
``state/sink.py`` sink).

Keying: ``key = hash64(url)`` — independent of the index's doc-id
scheme (dense offsets or hash ids), so the store works under every id
mode and across generations.

Scale shape at 10^12 docs:
  * store size ≈ n_docs × (8·n_perms + 16·n_bands) bytes ≈ 1.3 KB/doc
    at the (16 bands × 8 rows) default — a petabyte-class sidecar at
    10^12 docs; a production deployment drops to 64 perms (estimator
    std 0.06) and prunes band rows to b·r covering the target
    threshold. The LAYOUT is what matters: every lookup below touches
    only hash-addressed partitions, never the whole store.
  * candidate lookup reads ONLY the band partitions the delta's band
    hashes fall in — one probe task per partition, each reading one
    file per generation.
  * verification reads ONLY the sig partitions holding candidate old
    keys.
  * the DELTA's signatures are broadcast once (``ray.put``) for the
    verify step — assumes delta ≪ corpus (a crawl increment, the
    reference's unit of growth). A corpus-scale "delta" should run the
    in-corpus ``dup_groups`` path instead; documented, not silent.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from zensearch_ray.functions.ids import hash64
from zensearch_ray.stages.minhash import (
    _band_hashes,
    _perm_params,
    _TokenHasher,
    minhash_signature,
    shingle_hashes,
)
from zensearch_ray.state.sink import completed_partitions, write_partitioned


@dataclass(frozen=True)
class SigConfig:
    n_bands: int = 16
    rows_per_band: int = 8
    shingle_k: int = 3
    n_partitions: int = 32
    seed: int = 42

    @property
    def n_perms(self) -> int:
        return self.n_bands * self.rows_per_band


def store_dir_of(index_dir: str) -> str:
    return os.path.join(index_dir, "sigstore")


def _meta_path(store_dir: str) -> str:
    return os.path.join(store_dir, "meta.json")


def read_meta(store_dir: str) -> dict | None:
    try:
        with open(_meta_path(store_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _write_meta(store_dir: str, meta: dict) -> None:
    tmp = _meta_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, _meta_path(store_dir))


def _gen_dir(store_dir: str, kind: str, gen: int) -> str:
    return os.path.join(store_dir, kind, f"gen-{gen}")


def _part_files(store_dir: str, kind: str, part: int) -> list[str]:
    """All generations' committed files for one hash partition."""
    base = os.path.join(store_dir, kind)
    out = []
    if not os.path.isdir(base):
        return out
    for g in sorted(os.listdir(base)):
        p = os.path.join(base, g, f"part-{part:05d}.parquet")
        if os.path.exists(p):
            out.append(p)
    return out


class SigStage:
    """map_batches actor: (url, text) → one row per doc
    (key=hash64(url), url, sig binary of n_perms uint64 LE).

    Permutation params are derived once per actor in ``__init__``
    (stateful-stage rule); the per-doc loop is inherent to
    tokenization, the per-permutation math is vectorized numpy.
    """

    def __init__(self, scfg: SigConfig | None = None,
                 text_col: str = "text", url_col: str = "url"):
        self.scfg = scfg or SigConfig()
        self.text_col = text_col
        self.url_col = url_col
        self.a, self.b = _perm_params(self.scfg.n_perms, self.scfg.seed)
        self._hasher = _TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch[self.url_col].to_pylist()
        sigs = np.empty((n, self.scfg.n_perms), dtype=np.uint64)
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            sigs[i] = minhash_signature(
                shingle_hashes(text, self.scfg.shingle_k, self._hasher),
                self.a, self.b,
            )
        keys = np.fromiter((hash64(u) for u in urls), dtype=np.int64, count=n)
        return pa.table(
            {
                "key": pa.array(keys, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
                "sig": pa.array([s.tobytes() for s in sigs], type=pa.binary()),
            }
        )


def _sigs_to_matrix(sig_col, n_perms: int) -> np.ndarray:
    """binary column of n_perms uint64 LE → (n, n_perms) uint64 matrix.

    Processed chunk-by-chunk: combining a multi-GB binary column first
    would overflow its int32 offsets (pyarrow ``offset overflow`` —
    hit in practice at ~2M 128-perm signatures)."""
    chunks = (sig_col.chunks if isinstance(sig_col, pa.ChunkedArray)
              else [sig_col])
    mats = []
    for c in chunks:
        if len(c) == 0:
            continue
        buf = b"".join(c.to_pylist())
        mats.append(np.frombuffer(buf, dtype="<u8").reshape(len(c), n_perms))
    if not mats:
        return np.empty((0, n_perms), dtype=np.uint64)
    return mats[0] if len(mats) == 1 else np.concatenate(mats)


def _band_rows_fn(scfg: SigConfig):
    """(key, sig) batches → exploded (band, band_hash, key) rows."""
    n_bands, r, n_perms = scfg.n_bands, scfg.rows_per_band, scfg.n_perms

    def fn(batch: pa.Table) -> pa.Table:
        sigs = _sigs_to_matrix(batch["sig"], n_perms)
        bh = _band_hashes(sigs, n_bands, r)
        n = batch.num_rows
        keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
                "key": pa.array(np.repeat(keys, n_bands), type=pa.int64()),
            }
        )

    return fn


def build_sig_store(ds, store_dir: str, scfg: SigConfig | None = None,
                    gen: int = 0, concurrency=(1, 16)) -> dict:
    """(Re)build generation ``gen`` of the signature store from a corpus
    Dataset carrying (url, text).

    Two resumable passes: (1) signatures, written hash-partitioned by
    key; (2) band rows derived FROM THE WRITTEN SIGS (the ~1 KB/doc
    compact form — never a second pass over corpus text), written
    hash-partitioned by band_hash. Rerun after a crash to converge.

    ``concurrency`` caps the signature actor pool; the default fits a
    32-core node (signature hashing dominates — profiled 45k pages:
    pool 8 → 10.7 s, pool 16 → 8.1 s, pool 32 → 7.9 s; the exchange
    behind the writes costs ~3 s of that). On a multi-node cluster set
    it ∝ total cores — the stage is embarrassingly parallel.
    """
    import ray.data as rd

    scfg = scfg or SigConfig()
    meta = read_meta(store_dir)
    if meta is not None and meta["config"] != asdict(scfg):
        raise ValueError(
            f"sigstore at {store_dir} was built with {meta['config']}; "
            f"append must reuse it (got {asdict(scfg)})"
        )
    sigs_dir = _gen_dir(store_dir, "sigs", gen)
    bands_dir = _gen_dir(store_dir, "bands", gen)

    sig_ds = ds.map_batches(
        SigStage, fn_constructor_kwargs={"scfg": scfg},
        batch_format="pyarrow", batch_size=512, concurrency=concurrency,
    )
    sig_stats = write_partitioned(sig_ds, sigs_dir, "key", scfg.n_partitions)

    back = rd.read_parquet(sigs_dir, columns=["key", "sig"])
    band_ds = back.map_batches(_band_rows_fn(scfg), batch_format="pyarrow")
    write_partitioned(band_ds, bands_dir, "band_hash", scfg.n_partitions)

    gens = (meta or {}).get("generations", {})
    gens[str(gen)] = {"rows": sig_stats["rows"]}
    new_meta = {
        "config": asdict(scfg),
        "generations": gens,
        "n_docs": int(sum(g["rows"] for g in gens.values())),
    }
    _write_meta(store_dir, new_meta)
    return new_meta


def fold_sig_store(src_store: str, dst_store: str) -> dict:
    """Fold every generation of ``src_store`` into a single gen-0 at
    ``dst_store`` — the sigstore's own compaction, run by
    ``compact_in_place`` beside the index fold. Near-dup probe cost
    reads one file per generation per band partition, so a
    long-running watch loop would otherwise accumulate one store
    generation per delta FOREVER; folding at each index compaction
    bounds the per-probe file count to 1 + appends-since-last-compact.
    The fold is partition-local (per-partition concat across
    generation dirs, one Ray task each — no shuffle, no driver
    materialization) and costs the same bytes the previous verbatim
    ``copytree`` already paid. Signatures of tombstone-purged docs
    survive, as before (conservative: future near-dups of a deleted
    doc still drop). Returns the new meta."""
    import ray

    meta = read_meta(src_store)
    if meta is None:
        raise FileNotFoundError(f"no sigstore meta at {src_store}")
    scfg = SigConfig(**meta["config"])

    @ray.remote
    def fold_part(kind: str, part: int) -> int:
        files = _part_files(src_store, kind, part)
        if not files:
            return 0
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        out_dir = _gen_dir(dst_store, kind, 0)
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f"part-{part:05d}.parquet.tmp")
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, os.path.join(out_dir, f"part-{part:05d}.parquet"))
        return tbl.num_rows if kind == "sigs" else 0

    futs = [fold_part.remote(kind, p)
            for kind in ("sigs", "bands")
            for p in range(scfg.n_partitions)]
    rows = int(sum(ray.get(futs)))
    # folded partitions are complete by construction: write the
    # completion markers the resumable sink protocol expects
    for kind in ("sigs", "bands"):
        gdir = _gen_dir(dst_store, kind, 0)
        os.makedirs(os.path.join(gdir, "_partitions"), exist_ok=True)
        for p in range(scfg.n_partitions):
            if os.path.exists(os.path.join(gdir, f"part-{p:05d}.parquet")):
                marker = os.path.join(
                    gdir, "_partitions", f"part-{p:05d}.json")
                with open(marker + ".tmp", "w") as f:
                    json.dump({"part": p}, f)
                os.replace(marker + ".tmp", marker)
    new_meta = {
        "config": asdict(scfg),
        "generations": {"0": {"rows": rows}},
        "n_docs": rows,
        "gen_offset": 0,
    }
    _write_meta(dst_store, new_meta)
    return new_meta


def _probe_store_fn(store_dir: str, n_partitions: int, max_bucket: int = 2000):
    """map_groups over delta band rows grouped by partition: join the
    group against the store's SAME band partition (one file per
    generation) on (band, band_hash) → candidate (new_key, old_key)
    pairs, PLUS within-delta pairs from buckets shared by ≥2 new docs.
    """

    def probe(group: pa.Table) -> pa.Table:
        import pandas as pd

        part = int(group["part"][0].as_py())
        new = group.select(["band", "band_hash", "key"]).to_pandas()
        out_new, out_old = [], []
        files = _part_files(store_dir, "bands", part)
        if files:
            old = pd.concat(
                [pq.read_table(f).to_pandas() for f in files], ignore_index=True
            )
            m = new.merge(old, on=["band", "band_hash"], suffixes=("_n", "_o"))
            if len(m):
                out_new.append(m["key_n"].to_numpy(np.int64))
                out_old.append(m["key_o"].to_numpy(np.int64))
        # within-delta: buckets with >=2 distinct new keys (capped —
        # a degenerate bucket of B docs would emit B^2 pairs)
        grp = new.groupby(["band", "band_hash"])["key"]
        for _, keys in grp:
            u = np.unique(keys.to_numpy(np.int64))
            if len(u) < 2 or len(u) > max_bucket:
                continue
            i, j = np.triu_indices(len(u), k=1)
            out_new.append(u[j])  # higher key = "new side" (the loser)
            out_old.append(-u[i] - 1)  # negative-encoded: delta-side other
        if not out_new:
            return pa.table(
                {"new_key": pa.array([], pa.int64()),
                 "other": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "new_key": pa.array(np.concatenate(out_new), type=pa.int64()),
                "other": pa.array(np.concatenate(out_old), type=pa.int64()),
            }
        )

    return probe


def _est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Rowwise MinHash Jaccard estimate for aligned (n, n_perms) pairs."""
    return (sig_a == sig_b).mean(axis=1)


def near_dup_vs_store(delta_tbl: pa.Table, store_dir: str,
                      threshold: float = 0.9,
                      scfg: SigConfig | None = None):
    """Candidate+verify a DELTA against the store and within itself.

    ``delta_tbl``: materialized (key, url, sig) table — the SigStage
    output over the delta corpus (already url-deduped; delta ≪ corpus
    is the documented assumption, see module docstring). Returns
    ``(dropped: dict[key→(url, matched_key)], pairs_checked: int)``.
    Policy: a delta doc matching ANY stored doc at est-Jaccard ≥
    threshold is dropped; among surviving within-delta matches, each
    pair keeps its smaller key (deterministic; transitive chains
    collapse via iterative pruning on the pair sliver, which is
    pair-scale, not corpus-scale). Self-pairs (key == key) are skipped
    so re-running after a partially-committed store append is a no-op
    for already-appended docs.
    """
    import ray

    scfg = scfg or SigConfig()
    meta = read_meta(store_dir)
    if meta is None:
        raise FileNotFoundError(f"no sigstore meta at {store_dir}")
    if meta["config"] != asdict(scfg):
        raise ValueError(
            f"delta signatures use {asdict(scfg)} but store has {meta['config']}"
        )
    n_parts = scfg.n_partitions

    keys = delta_tbl["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    sig_mat = _sigs_to_matrix(delta_tbl["sig"], scfg.n_perms)
    urls = delta_tbl["url"].to_pylist()
    idx_of = {int(k): i for i, k in enumerate(keys)}
    url_of = {int(k): u for k, u in zip(keys, urls)}
    sig_ref = ray.put(sig_mat)
    idx_ref = ray.put(idx_of)

    import ray.data as rd

    band_src = rd.from_arrow(delta_tbl.select(["key", "sig"]))
    band_ds = band_src.map_batches(_band_rows_fn(scfg), batch_format="pyarrow")

    def tag(batch: pa.Table) -> pa.Table:
        v = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((v * np.uint64(2654435761)) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    pairs = (
        band_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_probe_store_fn(store_dir, n_parts), batch_format="pyarrow")
    )

    # split: candidates vs OLD docs (other >= 0) verify against the sig
    # store partition-by-partition; within-delta (negative-encoded)
    # verify wholly against the broadcast delta matrix.
    def tag_old(batch: pa.Table) -> pa.Table:
        other = batch["other"].to_numpy(zero_copy_only=False)
        is_old = other >= 0
        part = np.where(
            is_old,
            (other.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(n_parts),
            np.uint64(n_parts),  # delta-side pairs: one synthetic group
        ).astype(np.int32)
        return batch.append_column("vpart", pa.array(part))

    def verify(group: pa.Table) -> pa.Table:
        vpart = int(group["vpart"][0].as_py())
        new_k = group["new_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        other = group["other"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = ray.get(sig_ref)
        idx = ray.get(idx_ref)
        if vpart == n_parts:  # within-delta
            other_k = -other - 1
            # dedup pair multiplicity (same pair from many bands)
            uniq = np.unique(np.stack([new_k, other_k], axis=1), axis=0)
            a = np.array([idx[int(k)] for k in uniq[:, 0]], dtype=np.int64)
            b = np.array([idx[int(k)] for k in uniq[:, 1]], dtype=np.int64)
            est = _est_jaccard(sigs[a], sigs[b]) if len(uniq) else np.array([])
            keep = est >= threshold
            return pa.table(
                {
                    "new_key": pa.array(uniq[:, 0][keep], type=pa.int64()),
                    "old_key": pa.array(uniq[:, 1][keep], type=pa.int64()),
                    "est_j": pa.array(np.round(est[keep], 6), type=pa.float64()),
                    "vs_old": pa.array(np.zeros(int(keep.sum()), dtype=bool)),
                }
            )
        uniq = np.unique(np.stack([new_k, other], axis=1), axis=0)
        uniq = uniq[uniq[:, 0] != uniq[:, 1]]  # self-match on re-run
        files = _part_files(store_dir, "sigs", vpart)
        if not files or not len(uniq):
            return pa.table(
                {"new_key": pa.array([], pa.int64()),
                 "old_key": pa.array([], pa.int64()),
                 "est_j": pa.array([], pa.float64()),
                 "vs_old": pa.array([], pa.bool_())}
            )
        old_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        need = pa.array(np.unique(uniq[:, 1]), type=pa.int64())
        old_tbl = old_tbl.filter(pc.is_in(old_tbl["key"], value_set=need))
        old_keys = old_tbl["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        old_sigs = _sigs_to_matrix(old_tbl["sig"], sigs.shape[1])
        old_idx = {int(k): i for i, k in enumerate(old_keys)}
        rows = [
            (nk, ok) for nk, ok in uniq if int(ok) in old_idx
        ]
        if not rows:
            return pa.table(
                {"new_key": pa.array([], pa.int64()),
                 "old_key": pa.array([], pa.int64()),
                 "est_j": pa.array([], pa.float64()),
                 "vs_old": pa.array([], pa.bool_())}
            )
        nk = np.array([r[0] for r in rows], dtype=np.int64)
        ok = np.array([r[1] for r in rows], dtype=np.int64)
        a = np.array([idx[int(k)] for k in nk], dtype=np.int64)
        b = np.array([old_idx[int(k)] for k in ok], dtype=np.int64)
        est = _est_jaccard(sigs[a], old_sigs[b])
        keep = est >= threshold
        return pa.table(
            {
                "new_key": pa.array(nk[keep], type=pa.int64()),
                "old_key": pa.array(ok[keep], type=pa.int64()),
                "est_j": pa.array(np.round(est[keep], 6), type=pa.float64()),
                "vs_old": pa.array(np.ones(int(keep.sum()), dtype=bool)),
            }
        )

    verified = (
        pairs.map_batches(tag_old, batch_format="pyarrow")
        .groupby("vpart")
        .map_groups(verify, batch_format="pyarrow")
        .to_pandas()
    )
    if len(verified) == 0 or "vs_old" not in verified.columns:
        return {}, 0  # empty-Dataset to_pandas loses columns; no pairs

    dropped: dict[int, tuple[str, int]] = {}
    vs_old = verified[verified["vs_old"]]
    for nk, ok in zip(vs_old["new_key"], vs_old["old_key"]):
        dropped.setdefault(int(nk), (url_of[int(nk)], int(ok)))
    # within-delta: iterate pairs by ascending smaller key; a doc
    # already dropped can't eliminate others (its keeper does)
    within = verified[~verified["vs_old"]].sort_values(["old_key", "new_key"])
    for nk, ok in zip(within["new_key"], within["old_key"]):
        nk, ok = int(nk), int(ok)
        if ok in dropped:
            continue
        if nk not in dropped:
            dropped[nk] = (url_of[nk], ok)
    return dropped, int(len(verified))


def append_sig_store(kept_sigs, store_dir: str, gen: int) -> dict:
    """Append the KEPT delta docs' signatures + band rows as generation
    ``gen`` (same resumable two-pass write as the initial build).

    ``gen`` is the INDEX append generation; the store maps it into its
    OWN generation namespace as ``meta["gen_offset"] + gen``. The two
    counters decouple the moment the index is compacted:
    ``compact_in_place`` folds index generations back to 1 but keeps
    the sigstore generation-structured, advancing ``gen_offset`` to
    the store's max committed generation — without the offset, the
    post-compaction append would REUSE a committed sig generation and
    the resumable partition write would silently SKIP the new delta's
    signatures, so later near-dup appends stop seeing those docs
    (caught by the endurance soak's cross-compaction planted-dup check
    and by fsck's meta-vs-rows count, which aborted the swap). The
    mapping is deterministic in (offset, gen), so a crashed-and-rerun
    append resolves to the SAME store generation and resumes it
    (meta commits last), keeping the write idempotent."""
    import ray.data as rd

    meta = read_meta(store_dir)
    if meta is None:
        raise FileNotFoundError(f"no sigstore meta at {store_dir}")
    # same-id re-entry after the offset mapping can only be the SAME
    # delta re-run (ids are never reused across compaction epochs), so
    # the resumable write below correctly no-ops it
    gen = int(meta.get("gen_offset", 0)) + int(gen)
    scfg = SigConfig(**meta["config"])
    sigs_dir = _gen_dir(store_dir, "sigs", gen)
    bands_dir = _gen_dir(store_dir, "bands", gen)
    stats = write_partitioned(kept_sigs, sigs_dir, "key", scfg.n_partitions)
    back = rd.read_parquet(sigs_dir, columns=["key", "sig"])
    band_ds = back.map_batches(_band_rows_fn(scfg), batch_format="pyarrow")
    write_partitioned(band_ds, bands_dir, "band_hash", scfg.n_partitions)
    meta["generations"][str(gen)] = {"rows": stats["rows"]}
    meta["n_docs"] = int(sum(g["rows"] for g in meta["generations"].values()))
    _write_meta(store_dir, meta)
    return meta
