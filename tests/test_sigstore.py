"""Near-dup-aware incremental append (stages/sigstore.py).

Semantics under test:
  * build with ``sig_store=True`` persists a signature store covering
    exactly the indexed docs;
  * ``append_index_dedup`` drops delta docs that near-duplicate an
    ALREADY-INDEXED doc (checked via the store — old text never
    re-read) or another delta doc (smaller hash64(url) key wins), and
    indexes the survivors;
  * kept docs' signatures join the store, so a SECOND append dedups
    against the first append's docs too;
  * the est-Jaccard verdicts agree with brute-force shingle Jaccard on
    planted exact/near/far duplicates.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.ids import hash64
from zensearch_ray.pipelines.build_index import (
    BuildConfig,
    append_index_dedup,
    build_index,
)
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.stages.sigstore import SigConfig, read_meta, store_dir_of


def _cfg():
    return BuildConfig(
        num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en",
        sig_store=True,
    )


def _pages_like(urls, texts, ts0=1_700_000_000_000_000):
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(
                [ts0 + i * 1_000_000 for i in range(n)], type=pa.timestamp("us")
            ),
            "html": pa.array([b""] * n, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
        }
    )


@pytest.fixture(scope="module")
def base_and_delta(tmp_path_factory):
    root = tmp_path_factory.mktemp("sigstore")
    base_tbl = generate_pages_table(120, seed=7)
    base = str(root / "base.parquet")
    pq.write_table(base_tbl, base, row_group_size=32)

    en = base_tbl.filter(
        pa.compute.equal(base_tbl["lang"], "en")
    )
    base_texts = en["text"].to_pylist()
    fresh = generate_pages_table(40, seed=99, row_offset=10_000)
    fresh_en = fresh.filter(pa.compute.equal(fresh["lang"], "en"))
    f_urls = fresh_en["url"].to_pylist()[:20]
    f_texts = fresh_en["text"].to_pylist()[:20]

    exact_old = base_texts[3]          # exact copy of an indexed doc
    near_old_words = base_texts[5].split(" ")
    near_old_words[0] = "zzzchanged"   # 1-token perturbation: J ≈ high
    near_old = " ".join(near_old_words)
    twin_text = f_texts[0] + " twin payload words"  # within-delta pair

    urls = (
        [f"https://delta.example.com/{i}" for i in range(4)]
        + f_urls[1:]
    )
    texts = [exact_old, near_old, twin_text, twin_text] + f_texts[1:]
    delta = str(root / "delta.parquet")
    pq.write_table(_pages_like(urls, texts), delta, row_group_size=16)
    return base, delta, urls, texts


def test_build_creates_store(ray_session, base_and_delta, tmp_path):
    base, *_ = base_and_delta
    idx = str(tmp_path / "idx")
    m = build_index(base, idx, _cfg())
    meta = read_meta(store_dir_of(idx))
    assert meta is not None
    assert meta["n_docs"] == m["n_docs"] == m["sig_store_docs"]
    assert os.path.isdir(os.path.join(store_dir_of(idx), "bands", "gen-0"))
    assert os.path.isdir(os.path.join(store_dir_of(idx), "sigs", "gen-0"))


def test_append_dedup_drops_planted_dups(ray_session, base_and_delta, tmp_path):
    base, delta, urls, texts = base_and_delta
    idx = str(tmp_path / "idx2")
    m0 = build_index(base, idx, _cfg())

    m1 = append_index_dedup(delta, idx, _cfg(), threshold=0.5)
    nd = m1["near_dedup"]
    dropped_urls = {d["url"] for d in nd["dropped_sample"]}

    # exact copy of an indexed doc → dropped vs store (est_j = 1.0)
    assert urls[0] in dropped_urls
    # near-dup (1-token change) → dropped vs store at threshold 0.5
    assert urls[1] in dropped_urls
    # within-delta identical pair: exactly one of the twins dropped
    twins = {urls[2], urls[3]}
    assert len(twins & dropped_urls) == 1
    loser = max(twins, key=lambda u: hash64(u))
    assert loser in dropped_urls
    # fresh docs survive
    assert not any(u.startswith("https://site") and u in dropped_urls
                   for u in urls[4:])
    assert nd["dropped"] == 3
    assert m1["n_docs"] == m0["n_docs"] + (len(urls) - 3)

    # survivors are queryable; dropped twin's url is absent
    eng = QueryEngine(idx)
    rows = eng.topk_docs("twin payload words", k=5)
    got_urls = {r["url"] for r in rows}
    assert (twins - {loser}) & got_urls
    assert loser not in got_urls

    # the store grew by the kept docs
    meta = read_meta(store_dir_of(idx))
    assert meta["n_docs"] == m1["n_docs"]

    # SECOND append: a copy of a doc KEPT in the first append, under a
    # brand-new url, must now be dropped against the store
    keeper_text = texts[2]
    d2 = str(tmp_path / "delta2.parquet")
    pq.write_table(
        _pages_like(
            ["https://second.example.com/copy", "https://second.example.com/new"],
            [keeper_text, "entirely novel second append content words here"],
        ),
        d2,
    )
    m2 = append_index_dedup(d2, idx, _cfg(), threshold=0.5)
    nd2 = m2["near_dedup"]
    assert nd2["dropped"] == 1
    assert nd2["dropped_sample"][0]["url"] == "https://second.example.com/copy"
    assert m2["n_docs"] == m1["n_docs"] + 1


def test_append_dedup_across_compaction(ray_session, base_and_delta,
                                        tmp_path):
    """The soak-found generation-collision bug: compaction folds INDEX
    generations back to 1 while the sigstore keeps its history, so a
    post-compaction append's sig generation collided with a committed
    one and the resumable write silently SKIPPED the delta's
    signatures — later appends stopped near-dup-checking against those
    docs, and the next compaction's fsck aborted on meta-vs-rows. The
    gen_offset mapping decouples the namespaces; this drives
    build → append → compact → append → compact → append and asserts
    every cross-epoch planted dup still drops and fsck stays green."""
    from zensearch_ray.pipelines.compact import compact_in_place
    from zensearch_ray.pipelines.fsck import fsck_index

    base, delta, urls, texts = base_and_delta
    idx = str(tmp_path / "idxc")
    build_index(base, idx, _cfg())
    append_index_dedup(delta, idx, _cfg(), threshold=0.5)

    pre_fold = read_meta(store_dir_of(idx))
    compact_in_place(idx)
    meta = read_meta(store_dir_of(idx))
    # the store folded to ONE generation with exact row accounting
    assert set(meta["generations"]) == {"0"}
    assert meta["gen_offset"] == 0
    assert meta["n_docs"] == pre_fold["n_docs"]

    # post-compaction append: novel doc + a copy of a doc kept by the
    # PRE-compaction append (texts[2] twin keeper) — must still drop
    d2 = str(tmp_path / "post_compact.parquet")
    pq.write_table(
        _pages_like(
            ["https://epoch2.example.com/copy",
             "https://epoch2.example.com/new"],
            [texts[2], "post compaction epoch two novel words content"],
        ),
        d2,
    )
    m2 = append_index_dedup(d2, idx, _cfg(), threshold=0.5)
    assert m2["near_dedup"]["dropped"] == 1
    assert (m2["near_dedup"]["dropped_sample"][0]["url"]
            == "https://epoch2.example.com/copy")
    meta2 = read_meta(store_dir_of(idx))
    # the new generation landed in the store's namespace, not on top
    # of a committed one, and the row accounting is exact
    assert meta2["n_docs"] == m2["n_docs"]
    assert len(meta2["generations"]) == len(meta["generations"]) + 1

    # second compaction epoch: fsck gate passes (it aborted before the
    # fix), the store folds back to one generation, and a dup planted
    # against the epoch-2 keeper still drops
    compact_in_place(idx)
    meta3 = read_meta(store_dir_of(idx))
    assert set(meta3["generations"]) == {"0"}
    assert meta3["n_docs"] == meta2["n_docs"]
    d3 = str(tmp_path / "epoch3.parquet")
    pq.write_table(
        _pages_like(
            ["https://epoch3.example.com/copy"],
            ["post compaction epoch two novel words content"],
        ),
        d3,
    )
    m3 = append_index_dedup(d3, idx, _cfg(), threshold=0.5)
    assert m3["near_dedup"]["dropped"] == 1
    assert read_meta(store_dir_of(idx))["n_docs"] == m3["n_docs"]
    rep = fsck_index(idx, deep=False)
    assert rep["ok"], rep["errors"]


def test_est_jaccard_tracks_true_jaccard(ray_session, base_and_delta, tmp_path):
    """MinHash estimate vs brute-force shingle Jaccard on planted pairs."""
    from zensearch_ray.stages.minhash import shingle_hashes
    from zensearch_ray.stages.sigstore import SigStage, _sigs_to_matrix

    base, delta, urls, texts = base_and_delta
    scfg = SigConfig()
    stage = SigStage(scfg)
    base_texts = pq.read_table(base)["text"].to_pylist()
    pairs = [
        (texts[0], base_texts[3]),   # exact
        (texts[1], base_texts[5]),   # near
        (texts[4], base_texts[7]),   # unrelated
    ]
    for a, b in pairs:
        tbl = _pages_like(["https://x/a", "https://x/b"], [a, b])
        sig = stage(tbl)
        mat = _sigs_to_matrix(sig["sig"], scfg.n_perms)
        est = float((mat[0] == mat[1]).mean())
        sa = set(shingle_hashes(a, scfg.shingle_k).tolist())
        sb = set(shingle_hashes(b, scfg.shingle_k).tolist())
        true_j = len(sa & sb) / max(1, len(sa | sb))
        assert abs(est - true_j) <= 0.15, (est, true_j)


def test_append_dedup_requires_store(ray_session, base_and_delta, tmp_path):
    base, delta, *_ = base_and_delta
    idx = str(tmp_path / "nostore")
    cfg = BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    build_index(base, idx, cfg)
    with pytest.raises(FileNotFoundError, match="sigstore"):
        append_index_dedup(delta, idx, cfg, threshold=0.5)
