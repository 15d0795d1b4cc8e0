#!/usr/bin/env python
"""10M-page end-to-end soak: the next-scale-tier proof.

Drives the full index lifecycle at 10M pages (~5.4 GB html corpus,
~9M en docs) on one node and records the numbers BASELINE.md §7
publishes: build (attrs + sigstore sidecar) → near-dup-aware
watch-append of a 500k delta → in-place compaction → reindex-stem →
alias swap → warm serving — with memory ceiling, object-store
spill, per-partition skew, and warm-query latency, plus an
INDEPENDENT full-scan BM25 referee (two streaming passes over the
raw corpus, urls + scores compared) at the start and end of the
lifecycle.

Usage:  python soak.py [--pages 10000000] [--delta 500000]
        [--cpus 32] [--keep]
Prints one JSON metrics line at the end (and progress lines as it
goes). The corpus fixtures cache across runs; pass --keep to retain
the index dirs for post-mortems.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import resource
import shutil
import threading
import time

import numpy as np
import pyarrow as pa


def stage(name):
    print(f"=== {name}", flush=True)


class StorePeak(threading.Thread):
    """Samples object-store usage (cluster total − available) at 4 Hz;
    `peak_mb` is the high-water mark since the last `reset()`."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0.0
        self._stop = False

    def run(self):
        import ray

        total = ray.cluster_resources().get("object_store_memory", 0.0)
        while not self._stop:
            try:
                avail = ray.available_resources().get(
                    "object_store_memory", total)
                self.peak = max(self.peak, total - avail)
            except Exception:
                pass
            time.sleep(0.25)

    def reset(self):
        self.peak = 0.0

    @property
    def peak_mb(self):
        return round(self.peak / 1e6, 1)


def spill_stats():
    """(spilled_mb, restored_mb) parsed from Ray's memory summary —
    best-effort (0.0 when the summary is unavailable)."""
    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        sp = re.search(r"Spilled (\d+) MiB", s)
        rs = re.search(r"Restored (\d+) MiB", s)
        return (float(sp.group(1)) if sp else 0.0,
                float(rs.group(1)) if rs else 0.0)
    except Exception:
        return 0.0, 0.0


def rss_mb():
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e3, 1)


def _pq_files(paths):
    """Corpus dir(s) → explicit parquet file list (the fixture dirs
    carry a _COMPLETE.json marker that a bare dir-read would trip on)."""
    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        if os.path.isdir(p):
            out += sorted(os.path.join(p, f) for f in os.listdir(p)
                          if f.endswith(".parquet"))
        else:
            out.append(p)
    return out


# ----------------------------------------------------------------- referee
def referee_topk(sources, queries, k=10, stem=False):
    """Independent full-scan BM25 top-k over the RAW corpus (the
    engine's pinned spec recomputed from text alone, no index): pass 1
    streams df/N/sum_dl for the query terms, pass 2 streams per-doc
    scores with per-batch top-k partials. ``sources`` is a list of
    (paths, base_offset) pairs read through the DENSE id reader so the
    referee's ids — and therefore its tie-breaks — are the engine's.
    Returns {query: [(url, round6_score), ...]} ordered
    (score DESC, doc_id ASC) exactly like the engine."""
    from zensearch_ray.functions.bm25 import BM25Params, idf, tf_norm
    from zensearch_ray.functions.text import s_stem, term_frequencies, tokenize
    from zensearch_ray.sources.dense import read_parquet_dense

    def union(columns):
        dss = [read_parquet_dense(_pq_files(p), columns, base_offset=off)
               for p, off in sources]
        ds = dss[0]
        for d in dss[1:]:
            ds = ds.union(d)
        return ds

    params = BM25Params()
    qterms = {}
    for q in queries:
        ts = tokenize(q)
        if stem:
            ts = [s_stem(t) for t in ts]
        qterms[q] = list(dict.fromkeys(ts))
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    tix = {t: i for i, t in enumerate(all_terms)}
    T = len(all_terms)

    def fold(tf):
        if not stem:
            return tf
        out = {}
        for tok, c in tf.items():
            st = s_stem(tok)
            out[st] = out.get(st, 0) + c
        return out

    def pass1(batch: pa.Table) -> pa.Table:
        df = np.zeros(T, dtype=np.int64)
        n = 0
        sdl = 0
        for text, lang in zip(batch["text"].to_pylist(),
                              batch["lang"].to_pylist()):
            if lang != "en":
                continue
            tf = term_frequencies(text)
            n += 1
            sdl += sum(tf.values())
            tf = fold(tf)
            for t in all_terms:
                if t in tf:
                    df[tix[t]] += 1
        return pa.table({"n": pa.array([n], type=pa.int64()),
                         "sdl": pa.array([sdl], type=pa.int64()),
                         "df": pa.array([df.tolist()])})

    parts = union(["text", "lang"]).map_batches(
        pass1, batch_format="pyarrow", batch_size=2048
    ).to_pandas()
    n_docs = int(parts["n"].sum())
    sum_dl = int(parts["sdl"].sum())
    avgdl = sum_dl / n_docs
    df = np.sum(np.stack([np.array(x) for x in parts["df"]]), axis=0)
    idfs = np.array([idf(n_docs, int(d)) for d in df])

    def pass2(batch: pa.Table) -> pa.Table:
        rows_q, rows_u, rows_s, rows_d = [], [], [], []
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        urls = batch["url"].to_pylist()
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tfm = np.zeros((len(texts), T))
        dl = np.zeros(len(texts))
        keep = np.zeros(len(texts), dtype=bool)
        for i, (text, lang) in enumerate(zip(texts, langs)):
            if lang != "en":
                continue
            keep[i] = True
            tf = term_frequencies(text)
            dl[i] = sum(tf.values())
            tf = fold(tf)
            for t, c in tf.items():
                j = tix.get(t)
                if j is not None:
                    tfm[i, j] = c
        for q, ts in qterms.items():
            score = np.zeros(len(texts))
            for t in ts:
                j = tix[t]
                contrib = tf_norm(tfm[:, j], dl, avgdl, params) * idfs[j]
                contrib[tfm[:, j] == 0] = 0.0
                score += contrib
            score[~keep] = -1.0
            top = np.lexsort((dids, -score))[:k]
            for i in top:
                if score[i] > 0:
                    rows_q.append(q)
                    rows_u.append(urls[i])
                    rows_s.append(float(score[i]))
                    rows_d.append(int(dids[i]))
        return pa.table({"q": pa.array(rows_q), "url": pa.array(rows_u),
                         "score": pa.array(rows_s, type=pa.float64()),
                         "doc_id": pa.array(rows_d, type=pa.int64())})

    cand = union(["url", "text", "lang"]).map_batches(
        pass2, batch_format="pyarrow", batch_size=2048
    ).to_pandas()
    out = {}
    for q in queries:
        sub = cand[cand["q"] == q].sort_values(
            ["score", "doc_id"], ascending=[False, True]).head(k)
        out[q] = [(u, round(s, 6))
                  for u, s in zip(sub["url"], sub["score"])]
    return out


def engine_topk_urls(index_dir, query, k=10):
    from zensearch_ray.pipelines.query import QueryEngine, resolve_docs
    from zensearch_ray.state.manifest import IndexLayout

    eng = QueryEngine(index_dir)
    hits = eng.topk(query, k)
    rows = resolve_docs(IndexLayout(index_dir), hits)
    return [(r["url"], round(r["score"], 6)) for r in rows]


def compare_topk(name, ref, got):
    """Score lists must match exactly (round6); urls must match up to
    permutation WITHIN equal-score ties."""
    ok = [s for _, s in ref] == [s for _, s in got]
    if ok:
        from itertools import groupby

        def groups(rows):
            return [sorted(u for u, _ in g)
                    for _, g in groupby(rows, key=lambda r: r[1])]

        ok = groups(ref) == groups(got)
    print(f"    referee[{name}]: {'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        print("      ref:", ref)
        print("      got:", got)
    return bool(ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=10_000_000)
    ap.add_argument("--delta", type=int, default=500_000)
    ap.add_argument("--waves", type=int, default=4,
                    help="ingest the base corpus as this many "
                         "build+append waves: each wave's posting "
                         "exchange must fit the object store (+disk "
                         "spill) — the incremental-generation shape a "
                         "real 100-TB ingest uses, closed by the "
                         "partition-local compaction later in the "
                         "lifecycle")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--store-gb", type=float, default=0.0,
                    help="object store size (GB); 0 = Ray default. On a "
                         "cgroup-capped node leave explicit headroom: "
                         "store + n_cpus×worker-heap must fit the limit")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import ray

    init_kw = {}
    if args.store_gb:
        init_kw["object_store_memory"] = int(args.store_gb * 1e9)
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", **init_kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from zensearch_ray.pipelines.alias import resolve_alias, set_alias
    from zensearch_ray.pipelines.build_index import (
        BuildConfig,
        append_index_dedup,
        build_index,
    )
    from zensearch_ray.pipelines.compact import compact_in_place
    from zensearch_ray.pipelines.query import QueryEngine
    from zensearch_ray.pipelines.reindex import reindex_analyzer
    from zensearch_ray.sources.pages import generate_pages_dist
    from zensearch_ray.state.manifest import IndexLayout

    M: dict = {"pages": args.pages, "delta": args.delta,
               "num_cpus": args.cpus}
    QUERIES = ["search engine ranking", "crawler queue merge",
               "posting shard delta", "vector merge sort filter join",
               "hash score group link"]
    REF_QUERIES = QUERIES[:2]

    root = f"/tmp/zensearch_soak_{args.pages}"
    pages_dir = f"/tmp/zensearch_bench_pages_{args.pages}"
    delta_dir = f"{root}/delta_pages"
    idx = f"{root}/idx"
    stem_idx = f"{root}/idx_stem"
    alias = f"{root}/serving.alias"

    sampler = StorePeak()
    sampler.start()

    stage(f"corpus fixtures ({args.pages} + {args.delta} pages)")
    t0 = time.perf_counter()
    generate_pages_dist(pages_dir, args.pages, seed=42, n_shards=64)
    generate_pages_dist(delta_dir, args.delta, seed=777, n_shards=16)
    M["gen_sec"] = round(time.perf_counter() - t0, 1)
    du = sum(os.path.getsize(os.path.join(pages_dir, f))
             for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    M["corpus_bytes"] = du
    print(f"    corpus {du/1e9:.2f} GB on disk, gen {M['gen_sec']}s")

    stage(f"incremental build ({args.waves} ingest waves, "
          "attrs + sigstore)")
    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(stem_idx, ignore_errors=True)
    sampler.reset()
    cfg = BuildConfig(num_shards=64, salt_subs=8, lang="en",
                      extract_from_html=True, attrs=("lang",),
                      sig_store=True)
    files = _pq_files(pages_dir)
    waves = [list(w) for w in np.array_split(np.array(files), args.waves)]
    t0 = time.perf_counter()
    wave_secs = []
    man = None
    for i, w in enumerate(waves):
        tw = time.perf_counter()
        if i == 0:
            man = build_index(w, idx, cfg)
        else:
            # ingest waves are INITIAL ingest, not a small delta, so
            # the near-dup append (contract: delta ≪ corpus, driver-
            # side signature sliver) is wrong here — plain append +
            # STREAMED signature-store update keeps every stage
            # corpus-scale-safe. The 500k delta stage below exercises
            # the near-dup append within its contract.
            from dataclasses import replace

            from zensearch_ray.pipelines.build_index import load_corpus
            from zensearch_ray.stages import sigstore as ss

            man = build_index(w, idx, cfg, append=True)
            gen = int(man["n_generations"]) - 1
            store = ss.store_dir_of(idx)
            scfg = ss.SigConfig(**ss.read_meta(store)["config"])
            dcfg = replace(cfg, id_col=None, dense_ids=False)
            wave_ds, _, _ = load_corpus(w, dcfg)
            sig_ds = wave_ds.map_batches(
                ss.SigStage, fn_constructor_kwargs={"scfg": scfg},
                batch_format="pyarrow", batch_size=512,
                concurrency=(1, 16),
            )
            ss.append_sig_store(sig_ds, store, gen)
        wave_secs.append(round(time.perf_counter() - tw, 1))
        print(f"    wave {i + 1}/{len(waves)}: {wave_secs[-1]}s, "
              f"{man['n_docs']} docs total", flush=True)
    M["build_sec"] = round(time.perf_counter() - t0, 1)
    M["build_wave_secs"] = wave_secs
    M["build_docs"] = man["n_docs"]
    M["build_docs_per_sec"] = round(man["n_docs"] / M["build_sec"], 1)
    M["posting_mb"] = round(man["total_posting_bytes"] / 1e6, 1)
    M["build_phase_secs"] = man.get("phase_secs")  # last wave's split
    M["cache_tokenized"] = man.get("cache_tokenized")
    pb = [p["posting_bytes"] for p in
          IndexLayout(idx).committed_parts_all_gens()]
    M["partitions"] = len(pb)
    M["part_skew_max_over_mean"] = round(max(pb) / (sum(pb) / len(pb)), 3)
    M["build_store_peak_mb"] = sampler.peak_mb
    M["build_spilled_mb"], _ = spill_stats()
    print(f"    {M['build_sec']}s, {M['build_docs_per_sec']} docs/s, "
          f"{M['posting_mb']} MB postings, skew {M['part_skew_max_over_mean']}, "
          f"store peak {M['build_store_peak_mb']} MB, "
          f"spilled {M['build_spilled_mb']} MB")

    stage("referee: full-scan BM25 vs engine (base build)")
    t0 = time.perf_counter()
    ref = referee_topk([(pages_dir, 0)], REF_QUERIES)
    M["referee_base_sec"] = round(time.perf_counter() - t0, 1)
    M["referee_base_match"] = all(
        compare_topk(q, ref[q], engine_topk_urls(idx, q))
        for q in REF_QUERIES
    )

    stage("near-dup-aware append (sigstore) of the delta")
    sampler.reset()
    t0 = time.perf_counter()
    aman = append_index_dedup(delta_dir, idx, cfg, threshold=0.9)
    M["append_sec"] = round(time.perf_counter() - t0, 1)
    M["append_dropped_neardups"] = aman["near_dedup"]["dropped"]
    M["append_store_peak_mb"] = sampler.peak_mb
    M["docs_after_append"] = aman["n_docs"]
    print(f"    {M['append_sec']}s, +{aman['n_docs'] - man['n_docs']} docs, "
          f"{M['append_dropped_neardups']} near-dups dropped")

    pre_compact = {q: engine_topk_urls(idx, q) for q in QUERIES}

    stage("compact (generation merge, in place)")
    sampler.reset()
    t0 = time.perf_counter()
    compact_in_place(idx)
    M["compact_sec"] = round(time.perf_counter() - t0, 1)
    M["compact_store_peak_mb"] = sampler.peak_mb
    M["compact_invariant"] = all(
        pre_compact[q] == engine_topk_urls(idx, q) for q in QUERIES
    )
    print(f"    {M['compact_sec']}s, results invariant: "
          f"{M['compact_invariant']}")

    stage("reindex → stem analyzer (postings-only migration)")
    sampler.reset()
    t0 = time.perf_counter()
    reindex_analyzer(idx, stem_idx, BuildConfig(
        num_shards=64, salt_subs=8, lang="en", extract_from_html=True,
        attrs=("lang",), stem=True))
    M["reindex_sec"] = round(time.perf_counter() - t0, 1)
    M["reindex_store_peak_mb"] = sampler.peak_mb
    print(f"    {M['reindex_sec']}s")

    stage("alias swap + warm serving")
    set_alias(alias, idx)
    set_alias(alias, stem_idx)  # the swap
    serving = resolve_alias(alias)
    assert serving == stem_idx
    eng = QueryEngine(serving)
    for q in QUERIES:
        eng.topk(q, 10)  # warm
    lat = []
    for _ in range(30):
        for q in QUERIES:
            t0 = time.perf_counter()
            eng.topk(q, 10)
            lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.array(lat)
    M["serve_p50_ms"] = round(float(np.percentile(lat, 50)), 2)
    M["serve_p95_ms"] = round(float(np.percentile(lat, 95)), 2)
    M["serve_max_ms"] = round(float(lat.max()), 2)
    print(f"    warm latency p50 {M['serve_p50_ms']} ms, "
          f"p95 {M['serve_p95_ms']} ms over {len(lat)} calls")

    stage("referee: full-scan stemmed BM25 vs served engine "
          "(post append+compact+reindex+swap)")
    t0 = time.perf_counter()
    ref2 = referee_topk(
        [(pages_dir, 0), (delta_dir, int(man["id_ceiling"]))],
        REF_QUERIES, stem=True)
    M["referee_final_sec"] = round(time.perf_counter() - t0, 1)
    M["referee_final_match"] = all(
        compare_topk(q, ref2[q], engine_topk_urls(serving, q))
        for q in REF_QUERIES
    )

    M["driver_peak_rss_mb"] = rss_mb()
    M["spilled_total_mb"], M["restored_total_mb"] = spill_stats()
    sampler._stop = True

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)

    ray.shutdown()
    print(json.dumps(M))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
