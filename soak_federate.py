"""Federated serving at the 10M-page soak scale (BASELINE.md §7).

Round 4 measured single-engine warm serving at 9.9M docs (p50 392 ms
on the worst-case-dense fixture vocabulary) and named doc-sharded
``FederatedEngine`` as the committed path for dense-vocab serving —
without measuring it. This driver closes that: it builds the SAME
union corpus once as one index and once as S doc-shard indexes
(identical file-group boundaries, so the dense ids line up under
cumulative id_ceiling offsets), proves the federated ranking is
BIT-identical to the union engine (the ``test_federate.py`` contract,
here at 10M), then records warm scatter-gather p50/p95 against the
single engine plus the per-shard wire volume per query
(O(terms + k), the number that stays flat as the corpus grows).

Usage:  python soak_federate.py [--pages 10000000] [--shards 4]
Prints one JSON line; record the row in BASELINE.md §7.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np

from soak import StorePeak, _pq_files, rss_mb, spill_stats, stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=10_000_000)
    ap.add_argument("--shards", type=int, default=4,
                    help="doc shards; also the union build's ingest "
                         "wave count so both assign identical dense ids")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--fresh", action="store_true",
                    help="rebuild indexes even if present")
    ap.add_argument("--cleanup", action="store_true",
                    help="delete the index artifacts at exit")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.pipelines.federate import (
        FederatedEngine,
        FederatedService,
    )
    from zensearch_ray.pipelines.query import QueryEngine
    from zensearch_ray.sources.pages import generate_pages_dist
    from zensearch_ray.state.manifest import IndexLayout

    M: dict = {"pages": args.pages, "shards": args.shards,
               "num_cpus": args.cpus}
    QUERIES = ["search engine ranking", "crawler queue merge",
               "posting shard delta", "vector merge sort filter join",
               "hash score group link"]

    root = f"/tmp/zensearch_fedsoak_{args.pages}"
    pages_dir = f"/tmp/zensearch_bench_pages_{args.pages}"
    union_idx = f"{root}/union"
    shard_dirs = [f"{root}/shard{j}" for j in range(args.shards)]

    sampler = StorePeak()
    sampler.start()

    stage(f"corpus fixture ({args.pages} pages)")
    t0 = time.perf_counter()
    generate_pages_dist(pages_dir, args.pages, seed=42, n_shards=64)
    M["gen_sec"] = round(time.perf_counter() - t0, 1)

    cfg = BuildConfig(num_shards=64, salt_subs=8, lang="en",
                      extract_from_html=True)
    files = _pq_files(pages_dir)
    groups = [list(g) for g in np.array_split(np.array(files), args.shards)]

    def _complete(d):
        return IndexLayout(d).is_complete() and not args.fresh

    stage(f"union build ({args.shards} ingest waves)")
    t0 = time.perf_counter()
    if not _complete(union_idx):
        shutil.rmtree(union_idx, ignore_errors=True)
        for i, g in enumerate(groups):
            build_index(g, union_idx, cfg, append=(i > 0))
            print(f"    wave {i + 1}/{len(groups)} done", flush=True)
    M["union_build_sec"] = round(time.perf_counter() - t0, 1)
    uman = IndexLayout(union_idx).read_manifest()
    M["n_docs"] = uman["n_docs"]

    stage(f"{args.shards} doc-shard builds (same file groups)")
    t0 = time.perf_counter()
    scfg = BuildConfig(num_shards=32, salt_subs=4, lang="en",
                       extract_from_html=True)
    for j, (d, g) in enumerate(zip(shard_dirs, groups)):
        if not _complete(d):
            shutil.rmtree(d, ignore_errors=True)
            build_index(g, d, scfg)
        print(f"    shard {j + 1}/{args.shards} done", flush=True)
    M["shard_build_sec"] = round(time.perf_counter() - t0, 1)
    offs, acc = [], 0
    for d in shard_dirs:
        m = IndexLayout(d).read_manifest()
        offs.append(acc)
        acc += int(m["id_ceiling"])
    assert acc == int(uman["id_ceiling"]), (acc, uman["id_ceiling"])

    stage("bit-identity: federated vs union engine")
    union = QueryEngine(union_idx)
    fed = FederatedEngine(shard_dirs, id_offsets=offs)
    assert fed.n_docs == union.n_docs
    assert fed.avgdl == union.avgdl  # bit-equal float
    ok = True
    for q in QUERIES:
        got, want = fed.topk(q, 10), union.topk(q, 10)
        if got != want:
            ok = False
            print(f"    MISMATCH {q!r}: {got[:3]} vs {want[:3]}")
    M["fed_bit_identical"] = ok
    print(f"    bit-identity over {len(QUERIES)} queries: {ok}")

    def _latencies(call):
        for q in QUERIES:
            call(q)  # warm
        lat = []
        for _ in range(args.reps):
            for q in QUERIES:
                t = time.perf_counter()
                call(q)
                lat.append((time.perf_counter() - t) * 1e3)
        a = np.array(lat)
        return (round(float(np.percentile(a, 50)), 2),
                round(float(np.percentile(a, 95)), 2),
                round(float(a.max()), 2))

    stage("single-engine warm serving (the r4 comparison row)")
    p50, p95, mx = _latencies(lambda q: union.topk(q, 10))
    M["single_p50_ms"], M["single_p95_ms"], M["single_max_ms"] = p50, p95, mx
    print(f"    single p50 {p50} ms, p95 {p95} ms")

    stage("federated warm serving (actor scatter-gather)")
    with FederatedService(shard_dirs, id_offsets=offs) as svc:
        assert len(set(svc.shard_pids())) == args.shards
        fp50, fp95, fmx = _latencies(lambda q: svc.topk(q, 10))
        M["fed_p50_ms"], M["fed_p95_ms"], M["fed_max_ms"] = fp50, fp95, fmx
        t0 = time.perf_counter()
        svc.topk_batch([q for q in QUERIES for _ in range(40)], 10)
        M["fed_batch_200_sec"] = round(time.perf_counter() - t0, 3)
    print(f"    federated p50 {fp50} ms, p95 {fp95} ms, "
          f"batch-200 {M['fed_batch_200_sec']}s")

    # per-shard wire volume per query: phase 1 ships the distinct query
    # terms and gets one df int each; phase 2 ships the idf map and gets
    # k (doc_id, score) pairs — O(terms + k), corpus-size-independent
    from zensearch_ray.functions.text import tokenize

    per_q = []
    for q in QUERIES:
        toks = set(tokenize(q))
        req = sum(len(t.encode()) + 8 for t in toks)  # terms + idf floats
        resp = 8 * len(toks) + 16 * 10  # dfs + k (id, score) pairs
        per_q.append(req + resp)
    M["wire_bytes_per_shard_per_query"] = int(np.mean(per_q))

    M["store_peak_mb"] = sampler.peak_mb
    M["spilled_mb"], _ = spill_stats()
    M["driver_peak_rss_mb"] = rss_mb()
    sampler._stop = True
    if args.cleanup:
        shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(M))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
