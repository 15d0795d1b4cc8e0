"""Endurance soak of the watch/auto-compact ingest loop (BASELINE §7).

The 10M soak proved ONE append + compact; a real ingest runs for days.
This driver builds a 1M-page base index, then drives ``watch`` over
~20 successive 50k-page deltas through a drop directory with
``compact_every=N`` auto-compaction, asserting the long-run
invariants the single-shot soak can't see:

  * generation count stays BOUNDED (the LSM closure actually folds);
  * near-dup detection keeps working ACROSS compactions — each delta
    plants content copies of a delta ingested two cycles earlier
    (often behind a compaction boundary), which the sigstore append
    must still drop;
  * warm serving replicas reload EVERY generation and every
    compaction swap (``QueryService.refresh`` reports per-replica
    reloads; a standing query keeps answering throughout);
  * per-delta wall time and warm latency stay FLAT — no creep from
    accumulated generations, tombstones, or sigstore growth.

Usage: python soak_watch.py [--base 1000000] [--deltas 20]
Prints one JSON line; record the row in BASELINE.md §7.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np
import pyarrow.parquet as pq

from soak import StorePeak, _pq_files, rss_mb, spill_stats, stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1_000_000)
    ap.add_argument("--delta", type=int, default=50_000)
    ap.add_argument("--deltas", type=int, default=20)
    ap.add_argument("--plant", type=int, default=500,
                    help="content near-dups planted per delta, copied "
                         "from the delta TWO cycles earlier")
    ap.add_argument("--compact-every", type=int, default=4)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.pipelines.service import QueryService
    from zensearch_ray.pipelines.watch import watch
    from zensearch_ray.sources.pages import (
        generate_pages_dist,
        generate_pages_table,
    )
    from zensearch_ray.state.manifest import IndexLayout

    M: dict = {"base": args.base, "delta": args.delta,
               "deltas": args.deltas, "plant": args.plant,
               "compact_every": args.compact_every, "num_cpus": args.cpus}
    QUERIES = ["search engine ranking", "crawler queue merge",
               "posting shard delta"]

    root = f"/tmp/zensearch_watchsoak_{args.base}"
    pages_dir = f"/tmp/zensearch_bench_pages_{args.base}"
    idx = f"{root}/idx"
    drop = f"{root}/drop"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(drop)

    sampler = StorePeak()
    sampler.start()

    stage(f"base build ({args.base} pages, sigstore)")
    generate_pages_dist(pages_dir, args.base, seed=42, n_shards=64)
    cfg = BuildConfig(num_shards=32, salt_subs=4, lang="en",
                      extract_from_html=True, attrs=("lang",),
                      sig_store=True)
    t0 = time.perf_counter()
    man = build_index(_pq_files(pages_dir), idx, cfg)
    M["base_build_sec"] = round(time.perf_counter() - t0, 1)
    M["base_docs"] = man["n_docs"]
    print(f"    {M['base_build_sec']}s, {man['n_docs']} docs")

    def delta_table(i: int, offset_slot: int | None = None):
        """Delta i's pages: fresh urls, deterministic content. With
        ``offset_slot`` the CONTENT of delta ``offset_slot`` is reused
        under new urls (row_offset shifts urls/ts only) — a planted
        content near-dup set."""
        slot = i if offset_slot is None else offset_slot
        n = args.delta if offset_slot is None else args.plant
        return generate_pages_table(
            n, seed=1000 + slot,
            row_offset=args.base + i * (args.delta + args.plant)
            + (0 if offset_slot is None else args.delta),
        )

    svc = QueryService(idx, replicas=2, k=10)
    for q in QUERIES:
        svc.search(q)

    layout = IndexLayout(idx)
    series = {k: [] for k in
              ["ingest_sec", "gens_after", "dropped", "reloaded",
               "warm_p50_ms", "compacted", "store_peak_mb"]}
    n_compacts = 0
    planted_checked = 0

    stage(f"{args.deltas} watch cycles (compact_every="
          f"{args.compact_every})")
    for i in range(args.deltas):
        import pyarrow as pa

        tbl = delta_table(i)
        if i >= 2:  # plant content copies of delta i-2
            tbl = pa.concat_tables([tbl, delta_table(i, offset_slot=i - 2)])
            planted_checked += 1
        tmp = os.path.join(drop, f"delta-{i:03d}.parquet.tmp")
        pq.write_table(tbl, tmp, row_group_size=4096)
        os.replace(tmp, os.path.join(drop, f"delta-{i:03d}.parquet"))

        sampler.reset()
        compacted = []
        t0 = time.perf_counter()
        watch(idx, drop, cfg, near_dedup=True, threshold=0.9,
              poll_secs=0.0, max_cycles=1,
              compact_every=args.compact_every,
              on_compact=lambda m: compacted.append(m))
        dt = time.perf_counter() - t0

        gens = int(layout.read_manifest().get("n_generations", 1))
        marker = json.load(open(
            os.path.join(drop, "_ingested", f"delta-{i:03d}.parquet.json")))
        reloaded = svc.refresh()
        lat = []
        for _ in range(10):
            for q in QUERIES:
                t1 = time.perf_counter()
                svc.search(q)
                lat.append((time.perf_counter() - t1) * 1e3)

        series["ingest_sec"].append(round(dt, 1))
        series["gens_after"].append(gens)
        series["dropped"].append(int(marker["dropped"]))
        series["reloaded"].append(all(reloaded))
        series["warm_p50_ms"].append(
            round(float(np.percentile(lat, 50)), 2))
        series["compacted"].append(bool(compacted))
        series["store_peak_mb"].append(sampler.peak_mb)
        n_compacts += len(compacted)
        print(f"    delta {i + 1}/{args.deltas}: {dt:.1f}s, "
              f"gens={gens}, dropped={marker['dropped']}, "
              f"compacted={bool(compacted)}, reload={all(reloaded)}, "
              f"p50={series['warm_p50_ms'][-1]}ms", flush=True)

        # invariants, checked EVERY cycle
        assert gens <= args.compact_every, (i, gens)
        assert all(reloaded), (i, reloaded)
        if i >= 2:
            # ~90% of planted rows survive the en filter into the
            # dedup probe; organic near-dups only add to the count
            assert marker["dropped"] >= int(args.plant * 0.8), (
                i, marker["dropped"])

    M["series"] = series
    M["n_compacts"] = n_compacts
    M["final_docs"] = int(layout.read_manifest()["n_docs"])
    M["planted_cycles_verified"] = planted_checked
    # flatness: the last 5 deltas must not run materially slower than
    # deltas 3-7 (allow 2x for sandbox noise)
    early = float(np.median(series["ingest_sec"][2:7]))
    late = float(np.median(series["ingest_sec"][-5:]))
    M["ingest_flatness_late_over_early"] = round(late / early, 2)
    M["warm_p50_flatness"] = round(
        float(np.median(series["warm_p50_ms"][-5:]))
        / float(np.median(series["warm_p50_ms"][2:7])), 2)
    M["spilled_mb"], _ = spill_stats()
    M["driver_peak_rss_mb"] = rss_mb()
    svc.shutdown()
    sampler._stop = True
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(M))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
