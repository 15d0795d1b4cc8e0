"""Streaming ingest loop: tail a drop directory and append each new
delta into a live index — the batch-engine closure of the reference's
crawl→store→search loop (``crawler/main.go:84-112`` pushes crawled
pages through the queue into the store, and the search side picks them
up; here, producers rename finished parquet/JSONL files into the drop
directory, each becomes one append generation, and warm serving
replicas pick it up via ``IndexLayout.version_token`` live reload —
``serve --reload-secs`` or ``QueryService(reload_secs=...)``).

Protocol (every step resumable):
  * producers write ``<name>.tmp`` then ``os.replace`` to
    ``<name>.parquet`` / ``<name>.jsonl`` — rename-into-place is the
    commit point (the same data-first convention as ``state/sink``);
    the watcher never looks at ``*.tmp``.
  * each ingested file gets a marker ``_ingested/<name>.json``
    (atomic tmp+rename) AFTER its append commits, so a crashed cycle
    re-runs the same file — ``append_index`` / ``append_index_dedup``
    are marker-committed and converge on re-run.
  * files ingest in sorted-name order, one append generation each, so
    two watchers racing on one drop dir are serialized per file by the
    index's own append locking and the deterministic order.

Scale note: the loop is a DRIVER-side coordinator; every append cycle
is the distributed append pipeline (delta-sized work — the indexed
corpus is never re-read; near-dedup probes only the delta's signature
band partitions).
"""

from __future__ import annotations

import json
import os
import time

_MARKER_DIR = "_ingested"
_EXTS = (".parquet", ".jsonl", ".jsonl.gz", ".warc", ".warc.gz",
         ".csv", ".csv.gz")


def _marker_path(drop_dir: str, name: str) -> str:
    return os.path.join(drop_dir, _MARKER_DIR, name + ".json")


def pending_files(drop_dir: str) -> list[str]:
    """Sorted basenames of committed drop files without an ingest
    marker."""
    try:
        names = os.listdir(drop_dir)
    except FileNotFoundError:
        return []
    out = [
        n for n in names
        if n.endswith(_EXTS) and not os.path.exists(_marker_path(drop_dir, n))
    ]
    return sorted(out)


def ingested_files(drop_dir: str) -> list[str]:
    mdir = os.path.join(drop_dir, _MARKER_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(n[:-5] for n in os.listdir(mdir) if n.endswith(".json"))


def _ingest_tag(path: str) -> str:
    """Identity of one drop file's ingest: name + size + mtime_ns.
    Recorded in the index manifest ATOMICALLY with the append's own
    commit (``manifest_extra``), so whether a given file's append
    landed survives a crash between that commit and the ingest marker
    — without it, the restart re-appended the file's docs as a
    duplicate generation (probed at 916 → 1108 docs)."""
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


def _ingested_tags(index_dir: str) -> list[str]:
    from zensearch_ray.state.manifest import IndexLayout

    try:
        return list(IndexLayout(index_dir).read_manifest().get(
            "ingest_tags", []))
    except FileNotFoundError:
        return []


def _append_one(index_dir: str, path: str, cfg, near_dedup: bool,
                threshold: float) -> dict:
    from zensearch_ray.pipelines.build_index import (
        append_index,
        append_index_dedup,
        build_index,
    )

    from zensearch_ray.sources import resolve_pages_source

    extra = {"ingest_tags": _ingested_tags(index_dir) + [_ingest_tag(path)]}
    source = resolve_pages_source(path)
    if near_dedup:
        return append_index_dedup(source, index_dir, cfg,
                                  threshold=threshold, manifest_extra=extra)
    return build_index(source, index_dir, cfg, append=True,
                       manifest_extra=extra)


def ingest_once(index_dir: str, drop_dir: str, cfg=None,
                near_dedup: bool = True, threshold: float = 0.9) -> list[dict]:
    """Ingest every currently-pending drop file (sorted order, one
    append generation each); returns one summary per ingested file.
    Crash-safe in BOTH windows: the marker lands only after the append
    commits, and the append's own atomic commit records the file's
    ingest tag — so a restart after a committed-but-unmarked append
    skips the file (re-writing just its marker) instead of
    double-appending its docs."""
    from zensearch_ray.pipelines.build_index import BuildConfig

    cfg = cfg or BuildConfig()
    os.makedirs(os.path.join(drop_dir, _MARKER_DIR), exist_ok=True)
    out = []
    for name in pending_files(drop_dir):
        path = os.path.join(drop_dir, name)
        if _ingest_tag(path) in _ingested_tags(index_dir):
            # the append COMMITTED but the crash hit before the marker
            # landed: converge by re-writing the marker only — never
            # re-append (that duplicated the file's docs as an extra
            # generation before the ingest-tag record existed)
            summary = {"file": name, "skipped": "already_ingested"}
        else:
            manifest = _append_one(index_dir, path, cfg, near_dedup,
                                   threshold)
            summary = {
                "file": name,
                "n_docs": manifest.get("n_docs"),
                "n_generations": manifest.get("n_generations"),
                "dropped": manifest.get("near_dedup", {}).get("dropped", 0),
            }
        marker = _marker_path(drop_dir, name)
        with open(marker + ".tmp", "w") as f:
            json.dump(summary, f)
        os.replace(marker + ".tmp", marker)
        out.append(summary)
    return out


def watch(index_dir: str, drop_dir: str, cfg=None, near_dedup: bool = True,
          threshold: float = 0.9, poll_secs: float = 2.0,
          max_cycles: int | None = None, on_cycle=None,
          compact_every: int | None = None, on_compact=None) -> int:
    """Poll ``drop_dir`` forever (or for ``max_cycles`` polls),
    ingesting whatever shows up. Returns the number of files ingested.
    ``on_cycle(summaries)`` fires after every NON-EMPTY cycle (the CLI
    prints; tests observe). ``compact_every=N`` is the LSM policy
    closure: whenever an ingest cycle leaves the index at ≥ N
    generations, ``compact_in_place`` folds them (and purges
    tombstones) and atomically swaps the artifact — a long-running
    watcher's lookup cost stays bounded instead of growing one segment
    fragment per delta; warm replicas pick the swap up through the
    same version-token reload as appends. Restart-safe: the trigger
    reads the manifest's generation count, not watcher state."""
    n_done = 0
    cycles = 0
    while True:
        summaries = ingest_once(index_dir, drop_dir, cfg, near_dedup, threshold)
        if summaries:
            n_done += len(summaries)
            if on_cycle is not None:
                on_cycle(summaries)
            gens = summaries[-1].get("n_generations") or 1
            if compact_every is not None and gens >= compact_every:
                from zensearch_ray.pipelines.compact import compact_in_place

                m = compact_in_place(index_dir)
                if on_compact is not None:
                    on_compact(m)
        cycles += 1
        if max_cycles is not None and cycles >= max_cycles:
            return n_done
        time.sleep(poll_secs)
