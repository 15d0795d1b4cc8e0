"""``ray job submit``-able CLI (SURVEY.md §3.3): build / query / resume.

    python -m zensearch_ray build --input PAGES_DIR --output INDEX_DIR \
        [--shards 64] [--salt-subs 8] [--lang en] [--extract-html] [--id-col COL]
    python -m zensearch_ray query --index INDEX_DIR "search terms" \
        [-k 10] [--mode exhaustive|pruned|and] [--urls]

Owns the Ray session ONLY when none exists (``ray job submit`` and the
test driver both initialise Ray themselves; library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _syn_pairs_of(args) -> tuple:
    path = getattr(args, "fold_synonyms", None)
    if not path:
        return ()
    with open(path) as f:
        table = json.load(f)
    return tuple(sorted((str(k), str(v)) for k, v in table.items()))


def _cfg_of(args):
    """BuildConfig from the shared config flags (build and watch take
    the same set — an append must match the original build config, so
    the watch loop asks for it the same way ``build --append`` does)."""
    from zensearch_ray.pipelines.build_index import BuildConfig

    return BuildConfig(
        num_shards=args.shards,
        salt_subs=args.salt_subs,
        lang=args.lang if args.lang != "any" else None,
        extract_from_html=args.extract_html,
        dedup_urls=args.dedup_urls,
        id_col=args.id_col,
        positions=args.positions,
        attrs=tuple(args.attrs),
        title_boost=args.title_boost,
        stopwords=tuple(s for s in args.stopwords.split(",") if s),
        stem=args.stem,
        synonyms=_syn_pairs_of(args),
        sig_store=args.sigstore,
    )


def cmd_build(args) -> int:
    from zensearch_ray.pipelines.build_index import build_index
    from zensearch_ray.sources import resolve_pages_source

    _ensure_ray()
    cfg = _cfg_of(args)
    source = resolve_pages_source(args.input)
    if args.near_dedup:
        from zensearch_ray.pipelines.build_index import append_index_dedup

        if not args.append:
            raise SystemExit("--near-dedup requires --append")
        manifest = append_index_dedup(
            source, args.output, cfg, threshold=args.dedup_threshold
        )
    else:
        manifest = build_index(source, args.output, cfg, append=args.append)
    print(json.dumps(manifest))
    return 0


def cmd_query(args) -> int:
    from zensearch_ray.pipelines.alias import resolve_if_alias
    from zensearch_ray.pipelines.query import QueryEngine, resolve_docs

    engine = QueryEngine(resolve_if_alias(args.index))
    mode = args.mode or "pruned"
    if args.similarity and args.similarity != "bm25":
        # the ranking function swaps without re-indexing; exhaustive
        # only (block-max bounds are BM25-specific, so pruned/and
        # would silently serve a different strategy)
        if args.mode not in (None, "exhaustive"):
            raise SystemExit("--similarity serves exhaustive mode only")
        for q in args.query:
            hits = engine.topk_sim(q, args.k, similarity=args.similarity)
            rows = (
                resolve_docs(engine.layout, hits)
                if args.urls
                else [
                    {"rank": i + 1, "doc_id": d, "score": s}
                    for i, (d, s) in enumerate(hits)
                ]
            )
            print(json.dumps(
                {"query": q, "similarity": args.similarity, "results": rows}
            ))
        return 0
    for q in args.query:
        if args.explain is not None:
            if args.mode not in (None, "exhaustive"):
                raise SystemExit("--explain serves exhaustive mode only")
            doc = int(args.explain) if args.explain != "" else None
            rows = engine.explain(q, k=args.k, doc_id=doc)
            print(json.dumps({"query": q, "explain": rows}))
            continue
        if args.facets:
            counts = engine.facet_counts(q, args.facets)
            print(json.dumps({"query": q, "facet": args.facets,
                              "counts": [{"value": v, "n_docs": c} for v, c in counts]}))
            continue
        if args.collapse:
            # field collapse is exhaustive by design (the collapse may
            # dig arbitrarily deep into the ranking)
            if args.mode not in (None, "exhaustive"):
                raise SystemExit("--collapse serves exhaustive mode only")
            col, _, per = args.collapse.partition("=")
            hits = engine.topk_collapsed(q, col, int(per) if per else 1, args.k)
            rows = (
                resolve_docs(engine.layout, hits)
                if args.urls
                else [
                    {"rank": i + 1, "doc_id": d, "score": s}
                    for i, (d, s) in enumerate(hits)
                ]
            )
            print(json.dumps({"query": q, "collapse": args.collapse, "results": rows}))
            continue
        if args.synonyms:
            if args.mode not in (None, "exhaustive"):
                raise SystemExit("--synonyms serves exhaustive mode only")
            with open(args.synonyms) as f:
                syn = json.load(f)
            hits = engine.topk_synonyms(q, syn, args.k)
            rows = (
                resolve_docs(engine.layout, hits)
                if args.urls
                else [
                    {"rank": i + 1, "doc_id": d, "score": s}
                    for i, (d, s) in enumerate(hits)
                ]
            )
            print(json.dumps({"query": q, "results": rows}))
            continue
        if args.range:
            if args.mode not in (None, "exhaustive"):
                raise SystemExit("--range serves exhaustive mode only")
            col, _, window = args.range.partition("=")
            lo, _, hi = window.partition(":")
            if not lo or not hi:
                raise SystemExit("--range expects col=lo:hi")
            hits = engine.topk_range(q, col, float(lo), float(hi), args.k)
            rows = (
                resolve_docs(engine.layout, hits)
                if args.urls
                else [
                    {"rank": i + 1, "doc_id": d, "score": s}
                    for i, (d, s) in enumerate(hits)
                ]
            )
            print(json.dumps({"query": q, "range": args.range, "results": rows}))
            continue
        if args.filter:
            # filtered search is exhaustive by design (pruning needs
            # per-facet bounds); reject an EXPLICIT conflicting mode
            # instead of silently serving a different strategy
            if args.mode not in (None, "exhaustive"):
                raise SystemExit("--filter serves exhaustive mode only")
            col, _, value = args.filter.partition("=")
            if not value:
                raise SystemExit("--filter expects col=value")
            hits = engine.topk_filtered(q, col, value, args.k)
            rows = (
                resolve_docs(engine.layout, hits)
                if args.urls
                else [
                    {"rank": i + 1, "doc_id": d, "score": s}
                    for i, (d, s) in enumerate(hits)
                ]
            )
            print(json.dumps({"query": q, "filter": args.filter, "results": rows}))
            continue
        if args.fvf:
            # function_score/field_value_factor is exhaustive by design
            # (the factor can promote any matching doc into the top-k,
            # so BM25-only pruning bounds don't hold)
            if args.mode not in (None, "exhaustive"):
                raise SystemExit("--fvf serves exhaustive mode only")
            hits = engine.topk_fvf(q, args.fvf, args.k)
            rows = (
                resolve_docs(engine.layout, hits)
                if args.urls
                else [
                    {"rank": i + 1, "doc_id": d, "score": s}
                    for i, (d, s) in enumerate(hits)
                ]
            )
            print(json.dumps({"query": q, "fvf": args.fvf, "results": rows}))
            continue
        if args.rescore_phrase:
            if args.mode not in (None, "exhaustive"):
                raise SystemExit("--rescore-phrase serves exhaustive mode only")
            hits = engine.topk_rescored(
                q, args.rescore_phrase, k=args.k, window=args.rescore_window
            )
            rows = (
                resolve_docs(engine.layout, hits)
                if args.urls
                else [
                    {"rank": i + 1, "doc_id": d, "score": s}
                    for i, (d, s) in enumerate(hits)
                ]
            )
            print(json.dumps({
                "query": q, "rescore_phrase": args.rescore_phrase,
                "results": rows,
            }))
            continue
        # ONE mode→strategy map for both output shapes, so --urls can
        # never silently serve a different strategy or drop --msm/--tie
        # (it used to route through topk_docs' smaller map)
        fn = {
            "exhaustive": engine.topk,
            "pruned": engine.topk_pruned,
            "and": engine.topk_and,
            "phrase": engine.topk_phrase,
            "phrase_prefix": engine.topk_phrase_prefix,
            "near": lambda qq, kk: engine.topk_near(qq, args.window, kk),
            "seq": lambda qq, kk: engine.topk_seq(qq, args.window, kk),
            "prefix": engine.topk_prefix,
            "fuzzy": lambda qq, kk: engine.topk_fuzzy(
                qq, kk, max_dist=args.fuzzy_dist
            ),
            "not": engine.topk_not,
            "bool": engine.topk_bool,
            "wildcard": engine.topk_wildcard,
            "regex": engine.topk_regex,
            "boosted": engine.topk_boosted,
            "msm": lambda qq, kk: engine.topk_msm(
                qq, kk, min_should_match=args.msm
            ),
            "dismax": lambda qq, kk: engine.topk_dismax(
                qq, kk, tie=args.tie
            ),
            "bmw": engine.topk_bmw,
            "spanfirst": lambda qq, kk: engine.topk_spanfirst(
                qq, args.first_n, kk
            ),
        }[mode]
        if args.negative is not None:
            if mode not in ("exhaustive", "pruned"):
                raise SystemExit("--negative serves the bm25 union modes only")
            fn = lambda qq, kk: engine.topk_boosting(  # noqa: E731
                qq, args.negative, kk, negative_boost=args.negative_boost
            )
        if args.decay is not None:
            if mode not in ("exhaustive", "pruned"):
                raise SystemExit("--decay serves the bm25 union modes only")
            fn = lambda qq, kk: engine.topk_decay(  # noqa: E731
                qq, "doc_len", args.decay, args.origin, args.scale,
                args.offset, args.decay_rate, kk,
            )
        if args.random_seed is not None:
            if mode not in ("exhaustive", "pruned"):
                raise SystemExit("--random-seed serves the bm25 union modes only")
            fn = lambda qq, kk: engine.topk_random(  # noqa: E731
                qq, args.random_seed, kk
            )
        if args.after is not None:
            if mode not in ("exhaustive", "pruned"):
                raise SystemExit("--after serves the bm25 union modes only")
            score_s, _, doc_s = args.after.partition(",")
            fn = lambda qq, kk: engine.topk_after(  # noqa: E731
                qq, kk, after=(float(score_s), int(doc_s))
            )
        hits = fn(q, args.k)
        rows = (
            resolve_docs(engine.layout, hits)
            if args.urls
            else [
                {"rank": i + 1, "doc_id": d, "score": s}
                for i, (d, s) in enumerate(hits)
            ]
        )
        print(json.dumps({"query": q, "results": rows}))
    return 0


def cmd_suggest(args) -> int:
    from zensearch_ray.pipelines.query import QueryEngine

    engine = QueryEngine(args.index)
    for q in args.query:
        rows = [
            {"token": t, "suggestion": s, "df": d}
            for t, s, d in engine.suggest(q)
        ]
        print(json.dumps({"query": q, "suggestions": rows}))
    return 0


def cmd_complete(args) -> int:
    from zensearch_ray.pipelines.query import QueryEngine

    engine = QueryEngine(args.index)
    for p in args.prefix:
        rows = [
            {"term": t, "df": d} for t, d in engine.autocomplete(p, args.k)
        ]
        print(json.dumps({"prefix": p, "completions": rows}))
    return 0


def cmd_snapshot(args) -> int:
    """Verified atomic snapshot of a committed index (fsck first,
    tmp+rename publish, file inventory in SNAPSHOT.json)."""
    from zensearch_ray.pipelines.snapshot import snapshot_index

    m = snapshot_index(args.index, args.out)
    print(
        json.dumps(
            {
                "snapshot": args.out,
                "n_files": m["n_files"],
                "total_bytes": m["total_bytes"],
                "version_token": m["version_token"],
            }
        )
    )
    return 0


def cmd_restore(args) -> int:
    """Restore a snapshot into a fresh index dir (inventory +
    metadata-fsck verified before use)."""
    from zensearch_ray.pipelines.snapshot import restore_index

    print(json.dumps(restore_index(args.snapshot, args.out)))
    return 0


def cmd_significant(args) -> int:
    """Significant-terms aggregation ("related searches"): terms
    over-represented in the query's matching docs vs the corpus —
    a distributed scan over the committed segments (analytics-grade,
    not warm-serving; see pipelines/export.py:significant_terms)."""
    from zensearch_ray.pipelines.export import significant_terms

    df = significant_terms(
        args.index, " ".join(args.query), k=args.k, min_fg_df=args.min_fg_df
    )
    print(
        json.dumps(
            {
                "query": " ".join(args.query),
                "significant": df.to_dict(orient="records"),
            }
        )
    )
    return 0


def cmd_batch(args) -> int:
    """Offline bulk scoring job: a queries file (one query per line, or
    a parquet with query_id/query columns) streams through the warm
    `QueryScorer` actor pool; ranked results land as parquet. The
    `ray job submit` shape for scoring millions of queries against a
    built index."""
    import ray.data as rd

    from zensearch_ray.pipelines.query import QueryScorer

    _ensure_ray()
    if args.queries.endswith(".parquet"):
        qds = rd.read_parquet(args.queries, columns=["query_id", "query"])
    else:
        with open(args.queries) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        qds = rd.from_items(
            [{"query_id": i, "query": q} for i, q in enumerate(lines)]
        )
    out = qds.map_batches(
        QueryScorer,
        fn_constructor_kwargs={
            "index_dir": args.index, "k": args.k,
            "mode": args.mode, "window": args.window,
        },
        batch_format="pyarrow",
        batch_size=args.batch_size,
        concurrency=args.concurrency,
    )
    out.write_parquet(args.output)
    print(json.dumps({"queries": qds.count(), "output": args.output}))
    return 0


def cmd_prep(args) -> int:
    from zensearch_ray.pipelines.prep import prep_corpus
    from zensearch_ray.sources import resolve_pages_source

    _ensure_ray()
    stats = prep_corpus(
        resolve_pages_source(args.input),
        args.output,
        lang=args.lang if args.lang != "any" else None,
        extract_from_html=args.extract_html,
        min_tokens=args.min_tokens,
        max_stop_ratio=args.max_stop_ratio,
        chunk_tokens=args.chunk_tokens,
        n_partitions=args.partitions,
        canonical_dedup=args.canonical_dedup,
        gopher=args.gopher,
        repetition=args.repetition,
        exact_substr=args.exact_substr,
    )
    print(json.dumps(stats))
    return 0


def cmd_compact(args) -> int:
    from zensearch_ray.pipelines.compact import compact_index

    _ensure_ray()
    manifest = compact_index(args.index, args.output)
    print(json.dumps(manifest))
    return 0


def cmd_alias(args) -> int:
    """Atomic serving cutover: point a stable alias file at a committed
    index (``pipelines/alias``). Warm replicas (serve/http) pick a swap
    up on their live-reload tick — the zero-downtime half of
    ``reindex``."""
    from zensearch_ray.pipelines.alias import resolve_alias, set_alias

    if args.set:
        rec = set_alias(args.path, args.set)
        print(json.dumps(rec))
    else:
        print(json.dumps({"index_dir": resolve_alias(args.path)}))
    return 0


def cmd_reindex(args) -> int:
    """Analyzer migration from the committed index's own postings —
    see ``pipelines/reindex.reindex_analyzer`` (the corpus text is
    never read; equivalence with a from-corpus build is pinned in
    ``tests/test_reindex.py``)."""
    from zensearch_ray.pipelines.build_index import BuildConfig
    from zensearch_ray.pipelines.reindex import reindex_analyzer

    _ensure_ray()
    cfg = BuildConfig(
        num_shards=args.shards,
        salt_subs=args.salt_subs,
        stem=args.stem,
        stopwords=tuple(s for s in args.stopwords.split(",") if s),
        synonyms=_syn_pairs_of(args),
        positions=args.positions,
        attrs=tuple(args.attrs),
    )
    manifest = reindex_analyzer(args.index, args.output, cfg)
    print(json.dumps(manifest))
    return 0


def cmd_vcompact(args) -> int:
    from zensearch_ray.pipelines.vector import compact_vector_index

    _ensure_ray()
    manifest = compact_vector_index(args.index, args.output)
    print(json.dumps(manifest))
    return 0


def cmd_merge(args) -> int:
    from zensearch_ray.pipelines.compact import merge_indexes

    _ensure_ray()
    manifest = merge_indexes(args.a, args.b, args.output)
    print(json.dumps(manifest))
    return 0


def cmd_delete(args) -> int:
    """Tombstone documents (by url and/or doc_id); physically purged by
    the next `compact` (which also recomputes exact corpus stats)."""
    from zensearch_ray.pipelines.delete import delete_docs

    urls = list(args.urls or [])
    if args.urls_file:
        with open(args.urls_file) as f:
            urls.extend(ln.strip() for ln in f if ln.strip())
    summary = delete_docs(args.index, doc_ids=args.ids or None, urls=urls or None)
    print(json.dumps(summary))
    return 0


def cmd_sort(args) -> int:
    """Range-partitioned distributed sort of a parquet table by one
    column → part_{id:05d}.parquet files whose name-order concatenation
    is globally sorted (see ``pipelines/sort.py``)."""
    import ray.data as rd

    from zensearch_ray.pipelines.sort import sorted_export

    _ensure_ray()
    ds = rd.read_parquet(args.input)
    manifest = sorted_export(
        ds, args.col, args.output, n_parts=args.parts,
        spread_ties=args.spread_ties,
    )
    print(json.dumps({
        "parts": int(len(manifest)),
        "rows": int(manifest["n_rows"].sum()) if len(manifest) else 0,
        "max_part_rows": (
            int(manifest["n_rows"].max()) if len(manifest) else 0
        ),
    }))
    return 0


def cmd_export(args) -> int:
    """Decode the committed segments into columnar (term, doc_id, tf,
    dl) parquet — the interop/integrity inverse of the build's encode
    (see ``pipelines/export.py``)."""
    from zensearch_ray.pipelines.export import export_postings

    _ensure_ray()
    print(json.dumps(export_postings(args.index, args.output)))
    return 0


def cmd_frontier(args) -> int:
    """Crawl-frontier delta: harvest links from a stored-pages parquet
    (html column), canonicalize, anti-join against the index's docmeta
    URL set, cap per host, write (host, url) parquet — the batch
    replay of the reference's page-navigator link walk
    (``crawler/internal/crawler/page_navigator.go:93-218``)."""
    from zensearch_ray.pipelines.frontier import frontier_from_pages

    _ensure_ray()
    out = frontier_from_pages(
        args.pages, args.index, cap=args.cap,
        same_host_only=args.same_host_only,
    )
    out.write_parquet(args.output)
    import pyarrow.parquet as _pq

    n = _pq.ParquetDataset(args.output).read(columns=["url"]).num_rows
    print(json.dumps({"frontier_urls": int(n), "output": args.output}))
    return 0


def cmd_percolate(args) -> int:
    """Batch reverse search: match a standing boolean-query registry
    (JSON {query_id: expression}) against a document parquet; sparse
    (doc_id, query_id) matches land as parquet — the alerting job."""
    import ray.data as rd

    from zensearch_ray.stages.percolate import percolate

    _ensure_ray()
    with open(args.queries) as f:
        registry = json.load(f)
    docs = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    out = percolate(docs, registry)
    out.write_parquet(args.output)
    print(json.dumps({"queries": len(registry), "output": args.output}))
    return 0


def cmd_diff(args) -> int:
    """Operational index diff: document/vocabulary/posting deltas
    between two indexes — the sanity check before swapping serving to
    a rebuilt or compacted index. Metadata-scale only (docmeta ids +
    term dictionaries + manifests); postings are never decoded."""
    import numpy as np
    import pyarrow.parquet as pq_

    from zensearch_ray.pipelines.query import QueryEngine
    from zensearch_ray.state.manifest import IndexLayout

    def doc_ids(layout):
        t = pq_.ParquetDataset(layout.docmeta_dir).read(columns=["doc_id"])
        return np.unique(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))

    a, b = IndexLayout(args.a), IndexLayout(args.b)
    ids_a, ids_b = doc_ids(a), doc_ids(b)
    vocab_a = set(QueryEngine(args.a)._all_terms())
    vocab_b = set(QueryEngine(args.b)._all_terms())
    ma, mb = a.read_manifest(), b.read_manifest()
    print(json.dumps({
        "docs_only_a": int(len(np.setdiff1d(ids_a, ids_b, assume_unique=True))),
        "docs_only_b": int(len(np.setdiff1d(ids_b, ids_a, assume_unique=True))),
        "docs_common": int(len(np.intersect1d(ids_a, ids_b, assume_unique=True))),
        "terms_only_a": len(vocab_a - vocab_b),
        "terms_only_b": len(vocab_b - vocab_a),
        "terms_common": len(vocab_a & vocab_b),
        "postings_a": ma.get("total_postings"),
        "postings_b": mb.get("total_postings"),
        "avgdl_a": ma.get("avgdl"),
        "avgdl_b": mb.get("avgdl"),
        "config_fp_match": ma.get("config_fp") == mb.get("config_fp"),
    }))
    return 0


def cmd_vbuild(args) -> int:
    """Build (or resume) the persisted IVF vector index (see
    ``pipelines/vector.py``)."""
    from zensearch_ray.pipelines.vector import build_vector_index

    _ensure_ray()
    manifest = build_vector_index(
        args.input, args.output,
        n_lists=args.lists, n_partitions=args.partitions,
        id_col=args.id_col, emb_col=args.emb_col, append=args.append,
        quant="sq8" if args.sq8 else None,
    )
    print(json.dumps(manifest))
    return 0


def cmd_vquery(args) -> int:
    """Query the persisted vector index with a probe vector taken from
    a parquet row (``--probe-parquet FILE --probe-id N``)."""
    import numpy as np
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.vector import VectorIndex

    vi = VectorIndex(args.index)
    probe = pq.read_table(
        args.probe_parquet,
        columns=[vi.id_col, vi.emb_col],
        filters=[(vi.id_col, "==", args.probe_id)],
    )[vi.emb_col].to_pylist()
    if not probe:
        raise SystemExit(f"probe id {args.probe_id} not in {args.probe_parquet}")
    ids, sims = vi.search(np.asarray(probe[0]), k=args.k, nprobe=args.nprobe)
    print(json.dumps({
        "probe_id": args.probe_id,
        "results": [
            {"rank": i + 1, "vec_id": int(d), "sim": float(s)}
            for i, (d, s) in enumerate(zip(ids, sims))
        ],
    }))
    return 0


def cmd_fsck(args) -> int:
    """Integrity check (pipelines/fsck.py); exit 1 on any error."""
    from zensearch_ray.pipelines.fsck import fsck_index

    if not args.fast:
        _ensure_ray()
    report = fsck_index(args.index, deep=not args.fast)
    n_err = len(report["errors"])
    report["errors"] = report["errors"][: args.max_errors]
    report["n_errors"] = n_err
    print(json.dumps(report))
    return 0 if report["ok"] else 1


def cmd_stats(args) -> int:
    """Index introspection: the global manifest plus the per-partition
    lineage metrics the build emitted (postings, bytes, build/sort/
    encode seconds, postings/sec) — the north_star's "per-partition
    throughput and posting-bytes metrics", surfaced."""
    import numpy as np

    from zensearch_ray.state.manifest import IndexLayout

    layout = IndexLayout(args.index)
    manifest = layout.read_manifest()
    parts = layout.committed_parts_all_gens()
    out = {"manifest": manifest}
    if parts:
        def col(k):
            return np.array([p.get(k) or 0 for p in parts], dtype=np.float64)

        bytes_ = col("posting_bytes")
        pps = col("postings_per_sec")
        out["partitions"] = {
            "n": len(parts),
            "posting_bytes": {
                "total": int(bytes_.sum()),
                "min": int(bytes_.min()),
                "p50": int(np.percentile(bytes_, 50)),
                "max": int(bytes_.max()),
                "skew_max_over_p50": round(
                    float(bytes_.max() / max(np.percentile(bytes_, 50), 1)), 2
                ),
            },
            "postings_per_sec": {
                "min": int(pps.min()),
                "p50": int(np.percentile(pps, 50)),
                "max": int(pps.max()),
            },
            "n_terms_total": int(col("n_terms").sum()),
            "n_postings_total": int(col("n_postings").sum()),
        }
        if args.partitions:
            out["per_partition"] = parts
    print(json.dumps(out))
    return 0


def cmd_serve(args) -> int:
    """Interactive serving loop (reference GET /search analog): reads
    one query per stdin line, prints one JSON result line, keeps the
    engine replicas warm between queries. ``--sharded N`` switches to
    the term-sharded worker pool (exhaustive scoring, bit-identical
    results; each worker owns a shard subset)."""
    from zensearch_ray.pipelines.service import QueryService, ShardedQueryService

    _ensure_ray()
    if args.http is not None:
        # reference user surface: GET /search over the warm pool
        # (express-server/src/app/index.ts:175-203)
        if args.sharded or args.filter:
            raise SystemExit(
                "--http serves the replica pool; pass filter/mode per "
                "request as query params instead"
            )
        from zensearch_ray.pipelines.http_server import SearchHTTPServer

        srv = SearchHTTPServer(
            args.index, host=args.host, port=args.http,
            replicas=args.replicas, k=args.k, mode=args.mode or "pruned",
            reload_secs=args.reload_secs,
            vector_index_dir=args.vector_index,
        )
        print(json.dumps({"listening": f"http://{srv.host}:{srv.port}"}),
              flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.shutdown()
        return 0
    filt = None
    if args.filter:
        col, _, value = args.filter.partition("=")
        if not value:
            raise SystemExit("--filter expects col=value")
        if args.mode not in (None, "exhaustive"):
            raise SystemExit("--filter serves exhaustive mode only")
        filt = (col, value)
    if args.sharded:
        svc_cm = ShardedQueryService(args.index, workers=args.sharded)
        search = lambda q: svc_cm.topk_docs(q, k=args.k, filter=filt)  # noqa: E731
    else:
        svc_cm = QueryService(
            args.index, replicas=args.replicas, k=args.k,
            mode=args.mode or "pruned",
            reload_secs=args.reload_secs,
        )
        search = lambda q: svc_cm.search(  # noqa: E731
            q, docs=True, filter=filt,
            mode="exhaustive" if filt else None,
        )
    with svc_cm:
        for line in sys.stdin:
            q = line.strip()
            if not q:
                continue
            print(json.dumps({"query": q, "results": search(q)}), flush=True)
    return 0


def cmd_watch(args) -> int:
    """Streaming ingest loop (see ``pipelines/watch.py``): each
    committed drop file becomes one append generation; pair with
    ``serve --reload-secs`` so warm replicas pick every generation up
    without restart."""
    from zensearch_ray.pipelines.watch import ingest_once, watch

    _ensure_ray()

    def report(summaries):
        for s in summaries:
            print(json.dumps(s), flush=True)

    cfg = _cfg_of(args)
    if args.once:
        report(ingest_once(
            args.index, args.drop, cfg,
            near_dedup=args.near_dedup, threshold=args.dedup_threshold,
        ))
        return 0
    watch(
        args.index, args.drop, cfg,
        near_dedup=args.near_dedup, threshold=args.dedup_threshold,
        poll_secs=args.poll_secs, max_cycles=args.max_cycles,
        on_cycle=report, compact_every=args.compact_every,
        on_compact=lambda m: print(
            json.dumps({"compacted": True,
                        "n_docs": m.get("n_docs"),
                        "n_generations": m.get("n_generations", 1)}),
            flush=True,
        ),
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="zensearch_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_cfg_flags(p):
        """The shared build-config flag set (build + watch: an append
        must reproduce the original build config)."""
        p.add_argument("--shards", type=int, default=64)
        p.add_argument("--salt-subs", type=int, default=8)
        p.add_argument("--lang", default="en", help="'any' disables the filter")
        p.add_argument("--extract-html", action="store_true")
        p.add_argument("--dedup-urls", action="store_true")
        p.add_argument("--id-col", default=None)
        p.add_argument(
            "--positions", action="store_true",
            help="positional index: store token positions (phrase/near queries)",
        )
        p.add_argument(
            "--attrs", nargs="*", default=[],
            help="attribute columns carried into docmeta (facet sidecar: "
                 "query --filter/--facets, serve --filter)",
        )
        p.add_argument(
            "--title-boost", type=int, default=0,
            help="BM25F: weight title-field terms N x in tf and doc_len "
                 "(requires a title column or --extract-html; not with "
                 "--positions)",
        )
        p.add_argument(
            "--stopwords", default="",
            help="comma-separated terms dropped at index time (Lucene "
                 "StopFilter semantics: removed from tf and doc_len; "
                 "not with --positions)",
        )
        p.add_argument(
            "--stem", action="store_true",
            help="plural S-stemmer at index time (query side stems "
                 "automatically via the manifest; not with --positions)",
        )
        p.add_argument(
            "--fold-synonyms", default=None, metavar="FILE.json",
            help="index-time synonym folding: JSON {variant: canonical} "
                 "map applied at tokenize (one posting list per synonym "
                 "group; query side folds automatically via the manifest)",
        )
        p.add_argument(
            "--sigstore", action="store_true",
            help="also persist the MinHash signature store sidecar so "
                 "appends can use near-dedup",
        )

    b = sub.add_parser("build", help="build (or resume) an inverted index")
    b.add_argument("--input", required=True,
                   help="pages parquet file/dir, .jsonl dump, or .warc[.gz]")
    b.add_argument("--output", required=True, help="index directory")
    add_cfg_flags(b)
    b.add_argument(
        "--append", action="store_true",
        help="add the input as a new segment generation of an existing index",
    )
    b.add_argument(
        "--near-dedup", action="store_true",
        help="with --append: drop delta docs near-duplicating indexed or "
             "delta docs (needs an index built with --sigstore)",
    )
    b.add_argument(
        "--dedup-threshold", type=float, default=0.9,
        help="est-Jaccard threshold for --near-dedup (default 0.9)",
    )
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("query", nargs="+")
    q.add_argument("-k", type=int, default=10)
    q.add_argument(
        "--mode",
        choices=["exhaustive", "pruned", "and", "phrase", "phrase_prefix", "near", "seq", "prefix", "fuzzy", "not", "bool", "wildcard", "regex", "boosted", "msm", "dismax", "bmw", "spanfirst"],
        default=None,  # resolved in cmd_query (pruned; --filter needs exhaustive)
    )
    q.add_argument(
        "--after", metavar="SCORE,DOC_ID", default=None,
        help="search_after cursor: return results strictly after this "
             "(rounded score, doc_id) in the (score DESC, doc_id ASC) "
             "order — stateless pagination",
    )
    q.add_argument(
        "--msm", type=int, default=2,
        help="minimum distinct matching terms for --mode msm (default 2)",
    )
    q.add_argument(
        "--tie", type=float, default=0.3,
        help="dismax tie-breaker weight: score = best term + tie * rest "
             "(0 = pure max, 1 = the plain union sum)",
    )
    q.add_argument(
        "--window", type=int, default=8,
        help="proximity window for --mode near (tokens)",
    )
    q.add_argument(
        "--fuzzy-dist", type=int, default=1, choices=[1, 2],
        help="edit distance for --mode fuzzy: 1 (lcp/lcs vocab screen) "
             "or 2 (SymSpell delete-neighborhood buckets + DP verify)",
    )
    q.add_argument(
        "--similarity",
        choices=["bm25", "tfidf", "lmd", "bm25plus", "lmjm"],
        default=None,
        help="ranking function over the same index (Lucene Similarity "
             "plug): bm25 (default), tfidf (SMART ltn), lmd "
             "(LM Dirichlet mu=2000), bm25plus (BM25+ delta=1.0), "
             "lmjm (LM Jelinek-Mercer lambda=0.1); exhaustive evaluation",
    )
    q.add_argument(
        "--negative", metavar="TERMS", default=None,
        help="boosting query: demote (not exclude) docs containing any "
             "of these space-separated terms; exhaustive evaluation",
    )
    q.add_argument(
        "--negative-boost", type=float, default=0.3,
        help="demotion factor for --negative matches (default 0.3)",
    )
    q.add_argument(
        "--decay", choices=["gauss", "exp", "linear"], default=None,
        help="function_score decay on doc_len: BM25 × distance-decay "
             "from --origin (see --scale/--offset/--decay-rate)",
    )
    q.add_argument("--origin", type=float, default=0.0,
                   help="--decay: preferred doc_len value")
    q.add_argument("--scale", type=float, default=10.0,
                   help="--decay: distance where the multiplier hits "
                        "--decay-rate")
    q.add_argument("--offset", type=float, default=0.0,
                   help="--decay: no-penalty halo around --origin")
    q.add_argument("--decay-rate", type=float, default=0.5,
                   help="--decay: multiplier at origin±(offset+scale)")
    q.add_argument(
        "--random-seed", type=int, default=None,
        help="random_score: rank the match set by a reproducible "
             "per-(seed, doc_id) uniform draw instead of BM25",
    )
    q.add_argument(
        "--first-n", type=int, default=10,
        help="--mode spanfirst: some query term must first occur "
             "within the doc's first N tokens (requires --positions "
             "index; default 10)",
    )
    q.add_argument(
        "--fvf", metavar="COL", default=None,
        help="function_score field_value_factor: multiply every "
             "matching doc's BM25 score by ln(1 + docmeta[COL]) "
             "(e.g. doc_len); exhaustive evaluation",
    )
    q.add_argument(
        "--rescore-phrase", metavar="PHRASE", default=None,
        help="two-phase rescore: re-sort the BM25 top --rescore-window "
             "docs by 1.0*bm25 + 2.0*positional-phrase score "
             "(requires an index built with --positions)",
    )
    q.add_argument(
        "--rescore-window", type=int, default=30,
        help="phase-1 window size for --rescore-phrase (default 30)",
    )
    q.add_argument("--urls", action="store_true", help="resolve doc_ids to urls")
    q.add_argument(
        "--explain", nargs="?", const="", default=None, metavar="DOC_ID",
        help="per-term BM25 breakdown for the top-k (or one DOC_ID); "
             "exhaustive mode only",
    )
    q.add_argument(
        "--filter", metavar="COL=VALUE",
        help="faceted search: restrict results to docs whose docmeta "
             "attribute matches (exhaustive evaluation)",
    )
    q.add_argument(
        "--facets", metavar="COL",
        help="print per-value match counts for the attribute instead of results",
    )
    q.add_argument(
        "--collapse", metavar="COL=N",
        help="field collapsing: at most N results per value of the "
             "docmeta attribute (exhaustive evaluation)",
    )
    q.add_argument(
        "--range", metavar="COL=LO:HI",
        help="numeric range filter over a docmeta column, e.g. "
             "doc_len=40:90 (exhaustive evaluation)",
    )
    q.add_argument(
        "--synonyms", metavar="FILE.json",
        help="query-time synonym expansion: JSON {term: [synonyms...]}"
             " (exhaustive evaluation)",
    )
    q.set_defaults(fn=cmd_query)

    bt = sub.add_parser(
        "batch", help="bulk scoring: queries file -> ranked results parquet"
    )
    bt.add_argument("--index", required=True)
    bt.add_argument(
        "--queries", required=True,
        help="text file (one query/line) or parquet with query_id/query",
    )
    bt.add_argument("--output", required=True, help="results parquet directory")
    bt.add_argument("-k", type=int, default=10)
    bt.add_argument(
        "--mode",
        choices=["exhaustive", "pruned", "and", "phrase", "phrase_prefix", "near", "seq", "prefix", "fuzzy", "fuzzy2", "not", "bool", "wildcard", "regex"],
        default="pruned",
    )
    bt.add_argument("--window", type=int, default=8)
    bt.add_argument("--batch-size", type=int, default=64)
    bt.add_argument("--concurrency", type=int, default=8)
    bt.set_defaults(fn=cmd_batch)

    sg = sub.add_parser(
        "suggest", help='"did you mean": per-token spelling suggestions'
    )
    sg.add_argument("--index", required=True)
    sg.add_argument("query", nargs="+")
    sg.set_defaults(fn=cmd_suggest)

    ac = sub.add_parser(
        "complete", help="search-box completion: top terms under a prefix"
    )
    ac.add_argument("--index", required=True)
    ac.add_argument("-k", type=int, default=10)
    ac.add_argument("prefix", nargs="+")
    ac.set_defaults(fn=cmd_complete)

    st = sub.add_parser(
        "significant",
        help="significant terms: fg-vs-corpus term lift for a query",
    )
    st.add_argument("--index", required=True)
    st.add_argument("-k", type=int, default=25)
    st.add_argument("--min-fg-df", type=int, default=3)
    st.add_argument("query", nargs="+")
    st.set_defaults(fn=cmd_significant)

    sn = sub.add_parser(
        "snapshot", help="verified atomic backup of a committed index"
    )
    sn.add_argument("--index", required=True)
    sn.add_argument("--out", required=True)
    sn.set_defaults(fn=cmd_snapshot)

    rs = sub.add_parser(
        "restore", help="restore a snapshot into a fresh index dir"
    )
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--out", required=True)
    rs.set_defaults(fn=cmd_restore)

    pr = sub.add_parser(
        "prep",
        help="training-data prep: extract/filter/dedup/chunk -> partitioned parquet",
    )
    pr.add_argument("--input", required=True, help="pages parquet file/dir")
    pr.add_argument("--output", required=True, help="output directory (resumable)")
    pr.add_argument("--lang", default="en", help="'any' disables the filter")
    pr.add_argument("--extract-html", action="store_true")
    pr.add_argument("--min-tokens", type=int, default=40)
    pr.add_argument("--max-stop-ratio", type=float, default=0.5)
    pr.add_argument("--chunk-tokens", type=int, default=512)
    pr.add_argument("--partitions", type=int, default=64)
    pr.add_argument(
        "--canonical-dedup", action="store_true",
        help="dedup by canonical URL (case/fragment/utm/port/slash "
             "mirrors collapse) instead of exact URL",
    )
    pr.add_argument(
        "--gopher", action="store_true",
        help="apply the Gopher word-level quality rules as a gate",
    )
    pr.add_argument(
        "--repetition", action="store_true",
        help="apply the MassiveText n-gram repetition rules as a gate",
    )
    pr.add_argument(
        "--exact-substr", type=int, default=None, metavar="L",
        help="cut cross-corpus duplicated token windows of length >= L "
             "(ExactSubstr; first occurrence kept)",
    )
    pr.set_defaults(fn=cmd_prep)

    c = sub.add_parser(
        "compact",
        help="merge append generations into a fresh single-generation index",
    )
    c.add_argument("--index", required=True, help="source index (untouched)")
    c.add_argument("--output", required=True, help="compacted index directory")
    c.set_defaults(fn=cmd_compact)

    c = sub.add_parser(
        "alias",
        help="atomic serving cutover: point a stable alias file at a "
             "committed index (set) or print its target (get)",
    )
    c.add_argument("--path", required=True, help="alias file path")
    c.add_argument("--set", default=None,
                   help="index directory to point the alias at "
                        "(omit to print the current target)")
    c.set_defaults(fn=cmd_alias)

    c = sub.add_parser(
        "reindex",
        help="analyzer migration from a committed index's own postings "
             "(stem / stopwords / synonyms) — the corpus is never re-read",
    )
    c.add_argument("--index", required=True, help="source index (untouched)")
    c.add_argument("--output", required=True, help="reindexed index directory")
    c.add_argument("--stem", action="store_true")
    c.add_argument("--stopwords", default="", help="comma-separated")
    c.add_argument("--fold-synonyms", default=None,
                   help="JSON file of variant→canonical token pairs")
    c.add_argument("--positions", action="store_true",
                   help="carry positions through (positional source only; "
                        "omit to downgrade to a positionless index)")
    c.add_argument("--attrs", nargs="*", default=[],
                   help="docmeta attribute columns to carry through "
                        "(must match the source build's --attrs)")
    c.add_argument("--shards", type=int, default=32)
    c.add_argument("--salt-subs", type=int, default=8)
    c.set_defaults(fn=cmd_reindex)

    mg = sub.add_parser(
        "merge",
        help="merge two independently built indexes into one (union id space)",
    )
    mg.add_argument("--a", required=True, help="first index (ids keep their values)")
    mg.add_argument("--b", required=True, help="second index (ids offset by a's ceiling)")
    mg.add_argument("--output", required=True, help="merged index directory")
    mg.set_defaults(fn=cmd_merge)

    dl = sub.add_parser(
        "delete",
        help="tombstone documents; the next compact purges them physically",
    )
    dl.add_argument("--index", required=True)
    dl.add_argument("--urls", nargs="*", help="urls to delete (docmeta lookup)")
    dl.add_argument("--urls-file", help="file with one url per line")
    dl.add_argument("--ids", nargs="*", type=int, help="doc_ids to delete")
    dl.set_defaults(fn=cmd_delete)

    st = sub.add_parser(
        "stats", help="index manifest + per-partition lineage metrics"
    )
    st.add_argument("--index", required=True)
    st.add_argument(
        "--partitions", action="store_true",
        help="include every partition's raw metrics row",
    )
    st.set_defaults(fn=cmd_stats)

    fs = sub.add_parser(
        "fsck",
        help="verify index integrity (manifests, codec round-trip, "
             "block-max pruning safety, sidecars)",
    )
    fs.add_argument("--index", required=True)
    fs.add_argument(
        "--fast", action="store_true",
        help="metadata cross-checks only (skip the per-segment decode pass)",
    )
    fs.add_argument(
        "--max-errors", type=int, default=50,
        help="truncate the printed error list (report stays complete in rc)",
    )
    fs.set_defaults(fn=cmd_fsck)

    pc_ = sub.add_parser(
        "percolate",
        help="match a standing boolean-query registry against documents",
    )
    pc_.add_argument("--input", required=True)
    pc_.add_argument("--queries", required=True, help="JSON {query_id: expr}")
    pc_.add_argument("--output", required=True)
    pc_.add_argument("--id-col", default="doc_id")
    pc_.add_argument("--text-col", default="text")
    pc_.set_defaults(fn=cmd_percolate)

    df_ = sub.add_parser(
        "diff", help="document/vocabulary/posting deltas between two indexes"
    )
    df_.add_argument("--a", required=True)
    df_.add_argument("--b", required=True)
    df_.set_defaults(fn=cmd_diff)

    vb = sub.add_parser(
        "vbuild", help="build (or resume) the persisted IVF vector index"
    )
    vb.add_argument("--input", required=True)
    vb.add_argument("--output", required=True)
    vb.add_argument("--lists", type=int, default=16)
    vb.add_argument("--partitions", type=int, default=8)
    vb.add_argument("--id-col", default="vec_id")
    vb.add_argument("--emb-col", default="embedding")
    vb.add_argument(
        "--append", action="store_true",
        help="add NEW vectors as a generation under the frozen centroids",
    )
    vb.add_argument(
        "--sq8", action="store_true",
        help="store int8 scalar-quantized codes (8x smaller, approximate)",
    )
    vb.set_defaults(fn=cmd_vbuild)

    vq = sub.add_parser(
        "vquery", help="ANN top-k against a persisted vector index"
    )
    vq.add_argument("--index", required=True)
    vq.add_argument("--probe-parquet", required=True)
    vq.add_argument("--probe-id", type=int, required=True)
    vq.add_argument("-k", type=int, default=10)
    vq.add_argument("--nprobe", type=int, default=4)
    vq.set_defaults(fn=cmd_vquery)

    vc = sub.add_parser(
        "vcompact",
        help="rewrite a multi-generation vector index as one generation",
    )
    vc.add_argument("--index", required=True)
    vc.add_argument("--output", required=True)
    vc.set_defaults(fn=cmd_vcompact)

    so = sub.add_parser(
        "sort",
        help="range-partitioned sort of a parquet table → globally "
             "ordered part files",
    )
    so.add_argument("--input", required=True, help="parquet file/dir")
    so.add_argument("--col", required=True, help="sort column")
    so.add_argument("--output", required=True, help="output directory")
    so.add_argument("--parts", type=int, default=32)
    so.add_argument(
        "--spread-ties", action="store_true",
        help="round-robin boundary-tie rows across eligible partitions "
             "(bounds skew; equal keys are order-equivalent)",
    )
    so.set_defaults(fn=cmd_sort)

    ex = sub.add_parser(
        "export",
        help="decode segments → (term, doc_id, tf, dl) parquet rows",
    )
    ex.add_argument("--index", required=True)
    ex.add_argument("--output", required=True)
    ex.set_defaults(fn=cmd_export)

    fr = sub.add_parser(
        "frontier",
        help="link harvest + anti-join vs indexed urls → new-frontier parquet",
    )
    fr.add_argument("--pages", required=True, help="stored pages parquet (html col)")
    fr.add_argument("--index", required=True)
    fr.add_argument("--output", required=True)
    fr.add_argument("--cap", type=int, default=5, help="max urls kept per host")
    fr.add_argument("--same-host-only", action="store_true",
                    help="keep only links to hosts the corpus already covers")
    fr.set_defaults(fn=cmd_frontier)

    s = sub.add_parser("serve", help="warm serving loop: stdin queries → JSON lines")
    s.add_argument("--index", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument(
        "--mode",
        choices=["exhaustive", "pruned", "and", "phrase", "phrase_prefix", "near", "seq", "prefix", "fuzzy", "fuzzy2", "not", "bool", "wildcard", "regex"],
        default=None,  # resolved in cmd_serve (pruned; --filter → exhaustive)
    )
    s.add_argument("--replicas", type=int, default=2)
    s.add_argument(
        "--sharded", type=int, default=0, metavar="N",
        help="serve through N term-shard workers instead of full replicas",
    )
    s.add_argument(
        "--filter", metavar="COL=VALUE",
        help="faceted serving: restrict results to docs whose docmeta "
             "attribute matches (exhaustive evaluation)",
    )
    s.add_argument(
        "--reload-secs", type=float, default=None, metavar="S",
        help="live reload: replicas re-check the index version at most "
             "every S seconds and pick up appends/deletes without restart",
    )
    s.add_argument(
        "--http", type=int, default=None, metavar="PORT",
        help="serve GET /search (and /facets, /healthz) on this port "
             "instead of the stdin loop; 0 binds an ephemeral port",
    )
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument(
        "--vector-index", default=None, metavar="DIR",
        help="also serve ANN /vsearch over this persisted vector index",
    )
    s.set_defaults(fn=cmd_serve)

    w = sub.add_parser(
        "watch",
        help="tail a drop directory: append each committed parquet/JSONL "
             "file as one index generation (crawl→store→search loop)",
    )
    w.add_argument("--index", required=True)
    w.add_argument("--drop", required=True, help="drop directory to tail")
    add_cfg_flags(w)  # appends must reproduce the original build config
    w.add_argument(
        "--near-dedup", action="store_true",
        help="drop delta docs near-duplicating indexed docs or earlier "
             "deltas (requires an index built with --sigstore)",
    )
    w.add_argument("--dedup-threshold", type=float, default=0.9)
    w.add_argument("--poll-secs", type=float, default=2.0)
    w.add_argument(
        "--max-cycles", type=int, default=None,
        help="exit after N polls (default: run forever)",
    )
    w.add_argument("--once", action="store_true",
                   help="one ingest pass, then exit")
    w.add_argument(
        "--compact-every", type=int, default=None, metavar="N",
        help="auto-compact: when an ingest leaves >= N generations, "
             "fold them in place (tombstones purge; atomic swap)",
    )
    w.set_defaults(fn=cmd_watch)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
