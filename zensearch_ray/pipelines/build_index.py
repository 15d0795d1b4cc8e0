"""Index build pipeline — the engine's one wide shuffle (SURVEY.md §4.2).

Dataflow (all Ray Data, streaming, zero-copy Arrow batches)::

    read_parquet(pages, columns pruned)
      → filter(lang)                      # predicate, map-side
      → extract html→text                 # E1, only when text absent
      → dedup by url (keep first warc_ts) # A7, duplicate-sliver shuffle
      → TokenizeStage (actor pool)        # E5/E7/E8 + per-doc (term, tf)
      → [pass 1] doc stats + df partials  # A1/A2, partial-aggregated
      → [pass 2] ExplodeStage             # salted term-shard fragments
      → groupby(part).map_groups(build)   # THE shuffle → posting segments
      → per-partition atomic commit + lineage manifest + metrics

The reference has no indexing at all (it re-reads the whole corpus per
query: ``database/src/database.ts:93-104``, ``search-engine/main.go:127-143``);
this pipeline is the north_rule's replacement. Resume: committed
partitions (per-partition manifests) are skipped at the MAP side —
their fragments never enter the shuffle.
"""

from __future__ import annotations

import io
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from zensearch_ray.functions.bm25 import BM25Params
from zensearch_ray.functions.codec import encode_partition
from zensearch_ray.stages.dedup import dedup_by_key
from zensearch_ray.stages.extract import extract_batch
from zensearch_ray.stages.tokenize import explode_batch, tokenize_batch
from zensearch_ray.state.manifest import IndexLayout

TOKENIZER_SPEC = "nfc-casefold-nonalnum-v1"
CODEC_SPEC = "delta-varint-blockmax128-v1"
# cache_tokenized=None auto-flip: tokenized blocks carry the token list
# next to doc metadata — measured ≈2× the source text bytes — and the
# pin is only worth it while that fits comfortably beside the shuffle's
# own working set (half the store). See BuildConfig.cache_tokenized.
_TOKENIZED_BLOWUP = 2.0
_CACHE_STORE_FRAC = 0.5


@dataclass
class BuildConfig:
    num_shards: int = 32
    salt_subs: int = 8
    # df above this → term is "heavy" → salted splitting; None → n_docs // 10
    heavy_df_threshold: int | None = None
    params: BM25Params = field(default_factory=BM25Params)
    lang: str | None = "en"
    dedup_urls: bool = False
    extract_from_html: bool = False
    id_col: str | None = None  # column holding doc_id; None → dense/hash64(url)
    # path sources without id_col get DENSE row-offset doc_ids (metadata-
    # only assignment, ~4x smaller delta-varint postings than hash ids);
    # Dataset sources without id_col fall back to hash64(url)
    dense_ids: bool = True
    # 1024 ≤ typical block rows → map_batches never coalesces two read
    # blocks into one task (coalescing halved map width at bench shape)
    tokenize_batch_size: int = 1024
    tokenize_concurrency: int | tuple[int, int] | None = None
    # pin the tokenized corpus between pass 1 and pass 2 (skips the
    # second tokenize execution) — None = AUTO: cache only while the
    # estimated tokenized footprint fits a bounded share of the object
    # store; beyond that, materializing is corpus-scale spill churn and
    # recomputing pass 2 is the cheaper move (tokenize is CPU-light
    # relative to disk-spill round-trips at that size). True/False
    # force either path.
    cache_tokenized: bool | None = None
    # dl rides the posting exchange UNLESS the dense id space is small
    # enough to broadcast a doc_id→dl int32 array instead (4 B/doc; the
    # default cap = 128 MB broadcast). Saves 4 B/posting of shuffle
    # volume (~25% of the exchange). Auto-disabled for hash-id builds
    # and for corpora beyond the cap — a 10^10-doc cluster corpus ships
    # dl in-row, exactly as before.
    dl_broadcast_max_ids: int = 32_000_000
    # positional index: store per-(term, doc) token positions
    # (delta+varint, absolute restart per doc) so phrase queries
    # resolve from the index alone — no corpus re-scan. Opt-in: the
    # exchange grows by ~the token count × varint bytes, the inherent
    # cost of a positional index.
    positions: bool = False
    # document ATTRIBUTE columns carried into docmeta (e.g. lang, host,
    # source) — the facet sidecar: query-time filtered search and facet
    # counts resolve doc_id → attribute against docmeta only, postings
    # never change. Metadata-scale (one small column per doc).
    attrs: tuple = ()
    # BM25F title field weight (0 = off). When > 0, tokenize folds
    # boost·tf_title into tf and boost·dl_title into doc_len (integer
    # token-repetition field boost — the Lucene-era BM25F
    # simplification), so the ENTIRE downstream path — explode, shuffle,
    # codec, block-max pruning, deletes, facets, merge — is unchanged
    # and every query mode scores fielded relevance. Requires a `title`
    # column in the corpus; incompatible with positions=True (positions
    # index body offsets only).
    title_boost: int = 0
    # persisted MinHash signature-store sidecar (stages/sigstore.py):
    # built alongside the index so future appends can drop near-dups of
    # already-indexed pages WITHOUT re-reading old text
    # (append_index_dedup). A sidecar — postings never change — so it
    # is deliberately NOT part of the config fingerprint.
    sig_store: bool = False
    # analyzer config: index-time stopword removal (Lucene StopFilter
    # semantics — dropped from tf AND doc_len, so df/idf/avgdl reflect
    # the filtered stream and the query path needs NO change: a stop
    # term simply has no postings). Incompatible with positions=True
    # (token removal changes phrase adjacency).
    stopwords: tuple = ()
    # analyzer config: index-time plural stemming (the pinned
    # S-stemmer, functions/text.s_stem) — tf mass merges onto the
    # stem, doc_len invariant; the QUERY side stems too (the engine
    # reads the flag from the manifest). Compatible with positions
    # (no token is dropped, so every occurrence keeps its offset).
    stem: bool = False
    # analyzer config: index-time synonym folding — (variant, canonical)
    # pairs rewrite variants onto canonicals at tokenize, so tf/df mass
    # merges onto ONE posting list per synonym group (the contraction
    # form of Lucene's SynonymFilter; the expansion form lives at query
    # time as topk_synonyms). Query tokens fold identically via the
    # manifest. Pinned order: synonyms, then stem. Positions-compatible.
    synonyms: tuple = ()


def load_corpus(source, cfg: BuildConfig, base_id_offset: int = 0,
                drop_urls: frozenset | None = None) -> tuple:
    """source: Dataset | parquet path(s). Prunes columns at the read.

    Returns ``(ds, effective_id_col, id_ceiling)``: the column tokenize
    should take doc_ids from (``None`` → hash64(url) fallback for
    Dataset sources), and — for dense-id path sources — the first id a
    future APPEND may use (``None`` otherwise).
    """
    import ray.data as rd

    id_col = cfg.id_col
    id_ceiling = None
    if isinstance(source, (str, list)):
        cols = ["url", "warc_ts", "text", "lang"]
        if cfg.title_boost and not cfg.extract_from_html:
            cols.append("title")  # html sources get title from extraction
        cols.extend(a for a in cfg.attrs if a not in cols)
        if cfg.extract_from_html:
            cols.append("html")
        if cfg.id_col:
            cols.append(cfg.id_col)
            ds = rd.read_parquet(source, columns=cols)
        elif cfg.dense_ids:
            from zensearch_ray.sources.dense import read_parquet_dense_with_ceiling

            ds, id_ceiling = read_parquet_dense_with_ceiling(
                source, cols, id_name="doc_id", base_offset=base_id_offset
            )
            id_col = "doc_id"
        else:
            ds = rd.read_parquet(source, columns=cols)
    else:
        ds = source
    if cfg.lang is not None:
        lang = cfg.lang
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["lang"], lang)), batch_format="pyarrow"
        )
    if cfg.extract_from_html:
        ds = ds.map_batches(extract_batch, batch_format="pyarrow", zero_copy_batch=True)
    if cfg.dedup_urls:
        ds = dedup_by_key(ds, "url", order_col="warc_ts")
    if drop_urls:
        # near-dedup exclusion set (append_index_dedup) — pair-sliver
        # sized, vectorized membership (pc.is_in, not a Python loop).
        # Dense-id sources keep their row-offset ids → holes in the id
        # space, which the layout tolerates (ceiling is an upper bound).
        drop_arr = pa.array(sorted(drop_urls), type=pa.string())

        def drop_fn(t: pa.Table, _d=drop_arr) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["url"], value_set=_d)))

        ds = ds.map_batches(drop_fn, batch_format="pyarrow")
    return ds, id_col, id_ceiling


def config_fingerprint(cfg: BuildConfig, id_mode: str) -> str:
    """Stable hash of every config knob that affects index CONTENTS or
    physical partition layout. Written into docstats.json and each
    partition manifest; resume refuses to mix partitions built under a
    different fingerprint (postings would be routed to shards the query
    engine never probes)."""
    import hashlib
    import json

    spec = {
        "tokenizer": TOKENIZER_SPEC,
        "codec": CODEC_SPEC,
        "num_shards": cfg.num_shards,
        "salt_subs": cfg.salt_subs,
        "heavy_df_threshold": cfg.heavy_df_threshold,
        "k1": cfg.params.k1,
        "b": cfg.params.b,
        "lang": cfg.lang,
        "dedup_urls": cfg.dedup_urls,
        "extract_from_html": cfg.extract_from_html,
        "id_mode": id_mode,
    }
    if cfg.positions:
        # segment schema changes with positions → never mix. Added only
        # when on so positionless fingerprints (and their cached
        # indexes) stay stable across this version.
        spec["positions"] = True
    if cfg.title_boost:
        # boosted tfs/doc_lens are a different index CONTENT — a resume
        # or append must never mix fielded and unfielded partitions.
        # Added only when on so existing fingerprints stay stable.
        spec["title_boost"] = cfg.title_boost
    if cfg.attrs:
        # docmeta schema changes with attrs → a resume must not mix
        # (same only-when-set rule as positions to keep old fps stable)
        spec["attrs"] = list(cfg.attrs)
    if cfg.stopwords:
        # a filtered token stream is different index CONTENT (tf, dl,
        # df, avgdl all shift) — never mix with an unfiltered build
        spec["stopwords"] = sorted(cfg.stopwords)
    if cfg.stem:
        # stemmed terms are different index CONTENT (only-when-set so
        # existing fingerprints stay stable)
        spec["stem"] = True
    if cfg.synonyms:
        # a folded vocabulary is different index CONTENT — never mix
        spec["synonyms"] = sorted(map(list, cfg.synonyms))
    return hashlib.blake2s(
        json.dumps(spec, sort_keys=True).encode(), digest_size=8
    ).hexdigest()


_DL_CACHE: dict = {}


def _resolve_dl(dl_ref):
    """ObjectRef → zero-copy int32 numpy view, cached per worker."""
    import ray

    key = dl_ref.hex()
    if key not in _DL_CACHE:
        _DL_CACHE.clear()
        _DL_CACHE[key] = ray.get(dl_ref)
    return _DL_CACHE[key]


def _broadcast_dl_array(layout: IndexLayout, gen: int, id_ceiling: int):
    """Dense doc_id→dl int32 array (4 B/doc, gated by
    dl_broadcast_max_ids), built from the docmeta parquet pass 1 just
    wrote — a two-column columnar read, NOT another pass over the
    corpus. Slots of filtered-out rows stay 0 and are never
    referenced."""
    import glob as _glob
    import os as _os

    import ray

    arr = np.zeros(id_ceiling, dtype=np.int32)
    meta_dir = layout.docmeta_gen_dir(gen)
    for f in sorted(_glob.glob(_os.path.join(meta_dir, "*.parquet"))):
        t = pq.read_table(f, columns=["doc_id", "doc_len"])
        arr[t["doc_id"].to_numpy(zero_copy_only=False)] = t[
            "doc_len"
        ].to_numpy(zero_copy_only=False)
    return ray.put(arr)


def _build_partition_fn(
    layout_root: str, avgdl: float, params: BM25Params, config_fp: str = "",
    gen: int = 0, dl_ref=None, positions: bool = False,
):
    """Returns the map_groups body that builds+commits ONE posting segment.

    Runs on workers; the closure carries only small config. Within the
    group: sort by (term, doc_id), find term run boundaries, encode each
    term's posting list (vectorized codec), write one immutable parquet
    segment + lineage manifest atomically, return a metrics row.
    """

    def build_partition(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part = int(group["part"][0].as_py())
        # the term column arrives dictionary-encoded (shuffle-volume
        # optimization) — decode locally, AFTER the exchange
        tcol = group["term"]
        if pa.types.is_dictionary(tcol.type):
            group = group.set_column(
                group.column_names.index("term"), "term", tcol.cast(pa.string())
            )
        # shuffle output arrives as MANY small chunks (one per map task);
        # flatten once so every kernel below runs on contiguous arrays
        group = group.combine_chunks()
        idx = pc.sort_indices(
            group, sort_keys=[("term", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(idx).combine_chunks()
        t_sort = time.perf_counter()
        doc_ids = g["doc_id"].to_numpy(zero_copy_only=False)
        tfs = g["tf"].to_numpy(zero_copy_only=False)
        if dl_ref is not None:
            # dl never rode the exchange: gather from the broadcast
            # dense doc_id→dl array (plasma-shared, zero-copy read)
            dls = _resolve_dl(dl_ref)[doc_ids]
        else:
            dls = g["dl"].to_numpy(zero_copy_only=False)

        # term run boundaries via dictionary codes — no Python strings
        n = g.num_rows
        codes = np.asarray(
            pc.dictionary_encode(g["term"].chunk(0)).indices, dtype=np.int64
        )
        boundaries = np.flatnonzero(codes[1:] != codes[:-1]) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [n]))

        flat_pos = None
        if positions:
            # pos survived the take/sort as a list<int32> column; one
            # flatten gives token-aligned values (offsets arithmetic,
            # no per-row Python)
            pcol = g["pos"]
            if isinstance(pcol, pa.ChunkedArray):
                pcol = pcol.combine_chunks()
            flat_pos = pcol.flatten().to_numpy(zero_copy_only=False)
        cols = encode_partition(
            doc_ids, tfs, dls, starts, ends, avgdl, params,
            flat_positions=flat_pos,
        )
        seg = pa.table(
            {
                "term": g["term"].chunk(0).take(pa.array(starts, type=pa.int64())),
                **cols,
            }
        )
        t_enc = time.perf_counter()
        # encode-time avgdl rides in the file metadata: appends change
        # the corpus avgdl, and the query engine must scale this file's
        # block-max bounds by max(1, avgdl_now/encode_avgdl) to keep
        # pruning rank-safe (tf_norm grows as avgdl grows)
        seg = seg.replace_schema_metadata({b"encode_avgdl": repr(avgdl).encode()})
        buf = io.BytesIO()
        pq.write_table(seg, buf, compression="zstd", row_group_size=4096)
        payload = buf.getvalue()
        elapsed = time.perf_counter() - t0
        metrics = {
            "n_terms": len(starts),
            "n_postings": int(n),
            "posting_bytes": len(payload),
            "build_sec": round(elapsed, 4),
            "sort_sec": round(t_sort - t0, 4),
            "encode_sec": round(t_enc - t_sort, 4),
            "write_sec": round(elapsed - (t_enc - t0), 4),
            "postings_per_sec": round(n / elapsed, 1) if elapsed > 0 else None,
            "config_fp": config_fp,
        }
        metrics["encode_avgdl"] = avgdl
        IndexLayout(layout_root).commit_partition(part, payload, metrics, gen=gen)
        return pa.table(
            {
                "part": pa.array([part], type=pa.int64()),
                "n_terms": pa.array([metrics["n_terms"]], type=pa.int64()),
                "n_postings": pa.array([metrics["n_postings"]], type=pa.int64()),
                "posting_bytes": pa.array([metrics["posting_bytes"]], type=pa.int64()),
                "build_sec": pa.array([metrics["build_sec"]], type=pa.float64()),
            }
        )

    return build_partition


_HEAVY_SAMPLE_DOCS = 65536


def _pass1_stats(tokenized, cfg: BuildConfig, layout: IndexLayout, fp: str,
                 gen: int = 0) -> dict:
    """Pass-1 over ONE generation's corpus slice: (n_docs, Σdl, heavy
    terms) + docmeta write. Cached per generation for resume.

    Corpus stats shuffle ONE row per batch. Heavy-term detection runs
    on a bounded doc SAMPLE with a proportionally scaled threshold —
    salting is a partition-layout knob (the query engine reads every
    sub-partition of a shard), so approximate heavy sets never affect
    results, and the full-corpus vocab-scale df shuffle (the round-1
    design, ~0.8× the size of the posting exchange itself) disappears.
    Below _HEAVY_SAMPLE_DOCS docs the sample IS the corpus → exact.
    """
    stats = layout.read_docstats(gen)
    if stats is not None:
        return stats
    from zensearch_ray.functions.agg import bucketed_groupby_sum
    from zensearch_ray.stages.tokenize import df_partials, doc_stat_partials

    totals = tokenized.map_batches(
        doc_stat_partials, batch_format="pyarrow"
    ).to_pandas()
    n_docs = int(totals["n_docs"].sum()) if len(totals) else 0
    sum_dl = int(totals["sum_dl"].sum()) if len(totals) else 0
    threshold = (
        cfg.heavy_df_threshold
        if cfg.heavy_df_threshold is not None
        else max(64, n_docs // 10)
    )
    if n_docs == 0:
        heavy_terms = []
    else:
        sample_n = min(n_docs, _HEAVY_SAMPLE_DOCS)
        scaled = max(1, round(threshold * sample_n / n_docs))
        agg = bucketed_groupby_sum(
            tokenized.limit(sample_n).map_batches(
                df_partials, batch_format="pyarrow"
            ),
            keys=["term"],
            sum_cols=["df_partial"],
        )
        heavy_tbl = agg.map_batches(
            lambda t: t.filter(pc.greater(t["df_partial"], scaled)),
            batch_format="pyarrow",
        ).to_pandas()
        heavy_terms = sorted(heavy_tbl["term"].tolist()) if len(heavy_tbl) else []

    # docmeta (restart-safe: this generation's dir rewritten wholesale
    # until its docstats commits)
    import os as _os
    import shutil

    meta_dir = layout.docmeta_gen_dir(gen)
    if gen == 0:
        # wipe ONLY gen-0 files, not appended generations' subdirs
        for name in _os.listdir(meta_dir) if _os.path.isdir(meta_dir) else []:
            p = _os.path.join(meta_dir, name)
            if _os.path.isfile(p):
                _os.remove(p)
    else:
        shutil.rmtree(meta_dir, ignore_errors=True)
    _os.makedirs(meta_dir, exist_ok=True)
    tokenized.select_columns(
        ["doc_id", "url", "title", *cfg.attrs, "doc_len"]
    ).write_parquet(
        meta_dir
    )
    stats = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": sum_dl / n_docs if n_docs else 0.0,
        "heavy_df_threshold": threshold,
        "heavy_terms": heavy_terms,
        "config_fp": fp,
        "gen": gen,
    }
    layout.write_docstats(stats, gen)
    return stats


def build_index(
    source, index_dir: str, cfg: BuildConfig | None = None,
    append: bool = False, manifest_extra: dict | None = None,
) -> dict:
    """Build (or resume) the inverted index at ``index_dir``. With
    ``append=True``, tokenize ONLY the new source and add a new segment
    GENERATION beside the existing index (the batch analog of the
    reference's grow-by-crawling loop, ``database/src/database.ts:16-91``
    upsert → next query sees the grown corpus). Returns the global
    manifest dict. Never calls ray.init (driver owns the session).
    """
    if append:
        return append_index(source, index_dir, cfg,
                            manifest_extra=manifest_extra)
    import ray

    cfg = cfg or BuildConfig()
    if cfg.title_boost and cfg.positions:
        # fail on the driver, not as a wrapped worker error: positions
        # index BODY token offsets only, and boosted tfs would disagree
        # with positional-list lengths
        raise ValueError(
            "title_boost is incompatible with a positional build"
        )
    if cfg.stopwords and cfg.positions:
        raise ValueError(
            "stopwords are incompatible with a positional build "
            "(token removal changes phrase adjacency semantics)"
        )
    layout = IndexLayout(index_dir)
    layout.ensure_dirs()
    t_start = time.perf_counter()
    phases: dict[str, float] = {}

    def mark(name: str, since: float) -> float:
        now = time.perf_counter()
        phases[name] = round(now - since, 3)
        return now

    corpus, id_col, id_ceiling = load_corpus(source, cfg)
    if cfg.id_col:
        id_mode = f"col:{cfg.id_col}"
    elif id_col == "doc_id":
        id_mode = "dense-file-offset"
    else:
        id_mode = "hash64(url)"
    fp = config_fingerprint(cfg, id_mode)
    # resume safety (ADVICE r1): refuse to mix artifacts built under a
    # different config — stale shard routing is silent data corruption
    prior_stats = layout.read_docstats()
    if prior_stats is not None and prior_stats.get("config_fp") != fp:
        raise ValueError(
            f"index_dir {index_dir} holds docstats built under config "
            f"{prior_stats.get('config_fp')!r} != current {fp!r}; "
            "use a fresh index_dir (or delete it) to rebuild with a new config"
        )
    for part, m in layout.committed_parts().items():
        if m.get("config_fp") != fp:
            raise ValueError(
                f"index_dir {index_dir} partition {part} was committed under "
                f"config {m.get('config_fp')!r} != current {fp!r}; "
                "use a fresh index_dir to rebuild with a new config"
            )

    # tokenize/explode are STATELESS → task pools (warm-worker reuse,
    # no per-actor cold start that scales with CPU count); an explicit
    # tokenize_concurrency opts into an actor pool for stateful setups
    actor_kwargs: dict = {}
    if cfg.tokenize_concurrency is not None:
        actor_kwargs["concurrency"] = cfg.tokenize_concurrency
    tokenized = corpus.map_batches(
        tokenize_batch,
        fn_kwargs={
            "id_col": id_col,
            "positions": cfg.positions,
            "attrs": cfg.attrs,
            "title_boost": cfg.title_boost,
            "stopwords": cfg.stopwords,
            "stem": cfg.stem,
            "synonyms": cfg.synonyms,
        },
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
    )
    cache_tok = cfg.cache_tokenized
    if cache_tok is None:
        # AUTO: pin only while the tokenized footprint (≈ blowup ×
        # source bytes, parquet-metadata estimate — no execution) fits
        # a bounded share of the object store. Above that the pin is
        # corpus-scale spill churn; recomputing pass 2 wins.
        try:
            est = int(corpus.size_bytes() or 0)
        except Exception:
            est = 0
        store = float(ray.cluster_resources().get("object_store_memory", 0.0))
        cache_tok = not (
            store > 0 and est * _TOKENIZED_BLOWUP > store * _CACHE_STORE_FRAC
        )
    if cache_tok:
        # tokenization is the CPU-heavy stage; pinning its output avoids
        # recomputing it for pass 2 (object store spills to disk if needed)
        tokenized = tokenized.materialize()
    t = mark("tokenize", t_start)

    # ---- pass 1: doc stats + df, FUSED into one corpus execution
    # (cached in docstats.json for resume) ----
    stats = _pass1_stats(tokenized, cfg, layout, fp, gen=0)
    t = mark("stats_df_docmeta", t)

    avgdl = float(stats["avgdl"])
    heavy_ref = ray.put(frozenset(stats["heavy_terms"]))

    # ---- pass 2: explode → shuffle → build committed segments -----------
    committed_before = layout.committed_parts()
    dl_ref = None
    if id_ceiling is not None and id_ceiling <= cfg.dl_broadcast_max_ids:
        dl_ref = _broadcast_dl_array(layout, 0, id_ceiling)
    exploded = tokenized.map_batches(
        explode_batch,
        fn_kwargs={
            "num_shards": cfg.num_shards,
            "salt_subs": cfg.salt_subs,
            "heavy_ref": heavy_ref,
            "skip_parts": frozenset(committed_before.keys()),
            "docid32": id_ceiling is not None and id_ceiling < 2**31,
            "emit_dl": dl_ref is None,
            "emit_pos": cfg.positions,
        },
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
    )
    build_fn = _build_partition_fn(
        index_dir, avgdl, cfg.params, config_fp=fp, dl_ref=dl_ref,
        positions=cfg.positions,
    )
    part_stats = (
        exploded.groupby("part")
        .map_groups(build_fn, batch_format="pyarrow")
        .to_pandas()
    )
    t = mark("explode_shuffle_build", t)

    sig_docs = None
    if cfg.sig_store:
        # one extra pass over corpus text (re-executed source chain) —
        # the opt-in cost of making every future append near-dup-aware
        from zensearch_ray.stages.sigstore import build_sig_store, store_dir_of

        sig_meta = build_sig_store(corpus, store_dir_of(index_dir), gen=0)
        sig_docs = sig_meta["n_docs"]
        mark("sig_store", t)

    elapsed = time.perf_counter() - t_start
    committed = layout.committed_parts()
    manifest = {
        "version": 2,
        "tokenizer": TOKENIZER_SPEC,
        "codec": CODEC_SPEC,
        "config_fp": fp,
        "id_mode": id_mode,
        "n_docs": stats["n_docs"],
        "sum_dl": stats["sum_dl"],
        "avgdl": avgdl,
        "id_ceiling": id_ceiling,
        "n_generations": 1,
        "num_shards": cfg.num_shards,
        "salt_subs": cfg.salt_subs,
        "positions": cfg.positions,
        "stopwords": sorted(cfg.stopwords),
        "stem": cfg.stem,
        "synonyms": sorted(map(list, cfg.synonyms)),
        "k1": cfg.params.k1,
        "b": cfg.params.b,
        "heavy_df_threshold": stats["heavy_df_threshold"],
        "n_heavy_terms": len(stats["heavy_terms"]),
        "n_partitions": len(committed),
        "n_partitions_built_this_run": int(len(part_stats)),
        "total_postings": int(sum(m["n_postings"] for m in committed.values())),
        "total_posting_bytes": int(sum(m["posting_bytes"] for m in committed.values())),
        "build_wall_sec": round(elapsed, 3),
        "phase_secs": phases,
        "docs_per_sec": round(stats["n_docs"] / elapsed, 1) if elapsed > 0 else None,
        "cache_tokenized": bool(cache_tok),
    }
    if sig_docs is not None:
        manifest["sig_store_docs"] = sig_docs
    layout.write_manifest(manifest)
    return manifest


def append_index(source, index_dir: str, cfg: BuildConfig | None = None,
                 drop_urls: frozenset | None = None,
                 manifest_extra: dict | None = None) -> dict:
    """Append NEW documents to an existing index as a new segment
    generation (SURVEY.md 'grow-by-crawling' analog; VERDICT r1 missing
    item 1). Only the new source is read/tokenized; existing segments
    are immutable. Corpus stats (n_docs, avgdl) merge as a metadata
    combine; query-time idf/tf_norm use the merged stats, and stale
    per-file block-max bounds stay rank-safe via the encode_avgdl
    scaling in the query engine. Rank-identity with a one-shot build
    over the union corpus is asserted in ``tests/test_append.py``.

    An interrupted append is resumed by re-running with the same
    source: the generation's docstats cache + per-partition manifests
    skip finished work. Known window: until the re-run completes, a
    query engine opened on the index serves the already-committed new
    segments under the OLD global stats (scores shift slightly; no
    crashes, no missing old docs). New docs are assumed disjoint from
    existing ones (dedup_urls applies within a generation only).

    NOTE the resume contract covers INTERRUPTED appends only: re-running
    a COMPLETED append allocates a fresh generation and appends the
    docs again (the call cannot distinguish "same delta retried" from
    "next delta"). Callers needing exactly-once file ingest record an
    identity via ``manifest_extra`` — a dict merged into the global
    manifest inside the SAME atomic write that commits the append
    (``watch.ingest_once`` stores its drop-file fingerprint there, so a
    crash between the append's commit and its ingest marker cannot
    double-ingest on restart).
    """
    import ray

    cfg = cfg or BuildConfig()
    layout = IndexLayout(index_dir)
    old = layout.read_manifest()
    t_start = time.perf_counter()
    phases: dict[str, float] = {}

    def mark(name: str, since: float) -> float:
        now = time.perf_counter()
        phases[name] = round(now - since, 3)
        return now

    gen = int(old.get("n_generations", 1))
    base_offset = int(old.get("id_ceiling") or 0)
    corpus, id_col, id_ceiling = load_corpus(
        source, cfg, base_id_offset=base_offset, drop_urls=drop_urls
    )
    if cfg.id_col:
        id_mode = f"col:{cfg.id_col}"
    elif id_col == "doc_id":
        id_mode = "dense-file-offset"
    else:
        id_mode = "hash64(url)"
    fp = config_fingerprint(cfg, id_mode)
    if old.get("config_fp") != fp:
        raise ValueError(
            f"append config fingerprint {fp!r} != index {old.get('config_fp')!r}; "
            "an append must use the exact config the index was built with"
        )
    gen_stats_cached = layout.read_docstats(gen)
    if gen_stats_cached is not None and gen_stats_cached.get("source_spec") not in (
        None, str(source),
    ):
        raise ValueError(
            f"generation {gen} has an in-progress append from a different "
            f"source ({gen_stats_cached.get('source_spec')!r}); finish it "
            "with the same source or delete its docstats/partition files"
        )

    tokenized = corpus.map_batches(
        tokenize_batch,
        fn_kwargs={
            "id_col": id_col,
            "positions": cfg.positions,
            "attrs": cfg.attrs,
            "title_boost": cfg.title_boost,
            "stopwords": cfg.stopwords,
            "stem": cfg.stem,
            "synonyms": cfg.synonyms,
        },
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
    )
    cache_tok = cfg.cache_tokenized
    if cache_tok is None:
        try:
            est = int(corpus.size_bytes() or 0)
        except Exception:
            est = 0
        store = float(ray.cluster_resources().get("object_store_memory", 0.0))
        cache_tok = not (
            store > 0 and est * _TOKENIZED_BLOWUP > store * _CACHE_STORE_FRAC
        )
    if cache_tok:
        tokenized = tokenized.materialize()
    t = mark("tokenize", t_start)

    new_stats = _pass1_stats(tokenized, cfg, layout, fp, gen=gen)
    if "source_spec" not in new_stats:
        new_stats["source_spec"] = str(source)
        layout.write_docstats(new_stats, gen)
    t = mark("stats_df_docmeta", t)

    # merged corpus stats — a pure metadata combine
    n_docs = int(old["n_docs"]) + int(new_stats["n_docs"])
    sum_dl = int(old.get("sum_dl") or round(old["avgdl"] * old["n_docs"])) + int(
        new_stats["sum_dl"]
    )
    avgdl = sum_dl / n_docs if n_docs else 0.0

    # salting for NEW postings: old heavy set ∪ terms heavy in the new
    # slice (a perf knob — query reads every sub-partition of a shard,
    # so differing salting across generations is invisible to results)
    old_stats = layout.read_docstats(0) or {"heavy_terms": []}
    heavy = frozenset(old_stats["heavy_terms"]) | frozenset(new_stats["heavy_terms"])
    heavy_ref = ray.put(heavy)

    committed_before = layout.committed_parts(gen)
    dl_ref = None
    if id_ceiling is not None and id_ceiling <= cfg.dl_broadcast_max_ids:
        dl_ref = _broadcast_dl_array(layout, gen, id_ceiling)
    exploded = tokenized.map_batches(
        explode_batch,
        fn_kwargs={
            "num_shards": cfg.num_shards,
            "salt_subs": cfg.salt_subs,
            "heavy_ref": heavy_ref,
            "skip_parts": frozenset(committed_before.keys()),
            "docid32": id_ceiling is not None and id_ceiling < 2**31,
            "emit_dl": dl_ref is None,
            "emit_pos": cfg.positions,
        },
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
    )
    # NEW postings' block-max bounds use the MERGED avgdl (current truth)
    build_fn = _build_partition_fn(
        index_dir, avgdl, cfg.params, config_fp=fp, gen=gen, dl_ref=dl_ref,
        positions=cfg.positions,
    )
    part_stats = (
        exploded.groupby("part")
        .map_groups(build_fn, batch_format="pyarrow")
        .to_pandas()
    )
    mark("explode_shuffle_build", t)

    elapsed = time.perf_counter() - t_start
    all_parts = layout.committed_parts_all_gens()
    manifest = dict(old)
    manifest.update(
        {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": avgdl,
            "id_ceiling": id_ceiling,
            "n_generations": gen + 1,
            "n_partitions": len({(m["part"]) for m in all_parts}),
            "n_partitions_built_this_run": int(len(part_stats)),
            "total_postings": int(sum(m["n_postings"] for m in all_parts)),
            "total_posting_bytes": int(sum(m["posting_bytes"] for m in all_parts)),
            "build_wall_sec": round(elapsed, 3),
            "phase_secs": phases,
            "docs_per_sec": (
                round(int(new_stats["n_docs"]) / elapsed, 1) if elapsed > 0 else None
            ),
        }
    )
    for k, v in (manifest_extra or {}).items():
        manifest[k] = v
    layout.write_manifest(manifest)
    return manifest


def append_index_dedup(
    source,
    index_dir: str,
    cfg: BuildConfig | None = None,
    threshold: float = 0.9,
    manifest_extra: dict | None = None,
) -> dict:
    """Near-dup-aware append: drop delta docs that near-duplicate (a)
    anything ALREADY INDEXED — checked against the persisted signature
    store, no old text re-read — or (b) another delta doc (smaller
    hash64(url) key wins), then append the survivors as a new
    generation and add THEIR signatures to the store so the next
    append dedups against them too.

    Requires the index to have been built with ``sig_store=True``
    (CLI: ``build --sigstore``) — the store needs the original text,
    which the index alone no longer has. The
    drop set is deterministic given (source, store), so re-running an
    interrupted append converges exactly like plain ``append_index``.
    Threshold is on the MinHash Jaccard ESTIMATE (std ≈ 0.04 at the
    128-perm default — see stages/sigstore.py).
    """
    import ray
    import ray.data as rd

    from dataclasses import replace

    from zensearch_ray.stages import sigstore as ss

    cfg = cfg or BuildConfig()
    store = ss.store_dir_of(index_dir)
    meta = ss.read_meta(store)
    if meta is None:
        raise FileNotFoundError(
            f"{store} does not exist — build the index with sig_store=True "
            "(CLI: build --sigstore) or create it with the sigstore command "
            "before appending with near-dedup"
        )
    scfg = ss.SigConfig(**meta["config"])

    t0 = time.perf_counter()
    # delta view under the SAME ingest filters the append will apply
    # (lang, within-delta url dedup), but with no id assignment — the
    # store keys on hash64(url), independent of the index id mode
    dcfg = replace(cfg, id_col=None, dense_ids=False)
    delta, _, _ = load_corpus(source, dcfg)
    delta_sigs = delta.map_batches(
        ss.SigStage, fn_constructor_kwargs={"scfg": scfg},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 16),
    )
    # keep the concat CHUNKED: combining would overflow the binary
    # column's int32 offsets beyond ~2 GB of signatures, and every
    # consumer handles chunks. (The delta ≪ corpus contract still
    # bounds this driver-side table — see stages/sigstore.py.)
    delta_tbl = pa.concat_tables(
        [ray.get(r) for r in delta_sigs.to_arrow_refs()]
    )
    dropped, pairs_checked = ss.near_dup_vs_store(
        delta_tbl, store, threshold=threshold, scfg=scfg
    )
    t_dedup = round(time.perf_counter() - t0, 3)

    drop_urls = frozenset(u for (u, _k) in dropped.values())
    manifest = append_index(source, index_dir, cfg, drop_urls=drop_urls,
                            manifest_extra=manifest_extra)
    gen = int(manifest["n_generations"]) - 1

    if dropped:
        keep_mask = pc.invert(
            pc.is_in(
                delta_tbl["key"],
                value_set=pa.array(sorted(dropped), type=pa.int64()),
            )
        )
        kept_tbl = delta_tbl.filter(keep_mask)
    else:
        kept_tbl = delta_tbl
    if kept_tbl.num_rows:
        ss.append_sig_store(rd.from_arrow(kept_tbl), store, gen)

    manifest["near_dedup"] = {
        "threshold": threshold,
        "pairs_checked": pairs_checked,
        "dropped": len(dropped),
        "dedup_sec": t_dedup,
        "dropped_sample": [
            {"url": u, "matched_key": k}
            for (u, k) in list(dropped.values())[:20]
        ],
    }
    IndexLayout(index_dir).write_manifest(manifest)
    # full drop list rides the RETURN only (callers/reporting); the
    # persisted manifest keeps the bounded sample — at 10^12-doc scale
    # a day's drop list does not belong in one JSON file
    manifest["near_dedup"] = dict(
        manifest["near_dedup"],
        dropped_urls=sorted(u for (u, _k) in dropped.values()),
    )
    return manifest
