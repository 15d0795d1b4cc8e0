"""Analyzer migration WITHOUT re-reading the corpus: derive a
stemmed / stopword-filtered / synonym-folded index from a committed
plain index's OWN postings.

Elasticsearch cannot do this — changing an analyzer means re-ingesting
`_source` through the full text pipeline. Here the three supported
analyzers (Lucene StopFilter semantics, the pinned S-stemmer,
index-time synonym folding — ``stages/tokenize.TokenizeStage``) are all
PER-TOKEN maps, so the target index is a pure function of the source
index's ``(term, doc_id, tf)`` rows:

    tf'(t', d) = Σ_{t : analyze(t) = t'} tf(t, d)
    doc_len'(d) = Σ_{t'} tf'(t', d)          (stop terms drop out)
    df/avgdl/idf follow from the above — identical to a from-corpus
    build with the same analyzer config (asserted bit-equivalent on
    decoded postings in ``tests/test_reindex.py``).

Distributed shape (corpus text is NEVER touched):

1. ``dump_postings`` streams the committed segments back as
   ``(term, doc_id, tf)`` rows (posting-scale, the index's own size —
   typically ~10× smaller than the corpus text it summarizes).
2. A map pass applies the per-token analyzer to each batch's UNIQUE
   terms (dictionary-encoded: stopword drop → synonym fold → stem,
   the exact ``TokenizeStage`` order) and re-emits mapped rows.
3. ONE doc-keyed bucket exchange joins the mapped posting rows with
   the source docmeta rows (the doc universe — docs with zero
   surviving terms, including originally-empty docs, must still count
   in n_docs/avgdl/docmeta exactly as a direct build counts them) and
   reassembles per-doc ``(terms, tfs, doc_len)`` histogram rows — the
   same schema ``tokenize_batch`` produces.
4. The reconstructed tokenized Dataset runs through the UNMODIFIED
   build pipeline: ``_pass1_stats`` (stats + docmeta) → ``explode_batch``
   → term-shard groupby → ``_build_partition_fn`` (codec + block-max +
   lineage manifests). Resume/commit semantics are therefore identical
   to ``build_index``.

Reindexing an appended index also COMPACTS it (every generation's
postings feed one gen-0 output), mirroring ``compact_index``.

Positional sources migrate too (``cfg.positions=True``): each merged
``(doc, term')`` row's position list is the sorted union of its source
terms' occurrence offsets (disjoint by construction — distinct tokens
at distinct offsets), so PHRASE queries on the reindexed index answer
identically to a from-corpus positional build. Stopwords remain
incompatible with positions (token removal changes adjacency), exactly
as in the direct build; a positional source may also be downgraded to
a positionless target by leaving ``cfg.positions`` off.

Out of scope, guarded loudly: ``title_boost`` (field mixing is not
recoverable from summed tfs), sources that already carry an analyzer
(composing analyzers ≠ applying the composition to raw text — e.g.
S-stem is not idempotent across its rules), and tombstoned sources
(run ``compact_index`` first so the doc universe is unambiguous).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from zensearch_ray.functions.text import s_stem, tokenize
from zensearch_ray.pipelines.build_index import (
    CODEC_SPEC,
    TOKENIZER_SPEC,
    BuildConfig,
    _build_partition_fn,
    _pass1_stats,
    config_fingerprint,
)
from zensearch_ray.state.manifest import IndexLayout

_MIX = np.uint64(2654435761)


def _analyzer_map(cfg: BuildConfig):
    """Per-unique-term analyzer: returns ``None`` for dropped (stop)
    terms, else the mapped term — stopwords → synonyms → stem, the
    pinned ``TokenizeStage`` order."""
    stop = frozenset(cfg.stopwords)
    syn = {}
    for a, b in cfg.synonyms:
        ta, tb = tokenize(a), tokenize(b)
        if len(ta) != 1 or len(tb) != 1:
            raise ValueError(
                f"synonym pair {(a, b)!r} must be single tokens of the "
                "pinned tokenizer"
            )
        syn[ta[0]] = tb[0]
    stem = cfg.stem

    def one(t: str) -> str | None:
        if t in stop:
            return None
        t = syn.get(t, t)
        return s_stem(t) if stem else t

    return one


def _doc_bucket(doc_ids: np.ndarray, n_buckets: int) -> np.ndarray:
    return (
        (doc_ids.astype(np.uint64) * _MIX) % np.uint64(n_buckets)
    ).astype(np.int32)


def reindex_analyzer(
    src_dir: str,
    dst_dir: str,
    cfg: BuildConfig,
    n_doc_buckets: int = 64,
) -> dict:
    """Build the analyzer-migrated index at ``dst_dir`` from the
    committed index at ``src_dir``. Returns the new global manifest.
    ``cfg`` carries the TARGET analyzer (stopwords/stem/synonyms) plus
    layout knobs (num_shards, salt_subs, params, attrs); the doc-id
    scheme is inherited from the source. Never calls ray.init."""
    import ray
    import ray.data as rd

    from zensearch_ray.pipelines.export import dump_postings
    from zensearch_ray.stages.tokenize import explode_batch

    src = IndexLayout(src_dir)
    man = src.read_manifest()
    if cfg.positions and not man.get("positions"):
        raise ValueError(
            "cfg.positions=True but the source index carries no "
            "positions — they cannot be invented from tfs"
        )
    if cfg.positions and cfg.stopwords:
        raise ValueError(
            "stopwords are incompatible with a positional target "
            "(token removal changes phrase adjacency semantics)"
        )
    if cfg.title_boost:
        raise ValueError(
            "title_boost cannot be applied by reindex: field-boosted "
            "tfs are not recoverable from summed postings"
        )
    if man.get("stopwords") or man.get("stem") or man.get("synonyms"):
        raise ValueError(
            "source index already carries an analyzer "
            f"(stopwords={man.get('stopwords')}, stem={man.get('stem')}, "
            f"synonyms={man.get('synonyms')}); reindex composes per-token "
            "maps on a PLAIN source only — rebuild from corpus instead"
        )
    if len(src.read_deletes()):
        raise ValueError(
            "source index has tombstones; run compact_index first so "
            "the reindexed doc universe is unambiguous"
        )
    if not (cfg.stopwords or cfg.stem or cfg.synonyms):
        raise ValueError("cfg carries no analyzer — use compact_index "
                         "for a plain rewrite")

    t_start = time.perf_counter()
    phases: dict[str, float] = {}

    def mark(name: str, since: float) -> float:
        now = time.perf_counter()
        phases[name] = round(now - since, 3)
        return now

    id_mode = man["id_mode"]
    id_ceiling = man.get("id_ceiling")
    fp = config_fingerprint(cfg, id_mode)
    layout = IndexLayout(dst_dir)
    layout.ensure_dirs()
    # resume safety (mirrors build_index): refuse to mix artifacts from
    # a previous run under a DIFFERENT analyzer config — stale docstats
    # or retained partitions would be silent index corruption
    prior_stats = layout.read_docstats()
    if prior_stats is not None and prior_stats.get("config_fp") != fp:
        raise ValueError(
            f"reindex target {dst_dir} holds docstats built under config "
            f"{prior_stats.get('config_fp')!r} != current {fp!r}; use a "
            "fresh output dir (or delete it) to reindex with a new config"
        )
    for part, m in layout.committed_parts().items():
        if m.get("config_fp") != fp:
            raise ValueError(
                f"reindex target {dst_dir} partition {part} was committed "
                f"under config {m.get('config_fp')!r} != current {fp!r}; "
                "use a fresh output dir to reindex with a new config"
            )

    # ---- stage 2: map the analyzer over posting rows (term-unique) ----
    analyze = _analyzer_map(cfg)
    positions = bool(cfg.positions)

    def map_terms(batch: pa.Table) -> pa.Table:
        term = batch["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        dic = term.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        vocab = dic.dictionary.to_pylist()
        mapped = [analyze(t) for t in vocab]
        keep_by_code = np.array([m is not None for m in mapped], dtype=bool)
        keep = keep_by_code[codes]
        new_vocab = pa.array(
            [m if m is not None else "" for m in mapped], type=pa.string()
        )
        doc_ids = (
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        )
        keep_idx = pa.array(np.flatnonzero(keep))
        cols = {
            "doc_id": pa.array(doc_ids),
            "term": new_vocab.take(pa.array(codes[keep])),
            "tf": batch["tf"].cast(pa.int32()).take(keep_idx),
            "__bucket": pa.array(_doc_bucket(doc_ids, n_doc_buckets)),
        }
        if positions:
            pcol = batch["pos"]
            if isinstance(pcol, pa.ChunkedArray):
                pcol = pcol.combine_chunks()
            cols["pos"] = pcol.take(keep_idx)
        return pa.table(cols)

    posting_rows = dump_postings(src_dir, positions=positions).map_batches(
        map_terms, batch_format="pyarrow"
    )

    # ---- doc universe + metadata from src docmeta (all generations:
    # appended gens nest INSIDE docmeta_dir and the directory read is
    # recursive, so the root alone covers every generation exactly
    # once — listing gen subdirs explicitly would double-read them) ----
    meta_ds = rd.read_parquet(src.docmeta_gen_dir(0))
    meta_schema = meta_ds.schema()
    meta_names = [
        c for c in meta_schema.names if c not in ("doc_id", "doc_len")
    ]
    meta_types = {
        c: meta_schema.base_schema.field(c).type for c in meta_names
    }
    for a in cfg.attrs:
        if a not in meta_names:
            raise ValueError(
                f"cfg.attrs {cfg.attrs} not all present in source docmeta "
                f"(columns: {meta_names})"
            )

    def meta_side(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "doc_id": pa.array(doc_ids),
            "term": pa.nulls(len(doc_ids), type=pa.string()),
            "tf": pa.nulls(len(doc_ids), type=pa.int32()),
            "__bucket": pa.array(_doc_bucket(doc_ids, n_doc_buckets)),
        }
        if positions:
            cols["pos"] = pa.nulls(len(doc_ids), type=pa.list_(pa.int32()))
        for c in meta_names:
            cols[f"m_{c}"] = batch[c]
        return pa.table(cols)

    def post_side(batch: pa.Table) -> pa.Table:
        cols = {
            "doc_id": batch["doc_id"],
            "term": batch["term"],
            "tf": batch["tf"],
            "__bucket": batch["__bucket"],
        }
        if positions:
            cols["pos"] = batch["pos"]
        for c in meta_names:
            cols[f"m_{c}"] = pa.nulls(batch.num_rows, type=meta_types[c])
        return pa.table(cols)

    # materialize BOTH union inputs before the bucket exchange: the
    # streaming UnionOperator buffers its inputs without emitting until
    # they finish, so at corpus scale the downstream sort never starts
    # and upstream backpressure livelocks the whole plan (observed at
    # 430M posting rows: union held 4 GB of blocks, 0 emitted, while
    # 23 of 24 CPUs idled). With materialized inputs the union forwards
    # ready block refs instantly; the store spills as designed.
    tagged = (
        meta_ds.map_batches(meta_side, batch_format="pyarrow")
        .materialize()
        .union(
            posting_rows.map_batches(
                post_side, batch_format="pyarrow"
            ).materialize()
        )
    )

    # ---- stage 3: per-doc reassembly (tokenized-row schema) ------------
    def assemble(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        is_meta = pc.is_null(g["term"]).to_numpy(zero_copy_only=False)
        meta = g.filter(pa.array(is_meta))
        post = g.filter(pa.array(~is_meta))
        m_ids = meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m_order = np.argsort(m_ids, kind="stable")
        m_ids = m_ids[m_order]

        p_ids = post["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tcol = post["term"]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        dic = tcol.dictionary_encode()
        tcodes = np.asarray(dic.indices, dtype=np.int64) if post.num_rows else np.empty(0, np.int64)
        tfs = post["tf"].to_numpy(zero_copy_only=False).astype(np.int64)

        # merge tf per (doc, term'): sort, run boundaries, reduceat
        order = np.lexsort((tcodes, p_ids))
        d_s, c_s, tf_s = p_ids[order], tcodes[order], tfs[order]
        if len(d_s):
            new = np.r_[True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
            starts = np.flatnonzero(new)
            m_doc = d_s[starts]
            m_code = c_s[starts]
            m_tf = np.add.reduceat(tf_s, starts)
        else:
            m_doc = np.empty(0, np.int64)
            m_code = np.empty(0, np.int64)
            m_tf = np.empty(0, np.int64)

        m_pos_flat = m_pos_offs = None
        if positions:
            # merge position lists under term folding: the merged
            # (doc, term') row's positions are the UNION of its source
            # terms' occurrence offsets — disjoint by construction
            # (distinct tokens at distinct offsets), sorted per merged
            # row via one segment-keyed lexsort (no Python loop)
            pcol = post["pos"]
            if isinstance(pcol, pa.ChunkedArray):
                pcol = pcol.combine_chunks()
            v = pcol.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.asarray(pcol.offsets, dtype=np.int64)
            row_lens = (o[1:] - o[:-1])
            starts_r = o[:-1][order]
            lens_r = row_lens[order]
            total = int(lens_r.sum())
            # gather each sorted row's slice into one contiguous stream
            cum = np.zeros(len(lens_r) + 1, dtype=np.int64)
            np.cumsum(lens_r, out=cum[1:])
            idx = (
                np.repeat(starts_r - cum[:-1], lens_r)
                + np.arange(total, dtype=np.int64)
            )
            v_rows = v[idx]
            if len(d_s):
                m_len = np.add.reduceat(lens_r, starts)
            else:
                m_len = np.empty(0, np.int64)
            seg = np.repeat(np.arange(len(m_len), dtype=np.int64), m_len)
            v_sorted = v_rows[np.lexsort((v_rows, seg))]
            m_pos_flat = v_sorted
            m_pos_offs = np.zeros(len(m_len) + 1, dtype=np.int32)
            np.cumsum(m_len, out=m_pos_offs[1:])

        # per-doc slices of the merged rows, aligned to the sorted
        # doc universe (docs with no surviving terms get empty lists)
        lo = np.searchsorted(m_doc, m_ids, "left")
        hi = np.searchsorted(m_doc, m_ids, "right")
        counts = hi - lo
        offs = np.zeros(len(m_ids) + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        # m_doc is sorted and every merged doc exists in the universe,
        # so concatenating the slices in m_ids order IS m_code/m_tf
        # in their existing order
        off_arr = pa.array(offs, type=pa.int32())
        flat_terms = (
            dic.dictionary.take(pa.array(m_code))
            if len(m_code)
            else pa.array([], type=pa.string())
        )
        doc_len = np.zeros(len(m_ids), dtype=np.int64)
        np.add.at(doc_len, np.repeat(np.arange(len(m_ids)), counts), m_tf)

        cols = {
            "doc_id": pa.array(m_ids, type=pa.int64()),
        }
        for c in meta_names:
            col = meta[f"m_{c}"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[c] = col.take(pa.array(m_order))
        cols["doc_len"] = pa.array(doc_len, type=pa.int64())
        cols["terms"] = pa.ListArray.from_arrays(off_arr, flat_terms)
        cols["tfs"] = pa.ListArray.from_arrays(
            off_arr, pa.array(m_tf.astype(np.int32), type=pa.int32())
        )
        if positions:
            inner = pa.ListArray.from_arrays(
                pa.array(m_pos_offs, type=pa.int32()),
                pa.array(m_pos_flat.astype(np.int32), type=pa.int32()),
            )
            cols["poss"] = pa.ListArray.from_arrays(off_arr, inner)
        return pa.table(cols)

    tokenized = tagged.groupby("__bucket").map_groups(
        assemble, batch_format="pyarrow"
    )
    cache_tok = cfg.cache_tokenized
    if cache_tok is None:
        # AUTO (mirrors build_index): the reassembled corpus is worth
        # pinning while it fits a bounded store share — here the
        # upstream (decode + union + bucket exchange) is expensive, so
        # the estimate comes from the ENCODED posting bytes times the
        # measured decode blowup (~8×)
        est = int(man.get("total_posting_bytes", 0)) * 8
        store = float(ray.cluster_resources().get("object_store_memory", 0.0))
        cache_tok = not (store > 0 and est > store * 0.5)
    if cache_tok:
        tokenized = tokenized.materialize()
    t = mark("remap_reassemble", t_start)

    # ---- stage 4: the unmodified build pipeline ------------------------
    stats = _pass1_stats(tokenized, cfg, layout, fp, gen=0)
    t = mark("stats_df_docmeta", t)
    avgdl = float(stats["avgdl"])
    heavy_ref = ray.put(frozenset(stats["heavy_terms"]))
    committed_before = layout.committed_parts()
    exploded = tokenized.map_batches(
        explode_batch,
        fn_kwargs={
            "num_shards": cfg.num_shards,
            "salt_subs": cfg.salt_subs,
            "heavy_ref": heavy_ref,
            "skip_parts": frozenset(committed_before.keys()),
            "docid32": id_ceiling is not None and id_ceiling < 2**31,
            "emit_dl": True,
            "emit_pos": positions,
        },
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
    )
    build_fn = _build_partition_fn(
        dst_dir, avgdl, cfg.params, config_fp=fp, positions=positions
    )
    part_stats = (
        exploded.groupby("part")
        .map_groups(build_fn, batch_format="pyarrow")
        .to_pandas()
    )
    t = mark("explode_shuffle_build", t)

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
        "positions": positions,
        "stopwords": sorted(cfg.stopwords),
        "stem": cfg.stem,
        "synonyms": sorted(map(list, cfg.synonyms)),
        "k1": cfg.params.k1,
        "b": cfg.params.b,
        "heavy_df_threshold": stats["heavy_df_threshold"],
        "n_heavy_terms": len(stats["heavy_terms"]),
        "n_partitions": len(committed),
        "n_partitions_built_this_run": int(len(part_stats)),
        "total_postings": int(
            sum(m["n_postings"] for m in committed.values())
        ),
        "total_posting_bytes": int(
            sum(m["posting_bytes"] for m in committed.values())
        ),
        "build_wall_sec": round(elapsed, 3),
        "phase_secs": phases,
        "reindexed_from": src_dir,
        "docs_per_sec": (
            round(stats["n_docs"] / elapsed, 1) if elapsed > 0 else None
        ),
    }
    layout.write_manifest(manifest)
    return manifest
