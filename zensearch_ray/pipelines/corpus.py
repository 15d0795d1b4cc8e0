"""Corpus-level text pipelines over the ``documents`` test table —
the SQL-checkable faces of the engine's tokenize/stat/df/BM25 operators.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame whose
columns match the DuckDB oracle in ``__ray_entry__.oracle_sql`` exactly
(names AND values).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ray.data.aggregate import Sum

from zensearch_ray.functions.ids import hash64
from zensearch_ray.functions.text import tokenize
from zensearch_ray.functions.rounding import round6
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.stages.tokenize import df_partials, doc_stat_partials, tokenize_batch
from zensearch_ray.state.manifest import IndexLayout


def _documents(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _documents_for_index(sf_dir: str):
    """Index-build reader: text plus the facet attr columns the
    _INDEX_CFG docmeta carries (lang, source)."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )


def _tokenized(sf_dir: str):
    return _documents(sf_dir).map_batches(
        tokenize_batch,
        fn_kwargs={"id_col": "doc_id"},
        batch_format="pyarrow",
    )


def doc_stats(sf_dir: str):
    """Per-doc token count (E8 semantics)."""
    return _tokenized(sf_dir).select_columns(["doc_id", "doc_len"])


def corpus_stats(sf_dir: str) -> pd.DataFrame:
    """Global (N, total_tokens, avgdl) — A1 as partial-then-combine."""
    partials = _tokenized(sf_dir).map_batches(
        doc_stat_partials, batch_format="pyarrow"
    ).to_pandas()
    n = int(partials["n_docs"].sum())
    total = int(partials["sum_dl"].sum())
    return pd.DataFrame(
        {
            "n_docs": [n],
            "total_tokens": [total],
            "avgdl": [round6(total / n) if n else 0.0],
        }
    )


def term_df(sf_dir: str):
    """term → document frequency (A2): map-side partials, then a
    bucketed groupby-sum (vocabulary can be huge — per-bucket pandas
    combine, not per-term Python)."""
    from zensearch_ray.functions.agg import bucketed_groupby_sum

    agg = bucketed_groupby_sum(
        _tokenized(sf_dir).map_batches(df_partials, batch_format="pyarrow"),
        keys=["term"],
        sum_cols=["df_partial"],
    )
    return agg.map_batches(
        lambda t: t.rename_columns(["term", "df"]), batch_format="pyarrow"
    )


def term_tf(sf_dir: str):
    """(doc_id, term, tf) exploded histogram (A3, token equality)."""

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        terms_col = batch["terms"].combine_chunks()
        tfs_col = batch["tfs"].combine_chunks()
        lens = np.asarray(pc.list_value_length(terms_col), dtype=np.int64)
        rep_doc = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        return pa.table(
            {
                "doc_id": pa.array(rep_doc, type=pa.int64()),
                # tokenize now ships terms dictionary-encoded; cast back
                # to plain string here so term_tf's public schema (and
                # every pandas consumer downstream) stays stable
                "term": terms_col.flatten().cast(pa.string()),
                "tf": tfs_col.flatten().cast(pa.int64()),
            }
        )

    return _tokenized(sf_dir).map_batches(explode, batch_format="pyarrow")


def exact_dedup(sf_dir: str):
    """Exact content dedup over documents: keep min-doc_id row per
    identical text (A7/D1 semantics as an explicit operator)."""
    import ray.data as rd

    from zensearch_ray.stages.dedup import dedup_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_by_key(ds, "text", order_col="doc_id")


PREP_MIN_TOKENS = 40
PREP_MAX_STOP_RATIO = 0.1


def docs_prepared(sf_dir: str):
    """The composite training-data prep pipeline (the engine's stages
    chained the way a real corpus-prep job runs them): exact content
    dedup (keep min doc_id) → language filter → quality scoring →
    threshold filter → (doc_id, n_tokens, stop_ratio) of the surviving
    documents. Every stage is the already-oracle-checked operator; this
    entry checks their COMPOSITION end-to-end against one SQL oracle.

    Scale shape: dedup is the duplicate-sliver broadcast (no corpus
    shuffle), everything after is map-only — the whole pipeline
    streams."""
    import ray.data as rd
    import pyarrow.compute as pc

    from zensearch_ray.stages.dedup import dedup_by_key
    from zensearch_ray.stages.textstats import token_quality_batch

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    deduped = dedup_by_key(ds, "text", order_col="doc_id")
    en = deduped.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")), batch_format="pyarrow"
    )

    def qual(batch: pa.Table) -> pa.Table:
        q = token_quality_batch(batch)
        keep = pc.and_(
            pc.greater_equal(q["n_tokens"], PREP_MIN_TOKENS),
            pc.less_equal(q["stop_ratio"], PREP_MAX_STOP_RATIO),
        )
        return q.select(["doc_id", "n_tokens", "stop_ratio"]).filter(keep)

    return en.map_batches(qual, batch_format="pyarrow")


QUALITY_PCT = 0.75


def quality_percentile_filter(sf_dir: str, q: float = QUALITY_PCT):
    """FineWeb-style percentile thresholding: keep every document whose
    quality score is <= the corpus's EXACT q-th percentile of that
    score (percentile_disc semantics) — the cut adapts to the corpus
    instead of a hand-picked constant. Score here is ``stop_ratio``
    (already round6-pinned), so the oracle reproduces both the score
    and the threshold bit-for-bit.

    Scale shape: one scoring pass materializes only the 24 B/doc
    (doc_id, n_tokens, stop_ratio) projection (spillable; at extreme
    corpus sizes write it to parquet instead); the threshold comes from
    ``exact_quantiles`` (sample + bracket-count passes, no sort); the
    filter is one broadcast-scalar map over the scored projection. The
    text is read exactly once."""
    import ray.data as rd
    import pyarrow.compute as pc

    from zensearch_ray.stages.quantiles import exact_quantiles
    from zensearch_ray.stages.textstats import token_quality_batch

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    scores = ds.map_batches(
        lambda b: token_quality_batch(b).select(
            ["doc_id", "n_tokens", "stop_ratio"]
        ),
        batch_format="pyarrow",
    ).materialize()
    thr = float(exact_quantiles(scores, "stop_ratio", [q])["value"].iloc[0])
    return scores.map_batches(
        lambda b: b.filter(pc.less_equal(b["stop_ratio"], thr)),
        batch_format="pyarrow",
    )


CHUNK_TOKENS = 50


def docs_chunked(sf_dir: str, chunk_tokens: int = CHUNK_TOKENS):
    """Document chunking for training-data prep: split every document
    into fixed-size token windows (last partial chunk kept). Map-only
    flat explode — no shuffle; output rows carry (doc_id, chunk_id,
    chunk_text, n_tokens). The chunk text is the canonical token
    stream re-joined, so chunk boundaries are tokenizer-defined, not
    byte offsets."""
    import ray.data as rd

    from zensearch_ray.functions.text import tokenize

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, texts, lens = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = tokenize(text)
            for ci in range(0, (len(toks) + chunk_tokens - 1) // chunk_tokens):
                part = toks[ci * chunk_tokens:(ci + 1) * chunk_tokens]
                doc_ids.append(did)
                chunk_ids.append(ci)
                texts.append(" ".join(part))
                lens.append(len(part))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "chunk_id": pa.array(chunk_ids, type=pa.int64()),
                "chunk_text": pa.array(texts, type=pa.string()),
                "n_tokens": pa.array(lens, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def lang_balanced_sample(sf_dir: str, per_lang: int = 20):
    """Stratified (balanced-per-group) deterministic sample: the first
    ``per_lang`` docs of every language under a multiplicative-hash
    order — the reproducible way to draw a balanced eval slice from a
    skewed corpus. Same partial-top-N shape as grouped top-N: each
    batch emits at most ``per_lang`` rows per language, the bucket
    combine finishes the selection; reruns and cluster-size changes
    cannot alter the sample."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def headn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(h=(df["doc_id"].to_numpy(np.int64) * 48271) % 65536)
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return df.groupby("lang", as_index=False).head(per_lang)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return headn(df)[["lang", "doc_id"]]

    # languages are few: single-bucket final combine via constant key
    partials = ds.map_batches(headn, batch_format="pandas")
    return (
        partials.map_batches(
            lambda t: t.append_column("__one", pa.array(np.zeros(t.num_rows, np.int32))),
            batch_format="pyarrow",
        )
        .groupby("__one")
        .map_groups(finish, batch_format="pandas")
    )


PACK_SEQ_LEN = 64
PACK_BUCKETS = 32


def pack_sequences(
    sf_dir: str, seq_len: int = PACK_SEQ_LEN, n_buckets: int = PACK_BUCKETS
):
    """GPT-style sequence packing layout: docs in doc_id order form one
    token stream; training sequence ``s`` covers stream positions
    [s·L, (s+1)·L). Emits one row per (sequence, document) span —
    ``(seq_id, doc_id, doc_off, seq_off, n_tokens)`` — the exact copy
    plan a training-data writer executes (empty docs excluded).

    The global stream offset is an ORDERED prefix sum, done in three
    scale-safe steps (nothing but (doc_id, dl) ever moves):

    1. map-only token counting → (doc_id, dl), 16 bytes/doc;
    2. bucket = doc_id // W for a fixed width W from the parquet
       footer's max-doc_id stats (metadata-only — no data pass), then
       a tiny ``groupby(bucket).sum`` whose NB partial sums come to
       the driver for an exclusive scan → per-bucket base offsets
       (NB numbers, broadcast back in the closure);
    3. one shuffle of the (doc_id, dl) pairs co-locates each bucket;
       per-group sort + cumsum + base yields every doc's stream start,
       and the span explode to (seq, doc) rows is pure numpy.

    At 10^12 docs the shuffle moves ~16 TB of ids+lengths — the
    theoretical minimum for an order-dependent layout — while the
    corpus text never leaves the map side."""
    import ray.data as rd

    from zensearch_ray.functions.text import tokenize

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    max_id = 0
    for rg in range(meta.num_row_groups):
        col = meta.row_group(rg).column(0)  # doc_id is column 0
        assert col.path_in_schema == "doc_id"
        max_id = max(max_id, col.statistics.max)
    width = max(1, (max_id + n_buckets) // n_buckets)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def doc_lens(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dl = np.fromiter(
            (len(tokenize(t)) for t in texts), dtype=np.int64, count=len(texts)
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = dl > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "dl": pa.array(dl[keep]),
                "bucket": pa.array((ids[keep] // width).astype(np.int32)),
            }
        )

    dl_ds = ds.map_batches(doc_lens, batch_format="pyarrow")
    sums = dl_ds.groupby("bucket").sum("dl").to_pandas()
    sums = sums.sort_values("bucket")
    base = np.zeros(n_buckets + 1, dtype=np.int64)
    bucket_ids = sums["bucket"].to_numpy()
    totals = sums["sum(dl)"].to_numpy(np.int64)
    acc = 0
    for b, t in zip(bucket_ids, totals):
        base[b] = acc
        acc += t

    def explode_spans(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        dl = g["dl"].to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        b = int(g["bucket"].iloc[0])
        start = base[b] + np.concatenate(([0], np.cumsum(dl[:-1])))
        first_seq = start // seq_len
        last_seq = (start + dl - 1) // seq_len
        nspan = last_seq - first_seq + 1
        doc_idx = np.repeat(np.arange(len(g)), nspan)
        span_base = np.cumsum(nspan) - nspan
        seq_id = first_seq[doc_idx] + (
            np.arange(len(doc_idx)) - span_base[doc_idx]
        )
        seg_start = np.maximum(start[doc_idx], seq_id * seq_len)
        seg_end = np.minimum(
            start[doc_idx] + dl[doc_idx], (seq_id + 1) * seq_len
        )
        return pd.DataFrame(
            {
                "seq_id": seq_id,
                "doc_id": ids[doc_idx],
                "doc_off": seg_start - start[doc_idx],
                "seq_off": seg_start - seq_id * seq_len,
                "n_tokens": seg_end - seg_start,
            }
        )

    return dl_ds.groupby("bucket").map_groups(explode_spans, batch_format="pandas")


def seeded_shuffle(sf_dir: str, seed: str = "r3", n_shards: int = 8):
    """Deterministic seeded global shuffle — the training-loader
    shuffle every data pipeline needs before writing shards: every doc
    gets a content-independent pseudo-random key ``md5(seed:doc_id)``,
    a shard from the key's last hex nibble, and a position within its
    shard in key order. Same (seed, corpus) → bit-identical layout on
    every rerun (resumable exports, reproducible training runs);
    changing ``seed`` re-deals everything.

    Scale shape: the pass reads doc_id ONLY (8 B/row pruned read); the
    one exchange moves (doc_id, 32-char key) metadata, never text —
    the writer that materializes shard files joins text back per shard
    partition. A shard group must fit a worker, which is the same
    constraint the training loader imposes on its files: pick
    ``n_shards`` ≈ corpus_bytes / desired_file_size (10⁴–10⁵ at web
    scale), exactly like ``balanced_shards``. md5 is pinned so the SQL
    oracle reproduces the values; a production variant would swap in a
    vectorized 64-bit mixer (splitmix64 over doc_id ⊕ hash(seed)) with
    identical plumbing.

    Columns: (doc_id, shuffle_key, shard, pos) — pos is 1-based within
    the shard, ordered by (shuffle_key, doc_id)."""
    import hashlib

    import ray.data as rd

    if 16 % n_shards != 0:
        # one hex nibble yields 16 equiprobable values; any other
        # modulus would bias shard sizes (and >16 would leave shards
        # permanently empty) — widen the key slice if you need more
        raise ValueError(
            "n_shards must divide 16 (1/2/4/8/16); for more shards "
            "derive the shard from more key nibbles"
        )
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys = [
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids
        ]
        shard = np.fromiter(
            (int(k[-1], 16) % n_shards for k in keys),
            dtype=np.int64,
            count=len(keys),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shuffle_key": pa.array(keys, pa.string()),
                "shard": pa.array(shard),
            }
        )

    def order(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("shuffle_key", "ascending"), ("doc_id", "ascending")],
        )
        g = group.take(idx)
        return g.append_column(
            "pos", pa.array(np.arange(1, g.num_rows + 1), pa.int64())
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(order, batch_format="pyarrow")
    )


def balanced_shards(
    sf_dir: str, n_shards: int = 8, n_buckets: int = PACK_BUCKETS
):
    """Token-balanced training shards: split the doc_id-ordered token
    stream into ``n_shards`` CONTIGUOUS ranges of near-equal token
    mass — ``shard(doc) = floor(prefix_tokens_before_doc · S / total)``
    — so every data-loader worker reads the same token volume (the
    imbalance is bounded by one document's length, the best any
    contiguous assignment can do; a greedy LPT bin-pack would balance
    marginally tighter but is inherently sequential — unusable at
    10^12 docs — and destroys range locality for resumable writes).

    Same three scale-safe steps as ``pack_sequences`` (which shares
    this prefix-sum machinery): map-only token counting (16 B/doc),
    a bucket-granular exclusive scan on the driver (NB numbers), one
    metadata-row exchange; integer arithmetic throughout so the SQL
    window-function oracle is bit-identical. Empty docs keep their
    stream position (dl=0). Output: (doc_id, dl, shard)."""
    import ray.data as rd

    from zensearch_ray.functions.text import tokenize

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    max_id = 0
    for rg in range(meta.num_row_groups):
        col = meta.row_group(rg).column(0)  # doc_id is column 0
        assert col.path_in_schema == "doc_id"
        max_id = max(max_id, col.statistics.max)
    width = max(1, (max_id + n_buckets) // n_buckets)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def doc_lens(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dl = np.fromiter(
            (len(tokenize(t)) for t in texts), dtype=np.int64, count=len(texts)
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "dl": pa.array(dl),
                "bucket": pa.array((ids // width).astype(np.int32)),
            }
        )

    dl_ds = ds.map_batches(doc_lens, batch_format="pyarrow")
    sums = dl_ds.groupby("bucket").sum("dl").to_pandas().sort_values("bucket")
    base = np.zeros(n_buckets + 1, dtype=np.int64)
    acc = 0
    for b, t in zip(sums["bucket"].to_numpy(), sums["sum(dl)"].to_numpy(np.int64)):
        base[b] = acc
        acc += int(t)
    total = max(acc, 1)  # all-empty corpus → every doc lands in shard 0

    def label(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        dl = g["dl"].to_numpy(np.int64)
        b = int(g["bucket"].iloc[0])
        cum = base[b] + np.concatenate(([0], np.cumsum(dl[:-1])))
        shard = np.minimum(cum * n_shards // total, n_shards - 1)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "dl": dl,
                "shard": shard.astype(np.int64),
            }
        )

    return dl_ds.groupby("bucket").map_groups(label, batch_format="pandas")


BPE_ISH_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def bpe_token_counts(sf_dir: str):
    """Token counting under a BPE-ish regex pre-tokenizer (letter runs
    | single digits | single punctuation — the GPT-2 pre-tokenizer
    shape without the tiktoken dependency), alongside the whitespace
    count. Compiled once per process; map-only."""
    import re

    import ray.data as rd

    pat = re.compile(BPE_ISH_PATTERN)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_bpe = np.fromiter(
            (len(pat.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
        )
        n_ws = np.fromiter(
            (len(t.split()) for t in texts), dtype=np.int64, count=len(texts)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(n_bpe),
                "n_ws_tokens": pa.array(n_ws),
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow")


def lang_source_counts(sf_dir: str):
    """Filter-free rollup by (lang, source): doc counts + char sums —
    the map-side-partial + tiny-groupby aggregation shape."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(n_docs=1)
        return batch.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("n_chars", "sum")
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 over the documents table, via the real index (cached per sf_dir)
# ---------------------------------------------------------------------------

_INDEX_CFG = BuildConfig(
    num_shards=8, salt_subs=4, lang=None, id_col="doc_id", heavy_df_threshold=None,
    attrs=("lang", "source"),  # facet sidecar columns in docmeta
)


_VALIDATED_CACHES: set[str] = set()


def _cache_valid(d: str, expect_fp: str | None) -> bool:
    """Integrity-check an already-complete shared cache before trusting
    it: the metadata pass of ``fsck_index(deep=False)`` (manifest ↔
    docstats ↔ partition-manifest ↔ docmeta cross-checks, segment files
    present) plus — when the caller pins one — the config fingerprint
    of the build that SHOULD live there. ``is_complete()`` alone only
    proves a manifest file exists; a cache corrupted before the build
    lock landed, or truncated by any non-repo writer, looks complete
    forever (the round-2 ``tfidf_topk`` red cell class)."""
    from zensearch_ray.pipelines.fsck import fsck_index

    try:
        if expect_fp is not None:
            got = IndexLayout(d).read_manifest().get("config_fp")
            if got != expect_fp:
                return False
        return bool(fsck_index(d, deep=False).get("ok"))
    except Exception:
        return False


def _expected_fp(cfg: BuildConfig) -> str:
    """The config fingerprint a cache built with ``cfg`` must carry —
    pinned on reuse so a stale cache from an older config can never be
    served (the dir-name version key guards schema, this guards
    semantics)."""
    from zensearch_ray.pipelines.build_index import config_fingerprint

    return config_fingerprint(cfg, f"col:{cfg.id_col}")


def _locked_build(d: str, build_fn, expect_fp: str | None = None) -> None:
    """Inter-process build mutex for the shared /tmp index caches: two
    concurrent callers (pytest + a standalone driver) must not both
    build into ``d`` — the loser waits on the flock, re-checks
    completeness, and reuses the winner's index.

    A complete-LOOKING cache is validated (once per process) before
    reuse; a cache that fails validation is torn down and rebuilt under
    the lock rather than trusted."""
    import fcntl
    import shutil

    if d in _VALIDATED_CACHES:
        return
    if IndexLayout(d).is_complete() and _cache_valid(d, expect_fp):
        _VALIDATED_CACHES.add(d)
        return
    with open(d + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if IndexLayout(d).is_complete():
                # the winner may have (re)built while we waited
                if _cache_valid(d, expect_fp):
                    _VALIDATED_CACHES.add(d)
                    return
                shutil.rmtree(d, ignore_errors=True)  # poisoned: rebuild
            build_fn()
            _VALIDATED_CACHES.add(d)  # fresh build under the lock
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def index_dir_for(sf_dir: str, positions: bool = False) -> str:
    """Deterministic per-corpus index location under the system tmp dir;
    built once, reused (the manifest marks completeness).
    ``positions=True`` names (and builds) the POSITIONAL twin — a
    separate cache dir because the segment schema differs."""
    # v3: docmeta schema gained facet attr columns (lang, source) —
    # new cache key so a stale earlier-session index under /tmp is
    # never reused against new readers
    key = hash64(os.path.realpath(sf_dir)) % 10**12
    suffix = "_pos" if positions else ""
    d = os.path.join(tempfile.gettempdir(), f"zensearch_idx_v3_{key}{suffix}")
    import dataclasses

    cfg = (
        dataclasses.replace(_INDEX_CFG, positions=True)
        if positions
        else _INDEX_CFG
    )
    _locked_build(d, lambda: build_index(_documents_for_index(sf_dir), d, cfg),
                  expect_fp=_expected_fp(cfg))
    return d


def federated_shard_dirs(sf_dir: str, n_shards: int = 2) -> list[str]:
    """``n_shards`` INDEPENDENTLY BUILT index artifacts, shard i over
    the ``doc_id % n_shards == i`` document subset (same ``_INDEX_CFG``,
    global ``doc_id`` ids — disjoint across shards, so federation needs
    no id relocation). Cached/fingerprint-validated per shard exactly
    like ``index_dir_for``."""
    key = hash64(os.path.realpath(sf_dir)) % 10**12
    dirs = []
    for i in range(n_shards):
        d = os.path.join(
            tempfile.gettempdir(),
            f"zensearch_idx_v3_{key}_fed{i}of{n_shards}",
        )

        def build(i=i, d=d):
            def part(t, i=i):
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(ids % n_shards == i))

            src = _documents_for_index(sf_dir).map_batches(
                part, batch_format="pyarrow"
            )
            build_index(src, d, _INDEX_CFG)

        _locked_build(d, build, expect_fp=_expected_fp(_INDEX_CFG))
        dirs.append(d)
    return dirs


def federated_topk(sf_dir: str, query: str, k: int = 10,
                   n_shards: int = 2) -> pd.DataFrame:
    """BM25 top-k via doc-sharded scatter-gather federation
    (``pipelines/federate.FederatedEngine``) over independently built
    per-shard artifacts — value-identical to ``bm25_topk`` (one-shot
    union index) and to the SQL oracle, proving the two-phase global-
    stats protocol exact. Columns (rank, doc_id, score), score
    round6'd like every scored entry."""
    from zensearch_ray.pipelines.federate import FederatedEngine

    hits = FederatedEngine(federated_shard_dirs(sf_dir, n_shards)).topk(
        query, k
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


# deterministic tombstone set for the deletion-lifecycle oracle entries:
# every ~17th doc (doc_id % 17 == 3) — expressible in SQL on both sides
DELETE_MOD, DELETE_RESIDUE = 17, 3


def deleted_index_dir_for(sf_dir: str) -> str:
    """A SEPARATE cached index (never the shared ``index_dir_for`` one —
    tombstones change its results) with the deterministic delete set
    applied. ``delete_docs`` is idempotent, so re-entry is safe."""
    from zensearch_ray.pipelines.delete import delete_docs

    key = hash64(os.path.realpath(sf_dir)) % 10**12
    d = os.path.join(tempfile.gettempdir(), f"zensearch_idx_v3_{key}_del")
    layout = IndexLayout(d)
    _locked_build(d, lambda: build_index(_documents_for_index(sf_dir), d, _INDEX_CFG),
                  expect_fp=_expected_fp(_INDEX_CFG))
    import pyarrow.parquet as pq

    ids = pq.ParquetDataset(layout.docmeta_dir).read(columns=["doc_id"])[
        "doc_id"
    ].to_numpy(zero_copy_only=False)
    delete_docs(d, doc_ids=ids[ids % DELETE_MOD == DELETE_RESIDUE])
    return d


def purged_index_dir_for(sf_dir: str) -> str:
    """The deleted index compacted — tombstoned docs physically gone,
    stats/df recomputed exactly (results == a build over survivors)."""
    from zensearch_ray.pipelines.compact import compact_index

    src = deleted_index_dir_for(sf_dir)
    d = src + "_purged"
    _locked_build(d, lambda: compact_index(src, d))
    return d


def bm25_topk_deleted(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """BM25 top-k AFTER tombstoning (pre-compaction Lucene semantics:
    deleted docs excluded from results, stats still count them)."""
    hits = QueryEngine(deleted_index_dir_for(sf_dir)).topk(query, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": [d for d, _ in hits],
            "score": [round6(s) for _, s in hits],
        }
    )


def bm25_topk_purged(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """BM25 top-k after compaction purged the tombstones — stats/df are
    the survivors-only values (== an index built without those docs)."""
    hits = QueryEngine(purged_index_dir_for(sf_dir)).topk(query, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": [d for d, _ in hits],
            "score": [round6(s) for _, s in hits],
        }
    )


# deterministic train/val/test assignment: Knuth multiplicative hash
# of doc_id (mod 2^64, matching HUGEINT arithmetic in the SQL oracle)
# so the split is decorrelated from id order — ids are usually
# crawl-ordered, and `id % 10` would put each host's newest pages in
# test. Pure map-side metadata; no shuffle, no state.
SPLIT_KNUTH = 2654435761
SPLIT_TRAIN_PCT, SPLIT_VAL_PCT = 80, 10


def docs_split(sf_dir: str):
    """(doc_id, split) with split ∈ {train, val, test} at 80/10/10 by
    hashed doc_id — the standard deterministic dataset-split stage of a
    training-data pipeline (stable under reruns, shard-count changes,
    and appends, unlike random_shuffle-based splits)."""
    import pyarrow.compute as pc

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(SPLIT_KNUTH)) % np.uint64(100)
        split = np.where(
            h < SPLIT_TRAIN_PCT, "train",
            np.where(h < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val", "test"),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "split": pa.array(split, type=pa.string()),
            }
        )

    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow")


# host-cap: keep at most CAP docs per source under a deterministic
# multiplicative-hash priority — the per-host page cap of webtext
# pipelines (a skewed host must not dominate the training mix). The
# priority hash is the lang_balanced_sample one; the ORDER is what the
# cap selects on, so it must be decorrelated from crawl-ordered ids.
SOURCE_CAP = 5
CAP_HASH_MULT, CAP_HASH_MOD = 48271, 65536


def source_cap(sf_dir: str, cap: int = SOURCE_CAP):
    """(source, doc_id) — the ≤``cap`` docs kept per source. Unlike
    ``lang_balanced_sample`` (few groups → constant-key combine), the
    group count here is unbounded (hosts), so the finish runs as a
    keyed ``groupby(source).map_groups`` — a real hash shuffle, but
    over the per-batch partials only: each batch pre-trims to ≤cap
    rows per source it contains, so at most cap·n_batches rows per
    source ever move, independent of corpus size."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def headn(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["doc_id"].to_numpy(np.int64) * CAP_HASH_MULT) % CAP_HASH_MOD
        df = df.assign(h=h).sort_values(["source", "h", "doc_id"], kind="mergesort")
        return df.groupby("source", as_index=False).head(cap)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return headn(df)[["source", "doc_id"]]

    return (
        ds.map_batches(headn, batch_format="pandas")
        .groupby("source")
        .map_groups(finish, batch_format="pandas")
    )


# uniform deterministic sample: golden-ratio multiplier, decorrelated
# from SPLIT_KNUTH so sample membership is independent of the
# train/val/test assignment
SAMPLE_KNUTH = 0x9E3779B97F4A7C15
SAMPLE_PCT = 10


def docs_sample(sf_dir: str, pct: int = SAMPLE_PCT):
    """(doc_id,) — a deterministic ``pct``-percent Bernoulli sample by
    hashed doc_id: reproducible across reruns, cluster sizes, and
    appends (a doc's membership never changes as the corpus grows),
    unlike ``Dataset.random_sample``. Map-only streaming filter."""
    import ray.data as rd

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(SAMPLE_KNUTH)) % np.uint64(100)
        return batch.filter(pa.array(h < pct))

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(keep, batch_format="pyarrow")


# BM25F fielded search: deterministic synthetic title = the document's
# first TITLE_WORDS tokens (the fixture generator's own convention,
# sources/pages.py:181), weighted TITLE_BOOST× in tf and doc_len
TITLE_WORDS = 4
TITLE_BOOST = 2


def _documents_with_title(sf_dir: str):
    """documents + computed ``title`` column (first TITLE_WORDS
    whitespace tokens — identical to the SQL oracle's list_slice over
    the filtered split; documents.text is verified pure [a-z0-9 ])."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )

    def add_title(batch: pa.Table) -> pa.Table:
        titles = [
            " ".join(t.split()[:TITLE_WORDS]) for t in batch["text"].to_pylist()
        ]
        return batch.append_column("title", pa.array(titles, type=pa.string()))

    return ds.map_batches(add_title, batch_format="pyarrow")


def titled_index_dir_for(sf_dir: str) -> str:
    """Cached BM25F index twin (separate dir — boosted tf/doc_len are
    different index contents; the config fingerprint enforces this)."""
    import dataclasses

    key = hash64(os.path.realpath(sf_dir)) % 10**12
    d = os.path.join(
        tempfile.gettempdir(), f"zensearch_idx_v3_{key}_f{TITLE_BOOST}"
    )
    cfg = dataclasses.replace(_INDEX_CFG, title_boost=TITLE_BOOST)
    _locked_build(d, lambda: build_index(_documents_with_title(sf_dir), d, cfg),
                  expect_fp=_expected_fp(cfg))
    return d


# analyzer-config demo: the two corpus terms that behave like English
# stopwords ('a' and 'the' appear in essentially every document)
STOPWORDS_CFG = ("a", "the")


def stopword_index_dir_for(sf_dir: str) -> str:
    """Cached stopword-analyzer index twin (separate dir — the filtered
    token stream is different index contents; fingerprint-enforced)."""
    import dataclasses

    key = hash64(os.path.realpath(sf_dir)) % 10**12
    d = os.path.join(
        tempfile.gettempdir(),
        f"zensearch_idx_v3_{key}_sw{len(STOPWORDS_CFG)}",
    )
    cfg = dataclasses.replace(_INDEX_CFG, stopwords=STOPWORDS_CFG)
    _locked_build(d, lambda: build_index(_documents_for_index(sf_dir), d, cfg),
                  expect_fp=_expected_fp(cfg))
    return d


def stem_index_dir_for(sf_dir: str) -> str:
    """Cached stem-analyzer index twin (separate dir — stemmed terms
    are different index contents; fingerprint-enforced)."""
    import dataclasses

    key = hash64(os.path.realpath(sf_dir)) % 10**12
    d = os.path.join(tempfile.gettempdir(), f"zensearch_idx_v3_{key}_stem")
    cfg = dataclasses.replace(_INDEX_CFG, stem=True)
    _locked_build(d, lambda: build_index(_documents_for_index(sf_dir), d, cfg),
                  expect_fp=_expected_fp(cfg))
    return d


# index-time synonym folding config for the driver entry: fold the
# surface forms fast→quick and big→large — neither canonical exists as
# a corpus surface form, so retrieval through them PROVES the fold
SYNFOLD_CFG = (("big", "large"), ("fast", "quick"))


def synfold_index_dir_for(sf_dir: str) -> str:
    """Cached synonym-folded index twin (separate dir — folded terms
    are different index contents; fingerprint-enforced)."""
    import dataclasses

    key = hash64(os.path.realpath(sf_dir)) % 10**12
    d = os.path.join(
        tempfile.gettempdir(), f"zensearch_idx_v3_{key}_syn{len(SYNFOLD_CFG)}"
    )
    cfg = dataclasses.replace(_INDEX_CFG, synonyms=SYNFOLD_CFG)
    _locked_build(d, lambda: build_index(_documents_for_index(sf_dir), d, cfg),
                  expect_fp=_expected_fp(cfg))
    return d


def synfold_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """BM25 top-k over the synonym-FOLDED index: every synonym group
    shares one posting list (tf/df mass merged onto the canonical),
    and the engine folds query tokens identically via the manifest —
    "fast" and "quick" are the same term at every layer. Columns:
    (rank, doc_id, score)."""
    engine = QueryEngine(synfold_index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk(query, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def stem_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """BM25 top-k over the S-stemmed index: surface plural/singular
    variants share one posting list (tf mass merges onto the stem,
    doc_len invariant), and the engine stems the query identically via
    the manifest flag — "tables" finds "table" docs and vice versa.
    Columns: (rank, doc_id, score)."""
    engine = QueryEngine(stem_index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk(query, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def reindexed_stem_dir_for(sf_dir: str) -> str:
    """Cached stem twin built by ANALYZER REINDEX: derived from the
    committed plain index's own postings (``pipelines/reindex``) — the
    corpus text is never read. Separate cache dir from the from-corpus
    stem twin so the driver gate value-checks BOTH construction paths
    against the same SQL oracle (their contents are asserted
    bit-equivalent in ``tests/test_reindex.py``)."""
    import dataclasses

    from zensearch_ray.pipelines.reindex import reindex_analyzer

    key = hash64(os.path.realpath(sf_dir)) % 10**12
    d = os.path.join(tempfile.gettempdir(), f"zensearch_idx_v3_{key}_restem")
    cfg = dataclasses.replace(_INDEX_CFG, stem=True)
    src = index_dir_for(sf_dir)  # the validated plain cache
    _locked_build(d, lambda: reindex_analyzer(src, d, cfg),
                  expect_fp=_expected_fp(cfg))
    return d


def reindexed_stem_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """``stem_topk`` served from the REINDEXED stem index (postings-only
    analyzer migration) — must be value-identical to the from-corpus
    stem build and to the SQL oracle. Columns: (rank, doc_id, score)."""
    engine = QueryEngine(reindexed_stem_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk(query, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def stopword_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """BM25 top-k over the stopword-filtered index: stop terms carry no
    postings and doc lengths count surviving tokens only (Lucene
    StopFilter semantics), so a stop term in the query is simply inert.
    Columns: (rank, doc_id, score)."""
    engine = QueryEngine(stopword_index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk(query, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def bm25f_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """Fielded (title-boosted) BM25F top-k: tf' = tf_body +
    TITLE_BOOST·tf_title, dl' likewise, folded into the index at build
    (BuildConfig.title_boost) — query-side path is the UNCHANGED
    block-max engine. The reference carries Title through its whole
    result surface (search-engine/internal/types/types.go:3-13,
    express-server/src/app/index.ts:194-197) but never ranks on it;
    this is the standard-search-engine upgrade of that surface.
    Columns: (rank, doc_id, score)."""
    hits = QueryEngine(titled_index_dir_for(sf_dir)).topk(query, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": [d for d, _ in hits],
            "score": [round6(s) for _, s in hits],
        }
    )


def bool_topk(sf_dir: str, expr: str, k: int = 10) -> pd.DataFrame:
    """Boolean-expression top-k (AND/OR/NOT + parens) via the engine's
    posting-set algebra — Lucene filter-then-rank semantics (see
    ``QueryEngine.topk_bool``). Columns: (rank, doc_id, score)."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_bool(expr, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": [d for d, _ in hits],
            "score": [round6(s) for _, s in hits],
        }
    )


RRF_K = 60
RRF_DEPTH = 100


def hybrid_rrf(
    sf_dir: str, query: str, probe_vec_id: int = 0, k: int = 10,
    depth: int = RRF_DEPTH, rrf_k: int = RRF_K,
    dense: str = "ivf", nprobe: int | None = None,
) -> pd.DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25
    top-``depth``) and dense (cosine top-``depth``) rankings —
    rrf(d) = Σ 1/(rrf_k + rank_list(d)) over the lists containing d,
    the standard hybrid-search combiner. Both legs are serving-path
    operators: posting-list BM25 + the PERSISTED IVF index
    (``pipelines/vector``) — build-once/query-many, never a full-table
    stream per query. ``nprobe`` defaults to ALL lists (full probe ≡
    exact cosine, bit-identical to the brute scan and the SQL oracle);
    pass a smaller nprobe for the at-scale serving shape where only
    the probed-list partitions are read. ``dense="scan"`` keeps the
    streaming per-batch cosine as the referee path. Fusion itself is
    k-sized driver work. Output: (rank, doc_id, rrf), ties → doc_id
    ASC.

    The test tables join 1:1 (embeddings.vec_id ≡ documents.doc_id);
    on a real corpus the dense leg's ids are whatever embedding sidecar
    the pipeline produced — the operator only needs the two id-ranked
    lists."""
    import pyarrow.parquet as pq

    bm = QueryEngine(index_dir_for(sf_dir)).topk(query, depth)
    probe = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", probe_vec_id)],
    )["embedding"].to_pylist()[0]
    if dense == "ivf":
        from zensearch_ray.pipelines.vector import (
            VectorIndex,
            vector_index_dir_for,
        )

        vi = VectorIndex(vector_index_dir_for(sf_dir))
        ids, _ = vi.search(
            np.asarray(probe, dtype=np.float64), k=depth,
            nprobe=int(vi.manifest["n_lists"]) if nprobe is None else nprobe,
        )
        dense_ids = ids.tolist()
    elif dense == "scan":
        import ray.data as rd

        from zensearch_ray.stages.ann import cosine_topk

        emb = cosine_topk(
            rd.read_parquet(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"],
            ),
            probe,
            k=depth,
        )
        dense_ids = emb["vec_id"].tolist()
    else:
        raise ValueError(f"unknown dense leg {dense!r}")
    # fuse bm25-leg first, then dense-leg — the SQL oracle adds its
    # COALESCEd terms in the same order, so sums match bit for bit
    scores: dict[int, float] = {}
    for r, (d, _) in enumerate(bm, 1):
        scores[d] = scores.get(d, 0.0) + 1.0 / (rrf_k + r)
    for r, d in enumerate(dense_ids, 1):
        scores[int(d)] = scores.get(int(d), 0.0) + 1.0 / (rrf_k + r)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in top], dtype=np.int64),
            "rrf": round6(np.array([s for _, s in top], dtype=np.float64)),
        }
    )


KEYWORDS_M = 5


def doc_keywords(sf_dir: str, m: int = KEYWORDS_M):
    """Keyword extraction: each document's top-``m`` terms by tf·idf
    (idf = ln(N/df), idf-0 terms excluded; ties → term ASC) — the
    corpus-wide form of ``more_like_this``'s per-doc term selection,
    as one distributed pipeline:

        term_tf rows (doc_id, term, tf)
          → ONE term-bucket exchange: a term's rows all land in its
            bucket, so the bucket computes the GLOBAL df of its terms
            in place (groupby-size) — no second tokenize pass, no
            separate df pipeline, no tf⨝df join exchange (r2s6:
            replaced the hash-join shape, ~2× fewer exchanges)
          → weight = tf · ln(N/df) + per-doc head(m) partials inside
            the same bucket group
          → ONE doc-bucket exchange → exact per-doc top-m

    Output: (doc_id, rank, term, weight). Scale shape: two exchanges
    bounded by |tf rows| and m·N partial rows respectively; no
    driver-side state."""
    from zensearch_ray.functions.agg import _BUCKET_COL, _bucket_of
    from zensearch_ray.pipelines.analytics import _with_bucket

    n = float(_documents(sf_dir).count())

    def bucket_by_term(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _BUCKET_COL, pa.array(_bucket_of(batch["term"], 64))
        )

    def headm(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = df_.sort_values(
            ["doc_id", "w", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        return df_.groupby("doc_id", as_index=False).head(m)

    def weigh_bucket(df_: pd.DataFrame) -> pd.DataFrame:
        # tf rows are per-(doc, term) unique, and the bucket holds ALL
        # rows of each of its terms -> group size IS the global df
        dfs = df_.groupby("term")["term"].transform("size").to_numpy(np.float64)
        w = df_["tf"].to_numpy(np.float64) * np.log(n / dfs)
        out = df_.assign(w=w)
        out = out[out["w"] > 0.0]
        return headm(out)[["doc_id", "term", "w"]]

    def ranked(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = headm(df_)
        df_ = df_.assign(
            rank=(df_.groupby("doc_id").cumcount() + 1).astype(np.int64),
            weight=round6(df_["w"].to_numpy()),
        )
        return df_[["doc_id", "rank", "term", "weight"]]

    partials = (
        term_tf(sf_dir)
        .map_batches(bucket_by_term, batch_format="pyarrow")
        .groupby(_BUCKET_COL)
        .map_groups(weigh_bucket, batch_format="pandas")
    )
    return (
        partials.map_batches(_with_bucket("doc_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(ranked, batch_format="pandas")
    )


FACET_FILTER_LANG = "de"


def bm25_topk_filtered(
    sf_dir: str, query: str, k: int = 10, lang: str = FACET_FILTER_LANG
) -> pd.DataFrame:
    """Filtered (faceted) BM25 top-k: results restricted to documents
    whose ``lang`` facet equals ``lang`` — Lucene filter-query
    semantics (idf/avgdl stay corpus-global, so surviving scores equal
    the unfiltered ones). Facet resolution is a docmeta-only lookup."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_filtered(query, "lang", lang, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": [d for d, _ in hits],
            "score": [round6(s) for _, s in hits],
        }
    )


def facet_counts(sf_dir: str, query: str, col: str = "lang") -> pd.DataFrame:
    """Facet counts for a query (the result-page facet sidebar): how
    many docs match (exhaustive OR, score > 0) per value of ``col``."""
    rows = QueryEngine(index_dir_for(sf_dir)).facet_counts(query, col)
    return pd.DataFrame(
        {
            "value": [v for v, _ in rows],
            "n_docs": np.array([c for _, c in rows], dtype=np.int64),
        }
    )


def bm25_topk(
    sf_dir: str, query: str, k: int = 10, pruned: bool = False, conjunctive: bool = False
) -> pd.DataFrame:
    """BM25 top-k over documents via the posting-list engine.

    Columns (rank, doc_id, score) with score rounded to 6 decimals —
    the oracle SQL rounds identically. ``conjunctive`` switches to
    posting-list-intersection (AND) semantics.
    """
    engine = QueryEngine(index_dir_for(sf_dir))
    if conjunctive:
        hits = engine.topk_and(query, k)
    elif pruned == "bmw":
        hits = engine.topk_bmw(query, k)
    else:
        hits = engine.topk_pruned(query, k) if pruned else engine.topk(query, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": [d for d, _ in hits],
            "score": [round6(s) for _, s in hits],
        }
    )


def fvf_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """Function-scored top-k (ES ``field_value_factor``): BM25 ×
    ln(1 + doc_len) over the same cached index — a static document
    prior folded into the rank at query time. Columns
    (rank, doc_id, score), score round6'd like every scored entry."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_fvf(query, "doc_len", k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def decay_topk(
    sf_dir: str, query: str, kind: str, origin: float, scale: float,
    offset: float = 0.0, decay: float = 0.5, k: int = 10,
) -> pd.DataFrame:
    """Decay-function-scored top-k (ES ``function_score`` gauss/exp/
    linear decay): BM25 × distance-decay of doc_len from ``origin``
    over the same cached index (see ``QueryEngine.topk_decay``).
    Columns (rank, doc_id, score), score round6'd."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_decay(
        query, "doc_len", kind, origin, scale, offset, decay, k
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def random_topk(sf_dir: str, query: str, seed: int, k: int = 10) -> pd.DataFrame:
    """Seeded-random-scored top-k (ES ``random_score``): reproducible
    uniform draw per (seed, doc_id) over the BM25 match set (see
    ``QueryEngine.topk_random``). Columns (rank, doc_id, score)."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_random(query, seed, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def rescored_topk(
    sf_dir: str, query: str, phrase: str, k: int = 10, window: int = 30
) -> pd.DataFrame:
    """Two-phase rescored top-k (ES ``rescore``): exhaustive BM25
    window over ``query``, the top ``window`` docs re-sorted by
    ``1.0·bm25 + 2.0·phrase_score`` where the phrase score comes from
    the POSITIONAL index (0 unless the doc contains ``phrase`` as a
    contiguous token run). Columns (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    hits = engine.topk_rescored(query, phrase, k=k, window=window)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def sim_topk(
    sf_dir: str, query: str, similarity: str, k: int = 10
) -> pd.DataFrame:
    """Top-k under a pluggable similarity (``tfidf`` SMART ltn /
    ``lmd`` LM-Dirichlet μ=2000 / ``bm25plus`` BM25+ δ=1.0 /
    ``lmjm`` LM Jelinek-Mercer λ=0.1) over the
    SAME cached index segments
    as ``bm25_topk`` — the ranking function swaps without re-indexing
    (Lucene Similarity semantics). Columns: (rank, doc_id, score),
    score rounded to 6 decimals like every scored oracle entry."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_sim(
        query, k, similarity=similarity
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def search_after_page(
    sf_dir: str, query: str, k: int = 10, page: int = 2
) -> pd.DataFrame:
    """Cursor-paginate to ``page`` via repeated ``search_after`` hops
    (page 1's last hit is page 2's cursor, and so on) — each hop is a
    stateless engine call; nothing is scrolled or cached server-side.
    Columns (rank, doc_id, score) with rank numbered in the GLOBAL
    rounded-score order (page 2 of k=10 carries ranks 11..20), score
    already rounded by the engine's page order."""
    engine = QueryEngine(index_dir_for(sf_dir))
    cursor = None
    hits: list[tuple[int, float]] = []
    for _ in range(page):
        hits = engine.topk_after(query, k, after=cursor)
        if len(hits) < k:
            break  # ran off the end of the result set
        cursor = (hits[-1][1], hits[-1][0])
    base = (page - 1) * k
    return pd.DataFrame(
        {
            "rank": np.arange(base + 1, base + len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([s for _, s in hits], dtype=np.float64),
        }
    )


def boosted_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """Top-k under Lucene-style per-term query boosts (``term^w``)."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_boosted(query, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def msm_topk(
    sf_dir: str, query: str, k: int = 10, min_should_match: int = 2
) -> pd.DataFrame:
    """Top-k restricted to docs matching >= m distinct query terms."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_msm(
        query, k, min_should_match=min_should_match
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def autocomplete_terms(sf_dir: str, prefix: str, k: int = 10) -> pd.DataFrame:
    """Search-box completion: top-k index terms under ``prefix`` by
    (df DESC, term ASC). Columns: (term, df)."""
    cands = QueryEngine(index_dir_for(sf_dir)).autocomplete(prefix, k)
    return pd.DataFrame(
        {
            "term": [t for t, _ in cands],
            "df": np.array([d for _, d in cands], dtype=np.int64),
        }
    )


def explain_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """Per-term BM25 score breakdown for the top-k docs (the
    Lucene-Explanation surface; see ``QueryEngine.explain``), flattened
    to one row per (doc, term) with the floats rounded half-away at 6
    decimals exactly like every other oracle-checked score column.
    Columns: (doc_id, term, df, tf, dl, idf, tf_norm, contribution)."""
    rows = QueryEngine(index_dir_for(sf_dir)).explain(query, k=k)
    flat = [(r["doc_id"], t) for r in rows for t in r["terms"]]
    return pd.DataFrame(
        {
            "doc_id": np.array([d for d, _ in flat], dtype=np.int64),
            "term": [t["term"] for _, t in flat],
            "df": np.array([t["df"] for _, t in flat], dtype=np.int64),
            "tf": np.array([t["tf"] for _, t in flat], dtype=np.int64),
            "dl": np.array([t["dl"] for _, t in flat], dtype=np.int64),
            "idf": np.array(
                [round6(t["idf"]) for _, t in flat], dtype=np.float64
            ),
            "tf_norm": np.array(
                [round6(t["tf_norm"]) for _, t in flat], dtype=np.float64
            ),
            "contribution": np.array(
                [round6(t["contribution"]) for _, t in flat], dtype=np.float64
            ),
        }
    )


def significant_terms(
    sf_dir: str, query: str, k: int = 25, min_fg_df: int = 3
) -> pd.DataFrame:
    """Significant-terms aggregation over the shared corpus index —
    see ``pipelines/export.py:significant_terms`` for the distributed
    shape. Columns: (term, df_fg, df_bg, score)."""
    from zensearch_ray.pipelines.export import significant_terms as _sig

    return _sig(index_dir_for(sf_dir), query, k=k, min_fg_df=min_fg_df)


def boosting_topk(
    sf_dir: str, query: str, negative: str, k: int = 10,
    negative_boost: float = 0.3,
) -> pd.DataFrame:
    """Top-k under an ES-style boosting query: ranked by the positive
    query's BM25, docs matching any negative term demoted by
    ``negative_boost`` (see ``QueryEngine.topk_boosting``). Columns
    (rank, doc_id, score), score round6'd like every scored entry."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_boosting(
        query, negative, k, negative_boost=negative_boost
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def spanfirst_topk(
    sf_dir: str, query: str, first_n: int, k: int = 10
) -> pd.DataFrame:
    """Top-k restricted to docs where some query term occurs within
    the first ``first_n`` tokens (Lucene ``span_first`` over a
    ``span_or``; see ``QueryEngine.topk_spanfirst``) — uses the
    positional index twin. Columns (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    hits = engine.topk_spanfirst(query, first_n, k)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def dismax_topk(
    sf_dir: str, query: str, k: int = 10, tie: float = 0.3
) -> pd.DataFrame:
    """Top-k under disjunction-max scoring (best term + tie * rest)."""
    hits = QueryEngine(index_dir_for(sf_dir)).topk_dismax(query, k, tie=tie)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def phrase_topk(
    sf_dir: str, phrase: str, k: int = 10, positional: bool = False
) -> pd.DataFrame:
    """Exact-phrase BM25 top-k — candidates from the posting-list
    INTERSECTION (conjunctive semantics: a phrase match must contain
    every term), verified by exact token-sequence match, ranked by the
    same BM25 sum as ``bm25_topk``. Columns: (rank, doc_id, score).

    Two verification paths, rank-identical by construction:

    * ``positional=False`` (the reference-shaped index — zensearch's
      schema is term→(doc,tf) only, database/src/database.ts:16-91):
      verification reads the CANDIDATE documents' text — a
      predicate-pushdown scan with the sequence check running only on
      conjunctive candidates (exact for this corpus because
      `documents.text` is verified single-space-separated tokens).
    * ``positional=True``: builds/uses the positional index twin
      (``BuildConfig(positions=True)``) and verifies adjacency from
      per-term token positions — the SCALE path: only the phrase
      terms' postings are read; the corpus never moves.
    """
    import ray
    import pyarrow.compute as pc

    if positional:
        engine = QueryEngine(index_dir_for(sf_dir, positions=True))
        kept = [(d, round6(s)) for d, s in engine.topk_phrase(phrase, k=k)]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
                "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
                "score": np.array([s for _, s in kept], dtype=np.float64),
            }
        )

    engine = QueryEngine(index_dir_for(sf_dir))
    hits = engine.topk_and(phrase, k=1 << 62)  # ALL intersection docs
    if not hits:
        return pd.DataFrame(
            {"rank": pd.array([], dtype="int64"),
             "doc_id": pd.array([], dtype="int64"),
             "score": pd.array([], dtype="float64")}
        )
    cand_ids = pa.array([d for d, _ in hits], type=pa.int64())
    ref = ray.put(cand_ids)
    needle = f" {' '.join(tokenize(phrase))} "

    def verify(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], value_set=ray.get(ref))
        cand = batch.filter(mask)
        keep = [
            i for i, t in enumerate(cand["text"].to_pylist())
            if needle in f" {t} "
        ]
        return cand.take(pa.array(keep, type=pa.int64())).select(["doc_id"])

    vdf = _documents(sf_dir).map_batches(verify, batch_format="pyarrow").to_pandas()
    # an all-empty result can surface as a column-less frame
    verified = set(vdf["doc_id"]) if len(vdf) else set()
    kept = [(d, s) for d, s in hits if d in verified][:k]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([round6(s) for _, s in kept], dtype=np.float64),
        }
    )


def phrase_prefix_topk(sf_dir: str, phrase: str, k: int = 10) -> pd.DataFrame:
    """Match-phrase-prefix BM25 top-k over the positional index (see
    ``QueryEngine.topk_phrase_prefix``): the last token is a dictionary
    prefix; each expansion T verifies the exact phrase ``base + [T]``
    and scores it conjunctively; a doc keeps its MAX score across
    expansions. Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    kept = [(d, round6(s)) for d, s in engine.topk_phrase_prefix(phrase, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def near_topk(sf_dir: str, query: str, window: int, k: int = 10) -> pd.DataFrame:
    """Proximity BM25 top-k over the positional index: conjunctive
    candidates restricted to docs where every pair of distinct query
    terms co-occurs within ``window`` tokens (pairwise EXISTS — see
    ``QueryEngine.topk_near``). Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    kept = [(d, round6(s)) for d, s in engine.topk_near(query, window, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def seq_topk(sf_dir: str, query: str, gap: int, k: int = 10) -> pd.DataFrame:
    """Ordered-proximity BM25 top-k (see ``QueryEngine.topk_seq``):
    the query tokens in order, each within ``gap`` tokens of the
    previous. Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    kept = [(d, round6(s)) for d, s in engine.topk_seq(query, gap, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


SNIPPET_RADIUS = 5


def search_snippets(
    sf_dir: str, query: str, k: int = 10, radius: int = SNIPPET_RADIUS
) -> pd.DataFrame:
    """Ranked results with extracted snippets — the serving-side result
    enrichment (the reference renders result rows in the UI;
    express-server/src/app/index.ts:194-197). Deterministic snippet
    rule so a SQL oracle can check it exactly: for each top-k doc, the
    chosen term is the (df ASC, term ASC)-first query term present in
    the doc; the snippet is the ``radius``-token window around its
    FIRST occurrence. Only the k result docs' text is read (parquet
    predicate pushdown) — never the corpus. Columns:
    (rank, doc_id, term, pos, snippet, score)."""
    import pyarrow.parquet as pq

    engine = QueryEngine(index_dir_for(sf_dir))
    hits = engine.topk(query, k)
    empty = pd.DataFrame(
        {
            "rank": np.array([], dtype=np.int64),
            "doc_id": np.array([], dtype=np.int64),
            "term": np.array([], dtype=object),
            "pos": np.array([], dtype=np.int64),
            "snippet": np.array([], dtype=object),
            "score": np.array([], dtype=np.float64),
        }
    )
    if not hits:
        return empty
    terms = list(dict.fromkeys(tokenize(query)))
    sel_order = sorted(
        (t for t in terms if engine.df(t) > 0),
        key=lambda t: (engine.df(t), t),
    )
    ids = [d for d, _ in hits]
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", ids)],
    )
    text_of = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    rows = []
    for rank, (d, s) in enumerate(hits, 1):
        toks = tokenize(text_of[d])
        term = next(t for t in sel_order if t in toks)
        p = toks.index(term)
        rows.append(
            (
                rank, d, term, p,
                " ".join(toks[max(0, p - radius) : p + radius + 1]),
                round6(s),
            )
        )
    return pd.DataFrame(
        {
            "rank": np.array([r[0] for r in rows], dtype=np.int64),
            "doc_id": np.array([r[1] for r in rows], dtype=np.int64),
            "term": [r[2] for r in rows],
            "pos": np.array([r[3] for r in rows], dtype=np.int64),
            "snippet": [r[4] for r in rows],
            "score": np.array([r[5] for r in rows], dtype=np.float64),
        }
    )


# ---------------------------------------------------------------------------
# Collocation statistics (bigram counts / PMI) — n-gram LM-prep operators
# ---------------------------------------------------------------------------


def _bigram_partials(sf_dir: str):
    """Per-batch pre-aggregated (bigram, cnt) partials — the shuffle
    carries per-batch UNIQUE bigrams, not one row per occurrence."""
    from collections import Counter

    def part(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = tokenize(text)
            c.update(map(" ".join, zip(toks, toks[1:])))
        return pa.table(
            {
                "bigram": pa.array(list(c.keys()), type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(part, batch_format="pyarrow")


def _unigram_partials(sf_dir: str):
    from collections import Counter

    def part(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(tokenize(text))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), type=pa.string()),
                "ucnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(part, batch_format="pyarrow")


def _fused_gram_partials(sf_dir: str):
    """Bigram AND unigram per-batch counts from a single tokenize pass:
    (gram, u, cnt) with u=0 → adjacent-token bigram, u=1 → unigram.
    The two gram spaces are disjoint (bigrams contain a space), so one
    (gram, u)-keyed exchange aggregates both."""
    from collections import Counter

    def part(batch: pa.Table) -> pa.Table:
        cb: Counter = Counter()
        cu: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = tokenize(text)
            cu.update(toks)
            cb.update(map(" ".join, zip(toks, toks[1:])))
        return pa.table(
            {
                "gram": pa.array(
                    list(cb.keys()) + list(cu.keys()), type=pa.string()
                ),
                "u": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int8), [len(cb), len(cu)])
                ),
                "cnt": pa.array(
                    list(cb.values()) + list(cu.values()), type=pa.int64()
                ),
            }
        )

    return _documents(sf_dir).map_batches(part, batch_format="pyarrow")


def _global_topn(agg_ds, sort_cols, ascending, n):
    """Exact global top-N over an already-aggregated Dataset: partial
    head(N) per batch (each key appears once post-aggregation), final
    N×n_batches-row combine on the driver."""
    def headn(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=ascending, kind="mergesort").head(n)

    tops = agg_ds.map_batches(headn, batch_format="pandas").to_pandas()
    return (
        tops.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        .head(n)
        .reset_index(drop=True)
    )


def top_bigrams(sf_dir: str, n: int = 20) -> pd.DataFrame:
    """Top-N adjacent-token bigrams by corpus count (count DESC, bigram
    ASC) — the collocation/n-gram statistic an LM tokenizer/data-prep
    pipeline computes. Columns: (rank, bigram, cnt)."""
    from zensearch_ray.functions.agg import bucketed_groupby_sum

    agg = bucketed_groupby_sum(_bigram_partials(sf_dir), ["bigram"], ["cnt"])
    out = _global_topn(agg, ["cnt", "bigram"], [False, True], n)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def grep_docs(sf_dir: str, pattern: str) -> pd.DataFrame:
    """Distributed content grep: every doc whose TEXT matches ``pattern``
    (RE2 syntax — the same engine DuckDB's ``regexp_matches`` uses, so
    semantics align exactly). Columns (doc_id, n_matches), doc_id ASC.

    Fully Arrow-native map pass: ``pc.count_substring_regex`` runs the
    compiled RE2 automaton over the string column with zero Python
    per-row work; only matching (doc_id, count) rows leave each batch —
    output scale is hit count, never corpus size."""
    import pyarrow.compute as pc

    def part(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], pattern)
        t = pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                      "n_matches": n.cast(pa.int64())})
        return t.filter(pc.greater(t["n_matches"], 0))

    out = _documents(sf_dir).map_batches(part, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-empty to_pandas() loses columns
        out = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                            "n_matches": pd.Series(dtype=np.int64)})
    return out.sort_values("doc_id", ignore_index=True)


def extract_pattern(sf_dir: str, pattern: str) -> pd.DataFrame:
    """Distributed regex field extraction: first match of ``pattern``'s
    named capture groups per doc (RE2 — aligned with DuckDB
    ``regexp_extract``). Columns (doc_id, <group names...>), matching
    docs only, doc_id ASC. Arrow-native: ``pc.extract_regex`` returns a
    struct column; non-matching rows are null-filtered — the per-batch
    output is matches only, so extraction over 100 TB emits only the
    harvested fields."""
    import pyarrow.compute as pc

    def part(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch["text"], pattern)
        keep = ex.is_valid()
        cols = {"doc_id": batch["doc_id"].cast(pa.int64()).filter(keep)}
        ex = ex.filter(keep)
        typ = ex.type
        for i in range(typ.num_fields):
            name = typ.field(i).name
            cols[name] = pc.struct_field(ex, i).cast(pa.string())
        return pa.table(cols)

    out = _documents(sf_dir).map_batches(part, batch_format="pyarrow").to_pandas()
    if out.empty:  # all-empty to_pandas() loses columns
        import re as _re

        cols = {"doc_id": pd.Series(dtype=np.int64)}
        for g in _re.compile(pattern).groupindex:
            cols[g] = pd.Series(dtype=str)
        out = pd.DataFrame(cols)
    return out.sort_values("doc_id", ignore_index=True)


def _cooc_partials(sf_dir: str, window: int):
    """Per-batch pre-aggregated skip-gram pair partials: every ORDERED
    token pair (t_i, t_j) with 1 <= j - i <= window, counted per batch —
    the shuffle carries per-batch UNIQUE (a, b) pairs, not one row per
    occurrence (same partial-emitting shape as ``_bigram_partials``)."""
    from collections import Counter

    def part(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = tokenize(text)
            for d in range(1, window + 1):
                c.update(zip(toks, toks[d:]))
        if c:
            a, b = map(list, zip(*c.keys()))
        else:
            a, b = [], []
        return pa.table(
            {
                "a": pa.array(a, type=pa.string()),
                "b": pa.array(b, type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(part, batch_format="pyarrow")


def cooc_window(sf_dir: str, n: int = 20, window: int = 3) -> pd.DataFrame:
    """Top-N skip-gram co-occurrence pairs within a token window
    (word2vec/GloVe-style corpus statistic: every ordered pair of
    tokens at distance 1..window). Generalizes ``top_bigrams``
    (window=1 ≡ adjacent bigrams). Ties (cnt DESC, a ASC, b ASC).
    Columns: (rank, a, b, cnt).

    Scale shape: per-batch Counter partials → ONE bucketed exchange
    over unique pairs (``functions/agg.bucketed_groupby_sum``) →
    exact global top-N via per-batch heads (driver merge is
    N × n_batches rows). Pair-vocabulary scale is bounded by
    window × bigram-vocabulary, never corpus token count."""
    from zensearch_ray.functions.agg import bucketed_groupby_sum

    agg = bucketed_groupby_sum(
        _cooc_partials(sf_dir, window), ["a", "b"], ["cnt"]
    )
    out = _global_topn(agg, ["cnt", "a", "b"], [False, True, True], n)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def pmi_bigrams(
    sf_dir: str, n: int = 20, min_count: int = 5, join: str = "broadcast"
) -> pd.DataFrame:
    """Top-N bigram collocations by pointwise mutual information:
    pmi = ln(p(ab) / (p(a) p(b))) with p over token/bigram totals,
    restricted to bigrams with cnt >= min_count.

    ``join`` picks how bigram counts acquire their unigram counts:
    ``"broadcast"`` (default — the unigram vocab rides a single
    ``ray.put``, looked up vectorized per batch; right for vocabularies
    up to ~10^8 terms) or ``"hash"`` (two co-partitioned hash joins —
    the shape that holds when the vocabulary no longer fits a
    broadcast; same results, measured ~5 s of pure exchange overhead at
    toy scale, which is why it is not the default).
    Columns: (rank, bigram, cnt, pmi)."""
    import pyarrow.compute as pc

    from zensearch_ray.functions.agg import bucketed_groupby_sum
    from zensearch_ray.pipelines.joins import hash_join

    # ONE tokenize pass emits bigram AND unigram partials (r2s6: was
    # two full passes); materialize the AGGREGATED dataset (vocab-
    # sized, tiny) — it is consumed 4+ times below (totals + joins),
    # and without pinning every consumer would re-tokenize the corpus
    fused = bucketed_groupby_sum(
        _fused_gram_partials(sf_dir), ["gram", "u"], ["cnt"]
    ).materialize()

    def _take(flag: int, names: list[str]):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            k = t.filter(pc.equal(t["u"], flag))
            return pa.table({names[0]: k["gram"], names[1]: k["cnt"]})

        return f

    big = fused.map_batches(_take(0, ["bigram", "cnt"]), batch_format="pyarrow")
    uni = fused.map_batches(_take(1, ["term", "ucnt"]), batch_format="pyarrow")
    u_total = float(uni.sum("ucnt") or 0)
    b_total = float(big.sum("cnt") or 0)
    if b_total == 0:
        return pd.DataFrame(
            {
                "rank": np.array([], dtype=np.int64),
                "bigram": np.array([], dtype=object),
                "cnt": np.array([], dtype=np.int64),
                "pmi": np.array([], dtype=np.float64),
            }
        )

    def split_words(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.greater_equal(batch["cnt"], min_count))
        parts = pc.split_pattern(keep["bigram"], " ")
        return keep.append_column("w1", pc.list_element(parts, 0)).append_column(
            "w2", pc.list_element(parts, 1)
        )

    f = big.map_batches(split_words, batch_format="pyarrow")
    if join == "broadcast":
        import ray

        uc = uni.to_pandas()
        uref = ray.put(dict(zip(uc["term"], uc["ucnt"].astype(np.int64))))

        def attach_counts(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(uref)
            df = df.copy()
            df["c1"] = df["w1"].map(m).astype(np.int64)
            df["c2"] = df["w2"].map(m).astype(np.int64)
            return df

        j = f.map_batches(attach_counts, batch_format="pandas")
    else:
        u1 = uni.map_batches(
            lambda t: t.rename_columns(["term", "c1"]), batch_format="pyarrow"
        )
        u2 = uni.map_batches(
            lambda t: t.rename_columns(["term", "c2"]), batch_format="pyarrow"
        )
        j = hash_join(f, u1, on="w1", right_on="term")
        j = hash_join(j, u2, on="w2", right_on="term")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["cnt"].to_numpy(np.float64)
        c1 = df["c1"].to_numpy(np.float64)
        c2 = df["c2"].to_numpy(np.float64)
        pmi = np.log(cnt * u_total * u_total / (b_total * c1 * c2))
        return pd.DataFrame(
            {
                "bigram": df["bigram"],
                "cnt": df["cnt"].astype(np.int64),
                "pmi": np.array([round6(x) for x in pmi]),
            }
        )

    scored = j.map_batches(score, batch_format="pandas")
    out = _global_topn(scored, ["pmi", "bigram"], [False, True], n)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


def prefix_topk(sf_dir: str, prefix: str, k: int = 10) -> pd.DataFrame:
    """Prefix (wildcard) BM25 top-k: ``prefix*`` expanded against the
    index term dictionary, scored as an OR-query (see
    ``QueryEngine.topk_prefix``). Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk_prefix(prefix, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def collapsed_topk(
    sf_dir: str, query: str, col: str = "source", per: int = 1, k: int = 10
) -> pd.DataFrame:
    """Field-collapsed BM25 top-k: at most ``per`` results per value of
    docmeta attribute ``col`` (see ``QueryEngine.topk_collapsed`` — the
    SERP host-collapse). Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk_collapsed(query, col, per, k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def per_facet_topk(
    sf_dir: str, query: str, col: str = "source", per: int = 2
) -> pd.DataFrame:
    """Top-``per`` results within every value of a docmeta attribute
    (see ``QueryEngine.topk_per_facet``). Columns: (facet_value,
    rank_in_group, doc_id, score)."""
    rows = QueryEngine(index_dir_for(sf_dir)).topk_per_facet(query, col, per)
    return pd.DataFrame(
        {
            "facet_value": [r[0] for r in rows],
            "rank_in_group": np.array([r[1] for r in rows], dtype=np.int64),
            "doc_id": np.array([r[2] for r in rows], dtype=np.int64),
            "score": np.array([round6(r[3]) for r in rows], dtype=np.float64),
        }
    )


def doc_lm_score(sf_dir: str):
    """Per-document unigram language-model score: mean over the doc's
    token occurrences of ln(cf(term) / total_tokens) — the classic
    cheap fluency/typicality signal of training-data pipelines (docs
    of rare-term soup score low). Two passes: a corpus term-frequency
    aggregate (vocab-scale; at web scale bucket the combine exactly as
    the index build's df pass) broadcast once, then a map-only scoring
    pass. Output: (doc_id, lm_score)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def cf_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            c.update(tokenize(text))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    cf = (
        ds.map_batches(cf_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    total = float(cf["c"].sum())
    logp = {t: float(np.log(c / total)) for t, c in zip(cf["term"], cf["c"])}
    ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        lp = ray.get(ref)
        ids = batch["doc_id"]
        out = np.zeros(batch.num_rows, dtype=np.float64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = tokenize(text)
            if toks:
                out[i] = sum(lp[t] for t in toks) / len(toks)
        return pa.table(
            {"doc_id": ids, "lm_score": pa.array(round6(out), type=pa.float64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")


# query-time synonym table for the driver entry (corpus-vocab words)
SYNONYMS_CFG = {"stream": ["window"], "spark": ["hash", "fast"]}


def synonyms_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """Synonym-expanded BM25 top-k (see ``QueryEngine.topk_synonyms``).
    Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [
        (d, round6(s)) for d, s in engine.topk_synonyms(query, SYNONYMS_CFG, k=k)
    ]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def range_topk(
    sf_dir: str, query: str, lo: float, hi: float, k: int = 10
) -> pd.DataFrame:
    """Numeric range-filtered BM25 top-k over docmeta ``doc_len`` (see
    ``QueryEngine.topk_range``). Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk_range(query, "doc_len", lo, hi, k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def match_stats(sf_dir: str, query: str) -> pd.DataFrame:
    """Metric aggregation (count/sum/avg/min/max of doc_len) over the
    docs matching ``query`` — one row (see ``QueryEngine.match_stats``)."""
    s = QueryEngine(index_dir_for(sf_dir)).match_stats(query, "doc_len")
    return pd.DataFrame(
        {
            "n_docs": np.array([s["n_docs"]], dtype=np.int64),
            "sum_len": np.array([round6(s["sum"])], dtype=np.float64),
            "avg_len": np.array([round6(s["avg"])], dtype=np.float64),
            "min_len": np.array([round6(s["min"])], dtype=np.float64),
            "max_len": np.array([round6(s["max"])], dtype=np.float64),
        }
    )


def match_histogram(sf_dir: str, query: str,
                    interval: float = 10.0) -> pd.DataFrame:
    """ES histogram aggregation over the matched set: fixed-interval
    doc_len buckets (key = floor(dl/interval)*interval, empty buckets
    omitted). Columns: (bucket, n_docs), bucket ASC."""
    rows = QueryEngine(index_dir_for(sf_dir)).match_histogram(
        query, "doc_len", interval
    )
    return pd.DataFrame(
        {
            "bucket": np.array([round6(b) for b, _ in rows], dtype=np.float64),
            "n_docs": np.array([c for _, c in rows], dtype=np.int64),
        }
    )


def match_cardinality(sf_dir: str, query: str,
                      col: str = "source") -> pd.DataFrame:
    """ES cardinality aggregation: DISTINCT values of ``col`` among the
    matched docs — one row (n_values)."""
    n = QueryEngine(index_dir_for(sf_dir)).match_cardinality(query, col)
    return pd.DataFrame({"n_values": np.array([n], dtype=np.int64)})


def wildcard_topk(sf_dir: str, pattern: str, k: int = 10) -> pd.DataFrame:
    """Glob-pattern BM25 top-k: '*'-wildcards anywhere (suffix/infix —
    the generalization of ``prefix_topk``), expanded against the index
    term dictionary and scored as an OR-query (see
    ``QueryEngine.topk_wildcard``). Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk_wildcard(pattern, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def fuzzy_topk(
    sf_dir: str, query: str, k: int = 10, max_dist: int = 1
) -> pd.DataFrame:
    """Fuzzy (typo-tolerant) BM25 top-k: every query term expanded
    against the index term dictionary at byte-Levenshtein distance
    ≤ ``max_dist`` (1 = vectorized lcp/lcs vocab screen, 2 = SymSpell
    delete-neighborhood buckets + DP verify), scored as an OR-query
    (see ``QueryEngine.topk_fuzzy``). Columns: (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [
        (d, round6(s))
        for d, s in engine.topk_fuzzy(query, k=k, max_dist=max_dist)
    ]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def not_topk(sf_dir: str, query: str, k: int = 10) -> pd.DataFrame:
    """Boolean-exclusion BM25 top-k: ``-term`` tokens exclude documents
    containing that term (see ``QueryEngine.topk_not``). Columns:
    (rank, doc_id, score)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk_not(query, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def did_you_mean(sf_dir: str, query: str) -> pd.DataFrame:
    """Spelling suggestions: per distinct query token, the highest-df
    dictionary term within byte-Levenshtein distance 1 (see
    ``QueryEngine.suggest``). Columns: (token, suggestion, df)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    rows = engine.suggest(query)
    return pd.DataFrame(
        {
            "token": pd.Series([r[0] for r in rows], dtype=object),
            "suggestion": pd.Series([r[1] for r in rows], dtype=object),
            "df": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )


def suggest_phrase(sf_dir: str, query: str, k: int = 3, per_tok: int = 5,
                   min_count: int = 2, alpha: float = 0.4) -> pd.DataFrame:
    """ES phrase-suggester analog: whole-query "did you mean" where
    candidate phrases are rescored by the corpus bigram LM, not ranked
    token-by-token (the token-level form is ``did_you_mean``).

    Spec (pinned, shared with ``doc_bigram_lm``'s stupid backoff —
    Brants et al. 2007):
      * per query token (in order): candidates = dictionary terms at
        byte-Levenshtein ≤ 1, top ``per_tok`` by (distance ASC,
        df DESC, term ASC); a token with no neighbor keeps itself;
      * phrase score = ln(c(t1)/total) + Σ_pairs ln S(w_i | w_{i-1}),
        S = c(w1,w2)/c(w1) when the corpus bigram count ≥ ``min_count``,
        else alpha·c(w2)/total; an OOV token (only possible via the
        kept-original branch) floors its unigram count at 1;
      * top-k by (round6(logp) DESC, phrase ASC).

    Scale shape: candidate generation scans the term DICTIONARY
    (metadata-scale, engine-cached — same path as ``did_you_mean``);
    LM counts ride ONE tagged vocabulary-scale exchange (the
    ``doc_bigram_lm`` counting pass) but are FILTERED map-side against
    the broadcast candidate-gram set, so the driver sees at most
    per_tok²·(n−1) + per_tok·n count rows — never the vocabulary.
    Columns: (rank, phrase, logp)."""
    import itertools

    import ray
    import ray.data as rd

    from zensearch_ray.functions.fuzzy import edit1_mask

    toks = tokenize(query)
    if not toks:
        return pd.DataFrame({"rank": pd.Series(dtype=np.int64),
                             "phrase": pd.Series(dtype=object),
                             "logp": pd.Series(dtype=np.float64)})
    if len(toks) > 8:
        raise ValueError("suggest_phrase supports queries of ≤ 8 tokens")
    engine = QueryEngine(index_dir_for(sf_dir))
    vocab = engine._all_terms()
    cands: list[list[str]] = []
    for tok in toks:
        hits = [vocab[i] for i in np.nonzero(edit1_mask(vocab, tok))[0]]
        hits.sort(key=lambda t: (t != tok, -engine.df(t), t))
        cands.append(hits[:per_tok] if hits else [tok])

    SEP = "\x1f"
    needed = {f"1{SEP}{t}" for cs in cands for t in cs}
    for a_cs, b_cs in zip(cands, cands[1:]):
        needed.update(
            f"2{SEP}{a}{SEP}{b}" for a in a_cs for b in b_cs
        )
    need_ref = ray.put(frozenset(needed))

    def counts_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        need = ray.get(need_ref)
        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            ts = tokenize(text)
            c.update(x for x in ("1" + SEP + t for t in ts) if x in need)
            c.update(
                x
                for x in ("2" + SEP + a + SEP + b for a, b in zip(ts, ts[1:]))
                if x in need
            )
        return pa.table(
            {
                "key": pa.array(list(c.keys()), type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    got = (
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
        .map_batches(counts_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    if got.empty:
        # all-empty to_pandas() loses columns: an all-OOV query whose
        # candidate grams never occur in the corpus must fall through to
        # backoff scoring, not KeyError on the missing "key" column.
        got = pd.DataFrame({"key": pd.Series(dtype=object),
                            "c": pd.Series(dtype=np.int64)})
    cnt = dict(zip(got["key"], got["c"].astype(np.int64)))
    total = float(engine.manifest["sum_dl"])

    def uc(t: str) -> int:
        return int(cnt.get(f"1{SEP}{t}", 0))

    def pair_logp(a: str, b: str) -> float:
        cab = int(cnt.get(f"2{SEP}{a}{SEP}{b}", 0))
        ca = uc(a)
        if cab >= min_count and ca:
            return float(np.log(cab / ca))
        return float(np.log(alpha * max(uc(b), 1) / total))

    rows = []
    for combo in itertools.product(*cands):
        lp = float(np.log(max(uc(combo[0]), 1) / total))
        lp += sum(pair_logp(a, b) for a, b in zip(combo, combo[1:]))
        rows.append((" ".join(combo), round(lp, 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(rows) + 1, dtype=np.int64),
            "phrase": pd.Series([r[0] for r in rows], dtype=object),
            "logp": np.array([r[1] for r in rows], dtype=np.float64),
        }
    )


def term_vectors(sf_dir: str, doc_id: int) -> pd.DataFrame:
    """ES ``termvectors`` analog: per term of ONE document — tf, corpus
    df, and the token positions (comma-joined string so the frame stays
    scalar-typed for value checking). Reads ONLY the source doc's text
    via parquet predicate pushdown; df comes from the index. Columns:
    (term, tf, df, positions), term ASC."""
    import pyarrow.parquet as pq

    engine = QueryEngine(index_dir_for(sf_dir))
    texts = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "==", doc_id)],
    )["text"].to_pylist()
    if not texts:
        raise ValueError(f"doc_id {doc_id} not found")
    toks = tokenize(texts[0])
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    terms = sorted(pos)
    return pd.DataFrame(
        {
            "term": terms,
            "tf": np.array([len(pos[t]) for t in terms], dtype=np.int64),
            "df": np.array([engine.df(t) for t in terms], dtype=np.int64),
            "positions": [",".join(map(str, pos[t])) for t in terms],
        }
    )


def match_percentiles(sf_dir: str, query: str,
                      qs: tuple = (0.25, 0.5, 0.75, 0.9)) -> pd.DataFrame:
    """Percentiles aggregation over the match set (the ES
    ``percentiles`` agg with the exact ``percentile_disc`` rank rule:
    value at rank ceil(q·n), 1-based, over sorted matched doc_len).
    Columns: (q, value)."""
    engine = QueryEngine(index_dir_for(sf_dir))
    plan = engine._term_plan(query)
    if not plan:
        return pd.DataFrame({"q": np.array(qs, dtype=np.float64),
                             "value": np.full(len(qs), np.nan)})
    uniq, scores = engine._accumulate_plan(plan)
    matched = uniq[scores > 0.0]
    v = np.sort(engine._numeric_values(matched, "doc_len"))
    v = v[~np.isnan(v)]
    vals = [
        float(v[min(max(int(np.ceil(q * len(v))) - 1, 0), len(v) - 1)])
        if len(v) else float("nan")
        for q in qs
    ]
    return pd.DataFrame(
        {
            "q": np.array(qs, dtype=np.float64),
            "value": np.array([round6(x) for x in vals], dtype=np.float64),
        }
    )


def more_like_this(
    sf_dir: str, doc_id: int, m: int = 5, k: int = 10
) -> pd.DataFrame:
    """Related-documents query ("more like this"): the source doc's
    top-``m`` terms by tf·idf (ties → term ASC; idf-0 terms excluded)
    become an OR-query scored exhaustively; the source doc is excluded
    from the results. Only the source doc's text is read (predicate
    pushdown) — term statistics come from the index. Columns:
    (rank, doc_id, score)."""
    import pyarrow.parquet as pq
    from collections import Counter

    from zensearch_ray.functions.bm25 import idf

    engine = QueryEngine(index_dir_for(sf_dir))
    texts = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "==", doc_id)],
    )["text"].to_pylist()
    if not texts:
        raise ValueError(f"doc_id {doc_id} not found in {sf_dir}/documents.parquet")
    text = texts[0]
    tf0 = Counter(tokenize(text))
    cand = []
    for term, tf in tf0.items():
        w = idf(engine.n_docs, engine.df(term))
        if w > 0.0:
            cand.append((tf * w, term))
    cand.sort(key=lambda x: (-x[0], x[1]))
    plan = []
    for _, term in cand[:m]:
        p = engine.lookup(term)
        plan.append((p, idf(engine.n_docs, p.df)))
    hits = [
        (d, s) for d, s in engine._score_plan(plan, k + 1) if d != doc_id
    ][:k]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in hits], dtype=np.int64),
            "score": np.array([round6(s) for _, s in hits], dtype=np.float64),
        }
    )


def term_pagerank(
    sf_dir: str, damping: float = 0.85, iters: int = 20, k: int = 50
) -> pd.DataFrame:
    """TextRank: PageRank over the directed term-adjacency graph
    (nodes = terms, edge term_a → term_b weighted by corpus count of
    the adjacent bigram "a b") — the graph-centrality variant of
    keyword extraction (vs ``doc_keywords``' tf·idf). Edge extraction
    reuses the pre-aggregated bigram pipeline (`_bigram_partials` →
    one coarse exchange), so the PageRank input is vocab²-bounded, and
    the iteration auto-routes (``stages/graph.py:pagerank_auto``)
    between the broadcast pass and the sharded contribution exchange.

    Output: top-``k`` (rank, term, pagerank) ordered by
    (round6(pagerank) DESC, term) — ordered on the ROUNDED value so
    distributed summation order cannot flip ranks vs the SQL oracle."""
    import pyarrow.compute as pc

    from zensearch_ray.functions.agg import bucketed_groupby_sum
    from zensearch_ray.stages.graph import pagerank_auto

    big = bucketed_groupby_sum(_bigram_partials(sf_dir), ["bigram"], ["cnt"])

    def split_edges(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["bigram"], " ")
        return pa.table(
            {
                "src": pc.list_element(parts, 0),
                "dst": pc.list_element(parts, 1),
                "w": batch["cnt"].cast(pa.float64()),
            }
        )

    edges = big.map_batches(split_edges, batch_format="pyarrow")
    pr = pagerank_auto(edges, damping=damping, iters=iters)
    pr["pagerank"] = round6(pr["pagerank"])
    pr = (
        pr.sort_values(["pagerank", "node"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    pr.insert(0, "rank", np.arange(1, len(pr) + 1, dtype=np.int64))
    return pr.rename(columns={"node": "term"})


def append_near_dedup(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Near-dup-aware append lifecycle (stages/sigstore.py) over the
    documents corpus: build a base index over all but the last 5% of
    docs WITH the persisted signature store, then append a delta of
    (a) the held-out fresh docs, (b) exact copies of three base texts
    under new urls, and (c) a within-delta twin pair — and report each
    delta url's fate. A fresh tmp dir per call: append is a stateful
    lifecycle, a cached index would double-append on rerun.

    Rows-only entry (MinHash near-dup is not SQL-expressible); the
    planted outcomes are additionally brute-force-oracled in
    ``tests/test_sigstore.py``. Columns: (url, action, est_matched) —
    deterministic given sf_dir.
    """
    import shutil

    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.build_index import append_index_dedup
    from zensearch_ray.sources.pages import documents_as_pages

    pages = documents_as_pages(sf_dir).drop_columns(["doc_id"])
    n = pages.num_rows
    n_fresh = max(10, n // 20)
    base, fresh = pages.slice(0, n - n_fresh), pages.slice(n - n_fresh, n_fresh)

    base_texts = base["text"].to_pylist()
    twin = fresh["text"][0].as_py() + " twin payload appended words"
    urls = [f"https://delta.example.com/planted/{i}" for i in range(5)]
    texts = [base_texts[3], base_texts[5], base_texts[7], twin, twin]
    ts0 = int(base["warc_ts"][-1].value) + 1_000_000
    planted = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(
                [ts0 + i for i in range(5)], type=pa.timestamp("us")
            ),
            "html": pa.array([b""] * 5, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * 5, type=pa.string()),
        }
    )
    delta = pa.concat_tables([fresh.select(planted.column_names), planted])

    root = tempfile.mkdtemp(prefix="zensearch_neardup_")
    try:
        base_p = os.path.join(root, "base.parquet")
        delta_p = os.path.join(root, "delta.parquet")
        pq.write_table(base, base_p)
        pq.write_table(delta, delta_p)
        cfg = BuildConfig(
            num_shards=8, salt_subs=2, lang=None, sig_store=True,
        )
        build_index(base_p, os.path.join(root, "idx"), cfg)
        manifest = append_index_dedup(
            delta_p, os.path.join(root, "idx"), cfg, threshold=threshold
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    dropped = set(manifest["near_dedup"]["dropped_urls"])
    all_urls = sorted(delta["url"].to_pylist())
    return pd.DataFrame(
        {
            "url": all_urls,
            "action": ["dropped" if u in dropped else "kept" for u in all_urls],
        }
    )


def regex_topk(sf_dir: str, pattern: str, k: int = 10) -> pd.DataFrame:
    """Regex BM25 top-k: the pattern is expanded against the index term
    dictionary (full-match; metadata-only — ``QueryEngine.expand_regex``)
    and scored as an OR-query. Columns: (rank, doc_id, score); SQL
    oracle: qterms = DISTINCT corpus terms with regexp_full_match."""
    engine = QueryEngine(index_dir_for(sf_dir))
    kept = [(d, round6(s)) for d, s in engine.topk_regex(pattern, k=k)]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(kept) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in kept], dtype=np.int64),
            "score": np.array([s for _, s in kept], dtype=np.float64),
        }
    )


def _gram_prune_fn(min_count: int, sep: str):
    """Pipeline-side n-gram model prune shared by the LM builders: the
    min_count filter runs AFTER the keyed aggregate and BEFORE the
    driver collect, so the singleton gram long tail (the bulk of the
    gram vocabulary) never reaches the driver; unigram rows (marker
    '1') are the backoff table and are kept unconditionally."""

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.or_(
            pc.starts_with(t["key"], "1" + sep),
            pc.greater_equal(t["c"], min_count),
        )
        return t.filter(keep)

    return prune


def doc_bigram_lm(sf_dir: str, min_count: int = 2, alpha: float = 0.4):
    """Per-document bigram language-model score with stupid backoff —
    the CCNet-style fluency filter one order up from ``doc_lm_score``:
    mean over a doc's adjacent token pairs of ln(S(w2|w1)), where
    S = c(w1,w2)/c(w1) when the corpus bigram count clears
    ``min_count``, else ``alpha``·c(w2)/total (Brants et al. 2007).

    Distributed plan: unigram and bigram counts ride ONE tagged
    vocabulary-scale exchange (per-batch Counter partials, marker-
    prefixed keys, keyed Sum). The pruned bigram table is the broadcast
    model artifact — pruning is what bounds it (CCNet ships a trained
    KenLM binary the same way); at web scale shard the model by
    w1-hash and co-partition scoring instead of broadcasting. Scoring
    is a map-only pass. Docs with fewer than two tokens emit no row
    (no pairs — mirrors the SQL oracle's lateral unnest).
    Output: (doc_id, bigram_lm)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    SEP = "\x1f"

    def counts_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = tokenize(text)
            c.update("1" + SEP + t for t in toks)
            c.update("2" + SEP + a + SEP + b for a, b in zip(toks, toks[1:]))
        return pa.table(
            {
                "key": pa.array(list(c.keys()), type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(counts_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(_gram_prune_fn(min_count, SEP), batch_format="pyarrow")
        .to_pandas()
    )
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for key, c in zip(counts["key"], counts["c"]):
        kind, rest = key.split(SEP, 1)
        if kind == "1":
            uni[rest] = int(c)
        else:  # non-unigram rows arrive pre-pruned to c >= min_count
            w1, w2 = rest.split(SEP, 1)
            big[(w1, w2)] = int(c)
    total = float(sum(uni.values()))
    bi_logp = {
        (w1, w2): float(np.log(c12 / uni[w1])) for (w1, w2), c12 in big.items()
    }
    backoff = {t: float(np.log(alpha * c / total)) for t, c in uni.items()}
    model_ref = ray.put((bi_logp, backoff))

    def score(batch: pa.Table) -> pa.Table:
        bi, bo = ray.get(model_ref)
        ids, scores = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = tokenize(text)
            if len(toks) < 2:
                continue
            s = sum(
                bi.get((a, b)) if (a, b) in bi else bo[b]
                for a, b in zip(toks, toks[1:])
            )
            ids.append(doc_id)
            scores.append(s / (len(toks) - 1))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "bigram_lm": pa.array(
                    round6(np.asarray(scores, dtype=np.float64)),
                    type=pa.float64(),
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def doc_trigram_lm(sf_dir: str, min_count: int = 2, alpha: float = 0.4):
    """Per-document TRIGRAM language-model score — the recursive stupid
    backoff one order above ``doc_bigram_lm`` (Brants et al. 2007):
    mean over a doc's token triples of ln S(w3|w1,w2), with
      S3 = c(w1w2w3)/c(w1w2)      when the trigram count ≥ min_count
         = alpha · S2(w3|w2)      otherwise,
      S2 = c(w2w3)/c(w2)          when the bigram count ≥ min_count
         = alpha · c(w3)/total    otherwise.
    Docs with fewer than three tokens emit no row.

    Distributed plan mirrors ``doc_bigram_lm``: uni/bi/tri counts ride
    ONE tagged vocabulary-scale exchange; the PRUNED bi/tri tables are
    the broadcast model (pruning bounds them — a trigram that survives
    min_count implies its bigram prefix survives too, so every needed
    denominator is in the pruned set); scoring is a map-only pass.
    Output: (doc_id, trigram_lm)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    SEP = "\x1f"

    def counts_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = tokenize(text)
            c.update("1" + SEP + t for t in toks)
            c.update("2" + SEP + a + SEP + b for a, b in zip(toks, toks[1:]))
            c.update(
                "3" + SEP + a + SEP + b + SEP + d
                for a, b, d in zip(toks, toks[1:], toks[2:])
            )
        return pa.table(
            {
                "key": pa.array(list(c.keys()), type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(counts_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("c", alias_name="c"))
        .map_batches(_gram_prune_fn(min_count, SEP), batch_format="pyarrow")
        .to_pandas()
    )
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    tri: dict[tuple[str, str, str], int] = {}
    for key, c in zip(counts["key"], counts["c"]):
        kind, rest = key.split(SEP, 1)
        if kind == "1":
            uni[rest] = int(c)
        else:  # non-unigram rows arrive pre-pruned to c >= min_count
            parts = rest.split(SEP)
            if kind == "2":
                big[(parts[0], parts[1])] = int(c)
            else:
                tri[(parts[0], parts[1], parts[2])] = int(c)
    total = float(sum(uni.values()))
    la = float(np.log(alpha))
    tri_logp = {
        w: float(np.log(c / big[w[:2]])) for w, c in tri.items()
    }
    bi_logp = {
        w: la + float(np.log(c / uni[w[0]])) for w, c in big.items()
    }
    backoff = {
        t: 2 * la + float(np.log(c / total)) for t, c in uni.items()
    }
    model_ref = ray.put((tri_logp, bi_logp, backoff))

    def score(batch: pa.Table) -> pa.Table:
        t3, t2, bo = ray.get(model_ref)
        ids, scores = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = tokenize(text)
            if len(toks) < 3:
                continue
            s = 0.0
            for w in zip(toks, toks[1:], toks[2:]):
                lp = t3.get(w)
                if lp is None:
                    lp = t2.get(w[1:])
                    if lp is None:
                        lp = bo[w[2]]
                s += lp
            ids.append(doc_id)
            scores.append(s / (len(toks) - 2))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "trigram_lm": pa.array(
                    round6(np.asarray(scores, dtype=np.float64)),
                    type=pa.float64(),
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def jaccard_topk_indexed(sf_dir: str, probe_doc_id: int = 0, k: int = 10,
                         _diag: dict | None = None) -> pd.DataFrame:
    """Index-backed unigram-Jaccard top-k: (rank, doc_id, jaccard).

    The round-2 referee (``stages/minhash.jaccard_topk``) scans the
    whole corpus per probe with a per-row Python token-set loop. This
    is the serving path: candidates come FROM THE POSTING LISTS — the
    OR-union over the probe terms' postings is provably the complete
    set of docs with non-zero token intersection (a doc sharing any
    token with the probe appears in that token's postings), i.e.
    exactly the docs with jaccard > 0 — and each candidate's
    intersection size falls out of the same decode (the number of
    probe terms whose postings contain it; terms are distinct). Only
    the CANDIDATES' texts are fetched, with the id filter pushed into
    the parquet read (row-group pruning on doc_id statistics), to get
    each candidate's distinct-token count; per-batch partial top-k
    keeps the driver merge at k×batches rows. Docs with zero overlap
    are filled from the index's live-doc universe (metadata-scale) in
    doc_id order, matching the SQL oracle's LEFT JOIN semantics.

    ``_diag`` (tests): filled with n_candidates / n_text_rows_fetched
    so the no-full-scan contract is assertable.
    """
    import ray
    import ray.data as rd
    import pyarrow.dataset as pads

    probe_text = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "==", probe_doc_id)],
    )["text"][0].as_py()
    probe = sorted(set(tokenize(probe_text)))
    n_probe = len(probe)

    engine = QueryEngine(index_dir_for(sf_dir))
    arrs = []
    for t in probe:
        tp = engine.lookup(t)
        if tp is not None:
            arrs.append(tp.decode_all()[0])
    if arrs:
        cand, inter = np.unique(np.concatenate(arrs), return_counts=True)
        keep = cand != probe_doc_id
        cand, inter = cand[keep], inter[keep]
    else:
        cand = np.empty(0, dtype=np.int64)
        inter = np.empty(0, dtype=np.int64)
    if _diag is not None:
        _diag["n_candidates"] = int(len(cand))
        _diag["n_text_rows_fetched"] = 0

    rows = []
    if len(cand):
        lookup_ref = ray.put((cand.astype(np.int64), inter.astype(np.int64)))

        def partial(batch: pa.Table) -> pa.Table:
            c_ids, c_inter = ray.get(lookup_ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            out_i, out_j = [], []
            for row, (doc_id, text) in enumerate(
                zip(ids, batch["text"].to_pylist())
            ):
                j = int(np.searchsorted(c_ids, doc_id))
                if j >= len(c_ids) or c_ids[j] != doc_id:
                    continue  # filter pushdown is row-GROUP level; drop
                    # the stragglers sharing a row group with candidates
                nset = len(set(tokenize(text)))
                i = int(c_inter[j])
                out_i.append(doc_id)
                out_j.append(i / (n_probe + nset - i))
            t = pa.table({
                "doc_id": pa.array(out_i, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            })
            if t.num_rows > k:
                order = np.lexsort((np.array(out_i), -np.array(out_j)))[:k]
                t = t.take(order)
            return t

        text_ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(cand.tolist()),
        )
        if _diag is not None:  # observe the pruned read's true row yield
            _diag["n_text_rows_fetched"] = int(text_ds.count())
        got = text_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        got["jaccard"] = round6(got["jaccard"].to_numpy())
        got = got.sort_values(
            ["jaccard", "doc_id"], ascending=[False, True]
        ).head(k)
        rows.append(got)

    n_have = int(sum(len(r) for r in rows))
    if n_have < k:
        # zero-overlap fill: smallest live non-candidate ids (the
        # universe is metadata-scale and already cached by the engine)
        uni = engine._universe()
        excl = np.union1d(cand, np.array([probe_doc_id], dtype=np.int64))
        zeros = uni[~np.isin(uni, excl, assume_unique=True)][: k - n_have]
        rows.append(pd.DataFrame({
            "doc_id": zeros.astype(np.int64),
            "jaccard": np.zeros(len(zeros), dtype=np.float64),
        }))

    out = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
        {"doc_id": pd.Series(dtype=np.int64),
         "jaccard": pd.Series(dtype=np.float64)}
    )
    out = out.head(k).reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out.astype({"doc_id": np.int64, "jaccard": np.float64})


def temperature_sample(sf_dir: str, group_col: str = "lang"):
    """Temperature-based source mixing at T = 1/2 (the Pile / multilingual-
    LM resampling family: target share q_g ∝ count_g^T flattens the
    group distribution toward uniform) realized by PURE DOWNSAMPLING —
    keep n_g = floor(sqrt(count_g · count_min)) docs per group, the
    largest target mix achievable without upsampling (the minority
    group is kept whole; every other group's keep count is the exact
    T=1/2 interpolation between its own size and the minority's).
    T is PINNED at 1/2 so the count math is integer + IEEE sqrt —
    bit-identical between numpy and the SQL oracle (general T needs
    pow(), whose last-ulp behavior is libm-specific).

    Distributed plan: pass 1 is a metadata-scale group count (per-batch
    value_counts partials, driver sum — |groups| rows move); the keep
    counts broadcast in the closure; pass 2 is the deterministic
    per-group hash-priority selection (same partial-top-N shape as
    ``lang_balanced_sample``, with a per-group N). Reruns, appends and
    cluster-size changes cannot alter the sample. Output: (group, doc_id).
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", group_col]
    )

    counts = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "g": t[group_col].to_pandas().value_counts().index.to_numpy(object),
                    "c": t[group_col].to_pandas().value_counts().to_numpy(np.int64),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("g")["c"]
        .sum()
    )
    c_min = int(counts.min())
    n_keep = {
        g: int(np.floor(np.sqrt(float(int(c) * c_min))))
        for g, c in counts.items()
    }

    def headn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(h=(df["doc_id"].to_numpy(np.int64) * 48271) % 65536)
        df = df.sort_values([group_col, "h", "doc_id"], kind="mergesort")
        capped = df.groupby(group_col, as_index=False, group_keys=False).apply(
            lambda d: d.head(n_keep.get(d[group_col].iloc[0], 0)),
            include_groups=True,
        )
        return capped

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return headn(df)[[group_col, "doc_id"]]

    partials = ds.map_batches(headn, batch_format="pandas")
    return (
        partials.map_batches(
            lambda t: t.append_column(
                "__one", pa.array(np.zeros(t.num_rows, np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("__one")
        .map_groups(finish, batch_format="pandas")
    )


SOURCE_QUALITY_NUM, SOURCE_QUALITY_DEN = 9, 100  # keep if pooled
# stopword density >= 9% — the C4/RefinedWeb-style "does this domain
# look like prose" gate, pinned as an exact integer ratio


def source_quality_gate(sf_dir: str):
    """Per-SOURCE quality verdict (C4 / RefinedWeb domain filtering:
    judge the *domain*, not the page — spam hosts produce many
    individually-plausible pages). Quality = POOLED stopword density
    Σ stop_tokens / Σ tokens per source — a ratio of exact integer
    sums, not a mean of per-doc ratios, so the keep verdict
    (100·Σstop ≥ 9·Σtokens) is integer math the SQL oracle reproduces
    bit-for-bit with no float-summation-order hazard.

    Distributed plan: map-only per-batch partials (source, n_docs,
    n_tokens, n_stop) — one row per (batch, source); the driver sums a
    |sources|-scale frame. Nothing but 32-byte stat rows ever moves;
    at web scale the combine becomes one tiny keyed aggregate over
    host-cardinality rows. Output: (source, n_docs, n_tokens, n_stop,
    keep)."""
    import ray.data as rd

    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.stages.textstats import STOPWORDS

    stop = frozenset(STOPWORDS)

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        toks = [tokenize(t) for t in batch["text"].to_pylist()]
        df = pd.DataFrame(
            {
                "source": srcs,
                "n_docs": np.ones(len(srcs), np.int64),
                "n_tokens": np.fromiter(
                    (len(t) for t in toks), np.int64, count=len(toks)
                ),
                "n_stop": np.fromiter(
                    (sum(1 for w in t if w in stop) for t in toks),
                    np.int64,
                    count=len(toks),
                ),
            }
        )
        out = df.groupby("source", as_index=False).sum()
        return pa.table(
            {
                "source": pa.array(out["source"].tolist(), pa.string()),
                "n_docs": pa.array(out["n_docs"].to_numpy(np.int64)),
                "n_tokens": pa.array(out["n_tokens"].to_numpy(np.int64)),
                "n_stop": pa.array(out["n_stop"].to_numpy(np.int64)),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    agg = parts.groupby("source", as_index=False)[
        ["n_docs", "n_tokens", "n_stop"]
    ].sum()
    agg["keep"] = (
        SOURCE_QUALITY_DEN * agg["n_stop"].to_numpy(np.int64)
        >= SOURCE_QUALITY_NUM * agg["n_tokens"].to_numpy(np.int64)
    ).astype(np.int64)
    return agg.astype(
        {
            "n_docs": np.int64,
            "n_tokens": np.int64,
            "n_stop": np.int64,
            "keep": np.int64,
        }
    ).sort_values("source", ignore_index=True)


def ccnet_buckets(sf_dir: str, n_parts: int = 16):
    """CCNet-style quality terciles (Wenzek et al. 2020: split the
    corpus into head/middle/tail by LM score; train on head, mine the
    middle): every doc labeled with NTILE(3) of the global
    (lm_score DESC, doc_id) order — tile 1 = head (most typical /
    lowest perplexity).

    A GLOBAL rank without a global sort: the score pass
    (``doc_lm_score``) emits 16 B/doc (doc_id, lm_score) rows; exact-
    quantile range pivots split score space; ONE range exchange
    co-locates each partition; per-partition counts come to the driver
    for an exclusive scan (n_parts numbers — the pack_sequences prefix
    trick); each partition then sorts locally and adds its base, so
    every rank is exact regardless of pivot quality. Tie runs share a
    partition (assignment is by score only; doc_id breaks ties inside).
    The labeled metadata rows are what moves — corpus text never rides
    the exchange. Output: (doc_id, lm_score, tile)."""
    import ray
    import ray.data as rd  # noqa: F401  (doc_lm_score owns the read)

    from zensearch_ray.pipelines.sort import range_partitioned

    scores = doc_lm_score(sf_dir)
    # negate: range_partitioned orders ascending; the CCNet order is
    # score DESC (head first)
    def add_neg(t: pa.Table) -> pa.Table:
        s = t["lm_score"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": t["doc_id"], "lm_score": t["lm_score"],
             "neg": pa.array(-s, type=pa.float64())}
        )

    neg = scores.map_batches(add_neg, batch_format="pyarrow")
    # the pivot/assign pass keeps `neg`; drop it before the exchange —
    # it is derivable from lm_score, no reason to ship 8 B/row twice
    parted = range_partitioned(neg, "neg", n_parts).drop_columns(["neg"]).materialize()

    # per-partition counts as one streaming bincount-vector partial per
    # block + a driver sum (n_parts ints) — NOT a keyed aggregate; a Ray
    # groupby here costs a second all-to-all over every metadata row
    def count_partial(t: pa.Table) -> pa.Table:
        c = np.bincount(
            t["__part"].to_numpy(zero_copy_only=False), minlength=n_parts
        ).astype(np.int64)
        return pa.table({"cnt": pa.array([c.tolist()], pa.list_(pa.int64()))})

    partials = parted.map_batches(
        count_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    cnt = np.sum(np.stack(partials["cnt"].to_numpy()), axis=0).astype(np.int64) \
        if len(partials) else np.zeros(n_parts, dtype=np.int64)
    order = np.arange(n_parts, dtype=np.int64)
    bases = {int(p): int(b) for p, b in zip(order, np.concatenate([[0], np.cumsum(cnt)[:-1]]))}
    n_total = int(cnt.sum())
    q, r = divmod(n_total, 3)
    c1 = q + (1 if r >= 1 else 0)
    c2 = c1 + q + (1 if r >= 2 else 0)
    bases_ref = ray.put(bases)

    def label(group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["__part"].iloc[0])
        base = ray.get(bases_ref)[part]
        g = group.sort_values(
            ["lm_score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        rank = base + np.arange(len(g), dtype=np.int64)
        tile = np.where(rank < c1, 1, np.where(rank < c2, 2, 3)).astype(
            np.int64
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "lm_score": g["lm_score"].to_numpy(np.float64),
                "tile": tile,
            }
        )

    return parted.groupby("__part").map_groups(label, batch_format="pandas")
