"""BM25 top-k query serving over the compressed segment index.

Replaces the reference's relevance path — which pulls the ENTIRE corpus
over the wire and scores every document per query
(``search-engine/main.go:127-174``, ``internal/bm25/score.go:19-95``) —
with selective posting-list retrieval: only the query terms' postings
are read and decoded; the corpus never moves.

Two evaluation strategies, both rank-identical to the brute-force
oracle (verified in tests):

  * ``topk`` — exhaustive: decode every posting of every query term,
    vectorized float64 BM25, accumulate per doc, top-k by
    (score DESC, doc_id ASC). Bit-identical scores to the oracle (same
    kernels, same accumulation order).
  * ``topk_pruned`` — TAAT MaxScore with block-max skip decoding:
    terms processed in descending max-contribution order; once the sum
    of remaining terms' upper bounds falls below the current k-th
    score, docs not yet seen cannot enter the top-k, so remaining
    terms decode ONLY the blocks that can contain already-seen docs
    (block ranges located via the block_last_doc skip pointers).
    Rank-preserving by construction; verified against ``topk``.

Serving at scale: ``QueryScorer`` is an actor-pool `map_batches` class —
segments load once per actor (``__init__``), queries stream as batches.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from zensearch_ray.functions.bm25 import (
    LMD_MU,
    LMJM_LAMBDA,
    BM25Params,
    idf,
    tf_norm,
    topk_order,
)
from zensearch_ray.functions.codec import (
    decode_positions,
    decode_posting,
    decode_posting_blocks,
    delta_decode_docids,
    varint_decode,
)
from zensearch_ray.functions.ids import term_shard
from zensearch_ray.functions.text import tokenize
from zensearch_ray.state.manifest import IndexLayout

_POSTING_COLS = [
    "term", "df", "docs", "tfs", "dls",
    "block_last_doc", "block_max", "block_doc_off", "block_tf_off", "block_dl_off",
]


class _TermPostings:
    """Decoded-on-demand postings of one term (possibly merged from
    several salt sub-partitions). ``deleted`` (sorted tombstoned
    doc_ids, see ``pipelines/delete.py``) filters at decode time — the
    one choke point every evaluation strategy flows through, so
    tombstoned docs vanish from exhaustive/pruned/and/phrase/near/
    prefix/fuzzy/not alike. ``df`` stays the STORED count (tombstones
    included) until compaction — Lucene's stats-at-merge semantics, so
    surviving docs keep their exact pre-delete scores."""

    __slots__ = ("df", "rows", "_decoded", "_pos", "_deleted")

    def __init__(self, rows: list[dict], deleted: np.ndarray | None = None):
        self.rows = rows
        self.df = sum(r["df"] for r in rows)
        self._decoded = None
        self._pos = None
        self._deleted = deleted if deleted is not None and len(deleted) else None

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._decoded is None:
            parts = [decode_posting(r) for r in self.rows]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            order = np.argsort(ids, kind="stable")
            ids, tfs, dls = ids[order], tfs[order], dls[order]
            if self._deleted is not None and len(ids):
                # sorted-membership probe (tombstone set is sorted unique)
                j = np.searchsorted(self._deleted, ids)
                hit = (j < len(self._deleted)) & (
                    self._deleted[np.minimum(j, len(self._deleted) - 1)] == ids
                )
                if hit.any():
                    keep = ~hit
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            self._decoded = (ids, tfs, dls)
        return self._decoded

    def max_tf_norm_bound(self) -> float:
        # _bound_scale corrects stale block-max bounds from segments
        # encoded under an older (smaller) avgdl — see QueryEngine.lookup
        return max(
            float(np.max(r["block_max"])) * r.get("_bound_scale", 1.0)
            for r in self.rows
        )

    def _pos_decoded(self):
        """Per-fragment (ids, tfs, cum, flat positions), decoded ONCE
        per term and cached — stopword-scale positional blobs must not
        re-decode on every phrase query."""
        if self._pos is None:
            decoded = []
            for r in self.rows:
                if "pos" not in r or r["pos"] is None:
                    raise ValueError("index was built without positions")
                ids = delta_decode_docids(r["docs"])
                tfs = varint_decode(r["tfs"]).astype(np.int64)
                flat = decode_positions(r["pos"], tfs)
                cum = np.empty(len(tfs) + 1, dtype=np.int64)
                cum[0] = 0
                np.cumsum(tfs, out=cum[1:])
                decoded.append((ids, tfs, cum, flat))
            self._pos = decoded
        return self._pos

    def positions_pairs(
        self, cand_sorted: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """All (candidate-index, token-position) occurrence pairs of
        this term within the candidate docs — fully vectorized
        (searchsorted row hits + ranges-gather of the flat positional
        stream, no Python loop over docs). A doc lives in exactly one
        fragment per term (salting routes by doc; generations hold
        disjoint docs), so fragments just concatenate."""
        reps, flats = [], []
        for ids, tfs, cum, flat in self._pos_decoded():
            if len(ids) == 0:
                continue
            j = np.searchsorted(ids, cand_sorted)
            hit = (j < len(ids)) & (
                ids[np.minimum(j, len(ids) - 1)] == cand_sorted
            )
            if not hit.any():
                continue
            rows_sel = j[hit]
            counts = tfs[rows_sel]
            total = int(counts.sum())
            if total == 0:
                continue
            out_base = np.empty(len(counts), dtype=np.int64)
            out_base[0] = 0
            np.cumsum(counts[:-1], out=out_base[1:])
            idx = np.repeat(cum[rows_sel] - out_base, counts) + np.arange(total)
            flats.append(flat[idx])
            reps.append(np.repeat(np.flatnonzero(hit), counts))
        if not reps:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy()
        return np.concatenate(reps), np.concatenate(flats)

    def decode_candidates(self, cand_sorted: np.ndarray):
        """Decode only blocks whose doc-id range intersects the sorted
        candidate doc_ids. Returns (doc_ids, tfs, dls) concatenated."""
        if self._decoded is not None:
            # full decode already cached (warm term) — slicing it beats
            # re-decoding blocks from bytes
            ids, tfs, dls = self._decoded
            pos = np.searchsorted(cand_sorted, ids)
            hit = (pos < len(cand_sorted)) & (
                cand_sorted[np.minimum(pos, len(cand_sorted) - 1)] == ids
            )
            return ids[hit], tfs[hit], dls[hit]
        ids_l, tfs_l, dls_l = [], [], []
        for r in self.rows:
            last = np.asarray(r["block_last_doc"], dtype=np.int64)
            if len(last) == 0:
                continue
            first = np.empty_like(last)
            # block i covers (last[i-1], last[i]]; first block starts at 0
            first[0] = 0
            first[1:] = last[:-1] + 1
            # a block intersects candidates iff some candidate in [first, last]
            lo = np.searchsorted(cand_sorted, first, side="left")
            hit = (lo < len(cand_sorted)) & (
                np.where(lo < len(cand_sorted), cand_sorted[np.minimum(lo, len(cand_sorted) - 1)], np.iinfo(np.int64).max)
                <= last
            )
            blocks = np.flatnonzero(hit)
            if len(blocks):
                i, t, d = decode_posting_blocks(r, blocks)
                ids_l.append(i)
                tfs_l.append(t)
                dls_l.append(d)
        if not ids_l:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        order = np.argsort(ids, kind="stable")
        return ids[order], tfs[order], dls[order]


def _chunked_verify(hits, k, verify_fn):
    """Early-exit verification shared by the positional operators:
    ``hits`` arrive (score DESC, doc ASC); verify score-descending
    CHUNKS (geometric growth) and stop as soon as k docs survive.
    Common patterns (stopword bigrams — most candidates match) verify
    only a small prefix; rare ones degrade to one full pass.
    ``verify_fn(cand_sorted) -> set`` returns the surviving doc ids."""
    out: list[tuple[int, float]] = []
    idx, chunk = 0, max(4096, 4 * k)
    while idx < len(hits) and len(out) < k:
        batch = hits[idx : idx + chunk]
        idx += chunk
        chunk *= 4
        cand = np.sort(
            np.fromiter((d for d, _ in batch), dtype=np.int64, count=len(batch))
        )
        verified = verify_fn(cand)
        out.extend((d, sc) for d, sc in batch if d in verified)
    return out[:k]


class QueryEngine:
    """Loads the index manifest; looks up terms via parquet predicate
    pushdown on the per-partition segment files; caches decoded terms."""

    def __init__(self, index_dir: str, cache_terms: int = 4096):
        layout = IndexLayout(index_dir)
        self.manifest = layout.read_manifest()
        self.layout = layout
        self.n_docs = int(self.manifest["n_docs"])
        self.avgdl = float(self.manifest["avgdl"])
        self.num_shards = int(self.manifest["num_shards"])
        self.salt_subs = int(self.manifest["salt_subs"])
        self.params = BM25Params(
            k1=float(self.manifest["k1"]), b=float(self.manifest["b"])
        )
        self.positional = bool(self.manifest.get("positions"))
        self._posting_cols = (
            _POSTING_COLS + ["pos"] if self.positional else _POSTING_COLS
        )
        self._cache: OrderedDict[str, _TermPostings | None] = OrderedDict()
        self._cache_cap = cache_terms
        self._vocab: list[str] | None = None  # lazy, fuzzy expansion only
        self._vocab_df = None  # lazy (terms, df) arrays, autocomplete only
        # tombstones (pipelines/delete.py): loaded once per engine;
        # deletes applied after construction need a reopen to be seen
        self.deleted = layout.read_deletes()
        # analyzer config echoed from the manifest: a stem-built index
        # stores stems, so the QUERY tokens must stem identically or
        # surface forms would silently miss ("tables" vs stored "table")
        self.stem = bool(self.manifest.get("stem", False))
        # index-time synonym folding echoed the same way: a folded
        # index stores canonical terms only, so query variants must
        # fold identically or surface forms would silently miss
        self.syn_fold = {
            a: b for a, b in self.manifest.get("synonyms") or ()
        }

    def _qtokens(self, text: str) -> list[str]:
        """Query-side analysis: the pinned tokenizer plus, iff the
        index was stem-built, the same pinned S-stemmer — doc and query
        sides MUST share the analyzer (Lucene's search-analyzer rule).
        Serves the scoring family (topk/pruned/bmw/and/sim/boosted/
        msm/dismax/not/explain) AND the positional modes (phrase/near/
        seq — positions key stems, every occurrence keeps its offset);
        pattern modes (prefix/wildcard/regex/fuzzy) match the stored
        dictionary directly."""
        toks = tokenize(text)
        if self.syn_fold:
            syn = self.syn_fold
            toks = [syn.get(t, t) for t in toks]
        if self.stem:
            from zensearch_ray.functions.text import s_stem

            toks = [s_stem(t) for t in toks]
        return toks

    # -- lookup -----------------------------------------------------------
    def _part_files(self, shard: int) -> list[str]:
        """Every generation's segment file of every sub-partition of the
        shard (appends add generations; salting may differ per
        generation, so all sub-partitions are probed)."""
        out = []
        for sub in range(self.salt_subs):
            out.extend(
                self.layout.part_posting_files(shard * self.salt_subs + sub)
            )
        return out

    def _term_dict_files(self) -> list[str]:
        """One file per committed segment carrying its sorted unique
        ``term`` column: the term-dictionary sidecar when present
        (metadata-only — segments never opened), else the segment
        itself (pre-sidecar indexes; same sorted term column, just a
        bigger file to prune through)."""
        import os as _os

        out = []
        for part in range(self.num_shards * self.salt_subs):
            for path in self.layout.part_posting_files(part):
                side = self.layout.dict_path_for(path)
                out.append(side if _os.path.exists(side) else path)
        return out

    def _trigram_files(self) -> list[str] | None:
        """Per-segment character-trigram sidecars
        (``IndexLayout.trigram_dir``), or None when any committed
        segment lacks one (pre-trigram index) — callers fall back to
        the vocabulary scan. No in-segment fallback exists: trigram
        rows are derived, not stored in segments."""
        import os as _os

        out = []
        for part in range(self.num_shards * self.salt_subs):
            for path in self.layout.part_posting_files(part):
                side = self.layout.trigram_path_for(path)
                if not _os.path.exists(side):
                    return None
                out.append(side)
        return out

    def _symspell_files(self) -> list[str] | None:
        """Per-segment SymSpell delete-neighborhood sidecars
        (``IndexLayout.symspell_dir``), or None when any committed
        segment lacks one (pre-sidecar index) — the caller falls back
        to building the in-memory index from the full vocabulary.
        Same presence rule as ``_trigram_files``."""
        import os as _os

        out = []
        for part in range(self.num_shards * self.salt_subs):
            for path in self.layout.part_posting_files(part):
                side = self.layout.symspell_path_for(path)
                if not _os.path.exists(side):
                    return None
                out.append(side)
        return out

    def expand_infix(self, substr: str, max_terms: int = 1000) -> list[str]:
        """Dictionary terms CONTAINING ``substr`` (normalized), sorted —
        the sublinear path behind leading-'*' wildcards. Reads only the
        query's trigram lists from the per-segment trigram sidecars
        (parquet ``tri IN (...)`` pushdown): a term qualifies as a
        candidate when it carries ALL of the query's trigrams in one
        segment (its sidecar holds the full term string, so no
        cross-segment assembly), then the substring test removes
        out-of-order false positives. Substrings under 3 chars, or a
        pre-trigram index, fall back to filtering the cached vocab.
        Raises over ``max_terms`` like the other expanders."""
        from zensearch_ray.functions.text import normalize

        substr = normalize(substr)
        if not substr:
            return []
        files = self._trigram_files() if len(substr) >= 3 else None
        if files is None:
            out = sorted({t for chunk in self._vocab_chunks()
                          for t in chunk if substr in t})
        else:
            tris = sorted({substr[i : i + 3] for i in range(len(substr) - 2)})
            cands: set[str] = set()
            for path in files:
                t = pq.read_table(
                    path, columns=["tri", "term"],
                    filters=[("tri", "in", tris)],
                ).to_pandas()
                if not len(t):
                    continue
                hits = t.groupby("term")["tri"].nunique()
                cands.update(hits[hits == len(tris)].index)
            out = sorted(t for t in cands if substr in t)
        if len(out) > max_terms:
            raise ValueError(
                f"infix {substr!r} expands to {len(out)} terms (> {max_terms})"
            )
        return out

    def lookup(self, term: str) -> _TermPostings | None:
        """term → merged postings across salt sub-partitions and append
        generations, or None."""
        hit = self._cache.get(term, "__miss__")
        if hit != "__miss__":
            self._cache.move_to_end(term)
            return hit
        shard = term_shard(term, self.num_shards)
        rows: list[dict] = []
        for path in self._part_files(shard):
            t = pq.read_table(
                path, columns=self._posting_cols, filters=[("term", "==", term)]
            )
            if t.num_rows == 0:
                continue
            # stale-bound correction: a segment encoded under avgdl_0 has
            # block_max bounds valid for avgdl_0; with the merged avgdl a
            # doc's tf_norm can grow by at most avgdl_now/avgdl_0 (see
            # append_index docstring), so scaling keeps pruning safe
            meta = t.schema.metadata or {}
            enc = float(meta.get(b"encode_avgdl", self.avgdl) or self.avgdl)
            scale = max(1.0, self.avgdl / enc) if enc > 0 else 1.0
            for r in t.to_pylist():
                r["_bound_scale"] = scale
                rows.append(r)
        result = _TermPostings(rows, deleted=self.deleted) if rows else None
        self._cache[term] = result
        if len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)
        return result

    def df(self, term: str) -> int:
        p = self.lookup(term)
        return p.df if p else 0

    # -- scoring ----------------------------------------------------------
    def _term_plan(self, query: str):
        """tokens (with multiplicity) → [(postings, idf)] skipping
        df=0 / idf=0 terms, mirroring the oracle's term loop."""
        plan = []
        for tok in self._qtokens(query):
            p = self.lookup(tok)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        return plan

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Exhaustive evaluation — the checked default (SURVEY.md §7-5)."""
        return self._score_plan(self._term_plan(query), k)

    # dense-id accumulator cap: one float64 per POSSIBLE doc id — 1 GB
    # at 128M ids. Above this (or for hash-id indexes) fall back to the
    # sort-based unique merge.
    _DENSE_ACC_MAX_IDS = 134_217_728

    def _accumulate_plan(self, plan) -> tuple[np.ndarray, np.ndarray]:
        """Exhaustive accumulation over a [(postings, idf)] plan →
        (sorted unique doc_ids, summed scores).

        Dense-id indexes accumulate into a ``bincount`` array over the
        id space — O(n) versus the O(n log n) ``np.unique`` sort that
        dominated warm latency once common terms carried millions of
        postings (measured: 128 ms of a ~270 ms query at 9.9M docs).
        Identical output: every plan contribution is strictly positive
        (idf-0 terms never enter a plan), so the nonzero cells are
        exactly the docs present in the accumulated postings."""
        all_ids, all_contrib = [], []
        for p, w in plan:
            ids, tfs, dls = p.decode_all()
            all_ids.append(ids)
            all_contrib.append(w * tf_norm(tfs, dls, self.avgdl, self.params))
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        ceiling = self.manifest.get("id_ceiling")
        if ceiling and int(ceiling) <= self._DENSE_ACC_MAX_IDS:
            dense = np.bincount(ids, weights=contrib,
                                minlength=int(ceiling))
            uniq = np.flatnonzero(dense)
            return uniq, dense[uniq]
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, contrib)
        return uniq, scores

    def _score_plan(self, plan, k: int) -> list[tuple[int, float]]:
        """Exhaustive accumulation over a [(postings, idf)] plan."""
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        mask = scores > 0.0
        top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_sim(
        self,
        query: str,
        k: int = 10,
        similarity: str = "bm25",
        mu: float = LMD_MU,
        delta: float = 1.0,
    ) -> list[tuple[int, float]]:
        """Pluggable similarity over the same postings — the Lucene
        ``Similarity`` plug-point (the reference hard-codes BM25,
        ``search-engine/internal/bm25/score.go:129-131``; real engines
        let the ranking function swap without re-indexing, and so does
        this: all modes read identical segments).

        - ``bm25``: the checked default path (``topk``).
        - ``tfidf``: SMART ltn — contribution (1 + ln tf)·ln(N/df) per
          matched DISTINCT query term; zero-score docs filtered (idf=0
          terms contribute nothing, as in the BM25 path).
        - ``lmd``: LM Dirichlet (Zhai & Lafferty 2004, the Lucene
          ``LMDirichletSimilarity`` shape, matched terms only)::

            ln(1 + tf·T/(μ·ctf)) + ln(μ/(dl+μ))   per matched term

          with T = total corpus tokens (avgdl·N from the manifest) and
          ctf = collection frequency of the term summed from the LIVE
          postings (post-tombstone). Contributions can be negative, so
          no zero-score filter: every doc matching ≥1 query term is a
          candidate, ranked by (score DESC, doc_id ASC).
        - ``bm25plus``: BM25+ (Lv & Zhai, CIKM 2011 — the
          lower-bounding fix for BM25's over-penalization of long
          docs): contribution ``idf · (tf_norm + δ)`` per matched
          DISTINCT query term with δ = ``delta`` (paper default 1.0);
          tf_norm is the checked k1/b kernel, idf=0 terms skipped,
          zero-score filter and tie order as in the BM25 path.
        - ``lmjm``: LM Jelinek-Mercer (Zhai & Lafferty 2004, the Lucene
          ``LMJelinekMercerSimilarity`` shape, λ = ``LMJM_LAMBDA``)::

            ln(1 + (1−λ)·(tf/dl) / (λ·ctf/T))     per matched term

          strictly positive for every match, so the zero-score filter
          is a no-op by construction; T and ctf as in ``lmd``.
        """
        if similarity == "bm25":
            return self.topk(query, k)
        if similarity not in ("tfidf", "lmd", "bm25plus", "lmjm"):
            raise ValueError(f"unknown similarity: {similarity!r}")
        total = self.avgdl * self.n_docs
        all_ids, all_contrib = [], []
        for tok in dict.fromkeys(self._qtokens(query)):
            p = self.lookup(tok)
            if p is None:
                continue
            ids, tfs, dls = p.decode_all()
            if len(ids) == 0:
                continue
            tfs = tfs.astype(np.float64)
            dls = dls.astype(np.float64)
            if similarity == "tfidf":
                w = idf(self.n_docs, p.df)
                if w == 0.0:
                    continue
                contrib = w * (1.0 + np.log(tfs))
            elif similarity == "bm25plus":
                w = idf(self.n_docs, p.df)
                if w == 0.0:
                    continue
                contrib = w * (
                    tf_norm(tfs, dls, self.avgdl, self.params) + delta
                )
            elif similarity == "lmjm":
                ctf = float(tfs.sum())
                lam = LMJM_LAMBDA
                contrib = np.log(
                    1.0 + (1.0 - lam) * (tfs / dls) / (lam * ctf / total)
                )
            else:  # lmd — expression shape mirrors the SQL oracle
                ctf = float(tfs.sum())
                contrib = np.log(1.0 + tfs * total / (mu * ctf)) + np.log(
                    mu / (dls + mu)
                )
            all_ids.append(ids)
            all_contrib.append(contrib)
        if not all_ids:
            return []
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, contrib)
        if similarity in ("tfidf", "bm25plus"):
            keep = scores > 0.0
            uniq, scores = uniq[keep], scores[keep]
        top_ids, top_sc = topk_order(uniq, scores, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_after(
        self,
        query: str,
        k: int = 10,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Stateless cursor pagination — the Elasticsearch
        ``search_after`` shape (no server-side scroll context: any page
        is recomputable from the previous page's last hit, so a
        paginating client never pins engine state; the reference's
        Express face returns one unpaged list,
        ``express-server/src/app/index.ts:175-203``).

        The page total order is (round6(score) DESC, doc_id ASC):
        rounding BEFORE ordering makes the cursor boundary exactly
        reproducible across the engine and the SQL oracle — a raw-float
        cursor would split 6-dp score ties differently than DuckDB's
        float sum order. ``after`` is the (rounded score, doc_id) of
        the previous page's last hit; results are strictly after it.
        Returned scores are the rounded ones."""
        from zensearch_ray.functions.rounding import round_half_away

        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        mask = scores > 0.0
        uniq, scores = uniq[mask], round_half_away(scores[mask], 6)
        if after is not None:
            cs, cd = float(after[0]), int(after[1])
            keep = (scores < cs) | ((scores == cs) & (uniq > cd))
            uniq, scores = uniq[keep], scores[keep]
        top_ids, top_sc = topk_order(uniq, scores, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_boosted(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Per-term query-time boosts — Lucene's ``term^weight`` query
        syntax (the reference weights all query terms equally,
        ``search-engine/internal/bm25/score.go:19-95``). Each
        whitespace part may carry a ``^w`` suffix; its BM25 contribution
        is multiplied by w. Unboosted parts default to 1.0, so a
        boost-free query is exactly ``topk``. Ranking and zero-score
        filtering otherwise identical to the checked BM25 path."""
        plan = []
        for part in query.split():
            boost = 1.0
            if "^" in part:
                part, _, suffix = part.rpartition("^")
                boost = float(suffix)
            for tok in self._qtokens(part):
                p = self.lookup(tok)
                if p is None:
                    continue
                w = idf(self.n_docs, p.df) * boost
                if w == 0.0:
                    continue
                plan.append((p, w))
        return self._score_plan(plan, k)

    def topk_msm(
        self, query: str, k: int = 10, min_should_match: int = 2
    ) -> list[tuple[int, float]]:
        """``minimum_should_match`` — the middle ground between the
        union default (``topk``, m=1) and the full conjunction
        (``topk_and``, m=n): only docs matching at least ``m`` DISTINCT
        query terms are candidates, scored by the standard BM25 sum
        over their matched terms. Match counting includes idf=0 terms
        (a term in every doc still *matches*, it just contributes no
        score) — mirroring the SQL oracle's count(term-matches) over
        the tf relation."""
        all_ids, all_contrib = [], []
        for tok in dict.fromkeys(self._qtokens(query)):
            p = self.lookup(tok)
            if p is None:
                continue
            ids, tfs, dls = p.decode_all()
            all_ids.append(ids)
            w = idf(self.n_docs, p.df)
            all_contrib.append(w * tf_norm(tfs, dls, self.avgdl, self.params))
        if not all_ids:
            return []
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        # per-term posting doc_ids are unique, so the multiplicity of a
        # doc across the concatenation IS its distinct-term match count
        uniq, inv, nmatch = np.unique(ids, return_inverse=True, return_counts=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, contrib)
        keep = (nmatch >= min_should_match) & (scores > 0.0)
        top_ids, top_sc = topk_order(uniq[keep], scores[keep], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_dismax(
        self, query: str, k: int = 10, tie: float = 0.3
    ) -> list[tuple[int, float]]:
        """Disjunction-max scoring — Lucene's ``DisjunctionMaxQuery``
        combiner: a doc's score is its BEST single-term contribution
        plus ``tie`` times the rest, ``max + tie * (sum - max)``
        (tie=0 → pure max, tie=1 → exactly the checked union sum).
        The classic fix for the union sum over-rewarding docs that
        match many weak terms over docs that match one strong term
        (the reference always sums, ``search-engine/internal/bm25/
        score.go:19-95``). Per-term contributions, zero-score filter
        and (score DESC, doc_id ASC) order are the checked BM25 ones."""
        all_ids, all_contrib = [], []
        for tok in dict.fromkeys(self._qtokens(query)):
            p = self.lookup(tok)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            ids, tfs, dls = p.decode_all()
            all_ids.append(ids)
            all_contrib.append(w * tf_norm(tfs, dls, self.avgdl, self.params))
        if not all_ids:
            return []
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, contrib)
        maxs = np.zeros(len(uniq), dtype=np.float64)  # contribs are > 0
        np.maximum.at(maxs, inv, contrib)
        scores = maxs + tie * (sums - maxs)
        keep = scores > 0.0
        top_ids, top_sc = topk_order(uniq[keep], scores[keep], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_fvf(
        self, query: str, col: str = "doc_len", k: int = 10
    ) -> list[tuple[int, float]]:
        """Function scoring — Elasticsearch's ``function_score`` with a
        ``field_value_factor`` (modifier ``log1p``, boost-mode
        ``multiply``): every matching doc's BM25 score is multiplied by
        ``ln(1 + docmeta[col])``, folding a static document signal
        (length, link count, freshness bucket — any numeric attr the
        build carried) into the rank without re-indexing. The reference
        ranks purely lexically (``search-engine/internal/bm25/
        score.go:19-95``); this is how real engines mix in document
        priors. Match set, zero-score filter and tie order are the
        checked BM25 ones; docs missing the attribute keep factor 0
        (ES's ``missing: 0``)."""
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        mask = scores > 0.0
        uniq, scores = uniq[mask], scores[mask]
        v = self._numeric_values(uniq, col)
        factor = np.log1p(np.where(np.isnan(v), 0.0, v))
        top_ids, top_sc = topk_order(uniq, scores * factor, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_boosting(
        self, query: str, negative: str, k: int = 10,
        negative_boost: float = 0.3,
    ) -> list[tuple[int, float]]:
        """Boosting query — Lucene's ``BoostingQuery`` / Elasticsearch's
        ``boosting`` clause: docs are ranked by the positive ``query``'s
        checked BM25 union sum, and any doc containing ANY term of
        ``negative`` keeps its candidacy but has its score multiplied
        by ``negative_boost`` (demotion, not exclusion — ``topk_not``
        is the exclusion form). The reference has no negative-relevance
        concept (terms only ever add,
        ``search-engine/internal/bm25/score.go:77-82``). Membership in
        the negative set comes from the negative terms' posting doc-id
        union alone — no corpus access, no scoring of the negative leg.
        Demotion applies BEFORE the zero-score filter and the
        (score DESC, doc_id ASC) order, mirroring the SQL oracle's
        CASE expression."""
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        neg_ids = []
        for tok in dict.fromkeys(self._qtokens(negative)):
            p = self.lookup(tok)
            if p is not None:
                neg_ids.append(p.decode_all()[0])
        if neg_ids:
            bad = np.unique(np.concatenate(neg_ids))
            if len(bad):
                j = np.searchsorted(bad, uniq)
                hit = (j < len(bad)) & (
                    bad[np.minimum(j, len(bad) - 1)] == uniq
                )
                scores = np.where(hit, scores * negative_boost, scores)
        mask = scores > 0.0
        top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_spanfirst(
        self, query: str, first_n: int, k: int = 10
    ) -> list[tuple[int, float]]:
        """Span-first filter — Lucene/ES ``span_first`` wrapping a
        ``span_or`` of the query terms: only docs where at least one
        query term FIRST occurs within the first ``first_n`` tokens
        (0-based offset < n ⇔ 1-based position <= n) are candidates;
        candidates are ranked by the full checked BM25 union over the
        query. Filter-then-rank semantics (the ``topk_filtered`` rule:
        idf/avgdl stay corpus-global, surviving scores equal the
        unfiltered ones). The filter reads ONLY the query terms'
        positional postings — the 'match in the title/lede counts'
        heuristic without a separate title field (the BM25F build is
        the field-aware form). Filter membership counts idf=0 terms (a
        stopword in the lede still places the doc); scoring skips them
        like every mode. Requires the positional index."""
        if not self.positional:
            raise ValueError(
                "index was built without positions "
                "(BuildConfig(positions=True) enables span-first queries)"
            )
        if first_n <= 0:
            return []
        qual_parts = []
        for tok in dict.fromkeys(self._qtokens(query)):
            p = self.lookup(tok)
            if p is None:
                continue
            ids = p.decode_all()[0]
            if len(ids) == 0:
                continue
            rep, flat = p.positions_pairs(ids)
            first = np.full(len(ids), np.iinfo(np.int64).max)
            np.minimum.at(first, rep, flat)
            qual_parts.append(ids[first < first_n])
        if not qual_parts:
            return []
        qual = np.unique(np.concatenate(qual_parts))
        plan = self._term_plan(query)
        if not plan or len(qual) == 0:
            return []
        uniq, scores = self._accumulate_plan(plan)
        j = np.searchsorted(qual, uniq)
        ok = (j < len(qual)) & (qual[np.minimum(j, len(qual) - 1)] == uniq)
        mask = ok & (scores > 0.0)
        top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_decay(
        self,
        query: str,
        col: str = "doc_len",
        kind: str = "gauss",
        origin: float = 0.0,
        scale: float = 10.0,
        offset: float = 0.0,
        decay: float = 0.5,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """Decay function scoring — Elasticsearch's ``function_score``
        decay family (``gauss`` / ``exp`` / ``linear``): every matching
        doc's BM25 score is multiplied by a distance-decay of its
        numeric attribute ``col`` from ``origin``. With
        ``d = max(0, |v - origin| - offset)``:

        - ``gauss``:  ``decay ** ((d / scale) ** 2)``
        - ``exp``:    ``decay ** (d / scale)``
        - ``linear``: ``max(0, 1 - d * (1 - decay) / scale)``

        so the multiplier is exactly ``decay`` at distance
        ``offset + scale``, 1.0 inside ``offset`` — the ES contract.
        This is the freshness/recency/locality prior real engines mix
        into lexical rank (``topk_fvf`` is the monotone-attribute
        sibling); the reference ranks purely lexically
        (``search-engine/internal/bm25/score.go:19-95``). Match set
        and zero-score filter are the checked BM25 ones; the product
        orders (score DESC, doc_id ASC). Docs missing the attribute
        keep multiplier 1.0 (ES skips decay functions on missing
        fields). ``linear`` can decay a score to exactly 0; such docs
        stay ranked (by doc_id) like ``topk_fvf``'s factor-0 docs."""
        if kind not in ("gauss", "exp", "linear"):
            raise ValueError(f"unknown decay kind: {kind!r}")
        if not (0.0 < decay < 1.0):
            raise ValueError("decay must be in (0, 1)")
        if scale <= 0.0:
            raise ValueError("scale must be positive")
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        mask = scores > 0.0
        uniq, scores = uniq[mask], scores[mask]
        v = self._numeric_values(uniq, col)
        d = np.maximum(np.abs(v - origin) - offset, 0.0)
        if kind == "gauss":
            mult = np.exp(np.log(decay) * (d / scale) ** 2)
        elif kind == "exp":
            mult = np.exp(np.log(decay) * (d / scale))
        else:  # linear
            mult = np.maximum(1.0 - d * (1.0 - decay) / scale, 0.0)
        mult = np.where(np.isnan(v), 1.0, mult)
        top_ids, top_sc = topk_order(uniq, scores * mult, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_random(
        self, query: str, seed: int = 0, k: int = 10
    ) -> list[tuple[int, float]]:
        """Seeded random scoring — ES ``function_score`` with
        ``random_score`` (boost_mode ``replace``): the match set is the
        checked BM25 one (score > 0), but ranking is a deterministic
        per-(seed, doc_id) uniform draw in (0, 1) — the standard way to
        serve a reproducible random sample of the matching docs (A/B
        slices, spot-check panels). The draw hashes like
        ``corpus.seeded_shuffle`` (md5 of ``"{seed}:{doc_id}"``, first
        12 hex digits / 16**12) so a SQL oracle can reproduce it
        bit-exactly. Order: (draw DESC, doc_id ASC)."""
        import hashlib

        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        uniq = uniq[scores > 0.0]
        if not len(uniq):
            return []
        draws = np.array(
            [
                int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:12], 16)
                / float(16 ** 12)
                for d in uniq.tolist()
            ],
            dtype=np.float64,
        )
        top_ids, top_sc = topk_order(uniq, draws, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_rescored(
        self,
        query: str,
        phrase: str,
        k: int = 10,
        window: int = 30,
        query_weight: float = 1.0,
        rescore_weight: float = 2.0,
    ) -> list[tuple[int, float]]:
        """Two-phase rescoring — Elasticsearch's ``rescore`` API shape:
        phase 1 ranks the corpus with the cheap exhaustive BM25 union
        over ``query``; phase 2 re-scores ONLY the top ``window`` docs
        with the expensive signal — the exact PHRASE query
        (``topk_phrase`` semantics: the phrase terms' conjunctive BM25
        sum where the positional index verifies adjacency, 0 otherwise)
        — and the window re-sorts by::

            final = query_weight * bm25 + rescore_weight * phrase_score

        Docs outside the window are never rescored (that is the point:
        the expensive query runs on ``window`` docs, not the corpus —
        at 10^12 docs the phrase machinery touches exactly ``window``
        candidate rows per query). Scores are rounded to 6 dp BEFORE
        windowing and combining so the window boundary and the combined
        order are exactly reproducible against the SQL oracle (the
        ``topk_after`` cursor lesson). Requires the positional index."""
        from zensearch_ray.functions.rounding import round_half_away

        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        mask = scores > 0.0
        uniq, scores = uniq[mask], round_half_away(scores[mask], 6)
        w_ids, w_sc = topk_order(uniq, scores, window)
        if len(w_ids) == 0:
            return []
        # phase 2: phrase score over WINDOW docs only — conjunctive
        # membership, positional adjacency verify, same contribution
        # kernels as topk_phrase (idf==0 terms constrain, add 0).
        toks = self._qtokens(phrase)
        cand = np.sort(w_ids)
        postings = []
        for tok in set(toks):
            p = self.lookup(tok)
            if p is None:
                cand = cand[:0]
                break
            postings.append(p)
        for p in sorted(postings, key=lambda p: p.df):
            if len(cand) == 0:
                break
            cand = cand[np.isin(cand, p.decode_all()[0], assume_unique=True)]
        phrase_sc = np.zeros(len(w_ids), dtype=np.float64)
        if len(cand) and toks:
            verified = self._verify_phrase(toks, cand)
            if verified:
                vdocs = np.sort(np.fromiter(verified, dtype=np.int64))
                sc = np.zeros(len(vdocs), dtype=np.float64)
                for p, w in self._term_plan(phrase):
                    ids, tfs, dls = p.decode_all()
                    pos = np.searchsorted(ids, vdocs)
                    sc += w * tf_norm(tfs[pos], dls[pos], self.avgdl, self.params)
                lut = {int(d): s for d, s in zip(vdocs, round_half_away(sc, 6))}
                phrase_sc = np.array(
                    [lut.get(int(d), 0.0) for d in w_ids], dtype=np.float64
                )
        final = round_half_away(
            query_weight * w_sc + rescore_weight * phrase_sc, 6
        )
        top_ids, top_sc = topk_order(w_ids, final, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def explain(self, query: str, k: int = 10,
                doc_id: int | None = None) -> list[dict]:
        """Per-term BM25 breakdown for the top-k docs (or one given
        doc) — the Lucene-Explanation analog of the reference's exposed
        per-webpage TfRating/IdfRating/Bm25rating fields
        (``search-engine/internal/types/types.go:3-13``, mutated in
        ``score.go:78-81``). Each result row::

            {doc_id, score, terms: [{term, df, idf, tf, dl,
                                     tf_norm, contribution}]}

        The contributions sum (up to float re-association) to the
        ranked score; asserted exactly in tests/test_explain.py.
        Cost: the same posting decodes ``topk`` already did (cached) +
        an O(log n) probe per (term, doc).
        """
        if doc_id is not None:
            targets = [(int(doc_id), None)]
        else:
            targets = [(d, s) for d, s in self.topk(query, k)]
        if not targets:
            return []
        # _term_plan semantics, but keeping the term string
        plan = []
        for tok in self._qtokens(query):
            p = self.lookup(tok)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((tok, p, w))
        out = []
        for d, score in targets:
            terms = []
            total = 0.0
            for tok, p, w in plan:
                ids, tfs, dls = p.decode_all()
                j = int(np.searchsorted(ids, d))
                if j >= len(ids) or ids[j] != d:
                    continue
                tn = float(
                    tf_norm(tfs[j : j + 1], dls[j : j + 1], self.avgdl, self.params)[0]
                )
                contrib = w * tn
                total += contrib
                terms.append(
                    {
                        "term": tok,
                        "df": int(p.df),
                        "idf": w,
                        "tf": int(tfs[j]),
                        "dl": int(dls[j]),
                        "tf_norm": tn,
                        "contribution": contrib,
                    }
                )
            out.append(
                {
                    "doc_id": int(d),
                    "score": float(score) if score is not None else total,
                    "terms": terms,
                }
            )
        return out

    # -- facets (docmeta attribute columns, BuildConfig.attrs) -------------
    def _facet(self, col: str):
        """doc_id → attribute lookup: (sorted doc_ids, int32 codes,
        value list), built from docmeta's (doc_id, col) columns and
        cached per engine. Metadata-scale (the postings never load);
        works for ANY id space via sorted-array membership — with dense
        ids a doc_id-indexed code array (1-4 B/doc, exactly like the
        build's dl broadcast) is the drop-in upgrade when the sort ever
        shows up in a profile."""
        cache = getattr(self, "_facet_cache", None)
        if cache is None:
            cache = self._facet_cache = {}
        if col not in cache:
            meta = pq.ParquetDataset(self.layout.docmeta_dir).read(
                columns=["doc_id", col]
            )
            ids = meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            dic = meta[col].combine_chunks().dictionary_encode()
            codes = np.asarray(dic.indices, dtype=np.int32)
            values = dic.dictionary.to_pylist()
            order = np.argsort(ids, kind="stable")
            cache[col] = (ids[order], codes[order], values)
        return cache[col]

    def _facet_member_mask(self, uniq: np.ndarray, col: str, value) -> np.ndarray:
        """Boolean mask over ``uniq`` doc_ids: attribute == value."""
        fids, codes, values = self._facet(col)
        try:
            code = values.index(value)
        except ValueError:
            return np.zeros(len(uniq), dtype=bool)
        j = np.searchsorted(fids, uniq)
        ok = (j < len(fids)) & (fids[np.minimum(j, len(fids) - 1)] == uniq)
        return ok & (codes[np.minimum(j, len(fids) - 1)] == code)

    def topk_filtered(
        self, query: str, col: str, value, k: int = 10
    ) -> list[tuple[int, float]]:
        """Filtered (faceted) search: ``topk`` restricted to documents
        whose docmeta attribute ``col`` equals ``value`` — the Lucene
        filter-query semantic (the filter narrows RESULTS; idf/avgdl
        stay corpus-global, so a doc's score is identical with or
        without the filter). Exhaustive evaluation: correct filtered
        MaxScore pruning needs per-facet upper bounds, a build-time
        artifact this index doesn't carry."""
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        mask = (scores > 0.0) & self._facet_member_mask(uniq, col, value)
        top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def facet_counts(self, query: str, col: str) -> list[tuple[str, int]]:
        """Facet counts: how many documents MATCH the query (exhaustive
        OR semantics, score > 0) per value of attribute ``col`` —
        the result-page facet sidebar. Returns (value, n_docs) sorted
        by (n_docs DESC, value ASC); zero-count values are omitted."""
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        matched = uniq[scores > 0.0]
        fids, codes, values = self._facet(col)
        j = np.searchsorted(fids, matched)
        ok = (j < len(fids)) & (fids[np.minimum(j, len(fids) - 1)] == matched)
        counts = np.bincount(
            codes[np.minimum(j, len(fids) - 1)][ok], minlength=len(values)
        )
        out = [(values[i], int(c)) for i, c in enumerate(counts) if c > 0]
        out.sort(key=lambda vc: (-vc[1], vc[0]))
        return out

    def topk_synonyms(
        self, query: str, synonyms: dict[str, list[str]], k: int = 10
    ) -> list[tuple[int, float]]:
        """Query-time synonym expansion (Lucene query-side
        SynonymFilter): every query token contributes itself plus its
        synonym list, and the DISTINCT expanded terms score as one
        OR-query — identical semantics to the prefix/wildcard/fuzzy
        expansions, so the SQL oracle is the BM25 body over the
        expanded term set. Synonym entries are normalized by the pinned
        tokenizer (a multi-word synonym contributes each of its
        tokens)."""
        expanded: set[str] = set()
        for t in tokenize(query):
            expanded.add(t)
            for s in synonyms.get(t, ()):
                expanded.update(tokenize(s))
        plan = []
        for t in sorted(expanded):
            p = self.lookup(t)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        return self._score_plan(plan, k)

    def _numeric_attr(self, col: str):
        """doc_id → numeric docmeta column (sorted ids, float64 values),
        cached per engine — the numeric sibling of ``_facet`` (e.g.
        ``doc_len``, or any numeric attr carried via BuildConfig.attrs).
        Metadata-scale; postings never load."""
        cache = getattr(self, "_numeric_cache", None)
        if cache is None:
            cache = self._numeric_cache = {}
        if col not in cache:
            meta = pq.ParquetDataset(self.layout.docmeta_dir).read(
                columns=["doc_id", col]
            )
            ids = meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            vals = meta[col].to_numpy(zero_copy_only=False).astype(np.float64)
            order = np.argsort(ids, kind="stable")
            cache[col] = (ids[order], vals[order])
        return cache[col]

    def _numeric_values(self, uniq: np.ndarray, col: str) -> np.ndarray:
        """Numeric attribute per ``uniq`` doc_id (NaN where missing)."""
        fids, vals = self._numeric_attr(col)
        j = np.searchsorted(fids, uniq)
        jc = np.minimum(j, len(fids) - 1)
        ok = (j < len(fids)) & (fids[jc] == uniq)
        return np.where(ok, vals[jc], np.nan)

    def topk_range(
        self, query: str, col: str, lo: float, hi: float, k: int = 10
    ) -> list[tuple[int, float]]:
        """Numeric range-filtered search: ``topk`` restricted to docs
        with ``lo <= docmeta[col] <= hi`` — the range-query sibling of
        ``topk_filtered`` (same Lucene filter semantics: results narrow,
        scores untouched). Exhaustive evaluation, same as every
        filtered mode (pruning bounds are range-blind)."""
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        v = self._numeric_values(uniq, col)
        mask = (scores > 0.0) & (v >= lo) & (v <= hi)
        top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def match_stats(self, query: str, col: str) -> dict:
        """Metric aggregation over the MATCHED set (exhaustive OR,
        score > 0): count / sum / avg / min / max of a numeric docmeta
        column — the ES metric-aggregation analog of ``facet_counts``.
        Returns zeros/None dict for an empty match set."""
        plan = self._term_plan(query)
        empty = {"n_docs": 0, "sum": None, "avg": None, "min": None, "max": None}
        if not plan:
            return empty
        uniq, scores = self._accumulate_plan(plan)
        matched = uniq[scores > 0.0]
        if not len(matched):
            return empty
        v = self._numeric_values(matched, col)
        v = v[~np.isnan(v)]
        if not len(v):
            return empty
        return {
            "n_docs": int(len(v)),
            "sum": float(v.sum()),
            "avg": float(v.mean()),
            "min": float(v.min()),
            "max": float(v.max()),
        }

    def match_histogram(
        self, query: str, col: str, interval: float
    ) -> list[tuple[float, int]]:
        """ES ``histogram`` aggregation over the MATCHED set (exhaustive
        OR, score > 0): fixed-``interval`` buckets of a numeric docmeta
        column, key = floor(value/interval)·interval (the ES bucket-key
        rule), empty buckets omitted, sorted by key. Returns
        [(bucket_key, doc_count)]. Metadata-only after matching: like
        ``match_stats``, the corpus is never read — one docmeta sidecar
        probe per query."""
        if interval <= 0:
            raise ValueError("interval must be > 0")
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        matched = uniq[scores > 0.0]
        if not len(matched):
            return []
        v = self._numeric_values(matched, col)
        v = v[~np.isnan(v)]
        if not len(v):
            return []
        keys = np.floor(v / interval) * interval
        uk, counts = np.unique(keys, return_counts=True)
        return [(float(k), int(c)) for k, c in zip(uk, counts)]

    def match_cardinality(self, query: str, col: str) -> int:
        """ES ``cardinality`` aggregation over the matched set: number
        of DISTINCT values of docmeta attribute ``col`` among docs
        matching the query (exhaustive OR, score > 0) — exact, via the
        same facet sidecar as ``facet_counts``."""
        return len(self.facet_counts(query, col))

    def topk_collapsed(
        self, query: str, col: str, per: int = 1, k: int = 10
    ) -> list[tuple[int, float]]:
        """Field collapsing (the SERP host-collapse / Lucene collapse
        semantic): exhaustive ranking, then at most ``per`` results per
        value of docmeta attribute ``col`` survive into the top-k —
        greedy in rank order, i.e. a document is kept iff fewer than
        ``per`` same-group documents rank above it (score DESC, doc_id
        ASC). Scores are untouched (idf/avgdl corpus-global); only the
        selection collapses. Docs missing the attribute (none, in a
        complete docmeta) would collapse as one shared group."""
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        m = scores > 0.0
        ids, sc = uniq[m], scores[m]
        if not len(ids):
            return []
        order = np.lexsort((ids, -sc))
        ids, sc = ids[order], sc[order]
        fids, codes, values = self._facet(col)
        j = np.searchsorted(fids, ids)
        jc = np.minimum(j, len(fids) - 1)
        ok = (j < len(fids)) & (fids[jc] == ids)
        gcodes = np.where(ok, codes[jc], -1).astype(np.int64)
        # occurrence number of each doc within its group, in rank order
        pos = np.arange(len(gcodes))
        by_group = np.lexsort((pos, gcodes))
        sorted_g = gcodes[by_group]
        new_group = np.empty(len(sorted_g), dtype=bool)
        if len(sorted_g):
            new_group[0] = True
            new_group[1:] = sorted_g[1:] != sorted_g[:-1]
        starts = np.flatnonzero(new_group)
        lens = np.diff(np.r_[starts, len(sorted_g)])
        occ_sorted = pos[: len(sorted_g)] - np.repeat(starts, lens)
        occ = np.empty(len(gcodes), dtype=np.int64)
        occ[by_group] = occ_sorted
        keep = occ < per
        return list(zip(ids[keep][:k].tolist(), sc[keep][:k].tolist()))

    def topk_per_facet(
        self, query: str, col: str, per: int = 3
    ) -> list[tuple[str, int, int, float]]:
        """Per-group ranking: the top ``per`` results WITHIN every
        value of docmeta attribute ``col`` (the "results per tab" SERP
        shape — the complement of ``topk_collapsed``, which caps groups
        within ONE global list). Scores stay corpus-global. Returns
        (value, rank_in_group, doc_id, score) ordered by
        (value ASC, rank ASC); groups with no match are absent."""
        plan = self._term_plan(query)
        if not plan:
            return []
        uniq, scores = self._accumulate_plan(plan)
        m = scores > 0.0
        ids, sc = uniq[m], scores[m]
        if not len(ids):
            return []
        order = np.lexsort((ids, -sc))
        ids, sc = ids[order], sc[order]
        fids, codes, values = self._facet(col)
        j = np.searchsorted(fids, ids)
        jc = np.minimum(j, len(fids) - 1)
        ok = (j < len(fids)) & (fids[jc] == ids)
        gcodes = np.where(ok, codes[jc], -1).astype(np.int64)
        pos = np.arange(len(gcodes))
        by_group = np.lexsort((pos, gcodes))
        sorted_g = gcodes[by_group]
        new_group = np.empty(len(sorted_g), dtype=bool)
        new_group[0] = True
        new_group[1:] = sorted_g[1:] != sorted_g[:-1]
        starts = np.flatnonzero(new_group)
        lens = np.diff(np.r_[starts, len(sorted_g)])
        occ = np.empty(len(gcodes), dtype=np.int64)
        occ[by_group] = np.arange(len(sorted_g)) - np.repeat(starts, lens)
        keep = (occ < per) & (gcodes >= 0)
        rows = [
            (values[gcodes[i]], int(occ[i]) + 1, int(ids[i]), float(sc[i]))
            for i in np.flatnonzero(keep)
        ]
        rows.sort(key=lambda r: (r[0], r[1]))
        return rows

    def expand_prefix(self, prefix: str) -> list[str]:
        """All index terms starting with ``prefix`` (normalized), sorted.
        Reads the per-segment term-dictionary sidecars (sorted unique
        terms, written at commit — ``IndexLayout._write_termdict``) with
        a parquet range filter (term >= prefix AND term < next-prefix):
        metadata-only, the posting segments are never opened. Falls
        back to the segment's own (equally sorted) term column for
        pre-sidecar indexes."""
        from zensearch_ray.functions.text import normalize

        prefix = normalize(prefix)
        if not prefix:
            return []
        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
        terms: set[str] = set()
        for path in self._term_dict_files():
            t = pq.read_table(
                path,
                columns=["term"],
                filters=[("term", ">=", prefix), ("term", "<", hi)],
            )
            terms.update(t["term"].to_pylist())
        return sorted(terms)

    # resident (term, df) arrays are cached only while the dictionary
    # provably fits this many terms (sidecar METADATA row-count upper
    # bound — no read); beyond it autocomplete switches to per-query
    # pruned window reads so replica memory never scales with vocab
    _VOCAB_CACHE_MAX_TERMS = 2_000_000

    def _vocab_upper_bound(self) -> int:
        """Upper bound on |vocab| from sidecar parquet metadata (sum of
        per-file row counts; duplicates across shards/generations only
        raise the bound — the cache decision errs toward windowing)."""
        b = getattr(self, "_vocab_bound", None)
        if b is None:
            b = 0
            for path in self._term_dict_files():
                b += pq.ParquetFile(path).metadata.num_rows
            self._vocab_bound = b
        return b

    def _df_window(self, lo: str, hi: str):
        """(terms, summed dfs) for the dictionary window [lo, hi) via
        pruned (term, df) segment reads — the unbounded-vocab serving
        path for autocomplete."""
        import pandas as _pd

        frames = []
        for shard in range(self.num_shards):
            for path in self._part_files(shard):
                frames.append(
                    pq.read_table(
                        path, columns=["term", "df"],
                        filters=[("term", ">=", lo), ("term", "<", hi)],
                    ).to_pandas()
                )
        frames = [f for f in frames if len(f)]
        if not frames:
            return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
        g = _pd.concat(frames).groupby("term", sort=True)["df"].sum()
        return g.index.to_numpy(dtype=object), g.to_numpy(np.int64)

    def _term_df_arrays(self):
        """(sorted unique term array, aligned summed df int64) — the
        autocomplete serving structure, built ONCE per engine from a
        (term, df)-columns-only scan of the posting segments (payload
        bytes never read; salted sub-partitions and append generations
        sum their partial dfs exactly as ``lookup`` merges them). Same
        vocab-scale per-engine memory class as ``_all_terms`` and the
        facet cache; warm completions are then a binary-searched slice
        + one lexsort — microseconds, not file opens."""
        if self._vocab_df is None:
            import pandas as _pd

            frames = []
            for shard in range(self.num_shards):
                for path in self._part_files(shard):
                    frames.append(
                        pq.read_table(path, columns=["term", "df"]).to_pandas()
                    )
            if frames:
                s = _pd.concat(frames).groupby("term", sort=True)["df"].sum()
                self._vocab_df = (
                    s.index.to_numpy(dtype=object),
                    s.to_numpy(np.int64),
                )
            else:
                self._vocab_df = (
                    np.empty(0, dtype=object),
                    np.empty(0, dtype=np.int64),
                )
        return self._vocab_df

    def autocomplete(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Search-box completion: dictionary terms starting with
        ``prefix`` ranked by (df DESC, term ASC), top-k — the query
        suggestion dropdown of the reference's search page. Served from
        the per-engine ``_term_df_arrays`` cache (one pruned segment
        scan on first use, binary-searched slices after — a warm
        replica answers in microseconds). df is the STORED count
        (tombstones included until compaction — the same stats-at-merge
        contract every scoring path uses)."""
        from zensearch_ray.functions.text import normalize

        prefix = normalize(prefix)
        if not prefix:
            return []
        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
        if (self._vocab_df is not None
                or self._vocab_upper_bound() <= self._VOCAB_CACHE_MAX_TERMS):
            terms, dfs = self._term_df_arrays()
            lo_i = int(np.searchsorted(terms, prefix, "left"))
            hi_i = int(np.searchsorted(terms, hi, "left"))
            if lo_i >= hi_i:
                return []
            sub_t, sub_d = terms[lo_i:hi_i], dfs[lo_i:hi_i]
        else:  # vocab-scale dictionary: pruned per-query window read
            sub_t, sub_d = self._df_window(prefix, hi)
            if not len(sub_t):
                return []
        order = np.lexsort((sub_t.astype(str), -sub_d))[:k]
        return [(str(sub_t[i]), int(sub_d[i])) for i in order]

    def topk_prefix(self, prefix: str, k: int = 10) -> list[tuple[int, float]]:
        """Prefix (wildcard) search ``prefix*``: expand against the term
        dictionary, then score the expansion as an OR-query — each
        matched term contributes idf·tf_norm once, exactly as if the
        expansion were the query. Deterministic and oracle-checkable
        (SQL: qterms = DISTINCT terms LIKE 'prefix%')."""
        plan = []
        for t in self.expand_prefix(prefix):
            p = self.lookup(t)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        return self._score_plan(plan, k)

    def expand_wildcard(self, pattern: str, max_terms: int = 1000) -> list[str]:
        """Dictionary terms matching a glob ``pattern`` ('*' = any run,
        anywhere: ``pre*``, ``*suf``, ``mi*le``, ``*mid*``), sorted.
        Literal segments are normalized by the pinned normalizer and
        must be pure token characters. A leading literal narrows the
        scan via the sorted-vocab bisect (same dictionary-scale cost
        class as ``expand_prefix``); a leading '*' scans the vocab —
        at cluster scale the reversed-term dictionary sidecar is the
        metadata-only upgrade, exactly as for fuzzy. Raises if the
        expansion exceeds ``max_terms`` (query-cost guard) so an
        over-broad pattern fails loudly instead of scoring half the
        dictionary."""
        import re as _re
        from bisect import bisect_left

        from zensearch_ray.functions.text import _TOKEN_RE, normalize

        segs = [normalize(s) for s in pattern.split("*")]
        for s in segs:
            if s and _TOKEN_RE.fullmatch(s) is None:
                raise ValueError(f"wildcard segment {s!r} is not token text")
        if len(segs) == 1:  # no '*': exact-term degenerate case
            return [segs[0]] if segs[0] else []
        if segs[-1] == "" and len(segs) == 2 and segs[0]:
            out = self.expand_prefix(segs[0])  # pure prefix: pushdown path
        else:
            rx = _re.compile(".*".join(_re.escape(s) for s in segs) + r"\Z")
            out = None
            seed = max((s for s in segs if s), key=len, default="")
            if not segs[0] and len(seed) >= 3:
                # leading '*' has no prefix window — the trigram
                # sidecar turns the vocab scan into a candidate-list
                # read (see expand_infix); an over-broad seed falls
                # back to the scan instead of failing the query
                try:
                    cands = self.expand_infix(seed, max_terms=max_terms * 10)
                except ValueError:
                    cands = None
                if cands is not None:
                    out = [t for t in cands if rx.match(t)]
            if out is None:
                if segs[0]:  # sorted sidecar → pruned literal-prefix window
                    stop = segs[0][:-1] + chr(ord(segs[0][-1]) + 1)
                    out = [t for t in self._vocab_window(segs[0], stop)
                           if rx.match(t)]
                else:  # no window: stream the dictionary, hold matches only
                    seen: set[str] = set()
                    for chunk in self._vocab_chunks():
                        seen.update(t for t in chunk if rx.match(t))
                    out = sorted(seen)
        if len(out) > max_terms:
            raise ValueError(
                f"wildcard {pattern!r} expands to {len(out)} terms (> {max_terms})"
            )
        return out

    def topk_wildcard(self, pattern: str, k: int = 10) -> list[tuple[int, float]]:
        """Wildcard search: glob expansion against the term dictionary
        (``expand_wildcard``), scored as an OR-query exactly like
        ``topk_prefix`` — the suffix/infix generalization of the prefix
        mode (SQL oracle: qterms = DISTINCT terms LIKE with '*'→'%')."""
        plan = []
        for t in self.expand_wildcard(pattern):
            p = self.lookup(t)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        return self._score_plan(plan, k)

    def expand_regex(self, pattern: str, max_terms: int = 1000) -> list[str]:
        """Dictionary terms FULLY matching a regular expression — the
        general form of glob expansion (Lucene RegexpQuery analog; the
        reference has no term dictionary at all, so every term-shape
        query there is a full corpus re-scan). Matching runs against
        the NORMALIZED vocabulary (the pinned tokenizer alphabet), so
        write patterns in lowercase token characters. A literal prefix
        of the pattern (chars before the first regex metacharacter)
        narrows the scan to a sorted-vocab bisect window, exactly like
        ``expand_wildcard``; a pattern with no literal prefix scans the
        dictionary (vocab-scale, metadata-only — posting segments are
        never opened). Raises when the expansion exceeds ``max_terms``
        (query-cost guard) or the pattern does not compile."""
        import re as _re
        from bisect import bisect_left

        rx = _re.compile(pattern)  # propagate re.error to the caller
        _META = set(".^$*+?{}[]\\|()")
        lit = []
        for ch in pattern:
            if ch in _META:
                break
            lit.append(ch)
        prefix = "".join(lit)
        if prefix:
            stop = prefix[:-1] + chr(ord(prefix[-1]) + 1)
            out = [t for t in self._vocab_window(prefix, stop)
                   if rx.fullmatch(t)]
        else:  # no literal prefix: stream the dictionary, hold matches
            seen: set[str] = set()
            for chunk in self._vocab_chunks():
                seen.update(t for t in chunk if rx.fullmatch(t))
            out = sorted(seen)
        if len(out) > max_terms:
            raise ValueError(
                f"regex {pattern!r} expands to {len(out)} terms (> {max_terms})"
            )
        return out

    def topk_regex(self, pattern: str, k: int = 10) -> list[tuple[int, float]]:
        """Regex search: dictionary expansion (``expand_regex``) scored
        as an OR-query exactly like ``topk_wildcard`` (SQL oracle:
        qterms = DISTINCT terms matching regexp_full_match)."""
        plan = []
        for t in self.expand_regex(pattern):
            p = self.lookup(t)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        return self._score_plan(plan, k)

    def _vocab_window(self, lo: str, hi: str | None) -> list[str]:
        """Sorted unique dictionary terms in [lo, hi) via PRUNED
        sidecar range reads (parquet predicate + sorted-term row-group
        stats) — the at-scale replacement for bisecting a resident
        ``_all_terms`` copy: memory is the window, not the vocabulary."""
        filters = [("term", ">=", lo)]
        if hi is not None:
            filters.append(("term", "<", hi))
        terms: set[str] = set()
        for path in self._term_dict_files():
            terms.update(
                pq.read_table(path, columns=["term"], filters=filters)[
                    "term"
                ].to_pylist()
            )
        return sorted(terms)

    def _vocab_chunks(self):
        """Per-sidecar-file sorted term chunks — the STREAMING form of
        ``_all_terms`` for matchers with no prefix window (substring
        fallback, regex without a literal prefix, edit-1 fuzzy):
        resident memory is one sidecar file, never the vocabulary.
        Files may repeat terms across shards/generations; callers
        dedup their MATCHES (sliver-sized), not the stream."""
        for path in self._term_dict_files():
            yield pq.read_table(path, columns=["term"])["term"].to_pylist()

    def _all_terms(self) -> list[str]:
        """The full term dictionary (sorted, deduped across partitions/
        generations), cached per engine. Vocab-scale: reads the
        term-dictionary sidecars (metadata-only; posting segments never
        opened), falling back to a segment's own term column when the
        sidecar is missing (pre-sidecar indexes). A deletion-
        neighborhood sidecar (SymSpell-style, built once at index time)
        is the further upgrade path if vocab-scan latency ever
        matters for fuzzy expansion."""
        if self._vocab is None:
            terms: set[str] = set()
            for path in self._term_dict_files():
                terms.update(
                    pq.read_table(path, columns=["term"])["term"].to_pylist()
                )
            self._vocab = sorted(terms)
        return self._vocab

    def _symspell(self):
        """In-memory SymSpell deletion-neighborhood index over the FULL
        term dictionary — the pre-sidecar FALLBACK only: indexes built
        since the ``symspell`` sidecar exist serve distance-2 fuzzy via
        predicate-pushdown bucket reads (``expand_fuzzy``) and never
        call this (or ``_all_terms``). Memory here is vocab-scale ×
        the ≤(1+L+L²/2) delete-neighborhood factor, which is exactly
        why the sidecar exists."""
        ss = getattr(self, "_symspell_idx", None)
        if ss is None:
            from zensearch_ray.functions.fuzzy import SymSpellIndex

            self._symspell_idx = ss = SymSpellIndex(
                self._all_terms(), max_dist=2
            )
        return ss

    def expand_fuzzy(self, query: str, max_dist: int = 1) -> list[str]:
        """Dictionary terms within byte-Levenshtein distance
        ``max_dist`` (1 or 2) of ANY normalized query token — the
        typo-tolerant analog of ``expand_prefix``. Byte semantics match
        DuckDB/PostgreSQL ``levenshtein`` (multi-byte chars count per
        byte), keeping the engine oracle-checkable. Distance 1 screens
        the vocab with the vectorized lcp/lcs mask; distance 2 probes
        the persisted SymSpell sidecar (``IndexLayout.symspell_dir``)
        with a ``dkey IN (query's own delete keys)`` parquet filter —
        soundness: lev(a,b) ≤ 2 ⇒ the two delete neighborhoods
        intersect, so the probed buckets are a candidate SUPERSET —
        then DP-verifies only the bucket candidates. Neither path ever
        scans or materializes the vocabulary; pre-sidecar indexes fall
        back to the in-memory ``_symspell()`` build."""
        from zensearch_ray.functions.fuzzy import (
            deletes_upto,
            edit2_verify,
            expand_edit1,
            expand_edit2,
        )

        if max_dist not in (1, 2):
            raise ValueError("only max_dist in (1, 2) is supported")
        toks = tokenize(query)
        if not toks:
            return []
        if max_dist == 2:
            files = self._symspell_files()
            if files is None:  # pre-sidecar index
                return expand_edit2(self._symspell(), toks)
            qkeys: set[bytes] = set()
            for tok in dict.fromkeys(toks):
                qkeys |= deletes_upto(tok.encode("utf-8"), 2)
            key_list = sorted(qkeys)
            # ONE threaded dataset read across all segment sidecars
            # (per-file sequential opens cost ~1 ms each — at 256
            # partitions that dominated the probe); row-group stats on
            # the sorted dkey column prune the scan to the probed
            # buckets
            t = pq.ParquetDataset(
                files, filters=[("dkey", "in", key_list)]
            ).read(columns=["term"], use_threads=True)
            cand = set(t["term"].to_pylist())
            return edit2_verify(sorted(cand), toks)
        matches: set[str] = set()
        for chunk in self._vocab_chunks():
            matches.update(expand_edit1(chunk, toks))
        return sorted(matches)

    def topk_fuzzy(
        self, query: str, k: int = 10, max_dist: int = 1
    ) -> list[tuple[int, float]]:
        """Fuzzy (typo-tolerant) top-k: expand every query term against
        the term dictionary at edit distance ≤ ``max_dist`` (1 or 2),
        then score the expansion as an OR-query — each matched term
        contributes its own idf·tf_norm once, exactly as if the
        expansion were the query (same contract as ``topk_prefix``)."""
        plan = []
        for t in self.expand_fuzzy(query, max_dist=max_dist):
            p = self.lookup(t)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            plan.append((p, w))
        return self._score_plan(plan, k)

    def topk_not(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Boolean exclusion: whitespace tokens prefixed with ``-``
        exclude every document containing that term; the remaining
        tokens score exactly like ``topk``. ``"spark window -merge"``
        = topk("spark window") minus docs containing "merge". Exclusion
        reads only the excluded terms' postings (doc-id union) — the
        anti-membership analog of the OR plan."""
        raw = query.split()
        pos_q = " ".join(t for t in raw if not t.startswith("-"))
        neg_q = " ".join(t[1:] for t in raw if t.startswith("-") and len(t) > 1)
        plan = self._term_plan(pos_q)
        if not plan:
            return []
        excl_ids: list[np.ndarray] = []
        for tok in set(self._qtokens(neg_q)):
            p = self.lookup(tok)
            if p is not None:
                excl_ids.append(p.decode_all()[0])
        excl = (
            np.unique(np.concatenate(excl_ids))
            if excl_ids
            else np.empty(0, dtype=np.int64)
        )
        all_ids, all_contrib = [], []
        for p, w in plan:
            ids, tfs, dls = p.decode_all()
            all_ids.append(ids)
            all_contrib.append(w * tf_norm(tfs, dls, self.avgdl, self.params))
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, contrib)
        mask = scores > 0.0
        if len(excl):
            mask &= ~np.isin(uniq, excl, assume_unique=True)
        top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def suggest(self, query: str) -> list[tuple[str, str, int]]:
        """"Did you mean": for each DISTINCT query token (sorted), the
        dictionary term within byte-Levenshtein distance 1 with the
        highest df — an exactly-spelled token suggests itself (distance
        0 beats any df), ties break df DESC then term ASC; tokens with
        no neighbor are dropped. Returns (token, suggestion, df)."""
        from zensearch_ray.functions.fuzzy import edit1_mask

        toks = sorted(set(tokenize(query)))
        cands_of: dict[str, set[str]] = {t: set() for t in toks}
        # stream the dictionary once; per-token candidate sets are
        # edit-1 neighborhoods (sliver-sized), never the vocabulary
        for chunk in self._vocab_chunks():
            for tok in toks:
                hits = np.nonzero(edit1_mask(chunk, tok))[0]
                cands_of[tok].update(chunk[i] for i in hits)
        out: list[tuple[str, str, int]] = []
        for tok in toks:
            cands = cands_of[tok]
            if not cands:
                continue
            best = min(cands, key=lambda t: (t != tok, -self.df(t), t))
            out.append((tok, best, self.df(best)))
        return out

    def _universe(self) -> np.ndarray:
        """Sorted ids of every LIVE doc (docmeta minus tombstones) —
        the complement base for boolean NOT. Metadata-scale, cached
        per engine (same footprint class as the facet cache)."""
        u = getattr(self, "_universe_ids", None)
        if u is None:
            meta = pq.ParquetDataset(self.layout.docmeta_dir).read(
                columns=["doc_id"]
            )
            ids = np.unique(
                meta["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            if self.deleted is not None and len(self.deleted):
                ids = ids[~np.isin(ids, self.deleted, assume_unique=True)]
            self._universe_ids = u = ids
        return u

    def topk_bool(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Full boolean retrieval: AND / OR / NOT with parentheses
        (UPPERCASE keywords; ``-term`` = NOT; adjacency = implicit AND
        — grammar in ``functions/boolquery.py``). Lucene semantics:
        the expression is a FILTER (membership via posting doc-id set
        algebra; NOT complements against live docmeta ids), ranking is
        the BM25 sum over the DISTINCT terms occurring outside any NOT
        — negated clauses never score, and zero-score members (e.g.
        matched through a pure NOT branch) stay in the result, ordered
        (score DESC, doc_id ASC)."""
        from zensearch_ray.functions.boolquery import parse_bool, scoring_terms

        ast = parse_bool(query)

        def ids_of(tok: str) -> np.ndarray:
            p = self.lookup(tok)
            return (
                p.decode_all()[0] if p is not None else np.empty(0, dtype=np.int64)
            )

        def ev(node) -> np.ndarray:  # sorted unique doc_ids
            kind = node[0]
            if kind == "term":
                return ids_of(node[1])
            if kind == "and":
                parts = sorted((ev(c) for c in node[1]), key=len)
                cand = parts[0]
                for ids in parts[1:]:
                    if not len(cand):
                        break
                    cand = cand[np.isin(cand, ids, assume_unique=True)]
                return cand
            if kind == "or":
                return np.unique(np.concatenate([ev(c) for c in node[1]]))
            return np.setdiff1d(self._universe(), ev(node[1]), assume_unique=True)

        cand = ev(ast)
        if not len(cand):
            return []
        scores = np.zeros(len(cand), dtype=np.float64)
        for tok in scoring_terms(ast):
            p = self.lookup(tok)
            if p is None:
                continue
            w = idf(self.n_docs, p.df)
            if w == 0.0:
                continue
            ids, tfs, dls = p.decode_all()
            m = np.isin(ids, cand, assume_unique=True)
            if not m.any():
                continue
            pos = np.searchsorted(cand, ids[m])
            scores[pos] += w * tf_norm(tfs[m], dls[m], self.avgdl, self.params)
        top_ids, top_sc = topk_order(cand, scores, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_and(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Conjunctive (AND) top-k: only documents containing EVERY
        distinct query term are scored — the posting-list intersection
        the north_star names. Intersection runs ascending-df first
        (smallest list seeds the candidate set, each further list can
        only shrink it); scores are the same BM25 sum as ``topk``, so
        the result is ``topk`` restricted to the intersection."""
        plan = self._term_plan(query)
        toks = set(self._qtokens(query))
        # a distinct query term with no postings → empty intersection.
        # (idf==0 terms still constrain membership but add 0 score.)
        seen_terms = set()
        entries: dict[int, list] = {}
        for tok in toks:
            p = self.lookup(tok)
            if p is None:
                return []
            seen_terms.add(tok)
            entries[id(p)] = p
        postings = sorted(entries.values(), key=lambda p: p.df)
        cand = postings[0].decode_all()[0]
        for p in postings[1:]:
            if len(cand) == 0:
                return []
            ids = p.decode_all()[0]
            cand = cand[np.isin(cand, ids, assume_unique=True)]
        if len(cand) == 0:
            return []
        scores = np.zeros(len(cand), dtype=np.float64)
        for p, w in plan:  # plan keeps query-token multiplicity
            ids, tfs, dls = p.decode_all()
            pos = np.searchsorted(ids, cand)
            scores += w * tf_norm(tfs[pos], dls[pos], self.avgdl, self.params)
        top_ids, top_sc = topk_order(cand, scores, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_phrase(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact-phrase top-k from the POSITIONAL index alone — no
        corpus access. Candidates are the conjunctive intersection
        (``topk_and`` semantics and scores); each candidate is verified
        by positional adjacency: token ``i`` of the phrase must occur
        at ``start + i`` for some start. Results are ``topk_and``
        restricted to verified docs — identical ranking to the
        text-scan phrase path (``pipelines/corpus.phrase_topk``), which
        at scale re-reads the corpus where this reads only the phrase
        terms' postings + positions.
        """
        if not self.positional:
            raise ValueError(
                "index was built without positions "
                "(BuildConfig(positions=True) enables phrase queries)"
            )
        toks = self._qtokens(phrase)
        if not toks:
            return []
        hits = self.topk_and(phrase, k=1 << 62)  # ALL intersection docs
        if not hits:
            return []
        return _chunked_verify(
            hits, k, lambda cand: self._verify_phrase(toks, cand)
        )

    def _verify_phrase(self, toks: list[str], cand: np.ndarray) -> set:
        """Positional adjacency over the candidate docs as a key
        intersection, fully vectorized over every (candidate,
        occurrence) pair at once: key = cand_index * 2^32 + (position -
        token_offset); a phrase start survives all tokens iff its key
        is in every token's key set. cand_index (not doc_id) keys keep
        the product in int64 for any id space; keys are UNIQUE by
        construction (one key per occurrence), so no sort/unique pass
        is needed. Intersects rarest-token-first — the start set only
        shrinks."""
        pairs = {t: self.lookup(t).positions_pairs(cand) for t in set(toks)}
        tok_keys = []
        for i, t in enumerate(toks):
            rep, flat = pairs[t]
            if i:
                keep = flat >= i
                rep, flat = rep[keep], flat[keep]
            tok_keys.append((rep << np.int64(32)) + (flat - i))
        tok_keys.sort(key=len)
        inter = tok_keys[0]
        for keys in tok_keys[1:]:
            if len(inter) == 0:
                return set()
            inter = inter[np.isin(inter, keys, assume_unique=True)]
        if len(inter) == 0:
            return set()
        return set(cand[np.unique(inter >> np.int64(32))].tolist())

    def topk_phrase_prefix(
        self, phrase: str, k: int = 10, max_terms: int = 1000
    ) -> list[tuple[int, float]]:
        """ES ``match_phrase_prefix``: the LAST query token is a prefix
        over the term dictionary; a doc matches iff some dictionary
        expansion T completes the exact phrase (base tokens adjacent in
        order, T at the next position — the search-as-you-type query).
        Pinned scoring (deterministic, SQL-expressible): each expansion
        scores as the conjunctive BM25 of the token list ``base + [T]``
        exactly as ``topk_phrase`` scores that exact phrase; a doc
        matched by several expansions keeps the MAX score (DisMax over
        expansions). Order (score DESC, doc_id ASC).

        Cost: one dictionary range read (``expand_prefix``) + per
        expansion one posting intersection over the SHARED base
        candidate set and one vectorized adjacency verify — only the
        query terms' postings are touched, never the corpus. Raises if
        the expansion exceeds ``max_terms`` (the wildcard family's
        query-cost guard). A multi-token phrase needs the positional
        index; the single-token degenerate (pure prefix phrase) does
        not (any occurrence is trivially a phrase of length one — note
        it MAX-combines expansions where ``topk_prefix`` SUM-combines
        them, the phrase-family vs union-family contract)."""
        from collections import Counter

        toks = self._qtokens(phrase)
        if not toks:
            return []
        base = toks[:-1]
        if base and not self.positional:
            raise ValueError(
                "index was built without positions "
                "(BuildConfig(positions=True) enables phrase queries)"
            )
        exps = self.expand_prefix(toks[-1])
        if len(exps) > max_terms:
            raise ValueError(
                f"prefix '{toks[-1]}' expands to {len(exps)} terms "
                f"(max_terms={max_terms}); narrow the prefix"
            )
        if not exps:
            return []
        # shared base intersection: docs containing every base term
        base_cand: np.ndarray | None = None
        base_posts = {}
        for t in set(base):
            p = self.lookup(t)
            if p is None:
                return []
            base_posts[t] = p
        for p in sorted(base_posts.values(), key=lambda p: p.df):
            ids = p.decode_all()[0]
            base_cand = ids if base_cand is None else (
                base_cand[np.isin(base_cand, ids, assume_unique=True)]
            )
            if len(base_cand) == 0:
                return []
        best: dict[int, float] = {}
        for term in exps:
            p_t = self.lookup(term)
            if p_t is None:  # dictionary term fully tombstoned
                continue
            ids_t = p_t.decode_all()[0]
            if base_cand is not None:
                cand = base_cand[np.isin(base_cand, ids_t, assume_unique=True)]
            else:
                cand = ids_t
            if len(cand) == 0:
                continue
            full = base + [term]
            if base:
                verified = self._verify_phrase(full, cand)
                if not verified:
                    continue
                vd = np.fromiter(verified, dtype=np.int64, count=len(verified))
                vd.sort()
            else:
                vd = cand
            score = np.zeros(len(vd), dtype=np.float64)
            for tok, mult in Counter(full).items():
                p = base_posts.get(tok) or (p_t if tok == term else None)
                if p is None:  # base term that equals another expansion
                    p = self.lookup(tok)
                w = idf(self.n_docs, p.df)
                if w == 0.0:
                    continue
                ids, tfs, dls = p.decode_all()
                pos = np.searchsorted(ids, vd)
                score += mult * w * tf_norm(
                    tfs[pos], dls[pos], self.avgdl, self.params
                )
            for d, s in zip(vd.tolist(), score.tolist()):
                if s > best.get(d, -np.inf):
                    best[d] = s
        if not best:
            return []
        doc_arr = np.fromiter(best.keys(), dtype=np.int64, count=len(best))
        sc_arr = np.fromiter(best.values(), dtype=np.float64, count=len(best))
        top_ids, top_sc = topk_order(doc_arr, sc_arr, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_near(
        self, query: str, window: int, k: int = 10
    ) -> list[tuple[int, float]]:
        """Proximity top-k from the positional index: conjunctive
        candidates (``topk_and`` scores) restricted to docs where EVERY
        PAIR of distinct query terms has occurrences within ``window``
        tokens of each other (|pos_a - pos_b| <= window, pairwise
        EXISTS — the SQL-expressible proximity predicate). Verification
        is a vectorized doc-keyed range probe per pair: sort one side's
        (candidate, position) keys once, then a two-searchsorted window
        test for every occurrence of the other side at once — no
        Python loop over docs, no corpus access."""
        if not self.positional:
            raise ValueError(
                "index was built without positions "
                "(BuildConfig(positions=True) enables proximity queries)"
            )
        if window < 0:
            raise ValueError("window must be >= 0")
        terms = list(dict.fromkeys(self._qtokens(query)))
        if not terms:
            return []
        hits = self.topk_and(query, k=1 << 62)
        if not hits:
            return []
        if len(terms) == 1:
            return hits[:k]

        def verify(cand: np.ndarray) -> set:
            shift = np.int64(32)
            w = np.int64(window)
            keysets = {}
            for t in terms:
                rep, flat = self.lookup(t).positions_pairs(cand)
                keys = (rep << shift) + flat
                keysets[t] = (rep, flat, np.sort(keys))
            ok: np.ndarray | None = None  # mask over cand indices
            for a in range(len(terms)):
                for b in range(a + 1, len(terms)):
                    rep_a, flat_a, _ = keysets[terms[a]]
                    sorted_b = keysets[terms[b]][2]
                    if ok is not None:
                        keep = ok[rep_a]
                        rep_a, flat_a = rep_a[keep], flat_a[keep]
                    # same-doc window [pos-w, pos+w]: the doc id lives
                    # in the high key bits, so clamping the low bound
                    # at the doc's first position keeps the probe from
                    # crossing into the previous doc's key space
                    base = rep_a << shift
                    lo = np.searchsorted(
                        sorted_b, base + np.maximum(flat_a - w, 0)
                    )
                    hi = np.searchsorted(
                        sorted_b, base + flat_a + w, side="right"
                    )
                    pair_ok = np.zeros(len(cand), dtype=bool)
                    pair_ok[rep_a[hi > lo]] = True
                    ok = pair_ok if ok is None else (ok & pair_ok)
                    if not ok.any():
                        return set()
            return set(cand[ok].tolist())

        return _chunked_verify(hits, k, verify)

    def topk_seq(
        self, query: str, gap: int, k: int = 10
    ) -> list[tuple[int, float]]:
        """Ordered proximity chain (the sloppy-phrase sibling of
        ``topk_near``): the query tokens must occur IN ORDER, each at
        most ``gap`` tokens after the previous one (positions p_1 <
        p_2 < ... with p_{i+1} - p_i <= gap). ``gap=1`` degenerates to
        the exact phrase. Scores are the conjunctive (``topk_and``)
        scores of verified docs.

        Verification is a reachability sweep, not greedy matching
        (greedy-earliest is WRONG for bounded gaps: an earlier
        occurrence can strand the window — e.g. A@1 B@{2,4} C@8,
        gap=4 only chains through B@4). Each step keeps every
        occurrence of token i+1 with SOME reachable predecessor in
        [q-gap, q-1], via two searchsorted probes over doc-keyed
        composite keys — the same vectorized doc-keyed range probe as
        ``topk_near``, applied n-1 times."""
        if not self.positional:
            raise ValueError(
                "index was built without positions "
                "(BuildConfig(positions=True) enables proximity queries)"
            )
        if gap < 1:
            raise ValueError("gap must be >= 1")
        toks = self._qtokens(query)
        if not toks:
            return []
        hits = self.topk_and(query, k=1 << 62)
        if not hits:
            return []
        if len(toks) == 1:
            return hits[:k]

        def verify(cand: np.ndarray) -> set:
            shift = np.int64(32)
            g = np.int64(gap)
            pairs = {t: self.lookup(t).positions_pairs(cand) for t in set(toks)}
            reach: np.ndarray | None = None
            for i, t in enumerate(toks):
                rep, flat = pairs[t]
                keys = (rep.astype(np.int64) << shift) + flat.astype(np.int64)
                if i:
                    lo = np.searchsorted(reach, keys - g)
                    hi = np.searchsorted(reach, keys)
                    keys = keys[hi > lo]
                    if not len(keys):
                        return set()
                reach = np.sort(keys)
            return set(cand[np.unique(reach >> shift)].tolist())

        return _chunked_verify(hits, k, verify)

    def topk_docs(
        self, query: str, k: int = 10, mode: str = "exhaustive",
        window: int = 8,
    ) -> list[dict]:
        """Ranked results resolved to documents — the reference's search
        response shape (url + title + score;
        ``express-server/src/app/index.ts:194-197`` renders ranked
        webpages with titles). ``mode``: exhaustive | pruned | and |
        phrase | near (positional index required for the last two) —
        every evaluation strategy serves the same result shape (r1
        ADVICE: --urls used to silently ignore --mode and). Reads ONLY
        the docmeta rows of the k result doc_ids via parquet predicate
        pushdown; the corpus never loads."""
        fn = {
            "exhaustive": self.topk,
            "pruned": self.topk_pruned,
            "and": self.topk_and,
            "phrase": self.topk_phrase,
            "phrase_prefix": self.topk_phrase_prefix,
            "near": lambda q, kk: self.topk_near(q, window, kk),
            "seq": lambda q, kk: self.topk_seq(q, window, kk),
            "prefix": self.topk_prefix,
            "fuzzy": self.topk_fuzzy,
            "fuzzy2": lambda q, kk: self.topk_fuzzy(q, kk, max_dist=2),
            "not": self.topk_not,
            "bool": self.topk_bool,
            "wildcard": self.topk_wildcard,
            "regex": self.topk_regex,
            "boosted": self.topk_boosted,
            "msm": self.topk_msm,
            "dismax": self.topk_dismax,
            "bmw": self.topk_bmw,
            "fvf": lambda q, kk: self.topk_fvf(q, "doc_len", kk),
        }[mode]
        return resolve_docs(self.layout, fn(query, k))

    def topk_pruned(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """TAAT MaxScore + block-max skip decoding (rank-preserving).

        Safety argument: contributions are non-negative (IDF ≥ 0,
        TF-norm > 0), so a doc absent from the accumulators after the
        "essential" prefix has upper bound = Σ upper bounds of the
        remaining terms; when that is < the current k-th score, it can
        never reach the top-k. Remaining terms therefore only need the
        blocks containing already-accumulated docs; block_max byte
        offsets let us skip decoding the rest. Exact scores for
        surviving docs are still computed with the full-precision
        kernel, so returned (doc_id, score) pairs are identical to
        ``topk``.
        """
        plan = self._term_plan(query)
        if not plan or k <= 0:
            return []
        # merge duplicate query tokens: weight = multiplicity * idf
        merged: dict[int, list] = {}
        for p, w in plan:
            e = merged.setdefault(id(p), [p, 0.0])
            e[1] += w
        entries = list(merged.values())
        ubs = np.array([w * p.max_tf_norm_bound() for p, w in entries])
        order = np.argsort(-ubs, kind="stable")

        acc_ids = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        remaining_ub = float(ubs.sum())
        i = 0
        for oi in order:
            p, w = entries[oi]
            ub = float(ubs[oi])
            theta = (
                np.partition(acc_scores, len(acc_scores) - k)[len(acc_scores) - k]
                if len(acc_scores) >= k
                else 0.0
            )
            if len(acc_scores) >= k and remaining_ub < theta:
                break  # no new doc can enter; switch to candidate-only mode
            ids, tfs, dls = p.decode_all()
            contrib = w * tf_norm(tfs, dls, self.avgdl, self.params)
            acc_ids, acc_scores = _merge_accumulate(acc_ids, acc_scores, ids, contrib)
            remaining_ub -= ub
            i += 1

        # candidate-only phase: remaining terms update existing accumulators
        for oi in order[i:]:
            p, w = entries[oi]
            if len(acc_ids) == 0:
                break
            ids, tfs, dls = p.decode_candidates(acc_ids)
            if len(ids) == 0:
                continue
            contrib = w * tf_norm(tfs, dls, self.avgdl, self.params)
            # keep only contributions for docs already accumulated
            pos = np.searchsorted(acc_ids, ids)
            ok = (pos < len(acc_ids)) & (acc_ids[np.minimum(pos, len(acc_ids) - 1)] == ids)
            np.add.at(acc_scores, pos[ok], contrib[ok])

        mask = acc_scores > 0.0
        top_ids, top_sc = topk_order(acc_ids[mask], acc_scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_bmw(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Block-Max WAND (Ding & Suel 2011 shape) — rank-identical to
        ``topk``, evaluated document-space-first instead of
        term-space-first (``topk_pruned``'s TAAT MaxScore): the doc-id
        axis is decomposed into the elementary intervals induced by
        every term's posting-block boundaries; each interval's upper
        bound is the sum of the covering blocks' (idf-weighted)
        block-max values — the same per-block maxima BMW pivots on.
        Intervals are processed in descending-bound order, each one
        scored EXACTLY (every term skip-decodes only its blocks that
        intersect the interval chunk), and evaluation stops once the
        running k-th score beats the next interval's bound: every
        remaining doc is provably below the top-k. This is WAND's
        pivot-and-skip at block granularity, vectorized — numpy scans
        replace the per-doc cursor walk, which is the right trade on
        Arrow-decoded arrays.

        Best case (a rare term alongside stopwords): only the
        intervals around the rare term's blocks have competitive
        bounds, so the stopword lists decode a handful of blocks
        instead of everything. Worst case degrades to ``topk`` plus
        the metadata pass. Safety mirrors ``topk_pruned``: bounds are
        ≥ true contributions (block_max is nextafter-inflated at
        encode, ``_bound_scale`` corrects stale-avgdl segments) and
        processing stops only on a STRICT bound-vs-θ inequality, so
        θ-ties are still scored and id-ASC tie order is preserved."""
        plan = self._term_plan(query)
        if not plan or k <= 0:
            return []
        merged: dict[int, list] = {}
        for p, w in plan:
            e = merged.setdefault(id(p), [p, 0.0])
            e[1] += w
        entries = list(merged.values())

        # per-fragment block tables: (row, weight, last_doc[], wbmax[])
        frags = []
        edges = [np.array([0], dtype=np.int64)]
        for p, w in entries:
            for r in p.rows:
                last = np.asarray(r["block_last_doc"], dtype=np.int64)
                if len(last) == 0:
                    continue
                bmax = (
                    np.asarray(r["block_max"], dtype=np.float64)
                    * r.get("_bound_scale", 1.0)
                    * w
                )
                frags.append((r, last, bmax))
                edges.append(last + 1)
        if not frags:
            return []
        # elementary intervals [starts[i], starts[i+1]) over doc space
        starts = np.unique(np.concatenate(edges))
        ub = np.zeros(len(starts), dtype=np.float64)
        for _, last, bmax in frags:
            j = np.searchsorted(last, starts, side="left")
            cov = j < len(last)
            ub[cov] += bmax[j[cov]]
        live = ub > 0.0
        order = np.argsort(-ub[live], kind="stable")
        istarts = starts[live][order]
        iends = np.concatenate((starts[1:], [np.iinfo(np.int64).max]))[
            live
        ][order]
        iub = ub[live][order]

        acc_ids = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        pos = 0
        chunk = 64
        while pos < len(iub):
            if len(acc_scores) >= k:
                theta = np.partition(acc_scores, len(acc_scores) - k)[
                    len(acc_scores) - k
                ]
                if iub[pos] < theta:
                    break  # every remaining interval is provably out
                # everything with bound >= theta must be scored anyway
                # under the CURRENT theta — take it in one round rather
                # than paying per-round decode overhead (theta can only
                # grow, so this forfeits at most the growth's pruning)
                chunk = max(
                    chunk,
                    int(np.searchsorted(-iub, -theta, side="right")) - pos,
                )
            lo = np.sort(istarts[pos : pos + chunk])
            hi = np.sort(iends[pos : pos + chunk])
            pos += chunk
            chunk *= 4
            for p, w in entries:
                ids_l, tfs_l, dls_l = [], [], []
                for r in p.rows:
                    last = np.asarray(r["block_last_doc"], dtype=np.int64)
                    if len(last) == 0:
                        continue
                    first = np.empty_like(last)
                    first[0] = 0
                    first[1:] = last[:-1] + 1
                    # block [first, last] intersects some range
                    # [lo_i, hi_i) iff the first range with hi > first
                    # starts at or before last (ranges disjoint+sorted)
                    j = np.searchsorted(hi, first, side="right")
                    jj = np.minimum(j, len(lo) - 1)
                    sel = (j < len(lo)) & (lo[jj] <= last)
                    blocks = np.flatnonzero(sel)
                    if len(blocks):
                        i_, t_, d_ = decode_posting_blocks(r, blocks)
                        ids_l.append(i_)
                        tfs_l.append(t_)
                        dls_l.append(d_)
                if not ids_l:
                    continue
                ids = np.concatenate(ids_l)
                tfs = np.concatenate(tfs_l)
                dls = np.concatenate(dls_l)
                # keep only docs inside the chunk's intervals
                j = np.searchsorted(lo, ids, side="right") - 1
                member = (j >= 0) & (ids < hi[np.maximum(j, 0)])
                ids, tfs, dls = ids[member], tfs[member], dls[member]
                if self.deleted is not None and len(self.deleted) and len(ids):
                    dj = np.searchsorted(self.deleted, ids)
                    hit = (dj < len(self.deleted)) & (
                        self.deleted[np.minimum(dj, len(self.deleted) - 1)]
                        == ids
                    )
                    if hit.any():
                        keep = ~hit
                        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                if len(ids) == 0:
                    continue
                contrib = w * tf_norm(tfs, dls, self.avgdl, self.params)
                acc_ids, acc_scores = _merge_accumulate(
                    acc_ids, acc_scores, ids, contrib
                )
        mask = acc_scores > 0.0
        top_ids, top_sc = topk_order(acc_ids[mask], acc_scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))


def _merge_accumulate(
    acc_ids: np.ndarray,
    acc_scores: np.ndarray,
    ids: np.ndarray,
    contrib: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (ids, contrib) into sorted accumulators (union of docs)."""
    if len(acc_ids) == 0:
        order = np.argsort(ids, kind="stable")
        return ids[order], contrib[order]
    all_ids = np.concatenate((acc_ids, ids))
    all_sc = np.concatenate((acc_scores, contrib))
    uniq, inv = np.unique(all_ids, return_inverse=True)
    out = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(out, inv, all_sc)
    return uniq, out


def resolve_docs(layout: IndexLayout, hits: list[tuple[int, float]]) -> list[dict]:
    """(doc_id, score) hits → ranked url/title rows (the reference's
    search response shape). Reads ONLY the k result docs' docmeta rows
    via parquet predicate pushdown; the corpus never loads. Shared by
    the engine, the warm service and the sharded service."""
    if not hits:
        return []
    ids = [d for d, _ in hits]
    meta = pq.ParquetDataset(
        layout.docmeta_dir, filters=[("doc_id", "in", ids)]
    ).read(columns=["doc_id", "url", "title"])
    meta_of = {
        d: (u, t)
        for d, u, t in zip(
            meta["doc_id"].to_pylist(),
            meta["url"].to_pylist(),
            meta["title"].to_pylist(),
        )
    }
    return [
        {
            "rank": i + 1,
            "doc_id": d,
            "url": meta_of.get(d, ("", ""))[0],
            "title": meta_of.get(d, ("", ""))[1],
            "score": s,
        }
        for i, (d, s) in enumerate(hits)
    ]


class QueryScorer:
    """Actor-pool ``map_batches`` stage: a batch of query rows →
    (query_id, query, rank, doc_id, score) result rows.

    The engine (manifest + segment readers + term cache) loads ONCE per
    actor in ``__init__`` — the canonical stateful-stage pattern (the
    reference analog is the per-process corpus heap at
    ``search-engine/main.go:137-143``, loaded per QUERY; here it is
    per actor, amortized over the query stream).
    """

    def __init__(
        self, index_dir: str, k: int = 10, pruned: bool = False,
        mode: str | None = None, window: int = 8,
    ):
        self.engine = QueryEngine(index_dir)
        self.k = k
        # mode supersedes the legacy pruned flag: exhaustive | pruned |
        # and | phrase | near | prefix (phrase/near need a positional
        # index). Bulk offline phrase/near workloads run through the
        # same warm actor pool as plain scoring.
        if mode is None:
            mode = "pruned" if pruned else "exhaustive"
        e = self.engine
        self.fn = {
            "exhaustive": e.topk,
            "pruned": e.topk_pruned,
            "and": e.topk_and,
            "phrase": e.topk_phrase,
            "phrase_prefix": e.topk_phrase_prefix,
            "near": lambda q, kk: e.topk_near(q, window, kk),
            "seq": lambda q, kk: e.topk_seq(q, window, kk),
            "prefix": e.topk_prefix,
            "fuzzy": e.topk_fuzzy,
            "fuzzy2": lambda q, kk: e.topk_fuzzy(q, kk, max_dist=2),
            "not": e.topk_not,
            "bool": e.topk_bool,
            "wildcard": e.topk_wildcard,
            "regex": e.topk_regex,
        }[mode]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, queries, ranks, doc_ids, scores = [], [], [], [], []
        fn = self.fn
        for qid, q in zip(batch["query_id"].to_pylist(), batch["query"].to_pylist()):
            for rank, (doc_id, score) in enumerate(fn(q, self.k), start=1):
                qids.append(qid)
                queries.append(q)
                ranks.append(rank)
                doc_ids.append(doc_id)
                scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "query": pa.array(queries, type=pa.string()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )
