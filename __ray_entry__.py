"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or anywhere in zensearch_ray.

Determinism conventions shared by every (query, oracle) pair:
  * float outputs are rounded with SQL ROUND semantics
    (half-away-from-zero, ``zensearch_ray.functions.rounding.round6``);
  * money/value sums are exact integer cents (floor(x*100+0.5));
  * top-k outputs carry an explicit ``rank`` and are ordered by
    (measure DESC, id ASC);
  * column names match the SQL aliases exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# one definition of SQL-side tokenization, matching the pinned Unicode
# tokenizer on this corpus (documents.text is verified pure [a-z0-9 ])
_TOKS = (
    "SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))"
    " AS term FROM documents"
)
_TOKLIST = "list_filter(string_split(text, ' '), x -> x <> '')"

QUANTILE_QS = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
_QLIST_SQL = "[" + ",".join(str(q) for q in QUANTILE_QS) + "]"

BM25_QUERY = "spark window merge stream table"
_BM25_VALUES = "(VALUES ('spark'), ('window'), ('merge'), ('stream'), ('table'))"
PHRASE_QUERY = "hash join"
_PHRASE_VALUES = "(VALUES ('hash'), ('join'))"
# match_phrase_prefix probe: base term 'hash', last token a prefix —
# 's' expands to {scan, slow, small, sort, spark, stream}, several of
# which complete a real "hash X" phrase, so the MAX-over-expansions
# combine is exercised (docs matched via two expansions keep the max)
PHRASE_PREFIX_QUERY = "hash s"
# all-plural twin of BM25_QUERY: the stem analyzer folds it onto the
# singular corpus vocabulary (sparks→spark, ..., tables→table)
STEM_QUERY = "sparks windows merges streams tables"
# synonym-fold probe: VARIANT surface forms — the folded index stores
# only the canonicals (quick, large), so retrieval proves both the
# index-side fold and the query-side fold
SYNFOLD_QUERY = "fast big table"
# ranking-quality eval probes: the two standing queries, a rare-term
# conjunction ('dup' df ≈ 5% — exercises the n_rel<k ideal-DCG
# truncation), and a vocabulary-miss probe (n_rel must be 0 even
# though hits rank)
EVAL_QUERIES = [BM25_QUERY, PHRASE_QUERY, "dup stream table",
                "stream nosuchtermxyz"]
NEAR_WINDOW = 5
SEQ_GAP = 4  # ordered-proximity chain gap for seq_topk
TV_DOC_ID = 0  # termvectors probe document (dense ids: 0 exists at all SFs)
PREFIX_QUERY = "s"
FUZZY_QUERY = "strem windoq kay"  # typos of stream / window / key
NOT_QUERY = "spark window -merge -stream"  # exclusion (boolean NOT)
BOOL_QUERY = "(spark OR hash) AND window -merge"  # full boolean grammar
WILDCARD_QUERY = "s*a*"  # glob: expands to {scan, small, spark, stream}
REGEX_QUERY = "s(c|p)a(n|rk)"  # regex: expands to {scan, spark}
# standing percolator registry (boolean grammar, incl. NOT + parens)
RANGE_LO, RANGE_HI = 30, 70  # doc_len window for the range-filter entry
SYN_QUERY = "spark stream"  # expands via corpus.SYNONYMS_CFG
PERCOLATE_QUERIES = {
    "q_spark_win": "spark AND window",
    "q_hash_or": "hash OR (merge AND stream)",
    "q_table_not_join": "table -join",
    "q_rare_pair": "vector dup",
    "q_no_common": "NOT (a OR the OR table)",
}
BOOST_QUERY = "spark^2.5 window merge^0.5 stream table"  # term^w boosts
_BOOST_VALUES = (
    "(VALUES ('spark', 2.5), ('window', 1.0), ('merge', 0.5),"
    " ('stream', 1.0), ('table', 1.0))"
)
MSM_M = 3  # minimum_should_match: >= 3 of the 5 BM25_QUERY terms
BOOSTING_NEG_QUERY = "merge stream"  # boosting-query negative leg
NEG_BOOST = 0.3  # demotion factor for docs matching a negative term
SPANFIRST_N = 3  # span_first window: first occurrence within N tokens
DECAY_ORIGIN = 40.0  # decay scoring: preferred doc_len (tokens)
DECAY_SCALE = 30.0  # decay scoring: distance where multiplier = rate
DECAY_OFFSET = 5.0  # decay scoring: no-penalty halo around origin
DECAY_RATE = 0.5  # decay scoring: multiplier at origin±(offset+scale)
RANDOM_SEED = 7  # random_score draw seed
DISMAX_TIE = 0.3  # DisjunctionMaxQuery tie-breaker weight
COMPLETE_PREFIX = "s"  # autocomplete probe prefix
SIG_QUERY = "hash join"  # significant-terms foreground probe
SIG_MIN_FG_DF = 3  # noise floor: candidate must hit >= 3 fg docs
EXACT_SUBSTR_L = 10  # ExactSubstr duplicate-window length (tokens)
SEM_K = 8  # SemDeDup cluster count at test scale
N_BALANCED_SHARDS = 8  # token-balanced training-shard count
DECON_BENCH_DOCS = 10  # docs 0..9 play the "benchmark/eval set" role
NEAR_DUP_THRESHOLD = 0.4
SEM_THRESHOLD = NEAR_DUP_THRESHOLD  # same bar as the near-dup family
N_MULTI_PROBES = 5
_STOPLIST_SQL = "['the','a','of','and','to','in','is','on','at','by']"


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (term-
    sharded shuffle → compressed segments) and serve the demo query set
    through the actor-pool scorer. Returns the ranked-results Dataset."""
    import ray.data as rd

    from zensearch_ray.pipelines.corpus import index_dir_for
    from zensearch_ray.pipelines.query import QueryScorer

    sf_dir = "/root/testdata/sf0.001"
    index_dir = index_dir_for(sf_dir)
    demo_queries = [
        BM25_QUERY,
        "fast hash join",
        "the a",
        "customer order line",
        "nosuchtermxyz",
    ]
    qds = rd.from_items(
        [{"query_id": i, "query": q} for i, q in enumerate(demo_queries)]
    )
    return qds.map_batches(
        QueryScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "k": 10},
        batch_format="pyarrow",
        concurrency=2,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from zensearch_ray.pipelines import analytics, corpus, joins, relational, windows
    from zensearch_ray.pipelines import sort as sort_pipeline
    from zensearch_ray.stages import bloom, sketch

    def bm25(sf_dir: str):
        return corpus.bm25_topk(sf_dir, BM25_QUERY, k=10)

    def bm25_pruned(sf_dir: str):
        return corpus.bm25_topk(sf_dir, BM25_QUERY, k=10, pruned=True)

    def bm25_bmw(sf_dir: str):
        # Block-Max WAND evaluation — rank-identical to topk by
        # contract, so it shares the bm25 oracle
        return corpus.bm25_topk(sf_dir, BM25_QUERY, k=10, pruned="bmw")

    def bm25_and(sf_dir: str):
        return corpus.bm25_topk(sf_dir, BM25_QUERY, k=10, conjunctive=True)

    def federated(sf_dir: str):
        # doc-sharded scatter-gather federation over two INDEPENDENTLY
        # built half-corpus artifacts (exact global idf/avgdl via the
        # dfs_query_then_fetch two-phase protocol) — same oracle as
        # bm25_topk, proving federation == one-shot union build
        return corpus.federated_topk(sf_dir, BM25_QUERY, k=10)

    def bm25_page2(sf_dir: str):
        # stateless search_after cursor pagination: page 2 (global
        # ranks 11..20) reached via page 1's last (score, doc_id) hit
        return corpus.search_after_page(sf_dir, BM25_QUERY, k=10, page=2)

    def bm25_boosted(sf_dir: str):
        # Lucene-style per-term query boosts (term^w)
        return corpus.boosted_topk(sf_dir, BOOST_QUERY, k=10)

    def bm25_msm(sf_dir: str):
        # minimum_should_match: docs matching >= 3 of the 5 terms
        return corpus.msm_topk(sf_dir, BM25_QUERY, k=10, min_should_match=MSM_M)

    def bm25_dismax(sf_dir: str):
        # DisjunctionMaxQuery: best term + tie * the rest
        return corpus.dismax_topk(sf_dir, BM25_QUERY, k=10, tie=DISMAX_TIE)

    def tfidf(sf_dir: str):
        # pluggable similarity over the SAME segments (SMART ltn)
        return corpus.sim_topk(sf_dir, BM25_QUERY, "tfidf", k=10)

    def lmd(sf_dir: str):
        # LM Dirichlet (mu=2000), matched-terms-only Lucene shape
        return corpus.sim_topk(sf_dir, BM25_QUERY, "lmd", k=10)

    def bm25plus(sf_dir: str):
        # BM25+ (Lv & Zhai 2011): idf * (tf_norm + 1.0) per matched term
        return corpus.sim_topk(sf_dir, BM25_QUERY, "bm25plus", k=10)

    def lmjm(sf_dir: str):
        # LM Jelinek-Mercer (lambda=0.1), matched-terms-only Lucene shape
        return corpus.sim_topk(sf_dir, BM25_QUERY, "lmjm", k=10)

    def boosting(sf_dir: str):
        # ES boosting query: BM25 over the positive terms, docs touching
        # any negative term demoted by NEG_BOOST (not excluded)
        return corpus.boosting_topk(
            sf_dir, BM25_QUERY, BOOSTING_NEG_QUERY, k=10,
            negative_boost=NEG_BOOST,
        )

    def spanfirst(sf_dir: str):
        # span_first(span_or(terms), end=SPANFIRST_N): some query term
        # must occur within the doc's first SPANFIRST_N tokens
        return corpus.spanfirst_topk(sf_dir, BM25_QUERY, SPANFIRST_N, k=10)

    def bm25_deleted(sf_dir: str):
        # tombstoned docs (doc_id % 17 == 3) excluded from results;
        # stats still count them (Lucene stats-at-merge semantics)
        return corpus.bm25_topk_deleted(sf_dir, BM25_QUERY, k=10)

    def bm25_purged(sf_dir: str):
        # after compact_index purges the tombstones: stats/df are the
        # survivors-only values — results == a build without those docs
        return corpus.bm25_topk_purged(sf_dir, BM25_QUERY, k=10)

    def bm25_filtered(sf_dir: str):
        # faceted search: results restricted to lang='de' docs; scores
        # stay corpus-global (Lucene filter-query semantics)
        return corpus.bm25_topk_filtered(sf_dir, BM25_QUERY, k=10)

    def facets(sf_dir: str):
        return corpus.facet_counts(sf_dir, BM25_QUERY, col="lang")

    def scrub(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.textstats import scrub_batch

        return rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(scrub_batch, batch_format="pyarrow")

    def boolq(sf_dir: str):
        return corpus.bool_topk(sf_dir, BOOL_QUERY, k=10)

    def wildcard(sf_dir: str):
        return corpus.wildcard_topk(sf_dir, WILDCARD_QUERY, k=10)

    def regexq(sf_dir: str):
        return corpus.regex_topk(sf_dir, REGEX_QUERY, k=10)

    def collapsed(sf_dir: str):
        # SERP field collapse: ≤1 result per source in the top-k
        return corpus.collapsed_topk(sf_dir, BM25_QUERY, col="source", per=1, k=10)

    def per_facet(sf_dir: str):
        # per-group ranking: top-2 results within every source
        return corpus.per_facet_topk(sf_dir, BM25_QUERY, col="source", per=2)

    def lm(sf_dir: str):
        return corpus.doc_lm_score(sf_dir)

    def _dsir(sf_dir: str):
        # DSIR importance weights (unigram+bigram bag features, Laplace
        # α=1, target = lang='en' slice) — the data-selection signal
        from zensearch_ray.pipelines.selection import dsir_weights_for

        return dsir_weights_for(sf_dir)

    def _emb_pca(sf_dir: str):
        from zensearch_ray.stages.ann import embedding_pca

        return embedding_pca(sf_dir)

    def _quality_clf(sf_dir: str):
        # discriminative twin of dsir_weights: hashed-ngram logistic
        # regression trained by distributed full-batch GD (rows-only:
        # iterative — exactness pinned by the local-referee test)
        from zensearch_ray.pipelines.selection import quality_classifier_for

        return quality_classifier_for(sf_dir)

    def fvf(sf_dir: str):
        # ES function_score / field_value_factor: BM25 × ln(1+doc_len)
        return corpus.fvf_topk(sf_dir, BM25_QUERY, k=10)

    def decay_gauss(sf_dir: str):
        # ES function_score gauss decay on doc_len: BM25 ×
        # 0.5^((max(0,|dl-40|-5)/30)^2)
        return corpus.decay_topk(
            sf_dir, BM25_QUERY, "gauss",
            DECAY_ORIGIN, DECAY_SCALE, DECAY_OFFSET, DECAY_RATE, k=10,
        )

    def decay_linear(sf_dir: str):
        # ES function_score linear decay (exercises the 0-clamp)
        return corpus.decay_topk(
            sf_dir, BM25_QUERY, "linear",
            DECAY_ORIGIN, DECAY_SCALE, DECAY_OFFSET, DECAY_RATE, k=10,
        )

    def random_scored(sf_dir: str):
        # ES function_score random_score: deterministic per-(seed,
        # doc_id) md5 draw over the BM25 match set
        return corpus.random_topk(sf_dir, BM25_QUERY, RANDOM_SEED, k=10)

    def rescored(sf_dir: str):
        # ES rescore: BM25 window of 30 over the match query, window
        # re-sorted by 1.0·bm25 + 2.0·positional-phrase score
        return corpus.rescored_topk(
            sf_dir, BM25_QUERY, PHRASE_QUERY, k=10, window=30
        )

    def syn(sf_dir: str):
        # query-time synonym expansion over the shared index
        return corpus.synonyms_topk(sf_dir, SYN_QUERY, k=10)

    def rng(sf_dir: str):
        # range-query sibling of the facet filter: doc_len ∈ [30, 70]
        return corpus.range_topk(sf_dir, BM25_QUERY, RANGE_LO, RANGE_HI, k=10)

    def mstats(sf_dir: str):
        # ES-style metric aggregation over the matched set
        return corpus.match_stats(sf_dir, BM25_QUERY)

    def _match_hist(sf_dir: str):
        # ES histogram aggregation: doc_len buckets over the match set
        return corpus.match_histogram(sf_dir, BM25_QUERY, interval=10.0)

    def _match_card(sf_dir: str):
        # ES cardinality aggregation: distinct sources in the match set
        return corpus.match_cardinality(sf_dir, BM25_QUERY, col="source")

    def _match_pct(sf_dir: str):
        # ES percentiles aggregation (percentile_disc rank rule) over
        # the matched set's doc_len
        return corpus.match_percentiles(sf_dir, BM25_QUERY)

    def _tvecs(sf_dir: str):
        # ES termvectors: per-term tf / corpus df / positions for ONE doc
        return corpus.term_vectors(sf_dir, TV_DOC_ID)

    def stop(sf_dir: str):
        # analyzer config: stopword-filtered index; the leading 'the'
        # in the query is inert (no postings), doc lengths exclude stops
        return corpus.stopword_topk(sf_dir, "the " + BM25_QUERY, k=10)

    def stemq(sf_dir: str):
        # analyzer config: S-stemmed index + query-side stemming via
        # the manifest flag — the all-plural query folds onto the
        # singular corpus terms
        return corpus.stem_topk(sf_dir, STEM_QUERY, k=10)

    def restemq(sf_dir: str):
        # the SAME stem analyzer arrived at by ANALYZER REINDEX: the
        # stemmed index is derived from the plain index's own postings
        # (pipelines/reindex — corpus text never read); same oracle as
        # bm25_topk_stem, so the gate value-checks the migration path
        return corpus.reindexed_stem_topk(sf_dir, STEM_QUERY, k=10)

    def synfoldq(sf_dir: str):
        return corpus.synfold_topk(sf_dir, SYNFOLD_QUERY, k=10)

    def percolate_docs(sf_dir: str):
        # reverse search: the standing boolean-query registry matched
        # against the streaming document table (broadcast small side)
        import ray.data as rd

        from zensearch_ray.stages.percolate import percolate

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return percolate(docs, PERCOLATE_QUERIES)

    def dump(sf_dir: str):
        # index-integrity export: segments decoded back to (term,
        # doc_id, tf, dl) facts, verified against the tokenization SQL
        # — closes the loop over encode/shuffle/commit/decode
        from zensearch_ray.pipelines.export import dump_postings

        return dump_postings(corpus.index_dir_for(sf_dir))

    def bm25f(sf_dir: str):
        # fielded BM25F: title tokens (deterministic synthetic title =
        # first TITLE_WORDS tokens) weighted TITLE_BOOST× in tf + dl,
        # folded into the index at build — query path unchanged
        return corpus.bm25f_topk(sf_dir, BM25_QUERY, k=10)

    def keywords(sf_dir: str):
        return corpus.doc_keywords(sf_dir, m=5)

    def hybrid(sf_dir: str):
        # lexical BM25 leg + dense cosine leg, reciprocal-rank fused
        return corpus.hybrid_rrf(sf_dir, BM25_QUERY, probe_vec_id=0, k=10)

    def phrase(sf_dir: str):
        return corpus.phrase_topk(sf_dir, PHRASE_QUERY, k=10)

    def phrase_pos(sf_dir: str):
        # positional-index path: same oracle, zero corpus access at
        # query time (only the phrase terms' postings + positions)
        return corpus.phrase_topk(sf_dir, PHRASE_QUERY, k=10, positional=True)

    def phrase_prefix(sf_dir: str):
        # search-as-you-type: last token is a dictionary prefix; each
        # expansion completes the phrase, docs keep their MAX score
        return corpus.phrase_prefix_topk(sf_dir, PHRASE_PREFIX_QUERY, k=10)

    def near(sf_dir: str):
        return corpus.near_topk(sf_dir, PHRASE_QUERY, window=NEAR_WINDOW, k=10)

    def seq(sf_dir: str):
        # ordered proximity: "hash ... join" in order within SEQ_GAP
        return corpus.seq_topk(sf_dir, PHRASE_QUERY, gap=SEQ_GAP, k=10)

    def prefix(sf_dir: str):
        return corpus.prefix_topk(sf_dir, PREFIX_QUERY, k=10)

    def fuzzy(sf_dir: str):
        return corpus.fuzzy_topk(sf_dir, FUZZY_QUERY, k=10)

    def fuzzy2(sf_dir: str):
        # distance-2 expansion via the SymSpell delete buckets; same
        # query so the widened expansion is the only delta vs fuzzy
        return corpus.fuzzy_topk(sf_dir, FUZZY_QUERY, k=10, max_dist=2)

    def dym(sf_dir: str):
        return corpus.did_you_mean(sf_dir, FUZZY_QUERY)

    def suggest_phrase_q(sf_dir: str):
        # whole-query spelling correction reranked by the corpus
        # bigram LM (ES phrase-suggester analog)
        return corpus.suggest_phrase(sf_dir, PHRASE_SUGGEST_QUERY, k=3)

    def complete(sf_dir: str):
        # search-box completion: terms under the prefix by df desc
        return corpus.autocomplete_terms(sf_dir, COMPLETE_PREFIX, k=10)

    def bshards(sf_dir: str):
        # token-balanced contiguous training shards (data-loader balance)
        return corpus.balanced_shards(sf_dir, n_shards=N_BALANCED_SHARDS)

    def shuffled(sf_dir: str):
        # deterministic seeded training shuffle: md5 keys, nibble shard,
        # in-shard position
        return corpus.seeded_shuffle(sf_dir, seed="r3", n_shards=8)

    def sig_terms(sf_dir: str):
        # fg = union of the probe terms' postings; JLH lift vs corpus
        return corpus.significant_terms(
            sf_dir, SIG_QUERY, k=25, min_fg_df=SIG_MIN_FG_DF
        )

    def explain(sf_dir: str):
        # Lucene-Explanation surface: per-(doc, term) BM25 breakdown
        return corpus.explain_topk(sf_dir, BM25_QUERY, k=10)

    def notq(sf_dir: str):
        return corpus.not_topk(sf_dir, NOT_QUERY, k=10)

    def mlt(sf_dir: str):
        return corpus.more_like_this(sf_dir, doc_id=0, m=5, k=10)

    def snippets(sf_dir: str):
        return corpus.search_snippets(sf_dir, BM25_QUERY, k=10)

    def bigrams(sf_dir: str):
        return corpus.top_bigrams(sf_dir, n=20)

    def pmi(sf_dir: str):
        return corpus.pmi_bigrams(sf_dir, n=20, min_count=5)

    def cooc(sf_dir: str):
        return corpus.cooc_window(sf_dir, n=20, window=3)

    GREP_PATTERN = r"hash (join|scan)"
    EXTRACT_PATTERN = r"(?P<verb>merge|sort) (?P<obj>join|scan|table)"

    def grep(sf_dir: str):
        return corpus.grep_docs(sf_dir, GREP_PATTERN)

    def extractp(sf_dir: str):
        return corpus.extract_pattern(sf_dir, EXTRACT_PATTERN)

    def ngram_rate(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.dedup import dup_ngram_rate

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return dup_ngram_rate(ds, n=8)

    def span_dedup_docs(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.dedup import span_dedup

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return span_dedup(ds, w=8, n_buckets=32)

    def exact_substr_docs(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.dedup import exact_substr_dedup

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return exact_substr_dedup(ds, l=EXACT_SUBSTR_L, n_buckets=32)

    def unigram_vocab(sf_dir: str):
        # SentencePiece-family unigram-LM tokenizer (rows-only:
        # iterative EM — exactness pinned by the no-histogram referee)
        from zensearch_ray.stages.unigram import unigram_vocab_for

        return unigram_vocab_for(sf_dir)

    def unigram_pieces(sf_dir: str):
        from zensearch_ray.stages.unigram import unigram_pieces_for

        return unigram_pieces_for(sf_dir)

    def bpe_merges(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.bpe import bpe_train

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        return bpe_train(ds, n_merges=40)

    def bpe_pieces(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.bpe import bpe_encode_counts, bpe_train

        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        m = bpe_train(ds, n_merges=40)
        merges = list(zip(m["left"], m["right"]))
        return bpe_encode_counts(ds, merges)

    def price_quantiles_by_flag(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.quantiles import exact_quantiles

        ds = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice"],
        )
        return exact_quantiles(
            ds, "l_extendedprice", QUANTILE_QS, by="l_returnflag"
        )

    def decon(sf_dir: str):
        import pyarrow.parquet as pq
        import ray.data as rd

        from zensearch_ray.stages.dedup import decontaminate

        bench = (
            pq.read_table(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text"],
                filters=[("doc_id", "<", DECON_BENCH_DOCS)],
            )
            .sort_by("doc_id")["text"]
            .to_pylist()
        )
        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).filter(expr=f"doc_id >= {DECON_BENCH_DOCS}")
        return decontaminate(ds, bench, n=8)

    def embedding_mmr(sf_dir: str):
        # MMR diversified rerank over the probe's top-50 ANN candidates
        # (rows-only: the greedy selection isn't SQL-expressible; a
        # brute-force referee pins it in tests/test_mmr.py)
        import pyarrow.parquet as pq
        import ray.data as rd

        probe = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", 0)],
        )
        vec = probe["embedding"].to_pylist()[0]
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        from zensearch_ray.stages.ann import mmr_topk

        return mmr_topk(ds, vec, k=10, fetch_n=50, lam=0.7)

    def embedding_topk(sf_dir: str):
        import pyarrow.parquet as pq
        import ray.data as rd

        probe = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", 0)],
        )
        vec = probe["embedding"].to_pylist()[0]
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        from zensearch_ray.stages.ann import cosine_topk

        out = cosine_topk(ds, vec, k=10)
        out.insert(0, "rank", range(1, len(out) + 1))
        return out

    def embedding_topk_filtered(sf_dir: str):
        # filtered vector search (metadata predicate + exact cosine
        # top-k): the label predicate is pushed into the parquet read —
        # non-matching row groups never leave storage, and the scored
        # universe is only the matching rows (pre-filter semantics, the
        # ES/vespa knn-with-filter shape, NOT post-filtering a larger
        # top-k)
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq
        import ray.data as rd

        probe = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", 0)],
        )
        vec = probe["embedding"].to_pylist()[0]
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=(pads.field("label") == 3),
        )
        from zensearch_ray.stages.ann import cosine_topk

        out = cosine_topk(ds, vec, k=10)
        out.insert(0, "rank", range(1, len(out) + 1))
        return out

    def _quantiles_approx(sf_dir: str):
        # one-pass approximate sibling of lineitem_quantiles (no SQL
        # oracle: bounded rank error, not value identity — the bound
        # itself is referee-tested in test_quantiles.py)
        import ray.data as rd

        from zensearch_ray.stages.quantiles import approx_quantiles

        ds = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
        )
        return approx_quantiles(
            ds, "l_extendedprice", [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
        )

    def embedding_kmeans(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.ann import kmeans_assign, kmeans_fit

        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        centroids = kmeans_fit(ds, k=8, iters=5, seed=42)
        sizes = (
            kmeans_assign(ds, centroids)
            .groupby("cluster")
            .count()
            .to_pandas()
            .rename(columns={"count()": "n_points"})
            .sort_values("cluster", ignore_index=True)
        )
        import numpy as np
        return sizes.astype({"cluster": np.int64, "n_points": np.int64})

    def embedding_near_dup(sf_dir: str):
        # threshold-adaptive default: high thresholds route to the
        # bucketed LSH path (exact-verified candidates, seeded
        # banding); at this LOW threshold (0.4) sign-banding cannot
        # prune (lsh_prune_rate ≈ 1 — most orthogonal pairs still
        # collide in some band), so auto routes to the exact block-pair
        # matmul, which is strictly less work. Both paths are
        # value-identical (tests/test_embedding_lsh.py).
        import ray.data as rd

        from zensearch_ray.stages.ann import near_dup_pairs_auto

        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return near_dup_pairs_auto(ds, NEAR_DUP_THRESHOLD)

    def embedding_dup_components(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.ann import dup_components

        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return dup_components(ds, NEAR_DUP_THRESHOLD)

    def ranking_eval(sf_dir: str):
        # search-quality scorecard: hits/MRR/nDCG@10 of the engine's
        # own rankings against the conjunctive-containment relevance
        # oracle (doc relevant iff it contains EVERY query term)
        from zensearch_ray.pipelines.corpus import index_dir_for
        from zensearch_ray.pipelines.evaluate import ranking_metrics

        return ranking_metrics(index_dir_for(sf_dir), EVAL_QUERIES, k=10)

    def warc_ingest(sf_dir: str):
        # WARC crawl-archive ingestion: a deterministic member-gzipped
        # WARC is synthesized ONCE from the documents table (tmp+rename
        # commit), then read back through the Ray WARC source — the
        # oracle checks the writer→gzip→reader→HTTP-parse round trip
        # against the table the bytes came from
        import os
        import tempfile

        import pyarrow as pa
        import pyarrow.compute as pc

        from zensearch_ray.functions.ids import hash64
        from zensearch_ray.sources.warc import documents_to_warc, read_warc

        key = hash64(os.path.realpath(sf_dir)) % 10**12
        path = os.path.join(
            tempfile.gettempdir(), f"zensearch_warc_v1_{key}.warc.gz")
        if not os.path.exists(path):
            tmp = f"{path}.tmp{os.getpid()}"
            documents_to_warc(sf_dir, tmp)
            os.replace(tmp, path)

        def project(t: pa.Table) -> pa.Table:
            return pa.table({
                "url": t["url"],
                "status": t["status"].cast(pa.int64()),
                "mime": t["mime"],
                "n_bytes": pc.binary_length(t["html"]).cast(pa.int64()),
            })

        return read_warc(path).map_batches(project, batch_format="pyarrow")

    def semdedup(sf_dir: str):
        # SemDeDup: k-means clusters then within-cluster cosine dedup
        # (rows-only: the k-means assignment is iterative, not SQL)
        import ray.data as rd

        from zensearch_ray.stages.ann import semantic_dedup

        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return semantic_dedup(ds, k_clusters=SEM_K, threshold=SEM_THRESHOLD)

    def jaccard(sf_dir: str):
        # index-backed serving path: candidates from the OR-union of
        # the probe terms' posting lists (provably complete for
        # jaccard > 0), pruned text fetch for candidates only; the
        # full-scan referee stays in stages/minhash.jaccard_topk
        from zensearch_ray.pipelines.corpus import jaccard_topk_indexed

        return jaccard_topk_indexed(sf_dir, probe_doc_id=0, k=10)

    def gopher_filter(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.textstats import gopher_batch

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return ds.map_batches(gopher_batch, batch_format="pyarrow")

    def token_quality(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.textstats import token_quality_batch

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return ds.map_batches(token_quality_batch, batch_format="pyarrow")

    def doc_repetition(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.textstats import repetition_batch

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return ds.map_batches(repetition_batch, batch_format="pyarrow")

    def fingerprint(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.textstats import fingerprint_batch

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return ds.map_batches(fingerprint_batch, batch_format="pyarrow")

    # ---- non-SQL-expressible operators (driver records rows-only) ----
    def lang_id(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.textstats import LangIdStage

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4))

    def simhash(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.minhash import SimHashStage

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return ds.map_batches(SimHashStage, batch_format="pyarrow", concurrency=(1, 4))

    def simhash_pairs(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.minhash import simhash_near_pairs

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return simhash_near_pairs(ds, max_hamming=6, n_bands=7)

    def minhash_groups(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.minhash import dup_groups

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        # 32 bands × 4 rows (same 128 permutations as the 16×8 default)
        # pushes the boundary-pair miss probability at j=0.8 to ~5e-8,
        # so the LSH+verify output provably matches the exact all-pairs
        # shingle-Jaccard SQL oracle; the Jaccard verify threshold is
        # unchanged, so precision semantics are identical
        return dup_groups(
            ds, num_partitions=4,
            stage_kwargs={"n_bands": 32, "rows_per_band": 4},
        )

    def ann_ivf(sf_dir: str):
        import pyarrow.parquet as pq
        import ray.data as rd

        from zensearch_ray.stages.ann import ivf_topk_dist

        probe = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", 0)],
        )["embedding"].to_pylist()[0]
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return ivf_topk_dist(ds, probe, k=10)

    def ann_persisted(sf_dir: str):
        # persisted IVF lifecycle: build-once artifact (cached per sf
        # dir), query reads ONLY the probed-list partitions
        import pandas as pd
        import pyarrow.parquet as pq

        from zensearch_ray.pipelines.vector import (
            VectorIndex,
            vector_index_dir_for,
        )

        d = vector_index_dir_for(sf_dir)
        probe = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", 0)],
        )["embedding"].to_pylist()[0]
        import numpy as np

        ids, sims = VectorIndex(d).search(np.asarray(probe), k=10, nprobe=4)
        return pd.DataFrame({"vec_id": ids, "sim": sims})

    def ann_sq8(sf_dir: str):
        # int8 scalar-quantized IVF: 8x smaller partitions, asymmetric
        # (approximate) distance — rows-only by construction
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from zensearch_ray.pipelines.vector import (
            VectorIndex,
            vector_index_dir_for,
        )

        d = vector_index_dir_for(sf_dir, quant="sq8")
        probe = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", 0)],
        )["embedding"].to_pylist()[0]
        ids, sims = VectorIndex(d).search(np.asarray(probe), k=10, nprobe=4)
        return pd.DataFrame({"vec_id": ids, "sim": sims})

    def embedding_multi(sf_dir: str):
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from zensearch_ray.stages.ann import cosine_topk_multi

        probes = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", N_MULTI_PROBES)],
        )
        order = np.argsort(probes["vec_id"].to_numpy())
        ids = probes["vec_id"].to_numpy()[order]
        mat = np.array(probes["embedding"].to_pylist(), dtype=np.float64)[order]
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return cosine_topk_multi(ds, mat, ids, k=10)

    def embedding_hard_negatives(sf_dir: str):
        # hard-negative mining: per probe, the top-k most-similar
        # vectors with a DIFFERENT label (self excluded) — the
        # contrastive-training near-miss set (DPR-style)
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from zensearch_ray.stages.ann import hard_negatives

        probes = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
            filters=[("vec_id", "<", N_MULTI_PROBES)],
        )
        order = np.argsort(probes["vec_id"].to_numpy())
        ids = probes["vec_id"].to_numpy()[order]
        labels = probes["label"].to_numpy()[order]
        mat = np.array(probes["embedding"].to_pylist(), dtype=np.float64)[order]
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        return hard_negatives(ds, mat, ids, labels, k=10)

    def embedding_triplets(sf_dir: str):
        # contrastive triplet mining: per anchor probe, top-5 same-label
        # positives and top-10 different-label hard negatives, self
        # excluded — one streaming pass emits both roles
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from zensearch_ray.stages.ann import contrastive_triplets

        probes = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
            filters=[("vec_id", "<", N_MULTI_PROBES)],
        )
        order = np.argsort(probes["vec_id"].to_numpy())
        ids = probes["vec_id"].to_numpy()[order]
        labels = probes["label"].to_numpy()[order]
        mat = np.array(probes["embedding"].to_pylist(), dtype=np.float64)[order]
        ds = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        return contrastive_triplets(ds, mat, ids, labels, k_pos=5, k_neg=10)

    def media_features(sf_dir: str):
        import ray.data as rd

        from zensearch_ray.stages.multimodal import (
            MediaFeatureStage,
            synthesize_media_table,
        )

        media = rd.from_arrow(synthesize_media_table(200, seed=42))
        return media.map_batches(
            MediaFeatureStage, batch_format="pyarrow", batch_size=32,
            concurrency=(1, 4),
        )

    def image_phash(sf_dir: str):
        # image near-dup: pHash fingerprints (actor pool) → the shared
        # SimHash pigeonhole band exchange; planted-dup table so the
        # rows-only gate sees real pairs
        import ray.data as rd

        from zensearch_ray.stages.multimodal import (
            phash_near_dups,
            synthesize_image_dup_table,
        )

        media = rd.from_arrow(
            synthesize_image_dup_table(40, seed=7, dups_per_base=1)
        )
        return phash_near_dups(media, max_hamming=8, n_bands=9)

    def audio_fp(sf_dir: str):
        # audio near-dup: energy-grid fingerprints → the same shared
        # pigeonhole band exchange as text SimHash / image pHash
        import ray.data as rd

        from zensearch_ray.stages.multimodal import (
            audio_near_dups,
            synthesize_audio_dup_table,
        )

        media = rd.from_arrow(
            synthesize_audio_dup_table(40, seed=13, dups_per_base=1)
        )
        return audio_near_dups(media, max_hamming=6, n_bands=7)

    def video_fp(sf_dir: str):
        # video near-dup: frame-majority pHash over MJPEG-AVI; dups are
        # the same footage re-encoded at a different JPEG quality
        import ray.data as rd

        from zensearch_ray.stages.multimodal import (
            synthesize_video_dup_table,
            video_near_dups,
        )

        media = rd.from_arrow(
            synthesize_video_dup_table(20, seed=23, dups_per_base=1)
        )
        return video_near_dups(media, max_hamming=8, n_bands=9)

    def media_frames(sf_dir: str):
        import pyarrow.compute as pc
        import ray.data as rd

        from zensearch_ray.stages.multimodal import (
            FrameSampleStage,
            synthesize_media_table,
        )

        media = rd.from_arrow(synthesize_media_table(200, seed=42))
        videos = media.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], "video")), batch_format="pyarrow"
        )
        return videos.map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"every_ms": 5000, "max_frames": 8},
            batch_format="pyarrow", batch_size=16, concurrency=(1, 4),
        )

    return {
        # full-text engine (SURVEY.md §2.2/2.5/2.6/2.8)
        "doc_stats": corpus.doc_stats,
        "corpus_stats": corpus.corpus_stats,
        "term_df": corpus.term_df,
        "term_tf": corpus.term_tf,
        "bm25_topk": bm25,
        "federated_topk": federated,
        "bm25_topk_pruned": bm25_pruned,
        "bm25_topk_bmw": bm25_bmw,
        "bm25_topk_and": bm25_and,
        "bm25_topk_page2": bm25_page2,
        "bm25_topk_boosted": bm25_boosted,
        "bm25_topk_msm": bm25_msm,
        "bm25_topk_dismax": bm25_dismax,
        "tfidf_topk": tfidf,
        "lmd_topk": lmd,
        "lmjm_topk": lmjm,
        "bm25plus_topk": bm25plus,
        "boosting_topk": boosting,
        "spanfirst_topk": spanfirst,
        "bm25_topk_deleted": bm25_deleted,
        "bm25_topk_purged": bm25_purged,
        "bm25_topk_filtered": bm25_filtered,
        "bm25f_topk": bm25f,
        "bool_topk": boolq,
        "wildcard_topk": wildcard,
        "regex_topk": regexq,
        "bm25_topk_collapsed": collapsed,
        "bm25_topk_stop": stop,
        "bm25_topk_stem": stemq,
        "bm25_topk_reindexed": restemq,
        "bm25_topk_synfold": synfoldq,
        "bm25_topk_range": rng,
        "bm25_topk_fvf": fvf,
        "bm25_topk_decay_gauss": decay_gauss,
        "bm25_topk_decay_linear": decay_linear,
        "bm25_topk_random": random_scored,
        "bm25_topk_rescored": rescored,
        "bm25_topk_syn": syn,
        "per_facet_topk": per_facet,
        "doc_lm_score": lm,
        "dsir_weights": _dsir,
        "quality_classifier": _quality_clf,
        # distributed PCA: rows-only (eigendecomposition isn't SQL;
        # exactness pinned by the local-referee identity test)
        "embedding_pca": _emb_pca,
        "doc_bigram_lm": corpus.doc_bigram_lm,
        "doc_trigram_lm": corpus.doc_trigram_lm,
        "match_stats": mstats,
        "match_histogram": _match_hist,
        "match_cardinality": _match_card,
        "match_percentiles": _match_pct,
        "term_vectors": _tvecs,
        "dump_postings": dump,
        "percolate": percolate_docs,
        "facet_counts": facets,
        "doc_keywords": keywords,
        "hybrid_rrf": hybrid,
        "phrase_topk": phrase,
        "phrase_topk_pos": phrase_pos,
        "phrase_prefix_topk": phrase_prefix,
        "near_topk": near,
        "seq_topk": seq,
        "prefix_topk": prefix,
        "fuzzy_topk": fuzzy,
        "fuzzy2_topk": fuzzy2,
        "did_you_mean": dym,
        "suggest_phrase": suggest_phrase_q,
        "autocomplete": complete,
        "significant_terms": sig_terms,
        "explain_topk": explain,
        "balanced_shards": bshards,
        "docs_shuffled": shuffled,
        "not_topk": notq,
        "more_like_this": mlt,
        "search_snippets": snippets,
        "top_bigrams": bigrams,
        "pmi_bigrams": pmi,
        "cooc_window": cooc,
        "grep_docs": grep,
        "extract_pattern": extractp,
        "dup_ngram_rate": ngram_rate,
        "span_dedup": span_dedup_docs,
        "exact_substr_dedup": exact_substr_docs,
        "decontaminate": decon,
        # exact distributed quantiles (no-sort selection; scalar form
        # is the pre-existing lineitem_quantiles entry)
        "price_quantiles_by_flag": price_quantiles_by_flag,
        "quality_percentile_filter": corpus.quality_percentile_filter,
        # dedup family
        "append_near_dedup": corpus.append_near_dedup,
        "exact_dedup": corpus.exact_dedup,
        "minhash_dup_groups": minhash_groups,
        "simhash": simhash,
        "simhash_near_pairs": simhash_pairs,
        "jaccard_topk": jaccard,
        # text analysis
        "docs_prepared": corpus.docs_prepared,
        "docs_chunked": corpus.docs_chunked,
        "pack_sequences": corpus.pack_sequences,
        "lang_balanced_sample": corpus.lang_balanced_sample,
        "bpe_token_counts": corpus.bpe_token_counts,
        "bpe_merges": bpe_merges,
        "unigram_vocab": unigram_vocab,
        "unigram_pieces": unigram_pieces,
        "bpe_pieces": bpe_pieces,
        "token_quality": token_quality,
        "gopher_filter": gopher_filter,
        "doc_repetition": doc_repetition,
        "doc_fingerprint": fingerprint,
        "lang_id": lang_id,
        "scrub_text": scrub,
        "docs_split": corpus.docs_split,
        "docs_sample": corpus.docs_sample,
        "temperature_sample": corpus.temperature_sample,
        "source_quality_gate": corpus.source_quality_gate,
        "ccnet_buckets": corpus.ccnet_buckets,
        "source_cap": corpus.source_cap,
        "frontier_delta": _frontier_delta_entry,
        "lang_source_counts": corpus.lang_source_counts,
        # similarity search
        "embedding_topk": embedding_topk,
        "embedding_topk_filtered": embedding_topk_filtered,
        "embedding_mmr_topk": embedding_mmr,
        "embedding_kmeans": embedding_kmeans,
        "embedding_near_dup": embedding_near_dup,
        "ann_ivf_topk": ann_ivf,
        "ann_ivf_persisted": ann_persisted,
        "ann_ivf_sq8": ann_sq8,
        "warc_ingest": warc_ingest,
        "ranking_eval": ranking_eval,
        # relational / streaming-shaped (SURVEY.md §2.4/2.6/2.7)
        "lineitem_pricing": relational.lineitem_pricing,
        "shipping_priority": relational.shipping_priority,
        "local_supplier_volume": relational.local_supplier_volume,
        "large_volume_customers": relational.large_volume_customers,
        "top_orders": lambda sf: relational.top_orders(sf, 10),
        "customers_without_orders": relational.customers_without_urgent_orders,
        "orders_per_nation": relational.orders_per_nation,
        "events_hourly": relational.events_hourly,
        "events_hourly_derivative": relational.events_hourly_derivative,
        "pricing_rollup": relational.pricing_rollup,
        "pricing_cube": relational.pricing_cube,
        "customer_order_histogram": relational.customer_order_histogram,
        "late_shipment_priority": relational.late_shipment_priority,
        "promo_revenue": relational.promo_revenue,
        "discounted_revenue": relational.discounted_revenue,
        "returned_item_revenue": relational.returned_item_revenue,
        "sales_opportunity": relational.sales_opportunity,
        "lineitem_range_sorted": sort_pipeline.lineitem_range_sorted,
        "forecast_revenue_change": relational.forecast_revenue_change,
        "volume_shipping": relational.volume_shipping,
        "top_supplier": relational.top_supplier,
        "small_quantity_revenue": relational.small_quantity_revenue,
        "market_share": relational.market_share,
        "sole_late_suppliers": relational.sole_late_suppliers,
        "lineitem_moments": relational.lineitem_moments,
        # windowed / ordered custom operators (pipelines/windows.py)
        "events_hopping": windows.events_hopping,
        "events_value_ranks": windows.events_value_ranks,
        "events_value_percentiles": windows.events_value_percentiles,
        "events_sessionize": windows.events_sessionize,
        "events_asof_orders": windows.events_asof_orders,
        "top_event_per_user": windows.top_event_per_user,
        "events_props_agg": windows.events_props_agg,
        # analytics family (pipelines/analytics.py): distinct, range
        # join, running windows, grouped top-N, sampling, quantiles
        "events_user_running": analytics.events_user_running,
        "events_funnel": analytics.events_funnel,
        "events_retention": analytics.events_retention,
        "events_lag": analytics.events_lag,
        "events_range_join": analytics.events_range_join,
        # co-partitioned fact×fact shuffle join (pipelines/joins.py)
        "order_lineitem_join": joins.order_lineitem_join,
        # bloom-pruned exact semi/anti joins (stages/bloom.py): the
        # scale path when the build-side key set is too big to
        # broadcast exactly — results are exact (fp re-verified), so
        # both carry full SQL oracles
        "parts_ordered_heavy": lambda sf: bloom.parts_ordered_heavy(sf, anti=False),
        "parts_never_ordered_heavy": lambda sf: bloom.parts_ordered_heavy(sf, anti=True),
        "events_daily_active": analytics.events_daily_active,
        "events_value_histogram": analytics.events_value_histogram,
        "events_anomaly": analytics.events_anomaly,
        # HLL sketch twin of events_daily_active: constant exchange
        # volume per group (2^p-byte registers), ~1.6% std error —
        # approximate by design, so no value-hash oracle (rows-only
        # driver check; accuracy asserted vs exact in test_sketch.py)
        "events_daily_active_hll": sketch.events_daily_active_hll,
        # CMS point counts: rows-only by design (approximate,
        # one-sided error <= (e/width)*N — bounds pinned in tests)
        "term_counts_cms": sketch.term_counts_cms,
        # two-phase exact heavy hitters: bounded candidate exchange
        # (pigeonhole bound), exact verified counts → full SQL oracle
        "heavy_terms": sketch.heavy_terms,
        "top3_events_per_user": lambda sf: analytics.topn_events_per_user(sf, 3),
        "events_sample": analytics.events_sample,
        "lineitem_quantiles": analytics.lineitem_quantiles,
        "lineitem_quantiles_approx": _quantiles_approx,
        "embedding_multi_topk": embedding_multi,
        "hard_negatives": embedding_hard_negatives,
        "contrastive_triplets": embedding_triplets,
        # multimodal plumbing (stubbed codec, real pipeline)
        "media_features": media_features,
        "media_frames": media_frames,
        "image_phash_dups": image_phash,
        "audio_fp_dups": audio_fp,
        "video_fp_dups": video_fp,
        # graph family (stages/graph.py): edge extraction + weighted
        # PageRank (broadcast-ranks iterations over object-store edge
        # blocks) + connected components over the near-dup pair graph
        "event_transitions": analytics.event_transitions,
        "event_pagerank": analytics.event_pagerank,
        "term_pagerank": corpus.term_pagerank,
        "embedding_dup_components": embedding_dup_components,
        "semantic_dedup": semdedup,
    }


# --- PageRank oracle generation (graph family) -----------------------
# Both oracles share one generator that UNROLLS the fixed iteration
# count into chained CTEs — the pinned semantics live in one place
# (stages/graph.py module docstring) and the SQL is produced from them.

_EVENT_EDGES_CTE = """
    edges AS MATERIALIZED (
        WITH seq AS (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        )
        SELECT prev AS src, event_type AS dst, count(*)::DOUBLE AS w
        FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
    )
"""

_TERM_EDGES_CTE = f"""
    edges AS MATERIALIZED (
        WITH tp AS (
            SELECT doc_id, unnest(tl) AS term,
                   generate_subscripts(tl, 1) AS p
            FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
        )
        SELECT a.term AS src, b.term AS dst, count(*)::DOUBLE AS w
        FROM tp a JOIN tp b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        GROUP BY a.term, b.term
    )
"""


def _pagerank_sql(edges_cte: str, node_alias: str, iters: int = 20,
                  damping: float = 0.85, limit: int | None = None) -> str:
    """Unrolled damped-PageRank SQL over an ``edges(src, dst, w)`` CTE:
    r_{{i+1}}(v) = (1-d)/|V| + d·(Σ_{{u→v}} r_i(u)·w/out(u) + dangling_i/|V|),
    exactly the pinned semantics of ``stages/graph.py:pagerank``. The
    final SELECT orders by the ROUNDED value (+ node tiebreak) so float
    summation order cannot flip ranks between engines."""
    d = repr(damping)
    steps = []
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        steps.append(f"""
    r{i} AS MATERIALIZED (
        SELECT n.node,
               (1.0 - {d}) / (SELECT v FROM nv)
               + {d} * (coalesce(c.contrib, 0)
                        + (SELECT coalesce(sum(p.r), 0) FROM {p} p
                           WHERE p.node NOT IN (SELECT src FROM outw))
                          / (SELECT v FROM nv)) AS r
        FROM nodes n
        LEFT JOIN (SELECT e.dst AS node, sum(p.r * e.w / o.tot) AS contrib
                   FROM edges e
                   JOIN {p} p ON p.node = e.src
                   JOIN outw o ON o.src = e.src
                   GROUP BY e.dst) c ON c.node = n.node
    )""")
    lim = f" LIMIT {limit}" if limit else ""
    return f"""
        WITH {edges_cte},
        nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        nv AS MATERIALIZED (SELECT count(*)::DOUBLE AS v FROM nodes),
        outw AS MATERIALIZED (SELECT src, sum(w) AS tot FROM edges GROUP BY src),
        r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT v FROM nv) AS r FROM nodes),
        {",".join(steps)}
        SELECT row_number() OVER (
                   ORDER BY round(r, 6) DESC, node)::BIGINT AS rank,
               node AS {node_alias}, round(r, 6) AS pagerank
        FROM r{iters}
        ORDER BY round(r, 6) DESC, node{lim}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "doc_stats": (
            f"SELECT doc_id, len({_TOKLIST})::BIGINT AS doc_len FROM documents"
        ),
        "corpus_stats": f"""
            WITH d AS (SELECT len({_TOKLIST}) AS dl FROM documents)
            SELECT count(*)::BIGINT AS n_docs,
                   sum(dl)::BIGINT AS total_tokens,
                   round(sum(dl)::DOUBLE / count(*), 6) AS avgdl
            FROM d
        """,
        "term_df": f"""
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM ({_TOKS}) GROUP BY term
        """,
        "term_tf": f"""
            SELECT doc_id, term, count(*)::BIGINT AS tf
            FROM ({_TOKS}) GROUP BY doc_id, term
        """,
        "bm25_topk": _bm25_sql(),
        "federated_topk": _bm25_sql(),
        "bm25_topk_pruned": _bm25_sql(),
        "bm25_topk_bmw": _bm25_sql(),
        "bm25_topk_page2": _bm25_page2_sql(),
        "bm25_topk_boosted": _bm25_boosted_sql(),
        "bm25_topk_msm": _bm25_msm_sql(),
        "bm25_topk_dismax": _bm25_dismax_sql(),
        "tfidf_topk": _tfidf_sql(),
        "lmd_topk": _lmd_sql(),
        "lmjm_topk": _lmjm_sql(),
        "bm25plus_topk": _bm25plus_sql(),
        "boosting_topk": _boosting_sql(),
        "spanfirst_topk": _spanfirst_sql(),
        "bm25f_topk": _bm25f_sql(),
        "bool_topk": _bool_sql(BOOL_QUERY),
        "wildcard_topk": _wildcard_sql(WILDCARD_QUERY),
        "regex_topk": _regex_sql(REGEX_QUERY),
        "bm25_topk_collapsed": _collapsed_sql(),
        "bm25_topk_stop": _stopword_sql(),
        "bm25_topk_stem": _stem_sql(),
        # the reindexed (postings-derived) stem index must answer
        # identically to the from-corpus stem build — same oracle
        "bm25_topk_reindexed": _stem_sql(),
        "bm25_topk_synfold": _synfold_sql(),
        "bm25_topk_range": _range_sql(),
        "bm25_topk_fvf": _fvf_sql(),
        "bm25_topk_decay_gauss": _decay_sql("gauss"),
        "bm25_topk_decay_linear": _decay_sql("linear"),
        "bm25_topk_random": _random_sql(),
        "bm25_topk_rescored": _rescore_sql(),
        "bm25_topk_syn": _synonyms_sql(),
        "per_facet_topk": _per_facet_sql(),
        "doc_lm_score": _lm_score_sql(),
        "dsir_weights": _dsir_sql(),
        "ccnet_buckets": f"""
            SELECT doc_id, lm_score,
                   ntile(3) OVER (ORDER BY lm_score DESC, doc_id)::BIGINT
                       AS tile
            FROM ({_lm_score_sql()})
        """,
        "doc_bigram_lm": """
            WITH docs AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '')
                           AS toks
                FROM documents
            ),
            toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
            uni AS (SELECT term, count(*)::DOUBLE AS c FROM toks
                    GROUP BY term),
            tot AS (SELECT count(*)::DOUBLE AS t FROM toks),
            pairs AS (
                SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
                FROM docs, unnest(range(1, len(toks))) AS r(i)
            ),
            big AS (
                SELECT w1, w2, count(*)::DOUBLE AS c12
                FROM pairs GROUP BY w1, w2 HAVING count(*) >= 2
            )
            SELECT p.doc_id,
                   round(avg(
                       CASE WHEN b.c12 IS NOT NULL THEN ln(b.c12 / u1.c)
                            ELSE ln(0.4 * u2.c / (SELECT t FROM tot)) END
                   ), 6) AS bigram_lm
            FROM pairs p
            LEFT JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
            JOIN uni u1 ON p.w1 = u1.term
            JOIN uni u2 ON p.w2 = u2.term
            GROUP BY p.doc_id
        """,
        "doc_trigram_lm": """
            WITH docs AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '')
                           AS toks
                FROM documents
            ),
            toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
            uni AS (SELECT term, count(*)::DOUBLE AS c FROM toks
                    GROUP BY term),
            tot AS (SELECT count(*)::DOUBLE AS t FROM toks),
            pairs AS (
                SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
                FROM docs, unnest(range(1, len(toks))) AS r(i)
            ),
            big AS (
                SELECT w1, w2, count(*)::DOUBLE AS c12
                FROM pairs GROUP BY w1, w2 HAVING count(*) >= 2
            ),
            wins AS (
                SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
                       toks[i + 2] AS w3
                FROM docs, unnest(range(1, len(toks) - 1)) AS r(i)
            ),
            tri AS (
                SELECT w1, w2, w3, count(*)::DOUBLE AS c123
                FROM wins GROUP BY w1, w2, w3 HAVING count(*) >= 2
            )
            SELECT w.doc_id,
                   round(avg(
                       CASE WHEN t.c123 IS NOT NULL
                                THEN ln(t.c123 / b12.c12)
                            WHEN b23.c12 IS NOT NULL
                                THEN ln(0.4) + ln(b23.c12 / u2.c)
                            ELSE 2 * ln(0.4)
                                 + ln(u3.c / (SELECT t FROM tot)) END
                   ), 6) AS trigram_lm
            FROM wins w
            LEFT JOIN tri t
                ON w.w1 = t.w1 AND w.w2 = t.w2 AND w.w3 = t.w3
            LEFT JOIN big b12 ON w.w1 = b12.w1 AND w.w2 = b12.w2
            LEFT JOIN big b23 ON w.w2 = b23.w1 AND w.w3 = b23.w2
            JOIN uni u2 ON w.w2 = u2.term
            JOIN uni u3 ON w.w3 = u3.term
            GROUP BY w.doc_id
        """,
        "match_stats": _match_stats_sql(),
        "match_histogram": _match_histogram_sql(),
        "match_cardinality": _match_cardinality_sql(),
        "match_percentiles": _match_percentiles_sql(),
        "term_vectors": _term_vectors_sql(),
        "dump_postings": _dump_postings_sql(),
        "percolate": _percolate_sql(PERCOLATE_QUERIES),
        "bm25_topk_and": _bm25_and_sql(),
        "bm25_topk_deleted": _bm25_deleted_sql(),
        "bm25_topk_purged": _bm25_purged_sql(),
        "bm25_topk_filtered": _bm25_filtered_sql(),
        "facet_counts": _facet_counts_sql(),
        "hybrid_rrf": _hybrid_rrf_sql(),
        "doc_keywords": f"""
            WITH toks AS ({_TOKS}),
            stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
            tf AS (
                SELECT doc_id, term, count(*)::DOUBLE AS tf
                FROM toks GROUP BY doc_id, term
            ),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            w AS (
                SELECT tf.doc_id, tf.term,
                       tf.tf * ln((SELECT n FROM stats) / df.df) AS w
                FROM tf JOIN df USING (term)
                WHERE df.df < (SELECT n FROM stats)
            ),
            r AS (
                SELECT doc_id, term, w,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY w DESC, term) AS rn
                FROM w
            )
            SELECT doc_id, rn::BIGINT AS rank, term, round(w, 6) AS weight
            FROM r WHERE rn <= 5
        """,
        "phrase_topk": _phrase_sql(),
        "phrase_topk_pos": _phrase_sql(),
        "phrase_prefix_topk": _phrase_prefix_sql(),
        "near_topk": _near_sql(),
        "seq_topk": _seq_sql(),
        "prefix_topk": _prefix_sql(),
        "fuzzy_topk": _fuzzy_sql(),
        "fuzzy2_topk": _fuzzy_sql(dist=2),
        "did_you_mean": _dym_sql(),
        "suggest_phrase": _phrase_suggest_sql(),
        "autocomplete": f"""
            WITH toks AS ({_TOKS})
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM toks WHERE term LIKE '{COMPLETE_PREFIX}%'
            GROUP BY term ORDER BY df DESC, term LIMIT 10
        """,
        "significant_terms": f"""
            WITH toks AS ({_TOKS}),
            qt(term) AS (VALUES ('hash'), ('join')),
            fg AS (SELECT DISTINCT doc_id FROM toks JOIN qt USING (term)),
            nfg AS (SELECT count(*)::DOUBLE AS v FROM fg),
            nd AS (SELECT count(*)::DOUBLE AS v FROM documents),
            bg AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df_bg
                   FROM toks GROUP BY term),
            f AS (SELECT term, count(DISTINCT t.doc_id)::DOUBLE AS df_fg
                  FROM toks t JOIN fg USING (doc_id) GROUP BY term),
            scored AS (
                SELECT f.term, f.df_fg, bg.df_bg,
                       round((f.df_fg / (SELECT v FROM nfg)
                              - bg.df_bg / (SELECT v FROM nd))
                             * ((f.df_fg / (SELECT v FROM nfg))
                                / (bg.df_bg / (SELECT v FROM nd))), 6)
                           AS score
                FROM f JOIN bg USING (term)
                WHERE f.df_fg >= {SIG_MIN_FG_DF}
                  AND f.term NOT IN (SELECT term FROM qt)
            )
            SELECT term, df_fg::BIGINT AS df_fg, df_bg::BIGINT AS df_bg,
                   score
            FROM scored ORDER BY score DESC, term LIMIT 25
        """,
        "explain_topk": f"""
            WITH toks AS ({_TOKS}),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks
                   GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                             (SELECT avg(dl) FROM dl) AS avgdl),
            qterms(term) AS {_BM25_VALUES},
            tf AS (
                SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
                FROM toks t JOIN qterms q USING (term)
                GROUP BY t.term, t.doc_id
            ),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf
                   GROUP BY term),
            contrib AS (
                SELECT tf.doc_id, tf.term, df.df, tf.tf, dl.dl,
                       ln((SELECT n FROM stats) / df.df) AS idf,
                       (tf.tf * 2.2) /
                       (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 *
                        (dl.dl / (SELECT avgdl FROM stats)))) AS tfn
                FROM tf
                JOIN df USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
                WHERE df.df < (SELECT n FROM stats)
            ),
            scored AS (SELECT doc_id, sum(idf * tfn) AS score
                       FROM contrib GROUP BY doc_id),
            topd AS (SELECT doc_id FROM scored WHERE score > 0
                     ORDER BY score DESC, doc_id LIMIT 10)
            SELECT c.doc_id, c.term, c.df::BIGINT AS df,
                   c.tf::BIGINT AS tf, c.dl::BIGINT AS dl,
                   round(c.idf, 6) AS idf, round(c.tfn, 6) AS tf_norm,
                   round(c.idf * c.tfn, 6) AS contribution
            FROM contrib c JOIN topd USING (doc_id)
        """,
        "docs_shuffled": """
            WITH keyed AS (
                SELECT doc_id,
                       md5('r3:' || doc_id::VARCHAR) AS shuffle_key
                FROM documents
            ),
            sharded AS (
                SELECT doc_id, shuffle_key,
                       ((strpos('0123456789abcdef',
                                substr(shuffle_key, 32, 1)) - 1) % 8)::BIGINT
                           AS shard
                FROM keyed
            )
            SELECT doc_id, shuffle_key, shard,
                   row_number() OVER (
                       PARTITION BY shard ORDER BY shuffle_key, doc_id
                   )::BIGINT AS pos
            FROM sharded
        """,
        "balanced_shards": f"""
            WITH toks AS ({_TOKS}),
            dlen AS (SELECT doc_id, count(*)::BIGINT AS dl
                     FROM toks GROUP BY doc_id),
            docs AS (
                SELECT d.doc_id, coalesce(dlen.dl, 0)::BIGINT AS dl
                FROM documents d LEFT JOIN dlen ON d.doc_id = dlen.doc_id
            ),
            pre AS (
                SELECT doc_id, dl,
                       coalesce(sum(dl) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0)::BIGINT AS cum
                FROM docs
            ),
            tot AS (SELECT greatest(sum(dl), 1)::BIGINT AS t FROM docs)
            SELECT doc_id, dl,
                   least(cum * {N_BALANCED_SHARDS} // t,
                         {N_BALANCED_SHARDS} - 1)::BIGINT AS shard
            FROM pre, tot ORDER BY doc_id
        """,
        "not_topk": _not_sql(),
        "more_like_this": _mlt_sql(),
        "search_snippets": _snippets_sql(),
        "dup_ngram_rate": f"""
            WITH dt AS (
                SELECT doc_id, {_TOKLIST} AS tl FROM documents
            ),
            x AS (
                SELECT doc_id, tl,
                       unnest(range(1, CAST(len(tl) AS BIGINT) - 8 + 2)) AS i
                FROM dt WHERE len(tl) >= 8
            ),
            ng AS (
                SELECT doc_id,
                       array_to_string(
                           tl[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' '
                       ) AS g
                FROM x
            ),
            gc AS (SELECT g, count(*) AS gcnt FROM ng GROUP BY g),
            d AS (
                SELECT ng.doc_id,
                       count(*)::BIGINT AS n_ngrams,
                       sum(CASE WHEN gc.gcnt > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup
                FROM ng JOIN gc USING (g) GROUP BY ng.doc_id
            )
            SELECT doc_id, n_ngrams, n_dup,
                   round(n_dup::DOUBLE / n_ngrams, 6) AS dup_rate
            FROM d
        """,
        "span_dedup": f"""
            WITH t AS (
                SELECT doc_id, {_TOKLIST} AS toks FROM documents
            ),
            x AS (
                SELECT doc_id, toks,
                       unnest(range(0, (CAST(len(toks) AS BIGINT) - 1) // 8 + 1))
                           AS i
                FROM t WHERE len(toks) > 0
            ),
            sp AS (
                SELECT doc_id, i::BIGINT AS span_idx,
                       array_to_string(
                           toks[CAST(i*8+1 AS BIGINT):CAST((i+1)*8 AS BIGINT)],
                           ' '
                       ) AS span
                FROM x
            ),
            m AS (
                SELECT doc_id, span_idx, span,
                       count(*) OVER (PARTITION BY span) AS cnt,
                       row_number() OVER (PARTITION BY span
                                          ORDER BY doc_id, span_idx) AS rn
                FROM sp
            ),
            keep AS (
                SELECT doc_id, span_idx, span FROM m WHERE cnt = 1 OR rn = 1
            ),
            stats AS (
                SELECT doc_id,
                       (CASE WHEN len(toks) = 0 THEN 0
                             ELSE (CAST(len(toks) AS BIGINT) - 1) // 8 + 1
                        END)::BIGINT AS n_spans
                FROM t
            ),
            ka AS (
                SELECT doc_id,
                       string_agg(span, ' ' ORDER BY span_idx) AS text,
                       count(*)::BIGINT AS n_kept
                FROM keep GROUP BY doc_id
            )
            SELECT s.doc_id, coalesce(k.text, '') AS text, s.n_spans,
                   (s.n_spans - coalesce(k.n_kept, 0))::BIGINT AS n_removed
            FROM stats s LEFT JOIN ka k USING (doc_id)
        """,
        "exact_substr_dedup": f"""
            WITH t AS (
                SELECT doc_id, {_TOKLIST} AS toks FROM documents
            ),
            tk AS (
                SELECT doc_id, i - 1 AS pos, toks[i] AS tok
                FROM t,
                     unnest(range(1, CAST(len(toks) AS BIGINT) + 1)) AS r(i)
            ),
            g AS (
                SELECT doc_id, i - 1 AS pos,
                       array_to_string(
                           toks[CAST(i AS BIGINT):CAST(i + {EXACT_SUBSTR_L} - 1 AS BIGINT)],
                           ' '
                       ) AS gram
                FROM t,
                     unnest(range(1, CAST(len(toks) AS BIGINT)
                                      - {EXACT_SUBSTR_L} + 2)) AS r(i)
                WHERE len(toks) >= {EXACT_SUBSTR_L}
            ),
            m AS (
                SELECT doc_id, pos,
                       count(*) OVER (PARTITION BY gram) AS cnt,
                       row_number() OVER (PARTITION BY gram
                                          ORDER BY doc_id, pos) AS rn
                FROM g
            ),
            losers AS (SELECT doc_id, pos FROM m WHERE cnt > 1 AND rn > 1),
            cov AS (
                SELECT DISTINCT l.doc_id, l.pos + u.j AS cpos
                FROM losers l, unnest(range(0, {EXACT_SUBSTR_L})) AS u(j)
            ),
            kept AS (
                SELECT tk.doc_id, tk.pos, tk.tok
                FROM tk LEFT JOIN cov
                  ON tk.doc_id = cov.doc_id AND tk.pos = cov.cpos
                WHERE cov.doc_id IS NULL
            ),
            ka AS (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
                       count(*)::BIGINT AS n_kept
                FROM kept GROUP BY doc_id
            ),
            stats AS (
                SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t
            )
            SELECT s.doc_id, coalesce(k.text, '') AS text, s.n_tokens,
                   (s.n_tokens - coalesce(k.n_kept, 0))::BIGINT AS n_removed
            FROM stats s LEFT JOIN ka k USING (doc_id)
        """,
        "price_quantiles_by_flag": f"""
            SELECT l_returnflag,
                   unnest({_QLIST_SQL}) AS q,
                   unnest(quantile_disc(l_extendedprice, {_QLIST_SQL})) AS value
            FROM lineitem GROUP BY l_returnflag
        """,
        "quality_percentile_filter": f"""
            WITH t AS (SELECT doc_id, {_TOKLIST} AS toks FROM documents),
            s AS (
                SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                       round(len(list_filter(toks, x ->
                                 list_contains({_STOPLIST_SQL}, x)))::DOUBLE
                             / len(toks), 6) AS stop_ratio
                FROM t
            ),
            thr AS (SELECT quantile_disc(stop_ratio, 0.75) AS v FROM s)
            SELECT doc_id, n_tokens, stop_ratio FROM s, thr
            WHERE stop_ratio <= v
        """,
        "decontaminate": f"""
            WITH dt AS (
                SELECT doc_id, {_TOKLIST} AS tl FROM documents
            ),
            bx AS (
                SELECT tl, unnest(range(1, CAST(len(tl) AS BIGINT) - 8 + 2)) AS i
                FROM dt WHERE doc_id < {DECON_BENCH_DOCS} AND len(tl) >= 8
            ),
            bg AS (
                SELECT DISTINCT array_to_string(
                    tl[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' '
                ) AS g FROM bx
            ),
            x AS (
                SELECT doc_id, tl,
                       unnest(range(1, CAST(len(tl) AS BIGINT) - 8 + 2)) AS i
                FROM dt WHERE doc_id >= {DECON_BENCH_DOCS} AND len(tl) >= 8
            ),
            ng AS (
                SELECT doc_id, array_to_string(
                    tl[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' '
                ) AS g FROM x
            ),
            ov AS (
                SELECT ng.doc_id, count(*)::BIGINT AS n_overlap
                FROM ng JOIN bg USING (g) GROUP BY ng.doc_id
            )
            SELECT d.doc_id,
                   greatest(CAST(len(d.tl) AS BIGINT) - 8 + 1, 0)::BIGINT AS n_ngrams,
                   coalesce(ov.n_overlap, 0)::BIGINT AS n_overlap,
                   coalesce(ov.n_overlap, 0) > 0 AS contaminated
            FROM dt d LEFT JOIN ov USING (doc_id)
            WHERE d.doc_id >= {DECON_BENCH_DOCS}
        """,
        "top_bigrams": f"""
            WITH tp AS (
                SELECT doc_id, unnest(tl) AS term,
                       generate_subscripts(tl, 1) AS p
                FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
            ),
            bg AS (
                SELECT a.term || ' ' || b.term AS bigram
                FROM tp a JOIN tp b
                ON a.doc_id = b.doc_id AND b.p = a.p + 1
            ),
            bc AS (SELECT bigram, count(*)::BIGINT AS cnt FROM bg GROUP BY bigram)
            SELECT row_number() OVER (ORDER BY cnt DESC, bigram)::BIGINT AS rank,
                   bigram, cnt
            FROM bc ORDER BY cnt DESC, bigram LIMIT 20
        """,
        "grep_docs": """
            SELECT doc_id,
                   len(regexp_extract_all(text, 'hash (join|scan)'))::BIGINT
                       AS n_matches
            FROM documents
            WHERE regexp_matches(text, 'hash (join|scan)')
            ORDER BY doc_id
        """,
        "extract_pattern": """
            SELECT doc_id,
                   regexp_extract(text, '(merge|sort) (join|scan|table)', 1)
                       AS verb,
                   regexp_extract(text, '(merge|sort) (join|scan|table)', 2)
                       AS obj
            FROM documents
            WHERE regexp_matches(text, '(merge|sort) (join|scan|table)')
            ORDER BY doc_id
        """,
        "cooc_window": f"""
            WITH tp AS (
                SELECT doc_id, unnest(tl) AS term,
                       generate_subscripts(tl, 1) AS p
                FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
            ),
            pr AS (
                SELECT l.term AS a, r.term AS b
                FROM tp l JOIN tp r
                ON l.doc_id = r.doc_id AND r.p > l.p AND r.p <= l.p + 3
            ),
            pcnt AS (SELECT a, b, count(*)::BIGINT AS cnt FROM pr GROUP BY a, b)
            SELECT row_number() OVER (ORDER BY cnt DESC, a, b)::BIGINT AS rank,
                   a, b, cnt
            FROM pcnt ORDER BY cnt DESC, a, b LIMIT 20
        """,
        "pmi_bigrams": f"""
            WITH tp AS (
                SELECT doc_id, unnest(tl) AS term,
                       generate_subscripts(tl, 1) AS p
                FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
            ),
            bg AS (
                SELECT a.term || ' ' || b.term AS bigram
                FROM tp a JOIN tp b
                ON a.doc_id = b.doc_id AND b.p = a.p + 1
            ),
            bc AS (SELECT bigram, count(*)::BIGINT AS cnt FROM bg GROUP BY bigram),
            uc AS (SELECT term, count(*)::DOUBLE AS ucnt FROM tp GROUP BY term),
            tot AS (SELECT (SELECT count(*) FROM tp)::DOUBLE AS u,
                           (SELECT sum(cnt) FROM bc)::DOUBLE AS b),
            f AS (
                SELECT bigram, cnt,
                       string_split(bigram, ' ')[1] AS w1,
                       string_split(bigram, ' ')[2] AS w2
                FROM bc WHERE cnt >= 5
            ),
            p AS (
                SELECT f.bigram, f.cnt,
                       round(ln(f.cnt * t.u * t.u / (t.b * u1.ucnt * u2.ucnt)), 6) AS pmi
                FROM f
                JOIN uc u1 ON u1.term = f.w1
                JOIN uc u2 ON u2.term = f.w2, tot t
            )
            SELECT row_number() OVER (ORDER BY pmi DESC, bigram)::BIGINT AS rank,
                   bigram, cnt, pmi
            FROM p ORDER BY pmi DESC, bigram LIMIT 20
        """,
        "exact_dedup": (
            "SELECT min(doc_id)::BIGINT AS doc_id, text FROM documents GROUP BY text"
        ),
        "ranking_eval": _ranking_eval_sql(),
        "warc_ingest": """
            SELECT 'https://docs.example.com/' || doc_id::VARCHAR AS url,
                   200::BIGINT AS status,
                   'text/html' AS mime,
                   octet_length(encode(
                       '<html><body><p>' || text || '</p></body></html>'
                   ))::BIGINT AS n_bytes
            FROM documents
        """,
        "jaccard_topk": f"""
            WITH toks AS (SELECT DISTINCT doc_id, term FROM ({_TOKS})),
            probe AS (SELECT term FROM toks WHERE doc_id = 0),
            psz AS (SELECT count(*)::DOUBLE AS c FROM probe),
            sz AS (SELECT doc_id, count(*)::DOUBLE AS c FROM toks GROUP BY doc_id),
            inter AS (
                SELECT t.doc_id, count(*)::DOUBLE AS i FROM toks t
                JOIN probe p USING (term) WHERE t.doc_id <> 0 GROUP BY t.doc_id
            ),
            j AS (
                SELECT s.doc_id,
                       round(COALESCE(i.i, 0) /
                             (s.c + (SELECT c FROM psz) - COALESCE(i.i, 0)), 6)
                       AS jaccard
                FROM sz s LEFT JOIN inter i USING (doc_id)
                WHERE s.doc_id <> 0
            )
            SELECT row_number() OVER (ORDER BY jaccard DESC, doc_id)::BIGINT AS rank,
                   doc_id, jaccard
            FROM j ORDER BY jaccard DESC, doc_id LIMIT 10
        """,
        "scrub_text": _scrub_sql(),
        "docs_split": _docs_split_sql(),
        "docs_sample": _docs_sample_sql(),
        "source_cap": _source_cap_sql(),
        "frontier_delta": _frontier_delta_sql(),
        "gopher_filter": f"""
            WITH toks AS ({_TOKS}),
            tf AS (
                SELECT doc_id, term, count(*)::BIGINT AS c
                FROM toks GROUP BY doc_id, term
            ),
            m AS (
                SELECT doc_id,
                       sum(c)::BIGINT AS n_words,
                       sum(c * length(term))::DOUBLE / sum(c) AS mwl_raw,
                       sum(CASE WHEN list_contains({_STOPLIST_SQL}, term)
                                THEN c ELSE 0 END)::BIGINT AS stopword_count,
                       max(c)::DOUBLE / sum(c) AS top_frac_raw
                FROM tf GROUP BY doc_id
            )
            SELECT doc_id,
                   n_words,
                   round(mwl_raw, 6) AS mean_word_len,
                   stopword_count,
                   round(top_frac_raw, 6) AS top_word_frac,
                   (CASE WHEN n_words BETWEEN 30 AND 50000
                          AND mwl_raw >= 3.0 AND mwl_raw <= 10.0
                          AND stopword_count >= 2
                          AND top_frac_raw <= 0.125
                         THEN 1 ELSE 0 END)::BIGINT AS keep
            FROM m
        """,
        "doc_repetition": _repetition_sql(),
        "token_quality": f"""
            WITH t AS (SELECT doc_id, {_TOKLIST} AS toks FROM documents)
            SELECT doc_id,
                   len(toks)::BIGINT AS n_tokens,
                   len(list_distinct(toks))::BIGINT AS n_unique,
                   round(len(list_filter(toks, x -> list_contains({_STOPLIST_SQL}, x)))::DOUBLE
                         / len(toks), 6) AS stop_ratio,
                   round(list_aggregate(list_transform(toks, x -> len(x)), 'sum')::DOUBLE
                         / len(toks), 6) AS mean_token_len
            FROM t
        """,
        "docs_prepared": f"""
            WITH kept AS (
                SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, text
                FROM documents GROUP BY text
            ),
            q AS (
                SELECT doc_id, {_TOKLIST} AS toks FROM kept WHERE lang = 'en'
            ),
            m AS (
                SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                       round(len(list_filter(toks, x ->
                                 list_contains({_STOPLIST_SQL}, x)))::DOUBLE
                             / len(toks), 6) AS stop_ratio
                FROM q WHERE len(toks) > 0
            )
            SELECT doc_id, n_tokens, stop_ratio FROM m
            WHERE n_tokens >= 40 AND stop_ratio <= 0.1
        """,
        "docs_chunked": f"""
            WITH t AS (SELECT doc_id, {_TOKLIST} AS toks FROM documents),
            c AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
            x AS (SELECT doc_id, toks, n,
                         unnest(range(0, CAST((n-1)//50 AS BIGINT) + 1)) AS i
                  FROM c)
            SELECT doc_id, i::BIGINT AS chunk_id,
                   array_to_string(
                       toks[CAST(i*50+1 AS BIGINT):CAST((i+1)*50 AS BIGINT)], ' '
                   ) AS chunk_text,
                   (least((i+1)*50, n) - i*50)::BIGINT AS n_tokens
            FROM x
        """,
        "pack_sequences": f"""
            WITH dl AS (
                SELECT doc_id, len({_TOKLIST})::BIGINT AS dl FROM documents
            ),
            pos AS (
                SELECT doc_id, dl,
                       (sum(dl) OVER (ORDER BY doc_id) - dl)::BIGINT AS start
                FROM dl WHERE dl > 0
            ),
            spans AS (
                SELECT doc_id, dl, start,
                       unnest(range(start // 64, (start + dl - 1) // 64 + 1))
                           AS seq_id
                FROM pos
            )
            SELECT seq_id::BIGINT AS seq_id,
                   doc_id,
                   (greatest(start, seq_id * 64) - start)::BIGINT AS doc_off,
                   (greatest(start, seq_id * 64) - seq_id * 64)::BIGINT AS seq_off,
                   (least(start + dl, (seq_id + 1) * 64)
                    - greatest(start, seq_id * 64))::BIGINT AS n_tokens
            FROM spans
        """,
        "source_quality_gate": f"""
            WITH toks AS (
                SELECT source, doc_id,
                       unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS term
                FROM documents
            ),
            per_doc AS (
                SELECT source, doc_id,
                       count(*)::BIGINT AS n_tokens,
                       sum(CASE WHEN list_contains({_STOPLIST_SQL}, term)
                                THEN 1 ELSE 0 END)::BIGINT AS n_stop
                FROM toks GROUP BY source, doc_id
            ),
            agg AS (
                SELECT d.source,
                       count(*)::BIGINT AS n_docs,
                       coalesce(sum(p.n_tokens), 0)::BIGINT AS n_tokens,
                       coalesce(sum(p.n_stop), 0)::BIGINT AS n_stop
                FROM documents d
                LEFT JOIN per_doc p
                  ON d.source = p.source AND d.doc_id = p.doc_id
                GROUP BY d.source
            )
            SELECT source, n_docs, n_tokens, n_stop,
                   (CASE WHEN 100 * n_stop >= 9 * n_tokens
                         THEN 1 ELSE 0 END)::BIGINT AS keep
            FROM agg ORDER BY source
        """,
        "temperature_sample": """
            WITH c AS (
                SELECT lang, count(*)::BIGINT AS c
                FROM documents GROUP BY lang
            ),
            n AS (
                SELECT lang,
                       CAST(floor(sqrt(c * (SELECT min(c) FROM c)))
                            AS BIGINT) AS n_keep
                FROM c
            ),
            r AS (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY (doc_id*48271)%65536,
                                                   doc_id) AS rn
                FROM documents
            )
            SELECT lang, doc_id FROM r JOIN n USING (lang)
            WHERE rn <= n_keep
        """,
        "lang_balanced_sample": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY (doc_id*48271)%65536, doc_id) AS rn
                FROM documents
            ) WHERE rn <= 20
        """,
        "bpe_token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\s]'))::BIGINT
                       AS n_bpe_tokens,
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT
                       AS n_ws_tokens
            FROM documents
        """,
        "doc_fingerprint": (
            f"SELECT doc_id, md5(array_to_string({_TOKLIST}, ' ')) AS fingerprint"
            " FROM documents"
        ),
        "lang_source_counts": """
            SELECT lang, source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY lang, source
        """,
        "embedding_topk": """
            WITH probe AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
            sims AS (
                SELECT vec_id,
                       round(list_cosine_similarity(embedding::DOUBLE[],
                                                    (SELECT e FROM probe)), 6) AS sim
                FROM embeddings
            )
            SELECT row_number() OVER (ORDER BY sim DESC, vec_id)::BIGINT AS rank,
                   vec_id, sim
            FROM sims ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "embedding_topk_filtered": """
            WITH probe AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
            sims AS (
                SELECT vec_id,
                       round(list_cosine_similarity(embedding::DOUBLE[],
                                                    (SELECT e FROM probe)), 6) AS sim
                FROM embeddings WHERE label = 3
            )
            SELECT row_number() OVER (ORDER BY sim DESC, vec_id)::BIGINT AS rank,
                   vec_id, sim
            FROM sims ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "embedding_near_dup": f"""
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= {NEAR_DUP_THRESHOLD}
        """,
        "shipping_priority": _q3_sql(),
        "local_supplier_volume": _q5_sql(),
        "large_volume_customers": _q18_sql(),
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
                   sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                            AS BIGINT))::BIGINT AS revenue_cents,
                   count(*)::BIGINT AS n_rows,
                   round(sum(CAST(l_quantity AS BIGINT))::DOUBLE / count(*), 6) AS avg_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "customers_without_orders": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        """,
        "heavy_terms": f"""
            WITH t AS ({_TOKS}), n AS (SELECT count(*)::DOUBLE AS c FROM t)
            SELECT term, count(*)::BIGINT AS cnt FROM t GROUP BY term
            HAVING count(*) > (SELECT c FROM n) / 100.0
        """,
        "parts_ordered_heavy": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            WHERE p_partkey IN
                (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        """,
        "parts_never_ordered_heavy": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            WHERE p_partkey NOT IN
                (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        """,
        "orders_per_nation": """
            SELECT n.n_name,
                   count(*)::BIGINT AS n_orders,
                   sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
                       AS total_cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "pricing_rollup": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
                   sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                  + 0.5) AS BIGINT))::BIGINT AS revenue_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "pricing_cube": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
                   sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                  + 0.5) AS BIGINT))::BIGINT AS revenue_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "customer_order_histogram": """
            SELECT c_count, count(*)::BIGINT AS custdist FROM (
                SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
                FROM customer c LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey
            ) GROUP BY c_count
        """,
        "late_shipment_priority": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_late
            FROM orders
            WHERE EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
            )
            GROUP BY o_orderpriority
        """,
        "promo_revenue": """
            WITH j AS (
                SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                  + 0.5) AS BIGINT) AS rev,
                       (p_type = 'PROMO') AS is_promo
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                  AND l_shipdate <  TIMESTAMP '1997-04-01'
            )
            SELECT sum(CASE WHEN is_promo THEN rev ELSE 0 END)::BIGINT
                       AS promo_cents,
                   sum(rev)::BIGINT AS total_cents,
                   100.0 * sum(CASE WHEN is_promo THEN rev ELSE 0 END)::BIGINT
                         / sum(rev)::BIGINT AS promo_pct
            FROM j
        """,
        "discounted_revenue": """
            SELECT sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                  + 0.5) AS BIGINT))::BIGINT AS revenue_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15
                   AND l_quantity BETWEEN 1  AND 20)
               OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 30)
               OR (p_brand = 'Brand#17' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 25 AND 45)
        """,
        "returned_item_revenue": """
            SELECT c.c_custkey, c.c_name,
                   r.revenue_cents,
                   CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                       AS acctbal_cents,
                   n.n_name
            FROM (
                SELECT o_custkey,
                       sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                      * 100 + 0.5) AS BIGINT))::BIGINT
                           AS revenue_cents
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1997-01-01'
                  AND o_orderdate <  TIMESTAMP '1997-04-01'
                GROUP BY o_custkey
                ORDER BY revenue_cents DESC, o_custkey
                LIMIT 20
            ) r
            JOIN customer c ON r.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "forecast_revenue_change": """
            SELECT sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                            AS BIGINT))::BIGINT AS revenue_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "market_share": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   sum(CASE WHEN sn.n_name = 'NATION_2'
                            THEN CAST(floor(l_extendedprice
                                            * (1.0 - l_discount) * 100
                                            + 0.5) AS BIGINT)
                            ELSE 0 END)::BIGINT AS nation_cents,
                   sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                  + 0.5) AS BIGINT))::BIGINT AS total_cents
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region   ON cn.n_regionkey = r_regionkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'MEDIUM'
            GROUP BY 1 ORDER BY 1
        """,
        "sole_late_suppliers": """
            WITH li AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate >
                                     o_orderdate + INTERVAL 365 DAY
                                THEN 1 ELSE 0 END) AS is_late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY l_orderkey, l_suppkey
            ),
            ord AS (
                SELECT l_orderkey FROM li GROUP BY l_orderkey
                HAVING count(*) >= 2 AND sum(is_late) = 1
            )
            SELECT s_name, count(*)::BIGINT AS numwait
            FROM li
            JOIN ord USING (l_orderkey)
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE is_late = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 20
        """,
        "volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                  + 0.5) AS BIGINT))::BIGINT AS revenue_cents
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            GROUP BY 1, 2, 3
        """,
        "top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                      * 100 + 0.5) AS BIGINT))::BIGINT
                           AS total_revenue_cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-07-01'
                  AND l_shipdate <  TIMESTAMP '1997-10-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue_cents
            FROM r JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue_cents =
                  (SELECT max(total_revenue_cents) FROM r)
        """,
        "small_quantity_revenue": """
            WITH sel AS (
                SELECT l_partkey, l_quantity, l_extendedprice
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#4' AND p_size <= 10
            ),
            t AS (
                SELECT l_partkey,
                       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
                       count(*)::BIGINT AS cnt
                FROM sel GROUP BY l_partkey
            )
            SELECT sum(CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT))::BIGINT AS revenue_cents,
                   sum(CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT))::BIGINT / 700.0 AS avg_yearly
            FROM sel JOIN t USING (l_partkey)
            WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
        """,
        "lineitem_moments": """
            WITH s AS (
                SELECT l_returnflag,
                       count(*)::BIGINT AS n,
                       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sx,
                       sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))::BIGINT
                           AS sy,
                       sum(CAST(l_quantity AS BIGINT)
                           * CAST(l_quantity AS BIGINT))::BIGINT AS sxx,
                       sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                           * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))::BIGINT
                           AS syy,
                       sum(CAST(l_quantity AS BIGINT)
                           * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))::BIGINT
                           AS sxy
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag,
                   n AS n_rows,
                   round((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
                         / (n::DOUBLE - 1.0), 6) AS var_qty,
                   round((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
                         / sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
                              * (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)),
                         6) AS corr_qty_disc
            FROM s
        """,
        "lineitem_range_sorted": """
            WITH t AS (
                SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM lineitem
            ),
            p AS (
                SELECT quantile_disc(cents,
                    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS piv
                FROM t
            )
            SELECT part_id,
                   count(*)::BIGINT AS n_rows,
                   min(cents)::BIGINT AS min_cents,
                   max(cents)::BIGINT AS max_cents
            FROM (
                SELECT cents,
                       CAST(len(list_filter((SELECT piv FROM p),
                                            y -> y < cents)) AS BIGINT)
                           AS part_id
                FROM t
            )
            GROUP BY part_id
        """,
        "sales_opportunity": """
            WITH pos AS (
                SELECT c_custkey, c_mktsegment,
                       CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
                FROM customer
                WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD', 'FURNITURE')
            ),
            stats AS (
                SELECT sum(bal)::BIGINT AS s, count(*)::BIGINT AS n
                FROM pos WHERE bal > 0
            )
            SELECT c_mktsegment,
                   count(*)::BIGINT AS numcust,
                   sum(bal)::BIGINT AS totacctbal_cents
            FROM pos, stats
            WHERE bal * n > s
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = pos.c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01'
              )
            GROUP BY c_mktsegment
        """,
        "events_hopping": """
            WITH e AS (
                SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            ),
            x AS (
                SELECT (ts_s // 900 - unnest(range(0, 4))) * 900
                           AS window_start,
                       cents
                FROM e
            )
            SELECT window_start::BIGINT AS window_start,
                   count(*)::BIGINT AS n_events,
                   sum(cents)::BIGINT AS sum_value_cents
            FROM x GROUP BY window_start
        """,
        "events_value_percentiles": """
            SELECT user_id, event_id,
                   percent_rank() OVER (PARTITION BY user_id
                                        ORDER BY value DESC) AS pct_rank,
                   cume_dist() OVER (PARTITION BY user_id
                                     ORDER BY value DESC) AS cume_dist,
                   CAST(ntile(4) OVER (PARTITION BY user_id
                                       ORDER BY value DESC, event_id)
                        AS BIGINT) AS tile
            FROM events
        """,
        "events_value_ranks": """
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rn,
                   rank() OVER (PARTITION BY user_id
                                ORDER BY value DESC) AS rnk,
                   dense_rank() OVER (PARTITION BY user_id
                                      ORDER BY value DESC) AS drnk
            FROM events
        """,
        "events_hourly": """
            SELECT user_id,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   count(*)::BIGINT AS n_events,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT
                       AS sum_value_cents
            FROM events GROUP BY user_id, hour_epoch
        """,
        "events_hourly_derivative": """
            WITH h AS (
                SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                           AS hour_epoch,
                       count(*)::BIGINT AS n_events
                FROM events GROUP BY 1
            )
            SELECT hour_epoch, n_events,
                   coalesce(n_events - lag(n_events)
                            OVER (ORDER BY hour_epoch), 0)::BIGINT AS delta,
                   sum(n_events)
                       OVER (ORDER BY hour_epoch)::BIGINT AS cum,
                   round(avg(n_events::DOUBLE) OVER (
                       ORDER BY hour_epoch ROWS 2 PRECEDING), 6) AS ma3
            FROM h ORDER BY hour_epoch
        """,
        # floor(epoch(...)) matches numpy datetime64[us] -> [s] truncation
        "events_sessionize": """
            WITH e AS (SELECT user_id,
                              CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
            g AS (SELECT user_id, ts_s,
                         CASE WHEN lag(ts_s) OVER w IS NULL
                                OR ts_s - lag(ts_s) OVER w > 1800
                              THEN 1 ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)),
            s AS (SELECT user_id, ts_s,
                         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
                                          ROWS UNBOUNDED PRECEDING) AS sid
                  FROM g)
            SELECT user_id,
                   min(ts_s)::BIGINT AS session_start,
                   count(*)::BIGINT AS n_events,
                   (max(ts_s) - min(ts_s))::BIGINT AS duration_sec
            FROM s GROUP BY user_id, sid
        """,
        "events_asof_orders": """
            WITH o AS (SELECT o_custkey AS key,
                              CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ots,
                              max(o_orderkey)::BIGINT AS o_orderkey
                       FROM orders GROUP BY 1, 2)
            SELECT e.event_id, e.user_id,
                   CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
                   o.o_orderkey
            FROM events e ASOF JOIN o
              ON e.user_id = o.key AND CAST(floor(epoch(e.ts)) AS BIGINT) >= o.ots
        """,
        "top_event_per_user": """
            SELECT user_id, event_id, round(value, 6) AS value FROM (
                SELECT user_id, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY value DESC, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "events_props_agg": r"""
            SELECT event_type, count(*)::BIGINT AS n_events,
                   sum(regexp_extract(props, '"k": (\d+)', 1)::BIGINT)::BIGINT AS sum_k
            FROM events GROUP BY event_type
        """,
        "events_lag": """
            WITH e AS (SELECT event_id, user_id,
                              CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
                       FROM events)
            SELECT event_id, user_id, ts_s,
                   COALESCE(ts_s - LAG(ts_s) OVER w, -1)::BIGINT AS gap_s,
                   COALESCE(LAG(event_id) OVER w, -1)::BIGINT AS prev_event_id
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        """,
        "order_lineitem_join": """
            SELECT o_orderkey, o_orderpriority,
                   l_linenumber::BIGINT AS l_linenumber,
                   round(l_extendedprice, 6) AS price
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        """,
        "events_funnel": _funnel_sql(),
        "events_retention": _retention_sql(),
        "events_user_running": """
            WITH e AS (SELECT event_id, user_id,
                              CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                       FROM events)
            SELECT event_id, user_id, ts_s,
                   row_number() OVER w::BIGINT AS run_n,
                   sum(cents) OVER w::BIGINT AS run_sum_cents
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
                                ROWS UNBOUNDED PRECEDING)
        """,
        "events_range_join": """
            WITH e AS (SELECT event_id, user_id,
                              CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events)
            SELECT a.event_id, count(*)::BIGINT AS n_window
            FROM e a JOIN e b ON b.user_id = a.user_id
                             AND b.ts_s >= a.ts_s AND b.ts_s < a.ts_s + 3600
            GROUP BY a.event_id
        """,
        "events_anomaly": """
            WITH c AS (
                SELECT event_id, user_id,
                       CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
                FROM events
            ),
            s AS (
                SELECT user_id,
                       count(*)::BIGINT AS n,
                       sum(c)::BIGINT AS s1,
                       sum(c * c)::BIGINT AS s2
                FROM c GROUP BY user_id
            ),
            z AS (
                SELECT c.event_id, c.user_id, c.c AS value_cents,
                       (c.c::DOUBLE - s.s1::DOUBLE / s.n)
                       / sqrt((s.s2::DOUBLE - s.s1::DOUBLE * s.s1 / s.n)
                              / (s.n - 1)) AS z_raw
                FROM c JOIN s USING (user_id)
                WHERE s.n >= 2
                  AND (s.s2::DOUBLE - s.s1::DOUBLE * s.s1 / s.n)
                      / (s.n - 1) > 0
            )
            SELECT event_id, user_id, value_cents,
                   round(z_raw, 6) AS z
            FROM z WHERE abs(z_raw) >= 3.0
        """,
        "events_value_histogram": """
            SELECT bin,
                   bin * 25.0 AS lo,
                   count(*)::BIGINT AS n
            FROM (
                SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) // 2500
                           AS bin
                FROM events
            )
            GROUP BY bin
        """,
        "events_daily_active": """
            SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
                   count(DISTINCT user_id)::BIGINT AS n_active
            FROM events GROUP BY day_epoch
        """,
        "top3_events_per_user": """
            SELECT user_id, rn::BIGINT AS rank, event_id, round(value, 6) AS value
            FROM (
                SELECT user_id, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY value DESC, event_id) AS rn
                FROM events
            ) WHERE rn <= 3
        """,
        "events_sample": """
            SELECT event_id, user_id, event_type, value FROM events
            WHERE (event_id * 48271) % 65536 < 6553
        """,
        "lineitem_quantiles": """
            SELECT 0.25::DOUBLE AS q, quantile_disc(l_extendedprice, 0.25) AS value
            FROM lineitem
            UNION ALL SELECT 0.5::DOUBLE, quantile_disc(l_extendedprice, 0.5)
            FROM lineitem
            UNION ALL SELECT 0.9::DOUBLE, quantile_disc(l_extendedprice, 0.9)
            FROM lineitem
            UNION ALL SELECT 0.99::DOUBLE, quantile_disc(l_extendedprice, 0.99)
            FROM lineitem
        """,
        "embedding_multi_topk": f"""
            WITH probes AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS e
                            FROM embeddings WHERE vec_id < {N_MULTI_PROBES}),
            sims AS (
                SELECT p.query_id, v.vec_id,
                       round(list_cosine_similarity(v.embedding::DOUBLE[], p.e), 6)
                           AS sim
                FROM embeddings v CROSS JOIN probes p
            )
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id)::BIGINT AS rank,
                   vec_id, sim
            FROM sims QUALIFY rank <= 10
        """,
        "hard_negatives": f"""
            WITH probes AS (SELECT vec_id AS query_id, label AS qlabel,
                                   embedding::DOUBLE[] AS e
                            FROM embeddings WHERE vec_id < {N_MULTI_PROBES}),
            sims AS (
                SELECT p.query_id, v.vec_id,
                       round(list_cosine_similarity(v.embedding::DOUBLE[], p.e), 6)
                           AS sim
                FROM embeddings v CROSS JOIN probes p
                WHERE v.label <> p.qlabel AND v.vec_id <> p.query_id
            )
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id)::BIGINT AS rank,
                   vec_id, sim
            FROM sims QUALIFY rank <= 10
        """,
        "contrastive_triplets": f"""
            WITH probes AS (SELECT vec_id AS query_id, label AS qlabel,
                                   embedding::DOUBLE[] AS e
                            FROM embeddings WHERE vec_id < {N_MULTI_PROBES}),
            sims AS (
                SELECT p.query_id,
                       CASE WHEN v.label = p.qlabel THEN 'pos'
                            ELSE 'neg' END AS role,
                       v.vec_id,
                       round(list_cosine_similarity(v.embedding::DOUBLE[], p.e), 6)
                           AS sim
                FROM embeddings v CROSS JOIN probes p
                WHERE v.vec_id <> p.query_id
            )
            SELECT query_id, role,
                   row_number() OVER (PARTITION BY query_id, role
                                      ORDER BY sim DESC, vec_id)::BIGINT AS rank,
                   vec_id, sim
            FROM sims
            QUALIFY rank <= CASE WHEN role = 'pos' THEN 5 ELSE 10 END
        """,
        "event_transitions": f"""
            WITH seq AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev
                FROM events
            )
            SELECT prev AS src, event_type AS dst, count(*)::BIGINT AS n
            FROM seq WHERE prev IS NOT NULL
            GROUP BY prev, event_type ORDER BY src, dst
        """,
        "event_pagerank": _pagerank_sql(_EVENT_EDGES_CTE, "event_type"),
        "term_pagerank": _pagerank_sql(_TERM_EDGES_CTE, "term", limit=50),
        # exact all-pairs 3-shingle Jaccard + the same recursive-CTE
        # closure as embedding_dup_components; every sf doc has >= 10
        # tokens, so the engine's <k-token unigram fallback never fires
        # (the engine hashes shingles to 64-bit — string-identity here,
        # collision probability negligible and deterministic)
        "minhash_dup_groups": """
            WITH RECURSIVE tl AS (
                SELECT doc_id, list_filter(string_split(text, ' '),
                                           x -> x <> '') AS l
                FROM documents
            ),
            toks AS (
                SELECT doc_id, unnest(l) AS term,
                       generate_subscripts(l, 1) AS p
                FROM tl
            ),
            sh AS (
                SELECT DISTINCT t1.doc_id,
                       t1.term || ' ' || t2.term || ' ' || t3.term AS s
                FROM toks t1
                JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.p = t1.p + 1
                JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.p = t1.p + 2
            ),
            sz AS (SELECT doc_id, count(*)::DOUBLE AS c FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS a, b.doc_id AS b, count(*)::DOUBLE AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pairs AS (
                SELECT a, b FROM inter
                JOIN sz sa ON sa.doc_id = a
                JOIN sz sb ON sb.doc_id = b
                WHERE i / (sa.c + sb.c - i) >= 0.8
            ),
            edges AS (
                SELECT a AS src, b AS dst FROM pairs
                UNION ALL SELECT b, a FROM pairs
            ),
            reach(node, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.node, e.dst
                FROM reach JOIN edges e ON e.src = reach.r
            )
            SELECT node AS doc_id, min(r)::BIGINT AS group_id
            FROM reach GROUP BY node
        """,
        "embedding_dup_components": f"""
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS a, b.vec_id AS b
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[])
                      >= {NEAR_DUP_THRESHOLD}
            ),
            edges AS (
                SELECT a AS src, b AS dst FROM pairs
                UNION ALL SELECT b, a FROM pairs
            ),
            reach(node, r) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT reach.node, e.dst
                FROM reach JOIN edges e ON e.src = reach.r
            )
            SELECT node AS vec_id, min(r)::BIGINT AS component_id
            FROM reach GROUP BY node
        """,
    }


def _repetition_sql() -> str:
    """MassiveText n-gram repetition oracle GENERATED from the pinned
    thresholds in ``stages/textstats.py`` (REP_TOP_MAX / REP_DUP_MAX):
    top-n-gram char fractions via a per-doc gram count with the
    engine's tie order (count DESC, gram ASC — join-with-space order
    equals token-tuple order because space sorts below every token
    char), duplicate-n-gram coverage via the union of covered
    positions (DISTINCT doc, pos). Raw fractions divide exact integer
    char sums, so keep verdicts match the engine bit-for-bit."""
    from zensearch_ray.stages.textstats import REP_DUP_MAX, REP_TOP_MAX

    ctes = [
        "d AS (SELECT doc_id, list_filter(string_split(text, ' '),"
        " x -> x <> '') AS l FROM documents)",
        "tok AS (SELECT doc_id, unnest(l) AS term,"
        " unnest(range(1, len(l)+1)) AS pos FROM d)",
        "tot AS (SELECT doc_id, sum(length(term))::BIGINT AS total"
        " FROM tok GROUP BY doc_id)",
    ]
    sel, joins, raws = [], [], []
    for n in sorted(REP_TOP_MAX):
        ctes.append(
            f"g{n} AS (SELECT doc_id,"
            f" unnest(list_transform(range(1, len(l)-{n-2}),"
            f" i -> array_to_string(l[i:i+{n-1}], ' '))) AS gram"
            f" FROM d WHERE len(l) >= {n})"
        )
        ctes.append(
            f"gc{n} AS (SELECT doc_id, gram, count(*)::BIGINT AS c"
            f" FROM g{n} GROUP BY 1, 2)"
        )
        ctes.append(
            f"top{n} AS (SELECT doc_id,"
            f" c * (length(gram) - {n-1})::BIGINT AS chars FROM gc{n}"
            f" QUALIFY row_number() OVER (PARTITION BY doc_id"
            f" ORDER BY c DESC, gram) = 1)"
        )
        joins.append(f"LEFT JOIN top{n} USING (doc_id)")
        raws.append(
            f"coalesce(top{n}.chars, 0)::DOUBLE"
            f" / coalesce(tot.total, 1) AS r_top{n}"
        )
        sel.append(f"round(r_top{n}, 6) AS top{n}_frac")
    for n in sorted(REP_DUP_MAX):
        ctes.append(
            f"p{n} AS (SELECT doc_id, unnest(range(1, len(l)-{n-2})) AS pos,"
            f" unnest(list_transform(range(1, len(l)-{n-2}),"
            f" i -> array_to_string(l[i:i+{n-1}], ' '))) AS gram"
            f" FROM d WHERE len(l) >= {n})"
        )
        ctes.append(
            f"dup{n} AS (SELECT doc_id, gram FROM p{n}"
            f" GROUP BY 1, 2 HAVING count(*) > 1)"
        )
        ctes.append(
            f"cov{n} AS (SELECT DISTINCT p{n}.doc_id,"
            f" p{n}.pos + o.o AS cpos FROM p{n}"
            f" JOIN dup{n} USING (doc_id, gram)"
            f" CROSS JOIN (SELECT unnest(range(0, {n})) AS o) o)"
        )
        ctes.append(
            f"covc{n} AS (SELECT t.doc_id, sum(length(t.term))::BIGINT"
            f" AS chars FROM tok t JOIN cov{n}"
            f" ON t.doc_id = cov{n}.doc_id AND t.pos = cov{n}.cpos"
            f" GROUP BY 1)"
        )
        joins.append(f"LEFT JOIN covc{n} USING (doc_id)")
        raws.append(
            f"coalesce(covc{n}.chars, 0)::DOUBLE"
            f" / coalesce(tot.total, 1) AS r_dup{n}"
        )
        sel.append(f"round(r_dup{n}, 6) AS dup{n}_frac")
    keep_terms = [f"r_top{n} <= {t}" for n, t in sorted(REP_TOP_MAX.items())]
    keep_terms += [f"r_dup{n} <= {t}" for n, t in sorted(REP_DUP_MAX.items())]
    return f"""
        WITH {','.join(ctes)},
        raw AS (
            SELECT d.doc_id, {', '.join(raws)}
            FROM d LEFT JOIN tot USING (doc_id)
            {' '.join(joins)}
        )
        SELECT doc_id, {', '.join(sel)},
               (CASE WHEN {' AND '.join(keep_terms)}
                     THEN 1 ELSE 0 END)::BIGINT AS keep
        FROM raw
    """


def _seq_sql() -> str:
    """Ordered-proximity oracle GENERATED for the n-token query: a
    position self-join chain p1 < p2 <= p1+gap < ... (token positions
    via generate_subscripts, as _near_sql), conjunctive-BM25 scoring
    restricted to chained docs."""
    toks = PHRASE_QUERY.split()
    joins = []
    for i in range(2, len(toks) + 1):
        joins.append(
            f"JOIN tp p{i} ON p{i}.doc_id = p1.doc_id "
            f"AND p{i}.term = '{toks[i - 1]}' "
            f"AND p{i}.p > p{i - 1}.p AND p{i}.p <= p{i - 1}.p + {SEQ_GAP}"
        )
    chain = "\n              ".join(joins)
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_PHRASE_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        tp AS (
            SELECT doc_id, unnest(tl) AS term,
                   generate_subscripts(tl, 1) - 1 AS p
            FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
        ),
        chained AS (
            SELECT DISTINCT p1.doc_id FROM tp p1
              {chain}
            WHERE p1.term = '{toks[0]}'
        ),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            WHERE tf.doc_id IN (SELECT doc_id FROM chained)
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _phrase_sql() -> str:
    """Exact-phrase oracle: conjunctive-BM25 scoring (same k1/b/idf as
    ``_bm25_and_sql``), restricted to documents whose space-joined
    token text contains the phrase as a contiguous token run —
    expressible in SQL because ``documents.text`` is single-space-
    separated tokens, so '% hash join %' over ' '||text||' ' is an
    exact token-sequence match."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_PHRASE_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        phrased AS (
            SELECT doc_id FROM documents
            WHERE ' ' || text || ' ' LIKE '% {PHRASE_QUERY} %'
        ),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            WHERE tf.doc_id IN (SELECT doc_id FROM phrased)
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _phrase_prefix_sql() -> str:
    """Match-phrase-prefix oracle: expansions = DISTINCT dictionary
    terms LIKE 'prefix%'; a (doc, expansion) pair matches iff the
    space-joined token text contains the completed phrase as a
    contiguous token run (the phrase oracle's LIKE trick, pattern
    concatenated per expansion); pair score = conjunctive BM25 of
    (base + expansion); per doc the MAX over matching expansions.
    Generated for PHRASE_PREFIX_QUERY = 'hash s' (base term 'hash')."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        exps AS (SELECT DISTINCT term FROM toks WHERE term LIKE 's%'),
        qterms AS (SELECT 'hash' AS term UNION SELECT term FROM exps),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.term, tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        matched AS (
            SELECT d.doc_id, e.term AS exp
            FROM documents d CROSS JOIN exps e
            WHERE ' ' || d.text || ' ' LIKE '% hash ' || e.term || ' %'
        ),
        pair AS (
            SELECT m.doc_id, b.c + ec.c AS score
            FROM matched m
            JOIN contrib b ON b.doc_id = m.doc_id AND b.term = 'hash'
            JOIN contrib ec ON ec.doc_id = m.doc_id AND ec.term = m.exp
        ),
        scored AS (SELECT doc_id, max(score) AS score FROM pair GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _snippets_sql() -> str:
    """Snippet oracle: exhaustive-BM25 top-10 (same scoring as
    ``_bm25_sql``), then per doc the (df ASC, term ASC)-first query
    term it contains, its first occurrence position, and the
    radius-5 token window — all expressible because documents.text is
    single-space-separated tokens."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        ),
        ranked AS (
            SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
                   doc_id, round(score, 6) AS score
            FROM scored ORDER BY score DESC, doc_id LIMIT 10
        ),
        dt AS (SELECT doc_id, {_TOKLIST} AS tl FROM documents),
        choice AS (
            SELECT r.rank, r.doc_id, r.score, d.term,
                   row_number() OVER (PARTITION BY r.doc_id
                                      ORDER BY d.df, d.term) AS rn
            FROM ranked r
            JOIN dt USING (doc_id)
            JOIN df d ON list_contains(dt.tl, d.term)
        ),
        final AS (
            SELECT c.rank, c.doc_id, c.term,
                   (list_position(dt.tl, c.term) - 1)::BIGINT AS pos,
                   dt.tl, c.score
            FROM choice c JOIN dt USING (doc_id) WHERE c.rn = 1
        )
        SELECT rank, doc_id, term, pos,
               array_to_string(
                   tl[CAST(greatest(1, pos + 1 - 5) AS BIGINT):CAST(pos + 1 + 5 AS BIGINT)],
                   ' '
               ) AS snippet,
               score
        FROM final ORDER BY rank
    """


def _mlt_sql() -> str:
    """More-like-this oracle: source doc 0's top-5 tf·idf terms (ties →
    term ASC, idf-0 excluded) as an OR query, source doc excluded."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        dfall AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS dfv
                  FROM toks GROUP BY term),
        dtf AS (SELECT term, count(*)::DOUBLE AS tf0 FROM toks
                WHERE doc_id = 0 GROUP BY term),
        cand AS (
            SELECT d.term,
                   d.tf0 * ln((SELECT n FROM stats) / f.dfv) AS w
            FROM dtf d JOIN dfall f USING (term)
            WHERE ln((SELECT n FROM stats) / f.dfv) > 0
        ),
        qterms AS (SELECT term FROM cand ORDER BY w DESC, term LIMIT 5),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib
            WHERE doc_id <> 0
            GROUP BY doc_id HAVING sum(c) > 0
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """


def _prefix_sql() -> str:
    """Prefix-search oracle: the same exhaustive-BM25 body as
    ``_bm25_sql`` with qterms = the DISTINCT corpus terms matching
    'prefix%' — exactly the engine's dictionary expansion."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms AS (SELECT DISTINCT term FROM toks WHERE term LIKE '{PREFIX_QUERY}%'),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """


def _percolate_sql(registry: dict[str, str]) -> str:
    """Percolator oracle: one membership SELECT per standing query,
    UNION ALL — each predicate GENERATED from the same AST the
    percolator evaluates (``to_sql_predicate``), NOT = SQL NOT over
    the document's own tokens."""
    from zensearch_ray.functions.boolquery import parse_bool, to_sql_predicate

    arms = "\n        UNION ALL\n".join(
        f"        SELECT d.doc_id, '{qid}' AS query_id FROM documents d "
        f"WHERE {to_sql_predicate(parse_bool(expr))}"
        for qid, expr in sorted(registry.items())
    )
    return f"""
        WITH toks AS ({_TOKS})
{arms}
    """


def _q3_sql() -> str:
    """TPC-H Q3 oracle: same segment/date predicates, exact-cents
    revenue (floor(x*100+0.5), the shared money convention), epoch
    seconds for the orderdate, (revenue DESC, orderkey) top-10."""
    from zensearch_ray.pipelines.relational import Q3_DATE, Q3_SEGMENT

    cut = f"TIMESTAMP '{str(Q3_DATE)} 00:00:00'"
    return f"""
        SELECT l.l_orderkey,
               sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
                        AS BIGINT))::BIGINT AS revenue_cents,
               epoch(o.o_orderdate)::BIGINT AS o_orderdate_s,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{Q3_SEGMENT}'
          AND o.o_orderdate < {cut}
          AND l.l_shipdate > {cut}
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_cents DESC, l.l_orderkey LIMIT 10
    """


def _q5_sql() -> str:
    """TPC-H Q5 oracle: the 6-table star with the same-nation
    customer/supplier constraint, exact-cents revenue, ordered
    (revenue DESC, n_name)."""
    from zensearch_ray.pipelines.relational import Q5_FROM, Q5_REGION, Q5_TO

    lo = f"TIMESTAMP '{str(Q5_FROM)} 00:00:00'"
    hi = f"TIMESTAMP '{str(Q5_TO)} 00:00:00'"
    return f"""
        SELECT n.n_name,
               sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
                        AS BIGINT))::BIGINT AS revenue_cents
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE c.c_nationkey = s.s_nationkey
          AND r.r_name = '{Q5_REGION}'
          AND o.o_orderdate >= {lo} AND o.o_orderdate < {hi}
        GROUP BY n.n_name
        ORDER BY revenue_cents DESC, n.n_name
    """


def _q18_sql() -> str:
    """TPC-H Q18 oracle: HAVING-filtered order quantities joined back
    to orders; exact-cents totalprice; (totalprice DESC, orderkey)
    top-10."""
    from zensearch_ray.pipelines.relational import Q18_MIN_QTY

    return f"""
        WITH big AS (
            SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS BIGINT)) > {Q18_MIN_QTY}
        )
        SELECT o.o_custkey AS c_custkey, o.o_orderkey,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)::BIGINT
                   AS totalprice_cents,
               big.sum_qty
        FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey
        ORDER BY totalprice_cents DESC, o.o_orderkey LIMIT 10
    """


def _funnel_sql() -> str:
    """First-touch funnel oracle: step N anchors at the user's earliest
    qualifying event strictly after their step-(N-1) reach — one
    min-per-user CTE per step, chained."""
    from zensearch_ray.pipelines.analytics import FUNNEL_STEPS

    ctes, prev = [], None
    for i, s in enumerate(FUNNEL_STEPS, 1):
        if prev is None:
            ctes.append(
                f"s{i} AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                f"JOIN {prev} USING (user_id) "
                f"WHERE e.event_type = '{s}' AND e.ts > {prev}.t "
                f"GROUP BY e.user_id)"
            )
        prev = f"s{i}"
    arms = "\n        UNION ALL\n".join(
        f"        SELECT {i}::BIGINT AS step, '{s}' AS event_type, "
        f"(SELECT count(*) FROM s{i})::BIGINT AS n_users"
        for i, s in enumerate(FUNNEL_STEPS, 1)
    )
    return f"""
        WITH {", ".join(ctes)}
{arms}
    """


def _retention_sql() -> str:
    """Cohort-retention oracle: first-event day per user (ts::DATE
    truncation ≡ the engine's floor(epoch/86400) for positive ts),
    distinct (user, offset) activity, counted per (cohort, offset)."""
    from zensearch_ray.pipelines.analytics import RETENTION_OFFSETS

    offs = ", ".join(str(o) for o in sorted(set(RETENTION_OFFSETS)))
    return f"""
        WITH d AS (
            SELECT user_id,
                   datediff('day', DATE '1970-01-01', ts::DATE)::BIGINT AS day
            FROM events
        ),
        f AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id),
        a AS (
            SELECT DISTINCT d.user_id, f.cohort, d.day - f.cohort AS off
            FROM d JOIN f USING (user_id)
        )
        SELECT cohort::BIGINT AS cohort_day, off::BIGINT AS day_offset,
               count(*)::BIGINT AS n_users
        FROM a WHERE off IN ({offs})
        GROUP BY cohort, off
    """


def _dump_postings_sql() -> str:
    """Index-export oracle: the exported segment rows must equal the
    (term, doc_id, tf, dl) facts recomputed from the raw corpus by SQL
    tokenization — a full-index integrity invariant."""
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (
            SELECT term, doc_id, count(*)::BIGINT AS tf
            FROM toks GROUP BY term, doc_id
        ),
        dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id)
        SELECT term, doc_id, tf, dl FROM tf JOIN dl USING (doc_id)
    """


_BM25_BODY = """
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        )
"""


def _range_sql() -> str:
    """Range-filter oracle: exhaustive BM25, results narrowed to docs
    whose token count (the indexed doc_len) lies in [LO, HI]; rank
    assigned AFTER the filter (the engine's filter-then-rank order)."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()}
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM (
            SELECT s.doc_id, s.score FROM scored s JOIN dl USING (doc_id)
            WHERE dl.dl BETWEEN {RANGE_LO} AND {RANGE_HI}
        )
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _fvf_sql() -> str:
    """Function-score oracle: exhaustive BM25, each matching doc's
    score multiplied by ln(1 + doc_len) (ES field_value_factor with
    the log1p modifier); order by the raw product, round after —
    the engine orders unrounded too (same as bm25_topk)."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()}
        SELECT row_number() OVER (ORDER BY fscore DESC, doc_id)::BIGINT AS rank,
               doc_id, round(fscore, 6) AS score
        FROM (
            SELECT s.doc_id, s.score * ln(1 + dl.dl) AS fscore
            FROM scored s JOIN dl USING (doc_id)
        )
        ORDER BY fscore DESC, doc_id LIMIT 10
    """


def _decay_sql(kind: str) -> str:
    """Decay-function-score oracle: exhaustive BM25, each matching
    doc's score multiplied by the ES decay of its token count from
    DECAY_ORIGIN — gauss ``rate^((d/scale)^2)`` or linear
    ``max(0, 1 - d·(1-rate)/scale)`` with
    ``d = max(0, |dl - origin| - offset)``. Order by the raw product
    (rounded after), doc_id ASC on ties — same as ``_fvf_sql``."""
    d = f"greatest(abs(dl.dl - {DECAY_ORIGIN}) - {DECAY_OFFSET}, 0.0)"
    if kind == "gauss":
        mult = f"exp(ln({DECAY_RATE}) * pow({d} / {DECAY_SCALE}, 2))"
    else:  # linear
        mult = f"greatest(1.0 - {d} * (1.0 - {DECAY_RATE}) / {DECAY_SCALE}, 0.0)"
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()}
        SELECT row_number() OVER (ORDER BY fscore DESC, doc_id)::BIGINT AS rank,
               doc_id, round(fscore, 6) AS score
        FROM (
            SELECT s.doc_id, s.score * {mult} AS fscore
            FROM scored s JOIN dl USING (doc_id)
        )
        ORDER BY fscore DESC, doc_id LIMIT 10
    """


def _random_sql() -> str:
    """random_score oracle: the BM25 match set (score > 0) ranked by
    the deterministic per-(seed, doc_id) md5 draw — first 12 hex
    digits as an integer over 16^12, exactly the engine's recipe."""
    draw = (
        f"('0x' || substr(md5('{RANDOM_SEED}:' || doc_id::VARCHAR), 1, 12))"
        f"::UBIGINT / 281474976710656.0"
    )
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()},
        drawn AS (SELECT doc_id, {draw} AS draw FROM scored)
        SELECT row_number() OVER (ORDER BY draw DESC, doc_id)::BIGINT AS rank,
               doc_id, round(draw, 6) AS score
        FROM drawn
        ORDER BY draw DESC, doc_id LIMIT 10
    """


def _rescore_sql(window: int = 30) -> str:
    """Two-phase rescore oracle: BM25 window of ``window`` docs over
    the match query (scores round6'd BEFORE the window cut, mirroring
    the engine), then final = round6(1.0·bm25 + 2.0·phrase_score)
    where phrase_score is the phrase terms' conjunctive BM25 sum for
    docs containing the contiguous phrase (the `_phrase_sql` LIKE
    trick over single-space token text), 0 otherwise."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()},
        win AS (
            SELECT doc_id, s FROM (
                SELECT doc_id, round(score, 6) AS s,
                       row_number() OVER (
                           ORDER BY round(score, 6) DESC, doc_id
                       ) AS rn
                FROM scored
            ) WHERE rn <= {window}
        ),
        pterms(term) AS {_PHRASE_VALUES},
        ptf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN pterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        pdf AS (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY term),
        phrased AS (
            SELECT doc_id FROM documents
            WHERE ' ' || text || ' ' LIKE '% {PHRASE_QUERY} %'
        ),
        pcontrib AS (
            SELECT ptf.doc_id,
                   ln((SELECT n FROM stats) / pdf.df) *
                   (ptf.tf * 2.2) /
                   (ptf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM ptf
            JOIN pdf USING (term)
            JOIN dl ON ptf.doc_id = dl.doc_id
            WHERE ptf.doc_id IN (SELECT doc_id FROM phrased)
        ),
        pscored AS (SELECT doc_id, round(sum(c), 6) AS ps FROM pcontrib GROUP BY doc_id),
        final AS (
            SELECT w.doc_id,
                   round(1.0 * w.s + 2.0 * coalesce(p.ps, 0.0), 6) AS f
            FROM win w LEFT JOIN pscored p USING (doc_id)
        )
        SELECT row_number() OVER (ORDER BY f DESC, doc_id)::BIGINT AS rank,
               doc_id, f AS score
        FROM final ORDER BY f DESC, doc_id LIMIT 10
    """


def _per_facet_sql(per: int = 2) -> str:
    """Per-facet ranking oracle: the exhaustive-BM25 body, ROW_NUMBER
    within each source over (score DESC, doc_id), top ``per`` per
    group, ordered (value, rank)."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()}
        SELECT facet_value, rank_in_group, doc_id, round(score, 6) AS score
        FROM (
            SELECT d.source AS facet_value,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY s.score DESC, s.doc_id
                   )::BIGINT AS rank_in_group,
                   s.doc_id, s.score
            FROM scored s JOIN documents d USING (doc_id)
        )
        WHERE rank_in_group <= {per}
        ORDER BY facet_value, rank_in_group
    """


def _lm_score_sql() -> str:
    """Unigram-LM oracle: cf/total over the token table, per-doc mean
    of ln p(token) with occurrence multiplicity."""
    return f"""
        WITH toks AS ({_TOKS}),
        cf AS (SELECT term, count(*)::DOUBLE AS c FROM toks GROUP BY term),
        tot AS (SELECT count(*)::DOUBLE AS t FROM toks)
        SELECT toks.doc_id,
               round(avg(ln(cf.c / (SELECT t FROM tot))), 6) AS lm_score
        FROM toks JOIN cf USING (term)
        GROUP BY toks.doc_id
    """


def _dsir_sql() -> str:
    """DSIR importance-weight oracle (pipelines/selection.py spec):
    unigram+bigram bag features, Laplace α=1 multinomials over the raw
    feature vocabulary, target = lang='en', per-doc Σ ln(p_t/p_r).
    Empty-feature docs keep log_weight 0 via the LEFT JOIN."""
    return f"""
        WITH tp AS (
            SELECT doc_id, unnest(tl) AS term,
                   generate_subscripts(tl, 1) AS p
            FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
        ),
        feats AS (
            SELECT doc_id, term AS f FROM tp
            UNION ALL
            SELECT a.doc_id, a.term || ' ' || b.term AS f
            FROM tp a JOIN tp b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        ),
        tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        counts AS (
            SELECT f, count(*)::DOUBLE AS c_r,
                   sum(CASE WHEN doc_id IN (SELECT doc_id FROM tgt)
                            THEN 1 ELSE 0 END)::DOUBLE AS c_t
            FROM feats GROUP BY f
        ),
        tot AS (SELECT sum(c_r) AS n_r, sum(c_t) AS n_t,
                       count(*)::DOUBLE AS v FROM counts),
        model AS (
            SELECT f,
                   ln((c_t + 1.0) / ((SELECT n_t FROM tot) + (SELECT v FROM tot)))
                 - ln((c_r + 1.0) / ((SELECT n_r FROM tot) + (SELECT v FROM tot))) AS r
            FROM counts
        ),
        dw AS (
            SELECT feats.doc_id, sum(model.r) AS lw
            FROM feats JOIN model USING (f)
            GROUP BY feats.doc_id
        )
        SELECT d.doc_id, round(coalesce(dw.lw, 0), 6) AS log_weight
        FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id
        ORDER BY d.doc_id
    """


def _synonyms_sql() -> str:
    """Synonym-expansion oracle: the exhaustive-BM25 body with qterms =
    the engine's expanded term set, computed HERE from the same
    synonym table (shared spec)."""
    from zensearch_ray.functions.text import tokenize as _tk
    from zensearch_ray.pipelines.corpus import SYNONYMS_CFG

    expanded: set[str] = set()
    for t in _tk(SYN_QUERY):
        expanded.add(t)
        for s in SYNONYMS_CFG.get(t, ()):
            expanded.update(_tk(s))
    vals = ", ".join(f"('{t}')" for t in sorted(expanded))
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS (VALUES {vals}),
        {_BM25_BODY.strip()}
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """


def _match_histogram_sql() -> str:
    """Histogram-aggregation oracle: floor(dl/10)*10 buckets of doc_len
    over the matched (score > 0) set, empty buckets omitted."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()}
        SELECT round(floor(dl.dl / 10.0) * 10.0, 6) AS bucket,
               count(*)::BIGINT AS n_docs
        FROM scored JOIN dl USING (doc_id)
        GROUP BY 1 ORDER BY 1
    """


def _match_cardinality_sql() -> str:
    """Cardinality-aggregation oracle: COUNT(DISTINCT source) over the
    matched (score > 0) set."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()}
        SELECT count(DISTINCT d.source)::BIGINT AS n_values
        FROM scored s JOIN documents d USING (doc_id)
    """


def _match_percentiles_sql() -> str:
    """Percentiles-aggregation oracle: value at 1-based rank ceil(q·n)
    (the ``percentile_disc`` rule, matching the engine's exact
    selection) over the matched (score > 0) set's doc_len."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()},
        ranked AS (
            SELECT dl.dl AS v, row_number() OVER (ORDER BY dl.dl) AS r,
                   count(*) OVER () AS n
            FROM scored JOIN dl USING (doc_id)
        )
        SELECT qs.q::DOUBLE AS q, round(ranked.v, 6) AS value
        FROM (VALUES (0.25), (0.5), (0.75), (0.9)) qs(q)
        JOIN ranked
          ON ranked.r = least(CAST(ceil(qs.q * ranked.n) AS BIGINT), ranked.n)
        ORDER BY qs.q
    """


def _term_vectors_sql() -> str:
    """Termvectors oracle: tf + corpus df + 0-based comma-joined token
    positions for every term of doc TV_DOC_ID."""
    return f"""
        WITH tp AS (
            SELECT doc_id, unnest(tl) AS term,
                   generate_subscripts(tl, 1) AS p
            FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
        ),
        dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                FROM tp GROUP BY term)
        SELECT tp.term, count(*)::BIGINT AS tf, min(dfs.df) AS df,
               string_agg((tp.p - 1)::VARCHAR, ',' ORDER BY tp.p) AS positions
        FROM tp JOIN dfs USING (term)
        WHERE tp.doc_id = {TV_DOC_ID}
        GROUP BY tp.term ORDER BY tp.term
    """


def _match_stats_sql() -> str:
    """Metric-aggregation oracle: count/sum/avg/min/max of doc_len over
    the matched (score > 0) set."""
    return f"""
        WITH toks AS ({_TOKS}),
        qterms(term) AS {_BM25_VALUES},
        {_BM25_BODY.strip()}
        SELECT count(*)::BIGINT AS n_docs,
               round(sum(dl.dl), 6) AS sum_len,
               round(avg(dl.dl), 6) AS avg_len,
               round(min(dl.dl), 6) AS min_len,
               round(max(dl.dl), 6) AS max_len
        FROM scored JOIN dl USING (doc_id)
    """


_STEM_CASE = """CASE
            WHEN term LIKE '%sses'
                THEN substr(term, 1, length(term) - 2)
            WHEN term LIKE '%ies' AND length(term) > 4
                THEN substr(term, 1, length(term) - 3) || 'y'
            WHEN term LIKE '%ss' OR term LIKE '%us' OR term LIKE '%is'
                THEN term
            WHEN term LIKE '%s' AND length(term) > 3
                THEN substr(term, 1, length(term) - 1)
            ELSE term END"""


def _stem_sql() -> str:
    """Stem-analyzer oracle: the exhaustive-BM25 body over the
    S-STEMMED token stream (the exact CASE translation of
    functions/text.s_stem — first-match-wins suffix rules), with the
    query terms stemmed by the same Python function at generation
    time. Token count (dl) is invariant; tf/df mass merges onto
    stems."""
    from zensearch_ray.functions.text import s_stem

    qvals = ", ".join(f"('{s_stem(t)}')" for t in STEM_QUERY.split())
    return f"""
        WITH raw AS ({_TOKS}),
        toks AS (SELECT doc_id, {_STEM_CASE} AS term FROM raw),
        qterms(term) AS (VALUES {qvals}),
        {_BM25_BODY.strip()}
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _synfold_sql() -> str:
    """Synonym-fold oracle: the exhaustive-BM25 body over the FOLDED
    token stream (the exact CASE translation of corpus.SYNFOLD_CFG),
    query tokens folded through the same table at generation time."""
    from zensearch_ray.pipelines.corpus import SYNFOLD_CFG

    table = dict(SYNFOLD_CFG)
    case = "CASE " + " ".join(
        f"WHEN term = '{a}' THEN '{b}'" for a, b in SYNFOLD_CFG
    ) + " ELSE term END"
    qvals = ", ".join(
        f"('{table.get(t, t)}')" for t in SYNFOLD_QUERY.split()
    )
    return f"""
        WITH raw AS ({_TOKS}),
        toks AS (SELECT doc_id, {case} AS term FROM raw),
        qterms(term) AS (VALUES {qvals}),
        {_BM25_BODY.strip()}
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _stopword_sql() -> str:
    """Stopword-analyzer oracle: the exhaustive-BM25 body computed over
    the FILTERED token stream (stop terms removed before dl/df/tf —
    Lucene StopFilter semantics, exactly what the index stores); the
    query's stop token rides along and is inert on both sides."""
    from zensearch_ray.pipelines.corpus import STOPWORDS_CFG

    stops = ", ".join(f"'{s}'" for s in STOPWORDS_CFG)
    qvals = ", ".join(
        f"('{t}')" for t in ["the"] + BM25_QUERY.split()
    )
    return f"""
        WITH toks AS (
            SELECT * FROM ({_TOKS}) WHERE term NOT IN ({stops})
        ),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS (VALUES {qvals}),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN (SELECT DISTINCT term FROM qterms) q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """


def _collapsed_sql(per: int = 1) -> str:
    """Field-collapse oracle: the exhaustive-BM25 body, then at most
    ``per`` rows per source survive — ROW_NUMBER over the full ranking
    partitioned by the attribute, exactly the engine's greedy
    rank-order collapse."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        ),
        ranked AS (
            SELECT s.doc_id, s.score,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY s.score DESC, s.doc_id
                   ) AS rn
            FROM scored s JOIN documents d USING (doc_id)
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM ranked WHERE rn <= {per}
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _wildcard_sql(pattern: str) -> str:
    """Wildcard-search oracle: the same exhaustive-BM25 body as
    ``_prefix_sql`` with qterms = the DISTINCT corpus terms matching
    the glob as a SQL LIKE ('*'→'%'; terms are pure token text so no
    LIKE metacharacters need escaping) — exactly the engine's
    dictionary expansion."""
    like = pattern.replace("*", "%")
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms AS (SELECT DISTINCT term FROM toks WHERE term LIKE '{like}'),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """


def _regex_sql(pattern: str) -> str:
    """Regex-search oracle: the _wildcard_sql body with qterms = the
    DISTINCT corpus terms full-matching the pattern via DuckDB's
    regexp_full_match — exactly the engine's dictionary expansion."""
    return _wildcard_sql("__QTERMS_PLACEHOLDER__").replace(
        "term LIKE '__QTERMS_PLACEHOLDER__'",
        f"regexp_full_match(term, '{pattern}')",
    )


def _fuzzy_sql(dist: int = 1) -> str:
    """Fuzzy-search oracle: the same exhaustive-BM25 body as
    ``_prefix_sql`` with qterms = the DISTINCT corpus terms within
    levenshtein distance ``dist`` of ANY query token — DuckDB's
    levenshtein is byte-based over UTF-8, which is exactly the engine's
    ``functions/fuzzy.py`` semantics (dist=2 checks the SymSpell
    delete-neighborhood path end to end)."""
    cond = " OR ".join(
        f"levenshtein(term, '{t}') <= {dist}" for t in FUZZY_QUERY.split()
    )
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms AS (SELECT DISTINCT term FROM toks WHERE {cond}),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """


def _not_sql() -> str:
    """Boolean-exclusion oracle: the exhaustive-BM25 body over the
    positive terms, minus every document containing ANY excluded
    term."""
    raw = NOT_QUERY.split()
    pos = [t for t in raw if not t.startswith("-")]
    neg = [t[1:] for t in raw if t.startswith("-") and len(t) > 1]
    pos_values = "(VALUES " + ", ".join(f"('{t}')" for t in pos) + ")"
    neg_list = ", ".join(f"'{t}'" for t in neg)
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {pos_values},
        excl AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ({neg_list})),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        WHERE doc_id NOT IN (SELECT doc_id FROM excl)
        ORDER BY score DESC, doc_id LIMIT 10
    """


# "sow" has TWO dictionary neighbors (slow, row) — the bigram LM, not
# the token-level df rank, decides which candidate phrase wins
PHRASE_SUGGEST_QUERY = "sow dat merge"


def _phrase_suggest_sql() -> str:
    """Phrase-suggester oracle (3-token pinned query): per-token top-5
    candidates (levenshtein ≤ 1; exact token first, then df DESC, term
    ASC), cross-joined into candidate phrases, scored by the pinned
    bigram stupid-backoff chain (ln(c(t1)/total) + Σ ln S(w_i|w_{i-1}),
    S = c12/c1 if c12 ≥ 2 else 0.4·c2/total), top-3 by
    (round6(logp) DESC, phrase ASC)."""
    t1, t2, t3 = PHRASE_SUGGEST_QUERY.split()

    def cand(name: str, tok: str) -> str:
        return f"""
        {name} AS (
            SELECT v.term, u.c FROM vocab v JOIN uni u ON u.term = v.term
            WHERE levenshtein(v.term, '{tok}') <= 1
            ORDER BY (v.term <> '{tok}'), v.df DESC, v.term LIMIT 5
        )"""

    return f"""
        WITH tp AS (
            SELECT doc_id, unnest(tl) AS term,
                   generate_subscripts(tl, 1) AS p
            FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
        ),
        uni AS (SELECT term, count(*)::BIGINT AS c FROM tp GROUP BY term),
        vocab AS (
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM tp GROUP BY term
        ),
        tot AS (SELECT sum(c)::DOUBLE AS t FROM uni),
        big AS (
            SELECT a.term AS w1, b.term AS w2, count(*)::BIGINT AS c
            FROM tp a JOIN tp b
            ON a.doc_id = b.doc_id AND b.p = a.p + 1
            GROUP BY 1, 2
        ),
        {cand('c1', t1)},
        {cand('c2', t2)},
        {cand('c3', t3)},
        scored AS (
            SELECT c1.term || ' ' || c2.term || ' ' || c3.term AS phrase,
                   round(
                       ln(c1.c / (SELECT t FROM tot))
                       + CASE WHEN coalesce(b12.c, 0) >= 2
                              THEN ln(b12.c::DOUBLE / c1.c)
                              ELSE ln(0.4 * c2.c / (SELECT t FROM tot)) END
                       + CASE WHEN coalesce(b23.c, 0) >= 2
                              THEN ln(b23.c::DOUBLE / c2.c)
                              ELSE ln(0.4 * c3.c / (SELECT t FROM tot)) END
                   , 6) AS logp
            FROM c1
            CROSS JOIN c2
            CROSS JOIN c3
            LEFT JOIN big b12 ON b12.w1 = c1.term AND b12.w2 = c2.term
            LEFT JOIN big b23 ON b23.w1 = c2.term AND b23.w2 = c3.term
        )
        SELECT row_number() OVER (ORDER BY logp DESC, phrase)::BIGINT AS rank,
               phrase, logp
        FROM scored ORDER BY logp DESC, phrase LIMIT 3
    """


def _dym_sql() -> str:
    """Did-you-mean oracle: per query token, the corpus term within
    levenshtein distance 1 with the highest df (docs containing it);
    an exactly-spelled token wins outright, ties df DESC then term
    ASC; tokens with no neighbor drop out."""
    values = ", ".join(f"('{t}')" for t in sorted(set(FUZZY_QUERY.split())))
    return f"""
        WITH toks AS ({_TOKS}),
        vocab AS (
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM toks GROUP BY term
        ),
        qt(token) AS (VALUES {values}),
        cand AS (
            SELECT qt.token, v.term, v.df
            FROM qt JOIN vocab v ON levenshtein(v.term, qt.token) <= 1
        ),
        pick AS (
            SELECT token, term AS suggestion, df,
                   row_number() OVER (
                       PARTITION BY token
                       ORDER BY (term = token) DESC, df DESC, term
                   ) AS rn
            FROM cand
        )
        SELECT token, suggestion, df FROM pick WHERE rn = 1 ORDER BY token
    """


def _near_sql() -> str:
    """Proximity oracle: conjunctive-BM25 scoring restricted to docs
    where the two query terms co-occur within NEAR_WINDOW tokens —
    token positions via generate_subscripts over the split token list
    (documents.text is single-space-separated tokens, so subscripts
    ARE token positions)."""
    t1, t2 = PHRASE_QUERY.split()
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_PHRASE_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        tp AS (
            SELECT doc_id, unnest(tl) AS term,
                   generate_subscripts(tl, 1) - 1 AS p
            FROM (SELECT doc_id, {_TOKLIST} AS tl FROM documents)
        ),
        near AS (
            SELECT DISTINCT a.doc_id FROM tp a JOIN tp b USING (doc_id)
            WHERE a.term = '{t1}' AND b.term = '{t2}'
              AND abs(a.p - b.p) <= {NEAR_WINDOW}
        ),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            WHERE tf.doc_id IN (SELECT doc_id FROM near)
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _bm25_and_sql() -> str:
    """Conjunctive-BM25 oracle: same scoring, but only documents that
    contain EVERY distinct query term (posting-list intersection); no
    score>0 filter — membership is defined by the intersection."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        matched AS (
            SELECT doc_id FROM tf GROUP BY doc_id
            HAVING count(DISTINCT term) = (SELECT count(*) FROM qterms)
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
            WHERE tf.doc_id IN (SELECT doc_id FROM matched)
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


_DELETE_PRED = "doc_id % 17 = 3"  # corpus.DELETE_MOD / DELETE_RESIDUE
FACET_LANG = "de"  # corpus.FACET_FILTER_LANG


def _bm25_filtered_sql() -> str:
    """Faceted-search oracle: the plain BM25 body (stats corpus-global —
    the filter narrows RESULTS only, Lucene filter-query semantics)
    restricted to docs whose lang facet matches."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        WHERE score > 0 AND doc_id IN
            (SELECT doc_id FROM documents WHERE lang = '{FACET_LANG}')
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _hybrid_rrf_sql() -> str:
    """Hybrid-retrieval oracle: BM25 top-100 and cosine top-100 fused
    with reciprocal ranks, rrf = Σ 1/(60 + rank). COALESCE order (bm25
    term first) matches the engine's accumulation order."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id),
        bmr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS r
            FROM scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT 100
        ),
        probe AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
        sims AS (
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                (SELECT e FROM probe)), 6) AS sim
            FROM embeddings
        ),
        emr AS (
            SELECT vec_id AS doc_id,
                   row_number() OVER (ORDER BY sim DESC, vec_id) AS r
            FROM sims ORDER BY sim DESC, vec_id LIMIT 100
        ),
        fused AS (
            SELECT coalesce(b.doc_id, e.doc_id) AS doc_id,
                   coalesce(1.0::DOUBLE / (60 + b.r), 0) +
                   coalesce(1.0::DOUBLE / (60 + e.r), 0) AS rrf
            FROM bmr b FULL OUTER JOIN emr e USING (doc_id)
        )
        SELECT row_number() OVER (ORDER BY rrf DESC, doc_id)::BIGINT AS rank,
               doc_id, round(rrf, 6) AS rrf
        FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """


def _facet_counts_sql() -> str:
    """Facet-counts oracle: matched docs (exhaustive OR, score > 0)
    counted per lang."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
            HAVING sum(c) > 0
        )
        SELECT d.lang AS value, count(*)::BIGINT AS n_docs
        FROM scored s JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """


def _bm25_deleted_sql() -> str:
    """Tombstone-semantics oracle: IDENTICAL stats to ``_bm25_sql``
    (n_docs / avgdl / df still count the deleted docs — Lucene's
    stats-at-merge rule, what the engine serves between ``delete_docs``
    and ``compact_index``), with tombstoned docs excluded from the
    RESULT set only."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0 AND NOT ({_DELETE_PRED})
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _bm25_purged_sql() -> str:
    """Post-compaction oracle: the tombstoned docs are GONE — stats
    (n_docs / avgdl) and per-term df are the survivors-only values, so
    this is the plain BM25 oracle over the surviving corpus."""
    surv_toks = (
        "SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))"
        f" AS term FROM documents WHERE NOT ({_DELETE_PRED})"
    )
    return f"""
        WITH toks AS ({surv_toks}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents
                          WHERE NOT ({_DELETE_PRED})) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _bool_sql(expr: str) -> str:
    """Boolean-retrieval oracle GENERATED from the same AST the engine
    evaluates (``functions/boolquery.py`` is the shared spec):
    membership = EXISTS-algebra over the token table (NOT = SQL NOT,
    complement over all documents — the engine's live-docmeta
    universe), score = BM25 sum over the distinct non-negated terms,
    zero-score members kept (LEFT JOIN + coalesce)."""
    from zensearch_ray.functions.boolquery import (
        parse_bool,
        scoring_terms,
        to_sql_predicate,
    )

    ast = parse_bool(expr)
    terms = scoring_terms(ast)
    vals = ", ".join(f"('{t}')" for t in terms) or "('')"
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        cand AS (SELECT d.doc_id FROM documents d WHERE {to_sql_predicate(ast)}),
        qterms(term) AS (VALUES {vals}),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT cand.doc_id, coalesce(sum(contrib.c), 0.0) AS score
            FROM cand LEFT JOIN contrib USING (doc_id)
            GROUP BY cand.doc_id
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _scrub_sql() -> str:
    """PII-scrub oracle: same RE2 pattern via DuckDB's regexp kernels."""
    from zensearch_ray.stages.textstats import SCRUB_PATTERN, SCRUB_REPLACEMENT

    return f"""
        SELECT doc_id,
               regexp_replace(text, '{SCRUB_PATTERN}', '{SCRUB_REPLACEMENT}', 'g')
                   AS clean_text,
               len(regexp_extract_all(text, '{SCRUB_PATTERN}'))::BIGINT AS n_masked
        FROM documents
    """


def _docs_split_sql() -> str:
    """Knuth-hash split oracle: HUGEINT product mod 2^64 matches the
    engine's uint64 wraparound exactly (doc_id ≥ 0)."""
    from zensearch_ray.pipelines.corpus import (
        SPLIT_KNUTH,
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
    )

    return f"""
        SELECT doc_id,
               CASE
                   WHEN h < {SPLIT_TRAIN_PCT} THEN 'train'
                   WHEN h < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                   ELSE 'test'
               END AS split
        FROM (
            SELECT doc_id,
                   ((doc_id::HUGEINT * {SPLIT_KNUTH})
                    % 18446744073709551616) % 100 AS h
            FROM documents
        )
    """


def _docs_sample_sql() -> str:
    """Deterministic-Bernoulli-sample oracle: HUGEINT product mod 2^64
    matches the engine's uint64 wraparound exactly (as _docs_split_sql,
    different multiplier)."""
    from zensearch_ray.pipelines.corpus import SAMPLE_KNUTH, SAMPLE_PCT

    return f"""
        SELECT doc_id FROM (
            SELECT doc_id,
                   ((doc_id::HUGEINT * {SAMPLE_KNUTH})
                    % 18446744073709551616) % 100 AS h
            FROM documents
        ) WHERE h < {SAMPLE_PCT}
    """


def _source_cap_sql() -> str:
    """Host-cap oracle: per-source ROW_NUMBER under the same
    multiplicative-hash priority, capped."""
    from zensearch_ray.pipelines.corpus import (
        CAP_HASH_MOD,
        CAP_HASH_MULT,
        SOURCE_CAP,
    )

    return f"""
        SELECT source, doc_id FROM (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id * {CAP_HASH_MULT}) % {CAP_HASH_MOD},
                                doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {SOURCE_CAP}
    """


def _frontier_delta_entry(sf_dir: str):
    from zensearch_ray.pipelines.frontier import frontier_delta

    return frontier_delta(sf_dir)


def _frontier_delta_sql() -> str:
    """Frontier-delta oracle: the pinned synthetic-link scheme computed
    ARITHMETICALLY (no HTML roundtrip) — so a match proves the Ray
    side's href collector harvested exactly the planted anchors, the
    canonicalizer produced the exact pinned form, the Bloom anti-join
    is exact, and the host cap kept exactly the K smallest urls."""
    from zensearch_ray.pipelines.frontier import (
        HOST_CAP,
        HOST_MOD,
        N_LINKS_MOD,
        PAGE_MOD,
        VISITED_LT,
        VISITED_MOD,
    )

    return f"""
        WITH links AS (
            SELECT d.doc_id,
                   'http://host' ||
                   CAST((d.doc_id*7 + j.j*13 + d.n_chars) % {HOST_MOD}
                        AS VARCHAR) ||
                   '.example/p/' ||
                   CAST((d.doc_id*31 + j.j) % {PAGE_MOD} AS VARCHAR) AS url
            FROM documents d
            JOIN (SELECT UNNEST(range(1, {N_LINKS_MOD})) AS j) j
              ON j.j <= d.doc_id % {N_LINKS_MOD}
        ),
        visited AS (
            SELECT DISTINCT url FROM links
            WHERE doc_id % {VISITED_MOD} < {VISITED_LT}
        ),
        fresh AS (
            SELECT DISTINCT url FROM links
            WHERE doc_id % {VISITED_MOD} >= {VISITED_LT}
              AND url NOT IN (SELECT url FROM visited)
        ),
        capped AS (
            SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
                   url,
                   row_number() OVER (
                       PARTITION BY regexp_extract(url, '^https?://([^/]+)', 1)
                       ORDER BY url
                   ) AS rn
            FROM fresh
        )
        SELECT host, url FROM capped WHERE rn <= {HOST_CAP}
        ORDER BY host, url
    """


def _bm25f_sql() -> str:
    """BM25F oracle: weighted tokens — every body token at weight 1
    UNION ALL the first-TITLE_WORDS (title) tokens at weight
    TITLE_BOOST; tf' = Σw per (doc, term), dl' = Σw per doc, df over
    docs with tf' > 0. Mirrors corpus.bm25f_topk exactly (engine folds
    the same weighting into the index at tokenize time)."""
    from zensearch_ray.pipelines.corpus import TITLE_BOOST, TITLE_WORDS

    return f"""
        WITH wtoks AS (
            SELECT doc_id, term, 1 AS w FROM ({_TOKS}) body
            UNION ALL
            SELECT doc_id,
                   unnest(list_slice(
                       list_filter(string_split(text, ' '), x -> x <> ''),
                       1, {TITLE_WORDS})) AS term,
                   {TITLE_BOOST} AS w
            FROM documents
        ),
        dl AS (SELECT doc_id, sum(w)::DOUBLE AS dl FROM wtoks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, sum(t.w)::DOUBLE AS tf
            FROM wtoks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _tfidf_sql() -> str:
    """SMART-ltn TF-IDF oracle: contribution (1 + ln tf)·ln(N/df) per
    matched distinct query term, score>0 filter, top-10 by (score DESC,
    doc_id ASC) — mirrors ``QueryEngine.topk_sim(similarity='tfidf')``
    expression-for-expression (round6 on both sides)."""
    return f"""
        WITH toks AS ({_TOKS}),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) * (1.0 + ln(tf.tf)) AS c
            FROM tf JOIN df USING (term)
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _lmd_sql() -> str:
    """LM-Dirichlet (mu=2000) oracle, matched-terms-only Lucene shape:
    per matched (term, doc) contribution
    ln(1 + tf·T/(mu·ctf)) + ln(mu/(dl+mu)) with T = avgdl·N and ctf the
    collection term frequency; NO zero-score filter (contributions can
    be negative) — every doc matching >=1 query term ranks. Expression
    grouping mirrors ``topk_sim(similarity='lmd')`` exactly."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        ctf AS (
            SELECT term, count(*)::DOUBLE AS ctf
            FROM toks JOIN qterms USING (term) GROUP BY term
        ),
        contrib AS (
            SELECT tf.doc_id,
                   ln(1.0 + tf.tf *
                      ((SELECT avgdl FROM stats) * (SELECT n FROM stats))
                      / (2000.0 * ctf.ctf))
                   + ln(2000.0 / (dl.dl + 2000.0)) AS c
            FROM tf
            JOIN ctf USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _lmjm_sql() -> str:
    """LM Jelinek-Mercer (λ=0.1) oracle, matched-terms-only Lucene
    shape: per matched (term, doc) contribution
    ln(1 + (1−λ)·(tf/dl) / (λ·ctf/T)) with T = avgdl·N; every
    contribution is strictly positive, so every matching doc ranks.
    Expression grouping mirrors ``topk_sim(similarity='lmjm')``."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        ctf AS (
            SELECT term, count(*)::DOUBLE AS ctf
            FROM toks JOIN qterms USING (term) GROUP BY term
        ),
        contrib AS (
            SELECT tf.doc_id,
                   ln(1.0 + (1.0 - 0.1) * (tf.tf / dl.dl)
                      / (0.1 * ctf.ctf /
                         ((SELECT avgdl FROM stats) * (SELECT n FROM stats))))
                       AS c
            FROM tf
            JOIN ctf USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _bm25_page2_sql() -> str:
    """search_after page 2: rows 11..20 of the bm25 ranking in the
    ROUNDED-score total order (round BEFORE ordering — the pagination
    contract rounds so the cursor boundary is float-reproducible; see
    QueryEngine.topk_after)."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, round(sum(c), 6) AS score
                   FROM contrib GROUP BY doc_id),
        ranked AS (
            SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
                   doc_id, score
            FROM scored WHERE score > 0
        )
        SELECT rank, doc_id, score FROM ranked
        WHERE rank BETWEEN 11 AND 20 ORDER BY rank
    """


def _bm25_boosted_sql() -> str:
    """BM25 with per-term query boosts: each term's contribution is
    multiplied by its boost from the qterms(term, boost) relation —
    the SQL image of Lucene's term^w syntax."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term, boost) AS {_BOOST_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   q.boost * ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _bm25_msm_sql() -> str:
    """BM25 restricted to docs matching >= MSM_M distinct query terms
    (minimum_should_match); the match count is the number of rows a
    doc contributes to the per-(term, doc) tf relation."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        nmatch AS (SELECT doc_id, count(*)::BIGINT AS nterms FROM tf GROUP BY doc_id),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT c.doc_id, sum(c.c) AS score
            FROM contrib c JOIN nmatch m ON c.doc_id = m.doc_id
            WHERE m.nterms >= {MSM_M}
            GROUP BY c.doc_id
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _bm25_dismax_sql() -> str:
    """Disjunction-max: score = max(c) + tie * (sum(c) - max(c)) over
    the per-term BM25 contributions — tie pinned at DISMAX_TIE."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, max(c) + {DISMAX_TIE} * (sum(c) - max(c)) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _ranking_eval_sql(k: int = 10) -> str:
    """hits/MRR/nDCG@k per probe query, from the SAME BM25 ranking CTE
    as ``_bm25_sql`` plus the conjunctive-containment relevance set
    (docs carrying EVERY query term). One UNION ALL block per query
    (each needs its own qterms CTE), ordered by query text."""
    from zensearch_ray.functions.text import tokenize

    blocks = []
    for q in sorted(EVAL_QUERIES):
        terms = sorted(set(tokenize(q)))
        values = "(VALUES " + ", ".join(f"('{t}')" for t in terms) + ")"
        blocks.append(f"""
        SELECT * FROM (
            WITH toks AS ({_TOKS}),
            qterms(term) AS {values},
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                             (SELECT avg(dl) FROM dl) AS avgdl),
            tf AS (
                SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
                FROM toks t JOIN qterms q USING (term)
                GROUP BY t.term, t.doc_id
            ),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            contrib AS (
                SELECT tf.doc_id,
                       ln((SELECT n FROM stats) / df.df) *
                       (tf.tf * 2.2) /
                       (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                       AS c
                FROM tf
                JOIN df USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
            ),
            scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id),
            ranked AS (
                SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
                       doc_id
                FROM scored WHERE score > 0
                ORDER BY score DESC, doc_id LIMIT {k}
            ),
            rel AS (
                SELECT doc_id
                FROM (SELECT DISTINCT doc_id, term FROM toks JOIN qterms USING (term))
                GROUP BY doc_id
                HAVING count(*) = (SELECT count(*) FROM qterms)
            ),
            nrel AS (SELECT count(*)::BIGINT AS n_rel FROM rel),
            lab AS (
                SELECT r.rank,
                       CASE WHEN r.doc_id IN (SELECT doc_id FROM rel)
                            THEN 1 ELSE 0 END AS rel
                FROM ranked r
            ),
            m AS (
                SELECT coalesce(sum(rel), 0)::BIGINT AS hits,
                       coalesce(max(CASE WHEN rel = 1 THEN 1.0 / rank END), 0) AS mrr,
                       coalesce(sum(CASE WHEN rel = 1 THEN 1.0 / log2(rank + 1.0) END), 0) AS dcg
                FROM lab
            ),
            ideal AS (
                SELECT coalesce(sum(1.0 / log2(i + 1.0)), 0) AS idcg
                FROM generate_series(1, {k}) AS t(i)
                WHERE i <= least((SELECT n_rel FROM nrel), {k})
            )
            SELECT '{q}' AS query,
                   (SELECT n_rel FROM nrel) AS n_rel,
                   m.hits AS hits_at_k,
                   round(m.mrr, 6) AS mrr_at_k,
                   round(CASE WHEN (SELECT idcg FROM ideal) > 0
                              THEN m.dcg / (SELECT idcg FROM ideal)
                              ELSE 0 END, 6) AS ndcg_at_k
            FROM m
        )""")
    return " UNION ALL ".join(blocks) + " ORDER BY query"


def _bm25plus_sql() -> str:
    """BM25+ (Lv & Zhai 2011): per matched DISTINCT term the
    contribution is idf · (tf_norm + 1.0) — same k1/b kernel, idf=0
    terms contribute nothing (ln(N/df)=0 zeroes both halves' weight),
    zero-score filter and (score DESC, doc_id ASC) order as BM25."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   ((tf.tf * 2.2) /
                    (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                    + 1.0)
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _boosting_sql() -> str:
    """ES boosting query: the standard BM25 score over the positive
    terms, multiplied by NEG_BOOST when the doc contains ANY negative
    term; demotion precedes the zero-score filter and the order."""
    neg_terms = sorted(set(BOOSTING_NEG_QUERY.split()))
    neg_values = "(VALUES " + ", ".join(f"('{t}')" for t in neg_terms) + ")"
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        nterms(term) AS {neg_values},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        negset AS (
            SELECT DISTINCT t.doc_id
            FROM toks t JOIN nterms n USING (term)
        ),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT c.doc_id,
                   sum(c.c) * CASE WHEN c.doc_id IN (SELECT doc_id FROM negset)
                                   THEN {NEG_BOOST} ELSE 1.0 END AS score
            FROM contrib c GROUP BY c.doc_id
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _spanfirst_sql() -> str:
    """span_first(span_or(query terms), end=SPANFIRST_N): candidates
    are docs where some query term's first occurrence sits at 1-based
    token position <= N (DuckDB ``list_position``); ranked by the
    unfiltered BM25 sum (filter-then-rank, stats corpus-global)."""
    return f"""
        WITH tl AS (SELECT doc_id, {_TOKLIST} AS l FROM documents),
        toks AS (SELECT doc_id, unnest(l) AS term FROM tl),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        qual AS (
            SELECT DISTINCT tl.doc_id
            FROM tl JOIN qterms q ON
                 list_position(tl.l, q.term) BETWEEN 1 AND {SPANFIRST_N}
        ),
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (
            SELECT doc_id, sum(c) AS score FROM contrib
            WHERE doc_id IN (SELECT doc_id FROM qual)
            GROUP BY doc_id
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _bm25_sql() -> str:
    """BM25 (k1=1.2, b=0.75, idf=ln(N/df), score>0, top-10 by score
    DESC, doc_id ASC) expressed in ANSI SQL over the documents view —
    the DuckDB oracle for both evaluation strategies."""
    return f"""
        WITH toks AS ({_TOKS}),
        dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*)::DOUBLE FROM documents) AS n,
                         (SELECT avg(dl) FROM dl) AS avgdl),
        qterms(term) AS {_BM25_VALUES},
        tf AS (
            SELECT t.term, t.doc_id, count(*)::DOUBLE AS tf
            FROM toks t JOIN qterms q USING (term)
            GROUP BY t.term, t.doc_id
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        contrib AS (
            SELECT tf.doc_id,
                   ln((SELECT n FROM stats) / df.df) *
                   (tf.tf * 2.2) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
                   AS c
            FROM tf
            JOIN df USING (term)
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank,
               doc_id, round(score, 6) AS score
        FROM scored WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 10
    """
