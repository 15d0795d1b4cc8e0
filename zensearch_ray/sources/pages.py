"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema == BASELINE.json input_hint:
  url:string (unique), warc_ts:timestamp[us], html:binary, text:string,
  lang:string.

``html`` is rendered FROM ``text`` through the template below so that
``extract(html) == text`` byte-identically by construction (the E1
conformance invariant), with distractor markup (<script>, <style>,
comments, attributes, nav/footer text outside the 12-tag set) that the
extractor must ignore.

Vocabulary is Zipfian: the top stopword-like terms appear in most
documents, forcing the salted term-shard splitting path (north_rule) to
be exercised even at small scale. A fraction of duplicate-url rows can
be appended to exercise exact dedup (keep-first-by-warc_ts).

Reference analogs: the 5 inline IndexedWebpage fixtures at
``database/test/db.test.ts:49-113`` (the reference's only corpus-like
fixture) and the ``webpages`` DDL ``db.init.sql:6-13``.
"""

from __future__ import annotations

import html as html_mod

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_2026 = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_BASE_WORDS = [
    # stopword-like head of the Zipf distribution
    "the", "a", "and", "of", "to", "in", "is", "for", "on", "with",
    "that", "this", "are", "as", "at", "by", "from", "it", "be", "or",
    # content words
    "search", "engine", "index", "query", "crawl", "page", "rank",
    "score", "token", "term", "document", "corpus", "posting", "shard",
    "batch", "stream", "arrow", "parquet", "vector", "merge", "sort",
    "filter", "join", "group", "table", "column", "block", "delta",
    "varint", "hash", "cluster", "node", "worker", "actor", "task",
    "python", "data", "web", "link", "site", "host", "text", "title",
    # mixed case + digits + unicode (exercise casefold/NFC)
    "OpenAI", "Zensearch", "RayData", "HTTP2", "v2", "10x", "café",
    "straße", "naïve", "résumé", "中文", "日本語", "привет", "ñandú",
]


def _build_vocab(rng: np.random.Generator, vocab_size: int) -> list[str]:
    vocab = list(_BASE_WORDS)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    while len(vocab) < vocab_size:
        n = int(rng.integers(3, 11))
        vocab.append("".join(rng.choice(letters, size=n)))
    return vocab[:vocab_size]


def _zipf_probs(n: int, alpha: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-alpha
    return p / p.sum()


_PUNCT = [",", ".", "!", "?", ";", ":"]


def generate_text(rng: np.random.Generator, vocab: list[str], probs: np.ndarray) -> str:
    """One document: Zipf word stream, some punctuation-attached tokens."""
    n_tokens = int(np.clip(rng.lognormal(mean=4.0, sigma=0.8), 20, 2000))
    idx = rng.choice(len(vocab), size=n_tokens, p=probs)
    words = [vocab[i] for i in idx]
    # attach punctuation to ~10% of words (tokenizer must strip it)
    n_punct = max(1, n_tokens // 10)
    for j in rng.choice(n_tokens, size=n_punct, replace=False):
        words[j] = words[j] + _PUNCT[int(rng.integers(0, len(_PUNCT)))]
    return " ".join(words)


# chunk renderers: each takes escaped chunk text -> html snippet whose
# extraction (per stages/extract.py spec) yields exactly the chunk tokens
_CHUNK_TEMPLATES = [
    lambda c: f"<h1>{c}</h1>",
    lambda c: f'<p class="body">{c}</p>',
    lambda c: f'<a href="/x">{c}</a>',
    lambda c: f"<span>{c}</span>",
    lambda c: f"<pre>{c}</pre>",
    lambda c: f"<table><tr><td>{c}</td></tr></table>",
    lambda c: f"<ul><li>{c}</li></ul>",
    lambda c: f"<code>{c}</code>",
    lambda c: f'<div data-note="ignored attribute">{c}</div>',
    # nesting: text node split across div > (direct, p, span) — each text
    # node attributed once to its nearest tag-set ancestor
    lambda c: _nested_div(c),
    lambda c: f"<h2>{c}</h2>",
    lambda c: f"<h3>{c}</h3>",
]


def _nested_div(c: str) -> str:
    ws = c.split(" ")
    third = max(1, len(ws) // 3)
    a, b, rest = " ".join(ws[:third]), " ".join(ws[third : 2 * third]), " ".join(ws[2 * third :])
    return f"<div>{a} <p>{b}</p> <span>{rest}</span></div>"


def render_html(rng: np.random.Generator, text: str, title: str) -> bytes:
    """Render text → html such that extract_text(html) == text exactly."""
    words = text.split(" ")
    chunks: list[str] = []
    i = 0
    while i < len(words):
        n = int(rng.integers(3, 40))
        chunks.append(" ".join(words[i : i + n]))
        i += n
    body_parts: list[str] = []
    for chunk in chunks:
        tmpl = _CHUNK_TEMPLATES[int(rng.integers(0, len(_CHUNK_TEMPLATES)))]
        body_parts.append(tmpl(html_mod.escape(chunk)))
        if rng.random() < 0.15:  # distractor between chunks
            body_parts.append("<!-- comment distractor -->")
    body = "\n".join(body_parts)
    # distractors: title/head/script/style/nav/footer are OUTSIDE the
    # 12-tag extract set (or skip-tags) and must contribute nothing
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{html_mod.escape(title)}</title>"
        "<style>body { color: red; } .x{font: serif}</style>"
        '<script>var distractor = "should never appear";</script>'
        "</head><body>"
        "<nav>nav distractor words here</nav>"
        f"{body}"
        "<footer>footer distractor text</footer>"
        "</body></html>"
    ).encode("utf-8")


_LANGS = ["en", "es", "de", "ja"]


_VOCAB_CACHE: dict = {}


def _vocab_and_probs(vocab_size: int, vocab_seed: int = 4242):
    """Vocabulary + Zipf probs from their OWN seed, independent of the
    row stream — so distributed shard generation shares one vocabulary."""
    key = (vocab_size, vocab_seed)
    if key not in _VOCAB_CACHE:
        rng = np.random.default_rng(vocab_seed)
        _VOCAB_CACHE[key] = (_build_vocab(rng, vocab_size), _zipf_probs(vocab_size))
    return _VOCAB_CACHE[key]


def generate_pages_table(
    n_rows: int,
    seed: int = 42,
    vocab_size: int = 2000,
    n_hosts: int = 20,
    dup_fraction: float = 0.0,
    en_fraction: float = 0.9,
    row_offset: int = 0,
) -> pa.Table:
    """Build the pages table deterministically (seed-stable).

    ``row_offset`` shifts url indices and warc_ts so disjoint shards
    generated in parallel (different seeds, contiguous offsets) form one
    coherent corpus with globally unique urls.
    """
    rng = np.random.default_rng(seed)
    vocab, probs = _vocab_and_probs(vocab_size)

    urls: list[str] = []
    texts: list[str] = []
    htmls: list[bytes] = []
    langs: list[str] = []
    for i in range(n_rows):
        host = int(rng.integers(0, n_hosts))
        w1, w2 = vocab[int(rng.integers(20, 60))], vocab[int(rng.integers(20, 60))]
        url = f"https://site{host}.example.com/{w1}-{w2}/{row_offset + i}"
        text = generate_text(rng, vocab, probs)
        title = " ".join(text.split(" ")[:4])
        urls.append(url)
        texts.append(text)
        htmls.append(render_html(rng, text, title))
        langs.append("en" if rng.random() < en_fraction else _LANGS[int(rng.integers(1, 4))])

    n_dups = int(n_rows * dup_fraction)
    for _ in range(n_dups):
        j = int(rng.integers(0, n_rows))
        urls.append(urls[j])  # same url, later warc_ts, same content
        texts.append(texts[j])
        htmls.append(htmls[j])
        langs.append(langs[j])

    total = n_rows + n_dups
    ts = pa.array(
        (EPOCH_2026 + (row_offset + np.arange(total, dtype=np.int64)) * 1_000_000),
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def generate_pages_dist(out_dir: str, n_rows: int, seed: int = 42, n_shards: int = 16, **kwargs) -> str:
    """Deterministic PARALLEL corpus generation: one Ray task per shard,
    shard i seeded ``seed*100000 + i`` with contiguous row offsets →
    identical corpus at any parallelism. Skips generation if the
    completion marker exists (generation is an input fixture, not part
    of any timed pipeline). Returns out_dir."""
    import json
    import os

    import ray

    marker = os.path.join(out_dir, "_COMPLETE.json")
    spec = {"n_rows": n_rows, "seed": seed, "n_shards": n_shards, **kwargs}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == spec:
                return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    @ray.remote
    def gen_shard(i: int) -> str:
        lo = i * n_rows // n_shards
        hi = (i + 1) * n_rows // n_shards
        table = generate_pages_table(
            hi - lo, seed=seed * 100000 + i, row_offset=lo, **kwargs
        )
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(table, path, row_group_size=4096)
        return path

    ray.get([gen_shard.remote(i) for i in range(n_shards)])
    with open(marker, "w") as f:
        json.dump(spec, f)
    return out_dir


def generate_pages_parquet(path: str, n_rows: int, seed: int = 42, **kwargs) -> str:
    """Write the pages table to one parquet file; returns path."""
    table = generate_pages_table(n_rows, seed=seed, **kwargs)
    pq.write_table(table, path, row_group_size=8192)
    return path


def documents_as_pages(sf_dir: str) -> pa.Table:
    """Adapt the driver's read-only ``documents`` table
    (doc_id, text, lang, source, n_chars) to the pages shape — used so
    DuckDB-oracle queries and the index engine share one corpus."""
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    n = t.num_rows
    urls = pa.array([f"https://docs.example.com/{d}" for d in t["doc_id"].to_pylist()])
    ts = pa.array(
        EPOCH_2026 + np.arange(n, dtype=np.int64) * 1_000_000, type=pa.timestamp("us")
    )
    htmls = pa.array([b""] * n, type=pa.binary())
    return pa.table(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": t["text"],
            "lang": t["lang"],
            "doc_id": t["doc_id"],
        }
    )
