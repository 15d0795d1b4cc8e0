"""HTML → text extraction (operator E1 — THE per-row invariant).

Reference semantics (``crawler/internal/crawler/page_navigator.go:220-301``
with the selector list at ``crawler/internal/crawler/crawler.go:18-31``):
collect the rendered text of every element matching the 12 CSS selectors
``a p span pre h1 h2 h3 h4 td ul code div`` and join with single spaces.

Pinned deterministic rebuild spec (FIXTURES.md §2, no browser):

  * parse ``html`` with a pure-Python HTML parser;
  * a text node is EXTRACTED iff it has an ancestor whose tag is in the
    12-tag set (attribution to the nearest such ancestor — each text
    node counted exactly once, no double-counting through nesting) and
    no ``script``/``style`` ancestor; comments are ignored;
  * text nodes are whitespace-split; all extracted tokens across the
    document, in document order, are joined with single spaces.

The fixture generator (``zensearch_ray.sources.pages``) renders html
whose extraction under this spec reproduces the source ``text``
byte-for-byte; ``tests/test_extract.py`` asserts equality per url.

Ray-side: a stateless ``map_batches`` transform over zero-copy Arrow
batches (``batch_format="pyarrow"``) — parsing is per-row Python by
necessity (an HTML grammar has no Arrow kernel), but batch I/O stays
columnar Arrow and the stage is embarrassingly parallel.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

import pyarrow as pa

EXTRACT_TAGS = frozenset(
    {"a", "p", "span", "pre", "h1", "h2", "h3", "h4", "td", "ul", "code", "div"}
)
_SKIP_TAGS = frozenset({"script", "style"})
# HTML void elements never get an end tag — must not stay on the stack.
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._stack: list[str] = []
        self._depth_extract = 0  # ancestors in EXTRACT_TAGS
        self._depth_skip = 0  # ancestors in _SKIP_TAGS
        self._depth_title = 0  # inside <title> (reference types.go Title)
        self.tokens: list[str] = []
        self.title_tokens: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            return
        self._stack.append(tag)
        if tag in EXTRACT_TAGS:
            self._depth_extract += 1
        elif tag in _SKIP_TAGS:
            self._depth_skip += 1
        elif tag == "title":
            self._depth_title += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        # pop to the nearest matching open tag (tolerates mild malformed nesting)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i] == tag:
                for popped in reversed(self._stack[i:]):
                    if popped in EXTRACT_TAGS:
                        self._depth_extract -= 1
                    elif popped in _SKIP_TAGS:
                        self._depth_skip -= 1
                    elif popped == "title":
                        self._depth_title -= 1
                del self._stack[i:]
                break

    def handle_data(self, data: str) -> None:
        if self._depth_title > 0:
            self.title_tokens.extend(data.split())
        elif self._depth_extract > 0 and self._depth_skip == 0:
            self.tokens.extend(data.split())


def extract_text_and_title_reference(html: bytes | str) -> tuple[str, str]:
    """REFERENCE implementation of the pinned E1 spec via
    ``html.parser.HTMLParser`` — kept as the conformance referee for
    the fast path below (``tests/test_extract.py`` asserts equality on
    fixtures and adversarial html)."""
    if isinstance(html, (bytes, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return " ".join(parser.tokens), " ".join(parser.title_tokens)


# fast path: one compiled scan over the document. Tag tokens (with
# quoted attributes, so '>' inside "..."/'...' doesn't end the tag),
# comments, and declarations match; a bare '<' in text falls through
# as text — the same tokenization HTMLParser produces for these cases.
# The tag NAME is captured by the scan itself (group 1 = closing tag,
# group 2 = opening tag) so the loop never runs a second name regex
# per tag — measured ~1.3x on the fixture corpus, byte-identical
# output (referee equality below and in tests/test_extract.py).
_TOKEN_RE = re.compile(
    r"""<!--.*?-->"""
    r"""|</([a-zA-Z][a-zA-Z0-9]*)[^>'"]*(?:"[^"]*"[^>'"]*|'[^']*'[^>'"]*)*>"""
    r"""|<([a-zA-Z][a-zA-Z0-9]*)[^>'"]*(?:"[^"]*"[^>'"]*|'[^']*'[^>'"]*)*>"""
    r"""|<![^>]*>|<\?[^>]*>""",
    re.DOTALL,
)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}


def extract_text_and_title(html: bytes | str) -> tuple[str, str]:
    """(body text, <title> text) of one HTML document under the pinned
    E1 spec. The title rides the whole result path like the reference's
    ``IndexedWebpage.Title`` (``search-engine/internal/types/types.go:3-13``,
    rendered at ``express-server/src/app/index.ts:194-197``).

    Compiled-regex scan + explicit tag stack — ~2.2× the HTMLParser
    referee at identical output (the extract stage is ~1/3 of build
    wall at 1M pages); script/style bodies are skipped as rawtext
    exactly like HTMLParser's CDATA mode."""
    if isinstance(html, (bytes, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    tokens: list[str] = []
    title_tokens: list[str] = []
    stack: list[str] = []
    d_ext = d_skip = d_title = 0
    pos, n = 0, len(html)
    search = _TOKEN_RE.search
    while pos < n:
        m = search(html, pos)
        text = html[pos:m.start()] if m else html[pos:]
        if text and (d_title > 0 or (d_ext > 0 and d_skip == 0)):
            if "&" in text:
                text = unescape(text)
            (title_tokens if d_title > 0 else tokens).extend(text.split())
        if m is None:
            break
        close_name, open_name = m.group(1), m.group(2)
        pos = m.end()
        if close_name is not None:
            tag = close_name.lower()
            for i in range(len(stack) - 1, -1, -1):
                if stack[i] == tag:
                    for popped in reversed(stack[i:]):
                        if popped in EXTRACT_TAGS:
                            d_ext -= 1
                        elif popped in _SKIP_TAGS:
                            d_skip -= 1
                        elif popped == "title":
                            d_title -= 1
                    del stack[i:]
                    break
        elif open_name is not None:
            tag = open_name.lower()
            if tag in _VOID_TAGS or m.group(0).endswith("/>"):
                continue
            if tag in _RAWTEXT_CLOSE:
                mm = _RAWTEXT_CLOSE[tag].search(html, pos)
                pos = mm.end() if mm else n
                continue
            stack.append(tag)
            if tag in EXTRACT_TAGS:
                d_ext += 1
            elif tag == "title":
                d_title += 1
        # else: comment / declaration / processing instruction — skip
    return " ".join(tokens), " ".join(title_tokens)


def extract_text(html: bytes | str) -> str:
    """Extract text from one HTML document under the pinned E1 spec."""
    return extract_text_and_title(html)[0]


def extract_batch(
    batch: pa.Table,
    html_col: str = "html",
    out_col: str = "text",
    title_col: str = "title",
) -> pa.Table:
    """``map_batches`` body: html binary column → extracted text +
    title columns. Replaces ``out_col`` if present (used by conformance
    tests to recompute and compare).
    """
    pairs = [extract_text_and_title(h) for h in batch[html_col].to_pylist()]
    texts = pa.array([p[0] for p in pairs], type=pa.string())
    titles = pa.array([p[1] for p in pairs], type=pa.string())
    if out_col in batch.column_names:
        idx = batch.column_names.index(out_col)
        batch = batch.set_column(idx, out_col, texts)
    else:
        batch = batch.append_column(out_col, texts)
    if title_col in batch.column_names:
        idx = batch.column_names.index(title_col)
        return batch.set_column(idx, title_col, titles)
    return batch.append_column(title_col, titles)


# anchor-href collector (operator E2's harvesting half — the link walk
# of ``crawler/internal/crawler/page_navigator.go:93-218``). Pinned
# REGEX-ONLY spec so any engine (including a SQL regexp_extract_all
# oracle) reproduces the harvest: every <a ...> tag's href value, in
# document order, double/single/unquoted forms, entities unescaped.
_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE,
)


def extract_links(html: bytes | str) -> list[str]:
    """href values of every anchor tag of one HTML document, in
    document order (duplicates preserved — frontier counting is the
    caller's concern)."""
    if isinstance(html, (bytes, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        href = next(g for g in m.groups() if g is not None)
        if href:
            out.append(unescape(href))
    return out


# fragment-local form of _HREF_RE after splitting on "<a\s": the
# consumed "<a" + one whitespace become the fragment boundary, the
# rest of the tag match is byte-identical. Exactly one alternative
# participates per match; RE2 leaves the others as EMPTY child fields,
# so the concatenation of the three IS the matched href.
_HREF_FRAG_PAT = (
    r"""(?i)^[^>]*?href\s*=\s*"""
    r"""(?:"(?P<d>[^"]*)"|'(?P<s>[^']*)'|(?P<u>[^\s>"']+))"""
)


def extract_links_arrow(html) -> tuple["np.ndarray", pa.Array]:
    """Arrow-vectorized link harvest over a whole html column:
    ``(row_idx, href)`` for every anchor href, document order
    preserved per row — RE2 split on ``<a\\s`` + one ``extract_regex``
    over the fragments instead of a Python ``finditer`` per document
    (the ``grep_docs`` pattern). ``extract_links`` is the per-document
    referee; the two are fuzz-checked equivalent in
    ``test_frontier.py``. Entity unescaping falls back to Python for
    the (rare) hrefs that actually carry a ``&``."""
    import numpy as np
    import pyarrow.compute as pc

    if not isinstance(html, (pa.Array, pa.ChunkedArray)):
        html = pa.array(html, type=pa.string())
    s = pc.cast(html, pa.string())
    frags = pc.split_pattern_regex(s, r"(?i)<a\s")
    if isinstance(frags, pa.ChunkedArray):
        frags = frags.combine_chunks()
    offs = frags.offsets.to_numpy()
    vals = frags.values
    counts = np.diff(offs)
    row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = np.ones(len(vals), dtype=bool)
    # each row's FIRST fragment precedes its first anchor (e.g. a
    # <base href=...> in the head) — never a harvested link
    keep[offs[:-1][counts > 0]] = False
    idx = np.flatnonzero(keep)
    if len(idx) == 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    sub = vals.take(pa.array(idx))
    rows = row_of[idx]
    ex = pc.extract_regex(sub, _HREF_FRAG_PAT)
    d, s_, u = (ex.field(k) for k in ("d", "s", "u"))
    href = pc.binary_join_element_wise(d, s_, u, "")
    valid = pc.is_valid(ex).to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(
        pc.coalesce(href, pa.scalar(""))
    ).to_numpy(zero_copy_only=False)
    sel = np.flatnonzero(valid & (lens > 0))  # `if href:` semantics
    hrefs = href.take(pa.array(sel))
    rows = rows[sel]
    amp = pc.match_substring(hrefs, "&").to_numpy(zero_copy_only=False)
    if amp.any():
        py = hrefs.to_pylist()
        for i in np.flatnonzero(amp):
            py[i] = unescape(py[i])
        hrefs = pa.array(py, pa.string())
    return rows, hrefs


def extract_links_batch(
    batch: pa.Table, html_col: str = "html", id_col: str = "doc_id",
    out_col: str = "href",
) -> pa.Table:
    """``map_batches`` body: html column → flat (id, href) link rows
    (one row per harvested anchor), via the vectorized collector."""
    rows, hrefs = extract_links_arrow(batch[html_col])
    return pa.table(
        {
            id_col: batch[id_col].take(pa.array(rows)),
            out_col: hrefs,
        }
    )
