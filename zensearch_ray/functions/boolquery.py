"""Boolean query parser: AND / OR / NOT with parentheses over the
pinned tokenizer's terms.

Grammar (UPPERCASE keywords — the pinned tokenizer lowercases terms, so
``and``/``or``/``not`` in lowercase are ordinary searchable terms)::

    expr    := orexpr
    orexpr  := andexpr (OR andexpr)*
    andexpr := unary (AND? unary)*       # adjacency = implicit AND
    unary   := NOT unary | '-' unary | atom
    atom    := '(' expr ')' | word

A word is normalized by the pinned tokenizer; a word that normalizes to
several tokens (e.g. ``"HTTP/2"`` → ``http 2``) becomes their AND. The
reference's search box is a plain term list (express-server
``index.ts:175-203``); this is the standard engine upgrade of that
surface.

AST nodes are plain tuples — ("term", tok) | ("and", [..]) |
("or", [..]) | ("not", node) — consumed by ``QueryEngine.topk_bool``
and mirrored by the SQL oracle generator in ``__ray_entry__``.
"""

from __future__ import annotations

import re

from zensearch_ray.functions.text import tokenize

_LEX = re.compile(r"\(|\)|-|\bAND\b|\bOR\b|\bNOT\b|[^()\s-]+")


class BoolParseError(ValueError):
    pass


def _lex(query: str) -> list[str]:
    return _LEX.findall(query)


def parse_bool(query: str):
    """Parse ``query`` → AST. Raises BoolParseError on malformed input
    (dangling operator, unbalanced parens, empty expression)."""
    toks = _lex(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        parts = [parse_and()]
        while peek() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def parse_and():
        parts = [parse_unary()]
        while peek() is not None and peek() not in (")", "OR"):
            if peek() == "AND":
                take()
            parts.append(parse_unary())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def parse_unary():
        t = peek()
        if t in ("NOT", "-"):
            take()
            return ("not", parse_unary())
        return parse_atom()

    def parse_atom():
        t = peek()
        if t is None or t in ("AND", "OR", ")"):
            raise BoolParseError(f"expected a term, got {t!r}")
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise BoolParseError("unbalanced parentheses")
            take()
            return node
        take()
        words = tokenize(t)
        if not words:
            raise BoolParseError(f"term {t!r} normalizes to nothing")
        if len(words) == 1:
            return ("term", words[0])
        return ("and", [("term", w) for w in words])

    if not toks:
        raise BoolParseError("empty query")
    node = parse_or()
    if pos != len(toks):
        raise BoolParseError(f"trailing input at {toks[pos]!r}")
    return node


def all_terms(ast) -> list[str]:
    """Every distinct term in the expression (negated or not), sorted —
    the vocabulary a membership evaluator (e.g. the percolator) needs."""
    out: set[str] = set()

    def walk(node):
        kind = node[0]
        if kind == "term":
            out.add(node[1])
        elif kind == "not":
            walk(node[1])
        else:
            for c in node[1]:
                walk(c)

    walk(ast)
    return sorted(out)


def to_sql_predicate(ast, toks_alias: str = "toks", doc_alias: str = "d") -> str:
    """Render the AST as a SQL membership predicate over a
    ``(doc_id, term)`` token table — EXISTS-algebra, NOT = SQL NOT.
    Shared by the boolean-retrieval and percolator oracles so the SQL
    is GENERATED from the same AST the engine evaluates."""
    kind = ast[0]
    if kind == "term":
        return (
            f"EXISTS (SELECT 1 FROM {toks_alias} t "
            f"WHERE t.doc_id = {doc_alias}.doc_id AND t.term = '{ast[1]}')"
        )
    if kind == "and":
        return "(" + " AND ".join(
            to_sql_predicate(c, toks_alias, doc_alias) for c in ast[1]
        ) + ")"
    if kind == "or":
        return "(" + " OR ".join(
            to_sql_predicate(c, toks_alias, doc_alias) for c in ast[1]
        ) + ")"
    return "NOT " + to_sql_predicate(ast[1], toks_alias, doc_alias)


def scoring_terms(ast) -> list[str]:
    """Distinct terms with at least one occurrence OUTSIDE any NOT —
    the Lucene rule: negated clauses filter but never score. Sorted for
    determinism."""
    out: set[str] = set()

    def walk(node, negated: bool):
        kind = node[0]
        if kind == "term":
            if not negated:
                out.add(node[1])
        elif kind == "not":
            walk(node[1], True)
        else:
            for c in node[1]:
                walk(c, negated)

    walk(ast, False)
    return sorted(out)
