"""Percolator (reverse search): match a REGISTERED set of boolean
queries against a stream of documents — the alerting/routing primitive
(Elasticsearch "percolate") that inverts the engine's normal direction.
The reference has no analog (its loop is crawl → index → forward
search); this is the standing-query face of the same boolean semantics
(``functions/boolquery.py`` is the shared spec, so the SQL oracle is
GENERATED from the same ASTs the percolator evaluates).

Distributed shape — the canonical broadcast-small-side pattern:

- The query set is the SMALL side. Expressions are parsed and compiled
  ONCE per actor in ``__init__`` (actor-pool ``map_batches``), never
  per batch; at cluster scale the registry ships once via the actor
  constructor (``ray.put`` under the hood), not per task.
- Documents are the BIG side and stream through: per batch, one
  tokenize pass builds a |docs| × |query-vocab| boolean membership
  matrix (only terms any query mentions — a handful of columns), and
  every AST evaluates as numpy boolean algebra over whole columns.
  No per-(doc, query) Python loop; cost is O(docs · vocab_hits +
  queries · docs) vector ops per batch.
- Output is the sparse match list ``(doc_id, query_id)`` — map-only,
  no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from zensearch_ray.functions.boolquery import all_terms, parse_bool
from zensearch_ray.functions.text import tokenize


class Percolator:
    """Actor-pool ``map_batches`` body: documents in, (doc_id,
    query_id) matches out.

    ``queries``: ``{query_id: boolean expression}`` — the standing
    registry. NOT is per-document logical complement (a document
    matches ``-spark`` iff it does not contain ``spark``); no corpus
    universe is involved, so percolation is embarrassingly parallel.
    """

    def __init__(
        self,
        queries: dict[str, str],
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.compiled = sorted(
            (qid, parse_bool(expr)) for qid, expr in queries.items()
        )
        vocab = sorted({t for _, ast in self.compiled for t in all_terms(ast)})
        self.term_col = {t: j for j, t in enumerate(vocab)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        member = np.zeros((n, len(self.term_col)), dtype=bool)
        col_of = self.term_col
        for i, text in enumerate(batch[self.text_col].to_pylist()):
            for tok in tokenize(text):
                j = col_of.get(tok)
                if j is not None:
                    member[i, j] = True

        def ev(node) -> np.ndarray:
            kind = node[0]
            if kind == "term":
                j = col_of.get(node[1])
                return member[:, j] if j is not None else np.zeros(n, dtype=bool)
            if kind == "and":
                out = ev(node[1][0])
                for c in node[1][1:]:
                    out = out & ev(c)
                return out
            if kind == "or":
                out = ev(node[1][0])
                for c in node[1][1:]:
                    out = out | ev(c)
                return out
            return ~ev(node[1])

        out_ids: list[np.ndarray] = []
        out_qids: list[str] = []
        lens: list[int] = []
        for qid, ast in self.compiled:
            hit = ev(ast)
            matched = ids[hit]
            out_ids.append(matched)
            out_qids.append(qid)
            lens.append(len(matched))
        doc_col = (
            np.concatenate(out_ids) if out_ids else np.empty(0, dtype=np.int64)
        )
        qid_col = pa.DictionaryArray.from_arrays(
            pa.array(np.repeat(np.arange(len(lens), dtype=np.int32), lens)),
            pa.array(out_qids, type=pa.string()),
        ).cast(pa.string())
        return pa.table(
            {
                "doc_id": pa.array(doc_col.astype(np.int64)),
                "query_id": qid_col,
            }
        )


def percolate(docs, queries: dict[str, str], concurrency=(1, 8)):
    """documents Dataset → sparse (doc_id, query_id) match Dataset."""
    return docs.map_batches(
        Percolator,
        fn_constructor_kwargs={"queries": queries},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
