"""zensearch_ray — a Ray-Data-native full-text index + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of the
reference (francccisss/zensearch): HTML extraction, Unicode tokenization,
inverted-index construction (delta+varint posting lists with block-max
metadata, term-sharded shuffle, salted skew splitting), BM25 top-k query
serving, plus the large-scale training-data operators a 100 TB pipeline
needs (dedup families, ANN, text analysis, windowed aggregates).

Execution model: ``ray.data.Dataset`` pipelines — ``map_batches`` over
zero-copy Arrow batches for all per-record work, one term-sharded
``groupby`` shuffle for index construction, actor pools for stateful
stages. Library code never calls ``ray.init``.
"""

from zensearch_ray.functions.text import tokenize, doc_length
from zensearch_ray.functions.bm25 import BM25Params

__all__ = ["tokenize", "doc_length", "BM25Params"]
__version__ = "0.1.0"
