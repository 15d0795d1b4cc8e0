"""Index aliases — the zero-downtime cutover primitive.

Elasticsearch's reindex story is only complete because of aliases:
clients address a stable name, the operator builds a NEW index behind
it (``pipelines/reindex`` here), and one atomic alias swap moves all
traffic — no client config change, no restart, instant rollback by
swapping back. The reference has no analog (its Express face hardcodes
one corpus, ``express-server/src/index.ts:43-93``); this module adds
the missing half so ``reindex`` is operationally usable.

An alias is a small JSON FILE (not a directory): ``{"index_dir": ...}``
published atomically (tmp + rename, the repo-wide commit idiom). The
serving layer (``service._EngineReplica``) resolves the alias on its
existing live-reload tick: the reload token covers BOTH the alias
target and the target index's own version token, so either an alias
swap or an in-place index change (append/delete) triggers one engine
rebuild within a reload interval. On a multi-node cluster the file
lives on shared storage exactly like the index directories themselves.
"""

from __future__ import annotations

import json
import os


def set_alias(alias_path: str, index_dir: str) -> dict:
    """Atomically point ``alias_path`` at ``index_dir``.

    The target must be a COMMITTED index (manifest present) — aliasing
    a half-built directory would expose a partial index to serving.
    Returns the alias record written."""
    from zensearch_ray.state.manifest import IndexLayout

    index_dir = os.path.realpath(index_dir)
    if not IndexLayout(index_dir).is_complete():
        raise ValueError(
            f"alias target {index_dir} is not a committed index "
            "(no global manifest) — refusing to route traffic to it"
        )
    rec = {"index_dir": index_dir}
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, alias_path)  # atomic publish
    return rec


def resolve_alias(alias_path: str) -> str:
    """The index directory an alias currently points at."""
    with open(alias_path) as f:
        return json.load(f)["index_dir"]


def resolve_if_alias(path: str) -> str:
    """Transparent resolution: an alias FILE resolves to its target;
    a directory (a real index) passes through unchanged. One level
    only — an alias pointing at an alias is a config error and fails
    the target's is-an-index check downstream."""
    if os.path.isfile(path):
        return resolve_alias(path)
    return path
