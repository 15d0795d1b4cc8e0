"""Deterministic, process-stable hashing for ids and shard keys.

Python's builtin ``hash`` is salted per process — never usable for
cross-task partitioning. Everything here is blake2b-based and stable
across processes/nodes (required so every Ray task computes the same
shard for the same term, and doc_ids are reproducible).
"""

from __future__ import annotations

from hashlib import blake2b



def hash64(s: str | bytes) -> int:
    """Stable 63-bit non-negative hash (fits int64)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(blake2b(s, digest_size=8).digest(), "big") >> 1


def url_doc_id(url: str) -> int:
    """doc_id for a page = stable 63-bit hash of its unique url.

    Replaces the reference's ``id CHAR(60)`` uuid key
    (``database/src/database.ts:49-57``, ``db.init.sql:6-13``) with a
    deterministic content-derived id — no global coordination needed to
    assign ids at 10^12-doc scale. Collision probability at N=10^12 is
    ~N²/2^64 ≈ 5e-5 for the 63-bit space; acceptable for ranking and
    documented here as the design assumption.
    """
    return hash64(url)


def term_shard(term: str, num_shards: int) -> int:
    """Term-shard key = hash(term) % num_shards (SURVEY.md §4.2)."""
    return hash64(term) % num_shards


