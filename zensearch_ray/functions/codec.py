"""Delta + varint posting-list codec with block-max metadata.

The reference has no index at all (it re-scans the whole corpus per
query — ``database/src/database.ts:93-104`` + ``search-engine/main.go:127-143``);
its only "compression" artifact is a dead zlib stub
(``search-engine/utilities/compression.go:22-46``). Per BASELINE.json
north_rule, the rebuild stores real compressed postings:

  - doc_ids: strictly increasing int64 → delta-encoded (first value
    absolute, then gaps) → LEB128 varint bytes.
  - tfs / dls: positive small ints → varint bytes (no delta).
  - block-max: per block of ``block_size`` postings, the last doc_id
    (skip pointer) and a float32 UPPER BOUND of the BM25 TF-norm of any
    posting in the block (conservative: rounded toward +inf so pruning
    with it is rank-preserving).

Everything is numpy-vectorized — no Python loop over postings.
"""

from __future__ import annotations

import numpy as np

from zensearch_ray.functions.bm25 import BM25Params, tf_norm

BLOCK_SIZE = 128  # postings per block-max block
_MAX_VARINT_BYTES = 10  # 64-bit values need at most ceil(64/7) = 10 bytes


def _max_varint_len(vals: np.ndarray) -> int:
    """Bytes the LARGEST value needs — caps the work matrices below.
    With dense doc_ids most deltas are 1-2 bytes, so sizing the matrix
    to the max (instead of the worst-case 10) cuts encode CPU ~4x
    (measured: encode dominated in-partition build time at 1M docs)."""
    if vals.size == 0:
        return 1
    m = int(vals.max())
    return max(1, (m.bit_length() + 6) // 7)


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """(LEB128 blob, per-value byte lengths) in ONE pass — the emitted
    mask is the expensive part and both outputs need it."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    width = _max_varint_len(vals)
    if width == 1:  # all values < 128 → the bytes ARE the values
        return vals.astype(np.uint8).tobytes(), np.ones(vals.size, dtype=np.int64)
    shifts = (np.arange(width, dtype=np.uint64) * np.uint64(7))
    shifted = vals[:, None] >> shifts[None, :]  # (n, width)
    groups = shifted & np.uint64(0x7F)
    # byte i is emitted iff i == 0 or vals >> 7i != 0
    emitted = shifted != 0
    emitted[:, 0] = True
    # continuation bit set iff a later byte is emitted
    cont = np.zeros_like(emitted)
    cont[:, :-1] = emitted[:, 1:]
    out = (groups | (cont.astype(np.uint64) << np.uint64(7))).astype(np.uint8)
    return out[emitted].tobytes(), emitted.sum(axis=1).astype(np.int64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints, vectorized (byte
    matrix capped at the largest value's width; see
    ``varint_encode_with_lengths``)."""
    return varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, vectorized via reduceat."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((arr & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its value
    offsets = np.arange(arr.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    contrib = (arr.astype(np.uint64) & np.uint64(0x7F)) << (offsets.astype(np.uint64) * np.uint64(7))
    return np.add.reduceat(contrib, starts)


def _varint_byte_lengths(vals: np.ndarray) -> np.ndarray:
    """Bytes each value occupies in LEB128 (vectorized; matrix width
    capped at the max value's byte length)."""
    width = _max_varint_len(vals)
    if width == 1:
        return np.ones(vals.size, dtype=np.int64)
    shifts = (np.arange(width, dtype=np.uint64) * np.uint64(7))
    emitted = (vals[:, None] >> shifts[None, :]) != 0
    emitted[:, 0] = True
    return emitted.sum(axis=1).astype(np.int64)


def varint_block_offsets(vals: np.ndarray, block_size: int) -> np.ndarray:
    """Byte offset of each block's first value within the varint blob —
    the skip pointers that make per-block partial decode possible."""
    vals = np.asarray(vals, dtype=np.uint64)
    if vals.size == 0:
        return np.empty(0, dtype=np.int32)
    lens = _varint_byte_lengths(vals)
    cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return cum[::block_size].astype(np.int32)


def delta_encode_docids(doc_ids: np.ndarray, block_size: int = BLOCK_SIZE) -> bytes:
    """Strictly-increasing int64 doc_ids → delta gaps → varint bytes.

    The delta chain RESTARTS at every block boundary (the block's first
    doc_id is stored absolute) so a block can be decoded independently
    given its byte offset — required for block-max skip decoding.
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    if ids[0] < 0:
        # negative ids would varint-wrap and silently break block-skip
        # decoding (query-time candidate misses) — fail at build time
        raise ValueError("doc_ids must be non-negative")
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    if ids.size > 1 and deltas[1:].min() <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    deltas[::block_size] = ids[::block_size]  # absolute restart per block
    return varint_encode(deltas.astype(np.uint64))


def delta_deltas_for_offsets(doc_ids: np.ndarray, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """The uint64 delta stream delta_encode_docids() varint-encodes
    (exposed so offset computation shares one definition)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return np.empty(0, dtype=np.uint64)
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    deltas[::block_size] = ids[::block_size]
    return deltas.astype(np.uint64)


def delta_decode_docids(buf: bytes | memoryview, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Inverse of delta_encode_docids → int64 doc_ids (full decode)."""
    deltas = varint_decode(buf).astype(np.int64)
    n = deltas.size
    if n == 0:
        return deltas
    cs = np.cumsum(deltas)
    starts = np.arange(0, n, block_size)
    # subtract the running sum accumulated before each block restart so
    # each block's cumsum starts from its absolute first doc_id
    base = np.zeros(len(starts), dtype=np.int64)
    base[1:] = cs[starts[1:] - 1]
    lens = np.diff(np.concatenate((starts, [n])))
    return cs - np.repeat(base, lens)


def block_metadata(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    params: BM25Params,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block (last_doc_id, max TF-norm upper bound float32).

    The float32 bound is nudged up one ULP so that float32 rounding can
    never make pruning unsafe (block_max ≥ true max for every posting).
    """
    n = len(doc_ids)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    norms = tf_norm(np.asarray(tfs), np.asarray(dls), avgdl, params)
    starts = np.arange(0, n, block_size)
    last = np.minimum(starts + block_size, n) - 1
    block_last_doc = np.asarray(doc_ids, dtype=np.int64)[last]
    block_max = np.maximum.reduceat(norms, starts).astype(np.float32)
    block_max = np.nextafter(block_max, np.float32(np.inf), dtype=np.float32)
    return block_last_doc, block_max


def encode_posting(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    params: BM25Params,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one term's posting list → the segment-row payload dict.

    dls (per-posting doc length) are stored inline so a shard is
    self-contained at query time — no doc_id → doc_len lookup join
    across shards at 10^12-doc scale (SURVEY.md §4.2).
    """
    block_last_doc, block_max = block_metadata(doc_ids, tfs, dls, avgdl, params, block_size)
    tfs_u = np.asarray(tfs, dtype=np.uint64)
    dls_u = np.asarray(dls, dtype=np.uint64)
    return {
        "df": int(len(doc_ids)),
        "docs": delta_encode_docids(doc_ids, block_size),
        "tfs": varint_encode(tfs_u),
        "dls": varint_encode(dls_u),
        "block_last_doc": block_last_doc,
        "block_max": block_max,
        "block_doc_off": varint_block_offsets(
            delta_deltas_for_offsets(doc_ids, block_size), block_size
        ),
        "block_tf_off": varint_block_offsets(tfs_u, block_size),
        "block_dl_off": varint_block_offsets(dls_u, block_size),
    }


def encode_partition(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    avgdl: float,
    params: BM25Params,
    block_size: int = BLOCK_SIZE,
    flat_positions: np.ndarray | None = None,
):
    """Encode ALL terms of one sorted partition in a single vectorized
    pass per column — no Python loop over terms.

    Inputs are the partition's postings sorted by (term, doc_id);
    ``starts``/``ends`` delimit each term's run. Byte-identical to
    calling ``encode_posting`` per term (same delta-restart scheme),
    but one ``varint_encode`` per column instead of three per TERM —
    the Zipf vocabulary tail makes per-term calls the build bottleneck.

    Returns a dict of pyarrow arrays ready to assemble the segment
    table: df, docs, tfs, dls (binary, zero-copy slices of one blob via
    offset buffers), block_last_doc, block_max, block_*_off (lists).
    """
    import pyarrow as pa

    n = len(doc_ids)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens = ends - starts
    doc_ids = np.asarray(doc_ids, dtype=np.int64)

    # --- delta stream with absolute restarts at term starts + block
    # boundaries within each term (identical to delta_encode_docids) ---
    off_in_term = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    restart = (off_in_term % block_size) == 0
    prev = np.empty_like(doc_ids)
    if n:
        prev[0] = 0
        prev[1:] = doc_ids[:-1]
    gaps = doc_ids - prev
    if np.any(~restart & (gaps <= 0)):
        raise ValueError("doc_ids must be strictly increasing within a term")
    if n and doc_ids.min() < 0:
        raise ValueError("doc_ids must be non-negative")
    deltas = np.where(restart, doc_ids, gaps).astype(np.uint64)
    tfs_u = np.asarray(tfs).astype(np.uint64)
    dls_u = np.asarray(dls).astype(np.uint64)

    def stream(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
        """(varint blob, cumulative byte offset per value incl. end)."""
        blob, lens = varint_encode_with_lengths(vals)
        cum = np.empty(len(vals) + 1, dtype=np.int64)
        cum[0] = 0
        np.cumsum(lens, out=cum[1:])
        return blob, cum

    docs_blob, doc_cum = stream(deltas)
    tfs_blob, tf_cum = stream(tfs_u)
    dls_blob, dl_cum = stream(dls_u)

    def binary_col(blob: bytes, cum: np.ndarray) -> pa.Array:
        # terms tile the partition → per-term byte ranges are contiguous;
        # build the BinaryArray zero-copy from an offsets buffer
        offs = np.empty(len(starts) + 1, dtype=np.int32)
        offs[:-1] = cum[starts]
        offs[-1] = cum[n]
        if cum[n] >= 2**31:  # int32 offset overflow would truncate —
            # raise (not assert: must survive python -O), split shards finer
            raise ValueError(
                f"partition posting blob {cum[n]} bytes exceeds int32 binary "
                "offsets; increase num_shards/salt_subs"
            )
        return pa.Array.from_buffers(
            pa.binary(),
            len(starts),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)],
        )

    # --- global block metadata, sliced per term via list offsets ---
    norms = tf_norm(np.asarray(tfs), np.asarray(dls), avgdl, params)
    block_starts = np.flatnonzero(restart)
    block_ends = np.concatenate((block_starts[1:] - 1, [n - 1])) if n else block_starts
    block_last = doc_ids[block_ends]
    bmax = np.maximum.reduceat(norms, block_starts).astype(np.float32) if n else np.empty(0, np.float32)
    bmax = np.nextafter(bmax, np.float32(np.inf), dtype=np.float32)

    n_blocks = ((lens + block_size - 1) // block_size).astype(np.int64)
    list_offs = np.zeros(len(starts) + 1, dtype=np.int32)
    list_offs[1:] = np.cumsum(n_blocks).astype(np.int32)

    def list_col(values: pa.Array) -> pa.Array:
        return pa.ListArray.from_arrays(pa.array(list_offs, type=pa.int32()), values)

    # per-block BYTE offsets relative to the term's blob slice
    term_of_block = np.repeat(np.arange(len(starts), dtype=np.int64), n_blocks)

    def block_off(cum: np.ndarray) -> pa.Array:
        rel = (cum[block_starts] - cum[starts[term_of_block]]).astype(np.int32)
        return list_col(pa.array(rel, type=pa.int32()))

    out = {
        "df": pa.array(lens, type=pa.int64()),
        "docs": binary_col(docs_blob, doc_cum),
        "tfs": binary_col(tfs_blob, tf_cum),
        "dls": binary_col(dls_blob, dl_cum),
        "block_last_doc": list_col(pa.array(block_last, type=pa.int64())),
        "block_max": list_col(pa.array(bmax, type=pa.float32())),
        "block_doc_off": block_off(doc_cum),
        "block_tf_off": block_off(tf_cum),
        "block_dl_off": block_off(dl_cum),
    }

    if flat_positions is not None:
        # positional stream: per POSTING (doc) the delta chain restarts
        # absolute (first position as-is, then gaps — positions are
        # strictly increasing within a doc), so any doc's positions are
        # independently decodable once the posting's token offset is
        # known from the tf stream. One varint pass over the whole
        # partition, same as the other columns.
        tfs64 = np.asarray(tfs, dtype=np.int64)
        tok_cum = np.empty(n + 1, dtype=np.int64)
        tok_cum[0] = 0
        np.cumsum(tfs64, out=tok_cum[1:])
        total_toks = int(tok_cum[n])
        flat_pos = np.asarray(flat_positions, dtype=np.int64)
        if len(flat_pos) != total_toks:
            raise ValueError(
                f"positions length {len(flat_pos)} != sum(tf) {total_toks}"
            )
        row_start = np.zeros(total_toks, dtype=bool)
        row_start[tok_cum[:n][tfs64 > 0]] = True
        prev = np.empty_like(flat_pos)
        if total_toks:
            prev[0] = 0
            prev[1:] = flat_pos[:-1]
        pgaps = flat_pos - prev
        if np.any(~row_start & (pgaps <= 0)):
            raise ValueError("positions must be strictly increasing within a doc")
        if total_toks and flat_pos.min() < 0:
            raise ValueError("positions must be non-negative")
        pos_blob, pos_cum = stream(
            np.where(row_start, flat_pos, pgaps).astype(np.uint64)
        )
        # per-term byte offsets: term t's positions span the token range
        # [tok_cum[starts[t]], tok_cum[ends[t]])
        offs = np.empty(len(starts) + 1, dtype=np.int32)
        offs[:-1] = pos_cum[tok_cum[starts]]
        offs[-1] = pos_cum[total_toks]
        if pos_cum[total_toks] >= 2**31:
            raise ValueError(
                f"partition position blob {pos_cum[total_toks]} bytes exceeds "
                "int32 binary offsets; increase num_shards/salt_subs"
            )
        out["pos"] = pa.Array.from_buffers(
            pa.binary(),
            len(starts),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(pos_blob)],
        )
    return out


def decode_positions(pos_buf, tfs: np.ndarray) -> np.ndarray:
    """Decode one term's positional blob → flat int64 token positions.

    ``tfs`` is the term's per-posting tf array (already decoded) — its
    cumulative sums are the row boundaries where the delta chain
    restarts absolute. Returns the flat positions; the caller slices
    posting ``j``'s positions as ``flat[cum[j]:cum[j+1]]``.
    """
    deltas = varint_decode(pos_buf).astype(np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if len(deltas) != int(tfs.sum()):
        raise ValueError("positional blob length mismatch with tf stream")
    if len(deltas) == 0:
        return deltas
    starts = np.empty(len(tfs), dtype=np.int64)
    starts[0] = 0
    np.cumsum(tfs[:-1], out=starts[1:])
    starts = starts[tfs > 0]
    cs = np.cumsum(deltas)
    base = np.zeros(len(starts), dtype=np.int64)
    base[1:] = cs[starts[1:] - 1]
    counts = tfs[tfs > 0]
    return cs - np.repeat(base, counts)


def permute_flat_by_rows(
    flat: np.ndarray, counts: np.ndarray, order: np.ndarray
) -> np.ndarray:
    """Reorder a flat values array whose rows have ``counts[i]`` values
    each, by row permutation ``order`` — vectorized (ranges-gather), no
    Python loop over rows. Used to keep per-posting position lists
    aligned when postings are re-sorted (e.g. compaction merge)."""
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.empty(len(counts), dtype=np.int64)
    if len(counts):
        starts[0] = 0
        np.cumsum(counts[:-1], out=starts[1:])
    sel_starts = starts[order]
    sel_counts = counts[order]
    total = int(sel_counts.sum())
    if total == 0:
        return flat[:0]
    out_base = np.empty(len(sel_counts), dtype=np.int64)
    out_base[0] = 0
    np.cumsum(sel_counts[:-1], out=out_base[1:])
    idx = np.repeat(sel_starts - out_base, sel_counts) + np.arange(total)
    return flat[idx]


def decode_posting(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a segment row → (doc_ids int64, tfs int64, dls int64)."""
    doc_ids = delta_decode_docids(row["docs"])
    tfs = varint_decode(row["tfs"]).astype(np.int64)
    dls = varint_decode(row["dls"]).astype(np.int64)
    return doc_ids, tfs, dls


def decode_posting_blocks(
    row: dict, block_indices: np.ndarray, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONLY the selected blocks of a posting (skip decoding).

    ``block_indices`` must be sorted ascending. Uses the per-block byte
    offsets; each block's delta chain restarts absolute, so blocks are
    independently decodable. Returns concatenated (doc_ids, tfs, dls)
    for the selected blocks.
    """
    doc_off = np.asarray(row["block_doc_off"], dtype=np.int64)
    n_blocks = len(doc_off)
    sel = np.asarray(block_indices, dtype=np.int64)
    sel = sel[(sel >= 0) & (sel < n_blocks)]
    if sel.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()

    df = int(row["df"])
    # value count per selected block (all full except possibly the last)
    counts = np.where(sel < n_blocks - 1, block_size, df - (n_blocks - 1) * block_size)

    def gather_decode(buf, off) -> np.ndarray:
        """ONE varint decode over the concatenated selected byte ranges
        (slicing is O(1) views; the decode itself is a single numpy pass
        instead of one per block)."""
        arr = np.frombuffer(buf, dtype=np.uint8)
        end = np.concatenate((off[1:], [arr.size]))
        return varint_decode(
            np.concatenate([arr[off[i] : end[i]] for i in sel]).tobytes()
        ).astype(np.int64)

    deltas = gather_decode(row["docs"], doc_off)
    # per-block delta chains restart absolute → cumsum then subtract the
    # carry accumulated before each block start (vectorized fixup)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    cs = np.cumsum(deltas)
    base = np.zeros(len(starts), dtype=np.int64)
    base[1:] = cs[starts[1:] - 1]
    ids = cs - np.repeat(base, counts)
    # tf/dl streams need no restart fixup — the gathered ranges hold
    # exactly the selected blocks' values
    tfs = gather_decode(row["tfs"], np.asarray(row["block_tf_off"], dtype=np.int64))
    dls = gather_decode(row["dls"], np.asarray(row["block_dl_off"], dtype=np.int64))
    return ids, tfs, dls
