"""Multimodal (image/audio/video) column plumbing — REAL Ray-side
pipeline, STUBBED codecs.

The decode libraries (PIL/ffmpeg/torchaudio) are not in this container,
so the byte→pixels/samples step is a deterministic fake behind
``decode_stub``; everything around it — Arrow ``binary`` payload
columns with typed metadata, small-batch actor-pool stages, feature
output schema — is real and tested, and is exactly what a model-backed
implementation would keep (swap ``_decode_fake`` for the real codec in
``__init__``-loaded form).

Design notes for 100 TB: media rows are WIDE (MBs per row) — these
stages must run with small ``batch_size`` and rely on block splitting
(``target_max_block_size``) instead of holding many payloads per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),   # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder. Deterministic fake: derives a small feature buffer
    from the payload bytes. A real build replaces this with
    PIL.Image.open / soundfile.read — signature stays the same.
    Raises on unknown kind (mirrors a codec error path)."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(8, dtype=np.float64)
    return arr[: 4096].astype(np.float64)


class MediaFeatureStage:
    """Actor-pool map_batches: payload bytes → per-item feature row.

    ``__init__`` is where a real model/codec would load (once per
    actor); ``__call__`` decodes + featurizes one small batch.
    """

    def __init__(self, payload_col: str = "payload", kind_col: str = "kind", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.kind_col = kind_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_bytes, means, stds = [], [], [], []
        for mid, kind, payload in zip(
            batch[self.id_col].to_pylist(),
            batch[self.kind_col].to_pylist(),
            batch[self.payload_col].to_pylist(),
        ):
            buf = decode_stub(payload or b"", kind)
            ids.append(mid)
            n_bytes.append(len(payload or b""))
            means.append(float(np.round(buf.mean(), 6)) if buf.size else 0.0)
            stds.append(float(np.round(buf.std(), 6)) if buf.size else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "feat_mean": pa.array(means, type=pa.float64()),
                "feat_std": pa.array(stds, type=pa.float64()),
            }
        )


def resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize. Deterministic fake: cycles the payload bytes to a
    w×h buffer. A real build swaps in PIL ``Image.open(...).resize``
    (loaded per actor) — same signature, same output column."""
    src = np.frombuffer(payload, dtype=np.uint8)
    if src.size == 0:
        src = np.zeros(1, dtype=np.uint8)
    return np.resize(src, w * h).tobytes()


class ImageResizeStage:
    """Actor-pool map_batches: image rows → fixed-size thumbnails.

    Input rows in MEDIA_SCHEMA (pre-filter to kind == 'image' upstream
    — the stage asserts, it does not silently skip); output keeps the
    schema with payload/width/height replaced. Wide rows → run with
    small batch_size; the codec swap point is ``__init__``.
    """

    def __init__(self, width: int = 64, height: int = 64):
        self.w = int(width)
        self.h = int(height)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        bad = [k for k in kinds if k != "image"]
        if bad:
            raise ValueError(f"ImageResizeStage got kind={bad[0]!r}; filter first")
        payloads = [
            resize_stub(p or b"", self.w, self.h)
            for p in batch["payload"].to_pylist()
        ]
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(payloads, type=pa.binary()),
                "mime": batch["mime"],
                "width": pa.array([self.w] * n, type=pa.int32()),
                "height": pa.array([self.h] * n, type=pa.int32()),
                "duration_ms": batch["duration_ms"],
            }
        )


class FrameSampleStage:
    """Actor-pool map_batches: video rows → sampled frame rows (flat
    explode — one output row per sampled timestamp).

    Frames at 0, every_ms, 2·every_ms, … < duration_ms, capped at
    ``max_frames`` per video (cap logged in the output via
    ``truncated``, never silent). The frame 'decode' is a stub slice
    of the payload; a real build swaps in ffmpeg/pyav seek+decode per
    actor. Output: (media_id, frame_idx, ts_ms, payload, truncated).
    """

    def __init__(self, every_ms: int = 1000, max_frames: int = 32):
        self.every_ms = int(every_ms)
        self.max_frames = int(max_frames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, tss, frames, trunc = [], [], [], [], []
        for mid, kind, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video":
                raise ValueError(f"FrameSampleStage got kind={kind!r}; filter first")
            n_frames = max(1, -(-max(dur, 1) // self.every_ms))
            truncated = n_frames > self.max_frames
            n_frames = min(n_frames, self.max_frames)
            src = np.frombuffer(payload or b"\x00", dtype=np.uint8)
            for fi in range(n_frames):
                ids.append(mid)
                idxs.append(fi)
                tss.append(fi * self.every_ms)
                # stub frame: a deterministic 256-byte slice per index
                start = (fi * 257) % max(len(src), 1)
                frames.append(np.resize(src[start:], 256).tobytes())
                trunc.append(truncated)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "ts_ms": pa.array(tss, type=pa.int32()),
                "payload": pa.array(frames, type=pa.binary()),
                "truncated": pa.array(trunc, type=pa.bool_()),
            }
        )


def synthesize_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (for tests —
    no real image/audio bytes exist in this environment)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n_rows):
        kind = kinds[int(rng.integers(0, 3))]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/x-fake", "audio": "audio/x-fake", "video": "video/x-fake"}[kind])
        rows["width"].append(int(rng.integers(16, 4096)) if kind != "audio" else -1)
        rows["height"].append(int(rng.integers(16, 4096)) if kind != "audio" else -1)
        rows["duration_ms"].append(int(rng.integers(100, 60000)) if kind != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)
