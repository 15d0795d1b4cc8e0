"""Multimodal (image/audio/video) column plumbing — REAL Ray-side
pipeline with REAL stdlib/numpy codecs for WAV (PCM), netpbm, PNG,
baseline JPEG (:mod:`zensearch_ray.functions.jpeg`) and MJPEG-in-AVI
video (:mod:`zensearch_ray.functions.riff`); a deterministic stub
only for formats the container genuinely cannot decode (e.g.
H.264/VP9 video — no ffmpeg here).

The byte→pixels/samples step for undecodable formats is a
deterministic fake behind ``decode_stub``; everything around it —
Arrow ``binary`` payload columns with typed metadata, small-batch
actor-pool stages, feature output schema — is identical to the real
paths, so swapping in a full codec is a one-function change in
``__init__``-loaded form.

Design notes for 100 TB: media rows are WIDE (MBs per row) — these
stages must run with small ``batch_size`` and rely on block splitting
(``target_max_block_size``) instead of holding many payloads per batch.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
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


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV (PCM) decoder via the stdlib ``wave`` module:
    → (mono float64 samples in [-1, 1], sample_rate). 8- and 16-bit
    PCM; multi-channel downmixes by mean."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, sr


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL netpbm decoder (binary P6 RGB / P5 gray, maxval ≤ 255):
    → uint8 array of shape (h, w, 3) or (h, w). Pure header parse +
    ``np.frombuffer`` — no imaging library needed."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    depth = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * depth, offset=i)
    return arr.reshape((h, w, 3)) if depth == 3 else arr.reshape((h, w))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decoder via stdlib ``zlib`` — no imaging library.

    8-bit, non-interlaced; color types gray(0), RGB(2), palette(3),
    gray+alpha(4), RGBA(6). Returns uint8 of shape (h, w[, channels]).
    Filter reconstruction per the public PNG spec (RFC 2083 §6):
    None/Up/Sub are vectorized (Sub is a per-channel modular cumsum);
    Average/Paeth are sequential in x by definition and loop."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, plte, hdr = 8, [], None, None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        pos += 8
        data = payload[pos:pos + ln]
        pos += ln + 4  # payload + CRC (integrity is the transport's job)
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        line = np.frombuffer(raw, np.uint8, stride, p).astype(np.int64)
        p += stride
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-channel modular prefix sum
            cur = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (3, 4):
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 3:  # Average
                    v = line[x] + ((a + b) >> 1)
                else:  # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    q = a + b - c
                    qa, qb, qc = abs(q - a), abs(q - b), abs(q - c)
                    v = line[x] + (
                        a if (qa <= qb and qa <= qc) else (b if qb <= qc else c)
                    )
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img]
    return img


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """REAL PNG encoder (stdlib ``zlib``): 8-bit gray/RGB/RGBA.
    ``filters`` cycles a per-row filter choice — the test harness uses
    it to exercise every reconstruction path of :func:`decode_png`."""
    import struct
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ch, ctype = 1, 0
    elif img.shape[2] == 3:
        ch, ctype = 3, 2
    elif img.shape[2] == 4:
        ch, ctype = 4, 6
    else:
        raise ValueError(f"unsupported channel count {img.shape[2]}")
    h, w = img.shape[:2]
    body = img.reshape(h, w * ch).astype(np.int64)
    prev = np.zeros(w * ch, np.int64)
    zero = np.zeros(ch, np.int64)
    rows = []
    for y in range(h):
        f = 0 if not filters else filters[y % len(filters)]
        cur = body[y]
        left = np.concatenate([zero, cur[:-ch]]) if w * ch > ch else zero[:w * ch]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            upleft = np.concatenate([zero, prev[:-ch]]) if w * ch > ch else zero[:w * ch]
            q = left + prev - upleft
            qa, qb, qc = np.abs(q - left), np.abs(q - prev), np.abs(q - upleft)
            pred = np.where((qa <= qb) & (qa <= qc), left,
                            np.where(qb <= qc, prev, upleft))
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


def decode_media(payload: bytes, kind: str):
    """Format-sniffing decoder: REAL for every stdlib-decodable format
    (RIFF/WAVE audio; netpbm, PNG and baseline JPEG images; MJPEG-AVI
    video — features from its first decoded frame), deterministic stub
    for the rest (no ffmpeg in this container — the swap point is
    exactly here). Returns (float64 feature buffer, decoder_name,
    meta dict with sample_rate/width/height/n_frames/fps where real).
    """
    if kind == "audio" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, sr = decode_wav(payload)
        return samples, "wav", {"sample_rate": sr}
    if kind == "image" and payload[:2] in (b"P5", b"P6"):
        img = decode_ppm(payload)
        return (
            img.astype(np.float64).ravel() / 255.0,
            "ppm",
            {"width": img.shape[1], "height": img.shape[0]},
        )
    if kind == "image" and payload[:8] == _PNG_SIG:
        img = decode_png(payload)
        return (
            img.astype(np.float64).ravel() / 255.0,
            "png",
            {"width": img.shape[1], "height": img.shape[0]},
        )
    if kind == "image" and payload[:2] == b"\xff\xd8":
        from zensearch_ray.functions.jpeg import decode_jpeg

        img = decode_jpeg(payload)
        return (
            img.astype(np.float64).ravel() / 255.0,
            "jpeg",
            {"width": img.shape[1], "height": img.shape[0]},
        )
    if kind == "image" and (payload[:4] == b"GIF8" or payload[:2] == b"BM"):
        from zensearch_ray.functions.gif import decode_bmp, decode_gif

        dec = "gif" if payload[:4] == b"GIF8" else "bmp"
        img = decode_gif(payload) if dec == "gif" else decode_bmp(payload)
        return (
            img.astype(np.float64).ravel() / 255.0,
            dec,
            {"width": img.shape[1], "height": img.shape[0]},
        )
    if kind == "video" and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from zensearch_ray.functions.jpeg import decode_jpeg
        from zensearch_ray.functions.riff import extract_mjpeg_frames

        frames, fps = extract_mjpeg_frames(payload)
        first = decode_jpeg(frames[0][1]) if frames else np.zeros((1, 1))
        return (
            first.astype(np.float64).ravel() / 255.0,
            "mjpeg",
            {
                "width": first.shape[1] if first.ndim > 1 else 1,
                "height": first.shape[0],
                "n_frames": len(frames),
                "fps": fps,
            },
        )
    return decode_stub(payload, kind), "stub", {}


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
        ids, n_bytes, decoders, means, stds = [], [], [], [], []
        for mid, kind, payload in zip(
            batch[self.id_col].to_pylist(),
            batch[self.kind_col].to_pylist(),
            batch[self.payload_col].to_pylist(),
        ):
            buf, dec, _meta = decode_media(payload or b"", kind)
            ids.append(mid)
            n_bytes.append(len(payload or b""))
            decoders.append(dec)
            means.append(float(np.round(buf.mean(), 6)) if buf.size else 0.0)
            stds.append(float(np.round(buf.std(), 6)) if buf.size else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "decoder": pa.array(decoders, type=pa.string()),
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


def resize_image(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """REAL nearest-neighbor resample to (h, w) — vectorized index
    sampling, any channel count."""
    sh, sw = img.shape[:2]
    ys = np.minimum((np.arange(h) * sh) // h, sh - 1)
    xs = np.minimum((np.arange(w) * sw) // w, sw - 1)
    return img[ys][:, xs]


class ImageResizeStage:
    """Actor-pool map_batches: image rows → fixed-size thumbnails.

    REAL for every decodable format (netpbm/PNG/JPEG): decode →
    nearest-neighbor resample → re-encode as PNG (the repo's lossless
    stdlib encoder), mime rewritten to image/png. Undecodable
    payloads fall back to the declared ``resize_stub``. Input rows in
    MEDIA_SCHEMA (pre-filter to kind == 'image' upstream — the stage
    asserts, it does not silently skip); output keeps the schema with
    payload/width/height/mime replaced. Wide rows → run with small
    batch_size; the codec swap point is ``__init__``.
    """

    def __init__(self, width: int = 64, height: int = 64):
        self.w = int(width)
        self.h = int(height)

    def _one(self, payload: bytes, mime: str) -> tuple[bytes, str]:
        img = None
        if payload[:2] in (b"P5", b"P6"):
            img = decode_ppm(payload)
        elif payload[:8] == _PNG_SIG:
            img = decode_png(payload)
        elif payload[:2] == b"\xff\xd8":
            from zensearch_ray.functions.jpeg import decode_jpeg

            img = decode_jpeg(payload)
        elif payload[:4] == b"GIF8":
            from zensearch_ray.functions.gif import decode_gif

            img = decode_gif(payload)
        elif payload[:2] == b"BM":
            from zensearch_ray.functions.gif import decode_bmp

            img = decode_bmp(payload)
        if img is None:
            return resize_stub(payload, self.w, self.h), mime
        return encode_png(resize_image(img, self.w, self.h)), "image/png"

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        bad = [k for k in kinds if k != "image"]
        if bad:
            raise ValueError(f"ImageResizeStage got kind={bad[0]!r}; filter first")
        payloads, mimes = [], []
        for p, m in zip(batch["payload"].to_pylist(),
                        batch["mime"].to_pylist()):
            np_, nm = self._one(p or b"", m)
            payloads.append(np_)
            mimes.append(nm)
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(payloads, type=pa.binary()),
                "mime": pa.array(mimes, type=pa.string()),
                "width": pa.array([self.w] * n, type=pa.int32()),
                "height": pa.array([self.h] * n, type=pa.int32()),
                "duration_ms": batch["duration_ms"],
            }
        )


class FrameSampleStage:
    """Actor-pool map_batches: video rows → sampled frame rows (flat
    explode — one output row per sampled timestamp).

    REAL path for MJPEG-in-AVI payloads (the one video format this
    container can demux + decode end-to-end, via
    :mod:`zensearch_ray.functions.riff`): the container is demuxed
    once per row and, for each tick 0, every_ms, 2·every_ms, …, the
    latest frame at-or-before the tick is emitted with its ACTUAL
    container timestamp and JPEG bytes (decodable downstream by
    ``decode_jpeg``). Other containers fall back to the declared
    deterministic stub slice (ffmpeg/pyav are absent — that swap
    point is here). Caps at ``max_frames`` per video, logged via
    ``truncated``, never silent.
    Output: (media_id, frame_idx, ts_ms, payload, real, truncated).
    """

    def __init__(self, every_ms: int = 1000, max_frames: int = 32):
        self.every_ms = int(every_ms)
        self.max_frames = int(max_frames)

    def _sample_avi(self, payload: bytes) -> tuple[list[int], list[bytes], bool]:
        from zensearch_ray.functions.riff import extract_mjpeg_frames

        frames, fps = extract_mjpeg_frames(payload)
        if not frames:
            return [], [], False
        dur_ms = len(frames) * 1000.0 / fps
        tss, outs = [], []
        tick, fi = 0, 0
        while tick < max(dur_ms, 1) and len(outs) < self.max_frames:
            while fi + 1 < len(frames) and frames[fi + 1][0] <= tick:
                fi += 1
            tss.append(frames[fi][0])
            outs.append(frames[fi][1])
            tick += self.every_ms
        truncated = tick < dur_ms
        return tss, outs, truncated

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, tss, frames, real, trunc = [], [], [], [], [], []
        for mid, kind, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            payload = payload or b"\x00"
            if kind != "video":
                raise ValueError(f"FrameSampleStage got kind={kind!r}; filter first")
            if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                f_ts, f_payloads, truncated = self._sample_avi(payload)
                for fi, (ts, fp) in enumerate(zip(f_ts, f_payloads)):
                    ids.append(mid)
                    idxs.append(fi)
                    tss.append(ts)
                    frames.append(fp)
                    real.append(True)
                    trunc.append(truncated)
                continue
            n_frames = max(1, -(-max(dur, 1) // self.every_ms))
            truncated = n_frames > self.max_frames
            n_frames = min(n_frames, self.max_frames)
            src = np.frombuffer(payload, dtype=np.uint8)
            for fi in range(n_frames):
                ids.append(mid)
                idxs.append(fi)
                tss.append(fi * self.every_ms)
                # stub frame: a deterministic 256-byte slice per index
                start = (fi * 257) % max(len(src), 1)
                frames.append(np.resize(src[start:], 256).tobytes())
                real.append(False)
                trunc.append(truncated)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "ts_ms": pa.array(tss, type=pa.int32()),
                "payload": pa.array(frames, type=pa.binary()),
                "real": pa.array(real, type=pa.bool_()),
                "truncated": pa.array(trunc, type=pa.bool_()),
            }
        )


def _make_wav(rng, sr: int = 8000, ms: int = 250) -> bytes:
    """A REAL mono 16-bit PCM WAV payload (stdlib wave writer)."""
    import io
    import wave

    n = sr * ms // 1000
    t = np.arange(n, dtype=np.float64)
    freq = float(rng.integers(100, 2000))
    samples = (np.sin(2 * np.pi * freq * t / sr) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _make_ppm(rng, w: int, h: int) -> bytes:
    """A REAL binary P6 RGB payload (header + raw pixels)."""
    pixels = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _make_jpeg(rng, w: int, h: int) -> bytes:
    """A REAL baseline JPEG payload (smooth gradient + sinusoid —
    compresses like a photograph, unlike uniform noise)."""
    from zensearch_ray.functions.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:h, 0:w]
    p0, p1 = float(rng.uniform(2, 9)), float(rng.uniform(2, 9))
    img = np.stack(
        [
            xx * 255.0 / max(w - 1, 1),
            yy * 255.0 / max(h - 1, 1),
            128 + 100 * np.sin(xx / p0) * np.cos(yy / p1),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    return encode_jpeg(
        img,
        quality=int(rng.integers(60, 96)),
        subsample=bool(rng.integers(0, 2)),
    )


def _make_avi(rng) -> tuple[bytes, int, int, int]:
    """A REAL MJPEG-in-AVI payload: → (bytes, width, height, dur_ms)."""
    from zensearch_ray.functions.jpeg import encode_jpeg
    from zensearch_ray.functions.riff import encode_avi_mjpeg

    w, h = int(rng.integers(12, 33)), int(rng.integers(12, 33))
    fps = float(rng.integers(5, 26))
    n = int(rng.integers(3, 13))
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        img = np.stack(
            [(xx * 8 + t * 17) % 256, (yy * 6) % 256, ((xx + yy) * 3 + t * 9) % 256],
            axis=-1,
        ).astype(np.uint8)
        frames.append(encode_jpeg(img, quality=80))
    return encode_avi_mjpeg(frames, fps=fps), w, h, int(round(n * 1000 / fps))


def synthesize_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Deterministic media table matching MEDIA_SCHEMA: REAL bytes for
    every stdlib-decodable format (16-bit PCM WAV audio; P6 PPM, PNG
    and baseline JPEG images; MJPEG-in-AVI video) plus opaque fake
    video bytes for a fraction of rows — so the feature/frame stages
    exercise every genuine decode path AND the declared stub fallback
    in one table."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n_rows):
        kind = kinds[int(rng.integers(0, 3))]
        if kind == "audio":
            ms = int(rng.integers(100, 500))
            payload = _make_wav(rng, ms=ms)
            w = h = -1
            dur = ms
            mime = "audio/wav"
        elif kind == "image":
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            pick = int(rng.integers(0, 4))
            if pick == 0:
                payload = _make_ppm(rng, w, h)
                mime = "image/x-portable-pixmap"
            elif pick == 1:
                pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                payload = encode_png(pixels, filters=[0, 1, 2, 3, 4])
                mime = "image/png"
            elif pick == 2:
                payload = _make_jpeg(rng, w, h)
                mime = "image/jpeg"
            else:
                from zensearch_ray.functions.gif import encode_gif

                pixels = (rng.integers(0, 8, size=(h, w, 1)).repeat(3, axis=2)
                          * 36).astype(np.uint8)
                payload = encode_gif(pixels)
                mime = "image/gif"
            dur = -1
        elif int(rng.integers(0, 4)):  # 3/4 of videos: real MJPEG AVI
            payload, w, h, dur = _make_avi(rng)
            mime = "video/x-msvideo"
        else:  # declared stub-path coverage: opaque fake video bytes
            payload = rng.integers(
                0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8
            ).tobytes()
            w, h = int(rng.integers(16, 4096)), int(rng.integers(16, 4096))
            dur = int(rng.integers(100, 60000))
            mime = "video/x-fake"
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash image near-dup (the multimodal twin of text SimHash)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=4)
def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n×n); cached per size."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def phash63(img: np.ndarray) -> int:
    """63-bit perceptual hash (pHash family): grayscale → 32×32
    nearest resample → 2-D orthonormal DCT-II → 8×8 low-frequency
    block → the 63 AC coefficients (DC dropped — it only encodes mean
    brightness) → bit i set iff coeff_i > median(AC).

    Stable under re-encoding (lossless codecs give the identical hash)
    and under sparse pixel edits (a few pixels barely move the
    low-frequency coefficients); hamming distance measures visual
    difference. Exactly 63 bits so the SimHash pigeonhole band
    machinery applies unchanged."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    small = resize_image(img, 32, 32)
    d = _dct_matrix(32)
    freq = d @ small @ d.T
    ac = freq[:8, :8].ravel()[1:]  # row-major: [0] is the DC term
    bits = ac > np.median(ac)
    return int((np.uint64(1) << np.arange(63, dtype=np.uint64))[bits].sum())


class PHashStage:
    """Actor-pool map_batches: image rows → (media_id, phash, decoder).

    Decodes via the shared stdlib codecs; non-image rows and
    stub-decoded (unknown-format) payloads are dropped — hashing opaque
    bytes would manufacture false near-dup pairs. The DCT basis is
    built once per actor."""

    def __init__(self, payload_col: str = "payload", kind_col: str = "kind",
                 id_col: str = "media_id"):
        self.payload_col = payload_col
        self.kind_col = kind_col
        self.id_col = id_col
        _dct_matrix(32)  # warm the per-actor cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes, decs = [], [], []
        for mid, kind, payload in zip(
            batch[self.id_col].to_pylist(),
            batch[self.kind_col].to_pylist(),
            batch[self.payload_col].to_pylist(),
        ):
            if kind != "image":
                continue
            buf, dec, meta = decode_media(payload or b"", kind)
            w, h = meta.get("width", 0), meta.get("height", 0)
            if dec == "stub" or not w or not h:
                continue
            c = buf.size // (w * h)
            img = buf.reshape(h, w, c) if c > 1 else buf.reshape(h, w)
            ids.append(mid)
            hashes.append(phash63(img))
            decs.append(dec)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "phash": pa.array(hashes, type=pa.int64()),
                "decoder": pa.array(decs, type=pa.string()),
            }
        )


def phash_near_dups(media_ds, max_hamming: int = 8, n_bands: int = 9,
                    max_bucket: int = 10000) -> pd.DataFrame:
    """Image near-duplicate pairs by pHash hamming distance ≤
    ``max_hamming`` — image dedup for a multimodal training corpus.

    PHashStage (actor pool) fingerprints every decodable image, then
    the SHARED pigeonhole band exchange from text SimHash
    (``minhash.hamming_near_pairs_from_fp``) mines pairs: exact recall
    for hamming ≤ max_hamming when n_bands > max_hamming, one bucket
    groupby as the only shuffle, degenerate buckets capped. Returns
    (a, b, hamming) over media_id, a < b."""
    from zensearch_ray.stages.minhash import hamming_near_pairs_from_fp

    fp = media_ds.map_batches(
        PHashStage, batch_format="pyarrow", batch_size=32, concurrency=(1, 8)
    )
    return hamming_near_pairs_from_fp(
        fp, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket,
        fp_col="phash", id_col="media_id",
    )


def synthesize_image_dup_table(n_base: int, seed: int = 7,
                               dups_per_base: int = 1,
                               n_flips: int = 6) -> pa.Table:
    """Deterministic image table with PLANTED near-duplicates: each
    base image (smooth gradient + sinusoid — photograph-like spectra)
    gets ``dups_per_base`` copies with ``n_flips`` randomly perturbed
    pixels, re-encoded in an ALTERNATING lossless format (PNG / P6
    PPM) so near-dup detection must also cross codec boundaries.
    media_id of the j-th dup of base i is ``(j+1)*10000 + i``."""
    rng = np.random.default_rng(seed)
    rows = {k.name: [] for k in MEDIA_SCHEMA}

    def add(mid: int, pixels: np.ndarray, as_png: bool) -> None:
        h, w = pixels.shape[:2]
        if as_png:
            payload, mime = encode_png(pixels), "image/png"
        else:
            payload = f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()
            mime = "image/x-portable-pixmap"
        rows["media_id"].append(mid)
        rows["kind"].append("image")
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(-1)

    for i in range(n_base):
        w, h = int(rng.integers(24, 64)), int(rng.integers(24, 64))
        yy, xx = np.mgrid[0:h, 0:w]
        # random low-frequency Fourier mixture per channel: distinct
        # low-freq spectra per base (what pHash actually compares)
        base = np.zeros((h, w, 3))
        for c in range(3):
            acc = np.zeros((h, w))
            for _ in range(4):
                fy, fx = rng.uniform(0.5, 4.0), rng.uniform(0.5, 4.0)
                ph = rng.uniform(0, 2 * np.pi)
                acc += rng.uniform(0.3, 1.0) * np.sin(
                    2 * np.pi * (fy * yy / h + fx * xx / w) + ph
                )
            base[..., c] = acc
        base -= base.min()
        base = (base / max(base.max(), 1e-9) * 255).astype(np.uint8)
        add(i, base, as_png=bool(i % 2))
        for j in range(dups_per_base):
            dup = base.copy()
            ys = rng.integers(0, h, size=n_flips)
            xs = rng.integers(0, w, size=n_flips)
            dup[ys, xs] = rng.integers(0, 256, size=(n_flips, 3))
            add((j + 1) * 10000 + i, dup, as_png=not bool(i % 2))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def ahash63(samples: np.ndarray, sr: int) -> int:
    """63-bit audio fingerprint (Haitsma–Kalker-style energy grid):
    8 equal time slices × 8 log-spaced frequency bands of |rFFT|²
    energy, total-energy-normalized, flattened row-major, cell 0
    dropped, bit i set iff cell_i > median(cells).

    Amplitude-invariant (normalization + median rule) and robust to
    low-level additive noise; hamming distance measures acoustic
    difference. Exactly 63 bits so the SimHash/pHash pigeonhole band
    machinery applies unchanged. ``sr`` is unused by the grid (bands
    are relative), kept for signature parity with real fingerprints.
    """
    x = np.asarray(samples, dtype=np.float64)
    if x.size < 64:
        x = np.pad(x, (0, 64 - x.size))
    n = x.size // 8
    grid = np.empty((8, 8), dtype=np.float64)
    for t in range(8):
        mag2 = np.abs(np.fft.rfft(x[t * n : (t + 1) * n])) ** 2
        mag2 = mag2[1:]  # drop DC
        edges = np.geomspace(1, len(mag2) + 1, 9)
        idx = np.minimum(edges.astype(np.int64) - 1, len(mag2))
        for b in range(8):
            lo, hi = idx[b], max(idx[b + 1], idx[b] + 1)
            grid[t, b] = mag2[lo:hi].sum()
    total = grid.sum()
    if total > 0:
        grid /= total
    cells = grid.ravel()[1:]
    bits = cells > np.median(cells)
    return int((np.uint64(1) << np.arange(63, dtype=np.uint64))[bits].sum())


class AHashStage:
    """Actor-pool map_batches: audio rows → (media_id, ahash, decoder).

    Decodes via the stdlib WAV codec; non-audio rows and stub-decoded
    payloads are dropped (hashing opaque bytes would manufacture false
    near-dup pairs)."""

    def __init__(self, payload_col: str = "payload", kind_col: str = "kind",
                 id_col: str = "media_id"):
        self.payload_col = payload_col
        self.kind_col = kind_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes, decs = [], [], []
        for mid, kind, payload in zip(
            batch[self.id_col].to_pylist(),
            batch[self.kind_col].to_pylist(),
            batch[self.payload_col].to_pylist(),
        ):
            if kind != "audio":
                continue
            buf, dec, meta = decode_media(payload or b"", kind)
            if dec != "wav":
                continue
            ids.append(mid)
            hashes.append(ahash63(buf, meta["sample_rate"]))
            decs.append(dec)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "ahash": pa.array(hashes, type=pa.int64()),
                "decoder": pa.array(decs, type=pa.string()),
            }
        )


def audio_near_dups(media_ds, max_hamming: int = 6, n_bands: int = 7,
                    max_bucket: int = 10000) -> pd.DataFrame:
    """Audio near-duplicate pairs by fingerprint hamming distance —
    audio dedup for a multimodal training corpus, sharing the exact
    pigeonhole band exchange with text SimHash and image pHash.
    Returns (a, b, hamming) over media_id, a < b."""
    from zensearch_ray.stages.minhash import hamming_near_pairs_from_fp

    fp = media_ds.map_batches(
        AHashStage, batch_format="pyarrow", batch_size=32, concurrency=(1, 8)
    )
    return hamming_near_pairs_from_fp(
        fp, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket,
        fp_col="ahash", id_col="media_id",
    )


def synthesize_audio_dup_table(n_base: int, seed: int = 13,
                               dups_per_base: int = 1,
                               noise: float = 0.005) -> pa.Table:
    """Deterministic audio table with PLANTED near-duplicates: each
    base clip (3-tone sinusoid mix, tones drawn without replacement
    from a log ladder so bases are spectrally distinct) gets
    ``dups_per_base`` copies with white noise of amplitude ``noise``
    added before 16-bit quantization. media_id layout matches
    :func:`synthesize_image_dup_table`."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    ladder = np.geomspace(120.0, 3200.0, 24)

    def add(mid: int, samples: np.ndarray, sr: int, ms: int) -> None:
        pcm = (np.clip(samples, -1, 1) * 32000).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        rows["media_id"].append(mid)
        rows["kind"].append("audio")
        rows["payload"].append(buf.getvalue())
        rows["mime"].append("audio/wav")
        rows["width"].append(-1)
        rows["height"].append(-1)
        rows["duration_ms"].append(ms)

    sr = 8000
    for i in range(n_base):
        ms = int(rng.integers(200, 500))
        n = sr * ms // 1000
        t = np.arange(n, dtype=np.float64) / sr
        freqs = rng.choice(ladder, size=3, replace=False)
        amps = rng.uniform(0.15, 0.3, size=3)
        # time-windowed tones: a stationary mix would repeat the same
        # spectrum in all 8 time slices (≈8 informative bits); random
        # onsets/offsets make the time axis of the grid discriminative
        base = np.zeros(n, dtype=np.float64)
        for a, f in zip(amps, freqs):
            s = float(rng.uniform(0, 0.5))
            e = float(rng.uniform(s + 0.3, 1.0))
            i0, i1 = int(s * n), int(e * n)
            base[i0:i1] += a * np.sin(2 * np.pi * f * t[i0:i1])
        add(i, base, sr, ms)
        for j in range(dups_per_base):
            dup = base + rng.normal(0, noise, size=n)
            add((j + 1) * 10000 + i, dup, sr, ms)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def vhash63(frame_hashes: list[int]) -> int:
    """63-bit video fingerprint: bitwise MAJORITY over per-frame
    :func:`phash63` values (bit set iff set in ≥ half the frames).
    Majority voting absorbs per-frame codec noise, so two encodes of
    the same footage at different JPEG quality land within a small
    hamming distance."""
    if not frame_hashes:
        return 0
    fps = np.array(frame_hashes, dtype=np.uint64)
    shifts = np.arange(63, dtype=np.uint64)
    counts = ((fps[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
    bits = counts * 2 >= len(fps)
    return int((np.uint64(1) << shifts)[bits].sum())


class VHashStage:
    """Actor-pool map_batches: video rows → (media_id, vhash, n_frames).

    MJPEG-AVI only (the container's one real video codec): demux, decode
    up to ``max_frames`` evenly-sampled frames, pHash each, majority-
    combine. Non-video rows and undecodable payloads are dropped."""

    def __init__(self, max_frames: int = 8, payload_col: str = "payload",
                 kind_col: str = "kind", id_col: str = "media_id"):
        self.max_frames = max_frames
        self.payload_col = payload_col
        self.kind_col = kind_col
        self.id_col = id_col
        _dct_matrix(32)  # warm the per-actor cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zensearch_ray.functions.jpeg import decode_jpeg
        from zensearch_ray.functions.riff import extract_mjpeg_frames

        ids, hashes, nfr = [], [], []
        for mid, kind, payload in zip(
            batch[self.id_col].to_pylist(),
            batch[self.kind_col].to_pylist(),
            batch[self.payload_col].to_pylist(),
        ):
            payload = payload or b""
            if kind != "video" or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
                continue
            frames, _fps = extract_mjpeg_frames(payload)
            if not frames:
                continue
            step = max(1, len(frames) // self.max_frames)
            picked = frames[::step][: self.max_frames]
            ids.append(mid)
            hashes.append(
                vhash63([phash63(decode_jpeg(fb)) for _, fb in picked])
            )
            nfr.append(len(frames))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "vhash": pa.array(hashes, type=pa.int64()),
                "n_frames": pa.array(nfr, type=pa.int64()),
            }
        )


def video_near_dups(media_ds, max_hamming: int = 8, n_bands: int = 9,
                    max_bucket: int = 10000, max_frames: int = 8) -> pd.DataFrame:
    """Video near-duplicate pairs by majority-pHash hamming distance —
    the third leg of the multimodal dedup family, through the same
    shared pigeonhole band exchange. Returns (a, b, hamming), a < b."""
    from zensearch_ray.stages.minhash import hamming_near_pairs_from_fp

    fp = media_ds.map_batches(
        VHashStage, fn_constructor_kwargs={"max_frames": max_frames},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 8),
    )
    return hamming_near_pairs_from_fp(
        fp, max_hamming=max_hamming, n_bands=n_bands, max_bucket=max_bucket,
        fp_col="vhash", id_col="media_id",
    )


def synthesize_video_dup_table(n_base: int, seed: int = 23,
                               dups_per_base: int = 1) -> pa.Table:
    """Deterministic MJPEG-AVI table with PLANTED near-duplicates: the
    dup re-encodes the SAME frames at a different JPEG quality (the
    classic re-upload transform). Frames are low-frequency Fourier
    mixtures with a per-frame phase drift so bases are spectrally and
    temporally distinct. media_id layout matches the image/audio
    synthesizers."""
    from zensearch_ray.functions.jpeg import encode_jpeg
    from zensearch_ray.functions.riff import encode_avi_mjpeg

    rng = np.random.default_rng(seed)
    rows = {k.name: [] for k in MEDIA_SCHEMA}

    def add(mid: int, frame_pixels: list[np.ndarray], quality: int,
            w: int, h: int, fps: float) -> None:
        payload = encode_avi_mjpeg(
            [encode_jpeg(f, quality=quality) for f in frame_pixels], fps=fps
        )
        rows["media_id"].append(mid)
        rows["kind"].append("video")
        rows["payload"].append(payload)
        rows["mime"].append("video/x-msvideo")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(int(len(frame_pixels) * 1000 / fps))

    for i in range(n_base):
        w, h = int(rng.integers(24, 48)), int(rng.integers(24, 48))
        n = int(rng.integers(4, 9))
        fps = float(rng.integers(5, 16))
        yy, xx = np.mgrid[0:h, 0:w]
        comps = [
            (rng.uniform(0.5, 3.0), rng.uniform(0.5, 3.0),
             rng.uniform(0, 2 * np.pi), rng.uniform(0.3, 1.0),
             rng.uniform(0.1, 0.6))
            for _ in range(4)
        ]
        frame_pixels = []
        for t in range(n):
            img = np.zeros((h, w, 3))
            for c in range(3):
                acc = np.zeros((h, w))
                for fy, fx, ph, amp, drift in comps:
                    acc += amp * np.sin(
                        2 * np.pi * (fy * yy / h + fx * xx / w)
                        + ph + drift * t + c
                    )
                img[..., c] = acc
            img -= img.min()
            frame_pixels.append(
                (img / max(img.max(), 1e-9) * 255).astype(np.uint8)
            )
        add(i, frame_pixels, 85, w, h, fps)
        for j in range(dups_per_base):
            add((j + 1) * 10000 + i, frame_pixels, 60, w, h, fps)
    return pa.table(rows, schema=MEDIA_SCHEMA)
