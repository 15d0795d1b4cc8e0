"""Minimal RIFF/AVI (MJPEG) muxer + demuxer — pure stdlib.

Motion-JPEG in an AVI container is the one video format this
environment can handle end-to-end without ffmpeg: the container is a
plain RIFF chunk tree ('hdrl' headers, 'movi' frame chunks, 'idx1'
index) and every frame is an independent baseline JPEG that
:mod:`zensearch_ray.functions.jpeg` decodes. The muxer exists to
synthesize REAL video fixtures; the demuxer is what
``FrameSampleStage`` uses to turn an opaque video payload column
into sampled frame rows.

The demuxer is a generic RIFF walk (it does not assume the muxer's
exact layout): it reads fps from 'strh' (dwRate/dwScale, falling back
to avih's microseconds-per-frame) and collects '##dc'/'##db' chunks
of the first video stream in 'movi' order, tolerating 'rec ' sublists
and the optional 'idx1'.
"""

from __future__ import annotations

import struct


def encode_avi_mjpeg(frames: list[bytes], fps: float = 25.0,
                     width: int = 0, height: int = 0) -> bytes:
    """Mux JPEG frame payloads into an AVI (MJPG fourcc, one video
    stream, idx1 index). ``width``/``height`` default to the first
    frame's SOF dimensions."""
    if not frames:
        raise ValueError("cannot mux an empty frame list")
    if width <= 0 or height <= 0:
        from zensearch_ray.functions.jpeg import jpeg_size

        height, width = jpeg_size(frames[0])
    scale, rate = 1000, int(round(fps * 1000))
    usec_per_frame = int(round(1_000_000 / fps))
    max_bytes = max(len(f) for f in frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(listtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", listtype + body)

    avih = struct.pack(
        "<10I", usec_per_frame, int(max_bytes * fps), 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_bytes, width, height,
    ) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIi", 0, 0, 0, 0, scale, rate, 0, len(frames),
        max_bytes, 0, -1,
    ) + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of ckid within 'movi'
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)

    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, listtype_or_None, body_start, body_len) for each
    chunk in [pos, end)."""
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = pos + 8
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, buf[body:body + 4], body + 4, size - 4
        else:
            yield fourcc, None, body, size
        pos = body + size + (size & 1)


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def extract_mjpeg_frames(payload: bytes) -> tuple[list[tuple[int, bytes]], float]:
    """Demux an AVI: → ([(ts_ms, frame_bytes), ...], fps).

    Frames of the FIRST video stream ('00dc'/'00db' chunks) in movi
    order; timestamps from the stream's dwRate/dwScale (fallback:
    avih microseconds-per-frame, final fallback 25 fps)."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload")
    fps = 0.0
    usec_pf = 0
    frames: list[bytes] = []

    def scan(pos: int, end: int, listtype: bytes) -> None:
        nonlocal fps, usec_pf
        stream_no = 0
        for fourcc, sub, body, size in _walk(payload, pos, end):
            if fourcc in (b"LIST", b"RIFF"):
                scan(body, body + size, sub or b"")
            elif fourcc == b"avih" and size >= 4:
                (usec_pf,) = struct.unpack("<I", payload[body:body + 4])
            elif fourcc == b"strh" and size >= 32:
                fcc_type = payload[body:body + 4]
                if fcc_type == b"vids" and fps == 0.0:
                    scale, rate = struct.unpack(
                        "<II", payload[body + 20:body + 28])
                    if scale and rate:
                        fps = rate / scale
                stream_no += 1
            elif (listtype == b"movi" and len(fourcc) == 4
                  and fourcc[2:4] in (b"dc", b"db")
                  and fourcc[:2] == b"00"):
                frames.append(bytes(payload[body:body + size]))

    (size,) = struct.unpack("<I", payload[4:8])
    scan(12, min(8 + size, len(payload)), b"AVI ")
    if fps == 0.0:
        fps = 1_000_000 / usec_pf if usec_pf else 25.0
    out = [(int(round(i * 1000.0 / fps)), f) for i, f in enumerate(frames)]
    return out, fps
