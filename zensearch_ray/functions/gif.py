"""GIF (87a/89a) decoder + fixture encoder, and an uncompressed-BMP
decoder — pure stdlib/numpy, completing the web-image format set
(netpbm/PNG/JPEG/GIF/BMP) a crawl-archive pipeline meets.

Decoder scope: first image frame (animated GIFs yield frame 0 —
features don't need the animation), global/local color tables,
interlacing, full LZW with code-size growth and dict reset;
transparency indices are resolved through the palette like any other
pixel (feature extraction has no alpha channel). The encoder emits
literal-codes-only LZW (every code a root; CLEAR before the dict
would overflow) — larger than a real encoder's output but
spec-conformant, deterministic, and exactly what round-trip tests
need.

BMP scope: the uncompressed BITMAPINFOHEADER forms that occur in
practice as decoder input (24/32-bit BGR(A), 8-bit paletted),
bottom-up or top-down.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    # dict as index arrays: prefix code + appended byte, root = -1
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    first = np.zeros(4096, np.uint8)  # first byte of each sequence
    for c in range(clear):
        suffix[c] = first[c] = c
    next_code = end + 1
    cs = min_code_size + 1
    prev = -1
    acc = n_bits = 0
    pos = 0
    seq = bytearray()
    while n_out < n_pixels:
        while n_bits < cs:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << n_bits  # GIF bits are LSB-first
            pos += 1
            n_bits += 8
        code = acc & ((1 << cs) - 1)
        acc >>= cs
        n_bits -= cs
        if code == clear:
            next_code = end + 1
            cs = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:  # first code after clear: must be a root
            if code >= clear:
                raise ValueError("bad first LZW code")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            cur = code
        elif code == next_code:  # the KwKwK case
            cur = -1
        else:
            raise ValueError("LZW code out of range")
        # materialize the sequence for `cur` (or prev+first(prev))
        seq.clear()
        c = prev if cur == -1 else cur
        while c >= 0:
            seq.append(suffix[c])
            c = prefix[c]
        seq.reverse()
        if cur == -1:
            seq.append(first[prev])
        take = min(len(seq), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(
            bytes(seq[:take]), np.uint8)
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            # appended byte = first byte of the just-decoded sequence
            suffix[next_code] = first[cur] if cur != -1 else first[prev]
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << cs) and cs < 12:
                cs += 1
        prev = code  # in the KwKwK case `code` IS the entry just added
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF → uint8 RGB (h, w, 3)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _lx, _ty, w, h, iflags = struct.unpack("<HHHHB", payload[pos:pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_cs = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_cs, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: 4-pass row order
            rows = np.concatenate([
                np.arange(0, h, 8), np.arange(4, h, 8),
                np.arange(2, h, 4), np.arange(1, h, 2)])
            deinter = np.empty_like(idx)
            deinter[rows] = idx
            idx = deinter
        return ct[idx]
    raise ValueError("GIF without an image block")


def encode_gif(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Encode uint8 RGB (h, w, 3) whose distinct colors fit a 256-entry
    palette (or gray (h, w), palette = identity grays). Literal-code
    LZW — see module docstring."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = img
    else:
        flat = img.reshape(-1, 3)
        if palette is None:
            palette, inv = np.unique(flat, axis=0, return_inverse=True)
            if len(palette) > 256:
                raise ValueError(">256 distinct colors; quantize first")
            idx = inv.astype(np.uint8).reshape(img.shape[:2])
        else:
            # exact-match lookup against the provided palette
            key = (flat[:, 0].astype(np.int64) << 16) | \
                  (flat[:, 1].astype(np.int64) << 8) | flat[:, 2]
            pkey = (palette[:, 0].astype(np.int64) << 16) | \
                   (palette[:, 1].astype(np.int64) << 8) | palette[:, 2]
            order = np.argsort(pkey)
            j = np.searchsorted(pkey[order], key)
            if not (pkey[order][np.clip(j, 0, len(pkey) - 1)] == key).all():
                raise ValueError("pixel color missing from palette")
            idx = order[j].astype(np.uint8).reshape(img.shape[:2])
    h, w = idx.shape
    pal = np.zeros((max(2, int(palette[: 256].shape[0])), 3), np.uint8)
    pal[: palette.shape[0]] = palette[:256]
    # color table size = power of two ≥ len(pal)
    ctbits = max(1, int(np.ceil(np.log2(len(pal)))))
    full = np.zeros((1 << ctbits, 3), np.uint8)
    full[: len(pal)] = pal
    min_cs = max(2, ctbits)
    clear, end = 1 << min_cs, (1 << min_cs) + 1

    bits = bytearray()
    acc = n_bits = 0

    def put(code: int, cs: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += cs
        while n_bits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    cs = min_cs + 1
    put(clear, cs)
    next_code = end + 1
    prev_emitted = False
    for p in idx.ravel():
        if next_code >= 4095:  # reset before the dict could overflow
            put(clear, cs)
            cs = min_cs + 1
            next_code = end + 1
            prev_emitted = False
        put(int(p), cs)
        if prev_emitted:  # decoder adds one dict entry per code after the first
            next_code += 1
            if next_code == (1 << cs) and cs < 12:
                cs += 1
        prev_emitted = True
    put(end, cs)
    if n_bits:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((ctbits - 1) & 7), 0, 0)
    out += full.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_cs)
    data = bytes(bits)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER+, 8-bit paletted or
    24/32-bit BGR(A)) → uint8 RGB (h, w, 3)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    comp = struct.unpack("<I", payload[30:34])[0]
    if comp not in (0, 3) or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h_signed < 0
    h = abs(h_signed)
    stride = (w * bpp // 8 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, stride * h, data_off)
    rows = rows.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal = np.frombuffer(
            payload, np.uint8, n_colors * 4, 14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX → RGB
        return pal[rows[:, :w]]
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB
