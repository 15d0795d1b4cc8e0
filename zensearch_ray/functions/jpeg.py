"""Baseline JPEG codec in pure numpy + stdlib — no imaging library.

The container has no PIL/turbojpeg, but baseline sequential JPEG
(ITU-T T.81) is decodable from first principles: marker parse → DQT/
DHT/SOF0/SOS → huffman-coded (run, size) RLE over zigzag-ordered,
quantized 8×8 DCT blocks → dequantize → IDCT → chroma upsample →
YCbCr→RGB. The encoder exists primarily so the repo can synthesize
REAL JPEG fixtures and round-trip-test the decoder without any
third-party binary; it writes spec-conformant baseline streams
(SOI/APP0/DQT/SOF0/DHT/[DRI]/SOS/EOI) that any external decoder can
read.

Scope (documented, checked, raised on violation):
- decode: baseline + extended sequential huffman (SOF0/SOF1), 8-bit,
  1 or 3 components, any sampling factors, restart intervals.
  Progressive (SOF2) and arithmetic coding raise ``ValueError``.
- encode: 8-bit gray or RGB, 4:4:4 or 4:2:0, optional restart
  interval, IJG-style quality scaling of the Annex K tables.

Performance shape: the per-symbol huffman loop is Python (fixtures
are small), but everything O(pixels) — DCT/IDCT, quantization,
up/downsampling, color conversion — is vectorized numpy over ALL
blocks at once, so decode cost is dominated by the entropy stream
length, not the pixel count.
"""

from __future__ import annotations

import struct

import numpy as np

# Scan position k → natural (row-major) coefficient index.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (natural order), quality-scaled per IJG.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.float64,
)

# Annex K typical huffman tables: (BITS counts for lengths 1..16, symbols).
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])


def _dct_matrix() -> np.ndarray:
    # Orthonormal DCT-II basis — identical to the T.81 definition
    # (1/4·C_u·C_v double sum) when applied as T @ X @ T.T.
    x = np.arange(8, dtype=np.float64)
    t = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    t[0] = np.sqrt(1.0 / 8.0)
    return t


_T = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(max(int(quality), 1), 100)
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    return np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255)


def _build_codes(bits, vals):
    """Canonical huffman codes from (BITS, HUFFVAL): symbol → (code, len)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def _build_decode(bits, vals):
    """Canonical huffman decode map: (len, code) → symbol."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (n_blocks, 8, 8) row-major."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _unblocks(blocks: np.ndarray, rows: int, cols: int) -> np.ndarray:
    return (blocks.reshape(rows, cols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows * 8, cols * 8))


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, ln: int) -> None:
        if ln == 0:
            return
        self.acc = (self.acc << ln) | (val & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill per spec

    def restart(self, idx: int) -> None:
        self.pad_to_byte()
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    code, ln = dc_codes[s]
    w.write(code, ln)
    w.write(bits, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 75,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Encode 8-bit gray (h, w) or RGB (h, w, 3) to baseline JPEG.

    ``subsample=True`` writes 4:2:0 (Y at 2×2, chroma 1×1 per MCU);
    default is 4:4:4. ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (exercises the decoder's resync).
    """
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("encode_jpeg takes gray or RGB input")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    if gray:
        samps = [(1, 1)]
        planes = [img.astype(np.float64)]
        qmap, quants = [0], [qy]
    else:
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qmap, quants = [0, 1, 1], [qy, qc]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # Per component: pad (edge-replicate), downsample, FDCT, quantize.
    comp_zz: list[np.ndarray] = []
    for (hi, vi), plane, qi in zip(samps, planes, qmap):
        full = np.pad(plane, ((0, mcus_y * 8 * vmax - h),
                              (0, mcus_x * 8 * hmax - w)), mode="edge")
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # box-mean downsample
            full = full.reshape(full.shape[0] // fy, fy,
                                full.shape[1] // fx, fx).mean(axis=(1, 3))
        blocks = _blocks_of(full - 128.0)
        coef = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
        q = np.round(coef / quants[qi].reshape(8, 8))
        q = np.clip(q, -1023, 1023).astype(np.int64)  # AC category ≤ 10
        comp_zz.append(q.reshape(-1, 64)[:, ZIGZAG])

    dc_codes = [_build_codes(*DC_LUMA), _build_codes(*DC_CHROMA)]
    ac_codes = [_build_codes(*AC_LUMA), _build_codes(*AC_CHROMA)]
    tmap = [0] if gray else [0, 1, 1]

    bw = _BitWriter()
    preds = [0] * len(samps)
    n_rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.restart(n_rst)
            n_rst += 1
            preds = [0] * len(samps)
        my, mx = divmod(m, mcus_x)
        for ci, (hi, vi) in enumerate(samps):
            cols = mcus_x * hi
            for by in range(vi):
                for bx in range(hi):
                    bidx = (my * vi + by) * cols + (mx * hi + bx)
                    preds[ci] = _encode_block(
                        bw, comp_zz[ci][bidx], preds[ci],
                        dc_codes[tmap[ci]], ac_codes[tmap[ci]])
    bw.pad_to_byte()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, q in enumerate(quants):
        out += seg(0xDB, bytes([qi]) + bytes(
            int(v) for v in q[ZIGZAG]))
    ncomp = len(samps)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (hi, vi) in enumerate(samps):
        sof += bytes([ci + 1, (hi << 4) | vi, qmap[ci]])
    out += seg(0xC0, sof)
    for cls, tables in ((0, (DC_LUMA, DC_CHROMA)), (1, (AC_LUMA, AC_CHROMA))):
        for tid in range(1 if gray else 2):
            bits, vals = tables[tid]
            out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                       + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tmap[ci] << 4) | tmap[ci]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: undoes 0xFF00 stuffing, feeds zero
    pad bits at a trailing marker, resynchronizes at RSTn."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        buf, pos = self.buf, self.pos
        if pos >= len(buf):
            self.acc <<= 8
            self.n += 8
            return
        b = buf[pos]
        if b == 0xFF:
            nxt = buf[pos + 1] if pos + 1 < len(buf) else 0xD9
            if nxt == 0x00:
                self.pos = pos + 2
                self.acc = (self.acc << 8) | 0xFF
            else:  # at a marker (RST/EOI/...): zero pad, do not consume
                self.acc <<= 8
            self.n += 8
            return
        self.pos = pos + 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        self.acc = 0
        self.n = 0
        if not (self.pos + 1 < len(self.buf)
                and self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            raise ValueError("expected RST marker in entropy stream")
        self.pos += 2


def _decode_sym(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline/extended-sequential huffman JPEG to uint8
    (h, w) gray or (h, w, 3) RGB. Raises ``ValueError`` on progressive
    or arithmetic-coded streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    ri = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.zeros(64, np.float64)
                tab[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, i + 1)
                qt[tid] = tab
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                huff[(cls, tid)] = _build_decode(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline/sequential-huffman JPEG supported")
        elif marker == 0xDD:
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            nsc = seg[0]
            scan = []  # (comp_idx, dc_table, ac_table)
            byid = {c[0]: i for i, c in enumerate(frame[2])}
            for c in range(nsc):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((byid[cid], tt >> 4, tt & 15))
            return _decode_scan(payload, pos + ln, frame, scan, qt, huff, ri)
        pos += ln
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan, qt, huff, ri):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    coefs = [np.zeros((mcus_y * c[2] * mcus_x * c[1], 64), np.float64)
             for c in comps]
    r = _BitReader(payload, pos)
    preds = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if ri and m and m % ri == 0:
            r.sync_restart()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, td, ta in scan:
            _, hi, vi, _ = comps[ci]
            dct, act = huff[(0, td)], huff[(1, ta)]
            cols = mcus_x * hi
            for by in range(vi):
                for bx in range(hi):
                    blk = coefs[ci][(my * vi + by) * cols + (mx * hi + bx)]
                    s = _decode_sym(r, dct)
                    diff = _extend(r.bits(s), s) if s else 0
                    preds[ci] += diff
                    blk[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_sym(r, act)
                        rr, ss = rs >> 4, rs & 15
                        if ss == 0:
                            if rr != 15:
                                break
                            k += 16
                            continue
                        k += rr
                        if k > 63:
                            raise ValueError("AC index out of range")
                        blk[ZIGZAG[k]] = _extend(r.bits(ss), ss)
                        k += 1

    planes = []
    for ci, (_, hi, vi, tq) in enumerate(comps):
        deq = (coefs[ci] * qt[tq]).reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _T, deq, _T) + 128.0
        plane = _unblocks(pix, mcus_y * vi, mcus_x * hi)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    if len(planes) == 3:
        return _ycbcr_to_rgb(*planes)
    raise ValueError(f"unsupported component count {len(planes)}")


def jpeg_size(payload: bytes) -> tuple[int, int]:
    """(height, width) from the SOF header without decoding the scan."""
    pos = 2
    while pos + 4 <= len(payload):
        marker = payload[pos + 1]
        ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        if marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
            return h, w
        pos += 2 + ln
    raise ValueError("no SOF marker found")
