"""Property-based (hypothesis) tests for the media/archive codec
layer: WARC payload round trips with adversarial byte content (CRLF
runs, fake WARC headers, gzip magic inside payloads), GIF/PNG lossless
round trips over arbitrary shapes/palettes, JPEG error bounds over
arbitrary smooth images, and LZW torture via tiny alphabets."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from zensearch_ray.functions.gif import decode_gif, encode_gif
from zensearch_ray.functions.jpeg import decode_jpeg, encode_jpeg
from zensearch_ray.sources.warc import parse_warc, write_warc


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=2048), st.booleans())
def test_warc_payload_bytes_are_opaque(tmp_path_factory, payload, gz):
    """ANY byte string survives the WARC round trip — including ones
    containing CRLFCRLF, 'WARC/1.0', or gzip magic (framing is by
    Content-Length octets, never by scanning the payload)."""
    evil = b"\r\n\r\nWARC/1.0\r\n\x1f\x8b" + payload
    path = str(tmp_path_factory.mktemp("w") / "a.warc")
    write_warc(
        [{"url": "https://x.example.com", "date": "2026-01-01T00:00:00Z",
          "status": 200, "mime": "application/octet-stream",
          "payload": evil}],
        path, gzip_members=gz)
    rows = parse_warc(open(path, "rb").read())
    assert len(rows) == 1
    assert rows[0]["html"] == evil


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=2, max_value=256),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_lossless_any_shape_palette(h, w, ncolors, seed):
    rng = np.random.default_rng(seed)
    img = (rng.integers(0, ncolors, size=(h, w, 1)).repeat(3, axis=2)
           % 256).astype(np.uint8)
    out = decode_gif(encode_gif(img))
    assert out.shape == (h, w, 3)
    assert (out == img).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=33),
    st.integers(min_value=1, max_value=33),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_q100_bounded_error_any_shape(h, w, subsample, seed):
    """q=100 keeps every pixel within a small bound for ARBITRARY
    (even noise) content — the quant table is ~all-ones, so the only
    loss is DCT rounding and (if subsampled) chroma averaging."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsample=subsample))
    assert out.shape == img.shape
    if not subsample:
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 8, err


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1),
                min_size=1, max_size=3000),
       st.integers(min_value=1, max_value=64))
def test_gif_lzw_binary_alphabet_torture(bits, width):
    """2-symbol alphabet at minimum code size exercises the earliest
    code-size growth steps and repeated-pattern dict entries (the
    KwKwK-adjacent paths) harder than photographic data."""
    n = len(bits)
    h = -(-n // width)
    arr = np.zeros(h * width, np.uint8)
    arr[:n] = bits
    img = (arr.reshape(h, width) * 255).astype(np.uint8)
    out = decode_gif(encode_gif(img))
    assert (out[..., 0] == img).all()
