"""Baseline JPEG codec + MJPEG-AVI container: encode→decode
round-trips across modes (4:4:4, 4:2:0, gray, restart intervals),
quality monotonicity, container demux byte-identity, and the real
video path through FrameSampleStage / decode_media."""

from __future__ import annotations

import numpy as np
import pytest

from zensearch_ray.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_size,
)
from zensearch_ray.functions.riff import (
    encode_avi_mjpeg,
    extract_mjpeg_frames,
    is_avi,
)


def _smooth(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255.0 / max(w - 1, 1),
            yy * 255.0 / max(h - 1, 1),
            128 + 100 * np.sin(xx / 5.0) * np.cos(yy / 7.0),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


@pytest.mark.parametrize(
    "quality,subsample,min_psnr",
    [(95, False, 40.0), (75, False, 35.0), (75, True, 30.0)],
)
def test_roundtrip_color(quality, subsample, min_psnr):
    img = _smooth(41, 53)  # deliberately not multiples of 8/16
    payload = encode_jpeg(img, quality=quality, subsample=subsample)
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    assert _psnr(out, img) > min_psnr
    assert jpeg_size(payload) == (41, 53)


def test_roundtrip_gray():
    g = _smooth(24, 31)[..., 0]
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == g.shape and out.ndim == 2
    assert _psnr(out, g) > 40.0


def test_restart_interval_matches_plain():
    """DRI/RSTn change the stream layout, not the decoded pixels."""
    img = _smooth(32, 48)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 3, 7):
        with_rst = decode_jpeg(
            encode_jpeg(img, quality=85, restart_interval=ri))
        np.testing.assert_array_equal(with_rst, plain)
    sub_plain = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
    sub_rst = decode_jpeg(
        encode_jpeg(img, quality=85, subsample=True, restart_interval=2))
    np.testing.assert_array_equal(sub_rst, sub_plain)


def test_quality_monotone_and_smaller():
    img = _smooth(40, 40)
    lo, hi = encode_jpeg(img, quality=30), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(decode_jpeg(lo), img) < _psnr(decode_jpeg(hi), img)


def test_extreme_inputs():
    # q=100 noise: near-lossless (quant table is mostly 1s)
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 4
    # checkerboard at q=100 exercises the AC-category clamp
    cb = np.zeros((8, 8), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    decode_jpeg(encode_jpeg(cb, quality=100))  # must not raise
    # 1x1 and single-row images
    for shape in [(1, 1, 3), (1, 9, 3), (5, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(img, quality=95)).shape == img.shape


def test_decode_rejects_non_baseline():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG....")
    # splice a progressive SOF2 marker in place of SOF0
    payload = bytearray(encode_jpeg(_smooth(8, 8), quality=80))
    payload[payload.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_avi_roundtrip_frames_and_fps():
    frames = [encode_jpeg(_smooth(24, 32) + t * 3, quality=85)
              for t in range(7)]
    avi = encode_avi_mjpeg(frames, fps=10.0)
    assert is_avi(avi) and not is_avi(b"RIFFxxxxWAVE")
    got, fps = extract_mjpeg_frames(avi)
    assert fps == 10.0
    assert [f for _, f in got] == frames  # byte-identical demux
    assert [ts for ts, _ in got] == [0, 100, 200, 300, 400, 500, 600]
    assert decode_jpeg(got[3][1]).shape == (24, 32, 3)
    with pytest.raises(ValueError, match="not an AVI"):
        extract_mjpeg_frames(b"\x00" * 32)


def test_frame_stage_real_avi(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from zensearch_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        FrameSampleStage,
        decode_media,
    )

    frames = [encode_jpeg(_smooth(16, 16) + t, quality=80) for t in range(10)]
    avi = encode_avi_mjpeg(frames, fps=5.0)  # 2000 ms of video
    tbl = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "kind": pa.array(["video"]),
            "payload": pa.array([avi], pa.binary()),
            "mime": pa.array(["video/x-msvideo"]),
            "width": pa.array([16], pa.int32()),
            "height": pa.array([16], pa.int32()),
            "duration_ms": pa.array([2000], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"every_ms": 600, "max_frames": 32},
            batch_format="pyarrow", concurrency=1,
        )
        .to_pandas()
        .sort_values("frame_idx")
    )
    # ticks 0,600,1200,1800 → container frames 0,3,6,9 (ts 0/600/1200/1800)
    assert list(out["ts_ms"]) == [0, 600, 1200, 1800]
    assert list(out["payload"]) == [frames[0], frames[3], frames[6], frames[9]]
    assert out["real"].all() and not out["truncated"].any()

    # decode_media sniffing: first-frame features + stream metadata
    buf, dec, meta = decode_media(avi, "video")
    assert dec == "mjpeg"
    assert meta["n_frames"] == 10 and meta["fps"] == 5.0
    want = decode_jpeg(frames[0]).astype(np.float64).ravel() / 255.0
    np.testing.assert_allclose(buf, want)


def test_decode_media_jpeg(ray_session):
    from zensearch_ray.stages.multimodal import decode_media

    img = _smooth(20, 28)
    payload = encode_jpeg(img, quality=90)
    buf, dec, meta = decode_media(payload, "image")
    assert dec == "jpeg"
    assert (meta["width"], meta["height"]) == (28, 20)
    np.testing.assert_allclose(
        buf, decode_jpeg(payload).astype(np.float64).ravel() / 255.0)
