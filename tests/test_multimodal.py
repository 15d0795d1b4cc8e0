"""Multimodal plumbing: real Arrow schemas / actor-pool stages around
stubbed codecs (PIL/ffmpeg absent from this container by design)."""

import numpy as np
import pyarrow.compute as pc
import pytest

from zensearch_ray.stages.multimodal import (
    FrameSampleStage,
    ImageResizeStage,
    MediaFeatureStage,
    decode_stub,
    synthesize_media_table,
)


def _media_ds(n=60):
    import ray.data as rd

    return rd.from_arrow(synthesize_media_table(n, seed=7))


def test_decode_stub_kinds():
    assert decode_stub(b"abc", "image").dtype == np.float64
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", "3d-mesh")


def test_features_all_rows(ray_session):
    out = (
        _media_ds()
        .map_batches(MediaFeatureStage, batch_format="pyarrow", batch_size=16,
                     concurrency=(1, 2))
        .to_pandas()
    )
    assert len(out) == 60
    assert list(out.columns) == ["media_id", "n_bytes", "decoder", "feat_mean", "feat_std"]
    # every real format decodes for real; only the planted opaque
    # video rows fall back to the declared stub
    assert set(out["decoder"]) == {
        "wav", "ppm", "png", "jpeg", "gif", "mjpeg", "stub"}
    # deterministic across runs
    out2 = (
        _media_ds()
        .map_batches(MediaFeatureStage, batch_format="pyarrow", batch_size=16,
                     concurrency=(1, 2))
        .to_pandas()
    )
    assert out.sort_values("media_id", ignore_index=True).equals(
        out2.sort_values("media_id", ignore_index=True)
    )


def test_resize_images(ray_session):
    ds = _media_ds().map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = ds.map_batches(
        ImageResizeStage, fn_constructor_kwargs={"width": 32, "height": 16},
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2),
    ).to_pandas()
    assert len(out) > 0
    assert (out["width"] == 32).all() and (out["height"] == 16).all()
    # every image format is decodable now → REAL resize → PNG thumbnails
    from zensearch_ray.stages.multimodal import decode_png

    assert (out["mime"] == "image/png").all()
    for p in out["payload"]:
        assert decode_png(p).shape[:2] == (16, 32)


def test_resize_rejects_non_images(ray_session):
    import ray.exceptions

    ds = _media_ds().map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    with pytest.raises(ray.exceptions.RayTaskError):
        ds.map_batches(
            ImageResizeStage, batch_format="pyarrow", concurrency=1
        ).materialize()


def test_frame_sampling_counts_and_cap(ray_session):
    videos = _media_ds(120).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")), batch_format="pyarrow"
    )
    src = videos.to_pandas()
    out = videos.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_ms": 5000, "max_frames": 8},
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2),
    ).to_pandas()
    counts = out.groupby("media_id").size()
    # stub (opaque) rows keep the duration-derived count contract
    stub_src = src[src["mime"] == "video/x-fake"]
    assert len(stub_src) > 0 and len(stub_src) < len(src)
    for _, row in stub_src.iterrows():
        expect = min(max(1, -(-max(row["duration_ms"], 1) // 5000)), 8)
        assert counts[row["media_id"]] == expect, row["media_id"]
    stub_out = out[~out["real"]]
    assert set(stub_out["media_id"]) == set(stub_src["media_id"])
    assert stub_out["payload"].map(len).eq(256).all()
    # cap is explicit, not silent (stub rows)
    truncated_ids = set(stub_out[stub_out["truncated"]]["media_id"])
    expect_trunc = {
        r["media_id"] for _, r in stub_src.iterrows()
        if -(-max(r["duration_ms"], 1) // 5000) > 8
    }
    assert truncated_ids == expect_trunc
    # real MJPEG rows emit genuine JPEG frame payloads
    real_out = out[out["real"]]
    assert len(real_out) > 0
    assert real_out["payload"].map(lambda p: p[:2] == b"\xff\xd8").all()


def test_real_wav_roundtrip():
    """decode_wav inverts the stdlib wave writer bit-exactly."""
    import io
    import wave

    sr = 8000
    samples = (np.sin(np.linspace(0, 20, 400)) * 10000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    from zensearch_ray.stages.multimodal import decode_wav

    got, got_sr = decode_wav(buf.getvalue())
    assert got_sr == sr
    np.testing.assert_allclose(got, samples.astype(np.float64) / 32768.0)


def test_real_ppm_roundtrip_and_comments():
    from zensearch_ray.stages.multimodal import decode_ppm

    pixels = np.arange(24, dtype=np.uint8)
    ppm = b"P6\n# a comment\n4 2\n255\n" + pixels.tobytes()
    img = decode_ppm(ppm)
    assert img.shape == (2, 4, 3)
    np.testing.assert_array_equal(img.ravel(), pixels)
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_decode_media_sniffing():
    from zensearch_ray.stages.multimodal import (
        _make_ppm,
        _make_wav,
        decode_media,
    )

    rng = np.random.default_rng(1)
    for payload, kind, want in (
        (_make_wav(rng, ms=100), "audio", "wav"),
        (_make_ppm(rng, 6, 4), "image", "ppm"),
        (b"\x00\x01\x02", "video", "stub"),
        (b"not-a-wav", "audio", "stub"),  # opaque audio falls back
    ):
        _, dec, _ = decode_media(payload, kind)
        assert dec == want, (kind, want)
    with pytest.raises(NotImplementedError):
        decode_media(b"x", "3d-mesh")


def test_png_roundtrip_all_filters_and_shapes():
    from zensearch_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(3)
    for shape in [(7, 5, 3), (4, 9), (6, 6, 4), (1, 1, 3), (3, 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for filts in [None, [1], [2], [3], [4], [0, 1, 2, 3, 4]]:
            out = decode_png(encode_png(img, filts))
            assert out.shape == img.shape and (out == img).all(), (shape, filts)


def test_png_palette_and_errors():
    import struct
    import zlib

    from zensearch_ray.stages.multimodal import _PNG_SIG, decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    # 2x2 palette image: indices [[0,1],[1,0]] over a 2-color palette
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 1, 0])  # filter0 rows
    png = (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    img = decode_png(png)
    assert img.shape == (2, 2, 3)
    assert (img[0, 0] == [255, 0, 0]).all() and (img[0, 1] == [0, 0, 255]).all()

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = (_PNG_SIG + chunk(b"IHDR", ihdr16)
             + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(png16)


def test_media_features_decode_real_png(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from zensearch_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        MediaFeatureStage,
        encode_png,
    )

    rng = np.random.default_rng(9)
    pixels = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    tbl = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([encode_png(pixels, filters=[4, 2, 1])], pa.binary()),
        "mime": pa.array(["image/png"]),
        "width": pa.array([10], pa.int32()),
        "height": pa.array([12], pa.int32()),
        "duration_ms": pa.array([-1], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = (
        rd.from_arrow(tbl)
        .map_batches(MediaFeatureStage, batch_format="pyarrow",
                     batch_size=8, concurrency=1)
        .to_pandas()
    )
    assert out["decoder"].iloc[0] == "png"
    want = pixels.astype(np.float64).ravel() / 255.0
    assert out["feat_mean"].iloc[0] == float(np.round(want.mean(), 6))
    assert out["feat_std"].iloc[0] == float(np.round(want.std(), 6))
