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
    assert list(out.columns) == ["media_id", "n_bytes", "feat_mean", "feat_std"]
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
    assert out["payload"].map(len).eq(32 * 16).all()


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
    for _, row in src.iterrows():
        expect = min(max(1, -(-max(row["duration_ms"], 1) // 5000)), 8)
        assert counts[row["media_id"]] == expect, row["media_id"]
    # cap is explicit, not silent
    truncated_ids = set(out[out["truncated"]]["media_id"])
    expect_trunc = {
        r["media_id"] for _, r in src.iterrows()
        if -(-max(r["duration_ms"], 1) // 5000) > 8
    }
    assert truncated_ids == expect_trunc
    assert out["payload"].map(len).eq(256).all()
