"""Perceptual-hash image near-dup (stages/multimodal.py phash63 /
PHashStage / phash_near_dups):

  * format invariance: identical pixels through PNG and P6 PPM give
    the IDENTICAL 63-bit hash (lossless codecs);
  * the distributed pair miner equals a brute-force all-pairs popcount
    referee exactly (the pigeonhole recall contract, inherited from
    the shared SimHash band machinery);
  * planted near-duplicates (sparse pixel edits, alternating codec)
    are found and link only base↔dup, never across bases;
  * non-image rows and stub-decoded payloads never reach the hash.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from zensearch_ray.stages.multimodal import (
    PHashStage,
    decode_media,
    encode_png,
    phash63,
    phash_near_dups,
    synthesize_image_dup_table,
    synthesize_media_table,
)

MAX_HAMMING = 8
N_BANDS = 9


def _popcount(x: int) -> int:
    return bin(x).count("1")


def _hashes_of(table: pa.Table) -> dict[int, int]:
    """Local referee: decode + hash every image row, no Ray."""
    stage = PHashStage()
    out = stage(table)
    return dict(zip(out["media_id"].to_pylist(), out["phash"].to_pylist()))


def test_phash_format_invariant_and_deterministic():
    rng = np.random.default_rng(11)
    pixels = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    png = encode_png(pixels)
    ppm = f"P6\n56 40\n255\n".encode() + pixels.tobytes()
    hashes = []
    for payload in (png, ppm):
        buf, dec, meta = decode_media(payload, "image")
        assert dec in ("png", "ppm")
        img = buf.reshape(meta["height"], meta["width"], 3)
        hashes.append(phash63(img))
    assert hashes[0] == hashes[1]
    assert 0 < hashes[0] < 2**63
    # exactly 31 of 63 AC coefficients exceed the median
    assert _popcount(hashes[0]) == 31


def test_phash_robust_to_sparse_edits_and_discriminative():
    tbl = synthesize_image_dup_table(12, seed=7, dups_per_base=1, n_flips=6)
    h = _hashes_of(tbl)
    for i in range(12):
        assert _popcount(h[i] ^ h[10000 + i]) <= MAX_HAMMING, i
    far = [
        _popcount(h[a] ^ h[b])
        for a in range(12)
        for b in range(a + 1, 12)
    ]
    assert min(far) > MAX_HAMMING  # distinct bases never collide


def test_phash_near_dups_matches_bruteforce(ray_session):
    tbl = synthesize_image_dup_table(10, seed=3, dups_per_base=2, n_flips=4)
    got = phash_near_dups(
        rd.from_arrow(tbl), max_hamming=MAX_HAMMING, n_bands=N_BANDS
    )
    h = _hashes_of(tbl)
    ids = sorted(h)
    want = sorted(
        (a, b, _popcount(h[a] ^ h[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _popcount(h[a] ^ h[b]) <= MAX_HAMMING
    )
    assert list(map(tuple, got[["a", "b", "hamming"]].to_numpy())) == want
    # every planted dup pair is in the result
    planted = {(i, 10000 + i) for i in range(10)} | {
        (i, 20000 + i) for i in range(10)
    }
    found = {(a, b) for a, b, _ in want}
    assert planted <= found


def test_phash_stage_drops_non_images_and_stubs(ray_session):
    media = synthesize_media_table(120, seed=42)
    out = PHashStage()(media)
    kinds = dict(
        zip(media["media_id"].to_pylist(), media["kind"].to_pylist())
    )
    assert out.num_rows > 0
    for mid, dec in zip(
        out["media_id"].to_pylist(), out["decoder"].to_pylist()
    ):
        assert kinds[mid] == "image"
        assert dec in ("png", "ppm", "jpeg", "gif", "bmp")


def test_phash_near_dups_band_guard(ray_session):
    tbl = synthesize_image_dup_table(2, seed=1)
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dups(rd.from_arrow(tbl), max_hamming=4, n_bands=4)


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup (ahash63 / AHashStage / audio_near_dups)
# ---------------------------------------------------------------------------

from zensearch_ray.stages.multimodal import (  # noqa: E402
    AHashStage,
    ahash63,
    audio_near_dups,
    synthesize_audio_dup_table,
)

A_MAX_HAMMING = 6
A_N_BANDS = 7


def _ahashes_of(table: pa.Table) -> dict[int, int]:
    out = AHashStage()(table)
    return dict(zip(out["media_id"].to_pylist(), out["ahash"].to_pylist()))


def test_ahash_amplitude_invariant_and_deterministic():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 0.2, size=4000)
    h1 = ahash63(x, 8000)
    assert h1 == ahash63(x, 8000)
    # total-energy normalization + median rule: gain changes nothing
    assert h1 == ahash63(x * 0.25, 8000)
    assert _popcount(h1) == 31
    # short clips pad instead of crashing
    assert isinstance(ahash63(np.zeros(10), 8000), int)


def test_ahash_robust_to_noise_and_discriminative():
    tbl = synthesize_audio_dup_table(12, seed=13, dups_per_base=1)
    h = _ahashes_of(tbl)
    for i in range(12):
        assert _popcount(h[i] ^ h[10000 + i]) <= A_MAX_HAMMING, i
    far = [
        _popcount(h[a] ^ h[b])
        for a in range(12)
        for b in range(a + 1, 12)
    ]
    assert min(far) > A_MAX_HAMMING


def test_audio_near_dups_matches_bruteforce(ray_session):
    tbl = synthesize_audio_dup_table(10, seed=3, dups_per_base=2)
    got = audio_near_dups(
        rd.from_arrow(tbl), max_hamming=A_MAX_HAMMING, n_bands=A_N_BANDS
    )
    h = _ahashes_of(tbl)
    ids = sorted(h)
    want = sorted(
        (a, b, _popcount(h[a] ^ h[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _popcount(h[a] ^ h[b]) <= A_MAX_HAMMING
    )
    assert list(map(tuple, got[["a", "b", "hamming"]].to_numpy())) == want
    planted = {(i, 10000 + i) for i in range(10)} | {
        (i, 20000 + i) for i in range(10)
    }
    assert planted <= {(a, b) for a, b, _ in want}


def test_ahash_stage_drops_non_audio(ray_session):
    media = synthesize_media_table(120, seed=42)
    out = AHashStage()(media)
    kinds = dict(
        zip(media["media_id"].to_pylist(), media["kind"].to_pylist())
    )
    assert out.num_rows > 0
    for mid, dec in zip(
        out["media_id"].to_pylist(), out["decoder"].to_pylist()
    ):
        assert kinds[mid] == "audio"
        assert dec == "wav"


# ---------------------------------------------------------------------------
# Video fingerprint near-dup (vhash63 / VHashStage / video_near_dups)
# ---------------------------------------------------------------------------

from zensearch_ray.stages.multimodal import (  # noqa: E402
    VHashStage,
    synthesize_video_dup_table,
    vhash63,
    video_near_dups,
)

V_MAX_HAMMING = 8
V_N_BANDS = 9


def test_vhash_majority_rule():
    # bit set iff set in >= half the frame hashes; empty list → 0
    assert vhash63([]) == 0
    assert vhash63([0b1010, 0b1010, 0b0001]) == 0b1010
    assert vhash63([0b1, 0b10]) == 0b11  # 1 of 2 == half → set
    assert vhash63([(1 << 63) - 1]) == (1 << 63) - 1


def test_video_requality_dups_found_and_bases_distinct():
    tbl = synthesize_video_dup_table(10, seed=23, dups_per_base=1)
    out = VHashStage()(tbl)
    h = dict(zip(out["media_id"].to_pylist(), out["vhash"].to_pylist()))
    for i in range(10):
        assert _popcount(h[i] ^ h[10000 + i]) <= V_MAX_HAMMING, i
    far = [
        _popcount(h[a] ^ h[b]) for a in range(10) for b in range(a + 1, 10)
    ]
    assert min(far) > V_MAX_HAMMING


def test_video_near_dups_matches_bruteforce(ray_session):
    tbl = synthesize_video_dup_table(8, seed=5, dups_per_base=1)
    got = video_near_dups(
        rd.from_arrow(tbl), max_hamming=V_MAX_HAMMING, n_bands=V_N_BANDS
    )
    out = VHashStage()(tbl)
    h = dict(zip(out["media_id"].to_pylist(), out["vhash"].to_pylist()))
    ids = sorted(h)
    want = sorted(
        (a, b, _popcount(h[a] ^ h[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _popcount(h[a] ^ h[b]) <= V_MAX_HAMMING
    )
    assert list(map(tuple, got[["a", "b", "hamming"]].to_numpy())) == want
    assert {(i, 10000 + i) for i in range(8)} <= {(a, b) for a, b, _ in want}


def test_vhash_stage_drops_non_video_and_fake(ray_session):
    media = synthesize_media_table(120, seed=42)
    out = VHashStage()(media)
    kinds = dict(
        zip(media["media_id"].to_pylist(), media["kind"].to_pylist())
    )
    mimes = dict(
        zip(media["media_id"].to_pylist(), media["mime"].to_pylist())
    )
    assert out.num_rows > 0
    for mid in out["media_id"].to_pylist():
        assert kinds[mid] == "video"
        assert mimes[mid] == "video/x-msvideo"  # fake-bytes rows dropped
