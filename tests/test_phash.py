"""Perceptual-hash media dedup (phash.py): dHash/aHash kernel
invariances, the Spark mapInPandas hashing stage, the Manku-block
Hamming pair join over media hashes, and cluster collapse."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mashspark.codecs import encode_bmp, encode_wav
from mashspark.phash import (ahash_from_plane, dhash_from_plane,
                             phash_dup_clusters, phash_dup_pairs,
                             phash_media)


def _gradient_image(rng, h=32, w=32, lo=40, hi=200):
    """Random smooth-ish image with headroom so +/-20 brightness never
    clips (clipping would legitimately flip gradient signs)."""
    base = rng.integers(lo, hi, size=(h // 4, w // 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)


def _luma(img):
    return img.mean(axis=2).astype(np.float64) / 255.0


def test_dhash_brightness_shift_invariant():
    rng = np.random.default_rng(11)
    img = _gradient_image(rng)
    shifted = (img.astype(np.int32) + 20).clip(0, 255).astype(np.uint8)
    assert dhash_from_plane(_luma(img)) == dhash_from_plane(_luma(shifted))


def test_dhash_rescale_invariant():
    # 16x18 divides evenly into the 8x9 hash grid, so do its 2x/3x
    # upscales — the area means are bin-exact and the hash is identical.
    rng = np.random.default_rng(12)
    img = rng.integers(40, 200, size=(16, 18, 3), dtype=np.uint8)
    h0 = dhash_from_plane(_luma(img))
    for s in (2, 3):
        up = np.repeat(np.repeat(img, s, axis=0), s, axis=1)
        assert dhash_from_plane(_luma(up)) == h0


def test_dhash_separates_unrelated_images():
    rng = np.random.default_rng(13)
    hashes = [dhash_from_plane(_luma(_gradient_image(rng))) for _ in range(20)]
    worst = 64
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            worst = min(worst, bin(hashes[i] ^ hashes[j]).count("1"))
    # unrelated random images should never land within the join radius
    assert worst > 10


def test_dhash_constant_plane_is_zero():
    assert dhash_from_plane(np.full((32, 32), 0.5)) == 0


def test_ahash_basic_separation():
    rng = np.random.default_rng(14)
    a = _luma(_gradient_image(rng))
    b = _luma(_gradient_image(rng))
    ha, hb = ahash_from_plane(a), ahash_from_plane(b)
    assert ha == ahash_from_plane(a)          # deterministic
    assert bin(ha ^ hb).count("1") > 4        # different content separates


def test_audio_amplitude_scaling_near_invariant():
    """dHash over the energy/autocorrelation plane: scaling every sample
    by a constant scales RMS linearly and autocorrelations quadratically
    (column-wise monotone), so horizontal gradient SIGNS survive except
    at near-ties — allow a small drift budget."""
    from mashspark.multimodal import decode_media

    rng = np.random.default_rng(15)
    x = rng.uniform(-0.5, 0.5, 4000).astype(np.float32)
    h1 = dhash_from_plane(decode_media(encode_wav(x, 8000)))
    h2 = dhash_from_plane(decode_media(encode_wav(x * 0.6, 8000)))
    assert bin(h1 ^ h2).count("1") <= 6


@pytest.fixture(scope="module")
def media_with_near_dups(spark):
    """60 items: 20 distinct base BMPs; ids 100+i are brightness-shifted
    copies of base i (true near-dups), ids 200+i for i<10 are WAV audio
    with 210+i an amplitude-scaled copy of 200+i."""
    rng = np.random.default_rng(21)
    rows = []
    for i in range(20):
        img = _gradient_image(rng)
        shifted = (img.astype(np.int32) + 15).clip(0, 255).astype(np.uint8)
        rows.append((i, bytearray(encode_bmp(img))))
        rows.append((100 + i, bytearray(encode_bmp(shifted))))
    for i in range(10):
        x = rng.uniform(-0.5, 0.5, 3000).astype(np.float32)
        rows.append((200 + i, bytearray(encode_wav(x, 8000))))
        rows.append((210 + i, bytearray(encode_wav(x * 0.7, 8000))))
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_phash_media_spark_matches_local(spark, media_with_near_dups):
    out = phash_media(media_with_near_dups).orderBy("media_id").collect()
    assert len(out) == 60
    assert all(r.decoded_real for r in out)
    # spot-check one row against the local kernel
    from mashspark.multimodal import decode_media

    row0 = media_with_near_dups.filter(F.col("media_id") == 0).first()
    expect = dhash_from_plane(decode_media(bytes(row0.payload)))
    got = next(r.phash for r in out if r.media_id == 0)
    assert got == expect


def test_phash_dup_pairs_finds_planted_near_dups(spark, media_with_near_dups):
    hashes = phash_media(media_with_near_dups).localCheckpoint(eager=True)
    pairs = {(r.id_a, r.id_b) for r in phash_dup_pairs(hashes, max_hamming=6).collect()}
    for i in range(20):           # every planted image pair found
        assert (i, 100 + i) in pairs
    for i in range(10):           # every planted audio pair found
        assert (200 + i, 210 + i) in pairs
    # no unrelated base-image pair sneaks inside the radius
    for a, b in pairs:
        if a < 20 and b < 20:
            pytest.fail(f"unrelated images paired: {(a, b)}")


def test_phash_dup_clusters_collapse(spark, media_with_near_dups):
    hashes = phash_media(media_with_near_dups).localCheckpoint(eager=True)
    labels = {r.media_id: r.cluster_id
              for r in phash_dup_clusters(hashes, max_hamming=6).collect()}
    for i in range(20):
        assert labels[i] == labels[100 + i] == i


def test_phash_pair_plan_has_no_cartesian(spark, media_with_near_dups):
    hashes = phash_media(media_with_near_dups)
    plan = phash_dup_pairs(hashes)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
