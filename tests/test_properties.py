"""Hypothesis property tests over the pure-math kernels (SURVEY.md §5:
the reference pins behavior with hand-picked goldens; property search
covers the input space those goldens sample). All targets are
driver-side numpy functions — no Spark session needed, so these run in
milliseconds and explore thousands of adversarial inputs."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mashspark import compare
from mashspark.hashing import (decode_signed, decode_sketch_bytes,
                               encode_signed, murmur3_x64_128_h1_bytes)
from tests.test_hash_goldens import _mmh3_ref

u64 = st.integers(min_value=0, max_value=2**64 - 1)


@given(st.binary(min_size=1, max_size=200), st.integers(0, 2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_murmur3_matches_independent_impl_any_bytes(data, seed):
    """Bit-exactness of the vectorized murmur3 h1 lane on arbitrary byte
    strings (goldens only cover a handful of lengths; tail handling has
    15 distinct switch arms, MurmurHash3 public-domain reference)."""
    assert int(murmur3_x64_128_h1_bytes(data, seed)) == _mmh3_ref(data, seed)


@given(st.lists(u64, max_size=300, unique=True))
@settings(max_examples=200, deadline=None)
def test_signed_codec_roundtrip_and_order(vals):
    """Sign-flip int64 codec: lossless and strictly order-preserving, so
    unsigned sketch order == Spark LongType sort order."""
    u = np.array(sorted(vals), dtype=np.uint64)
    enc = encode_signed(u)
    assert (decode_signed(enc) == u).all()
    # strictly increasing in signed space (elementwise — np.diff would
    # overflow int64 across the sign boundary)
    assert (enc[1:] > enc[:-1]).all()
    # bytes round-trip (the parquet blob path)
    assert (decode_sketch_bytes(enc.astype("<i8").tobytes()) == u).all()


def _merge_oracle(a: np.ndarray, b: np.ndarray, s: int) -> tuple[int, int]:
    """Set-based restatement of the capped merge: walk the union of the
    two bottom-k sketches in ascending order, counting the first s
    distinct values (denom) and how many of those are in both (common)."""
    union = np.union1d(a, b)[:s]
    common = int(np.isin(union, a).astype(int) @ np.isin(union, b).astype(int))
    return common, len(union)


@given(
    st.lists(u64, max_size=120, unique=True),
    st.lists(u64, max_size=120, unique=True),
    st.integers(min_value=1, max_value=96),
)
@settings(max_examples=300, deadline=None)
def test_capped_merge_matches_set_oracle(a, b, s):
    """capped_merge == the set-semantics oracle for every (a, b, s),
    including empty sides, s larger than both, and dense collisions
    (CommandDistance.cpp:336-385 semantics)."""
    aa = np.sort(np.array(a, dtype=np.uint64))
    bb = np.sort(np.array(b, dtype=np.uint64))
    got = compare.capped_merge(aa, bb, s)
    want = _merge_oracle(aa, bb, s)
    assert got == want
    # the batch path agrees bit-for-bit (signed-encoded input)
    c, d = compare.capped_merge_sorted_batch(
        [np.sort(encode_signed(aa))], [np.sort(encode_signed(bb))], s)
    assert (int(c[0]), int(d[0])) == want


def _binom_sf_oracle(x: int, r: float, n: int) -> float:
    """P(X >= x), X ~ Binomial(n, r), by direct log-space summation."""
    if x <= 0:
        return 1.0
    if x > n:
        return 0.0
    if r <= 0.0:
        return 0.0
    if r >= 1.0:
        return 1.0
    total = 0.0
    for i in range(x, n + 1):
        lt = (math.lgamma(n + 1) - math.lgamma(i + 1) - math.lgamma(n - i + 1)
              + i * math.log(r) + (n - i) * math.log1p(-r))
        total += math.exp(lt)
    return min(total, 1.0)


@given(
    st.integers(min_value=0, max_value=64),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=300, deadline=None)
def test_binom_sf_matches_direct_sum(x_minus_1, r, n):
    x = min(x_minus_1, n)  # valid domain: shared count <= sketch size
    got = float(compare.binom_sf(
        np.array([x]), np.array([r]), np.array([n]))[0])
    want = _binom_sf_oracle(x + 1, r, n)
    assert got == min(got, 1.0) and got >= 0.0
    assert math.isclose(got, want, rel_tol=1e-6, abs_tol=1e-300)


@given(
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=1, max_value=1000),
    st.integers(min_value=1, max_value=32),
)
@settings(max_examples=300, deadline=None)
def test_distance_identity_bounds(common, denom, k):
    """Mash distance and identity stay in [0, 1] and are consistent:
    d = 0 iff j = 1, d = 1 when j = 0 (CommandDistance.cpp:387-407)."""
    common = min(common, denom)
    d = compare.mash_distance(common, denom, k)
    ident = compare.identity(common, denom, k)
    assert 0.0 <= d <= 1.0 and 0.0 <= ident <= 1.0
    if common == denom:
        assert d == 0.0
    if common == 0:
        assert d == 1.0
    # more sharing never increases distance
    if common < denom:
        assert compare.mash_distance(common + 1, denom, k) <= d


@given(
    st.integers(1, 5), st.integers(1, 24), st.integers(1, 24),
    st.booleans(), st.integers(1, 60), st.integers(1, 4),
)
@settings(max_examples=120, deadline=None)
def test_y4m_roundtrip_any_shape(n, h, w, mono, fps_num, fps_den):
    """Y4M encode->decode is lossless for every frame-count/shape/
    colorspace/framerate combination (goldens cover a handful)."""
    from mashspark.codecs import decode_y4m, encode_y4m

    rng = np.random.default_rng(n * 1_000_003 + h * 1009 + w)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    got, fps = decode_y4m(encode_y4m(frames, fps_num, fps_den, mono=mono))
    assert (got == frames).all()
    assert abs(fps - fps_num / fps_den) < 1e-12


@given(st.integers(0, 500), st.integers(1, 64))
@settings(max_examples=300, deadline=None)
def test_sample_frame_indices_properties(n_frames, n_sample):
    """Uniform frame sampling: exactly min(n_sample, n_frames) indices,
    strictly increasing, in range, endpoints included when k > 1."""
    from mashspark.multimodal import sample_frame_indices

    idx = sample_frame_indices(n_frames, n_sample)
    k = min(n_sample, n_frames)
    assert len(idx) == k
    if k:
        assert idx[0] == 0
        assert (idx >= 0).all() and (idx < n_frames).all()
        if k > 1:
            assert idx[-1] == n_frames - 1
            assert (np.diff(idx) > 0).all()
