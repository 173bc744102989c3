"""JPEG codec (jpeg.py): DCT orthonormality, encode/decode round trips
across quality / subsampling / restart intervals / odd dimensions /
grayscale, structural strictness (truncated/garbage streams refused),
quality monotonicity, the multimodal dispatch (FF D8 payloads take the
REAL decode path, stub fallback for corrupt streams), and progressive
(SOF2) decode: bit-identity with baseline across scan scripts and
geometries, EOBn>1 runs via a custom-table stream, and real libjpeg
progressive files from system packages."""

import numpy as np
import pytest

from mashspark.jpeg import (_dct_matrix, decode_jpeg, encode_jpeg,
                            quality_to_tables, ZIGZAG)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def _test_image(h: int = 48, w: int = 64) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 128 + 100 * np.sin(yy / 6.0) * np.cos(xx / 9.0)
    return np.stack(
        [base, base / 2 + 40, 255 - base], axis=2
    ).clip(0, 255).astype(np.uint8)


def test_dct_matrix_orthonormal():
    a = _dct_matrix()
    assert np.abs(a @ a.T - np.eye(8)).max() < 1e-12


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-checks: scan starts 0,1,8,16,9,2 and ends ...,55,62,63
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-3:].tolist() == [55, 62, 63]


def test_quality_scaling_monotone_and_clamped():
    q10, _ = quality_to_tables(10)
    q50, _ = quality_to_tables(50)
    q95, _ = quality_to_tables(95)
    assert (q10 >= q50).all() and (q50 >= q95).all()
    assert q95.min() >= 1 and q10.max() <= 255
    # quality 50 is the unscaled Annex K table
    from mashspark.jpeg import QUANT_LUMA
    assert (q50 == QUANT_LUMA).all()


def test_flat_color_roundtrip_exact():
    img = np.full((32, 32, 3), (200, 30, 90), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    # a constant block is pure DC; only color-transform rounding remains
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("quality,subsample,ri,floor", [
    (90, False, 0, 40.0),
    (90, True, 0, 33.0),   # 4:2:0: replication upsample caps chroma PSNR
    (50, False, 0, 32.0),
    (90, False, 2, 40.0),   # restart markers every 2 MCUs
    (85, True, 3, 33.0),    # 4:2:0 + restarts
])
def test_roundtrip_psnr(quality, subsample, ri, floor):
    img = _test_image()
    payload = encode_jpeg(img, quality=quality, subsample=subsample,
                          restart_interval=ri)
    assert payload[:2] == b"\xFF\xD8" and payload[-2:] == b"\xFF\xD9"
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    assert _psnr(out, img) > floor


def test_restart_markers_present_and_equivalent():
    img = _test_image(24, 40)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=1))
    rst_payload = encode_jpeg(img, quality=90, restart_interval=1)
    # RST0 marker must actually appear in the entropy stream
    assert b"\xFF\xD0" in rst_payload
    # restart segmentation must not change decoded pixels
    assert (plain == with_rst).all()


def test_odd_dimensions_and_grayscale():
    yy, xx = np.mgrid[0:33, 0:29]
    g = ((yy * 7 + xx * 5) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == (33, 29) and out.ndim == 2
    assert _psnr(out, g) > 30.0
    # odd-dim color with 4:2:0 (chroma padding + crop path)
    img = _test_image(37, 51)
    out = decode_jpeg(encode_jpeg(img, quality=88, subsample=True))
    assert out.shape == img.shape
    assert _psnr(out, img) > 30.0


def test_quality_monotone_mse():
    img = _test_image()
    lo = decode_jpeg(encode_jpeg(img, quality=30, subsample=True))
    hi = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    mse = lambda a: np.mean((a.astype(float) - img.astype(float)) ** 2)
    assert mse(hi) < mse(lo)
    # higher quality also costs more bytes
    assert len(encode_jpeg(img, quality=95)) > len(encode_jpeg(img, quality=30))


def test_decoder_refuses_non_baseline_and_garbage():
    img = _test_image(16, 16)
    payload = bytearray(encode_jpeg(img, quality=80))
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = payload.index(b"\xFF\xC0")
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img)[:40])  # truncated before scan


def test_truncated_entropy_detected():
    img = _test_image(32, 32)
    payload = encode_jpeg(img, quality=85)
    # cut the entropy stream in half (keep headers), re-append EOI
    i = payload.index(b"\xFF\xDA")
    seglen = int.from_bytes(payload[i + 2:i + 4], "big")
    scan_start = i + 2 + seglen
    cut = scan_start + (len(payload) - 2 - scan_start) // 4
    with pytest.raises(ValueError):
        decode_jpeg(payload[:cut] + b"\xFF\xD9")


def test_multimodal_dispatch_takes_real_jpeg_path():
    from mashspark.multimodal import _decode_image_stub, decode_media

    img = _test_image(24, 24)
    payload = encode_jpeg(img, quality=90)
    plane = decode_media(payload)
    expect = decode_jpeg(payload).mean(axis=2).astype(np.float32) / 255.0
    assert plane.shape == (24, 24)
    assert np.allclose(plane, expect)
    # a malformed FF D8 payload falls back to the stub, never raises
    bad = b"\xFF\xD8" + b"\x00" * 64
    fallback = decode_media(bad)
    assert (fallback == _decode_image_stub(bad)).all()


def test_phash_real_flag_covers_jpeg():
    from mashspark.phash import _looks_real, dhash_from_plane
    from mashspark.multimodal import decode_media

    img = _test_image()
    payload = encode_jpeg(img, quality=90)
    assert _looks_real(payload)
    # perceptual stability: a heavy re-encode (q60 + 4:2:0) of the same
    # image stays within a small hamming radius of the original's dHash
    # (saturated synthetic gradients drift more than photos; 8 bits here
    # vs the 6-bit default pair threshold is expected for this fixture)
    h1 = dhash_from_plane(decode_media(payload))
    h2 = dhash_from_plane(decode_media(encode_jpeg(img, quality=60,
                                                   subsample=True)))
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 8


def test_zero_sampling_factor_raises_valueerror_not_zerodivision():
    """T.81 bounds check: a corrupt SOF with Hi or Vi = 0 must raise
    ValueError (decode_media's corrupt-row fallback catches it), never
    ZeroDivisionError (which would fail the whole Spark task)."""
    from mashspark.multimodal import _decode_image_stub, decode_media

    img = _test_image(16, 16)
    payload = bytearray(encode_jpeg(img, quality=90))
    sof = payload.find(b"\xFF\xC0")
    assert sof > 0
    hv_off = sof + 11  # marker(2) len(2) precision(1) dims(4) nc(1) cid(1)
    payload[hv_off] = 0x04  # h=0, v=4
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    # and the media dispatcher degrades to the stub
    out = decode_media(bytes(payload))
    assert (out == _decode_image_stub(bytes(payload))).all()


# ---------------------------------------------------------------- progressive

def test_progressive_decode_identical_to_baseline():
    """Progressive coding reorganizes the same quantized coefficients,
    so decode(progressive bytes) must be BIT-IDENTICAL to
    decode(baseline bytes) at the same quality — across spectral-
    selection-only and full successive-approximation scan scripts,
    4:4:4 and 4:2:0, color and grayscale."""
    from mashspark.jpeg import encode_jpeg_progressive

    img = _test_image(25, 35)
    for subsample in (False, True):
        for successive in (False, True):
            b = decode_jpeg(encode_jpeg(img, quality=80,
                                        subsample=subsample))
            p = decode_jpeg(encode_jpeg_progressive(
                img, quality=80, subsample=subsample,
                successive=successive))
            assert (b == p).all(), (subsample, successive)
    g = img.mean(axis=2).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg(g, quality=85))
            == decode_jpeg(encode_jpeg_progressive(g, quality=85))).all()


def test_progressive_eobrun_greater_than_one():
    """EOBn (n>1) run decoding needs symbols the Annex K tables lack, so
    our encoder flushes runs at 1 — craft a scan with a custom AC table
    holding the 0x10/0x20 EOBn symbols and a 5-block EOB run: blocks
    after the first must stay all-zero while correction-free decode
    continues correctly."""
    import struct as _s

    from mashspark.jpeg import (_BitWriter, _HuffTable, _dqt_segment,
                                decode_jpeg)

    # custom AC table: EOB1(0x00), EOBn r=2 (0x20), (0,1), ZRL — plus a
    # DC table for the mandatory DC scan
    ac_bits = [0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x20, 0x01, 0xF0]
    dc_bits = [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = [0x00, 0x01]
    ac = _HuffTable(ac_bits, ac_vals)
    dc = _HuffTable(dc_bits, dc_vals)

    def dht(tc, th, bits, vals):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + _s.pack(">H", len(body) + 2) + body

    # 16x40 grayscale -> 2x5 = 10 blocks; q=99 so the single size-1 AC
    # coefficient dequantizes to 99 (visible after IDCT rounding)
    h, w = 16, 40
    q = np.full(64, 99, dtype=np.int32)
    out = bytearray(b"\xFF\xD8")
    out += _dqt_segment(0, q)
    sof = _s.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xFF\xC2" + _s.pack(">H", len(sof) + 2) + sof
    out += dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals)
    # DC scan: all-zero DC (symbol 0x00 per block)
    bw = _BitWriter()
    for _ in range(10):
        c, ln = dc.codes[0x00]
        bw.write(c, ln)
    bw.flush()
    sos = bytes([1, 1, 0x00, 0, 0, 0x00])
    out += b"\xFF\xDA" + _s.pack(">H", len(sos) + 2) + sos + bw.out
    # AC scan 1-63: block0 gets coeff k=1 value 1, then EOBn run of 4
    # (0x20 + 2 extra bits '00' -> run 4), then EOB1 for the last 5
    bw = _BitWriter()
    c, ln = ac.codes[0x01]
    bw.write(c, ln)
    bw.write(1, 1)  # magnitude bit for size-1 positive
    c, ln = ac.codes[0x00]
    bw.write(c, ln)  # block 0 band ends
    c, ln = ac.codes[0x20]
    bw.write(c, ln)
    bw.write(0, 2)  # EOBRUN = 4: blocks 1-4 all zero
    for _ in range(5):  # blocks 5-9: EOB1 each
        c, ln = ac.codes[0x00]
        bw.write(c, ln)
    bw.flush()
    sos = bytes([1, 1, 0x00, 1, 63, 0x00])
    out += b"\xFF\xDA" + _s.pack(">H", len(sos) + 2) + sos + bw.out
    out += b"\xFF\xD9"

    img = decode_jpeg(bytes(out))
    assert img.shape == (h, w)
    # coeff (0,1)=1 with flat quant: first block non-flat, others flat 128
    blk0 = img[:8, :8].astype(int)
    assert blk0.std() > 0
    for bi in range(1, 5):
        blk = img[:8, 8 * bi:8 * (bi + 1)].astype(int)
        assert blk.min() == blk.max() == 128, f"block {bi} not flat"


def test_real_progressive_files_decode_when_present():
    """Real libjpeg progressive output (custom Huffman tables, EOBn>1,
    successive approximation): the Spark mllib sample grayscale.jpg is
    a progressive re-encode of the baseline chr30.4.184.jpg — decoded
    content must correlate with the baseline decode's luma."""
    import os

    d = "/opt/spark/data/mllib/images/origin/multi-channel"
    prog, base = f"{d}/grayscale.jpg", f"{d}/chr30.4.184.jpg"
    if not (os.path.exists(prog) and os.path.exists(base)):
        return
    g = decode_jpeg(open(prog, "rb").read()).astype(float)
    c = decode_jpeg(open(base, "rb").read()).astype(float)
    assert g.shape == (215, 300) and c.shape == (215, 300, 3)
    luma = 0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]
    corr = np.corrcoef(g.ravel(), luma.ravel())[0, 1]
    assert corr > 0.99, f"progressive decode decorrelated: {corr}"


@pytest.mark.parametrize("h,w", [(1, 1), (8, 8), (7, 9), (9, 17),
                                 (16, 16), (17, 33), (24, 15)])
def test_progressive_identity_odd_geometries(h, w):
    """Edge geometry: non-interleaved AC-scan block dims (true ceil
    dims) vs the padded MCU grid diverge at odd sizes with 4:2:0 —
    progressive must stay bit-identical to baseline at every shape."""
    from mashspark.jpeg import encode_jpeg_progressive

    img = _test_image(h, w)
    for subsample in (False, True):
        b = decode_jpeg(encode_jpeg(img, quality=75, subsample=subsample))
        p = decode_jpeg(encode_jpeg_progressive(img, quality=75,
                                                subsample=subsample))
        assert (b == p).all(), (h, w, subsample)


def test_progressive_missing_dc_dht_degrades_not_crashes():
    """ADVICE r5: a progressive stream whose DC DHT is stripped must fail
    with an exception class the stub-fallback catches (KeyError et al.),
    never AttributeError from dereferencing a None table."""
    import numpy as np

    from mashspark.jpeg import decode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    payload = bytearray(encode_jpeg_progressive(img))
    # strip every DC-class DHT segment (table class 0)
    out = bytearray()
    i = 0
    while i < len(payload):
        if payload[i] == 0xFF and i + 3 < len(payload) and payload[i + 1] == 0xC4:
            seglen = (payload[i + 2] << 8) | payload[i + 3]
            tc = payload[i + 4] >> 4
            if tc == 0:
                i += 2 + seglen
                continue
        out.append(payload[i])
        i += 1
    try:
        decode_jpeg(bytes(out))
    except (ValueError, IndexError, KeyError) as e:
        assert not isinstance(e, AttributeError)
    else:
        raise AssertionError("expected decode failure on stripped DC DHT")
