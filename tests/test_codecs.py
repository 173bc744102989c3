"""Pure-numpy media codecs (codecs.py): encode/decode round trips, header
edge cases, the area-mean resize kernel, and the multimodal magic-byte
dispatch (real decode for WAV/BMP/PNM, stub fallback for everything
else including corrupt payloads)."""

import numpy as np
import pytest

from mashspark import codecs
from mashspark.multimodal import _decode_image_stub, decode_media


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    for n_ch in (1, 2):
        x = rng.uniform(-0.9, 0.9, size=(500, n_ch)).astype(np.float32)
        blob = codecs.encode_wav(x, 16000)
        y, rate = codecs.decode_wav(blob)
        assert rate == 16000
        assert y.shape == (500, n_ch)
        assert np.max(np.abs(y - x)) < 1.5 / 32767


def test_wav_8bit_and_float32():
    # 8-bit PCM constructed by hand
    import struct
    raw = bytes(range(0, 256))
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    blob = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE" + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    y, rate = codecs.decode_wav(blob)
    assert rate == 8000 and y.shape == (256, 1)
    assert y[128, 0] == 0.0 and y[0, 0] == -1.0
    # IEEE float32
    x = np.linspace(-1, 1, 64, dtype=np.float32)
    data = x.astype("<f4").tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 44100, 44100 * 4, 4, 32)
    blob = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    y, rate = codecs.decode_wav(blob)
    assert rate == 44100
    assert np.array_equal(y[:, 0], x)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        codecs.decode_wav(b"\x00" * 40)


def test_bmp_roundtrip_including_row_padding():
    rng = np.random.default_rng(5)
    # widths 3/5 exercise the 4-byte row padding; 4 exercises none
    for h, w in [(7, 3), (2, 5), (8, 4), (1, 1)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = codecs.encode_bmp(img)
        out = codecs.decode_bmp(blob)
        assert np.array_equal(out, img)


def test_bmp_top_down():
    import struct
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    blob = bytearray(codecs.encode_bmp(img))
    # flip height sign to top-down and reorder rows accordingly
    (h,) = struct.unpack_from("<i", blob, 22)
    struct.pack_into("<i", blob, 22, -h)
    stride = (2 * 3 + 3) & ~3
    rows = np.frombuffer(bytes(blob[54:]), dtype=np.uint8).reshape(h, stride)
    flipped = rows[::-1].tobytes()
    out = codecs.decode_bmp(bytes(blob[:54]) + flipped)
    assert np.array_equal(out, img)


def test_bmp_rejects_malformed():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = codecs.encode_bmp(img)
    with pytest.raises(ValueError):
        codecs.decode_bmp(blob[:30])          # truncated header
    with pytest.raises(ValueError):
        codecs.decode_bmp(blob[:54] + b"\x00")  # truncated pixels


def test_pnm_roundtrip_and_comments():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_pnm(codecs.encode_ppm(img)), img)
    gray = rng.integers(0, 256, size=(3, 6), dtype=np.uint8)
    blob = b"P5\n# a comment\n6 3\n255\n" + gray.tobytes()
    assert np.array_equal(codecs.decode_pnm(blob), gray)


def test_resize_plane_block_mean_exact():
    plane = np.arange(64, dtype=np.float32).reshape(8, 8)
    out = codecs.resize_plane(plane, 4, 4)
    exp = plane.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    assert np.allclose(out, exp)
    # non-divisible and upscale shapes still produce the right shape
    assert codecs.resize_plane(plane, 3, 5).shape == (3, 5)
    assert codecs.resize_plane(plane[:1, :1], 4, 4).shape == (4, 4)


def test_audio_energy_plane_shape_and_silence():
    silent = codecs.audio_energy_plane(np.zeros(1000, dtype=np.float32))
    assert silent.shape == (32, 8) and np.all(silent == 0)
    loud = codecs.audio_energy_plane(np.ones(1000, dtype=np.float32))
    assert loud[0, 0] == pytest.approx(1.0)


def test_decode_media_dispatch():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    plane = decode_media(codecs.encode_bmp(img))
    assert plane.shape == (6, 6)
    assert np.allclose(plane, img.mean(axis=2) / 255.0, atol=1e-6)
    wav = codecs.encode_wav(rng.uniform(-1, 1, 400), 8000)
    assert decode_media(wav).shape == (32, 8)
    ppm = codecs.encode_ppm(img)
    assert decode_media(ppm).shape == (6, 6)
    # unknown magic and CORRUPT known magic both fall back to the stub
    junk = bytes(rng.integers(0, 256, 100, dtype=np.uint8))
    assert np.array_equal(decode_media(junk), _decode_image_stub(junk))
    corrupt = codecs.encode_bmp(img)[:40]
    assert np.array_equal(decode_media(corrupt), _decode_image_stub(corrupt))


def test_y4m_roundtrip_mono_and_c420():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(6, 12, 16), dtype=np.uint8)
    for mono in (True, False):
        payload = codecs.encode_y4m(frames, fps_num=30, fps_den=1, mono=mono)
        got, fps = codecs.decode_y4m(payload)
        np.testing.assert_array_equal(got, frames)
        assert fps == 30.0


def test_y4m_odd_dims_and_default_colorspace():
    # odd w/h exercise the ceil-division chroma sizing; a header without
    # a C tag must default to C420jpeg per the spec
    frames = np.arange(2 * 7 * 9, dtype=np.uint8).reshape(2, 7, 9)
    payload = codecs.encode_y4m(frames, mono=False)
    assert b"C420jpeg" in payload
    no_c = payload.replace(b" C420jpeg", b"", 1)
    got, _ = codecs.decode_y4m(no_c)
    np.testing.assert_array_equal(got, frames)


def test_y4m_rejects_malformed():
    frames = np.zeros((1, 4, 4), dtype=np.uint8)
    good = codecs.encode_y4m(frames)
    with pytest.raises(ValueError):
        codecs.decode_y4m(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        codecs.decode_y4m(good[:-3])  # truncated frame data
    with pytest.raises(ValueError):
        codecs.decode_y4m(good[: good.find(b"\n") + 1])  # zero frames


def test_decode_media_routes_y4m_to_temporal_mean():
    f0 = np.full((4, 4), 10, dtype=np.uint8)
    f1 = np.full((4, 4), 30, dtype=np.uint8)
    plane = decode_media(codecs.encode_y4m(np.stack([f0, f1])))
    np.testing.assert_allclose(plane, np.full((4, 4), 20.0 / 255.0), rtol=1e-6)


def test_sample_frame_indices():
    from mashspark.multimodal import sample_frame_indices

    # fewer frames than samples: every frame, in order
    np.testing.assert_array_equal(sample_frame_indices(3, 4), [0, 1, 2])
    # k == 1 and empty
    np.testing.assert_array_equal(sample_frame_indices(5, 1), [0])
    assert len(sample_frame_indices(0, 4)) == 0
    # uniform spread includes both endpoints, strictly increasing
    idx = sample_frame_indices(10, 4)
    np.testing.assert_array_equal(idx, [0, 3, 6, 9])
    assert (np.diff(sample_frame_indices(100, 7)) > 0).all()


def test_sample_video_frames_end_to_end(spark):
    from mashspark.multimodal import sample_video_frames

    rows = []
    for mid in range(8):
        nf = 3 + mid % 5
        frames = np.stack([
            np.full((6, 8), (mid * 7 + f * 13) % 256, dtype=np.uint8)
            for f in range(nf)
        ])
        rows.append((mid, bytearray(codecs.encode_y4m(frames))))
    rows.append((99, bytearray(b"not a video at all")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = sample_video_frames(df, n_sample=4).collect()

    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r)
    for mid in range(8):
        nf = 3 + mid % 5
        rs = sorted(by_id[mid], key=lambda r: r.frame_idx)
        assert len(rs) == min(4, nf)
        for r in rs:
            assert r.n_frames == nf
            want = ((mid * 7 + r.frame_idx * 13) % 256) / 255.0
            assert abs(r.frame_mean - want) < 1e-12
            assert len(r.feature) == 16
    # corrupt payload degrades to one stub frame, not a task failure
    assert len(by_id[99]) == 1 and by_id[99][0].n_frames == 0
