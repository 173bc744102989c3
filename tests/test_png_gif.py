"""PNG + GIF codecs: round-trips through our encoders, hand-built
streams exercising every scanline filter / color type / interlace mode
(the test forward-filters; the library must invert), an independent
dictionary-building LZW encoder for GIF, and corrupt-stream fallbacks
through the media dispatch."""

import struct
import zlib

import numpy as np
import pytest

from mashspark.gif import decode_gif, encode_gif
from mashspark.png import _chunk, _SIGNATURE, decode_png, encode_png


def _img(h=13, w=17, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# --------------------------------------------------------------- PNG

def _build_png(width, height, depth, ctype, scanlines, plte=None,
               interlace=0):
    """Assemble a PNG from pre-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0,
                       interlace)
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(scanlines))
    return out + _chunk(b"IEND", b"")


def _forward_filter(img_rows, bpp, ftypes):
    """Apply per-row filters (the encoder side the lib must invert)."""
    prev = np.zeros_like(img_rows[0])
    out = bytearray()
    for y, row in enumerate(img_rows):
        ft = ftypes[y % len(ftypes)]
        r = row.astype(np.int32)
        left = np.zeros_like(r)
        left[bpp:] = r[:-bpp]
        up = prev.astype(np.int32)
        ul = np.zeros_like(up)
        ul[bpp:] = up[:-bpp]
        if ft == 0:
            f = r
        elif ft == 1:
            f = r - left
        elif ft == 2:
            f = r - up
        elif ft == 3:
            f = r - ((left + up) >> 1)
        else:  # paeth
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, ul))
            f = r - pred
        out.append(ft)
        out += (f % 256).astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def test_png_roundtrip_rgb_and_grey():
    rgb = _img(9, 11, 3, seed=1)
    assert (decode_png(encode_png(rgb)) == rgb).all()
    g = _img(6, 8, 1, seed=2)
    out = decode_png(encode_png(g))
    assert (out == np.stack([g, g, g], axis=2)).all()


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filters_invert(ftypes):
    img = _img(12, 7, 3, seed=3)
    rows = img.reshape(12, -1)
    payload = _build_png(7, 12, 8, 2, _forward_filter(rows, 3, ftypes))
    assert (decode_png(payload) == img).all()


def test_png_palette_and_lowdepth():
    plte = _img(1, 16, 3, seed=4).reshape(16, 3)
    idx = np.arange(60, dtype=np.uint8).reshape(6, 10) % 16
    # depth 8 palette
    payload = _build_png(10, 6, 8, 3,
                         _forward_filter(idx.reshape(6, -1), 1, [0]),
                         plte=plte)
    assert (decode_png(payload) == plte[idx]).all()
    # depth 4 palette (2 px/byte)
    packed = (idx[:, 0::2] << 4) | idx[:, 1::2]
    payload4 = _build_png(10, 6, 4, 3,
                          _forward_filter(packed.reshape(6, -1), 1, [0]),
                          plte=plte)
    assert (decode_png(payload4) == plte[idx]).all()
    # depth 1 greyscale: bits -> 0/255
    bits = (np.arange(48).reshape(6, 8) % 2).astype(np.uint8)
    packedg = np.packbits(bits, axis=1)
    payload1 = _build_png(8, 6, 1, 0,
                          _forward_filter(packedg.reshape(6, -1), 1, [0]))
    out = decode_png(payload1)
    assert (out[:, :, 0] == bits * 255).all()


def test_png_16bit_and_alpha_types():
    g16 = _img(5, 6, 1, seed=5).astype(np.uint16) << 8 | 0x7F
    raw = g16.byteswap().tobytes() if g16.dtype.byteorder == "<" else g16.tobytes()
    rows = np.frombuffer(
        g16.astype(">u2").tobytes(), dtype=np.uint8).reshape(5, -1)
    payload = _build_png(6, 5, 16, 0, _forward_filter(rows, 2, [0, 2]))
    out = decode_png(payload)
    assert (out[:, :, 0] == (g16 >> 8).astype(np.uint8)).all()
    # grey+alpha: alpha dropped
    ga = _img(4, 5, 2, seed=6)
    payload = _build_png(5, 4, 8, 4,
                         _forward_filter(ga.reshape(4, -1), 2, [0, 1]))
    assert (decode_png(payload)[:, :, 0] == ga[:, :, 0]).all()
    # RGBA: alpha dropped
    rgba = _img(4, 5, 4, seed=7)
    payload = _build_png(5, 4, 8, 6,
                         _forward_filter(rgba.reshape(4, -1), 4, [4]))
    assert (decode_png(payload) == rgba[:, :, :3]).all()


def test_png_adam7_interlace():
    img = _img(10, 9, 3, seed=8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    body = bytearray()
    for (x0, y0, dx, dy) in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        body += _forward_filter(sub.reshape(sub.shape[0], -1), 3, [0])
    payload = _build_png(9, 10, 8, 2, bytes(body), interlace=1)
    assert (decode_png(payload) == img).all()


def test_png_corruption_raises_and_media_falls_back():
    from mashspark.multimodal import (_decode_image_stub,
                                      decode_media_routed, payload_format)

    good = encode_png(_img(8, 8, 3, seed=9))
    assert payload_format(good) == "png"
    plane, fmt, real = decode_media_routed(good)
    assert fmt == "png" and real and plane.shape == (8, 8)
    bad = bytearray(good)
    bad[30] ^= 0xFF  # corrupt IHDR/IDAT body -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    plane, fmt, real = decode_media_routed(bytes(bad))
    assert fmt == "png" and not real
    assert (plane == _decode_image_stub(bytes(bad))).all()
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated


# --------------------------------------------------------------- GIF

def _lzw_encode_ref(indices, min_code):
    """Independent dictionary-building LZW encoder (the real GIF
    algorithm, written against the spec, not mirroring gif.py's
    literal-only encoder) — decoding its output exercises dictionary
    growth, width bumps and the KwKwK case."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code + 1
    out, acc, acc_bits = bytearray(), 0, 0

    def emit(code):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    emit(clear)
    w = b""
    for px in bytes(bytearray(int(i) for i in indices)):
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(eoi)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _build_gif(idx, palette, min_code=8, interlace=False, data=None,
               extensions=b""):
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += extensions
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    if data is None:
        data = _lzw_encode_ref(idx.ravel(), min_code)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        blk = data[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3B"
    return bytes(out)


def _grey_palette():
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g], axis=1)


def test_gif_roundtrip_grey():
    img = _img(11, 14, 1, seed=10)
    out = decode_gif(encode_gif(img))
    assert (out == np.stack([img] * 3, axis=2)).all()


def test_gif_real_lzw_with_dictionary_growth_and_kwkwk():
    # long runs force KwKwK; 300+ distinct sequences force width bumps
    idx = np.concatenate([
        np.zeros(400, dtype=np.uint8),                     # KwKwK runs
        np.tile(np.arange(64, dtype=np.uint8), 12),        # dict growth
        _img(1, 500, 1, seed=11).ravel(),
    ])
    idx = idx[:900].reshape(30, 30)
    payload = _build_gif(idx, _grey_palette())
    out = decode_gif(payload)
    assert (out[:, :, 0] == idx).all()


def test_gif_interlaced_and_extensions_skipped():
    img = _img(16, 9, 1, seed=12)
    order = np.concatenate([np.arange(0, 16, 8), np.arange(4, 16, 8),
                            np.arange(2, 16, 4), np.arange(1, 16, 2)])
    shuffled = img[order]  # rows stored in pass order
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    comment = b"\x21\xFE\x05hello\x00"
    payload = _build_gif(shuffled, _grey_palette(), interlace=True,
                         extensions=gce + comment)
    out = decode_gif(payload)
    assert (out[:, :, 0] == img[:, :, 0] if img.ndim == 3
            else out[:, :, 0] == img).all()


def test_gif_corruption_raises_and_media_falls_back():
    from mashspark.multimodal import (_decode_image_stub,
                                      decode_media_routed, payload_format)

    good = encode_gif(_img(8, 8, 1, seed=13))
    assert payload_format(good) == "gif"
    plane, fmt, real = decode_media_routed(good)
    assert fmt == "gif" and real and plane.shape == (8, 8)
    with pytest.raises(ValueError):
        decode_gif(good[:-20])  # truncated data stream
    plane, fmt, real = decode_media_routed(good[:-20])
    assert fmt == "gif" and not real
    assert (plane == _decode_image_stub(good[:-20])).all()
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 5)  # truncated header


def test_phash_real_flag_covers_png_gif():
    from mashspark.phash import _looks_real

    assert _looks_real(encode_png(_img(8, 8, 3)))
    assert _looks_real(encode_gif(_img(8, 8, 1)))
    assert not _looks_real(b"plain text payload")


def test_real_world_files_decode_when_present():
    """Real encoder output from system packages (libpng's canonical
    Adam7 pngtest.png, libxslt's GIFs): dimensions from the header must
    match the decoded array. Skipped quietly on systems without them."""
    import glob
    import os

    pt = "/usr/share/doc/libpng-dev/examples/pngtest.png"
    if os.path.exists(pt):
        b = open(pt, "rb").read()
        w, h = struct.unpack(">II", b[16:24])
        assert decode_png(b).shape == (h, w, 3)
    checked = 0
    for f in sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))[:5]:
        b = open(f, "rb").read()
        w, h = struct.unpack("<HH", b[6:10])
        assert decode_gif(b).shape == (h, w, 3)
        checked += 1
    for f in sorted(glob.glob("/usr/share/doc/python3/_static/*.png"))[:5]:
        b = open(f, "rb").read()
        w, h = struct.unpack(">II", b[16:24])
        assert decode_png(b).shape == (h, w, 3)
        checked += 1


@pytest.mark.parametrize("h,w", [(1, 1), (1, 9), (9, 1), (3, 5),
                                 (8, 8), (13, 31)])
def test_png_gif_roundtrip_odd_geometries(h, w):
    rgb = _img(h, w, 3, seed=h * 100 + w)
    assert (decode_png(encode_png(rgb)) == rgb).all()
    g = _img(h, w, 1, seed=h * 100 + w + 1)
    out = decode_gif(encode_gif(g))
    assert (out[:, :, 0] == g).all()


def test_png_adam7_odd_geometries():
    """Interlaced decode at sizes where several Adam7 passes are empty
    (w or h < pass start): pass-skip bookkeeping must not drift."""
    for (h, w) in [(1, 1), (2, 3), (4, 4), (5, 9), (3, 16)]:
        img = _img(h, w, 3, seed=h * 7 + w)
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        body = bytearray()
        for (x0, y0, dx, dy) in passes:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            body += _forward_filter(sub.reshape(sub.shape[0], -1), 3, [0])
        payload = _build_png(w, h, 8, 2, bytes(body), interlace=1)
        assert (decode_png(payload) == img).all(), (h, w)
