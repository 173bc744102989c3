"""Pure-python/numpy PNG codec (ISO/IEC 15948 / RFC 2083) — closes the
"non-JPEG compressed formats still stubbed" gap: PNG is the most common
web image container after JPEG, and python ships the only external
dependency (zlib) in its standard library.

Decoder coverage: all five color types (greyscale, truecolor, palette,
grey+alpha, RGBA), bit depths 1/2/4/8/16, all five scanline filters
(None/Sub/Up/Average/Paeth), Adam7 interlacing. Ancillary chunks —
including tRNS transparency — are skipped per spec (alpha is irrelevant
to the luma consumers; in-stream alpha CHANNELS of color types 4/6 are
decoded and dropped). CRC mismatches, truncated streams, and malformed
headers raise ``ValueError`` — callers (``multimodal.decode_media``)
treat that as a corrupt crawl row and fall back to the stub, never a
task failure.

Encoder: filter-0 scanlines + zlib, greyscale or RGB 8-bit — enough for
bit-exact round-trip tests and deterministic fixtures.

Scanline unfiltering is sequential by definition (each row references
the previous); the Sub filter vectorizes as a per-lane prefix sum and
None/Up are pure numpy, while Average/Paeth fall back to a per-pixel
loop — fine at thumbnail scale, and at 100 TB the decode runs inside
Arrow-batched ``mapInPandas`` workers where throughput scales with
executors, not per-image speed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> channels
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step) — note passes
# 4 and 6 start at y=0 (validated against libpng's pngtest.png)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _chunks(payload: bytes):
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG stream")
    i = 8
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + length]
        if len(data) != length or i + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[i + 8 + length:i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, data
        i += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int,
              rowbytes: int) -> np.ndarray:
    """filtered scanlines -> (height, rowbytes) uint8 recon array."""
    need = height * (rowbytes + 1)
    if len(raw) < need:
        raise ValueError("PNG IDAT too short for image dimensions")
    out = np.zeros((height, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=rowbytes, offset=pos + 1).copy()
        pos += rowbytes + 1
        if ft == 0:
            pass
        elif ft == 1:  # Sub: per-bpp-lane prefix sum (mod 256 commutes;
            # rowbytes is always a multiple of bpp: depth<8 -> bpp=1,
            # depth>=8 -> rowbytes = width*bpp)
            lanes = row.reshape(-1, bpp)
            row = (np.cumsum(lanes, axis=0, dtype=np.uint64) % 256
                   ).astype(np.uint8).ravel()
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average (sequential by spec)
            for x in range(rowbytes):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth (sequential by spec)
            for x in range(rowbytes):
                left = int(row[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = row
        prev = row
    return out


def _unpack_bits(recon: np.ndarray, width: int, depth: int,
                 channels: int) -> np.ndarray:
    """(h, rowbytes) recon bytes -> (h, width, channels) int array of
    raw sample values at the stated depth."""
    h = recon.shape[0]
    if depth == 8:
        flat = recon[:, : width * channels]
        return flat.reshape(h, width, channels).astype(np.int32)
    if depth == 16:
        flat = recon[:, : width * channels * 2].reshape(h, -1, 2)
        vals = (flat[:, :, 0].astype(np.int32) << 8) | flat[:, :, 1]
        return vals.reshape(h, width, channels)
    # 1/2/4-bit packed (greyscale or palette; single channel per spec)
    bits = np.unpackbits(recon, axis=1)
    per = depth
    vals = np.zeros((h, width), dtype=np.int32)
    for b in range(per):
        vals = (vals << 1) | bits[:, b::per][:, :width]
    return vals[:, :, None]


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB (alpha dropped, palette
    resolved, 16-bit scaled to 8). Raises ``ValueError`` on malformed
    input."""
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        # ancillary chunks (tEXt, gAMA, tRNS alpha, ...) skipped
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    width, height, depth, ctype_, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if ctype_ not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype_}")
    if depth not in (1, 2, 4, 8, 16) or (
            depth < 8 and ctype_ not in (0, 3)):
        raise ValueError(f"invalid bit depth {depth} for color type {ctype_}")
    if width <= 0 or height <= 0 or width * height > 1 << 26:
        raise ValueError("implausible PNG dimensions")
    channels = _CHANNELS[ctype_]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG inflate failed: {e}") from None

    def bpp_row(w):
        bits_px = depth * channels
        return max(1, (bits_px + 7) // 8), (w * bits_px + 7) // 8

    if interlace == 0:
        bpp, rowbytes = bpp_row(width)
        recon = _unfilter(raw, width, height, bpp, rowbytes)
        samples = _unpack_bits(recon, width, depth, channels)
    elif interlace == 1:  # Adam7
        samples = np.zeros((height, width, channels), dtype=np.int32)
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            bpp, rowbytes = bpp_row(pw)
            need = ph * (rowbytes + 1)
            recon = _unfilter(raw[pos:pos + need], pw, ph, bpp, rowbytes)
            pos += need
            sub = _unpack_bits(recon, pw, depth, channels)
            samples[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")

    maxval = (1 << depth) - 1
    if ctype_ == 3:  # palette
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = samples[:, :, 0]
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if depth == 16:
        samples = samples >> 8
        maxval = 255
    elif depth < 8:
        samples = (samples * 255) // maxval
        maxval = 255
    samples = samples.astype(np.uint8)
    if ctype_ == 0:
        g = samples[:, :, 0]
        return np.stack([g, g, g], axis=2)
    if ctype_ == 2:
        return samples
    if ctype_ == 4:
        g = samples[:, :, 0]
        return np.stack([g, g, g], axis=2)
    return samples[:, :, :3]  # RGBA -> drop alpha


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w) greyscale or (h, w, 3) RGB uint8 -> PNG bytes
    (filter-0 scanlines; deterministic for fixed zlib level)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype_, channels = 0, 1
        body = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype_, channels = 2, 3
        body = img
    else:
        raise ValueError("encode_png expects (h,w) or (h,w,3) uint8")
    h, w = body.shape[:2]
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),
         body.reshape(h, w * channels)], axis=1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
    idat = zlib.compress(rows.tobytes(), compress_level)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))
