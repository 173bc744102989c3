"""Pure-python GIF codec (GIF87a/89a, W3C spec) — with ``png.py`` and
``jpeg.py`` this completes real decode coverage of the big-three web
image containers.

Decoder: logical screen + global/local color tables, full LZW
decompression (variable code width, clear/EOI, 4095-entry dictionary),
4-pass interlacing, first frame of animated streams (near-dup media
fingerprinting needs one representative frame; frame sampling for video
runs through the Y4M path). Graphic-control/comment/application
extensions are skipped per spec; transparency resolves to the palette
color (alpha is dropped by the luma consumers anyway). Malformed
streams raise ``ValueError`` — ``multimodal.decode_media`` degrades
corrupt crawl rows to the stub, never a task failure.

Encoder: single-frame GIF87a with a 256-entry greyscale or provided
palette; LZW output uses literal codes with periodic clears (valid,
unoptimized) — enough for bit-exact round-trip fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


def _color_table(buf: bytes, pos: int, flag: int, size_bits: int):
    if not flag:
        return None, pos
    n = 2 << size_bits
    tbl = np.frombuffer(buf, dtype=np.uint8, count=3 * n,
                        offset=pos).reshape(n, 3).copy()
    return tbl, pos + 3 * n


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-blocks")
        sz = buf[pos]
        pos += 1
        if sz == 0:
            return bytes(out), pos
        if pos + sz > n:
            raise ValueError("truncated GIF sub-block")
        out += buf[pos:pos + sz]
        pos += sz


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary: entry -> (prefix entry | -1, last byte); roots implicit
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    next_code = eoi + 1
    code_size = min_code_size + 1
    acc = 0
    acc_bits = 0
    prev = -1
    scratch = bytearray()
    for byte in data:
        acc |= byte << acc_bits
        acc_bits += 8
        while acc_bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            acc_bits -= code_size
            if code == clear:
                next_code = eoi + 1
                code_size = min_code_size + 1
                prev = -1
                continue
            if code == eoi:
                return out[:n_out]
            if code >= next_code + 1 or (prev == -1 and code >= clear):
                raise ValueError("corrupt GIF LZW stream")
            # expand code to bytes (root codes are single literals)
            if code == next_code:  # KwKwK case
                if prev == -1:
                    raise ValueError("corrupt GIF LZW stream")
                cur = prev
                scratch.clear()
                while cur >= clear:
                    scratch.append(suffix[cur])
                    cur = prefix[cur]
                scratch.append(cur)
                first = scratch[-1]
                seq = bytes(scratch[::-1]) + bytes([first])
            else:
                cur = code
                scratch.clear()
                while cur >= clear:
                    scratch.append(suffix[cur])
                    cur = prefix[cur]
                scratch.append(cur)
                seq = bytes(scratch[::-1])
                first = seq[0]
            end = n_out + len(seq)
            if end > n_pixels:
                seq = seq[: n_pixels - n_out]
                end = n_pixels
            out[n_out:end] = np.frombuffer(seq, dtype=np.uint8)
            n_out = end
            if prev != -1 and next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = code
            if n_out >= n_pixels:
                return out
    return out[:n_out]


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> first frame as (h, w, 3) uint8 RGB on the logical
    screen. Raises ``ValueError`` on malformed input."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    if sw <= 0 or sh <= 0 or sw * sh > 1 << 26:
        raise ValueError("implausible GIF dimensions")
    gct, pos = _color_table(payload, 13, packed >> 7, packed & 0x07)
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    n = len(payload)
    while pos < n:
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, all skipped
            if pos >= n:
                raise ValueError("truncated GIF extension")
            pos += 1
            _, pos = _sub_blocks(payload, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB",
                                                 payload[pos:pos + 9])
        pos += 9
        lct, pos = _color_table(payload, pos, ipacked >> 7, ipacked & 0x07)
        table = lct if lct is not None else gct
        if table is None:
            raise ValueError("GIF image without color table")
        if pos >= n:
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = _lzw_decode(data, min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF LZW stream ended early")
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF palette index out of range")
        frame = table[idx].reshape(h, w, 3)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            de = np.zeros_like(frame)
            order = np.concatenate([
                np.arange(0, h, 8), np.arange(4, h, 8),
                np.arange(2, h, 4), np.arange(1, h, 2)])
            de[order] = frame
            frame = de
        y1, x1 = min(top + h, sh), min(left + w, sw)
        screen[top:y1, left:x1] = frame[: y1 - top, : x1 - left]
        return screen  # first frame only
    raise ValueError("GIF stream has no image data")


def encode_gif(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """(h, w) uint8 index/grey image -> single-frame GIF87a. Default
    palette is the 256-grey identity, so round-trip of a grey image is
    bit-exact (decode returns the palette-expanded RGB)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_gif expects a (h, w) uint8 index image")
    h, w = img.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3)")
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    # literal-coded LZW: clear before every 256 literals so the code
    # width stays at min_code+1 and the dictionary never matters
    bits = bytearray()
    acc = 0
    acc_bits = 0
    code_size = min_code + 1

    def emit(code):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    emit(clear)
    for i, px in enumerate(img.ravel()):
        if i and i % 200 == 0:
            emit(clear)
        emit(int(px))
    emit(eoi)
    if acc_bits:
        bits.append(acc & 0xFF)
    out += bytes([min_code])
    for i in range(0, len(bits), 255):
        blk = bits[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3B"
    return bytes(out)
