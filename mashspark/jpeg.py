"""JPEG codec in pure numpy — baseline sequential AND progressive.

The sandbox ships no codec libraries (no Pillow / libjpeg / ffmpeg), so
``multimodal.decode_media`` previously routed JPEG payloads to a
documented deterministic stub.  This module implements the DCT
processes of ITU-T T.81 (JFIF) from the public spec:

* **decode**: marker parse (SOI/APP/DQT/SOF0/2/DHT/DRI/SOS/EOI),
  canonical Huffman decode of the entropy-coded segment
  (byte-destuffing, restart markers), dequantize, zigzag, 8x8 IDCT as
  two orthonormal matrix multiplies, chroma upsample for any (Hi, Vi)
  sampling grid (4:4:4, 4:2:0, 4:2:2, ...), and JFIF full-range
  YCbCr -> RGB.  Progressive (SOF2) streams decode through all four
  scan kinds — DC first / DC refinement / AC spectral-selection first /
  AC successive-approximation refinement with EOB-run coding (T.81
  G.2) — validated against real libjpeg-encoded progressive files
  (custom tables, EOBn>1 runs) shipped with system packages.
* **encode**: the matching baseline encoder (Annex K quant tables scaled
  by the libjpeg quality formula, Annex K Huffman tables, optional 2x2
  chroma subsampling) plus a progressive encoder emitting the full
  four-kind scan script, so tests can pin that a progressive decode is
  bit-identical to the baseline decode of the same quantized
  coefficients — with zero external data.

Scope (documented, deliberate): no arithmetic coding, no lossless/
hierarchical processes, no 12-bit precision, no CMYK.  Those route to
``ValueError`` and the caller's corrupt-row fallback.

Performance: the per-symbol Huffman loop is Python, but each step is a
single O(1) lookup in a 16-bit peek table; the DCT/IDCT, dequantize,
zigzag, level shift, and color transform are vectorized numpy over all
blocks of a component at once.  At 100 TB the decode is embarrassingly
parallel per payload inside Arrow batches (``multimodal.mapInPandas``);
a production deployment swaps in libjpeg-turbo behind the same
``decode_jpeg`` signature.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Public constants from ITU-T T.81 Annex K (example tables; the de-facto
# interchange defaults emitted by libjpeg and expected by every decoder).

# K.1 — luminance quantization, natural (row-major) order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# K.2 — chrominance quantization
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan: ZIGZAG[i] = natural-order index of the i-th zigzag coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)  # natural index -> zigzag position

# Annex K Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: forward Y = A X A^T,
    inverse X = A^T Y A.  Orthonormality is pytest-pinned."""
    k = np.arange(8)
    a = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    a *= np.sqrt(2.0 / 8.0)
    a[0, :] = np.sqrt(1.0 / 8.0)
    return a


_A = _dct_matrix()


def quality_to_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables: q<50 -> 5000/q,
    else 200-2q percent; clamp to [1, 255] (baseline is 8-bit Qk)."""
    quality = int(min(100, max(1, quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma.astype(np.int32), chroma.astype(np.int32)


# ---------------------------------------------------------------------------
# Huffman tables


class _HuffTable:
    """Canonical Huffman table with a 16-bit peek LUT for O(1) decode.

    ``lut_sym[peek16]`` / ``lut_len[peek16]`` give the decoded symbol and
    its code length for any 16-bit lookahead (baseline codes are <= 16
    bits, so one peek always contains a full code)."""

    __slots__ = ("lut_sym", "lut_len", "codes")

    def __init__(self, bits: list[int], vals: list[int]):
        if len(bits) != 16 or sum(bits) != len(vals):
            raise ValueError("malformed Huffman table")
        # canonical code assignment (T.81 C.2)
        self.codes: dict[int, tuple[int, int]] = {}  # symbol -> (code, len)
        lut_sym = np.full(1 << 16, -1, dtype=np.int16)
        lut_len = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = vals[k]
                self.codes[sym] = (code, length)
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                lut_sym[lo:hi] = sym
                lut_len[lo:hi] = length
                code += 1
                k += 1
            code <<= 1
        self.lut_sym = lut_sym
        self.lut_len = lut_len


# ---------------------------------------------------------------------------
# Bit I/O


class _BitReader:
    """MSB-first bit reader over destuffed entropy bytes.

    Reads past the end are zero-padded (T.81 F.2.2.5 allows a decoder to
    treat missing bits as 1-fill/0-fill for the final byte), but the
    number of *consumed* virtual bits is tracked: legitimate streams
    consume at most 7 (the encoder's final-byte pad); anything more
    means the entropy data was truncated (``overrun()``)."""

    __slots__ = ("data", "pos", "acc", "nbits", "virtual", "used_virtual")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0       # next byte index
        self.acc = 0       # bit accumulator (left-aligned semantics below)
        self.nbits = 0     # bits currently in acc
        self.virtual = 0   # zero-pad bits currently in acc (at the bottom)
        self.used_virtual = 0  # pad bits actually consumed by skip/read

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # pad with zeros past the end (T.81 F.2.2.5)
                self.virtual += 8
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        # virtual pad bits sit at the bottom of acc; they are consumed
        # only once nbits drops below the pad count
        if self.nbits < self.virtual:
            self.used_virtual += self.virtual - self.nbits
            self.virtual = self.nbits
        self.acc &= (1 << self.nbits) - 1

    def overrun(self) -> bool:
        return self.used_virtual > 7

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuff
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (T.81 F.1.2.3)


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a SIZE-bit magnitude to signed."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(v: int) -> int:
    """Number of magnitude bits for signed coefficient v (T.81 F.1.2.1)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Decoder


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "bw", "bh",
                 "nbx", "nby")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.blocks = None  # (n_blocks_y * n_blocks_x, 64) zigzag coeffs
        self.bw = self.bh = 0
        # non-interleaved scan geometry (T.81 A.2.2: ceil of the
        # component's true sample dims, NOT the padded MCU grid)
        self.nbx = self.nby = 0


def _alloc_blocks(comps: list[_Component], width: int, height: int) -> None:
    """Allocate every frame component's coefficient array on the padded
    MCU grid and record the non-interleaved block dims (progressive AC
    scans iterate those, writing into the padded layout)."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.blocks = np.zeros((c.bh * c.bw, 64), dtype=np.int32)
        cw = (width * c.h + hmax - 1) // hmax
        ch = (height * c.v + vmax - 1) // vmax
        c.nbx = (cw + 7) // 8
        c.nby = (ch + 7) // 8


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential OR progressive JFIF bytes -> (h, w, 3) uint8
    RGB (or (h, w) for single-component grayscale scans).  Raises
    ``ValueError`` on unsupported (arithmetic/lossless/hierarchical/
    12-bit) or malformed/truncated streams — callers treat that as a
    corrupt row, never a crash."""
    if len(payload) < 4 or payload[0:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    progressive = False
    n_scans = 0
    n = len(payload)

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            if n_scans:
                break  # progressive: end of the scan sequence
            raise ValueError("EOI before scan")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > n:
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                else:  # 16-bit Qk (rare; legal in extended, accept it)
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                qtables[tq] = tbl.astype(np.int32)  # zigzag order
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17:i + 17 + nvals])
                htables[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            progressive = marker == 0xC2
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                # T.81 B.2.2: 1 <= Hi, Vi <= 4. A zero factor would
                # divide-by-zero in the MCU math, escaping the caller's
                # corrupt-row ValueError fallback and failing the task.
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError(
                        f"invalid SOF sampling factors ({h},{v})")
                comps.append(_Component(cid, h, v, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported SOF (lossless/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tdta >> 4, tdta & 0x0F)
            scan_comps = []
            for comp in comps:
                if comp.cid in sel:
                    comp.td, comp.ta = sel[comp.cid]
                    scan_comps.append(comp)
            if len(scan_comps) != len(sel):
                raise ValueError("SOS references unknown component")
            data_end = _find_scan_end(payload, pos)
            if progressive:
                if len(seg) < 4 + 2 * ns:
                    raise ValueError("truncated progressive SOS header")
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if not comps:
                    raise ValueError("SOS before SOF")
                if comps[0].blocks is None:
                    _alloc_blocks(comps, width, height)
                _decode_scan_prog(payload[pos:data_end], scan_comps,
                                  htables, restart_interval,
                                  ss, se, ahal >> 4, ahal & 0x0F)
                n_scans += 1
                pos = data_end
                continue  # more scans until EOI
            _decode_scan(payload[pos:data_end], scan_comps, htables,
                         width, height, restart_interval)
            pos = data_end
            # baseline: single scan; stop at EOI or end
            break
        # else: APPn/COM/etc — skipped
    if not comps or any(c.blocks is None for c in comps):
        raise ValueError("no decodable scan")
    return _reconstruct(comps, qtables, width, height)


def _find_scan_end(payload: bytes, pos: int) -> int:
    """Index of the first non-RST marker after the entropy data."""
    n = len(payload)
    i = pos
    while i < n - 1:
        if payload[i] == 0xFF:
            m = payload[i + 1]
            if m == 0x00 or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return n


def _split_intervals(data: bytes) -> list[bytes]:
    """Split entropy data at RST markers and destuff each interval."""
    intervals: list[bytes] = []
    start = 0
    i = 0
    nb = len(data)
    while i < nb - 1:
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            intervals.append(data[start:i])
            start = i + 2
            i += 2
        else:
            i += 1
    intervals.append(data[start:])
    return [seg.replace(b"\xFF\x00", b"\xFF") for seg in intervals]


def _decode_scan(data: bytes, comps: list[_Component],
                 htables: dict, width: int, height: int,
                 restart_interval: int) -> None:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.blocks = np.zeros((c.bh * c.bw, 64), dtype=np.int32)

    intervals = _split_intervals(data)

    n_mcu = mcux * mcuy
    per_int = restart_interval if restart_interval else n_mcu
    mcu = 0
    for seg in intervals:
        br = _BitReader(seg)
        pred = {id(c): 0 for c in comps}
        seg_last = min(n_mcu, mcu + per_int)
        while mcu < seg_last:
            my, mx = divmod(mcu, mcux)
            for c in comps:
                dc_tbl = htables[(0, c.td)]
                ac_tbl = htables[(1, c.ta)]
                for by in range(c.v):
                    for bx in range(c.h):
                        blk_idx = (my * c.v + by) * c.bw + (mx * c.h + bx)
                        pred[id(c)] = _decode_block(
                            br, dc_tbl, ac_tbl, pred[id(c)],
                            c.blocks[blk_idx])
            if br.overrun():
                raise ValueError("truncated entropy data")
            mcu += 1
        if mcu >= n_mcu:
            break
    if mcu < n_mcu:
        raise ValueError("truncated entropy data")


def _decode_block(br: _BitReader, dc: _HuffTable, ac: _HuffTable,
                  pred: int, out: np.ndarray) -> int:
    """Decode one 8x8 block into ``out`` (zigzag order); returns new DC
    predictor."""
    peek = br.peek16()
    size = int(dc.lut_sym[peek])
    if size < 0:
        raise ValueError("bad DC code")
    br.skip(int(dc.lut_len[peek]))
    diff = _extend(br.read(size), size)
    pred += diff
    out[0] = pred
    k = 1
    while k < 64:
        peek = br.peek16()
        rs = int(ac.lut_sym[peek])
        if rs < 0:
            raise ValueError("bad AC code")
        br.skip(int(ac.lut_len[peek]))
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        out[k] = _extend(br.read(s), s)
        k += 1
    return pred


# ---------------------------------------------------------------------------
# Progressive scans (T.81 G.2, mirroring the libjpeg-documented control
# flow): DC first / DC refine are interleaved over the scan's components;
# AC first / AC refine are single-component with EOB-run coding.


def _decode_scan_prog(data: bytes, comps: list[_Component], htables: dict,
                      restart_interval: int, ss: int, se: int,
                      ah: int, al: int) -> None:
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not dc_scan and (len(comps) != 1 or not ss <= se <= 63):
        raise ValueError("bad progressive AC scan header")
    if dc_scan and len(comps) > 1:
        mcux = comps[0].bw // comps[0].h  # frame MCU grid (alloc'd)
        mcuy = comps[0].bh // comps[0].v
        n_units = mcux * mcuy
    else:
        c = comps[0]
        n_units = c.nbx * c.nby
        mcux = mcuy = 0
    per_int = restart_interval if restart_interval else n_units
    unit = 0
    for seg in _split_intervals(data):
        br = _BitReader(seg)
        pred = {id(c): 0 for c in comps}
        eobrun = 0
        seg_last = min(n_units, unit + per_int)
        while unit < seg_last:
            if dc_scan and len(comps) > 1:
                my, mx = divmod(unit, mcux)
                for c in comps:
                    tbl = (htables[(0, c.td)]  # missing DC DHT -> KeyError -> stub route
                           if ah == 0 else None)
                    for by in range(c.v):
                        for bx in range(c.h):
                            blk = c.blocks[(my * c.v + by) * c.bw
                                           + (mx * c.h + bx)]
                            pred[id(c)] = _dc_prog(
                                br, tbl, blk, pred[id(c)], ah, al)
            else:
                c = comps[0]
                by, bx = divmod(unit, c.nbx)
                blk = c.blocks[by * c.bw + bx]
                if dc_scan:
                    tbl = (htables[(0, c.td)]  # missing DC DHT -> KeyError -> stub route
                           if ah == 0 else None)
                    pred[id(c)] = _dc_prog(br, tbl, blk, pred[id(c)],
                                           ah, al)
                elif ah == 0:
                    eobrun = _ac_first(br, htables[(1, c.ta)], blk,
                                       ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, htables[(1, c.ta)], blk,
                                        ss, se, al, eobrun)
            if br.overrun():
                raise ValueError("truncated entropy data")
            unit += 1
        if unit >= n_units:
            break
    if unit < n_units:
        raise ValueError("truncated entropy data")


def _dc_prog(br: _BitReader, dc_tbl, blk: np.ndarray, pred: int,
             ah: int, al: int) -> int:
    if ah == 0:  # DC first: baseline DC decode, shifted by Al
        peek = br.peek16()
        size = int(dc_tbl.lut_sym[peek])
        if size < 0:
            raise ValueError("bad DC code")
        br.skip(int(dc_tbl.lut_len[peek]))
        pred += _extend(br.read(size), size)
        blk[0] = pred << al
        return pred
    if br.read(1):  # DC refine: one correction bit
        blk[0] = int(blk[0]) | (1 << al)
    return pred


def _ac_first(br: _BitReader, ac: _HuffTable, blk: np.ndarray,
              ss: int, se: int, al: int, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        peek = br.peek16()
        rs = int(ac.lut_sym[peek])
        if rs < 0:
            raise ValueError("bad AC code")
        br.skip(int(ac.lut_len[peek]))
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: this block + eobrun more
            if r:
                eobrun += br.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        blk[k] = _extend(br.read(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br: _BitReader, ac: _HuffTable, blk: np.ndarray,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    nonzero coefficients arrive as ±1<<Al after a run of zero-HISTORY
    positions; every nonzero-history position passed contributes one
    correction bit; EOB runs still carry correction bits for the rest
    of the band."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            peek = br.peek16()
            rs = int(ac.lut_sym[peek])
            if rs < 0:
                raise ValueError("bad AC code")
            br.skip(int(ac.lut_len[peek]))
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                newval = 0  # ZRL: run of 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad refine magnitude size")
                newval = p1 if br.read(1) else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.read(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0:
                if br.read(1) and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(comps: list[_Component], qtables: dict,
                 width: int, height: int) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        q = qtables.get(c.tq)
        if q is None:
            raise ValueError(f"missing quant table {c.tq}")
        coeffs = c.blocks.astype(np.float64) * q[None, :]  # zigzag
        nat = np.zeros_like(coeffs)
        nat[:, ZIGZAG] = coeffs  # zigzag position i -> natural ZIGZAG[i]
        blocks = nat.reshape(-1, 8, 8)
        # IDCT all blocks at once: X = A^T Y A
        pix = np.einsum("ij,njk,kl->nil", _A.T, blocks, _A)
        pix = pix.reshape(c.bh, c.bw, 8, 8).transpose(0, 2, 1, 3)
        plane = pix.reshape(c.bh * 8, c.bw * 8) + 128.0
        # upsample to full-res grid by pixel replication
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError("only 1- or 3-component scans supported")
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    # JFIF full-range BT.601
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder

_STD_ENCODE_TABLES: tuple[_HuffTable, ...] | None = None


def _std_encode_tables() -> tuple[_HuffTable, ...]:
    """The four fixed Annex K tables the encoder uses, built once per
    process: _HuffTable.__init__ also fills the 65536-entry decode LUTs
    (~768 KB of slice writes) the encoder never reads, so rebuilding
    them per image made mapInPandas encode loops pay a constant-table
    cost per row."""
    global _STD_ENCODE_TABLES
    if _STD_ENCODE_TABLES is None:
        _STD_ENCODE_TABLES = (
            _HuffTable(DC_LUMA_BITS, DC_LUMA_VALS),
            _HuffTable(AC_LUMA_BITS, AC_LUMA_VALS),
            _HuffTable(DC_CHROMA_BITS, DC_CHROMA_VALS),
            _HuffTable(AC_CHROMA_BITS, AC_CHROMA_VALS),
        )
    return _STD_ENCODE_TABLES


def _quantize_image(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front end: color transform + DCT + quantize.
    Returns (comp_blocks [(quant_zigzag, bw)], samps, gray, qy, qc,
    h, w, mcux, mcuy)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = quality_to_tables(quality)

    if gray:
        y = img.astype(np.float64)
        planes = [y]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cb = _box2(cb)
            cr = _box2(cr)
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag blocks per component
    comp_blocks = []
    for plane, (sh, sv), q in zip(
            planes, samps, [qy] + [qc] * (len(planes) - 1)):
        bw, bh = mcux * sh, mcuy * sv
        padded = _pad_to(plane, bh * 8, bw * 8) - 128.0
        blocks = (padded.reshape(bh, 8, bw, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coeffs = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
        zz = coeffs.reshape(-1, 64)[:, ZIGZAG]
        # q is natural order; reorder to zigzag to match
        qzz = q[ZIGZAG].astype(np.float64)
        quant = np.round(zz / qzz[None, :]).astype(np.int32)
        comp_blocks.append((quant, bw))
    return comp_blocks, samps, gray, qy, qc, h, w, mcux, mcuy


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> baseline JFIF bytes.

    ``subsample=True`` uses 4:2:0 chroma (exercises the decoder's
    multi-block MCU + upsample path); default 4:4:4 keeps chroma
    lossless-er for fixture round-trips.  ``restart_interval`` > 0 emits
    a DRI segment and RSTn markers every that-many MCUs (exercises the
    decoder's predictor-reset + byte-align path)."""
    comp_blocks, samps, gray, qy, qc, h, w, mcux, mcuy = _quantize_image(
        img, quality, subsample)
    dc_y, ac_y, dc_c, ac_c = _std_encode_tables()

    bw_ = _BitWriter()
    entropy = bytearray()
    preds = [0] * len(comp_blocks)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw_.flush()
            entropy += bw_.out
            entropy += bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
            bw_ = _BitWriter()
            preds = [0] * len(comp_blocks)
        my, mx = divmod(mcu, mcux)
        for ci, ((quant, cbw), (sh, sv)) in enumerate(
                zip(comp_blocks, samps)):
            dct_t = dc_y if ci == 0 else dc_c
            act_t = ac_y if ci == 0 else ac_c
            for by in range(sv):
                for bx in range(sh):
                    blk = quant[(my * sv + by) * cbw + (mx * sh + bx)]
                    preds[ci] = _encode_block(bw_, dct_t, act_t,
                                              preds[ci], blk)
    bw_.flush()
    entropy += bw_.out

    out = bytearray()
    out += b"\xFF\xD8"                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    out += _dqt_segment(0, qy) + (b"" if gray else _dqt_segment(1, qc))
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    nc = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        sh, sv = samps[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    out += b"\xFF\xD9"                       # EOI
    return bytes(out)


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample with edge replication to even dims."""
    h, w = plane.shape
    p = _pad_to(plane, h + (h & 1), w + (w & 1))
    return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2]
                   + p[1::2, 0::2] + p[1::2, 1::2])


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    if h == ph and w == pw:
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _encode_block(bw: _BitWriter, dct: _HuffTable, act: _HuffTable,
                  pred: int, blk: np.ndarray) -> int:
    dc = int(blk[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dct.codes[size]
    bw.write(code, length)
    if size:
        v = diff if diff >= 0 else diff + (1 << size) - 1
        bw.write(v, size)
    # AC: run-length of zeros + magnitude
    nz = np.nonzero(blk[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act.codes[0xF0]
            bw.write(code, length)
            run -= 16
        size = _category(v)
        code, length = act.codes[(run << 4) | size]
        bw.write(code, length)
        mv = v if v >= 0 else v + (1 << size) - 1
        bw.write(mv, size)
        run = 0
    if last < 63:
        code, length = act.codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _dqt_segment(tq: int, q_natural: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in q_natural[ZIGZAG])
    return b"\xFF\xDB" + struct.pack(">H", len(body) + 2) + body


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2). Uses the Annex K baseline Huffman tables,
# which contain every (run, size>=1) symbol plus EOB(0x00)/ZRL(0xF0) but
# NOT the EOBn (n>1) run symbols — so EOB runs are flushed at length 1
# (spec-valid; EOBn>1 decoding is unit-tested with a custom table).


class _ProgAcWriter:
    """Per-scan AC entropy state: EOB-run + buffered refinement bits."""

    __slots__ = ("bw", "tab", "eobrun", "be")

    def __init__(self, bw: _BitWriter, tab: _HuffTable):
        self.bw, self.tab = bw, tab
        self.eobrun = 0
        self.be: list[int] = []  # correction bits owed to the EOB run

    def _emit_bits(self, bits: list[int]) -> None:
        for b in bits:
            self.bw.write(b, 1)

    def flush_eob(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.tab.codes[r << 4]
            self.bw.write(code, ln)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        if self.be:
            self._emit_bits(self.be)
            self.be = []

    def block_first(self, blk: np.ndarray, ss: int, se: int,
                    al: int) -> None:
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = (abs(v)) >> al
            if t == 0:
                r += 1
                continue
            self.flush_eob()
            while r > 15:
                code, ln = self.tab.codes[0xF0]
                self.bw.write(code, ln)
                r -= 16
            s = t.bit_length()
            code, ln = self.tab.codes[(r << 4) | s]
            self.bw.write(code, ln)
            mv = t if v >= 0 else -t
            if mv < 0:
                mv += (1 << s) - 1
            self.bw.write(mv, s)
            r = 0
        if r:
            self.eobrun += 1
            self.flush_eob()  # Annex K tables: run length capped at 1

    def block_refine(self, blk: np.ndarray, ss: int, se: int,
                     al: int) -> None:
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:
                eobpos = i
        r = 0
        br: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                self.flush_eob()
                code, ln = self.tab.codes[0xF0]
                self.bw.write(code, ln)
                r -= 16
                self._emit_bits(br)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            self.flush_eob()
            code, ln = self.tab.codes[(r << 4) | 1]
            self.bw.write(code, ln)
            self.bw.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
            self._emit_bits(br)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.be.extend(br)
            self.flush_eob()  # capped at 1 (Annex K tables)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsample: bool = False,
                            successive: bool = True) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> progressive (SOF2) JFIF bytes.

    Scan script with ``successive=True`` (default): DC first at Al=1,
    per-component AC first at Al=1, DC refinement, per-component AC
    refinement — all four progressive scan kinds, so a decode of this
    stream is bit-identical to a baseline decode at the same quality
    (progressive coding reorganizes the same quantized coefficients).
    ``successive=False`` emits spectral-selection-only scans (Al=0)."""
    comp_blocks, samps, gray, qy, qc, h, w, mcux, mcuy = _quantize_image(
        img, quality, subsample)
    nc = len(comp_blocks)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    dc_y, ac_y, dc_c, ac_c = _std_encode_tables()

    # non-interleaved (true) block dims per component
    geo = []
    for (quant, cbw), (sh, sv) in zip(comp_blocks, samps):
        cw = (w * sh + hmax - 1) // hmax
        ch = (h * sv + vmax - 1) // vmax
        geo.append(((cw + 7) // 8, (ch + 7) // 8, cbw))

    if successive:
        script = [(list(range(nc)), 0, 0, 0, 1)]
        script += [([ci], 1, 63, 0, 1) for ci in range(nc)]
        script += [(list(range(nc)), 0, 0, 1, 0)]
        script += [([ci], 1, 63, 1, 0) for ci in range(nc)]
    else:
        script = [(list(range(nc)), 0, 0, 0, 0)]
        script += [([ci], 1, 63, 0, 0) for ci in range(nc)]

    body = bytearray()
    for cis, ss, se, ah, al in script:
        bw_ = _BitWriter()
        if ss == 0:  # DC scan, interleaved over cis
            if ah == 0:
                preds = [0] * nc
                for mcu in range(mcux * mcuy):
                    my, mx = divmod(mcu, mcux)
                    for ci in cis:
                        quant, cbw = comp_blocks[ci]
                        sh, sv = samps[ci]
                        tab = dc_y if ci == 0 else dc_c
                        for by in range(sv):
                            for bx in range(sh):
                                blk = quant[(my * sv + by) * cbw
                                            + (mx * sh + bx)]
                                v = int(blk[0]) >> al
                                diff = v - preds[ci]
                                preds[ci] = v
                                s = _category(diff)
                                code, ln = tab.codes[s]
                                bw_.write(code, ln)
                                if s:
                                    mv = diff if diff >= 0 \
                                        else diff + (1 << s) - 1
                                    bw_.write(mv, s)
            else:  # DC refinement: one raw bit per block, MCU order
                for mcu in range(mcux * mcuy):
                    my, mx = divmod(mcu, mcux)
                    for ci in cis:
                        quant, cbw = comp_blocks[ci]
                        sh, sv = samps[ci]
                        for by in range(sv):
                            for bx in range(sh):
                                blk = quant[(my * sv + by) * cbw
                                            + (mx * sh + bx)]
                                bw_.write((int(blk[0]) >> al) & 1, 1)
        else:  # AC scan, single component, true block dims
            ci = cis[0]
            quant, cbw = comp_blocks[ci]
            nbx, nby, _ = geo[ci]
            ac = _ProgAcWriter(bw_, ac_y if ci == 0 else ac_c)
            for by in range(nby):
                for bx in range(nbx):
                    blk = quant[by * cbw + bx]
                    if ah == 0:
                        ac.block_first(blk, ss, se, al)
                    else:
                        ac.block_refine(blk, ss, se, al)
            ac.flush_eob()
        bw_.flush()
        sos = bytearray([len(cis)])
        for ci in cis:
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        body += b"\xFF\xDA" + struct.pack(">H", len(sos) + 2) + sos
        body += bw_.out

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += _dqt_segment(0, qy) + (b"" if gray else _dqt_segment(1, qc))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        sh, sv = samps[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xFF\xC2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += body
    out += b"\xFF\xD9"
    return bytes(out)
