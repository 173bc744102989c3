"""Pure-numpy media codecs for container formats that need no external
codec library: WAV (RIFF PCM / IEEE-float audio), BMP (uncompressed
24-bit), PNM (P5 grayscale / P6 RGB), and Y4M (YUV4MPEG2 uncompressed
video — the frame-sample path). These make the multimodal
decode path REAL for codec-free formats; compressed formats (JPEG, PNG,
MP3, MP4) still route to the documented stub because this container
ships no image/audio codec libraries (see ``multimodal.decode_media``).

Every decoder validates its header and raises ``ValueError`` on
malformed input — at 100 TB scale a corrupt payload must fail the row,
not the task (callers catch per row and fall back to the stub plane).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# WAV (RIFF) — PCM 8/16/32-bit and IEEE float32
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (samples, sample_rate); samples float32 in [-1, 1]
    shaped (n_frames, n_channels)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + csize]
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if n_ch < 1:
        raise ValueError("zero channels")
    if audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}-bit")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) float in [-1, 1] -> 16-bit PCM RIFF bytes."""
    s = np.asarray(samples, dtype=np.float32)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    n_ch = s.shape[1]
    ba = n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate,
                                sample_rate * ba, ba, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit BITMAPINFOHEADER
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP -> (h, w, 3) uint8 RGB. 24-bit BI_RGB only (the only form a
    codec-free encoder produces); bottom-up and top-down row orders."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: {bpp} bpp compression {comp}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad dimensions")
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise ValueError("truncated pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("need (h, w, 3) uint8")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, flip
    data = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return hdr + dib + data


# ---------------------------------------------------------------------------
# PNM — P5 (grayscale) / P6 (RGB), maxval <= 255
# ---------------------------------------------------------------------------


def decode_pnm(payload: bytes) -> np.ndarray:
    """P5 -> (h, w) uint8; P6 -> (h, w, 3) uint8."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    # header tokens: magic, width, height, maxval; '#' comments allowed
    pos = 2
    vals = []
    while len(vals) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos:pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
    if len(vals) < 3:
        raise ValueError("truncated PNM header")
    w, h, maxval = vals
    if maxval > 255 or w <= 0 or h <= 0:
        raise ValueError("unsupported PNM")
    pos += 1  # single whitespace after maxval
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return px.reshape((h, w) if ch == 1 else (h, w, 3)).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary P6 bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — uncompressed video; the frame-sample path's real codec
# ---------------------------------------------------------------------------


def _y4m_chroma_bytes(w: int, h: int, cs: str) -> int:
    if cs.startswith("C420"):
        return 2 * ((w + 1) // 2) * ((h + 1) // 2)
    if cs.startswith("C422"):
        return 2 * ((w + 1) // 2) * h
    if cs.startswith("C444"):
        return 2 * w * h
    if cs.startswith("Cmono"):
        return 0
    raise ValueError(f"unsupported Y4M colorspace {cs}")


def decode_y4m(payload: bytes) -> tuple[np.ndarray, float]:
    """YUV4MPEG2 -> ((n_frames, h, w) uint8 luma planes, fps).

    The header is space-separated ASCII tags (``W`` width, ``H`` height,
    ``F`` num:den framerate, ``C`` colorspace, others ignored); each
    frame is a ``FRAME[ params]\\n`` line followed by the raw Y plane and
    the colorspace's chroma planes. Chroma is parsed (to advance
    correctly) but only luma is returned — every downstream feature
    kernel is luma-based."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = 0
    num, den = 25, 1
    cs = "C420jpeg"  # spec default when no C tag is present
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        t, val = tag[:1], tag[1:].decode("ascii", "replace")
        if t == b"W":
            w = int(val)
        elif t == b"H":
            h = int(val)
        elif t == b"F":
            num, den = (int(x) for x in val.split(":"))
        elif t == b"C":
            cs = "C" + val
    if w <= 0 or h <= 0 or den <= 0:
        raise ValueError("bad Y4M dimensions/framerate")
    ysize = w * h
    step = ysize + _y4m_chroma_bytes(w, h, cs)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        if pos + step > len(payload):
            raise ValueError("truncated frame data")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=ysize,
                          offset=pos).reshape(h, w)
        )
        pos += step
    if not frames:
        raise ValueError("zero frames")
    return np.stack(frames), num / den


def encode_y4m(frames: np.ndarray, fps_num: int = 25, fps_den: int = 1,
               mono: bool = True) -> bytes:
    """(n_frames, h, w) uint8 luma -> Y4M bytes (``Cmono``, or ``C420jpeg``
    with neutral 128-valued chroma when ``mono=False``)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3 or frames.shape[0] == 0:
        raise ValueError("need (n_frames, h, w) uint8")
    n, h, w = frames.shape
    cs = b"Cmono" if mono else b"C420jpeg"
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps_num, fps_den, cs)]
    chroma = b"" if mono else bytes([128]) * (2 * ((w + 1) // 2) * ((h + 1) // 2))
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].tobytes())
        out.append(chroma)
    return b"".join(out)


# ---------------------------------------------------------------------------
# plane utilities (shared by image and audio feature paths)
# ---------------------------------------------------------------------------


def resize_plane(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean resize of a 2-D float plane to (out_h, out_w) — two
    ``np.add.reduceat`` passes over bin edges, any input size (this is
    the 'resize' kernel of the multimodal spec, exact for integer
    downscales, area-weighted-ish otherwise; deterministic)."""
    plane = np.asarray(plane, dtype=np.float64)
    h, w = plane.shape
    if h == 0 or w == 0:
        return np.zeros((out_h, out_w), dtype=np.float32)
    re = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ce = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    sums = np.add.reduceat(np.add.reduceat(plane, re, axis=0), ce, axis=1)
    rc = np.diff(np.r_[re, h]).astype(np.float64)
    cc = np.diff(np.r_[ce, w]).astype(np.float64)
    counts = np.outer(rc, cc)
    counts[counts == 0] = 1.0
    return (sums / counts).astype(np.float32)


def audio_energy_plane(samples: np.ndarray, n_frames: int = 32,
                       n_lags: int = 8) -> np.ndarray:
    """Mono-mixed audio -> (n_frames, n_lags) deterministic energy/
    autocorrelation plane (a codec-free stand-in for a spectrogram: frame
    RMS plus short-lag autocorrelations capture envelope + coarse pitch
    without an FFT)."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim == 2:
        x = x.mean(axis=1)
    if len(x) == 0:
        return np.zeros((n_frames, n_lags), dtype=np.float32)
    flen = max(1, len(x) // n_frames)
    n = flen * n_frames
    pad = np.zeros(n, dtype=np.float32)
    pad[: min(len(x), n)] = x[:n]
    frames = pad.reshape(n_frames, flen)
    out = np.zeros((n_frames, n_lags), dtype=np.float32)
    out[:, 0] = np.sqrt((frames ** 2).mean(axis=1))
    for lag in range(1, n_lags):
        if flen > lag:
            out[:, lag] = (frames[:, lag:] * frames[:, :-lag]).mean(axis=1)
    return out
