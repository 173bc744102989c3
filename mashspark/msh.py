"""``.msh`` sketch-file interop: a pure-python Cap'n Proto codec for the
ONE fixed schema Mash ships (``capnp/MinHash.capnp:14-59``), so sketch
files produced by a real Mash install can be loaded straight into the
Spark operators (paste / dist / screen) and sketch tables can be
exported back for Mash to read.

Reference behavior being reproduced:

* file layout — a standard Cap'n Proto *stream-framed* message
  (segment-count table + segments), mmap'd and read with
  ``FlatArrayMessageReader`` (``Sketch.cpp:255-324`` header read,
  ``Sketch.cpp:907-1067`` ``loadCapnp``);
* writer conventions (``Sketch.cpp:384-490``): references live under
  ``referenceListOld`` when hashSeed == 42 (a Mash 1.x back-compat
  quirk) else ``referenceList``; readers prefer whichever list is
  non-empty; ``length64`` carries the sequence length; hashes are the
  SORTED bottom-k, 64-bit when ``use64``;
* the ``hashSeed`` field has schema default 42, so (per Cap'n Proto
  encoding rules) it is stored XOR 42.

Only the schema subset the repo needs is implemented (Text, UInt32/64,
Bool, Float32, List(UInt32/64), nested structs, inline-composite
lists, far pointers on read). This is an I/O shim, not a general capnp
library — ~250 lines instead of a dependency the sandbox doesn't have.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_WORD = 8


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class _Msg:
    """Segment table + pointer chasing for a stream-framed message."""

    def __init__(self, data: bytes):
        n_seg = struct.unpack_from("<I", data, 0)[0] + 1
        sizes = struct.unpack_from(f"<{n_seg}I", data, 4)
        hdr = 4 * (n_seg + 1)
        hdr += (-hdr) % _WORD
        self.segs = []
        off = hdr
        for w in sizes:
            self.segs.append(data[off:off + w * _WORD])
            off += w * _WORD

    def word(self, seg: int, woff: int) -> int:
        return struct.unpack_from("<Q", self.segs[seg], woff * _WORD)[0]

    def follow(self, seg: int, woff: int) -> tuple:
        """Resolve the pointer word at (seg, woff) -> a typed tuple:
        ('struct', seg, data_off, data_words, ptr_words) |
        ('list', seg, content_off, elem_code, count) | None."""
        ptr = self.word(seg, woff)
        if ptr == 0:
            return None
        kind = ptr & 3
        if kind == 2:  # far pointer
            double = (ptr >> 2) & 1
            pad_off = ptr >> 3 & 0x1FFFFFFF
            target_seg = ptr >> 32
            if not double:
                return self.follow(target_seg, pad_off)
            # double-far: pad word 0 is a far pointer to the content,
            # pad word 1 is the tag describing it
            far2 = self.word(target_seg, pad_off)
            content_seg = far2 >> 32
            content_off = far2 >> 3 & 0x1FFFFFFF
            tag = self.word(target_seg, pad_off + 1)
            return self._decode(content_seg, content_off, tag,
                                offset_is_absolute=True)
        return self._decode(seg, woff + 1, ptr)

    def _decode(self, seg: int, base: int, ptr: int,
                offset_is_absolute: bool = False):
        kind = ptr & 3
        # sign-extend the 30-bit word offset
        off = (ptr >> 2) & 0x3FFFFFFF
        if off >= 1 << 29:
            off -= 1 << 30
        target = base if offset_is_absolute else base + off
        if kind == 0:
            data_words = (ptr >> 32) & 0xFFFF
            ptr_words = (ptr >> 48) & 0xFFFF
            return ("struct", seg, target, data_words, ptr_words)
        if kind == 1:
            code = (ptr >> 32) & 7
            count = ptr >> 35
            return ("list", seg, target, code, count)
        raise ValueError(f"unsupported pointer kind {kind}")


@dataclass
class _Struct:
    msg: _Msg
    seg: int
    off: int          # word offset of the data section
    data_words: int
    ptr_words: int

    def _data(self) -> bytes:
        s = self.msg.segs[self.seg]
        return s[self.off * _WORD:(self.off + self.data_words) * _WORD]

    def u32(self, byte_off: int, default: int = 0) -> int:
        d = self._data()
        if byte_off + 4 > len(d):
            return default
        return struct.unpack_from("<I", d, byte_off)[0] ^ default

    def u64(self, byte_off: int, default: int = 0) -> int:
        d = self._data()
        if byte_off + 8 > len(d):
            return default
        return struct.unpack_from("<Q", d, byte_off)[0] ^ default

    def f32(self, byte_off: int) -> float:
        d = self._data()
        if byte_off + 4 > len(d):
            return 0.0
        return struct.unpack_from("<f", d, byte_off)[0]

    def bit(self, bit_off: int) -> bool:
        d = self._data()
        if bit_off // 8 >= len(d):
            return False
        return bool(d[bit_off // 8] >> (bit_off % 8) & 1)

    def ptr(self, i: int):
        if i >= self.ptr_words:
            return None
        return self.msg.follow(self.seg, self.off + self.data_words + i)


def _as_struct(msg: _Msg, res) -> _Struct | None:
    if res is None:
        return None
    kind, seg, off, a, b = res
    if kind != "struct":
        raise ValueError(f"expected struct, got {kind}")
    return _Struct(msg, seg, off, a, b)


def _text(msg: _Msg, res) -> str:
    if res is None:
        return ""
    kind, seg, off, code, count = res
    if kind != "list" or code != 2:
        raise ValueError("expected Text (byte list)")
    raw = msg.segs[seg][off * _WORD:off * _WORD + count]
    return raw.rstrip(b"\x00").decode("utf-8", "replace")


def _numlist(msg: _Msg, res, code_expect: int, dtype) -> np.ndarray:
    if res is None:
        return np.empty(0, dtype=dtype)
    kind, seg, off, code, count = res
    if kind != "list" or code != code_expect:
        raise ValueError(f"expected numeric list code {code_expect}, got "
                         f"{kind}/{code}")
    width = np.dtype(dtype).itemsize
    raw = msg.segs[seg][off * _WORD:off * _WORD + count * width]
    return np.frombuffer(raw, dtype=dtype)


def _struct_list(msg: _Msg, res) -> list[_Struct]:
    if res is None:
        return []
    kind, seg, off, code, count = res
    if kind != "list" or code != 7:
        raise ValueError("expected inline-composite list")
    tag = msg.word(seg, off)
    n = (tag >> 2) & 0x3FFFFFFF
    data_words = (tag >> 32) & 0xFFFF
    ptr_words = (tag >> 48) & 0xFFFF
    stride = data_words + ptr_words
    return [
        _Struct(msg, seg, off + 1 + i * stride, data_words, ptr_words)
        for i in range(n)
    ]


@dataclass
class MshReference:
    name: str
    comment: str
    length: int
    hashes: np.ndarray        # uint64 (or widened uint32), sorted
    counts: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint32))
    use64: bool = True


@dataclass
class MshSketchSet:
    kmer_size: int
    min_hashes_per_window: int
    hash_seed: int
    window_size: int
    concatenated: bool
    noncanonical: bool
    preserve_case: bool
    error: float
    alphabet: str
    references: list


def read_msh(path: str) -> MshSketchSet:
    """Decode one ``.msh`` file (the reference's ``loadCapnp`` walk)."""
    with open(path, "rb") as f:
        msg = _Msg(f.read())
    root = _as_struct(msg, msg.follow(0, 0))
    # MinHash data layout (capnp ordinal packing): kmerSize b0, windowSize
    # b4, minHashesPerWindow b8, concatenated bit96, error b16,
    # noncanonical bit97, preserveCase bit98, hashSeed b20 (default 42);
    # pointers: referenceListOld, locusList, alphabet, referenceList
    alphabet = _text(msg, root.ptr(2))
    new_list = _as_struct(msg, root.ptr(3))
    old_list = _as_struct(msg, root.ptr(0))
    refs_res = None
    # reference behavior (Sketch.cpp:300): prefer referenceList when it
    # has entries, else referenceListOld
    for lst in (new_list, old_list):
        if lst is not None:
            entries = _struct_list(msg, lst.ptr(0))
            if entries:
                refs_res = entries
                break
            refs_res = refs_res or entries
    refs = []
    for r in refs_res or []:
        h64 = _numlist(msg, r.ptr(5), 5, np.uint64)
        use64 = True
        if len(h64) == 0:
            h32 = _numlist(msg, r.ptr(4), 4, np.uint32)
            if len(h32):
                h64 = h32.astype(np.uint64)
                use64 = False
        length = r.u64(8) or r.u32(0)
        refs.append(MshReference(
            name=_text(msg, r.ptr(2)),
            comment=_text(msg, r.ptr(3)),
            length=int(length),
            hashes=h64,
            counts=_numlist(msg, r.ptr(6), 4, np.uint32),
            use64=use64,
        ))
    return MshSketchSet(
        kmer_size=root.u32(0),
        window_size=root.u32(4),
        min_hashes_per_window=root.u32(8),
        concatenated=root.bit(96),
        error=root.f32(16),
        noncanonical=root.bit(97),
        preserve_case=root.bit(98),
        hash_seed=root.u32(20, default=42),
        alphabet=alphabet or "ACGT",
        references=refs,
    )


# ---------------------------------------------------------------------------
# writer (single segment; the reader side also handles far pointers for
# files a real multi-segment MallocMessageBuilder produced)
# ---------------------------------------------------------------------------


class _Seg:
    def __init__(self):
        self.buf = bytearray()

    def alloc(self, words: int) -> int:
        off = len(self.buf) // _WORD
        self.buf += b"\x00" * (words * _WORD)
        return off

    def put_u64(self, woff: int, val: int) -> None:
        struct.pack_into("<Q", self.buf, woff * _WORD, val & (1 << 64) - 1)

    @staticmethod
    def struct_ptr(from_woff: int, to_woff: int, dw: int, pw: int) -> int:
        off = to_woff - from_woff - 1
        return (off & 0x3FFFFFFF) << 2 | dw << 32 | pw << 48

    @staticmethod
    def list_ptr(from_woff: int, to_woff: int, code: int, count: int) -> int:
        off = to_woff - from_woff - 1
        return 1 | (off & 0x3FFFFFFF) << 2 | code << 32 | count << 35


def _put_text(seg: _Seg, from_woff: int, s: str) -> int:
    raw = s.encode("utf-8") + b"\x00"
    words = (len(raw) + _WORD - 1) // _WORD
    off = seg.alloc(words)
    seg.buf[off * _WORD:off * _WORD + len(raw)] = raw
    return _Seg.list_ptr(from_woff, off, 2, len(raw))


def write_msh(path: str, sk: MshSketchSet) -> None:
    """Encode a sketch set with the reference writer's conventions
    (``Sketch.cpp:384-490``): the seed-42 back-compat list choice,
    length64, sorted hashes in hashes64/hashes32 by ``use64``."""
    seg = _Seg()
    root_ptr_at = seg.alloc(1)
    root = seg.alloc(3 + 4)  # 3 data words + 4 pointers
    seg.put_u64(root_ptr_at, _Seg.struct_ptr(root_ptr_at, root, 3, 4))
    struct.pack_into("<III", seg.buf, root * _WORD,
                     sk.kmer_size, sk.window_size, sk.min_hashes_per_window)
    struct.pack_into("<f", seg.buf, root * _WORD + 16, sk.error)
    struct.pack_into("<I", seg.buf, root * _WORD + 20, sk.hash_seed ^ 42)
    bits = (int(sk.concatenated) | int(sk.noncanonical) << 1
            | int(sk.preserve_case) << 2)
    seg.buf[root * _WORD + 12] = bits
    ptr_base = root + 3

    # referenceListOld when seed == 42, else referenceList (writer quirk)
    list_slot = ptr_base + (0 if sk.hash_seed == 42 else 3)
    holder = seg.alloc(1)  # ReferenceList: 0 data words, 1 pointer
    seg.put_u64(list_slot, _Seg.struct_ptr(list_slot, holder, 0, 1))

    refs = sk.references
    dw, pw = 2, 7  # Reference: 2 data words, 7 pointers
    stride = dw + pw
    tag_off = seg.alloc(1 + len(refs) * stride)
    seg.put_u64(tag_off, (len(refs) & 0x3FFFFFFF) << 2 | dw << 32 | pw << 48)
    seg.put_u64(holder, _Seg.list_ptr(
        holder, tag_off, 7, len(refs) * stride))
    for i, r in enumerate(refs):
        base = tag_off + 1 + i * stride
        struct.pack_into("<I", seg.buf, base * _WORD, min(r.length, 2**32 - 1))
        struct.pack_into("<Q", seg.buf, base * _WORD + 8, r.length)
        if len(r.counts):
            seg.buf[base * _WORD + 4] |= 1  # counts32Sorted bit 32
        p = base + dw
        seg.put_u64(p + 2, _put_text(seg, p + 2, r.name))
        seg.put_u64(p + 3, _put_text(seg, p + 3, r.comment))
        h = np.asarray(r.hashes)
        if r.use64:
            off = seg.alloc(len(h))
            seg.buf[off * _WORD:off * _WORD + 8 * len(h)] = (
                h.astype("<u8").tobytes())
            seg.put_u64(p + 5, _Seg.list_ptr(p + 5, off, 5, len(h)))
        else:
            off = seg.alloc((len(h) + 1) // 2)
            seg.buf[off * _WORD:off * _WORD + 4 * len(h)] = (
                h.astype("<u4").tobytes())
            seg.put_u64(p + 4, _Seg.list_ptr(p + 4, off, 4, len(h)))
        if len(r.counts):
            c = np.asarray(r.counts)
            off = seg.alloc((len(c) + 1) // 2)
            seg.buf[off * _WORD:off * _WORD + 4 * len(c)] = (
                c.astype("<u4").tobytes())
            seg.put_u64(p + 6, _Seg.list_ptr(p + 6, off, 4, len(c)))

    # empty LocusList (0 data, 1 null pointer), as the writer always inits
    loc = seg.alloc(1)
    seg.put_u64(ptr_base + 1, _Seg.struct_ptr(ptr_base + 1, loc, 0, 1))
    seg.put_u64(ptr_base + 2, _put_text(seg, ptr_base + 2, sk.alphabet))

    words = len(seg.buf) // _WORD
    with open(path, "wb") as f:
        f.write(struct.pack("<II", 0, words))
        f.write(seg.buf)


# ---------------------------------------------------------------------------
# Spark bridge
# ---------------------------------------------------------------------------


def msh_to_sketches(spark, path: str, id_offset: int = 0):
    """``.msh`` -> the repo's sketch-table shape (doc_id, name, sketch
    binary, card_est) with the build params embedded in schema metadata,
    so paste/dist/screen param-compatibility enforcement (F6,
    ``Sketch.cpp:133-160``) applies to interop tables exactly as to
    native ones. doc_ids are assigned by file order from ``id_offset``."""
    from pyspark.sql.types import (BinaryType, LongType, StringType,
                                   StructField, StructType)

    from .hashing import encode_signed
    from .minhash import kmv_set_size
    from .params import PARAMS_META_KEY, SketchParams

    sk = read_msh(path)
    params = SketchParams(
        k=sk.kmer_size, s=sk.min_hashes_per_window, seed=sk.hash_seed,
        alphabet_size=max(len(sk.alphabet), 1) if sk.alphabet else 256,
    )
    rows = []
    for i, r in enumerate(sk.references):
        h = np.sort(np.asarray(r.hashes, dtype=np.uint64))
        # p-values in the reference use the recorded sequence length as
        # the reference cardinality (CommandDistance.cpp:427-448 via
        # Reference::length); fall back to the KMV estimate for files
        # that never stored one
        card = int(r.length) if r.length else (
            kmv_set_size(h) if len(h) >= params.s else len(h))
        rows.append((
            id_offset + i, r.name, r.comment, int(r.length),
            encode_signed(h).astype("<i8").tobytes(), int(card),
        ))
    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("comment", StringType(), True),
        StructField("length", LongType(), False),
        StructField("sketch", BinaryType(), False,
                    metadata={PARAMS_META_KEY: params.to_dict()}),
        StructField("card_est", LongType(), False),
    ])
    return spark.createDataFrame(rows, schema), params
