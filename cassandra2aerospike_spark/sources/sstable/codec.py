"""Binary primitives for the SSTable-style run format (SURVEY.md §2.1 S7).

Fresh implementations of the decoder family the reference exposes on its
buffered reader (/root/reference/Buffer.cpp:55-171): big-endian fixed ints,
unsigned vint with a leading-ones length prefix, zig-zag signed vint,
length-framed strings and blobs.  Byte-for-byte these follow the public
Cassandra vint scheme (the count of leading 1-bits in the first byte gives
the number of extension bytes; remaining bits of the first byte are the
value's high bits).

Everything works on `memoryview`/`bytes` + an offset, returning
(value, new_offset) — zero-copy friendly for mmap'd files.
"""

from __future__ import annotations

import struct

_U16 = struct.Struct(">H")
_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")
_I64 = struct.Struct(">q")
_F64 = struct.Struct(">d")


# ---------------------------------------------------------------- encoders

def enc_u16(v: int) -> bytes:
    return _U16.pack(v)


def enc_u32(v: int) -> bytes:
    return _U32.pack(v)


def enc_u64(v: int) -> bytes:
    return _U64.pack(v)


def enc_i64(v: int) -> bytes:
    return _I64.pack(v)


def enc_f64(v: float) -> bytes:
    return _F64.pack(v)


def enc_uvint(v: int) -> bytes:
    """Unsigned vint, leading-ones scheme: n extension bytes are announced
    by n leading 1-bits in the first byte (Buffer.cpp:60-93 semantics).
    With n < 8 extension bytes the first byte contributes 7-n value bits
    (after the n ones and a zero separator), so capacity is 7+7n bits;
    n = 8 (first byte 0xFF) carries a full 8-byte big-endian value."""
    if v < 0:
        raise ValueError("uvint encodes non-negative values")
    for n in range(8):
        if v < (1 << (7 + 7 * n)):
            if n == 0:
                return bytes([v])
            prefix = (0xFF << (8 - n)) & 0xFF
            top = v >> (8 * n)
            return bytes([prefix | top]) + (v & ((1 << (8 * n)) - 1)).to_bytes(n, "big")
    if v < (1 << 64):
        return b"\xff" + v.to_bytes(8, "big")
    raise ValueError(f"uvint overflow: {v}")


def enc_vint(v: int) -> bytes:
    """Zig-zag signed vint (Buffer.cpp:95-100 semantics).  Python ints are
    arbitrary precision, so (v << 1) ^ (v >> 63) works unchanged for
    negatives (v >> 63 is -1, XOR = bitwise NOT)."""
    return enc_uvint((v << 1) ^ (v >> 63))


def enc_str16(s: str) -> bytes:
    """u16-length-prefixed UTF-8 (Buffer.cpp:112-123 semantics)."""
    b = s.encode("utf-8")
    return enc_u16(len(b)) + b


def enc_vstr(s: str) -> bytes:
    """vint-length-prefixed UTF-8 (Buffer.cpp:125-136 semantics)."""
    b = s.encode("utf-8")
    return enc_uvint(len(b)) + b


def enc_vblob(b: bytes) -> bytes:
    """vint-length-prefixed blob (Buffer.cpp:153-165 uses i32 framing; we
    use vint framing uniformly — this format is inspired-by, not
    byte-compatible)."""
    return enc_uvint(len(b)) + bytes(b)


# ---------------------------------------------------------------- decoders

def dec_u16(buf, off: int):
    return _U16.unpack_from(buf, off)[0], off + 2


def dec_u32(buf, off: int):
    return _U32.unpack_from(buf, off)[0], off + 4


def dec_u64(buf, off: int):
    return _U64.unpack_from(buf, off)[0], off + 8


def dec_i64(buf, off: int):
    return _I64.unpack_from(buf, off)[0], off + 8


def dec_f64(buf, off: int):
    return _F64.unpack_from(buf, off)[0], off + 8


def dec_uvint(buf, off: int):
    first = buf[off]
    if first < 0x80:
        return first, off + 1
    # count leading ones
    n = 0
    probe = first
    while probe & 0x80:
        n += 1
        probe = (probe << 1) & 0xFF
    if n == 8:
        v = int.from_bytes(bytes(buf[off + 1 : off + 9]), "big")
        return v, off + 9
    value_bits = first & (0xFF >> n)
    v = value_bits
    for i in range(n):
        v = (v << 8) | buf[off + 1 + i]
    return v, off + 1 + n


def dec_vint(buf, off: int):
    zz, off = dec_uvint(buf, off)
    return (zz >> 1) ^ -(zz & 1), off


def dec_str16(buf, off: int):
    ln, off = dec_u16(buf, off)
    return bytes(buf[off : off + ln]).decode("utf-8"), off + ln


def dec_vstr(buf, off: int):
    ln, off = dec_uvint(buf, off)
    return bytes(buf[off : off + ln]).decode("utf-8"), off + ln


def dec_vblob(buf, off: int):
    ln, off = dec_uvint(buf, off)
    return bytes(buf[off : off + ln]), off + ln
