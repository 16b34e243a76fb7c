"""Pure-Python Snappy raw-block codec (S5).

The reference dispatches three chunk codecs — LZ4, Snappy, Deflate
(Buffer.cpp:243-272) — and python-snappy is not installable in this
environment, so the Snappy *block* format (public spec:
google/snappy format_description.txt) is implemented directly rather
than leaving the codec as an import seam.

Layout: a little-endian varint uncompressed length, then elements whose
tag byte's low 2 bits select the kind:

  00 literal — length-1 in tag>>2 when < 60; tags 60..63 mean 1..4
     trailing little-endian bytes hold length-1
  01 copy, 1-byte offset — len = ((tag>>2)&7)+4 (4..11),
     offset = (tag>>5)<<8 | next byte (11 bits)
  10 copy, 2-byte LE offset — len = (tag>>2)+1 (1..64)
  11 copy, 4-byte LE offset — len = (tag>>2)+1

Copies may reach back into earlier output and may OVERLAP the point
being written (offset < length ⇒ byte-at-a-time replication — the RLE
trick), which the decoder honors.

The compressor is a greedy 4-byte hash matcher emitting literals and
2-byte-offset copies — valid standard Snappy that any implementation
decodes.  Throughput is not a goal (chunks are ≤ 64 KiB and fixture
-scale); round-trip correctness is property-tested.
"""

from __future__ import annotations

_MIN_MATCH = 4


def _uvarint_enc(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _uvarint_dec(buf: bytes, off: int) -> tuple[int, int]:
    shift = v = 0
    n = len(buf)
    while True:
        if off >= n:
            raise ValueError("snappy: truncated varint")
        b = buf[off]
        off += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, off
        shift += 7


def _read_le(comp: bytes, off: int, nb: int) -> tuple[int, int]:
    """Bounds-checked little-endian read: truncated input fails uniformly
    as a snappy error, never as a silent short value or IndexError."""
    if off + nb > len(comp):
        raise ValueError("snappy: truncated")
    return int.from_bytes(comp[off : off + nb], "little"), off + nb


def decompress(comp: bytes) -> bytes:
    total, off = _uvarint_dec(comp, 0)
    out = bytearray()
    n = len(comp)
    while off < n:
        tag = comp[off]
        off += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                ln, off = _read_le(comp, off, ln - 59)
            ln += 1
            if off + ln > n:
                raise ValueError("snappy: truncated literal")
            out += comp[off : off + ln]
            off += ln
            continue
        # 1- and 2-byte offset reads inlined (one per tag — the loop's
        # hottest ops); the rare 4-byte form keeps the shared helper
        if kind == 1:
            ln = ((tag >> 2) & 7) + 4
            if off >= n:
                raise ValueError("snappy: truncated")
            o = ((tag >> 5) << 8) | comp[off]
            off += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            if off + 2 > n:
                raise ValueError("snappy: truncated")
            o = comp[off] | (comp[off + 1] << 8)
            off += 2
        else:
            ln = (tag >> 2) + 1
            o, off = _read_le(comp, off, 4)
        if o == 0 or o > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - o
        if o >= ln:
            out += out[start : start + ln]
        else:
            # overlapping copy: the trailing o bytes repeat — replicate
            # the pattern with C-speed slice multiplication instead of
            # byte-at-a-time appends (measured 5-10x on repetitive data)
            pattern = bytes(out[start:])
            out += (pattern * (ln // o + 1))[:ln]
    if len(out) != total:
        raise ValueError(f"snappy: length mismatch {len(out)} != {total}")
    return bytes(out)


def _emit_literal(out: bytearray, raw: bytes, start: int, end: int) -> None:
    while start < end:
        ln = min(end - start, 65536)
        l1 = ln - 1
        if l1 < 60:
            out.append(l1 << 2)
        elif l1 < 256:
            out.append(60 << 2)
            out.append(l1)
        else:
            out.append(61 << 2)
            out += l1.to_bytes(2, "little")
        out += raw[start : start + ln]
        start += ln


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    while length > 0:
        ln = min(length, 64)
        out.append(((ln - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= ln


def compress(raw: bytes) -> bytes:
    out = bytearray(_uvarint_enc(len(raw)))
    n = len(raw)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + _MIN_MATCH <= n:
        key = raw[i : i + _MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            m = _MIN_MATCH
            while i + m < n and raw[cand + m] == raw[i + m]:
                m += 1
            _emit_literal(out, raw, lit_start, i)
            _emit_copy(out, i - cand, m)
            i += m
            lit_start = i
        else:
            i += 1
    _emit_literal(out, raw, lit_start, n)
    return bytes(out)
