"""Pure-Python LZ4 block codec (S5).

LZ4 is the reference's FIRST-dispatched chunk codec — and modern
Cassandra's default compressor — (Buffer.cpp:243-272 tries LZ4 before
Snappy/Deflate; CMakeLists links lz4), so a run source without it fails
on the most common real-world input.  The ``lz4`` package is not
installable in this environment; as with Snappy (snappy_py), the public
*block* format (lz4/lz4 doc/lz4_Block_format.md) is implemented directly
so the codec is real, not an import seam.

Framing matches ``lz4.block`` with ``store_size=True``: a 4-byte
little-endian uncompressed length, then the raw LZ4 block — so if the
real package IS importable the two interoperate byte-for-byte.

Block format: a sequence stream.  Each sequence is

  token byte: high nibble = literal run length (15 ⇒ extended by
      255-valued bytes until a byte < 255, all summed), low nibble =
      match length - 4 (15 ⇒ extended the same way);
  <literals>; then, unless this is the final sequence,
  2-byte little-endian match offset (1..65535; 0 is invalid), reaching
      back into already-produced output, overlap allowed (byte-at-a-time
      replication — the RLE trick);
  <match length extension bytes> when the low nibble was 15.

The final sequence carries literals only.  Spec end-of-block rules the
compressor honors: the last 5 bytes are always literals, and no match may
start within the final 12 bytes — inputs shorter than 13 bytes are
emitted as a single literal run.

The compressor is a greedy 4-byte hash matcher (same shape as
snappy_py.compress).  Throughput is not a goal (chunks are ≤ 64 KiB);
round-trip correctness is property-tested.  Every multi-byte read in the
decoder is bounds-checked so truncated or corrupt input fails uniformly
with ``ValueError`` (not a short ``int.from_bytes`` or ``IndexError``).
"""

from __future__ import annotations

_MIN_MATCH = 4
# Spec: last 5 bytes are literals; a match may not start in the final 12.
_LAST_LITERALS = 5
_MATCH_SAFE_END = 12


def _read_extension(comp: bytes, off: int, n: int) -> tuple[int, int]:
    """Sum 255-valued extension bytes until a byte < 255 (bounds-checked)."""
    total = 0
    while True:
        if off >= n:
            raise ValueError("lz4: truncated length extension")
        b = comp[off]
        off += 1
        total += b
        if b < 255:
            return total, off


def decompress(comp: bytes) -> bytes:
    if len(comp) < 4:
        raise ValueError("lz4: truncated size prefix")
    total = int.from_bytes(comp[:4], "little")
    out = bytearray()
    off, n = 4, len(comp)
    if total == 0:
        if off < n and comp[off:] != b"\x00":
            raise ValueError("lz4: trailing bytes after empty block")
        return b""
    while off < n:
        token = comp[off]
        off += 1
        lit = token >> 4
        if lit == 15:
            ext, off = _read_extension(comp, off, n)
            lit += ext
        if off + lit > n:
            raise ValueError("lz4: truncated literals")
        out += comp[off : off + lit]
        off += lit
        if off == n:  # final sequence: literals only
            break
        if off + 2 > n:
            raise ValueError("lz4: truncated match offset")
        o = int.from_bytes(comp[off : off + 2], "little")
        off += 2
        if o == 0 or o > len(out):
            raise ValueError("lz4: match offset out of range")
        mlen = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            ext, off = _read_extension(comp, off, n)
            mlen += ext
        start = len(out) - o
        if o >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping copy: the trailing o bytes repeat — replicate
            # the pattern with C-speed slice multiplication instead of
            # byte-at-a-time appends (measured 5-10x on repetitive data)
            pattern = bytes(out[start:])
            out += (pattern * (mlen // o + 1))[:mlen]
    if len(out) != total:
        raise ValueError(f"lz4: length mismatch {len(out)} != {total}")
    return bytes(out)


def _emit_sequence(out: bytearray, raw: bytes, lit_start: int, lit_end: int,
                   offset: int, mlen: int) -> None:
    """One sequence: literals [lit_start, lit_end) then a match of mlen at
    offset back (mlen == 0 ⇒ final literal-only sequence, no offset)."""
    lit = lit_end - lit_start
    lit_tok = 15 if lit >= 15 else lit
    if mlen:
        m = mlen - _MIN_MATCH
        m_tok = 15 if m >= 15 else m
    else:
        m_tok = 0
    out.append((lit_tok << 4) | m_tok)
    if lit_tok == 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += raw[lit_start:lit_end]
    if not mlen:
        return
    out += offset.to_bytes(2, "little")
    if m_tok == 15:
        rem = mlen - _MIN_MATCH - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def compress(raw: bytes) -> bytes:
    out = bytearray(len(raw).to_bytes(4, "little"))
    n = len(raw)
    if n == 0:
        out.append(0)  # empty final token, as lz4.block emits
        return bytes(out)
    match_limit = n - _MATCH_SAFE_END  # no match may START at/after this
    copy_limit = n - _LAST_LITERALS  # no match may EXTEND past this
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i < match_limit and i + _MIN_MATCH <= copy_limit:
        key = raw[i : i + _MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            m = _MIN_MATCH
            while i + m < copy_limit and raw[cand + m] == raw[i + m]:
                m += 1
            _emit_sequence(out, raw, lit_start, i, i - cand, m)
            i += m
            lit_start = i
        else:
            i += 1
    _emit_sequence(out, raw, lit_start, n, 0, 0)
    return bytes(out)
