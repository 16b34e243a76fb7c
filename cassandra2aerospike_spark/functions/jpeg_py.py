"""Pure-Python baseline JPEG codec (numpy only — no codec library).

Closes the last X5 decode stub: `decode_jpeg_baseline` reads real
baseline JFIF streams (SOI/DQT/SOF0/DHT/SOS markers, canonical huffman
tables built FROM THE FILE's DHT segments, 0xFF00 byte unstuffing,
run-length AC decode, dequant + inverse zigzag + orthonormal IDCT,
YCbCr->RGB) and `encode_jpeg_baseline` emits spec-valid baseline JPEGs
(standard Annex K huffman tables, 4:4:4, one scan).

Scope — uniform-rejection discipline like the png/snappy/lz4 decoders:
baseline sequential (SOF0), 8-bit, 4:4:4 sampling (1x1 factors), no
restart markers; progressive (SOF2), subsampled, 12-bit or arithmetic
streams raise ValueError rather than mis-decode.

Exactness contract used by the fixture oracles: with all-ones quant
tables a solid-color image decodes EXACTLY to the YCbCr-roundtripped
color (the DCT of a constant block is DC-only; quant=1 preserves the
integer DC; float noise on AC terms is < 1e-10 and rounds away), and
every rounding step here is floor(x + 0.5) so SQL can replicate the
pixel arithmetic in closed form.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i holds the (row*8+col) position of the i-th
# zigzag coefficient (ISO/IEC 10918-1 Figure A.6)
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# standard huffman tables (ISO/IEC 10918-1 Annex K.3)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: forward = C @ B @ C.T."""
    k = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): the one rounding rule used everywhere in this
    codec, chosen because SQL can replicate it exactly (np.round would
    be banker's rounding)."""
    return np.floor(x + 0.5)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (spec B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:  # pad with 1-bits (spec F.1.2.3)
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment (spec C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a coefficient (spec F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def encode_jpeg_baseline(rgb: np.ndarray, quant: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes: 4:4:4, one scan,
    flat quant table of `quant`, Annex K huffman tables (table 0 for
    every component)."""
    h, w, nch = rgb.shape
    if nch != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg_baseline: expects (h, w, 3) uint8")
    qtab = np.full(64, int(quant), dtype=np.int64)
    ycc = rgb_to_ycbcr(rgb).astype(np.float64)
    # pad to 8x8 MCU boundary by edge replication
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]

    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    qtab_grid = qtab[np.argsort(ZIGZAG)].reshape(8, 8)  # natural order
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                block = padded[by : by + 8, bx : bx + 8, comp] - 128.0
                coef = _C @ block @ _C.T
                q = _round_half_up(coef / qtab_grid).astype(np.int64)
                zz = q.reshape(64)[ZIGZAG]
                diff = int(zz[0]) - prev_dc[comp]
                prev_dc[comp] = int(zz[0])
                s, bits_v = _magnitude(diff)
                code, ln = dc_codes[s]
                bw.put(code, ln)
                if s:
                    bw.put(bits_v, s)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for i in range(1, 64):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    s, bits_v = _magnitude(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(bits_v, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = bytes(int(qtab[i]) for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qz)  # DQT id 0, 8-bit
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # 1x1 sampling, qtab 0
    out += seg(0xFFC0, sof)  # SOF0 baseline
    out += seg(0xFFC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    sos = b"\x03" + b"".join(struct.pack(">BB", cid, 0x00) for cid in (1, 2, 3))
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


# ------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; hitting a
    marker or the end raises ValueError (truncated stream)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy segment")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError("jpeg: marker inside entropy segment")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def get(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


class _HuffTable:
    """Canonical huffman decode table from a DHT (bits, vals) pair."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(vals):
                    raise ValueError("jpeg: bad huffman table")
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
            if code > (1 << length) * 2:
                raise ValueError("jpeg: huffman table violates Kraft")

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.get(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


def _extend(bits: int, s: int) -> int:
    """receive/extend (spec F.2.2.1)."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB.  Raises ValueError on
    anything outside the supported envelope (see module docstring)."""
    n = len(payload)
    if n < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hufftabs: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    sof = None
    scan_comps = None
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        # spec B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 2 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            break
        marker = payload[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone (parameterless) markers: TEM, RSTn — no length field
            pos += 2
            continue
        if pos + 4 > n:
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT: one or more tables
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                if o + 65 > len(body):
                    raise ValueError("jpeg: truncated DQT")
                qtabs[tq] = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8).astype(np.int64)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                cnt = sum(bits)
                vals = list(body[o + 17 : o + 17 + cnt])
                if len(bits) < 16 or len(vals) < cnt:
                    raise ValueError("jpeg: truncated DHT")
                hufftabs[(tc, th)] = _HuffTable(bits, vals)
                o += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 3:
                raise ValueError("jpeg: only 8-bit 3-component baseline supported")
            comps = []
            for ci in range(nc):
                cid, sf, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                if sf != 0x11:
                    raise ValueError("jpeg: subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (hh, ww, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("jpeg: restart markers unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            if sof is None or ns != 3:
                raise ValueError("jpeg: bad SOS")
            scan_comps = []
            for ci in range(ns):
                cid, tabs = struct.unpack_from(">BB", body, 1 + 2 * ci)
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if sof is None or scan_comps is None:
        raise ValueError("jpeg: missing SOF/SOS")
    hh, ww, comps = sof
    if hh == 0 or ww == 0:
        raise ValueError("jpeg: empty image")
    br = _BitReader(payload, pos)
    ph, pw = (hh + 7) & ~7, (ww + 7) & ~7
    planes = np.zeros((3, ph, pw), dtype=np.float64)
    prev_dc = [0, 0, 0]
    inv_zz = np.argsort(ZIGZAG)
    # scan order is the order entropy blocks appear in; each scan
    # component is matched to its SOF component BY ID (SOF and SOS may
    # both legally reorder), which fixes the quant table, and the output
    # plane comes from the JFIF id convention (1=Y, 2=Cb, 3=Cr)
    sof_tq = {cid: tq for cid, tq in comps}
    if set(sof_tq) != {1, 2, 3}:
        raise ValueError("jpeg: only JFIF YCbCr component ids 1/2/3 supported")
    for cid, _dc, _ac in scan_comps:
        if cid not in sof_tq:
            raise ValueError("jpeg: SOS component id not in SOF")
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, dc_id, ac_id) in enumerate(scan_comps):
                plane_idx, tq = cid - 1, sof_tq[cid]
                if tq not in qtabs:
                    raise ValueError("jpeg: missing quant table")
                dc_tab = hufftabs.get((0, dc_id))
                ac_tab = hufftabs.get((1, ac_id))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("jpeg: missing huffman table")
                zz = np.zeros(64, dtype=np.int64)
                s = dc_tab.decode(br)
                if s > 11:
                    raise ValueError("jpeg: bad DC category")
                diff = _extend(br.get(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    rs = ac_tab.decode(br)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            i += 16
                            continue
                        break  # EOB
                    i += r
                    if i > 63:
                        raise ValueError("jpeg: AC run past block end")
                    zz[i] = _extend(br.get(s), s)
                    i += 1
                coef = (zz * qtabs[tq])[inv_zz].reshape(8, 8).astype(np.float64)
                block = _C.T @ coef @ _C + 128.0
                planes[plane_idx, by : by + 8, bx : bx + 8] = block
    if b"\xff\xd9" not in payload[max(br.pos - 1, 0) :]:
        raise ValueError("jpeg: missing EOI")
    ycc = np.clip(_round_half_up(planes), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack([ycc[0], ycc[1], ycc[2]], axis=-1))[:hh, :ww]
