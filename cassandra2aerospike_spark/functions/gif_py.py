"""Pure-Python GIF codec (numpy only): full LZW decode, palette-exact.

`decode_gif` reads real GIF87a/GIF89a streams — logical screen
descriptor, global/local color tables, 89a extension blocks (skipped),
sub-block reassembly, and the complete variable-width LZW decode with
clear/EOI handling — into an (h, w, 3) uint8 RGB array (first image
only).  `encode_gif` emits spec-valid GIF87a using the classic
literal+clear LZW stream (every index emitted as a 9-bit literal with a
CLEAR before the decoder's table would force a width change), which any
conforming reader decodes.

Uniform-rejection discipline (like png/jpeg/snappy/lz4): interlaced
images, >8-bit color resolution quirks and truncation at any byte raise
ValueError, never IndexError.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with at most 256 distinct colors -> GIF87a."""
    return encode_gif_animation([img])


def encode_gif_animation(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """Frames (each (h, w, 3) uint8, same dims, <= 256 distinct colors
    ACROSS all frames) -> an animated GIF89a (GIF87a when one frame):
    one shared global palette, a graphic-control extension with
    `delay_cs` centiseconds per frame, one full-size image per frame."""
    if not frames:
        raise ValueError("encode_gif: no frames")
    h, w, nch = frames[0].shape
    for f in frames:
        if f.shape != (h, w, nch) or f.dtype != np.uint8 or nch != 3:
            raise ValueError("encode_gif: frames must be same-shape (h, w, 3) uint8")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    per_frame = inv.reshape(len(frames), h * w)

    animated = len(frames) > 1
    out = bytearray(b"GIF89a" if animated else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 entries
    out += palette.tobytes()
    for indices in per_frame:
        if animated:  # graphic control extension per frame
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += _lzw_image_data(indices)
    out += b"\x3b"  # trailer
    return bytes(out)


def _lzw_image_data(indices: np.ndarray) -> bytes:
    """LZW-coded image data (min-code byte + sub-blocks) for one frame's
    index array, via the literal+clear stream (see module docstring)."""
    min_code = 8
    clear, eoi = 256, 257
    width = 9
    acc = 0
    nbits = 0
    data = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    since_clear = 0
    for idx in indices:
        # after n literals the decoder's next_code is 258 + (n - 1); stay
        # below 511 so the code width never leaves 9 bits
        if since_clear >= 250:
            put(clear)
            since_clear = 0
        put(int(idx))
        since_clear += 1
    put(eoi)
    if nbits:
        data.append(acc & 0xFF)

    out = bytearray([min_code])
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    return bytes(out)


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("gif: truncated sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        if pos + ln > n:
            raise ValueError("gif: truncated sub-blocks")
        chunks.append(payload[pos : pos + ln])
        pos += ln


def decode_gif(payload: bytes) -> np.ndarray:
    """FIRST image of a GIF as (h, w, 3) uint8 RGB — decodes only the
    first image block (cheap on long animations; an offset-placed image
    is returned as its own pixel grid, like standalone viewers do) and
    requires a trailer byte somewhere after it."""
    return _decode_gif_impl(payload, first_only=True)[0]


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """EVERY frame of a (possibly animated) GIF as (h, w, 3) uint8 RGB
    arrays — the real "video" decode path for frame sampling.  Each
    frame must be full-size at origin (what encode_gif_animation emits;
    partial-frame composition over a canvas is rejected, not guessed)."""
    return _decode_gif_impl(payload, first_only=False)


def _decode_gif_impl(payload: bytes, first_only: bool) -> list[np.ndarray]:
    n = len(payload)
    if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_palette = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        if pos + 3 * size > n:
            raise ValueError("gif: truncated global color table")
        global_palette = np.frombuffer(payload, np.uint8, 3 * size, pos).reshape(-1, 3)
        pos += 3 * size
    frames: list[np.ndarray] = []
    while True:
        if pos >= n:
            raise ValueError("gif: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= n:
                raise ValueError("gif: truncated extension")
            pos += 1
            _, pos = _read_subblocks(payload, pos)
        elif block == 0x3B:
            if not frames:
                raise ValueError("gif: no image data before trailer")
            return frames
        elif block == 0x2C:
            img, pos = _decode_image(
                payload, pos, global_palette,
                require_origin=not first_only, screen=(sw, sh),
            )
            frames.append(img)
            if first_only:
                # cheap single-frame path: skip decoding any further
                # frames; the trailer must still exist somewhere after
                if 0x3B not in payload[pos:]:
                    raise ValueError("gif: missing trailer")
                return frames
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")


def _decode_image(
    payload: bytes,
    pos: int,
    palette: np.ndarray | None,
    require_origin: bool = True,
    screen: tuple[int, int] | None = None,
) -> tuple[np.ndarray, int]:
    """One image descriptor + LZW data starting at `pos` (after the 0x2c
    introducer) -> ((h, w, 3) RGB, next block position)."""
    n = len(payload)
    if pos + 9 > n:
        raise ValueError("gif: truncated image descriptor")
    ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if iflags & 0x40:
        raise ValueError("gif: interlaced images unsupported")
    if require_origin and (ix != 0 or iy != 0 or (screen is not None and (iw, ih) != screen)):
        # full-frame contract for the frames API: an origin-placed DELTA
        # frame smaller than the screen is still partial composition
        raise ValueError("gif: partial-frame composition unsupported")
    if iflags & 0x80:  # local color table wins
        size = 2 << (iflags & 0x07)
        if pos + 3 * size > n:
            raise ValueError("gif: truncated local color table")
        palette = np.frombuffer(payload, np.uint8, 3 * size, pos).reshape(-1, 3)
        pos += 3 * size
    if palette is None:
        raise ValueError("gif: no color table")
    if iw == 0 or ih == 0:
        raise ValueError("gif: empty image")
    if pos >= n:
        raise ValueError("gif: truncated LZW header")
    min_code = payload[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        raise ValueError("gif: bad LZW minimum code size")
    data, pos = _read_subblocks(payload, pos)

    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = eoi + 1
    acc = 0
    nbits = 0
    di = 0
    prev: bytes | None = None
    out = bytearray()
    need = iw * ih
    while True:
        while nbits < width:
            if di >= len(data):
                raise ValueError("gif: LZW stream ended without EOI")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = table[: clear + 2]
            next_code = eoi + 1
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        prev = entry
        if next_code == (1 << width) and width < 12:
            width += 1
        if len(out) > need:
            raise ValueError("gif: LZW output exceeds image size")
    if len(out) != need:
        raise ValueError("gif: LZW output short of image size")
    idx = np.frombuffer(bytes(out), dtype=np.uint8)
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("gif: pixel index outside color table")
    return palette[idx].reshape(ih, iw, 3), pos
