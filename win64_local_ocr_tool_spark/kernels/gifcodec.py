"""Minimal pure-stdlib GIF codec (LZW + numpy) for the multimodal
operators.

GIF needs no external library at all — the format is palette + LZW,
both implementable exactly from the GIF89a specification — so the
decode seam gets a REAL decoder for the third big crawl-image format
after PNG and JPEG (reference analog: arbitrary uploads via PIL,
``backend/annotator/segmentation/utils.py:7-14``). Covered for real:
GIF87a/GIF89a, global/local color tables, interlaced images, any LZW
code width, multi-frame files (the FIRST frame is decoded and
composited onto the logical screen at its (left, top) offset over the
background color, so output dims always equal ``parse_gif_header``'s;
animation compositing beyond frame 1 is out of scope and documented).
Transparency is ignored (output is RGB; the transparent index renders
as its palette color). Malformed payloads raise ``ValueError`` ->
row-level ``error`` status, never task failures.

The encoder (GIF87a, one frame, 256-entry palette, real LZW) provides
round-trip fixtures without any external library; encode(decode(x))
is lossless for any image with <= 256 distinct colors.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# LZW decode is a per-code Python loop; same per-task stall rationale
# as pngcodec.MAX_DECODE_PIXELS.
MAX_DECODE_PIXELS = 1_000_000

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(payload: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate a data-sub-block sequence; return (data, next_off)."""
    out = bytearray()
    n = len(payload)
    while True:
        if off >= n:
            raise ValueError("truncated GIF sub-blocks")
        ln = payload[off]
        off += 1
        if ln == 0:
            return bytes(out), off
        if off + ln > n:
            raise ValueError("truncated GIF sub-block")
        out += payload[off:off + ln]
        off += ln


def _screen(payload: bytes):
    """(width, height, gct_or_None, bg_index, off_after_header)."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    off = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if off + 3 * size > len(payload):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=3 * size, offset=off
        ).reshape(size, 3)
        off += 3 * size
    return w, h, gct, bg, off


def _first_image_descriptor(payload: bytes, off: int):
    """Skip extensions to the first image descriptor; return
    (w, h, interlaced, lct_or_None, off_at_lzw_min_code)."""
    n = len(payload)
    while True:
        if off >= n:
            raise ValueError("no image data in GIF")
        introducer = payload[off]
        off += 1
        if introducer == 0x3B:  # trailer before any image
            raise ValueError("no image data in GIF")
        if introducer == 0x21:  # extension: label + sub-blocks
            if off >= n:
                raise ValueError("truncated GIF extension")
            off += 1
            _, off = _sub_blocks(payload, off)
            continue
        if introducer != 0x2C:
            raise ValueError(f"bad GIF block introducer 0x{introducer:02x}")
        if off + 9 > n:
            raise ValueError("truncated image descriptor")
        left, top, w, h, packed = struct.unpack_from("<HHHHB", payload, off)
        off += 9
        lct = None
        if packed & 0x80:
            size = 2 << (packed & 0x07)
            if off + 3 * size > n:
                raise ValueError("truncated local color table")
            lct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * size, offset=off
            ).reshape(size, 3)
            off += 3 * size
        return left, top, w, h, bool(packed & 0x40), lct, off


def parse_gif_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels=3) from the logical screen descriptor —
    header-only, never touches entropy data. ``decode_gif`` returns
    exactly these dimensions (sub-screen first frames are composited
    onto the screen canvas)."""
    w, h, _, _, _ = _screen(payload)
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad dimensions")
    return w, h, 3


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code}")
    clear, end = 1 << min_code, (1 << min_code) + 1
    # dictionary as (prefix_index, tail_byte); roots have prefix -1
    prefix = np.empty(4096, dtype=np.int32)
    tail = np.empty(4096, dtype=np.uint8)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    bitpos = 0
    total_bits = len(data) * 8

    def reset():
        return clear + 2, min_code + 1, -1

    next_code, width, prev = reset()
    expand = bytearray(4096)  # scratch for one code's string (max 4096)
    while n_out < n_pixels:
        if bitpos + width > total_bits:
            raise ValueError("truncated LZW stream")
        byte0 = bitpos >> 3
        chunk = int.from_bytes(
            data[byte0:byte0 + 3], "little"
        ) >> (bitpos & 7)
        code = chunk & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            next_code, width, prev = reset()
            continue
        if code == end:
            break
        if code < clear:  # root
            first = code
            length = 1
            expand[0] = code
        elif code < next_code or (code == next_code and prev >= 0):
            # expand (KwKwK case when code == next_code)
            probe = prev if code == next_code else code
            length = 0
            while probe >= 0:
                if probe < clear:
                    expand[length] = probe
                    first = probe
                    probe = -1
                else:
                    expand[length] = tail[probe]
                    probe = prefix[probe]
                length += 1
            expand[:length] = expand[:length][::-1]
            if code == next_code:
                expand[length] = first
                length += 1
        else:
            raise ValueError("corrupt LZW code stream")
        if n_out + length > n_pixels:
            length = n_pixels - n_out
        out[n_out:n_out + length] = np.frombuffer(
            expand, dtype=np.uint8, count=length
        )
        n_out += length
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError("LZW stream ended early")
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame composited onto the logical screen -> HxWx3 uint8
    RGB at exactly ``parse_gif_header``'s dimensions. A sub-screen
    first frame (legal per GIF89a, produced by optimizing encoders) is
    pasted at its (left, top) offset over a background-color canvas;
    animation compositing beyond frame 1 is out of scope."""
    sw, sh, gct, bg, off = _screen(payload)
    if sw == 0 or sh == 0:
        raise ValueError("bad dimensions")
    if sw * sh > MAX_DECODE_PIXELS:
        raise ValueError(
            f"refusing full decode of {sw}x{sh} GIF "
            f"(> {MAX_DECODE_PIXELS} px); parse_gif_header covers metadata"
        )
    left, top, w, h, interlaced, lct, off = _first_image_descriptor(
        payload, off
    )
    if w == 0 or h == 0:
        raise ValueError("bad dimensions")
    if left + w > sw or top + h > sh:
        raise ValueError("GIF frame exceeds the logical screen")
    palette = lct if lct is not None else gct
    if palette is None:
        raise ValueError("GIF image has no color table")
    if off >= len(payload):
        raise ValueError("truncated GIF (no LZW data)")
    min_code = payload[off]
    data, _ = _sub_blocks(payload, off + 1)
    idx = _lzw_decode(data, min_code, w * h)
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("pixel index outside color table")
    rows = idx.reshape(h, w)
    if interlaced:
        ordered = np.empty_like(rows)
        src = 0
        for start, step in _INTERLACE_PASSES:
            n_rows = len(range(start, h, step))
            ordered[start::step] = rows[src:src + n_rows]
            src += n_rows
    else:
        ordered = rows
    frame = palette[ordered]
    if (left, top, w, h) == (0, 0, sw, sh):
        return frame
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    canvas[top:top + h, left:left + w] = frame
    return canvas


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear, end = 1 << min_code, (1 << min_code) + 1
    table: dict[tuple[int, int], int] = {}
    next_code, width = clear + 2, min_code + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = int(indices[0])
    for v in indices[1:]:
        v = int(v)
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        emit(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            next_code, width = clear + 2, min_code + 1
        prev = v
    emit(prev)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """RGB HxWx3 uint8 -> single-frame GIF87a. The image must use
    <= 256 distinct colors (exactly representable in one palette);
    more raises ValueError — quantization is a real codec's job."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif wants HxWx3 uint8 RGB")
    h, w, _ = img.shape
    if h == 0 or w == 0:
        # module contract: invalid inputs raise ValueError (callers like
        # media_resize map it to an 'error' row); without this guard the
        # LZW encoder would hit indices[0] and leak an IndexError
        raise ValueError("encode_gif: empty image")
    flat = img.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    size_pow = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((2 << (size_pow - 1), 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, size_pow)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_pow - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    data = _lzw_encode(indices.astype(np.int32), min_code)
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
