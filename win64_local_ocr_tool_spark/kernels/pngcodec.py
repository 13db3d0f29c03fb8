"""Minimal pure-stdlib PNG codec (zlib + numpy) for the multimodal
operators.

The container has no PIL/opencv, but PNG's baseline profile needs only
``zlib`` (stdlib) plus the five scanline filters — so the decode seam
in ``operators/multimodal.py`` gets a REAL decoder instead of a stub
for the overwhelmingly common case: 8-bit, non-interlaced,
gray / gray+alpha / RGB / RGBA (reference analog: the image loads in
``backend/annotator/segmentation/utils.py:7-14``). Unsupported
variants (16-bit, palette, interlaced) raise ``ValueError`` and
surface as row-level ``error`` status, never task failures. Baseline
JPEG decodes for real too (``kernels/jpegcodec.py``); only
non-baseline JPEG profiles remain behind the ``no_codec`` boundary.

The encoder (filter 0, one IDAT) lets ``media_resize`` emit real PNG
output and gives tests round-trip fixtures without any external
library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# decode_png refuses images above this pixel count: the Average/Paeth
# unfilter is a per-byte Python loop (inherently sequential along the
# scanline), so a single 64-megapixel payload would stall a Spark task
# for minutes with nothing raising. Header-only parsing keeps the wider
# 64M-pixel bound; full decode is the stdlib-codec trade-off a real
# deployment lifts by swapping in PIL/opencv.
MAX_DECODE_PIXELS = 1_000_000

# PNG color type -> channel count (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def parse_png_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR — header-only, never touches
    the body (cheap metadata even on multi-MB payloads)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    length, ctype = struct.unpack_from(">I4s", payload, 8)
    if ctype != b"IHDR" or length != 13:
        raise ValueError("malformed IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack_from(
        ">IIBBBBB", payload, 16
    )
    if depth != 8 or color not in _CHANNELS:
        raise ValueError(f"unsupported PNG variant depth={depth} color={color}")
    if comp or filt or interlace:
        raise ValueError("unsupported PNG compression/filter/interlace")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad dimensions")
    return w, h, _CHANNELS[color]


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> HxWxC uint8 array (baseline profile, all 5 scanline
    filters)."""
    w, h, c = parse_png_header(payload)
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"image too large for the stdlib unfilter loop ({w}x{h}); "
            "swap in PIL/opencv for full-size decode"
        )
    off, idat = 8, []
    while off + 8 <= len(payload):
        ln, ctype = struct.unpack_from(">I4s", payload, off)
        if ctype == b"IDAT":
            idat.append(payload[off + 8 : off + 8 + ln])
        if ctype == b"IEND":
            break
        off += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != (stride + 1) * h:
        raise ValueError("scanline size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    data = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(ftypes[y])
        line = data[y]
        prior = out[y - 1].astype(np.int32) if y else zero
        if f == 0:  # None
            recon = line
        elif f == 2:  # Up
            recon = (line + prior) & 255
        elif f == 1:  # Sub — per-lane prefix sum mod 256
            recon = line.reshape(-1, c).copy()
            for x in range(1, recon.shape[0]):
                recon[x] = (recon[x] + recon[x - 1]) & 255
            recon = recon.reshape(-1)
        elif f == 3:  # Average
            recon = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = recon[x - c] if x >= c else 0
                recon[x] = (line[x] + ((a + prior[x]) >> 1)) & 255
        elif f == 4:  # Paeth
            recon = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = recon[x - c] if x >= c else 0
                b = prior[x]
                cc = prior[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                recon[x] = (line[x] + pred) & 255
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = recon.astype(np.uint8)
    return out.reshape(h, w, c)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """HxWxC uint8 array -> PNG bytes (filter 0, single IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
