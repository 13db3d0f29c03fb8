"""Minimal pure-stdlib BMP codec (struct + numpy) for the multimodal
operators.

Same boundary discipline as ``pngcodec.py`` / ``jpegcodec.py``
(reference analog: arbitrary image uploads decoded via PIL,
``backend/annotator/segmentation/utils.py:7-14``): everything the DIB
spec calls common decodes FOR REAL — uncompressed BI_RGB 1/2/4/8-bit
palette, 16-bit RGB555, 24 and 32-bit with any of the
BITMAPINFOHEADER family headers, bottom-up or top-down, BI_RLE8 and
BI_RLE4 run-length compression (runs, absolute mode, EOL/EOB/delta
escapes), and BI_BITFIELDS with the standard 555/565 masks — while
variants that need a real codec (nonstandard bitfield masks, OS/2
core headers) raise ``NotImplementedError`` and surface as
``status='no_codec'`` rows; malformed payloads raise ``ValueError``
and surface as ``error`` rows, never task failures.

The encoder (24-bit BI_RGB, bottom-up) provides round-trip fixtures
and lets sinks emit real BMP without any external library.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

# Full decode materializes w*h*4 bytes twice (padded rows + output);
# same per-task stall rationale as pngcodec.MAX_DECODE_PIXELS.
MAX_DECODE_PIXELS = 1_000_000

_DIB_SIZES = {40, 52, 56, 64, 108, 124}  # BITMAPINFOHEADER family


def _parse_headers(payload: bytes):
    """(data_offset, width, height, bpp, top_down, compression) with
    the boundary split: ValueError = malformed, NotImplementedError =
    real format this stdlib codec does not cover."""
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (no BM magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size == 12:
        raise NotImplementedError("OS/2 BITMAPCOREHEADER needs a real codec")
    if dib_size not in _DIB_SIZES:
        raise ValueError(f"bad DIB header size {dib_size}")
    w, h, planes, bpp, compression = struct.unpack_from(
        "<iihhI", payload, 18
    )
    if planes != 1:
        raise ValueError("bad planes count")
    if dib_size == 64 and compression in (3, 4):
        # OS/2 2.x reuses the method numbers: 3 = Huffman-1D, 4 =
        # RLE24 — NOT bitfields/JPEG. Must precede the bitfields
        # branch or Huffman data decodes as garbage masks.
        raise NotImplementedError(
            "OS/2 2.x Huffman-1D/RLE24 BMP needs a real codec"
        )
    if compression == 3:
        # BI_BITFIELDS: decode the standard masks — 16-bit 555/565 and
        # 32-bit 8-8-8 (byte-identical to the BI_RGB 32-bit layout) —
        # i.e. effectively all real files; exotic masks need a real
        # codec. The three mask DWORDs sit at offset 54 both when
        # appended after a 40-byte header and inside V4/V5 headers.
        if bpp not in (16, 32):
            raise NotImplementedError(
                "BI_BITFIELDS outside 16/32-bit needs a real codec"
            )
        if len(payload) < 66:
            raise ValueError("truncated BMP bitfields header")
        masks = struct.unpack_from("<III", payload, 14 + 40)
        ok16 = ((0x7C00, 0x3E0, 0x1F), (0xF800, 0x7E0, 0x1F))
        if bpp == 16 and masks not in ok16:
            raise NotImplementedError(
                f"nonstandard 16-bit bitfields {masks} need a real codec"
            )
        if bpp == 32 and masks != (0xFF0000, 0xFF00, 0xFF):
            raise NotImplementedError(
                f"nonstandard 32-bit bitfields {masks} need a real codec"
            )
        if dib_size == 40 and data_offset < 66:
            # masks appended after a 40-byte header occupy [54, 66):
            # a data_offset inside that range would alias the mask
            # DWORDs as pixel data (the 14+dib_size floor below only
            # guards to 54)
            raise ValueError("BI_BITFIELDS pixel offset overlaps masks")
    elif compression not in (0, 1, 2):
        raise NotImplementedError(
            f"compressed BMP (method {compression}) needs a real codec"
        )
    if compression == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8 bpp")
    if compression == 2 and bpp != 4:
        raise ValueError("BI_RLE4 requires 4 bpp")
    if bpp not in (1, 2, 4, 8, 16, 24, 32):
        raise ValueError(f"bad bit depth {bpp}")
    top_down = h < 0
    h = abs(h)
    if top_down and compression in (1, 2):
        raise ValueError("top-down RLE BMP is invalid")
    if w <= 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad dimensions")
    if data_offset < 14 + dib_size or data_offset > len(payload):
        raise ValueError("bad pixel-data offset")
    return data_offset, w, h, bpp, top_down, compression


def parse_bmp_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) — header-only, body untouched.
    Palette (1/2/4/8-bit) and 16-bit BMP report 3 channels."""
    _, w, h, bpp, _, _ = _parse_headers(payload)
    return w, h, 3 if bpp <= 16 else bpp // 8


def _palette(payload: bytes, dib_size: int, bpp: int) -> np.ndarray:
    """256-entry RGB palette from the BGRX quads after the DIB header."""
    n_colors = struct.unpack_from("<I", payload, 46)[0] or (1 << bpp)
    off = 14 + dib_size
    if off + 4 * n_colors > len(payload):
        raise ValueError("truncated BMP palette")
    quads = np.frombuffer(
        payload, dtype=np.uint8, count=4 * n_colors, offset=off
    ).reshape(n_colors, 4)
    return quads[:, [2, 1, 0]].copy()  # BGRX -> RGB


def _decode_rle(data: bytes, w: int, h: int, nibble: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) palette indices in storage (bottom-
    up) row order. Handles encoded runs, absolute mode (word-aligned),
    and the EOL / EOB / delta escapes; pixels never written stay 0
    (palette entry 0), matching GDI. Every loop turn consumes >= 2
    bytes, so decode is linear in payload size."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i, n = 0, len(data)
    while True:
        if i + 2 > n:
            raise ValueError("truncated BMP RLE data")
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE run out of bounds")
            if nibble:
                pair = np.array([val >> 4, val & 15], dtype=np.uint8)
                idx[y, x : x + cnt] = np.tile(pair, (cnt + 1) // 2)[:cnt]
            else:
                idx[y, x : x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            y += 1
            x = 0
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta (dx right, dy toward later storage rows)
            if i + 2 > n:
                raise ValueError("truncated BMP RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE delta out of bounds")
        else:  # absolute mode: val literal pixels, word-aligned
            cnt = val
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE absolute run out of bounds")
            if nibble:
                nbytes = (cnt + 1) // 2
                take = nbytes + (nbytes & 1)
                if i + take > n:
                    raise ValueError("truncated BMP RLE absolute data")
                raw = np.frombuffer(data, np.uint8, count=nbytes, offset=i)
                pix = np.empty(nbytes * 2, dtype=np.uint8)
                pix[0::2] = raw >> 4
                pix[1::2] = raw & 15
                idx[y, x : x + cnt] = pix[:cnt]
                i += take
            else:
                take = cnt + (cnt & 1)
                if i + take > n:
                    raise ValueError("truncated BMP RLE absolute data")
                idx[y, x : x + cnt] = np.frombuffer(
                    data, np.uint8, count=cnt, offset=i
                )
                i += take
            x += cnt


def decode_bmp(payload: bytes) -> np.ndarray:
    """Full pixel decode -> HxWxC uint8 (C=3 RGB for 24-bit and all
    palette depths, C=4 RGBA for 32-bit), rows un-padded, bottom-up
    storage flipped to natural top-down order. BI_RLE8/BI_RLE4 streams
    decompress for real."""
    off, w, h, bpp, top_down, compression = _parse_headers(payload)
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"refusing full decode of {w}x{h} BMP "
            f"(> {MAX_DECODE_PIXELS} px); parse_bmp_header covers metadata"
        )
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if compression in (1, 2):  # BI_RLE8 / BI_RLE4 (always bottom-up)
        pal = _palette(payload, dib_size, bpp)
        idx = _decode_rle(payload[off:], w, h, nibble=(compression == 2))[::-1]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("pixel index outside BMP palette")
        return pal[idx]
    if bpp < 8:  # packed palette indices, MSB-first within each byte
        stride = ((w * bpp + 31) // 32) * 4
        need = stride * h
        body = payload[off : off + need]
        if len(body) < need:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
        bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
        grouped = bits.reshape(h, w, bpp)
        idx = np.zeros((h, w), dtype=np.uint8)
        for b in range(bpp):
            idx = (idx << 1) | grouped[:, :, b]
        if not top_down:
            idx = idx[::-1]
        pal = _palette(payload, dib_size, bpp)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("pixel index outside BMP palette")
        return pal[idx]
    if bpp == 16:  # RGB555 (BI_RGB default) or 555/565 bitfields
        if compression == 3:
            masks = struct.unpack_from("<III", payload, 14 + 40)
        else:
            masks = (0x7C00, 0x3E0, 0x1F)
        stride = (w * 2 + 3) & ~3
        need = stride * h
        body = payload[off : off + need]
        if len(body) < need:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
        px = rows[:, : w * 2].reshape(h, w, 2)
        v = px[..., 0].astype(np.uint16) | (
            px[..., 1].astype(np.uint16) << 8
        )
        if not top_down:
            v = v[::-1]
        g_bits = 6 if masks[1] == 0x7E0 else 5
        r = ((v & masks[0]) >> (10 if g_bits == 5 else 11)).astype(np.uint8)
        g = ((v & masks[1]) >> 5).astype(np.uint8)
        b = (v & masks[2]).astype(np.uint8)
        # GDI-style bit replication expands 5/6-bit channels to 8
        r8 = (r << 3) | (r >> 2)
        b8 = (b << 3) | (b >> 2)
        g8 = ((g << 2) | (g >> 4)) if g_bits == 6 else ((g << 3) | (g >> 2))
        return np.stack([r8, g8, b8], axis=-1)
    c = bpp // 8
    stride = (w * c + 3) & ~3  # rows padded to 4 bytes
    need = stride * h
    body = payload[off:off + need]
    if len(body) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    img = rows[:, : w * c].reshape(h, w, c)
    if not top_down:
        img = img[::-1]
    if bpp == 8:
        pal = _palette(payload, dib_size, bpp)
        idx = img[..., 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("pixel index outside BMP palette")
        return pal[idx]
    # stored BGR(A) -> natural RGB(A)
    out = img.copy()
    out[..., 0], out[..., 2] = img[..., 2], img[..., 0]
    return out


def encode_bmp_rle8(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) uint8 palette indices + (N<=256, 3) RGB palette ->
    BI_RLE8 BMP. Runs of >= 3 use encoded mode, shorter stretches fall
    back to 1-pixel encoded runs (counts 0/1/2 in absolute mode are
    escapes), EOL after every row, EOB at the end — a valid stream any
    GDI-compatible decoder accepts; exists so tests and the synthetic
    corpus exercise the RLE decode path with real fixtures."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or idx.shape[0] == 0 or idx.shape[1] == 0:
        raise ValueError("encode_bmp_rle8 wants a non-empty HxW index map")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be Nx3 with N <= 256")
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("pixel index outside palette")
    h, w = idx.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):  # storage order is bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run < 3:
                run = 1
            out += bytes([run, int(row[x])])
            x += run
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    quads = np.zeros((len(palette), 4), dtype=np.uint8)
    quads[:, 0] = palette[:, 2]
    quads[:, 1] = palette[:, 1]
    quads[:, 2] = palette[:, 0]
    dib = struct.pack(
        "<IiihhIIiiII", 40, w, h, 1, 8, 1, len(out), 2835, 2835,
        len(palette), 0,
    )
    off = 14 + len(dib) + quads.size
    head = struct.pack(
        "<2sIHHI", BMP_MAGIC, off + len(out), 0, 0, off
    )
    return head + dib + quads.tobytes() + bytes(out)


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB (HxWx3) or RGBA (HxWx4) uint8 -> BI_RGB bottom-up BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_bmp wants HxWx3 or HxWx4 uint8")
    h, w, c = img.shape
    bgr = img.copy()
    bgr[..., 0], bgr[..., 2] = img[..., 2], img[..., 0]
    stride = (w * c + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * c] = bgr[::-1].reshape(h, w * c)
    body = rows.tobytes()
    dib = struct.pack(
        "<IiihhIIiiII", 40, w, h, 1, c * 8, 0, len(body), 2835, 2835, 0, 0
    )
    head = struct.pack(
        "<2sIHHI", BMP_MAGIC, 14 + len(dib) + len(body), 0, 0, 14 + len(dib)
    )
    return head + dib + body
