"""Minimal pure-stdlib JPEG codec (numpy for the DCT) for the
multimodal operators.

The container has no PIL/opencv, so the decode seam in
``operators/multimodal.py`` gets a REAL decoder for the format that
dominates a web crawl's image payloads (reference analog: arbitrary
image uploads decode via PIL in ``backend/annotator/routes.py:69-79``
and ``segmentation/utils.py:7-14``). Supported: baseline DCT
(SOF0/SOF1) AND progressive DCT (SOF2 — spectral selection,
successive approximation, EOB runs per T.81 Annex G), 8-bit, huffman
entropy coding, grayscale and YCbCr with sampling factors 1-2 (covers
4:4:4 / 4:2:2 / 4:2:0), restart intervals. Unsupported-but-valid
variants (arithmetic coding, 12-bit, lossless, hierarchical, CMYK)
raise ``NotImplementedError`` and surface as row-level ``no_codec``
status — the honest "needs a real codec library" signal; malformed
payloads raise ``ValueError`` and surface as ``error`` rows, never
task failures.

The encoder (quality-scaled Annex-K tables, optional 4:2:0 and restart
markers) exists so tests and the synthetic corpus get deterministic
REAL JPEG fixtures without any external library. Chroma upsampling is
box/nearest (not libjpeg's fancy upsampling) — this codec pair defines
its own pixel-exact round-trip contract, pinned by tests/test_codecs.py.

Determinism: all arithmetic is numpy float64 einsum + ``np.round``
(half-to-even) with fixed shapes — identical output on every executor;
no RNG, no hash seeds, no library-version-dependent streams.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# decode_jpeg refuses images above this pixel count: huffman entropy
# decode is a per-symbol Python loop, so a single 64-megapixel payload
# would stall a Spark task for tens of seconds with nothing raising.
# Header-only parsing keeps the wider 64M-pixel bound (same trade-off
# as kernels/pngcodec.py).
MAX_DECODE_PIXELS = 1_000_000

# ---------------------------------------------------------------------------
# Annex K tables (ITU T.81 — public standard)
# ---------------------------------------------------------------------------

# zigzag position -> natural (raster) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# standard huffman tables: (bits[1..16], symbol values)
_DC_LUM_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_LUM_VALS = bytes(range(12))
_DC_CHROM_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
_DC_CHROM_VALS = bytes(range(12))
_AC_LUM_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_LUM_VALS = bytes([
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
])
_AC_CHROM_BITS = bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77])
_AC_CHROM_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

# SOF markers this codec decodes: baseline + extended-sequential
# huffman (bitstream-identical at 8-bit) and progressive huffman
# (SOF2, multi-scan spectral selection + successive approximation).
# Remaining valid-but-unsupported frame types (lossless, arithmetic,
# hierarchical) still need a real codec library.
_SOF_SUPPORTED = {0xC0, 0xC1}
_SOF_PROGRESSIVE = {0xC2}
_SOF_UNSUPPORTED = {0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                    0xCD, 0xCE, 0xCF}


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: F = T @ x @ T.T, x = T.T @ F @ T."""
    n = np.arange(8, dtype=np.float64)
    k = n[:, None]
    t = np.cos((2 * n[None, :] + 1) * k * np.pi / 16.0) * 0.5
    t[0, :] = np.sqrt(1.0 / 8.0)
    return t


_T = _dct_basis()


# ---------------------------------------------------------------------------
# marker-level parsing
# ---------------------------------------------------------------------------

def _iter_segments(payload: bytes):
    """Yield (marker, body_offset, body_len) up to and including SOS."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i, n = 2, len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            raise ValueError("marker sync lost")
        while i < n and payload[i] == 0xFF:  # fill bytes
            i += 1
        if i >= n:
            break
        marker = payload[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # no-body markers
        if marker == 0xD9:  # EOI
            return
        if i + 2 > n:
            raise ValueError("truncated marker segment")
        (seg_len,) = struct.unpack_from(">H", payload, i)
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("bad segment length")
        yield marker, i + 2, seg_len - 2
        i += seg_len
        if marker == 0xDA:  # SOS: entropy data follows, caller takes over
            return
    raise ValueError("no SOS/EOI found")


def _parse_sof(payload: bytes, off: int, ln: int):
    if ln < 6:
        raise ValueError("truncated SOF")
    precision, h, w, ncomp = struct.unpack_from(">BHHB", payload, off)
    if precision != 8:
        raise NotImplementedError(f"{precision}-bit JPEG needs a real codec")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad dimensions")
    if ncomp not in (1, 3):
        raise NotImplementedError(
            f"{ncomp}-component JPEG (CMYK?) needs a real codec"
        )
    if ln < 6 + 3 * ncomp:
        raise ValueError("truncated SOF components")
    comps = []
    for c in range(ncomp):
        cid, hv, tq = struct.unpack_from(">BBB", payload, off + 6 + 3 * c)
        hs, vs = hv >> 4, hv & 15
        if not (1 <= hs <= 2 and 1 <= vs <= 2):
            raise NotImplementedError(
                f"sampling factors {hs}x{vs} need a real codec"
            )
        comps.append((cid, hs, vs, tq))
    return w, h, comps


def parse_jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF marker — header-only,
    never touches the entropy-coded body (cheap metadata even on
    multi-MB payloads). Baseline and progressive parse; arithmetic/
    12-bit/lossless raise NotImplementedError (-> status='no_codec')."""
    for marker, off, ln in _iter_segments(payload):
        if marker in _SOF_SUPPORTED or marker in _SOF_PROGRESSIVE:
            w, h, comps = _parse_sof(payload, off, ln)
            return w, h, len(comps)
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                "non-baseline JPEG (arithmetic/lossless/hierarchical) "
                "needs a real codec"
            )
    raise ValueError("no SOF marker before SOS")


# ---------------------------------------------------------------------------
# huffman decode
# ---------------------------------------------------------------------------

_DEC_LUT_CACHE: dict[tuple[bytes, bytes], tuple[list, list]] = {}


def _dec_lut(bits: bytes, vals: bytes):
    """16-bit-peek LUT: peek -> (symbol, code length). Canonical codes
    per T.81 C.2; invalid prefixes keep length 0 (-> ValueError)."""
    key = (bytes(bits), bytes(vals))
    hit = _DEC_LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(65536, dtype=np.int32)
    ln = np.zeros(65536, dtype=np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("huffman bits/vals mismatch")
            start = code << (16 - length)
            end = start + (1 << (16 - length))
            if end > 65536:
                raise ValueError("huffman code overflow")
            sym[start:end] = vals[k]
            ln[start:end] = length
            code += 1
            k += 1
        code <<= 1
    out = (sym.tolist(), ln.tolist())
    _DEC_LUT_CACHE[key] = out
    return out


class _BitReader:
    __slots__ = ("data", "pos", "buf", "nbits", "overrun")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0
        self.overrun = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.buf = (self.buf << 8) | 0xFF  # T.81 pad bits are 1s
                self.overrun += 1
                if self.overrun > 8:
                    raise ValueError("truncated entropy segment")
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1
        return v


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _split_entropy(payload: bytes, start: int):
    """Entropy-coded data from SOS body start: unstuff 0xFF00, split on
    RSTn markers. Returns list of segments. Also returns the offset one
    past the entropy data (the next marker's 0xFF), so multi-scan
    (progressive) callers can resume marker-level parsing there."""
    segs, cur, i, n = [], bytearray(), start, len(payload)
    end = n
    while True:
        j = payload.find(b"\xff", i)
        if j < 0:
            cur += payload[i:]
            break
        cur += payload[i:j]
        m = payload[j + 1] if j + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif m == 0xFF:
            # T.81 B.1.1.2: markers may be preceded by any number of
            # 0xFF fill bytes — skip ONE fill byte and reclassify from
            # the next (a run collapses one byte per loop turn).
            i = j + 1
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            end = j  # EOI or next marker (incl. progressive next-scan)
            break
    segs.append(bytes(cur))
    return segs, end


def _decode_block(br: _BitReader, dc_lut, ac_lut, pred: int):
    """One 8x8 block -> (new DC pred, coeffs in ZIGZAG order)."""
    dc_sym, dc_len = dc_lut
    ac_sym, ac_len = ac_lut
    peek = br.peek16()
    s, l = dc_sym[peek], dc_len[peek]
    if l == 0:
        raise ValueError("invalid DC huffman code")
    br.skip(l)
    pred += _extend(br.receive(s), s)
    coef = [0] * 64
    coef[0] = pred
    k = 1
    while k < 64:
        peek = br.peek16()
        sym, l = ac_sym[peek], ac_len[peek]
        if l == 0:
            raise ValueError("invalid AC huffman code")
        br.skip(l)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        s = sym & 15
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        coef[k] = _extend(br.receive(s), s)
        k += 1
    return pred, coef


# ---------------------------------------------------------------------------
# progressive scan block decoders (T.81 Annex G, huffman)
# ---------------------------------------------------------------------------

def _dc_first_block(br: _BitReader, dc_lut, pred: int) -> int:
    """DC first scan (Ah=0): one huffman DC diff; caller applies the
    point transform (``pred << Al``) when storing."""
    dc_sym, dc_len = dc_lut
    peek = br.peek16()
    s, l = dc_sym[peek], dc_len[peek]
    if l == 0:
        raise ValueError("invalid DC huffman code")
    br.skip(l)
    return pred + _extend(br.receive(s), s)


def _ac_first_block(br: _BitReader, ac_lut, zz, ss: int, se: int,
                    al: int, eobrun: int) -> int:
    """AC first scan (Ah=0) for one block's band [ss, se]; ``zz`` is the
    block's zigzag-order coefficient slice. Returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    ac_sym, ac_len = ac_lut
    k = ss
    while k <= se:
        peek = br.peek16()
        sym, l = ac_sym[peek], ac_len[peek]
        if l == 0:
            raise ValueError("invalid AC huffman code")
        br.skip(l)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+bits all-done bands
                eobrun = 1 << r
                if r:
                    eobrun += br.receive(r)
                return eobrun - 1
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC index overflow in scan band")
            zz[k] = _extend(br.receive(s), s) << al
            k += 1
    return 0


def _ac_refine_block(br: _BitReader, ac_lut, zz, ss: int, se: int,
                     al: int, eobrun: int) -> int:
    """AC refinement scan (Ah=Al+1): append one correction bit to each
    already-nonzero coefficient in the band, insert newly-nonzero
    coefficients as +/-(1<<Al). T.81 G.1.2.3 / figure G.7."""
    p1 = 1 << al
    m1 = -p1
    ac_sym, ac_len = ac_lut
    k = ss
    if eobrun == 0:
        while k <= se:
            peek = br.peek16()
            sym, l = ac_sym[peek], ac_len[peek]
            if l == 0:
                raise ValueError("invalid AC huffman code")
            br.skip(l)
            r, s = sym >> 4, sym & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break  # band tail handled below, then eobrun -= 1
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude category")
                val = p1 if br.receive(1) else m1
            # advance to the target position, consuming one correction
            # bit per already-nonzero coefficient passed over
            while k <= se:
                if zz[k] != 0:
                    if br.receive(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                else:
                    if r == 0:
                        if val:
                            zz[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of this band
            if zz[k] != 0 and br.receive(1) and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_baseline_scan(segs, scan, comps, htabs, coefs,
                          mcus_x, mcus_y, restart_interval):
    """One interleaved full-spectrum scan (the whole baseline image)."""
    plan = []
    for ci, td, ta in scan:
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError("missing huffman table")
        _cid, hs, vs, _tq = comps[ci]
        plan.append((ci, hs, vs, htabs[(0, td)], htabs[(1, ta)]))
    seg_idx = 0
    br = _BitReader(segs[0])
    preds = [0] * len(plan)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = [0] * len(plan)
        my, mx = divmod(mcu, mcus_x)
        for pi, (ci, hs, vs, dc_lut, ac_lut) in enumerate(plan):
            for by in range(vs):
                for bx in range(hs):
                    preds[pi], block = _decode_block(
                        br, dc_lut, ac_lut, preds[pi]
                    )
                    coefs[ci][my * vs + by, mx * hs + bx] = block


def _decode_progressive_scan(segs, scan, comps, htabs, coefs, bdims,
                             mcus_x, mcus_y, restart_interval,
                             ss, se, ah, al):
    """One progressive scan: DC (interleaved or single-component) or AC
    (always single-component), first pass (Ah=0) or refinement."""
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be one component")
        if se > 63 or ss > se:
            raise ValueError("bad spectral selection band")
    if al > 13:
        raise ValueError("bad successive approximation shift")
    dc_luts = {}
    ac_lut = None
    if ss == 0 and ah == 0:
        for ci, td, _ta in scan:
            if (0, td) not in htabs:
                raise ValueError("missing huffman table")
            dc_luts[ci] = htabs[(0, td)]
    if ss > 0:
        ta = scan[0][2]
        if (1, ta) not in htabs:
            raise ValueError("missing huffman table")
        ac_lut = htabs[(1, ta)]

    interleaved = ss == 0 and len(scan) > 1
    if interleaved:
        total = mcus_x * mcus_y
    else:
        bh, bw = bdims[scan[0][0]]
        total = bh * bw
    seg_idx = 0
    br = _BitReader(segs[0])
    preds = {ci: 0 for ci, _td, _ta in scan}
    eobrun = 0
    for mcu in range(total):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_idx])
            preds = {ci: 0 for ci, _td, _ta in scan}
            eobrun = 0
        if interleaved:  # DC scan over MCUs
            my, mx = divmod(mcu, mcus_x)
            for ci, _td, _ta in scan:
                _cid, hs, vs, _tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        block = coefs[ci][my * vs + by, mx * hs + bx]
                        if ah == 0:
                            preds[ci] = _dc_first_block(
                                br, dc_luts[ci], preds[ci]
                            )
                            block[0] = preds[ci] << al
                        elif br.receive(1):
                            block[0] |= 1 << al
        else:  # single component, MCU = one block, row-major
            ci = scan[0][0]
            by, bx = divmod(mcu, bdims[ci][1])
            block = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    preds[ci] = _dc_first_block(br, dc_luts[ci], preds[ci])
                    block[0] = preds[ci] << al
                elif br.receive(1):
                    block[0] |= 1 << al
            elif ah == 0:
                eobrun = _ac_first_block(br, ac_lut, block, ss, se,
                                         al, eobrun)
            else:
                eobrun = _ac_refine_block(br, ac_lut, block, ss, se,
                                          al, eobrun)


# ---------------------------------------------------------------------------
# full decode
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> HxWxC uint8 (C=1 gray, C=3 RGB).

    Progressive (SOF2) implements T.81 Annex G huffman decode:
    spectral-selection bands, successive approximation (DC and AC first
    + refinement scans), EOB runs, restart intervals. Scans accumulate
    into per-component zigzag coefficient planes; one IDCT runs at the
    end. Reference analog: arbitrary crawl images decode via PIL in
    ``backend/annotator/routes.py:69-79``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    sof = None
    progressive = False
    restart_interval = 0
    coefs: list = []   # per comp: zigzag-order (BY, BX, 64) int64
    bdims: list = []   # per comp TRUE block dims (bh, bw) — non-
    #                    interleaved scans cover these, not the padded
    #                    interleaved grid
    geom = None        # (comps, hmax, vmax, mcus_x, mcus_y)
    scan_done = False
    i, n = 2, len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            raise ValueError("marker sync lost")
        while i < n and payload[i] == 0xFF:  # fill bytes
            i += 1
        if i >= n:
            break
        marker = payload[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 2 > n:
            raise ValueError("truncated marker segment")
        (seg_len,) = struct.unpack_from(">H", payload, i)
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("bad segment length")
        off, ln = i + 2, seg_len - 2
        i += seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            p, end = off, off + ln
            while p < end:
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                if p + 65 > end:
                    raise ValueError("truncated DQT")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz.astype(np.int64)
                qtabs[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p, end = off, off + ln
            while p < end:
                tc, th = payload[p] >> 4, payload[p] & 15
                if p + 17 > end:
                    raise ValueError("truncated DHT")
                bits = payload[p + 1 : p + 17]
                nvals = sum(bits)
                if p + 17 + nvals > end:
                    raise ValueError("truncated DHT values")
                vals = payload[p + 17 : p + 17 + nvals]
                htabs[(tc, th)] = _dec_lut(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, off)
        elif marker in _SOF_SUPPORTED or marker in _SOF_PROGRESSIVE:
            if sof is not None:
                raise ValueError("multiple SOF markers")
            progressive = marker in _SOF_PROGRESSIVE
            sof = _parse_sof(payload, off, ln)
            w, h, comps = sof
            if w * h > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"image too large for the stdlib entropy loop "
                    f"({w}x{h}); swap in PIL/opencv for full-size decode"
                )
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            geom = (comps, hmax, vmax, mcus_x, mcus_y)
            for _cid, hs, vs, _tq in comps:
                coefs.append(
                    np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
                )
                cw = -(-(w * hs) // hmax)
                ch = -(-(h * vs) // vmax)
                bdims.append((-(-ch // 8), -(-cw // 8)))
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                "non-baseline JPEG needs a real codec"
            )
        elif marker == 0xCC:
            raise NotImplementedError("arithmetic coding conditioning")
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            comps, hmax, vmax, mcus_x, mcus_y = geom
            if ln < 1:
                raise ValueError("truncated SOS")
            ns = payload[off]
            if ln < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS")
            by_cid = {c[0]: idx for idx, c in enumerate(comps)}
            scan = []  # (comp index, Td, Ta)
            for c in range(ns):
                cid = payload[off + 1 + 2 * c]
                t = payload[off + 2 + 2 * c]
                if cid not in by_cid:
                    raise ValueError(f"scan references unknown comp {cid}")
                scan.append((by_cid[cid], t >> 4, t & 15))
            if len({ci for ci, _td, _ta in scan}) != ns:
                # with ns == len(comps) this also restores the old
                # "scan does not cover component" guarantee
                raise ValueError("duplicate component in scan")
            ss = payload[off + 1 + 2 * ns]
            se = payload[off + 2 + 2 * ns]
            ahal = payload[off + 3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            segs, i = _split_entropy(payload, i)
            if not progressive:
                if ns != len(comps):
                    raise NotImplementedError("multi-scan sequential JPEG")
                _decode_baseline_scan(
                    segs, scan, comps, htabs, coefs,
                    mcus_x, mcus_y, restart_interval,
                )
                scan_done = True
                break  # baseline: single scan holds everything
            _decode_progressive_scan(
                segs, scan, comps, htabs, coefs, bdims,
                mcus_x, mcus_y, restart_interval, ss, se, ah, al,
            )
            scan_done = True
        # APPn/COM/DNL etc.: body already skipped

    if sof is None or not scan_done:
        raise ValueError("missing SOF/SOS")
    w, h, comps = sof
    _, hmax, vmax, _, _ = geom

    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError(f"missing quant table {tq}")
        qtab = qtabs[tq]
        zz_arr = coefs[ci]
        nat = np.zeros_like(zz_arr)
        nat[:, :, ZIGZAG] = zz_arr
        by, bx = nat.shape[:2]
        f = (nat.reshape(by * bx, 8, 8).astype(np.float64)
             * qtab[None, :, :])
        pix = np.einsum("ab,nbc,cd->nad", _T.T, f, _T)
        pix = np.clip(np.round(pix + 128.0), 0, 255)
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full resolution (box replication), crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _scaled_tables(quality: int):
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_QUANT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((_QUANT_CHROM * scale + 50) // 100, 1, 255)
    return lum, chrom


def _enc_table(bits: bytes, vals: bytes) -> dict[int, tuple[int, int]]:
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    __slots__ = ("out", "buf", "n")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.buf >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.buf &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


def _pad_plane(plane: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Edge-replicate pad to exactly (th, tw)."""
    h, w = plane.shape
    if h < th:
        plane = np.concatenate(
            [plane, np.repeat(plane[-1:, :], th - h, axis=0)], axis=0
        )
    if w < tw:
        plane = np.concatenate(
            [plane, np.repeat(plane[:, -1:], tw - w, axis=1)], axis=1
        )
    return plane


def _blocks_zz(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H,W) plane -> (BY, BX, 64) quantized zigzag coefficients."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    x = (
        plane.reshape(by, 8, bx, 8)
        .transpose(0, 2, 1, 3)
        .reshape(by * bx, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    f = np.einsum("ab,nbc,cd->nad", _T, x, _T.T)
    q = np.round(f / qtab[None, :, :]).astype(np.int64)
    # clamp to the AC/DC category range the standard tables encode
    q = np.clip(q, -1023, 1023)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def _encode_block(bw: _BitWriter, zz, pred: int, dc_tbl, ac_tbl) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, length = dc_tbl[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_tbl[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_tbl[0x00]
        bw.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _prepare_encode(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front end: color convert, subsample, pad, DCT +
    quantize. Returns (h, w, c, comp_spec, zz_all, lum_q, chrom_q,
    mcus_x, mcus_y) — zz_all holds per-comp (BY, BX, 64) quantized
    zigzag coefficients on the padded interleaved MCU grid."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError(f"unsupported channel count {c}")
    if w == 0 or h == 0:
        raise ValueError("empty image")
    lum_q, chrom_q = _scaled_tables(quality)

    if c == 1:
        comp_spec = [(1, 1, 1, 0)]
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        hs_y = vs_y = 2 if subsample else 1
        comp_spec = [(1, hs_y, vs_y, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        rf = img.astype(np.float64)
        r, g, b = rf[:, :, 0], rf[:, :, 1], rf[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            he, we = -(-h // 2) * 2, -(-w // 2) * 2
            cb = _pad_plane(cb, he, we)
            cr = _pad_plane(cr, he, we)
            cb = cb.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    hmax = max(s[1] for s in comp_spec)
    vmax = max(s[2] for s in comp_spec)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    zz_all = []
    for i, (_cid, hs, vs, tq) in enumerate(comp_spec):
        qtab = lum_q if tq == 0 else chrom_q
        plane = _pad_plane(planes[i], mcus_y * vs * 8, mcus_x * hs * 8)
        # chroma of a subsampled image is already half-res: its own MCU
        # coverage is mcus_y*vs(=1) blocks high — _pad_plane above sizes
        # every plane to exactly its block grid
        plane = np.clip(np.round(plane), 0, 255)
        zz_all.append(_blocks_zz(plane, qtab))
    return h, w, c, comp_spec, zz_all, lum_q, chrom_q, mcus_x, mcus_y


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxW / HxWx1 / HxWx3 uint8 array -> baseline JPEG bytes.

    ``subsample=True`` emits 4:2:0 (exercises the decoder's 2x2
    sampling path); ``restart_interval`` emits DRI + RSTn markers."""
    (h, w, c, comp_spec, zz_all, lum_q, chrom_q,
     mcus_x, mcus_y) = _prepare_encode(img, quality, subsample)

    dc0 = _enc_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac0 = _enc_table(_AC_LUM_BITS, _AC_LUM_VALS)
    dc1 = _enc_table(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac1 = _enc_table(_AC_CHROM_BITS, _AC_CHROM_VALS)
    enc_tbls = [
        (dc0, ac0) if tq == 0 else (dc1, ac1)
        for _cid, _hs, _vs, tq in comp_spec
    ]

    bw = _BitWriter()
    body = bytearray()
    preds = [0] * len(comp_spec)
    total = mcus_x * mcus_y
    rst = 0
    for mcu in range(total):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            body += bw.out
            body += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(comp_spec)
        my, mx = divmod(mcu, mcus_x)
        for ci, (_cid, hs, vs, _tq) in enumerate(comp_spec):
            dct, act = enc_tbls[ci]
            for by in range(vs):
                for bx in range(hs):
                    preds[ci] = _encode_block(
                        bw, zz_all[ci][my * vs + by, mx * hs + bx],
                        preds[ci], dct, act,
                    )
    bw.flush()
    body += bw.out

    zz_lum = np.zeros(64, dtype=np.uint8)
    zz_lum[np.arange(64)] = lum_q.reshape(64)[ZIGZAG]
    dqt = bytes([0x00]) + zz_lum.tobytes()
    if c == 3:
        zz_ch = np.zeros(64, dtype=np.uint8)
        zz_ch[np.arange(64)] = chrom_q.reshape(64)[ZIGZAG]
        dqt += bytes([0x01]) + zz_ch.tobytes()

    sof = struct.pack(">BHHB", 8, h, w, len(comp_spec))
    for cid, hs, vs, tq in comp_spec:
        sof += bytes([cid, (hs << 4) | vs, tq])

    dht = (bytes([0x00]) + _DC_LUM_BITS + _DC_LUM_VALS
           + bytes([0x10]) + _AC_LUM_BITS + _AC_LUM_VALS)
    if c == 3:
        dht += (bytes([0x01]) + _DC_CHROM_BITS + _DC_CHROM_VALS
                + bytes([0x11]) + _AC_CHROM_BITS + _AC_CHROM_VALS)

    sos = bytes([len(comp_spec)])
    for i, (cid, _hs, _vs, tq) in enumerate(comp_spec):
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += bytes([0, 63, 0])

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, dqt)
    out += _seg(0xC0, sof)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encode (T.81 Annex G scans, Annex K.2 optimal tables)
# ---------------------------------------------------------------------------

def _build_huffman(freq) -> tuple[bytes, bytes]:
    """Optimal huffman (BITS, HUFFVAL) from 256 symbol frequencies —
    T.81 Annex K.2 (figures K.1-K.3): pairwise least-frequency merge,
    fold code lengths above 16, reserved symbol 256 guarantees no
    real code is all ones."""
    freq = list(freq) + [1]
    if sum(freq) == 1:
        raise ValueError("cannot build a huffman table with no symbols")
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = v2 = -1
        f1 = f2 = None
        for s in range(257):  # smallest freq; largest symbol on ties
            if freq[s] and (f1 is None or freq[s] <= f1):
                f1, v1 = freq[s], s
        for s in range(257):
            if s != v1 and freq[s] and (f2 is None or freq[s] <= f2):
                f2, v2 = freq[s], s
        if v2 < 0:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for s in range(257):
        if codesize[s]:
            if codesize[s] > 32:  # libjpeg MAX_CLEN guard
                raise ValueError("huffman code length overflow")
            bits[codesize[s]] += 1
    i = 32  # fold lengths > 16 (figure K.3)
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16  # drop the reserved symbol's (longest) code
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    # HUFFVAL keeps pre-fold codesize order over the FULL 1..32 range
    # (T.81 K.4 / libjpeg): symbols folded down from >16 bits must not
    # be dropped — bits[] already counts them at their final lengths
    huffval = bytes(
        s
        for size in range(1, 33)
        for s in range(256)
        if codesize[s] == size
    )
    return bytes(bits[1:17]), huffval


class _FreqSink:
    """Tally pass: count huffman symbols, ignore appended bits."""

    __slots__ = ("freq",)

    def __init__(self):
        self.freq = [0] * 256

    def sym(self, s: int) -> None:
        self.freq[s] += 1

    def bits(self, v: int, n: int) -> None:
        pass


class _WriteSink:
    """Emit pass: huffman-code symbols into the shared bit writer."""

    __slots__ = ("bw", "table")

    def __init__(self, bw: _BitWriter, table: dict):
        self.bw = bw
        self.table = table

    def sym(self, s: int) -> None:
        code, length = self.table[s]
        self.bw.write(code, length)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v & ((1 << n) - 1), n)


def _emit_dc_scan(scan_comps, comp_spec, zz_all, mcus_x, mcus_y,
                  ah, al, sinks, restart_cb, restart_interval):
    """DC scan, interleaved over MCUs (or the degenerate 1-comp grid).
    Ah=0: huffman-coded point-transformed diffs; Ah>0: one raw
    refinement bit (bit Al, two's complement) per block."""
    preds = {ci: 0 for ci in scan_comps}
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            restart_cb()
            preds = {ci: 0 for ci in scan_comps}
        my, mx = divmod(mcu, mcus_x)
        for ci in scan_comps:
            _cid, hs, vs, _tq = comp_spec[ci]
            sink = sinks[ci]
            for by in range(vs):
                for bx in range(hs):
                    dc = int(zz_all[ci][my * vs + by, mx * hs + bx, 0])
                    if ah == 0:
                        t = dc >> al  # arithmetic shift per G.1.2.1
                        diff = t - preds[ci]
                        preds[ci] = t
                        s = abs(diff).bit_length()
                        sink.sym(s)
                        sink.bits(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
                    else:
                        sink.bits((dc >> al) & 1, 1)


def _emit_ac_first_scan(zz_comp, bh, bw, ss, se, al, sink,
                        restart_cb, restart_interval):
    """AC first scan (Ah=0) over one component's true block grid,
    with EOB-run accumulation (T.81 G.1.2.2 / libjpeg
    encode_mcu_AC_first — public algorithm)."""
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            sink.sym(nb << 4)
            sink.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0

    for mcu in range(bh * bw):
        if restart_interval and mcu and mcu % restart_interval == 0:
            emit_eobrun()
            restart_cb()
        by, bx = divmod(mcu, bw)
        zz = zz_comp[by, bx]
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = abs(v) >> al  # magnitude point transform (trunc to 0)
            if t == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                sink.sym(0xF0)
                r -= 16
            s = t.bit_length()
            sink.sym((r << 4) | s)
            sink.bits(t if v > 0 else (1 << s) - 1 - t, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _emit_ac_refine_scan(zz_comp, bh, bw, ss, se, al, sink,
                         restart_cb, restart_interval):
    """AC refinement scan (Ah=Al+1): correction bits for already-
    nonzero coefficients, run/1 codes for newly-nonzero ones,
    correction bits buffered across EOB runs (T.81 G.1.2.3 /
    libjpeg encode_mcu_AC_refine — public algorithm)."""
    eobrun = 0
    pending: list[int] = []  # correction bits held with the EOB run

    def emit_eobrun():
        nonlocal eobrun, pending
        if eobrun:
            nb = eobrun.bit_length() - 1
            sink.sym(nb << 4)
            sink.bits(eobrun & ((1 << nb) - 1), nb)
            for b in pending:
                sink.bits(b, 1)
            pending = []
            eobrun = 0

    for mcu in range(bh * bw):
        if restart_interval and mcu and mcu % restart_interval == 0:
            emit_eobrun()
            restart_cb()
        by, bx = divmod(mcu, bw)
        zz = zz_comp[by, bx]
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in vals]
        eob = -1  # index (into band) of last NEWLY nonzero coefficient
        for idx, t in enumerate(absv):
            if t == 1:
                eob = idx
        r = 0
        br_bits: list[int] = []  # correction bits since last symbol
        for idx, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and idx <= eob:
                emit_eobrun()
                sink.sym(0xF0)
                r -= 16
                for b in br_bits:
                    sink.bits(b, 1)
                br_bits = []
            if t > 1:  # history coefficient: one correction bit
                br_bits.append(t & 1)
                continue
            emit_eobrun()
            sink.sym((r << 4) | 1)
            sink.bits(1 if vals[idx] > 0 else 0, 1)
            for b in br_bits:
                sink.bits(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            pending.extend(br_bits)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxW / HxWx1 / HxWx3 uint8 array -> progressive (SOF2) JPEG.

    Scan script: interleaved DC first (Al=1), per-component AC bands
    1-5 and 6-63 (Al=1), then DC and AC refinement scans down to Al=0 —
    exercising all four Annex G scan kinds with full reconstruction.
    Huffman tables are per-scan optimal (Annex K.2) since the Annex K
    default AC tables lack the EOBn symbols progressive scans emit.
    Same quantized coefficients as ``encode_jpeg`` at equal quality/
    subsampling, so decoded pixels match the baseline file exactly."""
    (h, w, c, comp_spec, zz_all, lum_q, chrom_q,
     mcus_x, mcus_y) = _prepare_encode(img, quality, subsample)
    hmax = max(s[1] for s in comp_spec)
    vmax = max(s[2] for s in comp_spec)
    bdims = []
    for _cid, hs, vs, _tq in comp_spec:
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        bdims.append((-(-ch // 8), -(-cw // 8)))

    ncomp = len(comp_spec)
    all_comps = list(range(ncomp))
    # (kind, comps, Ss, Se, Ah, Al)
    scans = [("dc", all_comps, 0, 0, 0, 1)]
    scans += [("ac_first", [ci], 1, 5, 0, 1) for ci in all_comps]
    scans += [("ac_first", [ci], 6, 63, 0, 1) for ci in all_comps]
    scans += [("dc", all_comps, 0, 0, 1, 0)]
    scans += [("ac_refine", [ci], 1, 5, 1, 0) for ci in all_comps]
    scans += [("ac_refine", [ci], 6, 63, 1, 0) for ci in all_comps]

    zz_lum = np.zeros(64, dtype=np.uint8)
    zz_lum[np.arange(64)] = lum_q.reshape(64)[ZIGZAG]
    dqt = bytes([0x00]) + zz_lum.tobytes()
    if c == 3:
        zz_ch = np.zeros(64, dtype=np.uint8)
        zz_ch[np.arange(64)] = chrom_q.reshape(64)[ZIGZAG]
        dqt += bytes([0x01]) + zz_ch.tobytes()

    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid, hs, vs, tq in comp_spec:
        sof += bytes([cid, (hs << 4) | vs, tq])

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, dqt)
    out += _seg(0xC2, sof)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    for kind, scomps, ss, se, ah, al in scans:
        # table id per comp in scan: lum -> 0, chrom -> 1 (shared)
        tids = {ci: (0 if comp_spec[ci][3] == 0 else 1) for ci in scomps}

        def run(sinks, restart_cb):
            if kind == "dc":
                _emit_dc_scan(scomps, comp_spec, zz_all, mcus_x, mcus_y,
                              ah, al, sinks, restart_cb, restart_interval)
            else:
                ci = scomps[0]
                bh, bw_ = bdims[ci]
                fn = (_emit_ac_first_scan if kind == "ac_first"
                      else _emit_ac_refine_scan)
                fn(zz_all[ci], bh, bw_, ss, se, al, sinks[ci],
                   restart_cb, restart_interval)

        needs_tables = not (kind == "dc" and ah > 0)
        tables = {}
        if needs_tables:
            tally = {tid: _FreqSink() for tid in set(tids.values())}
            run({ci: tally[tids[ci]] for ci in scomps}, lambda: None)
            dht = b""
            tc = 0 if kind == "dc" else 1
            for tid in sorted(tally):
                bits, vals = _build_huffman(tally[tid].freq)
                dht += bytes([(tc << 4) | tid]) + bits + vals
                tables[tid] = _enc_table(bits, vals)
            out += _seg(0xC4, dht)

        sos = bytes([len(scomps)])
        for ci in scomps:
            cid = comp_spec[ci][0]
            tid = tids[ci] if needs_tables else 0
            sos += bytes([cid, (tid << 4) if kind == "dc" else tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)

        bw = _BitWriter()
        body = bytearray()
        rst = [0]

        def restart_cb():
            bw.flush()
            body.extend(bw.out)
            body.extend(bytes([0xFF, 0xD0 + (rst[0] & 7)]))
            rst[0] += 1
            bw.out = bytearray()
            bw.buf = 0
            bw.n = 0

        if needs_tables:
            sinks = {ci: _WriteSink(bw, tables[tids[ci]]) for ci in scomps}
        else:  # DC refinement: raw bits only, no huffman coding
            sinks = {ci: _WriteSink(bw, {}) for ci in scomps}
        run(sinks, restart_cb)
        bw.flush()
        body.extend(bw.out)
        out += body

    out += b"\xff\xd9"
    return bytes(out)
