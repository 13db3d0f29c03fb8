"""Stdlib PNG/WAV codec kernels: round-trips, every scanline filter,
and the Spark operators running on REAL container payloads."""

import struct
import zlib

import numpy as np
import pytest

from win64_local_ocr_tool_spark.kernels.pngcodec import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    parse_png_header,
)
from win64_local_ocr_tool_spark.kernels.wavcodec import (
    decode_wav,
    encode_wav,
    parse_wav_header,
)


def _rand_img(h, w, c, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    img = _rand_img(13, 17, channels, seed=channels)
    payload = encode_png(img)
    assert payload[:8] == PNG_MAGIC
    assert parse_png_header(payload) == (17, 13, channels)
    out = decode_png(payload)
    assert out.shape == (13, 17, channels)
    assert (out == img).all()


def _png_with_filters(img, ftypes):
    """Encode img applying a chosen filter type per scanline — exercises
    the decoder's unfilter paths independently of our encoder (which
    always emits filter 0)."""
    h, w, c = img.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[c]
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        line = flat[y]
        prior = flat[y - 1] if y else np.zeros(stride, np.int32)
        filt = np.zeros(stride, np.int32)
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prior[x]
            cc = prior[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (line[x] - pred) & 255
        raw += bytes([f]) + filt.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_decoder_handles_every_filter_type(channels):
    img = _rand_img(10, 9, channels, seed=7 + channels)
    payload = _png_with_filters(img, ftypes=[0, 1, 2, 3, 4])
    out = decode_png(payload)
    assert (out == img).all()


def test_png_rejects_unsupported_variants():
    img = _rand_img(4, 4, 3, seed=1)
    good = encode_png(img)
    # flip bit depth to 16 inside IHDR -> must raise, not mis-decode
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(ValueError):
        parse_png_header(bytes(bad))
    with pytest.raises(ValueError):
        parse_png_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_wav_roundtrip():
    rate = 16000
    samples = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype("<i2")
    payload = encode_wav(rate, samples)
    assert parse_wav_header(payload) == (rate, 1000, 1, 2)
    got_rate, got = decode_wav(payload)
    assert got_rate == rate
    assert (got[:, 0] == samples).all()


def test_media_metadata_on_real_png_and_wav(spark):
    from win64_local_ocr_tool_spark.operators.multimodal import (
        media_metadata,
        render_png,
        render_wav,
    )

    df = spark.createDataFrame(
        [
            (1, render_png(40, 30, 3, seed=5)),
            (2, render_wav(16000, 800, seed=5)),
        ],
        schema="media_id long, payload binary",
    )
    meta = {r["media_id"]: r for r in media_metadata(df).collect()}
    png = meta[1]
    assert (png["container"], png["status"], png["kind"]) == ("png", "ok", "image")
    assert (png["width"], png["height"], png["n_channels"]) == (40, 30, 3)
    wav = meta[2]
    assert (wav["container"], wav["status"], wav["kind"]) == ("wav", "ok", "audio")
    assert wav["sample_rate"] == 16000


def test_media_resize_on_real_png(spark):
    from win64_local_ocr_tool_spark.operators.multimodal import (
        media_resize,
        render_png,
    )

    src = render_png(40, 30, 3, seed=9)
    df = spark.createDataFrame(
        [(1, src)], schema="media_id long, payload binary"
    )
    row = media_resize(df, 16, 12).collect()[0]
    assert row["status"] == "ok"
    out = decode_png(bytes(row["payload"]))
    img = decode_png(src)
    ys = (np.arange(12) * 30) // 12
    xs = (np.arange(16) * 40) // 16
    assert (out == img[ys][:, xs]).all()


def test_png_decode_refuses_oversize_images(spark):
    """A well-formed multi-megapixel PNG must raise (bounded stdlib
    unfilter loop) and surface as an error row in the resize operator,
    never a minutes-long task stall."""
    import struct as _struct
    import zlib as _zlib

    from win64_local_ocr_tool_spark.kernels.pngcodec import (
        MAX_DECODE_PIXELS,
        PNG_MAGIC,
        parse_png_header,
    )
    from win64_local_ocr_tool_spark.operators.multimodal import media_resize

    # hand-build a header-valid 2000x2000 gray PNG (4M pixels) with a
    # tiny bogus body — decode must refuse on dimensions BEFORE touching
    # the body
    w = h = 2000
    assert w * h > MAX_DECODE_PIXELS
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(t, d):
        return (
            _struct.pack(">I", len(d)) + t + d
            + _struct.pack(">I", _zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    payload = (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    # header-only metadata parse still works (wider bound)
    assert parse_png_header(payload) == (2000, 2000, 1)
    with pytest.raises(ValueError):
        decode_png(payload)
    df = spark.createDataFrame(
        [(1, payload)], schema="media_id long, payload binary"
    )
    row = media_resize(df, 8, 8).collect()[0]
    assert row["status"] == "error"


# ---------------------------------------------------------------------------
# baseline-JPEG codec (kernels/jpegcodec.py)
# ---------------------------------------------------------------------------

from win64_local_ocr_tool_spark.kernels.jpegcodec import (  # noqa: E402
    JPEG_MAGIC,
    MAX_DECODE_PIXELS as JPEG_MAX_DECODE_PIXELS,
    decode_jpeg,
    encode_jpeg,
    parse_jpeg_header,
)


def _smooth_img(h, w, c, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [((xx * 2 + yy * 3 + seed + k * 37) // 4) % 200 + 20
         for k in range(c)],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_flat_roundtrip_exact():
    """Flat blocks have only a DC coefficient — the lossy pipeline
    must reproduce them EXACTLY (any drift means broken level shift,
    quant, or IDCT)."""
    for val, c in [(128, 1), (0, 1), (255, 1), (200, 3), (7, 3)]:
        img = np.full((16, 24, c), val, np.uint8)
        payload = encode_jpeg(img, quality=85)
        assert payload[:3] == JPEG_MAGIC
        assert parse_jpeg_header(payload) == (24, 16, c)
        out = decode_jpeg(payload)
        assert out.shape == (16, 24, c)
        assert (out == img).all(), (val, c)


@pytest.mark.parametrize("channels", [1, 3])
def test_jpeg_smooth_roundtrip_bounded_error(channels):
    img = _smooth_img(40, 56, channels, seed=3)
    payload = encode_jpeg(img, quality=90)
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 8, err.max()


def test_jpeg_420_subsampling_and_odd_dims():
    """4:2:0 exercises the decoder's 2x2 sampling-factor path; odd
    dimensions exercise MCU padding + crop on both sides."""
    img = _smooth_img(37, 53, 3, seed=5)
    payload = encode_jpeg(img, quality=85, subsample=True)
    assert parse_jpeg_header(payload) == (53, 37, 3)
    out = decode_jpeg(payload)
    assert out.shape == (37, 53, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 16, err.max()


def test_jpeg_restart_markers_change_nothing():
    """DRI/RSTn is a resilience feature — decoded pixels must be
    IDENTICAL with and without restart intervals (same coefficients,
    same IDCT)."""
    img = _smooth_img(32, 48, 3, seed=9)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 2, 5):
        with_rst = decode_jpeg(
            encode_jpeg(img, quality=85, restart_interval=ri)
        )
        assert (with_rst == plain).all(), ri
    # and combined with subsampling
    a = decode_jpeg(encode_jpeg(img, quality=80, subsample=True))
    b = decode_jpeg(
        encode_jpeg(img, quality=80, subsample=True, restart_interval=3)
    )
    assert (a == b).all()


def test_jpeg_decode_deterministic():
    img = _smooth_img(24, 40, 3, seed=11)
    payload = encode_jpeg(img, quality=75, subsample=True)
    assert payload == encode_jpeg(img, quality=75, subsample=True)
    assert (decode_jpeg(payload) == decode_jpeg(payload)).all()


def test_jpeg_rejects_unsupported_profiles():
    """Valid-but-unsupported profiles -> NotImplementedError (surfaces
    as no_codec); malformed payloads -> ValueError (error rows)."""
    good = bytearray(encode_jpeg(_smooth_img(16, 16, 1)))
    i = good.find(b"\xff\xc0")
    for sof2 in (0xC2, 0xC3, 0xC9, 0xCB):  # progressive/lossless/arith
        bad = bytearray(good)
        bad[i + 1] = sof2
        with pytest.raises(NotImplementedError):
            parse_jpeg_header(bytes(bad))
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(bad))
    # 12-bit precision
    bad = bytearray(good)
    bad[i + 4] = 12
    with pytest.raises(NotImplementedError):
        parse_jpeg_header(bytes(bad))
    # malformed: magic then garbage / truncated segment / bare SOI
    for junk in (
        b"\xff\xd8\xff" + b"\x00" * 64,
        b"\xff\xd8\xff\xdb\x00\x03\x01",
        b"\xff\xd8",
    ):
        with pytest.raises(ValueError):
            parse_jpeg_header(junk)
    # truncated entropy data -> ValueError, never a hang or wrong array
    full = encode_jpeg(_smooth_img(32, 32, 3, seed=2), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) // 2])


def test_jpeg_decode_refuses_oversize_images():
    """Header-valid multi-megapixel JPEG must raise (bounded entropy
    loop) while header-only metadata parsing still works."""
    payload = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = payload.find(b"\xff\xc0")
    struct.pack_into(">HH", payload, i + 5, 2000, 2000)
    assert 2000 * 2000 > JPEG_MAX_DECODE_PIXELS
    assert parse_jpeg_header(bytes(payload)) == (2000, 2000, 1)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_media_pipeline_on_real_jpeg(spark):
    """media_metadata + media_resize run the REAL JPEG path end-to-end:
    ok rows, correct dims, JPEG-out payload that decodes to the target
    size."""
    from win64_local_ocr_tool_spark.operators.multimodal import (
        media_metadata,
        media_resize,
        render_jpeg,
    )

    df = spark.createDataFrame(
        [(1, render_jpeg(64, 40, 3, seed=6)),   # 4:2:0 (even seed)
         (2, render_jpeg(72, 32, 1, seed=9)),   # gray + DRI (seed%3==0)
         (3, render_jpeg(80, 48, 3, seed=7))],  # 4:4:4
        schema="media_id long, payload binary",
    )
    meta = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert all(meta[k]["status"] == "ok" for k in (1, 2, 3))
    assert (meta[1]["width"], meta[1]["height"], meta[1]["n_channels"]) \
        == (64, 40, 3)
    assert meta[2]["n_channels"] == 1
    rez = {r["media_id"]: r for r in media_resize(df, 20, 12).collect()}
    for k in (1, 2, 3):
        assert rez[k]["status"] == "ok"
        out = decode_jpeg(bytes(rez[k]["payload"]))
        assert out.shape[:2] == (12, 20)
