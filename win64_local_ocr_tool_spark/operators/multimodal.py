"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's core loop IS a multimodal pipeline (image in -> text
out); this module generalizes the plumbing to image/audio/video columns
for a training-data pipeline, per the task brief. PNG, baseline AND
progressive JPEG, GIF, uncompressed BMP and PCM WAV decode FOR REAL
via stdlib-only codecs (``kernels/pngcodec.py`` zlib baseline profile,
``kernels/jpegcodec.py`` huffman + numpy IDCT incl. SOF2 multi-scan,
``kernels/gifcodec.py`` LZW + palettes,
``kernels/bmpcodec.py`` BI_RGB 16/24/32-bit + 1/2/4/8-bit palette +
BI_RLE8/BI_RLE4 + standard 555/565 bitfields,
``kernels/wavcodec.py`` via ``wave``); MP3 — the dominant compressed
audio payload — yields typed METADATA rows from a real frame-header
walk (``kernels/mp3meta.py``: version/layer/rate/channels/duration/
VBR-average bitrate) while its payload bits stay undecoded; variants
needing a real codec (arithmetic/12-bit/lossless JPEG, nonstandard BMP
bitfield masks, free-format MP3, full compressed-audio decode) remain
the documented ``no_codec`` boundary (a real deployment swaps the
``_decode_image`` / ``_decode_audio`` internals for PIL/ffmpeg).
Everything Spark-side is real and tested: schemas, metadata sniffing,
Arrow batch shapes, partitioning, and the iterator-UDF init pattern
(one-time heavy init per executor, reference
``segment_graph.py:73-76``).

Payload containers are sniffed from magic bytes (PNG/JPEG/GIF/BMP/WAV,
plus the reference-style fake used by the synthetic corpus), never from
file extensions — the reference normalizes uploads the same way
(``routes.py:63-81``).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_id long, kind string, container string, width int, height int, "
    "n_channels int, sample_rate int, duration_ms long, n_bytes long, "
    "status string"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, status string, feat array<float>"
)

# magic-byte sniffers (detection AND decode are real for png/jpeg/
# gif/bmp/wav; the %S* containers are deterministic test fixtures)
_MAGICS = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),  # weak 2-byte magic; DIB-size sanity check below
    (b"RIFF", "wav"),  # + b"WAVE" at offset 8
    (b"%SIMG", "simg"),  # synthetic fixture image (tests)
    (b"%SAUD", "saud"),  # synthetic fixture audio (tests)
    (b"%SVID", "svid"),  # synthetic fixture video (tests)
]


_IMAGE_CONTAINERS = ("png", "jpeg", "gif", "bmp", "simg")


def sniff_container(payload: bytes) -> str:
    for magic, name in _MAGICS:
        if payload.startswith(magic):
            if name == "wav" and payload[8:12] != b"WAVE":
                continue
            if name == "bmp" and (
                len(payload) < 54
                or int.from_bytes(payload[14:18], "little")
                not in (12, 40, 52, 56, 64, 108, 124)
            ):
                continue
            return name
    # MP3 has no container magic: an ID3v2 tag, or a bare frame sync
    # whose header FIELDS must validate (11-bit sync alone matches 1 in
    # 2048 of random bytes; requiring valid version/layer/bitrate/
    # samplerate/emphasis cuts the false-positive rate ~50x further,
    # and JPEG's FF D8 fails the sync's third F). Free-format headers
    # sniff as mp3 too — the parser raises NotImplementedError there
    # (-> no_codec), which is the right classification for them.
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:3] == b"ID3":
        return "mp3"
    if len(payload) >= 7:
        # ADTS first: its frames carry layer bits 00, which the MP3
        # header parser rejects as reserved — the two sniffs are
        # disjoint by construction (kernels/mp3meta.py docstring)
        from ..kernels.mp3meta import _parse_adts_header, _parse_frame_header

        if _parse_adts_header(payload, 0) is not None:
            return "aac"
        if _parse_frame_header(*payload[:4]) is not None:
            return "mp3"
    elif len(payload) >= 4:
        from ..kernels.mp3meta import _parse_frame_header

        if _parse_frame_header(*payload[:4]) is not None:
            return "mp3"
    from ..kernels.mp4meta import sniff_mp4

    if sniff_mp4(payload):
        return "mp4"
    return "unknown"


# --------------------------------------------------------------------------
# synthetic fixture containers (deterministic, test the plumbing for real)
# --------------------------------------------------------------------------

def render_simg(width: int, height: int, channels: int, seed: int) -> bytes:
    """Fake image: header + deterministic pixel bytes."""
    head = b"%SIMG" + struct.pack("<HHBI", width, height, channels, seed)
    n = width * height * channels
    body = bytes((seed * 2654435761 + i * 40503) % 256 for i in range(min(n, 4096)))
    return head + body


def render_png(width: int, height: int, channels: int, seed: int) -> bytes:
    """REAL deterministic PNG fixture (encoded by kernels/pngcodec)."""
    import numpy as np

    from ..kernels.pngcodec import encode_png

    idx = np.arange(width * height * channels, dtype=np.uint64)
    img = ((idx * 2654435761 + seed * 40503) % 256).astype(np.uint8)
    return encode_png(img.reshape(height, width, channels))


def render_jpeg(
    width: int, height: int, channels: int, seed: int,
    progressive: bool = False,
) -> bytes:
    """REAL deterministic JPEG fixture (encoded by kernels/jpegcodec) —
    a smooth seeded gradient so the file stays small and the lossy
    round-trip error stays pinned-low. ``progressive=True`` emits a
    SOF2 multi-scan file (same quantized coefficients, so pixels decode
    identically to the baseline form)."""
    import numpy as np

    from ..kernels.jpegcodec import encode_jpeg, encode_jpeg_progressive

    yy, xx = np.mgrid[0:height, 0:width]
    img = np.stack(
        [((xx * 2 + yy * 3 + seed * 13 + c * 37) // 4) % 200 + 20
         for c in range(channels)],
        axis=-1,
    ).astype(np.uint8)
    enc = encode_jpeg_progressive if progressive else encode_jpeg
    return enc(
        img, quality=85, subsample=(channels == 3 and seed % 2 == 0),
        restart_interval=(4 if seed % 3 == 0 else 0),
    )


def render_gif(width: int, height: int, n_colors: int, seed: int) -> bytes:
    """REAL deterministic GIF fixture (encoded by kernels/gifcodec):
    a seeded <=256-color palette image, losslessly round-trippable."""
    import numpy as np

    from ..kernels.gifcodec import encode_gif

    n_colors = max(1, min(n_colors, 256))
    cidx = np.arange(n_colors * 3, dtype=np.uint64)
    palette = ((cidx * 2654435761 + seed * 97) % 256).astype(
        np.uint8
    ).reshape(n_colors, 3)
    pidx = np.arange(width * height, dtype=np.uint64)
    idx = ((pidx * 40503 + seed) % n_colors).astype(np.int64)
    return encode_gif(palette[idx].reshape(height, width, 3))


def render_bmp(width: int, height: int, channels: int, seed: int) -> bytes:
    """REAL deterministic BMP fixture (encoded by kernels/bmpcodec)."""
    import numpy as np

    from ..kernels.bmpcodec import encode_bmp

    idx = np.arange(width * height * channels, dtype=np.uint64)
    img = ((idx * 2654435761 + seed * 40503) % 256).astype(np.uint8)
    return encode_bmp(img.reshape(height, width, channels))


def render_bmp_rle8(width: int, height: int, n_colors: int,
                    seed: int) -> bytes:
    """REAL deterministic BI_RLE8 BMP fixture: a seeded palette image
    with horizontal runs (so the RLE stream contains real encoded
    runs, not just literals)."""
    import numpy as np

    from ..kernels.bmpcodec import encode_bmp_rle8

    n_colors = max(1, min(n_colors, 256))
    cidx = np.arange(n_colors * 3, dtype=np.uint64)
    palette = ((cidx * 2654435761 + seed * 97) % 256).astype(
        np.uint8
    ).reshape(n_colors, 3)
    pidx = np.arange(width * height, dtype=np.uint64)
    # runs of ~5 px: index changes every 5 pixels along the row
    idx = (((pidx // 5) * 40503 + seed) % n_colors).astype(np.uint8)
    return encode_bmp_rle8(idx.reshape(height, width), palette)


def render_wav(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """REAL deterministic PCM WAV fixture (encoded by kernels/wavcodec)."""
    import numpy as np

    from ..kernels.wavcodec import encode_wav

    t = np.arange(n_samples, dtype=np.int64)
    samples = ((t * (seed % 97 + 3)) % 2000 - 1000).astype("<i2")
    return encode_wav(sample_rate, samples)


def render_saud(sample_rate: int, n_samples: int, seed: int) -> bytes:
    head = b"%SAUD" + struct.pack("<II", sample_rate, n_samples)
    body = bytes((seed * 69069 + i * 12345) % 256 for i in range(min(n_samples, 4096)))
    return head + body


_SVID_PLANE_CAP = 512  # stored bytes per frame (bounds fixture size)


def render_svid(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Fake video: header + n_frames deterministic byte planes."""
    head = b"%SVID" + struct.pack("<HHBI", width, height, n_frames, seed)
    plane = min(width * height, _SVID_PLANE_CAP)
    body = bytearray()
    for f in range(n_frames):
        body += bytes(
            (seed * 2246822519 + f * 3266489917 + i * 668265263) % 256
            for i in range(plane)
        )
    return head + bytes(body)


def _parse_svid_header(payload: bytes):
    w, h, nf, _seed = struct.unpack_from("<HHBI", payload, 5)
    return w, h, nf


def _svid_frame(payload: bytes, f: int) -> bytes:
    """Extract frame f as a standalone %SIMG payload (1-channel)."""
    w, h, nf, seed = struct.unpack_from("<HHBI", payload, 5)
    plane = min(w * h, _SVID_PLANE_CAP)
    off = 14 + f * plane
    head = b"%SIMG" + struct.pack("<HHBI", w, h, 1, seed + f)
    return head + payload[off : off + plane]


def _parse_simg_header(payload: bytes):
    w, h, c, _seed = struct.unpack_from("<HHBI", payload, 5)
    return w, h, c


def _parse_saud_header(payload: bytes):
    sr, n = struct.unpack_from("<II", payload, 5)
    return sr, n


def _decode_image(payload: bytes, container: str):
    """(width, height, channels) — header-only, body untouched.

    PNG, baseline + progressive JPEG, GIF and palette/RLE/truecolor
    BMP decode FOR REAL via the stdlib codecs
    (``kernels/{png,jpeg,gif,bmp}codec.py``; reference image loads
    ``segmentation/utils.py:7-14``); the synthetic container parses
    its fixture header. Variants needing a real codec (arithmetic/
    12-bit JPEG, nonstandard BMP bitfield masks) raise
    NotImplementedError inside the kernel (-> status='no_codec')."""
    if container == "simg":
        return _parse_simg_header(payload)
    if container == "png":
        from ..kernels.pngcodec import parse_png_header

        return parse_png_header(payload)
    if container == "jpeg":
        from ..kernels.jpegcodec import parse_jpeg_header

        return parse_jpeg_header(payload)
    if container == "gif":
        from ..kernels.gifcodec import parse_gif_header

        return parse_gif_header(payload)
    if container == "bmp":
        from ..kernels.bmpcodec import parse_bmp_header

        return parse_bmp_header(payload)
    raise NotImplementedError(
        f"no {container} codec in this environment; swap in PIL/opencv"
    )


def _decode_image_pixels(payload: bytes, container: str):
    """Full pixel decode -> HxWxC uint8 numpy array (PNG, baseline
    JPEG, GIF first-frame, uncompressed BMP, synthetic; variants
    needing a real codec raise NotImplementedError and surface as
    status='no_codec')."""
    import numpy as np

    if container == "png":
        from ..kernels.pngcodec import decode_png

        return decode_png(payload)
    if container == "jpeg":
        from ..kernels.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if container == "gif":
        from ..kernels.gifcodec import decode_gif

        return decode_gif(payload)
    if container == "bmp":
        from ..kernels.bmpcodec import decode_bmp

        return decode_bmp(payload)
    if container == "simg":
        w, h, c = _parse_simg_header(payload)
        stored = np.frombuffer(payload[14:], dtype=np.uint8)
        plane = np.zeros(w * h * c, dtype=np.uint8)
        n = min(len(stored), len(plane))
        plane[:n] = stored[:n]
        return plane.reshape(h, w, c)
    raise NotImplementedError(
        f"no {container} codec in this environment; swap in PIL/opencv"
    )


def _decode_audio(payload: bytes, container: str):
    """(sample_rate, n_frames). PCM WAV decodes for real via the stdlib
    ``wave`` module (``kernels/wavcodec.py``); compressed codecs raise
    (swap in soundfile/ffmpeg)."""
    if container == "saud":
        return _parse_saud_header(payload)
    if container == "wav":
        from ..kernels.wavcodec import parse_wav_header

        rate, n_frames, _ch, _w = parse_wav_header(payload)
        return rate, n_frames
    raise NotImplementedError(
        f"no {container} codec in this environment; swap in soundfile/ffmpeg"
    )


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------

def media_metadata(media: DataFrame) -> DataFrame:
    """(media_id, payload binary) -> typed metadata row per payload.

    Row-level failure isolation: undecodable payloads yield
    status='error' rows (reference ``dataset.py:203-210``), never task
    failures. Zero shuffle; header-only parse (cheap even on 100 MB
    payloads — the body is never touched)."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                container = sniff_container(payload)
                row = {
                    "media_id": int(mid),
                    "kind": "unknown",
                    "container": container,
                    "width": None,
                    "height": None,
                    "n_channels": None,
                    "sample_rate": None,
                    "duration_ms": None,
                    "n_bytes": len(payload),
                    "status": "ok",
                }
                try:
                    if container in _IMAGE_CONTAINERS:
                        row["kind"] = "image"
                        w, h, c = _decode_image(payload, container)
                        row.update(width=w, height=h, n_channels=c)
                    elif container in ("wav", "saud"):
                        row["kind"] = "audio"
                        sr, n = _decode_audio(payload, container)
                        row.update(
                            sample_rate=sr, duration_ms=n * 1000 // max(sr, 1)
                        )
                    elif container == "flac":
                        from ..kernels.mp3meta import parse_flac_meta

                        row["kind"] = "audio"
                        m = parse_flac_meta(payload)
                        row.update(
                            sample_rate=m["sample_rate"],
                            n_channels=m["channels"],
                            duration_ms=m["duration_ms"],
                        )
                    elif container in ("mp3", "aac"):
                        # metadata-only boundary (kernels/mp3meta.py):
                        # frame headers yield typed audio rows; the
                        # payload bits stay undecoded (full decode =
                        # ffmpeg's job at deployment)
                        from ..kernels.mp3meta import (
                            parse_adts_meta,
                            parse_mp3_meta,
                        )

                        row["kind"] = "audio"
                        m = (
                            parse_mp3_meta(payload)
                            if container == "mp3"
                            else parse_adts_meta(payload)
                        )
                        row.update(
                            sample_rate=m["sample_rate"],
                            n_channels=m["channels"],
                            duration_ms=m["duration_ms"],
                        )
                    elif container == "mp4":
                        # ISO-BMFF box walk (kernels/mp4meta.py):
                        # video rows get dims + duration + the track
                        # census count; sample data never touched
                        from ..kernels.mp4meta import parse_mp4_meta

                        row["kind"] = "video"
                        m = parse_mp4_meta(payload)
                        row.update(
                            width=m["width"],
                            height=m["height"],
                            duration_ms=m["duration_ms"],
                            n_channels=m["n_tracks"],
                        )
                    elif container == "svid":
                        row["kind"] = "video"
                        w, h, nf = _parse_svid_header(payload)
                        row.update(width=w, height=h, n_channels=nf)
                    else:
                        row["status"] = "error"
                except NotImplementedError:
                    row["status"] = "no_codec"
                except Exception:
                    row["status"] = "error"
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "container", "width", "height",
                    "n_channels", "sample_rate", "duration_ms", "n_bytes",
                    "status",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        meta, schema=MEDIA_META_SCHEMA
    )


def media_features(media: DataFrame, *, dim: int = 8) -> DataFrame:
    """(media_id, payload) -> fixed-dim feature vector per payload.

    The feature extractor is a deterministic byte-histogram projection
    (stand-in for a CNN/CLAP embedding; the UDF shape — iterator of
    Arrow batches, heavy model initialized ONCE before the loop — is
    exactly what a real encoder needs, reference P4)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one-time per-executor init (model-load analog)
        import numpy as np

        proj = np.arange(256 * dim, dtype=np.float64).reshape(256, dim)
        proj = np.cos(proj * 0.1)  # fixed deterministic projection

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                container = sniff_container(payload)
                if container == "unknown":
                    rows.append(
                        {"media_id": int(mid), "kind": "unknown",
                         "status": "error", "feat": None}
                    )
                    continue
                kind = "image" if container in _IMAGE_CONTAINERS else "audio"
                hist = np.bincount(
                    np.frombuffer(payload[5:4101], dtype=np.uint8), minlength=256
                ).astype(np.float64)
                total = hist.sum()
                if total > 0:
                    hist /= total
                vec = (hist @ proj).astype(np.float32)
                rows.append(
                    {"media_id": int(mid), "kind": kind, "status": "ok",
                     "feat": vec.tolist()}
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "status", "feat"]
            )

    return media.select("media_id", "payload").mapInPandas(
        feats, schema=FEATURE_SCHEMA
    )


def media_resize(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """(media_id, payload) -> nearest-neighbor resized image payload.

    The resize kernel is a real numpy coordinate remap over REAL pixel
    decode: PNG via the stdlib-zlib codec (emits PNG back), baseline
    JPEG via the stdlib huffman+IDCT codec (emits JPEG back), the
    synthetic container via its fixture parser (emits %SIMG back).
    Arithmetic/12-bit JPEG yields status='no_codec' rows, not failures.
    Narrow map, zero shuffle; the Arrow batch bound keeps multi-MB
    payload batches inside worker memory (SURVEY P8)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                container = sniff_container(payload)
                row = {
                    "media_id": int(mid), "width": target_w,
                    "height": target_h, "payload": None, "status": "ok",
                }
                if container not in _IMAGE_CONTAINERS:
                    row["status"] = "error"
                    rows.append(row)
                    continue
                try:
                    # malformed magic-bearing payloads (truncated header,
                    # dims inconsistent with body) must yield error rows,
                    # never task failures (row-level failure isolation)
                    img = _decode_image_pixels(payload, container)
                    h, w, c = img.shape
                    ys = (np.arange(target_h) * h) // target_h
                    xs = (np.arange(target_w) * w) // target_w
                    out = img[ys][:, xs]  # nearest-neighbor remap
                    if container == "png":
                        from ..kernels.pngcodec import encode_png

                        row["payload"] = encode_png(out)
                    elif container == "jpeg":
                        from ..kernels.jpegcodec import encode_jpeg

                        row["payload"] = encode_jpeg(out, quality=90)
                    elif container == "gif":
                        from ..kernels.gifcodec import encode_gif

                        # nearest-neighbor only SELECTS source pixels,
                        # so the palette can never exceed the input's
                        row["payload"] = encode_gif(out)
                    elif container == "bmp":
                        from ..kernels.bmpcodec import encode_bmp

                        row["payload"] = encode_bmp(out)
                    else:
                        seed = struct.unpack_from("<I", payload, 10)[0]
                        head = b"%SIMG" + struct.pack(
                            "<HHBI", target_w, target_h, c, seed
                        )
                        row["payload"] = head + out.tobytes()[:4096]
                except NotImplementedError:
                    row["status"] = "no_codec"
                except Exception:
                    row["status"] = "error"
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "payload", "status"],
            )

    return media.select("media_id", "payload").mapInPandas(
        resize,
        schema="media_id long, width int, height int, payload binary, "
               "status string",
    )


def media_frame_sample(video: DataFrame, every_k: int = 2) -> DataFrame:
    """(media_id, payload video) -> one row per sampled frame.

    The UDTF shape (1 row in -> N frame rows out) is the same
    ``mapInPandas`` pattern as payload->blocks tokenization (SURVEY
    §2.10); each emitted frame is a standalone image payload ready for
    the image operators downstream (resize/features). ffmpeg replaces
    ``_svid_frame`` in a real deployment; everything else is unchanged."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                try:
                    cont = sniff_container(payload)
                    if cont == "mp4":
                        # a REAL video container whose frame extraction
                        # needs a demuxer (the ffmpeg swap seam) — typed
                        # no_codec, not error (metadata still flows via
                        # media_metadata/parse_mp4_meta)
                        raise NotImplementedError("mp4 frames need ffmpeg")
                    if cont != "svid":
                        raise ValueError("not a video container")
                    _w, _h, nf = _parse_svid_header(payload)
                    frames = [
                        (f, _svid_frame(payload, f))
                        for f in range(0, nf, every_k)
                    ]
                except NotImplementedError:
                    rows.append(
                        {"media_id": int(mid), "frame_id": -1,
                         "frame": None, "status": "no_codec"}
                    )
                    continue
                except Exception:
                    # truncated/malformed magic-bearing payloads -> one
                    # error row, never a task failure
                    rows.append(
                        {"media_id": int(mid), "frame_id": -1,
                         "frame": None, "status": "error"}
                    )
                    continue
                for f, frame in frames:
                    rows.append(
                        {"media_id": int(mid), "frame_id": f,
                         "frame": frame, "status": "ok"}
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_id", "frame", "status"]
            )

    return video.select("media_id", "payload").mapInPandas(
        sample,
        schema="media_id long, frame_id int, frame binary, status string",
    )


def synthetic_video_df(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic video fixture table (media_id, payload binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = (
                    b"\x00notavideo"
                    if i % 13 == 7
                    else render_svid(
                        32 + (i % 8) * 8, 24 + (i % 5) * 8,
                        2 + i % 9, seed + i,
                    )
                )
                rows.append({"media_id": i, "payload": payload})
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return spark.range(0, n, 1, 8).mapInPandas(
        gen, schema="media_id long, payload binary"
    )


from .registry import query


@query("media_metadata")  # rows-only: binary plumbing, not SQL-expressible
def media_metadata_q(spark, sf_dir):
    return media_metadata(synthetic_media_df(spark, 200))


@query("media_features")  # rows-only
def media_features_q(spark, sf_dir):
    from pyspark.sql import functions as F

    return media_features(synthetic_media_df(spark, 200)).select(
        "media_id", "kind", "status", F.size("feat").alias("dim")
    )


@query("media_resize")  # rows-only
def media_resize_q(spark, sf_dir):
    from pyspark.sql import functions as F

    return media_resize(synthetic_media_df(spark, 200), 32, 24).select(
        "media_id", "width", "height", "status",
        F.length("payload").alias("n_bytes"),
    )


@query("media_frame_sample")  # rows-only
def media_frame_sample_q(spark, sf_dir):
    from pyspark.sql import functions as F

    return media_frame_sample(synthetic_video_df(spark, 60), every_k=2).select(
        "media_id", "frame_id", "status",
        F.length("frame").alias("n_bytes"),
    )


def synthetic_media_df(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media fixture table (media_id, payload binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 13 == 6:
                    # real PNG rows: the stdlib codec path end-to-end
                    payload = render_png(
                        64 + (i % 8) * 4, 24 + (i % 5) * 4,
                        3 if i % 2 else 1, seed + i,
                    )
                elif i % 17 == 8:
                    # real PCM WAV rows
                    payload = render_wav(
                        8000 + (i % 3) * 8000, 500 + i, seed + i
                    )
                elif i % 19 == 4:
                    # real JPEG rows (stdlib huffman+IDCT codec);
                    # alternate baseline and progressive (SOF2) frames
                    # — 23 = 4+19 is ODD, so progressive rows get the
                    # 3-channel (and sometimes subsampled) path, not
                    # just grayscale
                    payload = render_jpeg(
                        64 + (i % 6) * 8, 32 + (i % 4) * 8,
                        3 if i % 2 else 1, seed + i,
                        progressive=(i % 38 == 23),
                    )
                elif i % 23 == 9:
                    # real GIF rows (stdlib LZW codec)
                    payload = render_gif(
                        32 + (i % 5) * 8, 24 + (i % 4) * 8,
                        4 + (i % 60), seed + i,
                    )
                elif i % 29 == 12:
                    # real BMP rows: uncompressed BI_RGB and BI_RLE8
                    if i % 58 == 12:
                        payload = render_bmp_rle8(
                            40 + (i % 6) * 4, 20 + (i % 3) * 8,
                            5 + (i % 40), seed + i,
                        )
                    else:
                        payload = render_bmp(
                            40 + (i % 6) * 4, 20 + (i % 3) * 8,
                            3 if i % 2 else 4, seed + i,
                        )
                elif i % 7 == 3:
                    if i % 63 == 17:
                        # real FLAC STREAMINFO rows (metadata-only)
                        from ..kernels.mp3meta import encode_flac_streaminfo

                        payload = encode_flac_streaminfo(
                            sample_rate=8000 * (1 + i % 5),
                            channels=1 + i % 2,
                            bits_per_sample=16 + 8 * (i % 2),
                            n_samples=10_000 + i * 997,
                            seed=seed + i,
                        )
                    elif i % 21 == 10:
                        # real AAC-ADTS frame rows (metadata-only)
                        from ..kernels.mp3meta import encode_adts_frames

                        payload = encode_adts_frames(
                            4 + i % 9,
                            profile=i % 3,
                            sfi=3 + i % 6,
                            channels=1 + i % 3,
                            crc=bool(i % 2),
                            body_bytes=100 + i % 77,
                            seed=seed + i,
                        )
                    elif i % 21 == 3:
                        # real MP3 frame-header rows (metadata-only
                        # boundary, kernels/mp3meta.py): vary version/
                        # layer/bitrate/rate/channels + an ID3v2 tag
                        from ..kernels.mp3meta import encode_mp3_frames

                        payload = encode_mp3_frames(
                            8 + i % 11,
                            version=3 if i % 2 else 2,
                            layer=3 if i % 3 else 2,
                            br_idx=5 + i % 7,
                            sr_idx=i % 3,
                            mono=bool(i % 5 == 0),
                            id3_bytes=64 if i % 4 == 0 else 0,
                            seed=seed + i,
                        )
                    else:
                        payload = render_saud(
                            8000 + (i % 4) * 8000, 1000 + i, seed + i
                        )
                elif i % 11 == 5:
                    payload = b"\x00garbage" + bytes([i % 256] * 16)
                elif i % 31 == 7:
                    # real ISO-BMFF rows (metadata-only video boundary)
                    from ..kernels.mp4meta import encode_mp4

                    payload = encode_mp4(
                        width=320 + (i % 5) * 160,
                        height=180 + (i % 5) * 90,
                        duration_ms=1000 + i * 37,
                        audio_track=bool(i % 2),
                        mvhd_v1=bool(i % 3 == 0),
                        seed=seed + i,
                    )
                else:
                    payload = render_simg(
                        64 + (i % 16) * 8, 48 + (i % 9) * 16, 3 if i % 2 else 1,
                        seed + i,
                    )
                rows.append({"media_id": i, "payload": payload})
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return spark.range(0, n, 1, 8).mapInPandas(
        gen, schema="media_id long, payload binary"
    )
