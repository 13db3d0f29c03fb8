"""Multimodal plumbing: schemas, dispatch, error isolation, feature
shapes — real Spark-side behavior around the stubbed codecs."""

from pyspark.sql import functions as F

from win64_local_ocr_tool_spark.operators.multimodal import (
    media_features,
    media_metadata,
    render_saud,
    render_simg,
    sniff_container,
    synthetic_media_df,
)


def test_sniffers():
    assert sniff_container(render_simg(64, 48, 3, 1)) == "simg"
    assert sniff_container(render_saud(8000, 100, 1)) == "saud"
    assert sniff_container(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert sniff_container(b"\xff\xd8\xffxxx") == "jpeg"
    assert sniff_container(b"RIFF....WAVEfmt") == "wav"
    assert sniff_container(b"RIFF....AVI LIST") == "unknown"
    assert sniff_container(b"junk") == "unknown"


def test_media_metadata(spark):
    media = synthetic_media_df(spark, 100)
    meta = media_metadata(media).toPandas().set_index("media_id")
    assert len(meta) == 100
    # image rows carry dimensions
    img = meta[meta["kind"] == "image"]
    assert (img["status"] == "ok").all()
    assert (img["width"] >= 64).all() and (img["n_channels"].isin([1, 3])).all()
    # audio rows carry sample rate
    aud = meta[meta["kind"] == "audio"]
    assert (aud["sample_rate"] >= 8000).all()
    # garbage rows are error rows, not crashes
    bad = meta[meta["status"] == "error"]
    assert len(bad) > 0 and (bad["kind"] == "unknown").all()


def test_media_metadata_no_codec_status(spark):
    """Real-container payloads (PNG) surface status=no_codec — the
    stub boundary is explicit, not a silent wrong answer."""
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)],
        schema="media_id long, payload binary",
    )
    row = media_metadata(df).collect()[0]
    assert row["container"] == "png"
    assert row["status"] == "no_codec"


def test_media_features_deterministic_across_partitioning(spark):
    a = media_features(synthetic_media_df(spark, 60)).toPandas()
    b = media_features(
        synthetic_media_df(spark, 60).repartition(13)
    ).toPandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert (a["status"].values == b["status"].values).all()
    for x, y in zip(a["feat"], b["feat"]):
        assert (x is None) == (y is None)
        if x is not None:
            assert list(x) == list(y)


def test_media_features_shape(spark):
    feats = media_features(synthetic_media_df(spark, 50), dim=8)
    ok = feats.filter(F.col("status") == "ok")
    sizes = ok.select(F.size("feat").alias("d")).distinct().collect()
    assert [r["d"] for r in sizes] == [8]
