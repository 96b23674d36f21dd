"""Multimodal plumbing tests: fake-container metadata decode, binary
round-trip through Arrow, stub gating."""

from __future__ import annotations

import pytest

from pdf_document_extractor_spark.operators.multimodal import (
    decode_image_pixels,
    decode_media_meta,
    encode_fake_audio,
    encode_fake_image,
    media_metadata,
    resize_images,
)


def test_decode_meta_roundtrip():
    img = encode_fake_image(640, 480, 3)
    meta = decode_media_meta(7, img)
    assert (meta["kind"], meta["width"], meta["height"], meta["channels"]) == (
        "image", 640, 480, 3,
    )
    aud = encode_fake_audio(16000, 44100)
    meta = decode_media_meta(8, aud)
    assert (meta["kind"], meta["width"], meta["height"]) == ("audio", 16000, 44100)
    assert decode_media_meta(9, b"garbage")["valid"] is False
    assert decode_media_meta(10, b"")["valid"] is False


def test_media_metadata_spark(spark):
    rows = [
        (1, encode_fake_image(100, 50, 1)),
        (2, encode_fake_audio(8000, 1000)),
        (3, b"JUNKxx"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, media binary")
    got = {r.doc_id: r for r in media_metadata(df).collect()}
    assert got[1].kind == "image" and got[1].width == 100
    assert got[2].kind == "audio" and got[2].height == 1000
    assert got[3].valid is False and got[4].valid is False


def test_resize_binary_roundtrip(spark):
    rows = [(1, encode_fake_image(640, 480, 3)), (2, b"JUNK")]
    df = spark.createDataFrame(rows, schema="doc_id long, media binary")
    out = {r.doc_id: r.resized for r in resize_images(df, (32, 32)).collect()}
    meta = decode_media_meta(1, bytes(out[1]))
    assert (meta["width"], meta["height"], meta["channels"]) == (32, 32, 3)
    assert out[2] is None


def test_fake_container_decode_is_real_now():
    # round-2 change: fake containers decode to pixels without any codec;
    # NotImplementedError is reserved for real codecs without Pillow
    arr = decode_image_pixels(encode_fake_image(4, 4))
    assert arr.shape == (4, 4, 3)

def test_frame_sample(spark):
    from pdf_document_extractor_spark.operators.multimodal import (
        encode_fake_video,
        frame_sample,
    )

    frames = [bytes([i]) * (i + 1) for i in range(6)]
    rows = [
        (1, encode_fake_video(320, 240, 24, frames)),
        (2, encode_fake_image(10, 10, 1)),  # not a video -> dropped
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, media binary")
    got = sorted(
        (r.doc_id, r.frame_idx, bytes(r.frame))
        for r in frame_sample(df, every_nth=2).collect()
    )
    assert got == [(1, 0, frames[0]), (1, 2, frames[2]), (1, 4, frames[4])]
    w = frame_sample(df, every_nth=2).collect()[0]
    assert (w.width, w.height) == (320, 240)


def test_media_features_ready_for_similarity(spark):
    from pdf_document_extractor_spark.operators.multimodal import (
        FEATURE_DIM,
        media_features,
    )

    rows = [
        (1, encode_fake_image(9, 9, 1)),
        (2, encode_fake_audio(8000, 10)),
        (3, b"JUNKPAYLOADBYTES"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, media binary")
    got = {r.doc_id: list(r.features) for r in media_features(df).collect()}
    assert all(len(v) == FEATURE_DIM for v in got.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in got.values())
    # deterministic: same blob -> same vector
    again = {r.doc_id: list(r.features) for r in media_features(df).collect()}
    assert got == again
    # pipes into the similarity operators (array<float> embedding contract)
    from pyspark.sql import functions as F
    from pdf_document_extractor_spark.operators.similarity import (
        brute_force_topk,
    )
    emb = media_features(df).select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    topk = brute_force_topk(emb, query_ids_below=2, k=2).collect()
    assert len(topk) >= 1


# --------------------------------------------------------------------------
# M11/M12: size probe, pixel decode, bomb guard (PIL paths skip-if-no-PIL)
# --------------------------------------------------------------------------


def test_probe_image_size_fake_container():
    from pdf_document_extractor_spark.operators.multimodal import (
        encode_fake_image,
        probe_image_size,
    )

    assert probe_image_size(encode_fake_image(120, 80, 3)) == (120, 80)


def test_decode_image_pixels_fake_container_shape():
    from pdf_document_extractor_spark.operators.multimodal import (
        decode_image_pixels,
        encode_fake_image,
    )

    arr = decode_image_pixels(encode_fake_image(12, 8, 3))
    assert arr.shape == (8, 12, 3)
    assert arr.dtype.name == "uint8"
    # deterministic
    assert (arr == decode_image_pixels(encode_fake_image(12, 8, 3))).all()


def test_pixel_bomb_guard():
    import pytest

    from pdf_document_extractor_spark.core.taxonomy import (
        OversizeDocumentError,
    )
    from pdf_document_extractor_spark.operators.multimodal import (
        decode_image_pixels,
        encode_fake_image,
        validate_image_dims,
    )

    with pytest.raises(OversizeDocumentError):
        validate_image_dims(9000, 10)  # per-side cap (8192)
    validate_image_dims(8192, 8192)  # 67 MP, both caps satisfied
    with pytest.raises(OversizeDocumentError):
        decode_image_pixels(encode_fake_image(9000, 10, 1))


def test_real_codec_raises_only_without_pil():
    import pytest

    from pdf_document_extractor_spark.operators.multimodal import (
        _pil,
        decode_image_pixels,
        probe_image_size,
    )

    png_1x1 = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
        "0000000d49444154789c626001000000ffff03000006000557bfabd40000000049"
        "454e44ae426082"
    )
    if _pil() is None:
        with pytest.raises(NotImplementedError):
            probe_image_size(png_1x1)
        with pytest.raises(NotImplementedError):
            decode_image_pixels(png_1x1)
    else:  # pragma: no cover - container has no PIL
        assert probe_image_size(png_1x1) == (1, 1)
        assert decode_image_pixels(png_1x1).shape == (1, 1, 3)
