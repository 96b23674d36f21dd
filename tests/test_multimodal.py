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


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_pixels(encode_fake_image(4, 4))
