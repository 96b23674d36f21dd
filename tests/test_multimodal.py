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


def test_real_codec_gate_narrowed_to_jpeg_pixels():
    """Since round 5 real PNGs probe AND pixel-decode stdlib-only
    (core/png_codec.py); the optional-PIL NotImplementedError gate
    remains only for JPEG PIXEL decode (probes are stdlib for the whole
    raster trio)."""
    import pytest

    from pdf_document_extractor_spark.operators.multimodal import (
        _pil,
        decode_image_pixels,
        probe_image_size,
    )

    import struct
    import zlib

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    # foreign-assembled RGBA 1x1 (zlib level 9, two IDAT chunks — a
    # shape our own encoder never writes)
    idat = zlib.compress(b"\x00\x10\x20\x30\x40", 9)
    png_1x1 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", idat[:4])
        + chunk(b"IDAT", idat[4:])
        + chunk(b"IEND", b"")
    )
    assert probe_image_size(png_1x1) == (1, 1)
    arr = decode_image_pixels(png_1x1)
    assert arr.shape == (1, 1, 4)
    assert arr.tobytes() == b"\x10\x20\x30\x40"
    # the round-3 hex fixture used here previously turned out to be a
    # MALFORMED png (IDAT declares 13 bytes, carries 16): the codec must
    # reject it typed, not decode garbage
    import pytest as _pytest

    from pdf_document_extractor_spark.core.taxonomy import (
        CorruptedFileError,
    )

    bad = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
        "0000000d49444154789c626001000000ffff03000006000557bfabd40000000049"
        "454e44ae426082"
    )
    with _pytest.raises(CorruptedFileError):
        decode_image_pixels(bad)
    # minimal JPEG with SOF0 13x7: header probe works without PIL...
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xc0" + b"\x00\x11" + b"\x08" + (7).to_bytes(2, "big")
        + (13).to_bytes(2, "big") + b"\x03" + b"\x01\x11\x00" * 3
        + b"\xff\xd9"
    )
    assert probe_image_size(jpeg) == (13, 7)
    # ...pixel decode is the one remaining PIL-gated path
    if _pil() is None:
        with pytest.raises(NotImplementedError):
            decode_image_pixels(jpeg)


# ---------------------------------------------------------------------------
# Image-input extraction (round 3): PNG IHDR / JPEG SOFn header probes
# ---------------------------------------------------------------------------


def test_png_jpeg_dimension_probes():
    from pdf_document_extractor_spark.core.image_extract import (
        jpeg_dimensions,
        png_dimensions,
    )
    from pdf_document_extractor_spark.sources.pages import (
        synth_jpeg_payload,
        synth_png_payload,
    )

    assert png_dimensions(synth_png_payload(640, 480)) == (640, 480)
    assert jpeg_dimensions(synth_jpeg_payload(123, 45)) == (123, 45)


def test_image_extract_success_row():
    from pdf_document_extractor_spark.core.dispatch import extract_document
    from pdf_document_extractor_spark.sources.pages import (
        synth_jpeg_payload,
        synth_png_payload,
    )

    res = extract_document("https://x/img/2", synth_png_payload(20, 30))
    assert res.status == "success" and res.doc_type == "png"
    (fig,) = res.pages[0].figures
    assert (fig.image_format, fig.image_width, fig.image_height) == ("png", 20, 30)
    assert fig.payload_bytes > 0 and fig.label == "image"
    assert res.pages[0].content == "" and res.pages[0].word_count == 0

    res = extract_document("https://x/img/3", synth_jpeg_payload(99, 7))
    assert res.doc_type == "jpg"
    assert res.pages[0].figures[0].image_width == 99


def test_image_corrupt_and_bomb_taxonomy():
    from pdf_document_extractor_spark.core.dispatch import extract_document
    from pdf_document_extractor_spark.sources.pages import (
        synth_jpeg_payload,
        synth_png_payload,
    )

    # truncated PNG -> CorruptedFileError hard failure
    res = extract_document("https://x/img/0", b"\x89PNG\r\n\x1a\nxx")
    assert (res.status, res.error_type) == ("hard_failure", "CorruptedFileError")
    # jpeg with no SOF -> CorruptedFileError
    res = extract_document("https://x/img/1", b"\xff\xd8\xff\xd9")
    assert res.error_type == "CorruptedFileError"
    # dimension bomb -> OversizeDocumentError BEFORE any decode
    res = extract_document("https://x/img/4", synth_png_payload(1 << 20, 2))
    assert res.error_type == "OversizeDocumentError"
    res = extract_document("https://x/img/5", synth_jpeg_payload(9000, 9000))
    assert res.error_type == "OversizeDocumentError"
    # zero dims are corrupt, not a bomb
    res = extract_document("https://x/img/6", synth_png_payload(0, 5))
    assert res.error_type == "CorruptedFileError"


def test_jpeg_probe_walks_app_segments():
    import struct

    from pdf_document_extractor_spark.core.image_extract import jpeg_dimensions

    # SOI + two APPn/comment segments before the SOF0
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    sof2 = (
        b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 11, 22) + b"\x01\x11\x00"
    )
    assert jpeg_dimensions(b"\xff\xd8" + com + app1 + sof2 + b"\xff\xd9") == (22, 11)


def test_gif_extracts_metadata_since_round4():
    """GIF graduated from named-unsupported to a metadata extraction
    (logical screen descriptor probe), completing the raster trio."""
    import struct

    from pdf_document_extractor_spark.core.dispatch import extract_document

    gif = b"GIF89a" + struct.pack("<HH", 37, 21) + b"\x00\x00\x00\x3b"
    res = extract_document("https://x/img/7", gif)
    assert res.status == "success" and res.doc_type == "gif"
    f = res.pages[0].figures[0]
    assert (f.image_format, f.image_width, f.image_height) == ("gif", 37, 21)
    # zero-dimension screen descriptor -> typed corrupt
    res = extract_document("https://x/img/7", b"GIF89a" + b"\x00" * 10)
    assert res.error_type == "CorruptedFileError"
    # dimension bomb guard applies to gif too
    bomb = b"GIF89a" + struct.pack("<HH", 9000, 9000) + b"\x00\x00\x00\x3b"
    res = extract_document("https://x/img/7", bomb)
    assert res.error_type == "OversizeDocumentError"


def test_png_codec_roundtrip_and_typed_degrades():
    """Pure-stdlib PNG codec (round-5 M11 closure): encode->decode is
    byte-identity for 8-bit gray/gray+A/RGB/RGBA; palette, 16-bit and
    interlaced files degrade TYPED; bombs are capped before inflate."""
    import random
    import struct
    import zlib

    import pytest

    from pdf_document_extractor_spark.core.png_codec import (
        png_decode,
        png_encode,
    )
    from pdf_document_extractor_spark.core.taxonomy import (
        CorruptedFileError,
        OversizeDocumentError,
        UnsupportedFormatError,
    )

    rng = random.Random(11)
    for w, h, c in [(1, 1, 1), (13, 5, 3), (31, 7, 4), (2, 3, 2)]:
        raw = bytes(rng.randrange(256) for _ in range(w * h * c))
        assert png_decode(png_encode(raw, w, h, c)) == (raw, w, h, c)
    base = png_encode(b"\x00" * 64, 8, 8, 1)
    # palette color type -> typed unsupported
    pal = bytearray(base)
    pal[25] = 3  # IHDR color type byte
    struct.pack_into(
        ">I", pal, 29, zlib.crc32(bytes(pal[12:29])) & 0xFFFFFFFF
    )
    with pytest.raises(UnsupportedFormatError, match="color type"):
        png_decode(bytes(pal))
    # dimension bomb rejected before any inflate
    bomb = bytearray(base)
    struct.pack_into(">II", bomb, 16, 60000, 60000)
    with pytest.raises(OversizeDocumentError):
        png_decode(bytes(bomb))
    # truncated IDAT -> typed corrupt
    with pytest.raises(CorruptedFileError):
        png_decode(base[:40])
    # OVERSIZED IDAT (more rows than IHDR declares) -> typed corrupt,
    # not a silent truncation (found in round-5 self-review: the first
    # implementation never fed unconsumed_tail back to the inflater)
    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    over = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress((b"\x00" + b"\x07") * 3, 6))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(CorruptedFileError, match="larger than declared"):
        png_decode(over)


def test_scanned_figure_png_is_byte_pinned():
    """The mm_figure_render oracle pins md5/len of the scanned fixture's
    PNG. Re-assemble that PNG INDEPENDENTLY (raw chunk construction,
    no png_codec involvement) and check the pinned constants against
    it — the oracle is not self-referential."""
    import hashlib
    import struct
    import zlib

    from pdf_document_extractor_spark.core.pdf_extract import (
        render_figure_images,
    )
    from pdf_document_extractor_spark.core.pdf_write import write_pdf_scanned

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    rows = (b"\x00" + b"\x00" * 8) * 8  # filter-0 rows of gray zeros
    expected = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows, 6))
        + chunk(b"IEND", b"")
    )
    assert len(expected) == 69
    assert hashlib.md5(expected).hexdigest() == (
        "38289fc7244edfa7c22af65f3d6ed8fd"
    )
    figs = render_figure_images(write_pdf_scanned(), "p" * 16)
    assert figs[0]["image"] == expected
    assert figs[0]["image_format"] == "png"


def test_render_figures_operator(spark):
    """render_figures: PDF docs emit page-ordered figure rows with
    rendered payloads; non-PDF and unparseable docs contribute none."""
    from pdf_document_extractor_spark.core.png_codec import png_decode
    from pdf_document_extractor_spark.operators.multimodal import (
        render_figures,
    )
    from pdf_document_extractor_spark.core.pdf_write import write_pdf_scanned
    from pdf_document_extractor_spark.sources.pages import PAGES_SCHEMA

    rows = [
        ("u1", None, write_pdf_scanned(n_pages=2), "", "en"),
        ("u2", None, b"<html><p>no figures</p></html>", "", "en"),
        ("u3", None, b"%PDF-1.4 broken", "", "en"),
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = render_figures(pages).collect()
    assert [r["url"] for r in out] == ["u1", "u1"]
    assert [r["page_number"] for r in out] == [1, 2]
    raw, w, h, c = png_decode(bytes(out[0]["image"]))
    assert (w, h, c) == (8, 8, 1) and raw == b"\x00" * 64


def test_probe_and_decode_handle_real_png_without_pil():
    """probe_image_size routes PNG/JPEG/GIF through the repo's stdlib
    header probes; decode_image_pixels decodes real PNG pixels — no
    NotImplementedError for the raster trio probes (round-5)."""
    import struct

    from pdf_document_extractor_spark.core.png_codec import png_encode
    from pdf_document_extractor_spark.operators.multimodal import (
        decode_image_pixels,
        probe_image_size,
    )

    png = png_encode(bytes(range(12)) * 2, 4, 2, 3)
    assert probe_image_size(png) == (4, 2)
    arr = decode_image_pixels(png)
    assert arr.shape == (2, 4, 3)
    assert bytes(arr.tobytes()) == bytes(range(12)) * 2
    gif = b"GIF89a" + struct.pack("<HH", 5, 9) + b"\x00\x00\x00\x3b"
    assert probe_image_size(gif) == (5, 9)


def test_figure_render_jpeg_passthrough_and_exotic_metadata_only():
    """A /DCTDecode image XObject's payload IS a JPEG file — it must
    pass through byte-identical with image_format='jpeg'; an exotic
    encoding (CCITTFaxDecode) yields a metadata-only row (image NULL),
    never a garbage render. Also covers the scanned-success figure
    metadata for non-Flate images."""
    from pdf_document_extractor_spark.core.pdf_extract import (
        extract_pdf,
        render_figure_images,
    )
    from pdf_document_extractor_spark.core.pdf_write import _serialize_classic

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xc0" + b"\x00\x11" + b"\x08" + (7).to_bytes(2, "big")
        + (13).to_bytes(2, "big") + b"\x03" + b"\x01\x11\x00" * 3
        + b"\xff\xd9"
    )
    img_dct = (
        b"<< /Type /XObject /Subtype /Image /Width 13 /Height 7 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n" % len(jpeg) + jpeg + b"\nendstream"
    )
    fax = b"\x00\x01\x02\x03"
    img_fax = (
        b"<< /Type /XObject /Subtype /Image /Width 4 /Height 2 "
        b"/BitsPerComponent 1 /Filter /CCITTFaxDecode "
        b"/Length %d >>\nstream\n" % len(fax) + fax + b"\nendstream"
    )
    content = b"q /ImA Do Q q /ImB Do Q"
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /XObject "
        b"<< /ImA 5 0 R /ImB 6 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream",
        img_dct,
        img_fax,
    ]
    doc = _serialize_classic(objects)
    figs = render_figure_images(doc, "j" * 16)
    by_fmt = {f["image_format"]: f for f in figs}
    assert by_fmt["jpeg"]["image"] == jpeg  # byte-identical passthrough
    assert (by_fmt["jpeg"]["width"], by_fmt["jpeg"]["height"]) == (13, 7)
    assert by_fmt["tiff"]["image"] is None  # metadata-only, no garbage
    # the scanned-success path reports the same metadata (no pixels read)
    r = extract_pdf(doc, "j" * 16)
    assert r.status == "success"
    fmts = sorted(f.image_format for f in r.pages[0].figures)
    assert fmts == ["jpeg", "tiff"]
