"""Pure-Python image-container header parsing + the mapInPandas plumbing.

Layer-1 pure-function tests (SURVEY.md §5): the decoder reads only public
fixed-layout header fields, so every case is hand-assembled bytes."""

import struct

from data_collector_spark.functions.multimodal import (
    decode_image,
    extract_media_meta,
    fake_decode_meta,
)


def png_bytes(w, h):
    return (
        b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00\x00\x00\x00\x00"
    )


def jpeg_bytes(w, h, extra_segments=b"\xff\xe0\x00\x04JF"):
    return (
        b"\xff\xd8" + extra_segments
        + b"\xff\xc0\x00\x0b\x08" + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00\xff\xd9"
    )


def gif_bytes(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def test_decode_png():
    assert decode_image(png_bytes(640, 480)) == (640, 480, "png")
    assert decode_image(png_bytes(1, 100000)) == (1, 100000, "png")
    assert decode_image(png_bytes(640, 480)[:20]) is None          # truncated
    assert decode_image(b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dXXXX" + b"\0" * 13) is None


def test_decode_jpeg_marker_walk():
    assert decode_image(jpeg_bytes(800, 600)) == (800, 600, "jpeg")
    # no leading APP0: SOF first
    assert decode_image(jpeg_bytes(12, 34, extra_segments=b"")) == (12, 34, "jpeg")
    # progressive SOF2 + fill bytes + a restart marker before the frame
    prog = (
        b"\xff\xd8\xff\xff\xd0"                        # fill byte then RST0
        + b"\xff\xc2\x00\x0b\x08" + struct.pack(">HH", 7, 9)
        + b"\x01\x01\x11\x00"
    )
    assert decode_image(prog) == (9, 7, "jpeg")
    # DHT (C4) is NOT a frame header — must be skipped, not parsed as SOF
    dht = (
        b"\xff\xd8\xff\xc4\x00\x04\xab\xcd"
        + b"\xff\xc0\x00\x0b\x08" + struct.pack(">HH", 2, 3) + b"\x01\x01\x11\x00"
    )
    assert decode_image(dht) == (3, 2, "jpeg")
    assert decode_image(b"\xff\xd8\xff\xd9") is None               # SOI then EOI
    assert decode_image(b"\xff\xd8\x00\x00\x00\x00") is None       # lost sync
    assert decode_image(jpeg_bytes(800, 600)[:9]) is None          # truncated SOF


def test_decode_gif():
    assert decode_image(gif_bytes(320, 200)) == (320, 200, "gif")
    gif87 = b"GIF87a" + struct.pack("<HH", 5, 6) + b"\x00\x00\x00\x3b"
    assert decode_image(gif87) == (5, 6, "gif")
    assert decode_image(b"GIF89a\x01") is None                     # truncated
    # version string alone is NOT a container: the magic is printable
    # ASCII, so text documents can start with it — demand LSD + trailer
    assert decode_image(b"GIF87a" + struct.pack("<HH", 5, 6)) is None  # no trailer
    assert decode_image(b"GIF89a is an image format, not this doc") is None
    masquerade = b"GIF89a\x00\x00\x05\x00 text ending in a semicolon;"
    assert decode_image(masquerade) is None                        # zero width
    assert decode_image(gif_bytes(0, 8)) is None                   # zero dims


def test_non_images_fall_through():
    for payload in (b"", b"hello world", b"\x89PNX garbage", b"GIF90a\0\0\0\0"):
        assert decode_image(payload) is None
        n, w, h, kind = fake_decode_meta(payload)
        assert n == len(payload) and kind in ("image", "audio", "video")


def test_extract_media_meta_mixed_batch(spark):
    rows = [
        (1, png_bytes(101, 77)),
        (2, jpeg_bytes(55, 44)),
        (3, gif_bytes(9, 8)),
        (4, b"just text"),
        (5, None),
    ]
    out = {
        r["doc_id"]: (r["n_bytes"], r["width"], r["height"], r["kind"])
        for r in extract_media_meta(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert out[1] == (33, 101, 77, "png")
    assert out[2] == (23, 55, 44, "jpeg")
    assert out[3] == (14, 9, 8, "gif")
    assert out[4][3] in ("image", "audio", "video") and out[4][0] == 9
    assert out[5] == (0, 0, 0, "image")  # NULL -> empty payload -> fallback


def test_spark_synthesized_headers_roundtrip(spark):
    """The driver query's JVM-expression-synthesized containers decode back
    to the arithmetic dimensions — the multimodal_meta oracle contract."""
    import data_collector_spark.plans  # noqa: F401 — populate the registry
    from data_collector_spark.plans.registry import QUERIES

    out = QUERIES["multimodal_meta"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    kinds = {r["kind"] for r in rows}
    assert {"png", "jpeg", "gif"} <= kinds
    for r in rows:
        if r["kind"] in ("png", "jpeg", "gif"):
            assert r["width"] == r["doc_id"] % 509 + 1
            assert r["height"] == r["doc_id"] % 389 + 1
