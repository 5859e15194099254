"""Pure-Python container header parsing + the mapInPandas plumbing.

Layer-1 pure-function tests (SURVEY.md §5): the decoders read only public
fixed-layout header fields, so every case is hand-assembled bytes."""

import struct

from data_collector_spark.functions.multimodal import (
    decode_image,
    decode_media,
    decode_mp4,
    decode_wav,
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


def wav_bytes(sample_rate, byte_rate, data_size, data=b""):
    return (
        b"RIFF" + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt " + struct.pack("<IHH", 16, 1, 1)
        + struct.pack("<IIHH", sample_rate, byte_rate, 2, 16)
        + b"data" + struct.pack("<I", data_size) + data
    )


def mp4_bytes(timescale, duration, version=0):
    if version == 0:
        body = b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(
            ">II", timescale, duration
        ) + b"\x00" * 80
    else:
        body = b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(
            ">IQ", timescale, duration
        ) + b"\x00" * 80
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00" + moov


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


def test_decode_wav():
    # 16 kB/s byte rate, 32000 declared data bytes -> 2000 ms
    assert decode_wav(wav_bytes(8000, 16000, 32000)) == 2000
    # declared data need not be present (header-only archive)
    assert decode_wav(wav_bytes(44100, 88200, 88200)) == 1000
    # data bytes present: same answer (size field governs)
    assert decode_wav(wav_bytes(8000, 16000, 4000, data=b"\x00" * 4000)) == 250
    # an extra chunk before fmt must be walked over (word-aligned step)
    extra = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd size: pad byte
        + b"fmt " + struct.pack("<IHH", 16, 1, 1)
        + struct.pack("<IIHH", 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 8000)
    )
    assert decode_wav(extra) == 500
    assert decode_wav(b"RIFFxxxxWAVE") is None                     # no chunks
    assert decode_wav(b"RIFF but just text mentioning WAVE") is None
    assert decode_wav(wav_bytes(8000, 16000, 32000)[:20]) is None  # truncated
    # data before fmt: malformed (no byte rate yet)
    bad = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"data" + struct.pack("<I", 100)
    )
    assert decode_wav(bad) is None
    # zero byte rate must not divide
    assert decode_wav(wav_bytes(8000, 0, 32000)) is None


def test_decode_mp4():
    assert decode_mp4(mp4_bytes(600, 1200)) == 2000
    assert decode_mp4(mp4_bytes(3000, 1)) == 0                     # floors
    # version-1 mvhd: 64-bit duration after 64-bit times
    assert decode_mp4(mp4_bytes(90000, 90000 * 7, version=1)) == 7000
    assert decode_mp4(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00") is None
    assert decode_mp4(mp4_bytes(0, 100)) is None                   # 0 timescale
    assert decode_mp4(mp4_bytes(600, 1200)[:40]) is None           # truncated
    assert decode_mp4(b"just text, no ftyp box here at all") is None


def test_decode_mp4_largesize_and_to_eof_boxes():
    """ADVICE r6: size==1 (64-bit largesize) and size==0 (box extends to
    end of enclosure) are legal ISO-BMFF encodings — both must parse
    instead of falling through to the fabricated fallback."""
    base = mp4_bytes(600, 1200)
    ftyp, moov = base[:16], base[16:]
    # moov re-encoded with size==1 + largesize
    moov_large = (
        b"\x00\x00\x00\x01" + b"moov"
        + struct.pack(">Q", 8 + len(moov))  # largesize includes 16B header
        + moov[8:]
    )
    assert decode_mp4(ftyp + moov_large) == 2000
    # moov with size==0: extends to end of file
    moov_eof = b"\x00\x00\x00\x00" + b"moov" + moov[8:]
    assert decode_mp4(ftyp + moov_eof) == 2000
    # child mvhd with size==0 inside a normal moov
    mvhd = moov[8:]
    mvhd_eof = b"\x00\x00\x00\x00" + b"mvhd" + mvhd[8:]
    moov_child_eof = struct.pack(">I", 8 + len(mvhd_eof)) + b"moov" + mvhd_eof
    assert decode_mp4(ftyp + moov_child_eof) == 2000
    # truncated largesize header stays None
    assert decode_mp4(ftyp + b"\x00\x00\x00\x01moov\x00\x00") is None
    # largesize smaller than its own 16-byte header: malformed
    bad = b"\x00\x00\x00\x01" + b"moov" + struct.pack(">Q", 8) + moov[8:]
    assert decode_mp4(ftyp + bad) is None


def test_decode_media_dispatch():
    assert decode_media(png_bytes(3, 4)) == ("png", 3, 4, None)
    assert decode_media(wav_bytes(8000, 16000, 16000)) == ("wav", None, None, 1000)
    assert decode_media(mp4_bytes(600, 600)) == ("mp4", None, None, 1000)
    assert decode_media(b"plain text") is None
    # the NUL prefix the driver query adds makes ANY text unsniffable
    for magic in (b"GIF89a", b"RIFF", b"\x89PNG", b"\xff\xd8"):
        assert decode_media(b"\x00" + magic + b" lorem ipsum;") is None


def test_non_images_fall_through():
    for payload in (b"", b"hello world", b"\x89PNX garbage", b"GIF90a\0\0\0\0"):
        assert decode_media(payload) is None
        n, w, h, kind = fake_decode_meta(payload)
        assert n == len(payload) and kind in ("image", "audio", "video")


def test_extract_media_meta_mixed_batch(spark):
    rows = [
        (1, png_bytes(101, 77)),
        (2, jpeg_bytes(55, 44)),
        (3, gif_bytes(9, 8)),
        (4, b"just text"),
        (5, None),
        (6, wav_bytes(8000, 16000, 8000)),
        (7, mp4_bytes(600, 1800)),
    ]
    out = {
        r["doc_id"]: (r["n_bytes"], r["width"], r["height"], r["kind"],
                      r["duration_ms"])
        for r in extract_media_meta(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert out[1] == (33, 101, 77, "png", None)
    assert out[2] == (23, 55, 44, "jpeg", None)
    assert out[3] == (14, 9, 8, "gif", None)
    assert out[4][3] in ("image", "audio", "video") and out[4][0] == 9
    assert out[4][4] is None
    assert out[5] == (0, 0, 0, "image", None)  # NULL -> empty -> fallback
    assert out[6] == (44, None, None, "wav", 500)
    assert out[7] == (len(mp4_bytes(600, 1800)), None, None, "mp4", 3000)


def test_spark_synthesized_headers_roundtrip(spark):
    """The driver query's JVM-expression-synthesized containers decode back
    to the arithmetic fields — the multimodal_meta oracle contract."""
    import data_collector_spark.plans  # noqa: F401 — populate the registry
    from data_collector_spark.plans.registry import QUERIES

    out = QUERIES["multimodal_meta"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    kinds = {r["kind"] for r in rows}
    assert {"png", "jpeg", "gif", "wav", "mp4"} <= kinds
    for r in rows:
        i = r["doc_id"]
        if r["kind"] in ("png", "jpeg", "gif"):
            assert r["width"] == i % 509 + 1
            assert r["height"] == i % 389 + 1
            assert r["duration_ms"] is None
        elif r["kind"] == "wav":
            assert r["n_bytes"] == 44
            assert r["duration_ms"] == ((i % 100000) + 1000) * 1000 // (
                16000 * (i % 5 + 1)
            )
            assert r["width"] is None and r["height"] is None
        elif r["kind"] == "mp4":
            assert r["n_bytes"] == 132
            assert r["duration_ms"] == ((i % 90000) + 1) * 1000 // (
                600 + i % 1000
            )
        else:  # NUL-prefixed text fallback: always 'image' (codepoint 0)
            assert r["kind"] == "image" and i % 6 == 5
