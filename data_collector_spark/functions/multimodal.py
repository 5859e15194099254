"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with metadata extracted by
Arrow-batched pandas UDFs over ``mapInPandas`` — the same shape as the
crawler's html handling. CONTAINER headers are public, fixed-layout
formats, so the decoders parse them in pure Python (no codec dependency —
header fields only, never pixel/sample data):

- PNG: 8-byte signature, then the IHDR chunk carries width/height as
  big-endian u32 at offsets 16..24 (PNG spec §11.2.2);
- JPEG: walk the FF-prefixed marker segments from SOI to the first SOF_n
  frame header, whose payload is precision u8, height u16, width u16
  (ITU-T T.81 §B.2.2);
- GIF: 'GIF87a'/'GIF89a', then the logical-screen width/height as
  little-endian u16 at offsets 6..10;
- WAV/RIFF: 'RIFF' + size + 'WAVE', then a chunk walk to the 'fmt '
  chunk's byte-rate (LE u32 at chunk offset 8) and the 'data' chunk's
  declared size — duration_ms = data_size * 1000 // byte_rate
  (RIFF/WAVE is the multimedia RIFF spec's fixed layout);
- MP4/ISO-BMFF: 'ftyp' major box, then a box walk into 'moov' for the
  'mvhd' movie header — version 0: timescale BE u32 / duration BE u32 at
  body offsets 12/16; version 1: BE u32 / BE u64 at 20/24
  (ISO/IEC 14496-12 §8.2.2). duration_ms = duration * 1000 // timescale.

Payloads that are no recognized container fall back to
``fake_decode_meta`` — the deterministic stand-in for payloads that would
genuinely need codec libraries (pixel data, sample decode), kept so the
plumbing stays oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, "
    "kind string, duration_ms bigint"
)

_KINDS = ["image", "audio", "video"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF_n frame-header markers (T.81 table B.1); C4/C8/CC are DHT/JPG/DAC,
# not frame headers
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def decode_image(payload: bytes) -> tuple[int, int, str] | None:
    """(width, height, container) from a PNG/JPEG/GIF header, else None.

    Pure-Python fixed-layout header parse — truncated or malformed
    payloads return None (callers fall back), never raise."""
    if payload.startswith(_PNG_SIG):
        # signature(8) len(4) 'IHDR'(4) width(4) height(4) ...
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return w, h, "png"
        return None
    if payload[:2] == b"\xff\xd8":  # SOI
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF:
                # segment: len(2) precision(1) height(2) width(2) ...
                if i + 9 <= n and seg_len >= 7:
                    h = int.from_bytes(payload[i + 5 : i + 7], "big")
                    w = int.from_bytes(payload[i + 7 : i + 9], "big")
                    return w, h, "jpeg"
                return None
            if marker == 0xD9 or seg_len < 2:  # EOI / corrupt length
                return None
            i += 2 + seg_len
        return None
    # GIF is the one magic that is printable ASCII, so a TEXT document
    # starting with the literal string 'GIF89a' would sniff as an image and
    # bypass the deterministic fallback (diverging from the oracle). Demand
    # a plausible container, not just the version string: room for the full
    # logical-screen descriptor plus trailer (header 6 + LSD 7 + trailer 1
    # = 14 B minimum), the 0x3B trailer byte closing the stream, and
    # nonzero screen dimensions.
    if (
        payload[:6] in (b"GIF87a", b"GIF89a")
        and len(payload) >= 14
        and payload[-1] == 0x3B
    ):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        if w > 0 and h > 0:
            return w, h, "gif"
        return None
    return None


def decode_wav(payload: bytes) -> int | None:
    """duration_ms from a RIFF/WAVE header, else None.

    Chunk walk: 'fmt ' yields the byte rate (avg bytes/sec, LE u32 at
    chunk-body offset 8), 'data' yields the declared sample-data size.
    The data bytes themselves need not be present (header-only archives /
    truncated tails) — the declared size is the metadata. Word-aligned
    chunk stepping per the RIFF spec (odd sizes pad one byte)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    byte_rate = None
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            body = payload[pos + 8 : pos + 8 + size]
            if size < 16 or len(body) < 16:
                return None
            byte_rate = int.from_bytes(body[8:12], "little")
        elif cid == b"data":
            if byte_rate:
                return size * 1000 // byte_rate
            return None  # data before a valid fmt chunk: malformed
        pos += 8 + size + (size & 1)
    return None


def _box_extent(payload: bytes, pos: int, end: int) -> tuple[int, int] | None:
    """(body_start, box_end) for the ISO-BMFF box at ``pos``, handling the
    three legal size encodings: a plain 32-bit size, size==1 with a 64-bit
    largesize after the type field, and size==0 meaning the box extends to
    the end of the enclosure (ADVICE r6 — both are legal ISO-BMFF and real
    MP4s use them; previously they fell through to fake_decode_meta, which
    fabricated dimensions instead of reporting duration). None when
    malformed."""
    size = int.from_bytes(payload[pos : pos + 4], "big")
    hdr = 8
    if size == 1:
        if pos + 16 > end:
            return None
        size = int.from_bytes(payload[pos + 8 : pos + 16], "big")
        hdr = 16
        if size < 16:
            return None
    elif size == 0:
        size = end - pos
    elif size < 8:
        return None
    return pos + hdr, min(pos + size, end)


def decode_mp4(payload: bytes) -> int | None:
    """duration_ms from an ISO-BMFF (MP4) moov/mvhd box, else None.

    Top-level box walk to 'moov', child walk to 'mvhd'; version 0 carries
    timescale/duration as BE u32 at body offsets 12/16, version 1 as
    BE u32/u64 at 20/24 (64-bit create/modify times push them back).
    Box sizes go through ``_box_extent`` so 64-bit largesize and
    to-end-of-file boxes parse instead of falling through."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    pos, n = 0, len(payload)
    while pos + 8 <= n:
        ext = _box_extent(payload, pos, n)
        if ext is None:
            return None
        body_start, box_end = ext
        if payload[pos + 4 : pos + 8] == b"moov":
            cpos, cend = body_start, box_end
            while cpos + 8 <= cend:
                cext = _box_extent(payload, cpos, cend)
                if cext is None:
                    return None
                cbody, cbox_end = cext
                if payload[cpos + 4 : cpos + 8] == b"mvhd":
                    body = payload[cbody:cbox_end]
                    if not body:
                        return None
                    if body[0] == 0 and len(body) >= 20:
                        ts = int.from_bytes(body[12:16], "big")
                        dur = int.from_bytes(body[16:20], "big")
                    elif body[0] == 1 and len(body) >= 32:
                        ts = int.from_bytes(body[20:24], "big")
                        dur = int.from_bytes(body[24:32], "big")
                    else:
                        return None
                    return dur * 1000 // ts if ts > 0 else None
                if cbox_end <= cpos:
                    return None
                cpos = cbox_end
            return None
        if box_end <= pos:
            return None
        pos = box_end
    return None


def decode_media(payload: bytes) -> tuple[str, int | None, int | None, int | None] | None:
    """(kind, width, height, duration_ms) for any recognized container —
    images carry dimensions (no duration), audio/video carry duration (no
    dimensions). None when no container matches (callers fall back)."""
    img = decode_image(payload)
    if img is not None:
        return img[2], img[0], img[1], None
    dur = decode_wav(payload)
    if dur is not None:
        return "wav", None, None, dur
    dur = decode_mp4(payload)
    if dur is not None:
        return "mp4", None, None, dur
    return None


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic (n_bytes, width, height, kind) from raw bytes — the
    stand-in for non-image payloads (audio/video codecs absent here).

    ``kind`` keys off the first *character* codepoint of the UTF-8-decoded
    payload (not the first raw byte): the oracle computes
    ``ascii(substr(text, 1, 1))``, and the two diverge for multi-byte
    leading characters (e.g. 'é' -> byte 195 vs codepoint 233)."""
    n = len(payload)
    text = payload.decode("utf-8", "replace")
    first = ord(text[0]) if text else 0
    return n, n % 640, n % 480, _KINDS[first % 3]


def extract_media_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas metadata extraction — one Arrow pass over the binary
    col; recognized containers (PNG/JPEG/GIF images, WAV audio, MP4 video)
    yield REAL header fields and the container name as kind, anything else
    the deterministic fallback (dims from byte length, NULL duration)."""

    def meta(payload: bytes) -> tuple[int, int | None, int | None, str, int | None]:
        m = decode_media(payload)
        if m is not None:
            kind, w, h, dur = m
            return len(payload), w, h, kind, dur
        n, w, h, kind = fake_decode_meta(payload)
        return n, w, h, kind, None

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [meta(bytes(b) if b is not None else b"") for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int64"),
                    "height": pd.array([m[2] for m in metas], dtype="Int64"),
                    "kind": [m[3] for m in metas],
                    "duration_ms": pd.array([m[4] for m in metas], dtype="Int64"),
                }
            )

    return df.mapInPandas(op, schema=META_SCHEMA)
