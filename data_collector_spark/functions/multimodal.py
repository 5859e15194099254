"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with metadata extracted by
Arrow-batched pandas UDFs over ``mapInPandas`` — the same shape as the
crawler's html handling. The actual codecs (Pillow/ffmpeg/librosa) are NOT
in this container, so the decode step is STUBBED:

- ``decode_image`` raises NotImplementedError (the production seam);
- ``fake_decode_meta`` is the deterministic stand-in used by tests and
  queries — it derives (width, height, kind) purely from the byte content,
  so the Spark-side plumbing (schema, batch shape, partitioning) is real
  and oracle-checkable even though no pixels are decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id bigint, n_bytes bigint, width bigint, height bigint, kind string"

_KINDS = ["image", "audio", "video"]


def decode_image(payload: bytes):
    """Production decode seam — requires an image codec, absent here."""
    raise NotImplementedError(
        "image decoding requires Pillow/libjpeg, not present in this runtime; "
        "use fake_decode_meta for the deterministic metadata path"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic (n_bytes, width, height, kind) from raw bytes.

    ``kind`` keys off the first *character* codepoint of the UTF-8-decoded
    payload (not the first raw byte): the oracle computes
    ``ascii(substr(text, 1, 1))``, and the two diverge for multi-byte
    leading characters (e.g. 'é' -> byte 195 vs codepoint 233)."""
    n = len(payload)
    text = payload.decode("utf-8", "replace")
    first = ord(text[0]) if text else 0
    return n, n % 640, n % 480, _KINDS[first % 3]


def extract_media_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas metadata extraction — one Arrow pass over the binary col."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(bytes(b) if b is not None else b"") for b in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "kind": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(op, schema=META_SCHEMA)
