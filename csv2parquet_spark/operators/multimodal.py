"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.8).

Payloads are opaque ``BinaryType`` columns with typed metadata. The
decode / feature-extract step runs as an Arrow-batched ``mapInPandas``
(the scalable shape: executor-side, batch-at-a-time, no driver
round-trip). The actual codecs (PIL/ffmpeg/librosa) are NOT in this
container, so ``_fake_decode`` produces deterministic metadata from the
payload bytes — clearly marked; swap in a real codec by replacing that
one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id bigint, payload_bytes int, width int, height int, channels int, format string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decode: deterministic pseudo-metadata from the content hash.

    Replace with a real image decode (e.g. PIL.Image.open) when codecs
    are available; the signature (bytes → width, height, channels,
    format) is the contract.
    """
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192          # 64..255
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 4          # 1..4
    fmt = ("png", "jpeg", "webp", "tiff")[h[3] % 4]
    return width, height, channels, fmt


def decode_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Batch-decode binary payloads into typed metadata via mapInPandas.

    Arrow batches stream through the Python worker; each batch is
    processed vectorized-ish (a tight loop over the batch, not per-row
    Python UDF serialization). Partitioning is preserved — no shuffle.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload_bytes": [len(p) for p in pdf[payload_col]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "format": [m[3] for m in meta],
                }
            )
            yield out

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)
