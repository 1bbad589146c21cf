"""Multimodal (image/audio/video) column plumbing for the training-data
pipeline.

Media payloads are opaque ``binary`` columns with typed metadata, exactly as
they would arrive from a crawl (the reference stores media only as URL refs —
``Parse_Data_FaceBook/Parser.py:52-63`` — our ``spans.media_ref``; a real
pipeline downloads those refs into binary columns).

The Spark-side plumbing here is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior. The codec step itself is
STUBBED — the sandbox has no image/audio libraries — behind
``_decode_payload``: a deterministic fake "decoder" that derives features from
the bytes. Swapping in PIL/torchvision/ffmpeg is a local change inside the
batch function; nothing in the plan changes.

At 100 TB scale the decode stage is the canonical Arrow-batched Python hop:
keep batches large (``spark.sql.execution.arrow.maxRecordsPerBatch``), size
partitions so one batch of decoded frames fits executor memory, and partition
by content hash so retries are deterministic.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd

FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, "
    "feat_hash string, ok boolean"
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff",
    b"GIF8": "gif",
}


def _sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload.startswith(magic):
            return name
    return "unknown"


def _decode_payload(payload: bytes) -> dict:
    """STUB decode. Deterministic fake features derived from the bytes:

    - ``width``/``height``: pseudo-dimensions from a digest (stands in for the
      decoded frame size);
    - ``feat_hash``: hex digest prefix (stands in for an embedding).

    A real implementation decodes here (PIL.Image.open / torchaudio / pyav)
    and must raise on corrupt input exactly like this stub's ``ValueError``
    path, so the ``ok`` error-channel semantics are already final.
    """
    if payload is None:
        raise ValueError("null payload")
    d = hashlib.blake2b(payload, digest_size=16).digest()
    return {
        "format": _sniff_format(payload),
        "width": 16 + d[0] % 240,
        "height": 16 + d[1] % 240,
        "feat_hash": d.hex()[:16],
    }


def decode_features_batches(
    iterator: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas fn: (doc_id, media_bytes) → one feature row per payload.

    Per-row failures land in the ``ok=False`` error channel instead of
    failing the stage — at scale a fraction of payloads is always corrupt and
    a task retry cannot fix data."""
    for pdf in iterator:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
            try:
                f = _decode_payload(bytes(payload) if payload is not None else None)
                rows.append((int(doc_id), len(payload), f["format"], f["width"],
                             f["height"], f["feat_hash"], True))
            except (ValueError, TypeError):
                rows.append((int(doc_id), 0, "error", 0, 0, "", False))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "format", "width", "height",
                     "feat_hash", "ok"],
        )


def decode_features(df):
    """(doc_id, media_bytes: binary) → decoded feature rows."""
    return df.mapInPandas(decode_features_batches, FEATURES_SCHEMA)
