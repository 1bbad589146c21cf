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

    The digest is md5 (not a keyed/crypto choice — the decode is fake
    anyway) so the catalog's media queries get REAL cross-engine oracles:
    DuckDB computes the same md5 over the same payload bytes and replays
    the dimension arithmetic in plain SQL (queries.py ORACLE_MEDIA_*).

    A real implementation decodes here (PIL.Image.open / torchaudio / pyav)
    and must raise on corrupt input exactly like this stub's ``ValueError``
    path, so the ``ok`` error-channel semantics are already final.
    """
    if payload is None:
        raise ValueError("null payload")
    d = hashlib.md5(payload).digest()
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


# --- resize (image) --------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id long, orig_width int, orig_height int, width int, height int, "
    "resized_hash string, ok boolean"
)


def _resize_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit into a max_side box (integer floor math, the
    same contract PIL's ``thumbnail`` honors); never upscales."""
    longest = max(w, h)
    if longest <= max_side:
        return w, h
    return max(1, (w * max_side) // longest), max(1, (h * max_side) // longest)


def make_resize_batches(max_side: int):
    """mapInPandas fn factory: (doc_id, media_bytes) → one row per payload
    with original + resized dimensions and a digest of the (stub) resized
    pixels. The geometry is real; only the pixel resample is faked (digest
    over payload + target dims, where PIL's ``Image.resize`` would run)."""

    def batches(iterator: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                try:
                    b = bytes(payload) if payload is not None else None
                    f = _decode_payload(b)
                    w, h = _resize_dims(f["width"], f["height"], max_side)
                    # ASCII ":WxH" salt (not packed bytes) so the DuckDB
                    # oracle can rebuild the digest input by string concat
                    rh = hashlib.md5(
                        b + f":{w}x{h}".encode()
                    ).hexdigest()[:16]
                    rows.append(
                        (int(doc_id), f["width"], f["height"], w, h, rh, True)
                    )
                except (ValueError, TypeError):
                    rows.append((int(doc_id), 0, 0, 0, 0, "", False))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "orig_width", "orig_height", "width",
                         "height", "resized_hash", "ok"],
            )

    return batches


def resize_images(df, max_side: int = 224):
    """(doc_id, media_bytes: binary) → aspect-preserving resize rows."""
    return df.mapInPandas(make_resize_batches(max_side), RESIZE_SCHEMA)


# --- frame sampling (video) ------------------------------------------------

FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, ts_ms long, frame_hash string, ok boolean"
)


def make_frame_sample_batches(n_frames: int):
    """mapInPandas fn factory: (doc_id, media_bytes) → up to ``n_frames``
    rows per payload (a UDTF shape: one input row fans out to N). The stub
    derives a pseudo-duration from the payload digest and samples frames at
    evenly spaced timestamps — exactly the row shape a pyav/ffmpeg keyframe
    sampler emits, so swapping the real decoder changes no plan or schema.
    Corrupt payloads yield a single ok=False row (the error channel must
    survive the fan-out, or failed docs silently vanish from the output)."""

    def batches(iterator: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                try:
                    b = bytes(payload) if payload is not None else None
                    if b is None:
                        raise ValueError("null payload")
                    d = hashlib.md5(b).digest()
                    duration_ms = 1000 + int.from_bytes(d[2:5], "big") % 59000
                    for i in range(n_frames):
                        ts = (duration_ms * i) // n_frames
                        # ASCII ":frameN" salt — see make_resize_batches
                        fh = hashlib.md5(
                            b + f":frame{i}".encode()
                        ).hexdigest()[:16]
                        rows.append((int(doc_id), i, ts, fh, True))
                except (ValueError, TypeError):
                    rows.append((int(doc_id), -1, -1, "", False))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "ts_ms", "frame_hash", "ok"],
            )

    return batches


def sample_frames(df, n_frames: int = 8):
    """(doc_id, media_bytes: binary) → evenly spaced sampled-frame rows."""
    return df.mapInPandas(make_frame_sample_batches(n_frames), FRAMES_SCHEMA)
