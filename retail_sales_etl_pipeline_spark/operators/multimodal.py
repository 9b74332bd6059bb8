"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as what they are to the relational layer: a
``binary`` column plus metadata columns, processed by Arrow-batched
Pandas functions (`mapInPandas`). The Spark-side machinery — schema,
Arrow batch shape, partition-parallel feature extraction, deterministic
outputs — is real and tested; the actual media *decode* step is stubbed
(`decode_media` raises NotImplementedError: no image/audio libraries in
this environment) with a deterministic fake decoder used by tests and the
registered query.

Scale notes: payloads never pass through the driver; each Arrow batch
holds only ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows, so
memory is bounded regardless of blob size skew. Feature extraction is a
narrow map — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, header_hex string, "
    "fake_tokens long"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Simulate binary ingestion: utf-8 payload bytes + media metadata.

    In a real pipeline this column comes from the source (image bytes in
    parquet/webdataset); everything downstream only assumes `binary`.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def decode_media(payload: bytes, mime: str):
    """Decode a media payload into pixels/samples.

    STUB: media codecs (PIL/ffmpeg/librosa) are not available in this
    environment. The Spark-side contract (binary in, array out, batch
    shape) is exercised via ``_fake_decode``.
    """
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present "
        "in this environment; use _fake_decode for plumbing tests"
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in features derived from raw bytes."""
    return {
        "n_bytes": len(payload),
        "header_hex": payload[:4].hex().upper(),
        "fake_tokens": len(payload) // 4,
    }


FRAME_BYTES = 16
FRAME_STRIDE = 32
MAX_FRAMES = 4


def frame_sample(
    with_payload: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Fixed-stride frame sampling over binary payloads — the row-EXPANDING
    mapInPandas shape a real video pipeline has (N input rows → up to
    N*max_frames output rows), with bounded frames per payload so one huge
    blob cannot blow up a batch.

    Real decoders (ffmpeg keyframe extraction) are stubbed like
    ``decode_media``; the sampled "frames" are raw byte windows and the
    per-frame features deterministic byte math, so the full plumbing —
    offsets, bounding, short tail frames, schema — is oracle-checkable.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb, st, mf = frame_bytes, stride, max_frames

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for k in range(mf):
                    off = k * st
                    if off >= len(data):
                        break
                    frame = data[off : off + fb]
                    rows.append(
                        {
                            "doc_id": did,
                            "frame_idx": k,
                            "offset_bytes": off,
                            "frame_hex8": frame[:4].hex().upper(),
                            "frame_byte_sum": sum(frame),
                        }
                    )
            yield pd.DataFrame(rows)

    return with_payload.select("doc_id", "payload").mapInPandas(
        per_batch,
        "doc_id long, frame_idx int, offset_bytes long, "
        "frame_hex8 string, frame_byte_sum long",
    )


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The batch function is fully self-contained (no references to this
    module's globals): cloudpickle ships nested functions by value, so
    worker Python processes need no import of this package — required
    when the driver runs from an arbitrary working directory.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_decode(payload: bytes) -> dict:
            return {
                "n_bytes": len(payload),
                "header_hex": payload[:4].hex().upper(),
                "fake_tokens": len(payload) // 4,
            }

        for pdf in batches:
            if pdf.empty:
                continue
            feats = [fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "mime", pdf["mime"].to_numpy())
            yield out

    return with_payload.mapInPandas(per_batch, FEATURE_SCHEMA)


RESIZE_SAMPLES = 32


def resize_payload(
    with_payload: DataFrame, samples: int = RESIZE_SAMPLES
) -> DataFrame:
    """Nearest-neighbor "resize" of binary payloads to a fixed sample
    count — the normalize-before-batching step every image/audio training
    pipeline has (images → fixed resolution, audio → fixed sample rate)
    so downstream tensors are rectangular.

    Real resampling (PIL.resize / librosa.resample) is stubbed like
    ``decode_media``: here the payload's bytes ARE the signal, sampled at
    indices floor(j*n/samples) — the exact index arithmetic of
    nearest-neighbor interpolation, so the full plumbing (Arrow batch in,
    fixed-width vector out, short-payload handling) is deterministic and
    oracle-checkable. Map-side only; output width is constant regardless
    of input size, which is the point."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = samples

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data)
                if n == 0:
                    continue
                vals = [data[(j * n) // k] for j in range(k)]
                rows.append(
                    {
                        "doc_id": did,
                        "n_bytes": n,
                        "resized_csv": ",".join(str(v) for v in vals),
                        "resized_sum": sum(vals),
                    }
                )
            yield pd.DataFrame(rows)

    return with_payload.select("doc_id", "payload").mapInPandas(
        per_batch,
        "doc_id long, n_bytes long, resized_csv string, resized_sum long",
    )
