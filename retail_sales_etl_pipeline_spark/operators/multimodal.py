"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as what they are to the relational layer: a
``binary`` column plus metadata columns, processed by Arrow-batched
Pandas functions (`mapInPandas`). The Spark-side machinery — schema,
Arrow batch shape, partition-parallel feature extraction, deterministic
outputs — is real and tested. Media decode is REAL, pure stdlib:
``audio/wav`` (RIFF/PCM16 via the ``wave`` parser), ``image/bmp``
(24-bit BI_RGB with row padding and bottom-up row order undone) and
``image/png`` (zlib-inflated scanlines with full five-filter
unfiltering incl. Paeth, CRC-verified chunk walk) — see q156/q265,
whose features are computed from genuinely decoded samples and
oracle-checked end to end. The remaining compressed codecs
(jpeg/mp3/mp4) need libraries absent from this environment and raise
NotImplementedError honestly; ``_fake_decode`` remains for plumbing
tests of those mimes.

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


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """REAL audio decode, pure stdlib: parse a RIFF/WAVE container via the
    ``wave`` module (an actual chunk-walking parser, not a fake) and
    unpack PCM16 mono samples. Returns (sample_rate, samples).

    Only uncompressed PCM is supported — exactly what the stdlib parser
    handles; compressed codecs stay behind ``decode_media``'s
    NotImplementedError."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("only PCM16 mono supported")
        n = w.getnframes()
        rate = w.getframerate()
        frames = w.readframes(n)
    return rate, list(struct.unpack(f"<{n}h", frames))


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """REAL image decode, pure stdlib: parse an uncompressed 24-bit
    BI_RGB Windows BMP — magic, pixel-array offset, DIB dimensions,
    4-byte row padding, bottom-up row order — and return
    (width, height, pixel bytes in top-down row-major order).

    This undoes genuine container structure (padding + row inversion);
    a decoder that just sliced the payload would produce wrong bytes for
    any width not divisible by 4."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or height <= 0:
        raise ValueError("only uncompressed top-down-decodable 24-bit BMP")
    row_size = (width * 3 + 3) // 4 * 4
    out = bytearray()
    for y in range(height):  # logical top-down; stored bottom-up
        start = offset + (height - 1 - y) * row_size
        out += payload[start : start + width * 3]
    return width, height, bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick whichever of left/up/
    upper-left is closest to a + b - c, ties broken left, up, upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL compressed-image decode, pure stdlib: parse the PNG container
    (signature, IHDR, concatenated IDAT chunks with CRC verification),
    ``zlib``-inflate the filtered scanlines, and UNDO the per-row filter
    (all five types — None/Sub/Up/Average/Paeth) to recover raw pixels.
    Returns (width, height, color_type, pixel bytes top-down row-major).

    Supports the mainstream still-image profile: 8-bit depth, grayscale
    (color type 0) or truecolor RGB (type 2), non-interlaced. Anything
    else raises ValueError — a wrong answer is worse than no answer."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            # truncated chunk: slicing past the end would feed crc32 a
            # short buffer and unpack_from would raise struct.error —
            # the error contract here is ValueError
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            # comp/filt must both be 0 per the PNG spec; nonzero values
            # would be silently decoded under wrong assumptions otherwise
            if depth != 8 or color not in (0, 2) or interlace != 0 \
                    or comp != 0 or filt != 0:
                raise ValueError(
                    "only 8-bit gray/RGB non-interlaced PNG supported"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    bpp = 3 if color == 2 else 1
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data has wrong length")
    out = bytearray()
    prior = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        filt = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        recon = bytearray(stride)
        for i in range(stride):
            left = recon[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            elif ftype == 4:
                pred = _paeth(left, up, ul)
            else:
                raise ValueError(f"unknown PNG filter type {ftype}")
            recon[i] = (filt[i] + pred) & 0xFF
        out += recon
        prior = recon
    return width, height, color, bytes(out)


def encode_png(
    width: int, height: int, color: int, logical: bytes,
    filter_for_row=lambda y: 0,
) -> bytes:
    """Genuine PNG encoder (stdlib ``zlib`` + ``struct``): per-row filter
    type chosen by ``filter_for_row`` — the synthetic corpus cycles all
    five types, so decode round-trip proofs exercise Sub/Up/Average/Paeth
    unfiltering, not just the trivial None path."""
    import struct
    import zlib

    bpp = 3 if color == 2 else 1
    stride = width * bpp
    assert len(logical) == stride * height

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    scan = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = logical[y * stride : (y + 1) * stride]
        ftype = filter_for_row(y)
        scan.append(ftype)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, ul)
            scan.append((row[i] - pred) & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def decode_media(payload: bytes, mime: str):
    """Decode a media payload into samples/pixels.

    Pure-stdlib decoders exist for ``audio/wav`` (RIFF/PCM16 via the
    ``wave`` module), ``image/bmp`` (24-bit BI_RGB), and ``image/png``
    (zlib-inflate + full five-filter unfiltering, 8-bit gray/RGB
    non-interlaced). Remaining compressed codecs (jpeg/mp3/mp4) require
    libraries not present in this environment and stay honestly
    unimplemented."""
    if mime == "audio/wav":
        return decode_wav(payload)
    if mime == "image/bmp":
        return decode_bmp(payload)
    if mime == "image/png":
        return decode_png(payload)
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present "
        "in this environment (audio/wav, image/bmp and image/png decode "
        "natively; use _fake_decode for plumbing tests of other mimes)"
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


# ---------------------------------------------------------------------------
# Real end-to-end media path: deterministic synthetic WAV/BMP payloads,
# genuinely ENCODED into their container formats, round-tripped through a
# Spark binary column, and genuinely DECODED (stdlib RIFF/BMP parsers)
# inside the Arrow UDF. The sample/pixel values are a pure integer
# function of (doc_id, index), so a SQL oracle can recompute the exact
# features WITHOUT any decoder — a hash match proves the encode ->
# binary column -> decode round trip is lossless, container structure
# (row padding, bottom-up rows, RIFF chunks) and all.
# ---------------------------------------------------------------------------

# value(i) = (A * ((doc_id*P1 + i*P2) % M) + B) % range — every
# intermediate stays far below 2^63 on both engines (M ~ 1e6, A ~ 1.1e9).
MEDIA_LCG_A, MEDIA_LCG_B, MEDIA_LCG_M = 1_103_515_245, 12_345, 1_000_003
MEDIA_P1, MEDIA_P2 = 100_003, 104_729
WAV_RATE = 8_000


def synth_media_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic media ingestion source: even doc_ids get a PCM16
    mono WAV (200 + doc_id%57 samples), odd doc_ids a 24-bit BMP
    ((8 + doc_id%9) x (6 + doc_id%7)) — real container bytes built with
    struct, not placeholders. Self-contained batch fn (cwd-independent
    workers)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        A, B, M = 1_103_515_245, 12_345, 1_000_003
        P1, P2 = 100_003, 104_729

        def val(doc_id: int, i: int, mod: int) -> int:
            return (A * ((doc_id * P1 + i * P2) % M) + B) % mod

        def wav_bytes(doc_id: int) -> bytes:
            n = 200 + doc_id % 57
            samples = [val(doc_id, k, 65536) - 32768 for k in range(n)]
            data = struct.pack(f"<{n}h", *samples)
            hdr = (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                        16000, 2, 16)
                + b"data" + struct.pack("<I", len(data))
            )
            return hdr + data

        def bmp_bytes(doc_id: int) -> bytes:
            w, h = 8 + doc_id % 9, 6 + doc_id % 7
            logical = bytes(
                val(doc_id, i, 256) for i in range(w * h * 3)
            )
            row_size = (w * 3 + 3) // 4 * 4
            pad = b"\x00" * (row_size - w * 3)
            # stored bottom-up, each row padded to 4 bytes
            body = b"".join(
                logical[y * w * 3 : (y + 1) * w * 3] + pad
                for y in range(h - 1, -1, -1)
            )
            hdr = (
                b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(body), 2835, 2835, 0, 0)
            )
            return hdr + body

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    rows.append({"doc_id": did, "mime": "audio/wav",
                                 "payload": wav_bytes(did)})
                else:
                    rows.append({"doc_id": did, "mime": "image/bmp",
                                 "payload": bmp_bytes(did)})
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(
        per_batch, "doc_id long, mime string, payload binary"
    )


def media_decode_features(with_payload: DataFrame) -> DataFrame:
    """REAL decode inside the Arrow UDF: WAV via the stdlib ``wave``
    RIFF parser, BMP via struct DIB parsing (padding + bottom-up undo) —
    then integer-exact features over the decoded units: unit count
    (samples / pixels), value sum (sum |sample| / sum of channel bytes),
    value max. Self-contained batch fn (inline copies of the module's
    decode_wav/decode_bmp — workers must not need this package on their
    import path; unit tests pin the copies equal)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        def dec_wav(payload: bytes) -> tuple[int, list[int]]:
            with wave.open(io.BytesIO(payload), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise ValueError("only PCM16 mono supported")
                n = w.getnframes()
                rate = w.getframerate()
                frames = w.readframes(n)
            return rate, list(struct.unpack(f"<{n}h", frames))

        def dec_bmp(payload: bytes) -> tuple[int, int, bytes]:
            if payload[:2] != b"BM":
                raise ValueError("not a BMP payload")
            (offset,) = struct.unpack_from("<I", payload, 10)
            width, height = struct.unpack_from("<ii", payload, 18)
            (bpp,) = struct.unpack_from("<H", payload, 28)
            (compression,) = struct.unpack_from("<I", payload, 30)
            if bpp != 24 or compression != 0 or height <= 0:
                raise ValueError("unsupported BMP variant")
            row_size = (width * 3 + 3) // 4 * 4
            out = bytearray()
            for y in range(height):
                start = offset + (height - 1 - y) * row_size
                out += payload[start : start + width * 3]
            return width, height, bytes(out)

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                data = bytes(payload)
                if mime == "audio/wav":
                    rate, samples = dec_wav(data)
                    rows.append({
                        "doc_id": int(did), "mime": mime,
                        "n_units": len(samples),
                        "sum_val": sum(abs(s) for s in samples),
                        "max_val": max(abs(s) for s in samples),
                        "rate_or_width": rate,
                    })
                else:
                    w, h, px = dec_bmp(data)
                    rows.append({
                        "doc_id": int(did), "mime": mime,
                        "n_units": w * h,
                        "sum_val": sum(px),
                        "max_val": max(px),
                        "rate_or_width": w,
                    })
            yield pd.DataFrame(rows)

    return with_payload.mapInPandas(
        per_batch,
        "doc_id long, mime string, n_units long, sum_val long, "
        "max_val long, rate_or_width long",
    )


# Perceptual image hashing over REALLY decoded pixels. dHash (difference
# hash, the classic gradient fingerprint used for image near-dup): sample
# the decoded grayscale image on a PHASH_GY x PHASH_GX grid
# (nearest-neighbor, pure integer arithmetic), set bit (gy*8+gx) when the
# gray gradient between horizontally adjacent grid cells is positive —
# 8 comparisons x 7 rows = a 56-bit fingerprint (fits int64 on every
# engine). Brightness-robustness is demonstrated structurally: each image
# also gets a brightness-shifted TWIN (every channel byte min(255, b+10)),
# re-ENCODED into a genuine BMP container and re-decoded through the same
# parser — byte-level dedup (q141's sha256) can never match the twin to
# its original, while dHash does wherever clipping at 255 doesn't compress
# a sampled gradient away.
PHASH_GX, PHASH_GY = 9, 7
PHASH_SHIFT = 10


def perceptual_hashes(with_payload: DataFrame) -> DataFrame:
    """(doc_id, width, height, dhash, dhash_twin, dhash_twin_match,
    byte_twin_match) per image payload. Real decode -> integer grid
    resample -> 56-bit dHash, plus the brightness twin's full
    encode->decode round trip. Self-contained batch fn (inline decoder /
    encoder copies — workers must not need this package importable;
    tests pin the copies equal)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        def dec_bmp(payload: bytes) -> tuple[int, int, bytes]:
            if payload[:2] != b"BM":
                raise ValueError("not a BMP payload")
            (offset,) = struct.unpack_from("<I", payload, 10)
            width, height = struct.unpack_from("<ii", payload, 18)
            (bpp,) = struct.unpack_from("<H", payload, 28)
            (compression,) = struct.unpack_from("<I", payload, 30)
            if bpp != 24 or compression != 0 or height <= 0:
                raise ValueError("unsupported BMP variant")
            row_size = (width * 3 + 3) // 4 * 4
            out = bytearray()
            for y in range(height):
                start = offset + (height - 1 - y) * row_size
                out += payload[start : start + width * 3]
            return width, height, bytes(out)

        def enc_bmp(w: int, h: int, logical: bytes) -> bytes:
            row_size = (w * 3 + 3) // 4 * 4
            pad = b"\x00" * (row_size - w * 3)
            body = b"".join(
                logical[y * w * 3 : (y + 1) * w * 3] + pad
                for y in range(h - 1, -1, -1)
            )
            return (
                b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(body), 2835, 2835, 0, 0)
                + body
            )

        def grid_grays(w: int, h: int, px: bytes) -> list[list[int]]:
            g = [[0] * PHASH_GX for _ in range(PHASH_GY)]
            for gy in range(PHASH_GY):
                py = gy * (h - 1) // (PHASH_GY - 1)
                for gx in range(PHASH_GX):
                    pxx = gx * (w - 1) // (PHASH_GX - 1)
                    p = (py * w + pxx) * 3
                    g[gy][gx] = (px[p] + px[p + 1] + px[p + 2]) // 3
            return g

        def dhash(g: list[list[int]]) -> int:
            v = 0
            for gy in range(PHASH_GY):
                for gx in range(PHASH_GX - 1):
                    if g[gy][gx] > g[gy][gx + 1]:
                        v |= 1 << (gy * 8 + gx)
            return v

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                w, h, px = dec_bmp(data)
                twin_logical = bytes(min(255, b + PHASH_SHIFT) for b in px)
                twin_payload = enc_bmp(w, h, twin_logical)
                w2, h2, px2 = dec_bmp(twin_payload)
                d0 = dhash(grid_grays(w, h, px))
                d1 = dhash(grid_grays(w2, h2, px2))
                rows.append({
                    "doc_id": int(did), "width": w, "height": h,
                    "dhash": d0, "dhash_twin": d1,
                    "dhash_twin_match": d0 == d1,
                    "byte_twin_match": hashlib.sha256(data).digest()
                    == hashlib.sha256(twin_payload).digest(),
                })
            yield pd.DataFrame(rows)

    return with_payload.select("doc_id", "payload").mapInPandas(
        per_batch,
        "doc_id long, width long, height long, dhash long, dhash_twin long, "
        "dhash_twin_match boolean, byte_twin_match boolean",
    )


# ---------------------------------------------------------------------------
# PNG end-to-end path (round-11 closure of the compressed-codec gate):
# deterministic synthetic pixels (the same LCG value formula as WAV/BMP),
# genuinely ENCODED into PNG containers — zlib-compressed scanlines whose
# per-row filter type cycles through ALL FIVE filters (None/Sub/Up/
# Average/Paeth), so the round trip proves real unfiltering — then
# round-tripped through a Spark binary column and DECODED (chunk walk +
# CRC check + inflate + unfilter) inside the Arrow UDF. The SQL oracle
# recomputes the features from the value formula with no decoder.
# ---------------------------------------------------------------------------

PNG_FILTER_MOD = 5  # filter type for row y of doc d = (d + y) % 5


def synth_png_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic PNG ingestion source: even doc_ids get an 8-bit
    GRAYSCALE PNG (color type 0), odd doc_ids an 8-bit RGB PNG (color
    type 2), both (8 + doc_id%9) x (6 + doc_id%7), pixel stream
    val(doc_id, i, 256), per-row filter (doc_id + y) % 5. Self-contained
    batch fn (inline encoder copy — workers must not need this package
    importable; tests pin the copy equal to encode_png)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        A, B, M = 1_103_515_245, 12_345, 1_000_003
        P1, P2 = 100_003, 104_729

        def val(doc_id: int, i: int) -> int:
            return (A * ((doc_id * P1 + i * P2) % M) + B) % 256

        def paeth(a: int, b: int, c: int) -> int:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            if pb <= pc:
                return b
            return c

        def enc(width, height, color, logical, doc_id):
            bpp = 3 if color == 2 else 1
            stride = width * bpp

            def chunk(ctype, data):
                return (
                    struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(
                        ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
                    )
                )

            scan = bytearray()
            prior = bytes(stride)
            for y in range(height):
                row = logical[y * stride : (y + 1) * stride]
                ftype = (doc_id + y) % 5
                scan.append(ftype)
                for i in range(stride):
                    left = row[i - bpp] if i >= bpp else 0
                    up = prior[i]
                    ul = prior[i - bpp] if i >= bpp else 0
                    if ftype == 0:
                        pred = 0
                    elif ftype == 1:
                        pred = left
                    elif ftype == 2:
                        pred = up
                    elif ftype == 3:
                        pred = (left + up) // 2
                    else:
                        pred = paeth(left, up, ul)
                    scan.append((row[i] - pred) & 0xFF)
                prior = row
            ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(scan)))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 9, 6 + did % 7
                color = 0 if did % 2 == 0 else 2
                n = w * h * (3 if color == 2 else 1)
                logical = bytes(val(did, i) for i in range(n))
                rows.append({
                    "doc_id": did, "mime": "image/png",
                    "color_type": color,
                    "payload": enc(w, h, color, logical, did),
                })
            yield pd.DataFrame(rows)

    return docs.select("doc_id").mapInPandas(
        per_batch,
        "doc_id long, mime string, color_type int, payload binary",
    )


def png_decode_features(with_payload: DataFrame) -> DataFrame:
    """REAL PNG decode inside the Arrow UDF — chunk walk with CRC
    verification, zlib inflate, five-filter unfiltering — then
    integer-exact features over the decoded pixel stream: pixel count,
    channel-byte sum, channel-byte max, width. Self-contained batch fn
    (inline decoder copy; tests pin it equal to decode_png)."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def paeth(a: int, b: int, c: int) -> int:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            if pb <= pc:
                return b
            return c

        def dec(payload: bytes):
            if payload[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG payload")
            pos, width = 8, None
            idat = bytearray()
            while pos + 8 <= len(payload):
                (length,) = struct.unpack_from(">I", payload, pos)
                if pos + 12 + length > len(payload):
                    raise ValueError("truncated PNG chunk")
                ctype = payload[pos + 4 : pos + 8]
                data = payload[pos + 8 : pos + 8 + length]
                (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
                if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                    raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
                if ctype == b"IHDR":
                    width, height, depth, color, comp, filt, inter = (
                        struct.unpack(">IIBBBBB", data)
                    )
                    if depth != 8 or color not in (0, 2) or inter != 0 \
                            or comp != 0 or filt != 0:
                        raise ValueError("unsupported PNG profile")
                elif ctype == b"IDAT":
                    idat += data
                elif ctype == b"IEND":
                    break
                pos += 12 + length
            if width is None:
                raise ValueError("PNG missing IHDR")
            bpp = 3 if color == 2 else 1
            stride = width * bpp
            raw = zlib.decompress(bytes(idat))
            if len(raw) != (stride + 1) * height:
                raise ValueError("PNG scanline data has wrong length")
            out = bytearray()
            prior = bytes(stride)
            for y in range(height):
                ftype = raw[y * (stride + 1)]
                filt = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
                recon = bytearray(stride)
                for i in range(stride):
                    left = recon[i - bpp] if i >= bpp else 0
                    up = prior[i]
                    ul = prior[i - bpp] if i >= bpp else 0
                    if ftype == 0:
                        pred = 0
                    elif ftype == 1:
                        pred = left
                    elif ftype == 2:
                        pred = up
                    elif ftype == 3:
                        pred = (left + up) // 2
                    elif ftype == 4:
                        pred = paeth(left, up, ul)
                    else:
                        raise ValueError(f"unknown PNG filter {ftype}")
                    recon[i] = (filt[i] + pred) & 0xFF
                out += recon
                prior = recon
            return width, height, color, bytes(out)

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, color, px = dec(bytes(payload))
                rows.append({
                    "doc_id": int(did),
                    "color_type": color,
                    "width": w,
                    "height": h,
                    "n_units": w * h,
                    "sum_val": sum(px),
                    "max_val": max(px),
                })
            yield pd.DataFrame(rows)

    return with_payload.select("doc_id", "payload").mapInPandas(
        per_batch,
        "doc_id long, color_type int, width long, height long, "
        "n_units long, sum_val long, max_val long",
    )
