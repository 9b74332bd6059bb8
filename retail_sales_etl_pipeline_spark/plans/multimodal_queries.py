"""Multimodal query: binary-payload feature extraction via mapInPandas,
oracle-checked against pure-SQL byte math (the fake features are chosen to
be SQL-computable, so the Arrow plumbing itself is what gets verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    MAX_FRAMES,
    RESIZE_SAMPLES,
    attach_payload,
    extract_features,
    frame_sample,
    resize_payload,
)
from ..sources import load_table
from .registry import register


@register(
    "q37_multimodal_features",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substring(hex(encode(text)), 1, 8) AS header_hex,
           CAST(octet_length(encode(text)) // 4 AS BIGINT) AS fake_tokens
    FROM documents
    """,
    doc="Multimodal plumbing: documents carried as opaque binary payloads "
    "+ mime metadata, features extracted by an Arrow-batched mapInPandas "
    "(real decode stubbed - no codecs in this environment; features are "
    "deterministic byte math so the oracle checks the full binary path: "
    "encode -> Arrow transfer -> per-batch pandas -> result schema).",
    tags=("multimodal", "pandas-udf"),
)
def q37_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


# hex-pair -> byte value in portable SQL: 16*digit(hi) + digit(lo) with
# digit = strpos('0123456789ABCDEF', ch) - 1 (identical in both dialects)
_HEXDIGITS = "0123456789ABCDEF"


@register(
    "q51_multimodal_frames",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    f AS (
      SELECT doc_id, k AS frame_idx, k * {FRAME_STRIDE} AS offset_bytes,
             substring(h, k * {FRAME_STRIDE} * 2 + 1, {FRAME_BYTES} * 2) AS fh
      FROM p, range(0, {MAX_FRAMES}) t(k)
      WHERE k * {FRAME_STRIDE} < n
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(offset_bytes AS BIGINT) AS offset_bytes,
           substring(fh, 1, 8) AS frame_hex8,
           CAST(list_sum(list_transform(range(1, len(fh) // 2 + 1),
                i -> (strpos('{_HEXDIGITS}', substring(fh, 2 * i - 1, 1)) - 1) * 16
                   + (strpos('{_HEXDIGITS}', substring(fh, 2 * i, 1)) - 1)))
                AS BIGINT) AS frame_byte_sum
    FROM f
    """,
    doc=f"Frame sampling over binary payloads: fixed-stride "
    f"({FRAME_STRIDE}B) windows of {FRAME_BYTES}B, max {MAX_FRAMES} frames "
    f"per payload — the row-expanding mapInPandas shape of video keyframe "
    f"extraction, with per-payload bounding so blob skew can't blow up a "
    f"batch. Short tail frames included. The oracle recomputes every "
    f"frame offset, header, and byte sum from the hex of the same bytes, "
    f"so the full expand-and-slice plumbing is hash-verified.",
    tags=("multimodal", "pandas-udf"),
)
def q51_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_payload(docs))


@register(
    "q81_multimodal_resize",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
      WHERE octet_length(encode(text)) > 0
    ),
    s AS (
      SELECT doc_id, n, j, ((j * n) // {RESIZE_SAMPLES}) AS idx
      FROM p, range(0, {RESIZE_SAMPLES}) t(j)
    ),
    v AS (
      SELECT s.doc_id, s.n, s.j,
             (strpos('{_HEXDIGITS}', substring(p.h, s.idx * 2 + 1, 1)) - 1) * 16
           + (strpos('{_HEXDIGITS}', substring(p.h, s.idx * 2 + 2, 1)) - 1)
               AS val
      FROM s JOIN p USING (doc_id)
    )
    SELECT doc_id,
           CAST(MIN(n) AS BIGINT) AS n_bytes,
           string_agg(val, ',' ORDER BY j) AS resized_csv,
           CAST(SUM(val) AS BIGINT) AS resized_sum
    FROM v GROUP BY doc_id
    """,
    doc=f"Multimodal resize stub (operators.multimodal.resize_payload): "
    f"every payload normalized to {RESIZE_SAMPLES} nearest-neighbor byte "
    "samples (index floor(j*n/k) — the exact arithmetic of NN "
    "interpolation; real PIL/librosa resampling is stubbed, no codecs "
    "here). Map-side Arrow pass, constant output width regardless of "
    "input size — the rectangularity a training batcher needs. The "
    "oracle recomputes the sampled bytes from hex in SQL, checking the "
    "whole binary path bit-for-bit.",
    tags=("multimodal", "pandas-udf"),
)
def q81_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_payload(attach_payload(docs))


from pyspark.sql import functions as F  # noqa: E402

PAYLOAD_PREFIX_BYTES = 100


@register(
    "q141_payload_dedup",
    oracle=f"""
    SELECT sha256(substring(hex(encode(text)), 1, {PAYLOAD_PREFIX_BYTES * 2}))
               AS payload_digest,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS bytes_held
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
    doc=f"Multimodal payload dedup: binary payloads keyed by a digest of "
    f"their first {PAYLOAD_PREFIX_BYTES} bytes (leading-content "
    "fingerprint — headers plus initial content; re-encoded or "
    "re-suffixed copies of the same asset share it while full-file "
    "hashes differ), reporting survivor, copy count, and the bytes a "
    "dedup would reclaim. The binary sibling of q110's text provenance: "
    "for image/audio/video lakes this digest-of-prefix pass is the "
    "cheap first rung before perceptual hashing. The payload rides as "
    "opaque binary (q37's column); both engines hash the identical hex "
    "prefix, so the digest parity proves the binary path end-to-end. "
    "Scale shape: digests computed map-side; only 64-hex keys and "
    "per-group byte totals shuffle — never payloads.",
    tags=("multimodal", "dedup"),
)
def q141_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    digest = F.sha2(
        F.expr(f"substring(hex(payload), 1, {PAYLOAD_PREFIX_BYTES * 2})"), 256
    )
    return (
        with_payload.groupBy(digest.alias("payload_digest"))
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.sum(F.length("payload")).cast("long").alias("bytes_held"),
        )
        .filter(F.col("n_copies") > 1)
    )


from ..operators.multimodal import (  # noqa: E402
    MEDIA_LCG_A,
    MEDIA_LCG_B,
    MEDIA_LCG_M,
    MEDIA_P1,
    MEDIA_P2,
    WAV_RATE,
    media_decode_features,
    synth_media_payloads,
)

# The oracle recomputes features from the VALUE FORMULA (a pure integer
# function of doc_id and index) — no decoder on the SQL side. A hash
# match therefore proves the whole media path: encode into a real
# RIFF/BMP container -> Spark binary column -> Arrow batch -> stdlib
# decode (chunk walk, row-padding/bottom-up undo) -> features.
_VAL = (
    f"(({MEDIA_LCG_A} * ((doc_id * {MEDIA_P1} + i * {MEDIA_P2}) "
    f"% {MEDIA_LCG_M}) + {MEDIA_LCG_B}) % {{mod}})"
)


@register(
    "q156_media_decode_features",
    oracle=f"""
    WITH wav AS (
      SELECT doc_id, 200 + doc_id % 57 AS n FROM documents
      WHERE doc_id % 2 = 0
    ),
    wav_vals AS (
      SELECT w.doc_id, abs({_VAL.format(mod=65536)} - 32768) AS v
      FROM wav w, unnest(range(0, w.n)) AS t(i)
    ),
    wav_feat AS (
      SELECT doc_id, 'audio/wav' AS mime,
             CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(v) AS BIGINT) AS sum_val,
             CAST(MAX(v) AS BIGINT) AS max_val,
             CAST({WAV_RATE} AS BIGINT) AS rate_or_width
      FROM wav_vals GROUP BY doc_id
    ),
    bmp AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
      FROM documents WHERE doc_id % 2 = 1
    ),
    bmp_vals AS (
      SELECT b.doc_id, b.w, b.h, {_VAL.format(mod=256)} AS v
      FROM bmp b, unnest(range(0, b.w * b.h * 3)) AS t(i)
    ),
    bmp_feat AS (
      SELECT doc_id, 'image/bmp' AS mime,
             CAST(MIN(w) * MIN(h) AS BIGINT) AS n_units,
             CAST(SUM(v) AS BIGINT) AS sum_val,
             CAST(MAX(v) AS BIGINT) AS max_val,
             CAST(MIN(w) AS BIGINT) AS rate_or_width
      FROM bmp_vals GROUP BY doc_id
    )
    SELECT * FROM wav_feat UNION ALL SELECT * FROM bmp_feat
    """,
    doc="REAL media decode end to end (no stub in this path): every even "
    "doc gets a genuine PCM16 RIFF/WAV payload, every odd doc a genuine "
    "24-bit BI_RGB BMP — actual container bytes with chunk headers, row "
    "padding and bottom-up row order — round-tripped through a Spark "
    "binary column and DECODED inside the Arrow UDF with pure-stdlib "
    "parsers (the wave module's RIFF chunk walk; struct-level DIB "
    "parsing that must undo padding and row inversion to recover the "
    "pixels). Features are integer-exact over the DECODED units "
    "(sample/pixel count, |value| sum, max); the oracle recomputes them "
    "from the deterministic value formula with no decoder, so the hash "
    "match proves the encode->binary->decode round trip is lossless. "
    "Compressed codecs (jpeg/mp3) remain honestly NotImplemented — no "
    "codec libraries ship here; the plan shape is identical when they "
    "slot in. Scale shape: two narrow map stages (synthesize, decode), "
    "zero shuffle, payloads never touch the driver, batch memory "
    "bounded by Arrow batch size.",
    tags=("multimodal", "pandas-udf", "decode"),
)
def q156_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return media_decode_features(synth_media_payloads(docs))


from ..operators.multimodal import (  # noqa: E402
    PHASH_GX,
    PHASH_GY,
    PHASH_SHIFT,
    perceptual_hashes,
)


def _px_val(idx_sql: str) -> str:
    """Channel byte at logical pixel-stream index ``idx_sql`` — the
    generator's closed-form value, evaluated with no decoder."""
    return (
        f"(({MEDIA_LCG_A} * ((doc_id * {MEDIA_P1} + ({idx_sql}) * {MEDIA_P2}) "
        f"% {MEDIA_LCG_M}) + {MEDIA_LCG_B}) % 256)"
    )


_G_ORIG = "({} + {} + {}) // 3".format(
    *(_px_val(f"3 * (py * w + px) + {k}") for k in range(3))
)
_G_TWIN = "({} + {} + {}) // 3".format(
    *(f"least(255, {_px_val(f'3 * (py * w + px) + {k}')} + {PHASH_SHIFT})"
      for k in range(3))
)


@register(
    "q159_perceptual_hash_twins",
    oracle=f"""
    WITH bmp AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
      FROM documents WHERE doc_id % 2 = 1
    ),
    grid AS (
      SELECT b.doc_id, b.w, b.h, gy.gy, gx.gx,
             (gy.gy * (b.h - 1)) // {PHASH_GY - 1} AS py,
             (gx.gx * (b.w - 1)) // {PHASH_GX - 1} AS px
      FROM bmp b,
           unnest(range(0, {PHASH_GY})) AS gy(gy),
           unnest(range(0, {PHASH_GX})) AS gx(gx)
    ),
    gray AS (
      SELECT doc_id, gy, gx, {_G_ORIG} AS g, {_G_TWIN} AS gt
      FROM grid
    ),
    bits AS (
      SELECT doc_id, gy, gx, g, gt,
             LEAD(g) OVER (PARTITION BY doc_id, gy ORDER BY gx) AS gn,
             LEAD(gt) OVER (PARTITION BY doc_id, gy ORDER BY gx) AS gtn
      FROM gray
    ),
    hashes AS (
      SELECT doc_id,
             CAST(COALESCE(SUM(CASE WHEN g > gn
                 THEN (CAST(1 AS BIGINT) << (gy * 8 + gx)) END), 0)
                 AS BIGINT) AS dhash,
             CAST(COALESCE(SUM(CASE WHEN gt > gtn
                 THEN (CAST(1 AS BIGINT) << (gy * 8 + gx)) END), 0)
                 AS BIGINT) AS dhash_twin
      FROM bits WHERE gx < {PHASH_GX - 1} GROUP BY doc_id
    )
    SELECT h.doc_id, CAST(b.w AS BIGINT) AS width,
           CAST(b.h AS BIGINT) AS height, h.dhash, h.dhash_twin,
           h.dhash = h.dhash_twin AS dhash_twin_match,
           FALSE AS byte_twin_match
    FROM hashes h JOIN bmp b USING (doc_id)
    """,
    doc="Perceptual image fingerprinting over REALLY decoded pixels: "
    "every BMP payload is container-decoded (padding + bottom-up undo), "
    f"grid-resampled to {PHASH_GY}x{PHASH_GX} grayscale with pure "
    "integer nearest-neighbor arithmetic, and hashed into a 56-bit "
    "dHash (horizontal gray-gradient sign bits) — the standard "
    "image-near-dup key: group/band on it exactly like q20's sha256 or "
    "q84's SimHash hamming machinery, which byte-exact dedup cannot do "
    "for re-encoded or brightness-shifted copies. Each image also gets "
    f"a brightness twin (channel bytes min(255, b+{PHASH_SHIFT})) "
    "re-encoded into a genuine BMP container and re-decoded through the "
    "same parser: sha256 never matches twin to original (the oracle "
    "proves it by pinning byte_twin_match FALSE — any true would "
    "hash-mismatch), while dHash matches wherever 255-clipping doesn't "
    "erase a sampled gradient. The oracle recomputes both hashes from "
    "the generator's closed-form pixel values with NO decoder — and "
    "needs only the 63 sampled grid pixels per image, never the full "
    "raster — so a hash match proves the decode -> resample -> hash "
    "path bit-exactly. Scale shape: two narrow map stages (synthesize, "
    "decode+hash), zero shuffle, payloads never leave the executor; "
    "compressed codecs stay honestly NotImplemented (no codec libs "
    "here) and would slot into the same plan.",
    tags=("multimodal", "pandas-udf", "dedup", "decode"),
)
def q159_perceptual_hash_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    imgs = synth_media_payloads(docs).filter(F.col("mime") == "image/bmp")
    return perceptual_hashes(imgs)


# ---------------------------------------------------------------------------
# PNG decode features (q265) — round-11 closure of the compressed-codec
# gate: the pixels travel zlib-COMPRESSED inside a genuine PNG container
# whose per-row filter type cycles through all five PNG filters, so the
# hash match proves chunk-walk + CRC + inflate + Sub/Up/Average/Paeth
# unfiltering are all correct (a decoder that skipped unfiltering would
# produce wrong sums for every doc with a non-zero filter row, which is
# every doc with height > 1).
# ---------------------------------------------------------------------------

from ..operators.multimodal import (  # noqa: E402
    png_decode_features,
    synth_png_payloads,
)


@register(
    "q265_png_decode_features",
    oracle=f"""
    WITH png AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS color_type,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS bpp
      FROM documents
    ),
    vals AS (
      SELECT p.doc_id, p.w, p.h, p.color_type,
             {_VAL.format(mod=256)} AS v
      FROM png p, unnest(range(0, p.w * p.h * p.bpp)) AS t(i)
    )
    SELECT doc_id,
           CAST(MIN(color_type) AS INTEGER) AS color_type,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(MIN(w) * MIN(h) AS BIGINT) AS n_units,
           CAST(SUM(v) AS BIGINT) AS sum_val,
           CAST(MAX(v) AS BIGINT) AS max_val
    FROM vals GROUP BY doc_id
    """,
    doc="REAL compressed-image decode end to end: every doc gets a "
    "genuine PNG payload (stdlib zlib + struct encoder — even docs "
    "8-bit grayscale, odd docs 8-bit RGB, per-row filter type "
    "(doc_id + y) % 5 so all five PNG filters appear), round-tripped "
    "through a Spark binary column and DECODED inside the Arrow UDF "
    "with a pure-stdlib parser: signature, CRC-verified chunk walk, "
    "IDAT concatenation, zlib inflate, and per-row UNfiltering "
    "(None/Sub/Up/Average/Paeth — RFC 2083 §6). Features are "
    "integer-exact over the decoded pixel stream (pixel count, "
    "channel-byte sum and max); the oracle recomputes them from the "
    "deterministic value formula with NO decoder, so the hash match "
    "proves the compress->container->decode round trip is lossless. "
    "This closed the round-10 capability gate (q272's JPEG decoder "
    "then narrowed the NotImplementedError to mp3/mp4). Scale shape: "
    "two narrow map stages (synthesize, decode), zero shuffle, "
    "payloads never touch the driver, batch memory bounded by Arrow "
    "batch size.",
    tags=("multimodal", "pandas-udf", "decode"),
)
def q265_png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return png_decode_features(synth_png_payloads(docs))


# ---------------------------------------------------------------------------
# JPEG decode features (q272) — round-12 closure of the image-codec gate
# (the last honest NotImplementedError now covers mp3/mp4 only). The
# corpus is BLOCK-CONSTANT by construction because that is the one image
# family whose baseline-JPEG round trip is EXACT (DC quant step 8 =>
# quantized DC is the integer v-128; a DC-only IDCT is flat to <1e-12
# before rounding), so the formula oracle can prove the whole entropy-
# coded path — standard Huffman tables, differential DC, byte stuffing,
# dequant, zigzag, IDCT, and for odd docs the YCbCr->RGB transform with
# constant-128 chroma — with NO decoder on the SQL side. The general AC
# path (runs, ZRL, EOB, nonzero frequencies) is pinned by unit tests
# against an independent numpy DCT reference (test_media_decode).
# ---------------------------------------------------------------------------

from ..operators.multimodal import (  # noqa: E402
    jpeg_decode_features,
    synth_jpeg_payloads,
)


@register(
    "q272_jpeg_decode_features",
    oracle=f"""
    WITH jpg AS (
      SELECT doc_id, 8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS n_comp
      FROM documents
    ),
    vals AS (
      SELECT j.doc_id, j.w, j.h, j.n_comp,
             {_VAL.format(mod=256)} AS v
      FROM jpg j, unnest(range(0, (j.w // 8) * (j.h // 8))) AS t(i)
    )
    SELECT doc_id,
           CAST(MIN(n_comp) AS INTEGER) AS n_comp,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(MIN(w) * MIN(h) AS BIGINT) AS n_units,
           CAST(SUM(64 * v) * MIN(n_comp) AS BIGINT) AS sum_val,
           CAST(MAX(v) AS BIGINT) AS max_val
    FROM vals GROUP BY doc_id
    """,
    doc="REAL lossy-codec decode end to end: every doc gets a genuine "
    "baseline sequential JPEG (T.81) — real forward DCT, quantization, "
    "differential-DC + run-length Huffman with the Annex K standard "
    "tables, byte stuffing; even docs grayscale, odd docs YCbCr 4:4:4 "
    "with constant-128 chroma — round-tripped through a Spark binary "
    "column and DECODED inside the Arrow UDF by a real baseline "
    "decoder (marker walk, DQT/DHT read from the stream, Huffman "
    "entropy decode with unstuffing, DC prediction, dequantize, "
    "inverse zigzag, IDCT, YCbCr->RGB). Sources are block-constant — "
    "the one image family whose JPEG round trip is exact — so the "
    "oracle recomputes the features from the block-value formula with "
    "no decoder and the hash match proves the codec machinery is "
    "right; the AC path is unit-tested against an independent numpy "
    "reference. Scale shape: two narrow map stages, zero shuffle, "
    "payloads never touch the driver; the decoder's IDCT skips zero "
    "coefficients so the DC-dominant corpus decodes in O(pixels).",
    tags=("multimodal", "pandas-udf", "decode"),
)
def q272_jpeg_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return jpeg_decode_features(synth_jpeg_payloads(docs))
