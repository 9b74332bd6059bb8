"""Real WAV/BMP decode (operators.multimodal + q156): the stdlib
decoders must exactly invert the encoders (container structure included),
`decode_media` must dispatch/refuse correctly, and the registered query's
features must come from genuinely decoded bytes.
"""

from __future__ import annotations

import struct

import pytest

from retail_sales_etl_pipeline_spark.operators.multimodal import (
    MEDIA_LCG_A,
    MEDIA_LCG_B,
    MEDIA_LCG_M,
    MEDIA_P1,
    MEDIA_P2,
    decode_bmp,
    decode_media,
    decode_wav,
)


def _val(doc_id: int, i: int, mod: int) -> int:
    return (
        MEDIA_LCG_A * ((doc_id * MEDIA_P1 + i * MEDIA_P2) % MEDIA_LCG_M)
        + MEDIA_LCG_B
    ) % mod


def _wav_bytes(doc_id: int) -> tuple[bytes, list[int]]:
    n = 200 + doc_id % 57
    samples = [_val(doc_id, k, 65536) - 32768 for k in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data, samples


def _bmp_bytes(doc_id: int) -> tuple[bytes, int, int, bytes]:
    w, h = 8 + doc_id % 9, 6 + doc_id % 7
    logical = bytes(_val(doc_id, i, 256) for i in range(w * h * 3))
    row_size = (w * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_size - w * 3)
    body = b"".join(
        logical[y * w * 3 : (y + 1) * w * 3] + pad
        for y in range(h - 1, -1, -1)
    )
    hdr = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return hdr + body, w, h, logical


def test_wav_roundtrip_exact():
    for doc_id in (0, 2, 56, 114, 2048):
        payload, samples = _wav_bytes(doc_id)
        rate, got = decode_wav(payload)
        assert rate == 8000
        assert got == samples


def test_bmp_roundtrip_undoes_padding_and_row_order():
    # widths 8..16 include several not divisible by 4 — the padding and
    # bottom-up undo are load-bearing, not incidental
    seen_padded = 0
    for doc_id in (1, 3, 5, 7, 9, 11, 13, 127):
        payload, w, h, logical = _bmp_bytes(doc_id)
        gw, gh, got = decode_bmp(payload)
        assert (gw, gh) == (w, h)
        assert got == logical
        seen_padded += (w * 3) % 4 != 0
    assert seen_padded > 0


def test_decode_media_dispatch_and_honest_refusal():
    payload, samples = _wav_bytes(4)
    assert decode_media(payload, "audio/wav")[1] == samples
    bpayload, w, h, logical = _bmp_bytes(5)
    assert decode_media(bpayload, "image/bmp")[2] == logical
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")


def test_decoders_reject_malformed():
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    payload, _, _, _ = _bmp_bytes(1)
    # corrupt bpp to 32
    bad = bytearray(payload)
    struct.pack_into("<H", bad, 28, 32)
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))


def test_q156_features_match_local_decode(spark):
    """The registered query's features equal a driver-side recompute that
    decodes the same synthetic payloads with the module-level parsers —
    pinning the nested UDF copies to the public decoders."""
    from retail_sales_etl_pipeline_spark.plans.multimodal_queries import (
        q156_media_decode_features,
    )

    rows = {
        r.doc_id: (r.mime, r.n_units, r.sum_val, r.max_val, r.rate_or_width)
        for r in q156_media_decode_features(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows
    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id").collect()
    ]
    assert set(rows) == set(doc_ids)
    for did in doc_ids:
        if did % 2 == 0:
            payload, _ = _wav_bytes(did)
            rate, samples = decode_wav(payload)
            want = ("audio/wav", len(samples),
                    sum(abs(s) for s in samples),
                    max(abs(s) for s in samples), rate)
        else:
            payload, w, h, _ = _bmp_bytes(did)
            gw, gh, px = decode_bmp(payload)
            want = ("image/bmp", gw * gh, sum(px), max(px), gw)
        assert rows[did] == want, f"doc {did}"


# ---------------------------------------------------------------------------
# PNG path (round 11): encode -> decode round trip across ALL FIVE filter
# types, dispatch, honest refusal narrowed to jpeg/mp3/mp4, and the
# registered query's UDF copies pinned to the module-level codec.
# ---------------------------------------------------------------------------

from retail_sales_etl_pipeline_spark.operators.multimodal import (  # noqa: E402
    decode_png,
    encode_png,
)


def _png_logical(did: int, w: int, h: int, color: int) -> bytes:
    n = w * h * (3 if color == 2 else 1)
    return bytes(
        (1103515245 * ((did * 100003 + i * 104729) % 1000003) + 12345) % 256
        for i in range(n)
    )


def test_png_roundtrip_every_filter_type():
    for ftype in range(5):
        logical = _png_logical(7, 9, 5, 2)
        payload = encode_png(9, 5, 2, logical, lambda y, f=ftype: f)
        assert decode_png(payload) == (9, 5, 2, logical), f"filter {ftype}"
    # grayscale + mixed filters (the corpus shape)
    logical = _png_logical(4, 8, 6, 0)
    payload = encode_png(8, 6, 0, logical, lambda y: (4 + y) % 5)
    assert decode_png(payload) == (8, 6, 0, logical)


def test_png_decode_media_dispatch_and_remaining_gate():
    logical = _png_logical(3, 5, 4, 0)
    payload = encode_png(5, 4, 0, logical)
    assert decode_media(payload, "image/png")[3] == logical
    # the honest gate now covers only jpeg/mp3/mp4
    for mime in ("image/jpeg", "audio/mp3", "video/mp4"):
        with pytest.raises(NotImplementedError):
            decode_media(b"\x00" * 16, mime)


def test_png_rejects_corruption_and_unsupported():
    logical = _png_logical(3, 5, 4, 2)
    payload = encode_png(5, 4, 2, logical)
    bad = bytearray(payload)
    bad[40] ^= 0xFF  # flip a byte inside a chunk -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(b"notapng" + b"\x00" * 32)
    # truncated mid-chunk (IEND gone + one byte of IDAT CRC): error
    # contract is ValueError, not struct.error
    with pytest.raises(ValueError):
        decode_png(payload[: len(payload) - 13])
    # nonzero IHDR compression-method / filter-method bytes must be
    # rejected, not decoded under wrong assumptions (spec requires 0/0)
    import struct
    import zlib

    for field_off in (10, 11):  # comp, filt within the 13-byte IHDR data
        bad2 = bytearray(payload)
        ihdr_data_at = 8 + 8  # sig + len/type of first chunk (IHDR)
        bad2[ihdr_data_at + field_off] = 1
        fixed = zlib.crc32(bytes(bad2[ihdr_data_at - 4 : ihdr_data_at + 13]))
        struct.pack_into(">I", bad2, ihdr_data_at + 13, fixed & 0xFFFFFFFF)
        with pytest.raises(ValueError):
            decode_png(bytes(bad2))


def test_q265_features_match_local_decode(spark):
    """The registered query's features equal a driver-side recompute with
    the module-level codec — pinning the nested UDF copies (encoder in
    synth, decoder in features) to the public encode_png/decode_png."""
    from retail_sales_etl_pipeline_spark.plans.multimodal_queries import (
        q265_png_decode_features,
    )

    rows = {
        r.doc_id: (r.color_type, r.width, r.height, r.n_units, r.sum_val,
                   r.max_val)
        for r in q265_png_decode_features(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows
    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id").collect()
    ]
    assert set(rows) == set(doc_ids)
    for did in doc_ids:
        w, h = 8 + did % 9, 6 + did % 7
        color = 0 if did % 2 == 0 else 2
        logical = _png_logical(did, w, h, color)
        payload = encode_png(w, h, color, logical,
                             lambda y, d=did: (d + y) % 5)
        gw, gh, gc, px = decode_png(payload)
        assert rows[did] == (gc, gw, gh, gw * gh, sum(px), max(px)), did
