"""Multimodal plumbing unit tests (the queries' oracle hashes prove the
full path; these pin the operator-level contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_etl_pipeline_spark.operators.multimodal import (
    FRAME_STRIDE,
    MAX_FRAMES,
    attach_payload,
    decode_media,
    frame_sample,
)


def test_decode_media_is_a_declared_stub():
    # rounds 11/12: png then jpeg moved from the honest gate to real
    # stdlib decoders (see test_media_decode.py) — mp3/mp4 remain
    # declared stubs
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x00\x01", "audio/mp3")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"\x00\x01", "video/mp4")


def test_frame_sample_bounds_and_offsets(spark):
    docs = spark.createDataFrame(
        [
            (1, "x" * (FRAME_STRIDE * 10)),  # long payload: capped at MAX_FRAMES
            (2, "y" * 5),                    # short payload: 1 tail frame
            (3, "z" * (FRAME_STRIDE + 3)),   # 2 frames, second a short tail
        ],
        "doc_id long, text string",
    )
    rows = frame_sample(attach_payload(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == MAX_FRAMES  # skew bounding
    assert len(by_doc[2]) == 1
    assert len(by_doc[3]) == 2
    for r in by_doc[1]:
        assert r["offset_bytes"] == r["frame_idx"] * FRAME_STRIDE
    # short tail frame: byte sum of the 3 trailing 'z' bytes
    tail = [r for r in by_doc[3] if r["frame_idx"] == 1][0]
    assert tail["frame_byte_sum"] == 3 * ord("z")


def test_payload_roundtrip_binary(spark):
    docs = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    row = attach_payload(docs).collect()[0]
    assert bytes(row["payload"]) == "héllo".encode("utf-8")
    assert row["mime"] == "text/plain"


def test_resize_payload_fixed_width_and_short_inputs(spark):
    """NN resize always emits exactly RESIZE_SAMPLES samples: payloads
    shorter than the target repeat bytes (upsample), longer ones skip
    (downsample); empty payloads are dropped. Values re-derived driver-side."""
    from retail_sales_etl_pipeline_spark.operators.multimodal import (
        RESIZE_SAMPLES,
        resize_payload,
    )

    rows = [
        (1, b"ab"),                      # shorter than target: upsample
        (2, bytes(range(200))),          # longer: downsample
        (3, b""),                        # empty: dropped
        (4, b"x" * RESIZE_SAMPLES),      # exact: identity
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in resize_payload(df).collect()}
    assert set(got) == {1, 2, 4}
    for did, payload in rows:
        if not payload:
            continue
        n = len(payload)
        expect = [payload[(j * n) // RESIZE_SAMPLES] for j in range(RESIZE_SAMPLES)]
        r = got[did]
        assert r["n_bytes"] == n
        assert r["resized_csv"] == ",".join(str(v) for v in expect)
        assert r["resized_sum"] == sum(expect)
        assert len(r["resized_csv"].split(",")) == RESIZE_SAMPLES
