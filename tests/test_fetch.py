"""S1 fetch utility: download (file:// URL) → unzip → move-with-backup,
graceful-fallback status dict, temp cleanup, and the freshness check."""

from __future__ import annotations

import os
import time
import zipfile

from retail_sales_etl_pipeline_spark.sources.fetch import (
    CsvStatus,
    check_csv_status,
    cleanup_temp_files,
    download_data,
    extract_zip,
    fetch_and_update_data,
    move_csv_to_target,
)

CSV_BODY = "InvoiceNo,StockCode\n1,A\n"


def _make_zip(tmp_path, csv_name="online_retail.csv"):
    src = tmp_path / "payload" / csv_name
    src.parent.mkdir(parents=True, exist_ok=True)
    src.write_text(CSV_BODY)
    zpath = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(src, arcname=csv_name)
    return zpath


def test_fetch_happy_path(tmp_path):
    zpath = _make_zip(tmp_path)
    target = tmp_path / "dags" / "online_retail.csv"
    backup = tmp_path / "dags" / "latest_successfully_online_retail.csv"
    res = fetch_and_update_data(
        url=zpath.as_uri(),
        temp_zip_path=str(tmp_path / "tmp" / "dl.zip"),
        temp_extract_dir=str(tmp_path / "tmp" / "extract"),
        target_csv_path=str(target),
        backup_csv_path=str(backup),
    )
    assert res["success"] is True
    assert res["using_fallback"] is False
    assert target.read_text() == CSV_BODY
    assert backup.read_text() == CSV_BODY
    # temp artifacts cleaned up
    assert not (tmp_path / "tmp" / "dl.zip").exists()
    assert not (tmp_path / "tmp" / "extract").exists()


def test_fetch_bad_url_falls_back_and_preserves_existing(tmp_path):
    target = tmp_path / "online_retail.csv"
    target.write_text("existing")
    res = fetch_and_update_data(
        url=(tmp_path / "nope.zip").as_uri(),
        temp_zip_path=str(tmp_path / "dl.zip"),
        temp_extract_dir=str(tmp_path / "extract"),
        target_csv_path=str(target),
    )
    assert res["success"] is False
    assert res["using_fallback"] is True
    assert "Download failed" in res["message"]
    assert target.read_text() == "existing"  # last-known-good untouched


def test_fetch_corrupt_zip_falls_back(tmp_path):
    bad = tmp_path / "bad.zip"
    bad.write_bytes(b"this is not a zip")
    res = fetch_and_update_data(
        url=bad.as_uri(),
        temp_zip_path=str(tmp_path / "dl.zip"),
        temp_extract_dir=str(tmp_path / "extract"),
        target_csv_path=str(tmp_path / "online_retail.csv"),
    )
    assert res["success"] is False
    assert "extraction failed" in res["message"].lower()
    assert not (tmp_path / "dl.zip").exists()


def test_move_prefers_named_csv(tmp_path):
    d = tmp_path / "extracted"
    (d / "sub").mkdir(parents=True)
    (d / "sub" / "aaa_other.csv").write_text("other")
    (d / "sub" / "the_online_retail.csv").write_text("named")
    target = tmp_path / "out.csv"
    assert move_csv_to_target(str(d), str(target), csv_name="online_retail.csv")
    assert target.read_text() == "named"


def test_move_no_csv_fails(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    assert not move_csv_to_target(str(d), str(tmp_path / "out.csv"))


def test_download_and_extract_units(tmp_path):
    zpath = _make_zip(tmp_path)
    dl = tmp_path / "dl.zip"
    assert download_data(zpath.as_uri(), str(dl))
    assert dl.exists()
    assert extract_zip(str(dl), str(tmp_path / "ex"))
    assert (tmp_path / "ex" / "online_retail.csv").read_text() == CSV_BODY
    assert not download_data((tmp_path / "missing.zip").as_uri(), str(dl))
    cleanup_temp_files(str(dl), str(tmp_path / "ex"))
    assert not dl.exists()


def test_update_source_url(tmp_path):
    import json

    from retail_sales_etl_pipeline_spark.sources.fetch import update_source_url

    cfg = tmp_path / "data_source.json"
    cfg.write_text(json.dumps({"kaggle_dataset": {"url": "old"}, "other": 1}))
    assert update_source_url("https://example.com/new.zip", str(cfg))
    out = json.loads(cfg.read_text())
    assert out["kaggle_dataset"]["url"] == "https://example.com/new.zip"
    assert "last_updated" in out["kaggle_dataset"]
    assert out["other"] == 1  # untouched keys preserved
    assert not update_source_url("x", str(tmp_path / "missing.json"))


def test_check_csv_status(tmp_path):
    missing = check_csv_status(str(tmp_path / "nope.csv"))
    assert missing == CsvStatus(path=str(tmp_path / "nope.csv"), exists=False)

    f = tmp_path / "data.csv"
    f.write_text(CSV_BODY)
    fresh = check_csv_status(str(f))
    assert fresh.exists and fresh.size_bytes == len(CSV_BODY) and not fresh.stale

    old = time.time() - 8 * 86400
    os.utime(f, (old, old))
    stale = check_csv_status(str(f))
    assert stale.stale and stale.age_days > 7
