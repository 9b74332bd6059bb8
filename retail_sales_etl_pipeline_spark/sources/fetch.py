"""Source-data acquisition: download → unzip → move-with-backup (S1).

Reference parity: scripts/fetch_data.py:15-49 (download), 52-77 (unzip),
80-137 (CSV move + backup), 140-161 (temp cleanup), 164-249 (the
orchestrating fetch with graceful fallback signalling), and
scripts/check_csv_status.py:20-42 (file freshness report).

Spark-first note: acquisition is deliberately OUT of the engine's data
plane (SURVEY §2.1) — it is a driver-side, run-once utility, so plain
Python stdlib (urllib + zipfile) is the right tool, not a distributed
job. The engine's distributed path starts at ``read_retail_csv``.

Differences from the reference, on purpose:
- urllib instead of shelling out to curl (no subprocess dependency, same
  -L redirect-following semantics).
- every step returns/raises precise errors; the orchestrator converts
  them into the reference's status-dict contract (success/message/
  using_fallback/error) so callers keep the same graceful-fallback flow.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
import urllib.error
import urllib.request
import zipfile
from dataclasses import dataclass
from pathlib import Path

logger = logging.getLogger(__name__)

DEFAULT_TIMEOUT_S = 300  # the reference's 5-minute curl timeout
STALE_AFTER_DAYS = 7  # check_csv_status.py:34 staleness threshold


def download_data(url: str, output_path: str, timeout_s: int = DEFAULT_TIMEOUT_S) -> bool:
    """Download ``url`` to ``output_path`` (redirects followed). Returns
    success; never raises (reference contract: False on any failure)."""
    try:
        logger.info("Downloading data from %s", url)
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        with urllib.request.urlopen(url, timeout=timeout_s) as resp, open(
            output_path, "wb"
        ) as out:
            shutil.copyfileobj(resp, out)
        logger.info("Download successful: %s", output_path)
        return True
    except (urllib.error.URLError, OSError, ValueError) as exc:
        logger.error("Download failed: %s", exc)
        return False


def extract_zip(zip_path: str, extract_to: str) -> bool:
    """Extract a zip archive. Returns success; False on a bad archive."""
    try:
        logger.info("Extracting zip file: %s", zip_path)
        with zipfile.ZipFile(zip_path, "r") as zf:
            zf.extractall(extract_to)
        return True
    except (zipfile.BadZipFile, OSError) as exc:
        logger.error("Error extracting zip: %s", exc)
        return False


def move_csv_to_target(
    source_dir: str,
    target_path: str,
    backup_path: str | None = None,
    csv_name: str = "online_retail.csv",
) -> bool:
    """Find the CSV among extracted files (preferring a name match, else
    the first *.csv) and copy it to ``target_path``; optionally keep a
    last-known-good copy at ``backup_path``."""
    try:
        csv_files = sorted(Path(source_dir).rglob("*.csv"))
        if not csv_files:
            logger.error("No CSV files found in %s", source_dir)
            return False
        source_csv = next(
            (f for f in csv_files if csv_name.lower() in f.name.lower()), None
        )
        if source_csv is None:
            source_csv = csv_files[0]
            logger.warning("Specific CSV not found, using: %s", source_csv.name)

        Path(target_path).parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(source_csv, target_path)
        if backup_path:
            Path(backup_path).parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(source_csv, backup_path)
        return True
    except OSError as exc:
        logger.error("Error moving CSV file: %s", exc)
        return False


def cleanup_temp_files(zip_path: str, extract_dir: str) -> None:
    """Best-effort removal of the temp zip + extraction dir."""
    try:
        if os.path.exists(zip_path):
            os.remove(zip_path)
        if os.path.exists(extract_dir):
            shutil.rmtree(extract_dir)
    except OSError as exc:
        logger.warning("Error during cleanup: %s", exc)


def fetch_and_update_data(
    url: str,
    temp_zip_path: str,
    temp_extract_dir: str,
    target_csv_path: str,
    backup_csv_path: str | None = None,
) -> dict:
    """Download, extract, and install the source CSV.

    Returns the reference's status dict: on any failure the existing CSV
    (if present) remains untouched and ``using_fallback`` is True — the
    pipeline then runs on the last-known-good data instead of dying.
    """

    def _fail(message: str, error: str) -> dict:
        cleanup_temp_files(temp_zip_path, temp_extract_dir)
        logger.warning("%s - will attempt to use existing CSV file", message)
        return {
            "success": False,
            "message": message,
            "using_fallback": True,
            "error": error,
        }

    if not download_data(url, temp_zip_path):
        return _fail(
            "Download failed - URL may be expired", "HTTP download failed or timed out"
        )
    if not extract_zip(temp_zip_path, temp_extract_dir):
        return _fail(
            "ZIP extraction failed - file may be corrupted",
            "Invalid or corrupted ZIP file",
        )
    if not move_csv_to_target(temp_extract_dir, target_csv_path, backup_csv_path):
        return _fail("Failed to save CSV file", "File system error during CSV save")
    cleanup_temp_files(temp_zip_path, temp_extract_dir)
    return {
        "success": True,
        "message": "Fresh data downloaded and ready",
        "using_fallback": False,
        "error": None,
    }


def update_source_url(
    new_url: str, config_path: str, key_path: tuple[str, ...] = ("kaggle_dataset", "url")
) -> bool:
    """Refresh the source-data URL in a JSON config file (reference
    scripts/update_data_url.py:12-34 — used when a signed download URL
    expires). Sets the nested key and stamps ``last_updated`` next to it.
    Returns whether the file existed and was updated."""
    import json
    from datetime import datetime, timezone

    p = Path(config_path)
    if not p.exists():
        logger.warning("Config file not found: %s", config_path)
        return False
    config = json.loads(p.read_text())
    node = config
    for k in key_path[:-1]:
        node = node.setdefault(k, {})
    node[key_path[-1]] = new_url
    node["last_updated"] = datetime.now(timezone.utc).strftime("%Y-%m-%d")
    p.write_text(json.dumps(config, indent=2))
    return True


@dataclass(frozen=True)
class CsvStatus:
    """One file's freshness report (check_csv_status.py:20-42)."""

    path: str
    exists: bool
    size_bytes: int = 0
    mod_time: float = 0.0
    age_days: float = 0.0
    stale: bool = False


def check_csv_status(path: str, stale_after_days: float = STALE_AFTER_DAYS) -> CsvStatus:
    """File existence/size/mtime with a staleness flag: data older than
    ``stale_after_days`` warrants a re-fetch warning."""
    if not os.path.exists(path):
        return CsvStatus(path=path, exists=False)
    st = os.stat(path)
    age_days = (time.time() - st.st_mtime) / 86400.0
    return CsvStatus(
        path=path,
        exists=True,
        size_bytes=st.st_size,
        mod_time=st.st_mtime,
        age_days=age_days,
        stale=age_days > stale_after_days,
    )
