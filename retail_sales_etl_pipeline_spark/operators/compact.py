"""Small-file compaction for parquet tables — the standing operational
problem of any long-running Spark warehouse: streaming sinks, incremental
appends (M6 logs, fact refreshes), and over-parallel writes each leave
files far below the scan-efficient size, and a 100 TB table fragmented
into millions of kilobyte files is bottlenecked on file-open overhead and
driver-side listing long before data volume matters.

``compact_parquet`` rewrites a parquet directory into
ceil(total_bytes / target_bytes) files and swaps the result in with the
crash-recoverable rename-aside protocol (sources.fs.replace — at every
interruption point at least one complete copy of the table exists). The
rewrite is one distributed read→repartition→write; the driver only lists
file sizes and issues the renames.

Correctness contract (tests/test_compact.py): row set identical before
and after (byte sizes may differ — re-encoding changes encoding/dictionary
decisions), file count reduced to the computed target, idempotent (a
second run is a no-op), and safe on already-compact tables.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..sources import fs


@dataclass(frozen=True)
class CompactResult:
    files_before: int
    files_after: int
    bytes_total: int
    compacted: bool


def _parquet_files(spark: SparkSession, path: str) -> list:
    hfs, jp = fs._fs_path(spark, path)
    out = []
    for st in hfs.listStatus(jp):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            out.append(st)
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    tolerance_files: int = 1,
) -> CompactResult:
    """Compact the parquet table at ``path`` toward ``target_bytes`` per
    file. No-op (``compacted=False``) when the current layout is already
    within ``tolerance_files`` of the target count — so schedulers can
    call this unconditionally after every append without rewrite churn.

    At cluster scale the same routine runs per partition directory
    (month=, shard_id=, ...) so a compaction touches only fresh
    partitions; the rename-aside swap keeps readers consistent on
    rename-atomic filesystems (HDFS; on S3 use a manifest/table format —
    documented trade, same interface)."""
    files = _parquet_files(spark, path)
    total = sum(st.getLen() for st in files)
    n_before = len(files)
    n_target = max(1, math.ceil(total / target_bytes))
    if n_before <= n_target + tolerance_files:
        return CompactResult(n_before, n_before, total, False)

    tmp = path.rstrip("/") + "_compact_tmp"
    fs.delete(spark, tmp)
    (
        spark.read.parquet(path)
        .repartition(n_target)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    fs.replace(spark, tmp, path)
    return CompactResult(
        n_before, len(_parquet_files(spark, path)), total, True
    )
