"""Round-trip tests for the format-dispatched sources/sinks."""

from __future__ import annotations

import pytest

from retail_sales_etl_pipeline_spark.sources.io import read_source, write_sink


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)],
        "id LONG, tag STRING, v DOUBLE",
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, tmp_path, sample, fmt):
    path = str(tmp_path / fmt)
    write_sink(sample, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema="id LONG, tag STRING, v DOUBLE")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_partitioned_write(spark, tmp_path, sample):
    path = str(tmp_path / "part")
    write_sink(sample, path, partition_by=["tag"])
    import glob

    assert glob.glob(f"{path}/tag=a/*.parquet")
    back = read_source(spark, path)
    assert back.count() == 3


def test_inference_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(spark, str(tmp_path), fmt="csv")


def test_unknown_format_refused(spark, tmp_path, sample):
    with pytest.raises(ValueError, match="unsupported format"):
        write_sink(sample, str(tmp_path / "x"), fmt="avro")


def test_jdbc_gated(spark):
    from retail_sales_etl_pipeline_spark.sources.io import read_jdbc

    with pytest.raises(NotImplementedError, match="driver jar"):
        read_jdbc(spark, "jdbc:postgresql://localhost/nope", "t")
