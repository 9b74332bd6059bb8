"""Scalar-function building blocks (all JVM-side, zero Python UDFs).

Every helper here returns a Column built from pyspark.sql.functions, so the
whole expression stays inside whole-stage codegen. The few semantics worth
centralizing:

- ``pg_dayofweek`` — the reference computes PostgreSQL ``EXTRACT(DOW ...)``
  (0=Sunday..6=Saturday, reference dag3_transform_warehouse.py:99) while
  Spark's ``dayofweek`` is 1=Sunday..7=Saturday; off-by-one trap.
- ``money_sum`` — money aggregates go through DecimalType so the total is
  exact and independent of partial-aggregation order (double sums are not:
  they vary run-to-run with shuffle order, which breaks oracle hashes and,
  at 100 TB, breaks reproducibility between reruns).
- ``poly_hash_expr`` — a deterministic polynomial rolling hash expressed in
  pure SQL arithmetic, used by the fingerprint / minhash / simhash operators
  so the same value is computable by any ANSI-SQL oracle (no dependence on
  engine-internal hash functions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime for polynomial hashing; (MOD * BASE + 255) < 2**63 so the
# running value never overflows a long.
POLY_MOD = 1_000_000_007
POLY_BASE = 31


def pg_dayofweek(col: Column | str) -> Column:
    """PostgreSQL-style day of week: 0=Sunday .. 6=Saturday."""
    return (F.dayofweek(col) - F.lit(1)).cast("int")


def nan_to_null(col: Column | str) -> Column:
    """Reproduce pandas' ``astype(str).replace('nan', None)`` quirk.

    The reference stages CustomerID as a string where missing values became
    the literal ``'nan'`` (reference dag1_ingest_csv.py:73); canonical form
    is string with NULL for missing.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when(s == F.lit("nan"), F.lit(None).cast("string")).otherwise(s)


def total_amount(quantity: Column | str, unit_price: Column | str) -> Column:
    """quantity * unit_price as an exact DecimalType(10,2).

    Spark promotes decimal(10,2) * int to a wider decimal; the warehouse
    column is DECIMAL(10,2) (reference schema/warehouse_schema.sql:44), so
    cast back explicitly.
    """
    q = F.col(quantity) if isinstance(quantity, str) else quantity
    p = F.col(unit_price) if isinstance(unit_price, str) else unit_price
    return (q * p).cast("decimal(10,2)")


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent SUM for monetary doubles.

    Casts each value to decimal before summing; the per-row cast is a
    deterministic rounding, and decimal addition is associative, so the
    result is identical regardless of partition/shuffle order.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})"))


def decimal_str(col: Column, precision: int = 38, scale: int = 2) -> Column:
    """Render a decimal aggregate as a fixed-scale string.

    Used for oracle-compared money totals: a string like ``'12345.67'``
    hashes identically no matter which engine (Spark decimal vs DuckDB
    decimal vs pandas object) carried the value.
    """
    return col.cast(f"decimal({precision},{scale})").cast("string")


def epoch_us(col_name: str) -> Column:
    """Epoch microseconds of an NTZ timestamp column (by NAME — the
    expression is built as SQL text), with NO time zone in the
    computation: wall-clock difference from the NTZ epoch literal.

    ``unix_micros`` would implicitly cast TIMESTAMP_NTZ to LTZ using the
    SESSION zone — the same column would yield different integers under
    TZ=America/New_York. timestampdiff on two NTZ values is pure integer
    µs arithmetic, matching DuckDB's ``epoch_us`` on its naive timestamps."""
    if not isinstance(col_name, str):
        raise TypeError("epoch_us needs a column NAME (used in F.expr)")
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_name})"
    )


def poly_hash_expr(str_expr: str, mod: int = POLY_MOD, base: int = POLY_BASE) -> str:
    """SQL-expression string: polynomial rolling hash of a string column.

    ``hash(s) = fold(chars, acc -> (acc*base + ascii(char)) % mod)`` — pure
    integer arithmetic, so the identical value is computable in DuckDB (via
    list_reduce) for oracle checks, and it stays inside codegen in Spark.

    Returns a SQL snippet (use with F.expr); ``str_expr`` is any string
    expression.
    """
    return (
        f"aggregate(transform(split({str_expr}, ''), c -> ascii(c)), 0L, "
        f"(acc, x) -> (acc * {base} + x) % {mod})"
    )
