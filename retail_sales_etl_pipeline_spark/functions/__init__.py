from .scalar import (
    decimal_str,
    epoch_us,
    money_sum,
    nan_to_null,
    pg_dayofweek,
    poly_hash_expr,
    total_amount,
)

__all__ = [
    "decimal_str",
    "epoch_us",
    "money_sum",
    "nan_to_null",
    "pg_dayofweek",
    "poly_hash_expr",
    "total_amount",
]
