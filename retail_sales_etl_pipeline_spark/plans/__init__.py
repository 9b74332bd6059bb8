from .registry import QUERIES, Query, register

__all__ = ["QUERIES", "Query", "register"]
