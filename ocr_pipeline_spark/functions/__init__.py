"""SQL-surface function registry: the engine's scalar/table functions
exposed to ``spark.sql`` users."""

from .registry import register_sql_functions, register_udtfs

__all__ = ["register_sql_functions", "register_udtfs"]
