"""Source surface: parquet fixtures, JDBC (partitioned reads), catalog."""

from .catalog import discover_tables  # noqa: F401
from .jdbc import jdbc_reader_options  # noqa: F401
