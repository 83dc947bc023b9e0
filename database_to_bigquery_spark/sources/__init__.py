"""Source surface: parquet fixtures, file formats, JDBC (partitioned reads), catalog."""

from .catalog import discover_tables  # noqa: F401
from .files import FileSourceSpec, read_file_source, split_quarantine  # noqa: F401
from .jdbc import jdbc_reader_options  # noqa: F401
