"""Declarative per-table ETL specs + the pipeline runner (S5-S9, S15-S19)."""

from .pipeline import PipelineResult, run_pipeline  # noqa: F401
from .table_spec import REFERENCE_SPECS, TableSpec  # noqa: F401
