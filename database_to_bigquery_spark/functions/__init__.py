"""Scalar/helper function surface (reference S4/S7/S10 + portable text metrics)."""

from .reference_transforms import (  # noqa: F401
    apply_declared_schema,
    cast_bools,
    format_datetimes_as_strings,
)
