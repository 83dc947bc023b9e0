"""Data-layout management: Z-order clustering for multi-column data
skipping.

Parquet readers prune row groups with min/max statistics; a sort on
one column gives perfect skipping on that column and none on any
other. Interleaving the bits of two (or more) key columns into one
Z-value and range-partitioning + sorting on it clusters BOTH columns
simultaneously — every file covers a small rectangle of the key
space, so predicates on either column (or both) prune most files.
This is Delta OPTIMIZE ZORDER BY / Iceberg's z-ordered rewrite,
implemented directly on the parquet sink.

Everything is JVM expressions (shifts/masks inside codegen) — the
z-value never touches Python — and the layout write is
repartitionByRange + sortWithinPartitions, i.e. one range shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension (2 dims → 32-bit z-value)


def zorder_value(c1: Column, c2: Column) -> Column:
    """Interleave the low Z_BITS bits of two non-negative integer
    columns: bit i of c1 → bit 2i, bit i of c2 → bit 2i+1. Columns
    with larger domains should be bucketed/quantized first (rank or
    modulo) — z-ordering cares about relative locality, not exact
    values."""
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def write_zordered(
    df: DataFrame, path: str, col1: str, col2: str, n_files: int = 8
) -> None:
    """Write df as n_files parquet files clustered by the Z-order of
    (col1, col2): range-partition on the z-value (one shuffle),
    sort within each partition, drop the helper column at the sink.
    Readers filtering on either column now skip most row groups via
    parquet min/max stats."""
    zcol = "_zvalue"
    (
        df.withColumn(zcol, zorder_value(F.col(col1), F.col(col2)))
        .repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )
