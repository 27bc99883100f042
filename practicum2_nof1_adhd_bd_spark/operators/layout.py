"""Multi-dimensional data layout: Z-order (Morton) clustering.

A 100-TB table queried by TWO selective dimensions (e.g. part AND
supplier) can only sort by one of them; min/max file skipping then works
for that dimension and degenerates for the other. Interleaving the bits
of both keys (the Morton / Z-order curve) gives one sort key whose
contiguous ranges are 2-D locality cells, so range-partitioning and
sorting by it clusters BOTH dimensions at once — every parquet file's
(x, y) bounding box shrinks, and a 2-D box predicate prunes most
row groups on footer stats alone (the device behind Delta/Iceberg
OPTIMIZE ZORDER BY; SCALING §2n measures the skipping ratio).

Dimensions are NORMALIZED to the full ``bits`` width before
interleaving — raw keys with unequal domains (15-bit partkey vs 10-bit
suppkey) would let the wide dimension own every high interleaved bit,
reducing the curve to a 1-D sort at file granularity (measured: the
unnormalized layout skipped nothing on the narrow dimension). The
scaling is exact integer arithmetic, ``(x - lo) * (2^bits - 1) div
max(hi - lo, 1)``, so the DuckDB oracle twin replays it bit-for-bit.

Everything here is codegen'd column algebra: the bit interleave is 2 x
``bits`` shift/and/or terms, the layout write is
``repartitionByRange(morton)`` + ``sortWithinPartitions`` (one range
exchange — the same shuffle a 1-D sort would pay), and the cell-stats
attestation is one hash aggregation. No window, no driver state; the
only driver-side data is the 4-value min/max bounds row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: x occupies even bit positions, y odd. Inputs must already
    be in [0, 2^bits) — see ``scale_to_bits``."""
    code = F.lit(0).cast("long")
    for b in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), b).bitwiseAND(1), 2 * b)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(y.cast("long"), b).bitwiseAND(1), 2 * b + 1
            )
        )
    return code


def scale_to_bits(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Exact integer normalization of [lo, hi] onto [0, 2^bits - 1]:
    floor((col - lo) * (2^bits - 1) / max(hi - lo, 1)). The numerator
    stays far below 2^53, so the double division is exactly rounded and
    floor() agrees with SQL integer division bit-for-bit."""
    span = max(hi - lo, 1)
    num = (col.cast("long") - F.lit(lo)) * F.lit((1 << bits) - 1)
    return F.floor(num / F.lit(span)).cast("long")


def morton_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL expression string (for
    DuckDB oracle twins). ``x_expr``/``y_expr`` must already be scaled
    into [0, 2^bits)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_expr} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y_expr} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def _bounds(df: DataFrame, x_col: str, y_col: str) -> tuple[int, int, int, int]:
    r = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).first()
    return int(r[0]), int(r[1]), int(r[2]), int(r[3])


def _scaled_morton(
    df: DataFrame, x_col: str, y_col: str, bits: int
) -> Column:
    x0, x1, y0, y1 = _bounds(df, x_col, y_col)
    return morton_code(
        scale_to_bits(F.col(x_col), x0, x1, bits),
        scale_to_bits(F.col(y_col), y0, y1, bits),
        bits,
    )


def zorder_cells(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    cell_shift: int = 26,
) -> DataFrame:
    """Per-Z-cell clustering statistics: group rows by the normalized
    Morton code shifted down ``cell_shift`` bits (with the defaults, a
    64-cell quadtree over the data's own bounding box at every scale)
    and report each cell's row count and (x, y) bounding box — the
    declarative witness that the curve clusters both dimensions."""
    m = _scaled_morton(df, x_col, y_col, bits)
    return (
        df.select(
            F.shiftright(m, cell_shift).alias("cell"),
            F.col(x_col),
            F.col(y_col),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )


def zorder_repartition(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Physically cluster ``df`` along the Z-curve: one range exchange on
    the normalized Morton code (sampled range boundaries — balanced
    output files even under key skew) + an in-partition sort, then drop
    the helper column. Write the result with any sink; downstream 2-D
    predicates prune on parquet min/max footer stats (SCALING §2n)."""
    m = _scaled_morton(df, x_col, y_col, bits)
    return (
        df.withColumn("_z", m)
        .repartitionByRange(n_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
