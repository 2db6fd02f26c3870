"""Z-ordered data layout: multi-dimensional clustering for 2-D range
queries (SURVEY.md §4.3 physical design, beyond the reference's
single-key layouts).

A single-column partition layout prunes only predicates on that
column.  When queries filter on TWO dimensions (time x key, price x
quantity), interleaving the bits of both bucket indices into one
Z-value keeps rows that are close in BOTH dimensions close on disk:
partitioning by a Z-prefix bucket turns a 2-D box predicate into a
small set of partition directories, so the scan lists and reads only
the files whose Z-cells intersect the box — directory-level pruning
no 1-D layout can give.

Scale design: the Z-value is a pure column expression (bit shifts +
masks, whole-stage codegen), the write is one repartition on the
Z-bucket, and query planning enumerates candidate buckets DRIVER-SIDE
from the (coarse, in-memory) bucket grid — never by scanning data.
At 100 TB you raise ``bits`` so each Z-bucket directory holds a few
files; the enumeration cost is the box's area in grid cells, which is
bounded by the (small) bucket count, not the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Fixed-width bucket index of ``col`` in [lo, hi) -> [0, 2^bits).
    Out-of-range values clamp to the edge buckets, so the layout
    degrades (edge buckets grow) rather than erroring."""
    n = 1 << bits
    raw = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def zvalue(x_bucket: Column, y_bucket: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two bucket indices into a
    Z-(Morton-)value: bit b of x lands at position 2b, bit b of y at
    2b+1.  Unrolled shift/mask expression — stays in codegen."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x_bucket, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(y_bucket, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def _interleave(xb: int, yb: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((xb >> b) & 1) << (2 * b)
        z |= ((yb >> b) & 1) << (2 * b + 1)
    return z


def write_zordered(
    df: DataFrame,
    dest: str,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 4,
    prefix_bits: int = 4,
) -> None:
    """Write ``df`` partitioned by the top ``prefix_bits`` bits of the
    Z-value of (x_col, y_col).  ``x_range``/``y_range`` fix the bucket
    grid (a physical-design choice, like a bucket count — derive them
    from table stats once, not per query).  One repartition on the
    partition column so each Z-bucket is one writer task / few files.
    """
    xb = _bucketize(F.col(x_col), *x_range, bits)
    yb = _bucketize(F.col(y_col), *y_range, bits)
    zb = F.shiftright(zvalue(xb, yb, bits), 2 * bits - prefix_bits)
    (
        df.withColumn("zbucket", zb.cast("int"))
        .repartition("zbucket")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(dest)
    )


def zbuckets_for_box(
    x_lo: float,
    x_hi: float,
    y_lo: float,
    y_hi: float,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 4,
    prefix_bits: int = 4,
) -> list[int]:
    """Driver-side: the set of Z-prefix buckets whose cells intersect
    the query box — pure arithmetic over the coarse grid, no data
    touched.  Cost is the box's area in cells (bounded by 4^bits)."""

    def bucket_of(v: float, lo: float, hi: float) -> int:
        n = 1 << bits
        return max(0, min(n - 1, int((v - lo) / (hi - lo) * n)))

    shift = 2 * bits - prefix_bits
    out = set()
    for xb in range(bucket_of(x_lo, *x_range), bucket_of(x_hi, *x_range) + 1):
        for yb in range(bucket_of(y_lo, *y_range), bucket_of(y_hi, *y_range) + 1):
            out.add(_interleave(xb, yb, bits) >> shift)
    return sorted(out)


def read_zordered_box(
    spark: SparkSession,
    dest: str,
    x_col: str,
    y_col: str,
    x_lo: float,
    x_hi: float,
    y_lo: float,
    y_hi: float,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 4,
    prefix_bits: int = 4,
) -> DataFrame:
    """Scan a Z-ordered layout for a 2-D box: the bucket IN-list prunes
    partition DIRECTORIES (only intersecting Z-cells are listed), and
    the residual box predicate pushes into the parquet scans of that
    slice.  Results are exact — pruning is a superset by construction.
    """
    buckets = zbuckets_for_box(
        x_lo, x_hi, y_lo, y_hi, x_range, y_range, bits, prefix_bits
    )
    return (
        spark.read.parquet(dest)
        .filter(F.col("zbucket").isin(buckets))
        .filter(
            (F.col(x_col) >= x_lo) & (F.col(x_col) <= x_hi)
            & (F.col(y_col) >= y_lo) & (F.col(y_col) <= y_hi)
        )
        .drop("zbucket")
    )
