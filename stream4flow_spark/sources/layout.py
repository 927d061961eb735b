"""Range-clustered file layout — make min/max statistics actually prune.

Parquet readers skip whole files and row groups using footer min/max
statistics, but only when the data is CLUSTERED on the predicate column:
a shuffle-random layout gives every file the full value range, every
min/max test passes, and a 1%-selective filter still reads 100% of a
100 TB table. The fix is a write-time decision, not a reader knob —
range-partition + sort on the cluster columns so each file owns a narrow
slice of the key space (the single-column analog of Z-ordering; for
multi-column clustering the leading column gets file-level pruning and
the sort gives the rest row-group locality).

Complements `sources/bucketing.py`: hash buckets co-locate equi-JOIN
keys (exchange elimination); range clustering co-locates FILTER ranges
(scan elimination). A table queried both ways wants bucket-by-join-key +
sort-within-bucket-by-time, which `write_bucketed(sort_cols=...)`
already expresses; this module is the standalone form for append-only
fact/event tables whose dominant access is the range predicate.

The pruning claim is ASSERTED in tests/test_layout.py from the written
footers themselves (pyarrow statistics): clustered files carry pairwise
non-overlapping ranges — a point/range predicate overlaps ≤ 1 + spill
files — while the same data written shuffle-random overlaps every file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``.

    ``n_files`` sets the file count (defaults to Spark's shuffle
    parallelism). Each output task receives a contiguous key range
    (``repartitionByRange`` samples the distribution, so skewed keys
    still yield balanced files) and sorts it, so footer min/max per
    file — and per row group within the file — are tight."""
    if n_files is not None:
        part = df.repartitionByRange(n_files, *cluster_cols)
    else:
        part = df.repartitionByRange(*cluster_cols)
    (
        part.sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def _quantile_bucket(col_name: str, boundaries: list[float]):
    """Map-side quantile-bucket index for a numeric column: the count of
    broadcast boundaries ≤ the value, folded JVM-side with a higher-order
    aggregate (no UDF, no join). ``len(boundaries)+1`` buckets."""
    v = F.col(col_name).cast("double")
    return F.aggregate(
        F.lit(boundaries),
        F.lit(0),
        lambda acc, b: acc + (v >= b).cast("int"),
    )


def zorder_column(bucket_cols, bits: int):
    """Interleave the low ``bits`` bits of each bucket index into one
    Z-value (Morton code) — pure Column shift/or math. Nearby Z-values
    are nearby in EVERY dimension, so range-clustering on the Z-value
    narrows per-file min/max on all participating columns at once."""
    ncols = len(bucket_cols)
    z = F.lit(0).cast("long")
    for i, b in enumerate(bucket_cols):
        b = b.cast("long")
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, j).bitwiseAND(F.lit(1)), j * ncols + i
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    z_cols: list[str],
    bits: int = 6,
    n_files: int | None = None,
    relative_error: float = 0.001,
) -> None:
    """Write ``df`` as parquet Z-ORDERED on multiple numeric columns.

    ``write_clustered`` prunes perfectly on ONE column (the leading
    sort key) and not at all on the others; Z-ordering trades a little
    of that single-column tightness for pruning on EVERY ``z_col``: each
    file owns a contiguous Z-range = a bounded set of hyper-rectangles,
    so min/max footer stats are narrow in all dimensions — the layout a
    table wants when queries filter on different columns on different
    days (host AND time; source AND length).

    Mechanics (the public recipe Delta/Iceberg OPTIMIZE uses, expressed
    in plain Spark): per column, 2^bits quantile buckets from an
    approxQuantile boundary list (driver-bounded: 2^bits-1 doubles per
    column — the IVF-centroid pattern); bucket indices interleave into a
    Morton code map-side; ``repartitionByRange`` + sort on the Z-value;
    the synthetic column is dropped before write. Quantile (not linear)
    bucketing keeps skewed columns balanced.

    Numeric columns only (cast timestamps to long upstream).
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE pass computes every column's boundary list (approxQuantile
    # takes a column list; per-column nulls are ignored independently)
    casted = df.select(
        *[F.col(c).cast("double").alias(f"__zq{i}") for i, c in enumerate(z_cols)]
    )
    all_bs = casted.approxQuantile(
        [f"__zq{i}" for i in range(len(z_cols))], probs, relative_error
    )
    zb = []
    for c, bs in zip(z_cols, all_bs):
        # dedupe collapsed boundaries (heavy skew) — fewer, wider buckets
        zb.append(_quantile_bucket(c, sorted(set(bs))))
    zdf = df.withColumn("__z", zorder_column(zb, bits))
    if n_files is not None:
        part = zdf.repartitionByRange(n_files, F.col("__z"))
    else:
        part = zdf.repartitionByRange(F.col("__z"))
    (
        part.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def overlapping_files(path: str, column: str, lo, hi) -> int:
    """How many files a [lo, hi] predicate on ``column`` must read,
    judged from footer min/max alone — the pruning meter for layout
    tests and production health checks."""
    return sum(
        1 for fmin, fmax in file_ranges(path, column)
        if not (fmax < lo or fmin > hi)
    )


def file_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file under ``path`` — read
    from the footers with pyarrow, no Spark job. The test oracle for
    pruning claims; also useful as a layout health check in production
    (overlapping ranges = the clustering has decayed and a rewrite is
    due)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(
                next(
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == column
                )
            )
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out
