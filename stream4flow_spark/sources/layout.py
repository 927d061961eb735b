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

from pyspark.sql import DataFrame, SparkSession


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
