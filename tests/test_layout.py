"""Range-clustered layout: the pruning claim, asserted from the footers
(sources/layout.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from stream4flow_spark.sources.layout import file_ranges, write_clustered
from stream4flow_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _overlaps(ranges, lo, hi):
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_clustered_layout_prunes_shuffled_layout_does_not(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n_files = 8

    clustered = str(tmp_path / "clustered")
    write_clustered(ev, clustered, ["user_id"], n_files=n_files)
    cr = file_ranges(clustered, "user_id")
    assert len(cr) == n_files

    # files own disjoint key slices: ranges are pairwise non-overlapping
    cr_sorted = sorted(cr)
    assert all(
        cr_sorted[i][1] <= cr_sorted[i + 1][0]
        for i in range(len(cr_sorted) - 1)
    )
    # a narrow range predicate overlaps at most 2 files (boundary spill)
    lo = cr_sorted[3][0]
    assert _overlaps(cr, lo, lo + 1) <= 2

    # the SAME data in a shuffle-random layout: every file spans ~the
    # whole key range, the same predicate overlaps every file
    shuffled = str(tmp_path / "shuffled")
    ev.repartition(n_files, "event_id").write.parquet(shuffled)
    sr = file_ranges(shuffled, "user_id")
    assert _overlaps(sr, lo, lo + 1) == len(sr)

    # reading back with the predicate still pushes it to the scan
    back = spark.read.parquet(clustered).filter(
        (F.col("user_id") >= lo) & (F.col("user_id") <= lo + 1)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan
    assert back.count() == ev.filter(
        (F.col("user_id") >= lo) & (F.col("user_id") <= lo + 1)
    ).count()


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    from stream4flow_spark.sources.layout import (
        overlapping_files,
        write_zordered,
    )

    # deterministic 64x64 grid: x and y are independent, uniformly dense
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    n_files = 16

    zpath = str(tmp_path / "zordered")
    write_zordered(grid, zpath, ["x", "y"], bits=6, n_files=n_files)

    # control: single-column range clustering prunes x, not y
    cpath = str(tmp_path / "clustered_x")
    write_clustered(grid, cpath, ["x"], n_files=n_files)
    # control: shuffle-random prunes nothing
    spath = str(tmp_path / "shuffled")
    grid.repartition(n_files, "payload").write.parquet(spath)

    # a one-value slice on EITHER dimension touches a minority of
    # z-ordered files (ideally ~sqrt(n_files) = 4 of 16)
    for col in ("x", "y"):
        z_hit = overlapping_files(zpath, col, 31, 31)
        assert z_hit <= n_files // 2, (col, z_hit)
        assert overlapping_files(spath, col, 31, 31) == n_files
    # single-column clustering: perfect on x, useless on y — the gap
    # z-ordering closes
    assert overlapping_files(cpath, "x", 31, 31) <= 2
    assert overlapping_files(cpath, "y", 31, 31) == n_files

    # round trip: no rows lost, predicate still pushed to the scan
    back = spark.read.parquet(zpath)
    assert back.count() == 4096
    q = back.filter((F.col("y") >= 31) & (F.col("y") <= 31))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert q.count() == 64


def test_zorder_quantile_buckets_balance_skewed_column(spark, tmp_path):
    from stream4flow_spark.sources.layout import (
        file_ranges,
        overlapping_files,
        write_zordered,
    )

    # y is heavily skewed (quadratic growth): linear bucketing would
    # put most rows in one bucket; quantile bucketing keeps files narrow
    # around the dense region
    skewed = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") * F.col("id") / 1024).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zskew")
    write_zordered(skewed, zpath, ["x", "y"], bits=6, n_files=16)
    assert len(file_ranges(zpath, "y")) == 16
    # dense region (y small): a point predicate still skips most files
    assert overlapping_files(zpath, "y", 0, 0) <= 8


def test_zorder_morton_interleave_exhaustive(spark):
    from stream4flow_spark.sources.layout import zorder_column

    # exhaustive 3-bit × 3-bit check against the reference interleave
    df = spark.range(64).select(
        (F.col("id") % 8).alias("x"), (F.col("id") / 8).cast("long").alias("y")
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y",
            zorder_column([F.col("x"), F.col("y")], bits=3).alias("z"),
        ).collect()
    }

    def ref(x, y):
        z = 0
        for j in range(3):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    assert got == {(x, y): ref(x, y) for x in range(8) for y in range(8)}
