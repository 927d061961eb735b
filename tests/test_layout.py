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
