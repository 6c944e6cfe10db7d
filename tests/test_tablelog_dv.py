"""Merge-on-read deletion vectors (sources/tablelog.py): row-level
DELETE without rewriting files — snapshot/time-travel semantics,
cumulative vectors, interplay with MERGE/OPTIMIZE/vacuum/checkpoints,
and the metadata-count path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trace_parquet_spark.sources.tablelog import (
    append,
    change_feed,
    delete_where,
    latest_version,
    merge_upsert,
    optimize_table,
    read_table,
    stats_only_totals,
    vacuum,
    write_checkpoint,
)


def _ids(df):
    return sorted(r.id for r in df.collect())


def _seed(spark, t, n=20, parts=2):
    append(
        spark.range(n).repartitionByRange(parts, "id"), t, stats_col="id"
    )


def test_delete_hides_rows_without_rewriting_files(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    files_before = {
        f
        for root, _d, names in os.walk(t)
        for f in names
        if f.endswith(".parquet")
    }
    res = delete_where(spark, t, "id % 5 = 0")
    assert res["rows_deleted"] == 4 and res["version"] == 1
    assert _ids(read_table(spark, t)) == [
        i for i in range(20) if i % 5 != 0
    ]
    # no DATA file was rewritten or removed — only a dv sidecar added
    files_after = {
        f
        for root, _d, names in os.walk(t)
        for f in names
        if f.endswith(".parquet")
    }
    assert files_before <= files_after
    # time travel still sees the deleted rows
    assert _ids(read_table(spark, t, as_of=0)) == list(range(20))


def test_second_delete_is_cumulative(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    delete_where(spark, t, "id < 4")
    delete_where(spark, t, F.col("id") >= 16)
    assert _ids(read_table(spark, t)) == list(range(4, 16))
    # deleting already-deleted rows matches nothing
    with pytest.raises(ValueError, match="matched no rows"):
        delete_where(spark, t, "id < 2")
    # snapshots at each dv commit are distinct and correct
    assert _ids(read_table(spark, t, as_of=1)) == list(range(4, 20))


def test_merge_does_not_resurrect_deleted_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    delete_where(spark, t, "id % 2 = 1")  # odds gone
    updates = spark.createDataFrame([(2,), (100,)], ["id"])
    merge_upsert(spark, t, updates, "id")
    got = _ids(read_table(spark, t))
    assert got == sorted(set(range(0, 20, 2)) | {100})
    # deleted odds stayed gone through the rewrite of touched files
    assert 1 not in got and 3 not in got


def test_optimize_folds_vectors_away(spark, tmp_path):
    from trace_parquet_spark.sources.tablelog import _dv_state

    t = str(tmp_path / "t")
    _seed(spark, t)
    delete_where(spark, t, "id >= 10")
    assert _dv_state(t, None)
    optimize_table(spark, t, target_files=1)
    assert _dv_state(t, None) == {}  # mappings dropped with the files
    assert _ids(read_table(spark, t)) == list(range(10))
    # metadata-only MIN/MAX is exact again post-OPTIMIZE
    n, lo, hi = stats_only_totals(t)
    assert (n, lo, hi) == (10, 0, 9)


def test_stats_only_counts_subtract_dv_and_minmax_refuses(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    n, lo, hi = stats_only_totals(t)
    assert (n, lo, hi) == (20, 0, 19)
    delete_where(spark, t, "id >= 15")
    with pytest.raises(ValueError, match="deletion vector"):
        stats_only_totals(t)


def test_vacuum_keeps_referenced_sidecars(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    delete_where(spark, t, "id = 7")
    assert vacuum(t) == []  # the sidecar is referenced, not an orphan
    assert _ids(read_table(spark, t)) == [i for i in range(20) if i != 7]


def test_checkpoint_carries_dv_state(spark, tmp_path):
    from trace_parquet_spark.sources.tablelog import _dv_counts, _dv_state

    t = str(tmp_path / "t")
    _seed(spark, t)
    delete_where(spark, t, "id < 5")
    v = write_checkpoint(t)
    # replay THROUGH the checkpoint (no tail) reproduces the dv state
    assert _dv_state(t, v) and sum(_dv_counts(t, v).values()) == 5
    assert _ids(read_table(spark, t, as_of=v)) == list(range(5, 20))


def test_change_feed_refuses_dv_range(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    delete_where(spark, t, "id = 0")
    with pytest.raises(ValueError, match="deletion vector"):
        change_feed(spark, t, 0, latest_version(t), "id")
