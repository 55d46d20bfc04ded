"""Z-order layout (sources/zorder.py): Morton-code correctness and the
data-skipping claim itself — a 2-d box predicate must skip MORE files on
the Z-ordered layout than on a linear sort, and the single-key trade-off
must be visible (measured, not asserted folklore)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from go_fish_spark.sources import zorder


def _interleave(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder.z_value(["x", "y"], bits=3).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave(x, y, 3), (x, y)
    # out-of-range values clamp instead of corrupting high bits
    big = spark.createDataFrame([(999, -5)], "x int, y int")
    z = big.select(zorder.z_value(["x", "y"], bits=3).alias("z")).collect()[0].z
    assert z == _interleave(7, 0, 3)
    with pytest.raises(ValueError, match="exceeds"):
        zorder.z_value(["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder.z_value([], bits=4)


def test_zorder_layout_skips_more_files_for_2d_box(spark, tmp_path):
    """64×64 uniform grid, 64 files per layout. The 8×8 corner box must
    overlap far fewer Z-ordered files than linear-sorted files (where
    every x-stripe file contains all y values); the single-key flip side
    (a full x-range slab) is allowed to be somewhat worse on Z."""
    n = 64
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x int, y int, payload long")

    lin = str(tmp_path / "linear")
    (
        df.orderBy("x", "y")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 64)
        .parquet(lin)
    )
    zpath = str(tmp_path / "zorder")
    zorder.write_zordered(df, zpath, ["x", "y"], bits=6, rows_per_file=64)

    box = {"x": (0, 7), "y": (0, 7)}
    s_lin = zorder.file_skip_stats(spark, lin, box)
    s_z = zorder.file_skip_stats(spark, zpath, box)
    assert s_lin["n_files"] == s_z["n_files"] == 64
    # linear: the box lives in the first x-stripe (~8 files, all of
    # which span every y) → low skipping on y; z-order: the box is ONE
    # Morton quadrant → at most a couple of files
    assert s_z["n_overlapping"] < s_lin["n_overlapping"]
    assert s_z["n_overlapping"] <= 4
    assert s_z["skip_rate"] >= 0.9

    # round-trip: same rows either way
    assert (
        spark.read.parquet(zpath).orderBy("payload").collect()
        == spark.read.parquet(lin).orderBy("payload").collect()
    )

    # the documented trade-off: a single-key slab (all y, narrow x) is
    # where linear wins — measure it rather than hiding it
    slab = {"x": (0, 3)}
    assert (
        zorder.file_skip_stats(spark, lin, slab)["n_overlapping"]
        <= zorder.file_skip_stats(spark, zpath, slab)["n_overlapping"]
    )
