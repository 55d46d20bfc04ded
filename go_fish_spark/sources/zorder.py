"""Z-order (Morton curve) layout — multi-dimensional data skipping.

The reference has no storage layout at all; bucketing (bucketing.py)
amortizes JOIN shuffles, sharding (sharding.py) fixes file-count
discipline — this module fixes MULTI-PREDICATE scans. Parquet readers
prune files/row-groups by min/max statistics, but a corpus sorted by ONE
key only skips on that key: a query filtering on (lang_bucket AND
length_band) still reads every file for the second predicate. Sorting by
the interleaved-bit Morton code of BOTH keys keeps files *locally
rectangular* in the key space, so a 2-d box predicate overlaps only the
files near the box — the technique behind Delta's OPTIMIZE ZORDER and
every lakehouse's multi-column clustering.

At 100 TB this is the difference between "read 3% of files" and "read
100% of files" for dashboard-style sliced scans. Everything here is pure
integer Column expressions + one ordered write — no UDFs, no driver
loops; the skip-rate auditor reads only parquet FOOTER statistics
(min/max per file), never data pages.

Caveats encoded in the API:
  * inputs must be BOUNDED non-negative integer buckets (cast/bucket
    your raw columns first — a raw 64-bit id would need 64 bit-planes);
  * Z-order trades a little locality per dimension for locality in ALL
    dimensions: a single-key range scan is somewhat worse than a
    single-key sort — measure with :func:`file_skip_stats` before
    committing (the test asserts both directions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def z_value(cols: list, bits: int = 10) -> Column:
    """Morton code of ``len(cols)`` bucket columns: bit b of column i
    lands at interleaved position ``b·n_cols + i``. Pure integer
    expression (shifts as multiplies — exact in LongType for
    ``bits·n_cols ≤ 62``). Columns must already be integer buckets in
    ``[0, 2^bits)``; values above are clamped (clamping keeps the code
    total rather than silently corrupting high bits)."""
    n = len(cols)
    if not cols:
        raise ValueError("z_value needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits*n_cols = {bits * n} exceeds LongType range")
    cap = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cc = F.col(c) if isinstance(c, str) else c
        v = F.least(F.greatest(cc.cast("long"), F.lit(0)), F.lit(cap))
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            z = z + (bit * F.lit(1 << (b * n + i))).cast("long")
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 10,
    rows_per_file: int = 100_000,
) -> None:
    """Write ``df`` Z-ordered on ``cols``: one total sort by the Morton
    code (a range-partitioned TeraSort — Spark's orderBy, never a
    single task), then parquet with ``maxRecordsPerFile`` bounding file
    size so the min/max footer stats stay tight. The z column itself is
    dropped — it is derivable and would bloat the schema."""
    (
        df.withColumn("_z", z_value(cols, bits))
        .orderBy("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", int(rows_per_file))
        .parquet(path)
    )


def file_skip_stats(
    spark: SparkSession, path: str, predicates: dict
) -> dict:
    """Data-skipping audit: what fraction of this layout's files could a
    min/max-pruning reader SKIP for a conjunctive range predicate
    ``{col: (lo, hi)}``? Reads each file's per-column min/max from the
    parquet FOOTERS only (pyarrow row-group statistics — no data pages),
    exactly the information a scan's file-pruning step uses. Returns
    {"n_files", "n_overlapping", "skip_rate"}.

    This is the measurement to run before committing a layout: compare
    the same predicate against a linear-sorted and a Z-ordered copy —
    Z-order should skip dramatically more for multi-column boxes at the
    cost of a little single-column locality."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    n_overlap = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        overlaps = True
        for col, (lo, hi) in predicates.items():
            if col not in mins:  # no stats → cannot skip this file
                continue
            if maxs[col] < lo or mins[col] > hi:
                overlaps = False
                break
        n_overlap += 1 if overlaps else 0
    n = len(files)
    return {
        "n_files": n,
        "n_overlapping": n_overlap,
        "skip_rate": round(1.0 - n_overlap / n, 6) if n else 0.0,
    }
