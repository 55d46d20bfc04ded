"""Full-registry correctness self-check — a faithful simulation of the
driver's oracle compare, covering EVERY registry entry (the driver's
CORRECTNESS_r{N}.json caps at the first 50 registry keys; see PARITY.md).

Mirrors the driver pipeline:
  Spark ``queries()[name](spark, sf_dir)`` → ``toPandas()`` (Arrow on, as
  the driver's session has after ``catalog.table`` calls ``tune()``), and
  DuckDB ``oracle_sql()[name]`` → ``.df()`` — both canonicalized the same
  way (columns sorted by name, rows sorted by all columns) and value-hashed
  with ``pd.util.hash_pandas_object`` (dtype-sensitive, bitwise on floats —
  this is what catches int64-vs-float64 oracle drift that a str()-based
  compare misses).

Usage:
  python scripts/check_correctness.py [--sf /root/testdata/sf0.01]
                                      [--out CORRECTNESS_SELF.json]
                                      [--only q22_sessionize,q28_pivot]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns, key=str.lower), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = pd.util.hash_pandas_object(df, index=False)
    return hashlib.sha256(h.values.tobytes()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
        .appName("correctness-self-check")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from go_fish_spark.queries import REGISTRY, resolve_oracle

    qs = entrymod.queries()
    # Resolve data-dependent oracles (x15/x26 centroid literals) against the
    # SAME sf this check runs at — what the driver's oracle_sql() does
    # implicitly by always running at sf0.01.
    osql = {}
    for name, qd in REGISTRY.items():
        sql = resolve_oracle(qd, args.sf)
        if sql is not None:
            osql[name] = sql
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.time()
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            spdf = qs[name](spark, args.sf).toPandas()
            rec["spark_rows"] = len(spdf)
            if name in osql:
                odf = con.execute(osql[name]).df()
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(spdf) == len(odf)
                s_cols = sorted(spdf.columns, key=str.lower)
                o_cols = sorted(odf.columns, key=str.lower)
                rec["schema_match"] = s_cols == o_cols
                if rec["rows_match"] and rec["schema_match"]:
                    cs, co = canon(spdf), canon(odf)
                    rec["hash_match"] = value_hash(cs) == value_hash(co)
                    if not rec["hash_match"]:
                        neq = (cs.astype(str) != co.astype(str)).any()
                        bad = [c for c in cs.columns if neq.get(c, False)]
                        dt = {c: (str(cs[c].dtype), str(co[c].dtype))
                              for c in cs.columns if cs[c].dtype != co[c].dtype}
                        print(f"  !! {name}: value-diff cols={bad} dtype-diff={dt}")
                else:
                    rec["hash_match"] = False
            else:
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc(limit=5)
            n_fail += 1
        ok = (rec["hash_match"] is True) or (
            rec["err"] == "no_oracle" and rec["spark_rows"] is not None
        )
        if rec["hash_match"] is False or (rec["err"] and rec["err"] != "no_oracle"):
            n_fail += 0 if rec["err"] and rec["err"] != "no_oracle" else 1
        status = "OK" if ok else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        print(f"{name:28s} {status:9s} spark={rec['spark_rows']} "
              f"oracle={rec['oracle_rows']} ({time.time() - t0:.1f}s)")
        results[name] = rec

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")
    bad = [n for n, r in results.items()
           if r["hash_match"] is False or (r["err"] and r["err"] != "no_oracle")]
    print(f"{len(results)} checked, {len(bad)} failing: {bad}")
    from go_fish_spark.session import sweep_tmp_stores

    # own dirs always; other app ids only after 15 min of stillness (a
    # concurrent run's live entry touches its dir every few seconds —
    # a zero-stale sweep could delete it mid-scan); --only spot checks
    # are extra conservative
    swept = sweep_tmp_stores(
        spark.sparkContext.applicationId,
        stale_s=900.0 if args.only is None else 86400.0,
    )
    print(f"swept {swept} /tmp/gofish_x* scratch dirs")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
