#!/usr/bin/env python
"""Dump .explain('formatted') for the round-15 optimization targets into
plans/r15/<query>_<tag>.txt (driver-contract evidence; guide §1/§7.2)."""
import os, sys, io, contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    from go_fish_spark.queries import REGISTRY
    from go_fish_spark.session import get_spark
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-r15-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        qd = REGISTRY.get(name)
        if qd is None:
            print(f"{name}: not in registry"); continue
        try:
            df = qd.fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"{name}: ok")
        except Exception as exc:
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:200])
        from go_fish_spark.operators.dedup import release_caches
        release_caches()
    from go_fish_spark.session import sweep_tmp_stores
    sweep_tmp_stores(spark.sparkContext.applicationId, stale_s=900.0)
    spark.stop()

if __name__ == "__main__":
    main()
