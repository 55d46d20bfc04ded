"""Bucketed-layout tests: the co-located join must plan ZERO exchanges
(both sides pre-shuffled at write time), while the same join over plain
parquet shuffles both sides — the layout technique that amortizes the
dominant fact⋈fact shuffle at the 100 TB target."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    from go_fish_spark.catalog import table
    from go_fish_spark.sources import bucketize

    orders = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    bo = bucketize(
        orders, "b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(tmp_path / "b_orders"),
    )
    bl = bucketize(
        li, "b_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(tmp_path / "b_lineitem"),
    )
    yield bo, bl
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_plans_no_exchange(spark, bucketed_pair):
    bo, bl = bucketed_pair
    # Force the general (non-broadcast) strategy so the assertion is about
    # bucketing, not about the tiny test SF fitting under the threshold.
    with _conf(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }):
        joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"])
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # Same join over plain parquet shuffles BOTH sides. (Direct
        # parquet reads: catalog.table() would re-run tune() and restore
        # the broadcast threshold this block disables.)
        po = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select("o_orderkey")
        pl = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select("l_orderkey")
        plain = _executed_plan(pl.join(po, pl["l_orderkey"] == po["o_orderkey"]))
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plain)) >= 2
        assert "hashpartitioning" in plain

    # Correctness: bucketed join result == plain parquet join result.
    n_bucketed = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"]).count()
    from go_fish_spark.catalog import table

    pli = table(spark, SF_SMALL, "lineitem")
    por = table(spark, SF_SMALL, "orders")
    n_plain = pli.join(por, pli["l_orderkey"] == por["o_orderkey"]).count()
    assert n_bucketed == n_plain


def test_bucketed_groupby_plans_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the stored partitioning."""
    from pyspark.sql import functions as F

    _, bl = bucketed_pair
    with _conf(spark, {"spark.sql.adaptive.enabled": "false"}):
        agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity"))
        assert "Exchange" not in _executed_plan(agg)


class _conf:
    """Temporarily set SQL confs, restoring previous values on exit."""

    def __init__(self, spark, confs: dict):
        self.spark, self.confs, self.saved = spark, confs, {}

    def __enter__(self):
        for k, v in self.confs.items():
            self.saved[k] = self.spark.conf.get(k, None)
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *a):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
