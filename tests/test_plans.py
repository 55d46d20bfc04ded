"""Physical-plan regression tests: the scale-critical plan shapes must not
silently degrade (a correct-but-shuffling plan is a failure at 100 TB even
though every value matches)."""

from __future__ import annotations

import os

import pytest

from conftest import SF_SMALL

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMALL)


def plan_of(spark, name: str) -> str:
    from go_fish_spark.queries import REGISTRY

    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q01_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "q01_filter_eq")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" in plan


def test_q07_dimension_broadcast_and_pruned(spark):
    plan = plan_of(spark, "q07_enrich_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # events scan must read only the needed columns
    assert "struct<event_id:bigint,user_id:bigint>" in plan


def test_q13_both_dims_broadcast(spark):
    plan = plan_of(spark, "q13_join_inner")
    # formatted mode prints each node in the tree and in the detail list
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_q16_topk_is_take_ordered(spark):
    plan = plan_of(spark, "q16_topk")
    assert "TakeOrderedAndProject" in plan


def test_q13_semi_anti_join_types(spark):
    assert "LeftSemi" in plan_of(spark, "q13_join_semi")
    assert "LeftAnti" in plan_of(spark, "q13_join_anti")


def test_x06_queries_broadcast_corpus_never_shuffles(spark):
    plan = plan_of(spark, "x06_ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
