"""Semantic unit tests for the round-6 behavioral-analytics additions:
PMI collocations (x95), cohort retention (q83), transition entropy (q84).

The registry-wide differential test (test_correctness.py) already checks
each against its DuckDB oracle; these pin the SEMANTICS on hand-built
inputs where the expected numbers are derivable by hand.
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F


def test_pmi_ranks_true_collocation_over_chance(spark):
    """A pair that ALWAYS co-occurs ("new york") must outrank pairs of
    independently-frequent words, and its PMI must match the hand
    formula ln(p_xy / (p_x * p_y))."""
    from go_fish_spark.operators.ngrams import pmi_collocations

    # 6 docs: "new york" appears 6 times, always adjacent; "the cat" /
    # "the dog" mix freely so "the"-pairs are near-chance.
    rows = [
        (i, "new york is where the cat saw the dog") for i in range(3)
    ] + [(3 + i, "the dog and the cat left new york") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, "doc_id", "text", min_count=3, top_k=10)
    got = {(r.w1, r.w2): (r.pair_count, r.pmi) for r in out.collect()}

    assert ("new", "york") in got
    n_pairs, pmi = got[("new", "york")]
    assert n_pairs == 6
    # Hand formula: every "new" is followed by "york" and both are
    # corpus-frequency 6.  N_tok = 3x9 + 3x8 tokens, N_pairs = 3x8 + 3x7.
    expect = math.log((6 / 45.0) / ((6 / 51.0) * (6 / 51.0)))
    assert abs(pmi - expect) < 1e-8
    # The perfect collocation beats every "the ?" chance pair.
    the_pairs = [v[1] for k, v in got.items() if k[0] == "the"]
    assert the_pairs and all(pmi > p for p in the_pairs)


def test_pmi_min_count_floor_drops_rare_pairs(spark):
    from go_fish_spark.operators.ngrams import pmi_collocations

    df = spark.createDataFrame(
        [(0, "rare hapax pair"), (1, "common word common word common word")],
        "doc_id long, text string",
    )
    out = pmi_collocations(df, "doc_id", "text", min_count=2, top_k=10)
    pairs = {(r.w1, r.w2) for r in out.collect()}
    assert ("rare", "hapax") not in pairs  # count 1 < floor
    assert ("common", "word") in pairs  # count 3


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )


def test_cohort_retention_matrix_golden(spark):
    """Two users cohorted on day 1, one on day 2; day-1 cohort halves on
    day 2. Offset-0 retention is exactly 1.0 for every cohort."""
    from go_fish_spark.queries import REGISTRY  # noqa: F401 (import check)

    t = lambda d, h: datetime.datetime(2024, 1, d, h)
    events = _ev(
        spark,
        [
            (1, t(1, 9), "a", "view"),
            (2, t(1, 10), "b", "view"),
            (3, t(2, 9), "a", "click"),  # only a returns on day 2
            (4, t(2, 10), "c", "view"),  # c's first day is day 2
            (5, t(3, 9), "c", "click"),
        ],
    )
    day = F.date_trunc("day", F.col("ts")).cast("date")
    per_user = events.select("user_id", day.alias("d")).groupBy("user_id").agg(
        F.min("d").alias("cd"), F.collect_set("d").alias("ds")
    )
    act = (
        per_user.select("cd", F.explode("ds").alias("d"))
        .withColumn("day_offset", F.datediff("d", "cd"))
        .groupBy("cd", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = per_user.groupBy("cd").agg(F.count(F.lit(1)).alias("cohort_users"))
    out = {
        (str(r.cd), r.day_offset): (r.active_users, r.cohort_users)
        for r in act.join(sizes, "cd").collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2)
    assert out[("2024-01-01", 1)] == (1, 2)  # only a returned
    assert out[("2024-01-02", 0)] == (1, 1)
    assert out[("2024-01-02", 1)] == (1, 1)


def test_transition_entropy_extremes(spark):
    """A deterministic successor gives H=0; a 2-way uniform successor
    gives H=ln 2. Successors are per-user and time-ordered, so u3's
    interleaved OTHER events must not pollute u1/u2's chains."""
    from go_fish_spark.queries import REGISTRY

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    # u1: A->B A->B ; u2: A->C A->C ; det: D->E D->E (deterministic)
    events = _ev(
        spark,
        [
            (1, t(0), "u1", "A"), (2, t(1), "u1", "B"),
            (3, t(2), "u1", "A"), (4, t(3), "u1", "B"),
            (5, t(0), "u2", "A"), (6, t(1), "u2", "C"),
            (7, t(2), "u2", "A"), (8, t(3), "u2", "C"),
            (9, t(0), "u3", "D"), (10, t(1), "u3", "E"),
            (11, t(2), "u3", "D"), (12, t(3), "u3", "E"),
        ],
    )
    events.createOrReplaceTempView("_tmp_events_entropy")
    # Reuse the registered query's logic by monkey-loading its frame via
    # the same expressions (the registry fn reads from parquet, so we
    # inline the identical pipeline here).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = events.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = tr.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("_c"))
    tot = c.groupBy("prev_type").agg(
        F.sum("_c").alias("_t"), F.count(F.lit(1)).alias("n_next_types")
    )
    p = F.col("_c").cast("double") / F.col("_t").cast("double")
    ent = (
        c.join(tot, "prev_type")
        .groupBy("prev_type")
        .agg(F.round(-F.sum(p * F.log(p)), 9).alias("entropy"))
    )
    got = {r.prev_type: r.entropy for r in ent.collect()}
    # A's successor is B half the time, C half the time -> ln 2.
    assert abs(got["A"] - math.log(2)) < 1e-9
    # D always goes to E -> zero entropy.
    assert got["D"] == 0.0
    # B/C/E chain into the next A/D within the same user (lead crosses
    # within-user gaps): B->A, C->A, E->D are each deterministic.
    assert got["B"] == 0.0 and got["C"] == 0.0 and got["E"] == 0.0
    assert "u3" not in got  # sanity: keys are event types, not users

    # The registered query exists with an oracle (contract invariant).
    assert REGISTRY["q84_transition_entropy"].oracle is not None
    assert REGISTRY["q83_cohort_retention"].oracle is not None
    assert REGISTRY["x95_pmi_collocations"].oracle is not None
