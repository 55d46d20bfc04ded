"""Round-10 tests: the three r9 ADVICE fixes (spectrum decimal-overflow
guard, generic/single-label silhouette, NULL-score KS denominator), the
session-cached x20 curation pass, and the round's new production arms.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


# --- ADVICE #1: embedding_spectrum_audit overflow guard ---------------------


def test_spectrum_overflow_raises_clear_error(spark):
    """DECIMAL(38,30) leaves 8 integer digits; a sum past 1e8 yields a
    NULL decimal under non-ANSI mode, which used to surface as
    float(None) TypeError far from the cause. Now: ValueError at the
    accumulation site with a remediation hint."""
    from go_fish_spark.operators.profile import embedding_spectrum_audit

    # 50 rows of [1e5, 1e5]: sum(x_i * x_j) = 50 * 1e10 >> 1e8 overflow
    df = spark.createDataFrame(
        [(i, [1.0e5, 1.0e5]) for i in range(50)],
        "doc_id long, emb array<double>",
    )
    with pytest.raises(ValueError, match="overflow"):
        embedding_spectrum_audit(df, "emb", 2, id_col="doc_id")


def test_spectrum_normalized_vectors_still_fine(spark):
    from go_fish_spark.operators.profile import embedding_spectrum_audit

    df = spark.createDataFrame(
        [(i, [math.cos(i * 0.1), math.sin(i * 0.1)]) for i in range(40)],
        "doc_id long, emb array<double>",
    )
    out = embedding_spectrum_audit(df, "emb", 2, id_col="doc_id")
    assert out["n"] == 40 and out["total_var"] > 0


# --- ADVICE #2: centroid_silhouette label genericity -------------------------


def test_silhouette_string_labels(spark):
    """label_col is generic per the signature: string labels (with a
    quote character, exercising SQL escaping) must work, not crash in
    repr(int(label))."""
    from go_fish_spark.operators.similarity import centroid_silhouette

    rows = (
        [(i, "alpha's", [0.0, float(i % 3) * 0.01]) for i in range(10)]
        + [(100 + i, "beta", [5.0, float(i % 3) * 0.01]) for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, lab string, emb array<double>"
    )
    out = centroid_silhouette(df, "doc_id", "lab", "emb", 2).collect()
    assert [r.lab for r in out] == ["alpha's", "beta"]
    # well-separated clusters -> silhouette near 1
    assert all(r.mean_silhouette > 0.9 for r in out)


def test_silhouette_single_label_is_null_not_nan(spark):
    """With one cluster there is no nearest-OTHER centroid: b and s are
    undefined -> published as NULL, never Inf/Inf = NaN."""
    from go_fish_spark.operators.similarity import centroid_silhouette

    df = spark.createDataFrame(
        [(i, 7, [float(i % 5), 1.0]) for i in range(12)],
        "doc_id long, lab long, emb array<double>",
    )
    rows = centroid_silhouette(df, "doc_id", "lab", "emb", 2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n == 12 and r.mean_a is not None
    assert r.mean_b is None and r.mean_silhouette is None


# --- ADVICE #3: ks_drift NULL scores -----------------------------------------


def test_ks_drift_null_scores_excluded_from_denominator(spark):
    """NULL scores must not count in a group's n: with them included
    the group ECDF never reaches 1 and the sup-gap is distorted. The
    result over (scores + NULLs) must equal the result over the same
    frame with the NULL rows dropped."""
    from go_fish_spark.operators.profile import ks_drift

    base = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (3, 4, 5, 6)
    ]
    with_nulls = base + [("a", None), ("a", None), ("b", None)]
    d_clean = spark.createDataFrame(base, "g string, s double")
    d_null = spark.createDataFrame(with_nulls, "g string, s double")
    clean = {r.g: (r.n, r.ks) for r in ks_drift(d_clean, "g", "s").collect()}
    nulled = {r.g: (r.n, r.ks) for r in ks_drift(d_null, "g", "s").collect()}
    assert clean == nulled
    assert clean["a"][0] == 4  # n counts scored rows only


# --- x20 session-cached curation pass ----------------------------------------


def test_shared_curation_pass_cached_and_released(spark):
    """The flagship's (survivors, audit) pass fits once per (session,
    corpus fingerprint): a second call returns the SAME objects; an
    explicit release clears the cache so the next call refits."""
    from tests.conftest import SF_SMALL

    from go_fish_spark.queries.extensions._shared import (
        _CURATION_PASSES,
        release_session_caches,
        shared_curation_pass,
    )

    release_session_caches()
    surv1, audit1 = shared_curation_pass(spark, SF_SMALL)
    surv2, audit2 = shared_curation_pass(spark, SF_SMALL)
    assert surv1 is surv2 and audit1 is audit2
    assert len(_CURATION_PASSES) == 1
    release_session_caches()
    assert len(_CURATION_PASSES) == 0
    surv3, _ = shared_curation_pass(spark, SF_SMALL)
    assert surv3 is not surv1
    release_session_caches()


def test_x20_output_unchanged_by_caching(spark):
    """Caching is transparent: two x20 runs (cold fit, then cached)
    produce identical rows."""
    from tests.conftest import SF_SMALL

    from go_fish_spark.queries import REGISTRY
    from go_fish_spark.queries.extensions._shared import (
        release_session_caches,
    )

    release_session_caches()
    fn = REGISTRY["x20_curation_pipeline"].fn
    r1 = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    r2 = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    assert r1 == r2 and len(r1) > 0
    release_session_caches()
