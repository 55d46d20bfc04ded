"""Q1–Q12 — queries reproducing the reference's operator patterns
(SURVEY.md §2.7, bindings from FIXTURES.md §B).

Fixture-role mapping: ``events`` plays the CloudTrail stream (``event_type``
≡ ``eventName`` dispatch key), ``customer`` plays the KV enrichment side,
``documents.text`` plays ``ExampleType.Str``, ``part.p_name`` plays the
regex-matched domain strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..operators import aggregates, filters, joins, project
from . import query
from .util import duck_ts_str, ts_str

# Six-way principal mapping ≡ generatePrincipalName's switch over
# UserIdentity.Type (`s2s_rules/cloudTrail_s2s_join.go:98-130`), keyed off
# event_type in the synthetic stream.
PRINCIPAL_MAP = {
    "click": "user",
    "view": "account",
    "purchase": "role",
    "signup": "federated",
    "error": "service",
}


@query(
    "q01_filter_eq",
    oracle=f"""
    SELECT event_id, {duck_ts_str('ts')} AS ts, user_id, event_type, value, props
    FROM events WHERE event_type = 'click' ORDER BY event_id
    """,
)
def q01_filter_eq(spark, sf_dir):
    """Equality filter ≡ `testdata/rules/a.go:12-18` (Str == "a")."""
    df = filters.eq_filter(table(spark, sf_dir, "events"), "event_type", "click")
    return df.select(
        "event_id", ts_str("ts").alias("ts"), "user_id", "event_type", "value", "props"
    ).orderBy("event_id")


@query(
    "q02_filter_len",
    oracle="""
    SELECT doc_id, text FROM documents WHERE length(text) < 100 ORDER BY doc_id
    """,
)
def q02_filter_len(spark, sf_dir):
    """Length filter ≡ `testdata/rules/length.go:12-18` (len(Str) == 1)."""
    df = filters.length_filter(table(spark, sf_dir, "documents"), "text", lt=100)
    return df.select("doc_id", "text").orderBy("doc_id")


@query(
    "q03_filter_regex",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, '^(red|hot) w') ORDER BY p_partkey
    """,
)
def q03_filter_regex(spark, sf_dir):
    """Regex filter ≡ `domain_cert_issued.go:19,40` (^www.* on domains;
    the anchored-prefix pattern shape, bound to a pattern that actually
    matches the synthetic part names)."""
    df = filters.regex_filter(table(spark, sf_dir, "part"), "p_name", "^(red|hot) w")
    return df.select("p_partkey", "p_name").orderBy("p_partkey")


@query(
    "q04_project",
    oracle=f"""
    SELECT o_orderkey AS event_id, 'Orders' AS source,
           {duck_ts_str('o_orderdate')} AS event_time, o_orderpriority AS name
    FROM orders ORDER BY event_id
    """,
)
def q04_project(spark, sf_dir):
    """OutputEvent-style projection ≡ `cloudTrail_s2s_join.go:80-96`
    (rename + literal + construction into the canonical output shape)."""
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("event_id"),
            F.lit("Orders").alias("source"),
            ts_str("o_orderdate").alias("event_time"),
            F.col("o_orderpriority").alias("name"),
        )
        .orderBy("event_id")
    )


@query(
    "q05_case_derive",
    oracle="""
    SELECT event_id,
           CASE event_type
             WHEN 'click'    THEN 'user/'      || CAST(user_id AS VARCHAR)
             WHEN 'view'     THEN 'account/'   || CAST(user_id AS VARCHAR)
             WHEN 'purchase' THEN 'role/'      || CAST(user_id AS VARCHAR)
             WHEN 'signup'   THEN 'federated/' || CAST(user_id AS VARCHAR)
             WHEN 'error'    THEN 'service/'   || CAST(user_id AS VARCHAR)
             ELSE 'root/' || CAST(user_id AS VARCHAR)
           END AS entity
    FROM events ORDER BY event_id
    """,
)
def q05_case_derive(spark, sf_dir):
    """Conditional scalar derivation ≡ generatePrincipalName's 6-way switch
    (`cloudTrail_s2s_join.go:98-130`)."""
    df = table(spark, sf_dir, "events")
    entity = project.principal_name(F.col("event_type"), F.col("user_id"), PRINCIPAL_MAP)
    return df.select("event_id", entity.alias("entity")).orderBy("event_id")


@query(
    "q06_dispatch_union",
    oracle="""
    SELECT * FROM (
      SELECT event_id, 'NewUser' AS name, 'user/' || CAST(user_id AS VARCHAR) AS entity
      FROM events WHERE event_type = 'signup'
      UNION ALL
      SELECT event_id, 'Err' AS name, 'service/' || CAST(user_id AS VARCHAR) AS entity
      FROM events WHERE event_type = 'error'
    ) ORDER BY event_id
    """,
)
def q06_dispatch_union(spark, sf_dir):
    """Dispatch on event kind into branches, then fan-in ≡ the
    `switch EventName` routing (`cloudTrail_s2s_join.go:43-56`) merged into
    one sink (`pipeline.go:387-391`)."""
    df = table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    branches = project.dispatch(
        df,
        "event_type",
        {
            "signup": [
                F.col("event_id"),
                F.lit("NewUser").alias("name"),
                F.concat(F.lit("user/"), uid).alias("entity"),
            ],
            "error": [
                F.col("event_id"),
                F.lit("Err").alias("name"),
                F.concat(F.lit("service/"), uid).alias("entity"),
            ],
        },
    )
    return branches["signup"].unionByName(branches["error"]).orderBy("event_id")


@query(
    "q07_enrich_join",
    oracle="""
    SELECT e.event_id, coalesce(c.c_name, CAST(e.user_id AS VARCHAR)) AS entity
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    ORDER BY e.event_id
    """,
)
def q07_enrich_join(spark, sf_dir):
    """Enrichment join with miss-fallback ≡ the KV lookup in
    `cloudTrail_s2s_join.go:124-130` (kv.Get hit → stored principal, miss →
    raw PrincipalID). Dimension side is broadcast: at 100 TB the events
    stream never shuffles for this join."""
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    df = joins.enrichment_join(
        events,
        customer,
        on=events["user_id"] == customer["c_custkey"],
        enriched=customer["c_name"],
        fallback=events["user_id"].cast("string"),
        alias="entity",
    )
    return df.select("event_id", "entity").orderBy("event_id")


@query(
    "q08_keyed_agg",
    oracle=f"""
    SELECT user_id, count(*) AS occurrences, {duck_ts_str('min(ts)')} AS first_seen
    FROM events WHERE value < 0.5 GROUP BY user_id ORDER BY user_id
    """,
)
def q08_keyed_agg(spark, sf_dir):
    """Keyed count w/ first-event metadata ≡ `agg_rules/cloudTrail_agg.go:
    30-72` (get-or-create per principal, Occurrences++; golden 3→1 row with
    Occurrences=3). The `MfaAuthenticated == "false"` gate maps to
    ``value < 0.5`` (FIXTURES.md Q8 fallback: props carries no mfa key)."""
    df = table(spark, sf_dir, "events").filter(F.col("value") < 0.5)
    out = aggregates.keyed_count(
        df, "user_id", extra_aggs=[ts_str(F.min("ts")).alias("first_seen")]
    )
    return out.orderBy("user_id")


@query("q09_global_count", oracle="SELECT count(*) AS cnt FROM events")
def q09_global_count(spark, sf_dir):
    """Global counter ≡ `state/count.go:18-31` (Increment + window read)."""
    return aggregates.global_count(table(spark, sf_dir, "events"))


@query(
    "q10_tumbling_window",
    oracle=f"""
    SELECT {duck_ts_str("date_trunc('hour', ts)")} AS window_start,
           user_id, count(*) AS occurrences
    FROM events GROUP BY 1, 2 ORDER BY window_start, user_id
    """,
)
def q10_tumbling_window(spark, sf_dir):
    """Tumbling-window keyed count ≡ the windowed drain
    (`window.go:38-49` + `agg_rules/cloudTrail_agg.go:74-96`), upgraded to
    event-time (SURVEY §2.4 quirk: reference windows are processing-time)."""
    df = table(spark, sf_dir, "events")
    out = aggregates.tumbling_window_count(df, "ts", "1 hour", ["user_id"])
    return out.select(
        ts_str(F.col("win.start")).alias("window_start"), "user_id", "occurrences"
    ).orderBy("window_start", "user_id")


@query(
    "q11_fanin_union",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey AS k, 'o' AS src FROM orders
      UNION ALL
      SELECT l_orderkey AS k, 'l' AS src FROM lineitem
    ) ORDER BY k, src
    """,
)
def q11_fanin_union(spark, sf_dir):
    """Fan-in merge ≡ several rules feeding one sink channel
    (`pipeline.go:387-391`)."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.lit("o").alias("src")
    )
    l = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.lit("l").alias("src")
    )
    return o.unionByName(l).orderBy("k", "src")


@query(
    "q12_array_exists",
    oracle="""
    SELECT doc_id FROM documents
    WHERE len(list_filter(string_split(text, ' '), x -> regexp_matches(x, '^win'))) > 0
    ORDER BY doc_id
    """,
)
def q12_array_exists(spark, sf_dir):
    """Array traversal + exists ≡ the AllDomains loop
    (`domain_cert_issued.go:39-41`), via the ``exists`` higher-order
    function — no explode, no shuffle."""
    df = table(spark, sf_dir, "documents")
    out = filters.array_exists_filter(df, F.split(F.col("text"), " "), "^win")
    return out.select("doc_id").orderBy("doc_id")
