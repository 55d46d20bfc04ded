"""Q23–Q25 — remaining operator-inventory coverage.

* q23: deduplication via ``distinct`` (≡ ``dropDuplicates`` on the
  projected key set — the deterministic form; bare dropDuplicates keeps an
  arbitrary row per key, SURVEY §2.4 dedup row).
* q24: the trial-decode cascade (operators/decode.py) as a query —
  deterministic decoder precedence + required-field discrimination + dead
  letter (≡ `event_types.go:52-65`, `pipeline.go:393-405`).
* q25: CUBE grouping sets (rollup's sibling, SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..operators import decode
from . import query
from .util import duck_money_sum, money_sum


@query(
    "q23_dropduplicates",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
    """,
)
def q23_dropduplicates(spark, sf_dir):
    """Exact dedup on a key projection (`dropDuplicates` ≡ distinct on the
    selected columns; one hash-partitioned shuffle on the pair key)."""
    return (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .dropDuplicates()
        .orderBy("user_id", "event_type")
    )


#: Candidate event types for the props payload: a type requiring key `k`
#: (matches every event in testdata) tried AFTER a stricter type requiring
#: a key `z` that no event has — exercising precedence + fallthrough.
_PROPS_TYPES = [
    decode.EventType(
        name="ztype",
        schema=T.StructType([T.StructField("z", T.LongType())]),
        required=("z",),
    ),
    decode.EventType(
        name="ktype",
        schema=T.StructType([T.StructField("k", T.LongType())]),
        required=("k",),
    ),
]


@query(
    "q24_decode_cascade",
    oracle="""
    SELECT event_id,
           CASE WHEN json_extract(props, '$.z') IS NOT NULL THEN 'ztype'
                WHEN json_extract(props, '$.k') IS NOT NULL THEN 'ktype'
           END AS event_type_name,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events ORDER BY event_id
    """,
)
def q24_decode_cascade(spark, sf_dir):
    """Trial-decode cascade over the events props payload: first candidate
    whose required fields parse wins; unmatched rows surface with a null
    type (the dead-letter branch) instead of being dropped."""
    events = table(spark, sf_dir, "events")
    decoded = decode.decode_cascade(events, "props", _PROPS_TYPES)
    return decoded.select(
        "event_id",
        "event_type_name",
        F.col("decoded_ktype.k").alias("k"),
    ).orderBy("event_id")


@query(
    "q26_array_agg",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           len(list(DISTINCT event_type)) AS n_types
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q26_array_agg(spark, sf_dir):
    """Array aggregation: per-key distinct set collected into a sorted
    array (collect_set is unordered; sort_array makes it deterministic).
    The array is emitted as a comma-joined string on both engines — the
    driver's canonicalizer sorts/hashes rows with pandas, which cannot
    factorize ndarray cells (CORRECTNESS_r01 q26 crash); the string form
    is the same aggregation, hash-comparable."""
    arr = F.sort_array(F.collect_set("event_type"))
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(arr.alias("types_arr"))
        .select(
            "user_id",
            F.array_join("types_arr", ",").alias("types"),
            F.size("types_arr").alias("n_types"),
        )
        .orderBy("user_id")
    )


@query(
    "q27_explode_topk",
    oracle="""
    SELECT token, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY freq DESC, token LIMIT 20
    """,
)
def q27_explode_topk(spark, sf_dir):
    """Explode + aggregate + top-k: corpus token frequencies. The explode
    multiplies rows ~100×, partial aggregation collapses them map-side
    before the one shuffle; the final top-20 is TakeOrdered."""
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(20)
    )


@query(
    "q28_pivot",
    oracle="""
    SELECT user_id,
           CAST(coalesce(sum(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS click,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           CAST(coalesce(sum(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS BIGINT) AS error
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q28_pivot(spark, sf_dir):
    """Pivot: per-user event-type counts as columns. Pinning the pivot
    values keeps it a single-pass aggregation (no distinct-values scan)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "error"])
        .count()
        .na.fill(0, ["click", "purchase", "error"])
        .orderBy("user_id")
    )


@query(
    "q29_stats",
    oracle="""
    SELECT l_returnflag,
           min(l_quantity)    AS qty_min,
           max(l_quantity)    AS qty_max,
           median(l_quantity) AS qty_median,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(*)       AS qty_avg,
           count(*)           AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q29_stats(spark, sf_dir):
    """Order-statistic + exact-average battery. min/max/median are
    order-independent; the average divides an exact decimal sum so the
    double result is identical regardless of partitioning (a plain
    avg(double) would depend on Spark's partial-aggregation order)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("qty_min"),
            F.max("l_quantity").alias("qty_max"),
            F.median("l_quantity").alias("qty_median"),
            (money_sum("l_quantity") / F.count(F.lit(1))).alias("qty_avg"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q30_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity      AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,8))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity      AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(SUM(CAST(l_discount      AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q30_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (the canonical scan-heavy aggregate): 8 aggregates over a
    date-filtered lineitem scan, two group keys. All sums go through
    exact decimals (the per-row products are identical IEEE doubles on
    both engines; decimal summation removes partitioning-order effects).
    Partial aggregation collapses 6 M rows/SF to 4 groups map-side."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(22,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(24,8)")).cast("double").alias("sum_charge"),
            (money_sum("l_quantity") / cnt).alias("avg_qty"),
            (money_sum("l_extendedprice") / cnt).alias("avg_price"),
            (money_sum("l_discount") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q31_asof_join",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, 1 AS is_left, event_id,
             CAST(NULL AS BIGINT) AS click_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 0 AS is_left, CAST(NULL AS BIGINT) AS event_id,
             event_id AS click_id
      FROM events WHERE event_type = 'click'
    ), carried AS (
      SELECT *,
             last_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_left, click_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS asof_click_id
      FROM u
    )
    SELECT event_id, user_id, asof_click_id AS click_id
    FROM carried WHERE is_left = 1
    ORDER BY event_id
    """,
)
def q31_asof_join(spark, sf_dir):
    """As-of join between two streams: each purchase picks up the latest
    prior click of the same user (null = no prior click, the KV-miss
    branch). Union-window algorithm — one shuffle on user_id, no range
    explosion (operators/asof.py)."""
    from ..operators.asof import asof_join

    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["click_id"],
        tie_break="click_id",
    )
    return out.select("event_id", "user_id", "click_id").orderBy("event_id")


@query(
    "q32_range_join",
    oracle="""
    SELECT event_id, value,
           CASE WHEN value >= 0.0   AND value < 1.0    THEN 'small'
                WHEN value >= 1.0   AND value < 10.0   THEN 'mid'
                WHEN value >= 10.0  AND value < 100.0  THEN 'large'
                WHEN value >= 100.0 AND value < 1000.0 THEN 'huge'
           END AS bucket
    FROM events ORDER BY event_id
    """,
)
def q32_range_join(spark, sf_dir):
    """Range join: each event joins the bucket whose [lo, hi) interval
    contains its value. The bucket table broadcasts, so the fact side
    never shuffles (BroadcastNestedLoopJoin over a 4-row dim)."""
    from ..operators.asof import range_join

    events = table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [(0.0, 1.0, "small"), (1.0, 10.0, "mid"), (10.0, 100.0, "large"), (100.0, 1000.0, "huge")],
        "lo double, hi double, bucket string",
    )
    out = range_join(events, buckets, F.col("value"), "lo", "hi")
    return out.select("event_id", "value", "bucket").orderBy("event_id")


@query(
    "q37_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    QUALIFY rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q37_topk_per_group(spark, sf_dir):
    """Per-group top-k (top 3 orders per customer by price): window
    row_number with a deterministic tiebreak — the distributed top-k that
    keeps k rows per group without a global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q38_argmax",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) = 1
    ORDER BY c_nationkey
    """,
)
def q38_argmax(spark, sf_dir):
    """Argmax per group (richest customer per nation) — the correlated-
    subquery pattern (max + join back) expressed as one window pass, no
    second scan or join."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        table(spark, sf_dir, "customer")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
        .orderBy("c_nationkey")
    )


@query(
    "q39_string_null_battery",
    oracle="""
    SELECT doc_id,
           lpad(CAST(doc_id AS VARCHAR), 8, '0')        AS padded,
           translate(lang, 'aeiou', 'AEIOU')            AS lang_t,
           regexp_replace(source, '[0-9]+', '#', 'g')   AS src_masked,
           repeat(lang, 2)                              AS lang2,
           reverse(lang)                                AS lang_r,
           split_part(source, 'rc', 2)                  AS src_part,
           strpos(text, 'spark')                        AS spark_pos,
           nullif(lang, 'en')                           AS lang_non_en,
           coalesce(nullif(lang, 'en'), 'english')      AS lang_label
    FROM documents ORDER BY doc_id
    """,
)
def q39_string_null_battery(spark, sf_dir):
    """String + null-handling battery (lpad/translate/regexp_replace/
    repeat/reverse/split_part/locate/nullif/coalesce) — all codegen'd
    built-ins, verified identical across engines."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_t"),
        F.regexp_replace("source", "[0-9]+", "#").alias("src_masked"),
        F.repeat("lang", 2).alias("lang2"),
        F.reverse("lang").alias("lang_r"),
        F.split_part(F.col("source"), F.lit("rc"), F.lit(2)).alias("src_part"),
        F.locate("spark", F.col("text")).cast("long").alias("spark_pos"),
        F.nullif(F.col("lang"), F.lit("en")).alias("lang_non_en"),
        F.coalesce(F.nullif(F.col("lang"), F.lit("en")), F.lit("english")).alias(
            "lang_label"
        ),
    ).orderBy("doc_id")


@query(
    "q40_map_json",
    oracle="""
    SELECT event_id,
           json_object('type', event_type, 'uid', user_id)::VARCHAR AS payload
    FROM events ORDER BY event_id
    """,
)
def q40_map_json(spark, sf_dir):
    """Map construction + JSON serialization: create_map → to_json (the
    OutputEvent Body pattern, `output/event.go:18` map<string,any> →
    JSON-marshal at the sink, `output/file.go:41`)."""
    e = table(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_type").alias("type"),
            F.col("user_id").alias("uid"),
        )
    )
    return e.select("event_id", payload.alias("payload")).orderBy("event_id")


@query(
    "q36_unpivot",
    oracle="""
    SELECT event_id, metric, val FROM (
      SELECT event_id, 'value' AS metric, value AS val FROM events
      UNION ALL
      SELECT event_id, 'user_id' AS metric, CAST(user_id AS DOUBLE) AS val FROM events
    ) ORDER BY event_id, metric
    """,
)
def q36_unpivot(spark, sf_dir):
    """Unpivot (wide→long) via stack — the inverse of q28's pivot; stays a
    single narrow projection (2 output rows per input, no shuffle)."""
    return (
        table(spark, sf_dir, "events")
        .selectExpr(
            "event_id",
            "stack(2, 'value', value, 'user_id', CAST(user_id AS DOUBLE)) AS (metric, val)",
        )
        .orderBy("event_id", "metric")
    )


@query(
    "q33_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
             AS revenue,
           strftime(any_value(o_orderdate), '%Y-%m-%d %H:%M:%S') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q33_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): selective dimension filter on
    customer → join into orders → shuffle join with lineitem → top-10 by
    revenue.

    Scale shape: NO forced hints. Even the ~1/5-segment customer key
    projection scales with SF (150k x SF rows before the filter), so its
    join strategy belongs to AQE — at small SF runtime sizes still pick a
    broadcast; at 100 TB a forced hint would override
    autoBroadcastJoinThreshold and OOM."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    from .util import ts_str

    return (
        li.join(
            orders.join(cust, orders["o_custkey"] == cust["c_custkey"]),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.sum(revenue.cast("decimal(22,6)")).cast("double").alias("revenue"),
            ts_str(F.any_value("o_orderdate")).alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q34_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q34_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape (local supplier volume): five-way join with the
    customer-nation = supplier-nation co-location predicate.

    Scale shape: only the true fixed-size dimensions (nation=25 rows,
    region=5 rows at any SF) carry explicit broadcast hints; supplier,
    orders, and customer SCALE with the fact data, so their joins carry no
    hint (AQE still broadcasts them at small SF where they fit under
    autoBroadcastJoinThreshold, so the local bench is unchanged; at
    100 TB a forced broadcast would OOM)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        df.groupBy("n_name")
        .agg(F.sum(revenue.cast("decimal(22,6)")).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q35_tpch_q18",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, o_orderkey
    HAVING total_qty > 150
    ORDER BY total_qty DESC, o_orderkey
    """,
)
def q35_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): aggregate-then-filter
    (HAVING) over the fact join — partial aggregation collapses lineitem
    before the exchange, the HAVING prunes post-agg.

    Scale shape: orders and customer scale with SF, so neither is
    force-broadcast — both joins are left to AQE (broadcast at bench SF,
    shuffle at scale). Columns are pruned to the join/agg keys so the
    shuffled orders side is two 8-byte columns."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "o_orderkey")
        .agg(money_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


@query(
    "q25_cube",
    oracle=f"""
    SELECT n_name, o_orderpriority, count(*) AS cnt,
           {duck_money_sum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY CUBE(n_name, o_orderpriority)
    ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q25_cube(spark, sf_dir):
    """CUBE grouping sets: all four grouping levels from one shuffle."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    df = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    return (
        df.cube("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            money_sum("o_totalprice").alias("revenue"),
        )
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )
