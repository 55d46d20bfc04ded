"""Q13–Q20 — relational completeness (SURVEY.md §2.6 gap map).

go-fish implements none of these (no SQL, no joins beyond the KV pattern, no
window functions, no set ops — SURVEY §2.6); they are required for
"analytics engine" parity-plus and come as Spark built-ins, so every query
here stays fully inside Catalyst/whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import joins
from . import query
from .util import duck_money_sum, duck_ts_str, money_sum, ts_str


def _orders_customer_nation(spark, sf_dir):
    """orders ⋈ customer ⋈ nation. Only nation (25 rows at any SF) carries
    a forced broadcast hint; customer SCALES with SF, so its join is left
    to AQE — at small SF it still broadcasts, at 100 TB it shuffles on
    o_custkey instead of OOMing the executors."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])


@query(
    "q13_join_inner",
    oracle=f"""
    SELECT n_name, count(*) AS orders_cnt, {duck_money_sum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def q13_join_inner(spark, sf_dir):
    """Inner join chain with broadcast dimensions (TPC-H Q5 shape)."""
    df = _orders_customer_nation(spark, sf_dir)
    return (
        df.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("orders_cnt"),
            money_sum("o_totalprice").alias("revenue"),
        )
        .orderBy("n_name")
    )


@query(
    "q13_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
def q13_join_semi(spark, sf_dir):
    """Left-semi join: EXISTS without materializing the probe side."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.semi_join(customer, orders, "c_custkey").select(
        "c_custkey", "c_name"
    ).orderBy("c_custkey")


@query(
    "q13_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT user_id FROM events)
    ORDER BY c_custkey
    """,
)
def q13_join_anti(spark, sf_dir):
    """Left-anti join: customers with no event activity (NOT EXISTS; keys
    are non-null so NOT IN is equivalent). customer⟂orders would be empty
    in the synthetic data — this pairing isn't (~9% of customers)."""
    customer = table(spark, sf_dir, "customer")
    events = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey")
    )
    return joins.anti_join(customer, events, "c_custkey").select(
        "c_custkey", "c_name"
    ).orderBy("c_custkey")


@query(
    "q14_rollup",
    oracle=f"""
    SELECT n_name, o_orderpriority, count(*) AS cnt,
           {duck_money_sum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, o_orderpriority)
    ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q14_rollup(spark, sf_dir):
    """Grouping sets via ROLLUP — one shuffle produces all three grouping
    levels (Spark expands rollup before the exchange)."""
    df = _orders_customer_nation(spark, sf_dir)
    return (
        df.rollup("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            money_sum("o_totalprice").alias("revenue"),
        )
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "q15_window_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate)             AS rnk,
           lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def q15_window_funcs(spark, sf_dir):
    """Ranking/analytic window functions (row_number/rank/lag) with a
    deterministic tiebreak on the unique key."""
    orders = table(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_ties = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.lag("o_totalprice").over(w_unique).alias("prev_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q16_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q16_topk(spark, sf_dir):
    """Top-k: Spark plans ORDER BY+LIMIT as TakeOrderedAndProject — each
    partition keeps only k rows, no global sort at any scale."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q17_setops",
    oracle="""
    SELECT * FROM (
      SELECT k, 'both' AS tag FROM
        (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
      UNION ALL
      SELECT k, 'only_customer' AS tag FROM
        (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
    ) ORDER BY k, tag
    """,
)
def q17_setops(spark, sf_dir):
    """INTERSECT / EXCEPT (distinct set semantics), tagged and fanned in."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ords = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    both = cust.intersect(ords).withColumn("tag", F.lit("both"))
    only = cust.subtract(ords).withColumn("tag", F.lit("only_customer"))
    return both.unionByName(only).orderBy("k", "tag")


@query(
    "q18_scalar_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           upper(l_linestatus)                          AS status_u,
           concat_ws('-', l_returnflag, l_linestatus)   AS flag_status,
           year(l_shipdate)                             AS ship_year,
           month(l_shipdate)                            AS ship_month,
           strftime(date_trunc('month', l_shipdate), '%Y-%m-%d %H:%M:%S') AS ship_month_start,
           date_diff('day', DATE '1995-01-01', l_shipdate) AS days_since_95,
           l_orderkey % 7                               AS key_mod,
           abs(l_orderkey - 1000)                       AS key_dist,
           CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
           substring(l_returnflag || l_linestatus, 1, 2) AS flag2
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q18_scalar_battery(spark, sf_dir):
    """Scalar function battery (string/date/math) — the reference's only
    scalar library is hand-written Go inside rules (regex
    `domain_cert_issued.go:19`, sprintf-concat `cloudTrail_s2s_join.go:
    101-109`, len `length.go:14`); here they are codegen'd built-ins."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.upper("l_linestatus").alias("status_u"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag_status"),
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        ts_str(F.date_trunc("month", F.col("l_shipdate"))).alias("ship_month_start"),
        F.datediff(F.col("l_shipdate"), F.lit("1995-01-01")).alias("days_since_95"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
        F.abs(F.col("l_orderkey") - 1000).alias("key_dist"),
        F.floor("l_quantity").alias("qty_floor"),
        F.substring(F.concat("l_returnflag", "l_linestatus"), 1, 2).alias("flag2"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q19_approx_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS exact_cnt, TRUE AS approx_ok FROM lineitem
    """,
)
def q19_approx_distinct(spark, sf_dir):
    """Exact vs approximate distinct. The HLL++ estimate itself is not
    hash-comparable across engines, so the contract is: exact count matches,
    and the Spark-side estimate is within 5% relative error (asserted as a
    boolean that the oracle pins to TRUE)."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count_distinct("l_partkey").alias("exact_cnt"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_cnt"),
    )
    return agg.select(
        "exact_cnt",
        (
            F.abs(F.col("approx_cnt") - F.col("exact_cnt"))
            / F.col("exact_cnt")
            < 0.05
        ).alias("approx_ok"),
    )


@query(
    "q20_json_extract",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events ORDER BY event_id
    """,
)
def q20_json_extract(spark, sf_dir):
    """JSON extraction from the events payload column ≡ the reference's
    per-rule re-decoding of untyped payloads (`cloudTrail_s2s_join.go:69-72`
    via mapstructure)."""
    return (
        table(spark, sf_dir, "events")
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
        .orderBy("event_id")
    )


@query(
    "q77_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.missing') AS absent,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events ORDER BY event_id
    """,
)
def q77_variant_json(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured payloads — the typed
    upgrade of q20's string-based get_json_object: ``parse_json`` builds
    the binary variant once, ``variant_get`` extracts with a TYPE (a cast
    error becomes an analysis-time contract, not a silent null), and
    ``try_variant_get`` gives the null-on-missing form. At scale the win
    is parse-once-extract-many: the variant column amortizes JSON parsing
    across every extraction, where get_json_object re-parses per call."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k_typed"),
            F.try_variant_get(v, "$.missing", "string").alias("absent"),
            F.try_parse_json("props").isNotNull().alias("is_valid"),
        )
        .orderBy("event_id")
    )


@query(
    "q79_recursive_series",
    oracle="""
    SELECT d AS day_offset, count(o.o_orderkey) AS n_orders
    FROM generate_series(0, 59) AS t(d)
    LEFT JOIN orders o
      ON datediff('day', DATE '1995-01-01', o.o_orderdate::DATE) = t.d
    GROUP BY d ORDER BY day_offset
    """,
)
def q79_recursive_series(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE, SPARK-24497): zero-filled
    daily order counts for the first 60 days — the calendar-fill shape a
    plain GROUP BY cannot produce (days with no orders must still appear).
    The series is generated by bounded UNION ALL recursion on the Spark
    side; the oracle builds the same series with DuckDB's generate_series
    — an INDEPENDENT implementation, so the compare checks the recursion
    result, not the same text twice. (UNION-distinct recursion — e.g.
    transitive closure over cyclic graphs — is not yet supported by Spark
    and stays on the DataFrame CC operator, x18.)"""
    from ..catalog import table

    table(spark, sf_dir, "orders").createOrReplaceTempView("q79_orders")
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
          SELECT 0
          UNION ALL
          SELECT d + 1 FROM days WHERE d < 59
        )
        SELECT d AS day_offset, count(o.o_orderkey) AS n_orders
        FROM days
        LEFT JOIN q79_orders o
          ON datediff(CAST(o.o_orderdate AS DATE), DATE '1995-01-01') = days.d
        GROUP BY d ORDER BY day_offset
        """
    )


@query(
    "q80_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT step, n_users FROM (
      SELECT '1_view' AS step, count(*) AS n_users FROM v
      UNION ALL SELECT '2_click', count(*) FROM c
      UNION ALL SELECT '3_purchase', count(*) FROM p
    ) ORDER BY step
    """,
)
def q80_funnel_steps(spark, sf_dir):
    """ORDER-SENSITIVE funnel analysis — the product-analytics shape a
    plain per-type count cannot express: a user converts a step only if
    the event happens strictly AFTER their first event of the previous
    step (first view → first later click → first later purchase).
    Expressed as three chained keyed aggregations, one per step, each
    over ONLY its own event-type slice — so every event row shuffles at
    most once (for its step's groupBy), and the per-user step frames
    (1 row/user) broadcast into the next step's join at this SF
    (plan-verified; beyond broadcast size AQE falls back to a
    sort-merge join on the shared user key). Output: 3 rows
    (step, n_users)."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def n(df, step):
        return df.agg(
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        n(v, "1_view")
        .unionByName(n(c, "2_click"))
        .unionByName(n(p, "3_purchase"))
        .orderBy("step")
    )


@query(
    "q81_lateral_chunk_udtf",
    oracle="""
    WITH w AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    c AS MATERIALIZED (
      SELECT doc_id, ws,
             CAST(ceil(greatest(len(ws) - 64, 0) / 48.0) AS INT) + 1 AS n_chunks
      FROM w
    ),
    e AS (
      SELECT doc_id, unnest(generate_series(1, n_chunks)) AS i, ws FROM c
    )
    SELECT doc_id, i - 1 AS chunk_id,
           least(64, len(ws) - (i-1)*48) AS n_tokens,
           array_to_string(list_slice(ws, (i-1)*48 + 1, (i-1)*48 + 64), ' ')
             AS chunk
    FROM e ORDER BY doc_id, chunk_id
    """,
)
def q81_lateral_chunk_udtf(spark, sf_dir):
    """The SQL-UDTF surface under the oracle contract: the same 64/48
    chunking as x24, but reached the way a pure-SQL user reaches it —
    ``LATERAL chunk_text(...)`` over a registered Python UDTF
    (tasks/sql_udtf.py, the reference's pluggable-rule surface for SQL).
    The UDTF is row-at-a-time Python BY DESIGN (pluggability, not the
    hot path — the vectorized twin is chunking.chunk_documents/x24, and
    the equality test pins them together); hash-checking this entry
    proves the convenience surface cannot drift from the fast one."""
    from ..tasks.sql_udtf import has_udtf, register_sql_udtfs

    if not has_udtf():  # Spark < 3.5 — environment, not data
        raise RuntimeError("Python UDTFs unavailable on this runtime")
    register_sql_udtfs(spark)
    table(spark, sf_dir, "documents").createOrReplaceTempView("q81_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens, c.chunk
        FROM q81_docs d, LATERAL chunk_text(d.text, 64, 48) c
        ORDER BY d.doc_id, c.chunk_id
        """
    )


@query(
    "q83_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    cohort AS (SELECT user_id, min(d) AS cd FROM ev GROUP BY user_id),
    sizes AS (SELECT cd, count(*) AS cohort_users FROM cohort GROUP BY cd),
    act AS (
      SELECT c.cd, CAST(date_diff('day', c.cd, e.d) AS INT) AS day_offset,
             count(*) AS active_users
      FROM ev e JOIN cohort c USING (user_id)
      GROUP BY c.cd, day_offset
    )
    SELECT strftime(a.cd, '%Y-%m-%d') AS cohort_day, a.day_offset,
           a.active_users, s.cohort_users,
           round(CAST(a.active_users AS DOUBLE)
                 / CAST(s.cohort_users AS DOUBLE), 9) AS retention
    FROM act a JOIN sizes s ON a.cd = s.cd
    ORDER BY cohort_day, day_offset
    """,
)
def q83_cohort_retention(spark, sf_dir):
    """Daily cohort retention — the canonical product-analytics matrix
    beside q80's funnel: users are cohorted by the calendar day of their
    FIRST event, and each (cohort_day, day_offset) cell counts users
    from that cohort active on that later day; retention is the cell
    over the cohort size (offset 0 is 1.0 by construction). Day
    granularity keeps MULTIPLE cohorts live on the 30-day testdata span
    (weekly truncation degenerates to one cohort there — same operator
    shape, coarser key).

    100 TB shape: ONE user-keyed exchange does ALL per-user work — a
    single groupBy(user) with partial aggregation yields min(day) AND
    collect_set(day) together (the set is bounded by the corpus's
    calendar span, ~365/year, never by event volume), so raw events
    shuffle exactly once. The matrix and the cohort sizes are bounded
    re-aggregations of that per-user frame (<= span^2 cells), and sizes
    join back as a BROADCAST. retention divides exact BIGINTs as
    DOUBLE (correctly rounded -> bit-equal cross-engine) + round-9."""
    from ..operators.dedup import _persist

    events = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    per_user = _persist(
        events.select("user_id", day.alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("cd"), F.collect_set("d").alias("ds"))
    )
    act = (
        per_user.select("cd", F.explode("ds").alias("d"))
        .withColumn("day_offset", F.datediff("d", "cd"))
        .groupBy("cd", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = per_user.groupBy("cd").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    return (
        act.join(F.broadcast(sizes), "cd")
        .select(
            F.date_format("cd", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "active_users",
            "cohort_users",
            F.round(
                F.col("active_users").cast("double")
                / F.col("cohort_users").cast("double"),
                9,
            ).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "q85_rfm_segments",
    oracle="""
    WITH m AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                            (SELECT CAST(max(o_orderdate) AS DATE)
                             FROM orders)) AS INT) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    n AS (SELECT count(*) AS _n FROM m),
    ranked AS (
      SELECT m.*,
        row_number() OVER (ORDER BY recency_days, o_custkey) AS r_rank,
        row_number() OVER (ORDER BY frequency DESC, o_custkey) AS f_rank,
        row_number() OVER (ORDER BY monetary DESC, o_custkey) AS m_rank
      FROM m
    ),
    scored AS (
      SELECT 'R' || CAST(1 + ((r_rank - 1) * 4) // _n AS VARCHAR)
          || 'F' || CAST(1 + ((f_rank - 1) * 4) // _n AS VARCHAR)
          || 'M' || CAST(1 + ((m_rank - 1) * 4) // _n AS VARCHAR) AS segment,
             monetary
      FROM ranked CROSS JOIN n
    )
    SELECT segment, count(*) AS n_customers,
           round(CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_monetary
    FROM scored GROUP BY segment ORDER BY segment
    """,
)
def q85_rfm_segments(spark, sf_dir):
    """RFM customer segmentation — the classic marketing-analytics
    rollup: per customer, Recency (days since last order, vs the
    corpus-wide latest order date), Frequency (order count), Monetary
    (exact decimal revenue), each quartiled over the purchaser
    population, then segment counts + average revenue per R/F/M cell.

    Quartiles are EXACT ranks, not ntile(): quartile =
    1 + ((rank−1)·4) div n over the deterministic total order
    (metric, custkey) — the same integer formula on both engines, with
    none of ntile's remainder-bucket ambiguity.

    100 TB shape: the per-customer frame is ONE o_custkey-keyed exchange
    with partial aggregation (persisted — it feeds all three rank
    kinds); the three global ranks ride ONE
    :func:`~go_fish_spark.operators.sampling.grouped_value_bucketed_rank`
    pipeline — the distributed TeraSort-rank shape (bounded per-bucket
    count frame → broadcast cumulative offsets → parallel per-bucket
    windows), so there is NO single-task global window even at 10⁹
    customers. The three metrics are unioned under a kind tag with a
    normalized ascending sort key (recency_days / −frequency /
    −monetary — negation of a decimal is exact, so desc order is
    preserved bit-for-bit) and each kind keeps exactly its pre-r14
    bucket function (the day value itself, the negated count, the
    1000-unit price band); offsets accumulate per kind, so each rank is
    dense 1..n per metric, and a ≤ |customers|-key pivot re-joins the
    three ranks. Three chained pipelines planned 64 scans of orders
    (every count side-branch recomputed the frame below it); the union
    shape scans once. The final report is a ≤ 64-key groupBy. Revenue
    sums ride decimal(18,2) (money_sum) so partitioned summation
    matches DuckDB exactly."""
    from ..operators.dedup import _persist
    from ..operators.sampling import grouped_value_bucketed_rank

    orders = table(spark, sf_dir, "orders")
    maxd = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("_maxd")
    )
    m = _persist(
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            money_sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff("_maxd", "_last").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # one row per (customer, rank kind): _ord is the kind's ASCENDING
    # sort key (cast to a common exact decimal), _vbv its bucket — the
    # same bucket value each kind used when it ranked alone
    kinds = [
        (0, "r_rank", F.col("recency_days").cast("decimal(38,2)"),
         F.col("recency_days").cast("long")),
        (1, "f_rank", (-F.col("frequency")).cast("decimal(38,2)"),
         -F.col("frequency")),
        (2, "m_rank", (-F.col("monetary")).cast("decimal(38,2)"),
         F.floor(-F.col("monetary") / 1000.0)),
    ]
    u = None
    for tag, _, ordk, vb in kinds:
        part = m.select(
            "o_custkey", "monetary",
            F.lit(tag).alias("_kind"),
            ordk.alias("_ord"),
            vb.cast("long").alias("_vbv"),
        )
        u = part if u is None else u.unionByName(part)
    ranked = grouped_value_bucketed_rank(
        u, "_kind", F.col("_vbv"),
        [F.col("_ord"), F.col("o_custkey")], out="_r",
    )
    # the customer count: from the persisted base frame (the pivot is
    # one row per customer by construction, so the count is the same —
    # counting the pivot would re-plan the whole rank pipeline in the
    # n branch)
    n = m.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    m = ranked.groupBy("o_custkey").agg(
        F.max("monetary").alias("monetary"),
        *[
            F.max(F.when(F.col("_kind") == tag, F.col("_r"))).alias(name)
            for tag, name, _, _ in kinds
        ],
    )
    q = lambda r: 1 + F.expr(f"(({r} - 1) * 4) div _n")  # noqa: E731
    return (
        m.crossJoin(F.broadcast(n))
        .select(
            F.concat(
                F.lit("R"), q("r_rank").cast("string"),
                F.lit("F"), q("f_rank").cast("string"),
                F.lit("M"), q("m_rank").cast("string"),
            ).alias("segment"),
            "monetary",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(money_sum("monetary") / F.count(F.lit(1)), 6).alias(
                "avg_monetary"
            ),
        )
        .orderBy("segment")
    )


@query(
    "q88_yoy_growth",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS yr,
             {duck_money_sum('o.o_totalprice')} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY nation, yr
    )
    SELECT nation, yr, revenue,
           lag(revenue) OVER (PARTITION BY nation ORDER BY yr)
             AS prev_revenue,
           round((revenue - lag(revenue) OVER (PARTITION BY nation
                                               ORDER BY yr))
                 / lag(revenue) OVER (PARTITION BY nation ORDER BY yr), 9)
             AS yoy_growth
    FROM rev ORDER BY nation, yr
    """,
)
def q88_yoy_growth(spark, sf_dir):
    """Year-over-year revenue growth per nation — the reporting staple
    that completes the window-function family with lag-over-groups on
    REAL money: revenue per (nation, year) with the previous year's
    revenue and the relative growth rate (NULL for each nation's first
    year, both engines).

    100 TB shape: one orders⋈customer shuffle (nation broadcasts), one
    (nation, year) groupBy with map-side combine down to a
    calendar-bounded frame; the lag window runs on that ≤ nations ×
    years frame. Revenue sums ride decimal(18,2) (money_sum), so
    partitioned summation is exact; growth is one fixed-order double
    expression + round-9."""
    rev = (
        _orders_customer_nation(spark, sf_dir)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return rev.select(
        "nation",
        "yr",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev, 9).alias("yoy_growth"),
    ).orderBy("nation", "yr")
