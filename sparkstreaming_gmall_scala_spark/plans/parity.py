"""Reference-parity queries (SURVEY.md §2) over the driver's test tables.

Each query re-expresses one reference operator/pipeline on the TPC-H-ish
test schema: `orders`/`lineitem` stand in for the order_info/order_detail
facts, `customer`/`nation`/`region`/`part` for the dimensions, `events`
for the start-log stream. The oracle SQL is the same computation in ANSI
SQL for DuckDB.

Cross-engine determinism rules used throughout (so value-hashes match):
- money sums go through DECIMAL(18,2) (exact, order-insensitive), then
  cast to DOUBLE at the end;
- 2-dp rounding is floor(x*100 + 0.5)/100 — pure IEEE double ops,
  bit-identical in Spark and DuckDB (round()'s tie behavior is not);
- every window/top-k order includes a unique tiebreaker column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hints import scaled_dim
from ..functions.dates import dt_of, hr_of
from ..functions.money import money
from ..operators.allocation import allocate
from ..operators.cdc import route_by_rules
from ..operators.enrich import enrich_left
from ..operators.flags import first_event_flag
from ..sources import load_table
from .catalog import register

# Exact decimal line revenue: extendedprice * (1 - discount).
def _revenue_dec(price: str = "l_extendedprice", disc: str = "l_discount"):
    one = F.lit(1).cast("decimal(18,2)")
    return money(price) * (one - money(disc))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# A1 — per-batch hash aggregation (ads/TrademarkStatApp.scala:67-72) as the
# flagship: revenue by brand through a dim join (AQE-broadcast at bench SF).
# ---------------------------------------------------------------------------
@register(
    "trademark_stat",
    oracle=f"""
    SELECT p.p_brand AS brand,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS amount,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("parity", "agg", "join", "flagship"),
)
def trademark_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + J3 + P7: revenue grouped by brand (the TrademarkStat chain,
    reference: ads/TrademarkStatApp.scala:67-72,127). part scales with
    sf, so it carries no pinned broadcast hint: AQE broadcasts it from
    its ACTUAL size at bench SF (fact side never shuffles for the join)
    and falls back to sort-merge at 100 TB where a hint would OOM; the
    aggregate does one shuffle with map-side partials (Catalyst
    hash-agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(scaled_dim(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(F.sum(_revenue_dec()), 2).cast("double").alias("amount"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# A1 extended — the classic pricing-summary shape (TPC-H Q1): the batch agg
# surface the reference lacks but Catalyst gives free (SURVEY.md §2.4 "not
# present ... free via Catalyst").
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum({_REV_SQL} * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
           floor((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * 100 + 0.5) / 100 AS avg_qty,
           floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * 100 + 0.5) / 100 AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("parity", "agg"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate with a pushed-down scan filter; partial
    aggregation map-side, one shuffle on the (tiny-cardinality) group key."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,2)")
    cnt = F.count(F.lit(1))
    sum_qty = F.sum(money("l_quantity"))
    sum_price = F.sum(money("l_extendedprice"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.cast("double").alias("sum_qty"),
        sum_price.cast("double").alias("sum_base_price"),
        F.round(F.sum(_revenue_dec()), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(_revenue_dec() * (one + money("l_tax"))), 2)
        .cast("double")
        .alias("sum_charge"),
        (F.floor((sum_qty.cast("double") / cnt) * 100 + 0.5) / 100).alias("avg_qty"),
        (F.floor((sum_price.cast("double") / cnt) * 100 + 0.5) / 100).alias(
            "avg_price"
        ),
        cnt.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# J3/J4 — dimension enrichment with left-join missing-dim semantics
# (dwd/OrderInfoApp.scala:194-221 broadcast; :227-253 lookup).
# ---------------------------------------------------------------------------
@register(
    "order_enrich",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderstatus,
           c.c_name, c.c_mktsegment, n.n_name AS nation_name,
           r.r_name AS region_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("parity", "join"),
)
def order_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained broadcast left joins: the fact table streams through three
    dim joins with zero fact-side shuffles; missing dims leave nulls, as
    the reference's broadcast-Map misses do. customer is NOT force-
    broadcast (it scales with the fact table — billions of rows at
    100 TB); AQE still picks broadcast at test scale where it fits."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    enriched = enrich_left(
        o,
        [
            (c, "o_custkey", "c_custkey", False),
            (n, "c_nationkey", "n_nationkey"),
            (r, "n_regionkey", "r_regionkey"),
        ],
    )
    return enriched.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        "c_name",
        "c_mktsegment",
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )


# ---------------------------------------------------------------------------
# A3/W1 — per-key first-event flag + intra-batch correction
# (dwd/OrderInfoApp.scala:121-157) as a window function.
# ---------------------------------------------------------------------------
@register(
    "first_order_flag",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CASE WHEN row_number() OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ) = 1 THEN '1' ELSE '0' END AS if_first_order
    FROM orders
    """,
    tags=("parity", "window"),
)
def first_order_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's groupByKey+sortWith+demote (A3) is one window pass:
    row_number over (user, time) with a unique tiebreaker for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return first_event_flag(
        o, key="o_custkey", order_by=["o_orderdate", "o_orderkey"], flag_col="if_first_order"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "if_first_order")


# ---------------------------------------------------------------------------
# A4-b — proportional allocation with residual correction
# (dws/OrderWideApp.scala:134-178), batch window form in exact cents.
# ---------------------------------------------------------------------------
@register(
    "payment_allocation",
    oracle="""
    WITH d AS (
      SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_totalprice,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY l.l_orderkey) AS DOUBLE) AS orig_total,
             row_number() OVER (PARTITION BY l.l_orderkey
                                ORDER BY l.l_linenumber DESC,
                                         l.l_extendedprice DESC) AS rn_last
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), s AS (
      SELECT *,
             CAST(floor(o_totalprice * l_extendedprice / orig_total * 100 + 0.5) AS BIGINT) AS share_cents,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
      FROM d
    )
    SELECT l_orderkey, l_linenumber,
           CAST(CASE WHEN rn_last = 1
                THEN total_cents - (sum(share_cents) OVER (PARTITION BY l_orderkey) - share_cents)
                ELSE share_cents END AS DOUBLE) / 100.0 AS final_detail_amount
    FROM s
    """,
    tags=("parity", "window", "allocation"),
)
def payment_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate o_totalprice across the order's line items proportional to
    l_extendedprice; the last line (by l_linenumber) absorbs the rounding
    residual so Σ shares == total exactly — the invariant the reference
    maintains with Redis running sums, here from two windows over one
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice"
    )
    # The synthetic lineitem repeats (l_orderkey, l_linenumber), so the
    # "last detail" order needs l_extendedprice as a tiebreaker to be a
    # total order in both engines.
    out = allocate(
        d,
        order_key="l_orderkey",
        detail_order=["l_linenumber", "l_extendedprice"],
        amount="l_extendedprice",
        total="o_totalprice",
    )
    return out.select("l_orderkey", "l_linenumber", "final_detail_amount")


# ---------------------------------------------------------------------------
# S13 — CDC table routing as a dynamic-topic projection
# (ods/BaseDBMaxwellApp.scala:60-75 rules, mapped onto event_type).
# ---------------------------------------------------------------------------
@register(
    "cdc_route",
    oracle="""
    SELECT 'ods_' || event_type AS topic, event_id, user_id, value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
       OR (event_type IN ('click', 'view') AND value > 50)
    """,
    tags=("parity", "route"),
)
def cdc_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ODS demux: facts ('purchase','signup') pass unconditionally,
    page events pass under a predicate, 'error' drops — then a dynamic
    ``topic`` column routes each row, replacing the per-record producer
    loop with one declarative fan-out."""
    ev = load_table(spark, sf_dir, "events")
    # carry= exposes the routing decision columns rather than a serialized
    # Kafka payload (JSON formatting differs per engine) — same filter and
    # topic derivation the streaming sink path uses.
    return route_by_rules(
        ev,
        type_col="event_type",
        keep_any=("purchase", "signup"),
        keep_when=(
            ("click", F.col("value") > 50),
            ("view", F.col("value") > 50),
        ),
        carry=("event_id", "user_id", "value"),
    )


# ---------------------------------------------------------------------------
# P1 — JSON parse + projection (app/DauApp.scala:52-64).
# ---------------------------------------------------------------------------
@register(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
    FROM events
    """,
    tags=("parity", "json"),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read with an explicit path — get_json_object stays inside
    codegen; no Python parsing."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


# ---------------------------------------------------------------------------
# P2 — derived date/hour columns (app/DauApp.scala:56-62).
# ---------------------------------------------------------------------------
@register(
    "date_derive",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS dt, strftime(ts, '%H') AS hr
    FROM events
    """,
    tags=("parity", "dates"),
)
def date_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimpleDateFormat("yyyy-MM-dd HH") + split becomes two codegen'd
    date_format expressions."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", dt_of(F.col("ts")).alias("dt"), hr_of(F.col("ts")).alias("hr")
    )


# ---------------------------------------------------------------------------
# P4/P5 — CASE bucketing with CN labels (dim/UserInfoApp.scala:45-61).
# ---------------------------------------------------------------------------
@register(
    "customer_buckets",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN '负债'
                WHEN c_acctbal <= 5000 THEN '普通会员'
                ELSE '高级会员' END AS balance_tier,
           CASE WHEN c_mktsegment = 'BUILDING' THEN '建筑'
                WHEN c_mktsegment = 'AUTOMOBILE' THEN '汽车'
                ELSE '其他' END AS segment_name
    FROM customer
    """,
    tags=("parity", "case"),
)
def customer_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's age-bucket/gender-decode CASE chains
    (dim/UserInfoApp.scala:50-61) — CN label bytes preserved exactly, as
    SURVEY.md §7.4.5 requires."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "负债")
        .when(F.col("c_acctbal") <= 5000, "普通会员")
        .otherwise("高级会员")
        .alias("balance_tier"),
        F.when(F.col("c_mktsegment") == "BUILDING", "建筑")
        .when(F.col("c_mktsegment") == "AUTOMOBILE", "汽车")
        .otherwise("其他")
        .alias("segment_name"),
    )


# ---------------------------------------------------------------------------
# J5 — anti-join-as-flag / existence checks (dwd/OrderInfoApp.scala:92-117).
# ---------------------------------------------------------------------------
@register(
    "customers_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
    tags=("parity", "join"),
)
def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the reference's NOT-IN membership probe against the
    USER_STATUS state table, without the hand-built IN-list SQL.

    NAMING CAVEAT (round-6 advice): since round 6 this computes customers
    with no FULFILLED ('F') orders, not "no orders at all" — the name is
    kept because the driver's CORRECTNESS history is keyed on it; any
    external consumer expecting the pre-round-6 unrestricted anti-join
    must filter orders themselves.

    The probe is restricted to fulfilled ('F') orders: at the gate SF every
    customer has *some* order, so the unrestricted anti-join returns 0 rows
    on both engines and proves nothing (round-5 verdict).  Against the
    F-only side the result is genuinely row-bearing at every SF
    (5 / 71 / 511 rows at sf 0.001 / 0.01 / 0.1) while the plan shape — a
    pushed-down filter under a left-anti hash join — is unchanged."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, on="c_custkey", how="left_anti").select("c_custkey", "c_name")


@register(
    "customers_no_fulfilled_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
    tags=("parity", "join"),
    # Honest-name alias of customers_no_orders (round-7 verdict #8): the
    # old name stays as the driver-facing CORRECTNESS-history key; this
    # is the name new consumers should reach for. Ungated twin — same
    # plan, same oracle, checked in-suite by test_oracle_parity.
    gated=False,
)
def customers_no_fulfilled_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no fulfilled ('F') orders — the honest name for
    ``customers_no_orders`` (see its NAMING CAVEAT); identical plan."""
    return customers_no_orders(spark, sf_dir)


@register(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("parity", "join"),
    # The '1' branch of the same J5 existence probe as the gated
    # customers_no_orders; ungated (round 5) to free a gate row for the
    # corpus-quality ops.
    gated=False,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — the '1' branch of the same existence probe."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, on="c_custkey", how="left_semi").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.7 — set operations (absent in reference; free via Catalyst).
# ---------------------------------------------------------------------------
@register(
    "set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
    tags=("parity", "setop"),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/except/intersect — SURVEY.md §2.7 lists them as absent from
    the reference but part of the complete surface."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return building.union(big).distinct().exceptAll(negative.distinct()).distinct()


# ---------------------------------------------------------------------------
# O-ops + W — top-k per group (absent in reference pipelines; §2.6).
# ---------------------------------------------------------------------------
@register(
    "topk_parts_per_brand",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand AS brand, l.l_partkey,
             sum({_REV_SQL}) AS rev_dec
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_partkey
    )
    SELECT brand, l_partkey, CAST(round(rev_dec, 2) AS DOUBLE) AS revenue, rn
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY brand ORDER BY rev_dec DESC, l_partkey) AS rn
      FROM rev
    ) WHERE rn <= 3
    """,
    tags=("parity", "window", "topk"),
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand: agg → rank window → filter. The
    exact decimal sum orders the window (no fp ties), partkey breaks ties."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(scaled_dim(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_partkey")
        .agg(F.sum(_revenue_dec()).alias("rev_dec"))
    )
    w = Window.partitionBy("brand").orderBy(F.col("rev_dec").desc(), "l_partkey")
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "brand",
            "l_partkey",
            F.round("rev_dec", 2).cast("double").alias("revenue"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# J1 batch analog — join with a time window condition; late rows drop
# (dws/OrderWideApp.scala:93-111's 20s window, as an interval predicate).
# ---------------------------------------------------------------------------
@register(
    "windowed_order_join",
    oracle="""
    SELECT o.o_orderkey,
           count(l.l_linenumber) AS n_in_window,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS amount_in_window
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
    tags=("parity", "join", "interval"),
)
def windowed_order_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream join's window semantics in batch: a detail joins
    its order only inside [orderdate, orderdate+30d); later ones silently
    drop, like details beyond the reference's 20 s window. Equi-key plus
    range predicate — Catalyst plans the equi part as the join key so this
    stays a hash join, not a cartesian."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    joined = o.join(li, cond, "left")
    return joined.groupBy("o_orderkey").agg(
        F.count("l_linenumber").alias("n_in_window"),
        F.round(F.sum(money("l_extendedprice")), 2)
        .cast("double")
        .alias("amount_in_window"),
    )


# ---------------------------------------------------------------------------
# J2 — join-output dedup (dws/OrderWideApp.scala:113-131): the doubled
# input simulates the sliding window's re-emission.
# ---------------------------------------------------------------------------
@register(
    "join_dedup",
    oracle="""
    SELECT l_orderkey, count(*) AS n_details
    FROM (
      SELECT DISTINCT l_orderkey, l_linenumber FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber FROM lineitem
      )
    )
    GROUP BY l_orderkey
    """,
    tags=("parity", "dedup"),
    # round-6 rotation: the J2 dedup semantics are subsumed by the gated
    # windowed_order_join (whose oracle dedups the window re-emissions);
    # in-suite parity keeps this exact check. Slot freed for round-5 work.
    gated=False,
)
def join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference re-emits each joined pair up to 4× (sliding window
    overlap) and dedups via a Redis set with TTL; in batch it's distinct on
    the pair key. Here the union-with-self stands in for the re-emission."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    doubled = li.unionAll(li)
    return (
        doubled.distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_details"))
    )


@register(
    "shipping_priority",
    oracle=f"""
    SELECT rank, l_orderkey, revenue, o_order_us, o_orderpriority FROM (
      SELECT l.l_orderkey,
             CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
             epoch_us(o.o_orderdate) AS o_order_us,
             o.o_orderpriority,
             row_number() OVER (
               ORDER BY round(sum({_REV_SQL}), 2) DESC, l.l_orderkey
             ) AS rank
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ) WHERE rank <= 10
    """,
    tags=("parity", "join", "agg", "topk"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one market segment —
    the three-way join every order dashboard runs. Plan: both filters
    push to their scans, the segment-filtered customer side stays small
    into orders, the grouped sum partial-aggregates map-side, and
    orderBy+limit caps the global sort at 10 rows before the rank
    window touches anything."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    from pyspark.sql import Window as W

    # customer scales with sf, so no pinned hint anywhere here: AQE
    # broadcasts the segment-filtered customer side at test scale where
    # it fits, and the orders∘customer intermediate joins lineitem via
    # shuffle on the order key at 100 TB (a hint would pin a driver-OOM
    # plan at sf100)
    grouped = (
        li.join(
            o.join(scaled_dim(c), o.o_custkey == c.c_custkey),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"))
    )
    top = grouped.orderBy(F.col("revenue").desc(), "l_orderkey").limit(10)
    w = W.orderBy(F.col("revenue").desc(), "l_orderkey")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "l_orderkey",
        "revenue",
        F.unix_micros("o_orderdate").alias("o_order_us"),
        "o_orderpriority",
    )


@register(
    "returned_item_report",
    oracle=f"""
    SELECT rank, c_custkey, c_name, revenue, n_name FROM (
      SELECT c.c_custkey, c.c_name,
             CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
             n.n_name,
             row_number() OVER (
               ORDER BY round(sum({_REV_SQL}), 2) DESC, c.c_custkey
             ) AS rank
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    ) WHERE rank <= 20
    """,
    tags=("parity", "join", "agg", "topk"),
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter —
    four-way join (nation broadcast, the classic small-dim case), R-flag
    and date-range filters pushed to the scans, top-20 by returned
    revenue with deterministic ties."""
    cutlo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cuthi = F.lit("1997-04-01 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window as W

    grouped = (
        li.join(scaled_dim(o), li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"))
    )
    top = grouped.orderBy(F.col("revenue").desc(), "c_custkey").limit(20)
    w = W.orderBy(F.col("revenue").desc(), "c_custkey")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "c_custkey", "c_name", "revenue", "n_name"
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("parity", "join", "agg"),
    gated=False,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the customer and the
    line's supplier sit in the SAME nation of one region, over one order
    year — the six-way join with a cross-table predicate (c_nationkey =
    s_nationkey) that join ordering actually matters for. Plan: region→
    nation→region collapse into supplier via true-dim broadcasts (25/5
    rows at any scale); lineitem joins the supplier dim without a pinned
    hint (supplier scales with sf — AQE broadcasts at bench SF) and needs no
    shuffle, and the only real exchanges are the orderkey join against
    the date-filtered orders and the custkey join against customer —
    where the nation-equality predicate rides the join condition so
    mismatched rows die inside the join, not in a post-filter. Decimal
    revenue keeps the sum order-independent (exact), so the final
    5-row-per-region agg hash-matches the oracle."""
    cutlo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cuthi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    # dims collapse driver-free: supplier rows outside the region vanish
    # inside the broadcast build side
    sdim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    return (
        li.join(scaled_dim(sdim), li.l_suppkey == sdim.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (c.c_nationkey == sdim.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# Shared SCD2 CTE chain (gaps-and-islands over orders) — used by
# customer_status_history and the as-of composition below.
_SCD2_SEG_CTES = """s AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             CASE WHEN row_number() OVER w = 1
                       OR lag(o_orderstatus) OVER w
                          IS DISTINCT FROM o_orderstatus
                  THEN 1 ELSE 0 END AS mark
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), g AS (
      SELECT *, sum(mark) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS grp
      FROM s
    ), seg AS (
      SELECT o_custkey, o_orderstatus, grp, min(o_orderdate) AS eff_from,
             count(*) AS n_observations
      FROM g GROUP BY o_custkey, o_orderstatus, grp
    )"""


@register(
    "customer_status_history",
    oracle=f"""
    WITH {_SCD2_SEG_CTES}
    SELECT o_custkey, o_orderstatus,
           epoch_us(eff_from) AS eff_from_us,
           epoch_us(lead(eff_from) OVER w2) AS eff_to_us,
           CAST(row_number() OVER w2 AS BIGINT) AS version,
           lead(eff_from) OVER w2 IS NULL AS is_current,
           n_observations
    FROM seg
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY grp)
    """,
    tags=("parity", "scd2", "window"),
    gated=False,
)
def customer_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each customer's order status: consecutive
    same-status orders collapse into one validity interval
    [eff_from, eff_to) with a version number and is_current flag — the
    dim-with-history the reference's latest-row-only Phoenix upserts
    (SURVEY.md §2.1 S8) cannot answer. The whole timeline (change
    marks, run numbering, collapse, interval close) runs inside ONE
    o_custkey partitioning — operators/scd2.py. Timestamps exported as
    epoch-micros; eff_to_us is null on each key's current row."""
    from ..operators.scd2 import scd2_timeline

    o = load_table(spark, sf_dir, "orders")
    t = scd2_timeline(
        o, "o_custkey", "o_orderdate", ["o_orderstatus"], "o_orderkey"
    )
    return t.select(
        "o_custkey",
        "o_orderstatus",
        F.unix_micros("eff_from").alias("eff_from_us"),
        F.unix_micros("eff_to").alias("eff_to_us"),
        "version",
        "is_current",
        "n_observations",
    )


@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           epoch_us(o.o_orderdate) AS o_order_us,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tags=("parity", "join", "agg", "having"),
    gated=False,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, reported with their customer — the aggregate-then-
    semi-join pattern. The HAVING side reduces lineitem to a tiny
    qualifying set BEFORE any join (partial-aggregated groupBy on the
    join key itself, so the agg and the orders join share one
    orderkey exchange); quantities sum as doubles of integral values
    (exact well under 2^53), money stays decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros("o_orderdate").alias("o_order_us"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "order_priority_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY year(o_orderdate)
    """,
    tags=("parity", "pivot", "agg"),
    gated=False,
)
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status counts pivoted to columns per order year — the reshape
    every BI layer runs. Uses Spark's native pivot WITH an explicit
    value list: an unlisted pivot triggers a separate distinct-values
    job (a full extra scan) and makes the output schema data-dependent
    — both wrong at 100 TB. Explicit values keep it one scan, one
    partial-aggregated exchange, fixed schema."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "order_year",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )


@register(
    "orders_with_status_asof",
    oracle=f"""
    WITH {_SCD2_SEG_CTES}, dim AS (
      SELECT o_custkey, o_orderstatus AS dim_status, eff_from,
             lead(eff_from) OVER w2 AS eff_to,
             CAST(row_number() OVER w2 AS BIGINT) AS version
      FROM seg
      WINDOW w2 AS (PARTITION BY o_custkey ORDER BY grp)
    )
    SELECT o.o_orderkey, o.o_custkey,
           epoch_us(o.o_orderdate) AS order_us,
           d.dim_status, d.version
    FROM orders o
    LEFT JOIN dim d
      ON d.o_custkey = o.o_custkey
     AND d.eff_from <= o.o_orderdate
     AND (d.eff_to IS NULL OR o.o_orderdate < d.eff_to)
    """,
    tags=("parity", "scd2", "asof", "join"),
    gated=False,
)
def orders_with_status_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every order joined to the SCD2 status version VALID AT its own
    date (operators/scd2.py asof_dim_lookup over the
    customer_status_history dim) — the fact-to-versioned-dim temporal
    join a latest-row dim gets silently wrong for backfills. Key
    equality rides the join (hash join, never a nested loop); the
    interval predicate filters inside it; non-overlapping versions make
    the left join 1:1."""
    from ..operators.scd2 import asof_dim_lookup, scd2_timeline

    o = load_table(spark, sf_dir, "orders")
    dim = scd2_timeline(
        o, "o_custkey", "o_orderdate", ["o_orderstatus"], "o_orderkey"
    ).select(
        "o_custkey",
        F.col("o_orderstatus").alias("dim_status"),
        "eff_from",
        "eff_to",
        "version",
    )
    facts = o.select("o_orderkey", "o_custkey", F.col("o_orderdate").alias("fts"))
    hit = asof_dim_lookup(facts, dim, "o_custkey", "fts")
    return hit.select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros("fts").alias("order_us"),
        "dim_status",
        "version",
    )

@register(
    "dim_snapshot_diff",
    oracle=f"""
    WITH {_SCD2_SEG_CTES}, hist AS (
      SELECT o_custkey, o_orderstatus, eff_from,
             lead(eff_from) OVER (
               PARTITION BY o_custkey ORDER BY grp) AS eff_to
      FROM seg
    ), s1 AS (
      SELECT o_custkey, o_orderstatus AS status_t1 FROM hist
      WHERE eff_from <= TIMESTAMP '1997-01-01'
        AND (eff_to IS NULL OR eff_to > TIMESTAMP '1997-01-01')
    ), s2 AS (
      SELECT o_custkey, o_orderstatus AS status_t2 FROM hist
      WHERE eff_from <= TIMESTAMP '2000-01-01'
        AND (eff_to IS NULL OR eff_to > TIMESTAMP '2000-01-01')
    )
    SELECT COALESCE(s1.o_custkey, s2.o_custkey) AS o_custkey,
           status_t1, status_t2,
           CASE WHEN status_t1 IS NULL THEN 'added'
                WHEN status_t2 IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM s1 FULL OUTER JOIN s2 ON s1.o_custkey = s2.o_custkey
    WHERE status_t1 IS DISTINCT FROM status_t2
    """,
    tags=("parity", "scd2", "diff"),
    gated=False,
)
def dim_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DIFF of a dimension between two as-of instants, answered
    from the SCD2 timeline instead of two table scans: state at
    1997-01-01 vs 2000-01-01, emitting added / removed / changed keys —
    the reconciliation query behind CDC backfills and dim-table audits.
    The timeline (one o_custkey-partitioned window chain) is computed
    once and persisted; each snapshot is a validity-interval filter of
    that dim-scale frame, and the diff is one self-join on the key. At
    100 TB the SCD2 history IS the stored table (customer_status_history
    materializes it), so a snapshot-diff never rescans facts."""
    from ..operators.scd2 import scd2_timeline

    o = load_table(spark, sf_dir, "orders")
    t = scd2_timeline(
        o, "o_custkey", "o_orderdate", ["o_orderstatus"], "o_orderkey"
    ).persist()
    t.count()  # materialize BEFORE the two-consumer self-join fan-out

    def snap(ts: str, alias: str) -> DataFrame:
        return t.filter(
            (F.col("eff_from") <= F.lit(ts).cast("timestamp"))
            & (
                F.col("eff_to").isNull()
                | (F.col("eff_to") > F.lit(ts).cast("timestamp"))
            )
        ).select(F.col("o_custkey").alias(f"_k_{alias}"),
                 F.col("o_orderstatus").alias(f"status_{alias}"))

    s1, s2 = snap("1997-01-01", "t1"), snap("2000-01-01", "t2")
    j = s1.join(s2, s1["_k_t1"] == s2["_k_t2"], "full_outer")
    out = (
        j.where(
            ~F.col("status_t1").eqNullSafe(F.col("status_t2"))
        )
        .select(
            F.coalesce("_k_t1", "_k_t2").alias("o_custkey"),
            "status_t1",
            "status_t2",
            F.when(F.col("status_t1").isNull(), "added")
            .when(F.col("status_t2").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
        )
    )
    rows = out.collect()  # dim-bounded diff; frees the timeline cache
    t.unpersist()
    return spark.createDataFrame(rows, schema=out.schema)

@register(
    "cdc_refresh_totals",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) >= '10'
    GROUP BY o_orderstatus
    """,
    tags=("parity", "cdc", "refresh"),
    gated=False,
)
def cdc_refresh_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-style refresh (RF1 inserts + RF2 deletes) driven through
    the PHYSICAL CDC apply path: the orders table splits by md5 bucket
    into a stored base (h < 'e0'), an insert batch (h >= 'e0') and a
    delete batch (h < '10'); the batches apply via
    ``sinks.batch.apply_cdc_parquet`` (last-op-wins, delete removes,
    two-rename crash-safe swap) against a /tmp mirror, and the query
    aggregates the POST-REFRESH table read back from disk. The oracle
    states the final set declaratively (h >= '10') — a value-hash match
    proves the imperative apply (write, merge window, delete filter,
    swap, re-read) reproduces the declarative truth exactly. Mirror
    rebuilt per run: the measured number IS the refresh cost."""
    import os as _os
    import shutil as _shutil
    import tempfile

    from ..sinks.batch import apply_cdc_parquet

    o = load_table(spark, sf_dir, "orders")
    h = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    dim_dir = _os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_cdcref_{_os.path.basename(sf_dir.rstrip('/'))}_"
        f"{_os.getpid()}",
    )
    _shutil.rmtree(dim_dir, ignore_errors=True)
    o.filter(h < "e0").write.mode("overwrite").parquet(dim_dir)
    changes = o.filter(h >= "e0").withColumn(
        "op", F.lit("insert")
    ).unionByName(
        o.filter(h < "10").withColumn("op", F.lit("delete"))
    )
    apply_cdc_parquet(
        spark, changes, dim_dir, ["o_orderkey"], op_col="op"
    )
    refreshed = spark.read.parquet(dim_dir)
    out = refreshed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("total_cents"),
    )
    rows = out.collect()  # |statuses| rows; lets the /tmp mirror go away
    _shutil.rmtree(dim_dir, ignore_errors=True)
    return spark.createDataFrame(rows, schema=out.schema)
