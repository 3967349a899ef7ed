"""J-family: joins (SURVEY.md §2.3 J1-J7).

The reference has no joins; these give the record stream its dimension
context (star schema, FIXTURES.md §A). Scale posture per join:

- Fact-fact equi joins (J1) shuffle on the key → sort-merge; AQE converts
  to broadcast when a side is small at runtime.
- Dimension joins (J2) are explicitly ``broadcast()``-hinted: region(5) /
  nation(25) / customer must NEVER cause a 100 TB fact shuffle.
- The as-of join (J6) is the union+window formulation: ONE shuffle on the
  series key, no range-explosion, no per-row subquery — this is the shape
  that survives 1000 executors (a naive join+max-subquery is quadratic in
  samples per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Generic backward as-of join (pandas ``merge_asof`` semantics): for
    each left row, carry the payload of the LATEST right row with
    ``right_ts <= left_ts`` within the same ``on`` key (NULLs when no
    right row precedes). Ties at equal timestamps take the right row
    (at-or-before), matching DuckDB ``ASOF JOIN``.

    Union+window formulation (the j6 shape, SURVEY.md §2.3 J6): tag both
    sides, union on (key, ts, side) and run ``last(payload,
    ignorenulls)`` over a key-partitioned window ordered (ts, side) with
    right rows sorting first at equal ts. ONE shuffle on the key, linear
    in rows — no range explosion, no per-row subquery; the shape that
    survives 1000 executors. Right (key, ts) pairs should be unique
    (pre-aggregate otherwise) so latest-wins tie-breaking is
    deterministic.

    Mixed timestamp types: both sides are cast to their common WIDER type
    within a VALUE-PRESERVING ladder (date+timestamp → timestamp,
    byte<short<int<long; float<double) before comparing — never a lossy
    cast. (Through r4 the LEFT key was silently cast to the RIGHT key's
    type; for j6's timestamp→date that was provably equivalent to
    midnight coercion, but as a reusable helper it would truncate a finer
    left key against any coarser right key — the r4-ADVICE trap.)
    Integer-vs-float pairs raise rather than cast: long→double loses
    integer values above 2^53 (and int→float above 2^24), which can flip
    an as-of comparison at the boundary — pre-cast explicitly at the call
    site if that loss is acceptable. Pairs outside one ladder raise too.

    Output: every left column, plus ``payload`` columns from the right.
    Left/payload names must be disjoint."""
    from pyspark.sql import types as T

    lt, rt = left.schema[left_ts].dataType, right.schema[right_ts].dataType
    if lt == rt:
        common = lt
    else:
        _temporal = {T.DateType: 0, T.TimestampNTZType: 1, T.TimestampType: 1}
        # integers and floats are SEPARATE ladders: casting long→double
        # (or int→float) is value-lossy past 2^53 (2^24) — an as-of match
        # could flip exactly at the boundary, so such pairs must raise
        _ints = {T.ByteType: 0, T.ShortType: 1, T.IntegerType: 2, T.LongType: 3}
        _floats = {T.FloatType: 0, T.DoubleType: 1}
        for ladder in (_temporal, _ints, _floats):
            if type(lt) in ladder and type(rt) in ladder:
                common = lt if ladder[type(lt)] >= ladder[type(rt)] else rt
                break
        else:
            raise TypeError(
                f"asof_join: no common wider type for {left_ts}:{lt} vs "
                f"{right_ts}:{rt}; pre-cast both sides to the same type"
            )
    left_cols = [c for c in left.columns if c != on]
    r = right.select(
        F.col(on),
        F.col(right_ts).cast(common).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in payload],
    )
    l = left.select(  # noqa: E741
        F.col(on),
        F.col(left_ts).cast(common).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).select(
        on,
        "_asof_side",
        *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return merged.filter(F.col("_asof_side") == 1).drop("_asof_side")


@register(
    "j1_order_revenue",
    family="J1",
    bench=True,
    oracle="""
        SELECT o.o_orderstatus,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
    """,
)
def j1_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "j2_customer_region",
    family="J2",
    oracle="""
        SELECT r.r_name,
               count(*) AS n_customers,
               round(sum(c.c_acctbal), 2) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
)
def j2_customer_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dimension chain with explicit broadcast hints: at 100 TB
    the fact side streams map-side past the 5-row/25-row dims — no shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "j3_customer_order_profile",
    family="J3",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment,
               count(o.o_orderkey)                    AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def j3_customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "j4_semi_active_customers",
    family="J4",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def j4_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS; ships only the probe side's columns."""
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "j4b_anti_dormant_customers",
    family="J4",
    oracle="""
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= DATE '2000-01-01')
    """,
)
def j4b_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS: customers with no order since 2000.
    Dormancy is date-banded (the sql19 convention) because every customer
    in this corpus has early orders — the no-order-ever form matched 1/0
    customers at sf0.1/sf0.01 and the oracle check was (near-)vacuous
    (r5 vacuity audit); since-2000 selects ~135/~1355 customers."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    return customer.join(
        recent, customer.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_acctbal")


@register(
    "j5_shipments_in_band",
    family="J5",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS n_lineitems
        FROM lineitem l
        JOIN orders o
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
        GROUP BY o.o_orderpriority
    """,
)
def j5_shipments_in_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (theta) join: equi key + date-range predicate. Catalyst keeps
    the equi part as the shuffle key and evaluates the range residually —
    the scalable shape (a pure range join would be a cross product)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
    )


@register(
    "j6_asof_last_order",
    family="J6",
    bench=True,
    oracle="""
        WITH day_orders AS (
            SELECT o_custkey, o_orderdate AS order_ts,
                   round(sum(o_totalprice), 2) AS day_total
            FROM orders GROUP BY o_custkey, o_orderdate
        )
        SELECT e.event_id, e.user_id,
               o.order_ts  AS last_order_ts,
               o.day_total AS last_order_total
        FROM events e
        ASOF LEFT JOIN day_orders o
          ON e.user_id = o.o_custkey AND o.order_ts <= e.ts
    """,
)
def j6_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order-day at-or-before ts
    (Prometheus lookback semantics over the ms-timestamp record model,
    record.go:10). Union+window formulation (SURVEY.md §2.3 J6):

    tag both sides, union on (key, ts), then ``last(..., ignorenulls)``
    over a (key)-partitioned window ordered by (ts, side) — orders sort
    before events at equal ts, giving the at-or-before (<=) semantic with
    latest-wins tie-breaking, matching DuckDB ASOF JOIN. One shuffle total,
    linear in rows — scale-safe where a per-event subquery is not.

    r13 (guide §2.1 — remove the shuffle outright): the day-level
    pre-aggregation used to be its own groupBy — a full shuffle of
    orders + two HashAggregates BEFORE the union. The day total now
    rides each RAW order row through the one as-of exchange as an
    equal-key-peer RANGE window sum: both windows order by the single
    monotone key ``unix_millis(ts)·2 + side`` (the same total order as
    (ts, side) — orders sort first at equal ts), so the RANGE
    current-row frame's peers on an order row are EXACTLY its same-day
    orders (events at the equal key differ in side), and one sort feeds
    both Window nodes. Plan: 2 exchanges + 2 HashAggregates + 1 Window
    → 1 exchange + 0 aggregates + 2 Windows off one sort; measured
    −24.6% fresh at sf0.1 (0.448 → 0.338 interleaved medians).

    Determinism/hash-safety: all same-day order rows carry the IDENTICAL
    payload (same date, same windowed day total), so latest-wins
    tie-breaking among them cannot diverge; round(sum, 2) over the same
    per-day multiset in frame order instead of hash-aggregate order is
    covered by the 2-decimal quantization argument (t5); event rows
    carry NULL price/payload and are invisible to both the sum and
    last(ignorenulls). Verified row-bit-equal against the previous form
    at sf0.001/0.01/0.1 before the swap, oracle-green after. (The
    generic union+window core remains the reusable ``asof_join`` helper
    above, property-tested in tests/test_stateful_props.py; j6 inlines
    the mechanism to fuse the day aggregation into the window pass.)
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    r = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("last_order_ts"),
        F.col("o_totalprice").alias("_price"),
    )
    l = events.select(  # noqa: E741
        F.col("user_id"),
        F.col("ts").cast("timestamp").alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.col("event_id"),
        F.lit(None).cast("date").alias("last_order_ts"),
        F.lit(None).cast("double").alias("_price"),
    )
    w_day = (
        Window.partitionBy("user_id")
        .orderBy("_k")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    day_total = F.when(
        F.col("_asof_side") == 0, F.round(F.sum("_price").over(w_day), 2)
    )
    merged = (
        r.unionByName(l)
        .select(
            "user_id",
            "_asof_side",
            "event_id",
            (F.unix_millis("_asof_ts") * 2 + F.col("_asof_side")).alias("_k"),
            F.col("last_order_ts").alias("_lot"),
            "_price",
        )
        .select(
            "user_id", "_asof_side", "event_id", "_k",
            F.col("_lot"),
            day_total.alias("_dt"),
        )
        .select(
            "user_id",
            "_asof_side",
            "event_id",
            F.last("_lot", ignorenulls=True).over(w).alias("last_order_ts"),
            F.last("_dt", ignorenulls=True).over(w).alias("last_order_total"),
        )
    )
    return merged.filter(F.col("_asof_side") == 1).select(
        "event_id", "user_id", "last_order_ts", "last_order_total"
    )


@register(
    "j7_nation_region_cross",
    family="J7",
    oracle="SELECT n.n_name, r.r_name FROM nation n CROSS JOIN region r",
)
def j7_nation_region_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (25×5) — legitimate only for tiny dims; broadcasted."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.crossJoin(F.broadcast(region)).select("n_name", "r_name")


@register(
    "j5b_bucketed_range_join",
    family="J5",
    oracle="""
        -- abs() rewritten as two one-sided inequalities so DuckDB plans
        -- its sort-based IEJoin instead of a nested loop (135 s -> 0.2 s
        -- at sf0.1) -- a different algorithm from our bucketed equi-join,
        -- so the cross-check stays independent.
        WITH ev AS (
            SELECT event_id, event_type, epoch_us(ts) // 1000 AS t
            FROM events
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_pairs
        FROM ev a
        JOIN ev b
          ON a.event_id < b.event_id
         AND a.t <= b.t + 60000
         AND b.t <= a.t + 60000
        GROUP BY 1, 2
    """,
)
def j5b_bucketed_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key): pairs of events within ±60 s of each
    other, counted per type pair.

    Naively this is a non-equi self-join — Catalyst can only plan it as a
    nested-loop/cartesian product, O(N²) and a non-starter at scale. The
    bucketing rewrite makes it an equi-join: quantize time into
    window-sized buckets, expand ONE side to its 3 neighboring buckets,
    join on bucket equality, then apply the exact predicate residually.
    Each qualifying pair meets exactly once (the unexpanded side's bucket
    is a single value), so no dedup pass is needed. Cost: a 3× fan-out of
    one side and a shuffle on bucket keys — linear, AQE-splittable, and
    the same shape works for any interval/proximity join at 100 TB.
    """
    B = 60_000  # bucket width == proximity window, ms
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_millis("ts").alias("t")
    )
    a = ev.select(
        F.col("event_id").alias("id_a"),
        F.col("event_type").alias("type_a"),
        F.col("t").alias("ta"),
        (F.col("t") / B).cast("long").alias("bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("event_type").alias("type_b"),
        F.col("t").alias("tb"),
        F.explode(
            F.array(
                (F.col("t") / B).cast("long") - 1,
                (F.col("t") / B).cast("long"),
                (F.col("t") / B).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter((F.col("id_a") < F.col("id_b")) & (F.abs(F.col("ta") - F.col("tb")) <= B))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# j8: bloom geometry. m=2048 bits (64 words x 32 bits — bit 63 never
# used, so 1<<bit stays positive BIGINT on both engines), k=4 probes via
# md5 double hashing. At sf0.01 the 302 BUILDING keys set ~44% of the
# bits -> ~4% false-positive rate: the lossy branch is exercised while
# the zero-false-NEGATIVE guarantee stays structural. Production sizes m
# to the key count; the mechanism is m-agnostic.
BLOOM_M = 2048
BLOOM_K = 4
BLOOM_WORD = 32

_J8_POS = (
    "pmod(h1 + {i} * (2 * h2 + 1), " + str(BLOOM_M) + ")"
)  # double hashing: pos_i = (h1 + i*(2h2+1)) mod m, h2 forced odd

_J8_ORACLE = f"""
    WITH bk AS (
        SELECT c_custkey,
               CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h1,
               CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 9, 8))
                    AS BIGINT) AS h2
        FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bpos AS (
        SELECT ((h1 + s.i * (2 * h2 + 1)) % {BLOOM_M}) AS pos
        FROM bk, LATERAL unnest(range(0, {BLOOM_K})) AS s(i)
    ),
    words AS (
        SELECT CAST(pos // {BLOOM_WORD} AS BIGINT) AS w,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD} AS INT))
                   AS mask
        FROM bpos GROUP BY 1
    ),
    op AS (
        SELECT o_orderkey, o_custkey,
               ((h1 + s.i * (2 * h2 + 1)) % {BLOOM_M}) AS pos
        FROM (
            SELECT o_orderkey, o_custkey,
                   CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
                                           1, 8)) AS BIGINT) AS h1,
                   CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
                                           9, 8)) AS BIGINT) AS h2
            FROM orders
        ), LATERAL unnest(range(0, {BLOOM_K})) AS s(i)
    ),
    overdict AS (
        SELECT o_orderkey, any_value(o_custkey) AS ck,
               (sum(CASE WHEN (w.mask & (CAST(1 AS BIGINT)
                                << CAST(op.pos % {BLOOM_WORD} AS INT))) <> 0
                         THEN 1 ELSE 0 END) = {BLOOM_K}) AS hit
        FROM op LEFT JOIN words w ON w.w = op.pos // {BLOOM_WORD}
        GROUP BY o_orderkey
    ),
    flagged AS (
        SELECT v.hit,
               (v.ck IN (SELECT c_custkey FROM bk)) AS exact
        FROM overdict v
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
           CAST(sum(CASE WHEN hit AND exact THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_hits,
           CAST(sum(CASE WHEN hit AND NOT exact THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_positives,
           CAST(sum(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           (SELECT CAST(sum(bit_count(mask)) AS BIGINT) FROM words)
               AS n_bits_set
    FROM flagged
"""


@register("j8_bloom_semi_prefilter", family="J4", oracle=_J8_ORACLE)
def j8_bloom_semi_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter — the 100 TB shape where the
    fact side is NOT shuffled and NOT joined to test membership: the dim
    key set (BUILDING customers) compresses into an m={BLOOM_M}-bit
    filter (64 BIGINT words), the filter broadcasts as a LITERAL map
    folded into the fact scan's projection, and only bloom-hit rows
    would proceed to the real join — this is what engines' runtime
    bloom-pushdown does, here as an explicit, ORACLE-CHECKED operator
    (md5 double hashing pos_i = (h1 + i·(2h2+1)) mod m makes every bit
    engine-deterministic; HLL-style private layouts are why a3/a3b are
    rows-only, md5 is why this is not). The output hash covers the
    filter content bit-exactly (n_bits_set = Σ bit_count(word)) plus the
    confusion-matrix counts against the exact semi-join: every true
    member hits (n_true_hits == n_exact — the zero-false-negative
    guarantee, structural to bloom), and n_false_positives counts the
    lossy branch (~4% of non-members at sf0.01; the filter saturates at
    sf0.1's 3k keys — still hash-correct, production just sizes m up).

    Scale shape: the build side aggregates dim-key probe positions to 64
    (word, mask) rows via map-side-combined bit_or — bounded collect,
    the l4h/l4f codebook pattern — and the probe side is a PURE
    PROJECTION over the fact scan (no shuffle, no join, stays inside
    WholeStageCodegen); the exact-flag comparison join exists only to
    measure the filter and broadcasts the small dim. The final ungrouped
    agg moves six integers per partition."""
    cust = load_table(spark, sf_dir, "customer")
    bk = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    def hashed(df: DataFrame, key: str) -> DataFrame:
        md5 = F.md5(F.col(key).cast("string"))
        return df.withColumn(
            "h1", F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
        ).withColumn("h2", F.conv(F.substring(md5, 9, 8), 16, 10).cast("long"))

    bpos = (
        hashed(bk, "c_custkey")
        .select(
            F.explode(
                F.array(
                    *[
                        F.expr(_J8_POS.format(i=i)).alias(f"p{i}")
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
    )
    words = (
        bpos.groupBy(F.expr(f"pos DIV {BLOOM_WORD}").alias("w"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(pos, {BLOOM_WORD}) AS INT)))"
            ).alias("mask")
        )
        .collect()  # <= 64 (word, mask) rows — bounded by m, never by keys
    )
    masks = {int(r.w): int(r.mask) for r in words}
    n_bits_set = sum(bin(m & 0xFFFFFFFFFFFFFFFF).count("1") for m in masks.values())
    mask_map = (
        F.create_map(*[F.lit(x) for pair in masks.items() for x in pair])
        if masks
        else F.lit(None).cast("map<bigint,bigint>")
    )

    orders = hashed(load_table(spark, sf_dir, "orders"), "o_custkey")
    hit = F.lit(True)
    for i in range(BLOOM_K):
        pos = F.expr(_J8_POS.format(i=i))
        probe_mask = F.coalesce(
            F.element_at(mask_map, F.expr(f"CAST(({_J8_POS.format(i=i)}) "
                                          f"DIV {BLOOM_WORD} AS BIGINT)")),
            F.lit(0).cast("bigint"),
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod({_J8_POS.format(i=i)}, {BLOOM_WORD}) AS INT))"
        )
        hit = hit & (probe_mask.bitwiseAND(bit) != 0)

    exact_marker = bk.select(
        F.col("c_custkey").alias("o_custkey"), F.lit(True).alias("exact_m")
    )
    flagged = orders.join(F.broadcast(exact_marker), "o_custkey", "left").select(
        hit.alias("hit"), F.coalesce("exact_m", F.lit(False)).alias("exact")
    )
    b2l = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    return flagged.agg(
        F.count(F.lit(1)).alias("n_orders"),
        b2l(F.col("hit")).alias("n_bloom_hits"),
        b2l(F.col("hit") & F.col("exact")).alias("n_true_hits"),
        b2l(F.col("hit") & ~F.col("exact")).alias("n_false_positives"),
        b2l(F.col("exact")).alias("n_exact"),
        F.lit(n_bits_set).cast("bigint").alias("n_bits_set"),
    )


J9_TOP_K = 20  # pairs reported

_J9_ORACLE = f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    pairs AS (
        SELECT a.pk AS p1, b.pk AS p2
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
    ),
    sup AS (
        SELECT p1, p2, CAST(count(*) AS BIGINT) AS support
        FROM pairs GROUP BY 1, 2
    ),
    top AS (
        SELECT * FROM sup ORDER BY support DESC, p1, p2 LIMIT {J9_TOP_K}
    ),
    freq AS (
        SELECT pk, CAST(count(*) AS BIGINT) AS nf FROM li GROUP BY 1
    )
    SELECT CAST(t.p1 AS BIGINT) AS p1, CAST(t.p2 AS BIGINT) AS p2,
           t.support, f1.nf AS n1, f2.nf AS n2,
           CAST(floor(CAST(t.support AS DOUBLE)
                      / (f1.nf + f2.nf - t.support) * 1e6) AS BIGINT)
               AS jacc_micro
    FROM top t
    JOIN freq f1 ON t.p1 = f1.pk
    JOIN freq f2 ON t.p2 = f2.pk
    ORDER BY support DESC, p1, p2
"""


@register("j9_item_affinity", family="J1", oracle=_J9_ORACLE)
def j9_item_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket item affinity — the co-occurrence self-join behind
    'frequently bought together' and feature-co-occurrence mining: for
    every pair of parts appearing in the same order, count supporting
    orders and report the top-{J9_TOP_K} pairs with their Jaccard
    affinity support / (n1 + n2 - support). New mechanism for the J
    family: pair GENERATION whose blowup is bounded by group size, not
    data size (g2 bounds wedges by degree ordering; here the group is
    an order, k ≤ 7 line items in TPC-H, so ≤ k(k-1)/2 = 21 pairs per
    order regardless of total volume).

    Scale shape: (orderkey, partkey) dedupes first — partial (map-side)
    distinct collapses duplicates before the exchange — then the
    self-join keys on l_orderkey (cardinality GROWS with data, so no
    skew ceiling; both sides share the distinct's partitioning) and
    p1 < p2 canonicalizes each pair once. The obvious 'fusion' — one
    groupBy(order).collect_set + map-side pair explosion from the
    sorted array — was MEASURED SLOWER head-to-head on identical 64×
    data (54.4 s vs 37.2 s warm: collect_set shuffles every raw row
    un-combined and the nested-transform explode runs as a generator
    outside codegen, while sort-merge self-join + partial distinct stay
    whole-stage); the join shape is kept deliberately. Support is one
    map-side-combinable hash agg on (p1, p2); the global top-k is
    TakeOrderedAndProject with the (support DESC, p1, p2) tie-break
    (LIMIT determinism rule); and the Jaccard normalization joins part
    frequencies ONLY onto the {J9_TOP_K} survivors — the k-row side is
    explicitly broadcast, so the |parts|-cardinality frequency agg
    never shuffles against the pair set. Integer support/frequency
    counts; the single support/(n1+n2-support) quotient is one IEEE
    division of exact integers (identical on both engines),
    floor-truncated at 1e-6 (the f8 tie-free rule)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
    ).select(F.col("a.pk").alias("p1"), F.col("b.pk").alias("p2"))
    sup = pairs.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).cast("bigint").alias("support")
    )
    top = sup.orderBy(F.desc("support"), "p1", "p2").limit(J9_TOP_K)
    freq = li.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("nf"))
    f1 = freq.select(F.col("pk").alias("p1"), F.col("nf").alias("n1"))
    f2 = freq.select(F.col("pk").alias("p2"), F.col("nf").alias("n2"))
    out = (
        f2.join(F.broadcast(f1.join(F.broadcast(top), "p1")), "p2")
        .select(
            F.col("p1").cast("bigint").alias("p1"),
            F.col("p2").cast("bigint").alias("p2"),
            "support",
            "n1",
            "n2",
            F.floor(
                F.col("support").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("support"))
                * 1e6
            )
            .cast("bigint")
            .alias("jacc_micro"),
        )
    )
    return out.orderBy(F.desc("support"), "p1", "p2")


J10_GAP_MS = 1_800_000  # session inactivity gap (30 min, t7's convention)
J10_BUCKET_MS = 3_600_000  # overlap-join expansion bucket (1 h)

_J10_ORACLE = f"""
    WITH f AS (
        SELECT user_id, epoch_us(ts) // 1000 AS ms, event_id
        FROM events WHERE user_id IS NOT NULL
    ),
    flagged AS (
        SELECT *, CASE WHEN lag(ms) OVER w IS NULL
                            OR ms - lag(ms) OVER w > {J10_GAP_MS}
                       THEN 1 ELSE 0 END AS new_s
        FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
    ),
    sess AS (
        SELECT user_id, sid, min(ms) AS ss, max(ms) AS se
        FROM (SELECT *, sum(new_s) OVER (
                  PARTITION BY user_id ORDER BY ms, event_id) AS sid
              FROM flagged)
        GROUP BY 1, 2
    ),
    d AS (
        SELECT event_type, epoch_us(ts) // 1000 AS ms, event_id,
               (value > 50) AS cond
        FROM events WHERE value IS NOT NULL
    ),
    m AS (
        SELECT *, CASE WHEN cond AND NOT coalesce(lag(cond) OVER w, FALSE)
                       THEN 1 ELSE 0 END AS new_island
        FROM d WINDOW w AS (PARTITION BY event_type ORDER BY ms, event_id)
    ),
    isl AS (
        SELECT event_type, min(ms) AS i_s, max(ms) AS i_e
        FROM (SELECT *, sum(new_island) OVER (
                  PARTITION BY event_type ORDER BY ms, event_id) AS iid
              FROM m)
        WHERE cond
        GROUP BY event_type, iid
        HAVING max(ms) - min(ms) >= 600000
    ),
    pairs AS (
        SELECT i.event_type,
               least(s.se, i.i_e) - greatest(s.ss, i.i_s) AS ov
        FROM sess s JOIN isl i ON s.ss <= i.i_e AND i.i_s <= s.se
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(ov) AS BIGINT) AS total_overlap_ms,
           CAST(max(ov) AS BIGINT) AS max_overlap_ms
    FROM pairs GROUP BY 1
"""


@register("j10_interval_overlap_join", family="J5", oracle=_J10_ORACLE)
def j10_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL × INTERVAL overlap join — which user sessions ran while
    an alert was breaching (incident blast-radius accounting: per alert
    key, how many sessions overlapped a FIRED breach island and for how
    long). A different join class from everything in the family: j1/j4
    join points to points, j5/j5b a point into a range; here BOTH sides
    are intervals and the predicate is Allen overlap
    (s.start ≤ i.end AND i.start ≤ s.end), which no equi-key expresses
    directly.

    Scale shape — BUCKET-EXPANSION join (the standard distributed
    interval-overlap rewrite): each interval explodes to the 1 h buckets
    it covers (fan-out = ⌈span/1 h⌉, bounded by interval length, never
    data size), the join runs as an EQUI join on the bucket key —
    cardinality grows with retention, co-partitioning both sides — with
    the exact overlap predicate as a residual filter, and multi-bucket
    double-matches collapse in one distinct keyed by the pair identity
    (user, ss, type, i_s). Left side: t7-convention 30 min-gap sessions
    (w5 islands machinery on the high-cardinality user key). Right
    side: REUSES t39's banded breach islands (fired only), so the
    low-cardinality alert key never sees an unbanded window here
    either. All-integer output (counts + overlap milliseconds); closed
    intervals, point-touch counts as a 0 ms overlap; NULL users excluded
    from sessions, NULL values from breaches (staleness rule)."""
    from prometheus_remote_kinesis_spark.operators.time_windows import (
        t39_alert_for_duration,
    )

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    f = ev.select(
        "user_id", F.unix_millis("ts").alias("ms"), "event_id"
    )
    wu = Window.partitionBy("user_id").orderBy("ms", "event_id")
    sess = (
        f.withColumn(
            "new_s",
            F.when(
                F.lag("ms").over(wu).isNull()
                | (F.col("ms") - F.lag("ms").over(wu) > J10_GAP_MS),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("sid", F.sum("new_s").over(wu))
        .groupBy("user_id", "sid")
        .agg(F.min("ms").alias("ss"), F.max("ms").alias("se"))
    )
    isl = (
        t39_alert_for_duration(spark, sf_dir)
        .where("fired")
        .select("event_type", F.col("island_start").alias("i_s"),
                F.col("island_end").alias("i_e"))
    )
    b = f"div {J10_BUCKET_MS}"
    s_exp = sess.withColumn(
        "bucket", F.explode(F.expr(f"sequence(ss {b}, se {b})"))
    )
    i_exp = isl.withColumn(
        "bucket", F.explode(F.expr(f"sequence(i_s {b}, i_e {b})"))
    )
    pairs = (
        s_exp.join(i_exp, "bucket")
        .where((F.col("ss") <= F.col("i_e")) & (F.col("i_s") <= F.col("se")))
        .select(
            "event_type",
            "user_id",
            "ss",
            "i_s",
            (
                F.least("se", "i_e") - F.greatest("ss", "i_s")
            ).alias("ov"),
        )
        .distinct()
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
        F.sum("ov").cast("bigint").alias("total_overlap_ms"),
        F.max("ov").cast("bigint").alias("max_overlap_ms"),
    )
