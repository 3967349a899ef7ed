"""P-family: filters / projections (SURVEY.md §2.2 P6-P7).

The reference's only "predicates" are implicit (metric-name partition keys,
kinesis.go:174); PromQL-style label selection over the record model maps to
plain Catalyst filters. Everything here is pushdown-friendly: filters and
column selection reach the parquet scan (verify via ``PushedFilters`` /
``ReadSchema`` in ``.explain("formatted")``) — at 100 TB that is the
difference between scanning 2 columns of a pruned partition set and
scanning the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


@register(
    "p6_label_filter",
    family="P6",
    oracle="""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_type = 'error'
          AND CAST(json_extract_string(props, '$.k') AS BIGINT) BETWEEN 50 AND 80
          AND value > 0
    """,
)
def p6_label_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style selector {__name__="error", k~(50..80)} over events.

    Mirrors label-matcher selection on the record model (record.go:12-14);
    the JSON ``props`` column stands in for the dynamic label map.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(
            (F.col("event_type") == "error")
            & F.get_json_object("props", "$.k").cast("long").between(50, 80)
            & (F.col("value") > 0)
        ).select("event_id", "user_id", "event_type", "value")
    )


@register(
    "p7_projection_pruning",
    family="P7",
    oracle="""
        SELECT l_orderkey, l_partkey, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.04
    """,
)
def p7_projection_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection: the scan should read 5 columns, not 11."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & F.col("l_discount").between(0.02, 0.04)
    ).select("l_orderkey", "l_partkey", "l_extendedprice")


_Q3_SQL = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1997-01-01'
      AND l_shipdate  > DATE '1997-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register("sql1_shipping_priority", family="SQL", oracle=_Q3_SQL)
def sql1_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: the same ANSI text runs on Spark SQL (over
    registered table views) and on DuckDB as the oracle — one string, two
    engines, hash-equal results. TPC-H Q3 shape (shipping priority)
    adapted to the driver's column set: three-way join, selective filters
    on both fact sides, top-10 by aggregated revenue.

    Catalyst treats the SQL and DataFrame forms identically (same logical
    plan), so every plan property pinned elsewhere (broadcast dims,
    pushdown, TakeOrderedAndProject) holds here too."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


_SQL2_SCALAR_SUBQUERY = """
    SELECT event_type,
           count(*)             AS n_above,
           round(sum(value), 2) AS sum_above
    FROM events
    WHERE value > (SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          / count(*)
                   FROM events)
    GROUP BY event_type
"""


@register("sql2_scalar_subquery", family="SQL", oracle=_SQL2_SCALAR_SUBQUERY)
def sql2_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery through the one-string-two-engines SQL path:
    events above the global mean. Catalyst plans the subquery as an
    independent job whose single-row result is injected as a literal into
    the outer scan filter (no join, no correlation).

    The mean is decimal-exact-sum ÷ count, not avg(): the filter is a
    strict comparison against the subquery value, so an ulp of
    accumulation-order divergence between engines could flip rows sitting
    exactly on the boundary (same hazard class as t5's avg rounding)."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL2_SCALAR_SUBQUERY)


_SQL3_CORRELATED_EXISTS = """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    GROUP BY c_mktsegment
"""


@register("sql3_correlated_exists", family="SQL", oracle=_SQL3_CORRELATED_EXISTS)
def sql3_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the one-string-two-engines
    SQL path. Catalyst decorrelates both predicates into a left-semi and a
    left-anti hash join against `orders` (RewritePredicateSubquery) — no
    per-row subquery execution survives into the physical plan, which is
    what makes the shape viable at 100 TB."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL3_CORRELATED_EXISTS)


_SQL4_LOCAL_SUPPLIER_VOLUME = """
    SELECT n_name,
           CAST(round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(18,6))) AS DOUBLE), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name
"""


@register("sql4_local_supplier_volume", family="SQL", oracle=_SQL4_LOCAL_SUPPLIER_VOLUME)
def sql4_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-table star join with the
    customer-nation = supplier-nation correlation — the canonical
    join-reordering stress. One ANSI string, both engines.

    Catalyst handles the physical strategy: region/nation/supplier land
    under the broadcast threshold, the orders date filter pushes to the
    scan, and AQE re-plans the remaining fact-fact join from runtime
    sizes. Per-item revenue terms are cast to DECIMAL(18,6) before the
    sum so the per-nation accumulation is exact — summing thousands of
    doubles per group is accumulation-order-dependent and the engines
    would disagree at the cent boundary (SCALE.md floats-vs-oracle
    note); the per-term double products themselves are IEEE-identical on
    both engines."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL4_LOCAL_SUPPLIER_VOLUME)


_SQL5_LARGE_VOLUME_CUSTOMER = """
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
"""


@register(
    "sql5_large_volume_customer", family="SQL", oracle=_SQL5_LARGE_VOLUME_CUSTOMER
)
def sql5_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customer): aggregate-HAVING
    IN-subquery over the fact table, re-joined to the same fact — the
    canonical subquery-decorrelation stress. One ANSI string, both
    engines; Catalyst rewrites the IN as a left-semi join on the
    pre-aggregated key set, so the fact table is scanned twice but
    shuffled on the same key both times (AQE reuses the exchange where
    it can). Quantity sums are decimal-exact; the HAVING threshold
    therefore cuts identically on both engines — a double-accumulated
    sum could straddle 150 differently per partition order."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL5_LARGE_VOLUME_CUSTOMER)


_SCD2_UPDATES = """
    SELECT DISTINCT c_custkey AS k FROM customer
    JOIN orders ON o_custkey = c_custkey
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
"""


@register(
    "m1_scd2_merge",
    family="ETL",
    oracle=f"""
        WITH upd AS ({_SCD2_UPDATES})
        SELECT c_custkey, c_mktsegment AS segment,
               DATE '1900-01-01' AS valid_from,
               DATE '1997-07-01' AS valid_to,
               false AS is_current
        FROM customer JOIN upd ON c_custkey = k
        UNION ALL
        SELECT c_custkey, 'REACTIVATED', DATE '1997-07-01', NULL, true
        FROM customer JOIN upd ON c_custkey = k
        UNION ALL
        SELECT c_custkey, c_mktsegment, DATE '1900-01-01', NULL, true
        FROM customer WHERE c_custkey NOT IN (SELECT k FROM upd)
    """,
)
def m1_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension merge (the warehouse MERGE/upsert pattern,
    lakehouse-style, without a table format): customers active in 1997H1
    get their current row closed (valid_to = effective date) and a new
    current row opened; everyone else passes through. History is
    append-only rows with (valid_from, valid_to, is_current) — time
    travel is then a plain predicate.

    The change set computes once (semi-join on the update condition) and
    drives three branches — close / open / passthrough — as one
    unionByName; at scale the dim-side joins are broadcast (change keys
    ≪ dimension) and the union is append-only writes, the same plan a
    Delta/Iceberg MERGE lowers to. Dates and booleans only —
    engine-deterministic."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    upd_keys = (
        customer.join(
            orders.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-07-01")
            ),
            customer.c_custkey == orders.o_custkey,
            "left_semi",
        )
        .select("c_custkey")
        .distinct()
    )
    changed = customer.join(F.broadcast(upd_keys), "c_custkey")
    untouched = customer.join(F.broadcast(upd_keys), "c_custkey", "left_anti")
    d = lambda s: F.lit(s).cast("date")  # noqa: E731
    closed = changed.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        d("1900-01-01").alias("valid_from"),
        d("1997-07-01").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed.select(
        "c_custkey",
        F.lit("REACTIVATED").alias("segment"),
        d("1997-07-01").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    passthrough = untouched.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        d("1900-01-01").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(opened).unionByName(passthrough)


_SQL6_NATION_TRADE = """
    SELECT supp_nation, cust_nation, yr,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT ns.n_name AS supp_nation,
               nc.n_name AS cust_nation,
               year(l_shipdate) AS yr,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey  = o_custkey
        JOIN nation ns ON ns.n_nationkey = s_nationkey
        JOIN nation nc ON nc.n_nationkey = c_nationkey
        WHERE ((ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_8')
            OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_7'))
    ) shipping
    GROUP BY supp_nation, cust_nation, yr
    ORDER BY supp_nation, cust_nation, yr
"""


@register("sql6_nation_trade_volume", family="SQL", oracle=_SQL6_NATION_TRADE)
def sql6_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): six-table join with a
    DISJUNCTIVE cross-dimension predicate over two aliases of the same
    dimension (nation joined twice under different roles) — the nation
    pair uses this corpus's NATION_N names (TPC-H's FRANCE/GERMANY don't
    exist here; with them the predicate matched nothing and the oracle
    check was vacuous, r5 vacuity audit). Catalyst
    broadcasts both nation sides and the supplier/customer dims; the OR
    over the two role pairs cannot be pushed below the joins, so it tests
    post-join filter placement. One ANSI string, both engines."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL6_NATION_TRADE)


_SQL7_PRIORITY_CLASSES = """
    SELECT year(o_orderdate) AS yr,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           round(sum(CASE WHEN l_returnflag = 'R'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END), 2) AS returned_revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1996-01-01'
    GROUP BY yr
    ORDER BY yr
"""


@register("sql7_priority_classes", family="SQL", oracle=_SQL7_PRIORITY_CLASSES)
def sql7_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional classification agg): pivot-style CASE
    sums inside one hash aggregate over a fact-fact join — one pass,
    partial aggregation map-side, no per-class scans. The returned-revenue
    arm mixes a float product under the CASE; rounded at 2dp on a
    decimal-friendly magnitude (SCALE.md floats note)."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL7_PRIORITY_CLASSES)


_SQL8_DISJUNCTIVE = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45
           AND l_quantity BETWEEN 20 AND 40)
"""


@register("sql8_disjunctive_join_filter", family="SQL", oracle=_SQL8_DISJUNCTIVE)
def sql8_disjunctive_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive multi-column predicates straddling a
    join): three OR-branches each combining part-side and lineitem-side
    conditions. Catalyst extracts the common single-side conjuncts it can
    (quantity/size envelopes) to push below the join while the residual
    disjunction evaluates post-join — the classic predicate-decomposition
    stress. Scalar-only output; decimal-rounded revenue."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL8_DISJUNCTIVE)


_SQL9_ABOVE_BRAND_AVG = """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE p_retailprice > 1.05 * (
        SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(*)
        FROM part p2
        WHERE p2.p_brand = p.p_brand
    )
    ORDER BY p_partkey
"""


@register("sql9_above_brand_avg", family="SQL", oracle=_SQL9_ABOVE_BRAND_AVG)
def sql9_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2/Q17-shape correlated SCALAR aggregate subquery: each part
    compares against its brand's average. Catalyst decorrelates to a
    grouped aggregate joined back on the correlation key (one extra scan +
    one broadcastable per-brand aggregate) instead of a per-row subquery —
    O(N) not O(N·groups). The multiplier is 1.05 because retail prices
    span only 900-999.9 (max ±6% from a brand mean) — at the classic 1.2
    no part ever qualified and the oracle check was vacuous (r5 vacuity
    audit); 1.05 selects ~3% of parts. The brand mean is decimal-exact
    sum ÷ count (sql2's idiom, CLAUDE.md's boundary rule): a plain
    avg() of doubles is accumulation-order-dependent, and with the
    threshold now LIVE the nearest price sits only 0.002 away at sf0.1
    — an ulp of engine drift could flip membership (r5 self-review
    catch; the prior 1.2 threshold made the hazard dead code)."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL9_ABOVE_BRAND_AVG)


_SQL10_Q6 = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS forecast_revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register("sql10_forecast_revenue", family="SQL", oracle=_SQL10_Q6)
def sql10_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical
    scan-filter-aggregate — no join, no group key, answer is one row. The
    point at scale is the SCAN: all four predicates push to parquet
    (row-group min/max pruning on shipdate) and the aggregate is a
    partial+final over a 2-column projection — the query reads a sliver
    of a 100 TB lineitem. Sum of 2-decimal × 2-decimal products rounds
    identically on both engines at this magnitude."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL10_Q6)


_SQL11_Q10 = """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate <  DATE '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@register("sql11_returned_items", family="SQL", oracle=_SQL11_Q10)
def sql11_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): four-table star join
    with a quarter date band and a returnflag filter, top-20 customers by
    lost revenue. nation broadcasts; the orders date band prunes before
    the lineitem join; TakeOrderedAndProject caps the sort at 20 rows.
    Unique tie-break on c_custkey keeps the LIMIT deterministic."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL11_Q10)


_SQL12_MIN_COST_SUPPLIER = """
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS min_price
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, l_suppkey AS s_suppkey, s_name, n_name,
           min_price AS best_price
    FROM part
    JOIN supply   ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_size <= 10
      AND min_price = (SELECT min(s2.min_price) FROM supply s2
                       WHERE s2.l_partkey = p_partkey)
    ORDER BY p_partkey, s_suppkey
"""


@register("sql12_min_cost_supplier", family="SQL", oracle=_SQL12_MIN_COST_SUPPLIER)
def sql12_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each small part, the
    supplier(s) offering its cheapest observed price — a correlated MIN
    subquery whose correlation key (partkey) threads through a multi-way
    dimension join. Catalyst decorrelates to a per-part min aggregate
    joined back on the key, and because the equality is against a
    MIN (selection, not arithmetic) over decimal-exact prices the
    tie-set is engine-deterministic — ALL suppliers at the minimum
    survive on both engines, no float boundary involved.

    One ANSI string, both engines; the supply CTE is referenced twice
    (join input + subquery) and Catalyst plans it once under AQE exchange
    reuse."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL12_MIN_COST_SUPPLIER)


_SQL13_ORDER_COUNT_DIST = """
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) per_customer
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders
"""


@register("sql13_order_count_dist", family="SQL", oracle=_SQL13_ORDER_COUNT_DIST)
def sql13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): the
    double-aggregation histogram — count orders per customer, then count
    customers per order-count. The filter lives in the LEFT JOIN's ON
    clause, not WHERE, so zero-order customers survive as n_orders = 0
    (the Q13 signature a WHERE would silently destroy). Integer counts
    only — nothing float-sensitive. At scale: first agg shuffles on
    custkey, second on the tiny n_orders domain; both map-side
    partial-aggregated."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL13_ORDER_COUNT_DIST)


_SQL14_PROMO_SHARE = """
    SELECT yr,
           CAST(floor(100.0 * promo_rev / total_rev * 1e6) / 1e6
                AS DOUBLE) AS promo_share_pct,
           n_lines
    FROM (
        SELECT year(l_shipdate) AS yr,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(18,6))
                             ELSE CAST(0 AS DECIMAL(18,6)) END)
                    AS DOUBLE) AS promo_rev,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS total_rev,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        GROUP BY yr
    ) by_year
    ORDER BY yr
"""


@register("sql14_promo_share", family="SQL", oracle=_SQL14_PROMO_SHARE)
def sql14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14/Q8 shape (market-share ratio): a conditional-sum ÷
    total-sum ratio per year — one hash aggregate computes both arms in a
    single pass (no second scan for the denominator). Both sums
    accumulate as DECIMAL(18,6) (order-independent), cast to double once,
    and the ratio is floor-truncated at 1e-6 per the repo convention —
    round() on an arbitrary quotient can land on a cross-engine half-tie
    (CLAUDE.md, the f8 class). total_rev > 0 whenever the group exists
    (prices are positive), so the plain division never hits ANSI
    divide-by-zero."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL14_PROMO_SHARE)


_SQL15_TOP_SUPPLIER = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
"""


@register("sql15_top_supplier", family="SQL", oracle=_SQL15_TOP_SUPPLIER)
def sql15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): revenue-per-supplier CTE filtered
    by equality against its own uncorrelated MAX — the view-plus-max
    pattern. The equality is double=double, safe ONLY because both sides
    come from the same decimal-exact per-supplier sums (accumulation
    order cannot perturb them) and max() is a selection; every supplier
    tied at the max survives identically on both engines. Catalyst runs
    the scalar subquery as an independent one-row job injected as a
    literal filter."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL15_TOP_SUPPLIER)


_SQL16_SUPPLIER_CNT = """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND NOT EXISTS (SELECT 1 FROM supplier
                      WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
"""


@register("sql16_supplier_cnt", family="SQL", oracle=_SQL16_SUPPLIER_CNT)
def sql16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): count(DISTINCT)
    grouped by part attributes, with an anti-join exclusion list
    (negative-balance suppliers) expressed as NOT EXISTS — NOT IN is
    avoided deliberately: its three-valued NULL semantics silently
    returns zero rows if the exclusion side ever contains a NULL key,
    and the two engines would at least agree on being wrong. Catalyst
    plans the distinct as a two-phase expand+agg shuffled on the group
    keys; the supplier exclusion broadcasts."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL16_SUPPLIER_CNT)


_SQL17_SMALL_QTY_REVENUE = """
    SELECT CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE) / 7.0 * 1e6) / 1e6
                AS DOUBLE) AS avg_weekly_revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
"""


@register("sql17_small_qty_revenue", family="SQL", oracle=_SQL17_SMALL_QTY_REVENUE)
def sql17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): each lineitem
    compares against a correlated aggregate over the SAME fact table
    (half the part's average quantity) — the self-correlated-agg stress
    that decorrelates to a per-part average joined back on partkey, so
    the 100 TB fact is scanned twice but never nested-looped. The
    threshold is deterministic: quantities are integer-valued doubles,
    their sum is exact (≪ 2^53), and avg ÷ 2 are identical IEEE ops on
    both engines. Output sum is decimal-exact; the /7.0 quotient is
    floor-truncated (f8 convention)."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL17_SMALL_QTY_REVENUE)


_SQL18_LAST_SHIPPER = """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name IN ('NATION_7', 'NATION_8')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
"""


@register("sql18_last_shipper", family="SQL", oracle=_SQL18_LAST_SHIPPER)
def sql18_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): two
    correlated subqueries against the fact table itself, one with an
    INEQUALITY correlation (l3.l_shipdate > l1.l_shipdate) — the
    hardest decorrelation in the TPC-H suite. Catalyst rewrites the
    EXISTS to a left-semi and the NOT EXISTS to a left-anti hash join on
    orderkey with the inequality as a post-probe residual; the fact
    never nested-loops. l_receiptdate/l_commitdate don't exist in this
    schema, so 'kept waiting' is re-expressed as 'was the strictly last
    shipper in a multi-supplier finished order' over l_shipdate —
    same plan shape, same semantics class. LIMIT tie-broken on s_name
    (unique per supplier)."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL18_LAST_SHIPPER)


_SQL19_DORMANT_ACCOUNTS = """
    SELECT c_mktsegment AS segment,
           count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS totacctbal
    FROM customer c
    WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'FURNITURE')
      AND c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                                   AS DOUBLE) / count(*)
                       FROM customer c2
                       WHERE c2.c_acctbal > 0.0
                         AND c2.c_mktsegment IN
                             ('AUTOMOBILE', 'MACHINERY', 'FURNITURE'))
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c_mktsegment
    ORDER BY segment
"""


@register("sql19_dormant_accounts", family="SQL", oracle=_SQL19_DORMANT_ACCOUNTS)
def sql19_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): rich customers with no
    RECENT orders — an uncorrelated scalar-average subquery gating the
    scan plus a NOT EXISTS anti-join against the date-banded fact.
    Dormancy is 'no order since 2000' rather than Q22's 'no order ever'
    because this corpus gives every customer early orders — the no-order-
    ever form returns ZERO rows at both verification scales, making the
    oracle check vacuous (empty==empty; caught in r5 self-review). The
    2000 cutoff selects ~30/~400 customers at sf0.01/sf0.1, so the
    boundary-sensitive mean and the anti-join are actually exercised.
    The mean is decimal-exact sum ÷ count (sql2's idiom) because the
    filter is a strict comparison against it: an ulp of accumulation-
    order drift could flip customers sitting on the boundary. The
    anti-join shuffles on custkey (or broadcasts the recent-order key
    set when small); the scalar subquery is one independent row injected
    as a literal."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL19_DORMANT_ACCOUNTS)


_SQL20_LATE_ORDERS = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate <  DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register("sql20_late_orders", family="SQL", oracle=_SQL20_LATE_ORDERS)
def sql20_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS whose correlation
    reaches a NON-KEY outer column — the lineitem must ship more than 60
    days after ITS order's date, so the subquery predicate compares inner
    l_shipdate against outer o_orderdate, not a constant (sql3's EXISTS
    correlates only on the key). Catalyst decorrelates to a left-semi
    join on orderkey carrying the date comparison as the join residual;
    l_commitdate/l_receiptdate don't exist here, so Q4's 'receipt after
    commit' becomes 'shipped 60+ days after order' — same shape. Date +
    interval arithmetic is identical on both engines; outputs are a
    string and a count."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL20_LATE_ORDERS)


_SQL21_PROMO_SUPPLIERS = """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        GROUP BY l_suppkey, l_partkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100
    )
    ORDER BY s_suppkey
"""


@register("sql21_promo_suppliers", family="SQL", oracle=_SQL21_PROMO_SUPPLIERS)
def sql21_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): a TWO-LEVEL semijoin
    chain — suppliers IN (fact aggregated per (supplier, part), itself
    filtered by part IN (dimension predicate)) with an aggregate-HAVING
    threshold in the middle. Catalyst collapses the inner IN to a
    broadcast semi join BEFORE the aggregation (pruning the fact scan to
    PROMO parts) and the outer IN to a semi join on the aggregated key
    set — the full chain runs as two semi joins and one partial+final
    agg, no correlated execution. Quantity sums are decimal-exact so the
    HAVING threshold cuts identically on both engines (sql5's idiom)."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL21_PROMO_SUPPLIERS)


_M2_CDC = """
    WITH changes AS (
        SELECT o_custkey AS k,
               o_orderdate AS version,
               o_orderkey,
               CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
               o_totalprice AS new_val
        FROM orders
        WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-07-01'
    ),
    last AS (
        SELECT k, op, new_val
        FROM (
            SELECT k, op, new_val,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY version DESC, o_orderkey DESC) AS rn
            FROM changes
        ) WHERE rn = 1
    )
    SELECT c_custkey,
           round(CASE WHEN last.op = 'U' THEN last.new_val
                      ELSE c_acctbal END, 2) AS balance,
           coalesce(last.op, 'N') AS last_op
    FROM customer
    LEFT JOIN last ON last.k = c_custkey
    WHERE last.op IS NULL OR last.op <> 'D'
"""


@register("m2_cdc_apply", family="ETL", oracle=_M2_CDC)
def m2_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply — the lakehouse MERGE's general form: a change stream of
    versioned upserts and deletes collapses to last-writer-wins per key
    (row_number over (key) by version, a WindowGroupLimit-prunable top-1)
    and applies to the base snapshot in one outer join: U rewrites the
    value, D drops the row, untouched keys pass through. m1 is the
    SCD2 (history-keeping) sibling; this is the overwrite-in-place form.
    At scale the change set is usually ≪ the snapshot — Spark broadcasts
    it and the snapshot never shuffles; per-key versions make replays
    idempotent (applying the same change set twice is a no-op)."""
    from prometheus_remote_kinesis_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_M2_CDC)


_DQ1_PAIRS = [
    # (check name, child table, fk column, parent table, pk column)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

DQ1_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS fk_check,
           CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM {child} WHERE {fk} IS NULL)
                AS BIGINT) AS n_null_fk,
           CAST((SELECT count(*) FROM {child} c
                 WHERE c.{fk} IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM {parent} p
                                   WHERE p.{pk} = c.{fk}))
                AS BIGINT) AS n_orphan,
           CAST((SELECT count(*) FROM
                    (SELECT {pk} FROM {parent} GROUP BY {pk}
                     HAVING count(*) > 1)) AS BIGINT) AS n_dup_pk
    """
    for (name, child, fk, parent, pk) in _DQ1_PAIRS
)


@register("dq1_referential_audit", family="P6", oracle=DQ1_ORACLE)
def dq1_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass referential-integrity audit across the star schema — the
    data-quality report a lakehouse runs after every load (and the
    check the reference's schemaless NDJSON output can never give its
    consumers): for every FK edge, the child row count, NULL foreign
    keys, ORPHANED children (anti-join against the parent key set), and
    duplicated parent primary keys. A healthy TPC-H-shaped corpus scores
    all zeros in the last three columns — and the hash check pins that
    the audit MEASURES zero, not that it skipped the work (row counts
    anchor each check against vacuity).

    Scale shape: each check is one anti-join (small parents broadcast;
    the lineitem→orders edge shuffles on orderkey, whose cardinality
    grows with the corpus) plus a parent-side dup hash agg, unioned as
    5 single-row aggregates — every branch map-side combinable, no
    window, no sort, no text movement."""
    out = None
    for name, child_t, fk, parent_t, pk in _DQ1_PAIRS:
        child = load_table(spark, sf_dir, child_t)
        parent = load_table(spark, sf_dir, parent_t)
        orphans = (
            child.where(F.col(fk).isNotNull())
            .join(parent, child[fk] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphan"))
        )
        dups = (
            parent.groupBy(pk)
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_pk"))
        )
        base = child.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.sum(F.col(fk).isNull().cast("long")).cast("bigint").alias("n_null_fk"),
        )
        row = (
            base.crossJoin(orphans)
            .crossJoin(dups)
            .select(
                F.lit(name).alias("fk_check"),
                "n_child",
                "n_null_fk",
                "n_orphan",
                "n_dup_pk",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


DQ2_ORACLE = """
    WITH d AS (
        SELECT epoch_us(ts) // 86400000000 AS day_idx,
               epoch_us(ts) // 3600000000 AS hour_idx,
               event_type, value
        FROM events
    ),
    per_day AS (
        SELECT day_idx,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT hour_idx) AS BIGINT) AS n_hours,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_values
        FROM d GROUP BY 1
    )
    SELECT CAST(day_idx AS BIGINT) AS day_idx, n_rows, n_hours, n_types,
           n_null_values,
           CAST(day_idx - lag(day_idx) OVER (ORDER BY day_idx)
                AS BIGINT) AS gap_days
    FROM per_day
"""


@register("dq2_freshness_volume_audit", family="P6", oracle=DQ2_ORACLE)
def dq2_freshness_volume_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day completeness / freshness audit over the relay's event
    stream — dq1's temporal sibling (dq1 audits the star schema's FK
    edges; this audits the TIME axis a monitoring pipeline actually
    pages on): for every active day, row volume, hour coverage (24 =
    full ingest day), series-type coverage, NULL-value (staleness-
    marker) counts, and the gap to the previous active day (gap_days
    > 1 = a silent ingest outage — t18's absent-data shape lifted to
    table granularity). Day/hour indices are integer epoch divisions
    (non-negative `div` ≡ `//`), never engine date types — no
    timezone/calendar drama in the hash.

    Scale shape: ONE hash aggregation keyed on epoch-day (key count
    grows with retention; distinct-hour/type are two-phase inside it),
    then the gap lag runs over the per-DAY aggregate — |days| rows
    (30 here, ~36 k for a century), never fact rows, the w1c
    band-aggregate argument; the audit-window whitelist entry documents
    it. A 100 TB deployment partitions the archive by day already, so
    the agg reads pre-clustered row groups (S9's layout)."""
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
        F.expr("unix_micros(ts) div 3600000000").alias("hour_idx"),
        "event_type",
        "value",
    )
    per_day = d.groupBy("day_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("hour_idx").cast("bigint").alias("n_hours"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.sum(F.col("value").isNull().cast("long")).cast("bigint").alias(
            "n_null_values"
        ),
    )
    from pyspark.sql import Window

    w = Window.orderBy("day_idx")
    return per_day.select(
        F.col("day_idx").cast("bigint").alias("day_idx"),
        "n_rows",
        "n_hours",
        "n_types",
        "n_null_values",
        (F.col("day_idx") - F.lag("day_idx").over(w)).cast("bigint").alias(
            "gap_days"
        ),
    )


# dq3: one profile row per column; min/max rendered engine-portably —
# BIGINT/VARCHAR casts are identical across engines, ts goes through
# unix-micros, and the DOUBLE column is floor-scaled to micro-units
# BEFORE min/max so no float-to-string formatting ever enters the hash.
_DQ3_COLS = (
    ("event_id", "CAST(event_id AS VARCHAR)"),
    ("ts", "CAST(unix_micros(ts) AS VARCHAR)"),
    ("user_id", "CAST(user_id AS VARCHAR)"),
    ("event_type", "event_type"),
    ("value", "CAST(CAST(floor(value * 1e6) AS BIGINT) AS VARCHAR)"),
    ("props", "props"),
)


def _dq3_duck_render(col: str) -> str:
    return {
        "ts": "CAST(epoch_us(ts) AS VARCHAR)",
        "value": "CAST(CAST(floor(value * 1e6) AS BIGINT) AS VARCHAR)",
        "event_type": "event_type",
        "props": "props",
    }.get(col, f"CAST({col} AS VARCHAR)")


DQ3_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{col}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
           min({_dq3_duck_render(col)}) AS min_s,
           max({_dq3_duck_render(col)}) AS max_s
    FROM events
    """
    for col, _ in _DQ3_COLS
)


@register("dq3_schema_profile", family="P6", oracle=DQ3_ORACLE)
def dq3_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of the relay's event table — the
    schema-drift audit that completes the dq family (dq1 = FK edges,
    dq2 = time axis, dq3 = the COLUMNS themselves): one row per column
    with row count, NULL count, exact distinct cardinality, and
    engine-portable min/max renderings (BIGINT/VARCHAR casts; the ts
    column goes through unix-micros and the DOUBLE column floor-scales
    to micro-units BEFORE min/max so float formatting never enters the
    hash). The profile a pipeline diffs run-over-run to page on schema
    drift: a NULL-rate jump, a cardinality collapse, a domain shift.

    Scale shape: one aggregation pass per column over a COLUMNAR scan —
    each branch prunes to its single column (parquet reads 1 column per
    profile row, the P7 pruning argument), and the per-column plan is a
    partial+final hash agg with a two-phase exact distinct. Exact
    distinct is the hash-checkable form; a 100 TB profile swaps in
    approx_count_distinct (a3's HLL) with everything else unchanged.
    The six single-row results union into the 6-row report — no joins,
    no window, no text shuffle (min/max of props moves 2 strings per
    partition, not the column)."""
    events = load_table(spark, sf_dir, "events")
    spark_render = {
        "ts": F.expr("CAST(unix_micros(ts) AS STRING)"),
        "value": F.expr("CAST(CAST(floor(value * 1e6) AS BIGINT) AS STRING)"),
        "event_type": F.col("event_type"),
        "props": F.col("props"),
    }
    out = None
    for col, _ in _DQ3_COLS:
        r = spark_render.get(col, F.col(col).cast("string"))
        row = events.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col(col).isNull().cast("long")).cast("bigint").alias("n_null"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            F.min(r).alias("min_s"),
            F.max(r).alias("max_s"),
        ).select(
            F.lit(col).alias("col_name"),
            "n_rows",
            "n_null",
            "n_distinct",
            "min_s",
            "max_s",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _dq3b_sketch_block(col: str) -> str:
    render = _dq3_duck_render(col)
    from prometheus_remote_kinesis_spark.operators.aggregates import (
        KMV_BITS, KMV_K,
    )

    return f"""
    SELECT '{col}' AS col_name, b.n_rows, b.n_null,
           s.n_distinct, s.k_actual, s.h_k,
           CASE WHEN s.k_actual < {KMV_K} THEN s.n_distinct
                ELSE CAST(({KMV_K - 1} * {2**KMV_BITS}) // s.h_k AS BIGINT)
           END AS kmv_estimate,
           b.min_s, b.max_s
    FROM (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               min({render}) AS min_s,
               max({render}) AS max_s
        FROM events
    ) b, (
        SELECT CAST(count(*) AS BIGINT) AS n_distinct,
               max(CASE WHEN rn <= {KMV_K} THEN h END) AS h_k,
               CAST(sum(CASE WHEN rn <= {KMV_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS k_actual
        FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS rn
            FROM (
                SELECT DISTINCT
                       CAST(('0x' || substring(md5({render}),
                                               1, {KMV_BITS // 4})) AS BIGINT)
                           AS h
                FROM events WHERE {col} IS NOT NULL
            )
        )
    ) s
    """


DQ3B_ORACLE = "\nUNION ALL\n".join(
    _dq3b_sketch_block(col) for col, _ in _DQ3_COLS
)


@register("dq3b_schema_profile_sketch", family="P6", oracle=DQ3B_ORACLE)
def dq3b_schema_profile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dq3's 100 TB form (r11, VERDICT r10 task #7 — delivered as the
    dq3 docstring promised): the per-column EXACT distinct — dq3's
    documented linear floor, which shuffles raw column values (props is
    a text shuffle) — is replaced by the a3c KMV bottom-k sketch over
    each column's ENGINE-PORTABLE rendering (the same min/max rendering
    dq3 uses, so ts hashes its unix-micros and the DOUBLE column its
    floor-scaled micro-units: cross-engine md5 needs identical input
    strings). Everything else is unchanged: n_rows / n_null / min_s /
    max_s per column, one row per column.

    The sketch is hash-verified cell by cell (n_distinct of the hash
    set, k_actual, h_k, estimate — the a3c discipline), and its scale
    posture is a3c's: the only distinct shuffle carries (col, 56-bit
    digest) fixed-width rows — the raw column, text included, never
    re-shuffles — the top-K runs banded two-phase (w1c), and KMV
    partials are MERGEABLE, so a 1000-executor profile combines
    per-partition bottom-k sets without a raw rescan. n_distinct here
    counts the DIGEST set (≡ the rendered-value set up to md5
    collisions; the rendering quantizes the DOUBLE column to micro-
    units, which is the profile's documented value domain)."""
    from prometheus_remote_kinesis_spark.operators.aggregates import (
        kmv_hash, kmv_summary,
    )

    events = load_table(spark, sf_dir, "events")
    spark_render = {
        "ts": F.expr("CAST(unix_micros(ts) AS STRING)"),
        "value": F.expr("CAST(CAST(floor(value * 1e6) AS BIGINT) AS STRING)"),
        "event_type": F.col("event_type"),
        "props": F.col("props"),
    }
    dh = None
    base = None
    for col, _ in _DQ3_COLS:
        r = spark_render.get(col, F.col(col).cast("string"))
        d = (
            events.where(F.col(col).isNotNull())
            .select(F.lit(col).alias("event_type"), kmv_hash(r).alias("h"))
            .distinct()
        )
        dh = d if dh is None else dh.unionByName(d)
        row = events.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col(col).isNull().cast("long")).cast("bigint").alias("n_null"),
            F.min(r).alias("min_s"),
            F.max(r).alias("max_s"),
        ).select(
            F.lit(col).alias("col_name"), "n_rows", "n_null", "min_s", "max_s"
        )
        base = row if base is None else base.unionByName(row)
    sketch = kmv_summary(dh)  # one row per col_name (keyed as event_type)
    return base.join(
        sketch, base["col_name"] == sketch["event_type"]
    ).select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "k_actual",
        "h_k",
        "kmv_estimate",
        "min_s",
        "max_s",
    )
