"""O-family: sorts / limits / set operations (SURVEY.md §2.6 O1-O4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


@register(
    "o1_nations_sorted",
    family="O1",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name",
)
def o1_nations_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (range-partitioned exchange + per-partition sort)."""
    return load_table(spark, sf_dir, "nation").orderBy("n_name").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "o2_top100_orders",
    family="O2",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def o2_top100_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject: per-partition top-k then a
    k-row merge on the driver — never a full global sort. Unique key in
    the ordering keeps the boundary deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@register(
    "o3_union_nation_counts",
    family="O3",
    oracle="""
        SELECT nationkey, count(*) AS n FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey FROM supplier
        ) GROUP BY nationkey
    """,
)
def o3_union_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    unioned = customer.select(F.col("c_nationkey").alias("nationkey")).unionByName(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
    return unioned.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "o4_nation_intersect",
    family="O4",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
)
def o4_nation_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers and
    suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "o4b_nation_except",
    family="O4",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
        EXCEPT
        SELECT s_nationkey FROM supplier WHERE s_acctbal < 0
    """,
)
def o4b_nation_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with overdrawn customers but no
    overdrawn supplier. The negative-balance filters are what make the
    check REAL: every nation has both customers and suppliers in this
    corpus, so the unfiltered EXCEPT returned zero rows at both
    verification scales — a vacuous oracle (empty==empty, r5 vacuity
    audit); overdrawn suppliers are rare (~6 at sf0.01) so the
    subtraction leaves most nations standing."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.filter(F.col("c_acctbal") < 0)
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(
            supplier.filter(F.col("s_acctbal") < 0).select(
                F.col("s_nationkey").alias("nationkey")
            )
        )
    )


@register(
    "o2b_pagination",
    family="O2",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50 OFFSET 100
    """,
)
def o2b_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination over a total order (unique tie-break).
    Spark plans offset+limit together (GlobalLimit with skip), so only
    offset+limit rows ever reach the driver-side merge — but note the
    scale caveat: deep pagination still sorts/collects offset+limit rows
    per partition; keyset pagination (WHERE key > last_seen) is the
    100 TB-honest alternative for deep pages."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(100)
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


O5_ORACLE = """
    WITH s AS (
        SELECT o_orderkey AS okey, o_totalprice AS price,
               epoch_us(o_orderdate) // 86400000000 AS d
        FROM orders
    ),
    pg AS (SELECT price, min(d) AS md FROM s GROUP BY 1),
    pc AS (
        SELECT price,
               min(md) OVER (ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS m_cheaper
        FROM pg
    ),
    ms AS (
        SELECT okey, price, d,
               min(d) OVER (PARTITION BY price ORDER BY d, okey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS m_same
        FROM s
    )
    SELECT ms.okey, ms.price, CAST(ms.d AS BIGINT) AS order_day
    FROM ms JOIN pc USING (price)
    WHERE NOT (coalesce(pc.m_cheaper <= ms.d, false)
               OR coalesce(ms.m_same < ms.d, false))
"""


@register("o5_skyline_pareto", family="O2", oracle=O5_ORACLE)
def o5_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) — the classic multi-criteria
    operator the O family lacked: orders not DOMINATED on
    (price ↓, order date ↓): a dominates b iff a is ≤ on both axes and
    strictly better on at least one (the cheapest-AND-earliest
    non-dominated set; 5 of 15 000 orders at sf0.01). A 2-D skyline
    reduces to sort + running minimum: a row is dominated iff some
    STRICTLY-cheaper row has date ≤ its own (m_cheaper), or an
    equal-price row has a strictly earlier (date, key) (m_same — the
    split is what makes price ties exact: an identical (price, date)
    twin dominates neither way and both survive).

    Banded two-phase (the w1c discipline — the direct form's prefix-min
    needs one global sort, the forbidden single-task shape): per-price
    minima (keys grow) band by price range; the cross-band prefix
    minimum runs over the ~112-row band aggregate (whitelisted global
    window, never fact rows), and each band's in-band prefix folds the
    incoming band minimum — least() skips the NULLs at band/series
    starts identically on both engines, with explicit coalesce(…, false)
    making a NULL prefix mean NOT dominated, exactly the oracle's
    direct-window form. The m_same window partitions by price (keys
    grow). At 100 TB band width shrinks so bands scale with data (the
    w1c re-banding rule) — a skyline cannot beat the sort lower bound,
    but banding makes it |bands|-way parallel partial sorts plus a tiny
    minima merge. The textbook NOT-EXISTS definition (quadratic) is
    pinned against this plan by
    tests/test_operators.py::test_skyline_matches_textbook_definition."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.expr("unix_micros(CAST(o_orderdate AS timestamp)) div 86400000000").alias(
            "d"
        ),
    )
    pg = s.groupBy("price").agg(F.min("d").alias("md"))
    banded = pg.withColumn("band", F.floor(F.col("price") / 5000.0))
    per_band = banded.groupBy("band").agg(F.min("md").alias("band_md"))
    w_bands = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    inc = per_band.select(
        "band", F.min("band_md").over(w_bands).alias("inc_md")
    )
    w_in = Window.partitionBy("band").orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pc = (
        banded.join(inc, "band")
        .select(
            "price",
            F.least(
                F.min("md").over(w_in), F.col("inc_md")
            ).alias("m_cheaper"),
        )
    )
    w_same = Window.partitionBy("price").orderBy("d", "okey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ms = s.select(
        "okey", "price", "d", F.min("d").over(w_same).alias("m_same")
    )
    return (
        ms.join(pc, "price")
        .where(
            ~(
                F.coalesce(F.col("m_cheaper") <= F.col("d"), F.lit(False))
                | F.coalesce(F.col("m_same") < F.col("d"), F.lit(False))
            )
        )
        .select("okey", "price", F.col("d").cast("bigint").alias("order_day"))
    )
