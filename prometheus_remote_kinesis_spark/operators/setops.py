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
