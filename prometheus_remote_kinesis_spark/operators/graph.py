"""Graph analytics over the relational corpus — the Pregel-shaped
iteration family (joins + hash aggs per superstep, no RDD/GraphX),
next to the connected-components operators in ``llm/dedup.py``
(l2e min-label propagation, l2f star contraction).

No reference counterpart (shirou/prometheus_remote_kinesis relays
samples; it holds no graph state) — Layer-B addition. PageRank follows
Page et al. 1999 (public paper), integer-quantized the l4h/l2i way so
the iteration is HASH-VERIFIABLE against an unrolled-CTE DuckDB oracle:
every superstep is exact BIGINT arithmetic (floor divisions on
non-negative operands, where Spark's ``div`` and DuckDB's ``//``
agree), so two engines running the same recurrence produce identical
integers — no float accumulation order to diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table

G1_SCALE = 1_000_000  # fixed-point unit: pr = 1.0 ≡ 1e6
G1_ITERS = 2

_PR_STEP = """
    SELECT e.dst AS node,
           CAST(150000 + (85 * sum(p.pr // d.outdeg)) // 100 AS BIGINT) AS pr
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY 1
"""

G1_ORACLE = f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT 'c' || c::VARCHAR AS src, 's' || s::VARCHAR AS dst FROM pairs
        UNION ALL
        SELECT 's' || s::VARCHAR, 'c' || c::VARCHAR FROM pairs
    ),
    deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1
    ),
    pr0 AS (
        SELECT src AS node, CAST({G1_SCALE} AS BIGINT) AS pr FROM deg
    ),
    pr1 AS ({_PR_STEP.format(prev="pr0")}),
    pr2 AS ({_PR_STEP.format(prev="pr1")})
    SELECT node, pr AS pagerank_fp FROM pr2
"""


@register("g1_pagerank_quantized", family="G1", oracle=G1_ORACLE)
def g1_pagerank_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank over the customer↔supplier trade
    graph — the third HASH-VERIFIED iterative algorithm (after l4h
    k-means and l2i SemDeDup): 2 power-iteration supersteps of
    pr' = 0.15 + 0.85·Σ pr/outdeg, quantized at 1e-6 so every step is
    exact BIGINT (contribution = pr DIV outdeg, damping =
    (85·Σ) DIV 100; all operands non-negative so Spark DIV ≡ DuckDB //).
    The oracle unrolls the same two supersteps as CTEs — the driver hash
    compare covers edge construction, degree normalization, and both
    iterations end to end.

    Graph: distinct (customer, supplier) pairs that traded (orders ⋈
    lineitem), with both edge directions added so the bipartite graph
    has no dangling nodes (every node is some edge's dst, so every node
    survives each superstep — membership itself is part of the hash).

    Scale shape (Pregel-as-DataFrames): each superstep is one
    edges ⋈ pr join on src (both sides hash-partitioned on the SAME key,
    so Catalyst reuses the edge exchange across supersteps) followed by
    a map-side-combined sum keyed on dst — per-superstep cost is
    O(|E|/executors) with no driver materialization at all (unlike
    l4h's bounded k×d collect, the rank vector STAYS distributed; the
    driver loop only builds plan depth). Key cardinality = nodes, grows
    with the corpus. Quantization error vs float PageRank is ≤ iters ×
    1e-6 per unit rank — capacity-ranking ties at that resolution are
    already meaningless."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    pr = deg.select(
        F.col("src").alias("node"), F.lit(G1_SCALE).cast("bigint").alias("pr")
    )
    for _ in range(G1_ITERS):
        contrib = (
            edges.join(pr, pr.node == edges.src)
            .join(deg, "src")
            .select("dst", F.expr("pr div outdeg").alias("m"))
        )
        pr = (
            contrib.groupBy("dst")
            .agg(
                (F.lit(150000) + F.expr("(85 * sum(m)) div 100"))
                .cast("bigint")
                .alias("pr")
            )
            .select(F.col("dst").alias("node"), "pr")
        )
    return pr.select("node", F.col("pr").alias("pagerank_fp"))
