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


def _trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (customer, supplier) trade pairs as 'c<id>'/'s<id>' node
    strings — shared by g1/g3. The DISTINCT runs on the raw INTEGER
    keys and the node strings are formatted AFTER it (r10: the 256×
    probe put g3's growth entirely in this edge-construction shuffle —
    13.2→37.3 s at 64×→256× fit floor + linear-in-input almost exactly —
    so the dedup exchange now carries two BIGINTs per row instead of
    two formatted strings; the concat runs on |pairs| survivors, not
    |lineitem| rows). Same result set: the oracle's DISTINCT is on
    integers already."""
    return _trade_pairs_int(spark, sf_dir).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
    )


def _trade_pairs_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct raw (o_custkey, l_suppkey) trade pairs — the integer
    form g4 consumes directly and _trade_pairs formats into node ids."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )

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
    pairs = _trade_pairs(spark, sf_dir)
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


G2_ORACLE = """
    WITH s AS (
        SELECT event_type, user_id,
               lag(user_id) OVER (PARTITION BY event_type
                                  ORDER BY epoch_us(ts), event_id) AS prev_u
        FROM events WHERE user_id IS NOT NULL
    ),
    edges AS (
        SELECT DISTINCT event_type,
               least(user_id, prev_u) AS a,
               greatest(user_id, prev_u) AS b
        FROM s WHERE prev_u IS NOT NULL AND prev_u <> user_id
    ),
    nodes AS (
        SELECT event_type, CAST(count(DISTINCT u) AS BIGINT) AS n_nodes
        FROM (SELECT event_type, a AS u FROM edges
              UNION ALL SELECT event_type, b AS u FROM edges)
        GROUP BY 1
    ),
    ecnt AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_edges
        FROM edges GROUP BY 1
    ),
    tri AS (
        SELECT e1.event_type, CAST(count(*) AS BIGINT) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.event_type = e1.event_type
                     AND e2.a = e1.a AND e2.b > e1.b
        JOIN edges e3 ON e3.event_type = e1.event_type
                     AND e3.a = e1.b AND e3.b = e2.b
        GROUP BY 1
    )
    SELECT n.event_type, n.n_nodes, c.n_edges,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM nodes n
    JOIN ecnt c ON c.event_type = n.event_type
    LEFT JOIN tri t ON t.event_type = n.event_type
"""


@register("g2_triangle_count", family="G1", oracle=G2_ORACLE)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting with DEGREE-ORDERED edge orientation —
    the G family's second mechanism (g1 is iterative message passing;
    this is the multi-way self-join shape): per event_type, the user
    interaction graph's clustering signal (n_nodes, n_edges,
    n_triangles), the community-density statistic under any
    friend-of-friend / collusion / bot-ring analysis.

    Graph: an edge connects CONSECUTIVE users in the type's event-time
    order (ts, event_id) — the interaction-chain graph, linear in rows
    by construction (a co-occurrence pair join would be quadratic per
    cell and is the non-scaling alternative). Edge generation is
    bucket-decomposed (the t32 treatment, without even needing a count
    correction: lag runs within (type, 1 h) buckets — keys grow with
    the corpus — and each bucket boundary contributes its one
    (last-of-prev, first-of-next) pair from a per-bucket relation;
    DISTINCT-union of the two pair sets equals the direct lag's pair
    set exactly, since edges dedup anyway).

    Counting follows Suri & Vassilvitskii 2011 (WWW, public — "the
    curse of the last reducer"): orient every edge from its
    lexicographically-smaller (degree, id) endpoint to the larger, so
    each triangle {a ≺ b ≺ c} is counted EXACTLY once as the wedge
    (b, c) at its lowest-ranked vertex a closed by the oriented edge
    b→c. Orientation caps every node's out-degree at O(√|E|), so the
    wedge self-join produces Σ outdeg² = O(|E|^1.5) candidates instead
    of the hub-quadratic blowup a naive neighbor join hits — the
    last-reducer skew is what the degree ordering kills at 100 TB. All
    joins are equi-joins on (type, node) keys whose cardinality grows
    with the corpus; everything is exact integer arithmetic.

    The oracle counts the SAME triangles orientation-free (id-ordered
    three-way join) — triangle count is orientation-invariant, so the
    hash check proves the degree-ordered plan equals the textbook
    definition. Engineered-graph edges (two shared wedges, K4 = 4
    triangles, degree ties) pinned by
    tests/test_operators.py::test_triangle_count_engineered_graphs."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    s = events.select(
        "event_type",
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.expr("unix_micros(ts) div 3600000000").alias("bk"),
    )
    from pyspark.sql import Window

    w_in = Window.partitionBy("event_type", "bk").orderBy("us", "event_id")
    in_pairs = (
        s.select(
            "event_type",
            "user_id",
            F.lag("user_id").over(w_in).alias("prev_u"),
        )
        .where(F.col("prev_u").isNotNull() & (F.col("prev_u") != F.col("user_id")))
        .select("event_type", F.col("user_id").alias("u"), F.col("prev_u").alias("v"))
    )
    ord_ = F.struct("us", "event_id")
    per_bucket = s.groupBy("event_type", "bk").agg(
        F.min_by("user_id", ord_).alias("first_u"),
        F.max_by("user_id", ord_).alias("last_u"),
    )
    w_b = Window.partitionBy("event_type").orderBy("bk")
    boundary = (
        per_bucket.select(
            "event_type",
            "first_u",
            F.lag("last_u").over(w_b).alias("prev_last"),
        )
        .where(
            F.col("prev_last").isNotNull()
            & (F.col("prev_last") != F.col("first_u"))
        )
        .select("event_type", F.col("first_u").alias("u"), F.col("prev_last").alias("v"))
    )
    edges = (
        in_pairs.unionAll(boundary)
        .select(
            "event_type",
            F.least("u", "v").alias("a"),
            F.greatest("u", "v").alias("b"),
        )
        .distinct()
        # edges is referenced ~6 times downstream (degrees, node/edge
        # counts, both orientation joins, the closing join); without
        # materialization Catalyst INLINES the whole
        # scan→window→union→distinct pipeline at every reference
        # (measured: 91 Exchanges / 111 Sorts in the executed plan, 8 s
        # fresh at sf0.1 → 7 Exchanges / 2.2 s with the checkpoint).
        # localCheckpoint is the l2e/l2f iterative-core pattern, already
        # whitelisted by the plan audit.
        .localCheckpoint(eager=True)
    )

    both_dirs = edges.select("event_type", F.col("a").alias("node")).unionAll(
        edges.select("event_type", F.col("b").alias("node"))
    )
    deg = both_dirs.groupBy("event_type", "node").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    nodes = deg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    ecnt = edges.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )

    da = deg.select(
        F.col("event_type").alias("et_a"),
        F.col("node").alias("a"),
        F.col("deg").alias("deg_a"),
    )
    db = deg.select(
        F.col("event_type").alias("et_b"),
        F.col("node").alias("b"),
        F.col("deg").alias("deg_b"),
    )
    ed = edges.join(
        da, (edges.event_type == da.et_a) & (edges.a == da.a)
    ).join(db, (edges.event_type == db.et_b) & (edges.b == db.b))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (edges.a < edges.b)
    )
    oriented = ed.select(
        edges.event_type.alias("et"),
        F.when(a_first, edges.a).otherwise(edges.b).alias("src"),
        F.when(a_first, edges.b).otherwise(edges.a).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dst_deg"),
    ).localCheckpoint(eager=True)  # referenced 3× (both wedge sides + closing)
    o1 = oriented.select(
        F.col("et").alias("w_et"),
        F.col("src").alias("w_src"),
        F.col("dst").alias("x"),
        F.col("dst_deg").alias("deg_x"),
    )
    o2 = oriented.select(
        F.col("et").alias("w_et2"),
        F.col("src").alias("w_src2"),
        F.col("dst").alias("y"),
        F.col("dst_deg").alias("deg_y"),
    )
    wedges = o1.join(
        o2,
        (F.col("w_et") == F.col("w_et2"))
        & (F.col("w_src") == F.col("w_src2"))
        & (
            (F.col("deg_x") < F.col("deg_y"))
            | ((F.col("deg_x") == F.col("deg_y")) & (F.col("x") < F.col("y")))
        ),
    ).select("w_et", "x", "y")
    closed = wedges.join(
        oriented,
        (F.col("w_et") == F.col("et"))
        & (F.col("x") == F.col("src"))
        & (F.col("y") == F.col("dst")),
    )
    tri = closed.groupBy(F.col("w_et").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    return (
        nodes.join(ecnt, "event_type")
        .join(tri, "event_type", "left")
        .select(
            "event_type",
            "n_nodes",
            "n_edges",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
        )
    )


G3_MAX_HOPS = 4

G3_ORACLE = f"""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT 'c' || c::VARCHAR AS src, 's' || s::VARCHAR AS dst FROM pairs
        UNION ALL
        SELECT 's' || s::VARCHAR, 'c' || c::VARCHAR FROM pairs
    ),
    seed AS (SELECT 'c' || min(c)::VARCHAR AS node FROM pairs),
    bfs(node, hops) AS (
        SELECT node, 0 FROM seed
        UNION
        SELECT e.dst, b.hops + 1
        FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.hops < {G3_MAX_HOPS}
    )
    SELECT node, CAST(min(hops) AS BIGINT) AS hops
    FROM bfs GROUP BY 1
"""


@register("g3_bfs_hops", family="G1", oracle=G3_ORACLE)
def g3_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first search over the customer↔supplier trade
    graph — the G family's third mechanism (g1 iterates a VALUE to a
    fixpoint, g2 self-joins a static edge set; this grows a FRONTIER):
    min-hop distance from the smallest trading customer to every node
    within {G3_MAX_HOPS} hops — the blast-radius / relationship-depth
    query behind supply-chain exposure and fraud-ring reach analyses.

    Frontier iteration, K fixed supersteps: frontier_k = (edges ⋈
    frontier_{{k-1}} on src) anti-joined against everything already
    visited, labeled hops = k — each node therefore carries its MINIMUM
    hop count, exactly the recursive-CTE oracle's min(hops) per reached
    node (the oracle's UNION-dedup BFS enumerates all ≤K-hop walks; the
    GROUP BY collapses them to the same min). Both the edge set and the
    accumulating visited set are eagerly localCheckpointed per
    superstep (the l2e/g2 discipline): edges are referenced K times and
    visited references would otherwise re-inline every prior union —
    plan depth and analysis time stay O(1) per superstep.

    Scale shape: each superstep is one equi-join keyed on node (keys
    grow with the corpus), one distinct, one anti-join — all
    hash-partitioned on the same key so the exchanges line up; frontier
    size is bounded by the graph, never the iteration count; no
    driver-side materialization (the seed is a broadcast 1-row min).
    K is fixed at plan time (the hash-checkable form — a run-to-fixpoint
    BFS terminates data-dependently, the same reason g1 fixes its
    superstep count)."""
    pairs = _trade_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .localCheckpoint(eager=True)
    )
    seed = pairs.agg(
        F.concat(F.lit("c"), F.min(F.expr("CAST(substring(c, 2) AS BIGINT)")).cast("string")).alias("node")
    ).select("node", F.lit(0).cast("bigint").alias("hops"))
    visited = seed.localCheckpoint(eager=True)
    frontier = visited
    for k in range(1, G3_MAX_HOPS + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("src")),
                "src",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(k).cast("bigint").alias("hops"))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select("node", "hops")


# g4: synchronous label propagation (Raghavan et al. 2007), 2 supersteps,
# deterministic tie-break. The per-node mode aggregate packs
# (count, label) into ONE BIGINT — score = cnt·ENC + (ENC−1−lbl) — so the
# superstep is a plain-long max (hash-aggregable inside codegen; struct
# max would leave it, the t30 lesson) and decodes exactly on both engines
# (all operands non-negative, so % and DIV agree).
G4_ENC = 1 << 31
G4_ITERS = 2

_G4_STEP = """
    SELECT node, {enc} - 1 - (max(score) % {enc}) AS lbl FROM (
        SELECT e.dst AS node,
               count(*) * {enc} + ({enc} - 1 - l.lbl) AS score
        FROM edges e JOIN {prev} l ON l.node = e.src
        GROUP BY e.dst, l.lbl
    ) GROUP BY node
"""

G4_ORACLE = f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT s * 2 + 1, c * 2 FROM pairs
    ),
    lbl0 AS (SELECT DISTINCT src AS node, CAST(src AS BIGINT) AS lbl FROM edges),
    lbl1 AS ({_G4_STEP.format(prev="lbl0", enc=G4_ENC)}),
    lbl2 AS ({_G4_STEP.format(prev="lbl1", enc=G4_ENC)})
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_node
    FROM lbl2 GROUP BY 1
"""


@register("g4_label_propagation", family="G1", oracle=G4_ORACLE)
def g4_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous LABEL PROPAGATION (Raghavan
    et al. 2007) over the customer↔supplier trade graph — the G
    family's fourth mechanism and a different superstep ALGEBRA from
    its siblings: g1 folds a SUM per superstep, g3 grows a frontier;
    LP needs a per-node MODE (most frequent neighbor label, ties to
    the smallest label). The mode is made hash-aggregable by packing
    (count, label) into one BIGINT — score = cnt·ENC + (ENC−1−lbl),
    ENC = 2³¹ — so each superstep is two growing-key hash aggs
    (neighbor-label counts keyed (node, lbl), then a plain-long max
    keyed node; struct max would fall out of codegen, the t30 lesson)
    and the decode ENC−1−(max % ENC) is exact on both engines (all
    operands non-negative, % ≡ DuckDB %, no sign splits). Two
    supersteps, unrolled as CTEs in the oracle — edge construction,
    label init, both propagation rounds and the community rollup all
    inside one driver hash check. Node encoding: custkey·2 /
    suppkey·2+1 (disjoint integer namespaces, no strings in any
    exchange).

    Output: per surviving community label, member count and min node —
    the summary a dedup/fraud pipeline consumes (label = cluster id).
    Sync LP on a bipartite graph oscillates rather than converges
    (known property); a production run adds more rounds or async
    updates — the MECHANISM (mode superstep) is what is verified, at
    the fixed superstep count that makes it hash-checkable (g1's
    argument).

    Scale shape: per superstep one edges⋈labels equi-join on node keys
    that grow with the corpus, one (node, lbl)-keyed count, one
    node-keyed max — all map-side combinable, no driver
    materialization; the label relation stays distributed. The score
    fits int64 while cnt·2³¹ < 2⁶³ (cnt < 2³² neighbors — beyond any
    real degree; Spark's ANSI mode raises rather than wraps past it)."""
    pairs = _trade_pairs_int(spark, sf_dir)
    edges = (
        pairs.select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .unionAll(
            pairs.select(
                (F.col("l_suppkey") * 2 + 1).alias("src"),
                (F.col("o_custkey") * 2).alias("dst"),
            )
        )
        .localCheckpoint(eager=True)
    )
    lbl = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").cast("bigint").alias("lbl")
    )
    for _ in range(G4_ITERS):
        scored = (
            edges.join(lbl, lbl.node == edges.src)
            .groupBy(F.col("dst"), F.col("lbl"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.col("cnt") * G4_ENC + (F.lit(G4_ENC - 1) - F.col("lbl"))
                ).alias("score"),
            )
        )
        lbl = scored.groupBy("node").agg(
            (F.lit(G4_ENC - 1) - F.max("score") % G4_ENC).cast("bigint").alias("lbl")
        )
    return lbl.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").cast("bigint").alias("min_node"),
    )
