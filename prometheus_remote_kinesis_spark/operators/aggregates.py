"""A-family: aggregations (SURVEY.md §2.4 A1-A7).

Metrics rollups are the canonical consumer of the reference's output stream
(README.rst:6). All aggregates are expressed with built-in functions so
Spark plans HashAggregate with partial (map-side) + final stages — the
shuffle moves pre-aggregated partials, not raw rows, which is what makes
these viable at 100 TB.

Hash-match conventions (see registry docstring): float aggregates rounded
identically on both sides; integer-sum oracles cast to BIGINT to match
Spark's long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


@register(
    "a1_pricing_summary",
    family="A1",
    bench=True,
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 4)                                        AS avg_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*), 4)                                             AS avg_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*), 6)                                             AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the engine's flagship batch agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        # exact sum ÷ count: 2-decimal source data can average to an
        # exact round-half boundary, where double accumulation order
        # (engine/partition dependent) flips the rounded cell — same
        # hazard observed on t5 at sf0.1. avg_qty is integer-valued, so
        # its double sum is already exact and order-independent.
        #
        # r13 (guide §1.2 step 2 — per-task work): the exact accumulator
        # is a LONG sum of cents, not a decimal(18,2) sum — the two
        # decimal buffers were 60% of a1's per-row compute (0.756 s →
        # 0.310 s without them at sf0.1). Equivalence to the oracle's
        # decimal sum: round(x*100) == cast(x as decimal(18,2))*100 on
        # every row of every SF (probed, 0 mismatches — both round the
        # shortest-repr double half-up), the cents sum is the identical
        # integer, and sum_cents/100.0 rounds the identical rational to
        # the identical double as decimal.doubleValue(). Overflow
        # envelope: cents sums stay exact to 9.2e18 — ~9e16 currency
        # units per group, ~20× the 100 TB-scale total — and ANSI mode
        # raises loudly rather than wrapping beyond that.
        F.round(
            (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / F.lit(100.0))
            / F.count(F.lit(1)),
            4,
        ).alias("avg_price"),
        F.round(
            (F.sum(F.round(F.col("l_discount") * 100).cast("long")) / F.lit(100.0))
            / F.count(F.lit(1)),
            6,
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "a2_series_cardinality",
    family="A2",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*)                AS n_events
        FROM events
        GROUP BY event_type
    """,
)
def a2_series_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series cardinality = distinct label-set count per metric name."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("a3_approx_cardinality", family="A3", oracle=None)
def a3_approx_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality sketch — THE way to count distinct at
    100 TB (exact count-distinct shuffles every key; HLL ships fixed-size
    sketches). rsd=1% — no SQL oracle (sketch output), rows-only check."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.approx_count_distinct("value", rsd=0.01).alias("approx_values"),
    )


@register("a3b_hll_mergeable_rollup", family="A3", oracle=None)
def a3b_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE cardinality rollup — the incremental 100 TB pattern
    ``a3`` can't do: build one Apache DataSketches HLL sketch per
    (event_type, day) partial (``hll_sketch_agg``), then union partials
    upward (``hll_union_agg``) instead of rescanning raw events. On a
    real pipeline the daily partials are persisted columns: day N+1
    touches only day N+1's raw data, and any rollup (week, month, all
    time, any event_type subset) is a cheap union of kilobyte sketches.
    Union-of-partials is bit-identical to a direct sketch over the whole
    range (pinned in ``test_hll_union_matches_direct``), so accuracy
    does not degrade with rollup depth. Sketch bytes are not
    SQL-expressible — rows-only gate; the rsd bound is pytest-pinned."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_union_agg("sketch").alias("merged"),
            F.count(F.lit(1)).alias("n_partials"),
        )
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").alias("est_users"),
            "n_partials",
        )
    )


@register(
    "a4_value_quantiles",
    family="A4",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.25), 4) AS p25,
               round(quantile_cont(value, 0.50), 4) AS p50,
               round(quantile_cont(value, 0.75), 4) AS p75,
               round(quantile_cont(value, 0.90), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events
        GROUP BY event_type
    """,
)
def a4_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-percentile-style quantiles. Spark ``percentile`` is the
    exact continuous-interpolation aggregate — semantically identical to
    DuckDB ``quantile_cont`` (SURVEY.md §7 watch list). At 100 TB swap to
    ``percentile_approx`` (a3-style sketch); exact here for oracle parity."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        *[
            F.round(F.percentile("value", p), 4).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.90, 0.99)
        ]
    )


@register(
    "a5_rollup_quantities",
    family="A5",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*)                  AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a5_rollup_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP with grouping-id disambiguation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a5b_cube_counts",
    family="A5",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a5b_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE (all 2^k grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "a6_extreme_orders",
    family="A6",
    oracle="""
        SELECT o_orderstatus,
               max({'o_totalprice': o_totalprice, 'o_orderkey': o_orderkey}).o_totalprice AS top_price,
               max({'o_totalprice': o_totalprice, 'o_orderkey': o_orderkey}).o_orderkey   AS top_orderkey,
               min({'o_orderdate': o_orderdate, 'o_orderkey': o_orderkey}).o_orderkey     AS first_orderkey,
               min(o_orderdate)                                                           AS first_date
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def a6_extreme_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min per group via lexicographic struct extrema.

    ``max(struct(price, key))`` is deterministic under price ties (the key
    breaks them) — unlike bare ``max_by``, which is tie-nondeterministic in
    both engines (the sf0.01 data does contain duplicate o_totalprice)."""
    orders = load_table(spark, sf_dir, "orders")
    top = F.max(F.struct("o_totalprice", "o_orderkey"))
    first = F.min(F.struct("o_orderdate", "o_orderkey"))
    return orders.groupBy("o_orderstatus").agg(
        top.getField("o_totalprice").alias("top_price"),
        top.getField("o_orderkey").alias("top_orderkey"),
        first.getField("o_orderkey").alias("first_orderkey"),
        F.min("o_orderdate").alias("first_date"),
    )


@register(
    "a7_event_type_sets",
    family="A7",
    oracle="""
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
               count(*) AS n_events
        FROM events
        GROUP BY user_id
    """,
)
def a7_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set re-aggregation (samples-per-series shape, SURVEY A7);
    serialized sorted so the hash comparison is order-stable."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "a1b_salted_skew_agg",
    family="A1",
    oracle="""
        SELECT event_type,
               count(*)                 AS n,
               round(sum(value), 2)     AS sum_value,
               round(max(value), 6)     AS max_value
        FROM events
        GROUP BY event_type
    """,
)
def a1b_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation — the skew pattern for hot grouping
    keys (SURVEY.md §4.1: one giant metric name → one reducer). Stage 1
    groups on (key, salt) so the hot key fans out over N_SALT reducers
    with map-side partial aggregation; stage 2 merges the N_SALT partials.
    Result is bit-identical to the plain groupBy (sums of sums, max of
    maxes, counts of counts), so the plain GROUP BY is the oracle.

    events.event_type has ~5 distinct values over the whole table — with
    plain groupBy at 100 TB, 5 reducers do all final aggregation; salting
    spreads each key over 16."""
    N_SALT = 16
    events = load_table(spark, sf_dir, "events")
    partial = (
        events.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALT)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("value").alias("psum"),
            F.max("value").alias("pmax"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum"), 2).alias("sum_value"),
        F.round(F.max("pmax"), 6).alias("max_value"),
    )


@register(
    "a8_pivot_user_type",
    family="A1/A5",
    oracle="""
        SELECT user_id,
               round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
               round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
               round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
               round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
               round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
        FROM events
        GROUP BY user_id
    """,
)
def a8_pivot_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user value totals, one column per event
    type. The value list is EXPLICIT — without it Spark runs an extra
    distinct-collect job over the full table to discover columns, which at
    100 TB is a second full scan before the real one. Catalyst rewrites
    the pivot to exactly the oracle's conditional-aggregation form (one
    pass, one shuffle), so groups never materialize wide rows early."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.round(F.sum("value"), 2))
    )


@register(
    "a5c_grouping_sets",
    family="A5",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*)                  AS n,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a5c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the DataFrame API (Spark 4
    ``DataFrame.groupingSets``) — the general form of which rollup (a5)
    and cube (a5b) are special cases. One Expand + one aggregation, not
    N unioned scans; sets that don't group a column emit NULL there,
    matching the SQL semantics on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [[F.col("l_returnflag")], [F.col("l_linestatus")], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
    )


_HIST_BOUNDS = (1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0)


@register(
    "a10_le_histogram",
    family="A1",
    oracle=f"""
        WITH b AS (SELECT unnest(CAST([{", ".join(str(b) for b in _HIST_BOUNDS)}]
                                      AS DOUBLE[])) AS le)
        SELECT event_type, le,
               CAST(sum(CASE WHEN value <= le THEN 1 ELSE 0 END) AS BIGINT)
                   AS cum_count
        FROM events CROSS JOIN b
        GROUP BY event_type, le
    """,
)
def a10_le_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus-native cumulative histogram: per metric name, the
    ``le``-bucket series (count of samples ≤ each boundary) that
    ``histogram_quantile`` consumes — the aggregation a remote-write
    consumer materializes to serve histogram queries downstream
    (record model: record.go:8-14).

    Planned as ONE hash aggregation: one conditional-sum column per
    boundary (all partial+final combinable map-side), exploded to the
    long ``(type, le, cum_count)`` shape only AFTER the aggregate — the
    shuffle carries |types| rows of 9 partial sums, never row×bucket
    pairs (the oracle's CROSS JOIN form, row×9 before the agg, is
    exactly the shape to avoid at scale). Counts are integers —
    engine-deterministic."""
    events = load_table(spark, sf_dir, "events")
    # parsed expressions: one Py4J round trip per bound instead of ~4
    # (r13 build diet; the SQL text parses to the identical Catalyst
    # sum(CAST(value <= <double-literal> AS BIGINT)) tree)
    per_type = events.groupBy("event_type").agg(
        *[
            F.expr(f"sum(CAST(value <= {b!r}D AS BIGINT)) AS c{i}")
            for i, b in enumerate(_HIST_BOUNDS)
        ]
    )
    pair_structs = ", ".join(
        f"struct({b!r}D AS le, c{i} AS c)" for i, b in enumerate(_HIST_BOUNDS)
    )
    return per_type.select(
        "event_type", F.expr(f"explode(array({pair_structs}))").alias("z")
    ).select(
        "event_type", F.col("z.le").alias("le"), F.col("z.c").alias("cum_count")
    )


_HQ_PHIS = (0.50, 0.90, 0.99)
_HQ_BOUNDS_SQL = f"[{', '.join(str(b) for b in _HIST_BOUNDS)}]"
_HQ_CUMS_SQL = ", ".join(
    f"sum(CASE WHEN value <= {b} THEN 1 ELSE 0 END)::BIGINT" for b in _HIST_BOUNDS
)


def _hq_quantile_sql(phi: float) -> str:
    """One PromQL-interpolated quantile as DuckDB SQL over (n, cums,
    bounds) — 1-indexed lists; idx0 = 0-based target-bucket index."""
    r = f"({phi} * n)"
    i = f"len(list_filter(cums, c -> c < {r}))"
    lower = f"(CASE WHEN {i} = 0 THEN 0.0 ELSE bounds[{i}] END)"
    cuml = f"(CASE WHEN {i} = 0 THEN 0 ELSE cums[{i}] END)"
    return f"""round(CASE WHEN {i} >= len(bounds) THEN bounds[len(bounds)]
        ELSE {lower} + (bounds[{i} + 1] - {lower}) * ({r} - {cuml})
             / (cums[{i} + 1] - {cuml}) END, 4)"""


@register(
    "a10b_histogram_quantile",
    family="A1",
    bench=True,
    oracle=f"""
        WITH w AS (
            SELECT event_type, count(*) AS n, [{_HQ_CUMS_SQL}] AS cums,
                   {_HQ_BOUNDS_SQL} AS bounds
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               {", ".join(f"{_hq_quantile_sql(p)} AS p{int(p * 100)}" for p in _HQ_PHIS)}
        FROM w
    """,
)
def a10b_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_quantile(φ, ...)`` over a10's le-bucket
    cumulative counts: find the bucket where cumulative count reaches
    φ·total, linearly interpolate inside it (lower bound 0 for the first
    bucket, exactly Prometheus's rule); a φ landing past the last finite
    bucket returns that bucket's bound, matching Prometheus's +Inf-bucket
    behavior for these bounds.

    Same ONE-hash-aggregation plan as a10 — the shuffle carries |types|
    rows of 9 integer partials — then the quantile search is pure array
    expressions on the wide row (``filter``/``get`` higher-order fns, no
    second shuffle, no explode, no UDF). Deterministic across engines:
    bucket counts are integers, φ·n and the interpolation are written as
    the identical double expression on both sides."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(f"sum(CAST(value <= {b!r}D AS BIGINT)) AS c{i}")
            for i, b in enumerate(_HIST_BOUNDS)
        ],
    )
    # whole quantile expression as ONE parsed string per φ (r13 build
    # diet: the Column form cost ~25 Py4J round trips per quantile —
    # higher-order lambdas are the worst offenders). The SQL text mirrors
    # the Column algebra node for node: same filter/get/coalesce calls,
    # same double literals (repr() is shortest-roundtrip exact), same
    # left-associated * / interpolation arithmetic — bit-identical.
    cums = f"array({', '.join(f'c{i}' for i in range(len(_HIST_BOUNDS)))})"
    bounds = f"array({', '.join(repr(b) + 'D' for b in _HIST_BOUNDS)})"

    def quantile(phi: float) -> str:
        rank = f"({phi!r}D * n)"
        idx = f"size(filter({cums}, c -> c < {rank}))"  # 0-based target
        lower = f"coalesce(get({bounds}, {idx} - 1), 0.0D)"
        cum_lower = f"CAST(coalesce(get({cums}, {idx} - 1), 0) AS DOUBLE)"
        upper = f"get({bounds}, {idx})"
        cum_upper = f"CAST(get({cums}, {idx}) AS DOUBLE)"
        return (
            f"round(CASE WHEN {idx} >= size({bounds}) "
            f"THEN element_at({bounds}, -1) "
            f"ELSE {lower} + ({upper} - {lower}) * ({rank} - {cum_lower}) "
            f"/ ({cum_upper} - {cum_lower}) END, 4)"
        )

    return per_type.select(
        "event_type",
        *[
            F.expr(f"{quantile(p)} AS p{int(p * 100)}")
            for p in _HQ_PHIS
        ],
    )


@register(
    "a11_zscore_anomalies",
    family="A1",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)       AS sv,
                   CAST(sum(CAST(value * value AS DECIMAL(24,8))) AS DOUBLE) AS sv2
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               round((value - sv / n)
                     / sqrt((sv2 - sv * sv / n) / (n - 1)), 4) AS z,
               abs((value - sv / n)
                   / sqrt((sv2 - sv * sv / n) / (n - 1))) > 3  AS is_anomaly
        FROM events e JOIN s ON e.event_type = s.event_type
    """,
)
def a11_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score per sample against its metric's corpus moments —
    the basic anomaly-detection pass over a metrics stream (|z| > 3 flags
    outliers). Planned as aggregate-then-BROADCAST-join, NOT a window
    over the low-cardinality metric name (that shape serializes whole
    series on single tasks — the w3/w3b lesson): one partial+final hash
    agg to |types| rows of moments, broadcast back over the fact scan,
    per-row arithmetic only after that.

    Engine determinism: both moments are decimal-exact sums (values are
    2-decimal quantized, squares 4-decimal), so mean/std derive from
    identical aggregates on both engines and the z expression is per-row
    IEEE ops — no accumulation-order hazard (u2's applyInPandas z-score
    is the per-GROUP windowed variant; this is the corpus-moment one)."""
    events = load_table(spark, sf_dir, "events")
    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sv"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(24,8)"))
        .cast("double")
        .alias("sv2"),
    )
    z = (F.col("value") - F.col("sv") / F.col("n")) / F.sqrt(
        (F.col("sv2") - F.col("sv") * F.col("sv") / F.col("n")) / (F.col("n") - 1)
    )
    return events.join(F.broadcast(s), "event_type").select(
        "event_id",
        "event_type",
        F.round(z, 4).alias("z"),
        (F.abs(z) > 3).alias("is_anomaly"),
    )


@register("a4b_approx_quantiles", family="A4", oracle=None)
def a4b_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path a4's docstring promises:
    ``percentile_approx`` (Greenwald-Khanna sketch, fixed-size state,
    mergeable map-side — exact percentile sorts every group's values).
    No SQL oracle (sketch-dependent); accuracy vs the exact a4 answer is
    asserted in tests/test_operators.py."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        *[
            F.percentile_approx("value", p, 10000).alias(f"p{int(p * 100)}")
            for p in (0.50, 0.90, 0.99)
        ]
    )


A12_ORACLE = """
    SELECT token, count(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 20
"""


@register("a12_heavy_hitters_mg", family="A12", oracle=A12_ORACLE)
def a12_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k heavy hitters by the two-phase sketch pattern: a
    per-partition Misra-Gries summary (``mapInPandas``, K counters, O(K)
    memory regardless of partition size) emits a tiny candidate set, and a
    second exact pass counts ONLY the candidates (broadcast semi join on
    the exploded tokens).

    Pigeonhole guarantee: any token with global frequency > N/(K+1)
    exceeds the local threshold n_p/(K+1) in at least one partition, so it
    survives some partition's summary — with K=200 candidates the exact
    top-20 is provably inside the candidate union whenever the 20th item
    holds > 0.5% of total mass. At 100 TB the first pass is map-only
    (no shuffle of token instances); only candidate names cross the wire,
    and the second pass's shuffle carries (token, partial-count) pairs
    pre-filtered to ~K distinct keys. The driver's oracle is the plain
    exact GROUP BY — the sketch path must reproduce it bit-for-bit.
    """
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    k = 200

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                if not isinstance(text, str):
                    continue  # NULL text rows contribute no tokens, like
                    # the exact pass's explode(split(NULL)) → zero rows
                for tok in text.split(" "):
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:
                        # decrement-all step; drop zeroed counters
                        for key in list(counters):
                            counters[key] -= 1
                            if counters[key] == 0:
                                del counters[key]
        yield pd.DataFrame({"token": list(counters)})

    candidates = (
        docs.select("text").mapInPandas(mg_partition, "token string").distinct()
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(20)
    )


@register(
    "a2b_distinct_two_phase",
    family="A2",
    oracle="""
        SELECT event_type, count(*) AS n_users
        FROM (SELECT DISTINCT event_type, user_id FROM events)
        GROUP BY event_type
    """,
)
def a2b_distinct_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count by explicit two-phase re-aggregation:
    dropDuplicates on (key, value) — a partial-deduping hash aggregate —
    then a plain count per key. Same answer as a2's ``countDistinct``,
    different physical shape: countDistinct plans a single aggregate that
    must hold each key's full distinct set per task, while this form dedups
    map-side FIRST so the shuffle carries unique (key, value) pairs and
    the final count never materializes a set — the formulation that
    survives a key with a hundred million distinct values at 100 TB
    (a3's HLL is the approximate sibling when exactness is negotiable)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_type", "user_id")
        .dropDuplicates()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


A13_ORACLE = """
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events
        GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS modal_type, n AS n_events
    FROM (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM counts
    ) WHERE rn = 1
"""


@register("a13_mode_per_group", family="A13", oracle=A13_ORACLE)
def a13_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value, ties broken by
    value): two-level shape — count per (group, value), then top-1 per
    group via a WindowGroupLimit-prunable row_number. Never a
    collect+sort: the first aggregate collapses to ≤ |values| rows per
    group before the rank, so the shuffle carries counts, not events.
    (Both engines' native ``mode()`` is tie-nondeterministic — the
    explicit form is what a reproducible pipeline should run.)"""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), F.col("n").alias("n_events"))
    )


@register(
    "a2c_bitmap_distinct",
    family="A2",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
    """,
)
def a2c_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count via BITMAP aggregation (Spark 3.5+
    ``bitmap_construct_agg``): each value sets one bit, partial bitmaps
    OR-merge map-side, and ``bitmap_count`` reads the cardinality — the
    roaring-bitmap-style exact-distinct path for bounded integer domains
    (user ids, shard ids). Memory is O(domain/8) bytes per group
    regardless of row count — between a2b's shuffle-the-distinct-pairs
    (unbounded domains) and a3's HLL (approximate): at 100 TB with int
    keys this is usually the cheapest EXACT form. ``bitmap_bit_position``
    is 1-based (value 0 maps to position -1 and silently drops — found by
    the oracle, 149 vs 150), so the key shifts by +1. Each bitmap covers
    a 32768-wide slice of the domain, so the first groupBy ALSO keys on
    ``bitmap_bucket_number`` — one bitmap per (group, 32k-slice) — and a
    second aggregate sums the per-bucket cardinalities. Without the
    bucket key, any id ≥ 32768 wraps modulo 32768 into a lower bit and
    silently undercounts; with it, the domain is unbounded and the inner
    shuffle carries ≤ one 4 KB bitmap per slice instead of raw pairs.
    Oracle is the plain COUNT(DISTINCT)."""
    events = load_table(spark, sf_dir, "events")
    per_bucket = events.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id") + 1).alias("bucket"),
    ).agg(
        F.bitmap_count(
            F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id") + 1))
        ).alias("bucket_users")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("bucket_users").alias("n_users")
    )


# a3c: KMV parameters. K=64 < the ~140 distinct users per type at
# sf0.01 (estimate branch exercised) while small smoke corpora fall
# below K (exact-fallback branch exercised); 14 hex chars = 56 bits
# keeps (K-1)·2^56 = 4.5e18 inside BIGINT.
KMV_K = 64
KMV_BITS = 56
KMV_BANDS = 32


A3C_ORACLE = f"""
        WITH dh AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                           1, {KMV_BITS // 4})) AS BIGINT) AS h
            FROM events WHERE user_id IS NOT NULL
        ),
        ranked AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM dh
        ),
        kth AS (
            SELECT event_type, max(h) AS h_k,
                   CAST(count(*) AS BIGINT) AS k_actual
            FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
        ),
        ex AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_distinct
            FROM dh GROUP BY event_type
        )
        SELECT e.event_type, e.n_distinct, k.k_actual, k.h_k,
               CASE WHEN k.k_actual < {KMV_K} THEN e.n_distinct
                    ELSE CAST(({KMV_K - 1} * {2**KMV_BITS}) // k.h_k AS BIGINT)
               END AS kmv_estimate
        FROM ex e JOIN kth k USING (event_type)
"""


def kmv_hash(col: Column) -> Column:
    """56-bit positive BIGINT from the md5 of a column's string form —
    the deterministic KMV hash both engines compute identically."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, KMV_BITS // 4), 16, 10
    ).cast("long")


def kmv_summary(dh: DataFrame) -> DataFrame:
    """a3c's sketch tail over a DISTINCT (event_type, h) relation —
    shared by batch a3c and the streaming twin a3cs (which drains the
    distinct set from a complete-mode agg first). Banded two-phase
    top-K, then the exact-BIGINT estimate with exact-count fallback."""
    from pyspark.sql import Window

    banded = dh.withColumn("band", F.pmod(F.col("h"), F.lit(KMV_BANDS)))
    w_band = Window.partitionBy("event_type", "band").orderBy("h")
    cand = (
        banded.withColumn("rn", F.row_number().over(w_band))
        .where(F.col("rn") <= KMV_K)
        .drop("rn", "band")
    )
    w_type = Window.partitionBy("event_type").orderBy("h")
    top = cand.withColumn("rn", F.row_number().over(w_type)).where(
        F.col("rn") <= KMV_K
    )
    # The key is RENAMED (fresh exprId) on the kth side: both aggregates
    # descend from the same `dh`, and when dh is a drained memory-sink
    # table (a3cs) the analyzer cannot dedup the conflicting references
    # a plain self-join would carry.
    kth = top.groupBy(F.col("event_type").alias("kth_type")).agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("k_actual"),
    )
    ex = dh.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct")
    )
    est = F.when(F.col("k_actual") < KMV_K, F.col("n_distinct")).otherwise(
        F.expr(f"CAST(({KMV_K - 1} * {2**KMV_BITS}) DIV h_k AS BIGINT)")
    )
    return ex.join(
        kth, F.col("event_type") == F.col("kth_type")
    ).select(
        "event_type",
        "n_distinct",
        "k_actual",
        "h_k",
        est.alias("kmv_estimate"),
    )


@register("a3c_kmv_distinct", family="A3", oracle=A3C_ORACLE)
def a3c_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed approximate distinct — the A3 sketch family's first
    HASH-VERIFIED member. a3/a3b use HLL, whose register layout is
    engine-private (rows-only by design); KMV (k-minimum-values, the
    bottom-k sketch of Bar-Yossef et al. 2002) is DETERMINISTIC given the
    hash function, and with md5 both engines compute the identical
    sketch: per event_type, keep the K smallest distinct 56-bit hash
    values of user_id and estimate distinct-count as (K−1)·2⁵⁶ ÷ h_K
    (integer division of exact BIGINTs — positive, so Spark's DIV
    truncation and DuckDB's // floor agree). Below K distinct values the
    sketch IS the exact set and the estimate falls back to the exact
    count — both branches exercised across verification SFs (~140
    distinct users/type at sf0.01 vs K=64; smoke corpora sit below K).
    The estimate lands within KMV's 1/√K ≈ 12.5% envelope (sanity-pinned
    in tests); correctness is the sketch itself, hash-checked cell by
    cell (h_k, k_actual, estimate, exact).

    Scale shape: one digest-only distinct shuffle on (type, h) — user_id
    never re-shuffles raw — then the w1c BANDED top-K: row_number inside
    (type, h mod {KMV_BANDS}) bands (parallelism = types×bands, each
    band sorts |distinct|/bands rows), and the final per-type window
    sees only bands×K ≈ {KMV_BANDS * KMV_K} candidate rows — the
    K smallest of a union are among each band's K smallest, so the
    two-phase top-K is exact by construction. KMV partials are also
    MERGEABLE (union two sketches = K smallest of the concatenation),
    the property that lets a 1000-executor rollup combine per-partition
    sketches without a raw rescan — a3b's pattern, here with a
    cross-engine-checkable sketch."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    dh = events.select(
        "event_type", kmv_hash(F.col("user_id")).alias("h")
    ).distinct()
    return kmv_summary(dh)


CMS_DEPTH = 4
CMS_WIDTH = 64

A14_ORACLE = f"""
    WITH ev AS (
        SELECT user_id FROM events WHERE user_id IS NOT NULL
    ),
    cells AS (
        SELECT d.i,
               ('0x' || substring(
                    md5(user_id::VARCHAR || ':' || d.i::VARCHAR), 1, 15
                ))::BIGINT % {CMS_WIDTH} AS bucket,
               CAST(count(*) AS BIGINT) AS c
        FROM ev, LATERAL unnest(range(0, {CMS_DEPTH})) AS d(i)
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM ev GROUP BY 1
    ),
    probes AS (
        SELECT e.user_id, e.n_exact, d.i,
               ('0x' || substring(
                    md5(e.user_id::VARCHAR || ':' || d.i::VARCHAR), 1, 15
                ))::BIGINT % {CMS_WIDTH} AS bucket
        FROM exact e, LATERAL unnest(range(0, {CMS_DEPTH})) AS d(i)
    )
    SELECT p.user_id, p.n_exact,
           CAST(min(c.c) AS BIGINT) AS cms_est,
           CAST(min(c.c) - p.n_exact AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON c.i = p.i AND c.bucket = p.bucket
    GROUP BY 1, 2
"""


@register("a14_count_min_sketch", family="A12", oracle=A14_ORACLE)
def a14_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over user_id
    frequencies, HASH-VERIFIED end to end — the frequency-sketch sibling
    of a12's exact Misra-Gries and a3c's KMV cardinality sketch. Depth
    4 × width 64 counters build with the l2h
    cross-engine md5 hash family (Spark ``conv(substring(md5(...)))`` ≡
    DuckDB ``('0x'||substring(md5(...)))::BIGINT``, probed bit-equal;
    both inputs non-negative so ``%`` agrees), then every distinct user
    probes its 4 cells and takes the min — emitted next to the
    exact count so the CMS ε-overcount guarantee (est ≥ exact, always)
    is itself part of the hashed result.

    Scale shape — the "sketch small enough to broadcast" pattern: the
    cell build is ONE map-side-combined hash agg onto d×w = 4×64
    cells (mergeable partials, the definition of CMS mergeability), the
    probe side joins user aggregates to the {CMS_DEPTH}·{CMS_WIDTH}-row cell relation
    via an explicit broadcast (no shuffle of the big side beyond its own
    count agg), and nothing anywhere is proportional to stream length —
    at 100 TB the sketch is still 256 integers per executor partial.

    No reference counterpart (the relay holds no aggregates); Layer-B
    addition in the a3/a12 sketch family."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    depth = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("i")

    def bucket(user: Column, i: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(user.cast("string"), F.lit(":"), i.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return h % CMS_WIDTH

    cells = (
        events.select(F.col("user_id"), depth)
        .select("i", bucket(F.col("user_id"), F.col("i")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    exact = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    probes = exact.select("user_id", "n_exact", depth).select(
        "user_id",
        "n_exact",
        "i",
        bucket(F.col("user_id"), F.col("i")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(
            F.min("c").cast("bigint").alias("cms_est"),
            (F.min("c") - F.col("n_exact")).cast("bigint").alias("overcount"),
        )
    )


A3D_ORACLE = f"""
    WITH dh AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                       1, {KMV_BITS // 4})) AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    tps AS (SELECT DISTINCT event_type FROM dh),
    prs AS (
        SELECT t1.event_type AS ta, t2.event_type AS tb
        FROM tps t1 JOIN tps t2 ON t1.event_type < t2.event_type
    ),
    ph AS (
        SELECT p.ta, p.tb, d.h,
               max(CASE WHEN d.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN d.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
        FROM prs p JOIN dh d ON d.event_type IN (p.ta, p.tb)
        GROUP BY 1, 2, 3
    ),
    ranked AS (
        SELECT ta, tb, h, in_a, in_b,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM ph
    ),
    topk AS (
        SELECT ta, tb, max(h) AS h_k,
               CAST(count(*) AS BIGINT) AS k_actual,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS shared_topk
        FROM ranked WHERE rn <= {KMV_K} GROUP BY 1, 2
    ),
    ex AS (
        SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_union,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inter
        FROM ph GROUP BY 1, 2
    ),
    est AS (
        SELECT e.ta, e.tb, e.n_union, e.n_inter, t.k_actual, t.h_k,
               t.shared_topk,
               CASE WHEN t.k_actual < {KMV_K} THEN e.n_union
                    ELSE CAST(({KMV_K - 1} * {2**KMV_BITS}) // t.h_k AS BIGINT)
               END AS union_est
        FROM ex e JOIN topk t ON t.ta = e.ta AND t.tb = e.tb
    )
    SELECT ta, tb, n_union, n_inter, k_actual, h_k, union_est,
           CASE WHEN k_actual < {KMV_K} THEN n_inter
                ELSE CAST((shared_topk * union_est) // {KMV_K} AS BIGINT)
           END AS inter_est
    FROM est
"""


@register("a3d_kmv_set_ops", family="A3", oracle=A3D_ORACLE)
def a3d_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — union and intersection cardinality
    estimates for every event_type pair from their bottom-k hash
    sketches (Beyer et al., SIGMOD 2007: "On synopses for distinct-value
    estimation under multiset operations", public paper) — the audience-
    overlap / segment-intersection question ("how many users do types X
    and Y share?") that exact distinct-counting answers only with a full
    re-scan per pair, but the ALREADY-BUILT per-type sketches answer in
    O(K) per pair: union sketch = bottom-k of the merged hash sets,
    D_∪ = (K−1)·2⁵⁶ ÷ h_K; intersection via the Jaccard fraction of the
    union's bottom-k that lands in both sets, D_∩ = (shared·D_∪) ÷ K.
    Exact fallback below K distinct keys; both exact counts ship
    alongside so the driver hash also pins the estimates' ground truth.

    Everything is deterministic integer arithmetic on the shared md5
    56-bit hash (a3c's convention) — both engines compute the identical
    sketch, estimates included, so the sketch MATH (not just the
    plumbing) is hash-verified: k_actual, h_k, the floor divisions, and
    the shared-membership count all participate.

    Scale shape: per-pair distinct hashes come from ONE hash agg keyed
    on (pair, h) — key count grows with the corpus — after an equi-join
    against the broadcast 2|pairs|-row membership relation (the OR-join
    / IN-join alternative would be a nested loop; the oracle can afford
    it at sf0.01, the Spark plan cannot at 100 TB). The bottom-k is the
    a3c banded two-phase top-K: per (pair, h mod 32) band first, so the
    final per-pair window sees at most 32·K = 2048 candidate rows —
    bounded by the sketch, never the data. |pairs| is |types|²/2 — for
    wide type spaces you'd cap to the pairs a dashboard actually
    queries; every shuffle carries digests only."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    dh = events.select(
        "event_type", kmv_hash(F.col("user_id")).alias("h")
    ).distinct()
    return kmv_pair_summary(dh)


def kmv_pair_summary(dh: DataFrame) -> DataFrame:
    """a3d's set-algebra tail over a DISTINCT (event_type, h) relation —
    shared by batch a3d and the streaming twin a3ds (which drains the
    distinct set from a complete-mode agg first, the a3c/a3cs split)."""
    from pyspark.sql import Window

    tps = dh.select("event_type").distinct()
    t1 = tps.select(F.col("event_type").alias("ta"))
    t2 = tps.select(F.col("event_type").alias("tb"))
    prs = t1.join(t2, F.col("ta") < F.col("tb"))
    members = prs.select("ta", "tb", F.col("ta").alias("mtype")).unionAll(
        prs.select("ta", "tb", F.col("tb").alias("mtype"))
    )
    ph = (
        dh.join(F.broadcast(members), dh.event_type == members.mtype)
        .groupBy("ta", "tb", "h")
        .agg(
            F.max((F.col("event_type") == F.col("ta")).cast("int")).alias("in_a"),
            F.max((F.col("event_type") == F.col("tb")).cast("int")).alias("in_b"),
        )
    )
    banded = ph.withColumn("band", F.pmod(F.col("h"), F.lit(KMV_BANDS)))
    w_band = Window.partitionBy("ta", "tb", "band").orderBy("h")
    cand = (
        banded.withColumn("rn", F.row_number().over(w_band))
        .where(F.col("rn") <= KMV_K)
        .drop("rn", "band")
    )
    w_pair = Window.partitionBy("ta", "tb").orderBy("h")
    top = cand.withColumn("rn", F.row_number().over(w_pair)).where(
        F.col("rn") <= KMV_K
    )
    topk = top.groupBy(F.col("ta").alias("ka"), F.col("tb").alias("kb")).agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("k_actual"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("shared_topk"),
    )
    ex = ph.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_inter"),
    )
    est = ex.join(
        topk, (F.col("ta") == F.col("ka")) & (F.col("tb") == F.col("kb"))
    ).select(
        "ta",
        "tb",
        "n_union",
        "n_inter",
        "k_actual",
        "h_k",
        "shared_topk",
        F.when(F.col("k_actual") < KMV_K, F.col("n_union"))
        .otherwise(
            F.expr(f"CAST(({KMV_K - 1} * {2**KMV_BITS}) DIV h_k AS BIGINT)")
        )
        .alias("union_est"),
    )
    return est.select(
        "ta",
        "tb",
        "n_union",
        "n_inter",
        "k_actual",
        "h_k",
        "union_est",
        F.when(F.col("k_actual") < KMV_K, F.col("n_inter"))
        .otherwise(
            F.expr(f"CAST((shared_topk * union_est) DIV {KMV_K} AS BIGINT)")
        )
        .alias("inter_est"),
    )


A10C_RANGES = ((0.5, 250.0), (5.0, 50.0), (10.0, 100.0))


def _hf_est_sql(x: float) -> str:
    """Closed-form SQL for Prometheus's interpolated rank-at-value
    est_le(x) over the c0..c8 cumulative columns — the bucket containing
    the LITERAL x is resolved at build time (bisect over _HIST_BOUNDS),
    so no runtime array search exists on either engine."""
    import bisect

    i = bisect.bisect_left(_HIST_BOUNDS, x)
    if i >= len(_HIST_BOUNDS):
        return "CAST(n AS DOUBLE)"
    lo_b = 0.0 if i == 0 else _HIST_BOUNDS[i - 1]
    lo_c = "0" if i == 0 else f"c{i - 1}"
    return (
        f"({lo_c} + (c{i} - {lo_c}) * ({x!r} - {lo_b!r})"
        f" / ({_HIST_BOUNDS[i]!r} - {lo_b!r}))"
    )


def _hf_frac_sql(lo: float, hi: float) -> str:
    # floor-truncation (the f8 tie-free rule): the quotient is an
    # arbitrary double, round() could split a half-way tie
    return (
        f"floor((({_hf_est_sql(hi)}) - ({_hf_est_sql(lo)})) / n * 1e6) / 1e6"
    )


def _hf_alias(lo: float, hi: float) -> str:
    return f"frac_{str(lo).replace('.', 'p')}_{str(hi).replace('.', 'p')}"


A10C_ORACLE = f"""
    WITH w AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               {", ".join(f"sum(CASE WHEN value <= {b} THEN 1 ELSE 0 END)::BIGINT AS c{i}" for i, b in enumerate(_HIST_BOUNDS))}
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           {", ".join(f"{_hf_frac_sql(lo, hi)} AS {_hf_alias(lo, hi)}" for lo, hi in A10C_RANGES)}
    FROM w
"""


@register("a10c_histogram_fraction", family="A10", oracle=A10C_ORACLE)
def a10c_histogram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_fraction(lower, upper, h)`` over a10's
    le-bucket cumulative counts — the SLO question histogram_quantile
    can't answer directly ("what fraction of requests landed in
    (5, 50]?"): estimate rank-at-value by linear interpolation inside
    the bucket containing each LITERAL endpoint (first bucket
    interpolates from 0, Prometheus's classic-histogram rule; an
    endpoint past the last bound saturates at n), then
    fraction = (est_le(upper) − est_le(lower)) / n.

    Because the endpoints are literals, the containing bucket is
    resolved at BUILD time (a Python bisect emits the closed-form
    expression) — no runtime array search on either engine, and an
    endpoint landing exactly ON a bound folds to the bare cumulative
    count (est_le(5) ≡ c2), which the (5, 50] range exercises; the
    (0.5, 250] range exercises both the first-bucket-from-0 branch and
    a mid-bucket interpolation. Fractions are floor-truncated at 1e-6
    (the f8 tie-free rule: both engines hold the identical IEEE
    quotient; round() could split a half-way tie).

    Scale shape: the SAME one-hash-aggregation plan as a10/a10b — the
    shuffle carries |types| rows of 9 integer partials + n, every
    fraction is a scalar expression on the wide row; no explode, no
    second shuffle, no UDF."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum((F.col("value") <= b).cast("long")).alias(f"c{i}")
            for i, b in enumerate(_HIST_BOUNDS)
        ],
    )
    return per_type.select(
        "event_type",
        "n",
        *[
            F.expr(_hf_frac_sql(lo, hi)).alias(_hf_alias(lo, hi))
            for lo, hi in A10C_RANGES
        ],
    )


# a10d: bucket midpoints in HALF-UNITS so every per-bucket sum is an
# exact integer on both engines: bucket i spans (bound[i-1], bound[i]],
# midpoint = (lo+hi)/2, first bucket interpolates from 0 (the a10b
# Prometheus rule), the overflow bucket (> last bound) is represented
# by the last finite bound itself (Prometheus's +Inf convention in
# histogram_quantile, applied to the moment estimate).
A10D_MID2 = tuple(
    int(_HIST_BOUNDS[i] + (_HIST_BOUNDS[i - 1] if i else 0.0))
    for i in range(len(_HIST_BOUNDS))
) + (int(2 * _HIST_BOUNDS[-1]),)


def _a10d_bucket_case(i: int) -> str:
    """DuckDB per-row bucket count for bucket i (0-based; last = overflow)."""
    if i == 0:
        return f"CASE WHEN value <= {_HIST_BOUNDS[0]} THEN 1 ELSE 0 END"
    if i == len(_HIST_BOUNDS):
        return f"CASE WHEN value > {_HIST_BOUNDS[-1]} THEN 1 ELSE 0 END"
    return (
        f"CASE WHEN value > {_HIST_BOUNDS[i - 1]} AND value <= {_HIST_BOUNDS[i]}"
        " THEN 1 ELSE 0 END"
    )


A10D_ORACLE = f"""
    WITH w AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               {", ".join(f"CAST(sum({_a10d_bucket_case(i)} * {m}) AS BIGINT) AS s1_{i}" for i, m in enumerate(A10D_MID2))},
               {", ".join(f"CAST(sum({_a10d_bucket_case(i)} * {m * m}) AS BIGINT) AS s2_{i}" for i, m in enumerate(A10D_MID2))}
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    ),
    m AS (
        SELECT event_type, n,
               CAST({" + ".join(f"s1_{i}" for i in range(len(A10D_MID2)))} AS BIGINT) AS s1,
               CAST({" + ".join(f"s2_{i}" for i in range(len(A10D_MID2)))} AS BIGINT) AS s2
        FROM w
    )
    SELECT event_type, n,
           floor(CAST(s1 AS DOUBLE) / (2 * n) * 1e6) / 1e6 AS est_avg,
           floor(sqrt(CAST(s2 AS DOUBLE) / (4 * n)
                      - (CAST(s1 AS DOUBLE) / (2 * n))
                        * (CAST(s1 AS DOUBLE) / (2 * n))) * 1e6) / 1e6
               AS est_stddev
    FROM m
"""


@register("a10d_histogram_stddev", family="A10", oracle=A10D_ORACLE)
def a10d_histogram_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_avg`` / ``histogram_stddev`` estimated from
    classic le-bucket counts — the moment estimates a monitoring
    backend serves when only bucketed data survives downsampling: each
    sample is represented by its bucket's midpoint ((lo+hi)/2; the
    first bucket interpolates from 0 per the a10b Prometheus rule, the
    overflow bucket by the last finite bound, Prometheus's +Inf
    convention), then avg = Σc·mid / n and
    stddev = sqrt(Σc·mid²/n − avg²).

    Cross-engine exactness: midpoints are carried in HALF-UNITS
    (A10D_MID2 — all integers for these bounds), so Σc·mid2 and
    Σc·mid2² are exact BIGINTs on both engines regardless of
    accumulation order; the conversion to double happens ONCE per
    moment with the identical expression tree (s1/2n, s2/4n − avg²),
    and outputs floor-truncate at 1e-6 (the f8 tie-free rule). NULL
    metric values (staleness markers) are excluded identically on both
    sides.

    Scale shape: the a10/a10b/a10c envelope — ONE hash aggregation
    whose shuffle carries |types| rows of (n, s1, s2) integer partials
    (map-side combinable); the moments are scalar expressions on the
    wide row. No explode, no second shuffle, no UDF."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    v = F.col("value")
    mid2 = F.when(v <= _HIST_BOUNDS[0], F.lit(A10D_MID2[0]))
    for i in range(1, len(_HIST_BOUNDS)):
        mid2 = mid2.when(
            (v > _HIST_BOUNDS[i - 1]) & (v <= _HIST_BOUNDS[i]),
            F.lit(A10D_MID2[i]),
        )
    mid2 = mid2.otherwise(F.lit(A10D_MID2[-1]))
    per_type = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(mid2).cast("bigint").alias("s1"),
        F.sum(mid2 * mid2).cast("bigint").alias("s2"),
    )
    avg = F.col("s1").cast("double") / (2 * F.col("n"))
    return per_type.select(
        "event_type",
        "n",
        F.floor(avg * 1e6) / 1e6,
        (
            F.floor(
                F.sqrt(F.col("s2").cast("double") / (4 * F.col("n")) - avg * avg)
                * 1e6
            )
            / 1e6
        ),
    ).toDF("event_type", "n", "est_avg", "est_stddev")


T36_WINDOW_MS = 300_000  # 5-minute dashboard step

T36_ORACLE = f"""
    WITH w AS (
        SELECT event_type,
               epoch_us(ts) // {T36_WINDOW_MS * 1000} AS win_idx,
               count(*) AS n, [{_HQ_CUMS_SQL}] AS cums,
               {_HQ_BOUNDS_SQL} AS bounds
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(win_idx AS BIGINT) AS win_idx,
           CAST(n AS BIGINT) AS n,
           {", ".join(f"{_hq_quantile_sql(p)} AS p{int(p * 100)}" for p in _HQ_PHIS)}
    FROM w
"""


@register("t36_histogram_quantile_windowed", family="A10", oracle=T36_ORACLE)
def t36_histogram_quantile_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``histogram_quantile(φ, rate(bucket[5m]))`` — THE dashboard
    idiom (a p99-over-time panel): a10b's bucket-interpolated quantiles
    computed per (series, 5-minute window) instead of once per series.
    Over a 5-minute-aligned grid the windowed rate of a cumulative
    bucket counter reduces exactly to the per-window bucket COUNTS
    (increase = count of samples ≤ le inside the window), so the
    integer-exact a10 machinery applies per cell and the interpolation
    expressions are a10b's verbatim — same Prometheus first-bucket /
    +Inf conventions, same cross-engine determinism argument (integer
    counts, identical double expression trees).

    Scale shape: the a10 one-hash-agg envelope with the key widened to
    (type, window) — key count GROWS with retention (the w3b axis, not
    the w3 disease: parallelism scales with data), shuffle carries 10
    integer partials per cell, quantile search stays scalar expressions
    on the wide row. Window index is an integer epoch division (dq2
    rule — no engine date types in the hash)."""
    events = load_table(spark, sf_dir, "events")
    per_cell = events.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {T36_WINDOW_MS * 1000}")
        .cast("bigint")
        .alias("win_idx"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("value") <= b).cast("long")).alias(f"c{i}")
            for i, b in enumerate(_HIST_BOUNDS)
        ],
    )
    cums = F.array(*[F.col(f"c{i}") for i in range(len(_HIST_BOUNDS))])
    bounds = F.array(*[F.lit(b) for b in _HIST_BOUNDS])

    def quantile(phi: float) -> Column:
        rank = F.lit(phi) * F.col("n")
        idx = F.size(F.filter(cums, lambda c: c < rank))
        lower = F.coalesce(F.get(bounds, idx - 1), F.lit(0.0))
        cum_lower = F.coalesce(F.get(cums, idx - 1), F.lit(0)).cast("double")
        upper = F.get(bounds, idx)
        cum_upper = F.get(cums, idx).cast("double")
        return F.round(
            F.when(idx >= F.size(bounds), F.element_at(bounds, -1)).otherwise(
                lower
                + (upper - lower) * (rank - cum_lower) / (cum_upper - cum_lower)
            ),
            4,
        )

    return per_cell.select(
        "event_type",
        "win_idx",
        F.col("n").cast("bigint").alias("n"),
        *[quantile(p).alias(f"p{int(p * 100)}") for p in _HQ_PHIS],
    )


A4C_ORACLE = """
    WITH j AS (
        SELECT p_brand, CAST(l_quantity AS BIGINT) AS qty,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS w
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    h AS (
        SELECT p_brand, qty, CAST(sum(w) AS BIGINT) AS wsum
        FROM j GROUP BY 1, 2
    ),
    c AS (
        SELECT p_brand, qty, wsum,
               CAST(sum(wsum) OVER (PARTITION BY p_brand ORDER BY qty)
                    AS BIGINT) AS cum,
               CAST(sum(wsum) OVER (PARTITION BY p_brand) AS BIGINT) AS total
        FROM h
    )
    SELECT p_brand, total AS total_weight,
           CAST(min(qty) AS BIGINT) AS wmedian_qty
    FROM c WHERE cum * 2 >= total
    GROUP BY 1, 2
"""


@register("a4c_weighted_median", family="A4", oracle=A4C_ORACLE)
def a4c_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median — the order-quantity level at which half the
    REVENUE sits, per brand (lower weighted median: the smallest q with
    2·cumweight(q) ≥ totalweight). a4 gives unweighted percentiles, a4b
    a rank sketch, a4s a streaming histogram; none answers 'the median
    dollar', which is what pricing/SLO-cost analyses weight by. The
    window-based formulation (cum weight over value-ordered fact rows
    per group) is the w3 disease; this runs as a SATURATING VALUE
    HISTOGRAM instead: one map-side-combinable (brand, qty) hash agg
    collapses the fact stream to ≤ |brands|·|qty domain| = 25·50 cells
    (the t32 dict argument — quantity is a 1..50 integer domain, so the
    histogram stops growing long before the data does), and the
    cum/total windows run over those ≤50 rows per brand, never over
    facts. Weights are exact integer cents summed as BIGINT (decimal
    partials at 100 TB, the t31s swap); every output is an integer —
    no floats, hash-safe by construction; part is a broadcast dim
    (J2 rule)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("w"),
    )
    h = j.groupBy("p_brand", "qty").agg(F.sum("w").cast("bigint").alias("wsum"))
    wcum = (
        Window.partitionBy("p_brand")
        .orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("p_brand")
    c = h.withColumn("cum", F.sum("wsum").over(wcum).cast("bigint")).withColumn(
        "total", F.sum("wsum").over(wtot).cast("bigint")
    )
    return (
        c.where(F.col("cum") * 2 >= F.col("total"))
        .groupBy("p_brand", F.col("total").alias("total_weight"))
        .agg(F.min("qty").cast("bigint").alias("wmedian_qty"))
    )


A10E_ORACLE = """
    WITH c AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    b AS (
        SELECT event_type,
               CASE WHEN cents <= 1 THEN 0
                    ELSE length(bin(cents - 1)) END AS k
        FROM c
    ),
    h AS (
        SELECT event_type, k, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, k, n,
               CAST(sum(n) OVER (PARTITION BY event_type ORDER BY k)
                    AS BIGINT) AS c_n,
               CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
        FROM h
    )
    SELECT event_type,
           CAST(min(CASE WHEN 2 * c_n >= total THEN k END) AS BIGINT)
               AS p50_bucket,
           CAST(min(CASE WHEN 100 * c_n >= 99 * total THEN k END) AS BIGINT)
               AS p99_bucket,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(total) AS BIGINT) AS n_samples,
           CAST(max(k) AS BIGINT) AS max_bucket
    FROM cum GROUP BY 1
"""


@register("a10e_native_histogram", family="A10", oracle=A10E_ORACLE)
def a10e_native_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus NATIVE histograms — the sparse base-2 exponential
    bucketing (schema 0: bucket k covers (2^(k-1), 2^k] in integer cent
    units) that replaces the classic le-bucket scheme a10/a10b/a10c/a10d
    consume: no pre-declared bounds, resolution follows the data, and
    the sketch merges by bucket-index addition. Quantiles report the
    rank-containing bucket INDEX (its upper bound is 2^k cents, exact) —
    rank selection over exact integer counts, no interpolation and no
    log() anywhere: the bucket index is the d22/t30 bit-length trick
    (length(bin(cents−1)), exact where float log2 splits on power-of-2
    boundaries and identical on both engines; ceil(log2(c)) for c ≥ 2,
    bucket 0 holds c ≤ 1).

    Scale shape: one per-row codegen pass (round + bin + length) into
    one map-side-combinable (type, k) hash agg — ≤ |types|·~40 cells
    (the cent domain caps k at ~40 for any float64-representable cent
    value, so the histogram SATURATES, the a4c argument); the
    cum/quantile windows run over those cells, never facts; one
    |types|-row output. All-integer output; NULL staleness markers
    excluded identically."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    c = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    b = c.select(
        "event_type",
        F.when(F.col("cents") <= 1, F.lit(0))
        .otherwise(F.length(F.bin(F.col("cents") - 1)))
        .alias("k"),
    )
    h = b.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    cum = h.withColumn("c_n", F.sum("n").over(wcum).cast("bigint")).withColumn(
        "total", F.sum("n").over(wtot).cast("bigint")
    )
    return cum.groupBy("event_type").agg(
        F.min(F.when(2 * F.col("c_n") >= F.col("total"), F.col("k")))
        .cast("bigint")
        .alias("p50_bucket"),
        F.min(F.when(100 * F.col("c_n") >= 99 * F.col("total"), F.col("k")))
        .cast("bigint")
        .alias("p99_bucket"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("total").cast("bigint").alias("n_samples"),
        F.max("k").cast("bigint").alias("max_bucket"),
    )


A4D_ORACLE = """
    WITH h AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, c, cnt,
               CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY c)
                    AS BIGINT) AS cu,
               CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM h
    ),
    trimmed AS (
        SELECT event_type, n, n // 20 AS k,
               CAST(sum(c * greatest(CAST(0 AS BIGINT),
                        least(cu, n - n // 20)
                        - greatest(cu - cnt + 1, n // 20 + 1) + 1))
                    AS DECIMAL(38,0)) AS tsum,
               CAST(min(CASE WHEN 2 * cu >= n THEN c END) AS BIGINT) AS med
        FROM cum GROUP BY 1, 2
    ),
    dev AS (
        SELECT cum.event_type, abs(cum.c - t.med) AS d,
               CAST(sum(cum.cnt) AS BIGINT) AS cnt, max(t.n) AS n
        FROM cum JOIN trimmed t ON cum.event_type = t.event_type
        GROUP BY 1, 2
    ),
    dcum AS (
        SELECT event_type, d, n,
               CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d)
                    AS BIGINT) AS cu
        FROM dev
    ),
    mad AS (
        SELECT event_type,
               CAST(min(CASE WHEN 2 * cu >= n THEN d END) AS BIGINT)
                   AS mad_cents
        FROM dcum GROUP BY 1
    )
    SELECT t.event_type, t.n AS n_samples, CAST(t.k AS BIGINT) AS trim_k,
           t.med AS median_cents, m.mad_cents,
           floor(CAST(t.tsum AS DOUBLE) / CAST((t.n - 2 * t.k) * 100 AS DOUBLE)
                 * 1e6) / 1e6 AS trimmed_mean
    FROM trimmed t JOIN mad m ON t.event_type = m.event_type
"""


@register("a4d_robust_stats", family="A4", oracle=A4D_ORACLE)
def a4d_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST statistics per metric — 5%-trimmed mean and MAD (median
    absolute deviation), the outlier-resistant pair every monitoring
    shop wants next to mean/stddev (a11's z-scores break on the same
    outliers these tolerate). Exact order statistics WITHOUT ever
    sorting facts: the fleet's saturating-histogram trick (a4c/t32)
    taken one step further with PARTIAL-CELL RANK ARITHMETIC — each
    (type, cents) cell spans ranks [cum−cnt+1, cum], so the trimmed sum
    keeps max(0, min(cum, n−k) − max(cum−cnt+1, k+1) + 1) samples from
    the cell (cells fully inside the trim window contribute wholly,
    boundary cells partially, all in exact integers); the MAD's second
    ranking runs over the |c − median| RE-KEYED HISTOGRAM — another
    cell-level aggregate, facts are never touched twice.

    Scale shape: ONE map-side-combinable (type, cents) hash agg over
    facts — the cent domain is bounded (~49 k cells/type at sf0.01,
    saturating, the t32 dict argument) — then every window/join runs
    over cells. Trimmed sum accumulates as DECIMAL(38,0) ≡ HUGEINT
    (t31s precedent: c·kept can reach 1e9·cells); one division at the
    end, floor-truncated (f8); counts, k, median, MAD all exact
    BIGINTs. NULL staleness markers excluded identically."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    h = (
        events.where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        )
        .groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    cum = h.withColumn("cu", F.sum("cnt").over(wcum).cast("bigint")).withColumn(
        "n", F.sum("cnt").over(wtot).cast("bigint")
    )
    k = F.expr("n div 20")
    kept = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("cu"), F.col("n") - k)
        - F.greatest(F.col("cu") - F.col("cnt") + 1, k + 1)
        + 1,
    )
    trimmed = cum.groupBy("event_type", "n").agg(
        F.sum(F.col("c").cast("decimal(19,0)") * kept.cast("decimal(19,0)")).alias(
            "tsum"
        ),
        F.min(F.when(2 * F.col("cu") >= F.col("n"), F.col("c")))
        .cast("bigint")
        .alias("med"),
    ).withColumn("k", F.expr("n div 20"))
    dev = (
        cum.join(
            F.broadcast(trimmed.select("event_type", "med")), "event_type"
        )
        .groupBy("event_type", F.abs(F.col("c") - F.col("med")).alias("d"))
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dcum = dev.withColumn("cu", F.sum("cnt").over(wd).cast("bigint")).join(
        F.broadcast(trimmed.select("event_type", "n")), "event_type"
    )
    mad = dcum.groupBy("event_type").agg(
        F.min(F.when(2 * F.col("cu") >= F.col("n"), F.col("d")))
        .cast("bigint")
        .alias("mad_cents")
    )
    return trimmed.join(mad, "event_type").select(
        "event_type",
        F.col("n").alias("n_samples"),
        F.col("k").cast("bigint").alias("trim_k"),
        F.col("med").alias("median_cents"),
        "mad_cents",
        (
            F.floor(
                F.col("tsum").cast("double")
                / ((F.col("n") - 2 * F.col("k")) * 100).cast("double")
                * 1e6
            )
            / 1e6
        ).alias("trimmed_mean"),
    )
