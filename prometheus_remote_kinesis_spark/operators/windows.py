"""W-family: window functions (SURVEY.md §2.5 W1-W4).

Counter deltas (lag), per-series running aggregates (range frames over
epoch-ms), and top-k per group — the PromQL-ish analytics over the record
model. Every ordering includes a unique tie-break key so results are
deterministic on both engines. Scale note: all windows partition by a
key (never a global ORDER BY window) — one shuffle on the partition key,
state bounded per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


@register(
    "w1_order_rank_in_status",
    family="W1",
    oracle="""
        SELECT o_orderstatus, o_orderkey, o_totalprice, rn, rnk
        FROM (
            SELECT o_orderstatus, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                   rank()       OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders
        ) WHERE rn <= 5
    """,
)
def w1_order_rank_in_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "w2_value_deltas",
    family="W2",
    oracle="""
        SELECT event_id, user_id,
               round(value - lag(value)  OVER w, 6) AS delta,
               round(lead(value) OVER w - value, 6) AS next_delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per series — the counter-delta primitive (rate/increase
    numerators over the reference's sample stream, record.go:10-11)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.round(F.lead("value").over(w) - F.col("value"), 6).alias("next_delta"),
    )


W3_ORACLE = """
        SELECT event_id, event_type,
               round(sum(value) OVER (PARTITION BY event_type ORDER BY epoch_ms(ts)
                                      RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW), 2)
                   AS trailing_sum,
               count(*) OVER (PARTITION BY event_type ORDER BY epoch_ms(ts)
                              RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW)
                   AS trailing_n
        FROM events
"""


@register("w3_trailing_5min_sum", family="W3", oracle=W3_ORACLE)
def w3_trailing_5min_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute trailing range frame over epoch-ms — PromQL
    ``sum_over_time(m[5m])`` / rate-style lookback on the ms-long time
    axis (record.go:10). RANGE (not ROWS) so ms-tied samples are frame
    peers on both engines.

    Retired from the ``bench=True`` headline set in r9 (VERDICT r8 task
    #2): the direct low-cardinality-key RANGE window is the known
    non-scaling form (SCALE.md: parallelism capped at |event_type|),
    kept registered/oracle-checked only as w3b's naive twin so the
    decomposition's correctness stays pinned. The headline slot went to
    w5_gaps_islands so every benched plan is one you'd run at 100×."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-300000, 0)
    )
    return events.select(
        "event_id",
        "event_type",
        F.round(F.sum("value").over(w), 2).alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
    )


@register("w3b_trailing_5min_scalable", family="W3", bench=True, oracle=W3_ORACLE)
def w3b_trailing_5min_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w3's trailing 5-minute frame, re-planned for low-cardinality keys.

    w3's direct form partitions by ``event_type`` — a handful of keys, so
    at 100 TB a few tasks each sort and scan an entire series (measured on
    the 16× scale probe: 23× slower for 16× data while every other query
    scaled sub-linearly). This variant decomposes the frame over 5-minute
    buckets so parallelism is (key × bucket), unbounded in data size:

    with bucket width == frame width W, every row's frame [t-W, t] spans
    exactly its own bucket and the previous one, so

        trailing(t) = cum_own(t)                      (peer-inclusive
                                                       cumsum in bucket)
                    + tot(prev) - below_prev(t - W)   (prefix strictly
                                                       below t-W, looked
                                                       up as-of style)

    below_prev uses the j6 union trick: each row emits a side-0 probe at
    (bucket-1, t-W); probes sort before equal-ms data rows, so a running
    sum over preceding rows yields the strictly-below prefix. All three
    shuffles — the one windowed pass, bucket totals, the per-event
    regroup — key on high-cardinality (type, bucket) / event_id, never on
    type alone. The rounding-boundary argument is t5's: values are
    2-decimal quantized, so the regrouped double error (~1e-9) cannot
    move a round(…, 2) cell.

    r13 (guide §2.4): restructured twice. First from 4 scans / 4
    exchanges / 3 window sorts to 3 scans / 3 exchanges / 1 sort (probes
    entering the SAME union as data rows before the first shuffle,
    reunited by groupBy(event_id) instead of a self-join). Then to a
    SINGLE scan / 2 exchanges / 0 joins: each event row explodes into
    its data row and its probe row from one pass (no union of two
    scans), and the previous bucket's total rides the probe row itself
    as a whole-partition window sum over (type, bucket) — the probe
    lives in bucket-1, so its partition total IS tot(prev); the totals
    aggregate and the left join disappear. The one exchange on
    (type, bucket) + one sort on (ms, side) feeds all three Window
    frames (ROWS running prefix, RANGE peer-inclusive cumsum, and the
    unbounded full-partition total — the last two need only the
    (ms)-prefix ordering the same sort provides).

    Hash-safety: sum/count skip NULL probe values without touching the
    accumulator, so every accumulation over data values reduces the
    identical multiset; the full-partition sum accumulates bucket
    members in (ms, side) order instead of the old hash-aggregate order,
    and below/own prefixes in the identical (ms)-sorted order as before
    — all safe under the t5 quantization argument above (2-decimal
    inputs, round(…, 2) output). The final expression tree
    round(own + (coalesce(tot,0) - coalesce(below,0)), 2) is verbatim.
    Verified row-bit-equal against the previous form at sf0.01 and
    sf0.1 before the swap, and against the DuckDB oracle after."""
    frame_ms = 300000
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "event_type",
        "value",
        F.unix_millis(F.col("ts")).alias("ms"),
    ).withColumn("bucket", F.floor(F.col("ms") / frame_ms))

    both = base.select(
        "event_id",
        "event_type",
        F.explode(
            F.array(
                F.struct(
                    F.col("bucket").alias("bucket"),
                    F.col("ms").alias("ms"),
                    F.lit(1).alias("side"),
                    F.col("value").alias("value"),
                    F.lit(1).alias("cnt"),
                ),
                F.struct(
                    (F.col("bucket") - 1).alias("bucket"),
                    (F.col("ms") - frame_ms).alias("ms"),
                    F.lit(0).alias("side"),
                    F.lit(None).cast("double").alias("value"),
                    F.lit(None).cast("int").alias("cnt"),
                ),
            )
        ).alias("r"),
    ).select("event_id", "event_type", "r.bucket", "r.ms", "r.side", "r.value", "r.cnt")
    wlook = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("ms", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wcum = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("ms")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wfull = Window.partitionBy("event_type", "bucket")
    passed = (
        both.select(
            "event_id",
            "event_type",
            "bucket",
            "ms",
            "side",
            "value",
            "cnt",
            F.sum("value").over(wlook).alias("run_sum"),
            F.sum("cnt").over(wlook).alias("run_n"),
        )
        .select(
            "event_id",
            "event_type",
            "bucket",
            "side",
            "run_sum",
            "run_n",
            F.sum("value").over(wcum).alias("own_sum"),
            F.sum("cnt").over(wcum).alias("own_n"),
            F.sum("value").over(wfull).alias("full_sum"),
            F.sum("cnt").over(wfull).alias("full_n"),
        )
    )
    # groupBy includes event_type (identical on a row and its probe) so
    # every aggregation buffer stays numeric -> HashAggregate; a string
    # max buffer would force SortAggregate + a full extra sort (r13).
    g = passed.groupBy("event_id", "event_type").agg(
        F.max(F.when(F.col("side") == 1, F.col("own_sum"))).alias("own_sum"),
        F.max(F.when(F.col("side") == 1, F.col("own_n"))).alias("own_n"),
        F.max(F.when(F.col("side") == 0, F.col("run_sum"))).alias("below_sum"),
        F.max(F.when(F.col("side") == 0, F.col("run_n"))).alias("below_n"),
        F.max(F.when(F.col("side") == 0, F.col("full_sum"))).alias("tot_sum"),
        F.max(F.when(F.col("side") == 0, F.col("full_n"))).alias("tot_n"),
    )
    return g.select(
        "event_id",
        "event_type",
        F.round(
            F.col("own_sum")
            + (
                F.coalesce("tot_sum", F.lit(0.0))
                - F.coalesce("below_sum", F.lit(0.0))
            ),
            2,
        ).alias("trailing_sum"),
        (
            F.col("own_n")
            + (F.coalesce("tot_n", F.lit(0)) - F.coalesce("below_n", F.lit(0)))
        ).alias("trailing_n"),
    )


@register(
    "w1c_global_rank_scalable",
    family="W1",
    bench=True,
    oracle="""
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos,
               rank()       OVER (ORDER BY o_totalprice DESC)             AS rnk
        FROM orders
    """,
)
def w1c_global_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row_number + rank over the whole fact table WITHOUT a
    global window (which plans as one partition / one task — the worst
    scale shape there is).

    Two-phase banded rank, d7's trick adapted to a numeric sort key:
    band = floor(price / W) is a monotone function of the key, so band
    order (DESC) refines the global order AND equal prices always land
    in the same band — in-band rank() ties stay exact after adding the
    band offset. Phase 1: per-band window, parallelism = #bands (~100
    here; pick W from the key's known range — at unknown range, a
    sampled repartitionByRange + spark_partition_id gives the same shape
    at the cost of sampling nondeterminism). Phase 2: band counts are a
    ~1000-row aggregate, cumulative-summed and broadcast back. Shuffles
    key on (band), never on a constant.

    Band sizing (measured at 64× sf0.1, 9.6 M rows): width 5000 (~110
    bands) ran 6.3 s — per-band row groups of ~90 k dominate the window
    sort; width 500 (~1100 bands) runs 1.35 s. Aim for bands ≈ tens of
    rows per core-task-slot times parallelism — many small bands cost
    nothing (tasks = shuffle partitions, not bands) while big bands
    serialize."""
    band_width = 500.0
    orders = load_table(spark, sf_dir, "orders")
    # r13: the offsets broadcast-join moves AFTER the window, so the
    # fact-side exchange + sort + two Window passes carry (band, key,
    # price) without the 8-byte offset column — same per-row expressions,
    # verified row-identical. (An exchange-sharing attempt — explicit
    # repartition("band") feeding both the window and the counts agg —
    # did NOT dedupe: column pruning narrows the counts subplan to the
    # single price column, so its Exchange canonicalizes differently and
    # ReusedExchange can't fire. The second scan reads one column of a
    # columnar file; measured a wash at sf0.1, and the explicit
    # repartition is kept only because hash(band) then satisfies both
    # consumers' required distributions.)
    banded = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / band_width).alias("band"),
    ).repartition("band")
    w_pos = Window.partitionBy("band").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_rnk = Window.partitionBy("band").orderBy(F.desc("o_totalprice"))
    counts = banded.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    w_off = Window.orderBy(F.desc("band")).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "band", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    ranked = banded.select(
        "band",
        "o_orderkey",
        F.row_number().over(w_pos).alias("in_pos"),
        F.rank().over(w_rnk).alias("in_rnk"),
    )
    return ranked.join(F.broadcast(offsets), "band").select(
        "o_orderkey",
        (F.col("offset") + F.col("in_pos")).alias("pos"),
        (F.col("offset") + F.col("in_rnk")).alias("rnk"),
    )


@register(
    "w4_top_parts_per_brand",
    family="W4",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice, rn
        FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part
        ) WHERE rn <= 3
    """,
)
def w4_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — rank-then-filter; Spark prunes with a per-
    partition top-k (WindowGroupLimit) so no full sort materializes."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        part.select(
            "p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w1b_rank_family",
    family="W1",
    oracle="""
        SELECT o_orderkey,
               dense_rank()   OVER w            AS drnk,
               ntile(4)       OVER w            AS quartile,
               floor(percent_rank() OVER w * 1e6) / 1e6 AS pct_rank,
               floor(cume_dist()    OVER w * 1e6) / 1e6 AS cdist
        FROM orders
        WHERE o_orderstatus = 'F'
        WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w1b_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the ranking family (dense_rank / ntile / percent_rank /
    cume_dist) over a total order — WITHOUT the single-partition window
    the oracle's plain SQL implies (and this query shipped with through
    round 3). The window's ORDER BY carries a unique tie-break key, so
    every member of the family is pure arithmetic on the GLOBAL ROW
    NUMBER rn and the total count n:

        dense_rank   = rn            (no peers → every rank form equals rn)
        ntile(4)     = first n%4 buckets get ceil(n/4) rows, rest floor
        percent_rank = (rn-1)/(n-1)
        cume_dist    = rn/n

    rn comes from w1c's banded two-phase rank (band = monotone function
    of the sort key; per-band row_number + broadcast cumulative band
    offsets — parallelism = #bands, the fact table never serializes
    through one task); n is one more column on the tiny band-count
    aggregate. Both engines compute the same integer-ratio divisions on
    identical IEEE doubles, so the oracle (the straightforward window
    SQL) still matches bit-for-bit."""
    band_width = 500.0
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    banded = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / band_width).alias("band"),
    )
    w_pos = Window.partitionBy("band").orderBy(F.desc("o_totalprice"), "o_orderkey")
    counts = banded.groupBy("band").agg(F.count(F.lit(1)).alias("bn"))
    w_off = Window.orderBy(F.desc("band")).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "band",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("offset"),
        F.sum("bn").over(w_all).alias("n"),
    )
    rn = F.col("offset") + F.row_number().over(w_pos)
    n = F.col("n")
    q, r = (n / 4).cast("long"), n % 4
    quartile = (
        F.when(rn <= r * (q + 1), ((rn - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r + ((rn - r * (q + 1) - 1) / q).cast("long") + 1)
        .cast("int")
    )
    # percent_rank() is DEFINED as 0.0 for a single-row partition, while
    # the arithmetic (rn-1)/(n-1) is 0/0 = NaN at n == 1 — guard the
    # degenerate case (r4 ADVICE). Quotients are floor-truncated at 1e-6,
    # not round()ed: both engines hold the identical IEEE quotient, and
    # floor on identical doubles is tie-free, whereas round() on an
    # arbitrary quotient can land on a representable half-tie that Spark
    # HALF_UP and DuckDB split differently (the f8/t25 lesson).
    pct_rank = F.when(n == 1, F.lit(0.0)).otherwise(
        F.floor((rn - 1).cast("double") / (n - 1) * 1e6) / 1e6
    )
    return banded.join(F.broadcast(offsets), "band").select(
        "o_orderkey",
        rn.alias("drnk"),
        quartile.alias("quartile"),
        pct_rank.alias("pct_rank"),
        (F.floor(rn.cast("double") / n * 1e6) / 1e6).alias("cdist"),
    )


@register(
    "w2b_first_last_nth",
    family="W2",
    oracle="""
        SELECT event_id, user_id,
               first_value(value) OVER w                  AS first_v,
               last_value(value)  OVER w                  AS last_v,
               nth_value(value, 2) OVER w                 AS second_v,
               round(value - first_value(value) OVER w, 6) AS delta_from_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w2b_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of W2's analytic family: first_value / last_value /
    nth_value over the whole series frame — baseline-relative deltas
    (value vs series start) are the PromQL ``increase``-from-t0 shape.
    Explicit unbounded ROWS frame on both engines: last_value under the
    default frame (… AND CURRENT ROW) silently returns the current row,
    the classic SQL footgun this query pins away. Per-series partition
    key, one shuffle, bounded state."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    first_v = F.first("value").over(w)
    return events.select(
        "event_id",
        "user_id",
        first_v.alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
        F.round(F.col("value") - first_v, 6).alias("delta_from_start"),
    )


W5_ORACLE = """
    WITH s AS (
        SELECT user_id,
               epoch_us(ts) // 1000 AS ms,
               epoch_us(ts) // 1000 + 300000 AS iv_end,
               event_id
        FROM events
    ),
    flagged AS (
        SELECT user_id, ms, iv_end, event_id,
               CASE WHEN ms > max(iv_end) OVER (
                        PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR max(iv_end) OVER (
                        PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    THEN 1 ELSE 0 END AS new_island
        FROM s
    ),
    islands AS (
        SELECT user_id, ms, iv_end,
               sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           CAST(min(ms) AS BIGINT) AS island_start,
           CAST(max(iv_end) AS BIGINT) AS island_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY 1, 2
"""


@register("w5_gaps_islands", family="W3", bench=True, oracle=W5_ORACLE)
def w5_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval coalescing — the classic merge-
    overlapping-intervals pattern the W-family lacked: each event opens
    a 5-minute activity interval [ms, ms+300 s); per user, overlapping
    or touching-by-containment intervals merge into islands (busy
    periods), emitted as (island, start, end, n_events). The standard
    two-window construction: a row starts a new island iff its start
    exceeds the RUNNING MAX of all previous interval ends (running max —
    not lag(end) — so an early long interval swallowing later short
    ones is handled), then a running sum of the new-island flags is the
    island id, then one hash agg per (user, island).

    Ordering discipline: BOTH windows (the new-island flag frame and the
    island-id running sum) order by (ms, event_id) — event_id is the
    unique tie-break key, so rows with identical (user_id, ms) assign to
    islands deterministically on either engine (iv_end = ms+300000 would
    NOT break such ties — r8 ADVICE). The two windows share the
    (user_id) partitioning AND ordering so Catalyst plans one Exchange
    and one Sort. All arithmetic is integer ms; no floats.

    Scale shape: both windows partition by user_id (key count grows with
    the corpus; ~13 rows per key here, bounded per-key sort), and the
    final agg is map-side combinable. The t7 session-window operator is
    the event-time streaming cousin; this is the batch lakehouse form
    (billing periods, incident windows, utilization stitching)."""
    events = load_table(spark, sf_dir, "events")
    s = events.select(
        "user_id",
        F.unix_millis("ts").alias("ms"),
        (F.unix_millis("ts") + 300000).alias("iv_end"),
        "event_id",
    )
    w_flag = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_end = F.max("iv_end").over(w_flag)
    flagged = s.select(
        "user_id",
        "ms",
        "iv_end",
        "event_id",
        F.when(
            (F.col("ms") > prev_max_end) | prev_max_end.isNull(), 1
        ).otherwise(0).alias("new_island"),
    )
    w_sum = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "ms",
        "iv_end",
        F.sum("new_island").over(w_sum).alias("island"),
    )
    return islands.groupBy("user_id", F.col("island").cast("bigint").alias("island")).agg(
        F.min("ms").cast("bigint").alias("island_start"),
        F.max("iv_end").cast("bigint").alias("island_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


W6_WITHIN_MS = 86_400_000  # MATCH_RECOGNIZE's WITHIN clause: 1 day

W6_ORACLE = f"""
    WITH s AS (
        SELECT user_id,
               event_type,
               epoch_us(ts) // 1000 AS ms,
               lead(event_type, 1) OVER w AS et1,
               lead(event_type, 2) OVER w AS et2,
               lead(epoch_us(ts) // 1000, 2) OVER w AS ms2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000, event_id)
    ),
    m AS (
        SELECT user_id, ms, ms2 - ms AS span
        FROM s
        WHERE event_type = 'view' AND et1 = 'click' AND et2 = 'purchase'
          AND ms2 - ms <= {W6_WITHIN_MS}
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(ms) AS BIGINT) AS first_match_ms,
           CAST(min(span) AS BIGINT) AS min_span_ms
    FROM m GROUP BY 1
"""


@register("w6_event_pattern", family="W2", oracle=W6_ORACLE)
def w6_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequential pattern detection — the SQL:2016
    row-pattern-matching shape Spark has no native operator for,
    re-expressed as a lead() chain: per user, a match is THREE
    CONSECUTIVE rows (view, click, purchase) in (ts, event_id) order
    whose total span fits WITHIN 1 day — the strict-adjacency semantic
    that distinguishes it from t15's funnel (t15's EXISTS tolerates any
    intervening events; PATTERN (V C P) does not: an interleaved
    ``error`` row breaks the match). The lead chain IS the compiled
    NFA for a fixed-length pattern: state = the next k-1 rows, which a
    window delivers without any self-join (the naive 3-way self-join on
    adjacent row numbers would shuffle the fact table three times; this
    shuffles once).

    At sf0.01 the 1-day WITHIN clause excludes 22 of 76 structural
    matches, so the time-bound branch is exercised in both directions
    by the hash gate. Output: per converting user, the match count, the
    first match's opening timestamp, and the tightest span — all exact
    BIGINT ms.

    Scale shape: ONE window over (user_id; ms, event_id) — key count
    grows with the corpus, the two leads and the pattern predicate ride
    the same Sort+Exchange, then a map-side-combinable hash agg. Same
    envelope as w2; no joins, no second shuffle of fact rows.

    Ordering convention: BOTH engines order by (epoch-ms, event_id) —
    the t30/w5 ms convention — because the Spark side and the CEP order
    guards work in unix_millis. (An oracle ordered by full-microsecond
    ts would silently diverge on any same-user same-ms collision.)"""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    s = events.select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ms"),
        "event_id",
    ).select(
        "user_id",
        "event_type",
        "ms",
        F.lead("event_type", 1).over(w).alias("et1"),
        F.lead("event_type", 2).over(w).alias("et2"),
        F.lead("ms", 2).over(w).alias("ms2"),
    )
    m = s.where(
        (F.col("event_type") == "view")
        & (F.col("et1") == "click")
        & (F.col("et2") == "purchase")
        & (F.col("ms2") - F.col("ms") <= W6_WITHIN_MS)
    ).select("user_id", "ms", (F.col("ms2") - F.col("ms")).alias("span"))
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("ms").cast("bigint").alias("first_match_ms"),
        F.min("span").cast("bigint").alias("min_span_ms"),
    )


W7_ORACLE = f"""
    WITH s AS (
        SELECT user_id, event_type,
               epoch_us(ts) // 1000 AS ms,
               sum(CASE WHEN event_type <> 'view' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts) // 1000, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS grp,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts) // 1000,
                                              event_id) AS prev_et
        FROM events
    ),
    runs AS (
        SELECT user_id, grp,
               CAST(count(*) AS BIGINT) AS n_views,
               min(ms) AS first_ms
        FROM s WHERE event_type = 'view' GROUP BY 1, 2
    ),
    matches AS (
        SELECT p.user_id, r.n_views, r.first_ms,
               p.ms - r.first_ms AS span
        FROM s p JOIN runs r
          ON r.user_id = p.user_id AND r.grp = p.grp - 1
        WHERE p.event_type = 'purchase' AND p.prev_et = 'view'
          AND p.ms - r.first_ms <= {W6_WITHIN_MS}
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(max(n_views) AS BIGINT) AS max_run_views,
           CAST(min(first_ms) AS BIGINT) AS first_match_ms,
           CAST(min(span) AS BIGINT) AS min_span_ms
    FROM matches GROUP BY 1
"""


@register("w7_pattern_quantified", family="W2", oracle=W7_ORACLE)
def w7_pattern_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE with a QUANTIFIER — ``PATTERN (view+ purchase)``
    WITHIN 1 day of the run's FIRST view: w6 handles fixed-length
    patterns with a lead() chain; a one-or-more quantifier has no fixed
    lookahead, so the maximal view-run becomes a GROUP: grp = running
    count of non-view rows (every consecutive view shares the grp of
    the non-view row before it — the gaps-and-islands trick pointed at
    pattern runs), per-(user, grp) run aggregates (n_views, first_ms),
    and a purchase row closes the run at grp−1 when its immediate
    predecessor is a view (strict adjacency — any interleaved row
    breaks the run, exactly MATCH_RECOGNIZE semantics) and the span
    from the run's first view fits the WITHIN bound. The quantifier
    branch is hash-exercised: 44 of 329 sf0.01 matches close runs of
    ≥2 views (max 3), and the per-match MEASURES (run length, span)
    ride into the output — the SQL:2016 MEASURES clause shape.

    Scale: one (user_id; ms, event_id) window pass for grp/prev_et
    (same Sort+Exchange), one hash agg keyed (user, grp) — keys grow
    with the data — and one equi-join of purchases to runs on the same
    growing key. No self-join of fact rows on inequality, no quadratic
    pair expansion; the run groups are what an NFA's accumulating state
    would hold, materialized relationally.

    Ordering convention: BOTH engines order by (epoch-ms, event_id) —
    see w6_event_pattern's docstring."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    s = events.select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ms"),
        "event_id",
    ).select(
        "user_id",
        "event_type",
        "ms",
        F.sum((F.col("event_type") != "view").cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("grp"),
        F.lag("event_type").over(w).alias("prev_et"),
    )
    runs = (
        s.where(F.col("event_type") == "view")
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_views"),
            F.min("ms").alias("first_ms"),
        )
        .select("user_id", "grp", "n_views", "first_ms")
    )
    p = s.where(
        (F.col("event_type") == "purchase") & (F.col("prev_et") == "view")
    ).select("user_id", "grp", F.col("ms").alias("p_ms"))
    r = runs.select(
        F.col("user_id").alias("r_user"),
        F.col("grp").alias("r_grp"),
        "n_views",
        "first_ms",
    )
    matches = p.join(
        r,
        (F.col("user_id") == F.col("r_user")) & (F.col("r_grp") == F.col("grp") - 1),
    ).where(F.col("p_ms") - F.col("first_ms") <= W6_WITHIN_MS)
    return matches.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.max("n_views").cast("bigint").alias("max_run_views"),
        F.min("first_ms").cast("bigint").alias("first_match_ms"),
        F.min(F.col("p_ms") - F.col("first_ms")).cast("bigint").alias("min_span_ms"),
    )


W9_ORACLE = """
    WITH first_seen AS (
        SELECT user_id,
               min(epoch_us(ts) // 86400000000) AS first_day
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1
    ),
    per_day AS (
        SELECT first_day AS day_idx,
               CAST(count(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY 1
    )
    SELECT CAST(day_idx AS BIGINT) AS day_idx, new_users,
           CAST(sum(new_users) OVER (ORDER BY day_idx
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM per_day
"""


@register("w9_cumulative_distinct_users", family="W3", oracle=W9_ORACLE)
def w9_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — cumulative distinct users by day, the
    "users-to-date" curve every product dashboard draws. The naive
    form (count(DISTINCT user) over an expanding day frame) re-scans
    every prior day per output row — O(days²) distinct work and a
    distinct aggregate no window frame supports anyway. The scalable
    identity: a user contributes to the cumulative count exactly once,
    on their FIRST day — so min(day) per user (one growing-key hash
    agg), count per first-day (second agg, |days| keys), and a running
    sum over the |days|-row aggregate reproduce the expanding distinct
    exactly.

    Day indices are integer epoch divisions (the dq2 rule — no engine
    date types in the hash); NULL users excluded identically. Scale
    shape: two map-side-combinable hash aggs (users, then days); the
    only window is the cumulative sum over the per-DAY aggregate —
    |days| rows (~36 k/century), never fact rows, the w1c/dq2
    band-aggregate argument (whitelisted global window)."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    first_seen = events.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).groupBy("user_id").agg(F.min("day").alias("first_day"))
    per_day = first_seen.groupBy(F.col("first_day").alias("day_idx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("day_idx").cast("bigint").alias("day_idx"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


W10_ORACLE = """
    WITH act AS (
        SELECT DISTINCT event_type, user_id,
               (epoch_us(ts) // 1000) // 3600000 AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    m AS (
        SELECT *, CASE WHEN lag(h) OVER w IS NULL OR h - lag(h) OVER w > 24
                       THEN 1 ELSE 0 END AS new_isl
        FROM act WINDOW w AS (PARTITION BY event_type, user_id ORDER BY h)
    ),
    i AS (
        SELECT *, sum(new_isl) OVER (
            PARTITION BY event_type, user_id ORDER BY h
        ) AS isl
        FROM m
    ),
    spans AS (
        SELECT event_type, user_id, isl,
               min(h) AS hs, max(h) + 23 AS he
        FROM i GROUP BY 1, 2, 3
    ),
    cov AS (
        SELECT event_type, unnest(range(hs, he + 1)) AS hour
        FROM spans
    )
    SELECT event_type, CAST(hour AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_active
    FROM cov GROUP BY 1, 2
"""


@register("w10_rolling_distinct_users", family="W3", oracle=W10_ORACLE)
def w10_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active users — for every hour H, how many distinct users
    had ANY event in the trailing 24 hours (H−23..H]: the rolling-DAU
    panel next to w9's cumulative form, and the canonical query people
    reach for a sliding count(DISTINCT) window on — which neither
    engine supports and which would be quadratic if emulated per-hour.

    Rewritten as INTERVAL-COVERAGE EXPANSION (no sliding distinct ever
    exists): activity collapses to distinct (type, user, hour) [one
    growing-key hash agg with map-side dedup]; per user, activity hours
    whose gaps are ≤ 24 h merge into islands (w5's machinery on the
    high-cardinality (type, user) key — an island [h₁, h₂] covers
    report hours h₁..h₂+23, and a >24 h gap means disjoint coverage);
    each island EXPLODES via sequence() into its covered report hours —
    bounded fan-out ≤ span+24 rows per island, and islands are disjoint
    by construction so the exploded rows are already (type, user, hour)
    distinct; the final map-side-combinable (type, hour) count needs no
    distinct at all. Three shuffles, every key growing with data; the
    explode runs inside the projection. All-integer output (hour = epoch
    div, the dq2 rule); NULL users excluded identically (w9's rule)."""
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    act = (
        events.select(
            "event_type",
            "user_id",
            F.expr("unix_millis(ts) div 3600000").alias("h"),
        )
        .distinct()
    )
    wu = Window.partitionBy("event_type", "user_id").orderBy("h")
    m = act.withColumn(
        "new_isl",
        F.when(
            F.lag("h").over(wu).isNull()
            | (F.col("h") - F.lag("h").over(wu) > 24),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("isl", F.sum("new_isl").over(wu))
    spans = m.groupBy("event_type", "user_id", "isl").agg(
        F.min("h").alias("hs"), (F.max("h") + 23).alias("he")
    )
    cov = spans.select(
        "event_type", F.explode(F.sequence("hs", "he")).alias("hour")
    )
    return cov.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    ).select("event_type", F.col("hour").cast("bigint").alias("hour"), "n_active")
