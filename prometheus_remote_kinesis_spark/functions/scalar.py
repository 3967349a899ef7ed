"""F-family: scalar function surface (SURVEY.md §2.7 F1-F7).

All built-in ``pyspark.sql.functions`` — JVM-side, inside WholeStageCodegen,
no Python in the hot path. Each query exercises one family against the
record model's column shapes (strings, epoch-ms time, doubles, arrays,
the labels map, JSON props, NULLs). Oracle-side casts align DuckDB's wider
integer defaults (BIGINT) with Spark's natural types where they differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


@register(
    "f1_string_ops",
    family="F1",
    oracle="""
        SELECT p_partkey,
               upper(p_brand)                              AS brand_u,
               lower(p_type)                               AS type_l,
               substring(p_name, 1, 5)                     AS name5,
               CAST(length(p_name) AS INTEGER)             AS name_len,
               regexp_extract(p_name, '^(\\w+)', 1)        AS first_word,
               regexp_replace(p_brand, '#', '_')           AS brand_us,
               concat(p_brand, ':', p_type)                AS brand_type,
               CAST(p_name LIKE '%ring%' AS BOOLEAN)       AS has_ring
        FROM part
        WHERE p_name LIKE '%e%' AND regexp_matches(p_type, 'ECONOMY|SMALL')
    """,
)
def f1_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family incl. the PromQL regex matcher (=~) shape: rlike."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%e%") & F.col("p_type").rlike("ECONOMY|SMALL"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.length("p_name").alias("name_len"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.regexp_replace("p_brand", "#", "_").alias("brand_us"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.col("p_name").like("%ring%").alias("has_ring"),
        )
    )


@register(
    "f2_datetime_ops",
    family="F2",
    oracle="""
        SELECT o_orderkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(year(o_orderdate) AS INTEGER)          AS y,
               CAST(month(o_orderdate) AS INTEGER)         AS m,
               CAST(day(o_orderdate) AS INTEGER)           AS dom,
               CAST(isodow(o_orderdate) AS INTEGER)        AS iso_dow,
               CAST(o_orderdate AS DATE)                   AS order_date,
               epoch_ms(o_orderdate)                       AS epoch_millis
        FROM orders
    """,
)
def f2_datetime_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family over the epoch-ms axis (record.go:10): trunc,
    field extraction, epoch round-trip. ISO day-of-week used because
    Spark's ``dayofweek`` (1=Sunday) and DuckDB's differ; ``weekday()+1``
    = ISO (1=Monday) on both."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.weekday("o_orderdate") + F.lit(1)).alias("iso_dow"),
        F.to_date("o_orderdate").alias("order_date"),
        F.unix_millis("o_orderdate").alias("epoch_millis"),
    )


@register(
    "f3_math_ops",
    family="F3",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_extendedprice), 6)        AS sqrt_price,
               round(ln(l_extendedprice), 6)          AS ln_price,
               round(pow(1 + l_discount, 2), 6)       AS disc_sq,
               round(abs(l_extendedprice - 1000), 2)  AS abs_delta,
               CAST(ceil(l_quantity) AS BIGINT)       AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT)      AS qty_floor,
               round(exp(l_discount), 6)              AS exp_disc
        FROM lineitem
        WHERE l_linenumber <= 2
    """,
)
def f3_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. NaN semantics (isnan/nanvl) are exercised by the
    ingest queries (r1) where NaN→NULL is the pinned behavior."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.round(F.abs(F.col("l_extendedprice") - 1000), 2).alias("abs_delta"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
    )


@register(
    "f4_array_ops",
    family="F4",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER)                          AS dim,
               round(list_sum(embedding::DOUBLE[]), 4)                  AS emb_sum,
               CAST(list_min(embedding) AS DOUBLE)                      AS emb_min,
               CAST(list_max(embedding) AS DOUBLE)                      AS emb_max,
               round(list_sum(list_transform(embedding::DOUBLE[],
                                             x -> x * x)), 4)           AS sq_norm,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
        FROM embeddings
    """,
)
def f4_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions (transform/filter/
    aggregate) over the embedding vectors — all JVM-side, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    fsum = F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)
    sq_norm = F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(fsum, 4).alias("emb_sum"),
        F.array_min("embedding").cast("double").alias("emb_min"),
        F.array_max("embedding").cast("double").alias("emb_max"),
        F.round(sq_norm, 4).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "f5_map_ops",
    family="F5",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               CAST(len(json_keys(props)) AS INTEGER)            AS n_keys,
               event_type                                        AS name_label
        FROM events
    """,
)
def f5_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family over a labels-shaped map (record.go:14): build the map
    with from_json, then element_at / map_keys. The reference's dynamic
    label map is exactly this MapType column."""
    events = load_table(spark, sf_dir, "events")
    with_map = events.select(
        "event_id",
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("props_map"),
    ).select(
        "event_id",
        "event_type",
        F.map_concat(
            F.col("props_map").cast("map<string,string>"),
            F.create_map(F.lit("__name__"), F.col("event_type")),
        ).alias("labels"),
        F.col("props_map"),
    )
    return with_map.select(
        "event_id",
        F.element_at("props_map", "k").alias("k_val"),
        F.size(F.map_keys("props_map")).alias("n_keys"),
        F.element_at("labels", "__name__").alias("name_label"),
    )


@register(
    "f6_json_ops",
    family="F6",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')                 AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
               CAST(json_extract_string(props, '$.missing') IS NULL
                    AS BOOLEAN)                                  AS missing_is_null
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
    """,
)
def f6_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family — the wire format itself is NDJSON (README.rst:44-61);
    get_json_object / from_json / json path extraction."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return events.filter(k.cast("long") >= 90).select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@register(
    "f7_conditional_ops",
    family="F7",
    oracle="""
        SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 1000 THEN 'low'
                    ELSE 'high' END                       AS balance_bucket,
               count(*)                                   AS n,
               round(sum(c_acctbal), 2)                   AS total_bal,
               count(nullif(c_mktsegment, 'BUILDING'))    AS n_non_building,
               round(coalesce(avg(CASE WHEN c_acctbal > 0
                                       THEN c_acctbal END), 0), 4)
                                                          AS avg_positive_bal
        FROM customer
        GROUP BY 1
    """,
)
def f7_conditional_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/NULL family — the record model's nullable value
    semantics (record.go:21-27) generalized: when/otherwise, nullif,
    coalesce, conditional aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
    )
    return customer.groupBy(bucket.alias("balance_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias("n_non_building"),
        F.round(
            F.coalesce(
                F.avg(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))), F.lit(0.0)
            ),
            4,
        ).alias("avg_positive_bal"),
    )


@register(
    "f6b_variant_ops",
    family="F6",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
               json_extract_string(props, '$.missing') IS NULL   AS missing_is_null
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
    """,
)
def f6b_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type over the props JSON: ``parse_json`` once into
    a binary semi-structured value, then typed ``variant_get`` path
    extraction — the modern replacement for repeated ``get_json_object`` string
    re-parses. At scale the parse happens once per row regardless of how
    many paths are extracted (get_json_object re-tokenizes the string per
    call), and the variant value is shredded columnar in shuffle/cache.
    Oracle extracts the same paths with DuckDB's JSON functions."""
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    parsed = events.select("event_id", v.alias("v"))
    k_num = F.variant_get(F.col("v"), "$.k", "bigint")
    return parsed.select(
        "event_id",
        k_num.alias("k_num"),
        F.try_variant_get(F.col("v"), "$.missing", "string").isNull().alias(
            "missing_is_null"
        ),
    ).filter(k_num % 7 == 0)


@register(
    "f8_try_ops",
    family="F8",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               floor((l_extendedprice / nullif(l_quantity - 7, 0)) * 1000000)
                   / 1000000 AS safe_ratio,
               list_extract([l_quantity], 3)                         AS oob_elem,
               TRY_CAST(l_returnflag AS DOUBLE)                      AS bad_cast,
               TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)      AS roundtrip_qty
        FROM lineitem
        WHERE l_linenumber = 1
    """,
)
def f8_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: Spark 4 runs under ANSI SQL mode, so
    bare division by zero / bad casts RAISE at runtime — a 100 TB job must
    use the ``try_*`` forms to get NULL-on-error semantics instead of a
    3-hour job dying on one malformed row. try_divide (÷0 → NULL),
    try_element_at (out-of-bounds → NULL), and try_cast (unparseable →
    NULL) mirror DuckDB's natively NULL-yielding division, list_extract,
    and TRY_CAST. The quotient is TRUNCATED at 6 decimals, not rounded:
    both engines compute the identical IEEE quotient, but their round()
    functions split half-way ties differently (observed at sf0.1 — 4
    cells of 85k landed exactly on a 5e-7 tie), while floor on the same
    double is tie-free."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.try_divide("l_extendedprice", F.col("l_quantity") - 7) * 1000000)
            / 1000000
        ).alias("safe_ratio"),
        F.try_element_at(F.array("l_quantity"), F.lit(3)).alias("oob_elem"),
        F.col("l_returnflag").try_cast("double").alias("bad_cast"),
        F.col("l_quantity").cast("string").try_cast("double").alias("roundtrip_qty"),
    )


@register(
    "f2b_calendar_ops",
    family="F2",
    oracle="""
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER)            AS q,
               CAST(week(o_orderdate) AS INTEGER)               AS iso_week,
               CAST(last_day(o_orderdate) AS DATE)              AS month_end,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
               CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start
        FROM orders
    """,
)
def f2b_calendar_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar family beyond f2's field extraction: quarter, ISO week
    (Spark's ``weekofyear`` and DuckDB's ``week`` are both ISO 8601),
    month end, day arithmetic, and Monday-aligned week truncation — the
    billing/cohort date axes. ``datediff`` argument order differs between
    engines (Spark is (end, start), DuckDB ('day', start, end)) — pinned
    here so the convention is recorded once."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("q"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
    )


@register(
    "f1b_fuzzy_string_ops",
    family="F1",
    oracle="""
        SELECT p_partkey,
               CAST(levenshtein(p_brand, 'Brand#13') AS INTEGER) AS brand_dist,
               reverse(p_brand)                                  AS brand_rev,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0')          AS padded_key,
               repeat('*', CAST(p_size % 5 AS INTEGER))          AS size_stars,
               translate(p_brand, '#', '-')                      AS brand_dash
        FROM part
        WHERE levenshtein(p_brand, 'Brand#13') <= 2
    """,
)
def f1b_fuzzy_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy/formatting string family — the data-cleaning companions to
    f1's matchers: Levenshtein edit distance (typo-tolerant brand match,
    the poor man's record linkage), reverse, zero-padding for sortable
    fixed-width keys, repeat, and translate. All JVM built-ins with exact
    DuckDB counterparts; the edit-distance filter pushes nothing to the
    scan (function of a column), so at scale a prefix/length pre-filter
    belongs in front — here the table is a dimension."""
    part = load_table(spark, sf_dir, "part")
    dist = F.levenshtein("p_brand", F.lit("Brand#13"))
    return part.filter(dist <= 2).select(
        "p_partkey",
        dist.alias("brand_dist"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("size_stars"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
    )
