"""U-family: the Pandas-UDF / UDTF surface (SURVEY.md §2.10 U2-U4).

U1 (scalar decode UDF) lives in sources/remote_write.py; U5 (stateful map)
in streaming/stateful.py. Here: grouped-map (applyInPandas), grouped-agg
(pandas UDAF), and a UDTF — each with a DuckDB oracle so the Python path
is value-checked against a pure-SQL twin. These are deliberately the SLOW
path (Arrow-batched, but Python): use them only where built-ins can't
express the computation; the oracle pairs prove the semantics, the batch
size proves the plumbing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


@register(
    "u2_zscore_per_user",
    family="U2",
    oracle="""
        SELECT event_id,
               round((value - avg(value)  OVER (PARTITION BY user_id))
                     / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS z
        FROM events
    """,
)
def u2_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-series normalization (z-score per
    user). The pandas ddof=1 sample std matches SQL stddev_samp; the SQL
    window twin is the oracle. At scale this is one shuffle on the group
    key with arrow batches per group — the canonical U2 shape."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std()  # ddof=1, NaN for 1-row groups
        z = (pdf["value"] - pdf["value"].mean()) / std
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "z": z.round(6).where(pd.notna(z), None)}
        )

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").applyInPandas(zscore, "event_id long, z double")


@register(
    "u3_median_udaf",
    family="U3",
    oracle="""
        SELECT event_type,
               round(median(value), 6)       AS median_value,
               round(mad(value), 6)          AS mad_value
        FROM events
        GROUP BY event_type
    """,
)
def u3_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: exact median + median-absolute-deviation
    (no Spark built-in MAD). Both interpolate at even counts exactly like
    DuckDB's median/mad."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    @pandas_udf("double")
    def mad_udaf(v: pd.Series) -> float:
        return float((v - v.median()).abs().median())

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(median_udaf("value"), 6).alias("median_value"),
        F.round(mad_udaf("value"), 6).alias("mad_value"),
    )


@register(
    "u4_bigram_udtf",
    family="U4",
    oracle="""
        SELECT bigram, count(*) AS n
        FROM (
            SELECT unnest(list_transform(
                       range(1, len(string_split(text, ' '))),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1])) AS bigram
            FROM documents
        )
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 15
    """,
)
def u4_bigram_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF (Spark ≥3.5 ``udtf``): one doc row → many bigram rows, then a
    plain aggregation. Exercises the table-function surface; the built-in
    equivalent (transform+explode, used everywhere else) is the oracle's
    shape and the preferred production path."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="bigram string")
    class Bigrams:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for i in range(len(toks) - 1):
                yield (toks[i] + " " + toks[i + 1],)

    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    spark.udtf.register("bigrams", Bigrams)
    return spark.sql(
        """
        SELECT bigram, count(*) AS n
        FROM _docs_udtf, LATERAL bigrams(text)
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 15
        """
    )


@register(
    "u5_arrow_udf",
    family="U1",
    oracle="""
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS INT)
                   AS n_vowels,
               CAST(length(text) AS INT) AS n_chars
        FROM documents
    """,
)
def u5_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Arrow-optimized scalar Python UDF (``useArrow=True``):
    row-at-a-time Python signature, Arrow-batched transfer — the middle
    tier between classic pickled UDFs (~10-100× slower serialization) and
    full pandas UDFs. The body is deliberately trivial string counting so
    the oracle can mirror it; the point under test is the Arrow execution
    path itself. Prefer built-ins where they exist (this one IS
    expressible as regexp_replace+length — the UDF tiers are for logic
    that is not)."""
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def n_vowels(text: str) -> int:
        return sum(1 for ch in (text or "") if ch in "aeiou")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_vowels("text").alias("n_vowels"),
        F.length("text").cast("int").alias("n_chars"),
    )
