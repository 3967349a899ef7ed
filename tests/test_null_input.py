"""Null-value robustness: every registered query must survive inputs with
NULL metric values (the NaN→NULL staleness model — real Prometheus replay
data is full of them, prometheus.go:28-32) and NULL document text, written
in the DIRECTORY parquet layout every production writer produces.

Found by this probe (round 4): the prompb encoder struct.pack'd None, the
Misra-Gries partition summary called .split on None, stream_table's
pathGlobFilter silently matched ZERO part-files for directory-layout
tables (streams read nothing), and the rate/Holt-Winters stateful ops
lacked the null-skip their four siblings had.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# Whole-fleet NULL sweep + four NULL-corpus oracle-agreement runs
# (~4 min with fixtures): slow lane — run in full CI passes; the fast
# lane (`pytest -m "not slow"`) keeps the per-query smoke sweep.
pytestmark = pytest.mark.slow

from prometheus_remote_kinesis_spark.registry import all_queries
from prometheus_remote_kinesis_spark.schema import TABLES

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")),
            )
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("text")),
            )
        # DIRECTORY layout on purpose — regression-pins stream_table's
        # isdir branch (glob-filter streams read zero files otherwise)
        df.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_survive_nulls(spark, null_sf_dir):
    crashed = {}
    zero_rows_streaming = []
    for name, q in all_queries().items():
        try:
            n = q.fn(spark, null_sf_dir).count()
        except Exception as e:  # noqa: BLE001 — we report the full set
            crashed[name] = (str(e).splitlines() or [type(e).__name__])[0][:120]
            continue
        # streaming twins must actually SEE the directory-layout data —
        # zero rows here means the source matched no files
        if "stream" in name and n == 0:
            zero_rows_streaming.append(name)
    assert not crashed, crashed
    assert not zero_rows_streaming, zero_rows_streaming


# The stateful-op families whose three paths (batch twin, SQL oracle,
# streaming stateful op) must agree on NULL-bearing data. Round-4 ADVICE:
# streaming_rate/holt_winters dropped NULL samples while their oracles
# lag()'d across them (emitting a row per NULL event and NULLing the next
# increase) — counts and values diverged the moment values were NULL,
# invisible at sf0.01 because the driver data has none. Round 5 aligned all
# three paths on PromQL staleness semantics (NULL samples excluded
# everywhere); this test runs the REAL oracle comparison on NULL-bearing
# data so the alignment is pinned, not just claimed.
_NULL_ORACLE_FAMILIES = [
    "t10_counter_increase",
    "t10b_gap_fill",
    "t10bs_gap_fill_stream",
    "t13s_resample_linear_stream",
    "t10s_counter_increase_stream",
    "t14_rate_5m",
    "t14s_rate_5m_stream",
    "t17_prefix_anomaly",
    "t17s_prefix_anomaly_stream",
    "t20_holt_winters",
    "t20s_holt_winters_stream",
    # r7 (VERDICT r6 task #6): the r5/r6 streaming twins join the gate —
    # each must agree with its shared batch oracle on NULL-VALUE-bearing
    # data (complete-mode aggs see NULL samples; groupBy treats NULL as a
    # group on both engines, and the value-independent twins must simply
    # not flinch). t26/t26s/t28s are r7-new-or-realigned and enter
    # directly (t26's whole family adopted the t14 staleness convention
    # when the t26s stateful twin landed).
    "t25_rate_extrapolated",
    "t25s_rate_extrapolated_stream",
    # t22/t22s count NULL samples in n but skip them in sum/min/max (the
    # nv split in the stateful fold) — both paths must agree with the
    # oracle's count(*)-vs-aggregate asymmetry on NULL-bearing data.
    "t22_downsample_retention",
    "t22s_downsample_retention_stream",
    "t26_subquery_max_rate",
    "t26s_subquery_max_rate_stream",
    "t15s_funnel_stream",
    "t16s_retention_cohorts_stream",
    "t21s_promql_vector_ops_stream",
    "t23s_instant_vector_stream",
    "t24s_vector_matching_stream",
    "t27s_count_values_stream",
    "t28s_slo_burn_alert_stream",
    # a4s: NULL metric values (staleness markers) are excluded from the
    # bucket sketch identically on both engines (WHERE value IS NOT NULL).
    "a4s_quantile_sketch_stream",
    # t30/t30s: NULL samples are excluded BEFORE the delta chain on both
    # engines — a NULL slipping through would poison every downstream
    # delta-of-delta, not just its own row.
    "t30_dod_storage_sizing",
    "t30s_dod_sizing_stream",
    # r12 PromQL compiler paths: every new compile target inherits
    # _base's NULL-staleness exclusion (the fleet rule) and every oracle
    # carries the identical WHERE value IS NOT NULL — checked here on
    # NULL-injected data because the driver SFs contain no NULL values:
    # the grid bucket expansion (pqr1/pqr2), subquery fold (pq18), exact
    # quantile interpolation (pq19), label_replace projection (pq21),
    # counter-health lag pairs (pq23/pq24), wide-decimal regression
    # (pq25/pq26), and group_left matching (pq17).
    "pqr1_promql_range_sum_rate",
    "pqr2_promql_range_selector",
    "pq17_promql_group_left_ratio",
    "pq18_promql_subquery",
    "pq19_promql_quantile_over_time",
    "pq21_promql_label_replace",
    "pq23_promql_sum_resets",
    "pq24_promql_irate",
    "pq25_promql_deriv",
    "pq26_promql_predict_linear",
]


@pytest.fixture(scope="module")
def null_oracle_dir(spark, tmp_path_factory):
    """NULL-bearing copy of the smoke tables with DuckDB-readable
    timestamps (events' TIMESTAMP(NANOS) → micros), single-file-per-dir
    parquet, so the same oracles run unmodified on both engines."""
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    out = tmp_path_factory.mktemp("null_oracle_sf")
    for t in TABLES:
        df = load_table(spark, SF_SMOKE, t)  # normalizes nanos/NTZ → micros
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")),
            )
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("text")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_stateful_families_match_oracle_on_null_data(spark, null_oracle_dir):
    import duckdb

    import tools.verify_local as vl

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{null_oracle_dir}/{t}.parquet/*.parquet'"
        )
    qs = all_queries()
    failures = {}
    for name in _NULL_ORACLE_FAMILIES:
        q = qs[name]
        problems = vl.compare(name, q.fn(spark, null_oracle_dir), con.sql(q.oracle))
        if problems:
            failures[name] = problems
    assert not failures, failures


# Text-family twin of the stateful-family NULL test above (r5 code
# review): NULL-text documents are EXCLUDED from text processing on both
# engines — before r5, Spark shingled NULL as [''] (pairing every NULL doc
# with every other near-dup-wise) while DuckDB's string_split(NULL)
# dropped them, and d7's NULL hash band silently inflated every real
# band's rank offset by the NULL-doc count. Invisible at the driver SFs
# (no NULL text there); pinned here on a NULL-injected corpus.
_NULL_TEXT_ORACLE_FAMILIES = [
    "l1_exact_dedup",
    "l2b_ngram_jaccard",
    "l2c_simhash",
    "l2e_neardup_clusters",
    "l2h_minhash_md5",
    "l5_token_stats",
    # l5s: same expression tree streaming-executed — NULL token counts
    # skipped by sums while count(*) keeps the row, on both engines.
    "l5s_token_stats_stream",
    "l5d_fingerprints",
    "l5e_language_id",
    "l5j_bm25",
    "l6c_frame_stats",
    "d3_decontamination",
    "d3b_fuzzy_decontamination",
    "d7_deterministic_shuffle",
    "d9_substring_dedup",
    "d12_vocab_coverage",
    "d13_incremental_dedup",
    "d14_incremental_neardup",
    # d14s/l2s: same banding tree streaming-executed — NULL text excluded
    # by shingled_docs on the stream exactly as batch d14's manifest side.
    "d14s_incremental_neardup_stream",
    "l2s_band_collision_stream",
    # r7 late additions: the streaming l1 twin (NULL text digests to a
    # NULL group on both engines) and the manifest merge (NULL text
    # excluded on both paths like d13).
    "l1s_exact_dedup_stream",
    "d15_manifest_compaction",
    "d16_corpus_build_e2e",
    "d13s_incremental_dedup_stream",
    # l6s: NULL text routes to the text/plain branch where BOTH engines
    # coalesce the empty/NULL mean-byte quotient to 0.0 (l6b's contract);
    # the streaming execution must preserve that on a NULL-bearing corpus.
    "l6s_media_features_stream",
    # d17: NULL-text docs are excluded BEFORE segmentation on both
    # engines (Spark would otherwise segment NULL as [''] and a NULL doc
    # would steal keeper slots from every real empty-ish segment).
    "d17_segment_dedup",
    # d17s: same exclusion applied ON THE STREAM side before the
    # complete-mode keeper election AND on the static reassembly side.
    "d17s_segment_dedup_stream",
    # l2j (added r8, VERDICT r7 task #3): shingled_docs excludes NULL
    # text before prefix ranking; the all-pairs oracle carries the
    # matching WHERE text IS NOT NULL on BOTH sides of its self-join.
    "l2j_prefix_jaccard_join",
]


@pytest.fixture(scope="module")
def null_user_oracle_dir(spark, tmp_path_factory):
    """NULL-USER-bearing copy of the smoke tables (r6 ADVICE): user_id —
    a grouping/distinct key, not a metric value — goes NULL on a slice of
    events. Spark and DuckDB agree that GROUP BY keeps a NULL-key group
    but count(DISTINCT col)/count(col) drop NULLs; any operator that
    reimplements a distinct (t27s's two-phase streaming form) must land
    on exactly that split."""
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    out = tmp_path_factory.mktemp("null_user_sf")
    for t in TABLES:
        df = load_table(spark, SF_SMOKE, t)
        if t == "events":
            df = df.withColumn(
                "user_id",
                F.when(F.col("event_id") % 9 == 0, None).otherwise(
                    F.col("user_id")
                ),
            )
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


# Families whose oracles aggregate over user_id and must agree with Spark
# when user_id is NULL on a slice of rows. t27/t27s pin the r7 fix: the
# oracle's count(*) n_samples COUNTS NULL-user samples while its
# count(DISTINCT user_id) n_series drops them — the streaming twin must
# split the same way (it used to pre-filter NULL users, starving
# n_samples). t28/t28s ride along: their GROUP BY user_id keeps the
# NULL-user group identically on both engines.
_NULL_USER_ORACLE_FAMILIES = [
    "t27_count_values",
    "t27s_count_values_stream",
    "t28_slo_burn_alert",
    "t28s_slo_burn_alert_stream",
    # a3c/a3cs: NULL user_ids are excluded from the KMV hash domain on
    # both engines (WHERE user_id IS NOT NULL) — Spark would otherwise
    # hash the string "null"-less NULL to a NULL h (dropped by groupBy
    # min on one path, kept as a NULL group on another).
    "a3c_kmv_distinct",
    "a3cs_kmv_distinct_stream",
]


def test_t27_family_null_users(spark, null_user_oracle_dir):
    import duckdb

    import tools.verify_local as vl

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{null_user_oracle_dir}/{t}.parquet/*.parquet'"
        )
    qs = all_queries()
    failures = {}
    for name in _NULL_USER_ORACLE_FAMILIES:
        q = qs[name]
        problems = vl.compare(
            name, q.fn(spark, null_user_oracle_dir), con.sql(q.oracle)
        )
        if problems:
            failures[name] = problems
    assert not failures, failures


def test_text_families_match_oracle_on_null_text(spark, null_oracle_dir):
    import duckdb

    import tools.verify_local as vl

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{null_oracle_dir}/{t}.parquet/*.parquet'"
        )
    qs = all_queries()
    failures = {}
    for name in _NULL_TEXT_ORACLE_FAMILIES:
        q = qs[name]
        problems = vl.compare(name, q.fn(spark, null_oracle_dir), con.sql(q.oracle))
        if problems:
            failures[name] = problems
    assert not failures, failures
