"""Empty-input robustness: every registered query must build and execute
against EMPTY tables (correct schemas, zero rows) without crashing.

At 100 TB this is not a corner case — a partition-pruned scan, a
fresh-onboarded tenant, or a retention-expired window all hand operators
empty inputs. The failure class is driver-side parameter collection
(`head()[0]` on a missing query vector, k-means seeding from an empty
sample, div-by-zero on corpus totals) — found by this probe: l3 and l4c
crashed before round 4 hardened them to return empty same-schema results.
"""

from __future__ import annotations

import pytest

# Whole-fleet sweep (182 queries × empty tables, ~100 s): slow lane.
# The fast lane (`pytest -m "not slow"`) keeps per-query smoke coverage
# via test_queries.py; this robustness sweep runs in full CI passes.
pytestmark = pytest.mark.slow

from prometheus_remote_kinesis_spark.registry import all_queries
from prometheus_remote_kinesis_spark.schema import TABLES

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_survive_empty_tables(spark, empty_sf_dir):
    crashed = {}
    for name, q in all_queries().items():
        try:
            q.fn(spark, empty_sf_dir).count()
        except Exception as e:  # noqa: BLE001 — we report the full set
            crashed[name] = (str(e).splitlines() or [type(e).__name__])[0][:120]
    assert not crashed, crashed


@pytest.fixture(scope="module")
def one_row_sf_dir(spark, tmp_path_factory):
    """Exactly ONE row per table — the n=1 degenerate class r4 ADVICE
    flagged: w1b's arithmetic percent_rank (rn-1)/(n-1) is 0/0 = NaN on a
    single-row partition while percent_rank() is DEFINED as 0.0 there.
    The empty-input probe can't see it (no rows, no cells)."""
    out = tmp_path_factory.mktemp("one_row_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(1).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_w1b_percent_rank_single_row_is_zero(spark, one_row_sf_dir):
    """With one 'F'-status order (or zero — then trivially empty), w1b
    must emit pct_rank 0.0 and cdist 1.0, never NaN."""
    import math

    from pyspark.sql import functions as F
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    # force exactly one qualifying row regardless of the sampled status
    orders = load_table(spark, one_row_sf_dir, "orders").limit(1)
    orders = orders.withColumn("o_orderstatus", F.lit("F"))
    one_dir = one_row_sf_dir + "_forced"
    import os, shutil

    if not os.path.isdir(one_dir):
        os.makedirs(one_dir)
        for t in TABLES:
            src = f"{one_row_sf_dir}/{t}.parquet"
            dst = f"{one_dir}/{t}.parquet"
            if t == "orders":
                orders.write.mode("overwrite").parquet(dst)
            else:
                shutil.copytree(src, dst)
    qs = all_queries()
    rows = qs["w1b_rank_family"].fn(spark, one_dir).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["pct_rank"] == 0.0 and not math.isnan(r["pct_rank"]), r
    assert r["cdist"] == 1.0, r
