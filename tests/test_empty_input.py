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
