"""Operator-level accuracy checks that aren't oracle pairs."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_approx_quantiles_rank_error(spark):
    """a4b: Greenwald-Khanna guarantees RANK error (≤ 1/accuracy), not
    value error — on a skewed tail the returned value can differ a lot
    while being rank-exact. Assert each approx quantile's actual rank
    fraction is within the sketch bound (plus one discrete step for the
    group size)."""
    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    q = all_queries()
    approx = {
        r.event_type: r for r in q["a4b_approx_quantiles"].fn(spark, SF_SMOKE).collect()
    }
    values: dict[str, list[float]] = {}
    for r in load_table(spark, SF_SMOKE, "events").select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)

    assert set(values) == set(approx)
    for t, vals in values.items():
        vals.sort()
        n = len(vals)
        for p, col in ((0.50, "p50"), (0.90, "p90"), (0.99, "p99")):
            a = float(approx[t][col])
            rank_frac = sum(1 for v in vals if v <= a) / n
            tol = 1.0 / 10000 + 1.5 / n  # sketch bound + discrete grid step
            assert abs(rank_frac - p) <= tol, (t, col, p, rank_frac, n)
