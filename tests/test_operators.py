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

def test_hll_union_matches_direct(spark):
    """a3b: union of per-day HLL partials must equal a direct sketch of
    the whole range (DataSketches merge is lossless at same lgConfigK),
    and the estimate must be within the lgConfigK=14 error bound
    (~0.8% rsd; allow 5 sigma) of the exact distinct count."""
    import pyspark.sql.functions as F

    from prometheus_remote_kinesis_spark.registry import all_queries
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    q = all_queries()
    merged = {
        r.event_type: r
        for r in q["a3b_hll_mergeable_rollup"].fn(spark, SF_SMOKE).collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    direct = {
        r.event_type: r.est
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("est")
        )
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(direct) == set(exact)
    for t in exact:
        assert merged[t].est_users == direct[t], (t, merged[t], direct[t])
        assert abs(merged[t].est_users - exact[t]) <= max(3.0, 0.04 * exact[t]), (
            t,
            merged[t].est_users,
            exact[t],
        )
        assert merged[t].n_partials >= 1


def test_mg_heavy_hitters_partition_invariance(spark):
    """The Misra-Gries candidate pass must contain the exact top-20 under
    ANY partitioning (the pigeonhole bound) — exercise the adversarial
    direction by slicing the corpus into many tiny partitions and checking
    the two-phase result still equals the exact one."""
    from pyspark.sql import functions as F

    from prometheus_remote_kinesis_spark.operators.aggregates import (
        a12_heavy_hitters_mg,
    )
    from prometheus_remote_kinesis_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(20)
        .collect()
    )
    two_phase = a12_heavy_hitters_mg(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in two_phase] == [tuple(r) for r in exact]

    # adversarial partitioning: 64 slivers of a small corpus — every
    # partition summary is noisy, the union must still cover the top-20
    import prometheus_remote_kinesis_spark.sources.tables as tables

    key = next(iter(k for k in tables._DF_CACHE if k[1] == SF_SMOKE and k[2] == "documents"), None)
    sliced = docs.repartition(64)
    saved = tables._DF_CACHE.copy()
    try:
        for k in list(tables._DF_CACHE):
            if k[2] == "documents":
                tables._DF_CACHE[k] = sliced
        if key is None:
            app = spark.sparkContext.applicationId
            tables._DF_CACHE[(app, SF_SMOKE, "documents")] = sliced
        two_phase_64 = a12_heavy_hitters_mg(spark, SF_SMOKE).collect()
    finally:
        tables._DF_CACHE.clear()
        tables._DF_CACHE.update(saved)
    assert [tuple(r) for r in two_phase_64] == [tuple(r) for r in exact]
