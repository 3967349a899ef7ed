"""A/B probe: min-label propagation (l2e core) vs large-star/small-star
contraction (l2f core) on an adversarial CHAIN graph 0-1-2-...-n, the
worst case for label propagation (rounds = diameter) and the motivating
case for star contraction (rounds = O(log² n) on any shape).

Real dup components are shallow stars, so l2e wins there (fewer, cheaper
rounds); this probe records WHY the star variant exists anyway: at 100 TB
a single accidental chain (e.g. boilerplate pages each nearly-duplicating
the next revision) would stall propagation for diameter rounds.

Usage: python tools/probe_cc_star.py [chain lengths...]  (default: 64 256 1024)
Prints ONE JSON line per length.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.llm.dedup import (  # noqa: E402
    min_label_components,
    star_contract_components,
)
from prometheus_remote_kinesis_spark.session import get_spark  # noqa: E402

LABEL_CAP = 40  # propagation cap: a 1024-chain would need 1024 rounds


def chain_pairs(spark, n: int):
    return spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )


def main() -> None:
    lengths = [int(a) for a in sys.argv[1:]] or [64, 256, 1024]
    spark = get_spark("probe_cc_star")
    for n in lengths:
        pairs = chain_pairs(spark, n)

        t0 = time.time()
        star, star_rounds = star_contract_components(pairs)
        bad = star.filter(F.col("label") != F.lit(0)).count()
        star_s = round(time.time() - t0, 2)
        assert bad == 0, f"star contraction wrong on chain {n}: {bad} bad labels"

        t0 = time.time()
        labels, prop_rounds = min_label_components(pairs, max_rounds=LABEL_CAP)
        prop_bad = labels.filter(F.col("label") != F.lit(0)).count()
        prop_s = round(time.time() - t0, 2)

        print(
            json.dumps(
                {
                    "chain_n": n,
                    "star_rounds": star_rounds,
                    "star_sec": star_s,
                    "prop_rounds": prop_rounds,
                    "prop_converged": prop_bad == 0,
                    "prop_sec": prop_s,
                    "prop_cap": LABEL_CAP,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
