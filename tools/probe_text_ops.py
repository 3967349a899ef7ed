"""Scaling probe for the text-pipeline ops added after the first scaling
sweep: bigram-LM scoring (l5h), substring-dup spans (d9), near-dup
clustering (l2e). Same replication scheme as bench_scale.py (replica tokens
suffixed so the near-dup pair space stays realistic while corpus volume
grows). Records the numbers behind SCALE.md's text-ops entry.

Usage: python tools/probe_text_ops.py [multipliers...]   (default: 1 4 16)
Prints ONE JSON line per multiplier.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scale import build_scaled_dir  # noqa: E402  (tools/ sibling)
from prometheus_remote_kinesis_spark.llm.dedup import (  # noqa: E402
    l2e_neardup_clusters,
)
from prometheus_remote_kinesis_spark.llm.pipeline import d9_substring_dedup  # noqa: E402
from prometheus_remote_kinesis_spark.llm.text import l5h_bigram_lm_score  # noqa: E402
from prometheus_remote_kinesis_spark.session import get_spark  # noqa: E402

OPS = {
    "l5h_bigram_lm": l5h_bigram_lm_score,
    "d9_substring_dedup": d9_substring_dedup,
    "l2e_neardup_clusters": l2e_neardup_clusters,
}


def timed(fn, spark, sf_dir) -> float:
    # These ops persist intermediates (posting lists, label-prop state) at
    # CONSTRUCTION time, so a steady-state re-read would measure only the
    # cached tail. Time the cold build + materialize, clearing the cache
    # between runs so multipliers don't share persisted state.
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, sf_dir).toPandas()
    return round(time.time() - t0, 3)


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("probe_text_ops")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    workdir = tempfile.mkdtemp(prefix="probe_text_")
    try:
        for m in multipliers:
            sf_dir = build_scaled_dir(spark, m, workdir)
            out = {"multiplier": m}
            for name, fn in OPS.items():
                out[name] = timed(fn, spark, sf_dir)
            print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
