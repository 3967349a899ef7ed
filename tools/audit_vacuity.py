"""Fleet-wide oracle VACUITY audit: a registered oracle that returns zero
rows at the driver's verification scale makes its hash check vacuous —
empty == empty passes forever, and any semantic or plan regression in the
query (or a real cross-engine divergence) sails through the bit-exact
gate unnoticed. Round-5 self-review caught sql19 in exactly this state;
this sweep then found five more (t25's 5-minute lookback held no series
with ≥2 samples, sql6 filtered on nation names that don't exist in this
corpus, sql9's 1.2× threshold exceeded the price spread's maximum, o4b's
EXCEPT subtracted a superset, d3b's 1%-eval split produced no pair above
the Jaccard threshold at sf0.01).

Runs every registered oracle on DuckDB only (no Spark — seconds, not
minutes) against sf0.01 and prints one JSON line:
``{"checked": N, "empty": [names...]}``; exits non-zero when any
non-whitelisted oracle is empty. Wired into pytest via
tests/test_queries.py::test_no_vacuous_oracles.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Oracles that are legitimately empty at sf0.01, with justification.
# (none currently — every registered oracle must select rows)
WHITELIST: set[str] = set()


def run_audit(sf_dir: str = SF_DIR) -> dict:
    import duckdb

    import __spark_entry__ as entry

    from prometheus_remote_kinesis_spark.schema import TABLES

    con = duckdb.connect()
    for t in TABLES:  # one source of truth — verify_local builds the same views
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    empty = []
    oracles = entry.oracle_sql()
    for name, sql in oracles.items():
        if len(con.execute(sql).fetchall()) == 0 and name not in WHITELIST:
            empty.append(name)
    # Corpus-assumption guard (r6 ADVICE): l6b's oracle sums ord(codepoint)
    # per CHARACTER while Spark sums utf-8 BYTES of the encoded blob —
    # equal only while documents.text is pure ASCII (bytes == chars). If
    # the corpus ever drifts non-ASCII this fails LOUDLY here instead of
    # surfacing as an opaque driver hash-red. DuckDB strlen() counts
    # bytes, length() counts characters; they differ iff non-ASCII.
    non_ascii = con.execute(
        "SELECT count(*) FROM documents "
        "WHERE text IS NOT NULL AND strlen(text) <> length(text)"
    ).fetchone()[0]
    return {"checked": len(oracles), "empty": empty, "non_ascii_docs": non_ascii}


if __name__ == "__main__":
    result = run_audit()
    print(json.dumps(result))
    sys.exit(1 if (result["empty"] or result["non_ascii_docs"]) else 0)
