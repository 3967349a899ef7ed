"""L-family: deduplication (SURVEY.md §2.9 L1-L2) — exact, MinHash+LSH,
SimHash, exact n-gram Jaccard.

Scale posture: exact dedup is a hash-groupBy on a digest (one shuffle of
64-byte keys, never of document text). MinHash/LSH is the 100 TB near-dup
path: signatures are fixed-size (32×8 bytes), banding turns the quadratic
all-pairs problem into a groupBy on band keys, and only bucket-mates are
compared. Everything except SimHash is built-in-function JVM code.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table

N_PERM = 32  # minhash permutations
N_BANDS = 8  # LSH bands → 4 rows/band; ~0.5 jaccard detection knee
ROWS_PER_BAND = N_PERM // N_BANDS


def _shingles_expr(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a whitespace-tokenized document.

    UNDERSCORE-FENCED (r9 VERDICT task #7): evaluates ``split(text)``
    inside the lambda for every gram — O(tokens²) per document. Kept
    ONLY for expression-level composition in tests; every REGISTERED
    query must go through :func:`shingled_docs`, which tokenizes once
    per row (tests/test_llm.py::test_quadratic_shingles_helper_fenced
    asserts no package module references this helper)."""
    toks = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    # Documents shorter than n tokens get the whole text as one shingle.
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(text))
    )


def shingled_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, sh) with distinct word n-gram shingles, tokenizing ONCE per row.

    Two deliberate physical choices, both measured at sf0.1 (9.2s → 2.7s
    for the shingle stage):

    - tokens are materialized in their own projection, so each
      ``element_at`` indexes an already-split array instead of re-running
      ``split(text)`` inside the higher-order-function lambda (Catalyst
      does not CSE across lambda bodies) — O(T) not O(T²) per doc;
    - the corpus is repartitioned to the session's default parallelism:
      document corpora arrive as few dense files, and shingling is
      compute-bound, so without this the whole stage runs on the file
      count's worth of cores. At 100 TB the input has thousands of
      splits and AQE coalesces instead — the repartition is then a
      cheap no-op-ish rebalance, never a correctness dependency.
    """
    spark = docs.sparkSession
    # NULL-text docs are EXCLUDED from shingling on both engines (the
    # text-family analog of the metrics NULL-staleness rule): without
    # this, Spark shingled NULL as [''] — pairing every NULL doc with
    # every other — while DuckDB's string_split(NULL) dropped them, a
    # latent all-NULL-docs-cluster divergence invisible at the driver
    # SFs (r5 code review; every consumer's oracle carries the matching
    # WHERE text IS NOT NULL).
    toked = (
        docs.filter(F.col(text_col).isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
    )
    # ONE parsed expression instead of ~n·4 Column round trips (r13 guide
    # §4/§1.2: every F.* call is a synchronous Py4J round trip; the SQL
    # text parses to the IDENTICAL Catalyst tree — same element_at /
    # concat_ws / transform nodes, same int lambda arithmetic)
    parts = ", ".join(
        f"element_at(toks, CAST(i + {j} + 1 AS INT))" for j in range(n)
    )
    return toked.select(
        id_col,
        F.expr(
            f"array_distinct(CASE WHEN size(toks) >= {n} THEN "
            f"transform(sequence(0, size(toks) - {n}), "
            f"i -> concat_ws(' ', {parts})) "
            f"ELSE array(concat_ws(' ', toks)) END)"
        ).alias("sh"),
    )


def minhash_signature(
    shingle_col: Column | str = "sh", n_perm: int = N_PERM
) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, i). Seeding xxhash64 with the permutation index is
    the standard trick for a family of independent hash functions without
    driver-side coefficients — all JVM-side, no UDF.

    Single-pass fold: one traversal of the shingle array computing all
    n_perm hashes per shingle and folding with element-wise least. (The
    naive per-permutation ``array_min(transform(...))`` form re-evaluates
    the shingle expression n_perm times — measured 25× slower.)

    Given a COLUMN NAME, the whole fold builds as one parsed expression —
    ~2·n_perm fewer Py4J round trips per build (r13), identical Catalyst
    tree (xxhash64 hashes the (shingle, int-literal) tuple either way).
    A Column argument (arbitrary shingle expressions, e.g. in tests)
    takes the equivalent Column-algebra path."""
    if isinstance(shingle_col, str):
        hashes = ", ".join(f"xxhash64(s, {i})" for i in range(n_perm))
        return F.expr(
            f"aggregate({shingle_col}, "
            f"array_repeat(CAST({2**63 - 1} AS BIGINT), {n_perm}), "
            f"(acc, s) -> zip_with(acc, array({hashes}), (a, b) -> least(a, b)))"
        )
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), n_perm)
    return F.aggregate(
        shingle_col,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(n_perm)]),
            lambda a, b: F.least(a, b),
        ),
    )


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b) that
    collide in ≥1 band, with the signature-estimated Jaccard attached.

    groupBy-free formulation: explode to (band_key, id, sig), self-join on
    band_key — at scale this is a shuffle on short band keys; hot buckets
    (boilerplate docs) are exactly the pairs we want, and AQE skew-join
    splits them.

    r13 (guide §2.3 — shuffle fewer bytes): the signature-agreement count
    ``m`` is computed in the join's probe stage, BEFORE the pair-dedup
    exchange, so that exchange carries (id_a, id_b, m) — 24 bytes/row —
    instead of both 32-long signature arrays (~550 bytes/row), and the
    dedup aggregates a plain int (``max``; every colliding band sees the
    same two signatures, so m is constant per pair) in a HashAggregate
    instead of `first(array)` buffers in a SortAggregate + sort. est is
    m/N_PERM, bit-identical to the old post-dedup computation.
    """
    # band structs + the agreement fold as parsed expressions: one Py4J
    # round trip each instead of ~4·N_BANDS (r13; identical Catalyst
    # trees — same struct/hash/slice and zip_with/aggregate nodes)
    band_structs = ", ".join(
        f"struct({b} AS band, "
        f"hash(slice(sig, {b * ROWS_PER_BAND + 1}, {ROWS_PER_BAND})) AS bh)"
        for b in range(N_BANDS)
    )
    banded = docs.select(
        F.col(id_col),
        F.col("sig"),
        F.expr(f"explode(array({band_structs}))").alias("bk"),
    ).select(id_col, "sig", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    left = banded.select(
        F.col("band"), F.col("bh"),
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
    )
    right = banded.select(
        F.col("band"), F.col("bh"),
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
    )
    m = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (a, b) -> CAST(a = b AS INT)), "
        "0, (acc, x) -> acc + x)"
    )
    pairs = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", m.alias("m"))
        .groupBy("id_a", "id_b")
        .agg(F.max("m").alias("m"))
    )
    est = F.col("m") / F.lit(N_PERM)
    return pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))


# --- l2h: MinHash+LSH with a CROSS-ENGINE hash family (oracle-backed) ---
#
# l2's production MinHash seeds JVM xxhash64 — fast, but no SQL engine
# reproduces it, so l2 is rows-only (recall pytest only). This twin swaps
# the hash family for md5-derived 60-bit ints, which BOTH engines compute
# bit-identically (Spark conv(substring(md5(s||':'||i),1,15),16,10) ==
# DuckDB ('0x'||substring(md5(...),1,15))::BIGINT — probed equal), putting
# the ENTIRE MinHash→band→bucket-join→estimate pipeline inside the
# driver's hash gate: 8 permutations, 4 bands × 2 rows, est ≥ 0.25 (≥2/8
# matching signature positions — exact eighths, so the rounded double is
# engine-identical by construction). md5 costs ~3× xxhash64 per shingle;
# production keeps l2, the gate keeps this.

_MD5_PERMS = 8
_MD5_BANDS = 4
_MD5_RPB = 2

L2H_ORACLE = """
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct(
                   CASE WHEN len(string_split(text, ' ')) >= 3
                        THEN list_transform(
                               range(1, len(string_split(text, ' ')) - 1),
                               i -> string_split(text, ' ')[i] || ' ' ||
                                    string_split(text, ' ')[i+1] || ' ' ||
                                    string_split(text, ' ')[i+2])
                        ELSE [text] END)) AS shingle
        FROM documents
        WHERE text IS NOT NULL
    ),
    h AS (
        SELECT doc_id, p.i AS perm,
               min(('0x' || substring(md5(shingle || ':' || p.i), 1, 15))::BIGINT)
                   AS mh
        FROM sh, range(8) p(i)
        GROUP BY doc_id, p.i
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY perm) AS sig FROM h GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.i AS band,
               CAST(sig[b.i*2 + 1] AS VARCHAR) || '|' ||
               CAST(sig[b.i*2 + 2] AS VARCHAR) AS key
        FROM sig, range(4) b(i)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                                 AND a.doc_id < b.doc_id
    ),
    est AS (
        SELECT c.id_a, c.id_b,
               sum(CASE WHEN ha.mh = hb.mh THEN 1 ELSE 0 END) AS m
        FROM cand c
        JOIN h ha ON ha.doc_id = c.id_a
        JOIN h hb ON hb.doc_id = c.id_b AND hb.perm = ha.perm
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(m / 8.0, 4) AS est_jaccard
    FROM est WHERE m >= 2
"""


def _md5_hash64(col: Column, i: int) -> Column:
    """60-bit integer hash from the first 15 hex chars of md5(s + ':' + i)
    — the cross-engine-exact hash family (always positive: fits BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f":{i}"))), 1, 15), 16, 10
    ).cast("long")


def _md5_sig_expr() -> Column:
    """The MinHash fold over ``sh`` with the md5 family (`_md5_hash64`),
    as ONE parsed expression — shared by l2h and md5_band_keys (r13
    build diet: one Py4J round trip instead of ~2·perms; the SQL text
    parses to the identical Catalyst tree as the Column fold)."""
    hashes = ", ".join(
        f"CAST(conv(substring(md5(concat(s, ':{i}')), 1, 15), 16, 10) "
        f"AS BIGINT)"
        for i in range(_MD5_PERMS)
    )
    return F.expr(
        f"aggregate(sh, "
        f"array_repeat(CAST({2**63 - 1} AS BIGINT), {_MD5_PERMS}), "
        f"(acc, s) -> zip_with(acc, array({hashes}), (a, b) -> least(a, b)))"
    )


def _md5_band_explode() -> Column:
    """explode() over the 4 md5-LSH band-key structs of ``sig`` as one
    parsed expression (r13 build diet, tree-identical)."""
    structs = ", ".join(
        f"struct({b} AS band, concat_ws('|', "
        f"CAST(slice(sig, {b * _MD5_RPB + 1}, {_MD5_RPB}) "
        f"AS ARRAY<STRING>)) AS key)"
        for b in range(_MD5_BANDS)
    )
    return F.expr(f"explode(array({structs}))")


@register("l2h_minhash_md5", family="L2", oracle=L2H_ORACLE)
def l2h_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4×2) near-dup candidates with the md5 hash family —
    the oracle-backed twin of l2 (same single-pass signature fold, same
    band/bucket-join plan shape; only the hash function differs). Every
    stage of the LSH pipeline is hash-compared against DuckDB.

    r13: same two physical fixes as l2 — the signature table is persisted
    so the self-join's two references don't re-inline the md5 MinHash
    stage, and the agreement count m moves before the pair-dedup exchange
    (numeric HashAggregate, 24 B/row shuffle instead of signature
    arrays + SortAggregate). m is constant per pair across bands, so
    max(m) ≡ the old post-dedup computation; est = round(m/8.0, 4)
    verbatim — oracle hash unchanged."""
    from pyspark import StorageLevel

    docs = shingled_docs(load_table(spark, sf_dir, "documents"))
    # the md5 fold, band structs and agreement count as parsed
    # expressions — one Py4J round trip each (r13, same mechanism as l2;
    # identical Catalyst trees, oracle hash unchanged)
    d = docs.select("doc_id", _md5_sig_expr().alias("sig")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    banded = d.select(
        "doc_id",
        "sig",
        _md5_band_explode().alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = banded.select(
        "band", "key", F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    right = banded.select(
        "band", "key", F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    m = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (a, b) -> CAST(a = b AS INT)), "
        "0, (acc, x) -> acc + x)"
    )
    pairs = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", m.alias("m"))
        .groupBy("id_a", "id_b")
        .agg(F.max("m").alias("m"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(F.col("m") / F.lit(float(_MD5_PERMS)), 4).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= 0.25)


L1_ORACLE = """
        SELECT sha256(text)  AS doc_hash,
               count(*)      AS n_copies,
               min(doc_id)   AS rep_id
        FROM documents
        GROUP BY sha256(text)
    """


@register("l1_exact_dedup", family="L1", oracle=L1_ORACLE)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on a content digest, keep the min-id
    representative. The shuffle ships 32-byte digests, not text — the only
    exact-dedup shape that works at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.sha2("text", 256).alias("doc_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("rep_id"),
    )


@register("l2_minhash_lsh_pairs", family="L2", oracle=None, bench=True)
def l2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(8×4) near-dup candidate pairs with estimated
    Jaccard ≥ 0.25. No SQL oracle (hash-family dependent) — recall vs the
    exact l2b query is asserted in tests/test_llm.py.

    The signature table is persisted (lazy, populated during this query's
    own execution — the l2b inverted-index precedent): the LSH self-join
    references it twice, and without materialization each reference
    re-inlines the whole shingle+MinHash subplan, running the dominant
    compute stage twice (r13, guide §8 step 1: fingerprint once, decide
    on the small table). At 100 TB the cached table is (id, 32×8B sig) —
    a fixed ~270 B/doc regardless of document size."""
    from pyspark import StorageLevel

    docs = (
        shingled_docs(load_table(spark, sf_dir, "documents"))
        .select("doc_id", minhash_signature("sh").alias("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return lsh_candidate_pairs(docs).filter(F.col("est_jaccard") >= 0.25)


@register(
    "l2b_ngram_jaccard",
    family="L2",
    oracle="""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(
                       CASE WHEN len(string_split(text, ' ')) >= 3
                            THEN list_transform(
                                   range(1, len(string_split(text, ' ')) - 1),
                                   i -> string_split(text, ' ')[i] || ' ' ||
                                        string_split(text, ' ')[i+1] || ' ' ||
                                        string_split(text, ' ')[i+2])
                            ELSE [text] END)) AS shingle
            FROM documents
            WHERE text IS NOT NULL
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2
    """,
)
def l2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard near-dup pairs (≥0.2) via the shared-shingle
    inverted-index join — the brute-force ground truth the LSH variant
    (l2_minhash_lsh_pairs) approximates. Linear in total shingle
    postings, not in doc pairs: only docs sharing a shingle ever meet.

    The posting list feeds THREE consumers (sizes + both self-join sides);
    without materialization Spark recomputes the shingle stage for each
    (measured 3.3× slower at sf0.1). ``persist`` is the local-mode form of
    the at-scale pattern: materialize the inverted index once (checkpoint
    / intermediate table) and join against it."""
    from pyspark import StorageLevel

    sh = (
        shingled_docs(load_table(spark, sf_dir, "documents"))
        .select("doc_id", F.explode("sh").alias("shingle"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.2)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "l2d_embedding_neardup",
    family="L2",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT id_a, id_b, round(cos, 6) AS cos_sim
        FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        WHERE cos >= 0.4
    """,
)
def l2d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ 0.4) — the semantic
    near-dup axis the lexical variants (MinHash/Jaccard/SimHash) miss.

    Normalize once per vector, then the pairwise score is a plain dot
    product — halves the per-pair arithmetic of the naive form. The
    self-join here is exact all-pairs (fine for a dedup batch where one
    side is a daily increment); at 100 TB corpus×corpus scale the same
    scoring sits downstream of the l4b LSH bucketer instead.
    """
    from prometheus_remote_kinesis_spark.llm.similarity import dot

    emb = load_table(spark, sf_dir, "embeddings")
    norm = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x.cast("double") / F.sqrt(dot(F.col("embedding"), F.col("embedding"))),
        ).alias("v"),
    )
    a = norm.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = norm.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= 0.4)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_sim"))
    )


L2E_ORACLE = """
    WITH RECURSIVE sh AS (
        SELECT doc_id, unnest(list_distinct(
                   CASE WHEN len(string_split(text, ' ')) >= 3
                        THEN list_transform(
                               range(1, len(string_split(text, ' ')) - 1),
                               i -> string_split(text, ' ')[i] || ' ' ||
                                    string_split(text, ' ')[i+1] || ' ' ||
                                    string_split(text, ' ')[i+2])
                        ELSE [text] END)) AS shingle
        FROM documents
        WHERE text IS NOT NULL
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2
    ),
    e2 AS (SELECT id_a AS a, id_b AS b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT a, b FROM e2
        UNION
        SELECT r.a, e.b FROM reach r JOIN e2 e ON r.b = e.a
    ),
    lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a),
    assigned AS (
        SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    )
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_rep
    FROM assigned
"""


def min_label_components(
    pairs: DataFrame, max_rounds: int = 50
) -> tuple[DataFrame, int]:
    """Pregel-style min-label propagation over an undirected pair list
    (columns ``id_a, id_b``) → (labels ``node, label``, rounds taken).
    Rounds grow with component DIAMETER — fine for shallow dup stars,
    pathological on chains (see ``star_contract_components``). Each
    round: one join + one groupBy keyed on node id, eager
    localCheckpoint so plan depth and driver heap stay O(1)/round."""
    edges = (
        pairs.unionByName(
            pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("dlab")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlab").alias("nbr_label"))
            .select(F.col("src").alias("node"), "nbr_label")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("nbr_label", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        converged = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    return labels, rounds


def star_contract_components(
    pairs: DataFrame, max_rounds: int = 30
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") over an undirected
    pair list (columns ``id_a, id_b``) → (labels ``node, label``, rounds).
    Converges in O(log² n) rounds on ANY graph shape; at fixpoint the
    edge set IS the star node → component minimum. Note: isolated pairs
    (u, min) already at fixpoint stay as-is, and singleton components
    don't appear — callers coalesce missing nodes to themselves."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .repartition(16, "u")
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for i in range(max_rounds):
        rounds += 1
        # Large-star over the symmetrized neighborhoods.
        g = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            g.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("mu"))
        )
        ls = (
            g.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mu").alias("v"))
            .distinct()
        )
        # Small-star on large→small oriented edges.
        d = (
            ls.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        sm = d.groupBy("u").agg(F.min("v").alias("mu"))
        joined = d.join(sm, "u")
        new_edges = (
            joined.select(F.col("v").alias("a"), F.col("mu").alias("b"))
            .unionByName(joined.select(F.col("u").alias("a"), F.col("mu").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .repartition(16, "u")
            .localCheckpoint(eager=True)
        )
        # Star = fixpoint of both ops, so convergence ⟺ unchanged edge
        # multiset; one short-circuited job over the two checkpointed sets.
        converged = i >= 1 and (
            new_edges.exceptAll(edges)
            .unionByName(edges.exceptAll(new_edges))
            .isEmpty()
        )
        edges = new_edges
        if converged:
            break
    return edges.select(F.col("u").alias("node"), F.col("v").alias("label")), rounds


@register("l2e_neardup_clusters", family="L2", oracle=L2E_ORACLE)
def l2e_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING — the step pair-generators (l2/l2b) stop short
    of: connected components over the duplicate-pair graph, so a chain
    A~B~C collapses to ONE cluster even when A and C never pair directly.
    Every document gets (cluster_id = min doc_id in its component,
    cluster_size, is_rep); keep-one dedup is then ``WHERE is_rep``.

    Pregel-style min-label propagation: labels start as doc_id; each
    round joins labels to the edge list and takes the elementwise min
    over neighbors, until a fixpoint. Each round is ONE shuffle keyed on
    node id — the driver only checks the converged-yet flag, data never
    leaves the executors. Rounds = graph diameter; dup components are
    shallow (boilerplate stars), so this is 2-4 rounds in practice. At
    100 TB the refinements are (a) the alternating large-star/small-star
    form (O(log²·n) rounds on adversarial chains — see ``l2f``) and (b)
    eager localCheckpoint per round to truncate lineage. Oracle: DuckDB
    recursive-CTE transitive closure, exact on the same pair set."""
    pairs = l2b_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    labels, _rounds = min_label_components(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.join(
        labels.select(F.col("node").alias("doc_id"), "label"), "doc_id", "left"
    ).select("doc_id", F.coalesce("label", "doc_id").alias("cluster_id"))
    csizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return assigned.join(csizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_rep"),
    )


@register("l2f_neardup_clusters_star", family="L2", oracle=L2E_ORACLE)
def l2f_neardup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l2e's connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the adversarial-scale variant: plain min-label propagation needs
    O(diameter) rounds (a 1M-long chain = 1M rounds); star alternation
    contracts in O(log² n) rounds regardless of shape. Large-star hooks
    every strictly-larger neighbor to its neighborhood minimum;
    small-star re-points the smaller neighbors; at fixpoint the edge set
    IS the star (node → component minimum). Each half-round is one
    groupBy + one join keyed on node id — no collect_list of
    neighborhoods, so a celebrity node's neighborhood never materializes
    in one task. Same oracle as l2e (recursive-CTE closure).

    Each round's edge set goes through eager localCheckpoint, not
    persist: checkpoint truncates the lineage, so plan size, Catalyst
    analysis time, and driver heap stay O(1) per round instead of
    doubling (a plain persist chain OOMs a 1 GiB vanilla driver at
    sf0.01). On a real cluster prefer reliable checkpoint dirs; the
    shuffle stays keyed on node id either way. Measured rounds-vs-
    diameter A/B vs l2e: ``tools/probe_cc_star.py`` / SCALE.md."""
    pairs = l2b_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    star, _rounds = star_contract_components(pairs)
    labels = star.select(F.col("node").alias("doc_id"), "label")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assigned = docs.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
    )
    csizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return assigned.join(csizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_rep"),
    )


L2C_ORACLE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    th AS (
        SELECT doc_id, ('0x' || substring(md5(tok), 1, 16))::UBIGINT AS h
        FROM toks
    ),
    votes AS (
        SELECT doc_id, b.i AS bit,
               sum(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th, range(64) b(i)
        GROUP BY doc_id, b.i
    ),
    sig AS (
        SELECT doc_id,
               coalesce(bit_or(CASE WHEN v > 0
                                    THEN CAST(1 AS UBIGINT) << bit END),
                        0) AS s
        FROM votes GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CAST(s AS HUGEINT)
                - CASE WHEN s >= CAST(9223372036854775808 AS UBIGINT)
                       THEN CAST(18446744073709551616 AS HUGEINT)
                       ELSE 0 END AS BIGINT) AS simhash,
           CAST(s >> 48 AS BIGINT) AS bucket16
    FROM sig
"""


@register("l2c_simhash", family="L2", oracle=L2C_ORACLE)
def l2c_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (token-unigram features, md5-derived
    bit hashes — platform-stable), plus a 16-bit prefix usable as a
    hamming-LSH bucket key. Arrow-batched pandas UDF: the per-token
    bit-vote accumulation is genuinely imperative (SURVEY.md guidance:
    pandas UDF when built-ins can't express it).

    Oracle-checked since r5: the pandas UDF's first-8-bytes-of-md5 hash
    is the same value DuckDB computes as
    ``('0x' || substring(md5(tok), 1, 16))::UBIGINT``, so the oracle
    re-runs the whole bit-vote in SQL (duplicate tokens keep their
    votes via unnest; sign bit handled by an explicit two's-complement
    wrap, probed bit-identical including negative signatures) — a
    Python-imperative operator hash-verified against a declarative
    reformulation on a different engine."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash64(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.int64)
        for row, text in enumerate(texts):
            hs = np.array(
                [
                    int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                    for tok in (text or "").split(" ")
                ],
                dtype=np.uint64,
            )
            bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # (ntok, 64)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(i)
            out[row] = sig.astype(np.int64)
        return pd.Series(out)

    # NULL-text docs excluded on both engines (shingled_docs convention)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.select(
        "doc_id",
        simhash64(F.col("text")).alias("simhash"),
    ).withColumn("bucket16", F.shiftrightunsigned("simhash", 48))


# Incremental near-dup (r7): the recurring-crawl shape for NEAR-duplicates,
# the d13 pattern one level up. The already-ingested corpus is represented
# by a digest-only LSH manifest — its DISTINCT (band, key) pairs, ~4 short
# strings per doc — and each incoming document probes the manifest with its
# own 4 band keys: any collision marks it a near-dup CANDIDATE (routed to
# pairwise verification, l2h's estimator), zero collisions let it skip the
# expensive stages entirely. Same md5 hash family as l2h, so every stage is
# DuckDB-checkable.
D14_ORACLE = """
    WITH sh AS (
        SELECT doc_id, unnest(list_distinct(
                   CASE WHEN len(string_split(text, ' ')) >= 3
                        THEN list_transform(
                               range(1, len(string_split(text, ' ')) - 1),
                               i -> string_split(text, ' ')[i] || ' ' ||
                                    string_split(text, ' ')[i+1] || ' ' ||
                                    string_split(text, ' ')[i+2])
                        ELSE [text] END)) AS shingle
        FROM documents
        WHERE text IS NOT NULL
    ),
    h AS (
        SELECT doc_id, p.i AS perm,
               min(('0x' || substring(md5(shingle || ':' || p.i), 1, 15))::BIGINT)
                   AS mh
        FROM sh, range(8) p(i)
        GROUP BY doc_id, p.i
    ),
    sig AS (SELECT doc_id, list(mh ORDER BY perm) AS sig FROM h GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.i AS band,
               CAST(sig[b.i*2 + 1] AS VARCHAR) || '|' ||
               CAST(sig[b.i*2 + 2] AS VARCHAR) AS key
        FROM sig, range(4) b(i)
    ),
    manifest AS (
        SELECT DISTINCT band, key FROM bands WHERE doc_id % 2 = 0
    ),
    inc AS (SELECT * FROM bands WHERE doc_id % 3 = 0)
    SELECT inc.doc_id,
           CAST(sum(CASE WHEN m.key IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bands_hit,
           (sum(CASE WHEN m.key IS NOT NULL THEN 1 ELSE 0 END) > 0)
               AS is_candidate
    FROM inc LEFT JOIN manifest m
      ON inc.band = m.band AND inc.key = m.key
    GROUP BY inc.doc_id
"""


def md5_band_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH band keys via the md5 MinHash family —
    shared by batch d14 and the d14s streaming twin (every stage is a
    stateless projection: shingle transform, signature fold, band
    explode — so it runs identically on a streaming DataFrame)."""
    docs = shingled_docs(docs)
    banded = (
        docs.select("doc_id", _md5_sig_expr().alias("sig"))
        .select("doc_id", _md5_band_explode().alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    return banded


@register("d14_incremental_neardup", family="L7", oracle=D14_ORACLE)
def d14_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta) NEAR-dup screening — d13's recurring-crawl
    shape applied to near-duplicates: the incoming batch (doc_id % 3 = 0)
    probes the prior snapshot's LSH band-key manifest (DISTINCT
    (band, key) of doc_id % 2 = 0) with its own MinHash(8)/LSH(4x2) band
    keys; ``n_bands_hit`` counts colliding bands and any hit flags the
    doc a near-dup candidate for pairwise verification (l2h's
    estimator), while zero-hit docs — the common case in a healthy
    crawl — skip every expensive downstream stage. Docs in both slices
    (doc_id % 6 = 0) hit all 4 of their own bands: genuine re-crawls.

    At 100 TB this is THE near-dedup access pattern: the corpus is never
    re-shingled — its manifest is 4 short digest strings per doc
    (same order as d13's 32-byte exact manifest), the incoming side is
    the small daily batch, and the probe is one equi-join on (band, key)
    carrying band digests, never text or signatures. Same md5 hash
    family as l2h (`_md5_hash64`), so the whole pipeline — shingle,
    signature fold, banding, manifest probe — is hash-compared against
    DuckDB end to end."""
    banded = md5_band_keys(load_table(spark, sf_dir, "documents"))
    manifest = (
        banded.filter(F.col("doc_id") % 2 == 0)
        .select("band", "key")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    inc = banded.filter(F.col("doc_id") % 3 == 0)
    n_hits = F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
    return (
        inc.join(manifest, ["band", "key"], "left")
        .groupBy("doc_id")
        .agg(n_hits.alias("n_bands_hit"))
        .select(
            "doc_id",
            "n_bands_hit",
            (F.col("n_bands_hit") > 0).alias("is_candidate"),
        )
    )


# l2j: exact set-similarity threshold τ = 1/2 (Jaccard ≥ 0.5 — the
# "mostly the same page" regime; 25 qualifying pairs at sf0.01).
L2J_TAU_NUM = 1
L2J_TAU_DEN = 2

# Frequency split for the exact-verify tier (l2j/l2k): shingles with
# posting length ≤ L2_HOT_F count their pair intersections through a
# direct inverted-index join — Σf² ≤ L2_HOT_F · |postings|, LINEAR in
# the corpus by construction — while the few hotter-than-L2_HOT_F
# shingles (boilerplate) ride per-doc digest arrays whose size is the
# per-doc hot-shingle count, not the posting length. The split is a
# partition of the shingle universe, so the two counts ADD to the exact
# |A∩B| (the knob a real crawler tunes against its boilerplate profile).
L2_HOT_F = 256


def _freq_split_verify(post, freq, sh_sets, cand, directional: bool):
    """(id_a, id_b, i, na, nb) with EXACT i = |A∩B| for candidate pairs.

    Three mechanisms compose (l2j's docstring has the full story):
    set-digest short-circuit for identical pairs (i = na, one equality
    test — the dup-flood tier), the L2_HOT_F frequency-split
    inverted-index count for rare shingles (bounded-linear join, rows
    are 32-byte digests), and per-doc hot-digest arrays intersected
    only for the pairs that reach them. ``cand`` must be distinct
    (id_a, id_b) pairs; ``directional`` selects the l2k a≠b pairing for
    the rare-index join (vs l2j's a<b)."""
    dh = post.join(freq, "g").select("doc_id", F.md5("g").alias("h"), "f")
    rare = dh.where(F.col("f") <= L2_HOT_F).select("doc_id", "h")
    hot = dh.where(F.col("f") > L2_HOT_F).groupBy("doc_id").agg(
        F.sort_array(F.collect_list("h")).alias("hot")
    )
    empty = F.array().cast("array<string>")
    meta = (
        sh_sets.select(
            "doc_id",
            F.size("sh").cast("bigint").alias("n"),
            F.md5(F.concat_ws("\x1f", F.array_sort("sh"))).alias("sd"),
        )
        .join(hot, "doc_id", "left")
        .select("doc_id", "n", "sd", F.coalesce("hot", empty).alias("hot"))
    )
    cm = (
        cand.join(
            meta.select(
                F.col("doc_id").alias("id_a"),
                F.col("n").alias("na"),
                F.col("sd").alias("sda"),
                F.col("hot").alias("hota"),
            ),
            "id_a",
        )
        .join(
            meta.select(
                F.col("doc_id").alias("id_b"),
                F.col("n").alias("nb"),
                F.col("sd").alias("sdb"),
                F.col("hot").alias("hotb"),
            ),
            "id_b",
        )
        # 8× default parallelism keeps checkpoint blocks small enough
        # to evict cleanly (measured: 32-partition blocks reach ~380 MB
        # at the 256× probe and OOM a 16 g JVM; pair-hash partitioning,
        # so the key count grows with data)
        .repartition(
            sh_sets.sparkSession.sparkContext.defaultParallelism * 8,
            "id_a",
            "id_b",
        )
        .localCheckpoint(eager=True)
        # cm feeds equal/diff/verify — three references; without
        # truncation the prefix-join+distinct DAG re-inlines per
        # reference (the g2 lesson: measured enough 64x spill to fill
        # the box's disk before this checkpoint existed)
    )
    equal = cm.where(F.col("sda") == F.col("sdb")).select(
        "id_a", "id_b", F.col("na").alias("i"), "na", "nb"
    )
    diff = cm.where(F.col("sda") != F.col("sdb"))
    pair_cond = (
        F.col("id_a") != F.col("id_b")
        if directional
        else F.col("id_a") < F.col("id_b")
    )
    rc = (
        rare.select(F.col("doc_id").alias("id_a"), "h")
        .join(rare.select(F.col("doc_id").alias("id_b"), "h"), "h")
        .where(pair_cond)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ir"))
    )
    diffv = diff.join(rc, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        (
            F.coalesce(F.col("ir"), F.lit(0))
            + F.size(F.array_intersect("hota", "hotb")).cast("bigint")
        ).cast("bigint").alias("i"),
        "na",
        "nb",
    )
    return equal.unionByName(diffv)

_L2J_ORACLE = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, s.i, s.i + 2), ' ') AS g
        FROM toks, LATERAL unnest(range(1, len(t) - 1)) AS s(i)
        WHERE len(t) >= 3
        UNION
        SELECT doc_id, array_to_string(t, ' ') AS g
        FROM toks WHERE len(t) < 3
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, i, sa.n AS na, sb.n AS nb,
           CAST((i * 1000000) // (sa.n + sb.n - i) AS BIGINT) AS jaccard_ppm
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE 2 * i >= (sa.n + sb.n - i)
"""


@register("l2j_prefix_jaccard_join", family="L2", oracle=_L2J_ORACLE)
def l2j_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard-threshold set-similarity join with PREFIX FILTERING
    (Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search", Chaudhuri
    et al. 2006 — public papers): two sets with Jaccard ≥ τ MUST share a
    shingle within each other's (n − ⌈τ·n⌉ + 1)-length prefix under ANY
    global shingle order, so candidate pairs come from self-joining only
    the PREFIXES ordered rarest-shingle-first — the frequent shingles
    that make l2b's any-shared-shingle inverted index quadratic on
    boilerplate never generate candidates here (measured: prefix postings
    are ~58% of full postings at sf0.01 and the rarest-first order
    concentrates the reduction exactly on the hottest posting lists).
    Verification is exact and integer-only, and DE-ARRAYED in two tiers
    (r11, VERDICT r10 task #3): (1) every doc carries a SET DIGEST
    (md5 of its sorted shingle set) — a candidate pair with EQUAL set
    digests is an identical pair, so i = na with NO intersection work;
    this short-circuits the flood that actually dominates dup-heavy
    corpora (and the replica probe corpus: its near-dup clusters are
    exact-set copies, so the old path carried ~26 M × 4 KB arrays — or
    ~10⁹ exploded digest rows, which is how the first de-array attempt
    filled the disk — for pairs whose answer is one equality test).
    (2) Pairs with DIFFERENT set digests — the genuinely-partial
    overlaps the prefix filter exists for — get i from the L2_HOT_F
    FREQUENCY SPLIT (see _freq_split_verify): rare shingles
    (posting ≤ L2_HOT_F) count pair co-occurrences through a direct
    inverted-index self-join whose output is Σf² ≤ L2_HOT_F·|postings|
    rows of 32-byte digests — bounded-LINEAR in the corpus, never
    per-candidate explosion (a 27.5 M-candidate × 52-shingle corpus
    turns per-candidate exploding into ~1.4 G rows; the index join
    emits ~90 M) — while hot boilerplate shingles ride per-doc digest
    arrays sized by each doc's HOT-shingle count and intersect only
    inside the candidate join. The two counts partition the shingle
    universe, so they ADD to the exact |A∩B|. The md5 family is l2h's
    cross-engine convention; a 128-bit collision is ~2^-128 and the
    oracle would hash-mismatch loudly if one ever fired. Counts are
    over per-doc DISTINCT shingles (shingled_docs dedups), so i equals
    array_intersect size exactly. Keep 2i ≥ (na + nb − i) (τ = 1/2
    cross-multiplied — no float), Jaccard shipped as truncated PPM by
    integer division. The ORACLE is the unfiltered all-pairs string
    join: the oracle hash compare IS the prefix-filter completeness
    theorem AND the digest/split-exactness claims executed on data — a
    single missed or phantom pair hash-mismatches.

    Scale shape: shingle postings shuffle once to rank by global
    frequency (short-string keys, the l2b envelope), the candidate join
    keys on PREFIX shingles only, equal-set pairs verify with a
    constant-width metadata join, rare-shingle intersection counts
    flow through one bounded index join + a map-side-combinable count,
    and no shuffle anywhere carries a per-candidate array. Window for
    prefix ranking partitions by doc_id — key count grows with the
    corpus. τ and L2_HOT_F are compile-time; higher τ ⇒ shorter
    prefixes ⇒ fewer candidates, the knobs real crawlers tune."""
    # sh_sets feeds the postings AND both verification sides, and
    # prefixes feeds BOTH sides of the candidate self-join: without
    # lineage truncation Catalyst re-inlines the scan→shingle→rank
    # pipeline at every reference (the g2 lesson) — measured 39.8 s at
    # the 32× fresh probe vs ~19 s with the two checkpoints, and 150 s
    # vs 55 s at 64× (the r8-era 16×-only probe missed this knee; the
    # 64× rule exists because of exactly this class).
    sh_sets = shingled_docs(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    post = sh_sets.select("doc_id", F.explode("sh").alias("g"))
    freq = post.groupBy("g").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("doc_id").orderBy("f", "g")
    n_col = F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ranked = (
        post.join(freq, "g")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", n_col)
    )
    # prefix length = n − ⌈τ·n⌉ + 1, with ⌈τ·n⌉ = (NUM·n + DEN−1) DIV DEN exactly
    pref_len = (
        F.col("cnt")
        - F.expr(
            f"CAST(({L2J_TAU_NUM} * cnt + {L2J_TAU_DEN - 1}) "
            f"DIV {L2J_TAU_DEN} AS BIGINT)"
        )
        + 1
    )
    prefixes = (
        ranked.where(F.col("rn") <= pref_len)
        .select("doc_id", "g")
        .localCheckpoint(eager=True)  # rank window runs ONCE, not per side
    )
    cand = (
        prefixes.select(F.col("doc_id").alias("id_a"), "g")
        .join(prefixes.select(F.col("doc_id").alias("id_b"), "g"), "g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = _freq_split_verify(post, freq, sh_sets, cand, directional=False)
    return (
        verified.where(
            F.lit(L2J_TAU_DEN) * F.col("i")
            >= F.lit(L2J_TAU_NUM) * (F.col("na") + F.col("nb") - F.col("i"))
        )
        .select(
            "id_a",
            "id_b",
            "i",
            "na",
            "nb",
            F.expr("CAST((i * 1000000) DIV (na + nb - i) AS BIGINT)").alias(
                "jaccard_ppm"
            ),
        )
    )


L2K_TAU_NUM = 4  # containment threshold τ = 4/5: |A∩B| ≥ 0.8·|A|
L2K_TAU_DEN = 5

_L2K_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, s.i, s.i + 2), ' ') AS g
        FROM toks, LATERAL unnest(range(1, len(t) - 1)) AS s(i)
        WHERE len(t) >= 3
        UNION
        SELECT doc_id, array_to_string(t, ' ') AS g
        FROM toks WHERE len(t) < 3
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS i
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, i, sa.n AS na, sb.n AS nb,
           CAST((i * 1000000) // sa.n AS BIGINT) AS containment_ppm
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE {L2K_TAU_DEN} * i >= {L2K_TAU_NUM} * sa.n
"""


@register("l2k_containment_join", family="L2", oracle=_L2K_ORACLE)
def l2k_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT containment-threshold join — the ASYMMETRIC near-dup case
    symmetric Jaccard (l2/l2j) structurally misses: a short document
    embedded verbatim inside a much longer one has |A∩B|/|A| ≈ 1 but
    Jaccard ≈ |A|/|B| ≈ 0 (quote farms, boilerplate-wrapped reposts,
    excerpt pages). Reports every DIRECTIONAL pair with
    |A∩B| ≥ τ·|A|, τ = {L2K_TAU_NUM}/{L2K_TAU_DEN}.

    Prefix filtering goes one-sided (the containment variant of
    Bayardo et al. 2007, cf. PPJoin's asymmetric extension): if
    |A∩B| ≥ τ·|A| then A's (n_a − ⌈τ·n_a⌉ + 1)-length prefix under ANY
    global order intersects B — so candidates come from joining the
    CONTAINED side's prefix against the container side's FULL postings.
    The rarest-shingle-first order makes that safe at scale: prefix
    members are globally rare BY CONSTRUCTION, so the full posting
    lists they probe are short — the boilerplate shingles that blow up
    an unfiltered inverted index never appear in any prefix.
    Verification is exact integer-only via l2j's de-arrayed scheme
    (r11, VERDICT r10 task #3 — _freq_split_verify): equal-set-digest
    pairs (the exact-dup flood) short-circuit to i = n_a with one
    metadata equality test; different-set pairs get i from the
    L2_HOT_F frequency split — rare-shingle co-occurrences through a
    bounded-linear inverted-index join (Σf² ≤ L2_HOT_F·|postings|
    32-byte digest rows), hot boilerplate shingles via per-doc digest
    arrays intersected inside the candidate join — the two counts
    partitioning the shingle universe so they ADD to the exact |A∩B|;
    then {L2K_TAU_DEN}·i ≥ {L2K_TAU_NUM}·n_a cross-multiplied,
    containment shipped as truncated PPM by integer division. The
    ORACLE is the unfiltered all-pairs STRING join — the hash compare
    IS the one-sided prefix-completeness theorem and the
    digest/split-exactness claims executed on data (the l2j
    discipline).

    Scale shape: one posting shuffle to rank by global frequency, the
    candidate join keyed on prefix shingles (short-string keys, short
    postings), equal-set pairs verify via a constant-width metadata
    join, rare-shingle counts through one bounded index join with a
    map-side-combinable count; no shuffle carries a per-candidate
    array and text itself never shuffles (shingled_docs' digest
    discipline)."""
    # sh_sets feeds the postings AND both verification sides, and
    # prefixes feeds BOTH sides of the candidate self-join: without
    # lineage truncation Catalyst re-inlines the scan→shingle→rank
    # pipeline at every reference (the g2 lesson) — measured 39.8 s at
    # the 32× fresh probe vs ~19 s with the two checkpoints, and 150 s
    # vs 55 s at 64× (the r8-era 16×-only probe missed this knee; the
    # 64× rule exists because of exactly this class).
    sh_sets = shingled_docs(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    post = sh_sets.select("doc_id", F.explode("sh").alias("g"))
    freq = post.groupBy("g").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("doc_id").orderBy("f", "g")
    n_col = F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ranked = (
        post.join(freq, "g")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", n_col)
    )
    pref_len = (
        F.col("cnt")
        - F.expr(
            f"CAST(({L2K_TAU_NUM} * cnt + {L2K_TAU_DEN - 1}) "
            f"DIV {L2K_TAU_DEN} AS BIGINT)"
        )
        + 1
    )
    prefixes = (
        ranked.where(F.col("rn") <= pref_len)
        .select("doc_id", "g")
        .localCheckpoint(eager=True)  # rank window runs once (l2j's note)
    )
    cand = (
        prefixes.select(F.col("doc_id").alias("id_a"), "g")
        .join(post.select(F.col("doc_id").alias("id_b"), "g"), "g")
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = _freq_split_verify(post, freq, sh_sets, cand, directional=True)
    return (
        verified.where(L2K_TAU_DEN * F.col("i") >= L2K_TAU_NUM * F.col("na"))
        .select(
            "id_a",
            "id_b",
            "i",
            "na",
            "nb",
            F.expr("CAST((i * 1000000) DIV na AS BIGINT)").alias("containment_ppm"),
        )
    )
