"""L-family: embedding similarity search (SURVEY.md §2.9 L3-L4).

Brute-force cosine is the exactness baseline (higher-order functions, no
UDF, no shuffle beyond the final top-k merge). The LSH-bucketed ANN variant
is the 100 TB path: random-hyperplane signatures shrink the candidate set
from |corpus| to a bucket, turning an O(N·Q) scan into a bucket-key join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — JVM-side, double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


@register(
    "l3_cosine_topk",
    family="L3",
    bench=True,
    oracle="""
        WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_dot_product(embedding::DOUBLE[], qe)
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim
        FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id
        LIMIT 10
    """,
)
def l3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against a query vector (vec_id=0).

    The query vector is a parameter (one collected row), inlined as a
    literal so the scan side runs embarrassingly parallel with a final
    TakeOrderedAndProject top-k merge — no shuffle of the corpus.

    The query's own norm is folded DRIVER-SIDE: Catalyst does not
    constant-fold higher-order functions, so ``sqrt(dot(q,q))`` written
    as a Column would re-run a |dim|-element fold on EVERY corpus row
    (seen as a third aggregate() in the optimized plan — 3 dots/row
    instead of 2). The Python left fold (0.0 start, sequential x*x adds
    on the same doubles) and ``math.sqrt`` are bit-identical to the JVM
    fold + sqrt, so the oracle hash is unchanged."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if qrow is None:  # empty corpus / missing query id → empty result, same schema
        return emb.select(
            "vec_id", F.lit(None).cast("double").alias("cos_sim")
        ).limit(0)
    qvec = qrow[0]
    # one literal-array Py4J call, not |dim| F.lit calls (r13: build time
    # was ~0.17 s of per-element round trips at dim=64); same ArrayType
    # (double) literal, element-exact IEEE doubles either way
    q = F.lit([float(x) for x in qvec])
    qq = 0.0
    for x in qvec:
        qq += float(x) * float(x)
    qnorm = F.lit(math.sqrt(qq))
    cos = dot(F.col("embedding"), q) / (
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))) * qnorm
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


@register(
    "l4_knn_join",
    family="L4",
    oracle="""
        WITH qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                    FROM embeddings WHERE vec_id < 100)
        SELECT qid, vec_id AS nn_id,
               round(list_dot_product(embedding::DOUBLE[], qe)
                     / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim,
               CAST(rn AS INTEGER) AS rn
        FROM (
            SELECT qs.qid, qs.qe, e.vec_id, e.embedding,
                   row_number() OVER (
                       PARTITION BY qs.qid
                       ORDER BY round(list_dot_product(e.embedding::DOUBLE[], qs.qe)
                               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                                  * sqrt(list_dot_product(qs.qe, qs.qe))), 6) DESC,
                               e.vec_id) AS rn
            FROM embeddings e CROSS JOIN qs
            WHERE e.vec_id <> qs.qid
        )
        WHERE rn <= 3
    """,
)
def l4_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN join: top-3 cosine neighbors for each query vector
    (vec_id < 100). Broadcast the (small) query side; the corpus streams
    past it map-side, and a windowed top-k per query bounds the output —
    the exact-KNN shape that scales until |queries| forces LSH (l4b).

    Per-side norms are projected BELOW the join (each corpus row's
    ``sqrt(dot(e,e))`` runs once, not once per query pair — with |Q|=100
    the naive post-join cosine re-folds it 100×; same fold, same doubles,
    so the oracle hash is unchanged). Per pair only dot(e,q) remains."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("enorm"),
    )
    qs = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("qnorm"),
    )
    sim = F.round(
        dot(F.col("embedding"), F.col("qe")) / (F.col("enorm") * F.col("qnorm")), 6
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nn_id"), sim.alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "nn_id")
    return (
        scored.select("qid", "nn_id", "cos_sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


_SIGN_DIMS = 6  # l4e: 2^6 = 64 sign-buckets


@register(
    "l4e_sign_bucket_ann",
    family="L4",
    oracle="""
        WITH b AS (
            SELECT vec_id, embedding::DOUBLE[] AS e,
                   (CASE WHEN embedding[1] >= 0 THEN 1  ELSE 0 END
                  + CASE WHEN embedding[2] >= 0 THEN 2  ELSE 0 END
                  + CASE WHEN embedding[3] >= 0 THEN 4  ELSE 0 END
                  + CASE WHEN embedding[4] >= 0 THEN 8  ELSE 0 END
                  + CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END
                  + CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END) AS bucket
            FROM embeddings
        ),
        qs AS (SELECT vec_id AS qid, e AS qe, bucket FROM b WHERE vec_id < 100),
        probes AS (
            SELECT qid, qe, xor(bucket, f.flip) AS probe
            FROM qs, (VALUES (0), (1), (2), (4), (8), (16), (32)) f(flip)
        )
        SELECT qid, nn_id, cos_sim, CAST(rn AS INTEGER) AS rn
        FROM (
            SELECT p.qid, c.vec_id AS nn_id,
                   round(list_dot_product(c.e, p.qe)
                         / (sqrt(list_dot_product(c.e, c.e))
                            * sqrt(list_dot_product(p.qe, p.qe))), 6) AS cos_sim,
                   row_number() OVER (
                       PARTITION BY p.qid
                       ORDER BY round(list_dot_product(c.e, p.qe)
                               / (sqrt(list_dot_product(c.e, c.e))
                                  * sqrt(list_dot_product(p.qe, p.qe))), 6) DESC,
                               c.vec_id) AS rn
            FROM b c JOIN probes p ON c.bucket = p.probe AND c.vec_id <> p.qid
        )
        WHERE rn <= 3
    """,
)
def l4e_sign_bucket_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via DETERMINISTIC sign-buckets — the oracle-backed member of
    the L4 scale-path family (l4b hyperplane-LSH and l4c IVF stay
    rows-only: RNG hyperplanes / k-means centroids aren't reproducible in
    SQL, and a float PROJECTION's sign can flip on a ulp). The bucket
    here is the sign pattern of the first 6 raw coordinates — pure
    comparisons against 0, no arithmetic, so bucket assignment is exact
    on any engine — and candidate generation is an equi-join on the
    64-value bucket key instead of the O(N·Q) cross product, MULTI-PROBED
    with every 1-bit flip of the query's bucket (7 probes: standard
    multi-probe LSH — each corpus row still matches at most one probe, so
    no dedup). Exact cosine top-3 within the probed buckets (same fold +
    rounding as l3/l4, proven cross-engine bit-stable). Same output shape
    as l4; recall vs exact KNN is asserted in tests/test_llm.py; more
    flips (or learned bit confidences) are the recall knob at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = F.lit(0)
    for j in range(_SIGN_DIMS):
        bucket = bucket + F.when(
            F.element_at("embedding", j + 1) >= 0, F.lit(2**j)
        ).otherwise(F.lit(0))
    b = emb.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("enorm"),
    )
    qs = b.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
        F.col("enorm").alias("qnorm"),
    )
    flips = F.array(*[F.lit(v) for v in (0, 1, 2, 4, 8, 16, 32)])
    probes = qs.select(
        "qid",
        "qe",
        "qnorm",
        "qbucket",
        F.explode(flips).alias("flip"),
    ).select(
        "qid",
        "qe",
        "qnorm",
        F.col("qbucket").bitwiseXOR(F.col("flip")).alias("probe"),
    )
    sim = F.round(
        dot(F.col("embedding"), F.col("qe")) / (F.col("enorm") * F.col("qnorm")), 6
    )
    scored = b.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("qid")),
    ).select("qid", F.col("vec_id").alias("nn_id"), sim.alias("cos_sim"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "nn_id")
    return scored.select(
        "qid", "nn_id", "cos_sim", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)


N_LISTS = 16  # IVF coarse centroids (√N-ish for the sf0.1 corpus)
N_PROBE = 4  # centroids probed per query (recall/cost knob)


@register("l4c_ivf_ann", family="L4", oracle=None)
def l4c_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file) coarse quantization — the other
    standard scale path next to LSH (l4b): k-means centroids learned
    driver-side on a bounded sample, every vector assigned to its nearest
    centroid (one Arrow-batched matmul), queries probe their N_PROBE
    nearest lists, exact cosine top-3 within the probed lists only.

    Scale shape: the corpus is scanned once to assign lists (map-only);
    the search joins queries to corpus rows on ``list_id`` — a shuffle on
    a 16-value key instead of a cross product. Centroids are a fixed
    (N_LISTS×64) float matrix — broadcast-sized at any corpus scale; the
    driver-side Lloyd iterations run on a capped sample, never the corpus.
    Recall vs exact l4_knn_join is asserted in tests/test_llm.py."""
    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings")

    # Lloyd on a bounded, deterministic sample (normalized → spherical
    # k-means, the right metric for cosine).
    sample = np.array(
        [r[0] for r in emb.select("embedding").sort("vec_id").limit(2000).collect()],
        dtype=np.float64,
    )
    if len(sample) == 0:  # empty corpus → empty result, same schema
        return emb.select(
            F.col("vec_id").alias("qid"),
            F.col("vec_id").alias("nn_id"),
            F.lit(None).cast("double").alias("cos_sim"),
            F.lit(None).cast("int").alias("rn"),
        ).limit(0)
    n_lists = min(N_LISTS, len(sample))  # degenerate tiny corpora
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.RandomState(7)
    centroids = sample[rng.choice(len(sample), n_lists, replace=False)]
    for _ in range(10):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / np.linalg.norm(m)
    cent = centroids.tolist()

    def top_lists(k: int):
        @pandas_udf("array<int>")
        def f(embs: pd.Series) -> pd.Series:
            mat = np.array(list(embs), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ np.array(cent).T  # (batch, N_LISTS)
            idx = np.argsort(-sims, axis=1)[:, :k]
            return pd.Series(list(idx.astype(np.int32)))

        return f

    # Norms projected below the join: each corpus row's fold runs once,
    # not once per probed query (see l4_knn_join).
    corpus = emb.select(
        "vec_id", "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("enorm"),
        F.element_at(top_lists(1)(F.col("embedding")), 1).alias("list_id"),
    )
    queries = (
        emb.filter(F.col("vec_id") < 100)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("qnorm"),
            F.explode(top_lists(N_PROBE)(F.col("embedding"))).alias("list_id"),
        )
    )
    candidates = corpus.join(F.broadcast(queries), "list_id").filter(
        F.col("vec_id") != F.col("qid")
    )
    scored = candidates.select(
        "qid",
        F.col("vec_id").alias("nn_id"),
        F.round(
            dot(F.col("embedding"), F.col("qe"))
            / (F.col("enorm") * F.col("qnorm")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "nn_id")
    return (
        scored.select("qid", "nn_id", "cos_sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


N_TABLES = 8  # independent hash tables (candidate union across tables)
BITS_PER_TABLE = 5  # 32 buckets/table


@register("l4b_lsh_ann", family="L4", oracle=None)
def l4b_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: 8 independent tables of
    5-bit signatures (seed-42 hyperplanes); a pair is a candidate if it
    collides in ANY table (union across tables — the standard recall
    amplification), then exact cosine top-3 within the candidate set.

    At 100 TB the per-table bucket join replaces the full cross product;
    recall vs exact l4_knn_join is asserted in tests/test_llm.py. An
    Arrow-batched pandas UDF computes all 40 projections in one matmul.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.random.RandomState(42).randn(N_TABLES * BITS_PER_TABLE, 64)
    bc = planes.tolist()  # closure-captured, tiny

    @pandas_udf("array<int>")
    def buckets_of(embs: pd.Series) -> pd.Series:
        mat = np.array(list(embs), dtype=np.float64)  # (batch, 64)
        bits = (mat @ np.array(bc).T) > 0  # (batch, T*B)
        bits = bits.reshape(len(mat), N_TABLES, BITS_PER_TABLE)
        codes = (bits * (1 << np.arange(BITS_PER_TABLE))).sum(axis=2)
        # offset per table so (table, code) packs into one int key
        codes = codes + (np.arange(N_TABLES) << BITS_PER_TABLE)
        return pd.Series(list(codes.astype(np.int32)))

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        # fold the norm once per vector, before the 8-way band explode and
        # the bucket join fan-out (see l4_knn_join)
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
        buckets_of(F.col("embedding")).alias("buckets"),
    )
    banded = emb.select(
        "vec_id", "embedding", "norm", F.explode("buckets").alias("bucket")
    )
    a = banded.select(
        F.col("bucket"),
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    b = banded.select(
        F.col("bucket"),
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nnorm"),
    )
    candidates = (
        a.join(b, "bucket")
        .filter(F.col("qid") != F.col("nn_id"))
        .select("qid", "nn_id", "qe", "ne", "qnorm", "nnorm")
        .dropDuplicates(["qid", "nn_id"])  # union across tables
    )
    scored = candidates.select(
        "qid",
        "nn_id",
        F.round(
            dot(F.col("qe"), F.col("ne")) / (F.col("qnorm") * F.col("nnorm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "nn_id")
    return (
        scored.select("qid", "nn_id", "cos_sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


KMEANS_K = 8
KMEANS_ITERS = 5


@register("l4d_kmeans", family="L4", oracle=None)
def l4d_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully DISTRIBUTED spherical k-means (Lloyd's) over the embedding
    corpus — the iterative-algorithm pattern: per iteration the k×64
    centroid matrix broadcasts to executors, assignment is one
    Arrow-batched matmul (map-only), and the centroid update is a
    posexplode → groupBy(cluster, dim) average whose partial aggregation
    combines map-side — the corpus never moves to the driver, only the
    k×64 result of each round does (unlike l4c, whose Lloyd runs on a
    driver-side sample). Init = k lowest-vec_id vectors (deterministic,
    no RNG). No SQL oracle (iterative; cross-engine float accumulation
    could flip near-tie assignments) — invariants pinned in
    tests/test_llm.py: run-to-run determinism, every point lands on its
    nearest final centroid, and the objective improves over init.

    Scale: per iteration one broadcast (k·d doubles), one map-only
    assignment pass, one shuffle keyed (cluster, dim) of partially
    aggregated sums. Iterations are driver-sequenced like l2e's label
    propagation; at 100 TB add mini-batching or a sampled warm start —
    the per-iteration plan is already the distributed form."""
    return _kmeans_assign(spark, sf_dir, KMEANS_K).select("vec_id", "cluster")


def _kmeans_assign(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Distributed Lloyd's core shared by l4d (fixed k) and l2g (k scaled
    to corpus size). Returns (vec_id, v-normalized, cluster)."""
    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings")
    norm = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x.cast("double")
            / F.sqrt(dot(F.col("embedding"), F.col("embedding"))),
        ).alias("v"),
    ).persist()

    centroids = np.array(
        [r[0] for r in norm.sort("vec_id").limit(k).select("v").collect()],
        dtype=np.float64,
    )

    assigned = None
    for _ in range(KMEANS_ITERS):
        cent = centroids.tolist()  # closure-captured broadcast literal

        @pandas_udf("int")
        def nearest(vs: pd.Series) -> pd.Series:
            mat = np.array(list(vs), dtype=np.float64)
            return pd.Series((mat @ np.array(cent).T).argmax(axis=1).astype(np.int32))

        assigned = norm.select("vec_id", "v", nearest("v").alias("cluster"))
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
        )
        rows = sums.collect()  # k×64 cells — bounded by k·d, not corpus size
        new = centroids.copy()
        for c in range(len(centroids)):
            vec = np.array(
                [r.m for r in sorted(rows, key=lambda r: r.dim) if r.cluster == c]
            )
            if len(vec):
                new[c] = vec / np.linalg.norm(vec)
        centroids = new

    return assigned


SEMDEDUP_TAU = 0.4  # same semantic threshold as l2d's all-pairs baseline
SEMDEDUP_CLUSTER_TARGET = 1250  # aim |cluster| ≈ this, so pair work stays linear


@register("l2g_semdedup", family="L2", oracle=None)
def l2g_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup bounded by k-means
    clusters — embeddings cluster first (l4d's distributed Lloyd's), then
    cosine near-dup pairs are searched ONLY within each cluster, and every
    duplicate group keeps its lowest-id representative.

    The scale story is the pair-count bound: all-pairs cosine (l2d) is
    O(N²); clustering first makes it Σ|cluster|², and the within-cluster
    self-join keys the shuffle by cluster id, so each cluster's quadratic
    work is an independent task. With FIXED k, |cluster| ∝ N and the pair
    space is still N²/k — measured 16.7× time at 16× data only because
    assignment dominated at this scale; so k scales with the corpus
    (k = max(8, N/1250)): constant expected cluster size ⇒ pair work
    linear in N, while the per-iteration cost adds one k×d broadcast.
    Near-dups that straddle a cluster boundary are missed by
    construction — the recall/cost trade SemDeDup documents (l2d remains
    the exact baseline; the pytest invariant checks every removed vector
    has a kept lower-id neighbor at ≥ τ in ITS cluster). Rows-only:
    k-means is iterative (no SQL oracle), so the driver runs the
    rows-only check and the invariants live in tests/test_llm.py."""
    # r13: exact footer row count (table_num_rows), count() fallback.
    from prometheus_remote_kinesis_spark.sources.tables import table_num_rows

    n = table_num_rows(sf_dir, "embeddings")
    if n is None:
        n = load_table(spark, sf_dir, "embeddings").count()
    k = max(KMEANS_K, -(-n // SEMDEDUP_CLUSTER_TARGET))  # ceil div
    av = _kmeans_assign(spark, sf_dir, k)  # (vec_id, v, cluster) — deterministic
    a = av.select(
        F.col("cluster"),
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("v_a"),
    )
    b = av.select(
        F.col("cluster"),
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("v_b"),
    )
    pairs = a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b"))
    dups = (
        pairs.filter(dot(F.col("v_a"), F.col("v_b")) >= SEMDEDUP_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        av.select("vec_id", "cluster")
        .join(dups.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(F.col("dup") == F.lit(True), F.lit(False)).alias("is_removed"),
        )
    )


PQ_M = 8   # subspaces (64-dim → 8 dims each)
PQ_K = 32  # centroids per subspace codebook (5-bit codes)
PQ_SHORTLIST = 50  # ADC candidates per query before exact re-rank
# (measured at both SFs: recall@3 vs exact KNN = 0.87-0.89 at these
# settings; 16-entry codebooks with a 10-row shortlist gave only 0.41 —
# the shortlist, not the codebook, is the cheap recall lever since
# re-ranking reads just |shortlist| full vectors per query)


@register("l4f_pq_ann", family="L4", oracle=None)
def l4f_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via PRODUCT QUANTIZATION (Jégou et al., the FAISS default) —
    the fourth standard scale path next to LSH (l4b), IVF (l4c), and
    sign buckets (l4e): each normalized vector is encoded as PQ_M=8
    5-bit codes (one per 8-dim subspace, PQ_K=32-entry codebook), so
    a 64-float vector becomes 8 small ints — 32× less candidate-scan
    bandwidth, THE lever when the corpus no longer fits memory. Queries
    score candidates by ADC (asymmetric distance computation): a
    per-query M×K table of subspace dot products broadcasts, and each
    corpus row's approximate similarity is M table lookups + adds — no
    float vector is touched until the exact top-3 re-rank of the
    PQ_SHORTLIST-row (50) ADC shortlist.

    Scale shape: codebooks learn driver-side on a bounded sorted sample
    (l4c's pattern); encoding is one Arrow-batched pass; the ADC scan is
    a broadcast of Q×(M·K) doubles with per-pair cost M adds instead of
    d multiplies (and composes with l4c's IVF lists to prune candidates
    before it). Collects are bounded: 2000 sample rows + ≤100 query
    vectors — parameters, never the corpus. No SQL oracle (numpy
    codebooks are not SQL-expressible); recall@3 vs exact l4_knn_join
    and encode determinism are pinned in tests/test_llm.py."""
    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings")
    sample = np.array(
        [r[0] for r in emb.select("embedding").sort("vec_id").limit(2000).collect()],
        dtype=np.float64,
    )
    empty = emb.select(
        F.col("vec_id").alias("qid"),
        F.col("vec_id").alias("nn_id"),
        F.lit(None).cast("double").alias("cos_sim"),
        F.lit(None).cast("int").alias("rn"),
    ).limit(0)
    if len(sample) == 0:
        return empty
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    d = sample.shape[1]
    sub = d // PQ_M
    k = min(PQ_K, len(sample))
    rng = np.random.RandomState(11)
    books = []  # (PQ_M, k, sub) — L2 Lloyd per subspace
    for m in range(PQ_M):
        xs = sample[:, m * sub : (m + 1) * sub]
        cents = xs[rng.choice(len(xs), k, replace=False)]
        for _ in range(10):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    books_l = [b.tolist() for b in books]

    @pandas_udf("array<int>")
    def encode(embs: pd.Series) -> pd.Series:
        mat = np.array(list(embs), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        codes = np.empty((len(mat), PQ_M), dtype=np.int32)
        for m in range(PQ_M):
            xs = mat[:, m * sub : (m + 1) * sub]
            cents = np.array(books_l[m])
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    corpus = emb.select("vec_id", "embedding", encode("embedding").alias("codes"))

    qrows = (
        emb.filter(F.col("vec_id") < 100).select("vec_id", "embedding").collect()
    )
    if not qrows:
        return empty
    qtabs = []
    for r in qrows:
        q = np.array(r["embedding"], dtype=np.float64)
        q /= np.linalg.norm(q)
        tab = np.empty(PQ_M * k, dtype=np.float64)
        for m in range(PQ_M):
            tab[m * k : (m + 1) * k] = np.array(books_l[m]) @ q[m * sub : (m + 1) * sub]
        qtabs.append((int(r["vec_id"]), [float(x) for x in tab]))
    queries = spark.createDataFrame(qtabs, "qid long, tab array<double>")

    # ADC: approx_sim = Σ_m tab[m·k + codes[m]] — M lookups/adds per
    # pair, all JVM-side (aggregate over a constant-length sequence).
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.col("tab"), (m * k + F.element_at(F.col("codes"), m + 1) + 1).cast("int")
        ),
    )
    shortlist = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nn_id"), adc.alias("approx_sim"))
    )
    wa = Window.partitionBy("qid").orderBy(F.desc("approx_sim"), "nn_id")
    short = (
        shortlist.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") <= PQ_SHORTLIST)
        .select("qid", "nn_id")
    )

    # exact re-rank of the shortlist (the standard ADC→exact refine step)
    qe = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("qnorm"),
    )
    ne = emb.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("n_emb"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nnorm"),
    )
    exact = (
        short.join(ne, "nn_id")
        .join(F.broadcast(qe), "qid")
        .select(
            "qid",
            "nn_id",
            F.round(
                dot(F.col("q_emb"), F.col("n_emb")) / (F.col("qnorm") * F.col("nnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "nn_id")
    return (
        exact.select("qid", "nn_id", "cos_sim", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "l4g_ann_index_build_e2e",
    family="L4",
    oracle="""
        WITH q AS (
            SELECT vec_id,
                   round(127.0 / maxabs, 6) AS scale,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / maxabs))
                                 AS INTEGER)) AS qv
            FROM (
                SELECT vec_id, embedding,
                       list_max(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE)))) AS maxabs
                FROM embeddings
            )
        ),
        r AS (
            SELECT vec_id, scale,
                   md5(array_to_string(qv, ',')) AS digest,
                   (CASE WHEN qv[1] >= 0 THEN 1  ELSE 0 END
                  + CASE WHEN qv[2] >= 0 THEN 2  ELSE 0 END
                  + CASE WHEN qv[3] >= 0 THEN 4  ELSE 0 END
                  + CASE WHEN qv[4] >= 0 THEN 8  ELSE 0 END
                  + CASE WHEN qv[5] >= 0 THEN 16 ELSE 0 END
                  + CASE WHEN qv[6] >= 0 THEN 32 ELSE 0 END) AS bucket,
                   list_sum(qv) AS qsum
            FROM q
        ),
        dd AS (
            SELECT * FROM (SELECT r.*, min(vec_id) OVER (PARTITION BY digest)
                                  AS rep
                           FROM r)
            WHERE vec_id = rep
        )
        SELECT CAST(bucket AS INTEGER)  AS bucket,
               CAST(count(*) AS BIGINT) AS n_vecs,
               min(scale)               AS min_scale,
               max(scale)               AS max_scale,
               CAST(sum(qsum) AS BIGINT) AS qsum_total
        FROM dd GROUP BY bucket
    """,
)
def l4g_ann_index_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END ANN index build — the embedding-side sibling of d16's
    corpus build, composing the similarity family's stages into ONE
    plan: int8 quantization (d6's exact expressions — per-vector max-abs
    scale, round-to-int) → exact vector dedup on the QUANTIZED
    serialization (dedup keys on the md5 digest of the int string, not
    the float vector, because int→string formatting is cross-engine
    identical where float formatting is not) → deterministic sign-bucket
    assignment (l4e's 6-coordinate partition, computed from the
    quantized ints so both engines see the same signs) → per-bucket
    index summary (vector count, scale range, integer checksum).

    Payload discipline: bucket, digest, scale, and the integer checksum
    are all computed ROW-LOCALLY before the dedup window, so the one
    key shuffle carries (vec_id, digest, bucket, scale, qsum) — never
    the float vector or the quantized array (the text_key_exchange
    audit's rule applied to vectors). min/max/count/integer-sum
    aggregates are order-independent, so no float-accumulation hazard
    anywhere. At 100 TB this is the index-build topology: one compact
    shuffle to dedup, one to aggregate per bucket; the vectors
    themselves stay columnar at rest."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scaled = emb.select("vec_id", "embedding", maxabs.alias("maxabs"))
    scale = F.lit(127.0) / F.col("maxabs")
    q = scaled.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * scale).cast("int")
        ).alias("qv"),
    )
    bucket = sum(
        F.when(F.element_at("qv", i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(_SIGN_DIMS)
    )
    r = q.select(
        "vec_id",
        "scale",
        F.md5(F.concat_ws(",", F.col("qv").cast("array<string>"))).alias("digest"),
        bucket.alias("bucket"),
        F.aggregate("qv", F.lit(0), lambda a, x: a + x).alias("qsum"),
    )
    w = Window.partitionBy("digest")
    dd = r.withColumn("rep", F.min("vec_id").over(w)).filter(
        F.col("vec_id") == F.col("rep")
    )
    return dd.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("scale").alias("min_scale"),
        F.max("scale").alias("max_scale"),
        F.sum("qsum").cast("long").alias("qsum_total"),
    )


# l4h: quantized-Lloyd parameters. SCALE=1000 keeps every per-dim value
# an exact small integer (|v| ≲ 400); K=8 over the 500-vector corpus
# leaves every seed cluster non-empty at all verification SFs; 2
# iterations exercise the assign→update→re-assign→re-update cycle while
# staying SQL-unrollable.
KMQ_K = 8
KMQ_SCALE = 1000
KMQ_ITERS = 2

_L4H_DIST = "sum((p.qv - c.cv) * (p.qv - c.cv))"
# Shared CTE prefix: quantized points -> seeds -> two unrolled Lloyd
# iterations ending at the final assignment a2 (and update c2). Reused by
# the l9b quantized-SemDeDup oracle, which dedups WITHIN a2's clusters.
_L4H_CTES = f"""
    WITH pts AS (
        SELECT vec_id, s.i AS dim,
               CAST(floor(CAST(embedding[s.i] AS DOUBLE) * {KMQ_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings,
             LATERAL unnest(range(1, len(embedding) + 1)) AS s(i)
        WHERE embedding IS NOT NULL
    ),
    seeds AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        FROM (SELECT DISTINCT vec_id FROM pts ORDER BY vec_id LIMIT {KMQ_K})
    ),
    c0 AS (SELECT s.cid, p.dim, p.qv AS cv
           FROM seeds s JOIN pts p USING (vec_id)),
    d1 AS (SELECT p.vec_id, c.cid, {_L4H_DIST} AS dist
           FROM pts p JOIN c0 c USING (dim) GROUP BY p.vec_id, c.cid),
    a1 AS (SELECT vec_id, cid FROM
             (SELECT vec_id, cid, row_number() OVER
                  (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1)
           WHERE rn = 1),
    c1 AS (SELECT a.cid, p.dim,
                  CAST(floor(CAST(sum(p.qv) AS DOUBLE) / count(*))
                       AS BIGINT) AS cv
           FROM a1 a JOIN pts p USING (vec_id) GROUP BY a.cid, p.dim),
    d2 AS (SELECT p.vec_id, c.cid, {_L4H_DIST} AS dist
           FROM pts p JOIN c1 c USING (dim) GROUP BY p.vec_id, c.cid),
    a2 AS (SELECT vec_id, cid FROM
             (SELECT vec_id, cid, row_number() OVER
                  (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2)
           WHERE rn = 1),
    c2 AS (SELECT a.cid, p.dim,
                  CAST(floor(CAST(sum(p.qv) AS DOUBLE) / count(*))
                       AS BIGINT) AS cv
           FROM a2 a JOIN pts p USING (vec_id) GROUP BY a.cid, p.dim),
    ck AS (SELECT cid, CAST(sum(cv) AS BIGINT) AS checksum
           FROM c2 GROUP BY cid)
"""

_L4H_ORACLE = (
    _L4H_CTES
    + """
    SELECT a.cid AS cluster,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(a.vec_id) AS BIGINT) AS sum_vec_ids,
           any_value(ck.checksum) AS centroid_checksum
    FROM a2 a JOIN ck USING (cid)
    GROUP BY a.cid
"""
)


@register("l4h_kmeans_quantized", family="L4", oracle=_L4H_ORACLE)
def l4h_kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed distributed k-means — the iterative-algorithm family's
    first HASH-VERIFIED member. l4d's float Lloyd's is rows-only by design
    (cross-engine float accumulation can flip near-tie assignments); this
    twin removes the float from the loop instead of the check: every
    embedding dim quantizes to ``floor(double(x)·1000)`` (an exact BIGINT
    on both engines — the double product of an exactly-converted float is
    the identical IEEE value), distances become exact integer sums, ties
    break on the lower centroid id, and the centroid update is
    ``floor(double(Σqv)/n)`` — one correctly-rounded division per cell,
    identical across engines because Σqv < 2⁵³. Two full Lloyd iterations
    (assign→update→re-assign→re-update) run distributed in Spark and
    UNROLLED as CTEs in the DuckDB oracle (long (vec_id, dim, qv) form,
    N·k·d join rows — fine at oracle scale); the hash compares per-cluster
    membership count, Σ vec_id (assignment-sensitive), and the final
    centroid checksum Σ dims — a wrong assignment ANYWHERE flips a cell.

    Scale shape = l4d's: per iteration one k×d integer centroid matrix
    broadcasts (closure literal), assignment is one Arrow-batched
    map-only pandas_udf pass, and the update is posexplode →
    groupBy(cluster, dim) whose exchange carries pre-combined (Σ, n)
    integer partials — the corpus never moves, only k·d cells reach the
    driver per round (the documented bounded collect, like l4d/l4f's
    codebook training). Empty clusters drop out identically on both
    engines (inner joins / absent groups)."""
    assigned, cids, cents = _quantized_lloyd(spark, sf_dir)
    checksums = {c: sum(v) for c, v in zip(cids, cents)}
    ck = (
        F.create_map(*[F.lit(x) for pair in checksums.items() for x in pair])
        if checksums
        else F.lit(None).cast("map<bigint,bigint>")  # empty corpus
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_ids"),
        )
        .select(
            "cluster",
            "n_points",
            "sum_vec_ids",
            F.element_at(ck, F.col("cluster")).cast("bigint").alias(
                "centroid_checksum"
            ),
        )
    )


def _quantized_lloyd(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[int], list[list[int]]]:
    """l4h's integer-exact Lloyd core, shared with the quantized SemDeDup
    (l2i): returns the final assignment (vec_id, q, cluster) plus the
    surviving cluster ids and their post-update integer centroids."""
    import math

    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * KMQ_SCALE)
        ).alias("q"),
    )
    seed_rows = q.sort("vec_id").limit(KMQ_K).select("q").collect()
    cids = list(range(len(seed_rows)))
    cents = [list(r.q) for r in seed_rows]

    def make_nearest(cent_list: list[list[int]], cid_list: list[int]):
        cent_arr = np.array(cent_list, dtype=np.int64)
        cid_arr = np.array(cid_list, dtype=np.int64)

        @pandas_udf("long")
        def nearest(vs: pd.Series) -> pd.Series:
            mat = np.array(list(vs), dtype=np.int64)
            if mat.size == 0 or cent_arr.size == 0:  # empty batch/corpus
                return pd.Series([0] * len(vs), dtype="int64")
            d = ((mat[:, None, :] - cent_arr[None, :, :]) ** 2).sum(axis=2)
            # argmin takes the FIRST minimum: cid_arr is ascending, so
            # ties break on the lower cid — the oracle's ORDER BY dist, cid.
            return pd.Series(cid_arr[d.argmin(axis=1)])

        return nearest

    assigned = None
    for _ in range(KMQ_ITERS):
        nearest = make_nearest(cents, cids)
        assigned = q.select("vec_id", "q", nearest("q").alias("cluster"))
        cells = (
            assigned.select("cluster", F.posexplode("q").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # ≤ k×d cells — bounded by k·d, never corpus size
        )
        bycid: dict[int, dict[int, int]] = {}
        for r in cells:
            # floor over the DOUBLE quotient (not int //): DuckDB's
            # floor(CAST(s AS DOUBLE)/n) and Python's floor(s/n) are the
            # same correctly-rounded IEEE division for |s| < 2^53.
            bycid.setdefault(r.cluster, {})[r.dim] = math.floor(r.s / r.n)
        cids = sorted(bycid)
        cents = [[bycid[c][d] for d in sorted(bycid[c])] for c in cids]

    return assigned, cids, cents


# l2i: SemDeDup threshold τ = 0.4 (l2d/l2g's semantic threshold). On
# quantized integer vectors the test cos(a,b) ≥ τ becomes EXACT integer
# arithmetic: dot > 0 AND 25·dot² ≥ 4·‖a‖²·‖b‖² (τ² = 4/25) — no sqrt,
# no float, no cross-engine rounding surface.
_L2I_ORACLE = (
    _L4H_CTES
    + """
    , n2 AS (SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS n2
             FROM pts GROUP BY vec_id),
    dots AS (
        SELECT ai.vec_id AS i_id, aj.vec_id AS j_id,
               CAST(sum(pi.qv * pj.qv) AS BIGINT) AS d
        FROM a2 ai JOIN a2 aj ON ai.cid = aj.cid AND ai.vec_id < aj.vec_id
        JOIN pts pi ON pi.vec_id = ai.vec_id
        JOIN pts pj ON pj.vec_id = aj.vec_id AND pj.dim = pi.dim
        GROUP BY ai.vec_id, aj.vec_id
    ),
    dup AS (
        SELECT DISTINCT d.j_id AS vec_id
        FROM dots d JOIN n2 ni ON ni.vec_id = d.i_id
                    JOIN n2 nj ON nj.vec_id = d.j_id
        WHERE d.d > 0 AND 25 * d.d * d.d >= 4 * ni.n2 * nj.n2
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
           (dup.vec_id IS NULL) AS kept
    FROM a2 a LEFT JOIN dup ON dup.vec_id = a.vec_id
"""
)


@register("l2i_semdedup_quantized", family="L9", oracle=_L2I_ORACLE)
def l2i_semdedup_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed SemDeDup — the semantic-dedup family's first
    HASH-VERIFIED member (l2g's float form is rows-only by design). Same
    shape as Abbas et al. 2023: k-means bounds the pair search to within-
    cluster candidates, every vector whose cluster holds an EARLIER
    (lower-id) vector with cosine ≥ τ is marked a duplicate. The float
    surfaces are removed the l4h way: clusters come from the shared
    integer-exact Lloyd core (`_quantized_lloyd`), and the cosine
    threshold evaluates as pure BIGINT arithmetic — cos(a,b) ≥ 0.4 iff
    dot > 0 AND 25·dot² ≥ 4·‖a‖²·‖b‖². BIGINT-safe iff
    |dot| ≤ ⌊√(2⁶³/25)⌋ ≈ 6.07e8; here components are |x| < 1 so
    |q| ≤ KMQ_SCALE and |dot| ≤ dim·KMQ_SCALE² = 64·10⁶ — two orders of
    magnitude of headroom, asserted on data by
    tests/test_llm_similarity.py::test_l2i_bigint_headroom so embedding
    growth toward the boundary fails the suite, not ANSI mode at
    runtime. Emits every vector with its cluster
    and kept verdict; both engines run the identical election, so the
    hash check covers clustering AND dedup end to end.

    Scale shape (the SemDeDup bound): the self-join keys on CLUSTER —
    pair work is O(Σ|cluster|²), never O(N²), and k grows with the
    corpus (l2g scales k to hold |cluster| ≈ constant, turning the
    quadratic into a linear scan; same story here). The join exchange
    carries quantized INT arrays (one row per vector per side), the
    dot-product fold runs JVM-side inside codegen (zip_with+aggregate,
    no UDF), and the duplicate set re-joins the assignment by vec_id —
    integers only. Empty corpus degrades to an empty result (left join
    over an empty assignment)."""
    assigned, _, _ = _quantized_lloyd(spark, sf_dir)
    n2 = F.aggregate(
        "q", F.lit(0).cast("bigint"), lambda a, x: a + x * x
    ).alias("n2")
    pts = assigned.select("vec_id", "q", "cluster", n2)
    left = pts.select(
        F.col("vec_id").alias("i_id"),
        F.col("q").alias("qi"),
        "cluster",
        F.col("n2").alias("ni"),
    )
    right = pts.select(
        F.col("vec_id").alias("j_id"),
        F.col("q").alias("qj"),
        "cluster",
        F.col("n2").alias("nj"),
    )
    d = F.aggregate(
        F.zip_with("qi", "qj", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    dup = (
        left.join(right, "cluster")
        .where(F.col("i_id") < F.col("j_id"))
        .where((d > 0) & (F.lit(25) * d * d >= F.lit(4) * F.col("ni") * F.col("nj")))
        .select(F.col("j_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return pts.join(dup, "vec_id", "left").select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.col("is_dup").isNull().alias("kept"),
    )


L4J_M = 4  # subspaces
L4J_SUBDIM = 16  # dims per subspace (4 × 16 = the corpus's 64)
L4J_K = 8  # centroids per subspace → 3 bits/code, 12 bits/vector
L4J_ITERS = 2

_L4J_STEP_DIST = "sum((p.qv - c.cv) * (p.qv - c.cv))"

_L4J_ORACLE = f"""
    WITH pts AS (
        SELECT vec_id,
               CAST((s.i - 1) // {L4J_SUBDIM} AS BIGINT) AS sub,
               CAST((s.i - 1) % {L4J_SUBDIM} AS BIGINT) AS sdim,
               CAST(floor(CAST(embedding[s.i] AS DOUBLE) * {KMQ_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings,
             LATERAL unnest(range(1, len(embedding) + 1)) AS s(i)
        WHERE embedding IS NOT NULL
    ),
    seeds AS (
        SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        FROM (SELECT DISTINCT vec_id FROM pts ORDER BY vec_id LIMIT {L4J_K})
    ),
    c0 AS (SELECT s.cid, p.sub, p.sdim, p.qv AS cv
           FROM seeds s JOIN pts p USING (vec_id)),
    d1 AS (SELECT p.vec_id, p.sub, c.cid, {_L4J_STEP_DIST} AS dist
           FROM pts p JOIN c0 c ON c.sub = p.sub AND c.sdim = p.sdim
           GROUP BY 1, 2, 3),
    a1 AS (SELECT vec_id, sub, cid FROM
             (SELECT vec_id, sub, cid, row_number() OVER
                  (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn FROM d1)
           WHERE rn = 1),
    c1 AS (SELECT a.cid, p.sub, p.sdim,
                  CAST(floor(CAST(sum(p.qv) AS DOUBLE) / count(*))
                       AS BIGINT) AS cv
           FROM a1 a JOIN pts p ON p.vec_id = a.vec_id AND p.sub = a.sub
           GROUP BY 1, 2, 3),
    d2 AS (SELECT p.vec_id, p.sub, c.cid, {_L4J_STEP_DIST} AS dist
           FROM pts p JOIN c1 c ON c.sub = p.sub AND c.sdim = p.sdim
           GROUP BY 1, 2, 3),
    a2 AS (SELECT vec_id, sub, cid FROM
             (SELECT vec_id, sub, cid, row_number() OVER
                  (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn FROM d2)
           WHERE rn = 1),
    c2 AS (SELECT a.cid, p.sub, p.sdim,
                  CAST(floor(CAST(sum(p.qv) AS DOUBLE) / count(*))
                       AS BIGINT) AS cv
           FROM a2 a JOIN pts p ON p.vec_id = a.vec_id AND p.sub = a.sub
           GROUP BY 1, 2, 3),
    codes AS (
        SELECT vec_id,
               CAST(sum(cid * (CASE sub WHEN 0 THEN 1 WHEN 1 THEN {L4J_K}
                               WHEN 2 THEN {L4J_K * L4J_K}
                               ELSE {L4J_K * L4J_K * L4J_K} END))
                    AS BIGINT) AS code
        FROM a2 GROUP BY 1
    ),
    qv0 AS (SELECT sub, sdim, qv FROM pts
            WHERE vec_id = (SELECT min(vec_id) FROM pts)),
    dtab AS (SELECT c.sub, c.cid,
                    CAST(sum((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d
             FROM c2 c JOIN qv0 q ON q.sub = c.sub AND q.sdim = c.sdim
             GROUP BY 1, 2),
    adc AS (SELECT a.vec_id, CAST(sum(t.d) AS BIGINT) AS adc_dist
            FROM a2 a JOIN dtab t ON t.sub = a.sub AND t.cid = a.cid
            GROUP BY 1)
    SELECT a.vec_id, c.code, a.adc_dist
    FROM adc a JOIN codes c USING (vec_id)
    ORDER BY a.adc_dist, a.vec_id
    LIMIT 10
"""


@register("l4j_pq_quantized", family="L4", oracle=_L4J_ORACLE)
def l4j_pq_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed PRODUCT QUANTIZATION (Jégou et al. 2011) — codebook
    training AND the ADC scan, both inside the hash gate (l4f's float PQ
    is rows-only by design; this twin removes the float the l4h way).
    Each vector splits into 4 subspaces of 16 dims; per subspace an
    integer-exact Lloyd (2 iterations, quantized at floor(x·1000), ties
    to the lower cid, centroid update floor(Σ/n)) trains an 8-entry
    codebook — the oracle unrolls all of it as CTEs in long
    (vec_id, sub, sdim, qv) form. Every vector's code packs as
    Σ cid·8^sub (a 12-bit integer), the query (min vec_id) precomputes
    its 4×8 integer distance table against the trained codebooks, and
    Asymmetric Distance Computation is a per-vector sum of 4 table
    lookups — the hash compare covers training, code assignment, table
    construction, and the top-10 ADC ranking (ordered by (dist, vec_id),
    the unique tie-break).

    Scale shape: per iteration ONE Arrow-batched map-only pandas_udf
    assigns all subspaces at once (the m×k×subdim = 512-int codebook
    rides the closure; the corpus never moves), the update exchange
    carries (sub, cluster, sdim, Σ, n) integer partials, and the
    bounded collects are the codebook cells (≤ 512) and the 1-row query
    vector — the documented l4d/l4f/l4h codebook envelope. The ADC scan
    is a map-only projection (the 32-entry distance table is a literal
    map), then one global top-10 — TakeOrderedAndProject, no full sort.
    At 100 TB: codes are 12 bits/vector (85× smaller than the float
    vectors), the scan reads codes only, and training cost is bounded by
    k·m·subdim cells per round regardless of corpus size."""
    import math

    from pyspark.sql.functions import pandas_udf

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * KMQ_SCALE)
        ).alias("qv"),
    )
    subs = q.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("long").alias("sub"),
                        F.slice("qv", s * L4J_SUBDIM + 1, L4J_SUBDIM).alias("sq"),
                    )
                    for s in range(L4J_M)
                ]
            )
        ).alias("x"),
    ).select("vec_id", "x.sub", "x.sq")

    seed_rows = q.sort("vec_id").limit(L4J_K).select("qv").collect()  # ≤ k rows
    # cents[sub] = (ascending cid array, k×subdim int matrix)
    cents: dict[int, tuple[list[int], list[list[int]]]] = {
        s: (
            list(range(len(seed_rows))),
            [list(r.qv[s * L4J_SUBDIM : (s + 1) * L4J_SUBDIM]) for r in seed_rows],
        )
        for s in range(L4J_M)
    }

    def make_nearest(cent_state: dict[int, tuple[list[int], list[list[int]]]]):
        arrs = {
            s: (np.array(cids, dtype=np.int64), np.array(cv, dtype=np.int64))
            for s, (cids, cv) in cent_state.items()
        }

        @pandas_udf("long")
        def nearest(sub: pd.Series, sq: pd.Series) -> pd.Series:
            out = np.zeros(len(sub), dtype=np.int64)
            if len(sub) == 0:
                return pd.Series(out)
            sub_np = sub.to_numpy()
            mat = np.array(list(sq), dtype=np.int64)
            for s, (cid_arr, cent) in arrs.items():
                mask = sub_np == s
                if mask.any() and cent.size:
                    d = ((mat[mask][:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                    # argmin takes the FIRST min; cids ascend → lower-cid tie
                    out[mask] = cid_arr[d.argmin(axis=1)]
            return pd.Series(out)

        return nearest

    assigned = None
    for _ in range(L4J_ITERS):
        nearest = make_nearest(cents)
        assigned = subs.select(
            "vec_id", "sub", "sq", nearest("sub", "sq").alias("cluster")
        )
        cells = (
            assigned.select("sub", "cluster", F.posexplode("sq").alias("sdim", "v"))
            .groupBy("sub", "cluster", "sdim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # ≤ m×k×subdim = 512 cells, corpus-size-independent
        )
        by_sub: dict[int, dict[int, dict[int, int]]] = {}
        for r in cells:
            by_sub.setdefault(r.sub, {}).setdefault(r.cluster, {})[r.sdim] = (
                math.floor(r.s / r.n)
            )
        cents = {
            s: (
                sorted(by_sub.get(s, {})),
                [
                    [by_sub[s][c][d] for d in sorted(by_sub[s][c])]
                    for c in sorted(by_sub.get(s, {}))
                ],
            )
            for s in range(L4J_M)
        }

    qrow = q.sort("vec_id").limit(1).collect()  # the 1-row query vector
    if not qrow:
        return assigned.select(
            "vec_id",
            F.lit(None).cast("bigint").alias("code"),
            F.lit(None).cast("bigint").alias("adc_dist"),
        ).limit(0)
    qv = list(qrow[0].qv)
    dtab: dict[tuple[int, int], int] = {}
    for s, (cids, cvs) in cents.items():
        qs = qv[s * L4J_SUBDIM : (s + 1) * L4J_SUBDIM]
        for cid, cv in zip(cids, cvs):
            dtab[(s, cid)] = sum((a - b) * (a - b) for a, b in zip(qs, cv))
    d_col = F.create_map(
        *[
            x
            for (s, cid), d in sorted(dtab.items())
            for x in (F.lit(s * 1000 + cid), F.lit(d))
        ]
    )
    per_vec = assigned.select(
        "vec_id",
        "sub",
        "cluster",
        F.element_at(d_col, (F.col("sub") * 1000 + F.col("cluster")).cast("int"))
        .cast("bigint")
        .alias("d"),
        (F.col("cluster") * F.pow(F.lit(L4J_K), F.col("sub")).cast("long"))
        .cast("bigint")
        .alias("code_part"),
    )
    return (
        per_vec.groupBy("vec_id")
        .agg(
            F.sum("code_part").cast("bigint").alias("code"),
            F.sum("d").cast("bigint").alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(10)
        .select("vec_id", "code", "adc_dist")
    )


L4K_NPROBE = 2

_L4K_ORACLE = (
    _L4H_CTES
    + f""",
    qv0 AS (SELECT dim, qv FROM pts
            WHERE vec_id = (SELECT min(vec_id) FROM pts)),
    cdist AS (SELECT c.cid, sum((q.qv - c.cv) * (q.qv - c.cv)) AS d
              FROM c2 c JOIN qv0 q USING (dim) GROUP BY 1),
    probed AS (SELECT cid FROM cdist ORDER BY d, cid LIMIT {L4K_NPROBE}),
    members AS (SELECT a.vec_id, a.cid FROM a2 a JOIN probed USING (cid)),
    vdist AS (SELECT m.vec_id, CAST(any_value(m.cid) AS BIGINT) AS cluster,
                     CAST(sum((p.qv - q.qv) * (p.qv - q.qv)) AS BIGINT)
                         AS l2_dist
              FROM members m JOIN pts p ON p.vec_id = m.vec_id
              JOIN qv0 q ON q.dim = p.dim
              GROUP BY m.vec_id)
    SELECT vec_id, cluster, l2_dist FROM vdist
    ORDER BY l2_dist, vec_id LIMIT 10
"""
)


@register("l4k_ivf_quantized", family="L4", oracle=_L4K_ORACLE)
def l4k_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed IVF (inverted-file) ANN — the IVF family's
    hash-verified member (l4c's float form stays rows-only by design),
    completing the quantized-upgrade set: l4h (k-means), l2i (SemDeDup),
    l4j (PQ), now IVF. The coarse quantizer IS l4h's shared
    integer-exact Lloyd (`_quantized_lloyd`, 2 iterations) — the oracle
    literally reuses the same unrolled CTE prefix — then the query
    (min vec_id) picks its {L4K_NPROBE} nearest centroids by exact
    integer L2 (ties to the lower cid) and scans ONLY those inverted
    lists exactly, top-10 by (distance, vec_id). Training, list
    assignment, probe selection, and the final ranking are all inside
    the cross-engine hash.

    Scale shape — the IVF promise: the probe selection is k driver-side
    integer ops (centroids already bounded-collected by the shared
    Lloyd), and the scan touches |nprobe|/k of the corpus — a
    cluster-pruned map-only filter + zip_with integer fold + global
    top-10 (TakeOrderedAndProject). The list scan carries quantized INT
    arrays; nothing shuffles but top-k partials. At 100 TB the lists
    are partition-pruned files keyed by cluster id (the archive layout's
    S9 story applied to vectors)."""
    assigned, cids, cents = _quantized_lloyd(spark, sf_dir)
    qrow = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.floor(x.cast("double") * KMQ_SCALE)
            ).alias("qv"),
        )
        .sort("vec_id")
        .limit(1)
        .collect()
    )
    if not qrow:  # empty corpus
        return assigned.select(
            "vec_id",
            F.lit(None).cast("bigint").alias("cluster"),
            F.lit(None).cast("bigint").alias("l2_dist"),
        ).limit(0)
    qv = [int(x) for x in qrow[0].qv]
    cdist = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
        for cid, cv in zip(cids, cents)
    )
    probed = [cid for _d, cid in cdist[:L4K_NPROBE]]
    q_lit = F.array(*[F.lit(x).cast("long") for x in qv])
    l2 = F.aggregate(
        F.zip_with("q", q_lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        assigned.where(F.col("cluster").isin(probed))
        .select(
            "vec_id",
            F.col("cluster").cast("bigint").alias("cluster"),
            l2.cast("bigint").alias("l2_dist"),
        )
        .orderBy("l2_dist", "vec_id")
        .limit(10)
    )


L4M_SCALE = 1000  # fixed-point: component 1.0 ≡ 1000
L4M_ITERS = 2

_L4M_STEP = """
    SELECT xe.j, CAST(sum(xe.xq * d.dot) AS BIGINT) AS u
    FROM xe JOIN (
        SELECT xe.vec_id, CAST(sum(xe.xq * v.v) AS BIGINT) AS dot
        FROM xe JOIN {prev} v USING (j) GROUP BY 1
    ) d USING (vec_id)
    GROUP BY 1
"""

_L4M_NORM = """
    SELECT j,
           CAST(CASE WHEN u >= 0
                     THEN (u * {scale}) // m
                     ELSE -((-u * {scale}) // m) END AS BIGINT) AS v
    FROM {u}, (SELECT max(abs(u)) AS m FROM {u})
"""

L4M_ORACLE = f"""
    WITH xe AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS j,
               CAST(round(unnest(embedding) * {L4M_SCALE}) AS BIGINT) AS xq
        FROM embeddings
    ),
    v0 AS (SELECT DISTINCT j, CAST({L4M_SCALE} AS BIGINT) AS v FROM xe),
    u1 AS ({_L4M_STEP.format(prev="v0")}),
    v1 AS ({_L4M_NORM.format(u="u1", scale=L4M_SCALE)}),
    u2 AS ({_L4M_STEP.format(prev="v1")}),
    v2 AS ({_L4M_NORM.format(u="u2", scale=L4M_SCALE)})
    SELECT CAST(j AS BIGINT) AS dim_idx, v AS pc1_fp FROM v2
"""


@register("l4m_power_iteration_quantized", family="L4", oracle=L4M_ORACLE)
def l4m_power_iteration_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed POWER ITERATION over the embedding corpus — the PCA
    core (top principal direction of XᵀX), the fourth hash-verified
    iterative algorithm (after l4h k-means, l2i SemDeDup, g1 PageRank)
    and the first distributed LINEAR ALGEBRA one: two steps of
    v ← normalize(Xᵀ(Xv)), integer fixed-point throughout so both
    engines produce identical BIGINTs. PCA whitening/projection is the
    standard preprocessing for embedding dedup (SemDeDup) and ANN index
    training (OPQ's rotation starts here) — at 100 TB you compute it
    exactly like this: never materialize the d×d Gram matrix, just two
    corpus passes per step.

    Exactness: components quantize to integer thousandths (|xq| ≤ ~530
    here); v is fixed-point with |v| ≤ 1000, so dot = Σ_j xq·v ≤ 3.4e7,
    per-dimension u = Σ_i xq·dot ≤ 9e13 at the 64× probe scale and
    u·1000 ≤ 9e16 — inside int64 on both engines (Spark sum(long) under
    ANSI would raise on overflow rather than wrap, so the bound is
    enforced, not hoped). Normalization divides by max|u| with the
    sign-split DIV (u can be negative; Spark `div` and DuckDB `//`
    agree only on non-negative operands — CLAUDE.md's t31 rule). Sign
    of the result is deterministic because v₀ = +1000 is fixed.

    Scale shape: Xv is one hash agg keyed on vec_id (keys grow with the
    corpus); Xᵀ(Xv) is one hash agg keyed on dimension (64 groups —
    low-cardinality is FINE for aggregation: partial aggregation
    combines map-side, unlike the low-cardinality WINDOW disease); the
    v-vector joins broadcast (64 rows) and max|u| is a 1-row broadcast.
    Two corpus passes per iteration, zero driver-side collect, plan
    depth O(iters) like g1. Convergence-to-PC1 on an engineered
    anisotropic corpus plus step-for-step equality vs an integer numpy
    reference are pinned by test_llm.py::test_power_iteration_quantized."""
    emb = load_table(spark, sf_dir, "embeddings")
    xe = emb.select(
        "vec_id", F.posexplode("embedding").alias("p", "x")
    ).select(
        "vec_id",
        (F.col("p") + 1).alias("j"),
        F.round(F.col("x") * L4M_SCALE).cast("long").alias("xq"),
    )
    v = xe.select("j").distinct().select(
        "j", F.lit(L4M_SCALE).cast("bigint").alias("v")
    )
    for _ in range(L4M_ITERS):
        d = (
            xe.join(F.broadcast(v), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xq") * F.col("v")).cast("bigint").alias("dot"))
        )
        u = (
            xe.join(d, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("xq") * F.col("dot")).cast("bigint").alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = u.crossJoin(F.broadcast(m)).select(
            "j",
            F.when(
                F.col("u") >= 0, F.expr(f"(u * {L4M_SCALE}) div m")
            )
            .otherwise(-F.expr(f"((-u) * {L4M_SCALE}) div m"))
            .cast("bigint")
            .alias("v"),
        )
    return v.select(F.col("j").cast("bigint").alias("dim_idx"), F.col("v").alias("pc1_fp"))


# ---------------------------------------------------------------------------
# l4n: Johnson-Lindenstrauss sign random projection (Achlioptas 2003:
# ±1 entries suffice for JL) — embedding compression for ANN shortlists.
# The sign matrix is derived from md5 (deterministic, no RNG), inlined
# as literals in BOTH engines, so the whole pipeline is integer-exact.
L4N_OUT_DIMS = 8
L4N_IN_DIMS = 64
L4N_Q = 1000  # milli-unit quantization of raw float coordinates


def _l4n_sign(j: int, d: int) -> int:
    import hashlib

    return 1 if hashlib.md5(f"l4n:{j}:{d}".encode()).digest()[0] % 2 == 0 else -1


L4N_SIGNS = tuple(
    tuple(_l4n_sign(j, d) for d in range(L4N_IN_DIMS)) for j in range(L4N_OUT_DIMS)
)


def _l4n_proj_sql(j: int) -> str:
    """proj_j as ±q[d] sum over the quantized DuckDB list column ``q``."""
    terms = [
        ("+" if L4N_SIGNS[j][d] > 0 else "-") + f" q[{d + 1}]"
        for d in range(L4N_IN_DIMS)
    ]
    return " ".join(terms).lstrip("+ ")


_L4N_ORACLE = f"""
    WITH p AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * {L4N_Q}) AS BIGINT)) AS q
        FROM embeddings
    ),
    proj AS (
        SELECT vec_id,
               {", ".join(f"CAST({_l4n_proj_sql(j)} AS BIGINT) AS p{j}" for j in range(L4N_OUT_DIMS))}
        FROM p
    ),
    qp AS (SELECT * FROM proj WHERE vec_id = 0)
    SELECT c.vec_id,
           CAST({" + ".join(f"(c.p{j} - qp.p{j}) * (c.p{j} - qp.p{j})" for j in range(L4N_OUT_DIMS))}
                AS BIGINT) AS pdist
    FROM proj c, qp
    WHERE c.vec_id <> 0
    ORDER BY pdist, c.vec_id
    LIMIT 10
"""


@register("l4n_random_projection", family="L4", oracle=_L4N_ORACLE)
def l4n_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection (64→8 dims)
    + nearest-10 in the projected space — the embedding
    COMPRESSION stage of an ANN pipeline (project once at index-build
    time, shortlist in the cheap space, re-rank survivors exactly; the
    shortlist scan touches 8 ints/vector instead of 64 floats). The
    ±1 matrix follows Achlioptas 2003 (sign entries satisfy the JL
    lemma) and is derived from md5 of (j, d) — deterministic, no RNG —
    inlined as literals in both engines.

    Cross-engine exactness: raw coordinates quantize to milli-units
    (round(x·1000), the t31 precedent — float→double cast is exact and
    both engines round half away from zero), every projection is a ±1
    dot product over those BIGINTs, and the query's projection comes
    from the SAME in-engine expression (a 1-row CTE / broadcast, never
    a driver-side Python round, whose banker's rounding differs).
    Distances are exact integer L2 in the projected space; top-10
    orders by (pdist, vec_id) — the LIMIT determinism rule.

    Scale shape: projection is MAP-ONLY (zip_with against a literal
    sign array + integer fold — inside codegen, no UDF, the corpus
    never shuffles); the 1-row query projection broadcasts; top-10 is
    TakeOrderedAndProject. At 100 TB this is the index-build pass: one
    linear scan emitting 8 BIGINTs per vector, partition-preserving."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * L4N_Q, 0).cast("long")
    )
    proj_cols = [
        F.aggregate(
            F.zip_with(
                q,
                F.array(*[F.lit(s) for s in L4N_SIGNS[j]]),
                lambda a, b: a * b.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"p{j}")
        for j in range(L4N_OUT_DIMS)
    ]
    proj = emb.select("vec_id", *proj_cols)
    qp = proj.filter(F.col("vec_id") == 0).select(
        *[F.col(f"p{j}").alias(f"qp{j}") for j in range(L4N_OUT_DIMS)]
    )
    pdist = None
    for j in range(L4N_OUT_DIMS):
        term = (F.col(f"p{j}") - F.col(f"qp{j}")) * (
            F.col(f"p{j}") - F.col(f"qp{j}")
        )
        pdist = term if pdist is None else pdist + term
    return (
        proj.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qp))
        .select("vec_id", pdist.cast("bigint").alias("pdist"))
        .orderBy("pdist", "vec_id")
        .limit(10)
    )
