"""Training-data pipeline operators (north-star extension beyond
SURVEY.md §2.9): deterministic dataset splitting, token-budget sequence
packing, benchmark decontamination, and PII redaction — the remaining
standard stages of an LLM pretraining-data pipeline after dedup
(llm/dedup.py) and quality filtering (llm/text.py).

Every operator here is a pure column-expression plan (no UDFs), so at
100 TB it runs fully inside WholeStageCodegen; the only shuffles are the
final aggregations, which all carry pre-reduced rows (never raw text).
All four document ops ship DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.llm.dedup import shingled_docs
from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table

# d2: token budget per packed training chunk (small so sf0.01's ~30-token
# docs produce multi-doc chunks; the operator is budget-agnostic).
PACK_BUDGET = 512

# d3: n-gram order for contamination matching. Real pipelines use 8-13;
# the synthetic corpus has a tiny vocabulary, so 4-grams reproduce the
# realistic regime (a small, non-empty contaminated set) at sf0.01.
DECON_NGRAM = 4


def split_bucket(text: Column) -> Column:
    """Deterministic 0-99 bucket from a content hash.

    md5 → first 8 hex chars → unsigned int → mod 100: identical arithmetic
    is expressible in DuckDB (``CAST('0x'||substring(md5(t),1,8) AS
    BIGINT)``), so the assignment is engine-independent — the property that
    makes a split reproducible across backfills and cluster sizes, unlike
    ``rand(seed)`` which is partition-layout-dependent.
    """
    return F.conv(F.substring(F.md5(text), 1, 8), 16, 10).cast("long") % 100


@register(
    "d1_train_split",
    family="L7",
    oracle="""
        SELECT lang, split, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM (
            SELECT lang, text,
                   CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT lang, text,
                       CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)
                           % 100 AS b
                FROM documents
            )
        )
        GROUP BY lang, split
    """,
)
def d1_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content hash,
    summarized per (lang, split). Content-keyed (not id-keyed) so exact
    duplicates always land in the same split — no train/test leakage via
    dup pairs. Stateless per-row expression: no shuffle before the final
    pre-aggregated rollup, and re-running on 1000 executors yields the
    byte-identical assignment."""
    docs = load_table(spark, sf_dir, "documents")
    b = split_bucket(F.col("text"))
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    n_tokens = F.size(F.split("text", " "))
    return (
        docs.select("lang", split.alias("split"), n_tokens.alias("n"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n").cast("long")).alias("total_tokens"),
        )
    )


@register(
    "d2_sequence_packing",
    family="L7",
    oracle=f"""
        SELECT lang,
               CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
        FROM (
            SELECT lang, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM (
                SELECT lang, doc_id,
                       len(string_split(text, ' ')) AS n_tokens
                FROM documents
            )
        )
        GROUP BY lang, chunk_id
    """,
)
def d2_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign documents (per language, in
    doc_id order) to consecutive training chunks of ~{budget} tokens via a
    running-sum window — chunk = floor(tokens-before-me / budget). One
    shuffle on the partition key, then a sort within partitions; the text
    itself never moves, only (lang, doc_id, n_tokens) triples. At 100 TB
    the window partitions by lang only — for a skewed corpus, sub-salt the
    partition key (lang, doc_id div K) and offset chunk ids per salt with
    a second pass over the K per-salt totals (K rows)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).alias("n_tokens")
    base = docs.select("lang", "doc_id", n_tokens)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        base.select(
            "lang",
            "n_tokens",
            F.floor(cum_before / PACK_BUDGET).alias("chunk_id"),
        )
        .groupBy("lang", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("chunk_tokens"),
        )
    )


def _ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams as a column expression. Guarded so short
    documents yield an empty array (Spark's ``sequence(1, k)`` with k<1
    would count DOWN, not return empty)."""
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


@register(
    "d3_decontamination",
    family="L7",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(t) - {DECON_NGRAM} + 2),
                       i -> array_to_string(
                           list_slice(t, i, i + {DECON_NGRAM} - 1), ' ')
                   )) AS g
            FROM toks
        ),
        eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
        SELECT doc_id, count(DISTINCT g) AS n_shared
        FROM grams JOIN eval_g USING (g)
        WHERE doc_id % 97 <> 0
        GROUP BY doc_id
    """,
)
def d3_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word {n}-gram with the held-out eval set (stand-in: doc_id % 97 = 0),
    reporting how many distinct eval n-grams each one shares.

    Scale shape: the eval side collapses to a DISTINCT n-gram set —
    benchmark suites are tiny relative to a 100 TB corpus — and is
    broadcast, so the corpus-side n-gram explosion streams through a
    broadcast-hash semi-ish join with NO shuffle of raw n-grams; only the
    matched (doc_id, gram) survivors shuffle into the per-doc count. For
    an eval set too big to broadcast, drop the hint and let AQE pick the
    join; the plan stays otherwise identical."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(_ngrams(F.split("text", " "), DECON_NGRAM)).alias("g")
    )
    eval_grams = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
    )


@register(
    "d3b_fuzzy_decontamination",
    family="L7",
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
            SELECT t.doc_id, e.doc_id AS eval_doc_id, count(*) AS i
            FROM sh t JOIN sh e ON t.shingle = e.shingle
            WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
            GROUP BY 1, 2
        )
        SELECT inter.doc_id AS doc_id, eval_doc_id,
               round(i * 1.0 / (st.n + se.n - i), 4) AS jaccard
        FROM inter
        JOIN sizes st ON st.doc_id = inter.doc_id
        JOIN sizes se ON se.doc_id = eval_doc_id
        WHERE i * 1.0 / (st.n + se.n - i) >= 0.2
        QUALIFY row_number() OVER (
            PARTITION BY inter.doc_id
            ORDER BY i * 1.0 / (st.n + se.n - i) DESC, eval_doc_id) = 1
    """,
)
def d3b_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY decontamination — d3 catches verbatim n-gram overlap; this
    catches paraphrased/truncated contamination: training docs whose
    3-gram-shingle Jaccard against ANY eval doc (stand-in split:
    doc_id % 7 = 0) reaches 0.2, reporting each doc's best-matching
    eval doc. l2b's inverted-index machinery pointed ACROSS corpora.

    Scale shape: the eval side is tiny relative to the corpus, so its
    postings BROADCAST — the training corpus's shingle explosion streams
    through a broadcast-hash join without ever shuffling raw shingles;
    only (train_id, eval_id) intersection counts shuffle. At an eval set
    too big for that, l2's MinHash/LSH banding pre-filters candidates
    and this exact pass runs per bucket. Argmax tie-broken on eval id —
    cross-engine deterministic."""
    sh = shingled_docs(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    train = sh.filter(F.col("doc_id") % 7 != 0)
    ev = sh.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    inter = (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    st = sizes.select(F.col("doc_id"), F.col("n").alias("nt"))
    se = sizes.select(F.col("doc_id").alias("eval_doc_id"), F.col("n").alias("ne"))
    jac = F.col("i") / (F.col("nt") + F.col("ne") - F.col("i"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("jac"), "eval_doc_id")
    return (
        inter.join(st, "doc_id")
        .join(F.broadcast(se), "eval_doc_id")
        .filter(jac >= 0.2)
        .select("doc_id", "eval_doc_id", jac.alias("jac"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "eval_doc_id", F.round("jac", 4).alias("jaccard"))
    )


# Identical Java-regex / RE2 subset: character classes, +, {m,}, alternation.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9][0-9-]{7,}"


@register(
    "d4_pii_redaction",
    family="L7",
    oracle=f"""
        SELECT doc_id,
               substring(regexp_replace(
                   regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'), 1, 80) AS redacted_head,
               len(regexp_extract_all(aug, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(aug, '{_PHONE_RE}')) AS n_phones
        FROM (
            SELECT doc_id,
                   'u' || doc_id || '@mail.example call +1-555-0199 ' || text
                       AS aug
            FROM documents
        )
    """,
)
def d4_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails and phone numbers, reporting match
    counts per document. The synthetic corpus contains no PII, so a
    deterministic contact header is prepended first — every row then
    exercises both patterns end-to-end (fixture-level behavior is also
    unit-tested). Row-local regexp expressions: zero shuffles, scales
    embarrassingly; the regexes stay in the Java-regex ∩ RE2 subset so
    both engines agree."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.lit("u"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example call +1-555-0199 "),
        F.col("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.substring(redacted, 1, 80).alias("redacted_head"),
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("n_phones"),
    )


@register(
    "a9_unpivot",
    family="A8",
    oracle="""
        WITH wide AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   round(sum(l_discount), 2)      AS sum_disc
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_qty'   AS measure, sum_qty   AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_disc'  AS measure, sum_disc  AS value FROM wide
    """,
)
def a9_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide→long, the inverse of a8's pivot) via
    ``DataFrame.unpivot``. Catalyst plans it as a single Expand over the
    already-aggregated 3-row wide relation — N measure columns become N×
    rows without re-scanning or re-shuffling the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "value"
    )


# d5: per-stratum keep-rates (percent of the 0-99 hash bucket space).
SAMPLE_RATES = {"en": 50, "de": 20, "fr": 20, "es": 20, "zh": 20}
SAMPLE_DEFAULT = 10


@register(
    "d5_stratified_sample",
    family="L7",
    oracle=f"""
        SELECT lang, count(*) AS n_total,
               CAST(sum(CASE WHEN b < CASE lang
                                WHEN 'en' THEN 50 WHEN 'de' THEN 20
                                WHEN 'fr' THEN 20 WHEN 'es' THEN 20
                                WHEN 'zh' THEN 20 ELSE {SAMPLE_DEFAULT} END
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM (
            SELECT lang,
                   CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)
                       % 100 AS b
            FROM documents
        )
        GROUP BY lang
    """,
)
def d5_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by language with per-stratum rates — corpus
    rebalancing for training mixes. Uses the same content-hash bucket as
    [d1], NOT ``sample()``/``rand()``: the kept set is a deterministic
    function of content, so it is reproducible across runs, partition
    layouts, and engines (which seeded ``rand`` is not), and composes with
    the d1 split (independent-looking but fixed assignments). Stateless
    row expression + pre-aggregated rollup: one shuffle of (lang, partial
    counts) only."""
    docs = load_table(spark, sf_dir, "documents")
    b = split_bucket(F.col("text"))
    rate = F.lit(SAMPLE_DEFAULT)
    for lang, pct in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return (
        docs.select("lang", (b < rate).cast("int").alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").cast("bigint").alias("n_sampled"),
        )
    )


@register(
    "d6_embedding_quantization",
    family="L7",
    oracle="""
        SELECT vec_id,
               round(127.0 / maxabs, 6) AS scale,
               array_to_string(list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / maxabs))
                             AS INTEGER)), ',') AS q
        FROM (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS maxabs
            FROM embeddings
        )
    """,
)
def d6_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings (per-vector max-abs
    scaling) — 4× storage/bandwidth reduction for ANN indexes at 100 TB.
    Pure higher-order array expressions, row-local, zero shuffles; the
    max-abs is materialized in its own projection first (Catalyst does
    not CSE inside lambda bodies — the shingle-pipeline lesson), so each
    element transform reuses one computed scale instead of re-reducing
    the array per element. The quantized vector is emitted comma-joined
    (a7's list-serialization convention): a raw list column survives
    ``fetchall`` but materializes differently through pandas/arrow
    (ndarray vs list), the same representation-hash trap as HUGEINT —
    see tools/audit_oracle_types.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scaled = emb.select("vec_id", "embedding", maxabs.alias("maxabs"))
    scale = F.lit(127.0) / F.col("maxabs")
    return scaled.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.concat_ws(
            ",",
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * scale).cast("int")
            ),
        ).alias("q"),
    )


SHUFFLE_SEED = "seed0"


@register(
    "d7_deterministic_shuffle",
    family="L7",
    oracle=f"""
        SELECT doc_id,
               row_number() OVER (ORDER BY md5(text || '{SHUFFLE_SEED}'), doc_id)
                   AS pos
        FROM documents WHERE text IS NOT NULL
    """,
)
def d7_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: every document gets a stable
    pseudo-random position = its rank under a seeded content hash —
    reproducible training-data ordering (change the seed, get a fresh
    shuffle; rerun anywhere, get the same one).

    A naive ``row_number() OVER (ORDER BY hash)`` is a GLOBAL window —
    one partition, one task, the worst scale shape there is. This plans
    it as a two-phase banded rank instead: the hash's first byte is a
    256-way band whose lexicographic order refines the global order
    (the band is a prefix of the hash), so position = (count of rows in
    lower bands, a 256-row broadcast) + (rank within my band, a 256-way
    parallel window). Same trick as w3b: turn a cardinality-1 partition
    key into (band) × parallel, exact results, no sampling-based range
    partitioner nondeterminism. Band sizing: first byte = 256 bands is
    right up to ~10 M rows; past that take two bytes (65 536 bands) so
    per-band sorts stay small — w1c's measured rule (SCALE.md).

    NULL-text docs are excluded EXPLICITLY (text-family convention):
    without the filter their NULL hash forms a NULL band whose count
    silently inflates every real band's broadcast offset (the rank join
    drops the rows themselves, so positions were off by exactly the
    NULL-doc count — r5 NULL-text probe)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    h = F.md5(F.concat(F.col("text"), F.lit(SHUFFLE_SEED)))
    banded = docs.select(
        "doc_id", h.alias("h"), F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("band")
    )
    w_in = Window.partitionBy("band").orderBy("h", "doc_id")
    counts = banded.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    w_off = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "band", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    return (
        banded.join(F.broadcast(offsets), "band")
        .select(
            "doc_id",
            (F.col("offset") + F.row_number().over(w_in)).alias("pos"),
        )
    )


@register(
    "d8_mixture_weights",
    family="L7",
    oracle="""
        WITH tok AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
            FROM documents GROUP BY source
        ),
        tot AS (SELECT sum(actual_tokens) AS total, count(*) AS n_sources FROM tok)
        SELECT source, actual_tokens,
               round(actual_tokens * 1.0 / total, 6) AS actual_share,
               round((1.0 / n_sources) / (actual_tokens * 1.0 / total), 6)
                   AS weight_to_uniform
        FROM tok CROSS JOIN tot
    """,
)
def d8_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source token shares and the
    sampling weight that rebalances each source to a uniform target mix —
    the bookkeeping step behind training-data mixtures (swap the uniform
    target for any desired distribution by joining a weights dim).

    The per-source rollup reduces the corpus to |sources| rows before the
    single-row totals cross-join (broadcast, Catalyst folds it into the
    projection), so nothing heavier than the first aggregation touches
    the data."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).cast("bigint").alias("actual_tokens")
    )
    tot = tok.agg(
        F.sum("actual_tokens").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    share = F.col("actual_tokens") / F.col("total")
    return tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "actual_tokens",
        F.round(share, 6).alias("actual_share"),
        F.round((F.lit(1.0) / F.col("n_sources")) / share, 6).alias("weight_to_uniform"),
    )


SUBSTR_K = 8  # window length in tokens (real pipelines use ~50; test docs are short)


@register(
    "d9_substring_dedup",
    family="L7",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        pos AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(t) - {SUBSTR_K} + 2),
                       i -> md5(array_to_string(t[i:i+{SUBSTR_K}-1], ' ')))) AS w
            FROM toks WHERE len(t) >= {SUBSTR_K}
        ),
        wc AS (SELECT w, count(*) AS c FROM pos GROUP BY w)
        SELECT doc_id,
               count(*) AS n_windows,
               CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows,
               round(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                   AS dup_fraction
        FROM pos JOIN wc USING (w)
        GROUP BY doc_id
    """,
)
def d9_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication signal (the Lee-et-al. exact-substring
    dedup family): every k-token rolling window is fingerprinted; a window
    whose fingerprint occurs ≥2 times anywhere in the corpus is a
    duplicated span. Per document: window count, duplicated-window count,
    and the duplicated fraction that drives drop/trim decisions.

    Windows are md5-fingerprinted BEFORE the corpus-wide count, so the
    shuffle carries 32-byte digests instead of k-token strings — the same
    digest-only-shuffle posture as l1 (and the only workable one at
    100 TB, where window text would dominate shuffle volume; suffix
    arrays solve the same problem in one pass on a single node, this is
    the distributed-join form). The per-doc fraction divides two
    integers once — IEEE-exact on both engines, no accumulation-order
    hazard. Tokens materialize in their own projection (no CSE inside
    lambda bodies)."""
    k = SUBSTR_K
    docs = load_table(spark, sf_dir, "documents")
    toked = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= k)
    )
    wins = F.transform(
        F.sequence(F.lit(0), F.size("t") - k),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i + 1, k))),
    )
    pos = toked.select("doc_id", F.explode(wins).alias("w"))
    wc = pos.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    dup = (F.col("c") >= 2).cast("int")
    return (
        pos.join(wc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(dup).alias("n_dup_windows"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 6).alias("dup_fraction"),
        )
    )


@register(
    "d10_quality_report",
    family="L7",
    oracle="""
        SELECT event_type,
               count(*)                                        AS n_rows,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_value,
               CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_negative_value,
               count(*) - count(DISTINCT event_id)             AS n_dup_ids,
               CAST(sum(CASE WHEN props IS NULL
                              OR json_extract_string(props, '$.k') IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT)     AS n_bad_props,
               CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_ts
        FROM events
        GROUP BY event_type
    """,
)
def d10_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-ingest data-validation report (the Deequ-style constraint pass a
    pipeline runs before accepting a batch): per event type — row count,
    null/negative values, duplicate ids, unparseable/missing JSON props,
    null timestamps. All checks fold into ONE hash aggregation (conditional
    sums + one count-distinct), so validation costs a single scan + one
    shuffle regardless of how many constraints are stacked; every output is
    an integer count — engine-deterministic by construction."""
    events = load_table(spark, sf_dir, "events")
    flag = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        flag(F.col("value").isNull()).alias("n_null_value"),
        flag(F.col("value") < 0).alias("n_negative_value"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("n_dup_ids"),
        flag(
            F.col("props").isNull()
            | F.get_json_object("props", "$.k").isNull()
        ).alias("n_bad_props"),
        flag(F.col("ts").isNull()).alias("n_null_ts"),
    )


# d11: RAG/packing-style chunk geometry. Small so the ~30-token test docs
# produce multi-chunk output; the operator is (W, O)-agnostic.
CHUNK_W = 16  # tokens per chunk
CHUNK_O = 4  # overlap between consecutive chunks


@register(
    "d11_doc_chunking",
    family="L7",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        )
        SELECT doc_id,
               CAST(s.i - 1 AS BIGINT) AS chunk_idx,
               array_to_string(
                   list_slice(t, (s.i - 1) * {CHUNK_W - CHUNK_O} + 1,
                              (s.i - 1) * {CHUNK_W - CHUNK_O} + {CHUNK_W}), ' ')
                   AS chunk_text,
               CAST(least(len(t) - (s.i - 1) * {CHUNK_W - CHUNK_O},
                          {CHUNK_W}) AS BIGINT) AS n_tokens
        FROM toks,
             LATERAL unnest(range(1,
                 CASE WHEN len(t) <= {CHUNK_W} THEN 1
                      ELSE CAST(ceil((len(t) - {CHUNK_W})
                                     / {CHUNK_W - CHUNK_O}.0) AS BIGINT) + 1
                 END + 1)) AS s(i)
    """,
)
def d11_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (RAG indexing / long-doc
    training prep): split each document into chunks of {W} tokens with
    {O}-token overlap — stride {W−O}, last chunk ragged, a doc at or
    under {W} tokens yields exactly one chunk.

    Pure column expressions: tokenize once, ``sequence`` over chunk
    starts, ``transform`` + ``slice`` + ``array_join`` to build chunk
    text, explode LAST (the one-to-many row generation, ~len/stride
    fan-out). No UDF, no shuffle at all — chunking is embarrassingly
    parallel and stays inside WholeStageCodegen; at 100 TB this runs at
    scan speed. Chunk count = ceil((len−W)/stride)+1 — written
    identically in the DuckDB oracle, so geometry (idx, text, ragged
    tail length) is string/integer-exact across engines."""
    docs = load_table(spark, sf_dir, "documents")
    stride = CHUNK_W - CHUNK_O
    toked = docs.select("doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    n_chunks = (
        F.when(n <= CHUNK_W, F.lit(1))
        .otherwise(F.ceil((n - CHUNK_W) / float(stride)).cast("long") + 1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.array_join(F.slice("t", i * stride + 1, CHUNK_W), " ").alias(
                "chunk_text"
            ),
            F.least(n - i * stride, F.lit(CHUNK_W)).cast("long").alias("n_tokens"),
        ),
    )
    return toked.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens"
    )


@register(
    "d12_vocab_coverage",
    family="L7",
    oracle="""
        WITH counts AS (
            SELECT token, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents WHERE text IS NOT NULL)
            WHERE token <> ''
            GROUP BY token
        ),
        top AS (
            SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 64
        )
        SELECT token,
               CAST(n AS BIGINT) AS n_occurrences,
               CAST(floor(CAST(sum(n) OVER (ORDER BY n DESC, token
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS DOUBLE)
                          / (SELECT CAST(sum(n) AS DOUBLE) FROM counts)
                          * 1e6) / 1e6
                    AS DOUBLE) AS cum_coverage
        FROM top
    """,
)
def d12_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary sizing: the top-V corpus tokens with the
    CUMULATIVE share of all token occurrences a V-entry vocab covers —
    the curve that answers "how big must the vocab be for X% coverage"
    before training a tokenizer. Complements l5b (term/doc frequencies):
    this is the corpus-global coverage integral, not per-term stats.

    Scale order matters: the top-64 head is taken FIRST
    (TakeOrderedAndProject — no global sort) and the running sum windows
    over only those 64 rows; a prefix of a consistently-ordered set has
    the same cumulative sums as the full-vocabulary window, so the
    million-token tail never enters a single-partition window (the w1c
    lesson). The denominator is one scalar aggregate broadcast back
    (1-row cross join, the d8 pattern). Total occurrences ≤ 2^53 so the
    double denominator is exact; the one quotient per row is the
    identical IEEE double on both engines, floor-truncated tie-free (f8
    convention). NULL text is excluded EXPLICITLY on both paths (the
    repo-wide text-op convention, pinned by tests/test_null_input.py) —
    explode/unnest would drop it anyway, but the explicit filter keeps
    the NULL alignment robust to future edits; '' tokens are filtered
    on both paths."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "token").limit(64)
    w = Window.orderBy(F.desc("n"), "token").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = counts.agg(F.sum("n").cast("double").alias("tot"))
    return (
        top.withColumn("cum", F.sum("n").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            F.col("n").alias("n_occurrences"),
            (F.floor(F.col("cum").cast("double") / F.col("tot") * 1e6) / 1e6)
            .cast("double")
            .alias("cum_coverage"),
        )
    )


D13_ORACLE = """
        WITH d AS (
            SELECT doc_id, lang, sha256(text) AS digest
            FROM documents WHERE text IS NOT NULL
        ),
        manifest AS (
            SELECT DISTINCT digest FROM d WHERE doc_id % 2 = 0
        ),
        incoming AS (
            SELECT * FROM d WHERE doc_id % 3 = 0
        ),
        fresh AS (
            SELECT * FROM incoming
            WHERE digest NOT IN (SELECT digest FROM manifest)
        )
        SELECT digest,
               CAST(min(doc_id) AS BIGINT) AS doc_id,
               arg_min(lang, doc_id)       AS lang,
               CAST(count(*) AS BIGINT)    AS n_in_batch
        FROM fresh
        GROUP BY digest
    """


@register("d13_incremental_dedup", family="L7", oracle=D13_ORACLE)
def d13_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL (delta) exact dedup — the recurring-crawl shape the
    single-corpus d/l1 ops don't cover: an INCOMING batch is deduplicated
    against the digest MANIFEST of the already-ingested corpus (left
    anti-join on content digest), then within itself (min-id
    representative per digest), and only the survivors proceed to the
    expensive downstream stages. Snapshots are simulated from the one
    documents table: the manifest holds digests of even doc_ids (the
    prior snapshot), the incoming batch is doc_id % 3 = 0 — ids
    divisible by 6 are genuine re-crawls and the anti-join really drops
    them (~1/2 of the batch at every SF; texts are unique per doc_id in
    this corpus, so digest membership ⇔ same document).

    At 100 TB this is THE exact-dedup access pattern: the corpus is never
    re-scanned — its manifest is a digest-only table (32 bytes/doc, ~3 TB
    per 100 B docs) that the daily batch shuffle-joins on digest; the
    batch side is small, so AQE picks a broadcast when it fits. Shuffles
    carry digests, never text (l1's rule); NULL text is excluded on both
    paths per the repo-wide text-op convention."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    d = docs.select(
        "doc_id", "lang", F.sha2(F.col("text"), 256).alias("digest")
    )
    manifest = d.filter(F.col("doc_id") % 2 == 0).select("digest").distinct()
    incoming = d.filter(F.col("doc_id") % 3 == 0)
    fresh = incoming.join(manifest, "digest", "left_anti")
    return fresh.groupBy("digest").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", F.col("doc_id")).alias("lang"),
        F.count(F.lit(1)).alias("n_in_batch"),
    )


@register(
    "d15_manifest_compaction",
    family="L7",
    oracle="""
        WITH d AS (
            SELECT doc_id, lang, sha256(text) AS digest
            FROM documents WHERE text IS NOT NULL
        ),
        seen AS (
            SELECT * FROM d WHERE doc_id % 2 = 0
            UNION ALL
            SELECT * FROM d WHERE doc_id % 3 = 0
        )
        SELECT digest,
               CAST(count(*) AS BIGINT)    AS n_seen,
               CAST(min(doc_id) AS BIGINT) AS rep_id,
               arg_min(lang, doc_id)       AS rep_lang
        FROM seen
        GROUP BY digest
    """,
)
def d15_manifest_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST COMPACTION — the third leg of the incremental-ingest
    triad (d13 screens exact dupes against the manifest, d14 screens
    near-dups against the band manifest, d15 folds the day's batch INTO
    the manifest): the at-rest manifest and the day's batch are both
    per-digest PARTIAL aggregates (occurrence count, min-id
    representative, argmin lang), and the refreshed manifest is their
    union re-aggregated — count partials SUM, min partials MIN, argmin
    partials ARGMIN-of-mins, all mergeable, so the merge NEVER rescans
    the corpus. The oracle is the merge-equals-rebuild statement itself:
    it builds the same manifest from scratch over snapshot ∪ batch
    (re-crawls — ids divisible by 6 — appear in both legs and must
    combine, n_seen = 2, exercising the overlapping-key path), and the
    hash gate proves partial-merge == full-rebuild bit-for-bit.

    At 100 TB this is how the d13/d14 manifests stay fresh: each
    ingest's per-digest partials (a few dozen bytes per NEW digest)
    merge into the manifest with one digest-keyed shuffle over
    |manifest| + |batch| rows — no text, no corpus scan, and the
    manifest stays a valid input for the next day's d13 anti-join.
    Snapshot simulation follows d13: prior corpus = even doc_ids,
    incoming batch = doc_id % 3 = 0, NULL text excluded on both paths
    per the repo-wide text-op convention."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    d = docs.select(
        "doc_id", "lang", F.sha2(F.col("text"), 256).alias("digest")
    )

    def partials(part: DataFrame) -> DataFrame:
        return part.groupBy("digest").agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.min("doc_id").alias("rep_id"),
            F.min_by("lang", F.col("doc_id")).alias("rep_lang"),
        )

    manifest = partials(d.filter(F.col("doc_id") % 2 == 0))
    batch = partials(d.filter(F.col("doc_id") % 3 == 0))
    return (
        manifest.unionByName(batch)
        .groupBy("digest")
        .agg(
            F.sum("n_seen").alias("n_seen"),
            F.min("rep_id").alias("rep_id"),
            F.min_by("rep_lang", F.col("rep_id")).alias("rep_lang"),
        )
    )


@register(
    "d16_corpus_build_e2e",
    family="L7",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL
        ),
        dedup AS (
            SELECT doc_id, lang, text
            FROM (SELECT b.*, min(doc_id) OVER (PARTITION BY sha256(text))
                             AS rep
                  FROM base b)
            WHERE doc_id = rep
        ),
        quality AS (
            SELECT * FROM dedup
            WHERE len(string_split(text, ' ')) BETWEEN 20 AND 80
              AND length(regexp_replace(text, '[^a-z]', '', 'g')) * 100
                  >= length(text) * 82
        ),
        eval_g AS (
            SELECT DISTINCT g
            FROM (SELECT unnest(list_transform(
                      range(1, len(t) - {DECON_NGRAM} + 2),
                      i -> array_to_string(
                          list_slice(t, i, i + {DECON_NGRAM} - 1), ' '))) AS g
                  FROM (SELECT string_split(text, ' ') AS t FROM base
                        WHERE doc_id % 97 = 0))
        ),
        cand AS (SELECT * FROM quality WHERE doc_id % 97 <> 0),
        contaminated AS (
            SELECT DISTINCT doc_id
            FROM (SELECT doc_id, unnest(list_transform(
                      range(1, len(t) - {DECON_NGRAM} + 2),
                      i -> array_to_string(
                          list_slice(t, i, i + {DECON_NGRAM} - 1), ' '))) AS g
                  FROM (SELECT doc_id, string_split(text, ' ') AS t
                        FROM cand)) cg
            JOIN eval_g USING (g)
        ),
        clean AS (
            SELECT * FROM cand
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ),
        train AS (
            SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM clean
            WHERE CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)
                  % 100 < 80
        ),
        packed AS (
            SELECT lang, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM train
        )
        SELECT lang,
               CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
               count(*)                     AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
        FROM packed
        GROUP BY lang, chunk_id
    """,
)
def d16_corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus build — the d-family stages composed into ONE
    plan, proving the engine runs the whole training-data pipeline a
    reference user would run, not just its pieces: exact dedup (min-id
    rep per sha2-256 digest, digest-partitioned window — the shuffle
    carries digests) → quality gate (integer cross-multiplied
    thresholds: 20–80 tokens, lowercase-alpha mass >= 82% of bytes —
    integer predicates are tie-free across engines where a float ratio
    compare is not) → benchmark decontamination (drop any doc sharing a
    word 4-gram with the held-out eval slice; eval grams collapse to a
    DISTINCT broadcast set per d3, survivors anti-join on doc_id) →
    deterministic content-hash train split (md5 bucket < 80, d1's rule)
    → token-budget sequence packing (d2's running-sum chunking).
    Output: one row per (lang, chunk) with doc/token counts.

    Every stage measurably bites at sf0.1 (8 dup docs, ~2.9k quality
    rejects, 727 contaminated, ~20% split holdout); at sf0.01 the corpus
    happens to be dup-free so stage 1 passes everything through —
    membership, not arithmetic, is SF-dependent. Catalyst pipelines the
    stage filters into a handful of stages, and raw text crosses the
    wire EXACTLY ONCE (the dedup window's digest partition — pinned by
    ``test_corpus_build_shuffles_text_once``): the contaminated-id set
    is deliberately computed from the quality-prefiltered but PRE-dedup
    scan, a superset whose extra ids the anti-join ignores (any doc in
    ``cand`` is flagged by both formulations — the oracle keeps the
    from-cand form and hashes identically), because deriving it from
    ``cand`` would make Catalyst re-derive the whole dedup-window
    subtree and shuffle text a second time. The gram join shuffles only
    4-gram strings against the broadcast eval set (d3's shape), and the
    packing window shuffles (lang, n_tokens, doc_id) — integers, text
    already dropped. The same chain at 100 TB swaps the windows for
    their ledgered scale forms (d7's banded rank, d2's salted
    sub-chunks) without touching the stage logic."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256))
    dd = (
        docs.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("rep"))
        .drop("rep")
    )
    n_tokens = F.size(F.split("text", " "))
    alpha_len = F.length(F.regexp_replace("text", "[^a-z]", ""))
    quality = dd.filter(
        n_tokens.between(20, 80)
        & (alpha_len * 100 >= F.length("text") * 82)
    )
    eval_g = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(_ngrams(F.split("text", " "), DECON_NGRAM)).alias("g"))
        .distinct()
    )
    cand = quality.filter(F.col("doc_id") % 97 != 0)
    # Superset decontam probe: quality-prefiltered but PRE-dedup, so this
    # branch is scan→filter→explode (no window, no text shuffle); extra
    # ids (dup losers) can't survive the anti-join because they are not
    # in cand. Equivalent to probing cand itself — see docstring.
    contaminated = (
        docs.filter(
            n_tokens.between(20, 80)
            & (alpha_len * 100 >= F.length("text") * 82)
            & (F.col("doc_id") % 97 != 0)
        )
        .select(
            "doc_id",
            F.explode(_ngrams(F.split("text", " "), DECON_NGRAM)).alias("g"),
        )
        .join(F.broadcast(eval_g), "g")
        .select("doc_id")
        .distinct()
    )
    clean = cand.join(contaminated, "doc_id", "left_anti")
    train = clean.filter(split_bucket(F.col("text")) < 80).select(
        "lang", "doc_id", n_tokens.alias("n_tokens")
    )
    w2 = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w2), F.lit(0))
    return (
        train.select(
            "lang",
            "n_tokens",
            F.floor(cum_before / PACK_BUDGET).alias("chunk_id"),
        )
        .groupBy("lang", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("chunk_tokens"),
        )
    )


# d17: segment width in tokens. 8 gives the CCNet "paragraph" regime on
# this corpus: ~3.6k segments at sf0.01 of which ~175 are cross-/in-doc
# duplicates, so the dedup branch is exercised (non-vacuous) while most
# documents survive intact.
SEG_W = 8


def _segments(t: Column, n_segs: Column) -> Column:
    """Non-overlapping SEG_W-token segment texts of token array ``t``."""
    return F.transform(
        F.sequence(F.lit(0), n_segs.cast("int") - 1),
        lambda i: F.array_join(F.slice(t, i * SEG_W + 1, SEG_W), " "),
    )


D17_ORACLE = f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE text IS NOT NULL
        ),
        segs AS (
            SELECT doc_id,
                   CAST(s.i - 1 AS BIGINT) AS seg_idx,
                   CAST(ceil(len(t) / {SEG_W}.0) AS BIGINT) AS n_total,
                   array_to_string(
                       list_slice(t, (s.i - 1) * {SEG_W} + 1,
                                  (s.i - 1) * {SEG_W} + {SEG_W}), ' ')
                       AS seg_text
            FROM toks,
                 LATERAL unnest(range(1,
                     CAST(ceil(len(t) / {SEG_W}.0) AS BIGINT) + 1)) AS s(i)
        ),
        keep AS (
            SELECT min(doc_id * 1000000 + seg_idx) AS kk
            FROM segs GROUP BY seg_text
        ),
        kept AS (
            SELECT CAST(kk // 1000000 AS BIGINT) AS doc_id,
                   CAST(kk % 1000000 AS BIGINT) AS seg_idx
            FROM keep
        )
        SELECT s.doc_id,
               array_to_string(list(s.seg_text ORDER BY s.seg_idx), ' ')
                   AS text_dedup,
               CAST(count(*) AS BIGINT) AS n_kept,
               any_value(s.n_total) AS n_total
        FROM segs s JOIN kept k USING (doc_id, seg_idx)
        GROUP BY s.doc_id
"""


@register("d17_segment_dedup", family="L7", oracle=D17_ORACLE)
def d17_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document reassembly (the CCNet /
    RedPajama-v2 pipeline stage): split every document into fixed
    SEG_W-token segments, keep only the globally FIRST occurrence of each
    distinct segment (first = lexicographic min (doc_id, seg_idx)), and
    re-emit each surviving document as its kept segments re-joined in
    original order. Complements l1 (whole-doc dedup) and d9 (substring
    spans): this is the sub-document dedup granularity real crawl
    pipelines run, where boilerplate paragraphs repeat across otherwise
    distinct pages. Documents whose every segment first occurred
    elsewhere drop out entirely (inner join, identical on both engines).

    Scale shape (100 TB): segmentation is the d11 mechanism — pure
    column expressions, explode stays inside WholeStageCodegen, zero
    shuffle. The keeper election groupBy's a sha2 DIGEST of the segment
    and its exchange carries only (digest, packed bigint) — never text.
    Keeper positions re-aggregate to one int-array row per doc (integer
    payload). Raw text crosses the wire AT MOST ONCE: at broadcastable
    keeper-side sizes Catalyst plans the reassembly join as
    BroadcastHashJoin over the scanned docs (ZERO text exchanges — the
    measured sf plan); past the broadcast threshold it degrades to one
    doc_id-keyed SMJ exchange, document-granular, each byte moving once
    (pinned ≤1 by tests/test_plans.py::test_segment_dedup_text_shuffle_
    discipline), and a production deployment that buckets `documents`
    by doc_id makes even that exchange-free.
    Reassembly itself is a projection (re-split + index filter), NOT a
    groupBy of segment rows, so no segment-granular text ever shuffles.
    The (doc_id*1e6+seg_idx) packing is exact for docs under 1e6
    segments (8M tokens); beyond that use a struct min — same plan.

    NULL text is excluded on BOTH engines (WHERE text IS NOT NULL — the
    CLAUDE.md convention; Spark would otherwise segment NULL as ['']).
    All counters are BIGINT; segment text equality is exact string
    equality, so the hash check is engine-deterministic end to end."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    keep = segment_keepers(explode_segments(docs))
    return reassemble_from_keepers(docs, keep)


def explode_segments(docs: DataFrame) -> DataFrame:
    """(doc_id, seg_idx, seg_text) rows — stateless projection+explode,
    shared by batch d17 and the streaming twin d17s."""
    t = F.split("text", " ")
    n_segs = F.ceil(F.size(t) / float(SEG_W))
    return docs.select(
        "doc_id",
        F.posexplode(_segments(t, n_segs)).alias("seg_idx", "seg_text"),
    )


def segment_keepers(segs: DataFrame) -> DataFrame:
    """Global first-occurrence keeper election: one (digest, packed
    min(doc_id·1e6+seg_idx)) row per distinct segment. min() is
    mergeable, so the SAME expression runs as a batch agg (d17) or a
    complete-mode streaming agg (d17s) with chop-invariant results."""
    return segs.groupBy(F.sha2("seg_text", 256).alias("dg")).agg(
        F.min(F.col("doc_id") * 1000000 + F.col("seg_idx")).alias("kk")
    )


def reassemble_from_keepers(docs: DataFrame, keep: DataFrame) -> DataFrame:
    """Rebuild surviving documents from the keeper table: keeper
    positions fold to one int-array row per doc, then a doc_id join +
    projection RE-SPLIT — never a groupBy of segment-text rows."""
    t = F.split("text", " ")
    n_segs = F.ceil(F.size(t) / float(SEG_W))
    kept_per_doc = (
        keep.select(
            F.expr("kk DIV 1000000").alias("doc_id"),
            F.expr("CAST(kk % 1000000 AS INT)").alias("seg_idx"),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("seg_idx")).alias("kept"))
    )
    return docs.join(kept_per_doc, "doc_id").select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("kept"),
                lambda i: F.array_join(F.slice(t, i * SEG_W + 1, SEG_W), " "),
            ),
            " ",
        ).alias("text_dedup"),
        F.size("kept").cast("bigint").alias("n_kept"),
        n_segs.cast("bigint").alias("n_total"),
    )


D18_ORACLE = """
    WITH b AS (
        SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_ref,
               CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_cand
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type,
               CAST(sum(c_ref) AS BIGINT) AS n_ref,
               CAST(sum(c_cand) AS BIGINT) AS n_cand,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM b GROUP BY 1
    ),
    d AS (
        SELECT b.event_type,
               abs((b.c_ref + 1) * (t.n_cand + t.n_buckets)
                   - (b.c_cand + 1) * (t.n_ref + t.n_buckets)) AS num,
               (t.n_ref + t.n_buckets) * (t.n_cand + t.n_buckets) AS den,
               t.n_ref, t.n_cand, t.n_buckets
        FROM b JOIN t USING (event_type)
    )
    SELECT event_type,
           any_value(n_ref) AS n_ref,
           any_value(n_cand) AS n_cand,
           any_value(n_buckets) AS n_buckets,
           CAST((CAST(sum(num) AS HUGEINT) * 1000000)
                // (2 * any_value(den)) AS BIGINT) AS tv_ppm
    FROM d GROUP BY 1
"""


@register("d18_distribution_drift", family="L7", oracle=D18_ORACLE)
def d18_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two corpus splits — the
    data-quality gate a training pipeline runs before admitting a new
    batch ("does the candidate slice's value distribution match the
    reference's?"). Metric: TOTAL-VARIATION distance between the
    Laplace-smoothed per-bucket histograms, TV = ½·Σ|p_b − q_b| with
    p_b = (c_ref+1)/(n_ref+B) — chosen over KL divergence DELIBERATELY:
    KL needs ln(), which is not correctly-rounded-guaranteed across
    libm implementations (f3 pins ln parity only at 6 rounded
    decimals), while TV over smoothed counts is RATIONAL — each bucket's
    |p−q| has the exact integer numerator |(c_ref+1)(n_cand+B) −
    (c_cand+1)(n_ref+B)| over a common denominator, so Σ is one exact
    BIGINT sum and the result ships as truncated PPM via a single
    decimal(38)÷ (HUGEINT ÷ in DuckDB). No float enters at any point.

    Scale shape: one hash agg to (type, bucket) conditional counts (the
    t27s two-phase shape — map-side combine carries two longs/bucket),
    one 5-row totals agg broadcast back, then a map-side-combined final
    sum. Keys grow with value domain × types. The splits here are the
    deterministic event_id parity halves so the oracle is closed-form;
    production swaps in yesterday's manifest vs today's batch."""
    events = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = events.groupBy(
        "event_type", F.floor("value").cast("bigint").alias("bucket")
    ).agg(
        F.sum((F.col("event_id") % 2 == 0).cast("long")).cast("bigint").alias("c_ref"),
        F.sum((F.col("event_id") % 2 == 1).cast("long")).cast("bigint").alias("c_cand"),
    )
    t = b.groupBy("event_type").agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cand").cast("bigint").alias("n_cand"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    d = b.join(F.broadcast(t), "event_type").select(
        "event_type",
        "n_ref",
        "n_cand",
        "n_buckets",
        F.abs(
            (F.col("c_ref") + 1) * (F.col("n_cand") + F.col("n_buckets"))
            - (F.col("c_cand") + 1) * (F.col("n_ref") + F.col("n_buckets"))
        ).alias("num"),
        (
            (F.col("n_ref") + F.col("n_buckets"))
            * (F.col("n_cand") + F.col("n_buckets"))
        ).alias("den"),
    )
    return d.groupBy("event_type").agg(
        F.first("n_ref").alias("n_ref"),
        F.first("n_cand").alias("n_cand"),
        F.first("n_buckets").alias("n_buckets"),
        F.expr(
            "CAST((CAST(sum(num) AS DECIMAL(38,0)) * 1000000)"
            " DIV CAST(2 * first(den) AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("tv_ppm"),
    )


_D19_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_D19_PHONE = r"\d{3}-\d{3}-\d{4}"
_D19_IP = r"(\d{1,3}\.){3}\d{1,3}"

D19_ORACLE = rf"""
    WITH base AS (
        SELECT doc_id, lang,
               text || CASE
                 WHEN doc_id % 7 = 0
                   THEN ' email u' || doc_id || '@ex.com ok'
                 WHEN doc_id % 7 = 1
                   THEN ' phone 415-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' ok'
                 WHEN doc_id % 7 = 2
                   THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                        || CAST((doc_id * 7) % 256 AS VARCHAR) || ' ok'
                 ELSE ''
               END AS t
        FROM documents WHERE text IS NOT NULL
    ),
    scrub AS (
        SELECT lang,
            len(regexp_extract_all(t, '{_D19_EMAIL}')) AS n_email,
            len(regexp_extract_all(t, '{_D19_PHONE}')) AS n_phone,
            len(regexp_extract_all(t, '{_D19_IP}')) AS n_ip,
            regexp_replace(regexp_replace(regexp_replace(t,
                '{_D19_EMAIL}', '<EMAIL>', 'g'),
                '{_D19_PHONE}', '<PHONE>', 'g'),
                '{_D19_IP}', '<IP>', 'g') AS red
        FROM base
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(n_phone) AS BIGINT) AS n_phones,
           CAST(sum(n_ip) AS BIGINT) AS n_ips,
           CAST(sum(len(red)) AS BIGINT) AS redacted_chars,
           CAST(sum(CASE WHEN len(regexp_extract_all(red, '{_D19_EMAIL}'))
                            + len(regexp_extract_all(red, '{_D19_PHONE}'))
                            + len(regexp_extract_all(red, '{_D19_IP}')) = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_after
    FROM scrub GROUP BY 1
"""


@register("d19_pii_scrub", family="L7", oracle=D19_ORACLE)
def d19_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the training-data compliance stage
    the d-pipeline lacked (emails / phone numbers / IPv4 addresses →
    typed placeholders before anything reaches a tokenizer). The
    synthetic corpus carries no PII, so the operator INJECTS a
    deterministic PII layer first (doc_id-derived emails, NANP-style
    phones, dotted-quad IPs on doc_id % 7 branches — the
    ``synthesize_media_mix`` precedent: build the fixture inside the
    query, identically on both engines, so detection, redaction, and
    the post-scrub re-scan are ALL inside the hash). Patterns stay in
    the Java-regex ∩ RE2 common subset (classes, bounded braces, \\d)
    so both engines match identically; DuckDB's regexp_replace needs
    the 'g' flag to match Spark's replace-all default. Verified output:
    per lang, hit counts per PII class, total redacted length (pins the
    replacement bytes without shuffling text — lengths only), and
    n_clean_after == n_docs (the re-scan of the redacted text finds
    zero residual hits — the property a compliance gate actually
    certifies).

    Scale shape: pure per-row string expressions (JVM regex inside
    codegen, no UDF) feeding one hash agg keyed on lang — the same
    embarrassingly-parallel envelope as the l5 quality battery; text
    never enters a shuffle (the aggregate carries counts and lengths)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" email u"), F.col("doc_id").cast("string"), F.lit("@ex.com ok")),
        )
        .when(
            F.col("doc_id") % 7 == 1,
            F.concat(
                F.lit(" phone 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" ok"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 2,
            F.concat(
                F.lit(" ip 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
                F.lit(" ok"),
            ),
        )
        .otherwise(F.lit("")),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _D19_EMAIL, "<EMAIL>"),
            _D19_PHONE,
            "<PHONE>",
        ),
        _D19_IP,
        "<IP>",
    )
    residual = (
        F.regexp_count(red, F.lit(_D19_EMAIL))
        + F.regexp_count(red, F.lit(_D19_PHONE))
        + F.regexp_count(red, F.lit(_D19_IP))
    )
    return (
        docs.select(
            "lang",
            F.regexp_count(t, F.lit(_D19_EMAIL)).alias("n_email"),
            F.regexp_count(t, F.lit(_D19_PHONE)).alias("n_phone"),
            F.regexp_count(t, F.lit(_D19_IP)).alias("n_ip"),
            F.length(red).alias("red_len"),
            (residual == 0).cast("long").alias("clean"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("n_emails"),
            F.sum("n_phone").cast("bigint").alias("n_phones"),
            F.sum("n_ip").cast("bigint").alias("n_ips"),
            F.sum("red_len").cast("bigint").alias("redacted_chars"),
            F.sum("clean").cast("bigint").alias("n_clean_after"),
        )
    )


D20_GROUP_CAP = 25  # max docs admitted per (lang, source) stratum
D20_SAMPLE_K = 200  # global sample size

D20_ORACLE = f"""
    WITH capped AS (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (PARTITION BY lang, source
                                  ORDER BY n_chars DESC, doc_id) AS grp_rank
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id, lang, source, n_chars, CAST(grp_rank AS BIGINT) AS grp_rank
    FROM capped WHERE grp_rank <= {D20_GROUP_CAP}
    ORDER BY n_chars DESC, doc_id LIMIT {D20_SAMPLE_K}
"""


@register("d20_diversified_sample", family="L7", oracle=D20_ORACLE)
def d20_diversified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped quality sampling — the curation step between
    dedup and mixture weighting in a training-data pipeline: take the
    top-{D20_SAMPLE_K} documents by quality (n_chars here as the
    in-corpus quality proxy; any l5 quality score drops in) subject to
    a per-(lang, source) stratum cap of {D20_GROUP_CAP}, so a single
    dominant crawl source cannot monopolize the sample (the MMR-lite
    diversity rule corpus curators apply before mixture sampling).
    Ties break on doc_id in BOTH the stratum rank and the global top-k
    (the LIMIT determinism rule).

    Scale shape: the stratum cap is a rank-filtered window that Spark
    executes as WindowGroupLimit (per-partition top-{D20_GROUP_CAP}
    heaps BEFORE the (lang, source) exchange — only cap·|strata|
    survivors shuffle); the global top-k is TakeOrderedAndProject over
    those survivors (w4/o2's envelope). Only ids + metadata move —
    text never enters any exchange; the caller re-joins text by doc_id
    at write time (d16's rep-id semi-join discipline)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    w = Window.partitionBy("lang", "source").orderBy(F.desc("n_chars"), "doc_id")
    capped = (
        docs.select("doc_id", "lang", "source", "n_chars")
        .withColumn("grp_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("grp_rank") <= D20_GROUP_CAP)
    )
    return capped.orderBy(F.desc("n_chars"), "doc_id").limit(D20_SAMPLE_K)


# d21: URL canonicalization — patterns kept in the Java-regex ∩ RE2
# common subset (the d19 rule) so both engines match identically.
_D21_STRIP_TRACKING = r"\?utm_[A-Za-z_=]*$"
_D21_SCHEME = r"^([A-Za-z]+)://"
_D21_HOST = r"^[A-Za-z]+://([^/?]+)"
_D21_PATH = r"^[A-Za-z]+://[^/?]+(/[^?]*)?"

D21_ORACLE = rf"""
    WITH raw AS (
        SELECT doc_id,
               CASE doc_id % 6
                 WHEN 0 THEN 'http://www.example.com/a/' || (doc_id // 6)::VARCHAR
                 WHEN 1 THEN 'HTTP://WWW.EXAMPLE.COM/a/' || (doc_id // 6)::VARCHAR
                 WHEN 2 THEN 'http://www.example.com:80/a/' || (doc_id // 6)::VARCHAR
                 WHEN 3 THEN 'http://www.example.com/a/' || (doc_id // 6)::VARCHAR || '/'
                 WHEN 4 THEN 'http://www.example.com/a/' || (doc_id // 6)::VARCHAR || '?utm_source=x'
                 ELSE 'https://other.org/b/' || doc_id::VARCHAR
               END AS url
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               lower(regexp_extract(regexp_replace(url, '{_D21_STRIP_TRACKING}', ''), '{_D21_SCHEME}', 1))
               || '://'
               || regexp_replace(lower(regexp_extract(regexp_replace(url, '{_D21_STRIP_TRACKING}', ''), '{_D21_HOST}', 1)), ':80$', '')
               || regexp_replace(regexp_extract(regexp_replace(url, '{_D21_STRIP_TRACKING}', ''), '{_D21_PATH}', 1), '/+$', '')
                   AS canon
        FROM raw
    ),
    groups AS (
        SELECT canon, CAST(count(*) AS BIGINT) AS group_size,
               CAST(min(doc_id) AS BIGINT) AS rep_id
        FROM c GROUP BY 1
    )
    SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(rep_id) AS BIGINT) AS min_rep
    FROM groups GROUP BY 1
"""


@register("d21_url_canonicalize", family="L7", oracle=D21_ORACLE)
def d21_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + collapse accounting — the crawl-frontier
    dedup stage upstream of every text pipeline (the same page arrives
    as case-variant host, explicit default port, trailing slash, and
    utm-tagged variants; fetching all five wastes 5× the crawl budget):
    canonical = lower(scheme) '://' lower(host, :80 stripped)
    path(tracking params and trailing slashes stripped). The corpus
    carries no URLs, so a deterministic 6-variant URL layer is
    synthesized from doc_id inside the query on both engines (the
    d19/synthesize_media_mix precedent) — five variants of each page
    collapse to one canonical URL, the sixth stays unique, and the
    output histograms (group_size → n_groups, min rep id) so the
    synthesis, every canonicalization rule, AND the collapse accounting
    sit inside one hash. Regexes stay in the Java ∩ RE2 subset (d19's
    rule) so both engines match identically.

    Scale shape: canonicalization is pure per-row string expressions
    (JVM regex inside codegen, no UDF); the collapse is one hash agg
    keyed on the canonical URL (keys grow with the corpus, values are
    counts + min ids — raw URL text leaves the scan only as the
    canonical key itself, the l1 digest discipline's URL analog), then
    a second |group-sizes|-row agg. Map-side combine collapses the
    synthetic duplicates before the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    g = F.expr("doc_id div 6").cast("string")
    url = (
        F.when(F.col("doc_id") % 6 == 0, F.concat(F.lit("http://www.example.com/a/"), g))
        .when(F.col("doc_id") % 6 == 1, F.concat(F.lit("HTTP://WWW.EXAMPLE.COM/a/"), g))
        .when(F.col("doc_id") % 6 == 2, F.concat(F.lit("http://www.example.com:80/a/"), g))
        .when(F.col("doc_id") % 6 == 3, F.concat(F.lit("http://www.example.com/a/"), g, F.lit("/")))
        .when(F.col("doc_id") % 6 == 4, F.concat(F.lit("http://www.example.com/a/"), g, F.lit("?utm_source=x")))
        .otherwise(F.concat(F.lit("https://other.org/b/"), F.col("doc_id").cast("string")))
    )
    stripped = F.regexp_replace(url, _D21_STRIP_TRACKING, "")
    canon = F.concat(
        F.lower(F.regexp_extract(stripped, _D21_SCHEME, 1)),
        F.lit("://"),
        F.regexp_replace(
            F.lower(F.regexp_extract(stripped, _D21_HOST, 1)), ":80$", ""
        ),
        F.regexp_replace(F.regexp_extract(stripped, _D21_PATH, 1), "/+$", ""),
    )
    groups = docs.select("doc_id", canon.alias("canon")).groupBy("canon").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
        F.min("doc_id").cast("bigint").alias("rep_id"),
    )
    return groups.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("rep_id").cast("bigint").alias("min_rep"),
    )


D22_ORACLE = """
    WITH toks AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL
    )
    SELECT lang,
           CAST(length(bin(n_tokens)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM toks GROUP BY 1, 2
"""


@register("d22_length_histogram", family="L7", oracle=D22_ORACLE)
def d22_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram in power-of-2 buckets, per language — the
    dataset-card panel every corpus release publishes (sequence-length
    distribution drives packing efficiency, truncation losses, and
    curriculum buckets; d2's packer and d18's drift gate both consume
    this shape). Bucket = bit length of the whitespace token count via
    ``length(bin(n))`` — the t30 string-length trick, exact on both
    engines where a float floor(log2) can split on power-of-2
    boundaries. NULL text excluded identically (the l5 convention).

    Scale shape: one pass of per-row codegen expressions (split + size
    — no shingling, no UDF) into one hash agg keyed (lang, bucket) —
    ≤ |langs|·64 groups, map-side combinable; text never leaves the
    scan (the aggregate carries counts and token sums only)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    return (
        docs.select(
            "lang",
            n_tokens.alias("n_tokens"),
            F.length(F.bin(n_tokens)).cast("bigint").alias("log2_bucket"),
        )
        .groupBy("lang", "log2_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


D23_SAMPLE_K = 100  # weighted sample size

D23_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, lang, source,
               greatest(n_chars, 1) AS w,
               CAST(('0x' || substring(md5('d23:' || CAST(doc_id AS VARCHAR)),
                                       1, 10)) AS BIGINT) AS u40
        FROM documents WHERE text IS NOT NULL
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
           CAST(w AS BIGINT) AS w, u40,
           CAST(floor(CAST(u40 AS DOUBLE) / w * 1e3) AS BIGINT) AS pri_milli
    FROM d
    ORDER BY CAST(u40 AS DOUBLE) / w, doc_id
    LIMIT {D23_SAMPLE_K}
"""


@register("d23_weighted_sample", family="L7", oracle=D23_ORACLE)
def d23_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement — the mixture-construction
    primitive that admits each document with probability proportional to
    its weight (here n_chars; any l5 quality score drops in): the
    Efraimidis–Spirakis priority trick (Inf. Proc. Letters 2006, the
    one-pass weighted-reservoir scheme) selects the {D23_SAMPLE_K}
    smallest values of key = u/w where u is a per-doc uniform draw.
    d5 stratifies, d7 shuffles uniformly, d20 caps strata — this adds
    the WEIGHTED regime, and it runs as a single distributed top-k
    (each executor keeps a {D23_SAMPLE_K}-element heap; only k rows per
    partition reach the driver-side merge — the o2/l4n envelope).

    Hash-match strategy: u is the first 40 md5 bits of 'd23:'||doc_id —
    deterministic, no RNG (the l2h/j8/l4n md5 discipline), parsed to
    BIGINT by the identical '0x'-prefix cast on both engines; the
    priority u/w is ONE IEEE division of two exact integers (identical
    on both engines — no transcendental, unlike the classic u^(1/w)
    form, which this ordering is a monotone equivalent of for ranking
    purposes); ties break on doc_id (LIMIT determinism rule); the
    reported key floor-truncates at 1e-3 (f8 rule). w clamps to ≥ 1 on
    both sides so empty docs cannot divide by zero; NULL-text docs are
    excluded identically (the corpus NULL rule).

    Scale shape: pure per-row codegen expressions (md5 + substring +
    conv — no UDF, no shuffle) followed by TakeOrderedAndProject; text
    never leaves the scan (ids + metadata only); at 100 TB this is a
    map-only pass over the corpus with k·partitions rows moving."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    u40 = F.conv(
        F.substring(F.md5(F.concat(F.lit("d23:"), F.col("doc_id").cast("string"))), 1, 10),
        16,
        10,
    ).cast("long")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    d = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        "source",
        w.alias("w"),
        u40.alias("u40"),
    ).withColumn("pri", F.col("u40").cast("double") / F.col("w"))
    return (
        d.orderBy("pri", "doc_id")
        .limit(D23_SAMPLE_K)
        .select(
            "doc_id",
            "lang",
            "source",
            "w",
            "u40",
            F.floor(F.col("pri") * 1e3).cast("bigint").alias("pri_milli"),
        )
    )
