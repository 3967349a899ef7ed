"""L-family: text analysis (SURVEY.md §2.9 L5) — token stats, term
frequencies, quality scoring, document fingerprinting, language-ID.

Everything except language-ID ships with a DuckDB oracle; all hot-path
expressions are built-in functions (split/explode/higher-order fns), so at
100 TB they run inside WholeStageCodegen with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# Marker-token profiles for the n-gram/stopword language-ID heuristic.
# Real-world profiles would be learned; these cover common fn-words so the
# operator is exercised end-to-end (unit-tested on synthetic fixtures).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to"),
    "es": ("el", "la", "los", "las", "es", "y"),
    "fr": ("le", "la", "les", "est", "et", "une"),
    "de": ("der", "die", "das", "ist", "und", "ein"),
    "zh": ("的", "是", "了", "在"),
}


def token_count(text: Column) -> Column:
    return F.size(F.split(text, " "))


def quality_components(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: alphabetic ratio, stopword ratio,
    mean token length — the length/punct/stopword heuristics of standard
    pretraining-data quality filters."""
    toks = F.split(text, " ")
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(text, "[^a-z]", "")) / F.length(text)
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ) / n_tokens
    mean_len = (F.length(text) - (n_tokens - F.lit(1))) / n_tokens
    return {"n_tokens": n_tokens, "alpha_ratio": alpha, "stop_ratio": stop, "mean_token_len": mean_len}


def language_id(text: Column) -> Column:
    """Marker-token language scorer: argmax over per-language marker hit
    counts, 'und' when nothing matches. Pure column expression (greatest
    + chained when) — no UDF."""
    toks = F.split(text, " ")
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # Iterate deterministically; first language (in LANG_MARKERS order)
    # wins ties, matching the unit-test contract.
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


L5_ORACLE = """
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(avg(len(string_split(text, ' '))), 4)       AS avg_tokens,
           CAST(sum(n_chars) AS BIGINT)                      AS total_chars
    FROM documents
    GROUP BY lang
"""


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus statistics — shared by batch l5 and the l5s
    streaming twin (avg accumulates an EXACT integer sum before the one
    divide, so micro-batch merge order cannot perturb the double)."""
    n = token_count(F.col("text"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n.cast("long")).alias("total_tokens"),
        F.round(F.avg(n), 4).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register("l5_token_stats", family="L5", oracle=L5_ORACLE)
def l5_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (token counting + language
    breakdown)."""
    return token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "l5b_top_terms",
    family="L5",
    bench=True,
    oracle="""
        SELECT token, count(*) AS tf,
               count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY tf DESC, token
        LIMIT 20
    """,
)
def l5b_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequencies, top-20 — the TF-IDF building
    block. explode → partial-agg groupBy: the shuffle carries (token,
    partial-count), not token instances."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("tf"), "token")
        .limit(20)
    )


@register(
    "l5c_quality_scores",
    family="L5",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               round(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
                     / length(text), 6) AS alpha_ratio,
               round(len(list_filter(string_split(text, ' '),
                                     t -> t IN {STOPWORDS!r})) * 1.0
                     / len(string_split(text, ' ')), 6) AS stop_ratio,
               round((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                     / len(string_split(text, ' ')), 4) AS mean_token_len
        FROM documents
    """,
)
def l5c_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals for pretraining-data filtering."""
    docs = load_table(spark, sf_dir, "documents")
    c = quality_components(F.col("text"))
    return docs.select(
        "doc_id",
        c["n_tokens"].alias("n_tokens"),
        F.round(c["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(c["stop_ratio"], 6).alias("stop_ratio"),
        F.round(c["mean_token_len"], 4).alias("mean_token_len"),
    )


@register(
    "l5d_fingerprints",
    family="L5",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                                      t -> CAST(length(t) + 1 AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
        FROM documents WHERE text IS NOT NULL
    """,
)
def l5d_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint: a polynomial hash
    over the token-length sequence, mod 1e9+7 — cheap shift-resistant
    content identity (same idea as Rabin fingerprints). Pure higher-order
    fold, identical arithmetic on both engines. NULL-text docs excluded
    on both engines (text-family NULL convention, r5)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.length(t).cast("long") + 1) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# Oracle generated from the SAME LANG_MARKERS table the Spark expression
# uses: per-language marker-hit counts, argmax with first-language-wins
# ties (the CASE tests languages in declaration order, mirroring the
# reversed-iteration overwrite in language_id), 'und' when nothing hits.
# All-integer scoring → engine-identical by construction; upgraded from
# rows-only in round 5.
_L5E_SCORES = ",\n               ".join(
    f"len(list_filter(toks, x -> x IN ("
    + ", ".join("'" + m.replace("'", "''") + "'" for m in markers)
    + f"))) AS s_{lang}"
    for lang, markers in LANG_MARKERS.items()
)
_L5E_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
_L5E_PICK = "\n                    ".join(
    f"WHEN s_{lang} = {_L5E_BEST} THEN '{lang}'" for lang in LANG_MARKERS
)
L5E_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id, lang,
               {_L5E_SCORES}
        FROM t
    )
    SELECT doc_id, lang,
           CASE WHEN {_L5E_BEST} = 0 THEN 'und'
                    {_L5E_PICK}
                ELSE 'und' END AS predicted_lang
    FROM s
"""


@register("l5e_language_id", family="L5", oracle=L5E_ORACLE)
def l5e_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID over documents (marker-token argmax),
    oracle-checked: the DuckDB oracle recomputes the marker-hit argmax
    from the same LANG_MARKERS table with the same first-language tie
    order (integer scores — no float hazard). Behavioral multilingual
    fixtures remain in tests/test_llm.py."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        language_id(F.col("text")).alias("predicted_lang"),
    )


@register(
    "l5f_tfidf",
    family="L5",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df
            FROM toks GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term,
               round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
        FROM (
            SELECT tf.doc_id, tf.term,
                   tf.tf * ln(n.n_docs * 1.0 / df.df) AS raw,
                   tf.tf, df.df, n.n_docs,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln(n.n_docs * 1.0 / df.df) DESC, tf.term
                   ) AS rn
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        WHERE rn <= 5
    """,
)
def l5f_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-5 terms per document, tf·ln(N/df) weighting.

    Scale shape: one explode + two hash aggregations; the document-
    frequency side collapses to |vocab| rows and broadcasts back onto the
    term-frequency side, so the corpus text shuffles once (as (doc, term,
    tf) triples, never raw text); N is a scalar literal folded into the
    expression. The per-doc top-5 uses WindowGroupLimit (rank pushdown)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    # r13: exact footer row count replaces a count() job at build
    # (sources.tables.table_num_rows; unfiltered count only).
    from prometheus_remote_kinesis_spark.sources.tables import table_num_rows

    n_docs = table_num_rows(sf_dir, "documents")
    if n_docs is None:
        n_docs = docs.count()
    raw = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc(raw), "term")
    return (
        tf.join(F.broadcast(dfreq), "term")
        .select("doc_id", "term", raw.alias("raw"), F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", F.round("raw", 6).alias("tfidf"))
    )


@register(
    "l5g_repetition_signals",
    family="L5",
    oracle="""
        WITH tf AS (
            SELECT doc_id, token, count(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY doc_id, token
        )
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT)            AS n_tokens,
               round(1.0 - count(*) * 1.0 / sum(tf), 6) AS dup_token_ratio,
               round(max(tf) * 1.0 / sum(tf), 6)  AS top_token_fraction
        FROM tf
        GROUP BY doc_id
    """,
)
def l5g_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText filter
    family): duplicate-token ratio and most-frequent-token fraction per
    document — high values flag keyword-stuffed or looping text.

    Two hash aggregations, both with map-side partial reduction; the
    shuffle carries (doc_id, token, partial-tf) triples, and the second
    agg's key (doc_id) is the parquet row order, so AQE coalesces it
    tightly. No window, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(1.0 - F.count(F.lit(1)) / F.sum("tf"), 6).alias("dup_token_ratio"),
        F.round(F.max("tf") / F.sum("tf"), 6).alias("top_token_fraction"),
    )


@register(
    "l5h_bigram_lm_score",
    family="L5",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        bi AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || chr(31) || t[i+1])) AS bg
            FROM toks WHERE len(t) >= 2
        ),
        bc AS (SELECT bg, count(*) AS cb FROM bi GROUP BY bg),
        uc AS (SELECT w1, count(*) AS cu FROM bi GROUP BY w1)
        SELECT doc_id,
               count(*) AS n_bigrams,
               round(avg(ln(cb * 1.0 / cu)), 6) AS avg_logprob
        FROM bi JOIN bc USING (bg) JOIN uc USING (w1)
        GROUP BY doc_id
    """,
)
def l5h_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality score: a bigram LM trained ON the corpus scores
    each document by mean log conditional probability
    avg(ln(c(w1,w2) / c(w1·))) — fluent text reuses common transitions and
    scores high; garbled or boilerplate-stuffed text scores low. This is
    the cheap stand-in for the perplexity filters (CCNet-style) used to
    gate pretraining data.

    Train and score are the same two hash aggregations (bigram counts,
    first-token counts) plus two shuffle joins keyed on the bigram/token
    string — the LM "model" never materializes on the driver. At 100 TB
    the refinement is pruning the LM to the top-V bigrams and
    broadcasting it; the exact form here keeps full joins so the oracle
    can replicate it. Tokens are materialized in their own projection
    before the bigram lambda (no CSE inside lambda bodies)."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    pair = F.transform(
        F.sequence(F.lit(0), F.size("t") - 2),
        lambda i: F.struct(
            F.element_at(F.col("t"), (i + 1).cast("int")).alias("w1"),
            F.concat_ws(
                "\x1f",
                F.element_at(F.col("t"), (i + 1).cast("int")),
                F.element_at(F.col("t"), (i + 2).cast("int")),
            ).alias("bg"),
        ),
    )
    bi = toked.select("doc_id", F.explode(pair).alias("p")).select(
        "doc_id", "p.w1", "p.bg"
    )
    bc = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    uc = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    return (
        bi.join(bc, "bg")
        .join(uc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("cb") / F.col("cu"))), 6).alias("avg_logprob"),
        )
    )


L5I_ORACLE = f"""
    WITH m AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS wc,
               (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                   / len(string_split(text, ' ')) AS mwl,
               len(list_filter(string_split(text, ' '),
                               t -> t IN {STOPWORDS!r})) AS stop_hits,
               CAST(list_max(list_transform(string_split(text, ' '),
                                            t -> length(t))) AS INTEGER)
                   AS max_word_len
        FROM documents
    )
    SELECT doc_id,
           CAST(wc AS INTEGER)                AS wc,
           round(mwl, 4)                      AS mean_word_len,
           stop_hits,
           max_word_len,
           (wc >= 50 AND wc <= 100000)        AS gopher_wc_pass,
           (mwl >= 3 AND mwl <= 10)           AS gopher_mwl_pass,
           (stop_hits >= 2)                   AS gopher_stop_pass,
           (wc >= 50 AND wc <= 100000 AND mwl >= 3 AND mwl <= 10
            AND stop_hits >= 2)               AS keep
    FROM m
"""


@register("l5i_gopher_filter_battery", family="L5", oracle=L5I_ORACLE)
def l5i_gopher_filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic filter battery as one zero-shuffle
    projection: word count, mean word length, stopword hits, and max word
    length feed per-rule pass flags plus the conjunctive keep decision
    (Rae et al. Gopher §A1.1 rule shapes: 50 ≤ wc, 3 ≤ mean-word-len ≤ 10,
    ≥ 2 stopword hits). Unlike l5c (which reports quality scores), this is
    the decision operator a 100 TB curation pass runs as its first stage —
    every expression is codegen-resident string/array arithmetic, so the
    filter runs at scan speed with no Python in the path, and the kept/cut
    corpus split falls out of one boolean column."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    wc = F.size(words)
    mwl = (F.length("text") - (wc - F.lit(1))) * F.lit(1.0) / wc
    stop_hits = F.size(F.filter(words, lambda t: t.isin(*STOPWORDS)))
    gwc = (wc >= 50) & (wc <= 100000)
    gmwl = (mwl >= 3) & (mwl <= 10)
    gstop = stop_hits >= 2
    return docs.select(
        "doc_id",
        wc.alias("wc"),
        F.round(mwl, 4).alias("mean_word_len"),
        stop_hits.cast("long").alias("stop_hits"),
        F.array_max(F.transform(words, F.length)).alias("max_word_len"),
        gwc.alias("gopher_wc_pass"),
        gmwl.alias("gopher_mwl_pass"),
        gstop.alias("gopher_stop_pass"),
        (gwc & gmwl & gstop).alias("keep"),
    )


# BM25 retrieval (Robertson/Spärck Jones; k1=1.2, b=0.75). Query terms are
# a FIXED literal set so the operator is deterministic and oracle-checkable;
# per-term partial scores become pivoted COLUMNS summed in one fixed textual
# order, so the float addition order is engine-identical by construction
# (never a SUM over term rows, whose accumulation order Spark picks at
# runtime). The final score is floor-truncated, not round()ed: it is an
# arbitrary double quotient, the half-tie class of CLAUDE.md's f8 rule.
BM25_QUERY_TERMS = ("spark", "query", "stream")
_BM25_COMP = """
        idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
"""
L5J_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL
    ),
    corpus AS (
        SELECT count(*) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        FROM d
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        WHERE term IN ('spark', 'query', 'stream')
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    comp AS (
        SELECT tf.doc_id, tf.term, tf.dl,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (tf.dl / avgdl))))
                   AS c
        FROM tf JOIN df USING (term) CROSS JOIN corpus
    ),
    scored AS (
        SELECT doc_id, max(dl) AS dl,
               coalesce(max(CASE WHEN term = 'spark'  THEN c END), 0.0)
             + coalesce(max(CASE WHEN term = 'query'  THEN c END), 0.0)
             + coalesce(max(CASE WHEN term = 'stream' THEN c END), 0.0) AS raw
        FROM comp GROUP BY doc_id
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS dl,
           floor(raw * 1e6) / 1e6 AS bm25,
           CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT doc_id, dl, raw,
               row_number() OVER (ORDER BY raw DESC, doc_id) AS rn
        FROM scored
    )
    WHERE rn <= 20
"""


@register("l5j_bm25", family="L5", oracle=L5J_ORACLE)
def l5j_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 retrieval for a fixed 3-term query (k1=1.2, b=0.75) —
    the ranking function behind the retrieval stages of pretraining-data
    curation (targeted quality sampling, contamination lookup, topical
    subcorpus pulls). No reference counterpart (the Go relay has no text
    ops); the family anchor is SURVEY §2.9's text-analysis row.

    Plan shape at 100 TB: the term explode is filtered to the |Q|=3 query
    terms BEFORE the (doc, term) hash agg, so the shuffle carries only
    query-term hits, never the corpus vocabulary; document length rides
    along as max(dl) (constant per doc) instead of a second join against
    the fact table; df (3 rows) and the corpus-stats scalar (n_docs,
    avgdl as exact-int-sum / count — one double division, engine-exact)
    are broadcast. Per-term scores pivot to columns and sum in a fixed
    textual order; ranking orders on the raw double (bit-identical on
    both engines because every operand order is identical) with doc_id as
    the unique tie-break, and only the REPORTED score is truncated. The
    top-20 head comes from TakeOrderedAndProject (d12's shape — per-
    partition heaps, no global sort); the only window runs over those
    20 rows."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    d = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", F.size("toks").alias("dl"), "toks"
    )
    corpus = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    comp = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            "dl",
            (
                idf
                * (
                    (F.col("tf") * 2.2)
                    / (
                        F.col("tf")
                        + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl")))
                    )
                )
            ).alias("c"),
        )
    )
    pick = lambda t: F.coalesce(
        F.max(F.when(F.col("term") == t, F.col("c"))), F.lit(0.0)
    )
    scored = comp.groupBy("doc_id").agg(
        F.max("dl").alias("dl"),
        (pick("spark") + pick("query") + pick("stream")).alias("raw"),
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("raw"), "doc_id").limit(20)
    w = Window.orderBy(F.desc("raw"), "doc_id")
    return (
        top.select(
            "doc_id", "dl", "raw", F.row_number().over(w).alias("rank")
        )
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            (F.floor(F.col("raw") * 1e6) / 1e6).alias("bm25"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
