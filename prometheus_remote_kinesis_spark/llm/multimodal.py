"""L-family: multimodal columns (SURVEY.md §2.9 L6).

Media (image/audio/video) are opaque ``binary`` columns plus a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` over partitions of blobs. The decode itself is STUBBED
behind ``decode_stub`` (media libraries are not available in this
environment — clearly marked); the Spark-side plumbing — schema, batch
iteration, partition behavior, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from prometheus_remote_kinesis_spark.registry import register
from prometheus_remote_kinesis_spark.sources.tables import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),  # opaque blob column
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.DoubleType()),
    ]
)


def decode_stub(blob: bytes, mime: str) -> float:
    """STUB for the media decode / feature-extract step.

    A real deployment would dispatch on ``mime`` to an image/audio decoder
    (PIL / torchaudio / ffmpeg — not installed in this container) and emit
    an embedding. This deterministic stand-in (mean byte value) keeps the
    pipeline end-to-end testable with the exact production plumbing.
    """
    if mime not in ("application/octet-stream", "text/plain"):
        raise NotImplementedError(f"no decoder for {mime}: media libs are stubbed out")
    if not blob:
        return 0.0
    return sum(blob) / len(blob)


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas``: each executor pulls arrow batches of (doc_id, media,
    meta), decodes per row, emits a typed feature row — the shape a real
    image/audio featurizer uses (batch-amortized model invocation)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [
                        decode_stub(blob, m["mime"])
                        for blob, m in zip(pdf["media"], pdf["meta"])
                    ],
                }
            )

    return media_df.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Lift the documents table into the multimodal shape: text bytes as
    the opaque blob + typed metadata (the container has no real media, so
    text/plain blobs stand in — plumbing identical)."""
    blob = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("media"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(blob).alias("n_bytes"),
        ).alias("meta"),
    )


@register(
    "l6_multimodal_rows",
    family="L6",
    oracle="""
        SELECT d.doc_id, d.lang, d.source, e.label,
               CAST(len(e.embedding) AS INTEGER) AS dim,
               round(sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[])), 4) AS emb_norm,
               d.n_chars
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def l6_multimodal_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: text metadata + vector modality joined
    into one typed row (documents ⋈ embeddings on id)."""
    from prometheus_remote_kinesis_spark.llm.similarity import dot

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(dot(e, e)), 4).alias("emb_norm"),
        "n_chars",
    )


@register("l6b_media_features", family="L6", oracle=None)
def l6b_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on the stub decoder: documents →
    binary media rows → mapInPandas feature extraction. Deterministic
    (mean byte value of the utf-8 blob) — rows-only driver check; exact
    values unit-tested in tests/test_llm.py."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(documents_as_media(docs))
