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

import pandas as pd

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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

FRAME_BYTES = 16  # deterministic fake "frame" size (no ffmpeg in container)


def resize_stub(media_df: DataFrame, n_bytes: int) -> DataFrame:
    """STUB of the image-resize stage: an Arrow-batched pandas UDF that
    maps blob → fixed-size blob (truncate / zero-pad stands in for a real
    PIL resample, which is not installed here). Signature, batching, and
    binary-in/binary-out plumbing match the production shape."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def resize(blobs: pd.Series) -> pd.Series:
        return blobs.map(
            lambda b: (b or b"")[:n_bytes].ljust(n_bytes, b"\0")
        )

    return media_df.withColumn("media", resize("media")).withColumn(
        "meta",
        F.struct(F.col("meta.mime").alias("mime"), F.lit(n_bytes).alias("n_bytes")),
    )


def frame_sample(media_df: DataFrame, every_n: int) -> DataFrame:
    """STUB of video frame sampling: 1 blob row → many frame rows via
    ``mapInPandas`` (the one-to-many generator shape a real decoder
    needs). Frames are fixed FRAME_BYTES slices of the blob — a
    deterministic stand-in for ffmpeg keyframe extraction — and every
    ``every_n``-th frame is kept. At scale this runs per arrow batch with
    no shuffle; downstream feature extraction groups by doc_id."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = blob or b""
                n_frames = (len(blob) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(blob[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, FRAME_SCHEMA)


@register(
    "l6c_frame_stats",
    family="L6",
    oracle="""
        SELECT doc_id,
               CAST((length(text) + 15) // 16 AS BIGINT)      AS n_frames,
               CAST(((length(text) + 15) // 16 + 3) // 4 AS BIGINT) AS n_sampled
        FROM documents
    """,
)
def l6c_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline with a value-checkable surface: documents →
    media blobs → every-4th-frame sample → per-doc frame counts. The
    oracle recomputes the counts arithmetically from text length (ASCII
    corpus: 1 char = 1 byte), so the mapInPandas generator's fan-out is
    hash-verified, not just row-counted."""
    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample(documents_as_media(docs), every_n=4)
    return (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .join(
            docs.select(
                "doc_id",
                F.expr("CAST((length(text) + 15) DIV 16 AS BIGINT)").alias("n_frames"),
            ),
            "doc_id",
        )
        .select("doc_id", "n_frames", "n_sampled")
    )
