"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas). The heavy codecs (PIL/ffmpeg/torchaudio) are
not available in this container, so the decode step is a clearly-marked
deterministic fake — but the Spark-side plumbing (binary schema, Arrow
batch transfer, UDF signature, partition-parallel execution) is real
and oracle-checked: the fake "decoder" computes arithmetic on byte
lengths that the DuckDB oracle reproduces in SQL, proving the Python
batch path returns exactly what the JVM path would.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparrow_spark.registry import query
from sparrow_spark.sources import load_table

HAVE_PIL = False
try:  # pragma: no cover - not installed in this environment
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("media_kind", StringType()),
    ]
)


def real_decode(blob: bytes) -> tuple[int, int]:  # pragma: no cover
    """Real image decode — requires PIL, absent in this container."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; install pillow on the cluster image"
        )
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(blob)) as im:
        return im.width, im.height


def fake_decode_dims(n_bytes: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Deterministic stand-in for decode: dims derived from byte length.
    (Oracle SQL mirrors this arithmetic exactly.)"""
    return (n_bytes % 640 + 1), ((n_bytes * 7) % 480 + 1)


def decode_media_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one metadata batch out.
    At scale each task decodes its partition's blobs independently —
    no shuffle, no driver involvement."""
    for pdf in batches:
        n_bytes = pdf["blob"].map(len).astype("int64")
        if HAVE_PIL:  # pragma: no cover
            dims = pdf["blob"].map(real_decode)
            width = dims.map(lambda d: d[0]).astype("int64")
            height = dims.map(lambda d: d[1]).astype("int64")
        else:
            width, height = fake_decode_dims(n_bytes)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": width,
                "height": height,
                "media_kind": "image",
            }
        )


def with_binary_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat the document text bytes as the opaque blob
    (real pipelines read the blob from parquet/object storage directly)."""
    return df.withColumn("blob", F.col(text_col).cast(BinaryType()))


@query(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height,
           'image' AS media_kind,
           md5(text) AS content_hash
    FROM documents
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_column(load_table(spark, sf_dir, "documents"))
    decoded = docs.select("doc_id", "blob").mapInPandas(
        decode_media_batches, schema=DECODED_SCHEMA
    )
    # Join metadata back to a JVM-side content hash: proves the Arrow
    # round-trip pairs rows correctly.
    hashes = docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
    return decoded.join(hashes, on="doc_id").select(
        "doc_id", "n_bytes", "width", "height", "media_kind", "content_hash"
    )
