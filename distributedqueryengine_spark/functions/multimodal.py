"""Multimodal columns: opaque binary payloads + typed metadata.

North-star capability. Images/audio/video are carried as BinaryType
columns with a metadata struct; decode/feature-extraction runs as
Arrow-batched pandas iterators (`mapInPandas`) so payload bytes never
round-trip row-at-a-time through Python.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
`decode_batch` is a clearly-marked stub: with `fake=True` it produces
a deterministic feature vector from the payload bytes (so the full
Spark plumbing — schema, batching, partitioning — is real and tested);
with `fake=False` it raises NotImplementedError where the codec call
would go.

Scale notes: payloads stay in executor memory one Arrow batch at a
time; `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch
size, and partition counts bound peak memory. Nothing ever collects
to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.IntegerType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, mime: str = "application/fake") -> DataFrame:
    """Build a media table from a text fixture: payload = utf-8 bytes.

    Stand-in for reading real blobs (at scale: parquet binary columns
    or `spark.read.format("binaryFile")`); keeps every downstream
    stage byte-identical to a real pipeline.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
            F.lit("fixture").alias("source"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor (sha256-seeded)."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(dim)]


def decode_batch(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract payloads via mapInPandas (Arrow batches).

    STUB: real image/audio decode would go where `_fake_features` is
    called (e.g. PIL.Image.open(io.BytesIO(p))); those libs are absent
    here, so fake=False raises NotImplementedError by design.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media codecs unavailable in this environment; "
                    "plug PIL/librosa/ffmpeg here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "digest": payloads.map(lambda p: hashlib.sha256(bytes(p)).hexdigest()),
                    "features": payloads.map(lambda p: _fake_features(bytes(p))),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
