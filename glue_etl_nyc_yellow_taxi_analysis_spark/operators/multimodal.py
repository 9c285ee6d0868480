"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a ``binary``
column (or a pointer to object storage) next to typed metadata; run decode /
feature-extraction as Arrow-batched ``mapInPandas`` so each Python worker
processes whole record batches, never single rows.

The decode step itself is STUBBED here (no image/audio libs in this
container): ``fake_decode=True`` derives small deterministic feature vectors
from the payload bytes so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable; ``fake_decode=False`` raises
``NotImplementedError`` where a real libjpeg/ffmpeg call would go.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: pack a text table into the media shape (payload = utf-8
    bytes) so the binary pipeline is exercisable on the driver testdata.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode + featurize binary payloads via Arrow-batched mapInPandas.

    Output schema: (media_id long, n_bytes long, features array<double>).
    The fake decoder hashes fixed-stride byte slices into FEATURE_DIM
    deterministic doubles — same batch shape and schema a real decoder
    (PIL/librosa/ffmpeg) would produce.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; wire PIL/librosa here"
                )
            ids, sizes, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                ids.append(mid)
                sizes.append(len(data))
                # deterministic fake features: mean byte value per stride
                f = []
                for d in range(FEATURE_DIM):
                    sl = data[d::FEATURE_DIM]
                    f.append(round(sum(sl) / len(sl), 6) if sl else 0.0)
                feats.append(f)
            yield pd.DataFrame({"media_id": ids, "n_bytes": sizes, "features": feats})

    return df.select("media_id", "payload").mapInPandas(featurize, out_schema)
