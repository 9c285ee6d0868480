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


def resize_images(
    df: DataFrame, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """Resize plumbing: (media_id, payload, width, height) → resized payload
    + updated metadata, Arrow-batched.

    The fake path re-emits a deterministic payload slice sized proportional
    to the target area and stamps the new dimensions — the schema, batch
    shape, and metadata contract a real PIL/libvips resize would have.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError("wire PIL/libvips here")
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                keep = max(1, min(len(data), width * height // 64))
                out.append((mid, data[:keep], width, height))
            yield pd.DataFrame(out, columns=["media_id", "payload", "width", "height"])

    return df.select("media_id", "payload").mapInPandas(resize, out_schema)


def sample_frames(
    df: DataFrame, every_nth: int = 8, max_frames: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Frame-sampling plumbing: one input video row → N output frame rows
    (media_id, frame_idx, frame_payload).

    Output is a one-to-many mapInPandas (the real ffmpeg pattern: iterate
    the container once, emit selected frames).  The fake path slices the
    payload into deterministic chunks — row-explosion shape and schema are
    real.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError("wire ffmpeg/PyAV here")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                chunk = max(1, every_nth)
                frames = [data[i : i + chunk] for i in range(0, len(data), chunk)]
                for idx, fr in enumerate(frames[::every_nth][:max_frames]):
                    rows.append((mid, idx, fr))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_payload"])

    return df.select("media_id", "payload").mapInPandas(sample, out_schema)


def frame_sample(
    df: DataFrame, frame_size: int = 32, every: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: slice each payload into fixed-size frames
    and keep every ``every``-th one — the video/audio sampling pattern
    (ffmpeg keyframe extraction) with a deterministic byte-slicer standing
    in for the codec.  Arrow-batched ``mapInPandas``; fan-out is
    rows → frames, so the output carries (media_id, frame_idx) for
    downstream per-frame featurization.

    Because the slicer is bytes-exact, the WHOLE Python path is
    oracle-checkable: frame boundaries and md5s must match a SQL replay
    (q_multimodal_framesample) — the plumbing is verified, not just
    row-counted; a real decoder drops in behind the same contract.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_len", T.IntegerType(), False),
            T.StructField("frame_md5", T.StringType(), False),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            ids, idxs, lens, digests = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n_frames = math.ceil(len(data) / frame_size)
                for i in range(0, n_frames, every):
                    frame = data[i * frame_size : (i + 1) * frame_size]
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(frame))
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_len": pd.array(lens, dtype="int32"),
                    "frame_md5": digests,
                }
            )

    return df.select("media_id", "payload").mapInPandas(sample, out_schema)
