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

    Output schema: (media_id long, n_bytes long, features array<double>,
    feat_ppm array<bigint>).  The fake decoder hashes fixed-stride byte
    slices into FEATURE_DIM deterministic doubles — same batch shape and
    schema a real decoder (PIL/librosa/ffmpeg) would produce.

    ``feat_ppm`` is the exact-integer twin of ``features``: per stride,
    ``floor(sum/count * 1e6 + 0.5)`` evaluated in EXACTLY this IEEE op
    order — the SQL oracle replays the same integer byte sums and the
    same double ops, so the whole Python lane (Arrow batching, stride
    slicing, the division) is value-hash verifiable with no
    double→string rendering ambiguity anywhere.
    """
    import math

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
            T.StructField("feat_ppm", T.ArrayType(T.LongType()), True),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; wire PIL/librosa here"
                )
            ids, sizes, feats, ppms = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                ids.append(mid)
                sizes.append(len(data))
                # deterministic fake features: mean byte value per stride
                f, pp = [], []
                for d in range(FEATURE_DIM):
                    sl = data[d::FEATURE_DIM]
                    if sl:
                        f.append(round(sum(sl) / len(sl), 6))
                        # op order matters: (sum/count)*1e6 + 0.5, left to
                        # right — the oracle mirrors it term for term
                        pp.append(
                            math.floor(sum(sl) / len(sl) * 1000000.0 + 0.5)
                        )
                    else:
                        f.append(0.0)
                        pp.append(0)
                feats.append(f)
                ppms.append(pp)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": sizes,
                    "features": feats,
                    "feat_ppm": ppms,
                }
            )

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
    df: DataFrame,
    every_nth: int = 8,
    max_frames: int = 4,
    frame_size: int = 8,
    fake_decode: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing: one input video row → N output frame rows
    (media_id, frame_idx, frame_payload).

    Output is a one-to-many mapInPandas (the real ffmpeg pattern: iterate
    the container once, emit selected frames).  The fake path slices the
    payload into deterministic ``frame_size``-byte chunks and keeps every
    ``every_nth``-th chunk; ``frame_idx`` is the SOURCE frame ordinal
    (0, every_nth, 2·every_nth, …) so downstream code can correlate a
    sampled frame back to its media position — the same contract as the
    oracle-verified ``frame_sample`` lane.  (Pre-r4 this function used
    ``every_nth`` as BOTH the chunk size and the stride — an effective
    stride² nobody asked for — and emitted post-sampling ordinals.)
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
                chunk = max(1, frame_size)
                frames = [data[i : i + chunk] for i in range(0, len(data), chunk)]
                kept = range(0, len(frames), max(1, every_nth))
                for src_idx in list(kept)[:max_frames]:
                    rows.append((mid, src_idx, frames[src_idx]))
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


def audio_energy_windows(df: DataFrame, window_bytes: int = 64) -> DataFrame:
    """Windowed energy profile over audio-shaped payloads, Arrow-batched.

    Treats the payload as a PCM-style sample stream (here: unsigned bytes
    — a real pipeline would ``np.frombuffer(..., dtype=np.int16)`` after
    codec decode) and reduces each fixed-size window to its energy (sum of
    sample magnitudes).  This is the silence-detection / loudness-segmentation
    primitive of an audio curation stack, and unlike the decode stubs the
    arithmetic is REAL — so the entire Python lane (Arrow batching, numpy
    window fold, argmax tie policy) is value-hash verifiable by a SQL
    oracle over the same bytes.

    Output: (media_id, n_bytes, n_windows, peak_energy, peak_window,
    energy_md5) — scalars only, canonicalizer-safe.
    """
    import hashlib

    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.IntegerType(), True),
            T.StructField("n_windows", T.IntegerType(), True),
            T.StructField("peak_energy", T.LongType(), True),
            T.StructField("peak_window", T.IntegerType(), True),
            T.StructField("energy_md5", T.StringType(), True),
        ]
    )

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, nw, pe, pw, eh = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(data, dtype=np.uint8)
                n_win = -(-len(arr) // window_bytes) if len(arr) else 0
                energies = [
                    int(arr[w * window_bytes : (w + 1) * window_bytes].sum())
                    for w in range(n_win)
                ]
                ids.append(mid)
                nb.append(len(arr))
                nw.append(n_win)
                pe.append(max(energies) if energies else 0)
                # first-max tie policy — matches the oracle's list_position
                pw.append(energies.index(max(energies)) if energies else 0)
                eh.append(
                    hashlib.md5(
                        ",".join(str(e) for e in energies).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": pd.array(nb, dtype="int32"),
                    "n_windows": pd.array(nw, dtype="int32"),
                    "peak_energy": pd.array(pe, dtype="int64"),
                    "peak_window": pd.array(pw, dtype="int32"),
                    "energy_md5": eh,
                }
            )

    return df.select("media_id", "payload").mapInPandas(profile, out_schema)
