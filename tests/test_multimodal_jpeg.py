"""Spark-side JPEG lanes: documents_as_jpeg → decode_jpeg →
resize_images(fake_decode=False) — the previously-stubbed "wire PIL
here" seam, now backed by the in-repo baseline codec.

The codec's own correctness is pinned by hand-constructed spec streams
(test_jpeg_codec.py); these tests pin the DISTRIBUTED plumbing: Arrow
batch shapes, fail-soft NULLs, determinism across runs, and agreement
between the cluster-side decode and a driver-side replay of the same
payload bytes.
"""

import hashlib

import numpy as np
import pyspark.sql.functions as F
import pytest

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import jpeg, multimodal


def _docs(spark, sf_dir, n=40):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
    )


def test_decode_jpeg_roundtrip_and_driver_replay(spark, sf_dir):
    media = multimodal.documents_as_jpeg(_docs(spark, sf_dir)).cache()
    got = {r["media_id"]: r for r in multimodal.decode_jpeg(media).collect()}
    assert got and all(r["pixels_md5"] is not None for r in got.values())
    assert all(r["width"] == 16 and r["n_channels"] == 1 for r in got.values())
    # driver-side replay of the same payload bytes must agree exactly
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, data in list(payloads.items())[:5]:
        h, w, px = jpeg.decode_baseline(data)
        assert (got[mid]["height"], got[mid]["width"]) == (h, w)
        assert got[mid]["pixels_md5"] == hashlib.md5(px.tobytes()).hexdigest()
        assert got[mid]["sum_luma"] == int(px.astype("int64").sum())
    # deterministic across runs (the payloads AND the decode)
    again = {
        r["media_id"]: r["pixels_md5"]
        for r in multimodal.decode_jpeg(media).collect()
    }
    assert again == {m: r["pixels_md5"] for m, r in got.items()}
    media.unpersist()


def test_decode_jpeg_fail_soft_on_corrupt(spark):
    good = jpeg.encode_baseline(np.full((8, 8), 99, dtype=np.uint8))
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"\xff\xd8garbage")),
        (3, bytearray(good[:12])),  # truncated
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in multimodal.decode_jpeg(df).collect()}
    assert got[1]["pixels_md5"] is not None and got[1]["width"] == 8
    assert got[2]["pixels_md5"] is None
    assert got[3]["pixels_md5"] is None


def test_resize_images_real_path(spark, sf_dir):
    media = multimodal.documents_as_jpeg(_docs(spark, sf_dir, n=20)).cache()
    resized = multimodal.resize_images(
        media, width=8, height=8, fake_decode=False
    )
    got = {r["media_id"]: r for r in resized.collect()}
    assert got and all(
        r["width"] == 8 and r["height"] == 8 and r["payload"] is not None
        for r in got.values()
    )
    # every resized payload decodes to exactly 8×8, and matches a
    # driver-side replay (decode → same integer index map → re-encode)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, data in list(payloads.items())[:5]:
        h0, w0, px = jpeg.decode_baseline(data)
        ys = (np.arange(8) * h0) // 8
        xs = (np.arange(8) * w0) // 8
        expect = jpeg.encode_baseline(px[ys][:, xs], 90)
        assert bytes(got[mid]["payload"]) == expect
        h, w, _ = jpeg.decode_baseline(bytes(got[mid]["payload"]))
        assert (h, w) == (8, 8)
    media.unpersist()


def test_resize_images_real_path_fail_soft(spark):
    df = spark.createDataFrame(
        [(7, bytearray(b"not a jpeg"))], "media_id long, payload binary"
    )
    got = multimodal.resize_images(df, 8, 8, fake_decode=False).collect()
    assert got[0]["payload"] is None and got[0]["width"] is None


def test_resize_images_fake_path_unchanged(spark):
    # the plumbing contract the pre-codec tests relied on still holds
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(256))))], "media_id long, payload binary"
    )
    got = multimodal.resize_images(df, 16, 16, fake_decode=True).collect()[0]
    assert got["width"] == 16 and len(bytes(got["payload"])) == 4
