"""Warehouse-load semantics + multimodal binary plumbing."""

import tempfile

from pyspark.sql import functions as F

from glue_etl_nyc_yellow_taxi_analysis_spark.operators import multimodal
from glue_etl_nyc_yellow_taxi_analysis_spark.sources.writers import ParquetWarehouse


def test_warehouse_create_append_read(spark, sf_dir):
    wh = ParquetWarehouse(tempfile.mkdtemp(prefix="sg_test_wh_"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    assert not wh.table_exists("dim_nation")
    wh.create(nation, "dim_nation")
    assert wh.table_exists("dim_nation")
    assert wh.read(spark, "dim_nation").count() == 25
    wh.append(nation, "dim_nation")
    assert wh.read(spark, "dim_nation").count() == 50  # append, not overwrite


def test_multimodal_resize_and_frames(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = multimodal.documents_as_media(docs)
    resized = multimodal.resize_images(media, 32, 32).collect()
    assert all(r.width == 32 and r.height == 32 for r in resized)
    assert all(len(bytes(r.payload)) <= 32 * 32 // 64 for r in resized)
    frames = multimodal.sample_frames(media, every_nth=8, max_frames=4)
    per_doc = {r[0]: r[1] for r in frames.groupBy("media_id").count().collect()}
    assert set(per_doc) == {r.media_id for r in media.select("media_id").collect()}
    assert all(1 <= n <= 4 for n in per_doc.values())  # one-to-many explosion, capped
    # frame_idx is the SOURCE ordinal (0, 8, 16, ...), not a renumbering
    assert all(r.frame_idx % 8 == 0 for r in frames.collect())


def test_multimodal_features_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = multimodal.documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "width", "height",
    ]
    feats1 = {r.media_id: tuple(r.features) for r in multimodal.extract_features(media).collect()}
    feats2 = {r.media_id: tuple(r.features) for r in multimodal.extract_features(media).collect()}
    assert feats1 == feats2  # deterministic fake decode
    assert all(len(v) == multimodal.FEATURE_DIM for v in feats1.values())
    # n_bytes matches the utf-8 payload length
    n = {r.media_id: r.n_bytes for r in multimodal.extract_features(media).collect()}
    chars = {r.doc_id: r.n for r in docs.select("doc_id", F.length("text").alias("n")).collect()}
    assert all(n[k] >= chars[k] for k in n)  # utf-8 ≥ char count


def test_frame_sample_slices_and_fanout(spark):
    from glue_etl_nyc_yellow_taxi_analysis_spark.operators import multimodal

    rows = [(1, "a" * 100), (2, "b" * 31), (3, "c" * 129)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = multimodal.documents_as_media(df)
    out = multimodal.frame_sample(media, frame_size=32, every=4).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    # 100 bytes → 4 frames → sampled idx {0}; 31 → 1 frame; 129 → 5 frames → {0, 4}
    assert [r.frame_idx for r in by_id[1]] == [0]
    assert [r.frame_len for r in by_id[2]] == [31]
    assert sorted(r.frame_idx for r in by_id[3]) == [0, 4]
    import hashlib
    assert by_id[2][0].frame_md5 == hashlib.md5(b"b" * 31).hexdigest()
    last = [r for r in by_id[3] if r.frame_idx == 4][0]
    assert last.frame_len == 1 and last.frame_md5 == hashlib.md5(b"c").hexdigest()
