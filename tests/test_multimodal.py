"""Multimodal plumbing tests: fake-container decode, feature extraction,
resize, video frame sampling — real Spark batching, stubbed codecs."""

from __future__ import annotations

import pytest

from dronedb_spark.multimodal.media import (
    decode_media,
    extract_features,
    fake_image,
    fake_video,
    resize_images,
    synth_media,
)
from dronedb_spark.tables import load


def test_decode_roundtrip():
    arr = decode_media(fake_image(7, w=16, h=12, c=3))
    assert arr.shape == (12, 16, 3)
    vid = decode_media(fake_video(7, n_frames=8, w=8, h=8))
    assert vid.shape == (8, 8, 8)
    # real JPEG now decodes through the baseline codec...
    import numpy as np

    from dronedb_spark.sources.jpeg import encode_jpeg

    img = (np.arange(24 * 32 * 3) % 251).astype(np.uint8).reshape(24, 32, 3)
    assert decode_media(encode_jpeg(img)).shape == (24, 32, 3)
    # ...and truncated JPEG bytes fail loudly (kernels catch-and-skip)
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0 truncated jpeg")


def test_media_pipeline(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(30)
    media = synth_media(spark, emb)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    # deterministic: same id → same features across runs
    feats2 = {r["media_id"]: r for r in extract_features(synth_media(spark, emb)).collect()}
    assert by_id[0]["feature"] == feats2[0]["feature"]
    assert all(len(r["feature"]) == 8 for r in feats)
    # video rows sampled 3 frames of 8x8 → 192 bytes
    vids = [r for r in feats if r["kind"] == "video"]
    assert vids and all(r["n_bytes"] == 3 * 8 * 8 for r in vids)


def test_resize(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(10)
    media = synth_media(spark, emb)
    thumbs = resize_images(media, 4, 3).collect()
    assert all(len(bytes(r["thumb"])) == 4 * 3 * 3 for r in thumbs)
    assert {r["media_id"] for r in thumbs} == {i for i in range(10) if i % 3 != 2}


def test_scene_spans_partition_frames(spark):
    """Cuts partition boundaries into scenes: the fixture's 3 scenes of
    5 frames give scene_no 0/1/2 with the expected boundary ranges."""
    from dronedb_spark.multimodal.scenes import frame_diffs, scene_spans
    from dronedb_spark.suite import load_all

    reg = load_all()
    diffs = reg["video_scene_cuts"].spark_fn(spark, "/root/testdata/sf0.001")
    spans = scene_spans(diffs).filter("media_id = 0").collect()
    got = [(r["scene_no"], r["first_boundary"], r["last_boundary"]) for r in spans]
    # boundaries 1-4 pre-cut (scene 0), 5-9 (scene 1 starts at cut 5),
    # 10-14 (scene 2 starts at cut 10)
    assert got == [(0, 1, 4), (1, 5, 9), (2, 10, 14)]


def test_aspect_buckets_nearest_and_batches_full(spark, sf_dir):
    from dronedb_spark.multimodal.bucketing import (
        BATCH,
        BUCKET_ASPECTS,
        bucket_batches,
    )
    from dronedb_spark.tables import register_views

    register_views(spark, sf_dir, ["documents"])
    dims = spark.sql(
        "SELECT doc_id, CAST(512 + (doc_id * 7) % 1537 AS BIGINT) AS w,"
        " CAST(512 + (doc_id * 13) % 1025 AS BIGINT) AS h"
        " FROM documents WHERE doc_id % 3 = 0"
    )
    rows = bucket_batches(dims).collect()
    wh = {r["doc_id"]: (r["w"], r["h"]) for r in dims.collect()}
    per_batch: dict[tuple, int] = {}
    for r in rows:
        w, h = wh[r["doc_id"]]
        # assigned bucket minimizes the exact integer aspect distance
        dists = [abs(1000 * w - h * a) for a in BUCKET_ASPECTS]
        assert dists[r["bucket"]] == min(dists)
        if r["in_full_batch"]:
            per_batch[(r["bucket"], r["batch_no"])] = (
                per_batch.get((r["bucket"], r["batch_no"]), 0) + 1
            )
    # every kept batch is exactly full
    assert per_batch and all(v == BATCH for v in per_batch.values())
