"""Per-frame video fingerprints: brightness + temporal-trim invariance."""

from __future__ import annotations

import numpy as np

from dronedb_spark.multimodal.videofp import (
    _vf_frame,
    video_frame_hashes,
    video_neardup,
)


def test_trimmed_clip_shares_interior_frames(spark):
    from dronedb_spark.sources.gif import encode_gif

    rows = [
        (0, bytearray(encode_gif([_vf_frame(0, f) for f in range(5)]))),
        (2, bytearray(encode_gif([_vf_frame(2, f) for f in range(5)]))),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = video_frame_hashes(media)
    got = {(r["media_id"], r["frame_no"]): (r["h1"], r["h2"]) for r in hashes.collect()}
    # clip 2's frame f equals clip 0's frame f+1 (one-frame trim)
    for f in range(4):
        assert got[(2, f)] == got[(0, f + 1)]
    pairs = video_neardup(hashes, max_hamming=6).collect()
    assert len(pairs) == 1
    r = pairs[0]
    assert (r["vid_a"], r["vid_b"], r["hamming"]) == (0, 2, 0)
    assert r["n_frame_matches"] >= 4


def test_undecodable_clip_skips(spark):
    rows = [(1, bytearray(b"not a gif"))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    assert video_frame_hashes(media).collect() == []
