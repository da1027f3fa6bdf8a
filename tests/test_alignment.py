"""Image-text alignment: exact-score law, threshold gate, embedding
shapes, and the codegen'd (non-HOF) scoring plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dronedb_spark.multimodal.alignment import (
    GRID,
    alignment_filter,
    alignment_scores,
    grid_image_embed,
)
from dronedb_spark.sources.gif import encode_gif


def _media(spark, frames_and_captions):
    rows = [
        (i, encode_gif([f]), c) for i, (f, c) in enumerate(frames_and_captions)
    ]
    return spark.createDataFrame(
        rows, "media_id long, content binary, caption string"
    )


def _frame(seed):
    v = np.fromfunction(
        lambda y, x: (seed * 31 + y * 7 + x * 3) % 180, (16, 16)
    )
    return np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)


def _cells(frame):
    v = frame[:, :, 0].astype(np.int64)
    b = v.shape[0] // GRID
    return v.reshape(GRID, b, GRID, b).sum(axis=(1, 3)).reshape(-1).tolist()


def _cap(cells):
    return "cells " + " ".join(str(c) for c in cells)


def test_matched_caption_scores_exactly_one(spark):
    f = _frame(3)
    df = _media(spark, [(f, _cap(_cells(f)))])
    [r] = alignment_scores(df).collect()
    assert r["score"] == 1.0  # exact: num² == na·nb when vectors equal


def test_scaled_caption_still_one(spark):
    """Squared cosine is scale-invariant — a caption embedding that is
    2x the image vector is the same direction."""
    f = _frame(5)
    df = _media(spark, [(f, _cap([2 * c for c in _cells(f)]))])
    [r] = alignment_scores(df).collect()
    assert r["score"] == 1.0


def test_mismatched_caption_filtered(spark):
    fa, fb = _frame(0), _frame(9)
    df = _media(spark, [(fa, _cap(_cells(fa))), (fb, _cap(_cells(fa)))])
    scored = alignment_scores(df)
    kept = alignment_filter(scored, 0.999).select("media_id").collect()
    assert [r["media_id"] for r in kept] == [0]


def test_grid_embed_shape_and_values(spark):
    f = _frame(7)
    df = _media(spark, [(f, "cells 0")]).select("media_id", "content")
    [r] = grid_image_embed(df).collect()
    assert r["img_vec"] == _cells(f)


def test_undecodable_image_skips(spark):
    f = _frame(1)
    rows = [
        (0, encode_gif([f]), _cap(_cells(f))),
        (1, b"not a gif at all", "cells 1 2 3"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary, caption string")
    got = alignment_scores(df).select("media_id").collect()
    assert [r["media_id"] for r in got] == [0]


def test_score_stage_is_codegen_not_hof(spark):
    """The dot products must unroll to literal terms — no aggregate()
    HOF (CodegenFallback, interpreted per row) in the scoring plan."""
    f = _frame(2)
    df = _media(spark, [(f, _cap(_cells(f)))])
    plan = alignment_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(" not in plan
