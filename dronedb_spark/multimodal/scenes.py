"""Scene-cut detection over animated media — the video-curation step a
multimodal training pipeline runs before frame sampling (beyond the
reference; the standard shot-boundary method: consecutive-frame
absolute-difference energy, e.g. PySceneDetect's ``detect-content``
reduced to its luminance term).

A cut is a frame whose mean absolute difference from its predecessor
exceeds ``threshold`` per pixel; within-scene motion stays far below
it.  Differences are INTEGER sums over uint8 frames — exact, so the
whole pipeline (real GIF bytes → LZW decode → frame differencing →
cut flags) is value-checked against a closed-form DuckDB oracle.

Scale shape: one Arrow ``mapInPandas`` pass, one FILE per task row
(decode where the bytes live, numpy int64 diffs, per-file
catch-and-skip); output is boundaries-per-file (n_frames - 1 rows), no
shuffle at all."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import spread

CUT_THRESHOLD = 10  # mean abs diff per pixel above this ⇒ scene cut

_SCENE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("sum_abs_diff", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("is_cut", T.IntegerType()),
    ]
)


def frame_diffs(media: DataFrame, threshold: int = CUT_THRESHOLD) -> DataFrame:
    """(media_id, frame_no, sum_abs_diff, n_px, is_cut) per frame
    boundary (frame_no = the later frame's index) from (media_id,
    content) animated-GIF bytes."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.gif import decode_gif_frames

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    frames = decode_gif_frames(bytes(content))
                except Exception:
                    continue
                gray = frames[:, :, :, 0].astype(np.int64)
                n_px = int(gray.shape[1] * gray.shape[2])
                diffs = np.abs(gray[1:] - gray[:-1]).sum(axis=(1, 2))
                for f, d in enumerate(diffs, start=1):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_no": f,
                            "sum_abs_diff": int(d),
                            "n_px": n_px,
                            "is_cut": int(d > threshold * n_px),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_no", "sum_abs_diff", "n_px", "is_cut"],
            )

    return media.mapInPandas(kernel, schema=_SCENE_SCHEMA)


def scene_spans(diffs: DataFrame) -> DataFrame:
    """(media_id, scene_no, start_frame, end_frame) — cuts partition the
    frame index into scenes (scene_no = running count of cuts at or
    before the start, a per-file window over boundary rows)."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_no")
    scene = diffs.select(
        "media_id",
        "frame_no",
        F.sum("is_cut").over(w).alias("scene_no"),
    )
    return (
        scene.groupBy("media_id", "scene_no")
        .agg(
            F.min("frame_no").alias("first_boundary"),
            F.max("frame_no").alias("last_boundary"),
        )
        .orderBy("media_id", "scene_no")
    )


# ----------------------------------------------------------- check --

_SC_N = 6          # gif files
_SC_FRAMES = 15    # 3 scenes of 5 frames each
_SC_H, _SC_W = 16, 16
_SC_PER = 5


def _scene_frame(i: int, f: int) -> np.ndarray:
    scene, r = divmod(f, _SC_PER)
    j = np.arange(_SC_H * _SC_W, dtype=np.int64)
    v = (scene * 91 + i * 37 + j * 17) % 200 + r * 2
    return v.astype(np.uint8).reshape(_SC_H, _SC_W, 1).repeat(3, axis=2)


@check(
    "video_scene_cuts",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS media_id, f.f AS f, j.j AS j,
                   CAST(((f.f // {_SC_PER}) * 91 + i.i * 37 + j.j * 17) % 200
                        + (f.f % {_SC_PER}) * 2 AS BIGINT) AS v
            FROM (SELECT unnest(range(0, {_SC_N})) AS i) i,
                 (SELECT unnest(range(0, {_SC_FRAMES})) AS f) f,
                 (SELECT unnest(range(0, {_SC_H * _SC_W})) AS j) j),
        d AS (
            SELECT a.media_id, CAST(b.f AS INT) AS frame_no,
                   SUM(ABS(b.v - a.v)) AS sad
            FROM px a JOIN px b
              ON b.media_id = a.media_id AND b.j = a.j AND b.f = a.f + 1
            GROUP BY a.media_id, b.f)
        SELECT media_id, frame_no, CAST(sad AS BIGINT) AS sum_abs_diff,
               CAST({_SC_H * _SC_W} AS BIGINT) AS n_px,
               CAST(CASE WHEN sad > {CUT_THRESHOLD * _SC_H * _SC_W}
                         THEN 1 ELSE 0 END AS INT) AS is_cut
        FROM d ORDER BY media_id, frame_no""",
)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real animated-GIF bytes (3 scenes × 5 frames; +2/frame drift
    within a scene, a content jump at each boundary) through LZW decode
    → frame differencing → cut flags.  Within-scene boundaries must
    read exactly 2·n_px; the two scene cuts must flag."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.gif import encode_gif

        for pdf in it:
            rows = [
                {
                    "media_id": int(i),
                    "content": encode_gif(
                        [_scene_frame(int(i), f) for f in range(_SC_FRAMES)]
                    ),
                }
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = spread(spark.range(_SC_N)).mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    return frame_diffs(media).orderBy("media_id", "frame_no")
