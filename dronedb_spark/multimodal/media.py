"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``binary`` content columns with a typed
metadata struct — the pattern a 100 TB training-data pipeline needs:
partition by (kind, shard), prune on metadata, and run decode/feature
kernels as Arrow-batched ``mapInPandas`` stages.

Real decoders (Pillow/ffmpeg/torchaudio) are NOT available in this
environment; per the build contract the decode step is STUBBED:
``decode_media`` raises ``NotImplementedError`` for real formats and
understands the deterministic FAKE container below, so every piece of
Spark-side plumbing — schema, batch shape, UDF signature, partitioning —
is real and tested end-to-end.

FAKE container layout (deterministic, seedable):
  b"FIMG" | w:uint16 | h:uint16 | c:uint8 | payload (w*h*c bytes, seeded)
  b"FVID" | n_frames:uint16 | w:uint16 | h:uint16 | per-frame payload
  b"FAUD" | sample_rate:uint32(=16000) | n:uint32 | int8 samples
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import load

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def fake_image(seed: int, w: int = 16, h: int = 12, c: int = 3) -> bytes:
    payload = bytes(((seed * 2654435761 + i * 40503) % 251) for i in range(w * h * c))
    return b"FIMG" + struct.pack("<HHB", w, h, c) + payload


def fake_video(seed: int, n_frames: int = 8, w: int = 8, h: int = 8) -> bytes:
    payload = bytes(((seed * 97 + i * 31) % 251) for i in range(n_frames * w * h))
    return b"FVID" + struct.pack("<HHH", n_frames, w, h) + payload


def fake_audio(seed: int, n: int = 512, sr: int = 16000) -> bytes:
    """int8 PCM; sample[i] = ((seed*31 + i*17) % 201) - 100 — closed-form,
    so RMS / zero-crossings are SQL-computable for the oracle."""
    payload = bytes((((seed * 31 + i * 17) % 201) - 100) & 0xFF for i in range(n))
    return b"FAUD" + struct.pack("<II", sr, n) + payload


def decode_media(content: bytes) -> np.ndarray:
    """Decode a media payload to a numpy array.

    REAL formats handled pure-Python (public specs, stdlib zlib):
    PNG (sources/png.py), baseline JPEG (sources/jpeg.py — Huffman +
    IDCT, gray/4:4:4/4:2:0), GIF (sources/gif.py — first composited
    frame as RGB), WAV PCM (sources/wav.py), and MJPEG-in-AVI video
    (sources/avi.py — every frame is a full baseline JPEG, decoded to
    an (n, h, w[, 3]) stack).  Inter-frame codecs (H.264/HEVC) still
    need ffmpeg — those raise ``NotImplementedError``; the deterministic
    FAKE container covers their plumbing tests.  Swap this single
    function for a Pillow/ffmpeg implementation — every downstream
    kernel keeps working unchanged.
    """
    magic = content[:4]
    if magic == b"\x89PNG":
        from dronedb_spark.sources.png import decode_png

        return decode_png(content)
    if magic[:2] == b"\xff\xd8":
        from dronedb_spark.sources.jpeg import decode_jpeg

        return decode_jpeg(content)
    if magic == b"GIF8":
        from dronedb_spark.sources.gif import decode_gif

        return decode_gif(content)  # first composited frame, RGB
    if magic == b"RIFF" and content[8:12] == b"WAVE":
        from dronedb_spark.sources.wav import decode_wav

        _sr, samples = decode_wav(content)
        return samples
    if magic == b"RIFF" and content[8:12] == b"AVI ":
        from dronedb_spark.sources.avi import decode_avi_frames

        return decode_avi_frames(content)
    if magic == b"FIMG":
        w, h, c = struct.unpack("<HHB", content[4:9])
        return np.frombuffer(content[9 : 9 + w * h * c], dtype=np.uint8).reshape(h, w, c)
    if magic == b"FVID":
        n, w, h = struct.unpack("<HHH", content[4:10])
        return np.frombuffer(content[10 : 10 + n * w * h], dtype=np.uint8).reshape(n, h, w)
    if magic == b"FAUD":
        sr, n = struct.unpack("<II", content[4:12])
        return np.frombuffer(content[12 : 12 + n], dtype=np.int8)
    raise NotImplementedError(
        "video codec decoding requires ffmpeg — not available in this environment"
    )


def synth_media(spark: SparkSession, embeddings: DataFrame) -> DataFrame:
    """Deterministic media table derived from the embeddings ids (the
    driver ships no binary fixtures)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid in pdf["vec_id"]:
                vid = int(vid)
                if vid % 3 == 2:
                    content = fake_video(vid)
                    meta = (8, 8, 1, 8, None)
                    kind = "video"
                else:
                    content = fake_image(vid)
                    meta = (16, 12, 3, None, None)
                    kind = "image"
                rows.append({"media_id": vid, "kind": kind, "content": content, "meta": meta})
            yield pd.DataFrame(rows)

    from dronedb_spark.tables import spread

    return spread(embeddings.select("vec_id")).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synth_audio(spark: SparkSession, embeddings: DataFrame) -> DataFrame:
    """Deterministic audio table (one clip per embedding id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": int(vid),
                    "kind": "audio",
                    "content": fake_audio(int(vid)),
                    "meta": (None, None, None, None, 16000),
                }
                for vid in pdf["vec_id"]
            ]
            yield pd.DataFrame(rows)

    from dronedb_spark.tables import spread

    return spread(embeddings.select("vec_id")).mapInPandas(gen, schema=MEDIA_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_zero_crossings", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio statistics (RMS energy, strict zero crossings, peak
    amplitude) — the filter/quality stage of an audio training pipeline,
    Arrow-batched like every other decode kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if kind != "audio":
                    continue
                try:
                    s = decode_media(bytes(content)).astype(np.float64)
                except Exception:
                    continue  # skip undecodable clips — never fail the job
                rows.append(
                    {
                        "media_id": media_id,
                        "n_samples": int(s.size),
                        "rms": round(float(np.sqrt(np.mean(s * s))), 6),
                        "n_zero_crossings": int(np.sum(s[:-1] * s[1:] < 0)),
                        "peak": int(np.abs(s).max()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "n_zero_crossings", "peak"]
            )

    return media.mapInPandas(run, schema=_AUDIO_SCHEMA)


# fake_audio is closed-form (sample[i] = ((seed*31 + i*17) % 201) - 100),
# so RMS / zero-crossings / peak are SQL-computable: integer arithmetic
# is exact, the mean of exact ints is exact in doubles (< 2^53), and
# sqrt is IEEE-correctly-rounded in both engines.
@check(
    "audio_features",
    oracle="""
        WITH s AS (
            SELECT e.vec_id AS media_id, i.i,
                   ((e.vec_id * 31 + i.i * 17) % 201) - 100 AS v
            FROM embeddings e, (SELECT unnest(range(0, 512)) AS i) i)
        SELECT media_id, CAST(512 AS BIGINT) AS n_samples,
               ROUND(sqrt(AVG(CAST(v * v AS DOUBLE))), 6) AS rms,
               CAST(SUM(CASE WHEN i < 511
                             AND v * (((media_id * 31 + (i + 1) * 17) % 201) - 100) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_crossings,
               CAST(MAX(ABS(v)) AS INT) AS peak
        FROM s GROUP BY media_id ORDER BY media_id""",
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    audio = synth_audio(spark, load(spark, sf_dir, "embeddings"))
    return audio_features(audio).orderBy("media_id")


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame, n_dims: int = 8) -> DataFrame:
    """Decode → per-media feature vector (stripe means), Arrow-batched.
    For video, frames are SAMPLED (first/middle/last) before featurizing —
    the frame-sample stage of a video pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-zip iteration: iterrows() builds a Series per row (the
        # classic Arrow-batch antipattern); zipping the columns keeps the
        # per-row work at decode+numpy only
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                try:
                    arr = decode_media(bytes(content))
                except Exception:
                    continue  # skip undecodable media — never fail the job
                if kind == "video":
                    idx = [0, arr.shape[0] // 2, arr.shape[0] - 1]
                    arr = arr[idx]
                flat = arr.astype(np.float64).ravel()
                stripes = np.array_split(flat, n_dims)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": int(flat.size),
                        "mean_value": float(flat.mean()),
                        "feature": [float(s.mean()) for s in stripes],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=_FEAT_SCHEMA)


def _nn_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor index-sampling resize (shared by the thumbnail
    sink and its stats check)."""
    h, w = arr.shape[0], arr.shape[1]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[yi][:, xi]


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (numpy index sampling) — the shape of the
    distributed thumbnail stage (SURVEY K9)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if kind != "image":
                    continue
                try:
                    arr = decode_media(bytes(content))
                except Exception:
                    continue  # skip undecodable images — never fail the job
                small = _nn_resize(arr, out_w, out_h)
                rows.append(
                    {
                        "media_id": media_id,
                        "width": out_w,
                        "height": out_h,
                        "thumb": small.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "thumb"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("thumb", T.BinaryType()),
        ]
    )
    return media.mapInPandas(run, schema=schema)


# The ARRAY-typed feature column is projected to scalars (first/last
# element, min/max, size) so the driver can canonicalize rows — r3's
# registration returned the raw array<double> and crashed the harness's
# row sort (unhashable list).  Every projected scalar is EXACT: a stripe
# mean is an exact-int-sum / stripe_len (identical double in both
# engines), element_at is order-defined, and min/max are
# order-independent, so no rounding is needed anywhere.
@check(
    "media_features",
    oracle="""
        WITH px AS (
            SELECT e.vec_id AS media_id, 'image' AS kind, 576 AS nb, 72 AS sl,
                   i.i // 72 AS stripe,
                   CAST((e.vec_id * 2654435761 + i.i * 40503) % 251 AS DOUBLE) AS v
            FROM embeddings e, (SELECT unnest(range(0, 576)) AS i) i
            WHERE e.vec_id % 3 <> 2
            UNION ALL
            SELECT e.vec_id, 'video', 192, 24, i.i // 24,
                   CAST((e.vec_id * 97
                         + (CASE WHEN i.i < 64 THEN i.i
                                 WHEN i.i < 128 THEN 256 + (i.i - 64)
                                 ELSE 448 + (i.i - 128) END) * 31) % 251 AS DOUBLE)
            FROM embeddings e, (SELECT unnest(range(0, 192)) AS i) i
            WHERE e.vec_id % 3 = 2),
        st AS (
            SELECT media_id, kind, nb, stripe, AVG(v) AS m
            FROM px GROUP BY media_id, kind, nb, stripe),
        g AS (SELECT media_id, AVG(v) AS mean_value FROM px GROUP BY media_id)
        SELECT st.media_id, st.kind, CAST(st.nb AS BIGINT) AS n_bytes,
               g.mean_value, CAST(8 AS INT) AS n_feat,
               MAX(CASE WHEN stripe = 0 THEN m END) AS feat_first,
               MAX(CASE WHEN stripe = 7 THEN m END) AS feat_last,
               MIN(m) AS feat_min, MAX(m) AS feat_max
        FROM st JOIN g ON st.media_id = g.media_id
        GROUP BY st.media_id, st.kind, st.nb, g.mean_value
        ORDER BY st.media_id""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, load(spark, sf_dir, "embeddings"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "mean_value",
        F.size("feature").alias("n_feat"),
        F.element_at("feature", 1).alias("feat_first"),
        F.element_at("feature", -1).alias("feat_last"),
        F.array_min("feature").alias("feat_min"),
        F.array_max("feature").alias("feat_max"),
    ).orderBy("media_id")


# The fake containers are closed-form (image pixel i = (seed*2654435761 +
# i*40503) % 251; video pixel i = (seed*97 + i*31) % 251 with frames
# [0, n/2, n-1] sampled), and every stripe mean is a ratio of exact
# integers (sums < 2^53), so the decode → featurize pipeline is EXACTLY
# reproducible in SQL.  The feature vector is exploded to per-stripe rows
# (scalars only — arrays are flattened in every oracle-checked output).
@check(
    "media_stripe_means",
    oracle="""
        WITH px AS (
            SELECT e.vec_id AS media_id, 'image' AS kind, 576 AS nb,
                   i.i // 72 AS stripe,
                   CAST((e.vec_id * 2654435761 + i.i * 40503) % 251 AS DOUBLE) AS v
            FROM embeddings e, (SELECT unnest(range(0, 576)) AS i) i
            WHERE e.vec_id % 3 <> 2
            UNION ALL
            SELECT e.vec_id, 'video', 192, i.i // 24,
                   CAST((e.vec_id * 97
                         + (CASE WHEN i.i < 64 THEN i.i
                                 WHEN i.i < 128 THEN 256 + (i.i - 64)
                                 ELSE 448 + (i.i - 128) END) * 31) % 251 AS DOUBLE)
            FROM embeddings e, (SELECT unnest(range(0, 192)) AS i) i
            WHERE e.vec_id % 3 = 2)
        SELECT media_id, kind, CAST(nb AS BIGINT) AS n_bytes,
               CAST(stripe AS INT) AS stripe, AVG(v) AS stripe_mean
        FROM px GROUP BY media_id, kind, nb, stripe
        ORDER BY media_id, stripe""",
)
def q_media_stripe_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-engine check for the media featurize kernel: per-stripe
    means vs the closed-form pixel generator evaluated relationally."""
    media = synth_media(spark, load(spark, sf_dir, "embeddings"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("feature").alias("stripe", "stripe_mean"),
    ).orderBy("media_id", "stripe")


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: decode each video and emit every ``stride``-th
    frame with its stats — the frame-selection stage of a video training
    pipeline.  Arrow-batched ``mapInPandas``; one input video row fans out
    to n_frames/stride output rows, so the stage is repartition-friendly
    (downstream ops key on (media_id, frame_idx))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if kind != "video":
                    continue
                try:
                    arr = decode_media(bytes(content))  # (n, h, w)
                except Exception:
                    continue  # skip undecodable videos — never fail the job
                for f in range(0, arr.shape[0], stride):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": f,
                            "height": int(arr.shape[1]),
                            "width": int(arr.shape[2]),
                            "frame_mean": float(arr[f].astype(np.float64).mean()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "height", "width", "frame_mean"]
            )

    return media.mapInPandas(run, schema=_FRAME_SCHEMA)


# The FAKE video payload is a closed-form byte formula (fake_video:
# byte[i] = (seed*97 + i*31) % 251, frame f = bytes [f*64, (f+1)*64)),
# so frame means are SQL-computable — the decode PLUMBING (binary column
# → mapInPandas → typed frames) gets a true value-level oracle, not just
# a rows-only check.  Integer arithmetic + sum < 2^53 ⇒ exact doubles in
# both engines.
@check(
    "video_frame_sample",
    oracle="""
        SELECT e.vec_id AS media_id, CAST(f.f AS INT) AS frame_idx,
               8 AS height, 8 AS width,
               list_avg(list_transform(range(f.f * 64, (f.f + 1) * 64),
                        i -> CAST((e.vec_id * 97 + i * 31) % 251 AS DOUBLE))) AS frame_mean
        FROM embeddings e, (SELECT unnest([0, 2, 4, 6]) AS f) f
        WHERE e.vec_id % 3 = 2
        ORDER BY media_id, frame_idx""",
)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, load(spark, sf_dir, "embeddings"))
    return sample_frames(media, stride=2).orderBy("media_id", "frame_idx")


_THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb_mean", T.DoubleType()),
    ]
)


def thumb_stats(media: DataFrame, out_w: int = 4, out_h: int = 3) -> DataFrame:
    """Thumbnail stage with a value-level check: decode → nearest-neighbor
    resize (same `_nn_resize` kernel as the sink) → per-thumb byte mean."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if kind != "image":
                    continue
                try:
                    small = _nn_resize(decode_media(bytes(content)), out_w, out_h)
                except Exception:
                    continue  # skip undecodable images — never fail the job
                rows.append(
                    {
                        "media_id": media_id,
                        "width": out_w,
                        "height": out_h,
                        "thumb_mean": float(small.astype(np.float64).mean()),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "thumb_mean"])

    return media.mapInPandas(run, schema=_THUMB_SCHEMA)


# Like video_frame_sample: the fake image payload is closed-form
# (fake_image: byte[(y*16+x)*3+ch] = (seed*2654435761 + idx*40503) % 251,
# 16×12×3), and nearest-neighbor 4×3 sampling picks y∈{0,4,8},
# x∈{0,4,8,12} — so the resized thumb's mean is SQL-computable and the
# whole decode→resize plumbing gets a true oracle.
@check(
    "thumb_stats",
    oracle="""
        SELECT e.vec_id AS media_id, 4 AS width, 3 AS height,
               AVG(CAST((e.vec_id * 2654435761 + ((ty.y * 16 + tx.x) * 3 + tc.ch) * 40503) % 251
                        AS DOUBLE)) AS thumb_mean
        FROM embeddings e,
             (SELECT unnest([0, 4, 8]) AS y) ty,
             (SELECT unnest([0, 4, 8, 12]) AS x) tx,
             (SELECT unnest([0, 1, 2]) AS ch) tc
        WHERE e.vec_id % 3 <> 2
        GROUP BY e.vec_id
        ORDER BY media_id""",
)
def q_thumb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, load(spark, sf_dir, "embeddings"))
    return thumb_stats(media).orderBy("media_id")
