"""Perceptual image hashing (dHash) + banded hamming near-dup — the
image half of the dedup family: byte-identical images are caught by
S6's content hash, but re-encoded / brightness-shifted / recompressed
copies need a PERCEPTUAL key.  dHash (difference hash): grayscale →
8×9 box means → 64 gradient-sign bits; constant photometric shifts and
any change that preserves local gradient signs map to the same hash.

Beyond the reference (thumbs.cpp stops at thumbnail bytes).  Scale
design, mirroring the SimHash text path (`text/simhash.py`):

  * hashing is a one-pass Arrow ``mapInPandas`` over the binary cells —
    decode where the bytes live, emit two 32-bit halves per image
    (numpy box means, no Python per-pixel work);
  * near-dup candidates come from an equi-self-join on 16-bit hash
    BANDS (any image pair within hamming distance 3 shares at least
    one of the 4 bands by pigeonhole) — never an all-pairs scan;
  * the exact hamming refine is JVM-side ``bit_count(xor)`` on the
    candidate set only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import spread

GRID_H, GRID_W = 8, 9  # box grid; 8 x 8 gradient bits


def dhash_array(arr: np.ndarray) -> tuple[int, int]:
    """dHash of an (h, w, c) uint8 array → two unsigned 32-bit halves
    (little bit order: bit index by*8+bx, left-to-right gradients).
    Requires h % 8 == 0 and w % 9 == 0 (integer box means keep the
    closed form oracle-reproducible; a production variant would
    bilinear-resample first)."""
    g = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    h, w = g.shape
    assert h % GRID_H == 0 and w % GRID_W == 0, (h, w)
    boxes = g.reshape(GRID_H, h // GRID_H, GRID_W, w // GRID_W).mean(axis=(1, 3))
    bits = (boxes[:, :-1] < boxes[:, 1:]).astype(np.int64).ravel()
    h1 = int(sum(int(bits[i]) << i for i in range(32)))
    h2 = int(sum(int(bits[32 + i]) << i for i in range(32)))
    return h1, h2


_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("h1", T.LongType()),
        T.StructField("h2", T.LongType()),
    ]
)


def dhash_images(media: DataFrame) -> DataFrame:
    """(media_id, h1, h2) from (media_id, content) image bytes — decode
    + hash inside one Arrow pass, one file per task row."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h1, h2 = dhash_array(decode_media(bytes(content)))
                rows.append({"media_id": int(mid), "h1": h1, "h2": h2})
            yield pd.DataFrame(rows, columns=["media_id", "h1", "h2"])

    return media.mapInPandas(kernel, schema=_HASH_SCHEMA)


def dhash_neardup(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(img_a, img_b, hamming) pairs within ``max_hamming`` bits,
    candidates from the 4×16-bit band equi-join."""
    bands = hashes.select(
        "media_id",
        "h1",
        "h2",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("h1") % 65536).alias("bv")),
                F.struct(F.lit(1).alias("band"), (F.col("h1") / 65536).cast("bigint").alias("bv")),
                F.struct(F.lit(2).alias("band"), (F.col("h2") % 65536).alias("bv")),
                F.struct(F.lit(3).alias("band"), (F.col("h2") / 65536).cast("bigint").alias("bv")),
            )
        ).alias("s"),
    ).select("media_id", "h1", "h2", "s.band", "s.bv")
    a = bands.select(
        F.col("media_id").alias("img_a"), F.col("h1").alias("h1a"),
        F.col("h2").alias("h2a"), "band", "bv",
    )
    b = bands.select(
        F.col("media_id").alias("img_b"), F.col("h1").alias("h1b"),
        F.col("h2").alias("h2b"), "band", "bv",
    )
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("img_a") < F.col("img_b"))
        .select("img_a", "img_b", "h1a", "h2a", "h1b", "h2b")
        .distinct()
    )
    ham = F.expr("bit_count(h1a ^ h1b) + bit_count(h2a ^ h2b)")
    return (
        cand.select("img_a", "img_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------------------- check --

_PH_N_PAIR = 8   # 16 images: mates 2k / 2k+1 differ by a +3 shift
_PH_H, _PH_W = 32, 36


def _ph_pixels(i: int) -> np.ndarray:
    k, m = divmod(i, 2)
    v = np.fromfunction(
        lambda y, x: (k * 37 + y * 5 + x * 11) % 200 + m * 3, (_PH_H, _PH_W)
    )
    return np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)


@check(
    "image_dhash_neardup",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS img, y.y AS y, x.x AS x,
                   CAST((i.i // 2 * 37 + y.y * 5 + x.x * 11) % 200
                        + (i.i % 2) * 3 AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {2 * _PH_N_PAIR})) AS i) i,
                 (SELECT unnest(range(0, {_PH_H})) AS y) y,
                 (SELECT unnest(range(0, {_PH_W})) AS x) x),
        boxes AS (
            SELECT img, y // 4 AS by, x // 4 AS bx, AVG(v) AS bv
            FROM px GROUP BY img, y // 4, x // 4),
        bits AS (
            SELECT a.img, a.by * 8 + a.bx AS idx,
                   CASE WHEN a.bv < b.bv THEN 1 ELSE 0 END AS bit
            FROM boxes a
            JOIN boxes b ON a.img = b.img AND a.by = b.by AND b.bx = a.bx + 1
            WHERE a.bx < 8),
        hs AS (
            SELECT img,
                   CAST(SUM(CASE WHEN idx < 32
                                 THEN bit * (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS h1,
                   CAST(SUM(CASE WHEN idx >= 32
                                 THEN bit * (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT) AS h2
            FROM bits GROUP BY img),
        bands AS (
            SELECT img, h1, h2, band,
                   CASE band WHEN 0 THEN h1 % 65536
                             WHEN 1 THEN CAST(h1 // 65536 AS BIGINT)
                             WHEN 2 THEN h2 % 65536
                             ELSE CAST(h2 // 65536 AS BIGINT) END AS bv
            FROM hs, (SELECT unnest(range(0, 4)) AS band) bs),
        cand AS (
            SELECT DISTINCT a.img AS img_a, b.img AS img_b,
                   a.h1 AS h1a, a.h2 AS h2a, b.h1 AS h1b, b.h2 AS h2b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv AND a.img < b.img)
        SELECT img_a, img_b,
               CAST(bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 6
        ORDER BY img_a, img_b""",
)
def q_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG bytes through decode → dHash → banded hamming pairs.
    Mates (2k, 2k+1) differ by a constant +3 brightness shift, which
    preserves every gradient sign — each pair MUST surface with
    hamming 0, which the content hash (different bytes) cannot see."""
    media = _gen_ph_png(spread(spark.range(2 * _PH_N_PAIR)))
    pairs = dhash_neardup(dhash_images(media), max_hamming=6)
    return pairs.select(
        "img_a", "img_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("img_a", "img_b")


def _gen_ph_png(ids: DataFrame) -> DataFrame:
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.png import encode_png

        for pdf in it:
            rows = [
                {"media_id": int(i), "content": encode_png(_ph_pixels(int(i)))}
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids.mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
