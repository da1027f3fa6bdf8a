"""Frequency-domain perceptual image hash via the 2D Walsh-Hadamard
transform — the pHash/wHash family's recipe (DCT low-frequency signs,
e.g. Zauner 2010) made EXACT-INTEGER portable: WHT butterflies are ±1
sums on int64 (the same trick ``multimodal/audiofp.py`` uses for its
band energies), so every coefficient — and therefore every hash bit —
is bit-identical in any engine, where a float DCT would drift in the
last ulp.

Complement to dHash (``multimodal/phash.py``): dHash keys on LOCAL
horizontal gradients; this hash keys on the GLOBAL frequency structure
of the 8×8 box-sum thumbnail — the two fail on different edits, which
is why production near-dup stacks run both and union candidates.

Math guarantees (pytest-pinned):

  * bit_i = AC_coef_i > type-1 median(AC coefs) — the 63 non-DC
    Walsh coefficients against their own median order statistic;
  * a brightness SHIFT changes only the DC coefficient (every other
    Walsh row sums to zero), and a positive CONTRAST scale multiplies
    all AC coefficients and their median alike — so affine mates hash
    at hamming 0 exactly, not approximately;
  * candidates reuse ``phash.dhash_neardup`` verbatim: 8×8-bit bands,
    pigeonhole recall to hamming 7, hot-bucket DF cap, JVM popcount
    refine — one banded equi-join, never all-pairs.

Decode runs in the same one-file-per-task Arrow pass as the dHash
kernel (channel 0 of RGB input — the fixture replicates channels; a
production luma conversion slots in without changing the contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.multimodal.phash import _HASH_SCHEMA, dhash_neardup
from dronedb_spark.suite import check
from dronedb_spark.tables import spread

_H8 = np.array(
    [[1 - 2 * (bin(k & n).count("1") % 2) for n in range(8)] for k in range(8)],
    dtype=np.int64,
)


def wht_hash_array(arr: np.ndarray) -> tuple[int, int]:
    """(h1, h2) halves of the 63-bit WHT sign hash of a uint8 image
    (any h, w >= 8; boxes are h//8 × w//8 sums, edges cropped)."""
    g = (arr[:, :, 0] if arr.ndim == 3 else arr).astype(np.int64)
    h, w = g.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError("image smaller than the 8x8 box grid")
    g = g[: bh * 8, : bw * 8]
    boxes = g.reshape(8, bh, 8, bw).sum(axis=(1, 3))
    coef = _H8 @ boxes @ _H8.T
    flat = coef.ravel()
    ac = [(int(flat[i]), i) for i in range(64) if i != 0]
    med = sorted(ac)[31][0]  # type-1 median: 32nd smallest of 63
    h1 = h2 = 0
    for c, i in ac:
        if c > med:
            if i < 32:
                h1 |= 1 << i
            else:
                h2 |= 1 << (i - 32)
    return h1, h2


def wht_hash_images(media: DataFrame) -> DataFrame:
    """(media_id, h1, h2) from (media_id, content) image bytes — decode
    + transform in one Arrow pass; undecodable files skip."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    h1, h2 = wht_hash_array(decode_media(bytes(content)))
                except Exception:
                    continue
                rows.append({"media_id": int(mid), "h1": h1, "h2": h2})
            yield pd.DataFrame(rows, columns=["media_id", "h1", "h2"])

    return media.mapInPandas(kernel, schema=_HASH_SCHEMA)


# ------------------------------------------------------------- fixture --

_WH_N_PAIR = 8
_WH_HW = 32           # 32×32 → 4×4-pixel boxes
_WH_MAX_DF = 12


def _wh_pixels(i: int) -> np.ndarray:
    """Image i: k-keyed ramp in [0, 100); odd mates are the AFFINE edit
    2v + 5 — a brightness AND contrast change at once."""
    k, m = divmod(i, 2)
    v = np.fromfunction(
        lambda y, x: (k * 37 + y * 5 + x * 11) % 100, (_WH_HW, _WH_HW)
    )
    v = v * (1 + m) + 5 * m
    return np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)


def _gen_wh_png(ids: DataFrame) -> DataFrame:
    from pyspark.sql import types as T

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.png import encode_png

        for pdf in it:
            rows = [
                {"media_id": int(i), "content": encode_png(_wh_pixels(int(i)))}
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


def _wh_oracle(n_images: int, max_df: int = _WH_MAX_DF) -> str:
    return f"""
        WITH px AS (
            SELECT i.i AS img, y.y AS y, x.x AS x,
                   CAST(((i.i // 2 * 37 + y.y * 5 + x.x * 11) % 100)
                        * (1 + i.i % 2) + 5 * (i.i % 2) AS BIGINT) AS v
            FROM (SELECT unnest(range(0, {n_images})) AS i) i,
                 (SELECT unnest(range(0, {_WH_HW})) AS y) y,
                 (SELECT unnest(range(0, {_WH_HW})) AS x) x),
        boxes AS (
            SELECT img, y // 4 AS byy, x // 4 AS bxx, SUM(v) AS bs
            FROM px GROUP BY img, y // 4, x // 4),
        signs AS (
            SELECT k.k AS k, n.n AS n,
                   CAST(1 - 2 * (bit_count(CAST(k.k AS BIGINT) & n.n) % 2)
                        AS BIGINT) AS s
            FROM (SELECT unnest(range(0, 8)) AS k) k,
                 (SELECT unnest(range(0, 8)) AS n) n),
        coef AS (
            SELECT b.img, su.k AS u, sv.k AS v2,
                   SUM(b.bs * su.s * sv.s) AS c
            FROM boxes b
            JOIN signs su ON su.n = b.byy
            JOIN signs sv ON sv.n = b.bxx
            GROUP BY b.img, su.k, sv.k),
        ac AS (
            SELECT img, u * 8 + v2 AS idx, c FROM coef
            WHERE NOT (u = 0 AND v2 = 0)),
        med AS (
            SELECT img, c AS m FROM (
                SELECT img, c,
                       ROW_NUMBER() OVER (PARTITION BY img
                           ORDER BY c, idx) AS rn
                FROM ac) WHERE rn = 32),
        bits AS (
            SELECT a.img, a.idx,
                   CASE WHEN a.c > med.m THEN 1 ELSE 0 END AS bit
            FROM ac a JOIN med ON med.img = a.img),
        hs AS (
            SELECT img,
                   CAST(SUM(CASE WHEN idx < 32
                                 THEN bit * (1::BIGINT << idx) ELSE 0 END)
                        AS BIGINT) AS h1,
                   CAST(SUM(CASE WHEN idx >= 32
                                 THEN bit * (1::BIGINT << (idx - 32)) ELSE 0 END)
                        AS BIGINT) AS h2
            FROM bits GROUP BY img),
        bands AS (
            SELECT img, h1, h2, band,
                   CAST((CASE WHEN band < 4 THEN h1 ELSE h2 END
                         // (1::BIGINT << ((band % 4) * 8))) AS BIGINT) % 256
                       AS bv
            FROM hs, (SELECT unnest(range(0, 8)) AS band) bs),
        rare AS (
            SELECT band, bv FROM bands
            GROUP BY band, bv HAVING COUNT(DISTINCT img) <= {max_df}),
        kept AS (SELECT b.* FROM bands b JOIN rare USING (band, bv)),
        cand AS (
            SELECT DISTINCT a.img AS img_a, b.img AS img_b,
                   a.h1 AS h1a, a.h2 AS h2a, b.h1 AS h1b, b.h2 AS h2b
            FROM kept a JOIN kept b
              ON a.band = b.band AND a.bv = b.bv AND a.img < b.img)
        SELECT img_a, img_b,
               CAST(bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b))
                    AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 6
        ORDER BY img_a, img_b"""


@check("image_whash_neardup", oracle=_wh_oracle(2 * _WH_N_PAIR))
def q_image_whash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG bytes → WHT sign hash → banded hamming pairs.  Mates
    (2k, 2k+1) are AFFINE edits (2v + 5): DC absorbs the shift, the
    scale cancels against the median, so every pair MUST surface at
    hamming 0 — replayed coefficient-for-coefficient by the oracle."""
    media = _gen_wh_png(spread(spark.range(2 * _WH_N_PAIR)))
    pairs = dhash_neardup(wht_hash_images(media), max_hamming=6, max_df=_WH_MAX_DF)
    return pairs.select(
        "img_a", "img_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("img_a", "img_b")
