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
    (numpy box means, no Python per-pixel work); undecodable images are
    skipped per-file, like the rest of the media pipeline;
  * near-dup candidates come from an equi-self-join on 8-bit hash
    BANDS — any image pair within hamming distance 7 flips bits in at
    most 7 of the 8 bands, so by pigeonhole it shares at least one band
    key; the guarantee covers the default ``max_hamming=6`` with margin
    (16-bit banding only guaranteed ≤ 3 and silently lost recall at
    4-6).  Never an all-pairs scan.
  * the exact hamming refine is JVM-side ``bit_count(xor)`` on the
    candidate set only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import spread

GRID_H, GRID_W = 8, 9  # box grid; 8 x 8 gradient bits
N_BANDS = 8  # 8 bands x 8 bits: pigeonhole guarantees recall to hamming 7
MAX_DF = 1000  # hot-bucket document-frequency cap (images per band bucket)


def _box_means(g: np.ndarray) -> np.ndarray:
    """(GRID_H, GRID_W) area means of an arbitrary (h, w) float array.

    Integral-image sums over the integer box boundaries y_i = i*h//8,
    x_j = j*w//9 — exactly the reshape-mean when 8 | h and 9 | w (so the
    closed-form oracle still reproduces the fixture hashes), and a
    graceful area-resample for any other dimensions, so real-world
    images can never fail the pass on shape (they used to assert)."""
    h, w = g.shape
    if h < GRID_H or w < GRID_W:
        raise ValueError(f"image {h}x{w} smaller than the {GRID_H}x{GRID_W} grid")
    ys = (np.arange(GRID_H + 1) * h) // GRID_H
    xs = (np.arange(GRID_W + 1) * w) // GRID_W
    integral = np.zeros((h + 1, w + 1))
    integral[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
    corner = integral[ys][:, xs]
    sums = corner[1:, 1:] - corner[:-1, 1:] - corner[1:, :-1] + corner[:-1, :-1]
    areas = np.outer(np.diff(ys), np.diff(xs))
    return sums / areas


def dhash_array(arr: np.ndarray) -> tuple[int, int]:
    """dHash of an (h, w[, c]) uint8 array → two unsigned 32-bit halves
    (little bit order: bit index by*8+bx, left-to-right gradients).
    Any h >= 8, w >= 9 is accepted (integral-image box means)."""
    g = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    boxes = _box_means(g)
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
    + hash inside one Arrow pass, one file per task row.  A file that
    fails to decode (or is smaller than the box grid) is skipped, not
    fatal — same per-file degrade as the media channel-stats kernel."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    h1, h2 = dhash_array(decode_media(bytes(content)))
                except Exception:
                    continue
                rows.append({"media_id": int(mid), "h1": h1, "h2": h2})
            yield pd.DataFrame(rows, columns=["media_id", "h1", "h2"])

    return media.mapInPandas(kernel, schema=_HASH_SCHEMA)


def _win_capped(bands: DataFrame, max_df: int) -> DataFrame:
    """Drop band buckets present in more than ``max_df`` images — as
    ONE window pass (dense_rank max = distinct count) instead of a
    groupBy + semi-join back: the join formulation evaluates the whole
    decode+hash subtree once per side (measured 2.5× slower on the 10×
    twin), and the window's (band, bv) partitioning is exactly what the
    candidate join needs next, so no extra exchange."""
    w = Window.partitionBy("band", "bv")
    return (
        bands.withColumn("_dr", F.dense_rank().over(w.orderBy("media_id")))
        .withColumn("_df", F.max("_dr").over(w))
        .filter(F.col("_df") <= max_df)
        .drop("_dr", "_df")
    )


def dhash_neardup(
    hashes: DataFrame, max_hamming: int = 6, max_df: int = MAX_DF
) -> DataFrame:
    """(img_a, img_b, hamming) pairs within ``max_hamming`` bits.

    Candidates from an 8×8-bit band equi-join: a pair at hamming d
    differs in at most d bands, so for d <= 7 at least one of the 8
    band keys matches (pigeonhole) — full recall at any
    ``max_hamming`` <= 7, which covers the default of 6.

    HOT-BUCKET CAP (the ``winnow.py:MAX_DF`` discipline): band keys
    present in more than ``max_df`` images are dropped BEFORE the join.
    Natural-image corpora skew hard onto a few gradient patterns
    (smooth sky/ground shares band values), and a bucket of f images
    contributes f² candidate pairs — at 100M images a handful of hot
    buckets go quadratic without the cap.  Pairs surviving in ANY
    uncapped bucket keep the pigeonhole recall guarantee."""
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"banded candidate generation guarantees recall only to "
            f"hamming {N_BANDS - 1}; got max_hamming={max_hamming}"
        )
    bands = _win_capped(_hash_bands(hashes), max_df)
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


def _hash_bands(hashes: DataFrame) -> DataFrame:
    """(media_id, h1, h2, band, bv) — each image's 8 band keys."""
    band_structs = []
    for i in range(N_BANDS):
        half = F.col("h1") if i < 4 else F.col("h2")
        shift = (i % 4) * 8
        band_structs.append(
            F.struct(
                F.lit(i).alias("band"),
                ((half / (1 << shift)).cast("bigint") % 256).alias("bv"),
            )
        )
    return hashes.select(
        "media_id", "h1", "h2", F.explode(F.array(*band_structs)).alias("s")
    ).select("media_id", "h1", "h2", "s.band", "s.bv")


def dhash_band_store(media: DataFrame, max_df: int = MAX_DF) -> DataFrame:
    """The persisted image-fingerprint store: banded dHash rows with hot
    buckets already dropped — written once per ingested batch, bucketed
    by (band, bv) on disk, so tomorrow's probe needs no corpus-side
    shuffle and never re-decodes stored images (the audio/text band
    store discipline for images)."""
    return _win_capped(_hash_bands(dhash_images(media)), max_df)


def dhash_incremental_neardup(
    batch_media: DataFrame, store: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Probe NEW images against the persisted store: one row per batch
    image — (img, is_dup, n_store_hits, dup_of, min_hamming).  Only the
    batch decodes; the store is pre-banded and pre-capped.  Sentinels
    (-1) instead of NULLs for miss rows."""
    hashes = dhash_images(batch_media)
    probe = _hash_bands(hashes).select(
        F.col("media_id").alias("img"),
        F.col("h1").alias("h1p"),
        F.col("h2").alias("h2p"),
        "band",
        "bv",
    )
    ham = F.expr("bit_count(h1p ^ h1) + bit_count(h2p ^ h2)")
    hits = (
        probe.join(store, ["band", "bv"])
        .select("img", F.col("media_id").alias("store_id"), ham.alias("h"))
        .filter(F.col("h") <= max_hamming)
    )
    per_img = hits.groupBy("img").agg(
        F.countDistinct("store_id").alias("n_store_hits"),
        F.min("store_id").alias("dup_of"),
        F.min("h").alias("min_hamming"),
    )
    ids = batch_media.select(F.col("media_id").alias("img")).distinct()
    return ids.join(per_img, "img", "left").select(
        "img",
        F.col("n_store_hits").isNotNull().cast("int").alias("is_dup"),
        F.coalesce("n_store_hits", F.lit(0)).cast("bigint").alias("n_store_hits"),
        F.coalesce("dup_of", F.lit(-1)).cast("bigint").alias("dup_of"),
        F.coalesce("min_hamming", F.lit(-1)).cast("int").alias("min_hamming"),
    )


# ----------------------------------------------------------- check --

_PH_N_PAIR = 8   # 16 images: mates 2k / 2k+1 differ by a +3 shift
_PH_H, _PH_W = 32, 36
_PH_MAX_DF = 12       # check-scale hot-bucket cap
_PH_MAX_DF_10X = 64   # 10x twin: copy groups put 20 images per bucket


def _ph_pixels(i: int) -> np.ndarray:
    """Image i: k-keyed gradient ramp; 2k+1 mates add a +3 brightness
    shift.  Ids ≥ 100 are mate-less NOVEL images (k = 20 + (i−100))
    for the incremental-probe fixture."""
    if i >= 100:
        k, m = 20 + (i - 100), 0
    else:
        k, m = divmod(i, 2)
    v = np.fromfunction(
        lambda y, x: (k * 37 + y * 5 + x * 11) % 200 + m * 3, (_PH_H, _PH_W)
    )
    return np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)


def _ph_oracle(n_images: int, max_df: int = _PH_MAX_DF) -> str:
    return f"""
        WITH px AS (
            SELECT i.i AS img, y.y AS y, x.x AS x,
                   CAST((i.i // 2 * 37 + y.y * 5 + x.x * 11) % 200
                        + (i.i % 2) * 3 AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {n_images})) AS i) i,
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
                   CAST((CASE WHEN band < 4 THEN h1 ELSE h2 END
                         // (1::BIGINT << ((band % 4) * 8))) AS BIGINT) % 256 AS bv
            FROM hs, (SELECT unnest(range(0, {N_BANDS})) AS band) bs),
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
               CAST(bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 6
        ORDER BY img_a, img_b"""


@check("image_dhash_neardup", oracle=_ph_oracle(2 * _PH_N_PAIR))
def q_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG bytes through decode → dHash → banded hamming pairs.
    Mates (2k, 2k+1) differ by a constant +3 brightness shift, which
    preserves every gradient sign — each pair MUST surface with
    hamming 0, which the content hash (different bytes) cannot see."""
    media = _gen_ph_png(spread(spark.range(2 * _PH_N_PAIR)))
    pairs = dhash_neardup(dhash_images(media), max_hamming=6, max_df=_PH_MAX_DF)
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


# -------------------------------------------- incremental store probe --

_PH_NOVEL = 3
_PH_INC_IDS = (
    f"SELECT unnest(range(0, {2 * _PH_N_PAIR})) AS i"
    f" UNION ALL SELECT unnest(range(100, {100 + _PH_NOVEL})) AS i"
)


@check(
    "image_dhash_incremental",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS img, y.y AS y, x.x AS x,
                   CAST(((CASE WHEN i.i >= 100 THEN 20 + (i.i - 100)
                               ELSE CAST(i.i // 2 AS BIGINT) END) * 37
                         + y.y * 5 + x.x * 11) % 200
                        + (CASE WHEN i.i >= 100 THEN 0 ELSE i.i % 2 END) * 3
                        AS DOUBLE) AS v
            FROM ({_PH_INC_IDS}) i,
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
                   CAST((CASE WHEN band < 4 THEN h1 ELSE h2 END
                         // (1::BIGINT << ((band % 4) * 8))) AS BIGINT) % 256 AS bv
            FROM hs, (SELECT unnest(range(0, {N_BANDS})) AS band) bs),
        store AS (
            SELECT b.* FROM bands b
            JOIN (SELECT band, bv FROM bands
                  WHERE img < 100 AND img % 2 = 0
                  GROUP BY band, bv
                  HAVING COUNT(DISTINCT img) <= {_PH_MAX_DF}) r USING (band, bv)
            WHERE b.img < 100 AND b.img % 2 = 0),
        probe AS (
            SELECT img, h1 AS h1p, h2 AS h2p, band, bv FROM bands
            WHERE img >= 100 OR img % 2 = 1),
        hits AS (
            SELECT p.img, s.img AS store_id,
                   bit_count(xor(p.h1p, s.h1)) + bit_count(xor(p.h2p, s.h2)) AS h
            FROM probe p JOIN store s USING (band, bv)
            WHERE bit_count(xor(p.h1p, s.h1)) + bit_count(xor(p.h2p, s.h2)) <= 6),
        per_img AS (
            SELECT img, COUNT(DISTINCT store_id) AS n_store_hits,
                   MIN(store_id) AS dup_of, MIN(h) AS min_hamming
            FROM hits GROUP BY img)
        SELECT i.i AS img,
               CAST(CASE WHEN pi.img IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup,
               CAST(COALESCE(pi.n_store_hits, 0) AS BIGINT) AS n_store_hits,
               CAST(COALESCE(pi.dup_of, -1) AS BIGINT) AS dup_of,
               CAST(COALESCE(pi.min_hamming, -1) AS INT) AS min_hamming
        FROM ({_PH_INC_IDS}) i
        LEFT JOIN per_img pi ON pi.img = i.i
        WHERE i.i >= 100 OR i.i % 2 = 1
        ORDER BY img""",
)
def q_image_dhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-ingest runtime for images: the store holds the base
    (even-id) images banded and capped; the batch decodes the +3-shift
    mates (each must hit its base at hamming 0) plus 3 novel ramps —
    two of which legitimately near-match stored ramps at hamming 4-5
    (dHash sees gradient structure, and ramps are periodic mod 200)
    while the third misses.  Only the batch side decodes."""
    store_ids = [i for i in range(2 * _PH_N_PAIR) if i % 2 == 0]
    batch_ids = [i for i in range(2 * _PH_N_PAIR) if i % 2 == 1] + [
        100 + j for j in range(_PH_NOVEL)
    ]
    store_media = _gen_ph_png(
        spread(spark.createDataFrame([(int(i),) for i in store_ids], "id long"))
    )
    batch_media = _gen_ph_png(
        spread(spark.createDataFrame([(int(i),) for i in batch_ids], "id long"))
    )
    store = dhash_band_store(store_media, max_df=_PH_MAX_DF)
    return dhash_incremental_neardup(batch_media, store).orderBy("img")


# ------------------------------------------------- 10x stress twin --

_PH_COPIES = 10


@check(
    "image_dhash_neardup_10x",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS img, y.y AS y, x.x AS x,
                   CAST(((i.i % {2 * _PH_N_PAIR}) // 2 * 37 + y.y * 5 + x.x * 11) % 200
                        + ((i.i % {2 * _PH_N_PAIR}) % 2) * 3 AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {2 * _PH_N_PAIR * _PH_COPIES})) AS i) i,
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
                   CAST((CASE WHEN band < 4 THEN h1 ELSE h2 END
                         // (1::BIGINT << ((band % 4) * 8))) AS BIGINT) % 256 AS bv
            FROM hs, (SELECT unnest(range(0, {N_BANDS})) AS band) bs),
        rare AS (
            SELECT band, bv FROM bands
            GROUP BY band, bv HAVING COUNT(DISTINCT img) <= {_PH_MAX_DF_10X}),
        kept AS (SELECT b.* FROM bands b JOIN rare USING (band, bv)),
        cand AS (
            SELECT DISTINCT a.img AS img_a, b.img AS img_b,
                   a.h1 AS h1a, a.h2 AS h2a, b.h1 AS h1b, b.h2 AS h2b
            FROM kept a JOIN kept b
              ON a.band = b.band AND a.bv = b.bv AND a.img < b.img),
        pairs AS (
            SELECT img_a, img_b,
                   bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) AS hamming
            FROM cand
            WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 6)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(COUNT(DISTINCT img_a) AS BIGINT) AS n_lhs
        FROM pairs""",
)
def q_image_dhash_neardup_10x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dHash pipeline at 10× media mass (the multimodal sibling of
    ``delta_adds_10x``/``lm_doc_perplexity_10x``): 160 PNGs — 10 re-keyed
    copies of each fixture image — through decode, hashing, and the
    banded join.  Decode work is 10× (linear, one file per task); every
    copy group collapses to hamming-0 pairs, so the candidate join is
    also stress-tested with genuinely hot buckets.  Output is the pair
    accounting (full pair list is copies²-sized by construction)."""
    n = 2 * _PH_N_PAIR * _PH_COPIES
    ids = spread(spark.range(n))
    media = _gen_ph_png_mod(ids)
    pairs = dhash_neardup(
        dhash_images(media), max_hamming=6, max_df=_PH_MAX_DF_10X
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0)).cast("bigint").alias("n_exact"),
        F.countDistinct("img_a").cast("bigint").alias("n_lhs"),
    )


def _gen_ph_png_mod(ids: DataFrame) -> DataFrame:
    """PNG bytes for media_id i rendering fixture image i % 16."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.png import encode_png

        for pdf in it:
            rows = [
                {
                    "media_id": int(i),
                    "content": encode_png(_ph_pixels(int(i) % (2 * _PH_N_PAIR))),
                }
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


# --------------------------------------------- dup-cluster assignment --

_CL_GROUPS = 12  # group g holds (g % 3) + 1 variants of one image


def _cl_pixels(i: int) -> "np.ndarray":
    """Group g raises the box columns named by the set bits of g+1 by
    +60 — distinct column subsets keep inter-group hamming ≥ 8 (> the
    6 threshold; a plain ramp-offset family collides at 12 groups),
    while the +3 per-variant shift keeps intra-group hamming at 0."""
    g, m = divmod(i, 3)
    v = np.fromfunction(
        lambda y, x: (g * 37 + y * 5 + x * 11) % 160 + m * 3
        + 60.0 * ((g + 1) >> (x // 4).astype(int) & 1),
        (_PH_H, _PH_W),
    )
    return np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)


def image_dup_clusters(pairs: DataFrame) -> DataFrame:
    """(img, cluster, cluster_size) over the near-dup pair graph — the
    step AFTER pair detection every dedup pipeline needs (keep one
    representative per CLUSTER, not per pair: A~B and B~C must collapse
    to one group even when A~C never surfaced).  Reuses the HashMin
    superstep loop shared with the webgraph family
    (``text/linkgraph.py:components_over_edges``) — pair edges in,
    min-member labels out, multi-hop transitivity pytest-pinned there."""
    from pyspark.sql import Window

    from dronedb_spark.text.linkgraph import components_over_edges

    und = pairs.select(
        F.col("img_a").alias("u"), F.col("img_b").alias("v")
    ).distinct()
    labels = components_over_edges(und)
    return labels.select(
        F.col("domain").alias("img"),
        F.col("component").alias("cluster"),
        F.count(F.lit(1))
        .over(Window.partitionBy("component"))
        .cast("bigint")
        .alias("cluster_size"),
    )


def _cl_expected_rows() -> list[tuple[int, int, int]]:
    rows = []
    for g in range(_CL_GROUPS):
        s = (g % 3) + 1
        if s >= 2:
            rows += [(3 * g + m, 3 * g, s) for m in range(s)]
    return rows


@check(
    "image_dup_clusters",
    oracle="""
        SELECT CAST(img AS BIGINT) AS img,
               CAST(cluster AS BIGINT) AS cluster,
               CAST(cluster_size AS BIGINT) AS cluster_size
        FROM (VALUES {values}) AS t(img, cluster, cluster_size)
        ORDER BY img""".format(
        values=", ".join(f"({i}, {c}, {s})" for i, c, s in _cl_expected_rows())
    ),
)
def q_image_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG bytes → decode → dHash → banded pairs → HashMin
    clusters: variant groups of size 2 and 3 (brightness-shifted
    copies, singletons absent from the pair graph) must come back as
    min-member-labeled clusters with exact sizes — the group structure
    is closed-form from the fixture, stated literally by the oracle."""
    ids = spark.range(3 * _CL_GROUPS).filter(
        F.expr("id % 3 < (id DIV 3) % 3 + 1")
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.png import encode_png

        for pdf in it:
            rows = [
                {"media_id": int(i), "content": encode_png(_cl_pixels(int(i)))}
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = spread(ids).mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    pairs = dhash_neardup(dhash_images(media), max_hamming=6, max_df=_PH_MAX_DF)
    return image_dup_clusters(pairs).orderBy("img")
