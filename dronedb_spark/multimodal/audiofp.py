"""Audio fingerprint near-dup — the audio member of the perceptual
dedup family (images: ``multimodal/phash.py`` dHash; text: MinHash /
SimHash).  Byte-identical audio is caught by the content hash;
re-encoded or gain-adjusted copies need a perceptual key.

Fingerprint = energy-gradient signs (a Haitsma-Kalker-style robust
hash, "A Highly Robust Audio Fingerprint System", ISMIR 2002, reduced
to the time-energy axis): the PCM stream splits into ``N_WIN`` fixed
windows, each window's INTEGER energy Σv² is exact, and bit w is
``energy[w+1] > energy[w]``.  Constant gain scales every energy by the
same factor, preserving all gradient signs — a louder copy maps to the
same fingerprint, which no content hash can see.

Scale design mirrors dHash exactly:

  * decode + fingerprint is one Arrow ``mapInPandas`` pass over the
    binary cells (numpy int64 energy sums, per-file catch-and-skip);
  * near-dup candidates come from a 3×5-bit band equi-self-join —
    pigeonhole guarantees full recall to hamming 2 — never all-pairs;
  * the exact hamming refine is JVM ``bit_count(xor)`` on candidates.
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

N_WIN = 16            # energy windows → N_WIN - 1 gradient bits
FP_BITS = N_WIN - 1
N_BANDS = 3           # 3 × 5-bit bands: recall guaranteed to hamming 2
BAND_BITS = 5


def audio_fingerprint(samples: np.ndarray) -> int:
    """15-bit energy-gradient fingerprint of a PCM int16 stream."""
    n = (samples.size // N_WIN) * N_WIN
    if n < N_WIN:
        raise ValueError(f"need at least {N_WIN} samples, got {samples.size}")
    v = samples[:n].astype(np.int64)
    energies = (v * v).reshape(N_WIN, n // N_WIN).sum(axis=1)
    bits = (energies[1:] > energies[:-1]).astype(np.int64)
    return int(sum(int(b) << w for w, b in enumerate(bits)))


_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fp", T.LongType()),
    ]
)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, fp) from (media_id, content) WAV bytes — decode +
    fingerprint in one Arrow pass; undecodable/too-short files skip."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.wav import decode_wav

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    _sr, samples = decode_wav(bytes(content))
                    fp = audio_fingerprint(samples)
                except Exception:
                    continue
                rows.append({"media_id": int(mid), "fp": fp})
            yield pd.DataFrame(rows, columns=["media_id", "fp"])

    return media.mapInPandas(kernel, schema=_FP_SCHEMA)


def audio_neardup(fps: DataFrame, max_hamming: int = 2) -> DataFrame:
    """(aud_a, aud_b, hamming) pairs within ``max_hamming`` bits via the
    banded equi-join (pigeonhole: d <= N_BANDS - 1 shares a band)."""
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"banding guarantees recall only to hamming {N_BANDS - 1}"
        )
    bands = fps.select(
        "media_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (
                            (F.col("fp") / (1 << (i * BAND_BITS))).cast("bigint")
                            % (1 << BAND_BITS)
                        ).alias("bv"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("s"),
    ).select("media_id", "fp", "s.band", "s.bv")
    a = bands.select(F.col("media_id").alias("aud_a"), F.col("fp").alias("fpa"), "band", "bv")
    b = bands.select(F.col("media_id").alias("aud_b"), F.col("fp").alias("fpb"), "band", "bv")
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("aud_a") < F.col("aud_b"))
        .select("aud_a", "aud_b", "fpa", "fpb")
        .distinct()
    )
    return cand.select(
        "aud_a", "aud_b", F.expr("bit_count(fpa ^ fpb)").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ----------------------------------------------------------- check --

_AFP_N_PAIR = 10          # 20 clips: mates 2k / 2k+1 differ by 2x gain
_AFP_LEN = 800            # samples per clip; 16 windows of 50


def _afp_samples(i: int) -> np.ndarray:
    """Clip 2k/2k+1: a k-dependent "frequency" (t*(13+2k) mod ramp) so
    distinct clips get distinct window-energy profiles; mates differ
    only by the 2x gain."""
    k, m = divmod(i, 2)
    t = np.arange(_AFP_LEN, dtype=np.int64)
    base = (t * (13 + 2 * k)) % 3001 - 1500
    return (base * (1 + m)).astype(np.int16)


@check(
    "audio_fp_neardup",
    oracle=f"""
        WITH s AS (
            SELECT i.i AS aud, t.t // {_AFP_LEN // N_WIN} AS w,
                   CAST(((t.t * (13 + 2 * (i.i // 2))) % 3001 - 1500)
                        * (1 + i.i % 2) AS BIGINT) AS v
            FROM (SELECT unnest(range(0, {2 * _AFP_N_PAIR})) AS i) i,
                 (SELECT unnest(range(0, {_AFP_LEN})) AS t) t),
        en AS (SELECT aud, w, SUM(v * v) AS e FROM s GROUP BY aud, w),
        bits AS (
            SELECT a.aud, a.w AS idx,
                   CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
            FROM en a JOIN en b ON b.aud = a.aud AND b.w = a.w + 1),
        fps AS (
            SELECT aud,
                   CAST(SUM(bit * (1::BIGINT << CAST(idx AS INT))) AS BIGINT) AS fp
            FROM bits GROUP BY aud),
        bands AS (
            SELECT aud, fp, band,
                   CAST(fp // (1::BIGINT << (band * {BAND_BITS})) AS BIGINT)
                       % {1 << BAND_BITS} AS bv
            FROM fps, (SELECT unnest(range(0, {N_BANDS})) AS band) bs),
        cand AS (
            SELECT DISTINCT a.aud AS aud_a, b.aud AS aud_b,
                   a.fp AS fpa, b.fp AS fpb
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv AND a.aud < b.aud)
        SELECT aud_a, aud_b,
               CAST(bit_count(xor(fpa, fpb)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(fpa, fpb)) <= 2
        ORDER BY aud_a, aud_b""",
)
def q_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PCM16 WAV bytes through decode → energy-gradient fingerprint
    → banded hamming pairs.  Mates (2k, 2k+1) differ by a 2× gain,
    which scales every window energy 4× and preserves every gradient
    sign — each pair MUST surface at hamming 0, invisible to the
    content hash (different bytes)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.wav import encode_wav

        for pdf in it:
            rows = [
                {"media_id": int(i), "content": encode_wav(_afp_samples(int(i)), 16000)}
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = spread(spark.range(2 * _AFP_N_PAIR)).mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    pairs = audio_neardup(audio_fingerprints(media), max_hamming=2)
    return pairs.select(
        "aud_a", "aud_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("aud_a", "aud_b")


# ------------------------------------------------- 10x stress twin --

_AFP_COPIES = 10


@check(
    "audio_fp_neardup_10x",
    oracle=f"""
        WITH s AS (
            SELECT i.i AS aud, t.t // {_AFP_LEN // N_WIN} AS w,
                   CAST(((t.t * (13 + 2 * ((i.i % {2 * _AFP_N_PAIR}) // 2)))
                         % 3001 - 1500)
                        * (1 + (i.i % {2 * _AFP_N_PAIR}) % 2) AS BIGINT) AS v
            FROM (SELECT unnest(range(0, {2 * _AFP_N_PAIR * _AFP_COPIES})) AS i) i,
                 (SELECT unnest(range(0, {_AFP_LEN})) AS t) t),
        en AS (SELECT aud, w, SUM(v * v) AS e FROM s GROUP BY aud, w),
        bits AS (
            SELECT a.aud, a.w AS idx,
                   CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
            FROM en a JOIN en b ON b.aud = a.aud AND b.w = a.w + 1),
        fps AS (
            SELECT aud,
                   CAST(SUM(bit * (1::BIGINT << CAST(idx AS INT))) AS BIGINT) AS fp
            FROM bits GROUP BY aud),
        bands AS (
            SELECT aud, fp, band,
                   CAST(fp // (1::BIGINT << (band * {BAND_BITS})) AS BIGINT)
                       % {1 << BAND_BITS} AS bv
            FROM fps, (SELECT unnest(range(0, {N_BANDS})) AS band) bs),
        cand AS (
            SELECT DISTINCT a.aud AS aud_a, b.aud AS aud_b,
                   a.fp AS fpa, b.fp AS fpb
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv AND a.aud < b.aud),
        pairs AS (
            SELECT aud_a, aud_b, bit_count(xor(fpa, fpb)) AS hamming
            FROM cand WHERE bit_count(xor(fpa, fpb)) <= 2)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(COUNT(DISTINCT aud_a) AS BIGINT) AS n_lhs
        FROM pairs""",
)
def q_audio_fp_neardup_10x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio fingerprint pipeline at 10× media mass — 200 WAV clips
    (10 re-keyed copies per fixture clip) through decode + the banded
    join: decode is linear (one file per task), and every copy group
    collapses to hamming-0 pairs, stress-testing genuinely hot band
    buckets (the ``image_dhash_neardup_10x`` pattern for audio)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.wav import encode_wav

        for pdf in it:
            rows = [
                {
                    "media_id": int(i),
                    "content": encode_wav(
                        _afp_samples(int(i) % (2 * _AFP_N_PAIR)), 16000
                    ),
                }
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = spread(spark.range(2 * _AFP_N_PAIR * _AFP_COPIES)).mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    pairs = audio_neardup(audio_fingerprints(media), max_hamming=2)
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0)).cast("bigint").alias("n_exact"),
        F.countDistinct("aud_a").cast("bigint").alias("n_lhs"),
    )
