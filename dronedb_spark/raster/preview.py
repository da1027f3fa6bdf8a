"""Orthographic splat previews — the Gaussian-splat thumbnail renderer
(reference: thumbs.cpp:1160-1275 rasterizeSplatPreview, fed by
generateSplatThumbFromRad at :1330 with the 2 coarsest RAD chunks and
by generateSplatThumb for .spz — both normalize to display-space
splats first, exactly the schema our RAD coarse table already emits).

Projection (mirrored op-for-op): the AABB's FLATTEST axis becomes
depth; the remaining two form the image plane (u = axis 1 when depth
is 0, else axis 0; v = axis 1 when depth is 2, else axis 2).  The
plane extent fits the thumb with aspect preserved and a 1-px margin,
centred; v flips so world-up is image-up.  Splats under 0.02 opacity
are skipped; each survivor draws a filled radius-⌊T/256⌉∈[1,8] circle
with a PER-PIXEL z-buffer (unlike the tiler's centre-buffered discs).

The reference resolves exact depth ties by draw order; here the
winner is the deterministic (depth, pid) max — identical except on
exact float depth ties.  Winners travel as fixed-width packed strings
(the ivf.py argmin discipline) so the DuckDB oracle agrees byte for
byte.

Scale: two passes — a 6-scalar AABB aggregate (broadcast back), then
explode-by-disc + one groupBy on the target pixel.  The explode factor
is the disc area (≤ ~200 at radius 8); at 100 TB of splats the coarse
chunks are the only input (constant per container), so preview cost is
bounded by catalog size, not splat count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check

MIN_OPACITY = 0.02


def _preview_radius(thumb_size: int) -> int:
    return max(1, min(8, round(thumb_size / 256.0)))


def _circle_offsets(radius: int) -> list[tuple[int, int]]:
    """Symmetric filled circle dx, dy ∈ [-r, r], dx²+dy²≤r²
    (thumbs.cpp:1252-1257 — NOT the tiler's asymmetric disc)."""
    return [
        (dx, dy)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if dx * dx + dy * dy <= radius * radius
    ]


def splat_preview(splats: DataFrame, thumb_size: int = 256) -> DataFrame:
    """Display-space splats (pid, x, y, z, r, g, b, a — the
    rad_coarse_table / splat-thumb schema) → sparse (px, py, r, g, b)
    u8 rows; unhit pixels are implicit alpha 0."""
    t = thumb_size
    radius = _preview_radius(t)
    ext = splats.agg(
        F.min("x").alias("mn0"), F.max("x").alias("mx0"),
        F.min("y").alias("mn1"), F.max("y").alias("mx1"),
        F.min("z").alias("mn2"), F.max("z").alias("mx2"),
    )
    # depth = flattest extent axis (strict <, earlier axis wins ties)
    sel = ext.selectExpr(
        "*",
        "mx0 - mn0 AS e0", "mx1 - mn1 AS e1", "mx2 - mn2 AS e2",
    ).selectExpr(
        "*",
        "CASE WHEN e2 < (CASE WHEN e1 < e0 THEN e1 ELSE e0 END) THEN 2 "
        "     WHEN e1 < e0 THEN 1 ELSE 0 END AS depth_axis",
    ).selectExpr(
        "*",
        "CASE depth_axis WHEN 0 THEN e1 ELSE e0 END AS eu",
        "CASE depth_axis WHEN 2 THEN e1 ELSE e2 END AS ev",
        "CASE depth_axis WHEN 0 THEN mn1 ELSE mn0 END AS mnu",
        "CASE depth_axis WHEN 2 THEN mn1 ELSE mn2 END AS mnv",
    ).selectExpr(
        "*",
        f"CASE WHEN eu > 0.0 THEN {t - 1}.0 / eu ELSE 0.0 END AS su",
        f"CASE WHEN ev > 0.0 THEN {t - 1}.0 / ev ELSE 0.0 END AS sv",
    ).selectExpr(
        "*",
        "CASE WHEN LEAST(CASE WHEN su > 0.0 THEN su ELSE sv END,"
        "                CASE WHEN sv > 0.0 THEN sv ELSE su END) <= 0.0 THEN 1.0 "
        "ELSE LEAST(CASE WHEN su > 0.0 THEN su ELSE sv END,"
        "           CASE WHEN sv > 0.0 THEN sv ELSE su END) END AS scale",
    ).selectExpr(
        "depth_axis", "mnu", "mnv", "scale",
        f"({t}.0 - eu * scale) / 2.0 AS offx",
        f"({t}.0 - ev * scale) / 2.0 AS offy",
    )
    p = splats.crossJoin(F.broadcast(sel)).filter(
        F.col("a") >= MIN_OPACITY
    ).selectExpr(
        "pid",
        "CASE depth_axis WHEN 0 THEN y ELSE x END AS u",
        "CASE depth_axis WHEN 2 THEN y ELSE z END AS v",
        "CASE depth_axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END AS d",
        "CAST(floor((CASE depth_axis WHEN 0 THEN y ELSE x END - mnu) * scale + offx) AS INT) AS cx",
        f"{t} - 1 - CAST(floor((CASE depth_axis WHEN 2 THEN y ELSE z END - mnv) * scale + offy) AS INT) AS cy",
        "CAST(floor(LEAST(GREATEST(r, 0.0), 1.0) * 255.0 + 0.5) AS INT) AS rb",
        "CAST(floor(LEAST(GREATEST(g, 0.0), 1.0) * 255.0 + 0.5) AS INT) AS gb",
        "CAST(floor(LEAST(GREATEST(b, 0.0), 1.0) * 255.0 + 0.5) AS INT) AS bb",
    )
    packed = (
        "lpad(CAST(CAST(floor(d * 1000.0 + 0.5) AS BIGINT) + 100000000 AS STRING), 10, '0')"
        " || lpad(CAST(pid AS STRING), 8, '0')"
        " || lpad(CAST(rb AS STRING), 3, '0') || lpad(CAST(gb AS STRING), 3, '0')"
        " || lpad(CAST(bb AS STRING), 3, '0')"
    )
    offs = splats.sparkSession.createDataFrame(
        _circle_offsets(radius), "dx int, dy int"
    )
    hit = p.crossJoin(F.broadcast(offs)).select(
        (F.col("cx") + F.col("dx")).alias("px"),
        (F.col("cy") + F.col("dy")).alias("py"),
        F.expr(packed).alias("w"),
    ).filter(
        (F.col("px") >= 0) & (F.col("px") < t)
        & (F.col("py") >= 0) & (F.col("py") < t)
    )
    win = F.max("w")
    return (
        hit.groupBy("px", "py")
        .agg(
            F.substring(win, 19, 3).cast("int").alias("r"),
            F.substring(win, 22, 3).cast("int").alias("g"),
            F.substring(win, 25, 3).cast("int").alias("b"),
        )
        .orderBy("py", "px")
    )


def splat_preview_png(splats: DataFrame, thumb_size: int = 256) -> bytes:
    """RGBA thumbnail bytes via the repo PNG encoder (RenderImage's
    3-band + alpha layout, thumbs.cpp:1203)."""
    import numpy as np

    from dronedb_spark.sources.png import encode_png

    arr = np.zeros((thumb_size, thumb_size, 4), dtype=np.uint8)
    for row in splat_preview(splats, thumb_size).collect():
        arr[row["py"], row["px"]] = (row["r"], row["g"], row["b"], 255)
    return encode_png(arr)


# ------------------------------------------------------------------ check

_SPLATS_SQL = """
    SELECT id AS pid,
           CAST((id * 17) % 97 AS DOUBLE) / 2.0 AS x,
           CAST((id * 29) % 83 AS DOUBLE) / 2.0 AS y,
           CAST((id * 7) % 11 AS DOUBLE) / 4.0 AS z,
           CAST((id * 37) % 256 AS DOUBLE) / 255.0 AS r,
           CAST((id * 59) % 256 AS DOUBLE) / 255.0 AS g,
           CAST((id * 83) % 256 AS DOUBLE) / 255.0 AS b,
           CASE WHEN id % 50 = 0 THEN 0.01
                ELSE 0.2 + CAST((id * 13) % 200 AS DOUBLE) / 250.0 END AS a
    FROM {ids}
"""
_SPLATS_N = 400


def _preview_oracle() -> str:
    t = 32
    radius = _preview_radius(t)
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _circle_offsets(radius))
    packed = (
        "lpad(CAST(CAST(floor(d * 1000.0 + 0.5) AS BIGINT) + 100000000 AS VARCHAR), 10, '0')"
        " || lpad(CAST(pid AS VARCHAR), 8, '0')"
        " || lpad(CAST(rb AS VARCHAR), 3, '0') || lpad(CAST(gb AS VARCHAR), 3, '0')"
        " || lpad(CAST(bb AS VARCHAR), 3, '0')"
    )
    return f"""
        WITH splats AS ({_SPLATS_SQL.format(ids=f'(SELECT range AS id FROM range({_SPLATS_N}))')}),
        ext AS (
            SELECT MIN(x) AS mn0, MAX(x) AS mx0, MIN(y) AS mn1, MAX(y) AS mx1,
                   MIN(z) AS mn2, MAX(z) AS mx2 FROM splats
        ),
        e1s AS (SELECT *, mx0 - mn0 AS e0, mx1 - mn1 AS e1, mx2 - mn2 AS e2 FROM ext),
        ax AS (
            SELECT *, CASE WHEN e2 < (CASE WHEN e1 < e0 THEN e1 ELSE e0 END) THEN 2
                           WHEN e1 < e0 THEN 1 ELSE 0 END AS depth_axis
            FROM e1s
        ),
        uv AS (
            SELECT *,
                   CASE depth_axis WHEN 0 THEN e1 ELSE e0 END AS eu,
                   CASE depth_axis WHEN 2 THEN e1 ELSE e2 END AS ev,
                   CASE depth_axis WHEN 0 THEN mn1 ELSE mn0 END AS mnu,
                   CASE depth_axis WHEN 2 THEN mn1 ELSE mn2 END AS mnv
            FROM ax
        ),
        sc0 AS (
            SELECT *,
                   CASE WHEN eu > 0.0 THEN {t - 1}.0 / eu ELSE 0.0 END AS su,
                   CASE WHEN ev > 0.0 THEN {t - 1}.0 / ev ELSE 0.0 END AS sv
            FROM uv
        ),
        sc AS (
            SELECT depth_axis, mnu, mnv, eu, ev,
                   CASE WHEN LEAST(CASE WHEN su > 0.0 THEN su ELSE sv END,
                                   CASE WHEN sv > 0.0 THEN sv ELSE su END) <= 0.0 THEN 1.0
                        ELSE LEAST(CASE WHEN su > 0.0 THEN su ELSE sv END,
                                   CASE WHEN sv > 0.0 THEN sv ELSE su END) END AS scale
            FROM sc0
        ),
        proj AS (
            SELECT pid,
                   CASE depth_axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END AS d,
                   CAST(floor((CASE depth_axis WHEN 0 THEN y ELSE x END - mnu) * scale
                        + ({t}.0 - eu * scale) / 2.0) AS INT) AS cx,
                   {t} - 1 - CAST(floor((CASE depth_axis WHEN 2 THEN y ELSE z END - mnv) * scale
                        + ({t}.0 - ev * scale) / 2.0) AS INT) AS cy,
                   CAST(floor(LEAST(GREATEST(r, 0.0), 1.0) * 255.0 + 0.5) AS INT) AS rb,
                   CAST(floor(LEAST(GREATEST(g, 0.0), 1.0) * 255.0 + 0.5) AS INT) AS gb,
                   CAST(floor(LEAST(GREATEST(b, 0.0), 1.0) * 255.0 + 0.5) AS INT) AS bb
            FROM splats CROSS JOIN sc WHERE a >= {MIN_OPACITY}
        ),
        offs(dx, dy) AS (VALUES {offs}),
        hit AS (
            SELECT cx + dx AS px, cy + dy AS py, {packed} AS w
            FROM proj CROSS JOIN offs
            WHERE cx + dx >= 0 AND cx + dx < {t} AND cy + dy >= 0 AND cy + dy < {t}
        )
        SELECT px, py,
               CAST(substr(MAX(w), 19, 3) AS INT) AS r,
               CAST(substr(MAX(w), 22, 3) AS INT) AS g,
               CAST(substr(MAX(w), 25, 3) AS INT) AS b
        FROM hit GROUP BY px, py ORDER BY py, px"""


@check("splat_preview_render", oracle=_preview_oracle())
def q_splat_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rasterizeSplatPreview end to end at 32px: flattest-axis depth
    pick, aspect-preserving centred fit, v flip, 0.02 opacity cutoff
    (the synthetic set includes sub-threshold splats), per-pixel
    (depth, pid)-max z-buffer, lround byte colours."""
    splats = spark.sql(_SPLATS_SQL.format(ids=f"range(0, {_SPLATS_N})"))
    return splat_preview(splats, 32)
