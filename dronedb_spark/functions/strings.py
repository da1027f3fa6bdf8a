"""String scalar functions (SURVEY §2.7 string family) as column
expressions: slugify, MIME-from-extension, base64 asset ids.

Reference: slugify (stac.cpp:54-84), MIME map (stac.cpp:87-171), Base64
item ids (stac.cpp:447,569), URL-encode (stac.cpp:456).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, with_catalog
from dronedb_spark.suite import check

# extension → MIME (subset of the ~60 mappings at stac.cpp:87-171; same
# defaulting rule: unknown → application/octet-stream)
MIME_TYPES = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "webp": "image/webp",
    "bmp": "image/bmp",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "mp4": "video/mp4",
    "mov": "video/quicktime",
    "avi": "video/x-msvideo",
    "webm": "video/webm",
    "md": "text/markdown",
    "txt": "text/plain",
    "json": "application/json",
    "geojson": "application/geo+json",
    "xml": "application/xml",
    "kml": "application/vnd.google-earth.kml+xml",
    "kmz": "application/vnd.google-earth.kmz",
    "gpkg": "application/geopackage+sqlite3",
    "shp": "application/x-shapefile",
    "las": "application/vnd.las",
    "laz": "application/vnd.laszip",
    "ply": "application/vnd.ply",
    "obj": "model/obj",
    "gltf": "model/gltf+json",
    "glb": "model/gltf-binary",
    "pdf": "application/pdf",
}
DEFAULT_MIME = "application/octet-stream"


def slugify(col: Column) -> Column:
    """stac.cpp:54-84: lowercase; keep [a-z0-9_]; every other run of chars
    collapses to a single '-'; trim leading/trailing '-'."""
    lowered = F.lower(col)
    dashed = F.regexp_replace(lowered, r"[^a-z0-9_]+", "-")
    return F.regexp_replace(dashed, r"^-+|-+$", "")


def file_ext(col: Column) -> Column:
    """Lowercased extension without the dot; '' when none."""
    return F.when(
        F.instr(_basename(col), ".") > 0,
        F.lower(F.element_at(F.split(_basename(col), r"\."), -1)),
    ).otherwise(F.lit(""))


def _basename(col: Column) -> Column:
    return F.element_at(F.split(col, "/"), -1)


def mime_type(col: Column) -> Column:
    """MIME from extension via a literal map lookup (JVM-side)."""
    pairs = []
    for ext, m in MIME_TYPES.items():
        pairs.append(F.lit(ext))
        pairs.append(F.lit(m))
    mapping = F.create_map(*pairs)
    return F.coalesce(mapping.getItem(file_ext(col)), F.lit(DEFAULT_MIME))


def asset_id(col: Column) -> Column:
    """Base64 path id (stac.cpp:447,569)."""
    return F.base64(col.cast("binary"))


# ---------------------------------------------------------------- checks


def _mime_case_sql() -> str:
    whens = "\n".join(
        f"WHEN ext = '{ext}' THEN '{m}'" for ext, m in MIME_TYPES.items()
    )
    return f"CASE {whens} ELSE '{DEFAULT_MIME}' END"


@check(
    "stac_asset_fields",
    oracle=with_catalog(
        f"""SELECT path,
                  regexp_replace(regexp_replace(lower(path), '[^a-z0-9_]+', '-', 'g'),
                                 '^-+|-+$', '', 'g') AS slug,
                  {_mime_case_sql()} AS mime,
                  to_base64(CAST(path AS BLOB)) AS b64id
           FROM (
               SELECT path,
                      CASE WHEN strpos(fname, '.') > 0
                           THEN lower(string_split(fname, '.')[-1]) ELSE '' END AS ext
               FROM (SELECT path, string_split(path, '/')[-1] AS fname
                     FROM entries WHERE type <> 1) t
           ) e
           ORDER BY path"""
    ),
)
def q_stac_asset_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slug + MIME + base64 id per asset — the per-item field assembly of
    buildStacItem (stac.cpp:338-472)."""
    e = entries_df(spark, sf_dir).filter(F.col("type") != 1)
    p = F.col("path")
    return e.select(
        "path",
        slugify(p).alias("slug"),
        mime_type(p).alias("mime"),
        asset_id(p).alias("b64id"),
    ).orderBy("path")


def parse_tag(col: Column) -> Column:
    """W10 tag parsing (registryutils.cpp:30-96, tagmanager.cpp): tag →
    struct(registry_url, organization, dataset).

    Semantics mirrored: trim + lowercase + trailing-slash strip; dataset =
    last '/'-segment, organization = previous, registry = the rest
    (DEFAULT_REGISTRY 'hub.dronedb.app' when absent, constants.h:10);
    'https://' is prepended when the registry has no protocol; a tag with
    fewer than two segments is invalid → NULL struct (the reference
    throws).  Pure column ops — at scale this is codegen'd string work,
    no UDF."""
    t = F.regexp_replace(F.lower(F.trim(col)), "/+$", "")
    parts = F.split(t, "/")
    n = F.size(parts)
    dataset = F.element_at(parts, -1)
    organization = F.element_at(parts, -2)
    head = F.array_join(F.slice(parts, 1, n - 2), "/")
    registry = F.when(
        (n == 2) | (head == ""), F.lit("https://hub.dronedb.app")
    ).otherwise(
        F.when(
            head.startswith("http://") | head.startswith("https://"), head
        ).otherwise(F.concat(F.lit("https://"), head))
    )
    valid = (n >= 2) & (dataset != "") & (organization != "") & ~organization.contains(":")
    return F.when(
        valid,
        F.struct(
            registry.alias("registry_url"),
            organization.alias("organization"),
            dataset.alias("dataset"),
        ),
    )


@check(
    "tag_parse",
    oracle="""
        WITH tags AS (
            SELECT doc_id,
                   CASE (doc_id % 4)
                        WHEN 0 THEN 'MyOrg/MyDataset/'
                        WHEN 1 THEN source || '/ds_' || CAST(doc_id AS STRING)
                        WHEN 2 THEN 'hub.example.com/' || source || '/ds_' || CAST(doc_id AS STRING)
                        ELSE 'http://insecure.example.com/' || source || '/ds_' || CAST(doc_id AS STRING)
                   END AS tag
            FROM documents WHERE doc_id < 40),
        parts AS (
            SELECT doc_id, tag,
                   string_split(regexp_replace(lower(trim(tag)), '/+$', ''), '/') AS p
            FROM tags)
        SELECT doc_id, tag,
               CASE WHEN len(p) = 2 THEN 'https://hub.dronedb.app'
                    WHEN p[1] LIKE 'http:%' OR p[1] LIKE 'https:%'
                         THEN array_to_string(p[:len(p)-2], '/')
                    ELSE 'https://' || array_to_string(p[:len(p)-2], '/')
               END AS registry_url,
               p[len(p)-1] AS organization,
               p[len(p)] AS dataset
        FROM parts
        ORDER BY doc_id""",
)
def q_tag_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dronedb_spark.tables import load

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    tag = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("MyOrg/MyDataset/"))
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.col("source"), F.lit("/ds_"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("hub.example.com/"),
                F.col("source"),
                F.lit("/ds_"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://insecure.example.com/"),
                F.col("source"),
                F.lit("/ds_"),
                F.col("doc_id").cast("string"),
            )
        )
    )
    parsed = docs.select("doc_id", tag.alias("tag"), parse_tag(tag).alias("t"))
    return parsed.select(
        "doc_id", "tag", "t.registry_url", "t.organization", "t.dataset"
    ).orderBy("doc_id")
