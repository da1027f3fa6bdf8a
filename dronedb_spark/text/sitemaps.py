"""Sitemap ingestion → crawl frontier — the discovery half of the
crawl front door (robots.txt is the permission half,
``text/robots.py``): parse REAL sitemap.xml / sitemapindex.xml bytes
(sitemaps.org protocol 0.9), resolve index files to the child
sitemaps they reference (an unreferenced child file contributes
NOTHING — crawlers only fetch what an index or a robots directive
points at), canonicalize the advertised URLs, gate them through the
robots verdicts, drop what the crawl has already seen, and rank the
remainder per host by (priority, lastmod) into a fetch frontier.

Beyond the reference (no crawl surface).  Scale shape: sitemap bytes
are crawl-metadata-sized (kilobytes per host) — parsing is one file
per task through an Arrow kernel; the only corpus-sized work is the
seen-set anti-join, which joins on the canonical-URL key the URL
dedup family already shuffles by (``text/urls.py``).  Rules and
entries broadcast.

Frontier row: (host, canonical_url, lastmod_s, priority_micro,
allowed, is_new, fetch_rank) — rank assigned only to allowed+new
entries, −1 otherwise; lastmod defaults to −1, priority to the
protocol's 0.5 default (500000 micro).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import barrier_persist, load
from dronedb_spark.text.robots import (
    _RAW_HOST,
    _robots_root,
    _rules_values_sql,
    parse_robots,
    robots_allowed,
)
from dronedb_spark.text.urls import _CANON, _D_PARTS, _HOST, _derived_url_sql, with_url

DEFAULT_PRIORITY_MICRO = 500_000  # the protocol's 0.5 default

_ENTRY_SCHEMA = (
    "host string, file_name string, kind string, loc string,"
    " lastmod_s bigint, priority_micro bigint"
)


def _lastmod_epoch_s(text: str | None) -> int:
    """W3C date (YYYY-MM-DD; time-of-day variants truncate to the day)
    → UTC-midnight epoch seconds; missing/unparseable/pre-epoch → −1
    (a pre-1970 lastmod is garbage data, and a negative epoch would
    collide with the missing sentinel the ranking treats as oldest —
    hypothesis-found, tests/test_fuzz_sitemaps.py)."""
    if not text:
        return -1
    try:
        d = _dt.date.fromisoformat(text.strip()[:10])
    except ValueError:
        return -1
    s = (d.toordinal() - _dt.date(1970, 1, 1).toordinal()) * 86400
    return s if s >= 0 else -1


def parse_sitemap_text(host: str, file_name: str, text: str) -> list[dict]:
    """Pure single-file parse (fuzzable without Spark): sitemap XML →
    entry rows.  ``kind`` is 'url' for <urlset> members and 'ref' for
    <sitemapindex> members (loc = the referenced child sitemap URL)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return []

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    rows: list[dict] = []
    root_kind = local(root.tag)
    for child in root:
        if local(child.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = priority = None
        for f in child:
            name = local(f.tag)
            if name == "loc":
                loc = (f.text or "").strip()
            elif name == "lastmod":
                lastmod = f.text
            elif name == "priority":
                priority = f.text
        if not loc:
            continue
        try:
            pr = int(round(float(priority) * 1_000_000)) if priority else DEFAULT_PRIORITY_MICRO
        except ValueError:
            pr = DEFAULT_PRIORITY_MICRO
        rows.append(
            {
                "host": host,
                "file_name": file_name,
                "kind": "ref" if root_kind == "sitemapindex" else "url",
                "loc": loc,
                "lastmod_s": _lastmod_epoch_s(lastmod),
                "priority_micro": pr,
            }
        )
    return rows


def parse_sitemaps(files: DataFrame) -> DataFrame:
    """(file_name, content) → entry rows.  The host is the file-name
    prefix (``<host>.<rest>.xml`` — a crawler stores fetched sitemaps
    per host, the robots.txt storage convention)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for name, content in zip(pdf["file_name"], pdf["content"]):
                name = str(name)
                host = name.split(".sitemap", 1)[0]
                rows.extend(
                    parse_sitemap_text(
                        host, name, bytes(content).decode("utf-8", "replace")
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "host",
                    "file_name",
                    "kind",
                    "loc",
                    "lastmod_s",
                    "priority_micro",
                ],
            )

    return files.mapInPandas(kernel, schema=_ENTRY_SCHEMA)


def eligible_entries(parsed: DataFrame) -> DataFrame:
    """URL entries from ROOT files (``<host>.sitemap.xml`` /
    ``<host>.sitemapindex.xml``) plus url entries of child files an
    index REFERENCES (child file name = ``<host>.<loc basename>``);
    unreferenced child files drop."""
    is_root = (F.col("file_name") == F.concat("host", F.lit(".sitemap.xml"))) | (
        F.col("file_name") == F.concat("host", F.lit(".sitemapindex.xml"))
    )
    # the parse pipeline feeds refs AND urls AND (downstream) two join
    # branches — without a barrier the XML kernel re-executes per branch
    # (measured 4-5x on the full frontier; crawl-metadata-sized, cheap)
    parsed = barrier_persist(parsed)
    refs = (
        parsed.filter((F.col("kind") == "ref") & is_root)
        .select(
            "host",
            F.concat(
                "host", F.lit("."), F.substring_index("loc", "/", -1)
            ).alias("file_name"),
        )
        .distinct()
    )
    urls = parsed.filter(F.col("kind") == "url")
    from_roots = urls.filter(is_root)
    from_children = urls.join(F.broadcast(refs), ["host", "file_name"], "left_semi")
    return from_roots.unionByName(from_children)


def sitemap_frontier(
    entries: DataFrame, seen_canonicals: DataFrame, rules: DataFrame
) -> DataFrame:
    """Entries + the crawl's seen set (1 canonical_url column) + robots
    rules → the ranked frontier (see module docstring)."""
    u = entries.select(
        "loc",
        "lastmod_s",
        "priority_micro",
        F.col("loc").alias("url"),
    )
    rest = "substring_index(substring_index(url, '#', 1), '://', -1)"
    raw_path = (
        f"substring_index(substring({rest},"
        f" length(substring_index({rest}, '/', 1)) + 1), '?', 1)"
    )
    canon = barrier_persist(
        u.select(
            "loc",
            "lastmod_s",
            "priority_micro",
            F.expr(_HOST).alias("chost"),
            F.expr(_CANON).alias("canonical_url"),
            F.expr(_RAW_HOST).alias("rhost"),
            F.expr(raw_path).alias("rpath"),
        )
    )  # verdicts and the flag join both read canon — one parse, not two
    verd = robots_allowed(
        canon.select(
            F.col("loc").alias("doc_id"),
            F.col("rhost").alias("host"),
            F.col("rpath").alias("path"),
        ),
        rules,
    ).select(F.col("doc_id").alias("loc"), "allowed")
    seen = seen_canonicals.select("canonical_url").distinct().withColumn(
        "_seen", F.lit(1)
    )
    flagged = (
        canon.join(F.broadcast(verd), "loc")
        .join(seen, "canonical_url", "left")
        .select(
            F.col("chost").alias("host"),
            "canonical_url",
            "lastmod_s",
            "priority_micro",
            "allowed",
            F.when(F.col("_seen").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_new"),
        )
    )
    w = Window.partitionBy("host").orderBy(
        F.desc("priority_micro"), F.desc("lastmod_s"), "canonical_url"
    )
    eligible = (
        flagged.filter((F.col("allowed") == 1) & (F.col("is_new") == 1))
        .withColumn("fetch_rank", F.row_number().over(w).cast("bigint"))
        .select("canonical_url", "fetch_rank")
    )
    return flagged.join(eligible, "canonical_url", "left").select(
        "host",
        "canonical_url",
        "lastmod_s",
        "priority_micro",
        "allowed",
        "is_new",
        F.coalesce("fetch_rank", F.lit(-1)).cast("bigint").alias("fetch_rank"),
    )


# ------------------------------------------------------------ fixture --
#
# Entry spec: (file, loc, lastmod, priority).  site1 exercises robots
# allow/disallow + a seen URL (doc_id 1's canonical) + a www variant;
# site4 exercises the index → children resolution plus an ORPHAN child
# that must drop; site9 has no robots.txt (default-allow) and a
# default-priority/lastmod entry.  doc 102 makes site4's /src2/p4 a
# seen canonical (102%20=2 → src2, 102%7=4, 102² %10 = 4, even →
# trailing slash).

_SM_FILES: dict[str, list[tuple[str, str | None, str | None]]] = {
    "site1.example.com.sitemap.xml": [
        ("https://site1.example.com/src1/p1?b=2&a=1&utm_campaign=x",
         "2026-01-02", "0.5"),
        ("https://site1.example.com/src1/p6", "2026-01-05", "0.9"),
        ("https://www.site1.example.com/new/a/", "2026-01-04", "0.8"),
        ("https://site1.example.com/new/b", None, None),
    ],
    "site4.example.com.sitemapindex.xml": [
        ("https://site4.example.com/sitemap_a.xml", "2026-01-08", None),
        ("https://site4.example.com/sitemap_b.xml", "2026-01-08", None),
    ],
    "site4.example.com.sitemap_a.xml": [
        ("https://site4.example.com/src2/p1", "2026-01-06", "0.7"),
        ("https://site4.example.com/src2/p4?utm_source=x", "2026-01-07", "0.6"),
    ],
    "site4.example.com.sitemap_b.xml": [
        ("https://site4.example.com/fresh/x", "2026-01-01", "1.0"),
        ("https://site4.example.com/fresh/y", None, None),
    ],
    "site4.example.com.sitemap_orphan.xml": [
        ("https://site4.example.com/orphan/z", "2026-01-09", "1.0"),
    ],
    "site9.example.com.sitemap.xml": [
        ("http://site9.example.com:80/alpha?utm_source=t", "2026-02-01", "0.3"),
        ("https://site9.example.com/beta", None, "0.2"),
    ],
}


def _sm_xml(fname: str) -> str:
    from xml.sax.saxutils import escape

    is_index = fname.endswith(".sitemapindex.xml")
    tag, item = ("sitemapindex", "sitemap") if is_index else ("urlset", "url")
    body = []
    for loc, lastmod, priority in _SM_FILES[fname]:
        fields = [f"<loc>{escape(loc)}</loc>"]  # & in query strings must entity-escape
        if lastmod:
            fields.append(f"<lastmod>{lastmod}</lastmod>")
        if priority:
            fields.append(f"<priority>{priority}</priority>")
        body.append(f"  <{item}>{''.join(fields)}</{item}>")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<{tag} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(body)
        + f"\n</{tag}>\n"
    )


def _sitemaps_root() -> str:
    import os

    root = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "tests", "fixtures",
            "sitemaps_v1",
        )
    )
    os.makedirs(root, exist_ok=True)
    for fname in _SM_FILES:
        payload = _sm_xml(fname).encode()
        p = os.path.join(root, fname)
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


def _sm_values_sql() -> str:
    """The fixture's ELIGIBLE url entries as literals (the orphan file's
    entry is deliberately absent — a Spark side that fails to resolve
    index references would emit an extra row and mismatch)."""
    vals = []
    for fname, entries in _SM_FILES.items():
        if fname.endswith(".sitemapindex.xml"):
            continue
        if "orphan" in fname:
            continue
        for loc, lastmod, priority in entries:
            lm = _lastmod_epoch_s(lastmod)
            pr = (
                int(round(float(priority) * 1_000_000))
                if priority
                else DEFAULT_PRIORITY_MICRO
            )
            vals.append(f"('{loc}', CAST({lm} AS BIGINT), CAST({pr} AS BIGINT))")
    return ", ".join(vals)


@check(
    "sitemap_frontier_plan",
    oracle=f"""
        WITH sm(loc, lastmod_s, priority_micro) AS (VALUES {_sm_values_sql()}),
        urls AS (
            SELECT 'seen' AS side, NULL AS lastmod_s, NULL AS priority_micro,
                   {_derived_url_sql("duckdb")} AS url
            FROM documents
            UNION ALL
            SELECT 'sm', lastmod_s, priority_micro, loc FROM sm),
        {_D_PARTS},
        seen AS (
            SELECT DISTINCT canonical_url FROM final WHERE side = 'seen'),
        sme AS (
            SELECT host AS chost, canonical_url, lastmod_s, priority_micro,
                   lower(split_part(hostport, ':', 1)) AS rhost,
                   path0 AS rpath
            FROM final WHERE side = 'sm'),
        rules(rhost, rule, rule_path) AS (VALUES {_rules_values_sql()}),
        cand AS (
            SELECT s.canonical_url, r.rule, length(r.rule_path) AS plen
            FROM sme s LEFT JOIN rules r
              ON r.rhost = s.rhost AND starts_with(s.rpath, r.rule_path)),
        best AS (
            SELECT canonical_url,
                   MAX(CASE WHEN rule IS NOT NULL THEN
                       plen * 2 + CASE WHEN rule = 'allow' THEN 1 ELSE 0 END
                       END) AS score,
                   MAX(CASE WHEN rule = 'allow' THEN plen * 2 + 1 END)
                       AS best_allow
            FROM cand GROUP BY canonical_url),
        flagged AS (
            SELECT s.chost AS host, s.canonical_url,
                   CAST(s.lastmod_s AS BIGINT) AS lastmod_s,
                   CAST(s.priority_micro AS BIGINT) AS priority_micro,
                   CAST(CASE WHEN b.score IS NULL OR b.best_allow = b.score
                             THEN 1 ELSE 0 END AS BIGINT) AS allowed,
                   CAST(CASE WHEN sn.canonical_url IS NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS is_new
            FROM sme s
            JOIN best b ON b.canonical_url = s.canonical_url
            LEFT JOIN seen sn ON sn.canonical_url = s.canonical_url),
        ranked AS (
            SELECT canonical_url,
                   ROW_NUMBER() OVER (PARTITION BY host
                       ORDER BY priority_micro DESC, lastmod_s DESC,
                                canonical_url) AS fetch_rank
            FROM flagged WHERE allowed = 1 AND is_new = 1)
        SELECT f.host, f.canonical_url, f.lastmod_s, f.priority_micro,
               f.allowed, f.is_new,
               CAST(COALESCE(r.fetch_rank, -1) AS BIGINT) AS fetch_rank
        FROM flagged f LEFT JOIN ranked r
          ON r.canonical_url = f.canonical_url
        ORDER BY 1, 2""",
)
def q_sitemap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL sitemap/sitemapindex bytes → index-resolved entries →
    canonicalized, robots-gated (real robots.txt fixture bytes),
    seen-set-pruned, priority-ranked fetch frontier for three hosts."""
    from dronedb_spark.sources.bridge import scan_binaries
    from dronedb_spark.tables import spread
    from dronedb_spark.text.urls import canonicalize

    sm_files = scan_binaries(spark, _sitemaps_root(), "*.xml")
    entries = eligible_entries(parse_sitemaps(spread(sm_files)))
    rb_files = scan_binaries(spark, _robots_root(), "*.robots.txt")
    rules = parse_robots(spread(rb_files))
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    seen = canonicalize(with_url(docs)).select("canonical_url")
    return sitemap_frontier(entries, seen, rules).orderBy(
        "host", "canonical_url"
    )
