"""Crawl → corpus, composed over REAL BYTES end to end: WARC response
records parse (``sources/warc.py``), their target URIs pass the RFC
9309 robots verdict (``text/robots.py`` — the etiquette gate a crawler
must apply even to pages it already fetched into an archive), the
allowed pages extract BLOCK-structured text (``html_to_blocks``), and
the C4 line/page rules (``text/c4.py``) gate what reaches the corpus.
One driver row accounts the whole funnel per host: fetched → allowed →
kept pages → retained lines/chars.

Each stage is already pinned alone; this row pins the COMPOSITION, the
way ``curation_pipeline_rollup`` pins the text-side chain.  The
fixture plants every branch: hosts with no robots (default-allow),
hosts whose rules kill most paths but Allow one back, a javascript nag
on every page (C4 must drop the line, never the page), and a lorem
paragraph on a (host+page) diagonal (C4 must drop those PAGES).

Scale shape: parse and extraction stay one-file-per-task Arrow work;
the robots rules broadcast; the C4 gate is the zero-shuffle projection
it always is; the only exchanges are the per-URL best-rule aggregate
and the final per-host rollup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.sources.warc import (
    encode_warc,
    encode_warc_record,
    html_to_blocks,
    http_body,
    warc_records,
)
from dronedb_spark.suite import check
from dronedb_spark.text.c4 import c4_line_clean
from dronedb_spark.text.robots import parse_robots, robots_allowed

# ------------------------------------------------------------ fixture --

_CC_SITES = (0, 1, 4, 5, 6)   # 1/4/5 carry biting robots; 0 grazes; 6 none
_CC_PAGES = 6                 # j = 0..5 so each Allow exception fires
# page path per host: the source prefix its robots rules actually name
_CC_SRC = {0: "src10", 1: "src1", 4: "src2", 5: "src15", 6: "src6"}


def _cc_html(n: int, j: int) -> str:
    lorem = (
        "<p>lorem ipsum dolor sit amet.</p>" if (n + j) % 7 == 0 else ""
    )
    return (
        f"<html><body><p>Crawled page {n}-{j} body sentence with several words.</p>"
        "<p>Subscribe to our newsletter for updates today.</p>"
        "<p>Please enable javascript to continue browsing.</p>"
        f"<p>Second body sentence number {j} on host {n}!</p>"
        f"<p>Third sentence rounds out page {n}-{j}?</p>"
        f"<p>Fourth closing sentence for page {n}-{j}.</p>"
        f"{lorem}</body></html>"
    )


def _cc_root() -> str:
    import os

    root = os.path.abspath(
        os.path.join(
            os.path.dirname(__file__), "..", "..", "tests", "fixtures",
            "warc_curation_v1",
        )
    )
    os.makedirs(root, exist_ok=True)
    for n in _CC_SITES:
        recs = []
        for j in range(_CC_PAGES):
            html = _cc_html(n, j).encode()
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(html)}\r\n\r\n".encode()
                + html
            )
            recs.append(
                encode_warc_record(
                    "response",
                    http,
                    uri=f"https://site{n}.example.com/{_CC_SRC[n]}/p{j}",
                    date=f"2024-03-0{(n % 9) + 1}T00:00:0{j}Z",
                    rec_id=f"urn:x-fixture:cur:{n}:{j}",
                )
            )
        payload = encode_warc(recs)
        p = os.path.join(root, f"seg_{n}.warc.gz")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


# ----------------------------------------------------------- operator --

_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def crawl_pages(records: DataFrame) -> DataFrame:
    """response records → (doc_id, host, path, block text); doc_id is a
    deterministic per-record key (file order is the crawl order)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for _, r in pdf.iterrows():
                if r["warc_type"] != "response":
                    continue
                uri = str(r["target_uri"])
                rest = uri.split("://", 1)[-1]
                host, _, path = rest.partition("/")
                import zlib

                rows.append(
                    {
                        # deterministic per-record key: crc of the file
                        # name spread by the record number (never
                        # Python hash() — its seed varies per process)
                        "doc_id": zlib.crc32(str(r["file_name"]).encode()) * 1000
                        + int(r["rec_no"]),
                        "host": host.lower().split(":")[0],
                        "path": "/" + path,
                        "text": html_to_blocks(http_body(bytes(r["payload"]))),
                    }
                )
        yield pd.DataFrame(rows, columns=[f.name for f in _PAGE_SCHEMA.fields])

    return records.mapInPandas(kernel, schema=_PAGE_SCHEMA)


def crawl_corpus_rollup(
    pages: DataFrame, rules: DataFrame, agent: str = "*"
) -> DataFrame:
    """Per host: fetched pages, robots-allowed pages, C4-kept pages,
    retained line and char mass — the crawl-to-corpus funnel."""
    verdicts = robots_allowed(
        pages.select("doc_id", "host", "path"), rules, agent
    ).select("doc_id", "allowed")
    from dronedb_spark.tables import barrier_persist

    # v feeds the C4 gate AND the fetched rollup — materialize once so
    # the WARC parse kernels + robots verdicts don't run per branch
    v = barrier_persist(pages.join(verdicts, "doc_id"))
    gated = c4_line_clean(v.filter(F.col("allowed") == 1))
    per_page = gated.select(
        "doc_id", "host",
        F.col("keep_page").cast("bigint").alias("kept"),
        F.when(F.col("keep_page"), F.col("n_lines_kept")).otherwise(F.lit(0))
        .alias("lines_kept"),
        F.when(F.col("keep_page"), F.length("cleaned_text")).otherwise(F.lit(0))
        .alias("chars_kept"),
    )
    fetched = v.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fetched"),
        F.sum("allowed").cast("bigint").alias("n_allowed"),
    )
    kept = per_page.groupBy("host").agg(
        F.sum("kept").cast("bigint").alias("n_kept_pages"),
        F.sum("lines_kept").cast("bigint").alias("n_lines_kept"),
        F.sum("chars_kept").cast("bigint").alias("kept_chars"),
    )
    return fetched.join(kept, "host", "left").select(
        "host", "n_fetched", "n_allowed",
        F.coalesce("n_kept_pages", F.lit(0)).cast("bigint").alias("n_kept_pages"),
        F.coalesce("n_lines_kept", F.lit(0)).cast("bigint").alias("n_lines_kept"),
        F.coalesce("kept_chars", F.lit(0)).cast("bigint").alias("kept_chars"),
    )


def _cc_oracle() -> str:
    from dronedb_spark.text.robots import _RB_RULES

    # robots verdict per (n, j), restated closed-form: the longest
    # matching rule among the host's '*' group decides
    rules_rows = []
    for n, rl in _RB_RULES.items():
        for rule, path in rl:
            rules_rows.append(f"({n}, '{rule}', '{path}')")
    return f"""
        WITH pages AS (
            SELECT n.n, j.j,
                   'site' || n.n || '.example.com' AS host,
                   '/' || CASE n.n WHEN 0 THEN 'src10' WHEN 1 THEN 'src1'
                                   WHEN 4 THEN 'src2' WHEN 5 THEN 'src15'
                                   ELSE 'src6' END || '/p' || j.j AS path,
                   'Crawled page ' || n.n || '-' || j.j
                       || ' body sentence with several words.' || chr(10)
                   || 'Subscribe to our newsletter for updates today.' || chr(10)
                   || 'Please enable javascript to continue browsing.' || chr(10)
                   || 'Second body sentence number ' || j.j || ' on host '
                       || n.n || '!' || chr(10)
                   || 'Third sentence rounds out page ' || n.n || '-' || j.j
                       || '?' || chr(10)
                   || 'Fourth closing sentence for page ' || n.n || '-'
                       || j.j || '.'
                   || CASE WHEN (n.n + j.j) % 7 = 0
                           THEN chr(10) || 'lorem ipsum dolor sit amet.'
                           ELSE '' END AS text
            FROM (SELECT unnest([{", ".join(str(n) for n in _CC_SITES)}]) AS n) n,
                 (SELECT unnest(range(0, {_CC_PAGES})) AS j) j),
        rules(rn, rule, rule_path) AS (VALUES {", ".join(rules_rows)}),
        cand AS (
            SELECT p.n, p.j, r.rule, length(r.rule_path) AS plen
            FROM pages p LEFT JOIN rules r
              ON r.rn = p.n AND starts_with(p.path, r.rule_path)),
        best AS (
            SELECT n, j,
                   MAX(CASE WHEN rule IS NOT NULL THEN
                       plen * 2 + CASE WHEN rule = 'allow' THEN 1 ELSE 0 END
                       END) AS score,
                   MAX(CASE WHEN rule = 'allow' THEN plen * 2 + 1 END)
                       AS best_allow
            FROM cand GROUP BY n, j),
        verd AS (
            SELECT p.*, CASE WHEN b.score IS NULL OR b.best_allow = b.score
                             THEN 1 ELSE 0 END AS allowed
            FROM pages p JOIN best b ON b.n = p.n AND b.j = p.j),
        gated AS (
            SELECT *,
                   list_filter(string_split(text, chr(10)),
                       l -> right(trim(l), 1) IN ('.', '!', '?', '"')
                            AND len(list_filter(string_split(trim(l), ' '),
                                                w -> w <> '')) >= 3
                            AND NOT contains(lower(l), 'javascript')) AS kept_lines,
                   contains(lower(text), 'lorem ipsum') AS has_lorem
            FROM verd WHERE allowed = 1),
        pageverd AS (
            SELECT host,
                   CASE WHEN NOT has_lorem AND NOT contains(text, '{{')
                             AND len(kept_lines) >= 5
                        THEN 1 ELSE 0 END AS kept,
                   len(kept_lines) AS lines_kept,
                   length(array_to_string(kept_lines, chr(10))) AS chars_kept
            FROM gated)
        SELECT v.host,
               CAST(COUNT(*) AS BIGINT) AS n_fetched,
               CAST(SUM(v.allowed) AS BIGINT) AS n_allowed,
               CAST(COALESCE(k.n_kept_pages, 0) AS BIGINT) AS n_kept_pages,
               CAST(COALESCE(k.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
               CAST(COALESCE(k.kept_chars, 0) AS BIGINT) AS kept_chars
        FROM verd v
        LEFT JOIN (
            SELECT host, SUM(kept) AS n_kept_pages,
                   SUM(CASE WHEN kept = 1 THEN lines_kept ELSE 0 END)
                       AS n_lines_kept,
                   SUM(CASE WHEN kept = 1 THEN chars_kept ELSE 0 END)
                       AS kept_chars
            FROM pageverd GROUP BY host) k USING (host)
        GROUP BY v.host, k.n_kept_pages, k.n_lines_kept, k.kept_chars
        ORDER BY v.host"""


@check("crawl_to_corpus_rollup", oracle=_cc_oracle())
def q_crawl_to_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL .warc.gz bytes → robots verdicts → block extraction → C4 —
    the per-host crawl funnel, value-checked stage by stage."""
    from dronedb_spark.sources.bridge import scan_binaries
    from dronedb_spark.tables import spread
    from dronedb_spark.text.robots import _robots_root

    files = scan_binaries(spark, _cc_root(), "*.warc.gz")
    pages = crawl_pages(warc_records(spread(files)))
    rules = parse_robots(
        spread(scan_binaries(spark, _robots_root(), "*.robots.txt"))
    )
    return crawl_corpus_rollup(pages, rules, agent="fixturebot").orderBy("host")
