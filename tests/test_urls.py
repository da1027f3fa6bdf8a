"""URL curation: canonicalization rules, label-boundary blocklisting,
and the zero-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.urls import (
    blocklist_filter,
    canonical_dedup,
    canonicalize,
    host_suffixes,
)


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def _canon(spark, url):
    return canonicalize(_urls(spark, [url])).collect()[0]["canonical_url"]


def test_scheme_www_port_merge(spark):
    """The classic crawl-duplicate quartet lands on one key."""
    variants = [
        "http://www.site.example.com:80/a/b",
        "https://site.example.com:443/a/b/",
        "HTTPS://WWW.Site.Example.com/a/b",
        "https://site.example.com/a/b#section-2",
    ]
    keys = {_canon(spark, u) for u in variants}
    assert keys == {"site.example.com/a/b"}


def test_tracking_params_dropped_and_sorted(spark):
    a = _canon(spark, "https://h.example/p?utm_source=x&b=2&a=1&fbclid=zz")
    b = _canon(spark, "https://h.example/p?a=1&b=2")
    assert a == b == "h.example/p?a=1&b=2"
    # all-tracking query collapses to no query at all
    assert _canon(spark, "https://h.example/p?utm_medium=m") == "h.example/p"


def test_root_path_normalizes(spark):
    assert _canon(spark, "https://h.example") == "h.example/"
    assert _canon(spark, "https://h.example/") == "h.example/"


def test_non_default_port_kept_distinct(spark):
    """Only the scheme's default port is cosmetic — :8080 is a
    different origin and must NOT merge with the bare host."""
    assert _canon(spark, "https://h.example:8080/x") == "h.example:8080/x"
    assert _canon(spark, "https://h.example/x") == "h.example/x"
    # default port for the OTHER scheme is not default here
    assert _canon(spark, "http://h.example:443/x") == "h.example:443/x"
    # the host column itself never carries the port
    r = canonicalize(_urls(spark, ["https://h.example:8080/x"])).collect()[0]
    assert r["host"] == "h.example"


def test_suffix_blocking_is_label_bounded(spark):
    df = _urls(
        spark,
        [
            "https://site4.example.com/x",       # exact hit
            "https://cdn.site4.example.com/x",   # subdomain hit
            "https://notsite4.example.com/x",    # substring — must survive
            "https://site1.example.com/x",       # clean
        ],
    )
    rows = {r["host"]: r["blocked"] for r in blocklist_filter(df).collect()}
    assert rows == {
        "site4.example.com": True,
        "cdn.site4.example.com": True,
        "notsite4.example.com": False,
        "site1.example.com": False,
    }


def test_host_suffixes_enumeration(spark):
    df = spark.createDataFrame([("cdn.a.example.com",)], "host string")
    sfx = df.select(host_suffixes(F.col("host")).alias("s")).collect()[0]["s"]
    assert sfx == ["cdn.a.example.com", "a.example.com", "example.com", "com"]


def test_dedup_keeps_min_doc_id(spark):
    df = spark.createDataFrame(
        [
            (7, "https://h.example/a"),
            (3, "http://www.h.example/a/"),
            (9, "https://h.example/b"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canonical_url"]: (r["keeper"], r["n_docs"]) for r in canonical_dedup(df).collect()}
    assert rows == {"h.example/a": (3, 2), "h.example/b": (9, 1)}


def test_canonicalize_plan_has_no_exchange(spark):
    """Canonicalize + blocklist are one codegen'd projection — no
    shuffle, no UDF, nothing python-side."""
    df = blocklist_filter(_urls(spark, ["https://h.example/x"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
