"""robots.txt laws: group parsing (stacked UAs, group reset, comments,
inert empty Disallow), RFC longest-match with allow-wins ties, exact
agent group selection, and the default-allow fallback."""

from __future__ import annotations

from dronedb_spark.text.robots import parse_robots, robots_allowed


def _files(spark, name, text):
    return spark.createDataFrame(
        [(name, bytearray(text.encode()))], "file_name string, content binary"
    )


def _rules(spark, text, host="h.com"):
    return parse_robots(_files(spark, f"{host}.robots.txt", text))


def test_parser_groups_and_noise(spark):
    text = (
        "# header comment\n"
        "User-agent: alphabot\n"
        "User-agent: betabot\n"          # stacked UAs share the group
        "Disallow: /a  # trailing comment\n"
        "Allow: /a/ok\n"
        "\n"
        "User-agent: *\n"                # rules above closed the group
        "Disallow: /b\n"
        "Disallow:\n"                    # empty -> inert
        "Crawl-delay: 5\n"               # parsed as a delay row
        "Request-rate: 1/5\n"            # unknown directive -> ignored
    )
    got = sorted(tuple(r) for r in _rules(spark, text).collect())
    assert got == [
        ("h.com", "*", "crawl-delay", "5"),
        ("h.com", "*", "disallow", "/b"),
        ("h.com", "alphabot", "allow", "/a/ok"),
        ("h.com", "alphabot", "disallow", "/a"),
        ("h.com", "betabot", "allow", "/a/ok"),
        ("h.com", "betabot", "disallow", "/a"),
    ]


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string, path string")


def test_longest_match_and_allow_tie(spark):
    text = (
        "User-agent: *\n"
        "Disallow: /p\n"
        "Allow: /p/public\n"
        "Disallow: /p/public\n"  # same length as the Allow -> Allow wins
    )
    rules = _rules(spark, text)
    urls = _urls(
        spark,
        [
            (1, "h.com", "/p/private"),   # blocked by /p
            (2, "h.com", "/p/public/x"),  # allow (longest + tie rule)
            (3, "h.com", "/q/other"),     # no rule -> allowed
            (4, "other.com", "/p/private"),  # no robots for host -> allowed
        ],
    )
    got = {r["doc_id"]: r["allowed"] for r in robots_allowed(urls, rules).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 1}


def test_exact_agent_group_beats_star(spark):
    text = (
        "User-agent: strictbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private\n"
    )
    rules = _rules(spark, text)
    urls = _urls(spark, [(1, "h.com", "/anything"), (2, "h.com", "/private/x")])
    strict = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, rules, agent="strictbot").collect()
    }
    assert strict == {1: 0, 2: 0}
    generic = {
        r["doc_id"]: r["allowed"]
        for r in robots_allowed(urls, rules, agent="anybot").collect()
    }
    assert generic == {1: 1, 2: 0}


def test_crawl_delay_and_fetch_plan(spark):
    from dronedb_spark.text.robots import fetch_plan

    text = (
        "User-agent: *\n"
        "Crawl-delay: 4\n"
        "Disallow: /private\n"
    )
    rules = _rules(spark, text)
    urls = _urls(
        spark,
        [
            (1, "h.com", "/a"),
            (2, "h.com", "/b"),
            (3, "h.com", "/private/x"),   # disallowed, not scheduled
            (4, "other.com", "/c"),       # no robots -> default delay 1
            (5, "other.com", "/d"),
            (6, "other.com", "/e"),
        ],
    )
    got = {r["host"]: (r["n_urls"], r["delay_s"], r["makespan_s"])
           for r in fetch_plan(urls, rules).collect()}
    assert got == {"h.com": (2, 4, 4), "other.com": (3, 1, 2)}


def test_delay_comes_from_effective_group(spark):
    """A host declaring BOTH groups with different Crawl-delays: the
    exact agent gets ITS group's delay, a generic agent gets '*' — never
    the MAX across groups (RFC 9309 group semantics)."""
    from dronedb_spark.text.robots import fetch_plan

    text = (
        "User-agent: slowbot\n"
        "Crawl-delay: 9\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 2\n"
    )
    rules = _rules(spark, text)
    urls = _urls(spark, [(1, "h.com", "/a"), (2, "h.com", "/b")])
    slow = fetch_plan(urls, rules, agent="slowbot").collect()[0]
    assert (slow["delay_s"], slow["makespan_s"]) == (9, 9)
    fast = fetch_plan(urls, rules, agent="anybot").collect()[0]
    assert (fast["delay_s"], fast["makespan_s"]) == (2, 2)
    # and the inverse ordering (star slower than exact) must also pick
    # the exact group, not the larger star value
    inv = _rules(spark, (
        "User-agent: slowbot\nCrawl-delay: 2\n\nUser-agent: *\nCrawl-delay: 9\n"
    ))
    got = fetch_plan(urls, inv, agent="slowbot").collect()[0]
    assert (got["delay_s"], got["makespan_s"]) == (2, 2)
