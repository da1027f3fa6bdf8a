"""Unit tests for LIKE sanitization — bug-for-bug parity with
sanitize_query_param (dbops.cpp:760-771), per FIXTURES.md §6."""

from dronedb_spark.functions.like import folder_pattern, sanitize_query_param


def test_star_becomes_percent():
    assert sanitize_query_param("*.JPG") == "%.JPG"


def test_slash_escaped():
    assert sanitize_query_param("a/b") == "a//b"


def test_percent_escaped():
    assert sanitize_query_param("100%") == "100/%"


def test_underscore_not_escaped():
    # deliberately unescaped in the reference (commented out at :767)
    assert sanitize_query_param("a_b") == "a_b"


def test_empty_matches_all():
    assert sanitize_query_param("") == "%"


def test_mixed():
    assert sanitize_query_param("img/*_10%.JPG") == "img//%_10/%.JPG"


def test_folder_pattern():
    assert folder_pattern("f1") == "f1//%"
    assert folder_pattern("a/b") == "a//b//%"
    assert folder_pattern("") == "%"
