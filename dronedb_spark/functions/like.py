"""Path-pattern sanitization — exact parity with the reference.

Reference: ``sanitize_query_param`` (src/library/dbops.cpp:760-771):
  * ``/`` → ``//`` and ``%`` → ``/%`` (escaped with ESCAPE '/'),
  * ``*`` → ``%`` (user wildcard),
  * ``_`` is deliberately NOT escaped (the reference comments it out), so
    ``_`` remains a single-character wildcard — replicated bug-for-bug,
  * empty pattern → ``%`` (match everything).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ESCAPE_CHAR = "/"


def like_col(col: Column | str, pattern_sql: str) -> Column:
    """``col LIKE pattern ESCAPE '/'`` built via the DSL — the pattern is
    passed as a literal, never interpolated into SQL text, so patterns
    containing quotes (o'brien.jpg) can neither break parsing nor inject
    expressions (the reference binds the parameter; dbops.cpp:954)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.like(c, F.lit(pattern_sql), F.lit(ESCAPE_CHAR))


def sanitize_query_param(pattern: str) -> str:
    if not pattern:
        return "%"
    s = pattern.replace("/", "//").replace("%", "/%")
    s = s.replace("*", "%")
    return s


def folder_pattern(folder: str) -> str:
    """Descendant-matching pattern for a folder (dbops.cpp:934-939):
    sanitized folder + '//' + '%' — i.e. literal '<folder>/' then anything."""
    return sanitize_query_param(folder) + "//%" if folder else "%"
