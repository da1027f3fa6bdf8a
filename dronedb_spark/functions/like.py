"""Path-pattern sanitization — exact parity with the reference.

Reference: ``sanitize_query_param`` (src/library/dbops.cpp:760-771):
  * ``/`` → ``//`` and ``%`` → ``/%`` (escaped with ESCAPE '/'),
  * ``*`` → ``%`` (user wildcard),
  * ``_`` is deliberately NOT escaped (the reference comments it out), so
    ``_`` remains a single-character wildcard — replicated bug-for-bug,
  * empty pattern → ``%`` (match everything).
"""

from __future__ import annotations

ESCAPE_CHAR = "/"


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
