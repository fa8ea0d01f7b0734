"""Reference-fidelity scalar extraction functions (SURVEY.md §2.8).

Column-expression ports of the reference's regex extractors, preserving
its quirks deliberately (SURVEY.md §4.3.5):

- F1 ``extract_founded`` — 3 prioritized case-INsensitive patterns,
  first-match-wins, returns the WHOLE match (group 0). Reference
  app.py:65-75.
- F2 ``extract_email`` — first match of a case-SENSITIVE class pattern.
  Reference app.py:78-81.
- F3 ``extract_sentence_near_keyword`` — first ``[^.]*kw[^.]*`` span,
  case-insensitive, trimmed. Reference app.py:84-87.

Spark's ``regexp_extract`` returns '' (not null) on miss — every
extractor wraps in ``nullif('')`` to restore the reference's None
semantics. All pure Catalyst expressions: codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FOUNDED_PATTERNS = (
    r"(?i)Founded (in )?(\d{4})",
    r"(?i)Established (in )?(\d{4})",
    r"(?i)Since (\d{4})",
)

EMAIL_PATTERN = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]+"


def _nullif_empty(c: Column) -> Column:
    return F.nullif(c, F.lit(""))


def extract_founded(text: Column) -> Column:
    """First match across prioritized founded/established/since patterns."""
    return F.coalesce(
        *[_nullif_empty(F.regexp_extract(text, p, 0)) for p in FOUNDED_PATTERNS]
    )


def extract_email(text: Column) -> Column:
    """First email-shaped substring (case-sensitive, like the reference)."""
    return _nullif_empty(F.regexp_extract(text, EMAIL_PATTERN, 0))


def extract_sentence_near_keyword(text: Column, keyword: str) -> Column:
    """The sentence (dot-delimited span) containing ``keyword``."""
    import re

    pat = r"(?i)[^.]*" + re.escape(keyword) + r"[^.]*"
    return _nullif_empty(F.trim(F.regexp_extract(text, pat, 0)))


def normalize_whitespace(text: Column) -> Column:
    """F4: collapse all whitespace runs to single spaces."""
    return F.regexp_replace(text, r"\s+", " ")


def url_host(url: Column) -> Column:
    """F7: hostname of a URL (reference urlparse().netloc).

    try_ variant: ANSI mode makes plain parse_url THROW on malformed
    input; the reference's urlparse never raises — null is the faithful
    (and pipeline-safe) behavior.
    """
    return F.try_parse_url(url, F.lit("HOST"))
