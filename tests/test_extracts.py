"""Unit layer for the reference-fidelity scalar extractors (SURVEY §5.2).

Adversarial inputs per function: empty string, no match, multiple
matches (first wins), pattern priority, case rules, unicode.
Reference semantics: app.py:65-87 (via SURVEY §2.8 F1-F7).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from leadsight_sales_agent_spark.functions.extracts import (
    extract_email,
    extract_founded,
    extract_sentence_near_keyword,
    normalize_whitespace,
    url_host,
)


def apply_one(spark, fn, text):
    df = spark.createDataFrame([(text,)], "t: string")
    return df.select(fn(F.col("t")).alias("out")).first()["out"]


class TestExtractFounded:
    def test_basic(self, spark):
        assert apply_one(spark, extract_founded, "Founded in 1999, we grew.") == "Founded in 1999"

    def test_without_in(self, spark):
        assert apply_one(spark, extract_founded, "Founded 2001") == "Founded 2001"

    def test_case_insensitive(self, spark):
        assert apply_one(spark, extract_founded, "fOuNdEd In 1984") == "fOuNdEd In 1984"

    def test_pattern_priority_founded_beats_established(self, spark):
        # 'Established' appears FIRST in the text, but the Founded pattern
        # has priority (reference app.py:71-75 checks patterns in order)
        text = "Established in 1980. Founded in 1999."
        assert apply_one(spark, extract_founded, text) == "Founded in 1999"

    def test_established(self, spark):
        assert apply_one(spark, extract_founded, "Established 1970 by a family") == "Established 1970"

    def test_since(self, spark):
        assert apply_one(spark, extract_founded, "serving since 1850!") == "since 1850"

    def test_first_match_wins(self, spark):
        text = "Founded in 1999 and Founded in 2005"
        assert apply_one(spark, extract_founded, text) == "Founded in 1999"

    def test_requires_four_digits(self, spark):
        assert apply_one(spark, extract_founded, "Founded in 99") is None

    def test_no_match_is_null(self, spark):
        assert apply_one(spark, extract_founded, "no dates here") is None

    def test_empty_is_null(self, spark):
        assert apply_one(spark, extract_founded, "") is None

    def test_unicode_no_throw(self, spark):
        assert apply_one(spark, extract_founded, "基礎 żółć Founded in 2020 🎉") == "Founded in 2020"


class TestExtractEmail:
    def test_first_match_wins(self, spark):
        text = "write info@x.com or bob@y.org"
        assert apply_one(spark, extract_email, text) == "info@x.com"

    def test_plus_and_dots(self, spark):
        assert apply_one(spark, extract_email, "a.b+c_d%e@sub.domain.io!") == "a.b+c_d%e@sub.domain.io"

    def test_uppercase_allowed_by_class(self, spark):
        # the pattern is case-sensitive but its classes include A-Z
        assert apply_one(spark, extract_email, "INFO@EXAMPLE.COM") == "INFO@EXAMPLE.COM"

    def test_no_tld_no_match(self, spark):
        assert apply_one(spark, extract_email, "user@localhost") is None

    def test_empty_is_null(self, spark):
        assert apply_one(spark, extract_email, "") is None


class TestExtractSentenceNearKeyword:
    def fn(self, c):
        return extract_sentence_near_keyword(c, "about us")

    def test_extracts_dot_delimited_span(self, spark):
        text = "Intro. We are about us experts here. Tail."
        assert apply_one(spark, self.fn, text) == "We are about us experts here"

    def test_case_insensitive(self, spark):
        assert apply_one(spark, self.fn, "ALL ABOUT US TODAY.") == "ALL ABOUT US TODAY"

    def test_first_span_only(self, spark):
        text = "first about us span. second about us span."
        assert apply_one(spark, self.fn, text) == "first about us span"

    def test_no_match_is_null(self, spark):
        assert apply_one(spark, self.fn, "nothing relevant.") is None

    def test_empty_is_null(self, spark):
        assert apply_one(spark, self.fn, "") is None


class TestNormalizeAndHost:
    def test_whitespace_collapse(self, spark):
        assert apply_one(spark, normalize_whitespace, "a\t\n  b \r c") == "a b c"

    def test_url_host(self, spark):
        assert apply_one(spark, url_host, "https://foo.example.com/x/y?z=1") == "foo.example.com"

    def test_url_host_no_scheme_is_null(self, spark):
        assert apply_one(spark, url_host, "not a url") is None
