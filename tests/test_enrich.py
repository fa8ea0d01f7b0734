"""Golden-shape + degradation tests for the enrichment pipeline
(operators/enrich.py; reference app.py:278-321 semantics).
"""

from __future__ import annotations

import json

from leadsight_sales_agent_spark.operators.enrich import (
    LLM_KEYS,
    OUTPUT_COLUMNS,
    _mock_llm,
    _mock_page,
    companies_frame,
    enrich_pipeline,
    first_consent_button,
)


class TestCookieConsent:
    """U4 (reference app.py:127-136): keyword-priority first-match."""

    def test_keyword_priority_beats_dom_order(self):
        # 'accept' outranks 'agree' even when the agree-button comes first
        assert first_consent_button(["I Agree", "Accept all"]) == "Accept all"
        # 'agree' outranks 'allow all' the same way
        assert first_consent_button(["Allow All", "I agree"]) == "I agree"

    def test_dom_order_breaks_ties_within_a_keyword(self):
        # reference clicks button.first among same-keyword matches
        assert first_consent_button(["ACCEPT", "Accept all"]) == "ACCEPT"

    def test_case_insensitive_substring_match(self):
        assert first_consent_button(["Do you AGREE?"]) == "Do you AGREE?"

    def test_no_match_returns_none(self):
        assert first_consent_button(["Cookie Settings", "Learn more"]) is None
        assert first_consent_button([]) is None


def toy_companies(spark, n=25):
    rows = [(f"Company {i} Inc", f"https://company-{i}.example.com") for i in range(n)]
    return spark.createDataFrame(rows, "company_name: string, website: string")


class TestMockTransports:
    def test_page_deterministic(self):
        assert _mock_page("https://a.example.com") == _mock_page("https://a.example.com")

    def test_llm_deterministic_and_json(self):
        out = _mock_llm("Acme", "https://acme.example.com", "about acme")
        assert out == _mock_llm("Acme", "https://acme.example.com", "about acme")
        if out and out.startswith("{") and "not valid" not in out:
            assert set(json.loads(out)) == set(LLM_KEYS)


class TestPipelineShape:
    def test_exact_14_column_contract(self, spark):
        out = enrich_pipeline(spark, toy_companies(spark))
        assert out.columns == OUTPUT_COLUMNS  # order matters (P1)

    def test_row_per_company_and_determinism(self, spark):
        df = toy_companies(spark, 20)
        a = sorted(map(str, enrich_pipeline(spark, df).collect()))
        b = sorted(map(str, enrich_pipeline(spark, df).collect()))
        assert len(a) == 20
        assert a == b

    def test_enrichment_values_present(self, spark, sf_dir):
        # sf0.001 companies (150) are enough to hit every mock path:
        # normal reports, the None path (h%23), the corrupt-JSON path (h%29)
        rows = enrich_pipeline(spark, companies_frame(spark, sf_dir)).collect()
        assert len(rows) == 150
        full = [r for r in rows if all(r[k] is not None for k in LLM_KEYS)]
        degraded = [r for r in rows if all(r[k] is None for k in LLM_KEYS)]
        assert full, "no fully-enriched rows"
        assert degraded, "graceful-degradation rows missing (U2)"
        # degradation must never drop the input columns
        assert all(r["Company Name"] and r["Website"] for r in rows)

    def test_nested_values_reserialized_compactly(self, spark):
        rows = enrich_pipeline(spark, toy_companies(spark, 10)).collect()
        overviews = [r["company_overview"] for r in rows if r["company_overview"]]
        assert overviews
        for o in overviews:
            parsed = json.loads(o)  # nested dict → compact JSON string (F12)
            assert parsed["name"]
