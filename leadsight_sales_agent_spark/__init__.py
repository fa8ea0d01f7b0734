"""leadsight_sales_agent_spark — a PySpark-native analytics engine.

Re-expresses the query & data-processing capabilities of the reference
sales-intelligence pipeline (DeepankarBigData/LeadSight-sales-Agent) as
first-class, scale-oriented Spark DataFrame operators, and extends them
with the relational / text / dedup / similarity / streaming operators a
large-scale training-data pipeline needs.

Design rules (SURVEY.md §4):
- DataFrame/SQL only; Catalyst owns the plan. No RDDs.
- Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Every operator ships as a named query in ``registry.QUERIES`` with a
  DuckDB oracle twin in ``registry.ORACLES`` where SQL-expressible.
"""

from leadsight_sales_agent_spark.registry import ORACLES, QUERIES  # noqa: F401

__version__ = "0.1.0"
