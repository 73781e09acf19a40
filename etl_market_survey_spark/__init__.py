"""etl_market_survey_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference batch pipeline (SengerM/ETL_market_survey, surveyed in
SURVEY.md) as idiomatic Spark DataFrame operators, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) that a 100 TB deployment needs.

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst does the optimizing.
- Python UDFs only where built-ins genuinely cannot express the semantics
  (grouped non-linear curve fits), and then always Arrow-batched
  (``applyInPandas`` / ``pandas_udf``).
- No ``collect()`` inside operators — everything stays distributed.
- Deterministic results: explicit seeds, exact decimal summation for
  cross-engine (DuckDB-oracle) reproducibility.
"""

__version__ = "0.1.0"
