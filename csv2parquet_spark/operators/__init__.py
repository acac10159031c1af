"""LLM-data-pipeline operators (SURVEY.md §2.8).

Reusable DataFrame→DataFrame transforms; the oracle-checked queries in
``csv2parquet_spark.queries.llm_ops`` are thin wrappers over these.
"""
