"""Sources & sinks (SURVEY.md §2.1): parquet-backed mutable tables with
CRUD + cascading-delete semantics, and format readers/writers.
"""
