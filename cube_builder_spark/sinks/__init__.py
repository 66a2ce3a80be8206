"""Sinks (SURVEY.md §2.2): cube parquet store, items catalog, exports."""
