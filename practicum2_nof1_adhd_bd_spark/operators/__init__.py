"""Operator inventory (SURVEY.md §2) re-expressed as Spark DataFrame ops."""
