"""Relational operator surface: scans, filters/projection, joins,
aggregates, windows, sorts/limits, set operations, as-of/interval
join rewrites (SURVEY.md §2 groups A-G)."""
