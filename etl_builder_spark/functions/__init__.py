"""Scalar function families (SURVEY.md §2 H1-H7) — string, datetime,
math, conditional, array, map, JSON. All JVM-side built-ins inside
whole-stage codegen; no Python in these paths."""
