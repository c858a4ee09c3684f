"""Composite operators Spark lacks as single primitives.

Each module composes built-in DataFrame operations (so Catalyst still plans
them) into a named operator: as-of joins, gaps-and-islands run detection,
sessionization, dedup families, similarity search, text analysis.
"""
