"""Operators beyond the core fulltext engine: dedup, similarity search,
text analysis, graph expansion, sessionization.

These are the training-data-pipeline operators a 100 TB corpus engine
needs, plus Spark-first re-expressions of the reference's relational /
analytic operator inventory (SURVEY.md §2).
"""
