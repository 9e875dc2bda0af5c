"""PySpark-native analytics engine with the capabilities of
danitdrvc/Distributed-Graph-Coloring-with-PySpark, rebuilt Spark-first.

The reference (/root/reference, ~950 LoC of RDD-of-pickled-Python-objects)
computes a minimal proper vertex coloring by iterative parallel greedy.
This package re-expresses that surface — and a much wider analytics
surface (relational, dedup, similarity, text, streaming) — as DataFrame /
Catalyst plans designed for 100 TB scale.

Layout:
    session     — tuned SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
    sources/    — graph JSON scan/sink, random generator, parquet table loaders
    operators/  — coloring core, relational query library, dedup, similarity,
                  text analysis, multimodal plumbing
    functions/  — reusable Catalyst expression helpers (arrays, hashing)
    plans/      — plan inspection helpers (pushdown / broadcast assertions)
    streaming/  — Structured Streaming equivalents over the events table
"""

__version__ = "0.1.0"
