"""PySpark-native analytics engine with the query & data-processing
capabilities of cyusong/HDB-Resale-Price-Data-Pipeline (reference at
/root/reference, read-only), re-expressed Spark-first.

Architecture (SURVEY.md §7):

- ``session``    — SparkSession factory with scale-oriented defaults (AQE,
                   Arrow, tuned shuffle partitions).
- ``schemas``    — explicit ``StructType`` schemas for every raw source and
                   conformed output (the reference relies on inference; we
                   declare — SURVEY.md §1.3).
- ``seeds``      — in-repo seed data for the four dimension tables
                   (SURVEY.md §1.4 / FIXTURES.md §4).
- ``functions``  — scalar/column function library (SURVEY.md §2.9-2.10)
                   plus cross-engine deterministic hashing and vector math.
- ``operators``  — composable DataFrame→DataFrame operators: enrichment
                   joins, dedup family, similarity search, text analysis,
                   multimodal plumbing.
- ``plans``      — the reference's four pipelines (historical / propnex /
                   srx / merge_dedup) composed from operators.
- ``sources``    — schema-pinned readers (csv/json/parquet) + testdata
                   loader.
- ``streaming``  — Structured Streaming extensions over the ``events``
                   table (beyond-reference capability, SURVEY.md §2.11).
"""

__version__ = "0.1.0"
