"""uni_mannheim_masters_thesis_spark — PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference thesis project (``arshad115/Uni-Mannheim-Masters-Thesis``,
"Identification of Polysemous Entities in a Large Scale Database"),
re-expressed idiomatically on Spark DataFrame / SQL / MLlib — plus the
extended LLM-data-pipeline surface (dedup, similarity search, multimodal
columns, text analysis, streaming event analytics).

Layout
------
- ``session``    — SparkSession factory with scale-aware defaults.
- ``sources``    — readers/writers: testdata parquet, N-Quads, dictionary
                   text format, CSV/JSON sinks.
- ``functions``  — scalar column functions: text cleaning, tokenization,
                   similarity (Jaro-Winkler, cosine), hashing.
- ``operators``  — composable DataFrame operators: relational (top-k,
                   per-group-first, set ops), dedup (exact/MinHash/Jaccard),
                   text statistics, similarity search, evaluation metrics.
- ``ml``         — MLlib pipelines: vectorization, LDA topic modeling,
                   polysemy rule, classifier battery.
- ``plans``      — end-to-end query plans and the driver-facing registry
                   (queries + DuckDB oracle SQL).
- ``streaming``  — Structured Streaming variants of the event analytics.

Every operator is designed for 100 TB scale: declarative plans (Catalyst
pushdown/pruning), broadcast hints for dimension joins, AQE for skew, no
driver-side collects in any hot path.
"""

__version__ = "0.1.0"
