"""deep_field_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference engine (longoodr/deep-field,
a scrape/ETL pipeline + relational query substrate; see SURVEY.md) as an
idiomatic Spark DataFrame/SQL library, plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) that a 100 TB corpus pipeline needs.

Layout:
  session    — SparkSession factory tuned for local[...] and cluster use
  catalog    — load/register the TPC-H-ish testdata tables
  queries    — named query registry (Spark callable + DuckDB oracle SQL)
  operators  — composite operators (as-of join, top-k, dedup, sessionize)
  functions  — column-expression helpers (text hashing, vector math)
  sources    — readers/sinks incl. the HTML-cache raw zone and SQLite sink
  scrape     — reference-parity ETL pipeline (parse UDFs + stage DAG)
  streaming  — Structured Streaming variants of the event queries
"""

__version__ = "0.1.0"
