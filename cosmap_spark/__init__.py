"""cosmap_spark — a PySpark-native sample-based analysis engine.

A from-scratch rebuild of the capabilities of AstroPatty/cosmap (reference
at /root/reference, v0.4.3) on Apache Spark: draw N random sky regions,
run a cone search (spatial join) against a survey catalog, push each
sample's rows through a user-declared DAG of transformations, and emit one
output row per sample — except here the whole thing is ONE lazy DataFrame
plan optimized by Catalyst instead of a per-sample Python loop over Dask
workers (reference: src/cosmap/analysis/analysis.py:19-33).

Guiding inversion (SURVEY.md §7): the reference runs queries inside a loop
over samples; we run one query over all samples — samples are data, not
control flow.

Layout:
  session     SparkSession factory tuned for the engine
  tables      star-schema + derived cosmap-shaped fixture loaders
  functions/  scalar column functions (spherical geometry, text, vectors)
  operators/  relational/spatial operators (cone search, as-of join, dedup…)
  pipeline/   the cosmap-style declarative DAG pipeline engine
  sources/    input connectors
  sinks/      output connectors
  streaming/  Structured Streaming surface (windows, watermarks, dedup)
  queries/    the declared correctness-query ledger (SURVEY.md §2.3)
"""

__version__ = "0.1.0"
