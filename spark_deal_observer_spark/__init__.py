"""spark_deal_observer_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
CheckerNetwork/spark-deal-observer (an event-sourced FIL+ deal observer),
re-expressed Spark-first: Structured Streaming ingestion, an idempotent
deduplicating merge sink, declarative DataFrame/SQL queries planned by
Catalyst, stateful enrichment, and foreachBatch egress — plus the
large-scale training-data-pipeline operators (dedup families, similarity
search, multimodal column plumbing, text analysis) the reference lacks.

Layout:
  functions/  column-expression libraries (epoch math, cbor decode, text,
              vectors, portable hashing)
  operators/  composite relational operators (dedup-merge sink, state
              machine, near-dup families, ANN)
  sources/    table loaders + the raw-event decode pipeline
  plans/      named query catalog (driver contract + oracle SQL twins)
  streaming/  Structured Streaming wrappers of the batch pipeline
  multimodal/ binary-column (image/audio/video) plumbing
"""

__version__ = "0.1.0"
