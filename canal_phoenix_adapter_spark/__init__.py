"""canal_phoenix_adapter_spark — a PySpark-native CDC apply + ETL engine.

Re-expresses the capabilities of wenjunxiao/canal-phoenix-adapter
(a Canal->Phoenix CDC apply engine + batch backfill tool, reference at
/root/reference) in idiomatic Spark DataFrame / Structured Streaming
terms, plus large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing).

Layout (SURVEY.md §7.0):
    config        MappingConfig dataclass + YAML loader     (~ config/*)
    functions/    column-expression builders: coercion, enums, hashing
    sources/      table loaders, Canal event envelope/explode
    operators/    transform, merge (CDC apply), etl, schema_sync,
                  dedup, similarity, text, multimodal, analytics
    streaming/    Structured Streaming glue (readStream -> foreachBatch)
    plans/        physical-plan inspection helpers
"""

__version__ = "0.1.0"
