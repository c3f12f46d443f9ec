"""Relational operators of the engine: transform pipeline, CDC merge,
ETL backfill, schema evolution, and the large-scale data-pipeline
extensions (dedup, similarity, text, multimodal, analytics)."""
