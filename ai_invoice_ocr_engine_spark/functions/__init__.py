"""Reusable DataFrame-level operations for large-scale training-data
pipelines: deduplication, similarity search, text analysis, multimodal
plumbing. All JVM-side (built-in pyspark.sql.functions) unless a kernel
genuinely needs Python — then Arrow-batched pandas UDFs."""
