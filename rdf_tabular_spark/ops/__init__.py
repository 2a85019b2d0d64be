"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact + near-dup families), similarity
search, text analysis, multimodal column plumbing. All primary paths are
native column expressions; hash choices (md5) are deliberately portable so
the DuckDB oracle can replicate them bit-for-bit."""
