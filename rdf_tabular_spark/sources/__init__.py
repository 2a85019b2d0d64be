"""Table sources: dialect-aware CSV/TSV scans, in-memory inputs, HTML
tables, and snapshot-manifest parquet tables (Iceberg-shaped commits /
time travel / incremental scans — snapshots.py)."""
