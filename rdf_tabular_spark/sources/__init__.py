"""Table sources: dialect-aware CSV/TSV scans and in-memory inputs."""
