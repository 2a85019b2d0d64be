"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.8); this package is the
engine's forward extension: the same compiled cell/annotation pipelines
applied incrementally. Micro-batch boundaries replace the reference's
single pass; graph set-semantics are preserved per sink via an anti-join
merge (idempotent re-delivery)."""

from .incremental import (  # noqa: F401
    incremental_triples,
    run_incremental_ingest,
    run_streaming_construct,
    run_streaming_owl,
    run_streaming_rdfs,
    windowed_event_counts,
)
