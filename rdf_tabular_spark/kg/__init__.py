"""Source-code knowledge-graph construction at 10^12-file scale (north rule).

Stages (SURVEY.md §3 "Spark lifecycle equivalent"):

1. synth    — deterministic synthetic (repo, path, commit, lang, content)
              table (tests/bench input; production reads Iceberg).
2. extract  — repartitionByRange(repo, path) -> mapInPandas: per-file
              tabular-structure extraction (imports / symbols / manifest
              rows) with per-file row numbering + content_sha256 invariant.
3. annotate — CSVW-style virtual-table annotations compile extracted rows
              into candidate triples with pure column expressions.
4. link     — minhash-LSH blocking + Jaccard rescoring + canonical-IRI
              election; broadcast remap of triples.
5. pipeline — stage orchestration: checkpoints, lineage, metrics, resume.
"""
