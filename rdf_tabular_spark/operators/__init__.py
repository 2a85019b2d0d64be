"""Executor-side operators, all expressed as native Spark column expressions
(whole-stage-codegen friendly; no per-row Python): the CSVW cell pipeline,
triple emission, dedup, and PK/FK validation."""
