"""Structured Streaming layer (SURVEY.md §2.10): the reference's buffer
pipeline re-expressed as streaming primitives — micro-batch ingest with
foreachBatch, the RoundBuffer token/size/oversize triggers as an
applyInPandasWithState operator, and read-your-writes as a union view.
"""
