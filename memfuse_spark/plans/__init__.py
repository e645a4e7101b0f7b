"""Composed query plans (SURVEY.md §3): the full multi-path retrieval
pipeline and session-listing equivalents, as single lazy DataFrame
expressions that Catalyst optimizes end-to-end.
"""
