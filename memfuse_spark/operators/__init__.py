"""Operators (SURVEY.md §2): similarity top-k, keyword/BM25, fusion,
graph expansion, dedup, chunking, hierarchy, text analysis. Each operator
is a DataFrame -> DataFrame transform built from Catalyst expressions;
Python only appears at genuinely imperative boundaries (model inference,
stateful chunking) and then always Arrow-batched.
"""
