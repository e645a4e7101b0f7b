"""Query routing + freshness boost (SURVEY §3.2 routing layer).

The reference's hybrid retriever classifies each query with regex
heuristics and re-weights the three store branches before fusing
(`rag/retrieve/hybrid.py:723-830`), then multiplies scores by a
recency factor when the query asks for fresh data
(`rag/retrieve/hybrid.py:517-560`). Spark-first, routing is a
PLAN-TIME decision: :func:`analyze_query` runs on the driver (a few
regexes over one string — no data involved) and its weights
parameterize the same fusion plan; only :func:`freshness_boost` touches
rows, as a pure codegen column expression over the fused result joined
to its timestamps.

At scale this is exactly where routing belongs: the classification cost
is O(query), the branch weights fold into the fusion expression as
literals, and the boost join hits only the <= k fused rows (broadcast).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# regex tables mirror rag/retrieve/hybrid.py:760-778
FACTUAL_PATTERNS = [
    r"\b(what|when|where|who|which|how many|how much)\b",
    r"\b(define|definition|meaning of)\b",
    r"\b(list of|examples of)\b",
]
CONCEPTUAL_PATTERNS = [
    r"\b(why|how does|explain|describe|compare|contrast)\b",
    r"\b(relationship between|difference between)\b",
    r"\b(similar to|like|analogy)\b",
]
PROCEDURAL_PATTERNS = [
    r"\b(how to|steps to|process for)\b",
    r"\b(tutorial|guide|instructions)\b",
    r"\b(way to|method for)\b",
]
FRESH_PATTERNS = [
    r"\b(recent|latest|new|current|today|now)\b",
    r"\b(update|changed|happened)\b",
]
PERSONAL_PATTERNS = [r"\b(my|mine|I|me)\b", r"\b(profile|settings|preferences)\b"]

DEFAULT_WEIGHTS = {"vector": 1.0, "keyword": 1.0, "graph": 1.0}
RECENCY_BOOST = 0.2


def analyze_query(query: str, base_weights: dict | None = None) -> dict:
    """Routing decision for a query string — strategy name, per-store
    weights, recency boost, and the raw analysis flags. Deterministic
    mirror of the reference's if/elif routing table
    (rag/retrieve/hybrid.py:800-826): factual > conceptual > procedural
    precedence; freshness adds the 0.2 boost hint.
    """
    ql = query.lower()

    def hit(patterns):
        return any(re.search(p, ql) for p in patterns)

    analysis = {
        "is_factual": hit(FACTUAL_PATTERNS),
        "is_conceptual": hit(CONCEPTUAL_PATTERNS),
        "is_procedural": hit(PROCEDURAL_PATTERNS),
        "needs_fresh_data": hit(FRESH_PATTERNS),
        "is_personal": hit(PERSONAL_PATTERNS),
        "word_count": len(set(ql.split())),
        "complexity": "simple" if len(set(ql.split())) <= 5 else "complex",
    }
    weights = dict(base_weights or DEFAULT_WEIGHTS)
    strategy = "multi_path"
    if analysis["is_factual"]:
        strategy = "vector_keyword_primary"
        weights.update(vector=0.6, keyword=0.3, graph=0.1)
    elif analysis["is_conceptual"]:
        strategy = "vector_graph_primary"
        weights.update(vector=0.5, graph=0.4, keyword=0.1)
    elif analysis["is_procedural"]:
        strategy = "graph_vector_primary"
        weights.update(graph=0.5, vector=0.4, keyword=0.1)
    return {
        "strategy": strategy,
        "store_weights": weights,
        "recency_boost": RECENCY_BOOST if analysis["needs_fresh_data"] else 0.0,
        "analysis": analysis,
    }


def freshness_boost(
    results: DataFrame,
    now_epoch: int,
    boost: float,
    ts_col: str = "ts",
    score_col: str = "score",
    decimals: int = 6,
) -> DataFrame:
    """score *= 1 + boost * max(0, 1 - age_hours/24) — content younger
    than a day gets up to (1+boost)x; older content is untouched
    (rag/retrieve/hybrid.py:536-541). ``now_epoch`` is an explicit
    parameter (not wall clock) so results are reproducible and
    oracle-checkable."""
    age_h = (F.lit(now_epoch) - F.col(ts_col).cast("long")) / 3600.0
    mult = 1.0 + boost * F.greatest(F.lit(0.0), 1.0 - age_h / 24.0)
    return results.withColumn(
        score_col, F.round(F.col(score_col) * mult, decimals)
    )
