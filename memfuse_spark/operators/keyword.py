"""Keyword retrieval: inverted index + BM25 (SURVEY.md §2 X1-X4, A2, A3,
J3, T3).

The reference builds an in-memory ``Counter`` index per document and
scores BM25 in a Python loop (memfuse `store/keyword_store/bm25_store.py:
145-249`, params k1=1.5 b=0.75 at :28-29) or delegates to SQLite FTS5
(`keyword_store/sqlite_store.py:360-431`). Spark-first re-expression:

- the inverted index IS a DataFrame: ``explode(tokenize(text))`` →
  ``groupBy(doc, term).count()`` — one shuffle, map-side combined.
- corpus stats (N, avgdl, df) are tiny aggregates, broadcast into the
  scoring join.
- scoring a query = equi-join of the postings table with the (broadcast)
  query-term list + pure column arithmetic + top-k. At 100 TB the
  postings table would be bucketed by term so query joins touch only
  matching buckets; filters push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memfuse_spark.functions.text import tokenize

BM25_K1 = 1.5
BM25_B = 0.75


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (doc_id, term, tf, dl).

    dl (document token length) is carried on each posting row so scoring
    needs no extra join back to the documents table.
    """
    from memfuse_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tokens")
    ).select(
        "doc_id", F.size("tokens").alias("dl"), F.explode_outer("tokens").alias("term")
    ).filter(F.col("term").isNotNull())
    return toks.groupBy("doc_id", "term", "dl").agg(F.count("*").alias("tf"))


def corpus_stats(postings: DataFrame) -> DataFrame:
    """(n_docs, avgdl) — one tiny row, reference bm25_store.py:145-152."""
    per_doc = postings.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    return per_doc.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def document_frequency(postings: DataFrame) -> DataFrame:
    """(term, df) — reference bm25_store.py:200-207."""
    return postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))


def build_postings_index(
    spark,
    docs: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Materialize the inverted index ONCE as a term-bucketed warehouse
    table (+ a 1-row ``{name}_stats`` table), the Spark analog of the
    reference's persistent FTS5 index (keyword_store/sqlite_store.py:
    376-421).

    df (document frequency) is joined onto each posting row at BUILD
    time — the join shuffles on `term`, which is exactly the bucket key
    the write needs, so it costs nothing extra — and query-time scoring
    becomes: bucket-pruned scan → broadcast stats → arithmetic → top-k.
    At 100 TB the per-query cost is O(postings of the query terms), not
    O(corpus): the isin(term) predicate prunes buckets AND pushes into
    the parquet scan.
    """
    postings = build_postings(docs, id_col, text_col)
    with_df = postings.join(document_frequency(postings), "term")
    writer = with_df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", f"{path}/{name}")
    writer.bucketBy(num_buckets, "term").sortBy("term").saveAsTable(name)

    stats_writer = corpus_stats(spark.table(name)).write.mode("overwrite").format(
        "parquet"
    )
    if path is not None:
        stats_writer = stats_writer.option("path", f"{path}/{name}_stats")
    stats_writer.saveAsTable(f"{name}_stats")


def _bm25_score(
    matched: DataFrame,
    k: int,
    k1: float,
    b: float,
    score_decimals: int,
) -> DataFrame:
    """Shared BM25 arithmetic over matched postings carrying
    (doc_id, tf, dl, df, n_docs, avgdl).

    idf = ln((N - df + 0.5)/(df + 0.5) + 1)
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    (reference: bm25_store.py:212-249)
    """
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = matched.select("doc_id", (idf * tf_part).alias("term_score"))
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), score_decimals).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_from_index(
    spark,
    index_name: str,
    query: str,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """T3/X2 against a prebuilt index (build_postings_index): scans the
    postings table only — never the documents table — with bucket
    pruning on the query terms."""
    q_terms = sorted({t for t in _py_tokenize(query)})
    postings = spark.table(index_name).filter(F.col("term").isin(q_terms))
    stats = spark.table(f"{index_name}_stats")
    matched = postings.crossJoin(F.broadcast(stats))
    return _bm25_score(matched, k, k1, b, score_decimals)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """BM25 top-k over a raw document table (X2 + T3), ad-hoc path.

    Builds the postings for THIS query only; for repeated queries use
    build_postings_index + bm25_topk_from_index (the postings build is a
    full corpus tokenize+shuffle you don't want per query). The postings
    are persisted for the three uses inside the query (stats, dfs,
    match), the ≤k-row result is materialized eagerly, and the cache is
    ALWAYS released — repeated ad-hoc queries leave no cached RDDs.
    """
    spark = docs.sparkSession
    q_terms = sorted({t for t in _py_tokenize(query)})
    postings = build_postings(docs, id_col, text_col).persist()
    try:
        stats = corpus_stats(postings)
        df_tbl = document_frequency(postings)
        matched = (
            postings.filter(F.col("term").isin(q_terms))
            .join(F.broadcast(df_tbl.filter(F.col("term").isin(q_terms))), "term")
            .crossJoin(F.broadcast(stats))
        )
        result = _bm25_score(matched, k, k1, b, score_decimals)
        rows = result.collect()  # ≤ k rows — driver-safe at any scale
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        postings.unpersist()


def tfidf_topk(
    docs: DataFrame,
    query: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_decimals: int = 6,
) -> DataFrame:
    """Length-normalized TF-IDF top-k (the BM25 sibling without
    saturation): score = Σ_t (tf/dl) · ln((N+1)/(df+1))."""
    spark = docs.sparkSession
    q_terms = sorted({t for t in _py_tokenize(query)})
    postings = build_postings(docs, id_col, text_col).persist()
    try:
        stats = corpus_stats(postings)
        df_tbl = document_frequency(postings)
        matched = (
            postings.filter(F.col("term").isin(q_terms))
            .join(F.broadcast(df_tbl.filter(F.col("term").isin(q_terms))), "term")
            .crossJoin(F.broadcast(stats))
        )
        score = (F.col("tf") / F.col("dl")) * F.log(
            (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
        )
        result = (
            matched.select("doc_id", score.alias("term_score"))
            .groupBy("doc_id")
            .agg(F.round(F.sum("term_score"), score_decimals).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        rows = result.collect()  # ≤ k rows
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        postings.unpersist()


def tfidf_topk_sql(
    query: str,
    k: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    score_decimals: int = 6,
) -> str:
    """DuckDB twin of :func:`tfidf_topk`."""
    q_terms = sorted({t for t in _py_tokenize(query)})
    terms_sql = ", ".join(f"('{t}')" for t in q_terms)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tokens
  FROM {table}
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  GROUP BY doc_id, dl, t.term
),
stats AS (
  SELECT count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id FROM postings)
),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term),
qterms(term) AS (VALUES {terms_sql})
SELECT p.doc_id,
       round(sum((p.tf::DOUBLE / p.dl) * ln((s.n_docs + 1.0) / (d.df + 1.0))),
             {score_decimals}) AS score
FROM postings p JOIN dfs d USING (term) JOIN qterms q USING (term), stats s
GROUP BY p.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def more_like_this(
    docs: DataFrame,
    anchor_id: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_decimals: int = 6,
) -> DataFrame:
    """(doc_id, score) — documents most similar to ``anchor_id`` by
    TF-IDF COSINE in term space (the lexical complement to the
    embedding-space neighbors_of_item). Weights w = (tf/dl) ·
    ln((N+1)/(df+1)), cosine over full per-doc weight vectors.

    Scale shape: the anchor's weighted terms are ONE document's rows
    (broadcast); candidate scoring joins only postings OF THOSE TERMS
    — O(anchor terms × their posting lists), never corpus × corpus.
    Per-doc norms are one map-side-combined aggregation over the
    weighted postings (an index-time artifact in a served system)."""
    spark = docs.sparkSession
    postings = build_postings(docs, id_col, text_col)
    stats = corpus_stats(postings)
    dfs = document_frequency(postings)
    w_expr = (F.col("tf") / F.col("dl")) * F.log(
        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
    )
    weighted = (
        postings.join(dfs, "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", w_expr.alias("w"))
        .persist()
    )
    try:
        norms = weighted.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
        )
        anchor = weighted.filter(F.col("doc_id") == anchor_id).select(
            "term", F.col("w").alias("wa")
        )
        anorm = norms.filter(F.col("doc_id") == anchor_id).select(
            F.col("nrm").alias("anrm")
        )
        dots = (
            weighted.join(F.broadcast(anchor), "term")
            .filter(F.col("doc_id") != anchor_id)
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("wa")).alias("dot"))
        )
        result = (
            dots.join(norms, "doc_id")
            .crossJoin(F.broadcast(anorm))
            .select(
                "doc_id",
                F.round(
                    F.col("dot") / (F.col("nrm") * F.col("anrm")),
                    score_decimals,
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        rows = result.collect()  # ≤ k rows
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        weighted.unpersist()


def more_like_this_sql(
    anchor_id: int, k: int, score_decimals: int = 6
) -> str:
    """DuckDB twin of :func:`more_like_this`."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tokens
  FROM documents
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  GROUP BY doc_id, dl, t.term
),
stats AS (SELECT count(*) AS n_docs FROM (SELECT DISTINCT doc_id FROM postings)),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term),
weighted AS MATERIALIZED (
  SELECT p.doc_id, p.term,
         (p.tf::DOUBLE / p.dl) * ln((s.n_docs + 1.0) / (d.df + 1.0)) AS w
  FROM postings p JOIN dfs d USING (term), stats s
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM weighted GROUP BY doc_id),
anchor AS (SELECT term, w AS wa FROM weighted WHERE doc_id = {anchor_id}),
anorm AS (SELECT nrm AS anrm FROM norms WHERE doc_id = {anchor_id}),
dots AS (
  SELECT v.doc_id, sum(v.w * a.wa) AS dot
  FROM weighted v JOIN anchor a USING (term)
  WHERE v.doc_id <> {anchor_id}
  GROUP BY v.doc_id
)
SELECT d.doc_id, round(d.dot / (n.nrm * an.anrm), {score_decimals}) AS score
FROM dots d JOIN norms n USING (doc_id), anorm an
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def like_search(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    constant_score: float = 0.6,
) -> DataFrame:
    """LIKE-fallback OR-chain with constant score (X4; reference
    sqlite_store.py:424-431)."""
    cond = None
    for t in terms:
        c = F.lower(F.col(text_col)).contains(t.lower())
        cond = c if cond is None else (cond | c)
    return docs.filter(cond).select(
        F.col(id_col).alias("doc_id"), F.lit(constant_score).alias("score")
    )


def _py_tokenize(text: str) -> list[str]:
    """Driver-side tokenizer — must match functions.text.tokenize."""
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


# ---------------------------------------------------------------------------
# phrase search (FTS5 "exact phrase" MATCH semantics)
# ---------------------------------------------------------------------------

def phrase_occurrences(tokens_col, phrase: list[str]):
    """Column: occurrences of the exact token sequence in a TOKEN-ARRAY
    column (pass `tokenize(text)` PROJECTED as its own column first —
    see phrase_search).

    SQLite FTS5 (the reference's keyword backend, keyword_store/
    sqlite_store.py:376-421) matches quoted phrases on token adjacency,
    not substrings — "fast table" must appear as consecutive TOKENS.
    Re-expressed as a JVM-side higher-order filter: count positions i
    where tokens[i+j] == phrase[j] for all j (element_at comparisons —
    no per-position array allocation, short-circuits on first
    mismatch). Zero shuffle; rides the corpus scan.

    The argument must be an ATTRIBUTE (a projected column), not an
    inline `tokenize(...)` expression: Spark does no common-
    subexpression elimination inside lambda bodies, so an inline
    tokenizer would re-split the whole document at EVERY position —
    O(n_tokens × tokenize) per row (measured 10× slower at sf0.1).
    Multiple outer references to the attribute also stop
    CollapseProject from inlining the tokenizer back in.
    """
    m = len(phrase)
    tk = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    starts = F.sequence(F.lit(1), F.size(tk) - m + 1)

    def _match(i):
        cond = F.element_at(tk, i) == F.lit(phrase[0])
        for j, t in enumerate(phrase[1:], start=1):
            cond = cond & (F.element_at(tk, i + j) == F.lit(t))
        return cond

    hits = F.filter(starts, _match)
    return F.when(F.size(tk) >= m, F.size(hits)).otherwise(0).cast("long")


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by exact-phrase occurrence count (count desc, id asc).

    The single-scan variant: right for ad-hoc phrases. For repeated
    phrase workloads at corpus scale, build positional postings once
    (build_positional_postings) and use phrase_search_indexed — the
    m-way position join touches only the phrase's terms' postings.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("__tk"))
    n = phrase_occurrences("__tk", phrase)
    # filter AFTER the top-k: counts order descending, so dropping zero
    # rows post-limit is set-equivalent to filtering first — and keeps
    # Catalyst from pushing the predicate below the token projection,
    # where it would re-inline the tokenizer into every element_at
    # (the no-CSE pathology phrase_occurrences documents)
    return (
        toks.select("doc_id", n.alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
        .filter(F.col("n_occurrences") > 0)
    )


def build_positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, pos) positional postings — the index FTS5 keeps
    per token to answer phrase/NEAR queries. One explode + no
    aggregation; bucket/sort by term when materializing (same layout as
    build_postings_index) so a phrase query scans only its terms."""
    from memfuse_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(docs)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(tokenize(text_col))
    ).select("doc_id", F.col("col").alias("term"), (F.col("pos") + 1).alias("pos"))


def phrase_search_indexed(
    postings: DataFrame, phrase: list[str], k: int
) -> DataFrame:
    """Phrase top-k from positional postings: anchor on the first term's
    positions, then an equi-join per subsequent term on
    (doc_id, pos == anchor_pos + i) — each join shuffles only that
    term's postings (term-bucketed at scale ⇒ bucket-pruned scans,
    no corpus scan). Same output contract as phrase_search."""
    matched = postings.filter(F.col("term") == phrase[0]).select("doc_id", "pos")
    for i, t in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        matched = matched.join(nxt, ["doc_id", "pos"])
    return (
        matched.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_search_sql(
    phrase: list[str],
    k: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`phrase_search` (same tokenizer, same
    adjacency semantics via 1-based list slicing)."""
    m = len(phrase)
    lits = "[" + ", ".join(f"'{t}'" for t in phrase) + "]"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tk
  FROM {table}
),
counted AS (
  SELECT doc_id,
         CAST(len(list_filter(range(1, len(tk) - {m} + 2),
                              i -> tk[i:i + {m} - 1] = {lits})) AS BIGINT)
           AS n_occurrences
  FROM toks
)
SELECT doc_id, n_occurrences FROM counted
WHERE n_occurrences > 0
ORDER BY n_occurrences DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_sql(
    query: str,
    k: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> str:
    """DuckDB oracle twin of :func:`bm25_topk` (same math, same tokenizer)."""
    q_terms = sorted({t for t in _py_tokenize(query)})
    terms_sql = ", ".join(f"('{t}')" for t in q_terms)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tokens
  FROM {table}
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  GROUP BY doc_id, dl, t.term
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT doc_id, any_value(dl) AS dl FROM postings GROUP BY doc_id)
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
),
qterms(term) AS (VALUES {terms_sql}),
matched AS (
  SELECT p.doc_id, p.tf, p.dl, d.df, s.n_docs, s.avgdl
  FROM postings p JOIN dfs d USING (term) JOIN qterms q USING (term), stats s
)
SELECT doc_id,
       round(sum(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)
                 * tf*({k1}+1) / (tf + {k1}*(1 - {b} + {b}*dl/avgdl))),
             {score_decimals}) AS score
FROM matched
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def proximity_search(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR/k: top-k docs by the number of (pos_a, pos_b) co-occurrences
    with |pos_a - pos_b| <= window (either order) — the FTS5 NEAR
    operator over positional postings.

    Plan shape: the positional explode filters to the TWO query terms
    before any join (term-bucketed postings prune to two buckets at
    scale), then a doc-keyed equi-join with a map-side band predicate —
    per-doc position lists are small, so the band never explodes."""
    postings = build_positional_postings(docs, id_col, text_col)
    pa = postings.filter(F.col("term") == term_a).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    pb = postings.filter(F.col("term") == term_b).select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    return (
        pa.join(pb, "doc_id")
        .filter(F.abs(F.col("pos_a") - F.col("pos_b")) <= window)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_near"))
        .orderBy(F.desc("n_near"), F.asc("doc_id"))
        .limit(k)
    )


def proximity_search_sql(
    tokenize_sql: str, term_a: str, term_b: str, window: int, k: int
) -> str:
    """DuckDB twin of :func:`proximity_search`."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokenize_sql}) AS term,
         generate_subscripts({tokenize_sql}, 1) AS pos
  FROM documents
),
pa AS (SELECT doc_id, pos AS pos_a FROM toks WHERE term = '{term_a}'),
pb AS (SELECT doc_id, pos AS pos_b FROM toks WHERE term = '{term_b}')
SELECT pa.doc_id, CAST(count(*) AS BIGINT) AS n_near
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE abs(pos_a - pos_b) <= {window}
GROUP BY pa.doc_id
ORDER BY n_near DESC, pa.doc_id ASC
LIMIT {k}
"""


SPELLFIX_MAX_DIST = 2


def spellfix_topk(
    docs: DataFrame,
    query: str,
    k: int,
    max_dist: int = SPELLFIX_MAX_DIST,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """Typo-tolerant BM25 (the FTS5-spellfix shape): each query term is
    corrected to the closest corpus-vocabulary term (levenshtein <=
    max_dist; ties broken by corpus frequency DESC then term ASC —
    fully deterministic), then standard BM25 runs on the corrected
    terms. Terms with no in-budget candidate drop out, exactly like
    unknown terms in plain BM25.

    Two-job shape (the RM3 convention): job 1 scans the vocabulary
    against the (broadcast, few-row) query-term list and collects the
    per-term best corrections — query-term-count rows, not data; job 2
    is the ordinary BM25 plan. At scale the vocabulary table is tiny
    relative to the corpus and would be the prebuilt `{index}_df` side
    table; a served system would swap the scan for a FastSS variant
    index (typo_pairs' blocking) — same contract.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    q_terms = sorted({t for t in _py_tokenize(query)})
    if not q_terms:
        return bm25_topk(docs, "", k, id_col, text_col, k1, b, score_decimals)
    postings = build_postings(docs, id_col, text_col)
    vocab = postings.groupBy("term").agg(F.sum("tf").alias("freq"))
    qdf = spark.createDataFrame([(t,) for t in q_terms], "qterm string")
    cand = (
        vocab.crossJoin(F.broadcast(qdf))
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("freq"), F.asc("term")
    )
    corrected = sorted(
        {
            r.term
            for r in cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("term")
            .collect()
        }
    )
    return bm25_topk(
        docs, " ".join(corrected), k, id_col, text_col, k1, b, score_decimals
    )


def spellfix_topk_sql(
    query: str,
    k: int,
    max_dist: int = SPELLFIX_MAX_DIST,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> str:
    """DuckDB twin of :func:`spellfix_topk`: same vocabulary-nearest
    correction (levenshtein parity between engines is established by
    typo_pairs), same BM25."""
    q_terms = sorted({t for t in _py_tokenize(query)})
    terms_sql = ", ".join(f"('{t}')" for t in q_terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tokens
  FROM documents
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  GROUP BY doc_id, dl, t.term
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT doc_id, any_value(dl) AS dl FROM postings GROUP BY doc_id)
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
),
vocab AS (SELECT term, sum(tf) AS freq FROM postings GROUP BY term),
rawq(qterm) AS (VALUES {terms_sql}),
corr AS (
  SELECT DISTINCT term FROM (
    SELECT v.term,
           row_number() OVER (PARTITION BY q.qterm
                              ORDER BY levenshtein(q.qterm, v.term) ASC,
                                       v.freq DESC, v.term ASC) AS rn
    FROM rawq q JOIN vocab v ON levenshtein(q.qterm, v.term) <= {max_dist}
  ) WHERE rn = 1
),
matched AS (
  SELECT p.doc_id, p.tf, p.dl, d.df, s.n_docs, s.avgdl
  FROM postings p JOIN dfs d USING (term) JOIN corr q USING (term), stats s
)
SELECT doc_id,
       round(sum(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)
                 * tf*({k1}+1) / (tf + {k1}*(1 - {b} + {b}*dl/avgdl))),
             {score_decimals}) AS score
FROM matched
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback (query expansion)
# ---------------------------------------------------------------------------

RM3_FB_DOCS = 10
RM3_FB_TERMS = 10
RM3_ORIG_WEIGHT = 0.5


def rm3_topk(
    docs: DataFrame,
    query: str,
    k: int,
    fb_docs: int = RM3_FB_DOCS,
    fb_terms: int = RM3_FB_TERMS,
    orig_weight: float = RM3_ORIG_WEIGHT,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """RM3 pseudo-relevance-feedback retrieval (Lavrenko & Croft relevance
    models + Jelinek-Mercer interpolation — the classic anserini/Indri
    default the reference's keyword store lacks; its BM25 store scores the
    literal query only, `store/keyword_store/bm25_store.py:212-249`).

    Pass 1: BM25 top-``fb_docs`` for the raw query. Relevance model:
    P(t|RM1) = sum_d P(t|d) * w(d) with P(t|d) = tf/dl and w(d) the
    pass-1 score normalized over the feedback set; top-``fb_terms`` terms
    by that weight. Final term weights interpolate the uniform original
    query model with the normalized RM1 model:
    w(t) = lam * 1/|Q| * [t in Q] + (1-lam) * P(t|RM1)/sum(selected).
    Pass 2: weighted-BM25 over the union vocabulary, top-k.

    Plan shape: both passes are broadcast equi-joins against the postings
    table (at scale: the bucketed index, pruned to <= |Q|+fb_terms term
    buckets); the feedback artifacts (fb_docs rows, fb_terms+|Q| weights)
    stay tiny and broadcast — no corpus shuffle beyond the one postings
    groupBy, no driver collect of anything unbounded.
    """
    spark = docs.sparkSession
    q_terms = sorted({t for t in _py_tokenize(query)})
    lam = orig_weight
    qw = 1.0 / len(q_terms)
    postings = build_postings(docs, id_col, text_col).persist()
    try:
        stats = corpus_stats(postings)
        df_tbl = document_frequency(postings)
        qdf = spark.createDataFrame([(t,) for t in q_terms], "term string")
        matched1 = (
            postings.join(F.broadcast(qdf), "term")
            .join(F.broadcast(df_tbl), "term")
            .crossJoin(F.broadcast(stats))
        )
        pass1 = _bm25_score(matched1, fb_docs, k1, b, score_decimals)
        total = pass1.agg(F.sum("score").alias("total"))
        rm1 = (
            postings.join(F.broadcast(pass1), "doc_id")
            .crossJoin(F.broadcast(total))
            .groupBy("term")
            .agg(
                F.round(
                    F.sum(
                        (F.col("tf").cast("double") / F.col("dl"))
                        * (F.col("score") / F.col("total"))
                    ),
                    6,
                ).alias("w")
            )
        )
        top_terms = rm1.orderBy(F.desc("w"), F.asc("term")).limit(fb_terms)
        fb_sum = top_terms.agg(F.sum("w").alias("s"))
        weights = (
            qdf.withColumn("qw", F.lit(qw))
            .join(top_terms, "term", "full_outer")
            .crossJoin(F.broadcast(fb_sum))
            .select(
                "term",
                F.round(
                    lam * F.coalesce(F.col("qw"), F.lit(0.0))
                    + (1.0 - lam)
                    * F.coalesce(F.col("w") / F.col("s"), F.lit(0.0)),
                    9,
                ).alias("wt"),
            )
        )
        matched2 = (
            postings.join(F.broadcast(weights), "term")
            .join(F.broadcast(df_tbl), "term")
            .crossJoin(F.broadcast(stats))
        )
        idf = F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        tf_part = (F.col("tf") * (k1 + 1)) / (
            F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        scored = matched2.select(
            "doc_id", (F.col("wt") * idf * tf_part).alias("term_score")
        )
        result = (
            scored.groupBy("doc_id")
            .agg(F.round(F.sum("term_score"), score_decimals).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        rows = result.collect()  # <= k rows — driver-safe at any scale
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        postings.unpersist()


def rm3_topk_sql(
    query: str,
    k: int,
    fb_docs: int = RM3_FB_DOCS,
    fb_terms: int = RM3_FB_TERMS,
    orig_weight: float = RM3_ORIG_WEIGHT,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> str:
    """DuckDB oracle twin of :func:`rm3_topk` (same math, tokenizer,
    rounding boundaries, and tie-breaks at both top-N cutoffs)."""
    q_terms = sorted({t for t in _py_tokenize(query)})
    terms_sql = ", ".join(f"('{t}')" for t in q_terms)
    lam = orig_weight
    qw = 1.0 / len(q_terms)
    idf = "ln((n_docs - df + 0.5)/(df + 0.5) + 1.0)"
    tfp = f"tf*({k1}+1) / (tf + {k1}*(1 - {b} + {b}*dl/avgdl))"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tokens
  FROM {table}
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  GROUP BY doc_id, dl, t.term
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT doc_id, any_value(dl) AS dl FROM postings GROUP BY doc_id)
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
),
qterms(term) AS (VALUES {terms_sql}),
matched1 AS (
  SELECT p.doc_id, p.tf, p.dl, d.df, s.n_docs, s.avgdl
  FROM postings p JOIN dfs d USING (term) JOIN qterms q USING (term), stats s
),
pass1 AS (
  SELECT doc_id, round(sum({idf} * {tfp}), {score_decimals}) AS score
  FROM matched1 GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT {fb_docs}
),
tot AS (SELECT sum(score) AS total FROM pass1),
rm1 AS (
  SELECT p.term,
         round(sum((CAST(p.tf AS DOUBLE)/p.dl) * (f.score/t.total)), 6) AS w
  FROM postings p JOIN pass1 f USING (doc_id), tot t
  GROUP BY p.term
),
fbterms AS (SELECT term, w FROM rm1 ORDER BY w DESC, term ASC LIMIT {fb_terms}),
fbsum AS (SELECT sum(w) AS s FROM fbterms),
weights AS (
  SELECT term,
         round({lam} * coalesce(q.qw, 0.0)
               + {1.0 - lam} * coalesce(f.w / fs.s, 0.0), 9) AS wt
  FROM (SELECT term, CAST({qw} AS DOUBLE) AS qw FROM qterms) q
  FULL OUTER JOIN fbterms f USING (term), fbsum fs
),
matched2 AS (
  SELECT p.doc_id, p.tf, p.dl, w.wt, d.df, s.n_docs, s.avgdl
  FROM postings p JOIN weights w USING (term) JOIN dfs d USING (term), stats s
)
SELECT doc_id, round(sum(wt * {idf} * {tfp}), {score_decimals}) AS score
FROM matched2 GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def rm3_topk_from_index(
    spark,
    index_name: str,
    query: str,
    k: int,
    docs: DataFrame | None = None,
    fb_docs: int = RM3_FB_DOCS,
    fb_terms: int = RM3_FB_TERMS,
    orig_weight: float = RM3_ORIG_WEIGHT,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """:func:`rm3_topk` against a prebuilt index (build_postings_index) —
    no per-query corpus tokenize/shuffle. Pass 1 and pass 2 scan the
    term-bucketed postings table with static ``isin`` predicates (bucket
    pruning + parquet pushdown). The relevance model is mined from the
    <= ``fb_docs`` feedback documents themselves: with ``docs`` given,
    an id-pruned scan of the raw table re-tokenizes JUST those rows
    (identical tf/dl to the index by construction — same tokenizer);
    without it, the term-keyed index is scanned once. Two tiny mid-query
    actions (feedback rows, weight rows) keep every downstream subplan
    static — driver-safe at any corpus size. Same math and rounding
    boundaries as the ad-hoc path.
    """
    q_terms = sorted({t for t in _py_tokenize(query)})
    lam = orig_weight
    qw = 1.0 / len(q_terms)
    postings = spark.table(index_name)  # (term, doc_id, tf, dl, df)
    stats = spark.table(f"{index_name}_stats")
    matched1 = postings.filter(F.col("term").isin(q_terms)).crossJoin(
        F.broadcast(stats)
    )
    pass1 = _bm25_score(matched1, fb_docs, k1, b, score_decimals)
    # materialize the <= fb_docs feedback rows ONCE — pass1 feeds three
    # downstream subplans (doc join, score total, and transitively the
    # weight table) and would otherwise re-run its pruned scan per use
    pass1_rows = pass1.collect()
    pass1 = spark.createDataFrame(pass1_rows, schema=pass1.schema)
    total = pass1.agg(F.sum("score").alias("total"))
    if docs is not None:
        fb_ids = [r["doc_id"] for r in pass1_rows]
        fb_postings = build_postings(
            docs.filter(F.col(id_col).isin(fb_ids)), id_col, text_col
        )
    else:
        fb_postings = postings
    rm1 = (
        fb_postings.join(F.broadcast(pass1), "doc_id")
        .crossJoin(F.broadcast(total))
        .groupBy("term")
        .agg(
            F.round(
                F.sum(
                    (F.col("tf").cast("double") / F.col("dl"))
                    * (F.col("score") / F.col("total"))
                ),
                6,
            ).alias("w")
        )
    )
    top_terms = rm1.orderBy(F.desc("w"), F.asc("term")).limit(fb_terms)
    fb_sum = top_terms.agg(F.sum("w").alias("s"))
    qdf = spark.createDataFrame([(t,) for t in q_terms], "term string")
    weights = (
        qdf.withColumn("qw", F.lit(qw))
        .join(top_terms, "term", "full_outer")
        .crossJoin(F.broadcast(fb_sum))
        .select(
            "term",
            F.round(
                lam * F.coalesce(F.col("qw"), F.lit(0.0))
                + (1.0 - lam)
                * F.coalesce(F.col("w") / F.col("s"), F.lit(0.0)),
                9,
            ).alias("wt"),
        )
    )
    wrows = weights.collect()  # <= |Q| + fb_terms rows
    wdf = spark.createDataFrame(wrows, schema=weights.schema)
    terms2 = sorted(r["term"] for r in wrows)
    matched2 = (
        postings.filter(F.col("term").isin(terms2))
        .join(F.broadcast(wdf), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = matched2.select(
        "doc_id", (F.col("wt") * idf * tf_part).alias("term_score")
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), score_decimals).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# incrementally-maintainable index (v2: df/stats kept OUT of posting rows)
# ---------------------------------------------------------------------------

def build_postings_index_v2(
    spark,
    docs: DataFrame,
    name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Index layout for INCREMENTAL maintenance: the term-bucketed
    postings table carries (term, doc_id, tf, dl) only; document
    frequency lives in a separate tiny ``{name}_df`` table and corpus
    stats in ``{name}_stats``. Appending a document batch then touches
    three algebraic pieces — new posting rows (pure append), df += df
    of the delta (keyed add), stats re-derived from two sums — and
    NEVER rewrites existing posting rows (the v1 layout embeds df on
    every row, so one new occurrence of a term would dirty every
    posting of that term). Query-time cost is one extra broadcast join
    of the query terms' df rows — a few rows.
    """

    def _loc(writer, suffix=""):
        if path is not None:
            writer = writer.option("path", f"{path}/{name}{suffix}")
        return writer

    postings = build_postings(docs, id_col, text_col)
    _loc(
        postings.write.mode("overwrite").format("parquet")
    ).bucketBy(num_buckets, "term").sortBy("term").saveAsTable(name)
    _loc(
        document_frequency(spark.table(name))
        .write.mode("overwrite")
        .format("parquet"),
        "_df",
    ).saveAsTable(f"{name}_df")
    _loc(
        corpus_stats(spark.table(name)).write.mode("overwrite").format("parquet"),
        "_stats",
    ).saveAsTable(f"{name}_stats")


def update_postings_index_v2(
    spark,
    name: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Append a document batch to a v2 index: postings of the delta are
    INSERTed (bucketed append — only the delta shuffles), df merges by
    keyed addition, stats recombine from (n_docs, avgdl) pairs as the
    weighted mean. Cost scales with the batch, not the corpus — the
    incremental contract `test_keyword.py` asserts against a full
    rebuild."""
    delta = build_postings(new_docs, id_col, text_col)
    delta.write.mode("append").format("parquet").insertInto(name)

    old_df = spark.table(f"{name}_df")
    merged_df = (
        old_df.unionByName(document_frequency(delta))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    old_stats = spark.table(f"{name}_stats")
    delta_stats = corpus_stats(delta)
    merged_stats = (
        old_stats.select("n_docs", "avgdl")
        .unionByName(delta_stats.select("n_docs", "avgdl"))
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            (
                F.sum(F.col("avgdl") * F.col("n_docs")) / F.sum("n_docs")
            ).alias("avgdl"),
        )
    )
    # the side tables are O(vocab) and O(1) rows — rewritten whole, but
    # via localCheckpoint (executor-side materialization that truncates
    # lineage) so the overwrite no longer references the table it reads
    # and nothing vocab-sized ever lands on the driver
    from memfuse_spark import cache as _cache

    for tbl, df_new in ((f"{name}_df", merged_df), (f"{name}_stats", merged_stats)):
        # tracked checkpoint: DataFrame.unpersist() does NOT release a
        # localCheckpoint's underlying RDD blocks — release by RDD id
        # (the graph/kcore discipline) or repeated updates leak 2
        # cached RDDs each
        snap, snap_ids = _cache.tracked_local_checkpoint(
            df_new, "keyword.update_v2"
        )
        writer = snap.write.mode("overwrite").format("parquet")
        if path is not None:
            suffix = tbl[len(name):]
            writer = writer.option("path", f"{path}/{name}{suffix}")
        writer.saveAsTable(tbl)
        _cache.unpersist_rdd_ids(spark, snap_ids)


def compact_postings_index_v2(
    spark,
    name: str,
    num_buckets: int = 16,
    path: str | None = None,
) -> dict:
    """Segment-merge compaction for a v2 index — the lakehouse
    OPTIMIZE step for the inverted index. Each incremental
    :func:`update_postings_index_v2` appends ≥1 file per non-empty
    bucket, so after N batches a bucket holds ~N small unsorted
    segments and query latency degrades linearly in segment count.
    Compaction shadow-writes the accumulated postings into a FRESH
    bucketed table (`repartition(num_buckets, term)` aligns one task
    per bucket → exactly one sorted file each), re-derives df and
    stats from the postings themselves (self-healing: any drift the
    keyed-add side tables accumulated is repaired), then swaps the
    catalog name. On a lakehouse the swap is `REPLACE TABLE` /
    `OPTIMIZE`; plain parquet tables get drop+rename, which is
    single-writer only (noted, not hidden).

    Returns ``{"files_before": int, "files_after": int}``.
    """
    import shutil
    import uuid

    files_before = len(spark.table(name).inputFiles())
    tmp = f"{name}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    # repartition by the BUCKET ID expression (pmod(murmur3, n) — the
    # same formula the bucketed writer uses), not by the raw column:
    # that co-locates every row of a bucket in one task, so each
    # non-empty bucket gets exactly one output file even when AQE
    # re-lays-out the shuffle read
    bucket_id = F.pmod(F.hash("term"), F.lit(num_buckets))
    writer = (
        spark.table(name)
        .repartition(num_buckets, bucket_id)
        .write.mode("overwrite")
        .format("parquet")
    )
    old_loc = None
    if path is not None:
        # The superseded segment directory is the table's ACTUAL
        # location (after a first compaction that is
        # {path}/{name}__g<tag>, not the {path}/{name} convention) —
        # read it from the catalog so a second compaction reclaims the
        # real directory instead of rmtree'ing a nonexistent path and
        # leaking the old segment.
        desc = spark.sql(f"DESCRIBE EXTENDED {name}").collect()
        loc = next(
            (r.data_type for r in desc if r.col_name == "Location"), None
        )
        if loc is not None:
            old_loc = loc.removeprefix("file:")
        writer = writer.option("path", f"{path}/{name}__g{uuid.uuid4().hex[:8]}")
    writer.bucketBy(num_buckets, "term").sortBy("term").saveAsTable(tmp)

    # re-derive the side tables from the compacted postings (tiny:
    # O(vocab) and O(1) rows; localCheckpoint breaks the read-write
    # cycle exactly as update_postings_index_v2 does)
    from memfuse_spark import cache as _cache

    compacted = spark.table(tmp)
    for suffix, df_new in (
        ("_df", document_frequency(compacted)),
        ("_stats", corpus_stats(compacted)),
    ):
        # tracked checkpoint (see update_postings_index_v2): plain
        # DataFrame.unpersist() leaks the checkpoint's RDD blocks
        snap, snap_ids = _cache.tracked_local_checkpoint(
            df_new, "keyword.compact_v2"
        )
        w = snap.write.mode("overwrite").format("parquet")
        if path is not None:
            w = w.option("path", f"{path}/{name}{suffix}")
        w.saveAsTable(f"{name}{suffix}")
        _cache.unpersist_rdd_ids(spark, snap_ids)

    spark.sql(f"DROP TABLE {name}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {name}")
    # self-heal the served side tables (norms / FastSS variants) if the
    # index carries them: they are exact-as-of-last-compaction artifacts
    # (incremental updates leave them stale by design — O(batch) appends
    # cannot rewrite corpus-sized tables), so compaction is where they
    # re-sync with the postings
    if spark.catalog.tableExists(f"{name}_norms"):
        build_norms_index_v2(spark, name, num_buckets, path)
    if spark.catalog.tableExists(f"{name}_delvar"):
        build_spellfix_index_v2(spark, name, path)
    if old_loc is not None:
        # reclaim the superseded segment files (local FS here; a real
        # deployment reclaims via the table format's vacuum)
        shutil.rmtree(old_loc, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": len(spark.table(name).inputFiles()),
    }


def bm25_topk_from_index_v2(
    spark,
    name: str,
    query: str,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """BM25 against a v2 index: bucket-pruned postings scan + broadcast
    join of the query terms' df rows + broadcast stats."""
    q_terms = sorted({t for t in _py_tokenize(query)})
    postings = spark.table(name).filter(F.col("term").isin(q_terms))
    dfs = spark.table(f"{name}_df").filter(F.col("term").isin(q_terms))
    stats = spark.table(f"{name}_stats")
    matched = postings.join(F.broadcast(dfs), "term").crossJoin(
        F.broadcast(stats)
    )
    return _bm25_score(matched, k, k1, b, score_decimals)


def bm25_topk_from_stream_index(
    spark,
    out_base: str,
    query: str,
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """BM25 against a streaming-maintained index (streaming/buffer.
    index_ingest_stream): postings are filtered to the query terms
    (partition-pruned epoch layout), the per-epoch df partials merge by
    keyed SUM and the stats partials recombine as the weighted mean —
    the associative-merge read side of the mergeable-partial design.
    Scores equal the ad-hoc / v2-index paths by construction."""
    import os

    q_terms = sorted({t for t in _py_tokenize(query)})
    postings = (
        spark.read.parquet(os.path.join(out_base, "postings"))
        .filter(F.col("term").isin(q_terms))
    )
    dfs = (
        spark.read.parquet(os.path.join(out_base, "dfparts"))
        .filter(F.col("term").isin(q_terms))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    stats = (
        spark.read.parquet(os.path.join(out_base, "statsparts"))
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            (F.sum(F.col("avgdl") * F.col("n_docs")) / F.sum("n_docs")).alias(
                "avgdl"
            ),
        )
    )
    matched = postings.join(F.broadcast(dfs), "term").crossJoin(
        F.broadcast(stats)
    )
    return _bm25_score(matched, k, k1, b, score_decimals)


# ---------------------------------------------------------------------------
# query-likelihood language-model scoring (Dirichlet smoothing)
# ---------------------------------------------------------------------------

QL_MU = 2000.0


def ql_dirichlet_topk(
    docs: DataFrame,
    query: str,
    k: int,
    mu: float = QL_MU,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_decimals: int = 6,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty '01) — the language-modeling alternative to BM25:
    score(d) = Σ_{t∈Q} qtf(t) · ln((tf(t,d) + μ·P(t|C)) / (dl + μ))
    with P(t|C) = cf(t)/|C| the collection model. Documents that miss a
    query term still score (the smoothing term), so EVERY document gets
    a score — ranking reduces to per-doc arithmetic over the query
    terms only.

    Plan: postings build (one shuffle) → collection stats as broadcast
    aggregates → per-(doc, query-term) log term via a broadcast join
    that keeps missing terms through the collection model → top-k. At
    index scale the per-term cf comes from the df table's sibling
    aggregate and the same bucket pruning applies.
    """
    spark = docs.sparkSession
    q_counts: dict[str, int] = {}
    for t in _py_tokenize(query):
        q_counts[t] = q_counts.get(t, 0) + 1
    q_terms = sorted(q_counts)
    postings = build_postings(docs, id_col, text_col).persist()
    try:
        coll = postings.agg(
            F.sum("tf").cast("double").alias("coll_len")
        )
        cf = (
            postings.filter(F.col("term").isin(q_terms))
            .groupBy("term")
            .agg(F.sum("tf").cast("double").alias("cf"))
        )
        qdf = spark.createDataFrame(
            [(t, float(c)) for t, c in sorted(q_counts.items())],
            "term string, qtf double",
        )
        # every (doc, query term) pair — including absent terms, which
        # take tf = 0 and score through the collection model
        dls = postings.groupBy("doc_id").agg(F.first("dl").alias("dl"))
        grid = dls.crossJoin(
            F.broadcast(qdf.join(cf, "term").crossJoin(coll))
        )
        tfs = postings.filter(F.col("term").isin(q_terms)).select(
            "doc_id", "term", "tf"
        )
        # keyed join, NOT broadcast: a common query term's postings are
        # corpus-sized; both sides shuffle on (doc_id, term)
        matched = grid.join(tfs, ["doc_id", "term"], "left").fillna({"tf": 0})
        term_score = F.col("qtf") * F.log(
            (F.col("tf") + mu * (F.col("cf") / F.col("coll_len")))
            / (F.col("dl") + mu)
        )
        result = (
            matched.select("doc_id", term_score.alias("s"))
            .groupBy("doc_id")
            .agg(F.round(F.sum("s"), score_decimals).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        rows = result.collect()  # <= k rows
        return spark.createDataFrame(rows, schema=result.schema)
    finally:
        postings.unpersist()


def ql_dirichlet_topk_sql(
    query: str,
    k: int,
    mu: float = QL_MU,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    score_decimals: int = 6,
) -> str:
    """DuckDB oracle twin of :func:`ql_dirichlet_topk`."""
    q_counts: dict[str, int] = {}
    for t in _py_tokenize(query):
        q_counts[t] = q_counts.get(t, 0) + 1
    qvals = ", ".join(
        f"('{t}', CAST({float(c)} AS DOUBLE))" for t, c in sorted(q_counts.items())
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS tokens
  FROM {table}
),
postings AS (
  SELECT doc_id, len(tokens) AS dl, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  GROUP BY doc_id, dl, t.term
),
coll AS (SELECT CAST(sum(tf) AS DOUBLE) AS coll_len FROM postings),
qterms(term, qtf) AS (VALUES {qvals}),
cf AS (
  SELECT term, CAST(sum(tf) AS DOUBLE) AS cf
  FROM postings JOIN qterms USING (term) GROUP BY term
),
dls AS (SELECT doc_id, any_value(dl) AS dl FROM postings GROUP BY doc_id),
grid AS (
  SELECT d.doc_id, d.dl, q.term, q.qtf, c.cf, l.coll_len
  FROM dls d, qterms q JOIN cf c USING (term), coll l
),
matched AS (
  SELECT g.*, coalesce(p.tf, 0) AS tf
  FROM grid g
  LEFT JOIN postings p ON p.doc_id = g.doc_id AND p.term = g.term
)
SELECT doc_id,
       round(sum(qtf * ln((tf + {mu} * (cf / coll_len)) / (dl + {mu}))),
             {score_decimals}) AS score
FROM matched GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_batch_topk_from_index(
    spark,
    index_name: str,
    queries: dict[int, str],
    k: int,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """(query_id, doc_id, score) — BM25 for a BATCH of queries in ONE
    job: a single bucket-pruned postings scan over the union of all
    query terms, broadcast-joined to the tiny (query_id, term) map,
    scored per (query, doc), per-query top-k window. N queries cost one
    index scan instead of N — the server-side throughput shape
    (reference touts parallel query handling; this is its plan form).
    """
    from pyspark.sql import Window

    rows = [
        (qid, t)
        for qid, q in sorted(queries.items())
        for t in sorted({t for t in _py_tokenize(q)})
    ]
    qterms = spark.createDataFrame(rows, "query_id int, term string")
    all_terms = sorted({t for _, t in rows})
    postings = spark.table(index_name).filter(F.col("term").isin(all_terms))
    stats = spark.table(f"{index_name}_stats")
    matched = postings.join(F.broadcast(qterms), "term").crossJoin(
        F.broadcast(stats)
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matched.select("query_id", "doc_id", (idf * tf_part).alias("term_score"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("term_score"), score_decimals).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


# ---------------------------------------------------------------------------
# served-index artifacts: per-doc norms + FastSS deletion-variant vocabulary
# ---------------------------------------------------------------------------


def build_norms_index_v2(
    spark, name: str, num_buckets: int = 16, path: str | None = None
) -> None:
    """Materialize the per-doc FORWARD side table ``{name}_norms``
    (doc_id, nrm, terms) of a v2 postings index: the TF-IDF norm plus
    the document's sorted distinct term list — the artifacts
    :func:`more_like_this_from_index` reads instead of re-aggregating
    (norm) or corpus-scanning (anchor term lookup) per query.

    w = (tf/dl) · ln((N+1)/(df+1)); nrm = sqrt(Σ_t w²) per document.

    Bucketed by doc_id, so the query-time dots⋈norms join never
    shuffles the corpus-sized norms side AND the anchor's forward row
    is a bucket-pruned point lookup (the postings table itself is
    term-bucketed — a doc_id filter there cannot prune). Norms depend
    on corpus-global df/N, so they are EXACT as of the last
    build/compaction: :func:`update_postings_index_v2` leaves them
    stale (the standard IR-index convention — a batch append cannot
    rewrite a corpus-sized artifact and stay O(batch));
    :func:`compact_postings_index_v2` self-heals them, asserted by the
    lifecycle test."""
    postings = spark.table(name)
    dfs = spark.table(f"{name}_df")
    stats = spark.table(f"{name}_stats")
    w = (F.col("tf") / F.col("dl")) * F.log(
        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
    )
    norms = (
        postings.join(dfs, "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sqrt(F.sum(w * w)).alias("nrm"),
            F.array_sort(F.collect_list("term")).alias("terms"),
        )
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}_norms")
    writer = norms.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", f"{path}/{name}_norms")
    writer.bucketBy(num_buckets, "doc_id").sortBy("doc_id").saveAsTable(
        f"{name}_norms"
    )


def more_like_this_from_index(
    spark,
    name: str,
    anchor_id: int,
    k: int,
    score_decimals: int = 6,
) -> DataFrame:
    """:func:`more_like_this` against a prebuilt v2 index with a
    ``{name}_norms`` side table (build_norms_index_v2) — the served
    shape: per-doc norms are a SCAN, not a per-query re-aggregation of
    the whole corpus, and candidate postings are bucket-pruned to the
    anchor's terms.

    Plan: (1) point-lookup the anchor's term list (≤ one document's
    terms on the driver — the same bounded two-job shape as RM3);
    (2) one isin-pruned postings scan over those terms, broadcast df
    rows, JVM-side weights; (3) dot products grouped by doc_id;
    (4) join the STORED norms table (doc_id-bucketed — no shuffle of
    the corpus side). Per-query cost is O(anchor terms × their posting
    lists), with the only corpus-sized aggregation paid at index time."""
    result = more_like_this_plan(spark, name, anchor_id, k, score_decimals)
    rows = result.collect()  # ≤ k rows
    return spark.createDataFrame(rows, schema=result.schema)


def more_like_this_plan(
    spark,
    name: str,
    anchor_id: int,
    k: int,
    score_decimals: int = 6,
) -> DataFrame:
    """The LAZY plan behind :func:`more_like_this_from_index` (exposed
    so the plan-shape test can assert the norms subtree is a table
    scan, not a re-aggregation)."""
    postings = spark.table(name)
    norms = spark.table(f"{name}_norms").select("doc_id", "nrm")
    # anchor term list: bucket-pruned point lookup on the doc_id-
    # bucketed forward table (≤ one document's distinct terms on the
    # driver — the RM3-style bounded two-job shape)
    fwd = (
        spark.table(f"{name}_norms")
        .filter(F.col("doc_id") == anchor_id)
        .select("terms")
        .collect()
    )
    terms = sorted(fwd[0].terms) if fwd else []
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    dfs = spark.table(f"{name}_df").filter(F.col("term").isin(terms))
    stats = spark.table(f"{name}_stats")
    w_expr = (F.col("tf") / F.col("dl")) * F.log(
        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
    )
    cand = (
        postings.filter(F.col("term").isin(terms))
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
    )
    anchor = cand.filter(F.col("doc_id") == anchor_id).select(
        "term", w_expr.alias("wa")
    )
    dots = (
        cand.filter(F.col("doc_id") != anchor_id)
        .select("doc_id", "term", w_expr.alias("w"))
        .join(F.broadcast(anchor), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("wa")).alias("dot"))
    )
    anorm = norms.filter(F.col("doc_id") == anchor_id).select(
        F.col("nrm").alias("anrm")
    )
    result = (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(anorm))
        .select(
            "doc_id",
            F.round(
                F.col("dot") / (F.col("nrm") * F.col("anrm")), score_decimals
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return result


def _deletion_variants(tok: str) -> list[str]:
    """U2(tok) = {tok} ∪ del1(tok) ∪ del2(tok) — driver-side twin of
    the index-side FastSS variant generator (few query terms only)."""
    out = {tok}
    n = len(tok)
    for i in range(n):
        out.add(tok[:i] + tok[i + 1:])
    for i in range(n - 1):
        for j in range(i + 1, n):
            out.add(tok[:i] + tok[i + 1:j] + tok[j + 1:])
    return sorted(out)


def build_spellfix_index_v2(spark, name: str, path: str | None = None) -> None:
    """Materialize the FastSS (Bocek et al. '07) deletion-variant
    vocabulary index ``{name}_delvar`` (variant, term, freq) from a v2
    postings table — the served replacement for spellfix_topk's
    per-query full-vocabulary levenshtein scan. Same k=2 blocking as
    textanalysis.typo_pairs: dist(a,b) ≤ 2 ⟹ U2(a) ∩ U2(b) ≠ ∅, so a
    query-time EQUI-join on the variant key yields a candidate superset
    verified with levenshtein on candidate-count rows only.

    Full vocabulary (no length/frequency floor — correction must reach
    every term spellfix_topk can reach); fan-out is O(len²) variants
    per term, constant per token. freq (corpus tf sum, the tie-break
    key) is denormalized onto the variant rows; like the norms table
    it is exact as of the last build/compaction."""
    vocab = spark.table(name).groupBy("term").agg(F.sum("tf").alias("freq"))
    del1 = (
        "transform(sequence(1, length(term)), "
        "i -> concat(substring(term, 1, i - 1), "
        "substring(term, i + 1, length(term))))"
    )
    # guard: sequence() DESCENDS when start > stop, so the del2 outer
    # sequence over 1..len-1 must not run for single-char terms
    del2 = (
        "if(length(term) >= 2, "
        "flatten(transform(sequence(1, length(term) - 1), "
        "i -> transform(sequence(i + 1, length(term)), "
        "j -> concat(substring(term, 1, i - 1), "
        "substring(term, i + 1, j - i - 1), "
        "substring(term, j + 1, length(term)))))), "
        "array())"
    )
    delvar = vocab.select(
        "term",
        "freq",
        F.explode(
            F.array_union(
                F.array(F.col("term")),
                F.array_union(F.expr(del1), F.expr(del2)),
            )
        ).alias("variant"),
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}_delvar")
    writer = delvar.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", f"{path}/{name}_delvar")
    writer.saveAsTable(f"{name}_delvar")


def spellfix_topk_from_index(
    spark,
    name: str,
    query: str,
    k: int,
    max_dist: int = SPELLFIX_MAX_DIST,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """:func:`spellfix_topk` against a prebuilt v2 index with a
    ``{name}_delvar`` FastSS side table (build_spellfix_index_v2) —
    the served shape the ad-hoc docstring promises: correction
    candidates come from an index EQUI-join on the deletion-variant
    key (the query's U2 set, a few dozen broadcast rows), never a
    full-vocabulary levenshtein scan; then BM25 serves from the same
    index. Output is identical to spellfix_topk by the FastSS
    completeness bound (requires max_dist ≤ 2, asserted)."""
    from pyspark.sql import Window

    if max_dist > 2:
        raise ValueError(
            f"FastSS k=2 index only covers edit distance <= 2, got {max_dist}"
        )
    q_terms = sorted({t for t in _py_tokenize(query)})
    if not q_terms:
        return bm25_topk_from_index_v2(spark, name, "", k, k1, b, score_decimals)
    qvar = [(t, v) for t in q_terms for v in _deletion_variants(t)]
    qdf = spark.createDataFrame(qvar, "qterm string, variant string")
    cand = (
        spark.table(f"{name}_delvar")
        .join(F.broadcast(qdf), "variant")
        .select("qterm", "term", "freq")
        .distinct()
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.asc("dist"), F.desc("freq"), F.asc("term")
    )
    corrected = sorted(
        {
            r.term
            for r in cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("term")
            .collect()  # ≤ |query terms| rows
        }
    )
    return bm25_topk_from_index_v2(
        spark, name, " ".join(corrected), k, k1, b, score_decimals
    )
